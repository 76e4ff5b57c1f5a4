"""Round-11 scale probe: the new tiled ops vs their long twins on a
stored 2048x2048 x 3-time raster (12.6M px; reuses /tmp/r9_scale's
store when present). Measures query wall only (storage build excluded)
and checks value parity by exact sum/count checksums.

Covers: resample_cube_spatial (k=2 nearest snap — long window plan vs
tiled fragment repack), resample_cube_temporal (as-of relabel), and
radar_mask (two long window passes vs the radius-2 halo-strip
exchange, separate DEM/LIA store).
Usage: python scratch/resample_scale.py [runs]
"""
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from openeo_odc_driver_spark.session import get_spark

spark = get_spark(cpus="32")
from pyspark.sql import functions as F

from openeo_odc_driver_spark.core import tiled as t
from openeo_odc_driver_spark.core.cube import Cube, CubeSchema, GridSpec
from openeo_odc_driver_spark.operators.resample import (
    resample_cube_spatial,
    resample_cube_temporal,
)
from openeo_odc_driver_spark.operators.sar import radar_mask

N, NT = 2048, 3
base = "/tmp/r9_scale"
grid = GridSpec(x0=0.0, y0=float(N - 1), resx=1.0, resy=1.0)
schema = CubeSchema(dims=("band", "time", "y", "x"), bands=("B04",), grid=grid)


def build_long(bands):
    df = (
        spark.range(N * N)
        .select(
            (F.col("id") / N).cast("long").alias("yi"),
            (F.col("id") % N).alias("xi"),
        )
        .crossJoin(
            spark.createDataFrame(
                [(f"2021-0{i+1}-01",) for i in range(NT)], "time string"
            ).select(F.col("time").cast("timestamp").alias("time"))
        )
        .crossJoin(
            spark.createDataFrame([(b,) for b in bands], "band string")
        )
        .select(
            "band", "time",
            (F.lit(float(N - 1)) - F.col("yi").cast("double")).alias("y"),
            F.col("xi").cast("double").alias("x"),
            F.when((F.col("yi") * 7 + F.col("xi")) % 31 == 0, None)
            .otherwise(
                ((F.col("yi") * 13 + F.col("xi") * 5) % 256).cast("double")
                / 4.0
            )
            .alias("value"),
        )
    )
    return df


if not os.path.exists(f"{base}/long"):
    os.makedirs(base, exist_ok=True)
    build_long(["B04"]).repartition(32).write.mode("overwrite").parquet(
        f"{base}/long"
    )
    cube = Cube(spark.read.parquet(f"{base}/long"), schema)
    t.save_tiled(t.to_tiled(cube, tile=256, n_y=N, n_x=N), f"{base}/tiled")
    print("built base store", flush=True)

sar_schema = CubeSchema(
    dims=("band", "time", "y", "x"), bands=("DEM", "LIA"), grid=grid
)
if not os.path.exists(f"{base}/sar_long"):
    build_long(["DEM", "LIA"]).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{base}/sar_long")
    sc = Cube(spark.read.parquet(f"{base}/sar_long"), sar_schema)
    t.save_tiled(
        t.to_tiled(sc, tile=256, n_y=N, n_x=N), f"{base}/sar_tiled"
    )
    print("built sar store", flush=True)

cube = Cube(spark.read.parquet(f"{base}/long"), schema)
tc = t.load_tiled(spark, f"{base}/tiled")
sar_cube = Cube(spark.read.parquet(f"{base}/sar_long"), sar_schema)
sar_tc = t.load_tiled(spark, f"{base}/sar_tiled")

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def timeit(label, fn):
    best = None
    for _ in range(RUNS):
        t0 = time.time()
        out = fn()
        best = min(best or 1e9, time.time() - t0)
    print(f"{label}: best {best:.2f}s  ({out})", flush=True)
    return out


def checksum(df):
    r = df.agg(
        F.sum("value").cast("string").alias("s"),
        F.count("value").alias("c"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (r["s"], r["c"], r["n"])


# --- resample_cube_spatial k=2 (10 -> 20 m shape) ---------------------------
tgrid = GridSpec(x0=0.0, y0=float(N - 1), resx=2.0, resy=2.0)
target = Cube(cube.df, CubeSchema(bands=("B04",), grid=tgrid))
s_long = timeit(
    "resample_cube_spatial long (window snap)",
    lambda: checksum(resample_cube_spatial(cube, target).df),
)
s_tile = timeit(
    "resample_cube_spatial tiled (fragment repack)",
    lambda: checksum(
        t.from_tiled(t.resample_cube_spatial_tiled(tc, target)).df
    ),
)
print("spatial checksums", "MATCH" if s_long == s_tile else "DIFFER", flush=True)

# --- resample_cube_temporal (as-of relabel onto day-shifted axis) -----------
tgt_times = spark.createDataFrame(
    [(f"2021-0{i+1}-04",) for i in range(NT)], "time string"
).select(F.col("time").cast("timestamp").alias("time"))
tgt_cube = Cube(tgt_times, CubeSchema(dims=("time",), grid=grid))
t_long = timeit(
    "resample_cube_temporal long",
    lambda: checksum(resample_cube_temporal(cube, tgt_cube).df),
)
t_tile = timeit(
    "resample_cube_temporal tiled (broadcast relabel)",
    lambda: checksum(
        t.from_tiled(t.resample_cube_temporal_tiled(tc, tgt_cube)).df
    ),
)
print("temporal checksums", "MATCH" if t_long == t_tile else "DIFFER", flush=True)

# --- radar_mask (two window passes vs radius-2 halo strips) -----------------
r_long = timeit(
    "radar_mask long (2 window passes)",
    lambda: checksum(radar_mask(sar_cube, 0.3, 0.5, "ASC").df),
)
r_tile = timeit(
    "radar_mask tiled (halo strips)",
    lambda: checksum(
        t.from_tiled(t.radar_mask_tiled(sar_tc, 0.3, 0.5, "ASC")).df
    ),
)
print("radar checksums", "MATCH" if r_long == r_tile else "DIFFER", flush=True)
