"""Round-9 scale probe: zonal stats + spatial resample, tiled vs long,
on a stored 2048x2048 x 3-time raster (12.6M px). Both tiers read from
parquet; times are query wall only (storage build excluded).
Usage: python scratch/zonal_scale.py [runs]"""
import sys, time, shutil, os
sys.path.insert(0, '/root/repo')
from openeo_odc_driver_spark.session import get_spark
spark = get_spark(cpus='32')
from pyspark.sql import functions as F
from openeo_odc_driver_spark.core.cube import Cube, CubeSchema, GridSpec
from openeo_odc_driver_spark.core import tiled as t
from openeo_odc_driver_spark.operators.aggregates import aggregate_spatial, aggregate_spatial_window

N = 2048
NT = 3
base = "/tmp/r9_scale"
grid = GridSpec(x0=0.0, y0=float(N - 1), resx=1.0, resy=1.0)
schema = CubeSchema(dims=("band", "time", "y", "x"), bands=("B04",), grid=grid)

if not os.path.exists(f"{base}/long"):
    os.makedirs(base, exist_ok=True)
    df = (
        spark.range(N * N).select(
            (F.col("id") / N).cast("long").alias("yi"),
            (F.col("id") % N).alias("xi"),
        )
        .crossJoin(spark.createDataFrame([(f"2021-0{i+1}-01",) for i in range(NT)], "time string").select(F.col("time").cast("timestamp").alias("time")))
        .select(
            F.lit("B04").alias("band"), "time",
            (F.lit(float(N - 1)) - F.col("yi").cast("double")).alias("y"),
            F.col("xi").cast("double").alias("x"),
            # dyadic values, some NULLs
            F.when((F.col("yi") * 7 + F.col("xi")) % 31 == 0, None)
            .otherwise(((F.col("yi") * 13 + F.col("xi") * 5) % 256).cast("double") / 4.0)
            .alias("value"),
        )
    )
    df.repartition(32).write.mode("overwrite").parquet(f"{base}/long")
    cube = Cube(spark.read.parquet(f"{base}/long"), schema)
    t.save_tiled(t.to_tiled(cube, tile=256, n_y=N, n_x=N), f"{base}/tiled")
    print("built", flush=True)

cube = Cube(spark.read.parquet(f"{base}/long"), schema)
tc = t.load_tiled(spark, f"{base}/tiled")

# convex polygon ~ center hexagon covering ~40% of the scene
cx, cy, r = N / 2.0, N / 2.0, N * 0.38
import math
POLY = [(cx + r * math.cos(a), cy + r * math.sin(a))
        for a in [i * math.pi / 3 + 0.1 for i in range(6)]]

def timeit(label, fn, runs=int(sys.argv[1]) if len(sys.argv) > 1 else 3):
    best = None
    for i in range(runs):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best {best:.2f}s  ({out})", flush=True)
    return out

r_long = timeit("zonal long ", lambda: sorted(
    (row["geom_id"], row["time"], round(row["value"], 9))
    for row in aggregate_spatial(cube, [POLY], "mean").df.collect()))
r_tile = timeit("zonal tiled", lambda: sorted(
    (row["geom_id"], row["time"], round(row["value"], 9))
    for row in t.aggregate_spatial_tiled(tc, [POLY], "mean").df.collect()))
assert r_long == r_tile, (r_long, r_tile)
print("zonal values MATCH", flush=True)

w_long = timeit("resample long (window agg)", lambda: aggregate_spatial_window(cube, (8, 8), "mean").df.agg(F.sum("value").cast("string")).collect()[0][0])
w_tile = timeit("resample tiled (factor 8) ", lambda: t.from_tiled(t.resample_spatial_tiled(tc, 8, "mean")).df.agg(F.sum("value").cast("string")).collect()[0][0])
print("resample sums:", w_long, w_tile, "MATCH" if w_long == w_tile else "DIFFER", flush=True)
