"""Round-12 item 2 A/B: the stay-tiled filter_bbox window repack moved
JVM-side (array slice/flatten/transform fragments + HOF canvas) vs the
long plan (scan filter + codegen groupBy), on the stored 2048^2 x 3
raster from scratch/resample_scale.py (12.6 M px). Round-11's Python
repack lost to the long plan (2.24 s vs 1.08 s @ 73% box); the JVM
repack removes the Arrow/pandas boundary that cost the fixed ~0.5-1 s.

Usage: python scratch/filter_bbox_ab.py [runs]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from openeo_odc_driver_spark.session import get_spark

spark = get_spark(cpus="32")
from pyspark.sql import functions as F

from openeo_odc_driver_spark.core import tiled as t
from openeo_odc_driver_spark.core.cube import Cube, CubeSchema, GridSpec
from openeo_odc_driver_spark.operators.filters import filter_bbox
from openeo_odc_driver_spark.operators.reducers import reduce_dimension

N = 2048
base = "/tmp/r9_scale"
grid = GridSpec(x0=0.0, y0=float(N - 1), resx=1.0, resy=1.0)
schema = CubeSchema(dims=("band", "time", "y", "x"), bands=("B04",), grid=grid)
if not os.path.exists(f"{base}/tiled"):
    sys.exit("run scratch/resample_scale.py once to build the store")

cube = Cube(spark.read.parquet(f"{base}/long"), schema)
tc = t.load_tiled(spark, f"{base}/tiled")

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


LEG = os.environ.get("FB_LEG", "")  # run one leg per process for
# GC/heap isolation (JMH discipline; see bench.py System.gc note)


def timeit(label, fn):
    best = None
    for _ in range(RUNS):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        out = fn()
        best = min(best or 1e9, time.time() - t0)
    print(f"{label}: best {best:.2f}s  ({out})", flush=True)
    return out


def maybe(label, leg, fn):
    if LEG and LEG != leg:
        return None
    return timeit(f"{label} [{leg}]", fn)


def checksum(df):
    r = df.agg(
        F.sum("value").cast("string").alias("s"),
        F.count("value").alias("c"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (r["s"], r["c"], r["n"])


# boxes: 73% of pixels (interior window, unaligned corner) and 6%
BOXES = {
    "73% box": (150.0, 1900.0, 100.0, 1850.0),   # w,e,s,n -> 1751^2 px
    "6% box": (700.0, 1200.0, 800.0, 1300.0),    # 501^2 px
}

for label, (w, e, s, n) in BOXES.items():
    c_long = maybe(
        f"filter_bbox({label}) long scan+mean", "long",
        lambda: checksum(
            reduce_dimension(filter_bbox(cube, w, e, s, n), "time", "mean").df
        ),
    )
    c_tile = maybe(
        f"filter_bbox({label}) tiled-native JVM repack+mean", "jvm",
        lambda: checksum(
            t.from_tiled(
                t.reduce_time_tiled(
                    t.filter_bbox_tiled_native(tc, w, e, s, n), "mean"
                )
            ).df
        ),
    )
    # same window through the round-11 Python repack (mapInPandas
    # split + applyInPandas assemble), for the like-for-like JVM A/B
    saved = t._retile_same_edge_jvm
    t._retile_same_edge_jvm = (
        lambda tc2, r0, c0, ny, nx, sch:
        t._retile_python(tc2, tc2.tile, r0, c0, ny, nx, sch)
    )
    try:
        c_py = maybe(
            f"filter_bbox({label}) tiled PYTHON repack+mean", "py",
            lambda: checksum(
                t.from_tiled(
                    t.reduce_time_tiled(
                        t.filter_bbox_tiled_native(tc, w, e, s, n), "mean"
                    )
                ).df
            ),
        )
    finally:
        t._retile_same_edge_jvm = saved
    # the demotion alternative a TILED downstream would actually pay:
    # expanding slice -> long rows -> to_tiled re-pack -> tiled reduce
    c_exp = maybe(
        f"filter_bbox({label}) expand+to_tiled repack+mean", "expand",
        lambda: checksum(
            t.from_tiled(
                t.reduce_time_tiled(
                    t.to_tiled(
                        t.filter_bbox_tiled(tc, w, e, s, n), tile=256
                    ), "mean"
                )
            ).df
        ),
    )
    got = [c for c in (c_long, c_tile, c_py) if c is not None]
    if len(got) > 1:
        print(label, "value checksums",
              "MATCH" if all(c == got[0] for c in got) else "DIFFER",
              flush=True)
    if c_exp is not None and got:
        # the expand leg fabricates NULL padding rows (global anchoring
        # of to_tiled) — compare sum and value-count only
        print(label, "expand leg values",
              "MATCH" if c_exp[:2] == got[0][:2] else "DIFFER", flush=True)
