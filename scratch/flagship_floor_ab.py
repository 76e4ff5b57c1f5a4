"""Round-15 continuation: direct old-vs-new interleaved A/B of the
pandas-stage floor on a flagship graph at one SF — old leg patches
_py_stage_width back to _raster_exchange_width (pre-continuation
behavior), new leg is the shipped rule. Alternating legs in ONE
session; ratios, not absolute walls, carry the claim.

Usage: python scratch/flagship_floor_ab.py [graph] [sf] [legs]
"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from pyspark.sql import functions as F
import scale_probe as sp

graph_name = sys.argv[1] if len(sys.argv) > 1 else "ndvi_median"
sf = int(sys.argv[2]) if len(sys.argv) > 2 else 100
legs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

spark = sp.get_spark_ui()
spark.sparkContext.setLogLevel("WARN")
from openeo_odc_driver_spark.core import tiled
from openeo_odc_driver_spark.plans.graph import ProcessGraph

root = sp.build_stores(spark, sf)
g = sp.graphs(sf)[graph_name]

def run(tag):
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    pg = ProcessGraph(g, save_dir="/tmp/r15_floor_ab", tiled=True,
                      tile=sp.TILE, tiled_store_dir=root)
    cube = pg.execute(spark)
    cube.df.agg(F.count(F.lit(1)), F.sum("value")).collect()
    w = round(time.time() - t0, 1)
    print(f"  {tag}: {w}s", flush=True)
    return w

orig = tiled._py_stage_width
walls = {"old": [], "new": []}
run("warmup")  # page cache / codegen, not counted
for _ in range(legs):
    tiled._py_stage_width = tiled._raster_exchange_width
    walls["old"].append(run("old"))
    tiled._py_stage_width = orig
    walls["new"].append(run("new"))
print({"graph": graph_name, "sf": sf, **walls,
       "ratio_old_over_new": round(min(walls["old"]) /
                                   max(min(walls["new"]), 1e-9), 2)},
      flush=True)
spark.stop()
