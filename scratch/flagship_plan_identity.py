"""Round-15 continuation: prove the flagship graphs' sf100 EXECUTE
plans are byte-identical with the pandas-stage floor on vs off (the
floor only changes behavior where the raster byte sizing abstains, and
at sf100 every floored stage trips the raster width — so old/new plans
must match exactly). A plan-identity proof replaces a wall A/B: any
sf100 wall delta vs r14 on these graphs is session weather by
construction.

Usage: python scratch/flagship_plan_identity.py [sf] [graph ...]
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

import scale_probe as sp

sf = int(sys.argv[1]) if len(sys.argv) > 1 else 100
names = sys.argv[2:] or ["ndvi_median", "masked_seasonal"]

spark = sp.get_spark_ui()
spark.sparkContext.setLogLevel("ERROR")
from openeo_odc_driver_spark.core import tiled
from openeo_odc_driver_spark.plans.graph import ProcessGraph

root = sp.build_stores(spark, sf)

def plan_of(graph):
    pg = ProcessGraph(graph, save_dir="/tmp/r15_plan_id", tiled=True,
                      tile=sp.TILE, tiled_store_dir=root)
    cube = pg.execute(spark)
    return cube.df._sc._jvm.PythonSQLUtils.explainString(
        cube.df._jdf.queryExecution(), "formatted")

import re
orig = tiled._py_stage_width
for name in names:
    g = sp.graphs(sf)[name]
    tiled._py_stage_width = tiled._raster_exchange_width
    old = plan_of(g)
    tiled._py_stage_width = orig
    new = plan_of(g)
    # normalize expression ids / plan ids (fresh ids per build)
    # strip ids that differ per build inside one session: expr ids,
    # plan ids, checkpoint RDD names, and the session-global lambda
    # variable counter (x_1, x_2, ...)
    norm = lambda s: re.sub(
        r"#\d+|plan_id=\d+|ExistingRDD\[[^\]]*\]|lambda x_\d+|x_\d+",
        "#", s)
    same = norm(old) == norm(new)
    print(f"{name}@sf{sf}: plans {'IDENTICAL' if same else 'DIFFER'} "
          f"(old {len(old)}B, new {len(new)}B)", flush=True)
    if not same:
        import difflib
        for l in list(difflib.unified_diff(
                norm(old).splitlines(), norm(new).splitlines(),
                lineterm=""))[:40]:
            print(l)
spark.stop()
