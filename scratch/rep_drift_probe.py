"""Reproduce the repetition_scores run-over-run slowdown (VERDICT r4 #2).

Runs the query N times back-to-back under the same session (bench.py
conditions), printing per-run wall time plus JVM heap stats, then repeats
with explicit GC between runs to separate heap pressure from plan/codegen
effects.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = os.environ["SPARK_GRAFT_SF_DIR"]

from openeo_odc_driver_spark.session import get_spark
from openeo_odc_driver_spark.registry import QUERIES

spark = get_spark("rep-drift")
jvm = spark.sparkContext._jvm
rt = jvm.java.lang.Runtime.getRuntime()

def heap():
    return (rt.totalMemory() - rt.freeMemory()) / 1e9, rt.totalMemory() / 1e9

fn = QUERIES["repetition_scores"]
spark.range(1000).selectExpr("sum(id)").collect()

for phase, do_gc in (("plain", False), ("with-System.gc", True)):
    print(f"--- {phase}")
    for i in range(6):
        if do_gc:
            jvm.java.lang.System.gc()
            time.sleep(0.5)
        used0, tot0 = heap()
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        used1, tot1 = heap()
        print(f"run {i}: {dt:6.3f}s  heap {used0:5.2f}->{used1:5.2f} GB "
              f"(total {tot1:5.2f} GB)", flush=True)
spark.stop()
