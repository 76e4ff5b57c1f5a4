"""Bisect the repetition_scores drift: run the bench prefix once, then
repetition_scores x6, printing wall time + GC time deltas per run."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from openeo_odc_driver_spark.session import get_spark
from openeo_odc_driver_spark.registry import QUERIES
from bench import BENCH_QUERIES

spark = get_spark("rep-drift2")
jvm = spark.sparkContext._jvm


def gc_ms():
    total = 0
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        total += beans.get(i).getCollectionTime()
    return total


prefix = BENCH_QUERIES[: BENCH_QUERIES.index("repetition_scores")]
for name in prefix:
    t0 = time.time()
    QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
    print(f"prefix {name}: {time.time()-t0:.3f}s", flush=True)

for i in range(6):
    g0, t0 = gc_ms(), time.time()
    QUERIES["repetition_scores"](spark, SF).write.format("noop").mode("overwrite").save()
    print(f"rep run {i}: {time.time()-t0:6.3f}s  gc+{gc_ms()-g0}ms", flush=True)
spark.stop()
