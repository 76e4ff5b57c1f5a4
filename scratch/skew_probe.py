"""Probe: does AQE skew-join splitting activate on a boilerplate-heavy
corpus for exact_substring_dedup's digest join and minhash_lsh_pairs'
bucket self-join, with thresholds scaled to fixture size?"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from openeo_odc_driver_spark.session import get_spark

spark = get_spark("skew-probe", cpus="8")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
# scale AQE's skew detection down to fixture size (defaults are 256MB)
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

# corpus: 2000 docs all containing the SAME 60-token boilerplate block
# (one digest key carries ~2000 gram positions -> the hot partition),
# plus 500 unique-tail docs
words = ["tok%d" % i for i in range(50)]  # exactly gram tokens
boiler = " ".join(words)
rows = []
N_HOT = 30000
for i in range(N_HOT):
    # 50 boiler + 2 unique -> exactly ONE shared digest per doc
    rows.append((i, boiler + f" unique{i} trail{i}"))
for i in range(N_HOT, N_HOT + 100):
    rows.append((i, " ".join(f"w{i}_{j}" for j in range(55))))
docs = spark.createDataFrame(rows, "doc_id long, text string")

from openeo_odc_driver_spark.pipeline.dedup import exact_substring_dedup

out = exact_substring_dedup(docs, gram=50)
res = out.collect()
plan = out._jdf.queryExecution().executedPlan().toString()
print("=== exact_substring_dedup ===")
print("rows:", len(res))
dropped = {r.doc_id: r.n_dropped for r in res}
print("doc0 dropped:", dropped[0], "cold dropped:", dropped[30050])
print("skew=true in plan:", "skew=true" in plan)
for line in plan.splitlines():
    if "SortMergeJoin" in line or "skew" in line.lower():
        print("  ", line.strip()[:160])
spark.stop()
