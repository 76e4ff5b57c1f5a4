"""Round-15 continuation: per-stage wall decomposition of
exact_substring_dedup (noop-sink segments, one session, indicative)."""
import sys, time
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"

from openeo_odc_driver_spark.session import get_spark
from openeo_odc_driver_spark import registry_pipeline as rp
from pyspark.sql import functions as F

spark = get_spark("prof-esd", cpus="16")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()
G = rp._ESD_G

docs = rp._docs(spark, SF)
staged = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_toks"))
pos_grams = F.when(
    F.size("_toks") >= G,
    F.expr(f"transform(sequence(1, size(_toks) - {G-1}),"
           f" i -> struct(i AS p, md5(array_join(slice(_toks, i, {G}), ' ')) AS h))"),
).otherwise(F.expr("CAST(array() AS array<struct<p: int, h: string>>)"))
g = staged.select("doc_id", F.explode(pos_grams).alias("gg")).select(
    "doc_id", F.col("gg.p").alias("p"), F.col("gg.h").alias("h"))
dup = g.groupBy("h").agg(F.count(F.lit(1)).alias("_c")).where("_c > 1").select("h")

def seg(name, df):
    best = None
    for _ in range(2):
        spark._jvm.System.gc()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        best = w if best is None or w < best else best
    print(f"{name}: {best:.2f}s", flush=True)

seg("gram_explode_only", g)
seg("dup_aggregate", dup)
joined = g.join(dup, "h")
starts = joined.groupBy("doc_id").agg(F.collect_list("p").alias("_starts"))
seg("join_back_and_starts", starts)
from openeo_odc_driver_spark.pipeline import dedup as pdedup
seg("full_operator", pdedup.exact_substring_dedup(docs, gram=G))
spark.stop()
