import sys, time
sys.path.insert(0, '/root/repo')
from openeo_odc_driver_spark.session import get_spark
spark = get_spark(cpus='32')
from pyspark.sql import functions as F
from openeo_odc_driver_spark.sources.tables import load_table
from openeo_odc_driver_spark.pipeline.graph import copurchase_edges, pagerank_integer

li = load_table(spark, '/root/testdata/sf0.1', 'lineitem')

def run(persist):
    edges = copurchase_edges(li)
    if persist:
        edges = edges.persist()
        edges.count()  # materialize
    ranks = pagerank_integer(edges, iterations=3, join_impl="broadcast")
    out = (ranks.select(F.col("pk").alias("part_key"), F.col("r").alias("score"))
           .orderBy(F.desc("score"), F.asc("part_key")).limit(20))
    rows = out.collect()
    if persist:
        edges.unpersist()
    return rows

for mode in (False, True, False, True):
    t0=time.time(); rows = run(mode)
    print(f"persist={mode}: {time.time()-t0:.2f}s top={rows[0]['part_key']}", flush=True)
