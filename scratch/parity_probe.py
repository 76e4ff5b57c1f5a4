"""Probe bit-level parity between Spark and DuckDB for risky constructs."""
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]").appName("probe")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()

# deterministic dyadic cube (small)
CUBE_SQL_DUCK = """
SELECT
  CASE b WHEN 0 THEN 'B04' WHEN 1 THEN 'B08' ELSE 'SCL' END AS band,
  TIMESTAMP '2021-01-01 00:00:00' + INTERVAL (ti) MONTH AS time,
  150.0 - 10.0*yi AS y,
  10.0*xi AS x,
  CASE WHEN (b*5 + ti*11 + yi*3 + xi*29) % 23 = 0 THEN NULL
       ELSE ((b*7 + ti*13 + yi*17 + xi*19) % 97) / 8.0 - 6.0 END AS value
FROM (SELECT unnest(range(3)) AS b), (SELECT unnest(range(24)) AS ti),
     (SELECT unnest(range(16)) AS yi), (SELECT unnest(range(16)) AS xi)
"""
CUBE_SQL_SPARK = """
SELECT
  CASE b WHEN 0 THEN 'B04' WHEN 1 THEN 'B08' ELSE 'SCL' END AS band,
  timestampadd(MONTH, CAST(ti AS INT), TIMESTAMP '2021-01-01 00:00:00') AS time,
  150.0D - 10.0D*yi AS y,
  10.0D*xi AS x,
  CASE WHEN (b*5 + ti*11 + yi*3 + xi*29) % 23 = 0 THEN CAST(NULL AS DOUBLE)
       ELSE ((b*7 + ti*13 + yi*17 + xi*19) % 97) / 8.0D - 6.0D END AS value
FROM range(3) t1(b), range(24) t2(ti), range(16) t3(yi), range(16) t4(xi)
"""

def cmp(name, spark_sql, duck_sql, sort_cols=None):
    sdf = spark.sql(spark_sql).toPandas()
    ddf = con.execute(duck_sql).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    sc = list(sdf.columns)
    sdf = sdf.sort_values(sc).reset_index(drop=True)
    ddf = ddf.sort_values(sc).reset_index(drop=True)
    ok_shape = sdf.shape == ddf.shape
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, check_exact=True)
        print(f"{name}: EXACT MATCH ({sdf.shape})")
    except AssertionError as e:
        print(f"{name}: MISMATCH shape_ok={ok_shape}")
        print(str(e)[:500])

spark.sql(f"CREATE OR REPLACE TEMP VIEW cube AS {CUBE_SQL_SPARK}")
con.execute(f"CREATE OR REPLACE VIEW cube AS {CUBE_SQL_DUCK}")

# 0. cube itself
cmp("cube_raw", "SELECT * FROM cube", "SELECT * FROM cube")
# 1. avg
cmp("avg", "SELECT band, avg(value) AS m FROM cube GROUP BY band",
         "SELECT band, avg(value) AS m FROM cube GROUP BY band")
# 2. manual stddev
s = "SELECT band, sqrt((sum(value*value) - sum(value)*sum(value)/count(value))/(count(value)-1)) AS sd FROM cube GROUP BY band"
cmp("sd_manual", s, s)
# 3. builtin stddev
cmp("sd_builtin", "SELECT band, stddev_samp(value) AS sd FROM cube GROUP BY band",
              "SELECT band, stddev_samp(value) AS sd FROM cube GROUP BY band")
# 4. percentile exact
cmp("median", "SELECT band, percentile(value, 0.5D) AS med FROM cube GROUP BY band",
          "SELECT band, quantile_cont(value, 0.5) AS med FROM cube GROUP BY band")
cmp("quantiles", "SELECT band, percentile(value, 0.25D) AS q1, percentile(value, 0.75D) AS q3 FROM cube GROUP BY band",
          "SELECT band, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM cube GROUP BY band")
# 5. date_trunc month/hour on real table
spark.read.parquet("/root/testdata/sf0.001/events.parquet").createOrReplaceTempView("events")
con.execute("CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'")
cmp("date_trunc", "SELECT date_trunc('HOUR', ts) AS h, count(*) AS n, sum(value) AS sv FROM events GROUP BY 1",
             "SELECT date_trunc('hour', ts) AS h, count(*) AS n, sum(value) AS sv FROM events GROUP BY 1")
# 6. sum of float doubles (events.value is random double) — order-dependent?
cmp("sum_double", "SELECT event_type, sum(value) AS sv FROM events GROUP BY event_type",
             "SELECT event_type, sum(value) AS sv FROM events GROUP BY event_type")
# 7. md5 → int
cmp("md5int", "SELECT CAST(conv(substring(md5('hello'),1,8),16,10) AS BIGINT) AS h",
          "SELECT CAST(('0x' || substr(md5('hello'),1,8))::VARCHAR AS BIGINT) AS h")
# 8. token counts via split
spark.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView("documents")
con.execute("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'")
cmp("tokcount", "SELECT doc_id, size(split(trim(text), '\\\\s+')) AS ntok FROM documents",
            "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS ntok FROM documents")
# 9. dot product float arrays, explicit element formula (first 2 vecs)
spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView("embeddings")
con.execute("CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'")
expr_s = "+".join([f"CAST(element_at(a.embedding,{i+1}) AS DOUBLE)*CAST(element_at(b.embedding,{i+1}) AS DOUBLE)" for i in range(64)])
expr_d = "+".join([f"CAST(a.embedding[{i+1}] AS DOUBLE)*CAST(b.embedding[{i+1}] AS DOUBLE)" for i in range(64)])
cmp("dot_explicit",
    f"SELECT a.vec_id AS qa, b.vec_id AS qb, {expr_s} AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5",
    f"SELECT a.vec_id AS qa, b.vec_id AS qb, {expr_d} AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5")
# 10. aggregate-fold dot product vs duckdb list_dot_product
try:
    cmp("dot_fold",
        "SELECT a.vec_id AS qa, b.vec_id AS qb, aggregate(zip_with(a.embedding, b.embedding, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), 0.0D, (acc,v) -> acc+v) AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5",
        "SELECT a.vec_id AS qa, b.vec_id AS qb, list_sum(list_transform(range(1,65), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))) AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5")
except Exception as e:
    print("dot_fold ERR", e)
spark.stop()
