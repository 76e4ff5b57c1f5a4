import duckdb
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]").appName("probe2")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()

def cmp(name, spark_sql, duck_sql):
    import pandas as pd
    sdf = spark.sql(spark_sql).toPandas()
    ddf = con.execute(duck_sql).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1); ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    sc = list(sdf.columns)
    sdf = sdf.sort_values(sc).reset_index(drop=True); ddf = ddf.sort_values(sc).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, check_exact=True)
        print(f"{name}: EXACT MATCH ({sdf.shape})")
    except AssertionError as e:
        print(f"{name}: MISMATCH"); print(str(e)[:400])

# events via nanosAsLong
ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
ev.createOrReplaceTempView("events")
con.execute("CREATE VIEW events AS SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM '/root/testdata/sf0.001/events.parquet'")
cmp("events_raw", "SELECT event_id, ts, user_id, event_type, value FROM events",
               "SELECT event_id, ts, user_id, event_type, value FROM events")
cmp("events_hour", "SELECT date_trunc('HOUR', ts) AS h, event_type, count(*) AS n, sum(value) AS sv FROM events GROUP BY 1,2",
               "SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n, sum(value) AS sv FROM events GROUP BY 1,2")
cmp("sum_double", "SELECT event_type, sum(value) AS sv FROM events GROUP BY event_type",
             "SELECT event_type, sum(value) AS sv FROM events GROUP BY event_type")
cmp("md5int", "SELECT CAST(conv(substring(md5('hello world'),1,15),16,10) AS BIGINT) AS h",
          "SELECT CAST(('0x' || substr(md5('hello world'),1,15)) AS BIGINT) AS h")
spark.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView("documents")
con.execute("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'")
cmp("tokcount", "SELECT doc_id, size(split(trim(text), '\\\\s+')) AS ntok FROM documents",
            "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS ntok FROM documents")
spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView("embeddings")
con.execute("CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'")
expr_s = "+".join([f"CAST(element_at(a.embedding,{i+1}) AS DOUBLE)*CAST(element_at(b.embedding,{i+1}) AS DOUBLE)" for i in range(64)])
expr_d = "+".join([f"CAST(a.embedding[{i+1}] AS DOUBLE)*CAST(b.embedding[{i+1}] AS DOUBLE)" for i in range(64)])
cmp("dot_explicit",
    f"SELECT a.vec_id AS qa, b.vec_id AS qb, {expr_s} AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5",
    f"SELECT a.vec_id AS qa, b.vec_id AS qb, {expr_d} AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5")
cmp("dot_fold",
    "SELECT a.vec_id AS qa, b.vec_id AS qb, aggregate(zip_with(a.embedding, b.embedding, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), 0.0D, (acc,v) -> acc+v) AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5",
    "SELECT a.vec_id AS qa, b.vec_id AS qb, list_sum(list_transform(range(1,65), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))) AS dot FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5")
# array return columns (quantiles as array) — does pandas compare ok? use explode instead. check posexplode parity
cmp("quantile_explode",
    "SELECT band, p AS prob, q FROM (SELECT band, percentile(value, array(0.25D,0.5D,0.75D)) AS qs FROM (SELECT CASE b WHEN 0 THEN 'B04' ELSE 'B08' END AS band, ((b*7 + ti*13) % 97) / 8.0D - 6.0D AS value FROM range(2) t1(b), range(50) t2(ti)) GROUP BY band) LATERAL VIEW posexplode(arrays_zip(array(0.25D,0.5D,0.75D), qs)) AS pos, pq LATERAL VIEW inline(array(pq)) AS p, q",
    "SELECT band, ps[i] AS prob, qs[i] AS q FROM (SELECT band, quantile_cont(value, [0.25,0.5,0.75]) AS qs, [0.25,0.5,0.75] AS ps FROM (SELECT CASE b WHEN 0 THEN 'B04' ELSE 'B08' END AS band, ((b*7 + ti*13) % 97) / 8.0 - 6.0 AS value FROM range(2) t1(b), range(50) t2(ti)) GROUP BY band), range(1,4) r(i)")
# orders timestamp(ms) read normally?
spark.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("orders")
con.execute("CREATE VIEW orders AS SELECT * FROM '/root/testdata/sf0.001/orders.parquet'")
cmp("orders_month", "SELECT date_trunc('MONTH', o_orderdate) AS m, sum(o_totalprice) AS s, count(*) AS n FROM orders GROUP BY 1",
               "SELECT date_trunc('month', o_orderdate) AS m, sum(o_totalprice) AS s, count(*) AS n FROM orders GROUP BY 1")
spark.stop()
