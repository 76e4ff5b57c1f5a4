import duckdb
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]").config("spark.sql.session.timeZone","UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong","true").config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
import pandas as pd
ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
sdf = ev.select("event_id","ts").toPandas().sort_values("event_id").reset_index(drop=True)
ddf = con.execute("SELECT event_id, date_trunc('microseconds', ts) AS ts FROM '/root/testdata/sf0.001/events.parquet' ORDER BY event_id").df()
try:
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, check_exact=True); print("events_ts: EXACT MATCH")
except AssertionError as e:
    print("MISMATCH", str(e)[:300])
spark.stop()
