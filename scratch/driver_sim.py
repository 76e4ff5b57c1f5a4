"""Simulate the driver: plain SparkSession, import __spark_entry__ by path,
run entry() + every queries()/oracle_sql() pair at sf0.01."""
import importlib.util, sys, time
import duckdb
import pandas as pd

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "32g")
         .getOrCreate())   # deliberately NO timezone/ansi/nanos/arrow tuning
spark.sparkContext.setLogLevel("ERROR")

rows = mod.entry(spark).collect()
print(f"entry: {len(rows)} rows", flush=True)

qs, os_ = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

fails = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, "/root/testdata/sf0.01").toPandas()
    except Exception as e:
        fails.append((name, f"SPARK: {str(e)[:100]}")); continue
    if name not in os_:
        continue
    try:
        ddf = con.execute(os_[name]).df()
    except Exception as e:
        fails.append((name, f"DUCK: {str(e)[:100]}")); continue
    cols = sorted(sdf.columns)
    if cols != sorted(ddf.columns) or len(sdf) != len(ddf):
        fails.append((name, f"shape {len(sdf)}x{cols} vs {len(ddf)}x{sorted(ddf.columns)}")); continue
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if str(s[c].dtype).startswith("datetime64"): s[c] = s[c].astype("datetime64[us]")
        if str(d[c].dtype).startswith("datetime64"): d[c] = d[c].astype("datetime64[us]")
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
    except AssertionError as e:
        fails.append((name, "VALUES: " + str(e).split(chr(10))[0][:80]))
print(f"plain-session gate: {len(qs) - len(fails)} ok, {len(fails)} FAIL of {len(qs)}")
for n, m in fails[:10]:
    print("FAIL", n, m)
spark.stop()
