"""Structured Streaming windows: stream result must equal the batch
equivalent (one-epoch parquet stream, memory sink)."""

from pyspark.sql import functions as F

from openeo_odc_driver_spark.sources.tables import load_table
from openeo_odc_driver_spark.streaming.windows import (
    run_stream_to_memory,
    tumbling_counts,
)


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_memory(
        spark, sf_dir, tumbling_counts, name="t_stream_eq"
    ).select("window_start", "event_type", "n")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    assert stream_out.count() == batch.count()
    assert stream_out.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_out).count() == 0
