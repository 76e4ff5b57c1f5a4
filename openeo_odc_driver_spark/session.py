"""SparkSession factory for the engine.

Scale notes: on a real cluster these configs move to spark-submit /
cluster defaults; the ones set here are semantic (timezone, ANSI off for
null-propagating division like the reference's NaN semantics,
`load_odc_collection.py:119-120`) or adaptive (AQE) and hold at any scale.
`spark.sql.shuffle.partitions` is a local-mode default — AQE coalesces /
splits at runtime, so the static number matters little.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "openeo-odc-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # semantic configs (required for correctness / oracle parity)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # events.parquet stores TIMESTAMP(NANOS); Spark lacks a nanos type,
        # read as long and convert (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # performance configs
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table layouts (co-located joins) land here, not in cwd
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
