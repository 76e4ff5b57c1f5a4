"""Training-corpus materialization: the write side of the data pipeline.

The dedup/quality/chunking operators produce a cleaned corpus as a lazy
plan; this sink writes it as a **deterministic, shard-addressed parquet
dataset** — the layout a downstream trainer reads:

- Hive-partitioned by a low-cardinality column (``lang`` by default) so
  per-language readers prune directories, and
- bucketed into ``n_shards`` stable shards per partition via the same
  md5-derived shard id as :func:`..pipeline.sampling.shuffle_shards`, so
  a document lands in the same shard no matter how many executors wrote
  the dataset, and re-runs are byte-stable modulo parquet metadata.

Scale notes: one ``repartition(partition_cols + shard)`` shuffle sizes
output files (the small-files problem is a layout decision, not an
afterthought — 100 TB ÷ (partitions × shards) should land near the HDFS
block size); ``partitionBy`` on the writer prunes at read time. No
collect, no Python in the row path.

Reference: the reference's only batch output is a single-file NetCDF/
GTiff artifact per job (openeo_odc_driver.py:1616-1724); sharded corpus
layout is part of the beyond-reference training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.sampling import shard_col


def write_training_corpus(
    docs: DataFrame,
    path: str,
    partition_col: str = "lang",
    n_shards: int = 4,
    key: str = "doc_id",
    salt: str = "seed0",
) -> str:
    """Write ``docs`` as a hive-partitioned, shard-bucketed parquet
    dataset: ``path/<partition_col>=X/shard=S/part-*.parquet``.

    One repartition on (partition, shard) co-locates each output file's
    rows in one task — every (partition, shard) directory holds exactly
    one data file, so the file count is the layout parameter, not a
    function of the input's partitioning. The shard id is
    :func:`..pipeline.sampling.shard_col` — the same assignment the
    shuffle_shards query computes, so queries and materialized layout
    agree document-for-document.
    """
    with_shard = docs.withColumn("shard", shard_col(F.col(key), n_shards, salt))
    (
        with_shard.repartition(F.col(partition_col), F.col("shard"))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .partitionBy(partition_col, "shard")
        .parquet(path)
    )
    return path


def read_training_corpus(
    spark: SparkSession, path: str, partition_col: str = "lang"
) -> DataFrame:
    """Read a sharded corpus back; partition columns come from the paths."""
    return spark.read.parquet(path)


def stream_corpus_ingest(
    stream_docs: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "lang",
    n_shards: int = 4,
    key: str = "doc_id",
    salt: str = "seed0",
    query_name: str = "corpus_ingest",
):
    """Continuous corpus materialization: every micro-batch of cleaned
    documents lands in the SAME hive-partitioned shard layout as the
    batch writer (``foreachBatch`` + append), so a consumer reads one
    dataset regardless of whether it was built batch or streaming.

    Per batch: one repartition on (partition, shard) → at most one new
    file per (partition, shard) directory per micro-batch — file growth
    is O(batches × layout), never O(input tasks). The checkpoint makes
    restarts resume from the last committed offset; parquet-append via
    foreachBatch is at-least-once on mid-batch crash (an idempotent
    overwrite-by-batch-partition needs a table format with replaceWhere
    semantics, out of scope here and said so).

    Returns the started StreamingQuery; callers own stop().
    """
    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        with_shard = batch_df.withColumn(
            "shard", shard_col(F.col(key), n_shards, salt)
        )
        (
            with_shard.repartition(F.col(partition_col), F.col("shard"))
            .sortWithinPartitions(key)
            .write.mode("append")
            .partitionBy(partition_col, "shard")
            .parquet(path)
        )

    return (
        stream_docs.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
