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
    """Read a sharded corpus back; partition columns come from the paths.

    Handles both layouts this module writes:

    - batch (:func:`write_training_corpus`): ``path/<part>=X/shard=S/``
    - streaming (:func:`stream_corpus_ingest`): ``path/batch=<id>/...``
      — only batch directories carrying the ``_SUCCESS`` commit marker
      are read (the exactly-once filter: a crashed mid-write attempt
      leaves no marker, so partial files are invisible to readers), and
      the provenance ``batch`` column is dropped so both layouts read
      back with the same schema.

    ``partition_col`` is validated against the discovered partition
    columns — a corpus written with a different layout fails loudly here
    instead of silently pruning nothing.
    """
    import os

    entries = sorted(os.listdir(path)) if os.path.isdir(path) else []
    batch_dirs = [e for e in entries if e.startswith("batch=")]
    if batch_dirs:
        committed = [
            os.path.join(path, d)
            for d in batch_dirs
            if os.path.exists(os.path.join(path, d, "_SUCCESS"))
        ]
        if not committed:
            raise FileNotFoundError(f"no committed batches under {path}")
        df = (
            spark.read.option("basePath", path).parquet(*committed).drop("batch")
        )
    else:
        df = spark.read.parquet(path)
    if partition_col not in df.columns:
        raise ValueError(
            f"corpus at {path} has no partition column {partition_col!r}; "
            f"columns: {df.columns}"
        )
    return df


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
    batch writer, under a per-batch subdirectory
    (``path/batch=<id>/<part>=X/shard=S/``), so a consumer reads one
    dataset regardless of whether it was built batch or streaming.

    **Exactly-once**, via batch-scoped overwrite + commit markers:

    - each micro-batch writes ``mode("overwrite")`` into its OWN
      ``batch=<id>`` directory — a replay after a mid-write crash
      clobbers the partial attempt instead of appending next to it;
    - the committer's ``_SUCCESS`` marker is the batch manifest:
      :func:`read_training_corpus` reads only marked directories, so a
      half-written batch is invisible;
    - a crash between ``_SUCCESS`` and the checkpoint commit replays the
      batch with identical content (offsets are recorded before
      execution and the shard assignment is deterministic), overwriting
      byte-equivalent data — idempotent, not duplicated.

    Per batch: one repartition on (partition, shard) → exactly one file
    per (partition, shard) leaf per micro-batch — file growth is
    O(batches × layout), never O(input tasks); a long-running ingest
    compacts by rewriting old ``batch=`` dirs through
    :func:`write_training_corpus`, a metadata-only reader swap.

    Returns the started StreamingQuery; callers own stop().
    """
    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        with_shard = batch_df.withColumn(
            "shard", shard_col(F.col(key), n_shards, salt)
        )
        (
            with_shard.repartition(F.col(partition_col), F.col("shard"))
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .partitionBy(partition_col, "shard")
            .parquet(f"{path}/batch={batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def compact_corpus(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_col: str = "lang",
    n_shards: int = 4,
    key: str = "doc_id",
    salt: str = "seed0",
) -> str:
    """Compact a streaming-ingested layout (``src/batch=N/...`` — one
    file per (partition, shard) leaf PER MICRO-BATCH) into the batch
    writer's single layout at ``dst`` (one file per leaf, total): the
    maintenance pass a long-running ingest needs, since streaming file
    growth is O(batches × layout).

    Only ``_SUCCESS``-committed batches are read (the exactly-once
    manifest rule), the shard assignment is recomputed with the SAME
    (key, salt, n_shards) definition — so compaction is a pure layout
    change: document set, shard membership, and per-shard order are
    byte-for-byte what a fresh batch write of the union would produce
    (pinned by tests/test_corpus.py).

    Compaction writes to a NEW root; consumers cut over by path — the
    metadata-only reader swap. (In-place rewriting under concurrent
    readers would double-count between commit and cleanup; a table
    format with atomic manifest swap — Delta/Iceberg — is the tool for
    that, out of scope here.)

    Scale: ONE repartition of the corpus — the same cost as the original
    batch write; at 100 TB this runs partition-parallel and each output
    leaf is written by exactly one task.
    """
    docs = read_training_corpus(spark, src, partition_col).drop("shard")
    return write_training_corpus(
        docs, dst, partition_col=partition_col, n_shards=n_shards,
        key=key, salt=salt,
    )
