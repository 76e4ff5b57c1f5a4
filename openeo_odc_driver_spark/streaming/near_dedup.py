"""Ingest-time NEAR-dedup over a document stream — the streaming face of
``pipeline.dedup.minhash_dedup_incremental``.

The production shape this models: a 100 TB corpus grows by daily/hourly
document batches; re-deduplicating the whole corpus per batch is not an
option, so each arriving micro-batch is flagged against the EXISTING
corpus's materialized MinHash signatures (K ints/doc — the asset), and
only the new batch is ever shingled and hashed.

Why ``foreachBatch`` and not an unbounded-stream operator: signature
building is a per-document aggregation (min over shingle hashes) and the
banded join's existing side is a STATIC asset, not a stream — there are
no event-time/watermark semantics to express; each micro-batch is a
self-contained batch job over (batch, asset). This is the same judgment
call as ``sinks.corpus.stream_corpus_ingest``.

Exactly-once, by the same discipline as ``stream_corpus_ingest``: every
micro-batch overwrites its OWN ``batch=<id>`` directory, the committer's
``_SUCCESS`` marker is the batch manifest, and :func:`read_stream_flags`
reads only marked directories — a replay after a mid-write crash
clobbers the partial attempt and rewrites byte-equivalent data (the
flags are a deterministic function of (batch content, asset, banding)).

Batch-boundary invariance (what makes this oracle-able): a document's
flags depend only on (that document, the existing corpus) — never on
which micro-batch carried it or on other new documents — so the union
of per-batch flags equals the one-shot batch run regardless of how the
stream is chopped. The driver gate row shares batch
``minhash_dedup_incremental``'s DuckDB twin; the multi-batch equality is
pinned in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.dedup import (
    LSH_BANDS,
    _track_persisted,
    incremental_flags_from_signatures,
    minhash_signatures,
)


def stream_minhash_near_dedup(
    stream_docs: DataFrame,
    existing_docs: DataFrame,
    path: str,
    checkpoint: str,
    jaccard_threshold: float = 0.5,
    bands: int | None = None,
    query_name: str = "minhash_near_dedup",
    grow_asset_dir: str | None = None,
):
    """Start the ingest-time near-dedup stream; returns the
    StreamingQuery (caller owns ``stop()``).

    The existing side's signatures are built ONCE and persisted for the
    life of the stream (session-tracked, released by the next dedup call
    or :func:`..pipeline.dedup.release_cached_signatures`) — per-batch
    work is shingling the batch plus one banded equi-join against the
    persisted asset. ``bands`` defaults to the gate's fixed LSH_BANDS:
    the density-aware probe needs the batch to exist, and re-deriving
    banding per micro-batch would let two batches disagree on what
    'candidate' means mid-stream; a long-running ingest re-tunes banding
    explicitly between epochs (re-banding the asset is cheap — K
    ints/doc, no re-shingling).

    Two asset modes:

    - **static** (``grow_asset_dir=None``): every batch is flagged
      against the initial corpus only. Flags are batch-boundary
      invariant, so the union equals the one-shot batch run — the
      oracle-able gate mode.
    - **growing** (``grow_asset_dir`` set): the production ingest
      semantics — after flagging, the batch's OWN signatures are
      appended to the asset (batch-scoped parquet dir, K ints/doc —
      exactly what a real pipeline materializes), so a later batch also
      dedups against everything that arrived before it. Flags then
      depend on arrival order (deterministic for a deterministic source
      order, e.g. file streams with maxFilesPerTrigger); pinned in
      tests/test_streaming.py with an intra-stream duplicate.
    """
    sig_old = _track_persisted(minhash_signatures(existing_docs))
    use_bands = LSH_BANDS if bands is None else bands
    if grow_asset_dir is not None:
        # seed the asset with the initial corpus signatures (batch=-1),
        # so every reader sees one uniform layout
        sig_old.write.mode("overwrite").parquet(f"{grow_asset_dir}/batch=-1")

    def _flag_batch(batch_df: DataFrame, batch_id: int) -> None:
        sig_new = minhash_signatures(batch_df)
        if grow_asset_dir is not None:
            spark = batch_df.sparkSession
            # the asset view is STRICTLY earlier batches (id < this one,
            # plus the batch=-1 seed): a doc never flags against its own
            # batch, and — the replay hazard — a crash AFTER the sig
            # append but BEFORE the checkpoint commit replays this batch
            # against the identical asset view instead of one that now
            # contains its own signatures (which would self-flag every
            # doc). Deterministic replay = byte-equivalent rewrite.
            asset = spark.read.parquet(
                *_committed_batches(grow_asset_dir, before=batch_id)
            )
            sig_new = sig_new.localCheckpoint(eager=True)
            flags = incremental_flags_from_signatures(
                sig_new, asset, jaccard_threshold, use_bands
            )
            flags.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")
            # exactly-once append: the batch's sig dir is overwritten on
            # replay with byte-equivalent content (signatures are a
            # deterministic function of the batch)
            sig_new.write.mode("overwrite").parquet(
                f"{grow_asset_dir}/batch={batch_id}"
            )
        else:
            flags = incremental_flags_from_signatures(
                sig_new, sig_old, jaccard_threshold, use_bands
            )
            flags.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return (
        stream_docs.writeStream.foreachBatch(_flag_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def _committed_batches(path: str, before: int | None = None) -> list[str]:
    """_SUCCESS-marked batch directories under ``path`` (the exactly-once
    read filter shared by flags and the growing signature asset).
    ``before`` restricts to batch ids strictly below it — the replay-safe
    asset view for micro-batch ``before``."""
    entries = sorted(os.listdir(path)) if os.path.isdir(path) else []
    out = [
        os.path.join(path, d)
        for d in entries
        if d.startswith("batch=")
        and os.path.exists(os.path.join(path, d, "_SUCCESS"))
        and (before is None or int(d.split("=", 1)[1]) < before)
    ]
    if not out:
        raise FileNotFoundError(f"no committed batches under {path}")
    return out


def read_stream_flags(spark: SparkSession, path: str) -> DataFrame:
    """Read the flags written by :func:`stream_minhash_near_dedup` —
    committed (``_SUCCESS``-marked) batch directories only, the
    exactly-once read filter."""
    return spark.read.parquet(*_committed_batches(path))


def run_stream_near_dedup(
    spark: SparkSession,
    sf_dir: str,
    jaccard_threshold: float = 0.5,
    bands: int | None = None,
    work_dir: str | None = None,
) -> DataFrame:
    """Drive the fixture's documents through the near-dedup stream (one
    epoch) and return the materialized flags: documents with
    ``doc_id % 5 == 0`` arrive as the stream, the rest are the existing
    corpus — the same split as the batch ``minhash_dedup_incremental``
    gate row, so the result is checkable against the same oracle."""
    import tempfile

    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
        .where(F.col("doc_id") % 5 == 0)
    )
    existing = batch.where(F.col("doc_id") % 5 != 0)
    base = work_dir or tempfile.mkdtemp(prefix="near_dedup_stream_")
    q = stream_minhash_near_dedup(
        stream,
        existing,
        path=os.path.join(base, "flags"),
        checkpoint=os.path.join(base, "ckpt"),
        jaccard_threshold=jaccard_threshold,
        bands=bands,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_stream_flags(spark, os.path.join(base, "flags"))
