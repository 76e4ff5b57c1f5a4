"""Deterministic sampling / sharding for training-data pipelines.

Random sampling via ``rand()`` is irreproducible across retries and
engines; these operators derive uniform variates from md5 of stable keys
instead, so a sample is a pure function of (corpus, salt) — re-runnable,
auditable, and bit-identical in the DuckDB oracle. All pure JVM
expressions, codegen-fused with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# the 7-hex-char md5 prefix yields a uniform 28-bit integer
_HASH_SPACE = float(16**7)


def _uniform(key: F.Column, salt: str) -> F.Column:
    """U(0,1) variate from md5(salt || key) — deterministic,
    engine-portable. Built from Column ops (not interpolated SQL) so an
    arbitrary ``salt`` string can never break or mangle the expression."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 7), 16, 10
    ).cast("bigint")
    return h / F.lit(_HASH_SPACE)


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "seed0",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a document iff its
    uniform variate falls under its language's target rate — the
    data-mixing step that up/down-weights languages or sources in a
    training corpus.

    One filter over the scan: no shuffle, no state, and the decision for
    a given (doc_id, salt) never changes across runs or engines. At
    100 TB this runs at scan speed and composes with any downstream op.
    """
    rate = F.lit(float(default_rate))
    for lang, p in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(float(p))).otherwise(rate)
    return docs.where(_uniform(F.col("doc_id").cast("string"), salt) < rate)


def shard_col(
    key: F.Column, n_shards: int = 8, salt: str = "seed0"
) -> F.Column:
    """Stable shard id in [0, n_shards): 28-bit md5 of (salt, key) mod N.
    The single engine-wide definition of "which shard does this document
    live in" — shared by :func:`shuffle_shards` (the query) and
    :func:`..sinks.corpus.write_training_corpus` (the materialized
    layout), so the written dataset agrees with the query's assignment."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}_shard"), key.cast("string"))),
                1, 7,
            ),
            16, 10,
        ).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")


def shuffle_shards(
    docs: DataFrame, n_shards: int = 8, salt: str = "seed0"
) -> DataFrame:
    """Deterministic global shuffle, expressed as (shard, position):
    documents are hash-assigned to ``n_shards`` shards and given a
    stable pseudo-random position within their shard — how a training
    job materializes shuffled epochs without a global sort.

    The within-shard ``row_number`` is the ONLY wide op and partitions
    by shard — at scale each shard orders independently (one shuffle,
    bounded by shard size), never a single global ordering task.
    Position ties are impossible: the sort key is (variate, doc_id).
    """
    u = _uniform(F.col("doc_id").cast("string"), salt)
    with_shard = docs.select(
        "doc_id",
        shard_col(F.col("doc_id"), n_shards, salt).alias("shard"),
        u.alias("_u"),
    )
    w = Window.partitionBy("shard").orderBy("_u", "doc_id")
    return with_shard.select(
        "doc_id", "shard", F.row_number().over(w).alias("position")
    )


def pack_token_ids(
    docs: DataFrame,
    vocab: DataFrame,
    oov_id: int,
    seq_len: int = 64,
    n_shards: int = 8,
    salt: str = "seed0",
) -> DataFrame:
    """The full tokenize→pack path: map documents to token ids
    (:func:`..text.tokenize_to_ids`), append an EOS id per document,
    concatenate documents WITHIN each md5 shard (doc_id order), and
    slice the shard's id stream into dense fixed-``seq_len`` training
    sequences — the exact tensor layout a trainer consumes. EOS id =
    ``oov_id + 1``.

    Returns exploded ``(shard, seq_id, pos_in_seq, token_id)``; the
    final (ragged) tail sequence of each shard is kept.

    Plan at scale: tokenization is the zero-shuffle broadcast-join pass;
    assembling per-doc id arrays is ONE shuffle — of INT IDS, ~4 bytes
    per token, not text; the shard-local prefix-sum window is the second
    (shard-bounded, never global — the pack_sequences scaling argument,
    including the n_shards ≥ f(corpus) sizing contract). The final
    explode is pipelined. Two integer-stream shuffles total.
    """
    from .text import tokenize_to_ids

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    eos_id = oov_id + 1
    toks = tokenize_to_ids(docs, vocab, oov_id)
    ids = toks.groupBy("doc_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, token_id))),"
            " s -> s.token_id)"
        ).alias("_ids")
    ).select(
        "doc_id",
        F.concat(F.col("_ids"), F.array(F.lit(eos_id))).alias("ids"),
    )
    with_shard = ids.select(
        "doc_id",
        shard_col(F.col("doc_id"), n_shards, salt).alias("shard"),
        "ids",
        F.size("ids").cast("bigint").alias("_n"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("_n").over(w), F.lit(0).cast("bigint"))
    tok = with_shard.withColumn("_off", off).select(
        "shard", "_off", F.posexplode("ids").alias("_i", "token_id")
    )
    gpos = F.col("_off") + F.col("_i")
    return tok.select(
        "shard",
        F.floor(gpos / F.lit(seq_len)).cast("bigint").alias("seq_id"),
        F.pmod(gpos, F.lit(seq_len)).cast("bigint").alias("pos_in_seq"),
        F.col("token_id").cast("int").alias("token_id"),
    )


def pack_sequences(
    chunks: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    salt: str = "seed0",
) -> DataFrame:
    """Greedy contiguous sequence packing: assign token chunks to
    fixed-capacity training bins — the sample-packing step that turns a
    cleaned, chunked corpus into dense model batches.

    Chunks are processed in deterministic order (doc_id, chunk_start)
    WITHIN a shard; a chunk's bin is the exclusive prefix-sum of tokens
    divided by ``capacity`` (contiguous fill — a bin may spill by less
    than one chunk, the standard streaming-packing tradeoff; no
    cross-chunk splitting).

    Scale: packing is a running sum, which is inherently sequential — so
    it runs per shard (the same md5 shards as the corpus layout), never
    globally: one shuffle on shard, each shard's window bounded by shard
    size. A global ORDER BY would serialize the corpus through one task.

    Shard-count contract: bin ids are a pure function of
    ``(chunk set, n_shards, salt, capacity)`` — stable across executor
    counts, partitionings, and re-runs (pinned by
    tests/test_plans.py::test_pack_sequences_deterministic_across_layouts),
    but NOT across different ``n_shards``/``salt`` (changing either
    reshuffles membership and renumbers bins — version them with the
    dataset, the way the corpus writer versions its layout). Size
    ``n_shards`` ≥ corpus_tokens / (capacity × ~10⁶) so each shard's
    sequential window stays executor-sized; at 100 TB that is O(10⁴)
    shards, far above the guard below.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_shard = chunks.select(
        "doc_id",
        "chunk_start",
        "n_chunk_tokens",
        shard_col(F.col("doc_id"), n_shards, salt).alias("shard"),
    )
    prefix = F.coalesce(
        F.sum("n_chunk_tokens").over(w), F.lit(0).cast("bigint")
    )
    return with_shard.withColumn(
        "bin_id", F.floor(prefix / F.lit(capacity)).cast("int")
    )
