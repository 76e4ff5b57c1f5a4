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


def priority_sample(docs: DataFrame, k: int = 50, salt: str = "seed0") -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007): a weighted
    without-replacement sample of ``k`` documents where document i gets
    priority q_i = w_i / u_i (w = n_chars, u = the deterministic
    md5-uniform) and the k highest priorities win — the
    unbiased-subset-sum estimator a mixing pipeline uses to audit
    "what's in this corpus" without scanning it twice.

    Engine-portability: u is an exact dyadic rational (28-bit integer /
    2^28) and q is one IEEE division — no transcendentals, so Spark and
    any oracle produce bit-identical priorities. Ties are impossible
    (distinct doc_id ⇒ distinct u up to md5 collision) but doc_id breaks
    them anyway. u is clamped to ≥ 2^-28 before dividing: the 28-bit
    md5 prefix is exactly 0 with p≈3.7e-9 per doc, and w/0.0 is +Inf in
    Spark but engine-dependent in DuckDB (IEEE setting) — the clamp
    (mirrored in the oracle expression) removes the latent mismatch.

    Plan: priorities are scan-fused expressions; the global top-k is
    ``TakeOrderedAndProject`` — per-partition heaps of size k merged on
    the driver, no global sort, no shuffle of the corpus. The same plan
    shape as ``vocab_top_terms``, which is exactly why it scales.
    """
    u = F.greatest(
        _uniform(F.col("doc_id").cast("string"), salt),
        F.lit(1.0 / _HASH_SPACE),
    )
    pri = F.col("n_chars").cast("double") / u
    return (
        docs.select("doc_id", "lang", "source", "n_chars", pri.alias("priority"))
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(k)
    )


def temperature_sample_langs(
    docs: DataFrame, alpha: float = 0.5, salt: str = "seed0"
) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-corpus
    mixing rule of mBERT/XLM-R, p_l ∝ n_l^α): keep each
    language at rate r_l = (n_min / n_l)^α, so the rarest language
    survives intact and dominant languages are downsampled toward
    balance. α=1 keeps the natural distribution; α=0 forces uniform.

    Only α=0.5 is offered through the registry gate: r_l = sqrt(n_min /
    n_l) is one exact-rounded division plus one correctly-rounded sqrt
    (IEEE 754 requires it), so the keep/drop decision is bit-identical
    in any engine — no pow() portability caveat.

    Plan: the language census is a tiny two-phase aggregate (rows =
    languages); rates join back via broadcast; the corpus itself is
    filtered at scan speed with zero shuffles. The decision for a given
    (doc_id, salt) never changes across runs, executor counts, or
    engines — the same determinism contract as ``sample_stratified``.
    """
    return temperature_sample_by(docs, "lang", alpha=alpha, salt=salt)


def temperature_sample_by(
    docs: DataFrame, group_col: str, alpha: float = 0.5, salt: str = "seed0"
) -> DataFrame:
    """The generalized form of :func:`temperature_sample_langs` for any
    grouping column — ``group_col="source"`` gives Pile-style domain
    rebalancing with the identical engine-exact sqrt keep-rate rule and
    the identical plan (tiny census, broadcast rates, scan-speed
    filter, zero corpus shuffles)."""
    if abs(alpha - 0.5) > 1e-12:
        raise NotImplementedError(
            "only alpha=0.5 (sqrt) is engine-portable; see docstring"
        )
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        group_col,
        F.sqrt(F.col("_n_min").cast("double") / F.col("_n").cast("double")).alias(
            "keep_rate"
        ),
    )
    u = _uniform(F.col("doc_id").cast("string"), salt)
    return (
        docs.join(F.broadcast(rates), group_col)
        .where(u < F.col("keep_rate"))
        .select("doc_id", "lang", "source", "keep_rate")
    )


def select_token_budget(
    scored: DataFrame, budget_tokens: int, bucket_div: int = 1000
) -> DataFrame:
    """Data selection under a token budget: keep the best-scored
    documents whose cumulative token count fits ``budget_tokens`` —
    the step that turns "score every document" into "the N-token
    training mix", selecting by quality until the budget is spent.

    Input: ``(doc_id, margin_fp, n_tokens)`` (integer micro-unit score,
    e.g. quality_classifier_score's logit). Selection rule (exact,
    deterministic, and what the oracle mirrors): order documents by
    ``(score_bucket DESC, doc_id ASC)`` where ``score_bucket =
    floor(margin_fp / bucket_div)``; keep the maximal prefix whose
    running token total stays ≤ budget.

    Scale plan — the naive form is a GLOBAL ordered cumulative sum
    (single-partition window, the classic scale-killer). Instead:
    (1) one bucket-keyed aggregation builds the (bucket, n_docs,
    sum_tokens) histogram — bounded by the score range / bucket_div,
    NOT by corpus size; (2) the driver walks the tiny histogram to find
    the cutoff bucket and the token headroom; (3) buckets above the
    cutoff pass through with no further work (their full prefix fits
    by construction); (4) ONLY the cutoff bucket runs an ordered
    cumulative sum, windowed WITHIN that single bucket. The corpus
    never sees a global sort; the one window touches one bucket's rows.
    Bucket-level floor-division is pure integer arithmetic
    (``(m - pmod(m, d)) / d``) so negative scores bucket identically
    cross-engine.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    m = F.col("margin_fp")
    pm = ((m % bucket_div) + bucket_div) % bucket_div
    d = scored.withColumn(
        "_bkt", ((m - pm) / bucket_div).cast("bigint")
    )
    hist = (
        d.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_toks"))
        .collect()
    )
    remaining = budget_tokens
    cutoff = None  # bucket where the budget crosses
    full_above = []  # buckets kept whole
    for r in sorted(hist, key=lambda r: -r._bkt):
        if r._toks <= remaining:
            full_above.append(r._bkt)
            remaining -= r._toks
        else:
            cutoff = r._bkt
            break
    out_cols = [c for c in scored.columns]
    kept = d.where(F.col("_bkt").isin(full_above) if full_above else F.lit(False))
    if cutoff is not None:
        w = (
            Window.partitionBy("_bkt")
            .orderBy(F.asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        partial = (
            d.where(F.col("_bkt") == cutoff)
            .withColumn("_cum", F.sum("n_tokens").over(w))
            .where(F.col("_cum") <= F.lit(remaining))
        )
        kept = kept.unionByName(partial.select(*d.columns))
    return kept.select(*out_cols)


def assign_splits(
    docs: DataFrame,
    bounds: tuple = (("train", 0.9), ("val", 0.95), ("test", 1.0)),
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment: a document's split is
    decided by where its md5-uniform variate falls among CUMULATIVE
    upper bounds (("train", .9), ("val", .95), ("test", 1.0)) — the
    eval-leakage-proof split every training pipeline needs. Bounds are
    passed cumulative, not as fractions, so no float accumulation
    happens inside the operator: the literals compared against the
    uniform are exactly the ones the caller wrote, and the same
    literals appear verbatim in the oracle SQL.

    Properties that matter at corpus scale: the decision is a pure
    function of (doc_id, salt) — stable across runs, engines,
    partitionings, and corpus growth (a new document never moves an old
    one between splits, unlike modulo-on-row-number schemes); and it is
    ONE codegen'd projection over the scan — no shuffle, no state, no
    sampling pass. Compose with a `.where(split = ...)` to materialize
    any split; the predicate stays scan-pushable.
    """
    names = [n for n, _ in bounds]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    ubs = [b for _, b in bounds]
    if ubs[-1] != 1.0 or any(b2 <= b1 for b1, b2 in zip(ubs, ubs[1:])) or ubs[0] <= 0.0:
        raise ValueError(
            f"bounds must be strictly increasing in (0, 1] ending at 1.0, got {ubs}"
        )
    u = _uniform(F.col("doc_id").cast("string"), salt)
    expr = None
    for name, ub in bounds[:-1]:
        cond = u < F.lit(float(ub))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = expr.otherwise(bounds[-1][0]) if expr is not None else F.lit(bounds[-1][0])
    return docs.withColumn("split", split)


def select_token_budget_by(
    scored: DataFrame,
    budgets: dict,
    group_col: str = "source",
    bucket_div: int = 1000,
) -> DataFrame:
    """Per-domain data selection under per-domain token budgets: within
    each group, keep the best-scored documents whose cumulative tokens
    fit that group's budget — the Pile/Dolma-style mixing step where
    every domain gets its own token allowance instead of one global
    pot. Groups absent from ``budgets`` are dropped (budget 0).

    Selection rule per group = :func:`select_token_budget`'s rule
    (order by score bucket DESC then doc_id ASC, maximal prefix whose
    running token total fits), so the oracle's per-group windowed
    cumulative-sum form is provably identical: token counts are
    positive, the running sum is monotone, and the prefix cut is the
    same point.

    Scale plan, generalized from the single-budget op: ONE
    (group, bucket)-keyed histogram aggregation — bounded by
    |groups| × score range / bucket_div, not corpus size — a driver
    walk over that tiny table per group, full buckets pass through via
    a broadcast (group, bucket) keep-list semi-join, and ONLY each
    group's cutoff bucket runs an ordered window, partitioned by
    (group, bucket) so even the cutoff work is group-parallel. Never a
    global sort; never a single-partition window.
    """
    if not budgets:
        raise ValueError("budgets must be a non-empty {group: tokens} dict")
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {g!r} must be >= 0, got {b}")
    spark = scored.sparkSession
    m = F.col("margin_fp")
    pm = ((m % bucket_div) + bucket_div) % bucket_div
    d = scored.withColumn("_bkt", ((m - pm) / bucket_div).cast("bigint"))
    hist = (
        d.groupBy(group_col, "_bkt")
        .agg(F.sum("n_tokens").alias("_toks"))
        .collect()
    )
    by_group: dict = {}
    for r in hist:
        by_group.setdefault(r[group_col], []).append((r._bkt, r._toks))
    full_pairs = []   # (group, bucket) kept whole
    cut_rows = []     # (group, bucket, headroom) for the partial bucket
    for g, rows in by_group.items():
        remaining = int(budgets.get(g, 0))
        for bkt, toks in sorted(rows, key=lambda t: -t[0]):
            if toks <= remaining:
                full_pairs.append((g, bkt))
                remaining -= toks
            else:
                if remaining > 0:
                    cut_rows.append((g, bkt, remaining))
                break
    out_cols = list(scored.columns)
    if full_pairs:
        keep = spark.createDataFrame(
            full_pairs, f"{group_col} string, _bkt long"
        )
        kept = d.join(F.broadcast(keep), [group_col, "_bkt"], "left_semi")
    else:
        kept = d.where(F.lit(False))
    if cut_rows:
        cuts = spark.createDataFrame(
            cut_rows, f"{group_col} string, _bkt long, _headroom long"
        )
        w = (
            Window.partitionBy(group_col, "_bkt")
            .orderBy(F.asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        partial = (
            d.join(F.broadcast(cuts), [group_col, "_bkt"])
            .withColumn("_cum", F.sum("n_tokens").over(w))
            .where(F.col("_cum") <= F.col("_headroom"))
        )
        kept = kept.unionByName(partial.select(*d.columns))
    return kept.select(*out_cols)


def pack_token_ids_spans(
    docs: DataFrame,
    vocab: DataFrame,
    oov_id: int,
    seq_len: int = 64,
    n_shards: int = 8,
    salt: str = "seed0",
) -> DataFrame:
    """Document-boundary spans of :func:`pack_token_ids`'s packed
    stream — the attention/loss-mask metadata a trainer needs beside
    the token tensor: for every packed sequence, which document
    occupies which region. Output one row per (document × sequence it
    touches): ``(shard, seq_id, doc_id, start, len)`` with ``start`` the
    document's first position inside that sequence and ``len`` its
    token count there (EOS included, matching the packed stream).
    Within a sequence the spans tile [0, seq_len) exactly (the ragged
    shard tail tiles [0, tail)) — pinned in pytest against the packed
    stream itself.

    Plan: the packing arithmetic of :func:`pack_token_ids` (same shard
    assignment, same doc_id order, same offsets window), but at
    DOCUMENT granularity — tokenization only contributes per-doc
    COUNTS, so the heavy token stream never materializes: one count
    aggregation, the shard-bounded offsets window, and a per-doc
    explode over the ≤ (n/seq_len + 1) sequences the doc touches.
    Strictly cheaper than the packing itself."""
    from .text import tokenize_to_ids

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    L = int(seq_len)
    toks = tokenize_to_ids(docs, vocab, oov_id)
    # +1: the per-document EOS the packed stream appends
    n = toks.groupBy("doc_id").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("_n")
    )
    with_shard = n.select(
        "doc_id", shard_col(F.col("doc_id"), n_shards, salt).alias("shard"),
        "_n",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("_n").over(w), F.lit(0).cast("bigint"))
    d = with_shard.withColumn("_off", off)
    s_lo = F.floor(F.col("_off") / L).cast("bigint")
    s_hi = F.floor((F.col("_off") + F.col("_n") - 1) / L).cast("bigint")
    sp = d.select(
        "shard", "doc_id", "_off", "_n",
        F.explode(F.sequence(s_lo, s_hi)).alias("seq_id"),
    )
    start = F.greatest(
        F.col("_off") - F.col("seq_id") * L, F.lit(0).cast("bigint")
    )
    length = F.least(
        F.col("_off") + F.col("_n"), (F.col("seq_id") + 1) * L
    ) - F.greatest(F.col("_off"), F.col("seq_id") * L)
    return sp.select(
        "shard",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        start.cast("bigint").alias("start"),
        length.cast("bigint").alias("len"),
    )


def mix_epochs(
    docs: DataFrame,
    epochs: dict[str, float],
    by: str = "source",
    salt: str = "seed0",
    default_epochs: float = 1.0,
) -> DataFrame:
    """Epoch-weighted source mixing — the Pile/Dolma recipe step where
    each source is seen a FRACTIONAL number of times per training run
    (e.g. books 2.25 epochs, web 0.5): every document in group ``g``
    is emitted ``floor(e_g)`` times plus one more copy when its
    deterministic md5-uniform falls below ``frac(e_g)``, so the
    expected group volume is exactly ``e_g · |g|`` and every decision
    is a pure function of (doc_id, salt) — corpus growth never flips
    an existing document's copy count (the :func:`assign_splits`
    determinism contract). Output ``(doc_id, <by>, copy)`` with copy
    indices 0..k−1; downstream shuffling/packing treats copies as
    independent documents.

    Plan: a literal CASE over the group column (broadcast-free — the
    recipe is a query constant), one codegen projection for the copy
    count, one pipelined explode of ``sequence(0, k−1)``. Zero
    exchanges; the corpus text never moves."""
    e_expr = F.lit(float(default_epochs))
    for k in sorted(epochs):
        e_expr = (
            F.when(F.col(by) == k, F.lit(float(epochs[k]))).otherwise(e_expr)
        )
    base = F.floor(e_expr).cast("bigint")
    frac = e_expr - F.floor(e_expr)
    extra = (
        _uniform(F.col("doc_id").cast("string"), salt) < frac
    ).cast("bigint")
    n = (base + extra).alias("_n")
    return (
        docs.select("doc_id", by, n)
        .where(F.col("_n") > 0)
        .select(
            "doc_id", by,
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("_n") - 1)
            ).alias("copy"),
        )
    )
