"""Sketch-based corpus statistics — the reporting pass of a training-data
pipeline at 100 TB.

Exact ``COUNT(DISTINCT ...)`` and exact percentiles over a 100 TB corpus
force a full shuffle of the distinct keys (or a per-group sort); the
at-scale idiom is one pass with mergeable sketches: HyperLogLog++
(``approx_count_distinct``) and the Greenwald-Khanna/KLL-style quantile
sketch (``percentile_approx``). Both are Spark built-ins: partial sketches
merge map-side, so the shuffle carries O(sketch) bytes per group instead
of O(distinct values).

Sketch outputs are engine-specific (DuckDB's approx functions use
different estimators), so the oracle contract is a **bounds gate**, same
pattern as ann_recall: the query computes the sketch AND the exact value
at fixture scale and emits whether the sketch landed inside its
documented error envelope; the oracle asserts the exact columns and
``TRUE`` for every gate. A refactor that silently degrades sketch
accuracy flips the boolean and fails the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .parallel import ensure_min_parallelism

# HLL++ relative standard deviation we request; the gate allows 3 sigma.
HLL_RSD = 0.05
# percentile_approx accuracy parameter: rank error <= n / PCTL_ACCURACY.
PCTL_ACCURACY = 1000


def domain_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus accounting: the report every ingest pipeline
    emits before mixing decisions — document count, token volume,
    exact-duplicate rate, mean document length per source/domain.

    One aggregation keyed by ``source``; all measures partial-aggregate
    map-side except the exact distinct (two-phase). At 100 TB the exact
    ``countDistinct(md5)`` branch is swapped for ``approx_count_distinct``
    (see :func:`corpus_stats_sketch` for the gated-sketch idiom) — source
    cardinality itself is tiny (domains, not documents), so the final
    reduce is never the bottleneck.
    """
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("bigint")).alias("n_tokens"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_unique"),
        (
            F.lit(1.0)
            - F.countDistinct(F.md5(F.col("text")))
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
        (F.sum(F.col("n_chars")) / F.count(F.lit(1))).alias("avg_chars"),
    )


# Count-min sketch geometry: d independent rows × w buckets. Estimates
# only ever overestimate (hash collisions add), so `est >= exact` always
# and the gap shrinks as w grows relative to distinct grams.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(gram: F.Column, row: int) -> F.Column:
    """Bucket of ``gram`` under the row-th pairwise-independent hash:
    a 28-bit md5 prefix of (row-salt || gram) mod width — the same
    engine-portable md5-uniform idiom as ``sampling._uniform``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), gram)), 1, 7), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(CMS_WIDTH)).cast("int")


def count_min_heavy_grams(docs: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Heavy-hitter n-grams with a count-min-sketch estimate alongside
    the exact count — (gram, n BIGINT, cms_est BIGINT), top-``k`` by
    exact count (ties broken by gram).

    The sketch is the at-scale half: token n-grams stream into a fixed
    d×w = CMS_DEPTH×CMS_WIDTH cell grid whose partial counts combine map-side, so
    the sketch shuffle carries at most d·w rows REGARDLESS of corpus
    size — the mergeable-summary property that lets 1000 executors
    maintain global gram frequencies without shuffling the gram stream.
    The exact top-k pass (hash-aggregate + TakeOrdered) runs alongside
    at fixture scale so the oracle pins the sketch: every estimate is
    computed by the same min-over-rows lookup a production reader would
    use, and CMS guarantees ``cms_est >= n`` with equality when the
    gram's d buckets are collision-free.
    """
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # sequence(1, 0) is DESCENDING in Spark, so short docs need the guard
    grams_expr = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> array_join(slice(_toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    grams = (
        docs.select(toks.alias("_toks"))
        .select(F.explode(grams_expr).alias("gram"))
    )
    # ONE aggregation of the gram stream; both the sketch and the top-k
    # derive from the (gram, n) table, so the 4 bucket md5s are computed
    # per DISTINCT gram, not per occurrence (a pure-relational rewrite —
    # summing n into cells equals counting occurrences; measured 1.45 s
    # → 1.2 s warm at sf0.1, and the gap grows with duplication factor).
    gram_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    rows = F.array(*[
        F.struct(F.lit(j).alias("row"), _cms_bucket(F.col("gram"), j).alias("bucket"))
        for j in range(CMS_DEPTH)
    ])
    sketch = (
        gram_counts.select("n", F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("n").alias("cell"))
    )
    # exact candidates: TakeOrderedAndProject over the same table
    top = gram_counts.orderBy(F.desc("n"), F.asc("gram")).limit(k)
    # estimate = min over rows of the candidate's cell; candidates and
    # the sketch are both tiny -> broadcast joins
    cand = top.select(
        "gram", "n", F.explode(rows.alias("_")).alias("rb")
    ).select("gram", "n", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    est = (
        cand.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("gram", "n")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.select("gram", F.col("n").cast("bigint").alias("n"),
                      F.col("cms_est").cast("bigint").alias("cms_est"))


def corpus_stats_sketch(docs: DataFrame) -> DataFrame:
    """Per-language corpus report: doc count, distinct sources
    (exact + HLL gate), median text length (exact + quantile-sketch gate).

    At 100 TB the exact branches are dropped and only the sketches run —
    one aggregation, no distinct-key shuffle; here they run side by side
    so the driver gate pins the sketches inside their error envelopes.
    """
    length = F.length("text")
    exact_distinct = F.countDistinct("source")
    approx_distinct = F.approx_count_distinct("source", HLL_RSD)
    exact_p50 = F.expr("percentile(length(text), 0.5D)")
    approx_p50 = F.percentile_approx(length, F.lit(0.5), F.lit(PCTL_ACCURACY))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        exact_distinct.alias("n_sources"),
        (
            F.abs(approx_distinct - exact_distinct)
            <= F.greatest(
                exact_distinct * F.lit(3.0 * HLL_RSD), F.lit(1.0)
            )
        ).alias("hll_ok"),
        exact_p50.alias("p50_len"),
        (
            F.abs(approx_p50 - exact_p50)
            # rank error n/accuracy translates to a value band; fixture
            # lengths are dense enough that 5% of the exact value + a
            # 5-char absolute floor bounds it comfortably
            <= F.abs(exact_p50) * F.lit(0.05) + F.lit(5.0)
        ).alias("pctl_ok"),
    )


def incremental_corpus_stats(docs: DataFrame, n_batches: int = 3) -> DataFrame:
    """Cross-batch corpus statistics via MERGEABLE sketches — the
    incremental half of :func:`corpus_stats_sketch`: per ingest batch a
    tiny stats row (counts + a DataSketches HLL binary,
    ``hll_sketch_agg``) is materialized, and corpus-wide numbers come
    from ``hll_union_agg`` over those rows — NO rescan of earlier
    batches, which is the only viable shape when yesterday's 100 TB is
    already cold.

    Here the batches are simulated as ``doc_id % n_batches`` partitions
    of the fixture; the union's distinct-count estimate is gated against
    the exact value (the corpus_stats_sketch error-envelope idiom), so
    the driver pins that sketch merge actually works: a merge bug or
    accuracy regression flips ``hll_ok``.

    Scale: per-batch rows are O(languages); the final merge aggregates
    O(batches × languages) sketch binaries — bytes, not documents.
    """
    batch = F.pmod(F.col("doc_id"), F.lit(n_batches))
    per_batch = (
        docs.withColumn("_batch", batch)
        .groupBy("_batch", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast("bigint")).alias("n_chars"),
            F.hll_sketch_agg(F.md5(F.col("text"))).alias("sketch"),
        )
    )
    merged = per_batch.groupBy("lang").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("_est"),
    )
    exact = docs.groupBy("lang").agg(
        F.countDistinct(F.md5(F.col("text"))).alias("n_unique")
    )
    return (
        merged.join(exact, "lang")
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("n_unique").cast("bigint").alias("n_unique"),
            (
                F.abs(F.col("_est") - F.col("n_unique"))
                <= F.greatest(
                    F.col("n_unique") * F.lit(0.05), F.lit(2.0)
                )
            ).alias("hll_ok"),
        )
    )


def token_length_histogram(docs: DataFrame) -> DataFrame:
    """Log2-bucketed document-length histogram — the corpus length
    profile (truncation/padding planning, outlier triage: the 2^17+
    bucket is where the concatenated-garbage documents live).

    Bucket = floor(log2(n_tokens)) computed as the BIT LENGTH of the
    integer token count (63 − leading zeros), so the bucket decision is
    pure integer arithmetic — no float log whose last ulp could flip a
    power-of-two boundary doc cross-engine. Zero-token docs land in
    bucket −1. One scan-fused projection + one tiny aggregation keyed
    by ≤ ~20 buckets.
    """
    docs = ensure_min_parallelism(docs)
    # split('') is [''] (size 1) in BOTH engines, so empty/whitespace-
    # only text must be gated on trimmed length to truly count 0 tokens
    # (round-8 ADVICE fix: the n <= 0 branch was unreachable and empty
    # docs silently counted as 1-token docs)
    n = F.when(
        F.length(F.trim("text")) == 0, F.lit(0)
    ).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    ).cast("bigint")
    # floor(log2(n)) for n >= 1 = (binary digit count of n) - 1; the
    # length of bin(n) IS the digit count, all-integer on both engines
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        (F.length(F.expr("bin(size(split(trim(text), '\\\\s+')))")) - 1)
        .cast("int")
    )
    return (
        docs.select(bucket.alias("log2_bucket"), n.alias("_n"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("sum_tokens"),
            F.min("_n").alias("min_tokens"),
            F.max("_n").alias("max_tokens"),
        )
    )


def source_overlap_matrix(docs: DataFrame) -> DataFrame:
    """Cross-source content overlap: for every source pair (a < b), how
    many distinct texts appear verbatim in BOTH — the mirror-detection
    / syndication report that tells a pipeline which domains to dedup
    against each other first.

    Plan: one hash-aggregate collects each content hash's distinct
    source set (set size bounded by |sources|, not corpus size), pairs
    expand WITHIN each hash's tiny set (never a corpus self-join), and
    the final census is keyed by at most |sources|² pairs. The corpus
    shuffles once, as (hash, source) — text never moves.
    """
    hs = (
        docs.select(F.md5("text").alias("_h"), "source")
        .dropDuplicates()
        .groupBy("_h")
        .agg(F.array_sort(F.collect_set("source")).alias("_srcs"))
        .where(F.size("_srcs") >= 2)
    )
    pairs = hs.select(
        F.explode(
            F.expr(
                "flatten(transform(_srcs, (a, i) -> "
                "transform(slice(_srcs, i + 2, size(_srcs)), "
                "b -> struct(a AS src_a, b AS src_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
    )
