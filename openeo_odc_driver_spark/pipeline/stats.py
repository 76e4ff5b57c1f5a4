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

# HLL++ relative standard deviation we request; the gate allows 3 sigma.
HLL_RSD = 0.05
# percentile_approx accuracy parameter: rank error <= n / PCTL_ACCURACY.
PCTL_ACCURACY = 1000


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
