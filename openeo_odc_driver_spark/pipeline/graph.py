"""Iterative graph analytics over relationally-derived graphs.

Complements the pointer-jumping connected components in
``pipeline/dedup.py`` (`near_dup_clusters`) with the other classic
distributed-graph primitive: damped score propagation (PageRank). The
reference has no graph surface; this extends the training-data/
analytics side the way a catalog-scale pipeline needs (influence /
centrality over co-occurrence graphs).

Engine-exactness discipline: all rank arithmetic is INTEGER micro-units
with explicit integer division — (r·85·w) DIV (100·deg) — so a DuckDB
twin written with the same unrolled iterations reproduces every score
bit-for-bit (no float damping, no order-sensitive double sums; the
per-target aggregation sums integers, which is order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_UNIT = 1_000_000  # one rank point, in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_BASE = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # 150000


def pagerank_integer(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Weighted PageRank over directed ``(src, dst, w)`` edges in exact
    integer micro-unit arithmetic, fixed ``iterations`` rounds.

    Per round: ``r'(v) = PR_BASE + Σ_{u→v} (r(u)·85·w(u,v)) DIV
    (100·deg(u))`` with ``deg(u) = Σ_v w(u,v)`` — the standard damped
    propagation with integer floor division in place of float math, so
    two engines (or two runs under different partitionings) produce
    identical scores. Every node that appears as a source gets the
    uniform start rank; sinks (dst-only nodes) still accumulate rank.

    Plan shape, and why it holds at scale: ``deg`` and the rank table
    are |V|-sized — small against the edge table for co-occurrence
    graphs — so each round is ONE join of edges against a broadcast
    rank×degree side plus one integer aggregation keyed by dst; the
    edge table itself is read once per round and never shuffles on a
    new key (dst-keyed aggregation reuses the same exchange layout
    every round). Iterations are a fixed small constant (the oracle
    unrolls the same rounds as CTEs), not a convergence loop.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    deg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("d"))
    ranks = deg.select(
        F.col("src").alias("pk"), F.lit(PR_UNIT).cast("bigint").alias("r")
    )
    e = edges.join(F.broadcast(deg), "src")
    for _ in range(iterations):
        contrib = e.join(
            F.broadcast(ranks), e.src == ranks.pk
        ).select(
            F.col("dst"),
            F.expr(
                f"(r * {PR_DAMP_NUM} * w) DIV ({PR_DAMP_DEN} * d)"
            ).alias("_c"),
        )
        ranks = contrib.groupBy("dst").agg(
            (F.lit(PR_BASE) + F.sum("_c")).cast("bigint").alias("r")
        ).select(F.col("dst").alias("pk"), "r")
    return ranks


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase edges between parts: for every order, each
    unordered pair of its distinct parts contributes one edge instance
    in BOTH directions; instances aggregate to ``(src, dst, w)``.

    The pair expansion is per-order (orders hold single-digit distinct
    parts, so the blow-up is bounded by order size², never corpus²) —
    the same within-group expansion discipline as the market-basket
    session pairs."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
