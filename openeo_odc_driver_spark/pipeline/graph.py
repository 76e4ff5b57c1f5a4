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

from pyspark.sql import DataFrame, Window, functions as F

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


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection over directed
    weighted ``(src, dst, w)`` edges, fixed ``iterations`` rounds,
    fully deterministic: a node adopts the label with the greatest
    incident edge weight among its in-neighbors' labels, ties broken
    by the SMALLEST label — so the whole run is a pure function of the
    edge set (no randomized update order, which is what makes vanilla
    LPA unreproducible and oracle-unfriendly).

    Returns ``(pk, label)`` per node. Integer weights sum order-free;
    the argmax is a row_number window over (weight DESC, label ASC) —
    the same expression both engines evaluate identically.

    Plan: per round, one join of edges against the broadcast |V|-sized
    label table, one (dst, label) weight aggregation, and one
    dst-partitioned top-1 window over the (≤ neighbors-per-node)
    aggregated rows. Fixed-round synchronous updates match the
    oracle's unrolled-CTE form exactly.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    labels = (
        edges.select("src").distinct().select(
            F.col("src").alias("pk"), F.col("src").alias("label")
        )
    )
    w_top = Window.partitionBy("dst").orderBy(
        F.desc("_wsum"), F.asc("label")
    )
    for _ in range(iterations):
        votes = (
            edges.join(F.broadcast(labels), edges.src == labels.pk)
            .groupBy("dst", "label")
            .agg(F.sum("w").cast("bigint").alias("_wsum"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w_top))
            .where(F.col("_rn") == 1)
            .select(F.col("dst").alias("pk"), "label")
        )
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected graph given as
    symmetric directed ``(src, dst, w)`` edges (weights ignored).

    Returns a single row ``(n_triangles)``.

    Plan — the degree-ORIENTED algorithm, not the naive triple join:
    each undirected edge is kept once, oriented from the endpoint with
    smaller (degree, id) toward the larger. Every triangle then has
    exactly ONE wedge node with two outgoing oriented edges, so
    counting = join the oriented list with itself on the wedge node
    and probe the third side. Orientation bounds each node's out-list
    by O(√E) (a node of degree d only points to ≥-degree nodes), so
    the wedge join fans out to O(E^1.5) total instead of Σ d² — the
    standard distributed-triangle discipline. The oracle states the
    same count as the naive a<b<c triple join, which the fixture scale
    affords; both are exact integers.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    e = (
        edges.where(F.col("src") < F.col("dst"))
        .join(F.broadcast(deg).withColumnRenamed("src", "_sk"),
              F.col("src") == F.col("_sk"))
        .withColumnRenamed("_d", "_da")
        .drop("_sk")
        .join(F.broadcast(deg).withColumnRenamed("src", "_dk"),
              F.col("dst") == F.col("_dk"))
        .withColumnRenamed("_d", "_db")
        .drop("_dk")
    )
    lo_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )
    a, b = oriented.alias("a"), oriented.alias("b")
    # wedge pairs canonicalized by node id (a.v < b.v), so the closing
    # edge can be probed in the ID-canonical undirected list with a pure
    # EQUI-join — a disjunctive "either orientation" condition here
    # would degrade to a nested-loop join and explode on dense graphs
    wedges = a.join(
        b,
        (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v")),
    ).select(F.col("a.v").alias("x"), F.col("b.v").alias("y"))
    und = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("x2"), F.col("dst").alias("y2")
    )
    closed = wedges.join(
        und, (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2"))
    )
    return closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def related_items(edges: DataFrame, k: int = 5) -> DataFrame:
    """Item-item collaborative filtering over the co-occurrence graph:
    for every node, the top-``k`` neighbors by cosine association
    ``w(a,b)² / (deg(a)·deg(b))`` — the "customers who bought this
    also bought" table, computed purely from the edge list.

    Exactness: the score is ONE IEEE division of two exact integers
    (w² and deg·deg), which is correctly rounded and therefore
    identical in any engine — no sums of floats anywhere. Ties break
    on the neighbor id, so the top-k edge is deterministic.

    Plan: two broadcast joins decorate each edge with its endpoint
    degrees (|V|-sized degree table), then ONE window partitioned by
    src takes the top-k — bounded output |V|·k, never a node² table.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    deg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("_d"))
    e = (
        edges.join(
            F.broadcast(deg).select(F.col("src").alias("_sk"), F.col("_d").alias("_da")),
            F.col("src") == F.col("_sk"),
        )
        .drop("_sk")
        .join(
            F.broadcast(deg).select(F.col("src").alias("_dk"), F.col("_d").alias("_db")),
            F.col("dst") == F.col("_dk"),
        )
        .drop("_dk")
    )
    score = (F.col("w") * F.col("w")).cast("double") / (
        F.col("_da") * F.col("_db")
    ).cast("double")
    w_top = Window.partitionBy("src").orderBy(
        F.desc("_score"), F.asc("dst")
    )
    return (
        e.withColumn("_score", score)
        .withColumn("_rn", F.row_number().over(w_top))
        .where(F.col("_rn") <= k)
        .select("src", "dst", F.col("_score").alias("score"),
                F.col("_rn").cast("int").alias("rank"))
    )
