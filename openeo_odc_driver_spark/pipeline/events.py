"""Event-stream analytics over the ``events`` fixture table:
sessionization, funnel conversion, cohort retention — the classic
product-analytics trio, expressed as window/aggregate plans that hold at
clickstream scale (billions of events, millions of users).

All arithmetic is exact (timestamps, integer counts), so every query
carries a bit-exact DuckDB twin. Tie-breaks always include ``event_id``
— wall-clock collisions exist in any real event stream, and a
nondeterministic window order is the classic source of flaky
sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks where the gap to the
    user's previous event exceeds ``gap_minutes`` (the streaming
    ``session_counts`` operator's batch twin — same session rule).

    Per (user, session): event count, start/end, duration (µs, exact
    integer), distinct event types.

    Plan: ONE shuffle keyed by user_id serves both windows (lag +
    running sum — Spark evaluates them in a single Window stage over
    the same partitioning) and the final (user, session) aggregation is
    partial-aggregated on the already-co-located data. Sessions are
    user-bounded, so the window never sees more than one user's history
    — no global ordering anywhere.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # the fixture's ts is TIMESTAMP_NTZ (naive wall clock);
    # unix_micros needs TIMESTAMP, and under the registry's pinned-UTC
    # session the cast is the wall-clock identity. Differences are
    # zone-invariant either way; t_start/t_end keep the original type.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    brk = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    # windows can't nest in one expression: stage the break flag, then
    # running-sum it (same partitioning → still one Window stage pair
    # over one shuffle)
    with_brk = events.select(
        "user_id", "ts", "event_id", "event_type",
        us.alias("_us"), brk.alias("_brk"),
    )
    sess = F.sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = with_brk.select(
        "user_id", "ts", "event_id", "event_type", "_us",
        sess.alias("session_idx"),
    )
    return staged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        (F.max("_us") - F.min("_us")).cast("bigint").alias("duration_us"),
        F.countDistinct("event_type").alias("n_types"),
    ).withColumn("session_idx", F.col("session_idx").cast("int"))


def funnel_conversion(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered funnel: how many users performed step 1, then step 2
    strictly after their first step 1, then step 3 strictly after that
    first qualifying step 2, ... (first-touch semantics).

    Returns ``(step_idx, step, n_users)`` — the conversion curve.

    Plan: one user-keyed aggregation per step, each joining the
    previous step's first-qualifying timestamp (all shuffles keyed by
    user_id, so at scale every stage reuses the same hash
    partitioning); step tables shrink monotonically. No window over the
    full stream and no per-user event arrays — the plan carries one
    timestamp per (user, step).
    """
    spark = events.sparkSession
    reached = None  # DataFrame(user_id, _t): first qualifying time
    counts = []
    for idx, step in enumerate(steps):
        cand = events.where(F.col("event_type") == step)
        if reached is not None:
            cand = cand.join(reached, "user_id").where(
                F.col("ts") > F.col("_prev")
            )
        reached = (
            cand.groupBy("user_id")
            .agg(F.min("ts").alias("_t"))
            .select("user_id", F.col("_t").alias("_prev"))
        )
        counts.append((idx, step, reached))
    rows = [
        r.select(
            F.lit(i).alias("step_idx"),
            F.lit(s).alias("step"),
            F.countDistinct("user_id").alias("n_users"),
        )
        for i, s, r in counts
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event; for each (cohort week, week offset) count the distinct
    users active in that offset week.

    Week arithmetic is integer-exact (``date_trunc('week')`` is
    ISO-Monday in both engines; offsets via day-difference / 7). Plan:
    a tiny per-user first-event aggregate joins back (user-keyed — the
    funnel discipline), then one (cohort, offset) count-distinct.
    """
    first = events.groupBy("user_id").agg(F.min("ts").alias("_first"))
    cohorted = events.join(first, "user_id").select(
        "user_id",
        F.date_trunc("week", F.col("_first")).alias("cohort_week"),
        F.date_trunc("week", F.col("ts")).alias("_active_week"),
    )
    offset = (
        F.datediff(F.col("_active_week"), F.col("cohort_week")) / F.lit(7)
    ).cast("int")
    return (
        cohorted.select("user_id", "cohort_week", offset.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def anomaly_hours(events: DataFrame, z: int = 3) -> DataFrame:
    """Volume-anomaly detection on hourly event counts: per event type,
    flag hours whose count sits more than ``z`` population standard
    deviations from that type's hourly mean.

    The z-test is evaluated in PURE INTEGER arithmetic — the criterion
    (n − μ)² > z²σ² cross-multiplies to (k·n − S)² > z²·(k·Q − S²) with
    S = Σnᵢ, Q = Σnᵢ², k = observed hours — so the flag decision is
    bit-exact in any engine (no float mean/stddev, no sqrt). Hours with
    zero events are not materialized (and so never flagged): this is
    spike detection over the observed series.

    Plan: hourly counts (one shuffle), then a per-type census window +
    aggregate over the tiny (type, hour) table. At clickstream scale the
    hourly rollup is the only corpus-sized pass.
    """
    hourly = events.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    stats = hourly.select(
        "event_type", "hour", "n",
        F.count(F.lit(1)).over(w).alias("_k"),
        F.sum("n").over(w).alias("_s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("_q"),
    )
    lhs = (F.col("_k") * F.col("n") - F.col("_s"))
    flagged = (lhs * lhs) > (
        F.lit(z * z) * (F.col("_k") * F.col("_q") - F.col("_s") * F.col("_s"))
    )
    return stats.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(flagged.cast("bigint")).alias("n_anomalous"),
        F.max("n").alias("peak_count"),
    )


def top_session_paths(
    events: DataFrame, gap_minutes: int = 30, max_steps: int = 8, k: int = 10
) -> DataFrame:
    """Top-k session paths: the most common ordered event-type
    sequences per session (capped at ``max_steps``) — the navigation-
    pattern report funnels generalize to.

    Determinism: Spark's collect_list has no guaranteed order, so the
    path is assembled by sorting collected (µs, event_id, type) structs
    — (ts, event_id) is a total order — and the top-k tie-breaks on
    the path string. Plan: the sessionize window's single user-keyed
    shuffle, a (user, session) aggregation on co-located data, then a
    TakeOrdered top-k over path counts (path cardinality is bounded by
    type-alphabet^max_steps, and the count table is tiny next to the
    events).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    brk = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    with_brk = events.select(
        "user_id", "ts", "event_id", "event_type",
        us.alias("_us"), brk.alias("_brk"),
    )
    sess = F.sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = with_brk.select(
        "user_id", "event_type", "_us", "event_id",
        sess.alias("session_idx"),
    )
    path = F.array_join(
        F.expr(
            f"transform(slice(array_sort(collect_list("
            f"struct(_us, event_id, event_type))), 1, {max_steps}), "
            "s -> s.event_type)"
        ),
        ">",
    )
    paths = staged.groupBy("user_id", "session_idx").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def session_type_pairs(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Market-basket co-occurrence over sessions: for every unordered
    pair of event types, the number of sessions in which BOTH occur —
    the association-mining support table (which behaviors travel
    together within a visit).

    Plan: session labeling is the same one-shuffle user-keyed window
    pass as :func:`sessionize_events` (lag-gap break flag + running
    sum — identical session rule, identical (ts, event_id) tie-break).
    Each session then collapses to its DISTINCT type set (bounded by
    the event-type vocabulary, single digits — never by session
    length), pairs expand INSIDE that tiny sorted array via an indexed
    transform/slice (the `source_overlap_matrix` idiom: ≤|types|² rows
    per session, never a corpus self-join), and one aggregation counts
    support. `sort_array` on the collected set makes the expansion
    order-canonical, so type_a < type_b holds by construction and the
    plan is insensitive to collect_set's arrival order.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    brk = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    with_brk = events.select(
        "user_id", "ts", "event_id", "event_type", brk.alias("_brk")
    )
    sess = F.sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    labeled = with_brk.select("user_id", "event_type", sess.alias("_sess"))
    tsets = labeled.groupBy("user_id", "_sess").agg(
        F.sort_array(F.collect_set("event_type")).alias("_tset")
    )
    pairs = tsets.select(
        F.explode(
            F.expr(
                "flatten(transform(_tset, (a, i) -> "
                "transform(slice(_tset, i + 2, size(_tset)), "
                "b -> struct(a AS type_a, b AS type_b))))"
            )
        ).alias("_p")
    )
    return (
        pairs.select("_p.type_a", "_p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


def funnel_conversion_windowed(
    events: DataFrame, steps: list[str], within_hours: int
) -> DataFrame:
    """Time-bounded ordered funnel: like :func:`funnel_conversion`, but
    each step must occur STRICTLY AFTER the previous qualifying step
    AND within ``within_hours`` of it — the "converted within N hours"
    product-analytics question, where an eventual-but-late conversion
    no longer counts.

    Returns ``(step_idx, step, n_users)``. Same plan discipline as the
    unbounded funnel: one user-keyed aggregate per step gated on the
    previous step's first QUALIFYING timestamp (first-touch semantics —
    the earliest event satisfying both the order and the deadline),
    every shuffle on user_id, step tables shrinking monotonically.
    Timestamp arithmetic is exact integer microseconds.
    """
    if within_hours <= 0:
        raise ValueError(f"within_hours must be > 0, got {within_hours}")
    bound_us = within_hours * 3600 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    reached = None
    counts = []
    for idx, step in enumerate(steps):
        cand = events.where(F.col("event_type") == step).select(
            "user_id", us.alias("_us")
        )
        if reached is not None:
            cand = cand.join(reached, "user_id").where(
                (F.col("_us") > F.col("_prev"))
                & ((F.col("_us") - F.col("_prev")) <= bound_us)
            )
        reached = (
            cand.groupBy("user_id")
            .agg(F.min("_us").alias("_prev"))
        )
        counts.append((idx, step, reached))
    rows = [
        r.select(
            F.lit(i).alias("step_idx"),
            F.lit(s).alias("step"),
            F.countDistinct("user_id").alias("n_users"),
        )
        for i, s, r in counts
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def weekly_stickiness(events: DataFrame) -> DataFrame:
    """DAU/WAU stickiness per ISO week: how much of the weekly audience
    shows up on an average observed day — THE product-engagement ratio.

    Returns ``(week, n_days, sum_dau, wau, stickiness)`` where
    ``stickiness = sum_dau / (n_days · wau)`` — numerator and
    denominator are exact integers, so the ratio is ONE correctly-
    rounded IEEE division, engine-identical (the related_items
    discipline). Week boundaries via ``date_trunc('week')`` (ISO
    Monday in both engines).

    Plan: one (week, day) count-distinct and one (week) count-distinct
    — both shuffle on time-bucket keys whose cardinality is calendar-
    bounded, then a broadcast-sized join keyed by week.
    """
    week = F.date_trunc("week", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    daily = events.groupBy(week.alias("week"), day.alias("day")).agg(
        F.countDistinct("user_id").alias("_dau")
    )
    weekly = events.groupBy(week.alias("week")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    agg = daily.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("_dau").cast("bigint").alias("sum_dau"),
    )
    return agg.join(weekly, "week").select(
        "week",
        "n_days",
        "sum_dau",
        "wau",
        (
            F.col("sum_dau").cast("double")
            / (F.col("n_days") * F.col("wau")).cast("double")
        ).alias("stickiness"),
    )
