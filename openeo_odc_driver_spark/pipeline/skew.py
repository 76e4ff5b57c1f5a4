"""Targeted key salting for skewed joins — the manual tool behind the
"hot LSH bucket / boilerplate key" caveats in PLANS.md.

AQE's skew-join splitting (on by default in the session) handles most
cases at runtime by splitting oversized SORT-MERGE partitions; salting
is the explicit, planner-independent version for when a join key's
distribution is known to be pathological (a boilerplate band bucket
holding 1% of a 100 TB corpus) or when the join is broadcast-side and
AQE's splitter doesn't apply. The trade is explicit: the build side is
REPLICATED ``n_salts``× for the hot keys only, in exchange for the
probe side's hot rows spreading over ``n_salts`` tasks.

Determinism: salt assignment derives from the md5-uniform of a caller
supplied row key (never ``rand()``), so retries and the DuckDB oracle
see the same placement — the sampling-module discipline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .sampling import _uniform


def salt_skewed_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    hot_keys: Sequence,
    probe_row_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``probe ⋈ build`` on ``key`` with the listed hot
    keys salted: probe rows with a hot key scatter over ``n_salts``
    sub-keys (deterministic md5 of ``probe_row_key``), build rows with a
    hot key are replicated once per salt, and everything else joins on
    salt 0 with zero overhead. Result set is provably identical to the
    unsalted join (pytest-pinned); only the task-level distribution of
    the hot key's work changes — max task input for a hot key drops by
    ~``n_salts``×.

    ``hot_keys`` comes from the corpus's own statistics (e.g. a
    ``count_min_heavy_grams``-style heavy-hitter pass, or the output of
    a previous run's skew diagnostics) — at 100 TB you know your
    boilerplate keys; enumerate them, don't salt the world.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        # right/full outer would surface each of the n_salts replicated
        # build rows for an unmatched hot key as its own output row —
        # silent duplication, so refuse rather than mis-join.
        raise ValueError(
            f"salt_skewed_join supports how='inner'|'left', got {how!r}: "
            "build-side replication breaks right/full outer semantics"
        )
    hot = F.array(*[F.lit(k) for k in hot_keys])
    probe_salt = F.when(
        F.array_contains(hot, F.col(key)),
        F.floor(
            _uniform(F.col(probe_row_key).cast("string"), "salt0")
            * F.lit(float(n_salts))
        ).cast("int"),
    ).otherwise(F.lit(0))
    p = probe.withColumn("_salt", probe_salt)
    b = build.withColumn(
        "_salts",
        F.when(
            F.array_contains(hot, F.col(key)),
            F.expr(f"sequence(0, {n_salts - 1})"),
        ).otherwise(F.array(F.lit(0))),
    ).select("*", F.explode("_salts").alias("_salt")).drop("_salts")
    return p.join(b, [key, "_salt"], how).drop("_salt")
