"""Map-side parallelism guard for CPU-heavy scan-fused operators.

At fixture scale a whole table is one parquet row group, so a zero-
exchange projection — the ideal 100 TB plan — runs on ONE core while 31
idle. At production scale inputs arrive in thousands of row groups and
the guard is a no-op (the condition compares scan partitions against
the cluster's parallelism, not a constant). First applied to
minhash_signatures (measured 2.7 s → 0.4 s warm at sf0.1) and
cdc_chunks; round 7 extends it to the per-document text ops whose gram/
line transforms dominate their runtime.

Only ORDER-INSENSITIVE operators may use this: a repartition reorders
rows, so any consumer summing non-dyadic doubles across rows would
drift in the last ulp against the oracle. Per-document projections and
integer aggregations qualify; corpus-level double sums do not
(unigram/bigram_logprob keep their scan partitioning for exactly this
reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 4) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism when the
    source scan has ``factor``x fewer partitions than cores. The moved
    bytes are the raw input — tiny relative to the CPU work this
    unlocks — and the branch is a no-op on production inputs."""
    if df.isStreaming:
        # no .rdd on an unstarted streaming plan; micro-batch sources
        # already split by the stream reader's own partitioning
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() * factor <= sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
