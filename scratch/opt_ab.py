"""Round-15 optimization A/B harness: interleaved same-session legs
(the only wall comparison this box supports — see verify skill), old vs
new implementation of each optimized path, System.gc between runs,
best-of-N, noop sink. Also asserts once per pair that both legs return
IDENTICAL rows (sorted collect), so the perf claim and the
no-result-change claim ride the same script.

Usage: python scratch/opt_ab.py <pair> [rounds]
Pairs are registered in PAIRS below.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _pagerank(join_impl, materialize):
    def build(spark):
        from openeo_odc_driver_spark.pipeline.graph import (
            copurchase_edges,
            pagerank_integer,
        )
        from openeo_odc_driver_spark.registry_pipeline import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, SF_DIR, "lineitem")
        ranks = pagerank_integer(
            copurchase_edges(li), iterations=3, join_impl=join_impl,
            materialize=materialize,
        )
        return (
            ranks.select(F.col("pk").alias("part_key"),
                         F.col("r").alias("score"))
            .orderBy(F.desc("score"), F.asc("part_key"))
            .limit(20)
        )

    return build


def _ivf_pq_trained(impl):
    def build(spark):
        from openeo_odc_driver_spark import registry_pipeline as rp
        from openeo_odc_driver_spark.pipeline import similarity as psim

        e = rp._embs(spark, SF_DIR)
        return psim.ivf_pq_ann(
            e, e.where("vec_id < 8"), k=5, nprobe=rp._IVFPQ_NPROBE,
            centroids=psim.centroids_from_kmeans(
                psim.kmeans_train(e, k=16, iters=3, materialize=impl[0])
            ),
            argmin_impl=impl[1],
        )

    return build


def _lpa(materialize):
    def build(spark):
        from openeo_odc_driver_spark.pipeline.graph import (
            copurchase_edges,
            label_propagation,
        )
        from openeo_odc_driver_spark.registry_pipeline import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, SF_DIR, "lineitem")
        labels = label_propagation(
            copurchase_edges(li), iterations=3, materialize=materialize
        )
        return labels.groupBy("label").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members")
        )

    return build


PAIRS = {
    "lpa": (_lpa("none"), _lpa("local")),
    "pagerank_broadcast": (_pagerank("broadcast", "none"),
                           _pagerank("broadcast", "local")),
    "pagerank_shuffle": (_pagerank("shuffle", "none"),
                         _pagerank("shuffle", "local")),
    "ivf_pq_trained": (_ivf_pq_trained(("none", "window")),
                       _ivf_pq_trained(("local", "agg"))),
}


def main() -> int:
    pair = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    old_fn, new_fn = PAIRS[pair]
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("opt-ab", cpus="32")

    def run(fn) -> float:
        spark._jvm.System.gc()
        t0 = time.time()
        fn(spark).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # result parity once, before timing
    o = sorted(map(tuple, old_fn(spark).collect()))
    n = sorted(map(tuple, new_fn(spark).collect()))
    assert o == n, f"RESULT MISMATCH old={o[:5]} new={n[:5]}"

    walls = {"old": [], "new": []}
    for _ in range(rounds):
        walls["old"].append(run(old_fn))
        walls["new"].append(run(new_fn))
    out = {
        "pair": pair,
        "rows": len(o),
        "old_walls": walls["old"],
        "new_walls": walls["new"],
        "old_best": min(walls["old"]),
        "new_best": min(walls["new"]),
        "ratio_old_over_new": round(
            min(walls["old"]) / max(min(walls["new"]), 1e-9), 2
        ),
        "parity": "identical",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
