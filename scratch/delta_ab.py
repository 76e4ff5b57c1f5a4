"""Round-15 adjudication of the r14 bench deltas (VERDICT r14 task 2),
by the repo's protocol: any per-query delta at/above the run's anchor
spread gets an interleaved same-session A/B before it counts as a
regression. Queries under adjudication, bench walls r12→r13→r14 (s):

  multimodal_jpeg_decode          0.859 → 1.043 → 2.279  (2.19x, above
                                  the r14 run's own 2.13x spread)
  semantic_dedup_vectorized_k160  1.016 → 0.991 → 1.993  (2.01x)
  ivf_pq_ann_trained              5.544 → 7.351 → 11.649 (monotone
                                  trend, cumulative 2.1x)
  phash_recall_tiers              1.083 → 1.084 → 1.811  (1.67x)

All four are pipeline/ code untouched in r14 (the diff is raster/
tiled/sink/warp only), so the hypothesis is weather — exactly the
r13 event-query pattern that r14's interleaved A/B adjudicated as
weather. Protocol: ONE session, the bench's anchor query interleaved,
System.gc between runs, best-of-N; verdict per query = best wall and
anchor-normalized value vs the bench readings.

Usage: python scratch/delta_ab.py [rounds] [name ...]
(extra args replace the default query list — round-15 close-out used
it for the three untouched-code deltas at/above the clean bench's own
1.96x spread: tiled_pipeline_e2e 2.11x, tiled_merge_resolver 2.06x,
tiled_filter_bbox_native 2.03x)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"

NAMES = ["multimodal_jpeg_decode", "semantic_dedup_vectorized_k160",
         "ivf_pq_ann_trained", "phash_recall_tiers"]

BENCH = {
    "r12": {"multimodal_jpeg_decode": 0.859,
            "semantic_dedup_vectorized_k160": 1.016,
            "ivf_pq_ann_trained": 5.544, "phash_recall_tiers": 1.083},
    "r13": {"multimodal_jpeg_decode": 1.043,
            "semantic_dedup_vectorized_k160": 0.991,
            "ivf_pq_ann_trained": 7.351, "phash_recall_tiers": 1.084},
    "r14": {"multimodal_jpeg_decode": 2.279,
            "semantic_dedup_vectorized_k160": 1.993,
            "ivf_pq_ann_trained": 11.649, "phash_recall_tiers": 1.811,
            "spread": 2.13},
}


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    global NAMES
    if len(sys.argv) > 2:
        NAMES = sys.argv[2:]
    from openeo_odc_driver_spark.registry import QUERIES
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("delta-ab", cpus="32")

    def anchor_once() -> float:
        runs = []
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.time()
            (
                spark.range(0, 20_000_000)
                .selectExpr("id % 97 AS k",
                            "CAST(id % 1021 AS DOUBLE) AS v")
                .groupBy("k").agg({"v": "sum"})
                .selectExpr("sum(`sum(v)`)")
                .write.format("noop").mode("overwrite").save()
            )
            runs.append(time.time() - t0)
        return round(min(runs), 3)

    def run(name) -> float:
        spark._jvm.System.gc()
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        return round(time.time() - t0, 3)

    for n in NAMES:  # warm-up legs (page cache, codegen) not counted
        run(n)
    anchors, walls = [], {n: [] for n in NAMES}
    for _ in range(rounds):
        anchors.append(anchor_once())
        for n in NAMES:
            walls[n].append(run(n))
    anchors.append(anchor_once())
    a = min(anchors)
    out = {"anchor_best": a, "anchor_samples": anchors, "bench": BENCH}
    for n in NAMES:
        best = min(walls[n])
        out[n] = {"walls": walls[n], "best": best,
                  "per_anchor": round(best / a, 2)}
        if n in BENCH["r14"]:
            out[n]["vs_r14_bench"] = round(best / BENCH["r14"][n], 2)
        if n in BENCH["r12"]:
            out[n]["vs_r12_bench"] = round(best / BENCH["r12"][n], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
