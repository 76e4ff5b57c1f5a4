"""Round-15 adjudication of the r13→r14 bench deltas VERDICT r14
flagged (item 2): `multimodal_jpeg_decode` 1.04→2.28 s (2.19×, above
the run's 2.13× anchor spread — the round's weak-pending) and
`semantic_dedup_vectorized_k160` (2.01×, just under). Code untouched in
r14; hypothesis is weather (the r13 event-query pattern). Protocol
(the repo's event_ab discipline): ONE session, the bench anchor
interleaved with both queries, System.gc between runs, best-of-N;
verdict = best wall + anchor-normalized value vs the r13/r14 readings.

Usage: python scratch/delta_ab_r15.py [rounds]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
NAMES = ["multimodal_jpeg_decode", "semantic_dedup_vectorized_k160"]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from openeo_odc_driver_spark.registry import QUERIES
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("delta-ab-r15", cpus="32")

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

    for n in NAMES:
        run(n)  # warm-up (page cache, codegen), not counted
    anchors, walls = [], {n: [] for n in NAMES}
    for _ in range(rounds):
        anchors.append(anchor_once())
        for n in NAMES:
            walls[n].append(run(n))
    anchors.append(anchor_once())
    a = min(anchors)
    out = {
        "anchor_best": a,
        "anchor_samples": anchors,
        "readings": {
            "r13_bench": {"multimodal_jpeg_decode": 1.043,
                          "semantic_dedup_vectorized_k160": 0.991,
                          "anchor_median": 0.999},
            "r14_bench": {"multimodal_jpeg_decode": 2.279,
                          "semantic_dedup_vectorized_k160": 1.993,
                          "anchor_median": 0.952},
        },
    }
    for n in NAMES:
        out[n] = {
            "walls": walls[n],
            "best": min(walls[n]),
            "per_anchor": round(min(walls[n]) / a, 2),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
