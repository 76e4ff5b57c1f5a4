"""Round-14 adjudication of the two r12→r13 bench deltas that reached
the anchor spread (VERDICT r13 item 3): `event_sessionize` 0.61→2.19 s
and `event_session_type_pairs` 0.68→2.15 s — code untouched in r13, so
the hypothesis is weather. Protocol: ONE session, the bench's anchor
query interleaved with both event queries, System.gc between runs,
best-of-N per query; verdict = each query's best wall and its
anchor-normalized value vs the r12 and r13 bench readings.

Usage: python scratch/event_ab.py [rounds]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from openeo_odc_driver_spark.registry import QUERIES
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("event-ab", cpus="32")
    names = ["event_sessionize", "event_session_type_pairs"]

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

    # warm-up legs (page cache, codegen) not counted
    for n in names:
        run(n)
    anchors, walls = [], {n: [] for n in names}
    for _ in range(rounds):
        anchors.append(anchor_once())
        for n in names:
            walls[n].append(run(n))
    anchors.append(anchor_once())
    a = min(anchors)
    out = {
        "anchor_best": a,
        "anchor_samples": anchors,
        "r12_bench": {"event_sessionize": 0.61,
                      "event_session_type_pairs": 0.68},
        "r13_bench": {"event_sessionize": 2.187,
                      "event_session_type_pairs": 2.149,
                      "anchor_median": 0.999},
    }
    for n in names:
        best = min(walls[n])
        out[n] = {"walls": walls[n], "best": best,
                  "per_anchor": round(best / a, 2)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
