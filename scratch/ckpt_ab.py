"""Round-16 item 1: interleaved A/B of the loop-invariant
materialization mode — eager localCheckpoint (r15 shipped) vs lazy
localCheckpoint (eager=False, r16 candidate) vs no checkpoint (pure
lineage, r14 behavior) — on the four driver-regressed queries plus the
queries the r15 checkpoints demonstrably helped (must not give the win
back).

Methodology mirrors the driver bench: one session, per-run clearCache +
System.gc, noop sink, legs interleaved round-robin, best-of-N quoted.
Legs toggle by patching DataFrame.localCheckpoint:
  eager -> force eager=True;  lazy -> force eager=False (shipped code);
  none  -> identity (pure lineage).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))

from pyspark.sql import DataFrame  # noqa: E402

from openeo_odc_driver_spark.session import get_spark  # noqa: E402

_ORIG = DataFrame.localCheckpoint


def _set_leg(leg: str) -> None:
    if leg == "eager":
        DataFrame.localCheckpoint = (
            lambda self, eager=True: _ORIG(self, eager=True)
        )
    elif leg == "lazy":
        DataFrame.localCheckpoint = (
            lambda self, eager=True: _ORIG(self, eager=False)
        )
    elif leg == "none":
        DataFrame.localCheckpoint = lambda self, eager=True: self
    else:
        raise ValueError(leg)


QUERIES = [
    "copurchase_pagerank",
    "copurchase_pagerank_shuffle",
    "semantic_dedup_auto",
    "tiled_reduce_time_sweep",
    # r15 wins that must survive the lazy switch
    "semantic_dedup_clusters",
    "ivf_pq_ann_trained",
    "bloom_decontaminate",
    "bigram_logprob",
    "tiled_zonal_sweep",
    "resample_spatial_warp_directions_sweep",
]

LEGS = ["eager", "lazy", "none"]


def main() -> None:
    from openeo_odc_driver_spark.registry import QUERIES as REG

    spark = get_spark("ckpt-ab", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    results: dict = {}
    for name in QUERIES:
        fn = REG[name]
        walls: dict = {leg: [] for leg in LEGS}
        for rnd in range(ROUNDS):
            for leg in LEGS:
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                _set_leg(leg)
                spark.sparkContext.setJobDescription(
                    f"ckpt_ab {name} {leg} r{rnd}"
                )
                try:
                    t0 = time.time()
                    fn(spark, SF).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    walls[leg].append(round(time.time() - t0, 3))
                finally:
                    DataFrame.localCheckpoint = _ORIG
        results[name] = {
            leg: {"best": min(w), "runs": w} for leg, w in walls.items()
        }
        print(
            f"[ab] {name}: "
            + " ".join(f"{leg}={min(w):.2f}" for leg, w in walls.items()),
            flush=True,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
