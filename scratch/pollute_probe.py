"""Round-15: does the eager-localCheckpoint discipline pollute session
state (block-manager accumulation) enough to slow LATER queries? ONE
session: shingle best-of-3, then the checkpoint-heavy changed queries
once each, then shingle best-of-3 again. Prints progress per step."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"


def main() -> int:
    from openeo_odc_driver_spark.registry import QUERIES
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("pollute-probe", cpus="32")

    def run(name):
        spark._jvm.System.gc()
        t0 = time.time()
        QUERIES[name](spark, SF).write.format("noop").mode(
            "overwrite").save()
        w = round(time.time() - t0, 3)
        print(f"{name}: {w}", flush=True)
        return w

    before = [run("shingle_containment_pairs") for _ in range(3)]
    for n in (
        "tiled_zonal_sweep",
        "tiled_apply_kernel_border_sweep",
        "resample_spatial_warp_sweep",
        "semantic_dedup_clusters",
        "bloom_decontaminate",
        "copurchase_pagerank",
    ):
        run(n)
    after = [run("shingle_containment_pairs") for _ in range(3)]
    sc = spark.sparkContext
    storage = sc._jvm.org.apache.spark.storage
    status = sc._jsc.sc().getRDDStorageInfo()
    blocks = [(s.name(), s.numCachedPartitions(), s.memSize())
              for s in status]
    print(json.dumps({
        "before": before, "after": after,
        "cached_rdds": len(blocks),
        "cached_mem_bytes": sum(b[2] for b in blocks),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
