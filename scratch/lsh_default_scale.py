"""Round-7 measurement: minhash_dedup_incremental + minhash_lsh_pairs under
the SHIPPED DEFAULT (density-aware bands_for_corpus) at generated sf0.1 vs
sf1.0 — redoing the round-6 17.5x-at-10x table row that motivated making
the tuner the default (VERDICT r6 item 2).

Usage: python scratch/lsh_default_scale.py
"""
import json
import os
import time

from pyspark.sql import functions as F

from openeo_odc_driver_spark.session import get_spark
from openeo_odc_driver_spark.pipeline import dedup


def run(spark, sf_dir, mode):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {}
    for name, fn in [
        ("minhash_dedup_incremental", lambda b: dedup.minhash_dedup_incremental(
            docs.where(F.col("doc_id") % 5 == 0),
            docs.where(F.col("doc_id") % 5 != 0),
            jaccard_threshold=0.5, bands=b)),
        ("minhash_lsh_pairs", lambda b: dedup.minhash_lsh_pairs(
            docs, jaccard_threshold=0.5, bands=b)),
    ]:
        bands = dedup.LSH_BANDS if mode == "fixed" else None
        best = None
        for _ in range(2):
            t0 = time.time()
            n = fn(bands).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            dedup.release_cached_signatures()
        out[name] = {"sec": round(best, 3), "rows": n}
        print(f"{mode} {os.path.basename(sf_dir)} {name}: "
              f"{best:.2f}s rows={n}", flush=True)
    return out


def main():
    spark = get_spark("lsh-scale")
    res = {}
    for sf in ("sf0.1", "sf1.0"):
        d = f"/root/repo/.sfdata/{sf}"
        res[sf] = {}
        for mode in ("default", "fixed"):
            res[sf][mode] = run(spark, d, mode)
    for q in ("minhash_dedup_incremental", "minhash_lsh_pairs"):
        for mode in ("default", "fixed"):
            r01 = res["sf0.1"][mode][q]["sec"]
            r10 = res["sf1.0"][mode][q]["sec"]
            print(f"{q} [{mode}]: sf0.1 {r01}s -> sf1.0 {r10}s "
                  f"ratio {r10 / max(r01, 1e-9):.2f} (linear=10)")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
