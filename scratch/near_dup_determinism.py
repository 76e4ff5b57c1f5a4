"""VERDICT r6 item 7: value-verify near_dup_clusters at generated sf1.0.

The DuckDB recursive-CTE oracle DNFs on the 8.9M-edge sf1.0 pair graph,
so the 10x scale run was completion-only. This pins it with the
double-run determinism discipline (the same one scratch/
gen_fixed_oracles.py applies at capture): two independent Spark runs
under DIFFERENT shuffle partitioning (32 vs 7) must produce the exact
same (doc_id, cluster_id) multiset — plus two structural invariants any
correct min-label connected-components output satisfies:

  * every cluster_id is a member of its own cluster (label = some
    vertex of the component, specifically its minimum), and
  * cluster_id <= doc_id for every row (min-label property).

Usage: PYTHONPATH=/root/repo python scratch/near_dup_determinism.py \
    [--sf /root/repo/.sfdata/sf1.0]
"""
import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.sfdata/sf1.0")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.pipeline import dedup

    spark = get_spark("near-dup-determinism")
    docs = spark.read.parquet(os.path.join(args.sf, "documents.parquet"))

    digests = []
    for parts in ("32", "7"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        t0 = time.time()
        out = dedup.near_dup_clusters(
            docs, jaccard_threshold=0.5, bands=dedup.LSH_BANDS
        )
        rows = (
            out.groupBy()
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("cluster_id").alias("n_clusters"),
                F.sum(F.hash("doc_id", "cluster_id").cast("bigint")).alias("hsum"),
                F.sum(F.col("doc_id") * 31 + F.col("cluster_id")).alias("lin"),
                F.max((F.col("cluster_id") > F.col("doc_id")).cast("int")).alias(
                    "label_gt_doc"
                ),
            )
            .first()
        )
        # labels-are-members invariant: every cluster_id appears as a doc_id
        orphan = (
            out.select(F.col("cluster_id").alias("doc_id"))
            .distinct()
            .join(out.select("doc_id").distinct(), "doc_id", "left_anti")
            .count()
        )
        pdf = out.orderBy("doc_id", "cluster_id").toPandas()
        dedup.release_cached_signatures()
        dt = time.time() - t0
        digest = (rows["n"], rows["n_clusters"], rows["hsum"], rows["lin"])
        digests.append((digest, pdf))
        print(
            f"parts={parts}: n={rows['n']} clusters={rows['n_clusters']} "
            f"hash={hashlib.sha256(str(digest).encode()).hexdigest()[:16]} "
            f"orphan_labels={orphan} label_gt_doc={rows['label_gt_doc']} "
            f"[{dt:.1f}s]",
            flush=True,
        )
        assert orphan == 0, "cluster label not a member of its own cluster"
        assert rows["label_gt_doc"] == 0, "min-label property violated"

    (d0, p0), (d1, p1) = digests
    if d0 != d1 or not p0.equals(p1):
        print("FAIL: runs differ across shuffle layouts", file=sys.stderr)
        return 1
    print(f"OK: {len(p0)} labeled docs exact-match row-for-row across "
          "shuffle layouts + invariants hold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
