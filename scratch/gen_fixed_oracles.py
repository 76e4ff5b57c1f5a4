"""Capture fixed-expected-value oracle fixtures for the non-SQL queries.

Runs each NAMES query at sf0.01, verifies it is bit-stable across TWO
runs with different shuffle partitioning (the determinism the literal
oracle depends on), and writes
``openeo_odc_driver_spark/fixtures/<name>.json``.

Run this whenever /root/testdata is regenerated with different content
(the driver rebuilds it between rounds; same seed → same fixtures).
After regenerating ``quality_classifier_train``, ALSO copy the new
weights into ``pipeline/classifier.py::TRAINED_WEIGHTS`` (weight_fp /
1e7) — the scoring query and its SQL oracle share those literals (they
stay mutually consistent either way, but the checkpoint-matches-fixture
pytest pins the two together).

Usage: python scratch/gen_fixed_oracles.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SPARK_TYPES = {
    "bigint": "BIGINT", "int": "INTEGER", "double": "DOUBLE",
    "string": "VARCHAR", "boolean": "BOOLEAN",
}

NAMES = ["fit_curve_harmonic", "multimodal_decode", "multimodal_audio_decode",
         "kmeans_train", "bpe_learn_merges", "quality_classifier_train",
         # composed kmeans→serving path (round 6)
         "ivf_pq_ann_trained", "semantic_dedup_trained", "ann_recall_trained",
         # harmonic fit→predict planner round trip (round 6)
         "process_graph_predict_harmonic",
         # baseline-JPEG real round trip (round 6)
         "multimodal_jpeg_decode",
         # resize + feature-extract plumbing (round 6)
         "multimodal_resize", "multimodal_image_features",
         # large-k vectorized-assignment serving path (round 7)
         "semantic_dedup_trained_k160",
         # rFFT audio features (round 7)
         "multimodal_audio_features",
         # perceptual hash over the cross-codec corpus (round 7 late)
         "multimodal_image_phash",
         # lossless-WebP real round trip (round 10)
         "multimodal_webp_decode",
         # 4326->UTM projection warp, near+bilinear sweep (rounds 13/14)
         "resample_spatial_warp_sweep",
         # warp directions: UTM->4326 + 4326->3857/3035 (rounds 14/15)
         "resample_spatial_warp_directions_sweep"]


def main() -> int:
    global NAMES
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", nargs="*", default=None,
                    help="subset of NAMES to (re)capture")
    args = ap.parse_args()
    if args.names:
        unknown = set(args.names) - set(NAMES)
        if unknown:
            print(f"unknown names: {sorted(unknown)}", file=sys.stderr)
            return 1
        NAMES = args.names

    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.registry import QUERIES

    out_dir = "/root/repo/openeo_odc_driver_spark/fixtures"
    spark = get_spark("gen-fixed-oracles", cpus="16")

    rc = 0
    for name in NAMES:
        df = QUERIES[name](spark, args.sf)
        cols = [
            {"name": f.name, "type": SPARK_TYPES[f.dataType.simpleString()]}
            for f in df.schema.fields
        ]
        runs = []
        for shuffle_parts in ("32", "7"):  # determinism probe: two layouts
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            pdf = QUERIES[name](spark, args.sf).toPandas()
            pdf = pdf.sort_values([c["name"] for c in cols]).reset_index(drop=True)
            runs.append(pdf)
        if not runs[0].equals(runs[1]):
            print(f"FAIL {name}: output differs across partitionings", file=sys.stderr)
            rc = 1
            continue
        rows = [
            [None if v != v else v for v in rec]  # NaN → null marker (none expected)
            for rec in runs[0].itertuples(index=False, name=None)
        ]
        with open(os.path.join(out_dir, f"{name}.json"), "w") as fh:
            json.dump({"columns": cols, "rows": rows}, fh)
        print(f"ok {name}: {len(rows)} rows, {len(cols)} cols")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
