"""Round-8 task #7: the dedup/LSH scale table on a HEAVY-TAILED corpus.

The default generated corpus draws tokens from a dense 31-word
vocabulary — every shingle collides, which is the adversarial stress
regime for banded LSH (PLANS.md:1340). This harness re-runs the
dedup/text family on the Zipf-vocabulary corpora
(scratch/gen_sf.py --vocab zipf: 50k words, p ∝ rank^-1.1) at generated
sf0.1 vs sf1.0 (10× rows), so the adaptive defaults (bands_for_corpus,
auto shingle banding, centroids_for_corpus) are validated in the
REALISTIC density regime too.

Calls pipeline functions directly (registry gate callables pin
fixture-density drift asserts that correctly refuse foreign corpora).
Methodology: one session per scale, every query run twice back-to-back;
the table reports the MIN per (query, sf) — both scales measured in the
same warm-JVM regime (the cold-DISK story lives in the round-7 PLANS
note; page cache is warm for both sides here, so ratios compare like
with like).

Usage: python scratch/zipf_scale.py [names...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ("/root/repo/.sfdata/sf0.1-zipf", "/root/repo/.sfdata/sf1.0-zipf")


def build_queries():
    from pyspark.sql import functions as F

    from openeo_odc_driver_spark.pipeline import dedup as D
    from openeo_odc_driver_spark.pipeline import similarity as S
    from openeo_odc_driver_spark.pipeline import text as T

    def docs(spark, sf):
        return spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text", "lang", "source"
        )

    def embs(spark, sf):
        return spark.read.parquet(f"{sf}/embeddings.parquet").select(
            "vec_id", "embedding"
        )

    return {
        "minhash_lsh_pairs_auto": lambda sp, sf: D.minhash_lsh_pairs(
            docs(sp, sf), jaccard_threshold=0.5
        ),
        "shingle_containment_pairs_auto": lambda sp, sf: (
            D.shingle_containment_pairs(docs(sp, sf))
        ),
        "near_dup_clusters": lambda sp, sf: D.near_dup_clusters(
            docs(sp, sf), jaccard_threshold=0.5
        ),
        "simhash_near_dup_pairs": lambda sp, sf: D.simhash_near_dup_pairs(
            docs(sp, sf)
        ),
        "ngram_jaccard_pairs": lambda sp, sf: D.ngram_jaccard_pairs(
            docs(sp, sf)
        ),
        "paragraph_dedup": lambda sp, sf: D.paragraph_dedup(docs(sp, sf)),
        "exact_substring_dedup": lambda sp, sf: D.exact_substring_dedup(
            docs(sp, sf)
        ),
        "tfidf_top_terms": lambda sp, sf: T.tfidf_top_terms(docs(sp, sf)),
        # embeddings are vocab-independent but this is where the round-8
        # corpus-adaptive centroid default gets its 10x default-mode
        # ratio (VERDICT r7 item 3 'done' criterion)
        "semantic_dedup_auto": lambda sp, sf: S.semantic_dedup_clusters(
            embs(sp, sf)
        ),
    }


def main() -> None:
    from openeo_odc_driver_spark.session import get_spark

    queries = build_queries()
    names = sys.argv[1:] or list(queries)
    out = {}
    for sf_dir in SFS:
        spark = get_spark(cpus="32")
        for name in names:
            runs = []
            rows = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                rows = queries[name](spark, sf_dir).count()
                runs.append(time.monotonic() - t0)
            out[(sf_dir, name)] = (min(runs), rows)
            print(
                f"{sf_dir.rsplit('/', 1)[-1]:12} {name:32} "
                f"{min(runs):7.2f}s (runs {' '.join(f'{r:.2f}' for r in runs)}) "
                f"rows={rows}",
                flush=True,
            )
        spark.stop()
    print(f"\n{'ratio':>7}  {'sf0.1':>7}  {'sf1.0':>8}  query   (linear = 10.0)")
    for name in names:
        a, _ = out[(SFS[0], name)]
        b, _ = out[(SFS[1], name)]
        print(f"{b / max(a, 1e-9):7.2f}  {a:7.3f}  {b:8.3f}  {name}")


if __name__ == "__main__":
    main()
