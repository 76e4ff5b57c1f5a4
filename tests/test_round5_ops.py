"""Round-5 pipeline ops: paragraph dedup, Bloom-prefiltered
decontamination, semantic (cluster-local) dedup."""

from pyspark.sql import functions as F

from openeo_odc_driver_spark.pipeline.dedup import (
    bloom_decontaminate,
    decontaminate_ngram,
    paragraph_dedup,
)
from openeo_odc_driver_spark.pipeline.similarity import semantic_dedup_clusters


def test_paragraph_dedup_first_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one"),
            (2, "cookie banner\nreal content two"),
            (3, "cookie banner\n\n  \nreal content one"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    # doc 1 first: keeps both paragraphs
    assert (out[1].n_paras, out[1].n_kept) == (2, 2)
    # doc 2: banner is a dup, its own content survives
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert out[2].kept_chars == len("real content two")
    # doc 3: blank/whitespace paragraphs dropped pre-census; both
    # remaining paragraphs are dups of doc 1's
    assert (out[3].n_paras, out[3].n_kept) == (2, 0)


def test_bloom_decontaminate_equals_exact_rule(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h unique tail one"),
            (2, "totally different words here for doc two ok"),
            (3, "x y z a b c d e f g h trailing"),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, "prefix a b c d e f g h suffix")], "doc_id long, text string"
    )
    got = sorted(
        r.doc_id for r in bloom_decontaminate(docs, ref, n=8).collect()
    )
    want = sorted(
        r.doc_id for r in decontaminate_ngram(docs, ref, n=8).collect()
    )
    assert got == want == [2]  # docs 1 and 3 share the 8-gram 'a..h'


def test_bloom_prefilter_never_drops_true_contamination(spark, sf_dir):
    """On the fixture slice split, the Bloom path must be exactly the
    exact-rule output (no false negatives by construction; false
    positives removed by verify)."""
    from openeo_odc_driver_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    ref = docs.where(F.col("doc_id") % 10 == 0)
    got = sorted(r.doc_id for r in bloom_decontaminate(corpus, ref, n=8).collect())
    want = sorted(r.doc_id for r in decontaminate_ngram(corpus, ref, n=8).collect())
    assert got == want


def test_semantic_dedup_drops_near_duplicate_in_cluster(spark):
    base = [1.0] + [0.0] * 63
    near = [0.999] + [0.02] + [0.0] * 62
    far = [0.0] * 32 + [1.0] + [0.0] * 31
    embs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>",
    )
    out = {r.cluster_id: r for r in
           semantic_dedup_clusters(embs, n_centroids=1, threshold=0.9).collect()}
    # single cluster (centroid = vec 0): vec 1 is a near-dup of vec 0 →
    # dropped; vec 2 is orthogonal → kept
    assert len(out) == 1
    row = out[0]
    assert (row.n_members, row.n_dropped, row.n_kept) == (3, 1, 2)


def test_kmeans_train_recovers_planted_clusters(spark):
    import numpy as np

    from openeo_odc_driver_spark.pipeline.similarity import kmeans_train

    rng = np.random.default_rng(11)
    anchors = np.eye(3, 8)  # 3 orthogonal anchor directions in 8-d
    rows = []
    for i in range(60):
        a = anchors[i % 3]
        v = a + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = kmeans_train(embs, k=3, iters=4).collect()
    sizes = {r.cent_id: r.n_members for r in out}  # one entry per centroid
    # all 60 vectors assigned, and the planted 20/20/20 split recovered
    assert sum(sizes.values()) == 60
    assert sorted(sizes.values()) == [20, 20, 20]
    # each trained centroid aligns with exactly one anchor
    cents = {}
    for r in out:
        cents.setdefault(r.cent_id, [0.0] * 8)[r.dim] = r.coord
    aligned = set()
    for c in cents.values():
        v = np.asarray(c)
        aligned.add(int(np.argmax(anchors @ v / np.linalg.norm(v))))
    assert aligned == {0, 1, 2}


def test_trained_centroids_plug_into_ivf_and_semantic(spark):
    """kmeans_train output reshapes into the centroid slot of both
    consumers — the 'real deployment plugs trained centroids in' path."""
    import numpy as np

    from openeo_odc_driver_spark.pipeline.similarity import (
        centroids_from_kmeans,
        ivf_flat_ann,
        kmeans_train,
        semantic_dedup_clusters,
    )

    rng = np.random.default_rng(5)
    embs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cents = centroids_from_kmeans(kmeans_train(embs, k=4, iters=2))
    assert cents.count() == 4
    assert len(cents.first().c_emb) == 8

    qs = embs.where(F.col("vec_id") < 3)
    ann = ivf_flat_ann(embs, qs, k=3, nprobe=2, centroids=cents)
    assert ann.groupBy("query_id").count().count() == 3

    census = semantic_dedup_clusters(embs, threshold=0.99, centroids=cents)
    rows = census.collect()
    assert sum(r.n_members for r in rows) == 40


def test_unigram_logprob_discriminates_junk(spark):
    from openeo_odc_driver_spark.pipeline.text import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox naps under the lazy dog"),
            (3, "zxqj vvkpt qqrmb zzzyx wwkkj"),  # out-of-distribution junk
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    # junk tokens are singletons -> much lower mean logprob
    assert out[3].mean_logprob_micro < out[1].mean_logprob_micro
    assert out[3].mean_logprob_micro < out[2].mean_logprob_micro
    assert out[1].n_tokens == 9
