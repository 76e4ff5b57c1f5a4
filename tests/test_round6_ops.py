"""Round-6 additions: the kmeans-trained serving composition and the
skew-tooling guard rails."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _clustered_embs(spark, n_clusters=4, per=12, dim=8, seed=7):
    """Well-separated planted clusters so trained centroids are
    meaningfully better than arbitrary ones."""
    rng = np.random.default_rng(seed)
    anchors = rng.normal(0, 1, (n_clusters, dim)) * 5.0
    rows = []
    for i in range(n_clusters * per):
        a = anchors[i % n_clusters]
        rows.append((i, [float(x) for x in a + rng.normal(0, 0.3, dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_pq_serves_off_trained_centroids(spark):
    """The full FAISS-shaped composition kmeans_train →
    centroids_from_kmeans → ivf_pq_ann: codes partition into trained
    lists, queries probe them, and ADC ranking recovers same-cluster
    neighbors (planted clusters are PQ-separable)."""
    from openeo_odc_driver_spark.pipeline.similarity import (
        brute_force_topk,
        centroids_from_kmeans,
        ivf_pq_ann,
        kmeans_train,
    )

    embs = _clustered_embs(spark)
    cents = centroids_from_kmeans(kmeans_train(embs, k=4, iters=3))
    qs = embs.where(F.col("vec_id") < 4)  # one query per planted cluster
    ann = ivf_pq_ann(embs, qs, k=3, nprobe=1, centroids=cents)
    got = ann.collect()
    # every query returns exactly k ranked rows
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2, 3}
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    # with nprobe=1 on separated clusters, neighbors come from the
    # query's own planted cluster (vec_id ≡ query_id mod 4)
    for r in got:
        assert r.neighbor_id % 4 == r.query_id % 4
    # and ADC ranking agrees with exact search on the top hit
    gt = {
        r.query_id: r.neighbor_id
        for r in brute_force_topk(embs, qs, k=1).collect()
    }
    top = {r.query_id: r.neighbor_id for r in got if r.rank == 1}
    hits = sum(1 for q in gt if top[q] == gt[q])
    assert hits >= 3  # PQ is lossy; allow one miss of four


def test_salt_skewed_join_rejects_outer_joins(spark):
    """Build-side replication silently duplicates unmatched rows under
    right/full outer — the API must refuse (ADVICE r5)."""
    from openeo_odc_driver_spark.pipeline.skew import salt_skewed_join

    probe = spark.createDataFrame([(1, "a")], "k long, v string")
    build = spark.createDataFrame([(1, "x")], "k long, w string")
    for how in ("right", "full", "outer", "left_anti"):
        with pytest.raises(ValueError, match="inner"):
            salt_skewed_join(probe, build, "k", [1], "v", how=how)


def test_priority_sample_zero_uniform_is_finite(spark):
    """The md5-uniform can be exactly 0 (p≈2^-28 per key); the clamp
    keeps the priority finite and engine-portable (ADVICE r5)."""
    from openeo_odc_driver_spark.pipeline.sampling import _HASH_SPACE, _uniform

    # find a doc_id whose 28-bit md5 prefix is tiny to prove the clamp
    # path, and check the operator itself never emits inf/NaN
    from openeo_odc_driver_spark.pipeline.sampling import priority_sample

    docs = spark.createDataFrame(
        [(i, "en", "web", 100 + i) for i in range(200)],
        "doc_id long, lang string, source string, n_chars int",
    )
    out = priority_sample(docs, k=200)
    bad = out.where(
        F.isnan("priority") | (F.col("priority") == float("inf"))
    ).count()
    assert bad == 0
    # clamp ceiling: priority can never exceed w * 2^28
    mx = out.agg(F.max(F.col("priority") / F.col("n_chars"))).first()[0]
    assert mx <= _HASH_SPACE
