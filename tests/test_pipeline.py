"""Dedup / similarity / text operators: planted-duplicate recovery and
recall sanity (SURVEY.md north-star extensions)."""

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from openeo_odc_driver_spark.pipeline.similarity import (
    brute_force_topk,
    ivf_flat_ann,
    lsh_bucket_ann,
)
from openeo_odc_driver_spark.pipeline.text import lang_id, quality_score, token_count


BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into the woods "
    "where tall trees grow and rivers flow quietly under the morning sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", "s", len(BASE)),
        (1, BASE, "en", "s", len(BASE)),  # exact dup of 0
        (2, BASE.replace("quick", "swift"), "en", "s", len(BASE)),  # near dup
        (3, "der hund läuft und die katze ist das tier", "de", "s", 42),
        (4, "completely different text about spark query engines and columnar formats", "en", "s", 73),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_dedup_groups_identical(spark, docs):
    out = exact_dedup(docs).collect()
    by_keep = {r.keep_doc_id: r.n_copies for r in out}
    assert by_keep[0] == 2  # docs 0 and 1 collapse
    assert len(out) == 4


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]


def test_lsh_finds_planted_near_dup(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, 0.5).collect()}
    assert (0, 1) in pairs  # exact dup always caught
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares most shingles
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_exact_on_lsh_candidates(spark, docs):
    out = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, 0.3).collect()}
    assert out[(0, 1)] == pytest.approx(1.0)  # identical docs
    near = out.get((0, 2)) or out.get((1, 2))
    assert near is not None and 0.3 <= near < 1.0


def test_near_dup_clusters_planted(spark, docs):
    """LSH-driven clustering on the planted corpus: docs 0/1/2 form one
    near-dup component labeled by its min doc_id; 3 and 4 never appear."""
    out = {r.doc_id: r.cluster_id for r in near_dup_clusters(docs, 0.5).collect()}
    assert out.get(0) == 0 and out.get(1) == 0
    assert out.get(2, 0) == 0  # near dup may pair with 0 or 1 — same cluster
    assert 3 not in out and 4 not in out


def test_near_dup_clusters_chain_pointer_jump(spark):
    """Pointer jumping: rounds=r covers component diameter 2^(r-1).
    A 9-node chain (diameter 8) converges at the default rounds=4; a
    20-node chain needs rounds=6 and converges there."""
    def chain_pairs(n):
        return spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )

    out = near_dup_clusters(None, pairs=chain_pairs(9)).collect()
    assert {r.cluster_id for r in out} == {0} and len(out) == 9

    out = near_dup_clusters(None, pairs=chain_pairs(20), rounds=6).collect()
    assert {r.cluster_id for r in out} == {0} and len(out) == 20

    # two separate components keep separate labels
    two = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.cluster_id for r in near_dup_clusters(None, pairs=two).collect()}
    assert out == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_simhash_near_dups_close_in_hamming(spark, docs):
    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    ham = bin(fp[0] ^ fp[2]).count("1")
    ham_far = bin(fp[0] ^ fp[4]).count("1")
    assert ham < ham_far


def test_ann_recall_vs_brute_force(spark, sf_dir):
    """Single-probe LSH ANN: whatever it returns must agree with brute
    force cosines, and recall@5 should be well above random."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = lsh_bucket_ann(emb, q, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    n_corpus = emb.count()
    # With UNIFORM buckets (r6 hyperplane fix), 1-bit multiprobe covers
    # ~9 buckets × occupancy ~2 of a 500-vector corpus — candidates are
    # scarce, so the honest bar is "well above random", not the 0.2 the
    # pre-fix mega-bucket artifact cleared by brute-forcing 10% of the
    # corpus in one bucket. Random recall@5 = 5/n ≈ 1%.
    assert recall >= 0.05  # ≥5× random
    assert recall > 25 / n_corpus


def test_salted_embedding_dedup_identical(spark, sf_dir):
    """Skew salting must not change results — every within-bucket pair
    survives exactly once."""
    from openeo_odc_driver_spark.pipeline.dedup import embedding_cosine_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plain = {
        (r.vec_a, r.vec_b) for r in
        embedding_cosine_dup_pairs(emb, threshold=0.2).collect()
    }
    salted = {
        (r.vec_a, r.vec_b) for r in
        embedding_cosine_dup_pairs(emb, threshold=0.2, salt=4).collect()
    }
    assert plain == salted and len(plain) > 0


def test_ivf_recall_and_probe_bound(spark, sf_dir):
    """IVF with nprobe=4 of 16 lists scans ~1/4 of the corpus yet should
    beat that fraction in recall (neighbors concentrate in near lists)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf_flat_ann(emb, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.3  # > the 0.25 scan fraction


def test_text_ops(spark, docs):
    tc = {r.doc_id: r.n_tokens for r in token_count(docs).collect()}
    assert tc[0] == len(BASE.split())
    qs = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in qs.values())
    li = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert li[0] == "en" and li[3] == "de"


def test_minhash_persist_handle_released(spark):
    """ADVICE r2: repeated minhash_lsh_pairs calls must not accumulate
    cached blocks in a shared session."""
    from openeo_odc_driver_spark.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dedup.minhash_lsh_pairs(docs).count()
    dedup.minhash_lsh_pairs(docs).count()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= 1
    dedup.release_cached_signatures()
    assert len(dedup._PERSISTED) == 0


def test_chunk_documents_coverage(spark):
    """Overlapping windows with an aligned tail: every token appears in
    some chunk, full windows where possible, one chunk for short docs."""
    from openeo_odc_driver_spark.pipeline.text import chunk_documents

    text100 = " ".join(f"t{i}" for i in range(1, 101))
    df = spark.createDataFrame(
        [(1, text100), (2, "a b c")], "doc_id long, text string"
    )
    rows = chunk_documents(df, window=64, stride=48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 1 and 37 (aligned tail), both full windows
    starts = sorted(r.chunk_start for r in by_doc[1])
    assert starts == [1, 37]
    assert all(r.n_chunk_tokens == 64 for r in by_doc[1])
    covered = set()
    for r in by_doc[1]:
        covered.update(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
    assert covered == set(range(1, 101))
    # short doc: exactly one chunk, whole text
    assert len(by_doc[2]) == 1
    assert by_doc[2][0].chunk_text == "a b c" and by_doc[2][0].n_chunk_tokens == 3


def test_sample_stratified_deterministic_and_monotone(spark, sf_dir):
    from openeo_odc_driver_spark.pipeline.sampling import sample_stratified

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_en = docs.where("lang = 'en'").count()
    a = sample_stratified(docs, {"en": 1.0}, default_rate=0.0).collect()
    assert len(a) == n_en and all(r.lang == "en" for r in a)
    assert sample_stratified(docs, {"en": 0.0}, default_rate=0.0).count() == 0
    # deterministic: identical result on re-run; subsample nests in sample
    h = sample_stratified(docs, {"en": 0.5}, default_rate=0.1)
    ids1 = {r.doc_id for r in h.collect()}
    ids2 = {r.doc_id for r in h.collect()}
    assert ids1 == ids2
    ids_small = {r.doc_id for r in
                 sample_stratified(docs, {"en": 0.25}, default_rate=0.05).collect()}
    assert ids_small <= ids1


def test_shuffle_shards_contiguous_positions(spark, sf_dir):
    from openeo_odc_driver_spark.pipeline.sampling import shuffle_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = shuffle_shards(docs, n_shards=4).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic
    again = {(r.doc_id, r.shard, r.position) for r in
             shuffle_shards(docs, n_shards=4).collect()}
    assert again == {(r.doc_id, r.shard, r.position) for r in out}


def test_tfidf_planted_distinctive_term(spark):
    """A term unique to one doc must outrank corpus-wide terms there."""
    from openeo_odc_driver_spark.pipeline.text import tfidf_top_terms

    rows = [
        (1, "common words everywhere plus zyzzyva zyzzyva zyzzyva"),
        (2, "common words everywhere plus filler filler"),
        (3, "common words everywhere plus other other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).collect()
    top1 = {r.doc_id: r.term for r in out if r.rank == 1}
    assert top1[1] == "zyzzyva" and top1[2] == "filler" and top1[3] == "other"
    assert all(r.rank <= 2 for r in out)


def test_pq_codes_and_recall(spark, sf_dir):
    """PQ: codes are valid (PQ_M per vector, in [0, PQ_K)); ADC ANN beats
    random recall against brute-force ground truth."""
    from openeo_odc_driver_spark.pipeline.similarity import (
        PQ_K,
        PQ_M,
        pq_ann,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    codes = pq_encode(emb).collect()
    assert len(codes) == n * PQ_M
    assert all(0 <= r.code < PQ_K and 0 <= r.s < PQ_M for r in codes)

    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in pq_ann(emb, q, k=5).collect()}
    assert all(qid != nid for qid, nid in approx)  # self excluded
    recall = len(exact & approx) / len(exact)
    assert recall > 25 / n  # well above random-5-of-n


def test_decontamination_exact_and_ngram(spark):
    """Exact removes verbatim copies of reference docs; the 13-gram rule
    additionally catches documents QUOTING a reference passage."""
    from openeo_odc_driver_spark.pipeline.dedup import (
        decontaminate_exact,
        decontaminate_ngram,
    )

    ref_text = " ".join(f"bench{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [
            (1, "totally clean document with its own words " * 3),
            (2, ref_text),                                   # verbatim copy
            (3, "prefix words then " + ref_text + " then suffix"),  # quotes it
            (4, "short doc under thirteen tokens"),
        ],
        "doc_id long, text string",
    )
    reference = spark.createDataFrame([(100, ref_text)], "doc_id long, text string")

    exact_ids = {r.doc_id for r in decontaminate_exact(corpus, reference).collect()}
    assert exact_ids == {1, 3, 4}  # only the verbatim copy dropped

    ngram_ids = {r.doc_id for r in decontaminate_ngram(corpus, reference, n=13).collect()}
    assert ngram_ids == {1, 4}  # the quoting doc is dropped too


def test_lsh_params_for_threshold_picks_nearest_midpoint():
    """MMDS banding rule: (bands, rows) with s-curve midpoint (1/b)^(1/r)
    nearest the target threshold, among exact divisor pairs of K=12."""
    from openeo_odc_driver_spark.pipeline.dedup import (
        lsh_candidate_prob,
        lsh_params_for_threshold,
    )

    assert lsh_params_for_threshold(0.63) == (4, 3)  # the gate's banding
    assert lsh_params_for_threshold(0.5) == (6, 2)
    assert lsh_params_for_threshold(0.85) == (2, 6)
    assert lsh_params_for_threshold(0.1) == (12, 1)
    with pytest.raises(ValueError):
        lsh_params_for_threshold(1.0)

    # s-curve invariants the tuner relies on: exact dups are candidates
    # with probability 1 under ANY banding; tightening rows-per-band
    # crushes the sub-threshold candidate rate (the dense-corpus fix)
    for b, r in [(1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)]:
        assert lsh_candidate_prob(1.0, b, r) == 1.0
    assert lsh_candidate_prob(0.3, 2, 6) < lsh_candidate_prob(0.3, 4, 3) / 50


def test_lsh_pairs_tighter_banding_is_subset(spark, docs):
    """Contiguous band slices nest: every (2,6) band match implies both
    covering (4,3) band matches, so candidates — and therefore verified
    output pairs — at bands=2 are a subset of bands=4. Exact duplicates
    survive even the tightest banding (bands=1: whole-signature match)."""
    from openeo_odc_driver_spark.pipeline.dedup import minhash_dedup_incremental

    loose = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, 0.5, bands=4).collect()}
    tight = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, 0.5, bands=2).collect()}
    whole = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, 0.5, bands=1).collect()}
    assert tight <= loose
    assert whole <= tight
    assert (0, 1) in whole  # exact dup: identical sig matches the single band

    # the incremental join honors the same knob (shared _band_keys_col)
    new = docs.where(F.col("doc_id") >= 3).union(
        docs.where(F.col("doc_id") == 0).select(
            (F.col("doc_id") + 100).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    old = docs.where(F.col("doc_id") < 3)
    inc = {(r.new_doc, r.dup_of)
           for r in minhash_dedup_incremental(new, old, 0.5, bands=1).collect()}
    assert (100, 0) in inc and (100, 1) in inc  # re-ingested exact dup flagged

    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, 0.5, bands=5).collect()  # 5 does not divide 12


def test_bands_for_corpus_density_aware_default(spark):
    """The round-7 shipped default: bands=None measures band-bucket
    occupancy and tightens the MMDS threshold-rule banding on dense
    corpora; sparse corpora keep the threshold rule's choice; the
    chosen banding is reproducible by passing it explicitly."""
    from openeo_odc_driver_spark.pipeline.dedup import (
        bands_for_corpus,
        lsh_params_for_threshold,
        minhash_dedup_incremental,
        minhash_lsh_pairs,
        minhash_signatures,
        release_cached_signatures,
    )

    b0, _ = lsh_params_for_threshold(0.5)

    # sparse: 60 documents of unique vocabulary — no bucket collisions,
    # the threshold rule stands
    sparse = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(60)],
        "doc_id long, text string",
    )
    sig_sparse = minhash_signatures(sparse)
    assert bands_for_corpus(sig_sparse, 0.5) == b0

    # dense: 200 identical documents — every banding buckets all of them
    # together (bands * C(200,2) predicted candidates), far past the
    # 32-per-doc cap even at a single full-width band → tightest banding
    dense = spark.createDataFrame(
        [(i, "the same boilerplate text repeated across the corpus")
         for i in range(200)],
        "doc_id long, text string",
    )
    sig_dense = minhash_signatures(dense)
    assert bands_for_corpus(sig_dense, 0.5) == 1

    # the default path is exactly "explicit bands = the probe's choice",
    # and exact dups survive the tightened banding
    try:
        auto = {(r.doc_a, r.doc_b)
                for r in minhash_lsh_pairs(dense, 0.5).collect()}
        explicit = {(r.doc_a, r.doc_b)
                    for r in minhash_lsh_pairs(dense, 0.5, bands=1).collect()}
    finally:
        release_cached_signatures()
    assert auto == explicit
    assert len(auto) == 200 * 199 // 2

    # incremental: density measured on the new x existing join topology
    new = dense.where("doc_id >= 190")
    old = dense.where("doc_id < 190")
    try:
        inc = minhash_dedup_incremental(new, old, 0.5).collect()
    finally:
        release_cached_signatures()
    # every new doc matches every existing doc (identical text)
    assert len(inc) == 10 * 190
    assert all(abs(r.est_jaccard - 1.0) < 1e-9 for r in inc)


def test_predicted_candidates_exact_counts(spark):
    """The density probe's arithmetic: sum C(n,2) per bucket for the
    self-join shape, sum n_a*n_b for new x existing."""
    from openeo_odc_driver_spark.pipeline.dedup import (
        _predicted_candidates,
        minhash_signatures,
    )

    # 3 identical + 2 identical (different text) + 1 unique
    rows = [(i, "aaaa bbbb cccc dddd eeee") for i in range(3)]
    rows += [(10 + i, "ffff gggg hhhh iiii jjjj") for i in range(2)]
    rows += [(20, " ".join(f"zz{j}q" for j in range(20)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(docs)
    # bands=1: one bucket of 3 (C=3), one of 2 (C=1), one of 1 (C=0)
    assert _predicted_candidates(sig, 1) == 3 + 1
    # bands=4: same buckets per band -> 4x
    assert _predicted_candidates(sig, 4) == 4 * (3 + 1)

    a = minhash_signatures(docs.where("doc_id < 2"))        # 2 of group A
    b = minhash_signatures(docs.where("doc_id in (2, 10)"))  # 1 A, 1 B
    # cross shape at bands=1: the A-bucket contributes 2*1
    assert _predicted_candidates(a, 1, b) == 2.0
