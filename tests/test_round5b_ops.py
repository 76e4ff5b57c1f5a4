"""Round-5b ops: vocabulary-id tokenization, within-doc line dedup,
BPE tokenizer training, int8 embedding quantization, IVF-PQ ANN."""

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.pipeline.similarity import (
    embedding_int8_quantize,
    ivf_pq_ann,
)
from openeo_odc_driver_spark.pipeline.text import (
    bpe_learn_merges,
    bpe_pair_counts,
    intra_doc_dedup,
    tokenize_to_ids,
    vocab_with_ids,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_ids_are_frequency_ranked(spark):
    docs = _docs(spark, [(1, "b b b a a c"), (2, "a b")])
    vocab = {r.term: r.token_id for r in vocab_with_ids(docs, k=2).collect()}
    # b appears 4x -> id 0; a appears 3x -> id 1; c falls outside k=2
    assert vocab == {"b": 0, "a": 1}


def test_tokenize_to_ids_maps_and_oovs(spark):
    docs = _docs(spark, [(1, "b a c b")])
    vocab = vocab_with_ids(docs, k=2)
    out = sorted(
        tokenize_to_ids(docs, vocab, oov_id=2).collect(),
        key=lambda r: r.pos,
    )
    assert [(r.pos, r.term, r.token_id) for r in out] == [
        (1, "b", 0), (2, "a", 1), (3, "c", 2), (4, "b", 0),
    ]


def test_intra_doc_dedup_keeps_first_occurrence_in_order(spark):
    docs = _docs(spark, [
        (1, "nav bar\ncontent one\nnav bar\ncontent two\ncontent one"),
        (2, "only line"),
    ])
    out = {r.doc_id: r for r in intra_doc_dedup(docs).collect()}
    assert (out[1].n_lines, out[1].n_kept) == (5, 3)
    assert out[1].dedup_text == "nav bar\ncontent one\ncontent two"
    assert (out[2].n_lines, out[2].n_kept) == (1, 1)
    assert out[2].dedup_text == "only line"


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    # "ab" x3, "abc" x1 -> (a,b): 4, (b,c): 1; 1-char words contribute none
    docs = _docs(spark, [(1, "ab ab abc x"), (2, "ab")])
    out = {(r.left_sym, r.right_sym): r.n for r in bpe_pair_counts(docs, k=10).collect()}
    assert out == {("a", "b"): 4, ("b", "c"): 1}


def test_bpe_learn_merges_greedy_leftmost(spark):
    # classic toy: low x2, lower x1
    docs = _docs(spark, [(1, "low low lower")])
    out = [(r.merge_rank, r.left_sym, r.right_sym, r.n)
           for r in bpe_learn_merges(docs, n_merges=4).collect()]
    # (l,o) and (o,w) tie at 3; lexicographic tie-break picks (l,o);
    # then (lo,w)=3; then (e,r) vs (low,e) tie at 1 -> (e,r); then (low,er)
    assert out == [
        (0, "l", "o", 3),
        (1, "lo", "w", 3),
        (2, "e", "r", 1),
        (3, "low", "er", 1),
    ]


def test_bpe_merge_is_nonoverlapping_leftmost(spark):
    # "aaa": pairs (a,a)x2 -> merge leaves [aa, a], NOT [aa, aa]
    docs = _docs(spark, [(1, "aaa")])
    out = [(r.merge_rank, r.left_sym, r.right_sym, r.n)
           for r in bpe_learn_merges(docs, n_merges=2).collect()]
    assert out[0] == (0, "a", "a", 2)
    # second round sees [aa, a] -> pair (aa, a) once
    assert out[1] == (1, "aa", "a", 1)


def test_bpe_stops_when_no_pairs_remain(spark):
    docs = _docs(spark, [(1, "ab")])
    out = bpe_learn_merges(docs, n_merges=5).collect()
    assert len(out) == 1  # (a,b) merges; the single symbol 'ab' has no pairs


def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_int8_quantize_scales_and_clamps(spark):
    e = _embs(spark, [
        (0, [2.0, -4.0]),
        (1, [-1.0, 2.0]),
        (2, [0.5, 0.0]),
    ])
    out = {(r.vec_id, r.dim): (r.q, r.scale)
           for r in embedding_int8_quantize(e).collect()}
    # dim 0 scale = 2.0: 2.0 -> 127, -1.0 -> floor(-63.5+0.5) = -63, 0.5 -> 32
    assert out[(0, 0)] == (127, 2.0)
    assert out[(1, 0)] == (-63, 2.0)
    assert out[(2, 0)] == (32, 2.0)
    # dim 1 scale = 4.0: -4.0 -> -127, 2.0 -> 64, 0.0 -> 0
    assert out[(0, 1)] == (-127, 4.0)
    assert out[(1, 1)] == (64, 4.0)
    assert out[(2, 1)] == (0, 4.0)


def test_int8_quantize_zero_dimension_yields_zero(spark):
    e = _embs(spark, [(0, [0.0]), (1, [0.0])])
    out = embedding_int8_quantize(e).collect()
    assert all(r.q == 0 for r in out)


def _clustered_vectors(spark, per_cluster=12, dim=64):
    """Two well-separated clusters: cluster A concentrated on the first
    32 dims, cluster B on the last 32 — PQ sub-distances separate them
    in every subspace."""
    rows = []
    for i in range(per_cluster):
        a = [10.0 + ((i * 7 + d) % 5) * 0.1 if d < dim // 2 else 0.1
             for d in range(dim)]
        b = [0.1 if d < dim // 2 else 10.0 + ((i * 11 + d) % 5) * 0.1
             for d in range(dim)]
        rows.append((2 * i, a))      # even ids: cluster A
        rows.append((2 * i + 1, b))  # odd ids: cluster B
    return _embs(spark, rows)


def test_ivf_pq_ann_finds_same_cluster_neighbors(spark):
    e = _clustered_vectors(spark)
    qs = e.where(F.col("vec_id").isin(0, 1))
    out = ivf_pq_ann(e, qs, k=5, n_centroids=4, nprobe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        # every returned neighbor is from the query's own cluster
        assert all(r.neighbor_id % 2 == qid % 2 for r in rows)
        # ranks are 1..5 ordered by nondecreasing approx distance
        rows.sort(key=lambda r: r.rank)
        dists = [r.approx_dist for r in rows]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)


def test_ivf_pq_agrees_with_pq_on_probed_lists(spark):
    """With nprobe = n_centroids (probe everything), IVF-PQ reduces to
    plain PQ ADC — the two must return identical neighbor sets."""
    from openeo_odc_driver_spark.pipeline.similarity import pq_ann

    e = _clustered_vectors(spark)
    qs = e.where(F.col("vec_id").isin(0, 1))
    full = ivf_pq_ann(e, qs, k=5, n_centroids=4, nprobe=4).collect()
    plain = pq_ann(e, qs, k=5).collect()
    key = lambda rows: {
        (r.query_id, r.rank): (r.neighbor_id, round(r.approx_dist, 9))
        for r in rows
    }
    assert key(full) == key(plain)


# --- dsir / bigram / pack_token_ids -----------------------------------------


def test_dsir_weights_favor_target_like_docs(spark):
    from openeo_odc_driver_spark.pipeline.text import dsir_importance_weights

    target = _docs(spark, [(100, "wiki science physics"), (101, "wiki math")])
    corpus = _docs(spark, [
        (1, "wiki science math"),      # target-like
        (2, "spam casino pills buy"),  # not
    ])
    out = {r.doc_id: r for r in dsir_importance_weights(corpus, target).collect()}
    # per-token mean so length doesn't confound the comparison
    assert out[1].logweight_fp / out[1].n_tokens > out[2].logweight_fp / out[2].n_tokens
    assert out[1].n_tokens == 3 and out[2].n_tokens == 4


def test_bigram_logprob_scores_likely_transitions_higher(spark):
    from openeo_odc_driver_spark.pipeline.text import bigram_logprob

    # "a b" dominates; doc 3 uses the rare transition "b a"
    docs = _docs(spark, [
        (1, "a b a b a b"),
        (2, "a b a b"),
        (3, "b a"),
    ])
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert out[1].mean_logprob_micro > out[3].mean_logprob_micro
    assert out[1].n_tokens == 6


def test_bigram_backoff_when_model_pruned(spark):
    from openeo_odc_driver_spark.pipeline.text import bigram_logprob

    docs = _docs(spark, [(1, "a b c a b"), (2, "c c")])
    # top_m=1 keeps only the most frequent bigram; everything else backs
    # off to the unigram term — must still produce finite scores
    out = bigram_logprob(docs, top_m=1).collect()
    assert len(out) == 2
    assert all(r.sum_logprob_fp < 0 for r in out)


def test_pack_token_ids_layout(spark):
    from openeo_odc_driver_spark.pipeline.sampling import pack_token_ids
    from openeo_odc_driver_spark.pipeline.text import vocab_with_ids

    docs = _docs(spark, [(i, "a b c d") for i in range(6)])
    vocab = vocab_with_ids(docs, k=3)
    out = pack_token_ids(docs, vocab, oov_id=3, seq_len=5, n_shards=2).collect()
    # 6 docs x (4 tokens + EOS) = 30 token rows total
    assert len(out) == 30
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r.seq_id, r.pos_in_seq))
        # positions are a dense 0..n-1 stream sliced into seq_len windows
        gpos = [r.seq_id * 5 + r.pos_in_seq for r in rows]
        assert gpos == list(range(len(rows)))
        # every doc contributes exactly one EOS (id 4)
        assert sum(1 for r in rows if r.token_id == 4) == len(rows) // 5
    # all sequences except possibly each shard's tail are full
    from collections import Counter

    for shard, rows in by_shard.items():
        sizes = Counter(r.seq_id for r in rows)
        tail = max(sizes)
        assert all(v == 5 for s, v in sizes.items() if s != tail)


def test_pack_token_ids_deterministic_across_layouts(spark):
    from openeo_odc_driver_spark.pipeline.sampling import pack_token_ids
    from openeo_odc_driver_spark.pipeline.text import vocab_with_ids

    docs = _docs(spark, [(i, "w x y z" * (1 + i % 3)) for i in range(10)])
    vocab = vocab_with_ids(docs, k=4)

    def run():
        return sorted(
            (r.shard, r.seq_id, r.pos_in_seq, r.token_id)
            for r in pack_token_ids(docs, vocab, oov_id=4,
                                    seq_len=7, n_shards=3).collect()
        )

    first = run()
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        assert run() == first
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def _py_bpe(words, n_merges):
    """Pure-Python reference BPE trainer (standard greedy leftmost
    non-overlapping merge) to pin the Spark fold's semantics against."""
    syms = {w: [c for c in w] for w in words}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (l, r), n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, l, r, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_fold_matches_python_reference(spark):
    import random

    rng = random.Random(42)
    for trial in range(2):
        vocab = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            for _ in range(12)
        ]
        counts = {w: rng.randint(1, 9) for w in set(vocab)}
        text = " ".join(w for w, c in sorted(counts.items()) for _ in range(c))
        docs = _docs(spark, [(1, text)])
        got = [(r.merge_rank, r.left_sym, r.right_sym, r.n)
               for r in bpe_learn_merges(docs, n_merges=5).collect()]
        assert got == _py_bpe(counts, 5), f"trial {trial}: {counts}"


def test_int8_dequant_error_bound(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-50, 50) for _ in range(8)]) for i in range(20)]
    e = _embs(spark, rows)
    orig = {(i): v for i, v in rows}
    for r in embedding_int8_quantize(e).collect():
        v = orig[r.vec_id][r.dim]
        dequant = r.q * r.scale / 127.0
        # half-step quantization error bound (float32 storage adds eps)
        assert abs(dequant - v) <= r.scale / 127.0 * 0.5 + 1e-2


def test_exact_substring_dedup_cuts_shared_spans(spark):
    from openeo_odc_driver_spark.pipeline.dedup import exact_substring_dedup

    shared = "one two three four"
    docs = _docs(spark, [
        (1, f"intro {shared} tail one"),
        (2, f"{shared} something else entirely here"),
        (3, "no duplicated span in this document at all"),
    ])
    out = {r.doc_id: r for r in exact_substring_dedup(docs, gram=4).collect()}
    # the shared 4-gram is cut from BOTH docs (no first-winner exemption)
    assert out[1].n_dropped == 4 and out[1].kept_text == "intro tail one"
    assert out[2].n_dropped == 4
    assert out[2].kept_text == "something else entirely here"
    assert out[3].n_dropped == 0
    assert out[3].kept_text == "no duplicated span in this document at all"


def test_exact_substring_dedup_overlapping_spans_union(spark):
    from openeo_odc_driver_spark.pipeline.dedup import exact_substring_dedup

    # "a b c d e" repeated: every 3-gram inside it duplicates; the
    # coverage union removes the whole run, and short docs are untouched
    docs = _docs(spark, [
        (1, "x a b c d e y"),
        (2, "z a b c d e w"),
        (3, "tiny"),
    ])
    out = {r.doc_id: r for r in exact_substring_dedup(docs, gram=3).collect()}
    assert out[1].kept_text == "x y" and out[1].n_dropped == 5
    assert out[2].kept_text == "z w" and out[2].n_dropped == 5
    assert (out[3].n_tokens, out[3].n_dropped) == (1, 0)
