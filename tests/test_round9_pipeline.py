"""Round-9 pipeline ops: packed-stream document spans, epoch-weighted
source mixing, tokenizer fertility census."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_pack_spans_tile_the_packed_stream_exactly(spark):
    """The spans are the packed stream's ground truth: per (shard,
    seq_id) the span lengths sum to the sequence's token count, spans
    are disjoint and contiguous from 0, and each document's total span
    length is its token count + 1 (EOS)."""
    from openeo_odc_driver_spark.pipeline.sampling import (
        pack_token_ids,
        pack_token_ids_spans,
    )
    from openeo_odc_driver_spark.pipeline.text import (
        tokenize_to_ids,
        vocab_with_ids,
    )

    docs = _docs(spark)
    vocab = vocab_with_ids(docs, k=20)
    packed = pack_token_ids(docs, vocab, oov_id=20, seq_len=64, n_shards=4)
    spans = pack_token_ids_spans(
        docs, vocab, oov_id=20, seq_len=64, n_shards=4
    ).toPandas()
    seq_counts = (
        packed.groupBy("shard", "seq_id").count().toPandas()
        .set_index(["shard", "seq_id"])["count"].to_dict()
    )
    span_sums = (
        spans.groupby(["shard", "seq_id"])["len"].sum().to_dict()
    )
    assert span_sums == seq_counts
    # contiguity: sorted spans within a sequence start where the
    # previous ended
    for (sh, sq), grp in spans.groupby(["shard", "seq_id"]):
        pos = 0
        for _, r in grp.sort_values("start").iterrows():
            assert r["start"] == pos
            pos += r["len"]
    # per-document totals = n_tokens + 1 (EOS)
    ntok = (
        tokenize_to_ids(docs, vocab, 20).groupBy("doc_id").count()
        .toPandas().set_index("doc_id")["count"].to_dict()
    )
    doc_sums = spans.groupby("doc_id")["len"].sum().to_dict()
    assert doc_sums == {d: n + 1 for d, n in ntok.items()}


def test_mix_epochs_volumes_and_determinism(spark):
    from openeo_odc_driver_spark.pipeline.sampling import mix_epochs

    docs = _docs(spark)
    recipe = {"src0": 2.25, "src1": 1.5, "src2": 0.25, "src3": 0.0}
    out = mix_epochs(docs, recipe, by="source").toPandas()
    again = mix_epochs(docs, recipe, by="source").toPandas()
    key = ["doc_id", "source", "copy"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )
    # e=0 sources vanish; integer-epoch floors hold per doc
    assert not (out["source"] == "src3").any()
    per_doc = out.groupby(["doc_id", "source"])["copy"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["max"] == per_doc["count"] - 1).all()  # contiguous
    n_docs = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    vol = out.groupby("source")["copy"].count()
    # floors: every src0 doc appears >= 2 times, src1 >= 1, default exactly 1
    assert vol["src0"] >= 2 * n_docs["src0"]
    assert vol["src0"] <= 3 * n_docs["src0"]
    assert vol["src1"] >= n_docs["src1"]
    assert vol["src4"] == n_docs["src4"]
    # growth stability: the same docs in a half corpus keep their counts
    half = mix_epochs(
        docs.where(F.col("doc_id") % 2 == 0), recipe, by="source"
    ).toPandas()
    merged = half.groupby("doc_id")["copy"].count().to_dict()
    full_counts = out[out["doc_id"] % 2 == 0].groupby("doc_id")["copy"].count().to_dict()
    assert merged == full_counts


def test_token_fertility_matches_pandas_reference(spark):
    import re

    from openeo_odc_driver_spark.pipeline.text import (
        BPE_SPLIT_RE,
        token_fertility_stats,
    )

    docs = _docs(spark)
    got = token_fertility_stats(docs).toPandas().set_index("lang")
    pdf = docs.toPandas()
    rx = re.compile(BPE_SPLIT_RE)
    for lang, grp in pdf.groupby("lang"):
        ws = sum(len(t.strip().split()) for t in grp["text"])
        pieces = sum(len(rx.findall(t)) for t in grp["text"])
        chars = sum(len(t) for t in grp["text"])
        row = got.loc[lang]
        assert row["n_docs"] == len(grp)
        assert row["n_ws_tokens"] == ws
        assert row["n_bpe_pieces"] == pieces
        assert row["n_chars"] == chars
        assert row["fertility"] == pieces / ws
