"""Edge-case behavior of the round-4 text/packing operators on crafted
inputs (the fixture corpus never exercises empty/degenerate documents)."""

from pyspark.sql import functions as F

from openeo_odc_driver_spark.pipeline.sampling import pack_sequences
from openeo_odc_driver_spark.pipeline.text import (
    pii_scan,
    repetition_scores,
    vocab_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_degenerate_docs(spark):
    out = {
        r.doc_id: r
        for r in repetition_scores(
            _docs(
                spark,
                [
                    (1, ""),                      # empty
                    (2, "one"),                   # single token
                    (3, "a b\na b\na b"),         # fully duplicated lines
                    (4, ("x y z w v u t s r q " * 3).strip()),  # repeated 10-gram
                ],
            )
        ).collect()
    }
    # no NULLs / division blowups on degenerate docs
    for r in out.values():
        assert r.dup_line_frac is not None and r.dup_ngram_frac is not None
    assert out[1].n_lines == 1 and out[1].dup_line_frac == 0.0
    assert out[3].n_lines == 3
    assert abs(out[3].dup_line_frac - (1 - 1 / 3)) < 1e-12
    # doc 4: 30 tokens of a 10-token cycle → every 10-gram repeats
    assert out[4].dup_ngram_frac > 0.5


def test_pack_sequences_bin_boundaries(spark):
    chunks = spark.createDataFrame(
        [(i, 1, 4) for i in range(1, 5)],
        "doc_id long, chunk_start int, n_chunk_tokens int",
    )
    out = {
        r.doc_id: r.bin_id
        for r in pack_sequences(chunks, capacity=10, n_shards=1).collect()
    }
    # prefix sums 0,4,8,12 → bins 0,0,0,1: the third chunk spills bin 0
    # past capacity (contiguous fill, documented), the fourth starts bin 1
    assert out == {1: 0, 2: 0, 3: 0, 4: 1}


def test_vocab_tie_break_lexicographic(spark):
    out = vocab_top_terms(
        _docs(spark, [(1, "b a"), (2, "a b"), (3, "c")]), k=3
    ).collect()
    assert [(r.term, r.n) for r in out] == [("a", 2), ("b", 2), ("c", 1)]


def test_pii_scan_counts(spark):
    out = {
        r.doc_id: r
        for r in pii_scan(
            _docs(
                spark,
                [
                    (1, "contact us at a.b@example.com or c@d.org now"),
                    (2, "call 555-123-4567 from 10.0.0.1"),
                    (3, "nothing sensitive here"),
                ],
            )
        ).collect()
    }
    assert out[1].n_email == 2 and out[1].has_pii
    assert out[2].n_phone == 1 and out[2].n_ipv4 == 1 and out[2].has_pii
    assert not out[3].has_pii
