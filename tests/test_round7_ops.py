"""Round-7 additions: semantic decontamination, PII redaction, and
normalized ("fuzzy-exact") dedup."""

from pyspark.sql import functions as F


def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_decontaminate_semantic_drops_near_eval_vectors(spark):
    from openeo_odc_driver_spark.pipeline.similarity import (
        decontaminate_semantic,
    )

    corpus = _embs(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),  # exact copy of eval 100
            (1, [0.99, 0.1, 0.0]),  # near-dup of eval 100 (cos ~0.995)
            (2, [0.0, 1.0, 0.0]),  # orthogonal — survives
            (3, [0.0, 0.0, -1.0]),  # anti-parallel to eval 101 — survives
            (4, [-2.0, 0.0, 0.0]),  # negative cosine to eval 100 — survives
        ],
    )
    evalset = _embs(spark, [(100, [2.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0])])
    kept = sorted(
        r.vec_id
        for r in decontaminate_semantic(corpus, evalset, 0.9).collect()
    )
    assert kept == [2, 3, 4]


def test_decontaminate_semantic_keeps_zero_norm_vectors(spark):
    """A zero vector has NULL cosine to everything — the NULL predicate
    must not match (mirrors the oracle's NOT IN over a hits set)."""
    from openeo_odc_driver_spark.pipeline.similarity import (
        decontaminate_semantic,
    )

    corpus = _embs(spark, [(0, [0.0, 0.0]), (1, [1.0, 0.0])])
    evalset = _embs(spark, [(100, [1.0, 0.0])])
    kept = sorted(
        r.vec_id
        for r in decontaminate_semantic(corpus, evalset, 0.9).collect()
    )
    assert kept == [0]


def test_decontaminate_semantic_is_broadcast_anti_no_shuffle(spark):
    """The plan contract: eval broadcasts, the corpus anti-joins in one
    pass with ZERO keyed exchanges — the property that makes the op a
    pure scan at 100 TB."""
    import re

    from openeo_odc_driver_spark.pipeline.similarity import (
        decontaminate_semantic,
    )

    corpus = _embs(spark, [(i, [float(i), 1.0]) for i in range(10)])
    evalset = _embs(spark, [(100, [1.0, 1.0])])
    plan = (
        decontaminate_semantic(corpus, evalset, 0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan
    assert not re.findall(
        r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
        plan,
    )


def test_pii_redact_replaces_all_patterns(spark):
    from openeo_odc_driver_spark.pipeline.text import pii_redact

    docs = spark.createDataFrame(
        [
            (0, "mail a@b.co and c.d@e.org twice"),
            (1, "call 555-123-4567 from 10.0.0.1"),
            (2, "clean text, nothing to redact"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert rows[0].text_redacted == "mail <EMAIL> and <EMAIL> twice"
    assert rows[0].n_redactions == 2
    assert rows[1].text_redacted == "call <PHONE> from <IPV4>"
    assert rows[1].n_redactions == 2
    assert rows[2].text_redacted == "clean text, nothing to redact"
    assert rows[2].n_redactions == 0


def test_pii_redact_counts_come_from_original_text(spark):
    """Sequential replacement must not double-count: the <EMAIL>
    placeholder the first pass writes is not itself a later match, and
    n_redactions is the original-text census either way."""
    from openeo_odc_driver_spark.pipeline.text import pii_redact

    docs = spark.createDataFrame(
        [(0, "x@y.io at 1.2.3.4")], "doc_id long, text string"
    )
    r = pii_redact(docs).collect()[0]
    assert r.text_redacted == "<EMAIL> at <IPV4>"
    assert r.n_redactions == 2


def test_normalize_for_dedup_key(spark):
    from openeo_odc_driver_spark.pipeline.dedup import normalize_for_dedup

    docs = spark.createDataFrame(
        [(0, "  Hello,   World! "), (1, "hello world"), (2, "HELLO-WORLD")],
        "doc_id long, text string",
    )
    keys = [
        r.k
        for r in docs.select(normalize_for_dedup().alias("k"))
        .orderBy("doc_id")
        .collect()
    ]
    assert keys == ["hello world"] * 3


def test_exact_dedup_normalized_collapses_recased_copies(spark):
    from openeo_odc_driver_spark.pipeline.dedup import exact_dedup_normalized

    docs = spark.createDataFrame(
        [
            (5, "The Quick Brown Fox."),
            (9, "the quick   brown fox"),
            (2, "THE QUICK BROWN FOX!!!"),
            (7, "a different document"),
        ],
        "doc_id long, text string",
    )
    got = {r.keep_doc_id: r.n_copies for r in exact_dedup_normalized(docs).collect()}
    assert got == {2: 3, 7: 1}


def test_exact_dedup_normalized_single_aggregate_plan(spark):
    """Same plan class as exact_dedup: ONE hash-aggregate exchange,
    nothing pairwise."""
    import re

    from openeo_odc_driver_spark.pipeline.dedup import exact_dedup_normalized

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        exact_dedup_normalized(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )
    assert n == 1


def test_streaming_pii_redact_equals_batch(spark, tmp_path):
    """pii_redact is stateless, so the streamed output must equal the
    batch projection row for row — the swap-batch-for-continuous
    guarantee, and the regression pin that ensure_min_parallelism
    stays streaming-safe (no .rdd probe on an unstarted stream)."""
    from openeo_odc_driver_spark.pipeline.text import pii_redact

    docs = spark.createDataFrame(
        [
            (0, "mail a@b.co now"),
            (1, "call 555-123-4567"),
            (2, "clean"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).format("parquet").load(src)
    qy = (
        pii_redact(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_pii_stream")
        .start()
    )
    try:
        qy.processAllAvailable()
    finally:
        qy.stop()
    got = {
        r.doc_id: (r.text_redacted, r.n_redactions)
        for r in spark.table("t_pii_stream").collect()
    }
    want = {
        r.doc_id: (r.text_redacted, r.n_redactions)
        for r in pii_redact(docs).collect()
    }
    assert got == want
