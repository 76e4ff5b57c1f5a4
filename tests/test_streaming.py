"""Structured Streaming windows: stream result must equal the batch
equivalent (one-epoch parquet stream, memory sink)."""

from pyspark.sql import functions as F

from openeo_odc_driver_spark.sources.tables import load_table
from openeo_odc_driver_spark.streaming.windows import (
    run_stream_to_memory,
    tumbling_counts,
)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Real late-data semantics: batch 1 advances event time to 12:00;
    a watermark of 10 minutes finalizes windows older than 11:50, so a
    batch-2 row stamped 09:05 must NOT update the 09:00 window in append
    mode — the reference has no streaming story at all (SURVEY §2.11)."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    chk = tmp_path / "chk"

    def write_file(name, rows):
        pd.DataFrame(rows, columns=["ts", "k", "v"]).astype(
            {"ts": "datetime64[us]"}
        ).to_parquet(src / name)

    write_file("b1.parquet", [
        ("2024-01-01 09:01:00", "a", 1.0),
        ("2024-01-01 12:00:00", "a", 1.0),  # advances the watermark
    ])
    schema = "ts timestamp, k string, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), "k", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .option("checkpointLocation", str(chk))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one on-time row and one LATE row for the 09:00 window
        write_file("b2.parquet", [
            ("2024-01-01 09:05:00", "a", 1.0),  # late: watermark is 11:50
            ("2024-01-01 12:30:00", "a", 1.0),
        ])
        q.processAllAvailable()
        # advance watermark past 13:00 so the 12:00 window finalizes
        write_file("b3.parquet", [("2024-01-01 15:00:00", "a", 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (str(r.ws), r.n) for r in spark.table("wm_test").collect()
    }
    # 09:00 window emitted with ONLY the on-time row (late 09:05 dropped);
    # 12:00 window has both its rows
    assert ("2024-01-01 09:00:00", 1) in out
    assert ("2024-01-01 12:00:00", 2) in out
    assert not any(ws == "2024-01-01 09:00:00" and n != 1 for ws, n in out)


def test_streaming_dedup_drops_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch is dropped — state
    remembers content hashes across batches."""
    import pandas as pd

    from openeo_odc_driver_spark.streaming.windows import stateful_stream_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    chk = tmp_path / "chk"

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(src / name)

    write("b1.parquet", [(1, "alpha"), (2, "beta")])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful_stream_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sd_test")
        .option("checkpointLocation", str(chk))
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2.parquet", [(3, "alpha"), (4, "gamma")])  # 3 is a dup
        q.processAllAvailable()
    finally:
        q.stop()
    survivors = {r.doc_id for r in spark.table("sd_test").collect()}
    assert survivors == {1, 2, 4}  # doc 3's content already seen in batch 1


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_memory(
        spark, sf_dir, tumbling_counts, name="t_stream_eq"
    ).select("window_start", "event_type", "n")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    assert stream_out.count() == batch.count()
    assert stream_out.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_out).count() == 0


def test_sliding_stream_each_event_in_two_windows(spark, sf_dir):
    """2h window / 1h slide: every event contributes to exactly two
    windows, so total count across windows = 2 × events."""
    from openeo_odc_driver_spark.streaming.windows import sliding_counts

    out = run_stream_to_memory(
        spark, sf_dir, sliding_counts, name="t_sliding_eq"
    )
    n_events = load_table(spark, sf_dir, "events").count()
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == 2 * n_events
    # slide=1h → window starts are hourly-aligned (gaps between distinct
    # starts are whole hours; sparse event types may skip hours)
    starts = [
        r.window_start
        for r in out.where("event_type = (SELECT min(event_type) FROM t_sliding_eq)")
        .orderBy("window_start")
        .collect()
    ]
    assert len(starts) >= 2
    assert all(
        ((b - a).total_seconds() % 3600.0) == 0.0
        for a, b in zip(starts, starts[1:])
    )


def test_stream_static_enrich_across_batches(spark, tmp_path):
    """The static side joins identically in every micro-batch."""
    import pandas as pd

    from openeo_odc_driver_spark.streaming.windows import stream_static_enrich

    src = tmp_path / "ev_src"
    src.mkdir()
    chk = tmp_path / "chk"

    def write(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "event_type", "value"]
        ).to_parquet(src / name)

    write("b1.parquet", [(1, "click", 2.0), (2, "view", 4.0)])
    dims = spark.createDataFrame(
        [("click", 10.0), ("view", 8.0)], "event_type string, type_max double"
    )
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_static_enrich(stream, dims)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_test")
        .option("checkpointLocation", str(chk))
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2.parquet", [(3, "click", 5.0)])  # second micro-batch
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.event_id: (r.type_max, r.value_frac_of_max)
           for r in spark.table("enrich_test").collect()}
    assert out == {1: (10.0, 0.2), 2: (8.0, 0.5), 3: (10.0, 0.5)}


def test_stream_near_dedup_multibatch_equals_batch(spark, tmp_path):
    """Batch-boundary invariance of the ingest-time near-dedup
    (streaming/near_dedup.py): the same new documents chopped into TWO
    micro-batches produce exactly the one-shot batch run's flags —
    each doc's flags depend only on (doc, existing corpus). Also pins
    the exactly-once read filter: an uncommitted batch dir (no
    _SUCCESS) is invisible to read_stream_flags."""
    import os

    from pyspark.sql import functions as F

    from openeo_odc_driver_spark.pipeline.dedup import (
        minhash_dedup_incremental,
        release_cached_signatures,
    )
    from openeo_odc_driver_spark.streaming.near_dedup import (
        read_stream_flags,
        stream_minhash_near_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    other = "completely different content about parquet row groups and scans"
    schema = "doc_id long, text string"
    existing = spark.createDataFrame(
        [(1, base), (2, other)], schema
    )
    new_rows = [
        (10, base),   # dup of existing 1 — arrives in batch 1
        (11, "novel text about structured streaming micro batch planning"),
        (20, base),   # dup of existing 1 — arrives in batch 2
        (21, other),  # dup of existing 2 — arrives in batch 2
    ]

    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    # single parquet FILES (not directories) — the file-stream source
    # lists plain files in the source dir
    pd.DataFrame(new_rows[:2], columns=["doc_id", "text"]).to_parquet(
        src / "b1.parquet"
    )
    pd.DataFrame(new_rows[2:], columns=["doc_id", "text"]).to_parquet(
        src / "b2.parquet"
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(str(src))
    )
    flags_dir = str(tmp_path / "flags")
    q = stream_minhash_near_dedup(
        stream, existing, path=flags_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # two committed batch dirs (one per micro-batch)
    committed = [d for d in os.listdir(flags_dir)
                 if d.startswith("batch=")
                 and os.path.exists(os.path.join(flags_dir, d, "_SUCCESS"))]
    assert len(committed) == 2

    streamed = {(r.new_doc, r.dup_of)
                for r in read_stream_flags(spark, flags_dir).collect()}
    release_cached_signatures()
    batch = {(r.new_doc, r.dup_of)
             for r in minhash_dedup_incremental(
                 spark.createDataFrame(new_rows, schema), existing,
                 jaccard_threshold=0.5, bands=4,
             ).collect()}
    release_cached_signatures()
    assert streamed == batch
    assert {(10, 1), (20, 1), (21, 2)} <= streamed
    assert not any(nd == 11 for nd, _ in streamed)  # novel doc unflagged

    # exactly-once read filter: a junk dir without _SUCCESS is invisible
    junk = os.path.join(flags_dir, "batch=99")
    os.makedirs(junk)
    assert {(r.new_doc, r.dup_of)
            for r in read_stream_flags(spark, flags_dir).collect()} == streamed


def test_stream_near_dedup_growing_asset_flags_intra_stream_dups(spark, tmp_path):
    """Growing-asset mode: a batch-2 document that duplicates a BATCH-1
    document (never in the initial corpus) is flagged against it — the
    production ingest semantics where the corpus grows as it streams.
    The replay-safe asset view (strictly earlier batches) keeps a doc
    from flagging against its own batch."""
    import os

    import pandas as pd

    from openeo_odc_driver_spark.pipeline.dedup import (
        release_cached_signatures,
    )
    from openeo_odc_driver_spark.streaming.near_dedup import (
        read_stream_flags,
        stream_minhash_near_dedup,
    )

    schema = "doc_id long, text string"
    seed = "the initial corpus document about parquet readers and scans"
    b1_text = "a fresh streaming document about banded minhash joins ok"
    existing = spark.createDataFrame([(1, seed)], schema)

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: two copies of a NEW text (same batch -> must NOT flag
    # each other) ; batch 2: a third copy (earlier batch -> MUST flag)
    pd.DataFrame([(10, b1_text), (11, b1_text)],
                 columns=["doc_id", "text"]).to_parquet(src / "b1.parquet")
    pd.DataFrame([(20, b1_text), (21, seed)],
                 columns=["doc_id", "text"]).to_parquet(src / "b2.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    flags_dir = str(tmp_path / "flags")
    q = stream_minhash_near_dedup(
        stream, existing, path=flags_dir,
        checkpoint=str(tmp_path / "ckpt"),
        grow_asset_dir=str(tmp_path / "asset"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    release_cached_signatures()

    flags = {(r.new_doc, r.dup_of)
             for r in read_stream_flags(spark, flags_dir).collect()}
    # batch-1 copies never flag each other (same batch)
    assert not any({a, b} == {10, 11} for a, b in flags)
    # batch-2's copy flags against BOTH batch-1 copies (grown asset)
    assert (20, 10) in flags and (20, 11) in flags
    # and the initial corpus still works as the seed
    assert (21, 1) in flags
    # asset dir carries the seed + both batch signature dirs
    asset_dirs = sorted(os.listdir(tmp_path / "asset"))
    assert asset_dirs == ["batch=-1", "batch=0", "batch=1"]
