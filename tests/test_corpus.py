"""Training-corpus writer: deterministic sharded layout + agreement with
the shuffle_shards / corpus_shard_layout query-side assignment."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.pipeline.sampling import shard_col, shuffle_shards
from openeo_odc_driver_spark.sinks.corpus import (
    read_training_corpus,
    write_training_corpus,
)
from openeo_odc_driver_spark.sources.tables import load_table

N_SHARDS = 4


def test_layout_one_file_per_partition_shard(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_training_corpus(docs, out, partition_col="lang", n_shards=N_SHARDS)

    lang_dirs = sorted(glob.glob(os.path.join(out, "lang=*")))
    assert lang_dirs, "no hive partition directories written"
    expected = {
        (r["lang"], r["shard"])
        for r in docs.select(
            "lang", shard_col(F.col("doc_id"), N_SHARDS).alias("shard")
        )
        .distinct()
        .collect()
    }
    seen = set()
    for ld in lang_dirs:
        lang = os.path.basename(ld).split("=", 1)[1]
        for sd in sorted(glob.glob(os.path.join(ld, "shard=*"))):
            shard = int(os.path.basename(sd).split("=", 1)[1])
            files = glob.glob(os.path.join(sd, "*.parquet"))
            assert len(files) == 1, f"{sd}: {len(files)} files, want exactly 1"
            seen.add((lang, shard))
    assert seen == expected


def test_roundtrip_and_shard_agreement(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus")
    write_training_corpus(docs, out, partition_col="lang", n_shards=N_SHARDS)

    back = read_training_corpus(spark, out)
    assert back.count() == docs.count()
    # no document lost or duplicated
    assert back.select("doc_id").distinct().count() == docs.count()

    # the materialized shard column equals the query-side assignment
    # (same md5 construction, same salt) for every document
    q = shuffle_shards(docs, n_shards=N_SHARDS).select("doc_id", "shard")
    diff = (
        back.select("doc_id", F.col("shard").alias("w_shard"))
        .join(q, "doc_id")
        .where(F.col("w_shard") != F.col("shard"))
        .count()
    )
    assert diff == 0


def test_rewrite_is_stable(spark, sf_dir, tmp_path):
    """Same input → same per-file row sets (layout is a pure function of
    the data, not of task scheduling)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_corpus(docs, a, n_shards=2)
    write_training_corpus(docs, b, n_shards=2)
    fa = read_training_corpus(spark, a).groupBy("lang", "shard").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    fb = read_training_corpus(spark, b).groupBy("lang", "shard").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    assert fa.exceptAll(fb).count() == 0 and fb.exceptAll(fa).count() == 0


def test_stream_ingest_cross_batch(spark, tmp_path):
    """Two micro-batches land in the same sharded layout; the reader sees
    the union exactly once and shard ids agree with the batch writer."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "corpus")
    chk = str(tmp_path / "chk")

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
            src / name
        )

    from openeo_odc_driver_spark.sinks.corpus import (
        read_training_corpus,
        stream_corpus_ingest,
    )

    write("b1.parquet", [(1, "alpha beta", "en"), (2, "gamma", "de")])
    stream = spark.readStream.schema("doc_id long, text string, lang string").parquet(
        str(src)
    )
    q = stream_corpus_ingest(stream, out, chk, n_shards=2, query_name="ci_test")
    try:
        q.processAllAvailable()
        write("b2.parquet", [(3, "delta", "en"), (4, "epsilon zeta", "fr")])
        q.processAllAvailable()
    finally:
        q.stop()

    back = read_training_corpus(spark, out)
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == [1, 2, 3, 4]

    expected = {
        r.doc_id: r.shard
        for r in spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 4)], "doc_id long"
        )
        .select("doc_id", shard_col(F.col("doc_id"), 2).alias("shard"))
        .collect()
    }
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert got == expected


def test_stream_ingest_crash_replay_is_exactly_once(spark, tmp_path):
    """Simulated mid-batch crash: the checkpoint commit for the last batch
    is removed (crash before offset commit) and its output dir is left
    with partial garbage (no _SUCCESS, a duplicated data file). The reader
    must not see the uncommitted batch, and the restarted stream must
    replay it into a clean overwrite — no duplicates, no loss."""
    import os
    import shutil

    import pandas as pd

    from openeo_odc_driver_spark.sinks.corpus import (
        read_training_corpus,
        stream_corpus_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "corpus")
    chk = str(tmp_path / "chk")

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(src / name)

    def start():
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string"
        ).parquet(str(src))
        return stream_corpus_ingest(stream, out, chk, n_shards=2,
                                    query_name="ci_crash_test")

    write("b1.parquet", [(1, "alpha", "en"), (2, "beta", "de")])
    q = start()
    try:
        q.processAllAvailable()
        write("b2.parquet", [(3, "gamma", "en"), (4, "delta", "fr")])
        q.processAllAvailable()
    finally:
        q.stop()

    # --- simulate the crash: batch 1 executed but never committed -------
    batches = sorted(d for d in os.listdir(out) if d.startswith("batch="))
    assert len(batches) == 2
    last = os.path.join(out, batches[-1])
    os.remove(os.path.join(last, "_SUCCESS"))           # no commit marker
    for root, _, files in os.walk(last):                # plant partial dupes
        for f in files:
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(root, f),
                            os.path.join(root, "part-dup-" + f))
    commits = os.path.join(chk, "commits")
    last_commit = max(f for f in os.listdir(commits) if not f.startswith("."))
    os.remove(os.path.join(commits, last_commit))
    crc = os.path.join(commits, f".{last_commit}.crc")
    if os.path.exists(crc):  # local-FS checksum sibling would poison re-create
        os.remove(crc)

    # reader sees only the committed batch — no partial rows
    mid = read_training_corpus(spark, out)
    assert sorted(r.doc_id for r in mid.select("doc_id").collect()) == [1, 2]

    # --- restart: the engine replays batch 1, overwriting the garbage ---
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = read_training_corpus(spark, out)
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == [1, 2, 3, 4]
    assert os.path.exists(os.path.join(last, "_SUCCESS"))
    # the planted duplicate files are gone (overwrite, not append)
    leftover = [
        f for root, _, files in os.walk(last) for f in files
        if f.startswith("part-dup-")
    ]
    assert leftover == []


def test_read_training_corpus_validates_partition_col(spark, tmp_path):
    import pandas as pd

    from openeo_odc_driver_spark.sinks.corpus import (
        read_training_corpus,
        write_training_corpus,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", "en"), (2, "b", "de")], columns=["doc_id", "text", "lang"]
        )
    )
    out = str(tmp_path / "c")
    write_training_corpus(docs, out, n_shards=2)
    assert read_training_corpus(spark, out, "lang").count() == 2
    with pytest.raises(ValueError, match="no partition column"):
        read_training_corpus(spark, out, "source")


def test_compact_corpus_is_pure_layout_change(spark, tmp_path):
    """Two streamed micro-batches (2 files per leaf) compact into the
    batch layout (1 file per leaf) with identical content, shard
    membership, and bytes a fresh batch write would produce."""
    import glob

    import pandas as pd

    from openeo_odc_driver_spark.sinks.corpus import (
        compact_corpus,
        read_training_corpus,
        stream_corpus_ingest,
        write_training_corpus,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "stream_corpus")
    chk = str(tmp_path / "chk")
    rows1 = [(1, "alpha beta", "en"), (2, "gamma", "de")]
    rows2 = [(3, "delta", "en"), (4, "epsilon zeta", "en")]

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(src / name)

    write("b1.parquet", rows1)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).parquet(str(src))
    q = stream_corpus_ingest(stream, out, chk, n_shards=2, query_name="cc_test")
    try:
        q.processAllAvailable()
        write("b2.parquet", rows2)
        q.processAllAvailable()
    finally:
        q.stop()

    compacted = str(tmp_path / "compacted")
    compact_corpus(spark, out, compacted, n_shards=2)

    # 1 file per (lang, shard) leaf after compaction
    files = glob.glob(f"{compacted}/lang=*/shard=*/part-*.parquet")
    leaves = {f.rsplit("/", 1)[0] for f in files}
    assert len(files) == len(leaves)

    # content identical to the streaming layout
    a = sorted(
        read_training_corpus(spark, out).select("doc_id", "text", "lang", "shard").collect()
    )
    b = sorted(
        read_training_corpus(spark, compacted).select("doc_id", "text", "lang", "shard").collect()
    )
    assert a == b

    # byte-identical to a fresh batch write of the same union
    fresh = str(tmp_path / "fresh")
    union = spark.createDataFrame(rows1 + rows2, "doc_id long, text string, lang string")
    write_training_corpus(union, fresh, n_shards=2)

    def leaf_bytes(root):
        outm = {}
        for f in glob.glob(f"{root}/lang=*/shard=*/part-*.parquet"):
            leaf = "/".join(f.rsplit("/", 3)[1:3])
            with open(f, "rb") as fh:
                outm[leaf] = fh.read()
        return outm

    assert leaf_bytes(compacted) == leaf_bytes(fresh)
