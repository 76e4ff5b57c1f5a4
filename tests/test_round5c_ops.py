"""Round-5c ops: per-domain accounting, weighted/temperature sampling,
count-min heavy hitters, incremental minhash dedup, the logistic quality
classifier, and the Z-order clustered layout."""

import glob
import os

from pyspark.sql import functions as F

from openeo_odc_driver_spark.pipeline.classifier import (
    TRAINED_WEIGHTS,
    quality_classifier_score,
)
from openeo_odc_driver_spark.pipeline.dedup import minhash_dedup_incremental
from openeo_odc_driver_spark.pipeline.sampling import (
    priority_sample,
    temperature_sample_langs,
)
from openeo_odc_driver_spark.pipeline.stats import (
    count_min_heavy_grams,
    domain_stats,
)
from openeo_odc_driver_spark.sinks.zorder import (
    grid_indices,
    write_zordered,
    zorder_key,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _d(i, text, lang="en", source="s0"):
    return (i, text, lang, source, len(text))


# --- domain_stats -----------------------------------------------------------

def test_domain_stats_counts_and_dup_rate(spark):
    docs = _docs(spark, [
        _d(1, "a b c", source="s0"),
        _d(2, "a b c", source="s0"),   # exact dup of 1
        _d(3, "x y", source="s0"),
        _d(4, "p q r s", source="s1"),
    ])
    out = {r.source: r for r in domain_stats(docs).collect()}
    assert (out["s0"].n_docs, out["s0"].n_unique) == (3, 2)
    assert out["s0"].n_tokens == 8
    assert abs(out["s0"].dup_rate - (1 - 2 / 3)) < 1e-12
    assert (out["s1"].n_docs, out["s1"].dup_rate) == (1, 0.0)


# --- weighted / temperature sampling ---------------------------------------

def test_priority_sample_is_topk_by_weight_over_uniform(spark):
    docs = _docs(spark, [_d(i, "w " * 10, source="s") for i in range(100)])
    out = priority_sample(docs, k=10).collect()
    assert len(out) == 10
    # priorities are returned in descending order and are w/u
    pris = [r.priority for r in out]
    assert pris == sorted(pris, reverse=True)
    # every priority >= the weight itself (u <= 1)
    assert all(r.priority >= r.n_chars for r in out)


def test_priority_sample_plan_is_takeordered_no_shuffle(spark):
    docs = _docs(spark, [_d(i, "w") for i in range(10)])
    plan = priority_sample(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_temperature_sample_keeps_rarest_language_fully(spark):
    rows = [_d(i, "t", lang="en") for i in range(400)]
    rows += [_d(1000 + i, "t", lang="zh") for i in range(4)]
    out = temperature_sample_langs(_docs(spark, rows))
    rates = {r.lang: r.keep_rate for r in out.select("lang", "keep_rate").distinct().collect()}
    assert rates.get("zh") == 1.0            # n_min / n_min
    assert abs(rates["en"] - 0.1) < 1e-12    # sqrt(4/400)
    kept = out.groupBy("lang").count().collect()
    kept = {r.lang: r["count"] for r in kept}
    assert kept.get("zh") == 4               # rarest language intact
    # en downsampled to ~10% (md5-uniform, deterministic exact count)
    assert 20 <= kept["en"] <= 60


def test_temperature_sample_broadcasts_rates(spark):
    docs = _docs(spark, [_d(i, "t", lang="ab"[i % 2]) for i in range(20)])
    plan = (
        temperature_sample_langs(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- count-min sketch -------------------------------------------------------

def test_cms_estimate_dominates_exact_count(spark):
    docs = _docs(spark, [
        _d(1, "a b c a b c a b c"),
        _d(2, "a b c d e f"),
        _d(3, "x y z x y z"),
    ])
    out = count_min_heavy_grams(docs, n=3, k=10).collect()
    assert out, "expected gram rows"
    for r in out:
        assert r.cms_est >= r.n  # CMS can only overestimate
    top = {r.gram: r.n for r in out}
    assert top["a b c"] == 4  # 3 in doc1 (overlapping windows) + 1 in doc2

def test_cms_exact_counts_match_brute_force(spark):
    docs = _docs(spark, [_d(1, "a b c a b c a b c")])
    out = {r.gram: (r.n, r.cms_est) for r in count_min_heavy_grams(docs, n=3, k=10).collect()}
    # 7 window positions: a b c / b c a / c a b / ... -> "a b c" x3
    assert out["a b c"][0] == 3
    # no collisions plausible at this size: estimate equals exact
    assert out["a b c"][1] >= 3


def test_cms_sketch_lookup_is_broadcast(spark):
    docs = _docs(spark, [_d(1, "a b c d e")])
    plan = (
        count_min_heavy_grams(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- incremental minhash dedup ----------------------------------------------

def test_incremental_dedup_flags_new_vs_existing_only(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the long meadow toward the river bank"
    )
    other = (
        "completely different content about spark physical plans and "
        "shuffle exchanges in distributed query execution engines"
    )
    third = (
        "yet another unrelated document discussing parquet row groups "
        "and min max statistics for predicate pushdown at scale"
    )
    existing = _docs(spark, [_d(1, base), _d(2, other)])
    new = _docs(spark, [
        _d(10, base),    # dup of existing 1
        _d(11, third),   # novel
        _d(12, third),   # dup of 11 — but new/new pairs must NOT be flagged
    ])
    out = minhash_dedup_incremental(new, existing, jaccard_threshold=0.5).collect()
    pairs = {(r.new_doc, r.dup_of) for r in out}
    assert (10, 1) in pairs
    new_ids = {10, 11, 12}
    assert all(p[1] not in new_ids for p in pairs), "existing side only"
    assert all(p[0] in new_ids for p in pairs), "new side only"
    assert not any(p[0] in (11, 12) for p in pairs), "novel docs unflagged"


# --- quality classifier -----------------------------------------------------

def test_classifier_score_separates_on_stopword_signal(spark):
    stopful = "the and a of to " * 12          # stop ratio 1.0
    stopless = "alpha beta gamma delta " * 15  # stop ratio 0.0
    docs = _docs(spark, [_d(1, stopful.strip()), _d(2, stopless.strip())])
    out = {r.doc_id: r for r in quality_classifier_score(docs).collect()}
    assert out[1].keep and out[1].margin_fp > 0
    assert (not out[2].keep) and out[2].margin_fp < 0


def test_classifier_score_zero_exchanges(spark):
    docs = _docs(spark, [_d(1, "a b c")])
    plan = (
        quality_classifier_score(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_trained_checkpoint_matches_fixture(spark):
    import json, os
    fx = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "openeo_odc_driver_spark", "fixtures", "quality_classifier_train.json",
    )
    rows = dict()
    with open(fx) as fh:
        for name, fp in json.load(fh)["rows"]:
            rows[name] = fp
    for name, w in TRAINED_WEIGHTS.items():
        assert rows[name] == round(w * 1e7), name
    assert rows["_train_acc_fp"] >= 9_500_000  # the distilled rule is learnable


# --- z-order layout ---------------------------------------------------------

def test_zorder_key_interleaves_bits(spark):
    df = spark.range(1).select(
        zorder_key(F.lit(3), F.lit(5)).alias("z"),
        zorder_key(F.lit(0), F.lit(0)).alias("z0"),
        zorder_key(F.lit(15), F.lit(15)).alias("zmax"),
    )
    r = df.first()
    # x=0b0011 -> bits at 0,2 ; y=0b0101 -> bits at 1,5 -> 1+4+2+32
    assert r.z == 39
    assert r.z0 == 0
    assert r.zmax == 255


class _Grid:
    x0, y0, resx, resy = 0.0, 150.0, 10.0, 10.0


def _cells(spark):
    return spark.sql(
        "SELECT CAST(10.0*xi AS DOUBLE) AS x, CAST(150.0-10.0*yi AS DOUBLE) AS y "
        "FROM range(16) tx(xi), range(16) ty(yi)"
    )


def test_zorder_layout_prunes_xslab_better_than_rowmajor(spark, tmp_path):
    cells = _cells(spark)
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    write_zordered(cells, zpath, _Grid, n_files=8)
    # row-major comparison layout: range-partitioned by y only
    (
        cells.repartitionByRange(8, F.col("y"))
        .sortWithinPartitions("y")
        .write.mode("overwrite").parquet(rpath)
    )

    def files_touched(path):
        hit = 0
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            stats = (
                spark.read.parquet(f)
                .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
                .first()
            )
            # the x-slab predicate x <= 30 (ix in 0..3)
            if stats.lo <= 30.0:
                hit += 1
        return hit

    z_hit, r_hit = files_touched(zpath), files_touched(rpath)
    assert r_hit == 8          # row-major stripes all intersect the slab
    assert z_hit < r_hit       # z-order files have compact x footprints
    assert z_hit <= 4


# --- content-defined chunking ----------------------------------------------

def test_cdc_chunks_cover_document_exactly(spark):
    from openeo_odc_driver_spark.pipeline.text import cdc_chunk_documents

    docs = _docs(spark, [_d(1, " ".join(f"tok{i}" for i in range(100)))])
    out = sorted(cdc_chunk_documents(docs).collect(), key=lambda r: r.chunk_idx)
    # chunks tile the token range contiguously
    assert out[0].chunk_start == 1
    for a, b in zip(out, out[1:]):
        assert b.chunk_start == a.chunk_start + a.n_chunk_tokens
    assert out[-1].chunk_start + out[-1].n_chunk_tokens - 1 == 100
    assert len(out) > 1  # the mask actually fires on 100 tokens


def test_cdc_edit_locality_preserves_downstream_chunks(spark):
    """The CDC property fixed-stride chunking lacks: an insertion near
    the front re-cuts only the chunk it lands in — downstream chunk
    hashes survive, so chunk-level dedup still matches them."""
    from openeo_odc_driver_spark.pipeline.text import cdc_chunk_documents

    base = [f"tok{i}" for i in range(200)]
    edited = ["INSERTED"] + base
    docs = _docs(spark, [_d(1, " ".join(base)), _d(2, " ".join(edited))])
    chunks = cdc_chunk_documents(docs).collect()
    h1 = [r.chunk_md5 for r in sorted(
        (r for r in chunks if r.doc_id == 1), key=lambda r: r.chunk_idx)]
    h2 = [r.chunk_md5 for r in sorted(
        (r for r in chunks if r.doc_id == 2), key=lambda r: r.chunk_idx)]
    # all but the first chunk of the original reappear verbatim
    shared = set(h1) & set(h2)
    assert len(shared) >= len(h1) - 1
    # and the common suffix is identical in order
    k = min(len(h1), len(h2))
    assert h1[-(k - 1):] == h2[-(k - 1):]


def test_cdc_chunks_zero_exchanges(spark):
    from openeo_odc_driver_spark.pipeline.text import cdc_chunk_documents

    docs = _docs(spark, [_d(1, "a b c d e f g h")])
    plan = (
        cdc_chunk_documents(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


# --- gopher rule flags -------------------------------------------------------

def test_gopher_flags_fire_on_rule_violations(spark):
    from openeo_odc_driver_spark.pipeline.text import gopher_quality_flags

    good = "the quick brown fox " * 15  # 60 words, stopwords, clean
    short = "tiny doc"                  # word count below 50
    hashy = ("the word " * 30 + "# " * 20).strip()  # hash ratio > 0.1
    docs = _docs(spark, [_d(1, good.strip()), _d(2, short), _d(3, hashy)])
    out = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert out[1].keep
    assert not out[2].ok_n_words and not out[2].keep
    assert not out[3].ok_hash_ratio and not out[3].keep
    # the hashy doc still passes unrelated rules
    assert out[3].ok_stopwords


def test_gopher_flags_zero_exchanges(spark):
    from openeo_odc_driver_spark.pipeline.text import gopher_quality_flags

    docs = _docs(spark, [_d(1, "a b c")])
    plan = (
        gopher_quality_flags(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


# --- skew salting ------------------------------------------------------------

def test_salted_join_equals_unsalted_join(spark):
    from openeo_odc_driver_spark.pipeline.skew import salt_skewed_join

    # one pathologically hot key, several normal ones
    probe = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else f"k{i % 5}") for i in range(200)],
        "row_id long, key string",
    )
    build = spark.createDataFrame(
        [("hot", 1.0), ("hot", 2.0), ("k1", 10.0), ("k3", 30.0)],
        "key string, payload double",
    )
    plain = sorted(
        (r.row_id, r.key, r.payload)
        for r in probe.join(build, "key").collect()
    )
    salted = sorted(
        (r.row_id, r.key, r.payload)
        for r in salt_skewed_join(
            probe, build, "key", ["hot"], "row_id", n_salts=8
        ).collect()
    )
    assert salted == plain and len(plain) == 100 * 2 + 20 + 20


def test_salting_spreads_hot_key_over_subkeys(spark):
    from openeo_odc_driver_spark.pipeline.sampling import _uniform
    from pyspark.sql import functions as F

    n = 8
    probe = spark.createDataFrame(
        [(i, "hot") for i in range(800)], "row_id long, key string"
    )
    salts = probe.select(
        F.floor(_uniform(F.col("row_id").cast("string"), "salt0") * F.lit(float(n)))
        .cast("int").alias("s")
    ).groupBy("s").count().collect()
    counts = {r.s: r["count"] for r in salts}
    assert set(counts) == set(range(n))  # every sub-key used
    assert max(counts.values()) < 800 / n * 1.5  # roughly even spread


# --- incremental sketch stats ------------------------------------------------

def test_incremental_stats_union_matches_exact_at_fixture_scale(spark):
    from openeo_odc_driver_spark.pipeline.stats import incremental_corpus_stats

    docs = _docs(spark, [
        _d(i, f"text number {i}", lang="en" if i % 2 else "de")
        for i in range(60)
    ] + [_d(100, "text number 1", lang="en")])  # one cross-batch dup
    out = {r.lang: r for r in incremental_corpus_stats(docs, n_batches=3).collect()}
    assert out["en"].n_docs == 31
    assert out["en"].n_unique == 30  # the dup collapses across batches
    assert out["en"].hll_ok and out["de"].hll_ok


def test_cdc_boundary_filter_appears_once_in_plan(spark):
    """Tripwire for the 34x regression: if the boundary md5 filter is
    ever inlined into multiple references again (CollapseProject +
    no-CSE lambdas), its expression text shows up more than once in the
    physical plan."""
    from openeo_odc_driver_spark.pipeline.text import cdc_chunk_documents

    docs = _docs(spark, [_d(1, " ".join(f"t{i}" for i in range(50)))])
    plan = (
        cdc_chunk_documents(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the boundary hash is the conv(substring(md5(...)) wrapper; the
    # final chunk_md5 projection also calls md5 but without conv
    assert plan.count("conv(substring(md5(") == 1


# --- event analytics ---------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_splits_on_gap(spark):
    from datetime import datetime as dt

    from openeo_odc_driver_spark.pipeline.events import sessionize_events

    rows = [
        (1, dt(2024, 1, 1, 10, 0), 7, "view", 0.0),
        (2, dt(2024, 1, 1, 10, 10), 7, "click", 0.0),
        (3, dt(2024, 1, 1, 12, 0), 7, "view", 0.0),   # > 30 min gap
        (4, dt(2024, 1, 1, 10, 5), 8, "view", 0.0),
    ]
    out = sorted(
        sessionize_events(_events(spark, rows)).collect(),
        key=lambda r: (r.user_id, r.session_idx),
    )
    assert [(r.user_id, r.session_idx, r.n_events) for r in out] == [
        (7, 1, 2), (7, 2, 1), (8, 1, 1),
    ]
    assert out[0].duration_us == 10 * 60 * 1_000_000


def test_funnel_enforces_order(spark):
    from datetime import datetime as dt

    from openeo_odc_driver_spark.pipeline.events import funnel_conversion

    rows = [
        # user 1: full ordered funnel
        (1, dt(2024, 1, 1, 9), 1, "view", 0.0),
        (2, dt(2024, 1, 1, 10), 1, "click", 0.0),
        (3, dt(2024, 1, 1, 11), 1, "purchase", 0.0),
        # user 2: purchase BEFORE view/click — must not convert past step 1
        (4, dt(2024, 1, 1, 8), 2, "purchase", 0.0),
        (5, dt(2024, 1, 1, 9), 2, "view", 0.0),
        (6, dt(2024, 1, 1, 10), 2, "click", 0.0),
    ]
    out = {r.step: r.n_users for r in funnel_conversion(
        _events(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out == {"view": 2, "click": 2, "purchase": 1}


def test_anomaly_hours_integer_z_test(spark):
    from datetime import datetime as dt

    from openeo_odc_driver_spark.pipeline.events import anomaly_hours

    # 49 calm hours of 10 events + one 100-event spike (z ≈ 7).
    # NB a single outlier among only ~10 points cannot exceed 3σ — it
    # IS most of the variance — which the first draft of this test
    # tripped over at exactly z = 3.0.
    rows = []
    eid = 0
    for h in range(49):
        for i in range(10):
            rows.append((eid, dt(2024, 1, 1 + h // 24, h % 24, i), 1, "click", 0.0)); eid += 1
    for i in range(100):
        rows.append((eid, dt(2024, 1, 3, 5, i % 60, i // 60), 1, "click", 0.0)); eid += 1
    out = {r.event_type: r for r in anomaly_hours(_events(spark, rows)).collect()}
    r = out["click"]
    assert (r.n_hours, r.n_anomalous, r.peak_count) == (50, 1, 100)


def test_retention_cohort_offsets_are_weekly(spark):
    from datetime import datetime as dt

    from openeo_odc_driver_spark.pipeline.events import retention_cohorts

    rows = [
        (1, dt(2024, 1, 1, 9), 1, "view", 0.0),    # Mon wk0 (cohort)
        (2, dt(2024, 1, 10, 9), 1, "view", 0.0),   # Wed wk1
        (3, dt(2024, 1, 22, 9), 1, "view", 0.0),   # Mon wk3
        (4, dt(2024, 1, 3, 9), 2, "view", 0.0),    # Wed wk0 (cohort same week)
    ]
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(_events(spark, rows)).collect()}
    wk0 = dt(2024, 1, 1)
    assert out[(wk0, 0)] == 2   # both users active in their cohort week
    assert out[(wk0, 1)] == 1
    assert out[(wk0, 3)] == 1
    assert len(out) == 3


def test_priority_sample_deterministic_across_layouts(spark):
    from openeo_odc_driver_spark.pipeline.sampling import priority_sample

    docs = _docs(spark, [_d(i, "x" * (1 + i % 17)) for i in range(300)])
    a = priority_sample(docs, k=20).collect()
    b = priority_sample(docs.repartition(7), k=20).collect()
    assert [(r.doc_id, r.priority) for r in a] == [
        (r.doc_id, r.priority) for r in b
    ]
