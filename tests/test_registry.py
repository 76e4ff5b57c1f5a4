"""Contract-level invariants of the query registry (the full oracle
comparison runs in scratch/verify_local.py / the driver gate)."""

from openeo_odc_driver_spark.registry import ORACLE, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_every_query_has_an_oracle():
    """Since round 5 the formerly rows-only queries carry fixed-expected-
    value literal oracles (fixtures/) — the driver has no rows-only tier,
    so an oracle-less entry can never go green."""
    assert set(QUERIES) - set(ORACLE) == set()


def test_spot_query_runs_and_matches_oracle(spark, sf_dir):
    """One end-to-end oracle comparison inside pytest (cheap smoke of the
    gate machinery itself)."""
    import duckdb
    import pandas as pd

    name = "reduce_time_mean"
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    ddf = con.execute(ORACLE[name]).df()
    cols = sorted(sdf.columns)
    sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
    ddf = ddf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, check_exact=True)


def test_gate_window_leads_with_unverified_queries():
    """The driver verifies the FIRST ~50 queries() entries per round; the
    15 queries without a green driver row (6 round-4 ops, 3 former
    no-oracle, 6 round-5 additions) must stay at the head so the next
    window reaches them — a priority-list edit that demotes one fails
    here, not in the round report."""
    import __spark_entry__ as E

    head = list(E.queries())[:15]
    expected = {
        "corpus_shard_layout", "corpus_stats_sketch", "repetition_scores",
        "pii_scan", "vocab_top_terms", "pack_sequences",
        "fit_curve_harmonic", "multimodal_decode", "multimodal_audio_decode",
        "paragraph_dedup", "bloom_decontaminate", "semantic_dedup_clusters",
        "streaming_corpus_ingest_stats", "kmeans_train", "unigram_logprob",
    }
    assert set(head) == expected
