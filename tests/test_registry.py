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
