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
    """The driver verifies the FIRST ~50 queries() entries per round.
    Every previously registered query has a green row, so the ordering
    contract is: queries with NO driver row yet (this round's additions)
    lead, and the rest follow stalest-first (r02 before r03 before …) —
    a priority-list edit that demotes a never-checked query fails here,
    not in the round report. Reads ALL shipped CORRECTNESS reports so a
    new round's file doesn't silently shift the baseline (the r06 bug
    class this suite caught in /registry)."""
    import glob
    import json
    import os
    import re

    import __spark_entry__ as E

    names = list(E.queries())
    latest = {}
    here = os.path.dirname(os.path.abspath(E.__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            for k, v in json.load(fh).items():
                if v.get("rows_match") and v.get("hash_match"):
                    latest[k] = r
    never_checked = [n for n in names if n not in latest]
    # every never-checked query precedes every already-green query
    first_green_idx = min(names.index(n) for n in latest if n in names)
    assert all(names.index(n) < first_green_idx or n in latest
               for n in never_checked), (
        f"never-checked queries must lead: {never_checked}"
    )
    # the already-green remainder is ordered stalest-first
    green_rounds = [latest[n] for n in names if n in latest]
    assert green_rounds == sorted(green_rounds)
