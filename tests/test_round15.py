"""Round-15 pins.

1. ADVICE r14 (low): ``time_to_planes_tiled`` labels planes with
   ``str(timestamp)`` but relabels the data column with
   ``date_format('yyyy-MM-dd HH:mm:ss')`` — sub-second or tz-aware
   axes would mismatch labels and values and silently drop tiles at
   the sink's plane mapping. Such axes now DEMOTE (return None).
2. ADVICE r14 (low): an explicitly requested reprojection whose CRS
   string cannot be parsed as EPSG must raise a named error instead
   of silently routing to the resolution-only branch via
   ``None == None`` — in BOTH planner tiers.
"""
from dataclasses import replace
from datetime import datetime, timedelta, timezone

import pytest

from openeo_odc_driver_spark.sources.synthetic import (
    CubeSpec,
    synthetic_cube,
)


def _single_band_tiled(spark):
    from openeo_odc_driver_spark.core import tiled as tl
    from openeo_odc_driver_spark.operators.filters import filter_bands

    cube = filter_bands(
        synthetic_cube(spark, CubeSpec(n_times=3)), ["B04"]
    )
    return tl.to_tiled(cube, tile=16, n_y=16, n_x=16)


def test_time_planes_demotes_on_microseconds(spark):
    from openeo_odc_driver_spark.core.tiled import time_to_planes_tiled

    tc = _single_band_tiled(spark)
    # whole-second axis squeezes fine
    assert time_to_planes_tiled(tc) is not None
    micro = tuple(
        t + timedelta(microseconds=123) for t in tc.schema.time_axis
    )
    tc_micro = replace(tc, schema=replace(tc.schema, time_axis=micro))
    assert time_to_planes_tiled(tc_micro) is None


def test_time_planes_demotes_on_tzaware(spark):
    from openeo_odc_driver_spark.core.tiled import time_to_planes_tiled

    tc = _single_band_tiled(spark)
    aware = tuple(
        datetime(t.year, t.month, t.day, tzinfo=timezone.utc)
        for t in tc.schema.time_axis
    )
    tc_tz = replace(tc, schema=replace(tc.schema, time_axis=aware))
    assert time_to_planes_tiled(tc_tz) is None


def _graph_with_projection(projection):
    return {
        "load": {"process_id": "load_collection",
                 "arguments": {"id": "synthetic"}},
        "k": {"process_id": "apply",
              "arguments": {"data": {"from_node": "load"},
                            "process": {"process_graph": {
                                "a": {"process_id": "absolute",
                                      "arguments": {"x": {"from_parameter": "x"}},
                                      "result": True}}}}},
        "rs": {"process_id": "resample_spatial",
               "arguments": {"data": {"from_node": "k"},
                             "resolution": 20.0,
                             "projection": projection},
               "result": True},
    }


@pytest.mark.parametrize("tiled", [False, True])
def test_unparseable_projection_raises(spark, tiled):
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    pg = ProcessGraph(
        _graph_with_projection("not-a-crs"),
        save_dir="/tmp/pg_r15_badcrs",
        tiled=tiled,
    )
    with pytest.raises(NotImplementedError, match="not-a-crs"):
        pg.execute(spark)


@pytest.mark.parametrize("tiled", [False, True])
def test_unparseable_projection_equal_to_cube_crs_is_resolution_only(
    spark, tiled
):
    """String-equal unparseable CRS == no reprojection requested —
    keeps the resolution-only route (both None -> same CRS)."""
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    pg = ProcessGraph(
        _graph_with_projection("EPSG:32632"),
        save_dir="/tmp/pg_r15_samecrs",
        tiled=tiled,
    )
    out = pg.execute(spark)
    df = out.df if hasattr(out, "df") else out
    assert df.count() > 0


# --- overview pyramids in the tiled store (round 15, VERDICT task 1) ----


def _store_with_overviews(spark, tmp_path):
    from openeo_odc_driver_spark.core import tiled as t

    root = str(tmp_path / "store")
    t.save_tiled(
        t.to_tiled(synthetic_cube(spark), tile=8, n_y=16, n_x=16),
        f"{root}/synthetic",
        overviews=(2, 4, 8),
    )
    return root


@pytest.mark.parametrize("resolution,level", [
    (30.0, None),   # no level factorizes -> base store, still exact
    (40.0, 4),      # L4 identity serve
    (60.0, 2),      # L2 + non-identity second snap
    (80.0, 8),      # L8 identity serve
])
def test_overview_pushdown_exact(spark, tmp_path, resolution, level):
    """The pushed-down coarse resample on an overview-bearing store is
    served from the proven-exact level (or the base when none proves
    out) and matches the long plan's in-scan coarsening exactly."""
    import pandas as pd

    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    root = _store_with_overviews(spark, tmp_path)

    def graph():
        return {"process_graph": {
            "load": {"process_id": "load_collection",
                     "arguments": {"id": "synthetic",
                                   "bands": ["B04", "B08"]}},
            "rs": {"process_id": "resample_spatial",
                   "arguments": {"data": {"from_node": "load"},
                                 "resolution": resolution},
                   "result": True},
        }}

    tpg = ProcessGraph(graph(), save_dir="/tmp/pg_r15_ov", tiled=True,
                       tiled_store_dir=root)
    got = tpg.execute(spark).df.toPandas()
    if level is None:
        assert tpg.tiled_overview_reads == []
    else:
        assert tpg.tiled_overview_reads == [("synthetic", level)]
    long_pg = ProcessGraph(graph(), save_dir="/tmp/pg_r15_ovl")
    want = long_pg.execute(spark).df.toPandas()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True,
                                  check_dtype=False)


def test_overview_levels_self_describing(spark, tmp_path):
    """Each level dir is a complete save_tiled store; the base scan
    never sees the _overviews subtree; the sidecar commits levels."""
    import json
    import os

    from openeo_odc_driver_spark.core import tiled as t

    root = _store_with_overviews(spark, tmp_path)
    path = f"{root}/synthetic"
    meta = json.load(open(os.path.join(path, "_tiled_meta.json")))
    assert meta["overviews"] == [2, 4, 8]
    base = t.load_tiled(spark, path)
    assert (base.n_y, base.n_x) == (16, 16)
    l4 = t.load_tiled(spark, f"{path}/_overviews/L4")
    # snap image extent: floor(10*15/40 + 0.5) = 4 -> cells 0..4
    assert (l4.n_y, l4.n_x) == (5, 5)
    assert l4.schema.grid.resx == 40.0
    assert l4.schema.bands == base.schema.bands
    # the base read's row count is unchanged by the hidden level dirs
    assert base.df.count() == 24 * 3 * 4  # times x bands x 2x2 tiles


def test_overview_values_are_the_direct_snap(spark, tmp_path):
    """Level data = resample_cube_spatial_tiled's own answer for the
    k-res grid (bit-exact), so any query resolved from a level is the
    full-res plan's answer by construction."""
    from dataclasses import replace

    import pandas as pd

    from openeo_odc_driver_spark.core import tiled as t
    from openeo_odc_driver_spark.core.cube import GridSpec

    root = _store_with_overviews(spark, tmp_path)
    l2 = t.load_tiled(spark, f"{root}/synthetic/_overviews/L2")
    tc = t.to_tiled(synthetic_cube(spark), tile=8, n_y=16, n_x=16)
    g = tc.schema.grid
    tgt = t.TiledCube(
        tc.df,
        replace(tc.schema, grid=GridSpec(g.x0, g.y0, 20.0, 20.0)),
        tc.tile, tc.n_y, tc.n_x,
    )
    want = t.from_tiled(
        t.resample_cube_spatial_tiled(tc, tgt, "near")
    ).df.toPandas()
    got = t.from_tiled(l2).df.toPandas()
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True, check_dtype=False,
    )


def test_ensure_overviews_additive_and_idempotent(spark, tmp_path):
    import json
    import os

    from openeo_odc_driver_spark.core import tiled as t

    path = str(tmp_path / "plain")
    t.save_tiled(
        t.to_tiled(synthetic_cube(spark), tile=8, n_y=16, n_x=16), path
    )
    meta = json.load(open(os.path.join(path, "_tiled_meta.json")))
    assert "overviews" not in meta
    assert t.ensure_overviews(spark, path, (2,)) == [2]
    assert t.ensure_overviews(spark, path, (2, 4)) == [2, 4]
    # idempotent: no rebuild, same answer
    assert t.ensure_overviews(spark, path, (2, 4)) == [2, 4]
    # a held lock skips (returns current levels) instead of blocking
    os.mkdir(os.path.join(path, ".ov.lock"))
    assert t.ensure_overviews(spark, path, (2, 4, 8)) == [2, 4]
    os.rmdir(os.path.join(path, ".ov.lock"))


def test_overview_selection_is_proof_gated():
    """select_overview_level returns the coarsest PROVEN level only —
    brute-force agreement with composing the actual winner maps."""
    import numpy as np

    from openeo_odc_driver_spark.core.tiled import (
        _axis_winner_map,
        _overview_factorizes,
    )

    for n, o, res, desc in [(16, 0.0, 10.0, False), (16, 150.0, 10.0, True),
                            (45, 3.5, 2.5, False)]:
        for k in (2, 4, 8):
            for r in (25.0, 30.0, 40.0, 60.0, 75.0, 80.0):
                try:
                    w_direct = _axis_winner_map(n, o, res, o, r, desc)
                    w_k = _axis_winner_map(n, o, res, o, res * k, desc)
                    w_2 = _axis_winner_map(
                        len(w_k), o, res * k, o, r, desc)
                    composed_ok = len(w_2) == len(w_direct) and bool(
                        (np.asarray(w_k)[np.asarray(w_2)]
                         == np.asarray(w_direct)).all())
                except Exception:
                    composed_ok = False
                assert _overview_factorizes(n, o, res, k, r, desc) \
                    == composed_ok
