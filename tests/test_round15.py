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


# --- Web Mercator (3857) + LAEA Europe (3035) warp targets --------------


def test_webmerc_known_values():
    """Published spherical Pseudo-Mercator values: x is linear in lon
    (half-circumference 20037508.342789244 at 180°), y(45°) =
    R·ln(tan(67.5°))."""
    import math

    import numpy as np

    from openeo_odc_driver_spark.functions.proj import (
        webmerc_to_wgs84_np,
        wgs84_to_webmerc_np,
    )

    x, y = wgs84_to_webmerc_np(np.array([10.0, 180.0, 0.0]),
                               np.array([45.0, 0.0, 0.0]))
    assert abs(x[0] - 20037508.342789244 / 18) < 1e-6
    assert abs(x[1] - 20037508.342789244) < 1e-6
    assert abs(y[0] - 6378137.0 * math.log(math.tan(math.radians(67.5)))) \
        < 1e-6
    assert y[2] == 0.0 and x[2] == 0.0
    lon, lat = webmerc_to_wgs84_np(x, y)
    assert np.abs(lon - [10.0, 180.0, 0.0]).max() < 1e-11
    assert np.abs(lat - [45.0, 0.0, 0.0]).max() < 1e-11


def test_laea_published_test_point():
    """EPSG Guidance Note 7-2 test point for ETRS89-LAEA (EPSG:3035):
    50°N 5°E → E 3962799.45, N 2999718.85; the projection center maps
    to the false origin EXACTLY, both directions."""
    import numpy as np

    from openeo_odc_driver_spark.functions.proj import (
        laea_to_wgs84_np,
        wgs84_to_laea_np,
    )

    e, n = wgs84_to_laea_np(np.array([5.0]), np.array([50.0]))
    assert abs(e[0] - 3962799.45) < 0.01
    assert abs(n[0] - 2999718.85) < 0.01
    e, n = wgs84_to_laea_np(np.array([10.0]), np.array([52.0]))
    assert e[0] == 4321000.0 and n[0] == 3210000.0
    lon, lat = laea_to_wgs84_np(np.array([4321000.0]),
                                np.array([3210000.0]))
    assert lon[0] == 10.0 and lat[0] == 52.0


def test_laea_roundtrip_over_europe():
    import numpy as np

    from openeo_odc_driver_spark.functions.proj import (
        laea_to_wgs84_np,
        wgs84_to_laea_np,
    )

    lon = np.linspace(-10, 30, 41)
    lat = np.linspace(35, 70, 36)
    lo, la = np.meshgrid(lon, lat)
    e, n = wgs84_to_laea_np(lo.ravel(), la.ravel())
    lo2, la2 = laea_to_wgs84_np(e, n)
    assert np.abs(lo2 - lo.ravel()).max() < 1e-8
    assert np.abs(la2 - la.ravel()).max() < 1e-8  # <1.2 mm


def test_validate_warp_pair_accepts_new_targets():
    import pytest as _pytest

    from openeo_odc_driver_spark.functions.proj import validate_warp_pair

    validate_warp_pair(4326, 3857)
    validate_warp_pair(4326, 3035)
    validate_warp_pair(3857, 32632)  # composes through lon/lat
    validate_warp_pair(3035, 4326)
    validate_warp_pair(4326, 3031)
    validate_warp_pair(3413, 4326)
    validate_warp_pair(3031, 3413)  # pole-to-pole, through lon/lat
    with _pytest.raises(NotImplementedError, match="2154"):
        validate_warp_pair(4326, 2154)


def test_warp_webmerc_metric_ground_truth(spark):
    """4326→3857 nearest: every output equals the source value at the
    nearest source pixel of its inverse-projected center (independent
    recomputation, the r13/r14 warp-pin pattern)."""
    import numpy as np

    from openeo_odc_driver_spark.functions.proj import webmerc_to_wgs84_np
    from openeo_odc_driver_spark.operators.resample import (
        resample_spatial_warp,
    )

    spec = CubeSpec(resx=0.0078125, resy=0.00390625,
                    x0=11.2890625, y0=46.51953125, n_times=3)
    cube = synthetic_cube(spark, spec)
    out = resample_spatial_warp(cube, 3857, 500.0)
    assert out.schema.crs == "EPSG:3857"
    pdf = out.df.toPandas()
    assert len(pdf) > 200
    src = cube.df.toPandas()
    lut = {}
    for b, ts, yy, xx, v in src[
        ["band", "time", "y", "x", "value"]
    ].itertuples(index=False, name=None):
        yi = int(round((spec.y0 - yy) / spec.resy))
        xi = int(round((xx - spec.x0) / spec.resx))
        lut[(b, ts, yi, xi)] = v
    lon, lat = webmerc_to_wgs84_np(pdf["x"].to_numpy(),
                                   pdf["y"].to_numpy())
    xi = np.floor((lon - spec.x0) / spec.resx + 0.5).astype(int)
    yi = np.floor((spec.y0 - lat) / spec.resy + 0.5).astype(int)
    for i in range(len(pdf)):
        want = lut[(pdf["band"].iloc[i], pdf["time"].iloc[i],
                    int(yi[i]), int(xi[i]))]
        got = pdf["value"].iloc[i]
        assert (got == want) or (got is None and want is None) or (
            got != got and want != want
        )


def test_warp_laea_bilinear_linear_field_exact(spark):
    """Bilinear through 3035 over a field linear in (y, x) reproduces
    the field at the blended source coordinate to 1e-9 — the
    independent correctness pin that needs no captured values."""
    import numpy as np

    from openeo_odc_driver_spark.functions.proj import laea_to_wgs84_np
    from openeo_odc_driver_spark.operators.resample import (
        resample_spatial_warp,
    )
    from openeo_odc_driver_spark.core.cube import Cube

    spec = CubeSpec(resx=0.0078125, resy=0.00390625,
                    x0=11.2890625, y0=46.51953125, n_times=1)
    cube = synthetic_cube(spark, spec)
    from pyspark.sql import functions as F
    lin = cube.with_df(
        cube.df.where("band = 'B04'")
        .withColumn("value", F.col("x") * 3.0 + F.col("y") * 7.0)
    )
    out = resample_spatial_warp(lin, 3035, 400.0, method="bilinear")
    pdf = out.df.toPandas()
    assert len(pdf) > 200
    lon, lat = laea_to_wgs84_np(pdf["x"].to_numpy(), pdf["y"].to_numpy())
    # interior targets only (edge cells renormalize over fewer
    # neighbors, which changes the blend of a LINEAR field)
    inside = (
        (lon >= spec.x0) & (lon <= spec.x0 + spec.resx * 15)
        & (lat <= spec.y0) & (lat >= spec.y0 - spec.resy * 15)
    )
    assert inside.sum() > 100
    want = lon[inside] * 3.0 + lat[inside] * 7.0
    got = pdf["value"].to_numpy()[inside]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_warp_webmerc_tiled_matches_long(spark):
    """Cross-tier parity for the 3857 target: tiled warp values equal
    the long warp on every long row; extra tiled rows are NULL fringe."""
    from openeo_odc_driver_spark.core.tiled import (
        from_tiled,
        resample_spatial_warp_tiled,
        to_tiled,
    )
    from openeo_odc_driver_spark.operators.reducers import (
        reduce_dimension,
    )
    from openeo_odc_driver_spark.operators.resample import (
        resample_spatial_warp,
    )

    spec = CubeSpec(resx=0.0078125, resy=0.00390625,
                    x0=11.2890625, y0=46.51953125)
    cube = reduce_dimension(synthetic_cube(spark, spec), "time", "max")
    long_pdf = resample_spatial_warp(cube, 3857, 500.0).df.toPandas()
    tiled_pdf = from_tiled(resample_spatial_warp_tiled(
        to_tiled(cube, tile=16, n_y=16, n_x=16), 3857, 500.0
    )).df.toPandas()
    key = ["band", "y", "x"]
    merged = long_pdf.merge(tiled_pdf, on=key, how="outer",
                            suffixes=("_l", "_t"), indicator=True)
    both = merged[merged["_merge"] == "both"]
    assert len(both) == len(long_pdf)
    import numpy as np
    lv, tv = both["value_l"].to_numpy(), both["value_t"].to_numpy()
    assert ((lv == tv) | (np.isnan(lv.astype(float))
                          & np.isnan(tv.astype(float)))).all()
    only_tiled = merged[merged["_merge"] == "right_only"]
    assert only_tiled["value_t"].isna().all()


def test_warp_tiled_gather_join_never_broadcasts(spark):
    """The warp's request table scales with the OUTPUT raster, but
    Catalyst estimates it from its spark.range parent (tiny) and would
    broadcast it — through the driver (found live: bilinear at 42 M px
    died on spark.driver.maxResultSize). The gather join must be a
    shuffled join on the tile key at every scale."""
    from openeo_odc_driver_spark.core.tiled import (
        resample_spatial_warp_tiled,
        to_tiled,
    )
    from openeo_odc_driver_spark.operators.reducers import (
        reduce_dimension,
    )

    spec = CubeSpec(resx=0.0078125, resy=0.00390625,
                    x0=11.2890625, y0=46.51953125)
    cube = reduce_dimension(synthetic_cube(spark, spec), "time", "max")
    tc = to_tiled(cube, tile=16, n_y=16, n_x=16)
    for method in ("near", "bilinear"):
        out = resample_spatial_warp_tiled(tc, 32632, 400.0, method)
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, method
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_pushdown_folds_through_band_temporal_filters(spark, tmp_path):
    """Round 15: the resample fold walks through filter_bands /
    filter_temporal (selection and spatial coarsening commute exactly
    — filters only drop (band, time) slices and the snap acts per
    slice), so `load → filter_* → resample` graphs hit the store's
    overview levels; result equals the explicit unfolded plan."""
    import pandas as pd

    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    root = _store_with_overviews(spark, tmp_path)

    graph = {"process_graph": {
        "load": {"process_id": "load_collection",
                 "arguments": {"id": "synthetic"}},
        "fb": {"process_id": "filter_bands",
               "arguments": {"data": {"from_node": "load"},
                             "bands": ["B04", "B08"]}},
        "ft": {"process_id": "filter_temporal",
               "arguments": {"data": {"from_node": "fb"},
                             "extent": ["2021-02-01", "2021-06-01"]}},
        "rs": {"process_id": "resample_spatial",
               "arguments": {"data": {"from_node": "ft"},
                             "resolution": 60.0},
               "result": True},
    }}
    tpg = ProcessGraph(graph, save_dir="/tmp/pg_r15_foldf", tiled=True,
                       tiled_store_dir=root)
    got = tpg.execute(spark).df.toPandas()
    assert tpg.tiled_overview_reads == [("synthetic", 2)]

    # explicit unfolded reference through the long operators
    from dataclasses import replace

    from openeo_odc_driver_spark.core.cube import Cube, GridSpec
    from openeo_odc_driver_spark.operators.filters import (
        filter_bands,
        filter_temporal,
    )
    from openeo_odc_driver_spark.operators.resample import (
        resample_cube_spatial,
    )

    cube = filter_temporal(
        filter_bands(synthetic_cube(spark), ["B04", "B08"]),
        "2021-02-01", "2021-06-01",
    )
    g = cube.schema.grid
    tgt = Cube(cube.df,
               replace(cube.schema, grid=GridSpec(g.x0, g.y0, 60.0, 60.0)))
    want = resample_cube_spatial(cube, tgt, "near").df.toPandas()
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True, check_dtype=False,
    )


def test_pushdown_fold_respects_shared_consumers(spark, tmp_path):
    """A load (or intermediate filter) feeding ANOTHER branch must not
    have the coarsening folded into it — the other branch would read
    the coarse cube. The resample runs as an explicit node instead and
    the sibling branch stays full-resolution."""
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    root = _store_with_overviews(spark, tmp_path)
    graph = {"process_graph": {
        "load": {"process_id": "load_collection",
                 "arguments": {"id": "synthetic",
                               "bands": ["B04"]}},
        "rs": {"process_id": "resample_spatial",
               "arguments": {"data": {"from_node": "load"},
                             "resolution": 60.0}},
        "sibling": {"process_id": "reduce_dimension",
                    "arguments": {
                        "data": {"from_node": "load"},
                        "dimension": "t",
                        "reducer": {"process_graph": {
                            "m": {"process_id": "mean",
                                  "arguments": {"data":
                                                {"from_parameter": "data"}},
                                  "result": True}}}},
                    "result": True},
    }}
    pg = ProcessGraph(graph, save_dir="/tmp/pg_r15_shared",
                      tiled=True, tiled_store_dir=root)
    assert "_target_resolution" not in \
        pg.nodes["load"]["arguments"], "fold must not fire"
    out = pg.execute(spark)
    df = out.df if hasattr(out, "df") else out
    # the sibling branch kept full resolution: 16x16 grid x values
    xs = {r[0] for r in df.select("x").distinct().collect()}
    assert 10.0 in xs  # a full-res-only coordinate (60m grid: 0,60,..)


# --- COG overview IFDs in the GeoTIFF storage tier ----------------------


def test_gtiff_cog_overviews_roundtrip(spark, tmp_path):
    """save_gtiff_tiled(overviews=...) writes CHAINED reduced-resolution
    IFDs (NewSubfileType=1, own geo tags — real COG structure); the
    base image round-trips unchanged and each level reads back
    bit-equal to the engine's own covering-downscale snap."""
    from dataclasses import replace

    import pandas as pd

    from openeo_odc_driver_spark.core import tiled as t
    from openeo_odc_driver_spark.core.cube import GridSpec
    from openeo_odc_driver_spark.operators.reducers import (
        reduce_dimension,
    )
    from openeo_odc_driver_spark.sinks.gtiff_tiled import (
        _read_ifd_chain,
        decode_tiff,
        load_gtiff_tiled,
        save_gtiff_tiled,
    )

    cube = reduce_dimension(synthetic_cube(spark), "time", "max")
    tc = t.to_tiled(cube, tile=16, n_y=16, n_x=16)
    path = save_gtiff_tiled(tc, str(tmp_path / "scene"),
                            overviews=(2, 4))
    chain, _big = _read_ifd_chain(path)
    assert len(chain) == 3
    assert [c.get(254, [0])[0] for c in chain] == [0, 1, 1]
    # snap extents: floor(15/k + 0.5) + 1
    assert [c[256][0] for c in chain] == [16, 9, 5]

    cols = ["band", "y", "x", "value"]

    def norm(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    want = t.from_tiled(tc).df.toPandas()
    base = t.from_tiled(
        load_gtiff_tiled(spark, path, bands=cube.schema.bands)
    ).df.toPandas()
    pd.testing.assert_frame_equal(norm(base), norm(want),
                                  check_exact=True, check_dtype=False)

    g = tc.schema.grid
    for k in (2, 4):
        tgt = t.TiledCube(
            tc.df,
            replace(tc.schema,
                    grid=GridSpec(g.x0, g.y0, 10.0 * k, 10.0 * k)),
            tc.tile, tc.n_y, tc.n_x,
        )
        snap = t.from_tiled(
            t.resample_cube_spatial_tiled(tc, tgt, "near")
        ).df.toPandas()
        lv = t.from_tiled(
            load_gtiff_tiled(spark, path, bands=cube.schema.bands,
                             level=k)
        ).df.toPandas()
        pd.testing.assert_frame_equal(norm(lv), norm(snap),
                                      check_exact=True,
                                      check_dtype=False)
    # IFD0 consumers (decode_tiff) are unaffected by the chain
    arr, _meta = decode_tiff(path)
    assert arr.shape == (3, 16, 16)


def test_gtiff_cog_overview_missing_level_error(spark, tmp_path):
    import pytest as _pytest

    from openeo_odc_driver_spark.core import tiled as t
    from openeo_odc_driver_spark.operators.reducers import (
        reduce_dimension,
    )
    from openeo_odc_driver_spark.sinks.gtiff_tiled import (
        load_gtiff_tiled,
        save_gtiff_tiled,
    )

    cube = reduce_dimension(
        synthetic_cube(spark, CubeSpec(n_times=2)), "time", "max"
    )
    tc = t.to_tiled(cube, tile=16, n_y=16, n_x=16)
    path = save_gtiff_tiled(tc, str(tmp_path / "y"), overviews=(2,))
    with _pytest.raises(ValueError, match="no overview level 8"):
        load_gtiff_tiled(spark, path, level=8)


def test_gtiff_cog_overviews_deflate(spark, tmp_path):
    """DEFLATE + overviews = the full COG: per-level count gathers
    feed one multi-IFD header, a single executor copy pass assembles
    every level; both levels read back bit-equal to the uncompressed
    COG's levels."""
    import json

    import pandas as pd

    from openeo_odc_driver_spark.core import tiled as t
    from openeo_odc_driver_spark.operators.reducers import (
        reduce_dimension,
    )
    from openeo_odc_driver_spark.sinks.gtiff_tiled import (
        _read_ifd_chain,
        load_gtiff_tiled,
        save_gtiff_tiled,
    )

    cube = reduce_dimension(synthetic_cube(spark), "time", "max")
    tc = t.to_tiled(cube, tile=16, n_y=16, n_x=16)
    raw = save_gtiff_tiled(tc, str(tmp_path / "raw"), overviews=(2, 4))
    dfl = save_gtiff_tiled(tc, str(tmp_path / "dfl"),
                           compress="deflate", overviews=(2, 4))
    chain, _big = _read_ifd_chain(dfl)
    assert len(chain) == 3
    assert [c.get(259, [1])[0] for c in chain] == [8, 8, 8]  # DEFLATE
    side = json.load(open(str(tmp_path / "dfl") + ".json"))
    assert side["overviews"] == [2, 4]
    cols = ["band", "y", "x", "value"]
    for lv in (None, 2, 4):
        a = t.from_tiled(load_gtiff_tiled(
            spark, raw, bands=cube.schema.bands, level=lv)).df.toPandas()
        b = t.from_tiled(load_gtiff_tiled(
            spark, dfl, bands=cube.schema.bands, level=lv)).df.toPandas()
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
            check_exact=True, check_dtype=False,
        )


def test_save_result_options_write_cog(spark, tmp_path):
    """openEO save_result options {overviews, compression} reach the
    distributed GeoTIFF sink through the planner — the artifact is a
    DEFLATE COG with the requested levels."""
    import json

    from openeo_odc_driver_spark.plans.graph import ProcessGraph
    from openeo_odc_driver_spark.sinks.gtiff_tiled import (
        _read_ifd_chain,
    )

    graph = {"process_graph": {
        "load": {"process_id": "load_collection",
                 "arguments": {"id": "synthetic", "bands": ["B04"]}},
        "red": {"process_id": "reduce_dimension",
                "arguments": {"data": {"from_node": "load"},
                              "dimension": "t",
                              "reducer": {"process_graph": {
                                  "m": {"process_id": "max",
                                        "arguments": {"data":
                                                      {"from_parameter":
                                                       "data"}},
                                        "result": True}}}}},
        "save": {"process_id": "save_result",
                 "arguments": {"data": {"from_node": "red"},
                               "format": "GTiff",
                               "options": {"overviews": [2, 4],
                                           "compression": "deflate"}},
                 "result": True},
    }}
    pg = ProcessGraph(graph, save_dir=str(tmp_path), tiled=True)
    pg.execute(spark)
    path = str(tmp_path / "save.tif")
    chain, _big = _read_ifd_chain(path)
    assert len(chain) == 3
    assert [c.get(259, [1])[0] for c in chain] == [8, 8, 8]
    side = json.loads((tmp_path / "save.json").read_text())
    assert side["overviews"] == [2, 4]


def test_polar_stereographic_invariants():
    """EPSG:3031 / 3413 (the standard Antarctic / Arctic EO grids):
    pole maps to the origin exactly, round-trip < 1e-9°, the radius at
    the standard parallel equals the parallel's true radius N·cosφ
    (scale-true by construction — a real check of the t/t_F math), the
    projection is exactly azimuthal (rotation invariance), and McMurdo
    lands at its known 3031 position."""
    import math

    import numpy as np

    from openeo_odc_driver_spark.functions.proj import (
        _A,
        _polar_consts,
        polar_to_wgs84_np,
        wgs84_to_polar_np,
    )

    for epsg, pole, lats in (
        (3031, -90.0, np.linspace(-89.5, -60, 40)),
        (3413, 90.0, np.linspace(60, 89.5, 40)),
    ):
        x, y = wgs84_to_polar_np(np.array([0.0, 123.0]),
                                 np.array([pole, pole]), epsg)
        assert np.abs(x).max() == 0.0 and np.abs(y).max() == 0.0
        lons = np.linspace(-180, 179, 41)
        lo, la = np.meshgrid(lons, lats)
        xx, yy = wgs84_to_polar_np(lo.ravel(), la.ravel(), epsg)
        lo2, la2 = polar_to_wgs84_np(xx, yy, epsg)
        dlon = (np.asarray(lo2) - lo.ravel() + 180) % 360 - 180
        assert np.abs(dlon).max() < 1e-9
        assert np.abs(la2 - la.ravel()).max() < 1e-8
        p, m_f, _t_f = _polar_consts(epsg)
        x1, y1 = wgs84_to_polar_np(np.array([p["lon0"]]),
                                   np.array([p["lat_ts"]]), epsg)
        rho = math.hypot(float(x1[0]), float(y1[0]))
        assert abs(rho - _A * m_f) < 1e-6
        x2, y2 = wgs84_to_polar_np(np.array([p["lon0"] + 37.0]),
                                   np.array([p["lat_ts"]]), epsg)
        assert abs(math.hypot(float(x2[0]), float(y2[0])) - rho) < 1e-6
    x, y = wgs84_to_polar_np(np.array([166.668]),
                             np.array([-77.846]), 3031)
    assert abs(float(x[0]) - 305613) < 5
    assert abs(float(y[0]) + 1289618) < 5


def test_warp_polar_metric_ground_truth(spark):
    """4326→3031 nearest over an Antarctic-footprint cube: every
    output equals the source value at the nearest source pixel of its
    inverse-projected center."""
    import numpy as np

    from openeo_odc_driver_spark.functions.proj import polar_to_wgs84_np
    from openeo_odc_driver_spark.operators.resample import (
        resample_spatial_warp,
    )

    spec = CubeSpec(resx=0.0078125, resy=0.00390625,
                    x0=10.0, y0=-70.5, n_times=2)
    cube = synthetic_cube(spark, spec)
    out = resample_spatial_warp(cube, 3031, 400.0)
    assert out.schema.crs == "EPSG:3031"
    pdf = out.df.toPandas()
    assert len(pdf) > 100
    src = cube.df.toPandas()
    lut = {}
    for b, ts, yy, xx, v in src[
        ["band", "time", "y", "x", "value"]
    ].itertuples(index=False, name=None):
        yi = int(round((spec.y0 - yy) / spec.resy))
        xi = int(round((xx - spec.x0) / spec.resx))
        lut[(b, ts, yi, xi)] = v
    lon, lat = polar_to_wgs84_np(pdf["x"].to_numpy(),
                                 pdf["y"].to_numpy(), 3031)
    xi = np.floor((lon - spec.x0) / spec.resx + 0.5).astype(int)
    yi = np.floor((spec.y0 - lat) / spec.resy + 0.5).astype(int)
    for i in range(len(pdf)):
        want = lut[(pdf["band"].iloc[i], pdf["time"].iloc[i],
                    int(yi[i]), int(xi[i]))]
        got = pdf["value"].iloc[i]
        assert (got == want) or (got is None and want is None) or (
            got != got and want != want
        )
