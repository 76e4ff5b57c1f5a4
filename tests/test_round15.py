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
