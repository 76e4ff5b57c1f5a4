"""Calendar/window/zonal aggregation semantics."""

import datetime

from pyspark.sql import functions as F

from openeo_odc_driver_spark.functions.geometry import FIXTURE_POLYGONS
from openeo_odc_driver_spark.operators.aggregates import (
    aggregate_spatial,
    aggregate_spatial_window,
    aggregate_temporal_period,
    anomaly,
    climatological_normal,
)
from openeo_odc_driver_spark.sources.synthetic import CubeSpec, synthetic_cube

SMALL = CubeSpec(n_times=12, ny=4, nx=4)


def test_season_anchor_is_calendar_quarter(spark):
    """xarray 'QS' starts quarters in Jan (SURVEY §2.7) — season labels
    must be Jan/Apr/Jul/Oct firsts."""
    out = aggregate_temporal_period(synthetic_cube(spark, SMALL), "season", "mean")
    months = {r.time.month for r in out.df.select("time").distinct().collect()}
    assert months == {1, 4, 7, 10}


def test_unsupported_period_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        aggregate_temporal_period(synthetic_cube(spark, SMALL), "dekad", "mean")


def test_window_trim_drops_ragged(spark):
    c = synthetic_cube(spark, SMALL)  # 4×4 grid
    pad = aggregate_spatial_window(c, [3, 3], "sum", boundary="pad")
    trim = aggregate_spatial_window(c, [3, 3], "sum", boundary="trim")
    # 4/3 → 2×2 windows padded, only 1×1 full window trimmed
    assert pad.df.select("x", "y").distinct().count() == 4
    assert trim.df.select("x", "y").distinct().count() == 1


def test_climatology_anomaly_roundtrip(spark):
    """anomaly(data, climatology(data)) must average to ~0 per pixel-month."""
    c = synthetic_cube(spark, SMALL)
    an = anomaly(c, climatological_normal(c))
    chk = (
        an.df.groupBy("band", "y", "x", F.month("time").alias("m"))
        .agg(F.avg("value").alias("r"))
        .where(F.abs(F.col("r")) > 1e-9)
        .count()
    )
    assert chk == 0


def test_zonal_respects_geometry(spark):
    c = synthetic_cube(spark, CubeSpec(n_times=2, ny=16, nx=16))
    out = aggregate_spatial(c, FIXTURE_POLYGONS, "count")
    geoms = {r.geom_id for r in out.df.select("geom_id").distinct().collect()}
    assert 3 not in geoms  # P3 lies outside the grid extent
    assert {0, 1, 2} <= geoms


def test_concave_polygon_falls_back_to_raycast(spark):
    """An L-shaped (concave) polygon must route through the ray-cast UDF
    and exclude the notch that its convex hull would include."""
    from pyspark.sql import functions as F

    from openeo_odc_driver_spark.functions.geometry import is_convex
    from openeo_odc_driver_spark.operators.filters import filter_spatial

    # L-shape: notch removes the upper-right quadrant [75,145]x[75,145]
    ell = [
        (5.5, 5.5), (145.5, 5.5), (145.5, 75.5),
        (75.5, 75.5), (75.5, 145.5), (5.5, 145.5),
    ]
    assert not is_convex(ell)
    c = synthetic_cube(spark, CubeSpec(n_times=1, ny=16, nx=16))
    out = filter_spatial(c, [ell])
    pts = {(r.x, r.y) for r in out.df.select("x", "y").distinct().collect()}
    assert (50.0, 50.0) in pts  # inside the L
    assert (100.0, 100.0) not in pts  # inside the notch → excluded
    # convex fast path stays pure-JVM: no pandas UDF in the plan
    conv_plan = (
        filter_spatial(c, [FIXTURE_POLYGONS[0]]).df._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "ArrowEvalPython" not in conv_plan and "BatchEvalPython" not in conv_plan


def test_zonal_target_dimension_collision_rejected(spark):
    """A graph-supplied target_dimension naming an existing cube column
    would silently overwrite pixel values (withColumn replaces) — the
    operator must refuse instead."""
    import pytest

    c = synthetic_cube(spark, CubeSpec(n_times=2, ny=8, nx=8))
    for label in ("value", "band", "time"):
        with pytest.raises(ValueError, match="collides"):
            aggregate_spatial(c, FIXTURE_POLYGONS, "mean",
                              target_dimension=label)
