"""CubeSchema.time_axis plan-time metadata: zero-job guarantees for the
formerly-eager sites (VERDICT r4 item 3) and invariant maintenance."""

import pytest
from pyspark.sql import DataFrame, functions as F

from openeo_odc_driver_spark.core.cube import TIME, Cube
from openeo_odc_driver_spark.operators.aggregates import aggregate_temporal_period
from openeo_odc_driver_spark.operators.curve import (
    fit_curve,
    fit_curve_linear,
    harmonic_model,
    linear_model,
    predict_curve,
)
from openeo_odc_driver_spark.operators.dimops import rename_labels_time
from openeo_odc_driver_spark.operators.filters import filter_temporal
from openeo_odc_driver_spark.operators.merge import merge_cubes
from openeo_odc_driver_spark.sources.synthetic import CubeSpec, synthetic_cube

SMALL = CubeSpec(n_times=4, ny=4, nx=4)
SMALL_OFF = CubeSpec(n_times=4, ny=4, nx=4, day_offset=3)


def _trap(monkeypatch):
    def _no_jobs(self, *a, **k):
        raise AssertionError("plan construction ran a Spark job")

    monkeypatch.setattr(DataFrame, "count", _no_jobs)
    monkeypatch.setattr(DataFrame, "collect", _no_jobs)


def test_synthetic_axis_matches_data(spark):
    c = synthetic_cube(spark, SMALL)
    actual = sorted(
        r[0].replace(tzinfo=None) if r[0].tzinfo else r[0]
        for r in c.df.select(TIME).distinct().collect()
    )
    assert tuple(actual) == c.schema.time_axis


def test_rename_labels_time_zero_jobs_and_correct(spark, monkeypatch):
    c = synthetic_cube(spark, SMALL)
    _trap(monkeypatch)
    out = rename_labels_time(c, [f"1999-0{i + 1}-01" for i in range(4)])
    monkeypatch.undo()
    times = {str(r[0]) for r in out.df.select(TIME).distinct().collect()}
    assert times == {f"1999-0{i + 1}-01 00:00:00" for i in range(4)}
    assert out.schema.time_axis is not None
    assert out.df.count() == c.df.count()


def test_rename_labels_time_mismatch_raises(spark):
    c = synthetic_cube(spark, SMALL)
    with pytest.raises(ValueError, match="LabelMismatch"):
        rename_labels_time(c, ["2000-01-01"])


def test_fit_and_predict_build_plans_with_zero_jobs(spark, monkeypatch):
    c = synthetic_cube(spark, SMALL)
    _trap(monkeypatch)
    fitted = fit_curve(c, harmonic_model(), tile=4)
    lin = fit_curve_linear(c)
    pred = predict_curve(lin, linear_model(), c)
    monkeypatch.undo()
    assert fitted.df.count() == 3 * 16
    assert pred.df.count() == c.df.count()


def test_merge_interleaved_disjoint_needs_no_probe(spark, monkeypatch):
    """Overlapping extents but disjoint axes — the extent bound can't
    decide, the exact axis can, still zero jobs."""
    c1 = synthetic_cube(spark, SMALL)
    c2 = synthetic_cube(spark, SMALL_OFF)
    lo1, hi1 = c1.schema.time_extent
    lo2, hi2 = c2.schema.time_extent
    assert lo2 < hi1 and lo1 < hi2  # extents overlap
    _trap(monkeypatch)
    out = merge_cubes(c1, c2)  # no resolver: must prove disjoint
    monkeypatch.undo()
    assert out.df.count() == c1.df.count() + c2.df.count()
    assert out.schema.time_axis == tuple(
        sorted({*c1.schema.time_axis, *c2.schema.time_axis})
    )


def test_filter_temporal_narrows_axis(spark):
    c = synthetic_cube(spark, SMALL)
    f = filter_temporal(c, "2021-02-01", "2021-04-01")
    assert len(f.schema.time_axis) == 2
    assert f.schema.time_extent == (f.schema.time_axis[0], f.schema.time_axis[-1])


def test_aggregate_temporal_axis_is_truncation_image(spark):
    c = synthetic_cube(spark, CubeSpec(n_times=8, ny=2, nx=2))
    out = aggregate_temporal_period(c, "season", "mean")
    actual = sorted(
        r[0].replace(tzinfo=None) if r[0].tzinfo else r[0]
        for r in out.df.select(TIME).distinct().collect()
    )
    assert tuple(actual) == out.schema.time_axis
    assert len(out.schema.time_axis) == 3  # 8 months from Jan → Q1 Q2 Q3


def test_time_rewrites_clear_or_recompute_axis(spark):
    c = synthetic_cube(spark, SMALL)
    dropped = Cube(c.df.withColumn(TIME, F.lit(None).cast("timestamp")), c.schema)
    # with_time_extent(None) must void the axis too
    assert c.schema.with_time_extent(None).time_axis is None
    assert c.schema.drop(TIME).time_axis is None
    assert dropped.schema.time_axis is not None  # raw-df edits don't touch schema
