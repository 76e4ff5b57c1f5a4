"""merge_cubes decision table (ref openeo_odc_driver.py:1134-1291)."""

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.operators.merge import merge_cubes
from openeo_odc_driver_spark.sources.synthetic import (
    CubeSpec,
    SPEC_B_BANDS,
    SPEC_B_TIMES,
    SPEC_C,
    synthetic_cube,
)

SMALL = CubeSpec(n_times=4, ny=4, nx=4)
SMALL_B_BANDS = CubeSpec(bands=("B11", "B12"), n_times=4, ny=4, nx=4, va=11)
SMALL_B_TIMES = CubeSpec(n_times=4, ny=4, nx=4, day_offset=3, va=3)
SMALL_C = CubeSpec(n_times=4, ny=4, nx=4, va=11, vb=5, nm=29)


def test_case1_disjoint_bands_concat(spark):
    c1 = synthetic_cube(spark, SMALL)
    c2 = synthetic_cube(spark, SMALL_B_BANDS)
    out = merge_cubes(c1, c2)
    assert out.df.count() == c1.df.count() + c2.df.count()
    assert out.schema.bands == ("B04", "B08", "SCL", "B11", "B12")
    # no shuffle: union plan
    assert "Union" in out.df._jdf.queryExecution().executedPlan().toString()


def test_case2_disjoint_times_concat(spark):
    c1 = synthetic_cube(spark, SMALL)
    c2 = synthetic_cube(spark, SMALL_B_TIMES)
    out = merge_cubes(c1, c2)  # exercises the key-overlap probe
    assert out.df.count() == c1.df.count() + c2.df.count()


def test_case3_overlap_needs_resolver(spark):
    c1 = synthetic_cube(spark, SMALL)
    c2 = synthetic_cube(spark, SMALL_C)
    with pytest.raises(ValueError, match="overlap_resolver"):
        merge_cubes(c1, c2)
    out = merge_cubes(
        c1, c2, overlap_resolver=lambda a, b: F.coalesce(a, b)
    )
    # full outer on identical key sets keeps the grid size
    assert out.df.count() == c1.df.count()


def test_case4_partial_band_overlap_unsupported(spark):
    c1 = synthetic_cube(spark, SMALL)
    c2 = synthetic_cube(spark, CubeSpec(bands=("B04", "B11"), n_times=4, ny=4, nx=4))
    with pytest.raises(ValueError, match="partially"):
        merge_cubes(c1, c2)


def test_case5_resolver_sees_null_partner(spark):
    """Where only one side has a key, the resolver gets a NULL partner."""
    c1 = synthetic_cube(spark, SMALL)
    c2_df = synthetic_cube(spark, SMALL_C).df.where(F.col("x") < 20.0)
    from openeo_odc_driver_spark.core.cube import Cube

    c2 = Cube(c2_df, synthetic_cube(spark, SMALL_C).schema)
    out = merge_cubes(
        c1,
        c2,
        overlap_resolver=lambda a, b: F.when(b.isNull(), F.lit(-777.0)).otherwise(b),
    )
    rows = out.df.where(F.col("x") >= 20.0).select("value").distinct().collect()
    assert {r.value for r in rows} == {-777.0}


def test_case2_extent_proven_disjoint_runs_no_probe_job(spark, monkeypatch):
    """Two temporally filtered cubes with non-overlapping windows merge
    via the plan-time extent bound — building the plan runs ZERO jobs
    (the r2 verdict flagged the eager probe as a 100 TB scale-killer)."""
    from pyspark.sql import DataFrame

    from openeo_odc_driver_spark.operators.filters import filter_temporal

    base = synthetic_cube(spark, SMALL)
    c1 = filter_temporal(base, "2021-01-01", "2021-03-01")
    c2 = filter_temporal(base, "2021-03-01", "2021-06-01")
    assert c1.schema.time_extent[1] < c2.schema.time_extent[0]

    def _no_jobs(self, *a, **k):  # the probe's only action is count()
        raise AssertionError("merge_cubes ran a job while planning")

    monkeypatch.setattr(DataFrame, "count", _no_jobs)
    out = merge_cubes(c1, c2)
    monkeypatch.undo()
    assert out.df.count() == c1.df.count() + c2.df.count()
    lo, hi = out.schema.time_extent
    assert lo == c1.schema.time_extent[0] and hi == c2.schema.time_extent[1]


def test_time_extent_sound_after_time_rewriting_ops(spark):
    """Ops that rewrite `time` must not carry a stale (possibly too
    narrow) extent bound forward — soundness of the merge fast path.
    Since round 5 they *recompute* the exact bound from the plan-time
    time_axis when it is known (stronger than clearing); soundness means
    the carried bound, when present, contains every actual time value."""
    from openeo_odc_driver_spark.operators.aggregates import (
        aggregate_temporal_period,
    )
    from openeo_odc_driver_spark.operators.dimops import rename_labels_time

    def _assert_sound(cube):
        ext = cube.schema.time_extent
        if ext is None:
            return
        lo = cube.df.agg(F.min("time")).collect()[0][0]
        hi = cube.df.agg(F.max("time")).collect()[0][0]
        assert ext[0] <= lo and hi <= ext[1]

    c = synthetic_cube(spark, SMALL)
    assert c.schema.time_extent is not None
    _assert_sound(aggregate_temporal_period(c, "season", "mean"))
    _assert_sound(rename_labels_time(c, [f"1999-0{i+1}-01" for i in range(4)]))
    # a cube with UNKNOWN axis must still clear the bound on rewrite
    from dataclasses import replace as _replace

    from openeo_odc_driver_spark.core.cube import Cube

    blind = Cube(c.df, _replace(c.schema, time_axis=None))
    assert aggregate_temporal_period(blind, "season", "mean").schema.time_extent is None
    assert rename_labels_time(blind, [f"1999-0{i+1}-01" for i in range(4)]).schema.time_extent is None
