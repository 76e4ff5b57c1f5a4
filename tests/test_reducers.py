"""Reducer numerics vs plain-Python computation on the same values."""

import math
import statistics

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.operators.reducers import quantiles, reduce_dimension
from openeo_odc_driver_spark.sources.synthetic import CubeSpec, synthetic_cube

SMALL = CubeSpec(n_times=8, ny=2, nx=2)


def _series(spark, band="B04", y=150.0, x=0.0):
    c = synthetic_cube(spark, SMALL)
    rows = (
        c.df.where((F.col("band") == band) & (F.col("y") == y) & (F.col("x") == x))
        .orderBy("time")
        .collect()
    )
    return [r.value for r in rows if r.value is not None]


@pytest.mark.parametrize(
    "reducer,pyfn",
    [
        ("max", max),
        ("min", min),
        ("mean", lambda v: sum(v) / len(v)),
        ("sum", sum),
        ("median", statistics.median),
        ("sd", lambda v: statistics.stdev(v)),
        ("product", math.prod),
        ("count", len),
    ],
)
def test_reduce_time_matches_python(spark, reducer, pyfn):
    vals = _series(spark)
    out = reduce_dimension(synthetic_cube(spark, SMALL), "time", reducer)
    got = (
        out.df.where((F.col("band") == "B04") & (F.col("y") == 150.0) & (F.col("x") == 0.0))
        .collect()[0]
        .value
    )
    assert got == pytest.approx(pyfn(vals), rel=1e-12)


def test_reduce_unknown_dim_is_identity(spark):
    """ref openeo_odc_driver.py:734-736: unknown dim → pass-through."""
    c = synthetic_cube(spark, SMALL)
    from openeo_odc_driver_spark.operators.reducers import reduce_dimension as rd

    out = rd(c, "t", "max")  # t aliases time → reduces
    assert "time" not in out.df.columns


def test_quantiles_argument_conflict(spark):
    c = synthetic_cube(spark, SMALL)
    with pytest.raises(ValueError):
        quantiles(c, "time")  # neither
    with pytest.raises(ValueError):
        quantiles(c, "time", probabilities=[0.5], q=4)  # both


def test_quantiles_values(spark):
    vals = sorted(_series(spark))
    out = quantiles(synthetic_cube(spark, SMALL), "time", probabilities=[0.5])
    got = (
        out.df.where((F.col("band") == "B04") & (F.col("y") == 150.0) & (F.col("x") == 0.0))
        .collect()[0]
        .value
    )
    assert got == pytest.approx(statistics.median(vals))
