"""Filter / mask / dimop semantics from the reference's decision tables."""

import datetime

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.core.cube import Cube
from openeo_odc_driver_spark.operators.dimops import (
    array_element,
    array_interpolate_linear,
    rename_labels,
)
from openeo_odc_driver_spark.operators.filters import filter_temporal
from openeo_odc_driver_spark.operators.mask import mask
from openeo_odc_driver_spark.operators.math import apply_unary, divide_cols, if_cols
from openeo_odc_driver_spark.sources.synthetic import CubeSpec, synthetic_cube

SMALL = CubeSpec(n_times=6, ny=4, nx=4)


def test_filter_temporal_end_exclusive(spark):
    """ref load_odc_collection.py:78-79: end date minus 1 ms ⇒ half-open."""
    c = synthetic_cube(spark, SMALL)
    out = filter_temporal(c, "2021-01-01", "2021-03-01")
    times = {r.time for r in out.df.select("time").distinct().collect()}
    assert times == {
        datetime.datetime(2021, 1, 1),
        datetime.datetime(2021, 2, 1),
    }  # 2021-03-01 excluded


def test_mask_nan_semantics(spark):
    """ref openeo_odc_driver.py:1339-1352: NULL mask pixels mask data out
    (np.logical_not(nan) is falsy); mask==1 masks; mask==0 keeps."""
    mask_spec = CubeSpec(bands=("mask",), n_times=6, ny=4, nx=4, vm=2, vs=0.0)
    c = synthetic_cube(spark, SMALL)
    m = synthetic_cube(spark, mask_spec)
    out = mask(c, m, replacement=-9.0)
    joined = (
        out.df.withColumnRenamed("value", "masked")
        .join(m.df.select("time", "y", "x", F.col("value").alias("mv")), ["time", "y", "x"])
        .join(c.df.select("band", "time", "y", "x", F.col("value").alias("orig")),
              ["band", "time", "y", "x"])
    )
    bad = joined.where(
        (
            (F.col("mv") == 0)
            & F.col("mv").isNotNull()
            & ~(
                (F.col("masked") == F.col("orig"))
                | (F.col("masked").isNull() & F.col("orig").isNull())
            )
        )
        | ((F.col("mv").isNull() | (F.col("mv") != 0)) & (F.col("masked") != -9.0))
    ).count()
    assert bad == 0


def test_if_null_condition_poisons(spark):
    """ref openeo_odc_driver.py:1294-1316: NaN condition → NaN result."""
    c = synthetic_cube(spark, SMALL)
    out = apply_unary(c, lambda v: if_cols(v > 0, 1.0, 0.0))
    n_null_in = c.df.where(F.col("value").isNull()).count()
    n_null_out = out.df.where(F.col("value").isNull()).count()
    assert n_null_in == n_null_out > 0


def test_divide_by_scalar_zero_raises(spark):
    with pytest.raises(ZeroDivisionError):
        divide_cols(F.col("value"), 0)


def test_array_element_bad_index(spark):
    c = synthetic_cube(spark, SMALL)
    with pytest.raises(ValueError, match="ArrayElementNotAvailable"):
        array_element(c, index=7)


def test_rename_labels_length_mismatch(spark):
    c = synthetic_cube(spark, SMALL)
    with pytest.raises(ValueError, match="LabelMismatch"):
        rename_labels(c, "bands", ["a", "b"], source=["B04"])
    with pytest.raises(ValueError, match="LabelMismatch"):
        rename_labels(c, "time", ["2000-01-01"])  # 6 times vs 1 target


def test_interpolate_interior_only(spark):
    """xarray interpolate_na default: ends stay NULL, interior gaps fill
    linearly (ref openeo_odc_driver.py:1326-1337)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "band": ["B"] * 5,
            "time": pd.to_datetime(
                ["2021-01-01", "2021-01-02", "2021-01-03", "2021-01-04", "2021-01-05"]
            ),
            "y": [0.0] * 5,
            "x": [0.0] * 5,
            "value": [None, 1.0, None, 3.0, None],
        }
    )
    cube = Cube(spark.createDataFrame(pdf))
    out = array_interpolate_linear(cube, "time")
    vals = {
        r.time.day: r.value for r in out.df.orderBy("time").collect()
    }
    assert vals[1] is None and vals[5] is None  # ends not extrapolated
    assert vals[3] == pytest.approx(2.0)  # midpoint of 1.0 and 3.0


def test_filter_bbox_foreign_crs_raises(spark):
    """ADVICE r2: a non-4326 request CRS that differs from the cube CRS
    must raise, not silently slice in raw cube coordinates."""
    from openeo_odc_driver_spark.operators.filters import filter_bbox
    from openeo_odc_driver_spark.sources.synthetic import synthetic_cube

    cube = synthetic_cube(spark)  # EPSG:32632
    with pytest.raises(NotImplementedError, match="3857"):
        filter_bbox(cube, 0, 10, 0, 10, crs="EPSG:3857")
    # EPSG:54326 must not be mistaken for 4326 (old suffix match did)
    with pytest.raises(NotImplementedError, match="54326"):
        filter_bbox(cube, 0, 10, 0, 10, crs="EPSG:54326")
    # matching CRS passes through untransformed
    out = filter_bbox(cube, 0.0, 150.0, 0.0, 150.0, crs="EPSG:32632")
    assert out.df.count() == cube.df.count()


def test_interpolate_edge_runs_and_coordinate_weighting(spark):
    """VERDICT r2 item 8 — edge semantics vs the reference's xarray
    interpolate_na default (openeo_odc_driver.py:1326-1337):
    leading/trailing NaN RUNS stay NaN (no extrapolation), interior fill
    weights by the actual time coordinate (uneven month lengths), and an
    all-NaN series stays all-NaN."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "band": ["B"] * 7 + ["C"] * 3,
            "time": list(
                pd.to_datetime(
                    [
                        "2021-01-01", "2021-02-01", "2021-03-01",
                        "2021-04-01", "2021-05-01", "2021-06-01",
                        "2021-07-01",
                    ]
                )
            )
            + list(pd.to_datetime(["2021-01-01", "2021-02-01", "2021-03-01"])),
            "y": [0.0] * 10,
            "x": [0.0] * 10,
            # B: Jan/Feb leading run, anchors Mar(=2) and May(=8) with the
            #    Apr interior gap, Jun/Jul trailing run
            "value": [None, None, 2.0, None, 8.0, None, None] + [None] * 3,
        }
    )
    cube = Cube(spark.createDataFrame(pdf))
    out = array_interpolate_linear(cube, "t")  # dim alias resolves
    got = {
        (r.band, r.time.month): r.value
        for r in out.df.collect()
    }
    # leading + trailing runs unfilled
    assert got[("B", 1)] is None and got[("B", 2)] is None
    assert got[("B", 6)] is None and got[("B", 7)] is None
    # interior: coordinate-weighted, NOT index-weighted — Mar 1→May 1 is
    # 61 days; Apr 1 sits 31/61 along (xarray use_coordinate=True does
    # exactly this; index weighting would give the 0.5 midpoint 5.0)
    assert got[("B", 4)] == pytest.approx(2.0 + 6.0 * 31 / 61)
    assert got[("B", 4)] != pytest.approx(5.0)
    # anchors untouched
    assert got[("B", 3)] == 2.0
    assert got[("B", 5)] == 8.0
    # all-NaN series stays all-NaN
    assert all(got[("C", m)] is None for m in (1, 2, 3))
