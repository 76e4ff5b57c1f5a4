"""Grouped / windowed / resampling aggregations.

Calendar resample, tumbling spatial windows, climatology, zonal stats —
``openeo_odc_driver.py:624-684,906-963,1354-1383``. All are single-shuffle
groupBy-aggs; the zonal path is a broadcast join (geometries are tiny query
constants) so it stays shuffle-free on the pixel side until the final
per-zone aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, functions as F

from ..core.cube import BAND, TIME, VALUE, X, Y, Cube
from .filters import polygon_contains_udf
from .reducers import REDUCERS

# long-format zonal tagging switch point — shared with filter_spatial
# (functions/geometry.py:TAG_CHAIN_MAX, one constant, two call sites)
from ..functions.geometry import TAG_CHAIN_MAX as _TAG_CHAIN_MAX

# openEO period -> date_trunc unit (reference maps to pandas freqs,
# openeo_odc_driver.py:923: hour/day/week/month/season→QS/year).
# dekad / tropical-season / decade are unsupported there too (:921,924-925).
_PERIODS = {
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
    "season": "quarter",  # pandas 'QS' default anchor = Jan quarters
    "year": "year",
}


def aggregate_temporal_period(cube: Cube, period: str, reducer: str) -> Cube:
    """Calendar-period resample (openeo_odc_driver.py:906-963).

    date_trunc replaces the time label with the period start — same
    labeling as pandas resample('1M'/'QS'/...). One shuffle, partial aggs.
    """
    if period not in _PERIODS:
        raise ValueError(f"unsupported period {period!r}")  # :921,924-925
    group = [d for d in cube.key_dims if d != TIME]
    out = (
        cube.df.withColumn(TIME, F.date_trunc(_PERIODS[period], F.col(TIME)))
        .groupBy(*group, TIME)
        .agg(REDUCERS[reducer]().alias(VALUE))
    )
    # date_trunc moves labels to period starts, which can precede the old
    # extent lo — drop the stale bound; when the exact input axis is
    # known, the output axis is exactly its truncation image (every input
    # label maps to a period start, every period start has an input).
    schema = cube.schema.with_time_extent(None)
    if cube.schema.time_axis is not None:
        schema = schema.with_time_axis(
            tuple(sorted({_py_trunc(_PERIODS[period], t)
                          for t in cube.schema.time_axis}))
        )
    return Cube(out, schema)


def _py_trunc(unit: str, t):
    """Python twin of Spark's date_trunc for the units _PERIODS emits —
    used only for plan-time time_axis metadata."""
    from datetime import timedelta

    if unit == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    z = t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return z
    if unit == "week":  # Spark date_trunc('week') → Monday
        return z - timedelta(days=z.weekday())
    if unit == "month":
        return z.replace(day=1)
    if unit == "quarter":
        return z.replace(month=((z.month - 1) // 3) * 3 + 1, day=1)
    if unit == "year":
        return z.replace(month=1, day=1)
    raise ValueError(unit)


def aggregate_spatial_window(
    cube: Cube,
    size: Sequence[int],
    reducer: str,
    boundary: str = "pad",
) -> Cube:
    """Non-overlapping x/y block aggregation (xarray `coarsen`,
    openeo_odc_driver.py:624-626 + reducer children).

    This is a tumbling spatial window: group on
    ``floor(pixel_index / block)``. Output coordinates are the window-mean
    coordinates (xarray coarsen's default coord func). ``boundary='trim'``
    drops ragged edge windows; ``'pad'`` keeps them (NaN padding
    contributes nothing to null-skipping aggregates).
    """
    sx, sy = int(size[0]), int(size[1])
    grid = cube.schema.grid
    if grid is None:
        raise ValueError("aggregate_spatial_window needs a GridSpec")
    x_idx = ((F.col(X) - F.lit(grid.x0)) / F.lit(grid.resx)).cast("long")
    y_idx = ((F.lit(grid.y0) - F.col(Y)) / F.lit(grid.resy)).cast("long")
    wx = F.floor(x_idx / sx).alias("_wx")
    wy = F.floor(y_idx / sy).alias("_wy")
    group = [d for d in cube.key_dims if d not in (X, Y)]
    df = cube.df.withColumn("_wx", wx).withColumn("_wy", wy)
    out = (
        df.groupBy(*group, "_wx", "_wy")
        .agg(
            REDUCERS[reducer]().alias(VALUE),
            F.avg(X).alias(X),
            F.avg(Y).alias(Y),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    if boundary == "trim":
        out = out.where(F.col("_n") == sx * sy)
    out = out.drop("_wx", "_wy", "_n").select(*cube.key_dims, VALUE)
    return cube.with_df(out)


def climatological_normal(cube: Cube, frequency: str = "monthly") -> Cube:
    """groupby('time.month').mean('time') (openeo_odc_driver.py:1354-1373).
    Output `time` dimension is replaced by a `month` column (1..12)."""
    if frequency != "monthly":
        raise ValueError("only frequency='monthly' supported (as reference)")
    group = [d for d in cube.key_dims if d != TIME]
    out = (
        cube.df.groupBy(*group, F.month(TIME).alias("month"))
        .agg(F.avg(VALUE).alias(VALUE))
    )
    return Cube(out, cube.schema.drop(TIME))


def anomaly(cube: Cube, normals: Cube) -> Cube:
    """data.groupby('time.month') − normals (openeo_odc_driver.py:1375-1383).

    Join on (band, y, x, month(time)) then subtract. The normals side is
    12× smaller than data — Catalyst broadcast-joins it when it fits; at
    100 TB the normals cube (one value per pixel-month) may itself be big,
    in which case both sides hash-partition on the same keys.
    """
    group = [d for d in cube.key_dims if d != TIME]
    norm = normals.df.select(
        *group,
        F.col("month").alias("_m"),
        F.col(VALUE).alias("_norm"),
    )
    out = (
        cube.df.withColumn("_m", F.month(TIME))
        .join(norm, [*group, "_m"], "left")
        .withColumn(VALUE, F.col(VALUE) - F.col("_norm"))
        .drop("_m", "_norm")
    )
    return cube.with_df(out)


def aggregate_spatial(
    cube: Cube,
    polygons: list[list[tuple[float, float]]],
    reducer: str,
    target_dimension: str = "geom_id",
) -> Cube:
    """Zonal statistics (openeo_odc_driver.py:628-684): per-geometry reducer
    over (x, y), keyed by geometry index on a new ``target_dimension``
    column (≙ the reference's ``target_dimension`` argument, default
    'result', :654-656 — our default label stays 'geom_id' for
    backward-compat; the planner passes the graph's label through).

    Plan shape: pixel scan → containment tag → groupBy(geom_id, band,
    time). No join at all; one shuffle for the final agg. Convex
    geometries tag via pure half-plane Column expressions (codegen'd
    with the scan); concave fall back to the ray-cast pandas UDF.
    """
    from ..functions.geometry import geom_id_col, is_convex

    # graph-supplied label: colliding with a cube column would silently
    # overwrite pixel values (withColumn replaces) or a group key —
    # reject instead of corrupting the aggregate
    if target_dimension in cube.df.columns:
        raise ValueError(
            f"target_dimension {target_dimension!r} collides with an "
            f"existing cube column {cube.df.columns}; pick a fresh label"
        )
    group = [d for d in cube.key_dims if d not in (X, Y)]
    if all(is_convex(p) for p in polygons):
        if len(polygons) <= _TAG_CHAIN_MAX:
            tag = geom_id_col(polygons, X, Y)
        else:
            # many-zone regime: the per-polygon CASE chain is
            # O(|zones|) of GENERATED CODE (the 64 KB whole-stage-
            # codegen limit, plus one py4j round-trip per half-plane
            # term) — switch to the vectorized half-plane UDF: same
            # doubles and closed comparisons, bbox prefilter +
            # shrinking untagged mask make the per-pixel cost
            # O(touching zones). (The zones-literal HOF spelling hits
            # a Spark 4.1 lambda-pruning bug on generated sources —
            # see convex_geom_id_udf's docstring; the tiled tier keeps
            # the HOF, whose packed frames are unaffected. The bug is
            # canaried: when tests/test_round11.py::
            # test_spark_hof_lambda_pruning_canary stops xfailing, flip
            # this dispatch to the JVM-side HOF and retire the UDF.)
            from .filters import convex_geom_id_udf

            tag = convex_geom_id_udf(polygons)(F.col(X), F.col(Y))
    else:
        tag = polygon_contains_udf(polygons)(F.col(X), F.col(Y))
    out = (
        cube.df.withColumn(target_dimension, tag)
        .where(F.col(target_dimension).isNotNull())
        .groupBy(target_dimension, *group)
        .agg(REDUCERS[reducer]().alias(VALUE))
    )
    return Cube(out, cube.schema.drop(X).drop(Y))
