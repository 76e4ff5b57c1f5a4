"""The raster-datacube abstraction, Spark-first.

The reference's single data abstraction is a dense 4-D xarray cube with
dims ``(variable, time, y, x)`` (``openeo_odc_driver.py:219``). Here a cube
is a **long-format DataFrame** — one row per pixel-observation:

    band: string, time: timestamp, y: double, x: double, value: double

plus a :class:`CubeSchema` companion carrying what xarray keeps as
coords/attrs (dims present, band order, CRS, grid geometry). CRS is
side-channel metadata in the reference too (``openeo_odc_driver.py:220``).

Why long format: every openEO operator is then an ordinary relational
plan — reducers are groupBy-agg, masks are equi-joins, merges are unions
or full-outer joins — so Catalyst gets full visibility (predicate
pushdown, column pruning, partial aggregation, broadcast) and the plan
scales by partitioning on the grid keys.  Null ``value`` ≙ the
reference's NaN nodata (``load_odc_collection.py:119-120``).

Scale notes (100 TB): a cube of 10^12 pixels partitions naturally by
``(time, tile)`` where ``tile = (floor(x_idx/T), floor(y_idx/T))``; scans
prune on time + tile min/max, reducers over time shuffle on (band,y,x)
once, and neighborhood ops (kernel) use the tiled grouping with halos
(`operators/kernel.py`).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import DataFrame

# canonical long-format column names
BAND, TIME, Y, X, VALUE = "band", "time", "y", "x", "value"
ALL_DIMS: tuple[str, ...] = (BAND, TIME, Y, X)

# dimension-name aliases accepted by the reference
# (`openeo_odc_driver.py:293,726,889`: ['t','temporal','DATE','time'];
#  bands dim is xarray's 'variable')
DIM_ALIASES = {
    "t": TIME,
    "temporal": TIME,
    "DATE": TIME,
    "time": TIME,
    "bands": BAND,
    "variable": BAND,
    "band": BAND,
    "x": X,
    "X": X,
    "y": Y,
    "Y": Y,
    "spatial": "spatial",
}


def canonical_dim(name: str) -> str:
    try:
        return DIM_ALIASES[name]
    except KeyError:
        raise ValueError(f"unknown dimension {name!r}") from None


@dataclass(frozen=True)
class GridSpec:
    """Regular-grid geometry so pixel indices are derivable from coords.

    ``x = x0 + resx * x_idx`` (ascending), ``y = y0 - resy * y_idx``
    (descending — the reference stores y descending,
    ``openeo_odc_driver.py:1076,1623-1627``).
    """

    x0: float
    y0: float
    resx: float
    resy: float


@dataclass(frozen=True)
class CubeSchema:
    dims: tuple[str, ...] = ALL_DIMS
    bands: tuple[str, ...] = ()
    crs: Optional[str] = None
    grid: Optional[GridSpec] = None
    # Closed [lo, hi] superset bound on the cube's `time` values (datetime
    # pair), or None when unknown. Plan-time metadata: lets merge_cubes
    # prove time-disjointness WITHOUT running a probe job (the reference
    # reads in-memory xarray coords for the same decision,
    # openeo_odc_driver.py:1177). Invariant: the true time values always
    # lie inside the bound — operators that rewrite `time` must clear or
    # recompute it; a too-wide bound only costs a fallback probe, a
    # too-narrow one would corrupt merge results.
    time_extent: Optional[tuple] = None
    # The exact ascending tuple of distinct `time` values, or None when
    # unknown. Strictly stronger plan-time metadata than time_extent:
    # zeroes the residual metadata actions in rename_labels_time
    # (distinct().count()), fit_curve/predict_curve (min(TIME) collect +
    # distinct() subquery), and lets merge_cubes decide overlap *exactly*
    # even when extents overlap. Same invariant discipline as
    # time_extent: operators that rewrite `time` must recompute or clear
    # it; sources populate it when the axis is statically known (synthetic
    # specs, aggregate_temporal_period outputs could — a loaded parquet
    # cube leaves it None and every consumer falls back to a probe).
    time_axis: Optional[tuple] = None

    def has(self, dim: str) -> bool:
        return dim in self.dims

    def drop(self, dim: str) -> "CubeSchema":
        dims = tuple(d for d in self.dims if d != dim)
        ext = None if dim == TIME else self.time_extent
        ax = None if dim == TIME else self.time_axis
        return replace(self, dims=dims, time_extent=ext, time_axis=ax)

    def with_bands(self, bands: tuple[str, ...]) -> "CubeSchema":
        return replace(self, bands=bands)

    def with_time_extent(self, extent: Optional[tuple]) -> "CubeSchema":
        """Voiding the extent (None) also voids the axis: every site that
        clears the bound does so because it rewrote `time`."""
        ax = self.time_axis if extent is not None else None
        return replace(self, time_extent=extent, time_axis=ax)

    def with_time_axis(self, axis: Optional[tuple]) -> "CubeSchema":
        """Set the exact time axis; a non-empty axis implies the exact
        extent bound (min, max)."""
        if axis is None:
            return replace(self, time_axis=None)
        axis = tuple(sorted(axis))
        ext = (axis[0], axis[-1]) if axis else self.time_extent
        return replace(self, time_axis=axis, time_extent=ext)


@dataclass
class Cube:
    """A lazy cube: DataFrame + dimension metadata. All ops return new Cubes."""

    df: DataFrame
    schema: CubeSchema = field(default_factory=CubeSchema)

    @property
    def key_dims(self) -> list[str]:
        """Grid-key columns present (everything but `value`)."""
        return [d for d in ALL_DIMS if d in self.schema.dims]

    def group_dims_excluding(self, dim: str) -> list[str]:
        return [d for d in self.key_dims if d != dim]

    def with_df(self, df: DataFrame) -> "Cube":
        return Cube(df, self.schema)
