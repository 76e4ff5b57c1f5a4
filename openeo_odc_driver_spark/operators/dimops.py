"""Array/dimension operators: band selection, label renaming, dimension
add/drop, and along-dimension interpolation (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Window, functions as F

from ..core.cube import BAND, TIME, VALUE, X, Y, Cube


def array_element(
    cube: Cube, label: Optional[str] = None, index: Optional[int] = None
) -> Cube:
    """Select one band by label or position, dropping the band dimension
    (openeo_odc_driver.py:594-611). Positional index resolves against the
    schema's band order — a metadata lookup, not a sort."""
    if label is None:
        if index is None:
            raise ValueError("array_element needs label or index")
        try:
            label = cube.schema.bands[int(index)]
        except IndexError:
            raise ValueError(f"ArrayElementNotAvailable: index {index}") from None
    out = cube.df.where(F.col(BAND) == label).drop(BAND)
    return Cube(out, cube.schema.drop(BAND).with_bands(()))


def add_dimension(cube: Cube, label: str) -> Cube:
    """Wrap a bandless cube under a new band label
    (openeo_odc_driver.py:1123-1132)."""
    if BAND in cube.schema.dims:
        raise ValueError("cube already has a band dimension")
    out = cube.df.withColumn(BAND, F.lit(label))
    from dataclasses import replace

    schema = replace(
        cube.schema, dims=(BAND, *cube.schema.dims), bands=(label,)
    )
    return Cube(out.select(BAND, *[d for d in cube.schema.dims], VALUE), schema)


def rename_labels(
    cube: Cube,
    dimension: str,
    target: Sequence[str],
    source: Optional[Sequence[str]] = None,
) -> Cube:
    """Rename (and implicitly select) band labels
    (openeo_odc_driver.py:1080-1121). Length mismatch → LabelMismatch
    (:1115). Implemented as a literal map lookup — no join, no shuffle.
    The time variant (:1100-1121) lives in :func:`rename_labels_time`."""
    from ..core.cube import canonical_dim

    if canonical_dim(dimension) == TIME:
        return rename_labels_time(cube, target)
    if dimension not in ("bands", "band", "variable"):
        raise NotImplementedError("rename_labels: only band/time dimensions")
    source = list(source) if source is not None else list(cube.schema.bands)
    target = list(target)
    if len(source) != len(target):
        raise ValueError("LabelMismatch: source/target length differ")
    mapping = F.create_map(
        *[F.lit(v) for pair in zip(source, target) for v in pair]
    )
    out = (
        cube.df.where(F.col(BAND).isin(source))
        .withColumn(BAND, mapping[F.col(BAND)])
    )
    return Cube(out, cube.schema.with_bands(tuple(target)))


def rename_labels_time(cube: Cube, target: Sequence[str]) -> Cube:
    """Time variant of rename_labels (openeo_odc_driver.py:1100-1121):
    replace the i-th distinct time label (ascending) with ``target[i]``.
    Length mismatch → LabelMismatch (:1115).

    Plan: when the schema carries the exact time axis (time_axis
    metadata), the mapping is a pure ``create_map`` literal expression —
    zero jobs, zero joins, fused into whatever stage reads the cube.
    Unknown axis → fall back to ranking the distinct time axis (tiny —
    O(10³) rows) and broadcast-joining it back; either way the data side
    never shuffles."""
    from datetime import datetime

    axis = cube.schema.time_axis
    if axis is not None:
        if len(axis) != len(target):
            raise ValueError(
                f"LabelMismatch: {len(axis)} time labels vs {len(target)} targets"
            )
        mapping = F.create_map(
            *[
                lit
                for old, new in zip(axis, target)
                for lit in (
                    F.lit(str(old)).cast("timestamp"),
                    F.lit(str(new)).cast("timestamp"),
                )
            ]
        )
        out = cube.df.withColumn(TIME, mapping[F.col(TIME)]).select(
            *cube.key_dims, VALUE
        )
        new_axis = tuple(datetime.fromisoformat(str(t)) for t in target)
        return Cube(out, cube.schema.with_time_extent(None).with_time_axis(new_axis))

    from pyspark.sql import Window

    n = cube.df.select(TIME).distinct().count()  # metadata-scale action
    if n != len(target):
        raise ValueError(f"LabelMismatch: {n} time labels vs {len(target)} targets")
    w = Window.orderBy(TIME)
    mapping = (
        cube.df.select(TIME).distinct()
        .withColumn("_i", F.row_number().over(w) - 1)
        .withColumn(
            "_new_t",
            F.element_at(
                F.array(*[F.lit(str(t)) for t in target]), F.col("_i") + 1
            ).cast("timestamp"),
        )
        .select(TIME, "_new_t")
    )
    out = (
        cube.df.join(F.broadcast(mapping), TIME)
        .drop(TIME)
        .withColumnRenamed("_new_t", TIME)
        .select(*cube.key_dims, VALUE)
    )
    # labels are caller-supplied, arbitrary — the old extent bound is void
    return Cube(out, cube.schema.with_time_extent(None))


def drop_dimension(cube: Cube, dimension: str) -> Cube:
    from ..core.cube import canonical_dim

    dim = canonical_dim(dimension)
    out = cube.df.drop(dim)
    schema = cube.schema.drop(dim)
    if dim == BAND:
        schema = schema.with_bands(())
    return Cube(out, schema)


def array_interpolate_linear(cube: Cube, dimension: str = "time") -> Cube:
    """Linear gap-fill of NULLs along a dimension
    (openeo_odc_driver.py:1326-1337).

    Window plan (no UDF): for each null, find the previous/next non-null
    value and its coordinate via `last(..., ignorenulls)` over
    forward/backward windows, then interpolate by the coordinate delta.
    Ends stay NULL (xarray interpolate_na default: interior fill only).

    Scale: two window passes partitioned by (band,y,x) — the partition key
    is fine-grained (millions of small groups), which Spark handles well;
    no group blowup, no Python.
    """
    from ..core.cube import canonical_dim

    dim = canonical_dim(dimension)
    part = [d for d in cube.key_dims if d != dim]
    ord_col = F.unix_micros(F.col(dim)) if dim == TIME else F.col(dim)
    fwd = Window.partitionBy(*part).orderBy(ord_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    bwd = Window.partitionBy(*part).orderBy(ord_col.desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    v = F.col(VALUE)
    coord = ord_col.cast("double")
    pv = F.last(F.when(v.isNotNull(), v), ignorenulls=True).over(fwd)
    pc = F.last(F.when(v.isNotNull(), coord), ignorenulls=True).over(fwd)
    nv = F.last(F.when(v.isNotNull(), v), ignorenulls=True).over(bwd)
    nc = F.last(F.when(v.isNotNull(), coord), ignorenulls=True).over(bwd)
    frac = (coord - pc) / (nc - pc)
    interp = pv + frac * (nv - pv)
    out = cube.df.withColumn(
        VALUE,
        F.when(v.isNotNull(), v).otherwise(
            F.when(pv.isNotNull() & nv.isNotNull(), interp)
        ),
    )
    return cube.with_df(out)
