"""Cube alignment: temporal as-of join and spatial grid snapping.

``resample_cube_temporal`` (openeo_odc_driver.py:360-380) is a
nearest-neighbor **as-of join** on time; ``resample_cube_spatial``
(:342-358) regrids source coordinates onto the target cube's grid.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..core.cube import TIME, VALUE, X, Y, Cube, GridSpec


def resample_cube_temporal(source: Cube, target: Cube) -> Cube:
    """For each target timestamp pick the nearest source time slice and
    relabel it with the target time (openeo_odc_driver.py:360-380).

    Plan: the distinct time axes are tiny relative to the data (O(10³))
    — build the target→nearest-source mapping with a broadcast cross
    join + rank, then broadcast-equi-join it back onto the source rows.
    Data-side cost: one broadcast hash join, no shuffle of the big side.
    Tie-break: earlier source time (deterministic in both engines).
    """
    src_times = source.df.select(TIME).distinct().withColumnRenamed(TIME, "_src_t")
    tgt_times = target.df.select(TIME).distinct().withColumnRenamed(TIME, "_tgt_t")
    pairs = tgt_times.crossJoin(F.broadcast(src_times))
    w = Window.partitionBy("_tgt_t").orderBy(
        F.abs(F.unix_micros("_tgt_t") - F.unix_micros("_src_t")), F.col("_src_t")
    )
    mapping = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_src_t", "_tgt_t")
    )
    out = (
        source.df.join(
            F.broadcast(mapping), source.df[TIME] == mapping["_src_t"], "inner"
        )
        .drop(TIME, "_src_t")
        .withColumnRenamed("_tgt_t", TIME)
        .select(*source.key_dims, VALUE)
    )
    # output time labels are the target's axis — inherit ITS extent + axis
    return Cube(
        out,
        source.schema.with_time_extent(target.schema.time_extent).with_time_axis(
            target.schema.time_axis
        ),
    )


def resample_cube_spatial(source: Cube, target: Cube, method: str = "near") -> Cube:
    """Regrid source onto the target grid (openeo_odc_driver.py:342-358).

    `near` (reference default): snap each source pixel to the nearest
    target cell center, then keep one value per cell (the minimum-distance
    source pixel; ties by coordinate order). Pure expressions + one
    groupBy — no join against the target data at all, only its GridSpec.

    `bilinear`: 4-neighbor weighted blend — see
    :func:`resample_cube_spatial_bilinear`.
    """
    if method in ("bilinear",):
        return resample_cube_spatial_bilinear(source, target)
    if method not in ("near", "nearest"):
        raise NotImplementedError("only near/bilinear regridding")
    grid = target.schema.grid
    if grid is None:
        raise ValueError("target cube lacks a GridSpec")
    # floor(v + 0.5) instead of round(): engines disagree on round-half
    # modes (HALF_UP vs half-to-even); floor+0.5 is identical everywhere
    snap_x = F.lit(grid.x0) + F.lit(grid.resx) * F.floor(
        (F.col(X) - F.lit(grid.x0)) / F.lit(grid.resx) + F.lit(0.5)
    )
    snap_y = F.lit(grid.y0) - F.lit(grid.resy) * F.floor(
        (F.lit(grid.y0) - F.col(Y)) / F.lit(grid.resy) + F.lit(0.5)
    )
    dist = (F.col(X) - snap_x) * (F.col(X) - snap_x) + (
        F.col(Y) - snap_y
    ) * (F.col(Y) - snap_y)
    df = (
        source.df.withColumn("_tx", snap_x)
        .withColumn("_ty", snap_y)
        .withColumn("_d", dist)
    )
    group = [d for d in source.key_dims if d not in (X, Y)]
    w = Window.partitionBy(*group, "_tx", "_ty").orderBy("_d", X, Y)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop(X, Y, "_d", "_rn")
        .withColumnRenamed("_tx", X)
        .withColumnRenamed("_ty", Y)
        .select(*source.key_dims, VALUE)
    )
    from dataclasses import replace

    return Cube(out, replace(source.schema, grid=grid))


def resample_cube_spatial_bilinear(source: Cube, target: Cube) -> Cube:
    """Bilinear regrid (ref openeo_odc_driver.py:342-358, method other than
    nearest): each target cell blends its 4 surrounding source pixels with
    (1−wx)(1−wy)-style weights.

    Plan: the target's distinct cell axis (tiny) explodes into 4 weighted
    source-pixel references, which **broadcast-join** the source on its
    coordinates — the big side never shuffles; one groupBy on the target
    key finishes. NULL neighbors are renormalized out (sum w·v / sum of
    weights over non-null neighbors) — GDAL-style nodata handling rather
    than NULL poisoning; divergence from strict bilinear documented here.
    """
    sg = source.schema.grid
    if sg is None or target.schema.grid is None:
        raise ValueError("bilinear resample needs GridSpecs on both cubes")
    t_cells = target.df.select(
        F.col(Y).alias("_ty"), F.col(X).alias("_tx")
    ).distinct()
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (0, 1)
            for dx in (0, 1)
        ]
    )
    fx = (F.col("_tx") - F.lit(sg.x0)) / F.lit(sg.resx)
    fy = (F.lit(sg.y0) - F.col("_ty")) / F.lit(sg.resy)
    nb = (
        t_cells.select("_ty", "_tx", F.explode(offs).alias("_o"))
        .withColumn("_xlo", F.floor(fx))
        .withColumn("_ylo", F.floor(fy))
        .withColumn("_wx", fx - F.floor(fx))
        .withColumn("_wy", fy - F.floor(fy))
        .select(
            "_ty",
            "_tx",
            (F.lit(sg.x0) + F.lit(sg.resx) * (F.col("_xlo") + F.col("_o.dx"))).alias(X),
            (F.lit(sg.y0) - F.lit(sg.resy) * (F.col("_ylo") + F.col("_o.dy"))).alias(Y),
            (
                F.when(F.col("_o.dx") == 0, 1.0 - F.col("_wx")).otherwise(F.col("_wx"))
                * F.when(F.col("_o.dy") == 0, 1.0 - F.col("_wy")).otherwise(F.col("_wy"))
            ).alias("_w"),
        )
    )
    group = [d for d in source.key_dims if d not in (X, Y)]
    joined = source.df.join(F.broadcast(nb), [Y, X])
    v = F.col(VALUE)
    out = (
        joined.groupBy(*group, "_ty", "_tx")
        .agg(
            (
                F.sum(F.col("_w") * v)
                / F.sum(F.when(v.isNotNull(), F.col("_w")))
            ).alias(VALUE)
        )
        .withColumnRenamed("_ty", Y)
        .withColumnRenamed("_tx", X)
        .select(*source.key_dims, VALUE)
    )
    from dataclasses import replace

    return Cube(out, replace(source.schema, grid=target.schema.grid))

