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




def _epsg_of(crs) -> int | None:
    """Parse 'EPSG:32632' / 32632 / '4326' into an int code (None if absent)."""
    if crs is None:
        return None
    try:
        return int(str(crs).split(":")[-1])
    except ValueError:
        return None


def resample_spatial_warp(
    cube: Cube, projection, resolution: float, method: str = "near"
) -> Cube:
    """``resample_spatial`` with a PROJECTION change — the reference
    passes the EPSG int straight to ODC's reprojecting loader
    (``openeo_odc_driver.py:191-199``, with ``resampling=method``);
    here the warp is its own distributed operator for the practical
    remote-sensing pairs: **4326→UTM, UTM→4326, and UTM→UTM** (any
    zone/hemisphere), methods **nearest and bilinear** (round 14 — r13
    shipped 4326→UTM nearest only).

    Physical plan:

    1. **Target grid from query constants**: the source DATA extent
       (one tiny 4-value aggregate), padded by half a source pixel per
       side (the extent is pixel CENTERS; the footprint reaches half a
       pixel further — ADVICE r13), is sampled on a 5×5 corner/quarter-
       point lattice (a projected graticule edge bows, so corners alone
       under-cover the footprint) and projected forward driver-side
       (``functions/proj.py`` Snyder TM). The target lattice anchors on
       ``resolution`` multiples covering that envelope — all plan
       constants after one scalar job.
    2. **Per-target-pixel inverse projection**: ``spark.range`` over
       the target raster → Arrow-batched numpy inverse/forward TM
       (``utm_to_wgs84_np`` / ``wgs84_to_utm_np``, vectorized Snyder
       series; UTM→UTM goes through lon/lat) → fractional source pixel
       index. ``near`` snaps with the engine's standard
       ``floor(q + 0.5)``; ``bilinear`` emits the ≤4 surrounding
       source pixels with (1−w)-style weights. Embarrassingly
       parallel, no data read.
    3. **One equi-join on the source pixel index** — the raster moves
       through exactly one exchange, like every other regrid in this
       engine; bilinear adds one groupBy on the target pixel (weights
       renormalized over non-null joined neighbors, matching
       :func:`resample_cube_spatial_bilinear`). Off-scene targets are
       ABSENT (no fabricated NULL rows).

    Source-index bounds are anchored at the DATA extent's index window
    relative to the grid origin (``ix0 + [0, n_x)``), not at the origin
    itself — a cube cropped by ``filter_bbox`` keeps its GridSpec
    anchor, so origin-anchored bounds would silently drop the east/
    south of the scene (ADVICE r13, high).

    Output coordinates are the target pixel centers; schema gets the
    target grid + ``EPSG:<code>`` CRS."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..functions.proj import (
        make_transforms,
        validate_warp_pair,
        warp_target_lattice,
    )

    if method in ("near", "nearest"):
        bilinear = False
    elif method == "bilinear":
        bilinear = True
    else:
        raise NotImplementedError(
            f"resample_spatial projection warp supports nearest and "
            f"bilinear, got {method!r}"
        )
    src_epsg = _epsg_of(cube.schema.crs)
    tgt_epsg = _epsg_of(projection)
    # fail fast on unsupported CRSs BEFORE firing the extent aggregate
    # (ADVICE r13: a non-UTM target used to die mid-plan inside
    # utm_zone_from_epsg with a bare ValueError)
    validate_warp_pair(src_epsg, tgt_epsg)
    g = cube.schema.grid
    if g is None:
        raise ValueError("resample_spatial warp needs a GridSpec")
    res = float(resolution)
    to_target_np, to_source_np = make_transforms(src_epsg, tgt_epsg)

    ext = cube.df.agg(
        F.min(X).alias("x0"), F.max(X).alias("x1"),
        F.min(Y).alias("y0"), F.max(Y).alias("y1"),
    ).collect()[0]
    sx0, sx1 = float(ext.x0), float(ext.x1)
    sy0, sy1 = float(ext.y0), float(ext.y1)
    # the data extent's index window relative to the grid origin — keep
    # bounds anchor HERE, not at (0, 0) (cropped cubes keep their origin)
    ix0 = int(round((sx0 - g.x0) / g.resx))
    iy0 = int(round((g.y0 - sy1) / g.resy))
    n_x = int(round((sx1 - sx0) / g.resx)) + 1
    n_y = int(round((sy1 - sy0) / g.resy)) + 1
    # half-pixel-padded 5×5 envelope → target lattice (shared helper)
    e_c0, n_c0, nyt, nxt = warp_target_lattice(
        to_target_np, sx0, sx1, sy0, sy1, g.resx, g.resy, res
    )
    src_x0, src_y0 = g.x0, g.y0
    resx, resy = g.resx, g.resy

    if bilinear:
        snap_schema = "_syi long, _sxi long, x double, y double, _w double"
    else:
        snap_schema = "_syi long, _sxi long, x double, y double"

    def snap(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            tyi, txi = np.divmod(idx, nxt)
            e = e_c0 + txi * res
            n = n_c0 - tyi * res
            sx, sy = to_source_np(e, n)
            qx = (sx - src_x0) / resx
            qy = (src_y0 - sy) / resy
            if not bilinear:
                xi = np.floor(qx + 0.5).astype("int64")
                yi = np.floor(qy + 0.5).astype("int64")
                keep = (
                    (xi >= ix0) & (xi < ix0 + n_x)
                    & (yi >= iy0) & (yi < iy0 + n_y)
                )
                yield pd.DataFrame({
                    "_syi": yi[keep], "_sxi": xi[keep],
                    "x": e[keep], "y": n[keep],
                })
                continue
            xlo = np.floor(qx)
            ylo = np.floor(qy)
            wx = qx - xlo
            wy = qy - ylo
            xlo = xlo.astype("int64")
            ylo = ylo.astype("int64")
            parts = []
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = xlo + dx
                    yi = ylo + dy
                    w = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
                    keep = (
                        (xi >= ix0) & (xi < ix0 + n_x)
                        & (yi >= iy0) & (yi < iy0 + n_y)
                        & (w > 0)
                    )
                    parts.append(pd.DataFrame({
                        "_syi": yi[keep], "_sxi": xi[keep],
                        "x": e[keep], "y": n[keep], "_w": w[keep],
                    }))
            yield pd.concat(parts, ignore_index=True)

    import os

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = cube.df.sparkSession
    targets = (
        spark.range(nyt * nxt)
        .repartition(min(max(nyt * nxt // 65536, 1), cpus * 4))
        .mapInPandas(snap, snap_schema)
    )
    keys = [d for d in cube.key_dims if d not in (X, Y)]
    src = cube.df.select(
        *keys,
        F.round((F.col(X) - F.lit(src_x0)) / F.lit(resx)).cast("long")
        .alias("_sxi"),
        F.round((F.lit(src_y0) - F.col(Y)) / F.lit(resy)).cast("long")
        .alias("_syi"),
        VALUE,
    )
    # raster-aware join width from plan constants (the round-14 rule
    # the tiled folds use): source rows × bands × time-steps plus the
    # target lattice, ~48 B long rows at 32 MiB/task — widen only past
    # the session default (gate-scale plans untouched)
    n_bands = max(len(cube.schema.bands), 1)
    ax = cube.schema.time_axis
    n_t = len(ax) if ax else (32 if "time" in cube.schema.dims else 1)
    est_rows = (n_x * n_y * n_bands * n_t
                + nyt * nxt * (4 if bilinear else 1))
    try:
        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        default = 200
    width = -(-(est_rows * 48) // (32 << 20))
    if width > default:
        width = int(min(width, 4096))
        targets = targets.repartition(width, "_syi", "_sxi")
        src = src.repartition(width, "_syi", "_sxi")
    joined = targets.join(src, ["_syi", "_sxi"])
    if bilinear:
        v = F.col(VALUE)
        out = (
            joined.groupBy(*keys, Y, X)
            .agg(
                (
                    F.sum(F.col("_w") * v)
                    / F.sum(F.when(v.isNotNull(), F.col("_w")))
                ).alias(VALUE)
            )
            .select(*keys, Y, X, VALUE)
        )
    else:
        out = joined.select(*keys, Y, X, VALUE)
    from dataclasses import replace

    schema = replace(
        cube.schema,
        grid=GridSpec(x0=e_c0, y0=n_c0, resx=res, resy=res),
        crs=f"EPSG:{tgt_epsg}",
    )
    return Cube(out, schema)
