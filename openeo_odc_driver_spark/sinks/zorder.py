"""Z-order (Morton) clustered cube layout — multidimensional data
clustering for parquet min/max pruning, the Delta/Iceberg OPTIMIZE
ZORDER idiom re-expressed with plain Spark primitives.

A raster cube is queried by 2-D bounding box (``filter_bbox``), but
parquet skips row groups on per-column min/max only. Sorting by (y, x)
makes y-pruning perfect and x-pruning useless; interleaving the bits of
the two grid indices into one Morton key gives every file a compact
footprint in BOTH dimensions, so any bbox predicate prunes ~√ of what a
row-major layout reads. At 100 TB (thousands of files per collection)
this is the difference between a bbox query scanning a city tile and
scanning a continent stripe.

``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` yields files
covering contiguous Morton ranges; the file count is a layout parameter
(the ``write_training_corpus`` discipline). The locality claim is
pinned by tests/test_round5c_ops.py: an x-slab predicate touches every
row-major file but only ~half the z-ordered ones, by the files' own
min/max stats — exactly the stats parquet readers prune on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(ix: Column, iy: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative integer grid indices:
    bit i of ``ix`` lands at position 2i, of ``iy`` at 2i+1. Pure
    integer bit arithmetic — exact in any engine, codegen-fused.
    """
    ix = ix.cast("bigint")
    iy = iy.cast("bigint")
    k = F.lit(0).cast("bigint")
    for i in range(bits):
        bx = F.shiftright(ix, i).bitwiseAND(F.lit(1))
        by = F.shiftright(iy, i).bitwiseAND(F.lit(1))
        k = k.bitwiseOR(F.shiftleft(bx, 2 * i)).bitwiseOR(
            F.shiftleft(by, 2 * i + 1)
        )
    return k


def grid_indices(df: DataFrame, grid) -> DataFrame:
    """Recover integer grid indices from world coordinates using the
    cube's :class:`~..core.cube.GridSpec` (x = x0 + resx·ix,
    y = y0 − resy·iy) — plan-time metadata, no data pass."""
    ix = F.round((F.col("x") - F.lit(grid.x0)) / F.lit(grid.resx)).cast("int")
    iy = F.round((F.lit(grid.y0) - F.col("y")) / F.lit(grid.resy)).cast("int")
    return df.withColumn("ix", ix).withColumn("iy", iy)


def write_zordered(
    df: DataFrame, path: str, grid, n_files: int = 8, bits: int = 16
) -> None:
    """Materialize a cube z-order-clustered: one range shuffle on the
    Morton key sizes exactly ``n_files`` files, each sorted by and
    covering a contiguous Morton range — compact 2-D footprints that
    parquet min/max stats expose to any later bbox scan."""
    keyed = grid_indices(df, grid).withColumn(
        "zkey", zorder_key(F.col("ix"), F.col("iy"), bits)
    )
    (
        keyed.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("ix", "iy")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_bucket_stats(df: DataFrame, grid, block_bits: int = 2) -> DataFrame:
    """The gate-able core of the layout: assign every cell its Morton
    key, bucket keys into 4^``block_bits``-cell Z-blocks (the unit a
    file boundary lands on), and report each bucket's 2-D bounding box.

    A perfect Z-block's bbox area equals its cell count (compact
    squares); a row-major bucketing of the same size spans the full x
    extent. The oracle reproduces the bit math exactly, so this doubles
    as a cross-engine pin of the Morton function itself. Plan: one
    scan-fused projection + one tiny aggregation (buckets ≪ cells).
    """
    keyed = grid_indices(df, grid).withColumn(
        "zkey", zorder_key(F.col("ix"), F.col("iy"))
    )
    bucket = F.shiftright(F.col("zkey"), 2 * block_bits)
    return (
        keyed.groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.min("ix").alias("x_min"),
            F.max("ix").alias("x_max"),
            F.min("iy").alias("y_min"),
            F.max("iy").alias("y_max"),
        )
        .withColumn(
            "bbox_area",
            (
                (F.col("x_max") - F.col("x_min") + 1)
                * (F.col("y_max") - F.col("y_min") + 1)
            ).cast("bigint"),
        )
    )
