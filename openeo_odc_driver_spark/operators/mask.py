"""`mask` — keep data where the mask is falsy (openeo_odc_driver.py:1339-1352).

Reference semantics: ``data.where(np.logical_not(mask))`` after dropping the
mask's band dimension (``min(dim='variable')``, :1344-1345); NaN mask ⇒
masked (``np.logical_not(nan)`` is False); masked pixels become NaN or the
scalar ``replacement``.

Long-format plan: reduce the mask to one row per (time,y,x) via min over
bands, left-join data on the spatial-temporal key, and CASE. The mask cube
is usually a fraction of the data cube (1 band) — broadcastable when small;
at scale both sides co-partition on (time,y,x).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from ..core.cube import BAND, TIME, VALUE, X, Y, Cube


def mask(data: Cube, mask_cube: Cube, replacement: Optional[float] = None) -> Cube:
    """Single-band masks drop their band dim and broadcast over data bands
    (the reference only min-reduces when the mask has exactly one band,
    :1344-1345); multi-band masks align per band — band joins the key."""
    mask_is_multiband = (
        BAND in mask_cube.schema.dims and len(mask_cube.schema.bands) > 1
    )
    if mask_is_multiband:
        keys = [d for d in data.key_dims if d in mask_cube.schema.dims]
        m = mask_cube.df.select(*keys, F.col(VALUE).alias("_m"))
    else:
        keys = [d for d in data.key_dims if d != BAND and d in mask_cube.schema.dims]
        m = (
            mask_cube.df.groupBy(*keys)
            .agg(F.min(VALUE).alias("_m"))  # band-drop, :1344-1345
        )
    repl = F.lit(None) if replacement is None else F.lit(float(replacement))
    out = (
        data.df.join(m, keys, "left")
        .withColumn(
            VALUE,
            F.when((F.col("_m") == 0) & F.col("_m").isNotNull(), F.col(VALUE)).otherwise(repl),
        )
        .drop("_m")
    )
    return data.with_df(out)
