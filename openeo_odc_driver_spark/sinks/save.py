"""`save_result` sinks (openeo_odc_driver.py:1611-1832).

Canonical distributed sink: parquet (≙ the reference's NetCDF role). JSON
reproduces the reference's dim-dependent shape rules (:1783-1827). PNG and
GeoTIFF emit real bytes through pure-stdlib encoders (sinks/png.py,
sinks/gtiff.py — no PIL/GDAL in this container), both round-trip tested;
only the preview-resize cv2 path is approximated (nearest-neighbor).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyspark.sql import functions as F

from ..core.cube import BAND, TIME, VALUE, X, Y, Cube


def save_parquet(cube: Cube, path: str, partition_by_time: bool = True) -> str:
    """Distributed sink. Partitioning by month keeps file counts sane and
    gives downstream scans partition pruning on time."""
    df = cube.df
    if partition_by_time and TIME in cube.schema.dims:
        df = df.withColumn("_month", F.date_format(TIME, "yyyy-MM"))
        df.write.mode("overwrite").partitionBy("_month").parquet(path)
    else:
        df.write.mode("overwrite").parquet(path)
    return path


def save_json(cube: Cube, path: str) -> str:
    """Dim-dependent JSON shapes (openeo_odc_driver.py:1783-1827):
    0-d → scalar; with band dim → {band: [values]}; else flat records.
    Driver-side collect is capped like the grid sinks — an unreduced cube
    must fail loudly, not OOM the driver."""
    rows = cube.df.limit(MAX_COLLECT_ROWS + 1).collect()
    if len(rows) > MAX_COLLECT_ROWS:
        raise ValueError(
            f"JSON sink exceeds {MAX_COLLECT_ROWS} rows; reduce first"
        )
    dims = cube.schema.dims
    if not dims:
        payload = rows[0][VALUE] if rows else None
    elif dims == (BAND,):
        payload = {}
        for r in rows:
            payload.setdefault(r[BAND], []).append(r[VALUE])
    else:
        payload = [r.asDict() for r in rows]
        for rec in payload:
            for k, v in rec.items():
                if hasattr(v, "isoformat"):
                    rec[k] = v.isoformat()
    with open(path, "w") as f:
        json.dump(payload, f, default=str)
    return path


MAX_COLLECT_ROWS = 50_000_000  # driver-side grid guard (~400 MB of doubles)


def _to_grid(cube: Cube) -> tuple[np.ndarray, dict]:
    """Collect a (bands, y, x) numpy grid (driver-side; images are small —
    the reference collects through xarray the same way). A cube that still
    carries a multi-step time axis (and no band axis) maps **time onto the
    band axis** of the output, like the reference's GeoTIFF writer
    (openeo_odc_driver.py:1693-1703); band+time together must be squeezed
    by the caller first."""
    pdf = cube.df.limit(MAX_COLLECT_ROWS + 1).toPandas()
    if len(pdf) > MAX_COLLECT_ROWS:
        raise ValueError(f"grid sink exceeds {MAX_COLLECT_ROWS} pixels; reduce first")
    pdf = pdf.apply(lambda c: c.astype("float64") if c.dtype == object and c.name in (X, Y, VALUE) else c)
    if BAND in pdf.columns:
        axis_col, axis_vals = BAND, list(cube.schema.bands) or sorted(pdf[BAND].unique())
    elif TIME in pdf.columns:
        axis_vals = sorted(pdf[TIME].unique())
        axis_col = TIME
    else:
        axis_col, axis_vals = None, ["value"]
    ys = np.sort(pdf[Y].unique().astype("float64"))[::-1]  # y stored descending
    xs = np.sort(pdf[X].unique().astype("float64"))
    arr = np.full((len(axis_vals), len(ys), len(xs)), np.nan)
    # vectorized scatter: searchsorted index lookups + one fancy-indexed
    # assignment (the old iterrows fill was ~100× more Python per pixel)
    yv = pdf[Y].to_numpy(dtype="float64")
    xv = pdf[X].to_numpy(dtype="float64")
    y_pos = np.searchsorted(-ys, -yv)  # ys descending → search on negated
    x_pos = np.searchsorted(xs, xv)
    if axis_col is not None:
        bidx = {b: i for i, b in enumerate(axis_vals)}
        b_pos = pdf[axis_col].map(bidx).to_numpy(dtype="int64")
    else:
        b_pos = np.zeros(len(pdf), dtype="int64")
    arr[b_pos, y_pos, x_pos] = pdf[VALUE].to_numpy(dtype="float64")
    meta = {
        "bands": [str(v) for v in axis_vals],
        "ys": [float(v) for v in ys],
        "xs": [float(v) for v in xs],
        "crs": cube.schema.crs,
    }
    return arr, meta


def save_gtiff(cube: Cube, path: str) -> str:
    """GTiff semantics (openeo_odc_driver.py:1679-1724): 4-D cubes must
    squeeze — drop band dim if 1 band, else drop time if 1 step, else
    error. Emits REAL GeoTIFF bytes via the pure-stdlib encoder
    (sinks/gtiff.py: uncompressed float32 + ModelPixelScale/Tiepoint/
    GeoKeyDirectory tags) — the same capability-boundary move as the
    PNG encoder; a sidecar JSON keeps the full axis metadata."""
    dims = set(cube.schema.dims)
    c = cube
    if BAND in dims and TIME in dims:
        nb = len(cube.schema.bands)
        if nb == 1:
            from ..operators.dimops import drop_dimension

            c = drop_dimension(cube, "bands")
        else:
            nt = cube.df.select(TIME).distinct().count()
            if nt == 1:
                from ..operators.dimops import drop_dimension

                c = drop_dimension(cube, "time")
            else:
                raise ValueError(
                    "GTiff supports at most 3 dimensions: reduce bands or time first"
                )  # ≙ openeo_odc_driver.py:1693-1703
    arr, meta = _to_grid(c)
    from .gtiff import encode_gtiff

    ys, xs = meta["ys"], meta["xs"]
    x_res = abs(xs[1] - xs[0]) if len(xs) > 1 else 1.0
    y_res = abs(ys[1] - ys[0]) if len(ys) > 1 else 1.0
    crs = str(meta.get("crs") or "")
    projected = not crs.endswith("4326")
    try:
        epsg = int(crs.rsplit(":", 1)[-1])
    except ValueError:
        epsg = 0
    tif = encode_gtiff(
        arr,
        pixel_scale=(x_res, y_res),
        # GeoTIFF anchors the upper-left pixel corner; ys is descending
        origin=(xs[0] - x_res / 2, ys[0] + y_res / 2),
        epsg=epsg,
        projected=projected,
    )
    out = path if path.endswith(".tif") else path + ".tif"
    with open(out, "wb") as f:
        f.write(tif)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return out


def _nearest_resize(arr: np.ndarray, size: int) -> np.ndarray:
    """Longest-side resize, nearest neighbor (the reference uses cv2,
    openeo_odc_driver.py:1660-1670; cv2 isn't in this container and
    nearest is sufficient for the preview-image role)."""
    _, h, w = arr.shape
    scale = size / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    yi = np.minimum((np.arange(nh) / scale).astype(int), h - 1)
    xi = np.minimum((np.arange(nw) / scale).astype(int), w - 1)
    return arr[:, yi[:, None], xi[None, :]]


def save_png(
    cube: Cube,
    path: str,
    red: str | None = None,
    green: str | None = None,
    blue: str | None = None,
    gray: str | None = None,
    size: int | None = None,
) -> str:
    """PNG semantics (openeo_odc_driver.py:1616-1677): fillna(0), uint8
    clip, optional RGB(+gray) band compositing by label, longest-side
    resize. Real PNG bytes via the stdlib encoder (sinks/png.py) — 1
    band → grayscale, 3 → RGB, 4 → RGBA; other band counts error like
    the reference's cv2 writer would."""
    from .png import encode_png

    arr, meta = _to_grid(cube)
    if red is not None and green is not None and blue is not None:
        order = [red, green, blue] + ([gray] if gray else [])
        idx = [meta["bands"].index(b) for b in order]
        arr = arr[idx]
        meta["bands"] = order
    if size is not None:
        arr = _nearest_resize(arr, int(size))
    arr8 = np.clip(np.nan_to_num(arr, nan=0.0), 0, 255).astype(np.uint8)
    with open(path + ".png", "wb") as f:
        f.write(encode_png(arr8))
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return path + ".png"


def save_result(cube: Cube, path: str, fmt: str = "PARQUET") -> str:
    fmt = fmt.upper()
    if fmt in ("PARQUET", "NETCDF"):  # parquet is our canonical NetCDF
        return save_parquet(cube, path)
    if fmt == "JSON":
        return save_json(cube, path)
    if fmt in ("GTIFF", "GTIFF_"):
        return save_gtiff(cube, path)
    if fmt == "PNG":
        return save_png(cube, path)
    raise ValueError(f"unsupported format {fmt}")
