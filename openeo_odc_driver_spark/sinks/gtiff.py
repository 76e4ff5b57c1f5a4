"""Minimal pure-stdlib GeoTIFF encoder (no GDAL/rasterio in container).

Emits a baseline little-endian TIFF 6.0 file: uncompressed float32
samples, one strip, band-interleaved-by-pixel, plus the three GeoTIFF
tags a GIS reader needs to georeference it — ModelPixelScale,
ModelTiepoint (upper-left anchor), and a GeoKeyDirectory carrying the
EPSG code. Mirrors the role of the reference's rioxarray
``rio.to_raster`` (openeo_odc_driver.py:1679-1724) at the container's
capability boundary, the same way sinks/png.py replaces PIL.

Scale note: sinks collect a bounded preview grid to the driver by design
(reference semantics; `_to_grid` enforces the row cap) — the encoder is
driver-side on purpose.
"""

from __future__ import annotations

import struct

import numpy as np

_T_SHORT, _T_LONG, _T_DOUBLE = 3, 4, 12

# (tag, type, count, value-or-offset placeholder)
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735


def encode_gtiff(
    arr: np.ndarray,
    pixel_scale: tuple[float, float],
    origin: tuple[float, float],
    epsg: int | None = 4326,
    projected: bool = False,
) -> bytes:
    """Encode ``arr`` — (H, W) or (bands, H, W) float data — as GeoTIFF
    bytes. ``pixel_scale`` = (x_res, y_res); ``origin`` = upper-left
    (x, y); ``projected`` selects the GeoTIFF model type (2 = geographic
    lat/lon, 1 = projected CRS) for the EPSG key."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, h, w = arr.shape
    # band-interleaved-by-pixel sample layout, float32 little-endian
    pixels = np.ascontiguousarray(
        np.transpose(arr, (1, 2, 0)).astype("<f4")
    ).tobytes()

    geo_keys = [
        # KeyDirectoryVersion, KeyRevision, MinorRevision, NumberOfKeys
        1, 1, 0, 2,
        # GTModelTypeGeoKey: 1 = projected, 2 = geographic
        1024, 0, 1, (1 if projected else 2),
        # ProjectedCSTypeGeoKey (3072) or GeographicTypeGeoKey (2048)
        (3072 if projected else 2048), 0, 1, int(epsg or 0),
    ]
    scale_vals = [float(pixel_scale[0]), float(pixel_scale[1]), 0.0]
    tiepoint_vals = [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0]

    entries = []  # (tag, type, count, packed-inline-value or bytes payload)

    def inline(fmt: str, *vals) -> bytes:
        return struct.pack("<" + fmt, *vals).ljust(4, b"\0")

    entries.append((256, _T_LONG, 1, inline("I", w)))          # ImageWidth
    entries.append((257, _T_LONG, 1, inline("I", h)))          # ImageLength
    bits = [(258, _T_SHORT, nb, b"")]                          # BitsPerSample
    entries.append((259, _T_SHORT, 1, inline("H", 1)))         # Compression: none
    entries.append((262, _T_SHORT, 1, inline("H", 1)))         # Photometric: minisblack
    entries.append((273, _T_LONG, 1, b""))                     # StripOffsets (patched)
    entries.append((277, _T_SHORT, 1, inline("H", nb)))        # SamplesPerPixel
    entries.append((278, _T_LONG, 1, inline("I", h)))          # RowsPerStrip
    entries.append((279, _T_LONG, 1, inline("I", len(pixels))))  # StripByteCounts
    entries.append((284, _T_SHORT, 1, inline("H", 1)))         # PlanarConfig: chunky
    sfmt = [(339, _T_SHORT, nb, b"")]                          # SampleFormat: IEEE float
    geo = [
        (_MODEL_PIXEL_SCALE, _T_DOUBLE, 3, b""),
        (_MODEL_TIEPOINT, _T_DOUBLE, 6, b""),
        (_GEO_KEY_DIRECTORY, _T_SHORT, len(geo_keys), b""),
    ]
    all_tags = sorted(entries + bits + sfmt + geo, key=lambda e: e[0])

    n = len(all_tags)
    ifd_offset = 8
    ifd_size = 2 + n * 12 + 4
    overflow_offset = ifd_offset + ifd_size  # payloads too big for 4 bytes
    overflow = bytearray()

    def payload(tag, typ, count):
        """Out-of-line payload bytes for the variable-size tags."""
        if tag == 258:
            return struct.pack(f"<{count}H", *([32] * count))
        if tag == 339:
            return struct.pack(f"<{count}H", *([3] * count))
        if tag == _MODEL_PIXEL_SCALE:
            return struct.pack("<3d", *scale_vals)
        if tag == _MODEL_TIEPOINT:
            return struct.pack("<6d", *tiepoint_vals)
        if tag == _GEO_KEY_DIRECTORY:
            return struct.pack(f"<{count}H", *geo_keys)
        return None

    # first pass: compute overflow layout
    packed = []
    for tag, typ, count, val in all_tags:
        pl = payload(tag, typ, count)
        size = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}[typ] * count
        if pl is not None and size > 4:
            packed.append((tag, typ, count, struct.pack("<I", overflow_offset + len(overflow))))
            overflow.extend(pl)
        elif pl is not None:
            packed.append((tag, typ, count, pl.ljust(4, b"\0")))
        else:
            packed.append((tag, typ, count, val))

    data_offset = overflow_offset + len(overflow)
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", n)
    for tag, typ, count, val in packed:
        if tag == 273:  # StripOffsets now known
            val = struct.pack("<I", data_offset)
        out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    out += overflow
    out += pixels
    return bytes(out)


def decode_gtiff(data: bytes) -> tuple[np.ndarray, dict]:
    """Parse the subset of TIFF this module writes (round-trip tests and
    honest verification that the bytes are a real TIFF)."""
    assert data[:4] == b"II\x2a\x00", "not a little-endian TIFF"
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd_off + 2 + i * 12)
        raw = data[ifd_off + 2 + i * 12 + 8 : ifd_off + 2 + i * 12 + 12]
        size = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}[typ] * count
        if size > 4:
            (off,) = struct.unpack("<I", raw)
            buf = data[off : off + size]
        else:
            buf = raw[:size]
        fmt = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}[typ]
        tags[tag] = list(struct.unpack(f"<{count}{fmt}", buf))
    w, h, nb = tags[256][0], tags[257][0], tags[277][0]
    (strip_off,), (strip_len,) = tags[273], tags[279]
    arr = np.frombuffer(data[strip_off : strip_off + strip_len], dtype="<f4")
    arr = arr.reshape(h, w, nb).transpose(2, 0, 1)
    meta = {
        "pixel_scale": tags.get(_MODEL_PIXEL_SCALE),
        "tiepoint": tags.get(_MODEL_TIEPOINT),
        "geo_keys": tags.get(_GEO_KEY_DIRECTORY),
        "sample_format": tags.get(339),
        "bits": tags.get(258),
    }
    return arr, meta
