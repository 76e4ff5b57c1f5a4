"""Minimal PNG codec — pure stdlib (zlib + struct), no PIL/cv2.

The reference writes PNG previews through cv2.imwrite
(``openeo_odc_driver.py:1616-1677``); this container has no image
libraries, so the encode is implemented directly against the PNG spec
(RFC 2083): 8-bit grayscale / RGB / RGBA, filter type 0 scanlines, one
zlib IDAT. The decoder exists for tests — round-trip proof that the
emitted bytes are a valid PNG of the expected pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# PNG color types by channel count (bit depth 8)
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (channels, height, width) uint8 array as PNG bytes.

    channels ∈ {1: grayscale, 3: RGB, 4: RGBA}.
    """
    if arr.ndim == 2:
        arr = arr[None, :, :]
    ch, h, w = arr.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"PNG needs 1, 3, or 4 channels, got {ch}")
    if arr.dtype != np.uint8:
        raise ValueError("PNG encoder expects uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    # interleave to (h, w, ch), prepend filter byte 0 per scanline
    pixels = np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))
    raw = b"".join(b"\x00" + pixels[row].tobytes() for row in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`encode_png` (filter 0/1/2 only) back
    to a (channels, height, width) uint8 array. Test-support path."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or color not in (0, 2, 6):
                raise ValueError("decoder supports 8-bit gray/RGB/RGBA only")
            meta = (w, h, {0: 1, 2: 3, 6: 4}[color])
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    w, h, ch = meta
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.empty((h, w, ch), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for row in range(h):
        start = row * (stride + 1)
        ftype = raw[start]
        line = np.frombuffer(raw[start + 1 : start + 1 + stride], dtype=np.uint8)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        else:
            raise ValueError(f"unsupported filter {ftype}")
        out[row] = cur.reshape(w, ch)
        prev = cur
    return np.transpose(out, (2, 0, 1))
