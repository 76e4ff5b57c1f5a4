"""Round-13 item 1 evidence: write a 1.26 G-px scene as a tiled GeoTIFF
WITHOUT driver pixel collect (sinks/gtiff_tiled.py), then verify by
windowed decode against the generating formula.

Scene: 3 bands x 20480^2 px (1,258,291,200 cells) as float32 ->
~4.7 GiB pixel region -> automatic BigTIFF. Tile rows are synthesized
directly (numpy mapInPandas over tile keys, the scale_probe.py
fast-build pattern) so the probe measures the SINK, not a build.

Reported: wall, file size, throughput, driver peak RSS before/after
(the no-collect claim as a measurement), and exact spot-window
verification at the four scene corners + center per band.

Usage: python scratch/sink_probe.py [N_edge] [deflate]
(default 20480 uncompressed; pass "deflate" to probe the compressed
path — round 14's executor-parallel assembly: flat driver RSS is the
claim under test there too)
"""
import os
import resource
import struct
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

TILE = 256
OUT = "/tmp/r13_sink_probe/scene"


ENTROPY = False  # high-entropy values: ~incompressible tiles, so the
# deflate probe moves REAL gigabytes through the parallel assembly


def _values(b, yi, xi):
    if ENTROPY:
        # Weyl-sequence hash: decorrelated 31-bit ints -> float32
        # mantissas with no run structure (zlib ~1.1:1)
        return (((b * 7 + yi * 13 + xi * 31) * 2654435761) % 2147483647
                ).astype("float64")
    return ((b * 7 + yi * 13 + xi * 31) % 97).astype("float64")


def build(spark, n_edge):
    import pandas as pd

    from openeo_odc_driver_spark.core.cube import CubeSchema, GridSpec
    from openeo_odc_driver_spark.core.tiled import TiledCube

    bands = ("B02", "B04", "B08")
    nt = -(-n_edge // TILE)
    keys = spark.range(len(bands) * nt * nt).selectExpr(
        f"CAST(id div {nt * nt} AS INT) AS b",
        f"CAST((id div {nt}) % {nt} AS INT) AS tile_row",
        f"CAST(id % {nt} AS INT) AS tile_col",
    ).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 4)

    def gen(batches):
        for pdf in batches:
            rows = []
            for b, tr, tc in zip(pdf["b"], pdf["tile_row"], pdf["tile_col"]):
                yi = tr * TILE + np.arange(TILE)[:, None]
                xi = tc * TILE + np.arange(TILE)[None, :]
                v = _values(int(b), yi, xi)
                v[(yi + xi) % 41 == 0] = np.nan  # nodata stripes
                rows.append((bands[int(b)], int(tr), int(tc),
                             v.reshape(-1)))
            yield pd.DataFrame(
                {"band": [r[0] for r in rows],
                 "tile_row": [r[1] for r in rows],
                 "tile_col": [r[2] for r in rows],
                 "data": [r[3] for r in rows]}
            )

    df = keys.mapInPandas(
        gen, "band string, tile_row int, tile_col int, data array<double>"
    )
    schema = CubeSchema(
        dims=("band", "y", "x"), bands=bands, crs="EPSG:32632",
        grid=GridSpec(x0=0.0, y0=float(10 * (n_edge - 1)), resx=10.0,
                      resy=10.0),
    )
    return TiledCube(df, schema, TILE, n_edge, n_edge)


def expected_tile(b, tr, tc):
    yi = tr * TILE + np.arange(TILE)[:, None]
    xi = tc * TILE + np.arange(TILE)[None, :]
    v = _values(b, yi, xi).astype("float32")
    v[(yi + xi) % 41 == 0] = np.nan
    return v


def verify_windows(path, n_edge, compress=False):
    """Windowed check: parse the (small) header, pread spot tiles, and
    compare bit-exactly against the formula — no full-file load."""
    from openeo_odc_driver_spark.sinks.gtiff_tiled import _FMT, _SZ

    head = open(path, "rb").read(1 << 20)
    assert head[:4] == b"II\x2b\x00", "expected BigTIFF"
    (ifd_off,) = struct.unpack_from("<Q", head, 8)
    (n,) = struct.unpack_from("<Q", head, ifd_off)
    tags = {}
    for i in range(int(n)):
        tag, typ = struct.unpack_from("<HH", head, ifd_off + 8 + i * 20)
        (count,) = struct.unpack_from("<Q", head, ifd_off + 8 + i * 20 + 4)
        loc = ifd_off + 8 + i * 20 + 12
        size = _SZ[typ] * count
        if size > 8:
            (off,) = struct.unpack_from("<Q", head, loc)
            buf = head[off: off + size]
        else:
            buf = head[loc: loc + size]
        tags[tag] = struct.unpack(f"<{count}{_FMT[typ]}", buf)
    nt = -(-n_edge // TILE)
    per_plane = nt * nt
    offsets = tags[324]
    fd = os.open(path, os.O_RDONLY)
    checked = 0
    try:
        for b in range(3):
            for tr, tc in [(0, 0), (0, nt - 1), (nt - 1, 0),
                           (nt - 1, nt - 1), (nt // 2, nt // 2)]:
                gidx = b * per_plane + tr * nt + tc
                counts = tags.get(325)
                raw = os.pread(fd, counts[gidx] if compress else
                               TILE * TILE * 4, offsets[gidx])
                if compress:
                    import zlib

                    raw = zlib.decompress(raw)
                got = np.frombuffer(raw, dtype="<f4").reshape(TILE, TILE)
                want = expected_tile(b, tr, tc)
                assert np.array_equal(got, want, equal_nan=True), (b, tr, tc)
                checked += 1
    finally:
        os.close(fd)
    return checked


def main():
    n_edge = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    compress = "deflate" if "deflate" in sys.argv[2:] else None
    global ENTROPY
    ENTROPY = "entropy" in sys.argv[2:]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.sinks.gtiff_tiled import save_gtiff_tiled

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tc = build(spark, n_edge)
    px = 3 * n_edge * n_edge
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.time()
    path = save_gtiff_tiled(tc, OUT, force_bigtiff=True,
                            compress=compress)
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    size = os.path.getsize(path)
    checked = verify_windows(path, n_edge, compress=bool(compress))
    print({
        "pixels": px, "wall_sec": round(wall, 1),
        "file_gib": round(size / 2**30, 2),
        "mpx_per_sec": round(px / wall / 1e6, 1),
        "driver_rss_gb_before": round(rss0, 2),
        "driver_rss_gb_after": round(rss1, 2),
        "windows_verified": checked,
        "compress": compress,
    }, flush=True)


if __name__ == "__main__":
    main()
