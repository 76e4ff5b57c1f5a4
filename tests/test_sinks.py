"""save_result sinks: JSON shapes, GTiff squeeze rules, PNG compositing."""

import json

import numpy as np
import pytest

from openeo_odc_driver_spark.sinks.save import save_gtiff, save_json, save_png
from openeo_odc_driver_spark.sources.synthetic import CubeSpec, synthetic_cube

SMALL = CubeSpec(n_times=2, ny=4, nx=4)


def test_png_rgb_compositing_and_resize(spark, tmp_path):
    cube = synthetic_cube(spark, SMALL)
    from openeo_odc_driver_spark.operators.filters import filter_temporal

    one_t = filter_temporal(cube, "2021-01-01", "2021-02-01")
    p = save_png(
        one_t, str(tmp_path / "img"), red="B08", green="B04", blue="SCL", size=8
    )
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"  # real PNG magic
    from openeo_odc_driver_spark.sinks.png import decode_png

    arr = decode_png(data)
    meta = json.load(open(str(tmp_path / "img") + ".json"))
    assert meta["bands"] == ["B08", "B04", "SCL"]  # composited order
    assert arr.shape == (3, 8, 8)  # longest side resized 4→8
    assert arr.dtype == np.uint8


def test_png_unknown_band_raises(spark, tmp_path):
    cube = synthetic_cube(spark, SMALL)
    with pytest.raises(ValueError):
        save_png(cube, str(tmp_path / "x"), red="NOPE", green="B04", blue="SCL")


def test_gtiff_multiband_multitime_rejected(spark, tmp_path):
    cube = synthetic_cube(spark, SMALL)  # 3 bands × 2 times
    with pytest.raises(ValueError, match="reduce bands or time"):
        save_gtiff(cube, str(tmp_path / "t"))


def test_json_band_dict_shape(spark, tmp_path):
    from openeo_odc_driver_spark.operators.reducers import reduce_dimension

    c = synthetic_cube(spark, SMALL)
    r = reduce_dimension(
        reduce_dimension(reduce_dimension(c, "time", "mean"), "x", "mean"),
        "y",
        "mean",
    )  # bands only
    p = save_json(r, str(tmp_path / "o.json"))
    payload = json.load(open(p))
    assert set(payload) == {"B04", "B08", "SCL"}


def test_json_sink_capped(spark, tmp_path, monkeypatch):
    """An unreduced cube must raise at the JSON sink, not OOM the driver."""
    import openeo_odc_driver_spark.sinks.save as sv
    from openeo_odc_driver_spark.sources.synthetic import synthetic_cube

    monkeypatch.setattr(sv, "MAX_COLLECT_ROWS", 100)
    with pytest.raises(ValueError, match="reduce first"):
        sv.save_json(synthetic_cube(spark), str(tmp_path / "big.json"))


def test_png_roundtrip_bitexact(spark, tmp_path):
    """Encode→decode round-trip reproduces the exact uint8 pixels, and the
    composited PNG values match the cube values driver-side."""
    from openeo_odc_driver_spark.sinks.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        a = rng.integers(0, 256, size=(ch, 5, 9), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a)
    with pytest.raises(ValueError, match="channels"):
        encode_png(rng.integers(0, 256, size=(2, 4, 4), dtype=np.uint8))

    from openeo_odc_driver_spark.operators.filters import filter_temporal
    from openeo_odc_driver_spark.sinks.save import _to_grid

    cube = filter_temporal(
        synthetic_cube(spark, SMALL), "2021-01-01", "2021-02-01"
    )
    p = save_png(cube, str(tmp_path / "gray3"))
    grid, _ = _to_grid(cube)
    expect = np.clip(np.nan_to_num(grid, nan=0.0), 0, 255).astype(np.uint8)
    assert np.array_equal(decode_png(open(p, "rb").read()), expect)


def test_gtiff_roundtrip_real_bytes(spark, tmp_path):
    """save_gtiff emits a parseable little-endian TIFF whose samples,
    pixel scale, tiepoint, and EPSG key survive a round trip."""
    import numpy as np

    from openeo_odc_driver_spark.sinks.gtiff import decode_gtiff, encode_gtiff

    rng = np.arange(24, dtype="float32").reshape(2, 3, 4) / 3.0
    data = encode_gtiff(
        rng, pixel_scale=(10.0, 10.0), origin=(500000.0, 5200000.0),
        epsg=32632, projected=True,
    )
    assert data[:4] == b"II\x2a\x00"  # real TIFF magic
    arr, meta = decode_gtiff(data)
    np.testing.assert_array_equal(arr, rng)
    assert meta["pixel_scale"][:2] == [10.0, 10.0]
    assert meta["tiepoint"][3:5] == [500000.0, 5200000.0]
    assert 32632 in meta["geo_keys"] and meta["sample_format"] == [3, 3]
    assert meta["bits"] == [32, 32]
