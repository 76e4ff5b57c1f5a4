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
    arr = np.load(p)
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
