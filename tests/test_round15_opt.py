"""Round-15 optimization internals: the pandas-stage parallelism floor
(`core/tiled._py_stage_width` / `_widen_py`) that keeps applyInPandas
tile stages from AQE-coalescing to one task, and its invariants:
cluster- and data-adaptive width, raster byte sizing taking precedence
at scale, and unchanged operator results under the repartition."""

import numpy as np
import pytest

from openeo_odc_driver_spark.core import tiled
from openeo_odc_driver_spark.core.tiled import (
    _py_stage_width,
    _tile_group_count,
    apply_kernel_tiled_layout,
    from_tiled,
    to_tiled,
)
from openeo_odc_driver_spark.sources.synthetic import synthetic_cube

K = np.array([[0.0, 1.0, 0.0], [1.0, 4.0, 1.0], [0.0, 1.0, 0.0]])


@pytest.fixture(scope="module")
def t8(spark):
    return to_tiled(synthetic_cube(spark), tile=8, n_y=16, n_x=16)


def test_tile_group_count_matches_layout(t8):
    # 2x2 tiles x 3 bands x 24 time steps
    assert _tile_group_count(t8) == 4 * 3 * 24
    n = t8.df.select("band", "time", "tile_row", "tile_col").distinct().count()
    assert n == _tile_group_count(t8)


def test_py_stage_width_is_parallelism_floor(t8, spark):
    dp = spark.sparkContext.defaultParallelism
    # small scene: raster byte sizing abstains, floor = min(dp, groups)
    assert tiled._raster_exchange_width(t8) is None
    assert _py_stage_width(t8) == min(dp, 4 * 3 * 24)


def test_py_stage_width_defers_to_raster_sizing(t8, monkeypatch):
    # at scale the byte sizing must win over the parallelism floor
    monkeypatch.setattr(tiled, "_raster_exchange_width", lambda tc: 512)
    assert _py_stage_width(t8) == 512


def test_kernel_results_invariant_under_stage_width(spark, t8, monkeypatch):
    def run():
        return sorted(
            map(tuple, from_tiled(
                apply_kernel_tiled_layout(t8, K, factor=1.0 / 8.0)
            ).df.collect())
        )

    with_floor = run()
    monkeypatch.setattr(tiled, "_py_stage_width", lambda tc: None)
    without = run()
    assert with_floor == without
