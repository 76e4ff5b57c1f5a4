"""geocode linear mode: hull-masked nearest semantics
(ref sar2cube/geocode.py:79-81,103 — the reference's "linear" computes
nearest values and uses LinearNDInterpolator-over-zeros purely as a
convex-hull NaN mask)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.core.cube import Cube
from openeo_odc_driver_spark.operators.merge import merge_cubes
from openeo_odc_driver_spark.operators.sar import (
    convex_hull,
    geocode,
    points_in_hull,
)
from openeo_odc_driver_spark.sources.synthetic import CubeSpec, synthetic_cube


def test_hull_properties():
    rng = np.random.default_rng(11)
    for _ in range(20):
        pts = rng.uniform(-5, 5, size=(rng.integers(3, 60), 2))
        hull = convex_hull(pts)
        # every input point is inside (or on) its own hull
        assert points_in_hull(pts[:, 0], pts[:, 1], hull).all()
        # hull vertices are input points
        for v in hull:
            assert any(np.all(v == p) for p in pts)
        # a point far outside is outside
        assert not points_in_hull([99.0], [0.0], hull)[0]
    # degenerate: collinear points yield no interior
    line = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    assert len(convex_hull(line)) < 3 or not points_in_hull(
        [5.0], [0.0], convex_hull(line)
    )[0]


def _scatter_cube(spark):
    """LON and LAT from DIFFERENT value patterns (merged disjoint-band
    cubes) — a genuine 2-D scatter, unlike the correlated single-spec
    fixture."""
    lon_c = synthetic_cube(
        spark, CubeSpec(bands=("LON",), n_times=1, ny=8, nx=8, nm=1000003)
    )
    lat_sig = synthetic_cube(
        spark,
        CubeSpec(bands=("LAT", "SIG"), n_times=1, ny=8, nx=8,
                 va=29, vb=31, vc=11, vd=7, nm=1000003),
    )
    return merge_cubes(lon_c, lat_sig)


def test_linear_geocode_matches_numpy_ground_truth(spark):
    cube = _scatter_cube(spark)
    out = geocode(cube, 1.0, 1.0, method="linear").df.collect()
    assert out, "no cells produced"

    # ground truth, computed independently in numpy
    pdf = cube.df.toPandas().pivot_table(
        index=["y", "x"], columns="band", values="value"
    ).reset_index().dropna(subset=["LON", "LAT"])
    pts = pdf[["LON", "LAT"]].to_numpy()
    hull = convex_hull(pts)
    lon0, lat0 = pts[:, 0].min(), pts[:, 1].max()
    order = np.lexsort((pdf["y"].to_numpy(), pdf["x"].to_numpy()))
    sx, sy = pts[order, 0], pts[order, 1]
    sig = pdf["SIG"].to_numpy()[order]

    seen = set()
    for r in out:
        assert r.band == "SIG"
        key = (round(r.y, 9), round(r.x, 9))
        assert key not in seen, "duplicate cell emitted"
        seen.add(key)
        assert points_in_hull([r.x], [r.y], hull)[0], "cell outside hull"
        d = (r.x - sx) ** 2 + (r.y - sy) ** 2
        expect = sig[int(np.argmin(d))]
        if r.value is None:
            assert np.isnan(expect)
        else:
            assert r.value == expect
    # every hull-interior cell of the target grid is present (linear mode
    # fills cells the snap-based `near` path leaves empty)
    cxs = lon0 + 1.0 * np.arange(0, 64)
    cys = lat0 - 1.0 * np.arange(0, 64)
    CX, CY = np.meshgrid(cxs, cys)
    inside = points_in_hull(CX.ravel(), CY.ravel(), hull)
    assert len(seen) == int(inside.sum())


def test_linear_fills_more_than_near(spark):
    cube = _scatter_cube(spark)
    n_near = geocode(cube, 0.5, 0.5, method="near").df.count()
    n_lin = geocode(cube, 0.5, 0.5, method="linear").df.count()
    assert n_lin > n_near  # hull interior ⊋ snapped cells at fine res


def test_unknown_method_raises(spark):
    with pytest.raises(NotImplementedError):
        geocode(_scatter_cube(spark), 1.0, 1.0, method="cubic")
