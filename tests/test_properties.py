"""Property-based tests (hypothesis) for the pure kernels that back the
Spark operators — the reference has no property testing at all
(SURVEY §5). These run at numpy speed, no SparkSession per example.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from openeo_odc_driver_spark.functions.geometry import is_convex
from openeo_odc_driver_spark.functions.proj import wgs84_to_utm
from openeo_odc_driver_spark.operators.curve import (
    ModelExpr,
    _basis_functions,
    harmonic_model,
    linear_model,
)
from openeo_odc_driver_spark.operators.filters import _ray_cast_contains

finite = st.floats(-1e3, 1e3, allow_nan=False)


@given(
    a0=finite, a1=finite,
    ts=st.lists(st.floats(0, 1000, allow_nan=False), min_size=1, max_size=20),
)
def test_linear_model_matches_closed_form(a0, a1, ts):
    t = np.asarray(ts)
    got = linear_model()(t, np.array([a0, a1]))
    expect = a0 + a1 * t
    assert np.allclose(got, expect, rtol=1e-12, atol=1e-9)


@given(
    p=st.lists(st.floats(-10, 10, allow_nan=False), min_size=3, max_size=3),
    ts=st.lists(st.floats(0, 2000, allow_nan=False), min_size=1, max_size=10),
)
def test_harmonic_model_is_linear_in_params(p, ts):
    """The basis detector must recognize harmonic regression as linear in
    its parameters and reconstruct it exactly from the bases."""
    m = harmonic_model()
    bases = _basis_functions(m)
    assert bases is not None
    t = np.asarray(ts)
    via_bases = sum(p[i] * bases[i](t) for i in range(3))
    assert np.allclose(via_bases, m(t, np.asarray(p)), rtol=1e-9, atol=1e-9)


@given(
    cx=st.floats(-100, 100, allow_nan=False),
    cy=st.floats(-100, 100, allow_nan=False),
    r=st.floats(1.0, 50.0, allow_nan=False),
    n=st.integers(3, 12),
    px=st.floats(-200, 200, allow_nan=False),
    py=st.floats(-200, 200, allow_nan=False),
)
def test_raycast_agrees_with_convex_halfplanes(cx, cy, r, n, px, py):
    """On random convex (regular) polygons, the general ray-cast and the
    convex half-plane test agree for points clearly off the boundary."""
    poly = [
        (cx + r * math.cos(2 * math.pi * k / n),
         cy + r * math.sin(2 * math.pi * k / n))
        for k in range(n)
    ]
    assert is_convex(poly)
    # half-plane test (CCW)
    inside_hp = all(
        (poly[(i + 1) % n][0] - poly[i][0]) * (py - poly[i][1])
        - (poly[(i + 1) % n][1] - poly[i][1]) * (px - poly[i][0])
        >= 0
        for i in range(n)
    )
    # skip points within epsilon of an edge (boundary conventions differ)
    d_edge = min(
        abs(
            (poly[(i + 1) % n][0] - poly[i][0]) * (py - poly[i][1])
            - (poly[(i + 1) % n][1] - poly[i][1]) * (px - poly[i][0])
        )
        for i in range(n)
    )
    if d_edge < 1e-6:
        return
    inside_rc = bool(_ray_cast_contains(np.array([px]), np.array([py]), poly)[0])
    assert inside_rc == inside_hp


@given(
    lon=st.floats(6.01, 11.99, allow_nan=False),
    lat=st.floats(-79.9, 79.9, allow_nan=False),
)
def test_utm_forward_properties(lon, lat):
    """Zone 32 (6°..12°E): easting inside the legal band, monotone in lon,
    northing monotone in lat, central meridian maps to 500 km."""
    e, n_ = wgs84_to_utm(lon, lat, "EPSG:32632")
    assert 100_000 < e < 900_000
    e2, _ = wgs84_to_utm(min(lon + 0.01, 11.999), lat, "EPSG:32632")
    if lon + 0.01 < 12:
        assert e2 > e
    _, n2 = wgs84_to_utm(lon, lat + 0.01, "EPSG:32632")
    assert n2 > n_
    e_cm, _ = wgs84_to_utm(9.0, lat, "EPSG:32632")
    assert abs(e_cm - 500_000) < 1e-6


@settings(max_examples=25)
@given(
    vals=st.lists(
        st.floats(-6, 6, allow_nan=False).map(lambda v: round(v * 8) / 8),
        min_size=2,
        max_size=30,
    )
)
def test_sd_formula_matches_two_pass(vals):
    """The exact-sums stddev formula (reducers.sd_expr's math) equals the
    numerically-stable two-pass result on dyadic inputs."""
    a = np.asarray(vals, dtype="float64")
    n = len(a)
    s, ss = a.sum(), (a * a).sum()
    ours = math.sqrt(max((ss - s * s / n) / (n - 1), 0.0))
    ref = a.std(ddof=1)
    assert abs(ours - ref) < 1e-9
