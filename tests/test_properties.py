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


def _morton_py(ix: int, iy: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((ix >> i) & 1) << (2 * i)
        z |= ((iy >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(st.integers(0, 2**15 - 1), st.integers(0, 2**15 - 1)),
        min_size=1, max_size=40, unique=True,
    )
)
@settings(max_examples=50, deadline=None)
def test_morton_key_python_model_is_bijective(pairs):
    """The Z-order key is injective (distinct cells → distinct keys) and
    invertible by bit de-interleave — the property file-level pruning
    relies on (two cells sharing a key would merge their footprints)."""
    keys = [_morton_py(x, y) for x, y in pairs]
    assert len(set(keys)) == len(pairs)
    for (x, y), z in zip(pairs, keys):
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (rx, ry) == (x, y)


def test_morton_spark_matches_python_model(spark):
    from pyspark.sql import functions as F

    from openeo_odc_driver_spark.sinks.zorder import zorder_key

    df = spark.sql(
        "SELECT xi, yi FROM range(16) tx(xi), range(16) ty(yi)"
    ).select("xi", "yi", zorder_key(F.col("xi"), F.col("yi")).alias("z"))
    for r in df.collect():
        assert r.z == _morton_py(r.xi, r.yi)


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=4),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_cdc_chunks_tile_every_document(spark, tokens):
    """CDC chunks partition the token range exactly — no token dropped,
    none double-assigned — for arbitrary token streams (including
    shorter than the fingerprint window)."""
    from openeo_odc_driver_spark.pipeline.text import cdc_chunk_documents

    text = " ".join(tokens)
    docs = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sorted(cdc_chunk_documents(docs).collect(), key=lambda r: r.chunk_idx)
    assert out[0].chunk_start == 1
    for a, b in zip(out, out[1:]):
        assert b.chunk_start == a.chunk_start + a.n_chunk_tokens
    assert out[-1].chunk_start + out[-1].n_chunk_tokens - 1 == len(tokens)


# --- fit_curve robustness on sparse / NaN-heavy / noisy series (r6) ---------
#
# Divergence policy vs the reference (openeo_odc_driver.py:1531-1536):
# the reference drops y == 0 samples (masked pixels arrive as literal
# zeros in its xarray path) and returns [0,0,0] below 12 samples; this
# engine's mask operator produces NULL→NaN, so NaN is the missing-data
# sentinel, 0.0 is a VALID observation, and the guard is
# < max(2·n_params, 2) finite samples → zero coefficients. Same
# degenerate-pixel contract (all-zero coefficients), different sentinel
# and threshold — documented in operators/curve.py's module docstring.

from openeo_odc_driver_spark.operators.curve import _fit_pixel  # noqa: E402


def _fit(t, v, model):
    return _fit_pixel(
        np.asarray(t, dtype=float),
        np.asarray(v, dtype=float),
        model,
        _basis_functions(model),
    )


@given(
    n_finite=st.integers(0, 5),
    n_nan=st.integers(0, 20),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_fit_pixel_sparse_guard_returns_zeros(n_finite, n_nan, data):
    """Fewer than 2·n_params finite samples (harmonic: 6) → exactly the
    zero vector, however the NaNs are interleaved."""
    vals = data.draw(
        st.lists(st.floats(-1e3, 1e3, allow_nan=False),
                 min_size=n_finite, max_size=n_finite)
    )
    v = vals + [float("nan")] * n_nan
    order = data.draw(st.permutations(range(len(v))))
    v = [v[i] for i in order]
    t = np.arange(len(v), dtype=float) * 13.0
    out = _fit(t, v, harmonic_model())
    assert out.shape == (3,) and np.all(out == 0.0)


@given(
    p=st.lists(st.floats(-50, 50, allow_nan=False), min_size=3, max_size=3),
    day_set=st.sets(st.integers(0, 730), min_size=8, max_size=24),
    n_nan=st.integers(0, 10),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_fit_pixel_recovers_harmonic_through_nans(p, day_set, n_nan, seed):
    """Exact-harmonic data with NaN holes: the fitted model must
    reproduce every FINITE observation (residual ~0 — predictions are
    conditioning-independent even when coefficients aren't), and NaNs
    must not perturb the fit (fit == fit on the compacted series)."""
    model = harmonic_model()
    t_clean = np.asarray(sorted(day_set), dtype=float)
    v_clean = model(t_clean, np.asarray(p))
    rng = np.random.default_rng(seed)
    t = t_clean.copy()
    v = v_clean.copy()
    for _ in range(n_nan):  # punch NaN holes at random positions
        idx = rng.integers(0, len(v))
        v[idx] = np.nan
    if np.isfinite(v).sum() < 6:
        return  # guard case, covered above
    coef = _fit(t, v, model)
    ok = np.isfinite(v)
    pred = model(t[ok], coef)
    scale = max(1.0, np.abs(v[ok]).max())
    assert np.all(np.abs(pred - v[ok]) <= 1e-6 * scale)
    coef_compacted = _fit(t[ok], v[ok], model)
    assert np.allclose(coef, coef_compacted, rtol=0, atol=0)


@given(
    vals=st.lists(
        st.floats(-1e12, 1e12, allow_nan=False, allow_infinity=False),
        min_size=6, max_size=30,
    ),
)
@settings(max_examples=60, deadline=None)
def test_fit_pixel_noisy_series_stays_finite(vals):
    """Arbitrary (adversarially large) observations: coefficients must
    come back finite — no NaN/inf escapes into the params cube, on both
    the linear-basis path and the Gauss-Newton path."""
    t = np.arange(len(vals), dtype=float) * 31.0
    lin = _fit(t, vals, harmonic_model())
    assert np.all(np.isfinite(lin))
    # nonlinear-in-params model forces the Gauss-Newton branch
    from openeo_odc_driver_spark.operators import curve as C

    nonlin = ModelExpr("mul", (C.param(0), ModelExpr("sin", (
        ModelExpr("mul", (C.param(1), C.tvar())),))))
    assert _basis_functions(nonlin) is None
    gn = _fit_pixel(t, np.asarray(vals, dtype=float), nonlin, None)
    assert np.all(np.isfinite(gn))
