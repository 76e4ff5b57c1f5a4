"""Driver-side coordinate transforms for query constants.

The reference reprojects bbox corners / geometry vertices from the
request CRS (default EPSG:4326) to the cube CRS with pyproj
(openeo_odc_driver.py:1036-1078, :643-652). pyproj is not in this
container; bbox corners are **query constants**, so a plain-Python
transverse-Mercator forward (Snyder 1987, eqs. 8-9..8-13, WGS84) is all
that's needed — the data path never reprojects per pixel. Accuracy is
sub-centimeter over a UTM zone, and both the engine and the oracle use
this same function so the constants are identical.
"""

from __future__ import annotations

import math

_A = 6378137.0  # WGS84 semi-major
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996


def utm_zone_from_epsg(epsg: str | int) -> tuple[int, bool]:
    """EPSG:326xx → (zone, north=True); EPSG:327xx → south."""
    code = int(str(epsg).split(":")[-1])
    if 32601 <= code <= 32660:
        return code - 32600, True
    if 32701 <= code <= 32760:
        return code - 32700, False
    raise ValueError(f"not a UTM EPSG code: {epsg}")


def wgs84_to_utm(lon: float, lat: float, epsg: str | int) -> tuple[float, float]:
    """Forward transverse Mercator (Snyder 8-9..8-13)."""
    zone, north = utm_zone_from_epsg(epsg)
    lam0 = math.radians(zone * 6 - 183)
    phi = math.radians(lat)
    lam = math.radians(lon)
    sin_p, cos_p, tan_p = math.sin(phi), math.cos(phi), math.tan(phi)
    n = _A / math.sqrt(1 - _E2 * sin_p * sin_p)
    t = tan_p * tan_p
    c = _EP2 * cos_p * cos_p
    a_ = (lam - lam0) * cos_p
    e4, e6 = _E2 * _E2, _E2 * _E2 * _E2
    m = _A * (
        (1 - _E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * _E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )
    easting = (
        _K0
        * n
        * (
            a_
            + (1 - t + c) * a_**3 / 6
            + (5 - 18 * t + t * t + 72 * c - 58 * _EP2) * a_**5 / 120
        )
        + 500000.0
    )
    northing = _K0 * (
        m
        + n
        * tan_p
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a_**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    if not north:
        northing += 10000000.0
    return easting, northing


def wgs84_to_utm_np(lon, lat, epsg: str | int):
    """Forward transverse Mercator (Snyder 8-9..8-13), VECTORIZED over
    numpy arrays — the per-pixel half of the UTM→4326 and UTM→UTM warp
    directions (round 14): each 4326 target center (or intermediate
    lon/lat of a zone-to-zone warp) maps to source-UTM coordinates
    inside the Arrow batch. Same series as the scalar
    :func:`wgs84_to_utm`; agrees with it to the last ulp on scalars
    (identical operations, numpy doubles)."""
    import numpy as np

    zone, north = utm_zone_from_epsg(epsg)
    lam0 = math.radians(zone * 6 - 183)
    phi = np.radians(np.asarray(lat, dtype="float64"))
    lam = np.radians(np.asarray(lon, dtype="float64"))
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sin_p * sin_p)
    t = tan_p * tan_p
    c = _EP2 * cos_p * cos_p
    a_ = (lam - lam0) * cos_p
    e4, e6 = _E2 * _E2, _E2 * _E2 * _E2
    m = _A * (
        (1 - _E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * _E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )
    easting = (
        _K0
        * n
        * (
            a_
            + (1 - t + c) * a_**3 / 6
            + (5 - 18 * t + t * t + 72 * c - 58 * _EP2) * a_**5 / 120
        )
        + 500000.0
    )
    northing = _K0 * (
        m
        + n
        * tan_p
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a_**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    if not north:
        northing = northing + 10000000.0
    return easting, northing


def utm_to_wgs84_np(easting, northing, epsg: str | int):
    """Inverse transverse Mercator (Snyder 1987, eqs. 8-17..8-25,
    WGS84), VECTORIZED over numpy arrays — the per-pixel half of the
    `resample_spatial` projection warp (round 13). The scalar forward
    above handles query constants; the warp needs target-center →
    lon/lat for every output pixel, so this runs inside the Arrow
    batch. Round-trips the forward to <1e-6° (≈9 cm, series truncation
    at extreme latitudes; ≪1 cm at mid-latitudes) — sub-pixel for any
    realistic grid, pytest-pinned."""
    import numpy as np

    zone, north = utm_zone_from_epsg(epsg)
    lam0 = math.radians(zone * 6 - 183)
    x = np.asarray(easting, dtype="float64") - 500000.0
    y = np.asarray(northing, dtype="float64")
    if not north:
        y = y - 10000000.0
    m = y / _K0
    e4, e6 = _E2 * _E2, _E2 * _E2 * _E2
    mu = m / (_A * (1 - _E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = _A / np.sqrt(1 - _E2 * sin1 * sin1)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1 * sin1) ** 1.5
    d = x / (n1 * _K0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1
           - 252 * _EP2 - 3 * c1 * c1) * d**6 / 720
    )
    lam = lam0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1
           + 8 * _EP2 + 24 * t1 * t1) * d**5 / 120
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


# --- Web Mercator (EPSG:3857) -----------------------------------------
# Spherical "Pseudo-Mercator" on the WGS84 semi-major as sphere radius —
# the exact published definition (EPSG 3856/3857: method 1024), not an
# ellipsoidal approximation: x = R·λ, y = R·ln(tan(π/4 + φ/2)).


def wgs84_to_webmerc_np(lon, lat):
    import numpy as np

    lam = np.radians(np.asarray(lon, dtype="float64"))
    phi = np.radians(np.asarray(lat, dtype="float64"))
    return _A * lam, _A * np.log(np.tan(math.pi / 4 + phi / 2))


def webmerc_to_wgs84_np(x, y):
    import numpy as np

    lam = np.asarray(x, dtype="float64") / _A
    phi = 2 * np.arctan(np.exp(np.asarray(y, dtype="float64") / _A)) \
        - math.pi / 2
    return np.degrees(lam), np.degrees(phi)


# --- ETRS89-extended LAEA Europe (EPSG:3035) ---------------------------
# Ellipsoidal Lambert Azimuthal Equal Area (Snyder 1987, eqs. 3-11/3-12
# and 24-27..24-39), GRS80 ellipsoid, center (52°N, 10°E), false origin
# (4321000, 3210000). ETRS89≈WGS84 datum (the reference treats them as
# coincident the same way — ODC hands both to PROJ with no datum shift
# at this accuracy class).
_GRS80_F = 1 / 298.257222101
_GRS80_E2 = _GRS80_F * (2 - _GRS80_F)
_GRS80_E = math.sqrt(_GRS80_E2)
_LAEA_LAT0 = math.radians(52.0)
_LAEA_LON0 = math.radians(10.0)
_LAEA_FE, _LAEA_FN = 4321000.0, 3210000.0


def _laea_q(sin_phi):
    import numpy as np

    e, e2 = _GRS80_E, _GRS80_E2
    return (1 - e2) * (
        sin_phi / (1 - e2 * sin_phi * sin_phi)
        - (1 / (2 * e)) * np.log((1 - e * sin_phi) / (1 + e * sin_phi))
    )


_LAEA_QP = float(_laea_q(1.0))
_LAEA_RQ = _A * math.sqrt(_LAEA_QP / 2)
_LAEA_BETA1 = math.asin(float(_laea_q(math.sin(_LAEA_LAT0))) / _LAEA_QP)
_LAEA_M1 = math.cos(_LAEA_LAT0) / math.sqrt(
    1 - _GRS80_E2 * math.sin(_LAEA_LAT0) ** 2
)
_LAEA_D = _A * _LAEA_M1 / (_LAEA_RQ * math.cos(_LAEA_BETA1))


def wgs84_to_laea_np(lon, lat):
    """Forward ellipsoidal LAEA (Snyder 24-27..24-34), vectorized."""
    import numpy as np

    lam = np.radians(np.asarray(lon, dtype="float64")) - _LAEA_LON0
    phi = np.radians(np.asarray(lat, dtype="float64"))
    beta = np.arcsin(np.clip(_laea_q(np.sin(phi)) / _LAEA_QP, -1, 1))
    sb1, cb1 = math.sin(_LAEA_BETA1), math.cos(_LAEA_BETA1)
    sb, cb = np.sin(beta), np.cos(beta)
    b = _LAEA_RQ * np.sqrt(
        2 / (1 + sb1 * sb + cb1 * cb * np.cos(lam))
    )
    x = b * _LAEA_D * cb * np.sin(lam) + _LAEA_FE
    y = (b / _LAEA_D) * (cb1 * sb - sb1 * cb * np.cos(lam)) + _LAEA_FN
    return x, y


def laea_to_wgs84_np(x, y):
    """Inverse ellipsoidal LAEA (Snyder 24-36..24-39 + series 3-18),
    vectorized. Exact at the projection center (ρ=0 guarded)."""
    import numpy as np

    xr = (np.asarray(x, dtype="float64") - _LAEA_FE) / _LAEA_D
    yr = (np.asarray(y, dtype="float64") - _LAEA_FN) * _LAEA_D
    rho = np.sqrt(xr * xr + yr * yr)
    sb1, cb1 = math.sin(_LAEA_BETA1), math.cos(_LAEA_BETA1)
    with np.errstate(invalid="ignore", divide="ignore"):
        ce = 2 * np.arcsin(np.clip(rho / (2 * _LAEA_RQ), -1, 1))
        sc, cc = np.sin(ce), np.cos(ce)
        qv = _LAEA_QP * (cc * sb1 + np.where(rho == 0, 0.0,
                                             yr * sc * cb1 / rho))
        beta = np.arcsin(np.clip(qv / _LAEA_QP, -1, 1))
        lam = np.arctan2(xr * sc, rho * cb1 * cc - yr * sb1 * sc)
    e2 = _GRS80_E2
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
        + (761 * e6 / 45360) * np.sin(6 * beta)
    )
    lam = np.where(rho == 0, 0.0, lam)
    phi = np.where(rho == 0, _LAEA_LAT0, phi)
    return np.degrees(lam + _LAEA_LON0), np.degrees(phi)


# --- Polar Stereographic variant B (EPSG:3031 / 3413) ------------------
# Snyder 1987 eqs. 15-32..15-39 + series 3-5, WGS84 ellipsoid. 3031 is
# the Antarctic Polar Stereographic (south aspect, standard parallel
# 71°S, λ0=0); 3413 the NSIDC Sea Ice Polar Stereographic North (north
# aspect, standard parallel 70°N, λ0=−45). Both use FE=FN=0.
_WGS_E = math.sqrt(_E2)

_POLAR = {
    3031: {"south": True, "lat_ts": -71.0, "lon0": 0.0},
    3413: {"south": False, "lat_ts": 70.0, "lon0": -45.0},
}


def _polar_t(phi):
    """Snyder 15-9: isometric colatitude factor t(φ) for the NORTH
    aspect (φ in radians, vectorized)."""
    import numpy as np

    e = _WGS_E
    sp = np.sin(phi)
    return (np.tan(math.pi / 4 - phi / 2)
            / ((1 - e * sp) / (1 + e * sp)) ** (e / 2))


def _polar_consts(epsg: int):
    p = _POLAR[epsg]
    phi_f = math.radians(abs(p["lat_ts"]))
    e = _WGS_E
    m_f = math.cos(phi_f) / math.sqrt(1 - _E2 * math.sin(phi_f) ** 2)
    t_f = float(_polar_t(phi_f))
    return p, m_f, t_f


def wgs84_to_polar_np(lon, lat, epsg: int):
    """Forward ellipsoidal polar stereographic variant B, vectorized:
    ρ = a·m_F·t/t_F (true scale at the standard parallel — checked in
    pytest against the parallel's own radius N(φ_F)·cosφ_F), x = ρ·sinθ,
    with the south aspect mapped through the north formulas by negating
    latitude and longitude (Snyder p.161 convention: x east, y north
    toward λ0+180° for south)."""
    import numpy as np

    p, m_f, t_f = _polar_consts(epsg)
    lam = np.radians(np.asarray(lon, dtype="float64")) \
        - math.radians(p["lon0"])
    phi = np.radians(np.asarray(lat, dtype="float64"))
    if p["south"]:
        phi = -phi
        lam = -lam
    t = _polar_t(phi)
    rho = _A * m_f * t / t_f
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)  # north aspect: y axis toward λ0+180
    if p["south"]:
        x, y = -x, -y
    return x, y


def polar_to_wgs84_np(x, y, epsg: int):
    """Inverse (Snyder 15-39 + the 3-5 χ series), vectorized; exact at
    the pole (ρ=0 guarded)."""
    import numpy as np

    p, m_f, t_f = _polar_consts(epsg)
    xr = np.asarray(x, dtype="float64")
    yr = np.asarray(y, dtype="float64")
    if p["south"]:
        xr, yr = -xr, -yr
    rho = np.hypot(xr, yr)
    t = rho * t_f / (_A * m_f)
    chi = math.pi / 2 - 2 * np.arctan(t)
    e2 = _E2
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12) * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240) * np.sin(4 * chi)
        + (7 * e6 / 120) * np.sin(6 * chi)
    )
    with np.errstate(invalid="ignore"):
        lam = np.arctan2(xr, -yr)
    lam = np.where(rho == 0, 0.0, lam)
    if p["south"]:
        phi = -phi
        lam = -lam
    return (np.degrees(lam) + p["lon0"],
            np.degrees(phi))


def _crs_kind(epsg: int) -> str:
    """'geographic' | 'utm' | 'webmerc' | 'laea' — raises ValueError
    for anything the warp cannot transform."""
    if epsg == 4326:
        return "geographic"
    if epsg == 3857:
        return "webmerc"
    if epsg == 3035:
        return "laea"
    if epsg in _POLAR:
        return "polar"
    utm_zone_from_epsg(epsg)  # raises ValueError if not UTM
    return "utm"


def from_lonlat_np(lon, lat, epsg: int):
    kind = _crs_kind(epsg)
    if kind == "geographic":
        return lon, lat
    if kind == "webmerc":
        return wgs84_to_webmerc_np(lon, lat)
    if kind == "laea":
        return wgs84_to_laea_np(lon, lat)
    if kind == "polar":
        return wgs84_to_polar_np(lon, lat, epsg)
    return wgs84_to_utm_np(lon, lat, epsg)


def to_lonlat_np(x, y, epsg: int):
    kind = _crs_kind(epsg)
    if kind == "geographic":
        return x, y
    if kind == "webmerc":
        return webmerc_to_wgs84_np(x, y)
    if kind == "laea":
        return laea_to_wgs84_np(x, y)
    if kind == "polar":
        return polar_to_wgs84_np(x, y, epsg)
    return utm_to_wgs84_np(x, y, epsg)


def make_transforms(src_epsg: int, tgt_epsg: int):
    """(to_target_np, to_source_np) for a validated warp CRS pair —
    shared by the long and tiled warps so the geometry cannot drift
    between tiers. Each transform is vectorized over numpy arrays and
    composes through lon/lat (identity when a side IS 4326); supported
    sides: 4326, UTM zones, Web Mercator 3857, LAEA Europe 3035."""

    def to_target_np(sx, sy):
        lon, lat = to_lonlat_np(sx, sy, src_epsg)
        return from_lonlat_np(lon, lat, tgt_epsg)

    def to_source_np(tx, ty):
        lon, lat = to_lonlat_np(tx, ty, tgt_epsg)
        return from_lonlat_np(lon, lat, src_epsg)

    return to_target_np, to_source_np


def validate_warp_pair(src_epsg, tgt_epsg) -> None:
    """The warp's fail-fast CRS checks (shared by both tiers): each
    side must be 4326, a UTM zone, Web Mercator (3857), LAEA Europe
    (3035), or Polar Stereographic 3031/3413 — and they must differ."""
    if src_epsg is None:
        raise NotImplementedError(
            "projection warp needs an EPSG-coded source CRS"
        )
    if tgt_epsg is None:
        raise NotImplementedError("projection warp needs an EPSG target")
    if src_epsg == tgt_epsg:
        raise ValueError(
            "resample_spatial warp called with projection == source CRS; "
            "the planner routes this to the resolution-only resample"
        )
    for role, code in (("source", src_epsg), ("target", tgt_epsg)):
        try:
            _crs_kind(code)
        except ValueError:
            raise NotImplementedError(
                f"projection warp supports EPSG:4326, UTM zones "
                f"(EPSG:326xx/327xx), Web Mercator (EPSG:3857), "
                f"LAEA Europe (EPSG:3035) and Polar Stereographic "
                f"(EPSG:3031/3413); {role} CRS EPSG:{code} "
                f"is none of these"
            ) from None


def warp_target_lattice(
    to_target_np, sx0: float, sx1: float, sy0: float, sy1: float,
    resx: float, resy: float, res: float,
):
    """The warp's target-lattice constants from the source DATA extent
    (pixel centers): pad by half a source pixel per side, sample a 5×5
    corner/quarter-point lattice through the forward transform, anchor
    on ``res`` multiples covering the envelope. Returns
    (e_c0, n_c0, nyt, nxt) — first pixel CENTER and scene dims."""
    import math

    import numpy as np

    pad_x0, pad_x1 = sx0 - resx / 2, sx1 + resx / 2
    pad_y0, pad_y1 = sy0 - resy / 2, sy1 + resy / 2
    fr = (0.0, 0.25, 0.5, 0.75, 1.0)
    pts_x = np.array([pad_x0 + f * (pad_x1 - pad_x0) for f in fr
                      for _ in fr])
    pts_y = np.array([pad_y0 + f2 * (pad_y1 - pad_y0) for _ in fr
                      for f2 in fr])
    es, ns = to_target_np(pts_x, pts_y)
    e_min = math.floor(float(es.min()) / res) * res
    n_max = math.ceil(float(ns.max()) / res) * res
    nxt = int(math.ceil((float(es.max()) - e_min) / res)) + 1
    nyt = int(math.ceil((n_max - float(ns.min())) / res)) + 1
    return e_min + res / 2, n_max - res / 2, nyt, nxt


def bbox_to_cube_crs(
    west: float, east: float, south: float, north: float, cube_crs: str
) -> tuple[float, float, float, float]:
    """Reproject the 4 bbox corners and take the envelope — exactly the
    reference's corner-transform-then-slice (openeo_odc_driver.py:1040-1060)."""
    corners = [
        wgs84_to_utm(lon, lat, cube_crs)
        for lon in (west, east)
        for lat in (south, north)
    ]
    xs = [p[0] for p in corners]
    ys = [p[1] for p in corners]
    return min(xs), max(xs), min(ys), max(ys)
