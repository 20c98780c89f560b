"""Web-Mercator (EPSG:3857) closed-form projection — pure NumPy.

The reference decodes arbitrary EPSG CRSs through GeoTools and indexes in
projected coordinates (``SpatialDimensionalityTypeProvider.java:130-224``);
this container has no projection library, but EPSG:3857 — the CRS every
web-tile stack indexes in — is two closed-form formulas on the spherical
earth (public spec: OGC 07-057r7 / EPSG guidance note 7-2):

    x = R * lon_rad
    y = R * ln(tan(pi/4 + lat_rad / 2))

with R = 6378137.0 (WGS84 semi-major axis).  Both directions are exactly
SQL-replayable (DuckDB has radians/ln/tan/exp/atan), so custom-CRS
indexing over mercator coordinates carries a DuckDB oracle end to end
(the ``mercator_cells`` query).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "R_MAJOR",
    "MERC_MAX",
    "MAX_LAT",
    "mercator_forward",
    "mercator_inverse",
    "web_mercator_strategy",
    "utm_zone",
    "utm_lon0",
    "tm_forward",
    "tm_inverse",
    "tm_forward_ell",
    "tm_inverse_ell",
    "UTM_FALSE_EASTING",
    "UTM_K0",
    "TM_A",
    "TM_ALPHA",
    "TM_BETA",
    "WGS84_E",
    "WGS84_E2",
    "WGS84_F",
]

R_MAJOR = 6378137.0
MERC_MAX = R_MAJOR * np.pi  # 20037508.342789244 — x at lon=180
# latitude where |y| == MERC_MAX (the square world cut every tile scheme uses)
MAX_LAT = float(np.degrees(2.0 * np.arctan(np.exp(np.pi)) - np.pi / 2.0))


def mercator_forward(lon_deg, lat_deg):
    """(lon, lat) degrees -> (x, y) EPSG:3857 meters.  Latitudes must be
    strictly inside (-90, 90); callers clip to ±MAX_LAT for the square
    world."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = R_MAJOR * np.radians(lon)
    y = R_MAJOR * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_inverse(x, y):
    """(x, y) EPSG:3857 meters -> (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MAJOR)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MAJOR)) - np.pi / 2.0)
    return lon, lat


# --------------------------------------------------- transverse Mercator / UTM
# Spherical transverse Mercator, closed form (Snyder, "Map Projections — A
# Working Manual", USGS PP 1395, eqs. 8-1..8-6 — public):
#   B = cos(lat) * sin(lon - lon0)
#   x = R/2 * ln((1+B)/(1-B))          (= R * atanh(B))
#   y = R * atan(tan(lat) / cos(lon - lon0))
# Kept as the cheap small-angle form (and the f=0 limit the ellipsoidal
# implementation reduces to); UTM indexing itself uses the ellipsoidal
# Karney series below, which matches the reference's GeoTools Krüger path
# (SpatialDimensionalityTypeProvider.java:130-224).

UTM_FALSE_EASTING = 500_000.0


def utm_zone(lon_deg) -> np.ndarray:
    """UTM zone number 1..60 (zone 1 = [-180, -174))."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    z = np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


def utm_zone_lon0(zone) -> np.ndarray:
    """Central meridian of a UTM zone, degrees."""
    return np.asarray(zone, dtype=np.float64) * 6.0 - 183.0


# back-compat alias used in docstrings/tests
utm_lon0 = utm_zone_lon0


def tm_forward(lon_deg, lat_deg, lon0_deg):
    """(lon, lat) degrees -> transverse-Mercator (x, y) meters about the
    central meridian ``lon0_deg`` (no false easting/northing)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    B = np.cos(lat) * np.sin(dlon)
    x = R_MAJOR / 2.0 * np.log((1.0 + B) / (1.0 - B))
    y = R_MAJOR * np.arctan(np.tan(lat) / np.cos(dlon))
    return x, y


def tm_inverse(x, y, lon0_deg):
    """Inverse spherical transverse Mercator (Snyder eqs. 8-6..8-8)."""
    x = np.asarray(x, dtype=np.float64) / R_MAJOR
    y = np.asarray(y, dtype=np.float64) / R_MAJOR
    D = y
    lat = np.degrees(np.arcsin(np.sin(D) / np.cosh(x)))
    lon = lon0_deg + np.degrees(np.arctan2(np.sinh(x), np.cos(D)))
    return lon, lat


def web_mercator_strategy(
    bits: int = 31,
    tiers: list[int] | None = None,
    curve_type: str = "hilbert",
):
    """Custom-CRS tiered strategy over the square web-mercator world
    ([-MERC_MAX, MERC_MAX] on both axes) — the reference's projected-CRS
    index shape with REAL reprojection: callers project lon/lat through
    ``mercator_forward`` and index/query in meters.  x does not wrap:
    EPSG:3857's square world is bounded (tile schemes do not cross the
    antimeridian within one world copy)."""
    from .tiered import custom_crs_strategy

    return custom_crs_strategy(
        (-MERC_MAX, MERC_MAX),
        (-MERC_MAX, MERC_MAX),
        bits=bits,
        tiers=tiers,
        curve_type=curve_type,
    )


# ------------------------------------------ ellipsoidal transverse Mercator
# WGS84 ellipsoidal transverse Mercator via the Krüger flattening series in
# Karney's exact-to-nanometers formulation ("Transverse Mercator with an
# accuracy of a few nanometers", Karney 2011, arXiv:1002.1417 — public;
# same series GeoTools evaluates for the reference's projected-CRS path,
# SpatialDimensionalityTypeProvider.java:130-224).  The hyperbolic helpers
# are composed from exp/ln EXACTLY as the SQL oracle writes them (DuckDB
# has no sinh/cosh/atanh/asinh), so the full chain — conformal latitude,
# Gauss-Schreiber angles, 6th-order alpha series — stays bit-replayable.

WGS84_F = 1.0 / 298.257223563
_TM_N = WGS84_F / (2.0 - WGS84_F)
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = float(np.sqrt(WGS84_E2))
UTM_K0 = 0.9996


def _tm_rect_radius(n: float) -> float:
    return R_MAJOR / (1.0 + n) * (1.0 + n * n / 4.0 + n**4 / 64.0 + n**6 / 256.0)


def _tm_alpha(n: float) -> tuple[float, ...]:
    """Forward (alpha) Krüger coefficients to 6th order in n (Karney 2011
    eq. 35)."""
    return (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    )


def _tm_beta(n: float) -> tuple[float, ...]:
    """Inverse (beta) Krüger coefficients to 6th order in n (Karney 2011
    eq. 36)."""
    return (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    )


TM_A = _tm_rect_radius(_TM_N)  # WGS84 rectifying radius, 6367449.1458...
TM_ALPHA = _tm_alpha(_TM_N)
TM_BETA = _tm_beta(_TM_N)


# exp/ln compositions shared verbatim with the SQL oracle (NOT np.sinh etc.,
# so both engines execute the identical float64 operation sequence)
def _sinh(z):
    return (np.exp(z) - np.exp(-z)) / 2.0


def _cosh(z):
    return (np.exp(z) + np.exp(-z)) / 2.0


def _atanh(z):
    return 0.5 * np.log((1.0 + z) / (1.0 - z))


def _asinh(z):
    return np.log(z + np.sqrt(z * z + 1.0))


def tm_forward_ell(lon_deg, lat_deg, lon0_deg, k0: float = UTM_K0):
    """(lon, lat) degrees -> ellipsoidal transverse-Mercator (x, y) meters
    about ``lon0_deg`` (no false easting; central-meridian scale ``k0``).
    Valid for |lat| < 90 and |lon - lon0| well inside (-90, 90) — the UTM
    regime.  Karney 2011 eqs. 7-11."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dl = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    e = WGS84_E
    sphi = np.sin(phi)
    tau = np.tan(phi)
    sigma = _sinh(e * _atanh(e * sphi))
    taup = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(1.0 + tau * tau)
    cosl = np.cos(dl)
    sinl = np.sin(dl)
    xip = np.arctan2(taup, cosl)
    etap = _asinh(sinl / np.sqrt(taup * taup + cosl * cosl))
    xi = xip
    eta = etap
    for j, a in enumerate(TM_ALPHA, start=1):
        xi = xi + a * np.sin(2.0 * j * xip) * _cosh(2.0 * j * etap)
        eta = eta + a * np.cos(2.0 * j * xip) * _sinh(2.0 * j * etap)
    return k0 * TM_A * eta, k0 * TM_A * xi


def tm_inverse_ell(x, y, lon0_deg, k0: float = UTM_K0):
    """Inverse ellipsoidal transverse Mercator (Karney 2011 eqs. 19-23 +
    the Newton solve of eq. 7 for tau).  Engine-side only (queries bin on
    the forward direction); round-trips tm_forward_ell to < 1e-9 deg."""
    xi = np.asarray(y, dtype=np.float64) / (k0 * TM_A)
    eta = np.asarray(x, dtype=np.float64) / (k0 * TM_A)
    xip = xi
    etap = eta
    for j, b in enumerate(TM_BETA, start=1):
        xip = xip - b * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        etap = etap - b * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    se = _sinh(etap)
    cx = np.cos(xip)
    taup = np.sin(xip) / np.sqrt(se * se + cx * cx)
    lam = np.arctan2(se, cx)
    # Newton: solve taup(tau) = taup for tau (Karney eq. 7/appendix)
    e = WGS84_E
    e2m = 1.0 - WGS84_E2
    tau = taup / e2m  # first guess overshoots conformal shrink
    for _ in range(5):
        sigma = _sinh(e * _atanh(e * tau / np.sqrt(1.0 + tau * tau)))
        taupa = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(1.0 + tau * tau)
        dtau = (
            (taup - taupa)
            * (1.0 + e2m * tau * tau)
            / (e2m * np.sqrt((1.0 + taupa * taupa) * (1.0 + tau * tau)))
        )
        tau = tau + dtau
    return (
        np.degrees(lam) + lon0_deg,
        np.degrees(np.arctan(tau)),
    )
