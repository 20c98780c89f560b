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
    "UTM_FALSE_EASTING",
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
# The reference projects through GeoTools' ellipsoidal Krüger series
# (SpatialDimensionalityTypeProvider.java:130-224); no projection library
# exists in this container, and the ellipsoidal series needs sinh/cosh/atanh
# DuckDB lacks, so the published SPHERICAL form is used — the same
# zone-centered conformal-cylinder shape, every step replayable bit-for-bit
# in DuckDB (ln/tan/cos/sin/atan are plain libm in both engines).  Within a
# UTM zone (|lon-lon0| <= 3 deg) the spherical/ellipsoidal easting disagree
# by < 0.1% — fine for indexing/binning, documented for geodesy users.

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
