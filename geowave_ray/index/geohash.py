"""Geohash cell scheme — pure base-32 bit interleaving, no library.

Reference: ``core/geotime/.../binning/GeohashBinningHelper.java`` (geohash
as one of the reference's spatial binning cell schemes, alongside H3/S2).
The algorithm is Niemeyer's public geohash: alternate lon/lat bisection
bits MSB-first (lon takes the even bit positions), 5 bits per base-32
character over the alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.

Everything here is vectorized NumPy and — unlike H3/S2 — exactly
SQL-replayable: ``geohash_cell_sql`` emits the same clamp + interleave +
base-32 mapping as a DuckDB expression, so binned aggregates over geohash
cells get a full hash oracle (same discipline as ``grid_cell_sql``).
"""

from __future__ import annotations

from functools import reduce

import numpy as np

__all__ = ["geohash_ints", "geohash_strings", "geohash_bounds", "geohash_cell_sql", "geohash_from_xy", "geohash_xy_sql"]

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_ARR = np.array(list(ALPHABET))


def _bit_counts(precision: int) -> tuple[int, int, int]:
    nbits = 5 * precision
    nlon = (nbits + 1) // 2  # lon owns the even (MSB-first) positions
    nlat = nbits // 2
    return nbits, nlon, nlat


def geohash_ints(lon: np.ndarray, lat: np.ndarray, precision: int = 5) -> np.ndarray:
    """Integer geohash (the 5*precision interleaved bits, MSB-aligned at
    bit 5*precision-1).  int64 for precision <= 12."""
    nbits, nlon, nlat = _bit_counts(precision)
    x = np.clip(
        np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * (1 << nlon)),
        0,
        (1 << nlon) - 1,
    ).astype(np.int64)
    y = np.clip(
        np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * (1 << nlat)),
        0,
        (1 << nlat) - 1,
    ).astype(np.int64)
    h = np.zeros(len(x), dtype=np.int64)
    for j in range(nbits):  # j = 0 is the hash MSB
        if j % 2 == 0:
            src, sb = x, nlon - 1 - (j // 2)
        else:
            src, sb = y, nlat - 1 - (j // 2)
        h = (h << 1) | ((src >> sb) & 1)
    return h


def geohash_strings(lon: np.ndarray, lat: np.ndarray, precision: int = 5) -> np.ndarray:
    """Base-32 geohash strings (the interoperable external cell id)."""
    h = geohash_ints(lon, lat, precision)
    parts = [
        _ALPHA_ARR[(h >> (5 * (precision - 1 - i))) & 31] for i in range(precision)
    ]
    return reduce(np.char.add, parts)


def geohash_bounds(gh: str) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of one geohash string (test helper)."""
    precision = len(gh)
    nbits, nlon, nlat = _bit_counts(precision)
    h = 0
    for ch in gh:
        h = (h << 5) | ALPHABET.index(ch)
    x = y = 0
    for j in range(nbits):
        bit = (h >> (nbits - 1 - j)) & 1
        if j % 2 == 0:
            x = (x << 1) | bit
        else:
            y = (y << 1) | bit
    dx, dy = 360.0 / (1 << nlon), 180.0 / (1 << nlat)
    return (x * dx - 180.0, y * dy - 90.0, (x + 1) * dx - 180.0, (y + 1) * dy - 90.0)


def geohash_cell_sql(precision: int, lon_expr: str, lat_expr: str) -> str:
    """DuckDB expression computing the SAME geohash string — the oracle
    mirror of ``geohash_strings`` (clamp, floor, MSB-first interleave,
    base-32)."""
    nbits, nlon, nlat = _bit_counts(precision)
    x = (
        f"CAST(LEAST(GREATEST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {1 << nlon}),"
        f" 0), {(1 << nlon) - 1}) AS BIGINT)"
    )
    y = (
        f"CAST(LEAST(GREATEST(FLOOR((({lat_expr}) + 90.0) / 180.0 * {1 << nlat}),"
        f" 0), {(1 << nlat) - 1}) AS BIGINT)"
    )
    terms = []
    for j in range(nbits):
        if j % 2 == 0:
            src, sb = "gx", nlon - 1 - (j // 2)
        else:
            src, sb = "gy", nlat - 1 - (j // 2)
        terms.append(f"((({src} >> {sb}) & 1) << {nbits - 1 - j})")
    h = " | ".join(terms)
    chars = [
        f"substr('{ALPHABET}', CAST((gh >> {5 * (precision - 1 - i)}) & 31 AS INT) + 1, 1)"
        for i in range(precision)
    ]
    concat = " || ".join(chars)
    # nested scalar subquery aliases keep the expression readable/one-pass
    return (
        f"(SELECT {concat} FROM (SELECT ({h}) AS gh FROM "
        f"(SELECT {x} AS gx, {y} AS gy)))"
    )


def geohash_from_xy(x: np.ndarray, y: np.ndarray, precision: int = 5) -> np.ndarray:
    """Base-32 geohash strings from INTEGER cell coordinates (x in
    [0, 2^nlon), y in [0, 2^nlat)) — the re-encode half of the public
    neighbor algorithm (decode to cells, offset, re-encode)."""
    nbits, nlon, nlat = _bit_counts(precision)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    h = np.zeros(len(x), dtype=np.int64)
    for j in range(nbits):
        if j % 2 == 0:
            src, sb = x, nlon - 1 - (j // 2)
        else:
            src, sb = y, nlat - 1 - (j // 2)
        h = (h << 1) | ((src >> sb) & 1)
    parts = [
        _ALPHA_ARR[(h >> (5 * (precision - 1 - i))) & 31] for i in range(precision)
    ]
    return reduce(np.char.add, parts)


def geohash_xy_sql(precision: int, x_expr: str, y_expr: str) -> str:
    """DuckDB expression mirroring ``geohash_from_xy`` for integer cell
    columns (correlated scalar subquery, same shape as
    ``geohash_cell_sql``)."""
    nbits, nlon, nlat = _bit_counts(precision)
    terms = []
    for j in range(nbits):
        if j % 2 == 0:
            src, sb = "qx", nlon - 1 - (j // 2)
        else:
            src, sb = "qy", nlat - 1 - (j // 2)
        terms.append(f"((({src} >> {sb}) & 1) << {nbits - 1 - j})")
    h = " | ".join(terms)
    chars = [
        f"substr('{ALPHABET}', CAST((gh >> {5 * (precision - 1 - i)}) & 31 AS INT) + 1, 1)"
        for i in range(precision)
    ]
    concat = " || ".join(chars)
    return (
        f"(SELECT {concat} FROM (SELECT ({h}) AS gh FROM "
        f"(SELECT ({x_expr}) AS qx, ({y_expr}) AS qy)))"
    )
