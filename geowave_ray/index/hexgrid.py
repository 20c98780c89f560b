"""Hexagonal cell scheme — flat-top axial hex binning, pure NumPy.

The reference's H3 binning (``core/geotime/.../binning/H3BinningHelper.java``)
assigns points to hexagonal cells; the h3 library (icosahedral aperture-7
on the sphere) is not available in this container, so this provides the
hexagonal-binning SEMANTICS users pick H3 for — uniform hex neighborhoods,
6-adjacency, ~equal-area bins away from the poles — on the equal-angle
lon/lat plane, where (same discipline as GridScheme/geohash/S2) every step
is exactly SQL-replayable: axial projection, floor(x+0.5) rounding and the
cube-coordinate fix-up are plain double arithmetic a DuckDB oracle mirrors
bit-for-bit.

Flat-top axial coordinates with circumradius ``size`` degrees (public
hex-grid math, e.g. Red Blob Games' axial/cube reference):
  q = (2/3 * lon) / size
  r = (-1/3 * lon + sqrt(3)/3 * lat) / size
rounded via cube coordinates (x=q, z=r, y=-x-z) by largest-error fix-up.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HexScheme", "hex_cells", "hex_cell_cte"]


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — deterministic and identical in NumPy and DuckDB
    (np.round / SQL ROUND differ on half-way ties: banker's vs away-from-
    zero, so neither is used)."""
    return np.floor(x + 0.5)


def hex_cells(
    lon: np.ndarray, lat: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) hex cell of each point, int64."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    fq = (2.0 / 3.0 * x) / size
    fr = (-1.0 / 3.0 * x + np.sqrt(3.0) / 3.0 * y) / size
    fy = -fq - fr
    rq = _round_half_up(fq)
    ry = _round_half_up(fy)
    rr = _round_half_up(fr)
    dq = np.abs(rq - fq)
    dy = np.abs(ry - fy)
    dr = np.abs(rr - fr)
    # cube fix-up: recompute the coordinate with the largest rounding error
    # (standard cube_round rule incl. its tie-breaks: q when dq > dy and
    # dq > dr; else y when dy > dr — discarding y leaves (rq, rr); else r)
    fix_q = (dq > dy) & (dq > dr)
    fix_r = ~fix_q & (dr >= dy)
    q = np.where(fix_q, -ry - rr, rq)
    r = np.where(fix_r, -q - ry, rr)
    return q.astype(np.int64), r.astype(np.int64)


class HexScheme:
    """CellScheme facade: ``cell_of`` returns a single int64 id packing
    (q, r) as (q + 2**20) * 2**21 + (r + 2**20) — collision-free for any
    |q|,|r| < 2**20 (size >= 0.001 deg covers the globe comfortably)."""

    OFF = 1 << 20
    MUL = 1 << 21

    def __init__(self, size: float = 1.0):
        self.size = float(size)

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        q, r = hex_cells(lon, lat, self.size)
        return (q + self.OFF) * self.MUL + (r + self.OFF)

    def neighbors(self, q: int, r: int) -> list[tuple[int, int]]:
        """The 6 axial neighbors (hex adjacency — the property square
        grids lack)."""
        return [
            (q + 1, r), (q - 1, r), (q, r + 1),
            (q, r - 1), (q + 1, r - 1), (q - 1, r + 1),
        ]

    def center(self, q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Inverse: cell center lon/lat (flat-top axial to plane)."""
        q = np.asarray(q, dtype=np.float64)
        r = np.asarray(r, dtype=np.float64)
        lon = self.size * 1.5 * q
        lat = self.size * np.sqrt(3.0) * (r + q / 2.0)
        return lon, lat


def hex_cell_cte(size: float, pts_sql: str, id_cols: str = "image_id") -> str:
    """WITH-chain mapping `pts_sql` rows (lon, lat, `id_cols`, v_cents) to
    hex_q / hex_r (BIGINT) — the exact DuckDB mirror of ``hex_cells``."""
    return f"""
hxpts AS ({pts_sql}),
hxf AS (
  SELECT {id_cols}, v_cents,
         (2.0 / 3.0 * lon) / {size!r} AS fq,
         (-1.0 / 3.0 * lon + sqrt(3.0) / 3.0 * lat) / {size!r} AS fr
  FROM hxpts
),
hxr AS (
  SELECT {id_cols}, v_cents, fq, fr, -fq - fr AS fy,
         FLOOR(fq + 0.5) AS rq, FLOOR(-fq - fr + 0.5) AS ry,
         FLOOR(fr + 0.5) AS rr
  FROM hxf
),
hxfix AS (
  SELECT {id_cols}, v_cents, fy,
         abs(rq - fq) AS dq, abs(ry - fy) AS dy, abs(rr - fr) AS dr,
         rq, ry, rr
  FROM hxr
),
hxq AS (
  SELECT {id_cols}, v_cents, dy, dr, ry, rr,
         CASE WHEN dq > dy AND dq > dr THEN -ry - rr ELSE rq END AS q,
         (dq > dy AND dq > dr) AS fixed_q
  FROM hxfix
),
hxcells AS (
  SELECT {id_cols}, v_cents,
         CAST(q AS BIGINT) AS hex_q,
         CAST(CASE WHEN NOT fixed_q AND dr >= dy THEN -q - ry ELSE rr END
              AS BIGINT) AS hex_r
  FROM hxq
)""".strip()
