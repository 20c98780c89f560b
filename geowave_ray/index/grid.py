"""Equal-angle grid cell scheme (SQL-replicable binning).

The engine's stand-in for the reference's H3/S2/geohash spatial binning
facade (``core/geotime/.../binning/SpatialBinningType.java:15-63`` — the
h3/s2 python libraries are not available in this environment): cells are an
nx x ny equal-angle lat/lon grid at a power-of-two resolution.  Chosen
deliberately so every binned aggregation has an exact ANSI-SQL oracle
(floor arithmetic), unlike the Hilbert cell ids.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GridScheme", "grid_cell_sql"]


class GridScheme:
    """cell = cell_y * nx + cell_x over [-180,180] x [-90,90]."""

    def __init__(self, level: int = 6):
        self.level = level
        self.nx = 1 << level  # longitude bins
        self.ny = 1 << max(level - 1, 0)  # latitude bins (half as many)
        self.dx = 360.0 / self.nx
        self.dy = 180.0 / self.ny

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        cx = np.clip(
            np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / self.dx),
            0,
            self.nx - 1,
        ).astype(np.int64)
        cy = np.clip(
            np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / self.dy),
            0,
            self.ny - 1,
        ).astype(np.int64)
        return cy * self.nx + cx

    def cells_for_box(
        self, minx: float, miny: float, maxx: float, maxy: float
    ) -> np.ndarray:
        cx0 = int(np.clip(np.floor((minx + 180.0) / self.dx), 0, self.nx - 1))
        cx1 = int(np.clip(np.floor((maxx + 180.0) / self.dx), 0, self.nx - 1))
        cy0 = int(np.clip(np.floor((miny + 90.0) / self.dy), 0, self.ny - 1))
        cy1 = int(np.clip(np.floor((maxy + 90.0) / self.dy), 0, self.ny - 1))
        cys, cxs = np.mgrid[cy0 : cy1 + 1, cx0 : cx1 + 1]
        return (cys * self.nx + cxs).ravel()

    def cell_bounds(self, cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        cell = np.asarray(cell, dtype=np.int64)
        cx = cell % self.nx
        cy = cell // self.nx
        return (
            cx * self.dx - 180.0,
            cy * self.dy - 90.0,
            (cx + 1) * self.dx - 180.0,
            (cy + 1) * self.dy - 90.0,
        )

    def grid_disk(self, cell: int, k: int = 1) -> np.ndarray:
        """Cell + its ring-k neighborhood (kNN search expansion; clamped at
        poles, wrapped across the antimeridian)."""
        cx = cell % self.nx
        cy = cell // self.nx
        out = []
        for dy in range(-k, k + 1):
            y = cy + dy
            if y < 0 or y >= self.ny:
                continue
            for dx in range(-k, k + 1):
                x = (cx + dx) % self.nx
                out.append(y * self.nx + x)
        return np.array(sorted(set(out)), dtype=np.int64)


def grid_cell_sql(level: int, lon_expr: str, lat_expr: str) -> str:
    """The exact SQL mirror of ``GridScheme.cell_of`` for the DuckDB oracle."""
    nx = 1 << level
    ny = 1 << max(level - 1, 0)
    dx = 360.0 / nx
    dy = 180.0 / ny
    cx = f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) / {dx}) AS BIGINT), 0), {nx - 1})"
    cy = f"LEAST(GREATEST(CAST(FLOOR((({lat_expr}) + 90.0) / {dy}) AS BIGINT), 0), {ny - 1})"
    return f"({cy} * {nx} + {cx})"
