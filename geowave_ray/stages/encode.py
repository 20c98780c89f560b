"""Cell-encoding stages: the Ray-Data "ingest key generation" step.

The reference's write path (BaseDataStoreUtils.getWriteInfo ->
TieredSFCIndexStrategy.getInsertionIds, SURVEY.md §3.1) becomes a stateless
vectorized ``map_batches`` transform producing plain Arrow columns
``(tier: uint8, cell: uint64)`` — no byte keys, no row duplication for
points (points always land on the finest tier).

All classes are map_batches callables: strategy construction happens once
per worker in ``__init__`` (curve lookup tables etc.), per-batch work is
pure NumPy over zero-copy Arrow columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.grid import GridScheme
from ..index.tiered import spatial_strategy

__all__ = ["CellEncoder", "GridCellEncoder", "BoxCellExpander", "salt_cells"]


class CellEncoder:
    """Adds (tier, cell) from point lon/lat via the tiered Hilbert strategy.
    ``strategy`` overrides the default EPSG:4326 geometry (e.g. a
    custom_crs_strategy over projected axes)."""

    def __init__(self, bits: int = 31, lon_col: str = "lon", lat_col: str = "lat", strategy=None):
        self.strategy = strategy if strategy is not None else spatial_strategy(bits)
        self.bits = self.strategy.finest_tier
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        cells = self.strategy.encode_points(lon, lat)
        batch = batch.append_column(
            "tier", pa.array(np.full(len(batch), self.bits, dtype=np.uint8))
        )
        return batch.append_column("cell", pa.array(cells, type=pa.uint64()))


class GridCellEncoder:
    """Adds an equal-angle grid ``cell`` column (SQL-replicable binning)."""

    def __init__(self, level: int = 6, lon_col: str = "lon", lat_col: str = "lat", out_col: str = "cell"):
        self.scheme = GridScheme(level)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            self.out_col, pa.array(self.scheme.cell_of(lon, lat), type=pa.int64())
        )


class BoxCellExpander:
    """flat_map-style map_batches: one output row per (entry, covering grid
    cell) for bbox rows — the polygon side of the shuffle join.  Mirrors the
    reference join's reprojection of geometries to cells
    (TieredSpatialJoin.reprojectToTier, :471-511)."""

    def __init__(self, level: int = 6, keep_cols: tuple = ("zone_id", "wkb")):
        self.scheme = GridScheme(level)
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        scheme = self.scheme
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        cx0 = np.clip(np.floor((minx + 180.0) / scheme.dx), 0, scheme.nx - 1).astype(np.int64)
        cx1 = np.clip(np.floor((maxx + 180.0) / scheme.dx), 0, scheme.nx - 1).astype(np.int64)
        cy0 = np.clip(np.floor((miny + 90.0) / scheme.dy), 0, scheme.ny - 1).astype(np.int64)
        cy1 = np.clip(np.floor((maxy + 90.0) / scheme.dy), 0, scheme.ny - 1).astype(np.int64)
        spans = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        total = int(spans.sum())
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), spans)
        r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(spans) - spans, spans)
        wx = (cx1 - cx0 + 1)[rows]
        gx = cx0[rows] + r % wx
        gy = cy0[rows] + r // wx
        cell = gy * scheme.nx + gx
        out = batch.select(list(self.keep_cols)).take(pa.array(rows))
        return out.append_column("cell", pa.array(cell, type=pa.int64()))


def salt_cells(
    cell: np.ndarray, row_hash: np.ndarray, hot_cells: dict[int, int]
) -> np.ndarray:
    """Explicit hot-cell salting (north rule; reference analog:
    HashKeyIndexStrategy partition salting, core/index/.../simple/
    HashKeyIndexStrategy.java:20-80).  Cells in ``hot_cells`` are split into
    ``n_salt`` subkeys: salted = cell * 64 + (hash % n_salt); cold cells map
    to cell * 64.  Callers replicate the small side to all salts."""
    cell = np.asarray(cell, dtype=np.int64)
    out = cell * 64
    if hot_cells:
        hot_ids = np.array(sorted(hot_cells), dtype=np.int64)
        salts = np.array([hot_cells[c] for c in sorted(hot_cells)], dtype=np.int64)
        pos = np.searchsorted(hot_ids, cell)
        pos = np.clip(pos, 0, len(hot_ids) - 1)
        is_hot = hot_ids[pos] == cell
        out[is_hot] += (row_hash[is_hot] % salts[pos[is_hot]]).astype(np.int64)
    return out
