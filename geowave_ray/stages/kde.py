"""Kernel density estimation -> raster heatmap tiles.

Reference: MapReduce KDE (analytics/mapreduce/.../kde/GaussianCellMapper.java:
34-140 — each point splats a gaussian into cells at zoom levels
min..max (default 1..25); CellSummationReducer sums weights; KDEReducer
emits percentile-normalized tiles; Spark variant KDERunner).

Ray-Data shape: splat is a flat_map-style ``map_batches`` emitting
(level, cell, weight) partials pre-summed per batch, the wide step is one
``groupby((level, cell)).sum`` over partial aggregates (tiny rows — weights
only, never points), and tile rendering is a per-(level, tile) group map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.grid import GridScheme

__all__ = ["kde_cells", "render_kde_tiles"]


def _gauss_kernel(radius: int) -> np.ndarray:
    ax = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2 * (radius / 2.0 + 1e-9) ** 2))
    return k / k.sum()


def _binomial_kernel(radius: int) -> np.ndarray:
    """Integer binomial (Pascal-row) kernel — the gaussian's integer-exact
    approximation, so distributed partial sums are bit-exact and the
    DuckDB oracle can hash-match the splat output."""
    from math import comb

    row = np.array([comb(2 * radius, j) for j in range(2 * radius + 1)], dtype=np.int64)
    return row[:, None] * row[None, :]


def kde_cells(points_ds, levels=(4, 8), radius: int = 2, weight_col: str | None = None, kernel: str = "gauss"):
    """points -> Dataset of (level, cell, weight) kernel-splat sums.

    Splats each point's kernel into the (2r+1)^2 neighborhood at each grid
    level, pre-summing per batch before the groupby.  ``kernel="binomial"``
    uses integer Pascal-row weights (exact distributed sums; SQL-oracle
    matchable); "gauss" is the float gaussian of the reference KDE.
    """
    integer = kernel == "binomial"
    kernel = _binomial_kernel(radius) if integer else _gauss_kernel(radius)
    offsets = [(dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)]

    def splat(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        w0 = (
            batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
            if weight_col
            else np.ones(len(lon))
        )
        out_lv, out_cell, out_w = [], [], []
        for level in range(levels[0], levels[1] + 1):
            scheme = GridScheme(level)
            cx = np.clip(((lon + 180.0) / scheme.dx).astype(np.int64), 0, scheme.nx - 1)
            cy = np.clip(((lat + 90.0) / scheme.dy).astype(np.int64), 0, scheme.ny - 1)
            for dy, dx in offsets:
                gx = (cx + dx) % scheme.nx
                gy = cy + dy
                ok = (gy >= 0) & (gy < scheme.ny)
                cells = gy[ok] * scheme.nx + gx[ok]
                wts = w0[ok] * kernel[dy + radius, dx + radius]
                # pre-sum within the batch
                uc, inv = np.unique(cells, return_inverse=True)
                sums = np.bincount(inv, weights=wts)
                if integer:
                    sums = sums.astype(np.int64)
                out_lv.append(np.full(len(uc), level, dtype=np.int32))
                out_cell.append(uc)
                out_w.append(sums)
        return pa.table(
            {
                "level": pa.array(np.concatenate(out_lv)),
                "cell": pa.array(np.concatenate(out_cell), type=pa.int64()),
                "weight": pa.array(np.concatenate(out_w)),
            }
        )

    splat.__name__ = "kde_splat"
    partials = points_ds.map_batches(splat, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    # native vectorized final merge (no per-cell Python callable)
    return partials.groupby(["level", "cell"]).aggregate(
        Sum("weight", alias_name="weight")
    )


def render_kde_tiles(kde_ds, level: int, tile_cells: int = 64):
    """(level, cell, weight) -> per-tile percentile-normalized uint8 rasters
    (KDEReducer analog).  Tile = a tile_cells x tile_cells block of grid
    cells; normalization is global-max per level (cheap single pass)."""
    scheme = GridScheme(level)

    def to_tiles(batch: pa.Table) -> pa.Table:
        sel = batch.filter(
            pa.compute.equal(batch.column("level"), pa.scalar(level, type=batch.schema.field("level").type))
        )
        cell = sel.column("cell").to_numpy(zero_copy_only=False)
        cx = cell % scheme.nx
        cy = cell // scheme.nx
        tx = cx // tile_cells
        ty = cy // tile_cells
        out = sel.append_column("tile_id", pa.array(ty * (scheme.nx // tile_cells + 1) + tx))
        return out

    to_tiles.__name__ = "kde_tile_assign"
    tiled = kde_ds.map_batches(to_tiles, batch_format="pyarrow")

    def render(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        w = group.column("weight").to_numpy(zero_copy_only=False)
        cx = (cell % scheme.nx) % tile_cells
        cy = (cell // scheme.nx) % tile_cells
        img = np.zeros((tile_cells, tile_cells), dtype=np.float64)
        img[cy, cx] = w
        mx = img.max() or 1.0
        raster = (img / mx * 255).astype(np.uint8)
        return pa.table(
            {
                "level": group.column("level").slice(0, 1),
                "tile_id": group.column("tile_id").slice(0, 1),
                "raster": pa.array([raster.tobytes()], type=pa.large_binary()),
                "max_weight": pa.array([float(mx)]),
            }
        )

    render.__name__ = "kde_render"
    return tiled.groupby("tile_id").map_groups(render, batch_format="pyarrow")
