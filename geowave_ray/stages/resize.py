"""Raster tile-resize job: re-tile a stored pyramid to a new tile size /
tier.

Reference: RasterTileResizeJobRunner (extensions/adapters/raster/.../resize/
RasterTileResizeJobRunner.java; Spark RasterTileResizeSparkRunner) — map:
split/regroup source tiles by target cell, reduce: merge fragments into the
target tile.

Ray-Data shape: a flat_map-style map_batches slices each source tile into
the target cells it overlaps (pure NumPy slicing), then one
groupby(target tier, cell) merge assembles target tiles (later fragments
fill background pixels, as the mosaic merge does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.tiered import spatial_strategy

__all__ = ["retile"]


class _Slicer:
    def __init__(self, src_tile_size: int, dst_tier: int, dst_tile_size: int, max_bits: int = 31):
        self.strategy = spatial_strategy(max_bits)
        self.src_ts = src_tile_size
        self.dst_tier = dst_tier
        self.dst_ts = dst_tile_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        tiers_all = batch.column("tier").to_numpy(zero_copy_only=False)
        if (
            len(batch)
            and self.dst_ts == 2 * self.src_ts
            and (tiers_all == self.dst_tier + 1).all()
        ):
            return self._halving_fast_path(batch)
        return self._general(batch)

    def _halving_fast_path(self, batch: pa.Table) -> pa.Table:
        """Vectorized canonical halving re-tile (dst tier = src tier - 1,
        dst tile = 2x src tile): tier-(t-1) cells nest tier-t cells, so
        every source tile lands whole in ONE quadrant of one target tile —
        a pure pixel-block copy, no per-tile cover search.  Produces the
        same fragments as the general path (verified by the parity test in
        tests/test_pyramid.py) with one stacked NumPy scatter per batch.

        Cell coordinates come from the EXACT integer Hilbert decode, not a
        geographic round-trip: boundary-rule cells (a point at lat -90
        lands in grid row 15 of 64, whose lon/lat box lies outside the
        physical latitude range) would have their decoded midpoint clamped
        by normalize() into the neighboring row, silently reparenting the
        tile (caught by the sf0.1 oracle diff; tests/test_pyramid.py::
        test_retile_boundary_cell_parent pins the rule)."""
        ts, dts = self.src_ts, self.dst_ts
        n = len(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        tier = self.dst_tier + 1
        xy = self.strategy.curve(tier).decode(cells.astype(np.uint64))
        ccx = xy[0].astype(np.int64)
        ccy = xy[1].astype(np.int64)
        qx = ccx & 1
        qy = ccy & 1
        dst_cells = self.strategy.curve(self.dst_tier).encode(
            [(ccx >> 1).astype(np.uint64), (ccy >> 1).astype(np.uint64)]
        )
        nb = ts * ts * 3
        from .tiles import _stack_tiles

        src = _stack_tiles(batch.column("tile"), nb).reshape(n, ts, ts, 3)
        frags = np.zeros((n, dts, dts, 3), dtype=np.uint8)
        # dst row block: qy=1 (upper half-extent) -> rows [0, ts); qy=0 ->
        # rows [ts, 2ts).  dst col block: qx*ts.
        for ry in (0, 1):
            for rx in (0, 1):
                m = (qy == ry) & (qx == rx)
                if m.any():
                    rr = (1 - ry) * ts
                    cc = rx * ts
                    frags[np.flatnonzero(m), rr : rr + ts, cc : cc + ts] = src[m]
        ids_col = (
            batch.column("image_id")
            if "image_id" in batch.column_names
            else pa.array(["?"] * n)
        )
        dnb = dts * dts * 3
        offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int64) * dnb).tobytes())
        tile_col = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n, [None, offsets, pa.py_buffer(frags.tobytes())]
        )
        return pa.table(
            {
                "tier": pa.array(np.full(n, self.dst_tier, dtype=np.uint8)),
                "cell": pa.array(dst_cells.astype(np.uint64), type=pa.uint64()),
                "image_id": ids_col,
                "tile": tile_col,
            }
        )

    def _general(self, batch: pa.Table) -> pa.Table:
        out_cell, out_frag, out_ids = [], [], []
        tiers = batch.column("tier").to_numpy(zero_copy_only=False)
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        tiles = batch.column("tile").to_pylist()
        ids = batch.column("image_id").to_pylist() if "image_id" in batch.column_names else ["?"] * len(batch)
        for i in range(len(batch)):
            src = np.frombuffer(tiles[i], dtype=np.uint8).reshape(self.src_ts, self.src_ts, 3)
            (sx0, sx1), (sy0, sy1) = [
                (lo[0], hi[0])
                for lo, hi in zip(
                    *self.strategy.decode_cells(int(tiers[i]), np.asarray([cells[i]], dtype=np.uint64))
                )
            ]
            # covering target cells — EXACT integer cover (tiers nest by
            # powers of two, so the dst cells of a src cell are a bit-shift
            # range; the old geographic bbox cover misplaced boundary-rule
            # cells whose box lies outside the physical axis range)
            tcells = _cover_int(self.strategy, int(tiers[i]), int(cells[i]), self.dst_tier)
            for tc in tcells:
                (tx0, tx1), (ty0, ty1) = [
                    (lo[0], hi[0])
                    for lo, hi in zip(
                        *self.strategy.decode_cells(self.dst_tier, np.asarray([tc], dtype=np.uint64))
                    )
                ]
                # sample target pixel centers from the source tile
                px = tx0 + (np.arange(self.dst_ts) + 0.5) * (tx1 - tx0) / self.dst_ts
                py = ty1 - (np.arange(self.dst_ts) + 0.5) * (ty1 - ty0) / self.dst_ts
                sx = np.floor((px - sx0) / (sx1 - sx0) * self.src_ts).astype(np.int64)
                sy = np.floor((sy1 - py) / (sy1 - sy0) * self.src_ts).astype(np.int64)
                okx = (sx >= 0) & (sx < self.src_ts)
                oky = (sy >= 0) & (sy < self.src_ts)
                frag = np.zeros((self.dst_ts, self.dst_ts, 3), dtype=np.uint8)
                if okx.any() and oky.any():
                    frag[np.ix_(oky, okx)] = src[sy[oky][:, None], sx[okx][None, :]]
                out_cell.append(int(tc))
                out_frag.append(frag.tobytes())
                out_ids.append(ids[i])
        return pa.table(
            {
                "tier": pa.array(np.full(len(out_cell), self.dst_tier, dtype=np.uint8)),
                "cell": pa.array(np.asarray(out_cell, dtype=np.uint64), type=pa.uint64()),
                "image_id": pa.array(out_ids),
                "tile": pa.array(out_frag, type=pa.large_binary()),
            }
        )


def _cover_int(strategy, src_tier: int, src_cell: int, dst_tier: int) -> np.ndarray:
    """Dst-tier cells covering one src-tier cell, in exact integer cell
    space (tier grids nest by powers of two: coarser dst -> the single
    bit-shifted parent; finer dst -> the full shifted child block)."""
    if dst_tier <= 0:
        return np.zeros(1, np.uint64)
    xy = strategy.curve(src_tier).decode(np.asarray([src_cell], dtype=np.uint64))
    x, y = int(xy[0][0]), int(xy[1][0])
    shift = src_tier - dst_tier
    if shift >= 0:
        xs = np.asarray([x >> shift], dtype=np.uint64)
        ys = np.asarray([y >> shift], dtype=np.uint64)
    else:
        s = -shift
        xs = np.arange(x << s, (x + 1) << s, dtype=np.uint64)
        ys = np.arange(y << s, (y + 1) << s, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys)
    return strategy.curve(dst_tier).encode([gx.ravel(), gy.ravel()])


def retile(
    tiles_ds,
    src_tile_size: int,
    dst_tier: int,
    dst_tile_size: int = 256,
    max_bits: int = 31,
):
    """(tier, cell, tile) Dataset -> re-tiled at dst_tier/dst_tile_size."""
    from .tiles import MosaicMerger
    from .util import stage_fn

    frags = tiles_ds.map_batches(
        stage_fn(
            _Slicer,
            src_tile_size=src_tile_size,
            dst_tier=dst_tier,
            dst_tile_size=dst_tile_size,
            max_bits=max_bits,
        ),
        batch_format="pyarrow",
    )
    return frags.groupby(["tier", "cell"]).map_groups(
        MosaicMerger(tile_size=dst_tile_size), batch_format="pyarrow"
    )
