"""Raster pyramid build: level-up tiles by 2x2 mean-pooling child tiles.

Reference analog: GeoWave materializes a full tile pyramid per raster
coverage (RasterDataAdapter ``buildPyramid``; resize analog
``RasterTileResizeJobRunner``,
analytics/mapreduce/.../resize/RasterTileResizeJobRunner.java) so queries
at any zoom read one level.

Shuffle shape: a naive build is one all-to-all per level.  Instead, tiles
group ONCE per *ladder* of ``L`` levels under their level-``L`` ancestor
key ``(tx >> L, ty >> L)``; each group assembles its ``2^L t x 2^L t``
subtree canvas and pools it down locally, emitting every intermediate
level's tiles — so an ``n``-level pyramid costs ``ceil(n/L)`` shuffles,
not ``n``.  Group payload is ``4^L`` tiles (L=3, 256px tiles => ~4 MB) —
bounded and independent of corpus size; at scale the subtree-key space is
huge, so parallelism is preserved.  Mean-pool is integer ``sum // 4``
(exactly replayable in SQL); missing children fill with ``fill`` — the
NoData convention of ``tiles.MosaicMerger``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .imaging import decode_image, encode_image

__all__ = ["build_pyramid", "pool2x2"]


def pool2x2(arr: np.ndarray) -> np.ndarray:
    """Integer floor-mean 2x2 pooling of an (h, w) uint8/int array."""
    h, w = arr.shape
    a = arr.astype(np.int64).reshape(h // 2, 2, w // 2, 2)
    return (a.sum(axis=(1, 3)) // 4).astype(np.uint8)


def _block_sums(img: np.ndarray, t: int) -> np.ndarray:
    """(gh, gw) int64 sums of t x t blocks of ``img``."""
    h, w = img.shape
    return img.astype(np.int64).reshape(h // t, t, w // t, t).sum(axis=(1, 3))


class _SubPyramid:
    """Group callable: one subtree's tiles -> per-level checksum rows
    (+ optionally the subtree's top tile payload for the next ladder)."""

    __name__ = "pyramid_subtree"

    def __init__(
        self,
        tile: int,
        fmt: str,
        bytes_col: str,
        fill: int,
        levels: int,
        base_level: int,
        emit_base_sums: bool,
        emit_payload: bool,
    ):
        self.tile = tile
        self.fmt = fmt
        self.bytes_col = bytes_col
        self.fill = fill
        self.levels = levels
        self.base_level = base_level
        self.emit_base_sums = emit_base_sums
        self.emit_payload = emit_payload

    def __call__(self, group: pa.Table) -> pa.Table:
        t, L = self.tile, self.levels
        side = (1 << L) * t
        canvas = np.full((side, side), self.fill, dtype=np.uint8)
        txs = group.column("tx").to_numpy(zero_copy_only=False)
        tys = group.column("ty").to_numpy(zero_copy_only=False)
        blobs = group.column(self.bytes_col).to_pylist()
        mask = (1 << L) - 1
        lv, otx, oty, sums = [], [], [], []
        for i in range(len(blobs)):
            px = decode_image(blobs[i]).squeeze(axis=-1)
            canvas[
                (tys[i] & mask) * t : ((tys[i] & mask) + 1) * t,
                (txs[i] & mask) * t : ((txs[i] & mask) + 1) * t,
            ] = px
            if self.emit_base_sums:
                # base sums come from PRESENT tiles only — fill-padded
                # subtree cells are absent at level 0, present (as fill)
                # in every pooled parent
                lv.append(self.base_level)
                otx.append(int(txs[i]))
                oty.append(int(tys[i]))
                sums.append(int(px.astype(np.int64).sum()))
        stx, sty = int(txs[0]) >> L, int(tys[0]) >> L  # subtree key

        def emit(level_rel: int, img: np.ndarray) -> None:
            grid = 1 << (L - level_rel)
            bs = _block_sums(img, t)
            for by in range(grid):
                for bx in range(grid):
                    lv.append(self.base_level + level_rel)
                    otx.append(stx * grid + bx)
                    oty.append(sty * grid + by)
                    sums.append(int(bs[by, bx]))

        cur = canvas
        for level_rel in range(1, L + 1):
            cur = pool2x2(cur)
            emit(level_rel, cur)

        payload = [None] * len(lv)
        if self.emit_payload:
            lv.append(-1)
            otx.append(stx)
            oty.append(sty)
            sums.append(0)
            payload.append(encode_image(cur[:, :, None], self.fmt))
        return pa.table(
            {
                "level": pa.array(lv, type=pa.int64()),
                "tx": pa.array(otx, type=pa.int64()),
                "ty": pa.array(oty, type=pa.int64()),
                "pix_sum": pa.array(sums, type=pa.int64()),
                self.bytes_col: pa.array(payload, type=pa.binary()),
            }
        )


def build_pyramid(
    ds,
    n_levels: int,
    tile: int = 16,
    fmt: str = "png",
    bytes_col: str = "png",
    fill: int = 0,
    levels_per_shuffle: int | None = None,
):
    """From level-0 tiles ``(tx, ty, <bytes_col>)`` build ``n_levels``
    parent levels; returns a Dataset of per-level tile checksums
    ``(level, tx, ty, pix_sum)`` for levels 0..n_levels.  One shuffle per
    ladder of ``levels_per_shuffle`` levels (default: all in one)."""
    lps = levels_per_shuffle or n_levels
    bc = bytes_col

    def drop_payload(batch: pa.Table) -> pa.Table:
        keep = pa.compute.greater_equal(batch.column("level"), 0)
        return batch.filter(keep).select(["level", "tx", "ty", "pix_sum"])

    drop_payload.__name__ = "pyramid_sums_only"

    def take_payload(batch: pa.Table) -> pa.Table:
        keep = pa.compute.less(batch.column("level"), 0)
        return batch.filter(keep).select(["tx", "ty", bc])

    take_payload.__name__ = "pyramid_next_ladder"

    outs = []
    cur = ds
    done = 0
    while done < n_levels:
        L = min(lps, n_levels - done)
        last = done + L >= n_levels

        def skey(batch: pa.Table, _L=L) -> pa.Table:
            tx = batch.column("tx").to_numpy(zero_copy_only=False)
            ty = batch.column("ty").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "skey", pa.array((tx >> _L) * (1 << 32) + (ty >> _L), type=pa.int64())
            )

        skey.__name__ = "pyramid_subtree_key"
        g = (
            cur.map_batches(skey, batch_format="pyarrow")
            .groupby("skey")
            .map_groups(
                _SubPyramid(
                    tile, fmt, bc, fill,
                    levels=L, base_level=done,
                    emit_base_sums=done == 0, emit_payload=not last,
                ),
                batch_format="pyarrow",
            )
        )
        if not last:
            g = g.materialize()  # the ladder's level write; two consumers
            cur = g.map_batches(take_payload, batch_format="pyarrow")
        outs.append(g.map_batches(drop_payload, batch_format="pyarrow"))
        done += L

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
