"""Raster <-> vector tiling: pyramid level selection, tile assignment,
per-cell warp, mosaic merge.

Reference semantics (extensions/adapters/raster/.../RasterDataAdapter.java):
- level selection (:495-534): per tier, ratio = max over dims of
  (cell extent / (envelope extent * tileSize / pixels)); pick the tier whose
  max-ratio is the largest value <= 1+eps (the "full resolution" level);
  with build_pyramid, every coarser tier is also produced.
- tile cut (:596-810): for each covering SFC cell at the chosen level, warp
  the source pixels into an exactly tileSize^2 tile over the cell extent
  (nearest-neighbor here; PSNR>=40 tolerance covers resampler choice).
- mosaic merge (adapter/merge/NoDataMergeStrategy.java): tiles sharing a
  cell merge, later tiles filling background pixels.

Ray-Data shape: assignment is a vectorized flat_map-style map_batches
(no image decode needed — pure envelope arithmetic); the warp stage is an
actor-pool map_batches that decodes/resamples; mosaic is
groupby(tier,cell).map_groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.tiered import spatial_strategy
from .imaging import decode_image, psnr, resample_nearest  # noqa: F401 (psnr re-export)

__all__ = ["TileAssigner", "TileWarper", "MosaicMerger", "mosaic_merge", "select_levels"]

EPS = 1e-9


def select_levels(
    extent_lon: np.ndarray,
    extent_lat: np.ndarray,
    px_w: np.ndarray,
    px_h: np.ndarray,
    tile_size: int = 256,
    max_bits: int = 31,
) -> np.ndarray:
    """Vectorized full-resolution pyramid level (tier bits) per image.

    tile_range_d = extent_d * tile_size / pixels_d; cell range at tier t is
    360/2^t in both dims (half-range latitude); ratio_t = max_d(cell/tile_range)
    decreases with t, so the floorEntry(1+eps) rule selects the smallest t
    with ratio <= 1+eps.
    """
    tr_lon = np.asarray(extent_lon, dtype=np.float64) * tile_size / np.maximum(px_w, 1)
    tr_lat = np.asarray(extent_lat, dtype=np.float64) * tile_size / np.maximum(px_h, 1)
    # smallest t with 360/2^t <= tr*(1+eps)  ->  t >= log2(360/tr)
    with np.errstate(divide="ignore"):
        t_lon = np.ceil(np.log2(360.0 / np.maximum(tr_lon, 1e-300)) - EPS)
        t_lat = np.ceil(np.log2(360.0 / np.maximum(tr_lat, 1e-300)) - EPS)
    t = np.maximum(t_lon, t_lat)
    return np.clip(t, 0, max_bits).astype(np.uint8)


class TileAssigner:
    """map_batches: image rows -> one row per (image, tier, cell) covering
    the image footprint at its full-resolution pyramid level (optionally the
    whole coarser pyramid).  Pure arithmetic — ``bytes`` are not read and
    should not be in the batch (select columns upstream)."""

    def __init__(
        self,
        tile_size: int = 256,
        max_bits: int = 31,
        pixel_res_deg: float = 1e-4,
        build_pyramid: bool = False,
        min_pyramid_bits: int | None = None,
        keep_cols: tuple = ("image_id",),
        res_col: str | None = None,
    ):
        self.strategy = spatial_strategy(max_bits)
        self.tile_size = tile_size
        self.max_bits = max_bits
        self.pixel_res_deg = pixel_res_deg
        self.build_pyramid = build_pyramid
        self.min_pyramid_bits = min_pyramid_bits if min_pyramid_bits is not None else 0
        self.keep_cols = list(keep_cols)
        self.res_col = res_col  # per-image ground resolution override

    def _res(self, batch: pa.Table) -> np.ndarray:
        if self.res_col is not None and self.res_col in batch.column_names:
            return batch.column(self.res_col).to_numpy(zero_copy_only=False)
        return np.full(len(batch), self.pixel_res_deg)

    def _envelope(self, batch: pa.Table):
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.float64)
        res = self._res(batch)
        ext_lon = w * res
        ext_lat = h * res
        minx = np.clip(lon, -180, 180)
        maxx = np.clip(lon + ext_lon, -180, 180)
        miny = np.clip(lat - ext_lat, -90, 90)
        maxy = np.clip(lat, -90, 90)
        return minx, miny, maxx, maxy, w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        minx, miny, maxx, maxy, w, h = self._envelope(batch)
        # level from the UNCLIPPED pixel extent: clamping at world bounds
        # (poles/antimeridian) must not change the sample resolution
        res = self._res(batch)
        levels = select_levels(
            w * res,
            h * res,
            w,
            h,
            self.tile_size,
            self.max_bits,
        )
        out_rows, out_tiers, out_cells = [], [], []
        for t in np.unique(levels):
            mask = levels == t
            idx = np.nonzero(mask)[0]
            tiers = [int(t)]
            if self.build_pyramid:
                tiers = list(range(self.min_pyramid_bits, int(t) + 1))
            for tier in tiers:
                rows, cells = self._cover_at_tier(
                    tier, minx[idx], miny[idx], maxx[idx], maxy[idx]
                )
                out_rows.append(idx[rows])
                out_tiers.append(np.full(len(rows), tier, dtype=np.uint8))
                out_cells.append(cells)
        rows = np.concatenate(out_rows) if out_rows else np.zeros(0, np.int64)
        out = batch.select(self.keep_cols).take(pa.array(rows))
        out = out.append_column("tier", pa.array(np.concatenate(out_tiers) if out_tiers else np.zeros(0, np.uint8)))
        return out.append_column(
            "cell",
            pa.array(
                np.concatenate(out_cells) if out_cells else np.zeros(0, np.uint64),
                type=pa.uint64(),
            ),
        )

    def _cover_at_tier(self, tier, minx, miny, maxx, maxy):
        """All covering cells at a fixed tier (insertion edge rules), like a
        single-tier SFC strategy's getInsertionIds."""
        from ..index.dimensions import norm_to_cell_max, norm_to_cell_min

        strat = self.strategy
        bins = 1 << tier
        n = len(minx)
        lo = [strat.dims[0].normalize(minx), strat.dims[1].normalize(miny)]
        hi = [strat.dims[0].normalize(maxx), strat.dims[1].normalize(maxy)]
        cmin = [norm_to_cell_min(lo[j], bins) for j in range(2)]
        cmax = [np.maximum(norm_to_cell_max(hi[j], bins), cmin[j]) for j in range(2)]
        ext = [(cmax[j] - cmin[j] + np.uint64(1)).astype(np.int64) for j in range(2)]
        count = ext[0] * ext[1]
        total = int(count.sum())
        rep = np.repeat(np.arange(n, dtype=np.int64), count)
        r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(count) - count, count)
        coords = []
        rr = r
        for j in range(2):
            e = ext[j][rep]
            coords.append(cmin[j][rep] + (rr % e).astype(np.uint64))
            rr = rr // e
        cells = strat.curve(tier).encode(coords) if tier > 0 else np.zeros(total, np.uint64)
        return rep, cells


class TileWarper:
    """Actor-pool map_batches: joined (image row + tier + cell) -> rendered
    tileSize^2 RGB tile bytes for that cell.  Decode state is per-actor.

    ``resample`` selects the warp kernel: "nearest" (the checksum-parity
    default) or "bilinear" — the reference raster adapter's default
    interpolation (RasterDataAdapter.java:596-810 warps through
    Interpolation.INTERP_BILINEAR unless the adapter overrides it).
    Bilinear is separable over the axis-aligned warp, so it costs four
    row/col-indexed gathers + two lerps, no per-pixel loop.  The valid
    footprint (which tile pixels come from the image vs background) is
    identical for both kernels."""

    _RESAMPLERS = ("nearest", "bilinear")

    def __init__(self, tile_size: int = 256, pixel_res_deg: float = 1e-4, max_bits: int = 31, background: int = 0,
                 resample: str = "nearest"):
        if resample not in self._RESAMPLERS:
            raise ValueError(f"resample must be one of {self._RESAMPLERS}, got {resample!r}")
        self.strategy = spatial_strategy(max_bits)
        self.tile_size = tile_size
        self.pixel_res_deg = pixel_res_deg
        self.background = background
        self.resample = resample

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = self.tile_size
        out_tiles = []
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        tiers = batch.column("tier").to_numpy(zero_copy_only=False)
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        blobs = batch.column("bytes").to_pylist()
        for i in range(len(batch)):
            arr = decode_image(blobs[i])
            h_px, w_px = arr.shape[:2]
            # image envelope: [lon, lon+w*res] x [lat-h*res, lat]
            ix0 = lon[i]
            ix1 = lon[i] + w_px * self.pixel_res_deg
            iy1 = lat[i]
            iy0 = lat[i] - h_px * self.pixel_res_deg
            (cx0, cx1), (cy0, cy1) = [
                (lo[0], hi[0])
                for lo, hi in zip(
                    *self.strategy.decode_cells(
                        int(tiers[i]), np.asarray([cells[i]], dtype=np.uint64)
                    )
                )
            ]
            tile = np.full((ts, ts, 3), self.background, dtype=np.uint8)
            # map each tile pixel center to a source pixel (nearest)
            px = cx0 + (np.arange(ts) + 0.5) * (cx1 - cx0) / ts
            py = cy1 - (np.arange(ts) + 0.5) * (cy1 - cy0) / ts  # row 0 = north
            sx = np.floor((px - ix0) / self.pixel_res_deg).astype(np.int64)
            sy = np.floor((iy1 - py) / self.pixel_res_deg).astype(np.int64)
            okx = (sx >= 0) & (sx < w_px)
            oky = (sy >= 0) & (sy < h_px)
            if okx.any() and oky.any():
                if self.resample == "bilinear":
                    # fractional source coords at tile pixel centers
                    # (pixel-center convention: sample k covers [k, k+1))
                    fx = (px[okx] - ix0) / self.pixel_res_deg - 0.5
                    fy = (iy1 - py[oky]) / self.pixel_res_deg - 0.5
                    x0 = np.floor(fx).astype(np.int64)
                    y0 = np.floor(fy).astype(np.int64)
                    wx = (fx - x0)[None, :, None]
                    wy = (fy - y0)[:, None, None]
                    x0c = np.clip(x0, 0, w_px - 1)
                    x1c = np.clip(x0 + 1, 0, w_px - 1)
                    y0c = np.clip(y0, 0, h_px - 1)
                    y1c = np.clip(y0 + 1, 0, h_px - 1)
                    af = arr.astype(np.float64)
                    top = af[np.ix_(y0c, x0c)] * (1 - wx) + af[np.ix_(y0c, x1c)] * wx
                    bot = af[np.ix_(y1c, x0c)] * (1 - wx) + af[np.ix_(y1c, x1c)] * wx
                    vals = top * (1 - wy) + bot * wy
                    tile[np.ix_(oky, okx)] = np.clip(np.rint(vals), 0, 255).astype(np.uint8)
                else:
                    yy = sy[oky][:, None]
                    xx = sx[okx][None, :]
                    tile[np.ix_(oky, okx)] = arr[yy, xx]
            out_tiles.append(tile.tobytes())
        return pa.table(
            {
                "tier": batch.column("tier"),
                "cell": batch.column("cell"),
                "image_id": batch.column("image_id"),
                "tile": pa.array(out_tiles, type=pa.large_binary()),
            }
        )


class MosaicMerger:
    __name__ = "mosaic_merger"
    """groupby(tier, cell).map_groups: merge tiles sharing a cell.

    ``merge`` selects the band-merge strategy, mirroring the reference's
    RasterTileMergeStrategy SPI (core/raster/.../RasterTileMergeStrategy
    .java; NoDataMergeStrategy is the adapter default):

    - ``nodata``: later tiles fill pixels that are still background
    - ``sum``:    per-pixel band sum, clipped to [0, 255] at emit (the
      shape KDE heat-map composition uses)
    - ``mean``:   floor of the per-pixel band mean over all contributors
    - ``max`` / ``min``: elementwise band extremes
    """

    _STRATEGIES = ("nodata", "sum", "mean", "max", "min")

    def __init__(self, tile_size: int = 256, background: int = 0, merge: str = "nodata"):
        if merge not in self._STRATEGIES:
            raise ValueError(f"merge must be one of {self._STRATEGIES}, got {merge!r}")
        self.tile_size = tile_size
        self.background = background
        self.merge = merge

    def __call__(self, group: pa.Table) -> pa.Table:
        ts = self.tile_size
        # deterministic merge order: by image_id (commutative strategies
        # don't need it, nodata does)
        order = pa.compute.sort_indices(group.column("image_id"))
        group = group.take(order)
        acc = None
        n = 0
        for blob in group.column("tile").to_pylist():
            arr = np.frombuffer(blob, dtype=np.uint8).reshape(ts, ts, 3)
            n += 1
            if self.merge == "nodata":
                if acc is None:
                    acc = arr.copy()
                else:
                    nodata = (acc == self.background).all(axis=2)
                    acc[nodata] = arr[nodata]
            elif self.merge in ("sum", "mean"):
                a = arr.astype(np.int64)
                acc = a if acc is None else acc + a
            elif self.merge == "max":
                acc = arr.copy() if acc is None else np.maximum(acc, arr)
            else:  # min
                acc = arr.copy() if acc is None else np.minimum(acc, arr)
        if self.merge == "sum":
            acc = np.clip(acc, 0, 255).astype(np.uint8)
        elif self.merge == "mean":
            acc = (acc // n).astype(np.uint8)
        return pa.table(
            {
                "tier": group.column("tier").slice(0, 1),
                "cell": group.column("cell").slice(0, 1),
                "n_merged": pa.array([len(group)], type=pa.int64()),
                "tile": pa.array([acc.tobytes()], type=pa.large_binary()),
            }
        )


def _stack_tiles(col: pa.ChunkedArray | pa.Array, nbytes: int) -> np.ndarray:
    """Tile blob column -> (n, nbytes) uint8 matrix.  FixedSizeBinary
    columns are read zero-copy from the values buffer; variable binary
    falls back to a per-row copy."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        if pa.types.is_fixed_size_binary(ch.type):
            arr = np.frombuffer(ch.buffers()[1], dtype=np.uint8)
            parts.append(
                arr[ch.offset * nbytes : (ch.offset + len(ch)) * nbytes].reshape(
                    len(ch), nbytes
                )
            )
        else:
            parts.append(
                np.stack([np.frombuffer(b, dtype=np.uint8) for b in ch.to_pylist()])
            )
    if not parts:
        return np.zeros((0, nbytes), dtype=np.uint8)
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


class _PartialMosaic:
    """Pre-shuffle combiner for the COMMUTATIVE merge strategies
    (sum/mean/max/min): collapses each batch's tiles per (tier, cell)
    BEFORE the groupby moves bytes, so at most one tile per (cell, block)
    crosses the exchange.  sum/mean accumulate int64 (clipping / division
    deferred to the final merge); max/min stay uint8.  The order-dependent
    ``nodata`` strategy cannot be combined this way — mosaic_merge routes
    it through the single-level groupby."""

    __name__ = "partial_mosaic"

    def __init__(self, tile_size: int = 256, merge: str = "sum"):
        if merge not in ("sum", "mean", "max", "min"):
            raise ValueError(f"non-commutative merge {merge!r} has no combiner")
        self.tile_size = tile_size
        self.merge = merge

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb = self.tile_size * self.tile_size * 3
        tiers = batch.column("tier").to_numpy(zero_copy_only=False)
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        tiles = _stack_tiles(batch.column("tile"), nb)
        order = np.lexsort((cells, tiers))
        tiers, cells, tiles = tiers[order], cells[order], tiles[order]
        new = np.ones(len(cells), dtype=bool)
        if len(cells) > 1:
            new[1:] = (cells[1:] != cells[:-1]) | (tiers[1:] != tiers[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, len(cells)))
        if self.merge in ("sum", "mean"):
            # Width-dispatched partial format (large_binary): a cell this
            # batch saw ONCE ships its RAW uint8 tile (nb bytes — zero
            # inflation, the common case at low per-block duplication); a
            # combined cell ships int32 partial sums (4*nb bytes).  int32
            # cannot overflow: a per-block partial is <= 255 * rows_in_block.
            assert counts.max(initial=0) <= 8_421_504, "block too large for int32 partials"
            singles = counts == 1
            multis = ~singles
            order2 = np.concatenate([np.nonzero(singles)[0], np.nonzero(multis)[0]])
            parts = []
            if singles.any():
                parts.append(tiles[starts[singles]].reshape(-1).view(np.uint8))
            if multis.any():
                acc = np.add.reduceat(tiles.astype(np.int32), starts, axis=0)[multis]
                parts.append(np.ascontiguousarray(acc.astype("<i4")).reshape(-1).view(np.uint8))
            blobs = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)
            widths = np.where(singles[order2], nb, 4 * nb).astype(np.int64)
            offs = np.zeros(len(order2) + 1, dtype=np.int64)
            np.cumsum(widths, out=offs[1:])
            tile_col = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                len(order2),
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blobs.tobytes())],
            )
            return pa.table(
                {
                    "tier": pa.array(tiers[starts][order2], type=pa.uint8()),
                    "cell": pa.array(cells[starts][order2], type=pa.uint64()),
                    "n_partial": pa.array(counts[order2], type=pa.int64()),
                    "tile": tile_col,
                }
            )
        red = np.maximum if self.merge == "max" else np.minimum
        acc = red.reduceat(tiles, starts, axis=0)
        n = len(starts)
        tile_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(nb), n, [None, pa.py_buffer(acc.tobytes())]
        )
        return pa.table(
            {
                "tier": pa.array(tiers[starts], type=pa.uint8()),
                "cell": pa.array(cells[starts], type=pa.uint64()),
                "n_partial": pa.array(counts, type=pa.int64()),
                "tile": tile_col,
            }
        )


class _FinalMosaic:
    """groupby(tier, cell).map_groups finalizer over _PartialMosaic rows."""

    __name__ = "final_mosaic"

    def __init__(self, tile_size: int = 256, merge: str = "sum"):
        self.tile_size = tile_size
        self.merge = merge

    def __call__(self, group: pa.Table) -> pa.Table:
        nb = self.tile_size * self.tile_size * 3
        n = int(pa.compute.sum(group.column("n_partial")).as_py())
        if self.merge in ("sum", "mean"):
            # width-dispatched partials: nb bytes = raw uint8 pass-through,
            # 4*nb bytes = int32 partial sums (see _PartialMosaic)
            col = group.column("tile").combine_chunks()
            if isinstance(col, pa.ChunkedArray):  # single chunk after combine
                col = col.chunk(0)
            offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
                col.offset : col.offset + len(col) + 1
            ]
            buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            widths = np.diff(offs)
            acc = np.zeros(nb, dtype=np.int64)
            m8 = widths == nb
            if m8.any():
                mat = buf[offs[:-1][m8][:, None] + np.arange(nb)]
                acc += mat.astype(np.int64).sum(axis=0)
            m32 = widths == 4 * nb
            if m32.any():
                matb = buf[offs[:-1][m32][:, None] + np.arange(4 * nb)]
                acc += np.ascontiguousarray(matb).view("<i4").astype(np.int64).sum(axis=0)
            acc = np.clip(acc, 0, 255) if self.merge == "sum" else acc // n
            tile = acc.astype(np.uint8)
        else:
            tiles = _stack_tiles(group.column("tile"), nb)
            red = np.maximum if self.merge == "max" else np.minimum
            tile = red.reduce(tiles, axis=0)
        return pa.table(
            {
                "tier": group.column("tier").slice(0, 1),
                "cell": group.column("cell").slice(0, 1),
                "n_merged": pa.array([n], type=pa.int64()),
                "tile": pa.array([tile.tobytes()], type=pa.large_binary()),
            }
        )


def mosaic_merge(ds, tile_size: int = 256, merge: str = "nodata", background: int = 0):
    """Distributed mosaic composition over a (tier, cell, image_id, tile)
    Dataset.  Commutative strategies pre-combine per batch (one partial
    tile per cell per block crosses the shuffle); ``nodata`` is order-
    dependent by image_id and goes through the plain groupby."""
    from .util import stage_fn

    if merge == "nodata":
        return ds.groupby(["tier", "cell"]).map_groups(
            MosaicMerger(tile_size=tile_size, background=background),
            batch_format="pyarrow",
        )
    part = ds.map_batches(
        stage_fn(_PartialMosaic, tile_size=tile_size, merge=merge),
        batch_format="pyarrow",
    )
    return part.groupby(["tier", "cell"]).map_groups(
        _FinalMosaic(tile_size=tile_size, merge=merge), batch_format="pyarrow"
    )


class TileRenderStage:
    """Fused decode + level-select + cover + tile-checksum stage for the
    headline pipeline: image rows (with ``bytes``) -> one row per
    (image, cell) with the rendered tile reduced to a checksum.  Tiles
    themselves are produced by TileWarper when a sink needs pixels; here
    the checksum is computed in CLOSED FORM — the nearest-neighbour warp
    gathers a product index set, so sum(tile) == roww @ band_plane @ colw
    with bincount multiplicity weights (exact integer equality, pinned by
    tests/test_tiles.py::test_render_checksum_separable and the
    render-vs-warper cross-check) — the warp itself is never
    materialized.

    ``materialize_pixels=True`` switches the checksum to the PIXEL path:
    the ts^2 RGB tile is actually produced (same gather TileWarper does)
    and the checksum is summed from the materialized array.  Output schema
    and values are identical by the separable identity (pinned by
    tests/test_tiles.py::test_render_pixels_parity); bench.py times both so
    BENCH reports ``render_checksum`` and ``render_pixels`` throughputs as
    distinct, honestly-labeled metrics."""

    def __init__(self, tile_size: int = 256, pixel_res_deg: float = 1e-4, max_bits: int = 31,
                 materialize_pixels: bool = False):
        self.assigner = TileAssigner(
            tile_size=tile_size,
            max_bits=max_bits,
            pixel_res_deg=pixel_res_deg,
            keep_cols=("image_id",),
        )
        self.tile_size = tile_size
        self.pixel_res_deg = pixel_res_deg
        self.strategy = self.assigner.strategy
        self.materialize_pixels = materialize_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = self.tile_size
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        blobs = batch.column("bytes").to_pylist()
        minx, miny, maxx, maxy, w, h = self.assigner._envelope(batch)
        levels = select_levels(
            w * self.assigner.pixel_res_deg,
            h * self.assigner.pixel_res_deg,
            w,
            h,
            ts,
            self.assigner.max_bits,
        )
        out_img, out_tier, out_cell, out_sum = [], [], [], []
        xs = (np.arange(ts) + 0.5) / ts
        # batch the SFC work per level: one vectorized cover + decode per
        # tier for the whole batch (length-1 curve calls dominate otherwise)
        decoded_cache: dict[int, np.ndarray] = {}
        for tier_v in np.unique(levels):
            tier = int(tier_v)
            sel = np.nonzero(levels == tier_v)[0]
            rows, cells = self.assigner._cover_at_tier(
                tier, minx[sel], miny[sel], maxx[sel], maxy[sel]
            )
            los, his = self.strategy.decode_cells(
                tier, np.asarray(cells, dtype=np.uint64)
            )
            for k in range(len(cells)):
                i = int(sel[rows[k]])
                cached = decoded_cache.get(i)
                if cached is None:
                    arr = decode_image(blobs[i])
                    # band-summed plane, computed once per image: the tile
                    # checksum below is separable over it
                    cached = decoded_cache[i] = (arr, arr.sum(axis=2, dtype=np.int64))
                arr, g = cached
                h_px, w_px = arr.shape[:2]
                cx0, cx1 = los[0][k], his[0][k]
                cy0, cy1 = los[1][k], his[1][k]
                px = cx0 + xs * (cx1 - cx0)
                py = cy1 - xs * (cy1 - cy0)
                sx = np.floor((px - lon[i]) / self.pixel_res_deg).astype(np.int64)
                sy = np.floor((lat[i] - py) / self.pixel_res_deg).astype(np.int64)
                okx = (sx >= 0) & (sx < w_px)
                oky = (sy >= 0) & (sy < h_px)
                out_img.append(i)
                out_tier.append(tier)
                out_cell.append(int(cells[k]))
                if self.materialize_pixels:
                    # pixel path: produce the actual ts^2 RGB tile (same
                    # gather TileWarper performs) and sum the array
                    tile = np.zeros((ts, ts, 3), dtype=np.uint8)
                    if okx.any() and oky.any():
                        tile[np.ix_(oky, okx)] = arr[sy[oky][:, None], sx[okx][None, :]]
                    out_sum.append(int(tile.sum(dtype=np.int64)))
                else:
                    # deterministic checksum of the rendered tile WITHOUT
                    # materializing the ts^2 warp: the nearest-neighbour warp
                    # gathers the product set sy[oky] x sx[okx], so
                    # sum(tile) == roww @ g @ colw with per-index multiplicity
                    # weights (exact integer equality; pinned by
                    # tests/test_tiles.py::test_render_checksum_separable)
                    colw = np.bincount(sx[okx], minlength=w_px)
                    roww = np.bincount(sy[oky], minlength=h_px)
                    out_sum.append(int(roww @ (g @ colw)))
        idx = pa.array(np.asarray(out_img, dtype=np.int64))
        return pa.table(
            {
                "image_id": batch.column("image_id").take(idx),
                "tier": pa.array(np.asarray(out_tier, dtype=np.uint8)),
                "cell": pa.array(np.asarray(out_cell, dtype=np.uint64)),
                "tile_checksum": pa.array(np.asarray(out_sum, dtype=np.int64)),
            }
        )
