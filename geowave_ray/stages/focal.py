"""Focal (neighborhood) raster map algebra with distributed halo exchange.

The §2.F raster-analytics step that mosaics/pyramids/band-math do NOT
cover: a 3x3 focal mean needs each tile's 1-pixel border from its up-to-8
neighbor tiles.  Reference analog: focal map algebra over GeoWave-served
tile pyramids (RasterDataAdapter tiles are self-contained, so any focal
consumer performs exactly this border assembly; RasterTileResize.java
does the same halo-free special case).

Ray-Data shape (the halo-exchange pattern):

- ``halo emit`` (map_batches, zero state): every tile row emits itself
  plus 8 border slices addressed to its neighbors — O(perimeter) bytes
  per neighbor, never the full tile.
- ONE groupby(target tile) shuffle cogroups each tile with the <=8
  slices it needs; absent neighbors (global raster edge) simply never
  arrive and their cells stay masked.
- ``assemble+convolve`` (map_groups): build the (T+2)^2 masked array,
  compute integer focal mean (floor(sum/count) over present cells) with
  9 shifted adds — no Python pixel loops — and reduce the tile to
  (focal_sum, focal_max).

Exactly-once by construction: only the group holding the tile's own row
emits output.  Scale: shuffle volume is tiles x perimeter (not area);
group size is <= 9 rows; everything downstream of the read is integer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["focal_mean_stats"]

# (dx, dy) of the 8 neighbors; a slice emitted TO neighbor (dx, dy) sits at
# relative position (-dx, -dy) in that neighbor's halo frame
_DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _halo_emit(tile_size: int):
    T = tile_size

    def emit(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        n = len(batch)
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        buf = b"".join(batch.column("pixels").to_pylist())
        px = np.frombuffer(buf, dtype=np.uint8).reshape(n, T, T)  # [i, y, x]

        out_tx = [tx]
        out_ty = [ty]
        out_dx = [np.zeros(n, np.int8)]
        out_dy = [np.zeros(n, np.int8)]
        payloads: list[bytes] = batch.column("pixels").to_pylist()
        for dx, dy in _DIRS:
            # slice of SELF adjacent to neighbor (dx, dy)
            ys = slice(T - 1, T) if dy == 1 else (slice(0, 1) if dy == -1 else slice(0, T))
            xs = slice(T - 1, T) if dx == 1 else (slice(0, 1) if dx == -1 else slice(0, T))
            sl = np.ascontiguousarray(px[:, ys, xs]).reshape(n, -1)
            out_tx.append(tx + dx)
            out_ty.append(ty + dy)
            out_dx.append(np.full(n, -dx, np.int8))
            out_dy.append(np.full(n, -dy, np.int8))
            payloads.extend(row.tobytes() for row in sl)
        ttx = np.concatenate(out_tx)
        tty = np.concatenate(out_ty)
        return pa.table(
            {
                "_cell": pa.array((ttx << np.int64(32)) ^ (tty & np.int64(0xFFFFFFFF))),
                "tile_x": pa.array(ttx),
                "tile_y": pa.array(tty),
                "_dx": pa.array(np.concatenate(out_dx)),
                "_dy": pa.array(np.concatenate(out_dy)),
                "_payload": pa.array(payloads, type=pa.binary()),
            }
        )

    emit.__name__ = f"focal_halo_emit_{T}"
    return emit


class _FocalGroup:
    __name__ = "focal_assemble"

    def __init__(self, tile_size: int):
        self.T = tile_size

    def __call__(self, group: pa.Table) -> pa.Table:
        T = self.T
        dx = group.column("_dx").to_numpy(zero_copy_only=False)
        dy = group.column("_dy").to_numpy(zero_copy_only=False)
        self_rows = np.nonzero((dx == 0) & (dy == 0))[0]
        if len(self_rows) == 0:  # halo addressed past the global edge
            return pa.table(
                {
                    "tile_x": pa.array([], pa.int64()),
                    "tile_y": pa.array([], pa.int64()),
                    "focal_sum": pa.array([], pa.int64()),
                    "focal_max": pa.array([], pa.int64()),
                }
            )
        payloads = group.column("_payload").to_pylist()
        vals = np.zeros((T + 2, T + 2), dtype=np.int64)
        mask = np.zeros((T + 2, T + 2), dtype=np.int64)
        i0 = int(self_rows[0])
        core = np.frombuffer(payloads[i0], dtype=np.uint8).reshape(T, T)
        vals[1 : T + 1, 1 : T + 1] = core
        mask[1 : T + 1, 1 : T + 1] = 1
        for i in range(len(group)):
            if i == i0:
                continue
            d_x, d_y = int(dx[i]), int(dy[i])
            p = np.frombuffer(payloads[i], dtype=np.uint8)
            ys = slice(0, 1) if d_y == -1 else (slice(T + 1, T + 2) if d_y == 1 else slice(1, T + 1))
            xs = slice(0, 1) if d_x == -1 else (slice(T + 1, T + 2) if d_x == 1 else slice(1, T + 1))
            h = 1 if d_y != 0 else T
            w = 1 if d_x != 0 else T
            vals[ys, xs] = p.reshape(h, w)
            mask[ys, xs] = 1
        s = np.zeros((T, T), dtype=np.int64)
        c = np.zeros((T, T), dtype=np.int64)
        for oy in (0, 1, 2):
            for ox in (0, 1, 2):
                s += vals[oy : oy + T, ox : ox + T] * mask[oy : oy + T, ox : ox + T]
                c += mask[oy : oy + T, ox : ox + T]
        focal = s // c  # every core pixel has itself -> c >= 1
        return pa.table(
            {
                "tile_x": group.column("tile_x").slice(i0, 1),
                "tile_y": group.column("tile_y").slice(i0, 1),
                "focal_sum": pa.array([int(focal.sum())], pa.int64()),
                "focal_max": pa.array([int(focal.max())], pa.int64()),
            }
        )


def focal_mean_stats(tiles_ds, tile_size: int):
    """3x3 integer focal mean over a tiled raster -> per-tile
    (focal_sum, focal_max).  Input rows: (tile_x, tile_y,
    pixels: binary of tile_size^2 uint8, row-major [y][x]).  Pixels
    beyond the global raster edge (no tile exists there) are excluded
    from both the sum and the divisor, matching an in-bounds-only SQL
    neighborhood join."""
    emit = _halo_emit(tile_size)
    return (
        tiles_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("_cell")
        .map_groups(_FocalGroup(tile_size), batch_format="pyarrow")
    )
