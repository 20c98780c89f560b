"""Pure-struct ESRI Shapefile codec (.shp/.shx/.dbf) — Point features.

The reference ingests shapefiles through GeoTools DataStores
(extensions/formats/geotools-vector/.../GeoToolsVectorDataStoreIngestPlugin.java);
this is the same capability built from the PUBLIC format specs alone
(ESRI Shapefile Technical Description whitepaper, 1998; dBase III header
layout), with the same discipline as the repo's WAV/FVC1/GeoTIFF codecs:
no external libraries, exact struct parsing, format guards that name what
they refuse.

Scale story: a shapefile is a single sequential .shp, but its .shx sidecar
is a fixed-width record-offset index — so ingest SHARDS BY BYTE RANGE: the
driver reads only the (tiny) .shx, splits the record list into contiguous
ranges, and each Ray task opens the .shp and reads just its slice.  That
makes one big shapefile a parallel source instead of a driver bottleneck.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

__all__ = ["write_point_shapefile", "read_shx_offsets", "read_point_records", "shapefile_dataset", "read_dbf_int_field"]

_SHP_POINT = 1


def write_point_shapefile(base: str, xs, ys, fields: dict[str, np.ndarray]) -> None:
    """Write ``base``.shp/.shx/.dbf for point features.

    ``fields``: name -> int64 array (dBase 'N' columns, width 18).
    Coordinates are float64 (integer-valued coords stay exact).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    rec_content = 4 + 16  # shape type + x + y
    rec_words = rec_content // 2
    total_words = (100 + n * (8 + rec_content)) // 2

    def header(length_words: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", length_words)
        h += struct.pack("<ii", 1000, _SHP_POINT)
        if n:
            bbox = (xs.min(), ys.min(), xs.max(), ys.max())
        else:
            bbox = (0.0, 0.0, 0.0, 0.0)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
        return h

    with open(base + ".shp", "wb") as f:
        f.write(header(total_words))
        for i in range(n):
            f.write(struct.pack(">ii", i + 1, rec_words))
            f.write(struct.pack("<i2d", _SHP_POINT, float(xs[i]), float(ys[i])))

    shx_words = (100 + n * 8) // 2
    with open(base + ".shx", "wb") as f:
        f.write(header(shx_words))
        off = 50  # in 16-bit words
        for _ in range(n):
            f.write(struct.pack(">ii", off, rec_words))
            off += 4 + rec_words

    names = list(fields)
    rec_size = 1 + 18 * len(names)
    hdr_size = 32 + 32 * len(names) + 1
    with open(base + ".dbf", "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 0x03, 26, 8, 19, n, hdr_size, rec_size))
        for name in names:
            nm = name.encode()[:10].ljust(11, b"\x00")
            f.write(nm + b"N" + b"\x00" * 4 + bytes([18, 0]) + b"\x00" * 14)
        f.write(b"\x0d")
        for i in range(n):
            row = b" "
            for name in names:
                row += str(int(fields[name][i])).rjust(18).encode()
            f.write(row)
        f.write(b"\x1a")


def read_shx_offsets(path_shx: str) -> np.ndarray:
    """(n, 2) int64 array of (byte_offset, content_bytes) per record —
    the tiny driver-side read that enables byte-range sharding."""
    with open(path_shx, "rb") as f:
        data = f.read()
    body = np.frombuffer(data[100:], dtype=">i4").reshape(-1, 2).astype(np.int64)
    return np.stack([body[:, 0] * 2, body[:, 1] * 2], axis=1)


def read_point_records(path_shp: str, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read ONLY the given (offset, length) records -> (fid, x, y).
    Vectorized: one contiguous pread spanning the slice, then strided
    frombuffer decodes (points are fixed-width records)."""
    if len(offsets) == 0:
        z = np.zeros(0)
        return z.astype(np.int64), z, z
    lo = int(offsets[0, 0])
    hi = int(offsets[-1, 0] + 8 + offsets[-1, 1])
    with open(path_shp, "rb") as f:
        f.seek(lo)
        buf = f.read(hi - lo)
    rel = offsets[:, 0] - lo
    raw = np.frombuffer(buf, dtype=np.uint8)
    fid = raw[rel[:, None] + np.arange(4)].astype(np.uint32)
    fid = (
        (fid[:, 0].astype(np.int64) << 24)
        | (fid[:, 1].astype(np.int64) << 16)
        | (fid[:, 2].astype(np.int64) << 8)
        | fid[:, 3].astype(np.int64)
    )
    shape_t = raw[rel[:, None] + 8 + np.arange(4)].copy().view("<i4").ravel()
    if not (shape_t == _SHP_POINT).all():
        bad = int(shape_t[shape_t != _SHP_POINT][0])
        raise NotImplementedError(
            f"shapefile shape type {bad} not supported (Point=1 only; "
            "PolyLine/Polygon ingest goes through the WKB path)"
        )
    xy = raw[rel[:, None] + 12 + np.arange(16)].copy().view("<f8").reshape(-1, 2)
    return fid, xy[:, 0], xy[:, 1]


def shapefile_dataset(base: str, records_per_shard: int = 4096):
    """Ray Dataset over a point shapefile, sharded by .shx byte ranges:
    the driver touches only the index; every shard task preads its own
    contiguous .shp slice."""
    import ray

    offs = read_shx_offsets(base + ".shx")
    shards = [
        offs[i : i + records_per_shard]
        for i in range(0, len(offs), records_per_shard)
    ]
    shp = base + ".shp"

    dbf = base + ".dbf"
    has_dbf = os.path.exists(dbf)

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for si in batch.column("shard").to_pylist():
            fid, x, y = read_point_records(shp, shards[si])
            cols = {"fid": pa.array(fid), "x": pa.array(x), "y": pa.array(y)}
            if has_dbf:
                lo = si * records_per_shard
                cols["val"] = pa.array(
                    read_dbf_int_field(dbf, lo, lo + len(fid))
                )
            out.append(pa.table(cols))
        if out:
            return pa.concat_tables(out)
        empty = {"fid": pa.array([], pa.int64()), "x": pa.array([], pa.float64()), "y": pa.array([], pa.float64())}
        if has_dbf:
            empty["val"] = pa.array([], pa.int64())
        return pa.table(empty)

    load.__name__ = "shapefile_shard_load"
    ds = ray.data.from_items([{"shard": i} for i in range(len(shards))])
    return ds.map_batches(load, batch_format="pyarrow")


def read_dbf_int_field(path_dbf: str, rec_lo: int, rec_hi: int, field_idx: int = 0) -> np.ndarray:
    """Vectorized fixed-width read of one dBase 'N' column for records
    [rec_lo, rec_hi) — dbf records are fixed size, so a shard preads
    exactly its slice (same byte-range discipline as the .shp side)."""
    with open(path_dbf, "rb") as f:
        head = f.read(32)
        _ver, _y, _m, _d, n_rec, hdr_size, rec_size = struct.unpack("<B3BIHH20x", head)
        rec_hi = min(rec_hi, n_rec)
        if rec_hi <= rec_lo:
            return np.zeros(0, dtype=np.int64)
        f.seek(hdr_size + rec_lo * rec_size)
        buf = f.read((rec_hi - rec_lo) * rec_size)
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(rec_hi - rec_lo, rec_size)
    col = raw[:, 1 + 18 * field_idx : 1 + 18 * (field_idx + 1)]
    # right-justified ASCII integers: digits weighted by place value
    digits = col - ord("0")
    is_digit = (digits >= 0) & (digits <= 9)
    neg = (col == ord("-")).any(axis=1)
    weights = np.where(is_digit, digits, 0)
    vals = np.zeros(len(col), dtype=np.int64)
    for j in range(col.shape[1]):
        vals = vals * np.where(is_digit[:, j], 10, 1) + weights[:, j]
    return np.where(neg, -vals, vals)
