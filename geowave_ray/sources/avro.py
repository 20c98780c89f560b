"""Pure-struct Avro Object Container File writer/reader.

Reference behavior: the reference's canonical vector export surface writes
Avro files (extensions/adapters/vector/.../export/VectorLocalExportCommand
.java:46 and the AvroFeatureUtils serialization it drives).  This container
has no avro library, so the format is rebuilt from the public Avro 1.11.1
specification (container files + binary encoding) with the same from-spec
discipline as the Shapefile/GeoTIFF codecs.

Profile:
- container: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON +
  ``avro.codec``), 16-byte sync marker, then data blocks of
  (record-count, byte-size, payload, sync); codec ``null`` (stored) or
  ``deflate`` (raw RFC-1951 stream per spec — no zlib header)
- schema: one top-level record of primitive fields: ``long``, ``double``,
  ``string``, ``bytes``, ``boolean``, and the nullable union
  ``["null", T]`` (emitted automatically for columns with nulls)
- binary encoding: zigzag-varint longs, little-endian IEEE-754 doubles,
  length-prefixed utf-8 / bytes, one-byte booleans

The WRITER is fully vectorized (NumPy zigzag/varint matrices + ragged
scatter/gather assembly — no per-row Python loop).  The reader decodes
with a tight scalar loop per block; Avro ingest parallelizes per FILE
across Ray tasks (``avro_dataset``), so single-block decode speed is not
a 100-TB bottleneck the way the export path is.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa

__all__ = [
    "avro_schema_for",
    "avro_encode",
    "avro_decode",
    "write_avro",
    "avro_dataset",
]

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- writer

def _zigzag_varint(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 values -> (packed varint bytes, per-value byte lengths).

    Vectorized: a (n, 10) byte matrix is built for every 7-bit group and
    flattened through the continuation mask.
    """
    v = np.asarray(vals, dtype=np.int64)
    z = (v.astype(np.uint64) << np.uint64(1)) ^ (v >> 63).astype(np.uint64)
    n = len(z)
    groups = np.empty((n, 10), dtype=np.uint8)
    rem = z.copy()
    for k in range(10):
        groups[:, k] = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
    nz = groups != 0
    lens = np.where(nz.any(axis=1), 10 - np.argmax(nz[:, ::-1], axis=1), 1).astype(np.int64)
    keep = np.arange(10)[None, :] < lens[:, None]
    cont = np.arange(10)[None, :] < (lens - 1)[:, None]
    out = (groups | np.where(cont, 0x80, 0).astype(np.uint8))[keep]
    return out, lens


def _scatter(dst: np.ndarray, dst_starts: np.ndarray, src: np.ndarray, lens: np.ndarray) -> None:
    """Copy ragged per-row slices of ``src`` (concatenated, row r owning
    ``lens[r]`` bytes) into ``dst`` starting at ``dst_starts[r]``."""
    total = int(lens.sum())
    if total == 0:
        return
    idx = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    dst[np.repeat(dst_starts, lens) + idx] = src[:total]


def _drop_rows(enc: np.ndarray, lens: np.ndarray, valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Remove invalid rows' bytes from a concatenated encoding: returns
    (dense bytes of valid rows only, lens with invalid rows zeroed)."""
    starts = np.cumsum(lens) - lens
    keep = np.flatnonzero(valid)
    kl = lens[keep]
    total = int(kl.sum())
    idx = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(kl) - kl, kl)
    out = enc[np.repeat(starts[keep], kl) + idx]
    return out, np.where(valid, lens, 0)


def _avro_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_boolean(t):
        return "boolean"
    raise NotImplementedError(f"avro: column type {t} not in the export profile")


def avro_schema_for(table: pa.Table, name: str = "export") -> dict:
    """Avro record schema (as a dict) for a table in the export profile;
    columns with nulls become ``["null", T]`` unions."""
    fields = []
    for col in table.column_names:
        t = _avro_type(table.schema.field(col).type)
        nullable = table.column(col).null_count > 0
        fields.append({"name": col, "type": ["null", t] if nullable else t})
    return {"type": "record", "name": name, "fields": fields}


def _encode_column(arr, typ: str) -> tuple[np.ndarray, np.ndarray]:
    """column -> (concatenated per-row encodings, per-row byte lengths).
    Null rows encode ZERO bytes (their union branch prefix is added by
    the record assembler)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    valid = ~np.asarray(arr.is_null()) if arr.null_count else None

    if typ == "long":
        import pyarrow.compute as pc

        filled = pc.fill_null(arr, 0) if valid is not None else arr
        enc, lens = _zigzag_varint(filled.to_numpy(zero_copy_only=False).astype(np.int64))
    elif typ == "double":
        import pyarrow.compute as pc

        filled = pc.fill_null(arr, 0.0) if valid is not None else arr
        v = filled.to_numpy(zero_copy_only=False).astype("<f8")
        enc, lens = v.view(np.uint8), np.full(n, 8, dtype=np.int64)
    elif typ == "boolean":
        import pyarrow.compute as pc

        filled = pc.fill_null(arr, False) if valid is not None else arr
        enc = filled.to_numpy(zero_copy_only=False).astype(np.uint8)
        lens = np.ones(n, dtype=np.int64)
    elif typ in ("string", "bytes"):
        import pyarrow.compute as pc

        b = arr.cast(pa.large_binary())
        if valid is not None:
            b = pc.fill_null(b, b"")
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        offs = np.frombuffer(b.buffers()[1], dtype=np.int64, count=len(b) + 1 + b.offset)[b.offset:]
        raw = b.buffers()[2]
        payload = (np.frombuffer(raw, dtype=np.uint8)[offs[0]:offs[-1]]
                   if raw is not None else np.zeros(0, np.uint8))
        plens = np.diff(offs)
        lenc, llens = _zigzag_varint(plens)
        lens = llens + plens
        enc = np.empty(int(lens.sum()), dtype=np.uint8)
        starts = np.cumsum(lens) - lens
        _scatter(enc, starts, lenc, llens)
        _scatter(enc, starts + llens, payload, plens)
    else:
        raise NotImplementedError(typ)

    if valid is not None:
        enc, lens = _drop_rows(enc, lens, valid)
    return enc, lens


def _encode_body(table: pa.Table, schema: dict) -> bytes:
    n = len(table)
    parts: list[tuple[np.ndarray, np.ndarray]] = []
    for f in schema["fields"]:
        col = table.column(f["name"])
        union = isinstance(f["type"], list)
        typ = f["type"][1] if union else f["type"]
        enc, lens = _encode_column(col, typ)
        if union:
            # union branch prefix per row: 0 (null) -> 0x00, 1 (value) -> 0x02
            carr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            valid = ~np.asarray(carr.is_null()) if carr.null_count else np.ones(n, bool)
            pref = np.where(valid, 0x02, 0x00).astype(np.uint8)
            out = np.empty(n + int(lens.sum()), dtype=np.uint8)
            starts = np.cumsum(lens + 1) - (lens + 1)
            out[starts] = pref
            _scatter(out, starts + 1, enc, lens)
            parts.append((out, lens + 1))
        else:
            parts.append((enc, lens))
    if not parts:
        return b""
    row_lens = np.sum([p[1] for p in parts], axis=0).astype(np.int64)
    row_starts = np.cumsum(row_lens) - row_lens
    out = np.empty(int(row_lens.sum()), dtype=np.uint8)
    field_off = np.zeros(n, dtype=np.int64)
    for enc, lens in parts:
        _scatter(out, row_starts + field_off, enc, lens)
        field_off += lens
    return out.tobytes()


def _enc_long(v: int) -> bytes:
    z = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avro_encode(
    table: pa.Table,
    name: str = "export",
    codec: str = "null",
    max_block_rows: int = 65536,
) -> bytes:
    """pa.Table -> one Avro Object Container File (bytes).  The sync
    marker is derived from the schema so output is deterministic."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} not supported")
    schema = avro_schema_for(table, name)
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode() + b"|geowave-ray-avro").digest()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    head = bytearray(_MAGIC)
    head += _enc_long(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        head += _enc_long(len(kb)) + kb + _enc_long(len(v)) + v
    head += _enc_long(0)
    head += sync
    for lo in range(0, max(len(table), 1), max_block_rows):
        chunk = table.slice(lo, max_block_rows)
        if len(chunk) == 0 and lo > 0:
            break
        body = _encode_body(chunk, schema)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)  # raw RFC-1951 per spec
            body = c.compress(body) + c.flush()
        head += _enc_long(len(chunk)) + _enc_long(len(body)) + body + sync
    return bytes(head)


# ---------------------------------------------------------------- reader

def _dec_long(buf, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def avro_decode(data: bytes) -> pa.Table:
    """Avro container bytes -> pa.Table (export profile schemas only)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    nmeta, pos = _dec_long(data, pos)
    meta = {}
    while nmeta:
        for _ in range(abs(nmeta)):
            klen, pos = _dec_long(data, pos)
            k = data[pos:pos + klen].decode()
            pos += klen
            vlen, pos = _dec_long(data, pos)
            meta[k] = data[pos:pos + vlen]
            pos += vlen
        nmeta, pos = _dec_long(data, pos)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} not supported")
    sync = data[pos:pos + 16]
    pos += 16
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    cols: dict[str, list] = {nm: [] for nm, _ in fields}
    while pos < len(data):
        nrec, pos = _dec_long(data, pos)
        blen, pos = _dec_long(data, pos)
        body = data[pos:pos + blen]
        pos += blen
        if data[pos:pos + 16] != sync:
            raise ValueError("avro: bad sync marker (corrupt block)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        p = 0
        for _ in range(nrec):
            for nm, ft in fields:
                typ = ft
                if isinstance(ft, list):
                    branch, p = _dec_long(body, p)
                    if ft[branch] == "null":
                        cols[nm].append(None)
                        continue
                    typ = ft[branch]
                if typ == "long":
                    v, p = _dec_long(body, p)
                elif typ == "double":
                    (v,) = struct.unpack_from("<d", body, p)
                    p += 8
                elif typ == "boolean":
                    v = bool(body[p])
                    p += 1
                elif typ in ("string", "bytes"):
                    ln, p = _dec_long(body, p)
                    v = body[p:p + ln]
                    p += ln
                    if typ == "string":
                        v = v.decode()
                else:
                    raise NotImplementedError(f"avro: type {typ} outside profile")
                cols[nm].append(v)
    arrow_types = {"long": pa.int64(), "double": pa.float64(), "boolean": pa.bool_(),
                   "string": pa.string(), "bytes": pa.large_binary()}
    out = {}
    for nm, ft in fields:
        typ = ft[1] if isinstance(ft, list) else ft
        out[nm] = pa.array(cols[nm], type=arrow_types[typ])
    return pa.table(out)


# ---------------------------------------------------------------- Ray glue

def write_avro(ds, out_dir: str, codec: str = "null", name: str = "export"):
    """Stream a Dataset to Avro container files (one per block; filename
    from the content hash so re-runs are idempotent)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table, *, _dir=out_dir) -> pa.Table:
        data = avro_encode(batch, name=name, codec=codec)
        path = os.path.join(_dir, f"part-{hashlib.sha1(data).hexdigest()[:16]}.avro")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]), "rows": pa.array([len(batch)])})

    write_block.__name__ = "write_avro_block"
    return ds.map_batches(write_block, batch_format="pyarrow").to_pandas()


def avro_dataset(paths: str | list[str]):
    """Avro container file(s) -> Dataset (one decode task per file)."""
    import ray

    if isinstance(paths, str):
        paths = (
            [os.path.join(paths, f) for f in sorted(os.listdir(paths)) if f.endswith(".avro")]
            if os.path.isdir(paths)
            else [paths]
        )
    if not paths:
        raise FileNotFoundError("no .avro files to read")

    def load(batch: pa.Table) -> pa.Table:
        tabs = [avro_decode(open(p.as_py(), "rb").read()) for p in batch.column("path")]
        return pa.concat_tables(tabs)

    load.__name__ = "read_avro"
    return ray.data.from_arrow(pa.table({"path": pa.array(paths)})).map_batches(
        load, batch_format="pyarrow"
    )
