"""WebDataset-style tar sharding for image+caption corpora.

WebDataset (the de-facto container for streaming image-training corpora;
public convention: POSIX ustar tar of per-sample member files sharing a
key prefix, e.g. ``000123.jpg`` + ``000123.txt``) is the canonical
sink/source shape for the north-rule image+caption table: tars stream
sequentially (object-store friendly), and the shard is the unit of
parallelism, shuffling and resume.  Pure-stdlib codec (``tarfile`` in
USTAR format, zeroed mtimes/uids so output bytes are deterministic); no
webdataset library exists in this container and none is needed.

Scale shape: one shard per input block, written INSIDE ``map_batches`` —
payload bytes never cross a shuffle; only the bounded manifest rows
(shard path, samples, bytes) reach the driver (state/manifest.py
discipline).  Reads are shard-parallel: each task opens only its own tar
and scans it sequentially — exactly WebDataset's access pattern.
"""

from __future__ import annotations

import io
import os
import tarfile

import pyarrow as pa

__all__ = ["write_wds_shards", "wds_dataset"]


def _pack_shard(path: str, keys, exts, blobs, captions) -> int:
    """Write one tar shard; returns payload bytes written.  Member order
    follows the given row order; metadata is zeroed for byte-determinism."""
    nbytes = 0
    with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
        for k, ext, blob, cap in zip(keys, exts, blobs, captions):
            for name, data in ((f"{k}.{ext}", blob), (f"{k}.txt", cap.encode("utf-8"))):
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                info.mode = 0o644
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
                nbytes += len(data)
    return nbytes


def write_wds_shards(
    ds,
    out_dir: str,
    key_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
):
    """Sink: pack (key, bytes, caption) rows into WebDataset tar shards,
    one shard per block, named after the block's first key.  Returns the
    manifest Dataset (shard, n, payload_bytes); call ``.materialize()`` /
    consume it to drive the write."""
    os.makedirs(out_dir, exist_ok=True)

    def pack(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "payload_bytes": pa.array([], pa.int64()),
                }
            )
        keys = batch.column(key_col).to_pylist()
        exts = batch.column(fmt_col).to_pylist()
        blobs = batch.column(bytes_col).to_pylist()
        caps = batch.column(caption_col).to_pylist()
        path = os.path.join(out_dir, f"shard-{keys[0]}.tar")
        nbytes = _pack_shard(path, keys, exts, blobs, caps)
        return pa.table(
            {
                "shard": pa.array([path]),
                "n": pa.array([len(keys)], pa.int64()),
                "payload_bytes": pa.array([nbytes], pa.int64()),
            }
        )

    pack.__name__ = "wds_pack"
    return ds.map_batches(pack, batch_format="pyarrow")


def wds_dataset(out_dir: str):
    """Source: shard-parallel WebDataset read.  Each task scans its own
    tar sequentially, pairs member files by key prefix, and emits
    (image_id, fmt, bytes, caption) rows."""
    import ray

    shards = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".tar")
    )
    if not shards:
        raise FileNotFoundError(f"no .tar shards under {out_dir}")
    paths = ray.data.from_items([{"shard": s} for s in shards])

    def unpack(batch: pa.Table) -> pa.Table:
        keys, fmts, blobs, caps = [], [], [], []
        for path in batch.column("shard").to_pylist():
            samples: dict[str, dict] = {}
            order: list[str] = []
            with tarfile.open(path, "r") as tf:
                for member in tf:
                    stem, _, ext = member.name.partition(".")
                    data = tf.extractfile(member).read()
                    if stem not in samples:
                        samples[stem] = {}
                        order.append(stem)
                    if ext == "txt":
                        samples[stem]["caption"] = data.decode("utf-8")
                    else:
                        samples[stem]["fmt"] = ext
                        samples[stem]["bytes"] = data
            for stem in order:
                s = samples[stem]
                keys.append(stem)
                fmts.append(s["fmt"])
                blobs.append(s["bytes"])
                caps.append(s["caption"])
        return pa.table(
            {
                "image_id": pa.array(keys),
                "fmt": pa.array(fmts),
                "bytes": pa.array(blobs, type=pa.large_binary()),
                "caption": pa.array(caps),
            }
        )

    unpack.__name__ = "wds_unpack"
    return paths.map_batches(unpack, batch_format="pyarrow")
