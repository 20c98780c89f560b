"""Table statistics manifest — the engine's analog of GeoWave's
ingest-maintained statistics store.

Reference: statistics updated per written row via StatisticUpdateCallback
and merged on flush (core/store/.../statistics/StatisticUpdateCallback.java;
CountStatistic, BoundingBoxStatistic, NumericRangeStatistic,
FixedBinNumericHistogramStatistic, HyperLogLogStatistic, RowRangeHistogram
— SURVEY §2.D).  Ray-native shape: ONE partial pass inside map_batches
(each batch emits a serialized partial), a tiny driver-side merge, and a
JSON manifest persisted next to the table.  Tier-occupancy counts feed the
query planner's tier pruning (TierIndexMetaData analog); per-cell counts
feed hot-cell salting.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..stages.aggregate import FixedBinHistogram, HyperLogLog

__all__ = ["compute_statistics", "StatisticsManifest", "load_statistics"]


class StatisticsManifest:
    def __init__(self, data: dict):
        self.data = data

    @property
    def count(self) -> int:
        return self.data["count"]

    @property
    def bbox(self):
        return tuple(self.data["bbox"]) if self.data.get("bbox") else None

    def tier_counts(self) -> dict[int, int]:
        return {int(k): v for k, v in self.data.get("tier_counts", {}).items()}

    def occupied_tiers(self) -> list[int]:
        return sorted(self.tier_counts())

    def hot_cells(self, threshold: int) -> dict[int, int]:
        return {
            int(c): n
            for c, n in self.data.get("cell_counts", {}).items()
            if n > threshold
        }

    def approx_distinct(self, col: str) -> float | None:
        return self.data.get("approx_distinct", {}).get(col)

    @property
    def differing_visibility_count(self) -> int | None:
        return self.data.get("differing_visibility_count")

    @property
    def max_duplicates(self) -> int | None:
        return self.data.get("max_duplicates")

    def save(self, root: str) -> str:
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, "_stats.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return path


def load_statistics(root: str) -> StatisticsManifest | None:
    path = os.path.join(root, "_stats.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return StatisticsManifest(json.load(f))


def compute_statistics(
    ds,
    lon_col: str | None = "lon",
    lat_col: str | None = "lat",
    tier_col: str | None = None,
    cell_col: str | None = None,
    cell_count_limit: int = 65536,
    distinct_cols: tuple = (),
    histogram_cols: tuple = (),
    histogram_bounds: dict | None = None,
    vis_cols: tuple = (),
    dup_count_col: str | None = None,
) -> StatisticsManifest:
    """One streaming pass -> merged statistics manifest.

    ``vis_cols``: visibility-expression columns.  With two or more, counts
    rows whose FIELD visibilities differ from each other — the reference's
    DifferingVisibilityCountStatistic
    (core/store/.../statistics/index/DifferingVisibilityCountStatistic.java);
    with one, counts rows carrying a non-empty (non-default) visibility.
    ``dup_count_col``: per-row index-duplicate count (the tiered insertion
    expansion knows it at write time); the merged max is the reference's
    MaxDuplicatesStatistic (statistics/index/MaxDuplicatesStatistic.java).
    """
    histogram_bounds = histogram_bounds or {}

    def partial(batch: pa.Table) -> pa.Table:
        out: dict = {"n": len(batch)}
        if lon_col and lon_col in batch.column_names:
            lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
            lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
            if len(lon):
                out["bbox"] = [
                    float(lon.min()),
                    float(lat.min()),
                    float(lon.max()),
                    float(lat.max()),
                ]
        if tier_col and tier_col in batch.column_names:
            tiers, counts = np.unique(
                batch.column(tier_col).to_numpy(zero_copy_only=False), return_counts=True
            )
            out["tier_counts"] = {int(t): int(c) for t, c in zip(tiers, counts)}
        if cell_col and cell_col in batch.column_names:
            cells, counts = np.unique(
                batch.column(cell_col).to_numpy(zero_copy_only=False), return_counts=True
            )
            # bound the per-batch cell histogram (top-N by count)
            if len(cells) > cell_count_limit:
                top = np.argsort(-counts)[:cell_count_limit]
                cells, counts = cells[top], counts[top]
            out["cell_counts"] = {int(c): int(k) for c, k in zip(cells, counts)}
        hlls = {}
        for c in distinct_cols:
            h = HyperLogLog()
            arr = batch.column(c)
            if pa.types.is_integer(arr.type):
                h.add_ints(arr.to_numpy(zero_copy_only=False))
            else:
                from ..stages.texthash import hash_strings

                # deterministic across workers (no PYTHONHASHSEED dependence)
                h.add_hashed(HyperLogLog._hash(hash_strings(arr.to_pylist())))
            hlls[c] = h.to_bytes().hex()
        if hlls:
            out["hll"] = hlls
        hists = {}
        for c in histogram_cols:
            lo, hi = histogram_bounds.get(c, (0.0, 1.0))
            fb = FixedBinHistogram(lo, hi)
            fb.add(batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64))
            hists[c] = fb.counts.tolist()
        if hists:
            out["hist"] = hists
        ranges = {}
        for c in histogram_cols:
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            if len(v):
                ranges[c] = [float(v.min()), float(v.max()), float(v.sum())]
        if ranges:
            out["ranges"] = ranges
        if vis_cols:
            import pyarrow.compute as pc

            arrs = [
                pc.fill_null(batch.column(c).cast(pa.string()), "") for c in vis_cols
            ]
            if len(arrs) == 1:
                diff = pc.not_equal(arrs[0], "")
            else:
                diff = None
                for a in arrs[1:]:
                    ne = pc.not_equal(a, arrs[0])
                    diff = ne if diff is None else pc.or_(diff, ne)
            s = pc.sum(diff.cast(pa.int64())).as_py()
            out["differing_vis"] = int(s or 0)
        if dup_count_col and dup_count_col in batch.column_names:
            d = batch.column(dup_count_col).to_numpy(zero_copy_only=False)
            if len(d):
                out["max_duplicates"] = int(d.max())
        return pa.table({"stat": pa.array([json.dumps(out)])})

    partial.__name__ = "stats_partial"
    parts = [json.loads(r["stat"]) for r in ds.map_batches(partial, batch_format="pyarrow").take_all()]

    merged: dict = {"count": sum(p["n"] for p in parts)}
    boxes = [p["bbox"] for p in parts if "bbox" in p]
    if boxes:
        merged["bbox"] = [
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        ]
    tier_counts: dict = {}
    cell_counts: dict = {}
    for p in parts:
        for t, c in p.get("tier_counts", {}).items():
            tier_counts[t] = tier_counts.get(t, 0) + c
        for t, c in p.get("cell_counts", {}).items():
            cell_counts[t] = cell_counts.get(t, 0) + c
    if tier_counts:
        merged["tier_counts"] = tier_counts
    if cell_counts:
        if len(cell_counts) > cell_count_limit:
            top = sorted(cell_counts.items(), key=lambda kv: -kv[1])[:cell_count_limit]
            cell_counts = dict(top)
        merged["cell_counts"] = cell_counts
    if distinct_cols:
        merged["approx_distinct"] = {}
        for c in distinct_cols:
            h = None
            for p in parts:
                if "hll" in p and c in p["hll"]:
                    h2 = HyperLogLog.from_bytes(bytes.fromhex(p["hll"][c]))
                    h = h2 if h is None else h.merge(h2)
            if h is not None:
                merged["approx_distinct"][c] = h.estimate()
    if histogram_cols:
        merged["hist"] = {}
        merged["ranges"] = {}
        for c in histogram_cols:
            acc = None
            for p in parts:
                if "hist" in p and c in p["hist"]:
                    arr = np.asarray(p["hist"][c], dtype=np.int64)
                    acc = arr if acc is None else acc + arr
            if acc is not None:
                merged["hist"][c] = acc.tolist()
            rs = [p["ranges"][c] for p in parts if "ranges" in p and c in p["ranges"]]
            if rs:
                merged["ranges"][c] = [
                    min(r[0] for r in rs),
                    max(r[1] for r in rs),
                    sum(r[2] for r in rs),
                ]
    if vis_cols:
        merged["differing_visibility_count"] = sum(
            p.get("differing_vis", 0) for p in parts
        )
    if dup_count_col:
        dups = [p["max_duplicates"] for p in parts if "max_duplicates" in p]
        merged["max_duplicates"] = max(dups) if dups else 0
    return StatisticsManifest(merged)
