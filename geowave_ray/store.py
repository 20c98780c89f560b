"""GeoStore — the engine's DataStore-equivalent facade.

Reference surface: DataStore.ingest / DataStore.query plus the adapter /
index / statistics metadata stores (core/store/.../api/DataStore.java,
BaseDataStore.java, metadata/*.java — SURVEY §3.1-3.2).  Ray-native shape:

- ``ingest``: Dataset -> cell encode (tiered Hilbert) -> parquet partitioned
  by (tier, cell_prefix) + statistics manifest (count/bbox/tier counts/
  hot cells) + lineage manifest.  Streaming; restartable at partition
  granularity.
- ``query``: SpatialQuery -> tier-occupancy-pruned (tier, cell-prefix)
  directory selection -> pruned parquet read -> coarse bbox filter ->
  fine refine (the reference's range planning + NativeEntryIteratorWrapper
  filter chain).
- ``stats``: the persisted statistics manifest.

The store root is plain files — the multi-node story is the same layout on
shared storage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .index.tiered import spatial_strategy
from .query.planner import SpatialQuery
from .sources.io import write_partitioned_by_cell
from .stages.encode import CellEncoder
from .stages.util import stage_fn
from .state.stats import StatisticsManifest, compute_statistics, load_statistics

__all__ = ["BinnedStore", "GeoStore"]


class GeoStore:
    def __init__(self, root: str, bits: int = 31, prefix_bits: int = 8, strategy=None):
        """``strategy``: any object with ``get_query_ranges`` +
        ``cell_bits`` (TieredStrategy default; pass an
        ``XZHierarchicalStrategy`` for the reference's default point+XZ
        composed index)."""
        self.root = root
        self.bits = bits
        self.prefix_bits = prefix_bits
        self._strategy = strategy

    @property
    def strategy(self):
        if self._strategy is None:
            self._strategy = spatial_strategy(self.bits)
        return self._strategy

    # ------------------------------------------------------------- ingest
    ID_INDEX_BITS = 6  # 64 id-hash partitions in the secondary layout

    @staticmethod
    def _id_partitions(ids) -> np.ndarray:
        """Deterministic hash partition of data ids (int or str)."""
        from .stages.texthash import hash_strings, splitmix64

        arr = np.asarray(ids)
        if arr.dtype.kind in "iu":
            h = splitmix64(arr.astype(np.uint64))
        else:
            h = hash_strings([str(x) for x in ids])
        return (h >> np.uint64(64 - GeoStore.ID_INDEX_BITS)).astype(np.int64)

    def ingest(
        self,
        ds,
        lon_col: str = "lon",
        lat_col: str = "lat",
        compute_stats: bool = True,
        id_index_col: str | None = None,
        attr_index_cols: list[str] | tuple = (),
        attr_buckets: int = 64,
    ) -> StatisticsManifest:
        """Encode cells, write the keyed layout, persist statistics.
        ``compute_stats=False`` skips the read-back statistics pass (tier
        occupancy still recorded from the directory layout).
        ``id_index_col`` additionally writes a SECONDARY id-keyed layout
        (hash-prefix partitioned) so ``lookup`` prunes to matching
        partitions instead of scanning the store — the
        BatchDataIndexRetrieval analog
        (core/store/.../base/dataidx/BatchDataIndexRetrieval.java).
        ``attr_index_cols``: numeric columns to ALSO index by value —
        a range-bucketed secondary layout per column, the AttributeIndex
        analog (core/store/.../api/AttributeIndex.java,
        index/AttributeIndexImpl.java; OptimalExpressionQuery routes
        single-attribute range constraints to it).  One combined min/max
        aggregate pass sizes the equal-width buckets; bounds persist in
        the per-column ``_meta.json`` for query-time pruning."""
        encoded = ds.map_batches(
            stage_fn(
                CellEncoder,
                bits=self.bits,
                lon_col=lon_col,
                lat_col=lat_col,
                # custom strategies (custom_crs_strategy) must drive the
                # encoder too, not just query pruning
                strategy=self._strategy,
            ),
            batch_format="pyarrow",
        )
        if id_index_col is not None:
            col = id_index_col

            def add_idp(batch: pa.Table) -> pa.Table:
                idp = GeoStore._id_partitions(
                    batch.column(col).to_numpy(zero_copy_only=False)
                    if batch.column(col).type != pa.string()
                    else batch.column(col).to_pylist()
                )
                return batch.append_column("idp", pa.array(idp))

            add_idp.__name__ = "add_id_partition"
            ds.map_batches(add_idp, batch_format="pyarrow").write_parquet(
                os.path.join(self.root, "_id_idx"), partition_cols=["idp"]
            )
            self._id_index_col = col
        if attr_index_cols:
            import json

            from ray.data.aggregate import Max, Min

            bounds = ds.aggregate(
                *(a for c in attr_index_cols for a in (Min(c), Max(c)))
            )
            for c in attr_index_cols:
                lo = float(bounds[f"min({c})"])
                hi = float(bounds[f"max({c})"])
                width = (hi - lo) / attr_buckets or 1.0
                acol = c

                def add_bucket(batch: pa.Table, _lo=lo, _w=width, _c=acol) -> pa.Table:
                    v = batch.column(_c).to_numpy(zero_copy_only=False).astype(np.float64)
                    b = np.clip(
                        np.floor((v - _lo) / _w).astype(np.int64), 0, attr_buckets - 1
                    )
                    return batch.append_column("ab", pa.array(b))

                add_bucket.__name__ = f"attr_bucket_{acol}"
                idx_dir = os.path.join(self.root, "_attr_idx", acol)
                ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
                    idx_dir, partition_cols=["ab"]
                )
                with open(os.path.join(idx_dir, "_meta.json"), "w") as f:
                    json.dump(
                        {"col": acol, "lo": lo, "hi": hi, "n_buckets": attr_buckets}, f
                    )
        write_partitioned_by_cell(
            encoded,
            self.root,
            prefix_bits=self.prefix_bits,
            bits=self.bits,
            cell_bits_of=self.strategy.cell_bits,
        )
        import ray

        if compute_stats:
            written = ray.data.read_parquet(
                self.root, columns=[lon_col, lat_col, "cell"]
            )
            stats = compute_statistics(
                written, lon_col=lon_col, lat_col=lat_col, cell_col="cell"
            )
        else:
            stats = StatisticsManifest({"count": -1})
        # tier is a partition column; occupancy from directory names
        stats.data["tier_counts"] = {
            str(int(d.split("=")[1])): -1
            for d in os.listdir(self.root)
            if d.startswith("tier=")
        }
        stats.save(self.root)
        return stats

    def ingest_incremental(
        self,
        ds,
        id_col: str = "image_id",
        lon_col: str = "lon",
        lat_col: str = "lat",
        broadcast_cap: int = 2_000_000,
        **ingest_kwargs,
    ):
        """Idempotent corpus refresh: append ONLY rows whose ``id_col``
        is not already stored, then run the normal ``ingest`` on the
        remainder — re-running the same ingest is a no-op, which is what
        makes a 100-TB nightly refresh restartable at the batch level
        (the reference's local ingest driver is re-run idempotent-ish;
        AbstractLocalFileIngestDriver.java:307-399 — this makes the
        semantics explicit instead of accidental).

        Existing ids are scanned as a SINGLE COLUMN of the keyed layout;
        under ``broadcast_cap`` distinct ids the anti-filter is a
        broadcast ``np.isin`` per batch, above it the exact Bloom
        prefilter + residual join path (``bloom_anti_filter``, the
        repo's standard >cap fallback; integer ids only there).
        Returns the refreshed StatisticsManifest."""
        import ray

        from .stages.util import bloom_anti_filter, collect_table

        has_data = any(
            d.startswith("tier=") for d in os.listdir(self.root)
        ) if os.path.isdir(self.root) else False
        if not has_data:
            return self.ingest(ds, lon_col=lon_col, lat_col=lat_col, **ingest_kwargs)
        existing = ray.data.read_parquet(self.root, columns=[id_col])
        n_existing = existing.count()
        if n_existing <= broadcast_cap:
            ids_tbl = collect_table(existing)
            wanted = ids_tbl.column(id_col).to_numpy(zero_copy_only=False)
            seen = np.unique(wanted)
            seen_ref = ray.put(seen)

            def drop_seen(batch: pa.Table) -> pa.Table:
                sv = ray.get(seen_ref)
                v = batch.column(id_col).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(sv, v)
                pos = np.clip(pos, 0, max(len(sv) - 1, 0))
                dup = (len(sv) > 0) & (sv[pos] == v)
                return batch.filter(pa.array(~dup))

            drop_seen.__name__ = "incremental_drop_seen"
            fresh = ds.map_batches(drop_seen, batch_format="pyarrow")
        else:
            fresh = bloom_anti_filter(ds, existing, id_col)
        return self.ingest(fresh, lon_col=lon_col, lat_col=lat_col, **ingest_kwargs)

    def ingest_envelopes(
        self,
        ds,
        cols: tuple = ("minx", "miny", "maxx", "maxy"),
    ) -> None:
        """Ingest mixed point/box entries keyed by the XZHierarchical
        strategy (points -> point curve tier 128, boxes -> XZ tier 129).
        Requires ``strategy`` to be an XZHierarchicalStrategy."""
        strat = self.strategy

        def encode(batch: pa.Table) -> pa.Table:
            tier, cell = strat.insertion_cells(
                *(batch.column(c).to_numpy(zero_copy_only=False) for c in cols)
            )
            return batch.append_column(
                "tier", pa.array(tier.astype(np.uint8))
            ).append_column("cell", pa.array(cell, type=pa.uint64()))

        encode.__name__ = "xz_hier_encode"
        encoded = ds.map_batches(encode, batch_format="pyarrow")
        write_partitioned_by_cell(
            encoded,
            self.root,
            prefix_bits=self.prefix_bits,
            bits=self.bits,
            cell_bits_of=strat.cell_bits,
        )
        stats = StatisticsManifest({"count": -1})
        stats.data["tier_counts"] = {
            str(int(d.split("=")[1])): -1
            for d in os.listdir(self.root)
            if d.startswith("tier=")
        }
        stats.save(self.root)

    def query_envelopes(
        self,
        query: SpatialQuery,
        columns: list[str] | None = None,
        cols: tuple = ("minx", "miny", "maxx", "maxy"),
    ):
        """Pruned scan + envelope-intersection refine for envelope entries
        (points have minx==maxx).  Fine geometry refinement, when a wkb
        column is stored, is ``query.planner.apply_wkb_query`` downstream."""
        import ray

        paths = self._expand_paths(self._pruned_paths(query))
        if not paths:
            return ray.data.from_items([])
        read_cols = columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, *cols]))
        ds = ray.data.read_parquet(paths, columns=read_cols)
        minx, miny, maxx, maxy = query.bbox()

        def refine(batch: pa.Table) -> pa.Table:
            bx0 = batch.column(cols[0]).to_numpy(zero_copy_only=False)
            by0 = batch.column(cols[1]).to_numpy(zero_copy_only=False)
            bx1 = batch.column(cols[2]).to_numpy(zero_copy_only=False)
            by1 = batch.column(cols[3]).to_numpy(zero_copy_only=False)
            mask = (bx0 <= maxx) & (bx1 >= minx) & (by0 <= maxy) & (by1 >= miny)
            return batch.filter(pa.array(mask))

        refine.__name__ = "envelope_refine"
        out = ds.map_batches(refine, batch_format="pyarrow")
        if columns is not None:
            out = out.select_columns(columns)
        return out

    def _expand_paths(self, paths: list[str]) -> list[str]:
        files: list[str] = []
        for p in paths:
            if os.path.isdir(p):
                for base, _, names in os.walk(p):
                    files.extend(
                        os.path.join(base, n) for n in names if n.endswith(".parquet")
                    )
            else:
                files.append(p)
        return sorted(files)

    def stats(self) -> StatisticsManifest | None:
        return load_statistics(self.root)

    def compact(self, sort_col: str = "cell", min_files: int = 2):
        """Merge each partition's files into one clustered file (see
        ``compact_store``)."""
        return compact_store(self.root, sort_col=sort_col, min_files=min_files)

    # -------------------------------------------------------------- query
    def _pruned_paths(self, query: SpatialQuery) -> list[str]:
        """Select (tier, cell_prefix) directories intersecting the query's
        ranges — the scan-pruning step (QueryRanges -> splits)."""
        strategy = self.strategy
        stats = self.stats()
        occupied = (
            [int(t) for t in stats.data.get("tier_counts", {})] if stats else None
        )
        ranges = query.query_ranges(strategy, max_ranges=256)
        wanted: dict[int, set[int] | None] = {}
        for r in ranges:
            if occupied is not None and r.tier not in occupied:
                continue
            if r.tier in wanted and wanted[r.tier] is None:
                continue  # already whole-tier; don't .update() a None
            # prefix of a cell at this tier, on that tier's OWN bits
            # (matches write_partitioned_by_cell's per-tier shift)
            shift = max(0, strategy.cell_bits(r.tier) - 2 * self.prefix_bits)
            lo_p = int(r.lo) >> shift
            hi_p = int(r.hi) >> shift
            if hi_p - lo_p <= 4096:
                wanted.setdefault(r.tier, set()).update(range(lo_p, hi_p + 1))
            else:
                wanted[r.tier] = None  # whole tier
        paths = []
        for tier, prefixes in wanted.items():
            tier_dir = os.path.join(self.root, f"tier={tier}")
            if not os.path.isdir(tier_dir):
                continue
            if prefixes is None:
                paths.append(tier_dir)
                continue
            for d in os.listdir(tier_dir):
                if not d.startswith("cell_prefix="):
                    continue
                if int(d.split("=")[1]) in prefixes:
                    paths.append(os.path.join(tier_dir, d))
        return paths

    def explain(self, query: SpatialQuery) -> "pa.Table":
        """Query-plan observability (the reference's split/statistics
        introspection surface, SplitsProvider.getSplits +
        RowRangeHistogram-weighted planning): one row per plan facet —
        decomposed range count, occupied-tier filter, directories
        selected vs present, parquet files selected, and whether the
        bbox row-group pushdown applies.  Pure metadata: nothing is
        read; use before running an expensive scan to see what the
        pruning will touch."""
        ranges = query.query_ranges(self.strategy, max_ranges=256)
        pruned = self._pruned_paths(query)
        files = self._expand_paths(pruned)
        n_dirs_total = 0
        for d in os.listdir(self.root):
            if d.startswith("tier="):
                sub = os.path.join(self.root, d)
                pref = [p for p in os.listdir(sub) if p.startswith("cell_prefix=")]
                n_dirs_total += max(1, len(pref))
        facets = [
            ("query_ranges", len(ranges)),
            ("tiers_touched", len({r.tier for r in ranges})),
            ("dirs_total", n_dirs_total),
            ("dirs_selected", len(pruned)),
            ("files_selected", len(files)),
            ("rowgroup_pushdown", 0 if query.op == "DISJOINT" else 1),
        ]
        return pa.table(
            {
                "facet": pa.array([f for f, _ in facets]),
                "value": pa.array([int(v) for _, v in facets], type=pa.int64()),
            }
        )

    def query(
        self,
        query: SpatialQuery,
        columns: list[str] | None = None,
        lon_col: str = "lon",
        lat_col: str = "lat",
        authorizations: list[str] | set[str] | None = None,
        vis_col: str = "visibility",
    ):
        """Pruned scan -> coarse filter -> fine refine; returns a Dataset.
        ``authorizations``: reader labels — rows whose ``vis_col``
        expression is unsatisfied are dropped in the filter chain, the
        reference's per-row visibility semantics (core/store/.../data/
        visibility; readers pass authorizations per query)."""
        import ray

        # ray.data.read_parquet treats list entries as files — expand dirs
        paths = self._expand_paths(self._pruned_paths(query))
        if not paths:
            return ray.data.from_items([])
        read_cols = columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, lon_col, lat_col]))
            if authorizations is not None:
                read_cols.append(vis_col)
        # row-group predicate pushdown: files are Hilbert-sorted, so
        # lon/lat row-group statistics are spatially tight — pyarrow skips
        # whole row groups the bbox precludes.  Over-approximation only
        # (the coarse+fine filter chain below is unchanged); DISJOINT
        # needs rows OUTSIDE the box, so it scans unfiltered.
        scan_kwargs: dict = {}
        if query.op != "DISJOINT":
            import pyarrow.dataset as pds

            minx, miny, maxx, maxy = query.bbox()
            scan_kwargs["filter"] = (
                (pds.field(lon_col) >= minx)
                & (pds.field(lon_col) <= maxx)
                & (pds.field(lat_col) >= miny)
                & (pds.field(lat_col) <= maxy)
            )
        ds = ray.data.read_parquet(paths, columns=read_cols, **scan_kwargs)
        out = query.apply(ds, lon_col=lon_col, lat_col=lat_col)
        if authorizations is not None:
            from .stages.visibility import apply_visibility

            out = apply_visibility(out, authorizations, vis_col=vis_col)
        if columns is not None:
            out = out.select_columns(columns)
        return out

    # ------------------------------------------------------ integrity
    def record_integrity(self, id_col: str = "image_id") -> dict:
        """Persist per-partition ORDER-INDEPENDENT content checksums
        (XOR of splitmix64(id ^ mixed cell) over each partition's rows).
        XOR is commutative and file-layout-blind, so the checksum is
        invariant under compaction's file merges and row re-sorting —
        `verify_integrity` after a compact proves no row was lost,
        duplicated or moved across partitions (the scrub/consistency
        check every production store runs)."""
        import json

        import ray

        sums = self._partition_checksums(id_col)
        with open(os.path.join(self.root, "_integrity.json"), "w") as f:
            json.dump({"id_col": id_col, "partitions": sums}, f, sort_keys=True)
        return sums

    def verify_integrity(self) -> dict:
        """-> {partition: 'ok' | 'MISMATCH' | 'MISSING'} against the
        recorded manifest; any non-ok entry means rows changed."""
        import json

        with open(os.path.join(self.root, "_integrity.json")) as f:
            man = json.load(f)
        now = self._partition_checksums(man["id_col"])
        out = {}
        for part, want in man["partitions"].items():
            if part not in now:
                out[part] = "MISSING"
            elif now[part] != want:
                out[part] = "MISMATCH"
            else:
                out[part] = "ok"
        for part in now:
            if part not in man["partitions"]:
                out[part] = "MISMATCH"  # new rows appeared
        return out

    def _partition_checksums(self, id_col: str) -> dict:
        """Distributed per-(tier, cell_prefix) XOR checksums."""
        import ray

        from .stages.texthash import splitmix64

        parts = {}
        dirs = []
        for d in sorted(os.listdir(self.root)):
            if not d.startswith("tier="):
                continue
            tdir = os.path.join(self.root, d)
            subs = [
                os.path.join(tdir, p)
                for p in sorted(os.listdir(tdir))
                if p.startswith("cell_prefix=")
            ] or [tdir]
            dirs.extend(subs)
        for pd in dirs:
            files = self._expand_paths([pd])
            if not files:
                continue
            ds = ray.data.read_parquet(files, columns=[id_col, "cell"])

            def chk(batch: pa.Table, _c=id_col) -> pa.Table:
                v = batch.column(_c).to_numpy(zero_copy_only=False).astype(np.uint64)
                cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
                h = splitmix64(v ^ splitmix64(cell))
                x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
                return pa.table(
                    {"x": pa.array([np.int64(x)]), "n": pa.array([len(h)], pa.int64())}
                )

            chk.__name__ = "integrity_chk"
            df = ds.map_batches(chk, batch_format="pyarrow").to_pandas()
            xor = np.uint64(0)
            rows = 0
            if len(df):
                for xv in df["x"].to_numpy().astype(np.int64):
                    xor ^= np.uint64(xv)
                rows = int(df["n"].sum())
            parts[os.path.relpath(pd, self.root)] = {
                "xor": int(np.int64(xor)),
                "rows": rows,
            }
        return parts

    # ------------------------------------------------------- snapshots
    def snapshot(self, note: str = "") -> int:
        """Record the CURRENT live file set as an immutable version
        manifest (`_versions/v{N}.json`) — append-time travel: a query
        pinned to version N sees exactly the rows ingested up to that
        snapshot, because later ingests only ADD files.  Destructive
        ops (delete / compact) rewrite files in place, so older
        snapshots naming rewritten files become UNREADABLE by design;
        `query_at` verifies and raises naming the missing file instead
        of silently returning partial data (the honest contract without
        copy-on-write).  Returns the version number."""
        import json
        import time as _time

        vdir = os.path.join(self.root, "_versions")
        os.makedirs(vdir, exist_ok=True)
        existing = [
            int(f[1:-5]) for f in os.listdir(vdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        ver = max(existing, default=0) + 1
        files = []
        for base, _dirs, names in os.walk(self.root):
            if "_versions" in base:
                continue
            for nm in names:
                if nm.endswith(".parquet"):
                    p = os.path.join(base, nm)
                    files.append(
                        {"path": os.path.relpath(p, self.root),
                         "size": os.path.getsize(p)}
                    )
        tmp = os.path.join(vdir, f".v{ver}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"version": ver, "note": note, "recorded_at": _time.time(),
                 "files": sorted(files, key=lambda d: d["path"])},
                f,
            )
        os.replace(tmp, os.path.join(vdir, f"v{ver}.json"))
        return ver

    def query_at(self, version: int, query: SpatialQuery, **kwargs):
        """``query`` restricted to the file set of snapshot ``version``
        (intersected with the normal tier/prefix pruning).  Raises
        FileNotFoundError naming the first file a later destructive op
        rewrote."""
        import json

        vpath = os.path.join(self.root, "_versions", f"v{version}.json")
        with open(vpath) as f:
            man = json.load(f)
        live = {}
        for ent in man["files"]:
            p = os.path.join(self.root, ent["path"])
            if not os.path.exists(p) or os.path.getsize(p) != ent["size"]:
                raise FileNotFoundError(
                    f"snapshot v{version} references {ent['path']} which a "
                    "later delete/compact rewrote; snapshots only survive "
                    "append-only history"
                )
            live[p] = True
        import ray

        pruned = set(self._expand_paths(self._pruned_paths(query)))
        paths = sorted(p for p in live if p in pruned)
        if not paths:
            return ray.data.from_items([])
        ds = ray.data.read_parquet(paths)
        return query.apply(ds, **{k: v for k, v in kwargs.items() if k in ("lon_col", "lat_col")})

    def delete(
        self,
        query: SpatialQuery,
        lon_col: str = "lon",
        lat_col: str = "lat",
    ):
        """Delete matching rows (DataStore.delete / GWQL DELETE backend):
        ONLY the pruned (tier, cell_prefix) partition files of the primary
        layout are rewritten, distributed one file per task (atomic
        tmp+rename, so a failed run can simply re-run).  The secondary
        ``_id_idx`` layout (when present) is rewritten with the same
        predicate — its hash-by-id partitioning can't be spatially pruned,
        so every idx file is visited (still one file per task) — and the
        persisted statistics manifest is refreshed: count decremented,
        bbox/hot-cell stats kept as valid supersets but flagged stale.
        Returns a pandas DataFrame of per-file
        (path, rows_before, rows_after)."""
        import ray

        from .geom.predicates import points_in_polygon

        files = self._expand_paths(self._pruned_paths(query))
        if not files:
            # primary pruning is over-inclusive, so an empty prune means no
            # row matches anywhere — the idx layout needs no rewrite either
            import pandas as pd

            return pd.DataFrame(columns=["path", "rows_before", "rows_after"])
        idx_root = os.path.join(self.root, "_id_idx")
        if os.path.isdir(idx_root):
            idx_parts = [
                os.path.join(idx_root, d)
                for d in os.listdir(idx_root)
                if d.startswith("idp=")
            ]
            files = files + self._expand_paths(idx_parts)
        attr_root = os.path.join(self.root, "_attr_idx")
        if os.path.isdir(attr_root):
            for c in os.listdir(attr_root):
                files = files + self._expand_paths([os.path.join(attr_root, c)])
        geom = query.geometry
        tr = query.time_range

        def rewrite(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            out_p, out_b, out_a = [], [], []
            for path in batch.column("path").to_pylist():
                t = pq.read_table(path)
                lon = t.column(lon_col).to_numpy(zero_copy_only=False)
                lat = t.column(lat_col).to_numpy(zero_copy_only=False)
                matched = points_in_polygon(lon, lat, geom, include_boundary=True)
                if tr is not None and "ts" in t.column_names:
                    tsv = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
                    matched &= (tsv >= tr[0]) & (tsv <= tr[1])
                kept = t.filter(pa.array(~matched))
                if len(kept) != len(t):
                    tmp = path + ".tmp"
                    pq.write_table(kept, tmp)
                    os.replace(tmp, path)
                out_p.append(path)
                out_b.append(len(t))
                out_a.append(len(kept))
            return pa.table(
                {
                    "path": pa.array(out_p),
                    "rows_before": pa.array(out_b, type=pa.int64()),
                    "rows_after": pa.array(out_a, type=pa.int64()),
                }
            )

        rewrite.__name__ = "store_delete_rewrite"
        report = (
            ray.data.from_items([{"path": p} for p in files])
            .map_batches(rewrite, batch_format="pyarrow")
            .to_pandas()
        )
        # refresh the persisted statistics manifest (round-3 ADVICE: stats
        # went stale after delete).  count is exact (decremented by the
        # primary-layout deletions); bbox / hot-cell / histogram stats stay
        # valid SUPERSETS for pruning but are flagged stale.
        from .state.stats import load_statistics

        manifest = load_statistics(self.root)
        if manifest is not None and not report.empty:
            primary = report[
                ~report["path"].str.contains("/_id_idx/")
                & ~report["path"].str.contains("/_attr_idx/")
            ]
            deleted = int((primary["rows_before"] - primary["rows_after"]).sum())
            if deleted:
                if manifest.data.get("count", -1) >= 0:
                    manifest.data["count"] = manifest.data["count"] - deleted
                manifest.data["stale_after_delete"] = True
                manifest.save(self.root)
        return report

    def attribute_range(self, col: str, lo: float, hi: float, columns: list[str] | None = None):
        """Range query through the value-bucketed attribute index
        (AttributeIndex / OptimalExpressionQuery analog): only the bucket
        partitions intersecting [lo, hi] are read, then a vectorized
        refine."""
        import json

        import ray

        idx_dir = os.path.join(self.root, "_attr_idx", col)
        if not os.path.isdir(idx_dir):
            raise ValueError(f"no attribute index on {col!r}; ingest(attr_index_cols=[...])")
        with open(os.path.join(idx_dir, "_meta.json")) as f:
            meta = json.load(f)
        width = (meta["hi"] - meta["lo"]) / meta["n_buckets"] or 1.0
        b_lo = int(np.clip(np.floor((lo - meta["lo"]) / width), 0, meta["n_buckets"] - 1))
        b_hi = int(np.clip(np.floor((hi - meta["lo"]) / width), 0, meta["n_buckets"] - 1))
        paths = [
            os.path.join(idx_dir, d)
            for d in os.listdir(idx_dir)
            if d.startswith("ab=") and b_lo <= int(d.split("=")[1]) <= b_hi
        ]
        if not paths:
            return ray.data.from_items([])
        read_cols = columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, col]))
        import pyarrow.dataset as pds

        ds = ray.data.read_parquet(
            self._expand_paths(paths),
            columns=read_cols,
            # row-group pushdown inside the selected buckets (files are
            # value-clustered by bucket, so stats prune further)
            filter=(pds.field(col) >= lo) & (pds.field(col) <= hi),
        )

        def refine(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((v >= lo) & (v <= hi)))

        refine.__name__ = "attr_range_refine"
        out = ds.map_batches(refine, batch_format="pyarrow")
        if columns is not None:
            out = out.select_columns(columns)
        return out

    def lookup(self, ids: list, id_col: str = "image_id"):
        """DataIdQuery analog: point lookup by data id.  When the secondary
        id-keyed layout exists (``ingest(id_index_col=...)``), only the
        hash partitions containing the wanted ids are read
        (BatchDataIndexRetrieval); otherwise a vectorized full-store
        filter."""
        import ray

        import pyarrow.dataset as pds

        wanted = pa.array(list(ids))
        # id-set pushdown: row groups whose id stats preclude every wanted
        # id are skipped (BatchDataIndexRetrieval's server-side filter)
        id_filter = pds.field(id_col).isin(list(ids))
        idx_root = os.path.join(self.root, "_id_idx")
        if os.path.isdir(idx_root):
            parts = set(self._id_partitions(list(ids)).tolist())
            paths = [
                os.path.join(idx_root, d)
                for d in os.listdir(idx_root)
                if d.startswith("idp=") and int(d.split("=")[1]) in parts
            ]
            if not paths:
                return ray.data.from_items([])
            ds = ray.data.read_parquet(self._expand_paths(paths), filter=id_filter)
        else:
            ds = ray.data.read_parquet(self.root, filter=id_filter)

        def keep(batch: pa.Table) -> pa.Table:
            col = batch.column(id_col)
            if col.type != wanted.type:
                col = col.cast(wanted.type)
            return batch.filter(pa.compute.is_in(col, value_set=wanted))

        keep.__name__ = "data_id_lookup"
        return ds.map_batches(keep, batch_format="pyarrow")


class BinnedStore:
    """GeoStore sibling for UNBOUNDED custom-CRS data: the keyed layout
    partitions by the (bx, by) bin ordinals of a ``BinnedCrsStrategy``
    plus a cell prefix within the bin — the reference's unbounded
    custom-CRS index materialized as a store
    (SpatialDimensionalityTypeProvider.java:130-224 unbounded variants:
    axes bin like time periodicity, keys carry the bin id).  Queries
    prune to the bin directories the range decomposition touches, then
    to cell-prefix directories inside each bin."""

    def compact(self, sort_col: str = "cell", min_files: int = 2):
        """Merge each bin partition's files into one clustered file (see
        ``compact_store``)."""
        return compact_store(self.root, sort_col=sort_col, min_files=min_files)

    def __init__(self, root: str, strategy, prefix_bits: int = 6, x_col: str = "x", y_col: str = "y"):
        self.root = root
        self.strategy = strategy
        self.prefix_bits = prefix_bits
        self.x_col = x_col
        self.y_col = y_col

    def _shift(self) -> int:
        return max(2 * self.strategy.bits - 2 * self.prefix_bits, 0)

    def ingest(self, ds) -> str:
        strat = self.strategy
        x_col, y_col, shift = self.x_col, self.y_col, self._shift()

        def encode(batch: pa.Table) -> pa.Table:
            bx, by, cells = strat.encode_points(
                batch.column(x_col).to_numpy(zero_copy_only=False),
                batch.column(y_col).to_numpy(zero_copy_only=False),
            )
            return (
                batch.append_column("bx", pa.array(bx))
                .append_column("by", pa.array(by))
                .append_column("cell", pa.array(cells, type=pa.uint64()))
                .append_column("pfx", pa.array((cells >> np.uint64(shift)).astype(np.int64)))
            )

        encode.__name__ = "binned_crs_encode"
        # Partition DIRS by bin only; the cell prefix stays a clustered
        # sort column inside each bin's files (pyarrow caps a written
        # fragment at 1024 partition dirs — sparse data makes
        # (bin x prefix) cardinality approach the row count).  Bin dirs
        # do the spatial pruning; within-bin curve locality comes from
        # the sort order (row-group stats prune further on engines that
        # push filters).
        ds.map_batches(encode, batch_format="pyarrow").sort(
            ["bx", "by", "pfx"]
        ).write_parquet(self.root, partition_cols=["bx", "by"])
        return self.root

    def query(self, box, columns: list[str] | None = None):
        """box = (minx, miny, maxx, maxy) in native coordinates."""
        import ray

        minx, miny, maxx, maxy = box
        ranges = self.strategy.query_ranges([(minx, maxx), (miny, maxy)], 256)
        bins = {(int(bx), int(by)) for bx, by, _, _ in ranges}
        files = []
        for bx, by in bins:
            bdir = os.path.join(self.root, f"bx={bx}", f"by={by}")
            if not os.path.isdir(bdir):
                continue
            for base, _, names in os.walk(bdir):
                files.extend(os.path.join(base, n) for n in names if n.endswith(".parquet"))
        if not files:
            return ray.data.from_items([])
        read_cols = columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, self.x_col, self.y_col]))
        import pyarrow.dataset as pds

        ds = ray.data.read_parquet(
            sorted(files),
            columns=read_cols,
            # row-group pushdown: files are (bx, by, pfx)-sorted, so x/y
            # stats are spatially tight within each bin
            filter=(pds.field(self.x_col) >= minx)
            & (pds.field(self.x_col) <= maxx)
            & (pds.field(self.y_col) >= miny)
            & (pds.field(self.y_col) <= maxy),
        )
        x_col, y_col = self.x_col, self.y_col

        def refine(batch: pa.Table) -> pa.Table:
            x = batch.column(x_col).to_numpy(zero_copy_only=False)
            y = batch.column(y_col).to_numpy(zero_copy_only=False)
            m = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
            return batch.filter(pa.array(m))

        refine.__name__ = "binned_box_refine"
        out = ds.map_batches(refine, batch_format="pyarrow")
        if columns is not None:
            out = out.select_columns(columns)
        return out


# ------------------------------------------------------------- compaction
def compact_store(root: str, sort_col: str = "cell", min_files: int = 2):
    """Merge every partition directory's parquet files into ONE
    ``sort_col``-clustered file — the analog of the reference backend's
    table compaction (Accumulo majc over GeoWave tables): repeated
    ingest/delete cycles leave one file per write task per partition,
    and scan cost grows with file count, not row count.

    Crash-safe swap protocol (per partition dir ``d``):
      1. merged file written under ``root/_compact_tmp/<key>``
      2. ``rename(d, root/_compact_old/<key>)`` then ``rename(tmp, d)``
      3. files that landed in ``d`` AFTER the merge snapshot (a concurrent
         ingest) are moved from the old dir into the new one
      4. old dir removed
    Readers never look inside ``_compact_*``, and ``_recover_compaction``
    (run first) restores or clears any dir stranded between renames, so
    re-running after a crash converges.  Like the reference backend's
    major compaction, at most ONE compactor may run per store root at a
    time (concurrent writers are safe — step 3 preserves their files;
    concurrent compactors are not).  Distributed: one partition per task
    over a Dataset of dir paths.  Returns a pandas DataFrame of
    (dir, files_before, rows)."""
    import shutil

    import pandas as pd
    import ray

    _recover_compaction(root)
    skip = {"_compact_tmp", "_compact_old"}
    work = []
    for base, dirnames, names in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in skip]
        pq_files = [n for n in names if n.endswith(".parquet")]
        if len(pq_files) >= min_files:
            work.append(os.path.relpath(base, root))
    if not work:
        return pd.DataFrame(columns=["dir", "files_before", "rows"])

    def merge(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_d, out_f, out_r = [], [], []
        for rel in batch.column("dir").to_pylist():
            d = os.path.join(root, rel)
            names = sorted(n for n in os.listdir(d) if n.endswith(".parquet"))
            files = [os.path.join(d, n) for n in names]
            key = _compact_key(rel)
            tmp = os.path.join(root, "_compact_tmp", key)
            old = os.path.join(root, "_compact_old", key)
            for side in (tmp, old):
                if os.path.isdir(side):
                    shutil.rmtree(side)
            os.makedirs(tmp)
            os.makedirs(os.path.dirname(old), exist_ok=True)
            merged = pa.concat_tables([pq.read_table(f) for f in files])
            if sort_col in merged.column_names:
                merged = merged.sort_by(sort_col)
            pq.write_table(merged, os.path.join(tmp, "compacted-0.parquet"))
            # sidecar records which source files the merge covered, so the
            # salvage step (here or in crash recovery) can tell late
            # concurrent writes apart from merged sources
            import json as _json

            with open(os.path.join(tmp, _SNAPSHOT_NAME), "w") as f:
                _json.dump(names, f)
            os.rename(d, old)
            os.rename(tmp, d)
            _salvage_late_files(d, old)
            shutil.rmtree(old)
            os.remove(os.path.join(d, _SNAPSHOT_NAME))
            out_d.append(rel)
            out_f.append(len(files))
            out_r.append(len(merged))
        return pa.table(
            {
                "dir": pa.array(out_d),
                "files_before": pa.array(out_f, type=pa.int64()),
                "rows": pa.array(out_r, type=pa.int64()),
            }
        )

    merge.__name__ = "compact_partition"
    res = (
        ray.data.from_items([{"dir": d} for d in work])
        .map_batches(merge, batch_format="pyarrow")
        .to_pandas()
    )
    for side in ("_compact_tmp", "_compact_old"):
        p = os.path.join(root, side)
        if os.path.isdir(p) and not os.listdir(p):
            os.rmdir(p)
    return res


_SNAPSHOT_NAME = "_compacted_sources.json"


def _salvage_late_files(new_dir: str, old_dir: str) -> None:
    """Move files a concurrent ingest wrote into the partition AFTER the
    merge snapshot (swept into ``old_dir`` by the swap rename) back into
    the live dir; merged-source files stay behind for removal."""
    import json as _json

    snap_path = os.path.join(new_dir, _SNAPSHOT_NAME)
    if not os.path.exists(snap_path):
        # no snapshot record -> cannot tell late files from merged sources;
        # treat everything as merged (never resurrect duplicates)
        return
    with open(snap_path) as f:
        snap = set(_json.load(f))
    for n in os.listdir(old_dir):
        if n not in snap:
            os.rename(os.path.join(old_dir, n), os.path.join(new_dir, n))


def _compact_key(rel: str) -> str:
    """Reversible flat key for a partition relpath (percent-encoding —
    a plain separator substitution collides when partition names contain
    the substitute)."""
    from urllib.parse import quote

    return quote(rel, safe="")


def _compact_key_decode(key: str) -> str:
    from urllib.parse import unquote

    return unquote(key)


def _recover_compaction(root: str) -> None:
    """Finish or roll back a compaction interrupted mid-swap."""
    import shutil

    old_root = os.path.join(root, "_compact_old")
    if os.path.isdir(old_root):
        for key in os.listdir(old_root):
            target = os.path.join(root, _compact_key_decode(key))
            src = os.path.join(old_root, key)
            if os.path.isdir(target):
                # swap completed; salvage late concurrent writes, then the
                # merged-source copies are redundant
                _salvage_late_files(target, src)
                shutil.rmtree(src)
                snap = os.path.join(target, _SNAPSHOT_NAME)
                if os.path.exists(snap):
                    os.remove(snap)
            else:
                os.rename(src, target)  # swap never happened; restore
    tmp_root = os.path.join(root, "_compact_tmp")
    if os.path.isdir(tmp_root):
        shutil.rmtree(tmp_root)  # partial merges are always safe to drop


