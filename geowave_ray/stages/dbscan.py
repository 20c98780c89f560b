"""DBSCAN density clustering (SURVEY §2.C).

Reference: MapReduce DBSCAN (analytics/mapreduce/.../dbscan/
DBScanMapReduce.java — iterative NN-based cluster union over
distance-sized partitions).  Ray-Data shape:

1. points -> eps-sized grid cells; every point is duplicated to its cell +
   ring-1 neighborhood (the OrthodromicDistancePartitioner neighbor-cell
   duplication), so every eps-neighborhood is fully contained in at least
   one group;
2. ``groupby(cell)`` -> per-group pairwise distances give per-point
   neighbor counts (partial) and core-core / core-border edges;
3. neighbor-count partials merge per point; edges between core points feed
   a union-find (driver-side here; at scale this is the standard
   iterated label-propagation groupby — partitioning assumption: cluster
   edge lists fit the driver, eps-cells bound group sizes).

Planar degree distance (matching the grid); haversine variant via the knn
module if needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["dbscan"]


def dbscan(
    ds,
    eps: float,
    min_pts: int = 5,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """-> pandas DataFrame (id, cluster) — cluster -1 = noise; cluster ids
    are min-member-id labeled (deterministic)."""
    import ray

    nx = max(int(360.0 / eps), 1)

    def to_cells(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col)
        cx = np.floor((lon + 180.0) / eps).astype(np.int64)
        cy = np.floor((lat + 90.0) / eps).astype(np.int64)
        out_idx, out_cell, out_owner = [], [], []
        n = len(batch)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                gx = cx + dx
                gy = cy + dy
                cell = gy * (nx + 2) + (gx % (nx + 2))
                out_idx.append(np.arange(n, dtype=np.int64))
                out_cell.append(cell)
                # a point is "owned" by its home cell: pairs are emitted only
                # in the home cell of the pair's min-id point to avoid dupes
                out_owner.append(np.full(n, dx == 0 and dy == 0))
        idx = np.concatenate(out_idx)
        return pa.table(
            {
                id_col: ids.take(pa.array(idx)),
                lon_col: batch.column(lon_col).take(pa.array(idx)),
                lat_col: batch.column(lat_col).take(pa.array(idx)),
                "cell": pa.array(np.concatenate(out_cell)),
                "home": pa.array(np.concatenate(out_owner)),
            }
        )

    to_cells.__name__ = "dbscan_cells"

    def per_cell(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist())
        x = group.column(lon_col).to_numpy(zero_copy_only=False)
        y = group.column(lat_col).to_numpy(zero_copy_only=False)
        home = group.column("home").to_numpy(zero_copy_only=False)
        n = len(ids)
        d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
        close = d2 <= eps * eps
        # neighbor count for HOME points only (each point counted once
        # globally; neighbors include replicas from ring cells)
        h_idx = np.nonzero(home)[0]
        counts = close[h_idx].sum(axis=1)  # includes self
        # edges between home points and any close point (dedupe later)
        rows = []
        for hi, c in zip(h_idx, counts):
            nb = np.nonzero(close[hi])[0]
            for j in nb:
                if ids[j] != ids[hi]:
                    a, b = sorted((str(ids[hi]), str(ids[j])))
                    rows.append((str(ids[hi]), int(c), a, b))
        if not rows:
            return pa.table(
                {
                    "pid": pa.array([str(i) for i in ids[h_idx]]),
                    "n_nb": pa.array([int(c) for c in counts], type=pa.int64()),
                    "e_a": pa.array([""] * len(h_idx)),
                    "e_b": pa.array([""] * len(h_idx)),
                }
            )
        return pa.table(
            {
                "pid": pa.array([r[0] for r in rows]),
                "n_nb": pa.array([r[1] for r in rows], type=pa.int64()),
                "e_a": pa.array([r[2] for r in rows]),
                "e_b": pa.array([r[3] for r in rows]),
            }
        )

    per_cell.__name__ = "dbscan_cell_pairs"

    cells = ds.map_batches(to_cells, batch_format="pyarrow")
    raw = cells.groupby("cell").map_groups(per_cell, batch_format="pyarrow").to_pandas()

    # merge: neighbor count per point (max over rows — counts repeat per edge)
    n_nb = raw.groupby("pid")["n_nb"].max()
    core = set(n_nb[n_nb >= min_pts].index)
    from .dedupe import union_find_keep_min

    # density-reachability: clusters merge only through CORE-CORE edges;
    # border points attach to their min core neighbor (never bridge)
    core_edges = []
    border_core: dict[str, str] = {}
    seen = set()
    for a, b in zip(raw["e_a"], raw["e_b"]):
        if not a or a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        a_core, b_core = a in core, b in core
        if a_core and b_core:
            core_edges.append((a, b))
        elif a_core:
            border_core[b] = min(border_core.get(b, a), a)
        elif b_core:
            border_core[a] = min(border_core.get(a, b), b)
    comp = union_find_keep_min(sorted(core), core_edges)
    import pandas as pd

    pids = sorted(n_nb.index)
    clusters = []
    for p in pids:
        if p in core:
            clusters.append(comp[p])
        elif p in border_core:
            clusters.append(comp[border_core[p]])
        else:
            clusters.append("-1")
    return pd.DataFrame({"pid": pids, "cluster": clusters})
