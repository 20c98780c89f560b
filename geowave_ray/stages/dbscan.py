"""DBSCAN density clustering (SURVEY §2.C) — fully distributed, two-pass.

Reference: MapReduce DBSCAN (analytics/mapreduce/.../dbscan/
DBScanMapReduce.java — iterative NN-based cluster union over
distance-sized partitions).  Ray-Data shape:

PASS 1 (counts): points -> eps grid cells with ring-1 duplication
(OrthodromicDistancePartitioner); ``groupby(cell)`` computes each HOME
point's eps-neighbor count vectorized -> core flags (one row per point).

PASS 2 (spanning edges): core flags join back onto the points (a join of
POINTS, never of edges), the flagged points re-duplicate to cells, and
each cell group runs a LOCAL union-find over its core-core close pairs —
emitting only the SPANNING star edges (member -> local root) plus, per
border point, one edge to each distinct local root among its close cores.
A dense blob therefore emits O(n) edges instead of the O(n * avg_degree)
all-pairs list (the round-2 scale fix: 100k clustered points -> ~1M edge
rows instead of ~34M).

Cluster labels: distributed iterated min-label propagation over the
spanning edges (stages/components — no driver union-find); border points
take the min component label among their core neighbors; else noise (-1).
Every join is a native hash ``Dataset.join``.  Planar degree distance
(matching the grid); haversine variant via the knn module if needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .components import connected_components_min_label
from .util import safe_join

__all__ = ["dbscan"]


def _cell_dup(pid, lon, lat, extra_cols: dict, eps: float, nx: int):
    cx = np.floor((lon + 180.0) / eps).astype(np.int64)
    cy = np.floor((lat + 90.0) / eps).astype(np.int64)
    n = len(pid)
    cells, homes = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cells.append((cy + dy) * nx + (cx + dx))
            homes.append(np.full(n, dx == 0 and dy == 0))
    idx = np.tile(np.arange(n), 9)
    cols = {
        "pid": pa.array(pid[idx]),
        "x": pa.array(lon[idx]),
        "y": pa.array(lat[idx]),
        "cell": pa.array(np.concatenate(cells)),
        "home": pa.array(np.concatenate(homes)),
    }
    for name, arr in extra_cols.items():
        cols[name] = pa.array(arr[idx])
    return pa.table(cols)


def dbscan(
    ds,
    eps: float,
    min_pts: int = 5,
    id_col: str = "pid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cc_rounds: int | None = None,
    n_hint: int | None = None,
    num_partitions: int = 16,
):
    """-> Dataset (pid:int64, cluster:int64); cluster -1 = noise; cluster
    ids are min-member-id labels (deterministic).  ``id_col`` must be
    integer-typed — at corpus scale labels stay integers end-to-end."""
    nx = max(int(360.0 / eps), 1) + 2

    def to_cells(batch: pa.Table) -> pa.Table:
        return _cell_dup(
            batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64),
            batch.column(lon_col).to_numpy(zero_copy_only=False),
            batch.column(lat_col).to_numpy(zero_copy_only=False),
            {},
            eps,
            nx,
        )

    to_cells.__name__ = "dbscan_cells"

    # ---------------- pass 1: per-point neighbor counts -> core flags
    def count_cell(group: pa.Table) -> pa.Table:
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        home = group.column("home").to_numpy(zero_copy_only=False)
        pid = group.column("pid").to_numpy(zero_copy_only=False)
        h_idx = np.nonzero(home)[0]
        d2 = (x[h_idx, None] - x[None, :]) ** 2 + (y[h_idx, None] - y[None, :]) ** 2
        counts = (d2 <= eps * eps).sum(axis=1)  # incl. self
        return pa.table(
            {
                "pid": pa.array(pid[h_idx]),
                "is_core": pa.array((counts >= min_pts).astype(np.int64)),
            }
        )

    count_cell.__name__ = "dbscan_counts"
    pts0 = ds.materialize()
    flags = (
        pts0.map_batches(to_cells, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(count_cell, batch_format="pyarrow")
        .materialize()
    )

    # ---------------- pass 2: flagged points -> spanning edges
    def point_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pid": batch.column(id_col).cast(pa.int64()),
                "x": batch.column(lon_col),
                "y": batch.column(lat_col),
            }
        )

    point_cols.__name__ = "dbscan_point_cols"
    flagged = safe_join(
        pts0.map_batches(point_cols, batch_format="pyarrow"),
        flags,
        "inner",
        num_partitions,
        on=("pid",),
        left_schema=pa.schema(
            [("pid", pa.int64()), ("x", pa.float64()), ("y", pa.float64())]
        ),
        right_schema=pa.schema([("pid", pa.int64()), ("is_core", pa.int64())]),
    )

    def to_cells2(batch: pa.Table) -> pa.Table:
        return _cell_dup(
            batch.column("pid").to_numpy(zero_copy_only=False),
            batch.column("x").to_numpy(zero_copy_only=False),
            batch.column("y").to_numpy(zero_copy_only=False),
            {"is_core": batch.column("is_core").to_numpy(zero_copy_only=False)},
            eps,
            nx,
        )

    to_cells2.__name__ = "dbscan_cells_flagged"

    def span_cell(group: pa.Table) -> pa.Table:
        """Local contraction: spanning star edges over this group's
        core-core close graph + (border -> local core root) edges.
        kind 0 = core-core spanning edge, kind 1 = border edge."""
        empty = pa.table(
            {
                "kind": pa.array([], type=pa.int64()),
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
            }
        )
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        pid = group.column("pid").to_numpy(zero_copy_only=False)
        home = group.column("home").to_numpy(zero_copy_only=False)
        core = group.column("is_core").to_numpy(zero_copy_only=False) == 1
        h_idx = np.nonzero(home)[0]
        if len(h_idx) == 0:
            return empty
        d2 = (x[h_idx, None] - x[None, :]) ** 2 + (y[h_idx, None] - y[None, :]) ** 2
        close = d2 <= eps * eps
        core_pids = pid[core]
        out_k, out_a, out_b = [], [], []
        root_of: dict[int, int] = {}
        hc_rows = np.nonzero(core[h_idx])[0]  # home cores (rows of close)
        if len(hc_rows) and len(core_pids):
            sub = close[hc_rows][:, core]  # (home cores, all cores in group)
            parent: dict[int, int] = {}

            def find(v: int) -> int:
                r = v
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(v, v) != v:
                    parent[v], v = r, parent[v]
                return r

            hi, j = np.nonzero(sub)
            src = pid[h_idx[hc_rows[hi]]]
            dst = core_pids[j]
            for a_, b_ in zip(src.tolist(), dst.tolist()):
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    lo, hi2 = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi2] = lo
            members = np.unique(np.concatenate([src, dst]))
            roots = np.fromiter(
                (find(int(v)) for v in members), dtype=np.int64, count=len(members)
            )
            # star edges member <-> root (self-loops harmless, ensure every
            # core node appears in the component input)
            out_k.append(np.zeros(len(members), dtype=np.int64))
            out_a.append(members)
            out_b.append(roots)
            root_of = dict(zip(members.tolist(), roots.tolist()))
        # border: home non-core -> distinct local roots among close cores
        hb_rows = np.nonzero(~core[h_idx])[0]
        if len(hb_rows) and len(core_pids):
            subb = close[hb_rows][:, core]
            bi, j = np.nonzero(subb)
            if len(bi):
                bpid = pid[h_idx[hb_rows[bi]]]
                croot = np.fromiter(
                    (root_of.get(int(c), int(c)) for c in core_pids[j]),
                    dtype=np.int64,
                    count=len(j),
                )
                uniq = np.unique(np.stack([bpid, croot]), axis=1)
                out_k.append(np.ones(uniq.shape[1], dtype=np.int64))
                out_a.append(uniq[0])
                out_b.append(uniq[1])
        if not out_a:
            return empty
        return pa.table(
            {
                "kind": pa.array(np.concatenate(out_k)),
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )

    span_cell.__name__ = "dbscan_span"
    spans = (
        flagged.map_batches(to_cells2, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(span_cell, batch_format="pyarrow")
        .materialize()
    )

    def take(kind):
        def f(batch: pa.Table) -> pa.Table:
            b = batch.filter(pa.compute.equal(batch.column("kind"), pa.scalar(kind)))
            return pa.table({"e_a": b.column("a"), "e_b": b.column("b")})

        f.__name__ = f"dbscan_take{kind}"
        return f

    labels = connected_components_min_label(
        spans.map_batches(take(0), batch_format="pyarrow"),
        rounds=cc_rounds,
        n_hint=n_hint,
        num_partitions=num_partitions,
    ).materialize()  # (node, label) over every core point

    # border: min component label among core-neighbor local roots
    def border_cols(batch: pa.Table) -> pa.Table:
        b = batch.filter(pa.compute.equal(batch.column("kind"), pa.scalar(1)))
        return pa.table({"pid": b.column("a"), "node": b.column("b")})

    border_cols.__name__ = "dbscan_border_cols"
    bj = safe_join(
        spans.map_batches(border_cols, batch_format="pyarrow"),
        labels,
        "inner",
        num_partitions,
        on=("node",),
        left_schema=pa.schema([("pid", pa.int64()), ("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
    )
    border = bj.select_columns(["pid", "label"]).groupby("pid").min("label")

    def rename(cols):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(cols)

        f.__name__ = "rename_" + "_".join(cols)
        return f

    border = border.map_batches(rename(["pid", "blab"]), batch_format="pyarrow")

    # assemble: flags (all points) left-join core labels, left-join border
    lab_core = labels.map_batches(rename(["pid", "clab"]), batch_format="pyarrow")
    a1 = safe_join(
        flags, lab_core, "left_outer", num_partitions, on=("pid",),
        left_schema=pa.schema([("pid", pa.int64()), ("is_core", pa.int64())]),
        right_schema=pa.schema([("pid", pa.int64()), ("clab", pa.int64())]),
    )
    a2 = safe_join(
        a1, border, "left_outer", num_partitions, on=("pid",),
        left_schema=pa.schema(
            [("pid", pa.int64()), ("is_core", pa.int64()), ("clab", pa.int64())]
        ),
        right_schema=pa.schema([("pid", pa.int64()), ("blab", pa.int64())]),
    )

    def assemble(batch: pa.Table) -> pa.Table:
        pid = batch.column("pid").to_numpy(zero_copy_only=False).astype(np.int64)
        is_core = batch.column("is_core").to_numpy(zero_copy_only=False) == 1
        clab_null = np.asarray(batch.column("clab").is_null())
        blab_null = np.asarray(batch.column("blab").is_null())
        clab = np.asarray(
            batch.column("clab").fill_null(0).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        blab = np.asarray(
            batch.column("blab").fill_null(0).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        out = np.full(len(pid), -1, dtype=np.int64)
        core_lab = np.where(clab_null, pid, clab)  # isolated core: own id
        out[is_core] = core_lab[is_core]
        m_border = ~is_core & ~blab_null
        out[m_border] = blab[m_border]
        return pa.table({"pid": pa.array(pid), "cluster": pa.array(out)})

    assemble.__name__ = "dbscan_assemble"
    return a2.map_batches(assemble, batch_format="pyarrow")
