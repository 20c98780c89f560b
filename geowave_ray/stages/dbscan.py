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

Cluster labels: min-label components over the spanning edges
(stages/components — capped driver union-find for contracted edge sets
that fit, iterated star contraction beyond); border points take the min
component label among their core neighbors; else noise (-1).  Final
assembly broadcasts the (small) label/border lookup tables into ONE
map_batches over the flags when they fit under ``broadcast_cap``; the
hash-join path remains for corpora whose label table is itself huge.
Planar degree distance (matching the grid); haversine via knn if needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .components import connected_components_min_label
from .util import collect_table, safe_join

__all__ = ["dbscan"]


def _cell_dup(pid, lon, lat, extra_cols: dict, eps: float, nx: int, s: float):
    """Duplicate points to neighbor grid cells SELECTIVELY: with cell size
    ``s`` (= cell_mult * eps, cell_mult >= 1), a point replicates into a
    neighbor cell only when it lies within eps of that cell's boundary —
    exactly the set of foreign points a home point there could be within
    eps of.  At cell_mult=2 the expected replication factor is
    (1 + 2*eps/s)^2 = 4 instead of the full ring's 9."""
    n = len(pid)
    X = lon + 180.0
    Y = lat + 90.0
    cx = np.floor(X / s).astype(np.int64)
    cy = np.floor(Y / s).astype(np.int64)
    ox = X - cx * s
    oy = Y - cy * s
    masks_x = {-1: ox <= eps, 0: np.ones(n, dtype=bool), 1: ox >= s - eps}
    masks_y = {-1: oy <= eps, 0: np.ones(n, dtype=bool), 1: oy >= s - eps}
    idx_parts, cell_parts, home_parts = [], [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                idx = np.arange(n)
                home = np.ones(n, dtype=bool)
            else:
                idx = np.nonzero(masks_x[dx] & masks_y[dy])[0]
                if len(idx) == 0:
                    continue
                home = np.zeros(len(idx), dtype=bool)
            idx_parts.append(idx)
            cell_parts.append((cy[idx] + dy) * nx + (cx[idx] + dx))
            home_parts.append(home)
    idx = np.concatenate(idx_parts)
    cols = {
        "pid": pa.array(pid[idx]),
        "x": pa.array(lon[idx]),
        "y": pa.array(lat[idx]),
        "cell": pa.array(np.concatenate(cell_parts)),
        "home": pa.array(np.concatenate(home_parts)),
    }
    for name, arr in extra_cols.items():
        cols[name] = pa.array(arr[idx])
    return pa.table(cols)


def _close_rows(xh, yh, x, y, eps2, out=None, chunk=96):
    """Boolean close matrix (len(xh), len(x)) computed in row chunks so the
    float64 distance temporaries stay cache-resident instead of
    materializing an O(home x group) d2 matrix (memory-bandwidth was the
    pass-1/2 bottleneck at sf0.1)."""
    m, n = len(xh), len(x)
    if out is None:
        out = np.empty((m, n), dtype=bool)
    xr, yr = x[None, :], y[None, :]
    for i in range(0, m, chunk):
        dx = xh[i : i + chunk, None] - xr
        dy = yh[i : i + chunk, None] - yr
        dx *= dx
        dy *= dy
        dx += dy
        np.less_equal(dx, eps2, out=out[i : i + chunk])
    return out


def _count_rows(xh, yh, x, y, eps2, chunk=96):
    """Per-home-row count of close points (incl. self), chunked like
    _close_rows but without materializing the boolean matrix."""
    m = len(xh)
    counts = np.empty(m, dtype=np.int64)
    xr, yr = x[None, :], y[None, :]
    for i in range(0, m, chunk):
        dx = xh[i : i + chunk, None] - xr
        dy = yh[i : i + chunk, None] - yr
        dx *= dx
        dy *= dy
        dx += dy
        counts[i : i + chunk] = (dx <= eps2).sum(axis=1)
    return counts


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
    cell_mult: float = 1.0,
    broadcast_cap: int = 5_000_000,
):
    """-> Dataset (pid:int64, cluster:int64); cluster -1 = noise; cluster
    ids are min-member-id labels (deterministic).  ``id_col`` must be
    integer-typed — at corpus scale labels stay integers end-to-end.
    ``cell_mult``: grid cell size as a multiple of eps; >1 trades bigger
    per-cell groups for fewer boundary replicas (see _cell_dup).
    ``broadcast_cap``: when the core-label and border-edge tables fit
    under this row count, the final label assembly runs as ONE broadcast
    map_batches over the flags instead of three hash joins + a groupby
    (the joins remain the fallback for corpora whose label table itself
    is too big to broadcast)."""
    s = cell_mult * eps
    nx = max(int(360.0 / s), 1) + 2

    def to_cells(batch: pa.Table) -> pa.Table:
        return _cell_dup(
            batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64),
            batch.column(lon_col).to_numpy(zero_copy_only=False),
            batch.column(lat_col).to_numpy(zero_copy_only=False),
            {},
            eps,
            nx,
            s,
        )

    to_cells.__name__ = "dbscan_cells"

    # ---------------- pass 1: per-point neighbor counts -> core flags
    def count_cell(group: pa.Table) -> pa.Table:
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        home = group.column("home").to_numpy(zero_copy_only=False)
        pid = group.column("pid").to_numpy(zero_copy_only=False)
        h_idx = np.nonzero(home)[0]
        counts = _count_rows(x[h_idx], y[h_idx], x, y, eps * eps)  # incl. self
        # x/y ride along so pass 2 re-duplicates STRAIGHT from the flags —
        # no flags->points hash join (each home point appears exactly once
        # across home cells, so this IS the point table, flagged)
        return pa.table(
            {
                "pid": pa.array(pid[h_idx]),
                "x": pa.array(x[h_idx]),
                "y": pa.array(y[h_idx]),
                "is_core": pa.array((counts >= min_pts).astype(np.int64)),
            }
        )

    count_cell.__name__ = "dbscan_counts"
    import os as _os
    import time as _time

    _dbg = _os.environ.get("GEOWAVE_DEBUG_TIMING")
    _t0 = _time.time()
    flags = (
        ds.map_batches(to_cells, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(count_cell, batch_format="pyarrow")
        .materialize()
    )
    if _dbg:
        print(f"[dbscan] pass1 core flags: {_time.time()-_t0:.1f}s", flush=True)
        _t0 = _time.time()

    # ---------------- pass 2: flagged points -> spanning edges (flags
    # already carry x/y — no join back to the point table)
    flagged = flags

    def to_cells2(batch: pa.Table) -> pa.Table:
        return _cell_dup(
            batch.column("pid").to_numpy(zero_copy_only=False),
            batch.column("x").to_numpy(zero_copy_only=False),
            batch.column("y").to_numpy(zero_copy_only=False),
            {"is_core": batch.column("is_core").to_numpy(zero_copy_only=False)},
            eps,
            nx,
            s,
        )

    to_cells2.__name__ = "dbscan_cells_flagged"

    # Subcells of side eps/sqrt(2) are cliques under planar eps-distance
    # (diagonal == eps), so all cores in one subcell contract for free;
    # inter-subcell connectivity is read off the close matrix aggregated
    # per subcell, leaving a tiny (<= ~dozens of nodes) exact union-find.
    sub_side = eps / np.sqrt(2.0)
    sub_nx = int(np.ceil(360.0 / sub_side)) + 3

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
        close = _close_rows(x[h_idx], y[h_idx], x, y, eps * eps)
        c_idx = np.nonzero(core)[0]
        core_pids = pid[c_idx]
        out_k, out_a, out_b = [], [], []
        ug = roots = None  # per-subcell local roots over the group's cores
        hc_rows = np.nonzero(core[h_idx])[0]  # home cores (rows of close)
        if len(c_idx):
            # subcell id per core; rep = min pid in subcell (clique)
            g_core = (
                np.floor((y[c_idx] + 90.0) / sub_side).astype(np.int64) * sub_nx
                + np.floor((x[c_idx] + 180.0) / sub_side).astype(np.int64)
            )
            order = np.lexsort((core_pids, g_core))
            ug, first = np.unique(g_core[order], return_index=True)
            rep = core_pids[order][first]  # min pid per subcell
            core_sub = np.searchsorted(ug, g_core)  # core -> subcell ordinal
            # inter-subcell edges: for each col subcell, which home-core
            # rows have a close core in it -> (row subcell, col subcell)
            pairs: set[tuple[int, int]] = set()
            if len(hc_rows):
                row_sub = core_sub[np.searchsorted(c_idx, h_idx[hc_rows])]
                col_by_sub = np.argsort(core_sub, kind="stable")
                bounds = np.searchsorted(core_sub[col_by_sub], np.arange(len(ug) + 1))
                sub_close = close[hc_rows]
                for sc in range(len(ug)):
                    cols = c_idx[col_by_sub[bounds[sc] : bounds[sc + 1]]]
                    if len(cols) == 0:
                        continue
                    hit_rows = np.nonzero(sub_close[:, cols].any(axis=1))[0]
                    for rs in np.unique(row_sub[hit_rows]).tolist():
                        pairs.add((rs, sc) if rs < sc else (sc, rs))
            # exact union-find over the tiny subcell-rep graph
            parent = list(range(len(ug)))

            def find(v: int) -> int:
                while parent[v] != v:
                    parent[v] = parent[parent[v]]
                    v = parent[v]
                return v

            for a_, b_ in pairs:
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    # root with the smaller rep pid wins (deterministic)
                    if rep[ra] <= rep[rb]:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
            sub_root = np.fromiter(
                (find(i) for i in range(len(ug))), dtype=np.int64, count=len(ug)
            )
            roots = rep[sub_root]  # subcell ordinal -> local root pid
            # one star edge per core in the group: pid -> local root
            out_k.append(np.zeros(len(c_idx), dtype=np.int64))
            out_a.append(core_pids)
            out_b.append(roots[core_sub])
        # border: home non-core -> distinct local roots among close cores
        hb_rows = np.nonzero(~core[h_idx])[0]
        if len(hb_rows) and len(c_idx):
            subb = close[hb_rows][:, c_idx]
            bi, j = np.nonzero(subb)
            if len(bi):
                bpid = pid[h_idx[hb_rows[bi]]]
                croot = roots[core_sub[j]]
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
    if _dbg:
        print(f"[dbscan] pass2 span edges: {_time.time()-_t0:.1f}s", flush=True)
        _t0 = _time.time()

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
    if _dbg:
        print(f"[dbscan] components: {_time.time()-_t0:.1f}s", flush=True)
        _t0 = _time.time()

    # border: min component label among core-neighbor local roots
    def border_cols(batch: pa.Table) -> pa.Table:
        b = batch.filter(pa.compute.equal(batch.column("kind"), pa.scalar(1)))
        return pa.table({"pid": b.column("a"), "node": b.column("b")})

    border_cols.__name__ = "dbscan_border_cols"

    # ---- broadcast assembly: labels + border edges are one row per core
    # point / per (border, root) pair — tiny next to the corpus, so pull
    # them once, ray.put the sorted lookup arrays, and label every flag
    # row in a single map_batches (no hash joins, no groupby).
    n_core_labels = labels.count()
    border_pairs = spans.map_batches(
        border_cols, batch_format="pyarrow"
    ).materialize()  # pinned: counted here, consumed by either branch below
    n_border_pairs = border_pairs.count()
    if n_core_labels + n_border_pairs <= broadcast_cap:
        import ray

        lab_tbl = collect_table(labels)
        if lab_tbl is not None:
            nodes = lab_tbl.column("node").to_numpy(zero_copy_only=False)
            labs = lab_tbl.column("label").to_numpy(zero_copy_only=False)
            o = np.argsort(nodes)
            nodes, labs = nodes[o], labs[o]
        else:
            nodes = labs = np.zeros(0, dtype=np.int64)
        bor_tbl = collect_table(border_pairs)
        if bor_tbl is not None and len(nodes):
            bpid = bor_tbl.column("pid").to_numpy(zero_copy_only=False)
            bnode = bor_tbl.column("node").to_numpy(zero_copy_only=False)
            # node -> component label; drop pairs whose root is missing
            # from labels (mirrors the fallback's inner-join fail-safe)
            pos = np.clip(np.searchsorted(nodes, bnode), 0, len(nodes) - 1)
            hit = nodes[pos] == bnode
            bpid, blab_all = bpid[hit], labs[pos[hit]]
            if len(bpid):
                o = np.lexsort((blab_all, bpid))
                bpid_s, blab_s = bpid[o], blab_all[o]
                first = np.flatnonzero(np.diff(bpid_s, prepend=bpid_s[0] - 1))
                bpid_u, blab_u = bpid_s[first], blab_s[first]
            else:
                bpid_u = blab_u = np.zeros(0, dtype=np.int64)
        else:
            bpid_u = blab_u = np.zeros(0, dtype=np.int64)
        lut_ref = ray.put((nodes, labs, bpid_u, blab_u))
        if _dbg:
            print(
                f"[dbscan] broadcast luts ({n_core_labels}+{n_border_pairs} rows):"
                f" {_time.time()-_t0:.1f}s",
                flush=True,
            )
            _t0 = _time.time()

        def assemble_bcast(batch: pa.Table) -> pa.Table:
            nodes, labs, bpid_u, blab_u = ray.get(lut_ref)
            pid = batch.column("pid").to_numpy(zero_copy_only=False).astype(np.int64)
            is_core = batch.column("is_core").to_numpy(zero_copy_only=False) == 1
            out = np.full(len(pid), -1, dtype=np.int64)
            if len(nodes):
                pos = np.clip(np.searchsorted(nodes, pid), 0, len(nodes) - 1)
                hit = nodes[pos] == pid
                m = is_core & hit
                out[m] = labs[pos[m]]
            m = is_core & (out == -1)
            out[m] = pid[m]  # isolated core: own id
            if len(bpid_u):
                pos = np.clip(np.searchsorted(bpid_u, pid), 0, len(bpid_u) - 1)
                m = ~is_core & (bpid_u[pos] == pid)
                out[m] = blab_u[pos[m]]
            return pa.table({"pid": pa.array(pid), "cluster": pa.array(out)})

        assemble_bcast.__name__ = "dbscan_assemble_bcast"
        return flags.map_batches(assemble_bcast, batch_format="pyarrow")
    # sentinel mode: border_pairs / labels may be empty (no borders / no
    # cores) — sentinel rows keep Ray 2.49's hash join safe WITHOUT the
    # materialize barrier the metadata-count path needs.  pids are
    # caller ids (non-negative in every pipeline here) so -(2**62) is
    # outside the domain.
    _SENT = -(1 << 62)
    bj = safe_join(
        border_pairs,
        labels,
        "inner",
        num_partitions,
        on=("node",),
        left_schema=pa.schema([("pid", pa.int64()), ("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        sentinel=_SENT,
    )
    border = bj.select_columns(["pid", "label"]).groupby("pid").min("label")

    def rename(cols):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(cols)

        f.__name__ = "rename_" + "_".join(cols)
        return f

    border = border.map_batches(rename(["pid", "blab"]), batch_format="pyarrow")

    # assemble: flags (all points) left-join core labels, left-join border
    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"pid": batch.column("pid"), "is_core": batch.column("is_core")}
        )

    slim.__name__ = "dbscan_flags_slim"
    lab_core = labels.map_batches(rename(["pid", "clab"]), batch_format="pyarrow")
    a1 = safe_join(
        flags.map_batches(slim, batch_format="pyarrow"),
        lab_core, "left_outer", num_partitions, on=("pid",),
        left_schema=pa.schema([("pid", pa.int64()), ("is_core", pa.int64())]),
        right_schema=pa.schema([("pid", pa.int64()), ("clab", pa.int64())]),
        sentinel=_SENT,
    )
    a2 = safe_join(
        a1, border, "left_outer", num_partitions, on=("pid",),
        left_schema=pa.schema(
            [("pid", pa.int64()), ("is_core", pa.int64()), ("clab", pa.int64())]
        ),
        right_schema=pa.schema([("pid", pa.int64()), ("blab", pa.int64())]),
        sentinel=_SENT,
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
