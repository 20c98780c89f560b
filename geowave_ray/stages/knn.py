"""k-nearest-neighbor stage.

Reference: NNMapReduce top-K within distance-sized partitions
(analytics/mapreduce/.../nn/NNMapReduce.java:60-170,
OrthodromicDistancePartitioner cell+neighbor duplication).  The Ray-Data
shape: query points are tiny and broadcast; each image batch computes its
distance matrix to all queries (vectorized haversine) and emits only its
per-query top-k candidates (a combiner — at most q*k rows leave a batch),
then one small ``groupby(query_id)`` merges partials into the global top-k.
This avoids shuffling the image table entirely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["haversine_km", "knn", "knn_join"]

EARTH_R_KM = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2):
    """Vectorized great-circle distance (km); inputs broadcast."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_R_KM * np.arcsin(np.minimum(np.sqrt(a), 1.0))


class _BatchTopK:
    """Per-batch partial top-k against broadcast query points."""

    def __init__(
        self,
        queries_ref,
        k: int,
        id_col: str,
        max_distance_km: float | None,
        qid_col: str = "query_id",
    ):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qid_col = qid_col
        self.qids = q[qid_col]
        self.qlon = np.asarray(q["lon"], dtype=np.float64)
        self.qlat = np.asarray(q["lat"], dtype=np.float64)
        self.k = k
        self.id_col = id_col
        self.max_distance_km = max_distance_km

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        ids = batch.column(self.id_col)
        nq = len(self.qids)
        out_q, out_i, out_d = [], [], []
        # (N x q) distance matrix, chunked over queries to bound memory
        d = haversine_km(lon[:, None], lat[:, None], self.qlon[None, :], self.qlat[None, :])
        k = min(self.k, len(batch))
        for j in range(nq):
            dj = d[:, j]
            if k < len(dj):
                part = np.argpartition(dj, k - 1)[:k]
            else:
                part = np.arange(len(dj))
            if self.max_distance_km is not None:
                part = part[dj[part] <= self.max_distance_km]
            out_q.append(np.full(len(part), j, dtype=np.int64))
            out_i.append(part)
            out_d.append(dj[part])
        qi = np.concatenate(out_q)
        pi = np.concatenate(out_i)
        return pa.table(
            {
                self.qid_col: pa.array([self.qids[j] for j in qi]),
                self.id_col: ids.take(pa.array(pi)),
                "dist_km": pa.array(np.concatenate(out_d)),
            }
        )


class _FinalTopK:
    __name__ = "final_topk"
    def __init__(self, k: int, id_col: str, coverage_deg: float | None = None):
        self.k = k
        self.id_col = id_col
        # when set, append a per-query ``complete`` flag right here —
        # the group holds the query's full candidate set, so no separate
        # completeness groupby execution is needed downstream
        self.coverage_deg = coverage_deg

    def __call__(self, group: pa.Table) -> pa.Table:
        d = group.column("dist_km").to_numpy(zero_copy_only=False)
        ids = group.column(self.id_col).to_pylist()
        # deterministic: sort by (distance, id), ties broken by id; the
        # same candidate can arrive from several cells (ring wrap-around /
        # escalation re-runs) — keep its first occurrence only
        order = sorted(range(len(d)), key=lambda i: (d[i], ids[i]))
        seen: set = set()
        picked = []
        for i in order:
            if ids[i] in seen:
                continue
            seen.add(ids[i])
            picked.append(i)
            if len(picked) == self.k:
                break
        out = group.take(pa.array(picked))
        out = out.append_column(
            "rank", pa.array(np.arange(1, len(picked) + 1, dtype=np.int64))
        )
        if self.coverage_deg is not None:
            ok = False
            if len(picked) == self.k:
                qlat = float(
                    group.column("qlat").to_numpy(zero_copy_only=False)[picked[0]]
                )
                cov = float(_coverage_km(np.asarray([qlat]), self.coverage_deg)[0])
                ok = float(d[picked[-1]]) <= cov
            out = out.append_column("complete", pa.array([ok] * len(out)))
        return out


def knn(
    images_ds,
    queries: dict,
    k: int,
    id_col: str = "image_id",
    max_distance_km: float | None = None,
    concurrency: int | None = None,
    qid_col: str = "query_id",
):
    """queries: {qid_col: [...], "lon": [...], "lat": [...]} (small).

    Returns Dataset of (qid_col, image_id, dist_km, rank), rank 1..k per
    query, ties broken by id (deterministic, matching the brute-force
    oracle in FIXTURES §F5).
    """
    import ray

    from .util import stage_fn

    qref = ray.put(queries)
    partials = images_ds.map_batches(
        stage_fn(
            _BatchTopK,
            queries_ref=qref,
            k=k,
            id_col=id_col,
            max_distance_km=max_distance_km,
            qid_col=qid_col,
        ),
        batch_format="pyarrow",
    )
    return partials.groupby(qid_col).map_groups(
        _FinalTopK(k, id_col), batch_format="pyarrow"
    )


class _CellKnnGroup:
    __name__ = "cell_knn_group"

    def __init__(self, k: int, qid_col: str, id_col: str):
        self.k = k
        self.qid_col = qid_col
        self.id_col = id_col

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        qs = group.filter(pa.array(side == 0))
        data = group.filter(pa.array(side == 1))
        # ring wrap-around can replicate a data point into the same cell
        # group several times; duplicates would eat per-group top-k slots
        if len(data):
            _, first = np.unique(
                data.column(self.id_col).to_numpy(zero_copy_only=False),
                return_index=True,
            )
            if len(first) != len(data):
                data = data.take(pa.array(np.sort(first)))
        if len(qs) == 0 or len(data) == 0:
            return pa.table(
                {
                    self.qid_col: pa.array([], type=group.schema.field(self.qid_col).type),
                    self.id_col: pa.array([], type=group.schema.field(self.id_col).type),
                    "dist_km": pa.array([], type=pa.float64()),
                    "qlat": pa.array([], type=pa.float64()),
                }
            )
        d = haversine_km(
            qs.column("lon").to_numpy(zero_copy_only=False)[:, None],
            qs.column("lat").to_numpy(zero_copy_only=False)[:, None],
            data.column("lon").to_numpy(zero_copy_only=False)[None, :],
            data.column("lat").to_numpy(zero_copy_only=False)[None, :],
        )
        k = min(self.k, d.shape[1])
        out_q, out_i, out_d = [], [], []
        part = np.argpartition(d, k - 1, axis=1)[:, :k] if k < d.shape[1] else np.tile(
            np.arange(d.shape[1]), (d.shape[0], 1)
        )
        for r in range(d.shape[0]):
            out_q.extend([r] * part.shape[1])
            out_i.append(part[r])
            out_d.append(d[r, part[r]])
        qi = pa.array(np.asarray(out_q, dtype=np.int64))
        pi = pa.array(np.concatenate(out_i))
        return pa.table(
            {
                self.qid_col: qs.column(self.qid_col).take(qi),
                self.id_col: data.column(self.id_col).take(pi),
                "dist_km": pa.array(np.concatenate(out_d)),
                "qlat": qs.column("lat").take(qi),
            }
        )


def _knn_join_pass(
    queries_ds,
    data_ds,
    k: int,
    cell_deg: float,
    qid_col: str = "query_id",
    id_col: str = "image_id",
    ring: int = 1,
    mark_complete: bool = False,
    query_cell_cap: int = 262144,
):
    """Large-large kNN: every query point against a big data table, both as
    Datasets — the NNMapReduce shape (OrthodromicDistancePartitioner: data
    duplicated to its cell + ring neighborhood so each query's neighborhood
    is co-grouped; reducer = per-cell top-k; final groupby(query) merge).

    PARTITIONING ASSUMPTION (documented per the round brief): the true k
    nearest neighbors lie within ``ring * cell_deg`` degrees of the query.
    Size cell_deg to the expected kth-neighbor distance (reference sizes
    cells to the search distance, NNMapReduce.java:62-66); under-filled
    queries (fewer than k results) indicate cell_deg is too small — re-run
    those with a bigger radius (radius-escalation loop, SURVEY §7 Phase 5).

    Shuffle pruning: a data replica only matters in a cell that hosts at
    least one query, so the DISTINCT query-cell set (bounded by the grid
    size, not the query count) is collected once and broadcast; data
    replicas targeting unoccupied cells are dropped BEFORE the shuffle.
    When the query side is sparse relative to the grid this cuts the
    shuffled volume by the unoccupied fraction at zero correctness cost;
    past ``query_cell_cap`` distinct cells the filter is skipped (data is
    needed nearly everywhere anyway).
    """
    import ray

    nx = max(int(np.ceil(360.0 / cell_deg)), 1)

    def q_cells(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        cx = np.floor((lon + 180.0) / cell_deg).astype(np.int64)
        cy = np.floor((lat + 90.0) / cell_deg).astype(np.int64)
        out = pa.table(
            {
                qid_col: batch.column(qid_col),
                "lon": batch.column("lon"),
                "lat": batch.column("lat"),
                "cell": pa.array(cy * nx + cx),
            }
        )
        return out.append_column("_side", pa.array(np.zeros(len(out), dtype=np.int8)))

    q_cells.__name__ = "knn_query_cells"
    qk = queries_ds.map_batches(q_cells, batch_format="pyarrow")

    # distinct query cells (aggregate bounded by occupied grid cells, not
    # the corpus) -> broadcast filter for the data replicas.  Materialize
    # the small grouped histogram ONCE, count it distributed, and pull it
    # to the driver only when it is proven under the cap — never an
    # uncapped take_all (CLAUDE.md collect convention).
    qcell_filter = None
    qcells_ds = qk.groupby("cell").count().select_columns(["cell"]).materialize()
    if qcells_ds.count() <= query_cell_cap:
        from .util import collect_table

        cells_np = collect_table(qcells_ds).column("cell").to_numpy(zero_copy_only=False)
        qcell_filter = ray.put(np.sort(cells_np.astype(np.int64)))

    def d_cells(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        cx = np.floor((lon + 180.0) / cell_deg).astype(np.int64)
        cy = np.floor((lat + 90.0) / cell_deg).astype(np.int64)
        occupied = ray.get(qcell_filter) if qcell_filter is not None else None
        idxs, cells = [], []
        for dy in range(-ring, ring + 1):
            for dx in range(-ring, ring + 1):
                gy = cy + dy
                ok = (gy >= 0) & (gy < int(np.ceil(180.0 / cell_deg)))
                gx = (cx + dx) % nx
                idx = np.nonzero(ok)[0]
                cell = gy[ok] * nx + gx[ok]
                if occupied is not None and len(cell):
                    if len(occupied) == 0:
                        continue
                    pos = np.clip(
                        np.searchsorted(occupied, cell), 0, len(occupied) - 1
                    )
                    keep = occupied[pos] == cell
                    idx, cell = idx[keep], cell[keep]
                idxs.append(idx)
                cells.append(cell)
        if not idxs:
            idx = np.zeros(0, dtype=np.int64)
            cells = [np.zeros(0, dtype=np.int64)]
        else:
            idx = np.concatenate(idxs)
        out = pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(idx)),
                "lon": batch.column("lon").take(pa.array(idx)),
                "lat": batch.column("lat").take(pa.array(idx)),
                "cell": pa.array(np.concatenate(cells)),
            }
        )
        return out.append_column("_side", pa.array(np.ones(len(out), dtype=np.int8)))

    d_cells.__name__ = "knn_data_cells"
    dk = data_ds.map_batches(d_cells, batch_format="pyarrow")

    # align schemas for union — resolve the two pad types ONCE on the
    # driver (from the INPUT datasets, before the derived qk/dk exist) and
    # close over plain pa.DataType values.  Calling Dataset.schema() inside
    # the UDF re-triggers execution of the captured Dataset per task (the
    # round-2 bench-timeout bug).
    id_type = data_ds.schema().base_schema.field(id_col).type
    qid_type = queries_ds.schema().base_schema.field(qid_col).type

    def pad_q(batch: pa.Table) -> pa.Table:
        return batch.append_column(id_col, pa.nulls(len(batch), type=id_type)).select(
            sorted(batch.column_names + [id_col])
        )

    def pad_d(batch: pa.Table) -> pa.Table:
        return batch.append_column(qid_col, pa.nulls(len(batch), type=qid_type)).select(
            sorted(batch.column_names + [qid_col])
        )

    pad_q.__name__ = "pad_queries"
    pad_d.__name__ = "pad_data"
    both = qk.map_batches(pad_q, batch_format="pyarrow").union(
        dk.map_batches(pad_d, batch_format="pyarrow")
    )
    partials = both.groupby("cell").map_groups(
        _CellKnnGroup(k, qid_col, id_col), batch_format="pyarrow"
    )
    return partials.groupby(qid_col).map_groups(
        _FinalTopK(
            k, id_col, coverage_deg=ring * cell_deg if mark_complete else None
        ),
        batch_format="pyarrow",
    )


def _coverage_km(qlat: np.ndarray, radius_deg: float) -> np.ndarray:
    """Conservative km radius certainly covered by a ring of
    ``radius_deg`` degrees around each query: min of the meridian bound
    (min km/deg latitude) and the parallel bound at the worst latitude
    reachable within the ring."""
    phi = np.minimum(np.abs(qlat) + radius_deg, 89.99)
    lat_bound = 110.567 * radius_deg
    lon_bound = 111.320 * np.cos(np.radians(phi)) * radius_deg
    return 0.999 * np.minimum(lat_bound, lon_bound)


def knn_join(
    queries_ds,
    data_ds,
    k: int,
    cell_deg: float,
    qid_col: str = "query_id",
    id_col: str = "image_id",
    ring: int = 1,
    escalate: bool = True,
    max_rounds: int = 3,
    num_partitions: int = 8,
    broadcast_cap: int = 65536,
    pin_data: bool = False,
):
    """Large-large kNN (NNMapReduce shape) with BROADCAST ESCALATION.

    One cell-cogroup shuffle pass answers the bulk of queries; a query is
    PROVEN complete iff it found k results and its k-th distance is within
    the ring's guaranteed coverage radius (a point within ``ring*cell_deg``
    degrees on both axes is always co-grouped).  Unproven queries —
    including queries whose ring held ZERO data points, which never appear
    in the pass output at all — are computed EXACTLY via the broadcast
    ``knn`` path (one extra streaming scan of the data side, no shuffle),
    provided there are at most ``broadcast_cap`` of them; beyond the cap
    the shuffle pass repeats with a doubled ring (rare: cap exceeded means
    cell_deg was sized far too small for the data density).

    Scale note: the previous design doubled the ring per escalation round,
    replicating the DATA side (2r+1)^2-fold through a shuffle for the sake
    of a few stubborn queries.  Broadcasting the leftover queries instead
    touches each data block once with zero replication.

    ``pin_data``: materialize the data side's PROJECTED (id, lon, lat)
    columns once — the escalation fix-up otherwise re-reads and
    re-derives them for its second streaming scan.  ~24 bytes/row in the
    object store, so callers opt in when the projection is known to fit
    (payload columns are never part of it either way).
    """
    from .util import safe_join

    if pin_data:
        proj = ["lon", "lat"] + ([id_col] if id_col not in ("lon", "lat") else [])
        data_ds = data_ds.select_columns(proj).materialize()

    if not escalate or max_rounds <= 1:
        out = _knn_join_pass(queries_ds, data_ds, k, cell_deg, qid_col, id_col, ring)
        return out.select_columns([qid_col, id_col, "dist_km", "rank"])

    # the query side is read twice (cell pass + completeness anti-join):
    # pin it once instead of re-deriving upstream per use
    queries_ds = queries_ds.materialize()
    # mark_complete: the per-query completeness proof (found k AND k-th
    # distance within the ring's guaranteed coverage) is computed INSIDE
    # the final top-k group — no separate groupby execution
    res = _knn_join_pass(
        queries_ds, data_ds, k, cell_deg, qid_col, id_col, ring, mark_complete=True
    ).materialize()

    def keep_complete(batch: pa.Table) -> pa.Table:
        # a query's k rows share one block (one map_groups call), so the
        # per-batch unique fully dedupes
        ids = batch.filter(batch.column("complete")).column(qid_col)
        return pa.table({qid_col: pa.compute.unique(ids)})

    keep_complete.__name__ = "keep_complete"
    done_ids = res.map_batches(keep_complete, batch_format="pyarrow").materialize()
    # todo = queries MINUS proven-complete: queries with zero in-ring
    # candidates — absent from `res` entirely — must still escalate.
    # When the done-set is small enough it broadcasts (one streaming
    # filter, no shuffle); otherwise fall back to the anti-join.
    n_done = done_ids.count()
    if n_done <= broadcast_cap:
        from .util import broadcast_membership_filter

        done_arr = (
            done_ids.to_pandas()[qid_col].to_numpy()
            if n_done
            else np.array([], dtype=np.int64)
        )
        todo_q = broadcast_membership_filter(
            queries_ds, done_arr, qid_col, keep_members=False
        ).materialize()
    else:
        # this branch only runs when n_done > broadcast_cap, so done_ids
        # is non-empty; queries_ds must hold rows for any qid to be done.
        # Both are ALREADY materialized -> drop_empty_blocks is metadata-
        # only (guarantees the non-empty first block Ray 2.49's join
        # needs) and assume_nonempty skips any further barrier.
        from .util import drop_empty_blocks

        todo_q = safe_join(
            drop_empty_blocks(queries_ds),
            drop_empty_blocks(done_ids),
            "left_anti", num_partitions, on=(qid_col,),
            assume_nonempty=True,
        ).materialize()
    n_todo = todo_q.count()
    if n_todo == 0:
        return res.select_columns([qid_col, id_col, "dist_km", "rank"])

    def only_complete_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("complete"))

    only_complete_rows.__name__ = "only_complete_rows"
    # the in-band flag replaces the old left_semi shuffle
    done_res = res.map_batches(only_complete_rows, batch_format="pyarrow")
    if n_todo <= broadcast_cap:
        from .util import collect_table

        # n_todo > 0 and <= broadcast_cap: one Arrow pull, no row loop
        qdict = collect_table(
            todo_q.select_columns([qid_col, "lon", "lat"])
        ).to_pydict()
        fixed = knn(data_ds, qdict, k, id_col=id_col, qid_col=qid_col)
    else:
        fixed = knn_join(
            todo_q,
            data_ds,
            k,
            cell_deg,
            qid_col,
            id_col,
            ring=ring * 2,
            escalate=True,
            max_rounds=max_rounds - 1,
            num_partitions=num_partitions,
            broadcast_cap=broadcast_cap,
        )
    out = done_res.select_columns([qid_col, id_col, "dist_km", "rank"]).union(
        fixed.select_columns([qid_col, id_col, "dist_km", "rank"])
    )
    return out
