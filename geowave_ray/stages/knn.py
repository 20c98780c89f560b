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

__all__ = ["haversine_km", "knn"]

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

    def __init__(self, queries_ref, k: int, id_col: str, max_distance_km: float | None):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["query_id"]
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
                "query_id": pa.array([self.qids[j] for j in qi]),
                self.id_col: ids.take(pa.array(pi)),
                "dist_km": pa.array(np.concatenate(out_d)),
            }
        )


class _FinalTopK:
    __name__ = "final_topk"
    def __init__(self, k: int, id_col: str):
        self.k = k
        self.id_col = id_col

    def __call__(self, group: pa.Table) -> pa.Table:
        d = group.column("dist_km").to_numpy(zero_copy_only=False)
        ids = group.column(self.id_col).to_pylist()
        # deterministic: sort by (distance, id) — ties broken by id
        order = sorted(range(len(d)), key=lambda i: (d[i], ids[i]))[: self.k]
        out = group.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )


def knn(
    images_ds,
    queries: dict,
    k: int,
    id_col: str = "image_id",
    max_distance_km: float | None = None,
    concurrency: int | None = None,
):
    """queries: {"query_id": [...], "lon": [...], "lat": [...]} (small).

    Returns Dataset of (query_id, image_id, dist_km, rank), rank 1..k per
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
        ),
        batch_format="pyarrow",
    )
    return partials.groupby("query_id").map_groups(
        _FinalTopK(k, id_col), batch_format="pyarrow"
    )
