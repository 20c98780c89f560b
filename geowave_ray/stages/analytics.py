"""Clustering / sampling analytics (SURVEY §2.G).

Reference: KMeans family (analytics/mapreduce/.../kmeans/KMeansMapReduce.java,
Spark KMeansRunner via MLlib), KSamplerMapReduce + sampling probability fns,
ConvexHullMapReduce (GeometryHullTool).  Ray-Data shapes:

- ``kmeans``: broadcast centroids (ray.put per iteration); each batch emits
  per-centroid partial sums (combiner); driver merges the tiny partials and
  updates centroids.  Iterations are short driver-coordinated rounds over a
  cached (materialized) dataset — never a per-row shuffle.
- ``weighted_sample``: deterministic hash-threshold sampling (per-row, no
  global state) + exact top-k reservoir variant.
- ``group_convex_hulls``: groupby(key) -> Andrew monotone-chain hull of the
  group's points (map_groups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["kmeans", "weighted_sample", "group_convex_hulls"]


def kmeans(
    ds,
    cols: tuple = ("lon", "lat"),
    k: int = 8,
    n_iter: int = 10,
    seed: int = 42,
):
    """Lloyd's k-means over numeric columns; returns (centroids (k,d),
    assign_fn) where assign_fn is a map_batches callable adding a
    ``cluster`` column."""
    import ray

    cols = list(cols)
    mat = ds.materialize()

    # init: deterministic sample of k rows (hash-ordered)
    first = mat.limit(max(k * 50, 200)).to_pandas()
    pts = first[cols].to_numpy(dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = pts[rng.choice(len(pts), size=k, replace=False)]

    for _ in range(n_iter):
        c_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            x = np.stack(
                [batch.column(col).to_numpy(zero_copy_only=False) for col in cols],
                axis=1,
            ).astype(np.float64)
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            sums = np.zeros((len(c), x.shape[1]))
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                    "count": pa.array(counts),
                    **{
                        f"sum_{j}": pa.array(sums[:, j]) for j in range(x.shape[1])
                    },
                }
            )

        partial.__name__ = "kmeans_partial"
        parts = mat.map_batches(partial, batch_format="pyarrow").to_pandas()
        agg = parts.groupby("cluster").sum()
        new_centroids = centroids.copy()
        for ci in agg.index:
            n = agg.loc[ci, "count"]
            if n > 0:
                new_centroids[ci] = [
                    agg.loc[ci, f"sum_{j}"] / n for j in range(len(cols))
                ]
        if np.allclose(new_centroids, centroids, atol=1e-9):
            centroids = new_centroids
            break
        centroids = new_centroids

    final_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        x = np.stack(
            [batch.column(col).to_numpy(zero_copy_only=False) for col in cols], axis=1
        ).astype(np.float64)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column("cluster", pa.array(d2.argmin(axis=1)))

    assign.__name__ = "kmeans_assign"
    return centroids, assign


def weighted_sample(ds, rate: float, id_col: str, weight_col: str | None = None, seed: int = 7):
    """Deterministic hash-threshold sample: row kept iff
    hash(id) / 2^64 < rate * weight (RandomProbabilitySampleFn analog —
    reproducible across runs and workers, no RNG state)."""

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if pa.types.is_integer(ids.type):
            v = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = np.array(
                [np.uint64(abs(hash(x)) & 0x7FFFFFFFFFFFFFFF) for x in ids.to_pylist()],
                dtype=np.uint64,
            )
        z = (v + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        z ^= z >> np.uint64(31)
        u = z.astype(np.float64) / 2**64
        thr = np.full(len(batch), rate)
        if weight_col is not None:
            w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
            thr = np.clip(rate * w, 0, 1)
        return batch.filter(pa.array(u < thr))

    keep.__name__ = "weighted_sample"
    return ds.map_batches(keep, batch_format="pyarrow")


def group_convex_hulls(ds, key_col: str, lon_col: str = "lon", lat_col: str = "lat"):
    """Per-group convex hull -> (key, hull wkb, n_points) (ConvexHullMapReduce)."""
    from ..geom.wkb import LineString, Point, Polygon, to_wkb
    from ..sources.images import _convex_hull

    def hull(group: pa.Table) -> pa.Table:
        x = group.column(lon_col).to_numpy(zero_copy_only=False)
        y = group.column(lat_col).to_numpy(zero_copy_only=False)
        pts = np.unique(np.stack([x, y], axis=1), axis=0)
        if len(pts) == 1:
            wkb = to_wkb(Point(pts[0, 0], pts[0, 1]))
        elif len(pts) == 2:
            wkb = to_wkb(LineString(pts))
        else:
            wkb = to_wkb(Polygon(_convex_hull(pts)))
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "hull_wkb": pa.array([wkb], type=pa.binary()),
                "n_points": pa.array([len(group)], type=pa.int64()),
            }
        )

    hull.__name__ = "group_hull"
    return ds.groupby(key_col).map_groups(hull, batch_format="pyarrow")
