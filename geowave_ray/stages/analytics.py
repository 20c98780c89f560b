"""Clustering / sampling analytics (SURVEY §2.G).

Reference: KMeans family (analytics/mapreduce/.../kmeans/KMeansMapReduce.java,
Spark KMeansRunner via MLlib), KSamplerMapReduce + sampling probability fns,
ConvexHullMapReduce (GeometryHullTool).  Ray-Data shapes:

- ``kmeans``: broadcast centroids (ray.put per iteration); each batch emits
  per-centroid partial sums (combiner); driver merges the tiny partials and
  updates centroids.  Iterations are short driver-coordinated rounds over a
  cached (materialized) dataset — never a per-row shuffle.
  ``init="kmeans++"`` runs the distributed k-means|| oversampling init;
  ``choose_k_jump`` selects k by the jump method (the reference's
  multi-sample-init + jump runners in analytics/mapreduce/.../kmeans/).
- ``weighted_sample``: deterministic hash-threshold sampling (per-row, no
  global state) + exact top-k reservoir variant.
- ``group_convex_hulls``: groupby(key) -> Andrew monotone-chain hull of the
  group's points (map_groups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["kmeans", "choose_k_jump", "distortion", "weighted_sample", "group_convex_hulls", "per_group_cap", "shard_assign", "track_simplify", "budget_capped_sample", "geofence_transitions", "per_group_quota"]


def _row_u01(x: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-row uniform in [0,1) from the coordinate values —
    independent of partitioning, reproducible across runs (the sampling
    probability functions in KSamplerMapReduce are the analog)."""
    from .texthash import splitmix64

    q = np.ascontiguousarray(np.round(x * 1e6)).astype(np.int64).view(np.uint64)
    h = splitmix64(q[:, 0] + np.uint64(salt))
    for j in range(1, x.shape[1]):
        h = splitmix64(h ^ q[:, j])
    return h.astype(np.float64) / 2.0**64


def _min_d2(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    return ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).min(axis=1)


def _stack_cols(batch: pa.Table, cols) -> np.ndarray:
    return np.stack(
        [batch.column(c).to_numpy(zero_copy_only=False) for c in cols], axis=1
    ).astype(np.float64)


def _kmeans_parallel_init(mat, cols, k: int, seed: int, rounds: int = 4) -> np.ndarray:
    """Scalable k-means++ ("k-means||", Bahmani et al., VLDB'12 — public):
    a few distributed D^2-weighted sampling rounds build an oversampled
    candidate pool; candidates are weighted by one assignment pass and
    reduced to k centers with the classic weighted k-means++ on the driver.
    Mirrors the reference's sampling-based initialization
    (analytics/mapreduce/.../kmeans/KSamplerMapReduce.java + sample
    probability functions) in Ray Data shape: every pass is a map_batches
    partial; only O(rounds * oversample) candidates reach the driver."""
    import ray

    oversample = max(2 * k, 16)
    centers = mat.limit(1).to_pandas()[cols].to_numpy(dtype=np.float64)

    for r in range(rounds):
        c_ref = ray.put(centers)

        def cand(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            x = _stack_cols(batch, cols)
            d2 = _min_d2(x, c)
            tot = float(d2.sum())
            if tot <= 0:
                return pa.table({f"c{j}": pa.array(np.zeros(0)) for j in range(x.shape[1])})
            u = _row_u01(x, salt=seed * 1000 + r)
            keep = u < np.minimum(1.0, oversample * d2 / tot)
            return pa.table({f"c{j}": pa.array(x[keep, j]) for j in range(x.shape[1])})

        cand.__name__ = "kmeanspp_candidates"
        got = mat.map_batches(cand, batch_format="pyarrow").to_pandas().to_numpy()
        if len(got):
            centers = np.vstack([centers, got])

    # weight candidates: one distributed pass counting points per candidate
    c_ref = ray.put(centers)

    def wpart(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        x = _stack_cols(batch, cols)
        a = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        w = np.bincount(a, minlength=len(c)).astype(np.int64)
        return pa.table({"cand": pa.array(np.arange(len(c), dtype=np.int64)), "w": pa.array(w)})

    wpart.__name__ = "kmeanspp_weights"
    wdf = mat.map_batches(wpart, batch_format="pyarrow").to_pandas().groupby("cand")["w"].sum()
    weights = np.zeros(len(centers), dtype=np.float64)
    weights[wdf.index.to_numpy()] = wdf.to_numpy()

    # weighted k-means++ over the small candidate pool (driver-side)
    rng = np.random.default_rng(seed)
    chosen = [int(np.argmax(weights))]
    for _ in range(1, min(k, len(centers))):
        d2 = _min_d2(centers, centers[chosen])
        p = d2 * weights
        tot = p.sum()
        if tot <= 0:
            remaining = [i for i in range(len(centers)) if i not in chosen]
            chosen.append(remaining[0])
            continue
        chosen.append(int(rng.choice(len(centers), p=p / tot)))
    out = centers[chosen]
    if len(out) < k:  # degenerate data: pad with jittered copies
        out = np.vstack([out, out[: k - len(out)] + 1e-9])
    return out


def kmeans(
    ds,
    cols: tuple = ("lon", "lat"),
    k: int = 8,
    n_iter: int = 10,
    seed: int = 42,
    init: str = "sample",
):
    """Lloyd's k-means over numeric columns; returns (centroids (k,d),
    assign_fn) where assign_fn is a map_batches callable adding a
    ``cluster`` column.  ``init``: "sample" (deterministic head sample) or
    "kmeans++" (distributed k-means|| initialization)."""
    import ray

    cols = list(cols)
    mat = ds.materialize()

    if init == "kmeans++":
        centroids = _kmeans_parallel_init(mat, cols, k, seed)
    elif init == "sample":
        # init: deterministic sample of k rows (hash-ordered)
        first = mat.limit(max(k * 50, 200)).to_pandas()
        pts = first[cols].to_numpy(dtype=np.float64)
        rng = np.random.default_rng(seed)
        centroids = pts[rng.choice(len(pts), size=k, replace=False)]
    else:
        raise ValueError(f"unknown init {init!r}")

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


def distortion(ds, cols, centroids: np.ndarray) -> float:
    """Mean per-dimension min squared distance (the jump method's
    d-normalized distortion), one distributed pass."""
    import ray

    cols = list(cols)
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def part(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        x = _stack_cols(batch, cols)
        d2 = _min_d2(x, c)
        return pa.table(
            {"s": pa.array([float(d2.sum())]), "n": pa.array([len(x)], type=pa.int64())}
        )

    part.__name__ = "distortion_partial"
    df = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    n = int(df["n"].sum())
    return float(df["s"].sum()) / (n * len(cols)) if n else 0.0


def choose_k_jump(
    ds,
    cols: tuple = ("lon", "lat"),
    k_values=range(2, 11),
    n_iter: int = 8,
    seed: int = 42,
    init: str = "kmeans++",
):
    """Jump method for selecting k (Sugar & James 2003; the reference's
    analytics kmeans jump runner — analytics/mapreduce/.../kmeans/): run
    k-means per candidate k, transform the d-normalized distortion by
    power -d/2, and pick the k with the largest jump.  Returns
    (best_k, {k: transformed_distortion})."""
    cols = list(cols)
    d = len(cols)
    mat = ds.materialize()
    ks = sorted(k_values)
    y = {}
    for k in ks:
        cents, _ = kmeans(mat, cols, k=k, n_iter=n_iter, seed=seed, init=init)
        dist = distortion(mat, cols, cents)
        y[k] = dist ** (-d / 2.0) if dist > 0 else float("inf")
    prev = {}
    best_k, best_jump = ks[0], -np.inf
    last = 0.0
    for k in ks:
        jump = y[k] - last
        prev[k] = jump
        if jump > best_jump:
            best_k, best_jump = k, jump
        last = y[k]
    return best_k, y


def kmeans_multi_init(
    ds,
    cols: tuple = ("lon", "lat"),
    k: int = 8,
    n_runs: int = 3,
    n_iter: int = 10,
    seed: int = 42,
    init: str = "kmeans++",
):
    """Multi-sample initialization (the reference's
    SampleMultipleSetsJobRunner stage of the kmeans-parallel runner,
    analytics/mapreduce/.../kmeans/): run ``n_runs`` independent
    initializations and keep the centroid set with the lowest
    d-normalized distortion.  Returns (centroids, assign_fn, distortion).
    """
    mat = ds.materialize()
    best = None
    for i in range(n_runs):
        cents, assign = kmeans(
            mat, cols, k=k, n_iter=n_iter, seed=seed + 101 * i, init=init
        )
        dist = distortion(mat, cols, cents)
        if best is None or dist < best[0]:
            best = (dist, cents, assign)
    return best[1], best[2], best[0]


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


def per_group_cap(ds, key_col: str, order_col: str, k: int):
    """Keep the ``k`` rows with the SMALLEST ``order_col`` per ``key_col``
    (per-domain quota sampling — the web-corpus "at most K pages per
    domain" rule; deterministic given unique order values).

    Scale shape (100 TB): a vectorized per-batch COMBINER first prunes
    each input block to <= k rows per key it contains, so the groupby
    shuffle moves at most k * n_blocks rows per key instead of the full
    per-key population (hot domains are exactly the ones this bounds);
    the final per-group kernel then takes the exact global top-k.  Both
    kernels are one lexsort + one boundary scan — no Python row loops."""

    def topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        order = batch.column(order_col).to_numpy(zero_copy_only=False)
        _, codes = np.unique(keys, return_inverse=True)
        sel = np.lexsort((order, codes))
        codes_s = codes[sel]
        # rank within key: position minus the first position of the key
        new_key = np.empty(len(sel), dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        first_pos = np.maximum.accumulate(np.where(new_key, np.arange(len(sel)), 0))
        rank = np.arange(len(sel)) - first_pos
        return batch.take(pa.array(np.sort(sel[rank < k])))

    topk.__name__ = f"per_group_cap_{k}"
    partial = ds.map_batches(topk, batch_format="pyarrow")

    class _GroupTopK:
        __name__ = "per_group_cap_final"

        def __call__(self, group: pa.Table) -> pa.Table:
            return topk(group)

    return partial.groupby(key_col).map_groups(_GroupTopK(), batch_format="pyarrow")


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


def shard_assign(ds, id_col: str, num_shards: int, seed: int = 7, by: tuple = ()):
    """Deterministic global shuffle -> fixed shard layout: every row gets
    ``(shard, pos)`` where ``shard = h(id) % num_shards`` and ``pos`` is the
    row's rank within its shard ordered by the hash (ties by id).  This is
    the training-corpus assembly step — a reproducible corpus-wide shuffle
    whose output is a fixed number of equally-loaded shards, each internally
    hash-ordered, ready for ``write_parquet`` one file per shard (the
    KSamplerMapReduce randomization discipline applied to corpus assembly;
    Ray's ``random_shuffle`` is the nondeterministic analog).

    ``by`` adds extra partition columns (e.g. a train/val/test split) so the
    rank is per ``(*by, shard)``.

    Scale shape (100 TB): the hash/shard assignment is batch-local (zero
    shuffle); the ONLY shuffle is the groupby, and each group is
    corpus/num_shards rows — num_shards is chosen so a shard is file-sized
    (the same knob that bounds the write), so the per-group rank is one
    argsort over a file-sized group, never a global sort.
    """
    from .texthash import GOLD

    def hashshard(batch: pa.Table) -> pa.Table:
        # strip pandas metadata so Ray's schema-dedup cache can hash it
        batch = batch.replace_schema_metadata(None)
        v = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (v + np.uint64(seed)) * GOLD
        z ^= z >> np.uint64(31)
        batch = batch.append_column("_z", pa.array(z, type=pa.uint64()))
        return batch.append_column(
            "shard", pa.array((z % np.uint64(num_shards)).astype(np.int64))
        )

    hashshard.__name__ = f"shard_assign_{num_shards}"
    keys = [*by, "shard"]

    class _ShardRank:
        __name__ = "shard_rank"

        def __call__(self, group: pa.Table) -> pa.Table:
            z = group.column("_z").to_numpy(zero_copy_only=False)
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            sel = np.lexsort((ids, z))
            pos = np.empty(len(sel), dtype=np.int64)
            pos[sel] = np.arange(len(sel))
            return group.drop_columns(["_z"]).append_column("pos", pa.array(pos))

    return (
        ds.map_batches(hashshard, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(_ShardRank(), batch_format="pyarrow")
    )


def trajectory_stats(ds, key_col: str, ts_col: str, x_col: str, y_col: str, order_col: str):
    """Per-entity track statistics over integer coordinates: order each
    entity's points by ``(ts, tiebreak)`` and reduce the consecutive steps
    to (n_points, sum of squared step lengths, max squared step) — the
    trajectory-analytics shape of the reference's spatial-temporal use
    cases (SpatialTemporalQuery over per-entity tracks;
    core/geotime/.../SpatialTemporalDimensionalityTypeProvider.java).
    Integer arithmetic throughout so the result is exactly SQL-replayable
    (no trig / float accumulation-order hazards).

    Scale shape (100 TB): one groupby shuffle; each group is one entity's
    track (bounded by per-entity activity — the same per-key skew
    assumption as sessionize, documented there).  The per-group kernel is
    one argsort + one vectorized diff.
    """

    class _TrackReduce:
        __name__ = "trajectory_stats"

        def __call__(self, group: pa.Table) -> pa.Table:
            ts = group.column(ts_col).to_numpy(zero_copy_only=False).astype("int64")
            oid = group.column(order_col).to_numpy(zero_copy_only=False)
            x = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
            y = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sel = np.lexsort((oid, ts))  # ts, ties by the unique row id
            x, y = x[sel], y[sel]
            if len(x) > 1:
                d = (np.diff(x)) ** 2 + (np.diff(y)) ** 2
                tot, mx = int(d.sum()), int(d.max())
            else:
                tot = mx = 0
            return pa.table(
                {
                    key_col: group.column(key_col).slice(0, 1),
                    "n_points": pa.array([len(x)], type=pa.int64()),
                    "path_sq_sum": pa.array([tot], type=pa.int64()),
                    "max_step_sq": pa.array([mx], type=pa.int64()),
                }
            )

    return ds.groupby(key_col).map_groups(_TrackReduce(), batch_format="pyarrow")


def trajectory_resample(
    ds,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    order_col: str,
    step_us: int,
    coord_shift: int = 18000,
):
    """Per-entity track resampling onto a fixed global time grid: for each
    grid instant T = g*step_us inside an entity's [first_ts, last_ts],
    emit the linearly interpolated position between the bracketing points
    (the track-densification / map-matching prep step of the reference's
    spatial-temporal analytics).

    Integer-exact interpolation: with shifted non-negative coordinates
    xs = x + coord_shift,
    ``xi = (xs_prev*(t_next-T) + xs_next*(T-t_prev)) // (t_next-t_prev)
    - coord_shift`` — the numerator is non-negative, so NumPy floor
    division and DuckDB's truncating ``//`` agree (negative numerators
    would NOT: DuckDB truncates toward zero).  Duplicate timestamps
    resolve to the LAST point in (ts, order_col) order, and a grid
    instant equal to a point's timestamp returns that point exactly.

    Scale shape: one groupby shuffle, per-group kernel is one lexsort +
    two searchsorted (same per-entity skew assumption as
    trajectory_stats)."""

    class _Resample:
        __name__ = "trajectory_resample"

        def __call__(self, group: pa.Table) -> pa.Table:
            ts = group.column(ts_col).to_numpy(zero_copy_only=False).astype("int64")
            oid = group.column(order_col).to_numpy(zero_copy_only=False)
            x = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
            y = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sel = np.lexsort((oid, ts))
            t, xs, ys = ts[sel], x[sel] + coord_shift, y[sel] + coord_shift
            g0 = -(-t[0] // step_us)
            g1 = t[-1] // step_us
            if g1 < g0:
                return pa.table(
                    {
                        key_col: group.column(key_col).slice(0, 0),
                        "g": pa.array([], pa.int64()),
                        "cx": pa.array([], pa.int64()),
                        "cy": pa.array([], pa.int64()),
                    }
                )
            T = np.arange(g0, g1 + 1, dtype=np.int64) * step_us
            j = np.searchsorted(t, T, side="right") - 1  # last idx with t <= T
            exact = t[j] == T
            xi = np.empty(len(T), dtype=np.int64)
            yi = np.empty(len(T), dtype=np.int64)
            xi[exact] = xs[j[exact]]
            yi[exact] = ys[j[exact]]
            m = ~exact
            if m.any():
                jp = j[m]
                dt = t[jp + 1] - t[jp]
                w1 = t[jp + 1] - T[m]
                w2 = T[m] - t[jp]
                xi[m] = (xs[jp] * w1 + xs[jp + 1] * w2) // dt
                yi[m] = (ys[jp] * w1 + ys[jp + 1] * w2) // dt
            key_scalar = group.column(key_col)[0]
            return pa.table(
                {
                    key_col: pa.array(
                        np.full(len(T), key_scalar.as_py()),
                        type=group.schema.field(key_col).type,
                    ),
                    "g": pa.array(np.arange(g0, g1 + 1, dtype=np.int64)),
                    "cx": pa.array(xi - coord_shift),
                    "cy": pa.array(yi - coord_shift),
                }
            )

    return ds.groupby(key_col).map_groups(_Resample(), batch_format="pyarrow")


def track_simplify(
    ds,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    order_col: str,
    tol_sq: int,
):
    """Per-entity Douglas-Peucker track simplification over exact integer
    coordinates — the reference applies DP at ingest via
    ``--simpGeometry``/``--tolerance`` (extensions/adapters/vector/.../ingest/
    GeometrySimpOptionProvider.java:34-37, JTS DouglasPeuckerSimplifier).

    Spec (integer-exact, SQL-replayable by a worklist recursive CTE):
    order each entity's points by ``(ts, order_col)`` -> ordinals rn=1..n;
    keep both endpoints; recursively split segment (lo, hi) at the interior
    point maximizing the squared perpendicular-distance NUMERATOR
    ``cross2 = (dx*(y-y_lo) - dy*(x-x_lo))**2`` (ties -> smallest rn), and
    split iff ``cross2 > tol_sq * len2`` where ``len2 = dx*dx + dy*dy`` —
    equivalent to perpendicular distance > tol without any division.  A
    degenerate chord (coincident endpoints) falls back to squared euclidean
    distance vs ``tol_sq``.  Output: kept points ``(key, pt_rank, x, y)``.

    Scale shape (100 TB): one groupby shuffle (the per-entity-track skew
    assumption documented at trajectory_stats); the per-group kernel is an
    iterative worklist whose per-segment argmax is one vectorized NumPy
    pass, total O(n * depth) with depth ~= log n typical.
    """
    tol_sq = int(tol_sq)

    class _DPSimplify:
        __name__ = "track_simplify"

        def __call__(self, group: pa.Table) -> pa.Table:
            from ..geom.simplify import dp_keep_mask

            ts = group.column(ts_col).to_numpy(zero_copy_only=False).astype("int64")
            oid = group.column(order_col).to_numpy(zero_copy_only=False)
            x = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
            y = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sel = np.lexsort((oid, ts))
            x, y = x[sel], y[sel]
            idx = np.flatnonzero(dp_keep_mask(x, y, tol_sq))
            key_scalar = group.column(key_col)[0]
            return pa.table(
                {
                    key_col: pa.array(
                        np.full(len(idx), key_scalar.as_py()),
                        type=group.schema.field(key_col).type,
                    ),
                    "pt_rank": pa.array(idx + 1, type=pa.int64()),
                    x_col: pa.array(x[idx]),
                    y_col: pa.array(y[idx]),
                }
            )

    return ds.groupby(key_col).map_groups(_DPSimplify(), batch_format="pyarrow")


def budget_capped_sample(ds, key_col: str, order_col: str, weight_col: str, budget: int):
    """Per-group WEIGHT-BUDGET sampling: walk each group's rows in
    ``order_col`` order and keep rows while the running (inclusive) sum of
    ``weight_col`` stays <= ``budget`` — the token-budget corpus-assembly
    rule ("take at most B tokens per source/domain when building a
    mixture"), the weighted generalization of per_group_cap's row quota.

    Scale shape (100 TB): the budget prefix depends on global order within
    the group, so unlike per_group_cap no batch-local combiner can prune
    safely (a later-ordered block cannot know the earlier blocks' weight
    sum); one groupby shuffle over per-key populations (the per-source
    skew assumption documented at trajectory_stats).  Per-group kernel is
    one argsort + one cumsum.
    """

    class _BudgetCap:
        __name__ = f"budget_cap_{budget}"

        def __call__(self, group: pa.Table) -> pa.Table:
            order = group.column(order_col).to_numpy(zero_copy_only=False)
            w = group.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sel = np.argsort(order, kind="stable")
            keep = sel[np.cumsum(w[sel]) <= budget]
            return group.take(pa.array(np.sort(keep)))

    return ds.groupby(key_col).map_groups(_BudgetCap(), batch_format="pyarrow")


def geofence_transitions(
    ds,
    zones,  # dict of int64 arrays: zone_id, minx, miny, maxx, maxy (integer units)
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    order_col: str,
):
    """Per-entity geofence ENTER/EXIT detection: assign every point the
    smallest ``zone_id`` whose integer box contains it (inclusive edges;
    -1 outside all fences), order each entity's points by ``(ts, order)``
    and emit one row per consecutive pair whose assignment changed — the
    geofencing shape of the reference's spatial-temporal query surface
    (SpatialTemporalQuery over per-entity tracks;
    core/geotime/.../store/query/api/SpatialTemporalConstraintsBuilder).

    ``zones`` is a small proven-bounded side table (broadcast per the
    repo's capped-broadcast convention — fences are configuration, not
    data); assignment is vectorized point-in-box over an (n_pts, n_zones)
    mask per batch, so no shuffle is added by the assignment itself.  The
    transition detection is one groupby shuffle over per-entity tracks
    (per-key skew assumption documented at trajectory_stats).

    Integer coordinates + min-zone-id priority keep the operator exactly
    SQL-replayable (LAG-window oracle).
    """
    import ray

    zid = np.asarray(zones["zone_id"], dtype=np.int64)
    lox = np.asarray(zones["minx"], dtype=np.int64)
    loy = np.asarray(zones["miny"], dtype=np.int64)
    hix = np.asarray(zones["maxx"], dtype=np.int64)
    hiy = np.asarray(zones["maxy"], dtype=np.int64)
    # priority = smallest zone_id wins: pre-sort so argmax(mask) picks it
    order = np.argsort(zid, kind="stable")
    zref = ray.put((zid[order], lox[order], loy[order], hix[order], hiy[order]))

    def assign(batch: pa.Table) -> pa.Table:
        zi, zx0, zy0, zx1, zy1 = ray.get(zref)
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        inside = (
            (x[:, None] >= zx0[None, :])
            & (x[:, None] <= zx1[None, :])
            & (y[:, None] >= zy0[None, :])
            & (y[:, None] <= zy1[None, :])
        )
        any_zone = inside.any(axis=1)
        first = np.argmax(inside, axis=1)
        zone = np.where(any_zone, zi[first], np.int64(-1))
        return batch.append_column("zone", pa.array(zone, type=pa.int64()))

    assign.__name__ = "geofence_assign"
    assigned = ds.map_batches(assign, batch_format="pyarrow")

    class _Transitions:
        __name__ = "geofence_transitions"

        def __call__(self, group: pa.Table) -> pa.Table:
            ts = group.column(ts_col).to_numpy(zero_copy_only=False).astype("int64")
            oid = group.column(order_col).to_numpy(zero_copy_only=False)
            z = group.column("zone").to_numpy(zero_copy_only=False)
            sel = np.lexsort((oid, ts))
            z = z[sel]
            chg = np.flatnonzero(z[1:] != z[:-1]) + 1
            key = group.column(key_col).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    key_col: pa.array(key[sel][chg]),
                    order_col: pa.array(oid[sel][chg]),
                    "from_zone": pa.array(z[chg - 1], type=pa.int64()),
                    "to_zone": pa.array(z[chg], type=pa.int64()),
                }
            )

    return assigned.groupby(key_col).map_groups(_Transitions(), batch_format="pyarrow")


def per_group_quota(ds, key_col: str, order_col: str, quotas: dict, default: int = 0):
    """``per_group_cap`` with a PER-KEY quota map: keep the ``quotas[key]``
    rows with the smallest ``order_col`` per key (keys absent from the
    map get ``default``) — the mixture-assembly primitive ("this source
    contributes k_s documents").

    Same scale shape as per_group_cap: a vectorized per-batch combiner
    prunes every block to its per-key quota before the shuffle, so hot
    sources move at most quota * n_blocks rows; the quota map is
    configuration-sized and broadcast once via ray.put."""
    import ray

    qref = ray.put(dict(quotas))

    def topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        q = ray.get(qref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        order = batch.column(order_col).to_numpy(zero_copy_only=False)
        uk, codes = np.unique(keys, return_inverse=True)
        kv = np.array([int(q.get(k, default)) for k in uk.tolist()], dtype=np.int64)
        sel = np.lexsort((order, codes))
        codes_s = codes[sel]
        new_key = np.empty(len(sel), dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        first_pos = np.maximum.accumulate(np.where(new_key, np.arange(len(sel)), 0))
        rank = np.arange(len(sel)) - first_pos
        return batch.take(pa.array(np.sort(sel[rank < kv[codes_s]])))

    topk.__name__ = "per_group_quota"
    partial = ds.map_batches(topk, batch_format="pyarrow")

    class _GroupQuota:
        __name__ = "per_group_quota_final"

        def __call__(self, group: pa.Table) -> pa.Table:
            return topk(group)

    return partial.groupby(key_col).map_groups(_GroupQuota(), batch_format="pyarrow")
