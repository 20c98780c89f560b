"""Aggregations, binned statistics, sketches.

Reference contract: Aggregation<P,R,T> partial/final combine
(core/store/.../api/Aggregation.java:25; BinningAggregation.java:36-115;
statistics: CountStatistic, BoundingBoxStatistic, NumericRangeStatistic,
FixedBinNumericHistogramStatistic, HyperLogLogStatistic, CountMinSketch).

Ray-Data shape: every aggregate pre-combines inside ``map_batches`` (one
partial row per (batch, bin)), then a small ``groupby(bin)`` merges
partials — the shuffle moves only partial aggregates, never raw rows.
Sketches (HLL / CMS) are own NumPy implementations (datasketches is not
installed here); both are mergeable so they follow the same partial/final
pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "binned_aggregate",
    "global_stats",
    "HyperLogLog",
    "CountMinSketch",
    "BloomFilter",
    "TDigest",
    "FixedBinHistogram",
    "MinimalBinDistanceHistogram",
]


def binned_aggregate(ds, bin_cols, value_col: str, lon_col: str | None = None, lat_col: str | None = None):
    """count/sum/min/max of ``value_col`` per bin, with optional bbox
    (lon/lat min/max) statistics — BinningAggregation + BoundingBoxStatistic.

    Partial-combines per batch with the ARROW hash aggregate
    (``pa.TableGroupBy`` — no pandas round trip), then merges partials with
    NATIVE Ray Data groupby aggregates (no per-group Python callables).
    Output columns: bin cols + n, sum_v, min_v, max_v [, minx,miny,maxx,maxy].
    """
    from ray.data.aggregate import Max, Min, Sum

    bin_cols = list(bin_cols)
    with_bbox = lon_col is not None

    specs = [(value_col, "count"), (value_col, "sum"), (value_col, "min"), (value_col, "max")]
    names = ["n", "sum_v", "min_v", "max_v"]
    if with_bbox:
        specs += [(lon_col, "min"), (lon_col, "max"), (lat_col, "min"), (lat_col, "max")]
        names += ["minx", "maxx", "miny", "maxy"]

    def partial(batch: pa.Table) -> pa.Table:
        cols = [*bin_cols, value_col] + ([lon_col, lat_col] if with_bbox else [])
        out = pa.TableGroupBy(batch.select(cols), bin_cols).aggregate(specs)
        # pyarrow names: key cols first, then <col>_<agg>
        return out.rename_columns([*bin_cols, *names])

    partial.__name__ = "binned_partial"
    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [
        Sum("n", alias_name="n"),
        Sum("sum_v", alias_name="sum_v"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    ]
    if with_bbox:
        aggs += [
            Min("minx", alias_name="minx"),
            Max("maxx", alias_name="maxx"),
            Min("miny", alias_name="miny"),
            Max("maxy", alias_name="maxy"),
        ]
    return partials.groupby(bin_cols).aggregate(*aggs)


# -------------------------------------------------------------------- sketches
class HyperLogLog:
    """Mergeable HLL (p=12 default, standard bias-corrected estimator)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    @staticmethod
    def _hash(values: np.ndarray) -> np.ndarray:
        z = values.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1)  # sentinel bit
        # rank = leading zeros of rest + 1; exact integer msb via binary
        # search (a float log2 would mis-rank values within rounding
        # distance below a power of two)
        x = rest.copy()
        msb = np.zeros(len(rest), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            m = x >= (np.uint64(1) << np.uint64(shift))
            msb[m] += shift
            x[m] >>= np.uint64(shift)
        rank = np.clip(63 - msb + 1, 1, 64 - self.p).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_ints(self, values: np.ndarray) -> "HyperLogLog":
        return self.add_hashed(self._hash(np.asarray(values)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


class CountMinSketch:
    """Mergeable count-min sketch (d rows x w columns)."""

    def __init__(self, d: int = 4, w: int = 2048, table: np.ndarray | None = None):
        self.d = d
        self.w = w
        self.table = table if table is not None else np.zeros((d, w), dtype=np.int64)
        self._seeds = np.arange(1, d + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def add_ints(self, values: np.ndarray, counts: np.ndarray | None = None):
        v = np.asarray(values).astype(np.uint64)
        if counts is None:
            counts = np.ones(len(v), dtype=np.int64)
        for r in range(self.d):
            z = (v + self._seeds[r]) * np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(29)
            idx = (z % np.uint64(self.w)).astype(np.int64)
            np.add.at(self.table[r], idx, counts)
        return self

    def query_ints(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values).astype(np.uint64)
        est = np.full(len(v), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.d):
            z = (v + self._seeds[r]) * np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(29)
            idx = (z % np.uint64(self.w)).astype(np.int64)
            est = np.minimum(est, self.table[r, idx])
        return est

    def merge(self, other: "CountMinSketch"):
        self.table += other.table
        return self


class FixedBinHistogram:
    """FixedBinNumericHistogramStatistic analog: fixed [lo, hi) bins."""

    def __init__(self, lo: float, hi: float, n_bins: int = 64, counts: np.ndarray | None = None):
        self.lo = lo
        self.hi = hi
        self.n_bins = n_bins
        self.counts = counts if counts is not None else np.zeros(n_bins, dtype=np.int64)

    def add(self, values: np.ndarray):
        v = np.asarray(values, dtype=np.float64)
        idx = np.clip(
            ((v - self.lo) / (self.hi - self.lo) * self.n_bins).astype(np.int64),
            0,
            self.n_bins - 1,
        )
        np.add.at(self.counts, idx, 1)
        return self

    def merge(self, other: "FixedBinHistogram"):
        self.counts += other.counts
        return self


class MinimalBinDistanceHistogram:
    """Dynamic streaming histogram that caps its bin count by merging the
    two CLOSEST bins — the reference's MinimalBinDistanceHistogram
    (core/store/.../statistics/histogram/MinimalBinDistanceHistogram.java),
    which is the public Ben-Haim & Tom-Yom-Tov streaming-parallel-decision-
    tree histogram (JMLR 11, 2010).  Bins are (value, count) centroids;
    mergeable (concatenate + re-compact), so it runs as partial sketches
    per batch merged on the driver like HLL/CMS/TDigest here."""

    def __init__(self, max_bins: int = 64, values=None, counts=None):
        self.max_bins = max_bins
        self.values = np.asarray(values if values is not None else [], dtype=np.float64)
        self.counts = np.asarray(counts if counts is not None else [], dtype=np.int64)

    def _compact(self):
        order = np.argsort(self.values, kind="stable")
        v, c = self.values[order], self.counts[order]
        # collapse exact duplicates first (vectorized)
        if len(v) > 1:
            first = np.flatnonzero(np.diff(v, prepend=np.nan) != 0)
            c = np.add.reduceat(c, first)
            v = v[first]
        while len(v) > self.max_bins:
            gaps = np.diff(v)
            i = int(np.argmin(gaps))
            tot = c[i] + c[i + 1]
            merged = (v[i] * c[i] + v[i + 1] * c[i + 1]) / tot
            v = np.concatenate([v[:i], [merged], v[i + 2 :]])
            c = np.concatenate([c[:i], [tot], c[i + 2 :]])
        self.values, self.counts = v, c

    def add(self, values: np.ndarray):
        v = np.asarray(values, dtype=np.float64)
        uv, uc = np.unique(v, return_counts=True)
        self.values = np.concatenate([self.values, uv])
        self.counts = np.concatenate([self.counts, uc.astype(np.int64)])
        self._compact()
        return self

    def merge(self, other: "MinimalBinDistanceHistogram"):
        self.values = np.concatenate([self.values, other.values])
        self.counts = np.concatenate([self.counts, other.counts])
        self._compact()
        return self

    def total(self) -> int:
        return int(self.counts.sum())

    def quantile(self, q: float) -> float:
        """Interpolated quantile (the reference's sum/quantile surface)."""
        if not len(self.values):
            return float("nan")
        cum = np.cumsum(self.counts) - self.counts / 2.0
        target = q * self.counts.sum()
        return float(np.interp(target, cum, self.values))

    def cdf(self, x: float) -> float:
        """Approximate fraction of mass <= x."""
        if not len(self.values):
            return float("nan")
        cum = np.cumsum(self.counts) - self.counts / 2.0
        return float(np.interp(x, self.values, cum) / self.counts.sum())

    def to_bytes(self) -> bytes:
        import struct

        return (
            struct.pack("<2I", self.max_bins, len(self.values))
            + self.values.tobytes()
            + self.counts.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "MinimalBinDistanceHistogram":
        import struct

        max_bins, n = struct.unpack_from("<2I", data, 0)
        off = 8
        v = np.frombuffer(data, dtype=np.float64, count=n, offset=off)
        c = np.frombuffer(data, dtype=np.int64, count=n, offset=off + 8 * n)
        return cls(max_bins, v.copy(), c.copy())


def global_stats(ds, value_col: str, id_col: str | None = None):
    """One-pass global statistics: count, sum, min, max, mean + HLL distinct
    (when ``id_col`` given) via partial sketches merged on the driver.
    Mirrors the reference's ingest-maintained statistics
    (StatisticUpdateCallback merge-on-flush)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        out = {
            "n": pa.array([len(v)], type=pa.int64()),
            "sum_v": pa.array([float(v.sum())]),
            "min_v": pa.array([float(v.min()) if len(v) else np.inf]),
            "max_v": pa.array([float(v.max()) if len(v) else -np.inf]),
        }
        if id_col is not None:
            hll = HyperLogLog()
            ids = batch.column(id_col)
            if pa.types.is_integer(ids.type):
                hll.add_ints(ids.to_numpy(zero_copy_only=False))
            else:
                from .texthash import hash_strings

                # deterministic across workers (builtin hash() of str is
                # PYTHONHASHSEED-randomized per process — round-2 ADVICE)
                hh = hash_strings(ids.to_pylist())
                hll.add_hashed(HyperLogLog._hash(hh))
            out["hll"] = pa.array([hll.to_bytes()], type=pa.large_binary())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    total = sum(r["sum_v"] for r in parts)
    res = {
        "n": n,
        "sum": total,
        "min": min(r["min_v"] for r in parts) if parts else None,
        "max": max(r["max_v"] for r in parts) if parts else None,
        "mean": total / n if n else None,
    }
    if id_col is not None and parts:
        hll = HyperLogLog.from_bytes(parts[0]["hll"])
        for r in parts[1:]:
            hll.merge(HyperLogLog.from_bytes(r["hll"]))
        res["approx_distinct"] = hll.estimate()
    return res


class BloomFilter:
    """Mergeable Bloom filter (BloomFilterStatistic analog,
    core/store/.../statistics/field/HyperLogLogStatistic.java:33 sibling).
    k hash probes over an m-bit array; merge = OR."""

    def __init__(self, m_bits: int = 1 << 16, k: int = 4, bits: np.ndarray | None = None):
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)
        self._seeds = np.arange(1, k + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values).astype(np.uint64)
        out = np.empty((self.k, len(v)), dtype=np.int64)
        for r in range(self.k):
            z = (v + self._seeds[r]) * np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(29)
            out[r] = (z % np.uint64(self.m)).astype(np.int64)
        return out

    def add_ints(self, values: np.ndarray) -> "BloomFilter":
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return self

    def might_contain(self, values: np.ndarray) -> np.ndarray:
        pos = self._positions(values)
        hit = np.ones(pos.shape[1], dtype=bool)
        for r in range(self.k):
            hit &= (self.bits[pos[r] >> 3] >> (pos[r] & 7)) & 1 == 1
        return hit

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, m_bits: int = 1 << 16, k: int = 4) -> "BloomFilter":
        return cls(m_bits, k, np.frombuffer(b, dtype=np.uint8).copy())


class TDigest:
    """Mergeable t-digest quantile sketch (TDigestNumericHistogram analog,
    adapter/statistics/histogram/TDigestNumericHistogram.java:15) — the
    merging-digest variant of Dunning & Ertl's public algorithm with the
    arcsine scale function."""

    def __init__(self, compression: int = 100, means=None, weights=None):
        self.compression = compression
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        if len(means) == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means)
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0

        def k(q):
            return self.compression * (np.arcsin(2 * q - 1) / np.pi + 0.5)

        for m, w in zip(means[1:], weights[1:]):
            q0 = w_so_far / total
            q1 = (w_so_far + cur_w + w) / total
            if k(q1) - k(q0) <= 1.0:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        if len(v) == 0:
            return self
        self._compress(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, np.ones(len(v))]),
        )
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, compression: int = 100) -> "TDigest":
        arr = np.frombuffer(b, dtype="<f8")
        half = len(arr) // 2
        return cls(compression, arr[:half].copy(), arr[half:].copy())


def bottom_k_sample(ds, id_col: str, k: int):
    """Bottom-k (KMV) sketch over the DISTINCT values of ``id_col``:
    keep the k smallest splitmix64 hashes — simultaneously a uniform
    distinct-value sample and a cardinality estimator
    (est = (k-1) * 2^64 // h_k, exact integer arithmetic), the classic
    mergeable companion of the engine's HyperLogLog
    (statistics/field/... sketch family of the reference).

    Scale shape (100 TB): per-batch partial = unique -> hash -> k
    smallest (argpartition), so each batch emits <= k rows; the final
    merge sorts the tiny union.  Output: (rank, value, hash64) rows for
    the k winners — hash64 is the uint64 hash stored as int64 with the
    sign bit preserved (SQL replays the same reinterpretation).
    """
    from .texthash import splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(id_col).to_numpy(zero_copy_only=False)
        u = np.unique(v).astype(np.uint64)
        h = splitmix64(u)
        if len(h) > k:
            sel = np.argpartition(h, k)[:k]
            u, h = u[sel], h[sel]
        return pa.table(
            {
                id_col: pa.array(u.astype(np.int64)),
                "h": pa.array(h.astype(np.int64)),
            }
        )

    partial.__name__ = f"bottomk_partial_{k}"

    def final(batch: pa.Table) -> pa.Table:
        v = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        v, idx = np.unique(v, return_index=True)
        h = h[idx]
        order = np.argsort(h, kind="stable")[:k]
        v, h = v[order], h[order]
        est = np.int64((k - 1) * (1 << 64) // int(h[-1])) if len(h) == k else np.int64(len(h))
        return pa.table(
            {
                "rank": pa.array(np.arange(len(v), dtype=np.int64)),
                id_col: pa.array(v),
                "hash64": pa.array(h.astype(np.int64)),
                "distinct_est": pa.array(np.full(len(v), est)),
            }
        )

    final.__name__ = f"bottomk_final_{k}"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )


def grouped_hll_states(ds, key_col: str, id_col: str, p: int = 12):
    """BINNED HyperLogLog: one mergeable HLL register bank per group —
    the reference's BinningAggregation composed with its sketch
    statistics (query/aggregate/BinningAggregation.java x
    statistics/field sketches).  Output per group: n_rows,
    sum_registers, zero_registers — the same register-STATE parity
    surface as the global hll query (an oracle can replay register
    maxima exactly; a float estimate could not be hash-compared).

    Scale shape: per-batch partials emit at most (groups-in-batch x m)
    register rows pre-maxed locally; the global merge is
    groupby(key, idx).max — register-bank-sized, not data-sized.
    """
    from ray.data.aggregate import Count, Max, Sum

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = HyperLogLog._hash(vals)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64(1)
        x = rest.copy()
        msb = np.zeros(len(rest), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            sel = x >= (np.uint64(1) << np.uint64(shift))
            msb[sel] += shift
            x[sel] >>= np.uint64(shift)
        rank = np.clip(63 - msb + 1, 1, 64 - p).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)  # groups are enum-scale
        combined = inv * m + idx
        regs = np.zeros(len(uk) * m, dtype=np.int64)
        np.maximum.at(regs, combined, rank)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                key_col: pa.array(uk[nz // m]),
                "idx": pa.array((nz % m).astype(np.int64)),
                "rank": pa.array(regs[nz]),
            }
        )

    partial.__name__ = f"hll_grouped_partial_p{p}"
    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "idx"])
        .aggregate(Max("rank", alias_name="rank"))
    )

    class _Digest:
        __name__ = "hll_grouped_digest"

        def __call__(self, group: pa.Table) -> pa.Table:
            r = group.column("rank").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    key_col: group.column(key_col).slice(0, 1),
                    "sum_registers": pa.array([int(r.sum())], pa.int64()),
                    "zero_registers": pa.array([m - len(r)], pa.int64()),
                }
            )

    digests = merged.groupby(key_col).map_groups(_Digest(), batch_format="pyarrow")

    counts = ds.groupby(key_col).count()

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([key_col, "n_rows"])

    rename.__name__ = "hll_grouped_counts"
    from .util import safe_join

    return safe_join(
        digests,
        counts.map_batches(rename, batch_format="pyarrow"),
        "inner",
        4,
        (key_col,),
    )
