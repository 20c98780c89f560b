"""Deduplication stages for large-scale training-data pipelines.

Beyond the reference's exact DedupeFilter
(core/store/.../query/filter/DedupeFilter.java:23-52 — drop repeat
(adapter, dataId) pairs), this adds the standard near-dup family a 100 TB
text/image corpus needs: MinHash+LSH, SimHash, n-gram Jaccard verification,
and phash-based near-dup for images.  All hashing is deterministic NumPy
(no Python ``hash``), so results are stable across workers and runs.

Scale shape: shingle/minhash/simhash run vectorized in ``map_batches``;
candidate generation is a ``groupby(bucket)``; only candidate PAIRS (tiny
vs corpus) reach the driver for union-find.  At full scale the union-find
step is itself a fixed-point of groupby(min-neighbor) iterations — the
driver-side variant here is bounded by the candidate-pair count, not the
corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "exact_dedupe",
    "minhash_signatures",
    "MinHasher",
    "lsh_candidate_pairs",
    "simhash64",
    "SimHasher",
    "jaccard_pairs",
    "union_find_keep_min",
    "phash_near_dupes",
]


def _hash_bytes_vec(strings: list[bytes | str]) -> np.ndarray:
    """Deterministic 64-bit FNV-1a over byte strings (vector loop in C via
    numpy frombuffer per string is overkill; this is O(total bytes))."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        if isinstance(s, str):
            s = s.encode("utf-8", "ignore")
        h = np.uint64(0xCBF29CE484222325)
        # chunked FNV via numpy for long strings
        a = np.frombuffer(s, dtype=np.uint8)
        for b in a:
            h = np.uint64((int(h) ^ int(b)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def _splitmix(z: np.ndarray) -> np.ndarray:
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _token_hashes(text: str) -> np.ndarray:
    """Whitespace tokens -> 64-bit rolling polynomial hashes (deterministic)."""
    toks = text.lower().split()
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = np.uint64(1469598103934665603)
        for ch in t.encode("utf-8", "ignore"):
            h = np.uint64((int(h) * 31 + ch) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles -> combined hashes."""
    th = _token_hashes(text)
    if len(th) < k:
        return _splitmix(th) if len(th) else np.zeros(1, dtype=np.uint64)
    # rolling combine of k consecutive token hashes
    acc = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        acc = acc * np.uint64(1099511628211) + th[j : len(th) - k + 1 + j]
    return np.unique(_splitmix(acc))


def exact_dedupe(ds, key_col: str, id_col: str):
    """Exact dedup: keep the min ``id_col`` row per distinct ``key_col``.
    Hash-partitioned groupby — the Ray analog of DedupeFilter, but global."""

    def keep_first(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column(id_col))
        return group.take(order[:1])

    return ds.groupby(key_col).map_groups(keep_first, batch_format="pyarrow")


class MinHasher:
    """n_perm minhash signatures over k-token shingles (map_batches fn)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", n_perm: int = 64, k: int = 3):
        rng = np.random.default_rng(2024)
        self.a = rng.integers(1, 2**61 - 1, n_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61 - 1, n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (n_perm, n_shingles) universal hash, take min per perm
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None])
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts])
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "sig": pa.array(list(sigs), type=pa.list_(pa.uint64(), self.n_perm)),
            }
        )


def minhash_signatures(ds, text_col="text", id_col="doc_id", n_perm=64, k=3):
    return ds.map_batches(
        MinHasher(text_col, id_col, n_perm, k), batch_format="pyarrow"
    )


def lsh_candidate_pairs(sig_ds, id_col="doc_id", bands: int = 16, rows: int = 4):
    """Band signatures into buckets; groupby(bucket) emits candidate pairs.
    bands*rows must equal n_perm.  Returns Dataset of (id_a, id_b)."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
        n = len(batch)
        out_ids, out_buckets = [], np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            seg = sigs[:, b * rows : (b + 1) * rows]
            h = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for r in range(rows):
                h = _splitmix(h ^ seg[:, r])
            out_buckets[b * n : (b + 1) * n] = h
        idx = np.tile(np.arange(n), bands)
        return pa.table(
            {
                id_col: ids.take(pa.array(idx)),
                "bucket": pa.array(out_buckets, type=pa.uint64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], type=group.schema.field(id_col).type),
                 "id_b": pa.array([], type=group.schema.field(id_col).type)}
            )
        a, b = [], []
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    buckets = sig_ds.map_batches(to_buckets, batch_format="pyarrow")
    return buckets.groupby("bucket").map_groups(pairs, batch_format="pyarrow")


class SimHasher:
    """64-bit simhash over token hashes (map_batches fn)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def of(text: str) -> int:
        th = _splitmix(_token_hashes(text))
        if len(th) == 0:
            return 0
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        score = (2 * bits - 1).sum(axis=0)
        return int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sh = np.array([self.of(t or "") for t in texts], dtype=np.uint64)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(sh, type=pa.uint64()),
            }
        )


def simhash64(ds, text_col="text", id_col="doc_id"):
    return ds.map_batches(SimHasher(text_col, id_col), batch_format="pyarrow")


def jaccard_pairs(pairs: list[tuple], texts: dict, k: int = 3, threshold: float = 0.8):
    """Verify candidate pairs by exact shingle Jaccard (driver-side, tiny)."""
    out = []
    cache: dict = {}

    def sh(i):
        if i not in cache:
            cache[i] = set(_shingle_hashes(texts[i], k).tolist())
        return cache[i]

    for a, b in pairs:
        sa, sb = sh(a), sh(b)
        if not sa and not sb:
            continue
        j = len(sa & sb) / max(len(sa | sb), 1)
        if j >= threshold:
            out.append((a, b, j))
    return out


def union_find_keep_min(ids: list, edges: list[tuple]) -> dict:
    """Connected components over dup edges; representative = min id."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in parent}


def phash_near_dupes(ds, id_col="image_id", phash_col="phash", max_hamming: int = 2, bands: int = 4):
    """Image near-dup via 64-bit perceptual hash: band the hash into
    ``bands`` exact-match buckets (any pair within hamming distance
    bands-1 shares >=1 band), verify hamming distance in-group."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        ph = batch.column(phash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(batch)
        width = 64 // bands
        ids = batch.column(id_col)
        idx = np.tile(np.arange(n), bands)
        buckets = np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            seg = (ph >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            buckets[b * n : (b + 1) * n] = _splitmix(seg ^ np.uint64(b << 60))
        return pa.table(
            {
                id_col: ids.take(pa.array(idx)),
                phash_col: batch.column(phash_col).take(pa.array(idx)),
                "bucket": pa.array(buckets, type=pa.uint64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        ph = group.column(phash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq = {}
        for i, d in enumerate(ids):
            uniq.setdefault(d, i)
        items = sorted(uniq.items())
        a_out, b_out = [], []
        for i in range(len(items) - 1):
            for j in range(i + 1, len(items)):
                x = int(ph[items[i][1]]) ^ int(ph[items[j][1]])
                if bin(x).count("1") <= max_hamming:
                    a_out.append(items[i][0])
                    b_out.append(items[j][0])
        t = group.schema.field(id_col).type
        return pa.table({"id_a": pa.array(a_out, type=t), "id_b": pa.array(b_out, type=t)})

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    raw_pairs = buckets.groupby("bucket").map_groups(pairs, batch_format="pyarrow")

    # identical hashes match in every band — dedupe (id_a, id_b) pairs
    def keyed(batch: pa.Table) -> pa.Table:
        a = [str(x) for x in batch.column("id_a").to_pylist()]
        b = [str(x) for x in batch.column("id_b").to_pylist()]
        return batch.append_column("pair", pa.array([f"{x}|{y}" for x, y in zip(a, b)]))

    uniq = exact_dedupe(
        raw_pairs.map_batches(keyed, batch_format="pyarrow"), key_col="pair", id_col="pair"
    )
    return uniq.select_columns(["id_a", "id_b"])
