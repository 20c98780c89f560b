"""Deduplication stages for large-scale training-data pipelines.

Beyond the reference's exact DedupeFilter
(core/store/.../query/filter/DedupeFilter.java:23-52 — drop repeat
(adapter, dataId) pairs), this adds the standard near-dup family a 100 TB
text/image corpus needs: MinHash+LSH, SimHash, n-gram Jaccard verification,
and phash-based near-dup for images.  All hashing is deterministic and
batch-vectorized via stages/texthash (codepoint arithmetic, exactly
mirrored by DuckDB oracle SQL — no Python ``hash``, no per-character
loops), so results are stable across workers and runs AND hard-verifiable.

Scale shape: shingle/minhash/simhash run vectorized in ``map_batches``;
candidate generation is a ``groupby(bucket)``; duplicate-group merging is
distributed iterated min-label propagation (stages/components), never a
driver-side union-find over the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .texthash import (
    minhash_matrix,
    shingle_hashes,
    shingle_hashes_single,
    simhash_batch,
    splitmix64,
    tokenize_hash,
)

__all__ = [
    "exact_dedupe",
    "doc_shingle_rows",
    "minhash_signatures",
    "MinHasher",
    "lsh_candidate_pairs",
    "simhash64",
    "SimHasher",
    "jaccard_pairs",
    "union_find_keep_min",
    "phash_near_dupes",
    "semdedup",
]

_splitmix = splitmix64  # back-compat alias (phash derivations, tests)


def exact_dedupe(ds, key_col: str, id_col: str):
    """Exact dedup: keep the min ``id_col`` row per distinct ``key_col``.
    Hash-partitioned groupby — the Ray analog of DedupeFilter, but global."""

    def keep_first(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column(id_col))
        return group.take(order[:1])

    return ds.groupby(key_col).map_groups(keep_first, batch_format="pyarrow")


def doc_shingle_rows(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Explode documents into DISTINCT (id, sh) shingle-hash rows — the
    building block for overlap/decontamination analyses.  Fully
    vectorized: one tokenize+shingle pass per batch, lexsort run-length
    for the per-doc distinct (no per-row loops; the ngram_jaccard explode
    predates this and keeps its bounded candidate-set loop)."""

    def explode(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        tb = tokenize_hash(texts)
        sh, sho = shingle_hashes(tb, k)
        doc_idx = np.repeat(np.arange(len(texts)), np.diff(sho))
        order = np.lexsort((sh, doc_idx))
        d, s = doc_idx[order], sh[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        # int64 two's-complement view: bijective, so distinctness and
        # join/count semantics are identical — and Ray's hash shuffle
        # handles int64 keys natively (uint64 > 2**63 falls back to
        # pickled python objects)
        sh_out = s[first].copy().view(np.int64)
        return pa.table({id_col: pa.array(ids[d[first]]), "sh": pa.array(sh_out)})

    explode.__name__ = f"shingle_rows_k{k}"
    return ds.map_batches(explode, batch_format="pyarrow")


class MinHasher:
    """n_perm minhash signatures over k-token shingles (map_batches fn).
    Permutation constants come from rng(2024) so the DuckDB oracle can embed
    the identical literals."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", n_perm: int = 64, k: int = 3):
        self.a, self.b = minhash_perms(n_perm)
        self.n_perm = n_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes_single(text, self.k)
        return (sh[None, :] * self.a[:, None] + self.b[:, None]).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        tb = tokenize_hash(texts)
        sh, sho = shingle_hashes(tb, self.k)
        sigs = minhash_matrix(sh, sho, self.a, self.b)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), type=pa.uint64()), self.n_perm
                ),
            }
        )


def minhash_perms(n_perm: int = 64) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(2024)
    a = rng.integers(1, 2**61 - 1, n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61 - 1, n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(ds, text_col="text", id_col="doc_id", n_perm=64, k=3):
    return ds.map_batches(
        MinHasher(text_col, id_col, n_perm, k), batch_format="pyarrow"
    )


def _sig_matrix(batch: pa.Table, n_perm: int) -> np.ndarray:
    """FixedSizeList<uint64> -> (n, n_perm) zero-copy."""
    col = batch.column("sig")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, n_perm)


def lsh_candidate_pairs(
    sig_ds,
    id_col="doc_id",
    bands: int = 16,
    rows: int = 4,
    max_bucket: int | None = None,
):
    """Band signatures into buckets; groupby(bucket) emits candidate pairs
    (id_a < id_b, deduplicated downstream).  bands*rows must equal n_perm.

    ``max_bucket``: optional skew guard — a bucket with more members only
    emits the star (min_id, other) edges instead of all pairs, which
    preserves connected components while bounding a degenerate bucket to
    O(n) output (logged, not silent).  Default None = exact all-pairs
    (matches the band-equality SQL oracle)."""
    n_perm = bands * rows

    def to_buckets(batch: pa.Table) -> pa.Table:
        sigs = _sig_matrix(batch, n_perm)
        n = len(batch)
        ids = batch.column(id_col)
        out_buckets = np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            seg = sigs[:, b * rows : (b + 1) * rows]
            h = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for r in range(rows):
                h = splitmix64(h ^ seg[:, r])
            out_buckets[b * n : (b + 1) * n] = h
        idx = np.tile(np.arange(n), bands)
        return pa.table(
            {
                id_col: ids.take(pa.array(idx)),
                "bucket": pa.array(out_buckets, type=pa.uint64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
        t = group.schema.field(id_col).type
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], type=t), "id_b": pa.array([], type=t)})
        if max_bucket is not None and len(ids) > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "lsh bucket size %d > max_bucket=%d: emitting star edges only",
                len(ids), max_bucket,
            )
            a = np.full(len(ids) - 1, ids[0])
            b = ids[1:]
        else:
            iu, ju = np.triu_indices(len(ids), k=1)
            a, b = ids[iu], ids[ju]
        return pa.table({"id_a": pa.array(a, type=t), "id_b": pa.array(b, type=t)})

    pairs.__name__ = "lsh_bucket_pairs"
    to_buckets.__name__ = "lsh_band_buckets"
    buckets = sig_ds.map_batches(to_buckets, batch_format="pyarrow")
    return buckets.groupby("bucket").map_groups(pairs, batch_format="pyarrow")


class SimHasher:
    """64-bit simhash over token hashes (map_batches fn, batch-vectorized)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def of(text: str) -> int:
        return int(simhash_batch(tokenize_hash([text or ""]))[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        sh = simhash_batch(tokenize_hash(texts))
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(sh, type=pa.uint64()),
            }
        )


def simhash64(ds, text_col="text", id_col="doc_id"):
    return ds.map_batches(SimHasher(text_col, id_col), batch_format="pyarrow")


def jaccard_pairs(pairs: list[tuple], texts: dict, k: int = 3, threshold: float = 0.8):
    """Verify candidate pairs by exact shingle Jaccard (driver-side, tiny —
    bounded by the candidate-pair count, not the corpus)."""
    out = []
    cache: dict = {}

    def sh(i):
        if i not in cache:
            cache[i] = set(shingle_hashes_single(texts[i], k).tolist())
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
    """Connected components over dup edges; representative = min id.
    Driver-side reference implementation — the distributed path is
    stages/components.connected_components_min_label."""
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (any shape)."""
    b = np.unpackbits(x.reshape(-1).view(np.uint8))
    return b.reshape(*x.shape, 64).sum(axis=-1, dtype=np.int64)


def phash_near_dupes(ds, id_col="image_id", phash_col="phash", max_hamming: int = 2, bands: int = 4):
    """Image near-dup via 64-bit perceptual hash: band the hash into
    ``bands`` exact-match buckets (pigeonhole: any pair within hamming
    distance bands-1 shares >=1 band, so max_hamming < bands makes the
    output EXACTLY all pairs within max_hamming), verify hamming in-group
    with a vectorized pairwise popcount."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        ph = batch.column(phash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(batch)
        width = 64 // bands
        ids = batch.column(id_col)
        idx = np.tile(np.arange(n), bands)
        buckets = np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            seg = (ph >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            buckets[b * n : (b + 1) * n] = splitmix64(seg ^ np.uint64(b << 60))
        return pa.table(
            {
                id_col: ids.take(pa.array(idx)),
                phash_col: batch.column(phash_col).take(pa.array(idx)),
                "bucket": pa.array(buckets, type=pa.uint64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids_all = group.column(id_col).to_numpy(zero_copy_only=False)
        ph_all = group.column(phash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        ids, first = np.unique(ids_all, return_index=True)
        t = group.schema.field(id_col).type
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], type=t), "id_b": pa.array([], type=t)})
        ph = ph_all[first]
        iu, ju = np.triu_indices(len(ids), k=1)
        ham = _popcount64(ph[iu] ^ ph[ju])
        keep = ham <= max_hamming
        return pa.table(
            {"id_a": pa.array(ids[iu[keep]], type=t), "id_b": pa.array(ids[ju[keep]], type=t)}
        )

    pairs.__name__ = "phash_bucket_pairs"
    to_buckets.__name__ = "phash_band_buckets"
    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    raw_pairs = buckets.groupby("bucket").map_groups(pairs, batch_format="pyarrow")

    # identical hashes match in every band — dedupe (id_a, id_b) pairs
    def keyed(batch: pa.Table) -> pa.Table:
        a = pa.compute.cast(batch.column("id_a"), pa.string())
        b = pa.compute.cast(batch.column("id_b"), pa.string())
        return batch.append_column(
            "pair", pa.compute.binary_join_element_wise(a, b, "|")
        )

    keyed.__name__ = "pair_key"
    uniq = exact_dedupe(
        raw_pairs.map_batches(keyed, batch_format="pyarrow"), key_col="pair", id_col="pair"
    )
    return uniq.select_columns(["id_a", "id_b"])


def _doc_windows(texts: list[str], L: int):
    """All length-``L`` codepoint windows across a batch of docs:
    returns (cp, joined, starts, doc_of) where ``starts`` are global
    offsets into ``cp``/``joined`` and windows never cross docs."""
    from .texthash import _codepoints

    cp, offsets = _codepoints(texts)
    m = len(cp)
    if m < L:
        return cp, "", np.zeros(0, np.int64), np.zeros(0, np.int64)
    p = np.arange(m - L + 1, dtype=np.int64)
    doc_of = np.searchsorted(offsets, p, "right") - 1
    valid = p + L <= offsets[doc_of + 1]
    return cp, "".join(texts), p[valid], doc_of[valid]


def exact_substring_dup_counts(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 32,
    dup_hash_cap: int = 5_000_000,
    driver_cap_bytes: int = 256 << 20,
    num_partitions: int = 16,
):
    """Per-doc count of length-``L`` window POSITIONS whose exact
    substring also occurs in at least one OTHER doc — the scalable analog
    of suffix-array exact-substring dedup (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"; windowed exact match instead of unbounded suffix match).
    Returns (id, n_dup_windows), docs with zero dup windows omitted.

    EXACT by construction: rolling hashes only PREFILTER; survivors are
    re-grouped on the real substring, so a hash collision costs one
    wasted candidate, never a wrong count.

    Two regimes, gated METADATA-ONLY (``ds.size_bytes()`` — parquet
    column stats, nothing executes) so the corpus is never pulled to
    find out it was too big:

    - corpus <= ``driver_cap_bytes``: window-scale distributed aggregates
      are slower than one driver reduction (millions of singleton groups
      dominate Ray's hash aggregate), so per-batch blobs of per-doc-
      distinct hashes reduce on the driver (np.unique — the
      hll/dsir bounded-partial convention) and the candidate
      (win, doc, n_pos) rows (dup-scale) finish in one driver groupby.
    - larger corpora: fully distributed. pass A streams
      (window_hash, doc, n_pos) rows — 24 bytes per DISTINCT
      (hash, doc), no strings; one groupby(hash) finds hashes hitting
      >= 2 docs; under ``dup_hash_cap`` those broadcast and pass B
      extracts the actual substring ONLY at candidate positions, then
      one groupby on the string decides exactly.  Above the cap the
      prefilter is skipped and every window string ships through the
      same groupby — still exact, one heavier shuffle."""
    import pyarrow.compute as pc  # noqa: F401
    import ray

    from .texthash import segment_poly_hash
    from .util import collect_table

    BASE = 1099511628211  # FNV prime; any odd base works mod 2**64

    def pass_a(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cp, _, starts, doc_of = _doc_windows(texts, L)
        if len(starts) == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                 "n_pos": pa.array([], pa.int64())}
            )
        h = segment_poly_hash(cp, starts, starts + L - 1, BASE).view(np.int64)
        sel = np.lexsort((h, doc_of))
        hs, ds_ = h[sel], doc_of[sel]
        new = np.empty(len(sel), dtype=bool)
        new[0] = True
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        firsts = np.nonzero(new)[0]
        counts = np.diff(np.append(firsts, len(sel)))
        return pa.table(
            {
                "h": pa.array(hs[firsts]),
                id_col: pa.array(ids[ds_[firsts]]),
                "n_pos": pa.array(counts.astype(np.int64)),
            }
        )

    pass_a.__name__ = "substr_hash_docs"

    def pass_b(dup_ref):
        def fn(batch: pa.Table) -> pa.Table:
            texts = [t or "" for t in batch.column(text_col).to_pylist()]
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            cp, joined, starts, doc_of = _doc_windows(texts, L)
            empty = pa.table(
                {"win": pa.array([], pa.string()), id_col: pa.array([], pa.int64()),
                 "n_pos": pa.array([], pa.int64())}
            )
            if len(starts) == 0:
                return empty
            if dup_ref is not None:
                duph = ray.get(dup_ref)
                h = segment_poly_hash(cp, starts, starts + L - 1, BASE).view(np.int64)
                idx = np.searchsorted(duph, h)
                idx[idx >= len(duph)] = 0
                keep = duph[idx] == h if len(duph) else np.zeros(len(h), bool)
                starts, doc_of = starts[keep], doc_of[keep]
                if len(starts) == 0:
                    return empty
            # candidate-scale string extraction (bounded by dup positions
            # on the broadcast path)
            wins = [joined[s : s + L] for s in starts]
            t = pa.table(
                {"win": pa.array(wins, pa.string()), id_col: pa.array(ids[doc_of])}
            )
            g = pa.TableGroupBy(t, ["win", id_col]).aggregate([([], "count_all")])
            return g.rename_columns(["win", id_col, "n_pos"])

        fn.__name__ = "substr_win_extract"
        return fn

    class _WinDecide:
        """Emit (id, n_pos) per doc when the window string spans >= 2 docs
        ((win, doc) rows are globally unique — a doc lives in one batch)."""

        __name__ = "substr_win_decide"

        def __init__(self, id_col: str):
            self.id_col = id_col

        def __call__(self, group: pa.Table) -> pa.Table:
            if len(group) < 2:
                return pa.table(
                    {self.id_col: pa.array([], pa.int64()),
                     "n_pos": pa.array([], pa.int64())}
                )
            return group.select([self.id_col, "n_pos"])

    # ---- regime gate: metadata only, nothing executes -----------------
    try:
        sz = ds.size_bytes()
    except Exception:
        sz = None
    if sz is not None and 0 <= sz <= driver_cap_bytes:
        # small-corpus fast path: driver-reduce the hash histogram
        def pass_a_blob(batch: pa.Table) -> pa.Table:
            t = pass_a(batch)
            hs = t.column("h").to_numpy(zero_copy_only=False)
            return pa.table({"hs": pa.array([hs], type=pa.large_list(pa.int64()))})

        pass_a_blob.__name__ = "substr_hash_blob"
        parts = ds.map_batches(pass_a_blob, batch_format="pyarrow").take_all()
        blobs = [np.asarray(r["hs"], dtype=np.int64) for r in parts]
        all_h = np.concatenate(blobs) if blobs else np.zeros(0, np.int64)
        uniq, cnt = np.unique(all_h, return_counts=True)
        dup_ref = ray.put(uniq[cnt > 1])  # per-doc-distinct => cnt = n_docs
        cand = collect_table(
            ds.map_batches(pass_b(dup_ref), batch_format="pyarrow")
        ).to_pandas()
        # exact verify: keep windows whose STRING spans >= 2 docs
        # ((win, doc) rows are globally unique — a doc lives in one batch)
        n_docs_of_win = cand.groupby("win")["win"].transform("size")
        out = (
            cand[n_docs_of_win > 1]
            .groupby(id_col, as_index=False)["n_pos"]
            .sum()
            .sort_values(id_col)
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
                    "n_dup_windows": pa.array(out["n_pos"].to_numpy(), pa.int64()),
                }
            )
        )

    # ---- distributed regime -------------------------------------------
    a = ds.map_batches(pass_a, batch_format="pyarrow")

    def only_dup(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column("count()"), 1)).select(["h"])

    only_dup.__name__ = "substr_only_dup_hashes"
    dup_h = (
        a.groupby("h").count().map_batches(only_dup, batch_format="pyarrow").materialize()
    )
    dup_ref = None
    if dup_h.count() <= dup_hash_cap:
        arr = collect_table(dup_h).column("h").to_numpy(zero_copy_only=False)
        dup_ref = ray.put(np.sort(arr.astype(np.int64)))
    per_doc = (
        ds.map_batches(pass_b(dup_ref), batch_format="pyarrow")
        .groupby("win")
        .map_groups(_WinDecide(id_col), batch_format="pyarrow")
        .groupby(id_col)
        .sum("n_pos")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([id_col, "n_dup_windows"])

    rename.__name__ = "substr_rename"
    return per_doc.map_batches(rename, batch_format="pyarrow")


def fastss_pairs(ds, id_col: str, str_col: str, max_len: int = 12):
    """EXACT edit-distance<=1 similarity join via FastSS deletion
    neighborhoods (Bocek et al. 2007, public): every string emits
    itself plus each single-deletion variant; any pair within edit
    distance 1 shares at least one variant (substitution -> both delete
    the differing position; indel -> the longer's deletion equals the
    shorter; equality -> the identity variant), so bucketing by variant
    is a COMPLETE candidate generator.  Candidates are deduped by pair
    key and verified with a vectorized exact check — no false
    positives survive.

    Scale shape (100 TB): two shuffles (variant buckets, pair dedup);
    per-string fan-out is len+1 <= max_len+1 variants; bucket sizes are
    bounded by near-duplicate multiplicity (the usual banding skew
    assumption).  Returns (id_a, id_b) with id_a < id_b.
    """

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ss = batch.column(str_col).to_pylist()
        v_out, i_out, s_out = [], [], []
        for i, s in zip(ids.tolist(), ss):
            s = s or ""
            if len(s) > max_len:
                raise ValueError(f"fastss string longer than max_len={max_len}")
            v_out.append(s)
            i_out.append(i)
            s_out.append(s)
            for k in range(len(s)):
                v_out.append(s[:k] + s[k + 1 :])
                i_out.append(i)
                s_out.append(s)
        return pa.table(
            {
                "variant": pa.array(v_out),
                id_col: pa.array(i_out, type=pa.int64()),
                str_col: pa.array(s_out),
            }
        )

    variants.__name__ = "fastss_variants"
    var = ds.map_batches(variants, batch_format="pyarrow")

    def _ed1_mask(pa_mat, la, pb_mat, lb):
        """Vectorized exact ed<=1 over padded codepoint matrices."""
        same_len = la == lb
        ham = ((pa_mat != pb_mat) & (np.arange(pa_mat.shape[1])[None, :] < la[:, None])).sum(axis=1)
        ok = same_len & (ham <= 1)
        # indel: |len diff| == 1 -> longer minus one position equals shorter
        d1 = np.abs(la - lb) == 1
        if d1.any():
            lng = np.where(la >= lb, la, lb)
            L = pa_mat.shape[1]
            big = np.where((la >= lb)[:, None], pa_mat, pb_mat)
            sml = np.where((la >= lb)[:, None], pb_mat, pa_mat)
            hit = np.zeros(len(la), dtype=bool)
            for k in range(L):
                # delete position k of the longer string
                dele = np.concatenate(
                    [big[:, :k], big[:, k + 1 :], np.zeros((len(la), 1), big.dtype)],
                    axis=1,
                )
                col = np.arange(L)[None, :]
                m = ((dele == sml) | (col >= (lng - 1)[:, None])).all(axis=1)
                hit |= m & (k < lng)
            ok |= d1 & hit
        return ok

    class _Bucket:
        __name__ = "fastss_bucket"

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            ss = np.asarray(group.column(str_col).to_pylist(), dtype=object)
            ids, first = np.unique(ids, return_index=True)
            ss = ss[first]
            n = len(ids)
            empty = pa.table({"pair": pa.array([], pa.int64())})
            if n < 2:
                return empty
            if n > 2000:
                raise ValueError("fastss bucket exceeds pair guard")
            # padded codepoint matrix once per bucket
            L = max_len
            mat = np.zeros((n, L), dtype=np.uint32)
            lens = np.zeros(n, dtype=np.int64)
            for r, t in enumerate(ss.tolist()):
                cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                mat[r, : len(cp)] = cp
                lens[r] = len(cp)
            ii, jj = np.triu_indices(n, k=1)
            # VERIFY at bucket time (vectorized): only true ed<=1 pairs
            # move on, so the dedup step is a native hash aggregate
            ok = _ed1_mask(mat[ii], lens[ii], mat[jj], lens[jj])
            ii, jj = ii[ok], jj[ok]
            return pa.table({"pair": pa.array((ids[ii] << np.int64(32)) + ids[jj])})

    cands = var.groupby("variant").map_groups(_Bucket(), batch_format="pyarrow")
    deduped = cands.groupby("pair").count()

    def decode(batch: pa.Table) -> pa.Table:
        p = batch.column("pair").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array(p >> np.int64(32)),
                "id_b": pa.array(p & np.int64(0xFFFFFFFF)),
            }
        )

    decode.__name__ = "fastss_decode"
    return deduped.map_batches(decode, batch_format="pyarrow")


def semdedup(
    ds,
    cent_ref,
    eps: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup over
    an embedding column.  Assign every vector to its nearest centroid by
    cosine (ties -> smallest centroid index), then WITHIN each cluster drop
    any member whose cosine similarity to a surviving-preferred member is
    >= ``eps``.  Keep-preference follows the paper's best-performing rule —
    keep the examples with LOW similarity to the centroid (farthest first),
    ties broken by smallest id: member x is dropped iff some same-cluster y
    with key(y) < key(x), key = (sim_to_centroid, id), has cos(x, y) >= eps.

    ``cent_ref`` is a ``ray.put`` handle to a row-normalized float64
    centroid matrix (k, d) — broadcast once, read per worker.

    Scale shape: assignment is a map-only matmul against the broadcast
    centroids; the only shuffle is ``groupby(cluster)``; the within-cluster
    pairwise cosine is O(m^2) exactly like the paper's implementation, so
    size k such that E[m] = N/k fits a worker (the paper runs k = 50k on
    LAION-440M for the same reason).  Centroids here come from any
    deterministic trainer (stages/analytics.kmeans at scale); the oracle
    query seeds them with the k smallest-id vectors so DuckDB can replay
    the full chain bit-for-bit.
    """
    import ray

    from .ann import _normalize, _vec_matrix
    from .util import stage_fn

    class _Assign:
        def __init__(self):
            self.cmat = ray.get(cent_ref)  # (k, d) normalized float64

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = _normalize(_vec_matrix(batch.column(vec_col), dtype=np.float64))
            sims = v @ self.cmat.T
            cl = np.argmax(sims, axis=1)  # first max == smallest index on ties
            csim = sims[np.arange(len(cl)), cl]
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "cluster": pa.array(cl.astype(np.int64)),
                    "_csim": pa.array(csim),
                }
            )

    class _Drop:
        __name__ = "semdedup_drop"

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            csim = group.column("_csim").to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, csim))  # keep-preferred first
            m = _normalize(_vec_matrix(group.column(vec_col), dtype=np.float64))
            m = m[order]
            sims = m @ m.T
            dropped = np.any(np.tril(sims >= eps, -1), axis=1)
            keep = order[~dropped]
            return pa.table(
                {
                    id_col: group.column(id_col).take(pa.array(keep)),
                    "cluster": group.column("cluster").take(pa.array(keep)),
                }
            )

    assigned = ds.map_batches(stage_fn(_Assign), batch_format="pyarrow")
    return assigned.groupby("cluster").map_groups(_Drop(), batch_format="pyarrow")
