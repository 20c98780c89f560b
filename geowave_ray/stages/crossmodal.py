"""Cross-modal (image+caption) pair mining over the north-rule table.

GeoWave has no cross-modal surface — these are training-data extensions
for the image+caption corpus shape (BASELINE.json input_hint), layered on
the engine's existing kernels:

- ``within_group_diff_pairs``: hash-partitioned groupby + in-group pair
  expansion, emitting only pairs whose OTHER modality differs.  Composing
  it both ways gives the cross-modal dup diagnostic: same phash with a
  new caption (re-captioned image) and same caption with a new image
  (stock-caption reuse) — the two row classes a contrastive-training
  dedupe pass must treat differently.
- ``hard_negative_pairs``: CLIP-style hard-negative candidate mining —
  visually near-duplicate pairs (banded 64-bit phash, pigeonhole-complete
  for ``max_hamming < bands``, same guarantee as
  ``dedupe.phash_near_dupes``) whose captions are MATERIALLY different
  (token-set Jaccard below a cutoff).  Such pairs are exactly the
  negatives a contrastive loss learns most from.

Scale shape (100 TB): both operators are one hash shuffle on the group
key (phash / caption / band bucket) followed by in-group vectorized pair
expansion.  Pair expansion is QUADRATIC in group size (memory AND output
rows), so ``max_group`` is sized to bound it (~0.5 GB of index arrays at
the default 8,192); an over-cap group logs and is SKIPPED — unlike
``lsh_candidate_pairs(max_bucket=...)``, which degrades to star edges,
because star edges are only valid when pairs feed a connected-components
pass, not a per-pair diagnostic.  The caption Jaccard verify runs only
on the banding survivors (pair-scale), never all-pairs.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

__all__ = ["within_group_diff_pairs", "hard_negative_pairs"]


def _token_set(caption: str) -> frozenset:
    return frozenset(caption.lower().split())


def within_group_diff_pairs(
    ds,
    group_col: str,
    diff_col: str,
    id_col: str = "image_id",
    max_group: int = 8_192,
):
    """All unordered pairs (id_a < id_b) sharing ``group_col`` whose
    ``diff_col`` values DIFFER.  One shuffle on the group key; pair
    expansion is vectorized (triu indices) per group.

    ``max_group`` bounds the QUADRATIC pair expansion: a group of n
    costs ~16*n^2/2 bytes of index arrays (the default 8,192 caps that
    at ~0.5 GB) and up to n^2/2 output rows — an over-cap group is
    logged and skipped, because its pair set is itself corpus-scale
    (50k copies of one stock caption = 1.25e9 pairs); downstream
    consumers wanting those groups should handle them as exact-dup
    CLASSES (dedupe.exact_dedupe) rather than pair lists."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        t = group.schema.field(id_col).type
        empty = pa.table({"id_a": pa.array([], type=t), "id_b": pa.array([], type=t)})
        if len(ids) < 2:
            return empty
        if len(ids) > max_group:
            logger.warning(
                "group of %d > max_group=%d on %s: skipped (skew guard)",
                len(ids), max_group, group_col,
            )
            return empty
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vals = np.asarray(group.column(diff_col).to_pylist(), dtype=object)[order]
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = vals[iu] != vals[ju]
        return pa.table(
            {"id_a": pa.array(ids[iu[keep]], type=t), "id_b": pa.array(ids[ju[keep]], type=t)}
        )

    pairs.__name__ = f"diff_pairs_{group_col}"
    return ds.groupby(group_col).map_groups(pairs, batch_format="pyarrow")


def hard_negative_pairs(
    ds,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_hamming: int = 2,
    bands: int = 4,
    jacc_cutoff_milli: int = 700,
    max_group: int = 8_192,
):
    """Pairs with phash hamming <= ``max_hamming`` AND caption token-set
    Jaccard strictly below ``jacc_cutoff_milli`` (integer milli-units,
    ``(1000*|inter|) // |union|``).  EXACT for ``max_hamming < bands``
    (every qualifying pair shares a band).  Output columns:
    (id_a, id_b, hamming, jacc_milli)."""
    from .dedupe import _popcount64
    from .texthash import splitmix64

    if max_hamming >= bands:
        raise ValueError("exactness requires max_hamming < bands")
    width = 64 // bands

    def to_buckets(batch: pa.Table) -> pa.Table:
        ph = batch.column(phash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(batch)
        idx = np.tile(np.arange(n), bands)
        buckets = np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            seg = (ph >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            buckets[b * n : (b + 1) * n] = splitmix64(seg ^ np.uint64(b << 60))
        take = pa.array(idx)
        return pa.table(
            {
                id_col: batch.column(id_col).take(take),
                phash_col: batch.column(phash_col).take(take),
                caption_col: batch.column(caption_col).take(take),
                "bucket": pa.array(buckets, type=pa.uint64()),
            }
        )

    to_buckets.__name__ = "hardneg_band_buckets"

    def pairs(group: pa.Table) -> pa.Table:
        ids_all = group.column(id_col).to_numpy(zero_copy_only=False)
        t = group.schema.field(id_col).type
        empty = pa.table(
            {
                "id_a": pa.array([], type=t),
                "id_b": pa.array([], type=t),
                "hamming": pa.array([], type=pa.int64()),
                "jacc_milli": pa.array([], type=pa.int64()),
            }
        )
        uniq, first = np.unique(ids_all, return_index=True)
        if len(uniq) < 2 or len(uniq) > max_group:
            if len(uniq) > max_group:
                logger.warning(
                    "bucket of %d > max_group=%d: skipped (skew guard)",
                    len(uniq), max_group,
                )
            return empty
        ph = group.column(phash_col).to_numpy(zero_copy_only=False).astype(np.uint64)[first]
        iu, ju = np.triu_indices(len(uniq), k=1)
        ham = _popcount64(ph[iu] ^ ph[ju]).astype(np.int64)
        keep = ham <= max_hamming
        iu, ju, ham = iu[keep], ju[keep], ham[keep]
        if not len(iu):
            return empty
        # caption Jaccard only on the banding survivors (pair-scale)
        caps = group.column(caption_col).to_pylist()
        toks = [_token_set(caps[f]) for f in first]
        jacc = np.empty(len(iu), dtype=np.int64)
        for k in range(len(iu)):
            a, b = toks[iu[k]], toks[ju[k]]
            inter = len(a & b)
            union = len(a) + len(b) - inter
            jacc[k] = (1000 * inter) // union if union else 1000
        keep = jacc < jacc_cutoff_milli
        return pa.table(
            {
                "id_a": pa.array(uniq[iu[keep]], type=t),
                "id_b": pa.array(uniq[ju[keep]], type=t),
                "hamming": pa.array(ham[keep]),
                "jacc_milli": pa.array(jacc[keep]),
            }
        )

    pairs.__name__ = "hardneg_bucket_pairs"
    raw = (
        ds.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )

    # identical-band duplicates: one representative row per (id_a, id_b)
    # (hamming/jacc are pair-determined, so min == the value)
    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["id_a", "id_b", "hamming", "jacc_milli"])

    rename.__name__ = "hardneg_rename"
    return (
        raw.groupby(["id_a", "id_b"])
        .min(["hamming", "jacc_milli"])
        .map_batches(rename, batch_format="pyarrow")
    )
