"""Text secondary index: begins-with / ends-with / contains search.

Reference: TextIndexStrategy with FORWARD / REVERSE / NGRAM variants
(core/index/.../text/TextIndexStrategy.java:19, TextIndexType.java:11-13,
TextIndexUtils.java) — GeoWave materializes a secondary key/value table of
(processed term -> data id).  Ray-native shape: the index IS a keyed
parquet table of postings:

- FORWARD: (term = case-folded value) -> prefix scan answers begins-with
- REVERSE: (term = reversed value) -> prefix scan answers ends-with
- NGRAM: (term = each n-gram) -> equality scan answers contains

Build = flat_map postings + sorted write; query = vectorized prefix/equality
filter over the postings table (predicate pushdown when stored sorted) and
a semi-join back to ids.  Exact verification against the source column is
kept for NGRAM (n-gram hit is a candidate, like the reference's refinement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_text_index", "search_text_index"]


def build_text_index(
    ds,
    text_col: str,
    id_col: str,
    kinds: tuple = ("forward", "reverse", "ngram"),
    ngram_n: int = 3,
):
    """-> Dataset of postings (kind, term, id), pre-deduped per batch."""

    def postings(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        ids = batch.column(id_col).to_pylist()
        out_kind, out_term, out_id = [], [], []
        for txt, i in zip(texts, ids):
            if "forward" in kinds:
                out_kind.append("f")
                out_term.append(txt)
                out_id.append(i)
            if "reverse" in kinds:
                out_kind.append("r")
                out_term.append(txt[::-1])
                out_id.append(i)
            if "ngram" in kinds:
                grams = {txt[j : j + ngram_n] for j in range(max(len(txt) - ngram_n + 1, 0))}
                for g in grams:
                    out_kind.append("n")
                    out_term.append(g)
                    out_id.append(i)
        return pa.table(
            {
                "kind": pa.array(out_kind),
                "term": pa.array(out_term),
                id_col: pa.array(out_id, type=batch.schema.field(id_col).type),
            }
        )

    postings.__name__ = "text_postings"
    return ds.map_batches(postings, batch_format="pyarrow")


def search_text_index(
    index_ds,
    query: str,
    mode: str,
    id_col: str,
    source_ds=None,
    text_col: str | None = None,
    ngram_n: int = 3,
    broadcast_cap: int = 5_000_000,
):
    """mode in {'begins_with', 'ends_with', 'contains'} -> Dataset of ids.

    contains uses the NGRAM postings for candidates, then verifies against
    the source column (semi-join via broadcast candidate set) when
    ``source_ds`` is given — mirroring the reference's coarse+fine split.
    """
    q = query.lower()

    if mode == "begins_with":
        kind, term_pred = "f", lambda t: pc.starts_with(t, q)
    elif mode == "ends_with":
        kind, term_pred = "r", lambda t: pc.starts_with(t, q[::-1])
    elif mode == "contains":
        kind = "n"
        gram = q[:ngram_n] if len(q) >= ngram_n else q
        term_pred = lambda t: pc.starts_with(t, gram)
    else:
        raise ValueError(mode)

    def scan(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch.column("kind"), kind), term_pred(batch.column("term"))
        )
        return batch.filter(mask).select([id_col])

    scan.__name__ = "text_index_scan"
    candidates = index_ds.map_batches(scan, batch_format="pyarrow")

    from .dedupe import exact_dedupe

    candidates = exact_dedupe(candidates, key_col=id_col, id_col=id_col)

    if mode != "contains" or source_ds is None:
        return candidates

    # fine verification for contains (an n-gram hit is only a candidate).
    # The candidate-id set over a common trigram is corpus-scale, so the
    # driver pull is CAPPED (CLAUDE.md convention): <= broadcast_cap ->
    # one sorted-array broadcast + streaming membership filter; above it
    # -> streaming left_semi hash join, candidates never touch the driver.
    import ray

    from .util import broadcast_membership_filter, collect_table, safe_join

    cand = candidates.materialize()  # stays in the object store (spillable)
    n_cand = cand.count()  # metadata-only after materialize
    if n_cand == 0:
        src_schema = source_ds.schema()
        empty = pa.schema(
            [(id_col, dict(zip(src_schema.names, src_schema.types))[id_col])]
        ).empty_table()
        return ray.data.from_arrow(empty)

    def verify_text(batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch.column(text_col), pa.string())
        ok = pc.match_substring(pc.utf8_lower(texts), q)
        return batch.filter(pc.fill_null(ok, False)).select([id_col])

    verify_text.__name__ = "text_contains_verify"

    if n_cand <= broadcast_cap:
        ids = collect_table(cand).column(id_col).to_numpy(zero_copy_only=False)
        narrowed = broadcast_membership_filter(
            source_ds, ids, id_col, keep_members=True
        )
    else:
        # candidates non-empty implies the corpus has rows; cand is
        # already materialized so the empty-block strip is metadata-only
        # (Ray 2.49's join needs a non-empty FIRST block per side).
        # source_ds is expected to be a source read (non-empty first
        # block) — the public entry points pass read_parquet datasets.
        from .util import drop_empty_blocks

        narrowed = safe_join(
            source_ds, drop_empty_blocks(cand), "left_semi", 32,
            on=(id_col,), assume_nonempty=True,
        )
    return narrowed.map_batches(verify_text, batch_format="pyarrow")
