"""Text analysis stages: language ID, quality scoring, token counting,
document fingerprinting.

These are the training-data-pipeline operators layered on the engine (the
reference's closest analog is the TextIndexStrategy n-gram machinery,
core/index/.../text/TextIndexStrategy.java).  All counting/hashing runs
batch-vectorized over a single codepoint array per batch (stages/texthash
kernels — no per-row or per-character Python loops), and every output is
defined by integer/codepoint arithmetic a DuckDB oracle can mirror exactly.

Char classes are ASCII-exact (matching RE2 semantics so the SQL oracle
agrees): word = [A-Za-z0-9_], digit = [0-9], whitespace = [\\t\\n\\v\\f\\r ].
Codepoints > 127 count as word characters (not punctuation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .texthash import (
    TokenizedBatch,
    _codepoints,
    fingerprint_batch,
    hash_strings,
    tokenize_hash,
)

__all__ = [
    "TextFeatures",
    "RepetitionFeatures",
    "LangId",
    "Fingerprinter",
    "ngrams_of",
    "STOPWORDS",
]

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at", "by"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für", "von", "im"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "que", "pour", "dans", "avec", "sur", "pas", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por", "para", "con", "del", "en"},
}
_STOPWORDS = STOPWORDS  # back-compat alias


def _char_class_counts(texts: list[str]) -> dict[str, np.ndarray]:
    """Vectorized per-doc counts over the raw (unlowered) codepoint stream:
    punct ([^\\w\\s] ASCII), alpha runs, digit runs, other non-ws chars."""
    n = len(texts)
    cp, offsets = _codepoints(texts)
    m = len(cp)
    zeros = np.zeros(n, dtype=np.int64)
    if m == 0:
        return {"n_punct": zeros, "n_subtokens": zeros.copy()}
    ws = (cp == 32) | ((cp >= 9) & (cp <= 13))
    alpha = ((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122))
    digit = (cp >= 48) & (cp <= 57)
    word = alpha | digit | (cp == 95) | (cp > 127)
    punct = ~word & ~ws
    doc_id = np.repeat(np.arange(n), np.diff(offsets))
    n_punct = np.bincount(doc_id, weights=punct, minlength=n).astype(np.int64)

    def run_starts(mask: np.ndarray) -> np.ndarray:
        starts = mask.copy()
        starts[1:] &= ~mask[:-1]
        # doc boundaries restart runs
        ds = offsets[:-1]
        ds = ds[ds < m]
        starts[ds] = mask[ds]
        return starts

    # BPE-ish subtoken count: [A-Za-z]+ runs + [0-9]+ runs + each remaining
    # non-ws char (punctuation or >127) counted individually
    other = ~alpha & ~digit & ~ws
    sub = (
        np.bincount(doc_id, weights=run_starts(alpha), minlength=n)
        + np.bincount(doc_id, weights=run_starts(digit), minlength=n)
        + np.bincount(doc_id, weights=other, minlength=n)
    ).astype(np.int64)
    return {"n_punct": n_punct, "n_subtokens": sub}


class TextFeatures:
    """Adds token/char counts, ratios and a quality score.

    Integer columns (exact, SQL-oracle-able): n_tokens, n_subtokens,
    n_chars_calc, n_punct, n_stop, sum_token_len, quality_milli.
    Float columns (derived): avg_token_len, punct_ratio, stopword_ratio,
    quality_score.

    quality_milli = 20*min(n_tokens,20)
                  + (400*min(3*n_stop, max(n_tokens,1))) // max(n_tokens,1)
                  + (200*max(n_chars-4*n_punct, 0)) // max(n_chars,1)
    (the integer-exact form of the float heuristic: length band + stopword
    evidence - punctuation noise).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        words = sorted(set().union(*STOPWORDS.values()))
        self.stop_hashes = np.sort(hash_strings(words))
        assert len(np.unique(self.stop_hashes)) == len(words)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        n = len(texts)
        tb: TokenizedBatch = tokenize_hash(texts)
        n_tokens = tb.n_tokens
        n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        cc = _char_class_counts(texts)
        n_punct = cc["n_punct"]
        stop_hit = np.isin(tb.tok_hashes, self.stop_hashes)
        n_stop = np.zeros(n, dtype=np.int64)
        sum_tok = np.zeros(n, dtype=np.int64)
        ne = n_tokens > 0
        if ne.any():
            starts = tb.tok_offsets[:-1][ne]
            n_stop[ne] = np.add.reduceat(stop_hit.astype(np.int64), starts)
            sum_tok[ne] = np.add.reduceat(tb.tok_lens, starts)
        nt1 = np.maximum(n_tokens, 1)
        nc1 = np.maximum(n_chars, 1)
        punct_ratio = n_punct / nc1
        stop_ratio = n_stop / nt1
        avg_tok = sum_tok / nt1
        quality = (
            np.clip(n_tokens / 20.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 3, 0, 1) * 0.4
            + (1 - np.clip(punct_ratio * 4, 0, 1)) * 0.2
        )
        quality_milli = (
            20 * np.minimum(n_tokens, 20)
            + (400 * np.minimum(3 * n_stop, nt1)) // nt1
            + (200 * np.maximum(n_chars - 4 * n_punct, 0)) // nc1
        )
        out = batch
        for name, arr in [
            ("n_tokens", n_tokens),
            ("n_subtokens", cc["n_subtokens"]),
            ("n_chars_calc", n_chars),
            ("n_punct", n_punct),
            ("n_stop", n_stop),
            ("sum_token_len", sum_tok),
            ("quality_milli", quality_milli),
            ("avg_token_len", avg_tok),
            ("punct_ratio", punct_ratio),
            ("stopword_ratio", stop_ratio),
            ("quality_score", quality),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out


class RepetitionFeatures:
    """Gopher-style repetition quality rules (Rae et al. 2021, public):
    duplicate-line fraction and top-2-gram dominance, integer-exact in
    milli-units so the DuckDB oracle hash-matches (SQL mirror:
    pipelines/oracle_text.sql_repetition).

    Spec:
      lines            = text split on chr(10), EMPTY lines dropped
                         (whitespace-only lines kept)
      line hash        = tokhash poly spec over the RAW (unlowered) line
                         codepoints (seed SEED31, base 31, mod 2**64)
      dup_line_milli   = 1000*(n_lines - n_distinct_line_hashes)
                         // max(n_lines, 1)
      bigram hash      = k=2 shingle combine over lowered whitespace
                         tokens: splitmix64(th_i * SHINGLE_F + th_{i+1})
      top_bigram_milli = 1000*max_bigram_multiplicity // max(n_tokens-1, 1)
                         (0 for docs with < 2 tokens)

    Vectorized: one codepoint pass for line segmentation + poly hashing,
    lexsort run-length for per-doc distinct counts; no per-row loops.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .texthash import SEED31, SHINGLE_F, segment_poly_hash, splitmix64

        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        n = len(texts)
        cp, offsets = _codepoints(texts)
        m = len(cp)

        n_lines = np.zeros(n, dtype=np.int64)
        n_uniq = np.zeros(n, dtype=np.int64)
        if m:
            nl = cp == 10
            keep = ~nl  # chars belonging to (non-empty) lines
            starts_mask = keep.copy()
            starts_mask[1:] &= nl[:-1]
            ends_mask = keep.copy()
            ends_mask[:-1] &= nl[1:]
            doc_start = offsets[:-1]
            doc_start = doc_start[doc_start < m]
            starts_mask[doc_start] = keep[doc_start]
            doc_last = offsets[1:] - 1
            doc_last = doc_last[(doc_last >= 0) & (doc_last < m)]
            ends_mask[doc_last] = keep[doc_last]
            ls = np.flatnonzero(starts_mask)
            le = np.flatnonzero(ends_mask)
            if len(ls):
                lh = segment_poly_hash(cp, ls, le, 31, seed=int(SEED31))
                ld = np.searchsorted(offsets[1:], ls, side="right")
                n_lines = np.bincount(ld, minlength=n).astype(np.int64)
                order = np.lexsort((lh, ld))
                lds, lhs = ld[order], lh[order]
                first = np.ones(len(lds), dtype=bool)
                first[1:] = (lds[1:] != lds[:-1]) | (lhs[1:] != lhs[:-1])
                n_uniq = np.bincount(lds[first], minlength=n).astype(np.int64)
        dup_line_milli = (1000 * (n_lines - n_uniq)) // np.maximum(n_lines, 1)

        tb: TokenizedBatch = tokenize_hash(texts)
        th = tb.tok_hashes
        n_tok = tb.n_tokens
        top = np.zeros(n, dtype=np.int64)
        if len(th) >= 2:
            tok_doc = np.repeat(np.arange(n), n_tok)
            valid = tok_doc[:-1] == tok_doc[1:]
            bh = splitmix64(th[:-1] * SHINGLE_F + th[1:])[valid]
            bd = tok_doc[:-1][valid]
            if len(bh):
                order = np.lexsort((bh, bd))
                bds, bhs = bd[order], bh[order]
                first = np.ones(len(bds), dtype=bool)
                first[1:] = (bds[1:] != bds[:-1]) | (bhs[1:] != bhs[:-1])
                grp = np.cumsum(first) - 1
                cnts = np.bincount(grp)
                np.maximum.at(top, bds[first], cnts)
        top_bigram_milli = (1000 * top) // np.maximum(n_tok - 1, 1)

        out = batch
        for name, arr in [
            ("n_lines", n_lines),
            ("dup_line_milli", dup_line_milli),
            ("top_bigram_milli", top_bigram_milli),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out


class LangId:
    """Stopword-vote language ID over {en, de, fr, es}, 'und' (undetermined)
    when no stopwords hit; ties keep the earlier language in (en, de, fr,
    es) order.  A deterministic heuristic — not a trained model (none
    available here).  Vectorized: token-hash membership + per-doc reduceat."""

    LANGS = ("en", "de", "fr", "es")

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.tables = [
            np.sort(hash_strings(sorted(STOPWORDS[lang]))) for lang in self.LANGS
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        n = len(texts)
        tb = tokenize_hash(texts)
        hits = np.zeros((len(self.LANGS), n), dtype=np.int64)
        ne = tb.n_tokens > 0
        if ne.any():
            starts = tb.tok_offsets[:-1][ne]
            for li, table in enumerate(self.tables):
                hit = np.isin(tb.tok_hashes, table).astype(np.int64)
                hits[li, ne] = np.add.reduceat(hit, starts)
        best = np.argmax(hits, axis=0)  # first max wins == loop order
        preds = np.array(self.LANGS, dtype=object)[best]
        preds[hits.max(axis=0) == 0] = "und"
        return batch.append_column(self.out_col, pa.array(preds.tolist()))


class Fingerprinter:
    """Rolling-hash document fingerprint (winnowing-lite; spec in
    stages/texthash): base-257 codepoint windows of ``window`` chars,
    fingerprint = XOR-fold of the 8 smallest window hashes * GOLD."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint", window: int = 16):
        self.text_col = text_col
        self.out_col = out_col
        self.window = window

    def of(self, text: str) -> int:
        return int(fingerprint_batch([text or ""], self.window)[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = fingerprint_batch(
            [t or "" for t in batch.column(self.text_col).to_pylist()], self.window
        )
        return batch.append_column(self.out_col, pa.array(fps, type=pa.uint64()))


def ngrams_of(text: str, n: int = 3) -> set:
    """Character n-grams (TextIndexStrategy NGRAM analog, case-folded)."""
    t = (text or "").lower()
    return {t[i : i + n] for i in range(max(len(t) - n + 1, 0))}


class _PackGroup:
    """Greedy stream packing within one bucket: docs ordered by id, each
    assigned to the pack containing its FIRST token (pack boundaries at
    multiples of ``budget`` tokens; long docs may straddle — the standard
    streaming sequence-packing contract, replayable as a SQL window
    cumsum)."""

    __name__ = "pack_group"

    def __init__(self, id_col: str, tokens_col: str, budget: int):
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.budget = budget

    def __call__(self, group):
        import pyarrow as pa

        ids = group.column(self.id_col).to_numpy(zero_copy_only=False)
        toks = group.column(self.tokens_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, toks = ids[order], toks[order].astype(np.int64)
        start = np.cumsum(toks) - toks  # first-token offset per doc
        pack = start // self.budget
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "bucket": group.column("bucket").take(pa.array(order)),
                "pack_id": pa.array(pack, type=pa.int64()),
            }
        )


def pack_sequences(ds, id_col="doc_id", tokens_col="n_tokens", budget=2048, n_buckets=32):
    """Sequence packing for training-data assembly: hash-bucket the corpus
    (constant group count at any scale), then greedy stream packing per
    bucket.  One shuffle; everything per-group is a cumsum.  Returns
    (id, bucket, pack_id) rows."""
    import pyarrow as pa

    def bucket(batch):
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((ids % n_buckets).astype(np.int64))
        )

    bucket.__name__ = "pack_bucket"
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_PackGroup(id_col, tokens_col, budget), batch_format="pyarrow")
    )


def tfidf_top_terms(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    scale: int = 1_000_000,
    vocab_cap: int = 2_000_000,
    num_partitions: int = 16,
):
    """Per-doc top-``k`` terms by integer tf-idf score
    ``(tf * scale) // df`` (keyword extraction for training-data
    curation; ties broken by term ascending — fully deterministic, the
    DuckDB oracle replays the exact integer arithmetic).

    Tokens: ``lower(text)`` split on ``[^a-z0-9]+`` (RE2 and DuckDB
    regexp_split agree), empties dropped.  Term frequencies are complete
    per batch (a doc's text lives in ONE row), so tf needs NO shuffle.

    Scale shape (100 TB): df is one pre-aggregated vocabulary groupby
    (terms, not documents); under ``vocab_cap`` the df table broadcasts
    via ray.put and scoring + top-k stay per-batch (a doc's tf rows are
    batch-local, so top-k needs no shuffle either — the whole pipeline
    is ONE vocabulary-sized shuffle).  Above the cap, df joins back on
    term (safe_join) and top-k becomes a per-doc groupby (the
    capped-broadcast-with-distributed-fallback convention)."""
    import pyarrow.compute as pc
    import ray

    from .util import collect_table, safe_join

    def explode_tf(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), "[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(
            batch.column(id_col).to_numpy(zero_copy_only=False),
            np.nan_to_num(lens).astype(np.int64),
        )
        t = pa.table({id_col: pa.array(doc_ids), "term": flat})
        t = t.filter(pc.not_equal(pc.coalesce(t.column("term"), ""), ""))
        # tf is complete within the batch: one text row per doc
        return pa.TableGroupBy(t, [id_col, "term"]).aggregate([([], "count_all")])

    explode_tf.__name__ = "tfidf_explode_tf"
    tf = ds.map_batches(explode_tf, batch_format="pyarrow")

    def pre_df(batch: pa.Table) -> pa.Table:
        return batch.select(["term"])

    pre_df.__name__ = "tfidf_terms_only"
    df_ds = tf.map_batches(pre_df, batch_format="pyarrow").groupby("term").count()

    def topk_local(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score": pa.array([], pa.int64()),
                }
            )
        docs = tbl.column(id_col).to_numpy(zero_copy_only=False)
        terms = tbl.column("term").to_numpy(zero_copy_only=False)
        score = tbl.column("score").to_numpy(zero_copy_only=False)
        _, codes = np.unique(docs, return_inverse=True)
        sel = np.lexsort((terms, -score, codes))
        codes_s = codes[sel]
        new_doc = np.empty(len(sel), dtype=bool)
        new_doc[0] = True
        new_doc[1:] = codes_s[1:] != codes_s[:-1]
        first = np.maximum.accumulate(np.where(new_doc, np.arange(len(sel)), 0))
        keep = np.sort(sel[(np.arange(len(sel)) - first) < k])
        return pa.table(
            {
                id_col: pa.array(docs[keep]),
                "term": pa.array(terms[keep], pa.string()),
                "score": pa.array(score[keep]),
            }
        )

    df_small = df_ds.materialize()
    if df_small.count() <= vocab_cap:
        vt = collect_table(df_small)
        import pandas as pd

        vocab = pd.DataFrame(
            {
                "term": vt.column("term").to_numpy(zero_copy_only=False),
                "df": vt.column("count()").to_numpy(zero_copy_only=False),
            }
        )
        vocab_ref = ray.put(vocab)

        def score_topk(batch: pa.Table) -> pa.Table:
            import pandas as pd  # noqa: F401

            v = ray.get(vocab_ref)
            b = batch.to_pandas().merge(v, on="term", how="inner")
            scored = pa.table(
                {
                    id_col: pa.array(b[id_col].to_numpy()),
                    "term": pa.array(b["term"].to_numpy(), pa.string()),
                    "score": pa.array(
                        (b["count_all"].to_numpy().astype(np.int64) * scale)
                        // b["df"].to_numpy().astype(np.int64)
                    ),
                }
            )
            return topk_local(scored)

        score_topk.__name__ = "tfidf_score_topk"
        return tf.map_batches(score_topk, batch_format="pyarrow")

    # >cap: shuffle join on term, then per-doc exact top-k groupby
    joined = safe_join(tf, df_small, "inner", num_partitions, on=("term",))

    def to_score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = batch.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "term": batch.column("term"),
                "score": pa.array((tfv * scale) // dfv),
            }
        )

    to_score.__name__ = "tfidf_score"

    class _TopK:
        __name__ = "tfidf_topk_group"

        def __call__(self, group: pa.Table) -> pa.Table:
            return topk_local(group)

    return (
        joined.map_batches(to_score, batch_format="pyarrow")
        .groupby(id_col)
        .map_groups(_TopK(), batch_format="pyarrow")
    )


def dsir_importance(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
):
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) with hashed-unigram features, integer-exact so the
    DuckDB oracle hard-verifies it.

    Two streaming passes:

    1. bucket-count pass — per batch, bincount token buckets
       ``splitmix64(tokhash(token)) % n_buckets`` for the raw corpus and
       for the target slice (``target_col == target_value``); partials are
       two length-``n_buckets`` int64 vectors per block, reduced on the
       driver (bounded: n_blocks x 16 KB — the hll_distinct_users
       convention) into the weight table
       ``w_b = (scale * (t_b + 1)) // (r_b + 1)`` (Laplace-smoothed
       integer log-free ratio).
    2. scoring pass — broadcast ``w`` via ray.put; each doc's score is the
       sum of ``w[bucket]`` over its token INSTANCES (vectorized
       ``np.add.at``); zero-token docs score 0.

    100 TB shape: the sufficient statistic is O(n_buckets) regardless of
    corpus size, so no shuffle at all — two map-only passes.
    """
    import ray

    from .texthash import splitmix64, tokenize_hash

    def _buckets(tb) -> tuple[np.ndarray, np.ndarray]:
        b = (splitmix64(tb.tok_hashes) % np.uint64(n_buckets)).astype(np.int64)
        doc_of = np.repeat(np.arange(tb.n_docs), np.diff(tb.tok_offsets))
        return b, doc_of

    def partial(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        tb = tokenize_hash(texts)
        b, doc_of = _buckets(tb)
        raw = np.bincount(b, minlength=n_buckets).astype(np.int64)
        is_t = pa.compute.equal(
            batch.column(target_col), pa.scalar(target_value)
        ).to_numpy(zero_copy_only=False)
        tgt = np.bincount(b[is_t[doc_of]], minlength=n_buckets).astype(np.int64)
        return pa.table(
            {
                "raw": pa.array([raw], type=pa.large_list(pa.int64())),
                "tgt": pa.array([tgt], type=pa.large_list(pa.int64())),
            }
        )

    partial.__name__ = "dsir_bucket_counts"
    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for r in parts:
        raw += np.asarray(r["raw"], dtype=np.int64)
        tgt += np.asarray(r["tgt"], dtype=np.int64)
    w_ref = ray.put((scale * (tgt + 1)) // (raw + 1))

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        tb = tokenize_hash(texts)
        b, doc_of = _buckets(tb)
        sc = np.zeros(len(texts), dtype=np.int64)
        np.add.at(sc, doc_of, w[b])
        return pa.table({id_col: batch.column(id_col), "dsir_score": pa.array(sc)})

    score.__name__ = "dsir_score"
    return ds.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------- boilerplate
def chunk_hash_arrays(tb: TokenizedBatch, chunk_len: int):
    """Fixed-width token-chunk hashes for a tokenized batch: the doc text
    is cut into consecutive ``chunk_len``-token chunks (last chunk may be
    shorter); chunk hash = splitmix64 of the base-SHINGLE_F Horner fold
    (acc0=0) over the chunk's token hashes.  Returns
    ``(doc_of_chunk, chunk_idx, hashes)`` — all chunks of all docs in
    doc-major order, fully vectorized (segment_poly_hash prefix trick)."""
    from .texthash import SHINGLE_F, segment_poly_hash, splitmix64

    L = int(chunk_len)
    n_tok = tb.n_tokens
    n_chunks = -(-n_tok // L)
    total = int(n_chunks.sum())
    doc_of = np.repeat(np.arange(tb.n_docs, dtype=np.int64), n_chunks)
    if total == 0:
        return doc_of, np.zeros(0, np.int64), np.zeros(0, np.uint64)
    ci = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_chunks) - n_chunks, n_chunks
    )
    o = tb.tok_offsets[:-1][doc_of]
    starts = o + ci * L
    ends = np.minimum(starts + L, tb.tok_offsets[1:][doc_of]) - 1
    h = splitmix64(segment_poly_hash(tb.tok_hashes, starts, ends, int(SHINGLE_F)))
    return doc_of, ci, h


class ChunkCounter:
    """Pass-1 combiner for boilerplate detection: per-batch partial
    (chunk_hash, c) counts, pre-aggregated with np.unique so the global
    frequency groupby shuffles only distinct-hash rows per batch."""

    def __init__(self, text_col: str = "text", chunk_len: int = 3):
        self.text_col = text_col
        self.L = int(chunk_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tb = tokenize_hash([t or "" for t in batch.column(self.text_col).to_pylist()])
        _, _, h = chunk_hash_arrays(tb, self.L)
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {"chunk_hash": pa.array(uh.view(np.int64)), "c": pa.array(cnt.astype(np.int64))}
        )


class BoilerplateScorer:
    """Pass-2 broadcast scorer: marks each doc's chunks against the
    ray.put boilerplate hash set and emits per-doc
    (id, n_chunks, n_boiler, kept_fold) where kept_fold is the
    order-sensitive base-SHINGLE_F Horner fold over the KEPT (non-
    boilerplate) chunk hashes — a checksum of the cleaned document."""

    def __init__(self, boiler_ref, text_col: str = "text", id_col: str = "doc_id",
                 chunk_len: int = 3):
        import ray

        self.boiler = np.sort(np.asarray(ray.get(boiler_ref), dtype=np.int64))
        self.text_col = text_col
        self.id_col = id_col
        self.L = int(chunk_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .texthash import SHINGLE_F, segment_poly_hash

        tb = tokenize_hash([t or "" for t in batch.column(self.text_col).to_pylist()])
        doc_of, _, h = chunk_hash_arrays(tb, self.L)
        hi = h.view(np.int64)
        n = tb.n_docs
        if len(self.boiler):
            pos = np.clip(np.searchsorted(self.boiler, hi), 0, len(self.boiler) - 1)
            is_b = self.boiler[pos] == hi
        else:
            is_b = np.zeros(len(hi), dtype=bool)
        n_chunks = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_boiler = np.bincount(doc_of, weights=is_b, minlength=n).astype(np.int64)
        kept = ~is_b
        kh, kd = h[kept], doc_of[kept]  # doc-major order preserved
        cnts = np.bincount(kd, minlength=n)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(cnts, out=offs[1:])
        fold = np.zeros(n, dtype=np.uint64)
        ne = offs[1:] > offs[:-1]
        if ne.any():
            fold[ne] = segment_poly_hash(
                kh, offs[:-1][ne], offs[1:][ne] - 1, int(SHINGLE_F)
            )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_chunks": pa.array(n_chunks),
                "n_boiler": pa.array(n_boiler),
                "kept_fold": pa.array(fold.view(np.int64)),
            }
        )


class ChunkRows:
    """Fallback explode stage: one (id, ci, chunk_hash) row per chunk,
    plus a ci=-1 marker row per doc so tokenless docs survive the
    groupby (the marker carries chunk_hash=0 and is skipped by the
    fold)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 chunk_len: int = 3):
        self.text_col = text_col
        self.id_col = id_col
        self.L = int(chunk_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tb = tokenize_hash([t or "" for t in batch.column(self.text_col).to_pylist()])
        doc_of, ci, h = chunk_hash_arrays(tb, self.L)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        out_ids = np.concatenate([ids[doc_of], ids])
        out_ci = np.concatenate([ci, np.full(n, -1, np.int64)])
        out_h = np.concatenate([h.view(np.int64), np.zeros(n, np.int64)])
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                "ci": pa.array(out_ci),
                "chunk_hash": pa.array(out_h),
            }
        )


class _BoilerFold:
    """Per-doc group finalizer for the fallback path: ordered fold over
    kept chunks (``_b`` null = kept).  Bounded by one doc's chunk count."""

    __name__ = "boilerplate_fold"

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .texthash import SHINGLE_F, segment_poly_hash

        ci = group.column("ci").to_numpy(zero_copy_only=False)
        h = group.column("chunk_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        b = pc.fill_null(group.column("_b"), 0).to_numpy(zero_copy_only=False)
        order = np.argsort(ci, kind="stable")
        real = ci[order] >= 0
        hs = h[order][real]
        bs = b[order][real] != 0
        kept = hs[~bs]
        if len(kept):
            fold = int(segment_poly_hash(kept, np.array([0]), np.array([len(kept) - 1]),
                                         int(SHINGLE_F))[0])
        else:
            fold = 0
        return pa.table(
            {
                self.id_col: group.column(self.id_col).slice(0, 1),
                "n_chunks": pa.array([int(real.sum())], pa.int64()),
                "n_boiler": pa.array([int(bs.sum())], pa.int64()),
                "kept_fold": pa.array(
                    np.array([fold], dtype=np.uint64).view(np.int64)
                ),
            }
        )


def boilerplate_filter(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_len: int = 3,
    min_count: int = 3,
    broadcast_cap: int = 2_000_000,
    num_partitions: int = 16,
):
    """CCNet-style global boilerplate-chunk removal (Wenzek et al. 2020's
    corpus-level line dedup, adapted to ``chunk_len``-token chunks since
    the bench corpus is single-line): two passes over the corpus —

    1. global chunk-frequency count (per-batch np.unique combiner, ONE
       groupby over distinct-hash partials);
    2. mark chunks whose global count >= ``min_count`` as boilerplate and
       emit per-doc (n_chunks, n_boiler, kept_fold).

    Scale shape (100 TB): the boilerplate set is tiny next to the corpus
    (only chunks repeated >= min_count times), so under ``broadcast_cap``
    it broadcasts (ray.put + per-batch searchsorted) and pass 2 streams
    with NO shuffle; above the cap the fallback explodes chunks to rows
    and marks them with a sentinel-mode safe_join (fully streaming)
    followed by one per-doc groupby.  A chunk hash colliding with the
    two reserved sentinel ints (2 of 2**64 values) would self-filter;
    the broadcast path has no such caveat."""
    import pyarrow.compute as pc
    import ray

    from .util import collect_table, safe_join, stage_fn

    counts = ds.map_batches(
        stage_fn(ChunkCounter, text_col=text_col, chunk_len=chunk_len),
        batch_format="pyarrow",
    )
    freq = counts.groupby("chunk_hash").sum("c")

    def boiler_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("sum(c)"), min_count)
        return batch.filter(keep).select(["chunk_hash"])

    boiler_only.__name__ = "boiler_only"
    boiler = freq.map_batches(boiler_only, batch_format="pyarrow").materialize()
    if boiler.count() <= broadcast_cap:
        tbl = collect_table(boiler)
        arr = (
            tbl.column("chunk_hash").to_numpy(zero_copy_only=False)
            if tbl is not None
            else np.zeros(0, dtype=np.int64)
        )
        ref = ray.put(arr)
        return ds.map_batches(
            stage_fn(
                BoilerplateScorer,
                boiler_ref=ref,
                text_col=text_col,
                id_col=id_col,
                chunk_len=chunk_len,
            ),
            batch_format="pyarrow",
        )
    # > cap: streaming sentinel-mode left join marks boilerplate chunks,
    # then ONE per-doc groupby folds the kept sequence.
    rows = ds.map_batches(
        stage_fn(ChunkRows, text_col=text_col, id_col=id_col, chunk_len=chunk_len),
        batch_format="pyarrow",
    )

    def flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "chunk_hash": batch.column("chunk_hash"),
                "_b": pa.array(np.ones(len(batch), np.int64)),
            }
        )

    flag.__name__ = "boiler_flag"
    marked = safe_join(
        rows,
        boiler.map_batches(flag, batch_format="pyarrow"),
        "left_outer",
        num_partitions,
        on=("chunk_hash",),
        sentinel=-(1 << 62),
        left_schema=pa.schema(
            [(id_col, pa.int64()), ("ci", pa.int64()), ("chunk_hash", pa.int64())]
        ),
        right_schema=pa.schema([("chunk_hash", pa.int64()), ("_b", pa.int64())]),
    )
    return marked.groupby(id_col).map_groups(
        _BoilerFold(id_col=id_col), batch_format="pyarrow"
    )


# --------------------------------------------------------------------- PII
# Training-data PII scrubbing (no direct GeoWave analog — this is part of
# the LLM-pipeline operator family layered on the engine, like langid /
# quality scoring above).  Patterns are RE2 syntax so pyarrow's compute
# kernels and DuckDB's regexp_* (both RE2) agree byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


class PiiRedactor:
    """Vectorized PII redaction over a text column.

    Per batch: ONE ``count_substring_regex`` pass per pattern over the
    original text (match counts are defined against the input, so they are
    order-independent), then sequential ``replace_substring_regex`` passes
    (email -> phone -> ip; the replacement tokens contain no digits or
    '@', so earlier replacements cannot create or destroy later matches).
    All kernels are Arrow-native — no Python row loops; the compiled RE2
    programs live inside Arrow's kernel cache, and the stage instance is
    cached per worker via stages/util.stage_fn.

    Output: input columns minus ``text_col``, plus ``n_<name>`` int64
    match counts and ``out_col`` (the redacted text).
    """

    def __init__(self, text_col: str = "text", out_col: str = "text_red"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(self.text_col)
        cols: dict[str, pa.Array] = {
            n: batch.column(n) for n in batch.column_names if n != self.text_col
        }
        red = arr
        for name, pat, tok in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(arr, pattern=pat), pa.int64()
            )
            red = pc.replace_substring_regex(red, pattern=pat, replacement=tok)
        cols[self.out_col] = red
        return pa.table(cols)


class TokenChunker:
    """Overlapping token-window document chunking (the context-window prep
    step of a training pipeline: long documents become ``window``-token
    chunks advancing by ``stride`` tokens, so consecutive chunks overlap by
    ``window - stride`` tokens).

    Fully vectorized: one tokenize_hash pass per batch, chunk boundaries
    from arithmetic over the flat token array, and each chunk's content
    checksum from a single uint64 prefix-sum (mod-2**64 wraparound IS the
    spec, so the DuckDB oracle replays it exactly), finalized with
    splitmix64.  One output row per chunk:
    (id_col, chunk_idx, n_tok, chunk_hash); docs with zero tokens emit no
    chunks.  Scale shape: chunking is embarrassingly batch-local — no
    shuffle, output ~len/stride rows per doc.
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        window: int = 40,
        stride: int = 30,
    ):
        if not (0 < stride <= window):
            raise ValueError("require 0 < stride <= window")
        self.text_col = text_col
        self.id_col = id_col
        self.window = window
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .texthash import splitmix64

        texts = batch.column(self.text_col).to_pylist()
        tb = tokenize_hash(texts)
        n_tok = tb.n_tokens
        n_chunks = -(-n_tok // self.stride)  # ceil; 0-token docs -> 0 chunks
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(tb.n_docs, dtype=np.int64), n_chunks)
        chunk_base = np.zeros(tb.n_docs + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=chunk_base[1:])
        chunk_idx = np.arange(total, dtype=np.int64) - chunk_base[doc_idx]
        starts = tb.tok_offsets[doc_idx] + chunk_idx * self.stride
        ends = np.minimum(starts + self.window, tb.tok_offsets[doc_idx + 1])
        csum = np.zeros(len(tb.tok_hashes) + 1, dtype=np.uint64)
        np.cumsum(tb.tok_hashes, out=csum[1:])  # wraps mod 2**64 by design
        chash = splitmix64(csum[ends] - csum[starts]).astype(np.int64)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(chunk_idx),
                "n_tok": pa.array(ends - starts),
                "chunk_hash": pa.array(chash),
            }
        )


def lm_score(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    n_big_buckets: int = 16384,
    scale: int = 1_000_000,
):
    """CCNet-style hashed-bigram language-model quality score (Wenzek et
    al. 2020 score docs with an LM; here the LM is a hashed bigram model
    fit on the corpus itself, integer-exact so the DuckDB oracle
    hard-verifies it).

    Buckets: unigram ``bu = splitmix64(tokhash(w)) % n_buckets``; bigram
    ``bb = splitmix64((tokhash(w1)*SHINGLE_F + tokhash(w2)) mod 2**64) %
    n_big_buckets`` (the k=2 shingle combine).  Two streaming passes:

    1. count pass — per batch, bincount unigram and bigram buckets; the
       partials are two bounded int64 vectors per block, driver-reduced
       (the dsir/hll bounded-partial convention: sufficient statistic is
       O(n_buckets), independent of corpus size).
    2. score pass — broadcast both count vectors; per doc,
       ``lm_score = sum over bigram instances of
       (scale * c_bigram[bb]) // c_unigram[bu(w1)]`` (an integer
       conditional-probability proxy; larger = more predictable text)
       plus ``n_bigrams``.  Docs with < 2 tokens score 0.

    100 TB shape: no shuffle at all — two map-only passes.  Per-term
    values are bounded by scale * corpus_bigram_count; int64-safe for any
    corpus under ~9e12 bigrams at the default scale."""
    import ray

    from .texthash import SHINGLE_F, splitmix64, tokenize_hash

    def _buckets(tb):
        th = tb.tok_hashes
        doc_of = np.repeat(np.arange(tb.n_docs), np.diff(tb.tok_offsets))
        bu = (splitmix64(th) % np.uint64(n_buckets)).astype(np.int64)
        if len(th) >= 2:
            valid = doc_of[:-1] == doc_of[1:]
            acc = th[:-1] * SHINGLE_F + th[1:]  # uint64 wrap by design
            bb = (splitmix64(acc[valid]) % np.uint64(n_big_buckets)).astype(np.int64)
            bu_prev = bu[:-1][valid]
            big_doc = doc_of[:-1][valid]
        else:
            bb = np.zeros(0, np.int64)
            bu_prev = bb
            big_doc = bb
        return bu, bb, bu_prev, big_doc

    def partial(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        bu, bb, _, _ = _buckets(tokenize_hash(texts))
        return pa.table(
            {
                "cu": pa.array(
                    [np.bincount(bu, minlength=n_buckets).astype(np.int64)],
                    type=pa.large_list(pa.int64()),
                ),
                "cb": pa.array(
                    [np.bincount(bb, minlength=n_big_buckets).astype(np.int64)],
                    type=pa.large_list(pa.int64()),
                ),
            }
        )

    partial.__name__ = "lm_bucket_counts"
    cu = np.zeros(n_buckets, dtype=np.int64)
    cb = np.zeros(n_big_buckets, dtype=np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        cu += np.asarray(r["cu"], dtype=np.int64)
        cb += np.asarray(r["cb"], dtype=np.int64)
    counts_ref = ray.put((cu, cb))

    def score(batch: pa.Table) -> pa.Table:
        cu_, cb_ = ray.get(counts_ref)
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        tb = tokenize_hash(texts)
        _, bb, bu_prev, big_doc = _buckets(tb)
        terms = (scale * cb_[bb]) // cu_[bu_prev]
        sc = np.zeros(len(texts), dtype=np.int64)
        np.add.at(sc, big_doc, terms)
        nb = np.zeros(len(texts), dtype=np.int64)
        np.add.at(nb, big_doc, 1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bigrams": pa.array(nb),
                "lm_score": pa.array(sc),
            }
        )

    score.__name__ = "lm_score"
    return ds.map_batches(score, batch_format="pyarrow")


def collocations(
    ds,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    scale: int = 1_000_000,
    vocab_cap: int = 2_000_000,
    num_partitions: int = 16,
):
    """Corpus-level bigram collocation mining: adjacent token pairs ranked
    by the integer PMI surrogate ``score = (n_ab * n_tokens * scale) //
    (n_a * n_b)`` (the Church & Hanks 1990 association-ratio ranking,
    integerized so the DuckDB oracle replays the arithmetic exactly) —
    the phrase-discovery / tokenizer-vocab-induction step of a
    training-data pipeline.  Ties broken by (tok_a, tok_b) ascending.

    Tokens: ``lower(text)`` split on ``[^a-z0-9]+`` (RE2 == DuckDB
    regexp_split), empties dropped; bigrams are within-doc adjacent pairs.

    Scale shape (100 TB):
    - bigram and unigram counts are pre-aggregated per batch (Arrow
      group_by combiner), so the only shuffles are vocabulary-sized, not
      corpus-sized (two map passes over the text; fusable into one tagged
      pass if the extra read matters).
    - under ``vocab_cap`` the unigram table broadcasts via ray.put and
      scoring + the min_count filter stay per-batch; above the cap the
      unigram counts join back on the token (safe_join) — the
      capped-broadcast-with-distributed-fallback convention.
    - the final sort+limit runs over the min_count-filtered candidate
      table (bounded by the qualifying pair vocabulary, not the corpus).
    - int64 bound: ``max(n_ab) * n_tokens * scale`` must stay < 2**63;
      at larger corpora lower ``scale`` (the ranking is scale-invariant
      down to integer-floor granularity).
    """
    import pyarrow.compute as pc
    import ray

    from .util import collect_table, safe_join

    def _flat_tokens(batch: pa.Table):
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), "[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(
            np.arange(len(batch), dtype=np.int64),
            np.nan_to_num(lens).astype(np.int64),
        )
        keep = flat != ""
        return flat[keep], doc_of[keep]

    def bigram_partial(batch: pa.Table) -> pa.Table:
        toksf, docf = _flat_tokens(batch)
        if len(toksf) < 2:
            return pa.table(
                {
                    "tok_a": pa.array([], pa.string()),
                    "tok_b": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        adj = docf[1:] == docf[:-1]
        t = pa.table(
            {
                "tok_a": pa.array(toksf[:-1][adj], pa.string()),
                "tok_b": pa.array(toksf[1:][adj], pa.string()),
            }
        )
        t = pa.TableGroupBy(t, ["tok_a", "tok_b"]).aggregate([([], "count_all")])
        return t.rename_columns(["tok_a", "tok_b", "cnt"])

    bigram_partial.__name__ = "colloc_bigram_partial"

    def unigram_partial(batch: pa.Table) -> pa.Table:
        toksf, _ = _flat_tokens(batch)
        t = pa.table({"tok": pa.array(toksf, pa.string())})
        t = pa.TableGroupBy(t, ["tok"]).aggregate([([], "count_all")])
        return t.rename_columns(["tok", "cnt"])

    unigram_partial.__name__ = "colloc_unigram_partial"

    big = (
        ds.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"])
        .sum("cnt")
    )
    uni = (
        ds.map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("cnt")
    ).materialize()

    out_schema = pa.schema(
        [
            ("tok_a", pa.string()),
            ("tok_b", pa.string()),
            ("n_ab", pa.int64()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("score", pa.int64()),
        ]
    )

    if uni.count() <= vocab_cap:
        vt = collect_table(uni)
        toks = vt.column("tok").to_numpy(zero_copy_only=False)
        cnts = vt.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        n_total = int(cnts.sum())
        order = np.argsort(toks)
        vocab_ref = ray.put((toks[order], cnts[order]))

        def score_batch(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return out_schema.empty_table()
            vtoks, vcnts = ray.get(vocab_ref)
            n_ab = batch.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            m = n_ab >= min_count
            if not m.any():
                return out_schema.empty_table()
            a = batch.column("tok_a").to_numpy(zero_copy_only=False)[m]
            b = batch.column("tok_b").to_numpy(zero_copy_only=False)[m]
            n_ab = n_ab[m]
            n_a = vcnts[np.searchsorted(vtoks, a)]
            n_b = vcnts[np.searchsorted(vtoks, b)]
            num = n_ab * n_total
            assert num.max() <= (2**63 - 1) // scale, "collocations: lower scale"
            score = (num * scale) // (n_a * n_b)
            return pa.table(
                {
                    "tok_a": pa.array(a, pa.string()),
                    "tok_b": pa.array(b, pa.string()),
                    "n_ab": pa.array(n_ab),
                    "n_a": pa.array(n_a),
                    "n_b": pa.array(n_b),
                    "score": pa.array(score),
                }
            )

        score_batch.__name__ = "colloc_score"
        scored = big.map_batches(score_batch, batch_format="pyarrow")
    else:
        # >cap: two vocabulary joins on the token (capped-broadcast fallback)
        n_total = int(uni.sum("sum(cnt)"))
        ua = uni.rename_columns({"tok": "tok_a", "sum(cnt)": "n_a"})
        ub = uni.rename_columns({"tok": "tok_b", "sum(cnt)": "n_b"})
        j = safe_join(big, ua, "inner", num_partitions, on=("tok_a",))
        j = safe_join(j, ub, "inner", num_partitions, on=("tok_b",))

        def score_joined(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return out_schema.empty_table()
            n_ab = batch.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            m = n_ab >= min_count
            if not m.any():
                return out_schema.empty_table()
            n_ab = n_ab[m]
            n_a = batch.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)[m]
            n_b = batch.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)[m]
            num = n_ab * n_total
            assert num.max() <= (2**63 - 1) // scale, "collocations: lower scale"
            return pa.table(
                {
                    "tok_a": batch.column("tok_a").filter(pa.array(m)),
                    "tok_b": batch.column("tok_b").filter(pa.array(m)),
                    "n_ab": pa.array(n_ab),
                    "n_a": pa.array(n_a),
                    "n_b": pa.array(n_b),
                    "score": pa.array((num * scale) // (n_a * n_b)),
                }
            )

        score_joined.__name__ = "colloc_score_joined"
        scored = j.map_batches(score_joined, batch_format="pyarrow")

    return scored.sort(
        ["score", "tok_a", "tok_b"], descending=[True, False, False]
    ).limit(top_k)


# regex shared by the corpus token stages below; DuckDB's regexp_split
# (also RE2) with the same pattern produces identical tokens
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _explode_tokens(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(id, tok) rows: lower(text) split on TOKEN_SPLIT_RE, empties out."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_col)), TOKEN_SPLIT_RE
    )
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False),
        np.nan_to_num(lens).astype(np.int64),
    )
    t = pa.table({id_col: pa.array(ids), "tok": flat})
    return t.filter(pc.not_equal(pc.coalesce(t.column("tok"), ""), ""))


def vocab_oov(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
):
    """Two-pass vocabulary coverage: build the corpus top-``vocab_size``
    token vocabulary (count DESC, token ASC — a deterministic cut), then
    score every document's out-of-vocabulary token count against it —
    the tokenizer-coverage / vocab-pruning QA step of a training-data
    pipeline (docs whose OOV rate spikes are mis-languaged or garbage).

    Scale shape (100 TB): pass 1 pre-aggregates counts INSIDE each batch
    (vocabulary-sized shuffle, not corpus-sized), takes top-N via a
    distributed sort+limit, and collects exactly ``vocab_size`` rows —
    a bounded driver pull by construction (the capped-broadcast
    convention; the cap IS the operator parameter).  Pass 2 streams:
    per-batch np.isin against the broadcast sorted vocabulary, no
    shuffle.  Docs with zero tokens are skipped (no denominator).
    """
    import pyarrow.compute as pc
    import ray

    from .util import collect_table

    def batch_counts(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, text_col, id_col)
        g = pa.TableGroupBy(t.select(["tok"]), ["tok"]).aggregate([([], "count_all")])
        return g.rename_columns(["tok", "cnt"])

    batch_counts.__name__ = "vocab_batch_counts"
    counts = (
        ds.map_batches(batch_counts, batch_format="pyarrow")
        .groupby("tok")
        .sum("cnt")
    )
    top = counts.sort(
        ["sum(cnt)", "tok"], descending=[True, False]
    ).limit(vocab_size)
    vocab_tbl = collect_table(top)  # bounded: exactly vocab_size rows
    vocab = np.sort(
        vocab_tbl.column("tok").to_numpy(zero_copy_only=False).astype(str)
    )
    vref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        v = ray.get(vref)
        t = _explode_tokens(batch, text_col, id_col)
        if len(t) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_oov": pa.array([], pa.int64()),
                }
            )
        toks = t.column("tok").to_numpy(zero_copy_only=False).astype(str)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v, toks)
        pos = np.clip(pos, 0, len(v) - 1)
        oov = (v[pos] != toks).astype(np.int64)
        uids, inv = np.unique(ids, return_inverse=True)
        n_tok = np.bincount(inv)
        n_oov = np.bincount(inv, weights=oov).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(uids),
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "n_oov": pa.array(n_oov),
            }
        )

    score.__name__ = "vocab_oov_score"
    return ds.map_batches(score, batch_format="pyarrow")


def bpe_pair_counts(ds, text_col: str = "text", id_col: str = "doc_id", top_k: int = 64):
    """Corpus-wide adjacent CHARACTER-pair frequencies inside tokens —
    the statistic one round of byte-pair-encoding merge selection ranks
    on (tokenizer training over the corpus).  Tokens are ASCII by
    construction (TOKEN_SPLIT_RE keeps [a-z0-9]), so byte pairs ==
    char pairs and the pair id b0*256+b1 sorts exactly like the 2-char
    string (DuckDB parity).

    Scale shape (100 TB): the per-batch kernel is a CSR expansion over
    the flattened token VALUES BUFFER (no per-token Python loop) into a
    65,536-bin bincount, so each batch emits at most the nonzero bins —
    the shuffle is bounded by 65,536 rows per batch regardless of corpus
    size; one tiny groupby + distributed sort/limit finishes.
    """
    def pair_partials(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, text_col, id_col)
        arr = t.column("tok")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return pa.table(
                {"pair_id": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        offs = np.frombuffer(arr.buffers()[1], np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        buf = np.frombuffer(arr.buffers()[2], np.uint8)
        lens = offs[1:] - offs[:-1]
        npairs = np.maximum(lens - 1, 0)
        total = int(npairs.sum())
        if total == 0:
            return pa.table(
                {"pair_id": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        # CSR expansion: pair start positions within the values buffer
        starts = np.repeat(offs[:-1], npairs)
        cum = np.concatenate(([0], np.cumsum(npairs)[:-1]))
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum, npairs)
        p = starts + intra
        codes = buf[p].astype(np.int64) * 256 + buf[p + 1].astype(np.int64)
        bc = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(bc)
        return pa.table(
            {"pair_id": pa.array(nz.astype(np.int64)), "cnt": pa.array(bc[nz])}
        )

    pair_partials.__name__ = "bpe_pair_partials"
    counts = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("pair_id")
        .sum("cnt")
    )
    top = counts.sort(
        ["sum(cnt)", "pair_id"], descending=[True, False]
    ).limit(top_k)

    def to_str(batch: pa.Table) -> pa.Table:
        pid = batch.column("pair_id").to_numpy(zero_copy_only=False)
        pairs = [chr(int(c) >> 8) + chr(int(c) & 255) for c in pid]  # <= top_k rows
        return pa.table(
            {
                "pair": pa.array(pairs, type=pa.string()),
                "cnt": batch.column("sum(cnt)").cast(pa.int64()),
            }
        )

    to_str.__name__ = "bpe_pair_str"
    return top.map_batches(to_str, batch_format="pyarrow")


# URL canonicalization rules — ONE ordered table drives BOTH the Arrow
# kernel chain (pyarrow.compute.replace_substring_regex) and the DuckDB
# oracle SQL (sql_url_norm), so engine/oracle parity holds by
# construction (both are RE2).  Applied to the lowercased URL, in order.
URL_RULES = (
    ("^https?://", ""),          # scheme
    ("^www\\.", ""),             # canonical host prefix
    ("#.*$", ""),                # fragment
    ("(?:utm_[a-z]+|fbclid)=[^&#]*&?", ""),  # tracking params (+their &)
    ("&&+", "&"),                # collapse & runs (removals can stack them)
    ("\\?&", "?"),               # separator debris after removals
    # one combined tail rule: stripping a trailing slash may EXPOSE a
    # dangling separator (…&/ -> …&), so ?,& and / strip together —
    # this is what makes normalization idempotent (property-tested)
    ("[?&/]+$", ""),
)

# registrable domain of the host part: last two labels, or three when the
# suffix is a common two-level TLD (heuristic; a full public-suffix list
# is data, not code)
DOMAIN_RE = "([^./]+\\.(?:co\\.uk|com\\.au|co\\.jp|org\\.uk)|[^./]+\\.[^./]+)(?:[/?].*)?$"


def normalize_urls(col: pa.ChunkedArray | pa.Array):
    """(url_norm, domain) Arrow arrays from a URL string column — the
    URL canonicalization + registrable-domain pass of a web-corpus
    pipeline (dedup by canonical URL, per-domain quotas).  Fully
    vectorized RE2 kernels; no per-row Python."""
    import pyarrow.compute as pc

    u = pc.utf8_lower(col)
    for pat, rep in URL_RULES:
        u = pc.replace_substring_regex(u, pat, rep)
    dom = pc.struct_field(pc.extract_regex(u, DOMAIN_RE.replace("(", "(?P<d>", 1)), "d")
    return u, dom


def sql_url_norm(expr: str) -> tuple[str, str]:
    """(url_norm_sql, domain_sql) mirroring normalize_urls exactly."""
    u = f"lower({expr})"
    for pat, rep in URL_RULES:
        # DuckDB single-quoted literals keep backslashes as-is (RE2 sees
        # the same pattern bytes the Arrow kernel sees)
        u = f"regexp_replace({u}, '{pat}', '{rep}', 'g')"
    return u, f"regexp_extract({u}, '{DOMAIN_RE}', 1)"
