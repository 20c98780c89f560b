"""Text analysis stages: language ID, quality scoring, token counting,
document fingerprinting.

These are the training-data-pipeline operators layered on the engine (the
reference's closest analog is the TextIndexStrategy n-gram machinery,
core/index/.../text/TextIndexStrategy.java).  All vectorized / compiled-
regex; regexes and stopword tables are built once per worker in
``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["TextFeatures", "LangId", "Fingerprinter", "ngrams_of"]

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at", "by"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für", "von", "im"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "que", "pour", "dans", "avec", "sur", "pas", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por", "para", "con", "del", "en"},
}


class TextFeatures:
    """Adds n_tokens, n_chars, avg_token_len, punct_ratio, stopword_ratio,
    quality_score.  Token rule: whitespace split + a BPE-ish word/number/
    punctuation regex for sub-token counting."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
        self.punct_re = re.compile(r"[^\w\s]")
        self.all_stop = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, dtype=np.int64)
        n_sub = np.zeros(n, dtype=np.int64)
        n_chars = np.zeros(n, dtype=np.int64)
        punct_ratio = np.zeros(n)
        stop_ratio = np.zeros(n)
        avg_tok = np.zeros(n)
        for i, t in enumerate(texts):
            t = t or ""
            toks = t.split()
            n_tokens[i] = len(toks)
            n_sub[i] = len(self.word_re.findall(t))
            n_chars[i] = len(t)
            punct_ratio[i] = len(self.punct_re.findall(t)) / max(len(t), 1)
            stop_ratio[i] = sum(1 for w in toks if w.lower() in self.all_stop) / max(
                len(toks), 1
            )
            avg_tok[i] = np.mean([len(w) for w in toks]) if toks else 0.0
        # simple quality heuristic: length band + stopword evidence - punct noise
        quality = (
            np.clip(n_tokens / 20.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 3, 0, 1) * 0.4
            + (1 - np.clip(punct_ratio * 4, 0, 1)) * 0.2
        )
        out = batch
        for name, arr in [
            ("n_tokens", n_tokens),
            ("n_subtokens", n_sub),
            ("n_chars_calc", n_chars),
            ("avg_token_len", avg_tok),
            ("punct_ratio", punct_ratio),
            ("stopword_ratio", stop_ratio),
            ("quality_score", quality),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out


class LangId:
    """Stopword-vote language ID over {en, de, fr, es}, 'und' (undetermined)
    when no stopwords hit.  A deterministic n-gram/stopword heuristic — not a
    trained model (none available here)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def classify(self, text: str) -> str:
        toks = [w.lower() for w in (text or "").split()]
        best, best_n = "und", 0
        for lang, table in self.tables.items():
            hits = sum(1 for w in toks if w in table)
            if hits > best_n:
                best, best_n = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds))


class Fingerprinter:
    """Rolling-hash document fingerprint (winnowing-lite): 64-bit polynomial
    rolling hash over the char stream; fingerprint = min-sampled k hashes
    xor-folded.  Deterministic across workers."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint", window: int = 16):
        self.text_col = text_col
        self.out_col = out_col
        self.window = window

    def of(self, text: str) -> int:
        data = (text or "").encode("utf-8", "ignore")
        if len(data) < self.window:
            h = 0xCBF29CE484222325
            for b in data:
                h = (h ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
            return h
        a = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        base = np.uint64(257)
        # rolling hash of each window via prefix powers
        pw = np.ones(self.window, dtype=np.uint64)
        for i in range(1, self.window):
            pw[i] = pw[i - 1] * base
        n = len(a) - self.window + 1
        windows = np.lib.stride_tricks.sliding_window_view(a, self.window)
        hs = (windows * pw[::-1]).sum(axis=1)
        # min-sample 8 and fold
        k = min(8, n)
        sel = np.sort(hs)[:k]
        out = np.uint64(0)
        for v in sel:
            out ^= v * np.uint64(0x9E3779B97F4A7C15)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = np.array(
            [self.of(t) for t in batch.column(self.text_col).to_pylist()],
            dtype=np.uint64,
        )
        return batch.append_column(self.out_col, pa.array(fps, type=pa.uint64()))


def ngrams_of(text: str, n: int = 3) -> set:
    """Character n-grams (TextIndexStrategy NGRAM analog, case-folded)."""
    t = (text or "").lower()
    return {t[i : i + n] for i in range(max(len(t) - n + 1, 0))}
