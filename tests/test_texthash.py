"""stages/texthash vectorized kernels vs per-string reference
implementations, and NumPy vs DuckDB SQL parity of the hash spec."""

import duckdb
import numpy as np
import pytest

from geowave_ray.stages import texthash as th

TEXTS = [
    "The quick brown Fox jumps over the lazy dog",
    "",
    "   ",
    "one",
    "one two",
    "a b c d e f g",
    "key agg row scan slow fast table value part hash",
    "x" * 40,
    "short",
    "tabs\tand\nnewlines here ok",
    "punct, and. more! (stuff) #1 2x",
]


def simhash_slow(text):
    t = th.splitmix64(th.token_hashes_single(text))
    if len(t) == 0:
        return 0
    bits = (
        (t[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    return int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def fp_slow(text, W=16):
    cps = np.array([ord(c) for c in (text or "")], dtype=np.uint64)
    L = len(cps)
    with np.errstate(over="ignore"):
        if L == 0:
            vals = np.zeros(1, dtype=np.uint64)
        elif L < W:
            h = np.uint64(0)
            for c in cps:
                h = h * np.uint64(257) + c
            vals = np.array([h], dtype=np.uint64)
        else:
            vals = np.zeros(L - W + 1, dtype=np.uint64)
            for s in range(L - W + 1):
                h = np.uint64(0)
                for c in cps[s : s + W]:
                    h = h * np.uint64(257) + c
                vals[s] = h
        k = min(8, len(vals))
        sel = np.sort(vals)[:k] * th.GOLD
        out = np.uint64(0)
        for v in sel:
            out = out ^ v
    return int(out)


def test_token_and_shingle_hashes_match_reference():
    tb = th.tokenize_hash(TEXTS)
    for i, t in enumerate(TEXTS):
        ref = th.token_hashes_single(t)
        got = tb.tok_hashes[tb.tok_offsets[i] : tb.tok_offsets[i + 1]]
        assert np.array_equal(ref, got)
    sh, sho = th.shingle_hashes(tb, 3)
    for i, t in enumerate(TEXTS):
        ref = th.shingle_hashes_single(t, 3)
        assert np.array_equal(ref, sh[sho[i] : sho[i + 1]])


def test_simhash_batch_matches_reference():
    sm = th.simhash_batch(th.tokenize_hash(TEXTS))
    for i, t in enumerate(TEXTS):
        assert int(sm[i]) == simhash_slow(t)


def test_fingerprint_batch_matches_reference():
    fps = th.fingerprint_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        assert int(fps[i]) == fp_slow(t)


def test_minhash_matrix_matches_reference():
    from geowave_ray.stages.dedupe import minhash_perms

    a, b = minhash_perms(8)
    tb = th.tokenize_hash(TEXTS)
    sh, sho = th.shingle_hashes(tb, 3)
    M = th.minhash_matrix(sh, sho, a, b)
    for i, t in enumerate(TEXTS):
        s = th.shingle_hashes_single(t, 3)
        with np.errstate(over="ignore"):
            ref = (s[None, :] * a[:, None] + b[:, None]).min(axis=1)
        assert np.array_equal(M[i], ref)


def test_sql_tokhash_and_splitmix_parity():
    con = duckdb.connect()
    tok = th.sql_tokens("t.txt")
    q = f"""
    WITH pw AS (SELECT {th.sql_pow_literal(31, 64)} AS P31),
    t AS (SELECT unnest(?) AS txt)
    SELECT {th.sql_tokhash_list(tok)} FROM t CROSS JOIN pw
    """
    rows = con.execute(q, [TEXTS]).fetchall()
    for (got,), t in zip(rows, TEXTS):
        ref = [int(x) for x in th.token_hashes_single(t)]
        assert [int(x) for x in got] == ref
    vals = [0, 1, 12345, 2**63, 2**64 - 1]
    expr = th.sql_splitmix64("x::HUGEINT")
    got = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?::HUGEINT[]) AS x)", [vals]
    ).fetchall()
    ref = th.splitmix64(np.array(vals, dtype=np.uint64))
    assert [int(g[0]) for g in got] == [int(v) for v in ref]


def test_hash_strings_deterministic_and_distinct():
    a = th.hash_strings(["alpha", "beta", "alpha", ""])
    b = th.hash_strings(["alpha", "beta", "alpha", ""])
    assert np.array_equal(a, b)
    assert a[0] == a[2] and a[0] != a[1]
