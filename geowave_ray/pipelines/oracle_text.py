"""DuckDB oracle SQL generators for the text/dedup/sample query family.

Each builder returns a single SQL statement that recomputes the engine's
deterministic hash spec (stages/texthash docstring) in pure SQL — HUGEINT
mod-2**64 arithmetic over Unicode codepoints — so the driver's correctness
gate hard-verifies these pipelines instead of recording rows-only.
"""

from __future__ import annotations

from ..stages.dedupe import minhash_perms
from ..stages.text import STOPWORDS
from ..stages.texthash import (
    GOLD,
    M64_SQL,
    SHINGLE_F,
    sql_mulmod64,
    sql_pow_literal,
    sql_splitmix64,
    sql_tokens,
    sql_tokhash_list,
)

_GOLD = int(GOLD)
_F = int(SHINGLE_F)


def _tok_cte(table: str = "documents", text_col: str = "text") -> str:
    """CTEs `pw` (power literals) and `tok` (doc_id, tokens, th)."""
    tokens = sql_tokens(f"d.{text_col}")
    return f"""
pw AS (SELECT {sql_pow_literal(31, 64)} AS P31),
tok AS (
  SELECT d.doc_id, {tokens} AS tokens, {sql_tokhash_list(tokens)} AS th
  FROM {table} d CROSS JOIN pw
)""".strip()


def _shingle_expr(th: str = "th") -> str:
    """Shingle-hash list for a token-hash list expression (k=3)."""
    sm_x = sql_splitmix64("x::HUGEINT")
    comb = (
        f"((({th}[j]*{_F}::HUGEINT + {th}[j+1]) % {M64_SQL})"
        f"*{_F}::HUGEINT + {th}[j+2]) % {M64_SQL}"
    )
    sm_comb = sql_splitmix64(comb)
    return f"""CASE
  WHEN len({th}) = 0 THEN [0::HUGEINT]
  WHEN len({th}) < 3 THEN list_transform({th}, x -> {sm_x})
  ELSE list_transform(range(1, len({th}) - 1), j -> {sm_comb})
END"""


def sql_repetition(table: str = "documents", text_col: str = "text") -> str:
    """Exact mirror of stages/text.RepetitionFeatures: non-empty-line
    poly hashes (fold — lines can exceed the P31 literal length) and k=2
    shingle bigram dominance, integer milli-unit outputs."""
    from ..stages.texthash import SEED31

    linehash = (
        f"list_reduce(list_prepend({int(SEED31)}::HUGEINT,"
        f" list_transform(range(1, length(ln)+1),"
        f" ii -> unicode(ln[ii])::HUGEINT)),"
        f" (acc, c) -> (acc * 31 + c) % {M64_SQL})"
    )
    bigram = sql_splitmix64(f"(th[i]*{_F}::HUGEINT + th[i+1]) % {M64_SQL}")
    return f"""
WITH {_tok_cte(table, text_col)}
, lh AS (
  SELECT d.doc_id,
         unnest(list_transform(
           list_filter(string_split(d.{text_col}, chr(10)), ln -> ln <> ''),
           ln -> {linehash})) AS h
  FROM {table} d)
, lstat AS (
  SELECT doc_id, COUNT(*) AS n_lines, COUNT(DISTINCT h) AS n_uniq
  FROM lh GROUP BY doc_id)
, bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(th)), i -> {bigram})) AS b
  FROM tok WHERE len(th) >= 2)
, btop AS (
  SELECT doc_id, MAX(c) AS top
  FROM (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b)
  GROUP BY doc_id)
SELECT t.doc_id,
       CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(1000 * (COALESCE(l.n_lines, 0) - COALESCE(l.n_uniq, 0))
            // GREATEST(COALESCE(l.n_lines, 0), 1) AS BIGINT) AS dup_line_milli,
       CAST(1000 * COALESCE(p.top, 0)
            // GREATEST(len(t.th) - 1, 1) AS BIGINT) AS top_bigram_milli
FROM tok t
LEFT JOIN lstat l ON l.doc_id = t.doc_id
LEFT JOIN btop p ON p.doc_id = t.doc_id
"""


def sql_decontaminate(bench_mod: int = 31, table: str = "documents") -> str:
    """Exact mirror of pipelines q_decontaminate: per-corpus-doc count of
    DISTINCT k=3 shingle hashes shared with the benchmark docs
    (doc_id % bench_mod == 0); contaminated docs only."""
    return f"""
WITH {_tok_cte(table)}
, sh_t AS (SELECT doc_id, {_shingle_expr('th')} AS shl FROM tok)
, shd AS (SELECT DISTINCT doc_id, sh
          FROM (SELECT doc_id, unnest(shl) AS sh FROM sh_t))
, bench AS (SELECT DISTINCT sh FROM shd WHERE doc_id % {bench_mod} = 0)
SELECT c.doc_id, COUNT(*) AS n_contaminated
FROM shd c JOIN bench b USING (sh)
WHERE c.doc_id % {bench_mod} <> 0
GROUP BY c.doc_id
"""


def sql_langid() -> str:
    def inlist(lang: str) -> str:
        words = ",".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        return f"len(list_filter(tokens, tk -> tk IN ({words})))"

    return f"""
WITH {_tok_cte()}
, votes AS (
  SELECT doc_id, {inlist('en')} AS h_en, {inlist('de')} AS h_de,
         {inlist('fr')} AS h_fr, {inlist('es')} AS h_es
  FROM tok)
SELECT doc_id,
  CASE
    WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
    WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
    WHEN h_fr >= h_es THEN 'fr'
    ELSE 'es'
  END AS lang_pred
FROM votes
"""


def sql_quality() -> str:
    all_stop = ",".join(f"'{w}'" for w in sorted(set().union(*STOPWORDS.values())))
    return rf"""
WITH {_tok_cte()}
, feat AS (
  SELECT t.doc_id,
         len(t.tokens) AS n_tokens,
         len(list_filter(t.tokens, tk -> tk IN ({all_stop}))) AS n_stop,
         len(regexp_extract_all(d.text, '[^A-Za-z0-9_\s]')) AS n_punct,
         length(d.text) AS n_chars
  FROM tok t JOIN documents d USING (doc_id))
SELECT doc_id, n_tokens, n_punct, n_stop,
  CAST(20 * least(n_tokens, 20)
   + (400 * least(3 * n_stop, greatest(n_tokens, 1))) // greatest(n_tokens, 1)
   + (200 * greatest(n_chars - 4 * n_punct, 0)) // greatest(n_chars, 1)
   AS BIGINT) AS quality_milli
FROM feat
"""


def _to_int64(expr: str) -> str:
    """uint64-valued HUGEINT -> two's-complement BIGINT (matches numpy
    .astype(int64) wraparound)."""
    return (
        f"CAST(CASE WHEN ({expr}) >= 9223372036854775808::HUGEINT"
        f" THEN ({expr}) - {M64_SQL} ELSE ({expr}) END AS BIGINT)"
    )


def sql_simhash() -> str:
    sm_x = sql_splitmix64("x::HUGEINT")
    bit = (
        "CASE WHEN 2 * len(list_filter(sm, x -> (x >> b) % 2 = 1)) > len(sm)"
        " THEN (1::HUGEINT << b) ELSE 0::HUGEINT END"
    )
    val = (
        "CASE WHEN len(th) = 0 THEN 0::HUGEINT ELSE "
        f"(coalesce(list_sum(list_transform(range(64), b -> {bit})), 0::HUGEINT))"
        " % " + M64_SQL + " END"
    )
    return f"""
WITH {_tok_cte()}
, sm_t AS (SELECT doc_id, th, list_transform(th, x -> {sm_x}) AS sm FROM tok)
SELECT doc_id, {_to_int64(val)} AS simhash FROM sm_t
"""


def sql_fingerprints(window: int = 16) -> str:
    w = window
    whole = (
        "(coalesce(list_sum(list_transform(range(1, length(d.text)+1),"
        f" i -> unicode(d.text[i])::HUGEINT * P257[length(d.text)-i+1])), 0::HUGEINT))"
        f" % {M64_SQL}"
    )
    win = (
        f"(list_sum(list_transform(range(0, {w}),"
        f" j -> unicode(d.text[st+j])::HUGEINT * P257[{w}-j]))) % {M64_SQL}"
    )
    fold_v = sql_mulmod64("v", f"{_GOLD}::HUGEINT")
    return f"""
WITH pw AS (SELECT {sql_pow_literal(257, max(window, 64))} AS P257),
vals AS (
  SELECT d.doc_id,
    CASE
      WHEN length(d.text) = 0 THEN [0::HUGEINT]
      WHEN length(d.text) < {w} THEN [{whole}]
      ELSE list_transform(range(1, length(d.text) - {w} + 2), st -> {win})
    END AS v
  FROM documents d CROSS JOIN pw),
folded AS (
  SELECT doc_id,
    list_reduce(
      list_transform(list_slice(list_sort(v), 1, least(8, len(v))), v -> {fold_v}),
      (a, b) -> xor(a, b)) AS fp
  FROM vals)
SELECT doc_id, {_to_int64('fp')} AS fingerprint FROM folded
"""


def sql_minhash_pairs(n_perm: int = 64, bands: int = 16, rows: int = 4) -> str:
    a, b = minhash_perms(n_perm)
    a_lit = "[" + ",".join(str(int(x)) for x in a) + "]::HUGEINT[]"
    b_lit = "[" + ",".join(str(int(x)) for x in b) + "]::HUGEINT[]"
    # s < 2**64, a_p < 2**61 => product < 2**125 fits HUGEINT directly
    perm_min = (
        f"list_min(list_transform(sh, s -> (s * A[p+1] + B[p+1]) % {M64_SQL}))"
    )
    band_eq = (
        f"len(list_filter(range({bands}), bb ->"
        f" list_slice(x.sig, bb*{rows}+1, bb*{rows}+{rows})"
        f" = list_slice(y.sig, bb*{rows}+1, bb*{rows}+{rows}))) > 0"
    )
    return f"""
WITH {_tok_cte()}
, sh_t AS (SELECT doc_id, {_shingle_expr('th')} AS sh FROM tok),
ab AS (SELECT {a_lit} AS A, {b_lit} AS B),
mh AS (
  SELECT doc_id, list_transform(range({n_perm}), p -> {perm_min}) AS sig
  FROM sh_t CROSS JOIN ab)
SELECT x.doc_id AS id_a, y.doc_id AS id_b
FROM mh x JOIN mh y ON x.doc_id < y.doc_id
WHERE {band_eq}
"""


def sql_minhash_groups(n_perm: int = 64, bands: int = 16, rows: int = 4) -> str:
    """Duplicate groups = connected components (min doc_id label) of the
    LSH band-equality pair graph, via a recursive CTE."""
    pairs = sql_minhash_pairs(n_perm, bands, rows).strip()
    # strip the leading WITH so the pair query nests as a CTE chain
    assert pairs.upper().startswith("WITH")
    inner = pairs[4:].rsplit("SELECT x.doc_id", 1)
    body = "SELECT x.doc_id" + inner[1]
    return f"""
WITH RECURSIVE {inner[0].strip().rstrip(',')},
pr AS ({body}),
nodes AS (SELECT id_a AS pid FROM pr UNION SELECT id_b FROM pr),
e AS (SELECT id_a AS a, id_b AS b FROM pr UNION SELECT id_b, id_a FROM pr),
reach(pid, lab) AS (
  SELECT pid, pid FROM nodes
  UNION
  SELECT e.b, r.lab FROM reach r JOIN e ON e.a = r.pid WHERE r.lab <= e.b)
SELECT pid AS doc_id, MIN(lab) AS dup_group FROM reach GROUP BY pid
"""


def sql_deterministic_sample(pts_sql: str, rate: float = 0.05, seed: int = 7) -> str:
    z = sql_mulmod64(f"(image_id + {seed})::HUGEINT", f"{_GOLD}::HUGEINT")
    return f"""
WITH pts AS ({pts_sql}),
h AS (SELECT image_id, ({z}) AS z FROM pts)
SELECT image_id FROM h
WHERE CAST(xor(z, z >> 31) AS DOUBLE) / 18446744073709551616.0 < {rate}
"""


def sql_dsir(
    target_value: str = "en",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
    table: str = "documents",
) -> str:
    """Exact mirror of stages/text.dsir_importance: hashed-unigram bucket
    counts (raw vs target slice), Laplace-smoothed integer weights
    ``(scale*(t+1)) // (r+1)``, per-doc sum over token instances."""
    sm = sql_splitmix64("th")
    return f"""
WITH {_tok_cte(table)}
, inst AS (
  SELECT t.doc_id, d.lang, unnest(t.th) AS th
  FROM tok t JOIN {table} d USING (doc_id))
, bk AS (SELECT doc_id, lang, ({sm}) % {n_buckets} AS bkt FROM inst)
, cnt AS (
  SELECT bkt, COUNT(*) AS r,
         COUNT(*) FILTER (lang = '{target_value}') AS tg
  FROM bk GROUP BY bkt)
, w AS (SELECT bkt, ({scale}::HUGEINT * (tg + 1)) // (r + 1) AS wgt FROM cnt)
, sc AS (
  SELECT bk.doc_id, SUM(w.wgt) AS s
  FROM bk JOIN w USING (bkt) GROUP BY bk.doc_id)
SELECT d.doc_id, CAST(COALESCE(sc.s, 0) AS BIGINT) AS dsir_score
FROM {table} d LEFT JOIN sc USING (doc_id)
"""


def sql_boilerplate(chunk_len: int = 3, min_count: int = 3,
                    table: str = "documents", text_col: str = "text") -> str:
    """Exact mirror of stages/text.boilerplate_filter: chunk hashes are
    splitmix64 of the base-SHINGLE_F Horner fold over each consecutive
    ``chunk_len``-token-hash window; chunks with global count >=
    ``min_count`` are boilerplate; kept_fold re-folds the kept chunk
    hashes in document order."""
    L = int(chunk_len)
    fold = (
        f"list_reduce(list_prepend(0::HUGEINT,"
        f" th[(j-1)*{L}+1 : least(j*{L}, len(th))]),"
        f" (a, c) -> (a * {_F}::HUGEINT + c) % {M64_SQL})"
    )
    smix = sql_splitmix64(fold)
    kfold = (
        f"list_reduce(list_prepend(0::HUGEINT,"
        f" coalesce(list(h ORDER BY j) FILTER (WHERE NOT boiler),"
        f" []::HUGEINT[])),"
        f" (a, c) -> (a * {_F}::HUGEINT + c) % {M64_SQL})"
    )
    return f"""
WITH {_tok_cte(table, text_col)}
, ch AS (
  SELECT doc_id, j, {smix} AS h
  FROM (SELECT doc_id, th,
               unnest(range(1, (len(th) + {L} - 1) // {L} + 1)) AS j
        FROM tok WHERE len(th) > 0)
)
, freq AS (SELECT h, COUNT(*) AS c FROM ch GROUP BY h)
, mk AS (
  SELECT c.doc_id, c.j, c.h, (f.c >= {int(min_count)}) AS boiler
  FROM ch c JOIN freq f ON f.h = c.h)
, agg AS (
  SELECT doc_id,
         COUNT(*) AS n_chunks,
         SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS n_boiler,
         {kfold} AS fold
  FROM mk GROUP BY doc_id)
SELECT t.doc_id,
       CAST(COALESCE(a.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(a.n_boiler, 0) AS BIGINT) AS n_boiler,
       {_to_int64('COALESCE(a.fold, 0::HUGEINT)')} AS kept_fold
FROM tok t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


def sql_chunk_tokens(window: int = 40, stride: int = 30) -> str:
    """Exact replay of stages/text.TokenChunker: per-doc token-hash list
    (shared tok CTE), chunk starts at 0, stride, 2*stride, ...; chunk
    checksum = splitmix64(sum of window token hashes mod 2**64)."""
    w, s = window, stride
    n_ch = f"CAST(ceil(len(th) / {s}.0) AS BIGINT)"
    hi = f"least(len(th), i*{s} + {w})"
    seg_sum = f"(list_sum(list_slice(th, i*{s} + 1, {hi})) % {M64_SQL})"
    u = (
        f"list_transform(range(0, {n_ch}), i -> struct_pack("
        f"ci := i, nt := {hi} - i*{s}, sg := {seg_sum}))"
    )
    return f"""
WITH {_tok_cte()},
ch AS (
  SELECT doc_id, unnest({u}) AS u
  FROM tok WHERE len(th) > 0)
SELECT doc_id, u.ci AS chunk_idx, u.nt AS n_tok,
       {_to_int64(sql_splitmix64("u.sg"))} AS chunk_hash
FROM ch
"""


def sql_lm_score(
    n_buckets: int = 1024, n_big_buckets: int = 16384, scale: int = 1_000_000
) -> str:
    """Exact replay of stages/text.lm_score: hashed unigram/bigram bucket
    counts over the whole corpus, then per-doc integer conditional-
    probability sum (scale * c_bigram) // c_unigram(prev)."""
    bu = f"({sql_splitmix64('th[i]')}) % {n_buckets}::HUGEINT"
    acc = f"((({sql_mulmod64('th[i]', f'{_F}::HUGEINT')})) + th[i+1]) % {M64_SQL}"
    bb = f"({sql_splitmix64(acc)}) % {n_big_buckets}::HUGEINT"
    uni_b = f"({sql_splitmix64('h')}) % {n_buckets}::HUGEINT"
    return f"""
WITH {_tok_cte()},
uni AS (SELECT unnest(list_transform(th, h -> {uni_b})) AS b FROM tok),
cu AS (SELECT b, COUNT(*)::HUGEINT AS c FROM uni GROUP BY b),
bigr AS (
  SELECT doc_id, unnest(list_transform(range(1, len(th)),
      i -> struct_pack(bu := {bu}, bb := {bb}))) AS u
  FROM tok WHERE len(th) >= 2),
cb AS (SELECT u.bb AS b, COUNT(*)::HUGEINT AS c FROM bigr GROUP BY u.bb),
sc AS (
  SELECT g.doc_id, COUNT(*) AS n_bigrams,
         SUM(({scale}::HUGEINT * cb.c) // cu.c) AS s
  FROM bigr g
  JOIN cu ON cu.b = g.u.bu
  JOIN cb ON cb.b = g.u.bb
  GROUP BY g.doc_id)
SELECT t.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sc.s, 0) AS BIGINT) AS lm_score
FROM tok t LEFT JOIN sc ON sc.doc_id = t.doc_id
"""
