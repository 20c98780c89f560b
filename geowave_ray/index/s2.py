"""S2 cell scheme — cube-face quadtree + Hilbert curve, pure NumPy.

The reference exposes S2 as one of its spatial binning cell schemes
(``core/geotime/.../binning/S2BinningHelper.java:45-105``, alongside
H3/geohash).  No s2 library exists in this container, so the encoder is
re-derived here from the published s2geometry model (public docs /
Apache-2.0 reference design): lon/lat -> unit sphere point -> cube face
(largest-|component| with z>y>x tie order) -> (u,v) gnomonic face
coordinates -> (s,t) via the quadratic projection -> (i,j) leaf grid ->
Hilbert-curve position via the 4-orientation traversal tables
(``kIJtoPos`` / ``kPosToOrientation``) -> canonical 64-bit cell id
(3 face bits, 2*level position bits, trailing lsb marker).

Same discipline as index/geohash.py: everything is vectorized NumPy AND
exactly SQL-replayable — ``s2_cell_sql`` emits the identical face/uv/st/ij
arithmetic plus a ``list_reduce`` fold over the 2-bit-per-level Hilbert
state machine (the hilbert.py oracle technique), so binned aggregates
over genuine S2 cell ids get a full driver hash oracle.
"""

from __future__ import annotations

import numpy as np

__all__ = ["S2Scheme", "s2_cell_ids", "s2_tokens", "s2_cell_cte"]

# Hilbert traversal tables (s2geometry s2coords: kPosToIJ / kPosToOrientation;
# kSwapMask=1, kInvertMask=2).  kPosToIJ[r][pos] = ij (= i*2 + j) of the
# pos-th child visited under orientation r:
_POS_TO_IJ = (
    (0, 1, 3, 2),  # r=0: canonical order (0,0) (0,1) (1,1) (1,0)
    (0, 2, 3, 1),  # r=1: swap
    (3, 2, 0, 1),  # r=2: invert
    (3, 1, 0, 2),  # r=3: swap + invert
)
# orientation delta applied (XOR) after descending into child `pos`:
_POS_TO_ORIENT = (1, 0, 0, 3)
# inverse: kIJtoPos[r][ij] = pos
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)
_IJ_TO_POS_FLAT = np.array([p for row in _IJ_TO_POS for p in row], dtype=np.int64)
_ORIENT_FLAT = np.array(_POS_TO_ORIENT, dtype=np.int64)

_MAX_LEVEL = 30
_FACE_BITS = 3
_TOKEN_HEX = np.array(list("0123456789abcdef"))


def _xyz(lon: np.ndarray, lat: np.ndarray):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Face index 0..5 and (u,v) face coordinates (s2coords GetFace /
    ValidFaceXYZtoUV; ties between axes resolve toward the later axis)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest abs component: 0=x, 1=y, 2=z (z wins ties, then y)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    major = np.choose(axis, [x, y, z])
    face = np.where(major < 0, axis + 3, axis).astype(np.int64)
    # per-face (u, v) numerators over the major component:
    #   face 0: ( y,  z)/x   face 1: (-x,  z)/y   face 2: (-x, -y)/z
    #   face 3: ( z,  y)/x   face 4: ( z, -x)/y   face 5: (-y, -x)/z
    u_num = np.choose(face, [y, -x, -x, z, z, -y])
    v_num = np.choose(face, [z, z, -y, y, -x, -x])
    return face, u_num / major, v_num / major


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (s2coords UVtoST): area-uniformizing remap.
    The unselected where-branch is clamped at 0 so sqrt never sees a
    negative argument (u spans [-1, 1])."""
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _hilbert_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int):
    """Hilbert curve position of leaf (i, j) on `face` at `level`
    (S2CellId::FromFaceIJ semantics, one 2-bit step per level)."""
    r = face & 1  # initial orientation = face & kSwapMask
    pos = np.zeros(len(i), dtype=np.int64)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = _IJ_TO_POS_FLAT[r * 4 + ij]
        pos = (pos << 2) | p
        r = r ^ _ORIENT_FLAT[p]
    return pos


def s2_cell_ids(lon: np.ndarray, lat: np.ndarray, level: int = 10) -> np.ndarray:
    """Canonical S2 cell ids (int64 view of the uint64 id: face<<61 |
    pos<<(2*(30-level)+1) | lsb) for points, vectorized."""
    if not 0 < level <= _MAX_LEVEL:
        raise ValueError(f"level must be in 1..{_MAX_LEVEL}, got {level}")
    x, y, z = _xyz(lon, lat)
    face, u, v = _face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip(np.floor(_uv_to_st(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * n), 0, n - 1).astype(np.int64)
    pos = _hilbert_pos(face, i, j, level)
    shift = 2 * (_MAX_LEVEL - level)
    h = (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos.astype(np.uint64) << np.uint64(shift + 1))
        | (np.uint64(1) << np.uint64(shift))
    )
    return h.view(np.int64)


def s2_tokens(cell_ids: np.ndarray) -> np.ndarray:
    """Canonical S2 token strings: the id in hex, trailing zeros stripped
    (the interoperable external representation)."""
    h = np.asarray(cell_ids).view(np.uint64)
    nibbles = np.stack(
        [(h >> np.uint64(60 - 4 * k)) & np.uint64(0xF) for k in range(16)], axis=1
    )
    nz = nibbles != 0
    # length = index of last non-zero nibble + 1 (id always has the lsb marker)
    length = 16 - np.argmax(nz[:, ::-1], axis=1)
    chars = _TOKEN_HEX[nibbles.astype(np.int64)]
    return np.array(
        ["".join(chars[r, : length[r]]) for r in range(len(h))], dtype=object
    )


class S2Scheme:
    """CellScheme facade over canonical S2 ids (duck-typed like
    GridScheme/geohash): ``cell_of`` for binned aggregation, plus
    ``cell_bounds``-style ij decode for debugging."""

    def __init__(self, level: int = 10):
        self.level = level

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return s2_cell_ids(lon, lat, self.level)


def _sql_tables() -> tuple[str, str]:
    ijp = "[" + ",".join(str(int(v)) for v in _IJ_TO_POS_FLAT) + "]::BIGINT[]"
    ori = "[" + ",".join(str(int(v)) for v in _ORIENT_FLAT) + "]::BIGINT[]"
    return ijp, ori


def s2_cell_cte(level: int, pts_sql: str, id_cols: str = "image_id") -> str:
    """WITH-chain that maps `pts_sql` rows (lon, lat, `id_cols`...) to
    ``s2cell`` (BIGINT canonical S2 id at `level`).  The Hilbert position
    fold carries acc = (pos * 4 + orientation) through list_reduce; the
    final id wraps HUGEINT -> BIGINT two's-complement to match the NumPy
    uint64 view."""
    ijp, ori = _sql_tables()
    n = 1 << level
    shift = 2 * (_MAX_LEVEL - level)
    # fold: acc encodes pos*4 + r, step consumes one ij (2 bits per level,
    # MSB-first); p = IJP[r*4+ij+1] (1-based arrays), r' = xor(r, ORI[p+1])
    ij_expr = (
        f"((((i >> ({level} - 1 - b)) & 1) * 2 + ((j >> ({level} - 1 - b)) & 1))"
        f")::HUGEINT"
    )
    fold = (
        f"(list_reduce(list_prepend((f & 1)::HUGEINT,"
        f" list_transform(range({level}), b -> {ij_expr})),"
        f" (acc, ij) -> ((acc // 4) * 4 +"
        f" IJP[CAST((acc % 4) * 4 + ij AS BIGINT) + 1]) * 4 +"
        f" xor(acc % 4, ORI[IJP[CAST((acc % 4) * 4 + ij AS BIGINT) + 1] + 1]))"
        f" // 4)"
    )
    return f"""
s2pts AS ({pts_sql}),
s2t AS (SELECT {ijp} AS IJP, {ori} AS ORI),
s2xyz AS (
  SELECT {id_cols}, v_cents,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM s2pts
),
s2face AS (
  SELECT {id_cols}, v_cents, x, y, z,
         CASE WHEN abs(x) > abs(y)
              THEN CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END
              ELSE CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END END AS axis
  FROM s2xyz
),
s2f AS (
  SELECT {id_cols}, v_cents, x, y, z,
         CASE WHEN (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
              THEN axis + 3 ELSE axis END AS f,
         (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) AS major
  FROM s2face
),
s2uv AS (
  SELECT {id_cols}, v_cents, f,
         (CASE f WHEN 0 THEN y WHEN 1 THEN -x WHEN 2 THEN -x
                 WHEN 3 THEN z WHEN 4 THEN z ELSE -y END) / major AS u,
         (CASE f WHEN 0 THEN z WHEN 1 THEN z WHEN 2 THEN -y
                 WHEN 3 THEN y WHEN 4 THEN -x ELSE -x END) / major AS v
  FROM s2f
),
s2ij AS (
  SELECT {id_cols}, v_cents, f,
         CAST(LEAST(GREATEST(FLOOR(
           (CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
                 ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END) * {n}), 0), {n - 1})
           AS BIGINT) AS i,
         CAST(LEAST(GREATEST(FLOOR(
           (CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v)
                 ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END) * {n}), 0), {n - 1})
           AS BIGINT) AS j
  FROM s2uv
),
s2pos AS (
  SELECT {id_cols}, v_cents,
         f::HUGEINT * {1 << 61}::HUGEINT
           + {fold} * {1 << (shift + 1)}::HUGEINT
           + {1 << shift}::HUGEINT AS hraw
  FROM s2ij, s2t
),
s2cells AS (
  SELECT {id_cols}, v_cents,
         CAST(CASE WHEN hraw >= 9223372036854775808::HUGEINT
                   THEN hraw - 18446744073709551616::HUGEINT
                   ELSE hraw END AS BIGINT) AS s2cell
  FROM s2pos
)""".strip()
