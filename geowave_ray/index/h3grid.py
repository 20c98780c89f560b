"""Icosahedral aperture-7 hexagonal cell scheme — H3's construction in
pure NumPy.

The reference's H3 binning (``core/geotime/.../binning/H3BinningHelper.java``
:41-185) bins points into Uber-H3 cells.  This module implements the SAME
published construction — gnomonic projection onto the 20 faces of a
regular icosahedron, then an aperture-7 hexagonal lattice per face with
the Class-III ``atan(sqrt(3)/5)`` (~19.1066°) rotation on odd resolutions
and ``1/sqrt(7)`` scaling per resolution — so cells are genuinely
~equal-area hexagons on the SPHERE (no polar distortion, unlike the
equal-angle plane of ``hexgrid.py``).

Honest interoperability note: the resulting int64 ids are NOT bit-
compatible with Uber H3.  Bit parity needs two pieces of published DATA
(not formulas): Uber's specific icosahedron orientation (chosen so no
vertex falls on land) and the 122-entry base-cell numbering /
``faceIjkBaseCells`` tables.  With the ``h3`` library banned in this
container and no network access those tables cannot be reproduced
verifiably, so this module uses a repo-canonical orientation (the golden-
rectangle frame) and a (face, q, r) cell address.  Every geometric step of
the construction is the H3 one, and every step is plain double arithmetic
an independent DuckDB oracle replays bit-for-bit (``h3_cell_cte``), so the
cell ids themselves are hash-verified end-to-end.

Construction details:
  - Icosahedron vertices: cyclic permutations of (0, ±1, ±φ), normalized;
    faces = the 20 vertex triples at minimum pairwise chord, ordered by
    sorted vertex indices (deterministic).
  - Face frame: center c = normalize(v_a + v_b + v_c); e1 = unit component
    of the lowest-index vertex orthogonal to c; e2 = c × e1.
  - Point → face: argmax of p·c over the 20 centers (first-max tie-break,
    identical to the oracle's ORDER BY dot DESC, face ASC).
  - Gnomonic: x = (p·e1)/(p·c), y = (p·e2)/(p·c).
  - Aperture 7: hex circumradius BASE_SIZE/√7^res in the gnomonic plane;
    odd resolutions rotated by atan(√3/5) (the Eisenstein arg(2+ω) of
    norm-7, i.e. H3's Class-III skew).  Hex rounding reuses the proven
    flat-top axial + cube-round kernel from ``hexgrid.py``.
Cells straddling a face edge are split per face (the id carries the face);
H3 proper stitches those into pentagons via its base-cell tables — the
split is documented here rather than approximated wrongly.
"""

from __future__ import annotations

import math

import numpy as np

from .hexgrid import hex_cells

__all__ = [
    "H3Grid",
    "h3_cells",
    "h3_cell_ids",
    "h3_cell_cte",
    "FACE_CENTERS",
    "FACE_E1",
    "FACE_E2",
    "BASE_SIZE",
    "ALPHA",
]

BASE_SIZE = 0.36  # res-0 hex circumradius in the gnomonic plane (~face scale)
ALPHA = math.atan(math.sqrt(3.0) / 5.0)  # aperture-7 Class-III rotation

# offsets for the int64 (face, q, r) pack — |q|,|r| < 2**20 holds for any
# res <= 15 (gnomonic |x| <= tan(37.4°) ≈ 0.764, so |q| <~ 0.51/size)
_OFF = 1 << 20
_MUL = 1 << 21
_FACE_MUL = _MUL * _MUL  # 2**42


def _build_icosahedron() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    phi = (1.0 + math.sqrt(5.0)) / 2.0
    verts = []
    for a, b in ((1.0, phi), (1.0, -phi), (-1.0, phi), (-1.0, -phi)):
        verts.append((0.0, a, b))
        verts.append((a, b, 0.0))
        verts.append((b, 0.0, a))
    v = np.array(verts, dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # adjacency: minimum pairwise chord (edge of the icosahedron)
    d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    edge2 = d2.min()
    adj = d2 <= edge2 + 1e-9
    faces = []
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces.sort()
    assert len(faces) == 20, len(faces)
    f = np.array(faces, dtype=np.int64)
    centers = v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # e1 toward the lowest-index vertex of each face (f is index-sorted)
    a = v[f[:, 0]]
    e1 = a - (a * centers).sum(axis=1, keepdims=True) * centers
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(centers, e1)
    return v, f, centers, (e1, e2)


_VERTS, _FACES, FACE_CENTERS, (_E1, _E2) = _build_icosahedron()
FACE_E1, FACE_E2 = _E1, _E2


def _unit_xyz(lon: np.ndarray, lat: np.ndarray):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    # explicit elementwise products — same association as the SQL mirror
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def res_size(res: int) -> float:
    """Hex circumradius in the gnomonic plane at `res` (a single Python
    float, embedded verbatim in the SQL mirror — no pow() parity risk)."""
    return BASE_SIZE / math.sqrt(7.0) ** res


def res_rotation(res: int) -> tuple[float, float]:
    """(cos, sin) of the Class-III rotation at `res` (odd res only)."""
    theta = ALPHA if res % 2 else 0.0
    return math.cos(theta), math.sin(theta)


def h3_cells(
    lon: np.ndarray, lat: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face, q, r) of each point at `res` — int64 arrays."""
    px, py, pz = _unit_xyz(lon, lat)
    # (n, 20) dots with the exact a+b+c association the oracle uses
    dots = (
        px[:, None] * FACE_CENTERS[:, 0][None, :]
        + py[:, None] * FACE_CENTERS[:, 1][None, :]
    ) + pz[:, None] * FACE_CENTERS[:, 2][None, :]
    face = dots.argmax(axis=1)
    c = FACE_CENTERS[face]
    e1 = _E1[face]
    e2 = _E2[face]
    denom = (px * c[:, 0] + py * c[:, 1]) + pz * c[:, 2]
    gx = ((px * e1[:, 0] + py * e1[:, 1]) + pz * e1[:, 2]) / denom
    gy = ((px * e2[:, 0] + py * e2[:, 1]) + pz * e2[:, 2]) / denom
    ca, sa = res_rotation(res)
    xr = gx * ca + gy * sa
    yr = -gx * sa + gy * ca
    q, r = hex_cells(xr, yr, res_size(res))
    return face.astype(np.int64), q, r


def h3_cell_ids(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Packed int64 id: face * 2^42 + (q + 2^20) * 2^21 + (r + 2^20)."""
    face, q, r = h3_cells(lon, lat, res)
    return face * _FACE_MUL + (q + _OFF) * _MUL + (r + _OFF)


class H3Grid:
    """CellScheme facade over the icosahedral aperture-7 grid."""

    def __init__(self, res: int = 3):
        self.res = int(res)

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return h3_cell_ids(lon, lat, self.res)

    @staticmethod
    def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        cell = np.asarray(cell, dtype=np.int64)
        face = cell // _FACE_MUL
        rem = cell - face * _FACE_MUL
        q = rem // _MUL - _OFF
        r = rem % _MUL - _OFF
        return face, q, r

    def center(self, cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Cell center lon/lat (inverse gnomonic of the hex center)."""
        face, q, r = self.unpack(cell)
        size = res_size(self.res)
        ca, sa = res_rotation(self.res)
        xr = size * 1.5 * q.astype(np.float64)
        yr = size * math.sqrt(3.0) * (r + q / 2.0)
        gx = xr * ca - yr * sa
        gy = xr * sa + yr * ca
        c = FACE_CENTERS[face]
        p = c + gx[:, None] * _E1[face] + gy[:, None] * _E2[face]
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        lat = np.degrees(np.arcsin(np.clip(p[:, 2], -1.0, 1.0)))
        lon = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
        return lon, lat


def _c(x: float) -> str:
    return repr(float(x))


def h3_cell_cte(res: int, pts_sql: str, id_cols: str = "image_id") -> str:
    """WITH-chain mapping `pts_sql` rows (lon, lat, `id_cols`, v_cents) to
    an `h3cell` BIGINT — the exact DuckDB mirror of ``h3_cell_ids``.
    `id_cols`'s FIRST column must be row-unique (argmax partition key)."""
    key = id_cols.split(",")[0].strip()
    rows = ",\n    ".join(
        f"({i}, {_c(FACE_CENTERS[i,0])}, {_c(FACE_CENTERS[i,1])}, {_c(FACE_CENTERS[i,2])},"
        f" {_c(_E1[i,0])}, {_c(_E1[i,1])}, {_c(_E1[i,2])},"
        f" {_c(_E2[i,0])}, {_c(_E2[i,1])}, {_c(_E2[i,2])})"
        for i in range(20)
    )
    size = res_size(res)
    ca, sa = res_rotation(res)
    return f"""
h3faces(face, cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z) AS (VALUES
    {rows}),
h3pts AS ({pts_sql}),
h3xyz AS (
  SELECT {id_cols}, v_cents,
         cos(radians(lat)) * cos(radians(lon)) AS px,
         cos(radians(lat)) * sin(radians(lon)) AS py,
         sin(radians(lat)) AS pz
  FROM h3pts
),
h3face AS (
  SELECT {id_cols}, v_cents, face, px, py, pz,
         cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z
  FROM h3xyz CROSS JOIN h3faces
  QUALIFY row_number() OVER (
    PARTITION BY {key}
    ORDER BY px * cx + py * cy + pz * cz DESC, face ASC) = 1
),
h3gno AS (
  SELECT {id_cols}, v_cents, face,
         (px * e1x + py * e1y + pz * e1z) / (px * cx + py * cy + pz * cz) AS gx,
         (px * e2x + py * e2y + pz * e2z) / (px * cx + py * cy + pz * cz) AS gy
  FROM h3face
),
h3rot AS (
  SELECT {id_cols}, v_cents, face,
         gx * {_c(ca)} + gy * {_c(sa)} AS xr,
         -gx * {_c(sa)} + gy * {_c(ca)} AS yr
  FROM h3gno
),
h3f AS (
  SELECT {id_cols}, v_cents, face,
         (2.0 / 3.0 * xr) / {_c(size)} AS fq,
         (-1.0 / 3.0 * xr + sqrt(3.0) / 3.0 * yr) / {_c(size)} AS fr
  FROM h3rot
),
h3r AS (
  SELECT {id_cols}, v_cents, face, fq, fr, -fq - fr AS fy,
         FLOOR(fq + 0.5) AS rq, FLOOR(-fq - fr + 0.5) AS ry,
         FLOOR(fr + 0.5) AS rr
  FROM h3f
),
h3fix AS (
  SELECT {id_cols}, v_cents, face, fy,
         abs(rq - fq) AS dq, abs(ry - fy) AS dy, abs(rr - fr) AS dr,
         rq, ry, rr
  FROM h3r
),
h3q AS (
  SELECT {id_cols}, v_cents, face, dy, dr, ry, rr,
         CASE WHEN dq > dy AND dq > dr THEN -ry - rr ELSE rq END AS q,
         (dq > dy AND dq > dr) AS fixed_q
  FROM h3fix
),
h3cells AS (
  SELECT {id_cols}, v_cents,
         CAST(face AS BIGINT) * {_FACE_MUL}
           + (CAST(q AS BIGINT) + {_OFF}) * {_MUL}
           + (CAST(CASE WHEN NOT fixed_q AND dr >= dy THEN -q - ry ELSE rr END
                   AS BIGINT) + {_OFF}) AS h3cell
  FROM h3q
)""".strip()
