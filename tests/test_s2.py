"""Unit tests for the pure-NumPy S2 cell scheme (index/s2.py) and the
geohash encoder's public test vectors (index/geohash.py).

Reference behavior: core/geotime/.../binning/S2BinningHelper.java and
GeohashBinningHelper.java (cell schemes of the reference's spatial
binning facade).  No s2/geohash library exists in this container, so the
checks are structural invariants of the published algorithms plus known
public vectors.
"""

import numpy as np
import pytest

from geowave_ray.index.s2 import (
    S2Scheme,
    _face_uv,
    _hilbert_pos,
    _xyz,
    s2_cell_ids,
    s2_tokens,
)

# FaceUVtoXYZ (s2coords): inverse of _face_uv, used for round-trip checks
_INV = {
    0: lambda u, v: (np.ones_like(u), u, v),
    1: lambda u, v: (-u, np.ones_like(u), v),
    2: lambda u, v: (-u, -v, np.ones_like(u)),
    3: lambda u, v: (-np.ones_like(u), -v, -u),
    4: lambda u, v: (v, -np.ones_like(u), -u),
    5: lambda u, v: (v, u, -np.ones_like(u)),
}


def _sample(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_face_uv_roundtrip():
    lon, lat = _sample()
    x, y, z = _xyz(lon, lat)
    face, u, v = _face_uv(x, y, z)
    assert face.min() >= 0 and face.max() <= 5
    assert np.abs(u).max() <= 1.0 + 1e-12 and np.abs(v).max() <= 1.0 + 1e-12
    for f in range(6):
        m = face == f
        xi, yi, zi = _INV[f](u[m], v[m])
        norm = np.sqrt(xi * xi + yi * yi + zi * zi)
        dot = (xi * x[m] + yi * y[m] + zi * z[m]) / norm
        np.testing.assert_allclose(dot, 1.0, atol=1e-12)


def test_parent_child_prefix():
    """Level-L id is the 2-bit prefix of the level-(L+1) id on every face."""
    lon, lat = _sample()
    for level in (1, 7, 15, 29):
        a = s2_cell_ids(lon, lat, level).view(np.uint64)
        b = s2_cell_ids(lon, lat, level + 1).view(np.uint64)
        sa, sb = 2 * (30 - level) + 1, 2 * (30 - level - 1) + 1
        pos_a = (a >> np.uint64(sa)) & np.uint64((1 << (2 * level)) - 1)
        pos_b = (b >> np.uint64(sb)) & np.uint64((1 << (2 * (level + 1))) - 1)
        assert (a >> np.uint64(61) == b >> np.uint64(61)).all()
        assert (pos_a == pos_b >> np.uint64(2)).all()


def test_hilbert_bijective_and_continuous():
    """On each face the curve visits every (i,j) exactly once and each
    step moves to an edge-adjacent cell (Hilbert continuity)."""
    level = 5
    n = 1 << level
    ii, jj = np.meshgrid(
        np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64), indexing="ij"
    )
    for face in range(6):
        fc = np.full(n * n, face, dtype=np.int64)
        pos = _hilbert_pos(fc, ii.ravel(), jj.ravel(), level)
        assert len(np.unique(pos)) == n * n
        order = np.argsort(pos)
        io, jo = ii.ravel()[order], jj.ravel()[order]
        steps = np.abs(np.diff(io)) + np.abs(np.diff(jo))
        assert (steps == 1).all()


def test_canonical_id_layout():
    """lsb marker set at 2*(30-level); face bits occupy 61..63; the
    face-0 center cell at level 1 is pos 2 under the canonical traversal
    ((0,0) maps to child (1,1) = 3rd visit of orientation 0)."""
    ids = s2_cell_ids(np.array([0.0]), np.array([0.0]), 1).view(np.uint64)
    assert ids[0] == (np.uint64(2) << np.uint64(59)) | (np.uint64(1) << np.uint64(58))
    lon, lat = _sample(512)
    for level in (4, 12):
        h = s2_cell_ids(lon, lat, level).view(np.uint64)
        lsb = np.uint64(1) << np.uint64(2 * (30 - level))
        assert ((h & lsb) == lsb).all()
        assert ((h & (lsb - np.uint64(1))) == 0).all()
        assert (h >> np.uint64(61) <= 5).all()


def test_face_centers_land_on_their_face():
    centers = [(0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 90.0, 2),
               (180.0, 0.0, 3), (-90.0, 0.0, 4), (0.0, -90.0, 5)]
    lon = np.array([c[0] for c in centers])
    lat = np.array([c[1] for c in centers])
    faces = s2_cell_ids(lon, lat, 10).view(np.uint64) >> np.uint64(61)
    assert faces.tolist() == [c[2] for c in centers]


def test_tokens():
    ids = s2_cell_ids(np.array([0.0]), np.array([0.0]), 1)
    assert s2_tokens(ids)[0] == "14"
    # trailing zeros stripped, lowercase hex
    lon, lat = _sample(64)
    toks = s2_tokens(s2_cell_ids(lon, lat, 12))
    assert all(not t.endswith("0") and 1 <= len(t) <= 16 for t in toks)


def test_scheme_facade_matches_function():
    lon, lat = _sample(256)
    np.testing.assert_array_equal(
        S2Scheme(level=9).cell_of(lon, lat), s2_cell_ids(lon, lat, 9)
    )


def test_level_validation():
    with pytest.raises(ValueError):
        s2_cell_ids(np.array([0.0]), np.array([0.0]), 0)
    with pytest.raises(ValueError):
        s2_cell_ids(np.array([0.0]), np.array([0.0]), 31)


def test_geohash_public_vectors():
    """Niemeyer geohash test vectors (public: geohash.org examples)."""
    from geowave_ray.index.geohash import geohash_strings

    cases = [
        (-5.6, 42.6, "ezs42"),          # the canonical Wikipedia example
        (-99.999, 57.64911, None),      # precision-9 case below
    ]
    got = geohash_strings(
        np.array([c[0] for c in cases]), np.array([c[1] for c in cases]), 5
    )
    assert got[0] == "ezs42"
    got9 = geohash_strings(np.array([-5.603027]), np.array([42.583008]), 9)
    assert got9[0].startswith("ezs42")


# ---------------------------------------------------------------- hexgrid


def test_hex_nearest_center():
    """Every point's assigned hex center is the closest among the cell
    and its 6 neighbors (the defining property of hex binning)."""
    from geowave_ray.index.hexgrid import HexScheme, hex_cells

    lon, lat = _sample(3000, seed=5)
    size = 3.0
    q, r = hex_cells(lon, lat, size)
    sch = HexScheme(size)
    cx, cy = sch.center(q, r)
    d0 = (lon - cx) ** 2 + (lat - cy) ** 2
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nx, ny = sch.center(q + dq, r + dr)
        dn = (lon - nx) ** 2 + (lat - ny) ** 2
        assert np.all(d0 <= dn + 1e-12)


def test_hex_adjacency_and_packing():
    from geowave_ray.index.hexgrid import HexScheme

    sch = HexScheme(1.0)
    nbrs = sch.neighbors(3, -2)
    assert len(set(nbrs)) == 6 and (3, -2) not in nbrs
    # packed ids collision-free over a q/r window
    qs, rs = np.meshgrid(np.arange(-50, 50), np.arange(-50, 50))
    lonc, latc = sch.center(qs.ravel(), rs.ravel())
    ids = sch.cell_of(lonc, latc)
    assert len(np.unique(ids)) == len(ids)


def test_hex_center_roundtrip():
    """Cell centers map back to their own cell."""
    from geowave_ray.index.hexgrid import HexScheme, hex_cells

    sch = HexScheme(2.0)
    qs = np.arange(-30, 30, dtype=np.int64)
    rs = (qs * 7 % 11) - 5
    lonc, latc = sch.center(qs, rs)
    q2, r2 = hex_cells(lonc, latc, 2.0)
    np.testing.assert_array_equal(q2, qs)
    np.testing.assert_array_equal(r2, rs)


def test_s2_hierarchy_bit_algebra():
    """parent(parent-range) contains child range; child id sits inside its
    own range; the trailing-bit arithmetic never carries across blocks."""
    import numpy as np

    from geowave_ray.index.s2 import s2_cell_ids

    level = 6
    lon = np.array([-122.42, 0.0, 179.95, -179.95, 13.37])
    lat = np.array([37.77, 0.0, -0.1, 0.1, 52.52])
    u = s2_cell_ids(lon, lat, level).view(np.uint64)
    lsb_c = np.uint64(1) << np.uint64(2 * (30 - level))
    lsb_p = lsb_c << np.uint64(4)
    parent = (u & ~(np.uint64(2) * lsb_p - np.uint64(1))) | lsb_p
    # child range within parent range (unsigned compare)
    assert ((u - (lsb_c - np.uint64(1))) >= (parent - (lsb_p - np.uint64(1)))).all()
    assert ((u + (lsb_c - np.uint64(1))) <= (parent + (lsb_p - np.uint64(1)))).all()
    # the parent's trailing one sits exactly two levels up
    assert ((parent & -parent.astype(np.int64).view(np.uint64)) == lsb_p).all()
