"""Unit tests for the icosahedral aperture-7 hex scheme (index/h3grid.py).

Reference behavior: core/geotime/.../binning/H3BinningHelper.java:41-185
(H3 binning of the reference's spatial binning facade).  The h3 library is
banned in this container, so the checks are structural invariants of the
published H3 construction (icosahedron + gnomonic + aperture-7 Class-III
lattice) plus a bit-exact DuckDB replay of the full encode chain.
"""

import math

import numpy as np
import pytest

from geowave_ray.index.h3grid import (
    ALPHA,
    BASE_SIZE,
    FACE_CENTERS,
    FACE_E1,
    FACE_E2,
    H3Grid,
    h3_cell_cte,
    h3_cell_ids,
    h3_cells,
    res_rotation,
    res_size,
)


def _sample(n=4000, seed=13):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_icosahedron_frames():
    """20 unit-norm face centers with orthonormal (e1, e2) tangent frames,
    pairwise-distinct, at the regular icosahedron's face-center angle."""
    assert FACE_CENTERS.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(FACE_CENTERS, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(FACE_E1, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(FACE_E2, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose((FACE_E1 * FACE_CENTERS).sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose((FACE_E2 * FACE_CENTERS).sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose((FACE_E1 * FACE_E2).sum(1), 0.0, atol=1e-12)
    # neighbor face centers of a regular icosahedron meet at
    # arccos(sqrt(5)/3) ~ 41.81 deg; centers are distinct
    dots = FACE_CENTERS @ FACE_CENTERS.T
    np.fill_diagonal(dots, -2.0)
    np.testing.assert_allclose(dots.max(axis=1), math.sqrt(5.0) / 3.0, atol=1e-12)


def test_all_faces_used_and_gnomonic_bounded():
    """A global sample touches all 20 faces; gnomonic coords stay within
    the face circumradius tan(~37.38 deg) so the int64 pack never wraps."""
    lon, lat = _sample(20000)
    face, q, r = h3_cells(lon, lat, 4)
    assert set(np.unique(face)) == set(range(20))
    # pack bound: |q|,|r| < 2**20 at the deepest supported res
    f2, q2, r2 = h3_cells(lon, lat, 9)
    assert max(np.abs(q2).max(), np.abs(r2).max()) < (1 << 20)


def test_pack_unpack_roundtrip():
    lon, lat = _sample()
    for res in (0, 1, 3, 6):
        g = H3Grid(res)
        ids = g.cell_of(lon, lat)
        face, q, r = H3Grid.unpack(ids)
        f0, q0, r0 = h3_cells(lon, lat, res)
        np.testing.assert_array_equal(face, f0)
        np.testing.assert_array_equal(q, q0)
        np.testing.assert_array_equal(r, r0)


def test_center_roundtrip():
    """cell -> center -> cell is the identity wherever the hex center maps
    back onto the same icosahedron face (cells split at face edges carry
    their face in the id; their centers may project onto the neighbor)."""
    lon, lat = _sample(6000)
    # edge-straddling cells thin out as res grows (perimeter/area scaling)
    for res, min_interior in ((1, 0.4), (2, 0.6), (4, 0.85)):
        g = H3Grid(res)
        ids = np.unique(g.cell_of(lon, lat))
        clon, clat = g.center(ids)
        face, _, _ = H3Grid.unpack(ids)
        back = g.cell_of(clon, clat)
        bface, _, _ = H3Grid.unpack(back)
        same_face = bface == face
        assert same_face.mean() > min_interior, (res, same_face.mean())
        np.testing.assert_array_equal(back[same_face], ids[same_face])


def test_aperture_seven():
    """Each resolution step shrinks the lattice pitch by sqrt(7) and the
    cell population over a fixed dense region grows ~7x (the aperture)."""
    assert res_size(3) * math.sqrt(7.0) == pytest.approx(res_size(2), rel=1e-15)
    ca, sa = res_rotation(1)
    assert math.atan2(sa, ca) == pytest.approx(ALPHA)
    assert res_rotation(2) == (1.0, 0.0)
    rng = np.random.default_rng(5)
    # dense sample well inside one face (around a face center)
    c = FACE_CENTERS[7]
    clat = math.degrees(math.asin(c[2]))
    clon = math.degrees(math.atan2(c[1], c[0]))
    lon = rng.uniform(clon - 12, clon + 12, 400_000)
    lat = rng.uniform(clat - 12, clat + 12, 400_000)
    n3 = len(np.unique(h3_cell_ids(lon, lat, 3)))
    n4 = len(np.unique(h3_cell_ids(lon, lat, 4)))
    assert 5.5 < n4 / n3 < 8.5


def test_equal_area_on_sphere():
    """The whole point of the icosahedral scheme vs the equal-angle hex
    plane: cell occupancy per unit SPHERE area is near-uniform from the
    equator to the poles.  With a uniform-on-the-sphere sample, mean
    points-per-cell among polar-cap cells matches the equatorial band
    within 35% (the equal-angle hexgrid is off by >400% at lat 80)."""
    rng = np.random.default_rng(23)
    n = 400_000
    z = rng.uniform(-1, 1, n)
    lam = rng.uniform(-math.pi, math.pi, n)
    lat = np.degrees(np.arcsin(z))
    lon = np.degrees(lam)
    ids = h3_cell_ids(lon, lat, 3)
    polar = np.abs(lat) > 75
    equat = np.abs(lat) < 15

    def mean_occ(mask):
        _, counts = np.unique(ids[mask], return_counts=True)
        return counts.mean()

    ratio = mean_occ(polar) / mean_occ(equat)
    assert 0.65 < ratio < 1.35, ratio


def test_duckdb_mirror_bit_exact():
    """The h3_cell_cte SQL chain reproduces h3_cell_ids bit-for-bit on the
    repo's derived event lattice AND on a uniform random sample, at even
    and odd (Class-III-rotated) resolutions."""
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(31)
    ev = rng.integers(0, 1_000_000, 5000)
    us = rng.integers(0, 10_000, 5000)
    lon1 = ((ev * 7919 + us) % 36000) / 100.0 - 180.0
    lat1 = ((ev * 104729 + us * 13) % 18000) / 100.0 - 90.0
    lon2, lat2 = _sample(5000, seed=41)
    lon = np.concatenate([lon1, lon2])
    lat = np.concatenate([lat1, lat2])
    ids = np.arange(len(lon))
    con = duckdb.connect()
    import pandas as pd

    pts = pd.DataFrame(
        {"image_id": ids, "lon": lon, "lat": lat, "v_cents": np.ones_like(ids)}
    )
    con.register("pts_src", pts)
    for res in (2, 3):
        want = h3_cell_ids(lon, lat, res)
        cte = h3_cell_cte(res, "SELECT image_id, lon, lat, v_cents FROM pts_src")
        got = con.execute(
            f"WITH {cte} SELECT image_id, h3cell FROM h3cells ORDER BY image_id"
        ).fetchnumpy()
        np.testing.assert_array_equal(got["h3cell"], want, err_msg=f"res={res}")
