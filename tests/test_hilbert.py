"""Hilbert kernel parity tests.

Vectors ported from reference
core/geotime/src/test/.../sfc/hilbert/HilbertSFCTest.java:28-180
(dims (lat 31 bits, lon 31 bits), keys read as big-endian int64).
"""

import numpy as np
import pytest

from geowave_ray.index.dimensions import (
    LatitudeDimension,
    LongitudeDimension,
    norm_to_cell_point,
    norm_to_cell_query_max,
    norm_to_cell_query_min,
)
from geowave_ray.index.hilbert import HilbertCurve, merge_ranges
from geowave_ray.index.zorder import ZOrderCurve

BITS = 31
BINS = 1 << BITS


def _encode_latlon(lat, lon):
    """HilbertSFCTest layout: dims (lat, lon), both 31 bits, full-range lat."""
    latd = LatitudeDimension(half_range=False)
    lond = LongitudeDimension()
    c = HilbertCurve(2, BITS)
    coords = [
        norm_to_cell_point(latd.normalize(np.asarray([lat], dtype=np.float64)), BINS),
        norm_to_cell_point(lond.normalize(np.asarray([lon], dtype=np.float64)), BINS),
    ]
    return int(c.encode(coords)[0])


def test_max_value():
    assert _encode_latlon(90.0, 180.0) == 3074457345618258602


def test_min_value():
    assert _encode_latlon(-90.0, -180.0) == 0


def test_centroid_value():
    assert _encode_latlon(0.0, 0.0) == 768614336404564650


def test_lexicographic_ordering():
    assert _encode_latlon(-90, -180) < _encode_latlon(90, 180)


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    c = HilbertCurve(2, BITS)
    x = rng.integers(0, BINS, 1000, dtype=np.uint64)
    y = rng.integers(0, BINS, 1000, dtype=np.uint64)
    h = c.encode([x, y])
    dx, dy = c.decode(h)
    np.testing.assert_array_equal(x, dx)
    np.testing.assert_array_equal(y, dy)


def test_adjacency_small():
    """Hilbert property: consecutive indices are adjacent cells."""
    c = HilbertCurve(2, 5)
    n = 1 << 5
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    h = c.encode([xs.ravel(), ys.ravel()])
    order = np.argsort(h)
    x_sorted = xs.ravel()[order].astype(np.int64)
    y_sorted = ys.ravel()[order].astype(np.int64)
    d = np.abs(np.diff(x_sorted)) + np.abs(np.diff(y_sorted))
    assert (d == 1).all()


def test_3d_roundtrip():
    c = HilbertCurve(3, 20)
    rng = np.random.default_rng(7)
    coords = [rng.integers(0, 1 << 20, 500, dtype=np.uint64) for _ in range(3)]
    h = c.encode(coords)
    back = c.decode(h)
    for a, b in zip(coords, back):
        np.testing.assert_array_equal(a, b)


def _query_cells(lo, hi, dim, bins):
    a = int(norm_to_cell_query_min(np.float64(dim.normalize(np.asarray([lo]))[0]), bins))
    b = int(norm_to_cell_query_max(np.float64(dim.normalize(np.asarray([hi]))[0]), bins))
    return a, max(a, b)


def test_decompose_one_range():
    """HilbertSFCTest.testDecomposeQuery_2DSpatialOneIndexFilter: dims
    (lon, lat), box (55..57)x(25..27), maxRanges=1 -> exactly 1 range."""
    c = HilbertCurve(2, BITS)
    lond, latd = LongitudeDimension(), LatitudeDimension(half_range=False)
    xlo, xhi = _query_cells(55, 57, lond, BINS)
    ylo, yhi = _query_cells(25, 27, latd, BINS)
    ranges = c.decompose_range([xlo, ylo], [xhi, yhi], max_ranges=1)
    assert len(ranges) == 1


def test_decompose_twenty_ranges():
    """testDecomposeQuery_2DSpatialTwentyIndexFilters: box (10..57)x(25..50),
    maxRanges=20 -> exactly 20 ranges."""
    c = HilbertCurve(2, BITS)
    lond, latd = LongitudeDimension(), LatitudeDimension(half_range=False)
    xlo, xhi = _query_cells(10, 57, lond, BINS)
    ylo, yhi = _query_cells(25, 50, latd, BINS)
    ranges = c.decompose_range([xlo, ylo], [xhi, yhi], max_ranges=20)
    assert len(ranges) == 20


def test_decompose_covers_box():
    """Every cell of the box is inside some range; ranges sorted non-overlapping."""
    c = HilbertCurve(2, 6)
    mins, maxs = [13, 7], [45, 51]
    ranges = c.decompose_range(mins, maxs, max_ranges=-1)
    assert ranges == sorted(ranges)
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi < blo
    # exact cover check at 6 bits: decode every range member
    members = np.concatenate(
        [np.arange(lo, hi + 1, dtype=np.uint64) for lo, hi in ranges]
    )
    xs, ys = c.decode(members)
    inside = (
        (xs >= mins[0]) & (xs <= maxs[0]) & (ys >= mins[1]) & (ys <= maxs[1])
    )
    # with max_ranges=-1 and a small grid the decomposition must be exact
    assert inside.all()
    assert inside.sum() == (maxs[0] - mins[0] + 1) * (maxs[1] - mins[1] + 1)


def test_merge_ranges():
    assert merge_ranges([(0, 1), (2, 3), (10, 12)]) == [(0, 3), (10, 12)]
    assert merge_ranges([(0, 1), (4, 5), (100, 101)], max_ranges=2) == [
        (0, 5),
        (100, 101),
    ]


def test_zorder_roundtrip():
    c = ZOrderCurve(2, 20)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 20, 300, dtype=np.uint64)
    y = rng.integers(0, 1 << 20, 300, dtype=np.uint64)
    dx, dy = c.decode(c.encode([x, y]))
    np.testing.assert_array_equal(x, dx)
    np.testing.assert_array_equal(y, dy)


def test_zorder_monotone_per_dim():
    c = ZOrderCurve(2, 4)
    # fixing y, z increases with x
    x = np.arange(16, dtype=np.uint64)
    z = c.encode([x, np.zeros(16, dtype=np.uint64)])
    assert (np.diff(z.astype(np.int64)) > 0).all()


def test_longitude_definition_vectors():
    """Vectors ported from reference LongitudeDefinitionTest.java: in-bounds
    ranges pass through; out-of-range RANGE endpoints wrap (dateline
    crossing east/west -> two bins); single values clamp; the JTS
    empty-geometry envelope (0, -1) produces no ranges."""
    lond = LongitudeDimension()

    def denorm(r):
        return (r.norm_lo * 360.0 - 180.0, r.norm_hi * 360.0 - 180.0)

    # testNormalizeWithinBoundsRanges: (10, 100) -> itself
    rs = lond.get_normalized_ranges(10.0, 100.0)
    assert len(rs) == 1 and denorm(rs[0]) == (10.0, 100.0)
    # testNormalizeWithinBoundsValue: wrap 200 -> -160, -200 -> 160
    assert lond.wrap_longitude(200.0) == -160.0
    assert lond.wrap_longitude(-200.0) == 160.0
    # testNormalizeDateLineCrossingEast: (150, 200) -> (-180,-160), (150,180)
    rs = lond.get_normalized_ranges(150.0, 200.0)
    assert len(rs) == 2
    assert denorm(rs[0]) == (-180.0, -160.0)
    assert denorm(rs[1]) == (150.0, 180.0)
    # testNormalizeDateLineCrossingWest: (-200, -170) -> (-180,-170), (160,180)
    rs = lond.get_normalized_ranges(-200.0, -170.0)
    assert len(rs) == 2
    assert denorm(rs[0]) == (-180.0, -170.0)
    assert denorm(rs[1]) == (160.0, 180.0)
    # single value clamps (reference super() path)
    rs = lond.get_normalized_ranges(200.0, 200.0)
    assert len(rs) == 1 and denorm(rs[0]) == (180.0, 180.0)
    # JTS empty-geometry envelope -> empty scan
    assert lond.get_normalized_ranges(0.0, -1.0) == []
