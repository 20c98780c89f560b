"""Spatial predicate truth table — ported from reference
core/geotime/src/test/.../SpatialQueryTest.java:60-157.

Query polygon (24,33)-(28,37); six data geometries; ops applied as
query.op(data).
"""

import numpy as np
import pytest

from geowave_ray.geom import (
    BBoxGrid,
    LineString,
    Point,
    Polygon,
    box_polygon,
    evaluate,
    parse_wkb,
    points_in_polygon,
    to_wkb,
)

QUERY = box_polygon(24, 33, 28, 37)

DATA = [
    LineString(np.array([[22, 32], [25, 36]], dtype=float)),  # crossing
    LineString(np.array([[25, 33.5], [26, 34]], dtype=float)),  # within
    LineString(np.array([[21, 33.5], [23, 34]], dtype=float)),  # outside
    LineString(np.array([[28, 33], [30, 34]], dtype=float)),  # corner touch
    box_polygon(25, 34, 27, 36),  # contained polygon
    box_polygon(24, 33, 28, 37),  # identical polygon
]

TRUTH = {
    "CONTAINS": [False, True, False, False, True, True],
    "OVERLAPS": [False, False, False, False, False, False],
    "INTERSECTS": [True, True, False, True, True, True],
    "DISJOINT": [False, False, True, False, False, False],
    "TOUCHES": [False, False, False, True, False, False],
    "CROSSES": [True, False, False, False, False, False],
    "WITHIN": [False, False, False, False, False, True],
    "EQUALS": [False, False, False, False, False, True],
}


@pytest.mark.parametrize("op", sorted(TRUTH))
def test_truth_table(op):
    got = [evaluate(op, QUERY, g) for g in DATA]
    assert got == TRUTH[op], f"{op}: {got}"


def test_wkb_roundtrip():
    for g in DATA + [Point(1.5, -2.5)]:
        back = parse_wkb(to_wkb(g))
        assert type(back) is type(g)
        if isinstance(g, LineString):
            np.testing.assert_array_equal(back.coords, g.coords)
        elif isinstance(g, Polygon):
            np.testing.assert_array_equal(back.shell, g.shell)


def test_wkb_big_endian():
    import struct

    # big-endian point WKB
    data = struct.pack(">BIdd", 0, 1, 3.25, -7.5)
    g = parse_wkb(data)
    assert isinstance(g, Point) and g.x == 3.25 and g.y == -7.5


def test_points_in_polygon_vectorized_matches_scalar():
    rng = np.random.default_rng(9)
    # non-convex polygon with a hole
    shell = np.array(
        [[0, 0], [10, 0], [10, 10], [5, 5], [0, 10], [0, 0]], dtype=float
    )
    hole = np.array([[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]], dtype=float)
    poly = Polygon(shell, [hole])
    xs = rng.uniform(-2, 12, 2000)
    ys = rng.uniform(-2, 12, 2000)
    vec = points_in_polygon(xs, ys, poly, include_boundary=True)
    from geowave_ray.geom.predicates import locate_point

    for i in range(0, 2000, 37):
        scalar = locate_point(xs[i], ys[i], poly) != "E"
        assert vec[i] == scalar, (xs[i], ys[i])


def test_points_in_polygon_boundary():
    poly = box_polygon(0, 0, 1, 1)
    xs = np.array([0.0, 0.5, 1.0, 1.0000001, 0.5])
    ys = np.array([0.0, 0.5, 1.0, 0.5, -0.0000001])
    got = points_in_polygon(xs, ys, poly)
    assert got.tolist() == [True, True, True, False, False]


def test_bbox_grid_candidates():
    rng = np.random.default_rng(4)
    n = 500
    cx, cy = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
    w, h = rng.uniform(0.5, 5, n), rng.uniform(0.5, 5, n)
    boxes = np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)
    grid = BBoxGrid(boxes)
    xs, ys = rng.uniform(-5, 105, 3000), rng.uniform(-5, 105, 3000)
    pi, bi = grid.query_points(xs, ys)
    # candidates == brute force bbox hits
    brute = (
        (xs[:, None] >= boxes[None, :, 0])
        & (xs[:, None] <= boxes[None, :, 2])
        & (ys[:, None] >= boxes[None, :, 1])
        & (ys[:, None] <= boxes[None, :, 3])
    )
    want = set(zip(*np.nonzero(brute)))
    got = set(zip(pi.tolist(), bi.tolist()))
    assert got == want


def test_bbox_grid_box_query():
    boxes = np.array([[0, 0, 1, 1], [5, 5, 6, 6], [0.5, 0.5, 2, 2]], dtype=float)
    grid = BBoxGrid(boxes)
    qi, bi = grid.query_boxes(np.array([[0.9, 0.9, 1.2, 1.2]]))
    assert set(bi.tolist()) == {0, 2}
