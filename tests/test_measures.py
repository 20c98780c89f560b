"""Polygon measure kernels (geom/measures.py)."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def test_ring_measures_known_shapes():
    from geowave_ray.geom.measures import ring_measures

    # unit square (ccw) then a 3-4 right triangle, flattened
    xs = np.array([0, 1, 1, 0, 0, 3, 0], dtype=np.int64)
    ys = np.array([0, 0, 1, 1, 0, 0, 4], dtype=np.int64)
    starts = np.array([0, 4], dtype=np.int64)
    m = ring_measures(starts, xs, ys)
    assert list(m["n_vertices"]) == [4, 3]
    assert list(m["area2"]) == [2, 12]  # 2*area: 2*1, 2*6
    # square centroid (0.5, 0.5): num / (3*area2) = 3/6
    assert m["cx_num"][0] / (3 * m["area2"][0]) == pytest.approx(0.5)
    assert m["cy_num"][0] / (3 * m["area2"][0]) == pytest.approx(0.5)
    # triangle centroid (1, 4/3)
    assert m["cx_num"][1] / (3 * m["area2"][1]) == pytest.approx(1.0)
    assert m["cy_num"][1] / (3 * m["area2"][1]) == pytest.approx(4 / 3)
    assert (m["minx"][1], m["maxx"][1], m["miny"][1], m["maxy"][1]) == (0, 3, 0, 4)


def test_ring_measures_clockwise_negative():
    from geowave_ray.geom.measures import ring_measures

    xs = np.array([0, 0, 1, 1], dtype=np.int64)
    ys = np.array([0, 1, 1, 0], dtype=np.int64)
    m = ring_measures(np.array([0], dtype=np.int64), xs, ys)
    assert m["area2"][0] == -2  # clockwise winding


def test_polygon_measures_stage_fixed_point(ray_session):
    from geowave_ray.geom.measures import polygon_measures
    from geowave_ray.geom.wkb import Polygon, to_wkb

    shell = np.array([[0.0, 0.0], [2.5, 0.0], [2.5, 1.5], [0.0, 1.5], [0.0, 0.0]])
    t = pa.table(
        {
            "poly_id": pa.array([7], type=pa.int64()),
            "wkb": pa.array([to_wkb(Polygon(shell))], type=pa.binary()),
        }
    )
    out = polygon_measures(ray.data.from_arrow(t), scale=10).to_pandas()
    assert out.loc[0, "area2"] == 2 * 25 * 15  # (2.5*10) * (1.5*10) * 2
    assert out.loc[0, "n_vertices"] == 4

    from geowave_ray.geom.wkb import Point

    bad = pa.table(
        {
            "poly_id": pa.array([1], type=pa.int64()),
            "wkb": pa.array([to_wkb(Point(0.0, 0.0))], type=pa.binary()),
        }
    )
    with pytest.raises(Exception, match="polygon_measures"):
        polygon_measures(ray.data.from_arrow(bad)).to_pandas()

def test_ring_measures_degree_range_no_overflow():
    """Degree-range coordinates at scale 1e5 previously wrapped the naive
    int64 centroid numerators; the translated form must match an exact
    Python-int shoelace."""
    from geowave_ray.geom.measures import ring_measures

    # a 1-degree box near (179, 85) scaled by 1e5
    x0, y0, ext = 179_0000_0, 85_0000_0, 100_000  # ints at scale 1e5
    xs = np.array([x0, x0 + ext, x0 + ext, x0], dtype=np.int64)
    ys = np.array([y0, y0, y0 + ext, y0 + ext], dtype=np.int64)
    m = ring_measures(np.array([0], dtype=np.int64), xs, ys)

    def exact(xs, ys):
        k = len(xs)
        a2 = cx = cy = 0
        for i in range(k):
            j = (i + 1) % k
            cr = int(xs[i]) * int(ys[j]) - int(xs[j]) * int(ys[i])
            a2 += cr
            cx += (int(xs[i]) + int(xs[j])) * cr
            cy += (int(ys[i]) + int(ys[j])) * cr
        return a2, cx, cy

    a2, cx, cy = exact(xs, ys)
    assert int(m["area2"][0]) == a2
    assert int(m["cx_num"][0]) == cx
    assert int(m["cy_num"][0]) == cy
    # translated intermediates stay far below int64 (the naive form's
    # per-term products exceed 2**63 here and relied on modular
    # wraparound cancelling; the translated form never wraps at all)
    assert abs(cx) < 2**61 and abs(a2) < 2**61


def test_ring_measures_overflow_guard_raises():
    from geowave_ray.geom.measures import ring_measures

    big = np.int64(2**31)
    xs = np.array([0, big, big, 0], dtype=np.int64)
    ys = np.array([0, 0, big, big], dtype=np.int64)
    with pytest.raises(ValueError, match="int64"):
        ring_measures(np.array([0], dtype=np.int64), xs, ys)


def test_simplify_wkb_dp(ray_session):
    """Ingest-time DP simplification (GeometrySimpOptionProvider.java:34-48
    analog): collinear interior vertices drop, far vertices survive, the
    --simpVertMin gate passes small geometries through, rings keep >= 4
    points, and Points are untouched."""
    import ray

    import numpy as np
    import pyarrow as pa

    from geowave_ray.geom.simplify import dp_keep_mask, simplify_geometry, simplify_wkb
    from geowave_ray.geom.wkb import LineString, Point, Polygon, parse_wkb, to_wkb

    # nearly-collinear line: interior points within tolerance drop
    line = LineString(np.array([[0, 0], [1, 0.001], [2, -0.001], [3, 0], [3, 5]], float))
    poly = Polygon(np.array([[0, 0], [4, 0], [4, 4], [2, 4.001], [0, 4], [0, 0]], float))
    tiny = LineString(np.array([[0, 0], [5, 5]], float))
    pt = Point(7.0, 8.0)
    t = pa.table(
        {
            "gid": [1, 2, 3, 4],
            "wkb": pa.array(
                [to_wkb(line), to_wkb(poly), to_wkb(tiny), to_wkb(pt)],
                type=pa.large_binary(),
            ),
        }
    )
    out = (
        simplify_wkb(ray.data.from_arrow(t), "wkb", tolerance=0.1, min_vertices=3)
        .to_pandas()
        .sort_values("gid")
    )
    g1 = parse_wkb(out.iloc[0]["wkb"])
    np.testing.assert_allclose(g1.coords, [[0, 0], [3, 0], [3, 5]])
    g2 = parse_wkb(out.iloc[1]["wkb"])
    np.testing.assert_allclose(
        g2.shell, [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    )
    # min_vertices=3 gate: the 2-point line is untouched
    g3 = parse_wkb(out.iloc[2]["wkb"])
    np.testing.assert_allclose(g3.coords, tiny.coords)
    g4 = parse_wkb(out.iloc[3]["wkb"])
    assert (g4.x, g4.y) == (7.0, 8.0)
    # ring validity floor: an aggressive tolerance keeps the original ring
    small_ring = Polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float))
    s = simplify_geometry(small_ring, tolerance=100.0)
    np.testing.assert_allclose(s.shell, small_ring.shell)
    # int64 exactness: kernel matches itself under dtype change on ints
    xi = np.array([0, 1, 2, 3, 3], dtype=np.int64)
    yi = np.array([0, 0, 0, 0, 5], dtype=np.int64)
    np.testing.assert_array_equal(
        dp_keep_mask(xi, yi, 1), dp_keep_mask(xi.astype(float), yi.astype(float), 1.0)
    )
