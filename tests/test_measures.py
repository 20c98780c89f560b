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
