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
