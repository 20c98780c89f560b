"""CQL (ECQL subset) string parser: filter semantics + index-constraint
extraction (OptimalCQLQuery.createOptimalQuery analog)."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.query.cql import parse_cql


@pytest.fixture(scope="module")
def pts(ray_session):
    import ray

    rng = np.random.default_rng(9)
    n = 4000
    t = pa.table(
        {
            "pid": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
            "v": rng.integers(0, 100, n),
            "name": [f"site-{i % 7}" for i in range(n)],
            "ts": pa.array(
                (np.datetime64("2024-01-01") + rng.integers(0, 40, n).astype("timedelta64[D]")).astype(
                    "datetime64[us]"
                )
            ),
        }
    )
    return t


def _run(cql, t, **kw):
    import ray

    q = parse_cql(cql)
    return q.apply(ray.data.from_arrow(t), **kw).to_pandas()


def test_bbox_and_attribute(pts):
    out = _run("BBOX(geom, -30, 10, 40, 60) AND v >= 50", pts)
    lon, lat, v = (pts.column(c).to_numpy() for c in ("lon", "lat", "v"))
    want = ((lon >= -30) & (lon <= 40) & (lat >= 10) & (lat <= 60) & (v >= 50)).sum()
    assert len(out) == want
    q = parse_cql("BBOX(geom, -30, 10, 40, 60) AND v >= 50")
    assert q.spatial is not None and q.spatial.bbox() == (-30, 10, 40, 60)


def test_intersects_polygon(pts):
    out = _run("INTERSECTS(geom, 'POLYGON((0 0, 40 0, 0 40, 0 0))')", pts)
    from geowave_ray.geom.predicates import points_in_polygon
    from geowave_ray.query.cql import _parse_wkt

    g = _parse_wkt("POLYGON((0 0, 40 0, 0 40, 0 0))")
    lon, lat = pts.column("lon").to_numpy(), pts.column("lat").to_numpy()
    want = points_in_polygon(lon, lat, g, include_boundary=True).sum()
    assert len(out) == want


def test_in_like_null_between(pts):
    out = _run("name IN ('site-1', 'site-3') AND v BETWEEN 10 AND 20", pts)
    import pandas as pd

    df = pts.to_pandas()
    want = df[df["name"].isin(["site-1", "site-3"]) & df["v"].between(10, 20)]
    assert len(out) == len(want)
    out2 = _run("name LIKE 'site-1%'", pts)
    assert len(out2) == (df["name"] == "site-1").sum()  # site-1x doesn't exist
    out3 = _run("name IS NOT NULL", pts)
    assert len(out3) == len(df)


def test_or_not_precedence(pts):
    out = _run("v < 5 OR v > 95 AND name = 'site-2'", pts)
    df = pts.to_pandas()
    want = (df["v"] < 5) | ((df["v"] > 95) & (df["name"] == "site-2"))
    assert len(out) == want.sum()
    out2 = _run("NOT (v < 5 OR v > 95)", pts)
    assert len(out2) == ((df["v"] >= 5) & (df["v"] <= 95)).sum()


def test_temporal_during(pts):
    cqlq = "ts DURING '2024-01-10T00:00:00/2024-01-20T00:00:00' AND v > 10"
    q = parse_cql(cqlq)
    assert q.time_range is not None
    out = _run(cqlq, pts, time_col="ts")
    df = pts.to_pandas()
    lo = np.datetime64("2024-01-10T00:00:00")
    hi = np.datetime64("2024-01-20T00:00:00")
    want = ((df["ts"] >= lo) & (df["ts"] <= hi) & (df["v"] > 10)).sum()
    assert len(out) == want


def test_dwithin_point(pts):
    out = _run("DWITHIN(geom, 'POINT(10 20)', 5, 'degrees')", pts)
    lon, lat = pts.column("lon").to_numpy(), pts.column("lat").to_numpy()
    want = ((np.abs(lon - 10) <= 5) & (np.abs(lat - 20) <= 5)).sum()
    assert len(out) == want
