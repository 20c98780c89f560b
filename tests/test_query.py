"""Query planner, expression filters, GWQL-lite façade, XZ curve."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.geom.wkb import box_polygon
from geowave_ray.index.xz import XZOrderSFC
from geowave_ray.query.expressions import apply_filter, col, extract_bbox
from geowave_ray.query.gwql import parse_gwql, run_gwql
from geowave_ray.query.planner import SpatialQuery
from geowave_ray.sources.images import synth_images_table


def test_spatial_query_serialization_roundtrip():
    q = SpatialQuery(box_polygon(1, 2, 3, 4), op="CONTAINS", time_range=(10, 20))
    q2 = SpatialQuery.from_binary(q.to_binary())
    assert q2.op == "CONTAINS"
    assert q2.time_range == (10, 20)
    np.testing.assert_array_equal(q2.geometry.shell, q.geometry.shell)


def test_query_ranges_prune(ray_session):
    """(tier, cell) ranges from the planner cover exactly the cells of
    in-box points (over-inclusively)."""
    from geowave_ray.index.tiered import spatial_strategy

    strategy = spatial_strategy(31)
    q = SpatialQuery(box_polygon(10, 40, 20, 50))
    ranges = [r for r in q.query_ranges(strategy, max_ranges=200) if r.tier == 31]
    t = synth_images_table(800, with_bytes=False)
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    inside = (lon >= 10) & (lon <= 20) & (lat >= 40) & (lat <= 50)
    cells = strategy.encode_points(lon[inside], lat[inside])
    los = np.array([r.lo for r in ranges], dtype=np.uint64)
    his = np.array([r.hi for r in ranges], dtype=np.uint64)
    for c in cells:
        assert ((los <= c) & (c <= his)).any()


def test_spatial_query_apply(ray_session):
    import ray

    t = synth_images_table(1000, with_bytes=False)
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    want = int(((lon >= -30) & (lon <= 40) & (lat >= 10) & (lat <= 60)).sum())
    q = SpatialQuery(box_polygon(-30, 10, 40, 60))
    got = q.apply(ray.data.from_arrow(t)).count()
    assert got == want
    # disjoint = complement
    qd = SpatialQuery(box_polygon(-30, 10, 40, 60), op="DISJOINT")
    assert qd.apply(ray.data.from_arrow(t)).count() == 1000 - want


def test_expression_filter(ray_session):
    import ray

    t = pa.table(
        {
            "a": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "s": ["Foo", "bar", "foobar", "BAZ", "qux"],
        }
    )
    expr = (col("a") > 1) & (col("a") <= 4) & col("s").contains("ba", ignore_case=True)
    out = apply_filter(ray.data.from_arrow(t), expr).to_pandas()
    assert out["a"].tolist() == [2, 3, 4]


def test_extract_bbox():
    e = (col("lon") >= -10) & (col("lon") <= 10) & (col("lat") > 0) & (col("lat") < 45) & (col("x") == 3)
    assert extract_bbox(e) == (-10.0, 0.0, 10.0, 45.0)
    assert extract_bbox(col("x") == 3) is None


def test_gwql_parse_and_run(ray_session):
    import ray

    t = synth_images_table(500, with_bytes=False)
    tables = {"images": ray.data.from_arrow(t)}
    out = run_gwql(
        "SELECT COUNT(*) FROM images WHERE BBOX(lon, lat, -30, 10, 40, 60)", tables
    )
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    want = int(((lon >= -30) & (lon <= 40) & (lat >= 10) & (lat <= 60)).sum())
    assert out.column("count_all")[0].as_py() == want

    out2 = run_gwql(
        "SELECT image_id, lon FROM images WHERE lon BETWEEN 0 AND 10 LIMIT 5",
        {"images": ray.data.from_arrow(t)},
    )
    df = out2.to_pandas()
    assert len(df) <= 5
    assert list(df.columns) == ["image_id", "lon"]
    assert (df["lon"] >= 0).all() and (df["lon"] <= 10).all()

    plan = parse_gwql(
        "SELECT MAX(phash) AS mp FROM images WHERE INTERSECTS(lon, lat, 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')"
    )
    assert plan["spatial"] is not None
    assert plan["select"][0] == ("MAX", "phash", "mp")


def test_xz_encode_properties():
    xz = XZOrderSFC()
    # identical boxes -> identical codes; disjoint distant boxes differ
    minx = np.array([10.0, 10.0, -170.0])
    miny = np.array([10.0, 10.0, -80.0])
    maxx = np.array([11.0, 11.0, -169.0])
    maxy = np.array([11.0, 11.0, -79.0])
    codes = xz.encode_boxes(minx, miny, maxx, maxy)
    assert codes[0] == codes[1]
    assert codes[0] != codes[2]
    # the enlarged element must cover each box
    ex0, ey0, ex1, ey1 = xz.element_extent(minx, miny, maxx, maxy)
    assert (ex0 <= minx + 1e-9).all() and (ex1 >= maxx - 1e-9).all()
    assert (ey0 <= miny + 1e-9).all() and (ey1 >= maxy - 1e-9).all()
    # bigger objects land on coarser levels
    lv_small = xz.level_of(np.array([0.0]), np.array([0.0]), np.array([0.1]), np.array([0.1]))
    lv_big = xz.level_of(np.array([0.0]), np.array([0.0]), np.array([90.0]), np.array([45.0]))
    assert lv_small[0] > lv_big[0]


def test_xz_codes_unique_per_element():
    xz = XZOrderSFC(g=6)
    rng = np.random.default_rng(2)
    minx = rng.uniform(-170, 160, 300)
    miny = rng.uniform(-80, 70, 300)
    maxx = minx + rng.uniform(0.1, 8, 300)
    maxy = miny + rng.uniform(0.1, 8, 300)
    codes = xz.encode_boxes(minx, miny, maxx, maxy)
    ex = np.stack(xz.element_extent(minx, miny, maxx, maxy), axis=1)
    # same code <=> same enlarged element
    by_code = {}
    for i in range(300):
        key = int(codes[i])
        if key in by_code:
            np.testing.assert_allclose(ex[i], by_code[key], atol=1e-9)
        else:
            by_code[key] = ex[i]


def test_text_index_search(ray_session):
    import ray

    from geowave_ray.stages.textindex import build_text_index, search_text_index

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                "Hello World",
                "hello there",
                "world peace now",
                "say hello world again",
            ],
        }
    )
    src = ray.data.from_arrow(docs)
    idx = build_text_index(src, "text", "doc_id").materialize()

    begins = search_text_index(idx, "hello", "begins_with", "doc_id").to_pandas()
    assert set(begins["doc_id"]) == {1, 2}

    ends = search_text_index(idx, "now", "ends_with", "doc_id").to_pandas()
    assert set(ends["doc_id"]) == {3}

    contains = search_text_index(
        idx, "world", "contains", "doc_id",
        source_ds=ray.data.from_arrow(docs), text_col="text",
    ).to_pandas()
    assert set(contains["doc_id"]) == {1, 3, 4}


def test_wkb_query_lines_and_polygons(ray_session):
    """Golden-style vector query: stored linestrings + polygons queried with
    a box under several ops, vs brute-force predicate evaluation (mirrors
    the reference's hail/tornado_tracks ITs)."""
    import ray

    from geowave_ray.geom.predicates import evaluate
    from geowave_ray.geom.wkb import LineString, bbox_of, parse_wkb, to_wkb
    from geowave_ray.query.planner import SpatialQuery, apply_wkb_query
    from geowave_ray.sources.images import synth_zones_table

    rng = np.random.default_rng(77)
    rows = []
    # 150 random line tracks
    for i in range(150):
        n = rng.integers(2, 8)
        start = rng.uniform([-170, -80], [160, 70])
        pts = np.cumsum(
            np.vstack([start, rng.normal(0, 2, (n - 1, 2))]), axis=0
        )
        rows.append((f"track-{i:04d}", to_wkb(LineString(pts))))
    # plus polygon zones
    zt = synth_zones_table(40)
    for i in range(40):
        rows.append((zt.column("zone_id")[i].as_py(), zt.column("wkb")[i].as_py()))

    boxes = [bbox_of(parse_wkb(w)) for _, w in rows]
    t = pa.table(
        {
            "gid": [r[0] for r in rows],
            "wkb": pa.array([r[1] for r in rows], type=pa.binary()),
            "minx": [b[0] for b in boxes],
            "miny": [b[1] for b in boxes],
            "maxx": [b[2] for b in boxes],
            "maxy": [b[3] for b in boxes],
        }
    )
    from geowave_ray.geom.wkb import box_polygon

    qpoly = box_polygon(-40, -20, 30, 40)
    for op in ("INTERSECTS", "CONTAINS", "DISJOINT", "CROSSES"):
        q = SpatialQuery(qpoly, op=op)
        got = set(
            apply_wkb_query(ray.data.from_arrow(t), q).to_pandas()["gid"]
        )
        want = {
            gid for gid, w in rows if evaluate(op, qpoly, parse_wkb(w))
        }
        assert got == want, f"{op}: {len(got)} vs {len(want)}"


def test_custom_cell_scheme_extension(ray_session):
    """SURVEY §2.I extension surface: a user-defined cell scheme is just a
    duck-typed object with cell_of(); the engine's encode/groupby stages
    accept it unchanged (CustomIndexStrategy analog)."""
    import ray

    from geowave_ray.sources.images import synth_images_table

    class EquatorBandScheme:
        """Custom scheme: 18 latitude bands, ignoring longitude."""

        def cell_of(self, lon, lat):
            return np.clip(((np.asarray(lat) + 90.0) // 10).astype(np.int64), 0, 17)

    scheme = EquatorBandScheme()

    def encode(batch: pa.Table) -> pa.Table:
        cells = scheme.cell_of(
            batch.column("lon").to_numpy(), batch.column("lat").to_numpy()
        )
        return batch.append_column("cell", pa.array(cells))

    t = synth_images_table(1000, with_bytes=False)
    out = (
        ray.data.from_arrow(t)
        .map_batches(encode, batch_format="pyarrow")
        .groupby("cell")
        .count()
        .to_pandas()
    )
    assert out["count()"].sum() == 1000
    assert set(out["cell"]).issubset(set(range(18)))


def test_xz_prefers_deeper_level_when_doubled_element_covers():
    """ADVICE parity: XZOrderSFC probes l1+1 and keeps it when the doubled
    element at the deeper level still covers the box (XZOrderSFC.java:44-120).
    A box anchored at the origin of width 0.3 (normalized) fits a doubled
    level-2 element (2*0.25=0.5 >= 0.3), so level 2 is chosen over l1=1."""
    xz = XZOrderSFC()
    lv = xz.level_of(
        np.array([-180.0]), np.array([-90.0]),
        np.array([-180.0 + 0.3 * 360]), np.array([-90.0 + 0.3 * 180]),
    )
    assert lv[0] == 2
    # still covered: element_extent at the chosen level contains the box
    ex0, ey0, ex1, ey1 = xz.element_extent(
        np.array([-180.0]), np.array([-90.0]),
        np.array([-180.0 + 0.3 * 360]), np.array([-90.0 + 0.3 * 180]),
    )
    assert ex0[0] <= -180 and ex1[0] >= -180 + 0.3 * 360 - 1e-9


def test_ewkb_srid_payload():
    """EWKB with the 0x20000000 SRID flag parses with the 4-byte SRID
    skipped (round-2 ADVICE: PostGIS exports)."""
    import struct

    from geowave_ray.geom.wkb import parse_wkb

    # little-endian EWKB point with SRID=4326
    buf = struct.pack("<BIIdd", 1, 0x20000001, 4326, 12.5, -3.25)
    g = parse_wkb(buf)
    assert (g.x, g.y) == (12.5, -3.25)


def test_gwql_delete_and_scalar_functions(ray_session):
    """GWQL DELETE + ABS/CONCAT scalar functions (GWQL.g4:49-105)."""
    import ray

    from geowave_ray.query.gwql import run_gwql

    t = pa.table(
        {
            "pid": pa.array(range(6), type=pa.int64()),
            "lon": [0.0, 10.0, 20.0, 30.0, 40.0, 50.0],
            "lat": [0.0, 10.0, 20.0, 30.0, 40.0, 50.0],
            "v": [-5, 3, -2, 7, 1, -9],
            "tag": ["a", "b", "c", "d", "e", "f"],
        }
    )
    tables = {"pts": ray.data.from_arrow(t)}
    kept = run_gwql(
        "DELETE FROM pts WHERE BBOX(lon, lat, 5, 5, 35, 35)", tables
    ).to_pandas()
    assert sorted(kept["pid"]) == [0, 4, 5]
    tables = {"pts": ray.data.from_arrow(t)}
    out = run_gwql(
        "SELECT pid, ABS(v) AS av, CONCAT(tag, tag) AS tt FROM pts WHERE v < 0",
        tables,
    ).to_pandas().sort_values("pid")
    assert out["av"].tolist() == [5, 2, 9]
    assert out["tt"].tolist() == ["aa", "cc", "ff"]


def test_visibility_rows_and_fields(ray_session):
    """Per-row + per-field visibility (core/store/.../data/visibility):
    rows outside the auth set are dropped, unauthorized fields nulled."""
    import ray

    from geowave_ray.stages.visibility import apply_visibility, visibility_satisfied

    assert visibility_satisfied("", {"x"})
    assert visibility_satisfied("a|b", {"b"})
    assert not visibility_satisfied("a&b", {"b"})
    assert visibility_satisfied("(a|b)&c", {"b", "c"})

    t = pa.table(
        {
            "pid": pa.array(range(5), type=pa.int64()),
            "payload": ["p0", "p1", "p2", "p3", "p4"],
            "secret_score": [1.0, 2.0, 3.0, 4.0, 5.0],
            "visibility": ["", "public", "admin", "admin&audit", "public|admin"],
        }
    )
    out = apply_visibility(
        ray.data.from_arrow(t),
        auths={"public"},
        field_vis={"secret_score": "admin"},
    ).to_pandas()
    assert sorted(out["pid"]) == [0, 1, 4]
    assert out["secret_score"].isna().all()
    out2 = apply_visibility(
        ray.data.from_arrow(t), auths={"admin", "audit"},
        field_vis={"secret_score": "admin"},
    ).to_pandas()
    assert sorted(out2["pid"]) == [0, 2, 3, 4]
    assert not out2["secret_score"].isna().any()


def test_gwql_aggregate_composition(ray_session):
    """BBOX()/TRANGE() aggregates + COUNT in one pass (GWQL.g4 aggregate
    functions), plus temporal predicates (BEFORE/AFTER/DURING)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geowave_ray.query.gwql import run_gwql

    n = 1000
    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "pid": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-100, 100, n),
            "lat": rng.uniform(-50, 50, n),
            "ts": pa.array(
                (
                    np.datetime64("2024-01-01")
                    + rng.integers(0, 30, n).astype("timedelta64[D]")
                ).astype("datetime64[us]")
            ),
        }
    )
    out = run_gwql(
        "SELECT COUNT(*) AS n, BBOX(lon, lat) AS env, TRANGE(ts) AS tr FROM pts"
        " WHERE BBOX(lon, lat, -30, -20, 30, 20) AND ts AFTER '2024-01-10T00:00:00'",
        {"pts": ray.data.from_arrow(t)},
    )
    lon, lat = t.column("lon").to_numpy(), t.column("lat").to_numpy()
    ts = t.column("ts").to_numpy()
    m = (
        (lon >= -30) & (lon <= 30) & (lat >= -20) & (lat <= 20)
        & (ts > np.datetime64("2024-01-10T00:00:00"))
    )
    assert out.column("n")[0].as_py() == int(m.sum())
    assert out.column("env_minx")[0].as_py() == lon[m].min()
    assert out.column("env_maxy")[0].as_py() == lat[m].max()
    assert np.datetime64(out.column("tr_lo")[0].as_py()) == ts[m].min()
    assert np.datetime64(out.column("tr_hi")[0].as_py()) == ts[m].max()

    # DURING
    out2 = run_gwql(
        "SELECT COUNT(*) AS n FROM pts WHERE ts DURING '2024-01-05T00:00:00/2024-01-15T00:00:00'",
        {"pts": ray.data.from_arrow(t)},
    )
    m2 = (ts >= np.datetime64("2024-01-05T00:00:00")) & (ts <= np.datetime64("2024-01-15T00:00:00"))
    assert out2.column("n")[0].as_py() == int(m2.sum())


def test_gwql_or_over_spatial(ray_session):
    """OR over spatial predicates: GWQL falls back to row filters (same
    rule as the CQL parser)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geowave_ray.query.gwql import parse_gwql, run_gwql

    n = 2000
    rng = np.random.default_rng(13)
    t = pa.table(
        {
            "pid": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
            "v": rng.integers(0, 100, n),
        }
    )
    q = (
        "SELECT COUNT(*) AS n FROM pts WHERE"
        " BBOX(lon, lat, -30, 10, 40, 60) AND v >= 50"
        " OR INTERSECTS(lon, lat, 'POLYGON ((100 -60, 150 -60, 150 -20, 100 -20, 100 -60))')"
    )
    plan = parse_gwql(q)
    assert plan["spatial"] is None  # no single index constraint extracted
    out = run_gwql(q, {"pts": ray.data.from_arrow(t)})
    lon, lat, v = (t.column(c).to_numpy() for c in ("lon", "lat", "v"))
    in1 = (lon >= -30) & (lon <= 40) & (lat >= 10) & (lat <= 60) & (v >= 50)
    in2 = (lon >= 100) & (lon <= 150) & (lat >= -60) & (lat <= -20)
    assert out.column("n")[0].as_py() == int((in1 | in2).sum())


def test_gwql_parenthesized_groups(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from geowave_ray.query.gwql import run_gwql

    n = 1500
    rng = np.random.default_rng(17)
    t = pa.table(
        {
            "pid": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-89, 89, n),
            "v": rng.integers(0, 100, n),
        }
    )
    out = run_gwql(
        "SELECT COUNT(*) AS n FROM pts WHERE (v < 5 OR v > 95) AND BBOX(lon, lat, -90, -45, 90, 45)",
        {"pts": ray.data.from_arrow(t)},
    )
    lon, lat, v = (t.column(c).to_numpy() for c in ("lon", "lat", "v"))
    want = ((v < 5) | (v > 95)) & (lon >= -90) & (lon <= 90) & (lat >= -45) & (lat <= 45)
    assert out.column("n")[0].as_py() == int(want.sum())
    # spatial inside a group becomes a row filter
    out2 = run_gwql(
        "SELECT COUNT(*) AS n FROM pts WHERE (BBOX(lon, lat, -90, -45, 0, 0) OR v > 90) AND v < 99",
        {"pts": ray.data.from_arrow(t)},
    )
    inbox = (lon >= -90) & (lon <= 0) & (lat >= -45) & (lat <= 0)
    want2 = (inbox | (v > 90)) & (v < 99)
    assert out2.column("n")[0].as_py() == int(want2.sum())


def test_gwql_invalid_statements(ray_session):
    """Vectors ported from reference GWQLParserTest.java testInvalidFilters:
    unknown fields, unknown expression/predicate functions and unknown
    operators raise ValueError with the reference's message shapes."""
    import ray

    import pyarrow as pa
    import pytest

    from geowave_ray.query.gwql import run_gwql

    ds = ray.data.from_arrow(
        pa.table({"pop": [1], "pid": [2], "comment": ["a"], "lon": [0.0], "lat": [0.0]})
    )
    t = {"type": ds}
    with pytest.raises(ValueError, match="Field nonexistent did not exist"):
        run_gwql("SELECT * FROM type WHERE nonexistent > 5", t)
    with pytest.raises(ValueError, match="Field nonexistent did not exist"):
        run_gwql("SELECT nonexistent FROM type", t)
    with pytest.raises(
        ValueError, match="No expression function was found with the name: nonexistent"
    ):
        run_gwql("SELECT * FROM type WHERE nonexistent(pid) > 5", t)
    with pytest.raises(
        ValueError, match="No predicate function was found with the name: nonexistent"
    ):
        run_gwql("SELECT * FROM type WHERE nonexistent(pid)", t)
    with pytest.raises(ValueError, match="No 'nonexistent' operator was found"):
        run_gwql("SELECT * FROM type WHERE pid nonexistent pid", t)
    with pytest.raises(ValueError, match="Field ghost did not exist"):
        run_gwql("SELECT SUM(ghost) FROM type", t)


def test_gwql_text_predicate_functions(ray_session):
    """Vectors ported from reference GWQLParserTest.java
    testTextPredicateFunctions: strStartsWith / strEndsWith / strContains
    with the optional ignoreCase third argument."""
    import ray

    import pyarrow as pa

    from geowave_ray.query.gwql import run_gwql

    ds = ray.data.from_arrow(
        pa.table({"pid": ["value", "VALUE", "prevalue", "other"], "n": [1, 2, 3, 4]})
    )
    t = {"type": ds}

    def rows(q):
        return sorted(run_gwql(q, t).to_pandas()["n"].tolist())

    assert rows("SELECT * FROM type WHERE strStartsWith(pid, 'val')") == [1]
    assert rows("SELECT * FROM type WHERE strStartsWith(pid, 'val', true)") == [1, 2]
    assert rows("SELECT * FROM type WHERE strEndsWith(pid, 'value')") == [1, 3]
    assert rows("SELECT * FROM type WHERE strEndsWith(pid, 'value', true)") == [1, 2, 3]
    assert rows("SELECT * FROM type WHERE strContains(pid, 'val')") == [1, 3]
    assert rows("SELECT * FROM type WHERE strContains(pid, 'val', true)") == [1, 2, 3]
    # composes with AND
    assert rows("SELECT * FROM type WHERE strContains(pid, 'val') AND n > 1") == [3]


def test_gwql_math_casting_attr_comparisons(ray_session):
    """Vectors ported from reference GWQLParserTest.java testMathExpression
    / testComparisonOperators / testCasting: arithmetic predicates,
    attribute-to-attribute comparisons, ::text casts, and the undefined
    cast-type error."""
    import ray

    import pyarrow as pa
    import pytest

    from geowave_ray.query.gwql import run_gwql

    ds = ray.data.from_arrow(
        pa.table({"pop": [15, 30, 21], "pid": [3, 4, 30]})
    )
    t = {"type": ds}

    def rows(q):
        return sorted(run_gwql(q, t).to_pandas()["pop"].tolist())

    assert rows("SELECT * FROM type WHERE pop + 5 > 25") == [21, 30]
    assert rows("SELECT * FROM type WHERE pop - 5 > 20") == [30]
    assert rows("SELECT * FROM type WHERE pop * 2 > 41") == [21, 30]
    assert rows("SELECT * FROM type WHERE pop / 2 > 10") == [21, 30]
    assert rows("SELECT * FROM type WHERE pop > pid") == [15, 30]
    assert rows("SELECT * FROM type WHERE pop::text = '15'") == [15]
    # pop=15,pid=3: 3<=15<=23 qualifies; pop=30,pid=4: 30>24; pop=21,pid=30: 21<30
    assert rows("SELECT * FROM type WHERE pop BETWEEN pid AND pid + 20") == [15]
    with pytest.raises(ValueError, match="Type 'nonexistent' is undefined"):
        rows("SELECT * FROM type WHERE pop::nonexistent > 5")


def test_gwql_spatial_predicate_family(ray_session):
    """GWQL spatial predicate functions (geotime GWQLParserTest.java
    testSpatialPredicateFunctions surface): the 8 compare ops + Loose
    envelope variants.  Reference direction (SpatialQueryFilter.java:
    46-125): op applies as constraintGeometry.op(dataGeometry), so
    CONTAINS is true for points inside the query polygon and WITHIN is
    always false for point data."""
    import ray

    import pyarrow as pa

    from geowave_ray.query.gwql import run_gwql

    ds = ray.data.from_arrow(
        pa.table({"pid": [1, 2, 3], "lon": [5.0, 0.0, 20.0], "lat": [5.0, 5.0, 20.0]})
    )
    P = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'"

    def rows(q):
        out = run_gwql(q, {"type": ds}).to_pandas()
        return sorted(out["pid"].tolist()) if len(out) else []

    assert rows(f"SELECT * FROM type WHERE intersects(lon, lat, {P})") == [1, 2]
    assert rows(f"SELECT * FROM type WHERE contains(lon, lat, {P})") == [1, 2]
    assert rows(f"SELECT * FROM type WHERE within(lon, lat, {P})") == []
    assert rows(f"SELECT * FROM type WHERE disjoint(lon, lat, {P})") == [3]
    assert rows(f"SELECT * FROM type WHERE touches(lon, lat, {P})") == []
    assert rows(f"SELECT * FROM type WHERE intersectsLoose(lon, lat, {P})") == [1, 2]
    assert rows(f"SELECT * FROM type WHERE disjointLoose(lon, lat, {P})") == [3]
    assert rows(f"SELECT * FROM type WHERE bboxLoose(lon, lat, 0, 0, 10, 10)") == [1, 2]
    assert rows(f"SELECT * FROM type WHERE contains(lon, lat, {P}) AND pid > 1") == [2]


def test_gwql_temporal_predicate_functions(ray_session):
    """Ported from geotime GWQLParserTest.java testTemporalPredicateFunctions:
    tcontains/toverlaps with instant and range literals over instant-valued
    time fields."""
    import ray

    import numpy as np
    import pyarrow as pa

    from geowave_ray.query.gwql import run_gwql

    ts = pa.array(
        np.array(
            ["2020-01-01T00:00:00", "2020-01-05T12:00:00", "2020-02-01T00:00:00"],
            dtype="datetime64[us]",
        )
    )
    ds = ray.data.from_arrow(pa.table({"pid": [1, 2, 3], "start": ts}))
    t = {"type": ds}

    def rows(q):
        out = run_gwql(q, t).to_pandas()
        return sorted(out["pid"].tolist()) if len(out) else []

    assert rows("SELECT * FROM type WHERE tcontains(start, '2020-01-01')") == [1]
    assert rows(
        "SELECT * FROM type WHERE toverlaps(start, '2020-01-01/2020-01-31')"
    ) == [1, 2]
    assert rows("SELECT * FROM type WHERE toverlaps(start, '2020-02-01')") == [3]
    # an instant field can never CONTAIN a true range
    assert rows(
        "SELECT * FROM type WHERE tcontains(start, '2020-01-01/2020-01-31')"
    ) == []
