"""Spatial join stages vs brute-force oracle (golden outputs, FIXTURES §F5)."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.geom import parse_wkb, points_in_polygon, MultiGeometry, Polygon
from geowave_ray.sources.images import synth_images_table, synth_zones_table
from geowave_ray.stages.join import broadcast_spatial_join, cell_shuffle_join


@pytest.fixture(scope="module")
def images_table():
    return synth_images_table(1500, with_bytes=False)


@pytest.fixture(scope="module")
def zones_table():
    return synth_zones_table(60)


def brute_force_pairs(images: pa.Table, zones: pa.Table, buffer: float = 0.0):
    xs = images.column("lon").to_numpy()
    ys = images.column("lat").to_numpy()
    ids = images.column("image_id").to_pylist()
    out = set()
    for z in range(len(zones)):
        poly = parse_wkb(zones.column("wkb")[z].as_py())
        parts = poly.parts if isinstance(poly, MultiGeometry) else [poly]
        hit = np.zeros(len(xs), dtype=bool)
        for part in parts:
            if isinstance(part, Polygon):
                hit |= points_in_polygon(xs, ys, part)
                if buffer > 0:
                    from geowave_ray.stages.join import _dist_to_poly

                    hit |= _dist_to_poly(xs, ys, part) <= buffer
        zid = zones.column("zone_id")[z].as_py()
        for i in np.nonzero(hit)[0]:
            out.add((ids[i], zid))
    return out


def test_broadcast_join_matches_brute_force(ray_session, images_table, zones_table):
    import ray

    want = brute_force_pairs(images_table, zones_table)
    ds = ray.data.from_arrow(images_table).repartition(8)
    df = broadcast_spatial_join(ds, zones_table).to_pandas()
    got = set(zip(df["image_id"], df["zone_id"]))
    assert len(want) > 50  # sanity: non-trivial fixture
    assert got == want


def test_broadcast_join_semi_anti(ray_session, images_table, zones_table):
    import ray

    want = brute_force_pairs(images_table, zones_table)
    matched_ids = {i for i, _ in want}
    all_ids = set(images_table.column("image_id").to_pylist())
    ds = ray.data.from_arrow(images_table).repartition(4)
    semi = broadcast_spatial_join(ds, zones_table, how="semi")
    anti = broadcast_spatial_join(ds, zones_table, how="anti")
    semi_ids = set(semi.to_pandas()["image_id"])
    anti_ids = set(anti.to_pandas()["image_id"])
    assert semi_ids == matched_ids
    assert anti_ids == all_ids - matched_ids
    assert semi_ids | anti_ids == all_ids


def test_within_distance_join(ray_session, images_table, zones_table):
    import ray

    buffer = 1.5
    want = brute_force_pairs(images_table, zones_table, buffer=buffer)
    ds = ray.data.from_arrow(images_table).repartition(4)
    got_ds = broadcast_spatial_join(ds, zones_table, buffer=buffer)
    df = got_ds.to_pandas()
    got = set(zip(df["image_id"], df["zone_id"]))
    assert got == want
    assert len(want) > len(brute_force_pairs(images_table, zones_table))


def test_cell_shuffle_join_matches_broadcast(ray_session, images_table, zones_table):
    import ray

    want = brute_force_pairs(images_table, zones_table)
    pts = ray.data.from_arrow(images_table).repartition(6)
    zns = ray.data.from_arrow(zones_table).repartition(2)
    got_ds = cell_shuffle_join(pts, zns, level=6)
    df = got_ds.to_pandas()
    got = set(zip(df["image_id"], df["zone_id"]))
    assert got == want


def test_cell_shuffle_join_with_salting(ray_session, images_table, zones_table):
    import ray

    want = brute_force_pairs(images_table, zones_table)
    pts = ray.data.from_arrow(images_table).repartition(6)
    zns = ray.data.from_arrow(zones_table).repartition(2)
    got_ds = cell_shuffle_join(
        pts, zns, level=6, hot_cell_threshold=20, salt_factor=4
    )
    df = got_ds.to_pandas()
    got = set(zip(df["image_id"], df["zone_id"]))
    assert got == want


def test_knn_matches_brute_force(ray_session, images_table):
    import ray

    from geowave_ray.stages.knn import haversine_km, knn

    rng = np.random.default_rng(123)
    nq = 20
    queries = {
        "query_id": [f"q-{i:03d}" for i in range(nq)],
        "lon": rng.uniform(-180, 180, nq),
        "lat": rng.uniform(-90, 90, nq),
    }
    for k in (1, 5):
        ds = ray.data.from_arrow(images_table).repartition(5)
        got = knn(ds, queries, k=k).to_pandas()
        ids = images_table.column("image_id").to_pylist()
        xs = images_table.column("lon").to_numpy()
        ys = images_table.column("lat").to_numpy()
        for j in range(nq):
            d = haversine_km(xs, ys, queries["lon"][j], queries["lat"][j])
            order = sorted(range(len(d)), key=lambda i: (d[i], ids[i]))[:k]
            want_ids = [ids[i] for i in order]
            sub = got[got["query_id"] == queries["query_id"][j]].sort_values("rank")
            assert sub["image_id"].tolist() == want_ids


def test_knn_join_matches_brute_force(ray_session):
    """Large-large kNN join (both sides Datasets) vs exact brute force —
    dense enough that all true neighbors fall inside the ring assumption."""
    import ray

    from geowave_ray.stages.knn import haversine_km, knn_join

    rng = np.random.default_rng(17)
    n_data, n_q = 3000, 60
    # data concentrated in a region so cell ring captures true neighbors
    d_lon = rng.uniform(0, 20, n_data)
    d_lat = rng.uniform(40, 55, n_data)
    q_lon = rng.uniform(2, 18, n_q)
    q_lat = rng.uniform(42, 53, n_q)
    data = pa.table(
        {
            "image_id": [f"d{i:05d}" for i in range(n_data)],
            "lon": d_lon,
            "lat": d_lat,
        }
    )
    queries = pa.table(
        {"query_id": [f"q{i:03d}" for i in range(n_q)], "lon": q_lon, "lat": q_lat}
    )
    k = 5
    out = knn_join(
        ray.data.from_arrow(queries).repartition(3),
        ray.data.from_arrow(data).repartition(5),
        k=k,
        cell_deg=2.0,
    ).to_pandas()
    ids = data.column("image_id").to_pylist()
    for j in range(n_q):
        d = haversine_km(d_lon, d_lat, q_lon[j], q_lat[j])
        want = [ids[i] for i in sorted(range(n_data), key=lambda i: (d[i], ids[i]))[:k]]
        sub = out[out["query_id"] == f"q{j:03d}"].sort_values("rank")
        assert sub["image_id"].tolist() == want, f"q{j}"


def test_knn_join_radius_escalation(ray_session):
    """The k-th neighbor lies far outside the initial ring; the internal
    radius-escalation loop must still return the exact brute-force top-k."""
    import pyarrow as pa
    import ray

    from geowave_ray.stages.knn import haversine_km, knn_join

    # 3 queries; per query a tight cluster of k-1 points plus the k-th
    # neighbor ~4 cells away (initial ring=1 cannot see it)
    k = 5
    qlon = np.array([10.0, 40.0, -60.0])
    qlat = np.array([10.0, -20.0, 30.0])
    data_lon, data_lat = [], []
    for j in range(3):
        for i in range(k - 1):
            data_lon.append(qlon[j] + 0.01 * (i + 1))
            data_lat.append(qlat[j] + 0.005 * (i + 1))
        data_lon.append(qlon[j] + 4.2)  # far k-th neighbor
        data_lat.append(qlat[j])
    data_lon, data_lat = np.array(data_lon), np.array(data_lat)
    qt = pa.table(
        {"query_id": [f"q{j}" for j in range(3)], "lon": qlon, "lat": qlat}
    )
    dt = pa.table(
        {
            "image_id": np.arange(len(data_lon), dtype=np.int64),
            "lon": data_lon,
            "lat": data_lat,
        }
    )
    out = (
        knn_join(
            ray.data.from_arrow(qt),
            ray.data.from_arrow(dt).repartition(3),
            k=k,
            cell_deg=1.0,
            ring=1,
            max_rounds=4,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    for j in range(3):
        d = haversine_km(qlon[j], qlat[j], data_lon, data_lat)
        want = sorted(range(len(d)), key=lambda i: (d[i], i))[:k]
        got = out[out["query_id"] == f"q{j}"]["image_id"].tolist()
        assert got == want, (j, got, want)


def test_knn_join_zero_candidate_query_escalates(ray_session):
    """A query whose initial cell ring contains NO data points must still
    return its exact top-k (previously it vanished from the output: it
    appeared in neither the done nor todo flag sets)."""
    import pyarrow as pa
    import ray

    from geowave_ray.stages.knn import haversine_km, knn_join

    k = 3
    # data clustered near (10, 10); one query at (-150, -40) — its 3x3
    # ring at cell_deg=1 is empty
    rng = np.random.default_rng(7)
    data_lon = rng.uniform(8, 12, 50)
    data_lat = rng.uniform(8, 12, 50)
    qt = pa.table(
        {
            "query_id": ["near", "far"],
            "lon": [10.0, -150.0],
            "lat": [10.0, -40.0],
        }
    )
    dt = pa.table(
        {
            "image_id": np.arange(50, dtype=np.int64),
            "lon": data_lon,
            "lat": data_lat,
        }
    )
    out = (
        knn_join(
            ray.data.from_arrow(qt),
            ray.data.from_arrow(dt).repartition(3),
            k=k,
            cell_deg=1.0,
            ring=1,
            max_rounds=3,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    assert set(out["query_id"]) == {"near", "far"}
    for qid, qlon, qlat in (("near", 10.0, 10.0), ("far", -150.0, -40.0)):
        d = haversine_km(qlon, qlat, data_lon, data_lat)
        want = sorted(range(len(d)), key=lambda i: (d[i], i))[:k]
        got = out[out["query_id"] == qid]["image_id"].tolist()
        assert got == want, (qid, got, want)


def test_nearest_envelope():
    """Reverse-geocode join: exact box distance, 0 inside, id tie-break."""
    import numpy as np
    import pyarrow as pa
    import ray

    from geowave_ray.stages.join import nearest_envelope

    zones = {
        "zone_id": np.array([5, 1]),  # deliberately unsorted
        "minx": np.array([0, 100]),
        "miny": np.array([0, 100]),
        "maxx": np.array([10, 110]),
        "maxy": np.array([10, 110]),
    }
    pts = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ix": pa.array([5, 13, 55], type=pa.int64()),
            "iy": pa.array([5, 10, 55], type=pa.int64()),
        }
    )
    out = (
        nearest_envelope(ray.data.from_arrow(pts), zones, "ix", "iy",
                         keep_cols=("event_id",))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # p1 inside zone 5 -> d2 = 0
    assert out.loc[0, "zone_id"] == 5 and out.loc[0, "d2"] == 0
    # p2 is 3 right of zone 5 (d2=9) vs 87^2+90^2 to zone 1
    assert out.loc[1, "zone_id"] == 5 and out.loc[1, "d2"] == 9
    # p3 equidistant-ish? 45^2+45^2 to both boxes' corners: zone 5 corner
    # (10,10) -> 45^2*2; zone 1 corner (100,100) -> 45^2*2 — exact tie,
    # smallest id (1) wins despite unsorted input order
    assert out.loc[2, "zone_id"] == 1 and out.loc[2, "d2"] == 45 * 45 * 2
