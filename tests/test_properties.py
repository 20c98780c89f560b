"""Property-based tests (hypothesis) for the wave-5 kernels: each checks a
vectorized stage against an independent slow reference or an algebraic law
over randomized inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "q1", "w-2"]


@st.composite
def _docs(draw):
    n_docs = draw(st.integers(0, 6))
    docs = []
    for _ in range(n_docs):
        n_tok = draw(st.integers(0, 120))
        docs.append(" ".join(draw(st.sampled_from(_WORDS)) for _ in range(n_tok)))
    return docs


@settings(max_examples=25, deadline=None)
@given(_docs(), st.integers(1, 7), st.integers(1, 7))
def test_token_chunker_matches_reference(docs, stride, extra):
    from geowave_ray.stages.text import TokenChunker
    from geowave_ray.stages.texthash import splitmix64, token_hashes_single

    window = stride + extra - 1
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = TokenChunker(window=window, stride=stride)(batch)
    got = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("chunk_idx").to_pylist(),
            out.column("n_tok").to_pylist(),
            [v % (1 << 64) for v in out.column("chunk_hash").to_pylist()],
        )
    )
    want = []
    for d, text in enumerate(docs):
        th = token_hashes_single(text)
        for ci, start in enumerate(range(0, len(th), stride)):
            seg = th[start : start + window]
            h = int(
                splitmix64(np.array([seg.sum(dtype=np.uint64)], dtype=np.uint64))[0]
            )
            want.append((d, ci, len(seg), h))
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(-200, 200), st.integers(-200, 200)),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 50),
)
def test_trajectory_resample_matches_reference(points, step):
    import ray

    from geowave_ray.stages.analytics import trajectory_resample

    t = pa.table(
        {
            "user_id": pa.array([1] * len(points), pa.int64()),
            "ts": pa.array([p[0] for p in points], pa.timestamp("us")),
            "ix": pa.array([p[1] for p in points], pa.int64()),
            "iy": pa.array([p[2] for p in points], pa.int64()),
            "event_id": pa.array(range(len(points)), pa.int64()),
        }
    )
    out = trajectory_resample(
        ray.data.from_arrow(t), "user_id", "ts", "ix", "iy", "event_id", step
    ).to_pandas()
    got = (
        [(r.g, r.cx, r.cy) for r in out.sort_values("g").itertuples()]
        if len(out)
        else []
    )
    # slow reference: scan each grid instant independently
    order = sorted(range(len(points)), key=lambda i: (points[i][0], i))
    ts = [points[i][0] for i in order]
    xs = [points[i][1] + 18000 for i in order]
    ys = [points[i][2] + 18000 for i in order]
    want = []
    g0 = -(-ts[0] // step)
    g1 = ts[-1] // step
    for g in range(g0, g1 + 1):
        T = g * step
        j = max(i for i in range(len(ts)) if ts[i] <= T)
        if ts[j] == T:
            want.append((g, xs[j] - 18000, ys[j] - 18000))
        else:
            dt = ts[j + 1] - ts[j]
            cx = (xs[j] * (ts[j + 1] - T) + xs[j + 1] * (T - ts[j])) // dt - 18000
            cy = (ys[j] * (ts[j + 1] - T) + ys[j + 1] * (T - ts[j])) // dt - 18000
            want.append((g, cx, cy))
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abc123.@-+ <EMAIL>",
            max_size=60,
        ),
        max_size=8,
    )
)
def test_pii_redactor_idempotent(texts):
    from geowave_ray.stages.text import PiiRedactor

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    r = PiiRedactor()
    once = r(batch)
    again = r(
        pa.table(
            {
                "doc_id": once.column("doc_id"),
                "text": once.column("text_red"),
            }
        )
    )
    # replacement tokens contain no digits or '@', so a second pass is a
    # no-op on already-redacted text
    assert once.column("text_red").to_pylist() == again.column("text_red").to_pylist()


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 500),
)
def test_dp_simplify_error_bound(pts, tol):
    """Douglas-Peucker invariant: every DROPPED point lies within tolerance
    of the chord between its surrounding KEPT points (checked with the same
    integer cross2/len2 arithmetic), and endpoints are always kept."""
    import numpy as np

    from geowave_ray.geom.simplify import dp_keep_mask

    x = np.array([p[0] for p in pts], dtype=np.int64)
    y = np.array([p[1] for p in pts], dtype=np.int64)
    tol_sq = tol * tol
    keep = dp_keep_mask(x, y, tol_sq)
    assert keep[0] and keep[-1]
    kept = np.flatnonzero(keep)
    for a, b in zip(kept[:-1], kept[1:]):
        dx, dy = int(x[b] - x[a]), int(y[b] - y[a])
        for j in range(a + 1, b):
            if dx == 0 and dy == 0:
                d2 = (int(x[j] - x[a])) ** 2 + (int(y[j] - y[a])) ** 2
                assert d2 <= tol_sq
            else:
                cr = dx * int(y[j] - y[a]) - dy * int(x[j] - x[a])
                assert cr * cr <= tol_sq * (dx * dx + dy * dy)


# ---------------------------------------------------------------- wave 7
from hypothesis import given, settings, strategies as st


@given(
    st.lists(
        st.text(
            alphabet="abcXYZ019./?&#=_-",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_url_normalize_idempotent(urls):
    import pyarrow as pa

    from geowave_ray.stages.text import normalize_urls

    u1, _ = normalize_urls(pa.array(["https://" + u for u in urls]))
    u2, _ = normalize_urls(u1)
    assert u1.to_pylist() == u2.to_pylist()


@given(st.data())
@settings(max_examples=80, deadline=None)
def test_segment_box_sat_invariants(data):
    import numpy as np

    x1 = data.draw(st.integers(-50, 50))
    y1 = data.draw(st.integers(-50, 50))
    x2 = data.draw(st.integers(-50, 50))
    y2 = data.draw(st.integers(-50, 50))
    bx0 = data.draw(st.integers(-50, 40))
    by0 = data.draw(st.integers(-50, 40))
    bx1 = bx0 + data.draw(st.integers(0, 30))
    by1 = by0 + data.draw(st.integers(0, 30))

    def sat(x1, y1, x2, y2):
        if max(x1, x2) < bx0 or min(x1, x2) > bx1:
            return False
        if max(y1, y2) < by0 or min(y1, y2) > by1:
            return False
        dx, dy = x2 - x1, y2 - y1
        cr = [dx * (cy - y1) - dy * (cx - x1) for cx in (bx0, bx1) for cy in (by0, by1)]
        return min(cr) <= 0 <= max(cr)

    got = sat(x1, y1, x2, y2)
    # endpoint-swap symmetry
    assert got == sat(x2, y2, x1, y1)
    # both endpoints inside -> must intersect
    if bx0 <= x1 <= bx1 and by0 <= y1 <= by1 and bx0 <= x2 <= bx1 and by0 <= y2 <= by1:
        assert got
    # sampled points on the segment inside the box -> must intersect
    for t in (0.0, 0.25, 0.5, 0.75, 1.0):
        px, py = x1 + t * (x2 - x1), y1 + t * (y2 - y1)
        if bx0 <= px <= bx1 and by0 <= py <= by1:
            assert got
            break


@given(st.integers(3, 12), st.integers(50, 90))
@settings(max_examples=40, deadline=None)
def test_equal_radius_star_polygons_valid(m, r):
    import numpy as np

    from geowave_ray.geom.measures import ring_self_intersections

    ux = np.array([100, 92, 71, 38, 0, -38, -71, -92, -100, -92, -71, -38, 0, 38, 71, 92])
    uy = np.array([0, 38, 71, 92, 100, 92, 71, 38, 0, -38, -71, -92, -100, -92, -71, -38])
    a = (np.arange(m) * 16) // m
    verts = np.zeros((1, m, 2), np.int64)
    verts[0, :, 0] = r * ux[a]
    verts[0, :, 1] = r * uy[a]
    # equal radii on a monotone angle sweep -> convex ring -> valid
    assert ring_self_intersections(verts, np.array([m], np.int64))[0] == 0


@given(
    st.integers(-9000, 9000),
    st.integers(-18000, 18000),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_exif_gps_roundtrip_property(lat_cd, lon_cd, big_endian):
    """Any centi-degree coordinate round-trips the EXIF APP1 codec in
    either TIFF byte order."""
    from geowave_ray.stages.exif import (
        build_exif_gps_app1,
        insert_app1,
        parse_exif_gps,
    )
    from geowave_ray.stages.imaging import encode_image

    base = encode_image(np.zeros((8, 8, 3), dtype=np.uint8), "jpeg")
    j = insert_app1(base, build_exif_gps_app1(lat_cd, lon_cd, big_endian=big_endian))
    assert parse_exif_gps(j) == (lat_cd, lon_cd)


@given(st.integers(64, 4096), st.integers(64, 4096))
@settings(max_examples=80, deadline=None)
def test_aspect_bucket_is_argmin(w, h):
    """The assigned bucket minimizes the integer cross-multiplication
    residual over the whole bucket list (ties -> smallest index)."""
    from geowave_ray.stages.imaging import ASPECT_BUCKETS, aspect_bucket_assign

    bw, bh = aspect_bucket_assign(np.array([w]), np.array([h]))
    got = (int(bw[0]), int(bh[0]))
    resid = [abs(w * b[1] - h * b[0]) for b in ASPECT_BUCKETS]
    best = min(resid)
    # got must achieve the minimum, and be the FIRST bucket achieving it
    assert abs(w * got[1] - h * got[0]) == best
    assert got == ASPECT_BUCKETS[resid.index(best)]


@given(st.data())
@settings(max_examples=25, deadline=None)
def test_pq_xxfree_argmin_equals_true_l2(data):
    """pq_encode's cc - 2xy ranking selects the same centroid as the full
    squared-L2 argmin (the |x|^2 term is constant per subvector)."""
    import ray

    from geowave_ray.stages.ann import pq_encode

    k = data.draw(st.integers(2, 8))
    m = 2
    sub = 3
    rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
    cb = rng.normal(size=(k, m, sub))
    vecs = rng.normal(size=(4, m * sub)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(4), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )
    out = (
        pq_encode(ray.data.from_arrow(t), ray.put(cb), m)
        .to_pandas()
        .sort_values("vec_id")
    )
    x = vecs.astype(np.float64).reshape(4, m, sub)
    d2 = ((x[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)  # (n, k, m)
    want = d2.argmin(axis=1)  # (n, m)
    packed = (want * (16 ** np.arange(m))[None, :]).sum(axis=1)
    assert list(out["pq_code"]) == packed.tolist()
