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
