"""As-of join + windowed aggregate: brute-force parity, bucketed regime,
direction/tolerance/how variants."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.stages.asof import asof_join, windowed_aggregate

RNG = np.random.default_rng(7)
N_LEFT, N_RIGHT, N_KEYS = 400, 300, 12


def _sides():
    lk = RNG.integers(0, N_KEYS, N_LEFT).astype(np.int64)
    lt = RNG.integers(0, 10_000, N_LEFT).astype(np.int64)
    rk = RNG.integers(0, N_KEYS + 2, N_RIGHT).astype(np.int64)  # some keys left-only
    # force timestamp ties on the right to exercise the tiebreak
    rt = (RNG.integers(0, 2_000, N_RIGHT) * 5).astype(np.int64)
    left = pa.table(
        {
            "k": lk,
            "lts": lt.view("int64").astype("int64"),
            "lid": np.arange(N_LEFT, dtype=np.int64),
        }
    ).set_column(1, "lts", pa.array(lt).cast(pa.timestamp("us")))
    right = pa.table(
        {
            "k": rk,
            "rts": pa.array(rt).cast(pa.timestamp("us")),
            "rid": np.arange(N_RIGHT, dtype=np.int64),
            "payload": RNG.integers(0, 1000, N_RIGHT).astype(np.int64),
        }
    )
    return left, right, lk, lt, rk, rt


def _brute(lk, lt, rk, rt, rid, direction="backward", tolerance=None):
    """expected lid -> (rid or None) under the deterministic tie rule."""
    out = {}
    for i in range(len(lk)):
        if direction == "backward":
            elig = np.flatnonzero((rk == lk[i]) & (rt <= lt[i]))
            if tolerance is not None:
                elig = elig[lt[i] - rt[elig] <= tolerance]
            if len(elig) == 0:
                out[i] = None
                continue
            best_ts = rt[elig].max()
            cand = elig[rt[elig] == best_ts]
            out[i] = int(rid[cand[np.argmax(rid[cand])]])
        else:
            elig = np.flatnonzero((rk == lk[i]) & (rt >= lt[i]))
            if tolerance is not None:
                elig = elig[rt[elig] - lt[i] <= tolerance]
            if len(elig) == 0:
                out[i] = None
                continue
            best_ts = rt[elig].min()
            cand = elig[rt[elig] == best_ts]
            out[i] = int(rid[cand[np.argmin(rid[cand])]])
    return out


def _run(left, right, **kw):
    import ray

    res = asof_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        left_ts="lts",
        right_ts="rts",
        left_cols=("lid",),
        right_cols={"rid": "m_rid", "payload": "m_payload"},
        tiebreak="rid",
        **kw,
    ).take_all()
    return {r["lid"]: r.get("m_rid") for r in res}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute_force(ray_session, direction):
    left, right, lk, lt, rk, rt = _sides()
    rid = np.arange(N_RIGHT, dtype=np.int64)
    expect = _brute(lk, lt, rk, rt, rid, direction=direction)
    got = _run(left, right, direction=direction, how="inner")
    inner_expect = {i: v for i, v in expect.items() if v is not None}
    assert got == inner_expect


def test_asof_left_outer_and_tolerance(ray_session):
    left, right, lk, lt, rk, rt = _sides()
    rid = np.arange(N_RIGHT, dtype=np.int64)
    expect = _brute(lk, lt, rk, rt, rid, tolerance=500)
    got = _run(left, right, how="left", tolerance_us=500)
    assert len(got) == N_LEFT
    assert got == expect


def test_asof_bucketed_equals_unbucketed(ray_session):
    left, right, lk, lt, rk, rt = _sides()
    plain = _run(left, right, how="inner")
    for bucket_us in (100, 1_000, 50_000):  # incl. one bucket >> span
        bucketed = _run(left, right, how="inner", bucket_us=bucket_us)
        assert bucketed == plain, bucket_us


def test_asof_empty_right(ray_session):
    left, right, *_ = _sides()
    empty = right.slice(0, 0)
    assert _run(left, empty, how="inner") == {}
    got = _run(left, empty, how="left")
    assert len(got) == N_LEFT and set(got.values()) == {None}


def test_windowed_aggregate_brute(ray_session):
    import ray

    n = 500
    k = RNG.integers(0, 8, n).astype(np.int64)
    t = RNG.integers(0, 3_000, n).astype(np.int64)
    v = RNG.uniform(0, 50, n)
    tbl = pa.table(
        {
            "k": k,
            "ts": pa.array(t).cast(pa.timestamp("us")),
            "rid": np.arange(n, dtype=np.int64),
            "value": v,
        }
    )
    res = windowed_aggregate(
        ray.data.from_arrow(tbl),
        on="k",
        ts_col="ts",
        value_col="value",
        window_us=200,
        keep_cols=("rid",),
    ).take_all()
    vc = np.floor(v * 100).astype(np.int64)
    by_rid = {r["rid"]: (r["w_count"], r["w_sum_cents"]) for r in res}
    assert len(by_rid) == n
    for i in range(n):
        m = (k == k[i]) & (t >= t[i] - 200) & (t <= t[i])
        assert by_rid[i] == (int(m.sum()), int(vc[m].sum())), i


def test_windowed_aggregate_null_values(ray_session):
    import ray

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([0, 50, 100], type=pa.int64()).cast(pa.timestamp("us")),
            "rid": pa.array([0, 1, 2], type=pa.int64()),
            "value": pa.array([1.0, None, 3.0], type=pa.float64()),
        }
    )
    res = windowed_aggregate(
        ray.data.from_arrow(tbl), on="k", ts_col="ts", value_col="value",
        window_us=200, keep_cols=("rid",),
    ).take_all()
    by = {r["rid"]: (r["w_count"], r["w_sum_cents"]) for r in res}
    # null row still counts (COUNT(*)) but adds 0 to the sum (SQL SUM)
    assert by == {0: (1, 100), 1: (2, 100), 2: (3, 400)}


def test_asof_tiebreak_validation(ray_session):
    import ray

    left = pa.table({"k": pa.array([1], type=pa.int64()),
                     "lts": pa.array([5], type=pa.int64()).cast(pa.timestamp("us")),
                     "lid": pa.array([0], type=pa.int64())})
    right = pa.table({"k": pa.array([1], type=pa.int64()),
                      "rts": pa.array([3], type=pa.int64()).cast(pa.timestamp("us")),
                      "price": pa.array([1.5], type=pa.float64())})
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  on="k", left_ts="lts", right_ts="rts",
                  left_cols=("lid",), right_cols={"price": "p"})
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  on="k", left_ts="lts", right_ts="rts",
                  left_cols=("lid",), right_cols={})


def test_interval_join_brute_force(ray_session):
    import ray

    from geowave_ray.stages.asof import interval_join

    n_l, n_r = 200, 400
    lk = RNG.integers(0, 10, n_l).astype(np.int64)
    s = RNG.integers(0, 5_000, n_l).astype(np.int64)
    e = s + RNG.integers(0, 800, n_l)  # spans cross several 256-us buckets
    rk = RNG.integers(0, 12, n_r).astype(np.int64)
    rt = RNG.integers(0, 6_000, n_r).astype(np.int64)
    left = pa.table({"k": lk, "lid": np.arange(n_l, dtype=np.int64),
                     "s": pa.array(s).cast(pa.timestamp("us")),
                     "e": pa.array(e).cast(pa.timestamp("us"))})
    right = pa.table({"k": rk, "rid": np.arange(n_r, dtype=np.int64),
                      "ts": pa.array(rt).cast(pa.timestamp("us"))})
    got = interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_start="s", left_end="e", right_ts="ts",
        left_cols=("lid",), right_cols={"rid": "m_rid"}, bucket_us=256,
    ).take_all()
    pairs = {(r["lid"], r["m_rid"]) for r in got}
    assert len(pairs) == len(got)  # exactly-once, no dupes
    expect = {
        (i, j)
        for i in range(n_l)
        for j in np.nonzero((rk == lk[i]) & (rt >= s[i]) & (rt <= e[i]))[0]
    }
    assert pairs == expect


def test_interval_join_empty_sides(ray_session):
    import ray

    from geowave_ray.stages.asof import interval_join

    left = pa.table({"k": pa.array([1], type=pa.int64()),
                     "lid": pa.array([0], type=pa.int64()),
                     "s": pa.array([0], type=pa.int64()).cast(pa.timestamp("us")),
                     "e": pa.array([10], type=pa.int64()).cast(pa.timestamp("us"))})
    right = pa.table({"k": pa.array([], type=pa.int64()),
                      "rid": pa.array([], type=pa.int64()),
                      "ts": pa.array([], type=pa.timestamp("us"))})
    out = interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_start="s", left_end="e", right_ts="ts",
        left_cols=("lid",), right_cols={"rid": "m_rid"}, bucket_us=100,
    ).take_all()
    assert out == []
