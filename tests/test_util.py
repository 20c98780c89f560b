"""stages/util.safe_join + drop_empty_blocks (Ray 2.49 join workarounds)
and XZ query-range completeness."""

import numpy as np
import pyarrow as pa
import pytest


def test_safe_join_survives_empty_blocks_and_empty_sides(ray_session):
    import ray.data as rd

    from geowave_ray.stages.util import safe_join

    edges = pa.table(
        {
            "src": np.array([1, 2, 3, 4] * 5, dtype=np.int64),
            "dst": np.array([2, 3, 4, 5] * 5, dtype=np.int64),
        }
    )
    flags = pa.table(
        {
            "pid": np.arange(1, 6, dtype=np.int64),
            "f": np.array([1, 1, 0, 1, 0], dtype=np.int64),
        }
    )
    # join output -> map_batches produces schema-less 0-row blocks (Ray
    # skips the UDF); a second join over that must still work
    e2 = safe_join(
        rd.from_arrow(edges),
        rd.from_arrow(flags.rename_columns(["src", "src_f"])),
        "inner", 4, on=("src",),
    ).materialize()

    def tb(batch: pa.Table) -> pa.Table:
        return pa.table({"pid": batch.column("src"), "node": batch.column("dst")})

    tb.__name__ = "tb"
    br = e2.map_batches(tb, batch_format="pyarrow")
    labels = rd.from_arrow(
        pa.table({"node": np.arange(1, 6, dtype=np.int64), "label": np.ones(5, dtype=np.int64)})
    )
    out = safe_join(br, labels, "inner", 4, on=("node",)).to_pandas()
    assert len(out) == 20

    # fully empty left
    i64 = pa.int64()
    sch = pa.schema([("pid", i64), ("node", i64)])
    empty = rd.from_arrow(sch.empty_table())
    out2_ds = safe_join(
        empty, labels, "left_outer", 4, on=("node",), left_schema=sch
    )
    assert sorted(out2_ds.schema().names) == ["label", "node", "pid"]
    assert len(out2_ds.to_pandas()) == 0

    # left_outer with fully empty right: left rows + null column
    out3 = safe_join(
        br, rd.from_arrow(pa.schema([("node", i64), ("label", i64)]).empty_table()),
        "left_outer", 4, on=("node",),
        right_schema=pa.schema([("node", i64), ("label", i64)]),
    ).to_pandas()
    assert len(out3) == 20 and out3["label"].isna().all()

    # left_semi / left_anti shortcuts
    out4 = safe_join(
        br, rd.from_arrow(pa.schema([("node", i64)]).empty_table()),
        "left_semi", 4, on=("node",),
        right_schema=pa.schema([("node", i64)]),
    ).to_pandas()
    assert len(out4) == 0
    out5 = safe_join(
        br, rd.from_arrow(pa.schema([("node", i64)]).empty_table()),
        "left_anti", 4, on=("node",),
        right_schema=pa.schema([("node", i64)]),
    ).to_pandas()
    assert len(out5) == 20


def test_safe_join_sentinel_streams_all_join_types(ray_session):
    """sentinel mode: possibly-empty sides join fully streaming (no
    materialize barrier) for every supported join type, with correct
    results when a side IS empty and when both hold rows."""
    import ray.data as rd

    from geowave_ray.stages.util import safe_join

    i64 = pa.int64()
    SENT = -(1 << 62)
    lsch = pa.schema([("k", i64), ("v", i64)])
    rsch = pa.schema([("k", i64), ("x", i64)])
    left = rd.from_arrow(
        pa.table({"k": np.array([1, 2, 3], np.int64), "v": np.array([10, 20, 30], np.int64)})
    )
    right = rd.from_arrow(
        pa.table({"k": np.array([1, 2], np.int64), "x": np.array([5, 6], np.int64)})
    )
    empty_r = rd.from_arrow(rsch.empty_table())
    empty_l = rd.from_arrow(lsch.empty_table())

    # both non-empty
    kw = dict(left_schema=lsch, right_schema=rsch, sentinel=SENT)
    assert safe_join(left, right, "inner", 4, on=("k",), **kw).count() == 2
    lo = safe_join(left, right, "left_outer", 4, on=("k",), **kw).to_pandas()
    assert len(lo) == 3 and lo["x"].isna().sum() == 1
    assert safe_join(left, right, "left_semi", 4, on=("k",), **kw).count() == 2
    assert safe_join(left, right, "left_anti", 4, on=("k",), **kw).count() == 1

    # empty right (the Ray 2.49 crash case) — sentinel keeps it streaming
    assert safe_join(left, empty_r, "inner", 4, on=("k",), **kw).count() == 0
    lo2 = safe_join(left, empty_r, "left_outer", 4, on=("k",), **kw).to_pandas()
    assert len(lo2) == 3 and lo2["x"].isna().all()
    assert safe_join(left, empty_r, "left_anti", 4, on=("k",), **kw).count() == 3

    # empty left
    assert safe_join(empty_l, right, "inner", 4, on=("k",), **kw).count() == 0
    assert safe_join(empty_l, right, "left_outer", 4, on=("k",), **kw).count() == 0

    # both empty
    assert safe_join(empty_l, empty_r, "inner", 4, on=("k",), **kw).count() == 0


def test_plain_join_empty_first_block_rule(ray_session):
    """Empirical basis for safe_join: Ray 2.49's hash join crashes
    exactly when a side's FIRST block is 0-row; empty blocks in later
    positions are harmless.  If either half of this starts failing on a
    Ray upgrade, revisit safe_join (sentinel prepend + drop_empty_blocks
    could then be retired)."""
    import pytest
    import ray.data as rd

    t = pa.table({"k": np.array([1, 2, 3], np.int64), "v": np.array([10, 20, 30], np.int64)})
    r = pa.table({"k": np.array([1, 2], np.int64), "x": np.array([5, 6], np.int64)})

    def ident(b):
        return b

    # empty block in a LATER position (0-column after map_batches' UDF
    # skip): join works
    left = rd.from_arrow([t, t.schema.empty_table()]).map_batches(
        ident, batch_format="pyarrow"
    )
    assert left.join(rd.from_arrow(r), "inner", 4, on=("k",)).count() == 2

    # empty FIRST block: crashes (the bug safe_join works around)
    bad = rd.from_arrow([r.schema.empty_table(), r])
    with pytest.raises(Exception):
        rd.from_arrow(t).join(bad, "inner", 4, on=("k",)).count()


def test_bloom_anti_filter_exact(ray_session):
    """Bloom prefilter + exact residual join must equal the exact
    anti-filter result — false positives only re-route rows, never drop
    them; tiny m_bits forces a high fp rate to exercise the residual."""
    import ray.data as rd

    from geowave_ray.stages.util import bloom_anti_filter

    rng = np.random.default_rng(5)
    ids = np.arange(5000, dtype=np.int64)
    drops = np.sort(rng.choice(ids, 800, replace=False))
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(4)
    drop_ds = rd.from_arrow(pa.table({"doc_id": drops})).repartition(3)
    # m_bits tiny -> many false positives -> residual join does real work
    out = bloom_anti_filter(ds, drop_ds, "doc_id", m_bits=1 << 12).to_pandas()
    want = sorted(set(ids) - set(drops))
    assert sorted(out["doc_id"]) == want


def test_bloom_m_bits_scales_with_drop_count():
    """Auto-sizing keeps >=10 bits/id across 3 decades (VERDICT r4 #5):
    at 10x the old fixed capacity (20M drops vs the ~2M a fixed 2^24
    handled) the filter grows to 2^28 instead of degrading, and the
    bound stays inside the [2^20, 2^30] broadcast clamp."""
    from geowave_ray.stages.util import bloom_m_bits

    for n in (1, 1000, 100_000, 2_000_000, 20_000_000, 10**12):
        m = bloom_m_bits(n)
        assert m == 1 << max(20, min(30, (10 * n - 1).bit_length()))
        if m < 1 << 30:  # below the clamp: >= 10 bits per id
            assert m >= 10 * n
    assert bloom_m_bits(20_000_000) == 1 << 28
    assert bloom_m_bits(10**12) == 1 << 30


def test_bloom_anti_filter_auto_sized_residual(ray_session):
    """With auto sizing the maybe-set routed to the exact residual join
    stays ~|drops| (near-zero false-positive inflation)."""
    import ray.data as rd

    from geowave_ray.stages.aggregate import BloomFilter
    from geowave_ray.stages.util import bloom_anti_filter, bloom_m_bits

    rng = np.random.default_rng(11)
    ids = np.arange(60_000, dtype=np.int64)
    drops = np.sort(rng.choice(ids, 12_000, replace=False))
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(4)
    drop_ds = rd.from_arrow(pa.table({"doc_id": drops})).repartition(3)
    out = bloom_anti_filter(ds, drop_ds, "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == sorted(set(ids) - set(drops))
    # directly measure the maybe-set the auto-sized filter produces
    m = bloom_m_bits(len(drops))
    bf = BloomFilter(m, 4)
    bf.add_ints(drops)
    maybe = int(bf.might_contain(ids).sum())
    assert maybe <= int(len(drops) * 1.05)


def test_xz_query_ranges_complete_and_bounded():
    """Böhm XZ query ranges: no intersecting box's code may fall outside
    the ranges; max_ranges merging keeps completeness."""
    from geowave_ray.index.xz import XZOrderSFC

    xz = XZOrderSFC(g=6)
    rng = np.random.default_rng(3)
    n = 2000
    cx = rng.uniform(-170, 160, n)
    cy = rng.uniform(-80, 70, n)
    w = rng.uniform(0.01, 20, n)
    h = rng.uniform(0.01, 15, n)
    codes = xz.encode_boxes(cx, cy, cx + w, cy + h)
    Q = (-30.0, 10.0, 40.0, 60.0)
    inter = (cx <= Q[2]) & (cx + w >= Q[0]) & (cy <= Q[3]) & (cy + h >= Q[1])
    for max_ranges in (-1, 8):
        ranges = xz.query_ranges(*Q, max_ranges=max_ranges)
        if max_ranges > 0:
            assert len(ranges) <= max_ranges
        missed = [
            i
            for i in np.nonzero(inter)[0]
            if not any(lo <= codes[i] <= hi for lo, hi in ranges)
        ]
        assert not missed
    # selectivity: the exact decomposition prunes most non-intersecting
    ranges = xz.query_ranges(*Q)
    cand = np.array([any(lo <= c <= hi for lo, hi in ranges) for c in codes])
    assert cand.sum() < n * 0.5
