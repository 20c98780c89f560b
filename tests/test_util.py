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
