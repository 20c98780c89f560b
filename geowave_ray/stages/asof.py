"""Temporal as-of join and per-row windowed aggregates.

Ray Data has no native as-of join; the reference has no direct analog
either (its ordering guarantee is sort-key order within a store partition,
SURVEY §2.H), but every event-stream user of a store ends up writing this
"latest right row at or before my timestamp, per key" lookup by hand.  We
express it the same way the engine's other large-large operators work
(stages/join.py cell cogroup, stages/knn.py): tag the two sides, pad to a
common schema with types resolved ON THE DRIVER (never Dataset.schema()
inside a UDF — Ray 2.49 re-executes the captured dataset per task), union,
ONE ``groupby(key)`` shuffle, and a vectorized searchsorted per group.

Scale notes (100 TB):
- one all-to-all shuffle total; both sides are projected to the join
  columns before it (no payload movement).
- partitioning assumption: a single key's rows fit in one worker's group —
  the same per-cogroup bound the spatial cell join and knn_join rely on.
  For keys that violate it, ``bucket_us`` splits every key into fixed
  time buckets: rights are cogrouped with the lefts of their own bucket,
  and each bucket additionally receives the carry-in (latest right of any
  earlier bucket) computed from a tiny per-(key, bucket) max table that is
  prefix-scanned on the driver and broadcast — group size becomes
  O(rows per key-bucket), not O(rows per key).
- ties: rights sharing the boundary timestamp are broken by ``tiebreak``
  (max wins for backward, min for forward) so results are deterministic
  and SQL-replayable.

``windowed_aggregate`` is the rolling companion (count/sum over
[ts - window, ts] per key, peer-inclusive like a SQL RANGE frame): same
single-shuffle cogroup, prefix sums + two searchsorted per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["asof_join", "interval_join", "windowed_aggregate"]


def _pad_nulls(table: pa.Table, cols: list[tuple[str, pa.DataType]]) -> pa.Table:
    for name, typ in cols:
        table = table.append_column(name, pa.nulls(len(table), typ))
    return table


class _AsofGroup:
    __name__ = "asof_group"

    def __init__(self, on, left_cols, right_out, direction, tolerance_us, how):
        self.on = on
        self.left_cols = list(left_cols)
        self.right_out = list(right_out)  # output (dst) names of right cols
        self.direction = direction
        self.tolerance_us = tolerance_us
        self.how = how
        self.out_cols = [on, *left_cols, *right_out]

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lefts = group.filter(pa.array(side == 0))
        rights = group.filter(pa.array(side == 1))
        if len(lefts) == 0:
            return group.select(self.out_cols).slice(0, 0)
        if len(rights) == 0:
            if self.how == "inner":
                return group.select(self.out_cols).slice(0, 0)
            return lefts.select(self.out_cols)  # padded nulls already present

        rts = rights.column("_ats").to_numpy(zero_copy_only=False)
        tie = rights.column("_atie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, rts))
        rts = rts[order]
        rights = rights.take(pa.array(order))

        lts = lefts.column("_ats").to_numpy(zero_copy_only=False)
        if self.direction == "backward":
            pos = np.searchsorted(rts, lts, side="right") - 1
            ok = pos >= 0
            if self.tolerance_us is not None:
                gap = lts - rts[np.clip(pos, 0, len(rts) - 1)]
                ok &= gap <= self.tolerance_us
        else:  # forward
            pos = np.searchsorted(rts, lts, side="left")
            ok = pos < len(rts)
            if self.tolerance_us is not None:
                gap = rts[np.clip(pos, 0, len(rts) - 1)] - lts
                ok &= gap <= self.tolerance_us

        pos = np.clip(pos, 0, len(rts) - 1)
        if self.how == "inner":
            lefts = lefts.filter(pa.array(ok))
            take_idx = pa.array(pos[ok])
        else:  # left: null indices -> null outputs
            take_idx = pa.array(pos, mask=~ok)

        out = lefts.select([self.on, *self.left_cols])
        for c in self.right_out:
            out = out.append_column(c, rights.column(c).take(take_idx))
        return out


def _prep_sides(left, right, on, left_ts, right_ts, left_cols, right_cols, tiebreak):
    """Project/tag/pad both sides to a common schema.  All pa types are
    resolved here on the driver (stages/join.py:387-395 pattern)."""
    ls = left.schema()
    lt = dict(zip(ls.names, ls.types))
    rs = right.schema()
    rt = dict(zip(rs.names, rs.types))
    right_src = list(right_cols)
    if not right_src:
        raise ValueError("right_cols must name at least one output column")
    right_dst = [right_cols[c] for c in right_src]
    left_keep = [c for c in left_cols if c != on]
    pad_right = [(d, rt[s]) for s, d in zip(right_src, right_dst)]
    pad_left = [(c, lt[c]) for c in left_keep]
    tie_src = tiebreak if tiebreak is not None else right_src[0]
    if not pa.types.is_integer(rt[tie_src]):
        raise ValueError(
            f"tiebreak column {tie_src!r} must be integer-typed (got "
            f"{rt[tie_src]}); pass tiebreak= explicitly"
        )

    def prep_left(batch: pa.Table) -> pa.Table:
        ats = batch.column(left_ts).cast(pa.int64())
        out = batch.select([on, *left_keep])
        out = out.append_column("_ats", ats)
        out = out.append_column("_atie", pa.nulls(len(batch), pa.int64()))
        out = out.append_column("_side", pa.array(np.zeros(len(batch), np.int8)))
        out = _pad_nulls(out, pad_right)
        return out.select(sorted(out.column_names))

    def prep_right(batch: pa.Table) -> pa.Table:
        ats = batch.column(right_ts).cast(pa.int64())
        out = pa.table({on: batch.column(on)})
        for s, d in zip(right_src, right_dst):
            out = out.append_column(d, batch.column(s))
        out = out.append_column("_ats", ats)
        out = out.append_column(
            "_atie", batch.column(tie_src).cast(pa.int64())
        )
        out = out.append_column("_side", pa.array(np.ones(len(batch), np.int8)))
        out = _pad_nulls(out, pad_left)
        return out.select(sorted(out.column_names))

    lp = left.map_batches(prep_left, batch_format="pyarrow")
    rp = right.map_batches(prep_right, batch_format="pyarrow")
    return lp, rp, left_keep, right_dst


def asof_join(
    left,
    right,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict,
    left_cols: tuple = (),
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    how: str = "inner",
    bucket_us: int | None = None,
):
    """For each left row, the latest right row (per ``on`` key) with
    right_ts <= left_ts (``backward``; ``forward`` = earliest >=).

    ``right_cols`` maps right source columns -> output names (must not
    collide with left names).  ``tiebreak`` (an int64 right column,
    default the first right_col) breaks equal-timestamp ties: max wins
    backward, min wins forward.  ``bucket_us`` enables the fixed-span
    time-bucket regime for keys too large for one cogroup (see module
    docstring)."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    if bucket_us is not None:
        return _asof_join_bucketed(
            left, right, on, left_ts, right_ts, right_cols, left_cols,
            tiebreak, direction, tolerance_us, how, bucket_us,
        )
    lp, rp, left_keep, right_dst = _prep_sides(
        left, right, on, left_ts, right_ts, left_cols, right_cols, tiebreak
    )
    both = lp.union(rp)
    return both.groupby(on).map_groups(
        _AsofGroup(on, left_keep, right_dst, direction, tolerance_us, how),
        batch_format="pyarrow",
    )


def _asof_join_bucketed(
    left, right, on, left_ts, right_ts, right_cols, left_cols,
    tiebreak, direction, tolerance_us, how, bucket_us,
):
    """Bucketed regime: cogroup by (key, time-bucket) so group size is
    bounded by the bucket span, with carry-in rights computed from a tiny
    per-(key, bucket) extremes table prefix-scanned on the driver.

    Carry rows replicate at most ONE right row per (key, populated
    bucket) — O(#key-buckets), independent of row counts."""
    import ray

    if direction != "backward":
        raise NotImplementedError("bucketed asof supports backward only")
    lp, rp, left_keep, right_dst = _prep_sides(
        left, right, on, left_ts, right_ts, left_cols, right_cols, tiebreak
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        ats = batch.column("_ats").to_numpy(zero_copy_only=False)
        b = np.floor_divide(ats, bucket_us)
        return batch.append_column("_abucket", pa.array(b, type=pa.int64()))

    # both sides materialize: each feeds two consumers (lb aggregate /
    # winners + the final union) — unpinned, the whole read+prep pipeline
    # would re-execute per consumer
    lp = lp.map_batches(add_bucket, batch_format="pyarrow").materialize()
    rp = rp.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # per-(key, bucket) winner rights: max (_ats, _atie) — a small table
    # (one row per populated key-bucket), safe to collect on the driver.
    def bucket_max(group: pa.Table) -> pa.Table:
        ats = group.column("_ats").to_numpy(zero_copy_only=False)
        tie = group.column("_atie").to_numpy(zero_copy_only=False)
        i = int(np.lexsort((tie, ats))[-1])
        return group.take(pa.array([i]))

    bucket_max.__name__ = "asof_bucket_max"
    winners = (
        rp.groupby([on, "_abucket"])
        .map_groups(bucket_max, batch_format="pyarrow")
        .take_all()
    )
    # prefix-scan winners per key: the carry for bucket b is the winner of
    # the latest populated bucket < b.  Emit carry replicas ONLY for left
    # buckets (known lazily? no — for every bucket in [wb+1 .. next wb]
    # bounded by the max left bucket; we bound by max right/left bucket
    # span observed in winners plus lefts' buckets via a cheap agg).
    lb = lp.groupby(on).max("_abucket").take_all()
    max_left_bucket = {r[on]: r["max(_abucket)"] for r in lb}
    by_key: dict = {}
    for r in winners:
        by_key.setdefault(r[on], []).append(r)
    carry_rows = []
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["_abucket"])
        hi = max_left_bucket.get(k)
        if hi is None:
            continue
        for i, r in enumerate(rows):
            nxt = rows[i + 1]["_abucket"] if i + 1 < len(rows) else hi + 1
            for b in range(r["_abucket"] + 1, min(nxt, hi + 1) + 1):
                if b > hi:
                    break
                carry_rows.append({**r, "_abucket": b})
    both = lp.union(rp)
    if carry_rows:
        carry_tbl = pa.Table.from_pylist(carry_rows, schema=rp.schema().base_schema)
        both = both.union(ray.data.from_arrow(carry_tbl))
    grouped = both.groupby([on, "_abucket"]).map_groups(
        _AsofGroup(on, left_keep, right_dst, direction, tolerance_us, how),
        batch_format="pyarrow",
    )
    return grouped


class _IntervalGroup:
    __name__ = "interval_group"

    def __init__(self, on, left_cols, right_out):
        self.on = on
        self.left_cols = list(left_cols)
        self.right_out = list(right_out)
        self.out_cols = [on, *left_cols, *right_out]

    def __call__(self, group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lefts = group.filter(pa.array(side == 0))
        rights = group.filter(pa.array(side == 1))
        if len(lefts) == 0 or len(rights) == 0:
            return group.select(self.out_cols).slice(0, 0)
        rts = rights.column("_ats").to_numpy(zero_copy_only=False)
        order = np.argsort(rts, kind="stable")
        rts = rts[order]
        rights = rights.take(pa.array(order))
        ls = lefts.column("_as").to_numpy(zero_copy_only=False)
        le = lefts.column("_ae").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rts, ls, side="left")
        hi = np.searchsorted(rts, le, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return group.select(self.out_cols).slice(0, 0)
        li = np.repeat(np.arange(len(ls), dtype=np.int64), counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ri = lo[li] + offs
        out = lefts.select([self.on, *self.left_cols]).take(pa.array(li))
        for c in self.right_out:
            out = out.append_column(c, rights.column(c).take(pa.array(ri)))
        return out


def interval_join(
    left,
    right,
    on: str,
    left_start: str,
    left_end: str,
    right_ts: str,
    right_cols: dict,
    left_cols: tuple = (),
    bucket_us: int = 86_400_000_000,
):
    """Range join: every (left interval [start, end], right row) pair with
    right_ts in the closed interval, per ``on`` key — the third temporal
    join family next to as-of and rolling windows.

    Shape: rights land in exactly ONE (key, time-bucket) group (their own
    bucket), intervals replicate to every bucket they span — so matches
    are found exactly once and no dedupe pass exists.  Per group: sort
    rights, two searchsorted per interval, CSR pair expansion.  Scale
    assumption: interval span / ``bucket_us`` bounds the left replication
    factor (size the bucket to the typical interval, the same rule the
    spatial cell join applies to its query radius)."""
    ls = left.schema()
    lt = dict(zip(ls.names, ls.types))
    rs = right.schema()
    rt = dict(zip(rs.names, rs.types))
    right_src = list(right_cols)
    if not right_src:
        raise ValueError("right_cols must name at least one output column")
    right_dst = [right_cols[c] for c in right_src]
    left_keep = [c for c in left_cols if c != on]
    pad_right = [(d, rt[s]) for s, d in zip(right_src, right_dst)]
    pad_left = [(c, lt[c]) for c in left_keep]

    def prep_left(batch: pa.Table) -> pa.Table:
        s = batch.column(left_start).cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = batch.column(left_end).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = np.floor_divide(s, bucket_us)
        b1 = np.floor_divide(e, bucket_us)
        # inverted intervals (end < start) are EMPTY: zero replicas, zero
        # matches — not a worker-side np.repeat crash
        reps = np.maximum(b1 - b0 + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        out = batch.select([on, *left_keep]).take(pa.array(idx))
        out = out.append_column("_as", pa.array(s[idx]))
        out = out.append_column("_ae", pa.array(e[idx]))
        out = out.append_column("_ats", pa.nulls(len(idx), pa.int64()))
        out = out.append_column("_abucket", pa.array(b0[idx] + offs))
        out = out.append_column("_side", pa.array(np.zeros(len(idx), np.int8)))
        out = _pad_nulls(out, pad_right)
        return out.select(sorted(out.column_names))

    def prep_right(batch: pa.Table) -> pa.Table:
        ats = batch.column(right_ts).cast(pa.int64())
        out = pa.table({on: batch.column(on)})
        for s, d in zip(right_src, right_dst):
            out = out.append_column(d, batch.column(s))
        out = out.append_column("_as", pa.nulls(len(batch), pa.int64()))
        out = out.append_column("_ae", pa.nulls(len(batch), pa.int64()))
        out = out.append_column("_ats", ats)
        out = out.append_column(
            "_abucket",
            pa.array(
                np.floor_divide(ats.to_numpy(zero_copy_only=False), bucket_us)
            ),
        )
        out = out.append_column("_side", pa.array(np.ones(len(batch), np.int8)))
        out = _pad_nulls(out, pad_left)
        return out.select(sorted(out.column_names))

    prep_left.__name__ = "interval_prep_left"
    prep_right.__name__ = "interval_prep_right"
    lp = left.map_batches(prep_left, batch_format="pyarrow")
    rp = right.map_batches(prep_right, batch_format="pyarrow")
    return lp.union(rp).groupby([on, "_abucket"]).map_groups(
        _IntervalGroup(on, left_keep, right_dst), batch_format="pyarrow"
    )


class _WindowGroup:
    __name__ = "window_group"

    def __init__(self, on, keep_cols, window_us):
        self.on = on
        self.keep_cols = list(keep_cols)
        self.window_us = window_us

    def __call__(self, group: pa.Table) -> pa.Table:
        ts = group.column("_ats").to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        group = group.take(pa.array(order))
        vc = group.column("_vc").to_numpy(zero_copy_only=False)
        prefix = np.concatenate([[0], np.cumsum(vc, dtype=np.int64)])
        end = np.searchsorted(ts, ts, side="right")
        start = np.searchsorted(ts, ts - self.window_us, side="left")
        out = group.select([self.on, *self.keep_cols])
        out = out.append_column("w_count", pa.array(end - start, type=pa.int64()))
        out = out.append_column(
            "w_sum_cents", pa.array(prefix[end] - prefix[start], type=pa.int64())
        )
        return out


def windowed_aggregate(
    ds,
    on: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    keep_cols: tuple = (),
):
    """Per-row rolling count + integer-cents sum over [ts - window, ts]
    within each ``on`` key (peer-inclusive, i.e. SQL
    ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW`` semantics).

    One shuffle; per group O(n log n) sort + prefix sums.  Values are
    floored to integer cents BEFORE summing so distributed results are
    exact and SQL-replayable."""

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ats = batch.column(ts_col).cast(pa.int64())
        # null values contribute 0 to the sum (SQL SUM ignores NULLs) but
        # the row still counts (COUNT(*) frame semantics)
        v = pc.fill_null(batch.column(value_col), 0).to_numpy(
            zero_copy_only=False
        )
        out = batch.select([on, *keep_cols])
        out = out.append_column("_ats", ats)
        out = out.append_column(
            "_vc", pa.array(np.floor(v * 100).astype(np.int64))
        )
        return out

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return prepped.groupby(on).map_groups(
        _WindowGroup(on, keep_cols, window_us), batch_format="pyarrow"
    )
