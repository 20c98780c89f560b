"""Stage-execution helpers.

``stage_fn(cls, **kwargs)`` wraps a callable-class stage as a plain function
with a per-worker-process instance cache.  Ray Data runs plain functions on
the TASK pool — pre-warmed worker processes, no per-execution actor spawn —
which is the right trade when stage state is cheap to build (curve tables,
a broadcast lookup): construction happens once per worker process on first
use, exactly like an actor ``__init__``, but without paying ~0.5-1s actor
startup x pool-size on every dataset execution.

Keep real actor pools (``map_batches(Cls, concurrency=...)``) for genuinely
heavy state (multi-GB models); use ``stage_fn`` for everything else.
"""

from __future__ import annotations

__all__ = [
    "stage_fn",
    "drop_empty_blocks",
    "safe_join",
    "collect_table",
    "broadcast_membership_filter",
    "bloom_anti_filter",
]


def broadcast_membership_filter(ds, ids, col: str, keep_members: bool):
    """Streaming semi (``keep_members=True``) / anti filter of ``ds``
    against a broadcast id set — the shuffle-free replacement for a
    semi/anti hash join when the id side is proven small.  ``ids`` is
    sorted once on the driver and ray.put; each batch does one
    searchsorted membership test.  An EMPTY id set means no members:
    semi drops everything, anti keeps everything."""
    import numpy as np
    import pyarrow as pa
    import ray

    ref = ray.put(np.sort(np.asarray(ids)))

    def fn(batch):
        wanted = ray.get(ref)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if len(wanted) == 0:
            member = np.zeros(len(v), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(wanted, v), 0, len(wanted) - 1)
            member = wanted[pos] == v
        return batch.filter(pa.array(member if keep_members else ~member))

    fn.__name__ = f"bcast_{'semi' if keep_members else 'anti'}_{col}"
    return ds.map_batches(fn, batch_format="pyarrow")


def bloom_m_bits(n_drop: int) -> int:
    """Bloom capacity for ``n_drop`` ids: next power of two >= 10 bits/id
    (fpr ~1.2% at k=4), clamped to [2^20, 2^30] so the broadcast bitmap
    never exceeds 128 MiB."""
    return 1 << max(20, min(30, (10 * max(1, n_drop) - 1).bit_length()))


def bloom_anti_filter(
    ds,
    drop_ds,
    col: str,
    num_partitions: int = 32,
    m_bits: int | None = None,
    k: int = 4,
):
    """EXACT anti-filter of ``ds`` against a drop-id set TOO LARGE to
    broadcast exactly: the >cap scale path for dedup removal (the in-code
    promise of broadcast_membership_filter's docstring made real).

    A Bloom filter over the drop ids (distributed partial bitmaps,
    OR-merged on the driver — m_bits/8 bytes each, bounded by block
    count) streams over ``ds`` once: rows the bloom rejects are
    DEFINITELY not dropped and pass straight through; only the
    maybe-member residue (|drops| x (1+fpr) rows, corpus-scale smaller)
    goes through the exact left_anti hash join.  False positives only
    route extra rows to the exact join — never a wrong drop, so the
    result is exact.  ``col`` must be integer-typed.

    ``m_bits=None`` (the default) sizes the filter from the drop count:
    next power of two >= 10 bits/id (fpr ~1.2% at k=4), clamped to
    [2^20, 2^30] — the bitmap stays <= 128 MiB while the residual join
    stays ~|drops| instead of degrading when |drops| outgrows a fixed
    capacity."""
    import numpy as np
    import pyarrow as pa
    import ray

    from .aggregate import BloomFilter

    drop_ds = drop_ds.materialize()  # consumed twice: bloom build + residual join
    if m_bits is None:
        m_bits = bloom_m_bits(drop_ds.count())

    def bpart(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        bf.add_ints(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([bf.to_bytes()], type=pa.large_binary())})

    bpart.__name__ = "bloom_partial"
    parts = drop_ds.map_batches(bpart, batch_format="pyarrow").take_all()
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    ref = ray.put(bits)

    def split(keep_maybe: bool):
        def fn(batch: pa.Table) -> pa.Table:
            bf = BloomFilter(m_bits, k, ray.get(ref))
            maybe = bf.might_contain(
                batch.column(col).to_numpy(zero_copy_only=False)
            )
            return batch.filter(pa.array(maybe if keep_maybe else ~maybe))

        fn.__name__ = f"bloom_{'maybe' if keep_maybe else 'sure'}_{col}"
        return fn

    sure_keep = ds.map_batches(split(False), batch_format="pyarrow")
    maybe = ds.map_batches(split(True), batch_format="pyarrow")
    # residual exact check — maybe/drops can both be empty-ish per block;
    # default safe_join path is fine here (both already bounded)
    residual = safe_join(
        maybe, drop_ds, "left_anti", num_partitions, on=(col,)
    )
    return sure_keep.union(residual)


def collect_table(ds):
    """Materialized Dataset -> one driver-side Arrow table (block refs
    pulled, no row-dict conversion); None when every block is empty.
    Only for datasets a caller has PROVEN small (row-count cap)."""
    import pyarrow as pa
    import ray

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    tables = [t for t in ray.get(refs) if len(t)]
    if not tables:
        return None
    return pa.concat_tables(tables)


def stage_fn(cls, **kwargs):
    holder: dict = {}

    def fn(batch):
        inst = holder.get("inst")
        if inst is None:
            inst = holder["inst"] = cls(**kwargs)
        return inst(batch)

    fn.__name__ = getattr(cls, "__name__", cls.__class__.__name__)
    return fn


def drop_empty_blocks(ds, schema=None):
    """Materialize and rebuild a Dataset from its non-empty blocks only.

    Ray Data 2.49's hash join fails ("No match ... for key field
    reference") when a side's FIRST block is 0-row (see safe_join);
    stripping empty blocks guarantees a non-empty first block whenever
    any rows exist at all.  On an already-materialized dataset this is
    metadata-only: block *references* move, no data is pulled to the
    driver (metadata row counts decide).  On a lazy dataset the
    materialize() is a pipeline barrier — prefer safe_join's sentinel
    mode there.  ``schema`` (pa.schema) is used to synthesize a typed
    empty dataset when every block is empty."""
    import pyarrow as pa
    import ray

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        if schema is not None:
            return ray.data.from_arrow(schema.empty_table())
        return mat  # fully empty, no schema hint — nothing to fix
    return ray.data.from_arrow_refs(refs)


def _pa_schema_of(ds, hint):
    import pyarrow as pa

    if hint is not None:
        return hint
    s = ds.schema()
    return pa.schema(list(zip(s.names, s.types)))


def safe_join(
    left,
    right,
    join_type: str,
    num_partitions: int,
    on,
    right_on=None,
    left_schema=None,
    right_schema=None,
    assume_nonempty: bool = False,
    sentinel: int | None = None,
):
    """``Dataset.join`` with empty-SIDE handling.

    Ray Data 2.49's hash join crashes (``HashShuffleAggregator.finalize``
    ArrowInvalid) exactly when a side's FIRST block is 0-row — typed or
    schema-less, with or without later data blocks.  Empty blocks in any
    later position are harmless, as are 0-column blocks under
    select/groupby/sort/union (all verified empirically; regression-
    tested in tests/test_util.py).  So:

    - ``assume_nonempty=True`` is a ZERO-overhead direct join: no
      materialize, no block strip — the pipeline streams end to end.
      Safe ONLY when both sides' first block is structurally non-empty:
      a read_parquet of a non-empty file, or a materialized dataset the
      caller has passed through ``drop_empty_blocks`` (metadata-only on
      already-materialized data — no extra compute).
    - ``sentinel=<int>`` keeps a possibly-empty-side join FULLY STREAMING:
      for a single-int64-key join it PREPENDS one sentinel row to each
      side (left key=sentinel, right key=sentinel-1 — mutually
      non-matching, so they produce no joined pair), making each side's
      first block structurally non-empty, then filters
      ``left_key == sentinel`` out of the result.  The caller must
      reserve two key values outside the data domain (our internal ids
      are non-negative, so ``-(2**62)`` works).  Requires
      left_schema/right_schema for the sentinel rows.
    - the default path materializes each side once (unavoidable: the
      emptiness of an arbitrary lazy Dataset is unknowable without
      running it) and reads metadata row counts; a fully-empty side is
      short-circuited driver-side: empty left (or inner with empty
      right) -> typed empty result; left_outer with empty right -> left
      rows with null-filled right columns."""
    import numpy as np  # noqa: F401  (kept for parity with callers)
    import pyarrow as pa
    import ray

    def _join(l, r):
        # Cap each join's aggregator-actor pool at ~1/8 of cluster CPUs.
        # Ray 2.49's default reserves (CPU/2)/num_partitions per
        # partition — with the streaming joins above, SEVERAL
        # JoinOperators can be live in one DAG, and their pools plus
        # upstream tasks then oversubscribe the cluster and deadlock
        # (observed: 3 concurrent 16-partition joins on 4 CPUs).  The
        # reservation only gates scheduling; finalize throughput is set
        # by the number of aggregator processes, not this fraction.
        kwargs = {}
        if ray.is_initialized():
            ncpu = ray.cluster_resources().get("CPU")
            if ncpu:
                kwargs["aggregator_ray_remote_args"] = {
                    "num_cpus": max(0.01, round(ncpu * 0.125 / num_partitions, 3))
                }
        return l.join(
            r, join_type, num_partitions, on=on, right_on=right_on, **kwargs
        )

    if assume_nonempty:
        return _join(left, right)
    if sentinel is not None:
        lkey = on[0] if not isinstance(on, str) else on
        rkey = (right_on[0] if not isinstance(right_on, str) else right_on) if right_on else lkey
        assert (not isinstance(on, (list, tuple))) or len(on) == 1, (
            "sentinel mode implements single-key joins only"
        )
        assert left_schema is not None and right_schema is not None, (
            "sentinel mode needs both schemas to build sentinel rows"
        )

        def one_row(schema: "pa.Schema", key: str, val: int) -> "pa.Table":
            return pa.table(
                {
                    f.name: (pa.array([val], f.type) if f.name == key
                             else pa.nulls(1, f.type))
                    for f in schema
                }
            )

        # sentinel PREPENDED: the crash condition is an empty FIRST block
        l3 = ray.data.from_arrow(one_row(left_schema, lkey, sentinel)).union(left)
        r3 = ray.data.from_arrow(one_row(right_schema, rkey, sentinel - 1)).union(right)
        joined = _join(l3, r3)

        def drop_sentinel(batch: "pa.Table") -> "pa.Table":
            import pyarrow.compute as pc

            keep = pc.not_equal(batch.column(lkey), pa.scalar(sentinel, pa.int64()))
            return batch.filter(pc.fill_null(keep, True))

        drop_sentinel.__name__ = "drop_sentinel_" + lkey
        return joined.map_batches(drop_sentinel, batch_format="pyarrow")
    l2 = left.materialize()
    r2 = right.materialize()
    l_empty = l2.count() == 0  # metadata-only after materialize
    r_empty = r2.count() == 0
    if not l_empty and not r_empty:
        # strip empty blocks (metadata-only on materialized data) so the
        # first block of each side is guaranteed non-empty
        l2 = drop_empty_blocks(l2, left_schema)
        r2 = drop_empty_blocks(r2, right_schema)
        return _join(l2, r2)

    assert join_type in ("inner", "left_outer", "left_semi", "left_anti"), (
        "safe_join empty-side shortcut only implements "
        "inner/left_outer/left_semi/left_anti; got " + join_type
    )
    ls = _pa_schema_of(l2, left_schema)
    if join_type in ("left_semi", "left_anti"):
        if l_empty or (r_empty and join_type == "left_semi"):
            return ray.data.from_arrow(ls.empty_table())
        return l2  # left_anti with empty right keeps every left row
    rs = _pa_schema_of(r2, right_schema)
    rkeys = set(right_on or on)
    extra = [f for f in rs if f.name not in rkeys]
    out_schema = pa.schema(list(ls) + extra)
    if l_empty or join_type == "inner":
        return ray.data.from_arrow(out_schema.empty_table())

    # left_outer with empty right: left rows + null right columns
    def add_nulls(batch: pa.Table) -> pa.Table:
        out = batch
        for f in extra:
            out = out.append_column(f.name, pa.nulls(len(batch), f.type))
        return out

    add_nulls.__name__ = "left_outer_null_right"
    return l2.map_batches(add_nulls, batch_format="pyarrow")
