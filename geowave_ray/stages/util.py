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

    Works around a Ray Data 2.49 quirk: ``map_batches`` passes 0-row input
    blocks through WITHOUT running the UDF, producing 0-row 0-COLUMN
    blocks; a downstream hash ``Dataset.join`` then fails with
    "No match ... for key field reference" when such a block lands in a
    partition.  Only block *references* move here — no data is pulled to
    the driver (metadata row counts decide).  ``schema`` (pa.schema) is
    used to synthesize a typed empty dataset when every block is empty."""
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
):
    """``Dataset.join`` with empty-input handling.

    Ray Data 2.49's hash join crashes ("No match ... for key field
    reference") when one side has NO non-empty blocks — empty blocks'
    shuffle shards never reach the aggregators, whose ArrowBlockBuilder
    then builds a 0-column partition table.  This wrapper (a) strips
    0-row blocks (see drop_empty_blocks), and (b) short-circuits fully
    empty sides driver-side: empty left (or inner with empty right) ->
    typed empty result; left_outer with empty right -> left rows with
    null-filled right columns."""
    import numpy as np  # noqa: F401  (kept for parity with callers)
    import pyarrow as pa
    import ray

    l2 = drop_empty_blocks(left, left_schema)
    r2 = drop_empty_blocks(right, right_schema)
    if assume_nonempty:
        # caller guarantees both sides hold rows: skip the count()-based
        # empty-side short-circuit (the 0-row-block strip above is still
        # required — Ray 2.49's hash join crashes on schema-less blocks)
        return l2.join(r2, join_type, num_partitions, on=on, right_on=right_on)
    l_empty = l2.count() == 0
    r_empty = r2.count() == 0
    if not l_empty and not r_empty:
        return l2.join(r2, join_type, num_partitions, on=on, right_on=right_on)

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
