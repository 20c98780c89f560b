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

__all__ = ["stage_fn"]


def stage_fn(cls, **kwargs):
    holder: dict = {}

    def fn(batch):
        inst = holder.get("inst")
        if inst is None:
            inst = holder["inst"] = cls(**kwargs)
        return inst(batch)

    fn.__name__ = getattr(cls, "__name__", cls.__class__.__name__)
    return fn
