"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in geowave_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derived image points ->
    tiered-Hilbert cell encode -> broadcast spatial join against the zone
    layer.  Returns the match Dataset (image_id, cell, zone_id, category)."""
    from geowave_ray.pipelines.queries import _events_points
    from geowave_ray.sources.images import zones_from_range
    from geowave_ray.stages.encode import CellEncoder
    from geowave_ray.stages.join import broadcast_spatial_join, default_concurrency

    sf_dir = "/root/testdata/sf0.001"
    pts = _events_points(sf_dir)
    from geowave_ray.stages.util import stage_fn

    encoded = pts.map_batches(stage_fn(CellEncoder, bits=31), batch_format="pyarrow")
    return broadcast_spatial_join(
        encoded,
        zones_from_range(200),
        point_cols=("image_id", "cell"),
        zone_cols=("zone_id",),
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (plus
    the training-data operators: dedup, ANN, text analysis)."""
    from geowave_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names, integer-exact aggregates; see pipelines/queries.py docstring)."""
    from geowave_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
