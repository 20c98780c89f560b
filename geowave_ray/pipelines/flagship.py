"""Flagship pipeline: ingest -> cell encode -> spatial join -> tile assign.

This is the end-to-end slice of SURVEY §7 Phase 2-5 and the headline
benchmark job (BASELINE.md): image-shaped rows are keyed by tiered-Hilbert
cell (vectorized map_batches), spatially joined against the polygon layer
via the broadcast R-tree path (no shuffle of image bytes), and assigned
pyramid tiles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import synth_images_ds, synth_zones_table
from ..stages.encode import CellEncoder
from ..stages.join import broadcast_spatial_join, default_concurrency
from ..stages.tiles import TileAssigner

__all__ = ["flagship_pipeline", "run_flagship"]


def flagship_pipeline(images_ds, zones: pa.Table, bits: int = 31, concurrency: int | None = None):
    """-> (joined matches Dataset, tile assignment Dataset).  Both lazy."""
    from ..stages.util import stage_fn

    encoded = images_ds.map_batches(
        stage_fn(CellEncoder, bits=bits), batch_format="pyarrow"
    )
    matches = broadcast_spatial_join(
        encoded,
        zones,
        point_cols=("image_id", "cell"),
        zone_cols=("zone_id", "category"),
    )
    tiles = encoded.map_batches(
        stage_fn(TileAssigner, keep_cols=("image_id",)), batch_format="pyarrow"
    )
    return matches, tiles


def run_flagship(n_images: int = 10_000, n_zones: int = 200, concurrency: int | None = None):
    """Small self-contained run (entry smoke): synthetic inputs, returns the
    join-match Dataset."""
    images = synth_images_ds(n_images, with_bytes=False)
    zones = synth_zones_table(n_zones)
    matches, tiles = flagship_pipeline(images, zones, concurrency=concurrency)
    return matches
