"""Cluster job entry point — the ``ray job submit`` deployment story.

North rule: "run via ray job submit on a fixed-size multi-node Ray cluster".
In-sandbox this runs against a local session; on a real cluster submit as:

    ray job submit --working-dir /root/repo -- \
        python scripts/run_job.py --images 100000000 --zones 100000 \
            --out /mnt/shared/out

The job is the headline pipeline (cell encode -> broadcast spatial join ->
tile render) writing checkpoint-resumable partitioned parquet; per-stage
metrics print as JSON at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1_000_000)
    ap.add_argument("--zones", type=int, default=10_000)
    ap.add_argument("--render", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/geowave_ray_job")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # on a real cluster ray job submit provides the address; local
        # fallback for the sandbox
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    from geowave_ray.sources.images import synth_images_ds, synth_zones_table
    from geowave_ray.stages.encode import CellEncoder
    from geowave_ray.stages.join import broadcast_spatial_join
    from geowave_ray.stages.tiles import TileRenderStage
    from geowave_ray.stages.util import stage_fn
    from geowave_ray.state.manifest import PartitionManifest

    os.makedirs(args.out, exist_ok=True)
    manifest = PartitionManifest(args.out)
    zones = synth_zones_table(args.zones, size_scale=0.1)
    metrics = {}

    if not manifest.is_complete("join"):
        t0 = time.time()
        images = synth_images_ds(args.images, with_bytes=False)
        encoded = images.map_batches(
            stage_fn(CellEncoder, bits=31), batch_format="pyarrow"
        )
        matches = broadcast_spatial_join(
            encoded, zones, point_cols=("image_id", "cell"), zone_cols=("zone_id",)
        )
        matches.write_parquet(os.path.join(args.out, "matches"))
        manifest.record("join", rows=args.images, wall_s=time.time() - t0)
    metrics["join"] = manifest.entries["join"]

    if not manifest.is_complete("tiles"):
        from geowave_ray.sources.images import build_blob_pool, synth_images_ds_pooled

        t0 = time.time()
        pool_ref = build_blob_pool(4096)
        images = synth_images_ds_pooled(args.render, 4096, pool_ref)
        tiles = images.map_batches(
            stage_fn(TileRenderStage, pixel_res_deg=1e-4), batch_format="pyarrow"
        )
        tiles.write_parquet(os.path.join(args.out, "tiles"))
        manifest.record("tiles", rows=args.render, wall_s=time.time() - t0)
    metrics["tiles"] = manifest.entries["tiles"]

    print(json.dumps({"job": "geowave-ray-flagship", "out": args.out, "metrics": metrics}))
    ray.shutdown()


if __name__ == "__main__":
    main()
