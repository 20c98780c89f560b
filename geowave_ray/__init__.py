"""geowave_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query / data-processing
capabilities of GeoWave (rfecher/geowave) on top of ``ray.data``:

- ``geowave_ray.index``   — space-filling-curve kernels (compact Hilbert,
  Z-order, XZ), tiered index strategy, dimension definitions, geohash /
  equal-angle grid cell schemes (pure NumPy, vectorized).
- ``geowave_ray.geom``    — WKB codec + DE-9IM-style spatial predicates +
  bbox candidate index (pure NumPy; no shapely in this environment).
- ``geowave_ray.stages``  — Ray Data batch transforms / actor-pool stages:
  cell encoding, spatial refinement, joins, kNN, tiling, dedup, text, ANN.
- ``geowave_ray.query``   — query planning (geometry -> (tier, cell) ranges)
  and expression filters.
- ``geowave_ray.state``   — per-partition lineage manifest / checkpoint-resume.
- ``geowave_ray.sources`` — deterministic synthetic image/zone tables and
  partitioned parquet IO.

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"
