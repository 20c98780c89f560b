"""SemDeDup keep-rule semantics (stages/dedupe.py::semdedup).

Pins the paper's rule (Abbas et al. 2023): within a cluster, a member is
dropped iff a keep-preferred member (lower sim-to-centroid, then smaller
id) sits within cosine eps of it — so of a near-dup pair the survivor is
the one FARTHER from its centroid.
"""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _ds(ids, vecs):
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t)


def _run(ids, vecs, cents, eps):
    from geowave_ray.stages.ann import _normalize
    from geowave_ray.stages.dedupe import semdedup

    cmat = _normalize(np.asarray(cents, dtype=np.float64))
    out = semdedup(_ds(ids, vecs), ray.put(cmat), eps).to_pandas()
    return sorted(map(tuple, out[["vec_id", "cluster"]].to_numpy().tolist()))


def test_semdedup_keeps_farthest_from_centroid():
    # centroid 0 along +x, centroid 1 along +y.  Vectors 1 and 2 are a
    # near-dup pair in cluster 0; vector 2 is farther from the centroid
    # (lower cosine to +x), so IT survives and 1 drops.  Vector 3 is alone
    # in cluster 1 and always survives.
    ids = [1, 2, 3]
    vecs = [
        [1.0, 0.05],  # very close to centroid 0
        [0.95, 0.31],  # ~18 deg off +x; cos(v1, v2) ~ 0.97
        [0.0, 1.0],
    ]
    cents = [[1.0, 0.0], [0.0, 1.0]]
    assert _run(ids, vecs, cents, eps=0.9) == [(2, 0), (3, 1)]
    # below eps both members of cluster 0 survive
    assert _run(ids, vecs, cents, eps=0.999) == [(1, 0), (2, 0), (3, 1)]


def test_semdedup_exact_dup_tie_breaks_by_id():
    # identical vectors => identical sim-to-centroid; the SMALLER id is
    # keep-preferred.
    ids = [7, 4]
    vecs = [[1.0, 0.2], [1.0, 0.2]]
    cents = [[1.0, 0.0]]
    assert _run(ids, vecs, cents, eps=0.99) == [(4, 0)]


def test_pq_encode_codes_and_ties():
    """pq_encode: nearest-subvector codes, little-end 4-bit packing, ties
    to the smallest centroid index."""
    import numpy as np

    from geowave_ray.stages.ann import pq_encode

    # d=4, m=2 subspaces of 2 dims; codebook k=2
    cb = np.array(
        [  # centroid 0: sub0=(0,0), sub1=(1,1); centroid 1: sub0=(2,2), sub1=(1,1)
            [[0.0, 0.0], [1.0, 1.0]],
            [[2.0, 2.0], [1.0, 1.0]],
        ]
    )
    vecs = [
        [0.1, 0.1, 1.0, 1.0],  # sub0 -> c0, sub1 tie -> c0  => code 0 | 0<<4 = 0
        [2.0, 2.0, 1.0, 1.0],  # sub0 -> c1, sub1 tie -> c0  => 1 | 0<<4 = 1
    ]
    t = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }
    )
    out = (
        pq_encode(ray.data.from_arrow(t), ray.put(cb), 2)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert list(out["pq_code"]) == [0, 1]
