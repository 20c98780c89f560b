"""Cross-modal pair mining (stages/crossmodal.py)."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _tbl(rows):
    ids, ph, cap = zip(*rows)
    return pa.table(
        {
            "image_id": pa.array(ids, type=pa.int64()),
            "phash": pa.array(ph, type=pa.int64()),
            "caption": pa.array(cap),
        }
    )


def test_within_group_diff_pairs(ray_session):
    from geowave_ray.stages.crossmodal import within_group_diff_pairs

    t = _tbl(
        [
            (1, 10, "a cat"),
            (2, 10, "a dog"),   # same phash, new caption -> pair (1,2)
            (3, 10, "a cat"),   # same phash, same caption as 1 -> no (1,3)
            (4, 20, "a cat"),   # other group
        ]
    )
    out = (
        within_group_diff_pairs(
            ray.data.from_arrow(t), group_col="phash", diff_col="caption"
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.to_numpy())) == [(1, 2), (2, 3)]


def test_within_group_diff_pairs_skew_guard(ray_session):
    from geowave_ray.stages.crossmodal import within_group_diff_pairs

    t = _tbl([(i, 10, f"c{i}") for i in range(10)])
    out = within_group_diff_pairs(
        ray.data.from_arrow(t), group_col="phash", diff_col="caption", max_group=5
    ).to_pandas()
    assert len(out) == 0  # over-cap group skipped, not exploded


def test_hard_negative_pairs_exact(ray_session):
    """Brute-force parity on a deterministic table (exactness for
    max_hamming < bands)."""
    from geowave_ray.sources.images import crossmodal_batch
    from geowave_ray.stages.crossmodal import hard_negative_pairs

    t = crossmodal_batch(np.arange(600, dtype=np.int64))
    out = (
        hard_negative_pairs(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )

    ph = t.column("phash").to_numpy().astype(np.uint64)
    caps = [set(c.lower().split()) for c in t.column("caption").to_pylist()]
    expect = []
    for i in range(len(ph)):
        for j in range(i + 1, len(ph)):
            ham = bin(int(ph[i] ^ ph[j])).count("1")
            if ham > 2:
                continue
            inter = len(caps[i] & caps[j])
            union = len(caps[i]) + len(caps[j]) - inter
            jm = (1000 * inter) // union if union else 1000
            if jm < 700:
                expect.append((i, j, ham, jm))
    got = list(map(tuple, out.to_numpy()))
    assert got == expect and len(expect) > 0


def test_hard_negative_pairs_requires_complete_banding(ray_session):
    from geowave_ray.stages.crossmodal import hard_negative_pairs

    with pytest.raises(ValueError):
        hard_negative_pairs(None, max_hamming=4, bands=4)
