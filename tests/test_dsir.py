"""DSIR importance resampling (stages/text.dsir_importance)."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _corpus():
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
        else:
            rows.append((i, "der schnelle braune fuchs springt hoch", "de"))
    rows.append((100, "", "en"))  # zero-token doc
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
        }
    )


def test_dsir_scores_target_like_docs_higher(ray_session):
    from geowave_ray.stages.text import dsir_importance

    out = (
        dsir_importance(ray.data.from_arrow(_corpus()))
        .to_pandas()
        .set_index("doc_id")["dsir_score"]
    )
    en = out[[i for i in range(40) if i % 2 == 0]].mean()
    de = out[[i for i in range(40) if i % 2 == 1]].mean()
    assert en > de  # target-distribution docs rank higher
    assert out[100] == 0  # zero-token doc scores 0


def test_dsir_matches_reference_computation(ray_session):
    """Hand-rolled single-process reference over the same spec."""
    from geowave_ray.stages.text import dsir_importance
    from geowave_ray.stages.texthash import splitmix64, tokenize_hash

    t = _corpus()
    out = (
        dsir_importance(ray.data.from_arrow(t), n_buckets=64)
        .to_pandas()
        .set_index("doc_id")["dsir_score"]
    )

    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    tb = tokenize_hash(texts)
    b = (splitmix64(tb.tok_hashes) % np.uint64(64)).astype(np.int64)
    doc_of = np.repeat(np.arange(tb.n_docs), np.diff(tb.tok_offsets))
    raw = np.bincount(b, minlength=64)
    is_en = np.array([lg == "en" for lg in langs])
    tgt = np.bincount(b[is_en[doc_of]], minlength=64)
    w = (1_000_000 * (tgt + 1)) // (raw + 1)
    sc = np.zeros(len(texts), dtype=np.int64)
    np.add.at(sc, doc_of, w[b])
    ids = t.column("doc_id").to_pylist()
    for i, d in enumerate(ids):
        assert out[d] == sc[i]
