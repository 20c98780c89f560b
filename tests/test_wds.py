"""WebDataset tar shard sink/source (sources/wds.py)."""

import os
import shutil

import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _rows():
    return pa.table(
        {
            "image_id": pa.array(["img-0", "img-1", "img-2"]),
            "fmt": pa.array(["png", "jpeg", "png"]),
            "bytes": pa.array([b"\x89PNGdata", b"\xff\xd8jpeg", b"\x89PNG2"],
                              type=pa.large_binary()),
            "caption": pa.array(["a photo", "unicode café", "third"]),
        }
    )


def test_wds_roundtrip_and_determinism(tmp_path):
    from geowave_ray.sources.wds import wds_dataset, write_wds_shards

    out = str(tmp_path / "wds")
    ds = ray.data.from_arrow(_rows())
    man = write_wds_shards(ds, out).to_pandas()
    assert man["n"].sum() == 3
    assert man["payload_bytes"].sum() == sum(
        len(b) for b in _rows().column("bytes").to_pylist()
    ) + sum(len(c.encode()) for c in _rows().column("caption").to_pylist())

    back = wds_dataset(out).to_pandas().sort_values("image_id").reset_index(drop=True)
    src = _rows().to_pandas()
    assert list(back["image_id"]) == list(src["image_id"])
    assert list(back["fmt"]) == list(src["fmt"])
    assert list(back["caption"]) == list(src["caption"])
    assert [bytes(b) for b in back["bytes"]] == [bytes(b) for b in src["bytes"]]

    # deterministic shard bytes: rewrite -> identical tar content
    blobs1 = {f: open(os.path.join(out, f), "rb").read() for f in os.listdir(out)}
    shutil.rmtree(out)
    write_wds_shards(ray.data.from_arrow(_rows()), out).to_pandas()
    blobs2 = {f: open(os.path.join(out, f), "rb").read() for f in os.listdir(out)}
    assert blobs1 == blobs2


def test_wds_missing_dir_raises(tmp_path):
    from geowave_ray.sources.wds import wds_dataset

    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        wds_dataset(empty)
