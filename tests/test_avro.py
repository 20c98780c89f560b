"""Avro container codec: hand-derived spec vectors, roundtrips (nulls,
both codecs, multi-block), Ray sink/source glue."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.sources.avro import (
    avro_dataset,
    avro_decode,
    avro_encode,
    avro_schema_for,
    write_avro,
)
from geowave_ray.sources.avro import _encode_body, _zigzag_varint


def test_zigzag_varint_spec_vectors():
    """Values from the Avro 1.11 spec's binary-encoding table."""
    enc, lens = _zigzag_varint(np.array([0, -1, 1, -2, 2, -64, 64, 8192, -8193]))
    want = b"\x00\x01\x02\x03\x04\x7f\x80\x01\x80\x80\x01\x81\x80\x01"
    assert enc.tobytes() == want
    assert lens.tolist() == [1, 1, 1, 1, 1, 1, 2, 3, 3]
    # int64 extremes survive
    big = np.array([2**63 - 1, -(2**63)])
    e, l = _zigzag_varint(big)
    assert l.tolist() == [10, 10]


def test_record_body_hand_vector():
    """One record {x: long=3, s: string="ab"} encoded by hand per spec:
    zigzag(3)=6, then length-2 string."""
    t = pa.table({"x": pa.array([3], pa.int64()), "s": pa.array(["ab"])})
    assert _encode_body(t, avro_schema_for(t)) == b"\x06\x04ab"


def test_union_null_hand_vector():
    """Nullable long column: branch 1 (0x02) + value for set rows, branch
    0 (0x00) and nothing for null rows."""
    t = pa.table({"x": pa.array([3, None], pa.int64())})
    assert _encode_body(t, avro_schema_for(t)) == b"\x02\x06\x00"


def test_container_roundtrip_all_types_and_codecs():
    t = pa.table(
        {
            "a": pa.array([1, -5, 2**62, 0, None], pa.int64()),
            "b": pa.array([1.5, None, -2.25, 0.0, 3e300], pa.float64()),
            "s": pa.array(["hi", "", None, "unié", "x" * 300], pa.string()),
            "raw": pa.array([b"\x00\xff", b"", b"abc", None, b"zz"], pa.large_binary()),
            "f": pa.array([True, False, None, True, False], pa.bool_()),
        }
    )
    for codec in ("null", "deflate"):
        assert avro_decode(avro_encode(t, codec=codec)).equals(t)


def test_multi_block_and_empty():
    t = pa.table(
        {"x": pa.array(np.arange(150_000, dtype=np.int64)), "y": np.arange(150_000) * 0.5}
    )
    data = avro_encode(t, max_block_rows=65536)
    assert avro_decode(data).equals(t)
    empty = pa.table({"x": pa.array([], pa.int64())})
    assert avro_decode(avro_encode(empty)).equals(empty)


def test_guards():
    with pytest.raises(ValueError, match="magic"):
        avro_decode(b"NOPE" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="codec"):
        avro_encode(pa.table({"x": pa.array([1])}), codec="snappy")
    with pytest.raises(NotImplementedError, match="profile"):
        avro_encode(pa.table({"x": pa.array([[1, 2]])}))
    # corrupt sync marker detected
    good = bytearray(avro_encode(pa.table({"x": pa.array([1, 2, 3])})))
    good[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        avro_decode(bytes(good))


def test_determinism():
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    assert avro_encode(t) == avro_encode(t)


def test_ray_sink_source_roundtrip(ray_session, tmp_path):
    import ray

    t = pa.table(
        {
            "k": pa.array(np.arange(500, dtype=np.int64)),
            "name": pa.array([f"row-{i}" for i in range(500)]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    manifest = write_avro(ds, str(tmp_path / "out"), codec="deflate")
    assert manifest["rows"].sum() == 500
    back = avro_dataset(str(tmp_path / "out")).to_pandas().sort_values("k").reset_index(drop=True)
    assert back["k"].tolist() == list(range(500))
    assert back["name"][7] == "row-7"
    with pytest.raises(FileNotFoundError):
        avro_dataset([])
