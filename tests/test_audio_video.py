"""Audio (RIFF/WAV codec + features) and video (FVC1 container + frame
sampling) multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.stages.audio import (
    AudioFeaturizer,
    audio_features,
    resample_linear,
    wav_decode,
    wav_encode,
)
from geowave_ray.stages.video import (
    FrameSampler,
    fvc_decode_frames,
    fvc_encode,
    fvc_info,
    sample_indices,
)

RNG = np.random.default_rng(3)


def test_wav_int16_mono_roundtrip_lossless():
    s = RNG.integers(-32768, 32768, 1000).astype(np.int16)
    back, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000 and back.shape == (1000, 1)
    np.testing.assert_array_equal(back[:, 0], s)


def test_wav_stereo_interleave():
    s = RNG.integers(-32768, 32768, (500, 2)).astype(np.int16)
    back, rate = wav_decode(wav_encode(s, 44100))
    assert back.shape == (500, 2)
    np.testing.assert_array_equal(back, s)


def test_wav_8bit_and_float32():
    f = RNG.uniform(-1, 1, 256)
    b8, _ = wav_decode(wav_encode(f, 8000, bits=8))
    assert b8.dtype == np.uint8 and b8.shape == (256, 1)
    np.testing.assert_allclose((b8[:, 0].astype(float) - 128) / 127, f, atol=0.005)
    b32, _ = wav_decode(wav_encode(f, 8000, bits=32))
    np.testing.assert_allclose(b32[:, 0], f.astype(np.float32))


def test_wav_skips_unknown_chunks():
    import struct

    blob = bytearray(wav_encode(np.zeros(10, np.int16), 8000))
    # splice a LIST chunk between fmt and data
    data_at = blob.find(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(blob[:data_at]) + extra + bytes(blob[data_at:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = wav_decode(spliced)
    assert len(back) == 10 and rate == 8000


def test_wav_unsupported_payload():
    with pytest.raises(NotImplementedError):
        wav_decode(b"ID3\x03" + bytes(100))  # mp3-ish


def test_audio_features_and_resample():
    s = np.array([5, -3, -2, 4, 0, -1], dtype=np.int16)
    f = audio_features(s)
    # sign changes: 5/-3, -2/4, (4/0 no: 0 is non-negative... 4>=0,0>=0), 0/-1
    assert f == {"n_samples": 6, "sum_abs": 15, "peak": 5, "zero_crossings": 3}
    r = resample_linear(np.arange(10.0), 10, 5)
    assert r.shape == (5, 1)
    assert r[0, 0] == 0.0 and r[-1, 0] == 9.0


def test_audio_featurizer_batch(ray_session):
    blobs = [wav_encode(RNG.integers(-100, 100, 64).astype(np.int16), 8000) for _ in range(5)]
    batch = pa.table({"clip_id": pa.array(range(5), type=pa.int64()),
                      "audio": pa.array(blobs, type=pa.binary())})
    out = AudioFeaturizer()(batch)
    assert out.column_names == ["clip_id", "n_samples", "sum_abs", "peak",
                                "zero_crossings", "sample_rate"]
    assert out.column("n_samples").to_pylist() == [64] * 5


def test_fvc_partial_decode_and_info():
    frames = RNG.integers(0, 256, (7, 16, 16), dtype=np.uint8)
    blob = fvc_encode(frames, fmt="png")
    info = fvc_info(blob)
    assert (info["n_frames"], info["width"], info["height"], info["channels"]) == (7, 16, 16, 1)
    got = fvc_decode_frames(blob, [0, 3, 6])
    for i, g in zip([0, 3, 6], got):
        np.testing.assert_array_equal(np.asarray(g).squeeze(), frames[i])
    with pytest.raises(IndexError):
        fvc_decode_frames(blob, [7])


def test_fvc_rgb_and_unsupported():
    frames = RNG.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    blob = fvc_encode(frames, fmt="png")
    got = fvc_decode_frames(blob, [1])
    np.testing.assert_array_equal(np.asarray(got[0]), frames[1])
    with pytest.raises(NotImplementedError):
        fvc_info(b"\x00\x00\x00\x20ftypisom")  # mp4-ish


def test_sample_indices_rule():
    np.testing.assert_array_equal(sample_indices(7, 3), [0, 2, 4])
    np.testing.assert_array_equal(sample_indices(3, 3), [0, 1, 2])
    np.testing.assert_array_equal(sample_indices(2, 3), [0, 1])  # k clamped


def test_frame_sampler_batch():
    frames = np.stack([np.full((8, 8), v, np.uint8) for v in (10, 20, 30, 40, 50)])
    blob = fvc_encode(frames, fmt="png")
    batch = pa.table({"clip_id": pa.array([9], type=pa.int64()),
                      "video": pa.array([blob], type=pa.binary())})
    out = FrameSampler(k=3)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 1, 3]
    assert out.column("sum_intensity").to_pylist() == [640, 1280, 2560]
    assert out.column("n_frames").to_pylist() == [5, 5, 5]


def test_audio_features_float_samples_scaled():
    f = np.array([0.5, -0.5, 0.25])
    feats = audio_features(f)
    assert feats["peak"] == 16384 and feats["zero_crossings"] == 2
    # float32 WAV end-to-end produces non-degenerate features
    blob = wav_encode(f, 8000, bits=32)
    samples, _ = wav_decode(blob)
    assert audio_features(samples)["sum_abs"] > 0
