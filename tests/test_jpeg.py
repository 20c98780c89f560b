"""Baseline JPEG codec (pure NumPy, stages/jpeg.py): round-trip PSNR,
subsampling, restart intervals, table integrity, dispatch."""

import numpy as np
import pytest

from geowave_ray.stages.imaging import decode_image, encode_image, psnr
from geowave_ray.stages.jpeg import (
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _ZZ,
    jpeg_decode,
    jpeg_encode,
)


def _smooth_rgb(h, w):
    gy, gx = np.mgrid[0:h, 0:w]
    sx, sy = 200.0 / max(w - 1, 1), 200.0 / max(h - 1, 1)
    return np.stack([gx * sx, gy * sy, 20 + (gx * sx + gy * sy) / 2], axis=-1).astype(
        np.uint8
    )


def test_annex_k_tables_complete():
    # canonical-code preconditions: counts match, all symbols present
    for bits, vals in (
        (_DC_LUMA_BITS, _DC_LUMA_VALS),
        (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals) == 12 and sorted(vals) == list(range(12))
    want_ac = {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0}
    for bits, vals in (
        (_AC_LUMA_BITS, _AC_LUMA_VALS),
        (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals) == 162
        assert set(vals) == want_ac
    # zigzag is a permutation with the canonical first steps
    assert sorted(_ZZ.tolist()) == list(range(64))
    assert _ZZ[:6].tolist() == [0, 1, 8, 16, 9, 2]


@pytest.mark.parametrize("dims", [(64, 64), (50, 37), (8, 8), (17, 23)])
def test_rgb_roundtrip_psnr(dims):
    arr = _smooth_rgb(*dims)
    blob = jpeg_encode(arr, quality=90, subsample="444")
    dec = jpeg_decode(blob)
    assert dec.shape == arr.shape
    assert psnr(dec, arr) >= 40.0


@pytest.mark.parametrize("dims", [(64, 64), (50, 37), (8, 8), (17, 23)])
def test_rgb_roundtrip_420(dims):
    # 4:2:0 halves chroma resolution: steep chroma gradients legitimately
    # lose detail, so the >=40dB contract is asserted on low-chroma content
    # (near-gray), the strong-gradient case keeps a looser floor
    h, w = dims
    g = _smooth_rgb(h, w)[:, :, 0].astype(np.int16)
    low_chroma = np.clip(
        np.stack([g, g + 4, g + 8], axis=-1), 0, 255
    ).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(low_chroma, quality=90, subsample="420"))
    assert dec.shape == low_chroma.shape
    assert psnr(dec, low_chroma) >= 40.0
    strong = _smooth_rgb(h, w)
    assert psnr(jpeg_decode(jpeg_encode(strong, 90, subsample="420")), strong) >= 28.0


def test_gray_roundtrip():
    g = _smooth_rgb(41, 29)[:, :, 0]
    dec = jpeg_decode(jpeg_encode(g, quality=90))
    assert dec.shape == (41, 29, 1)
    assert psnr(dec[:, :, 0], g) >= 40.0


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_intervals(ri):
    arr = _smooth_rgb(48, 48)
    for ss in ("444", "420"):
        blob = jpeg_encode(arr, quality=90, subsample=ss, restart_interval=ri)
        assert psnr(jpeg_decode(blob), arr) >= 40.0


def test_noise_survives_entropy_coder():
    """Incompressible content must still round-trip to the quantization
    floor (guards the Huffman/bitstream path, not just smooth images)."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(g, quality=95))[:, :, 0]
    assert psnr(dec, g) >= 35.0


def test_quality_monotone():
    arr = _smooth_rgb(64, 64)
    sizes = [len(jpeg_encode(arr, quality=q)) for q in (25, 50, 75, 95)]
    assert sizes == sorted(sizes)
    assert psnr(jpeg_decode(jpeg_encode(arr, 95)), arr) > psnr(
        jpeg_decode(jpeg_encode(arr, 25)), arr
    )


def test_errors_and_dispatch():
    arr = _smooth_rgb(16, 16)
    blob = bytearray(jpeg_encode(arr))
    # flip SOF0 -> SOF3 (lossless): explicit NotImplementedError
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(blob))
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    # encode_image/decode_image dispatch on the SOI magic
    blob2 = encode_image(arr, "jpeg")
    assert blob2[:2] == b"\xff\xd8"
    assert psnr(decode_image(blob2), arr) >= 40.0


def test_tiny_and_degenerate_dims():
    # 1x1, 1xN, Nx1 — padding/MCU edge cases in both 444 and 420
    for dims in ((1, 1), (1, 9), (9, 1), (7, 7)):
        arr = _smooth_rgb(*dims)
        for ss in ("444", "420"):
            dec = jpeg_decode(jpeg_encode(arr, quality=90, subsample=ss))
            assert dec.shape == arr.shape, (dims, ss)
        g = arr[:, :, 0]
        dec = jpeg_decode(jpeg_encode(g, quality=90))
        assert dec.shape == (*dims, 1)


def test_progressive_matches_baseline_exactly():
    """SOF2 scans (DC Al=1 -> AC bands Al=1 -> DC/AC refinements) must
    reconstruct the exact same quantized coefficients as the one-scan
    baseline stream, so decode output is pixel-identical."""
    import numpy as np

    rng = np.random.default_rng(11)
    for shape, sub in [
        ((40, 56), "444"),
        ((33, 41), "444"),
        ((48, 64, 3), "444"),
        ((37, 51, 3), "420"),  # non-interleaved AC over true chroma grids
        ((8, 8), "444"),
        ((1, 1), "444"),
        ((1, 17), "444"),
        ((17, 1, 3), "420"),
    ]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = jpeg_decode(jpeg_encode(img, quality=85, subsample=sub))
        prog = jpeg_decode(jpeg_encode(img, quality=85, subsample=sub, progressive=True))
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_restart_intervals():
    import numpy as np

    rng = np.random.default_rng(12)
    for shape, sub, ri in [((64, 64), "444", 2), ((48, 48, 3), "420", 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = jpeg_decode(jpeg_encode(img, quality=80, subsample=sub))
        prog = jpeg_decode(
            jpeg_encode(img, quality=80, subsample=sub, progressive=True,
                        restart_interval=ri)
        )
        assert np.array_equal(base, prog), (shape, sub, ri)


def test_progressive_smooth_image_eob_runs():
    """Smooth gradients make long EOB runs (many all-zero AC blocks) —
    exercises the coalesced EOBn path on both sides."""
    import numpy as np

    y, x = np.mgrid[0:64, 0:96]
    img = ((x + y) / 4).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=90))
    prog = jpeg_decode(jpeg_encode(img, quality=90, progressive=True))
    assert np.array_equal(base, prog)


def test_fill_bytes_before_markers():
    """B.1.1.2 allows any number of 0xFF fill bytes before a marker."""
    import numpy as np

    arr = _smooth_rgb(24, 24)
    blob = jpeg_encode(arr, quality=90)
    # splice fill bytes before the SOS marker
    i = blob.find(b"\xff\xda")
    padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
    assert np.array_equal(jpeg_decode(padded), jpeg_decode(blob))
