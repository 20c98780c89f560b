"""GeoTIFF codec: strips/tiles x none/packbits, georeferencing, guards.

From-spec implementation (TIFF 6.0 sections 8/9/15 + GeoTIFF 1.1);
reference behavior anchor: raster format ingest via
extensions/adapters/raster/.../RasterDataAdapter.java:444.
"""

import numpy as np
import pytest

from geowave_ray.sources.geotiff import (
    geotiff_decode,
    geotiff_encode,
    packbits_decode,
    packbits_encode,
)


def test_packbits_roundtrip_fuzz():
    rng = np.random.default_rng(2)
    cases = [b"", b"\x00" * 500, b"abc" + b"x" * 200 + b"yz"]
    for trial in range(100):
        n = int(rng.integers(0, 2000))
        if rng.random() < 0.5:
            cases.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        else:  # runs-heavy
            cases.append(
                b"".join(
                    bytes([int(rng.integers(0, 4))]) * int(rng.integers(1, 50))
                    for _ in range(max(n // 20, 1))
                )
            )
    for data in cases:
        assert packbits_decode(packbits_encode(data), len(data)) == data


def test_packbits_literal_cap_straddles_short_run():
    """A 2-byte run crossing the 128-byte literal cap must not emit the
    noop control byte 128 (regression: corrupted every ~129th literal)."""
    data = bytes(range(127)) + b"\x07\x07" + bytes(range(100))
    assert packbits_decode(packbits_encode(data), len(data)) == data


@pytest.mark.parametrize("comp", ["none", "packbits", "deflate"])
@pytest.mark.parametrize("tile", [None, (32, 16), (16, 32)])
def test_geotiff_roundtrip(comp, tile):
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (100, 77), dtype=np.uint8)
    gray[10:40, :] = 7  # compressible band
    rgb = rng.integers(0, 256, (70, 45, 3), dtype=np.uint8)
    for px in (gray, rgb):
        b = geotiff_encode(
            px, origin=(12.5, -3.25), pixel_scale=(0.1, 0.2),
            compression=comp, tile=tile,
        )
        out, geo = geotiff_decode(b)
        assert (out == px).all()
        assert geo["origin"] == (12.5, -3.25)
        assert geo["pixel_scale"] == (0.1, 0.2)


def test_geotiff_guards():
    g = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="big-endian"):
        geotiff_decode(b"MM\0*" + b"\0" * 16)
    with pytest.raises(ValueError, match="magic"):
        geotiff_decode(b"NOPE" + b"\0" * 16)
    with pytest.raises(ValueError, match="multiples of 16"):
        geotiff_encode(g, tile=(20, 16))
    with pytest.raises(NotImplementedError, match="jpeg"):
        geotiff_encode(g, compression="jpeg")


def test_geotiff_deflate_old_style_decodes():
    """Compression=32946 (old-style Deflate) is the same zlib stream as the
    Adobe tag 8; a retagged file must decode identically."""
    g = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 251
    b = bytearray(geotiff_encode(g, compression="deflate"))
    import struct as _s

    (ifd_off,) = _s.unpack_from("<I", b, 4)
    (n_entries,) = _s.unpack_from("<H", b, ifd_off)
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = _s.unpack_from("<HHI", b, base)
        if tag == 259:  # Compression
            (val,) = _s.unpack_from("<H", b, base + 8)
            assert val == 8
            _s.pack_into("<H", b, base + 8, 32946)
    out, _ = geotiff_decode(bytes(b))
    assert (out == g).all()


def test_lzw_hand_vector_and_fuzz():
    """TIFF LZW: independent hand-derived 9-bit vector (codes packed by a
    separate in-test packer, not the library's), then round-trip fuzz
    across all three width changes and the 4094 table reset."""
    from geowave_ray.sources.geotiff import lzw_decode, lzw_encode

    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]  # derived by hand per spec
    acc = n = 0
    buf = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        n += 9
        while n >= 8:
            buf.append((acc >> (n - 8)) & 0xFF)
            n -= 8
        acc &= (1 << n) - 1
    if n:
        buf.append((acc << (8 - n)) & 0xFF)
    want = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    assert lzw_decode(bytes(buf), len(want)) == want
    assert lzw_encode(want) == bytes(buf)

    rng = np.random.default_rng(4)
    cases = [b"", b"a", b"ababab" * 80]
    cases += [
        bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for n in (600, 3000, 9000)  # cross 511 / 1023 / 2047+reset
    ]
    for trial in range(40):
        n = int(rng.integers(0, 5000))
        cases.append(
            bytes(rng.integers(0, int(rng.integers(2, 257)), n, dtype=np.uint8))
        )
    for data in cases:
        assert lzw_decode(lzw_encode(data), len(data)) == data


def test_geotiff_lzw_roundtrip():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (100, 77), dtype=np.uint8)
    g[10:40, :] = 7
    for tile in (None, (32, 32)):
        b = geotiff_encode(g, compression="lzw", tile=tile)
        out, _ = geotiff_decode(b)
        assert (out == g).all()
