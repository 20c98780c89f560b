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


@pytest.mark.parametrize("comp", ["none", "packbits"])
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
    with pytest.raises(NotImplementedError, match="lzw"):
        geotiff_encode(g, compression="lzw")
