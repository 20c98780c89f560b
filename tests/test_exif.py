"""EXIF GPS APP1 codec (stages/exif.py)."""

import numpy as np
import pytest

from geowave_ray.stages.exif import build_exif_gps_app1, insert_app1, parse_exif_gps
from geowave_ray.stages.imaging import encode_image, sniff_image_meta


def _base():
    return encode_image(np.zeros((8, 8, 3), dtype=np.uint8), "jpeg")


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize(
    "lat,lon",
    [(4712, -12345), (-9000, 18000), (0, 0), (8999, -17999), (-1, 1)],
)
def test_exif_gps_roundtrip(lat, lon, big_endian):
    j = insert_app1(_base(), build_exif_gps_app1(lat, lon, big_endian=big_endian))
    assert parse_exif_gps(j) == (lat, lon)
    # splicing APP1 must not break header-only metadata sniffing
    fmt, w, h, _ = sniff_image_meta(j)
    assert (fmt, w, h) == ("jpeg", 8, 8)


def test_exif_absent_and_malformed():
    assert parse_exif_gps(_base()) is None  # plain JPEG: no APP1
    assert parse_exif_gps(b"\x89PNG....") is None  # not a JPEG at all
    # APP1 present but not EXIF (e.g. XMP) is skipped, not misparsed
    xmp = b"\xff\xe1\x00\x10http://ns.adobe"
    j = _base()
    assert parse_exif_gps(j[:2] + xmp + j[2:]) is None


def test_insert_app1_requires_soi():
    with pytest.raises(ValueError):
        insert_app1(b"\x00\x00junk", build_exif_gps_app1(0, 0))
