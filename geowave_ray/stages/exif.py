"""EXIF GPS geotag extraction from JPEG payloads — pure struct codec.

The canonical geotagged-image ingest step: recover (lat, lon) for the
north-rule image table FROM the payload bytes themselves, the way the
reference reads raster geo-metadata through ImageIO/GeoTools readers
without materializing pixels (RasterDataAdapter.java:444-550, Landsat
adapter scene metadata).  Format per the public EXIF 2.3 / TIFF 6.0
specs: an APP1 segment ("Exif\\0\\0" + TIFF structure) holding IFD0 with
a GPSInfo pointer tag (0x8825) to a GPS IFD carrying
GPSLatitudeRef/GPSLatitude/GPSLongitudeRef/GPSLongitude (rational DMS
triplets).  Coordinates ride as exact integer centi-degree rationals
(cd/100 in the degrees slot), so extraction is lossless and
hash-verifiable.

Cost is O(header bytes) per payload — the parser hops JPEG segments via
their length fields and never touches entropy-coded data (same
discipline as stages/imaging.sniff_image_meta).
"""

from __future__ import annotations

import struct

__all__ = ["build_exif_gps_app1", "insert_app1", "parse_exif_gps"]

_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 0x0001, 0x0002, 0x0003, 0x0004
_TAG_GPS_IFD = 0x8825


def build_exif_gps_app1(lat_cd: int, lon_cd: int, big_endian: bool = False) -> bytes:
    """APP1 EXIF segment with a GPS IFD for integer centi-degree
    coordinates.  The DMS rationals are (|cd|, 100), (0, 1), (0, 1) —
    degrees = cd/100 exactly, minutes/seconds zero — so the roundtrip is
    integer-exact."""
    bo = ">" if big_endian else "<"

    def u16(v):
        return struct.pack(bo + "H", v)

    def u32(v):
        return struct.pack(bo + "I", v)

    def entry(tag, typ, count, value_or_offset):
        return u16(tag) + u16(typ) + u32(count) + value_or_offset

    # TIFF body layout (offsets relative to the TIFF header start):
    #   0: header (8)   8: IFD0 (2 + 1*12 + 4 = 18)   26: GPS IFD
    #   GPS IFD: 2 + 4*12 + 4 = 54  -> rationals start at 26 + 54 = 80
    gps_ifd_off = 26
    lat_rat_off = 80
    lon_rat_off = 80 + 24

    header = (b"MM" if big_endian else b"II") + u16(42) + u32(8)
    ifd0 = u16(1) + entry(_TAG_GPS_IFD, 4, 1, u32(gps_ifd_off)) + u32(0)

    lat_ref = b"N\x00\x00\x00" if lat_cd >= 0 else b"S\x00\x00\x00"
    lon_ref = b"E\x00\x00\x00" if lon_cd >= 0 else b"W\x00\x00\x00"
    gps = (
        u16(4)
        + entry(_GPS_LAT_REF, 2, 2, lat_ref)
        + entry(_GPS_LAT, 5, 3, u32(lat_rat_off))
        + entry(_GPS_LON_REF, 2, 2, lon_ref)
        + entry(_GPS_LON, 5, 3, u32(lon_rat_off))
        + u32(0)
    )

    def dms(cd):
        return u32(abs(cd)) + u32(100) + u32(0) + u32(1) + u32(0) + u32(1)

    tiff = header + ifd0 + gps + dms(lat_cd) + dms(lon_cd)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def parse_exif_gps(data: bytes) -> tuple[int, int] | None:
    """(lat_cd, lon_cd) from the first EXIF APP1 segment, or None when
    the payload carries no GPS IFD.  Header-only: segments are hopped by
    length; both TIFF byte orders are handled."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS — entropy data next; no APP1 found
            return None
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return _parse_tiff_gps(data[pos + 10 : pos + 2 + seglen])
        pos += 2 + seglen
    return None


def _parse_tiff_gps(tiff: bytes) -> tuple[int, int] | None:
    bo = {b"II": "<", b"MM": ">"}.get(tiff[:2])
    if bo is None or struct.unpack(bo + "H", tiff[2:4])[0] != 42:
        return None

    def u16(off):
        return struct.unpack(bo + "H", tiff[off : off + 2])[0]

    def u32(off):
        return struct.unpack(bo + "I", tiff[off : off + 4])[0]

    def walk(ifd_off):
        n = u16(ifd_off)
        return {
            u16(ifd_off + 2 + 12 * i): ifd_off + 2 + 12 * i
            for i in range(n)
        }

    gps_entry = walk(u32(4)).get(_TAG_GPS_IFD)
    if gps_entry is None:
        return None
    gps = walk(u32(gps_entry + 8))

    def rational_deg_cd(tag):
        e = gps.get(tag)
        if e is None:
            return None
        off = u32(e + 8)
        num, den = u32(off), u32(off + 4)
        # degrees slot carries cd/100; minutes/seconds are zero by spec here
        return num * 100 // den

    def ref(tag):
        e = gps.get(tag)
        return None if e is None else tiff[e + 8 : e + 9].decode("ascii")

    lat = rational_deg_cd(_GPS_LAT)
    lon = rational_deg_cd(_GPS_LON)
    if lat is None or lon is None:
        return None
    if ref(_GPS_LAT_REF) == "S":
        lat = -lat
    if ref(_GPS_LON_REF) == "W":
        lon = -lon
    return lat, lon
