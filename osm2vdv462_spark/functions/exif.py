"""EXIF GPS metadata: from-scratch APP1 writer + parser (public
JPEG/EXIF/TIFF 6.0 wire formats, bytes only — no PIL/exifread).

This is the missing first stage of the north rule's actual production
scenario: a crawled image corpus where "each image carries a geotag"
carries it HERE — in the EXIF APP1 segment's GPS IFD — not in a
ready-made lon/lat column. The query layer
(geo_queries.py::image_exif_geotags) synthesizes JPEGs with embedded
GPS via `build_gps_app1`/`insert_app1`, then runs `parse_gps` over the
bytes column distributed (mapInPandas), reconstructs coordinates, and
feeds them straight into the gated PIP join — the full
crawl → EXIF → spatial-join path.

Wire layout written (and independently re-walked by the parser, which
handles both byte orders and arbitrary marker/IFD layouts, not just
its own):

  FFE1 <len> 'Exif\\0\\0'
    TIFF header ('II'|'MM', 42, IFD0 offset)
    IFD0:   tag 0x8825 (GPS IFD pointer, LONG)
    GPSIFD: tag 1 GPSLatitudeRef  (ASCII 'N'/'S')
            tag 2 GPSLatitude     (3 RATIONALs: deg, min, sec)
            tag 3 GPSLongitudeRef (ASCII 'E'/'W')
            tag 4 GPSLongitude    (3 RATIONALs)

Float discipline: coordinates travel as exact integer RATIONALs
(num, den) end-to-end. The oracle compares the INTEGERS (closed-form
from the synthesis LCG), so no float ever crosses engines; doubles are
reconstructed only inside Spark for the PIP kernel, where the gate
world's lattice keeps every point ≥1e-4 degrees from any polygon
boundary (≫ the ~1e-17 reconstruction ulps).
"""

from __future__ import annotations

import struct

_TYPE_ASCII = 2
_TYPE_LONG = 4
_TYPE_RATIONAL = 5
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 1, 2, 3, 4


def build_gps_app1(
    lat_ref: str,
    lat_dms: list[tuple[int, int]],
    lon_ref: str,
    lon_dms: list[tuple[int, int]],
    byte_order: str = "II",
) -> bytes:
    """One complete APP1 segment (marker + length + Exif + TIFF) with a
    GPS IFD holding the given DMS rationals (3 × (num, den) each)."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    e = "<" if byte_order == "II" else ">"
    if len(lat_dms) != 3 or len(lon_dms) != 3:
        raise ValueError("lat_dms/lon_dms must be 3 (num, den) rationals")

    # TIFF body offsets (from TIFF header start):
    # header 8 | IFD0 (2 + 1*12 + 4 = 18) @8 | GPS IFD (2 + 4*12 + 4 = 54)
    # @26 | lat rationals (24) @80 | lon rationals (24) @104
    gps_off, lat_off, lon_off = 26, 80, 104

    def entry(tag, typ, cnt, val4):
        return struct.pack(e + "HHI", tag, typ, cnt) + val4

    def ascii4(s):
        return (s.encode() + b"\x00\x00\x00\x00")[:4]

    tiff = struct.pack(e + "2sHI", byte_order.encode(), 42, 8)
    tiff += struct.pack(e + "H", 1)  # IFD0: 1 entry
    tiff += entry(_TAG_GPS_IFD, _TYPE_LONG, 1, struct.pack(e + "I", gps_off))
    tiff += struct.pack(e + "I", 0)  # no next IFD
    tiff += struct.pack(e + "H", 4)  # GPS IFD: 4 entries
    tiff += entry(_GPS_LAT_REF, _TYPE_ASCII, 2, ascii4(lat_ref))
    tiff += entry(_GPS_LAT, _TYPE_RATIONAL, 3, struct.pack(e + "I", lat_off))
    tiff += entry(_GPS_LON_REF, _TYPE_ASCII, 2, ascii4(lon_ref))
    tiff += entry(_GPS_LON, _TYPE_RATIONAL, 3, struct.pack(e + "I", lon_off))
    tiff += struct.pack(e + "I", 0)
    for num, den in list(lat_dms) + list(lon_dms):
        tiff += struct.pack(e + "II", num, den)

    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI (the position the
    EXIF spec mandates)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _walk_ifd(buf: bytes, e: str, off: int) -> dict[int, tuple[int, int, bytes]]:
    """One IFD -> {tag: (type, count, 4-byte value field)}. `buf` is the
    TIFF body (offsets are relative to its start)."""
    if off + 2 > len(buf):
        return {}
    (n,) = struct.unpack_from(e + "H", buf, off)
    out = {}
    for k in range(n):
        base = off + 2 + 12 * k
        if base + 12 > len(buf):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHI", buf, base)
        out[tag] = (typ, cnt, buf[base + 8 : base + 12])
    return out


def _rationals(buf: bytes, e: str, cnt: int, val4: bytes) -> list[tuple[int, int]]:
    (off,) = struct.unpack(e + "I", val4)
    out = []
    for k in range(cnt):
        num, den = struct.unpack_from(e + "II", buf, off + 8 * k)
        out.append((num, den))
    return out


def parse_gps(jpeg: bytes):
    """Scan JPEG markers for an EXIF APP1 and extract the GPS IFD.
    Returns (lat_ref, lat_dms, lon_ref, lon_dms) with dms = 3 (num,
    den) tuples, or None when the image has no EXIF GPS (non-JPEG
    bytes, no APP1, or no GPS IFD)."""
    if len(jpeg) < 4 or jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    tiff = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            return None
        # B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= len(jpeg) and jpeg[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(jpeg):
            return None
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no more segments
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        body = jpeg[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + seglen
    if tiff is None or len(tiff) < 8:
        return None
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        return None
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        return None
    ifd0 = _walk_ifd(tiff, e, ifd0_off)
    if _TAG_GPS_IFD not in ifd0:
        return None
    (gps_off,) = struct.unpack(e + "I", ifd0[_TAG_GPS_IFD][2])
    gps = _walk_ifd(tiff, e, gps_off)
    try:
        lat_ref = gps[_GPS_LAT_REF][2].split(b"\x00")[0].decode()
        lon_ref = gps[_GPS_LON_REF][2].split(b"\x00")[0].decode()
        lat_dms = _rationals(tiff, e, gps[_GPS_LAT][1], gps[_GPS_LAT][2])
        lon_dms = _rationals(tiff, e, gps[_GPS_LON][1], gps[_GPS_LON][2])
    except (KeyError, struct.error):
        return None
    if len(lat_dms) != 3 or len(lon_dms) != 3:
        return None
    return lat_ref, lat_dms, lon_ref, lon_dms


def dms_to_deg(ref: str, dms: list[tuple[int, int]]) -> float:
    """Signed decimal degrees from a GPS DMS triple."""
    d = sum(
        (num / den) / scale
        for (num, den), scale in zip(dms, (1.0, 60.0, 3600.0))
        if den
    )
    return -d if ref in ("S", "W") else d
