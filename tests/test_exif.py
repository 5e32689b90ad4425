"""EXIF GPS writer + parser (functions/exif.py): roundtrip through the
real JPEG codec in both byte orders, generic DMS handling, and a
FOREIGN-layout APP1 (extra tags, different offsets) to prove the
parser walks the TIFF structure instead of assuming its own writer's
layout."""

import struct

import numpy as np

from osm2vdv462_spark.functions import exif, imagecodec as ic, jpegcodec


def _jpeg(eid=7, size=16):
    return jpegcodec.encode_jpeg(
        ic.synth_pixels_smooth(eid, size, size), quality=85
    )


class TestRoundtrip:
    def test_both_byte_orders_through_real_jpeg(self):
        data = _jpeg()
        lat = [(0, 1), (900, 4000), (0, 1)]
        lon = [(12, 1), (30, 1), (4567, 100)]
        for bo in ("II", "MM"):
            tagged = exif.insert_app1(
                data, exif.build_gps_app1("S", lat, "E", lon, byte_order=bo)
            )
            # the spliced segment must not disturb the image stream
            assert (
                jpegcodec.decode_jpeg(tagged) == jpegcodec.decode_jpeg(data)
            ).all()
            assert exif.parse_gps(tagged) == ("S", lat, "E", lon)

    def test_dms_to_deg_generic(self):
        ref, dms = "W", [(12, 1), (30, 1), (4567, 100)]
        want = -(12 + 30 / 60 + 45.67 / 3600)
        assert abs(exif.dms_to_deg(ref, dms) - want) < 1e-12
        assert exif.dms_to_deg("N", [(0, 1), (900, 4000), (0, 1)]) == (
            900 / 4000 / 60
        )

    def test_no_gps_paths_return_none(self):
        assert exif.parse_gps(_jpeg()) is None  # JPEG without APP1
        assert exif.parse_gps(b"\x89PNG\r\n\x1a\n") is None  # not a JPEG
        assert exif.parse_gps(b"") is None


def _foreign_app1() -> bytes:
    """A big-endian APP1 a DIFFERENT encoder might emit: IFD0 carries
    unrelated tags before the GPS pointer, the GPS IFD sits after the
    rational data, and value blocks are non-contiguous."""
    e = ">"

    def entry(tag, typ, cnt, val4):
        return struct.pack(e + "HHI", tag, typ, cnt) + val4

    # layout: header 8 | IFD0 (2 + 3*12 + 4 = 42) @8 | lat rats @50 |
    # lon rats @74 | GPS IFD @98
    tiff = struct.pack(e + "2sHI", b"MM", 42, 8)
    tiff += struct.pack(e + "H", 3)
    tiff += entry(0x0112, 3, 1, struct.pack(e + "HH", 1, 0))  # Orientation
    tiff += entry(0x8298, 2, 4, b"cc0\x00")  # Copyright, inline
    tiff += entry(0x8825, 4, 1, struct.pack(e + "I", 98))  # GPS pointer
    tiff += struct.pack(e + "I", 0)
    for num, den in [(51, 1), (30, 1), (0, 1), (0, 1), (7, 1), (30, 2)]:
        tiff += struct.pack(e + "II", num, den)
    tiff += struct.pack(e + "H", 4)
    tiff += entry(1, 2, 2, b"N\x00\x00\x00")
    tiff += entry(2, 5, 3, struct.pack(e + "I", 50))
    tiff += entry(3, 2, 2, b"W\x00\x00\x00")
    tiff += entry(4, 5, 3, struct.pack(e + "I", 74))
    tiff += struct.pack(e + "I", 0)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


class TestForeignLayouts:
    def test_parser_walks_arbitrary_ifd_layout(self):
        tagged = exif.insert_app1(_jpeg(), _foreign_app1())
        got = exif.parse_gps(tagged)
        assert got == (
            "N",
            [(51, 1), (30, 1), (0, 1)],
            "W",
            [(0, 1), (7, 1), (30, 2)],
        )
        assert abs(exif.dms_to_deg(got[0], got[1]) - 51.5) < 1e-12

    def test_app1_after_other_segments_is_found(self):
        """EXIF after an APP0/JFIF segment (common in re-encoders)."""
        data = _jpeg()
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        app1 = exif.build_gps_app1(
            "N", [(1, 1), (2, 1), (3, 1)], "E", [(4, 1), (5, 1), (6, 1)]
        )
        stitched = data[:2] + app0 + app1 + data[2:]
        got = exif.parse_gps(stitched)
        assert got is not None and got[0] == "N" and got[2] == "E"

    def test_fill_bytes_before_app1_marker(self):
        """JPEG B.1.1.2 fill bytes (0xFF padding) before segment markers
        must not derail the APP1 scan (r4 ADVICE fill-byte fix)."""
        data = _jpeg()
        app1 = exif.build_gps_app1(
            "N", [(1, 1), (2, 1), (3, 1)], "E", [(4, 1), (5, 1), (6, 1)]
        )
        padded = data[:2] + b"\xff\xff\xff" + app1 + b"\xff\xff" + data[2:]
        got = exif.parse_gps(padded)
        assert got == ("N", [(1, 1), (2, 1), (3, 1)], "E", [(4, 1), (5, 1), (6, 1)])

    def test_truncated_and_corrupt_bodies_return_none(self):
        app1 = exif.build_gps_app1(
            "N", [(1, 1), (2, 1), (3, 1)], "E", [(4, 1), (5, 1), (6, 1)]
        )
        tagged = exif.insert_app1(_jpeg(), app1)
        # corrupt the TIFF magic
        idx = tagged.index(b"Exif\x00\x00") + 6
        bad = tagged[: idx + 2] + b"\x00\x00" + tagged[idx + 4 :]
        assert exif.parse_gps(bad) is None
        # truncate inside the APP1
        assert exif.parse_gps(tagged[: idx + 4]) is None


class TestDistributedPath:
    def test_synth_then_parse_recovers_the_lcg(self, spark, sf_dir):
        from osm2vdv462_spark.pipeline import images as im

        dec = (
            im.with_exif_gps(im.exif_images_df(spark, sf_dir, every=50))
            .select("event_id", "lat_ref", "lat_min_num", "lon_deg")
            .collect()
        )
        assert len(dec) > 0
        for r in dec:
            m_lat = (r["event_id"] * 73 + 29) % 2000
            m_lon = (r["event_id"] * 37 + 11) % 2000
            assert r["lat_ref"] == ("S" if m_lat < 1000 else "N")
            assert r["lat_min_num"] == abs(m_lat - 1000) * 60
            want_lon = (-1 if m_lon < 1000 else 1) * (
                abs(m_lon - 1000) * 60 / 4000 / 60
            )
            assert abs(r["lon_deg"] - want_lon) < 1e-15
