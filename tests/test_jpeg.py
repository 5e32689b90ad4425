"""From-scratch baseline JPEG codec (functions/jpegcodec.py): encoder/
decoder round-trip at the qualities and samplings the images pipeline
uses, spec features a web corpus hits (restart markers, odd sizes,
grayscale, 16-bit DQT), and loud failure on unsupported variants."""

import struct

import numpy as np
import pytest

from osm2vdv462_spark.functions import imagecodec as ic
from osm2vdv462_spark.functions import jpegcodec as J


class TestRoundTrip:
    def test_444_psnr_and_determinism(self):
        for eid in (0, 7, 123):
            px = ic.synth_pixels_smooth(eid, 32, 32)
            enc = J.encode_jpeg(px, quality=92)
            assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
            dec = J.decode_jpeg(enc)
            assert dec.shape == px.shape and dec.dtype == np.uint8
            assert ic.psnr_db(px, dec) >= 40.0
            assert J.encode_jpeg(px, quality=92) == enc  # deterministic
            assert np.array_equal(J.decode_jpeg(enc), dec)

    def test_quality_monotone(self):
        px = ic.synth_pixels(3, 48, 48)
        psnrs = [
            ic.psnr_db(px, J.decode_jpeg(J.encode_jpeg(px, quality=q)))
            for q in (50, 75, 92, 98)
        ]
        assert psnrs == sorted(psnrs)
        assert psnrs[-1] > 40

    def test_420_subsampling(self):
        px = ic.synth_pixels_smooth(9, 32, 32)
        enc = J.encode_jpeg(px, quality=92, subsample="420")
        dec = J.decode_jpeg(enc)
        assert dec.shape == px.shape
        # chroma is box-subsampled + replicated back: lower bar
        assert ic.psnr_db(px, dec) >= 28.0
        assert len(enc) < len(J.encode_jpeg(px, quality=92))

    def test_non_multiple_of_8_sizes(self):
        for w, h in ((37, 29), (8, 8), (9, 17), (33, 16)):
            px = ic.synth_pixels_smooth(1, w, h)
            dec = J.decode_jpeg(J.encode_jpeg(px, quality=95))
            assert dec.shape == (h, w, 3)
            assert ic.psnr_db(px, dec) >= 38.0
        px = ic.synth_pixels_smooth(2, 37, 29)
        dec = J.decode_jpeg(J.encode_jpeg(px, quality=95, subsample="420"))
        assert dec.shape == (29, 37, 3)

    def test_restart_markers(self):
        px = ic.synth_pixels_smooth(5, 64, 64)
        plain = J.decode_jpeg(J.encode_jpeg(px, quality=92))
        for ri in (1, 3, 7):
            enc = J.encode_jpeg(px, quality=92, restart_interval=ri)
            # DRI segment present and RSTn markers in the stream
            assert b"\xff\xdd" in enc
            assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
            assert np.array_equal(J.decode_jpeg(enc), plain)


class TestDecoderFeatures:
    def test_grayscale_single_component(self):
        """Hand-assemble a 1-component JPEG from the codec's own
        primitives (the encoder API is RGB-only, the DECODER must read
        grayscale — common in scanned corpora)."""
        h = w = 16
        gray = ic.synth_pixels_smooth(4, w, h)[:, :, 0]
        ql, _ = J.quant_tables(95)
        blocks = J._fdct_quant(J._blocks_of(gray.astype(np.float64) - 128.0), ql)
        dc = J._canonical_codes(J._DC_LUMA_BITS, J._DC_LUMA_VALS)
        ac = J._canonical_codes(J._AC_LUMA_BITS, J._AC_LUMA_VALS)
        bw = J._BitWriter()
        pred = 0
        for blk in blocks:
            diff = int(blk[0, 0]) - pred
            pred = int(blk[0, 0])
            size, bits = J._magnitude(diff)
            code, ln = dc[size]
            bw.put(code, ln)
            bw.put(bits, size)
            seq = blk[J.ZIGZAG_ROW, J.ZIGZAG_COL]
            run = 0
            nz = np.nonzero(seq)[0]
            last = int(nz.max()) if len(nz) and nz.max() > 0 else 0
            for k in range(1, last + 1):
                v = int(seq[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c2, l2 = ac[0xF0]
                    bw.put(c2, l2)
                    run -= 16
                size, bits = J._magnitude(v)
                c2, l2 = ac[(run << 4) | size]
                bw.put(c2, l2)
                bw.put(bits, size)
                run = 0
            if last < 63:
                c2, l2 = ac[0x00]
                bw.put(c2, l2)
        bw.flush()

        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        out = bytearray(b"\xff\xd8")
        zz = ql[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([0]) + zz)
        out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        out += seg(
            0xFFC4, bytes([0x00]) + bytes(J._DC_LUMA_BITS) + bytes(J._DC_LUMA_VALS)
        )
        out += seg(
            0xFFC4, bytes([0x10]) + bytes(J._AC_LUMA_BITS) + bytes(J._AC_LUMA_VALS)
        )
        out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += bw.out + b"\xff\xd9"

        dec = J.decode_jpeg(bytes(out))
        assert dec.shape == (h, w, 3)
        assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
        ref3 = np.repeat(gray[:, :, None], 3, axis=2)
        assert ic.psnr_db(ref3, dec) >= 40.0

    def test_16bit_dqt_accepted(self):
        px = ic.synth_pixels_smooth(6, 16, 16)
        enc = bytearray(J.encode_jpeg(px, quality=92))
        # rewrite the first DQT (luma) as a Pq=1 (16-bit) table in place
        i = enc.find(b"\xff\xdb")
        (ln,) = struct.unpack_from(">H", enc, i + 2)
        tbl8 = enc[i + 5 : i + 5 + 64]
        tbl16 = b"".join(struct.pack(">H", b) for b in tbl8)
        new = struct.pack(">HH", 0xFFDB, 2 + 1 + 128) + bytes([0x10]) + tbl16
        enc2 = bytes(enc[:i]) + new + bytes(enc[i + 2 + ln :])
        assert np.array_equal(J.decode_jpeg(enc2), J.decode_jpeg(bytes(enc)))

    def test_arithmetic_coding_raises(self):
        # progressive (SOF2) is SUPPORTED since the r4 restart — the
        # detected-and-rejected boundary is arithmetic coding (SOF9)
        px = ic.synth_pixels_smooth(8, 16, 16)
        enc = bytearray(J.encode_jpeg(px, quality=92))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC9  # SOF9 arithmetic sequential
        with pytest.raises(NotImplementedError, match="arithmetic"):
            J.decode_jpeg(bytes(enc))

    def test_not_a_jpeg_raises(self):
        with pytest.raises(ValueError, match="SOI"):
            J.decode_jpeg(b"\x89PNG\r\n")

    def test_truncated_tail_padding_tolerated(self):
        """Zigzag table is generated, not transcribed: spot-check the
        canonical first/last entries."""
        assert (J.ZIGZAG_ROW[0], J.ZIGZAG_COL[0]) == (0, 0)
        assert (J.ZIGZAG_ROW[1], J.ZIGZAG_COL[1]) == (0, 1)
        assert (J.ZIGZAG_ROW[2], J.ZIGZAG_COL[2]) == (1, 0)
        assert (J.ZIGZAG_ROW[7], J.ZIGZAG_COL[7]) == (1, 2)
        assert (J.ZIGZAG_ROW[8], J.ZIGZAG_COL[8]) == (2, 1)
        assert (J.ZIGZAG_ROW[63], J.ZIGZAG_COL[63]) == (7, 7)
        assert sorted(zip(J.ZIGZAG_ROW.tolist(), J.ZIGZAG_COL.tolist())) == [
            (r, c) for r in range(8) for c in range(8)
        ]


class TestPipelineIntegration:
    def test_mixed_format_decode_verify(self, spark):
        from osm2vdv462_spark.pipeline import images as im

        sf = "/root/testdata/sf0.001"
        imgs = im.images_df(spark, sf, mixed_formats=True)
        v = im.with_decode_verify(imgs).select(
            "fmt", "pixel_ok", "caption_ok", "phash_ok", "psnr"
        )
        rows = v.collect()
        fmts = {r["fmt"] for r in rows}
        assert fmts == {"png", "jpeg"}
        assert all(r["pixel_ok"] and r["caption_ok"] and r["phash_ok"] for r in rows)
        for r in rows:
            if r["fmt"] == "jpeg":
                assert 40.0 <= r["psnr"] < 60.0  # genuinely lossy
            else:
                assert r["psnr"] == float("inf")


class TestProgressive:
    def test_equals_baseline_decode_exactly(self):
        """The progressive encoder produces the SAME quantized
        coefficients as the baseline encoder, so the multi-scan decode
        (spectral bands, successive approximation, EOB runs) must
        reassemble pixels bit-for-bit equal to the baseline decode."""
        for eid, (w, h) in ((0, (32, 32)), (7, (32, 32)), (3, (48, 48)),
                            (1, (37, 29)), (5, (9, 17))):
            px = ic.synth_pixels_smooth(eid, w, h)
            base = J.decode_jpeg(J.encode_jpeg(px, quality=92))
            prog = J.decode_jpeg(J.encode_jpeg_progressive(px, quality=92))
            assert np.array_equal(base, prog), (eid, w, h)

    def test_edge_heavy_pattern_and_qualities(self):
        """Sawtooth wraps maximize AC activity (long runs, ZRL, dense
        refinement); every quality must still match baseline exactly."""
        px = ic.synth_pixels(4, 32, 32)
        for q in (50, 75, 92, 98):
            base = J.decode_jpeg(J.encode_jpeg(px, quality=q))
            prog = J.decode_jpeg(J.encode_jpeg_progressive(px, quality=q))
            assert np.array_equal(base, prog), q

    def test_flat_image_exercises_long_eob_runs(self):
        """A constant image makes every AC band empty -> maximal EOB
        runs (EOBn symbols with extension bits) through encoder and
        decoder."""
        px = np.full((64, 64, 3), 130, np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(px, quality=92))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(px, quality=92))
        assert np.array_equal(base, prog)

    def test_sof2_marker_and_scan_count(self):
        px = ic.synth_pixels_smooth(2, 32, 32)
        enc = J.encode_jpeg_progressive(px, quality=92)
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
        assert enc.count(b"\xff\xda") == 9  # the 9-scan script

    def test_deterministic(self):
        px = ic.synth_pixels_smooth(6, 32, 32)
        assert (J.encode_jpeg_progressive(px) ==
                J.encode_jpeg_progressive(px))

    def test_progressive_restart_rejected(self):
        px = ic.synth_pixels_smooth(2, 16, 16)
        enc = bytearray(J.encode_jpeg_progressive(px, quality=92))
        # splice a DRI segment with a nonzero interval before first SOS
        sos = enc.find(b"\xff\xda")
        dri = b"\xff\xdd\x00\x04\x00\x02"
        patched = bytes(enc[:sos]) + dri + bytes(enc[sos:])
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(patched)


class TestQualityEstimate:
    def test_roundtrip_every_quality(self):
        px = ic.synth_pixels_smooth(5, 16, 16)
        sig_min = {}
        for q in range(1, 101):
            ql, qc = J.quant_tables(q)
            key = (
                ql[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(np.uint8).tobytes()
                + qc[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(np.uint8).tobytes()
            )
            sig_min.setdefault(key, q)
        for q in range(1, 101, 7):
            data = J.encode_jpeg(px, quality=q)
            ql, qc = J.quant_tables(q)
            key = (
                ql[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(np.uint8).tobytes()
                + qc[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(np.uint8).tobytes()
            )
            est, n = J.estimate_quality(data)
            assert n == 2
            assert est == sig_min[key]  # min-q collision rule
            assert 1 <= est <= 100

    def test_progressive_and_subsampled(self):
        px = ic.synth_pixels_smooth(9, 16, 16)
        assert J.estimate_quality(J.encode_jpeg_progressive(px, quality=71)) \
            == (71, 2)
        assert J.estimate_quality(
            J.encode_jpeg(px, quality=40, subsample="420")
        ) == (40, 2)

    def test_custom_tables_return_minus_one(self):
        # hand-build a DQT with a non-Annex-K table: estimate must
        # refuse (-1), never misattribute a quality
        px = ic.synth_pixels_smooth(2, 16, 16)
        data = bytearray(J.encode_jpeg(px, quality=50))
        i = data.index(b"\xff\xdb")
        data[i + 5] = 7 if data[i + 5] != 7 else 8  # perturb one coeff
        est, n = J.estimate_quality(bytes(data))
        assert n == 2 and est == -1

    def test_fill_bytes_before_markers(self):
        # JPEG B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes; a padded real-world file must parse identically
        # (r4 ADVICE: the scan used to treat the fill byte itself as a
        # marker id and misread segment lengths).
        px = ic.synth_pixels_smooth(5, 16, 16)
        clean = J.encode_jpeg(px, quality=64)
        padded = bytearray()
        i = 0
        while i < len(clean):
            # pad in the header region only (before SOS): inside the
            # entropy stream 0xFF is data, not marker space
            if (
                clean[i] == 0xFF
                and clean[i + 1] in (0xDB, 0xC0, 0xC4, 0xDA)
            ):
                padded += b"\xff\xff\xff"
            padded.append(clean[i])
            i += 1
            if padded[-2:] == b"\xff\xda":  # copy the rest verbatim
                padded += clean[i:]
                break
        padded = bytes(padded)
        assert J.estimate_quality(padded) == J.estimate_quality(clean)
        assert J.parse_dqt_raw(padded) == J.parse_dqt_raw(clean)
        assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(clean))

    def test_parse_dqt_raw_layout(self):
        px = ic.synth_pixels_smooth(3, 16, 16)
        data = J.encode_jpeg(px, quality=85)
        t = J.parse_dqt_raw(data)
        ql, qc = J.quant_tables(85)
        assert t[0] == ql[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(
            np.uint8
        ).tobytes()
        assert t[1] == qc[J.ZIGZAG_ROW, J.ZIGZAG_COL].astype(
            np.uint8
        ).tobytes()
