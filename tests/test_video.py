"""RIFF/AVI container codec + the video pipeline (functions/videocodec.py,
pipeline/video.py). Closes the round-2/3 frame_sample_stub boundary: the
rawdib path is bit-exact (lossless DIB), the mjpeg path is PSNR-gated
(lossy), and the header scan never touches frame payloads."""

import struct

import numpy as np
import pytest

from osm2vdv462_spark.functions import imagecodec as ic
from osm2vdv462_spark.functions import videocodec as vc
from osm2vdv462_spark.pipeline import video as pv


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / mse)


class TestCodec:
    def test_rawdib_roundtrip_bit_exact(self):
        frames = [ic.synth_pixels(100 + k, 32, 32) for k in range(5)]
        blob = vc.encode_avi(frames, fps=10, codec="rawdib")
        meta = vc.parse_avi(blob)
        assert (meta["w"], meta["h"], meta["fps"], meta["n_frames"]) == (
            32, 32, 10, 5,
        )
        assert meta["codec"] == "rawdib"
        for k, f in enumerate(frames):
            assert np.array_equal(vc.decode_frame(blob, meta, k), f)

    def test_rawdib_odd_width_padding(self):
        # stride 17*3=51 -> padded to 52: the 4-byte row padding path
        f = ic.synth_pixels(5, 17, 9)
        blob = vc.encode_avi([f], codec="rawdib")
        meta = vc.parse_avi(blob)
        assert (meta["w"], meta["h"]) == (17, 9)
        assert np.array_equal(vc.decode_frame(blob, meta, 0), f)

    def test_mjpeg_psnr_floor(self):
        frames = [ic.synth_pixels_smooth(200 + k, 32, 32) for k in range(4)]
        blob = vc.encode_avi(frames, fps=10, codec="mjpeg", quality=92)
        meta = vc.parse_avi(blob)
        assert meta["codec"] == "mjpeg"
        for k, f in enumerate(frames):
            assert _psnr(vc.decode_frame(blob, meta, k), f) > 40.0

    def test_selective_decode_never_reads_other_payloads(self):
        """parse_avi + decode_frame(k) must not depend on other frames'
        payload bytes: corrupt every payload except frame 2 and decode
        frame 2 anyway (the 100 TB sampling guarantee)."""
        frames = [ic.synth_pixels(300 + k, 16, 16) for k in range(6)]
        blob = bytearray(vc.encode_avi(frames, codec="rawdib"))
        meta = vc.parse_avi(bytes(blob))
        for k, (off, size) in enumerate(meta["chunks"]):
            if k != 2:
                blob[off : off + size] = b"\xAA" * size
        assert np.array_equal(
            vc.decode_frame(bytes(blob), meta, 2), frames[2]
        )

    def test_header_movi_count_mismatch_raises(self):
        """A header that declares more frames than movi carries (the
        truncated-blob shape) must fail the cross-check, not silently
        undercount."""
        frames = [ic.synth_pixels(1, 16, 16) for _ in range(3)]
        blob = bytearray(vc.encode_avi(frames, codec="rawdib"))
        apos = bytes(blob).find(b"avih") + 8  # avih payload
        # dwTotalFrames is the 5th dword of the avih payload
        assert struct.unpack("<I", bytes(blob[apos + 16 : apos + 20]))[0] == 3
        blob[apos + 16 : apos + 20] = struct.pack("<I", 4)
        with pytest.raises(ValueError, match="frame count mismatch"):
            vc.parse_avi(bytes(blob))

    def test_not_avi_raises(self):
        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            vc.parse_avi(b"\x89PNG\r\n\x1a\nxxxxxxxx")

    def test_unknown_codec_raises(self):
        with pytest.raises(NotImplementedError):
            vc.encode_avi([ic.synth_pixels(1, 8, 8)], codec="h264")


class TestVideoPipeline:
    def test_frame_stats_match_closed_form(self, spark, sf_dir):
        rows = pv.with_frame_stats(
            pv.videos_df(spark, sf_dir, every=100), stride=2
        ).collect()
        # sf0.001: 10 clips x 4 sampled frames
        assert len(rows) == 40
        for r in rows:
            eid = int(r["video_id"][4:])
            px = pv.synth_frame(eid, r["frame_no"]).astype(np.int64)
            t = px.sum(axis=2)
            assert r["mean_gray_e4"] == (int(t.sum()) * 10000) // (3 * 32 * 32)
            assert r["t_max"] == int(t.max())
            assert r["t_min"] == int(t.min())

    def test_header_scan_mixed_codecs(self, spark, sf_dir):
        out = {
            r["video_id"]: r
            for r in pv.with_header_scan(
                pv.videos_df(spark, sf_dir, every=200, mixed_codecs=True)
            ).collect()
        }
        assert out
        for vid_id, r in out.items():
            eid = int(vid_id[4:])
            assert r["codec"] == ("mjpeg" if eid % 2 else "rawdib")
            assert (r["w"], r["h"], r["fps"], r["n_frames"]) == (32, 32, 10, 8)

    def test_sample_frames_deterministic_across_parallelism(self, spark, sf_dir):
        """Byte-identical sampled-frame PNGs at two partitionings (the
        pinned-determinism invariant; frame content is seed-derived,
        never process-state-derived)."""
        vids = pv.videos_df(spark, sf_dir, every=200)
        a = {
            (r["video_id"], r["frame_no"]): bytes(r["frame_png"])
            for r in pv.sample_frames(vids.repartition(1), 2).collect()
        }
        b = {
            (r["video_id"], r["frame_no"]): bytes(r["frame_png"])
            for r in pv.sample_frames(vids.repartition(8), 2).collect()
        }
        assert a and a == b
        for (vid_id, k), png in a.items():
            eid = int(vid_id[4:])
            assert np.array_equal(
                ic.decode_png(png), pv.synth_frame(eid, k)
            )


class TestSceneCuts:
    def test_cut_detected_only_at_injected_boundary(self, spark, sf_dir):
        rows = pv.with_scene_cuts(
            pv.videos_df(spark, sf_dir, every=200, cut_at=4)
        ).collect()
        assert rows  # sf0.001: 5 clips x 7 pairs
        by_clip = {}
        for r in rows:
            by_clip.setdefault(r["video_id"], []).append(r)
        for vid_id, rs in by_clip.items():
            assert len(rs) == 7
            cuts = {r["frame_no"] for r in rs if r["is_cut"]}
            assert cuts == {4}, (vid_id, cuts)

    def test_sad_matches_numpy_reference(self, spark, sf_dir):
        rows = pv.with_scene_cuts(
            pv.videos_df(spark, sf_dir, every=200, cut_at=4)
        ).collect()
        for r in rows[:14]:
            eid = int(r["video_id"][4:])
            a = pv.synth_frame(eid, r["frame_no"] - 1, cut_at=4).astype(np.int64)
            b = pv.synth_frame(eid, r["frame_no"], cut_at=4).astype(np.int64)
            assert r["sad_total"] == int(np.abs(a - b).sum())

    def test_no_cut_without_injection(self, spark, sf_dir):
        rows = pv.with_scene_cuts(
            pv.videos_df(spark, sf_dir, every=200)
        ).collect()
        assert rows and not any(r["is_cut"] for r in rows)


class TestClipNearDup:
    def test_pairs_classify_exact_vs_jittered(self, spark, sf_dir):
        rows = pv.clip_neardup(
            pv.videos_df(spark, sf_dir, every=400, jitter_period=1600)
        ).collect()
        assert rows
        for r in rows:
            ea, eb = int(r["video_id_a"][4:]), int(r["video_id_b"][4:])
            # candidates only arise inside a mod-32 (frame-identical) class
            assert ea % 32 == eb % 32
            same_epoch = (ea % 1600 >= 800) == (eb % 1600 >= 800)
            if same_epoch:
                assert r["hamming"] == 0, (ea, eb)
            else:
                assert 1 <= r["hamming"] <= 48, (ea, eb, r["hamming"])

    def test_hamming_matches_numpy_reference(self, spark, sf_dir):
        rows = pv.clip_neardup(
            pv.videos_df(spark, sf_dir, every=400, jitter_period=1600)
        ).collect()
        def frame_hash(e, k):
            if k == pv.N_FRAMES - 1 and e % 1600 >= 800:
                k = pv.N_FRAMES  # trailing-frame jitter
            return ic.phash64(pv.synth_frame(e, k))

        for r in rows[:6]:
            ea, eb = int(r["video_id_a"][4:]), int(r["video_id_b"][4:])
            ham = sum(
                bin(
                    (frame_hash(ea, k) ^ frame_hash(eb, k)) & ((1 << 64) - 1)
                ).count("1")
                for k in range(pv.N_FRAMES)
            )
            assert ham == r["hamming"], (ea, eb)

    def test_signature_is_payload_hash_only(self, spark, sf_dir):
        fh = pv.with_frame_hashes(
            pv.videos_df(spark, sf_dir, every=400)
        )
        assert [f.name for f in fh.schema.fields] == [
            "video_id", "frame_no", "fhash",
        ]
        rows = fh.collect()
        eids = {int(r["video_id"][4:]) for r in rows}
        for r in rows[:16]:
            eid = int(r["video_id"][4:])
            assert r["fhash"] == ic.phash64(pv.synth_frame(eid, r["frame_no"]))
        assert len(rows) == len(eids) * pv.N_FRAMES
