"""Audio table + framed-feature tests (multimodal audio modality)."""

import numpy as np
import pytest

from osm2vdv462_spark.pipeline import audio as au


class TestSynthDecode:
    def test_roundtrip_bytes(self):
        v = au.synth_samples(17)
        got = au.decode_pcm(v.tobytes(), "pcm_s16le")
        np.testing.assert_array_equal(got, v)
        assert got.dtype == np.dtype("<i2")

    def test_compressed_codec_stubbed(self):
        with pytest.raises(NotImplementedError):
            au.decode_pcm(b"\x00\x01", "mp3")

    def test_full_int16_range_survives(self):
        # the LCG spans [-32768, 32767]; tobytes/frombuffer must not wrap
        v = au.synth_samples(0, 65536)
        assert v.min() == -32768 and v.max() == 32767


class TestFrameFeatures:
    def test_matches_per_doc_numpy_oracle(self, spark, sf_dir):
        df = au.with_frame_features(au.audio_df(spark, sf_dir))
        got = {
            (r["doc_id"], r["frame_idx"]): (r["rms"], r["zcr"], r["peak"])
            for r in df.collect()
        }
        docs = [
            r[0]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id")
            .collect()
        ]
        assert len(got) == len(docs) * (au.N_SAMPLES // au.FRAME)
        for did in docs[:25]:
            v = au.synth_samples(did).astype(np.int64)
            for f in range(au.N_SAMPLES // au.FRAME):
                w = v[f * au.FRAME : (f + 1) * au.FRAME]
                rms = round(float(np.sqrt((w * w).sum() / au.FRAME)), 3)
                neg = w < 0
                zcr = int((neg[1:] != neg[:-1]).sum())
                peak = int(np.abs(w).max())
                assert got[(did, f)] == (rms, zcr, peak)

    def test_metadata_schema(self, spark, sf_dir):
        row = au.audio_df(spark, sf_dir).first()
        assert row["sr"] == au.SR
        assert row["n_samples"] == au.N_SAMPLES
        assert row["codec"] == "pcm_s16le"
        assert len(bytes(row["pcm"])) == 2 * au.N_SAMPLES


class TestCompressedCodecs:
    """From-scratch G.711 mu-law + IMA ADPCM (functions/audiocodec.py)."""

    def test_mulaw_roundtrip_error_bounded(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        x = np.stack([au.synth_samples(d) for d in range(8)])
        d = ac.mulaw_decode(ac.mulaw_encode(x))
        err = np.abs(
            d.astype(np.int32)
            - np.clip(x, -32635, 32635).astype(np.int32)
        )
        # top segment spacing is 1024; encode truncates the mantissa and
        # decode reconstructs mid-step, so worst error is half a step
        assert err.max() <= 512
        # decoded values are a fixed point of the codec (-0 collapses to
        # +0, so compare values, not codes)
        np.testing.assert_array_equal(
            ac.mulaw_decode(ac.mulaw_encode(d)), d
        )

    def test_mulaw_full_code_space(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        # decode every possible code and re-encode: identity on codes
        codes = np.arange(256, dtype=np.uint8)
        dec = ac.mulaw_decode(codes)
        # +/-0 collapse: 0xFF and 0x7F both decode to 0, which encodes
        # to the positive code
        re = ac.mulaw_encode(dec)
        flip = codes == 0x7F  # negative zero
        np.testing.assert_array_equal(re[~flip], codes[~flip])
        assert re[flip][0] == 0xFF

    def test_adpcm_scalar_equals_batch(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        x = np.stack([au.synth_samples(d, 700) for d in range(6)])
        blobs = ac.adpcm_encode_batch(x, spb=101)
        scalar = np.stack(
            [ac.adpcm_decode(b, 700, spb=101) for b in blobs]
        )
        batch = ac.adpcm_decode_batch(blobs, 700, spb=101)
        np.testing.assert_array_equal(scalar, batch)

    def test_adpcm_wire_format(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        x = np.stack([au.synth_samples(3, 400)])
        blobs = ac.adpcm_encode_batch(x, spb=101)
        b = blobs[0]
        # 4 blocks: 3 full (4 + 50 bytes) + final 97-sample (4 + 48)
        assert len(b) == 3 * 54 + 52
        # block 0 header: predictor = first raw sample, index 0
        assert int.from_bytes(b[0:2], "little", signed=True) == int(x[0, 0])
        assert b[2] == 0 and b[3] == 0
        # header predictors equal the raw block-start samples
        pos = 0
        for blk, t0 in enumerate((0, 101, 202, 303)):
            pred = int.from_bytes(b[pos : pos + 2], "little", signed=True)
            assert pred == int(x[0, t0])
            pos += 4 + ((min(101, 400 - t0) - 1) + 1) // 2

    def test_adpcm_index_runs_across_blocks(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        # a loud signal drives the step index up; block 2's header must
        # snapshot a nonzero running index (not restart at 0)
        x = (np.arange(400) % 2 * 20000 - 10000).astype(np.int16)[None, :]
        blobs = ac.adpcm_encode_batch(x, spb=101)
        b = blobs[0]
        second_header_idx = b[4 + 50 + 2]
        assert second_header_idx > 0

    def test_adpcm_tracks_smooth_signal(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        t = np.arange(1600)
        s = (3000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)[None, :]
        dec = ac.adpcm_decode_batch(ac.adpcm_encode_batch(s), 1600)
        snr = 10 * np.log10(
            float((s.astype(float) ** 2).sum())
            / float(((s - dec).astype(float) ** 2).sum())
        )
        assert snr > 20.0

    def test_decode_pcm_dispatches_compressed(self):
        from osm2vdv462_spark.functions import audiocodec as ac

        v = au.synth_samples(9, 400)
        mu = ac.mulaw_encode(v[None, :])[0].tobytes()
        np.testing.assert_array_equal(
            au.decode_pcm(mu, "mulaw"), ac.mulaw_decode(np.frombuffer(mu, np.uint8))
        )
        blob = ac.adpcm_encode_batch(v[None, :], spb=101)[0]
        np.testing.assert_array_equal(
            au.decode_pcm(blob, "ima_adpcm", n_samples=400, spb=101),
            ac.adpcm_decode(blob, 400, spb=101),
        )


class TestVadSegments:
    def _ref_segments(self, doc_id):
        v = au.synth_samples_gated(doc_id).astype(np.int64)
        loud = np.abs(v.reshape(-1, au.FRAME)).sum(1)
        sp = loud > au.VAD_THRESHOLD
        edges = np.flatnonzero(np.diff(np.r_[False, sp, False])).reshape(-1, 2)
        return [
            (doc_id, si, int(a), int(b - 1), int(b - a), int(loud[a:b].sum()))
            for si, (a, b) in enumerate(edges)
        ]

    def test_segments_match_numpy_reference(self, spark, sf_dir):
        rows = au.with_vad_segments(
            au.audio_df(spark, sf_dir, gated=True)
        ).collect()
        assert rows
        got = sorted(tuple(r) for r in rows)
        ids = {r["doc_id"] for r in rows}
        ref = sorted(t for d in ids for t in self._ref_segments(d))
        assert got == ref

    def test_segments_are_maximal_runs(self, spark, sf_dir):
        rows = au.with_vad_segments(
            au.audio_df(spark, sf_dir, gated=True)
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        multi = 0
        for d, rs in by_doc.items():
            rs.sort(key=lambda r: r["seg_idx"])
            for i, r in enumerate(rs):
                assert r["seg_idx"] == i
                assert r["end_frame"] - r["start_frame"] + 1 == r["n_frames"]
                if i:
                    # maximal: a silent frame separates consecutive runs
                    assert r["start_frame"] > rs[i - 1]["end_frame"] + 1
            multi += len(rs) > 1
        assert multi  # the gate pattern produces split clips

    def test_gated_waveform_has_real_silence(self):
        v = au.synth_samples_gated(1).astype(np.int64)
        loud = np.abs(v.reshape(-1, au.FRAME)).sum(1)
        assert loud.min() < au.VAD_THRESHOLD // 10
        assert loud.max() > au.VAD_THRESHOLD * 2


class TestSpectralBins:
    def test_twiddles_match_duckdb(self):
        """The oracle regenerates the Q14 twiddle table in SQL; if this
        box's libm or DuckDB's rounding ever diverges from numpy's, the
        spectral oracle would hash-mismatch — fail HERE with a pointed
        message instead."""
        import duckdb

        wc, ws = au.spectral_twiddles()
        got = duckdb.sql(
            """
            SELECT bin, j,
                   CAST(round(cos(2*pi()*(bin*j)/400)*16384) AS BIGINT) AS wc,
                   CAST(round(sin(2*pi()*(bin*j)/400)*16384) AS BIGINT) AS ws
            FROM (SELECT unnest([1,2,3,5,8,13,21,34]) AS bin)
            CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range(400))
            ORDER BY bin, j
            """
        ).fetchnumpy()
        order = np.argsort(np.asarray(au.SPECTRAL_BINS))
        np.testing.assert_array_equal(
            got["wc"].reshape(8, 400), wc[order],
            err_msg="DuckDB cos/round twiddles diverge from numpy",
        )
        np.testing.assert_array_equal(
            got["ws"].reshape(8, 400), ws[order],
            err_msg="DuckDB sin/round twiddles diverge from numpy",
        )

    def test_impulse_and_constant_signals(self):
        """DFT ground truths: an impulse at j=0 has re = 16384 (w[0] =
        cos 0 * 2^14) and im = 0 in every bin; a constant signal sums
        each twiddle row, which is ~0 for whole-period bins."""
        wc, ws = au.spectral_twiddles()
        impulse = np.zeros((1, 1, 400), np.int64)
        impulse[0, 0, 0] = 1
        re = impulse @ wc.T.copy()
        im = -(impulse @ ws.T.copy())
        assert (re == au.SPECTRAL_SCALE).all()
        assert (im == 0).all()
        const = np.ones((1, 1, 400), np.int64)
        # all probe bins are nonzero integers < 400 -> whole periods
        assert np.abs(const @ wc.T.copy()).max() <= 8  # rounding residue
        assert np.abs(const @ ws.T.copy()).max() <= 8

    def test_pure_tone_concentrates_power(self, spark, sf_dir):
        """A synthetic int16 cosine at bin 8 must put (by far) its
        largest power_q in bin 8 — end-to-end through the DataFrame op."""
        import pandas as pd

        j = np.arange(400)
        tone = np.round(20000 * np.cos(2 * np.pi * 8 * j / 400)).astype(
            np.int16
        )
        pcm = np.tile(tone, 4).tobytes()
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1],
                    "pcm": [pcm],
                    "sr": [au.SR],
                    "n_samples": [1600],
                    "codec": ["pcm_s16le"],
                }
            )
        )
        rows = au.with_spectral_bins(df).collect()
        assert len(rows) == 4 * len(au.SPECTRAL_BINS)
        for fi in range(4):
            by_bin = {r["bin"]: r["power_q"] for r in rows if r["frame_idx"] == fi}
            top = max(by_bin, key=by_bin.get)
            assert top == 8
            others = [v for b, v in by_bin.items() if b != 8]
            assert by_bin[8] > 100 * max(others + [1])


class TestPitchLag:
    def test_recovers_ground_truth_period(self, spark, sf_dir):
        # square-wave autocorr peaks exactly at the synth period p
        clips = au.audio_df(spark, sf_dir, codec="pcm_s16le", wave="square")
        rows = au.with_pitch_lag(clips).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["best_lag"] == 40 + (r["doc_id"] * 13) % 60
            assert r["pitch_hz_e2"] == (16000 * 100) // r["best_lag"]

    def test_survives_lossy_adpcm_roundtrip(self, spark, sf_dir):
        # codec robustness: the 4-bit ADPCM round-trip distorts samples
        # but the argmax lag still lands on the true period
        clips = au.audio_df(spark, sf_dir, codec="ima_adpcm", wave="square")
        rows = au.with_pitch_lag(clips).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["best_lag"] == 40 + (r["doc_id"] * 13) % 60
