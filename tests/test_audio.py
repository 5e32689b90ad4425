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
