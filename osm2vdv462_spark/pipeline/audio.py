"""The audio table + audio operators (multimodal axis, audio modality).

Same contract as pipeline/images.py: media ride as opaque ``binary``
columns with typed metadata (sample rate, sample count, codec), all
per-clip compute is Arrow-batched ``mapInPandas``, and the synthesis is
deterministic closed-form arithmetic so a DuckDB oracle can recompute
every feature bit-exactly (integer LCG waveform — float waveforms would
make the oracle hostage to libm ULP differences across engines).

Schema: (doc_id bigint, pcm binary  s16le mono, sr int, n_samples int,
codec string).

Operators:
* ``audio_df``: one 0.1 s clip per `documents` row;
* ``decode_pcm``: binary -> int16 sample vector (raises
  NotImplementedError for compressed codecs — no audio libs in this
  container, per brief; the Spark-side plumbing is identical for a real
  decoder);
* ``with_frame_features``: framed feature extraction (RMS,
  zero-crossing count, peak) — the audio analog of the reference's
  per-element geometry measurements, and the shape a training-data
  pipeline uses for VAD/quality filtering at 100 TB: one map-side pass,
  no shuffle, output rows = clips x frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SR = 16000
N_SAMPLES = 1600  # 0.1 s per clip keeps small-SF tests cheap
FRAME = 400


def synth_samples(doc_id: int, n: int = N_SAMPLES) -> np.ndarray:
    """Deterministic int16 waveform: pure int64 arithmetic, reproducible
    bit-exactly by the DuckDB oracle (media_queries.audio oracle SQL)."""
    k = np.arange(n, dtype=np.int64)
    v = (doc_id * 7919 + k * 104729 + 12345) % 65536 - 32768
    return v.astype(np.int16)


def decode_pcm(blob: bytes, codec: str) -> np.ndarray:
    """binary -> int16 samples. Compressed codecs are STUBBED (no
    libsndfile/ffmpeg in this container — task brief): the distributed
    plumbing (binary column in, ndarray out) is what a real decoder
    would plug into."""
    if codec != "pcm_s16le":
        raise NotImplementedError(f"no decoder for codec {codec!r}")
    return np.frombuffer(blob, dtype="<i2")


def audio_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PCM clip per `documents` row (binary + typed metadata)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def _gen(batches):
        for pdf in batches:
            out = [
                (
                    int(did),
                    synth_samples(int(did)).tobytes(),
                    SR,
                    N_SAMPLES,
                    "pcm_s16le",
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                out, columns=["doc_id", "pcm", "sr", "n_samples", "codec"]
            )

    return docs.mapInPandas(
        _gen,
        "doc_id bigint, pcm binary, sr int, n_samples int, codec string",
    )


def with_frame_features(audio: DataFrame, frame: int = FRAME) -> DataFrame:
    """Framed RMS / zero-crossings / peak per clip.

    Output: (doc_id bigint, frame_idx int, rms double  round 3dp,
    zcr int  sign flips between consecutive samples WITHIN the frame,
    peak int  max |sample|). One map-side pass over the audio table —
    no shuffle; at 10^12 clips this parallelizes per input split."""

    def _group_feat(doc_ids: np.ndarray, m3: np.ndarray, frame: int):
        """One vectorized pass over a (clips, n_frames, frame) int64
        stack; returns the per-frame feature frame."""
        nc, nf, _ = m3.shape
        rms = np.round(np.sqrt((m3 * m3).sum(2) / float(frame)), 3)
        neg = m3 < 0
        zcr = (neg[:, :, 1:] != neg[:, :, :-1]).sum(2)
        peak = np.abs(m3).max(2)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(doc_ids, nf),
                "frame_idx": np.tile(np.arange(nf, dtype=np.int32), nc),
                "rms": rms.ravel(),
                "zcr": zcr.ravel().astype(np.int32),
                "peak": peak.ravel().astype(np.int32),
            }
        )

    def _feat(batches):
        for pdf in batches:
            # decode is a zero-copy frombuffer view per clip; the feature
            # math runs ONE vectorized pass per (codec, length) group —
            # no per-row Python in the compute
            by_shape: dict = {}
            for row in pdf.itertuples(index=False):
                v = decode_pcm(bytes(row.pcm), row.codec)
                nf = len(v) // frame
                if nf == 0:
                    continue
                by_shape.setdefault(nf, ([], []))
                by_shape[nf][0].append(int(row.doc_id))
                by_shape[nf][1].append(v[: nf * frame])
            parts = [
                _group_feat(
                    np.asarray(ids, np.int64),
                    np.stack(clips).astype(np.int64).reshape(
                        len(clips), nf, frame
                    ),
                    frame,
                )
                for nf, (ids, clips) in sorted(by_shape.items())
            ]
            yield (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "frame_idx": pd.Series(dtype="int32"),
                        "rms": pd.Series(dtype="float64"),
                        "zcr": pd.Series(dtype="int32"),
                        "peak": pd.Series(dtype="int32"),
                    }
                )
            )

    return audio.mapInPandas(
        _feat, "doc_id bigint, frame_idx int, rms double, zcr int, peak int"
    )
