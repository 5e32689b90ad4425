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
* ``decode_pcm``: binary -> int16 sample vector. Since r4 the codec
  column is real: 'mulaw' (G.711) and 'ima_adpcm' (4-bit blocks) route
  through the from-scratch numpy codecs in functions/audiocodec.py;
  only modern perceptual codecs (mp3/aac/opus) remain a
  NotImplementedError boundary (no audio libs in this container);
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

from .. import deploy
from ..functions import audiocodec

SR = 16000
N_SAMPLES = 1600  # 0.1 s per clip keeps small-SF tests cheap
FRAME = 400


def synth_samples(doc_id: int, n: int = N_SAMPLES) -> np.ndarray:
    """Deterministic int16 waveform: pure int64 arithmetic, reproducible
    bit-exactly by the DuckDB oracle (media_queries.audio oracle SQL)."""
    k = np.arange(n, dtype=np.int64)
    v = (doc_id * 7919 + k * 104729 + 12345) % 65536 - 32768
    return v.astype(np.int16)


def synth_samples_square(doc_id: int, n: int = N_SAMPLES) -> np.ndarray:
    """Deterministic PERIODIC waveform (50%-duty square wave, period
    p = 40 + (doc_id*13) % 60 samples => 160-400 Hz at SR 16k): the
    pitched corpus for the autocorrelation pitch tracker. The LCG
    waveforms are spectrally flat noise — a pitch estimate over them
    would be arbitrary; a square wave has its autocorrelation maximum
    exactly at lag = p, so the tracker's answer is ground-truthable
    closed-form (integer arithmetic end-to-end)."""
    p = 40 + (doc_id * 13) % 60
    k = np.arange(n, dtype=np.int64)
    return np.where((k % p) < p // 2, 8000, -8000).astype(np.int16)


VAD_REGION = 400  # silence-gate granularity (samples)


def synth_samples_gated(
    doc_id: int, n: int = N_SAMPLES, region: int = VAD_REGION
) -> np.ndarray:
    """The LCG waveform with deterministic silence: regions of ``region``
    samples where ((doc_id*31 + region_idx*17) % 5) < 2 are attenuated
    64x. The attenuation divides the NON-NEGATIVE raw LCG value before
    centering (``raw//64 - 512``) — division semantics on negatives
    differ between numpy (floor) and DuckDB (truncate), so the closed
    form stays on non-negative operands. The *17 stepping mod 5 gives
    each clip a doc_id-dependent silent-frame pattern (0-2 of its 4
    regions), so segment counts and boundaries genuinely vary."""
    k = np.arange(n, dtype=np.int64)
    raw = (doc_id * 7919 + k * 104729 + 12345) % 65536
    silent = (doc_id * 31 + (k // region) * 17) % 5 < 2
    return np.where(silent, raw // 64 - 512, raw - 32768).astype(np.int16)


def decode_pcm(
    blob: bytes,
    codec: str,
    n_samples: int | None = None,
    spb: int = audiocodec.SPB,
) -> np.ndarray:
    """binary -> int16 samples. Real decoders since r4: raw s16le,
    G.711 mu-law, and IMA ADPCM (functions/audiocodec.py — from-scratch
    numpy codecs). Modern perceptual codecs (mp3/aac/opus) remain a
    NotImplementedError boundary (no audio libs in this container —
    task brief); the distributed plumbing is codec-agnostic."""
    if codec == "pcm_s16le":
        return np.frombuffer(blob, dtype="<i2")
    if codec == "mulaw":
        return audiocodec.mulaw_decode(np.frombuffer(blob, dtype=np.uint8))
    if codec == "ima_adpcm":
        if n_samples is None:
            raise ValueError("ima_adpcm decode needs n_samples")
        return audiocodec.adpcm_decode(blob, n_samples, spb=spb)
    raise NotImplementedError(f"no decoder for codec {codec!r}")


def _decode_group(
    blobs: list[bytes],
    codec: str,
    n_samples: int,
    spb: int = audiocodec.SPB,
) -> np.ndarray:
    """Batch decode of same-(codec, length) clips -> (clips, n) int64.
    All three codecs decode clip-vectorized (the ADPCM state loop runs
    lockstep across the clip axis — see functions/audiocodec.py)."""
    if codec == "pcm_s16le":
        m = np.frombuffer(b"".join(blobs), dtype="<i2")
        return m.reshape(len(blobs), n_samples).astype(np.int64)
    if codec == "mulaw":
        m = audiocodec.mulaw_decode(
            np.frombuffer(b"".join(blobs), dtype=np.uint8)
        )
        return m.reshape(len(blobs), n_samples).astype(np.int64)
    if codec == "ima_adpcm":
        return audiocodec.adpcm_decode_batch(blobs, n_samples, spb=spb).astype(
            np.int64
        )
    raise NotImplementedError(f"no decoder for codec {codec!r}")


def audio_df(
    spark: SparkSession,
    sf_dir: str,
    codec: str = "pcm_s16le",
    n_samples: int = N_SAMPLES,
    spb: int = audiocodec.SPB,
    gated: bool = False,
    wave: str | None = None,
) -> DataFrame:
    """One clip per `documents` row (binary + typed metadata).

    codec selects the stored wire format: 'pcm_s16le' (raw), 'mulaw'
    (G.711-companded), or 'ima_adpcm' (4-bit blocks) — the latter two
    run the real from-scratch ENCODERS (functions/audiocodec.py), so
    downstream decode queries exercise genuine compressed blobs.
    ``gated`` switches to the silence-gated waveform (VAD corpus)."""

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .repartition(deploy.binary_stage_parallelism(spark, mult=1))
    )

    def _gen(batches):
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            if not ids:
                continue
            synth = synth_samples_gated if gated else synth_samples
            if wave == "square":
                synth = synth_samples_square
            raw = np.stack([synth(d, n_samples) for d in ids])
            if codec == "pcm_s16le":
                blobs = [r.tobytes() for r in raw]
            elif codec == "mulaw":
                enc = audiocodec.mulaw_encode(raw)
                blobs = [r.tobytes() for r in enc]
            elif codec == "ima_adpcm":
                blobs = audiocodec.adpcm_encode_batch(raw, spb=spb)
            else:
                raise NotImplementedError(f"no encoder for codec {codec!r}")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "pcm": blobs,
                    "sr": SR,
                    "n_samples": n_samples,
                    "codec": codec,
                }
            )

    return docs.mapInPandas(
        _gen,
        "doc_id bigint, pcm binary, sr int, n_samples int, codec string",
    )


def with_frame_features(
    audio: DataFrame, frame: int = FRAME, spb: int = audiocodec.SPB
) -> DataFrame:
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
            # batch decode per (codec, length) group (the ADPCM state
            # loop runs lockstep across the clip axis), then ONE
            # vectorized feature pass per group — no per-row Python in
            # decode or compute
            by_key: dict = {}
            for row in pdf.itertuples(index=False):
                key = (row.codec, int(row.n_samples))
                by_key.setdefault(key, ([], []))
                by_key[key][0].append(int(row.doc_id))
                by_key[key][1].append(bytes(row.pcm))
            parts = []
            for (codec, n), (ids, blobs) in sorted(by_key.items()):
                nf = n // frame
                if nf == 0:
                    continue
                mat = _decode_group(blobs, codec, n, spb)[:, : nf * frame]
                parts.append(
                    _group_feat(
                        np.asarray(ids, np.int64),
                        mat.reshape(len(blobs), nf, frame),
                        frame,
                    )
                )
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


SPECTRAL_BINS = (1, 2, 3, 5, 8, 13, 21, 34)
SPECTRAL_SCALE = 16384  # Q14 twiddle fixed point


def spectral_twiddles(
    frame: int = FRAME, bins: tuple = SPECTRAL_BINS
) -> tuple[np.ndarray, np.ndarray]:
    """Q14 integer DFT twiddles: wc[i,j] = round(cos(2*pi*bin_i*j/frame)
    * 16384), ws likewise with sin. The DuckDB oracle regenerates this
    exact table in SQL with the same operand association
    ((2*pi())*(bin*j))/frame and the same libm cos/sin on identical
    doubles, so the per-bin re/im become pure integer sums that hash
    bit-exactly across engines (tests/test_audio.py pins numpy ==
    DuckDB twiddle equality so a libm divergence fails loudly, not as
    a silent oracle mismatch)."""
    j = np.arange(frame, dtype=np.int64)
    wc = np.empty((len(bins), frame), np.int64)
    ws = np.empty((len(bins), frame), np.int64)
    for i, b in enumerate(bins):
        angle = (2 * np.pi) * (b * j) / float(frame)
        wc[i] = np.round(np.cos(angle) * SPECTRAL_SCALE).astype(np.int64)
        ws[i] = np.round(np.sin(angle) * SPECTRAL_SCALE).astype(np.int64)
    return wc, ws


def with_spectral_bins(
    audio: DataFrame,
    frame: int = FRAME,
    bins: tuple = SPECTRAL_BINS,
    spb: int = audiocodec.SPB,
) -> DataFrame:
    """Framed integer DFT (the spectrogram row a speech/music curation
    pass filters on): per clip frame and probe bin, the Q14 fixed-point
    Fourier coefficients re = sum(v * wc), im = -sum(v * ws) and the
    quantized power floor((re^2 + im^2) / 2^28).

    Scale shape: one map-side pass (decode -> (clips, frames, frame)
    stack -> ONE int64 matmul against the (bins, frame) twiddle table)
    — no shuffle, no per-row Python; output rows = clips x frames x
    bins. At 10^12 clips this is embarrassingly parallel per input
    split, exactly like with_frame_features. Integer end-to-end: the
    matmul is exact (|v| <= 2^15, |w| <= 2^14, frame = 400 => |re| <=
    2.2e14 < 2^63), and the only float step, power quantization, is a
    single-rounded double expression replayed identically by the
    oracle."""
    wc, ws = spectral_twiddles(frame, bins)
    wct, wst = wc.T.copy(), ws.T.copy()
    bins_arr = np.asarray(bins, np.int32)

    def _spec(batches):
        for pdf in batches:
            by_key: dict = {}
            for row in pdf.itertuples(index=False):
                key = (row.codec, int(row.n_samples))
                by_key.setdefault(key, ([], []))
                by_key[key][0].append(int(row.doc_id))
                by_key[key][1].append(bytes(row.pcm))
            parts = []
            for (codec, n), (ids, blobs) in sorted(by_key.items()):
                nf = n // frame
                if nf == 0:
                    continue
                m3 = _decode_group(blobs, codec, n, spb)[:, : nf * frame]
                m3 = m3.reshape(len(blobs), nf, frame)
                re = m3 @ wct  # (clips, nf, nbins) exact int64
                im = -(m3 @ wst)
                red = re.astype(np.float64)
                imd = im.astype(np.float64)
                power_q = np.floor(
                    (red * red + imd * imd) / 268435456.0
                ).astype(np.int64)
                nc = len(ids)
                nb = len(bins_arr)
                parts.append(
                    pd.DataFrame(
                        {
                            "doc_id": np.repeat(
                                np.asarray(ids, np.int64), nf * nb
                            ),
                            "frame_idx": np.tile(
                                np.repeat(np.arange(nf, dtype=np.int32), nb),
                                nc,
                            ),
                            "bin": np.tile(bins_arr, nc * nf),
                            "re": re.ravel(),
                            "im": im.ravel(),
                            "power_q": power_q.ravel(),
                        }
                    )
                )
            yield (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "frame_idx": pd.Series(dtype="int32"),
                        "bin": pd.Series(dtype="int32"),
                        "re": pd.Series(dtype="int64"),
                        "im": pd.Series(dtype="int64"),
                        "power_q": pd.Series(dtype="int64"),
                    }
                )
            )

    return audio.mapInPandas(
        _spec,
        "doc_id bigint, frame_idx int, bin int, re bigint, im bigint,"
        " power_q bigint",
    )


VAD_THRESHOLD = 1_600_000  # sum|sample| per 400-sample frame: full-scale
#                            LCG ~6.5M, attenuated ~0.1M, half-loud ~3.3M
#                            -> speech iff >= 1 of the frame's 2 gate
#                            regions is loud. Rescale as ~4000 * frame.


def with_vad_segments(
    audio: DataFrame,
    frame: int = FRAME,
    threshold: int = VAD_THRESHOLD,
    spb: int = audiocodec.SPB,
) -> DataFrame:
    """Energy VAD + segmentation: per-frame integer loudness
    (sum |sample|) -> speech flag -> consecutive speech frames merged
    into segments. The run merge is CLIP-LOCAL (a clip's frames all
    live in its own row), so the whole pass is map-side — no shuffle,
    no window exchange; at 10^12 clips this is the speech-segmentation
    curation pass before transcription/packing. All-integer arithmetic,
    so the DuckDB oracle (audio_vad_segments) replays every loudness
    and boundary exactly.

    Output: (doc_id, seg_idx, start_frame, end_frame, n_frames,
    loud_total) — one row per maximal run of speech frames."""

    def _vad(batches):
        for pdf in batches:
            by_key: dict = {}
            for row in pdf.itertuples(index=False):
                key = (row.codec, int(row.n_samples))
                by_key.setdefault(key, ([], []))
                by_key[key][0].append(int(row.doc_id))
                by_key[key][1].append(bytes(row.pcm))
            out = []
            for (codec, n), (ids, blobs) in sorted(by_key.items()):
                nf = n // frame
                if nf == 0:
                    continue
                mat = _decode_group(blobs, codec, n, spb)[:, : nf * frame]
                loud = np.abs(mat.reshape(len(blobs), nf, frame)).sum(2)
                speech = loud > threshold
                for ci, did in enumerate(ids):
                    row_sp = speech[ci]
                    # run boundaries: pad with False, diff flags edges
                    edges = np.flatnonzero(
                        np.diff(np.r_[False, row_sp, False])
                    ).reshape(-1, 2)
                    for si, (a, b) in enumerate(edges):
                        out.append(
                            (
                                did,
                                si,
                                int(a),
                                int(b - 1),
                                int(b - a),
                                int(loud[ci, a:b].sum()),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "seg_idx", "start_frame", "end_frame",
                    "n_frames", "loud_total",
                ],
            )

    return audio.mapInPandas(
        _vad,
        "doc_id bigint, seg_idx int, start_frame int, end_frame int,"
        " n_frames int, loud_total bigint",
    )


PITCH_LAG_MIN = 20  # 800 Hz ceiling at SR 16k
PITCH_LAG_MAX = 119  # ~134 Hz floor; covers the square corpus (p 40-99)


def with_pitch_lag(
    audio: DataFrame,
    lag_min: int = PITCH_LAG_MIN,
    lag_max: int = PITCH_LAG_MAX,
    spb: int = audiocodec.SPB,
) -> DataFrame:
    """Autocorrelation pitch tracker: decode -> integer autocorrelation
    corr(lag) = sum_k v[k]*v[k+lag] over the whole clip for lag in
    [lag_min, lag_max], best lag = argmax with ties to the SMALLEST lag
    (np.argmax first-max — the same pinned tie-break the SQL twin's
    ORDER BY corr DESC, lag uses). Pure int64 arithmetic (|v| <= 32768,
    1600 samples => |corr| <= 1.7e12 — no overflow, no float parity
    risk). One map-side pass, clip-vectorized across the batch; output
    is a 4-column projection (doc_id, best_lag, best_corr,
    pitch_hz_e2 = floor(SR*100 / best_lag))."""

    def _pitch(batches):
        for pdf in batches:
            by_key: dict = {}
            for row in pdf.itertuples(index=False):
                key = (row.codec, int(row.n_samples), int(row.sr))
                by_key.setdefault(key, ([], []))
                by_key[key][0].append(int(row.doc_id))
                by_key[key][1].append(bytes(row.pcm))
            parts = []
            for (codec, n, sr), (ids, blobs) in sorted(by_key.items()):
                mat = _decode_group(blobs, codec, n, spb)
                lags = np.arange(lag_min, lag_max + 1)
                corr = np.empty((len(blobs), lags.size), dtype=np.int64)
                for j, lag in enumerate(lags):
                    corr[:, j] = (mat[:, : n - lag] * mat[:, lag:]).sum(1)
                best_j = np.argmax(corr, axis=1)
                best_lag = lags[best_j]
                parts.append(
                    pd.DataFrame(
                        {
                            "doc_id": np.asarray(ids, np.int64),
                            "best_lag": best_lag.astype(np.int32),
                            "best_corr": corr[
                                np.arange(len(blobs)), best_j
                            ],
                            "pitch_hz_e2": (sr * 100) // best_lag,
                        }
                    )
                )
            yield (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "best_lag": pd.Series(dtype="int32"),
                        "best_corr": pd.Series(dtype="int64"),
                        "pitch_hz_e2": pd.Series(dtype="int64"),
                    }
                )
            )

    return audio.mapInPandas(
        _pitch,
        "doc_id bigint, best_lag int, best_corr bigint, pitch_hz_e2 bigint",
    )
