"""From-scratch compressed-audio codecs: G.711 mu-law and IMA ADPCM.

Closes the `pipeline/audio.py::decode_pcm` NotImplementedError boundary
for the two classic telephony/RIFF codecs that are implementable from
the public specs with numpy alone (no libsndfile/ffmpeg in this
container; modern perceptual codecs stay out of scope).

* **G.711 mu-law** (ITU-T G.711): memoryless 8-bit companding of 16-bit
  PCM. Encode and decode are closed-form per-sample expressions, so
  both directions vectorize to whole-array numpy AND the DuckDB gate
  oracle can reproduce the full encode->decode composition in SQL
  (queries/media_queries.py::_MULAW_ORACLE).
* **IMA ADPCM** (IMA "DVI4" / WAV codec 0x11): 4-bit differential
  coding with an adaptive step size — a stateful per-sample machine.
  The per-sample recurrence cannot be expressed as whole-array numpy,
  but it CAN be vectorized ACROSS clips: `mapInPandas` batches stack
  each Arrow batch's clips into a (clips, samples) matrix and the
  sample loop advances all clips' (predictor, index) states in lockstep
  — the per-Python-step cost is amortized over the batch width, which
  is the same trick the JPEG codec uses for its per-block loops. The
  DuckDB twin replicates the exact state machine with a recursive CTE
  (_ADPCM_ORACLE), so even the stateful codec is hash-gated.

Wire formats (public IMA/WAV layout, mono):
  mu-law: one uint8 code per sample.
  IMA ADPCM: blocks of `spb` samples; each block = 4-byte header
  (predictor int16le = first raw sample, step index uint8, reserved 0)
  followed by (spb-1) 4-bit nibbles packed two per byte, LOW nibble
  first. The step index RUNS ACROSS blocks (the header snapshots it, as
  real encoders do). Default spb=505 gives the canonical 256-byte mono
  block. No nibble is emitted for a block's first sample.

Reference parity: the reference pipeline has no audio path; this module
belongs to the LLM-training-data mandate (multimodal columns) — the
audio analog of functions/jpegcodec.py.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- G.711

_BIAS = 0x84  # 132
_CLIP = 32635


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 mu-law codes (vectorized, G.711)."""
    v = x.astype(np.int32)
    sign = np.where(v < 0, 0x80, 0)
    mag = np.minimum(np.abs(v), _CLIP) + _BIAS
    # mag in [132, 32767]: its top set bit is in [7, 14]; exponent is
    # the segment number (top-bit position - 7).  log2 of an exactly
    # representable int is exact at powers of two and strictly below the
    # next integer otherwise, so the floor is bit-correct.
    exponent = np.floor(np.log2(mag)).astype(np.int32) - 7
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 linear (vectorized, G.711)."""
    u = ~codes.astype(np.int32) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _BIAS) << exponent) - _BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


# ------------------------------------------------------------ IMA ADPCM

STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)

# index adjustment by nibble magnitude (low 3 bits); sign bit reuses it
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

SPB = 505  # samples per block -> the canonical 256-byte mono block


def _quantize(diff_abs: np.ndarray, step: np.ndarray):
    """Vectorized IMA quantizer: |diff|, step -> (delta 0..7, diffq)."""
    b2 = diff_abs >= step
    r = diff_abs - np.where(b2, step, 0)
    h = step >> 1
    b1 = r >= h
    r = r - np.where(b1, h, 0)
    q = step >> 2
    b0 = r >= q
    delta = (b2 << 2) | (b1 << 1) | b0.astype(np.int32)
    diffq = (step >> 3) + np.where(b2, step, 0) + np.where(b1, h, 0) + np.where(b0, q, 0)
    return delta, diffq


def adpcm_encode_batch(samples: np.ndarray, spb: int = SPB) -> list[bytes]:
    """Encode a (clips, n) int16 matrix; returns one blob per clip.

    The sample loop is Python (the recurrence is inherently serial) but
    every step is vectorized across the full clip axis, so the per-step
    interpreter cost divides by the Arrow batch width.
    """
    c, n = samples.shape
    s = samples.astype(np.int32)
    idx = np.zeros(c, dtype=np.int32)
    pred = np.zeros(c, dtype=np.int32)
    # per-sample outputs: headers at block starts, nibbles elsewhere
    nibbles = np.zeros((c, n), dtype=np.uint8)
    head_pred = np.zeros((c, (n + spb - 1) // spb), dtype=np.int16)
    head_idx = np.zeros((c, (n + spb - 1) // spb), dtype=np.uint8)
    for t in range(n):
        v = s[:, t]
        if t % spb == 0:
            b = t // spb
            head_pred[:, b] = v.astype(np.int16)
            head_idx[:, b] = idx.astype(np.uint8)
            pred = v.copy()
            continue
        step = STEP_TABLE[idx]
        diff = v - pred
        sign = diff < 0
        delta, diffq = _quantize(np.abs(diff), step)
        pred = np.clip(pred + np.where(sign, -diffq, diffq), -32768, 32767)
        nibbles[:, t] = (delta | (sign << 3)).astype(np.uint8)
        idx = np.clip(idx + INDEX_TABLE[delta], 0, 88)
    out = []
    for ci in range(c):
        parts = []
        for b0 in range(0, n, spb):
            b = b0 // spb
            parts.append(
                int(head_pred[ci, b]).to_bytes(2, "little", signed=True)
                + bytes([int(head_idx[ci, b]), 0])
            )
            nib = nibbles[ci, b0 + 1 : min(b0 + spb, n)]
            if len(nib) % 2:
                nib = np.append(nib, np.uint8(0))
            parts.append((nib[0::2] | (nib[1::2] << 4)).tobytes())
        out.append(b"".join(parts))
    return out


def adpcm_decode(blob: bytes, n_samples: int, spb: int = SPB) -> np.ndarray:
    """Decode one IMA ADPCM blob -> int16 samples (per-clip)."""
    out = np.empty(n_samples, dtype=np.int16)
    pos = 0
    t = 0
    while t < n_samples:
        pred = int.from_bytes(blob[pos : pos + 2], "little", signed=True)
        idx = blob[pos + 2]
        pos += 4
        out[t] = pred
        take = min(spb, n_samples - t) - 1
        nbytes = (take + 1) // 2
        packed = np.frombuffer(blob[pos : pos + nbytes], dtype=np.uint8)
        pos += nbytes
        nib = np.empty(nbytes * 2, dtype=np.uint8)
        nib[0::2] = packed & 0x0F
        nib[1::2] = packed >> 4
        for k in range(take):
            nv = int(nib[k])
            step = int(STEP_TABLE[idx])
            delta = nv & 7
            diffq = step >> 3
            if delta & 4:
                diffq += step
            if delta & 2:
                diffq += step >> 1
            if delta & 1:
                diffq += step >> 2
            pred = pred - diffq if nv & 8 else pred + diffq
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(INDEX_TABLE[delta])))
            t_out = t + 1 + k
            out[t_out] = pred
        t += take + 1
    return out


def adpcm_decode_batch(
    blobs: list[bytes], n_samples: int, spb: int = SPB
) -> np.ndarray:
    """Decode equal-length blobs as a (clips, n) matrix, clip-vectorized
    (same lockstep trick as the encoder — one Python loop over samples,
    numpy over the clip axis)."""
    c = len(blobs)
    if c == 0:
        return np.empty((0, n_samples), dtype=np.int16)
    mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(c, -1)
    out = np.empty((c, n_samples), dtype=np.int16)
    idx = np.zeros(c, dtype=np.int32)
    pred = np.zeros(c, dtype=np.int32)
    pos = 0
    t = 0
    while t < n_samples:
        pred = (
            mat[:, pos].astype(np.int32)
            | (mat[:, pos + 1].astype(np.int32) << 8)
        )
        pred = np.where(pred >= 32768, pred - 65536, pred)
        idx = mat[:, pos + 2].astype(np.int32)
        pos += 4
        out[:, t] = pred.astype(np.int16)
        take = min(spb, n_samples - t) - 1
        nbytes = (take + 1) // 2
        packed = mat[:, pos : pos + nbytes]
        pos += nbytes
        nib = np.empty((c, nbytes * 2), dtype=np.uint8)
        nib[:, 0::2] = packed & 0x0F
        nib[:, 1::2] = packed >> 4
        for k in range(take):
            nv = nib[:, k].astype(np.int32)
            delta = nv & 7
            step = STEP_TABLE[idx]
            diffq = (
                (step >> 3)
                + np.where(delta & 4, step, 0)
                + np.where(delta & 2, step >> 1, 0)
                + np.where(delta & 1, step >> 2, 0)
            )
            pred = np.clip(
                pred + np.where(nv & 8, -diffq, diffq), -32768, 32767
            )
            idx = np.clip(idx + INDEX_TABLE[delta], 0, 88)
            out[:, t + 1 + k] = pred.astype(np.int16)
        t += take + 1
    return out
