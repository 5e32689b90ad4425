"""From-scratch RIFF/AVI video container: writer + parser + frame codec.

Closes the `pipeline/images.py::frame_sample_stub` boundary with a REAL
video path built only from public specs (RIFF/AVI container layout,
BITMAPINFOHEADER DIB pixel format) and the repo's own from-scratch
baseline JPEG codec (functions/jpegcodec.py):

* **rawdib** stream ('00db' chunks, BI_RGB): uncompressed 24-bit DIB
  frames — BGR byte order, bottom-up rows, rows padded to 4 bytes.
  Lossless, so decoded pixels are bit-exact and the DuckDB gate oracle
  can recompute per-frame statistics from the synthesis formula.
* **mjpeg** stream ('00dc' chunks, 'MJPG'): each frame is an
  independent baseline JPEG — the classic Motion-JPEG layout real
  capture pipelines emit. Lossy; gated by PSNR/pytest instead of a
  value hash.

Scale design: `parse_avi` reads ONLY the header and the chunk index
(one linear scan over chunk headers — it never touches frame
payloads), so sampling k frames from an n-frame clip decodes exactly k
frames. At 100 TB of video this is the difference between reading 1%
and 100% of each blob. The writer emits a spec-complete file (hdrl
with avih/strh/strf, movi, idx1) so external players/parsers accept
the output; the parser works from the movi scan alone and only uses
idx1 as a cross-check, so truncated/index-less files still read.

No counterpart in the reference (a geodata pipeline); this module
belongs to the LLM-training-data mandate's multimodal axis — the video
analog of functions/jpegcodec.py / audiocodec.py.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpegcodec
from .imagecodec import decode_png  # noqa: F401  (re-export convenience)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def _dib_encode(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB -> bottom-up BGR rows, 4-byte padded (BI_RGB)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _dib_decode(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()


def encode_avi(
    frames: list[np.ndarray],
    fps: int = 10,
    codec: str = "rawdib",
    quality: int = 92,
) -> bytes:
    """Frames (each (h, w, 3) uint8 RGB) -> a complete .avi file."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, _ = frames[0].shape
    if codec == "rawdib":
        ckid, handler, compression = b"00db", b"DIB ", 0
        payloads = [_dib_encode(f) for f in frames]
    elif codec == "mjpeg":
        ckid, handler, compression = b"00dc", b"MJPG", 0x47504A4D  # 'MJPG'
        payloads = [jpegcodec.encode_jpeg(f, quality=quality) for f in frames]
    else:
        raise NotImplementedError(f"no encoder for video codec {codec!r}")

    maxbuf = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        maxbuf,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<10I4h",
            0, 0, 0,  # flags, prio+lang, initial frames
            1, fps,  # dwScale / dwRate -> fps
            0, len(frames),  # start, length
            maxbuf, 0xFFFFFFFF, 0,  # bufsize, quality, samplesize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,  # biSize, dims, planes, bpp
        compression,
        len(payloads[0]),
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx = b""
    for p in payloads:
        # idx1 offset convention: from the start of the 'movi' fourcc
        idx += ckid + struct.pack("<III", 0x10, len(movi_body), len(p))
        movi_body += _chunk(ckid, p)
    movi = _chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """Header + chunk-index scan — never reads frame payloads.

    Returns {w, h, fps, n_frames, codec, chunks: [(payload_off, size)]}.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    w = h = fps = 0
    codec = None
    n_declared = 0
    chunks: list[tuple[int, int]] = []
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if fourcc == b"LIST":
            ltype = data[pos + 8 : pos + 12]
            if ltype == b"hdrl":
                hpos, hend = pos + 12, pos + 8 + size
                while hpos + 8 <= hend:
                    f2 = data[hpos : hpos + 4]
                    s2 = struct.unpack("<I", data[hpos + 4 : hpos + 8])[0]
                    if f2 == b"avih":
                        a = struct.unpack("<14I", data[hpos + 8 : hpos + 64])
                        n_declared, w, h = a[4], a[8], a[9]
                        fps = 1_000_000 // a[0] if a[0] else 0
                    elif f2 == b"LIST" and data[hpos + 8 : hpos + 12] == b"strl":
                        # strl -> first child is strh; its payload starts
                        # with fccType ('vids') then fccHandler
                        handler = data[hpos + 24 : hpos + 28]
                        codec = {b"DIB ": "rawdib", b"MJPG": "mjpeg"}.get(
                            handler
                        )
                        hpos += 12 + s2 + (s2 & 1)
                        continue
                    hpos += 8 + s2 + (s2 & 1)
            elif ltype == b"movi":
                mpos, mend = pos + 12, pos + 8 + size
                while mpos + 8 <= mend:
                    cid = data[mpos : mpos + 4]
                    csz = struct.unpack("<I", data[mpos + 4 : mpos + 8])[0]
                    if cid in (b"00db", b"00dc"):
                        chunks.append((mpos + 8, csz))
                    mpos += 8 + csz + (csz & 1)
        pos += 8 + size + (size & 1)
    if codec is None:
        raise ValueError("no supported video stream (DIB /MJPG) found")
    if n_declared and n_declared != len(chunks):
        raise ValueError(
            f"frame count mismatch: header {n_declared}, movi {len(chunks)}"
        )
    return {
        "w": w,
        "h": h,
        "fps": fps,
        "n_frames": len(chunks),
        "codec": codec,
        "chunks": chunks,
    }


def decode_frame(data: bytes, meta: dict, k: int) -> np.ndarray:
    """Decode frame k only — O(frame), not O(file)."""
    off, size = meta["chunks"][k]
    payload = data[off : off + size]
    if meta["codec"] == "rawdib":
        return _dib_decode(payload, meta["w"], meta["h"])
    return jpegcodec.decode_jpeg(payload)
