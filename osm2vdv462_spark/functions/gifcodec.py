"""From-scratch GIF89a codec (palette-indexed, single frame): variable-
width LZW with clear-code dictionary resets, LSB-first bit packing,
255-byte sub-block framing. Pure Python/numpy — no imaging libraries
(sandbox rule), same boundary discipline as pngcodec/jpegcodec: every
feature the *writer* emits decodes bit-exactly; features we never emit
(interlace, animation frames beyond the first) raise loudly instead of
silently corrupting.

Widens the multimodal axis to the third major still-image container
(PNG lossless filter+deflate, JPEG lossy DCT, GIF palette+LZW) — the
reference's raster handling is external (osm2pgsql/PostGIS); this codec
exists for the LLM-corpus image path, not a reference file.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# --------------------------------------------------------------- encoder


class _BitPacker:
    """LSB-first bit stream -> GIF data sub-blocks (<=255 bytes each)."""

    def __init__(self):
        self.buf = 0
        self.nbits = 0
        self.bytes = bytearray()

    def put(self, code: int, width: int):
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.buf & 0xFF)
        out = bytearray()
        data = bytes(self.bytes)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
        return bytes(out)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF variable-width LZW over a flat uint8 index array. Emits a
    clear code up front and whenever the dictionary fills (the decoder
    mirrors both); code width grows when the next free code would not
    fit the current width."""
    clear = 1 << mcs
    end = clear + 1
    packer = _BitPacker()
    width = mcs + 1
    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = end + 1
    packer.put(clear, width)
    w = b""
    for k in indices.tobytes():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        packer.put(table[w], width)
        if next_code < _TABLE_LIMIT:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            # dictionary full: reset both sides
            packer.put(clear, width)
            table = {bytes([c]): c for c in range(clear)}
            next_code = end + 1
            width = mcs + 1
        w = bytes([k])
    if w:
        packer.put(table[w], width)
    packer.put(end, width)
    return packer.finish()


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Single-frame GIF89a from (h, w) uint8 palette indices and an
    (n, 3) uint8 palette. The global color table is padded to the next
    power of two (>= 2)."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = len(palette)
    if n < 1 or n > 256:
        raise ValueError(f"palette size {n} out of range 1..256")
    if indices.max(initial=0) >= n:
        raise ValueError("index out of palette range")
    bits = max(1, int(n - 1).bit_length())  # GCT size = 2^bits
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, color resolution 8
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | (bits - 1), 0, 0)
    out += gct.tobytes()
    # image descriptor: full frame, no local table, not interlaced
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    mcs = max(2, bits)  # LZW minimum code size (spec floor of 2)
    out.append(mcs)
    out += _lzw_encode(indices.ravel(), mcs)
    out.append(0x3B)  # trailer
    return bytes(out)


# --------------------------------------------------------------- decoder


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> np.ndarray:
    clear = 1 << mcs
    end = clear + 1

    def fresh():
        return [bytes([c]) for c in range(clear)] + [b"", b""]

    table = fresh()
    width = mcs + 1
    out = bytearray()
    buf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated (no end code)")
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = fresh()
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        if prev is not None and len(table) < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the frame")
    if len(out) != n_expected:
        raise ValueError(
            f"LZW pixel count {len(out)} != frame size {n_expected}"
        )
    return np.frombuffer(bytes(out), dtype=np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a -> (h, w, 3) uint8 RGB. Supports
    global and local color tables and skips extension blocks; interlace
    and truncated streams raise."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    sw, sh, packed, _bg, _par = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * size], dtype=np.uint8)
        gct = gct.reshape(size, 3)
        pos += 3 * size
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: skip label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        pal = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                data[pos : pos + 3 * size], dtype=np.uint8
            ).reshape(size, 3)
            pos += 3 * size
        if pal is None:
            raise ValueError("GIF frame has no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        idx = _lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    raise ValueError("GIF truncated before image data")
