"""Driver-side reader for ONE integer column of a SMALL parquet file.

Why: broadcast spatial operators build their dimension indexes from
tiny dimension tables (e.g. the 25-row `nation` grid). Collecting those
25 ints through a Spark job costs a fixed ~0.2 s of scheduling per
operator call — pure overhead at bench scale and at 100 TB alike (the
dimension stays driver-sized either way; guide §1.2). This module reads
the same bytes from the same parquet input directly on the driver: no
job, no extra pass, same values.

Scope (everything else returns None so callers fall back to a normal
Spark collect): single .parquet FILE under `max_bytes`, INT32/INT64
non-nested column, PLAIN / PLAIN_DICTIONARY / RLE_DICTIONARY data
pages (v1 or v2), SNAPPY or UNCOMPRESSED codecs, nulls allowed.
From-scratch thrift-compact / snappy / RLE-bit-packed decoders in the
same spirit as the repo's other codecs; validated against independent
readers over every testdata file in tests/test_tinyparquet.py.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# ---------------------------------------------------------------- thrift

_STOP = 0


def _uvarint(buf, p):
    out = 0
    shift = 0
    while True:
        b = buf[p]
        p += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, p
        shift += 7


def _zigzag(buf, p):
    u, p = _uvarint(buf, p)
    return (u >> 1) ^ -(u & 1), p


def _skip(buf, p, ftype):
    if ftype in (1, 2):
        return p
    if ftype == 3:
        return p + 1
    if ftype in (4, 5, 6):
        return _uvarint(buf, p)[1]
    if ftype == 7:
        return p + 8
    if ftype == 8:
        ln, p = _uvarint(buf, p)
        return p + ln
    if ftype in (9, 10):
        head = buf[p]
        p += 1
        size, etype = head >> 4, head & 0x0F
        if size == 0xF:
            size, p = _uvarint(buf, p)
        for _ in range(size):
            p = _skip(buf, p, etype)
        return p
    if ftype == 11:
        size, p = _uvarint(buf, p)
        if size:
            kv = buf[p]
            p += 1
            for _ in range(size):
                p = _skip(buf, p, kv >> 4)
                p = _skip(buf, p, kv & 0x0F)
        return p
    if ftype == 12:
        fid = 0
        while True:
            h = buf[p]
            p += 1
            if h == _STOP:
                return p
            delta, t = h >> 4, h & 0x0F
            if delta:
                fid += delta
            else:
                fid, p = _zigzag(buf, p)
            p = _skip(buf, p, t)
    raise ValueError(f"thrift type {ftype}")


def _fields(buf, p):
    """Yield (field_id, wire_type, value_start) for one compact struct;
    the caller reads wanted fields and must _skip the rest itself via
    the returned positions. Returns via generator; final StopIteration
    value is the position after the struct's STOP byte."""
    fid = 0
    while True:
        h = buf[p]
        p += 1
        if h == _STOP:
            return p
        delta, t = h >> 4, h & 0x0F
        if delta:
            fid += delta
        else:
            fid, p = _zigzag(buf, p)
        yield fid, t, p
        p = _skip(buf, p, t)


def _struct_fields(buf, p):
    """(dict of {field_id: (wire_type, start)}, pos_after_struct)."""
    out = {}
    gen = _fields(buf, p)
    while True:
        try:
            fid, t, vp = next(gen)
        except StopIteration as s:
            return out, s.value
        out[fid] = (t, vp)


def _read_i(buf, p):
    return _zigzag(buf, p)[0]


def _read_binary(buf, p):
    ln, p = _uvarint(buf, p)
    return buf[p : p + ln]


def _read_list(buf, p):
    """(elem_type, count, pos_of_first_elem)."""
    head = buf[p]
    p += 1
    size, etype = head >> 4, head & 0x0F
    if size == 0xF:
        size, p = _uvarint(buf, p)
    return etype, size, p


# ---------------------------------------------------------------- snappy


def snappy_decompress(data: bytes) -> bytes:
    """RFC-less but stable snappy raw-format decode (decode-only)."""
    n, p = _uvarint(data, 0)
    out = bytearray()
    ln_data = len(data)
    while p < ln_data:
        tag = data[p]
        p += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(data[p : p + nb], "little")
                p += nb
            ln += 1
            out += data[p : p + ln]
            p += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[p]
            p += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[p : p + 2], "little")
            p += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[p : p + 4], "little")
            p += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: bad copy offset")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-by-byte semantics
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError("snappy: length mismatch")
    return bytes(out)


# --------------------------------------------------- RLE / bit-packed


def rle_bp_decode(buf: bytes, p: int, bit_width: int, n: int) -> np.ndarray:
    """Parquet RLE/bit-packed hybrid: n values of bit_width bits."""
    out = np.empty(n, np.int64)
    got = 0
    if bit_width == 0:
        out[:] = 0
        return out
    byte_w = (bit_width + 7) // 8
    while got < n:
        header, p = _uvarint(buf, p)
        if header & 1:  # bit-packed: (header>>1) groups of 8 values
            count = (header >> 1) * 8
            nbytes = count * bit_width // 8
            bits = np.unpackbits(
                np.frombuffer(buf[p : p + nbytes], np.uint8),
                bitorder="little",
            ).reshape(-1, bit_width)
            vals = bits @ (1 << np.arange(bit_width, dtype=np.int64))
            p += nbytes
            take = min(count, n - got)
            out[got : got + take] = vals[:take]
            got += take
        else:  # RLE run
            count = header >> 1
            v = int.from_bytes(buf[p : p + byte_w], "little")
            p += byte_w
            take = min(count, n - got)
            out[got : got + take] = v
            got += take
    return out


# ---------------------------------------------------------------- reader

_TYPE_I32, _TYPE_I64 = 1, 2
_CODEC_OK = {0: "uncompressed", 1: "snappy"}
_ENC_PLAIN, _ENC_PLAIN_DICT, _ENC_RLE_DICT = 0, 2, 8


def _decompress(codec: int, data: bytes, uncompressed_size: int) -> bytes:
    if codec == 0:
        return data
    if codec == 1:
        out = snappy_decompress(data)
        if len(out) != uncompressed_size:
            raise ValueError("page size mismatch")
        return out
    raise ValueError(f"codec {codec} unsupported")


def _parse_page_header(buf, p):
    """PageHeader -> (dict, pos_after). Fields: 1 type, 2 uncompressed
    size, 3 compressed size, 5 data_page_header, 7 dictionary_page_header,
    8 data_page_header_v2."""
    fl, after = _struct_fields(buf, p)
    out = {
        "type": _read_i(buf, fl[1][1]),
        "usize": _read_i(buf, fl[2][1]),
        "csize": _read_i(buf, fl[3][1]),
    }
    for key, fid in (("dph", 5), ("dict", 7), ("dph2", 8)):
        if fid in fl and fl[fid][0] == 12:
            sub, _ = _struct_fields(buf, fl[fid][1])
            out[key] = {k: v for k, v in sub.items()}
    return out, after


def read_int_column(
    path: str, column: str, max_bytes: int = 4 * 1024 * 1024
):
    """All values of ``column`` (list of int/None, row-group order), or
    None when the file/column is outside this reader's scope."""
    try:
        return _read_int_column(path, column, max_bytes)
    except Exception:
        return None


def _read_int_column(path: str, column: str, max_bytes: int):
    if not os.path.isfile(path) or os.path.getsize(path) > max_bytes:
        return None
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        return None
    mlen = int.from_bytes(data[-8:-4], "little")
    meta = data[-8 - mlen : -8]

    # ---- FileMetaData: schema (f2), row_groups (f4)
    fmd, _ = _struct_fields(meta, 0)
    if 2 not in fmd or fmd[2][0] != 9:
        return None
    etype, nschema, p = _read_list(meta, fmd[2][1])
    col_type = None
    col_max_def = None
    # first element is the root; children follow depth-first. Non-nested
    # file: every child of root is a leaf at def depth = (optional ? 1:0)
    depth_stack: list[int] = []
    ndef = 0
    root_seen = False
    for _ in range(nschema):
        se, p = _struct_fields(meta, p)
        name = _read_binary(meta, se[4][1]).decode() if 4 in se else ""
        num_children = _read_i(meta, se[5][1]) if 5 in se else 0
        rep = _read_i(meta, se[3][1]) if 3 in se else 0
        if not root_seen:
            root_seen = True
            continue
        if num_children:  # nested schema: out of scope
            return None
        if name == column:
            if 1 not in se or rep == 2:  # typeless or REPEATED: no
                return None
            col_type = _read_i(meta, se[1][1])
            col_max_def = 1 if rep == 1 else 0  # OPTIONAL -> 1 def level
    if col_type not in (_TYPE_I32, _TYPE_I64):
        return None
    width = 4 if col_type == _TYPE_I32 else 8
    fmt = "<i4" if col_type == _TYPE_I32 else "<i8"

    if 4 not in fmd or fmd[4][0] != 9:
        return None
    _, nrg, p = _read_list(meta, fmd[4][1])
    out: list = []
    for _ in range(nrg):
        rg, p = _struct_fields(meta, p)
        # RowGroup f1: columns list<ColumnChunk>
        etype, ncc, cp = _read_list(meta, rg[1][1])
        for _ in range(ncc):
            cc, cp = _struct_fields(meta, cp)
            if 3 not in cc or cc[3][0] != 12:
                continue
            cmd, _ = _struct_fields(meta, cc[3][1])
            # ColumnMetaData: f3 path_in_schema, f4 codec, f5 num_values,
            # f9 data_page_offset, f11 dictionary_page_offset
            _, npath, pp = _read_list(meta, cmd[3][1])
            parts = []
            for _ in range(npath):
                parts.append(_read_binary(meta, pp)[:])
                pp = _skip(meta, pp, 8)
            if len(parts) != 1 or parts[0].decode() != column:
                continue
            codec = _read_i(meta, cmd[4][1])
            if codec not in _CODEC_OK:
                return None
            num_values = _read_i(meta, cmd[5][1])
            start = _read_i(meta, cmd[9][1])
            if 11 in cmd:
                start = min(start, _read_i(meta, cmd[11][1]))
            out.extend(
                _read_chunk(
                    data, start, codec, num_values, width, fmt, col_max_def
                )
            )
    return out


def _read_chunk(data, pos, codec, num_values, width, fmt, max_def):
    dictionary = None
    out: list = []
    while len(out) < num_values:
        ph, body = _parse_page_header(data, pos)
        raw = data[body : body + ph["csize"]]
        pos = body + ph["csize"]
        if ph["type"] == 2:  # dictionary page
            page = _decompress(codec, raw, ph["usize"])
            dictionary = np.frombuffer(page, fmt)
            continue
        if ph["type"] == 0:  # data page v1
            dph = ph["dph"]
            nv = _read_i(data, dph[1][1])
            enc = _read_i(data, dph[2][1])
            page = _decompress(codec, raw, ph["usize"])
            p = 0
            defs = None
            if max_def:
                ln = int.from_bytes(page[p : p + 4], "little")
                defs = rle_bp_decode(page, p + 4, 1, nv)
                p += 4 + ln
            out.extend(_page_values(page, p, enc, nv, defs, dictionary, fmt))
            continue
        if ph["type"] == 3:  # data page v2: levels stored uncompressed
            dph = ph["dph2"]
            nv = _read_i(data, dph[1][1])
            nnull = _read_i(data, dph[2][1])
            enc = _read_i(data, dph[4][1])
            dlen = _read_i(data, dph[5][1])
            rlen = _read_i(data, dph[6][1])
            defs = (
                rle_bp_decode(raw, rlen, 1, nv) if max_def and dlen else None
            )
            vals_raw = raw[rlen + dlen :]
            # f7 is_compressed: bool value lives in the wire-type nibble
            v2_compressed = dph[7][0] == 1 if 7 in dph else True
            page = (
                _decompress(codec, vals_raw, ph["usize"] - rlen - dlen)
                if v2_compressed
                else vals_raw
            )
            out.extend(_page_values(page, 0, enc, nv, defs, dictionary, fmt))
            continue
        raise ValueError(f"page type {ph['type']}")
    return out[:num_values]


def _page_values(page, p, enc, nv, defs, dictionary, fmt):
    n_present = int(defs.sum()) if defs is not None else nv
    if enc == _ENC_PLAIN:
        vals = np.frombuffer(
            page, fmt, count=n_present, offset=p
        ).astype(np.int64)
    elif enc in (_ENC_PLAIN_DICT, _ENC_RLE_DICT):
        if dictionary is None:
            raise ValueError("dictionary page missing")
        bw = page[p]
        idx = rle_bp_decode(page, p + 1, bw, n_present)
        vals = dictionary[idx].astype(np.int64)
    else:
        raise ValueError(f"encoding {enc}")
    if defs is None:
        return [int(v) for v in vals]
    out: list = []
    vi = 0
    for d in defs:
        if d:
            out.append(int(vals[vi]))
            vi += 1
        else:
            out.append(None)
    return out
