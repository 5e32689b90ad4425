"""Real `.osm.pbf` scan — the reference's actual input format
(ref pipeline/stop_places/lua/main.lua:12-35 runs osm2pgsql over
example_data/*.osm.pbf; this replaces that ingest stage Spark-first).

From-scratch decoder of the PUBLIC OSM PBF format (protobuf wire
encoding + zlib — no protobuf library needed):

* file = repeated [4-byte BE length][BlobHeader][Blob];
* Blob payload (raw or zlib) = PrimitiveBlock with a string table and
  primitive groups (DenseNodes / Way / Relation);
* DenseNodes ids/lats/lons are zigzag DELTA-coded packed varints,
  tags a 0-separated key/value string-table index stream.

Packed varint streams decode VECTORIZED: one numpy pass finds the
continuation-bit boundaries, a <=10-step loop (max varint bytes)
assembles all values at once — no per-varint Python.

Distribution model: Blobs are the format's independent split unit
(each carries its own string table), so the scan parallelizes as
driver-side header walk (offsets only, no payload reads) ->
``spark.createDataFrame(descriptors)`` -> ``mapInPandas`` in which
each task seeks into its blob ranges and decodes. On a cluster the
same decoder body runs against HDFS/S3 ranged reads; the descriptor
walk is O(#blobs) metadata.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import lz4codec

# --------------------------------------------------------- wire format


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over one protobuf message.
    wire 0 -> int, wire 2 -> bytes slice, wire 1/5 -> raw bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
            yield fno, wt, v
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == 1:
            yield fno, wt, buf[i : i + 8]
            i += 8
        elif wt == 5:
            yield fno, wt, buf[i : i + 4]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wt}")


def decode_packed_varints(buf: bytes) -> np.ndarray:
    """All varints in a packed field, vectorized (uint64 accumulate)."""
    if not buf:
        return np.empty(0, np.int64)
    b = np.frombuffer(buf, np.uint8)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(len(starts), np.uint64)
    max_len = int((ends - starts).max()) + 1
    for k in range(max_len):
        idx = starts + k
        live = idx <= ends
        out[live] |= (b[idx[live]] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * k
        )
    return out.view(np.int64)


def _unzigzag(v: np.ndarray) -> np.ndarray:
    u = v.view(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(v & 1)


# ------------------------------------------------------- blob scanning


def scan_blob_descriptors(path: str) -> list[tuple[int, int, str]]:
    """[(payload_offset, payload_size, blob_type)] via a header-only
    walk (seeks; never reads blob payloads)."""
    out = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        while f.tell() < size:
            hdr_len = struct.unpack(">I", f.read(4))[0]
            hdr = f.read(hdr_len)
            btype, dsize = "", 0
            for fno, wt, v in _fields(hdr):
                if fno == 1 and wt == 2:
                    btype = v.decode()
                elif fno == 3 and wt == 0:
                    dsize = v
            out.append((f.tell(), dsize, btype))
            f.seek(dsize, 1)
    return out


def _blob_payload(raw: bytes) -> bytes:
    """Blob -> uncompressed PrimitiveBlock bytes. Readable codecs:
    raw (field 1), zlib (3), lzma (4, stdlib), bzip2 (5, stdlib) and
    lz4 block (6, from-scratch functions/lz4codec.py). Only zstd (7)
    remains a raised boundary (no zstd lib in-sandbox and the format
    is not reimplementable in budget) — raising beats silently
    yielding zero elements."""
    data = None
    for fno, wt, v in _fields(raw):
        if fno == 1 and wt == 2:
            data = v
        elif fno == 3 and wt == 2:
            data = zlib.decompress(v)
        elif fno == 4 and wt == 2:
            import lzma

            data = lzma.decompress(v)
        elif fno == 5 and wt == 2:
            import bz2

            data = bz2.decompress(v)
        elif fno == 6 and wt == 2:
            data = lz4codec.lz4_block_decompress(v)
        elif fno == 7 and wt == 2:
            raise ValueError(
                "unsupported PBF Blob compression 'zstd' (field 7);"
                " raw/zlib/lzma/bzip2/lz4 blobs are readable here."
                " Workaround: recompress the extract once with"
                " `osmium cat in.osm.pbf -o out.osm.pbf -f"
                " pbf,pbf_compression=zlib` (see README 'Input"
                " formats')"
            )
    if data is None:
        raise ValueError("PBF Blob carries no recognized payload")
    return data


# --------------------------------------------------- block -> elements


def _decode_primitive_block(block: bytes) -> list[tuple]:
    """One PrimitiveBlock -> element tuples
    (element_type, osm_id, lon, lat, tags, refs, member_types,
    member_refs, member_roles)."""
    strings: list[str] = []
    groups: list[bytes] = []
    granularity, lat_off, lon_off = 100, 0, 0
    for fno, wt, v in _fields(block):
        if fno == 1 and wt == 2:  # StringTable
            strings = [
                s.decode("utf-8", "replace")
                for f2, w2, s in _fields(v)
                if f2 == 1
            ]
        elif fno == 2 and wt == 2:
            groups.append(v)
        elif fno == 17 and wt == 0:
            granularity = v
        elif fno == 19 and wt == 0:
            lat_off = v
        elif fno == 20 and wt == 0:
            lon_off = v

    rows: list[tuple] = []

    def coord(off, raw):
        return 1e-9 * (off + granularity * raw)

    for g in groups:
        for fno, wt, v in _fields(g):
            if fno == 1 and wt == 2:  # plain (non-dense) Node
                nid, keys, vals, nlat, nlon = 0, (), (), 0, 0
                for f2, w2, p in _fields(v):
                    if f2 == 1:
                        nid = _unzigzag(np.array([p], np.int64))[0]
                    elif f2 == 2:
                        keys = decode_packed_varints(p)
                    elif f2 == 3:
                        vals = decode_packed_varints(p)
                    elif f2 == 8:
                        nlat = _unzigzag(np.array([p], np.int64))[0]
                    elif f2 == 9:
                        nlon = _unzigzag(np.array([p], np.int64))[0]
                tags = {
                    strings[k]: strings[x] for k, x in zip(keys, vals)
                } or None
                rows.append(
                    ("node", int(nid), coord(lon_off, int(nlon)),
                     coord(lat_off, int(nlat)), tags, None, None, None, None)
                )
            elif fno == 2 and wt == 2:  # DenseNodes
                ids = lats = lons = None
                kv = np.empty(0, np.int64)
                for f2, w2, p in _fields(v):
                    if f2 == 1:
                        ids = np.cumsum(_unzigzag(decode_packed_varints(p)))
                    elif f2 == 8:
                        lats = np.cumsum(_unzigzag(decode_packed_varints(p)))
                    elif f2 == 9:
                        lons = np.cumsum(_unzigzag(decode_packed_varints(p)))
                    elif f2 == 10:
                        kv = decode_packed_varints(p)
                if ids is None:
                    continue
                # 0-separated (k,v) string-index runs, one run per node
                tag_runs: list[dict] = []
                if len(kv):
                    run: dict = {}
                    i = 0
                    while i < len(kv):
                        if kv[i] == 0:
                            tag_runs.append(run)
                            run = {}
                            i += 1
                        else:
                            run[strings[kv[i]]] = strings[kv[i + 1]]
                            i += 2
                for j in range(len(ids)):
                    tags = (
                        tag_runs[j] if j < len(tag_runs) and tag_runs[j] else None
                    )
                    rows.append(
                        (
                            "node",
                            int(ids[j]),
                            coord(lon_off, int(lons[j])),
                            coord(lat_off, int(lats[j])),
                            tags,
                            None,
                            None,
                            None,
                            None,
                        )
                    )
            elif fno == 3 and wt == 2:  # Way
                wid, keys, vals, refs = 0, (), (), np.empty(0, np.int64)
                for f2, w2, p in _fields(v):
                    if f2 == 1:
                        wid = p
                    elif f2 == 2:
                        keys = decode_packed_varints(p)
                    elif f2 == 3:
                        vals = decode_packed_varints(p)
                    elif f2 == 8:
                        refs = np.cumsum(_unzigzag(decode_packed_varints(p)))
                tags = {
                    strings[k]: strings[x] for k, x in zip(keys, vals)
                } or None
                rows.append(
                    ("way", int(wid), None, None, tags,
                     [int(r) for r in refs], None, None, None)
                )
            elif fno == 4 and wt == 2:  # Relation
                rid, keys, vals = 0, (), ()
                roles = types = np.empty(0, np.int64)
                memids = np.empty(0, np.int64)
                for f2, w2, p in _fields(v):
                    if f2 == 1:
                        rid = p
                    elif f2 == 2:
                        keys = decode_packed_varints(p)
                    elif f2 == 3:
                        vals = decode_packed_varints(p)
                    elif f2 == 8:
                        roles = decode_packed_varints(p)
                    elif f2 == 9:
                        memids = np.cumsum(_unzigzag(decode_packed_varints(p)))
                    elif f2 == 10:
                        types = decode_packed_varints(p)
                tags = {
                    strings[k]: strings[x] for k, x in zip(keys, vals)
                } or None
                tname = ("node", "way", "relation")
                rows.append(
                    (
                        "relation",
                        int(rid),
                        None,
                        None,
                        tags,
                        None,
                        [tname[int(t)] for t in types],
                        [int(m) for m in memids],
                        [strings[int(r)] for r in roles],
                    )
                )
    return rows


PBF_SCHEMA = (
    "element_type string, osm_id long, lon double, lat double,"
    " tags map<string,string>, refs array<long>,"
    " member_types array<string>, member_refs array<long>,"
    " member_roles array<string>"
)

_COLS = [
    "element_type", "osm_id", "lon", "lat", "tags", "refs",
    "member_types", "member_refs", "member_roles",
]


def read_pbf(
    spark: SparkSession,
    path: str | list[str],
    partitions: int | None = None,
) -> DataFrame:
    """Distributed scan of .osm.pbf input: blob descriptors (driver
    metadata walk) -> one task per blob batch decoding its byte
    ranges. ``path`` may be one file, a glob, a directory (e.g. a
    sharded write_pbf output), or a list (planet-scale OSM data ships
    sharded; blobs from all files pool into one descriptor list, so
    task balancing is file-agnostic)."""
    import glob as _glob

    if isinstance(path, str):
        if os.path.isdir(path):
            paths = sorted(_glob.glob(os.path.join(path, "*.pbf")))
        elif _glob.has_magic(path):
            paths = sorted(_glob.glob(path))
        else:
            paths = [path]
    else:
        paths = list(path)
    if not paths:
        raise FileNotFoundError(f"no .pbf input matches {path!r}")
    descs = [
        (os.path.abspath(p), off, size)
        for p in paths
        for off, size, btype in scan_blob_descriptors(os.path.abspath(p))
        if btype == "OSMData"
    ]
    if partitions is None:
        partitions = min(len(descs), 32) or 1
    desc_df = spark.createDataFrame(
        descs, "path string, off long, size long"
    ).repartition(partitions)

    def _decode(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                with open(r.path, "rb") as f:
                    f.seek(r.off)
                    raw = f.read(r.size)
                rows.extend(_decode_primitive_block(_blob_payload(raw)))
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)

    return desc_df.mapInPandas(_decode, PBF_SCHEMA)


def elements_for_dispatch(pbf_df: DataFrame) -> DataFrame:
    """Bridge the raw scan to the ingest dispatch's expected shape
    (pipeline/extract.py::dispatch): osm_type N/W/R, ``is_closed`` for
    ways (first ref == last ref), empty-map tags fallback."""
    from pyspark.sql import functions as F

    t = (
        F.when(F.col("element_type") == "node", "N")
        .when(F.col("element_type") == "way", "W")
        .otherwise("R")
    )
    closed = (
        F.col("element_type") == "way"
    ) & (F.size("refs") > 1) & (
        F.element_at("refs", 1) == F.element_at("refs", -1)
    )
    return pbf_df.select(
        "osm_id",
        t.alias("osm_type"),
        closed.alias("is_closed"),
        F.coalesce(
            F.col("tags"), F.create_map().cast("map<string,string>")
        ).alias("tags"),
    )


# ----------------------------------------------------------------- sink
#
# The encoder mirrors the decoder's vectorization: packed varint
# streams are emitted by a <=10-step numpy scatter (exact inverse of
# decode_packed_varints), zigzag/delta are whole-array ops, and the
# per-partition work ships compressed Blobs — never raw elements — to
# the sink. Two write shapes:
#   * sharded (the at-scale path): each task writes its own
#     part-NNNNN.osm.pbf executor-side; nothing flows to the driver
#     but per-part counts. read_pbf accepts the output directory.
#   * single-file: framed blobs stream through toLocalIterator() one
#     partition at a time (bounded driver memory), concatenated in
#     range-partition order.
# Blocks respect the PBF spec's limits: <=8000 elements and <=16 MiB
# uncompressed per Blob (chunked inside each partition), and the
# OSMHeader declares the required DenseNodes feature.


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_field(fno: int, wire: int, payload) -> bytes:
    key = _enc_varint((fno << 3) | wire)
    if wire == 0:
        return key + _enc_varint(payload)
    return key + _enc_varint(len(payload)) + payload


def encode_packed_varints(vals: np.ndarray) -> bytes:
    """Vectorized inverse of decode_packed_varints: uint64 array ->
    packed varint bytes via per-byte-position numpy scatter. Pass
    count is bounded by the largest value's byte length (not a fixed
    10); arrays too small to amortize numpy setup take a plain loop —
    per-way ref lists are ~10 values, the dense-node streams are
    thousands."""
    u = np.ascontiguousarray(vals, np.uint64)
    if not len(u):
        return b""
    if len(u) < 64:
        out = bytearray()
        for n in u.tolist():
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    max_bytes = max(1, (int(u.max()).bit_length() + 6) // 7)
    nb = np.ones(len(u), np.int64)
    for k in range(1, max_bytes):
        nb += (u >> np.uint64(7 * k)) != 0
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), np.uint8)
    starts = ends - nb
    for k in range(max_bytes):
        live = nb > k
        pos = starts[live] + k
        byte = ((u[live] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[live] > k + 1).astype(np.uint8) << np.uint8(7)
        out[pos] = byte | cont
    return out.tobytes()


def _zigzag(v: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (inverse of _unzigzag)."""
    s = np.asarray(v, np.int64)
    return (s.view(np.uint64) << np.uint64(1)) ^ (s >> np.int64(63)).view(
        np.uint64
    )


def _delta_zigzag(v) -> bytes:
    if len(v) < 64:  # per-way ref lists: skip numpy setup entirely
        out = bytearray()
        prev = 0
        for x in (v.tolist() if isinstance(v, np.ndarray) else v):
            d = int(x) - prev
            prev = int(x)
            n = (d << 1) ^ (d >> 63) if d < 0 else d << 1
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    a = np.asarray(v, np.int64)
    return encode_packed_varints(_zigzag(np.diff(a, prepend=np.int64(0))))


def _packed_ids(vals) -> bytes:
    vals = list(vals)
    if len(vals) < 64:
        out = bytearray()
        for n in vals:
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    return encode_packed_varints(np.asarray(vals, np.uint64))


def _encode_primitive_block(rows: list[tuple]) -> bytes:
    """Element tuples (reader layout) -> one PrimitiveBlock with its own
    string table; nodes emit as DenseNodes (zigzag deltas), ways and
    relations with packed key/val/ref/member streams. All packed
    streams go through the vectorized varint encoder."""
    strings: dict[str, int] = {"": 0}

    def sid(s: str) -> int:
        if s not in strings:
            strings[s] = len(strings)
        return strings[s]

    nodes = [r for r in rows if r[0] == "node"]
    parts: list[bytes] = []
    if nodes:
        ids = np.fromiter((r[1] for r in nodes), np.int64, len(nodes))
        # granularity 100, 1e-9 base -> raw unit 1e-7 degrees
        lats = np.fromiter(
            (round(r[3] * 1e7) for r in nodes), np.int64, len(nodes)
        )
        lons = np.fromiter(
            (round(r[2] * 1e7) for r in nodes), np.int64, len(nodes)
        )
        kv: list[int] = []
        for r in nodes:
            for k, v in (r[4] or {}).items():
                kv.append(sid(k))
                kv.append(sid(v))
            kv.append(0)
        dense = (
            _enc_field(1, 2, _delta_zigzag(ids))
            + _enc_field(8, 2, _delta_zigzag(lats))
            + _enc_field(9, 2, _delta_zigzag(lons))
            + _enc_field(10, 2, _packed_ids(kv))
        )
        parts.append(_enc_field(2, 2, _enc_field(2, 2, dense)))
    tmap = {"node": 0, "way": 1, "relation": 2}
    for r in rows:
        if r[0] == "way":
            way = (
                _enc_field(1, 0, r[1])
                + _enc_field(2, 2, _packed_ids(sid(k) for k in (r[4] or {})))
                + _enc_field(
                    3, 2, _packed_ids(sid(v) for v in (r[4] or {}).values())
                )
                + _enc_field(8, 2, _delta_zigzag(r[5] or []))
            )
            parts.append(_enc_field(2, 2, _enc_field(3, 2, way)))
        elif r[0] == "relation":
            rel = (
                _enc_field(1, 0, r[1])
                + _enc_field(2, 2, _packed_ids(sid(k) for k in (r[4] or {})))
                + _enc_field(
                    3, 2, _packed_ids(sid(v) for v in (r[4] or {}).values())
                )
                + _enc_field(8, 2, _packed_ids(sid(x) for x in (r[8] or [])))
                + _enc_field(9, 2, _delta_zigzag(r[7] or []))
                + _enc_field(10, 2, _packed_ids(tmap[x] for x in (r[6] or [])))
            )
            parts.append(_enc_field(2, 2, _enc_field(4, 2, rel)))
    st = b"".join(
        _enc_field(1, 2, s.encode())
        for s in sorted(strings, key=strings.get)
    )
    return _enc_field(1, 2, st) + b"".join(parts)


# PBF spec: recommended <=8000 entities per block; a Blob MUST be
# <16 MiB compressed / <32 MiB uncompressed. Chunk well under both.
_MAX_BLOCK_ELEMENTS = 8000
_MAX_BLOCK_BYTES = 8 << 20  # estimated uncompressed payload per block


def _header_bytes() -> bytes:
    """Framed OSMHeader blob declaring the features the file uses
    (required_features must include DenseNodes — we emit them)."""
    header = (
        _enc_field(4, 2, b"OsmSchema-V0.6")
        + _enc_field(4, 2, b"DenseNodes")
        + _enc_field(16, 2, b"osm2vdv462_spark")
    )
    hdr_blob = _enc_field(1, 2, header)
    bh = _enc_field(1, 2, b"OSMHeader") + _enc_field(3, 0, len(hdr_blob))
    return struct.pack(">I", len(bh)) + bh + hdr_blob


def _frame_blob(block: bytes, codec: str = "zlib") -> bytes:
    if codec == "zlib":
        payload = _enc_field(3, 2, zlib.compress(block))
    elif codec == "lz4":
        payload = _enc_field(6, 2, lz4codec.lz4_block_compress(block))
    elif codec == "raw":
        payload = _enc_field(1, 2, block)
    else:
        raise NotImplementedError(f"no PBF blob encoder for {codec!r}")
    blob = _enc_field(2, 0, len(block)) + payload
    bh = _enc_field(1, 2, b"OSMData") + _enc_field(3, 0, len(blob))
    return struct.pack(">I", len(bh)) + bh + blob


def _rows_from_pandas(pdf: pd.DataFrame) -> list[tuple]:
    return [
        (
            r.element_type,
            int(r.osm_id),
            r.lon,
            r.lat,
            dict(r.tags) if r.tags is not None else None,
            list(r.refs) if r.refs is not None else None,
            list(r.member_types) if r.member_types is not None else None,
            [int(x) for x in r.member_refs]
            if r.member_refs is not None
            else None,
            list(r.member_roles) if r.member_roles is not None else None,
        )
        for r in pdf.itertuples(index=False)
    ]


def _row_weight(r: tuple) -> int:
    """Cheap upper-ish estimate of a row's uncompressed encoded size,
    used only to keep blocks under the spec's Blob limits."""
    w = 24
    if r[4]:
        for k, v in r[4].items():
            w += len(k) + len(v) + 8
    for xs in (r[5], r[7]):
        if xs:
            w += 10 * len(xs)
    if r[8]:
        w += sum(len(x) + 4 for x in r[8])
    return w


def _chunk_blocks(rows: list[tuple]):
    """Split a partition's rows into spec-compliant block chunks
    (<=8000 elements, ~<=8 MiB estimated uncompressed each)."""
    i, n = 0, len(rows)
    while i < n:
        j, w = i, 0
        while j < n and j - i < _MAX_BLOCK_ELEMENTS:
            w += _row_weight(rows[j])
            j += 1
            if w >= _MAX_BLOCK_BYTES:
                break
        yield rows[i:j]
        i = j


def _sorted_source(df: DataFrame, partitions: int | None) -> DataFrame:
    """Range-partition + sort by (type order, id) so output blocks —
    and therefore files — are in canonical OSM order."""
    nparts = partitions or max(df.rdd.getNumPartitions(), 1)
    return (
        df.select(
            F.when(F.col("element_type") == "node", 0)
            .when(F.col("element_type") == "way", 1)
            .otherwise(2)
            .alias("_ord"),
            "*",
        )
        .repartitionByRange(nparts, "_ord", "osm_id")
        .sortWithinPartitions("_ord", "osm_id")
        .drop("_ord")
    )


def write_pbf(
    df: DataFrame,
    path: str,
    sharded: bool = False,
    partitions: int | None = None,
    codec: str = "zlib",
) -> int:
    """Write an element DataFrame (read_pbf layout) as .osm.pbf.

    ``sharded=True`` is the at-scale shape: ``path`` becomes a
    directory of part-NNNNN.osm.pbf files, each written BY ITS OWN
    TASK (executor-side, like a parquet sink) — only per-part counts
    return to the driver. ``sharded=False`` writes one file, streaming
    framed blobs through ``toLocalIterator()`` so the driver holds at
    most one partition's blobs at a time. Either way each partition
    encodes vectorized (numpy delta/zigzag/varint) and chunks into
    spec-compliant <=8000-element / <=16 MiB blocks. Elements are
    range-partitioned by (type, id) so output is deterministic and in
    canonical order. ``codec`` picks the blob compression: 'zlib'
    (default, what osmium/osm2pgsql emit), 'lz4' (from-scratch block
    codec — faster decode, bigger files) or 'raw'. Returns element
    count."""
    src = _sorted_source(df, partitions)

    if sharded:
        os.makedirs(path, exist_ok=True)
        out_dir = os.path.abspath(path)

        def _write_part(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            rows: list[tuple] = []
            for pdf in batches:
                rows.extend(_rows_from_pandas(pdf))
            if not rows:
                return
            part = os.path.join(out_dir, f"part-{pid:05d}.osm.pbf")
            tmp = part + ".inprogress"
            with open(tmp, "wb") as fh:
                fh.write(_header_bytes())
                for chunk in _chunk_blocks(rows):
                    fh.write(
                        _frame_blob(_encode_primitive_block(chunk), codec)
                    )
            os.replace(tmp, part)
            yield pd.DataFrame({"part": [part], "n": [len(rows)]})

        counts = src.mapInPandas(_write_part, "part string, n long").collect()
        return int(sum(r["n"] for r in counts))

    def _enc(batches):
        rows: list[tuple] = []
        for pdf in batches:
            rows.extend(_rows_from_pandas(pdf))
        for chunk in _chunk_blocks(rows):
            framed = _frame_blob(_encode_primitive_block(chunk), codec)
            yield pd.DataFrame({"framed": [framed], "n": [len(chunk)]})

    n_total = 0
    with open(path, "wb") as fh:
        fh.write(_header_bytes())
        # toLocalIterator preserves partition order == range order;
        # one partition's frames in driver memory at a time.
        for r in src.mapInPandas(_enc, "framed binary, n long").toLocalIterator():
            fh.write(bytes(r["framed"]))
            n_total += int(r["n"])
    return n_total
