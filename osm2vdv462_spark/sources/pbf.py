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
    data = b""
    for fno, wt, v in _fields(raw):
        if fno == 1 and wt == 2:
            data = v
        elif fno == 3 and wt == 2:
            data = zlib.decompress(v)
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
    ranges. ``path`` may be one file, a glob, or a list (planet-scale
    OSM data ships sharded; blobs from all files pool into one
    descriptor list, so task balancing is file-agnostic)."""
    import glob as _glob

    if isinstance(path, str):
        paths = sorted(_glob.glob(path)) if _glob.has_magic(path) else [path]
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


def _zig(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _enc_packed(vals) -> bytes:
    return b"".join(_enc_varint(int(v)) for v in vals)


def _encode_primitive_block(rows: list[tuple]) -> bytes:
    """Element tuples (reader layout) -> one PrimitiveBlock with its own
    string table; nodes emit as DenseNodes (zigzag deltas), ways and
    relations with packed key/val/ref/member streams."""
    strings: dict[str, int] = {"": 0}

    def sid(s: str) -> int:
        if s not in strings:
            strings[s] = len(strings)
        return strings[s]

    nodes = [r for r in rows if r[0] == "node"]
    groups = b""
    if nodes:
        ids, lats, lons, kv = [], [], [], []
        pid = plat = plon = 0
        for r in nodes:
            ids.append(_zig(r[1] - pid))
            rlat = int(round(r[3] * 1e7))  # granularity 100, 1e-9 base
            rlon = int(round(r[2] * 1e7))
            lats.append(_zig(rlat - plat))
            lons.append(_zig(rlon - plon))
            pid, plat, plon = r[1], rlat, rlon
            for k, v in (r[4] or {}).items():
                kv.extend((sid(k), sid(v)))
            kv.append(0)
        dense = (
            _enc_field(1, 2, _enc_packed(ids))
            + _enc_field(8, 2, _enc_packed(lats))
            + _enc_field(9, 2, _enc_packed(lons))
            + _enc_field(10, 2, _enc_packed(kv))
        )
        groups += _enc_field(2, 2, _enc_field(2, 2, dense))
    for r in rows:
        if r[0] == "way":
            keys = [sid(k) for k in (r[4] or {})]
            vals = [sid(v) for v in (r[4] or {}).values()]
            deltas, prev = [], 0
            for ref in r[5] or []:
                deltas.append(_zig(ref - prev))
                prev = ref
            way = (
                _enc_field(1, 0, r[1])
                + _enc_field(2, 2, _enc_packed(keys))
                + _enc_field(3, 2, _enc_packed(vals))
                + _enc_field(8, 2, _enc_packed(deltas))
            )
            groups += _enc_field(2, 2, _enc_field(3, 2, way))
        elif r[0] == "relation":
            keys = [sid(k) for k in (r[4] or {})]
            vals = [sid(v) for v in (r[4] or {}).values()]
            tmap = {"node": 0, "way": 1, "relation": 2}
            roles = [sid(x) for x in (r[8] or [])]
            types = [tmap[x] for x in (r[6] or [])]
            deltas, prev = [], 0
            for m in r[7] or []:
                deltas.append(_zig(m - prev))
                prev = m
            rel = (
                _enc_field(1, 0, r[1])
                + _enc_field(2, 2, _enc_packed(keys))
                + _enc_field(3, 2, _enc_packed(vals))
                + _enc_field(8, 2, _enc_packed(roles))
                + _enc_field(9, 2, _enc_packed(deltas))
                + _enc_field(10, 2, _enc_packed(types))
            )
            groups += _enc_field(2, 2, _enc_field(4, 2, rel))
    st = b"".join(
        _enc_field(1, 2, s.encode())
        for s in sorted(strings, key=strings.get)
    )
    return _enc_field(1, 2, st) + groups


def write_pbf(df: DataFrame, path: str) -> int:
    """Write an element DataFrame (read_pbf layout) as .osm.pbf.

    Spark-first: each partition encodes its elements into one
    zlib-compressed Blob IN PARALLEL (mapInPandas emitting blob bytes);
    the driver only concatenates framed blobs — per-blob string tables
    make blobs independent, which is exactly why the format
    parallelizes both ways. Elements are range-partitioned by
    (type, id) so output is deterministic. Returns element count."""
    order = {"node": 0, "way": 1, "relation": 2}
    src = (
        df.select(
            F.when(F.col("element_type") == "node", 0)
            .when(F.col("element_type") == "way", 1)
            .otherwise(2)
            .alias("_ord"),
            "*",
        )
        .repartitionByRange(max(df.rdd.getNumPartitions(), 1), "_ord", "osm_id")
        .sortWithinPartitions("_ord", "osm_id")
        .drop("_ord")
    )

    def _enc(batches):
        rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rows.append(
                    (
                        r.element_type,
                        int(r.osm_id),
                        r.lon,
                        r.lat,
                        dict(r.tags) if r.tags is not None else None,
                        list(r.refs) if r.refs is not None else None,
                        list(r.member_types) if r.member_types is not None else None,
                        [int(x) for x in r.member_refs] if r.member_refs is not None else None,
                        list(r.member_roles) if r.member_roles is not None else None,
                    )
                )
        if not rows:
            return
        block = _encode_primitive_block(rows)
        blob = _enc_field(2, 0, len(block)) + _enc_field(
            3, 2, zlib.compress(block)
        )
        first = min((order[r[0]], r[1]) for r in rows)
        yield pd.DataFrame(
            [(first[0], first[1], blob, len(rows))],
            columns=["ord", "first_id", "blob", "n"],
        )

    parts = src.mapInPandas(
        _enc, "ord int, first_id long, blob binary, n long"
    ).collect()
    parts.sort(key=lambda r: (r["ord"], r["first_id"]))
    n_total = 0
    with open(path, "wb") as fh:
        header = _enc_field(4, 2, b"OsmSchema-V0.6") + _enc_field(
            16, 2, b"osm2vdv462_spark"
        )
        hdr_blob = _enc_field(1, 2, header)
        bh = _enc_field(1, 2, b"OSMHeader") + _enc_field(3, 0, len(hdr_blob))
        fh.write(struct.pack(">I", len(bh)) + bh + hdr_blob)
        for r in parts:
            blob = bytes(r["blob"])
            bh = _enc_field(1, 2, b"OSMData") + _enc_field(3, 0, len(blob))
            fh.write(struct.pack(">I", len(bh)) + bh + blob)
            n_total += r["n"]
    return n_total
