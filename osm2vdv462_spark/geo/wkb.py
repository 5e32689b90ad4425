"""WKB (Well-Known Binary) codec on numpy — no GEOS/shapely.

Geometries decode to a light ``Geom`` record: a flat ``(N, 2)`` float64
coordinate array plus ring/part offset arrays. This is the in-UDF working
representation; columns store raw WKB bytes (ISO WKB, little-endian), which
is what the reference keeps in PostGIS ``GEOMETRY`` columns
(/root/reference/pipeline/stop_places/lua/platforms.lua:32).

Supported: Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection (decode). EWKB SRID flags are accepted and
ignored (SRID is always 4326 here, per
/root/reference/pipeline/setup/sql/01_config.sql:8).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION = 4, 5, 6, 7

_TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    COLLECTION: "GeometryCollection",
}

_EWKB_SRID_FLAG = 0x20000000
_EWKB_Z_FLAG = 0x80000000
_EWKB_M_FLAG = 0x40000000


@dataclass
class Geom:
    """Decoded geometry.

    coords: (N, 2) lon/lat.
    rings:  offsets into coords delimiting rings/linestrings/points —
            ``rings[i]:rings[i+1]`` is one ring (len = nrings+1).
    parts:  offsets into ``rings`` delimiting polygons of a multipolygon /
            parts of a multi-geometry (len = nparts+1).
    """

    gtype: int
    coords: np.ndarray
    rings: np.ndarray = field(default_factory=lambda: np.array([0], np.int64))
    parts: np.ndarray = field(default_factory=lambda: np.array([0], np.int64))

    @property
    def type_name(self) -> str:
        return _TYPE_NAMES[self.gtype]

    def bbox(self) -> tuple[float, float, float, float]:
        c = self.coords
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    def ring(self, i: int) -> np.ndarray:
        return self.coords[self.rings[i] : self.rings[i + 1]]

    @property
    def nrings(self) -> int:
        return len(self.rings) - 1


class WKBError(ValueError):
    pass


def _read_header(buf: memoryview, off: int) -> tuple[str, int, int]:
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", buf, off + 1)
    off += 5
    if raw_type & _EWKB_SRID_FLAG:
        off += 4  # skip SRID
    if raw_type & (_EWKB_Z_FLAG | _EWKB_M_FLAG):
        raise WKBError("Z/M dimensions not supported")
    gtype = raw_type & 0xFF
    if gtype > 1000:  # ISO Z/M encodings (1001..3007)
        raise WKBError("ISO Z/M dimensions not supported")
    return endian, gtype, off


def _read_coords(buf: memoryview, off: int, n: int, endian: str) -> tuple[np.ndarray, int]:
    nbytes = n * 16
    arr = np.frombuffer(buf, dtype="<f8" if endian == "<" else ">f8", count=n * 2, offset=off)
    if endian == ">":
        arr = arr.astype("<f8")
    return arr.reshape(n, 2), off + nbytes


def decode(wkb: bytes) -> Geom:
    """Decode one WKB blob into a Geom."""
    buf = memoryview(wkb)
    geom, off = _decode_at(buf, 0)
    return geom


def _decode_at(buf: memoryview, off: int) -> tuple[Geom, int]:
    endian, gtype, off = _read_header(buf, off)
    u32 = endian + "I"
    if gtype == POINT:
        coords, off = _read_coords(buf, off, 1, endian)
        return Geom(POINT, coords, np.array([0, 1], np.int64), np.array([0, 1], np.int64)), off
    if gtype == LINESTRING:
        (n,) = struct.unpack_from(u32, buf, off)
        coords, off = _read_coords(buf, off + 4, n, endian)
        return (
            Geom(LINESTRING, coords, np.array([0, n], np.int64), np.array([0, 1], np.int64)),
            off,
        )
    if gtype == POLYGON:
        (nrings,) = struct.unpack_from(u32, buf, off)
        off += 4
        chunks, offsets = [], [0]
        total = 0
        for _ in range(nrings):
            (n,) = struct.unpack_from(u32, buf, off)
            c, off = _read_coords(buf, off + 4, n, endian)
            chunks.append(c)
            total += n
            offsets.append(total)
        coords = np.concatenate(chunks) if chunks else np.empty((0, 2))
        return (
            Geom(
                POLYGON,
                coords,
                np.array(offsets, np.int64),
                np.array([0, nrings], np.int64),
            ),
            off,
        )
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION):
        (nparts,) = struct.unpack_from(u32, buf, off)
        off += 4
        sub: list[Geom] = []
        for _ in range(nparts):
            g, off = _decode_at(buf, off)
            sub.append(g)
        coords = (
            np.concatenate([g.coords for g in sub]) if sub else np.empty((0, 2))
        )
        rings = [0]
        parts = [0]
        base = 0
        for g in sub:
            rings.extend((g.rings[1:] + base).tolist())
            base += len(g.coords)
            parts.append(len(rings) - 1)
        return (
            Geom(gtype, coords, np.array(rings, np.int64), np.array(parts, np.int64)),
            off,
        )
    raise WKBError(f"unsupported WKB type {gtype}")


# ---------------------------------------------------------------- encoding


def encode_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, lon, lat)


def encode_linestring(coords: np.ndarray) -> bytes:
    coords = np.ascontiguousarray(np.asarray(coords, np.float64))
    return struct.pack("<BII", 1, LINESTRING, len(coords)) + coords.tobytes()


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings[0] = exterior (closed: first == last), rest = holes."""
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for r in rings:
        r = np.ascontiguousarray(np.asarray(r, np.float64))
        out.append(struct.pack("<I", len(r)))
        out.append(r.tobytes())
    return b"".join(out)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def encode_geom(g: Geom) -> bytes:
    if g.gtype == POINT:
        return encode_point(g.coords[0, 0], g.coords[0, 1])
    if g.gtype == LINESTRING:
        return encode_linestring(g.coords)
    if g.gtype == POLYGON:
        return encode_polygon([g.ring(i) for i in range(g.nrings)])
    if g.gtype == MULTIPOLYGON:
        polys = []
        for p in range(len(g.parts) - 1):
            polys.append([g.ring(i) for i in range(g.parts[p], g.parts[p + 1])])
        return encode_multipolygon(polys)
    raise WKBError(f"encode unsupported for type {g.gtype}")


def geom_type_name(wkb: bytes) -> str:
    """Cheap type sniff without full decode (mirrors ST_GeometryType,
    /root/reference/pipeline/stop_places/sql/stop_places.sql:596)."""
    endian, gtype, _ = _read_header(memoryview(wkb), 0)
    return _TYPE_NAMES.get(gtype, f"Unknown{gtype}")
