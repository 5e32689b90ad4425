"""From-scratch Mapbox Vector Tile (MVT) wire codec — the tile SINK of
the tiling engine (BASELINE.json north star: "emits tile assignments").
Pure stdlib + the repo's own protobuf wire primitives (sources/pbf.py);
no mapbox libs (sandbox rule).

Scope (MVT spec 2.1, the subset a polygon tile layer needs):
* Tile -> repeated Layer (field 3); Layer: version=2, name, extent,
  keys/values tables, repeated Feature;
* Feature: id, packed tags (key/value table indices), geom type,
  packed geometry command stream;
* geometry: MoveTo/LineTo/ClosePath command integers ((id & 7) |
  (count << 3)) with zigzag-encoded coordinate DELTAS — cursor state
  carries across rings within one feature, per spec;
* decoder: full inverse (absolute ring coords, tags, ids) plus the
  packed-geometry payload length, so gated queries can verify the
  encoder THROUGH a real decode round-trip.

Reference analogue: the reference's tile/export stage emits per-tile
vector documents (vdv462 XML per stop place); this is the same shape
in the format map stacks actually serve. Coordinates are quantized
OUTSIDE this module (integer math — see queries/geo_queries.py::
mvt_features) so the codec itself is exact integer wire plumbing.
"""

from __future__ import annotations

import numpy as np

from ..sources.pbf import (
    _enc_field,
    _enc_varint,
    _fields,
    _read_varint,
    decode_packed_varints,
    encode_packed_varints,
)

EXTENT = 4096
GEOM_POLYGON = 3
CMD_MOVETO, CMD_LINETO, CMD_CLOSEPATH = 1, 2, 7


def _zz(v: int) -> int:
    """Protobuf zigzag: 2v for v >= 0, 2|v| - 1 for v < 0."""
    return (v << 1) ^ (v >> 63)


def geometry_commands(rings: list[np.ndarray]) -> list[int]:
    """Rings (each (n, 2) int, NOT closed) -> MVT command stream.
    The coordinate cursor carries across rings (spec 4.3.3)."""
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        n = len(ring)
        if n < 3:
            raise ValueError("polygon ring needs >= 3 vertices")
        cmds.append((CMD_MOVETO & 7) | (1 << 3))
        for j in range(n):
            dx = int(ring[j, 0]) - cx
            dy = int(ring[j, 1]) - cy
            cmds.append(_zz(dx))
            cmds.append(_zz(dy))
            cx, cy = int(ring[j, 0]), int(ring[j, 1])
            if j == 0:
                cmds.append((CMD_LINETO & 7) | ((n - 1) << 3))
        cmds.append((CMD_CLOSEPATH & 7) | (1 << 3))
    return cmds


def encode_feature(
    fid: int, rings: list[np.ndarray], tags: list[int]
) -> bytes:
    body = _enc_field(1, 0, fid)
    if tags:
        body += _enc_field(
            2, 2, encode_packed_varints(np.asarray(tags, np.int64))
        )
    body += _enc_field(3, 0, GEOM_POLYGON)
    geom = encode_packed_varints(
        np.asarray(geometry_commands(rings), np.int64)
    )
    body += _enc_field(4, 2, geom)
    return body


def encode_tile(
    layer_name: str,
    features: list[tuple[int, list[np.ndarray], dict[str, str]]],
    extent: int = EXTENT,
) -> bytes:
    """features: [(feature_id, rings, properties)] — key/value tables
    are built in first-seen order, so a DETERMINISTIC feature order in
    means deterministic bytes out (callers sort by feature id)."""
    keys: list[str] = []
    vals: list[str] = []
    kidx: dict[str, int] = {}
    vidx: dict[str, int] = {}
    feats = b""
    for fid, rings, props in features:
        tags: list[int] = []
        for k, v in props.items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            if v not in vidx:
                vidx[v] = len(vals)
                vals.append(v)
            tags += [kidx[k], vidx[v]]
        feats += _enc_field(2, 2, encode_feature(fid, rings, tags))
    layer = _enc_field(15, 0, 2)  # version (spec: required, = 2)
    layer += _enc_field(1, 2, layer_name.encode())
    layer += feats
    for k in keys:
        layer += _enc_field(3, 2, k.encode())
    for v in vals:
        layer += _enc_field(4, 2, _enc_field(1, 2, v.encode()))
    layer += _enc_field(5, 0, extent)
    return _enc_field(3, 2, layer)


def _decode_geometry(buf: bytes) -> list[np.ndarray]:
    """Packed command stream -> absolute closed rings ((n, 2) int)."""
    cmds = decode_packed_varints(buf).astype(np.int64)
    rings: list[np.ndarray] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    n = len(cmds)
    while i < n:
        cid = int(cmds[i]) & 7
        cnt = int(cmds[i]) >> 3
        i += 1
        if cid in (CMD_MOVETO, CMD_LINETO):
            for _ in range(cnt):
                zx, zy = int(cmds[i]), int(cmds[i + 1])
                i += 2
                cx += (zx >> 1) ^ -(zx & 1)
                cy += (zy >> 1) ^ -(zy & 1)
                cur.append((cx, cy))
        elif cid == CMD_CLOSEPATH:
            if not cur:
                raise ValueError("ClosePath with empty ring")
            rings.append(np.asarray(cur, np.int64))
            cur = []
        else:
            raise ValueError(f"unknown MVT command {cid}")
    if cur:
        rings.append(np.asarray(cur, np.int64))
    return rings


def decode_tile(buf: bytes) -> list[dict]:
    """Tile bytes -> [{name, extent, version, features: [{id, type,
    rings, props, geom_len}]}]; geom_len is the packed geometry
    payload length in bytes (the wire-size stat gated queries check)."""
    layers = []
    for fno, wt, val in _fields(buf):
        if fno != 3 or wt != 2:
            continue
        name = ""
        extent = EXTENT
        version = 0
        keys: list[str] = []
        vals: list[str] = []
        raw_feats: list[bytes] = []
        for lf, lw, lv in _fields(val):
            if lf == 15:
                version = lv
            elif lf == 1:
                name = lv.decode()
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode())
            elif lf == 4:
                sv = ""
                for vf, vw, vv in _fields(lv):
                    if vf == 1:
                        sv = vv.decode()
                vals.append(sv)
            elif lf == 5:
                extent = lv
        features = []
        for fb in raw_feats:
            fid = 0
            gtype = 0
            rings: list[np.ndarray] = []
            tags: list[int] = []
            geom_len = 0
            for ff, fw, fv in _fields(fb):
                if ff == 1:
                    fid = fv
                elif ff == 2:
                    tags = decode_packed_varints(fv).astype(int).tolist()
                elif ff == 3:
                    gtype = fv
                elif ff == 4:
                    geom_len = len(fv)
                    rings = _decode_geometry(fv)
            props = {
                keys[tags[i]]: vals[tags[i + 1]]
                for i in range(0, len(tags), 2)
            }
            features.append(
                {
                    "id": fid,
                    "type": gtype,
                    "rings": rings,
                    "props": props,
                    "geom_len": geom_len,
                }
            )
        layers.append(
            {
                "name": name,
                "extent": extent,
                "version": version,
                "features": features,
            }
        )
    return layers
