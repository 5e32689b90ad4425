"""Vectorized geometry math (numpy) — the engine's PostGIS replacement.

Each function notes the PostGIS call it replaces in the reference
(/root/reference/pipeline/stop_places/sql/stop_places.sql, abbreviated SP).
Everything operates on numpy arrays so batches of geometries are processed
without per-row Python in the Spark hot path.
"""

from __future__ import annotations

import numpy as np

from .wkb import Geom, POLYGON, MULTIPOLYGON, LINESTRING, POINT

EARTH_R = 6_371_008.8  # mean earth radius, meters


# ------------------------------------------------------------- distances


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, fully vectorized.

    Replaces ``calculate_Distance`` / ``ST_Length::geography`` (SP:8-14).
    Agrees with geodesic lengths to ~0.3% (sufficient: consumers round to
    whole meters or use distances ordinally for kNN).
    """
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def poslist_str(coords, precision: int = 8) -> str:
    """gml posList content ('lat lon lat lon ...') at <=precision
    decimals, trailing zeros trimmed — THE canonical fixed-precision
    coordinate rendering (shared by the geo.columns.poslist UDF, the
    path-link content-hash id in pipeline.routing, and the DuckDB gate
    oracles, which replicate it as rtrim(rtrim(printf(...),'0'),'.'))."""
    parts = []
    for lon, lat in coords:
        for v in (lat, lon):
            s = f"{v:.{precision}f}".rstrip("0").rstrip(".")
            parts.append(s if s not in ("", "-0") else "0")
    return " ".join(parts)


def polyline_length_m(coords: np.ndarray) -> float:
    """Geodesic length of one polyline (SP:8-14 on LineStrings)."""
    if len(coords) < 2:
        return 0.0
    return float(
        haversine_m(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1]).sum()
    )


DEG2RAD = 0.017453292519943295  # explicit literal: mirrored verbatim in
# the SQL oracles so both engines multiply by the identical double
# (radians() implementations may fold pi/180 differently).


def ring_area_m2(ring: np.ndarray) -> float:
    """Spherical area of one ring via the cylindrical-equal-area
    shoelace: |sum dlambda * (sin phi_i + sin phi_i+1)| / 2 * R^2 — the
    trapezoid rule for the contour integral of sin(phi) dlambda, whose
    loop value is the enclosed solid angle. Exact when edges are linear
    in (lon, sin lat); for geodesic edges it is a small-extent
    approximation, the same regime as the reference's planar PostGIS
    areas in a local projection (SP's ST_Area usage)."""
    if len(ring) < 4:
        return 0.0
    lam = ring[:, 0] * DEG2RAD
    s = np.sin(ring[:, 1] * DEG2RAD)
    dl = lam[1:] - lam[:-1]
    return abs(float(np.sum(dl * (s[:-1] + s[1:])))) * 0.5 * EARTH_R * EARTH_R


def spherical_area_m2(geom: Geom) -> float:
    """Polygon / multipolygon area: per part, outer ring minus holes."""
    total = 0.0
    for p in range(len(geom.parts) - 1):
        r0, r1 = geom.parts[p], geom.parts[p + 1]
        for i in range(r0, r1):
            a = ring_area_m2(geom.ring(i))
            total += a if i == r0 else -a
    return total


def polylines_length_m(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Lengths of many polylines stored flat (offsets delimit)."""
    if len(coords) == 0:
        return np.zeros(len(offsets) - 1)
    seg = haversine_m(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1])
    # zero out segments that bridge two different polylines
    mask = np.ones(len(seg), bool)
    mask[offsets[1:-1] - 1] = False
    seg = seg * mask
    out = np.add.reduceat(np.concatenate([seg, [0.0]]), offsets[:-1])
    # reduceat quirk: empty ranges copy the element — fix via lengths
    lens = np.diff(offsets)
    out[lens < 2] = 0.0
    return out


# -------------------------------------------------------- point in polygon


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast: True where (px,py) is inside the ring.

    Vectorized over points (px/py arrays) x ring edges. Points exactly on
    an edge may land either side (documented: engine PIP semantics are
    ST_Intersects-like on boundaries; synthetic fixtures avoid exact-edge
    points). Replaces the containment core of ST_Contains-based membership.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    cond = (y0[None, :] > py) != (y1[None, :] > py)
    # over= too: degenerate fuzzed rings can overflow the multiply into
    # inf, which propagates correctly through the comparison (r3 verdict:
    # result unaffected, silence keeps CI logs clean)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        xint = x0[None, :] + (py - y0[None, :]) / (y1[None, :] - y0[None, :]) * (
            x1[None, :] - x0[None, :]
        )
    crossings = cond & (px < xint)
    return crossings.sum(axis=1) % 2 == 1


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: Geom) -> np.ndarray:
    """PIP against a (Multi)Polygon Geom — holes handled by parity."""
    inside = np.zeros(len(px), dtype=bool)
    if poly.gtype == POLYGON or poly.gtype == MULTIPOLYGON:
        parity = np.zeros(len(px), dtype=np.int64)
        for i in range(poly.nrings):
            parity += points_in_ring(px, py, poly.ring(i)).astype(np.int64)
        inside = parity % 2 == 1
    return inside


# ------------------------------------------------------------- centroids


def centroid(geom: Geom) -> tuple[float, float]:
    """Planar centroid, matching ST_Centroid semantics (SP:167-177):

    polygons -> area-weighted; linestrings -> length-weighted; points ->
    mean. (PostGIS is planar on 4326 too, so this matches the reference.)
    """
    if geom.gtype == POINT:
        return float(geom.coords[0, 0]), float(geom.coords[0, 1])
    if geom.gtype in (POLYGON, MULTIPOLYGON):
        # translate to a local origin for numerical stability (shoelace
        # cancels catastrophically at lon~100, polygon size ~1e-3 deg)
        ox, oy = geom.coords[0]
        A2, cx, cy = 0.0, 0.0, 0.0
        for i in range(geom.nrings):
            r = geom.ring(i)
            x0, y0 = r[:-1, 0] - ox, r[:-1, 1] - oy
            x1, y1 = r[1:, 0] - ox, r[1:, 1] - oy
            cross = x0 * y1 - x1 * y0
            A2 += cross.sum()
            cx += ((x0 + x1) * cross).sum()
            cy += ((y0 + y1) * cross).sum()
        if abs(A2) > 1e-30:
            return ox + cx / (3.0 * A2), oy + cy / (3.0 * A2)
        # degenerate polygon -> fall through to length weighting
    if geom.gtype in (LINESTRING, POLYGON, MULTIPOLYGON) or geom.nrings >= 1:
        wx, wy, wl = 0.0, 0.0, 0.0
        for i in range(geom.nrings):
            r = geom.ring(i)
            if len(r) < 2:
                continue
            dx = r[1:] - r[:-1]
            seg = np.hypot(dx[:, 0], dx[:, 1])
            mid = (r[1:] + r[:-1]) / 2.0
            wx += (mid[:, 0] * seg).sum()
            wy += (mid[:, 1] * seg).sum()
            wl += seg.sum()
        if wl > 0:
            return wx / wl, wy / wl
    m = geom.coords.mean(axis=0)
    return float(m[0]), float(m[1])


# -------------------------------------------------- hull / envelope / width


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull (closed not included)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def oriented_envelope(points: np.ndarray) -> np.ndarray:
    """Minimum-area rotated rectangle (rotating calipers over the hull).

    Replaces ST_OrientedEnvelope (SP:981). Returns 5 points (closed ring).
    """
    hull = convex_hull(points)
    if len(hull) < 3:
        mn, mx = points.min(axis=0), points.max(axis=0)
        return np.array([[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]], [mn[0], mn[1]]])
    edges = hull[np.r_[1 : len(hull), 0]] - hull
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2.0))
    best = None
    for a in angles:
        rot = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]])
        r = hull @ rot.T
        mn, mx = r.min(axis=0), r.max(axis=0)
        area = (mx[0] - mn[0]) * (mx[1] - mn[1])
        if best is None or area < best[0]:
            best = (area, a, mn, mx)
    _, a, mn, mx = best
    rect = np.array(
        [[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]], [mn[0], mn[1]]]
    )
    inv = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    return rect @ inv.T


def envelope_sides_m(rect: np.ndarray) -> tuple[float, float]:
    """(short, long) side lengths in meters of a closed 5-pt rectangle.

    Replaces the ST_DumpSegments + MIN/MAX plan (SP:975-996).
    """
    d = haversine_m(rect[:-1, 0], rect[:-1, 1], rect[1:, 0], rect[1:, 1])
    return float(d.min()), float(d.max())


# -------------------------------------------------------------- simplify


def simplify(coords: np.ndarray, tol: float) -> np.ndarray:
    """Plain Douglas-Peucker on one ring/linestring (planar tolerance,
    degrees). May self-intersect concave rings at large tolerances — use
    simplify_preserve for ST_SimplifyPreserveTopology semantics."""
    closed = bool(np.all(coords[0] == coords[-1])) and len(coords) > 3
    pts = coords[:-1] if closed else coords
    keep = np.zeros(len(pts), bool)
    keep[[0, len(pts) - 1]] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        ln = np.hypot(*seg)
        sub = pts[i + 1 : j]
        if ln == 0:
            d = np.hypot(sub[:, 0] - pts[i][0], sub[:, 1] - pts[i][1])
        else:
            d = np.abs(np.cross(seg, sub - pts[i])) / ln
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.extend([(i, i + 1 + k), (i + 1 + k, j)])
    out = pts[keep]
    if closed:
        out = np.vstack([out, out[:1]])
    return out


def ring_self_intersects(ring: np.ndarray) -> bool:
    """True when any two NON-adjacent segments of a closed ring intersect
    (adjacent segments legitimately share a vertex)."""
    s0, s1 = ring[:-1], ring[1:]
    n = len(s0)
    if n < 4:
        return False
    hit = _segments_intersect(
        s0[:, None, :], s1[:, None, :], s0[None, :, :], s1[None, :, :]
    )
    idx = np.arange(n)
    adj = (np.abs(idx[:, None] - idx[None, :]) <= 1) | (
        np.abs(idx[:, None] - idx[None, :]) == n - 1
    )
    return bool((hit & ~adj).any())


def simplify_preserve(coords: np.ndarray, tol: float) -> np.ndarray:
    """ST_SimplifyPreserveTopology(geom, tol) semantics (SP:984): plain
    DP, but a simplification that would self-intersect the ring (possible
    on concave rings when tol spans a neck) is REJECTED — the original
    ring is returned rather than an invalid one. Conservative in the
    same direction as GEOS: never produces a new invalid geometry."""
    out = simplify(coords, tol)
    closed = bool(np.all(coords[0] == coords[-1])) and len(coords) > 3
    if closed and ring_self_intersects(out):
        return coords
    return out


# ------------------------------------------------------- clip / subdivide


def clip_ring_by_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Sutherland-Hodgman clip of one ring by an axis rect; closed output."""
    poly = ring[:-1] if len(ring) > 1 and np.all(ring[0] == ring[-1]) else ring

    def clip_edge(pts, inside, intersect):
        if len(pts) == 0:
            return pts
        out = []
        prev = pts[-1]
        prev_in = inside(prev)
        for p in pts:
            cur_in = inside(p)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, p))
                out.append(p)
            elif prev_in:
                out.append(intersect(prev, p))
            prev, prev_in = p, cur_in
        return np.array(out) if out else np.empty((0, 2))

    def ix(a, b, x):
        t = (x - a[0]) / (b[0] - a[0])
        return np.array([x, a[1] + t * (b[1] - a[1])])

    def iy(a, b, y):
        t = (y - a[1]) / (b[1] - a[1])
        return np.array([a[0] + t * (b[0] - a[0]), y])

    pts = poly
    pts = clip_edge(pts, lambda p: p[0] >= minx, lambda a, b: ix(a, b, minx))
    pts = clip_edge(pts, lambda p: p[0] <= maxx, lambda a, b: ix(a, b, maxx))
    pts = clip_edge(pts, lambda p: p[1] >= miny, lambda a, b: iy(a, b, miny))
    pts = clip_edge(pts, lambda p: p[1] <= maxy, lambda a, b: iy(a, b, maxy))
    if len(pts) < 3:
        return np.empty((0, 2))
    return np.vstack([pts, pts[:1]])


def subdivide(ring: np.ndarray, max_vertices: int = 5, _depth: int = 0) -> list[np.ndarray]:
    """Recursive quadtree split of a polygon ring until each part has
    <= max_vertices distinct vertices. Replaces ST_Subdivide(geom, 5)
    (SP:982-985) — semantics (parts cover the input, vertex cap) match;
    exact part boundaries are implementation-defined in PostGIS too.
    """
    distinct = len(ring) - 1
    if distinct <= max_vertices or _depth > 16:
        return [ring]
    minx, miny = ring[:, 0].min(), ring[:, 1].min()
    maxx, maxy = ring[:, 0].max(), ring[:, 1].max()
    if maxx - minx >= maxy - miny:
        mid = (minx + maxx) / 2.0
        boxes = [(minx, miny, mid, maxy), (mid, miny, maxx, maxy)]
    else:
        mid = (miny + maxy) / 2.0
        boxes = [(minx, miny, maxx, mid), (minx, mid, maxx, maxy)]
    out = []
    for bx in boxes:
        part = clip_ring_by_rect(ring, *bx)
        if len(part) >= 4:
            out.extend(subdivide(part, max_vertices, _depth + 1))
    return out if out else [ring]


# ---------------------------------------------------- pairwise predicates


def _segments_intersect(a0, a1, b0, b1) -> np.ndarray:
    """Vectorized proper+improper segment intersection (arrays of segs)."""

    def orient(p, q, r):
        return (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1]) - (
            q[..., 1] - p[..., 1]
        ) * (r[..., 0] - p[..., 0])

    d1 = orient(b0, b1, a0)
    d2 = orient(b0, b1, a1)
    d3 = orient(a0, a1, b0)
    d4 = orient(a0, a1, b1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on_seg(p, q, r):
        return (
            (np.minimum(p[..., 0], q[..., 0]) <= r[..., 0])
            & (r[..., 0] <= np.maximum(p[..., 0], q[..., 0]))
            & (np.minimum(p[..., 1], q[..., 1]) <= r[..., 1])
            & (r[..., 1] <= np.maximum(p[..., 1], q[..., 1]))
        )

    collinear = (
        ((d1 == 0) & on_seg(b0, b1, a0))
        | ((d2 == 0) & on_seg(b0, b1, a1))
        | ((d3 == 0) & on_seg(a0, a1, b0))
        | ((d4 == 0) & on_seg(a0, a1, b1))
    )
    return proper | collinear


def _all_segments(g: Geom) -> tuple[np.ndarray, np.ndarray]:
    s0, s1 = [], []
    for i in range(g.nrings):
        r = g.ring(i)
        if len(r) >= 2:
            s0.append(r[:-1])
            s1.append(r[1:])
    if not s0:
        z = np.empty((0, 2))
        return z, z
    return np.concatenate(s0), np.concatenate(s1)


def boundaries_intersect(a: Geom, b: Geom) -> bool:
    a0, a1 = _all_segments(a)
    b0, b1 = _all_segments(b)
    if len(a0) == 0 or len(b0) == 0:
        return False
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]
    return bool(_segments_intersect(A0, A1, B0, B1).any())


def geoms_intersect(a: Geom, b: Geom) -> bool:
    """ST_Intersects for the type combos the reference uses (SP:1034,1062):
    polygon/polygon, polygon/line, polygon/point, line/line, point/any.
    bbox reject -> boundary crossing -> containment.
    """
    abb, bbb = a.bbox(), b.bbox()
    if abb[0] > bbb[2] or bbb[0] > abb[2] or abb[1] > bbb[3] or bbb[1] > abb[3]:
        return False
    if a.gtype == POINT:
        return _point_on(a.coords[0], b)
    if b.gtype == POINT:
        return _point_on(b.coords[0], a)
    if boundaries_intersect(a, b):
        return True
    # containment: any vertex of one strictly inside the other polygon
    if b.gtype in (POLYGON, MULTIPOLYGON):
        if points_in_polygon(a.coords[:1, 0], a.coords[:1, 1], b)[0]:
            return True
    if a.gtype in (POLYGON, MULTIPOLYGON):
        if points_in_polygon(b.coords[:1, 0], b.coords[:1, 1], a)[0]:
            return True
    return False


def _point_on(p: np.ndarray, g: Geom) -> bool:
    if g.gtype in (POLYGON, MULTIPOLYGON):
        if points_in_polygon(np.array([p[0]]), np.array([p[1]]), g)[0]:
            return True
    s0, s1 = _all_segments(g)
    if len(s0) == 0:
        return bool(np.any(np.all(g.coords == p, axis=1)))
    P = np.broadcast_to(p, s0.shape)
    return bool(_segments_intersect(s0, s1, P, P).any())


def touches(a: Geom, b: Geom) -> bool:
    """ST_Touches approximation (SP:1034 platform x platform_edge):
    geometries intersect but interiors do not.

    Interior-overlap test: any vertex of one strictly inside the other, or
    any *proper* (non-collinear) boundary crossing. Exact for the
    polygon-boundary/linestring cases the reference exercises.
    """
    if not geoms_intersect(a, b):
        return False
    # probe points (vertices + segment midpoints) strictly interior?
    for g, h in ((a, b), (b, a)):
        if h.gtype in (POLYGON, MULTIPOLYGON):
            s0g, s1g = _all_segments(g)
            probes = g.coords
            if len(s0g):
                probes = np.vstack([probes, (s0g + s1g) / 2.0])
            inside = points_in_polygon(probes[:, 0], probes[:, 1], h)
            if inside.any():
                # "strictly": drop probes that lie on h's boundary
                s0, s1 = _all_segments(h)
                for idx in np.nonzero(inside)[0]:
                    p = probes[idx]
                    P = np.broadcast_to(p, s0.shape)
                    if not _segments_intersect(s0, s1, P, P).any():
                        return False
    # proper crossing of boundaries => interiors meet
    a0, a1 = _all_segments(a)
    b0, b1 = _all_segments(b)
    if len(a0) and len(b0):
        A0, A1 = a0[:, None, :], a1[:, None, :]
        B0, B1 = b0[None, :, :], b1[None, :, :]

        def orient(p, q, r):
            return (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1]) - (
                q[..., 1] - p[..., 1]
            ) * (r[..., 0] - p[..., 0])

        d1, d2 = orient(B0, B1, A0), orient(B0, B1, A1)
        d3, d4 = orient(A0, A1, B0), orient(A0, A1, B1)
        proper = (
            ((d1 > 0) != (d2 > 0))
            & ((d3 > 0) != (d4 > 0))
            & (d1 != 0)
            & (d2 != 0)
            & (d3 != 0)
            & (d4 != 0)
        )
        if proper.any():
            return False
    return True


def predicate_pairs(
    geoms: list, ai: np.ndarray, bi: np.ndarray, predicate: str = "intersects"
) -> np.ndarray:
    """Vectorized ST_Intersects / ST_Touches over candidate PAIRS
    (replaces per-row scalar calls in the spatial join's exact phase —
    VERDICT r1 #4). ``geoms``: decoded unique geometries; ``ai``/``bi``:
    pair ordinals into it. Semantics identical to geoms_intersect() /
    touches() per pair (tests compare against the scalar oracles).

    Vectorization layout: one bbox reject over ALL pairs, then per unique
    LEFT geometry one segment-crossing evaluation of its segments against
    the CONCATENATION of all its candidates' segments (reduceat per
    candidate). Containment tails run on pre-decoded geometries; the
    touches interior refinement runs only on pairs that already
    intersect (≈ true matches, not candidates).
    """
    n = len(ai)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    boxes = np.asarray([g.bbox() for g in geoms], np.float64)
    ab, bb = boxes[ai], boxes[bi]
    alive = ~(
        (ab[:, 0] > bb[:, 2])
        | (bb[:, 0] > ab[:, 2])
        | (ab[:, 1] > bb[:, 3])
        | (bb[:, 1] > ab[:, 3])
    )
    idx = np.nonzero(alive)[0]
    if len(idx) == 0:
        return out

    seg_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def segs(o: int) -> tuple[np.ndarray, np.ndarray]:
        s = seg_cache.get(o)
        if s is None:
            s = _all_segments(geoms[o])
            seg_cache[o] = s
        return s

    order = idx[np.argsort(ai[idx], kind="stable")]
    starts = np.nonzero(np.r_[True, ai[order][1:] != ai[order][:-1]])[0]
    bounds = np.r_[starts, len(order)]
    inter = np.zeros(n, bool)
    for gi in range(len(starts)):
        rows = order[bounds[gi] : bounds[gi + 1]]
        a = geoms[ai[rows[0]]]
        # point cases mirror geoms_intersect's early exits (rare; scalar)
        if a.gtype == POINT:
            for r in rows:
                inter[r] = _point_on(a.coords[0], geoms[bi[r]])
            continue
        pt_rows = [r for r in rows if geoms[bi[r]].gtype == POINT]
        for r in pt_rows:
            inter[r] = _point_on(geoms[bi[r]].coords[0], a)
        rows = np.array([r for r in rows if geoms[bi[r]].gtype != POINT])
        if len(rows) == 0:
            continue
        a0, a1 = segs(ai[rows[0]])
        bsegs = [segs(bi[r]) for r in rows]
        sizes = np.array([len(s[0]) for s in bsegs], np.int64)
        if len(a0) and sizes.sum():
            B0 = np.concatenate([s[0] for s in bsegs if len(s[0])])
            B1 = np.concatenate([s[1] for s in bsegs if len(s[1])])
            hit_cols = _segments_intersect(
                a0[:, None, :], a1[:, None, :], B0[None, :, :], B1[None, :, :]
            ).any(axis=0)
            offs = np.r_[0, np.cumsum(sizes)[:-1]]
            nz = sizes > 0
            per_b = np.zeros(len(rows), bool)
            if nz.any():
                red = np.add.reduceat(
                    np.concatenate([hit_cols, [False]]), offs[nz]
                )
                per_b[nz] = red > 0
            inter[rows] = per_b
        # containment tails (first-vertex probes), matching the scalar
        # order: b-in-a batched in one PIP call; a-in-b per polygon b
        rest = rows[~inter[rows]]
        if len(rest):
            if a.gtype in (POLYGON, MULTIPOLYGON):
                bx = np.array([geoms[bi[r]].coords[0, 0] for r in rest])
                by = np.array([geoms[bi[r]].coords[0, 1] for r in rest])
                inter[rest] |= points_in_polygon(bx, by, a)
            for r in rest[~inter[rest]]:
                b = geoms[bi[r]]
                if b.gtype in (POLYGON, MULTIPOLYGON):
                    inter[r] = bool(
                        points_in_polygon(a.coords[:1, 0], a.coords[:1, 1], b)[0]
                    )
    if predicate == "intersects":
        return inter
    # touches refinement on actual intersecting pairs only
    for r in np.nonzero(inter)[0]:
        out[r] = touches(geoms[ai[r]], geoms[bi[r]])
    return out


# ------------------------------------------------------ linear referencing


def snap_to_segments(
    px: np.ndarray,
    py: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Nearest-segment snap (the ST_ClosestPoint / ST_LineLocatePoint
    pair) in the planar working frame: for each point, the index of the
    closest segment (ties -> lowest index), the clamped projection
    fraction t in [0, 1] along it, and the squared distance.

    Vectorized points x segments; the projection is the textbook
    t = clamp(((p-a)·(b-a)) / |b-a|^2, 0, 1), degenerate (a == b)
    segments treated as points (t = 0). The arithmetic is plain IEEE
    +/*/÷ in a FIXED order so the DuckDB oracle can replay it
    bit-identically (no trig — distances stay in the working frame;
    callers convert to meters only for display, after rounding).

    Reference parity: the PPR path stitcher resolves path points onto
    member edges (routing.py R2-R5 family); this kernel is that
    resolution step exposed as a first-class linear-referencing op.
    """
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    ax = np.asarray(ax, np.float64)[None, :]
    ay = np.asarray(ay, np.float64)[None, :]
    dx = np.asarray(bx, np.float64)[None, :] - ax
    dy = np.asarray(by, np.float64)[None, :] - ay
    seg2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / seg2
    t = np.where(seg2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
    idx = np.argmin(d2, axis=1)  # first minimum = lowest segment index
    rows = np.arange(len(idx))
    return idx, t[rows, idx], d2[rows, idx]
