"""Hierarchical grid cell index (H3/S2-style, pure numpy).

The globe is divided at resolution ``r`` (0..28) into ``2^(r+1)`` columns x
``2^r`` rows of equal-degree cells (square in degrees: ``180/2^r`` per side).
A cell id packs ``(r, ix, iy)`` into a positive int64:

    id = (r << 57) | (ix << 28) | iy        # ix: 29 bits, iy: 28 bits

Role in the engine (mirrors the H3 design in SURVEY.md §4): the *coarse
phase* of every spatial join is an equi-join on these ids — points emit one
cell, polygons emit their bbox cover — followed by an exact vectorized
predicate. kNN uses ``k_ring`` expansion over the same ids.

Parent/child is a simple bit-shift relation (quadtree), so multi-resolution
compaction is available: ``parent(id, r')`` coarsens any id.

Reference parity: replaces PostGIS GiST index lookups that back
``ST_Contains``/``ST_DWithin`` plans in
/root/reference/pipeline/stop_places/sql/stop_places.sql (e.g. the spatial
join at stop_places.sql:1031-1036).
"""

from __future__ import annotations

import numpy as np

_R_SHIFT = 57
_IX_SHIFT = 28
_IY_MASK = (1 << 28) - 1
_IX_MASK = (1 << 29) - 1

MAX_RES = 28

# mean meters per degree (WGS84-ish): used for sizing only, never for
# exact predicates (those use haversine).
M_PER_DEG_LAT = 110_574.0
M_PER_DEG_LON_EQ = 111_320.0


def _deg_per_cell(res: int) -> float:
    return 180.0 / (1 << res)


def cell_width_m(res: int, lat: float | np.ndarray = 0.0) -> np.ndarray:
    """Approx min cell dimension in meters at latitude(s) ``lat``."""
    d = _deg_per_cell(res)
    w = M_PER_DEG_LON_EQ * d * np.cos(np.radians(np.asarray(lat, dtype=np.float64)))
    h = M_PER_DEG_LAT * d
    return np.minimum(np.abs(w), h)


def choose_resolution(target_m: float) -> int:
    """Finest resolution whose cell side is >= target_m at the equator."""
    for r in range(MAX_RES, -1, -1):
        if _deg_per_cell(r) * M_PER_DEG_LAT >= target_m:
            return r
    return 0


def _grid_dims(res: int) -> tuple[int, int]:
    return (1 << (res + 1)), (1 << res)  # (ncols, nrows)


def xy_of_points(
    lon: np.ndarray, lat: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    ncols, nrows = _grid_dims(res)
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * ncols).astype(np.int64)
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * nrows).astype(np.int64)
    np.clip(ix, 0, ncols - 1, out=ix)
    np.clip(iy, 0, nrows - 1, out=iy)
    return ix, iy


def pack(res: int, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (np.int64(res) << _R_SHIFT) | (ix.astype(np.int64) << _IX_SHIFT) | iy.astype(np.int64)


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> _R_SHIFT
    ix = (cell >> _IX_SHIFT) & _IX_MASK
    iy = cell & _IY_MASK
    return res, ix, iy


def cell_of_points(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized point -> cell id."""
    ix, iy = xy_of_points(lon, lat, res)
    return pack(res, ix, iy)


def parent(cell: np.ndarray, res: int) -> np.ndarray:
    """Coarsen cell ids to resolution ``res`` (must be <= their own)."""
    r, ix, iy = unpack(cell)
    shift = r - res  # vectorized per-cell shift
    return pack(res, ix >> shift, iy >> shift)


def cells_of_bbox(
    minlon: float, minlat: float, maxlon: float, maxlat: float, res: int
) -> np.ndarray:
    """All cell ids whose bbox intersects the given bbox (superset cover)."""
    ncols, nrows = _grid_dims(res)
    x0, y0 = xy_of_points(np.array([minlon]), np.array([minlat]), res)
    x1, y1 = xy_of_points(np.array([maxlon]), np.array([maxlat]), res)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack(res, gx.ravel(), gy.ravel())


def cover_bbox_adaptive(
    minlon: float,
    minlat: float,
    maxlon: float,
    maxlat: float,
    res: int,
    max_cells: int = 64,
) -> np.ndarray:
    """Bbox cover at ``res``, coarsening the bbox grid walk if it would
    exceed ``max_cells`` — but always emitting ids AT resolution ``res``?

    No: emitting coarser ids would break the equi-join. Instead we cap by
    stepping: if the bbox spans more than max_cells cells we *still* emit
    every cell (correctness first) — callers concerned about pathological
    continent-sized polygons should index those at a coarser join resolution
    (two-pass plan). Kept as an explicit guard so the failure mode is loud.
    """
    cells = cells_of_bbox(minlon, minlat, maxlon, maxlat, res)
    if len(cells) > max_cells * 64:
        raise ValueError(
            f"polygon bbox covers {len(cells)} cells at res {res}; "
            "choose a coarser join resolution for this layer"
        )
    return cells


def k_ring(cell: int | np.ndarray, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` (including it).

    Longitude wraps; latitude clamps at the poles. Input may be a scalar id
    or an array (result is the unique union for arrays).
    """
    cells = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res = int(cells[0] >> _R_SHIFT)
    ncols, nrows = _grid_dims(res)
    _, ix, iy = unpack(cells)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    nx = (ix[:, None] + ox.ravel()[None, :]) % ncols
    ny = iy[:, None] + oy.ravel()[None, :]
    valid = (ny >= 0) & (ny < nrows)
    out = pack(res, nx[valid], ny[valid])
    return np.unique(out)


def ring_offsets(k: int) -> np.ndarray:
    """(dx, dy) offsets of the ring at exactly Chebyshev distance k."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    offs = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) == k:
                offs.append((dx, dy))
    return np.array(offs, dtype=np.int64)


def neighbors_at_ring(cells: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """For each input cell, its ring-k neighbor cells.

    Returns (repeat_index_into_input, neighbor_cell_ids) — explode-friendly.
    """
    cells = np.asarray(cells, dtype=np.int64)
    if len(cells) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    res = int(cells[0] >> _R_SHIFT)
    ncols, nrows = _grid_dims(res)
    _, ix, iy = unpack(cells)
    offs = ring_offsets(k)
    nx = (ix[:, None] + offs[:, 0][None, :]) % ncols
    ny = iy[:, None] + offs[:, 1][None, :]
    valid = (ny >= 0) & (ny < nrows)
    idx = np.broadcast_to(np.arange(len(cells))[:, None], nx.shape)[valid]
    return idx, pack(res, nx[valid], ny[valid])
