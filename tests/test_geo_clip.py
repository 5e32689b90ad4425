"""Generic-path guarantee behind the tile_clip_areas oracle: the gate
world uses axis-aligned integer rects (so DuckDB can state the clipped
areas in closed form), but the Spark operator runs the generic
Sutherland-Hodgman kernel. This test drives that SAME kernel with
rotated convex polygons and checks the tiling is exact: the per-tile
clipped areas partition the polygon (sum equals the shoelace area) and
every clipped vertex stays inside its tile.
"""

import math

import numpy as np

from osm2vdv462_spark.geo import kernel


def _shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))


def _regular_ngon(n: int, cx: float, cy: float, r: float, rot: float):
    ang = rot + 2.0 * math.pi * np.arange(n) / n
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return np.vstack([pts, pts[:1]])


def _tile_sweep(ring: np.ndarray, t: float):
    """Clip ring against every tile of size t covering its bbox."""
    minx, miny = ring.min(axis=0)
    maxx, maxy = ring.max(axis=0)
    parts = []
    for tx in range(int(math.floor(minx / t)), int(math.floor(maxx / t)) + 1):
        for ty in range(
            int(math.floor(miny / t)), int(math.floor(maxy / t)) + 1
        ):
            clipped = kernel.clip_ring_by_rect(
                ring, tx * t, ty * t, (tx + 1) * t, (ty + 1) * t
            )
            if len(clipped) >= 4:
                parts.append((tx, ty, clipped))
    return parts


def test_rotated_polygons_tile_partition_is_exact():
    for n, rot, cx, cy, r in [
        (5, 0.3, 11.7, 4.2, 6.5),
        (7, 1.1, -3.2, -8.9, 12.0),
        (3, 2.5, 0.05, 0.05, 9.3),
        (12, 0.0, 100.4, 57.1, 3.999),
    ]:
        ring = _regular_ngon(n, cx, cy, r, rot)
        total = _shoelace(ring)
        parts = _tile_sweep(ring, 8.0)
        clipped_sum = sum(_shoelace(c) for _, _, c in parts)
        assert math.isclose(clipped_sum, total, rel_tol=1e-9), (
            n,
            clipped_sum,
            total,
        )
        for tx, ty, c in parts:
            eps = 1e-9
            assert c[:, 0].min() >= tx * 8.0 - eps
            assert c[:, 0].max() <= (tx + 1) * 8.0 + eps
            assert c[:, 1].min() >= ty * 8.0 - eps
            assert c[:, 1].max() <= (ty + 1) * 8.0 + eps


def test_degenerate_boundary_touch_yields_empty_or_zero_area():
    # rect whose right edge lies exactly on a tile boundary: the tile
    # starting AT that boundary must clip to nothing with area > 0
    ring = np.array(
        [[0.0, 0.0], [8.0, 0.0], [8.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    )
    clipped = kernel.clip_ring_by_rect(ring, 8.0, 0.0, 16.0, 8.0)
    assert len(clipped) < 4 or _shoelace(clipped) == 0.0
