"""Hilbert space-filling-curve index (vectorized numpy).

The locality-preserving cousin of the Z-order index
(pipeline/images.py::image_bbox_zorder gates the Morton form): two
cells adjacent on the curve are always adjacent in space, which Z-order
does not guarantee, so Hilbert-sorted bulk loads give strictly better
worst-case range-scan locality (the ordering Iceberg/Delta expose as
``hilbert_curve`` write ordering). Classic iterative xy->d algorithm
(reflect + swap per bit plane, the Wikipedia/Butz form), vectorized so
one numpy pass encodes a whole cell dimension — no Python-per-row work.

Integer-exact: for order <= 31 every intermediate fits int64, so the
index is hash-gateable against a recursive-CTE SQL twin
(queries/geo_queries.py::hilbert_tile_rollup).
"""

from __future__ import annotations

import numpy as np


def hilbert_d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Map (x, y) in [0, 2^order)^2 to the Hilbert curve distance d in
    [0, 4^order). Vectorized over numpy int arrays; returns int64."""
    n = 1 << order
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    if x.size and (
        x.min() < 0 or y.min() < 0 or x.max() >= n or y.max() >= n
    ):
        raise ValueError(f"coordinates outside [0, {n})")
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant frame: reflect (when rx=1, ry=0) then swap
        refl = (ry == 0) & (rx == 1)
        x = np.where(refl, n - 1 - x, x)
        y = np.where(refl, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= 1
    return d
