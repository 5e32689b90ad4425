"""Hexagonal cell index (axial coordinates + cube rounding), from
scratch — the H3-style family of BASELINE.json's "H3/S2 cell-indexed"
rule in its closed-form, oracle-able shape.

Hexagonal bins are the standard density/aggregation cell for geo
analytics (every point is ≤ one circumradius from its cell center, and
all cells have identical area — neither is true of squares), and the
H3 system popularized them for exactly the workloads this engine
targets. Full icosahedral H3 cannot be cross-checked in this sandbox
(no h3 lib allowed); what IS implementable from the public geometry is
the core hex machinery H3 itself builds on: pointy-top axial
coordinates, fractional hex conversion, and cube rounding (the
published Red Blob Games / H3 algorithm), over a planar working frame
(lon/lat degrees here — at production scale you feed projected or
face-local coordinates, same algebra).

Closed form per point (size s = hex circumradius, working units):

    qf = (x*(sqrt(3)/3) - y*(1/3)) / s        rf = y*(2/3) / s
    cube round: (rx,ry,rz) = floor(.+0.5) of (qf, -qf-rf, rf), then
    reset the axis with the largest rounding error so rx+ry+rz == 0

and the cell id packs (q, r) = (rx, rz) into one int64:
``(q + 2^20) << 21 | (r + 2^20)``. Centers come back via
``x = s*sqrt(3)*(q + r/2)``, ``y = s*1.5*r``.

Three twins, bit-identical by construction (same constants via repr,
same operation order, floor(x+0.5) everywhere instead of engine
round() — Spark HALF_UP / DuckDB half-away / numpy half-even disagree
on ties, floor(+0.5) is one IEEE expression in all three):

* ``hex_ids_np``   — vectorized numpy (pytest reference surface);
* ``with_hexbin``  — pure-Catalyst columns (map-only whole-stage
                     codegen: indexing 10^12 rows is one scan);
* ``hexbin_sql``   — the same arithmetic as a DuckDB scalar subquery
                     for the driver-gate oracle.

tests/test_hexgrid.py checks twin equality on fuzzed planes plus the
defining Voronoi property: every point's assigned center is the
nearest center among its own and all six neighboring cells.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

C_Q = math.sqrt(3.0) / 3.0  # qf coefficient on x
C_T = 1.0 / 3.0  # qf coefficient on y
C_R = 2.0 / 3.0  # rf coefficient on y
SQRT3 = math.sqrt(3.0)
OFF = 1 << 20  # packing offset: |q|,|r| < 2^20
MASK = (1 << 21) - 1


# ------------------------------------------------------------- numpy twin


def hex_ids_np(x, y, size: float) -> np.ndarray:
    """Vectorized point -> packed hex cell id."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    qf = (x * C_Q - y * C_T) / size
    rf = y * C_R / size
    yf = -qf - rf
    rx = np.floor(qf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(rf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    q = rx.astype(np.int64)
    r = rz.astype(np.int64)
    return ((q + OFF) << 21) | (r + OFF)


def unpack_np(ids) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(ids, np.int64)
    return (ids >> 21) - OFF, (ids & MASK) - OFF


def center_np(ids, size: float) -> tuple[np.ndarray, np.ndarray]:
    q, r = unpack_np(ids)
    return size * SQRT3 * (q + r / 2.0), size * 1.5 * r


# ---------------------------------------------------------- Catalyst twin


def with_hexbin(
    df: DataFrame, x: str, y: str, size: float, out: str = "hex_id"
) -> DataFrame:
    """Pure-Catalyst twin (no UDF, no shuffle): fractional axial
    coords into ingredient columns, cube rounding as when() chains."""
    df = df.withColumn(
        "_hqf", (F.col(x) * C_Q - F.col(y) * C_T) / size
    ).withColumn("_hrf", F.col(y) * C_R / size)
    qf, rf = F.col("_hqf"), F.col("_hrf")
    yf = -qf - rf
    df = (
        df.withColumn("_hrx", F.floor(qf + 0.5).cast("double"))
        .withColumn("_hry", F.floor(yf + 0.5).cast("double"))
        .withColumn("_hrz", F.floor(rf + 0.5).cast("double"))
    )
    rx, ry, rz = F.col("_hrx"), F.col("_hry"), F.col("_hrz")
    dx = F.abs(rx - qf)
    dy = F.abs(ry - yf)
    dz = F.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = (~fix_x) & (dy > dz)
    rx2 = F.when(fix_x, -ry - rz).otherwise(rx)
    df = df.withColumn("_hrx2", rx2)
    rx2 = F.col("_hrx2")
    ry2 = F.when(fix_y, -rx2 - rz).otherwise(ry)
    df = df.withColumn("_hry2", ry2)
    ry2 = F.col("_hry2")
    rz2 = F.when((~fix_x) & (~fix_y), -rx2 - ry2).otherwise(rz)
    df = df.withColumn("_hrz2", rz2)
    q = F.col("_hrx2").cast("long")
    r = F.col("_hrz2").cast("long")
    packed = F.shiftleft(q + OFF, 21).bitwiseOR(r + OFF)
    return df.withColumn(out, packed).drop(
        "_hqf", "_hrf", "_hrx", "_hry", "_hrz", "_hrx2", "_hry2", "_hrz2"
    )


def hex_q(col) -> F.Column:
    return F.shiftright(col, 21) - OFF


def hex_r(col) -> F.Column:
    return col.bitwiseAND(MASK) - OFF


# ------------------------------------------------------------- DuckDB twin


def hexbin_sql(x: str, y: str, size: float) -> str:
    """The same algebra as one DuckDB scalar subquery -> packed id.
    `x`/`y` are SQL expressions; constants injected via repr so the
    doubles are bit-identical with the numpy/Catalyst twins."""
    return f"""(
  WITH hxf AS (
    SELECT (({x}) * {C_Q!r} - ({y}) * {C_T!r}) / {size!r} AS qf,
           ({y}) * {C_R!r} / {size!r} AS rf
  ), hxr AS (
    SELECT qf, rf, -qf - rf AS yf,
           floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry,
           floor(rf + 0.5) AS rz
    FROM hxf
  ), hxd AS (
    SELECT rx, ry, rz,
           abs(rx - qf) AS dx, abs(ry - yf) AS dy, abs(rz - rf) AS dz
    FROM hxr
  ), hxq AS (
    SELECT CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS rx2,
           ry, rz, dx, dy, dz
    FROM hxd
  ), hxy AS (
    SELECT rx2,
           CASE WHEN NOT (dx > dy AND dx > dz) AND dy > dz
                THEN -rx2 - rz ELSE ry END AS ry2,
           rz, dx, dy, dz
    FROM hxq
  ), hxz AS (
    SELECT CAST(rx2 AS BIGINT) AS q,
           CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                     THEN -rx2 - ry2 ELSE rz END AS BIGINT) AS r
    FROM hxy
  )
  SELECT ((q + {OFF}) << 21) | (r + {OFF}) FROM hxz
)"""
