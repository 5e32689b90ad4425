"""S2-style cube-face Hilbert cell index, from scratch.

The BASELINE.json north rule names "H3/S2 cell-indexed" joins. The
engine's existing cell index (`operators/spatial_join.py` grid,
`tile_pyramid`) is an equal-angle lon/lat grid — simple and
oracle-friendly, but its cells degenerate toward the poles and its
row-major key has poor locality for range partitioning. This module
adds the index family the rule names, built only from the PUBLIC S2
geometry design (cube-face decomposition + quadratic s/t projection +
per-face Hilbert space-filling curve, as published in the S2 docs and
papers):

* lon/lat -> unit-sphere xyz -> one of 6 CUBE FACES (bounded area
  distortion everywhere on the globe, unlike lon/lat tiles), face
  (u,v) in [-1,1]^2;
* the published QUADRATIC s/t transform (s = sqrt(1+3u)/2 for u>=0,
  mirrored below) that equalizes cell areas within a face;
* a HILBERT curve over the face's (i,j) grid at `level` (2 bits per
  level), so numerically close cell ids are geographically close —
  the property that makes range-partitioning / Z-order-style file
  clustering work on a single integer key;
* cell id layout: [face:3][hilbert position:2*level] packed into a
  non-negative int64; the parent of a cell at level L+1 is its id >> 2
  (hierarchical rollup = integer shifts, the tile-pyramid recurrence).

Parity note: this follows the S2 *construction*, not the Google S2
library's exact bit conventions (which this sandbox cannot test
against); ids are self-consistent across the three twin
implementations here — vectorized numpy (`cell_ids`), pure-Catalyst
whole-stage-codegen expressions (`with_s2_cell`), and a generated
DuckDB SQL expression (`s2_sql`) used by the driver-gate oracle — and
the hierarchy/locality properties are what the partitioning design
needs. The Hilbert state machine is the classic Hamilton/Warren
xy2d formulation (public), unrolled per level in all three twins.

Scale shape: `with_s2_cell` is pure column arithmetic — no UDF, no
shuffle, whole-stage codegen — so indexing 10^12 rows is a map-only
pass; the per-level unroll materializes ingredient columns instead of
one giant nested expression (janino-method-size discipline, see
CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

MAX_LEVEL = 15  # 2 bits/level + 3 face bits = 33 bits at 15 — plenty
# beyond the ~9.6 m cells of level 15; raise if ever needed (int64
# holds level 30, the SQL/Catalyst unrolls are generated per level)


# ------------------------------------------------------------- numpy twin


def _face_uv(lon_deg, lat_deg):
    """(face, u, v): cube face by the dominant |coordinate| axis, and
    the two remaining coordinates scaled onto that face."""
    lon = np.radians(np.asarray(lon_deg, np.float64))
    lat = np.radians(np.asarray(lat_deg, np.float64))
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # face 0/3: +/-x major; 1/4: +/-y; 2/5: +/-z  (sign picks the back face)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    )
    major = np.where(face % 3 == 0, x, np.where(face % 3 == 1, y, z))
    u_raw = np.where(face % 3 == 0, y, np.where(face % 3 == 1, z, x))
    v_raw = np.where(face % 3 == 0, z, np.where(face % 3 == 1, x, y))
    return face, u_raw / major, v_raw / major


def _st(u):
    """Published S2 quadratic projection: equal-area-ish s in [0,1].
    (np.maximum keeps the unselected np.where branch from evaluating
    sqrt of a negative and warning — u is always in [-1, 1].)"""
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _hilbert_d(i, j, level):
    """Classic xy2d Hilbert index of cell (i, j) on a 2^level grid
    (Hamilton/Warren formulation, public), vectorized."""
    i = i.astype(np.int64).copy()
    j = j.astype(np.int64).copy()
    d = np.zeros_like(i)
    n = np.int64(1) << level
    s = np.int64(1) << (level - 1)
    while s > 0:
        ri = ((i & s) > 0).astype(np.int64)
        rj = ((j & s) > 0).astype(np.int64)
        d += s * s * ((3 * ri) ^ rj)
        # rotate quadrant (canonical full-grid n-1 reflection: values
        # stay in [0, n-1]; bits below s — the only ones still read —
        # are complemented exactly)
        swap = rj == 0
        flip = swap & (ri == 1)
        i_f, j_f = i.copy(), j.copy()
        i = np.where(flip, n - 1 - i_f, i_f)
        j = np.where(flip, n - 1 - j_f, j_f)
        i2 = np.where(swap, j, i)
        j2 = np.where(swap, i, j)
        i, j = i2, j2
        s >>= 1
    return d


def cell_ids(lon_deg, lat_deg, level: int) -> np.ndarray:
    """Vectorized point -> cell id: [face:3][hilbert:2*level] int64."""
    if not 0 < level <= MAX_LEVEL:
        raise ValueError(f"level must be in 1..{MAX_LEVEL}")
    face, u, v = _face_uv(lon_deg, lat_deg)
    n = np.int64(1) << level
    i = np.clip((_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_st(v) * n).astype(np.int64), 0, n - 1)
    return (face.astype(np.int64) << (2 * level)) | _hilbert_d(i, j, level)


# ---------------------------------------------------------- Catalyst twin


def with_s2_cell(
    df: DataFrame, lon: str, lat: str, level: int, out: str = "s2_cell"
) -> DataFrame:
    """Pure-Catalyst twin of `cell_ids` (no UDF — a map-only
    whole-stage-codegen pass). The Hilbert loop unrolls into per-level
    ingredient COLUMNS (i/j/d evolve across `level` withColumns) so no
    single generated method explodes."""
    if not 0 < level <= MAX_LEVEL:
        raise ValueError(f"level must be in 1..{MAX_LEVEL}")
    lonr, latr = F.radians(F.col(lon)), F.radians(F.col(lat))
    x = F.cos(latr) * F.cos(lonr)
    y = F.cos(latr) * F.sin(lonr)
    z = F.sin(latr)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, 0).otherwise(3))
        .when(ay >= az, F.when(y >= 0, 1).otherwise(4))
        .otherwise(F.when(z >= 0, 2).otherwise(5))
    )
    m = face % 3
    major = F.when(m == 0, x).when(m == 1, y).otherwise(z)
    u = F.when(m == 0, y).when(m == 1, z).otherwise(x) / major
    v = F.when(m == 0, z).when(m == 1, x).otherwise(y) / major

    def st(c: Column) -> Column:
        return F.when(c >= 0, F.sqrt(c * 3.0 + 1.0) * 0.5).otherwise(
            F.lit(1.0) - F.sqrt(F.lit(1.0) - c * 3.0) * 0.5
        )

    n = 1 << level
    clamp = lambda c: F.least(  # noqa: E731
        F.greatest(F.floor(c).cast("long"), F.lit(0)), F.lit(n - 1)
    )
    df = (
        df.withColumn("_s2f", face.cast("long"))
        .withColumn("_s2i", clamp(st(u) * n))
        .withColumn("_s2j", clamp(st(v) * n))
        .withColumn("_s2d", F.lit(0).cast("long"))
    )
    i, j, d = F.col("_s2i"), F.col("_s2j"), F.col("_s2d")
    for s_exp in range(level - 1, -1, -1):
        s = 1 << s_exp
        ri = F.when(i.bitwiseAND(s) > 0, 1).otherwise(0).cast("long")
        rj = F.when(j.bitwiseAND(s) > 0, 1).otherwise(0).cast("long")
        d_new = d + F.lit(s * s) * (ri * 3).bitwiseXOR(rj)
        flip = (rj == 0) & (ri == 1)
        i_r = F.when(flip, F.lit(n - 1) - i).otherwise(i)
        j_r = F.when(flip, F.lit(n - 1) - j).otherwise(j)
        i_new = F.when(rj == 0, j_r).otherwise(i_r)
        j_new = F.when(rj == 0, i_r).otherwise(j_r)
        df = (
            df.withColumn("_s2d", d_new)
            .withColumn("_s2i2", i_new)
            .withColumn("_s2j2", j_new)
            .withColumn("_s2i", F.col("_s2i2"))
            .withColumn("_s2j", F.col("_s2j2"))
            .drop("_s2i2", "_s2j2")
        )
        i, j, d = F.col("_s2i"), F.col("_s2j"), F.col("_s2d")
    return df.withColumn(
        out, F.shiftleft(F.col("_s2f"), 2 * level) + F.col("_s2d")
    ).drop("_s2f", "_s2i", "_s2j", "_s2d")


# ------------------------------------------------------------- DuckDB twin


def s2_sql(lon: str, lat: str, level: int) -> str:
    """One SQL scalar expression computing the SAME cell id in DuckDB
    (for the driver-gate oracle): the Hilbert unroll is generated as
    nested LATERAL-free CTE-less arithmetic via a chain of named
    subexpression columns — callers embed it as
    ``SELECT ..., {s2_sql('lon','lat',8)} AS cell FROM t``.
    Returns a correlated scalar subquery string (self-contained)."""
    if not 0 < level <= MAX_LEVEL:
        raise ValueError(f"level must be in 1..{MAX_LEVEL}")
    n = 1 << level
    steps = []
    for k, s_exp in enumerate(range(level - 1, -1, -1)):
        s = 1 << s_exp
        p = f"h{k}"  # previous state alias
        q = f"h{k + 1}"
        steps.append(
            f"{q} AS (SELECT"
            f" d + {s * s} * xor(3 * (CASE WHEN (i & {s}) > 0 THEN 1 ELSE 0 END),"
            f" CASE WHEN (j & {s}) > 0 THEN 1 ELSE 0 END) AS d,"
            f" CASE WHEN (j & {s}) = 0 THEN"
            f"   CASE WHEN (i & {s}) > 0 THEN {n - 1} - j ELSE j END"
            f" ELSE i END AS i,"
            f" CASE WHEN (j & {s}) = 0 THEN"
            f"   CASE WHEN (i & {s}) > 0 THEN {n - 1} - i ELSE i END"
            f" ELSE j END AS j,"
            f" f FROM {p})"
        )
    chain = ", ".join(steps)
    return f"""(
  WITH pt AS (
    SELECT radians({lon}) AS lo, radians({lat}) AS la
  ), xyz AS (
    SELECT cos(la)*cos(lo) AS x, cos(la)*sin(lo) AS y, sin(la) AS z
    FROM pt
  ), fc AS (
    SELECT x, y, z,
      CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
             THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END
           WHEN abs(y) >= abs(z)
             THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END
           ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS f
    FROM xyz
  ), uv AS (
    SELECT f,
      (CASE WHEN f % 3 = 0 THEN y WHEN f % 3 = 1 THEN z ELSE x END)
      / (CASE WHEN f % 3 = 0 THEN x WHEN f % 3 = 1 THEN y ELSE z END) AS u,
      (CASE WHEN f % 3 = 0 THEN z WHEN f % 3 = 1 THEN x ELSE y END)
      / (CASE WHEN f % 3 = 0 THEN x WHEN f % 3 = 1 THEN y ELSE z END) AS v
    FROM fc
  ), h0 AS (
    SELECT f, CAST(0 AS BIGINT) AS d,
      least(greatest(CAST(floor(
        (CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) ELSE 1-0.5*sqrt(1-3*u) END)
        * {n}) AS BIGINT), 0), {n - 1}) AS i,
      least(greatest(CAST(floor(
        (CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) ELSE 1-0.5*sqrt(1-3*v) END)
        * {n}) AS BIGINT), 0), {n - 1}) AS j
    FROM uv
  ), {chain}
  SELECT (f << {2 * level}) | d FROM h{level}
)"""
