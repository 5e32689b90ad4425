"""Geohash cell index (public base32 Z-order encoding), from scratch,
closed form — no per-bit subdivision loop.

Alongside the equal-angle tile grid (operators/spatial_join.py) and the
S2-style cube-face Hilbert index (functions/s2cells.py), geohash is the
third public cell family the engine exposes, and the one with a
STRING-prefix hierarchy: the first ``p-1`` characters of a precision-p
geohash ARE the precision-(p-1) cell, so lexicographic string ranges
double as spatial ranges. That is the property that makes geohash the
natural key for engines whose pruning works on string min/max ranges
(Iceberg/parquet column stats, range-partitioned sort orders): sorting
10^12 rows by geohash clusters them spatially with zero extra columns.

Closed form instead of the textbook bisection loop: a precision-p hash
is 5p interleaved bits, even stream positions from longitude, odd from
latitude (geohash convention, lon first). So with

    xi = floor((lon + 180) / 360 * 2^nlon),  nlon = ceil(5p/2)
    yi = floor((lat +  90) / 180 * 2^nlat),  nlat = floor(5p/2)

stream bit j is bit (nlon-1 - j/2) of xi for even j and bit
(nlat-1 - (j-1)/2) of yi for odd j, and each output character packs
five stream bits through the base32 alphabet. Everything is two floors
plus shifts/masks — expressible identically in all three twins:

* ``encode_np``     — vectorized numpy (pytest reference surface);
* ``with_geohash``  — pure-Catalyst columns (whole-stage codegen, zero
                      Python: the 10^12-row path is one map-only pass);
* ``geohash_sql``   — the same arithmetic generated as a DuckDB scalar
                      expression for the driver-gate oracle.

tests/test_geohash.py checks all three bit-for-bit against an
INDEPENDENT classic bisection implementation plus the canonical public
vectors ('ezs42', 'u4pruydqqvj'), and the prefix-hierarchy property the
partitioning design relies on.

Reference parity: the reference indexes geometry with PostGIS GiST;
geohash here serves the same coarse-prefilter role as our other cell
indexes (SURVEY.md §2 J4/G-family) in the form Iceberg-style table
layouts can exploit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 60 bits < int64; beyond 12 chars (~3.7 cm) is noise


def _plan(precision: int):
    """Shared derivation for all three twins: per-character lists of
    (source, shift, weight) where source is 'x' or 'y'."""
    if not 0 < precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in 1..{MAX_PRECISION}")
    nlon = (5 * precision + 1) // 2
    nlat = (5 * precision) // 2
    chars = []
    for k in range(precision):
        terms = []
        for t in range(5):
            j = 5 * k + t
            if j % 2 == 0:
                terms.append(("x", nlon - 1 - j // 2, 1 << (4 - t)))
            else:
                terms.append(("y", nlat - 1 - (j - 1) // 2, 1 << (4 - t)))
        chars.append(terms)
    return nlon, nlat, chars


# ------------------------------------------------------------- numpy twin


def encode_np(lon_deg, lat_deg, precision: int) -> np.ndarray:
    """Vectorized geohash encode -> array of <U{precision} strings."""
    nlon, nlat, chars = _plan(precision)
    lon = np.asarray(lon_deg, np.float64)
    lat = np.asarray(lat_deg, np.float64)
    xi = np.clip(
        np.floor((lon + 180.0) / 360.0 * (1 << nlon)).astype(np.int64),
        0,
        (1 << nlon) - 1,
    )
    yi = np.clip(
        np.floor((lat + 90.0) / 180.0 * (1 << nlat)).astype(np.int64),
        0,
        (1 << nlat) - 1,
    )
    src = {"x": xi, "y": yi}
    alpha = np.array(list(ALPHABET))
    cols = []
    for terms in chars:
        c = np.zeros_like(xi)
        for s, shift, w in terms:
            c += ((src[s] >> shift) & 1) * w
        cols.append(alpha[c])
    stacked = np.ascontiguousarray(np.stack(cols, axis=-1))
    return stacked.view(f"<U{precision}").reshape(xi.shape)


# ---------------------------------------------------------- Catalyst twin


def with_geohash(
    df: DataFrame, lon: str, lat: str, precision: int, out: str = "geohash"
) -> DataFrame:
    """Pure-Catalyst twin: two floor()s into ingredient columns, then
    shift/mask character packing — map-only whole-stage codegen, no
    UDF, so indexing the full image table is a single scan."""
    nlon, nlat, chars = _plan(precision)
    clamp = lambda c, n: F.least(  # noqa: E731
        F.greatest(F.floor(c).cast("long"), F.lit(0)), F.lit(n - 1)
    )
    df = df.withColumn(
        "_ghx", clamp((F.col(lon) + 180.0) / 360.0 * (1 << nlon), 1 << nlon)
    ).withColumn(
        "_ghy", clamp((F.col(lat) + 90.0) / 180.0 * (1 << nlat), 1 << nlat)
    )
    src = {"x": F.col("_ghx"), "y": F.col("_ghy")}
    alpha = F.array(*[F.lit(ch) for ch in ALPHABET])
    parts = []
    for terms in chars:
        c = F.lit(0)
        for s, shift, w in terms:
            c = c + F.shiftright(src[s], shift).bitwiseAND(1) * w
        parts.append(F.element_at(alpha, (c + 1).cast("int")))
    return df.withColumn(out, F.concat(*parts)).drop("_ghx", "_ghy")


# ------------------------------------------------------------- DuckDB twin


def geohash_sql(lon: str, lat: str, precision: int) -> str:
    """The same closed form as one DuckDB scalar subquery (for the
    driver-gate oracle). `lon`/`lat` are SQL expressions."""
    nlon, nlat, chars = _plan(precision)
    parts = []
    for terms in chars:
        expr = " + ".join(
            f"(({'xi' if s == 'x' else 'yi'} >> {shift}) & 1) * {w}"
            for s, shift, w in terms
        )
        parts.append(f"substr('{ALPHABET}', CAST({expr} AS INTEGER) + 1, 1)")
    concat = " || ".join(parts)
    return f"""(
  WITH gh0 AS (
    SELECT
      least(greatest(CAST(floor(({lon} + 180.0) / 360.0 * {1 << nlon})
        AS BIGINT), 0), {(1 << nlon) - 1}) AS xi,
      least(greatest(CAST(floor(({lat} + 90.0) / 180.0 * {1 << nlat})
        AS BIGINT), 0), {(1 << nlat) - 1}) AS yi
  )
  SELECT {concat} FROM gh0
)"""
