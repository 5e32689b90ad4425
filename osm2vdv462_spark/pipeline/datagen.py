"""Deterministic synthetic geo layers derived from the driver's parquet
tables (TESTDATA.md) — no external data, no RNG state.

Two families:

1. **Oracle-checkable layers** (this module): geotagged points from
   ``events``, stop-area octagon polygons from ``nation``, quay sites from
   ``supplier``. Every derivation is simple integer/float arithmetic so a
   DuckDB SQL oracle can reproduce it bit-for-bit; the Spark side runs the
   REAL engine operators (cell index + exact kernel) against those shapes.

2. **OSM-world fixtures** (``synth_world``): richer layered world
   (platforms with multi-IFOPT, touching edges, entrances, ...) mirroring
   the reference's example extracts (/root/reference/example_data/) for
   the stop-places pipeline tests, checked against brute-force oracles in
   pytest rather than SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..geo import wkb as _wkb
from ..sources import tinyparquet

# ---- geotagged points from `events` --------------------------------------
# lon/lat in [-0.25, 0.25): pure integer LCG on event_id, identical in
# Spark SQL and DuckDB SQL (all intermediates < 2^31, no float ambiguity
# beyond IEEE-exact small-integer division).

SQL_POINTS = """
SELECT
  event_id,
  -0.25 + (((event_id * 37 + 11) % 2000) / 4000.0) AS lon,
  -0.25 + (((event_id * 73 + 29) % 2000) / 4000.0) AS lat
FROM events
"""


def geo_points(spark: SparkSession, sf_dir: str, keep: tuple = ()) -> DataFrame:
    """Geotag per event via the oracle LCG; ``keep`` carries extra event
    columns (e.g. user_id/ts for trajectory queries) through unchanged."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        (F.lit(-0.25) + ((F.col("event_id") * 37 + 11) % 2000) / 4000.0).alias("lon"),
        (F.lit(-0.25) + ((F.col("event_id") * 73 + 29) % 2000) / 4000.0).alias("lat"),
        *keep,
    )


# ---- stop-area octagons from `nation` -------------------------------------
# 25 nations -> 5x5 grid of octagons (intersection of a box and a diamond:
# |dx|<=A, |dy|<=A, |dx|+|dy|<=B). Non-rectangular, so the generic ray-cast
# PIP is genuinely exercised, while the SQL oracle stays exact algebra.

OCT_A = 0.0299
OCT_B = 0.0451
GRID_STEP = 0.1
GRID_LON0 = -0.2
GRID_LAT0 = -0.2

SQL_OCTAGON_PRED = (
    "abs(p.lon - ({cx})) < {A} AND abs(p.lat - ({cy})) < {A} "
    "AND abs(p.lon - ({cx})) + abs(p.lat - ({cy})) < {B}"
)

SQL_OCTAGONS_JOIN = f"""
JOIN nation n ON
  abs(p.lon - (-0.2 + 0.1 * (n.n_nationkey % 5))) < {OCT_A}
  AND abs(p.lat - (-0.2 + 0.1 * (n.n_nationkey // 5))) < {OCT_A}
  AND abs(p.lon - (-0.2 + 0.1 * (n.n_nationkey % 5)))
    + abs(p.lat - (-0.2 + 0.1 * (n.n_nationkey // 5))) < {OCT_B}
"""


def _octagon_ring(cx: float, cy: float, a: float = OCT_A, b: float = OCT_B) -> np.ndarray:
    c = b - a  # corner cut
    ring = np.array(
        [
            [cx - c, cy - a],
            [cx + c, cy - a],
            [cx + a, cy - c],
            [cx + a, cy + c],
            [cx + c, cy + a],
            [cx - c, cy + a],
            [cx - a, cy + c],
            [cx - a, cy - c],
            [cx - c, cy - a],
        ]
    )
    return ring


def stop_area_octagons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One octagonal 'stop area' polygon per nation row (WKB)."""
    # dimension-sized input: read the key column straight off the parquet
    # footer/pages on the driver (sources/tinyparquet) — the Spark
    # collect of 25 ints was a fixed ~0.2 s job per broadcast-operator
    # call (guide §1.2). Falls back to the normal collect for anything
    # outside the tiny-reader's scope (directory outputs, other codecs).
    keys = tinyparquet.read_int_column(
        f"{sf_dir}/nation.parquet", "n_nationkey"
    )
    if keys is None or any(k is None for k in keys):
        from ..operators._guard import collect_dim

        keys = [
            r["n_nationkey"]
            for r in collect_dim(
                spark.read.parquet(f"{sf_dir}/nation.parquet").select(
                    "n_nationkey"
                ),
                "stop_area_octagons nation dim",
            )
        ]
    rows = []
    for key in keys:
        cx = GRID_LON0 + GRID_STEP * (key % 5)
        cy = GRID_LAT0 + GRID_STEP * (key // 5)
        rows.append((int(key), bytearray(_wkb.encode_polygon([_octagon_ring(cx, cy)]))))
    df = spark.createDataFrame(rows, "relation_id int, geom binary")
    # the rows already live on the driver — let broadcast operators skip
    # the redundant collect job (operators/_guard.collect_dim_cols)
    df._graft_dim_rows = rows
    return df


# ---- quay sites from `supplier` -------------------------------------------

# Quay positions wrap on a 2-D torus with coprime moduli (997, 983):
# the pre-r5 open line (-0.22 + 0.043*k) walked past lon 180 once
# supplier count reached sf1 scale (10k keys -> lon 429), and the cell
# grid's clamp stacked thousands of collinear quays into edge cells —
# K (max per-cell kNN candidates) hit 2071 and the bounded codegen
# operator correctly refused (BENCH/sf1_round5.json, round-5 first
# pass). Coprime moduli keep every (lon, lat) pair distinct below
# lcm(997, 983) ~= 980k keys, so density stays O(per-cell-bounded) at
# any tested sf. Keys <= 983 are BIT-IDENTICAL to the old formula
# (same double products), so sf0.001 / sf0.01 oracle hashes — the
# driver gate — are unchanged.

SQL_QUAYS = """
SELECT
  s_suppkey AS quay_id,
  -0.22 + 0.043 * (s_suppkey % 997) AS lon,
  -0.09 + 0.017 * (s_suppkey % 983) AS lat
FROM supplier
"""


def quay_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    df = sup.select(
        F.col("s_suppkey").alias("quay_id"),
        (F.lit(-0.22) + 0.043 * (F.col("s_suppkey") % 997)).alias("lon"),
        (F.lit(-0.09) + 0.017 * (F.col("s_suppkey") % 983)).alias("lat"),
    )
    # zero-job fast path for broadcast-operator collects: the quay
    # formula is closed-form double arithmetic over s_suppkey, and both
    # IEEE-754 ops (int->double exact, one mul, one add) are correctly
    # rounded in JVM and CPython alike, so the driver-computed rows are
    # BIT-identical to a Spark collect of the frame (pinned in
    # tests/test_tinyparquet.py). Out-of-scope parquet -> no attach ->
    # operators collect normally.
    keys = tinyparquet.read_int_column(
        f"{sf_dir}/supplier.parquet", "s_suppkey"
    )
    if keys is not None and not any(k is None for k in keys):
        df._graft_dim_rows = [
            (k, -0.22 + 0.043 * (k % 997), -0.09 + 0.017 * (k % 983))
            for k in keys
        ]
    return df


# ---- edge segments from `nation` ------------------------------------------
# 25 short segments with varied (integer-derived, trig-free) directions
# anchored at the octagon grid centers — the linear-referencing layer
# (snap/ST_ClosestPoint queries). Quays are deliberately NOT used: the
# quay formula is collinear, which would degenerate nearest-segment
# ties.

SQL_EDGE_SEGMENTS = """
SELECT
  n_nationkey AS edge_id,
  CAST(-0.2 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (n_nationkey % 5) AS ax,
  CAST(-0.2 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (n_nationkey // 5) AS ay,
  CAST(-0.2 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (n_nationkey % 5)
    + CAST(0.017 AS DOUBLE) * ((n_nationkey * 7) % 5 - 2) AS bx,
  CAST(-0.2 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (n_nationkey // 5)
    + CAST(0.013 AS DOUBLE) * ((n_nationkey * 3) % 7 - 3) AS by
FROM nation
"""


def edge_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    ax = F.lit(-0.2) + 0.1 * (k % 5)
    ay = F.lit(-0.2) + 0.1 * F.floor(k / 5)
    return nat.select(
        k.alias("edge_id"),
        ax.alias("ax"),
        ay.alias("ay"),
        (ax + 0.017 * ((k * 7) % 5 - 2)).alias("bx"),
        (ay + 0.013 * ((k * 3) % 7 - 3)).alias("by"),
    )
