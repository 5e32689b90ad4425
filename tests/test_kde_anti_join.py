"""Plan-shape + small-scale value guards for the round-4 additions
kde_grid_density (no-join map-side KDE) and coverage_gap_points (the
engine's broadcast LEFT ANTI spatial join).

Value-parity vs the DuckDB oracles is covered by test_oracle_parity; these
tests pin the PHYSICAL PLAN claims the docstrings make, which the hash
gate cannot see (a silently-degraded plan would still produce exact rows).
"""

import duckdb
import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kde_plan_has_no_join_and_one_exchange(spark, sf_dir):
    from osm2vdv462_spark.queries.geo_queries import kde_grid_density

    df = kde_grid_density(spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan, plan
    # one partial-agg shuffle on the bounded 256-cell center key; the
    # AQE-inserted final plan may add a coalesce but never a second
    # hashpartitioning exchange
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, plan
    assert "HashAggregate" in plan, plan


def test_coverage_gap_is_broadcast_left_anti(spark, sf_dir):
    from osm2vdv462_spark.queries.geo_queries import coverage_gap_points

    df = coverage_gap_points(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the POINT side must never shuffle or broadcast: the only broadcast
    # build is the exploded quay-cell dim
    assert "Exchange hashpartitioning" not in plan, plan


def test_kde_weights_match_bruteforce(spark, sf_dir):
    """Exact-integer cross-check on the tiny SF: engine KDE == DuckDB
    brute-force cross join (the formulation the cell explode avoids)."""
    from osm2vdv462_spark.queries.geo_queries import (
        _KDE_ORACLE,
        kde_grid_density,
    )

    got = {
        (r["gi"], r["gj"]): (r["n_pts"], r["kde_sum"])
        for r in kde_grid_density(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = {
        (gi, gj): (n, int(s))
        for gi, gj, n, s in con.execute(_KDE_ORACLE).fetchall()
    }
    assert got == want


def test_coverage_gap_radius_boundary(spark, sf_dir):
    """A point at EXACTLY d^2 == R^2 counts as covered (<=, matching the
    NOT EXISTS oracle) — assert no gap row sits within the radius."""
    from osm2vdv462_spark.queries.geo_queries import coverage_gap_points

    rows = coverage_gap_points(spark, sf_dir).collect()
    assert rows, "tiny SF should still have uncovered points"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM '{sf_dir}/supplier.parquet'"
    )
    quays = con.execute(
        "SELECT 120 + 172 * s_suppkey, 640 + 68 * s_suppkey FROM supplier"
    ).fetchall()
    for r in rows:
        for qu, qv in quays:
            d2 = (r["u"] - qu) ** 2 + (r["v"] - qv) ** 2
            assert d2 > 22500, (r, qu, qv, d2)
