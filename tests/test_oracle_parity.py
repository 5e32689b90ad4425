"""Mimic the driver's correctness gate locally: run every registered query
on Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive values (sorted by all columns).
"""

import math

import duckdb
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def all_cases():
    from osm2vdv462_spark import queries as q

    # both tiers: the driver gate runs the main REGISTRY (<= GATE_BUDGET
    # rows); the extra tier (physical variants / derivative reports) is
    # held to the same oracle standard here
    qs = {**q.queries(), **q.extra_queries()}
    os_ = {**q.oracle_sql(), **q.extra_oracle_sql()}
    return [(name, qs[name], os_.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,oracle", all_cases(), ids=[c[0] for c in all_cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, oracle):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if oracle is None:
        assert len(srows) >= 0  # rows-only check (driver does the same)
        return
    con = _duck(sf_dir)
    res = con.sql(oracle)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sc, dc = _canon(srows, scols), _canon(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:5]
    assert sc == dc, f"{name}: first mismatches {[(sc[i], dc[i]) for i in mism]}"


def test_registry_exactly_fills_the_gate_budget():
    """The driver runs the first GATE_BUDGET registered queries
    (CORRECTNESS_r02: exactly 50 of 55). The main tier must fill the
    budget exactly — fewer wastes gate rows, more silently drops the
    tail (queries() truncates rather than raising)."""
    from osm2vdv462_spark import queries as q

    assert len(q.queries()) == q.GATE_BUDGET
    q._load_all()
    assert len(q.REGISTRY) == q.GATE_BUDGET, sorted(q.REGISTRY)[q.GATE_BUDGET:]
    # every main-tier query has a SQL oracle — zero rows-only checks
    assert sorted(q.oracle_sql()) == sorted(q.queries())
