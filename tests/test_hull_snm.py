"""Unit guards for convex_hull_metrics / sorted_neighborhood_pairs:
the strict-vertex rule and the distributed global rank are the two
load-bearing tricks, so they get their own checks beyond the oracle
parity mirror (tests/test_oracle_parity.py runs both queries against
their DuckDB twins already).
"""

import numpy as np
import pytest

from osm2vdv462_spark.geo.kernel import convex_hull


def _brute_hull_vertices(P: np.ndarray) -> set[tuple[int, int]]:
    """Oracle-style maximal-CCW-edge scan (the DuckDB twin's rule):
    (a, b) is a hull edge iff every other point is strictly left, or
    collinear AND between the endpoints; vertices = edge starts."""
    pts = [tuple(map(int, p)) for p in np.unique(P, axis=0)]
    verts = set()
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for p in pts:
                if p in (a, b):
                    continue
                cr = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (
                    p[0] - a[0]
                )
                dt = (p[0] - a[0]) * (b[0] - a[0]) + (p[1] - a[1]) * (
                    b[1] - a[1]
                )
                ln = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                if not (cr > 0 or (cr == 0 and 0 <= dt <= ln)):
                    ok = False
                    break
            if ok:
                verts.add(a)
    return verts


@pytest.mark.parametrize("seed", range(12))
def test_strict_hull_matches_edge_oracle(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(2, 14))
    # small coordinate range forces duplicates + collinear runs
    P = rng.randint(0, 5, size=(n, 2)).astype(np.int64)
    h = convex_hull(P)
    if len(np.unique(P, axis=0)) < 2:
        return  # single distinct point: query emits nothing by rule
    got = {tuple(map(int, p)) for p in h}
    assert got == _brute_hull_vertices(P)


def test_all_collinear_keeps_endpoints_area_zero():
    P = np.array([[0, 0], [2, 2], [4, 4], [1, 1], [4, 4]], dtype=np.int64)
    h = convex_hull(P)
    assert {tuple(map(int, p)) for p in h} == {(0, 0), (4, 4)}
    x, y = h[:, 0], h[:, 1]
    assert int((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()) == 0


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_queries_invariant_to_shuffle_partitions(spark, sf_dir):
    """The SNM global rank (bucket offsets + per-bucket windows) and the
    hull kernel must not depend on physical partitioning."""
    from osm2vdv462_spark.queries.geo_queries import convex_hull_metrics
    from osm2vdv462_spark.queries.text_queries import (
        sorted_neighborhood_pairs,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        snm2 = _rows(sorted_neighborhood_pairs(spark, sf_dir))
        hull2 = _rows(convex_hull_metrics(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        snm17 = _rows(sorted_neighborhood_pairs(spark, sf_dir))
        hull17 = _rows(convex_hull_metrics(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert snm2 == snm17 and len(snm2) > 0
    assert hull2 == hull17 and len(hull2) > 0
