"""Triangle counting (operators/graph.py): hand-checked fixture +
randomized brute-force oracle (itertools over all node triples).
Cross-engine parity is covered by tests/test_oracle_parity.py."""

import itertools
import random

from osm2vdv462_spark.operators import graph as G


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, ["u", "v"])
    edges = G.canonical_edges(df, "u", "v")
    return {r.node: r.tri_cnt for r in G.triangle_counts(edges).collect()}


def test_triangles_hand_checked(spark):
    # K4 on {0,1,2,3} (4 triangles, each node in 3) + a pendant edge +
    # an isolated edge + a duplicate/reversed/self-loop to exercise
    # canonicalization
    pairs = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (2, 1),  # reversed duplicate
        (3, 3),  # self loop
        (3, 4),  # pendant: node 4 in no triangle
        (7, 8),  # isolated edge
    ]
    got = _run(spark, pairs)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_random_vs_bruteforce(spark):
    rng = random.Random(42)
    nodes = list(range(24))
    edges = set()
    for _ in range(90):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    got = _run(spark, [list(e) for e in edges])
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in edges and (y, z) in edges and (x, z) in edges:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want
