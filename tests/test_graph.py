"""Triangle counting (operators/graph.py): hand-checked fixture +
randomized brute-force oracle (itertools over all node triples).
Cross-engine parity is covered by tests/test_oracle_parity.py."""

import itertools
import random

from pyspark.sql import functions as F

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


# ------------------------------------------------------------------ BFS


def _bfs_serial(pairs, seeds, max_hops):
    """Textbook queue BFS — independent of the frontier-join form."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        n = dq.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                dq.append(m)
    return dist


def _run_bfs(spark, pairs, seeds, max_hops):
    df = spark.createDataFrame(pairs, ["u", "v"])
    edges = G.canonical_edges(df, "u", "v")
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    return {
        r.node: r.hops
        for r in G.bfs_hops(edges, sdf, max_hops=max_hops).collect()
    }


def test_bfs_hand_checked(spark):
    # path 0-1-2-3-4, branch 2-7, island 8-9 (unreached)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 7), (8, 9)]
    got = _run_bfs(spark, pairs, [0], max_hops=6)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 7: 3}


def test_bfs_hop_bound_truncates(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = _run_bfs(spark, pairs, [0], max_hops=2)
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_multi_source_takes_min(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    got = _run_bfs(spark, pairs, [0, 5], max_hops=6)
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}


def test_bfs_random_vs_serial(spark):
    rng = random.Random(41)
    for trial in range(3):
        n = 60
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(120)
        ]
        seeds = sorted({rng.randrange(n) for _ in range(3)})
        # seeds must exist in the edge list domain for the query shape;
        # here pass them directly (operator takes any seed set)
        got = _run_bfs(spark, pairs, seeds, max_hops=4)
        want = _bfs_serial(pairs, seeds, 4)
        assert got == want, (trial, got, want)


# ----------------------------------------------------------------- SSSP


def _bf_serial(wedges, seeds, rounds):
    """Textbook round-synchronous Bellman-Ford DP (min cost over paths
    of <= rounds edges) — independent of the DataFrame form."""
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v, w in wedges:
        if u != v:
            adj[u].append((v, w))
            adj[v].append((u, w))
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for u, d in dist.items():
            for v, w in adj[u]:
                if v not in new or d + w < new[v]:
                    new[v] = d + w
        dist = new
    return dist


def _run_sssp(spark, wedges, seeds, rounds):
    df = spark.createDataFrame(wedges, ["u", "v", "w0"])
    edges = (
        G.canonical_edges(df, "u", "v")
        .join(
            df.selectExpr(
                "least(u, v) AS a", "greatest(u, v) AS b", "w0"
            ).groupBy("a", "b").agg({"w0": "min"}).withColumnRenamed(
                "min(w0)", "w"
            ),
            ["a", "b"],
        )
    )
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    return {
        r.node: r.dist
        for r in G.sssp_rounds(edges, sdf, rounds=rounds).collect()
    }


def test_sssp_prefers_cheap_longer_path(spark):
    # 0-1-2 costs 1+1=2 beats direct 0-2 cost 9 (needs >1 round)
    wedges = [(0, 1, 1), (1, 2, 1), (0, 2, 9)]
    assert _run_sssp(spark, wedges, [0], rounds=1) == {0: 0, 1: 1, 2: 9}
    assert _run_sssp(spark, wedges, [0], rounds=2) == {0: 0, 1: 1, 2: 2}


def test_sssp_random_vs_serial(spark):
    rng = random.Random(43)
    for trial in range(2):
        n = 40
        wedges = [
            (rng.randrange(n), rng.randrange(n), rng.randrange(1, 10))
            for _ in range(90)
        ]
        # collapse parallel edges to min weight like the operator input
        seeds = sorted({rng.randrange(n) for _ in range(2)})
        got = _run_sssp(spark, wedges, seeds, rounds=3)
        dedup = {}
        for u, v, w in wedges:
            if u == v:
                continue
            k = (min(u, v), max(u, v))
            dedup[k] = min(dedup.get(k, 99), w)
        want = _bf_serial(
            [(a, b, w) for (a, b), w in dedup.items()], seeds, 3
        )
        assert got == want, (trial, got, want)


class TestLPACommunities:
    def test_two_cliques_with_bridge(self, spark):
        """Two K4 cliques joined by one bridge edge must settle into
        two communities labeled by each clique's minimum node id; the
        bridge must NOT merge them (mode vote, unlike min-label CC)."""
        edges = [
            (a, b) for a, b in itertools.combinations(range(4), 2)
        ] + [
            (a, b) for a, b in itertools.combinations(range(10, 14), 2)
        ] + [(3, 10)]
        df = spark.createDataFrame(edges, "a bigint, b bigint")
        got = {r["node"]: r["lbl"] for r in G.lpa_rounds(df, rounds=3).collect()}
        assert {got[n] for n in range(4)} == {0}
        assert {got[n] for n in range(10, 14)} == {10}

    def test_deterministic_across_runs(self, spark):
        rng = random.Random(5)
        edges = list({
            tuple(sorted((rng.randrange(30), rng.randrange(30))))
            for _ in range(60)
        })
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a bigint, b bigint")
        r1 = sorted(map(tuple, G.lpa_rounds(df, rounds=3).collect()))
        r2 = sorted(map(tuple, G.lpa_rounds(df.repartition(7), rounds=3).collect()))
        assert r1 == r2


class TestKCore:
    def test_hand_checked_peels_tail(self, spark):
        # triangle 1-2-3 each + node 4 hanging off 1: 2-core keeps the
        # triangle (deg 2 each), drops 4; 3-core is empty.
        e = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (1, 4)], "a long, b long"
        )
        core2 = {
            (r["node"], r["core_deg"])
            for r in G.kcore_nodes(e, k=2, rounds=3).collect()
        }
        assert core2 == {(1, 2), (2, 2), (3, 2)}
        assert G.kcore_nodes(e, k=3, rounds=3).count() == 0

    def test_cascade_needs_multiple_rounds(self, spark):
        # chain 1-2-3-4-5 + triangle 5-6-7: peeling the chain cascades
        # one node per round until only the triangle survives.
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (5, 7), (6, 7)],
            "a long, b long",
        )
        got = {
            (r["node"], r["core_deg"])
            for r in G.kcore_nodes(e, k=2, rounds=6).collect()
        }
        assert got == {(5, 2), (6, 2), (7, 2)}

    def test_gate_graph_converges_within_pinned_rounds(self, spark, sf_dir):
        # the registered query pins rounds=8; assert a 9th round is a
        # no-op on the gate graph so the unrolled SQL twin is exact.
        from osm2vdv462_spark.queries.graph_queries import kcore_3core_userweb

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        pairs = ev.filter(F.col("event_id") % 3 == 0).select(
            F.pmod(F.col("user_id"), F.lit(600)).alias("u"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("kcore:"),
                                F.col("event_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % 600
            ).alias("v"),
        )
        edges = G.canonical_edges(pairs, "u", "v")
        r8 = sorted(
            (r["node"], r["core_deg"])
            for r in G.kcore_nodes(edges, k=3, rounds=8).collect()
        )
        r9 = sorted(
            (r["node"], r["core_deg"])
            for r in G.kcore_nodes(edges, k=3, rounds=9).collect()
        )
        assert r8 == r9 and len(r8) > 0


class TestHopsSigma:
    def test_known_diamond_graph(self, spark):
        # 1-2, 1-3, 2-4, 3-4, 2-3: two shortest 1->4 paths (via 2, via 3)
        from osm2vdv462_spark.operators import graph as G

        e = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 4), (3, 4), (2, 3)], "a long, b long"
        )
        got = {
            (r["src"], r["node"]): (r["hops"], r["sigma"])
            for r in G.all_pairs_hops_sigma(e, max_hops=8).collect()
        }
        assert got[(1, 4)] == (2, 2)
        assert got[(4, 1)] == (2, 2)
        assert got[(1, 2)] == (1, 1)
        assert got[(2, 3)] == (1, 1)
        assert all(s == 1 for (a, b), (h, s) in got.items() if a == b)


class TestHallKonigReferee:
    def test_matches_augmenting_path_matching(self, spark, sf_dir):
        """The König-via-deficiency matching size must equal an
        independent augmenting-path maximum matching on every graph."""
        import hashlib

        from osm2vdv462_spark.queries.graph_queries import (
            hall_konig_matching,
        )

        def adj_masks(g):
            out = []
            for v in range(8):
                mask = 0
                for u in range(8):
                    h = hashlib.md5(f"hl:{g}:{v}:{u}".encode()).hexdigest()
                    if int(h[:4], 16) % 3 == 0:
                        mask |= 1 << u
                out.append(mask)
            return out

        def max_matching(adj):
            match_r = {}

            def aug(v, seen):
                for u in range(8):
                    if (adj[v] >> u) & 1 and u not in seen:
                        seen.add(u)
                        if u not in match_r or aug(match_r[u], seen):
                            match_r[u] = v
                            return True
                return False

            return sum(1 for v in range(8) if aug(v, set()))

        rows = hall_konig_matching(spark, sf_dir).collect()
        assert len(rows) == 40
        sizes = set()
        for r in rows:
            assert r["matching_size"] == max_matching(adj_masks(r["g"])), r
            sizes.add(r["matching_size"])
        assert len(sizes) > 1  # deficiencies genuinely occur


class TestGameOfLifeReferee:
    def test_matches_brute_replay(self, spark, sf_dir):
        """Brute-force Python Life must reproduce every grid's gen-8
        population and checksum; the glider fixture must land exactly
        (+2,+2) from its start."""
        import hashlib

        from osm2vdv462_spark.queries.graph_queries import (
            game_of_life_rounds,
        )

        def step(cells):
            from collections import Counter

            cnt = Counter()
            for r, c in cells:
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        if (dr, dc) != (0, 0):
                            cnt[((r + dr) % 16, (c + dc) % 16)] += 1
            return {
                p
                for p, n in cnt.items()
                if n == 3 or (n == 2 and p in cells)
            }

        rows = game_of_life_rounds(spark, sf_dir).collect()
        got = {(r["g"], r["gen"]): (r["population"], r["checksum"])
               for r in rows}
        gs = sorted({r["g"] for r in rows})
        fixtures = {
            -1: {(1, 2), (2, 3), (3, 1), (3, 2), (3, 3)},
            -2: {(7, 6), (7, 7), (7, 8)},
            -3: {(10, 10), (10, 11), (11, 10), (11, 11)},
        }
        for g in gs:
            if g in fixtures:
                cells = set(fixtures[g])
            else:
                cells = {
                    (r, c)
                    for r in range(16)
                    for c in range(16)
                    if int(
                        hashlib.md5(
                            f"lf:{g}:{r}:{c}".encode()
                        ).hexdigest()[:4],
                        16,
                    )
                    % 100
                    < 35
                }
            chk0 = sum(r * 1000 + c + 1 for r, c in cells)
            assert got[(g, 0)] == (len(cells), chk0), g
            for _ in range(8):
                cells = step(cells)
            chk8 = sum(r * 1000 + c + 1 for r, c in cells)
            assert got[(g, 8)] == (len(cells), chk8), g
        glider8 = {((r + 2) % 16, (c + 2) % 16) for r, c in fixtures[-1]}
        assert got[(-1, 8)] == (
            5,
            sum(r * 1000 + c + 1 for r, c in glider8),
        )
        assert got[(-2, 8)] == got[(-2, 0)]  # blinker period 2
        assert got[(-3, 8)] == got[(-3, 0)]  # block still life


class TestDominatorReferee:
    def test_matches_dataflow_solver(self, spark, sf_dir):
        """The removal-definition dominators must agree with the
        classic iterative set-intersection dataflow solver on every
        CFG, including the diamond fixture's idom(4) = 1."""
        import hashlib

        from osm2vdv462_spark.queries.graph_queries import dominator_tree

        def build(g):
            if g == -1:
                return 5, {(0, 1), (1, 2), (1, 3), (2, 4), (3, 4)}
            edges = {(i, i + 1) for i in range(11)}
            for k in range(6):
                u = int(
                    hashlib.md5(f"du:{g}:{k}".encode()).hexdigest()[:4], 16
                ) % 12
                v = int(
                    hashlib.md5(f"dv:{g}:{k}".encode()).hexdigest()[:4], 16
                ) % 12
                if u != v:
                    edges.add((u, v))
            return 12, edges

        def dataflow(n, edges):
            preds = {v: {u for (u, w) in edges if w == v} for v in range(n)}
            dom = {0: {0}}
            for v in range(1, n):
                dom[v] = set(range(n))
            changed = True
            while changed:
                changed = False
                for v in range(1, n):
                    ps = [dom[p] for p in preds[v] if p in dom]
                    new = (
                        set.intersection(*ps) | {v}
                        if ps
                        else set(range(n))
                    )
                    if new != dom[v]:
                        dom[v] = new
                        changed = True
            return dom

        rows = dominator_tree(spark, sf_dir).collect()
        by_g = {}
        for r in rows:
            by_g.setdefault(r["g"], {})[r["v"]] = (
                r["idom"], r["n_dominators"]
            )
        assert by_g[-1][4][0] == 1
        for g, got in by_g.items():
            n, edges = build(g)
            dom = dataflow(n, edges)
            reach = {v for v in range(1, n) if len(dom[v]) < n}
            for v in reach:
                idom = max(
                    (d for d in dom[v] if d != v),
                    key=lambda d: len(dom[d]),
                )
                assert got[v] == (idom, len(dom[v])), (g, v)
