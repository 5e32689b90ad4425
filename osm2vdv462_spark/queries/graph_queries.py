"""Graph-analytics queries (operators/graph.py): triangle counting.

The Spark side runs the degree-ordered-orientation algorithm (skew-
bounded, each triangle generated exactly once); the DuckDB oracle is
the INDEPENDENT naive formulation — a 3-way self-join with a < b < c
canonical ordering — so the two derivations cross-check each other,
not just the arithmetic. Same md5-derived deterministic event graph
discipline as pagerank_userweb (no external data, per the brief).

Main gate row (late-r4 rotation, fourth swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import graph as G
from . import register, register_extra


@register(
    "triangle_counts_userweb",
    """
    WITH d0 AS (
      SELECT DISTINCT user_id % 400 AS u,
             ('0x' || substr(md5('tri:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 400 AS v
      FROM events
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    n AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, count(*) AS tri_cnt FROM n GROUP BY 1 ORDER BY node
    """,
)
def triangle_counts_userweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the md5-derived event
    interaction graph. Spark runs degree-ordered orientation (max
    out-degree O(sqrt(m)) whatever the degree skew — see
    operators/graph.py); the oracle counts the same triangles with the
    textbook a<b<c 3-way join."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.pmod(F.col("user_id"), F.lit(400)).alias("u"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("tri:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 400
        ).alias("v"),
    )
    edges = G.canonical_edges(pairs, "u", "v")
    return G.triangle_counts(edges).orderBy("node")


@register_extra(
    "bfs_hops_userweb",
    """
    WITH RECURSIVE d0 AS (
      SELECT DISTINCT user_id % 300 AS u,
             ('0x' || substr(md5('bfs:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 300 AS v
      FROM events
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    sym AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
    seeds AS (SELECT DISTINCT s AS node FROM sym WHERE s % 50 = 0),
    walk(node, hop) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT sym.d, w.hop + 1
      FROM walk w JOIN sym ON sym.s = w.node
      WHERE w.hop < 6
    )
    SELECT node, CAST(min(hop) AS INT) AS hops
    FROM walk GROUP BY 1 ORDER BY node
    """,
)
def bfs_hops_userweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (min hops from any seed, bound 6) over the
    md5-derived interaction graph — the traversal member of the graph
    family next to triangles / PageRank / connected components. Spark
    runs the Pregel frontier loop (operators/graph.py::bfs_hops: per
    level one frontier-edge equi-join + one visited anti-join, lineage
    cut per level); the oracle is an independent WITH RECURSIVE
    reachability closure with min-hop aggregation. Integer hops, so
    the hash is exact with no float discipline needed."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.pmod(F.col("user_id"), F.lit(300)).alias("u"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bfs:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 300
        ).alias("v"),
    )
    edges = G.canonical_edges(pairs, "u", "v")
    seeds = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .filter(F.col("node") % 50 == 0)
        .distinct()
    )
    out = G.bfs_hops(edges, seeds, max_hops=6)
    return out.select("node", F.col("hops").cast("int").alias("hops")).orderBy(
        "node"
    )


def _sssp_iter_sql(prev: str, nxt: str) -> str:
    return f"""{nxt} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT sym.d AS node, p.dist + sym.w AS dist
        FROM {prev} p JOIN sym ON sym.s = p.node
      ) GROUP BY node
    )"""


@register_extra(
    "sssp_rounds_userweb",
    """
    WITH d0 AS (
      SELECT DISTINCT user_id % 300 AS u,
             ('0x' || substr(md5('sssp:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 300 AS v
      FROM events
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    w AS (
      SELECT a, b,
             CAST(1 + ('0x' || substr(md5('w:' || CAST(a AS VARCHAR) || ':'
                       || CAST(b AS VARCHAR)), 1, 7))::BIGINT % 9 AS BIGINT)
               AS w
      FROM e
    ),
    sym AS (SELECT a AS s, b AS d, w FROM w
            UNION ALL SELECT b, a, w FROM w),
    seeds AS (SELECT DISTINCT s AS node FROM sym WHERE s % 60 = 0),
    r0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
    """
    + ",".join(
        _sssp_iter_sql(p, o)
        for p, o in [("r0", "i1"), ("i1", "i2"), ("i2", "i3"), ("i3", "i4")]
    )
    + """
    SELECT node, dist FROM i4 ORDER BY node
    """,
)
def sssp_rounds_userweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford single-source-shortest-path (4 relax
    rounds, md5-derived integer weights 1..9) over the interaction
    graph — the weighted companion to bfs_hops_userweb. Spark iterates
    the tentative-distance table (operators/graph.py::sssp_rounds);
    the oracle unrolls the same four relaxations as CTEs, the pagerank
    discipline. Integer distances: the hash is exact by construction."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.pmod(F.col("user_id"), F.lit(300)).alias("u"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("sssp:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 300
        ).alias("v"),
    )
    edges = G.canonical_edges(pairs, "u", "v").withColumn(
        "w",
        (
            F.lit(1)
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("w:"),
                            F.col("a").cast("string"),
                            F.lit(":"),
                            F.col("b").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 9
        ).cast("long"),
    )
    seeds = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .filter(F.col("node") % 60 == 0)
        .distinct()
    )
    return (
        G.sssp_rounds(edges, seeds, rounds=4)
        .orderBy("node")
    )


def _lpa_iter_sql(prev: str, vout: str, lout: str) -> str:
    return f"""
    {vout} AS (
      SELECT ed.node, l.lbl, count(*) AS c
      FROM ed JOIN {prev} l ON l.node = ed.nbr
      GROUP BY ed.node, l.lbl
    ),
    {lout} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl)
                 AS rn
        FROM {vout}
      ) WHERE rn = 1
    )"""


# synchronous LPA with the smallest-label tie-break: deterministic
# under retries and across engines (async LPA is arrival-order
# dependent — the wrong variant for a distributed engine). The oracle
# unrolls the same three mode-vote rounds as CTEs.
@register_extra(
    "lpa_communities",
    """
    WITH d0 AS (
      SELECT DISTINCT user_id % 200 AS u,
             ('0x' || substr(md5('lpa:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 200 AS v
      FROM events
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    ed AS (SELECT a AS node, b AS nbr FROM e
           UNION ALL SELECT b, a FROM e),
    l0 AS (SELECT DISTINCT node, node AS lbl FROM ed),
    """
    + ",".join(
        _lpa_iter_sql(p, v, o)
        for p, v, o in [("l0", "v1", "l1"), ("l1", "v2", "l2"), ("l2", "v3", "l3")]
    )
    + """
    SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community
    FROM l3 ORDER BY node
    """,
)
def lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round synchronous label-propagation communities over the
    md5-derived event interaction graph (operators/graph.py::
    lpa_rounds) — the scalable community detector next to the
    min-label connected components (dedup_clusters): mode votes find
    DENSE groups, not just reachable ones. Every round is one
    edge-sized join + one node-sized window pick; no driver graph."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.pmod(F.col("user_id"), F.lit(200)).alias("u"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lpa:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 200
        ).alias("v"),
    )
    edges = G.canonical_edges(pairs, "u", "v")
    return (
        G.lpa_rounds(edges, rounds=3)
        .select(
            F.col("node").cast("bigint").alias("node"),
            F.col("lbl").cast("bigint").alias("community"),
        )
        .orderBy("node")
    )


def _kcore_iter_sql(prev: str, deg: str, nxt: str, k: int) -> str:
    # AS MATERIALIZED is load-bearing: each round references the
    # previous edge set 3x, so letting DuckDB inline the CTEs would
    # expand the 8-round chain into 3^8 scans of events.
    return f"""
    {deg} AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
      ) GROUP BY node
    ),
    {nxt} AS MATERIALIZED (
      SELECT e.a, e.b FROM {prev} e
      JOIN {deg} da ON da.node = e.a AND da.d >= {k}
      JOIN {deg} db ON db.node = e.b AND db.d >= {k}
    )"""


# 3-core by synchronous peeling, unrolled to 8 rounds (the gated
# graphs converge in <= 6 at every test sf; tests assert 8 == 9).
@register_extra(
    "kcore_3core_userweb",
    """
    WITH d0 AS (
      SELECT DISTINCT user_id % 600 AS u,
             ('0x' || substr(md5('kcore:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 600 AS v
      FROM events WHERE event_id % 3 = 0
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    """
    + ",".join(
        _kcore_iter_sql(f"e{i}", f"g{i + 1}", f"e{i + 1}", 3)
        for i in range(8)
    )
    + """
    SELECT CAST(node AS BIGINT) AS node, count(*) AS core_deg FROM (
      SELECT a AS node FROM e8 UNION ALL SELECT b FROM e8
    ) GROUP BY node ORDER BY node
    """,
)
def kcore_3core_userweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the md5-derived event interaction graph
    (operators/graph.py::kcore_nodes): the standard spam/bot-web
    densest-region screen — nodes that survive iterated removal of
    degree-<3 vertices, with their in-core degree. Peeling only ever
    shrinks the edge table, so each of the 8 unrolled rounds is one
    degree count + two semi-joins over a monotonically smaller input;
    the DuckDB twin unrolls the identical rounds as chained CTEs."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.filter(F.col("event_id") % 3 == 0).select(
        F.pmod(F.col("user_id"), F.lit(600)).alias("u"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("kcore:"), F.col("event_id").cast("string")
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
    return (
        G.kcore_nodes(edges, k=3, rounds=8)
        .select(F.col("node").cast("bigint").alias("node"), "core_deg")
        .orderBy("node")
    )


@register_extra(
    "tree_subtree_rollup",
    """
    WITH RECURSIVE n AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
    p AS (
      SELECT v,
             CASE WHEN v = 0 THEN NULL
                  ELSE ('0x' || substr(md5('tree:' || v), 1, 7))::BIGINT % v
             END AS par
      FROM n
    ),
    anc(v, a) AS (
      SELECT v, v FROM n
      UNION
      SELECT r.v, p.par FROM anc r JOIN p ON p.v = r.a
      WHERE p.par IS NOT NULL
    )
    SELECT a AS node, count(*) AS subtree_n,
           sum(v % 97) AS subtree_sum
    FROM anc GROUP BY 1 ORDER BY 1
    """,
)
def tree_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy (subtree) rollup — the org-chart / category-tree /
    BOM-explosion aggregation SQL needs WITH RECURSIVE for: per node,
    the count and value-sum of its whole subtree (self included). The
    tree is the md5-derived random recursive tree over customer keys
    (parent(v) = md5int % v < v — acyclic by construction, expected
    depth O(log n)). Spark closes the hierarchy by POINTER DOUBLING
    (operators/graph.py::ancestor_closure — ceil(log2 depth) self-join
    shuffles, not depth sequential rounds), then ONE partial-aggregable
    groupBy on the ancestor rolls up count + sum. All integers, so the
    hash is exact. The oracle is the textbook recursive-CTE closure —
    a derivation with no doubling anywhere."""
    from ..operators.graph import ancestor_closure

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nodes = cust.select(F.col("c_custkey").cast("long").alias("v"))
    parents = nodes.select(
        "v",
        F.when(
            F.col("v") > 0,
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("tree:"), F.col("v").cast("string")).cast(
                            "binary"
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % F.col("v"),
        ).alias("par"),
    )
    anc = ancestor_closure(parents, vid="v", par="par")
    return (
        anc.groupBy(F.col("a").alias("node"))
        .agg(
            F.count("*").alias("subtree_n"),
            F.sum(F.col("v") % 97).alias("subtree_sum"),
        )
        .orderBy("node")
    )


def _hits_round_sql(prev_h: str, a_out: str, h_out: str) -> str:
    """One unrolled HITS round: authorities from the PREVIOUS hub
    vector, hubs from the JUST-UPDATED authority vector."""
    return f"""
    {a_out} AS (
      SELECT e.d AS node, CAST(sum(h.s) AS BIGINT) AS a
      FROM de e JOIN {prev_h} h ON h.node = e.s GROUP BY 1
    ),
    {h_out} AS (
      SELECT e.s AS node, CAST(sum(a.a) AS BIGINT) AS s
      FROM de e JOIN {a_out} a ON a.node = e.d GROUP BY 1
    )"""


@register_extra(
    "hits_hubs_authorities",
    f"""
    WITH d0 AS (
      SELECT DISTINCT user_id % 300 AS u,
             ('0x' || substr(md5('hits:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 300 AS v
      FROM events
    ),
    de AS (SELECT u AS s, v AS d FROM d0 WHERE u <> v),
    nodes AS (SELECT DISTINCT s AS node FROM de
              UNION SELECT DISTINCT d FROM de),
    h0 AS (SELECT node, CAST(1 AS BIGINT) AS s FROM nodes),
    {_hits_round_sql("h0", "a1", "h1")},
    {_hits_round_sql("h1", "a2", "h2")},
    {_hits_round_sql("h2", "a3", "h3")}
    SELECT n.node, COALESCE(a3.a, 0) AS auth3, COALESCE(h3.s, 0) AS hub3
    FROM nodes n
    LEFT JOIN a3 ON a3.node = n.node
    LEFT JOIN h3 ON h3.node = n.node
    ORDER BY n.node
    """,
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) over the md5-derived
    DIRECTED interaction graph, three UNNORMALIZED power-iteration
    rounds — dropping the usual L2 normalization keeps every score an
    EXACT int64 (values bounded ~deg^6 < 1e15 at sf0.1), so the
    ranking vector itself is hash-gated, not a float approximation
    (the same trick as the e12 fixed-point PageRank). Spark runs the
    canonical two-join round (authorities from hubs via an in-edge
    groupBy, hubs from fresh authorities via an out-edge groupBy —
    each a partial-aggregable shuffle on the node key, lineage cut per
    round); the oracle unrolls the identical recurrence as nested
    CTEs. Isolated directions coalesce to 0 on both sides."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    de = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(300)).alias("s"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("hits:"),
                                F.col("event_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % 300
            ).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        de.select(F.col("s").alias("node"))
        .union(de.select("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = nodes.select("node", F.lit(1).cast("long").alias("hv"))
    a = None
    for _ in range(3):
        a = (
            de.join(
                h.select(F.col("node").alias("hn"), "hv"),
                de["s"] == F.col("hn"),
            )
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("hv").alias("a"))
            .localCheckpoint(eager=True)
        )
        h = (
            de.join(
                a.select(F.col("node").alias("an"), F.col("a").alias("av")),
                de["d"] == F.col("an"),
            )
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("av").alias("hv"))
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(a, "node", "left")
        .join(h, "node", "left")
        .select(
            "node",
            F.coalesce("a", F.lit(0)).alias("auth3"),
            F.coalesce("hv", F.lit(0)).alias("hub3"),
        )
        .orderBy("node")
    )


@register_extra(
    "graph_reciprocity_mixing",
    """
    WITH de AS (
      SELECT DISTINCT user_id % 300 AS s,
             ('0x' || substr(md5('rcp:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 300 AS d
      FROM events
    ),
    e AS (SELECT s, d FROM de WHERE s <> d),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS dg FROM (
        SELECT s AS node FROM e UNION ALL SELECT d FROM e
      ) GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges,
             CAST(count(*) FILTER (WHERE EXISTS (
               SELECT 1 FROM e r WHERE r.s = e.d AND r.d = e.s))
               AS BIGINT) AS n_mutual
      FROM e
    ),
    mix AS (
      SELECT CAST(count(*) AS BIGINT) AS ne,
             CAST(sum(a.dg * b.dg) AS BIGINT) AS sxy,
             CAST(sum(a.dg) AS BIGINT) AS sx,
             CAST(sum(b.dg) AS BIGINT) AS sy
      FROM e JOIN deg a ON a.node = e.s JOIN deg b ON b.node = e.d
    )
    SELECT m.n_edges, m.n_mutual,
           CAST(m.n_mutual * 1000000 // m.n_edges AS BIGINT) AS recip_e6,
           CAST(mix.ne * mix.sxy - mix.sx * mix.sy AS BIGINT)
             AS deg_cov_scaled,
           CAST(CASE WHEN mix.ne * mix.sxy - mix.sx * mix.sy > 0 THEN 1
                     WHEN mix.ne * mix.sxy - mix.sx * mix.sy < 0 THEN -1
                     ELSE 0 END AS INT) AS assortative_sign
    FROM m CROSS JOIN mix
    """,
)
def graph_reciprocity_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph health metrics: reciprocity (fraction of edges
    whose reverse also exists, e-6 exact) and degree assortativity as
    the EXACT scaled covariance numerator ne*sum(da*db) - sum(da)*
    sum(db) over edges (sign = assortative/disassortative mixing —
    the Pearson denominator needs square roots, so the hash gates the
    scaled numerator, the decision-relevant part). Scale shape: the
    mutual check is a self-equi-join on the reversed key (left-semi),
    degrees come from one partial agg and join back as dims, and all
    five outputs reduce in a single pass. Bounds: deg <= 300, edges
    <= 9e4 -> covariance terms < 1e15, int64-safe."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    de = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(300)).alias("s"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("rcp:"),
                                F.col("event_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % 300
            ).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rev = de.select(F.col("d").alias("s"), F.col("s").alias("d"))
    mutual = de.join(rev, ["s", "d"], "left_semi")
    m = de.groupBy().agg(F.count("*").alias("n_edges")).crossJoin(
        mutual.groupBy().agg(F.count("*").alias("n_mutual"))
    )
    deg = (
        de.select(F.col("s").alias("node"))
        .unionAll(de.select("d"))
        .groupBy("node")
        .agg(F.count("*").alias("dg"))
    )
    mix = (
        de.join(
            deg.select(F.col("node").alias("s"), F.col("dg").alias("da")),
            "s",
        )
        .join(
            deg.select(F.col("node").alias("d"), F.col("dg").alias("db")),
            "d",
        )
        .groupBy()
        .agg(
            F.count("*").alias("ne"),
            F.sum(F.col("da") * F.col("db")).alias("sxy"),
            F.sum("da").alias("sx"),
            F.sum("db").alias("sy"),
        )
    )
    return m.crossJoin(mix).select(
        "n_edges",
        "n_mutual",
        F.expr("n_mutual * 1000000 div n_edges").alias("recip_e6"),
        (
            F.col("ne") * F.col("sxy") - F.col("sx") * F.col("sy")
        ).alias("deg_cov_scaled"),
        F.when(F.col("ne") * F.col("sxy") - F.col("sx") * F.col("sy") > 0, 1)
        .when(F.col("ne") * F.col("sxy") - F.col("sx") * F.col("sy") < 0, -1)
        .otherwise(0)
        .cast("int")
        .alias("assortative_sign"),
    )


# -------------------------------------- local clustering coefficient


@register_extra(
    "local_clustering_coeff",
    """
    WITH d0 AS (
      SELECT DISTINCT user_id % 400 AS u,
             ('0x' || substr(md5('tri:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 400 AS v
      FROM events
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    sym AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT s AS node, count(*) AS deg FROM sym GROUP BY 1),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tcnt AS (
      SELECT node, count(*) AS tri_cnt FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY 1
    )
    SELECT deg.node, CAST(deg.deg AS BIGINT) AS deg,
           CAST(coalesce(tcnt.tri_cnt, 0) AS BIGINT) AS tri_cnt,
           CASE WHEN deg.deg >= 2 THEN
             CAST((2000000 * coalesce(tcnt.tri_cnt, 0))
                  // (deg.deg * (deg.deg - 1)) AS BIGINT)
           ELSE 0 END AS lcc_e6
    FROM deg LEFT JOIN tcnt USING (node)
    ORDER BY node
    """,
)
def local_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — tri_i / C(deg_i, 2), the
    'how clique-like is my neighborhood' metric behind community
    detection and bot scoring — over the SAME md5 interaction graph the
    gated triangle query uses, ppm-quantized with one truncating
    division. Spark reuses the degree-ordered-orientation triangle
    operator (max out-degree O(sqrt m)) + a symmetric-degree count; the
    oracle recounts via the textbook a<b<c 3-way join. Scale shape:
    orientation bounds the triangle join fan-out regardless of degree
    skew; degrees are one partial-agg pass."""
    from ..operators import graph as G

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.pmod(F.col("user_id"), F.lit(400)).alias("u"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("tri:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 400
        ).alias("v"),
    )
    edges = G.canonical_edges(pairs, "u", "v")
    tri = G.triangle_counts(edges)
    sym = edges.select(F.col("a").alias("node")).unionAll(
        edges.select(F.col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    return (
        deg.join(tri.withColumnRenamed("tri_cnt", "t"), "node", "left")
        .select(
            "node",
            F.col("deg").cast("long").alias("deg"),
            F.coalesce("t", F.lit(0)).cast("long").alias("tri_cnt"),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "(2000000 * coalesce(t, 0)) div (deg * (deg - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_e6"),
        )
        .orderBy("node")
    )


@register_extra(
    "scc_components",
    """
    WITH RECURSIVE e0 AS (
      SELECT user_id % 200 AS u,
             ('0x' || substr(md5('scc:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 200 AS v
      FROM events
      WHERE ('0x' || substr(md5('sccgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 37 = 0
    ),
    e AS (SELECT DISTINCT u, v FROM e0 WHERE u <> v),
    verts AS (SELECT u AS node FROM e UNION SELECT v FROM e),
    reach(a, b) AS (
      SELECT u, v FROM e
      UNION
      SELECT r.a, e.v FROM reach r JOIN e ON e.u = r.b
    ),
    mutual AS (
      SELECT r1.a AS x, r1.b AS y
      FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    lbl AS (
      SELECT v.node,
             least(v.node,
                   coalesce(min(m.y) FILTER (m.y < v.node), v.node))
               AS scc_id
      FROM verts v LEFT JOIN mutual m ON m.x = v.node
      GROUP BY v.node
    ),
    internal AS (
      SELECT l1.scc_id, count(*) AS n_edges_within
      FROM e JOIN lbl l1 ON l1.node = e.u
             JOIN lbl l2 ON l2.node = e.v
      WHERE l1.scc_id = l2.scc_id
      GROUP BY 1
    )
    SELECT l.scc_id, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(coalesce(max(i.n_edges_within), 0) AS BIGINT)
             AS n_edges_within
    FROM lbl l LEFT JOIN internal i USING (scc_id)
    GROUP BY 1 ORDER BY 1
    """,
)
def scc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the md5-derived DIRECTED event
    graph (262 edges / ~184 nodes at gate scale — mean out-degree ~1.4,
    the regime where a giant SCC coexists with cycles and singletons).
    Spark runs the distributed Orzan coloring decomposition
    (operators/graph.py::strongly_connected_components: forward
    min-label fixpoint -> per-class backward confinement -> peel), the
    dataflow SCC that needs no driver-side graph and no recursion
    stack; the oracle is the INDEPENDENT textbook characterization —
    full transitive closure, mutual-reachability pairs, min-member
    labeling — so algorithm and definition cross-check. Per-SCC
    summary: id (min member), node count, internal edge count."""
    from ..operators.graph import strongly_connected_components

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    e = (
        ev.filter(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sccgate:"), eid).cast("binary")),
                    1, 4,
                ), 16, 10,
            ).cast("int") % 37 == 0
        )
        .select(
            F.pmod(F.col("user_id"), F.lit(200)).alias("u"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("scc:"), eid).cast("binary")),
                        1, 7,
                    ), 16, 10,
                ).cast("long") % 200
            ).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    verts = e.select(F.col("u").alias("node")).unionByName(
        e.select(F.col("v").alias("node"))
    ).distinct()
    lbl = strongly_connected_components(verts, e, vid="node", src="u", dst="v")
    internal = (
        e.join(lbl.select(F.col("node").alias("u"),
                          F.col("scc_id").alias("su")), "u")
        .join(lbl.select(F.col("node").alias("v"),
                         F.col("scc_id").alias("sv")), "v")
        .filter(F.col("su") == F.col("sv"))
        .groupBy(F.col("su").alias("scc_id"))
        .agg(F.count("*").alias("n_edges_within"))
    )
    return (
        lbl.groupBy("scc_id")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .join(internal, "scc_id", "left")
        .select(
            "scc_id",
            "n_nodes",
            F.coalesce("n_edges_within", F.lit(0))
            .cast("long")
            .alias("n_edges_within"),
        )
        .orderBy("scc_id")
    )


@register_extra(
    "critical_path_dag",
    """
    WITH RECURSIVE e0 AS (
      SELECT least(user_id % 120,
                   ('0x' || substr(md5('lp:' || CAST(event_id AS VARCHAR)),
                                   1, 7))::BIGINT % 120) AS u,
             greatest(user_id % 120,
                   ('0x' || substr(md5('lp:' || CAST(event_id AS VARCHAR)),
                                   1, 7))::BIGINT % 120) AS v,
             1 + ('0x' || substr(md5('lpw:' || CAST(event_id AS VARCHAR)),
                                 1, 4))::BIGINT % 9 AS w
      FROM events
      WHERE ('0x' || substr(md5('lpgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 41 = 0
    ),
    e AS (SELECT u, v, max(w) AS w FROM e0 WHERE u <> v GROUP BY u, v),
    verts AS (SELECT u AS node FROM e UNION SELECT v FROM e),
    paths(node, len) AS (
      SELECT node, CAST(0 AS BIGINT) FROM verts
      UNION
      SELECT e.v, p.len + e.w FROM paths p JOIN e ON e.u = p.node
    )
    SELECT node, max(len) AS lp FROM paths GROUP BY node ORDER BY node
    """,
)
def critical_path_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-path (longest weighted path) lengths in a DAG — the
    PERT/CPM forward pass, and the shape of every task-scheduler
    makespan bound and compiler-ILP critical-path analysis. The DAG is
    the md5-derived event graph oriented low->high node id (acyclic by
    construction), multi-edges collapsed to max weight. Spark runs the
    monotone label-raising relaxation in operators/graph.py::
    longest_path_dag — one equi-join + partial max per round, rounds =
    longest chain HOPS (8 at gate scale), each round's state a compact
    (node, label) table; the oracle is the INDEPENDENT path-enumeration
    semantics (recursive closure over all path lengths, dedup'd by
    UNION, max per node), so relaxation and definition cross-check.
    Scale: labels shuffle on node id only; no path materialization on
    the Spark side ever."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    a = F.pmod(F.col("user_id"), F.lit(120))
    b = _h("lp:", 7) % 120
    e = (
        ev.filter(_h("lpgate:", 4).cast("int") % 41 == 0)
        .select(
            F.least(a, b).alias("u"),
            F.greatest(a, b).alias("v"),
            (F.lit(1) + _h("lpw:", 4) % 9).alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
    )
    verts = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    return G.longest_path_dag(
        verts, e, vid="node", src="u", dst="v", weight="w"
    ).orderBy("node")


@register_extra(
    "temporal_reach_earliest",
    """
    WITH RECURSIVE e0 AS (
      SELECT user_id % 130 AS u,
             ('0x' || substr(md5('ta:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 130 AS v,
             ('0x' || substr(md5('tat:' || CAST(event_id AS VARCHAR)),
                             1, 5))::BIGINT % 900 AS t
      FROM events
      WHERE ('0x' || substr(md5('tagate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 29 = 0
    ),
    e AS (SELECT DISTINCT u, v, t FROM e0 WHERE u <> v),
    src AS (SELECT DISTINCT u AS node FROM e WHERE u % 11 = 0),
    reach(node, arr) AS (
      SELECT node, CAST(0 AS BIGINT) FROM src
      UNION
      SELECT e.v, e.t FROM reach r JOIN e ON e.u = r.node AND e.t >= r.arr
    )
    SELECT node, min(arr) AS earliest FROM reach GROUP BY node ORDER BY node
    """,
)
def temporal_reach_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-arrival reachability in a TEMPORAL graph — an edge
    (u, v, t) is traversable only if you were at u by time t (the
    contact-network / epidemic / information-diffusion primitive;
    static reachability over the same edges would overcount, because
    paths must respect time order). Contacts are md5-derived
    (u, v, t) triples; sources are the u % 11 == 0 senders at time 0.
    Spark runs the label-correcting min relaxation in operators/
    graph.py::temporal_earliest_arrival (every label witnessed by a
    real time-respecting path; rounds = temporal diameter, 7 at gate
    scale); the oracle enumerates all time-respecting arrival events
    via a recursive closure and takes min per node — algorithm vs
    definition. Scale: state is (node, arrival) only, shuffled on node
    id; the t >= arr edge gate runs inside the join, so no candidate
    blow-up."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    e = (
        ev.filter(_h("tagate:", 4).cast("int") % 29 == 0)
        .select(
            F.pmod(F.col("user_id"), F.lit(130)).alias("u"),
            (_h("ta:", 7) % 130).alias("v"),
            (_h("tat:", 5) % 900).alias("t"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    src = e.filter(F.col("u") % 11 == 0).select(
        F.col("u").alias("node")
    ).distinct()
    return G.temporal_earliest_arrival(
        src, e, vid="node", src="u", dst="v", time_col="t"
    ).orderBy("node")


@register_extra(
    "closeness_centrality",
    """
    WITH RECURSIVE e0 AS (
      SELECT user_id % 100 AS u,
             ('0x' || substr(md5('cc:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 100 AS v
      FROM events
      WHERE ('0x' || substr(md5('ccgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 31 = 0
    ),
    e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM e0 WHERE u <> v),
    sym AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
    reach(src, node, hops) AS (
      SELECT DISTINCT s, s, 0 FROM sym
      UNION
      SELECT r.src, s.d, r.hops + 1 FROM reach r JOIN sym s ON s.s = r.node
      WHERE r.hops < 12
    ),
    d AS (SELECT src, node, min(hops) AS hops FROM reach GROUP BY 1, 2)
    SELECT src AS node,
           CAST(count(*) FILTER (hops > 0) AS BIGINT) AS n_reached,
           CAST(sum(hops) AS BIGINT) AS farness,
           CAST(max(hops) AS BIGINT) AS ecc,
           CAST(sum(1000000 // hops) FILTER (hops > 0) AS BIGINT)
             AS harmonic_e6
    FROM d GROUP BY 1 ORDER BY node
    """,
)
def closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness / harmonic centrality + eccentricity per node — the
    'who sits in the middle of the network' family (farness = sum of
    hop distances, harmonic = sum of 1/d which disconnection cannot
    break, ecc = worst case), over the md5-derived undirected event
    graph. Spark runs ONE batched multi-source BFS carrying (src,
    node) composite frontiers (operators/graph.py::all_pairs_hops —
    the MS-BFS batching; levels = diameter, 5 at gate scale, each
    level one join + one anti-join); the oracle enumerates bounded
    walks via a recursive closure and takes min hops per pair —
    traversal vs definition. Both sides use the same 12-hop bound
    (diameter is 5, so it never binds). Harmonic uses the exact
    truncating e6 division both engines share. Scale: the pair
    frontier is the iterated datum — for planet graphs you batch the
    src side; the per-level shuffle keys are (src, node) pairs,
    uniform by construction."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    a = F.pmod(F.col("user_id"), F.lit(100))
    b = _h("cc:", 7) % 100
    e = (
        ev.filter(_h("ccgate:", 4).cast("int") % 31 == 0)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    pairs = G.all_pairs_hops(e, max_hops=12)
    return (
        pairs.groupBy(F.col("src").alias("node"))
        .agg(
            F.count(F.when(F.col("hops") > 0, 1)).alias("n_reached"),
            F.sum("hops").cast("long").alias("farness"),
            F.max("hops").cast("long").alias("ecc"),
            F.expr(
                "sum(case when hops > 0 then 1000000 div hops end)"
            )
            .cast("long")
            .alias("harmonic_e6"),
        )
        .orderBy("node")
    )


@register_extra(
    "graph_coloring_jp",
    """
    WITH RECURSIVE e0 AS (
      SELECT user_id % 110 AS u,
             ('0x' || substr(md5('jp:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 110 AS v
      FROM events
      WHERE ('0x' || substr(md5('jpgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 19 = 0
    ),
    e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM e0 WHERE u <> v),
    verts AS (SELECT DISTINCT node FROM
                (SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
    pri AS (
      SELECT node,
             ('0x' || substr(md5('jppri:' || CAST(node AS VARCHAR)),
                             1, 7))::BIGINT AS p
      FROM verts
    ),
    ord AS MATERIALIZED (
      SELECT node, row_number() OVER (ORDER BY p DESC, node DESC) AS rn
      FROM pri
    ),
    adj AS MATERIALIZED (
      SELECT n.node, coalesce(list(o.nbr), []) AS nbrs FROM ord n
      LEFT JOIN (SELECT a AS node, b AS nbr FROM e
                 UNION ALL SELECT b, a FROM e) o USING (node)
      GROUP BY n.node
    ),
    steps(rn, state) AS (
      SELECT 0, []::STRUCT(node BIGINT, color INT)[]
      UNION ALL
      SELECT s.rn + 1,
             list_append(s.state, {'node': o.node, 'color':
               list_min(list_filter(
                 range(0, len(list_filter(s.state,
                         x -> list_contains(a.nbrs, x.node))) + 1),
                 c -> NOT list_contains(
                   list_transform(list_filter(s.state,
                     x -> list_contains(a.nbrs, x.node)),
                     x -> x.color), c)))
             })
      FROM steps s
      JOIN ord o ON o.rn = s.rn + 1
      JOIN adj a ON a.node = o.node
    ),
    fin AS (
      SELECT unnest(state, recursive := true)
      FROM steps WHERE rn = (SELECT max(rn) FROM steps)
    )
    SELECT color, CAST(count(*) AS BIGINT) AS n_nodes
    FROM fin GROUP BY 1 ORDER BY 1
    """,
)
def graph_coloring_jp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy graph coloring, distributed: Jones-Plassmann rounds with
    md5 hash priorities (the register-allocation / conflict-scheduling
    primitive — color = time slot such that no two adjacent tasks
    share one). The JP invariant — a node is colored only when every
    higher-priority neighbor already is — makes the parallel rounds
    produce EXACTLY the sequential greedy coloring in decreasing
    priority order, which is what the oracle runs: a single-row
    recursive fold over the priority-ordered node list, carrying the
    (node, color) assignment as a LIST state and computing each mex
    with pure list lambdas. Two completely different executions (7
    synchronous parallel rounds vs 110 sequential steps) must emit the
    identical per-color histogram. Ties broken by (pri, node) on both
    sides so 28-bit hash collisions cannot de-determinize. Scale: each
    JP round is one neighbor join + two partial aggs on node keys;
    round count is the longest increasing-priority path, O(log n)
    expected — the classic distributed-coloring bound."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, col: F.Column, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    a = F.pmod(F.col("user_id"), F.lit(110))
    b = _h("jp:", eid, 7) % 110
    e = (
        ev.filter(_h("jpgate:", eid, 4).cast("int") % 19 == 0)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    verts = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    pri = verts.select(
        "node", _h("jppri:", F.col("node").cast("string"), 7).alias("pri")
    )
    colored = G.jp_coloring(e, pri, vid="node", pri="pri")
    return (
        colored.groupBy("color")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("color")
    )


@register_extra(
    "stable_matching_gs",
    """
    WITH RECURSIVE men AS (SELECT n_nationkey AS m FROM nation),
    pairs AS (
      SELECT m, w.range AS w,
             ('0x' || substr(md5('gsm:' || m || ':' || w.range),
                             1, 8))::BIGINT AS mr,
             ('0x' || substr(md5('gsw:' || w.range || ':' || m),
                             1, 8))::BIGINT AS wr
      FROM men, range(30) w
    ),
    mpref AS MATERIALIZED (
      SELECT m, list(w ORDER BY mr, w) AS mp FROM pairs GROUP BY m
    ),
    mplist AS MATERIALIZED (SELECT list(mp ORDER BY m) AS mps FROM mpref),
    wrank AS MATERIALIZED (
      SELECT list(wl ORDER BY w) AS wrs FROM (
        SELECT w, list(wr ORDER BY m) AS wl FROM pairs GROUP BY w)
    ),
    init AS (
      SELECT list_transform(range(1, 26), x -> 0) AS nxt,
             list_transform(range(1, 31), x -> -1) AS wm
    ),
    sim(step, nxt, wm, done) AS (
      SELECT 0, nxt, wm, false FROM init
      UNION ALL
      SELECT step + 1,
             list_transform(range(1, 26), i ->
               CASE WHEN i - 1 = fm THEN s.nxt[i] + 1 ELSE s.nxt[i] END),
             list_transform(range(1, 31), i ->
               CASE WHEN i - 1 = pw THEN
                 (CASE WHEN s.wm[i] = -1 THEN fm
                       WHEN wrs[i][fm + 1] < wrs[i][s.wm[i] + 1] THEN fm
                       ELSE s.wm[i] END)
               ELSE s.wm[i] END),
             fm IS NULL
      FROM (
        SELECT step, nxt, wm,
               list_min(list_filter(range(0, 25), m ->
                 NOT list_contains(wm, m) AND nxt[m + 1] < 30)) AS fm
        FROM sim WHERE NOT done
      ) s
      CROSS JOIN wrank
      CROSS JOIN mplist
      CROSS JOIN LATERAL (SELECT CASE WHEN fm IS NOT NULL
                            THEN mps[fm + 1][s.nxt[fm + 1] + 1] END AS pw) p
    ),
    fin AS (SELECT wm FROM sim WHERE done ORDER BY step LIMIT 1)
    SELECT i - 1 AS w, wm[i] AS m
    FROM fin, range(1, 31) r(i)
    WHERE wm[i] <> -1
    ORDER BY w
    """,
)
def stable_matching_gs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable matching (deferred acceptance) — the mechanism behind
    residency match, school choice, and ad-slot assignment — computed
    DISTRIBUTED as parallel Gale-Shapley proposal rounds
    (operators/graph.py::gale_shapley_rounds: every free proposer
    bids at once; per round one anti-join vs the rejection set, one
    top-1 window, one keep-best agg). The gate leans on the 1962/1971
    theorem that deferred acceptance is proposal-order independent:
    the oracle replays the TEXTBOOK sequential algorithm (one proposal
    per step, 750-step recursive fold over list state in DuckDB), and
    both must land on the identical man-optimal matching. 25 proposers
    (nation keys) x 30 counterparties, md5 preference ranks on both
    sides. Scale: state is (pair) rows only; the rejection set is the
    single growing datum, bounded by |preference lists| — exactly the
    bound that makes batched GS the standard at-scale formulation."""
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    men = nat.select(F.col("n_nationkey").cast("long").alias("m"))
    women = spark.range(30).select(F.col("id").alias("w"))
    both = men.crossJoin(women)

    def _h(prefix: str, a: str, b: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col(a).cast("string"),
                        F.lit(":"),
                        F.col(b).cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    prefs_m = both.select("m", "w", _h("gsm:", "m", "w").alias("mr"))
    prefs_w = both.select("w", "m", _h("gsw:", "w", "m").alias("wr"))
    return G.gale_shapley_rounds(prefs_m, prefs_w).orderBy("w")


@register_extra(
    "ktruss_4_edges",
    """
    WITH RECURSIVE e0 AS (
      SELECT user_id % 90 AS u,
             ('0x' || substr(md5('kt:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 90 AS v
      FROM events
      WHERE ('0x' || substr(md5('ktgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 17 = 0
    ),
    e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM e0 WHERE u <> v),
    el AS MATERIALIZED (SELECT list(a * 1000 + b ORDER BY a, b) AS es
                        FROM e),
    verts AS MATERIALIZED (
      SELECT list(DISTINCT node ORDER BY node) AS vs FROM
        (SELECT a AS node FROM e UNION SELECT b FROM e)
    ),
    peel(rnd, es, stable) AS (
      SELECT 0, es, false FROM el
      UNION ALL
      SELECT rnd + 1, newe, len(newe) = len(p.es)
      FROM (
        SELECT rnd, es,
          list_filter(es, x -> (
            len(list_filter(vs, c ->
              c <> (x // 1000) AND c <> (x % 1000)
              AND list_contains(es, least(x // 1000, c) * 1000
                                    + greatest(x // 1000, c))
              AND list_contains(es, least(x % 1000, c) * 1000
                                    + greatest(x % 1000, c))
            )) >= 2
          )) AS newe
        FROM peel, verts WHERE NOT stable AND rnd < 40
      ) p
    ),
    fin AS (SELECT es FROM peel WHERE stable ORDER BY rnd LIMIT 1)
    SELECT CAST(x // 1000 AS BIGINT) AS a, CAST(x % 1000 AS BIGINT) AS b
    FROM (SELECT unnest(es) AS x FROM fin) ORDER BY a, b
    """,
)
def ktruss_4_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss decomposition of the md5-derived event graph — every
    surviving edge must close >= 2 triangles among SURVIVING edges
    (the cohesive-community extractor of the GraphChallenge suite;
    k-core keeps hub-and-spoke junk, k-truss does not). Spark peels
    distributed (operators/graph.py::ktruss_edges: per round one
    wedge join on the shared endpoint + one filter, the shrinking edge
    list is the only state); the oracle peels the SAME fixpoint as a
    single-row recursive fold over an integer-coded edge LIST,
    recomputing each edge's common-neighbor count with pure list
    lambdas — dataflow vs list-machine, same fixpoint theorem
    (the peel order cannot change the result because support is
    monotone under deletion). Output: the surviving edges themselves,
    the strongest possible hash surface."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    a = F.pmod(F.col("user_id"), F.lit(90))
    b = _h("kt:", 7) % 90
    e = (
        ev.filter(_h("ktgate:", 4).cast("int") % 17 == 0)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return G.ktruss_edges(e, k=4).orderBy("a", "b")


_BR_EDGES_SQL = """
    e0 AS (
      SELECT user_id % 60 AS u,
             ('0x' || substr(md5('br:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 60 AS v
      FROM events
      WHERE ('0x' || substr(md5('brgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::INT % 149 = 0
    ),
    e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM e0 WHERE u <> v)
"""


def _br_edges_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    a = F.pmod(F.col("user_id"), F.lit(60))
    b = _h("br:", 7) % 60
    return (
        ev.filter(_h("brgate:", 4).cast("int") % 149 == 0)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


@register_extra(
    "bridge_edges",
    f"""
    WITH RECURSIVE {_BR_EDGES_SQL},
    ed AS (SELECT a, b, a * 100 + b AS eid FROM e),
    sym AS (SELECT eid, a AS s, b AS d FROM ed
            UNION ALL SELECT eid, b, a FROM ed),
    reach(x, node) AS (
      SELECT eid, a FROM ed
      UNION
      SELECT r.x, s.d FROM reach r JOIN sym s ON s.s = r.node
      WHERE s.eid <> r.x
    )
    SELECT ed.a, ed.b FROM ed
    WHERE NOT EXISTS (SELECT 1 FROM reach r
                      WHERE r.x = ed.eid AND r.node = ed.b)
    ORDER BY ed.a, ed.b
    """,
)
def bridge_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bridge (cut-edge) detection — which links' failure disconnects
    the network, the core resilience question for transport/telecom
    graphs. Definition-level formulation: edge (a, b) is a bridge iff
    b is unreachable from a WITHOUT that edge; Spark answers all |E|
    hypotheses in ONE batched exclusion-BFS (operators/graph.py::
    hypothesis_bfs — (excluded-edge, node) composite frontiers, the
    edge ban pushed into the join predicate), while the oracle runs
    the same definition as a recursive closure with the exclusion in
    the WHERE. No Tarjan DFS anywhere — the sequential low-link trick
    does not distribute, the hypothesis batch does (state = E x V
    pairs bounded by reachability). Output: the bridges themselves."""
    from ..operators.graph import hypothesis_bfs

    e = _br_edges_spark(spark, sf_dir)
    ed = e.withColumn("eid", F.col("a") * 100 + F.col("b"))
    sym = ed.select("eid", F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        ed.select("eid", F.col("b").alias("s"), F.col("a").alias("d"))
    )
    seeds = ed.select(F.col("eid").alias("x"), F.col("a").alias("node"))
    reach = hypothesis_bfs(
        sym, seeds, lambda fr, sy: sy["eid"] != fr["x"]
    )
    return (
        ed.join(
            reach.select(
                F.col("x").alias("eid"), F.col("node").alias("b")
            ),
            ["eid", "b"],
            "left_anti",
        )
        .select("a", "b")
        .orderBy("a", "b")
    )


@register_extra(
    "articulation_points",
    f"""
    WITH RECURSIVE {_BR_EDGES_SQL},
    nb AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
    cand AS (SELECT x, min(y) AS seed FROM nb GROUP BY x
             HAVING count(DISTINCT y) >= 2),
    sym AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
    reach(x, node) AS (
      SELECT x, seed FROM cand
      UNION
      SELECT r.x, s.d FROM reach r JOIN sym s ON s.s = r.node
      WHERE s.d <> r.x AND s.s <> r.x
    )
    SELECT nb.x AS node,
           CAST(count(DISTINCT nb.y) AS BIGINT) AS deg,
           CAST(count(DISTINCT nb.y)
                - count(DISTINCT r.node) AS BIGINT) AS n_cut_off
    FROM nb
    JOIN cand c ON c.x = nb.x
    LEFT JOIN reach r ON r.x = nb.x AND r.node = nb.y
    GROUP BY nb.x
    HAVING count(DISTINCT nb.y) > count(DISTINCT r.node)
    ORDER BY node
    """,
)
def articulation_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Articulation (cut-vertex) detection on the same failure-analysis
    graph: node x is an articulation point iff, with x removed, some
    neighbor of x can no longer reach the others — answered for ALL
    candidate nodes at once by the same batched exclusion-BFS, seeded
    at each candidate's smallest neighbor with the node ban in the
    join predicate. Reports how many of the node's neighbors get cut
    off (the severity, not just the flag). Cross-checks bridge_edges
    structurally: every bridge endpoint of degree >= 2 must appear
    here — and the DuckDB closure re-derives the same sets from the
    definition."""
    from ..operators.graph import hypothesis_bfs

    e = _br_edges_spark(spark, sf_dir)
    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    cand = nb.groupBy("x").agg(
        F.min("y").alias("seed"), F.countDistinct("y").alias("deg")
    ).filter(F.col("deg") >= 2)
    sym = e.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        e.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )
    reach = hypothesis_bfs(
        sym,
        cand.select("x", F.col("seed").alias("node")),
        lambda fr, sy: (sy["d"] != fr["x"]) & (sy["s"] != fr["x"]),
    )
    reached_nb = (
        nb.join(
            reach.select("x", F.col("node").alias("y")), ["x", "y"]
        )
        .groupBy("x")
        .agg(F.countDistinct("y").alias("n_reached"))
    )
    return (
        cand.join(reached_nb, "x", "left")
        .filter(
            F.col("deg") > F.coalesce("n_reached", F.lit(0))
        )
        .select(
            F.col("x").alias("node"),
            F.col("deg").cast("long").alias("deg"),
            (F.col("deg") - F.coalesce("n_reached", F.lit(0)))
            .cast("long")
            .alias("n_cut_off"),
        )
        .orderBy("node")
    )


# --------------------------------------------- Luby maximal independent set


@register_extra(
    "luby_mis_rounds",
    """
    WITH RECURSIVE d0 AS (
      SELECT user_id % 240 AS u,
             ('0x' || substr(md5('mis:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 240 AS v
      FROM events
      WHERE ('0x' || substr(md5('misgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 23 = 0
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    el AS MATERIALIZED (
      SELECT list({'a': a, 'b': b} ORDER BY a, b) AS el FROM e
    ),
    n0 AS MATERIALIZED (
      SELECT list(DISTINCT x ORDER BY x) AS ns
      FROM (SELECT a AS x FROM e UNION SELECT b FROM e)
    ),
    st(r, act, mis) AS (
      SELECT CAST(0 AS BIGINT), (SELECT ns FROM n0),
             CAST([] AS STRUCT(node BIGINT, r BIGINT)[])
      UNION ALL
      SELECT q.r + 1,
             list_filter(q.act, v -> NOT list_contains(q.rem, v)),
             q.mis || list_transform(q.win, v -> {'node': v, 'r': q.r})
      FROM (
        SELECT s3.r, s3.act, s3.mis, s3.win,
               list_distinct(s3.win || flatten(list_transform(
                 list_filter(s3.ael,
                             ed -> list_contains(s3.win, ed.a)
                                OR list_contains(s3.win, ed.b)),
                 ed -> [ed.a, ed.b]))) AS rem
        FROM (
          SELECT s2.r, s2.act, s2.mis, s2.ael,
                 list_filter(s2.act,
                             v -> NOT list_contains(s2.losers, v)) AS win
          FROM (
            SELECT s1.r, s1.act, s1.mis, s1.ael,
                   list_distinct(list_transform(s1.ael, ed ->
                     CASE WHEN
                       (('0x' || substr(md5('mp:'
                          || CAST(s1.r AS VARCHAR) || ':'
                          || CAST(ed.a AS VARCHAR)), 1, 5))::BIGINT
                        % 1000000) * 1000 + ed.a
                       <
                       (('0x' || substr(md5('mp:'
                          || CAST(s1.r AS VARCHAR) || ':'
                          || CAST(ed.b AS VARCHAR)), 1, 5))::BIGINT
                        % 1000000) * 1000 + ed.b
                     THEN ed.b ELSE ed.a END)) AS losers
            FROM (
              SELECT st.r, st.act, st.mis,
                     list_filter(el.el,
                                 ed -> list_contains(st.act, ed.a)
                                   AND list_contains(st.act, ed.b)) AS ael
              FROM st, el
              WHERE len(st.act) > 0
            ) s1
          ) s2
        ) s3
      ) q
    )
    SELECT u.node AS node, u.r AS mis_round
    FROM (SELECT unnest(mis) AS u FROM st WHERE len(act) = 0)
    ORDER BY node
    """,
)
def luby_mis_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby's maximal independent set over the md5-derived interaction
    graph — the classic parallel symmetry-breaking primitive (MIS seeds
    parallel coloring, scheduling, and cluster-head election; the
    reference's DBSCAN merge seeding is the same pick-local-minima
    move, stop_places.sql). Spark runs the round-synchronous Pregel
    loop (operators/graph.py::luby_mis: per round one both-active
    equi-join + map-side partial MIN + anti-join, expected O(log n)
    rounds, frontier-sized state only); the oracle replays the
    IDENTICAL deterministic rounds as a single-row list machine whose
    loser set is pure list algebra over the active edge list. Keys are
    exact integers ((md5 % 1e6) * 1000 + node), so wins are a strict
    total order on both engines — no float discipline needed."""
    from ..operators.graph import luby_mis

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    u = F.pmod(F.col("user_id"), F.lit(240))
    v = _h("mis:", 7) % 240
    edges = (
        ev.filter(_h("misgate:", 4) % 23 == 0)
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return (
        luby_mis(edges, key_prefix="mp:")
        .select(
            F.col("n").cast("long").alias("node"),
            F.col("mis_round").cast("long").alias("mis_round"),
        )
        .orderBy("node")
    )


# ------------------------------------- local-max greedy weighted matching


@register_extra(
    "greedy_weighted_matching",
    """
    WITH RECURSIVE d0 AS (
      SELECT user_id % 200 AS u,
             ('0x' || substr(md5('gm:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 200 AS v
      FROM events
      WHERE ('0x' || substr(md5('gmgate:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 11 = 0
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    ew AS (
      SELECT a, b,
             (('0x' || substr(md5('gw:' || CAST(a AS VARCHAR) || ':'
                || CAST(b AS VARCHAR)), 1, 7))::BIGINT % 1000000)
             * 1000000 + a * 1000 + b AS wkey
      FROM e
    ),
    el AS MATERIALIZED (
      SELECT list({'a': a, 'b': b} ORDER BY wkey DESC) AS el,
             count(*) AS n
      FROM ew
    ),
    st(i, mn, me) AS (
      SELECT CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
             CAST([] AS STRUCT(a BIGINT, b BIGINT)[])
      UNION ALL
      SELECT s1.i + 1,
             CASE WHEN s1.ok
                  THEN s1.mn || [s1.ed.a, s1.ed.b] ELSE s1.mn END,
             CASE WHEN s1.ok THEN s1.me || [s1.ed] ELSE s1.me END
      FROM (
        SELECT st.i, st.mn, st.me,
               el.el[CAST(st.i + 1 AS INT)] AS ed,
               NOT list_contains(st.mn, el.el[CAST(st.i + 1 AS INT)].a)
               AND NOT list_contains(st.mn,
                                     el.el[CAST(st.i + 1 AS INT)].b)
                 AS ok
        FROM st, el
        WHERE st.i < el.n
      ) s1
    )
    SELECT u.a AS a, u.b AS b
    FROM (
      SELECT unnest(me) AS u
      FROM (SELECT me, row_number() OVER (ORDER BY i DESC) AS rn
            FROM st) WHERE rn = 1
    )
    ORDER BY a, b
    """,
)
def greedy_weighted_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-weight matching via PARALLEL local-max rounds
    (Preis / Manne-Bisseling — the distributed matching used for graph
    coarsening in multilevel partitioners like METIS): per round, an
    edge joins the matching iff its weight key is the maximum among
    ALL edges incident to either endpoint; matched nodes drop out;
    repeat. With strictly distinct keys (md5-weight packed with the
    edge id) the local-max fixpoint PROVABLY equals the sequential
    greedy matching — so the oracle is the independent SEQUENTIAL
    formulation: walk edges in descending key order, take an edge iff
    both endpoints are free, as a single-row list machine. Spark's
    rounds are each one node-explode + partial MAX + double equi-join
    + anti-join (frontier-sized state, expected O(log m) rounds) — a
    genuinely different derivation hash-gated against the definition.
    Output: the matched edge set."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, col, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    u = F.pmod(F.col("user_id"), F.lit(200))
    v = _h("gm:", eid, 7) % 200
    e = (
        ev.filter(_h("gmgate:", eid, 4) % 11 == 0)
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    wkey = (
        _h(
            "gw:",
            F.concat(
                F.col("a").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ),
            7,
        )
        % 1000000
    ) * 1000000 + F.col("a") * 1000 + F.col("b")
    el = e.withColumn("wkey", wkey).localCheckpoint(eager=True)
    matched = None
    for _ in range(60):
        if el.isEmpty():
            break
        node_max = (
            el.select(F.col("a").alias("n"), "wkey")
            .unionAll(el.select(F.col("b").alias("n"), "wkey"))
            .groupBy("n")
            .agg(F.max("wkey").alias("mk"))
        )
        winners = (
            el.join(
                node_max.select(F.col("n").alias("a"),
                                F.col("mk").alias("mka")),
                "a",
            )
            .join(
                node_max.select(F.col("n").alias("b"),
                                F.col("mk").alias("mkb")),
                "b",
            )
            .filter(
                (F.col("wkey") == F.col("mka"))
                & (F.col("wkey") == F.col("mkb"))
            )
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        matched = (
            winners if matched is None else matched.unionAll(winners)
        )
        mnodes = (
            winners.select(F.col("a").alias("n"))
            .unionAll(winners.select(F.col("b").alias("n")))
            .distinct()
        )
        el = (
            el.join(mnodes.withColumnRenamed("n", "a"), "a", "left_anti")
            .join(mnodes.withColumnRenamed("n", "b"), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError("matching did not converge in 60 rounds")
    if matched is None:
        return (
            spark.range(0)
            .select(F.col("id").alias("a"), F.col("id").alias("b"))
        )
    return matched.select("a", "b").orderBy("a", "b")


# -------------------------------------------- LCA via pointer doubling


@register_extra(
    "lca_pointer_doubling",
    """
    WITH RECURSIVE nodes AS (
      SELECT unnest(generate_series(0, 199)) AS v
    ),
    par AS (
      SELECT v,
             CASE WHEN v = 0 THEN NULL
                  ELSE ('0x' || substr(md5('tp:' || CAST(v AS VARCHAR)),
                                       1, 7))::BIGINT % v END AS p
      FROM nodes
    ),
    up(v, anc, d) AS (
      SELECT v, v, 0 FROM nodes
      UNION ALL
      SELECT u.v, par.p, u.d + 1
      FROM up u JOIN par ON par.v = u.anc
      WHERE par.p IS NOT NULL
    ),
    dep AS (SELECT v, max(d) AS depth FROM up GROUP BY 1),
    qp AS (
      SELECT ('0x' || substr(md5('qa:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 200 AS u,
             ('0x' || substr(md5('qb:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 200 AS w
      FROM events
      WHERE ('0x' || substr(md5('qg:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 347 = 0
    ),
    pairs AS (SELECT DISTINCT u, w FROM qp),
    lca AS (
      SELECT p.u, p.w,
             max_by(a.anc, dep.depth) AS lca,
             max(dep.depth) AS lca_depth
      FROM pairs p
      JOIN up a ON a.v = p.u
      JOIN up b ON b.v = p.w AND b.anc = a.anc
      JOIN dep ON dep.v = a.anc
      GROUP BY 1, 2
    )
    SELECT u, w, CAST(lca AS BIGINT) AS lca,
           CAST(lca_depth AS BIGINT) AS lca_depth
    FROM lca ORDER BY u, w
    """,
)
def lca_pointer_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowest common ancestor by POINTER DOUBLING — the parallel-tree
    primitive (taxonomy roll-ups, org-chart queries, merge-base): the
    ancestor closure is built in O(log depth) rounds of self-joining
    the reach-set with itself (R := R union R.R), never a per-node
    walk; LCA(u, w) is then the deepest common ancestor, an argmax
    over the closure join (depths along one root path are distinct, so
    max_by is deterministic). The oracle builds the SAME closure as a
    plain recursive parent-chain walk — definition vs algorithm.
    Random recursive tree (parent(v) = md5 % v keeps it acyclic),
    md5-gated query pairs; self-ancestors included so LCA(u, u) = u
    falls out naturally."""
    nodes = spark.range(0, 200).select(F.col("id").alias("v"))
    par = nodes.select(
        "v",
        F.when(F.col("v") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("tp:"), F.col("v").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % F.col("v")
        )
        .alias("p"),
    )
    # pointer-doubling closure: R := R ∪ (R ∘ R), seeded with the
    # identity + parent edges; 6 rounds cover depth < 2^6
    r = nodes.select(
        F.col("v"), F.col("v").alias("anc"), F.lit(0).alias("d")
    ).unionAll(
        par.filter(F.col("p").isNotNull()).select(
            "v", F.col("p").alias("anc"), F.lit(1).alias("d")
        )
    ).localCheckpoint(eager=True)
    for _ in range(6):
        hop = (
            r.select(
                F.col("v"), F.col("anc").alias("mid"), F.col("d").alias("d1")
            )
            .join(
                r.select(
                    F.col("v").alias("mid"),
                    F.col("anc"),
                    F.col("d").alias("d2"),
                ),
                "mid",
            )
            .select("v", "anc", (F.col("d1") + F.col("d2")).alias("d"))
        )
        r = r.unionAll(hop).distinct().localCheckpoint(eager=True)
    dep = r.groupBy(F.col("v")).agg(F.max("d").alias("depth"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    pairs = (
        ev.filter(_h("qg:", 4) % 347 == 0)
        .select((_h("qa:", 7) % 200).alias("u"),
                (_h("qb:", 7) % 200).alias("w"))
        .distinct()
    )
    ua = r.select(F.col("v").alias("u"), "anc")
    wa = r.select(F.col("v").alias("w"), F.col("anc"))
    common = pairs.join(ua, "u").join(wa, ["w", "anc"])
    j = common.join(
        dep.select(F.col("v").alias("anc"), "depth"), "anc"
    )
    return (
        j.groupBy("u", "w")
        .agg(
            F.max_by("anc", "depth").cast("long").alias("lca"),
            F.max("depth").cast("long").alias("lca_depth"),
        )
        .orderBy("u", "w")
    )


# ------------------------------------------- min s-t cut enumeration


_MC_EDGES_SQL = """
    he AS (
      SELECT u.u AS u, v.v AS v,
             ('0x' || substr(md5('mcc:' || CAST(u.u AS VARCHAR) || ':'
                || CAST(v.v AS VARCHAR)), 1, 4))::BIGINT % 20 + 1 AS cap
      FROM (SELECT unnest(generate_series(0, 11)) AS u) u,
           (SELECT unnest(generate_series(0, 11)) AS v) v
      WHERE u.u <> v.v
        AND ('0x' || substr(md5('mce:' || CAST(u.u AS VARCHAR) || ':'
               || CAST(v.v AS VARCHAR)), 1, 4))::BIGINT % 4 = 0
    ),
    be AS (
      SELECT 0 AS u, k AS v, CAST(25 AS BIGINT) AS cap
      FROM (SELECT unnest(generate_series(1, 3)) AS k)
      UNION ALL
      SELECT k, 11, 25 FROM (SELECT unnest(generate_series(8, 10)) AS k)
    ),
    ed AS (
      SELECT u, v, max(cap) AS cap
      FROM (SELECT * FROM he UNION ALL SELECT * FROM be)
      GROUP BY 1, 2
    )
"""


@register_extra(
    "mincut_enumeration",
    f"""
    WITH {_MC_EDGES_SQL},
    masks AS (
      SELECT 1 + 2 * m AS mask
      FROM (SELECT unnest(generate_series(0, 1023)) AS m)
    ),
    cuts AS (
      SELECT m.mask,
             coalesce(sum(e.cap), 0) AS cut,
             count(e.cap) AS n_cut_edges
      FROM masks m
      LEFT JOIN ed e
        ON ((m.mask >> CAST(e.u AS INT)) & 1) = 1
       AND ((m.mask >> CAST(e.v AS INT)) & 1) = 0
      GROUP BY 1
    )
    SELECT CAST(cut AS BIGINT) AS min_cut,
           CAST(mask AS BIGINT) AS best_mask,
           CAST(n_cut_edges AS BIGINT) AS n_cut_edges
    FROM (SELECT *, row_number() OVER (ORDER BY cut, mask) AS rn
          FROM cuts)
    WHERE rn = 1
    """,
)
def mincut_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact s-t minimum cut by DISTRIBUTED subset enumeration — the
    max-flow value by strong duality, computed from the cut side:
    all 2^10 source-sets (s pinned in, t pinned out) fan out as a
    Spark range, each joined map-side against the broadcast edge list
    with the membership test pushed into the join predicate
    ((mask>>u)&1 = 1 and (mask>>v)&1 = 0), one partial-agg sum per
    mask, one argmin. The oracle is the same definition in SQL — this
    is the exhaustive-small-instance family (exact Shapley / Banzhaf /
    knapsack rows): augmenting-path algorithms are inherently
    sequential, but real workloads solve HUGE NUMBERS of small cuts
    (per-session bottlenecks, per-tenant capacity), and that
    parallelizes exactly like this. 12-node md5-derived capacitated
    digraph with pinned source/sink arcs; ties broken by lowest
    mask."""
    nodes = list(range(12))
    hp = spark.range(0, 12).select(F.col("id").alias("u"))
    hq = spark.range(0, 12).select(F.col("id").alias("v"))

    def _h2(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("u").cast("string"),
                        F.lit(":"),
                        F.col("v").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    he = (
        hp.crossJoin(hq)
        .filter(F.col("u") != F.col("v"))
        .filter(_h2("mce:") % 4 == 0)
        .select("u", "v", (_h2("mcc:") % 20 + 1).alias("cap"))
    )
    be = spark.createDataFrame(
        [(0, k, 25) for k in (1, 2, 3)]
        + [(k, 11, 25) for k in (8, 9, 10)],
        "u long, v long, cap long",
    )
    ed = (
        he.unionByName(be)
        .groupBy("u", "v")
        .agg(F.max("cap").alias("cap"))
        .localCheckpoint(eager=True)
    )
    masks = spark.range(0, 1024).select(
        (1 + 2 * F.col("id")).alias("mask")
    )
    cuts = (
        masks.join(
            F.broadcast(ed),
            (
                F.expr("(shiftright(mask, CAST(u AS INT)) & 1) = 1")
                & F.expr("(shiftright(mask, CAST(v AS INT)) & 1) = 0")
            ),
            "left",
        )
        .groupBy("mask")
        .agg(
            F.coalesce(F.sum("cap"), F.lit(0)).alias("cut"),
            F.count("cap").alias("n_cut_edges"),
        )
    )
    w = Window.orderBy("cut", "mask")
    return (
        cuts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cut").cast("long").alias("min_cut"),
            F.col("mask").cast("long").alias("best_mask"),
            F.col("n_cut_edges").cast("long").alias("n_cut_edges"),
        )
    )


# ----------------------------------------------------- 2-SAT via SCC


_SAT_CLAUSES_SQL = """
    cl AS (
      SELECT i.inst, c.c,
             ('0x' || substr(md5('s1:' || CAST(i.inst AS VARCHAR) || ':'
                || CAST(c.c AS VARCHAR)), 1, 5))::BIGINT % 20 AS l1,
             ('0x' || substr(md5('s2:' || CAST(i.inst AS VARCHAR) || ':'
                || CAST(c.c AS VARCHAR)), 1, 5))::BIGINT % 20 AS l2
      FROM (SELECT unnest(generate_series(0, 7)) AS inst) i,
           (SELECT unnest(generate_series(0, 21)) AS c) c
    )
"""


@register_extra(
    "two_sat_scc",
    f"""
    WITH {_SAT_CLAUSES_SQL},
    masks AS (SELECT unnest(generate_series(0, 1023)) AS a),
    ev AS (
      SELECT cl.inst, m.a, cl.c,
             CASE WHEN ((m.a >> CAST(cl.l1 // 2 AS INT)) & 1)
                       = 1 - cl.l1 % 2
                    OR ((m.a >> CAST(cl.l2 // 2 AS INT)) & 1)
                       = 1 - cl.l2 % 2
                  THEN 1 ELSE 0 END AS ok
      FROM cl, masks m
    ),
    sat_assign AS (
      SELECT inst, a FROM ev GROUP BY inst, a HAVING min(ok) = 1
    )
    SELECT c.inst,
           count(DISTINCT c.c) AS n_clauses,
           coalesce(s.n, 0) > 0 AS satisfiable,
           CAST(coalesce(s.n, 0) AS BIGINT) AS n_solutions
    FROM cl c
    LEFT JOIN (SELECT inst, count(*) AS n FROM sat_assign GROUP BY 1) s
      USING (inst)
    GROUP BY c.inst, s.n ORDER BY c.inst
    """,
)
def two_sat_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-SAT decided by the engine's DISTRIBUTED SCC operator — the
    classic reduction (Aspvall-Plass-Tarjan): each clause (l1 v l2)
    contributes implications not-l1 -> l2 and not-l2 -> l1; the formula
    is satisfiable iff no variable shares a strongly connected
    component with its own negation. Spark runs Orzan forward-min
    coloring + backward confinement (operators/graph.py::
    strongly_connected_components) over ALL 8 instances at once
    (literal nodes packed inst*100+lit — batching independent
    instances into one graph is the at-scale pattern); the oracle is
    the brute-force DEFINITION: evaluate every clause under all 2^10
    assignments and count satisfying ones. Solution COUNTS come from
    the oracle-side semantics; the Spark side reproduces them with the
    same distributed mask-join used by mincut_enumeration — while
    satisfiability itself is cross-checked against the SCC criterion
    at runtime (a mismatch raises, so the gate row also witnesses the
    reduction's correctness)."""
    from ..operators.graph import strongly_connected_components

    ii = spark.range(0, 8).select(F.col("id").alias("inst"))
    cc = spark.range(0, 22).select(F.col("id").alias("c"))

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("inst").cast("string"),
                        F.lit(":"),
                        F.col("c").cast("string"),
                    ).cast("binary")
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")

    cl = ii.crossJoin(cc).select(
        "inst", "c", (_h("s1:") % 20).alias("l1"), (_h("s2:") % 20).alias("l2")
    ).localCheckpoint(eager=True)
    # implication graph over packed literal nodes
    nid = lambda inst, lit: inst * 100 + lit  # noqa: E731
    neg = lambda lit: lit.bitwiseXOR(F.lit(1))  # noqa: E731
    e1 = cl.select(
        nid(F.col("inst"), neg(F.col("l1"))).alias("src"),
        nid(F.col("inst"), F.col("l2")).alias("dst"),
    )
    e2 = cl.select(
        nid(F.col("inst"), neg(F.col("l2"))).alias("src"),
        nid(F.col("inst"), F.col("l1")).alias("dst"),
    )
    edges = e1.unionAll(e2).distinct()
    verts = (
        ii.crossJoin(
            spark.range(0, 20).select(F.col("id").alias("lit"))
        )
        .select((F.col("inst") * 100 + F.col("lit")).alias("id"))
    )
    scc = strongly_connected_components(verts, edges)
    lab = scc.select(
        F.expr("id div 100").alias("inst"),
        F.pmod(F.col("id"), F.lit(100)).alias("lit"),
        F.col("scc_id"),
    )
    pos = lab.filter(F.pmod(F.col("lit"), F.lit(2)) == 0).select(
        "inst",
        F.expr("lit div 2").alias("var"),
        F.col("scc_id").alias("sp"),
    )
    ng = lab.filter(F.pmod(F.col("lit"), F.lit(2)) == 1).select(
        "inst",
        F.expr("lit div 2").alias("var"),
        F.col("scc_id").alias("sn"),
    )
    sat_scc = (
        pos.join(ng, ["inst", "var"])
        .groupBy("inst")
        .agg(
            F.min(
                F.when(F.col("sp") == F.col("sn"), 0).otherwise(1)
            ).alias("ok")
        )
        .select("inst", (F.col("ok") == 1).alias("sat_by_scc"))
    )
    # solution counts via the distributed mask join (oracle's semantics)
    masks = spark.range(0, 1024).select(F.col("id").alias("a"))
    ev = cl.crossJoin(F.broadcast(masks)).select(
        "inst",
        "a",
        F.when(
            (
                F.expr("(shiftright(a, CAST(l1 div 2 AS INT)) & 1)")
                == 1 - F.pmod(F.col("l1"), F.lit(2))
            )
            | (
                F.expr("(shiftright(a, CAST(l2 div 2 AS INT)) & 1)")
                == 1 - F.pmod(F.col("l2"), F.lit(2))
            ),
            1,
        )
        .otherwise(0)
        .alias("ok"),
    )
    sat_assign = (
        ev.groupBy("inst", "a")
        .agg(F.min("ok").alias("allok"))
        .filter(F.col("allok") == 1)
        .groupBy("inst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ncl = cl.groupBy("inst").agg(
        F.countDistinct("c").alias("n_clauses")
    )
    out = (
        ncl.join(sat_assign, "inst", "left")
        .join(sat_scc, "inst")
        .select(
            "inst",
            "n_clauses",
            (F.coalesce("n", F.lit(0)) > 0).alias("satisfiable"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_solutions"),
            "sat_by_scc",
        )
        .localCheckpoint(eager=True)
    )
    # the APT-reduction cross-check: SCC verdict must equal enumeration
    bad = out.filter(F.col("satisfiable") != F.col("sat_by_scc")).count()
    if bad:
        raise ValueError("2-SAT SCC criterion disagrees with enumeration")
    return out.select(
        "inst", "n_clauses", "satisfiable", "n_solutions"
    ).orderBy("inst")


# ------------------------------------------------- Held-Karp exact TSP


_TSP_CITIES_SQL = """
    cities AS (
      SELECT i,
             ('0x' || substr(md5('tcx:' || CAST(i AS VARCHAR)),
                             1, 4))::BIGINT % 100 AS cx,
             ('0x' || substr(md5('tcy:' || CAST(i AS VARCHAR)),
                             1, 4))::BIGINT % 100 AS cy
      FROM (SELECT unnest(generate_series(0, 7)) AS i)
    ),
    dist AS (
      SELECT a.i AS ci, b.i AS cj,
             abs(a.cx - b.cx) + abs(a.cy - b.cy) AS d
      FROM cities a, cities b
    )
"""


@register_extra(
    "tsp_held_karp",
    f"""
    WITH RECURSIVE {_TSP_CITIES_SQL},
    st(rem, cur, ln) AS (
      SELECT (SELECT list(i ORDER BY i) FROM cities WHERE i > 0),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM (SELECT 1)
      UNION ALL
      SELECT list_filter(st.rem, x -> x <> c.i), c.i,
             st.ln + dist.d
      FROM st
      JOIN cities c ON list_contains(st.rem, c.i)
      JOIN dist ON dist.ci = st.cur AND dist.cj = c.i
    ),
    tours AS (
      SELECT st.ln + dist.d AS total
      FROM st
      JOIN dist ON dist.ci = st.cur AND dist.cj = 0
      WHERE len(st.rem) = 0
    )
    SELECT CAST(min(total) AS BIGINT) AS min_len,
           CAST(count(*) FILTER (WHERE total =
             (SELECT min(total) FROM tours)) AS BIGINT) AS n_opt_tours
    FROM tours
    """,
)
def tsp_held_karp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact traveling-salesman tour by HELD-KARP dynamic programming,
    hash-gated against the EXHAUSTIVE DEFINITION — the strongest
    cross-derivation shape in the graph family: Spark iterates the
    subset-lattice DP dp(S, j) = min_i dp(S\\{{j}}, i) + d(i, j) in 7
    layered rounds (each layer one equi-join of the previous layer
    against the non-member cities + one partial-agg argmin per (S, j)
    state, with OPTIMAL-TOUR COUNTS carried as sums over min-achieving
    transitions — subset masks are plain integers, so state is
    fixed-width and the lattice distributes by mask), while the oracle
    enumerates ALL 5040 directed tours as a recursive list machine and
    takes the min and its multiplicity. DP and enumeration agree on
    BOTH the optimum and the number of optimal directed tours (always
    even — each undirected tour appears with its reversal). 8
    md5-placed cities, Manhattan metric, exact integers throughout.
    At real scale Held-Karp is how one solves MILLIONS of small
    routing instances (last-mile subproblems) in parallel; the
    route_2opt_sweeps row covers the large-instance heuristic side."""
    import hashlib

    def _mh(sstr: str) -> int:
        return int(hashlib.md5(sstr.encode()).hexdigest()[:4], 16)

    coords = [(_mh(f"tcx:{i}") % 100, _mh(f"tcy:{i}") % 100) for i in range(8)]
    dmat = [
        (i, j, abs(coords[i][0] - coords[j][0]) + abs(coords[i][1] - coords[j][1]))
        for i in range(8)
        for j in range(8)
    ]
    dist = spark.createDataFrame(dmat, "ci long, cj long, d long")
    distb = F.broadcast(dist)
    # base layer: dp({j}, j) = d(0, j)
    dp = (
        dist.filter((F.col("ci") == 0) & (F.col("cj") > 0))
        .select(
            F.expr(
                "CAST(shiftleft(1, CAST(cj - 1 AS INT)) AS BIGINT)"
            ).alias("mask"),
            F.col("cj").alias("j"),
            F.col("d").alias("ln"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(6):
        cand = (
            dp.join(
                distb.filter(F.col("cj") > 0),
                dp["j"] == F.col("ci"),
            )
            .filter(
                F.expr("(shiftright(mask, CAST(cj - 1 AS INT)) & 1) = 0")
            )
            .select(
                F.expr(
                    "mask | CAST(shiftleft(1, CAST(cj - 1 AS INT)) AS BIGINT)"
                ).alias("mask"),
                F.col("cj").alias("j"),
                (F.col("ln") + F.col("d")).alias("ln"),
                "cnt",
            )
        )
        mins = cand.groupBy("mask", "j").agg(F.min("ln").alias("ml"))
        dp = (
            cand.join(mins, ["mask", "j"])
            .filter(F.col("ln") == F.col("ml"))
            .groupBy("mask", "j")
            .agg(
                F.min("ln").alias("ln"), F.sum("cnt").alias("cnt")
            )
            .localCheckpoint(eager=True)
        )
    closing = (
        dp.filter(F.col("mask") == 127)
        .join(
            distb.filter(F.col("cj") == 0),
            dp["j"] == F.col("ci"),
        )
        .select((F.col("ln") + F.col("d")).alias("total"), "cnt")
    )
    best = closing.agg(F.min("total").alias("min_len"))
    return (
        closing.crossJoin(F.broadcast(best))
        .filter(F.col("total") == F.col("min_len"))
        .agg(
            F.min("min_len").cast("long").alias("min_len"),
            F.sum("cnt").cast("long").alias("n_opt_tours"),
        )
    )


# ------------------------------------------------------ Boruvka MST


_MST_EDGES_SQL = """
    d0 AS (
      SELECT user_id % 60 AS u,
             ('0x' || substr(md5('mst:' || CAST(event_id AS VARCHAR)),
                             1, 7))::BIGINT % 60 AS v
      FROM events
      WHERE ('0x' || substr(md5('mstg:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 7 = 0
    ),
    e AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM d0 WHERE u <> v
    ),
    ew AS (
      SELECT a, b, a * 100 + b AS eid,
             (('0x' || substr(md5('mw:' || CAST(a AS VARCHAR) || ':'
                || CAST(b AS VARCHAR)), 1, 7))::BIGINT % 100000)
             * 10000 + a * 100 + b AS w
      FROM e
    )
"""


@register_extra(
    "mst_boruvka",
    f"""
    WITH RECURSIVE {_MST_EDGES_SQL},
    el AS MATERIALIZED (
      SELECT list({{'a': a, 'b': b, 'eid': eid, 'w': w}}
                  ORDER BY w) AS el,
             count(*) AS n
      FROM ew
    ),
    n0 AS MATERIALIZED (
      SELECT list(DISTINCT x ORDER BY x) AS ns
      FROM (SELECT a AS x FROM e UNION SELECT b FROM e)
    ),
    st(i, lab, tw, ne, chk) AS (
      SELECT CAST(0 AS BIGINT), (SELECT ns FROM n0),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM (SELECT 1)
      UNION ALL
      SELECT s1.i,
             CASE WHEN s1.la <> s1.lb
                  THEN list_transform(s1.lab, x ->
                    CASE WHEN x = greatest(s1.la, s1.lb)
                         THEN least(s1.la, s1.lb) ELSE x END)
                  ELSE s1.lab END,
             s1.tw + CASE WHEN s1.la <> s1.lb THEN s1.ed.w ELSE 0 END,
             s1.ne + CASE WHEN s1.la <> s1.lb THEN 1 ELSE 0 END,
             s1.chk + CASE WHEN s1.la <> s1.lb THEN s1.ed.eid
                           ELSE 0 END
      FROM (
        SELECT st.i + 1 AS i, st.lab, st.tw, st.ne, st.chk,
               el.el[CAST(st.i + 1 AS INT)] AS ed,
               st.lab[CAST(list_position((SELECT ns FROM n0),
                 el.el[CAST(st.i + 1 AS INT)].a) AS INT)] AS la,
               st.lab[CAST(list_position((SELECT ns FROM n0),
                 el.el[CAST(st.i + 1 AS INT)].b) AS INT)] AS lb
        FROM st, el
        WHERE st.i < el.n
      ) s1
    )
    SELECT CAST(tw AS BIGINT) AS total_weight,
           CAST(ne AS BIGINT) AS n_edges,
           CAST(chk AS BIGINT) AS edge_chk
    FROM (SELECT *, row_number() OVER (ORDER BY i DESC) AS rn
          FROM st) WHERE rn = 1
    """,
)
def mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest by BORUVKA rounds vs a KRUSKAL oracle —
    two genuinely different MST algorithms agreeing edge-for-edge
    (weights packed with the edge id are strictly distinct, so the MST
    is unique and the comparison is exact). Spark runs the PARALLEL
    algorithm: each round every component picks its minimum outgoing
    edge (one partial-agg MIN per component label), the picked edges
    merge components via the engine's iterative min-label CC operator,
    and the component count at least halves — O(log n) rounds of
    join + agg, THE textbook distributed MST (it's what GraphX/Giraph
    implement). The oracle replays KRUSKAL as a single-row list
    machine: edges in ascending weight order, take iff endpoint labels
    differ, relabel. Outputs total weight, edge count (n - #components)
    and an exact edge-id checksum — all three must match across the
    two algorithms."""
    from ..operators.cluster import connected_components

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid_ = F.col("event_id").cast("string")

    def _h(prefix: str, col, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    u = F.pmod(F.col("user_id"), F.lit(60))
    v = _h("mst:", eid_, 7) % 60
    e = (
        ev.filter(_h("mstg:", eid_, 4) % 7 == 0)
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    ew = e.select(
        "a",
        "b",
        (F.col("a") * 100 + F.col("b")).alias("eid"),
        (
            (
                _h(
                    "mw:",
                    F.concat(
                        F.col("a").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    ),
                    7,
                )
                % 100000
            )
            * 10000
            + F.col("a") * 100
            + F.col("b")
        ).alias("w"),
    ).localCheckpoint(eager=True)
    nodes = (
        ew.select(F.col("a").alias("n"))
        .unionAll(ew.select(F.col("b").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = nodes.select("n", F.col("n").alias("c"))
    mst = None
    for _ in range(10):
        lw = ew.join(
            lab.select(F.col("n").alias("a"), F.col("c").alias("ca")), "a"
        ).join(
            lab.select(F.col("n").alias("b"), F.col("c").alias("cb")), "b"
        ).filter(F.col("ca") != F.col("cb"))
        if lw.isEmpty():
            break
        # min outgoing edge per component (both sides)
        cand = lw.select(F.col("ca").alias("comp"), "w", "eid").unionAll(
            lw.select(F.col("cb").alias("comp"), "w", "eid")
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min("w").alias("w"))
            .join(ew.select("w", "eid", "a", "b"), "w")
            .select("eid", "a", "b", "w")
            .distinct()
            .localCheckpoint(eager=True)
        )
        mst = picked if mst is None else mst.unionAll(picked).distinct()
        mst = mst.localCheckpoint(eager=True)
        # contract: CC over the picked edges on component ids
        comp_edges = picked.join(
            lab.select(F.col("n").alias("a"), F.col("c").alias("src")), "a"
        ).join(
            lab.select(F.col("n").alias("b"), F.col("c").alias("dst")), "b"
        ).select("src", "dst")
        comps = lab.select(F.col("c").alias("id")).distinct()
        cc = connected_components(comps, comp_edges)
        lab = (
            lab.join(
                cc.select(F.col("id").alias("c"), "component"),
                "c",
            )
            .select("n", F.col("component").alias("c"))
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError("boruvka did not converge in 10 rounds")
    if mst is None:
        return spark.createDataFrame(
            [(0, 0, 0)], "total_weight long, n_edges long, edge_chk long"
        )
    return mst.agg(
        F.sum("w").cast("long").alias("total_weight"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("eid").cast("long").alias("edge_chk"),
    )


# ------------------------------------------- betweenness centrality

# Completes the centrality family (pagerank / closeness / HITS rows):
# who BROKERS the network, not who sits near its middle. Exactness
# convention: betweenness is a sum of rationals sigma_sv*sigma_vt /
# sigma_st, so both engines compute the e6 fixed-point PER-PAIR-FLOORED
# sum — SUM((sigma_sv * sigma_vt * 1000000) // sigma_st) over unordered
# (s, t) pairs with d(s,v) + d(v,t) = d(s,t) — which is bit-identical
# integer arithmetic (documented: floor-per-term, not floor-of-sum).
_BETWEENNESS_ORACLE = """
WITH RECURSIVE e0 AS (
  SELECT user_id % 100 AS u,
         ('0x' || substr(md5('bw:' || CAST(event_id AS VARCHAR)),
                         1, 7))::BIGINT % 100 AS v
  FROM events
  WHERE ('0x' || substr(md5('bwgate:' || CAST(event_id AS VARCHAR)),
                        1, 4))::INT % 37 = 0
),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM e0 WHERE u <> v),
sym AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
reach(src, node, hops) AS (
  SELECT DISTINCT s, s, 0 FROM sym
  UNION
  SELECT r.src, s.d, r.hops + 1 FROM reach r JOIN sym s ON s.s = r.node
  WHERE r.hops < 12
),
d AS (SELECT src, node, min(hops) AS hops FROM reach GROUP BY 1, 2),
paths(src, node, hops) AS (
  SELECT DISTINCT s, s, 0 FROM sym
  UNION ALL
  SELECT p.src, e2.d, p.hops + 1
  FROM paths p JOIN sym e2 ON e2.s = p.node
  JOIN d dn ON dn.src = p.src AND dn.node = e2.d
           AND dn.hops = p.hops + 1
),
sig AS (SELECT src, node, count(*) AS sigma, min(hops) AS hops
        FROM paths GROUP BY 1, 2),
bc AS (
  SELECT sv.node AS node,
         sum(sv.sigma * tv.sigma * 1000000 // st.sigma) AS bc_e6,
         count(*) AS n_pairs
  FROM sig sv
  JOIN sig tv ON tv.node = sv.node
  JOIN sig st ON st.src = sv.src AND st.node = tv.src
  WHERE sv.src < tv.src AND sv.node <> sv.src AND sv.node <> tv.src
    AND sv.hops + tv.hops = st.hops
  GROUP BY 1
)
SELECT CAST(n.src AS BIGINT) AS node,
       CAST(COALESCE(bc.bc_e6, 0) AS BIGINT) AS bc_e6,
       CAST(COALESCE(bc.n_pairs, 0) AS BIGINT) AS n_pairs
FROM (SELECT DISTINCT s AS src FROM sym) n
LEFT JOIN bc ON bc.node = n.src
ORDER BY node
"""


@register("betweenness_centrality", _BETWEENNESS_ORACLE)
def betweenness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact betweenness centrality over the md5-derived undirected
    event graph via the pair-counting identity (see oracle comment):
    Spark runs the batched multi-source BFS CARRYING SHORTEST-PATH
    COUNTS (operators/graph.py::all_pairs_hops_sigma — one extra
    pair-key groupBy per level over all_pairs_hops), then assembles
    bc(v) as a three-way join of the (src, node, hops, sigma) table
    with itself: (s,v) x (t,v) co-partitioned ON v (the shuffle key),
    the (s,t) side a broadcast lookup. The oracle enumerates every
    individual shortest path through a dist-constrained recursive
    closure (traversal vs definition — the engines share no code
    path). Scale: exact betweenness is inherently all-pairs; the
    deployment shape at planet scale is source-sampled Brandes pivots
    — same operator, src side restricted, documented here rather than
    hidden behind a silent cap."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    a = F.pmod(F.col("user_id"), F.lit(100))
    b = _h("bw:", 7) % 100
    e = (
        ev.filter(_h("bwgate:", 4).cast("int") % 37 == 0)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sig = G.all_pairs_hops_sigma(e, max_hops=12).localCheckpoint(eager=True)
    sv = sig.select(
        F.col("src").alias("s"),
        F.col("node").alias("v"),
        F.col("hops").alias("h_sv"),
        F.col("sigma").alias("sig_sv"),
    )
    tv = sig.select(
        F.col("src").alias("t"),
        F.col("node").alias("v"),
        F.col("hops").alias("h_tv"),
        F.col("sigma").alias("sig_tv"),
    )
    st = sig.select(
        F.col("src").alias("s"),
        F.col("node").alias("t"),
        F.col("hops").alias("h_st"),
        F.col("sigma").alias("sig_st"),
    )
    triples = (
        sv.join(tv, "v")
        .filter(
            (F.col("s") < F.col("t"))
            & (F.col("v") != F.col("s"))
            & (F.col("v") != F.col("t"))
        )
        .join(F.broadcast(st), ["s", "t"])
        .filter(F.col("h_sv") + F.col("h_tv") == F.col("h_st"))
    )
    bc = triples.groupBy("v").agg(
        F.expr("sum(sig_sv * sig_tv * 1000000 div sig_st)").alias("bc_e6"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    nodes = sig.select(F.col("src").alias("node")).distinct()
    return (
        nodes.join(bc, nodes["node"] == bc["v"], "left")
        .select(
            F.col("node").cast("long").alias("node"),
            F.coalesce(F.col("bc_e6"), F.lit(0)).cast("long").alias("bc_e6"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        )
        .orderBy("node")
    )


# ------------------------------------------- Eulerian classification

# The Königsberg test: an undirected connected graph has an Euler
# CIRCUIT iff every vertex has even degree, an Euler PATH iff exactly
# two are odd — degree parity + connectivity, the two cheapest global
# facts dataflow can produce about a graph. Eight md5-derived graphs
# per dataset so every verdict branch occurs.
_EULER_ORACLE = """
WITH RECURSIVE e0 AS (
  SELECT ('0x' || substr(md5('eg:' || CAST(event_id AS VARCHAR)),
                         1, 4))::BIGINT % 8 AS gid,
         user_id % 40 AS u,
         ('0x' || substr(md5('ev:' || CAST(event_id AS VARCHAR)),
                         1, 7))::BIGINT % 40 AS v
  FROM events
  WHERE ('0x' || substr(md5('eu:' || CAST(event_id AS VARCHAR)),
                        1, 4))::BIGINT % 23 = 0
),
er AS (SELECT DISTINCT gid, least(u, v) AS a, greatest(u, v) AS b
      FROM e0 WHERE u <> v),
-- engineered verdict fixtures: gid 8 = 10-cycle (all even -> circuit),
-- gid 9 = 10-path (two odd ends -> path)
e AS (
  SELECT * FROM er
  UNION ALL
  SELECT 8, least(n_nationkey, (n_nationkey + 1) % 10),
         greatest(n_nationkey, (n_nationkey + 1) % 10)
  FROM nation WHERE n_nationkey < 10
  UNION ALL
  SELECT 9, n_nationkey, n_nationkey + 1
  FROM nation WHERE n_nationkey < 9
),
sym AS (SELECT gid, a AS s, b AS d FROM e
        UNION ALL SELECT gid, b, a FROM e),
deg AS (SELECT gid, s AS v, count(*) AS degree FROM sym GROUP BY 1, 2),
reach(gid, src, node) AS (
  SELECT gid, s, s FROM sym
  UNION
  SELECT r.gid, r.src, s.d FROM reach r
  JOIN sym s ON s.gid = r.gid AND s.s = r.node
),
comp AS (SELECT gid, src AS v, min(node) AS lbl
         FROM reach GROUP BY 1, 2),
g AS (
  SELECT deg.gid,
         count(*) AS n_vertices,
         count(*) FILTER (WHERE degree % 2 = 1) AS n_odd,
         count(DISTINCT comp.lbl) AS n_components
  FROM deg JOIN comp ON comp.gid = deg.gid AND comp.v = deg.v
  GROUP BY 1
),
m AS (SELECT gid, count(*) AS n_edges FROM e GROUP BY 1)
SELECT CAST(g.gid AS INT) AS graph_id,
       CAST(n_vertices AS INT) AS n_vertices,
       CAST(n_edges AS INT) AS n_edges,
       CAST(n_odd AS INT) AS n_odd,
       CAST(n_components AS INT) AS n_components,
       CASE WHEN n_components > 1 THEN 'none'
            WHEN n_odd = 0 THEN 'circuit'
            WHEN n_odd = 2 THEN 'path'
            ELSE 'none' END AS euler
FROM g JOIN m ON m.gid = g.gid
ORDER BY graph_id
"""


@register_extra("euler_path_classify", _EULER_ORACLE)
def euler_path_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eulerian circuit/path/none classification per md5-derived graph
    (see oracle comment). Degrees are one partial-agg groupBy;
    connectivity is min-label propagation iterated TO FIXPOINT (the
    loop exits when a round changes nothing, so worst-case path
    graphs converge exactly — no silent round cap); the oracle walks
    a recursive closure instead. Per-round cost is one neighbor
    equi-join + min agg on (graph, vertex) keys."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    e = (
        ev.filter(_h("eu:", 4) % 23 == 0)
        .select(
            (_h("eg:", 4) % 8).alias("gid"),
            F.least(
                F.pmod(F.col("user_id"), F.lit(40)), _h("ev:", 7) % 40
            ).alias("a"),
            F.greatest(
                F.pmod(F.col("user_id"), F.lit(40)), _h("ev:", 7) % 40
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cyc = nat.filter(F.col("n_nationkey") < 10).select(
        F.lit(8).cast("long").alias("gid"),
        F.least(
            F.col("n_nationkey").cast("long"),
            ((F.col("n_nationkey") + 1) % 10).cast("long"),
        ).alias("a"),
        F.greatest(
            F.col("n_nationkey").cast("long"),
            ((F.col("n_nationkey") + 1) % 10).cast("long"),
        ).alias("b"),
    )
    pth = nat.filter(F.col("n_nationkey") < 9).select(
        F.lit(9).cast("long").alias("gid"),
        F.col("n_nationkey").cast("long").alias("a"),
        (F.col("n_nationkey") + 1).cast("long").alias("b"),
    )
    e = e.unionByName(cyc).unionByName(pth).localCheckpoint(eager=True)
    sym = e.select("gid", F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
        e.select("gid", F.col("b").alias("s"), F.col("a").alias("d"))
    )
    deg = sym.groupBy("gid", F.col("s").alias("v")).agg(
        F.count("*").alias("degree")
    )
    labels = deg.select("gid", "v", F.col("v").alias("lbl")).localCheckpoint(
        eager=True
    )
    while True:
        nbr = labels.select(
            F.col("gid").alias("_g"), F.col("v").alias("_v"), F.col("lbl").alias("_l")
        )
        prop = (
            sym.join(
                nbr, (F.col("_g") == F.col("gid")) & (F.col("_v") == F.col("d"))
            )
            .groupBy("gid", F.col("s").alias("v"))
            .agg(F.min("_l").alias("nl"))
        )
        merged = (
            labels.join(prop, ["gid", "v"], "left")
            .select(
                "gid",
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias(
                    "nlbl"
                ),
                "lbl",
            )
            .localCheckpoint(eager=True)
        )
        if merged.filter(F.col("nlbl") < F.col("lbl")).isEmpty():
            labels = merged.select("gid", "v", F.col("nlbl").alias("lbl"))
            break
        labels = merged.select("gid", "v", F.col("nlbl").alias("lbl")).localCheckpoint(
            eager=True
        )
    g = (
        deg.join(labels, ["gid", "v"])
        .groupBy("gid")
        .agg(
            F.count("*").alias("n_vertices"),
            F.count(F.when(F.col("degree") % 2 == 1, 1)).alias("n_odd"),
            F.countDistinct("lbl").alias("n_components"),
        )
    )
    m = e.groupBy("gid").agg(F.count("*").alias("n_edges"))
    return (
        g.join(m, "gid")
        .select(
            F.col("gid").cast("int").alias("graph_id"),
            F.col("n_vertices").cast("int"),
            F.col("n_edges").cast("int"),
            F.col("n_odd").cast("int"),
            F.col("n_components").cast("int"),
            F.when(F.col("n_components") > 1, "none")
            .when(F.col("n_odd") == 0, "circuit")
            .when(F.col("n_odd") == 2, "path")
            .otherwise("none")
            .alias("euler"),
        )
        .orderBy("graph_id")
    )


# ------------------------------------------- Weisfeiler-Lehman colors

# 1-WL color refinement — the graph-isomorphism signature behind GNN
# expressiveness results: c0 = degree; ck = md5(ck-1 || ':' || the
# SORTED concat of neighbors' ck-1). Three rounds over six md5 graphs
# plus an engineered ISOMORPHIC PAIR (a 10-path and its relabeling,
# gids 6/7) whose round-3 color histograms must be identical — the WL
# invariance is visible in the gated rows themselves.
_WL_ORACLE = """
WITH e0 AS (
  SELECT ('0x' || substr(md5('wg:' || CAST(event_id AS VARCHAR)),
                         1, 4))::BIGINT % 6 AS gid,
         user_id % 30 AS u,
         ('0x' || substr(md5('wv:' || CAST(event_id AS VARCHAR)),
                         1, 7))::BIGINT % 30 AS v
  FROM events
  WHERE ('0x' || substr(md5('wu:' || CAST(event_id AS VARCHAR)),
                        1, 4))::BIGINT % 29 = 0
),
er AS (SELECT DISTINCT gid, least(u, v) AS a, greatest(u, v) AS b
       FROM e0 WHERE u <> v),
e AS (
  SELECT * FROM er
  UNION ALL
  SELECT 6, n_nationkey, n_nationkey + 1 FROM nation WHERE n_nationkey < 9
  UNION ALL
  SELECT 7, least((n_nationkey * 7 + 3) % 31, (n_nationkey * 7 + 10) % 31),
         greatest((n_nationkey * 7 + 3) % 31, (n_nationkey * 7 + 10) % 31)
  FROM nation WHERE n_nationkey < 9
),
sym AS (SELECT gid, a AS s, b AS d FROM e
        UNION ALL SELECT gid, b, a FROM e),
c0 AS (SELECT gid, s AS v, CAST(count(*) AS VARCHAR) AS c
       FROM sym GROUP BY 1, 2),
c1 AS (
  SELECT a.gid, a.v,
         substr(md5(a.c || ':' || string_agg(n.c, ',' ORDER BY n.c)),
                1, 8) AS c
  FROM c0 a JOIN sym s ON s.gid = a.gid AND s.s = a.v
  JOIN c0 n ON n.gid = a.gid AND n.v = s.d
  GROUP BY a.gid, a.v, a.c
),
c2 AS (
  SELECT a.gid, a.v,
         substr(md5(a.c || ':' || string_agg(n.c, ',' ORDER BY n.c)),
                1, 8) AS c
  FROM c1 a JOIN sym s ON s.gid = a.gid AND s.s = a.v
  JOIN c1 n ON n.gid = a.gid AND n.v = s.d
  GROUP BY a.gid, a.v, a.c
),
c3 AS (
  SELECT a.gid, a.v,
         substr(md5(a.c || ':' || string_agg(n.c, ',' ORDER BY n.c)),
                1, 8) AS c
  FROM c2 a JOIN sym s ON s.gid = a.gid AND s.s = a.v
  JOIN c2 n ON n.gid = a.gid AND n.v = s.d
  GROUP BY a.gid, a.v, a.c
)
SELECT CAST(gid AS INT) AS graph_id, c AS wl_color,
       CAST(count(*) AS INT) AS n_nodes
FROM c3 GROUP BY 1, 2 ORDER BY graph_id, wl_color
"""


@register_extra("wl_color_refinement", _WL_ORACLE)
def wl_color_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of 1-WL color refinement (see oracle comment) —
    each round is one neighbor equi-join + an ordered string_agg on
    the vertex key, the message-passing shuffle shape of every GNN
    layer; colors are 8-hex md5 digests so the per-round state is
    fixed-width however deep the refinement. The gid 6/7 rows are an
    isomorphic pair whose histograms must coincide."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    er = (
        ev.filter(_h("wu:", 4) % 29 == 0)
        .select(
            (_h("wg:", 4) % 6).alias("gid"),
            F.least(F.pmod(F.col("user_id"), F.lit(30)), _h("wv:", 7) % 30).alias("a"),
            F.greatest(
                F.pmod(F.col("user_id"), F.lit(30)), _h("wv:", 7) % 30
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_nationkey") < 9
    )
    p1 = nat.select(
        F.lit(6).cast("long").alias("gid"),
        F.col("n_nationkey").cast("long").alias("a"),
        (F.col("n_nationkey") + 1).cast("long").alias("b"),
    )
    lo = (F.col("n_nationkey") * 7 + 3) % 31
    hi = (F.col("n_nationkey") * 7 + 10) % 31
    p2 = nat.select(
        F.lit(7).cast("long").alias("gid"),
        F.least(lo, hi).cast("long").alias("a"),
        F.greatest(lo, hi).cast("long").alias("b"),
    )
    e = er.unionByName(p1).unionByName(p2).localCheckpoint(eager=True)
    sym = e.select("gid", F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
        e.select("gid", F.col("b").alias("s"), F.col("a").alias("d"))
    )
    colors = sym.groupBy("gid", F.col("s").alias("v")).agg(
        F.count("*").cast("string").alias("c")
    )
    for _ in range(3):
        edges2 = sym.select(
            F.col("gid").alias("sg"),
            F.col("s").alias("sv"),
            F.col("d").alias("sd"),
        )
        own = colors.select(
            F.col("gid").alias("og"), F.col("v").alias("ov"), F.col("c").alias("oc")
        )
        nbr = colors.select(
            F.col("gid").alias("_g"), F.col("v").alias("_v"), F.col("c").alias("_c")
        )
        colors = (
            edges2.join(
                own, (F.col("og") == F.col("sg")) & (F.col("ov") == F.col("sv"))
            )
            .join(
                nbr, (F.col("_g") == F.col("sg")) & (F.col("_v") == F.col("sd"))
            )
            .groupBy("sg", "sv", "oc")
            .agg(
                F.expr("concat_ws(',', array_sort(collect_list(_c)))").alias(
                    "nc"
                )
            )
            .select(
                F.col("sg").alias("gid"),
                F.col("sv").alias("v"),
                F.substring(
                    F.md5(
                        F.concat(F.col("oc"), F.lit(":"), F.col("nc")).cast(
                            "binary"
                        )
                    ),
                    1,
                    8,
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        colors.groupBy("gid", F.col("c").alias("wl_color"))
        .agg(F.count("*").cast("int").alias("n_nodes"))
        .select(
            F.col("gid").cast("int").alias("graph_id"), "wl_color", "n_nodes"
        )
        .orderBy("graph_id", "wl_color")
    )


# ------------------------------------------- vector clock causality

# Vector clocks (Fidge/Mattern 1988) over a deterministic 8-actor
# message DAG: each actor's first 12 events (by ts) form its process
# chain; an md5 gate turns ~1/3 of events into receives of a message
# from an earlier event of another actor (s' < s keeps the graph
# acyclic by construction). VC(e) per actor = max ancestor seq of
# that actor. The non-vacuity hook is the VC THEOREM itself: e -> f
# iff VC(e) dominates componentwise — so each event's ancestor count
# from the transitive closure (n_before) must EQUAL the count of
# events whose full 8-vector is dominated (n_vc_dominated); the gate
# hash freezes both numbers per event.
_VC_ORACLE = """
WITH RECURSIVE ev AS MATERIALIZED (
  SELECT user_id % 8 AS a,
         row_number() OVER (PARTITION BY user_id % 8
                            ORDER BY ts, event_id) AS s
  FROM events QUALIFY s <= 12
),
nodes AS MATERIALIZED (SELECT a, CAST(s AS BIGINT) AS s FROM ev),
edges AS MATERIALIZED (
  SELECT a AS fa, s - 1 AS fs, a AS ta, s AS ts FROM nodes WHERE s >= 2
  UNION ALL
  SELECT (a + 1 + ('0x' || substr(md5('vb:' || CAST(a AS VARCHAR) || ':'
            || CAST(s AS VARCHAR)), 1, 4))::BIGINT % 7) % 8,
         s - 1 - ('0x' || substr(md5('vd:' || CAST(a AS VARCHAR) || ':'
            || CAST(s AS VARCHAR)), 1, 4))::BIGINT % 2,
         a, s
  FROM nodes
  WHERE s >= 2
    AND ('0x' || substr(md5('vc:' || CAST(a AS VARCHAR) || ':'
          || CAST(s AS VARCHAR)), 1, 4))::BIGINT % 3 = 0
    AND s - 1 - ('0x' || substr(md5('vd:' || CAST(a AS VARCHAR) || ':'
          || CAST(s AS VARCHAR)), 1, 4))::BIGINT % 2 >= 1
),
reach(fa, fs, ta, ts) AS (
  SELECT fa, fs, ta, ts FROM edges
  UNION
  SELECT r.fa, r.fs, e.ta, e.ts
  FROM reach r JOIN edges e ON e.fa = r.ta AND e.fs = r.ts
),
anc AS MATERIALIZED (
  -- reflexive ancestors
  SELECT ta AS a, ts AS s, fa AS ba, fs AS bs FROM reach
  UNION
  SELECT a, s, a, s FROM nodes
),
vc AS MATERIALIZED (
  SELECT n.a, n.s,
         coalesce(max(CASE WHEN x.ba = 0 THEN x.bs END), 0) AS vc0,
         coalesce(max(CASE WHEN x.ba = 1 THEN x.bs END), 0) AS vc1,
         coalesce(max(CASE WHEN x.ba = 2 THEN x.bs END), 0) AS vc2,
         coalesce(max(CASE WHEN x.ba = 3 THEN x.bs END), 0) AS vc3,
         coalesce(max(CASE WHEN x.ba = 4 THEN x.bs END), 0) AS vc4,
         coalesce(max(CASE WHEN x.ba = 5 THEN x.bs END), 0) AS vc5,
         coalesce(max(CASE WHEN x.ba = 6 THEN x.bs END), 0) AS vc6,
         coalesce(max(CASE WHEN x.ba = 7 THEN x.bs END), 0) AS vc7
  FROM nodes n JOIN anc x ON x.a = n.a AND x.s = n.s
  GROUP BY n.a, n.s
),
nb AS MATERIALIZED (
  SELECT a, s, count(*) - 1 AS n_before
  FROM anc GROUP BY a, s
),
dom AS MATERIALIZED (
  SELECT e.a, e.s, count(*) AS n_dom
  FROM vc e JOIN vc f
    ON f.vc0 <= e.vc0 AND f.vc1 <= e.vc1 AND f.vc2 <= e.vc2
   AND f.vc3 <= e.vc3 AND f.vc4 <= e.vc4 AND f.vc5 <= e.vc5
   AND f.vc6 <= e.vc6 AND f.vc7 <= e.vc7
   AND NOT (f.a = e.a AND f.s = e.s)
  GROUP BY e.a, e.s
)
SELECT CAST(v.a AS INT) AS actor, CAST(v.s AS INT) AS seq,
       vc0, vc1, vc2, vc3, vc4, vc5, vc6, vc7,
       CAST(n.n_before AS BIGINT) AS n_before,
       CAST(coalesce(d.n_dom, 0) AS BIGINT) AS n_vc_dominated
FROM vc v
JOIN nb n ON n.a = v.a AND n.s = v.s
LEFT JOIN dom d ON d.a = v.a AND d.s = v.s
ORDER BY actor, seq
"""


@register_extra("vector_clock_causality", _VC_ORACLE)
def vector_clock_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector clocks + the Fidge/Mattern causality theorem as a
    self-auditing pair (see oracle comment). Plan: the sampled DAG is
    actor-bounded (8 x 12 nodes) regardless of fact size — one window
    rank samples it; the transitive closure runs as pointer-doubling
    joins (4 rounds covers depth 16 > 12 levels); VC assembly and the
    domination join are dim-sized. At 100 TB only the first window
    pass touches the fact table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("a").orderBy("ts", "event_id")
    nodes = (
        ev.select((F.col("user_id") % 8).alias("a"), "ts", "event_id")
        .withColumn("s", F.row_number().over(w).cast("long"))
        .filter(F.col("s") <= 12)
        .select("a", "s")
        .localCheckpoint(eager=True)
    )

    def _h4(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("a").cast("string"),
                        F.lit(":"),
                        F.col("s").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    chain = nodes.filter(F.col("s") >= 2).select(
        F.col("a").alias("fa"),
        (F.col("s") - 1).alias("fs"),
        F.col("a").alias("ta"),
        F.col("s").alias("ts"),
    )
    recv = (
        nodes.filter(F.col("s") >= 2)
        .filter(_h4("vc:") % 3 == 0)
        .withColumn("sp", F.col("s") - 1 - _h4("vd:") % 2)
        .filter(F.col("sp") >= 1)
        .select(
            ((F.col("a") + 1 + _h4("vb:") % 7) % 8).alias("fa"),
            F.col("sp").alias("fs"),
            F.col("a").alias("ta"),
            F.col("s").alias("ts"),
        )
    )
    edges = chain.unionByName(recv).localCheckpoint(eager=True)
    reach = edges
    for _ in range(4):  # doubling: covers path depth 16 > 12 levels
        r2 = reach.alias("x").join(
            reach.alias("y"),
            (F.col("y.fa") == F.col("x.ta")) & (F.col("y.fs") == F.col("x.ts")),
        ).select(
            F.col("x.fa").alias("fa"),
            F.col("x.fs").alias("fs"),
            F.col("y.ta").alias("ta"),
            F.col("y.ts").alias("ts"),
        )
        reach = reach.unionByName(r2).distinct().localCheckpoint(eager=True)
    anc = (
        reach.select(
            F.col("ta").alias("a"),
            F.col("ts").alias("s"),
            F.col("fa").alias("ba"),
            F.col("fs").alias("bs"),
        )
        .unionByName(
            nodes.select(
                "a", "s", F.col("a").alias("ba"), F.col("s").alias("bs")
            )
        )
        .distinct()
    )
    aggs = [
        F.coalesce(
            F.max(F.when(F.col("ba") == b, F.col("bs"))), F.lit(0)
        ).alias(f"vc{b}")
        for b in range(8)
    ]
    vc = anc.groupBy("a", "s").agg(
        *aggs, (F.count(F.lit(1)) - 1).alias("n_before")
    )
    e = vc.select(
        F.col("a").alias("ea"),
        F.col("s").alias("es"),
        F.col("n_before"),
        *[F.col(f"vc{b}").alias(f"e{b}") for b in range(8)],
    )
    f = vc.select(
        F.col("a").alias("fa2"),
        F.col("s").alias("fs2"),
        *[F.col(f"vc{b}").alias(f"f{b}") for b in range(8)],
    )
    cond = (~((F.col("fa2") == F.col("ea")) & (F.col("fs2") == F.col("es"))))
    for b in range(8):
        cond = cond & (F.col(f"f{b}") <= F.col(f"e{b}"))
    dom = (
        e.join(f, cond, "left")
        .groupBy("ea", "es", "n_before", *[f"e{b}" for b in range(8)])
        .agg(F.count(F.col("fa2")).alias("n_dom"))
    )
    return dom.select(
        F.col("ea").cast("int").alias("actor"),
        F.col("es").cast("int").alias("seq"),
        *[F.col(f"e{b}").cast("long").alias(f"vc{b}") for b in range(8)],
        F.col("n_before").cast("long"),
        F.col("n_dom").cast("long").alias("n_vc_dominated"),
    ).orderBy("actor", "seq")


# ------------------------------------ Hall condition / König duality

# Hall's marriage theorem (1935) + König-Egerváry duality: for an
# 8x8 bipartite graph the maximum matching equals n minus the worst
# Hall deficiency max_S(|S| - |N(S)|) — computed EXACTLY by
# enumerating all 255 nonempty left subsets as bitmasks, with |N(S)|
# a bit_or aggregate over member adjacency masks. The witness subset
# (smallest mask attaining the worst deficiency) and the matching
# size are hash-frozen; tests referee the matching size against an
# independent augmenting-path matcher. 40 md5 graphs, edge density
# 1/3.
_HALL_ORACLE = """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 40 AS g FROM part
),
adj AS MATERIALIZED (
  SELECT g, v.v,
         CAST(sum(CASE WHEN ('0x' || substr(md5('hl:'
                || CAST(g AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)
                || ':' || CAST(u.u AS VARCHAR)), 1, 4))::BIGINT % 3 = 0
              THEN 1 << u.u ELSE 0 END) AS BIGINT) AS amask
  FROM grp,
       (SELECT unnest(generate_series(0, 7)) AS v) v,
       (SELECT unnest(generate_series(0, 7)) AS u) u
  GROUP BY g, v.v
),
subsets AS MATERIALIZED (
  SELECT grp.g, m.m, count(*) AS sz,
         bit_count(bit_or(a.amask)) AS nbs
  FROM (SELECT unnest(generate_series(1, 255)) AS m) m
  CROSS JOIN grp
  JOIN adj a ON a.g = grp.g AND ((m.m >> a.v) & 1) = 1
  GROUP BY grp.g, m.m
),
defs AS MATERIALIZED (
  SELECT g, m, sz - nbs AS def,
         max(sz - nbs) OVER (PARTITION BY g) AS maxdef
  FROM subsets
)
SELECT CAST(d.g AS BIGINT) AS g,
       CAST(e.n_edges AS BIGINT) AS n_edges,
       CAST(greatest(d.maxdef, 0) AS BIGINT) AS hall_deficiency,
       CAST(8 - greatest(d.maxdef, 0) AS BIGINT) AS matching_size,
       CAST(min(CASE WHEN d.def = d.maxdef THEN d.m END) AS BIGINT)
         AS witness_mask,
       CAST(CASE WHEN d.maxdef <= 0 THEN 1 ELSE 0 END AS INT)
         AS hall_satisfied
FROM defs d
JOIN (SELECT g, sum(bit_count(amask)) AS n_edges FROM adj GROUP BY g) e
  ON e.g = d.g
GROUP BY d.g, d.maxdef, e.n_edges
ORDER BY g
"""


@register_extra("hall_konig_matching", _HALL_ORACLE)
def hall_konig_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hall/König maximum matching via subset-lattice deficiency (see
    oracle comment). Plan: graphs are dim-sized (40 x 8 adjacency
    masks); the 255-mask explode is a broadcast cross join + one
    bit_or partial agg — exhaustive-combinatorics work that stays
    O(graphs x 2^n), never fact-sized."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    sess = p.sparkSession
    grp = p.select((F.col("p_partkey") % 40).alias("g")).distinct()
    vs = sess.range(0, 8).select(F.col("id").cast("int").alias("v"))
    us = sess.range(0, 8).select(F.col("id").cast("int").alias("u"))
    adj = (
        grp.crossJoin(F.broadcast(vs))
        .crossJoin(F.broadcast(us))
        .select(
            "g",
            "v",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("hl:"),
                                F.col("g").cast("string"),
                                F.lit(":"),
                                F.col("v").cast("string"),
                                F.lit(":"),
                                F.col("u").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 3
                == 0,
                F.expr("CAST(1 AS BIGINT) << u"),
            )
            .otherwise(0)
            .alias("bit"),
        )
        .groupBy("g", "v")
        .agg(F.sum("bit").cast("long").alias("amask"))
        .localCheckpoint(eager=True)
    )
    masks = sess.range(1, 256).select(F.col("id").cast("int").alias("m"))
    subsets = (
        grp.crossJoin(F.broadcast(masks))
        .join(adj, "g")
        .filter(F.expr("((m >> v) & 1) = 1"))
        .groupBy("g", "m")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.expr("bit_count(bit_or(amask))").alias("nbs"),
        )
    )
    defs = subsets.withColumn("def", F.col("sz") - F.col("nbs")).withColumn(
        "maxdef", F.max("def").over(Window.partitionBy("g"))
    )
    edges = adj.groupBy("g").agg(
        F.expr("sum(bit_count(amask))").alias("n_edges")
    )
    return (
        defs.groupBy("g", "maxdef")
        .agg(
            F.min(F.when(F.col("def") == F.col("maxdef"), F.col("m"))).alias(
                "witness_mask"
            )
        )
        .join(F.broadcast(edges), "g")
        .select(
            F.col("g").cast("long"),
            F.col("n_edges").cast("long"),
            F.greatest(F.col("maxdef"), F.lit(0))
            .cast("long")
            .alias("hall_deficiency"),
            (8 - F.greatest(F.col("maxdef"), F.lit(0)))
            .cast("long")
            .alias("matching_size"),
            F.col("witness_mask").cast("long"),
            F.when(F.col("maxdef") <= 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("hall_satisfied"),
        )
        .orderBy("g")
    )


# ------------------------------------------------ Conway's Life

# Conway's Game of Life (1970) in the SPARSE relational formulation —
# the way a distributed engine actually runs a cellular automaton at
# scale: live cells are rows, each round fans every cell out to its 8
# toroidal neighbors, a partial-agg count per cell gives the
# neighborhood sum, and B3/S23 is one join back to the current
# generation. 16x16 torus, 8 generations, staged MATERIALIZED rounds.
# Fixtures ride next to md5 soups: the GLIDER (g=-1) must translate
# by exactly (+2,+2) in 8 generations (its checksum is engineered to
# shift by a known amount), the BLINKER (g=-2) has period 2 and the
# BLOCK (g=-3) is a still life — population and checksum per grid
# are hash-frozen at both generation 0 and 8; tests referee every
# grid against a brute-force Python replay.
_LIFE_ROUND_SQL = """
nb{r} AS MATERIALIZED (
  SELECT g, (r + dr + 16) % 16 AS r, (c + dc + 16) % 16 AS c,
         count(*) AS cnt
  FROM s{p}
  CROSS JOIN (SELECT dr, dc
              FROM (SELECT unnest([-1, 0, 1]) AS dr) a,
                   (SELECT unnest([-1, 0, 1]) AS dc) b
              WHERE NOT (dr = 0 AND dc = 0)) o
  GROUP BY 1, 2, 3
),
s{r} AS MATERIALIZED (
  SELECT n.g, n.r, n.c
  FROM nb{r} n
  LEFT JOIN s{p} s ON s.g = n.g AND s.r = n.r AND s.c = n.c
  WHERE n.cnt = 3 OR (n.cnt = 2 AND s.g IS NOT NULL)
)
"""

_LIFE_ORACLE = (
    """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 60 AS g FROM part
),
cells AS MATERIALIZED (
  SELECT g, r.r, c.c
  FROM grp,
       (SELECT unnest(generate_series(0, 15)) AS r) r,
       (SELECT unnest(generate_series(0, 15)) AS c) c
  WHERE ('0x' || substr(md5('lf:' || CAST(g AS VARCHAR) || ':'
           || CAST(r.r AS VARCHAR) || ':' || CAST(c.c AS VARCHAR)),
           1, 4))::BIGINT % 100 < 35
),
s0 AS MATERIALIZED (
  SELECT g, r, c FROM cells
  UNION ALL
  SELECT * FROM (VALUES
    (-1, 1, 2), (-1, 2, 3), (-1, 3, 1), (-1, 3, 2), (-1, 3, 3),
    (-2, 7, 6), (-2, 7, 7), (-2, 7, 8),
    (-3, 10, 10), (-3, 10, 11), (-3, 11, 10), (-3, 11, 11)
  ) v(g, r, c)
),
"""
    + ",".join(
        _LIFE_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, 9)
    )
    + """
, pops AS (
  SELECT g, 0 AS gen, count(*) AS population,
         sum(r * 1000 + c + 1) AS checksum
  FROM s0 GROUP BY g
  UNION ALL
  SELECT g, 8, count(*), sum(r * 1000 + c + 1) FROM s8 GROUP BY g
)
SELECT CAST(g AS BIGINT) AS g, CAST(gen AS INT) AS gen,
       CAST(population AS BIGINT) AS population,
       CAST(coalesce(checksum, 0) AS BIGINT) AS checksum
FROM pops ORDER BY g, gen
"""
)


@register_extra("game_of_life_rounds", _LIFE_ORACLE)
def game_of_life_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse relational Game of Life (see oracle comment). Each
    round: one 8-way fanout projection, one (g, r, c)-keyed partial
    agg, one join back — the canonical sparse-CA shape that scales by
    sharding cell keys; rounds are lineage-cut per the janino
    invariant."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    grp = p.select((F.col("p_partkey") % 60).alias("g")).distinct()
    sess = p.sparkSession
    rr = sess.range(0, 16).select(F.col("id").cast("int").alias("r"))
    cc = sess.range(0, 16).select(F.col("id").cast("int").alias("c"))
    cells = (
        grp.crossJoin(F.broadcast(rr))
        .crossJoin(F.broadcast(cc))
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lf:"),
                            F.col("g").cast("string"),
                            F.lit(":"),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("c").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 100
            < 35
        )
        .select("g", "r", "c")
    )
    fixtures = sess.createDataFrame(
        [
            (-1, 1, 2), (-1, 2, 3), (-1, 3, 1), (-1, 3, 2), (-1, 3, 3),
            (-2, 7, 6), (-2, 7, 7), (-2, 7, 8),
            (-3, 10, 10), (-3, 10, 11), (-3, 11, 10), (-3, 11, 11),
        ],
        "g long, r int, c int",
    )
    state = cells.unionByName(fixtures).localCheckpoint(eager=True)
    s0 = state
    offsets = sess.createDataFrame(
        [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
         if (dr, dc) != (0, 0)],
        "dr int, dc int",
    )
    for _ in range(8):
        nb = (
            state.crossJoin(F.broadcast(offsets))
            .select(
                "g",
                ((F.col("r") + F.col("dr") + 16) % 16).alias("r"),
                ((F.col("c") + F.col("dc") + 16) % 16).alias("c"),
            )
            .groupBy("g", "r", "c")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        state = (
            nb.join(
                state.withColumn("alive", F.lit(1)), ["g", "r", "c"], "left"
            )
            .filter(
                (F.col("cnt") == 3)
                | ((F.col("cnt") == 2) & (F.col("alive") == 1))
            )
            .select("g", "r", "c")
            .localCheckpoint(eager=True)
        )

    def pops(df, gen):
        return df.groupBy("g").agg(
            F.lit(gen).cast("int").alias("gen"),
            F.count(F.lit(1)).alias("population"),
            F.sum(F.col("r") * 1000 + F.col("c") + 1).alias("checksum"),
        )

    return (
        pops(s0, 0)
        .unionByName(pops(state, 8))
        .select(
            F.col("g").cast("long"),
            "gen",
            F.col("population").cast("long"),
            F.coalesce(F.col("checksum"), F.lit(0)).cast("long")
            .alias("checksum"),
        )
        .orderBy("g", "gen")
    )


# ------------------------------------------------ Chord DHT lookups

# Chord (Stoica et al. 2001) — the distributed hash table whose
# finger-table lookup touches O(log n) nodes: 32 md5 node ids on a
# 1024-slot ring, fingers f_k(n) = succ(n + 2^k), and every lookup
# greedily forwards to the closest PRECEDING finger until the key
# falls in (cur, succ(cur)]. Six staged rounds (log2(32) = 5 bound);
# the iterative route's home node must equal the directly computed
# successor on every key — the routing-correctness theorem,
# hash-frozen (matches = 1), with the hop distribution frozen next
# to it.
_CHORD_ROUND_SQL = """
st{r} AS MATERIALIZED (
  SELECT s.key,
         CASE WHEN s.home IS NOT NULL THEN s.cur
              WHEN (s.key - s.cur + 1024) % 1024 = 0 THEN s.cur
              WHEN (s.key - s.cur + 1024) % 1024 > 0
               AND (sc.s - s.cur + 1024) % 1024 >= (s.key - s.cur + 1024) % 1024
              THEN s.cur
              ELSE coalesce(fp.nxt, sc.s) END AS cur,
         CASE WHEN s.home IS NOT NULL THEN s.hops
              ELSE s.hops + CASE WHEN (s.key - s.cur + 1024) % 1024 = 0
                                   OR ((s.key - s.cur + 1024) % 1024 > 0
                                       AND (sc.s - s.cur + 1024) % 1024
                                           >= (s.key - s.cur + 1024) % 1024)
                                 THEN 0 ELSE 1 END END AS hops,
         CASE WHEN s.home IS NOT NULL THEN s.home
              WHEN (s.key - s.cur + 1024) % 1024 = 0 THEN s.cur
              WHEN (s.key - s.cur + 1024) % 1024 > 0
               AND (sc.s - s.cur + 1024) % 1024 >= (s.key - s.cur + 1024) % 1024
              THEN sc.s
              ELSE NULL END AS home
  FROM st{p} s
  JOIN succ_t sc ON sc.p = (s.cur + 1) % 1024
  LEFT JOIN (
    SELECT s2.key, max_by(f.f, (f.f - s2.cur + 1024) % 1024) AS nxt
    FROM st{p} s2
    JOIN fingers f ON f.n = s2.cur
     AND (f.f - s2.cur + 1024) % 1024 > 0
     AND (f.f - s2.cur + 1024) % 1024 < (s2.key - s2.cur + 1024) % 1024
    WHERE s2.home IS NULL
    GROUP BY s2.key, s2.cur
  ) fp ON fp.key = s.key
)
"""

_CHORD_ORACLE = (
    """
WITH nodes AS MATERIALIZED (
  SELECT DISTINCT ('0x' || substr(md5('nd:' || CAST(i AS VARCHAR)),
                                  1, 4))::BIGINT % 1024 AS n
  FROM (SELECT unnest(generate_series(0, 31)) AS i)
),
ring AS MATERIALIZED (
  SELECT unnest(generate_series(0, 1023)) AS p
),
succ_t AS MATERIALIZED (
  SELECT r.p,
         coalesce(min(nd.n) FILTER (nd.n >= r.p),
                  (SELECT min(n) FROM nodes)) AS s
  FROM ring r CROSS JOIN nodes nd
  GROUP BY r.p
),
fingers AS MATERIALIZED (
  SELECT nd.n, k.k, sc.s AS f
  FROM nodes nd
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) k
  JOIN succ_t sc ON sc.p = (nd.n + (1 << k.k)) % 1024
),
keys AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 100 AS ki FROM customer
),
kq AS MATERIALIZED (
  SELECT ki, ('0x' || substr(md5('ky:' || CAST(ki AS VARCHAR)),
                             1, 4))::BIGINT % 1024 AS key
  FROM keys
),
st0 AS MATERIALIZED (
  SELECT key, (SELECT min(n) FROM nodes) AS cur,
         CAST(0 AS BIGINT) AS hops, CAST(NULL AS BIGINT) AS home
  FROM (SELECT DISTINCT key FROM kq)
),
"""
    + ",".join(
        _CHORD_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, 10)
    )
    + """
SELECT CAST(s.key AS BIGINT) AS key,
       CAST(s.home AS BIGINT) AS home_node,
       CAST(s.hops AS BIGINT) AS hops,
       CAST(sc.s AS BIGINT) AS direct_successor,
       CAST(CASE WHEN s.home = sc.s THEN 1 ELSE 0 END AS INT)
         AS matches
FROM st9 s
JOIN succ_t sc ON sc.p = s.key
ORDER BY key
"""
)


@register_extra("chord_dht_lookups", _CHORD_ORACLE)
def chord_dht_lookups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chord finger-table routing (see oracle comment). Plan: the
    ring successor table and finger tables are dim-sized broadcasts;
    each of the 6 rounds is one broadcast join + a bounded argmax —
    lookups never touch the fact table beyond key derivation."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sess = c.sparkSession
    nodes = (
        sess.range(0, 32)
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("nd:"), F.col("id").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 1024
            ).alias("n")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    ring = sess.range(0, 1024).select(F.col("id").cast("long").alias("p"))
    gmin = nodes.agg(F.min("n").alias("gm"))
    succ_t = (
        ring.crossJoin(F.broadcast(nodes))
        .groupBy("p")
        .agg(F.min(F.when(F.col("n") >= F.col("p"), F.col("n"))).alias("s0"))
        .crossJoin(F.broadcast(gmin))
        .select("p", F.coalesce("s0", "gm").alias("s"))
        .localCheckpoint(eager=True)
    )
    ks = sess.range(0, 10).select(F.col("id").cast("long").alias("k"))
    fingers = (
        nodes.crossJoin(F.broadcast(ks))
        .withColumn("fp", F.expr("(n + shiftleft(1L, CAST(k AS INT))) % 1024"))
        .join(
            F.broadcast(succ_t.select(F.col("p").alias("fp"),
                                      F.col("s").alias("f"))),
            "fp",
        )
        .select("n", "k", "f")
        .localCheckpoint(eager=True)
    )
    kq = (
        c.select((F.col("c_custkey") % 100).alias("ki"))
        .distinct()
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ky:"), F.col("ki").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % 1024
            ).alias("key")
        )
        .distinct()
    )
    st = (
        kq.crossJoin(F.broadcast(gmin))
        .select(
            "key",
            F.col("gm").alias("cur"),
            F.lit(0).cast("long").alias("hops"),
            F.lit(None).cast("long").alias("home"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(9):
        sc = succ_t.select(F.col("p").alias("scp"), F.col("s").alias("sn"))
        base = st.withColumn("scp", F.expr("(cur + 1) % 1024")).join(
            F.broadcast(sc), "scp"
        )
        fp = (
            st.filter(F.col("home").isNull())
            .join(F.broadcast(fingers), F.col("n") == F.col("cur"))
            .filter(
                F.expr(
                    "(f - cur + 1024) % 1024 > 0 AND"
                    " (f - cur + 1024) % 1024 < (key - cur + 1024) % 1024"
                )
            )
            .groupBy("key", "cur")
            .agg(F.expr("max_by(f, (f - cur + 1024) % 1024)").alias("nxt"))
            .select("key", "nxt")
        )
        st = (
            base.join(F.broadcast(fp), "key", "left")
            .select(
                "key",
                F.expr(
                    "CASE WHEN home IS NOT NULL THEN cur"
                    " WHEN (key - cur + 1024) % 1024 = 0 THEN cur"
                    " WHEN (key - cur + 1024) % 1024 > 0"
                    "  AND (sn - cur + 1024) % 1024 >= (key - cur + 1024) % 1024 THEN cur"
                    " ELSE coalesce(nxt, sn) END"
                ).alias("cur"),
                F.expr(
                    "CASE WHEN home IS NOT NULL THEN hops"
                    " ELSE hops + CASE WHEN (key - cur + 1024) % 1024 = 0"
                    "   OR ((key - cur + 1024) % 1024 > 0"
                    "       AND (sn - cur + 1024) % 1024 >= (key - cur + 1024) % 1024)"
                    "  THEN 0 ELSE 1 END END"
                ).alias("hops"),
                F.expr(
                    "CASE WHEN home IS NOT NULL THEN home"
                    " WHEN (key - cur + 1024) % 1024 = 0 THEN cur"
                    " WHEN (key - cur + 1024) % 1024 > 0"
                    "  AND (sn - cur + 1024) % 1024 >= (key - cur + 1024) % 1024 THEN sn"
                    " ELSE CAST(NULL AS BIGINT) END"
                ).alias("home"),
            )
            .localCheckpoint(eager=True)
        )
    direct = succ_t.select(F.col("p").alias("key"), F.col("s").alias("ds"))
    return (
        st.join(F.broadcast(direct), "key")
        .select(
            F.col("key").cast("long"),
            F.col("home").cast("long").alias("home_node"),
            F.col("hops").cast("long"),
            F.col("ds").cast("long").alias("direct_successor"),
            F.when(F.col("home") == F.col("ds"), 1)
            .otherwise(0)
            .cast("int")
            .alias("matches"),
        )
        .orderBy("key")
    )


# ------------------------------------------------ dominator trees

# Dominator trees (Prosser 1959; the backbone of every SSA-based
# compiler): d dominates v iff removing d cuts every entry->v path —
# computed EXACTLY by running reachability once per candidate
# removal (the definition itself, not an algorithmic shortcut), then
# immediate dominators fall out of the total order on dominator-set
# sizes. 40 md5 CFGs (12-node chain + 6 extra edges, so everything
# is entry-reachable) plus the textbook DIAMOND fixture
# 0->1->{2,3}->4 whose join point must report idom(4) = 1 — the case
# every dominance explainer draws. tests referee against an
# independent iterative set-intersection dataflow solver.
_DOM_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT p_partkey % 40 AS g FROM part
),
edges AS MATERIALIZED (
  SELECT g, i AS u, i + 1 AS v
  FROM grp, (SELECT unnest(generate_series(0, 10)) AS i) i
  UNION
  SELECT g,
         ('0x' || substr(md5('du:' || CAST(g AS VARCHAR) || ':'
            || CAST(k AS VARCHAR)), 1, 4))::BIGINT % 12,
         ('0x' || substr(md5('dv:' || CAST(g AS VARCHAR) || ':'
            || CAST(k AS VARCHAR)), 1, 4))::BIGINT % 12
  FROM grp, (SELECT unnest(generate_series(0, 5)) AS k) k
  WHERE ('0x' || substr(md5('du:' || CAST(g AS VARCHAR) || ':'
           || CAST(k AS VARCHAR)), 1, 4))::BIGINT % 12
        <> ('0x' || substr(md5('dv:' || CAST(g AS VARCHAR) || ':'
              || CAST(k AS VARCHAR)), 1, 4))::BIGINT % 12
  UNION
  SELECT * FROM (VALUES (-1, 0, 1), (-1, 1, 2), (-1, 1, 3),
                        (-1, 2, 4), (-1, 3, 4)) f(g, u, v)
),
dels AS MATERIALIZED (
  SELECT DISTINCT g, v AS d FROM edges WHERE v <> 0
  UNION
  SELECT DISTINCT g, -1 FROM edges
),
rw(g, d, x) AS (
  SELECT g, d, 0 FROM dels
  UNION
  SELECT r.g, r.d, e.v
  FROM rw r JOIN edges e ON e.g = r.g AND e.u = r.x
  WHERE e.v <> r.d AND r.x <> r.d
),
nodes AS MATERIALIZED (
  SELECT g, x AS v FROM rw WHERE d = -1 AND x <> 0
),
strict AS MATERIALIZED (
  SELECT n.g, n.v, dl.d
  FROM nodes n
  JOIN dels dl ON dl.g = n.g AND dl.d <> -1 AND dl.d <> n.v
  LEFT JOIN rw r ON r.g = n.g AND r.d = dl.d AND r.x = n.v
  WHERE r.x IS NULL
),
sizes AS MATERIALIZED (
  SELECT g, v, count(*) + 2 AS ndom FROM strict GROUP BY g, v
),
allsz AS MATERIALIZED (
  SELECT n.g, n.v, coalesce(s.ndom, 2) AS ndom
  FROM nodes n LEFT JOIN sizes s ON s.g = n.g AND s.v = n.v
)
SELECT CAST(a.g AS BIGINT) AS g, CAST(a.v AS INT) AS v,
       CAST(coalesce(
         max_by(st.d, coalesce(z.ndom, 2))
           FILTER (st.d IS NOT NULL), 0) AS INT) AS idom,
       CAST(any_value(a.ndom) AS BIGINT) AS n_dominators
FROM allsz a
LEFT JOIN strict st ON st.g = a.g AND st.v = a.v
LEFT JOIN allsz z ON z.g = a.g AND z.v = st.d
GROUP BY a.g, a.v
ORDER BY g, v
"""


@register_extra("dominator_tree", _DOM_ORACLE)
def dominator_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominator trees by definition (see oracle comment). Plan: the
    per-candidate-removal closure runs over (graph, candidate, node)
    triples — bounded by 40 x 12 x 12 — as iterative frontier joins;
    everything is dim-sized, the fact table contributes keys once."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    sess = p.sparkSession
    grp = p.select((F.col("p_partkey") % 40).alias("g")).distinct()
    chain = grp.crossJoin(
        sess.range(0, 11).select(F.col("id").cast("long").alias("u"))
    ).select("g", "u", (F.col("u") + 1).alias("v"))

    def _h4(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("g").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    extra = (
        grp.crossJoin(
            sess.range(0, 6).select(F.col("id").cast("long").alias("k"))
        )
        .select("g", (_h4("du:") % 12).alias("u"), (_h4("dv:") % 12).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    fixture = sess.createDataFrame(
        [(-1, 0, 1), (-1, 1, 2), (-1, 1, 3), (-1, 2, 4), (-1, 3, 4)],
        "g long, u long, v long",
    )
    edges = (
        chain.unionByName(extra).unionByName(fixture).distinct()
        .localCheckpoint(eager=True)
    )
    dels = (
        edges.select("g", F.col("v").alias("d"))
        .filter(F.col("d") != 0)
        .distinct()
        .unionByName(edges.select("g").distinct().withColumn("d", F.lit(-1)))
        .localCheckpoint(eager=True)
    )
    rw = dels.select("g", "d", F.lit(0).cast("long").alias("x"))
    ed2 = edges.select(
        F.col("g").alias("ge"), F.col("u").alias("eu"),
        F.col("v").alias("ev"),
    ).localCheckpoint(eager=True)
    for it in range(12):
        cur = rw.select(
            F.col("g").alias("gr"), F.col("d").alias("dr"),
            F.col("x").alias("xr"),
        )
        nxt = (
            cur.join(
                ed2,
                (F.col("ge") == F.col("gr")) & (F.col("eu") == F.col("xr")),
            )
            .filter((F.col("ev") != F.col("dr")) & (F.col("xr") != F.col("dr")))
            .select(
                F.col("gr").alias("g"), F.col("dr").alias("d"),
                F.col("ev").alias("x"),
            )
        )
        rw = rw.select("g", "d", "x").unionByName(nxt).distinct()
        if it % 3 == 2:
            # lineage cut WITHOUT localCheckpoint: Spark 4.1 throws
            # NoSuchElementException checkpointing this union-over-
            # checkpointed-alias shape, so rebind the (dim-bounded,
            # <= 6.3k rows by construction) state through an
            # ExistingRDD scan instead — same plan-cut effect.
            rw = rw.sparkSession.createDataFrame(
                rw.rdd.cache(), rw.schema
            )
    rw = rw.localCheckpoint(eager=True)
    nodes = rw.filter((F.col("d") == -1) & (F.col("x") != 0)).select(
        "g", F.col("x").alias("v")
    )
    strict = (
        nodes.join(
            dels.filter(F.col("d") != -1).select(
                F.col("g").alias("gd"), "d"
            ),
            (F.col("gd") == F.col("g")),
        )
        .filter(F.col("d") != F.col("v"))
        .join(
            rw.select(
                F.col("g").alias("gr"), F.col("d").alias("dr"),
                F.col("x").alias("xr"), F.lit(1).alias("hit"),
            ),
            (F.col("gr") == F.col("g"))
            & (F.col("dr") == F.col("d"))
            & (F.col("xr") == F.col("v")),
            "left",
        )
        .filter(F.col("hit").isNull())
        .select("g", "v", "d")
    )
    sizes = strict.groupBy("g", "v").agg((F.count(F.lit(1)) + 2).alias("ndom"))
    allsz = nodes.join(sizes, ["g", "v"], "left").select(
        "g", "v", F.coalesce("ndom", F.lit(2)).alias("ndom")
    )
    zsz = allsz.select(
        F.col("g").alias("gz"), F.col("v").alias("dz"),
        F.col("ndom").alias("dndom"),
    )
    return (
        allsz.join(
            strict.select(F.col("g"), F.col("v"), F.col("d")),
            ["g", "v"],
            "left",
        )
        .join(
            zsz,
            (F.col("gz") == F.col("g")) & (F.col("dz") == F.col("d")),
            "left",
        )
        .groupBy("g", "v")
        .agg(
            F.coalesce(
                F.expr(
                    "max_by(d, coalesce(dndom, 2L))"
                ),
                F.lit(0),
            )
            .cast("int")
            .alias("idom"),
            F.first("ndom").cast("long").alias("n_dominators"),
        )
        .select(
            F.col("g").cast("long"),
            F.col("v").cast("int"),
            "idom",
            "n_dominators",
        )
        .orderBy("g", "v")
    )


# ------------------------------------- stable matching lattice


def _gs_sim_sql(tag: str, np: int, na: int, ppref: str, apref: str) -> str:
    """Sequential deferred-acceptance replay (textbook one-proposal-
    at-a-time) parameterized by proposer/acceptor counts and md5
    preference salts — the same proven template as the gated
    stable_matching_gs oracle, instantiated once per proposing side."""
    return f"""
pairs_{tag} AS (
  SELECT p.range AS p, a.range AS a,
         ('0x' || substr(md5('{ppref}' || p.range || ':' || a.range),
                         1, 8))::BIGINT AS pr,
         ('0x' || substr(md5('{apref}' || a.range || ':' || p.range),
                         1, 8))::BIGINT AS ar
  FROM range({np}) p, range({na}) a
),
ppref_{tag} AS MATERIALIZED (
  SELECT list(pl ORDER BY p) AS pps FROM (
    SELECT p, list(a ORDER BY pr, a) AS pl FROM pairs_{tag} GROUP BY p)
),
arank_{tag} AS MATERIALIZED (
  SELECT list(al ORDER BY a) AS ars FROM (
    SELECT a, list(ar ORDER BY p) AS al FROM pairs_{tag} GROUP BY a)
),
sim_{tag}(step, nxt, am, done) AS (
  SELECT 0, list_transform(range(1, {np + 1}), x -> 0),
         list_transform(range(1, {na + 1}), x -> -1), false
  FROM (SELECT 1)
  UNION ALL
  SELECT step + 1,
         list_transform(range(1, {np + 1}), i ->
           CASE WHEN i - 1 = fp THEN s.nxt[i] + 1 ELSE s.nxt[i] END),
         list_transform(range(1, {na + 1}), i ->
           CASE WHEN i - 1 = pa THEN
             (CASE WHEN s.am[i] = -1 THEN fp
                   WHEN ars[i][fp + 1] < ars[i][s.am[i] + 1] THEN fp
                   ELSE s.am[i] END)
           ELSE s.am[i] END),
         fp IS NULL
  FROM (
    SELECT step, nxt, am,
           list_min(list_filter(range(0, {np}), p ->
             NOT list_contains(am, p) AND nxt[p + 1] < {na})) AS fp
    FROM sim_{tag} WHERE NOT done
  ) s
  CROSS JOIN arank_{tag}
  CROSS JOIN ppref_{tag}
  CROSS JOIN LATERAL (SELECT CASE WHEN fp IS NOT NULL
                        THEN pps[fp + 1][s.nxt[fp + 1] + 1] END AS pa) q
),
fin_{tag} AS MATERIALIZED (
  SELECT i - 1 AS a, am[i] AS p
  FROM (SELECT am FROM sim_{tag} WHERE done ORDER BY step LIMIT 1),
       range(1, {na + 1}) r(i)
  WHERE am[i] <> -1
)"""


_GS_LATTICE_ORACLE = (
    "WITH RECURSIVE "
    + _gs_sim_sql("mp", 25, 30, "gsm:", "gsw:").lstrip()
    + ","
    + _gs_sim_sql("wp", 30, 25, "gsw:", "gsm:")
    + """,
mopt AS MATERIALIZED (
  SELECT p AS m, a AS w FROM fin_mp
),
wopt AS MATERIALIZED (
  SELECT a AS m, p AS w FROM fin_wp
),
mrank AS MATERIALIZED (
  SELECT x.m, x.w,
         (SELECT count(*) FROM pairs_mp y
          WHERE y.p = x.m AND (y.pr, y.a) <=
            (SELECT (z.pr, z.a) FROM pairs_mp z
             WHERE z.p = x.m AND z.a = x.w)) AS rk
  FROM (SELECT m, w FROM mopt UNION SELECT m, w FROM wopt) x
)
SELECT CAST(mo.m AS BIGINT) AS m,
       CAST(mo.w AS BIGINT) AS w_mopt,
       CAST(rm.rk AS BIGINT) AS rank_mopt,
       CAST(wo.w AS BIGINT) AS w_wopt,
       CAST(rw.rk AS BIGINT) AS rank_wopt,
       CAST(CASE WHEN rm.rk <= rw.rk THEN 1 ELSE 0 END AS INT)
         AS man_weakly_prefers_mopt
FROM mopt mo
JOIN wopt wo ON wo.m = mo.m
JOIN mrank rm ON rm.m = mo.m AND rm.w = mo.w
JOIN mrank rw ON rw.m = wo.m AND rw.w = wo.w
ORDER BY m
"""
)


@register_extra("stable_matching_lattice", _GS_LATTICE_ORACLE)
def stable_matching_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stable-matching lattice theorem (Knuth 1976): deferred
    acceptance run with men proposing vs women proposing yields the
    man-optimal and woman-optimal extremes, and EVERY man weakly
    prefers his man-optimal partner — hash-frozen at 1 per man
    (strict preference occurs for a fair share). Both directions run
    the gated distributed GS rounds on the same md5 preference
    tables; the oracle replays two sequential textbook simulations.
    25 x 30 market (same as the gated stable_matching_gs row)."""
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    men = nat.select(F.col("n_nationkey").cast("long").alias("m"))
    women = spark.range(30).select(F.col("id").alias("w"))
    both = men.crossJoin(women)

    def _h(prefix: str, a: str, b: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col(a).cast("string"),
                        F.lit(":"),
                        F.col(b).cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    prefs_m = both.select("m", "w", _h("gsm:", "m", "w").alias("mr"))
    prefs_w = both.select("w", "m", _h("gsw:", "w", "m").alias("wr"))
    mopt = G.gale_shapley_rounds(prefs_m, prefs_w).select(
        F.col("m"), F.col("w").alias("w_mopt")
    )
    wopt = (
        G.gale_shapley_rounds(
            prefs_w.select(
                F.col("w").alias("m"), F.col("m").alias("w"),
                F.col("wr").alias("mr"),
            ),
            prefs_m.select(
                F.col("m").alias("w"), F.col("w").alias("m"),
                F.col("mr").alias("wr"),
            ),
        )
        .select(F.col("w").alias("m"), F.col("m").alias("w_wopt"))
    )
    w2 = Window.partitionBy("m").orderBy("mr", "w")
    ranks = prefs_m.withColumn("rk", F.row_number().over(w2)).select(
        "m", "w", "rk"
    )
    return (
        mopt.join(wopt, "m")
        .join(
            ranks.select("m", F.col("w").alias("w_mopt"),
                         F.col("rk").alias("rank_mopt")),
            ["m", "w_mopt"],
        )
        .join(
            ranks.select("m", F.col("w").alias("w_wopt"),
                         F.col("rk").alias("rank_wopt")),
            ["m", "w_wopt"],
        )
        .select(
            F.col("m").cast("long"),
            F.col("w_mopt").cast("long"),
            F.col("rank_mopt").cast("long"),
            F.col("w_wopt").cast("long"),
            F.col("rank_wopt").cast("long"),
            F.when(F.col("rank_mopt") <= F.col("rank_wopt"), 1)
            .otherwise(0)
            .cast("int")
            .alias("man_weakly_prefers_mopt"),
        )
        .orderBy("m")
    )


# ------------------------------------- Erdos-Gallai / Havel-Hakimi

# Degree-sequence graphicality decided TWO independent ways and their
# equality frozen — the Erdos-Gallai theorem (1960) as k-indexed
# inequalities sum_{i<=k} d_i <= k(k-1) + sum_{i>k} min(d_i, k), and
# the Havel-Hakimi construction (1955/62) as a 10-step sort-and-
# decrement fold (failure <=> an entry goes negative; with n = 10 and
# degrees <= 9 the length guard can never fire first). 200 md5
# sequences, parity forced even; ~25% are graphical, and the two
# verdicts agree on every row (the theorem, hash-fatal).
_EG_ORACLE = """
WITH RECURSIVE grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 200 AS g FROM customer
),
raw AS MATERIALIZED (
  SELECT g, i.i,
         ('0x' || substr(md5('dg:' || CAST(g AS VARCHAR) || ':'
            || CAST(i.i AS VARCHAR)), 1, 4))::BIGINT % 10 AS d
  FROM grp, (SELECT unnest(generate_series(0, 9)) AS i) i
),
fixed AS MATERIALIZED (
  SELECT g, i,
         CASE WHEN i = 9 AND (SELECT sum(d) FROM raw r
                              WHERE r.g = raw.g) % 2 = 1
              THEN (d + 1) % 10 ELSE d END AS d
  FROM raw
),
sorted AS MATERIALIZED (
  SELECT g, d, row_number() OVER (PARTITION BY g
                                  ORDER BY d DESC, i) AS j
  FROM fixed
),
eg AS MATERIALIZED (
  SELECT s.g,
         CASE WHEN (SELECT sum(d) FROM sorted z
                    WHERE z.g = s.g) % 2 = 1 THEN 0
              WHEN min(CASE WHEN lhs <= rhs THEN 1 ELSE 0 END) = 1
              THEN 1 ELSE 0 END AS eg_ok
  FROM (
    SELECT a.g, k.k,
           sum(CASE WHEN a.j <= k.k THEN a.d END) AS lhs,
           k.k * (k.k - 1)
             + coalesce(sum(CASE WHEN a.j > k.k
                            THEN least(a.d, k.k) END), 0) AS rhs
    FROM sorted a, (SELECT unnest(generate_series(1, 10)) AS k) k
    GROUP BY a.g, k.k
  ) s GROUP BY s.g
),
lst AS MATERIALIZED (
  SELECT g, list(d ORDER BY j) AS l FROM sorted GROUP BY g
),
hh(g, step, l, fail) AS (
  SELECT g, 0, l, 0 FROM lst
  UNION ALL
  SELECT g, step + 1, nl,
         CASE WHEN fail = 1 OR list_min(nl) < 0 THEN 1 ELSE 0 END
  FROM (
    SELECT g, step, fail,
           CASE WHEN len(srt) = 0 OR fail = 1 THEN srt
                ELSE list_sort(list_concat(
                  list_transform(srt[2 : x + 1], v -> v - 1),
                  srt[x + 2 : len(srt)]), 'DESC') END AS nl
    FROM (
      SELECT g, step, fail, l,
             list_sort(l, 'DESC') AS srt,
             greatest(0, coalesce(list_sort(l, 'DESC')[1], 0)) AS x
      FROM hh WHERE step < 10
    )
  )
),
hhv AS MATERIALIZED (
  SELECT g,
         CASE WHEN max(fail) = 0 THEN 1 ELSE 0 END AS hh_ok
  FROM hh WHERE step = 10 GROUP BY g
)
SELECT CAST(e.g AS BIGINT) AS g,
       CAST(e.eg_ok AS INT) AS eg_ok,
       CAST(CASE WHEN e.eg_ok = 0 THEN 0 ELSE h.hh_ok END AS INT)
         AS hh_ok_gated,
       CAST(h.hh_ok AS INT) AS hh_ok,
       CAST(CASE WHEN e.eg_ok = h.hh_ok THEN 1 ELSE 0 END AS INT)
         AS theorems_agree
FROM eg e JOIN hhv h ON h.g = e.g
ORDER BY g
"""


@register_extra("erdos_gallai_havel_hakimi", _EG_ORACLE)
def erdos_gallai_havel_hakimi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphical-sequence verdicts two ways (see oracle comment) —
    EG inequalities as a k-exploded partial agg, HH as ten chained
    array-transform steps; theorem equality hash-frozen."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sess = c.sparkSession
    grp = c.select((F.col("c_custkey") % 200).alias("g")).distinct()
    raw = grp.crossJoin(
        sess.range(0, 10).select(F.col("id").cast("int").alias("i"))
    ).select(
        "g",
        "i",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("dg:"),
                            F.col("g").cast("string"),
                            F.lit(":"),
                            F.col("i").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 10
        ).alias("d"),
    )
    tot = raw.groupBy("g").agg(F.sum("d").alias("sd"))
    fixed = raw.join(F.broadcast(tot), "g").select(
        "g",
        "i",
        F.when(
            (F.col("i") == 9) & (F.col("sd") % 2 == 1),
            (F.col("d") + 1) % 10,
        )
        .otherwise(F.col("d"))
        .alias("d"),
    )
    w = Window.partitionBy("g").orderBy(F.desc("d"), "i")
    srt = fixed.withColumn("j", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    ks = sess.range(1, 11).select(F.col("id").cast("int").alias("k"))
    eg = (
        srt.crossJoin(F.broadcast(ks))
        .groupBy("g", "k")
        .agg(
            F.sum(F.when(F.col("j") <= F.col("k"), F.col("d"))).alias("lhs"),
            (
                F.col("k") * (F.col("k") - 1)
                + F.coalesce(
                    F.sum(
                        F.when(
                            F.col("j") > F.col("k"),
                            F.least(F.col("d"), F.col("k").cast("long")),
                        )
                    ),
                    F.lit(0),
                )
            ).alias("rhs"),
        )
        .groupBy("g")
        .agg(
            F.min(
                F.when(F.col("lhs") <= F.col("rhs"), 1).otherwise(0)
            ).alias("ineq_ok")
        )
        .join(F.broadcast(tot), "g")
        .select(
            "g",
            F.when(
                (F.col("sd") % 2 == 0) | True, None
            ).alias("_"),  # placeholder, parity handled below
            F.col("ineq_ok"),
            F.col("sd"),
        )
    )
    # even-parity: the fixed sequence always has even sum by
    # construction EXCEPT when d9 wrapped 9 -> 0 keeps parity odd;
    # recompute the fixed sum
    fsum = fixed.groupBy("g").agg(F.sum("d").alias("fs"))
    egf = (
        eg.join(F.broadcast(fsum), "g")
        .select(
            "g",
            F.when(
                (F.col("fs") % 2 == 0) & (F.col("ineq_ok") == 1), 1
            )
            .otherwise(0)
            .alias("eg_ok"),
        )
    )
    lst = srt.groupBy("g").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, d))), x -> x.d)"
        ).alias("l")
    )
    cur = lst.withColumn("fail", F.lit(0))
    for _ in range(10):
        cur = (
            cur.withColumn(
                "srt", F.expr("reverse(array_sort(l))")
            )
            .withColumn(
                "x",
                F.expr("greatest(0L, coalesce(try_element_at(srt, 1), 0L))")
            )
            .withColumn(
                "nl",
                F.expr(
                    "IF(size(srt) = 0 OR fail = 1, srt,"
                    " reverse(array_sort(concat("
                    " transform(slice(srt, 2, CAST(x AS INT)), v -> v - 1),"
                    " slice(srt, CAST(x AS INT) + 2,"
                    "  CAST(greatest(0L, size(srt) - 1 - x) AS INT))))))"
                ),
            )
            .withColumn(
                "fail",
                F.when(
                    (F.col("fail") == 1)
                    | (F.expr("array_min(nl)") < 0),
                    1,
                ).otherwise(0),
            )
            .select("g", F.col("nl").alias("l"), "fail")
        )
    hhv = cur.select("g", (1 - F.col("fail")).alias("hh_ok"))
    return (
        egf.join(hhv, "g")
        .select(
            F.col("g").cast("long"),
            F.col("eg_ok").cast("int"),
            F.when(F.col("eg_ok") == 0, 0)
            .otherwise(F.col("hh_ok"))
            .cast("int")
            .alias("hh_ok_gated"),
            F.col("hh_ok").cast("int"),
            F.when(F.col("eg_ok") == F.col("hh_ok"), 1)
            .otherwise(0)
            .cast("int")
            .alias("theorems_agree"),
        )
        .orderBy("g")
    )
