"""Spatial clustering: ST_ClusterDBSCAN(eps=0, minpoints=1) OVER ()
(ref /root/reference/pipeline/stop_places/sql/stop_places.sql:1062).

eps=0 + minpoints=1 makes DBSCAN degenerate into *connected components of
the "geometries intersect" graph* (every geometry is core; edges = pairs
at distance 0, i.e. touching/overlapping). Singletons form their own
cluster.

Scalable plan:
1. candidate pairs from the grid-cell cover equi-join (operators.
   spatial_join.touches_join with predicate="intersects");
2. connected components via iterative min-label propagation over the
   pair list (Spark-side joins, converges in O(graph diameter) rounds —
   platform clusters have diameter <= a few).

No global window, no driver-side graph: works at any table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vid: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label each vertex with the min vertex id of its component.

    vertices: one column ``vid`` (long). edges: ``src``,``dst`` (long,
    undirected; self-loops/duplicates fine). Returns (vid, component).
    """
    from pyspark.sql import Observation

    # materialize the edge list once — the loop below must not re-derive
    # its (possibly expensive: spatial-join) lineage every iteration.
    # The edge count rides the checkpoint job via observe (guide §1.2):
    # a separate count() was one more job per operator call.
    obs_e = Observation()
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(vid).alias("a"), F.col(vid).alias("component")
    ).localCheckpoint(eager=True)
    # size the per-iteration shuffles to the GRAPH, not the session
    # default: at gate scale a 100-edge graph under a 64-partition
    # default burns hundreds of empty tasks per iteration; at 10^12
    # edges the same formula scales the partition count with the data
    n_edges = int(obs_e.get["n"] or 0)
    parts = str(max(2, min(2048, n_edges // 500_000 + 2)))
    spark = edges.sparkSession
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        return _cc_loop(sym, labels, vid, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


def _cc_loop(sym, labels, vid: str, max_iter: int) -> DataFrame:
    from pyspark.sql import Observation

    for _ in range(max_iter):
        # neighbor minimum
        nbr_min = (
            sym.join(labels.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # the did-anything-change signal rides the SAME job that
        # materializes the new labels (observe fires through the eager
        # localCheckpoint) — the old join-back change-count was a
        # second job per iteration
        new = F.least(
            F.col("component"), F.coalesce("nbr_component", F.col("component"))
        )
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, "a", "left")
            .select(
                "a",
                new.alias("component"),
                (new != F.col("component")).alias("_chg"),
            )
            .observe(obs, F.max(F.col("_chg").cast("int")).alias("chg"))
            .drop("_chg")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if int(obs.get["chg"] or 0) == 0:
            break
    return labels.select(F.col("a").alias(vid), "component")
