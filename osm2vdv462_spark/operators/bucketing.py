"""Bucketed storage for shuffle-free repeated joins.

The 100 TB pattern: a table that is joined on the same key by many
downstream queries (documents by doc_id, images by event_id) should be
written ONCE pre-partitioned — `bucketBy(n, key).sortBy(key)` — so every
subsequent equi-join/aggregation on that key runs with ZERO Exchange:
Catalyst sees the bucketing in the table metadata and plans a
SortMergeJoin over co-located buckets (no shuffle of either side).

This is storage-level co-location, complementary to the in-query
strategies the engine already pins (broadcast for small dims,
ShuffledHashJoin+salt for big-big): it amortizes the ONE unavoidable
shuffle across every future consumer. tests/test_bucketing.py asserts
the no-Exchange plan property directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed+sorted table (overwrite). ``path`` makes
    it external (data at an explicit location; bucketing metadata still
    lives in the catalog, which is what the planner reads)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two tables bucketed on `key`. With equal bucket
    counts Catalyst plans this with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange
    (BroadcastExchange excluded — that's not a shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.lstrip(" :+-*(0123456789)").startswith("Exchange")
        for line in plan.splitlines()
    )
