"""Warehouse/mining operator family: A-Priori frequent itemset pairs
(market-basket) and a slowly-changing-dimension type-2 builder.

Both all-integer/timestamp (no float discipline needed), both with
independent SQL oracles. Extra-tier (the 50-row driver gate is full —
CLAUDE.md invariant); round-5 rotation candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register_extra(
    "frequent_item_pairs",
    """
    WITH e AS (SELECT DISTINCT user_id, props FROM events),
    n AS (SELECT (count(DISTINCT user_id) + 2) // 3 AS minsup FROM e),
    f1 AS (
      SELECT props FROM e CROSS JOIN n
      GROUP BY props, minsup HAVING count(*) >= minsup
    ),
    ef AS (SELECT e.user_id, e.props FROM e JOIN f1 USING (props)),
    pairs AS (
      SELECT a.props AS item_a, b.props AS item_b, count(*) AS n_users
      FROM ef a JOIN ef b ON a.user_id = b.user_id AND a.props < b.props
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, n_users
    FROM pairs CROSS JOIN n WHERE n_users >= minsup
    ORDER BY item_a, item_b
    """,
)
def frequent_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Priori frequent pairs over (user -> set of interaction
    contexts) baskets, minsup = ceil(n_users/3) derived IN-PLAN from a
    broadcast 1-row aggregate (the gapfill bounds-join discipline — no
    driver collect, threshold scales with the data). The A-Priori
    monotonicity prefilter (only frequent-1 items enter pair
    generation) bounds the self-join fan-out at C(k,2) per basket over
    frequent items only — at 10^12 baskets that prefilter is the
    difference between a vocabulary-bounded shuffle and an
    all-pairs-of-everything explosion. Integer end-to-end."""
    e = _t(spark, sf_dir, "events").select("user_id", "props").distinct()
    n = e.agg(
        F.expr("(count(DISTINCT user_id) + 2) div 3").alias("minsup")
    )
    f1 = (
        e.crossJoin(F.broadcast(n))
        .groupBy("props", "minsup")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= F.col("minsup"))
        .select("props")
    )
    ef = e.join(F.broadcast(f1), "props").select("user_id", "props")
    a = ef.select("user_id", F.col("props").alias("item_a"))
    b = ef.select("user_id", F.col("props").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .filter(F.col("n_users") >= F.col("minsup"))
        .select("item_a", "item_b", "n_users")
        .orderBy("item_a", "item_b")
    )


@register_extra(
    "scd2_user_context",
    """
    WITH src AS (
      SELECT user_id, ts, event_id, props FROM events
      WHERE event_type = 'signup'
    ),
    changes AS (
      SELECT user_id, ts, event_id, props,
             lag(props) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM src
    ),
    versions AS (
      SELECT user_id, ts, event_id, props FROM changes
      WHERE prev IS NULL OR props <> prev
    ),
    dim AS (
      SELECT user_id, props AS attr,
             CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_epoch,
             CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))) AS BIGINT)
               AS valid_to_epoch
      FROM versions
    )
    SELECT user_id, attr, valid_from_epoch, valid_to_epoch,
           valid_to_epoch IS NULL AS is_current
    FROM dim
    ORDER BY user_id, valid_from_epoch
    """,
)
def scd2_user_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change-event stream:
    consecutive no-op changes collapse (lag), validity intervals come
    from lead — [valid_from, valid_to) half-open, NULL valid_to ==
    current row. Both windows ride ONE user_id shuffle; the (ts,
    event_id) tie-break is pinned in both engines. This is the batch
    dimension-build half of the upsert story (snaptable's
    merge-on-read upsert is the serving half)."""
    src = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id", "props")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        src.withColumn("prev", F.lag("props").over(w))
        .filter(F.col("prev").isNull() | (F.col("props") != F.col("prev")))
        .drop("prev")
    )
    dim = versions.select(
        "user_id",
        F.col("props").alias("attr"),
        F.unix_timestamp("ts").alias("valid_from_epoch"),
        F.lead(F.unix_timestamp("ts")).over(w).alias("valid_to_epoch"),
    )
    return dim.select(
        "user_id",
        "attr",
        "valid_from_epoch",
        "valid_to_epoch",
        F.col("valid_to_epoch").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_epoch")
