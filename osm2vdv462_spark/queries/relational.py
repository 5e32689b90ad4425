"""Relational operator-parity queries (SURVEY.md §2.2-2.7) over the
driver's TPC-H-ish tables. Each exercises one reference operator family;
the reference file:line it mirrors is in the docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import register, register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register_extra(
    "membership_join",
    """
    SELECT o.o_orderstatus, c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def membership_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi inner join + hash agg (ref stop_places.sql:1072-1077:
    platforms_merged JOIN stop_areas_members_ref). Dimension side is
    broadcast — verify with .explain(): BroadcastHashJoin."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderstatus", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            # sum in exact decimal: float addition is non-associative, so a
            # double sum near a .005 rounding boundary can flip between
            # Spark's and DuckDB's partial-agg orders (ADVICE r1)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register_extra(
    "left_join_coalesce",
    """
    SELECT o.o_orderkey,
           coalesce(c.c_mktsegment, '(none)') AS segment
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
    """,
)
def left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left outer join + COALESCE fallback (ref stop_places.sql:
    1102-1107: access_spaces LEFT JOIN pois, '{}' fallback)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", F.coalesce("c_mktsegment", F.lit("(none)")).alias("segment")
    )


@register_extra(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A8 grouped aggregation with pushed-down filter (TPC-H Q1 shape;
    ref min/max agg pattern stop_places.sql:975-977)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact-decimal sums, order-independent across engines (ADVICE r1);
            # the per-row product is rounded to 4dp BEFORE the decimal cast so
            # both engines quantize the same double value
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register_extra(
    "top1_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY o.o_totalprice DESC, o.o_orderkey
             ) AS rn
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ) WHERE rn = 1
    """,
)
def top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/W2/J7 first-row-per-group: DISTINCT ON / LATERAL ... LIMIT 1
    (ref stop_places.sql:972-996 envelope pick, 1198-1201 org match)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@register_extra(
    "edge_pairs",
    """
    SELECT a.s_nationkey AS relation_id,
           a.s_suppkey AS from_id, b.s_suppkey AS to_id
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey <> b.s_suppkey
    """,
)
def edge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 self cross-pair join: all ordered pairs per group (ref
    stop_places.sql:1126-1146 stop_area_edges quay x quay). Parity tier
    since r4 (driver-green r1-r3; the same pair join runs inside the
    gated path_links_pipeline) — rotated out for video_frame_stats."""
    s = _t(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") != F.col("b.s_suppkey")),
        )
        .select(
            F.col("a.s_nationkey").alias("relation_id"),
            F.col("a.s_suppkey").alias("from_id"),
            F.col("b.s_suppkey").alias("to_id"),
        )
    )


@register_extra(
    # r4 rotation: demoted to the parity tier after three driver-green
    # rounds (r01-r03); P1/P2 semantics stay transitively hash-gated by
    # every pipeline row's tag predicates, and this exact oracle still
    # runs in tests/test_oracle_parity.py.
    "tag_access",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE CAST(props ->> 'k' AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def tag_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 tag-map predicate + accessor (ref lua/utils.lua:91-114 and
    tags->>'key' throughout stop_places.sql): JSON props parsed to a map,
    key access pushed through filter + agg."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )


@register_extra(
    # r4 rotation: demoted after three driver-green rounds; J5/F9
    # explode-with-ordinality is exercised inside the gated pipeline
    # rows (platforms_split), and the oracle stays parity-tested.
    "lateral_posexplode",
    """
    SELECT p_partkey,
           unnest(string_split(p_type, ' ')) AS word,
           CAST(unnest(generate_series(1, len(string_split(p_type, ' '))))
                AS INT) AS pos
    FROM part
    """,
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/F9 lateral explode WITH ORDINALITY (ref stop_places.sql:1017-1030
    CROSS JOIN string_to_table(IFOPT, ';') WITH ORDINALITY)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_type", " ")).alias("pos0", "word")
    ).select("p_partkey", "word", (F.col("pos0") + 1).cast("int").alias("pos"))


@register_extra(
    "map_last_wins",
    """
    SELECT user_id, arg_max(CAST(props ->> 'k' AS BIGINT), event_id) AS final_k
    FROM events GROUP BY user_id
    """,
)
def map_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 jsonb_combine: last-key-wins tag-map fold with a pinned order
    (ref stop_places.sql:935-939; order pinned by event_id — the engine's
    normative tie-break, SURVEY.md §7 'order-sensitive merges').

    Implemented as the scalable distributed map-merge (the A1 pattern used
    throughout the engine): explode map entries with their ordinal, window
    top-1 per (group, key) by ordinal desc, re-assemble with
    map_from_entries. No driver collect, no unbounded state per group.
    """
    e = _t(spark, sf_dir, "events")
    tags = F.from_json("props", "map<string,string>")
    entries = e.select(
        "user_id", F.col("event_id").alias("ord"), F.explode(tags).alias("key", "val")
    )
    w = Window.partitionBy("user_id", "key").orderBy(F.col("ord").desc())
    merged = (
        entries.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("key", "val"))).alias("merged"))
    )
    return merged.select(
        "user_id", F.element_at("merged", "k").cast("long").alias("final_k")
    )


@register_extra(
    "union_all_levels",
    """
    SELECT CAST(o_custkey AS BIGINT) AS id, 'ORDER' AS category FROM orders
    UNION ALL
    SELECT CAST(c_custkey AS BIGINT) AS id, 'CUSTOMER' AS category FROM customer
    """,
)
def union_all_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-U3 UNION ALL with aligned schema + literal category column (ref
    stop_places.sql:1294-1317 export_data union of 4 element kinds)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("id"), F.lit("ORDER").alias("category")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"), F.lit("CUSTOMER").alias("category")
    )
    return o.unionByName(c)


@register_extra(
    "window_frame_moving",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS moving_cents,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_n
    FROM events
    """,
)
def window_frame_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows (ROWS BETWEEN): sliding 3-row sum + running
    count per user, ordered by event_id. Closes the SURVEY §2.5 'frame
    specs absent in reference' note with a first-class, oracle-gated
    implementation. Values summed in integer cents so the sliding partial
    sums are order- and engine-independent. One Exchange on user_id; the
    frame itself is evaluated inside the sort, no extra shuffle."""
    e = _t(spark, sf_dir, "events")
    # floor, not a bare cast: Spark's double->long cast truncates toward
    # zero while DuckDB's rounds to nearest — floor is identical in both
    cents = F.floor(F.col("value") * 100).cast("long")
    frame3 = (
        Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, Window.currentRow)
    )
    running = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents).over(frame3).cast("long").alias("moving_cents"),
        F.count(F.lit(1)).over(running).cast("long").alias("running_n"),
    )


@register_extra(
    "grouping_sets_rollup",
    """
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS / ROLLUP hierarchy totals (SURVEY §2.6 'absent in
    reference' note, now first-class): per (status, priority), per status,
    and grand total in ONE aggregation pass — Spark expands the rollup
    into grouping sets inside a single Exchange (one shuffle, not three
    unioned aggs). GROUPING() ids disambiguate genuine NULL keys from
    subtotal rows; revenue in exact decimal for engine-order independence."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("long")
            .alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register_extra(
    "intersect_except_keys",
    """
    SELECT 'both' AS side, k FROM (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
      INTERSECT
      SELECT o_custkey AS k FROM orders
    )
    UNION ALL
    SELECT 'cust_only' AS side, k FROM (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
      EXCEPT
      SELECT o_custkey AS k FROM orders
    )
    """,
)
def intersect_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (SURVEY §2.7 'absent in reference'
    note, now first-class). Both are DISTINCT-semantics set ops — Spark
    plans them as left-semi / left-anti joins after a distinct, exactly
    the shape a hand-written dedup+join would produce, in one query."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("k"))
    )
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    both = c.intersect(o).select(F.lit("both").alias("side"), "k")
    only = c.subtract(o).select(F.lit("cust_only").alias("side"), "k")
    return both.unionByName(only)


@register_extra(
    "unit_parsers",
    """
    SELECT p_partkey,
           CAST(CASE
             WHEN p_partkey % 5 = 0 THEN (p_size % 9 + 1) * 100.0
             WHEN p_partkey % 5 = 1 THEN CAST(p_size AS DOUBLE)
             WHEN p_partkey % 5 = 2 THEN (p_size % 9 + 0.5) * 100.0
             ELSE NULL
           END AS DOUBLE) AS len_cm,
           CAST(CASE
             WHEN p_partkey % 3 = 0 THEN (p_size % 40 + 1) * 1.0
             WHEN p_partkey % 3 = 1 THEN (p_size % 5 + 1) * 1000.0
             ELSE NULL
           END AS DOUBLE) AS weight_kg,
           CAST(CASE
             WHEN p_partkey % 4 = 0 THEN (p_size % 20 + 1) * 60.0
             WHEN p_partkey % 4 = 1 THEN 3600.0 + (p_size % 60) * 60.0
             ELSE NULL
           END AS DOUBLE) AS dur_s,
           CAST(CASE
             WHEN p_partkey % 6 = 0 THEN CAST(p_size % 30 AS DOUBLE)
             ELSE NULL
           END AS DOUBLE) AS incline_pct
    FROM part
    """,
)
def unit_parsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F5 unit parsers (ref stop_places.sql:21-139) applied to
    deterministically synthesized tag strings; the oracle computes the
    expected numeric results directly (never via string parsing), so the
    parsers' unit/shape handling is what's actually under test."""
    from ..functions.parsers import (
        parse_duration_s,
        parse_incline_pct,
        parse_length_cm,
        parse_weight_kg,
    )

    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    sz = F.col("p_size")
    len_str = (
        F.when(k % 5 == 0, F.concat((sz % 9 + 1).cast("string"), F.lit(" m")))
        .when(k % 5 == 1, F.concat(sz.cast("string"), F.lit(" cm")))
        .when(k % 5 == 2, F.concat((sz % 9).cast("string"), F.lit(".5 m")))
        .when(k % 5 == 3, F.lit("junk"))
        .otherwise(F.concat(sz.cast("string"), F.lit(" furlong")))
    )
    wt_str = (
        F.when(k % 3 == 0, F.concat((sz % 40 + 1).cast("string"), F.lit(" kg")))
        .when(k % 3 == 1, F.concat((sz % 5 + 1).cast("string"), F.lit(" t")))
        .otherwise(F.lit("heavy"))
    )
    dur_str = (
        F.when(k % 4 == 0, (sz % 20 + 1).cast("string"))
        .when(
            k % 4 == 1,
            F.concat(F.lit("01:"), F.lpad((sz % 60).cast("string"), 2, "0")),
        )
        .otherwise(F.lit("soon"))
    )
    inc_str = (
        F.when(k % 6 == 0, F.concat((sz % 30).cast("string"), F.lit("%")))
        .when(k % 6 == 1, F.lit("up"))
        .otherwise(F.lit("5"))  # unitless -> NULL per reference
    )
    return p.select(
        "p_partkey",
        parse_length_cm(len_str).alias("len_cm"),
        parse_weight_kg(wt_str).alias("weight_kg"),
        parse_duration_s(dur_str).alias("dur_s"),
        parse_incline_pct(inc_str).alias("incline_pct"),
    )


@register_extra(
    "cube_order_stats",
    """
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — completes the multi-dimensional subtotal
    surface next to grouping_sets_rollup: all four groupings (both
    keys, each key alone, grand total) expand inside ONE aggregation
    Exchange rather than four unioned scans. The priority-only slice is
    the one ROLLUP cannot produce. Same discipline as the rollup row:
    GROUPING() ids disambiguate subtotal rows from genuine NULL keys,
    revenue summed in exact decimal for engine/merge-order
    independence."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("long")
            .alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register_extra(
    "equidepth_value_bins",
    """
    WITH b AS (
      SELECT event_type, event_id, value,
             ntile(8) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS bin
      FROM events
    )
    SELECT event_type, CAST(bin AS BIGINT) AS bin,
           count(*) AS n,
           CAST(min(value) AS DOUBLE) AS lo,
           CAST(max(value) AS DOUBLE) AS hi
    FROM b GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def equidepth_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning — the feature-engineering
    discretizer: ntile(8) per event_type with a PINNED total order
    (value, event_id), so identical values split between adjacent bins
    deterministically in both engines (an unpinned ORDER BY value is
    the classic nondeterminism trap: Spark and DuckDB would tie-break
    by physical row order and hash-diverge). One shuffle on event_type
    carries both the window and the per-bin rollup; bin edges (lo/hi)
    are raw input doubles — no arithmetic, so no rounding discipline
    needed."""
    e = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.withColumn("bin", F.ntile(8).over(w).cast("long"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


# 2-D skyline (Pareto frontier): the multi-objective "best tradeoff"
# query (SKYLINE OF in research SQL dialects). The Spark derivation is
# the O(n log n) sweep — sort by time DESC per group, a point survives
# iff no STRICTLY-LATER point has a strictly higher value (running max
# over a range frame that excludes time ties) — while the oracle is the
# INDEPENDENT brute-force NOT EXISTS dominance join, so the two
# derivations cross-check each other (the triangle_counts pattern).
# Raw value doubles pass through untouched (comparison only, no
# arithmetic), so the hash needs no rounding.
@register(
    "value_skyline",
    """
    WITH p AS (
      SELECT event_id, event_type, value,
             epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')
               AS ts_us
      FROM events
    )
    SELECT event_id, event_type, value, CAST(ts_us AS BIGINT) AS ts_us
    FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.event_type = p.event_type
        AND q.value > p.value AND q.ts_us > p.ts_us
    )
    ORDER BY event_type, event_id
    """,
)
def value_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Pareto frontier over (value, recency): a row is
    on the skyline iff no other row of its type is both later AND
    higher-valued. Scale shape: ONE window exchange on event_type
    (the sweep is a running max over a range frame on the integer
    microsecond axis, so time ties never dominate each other), then a
    map-side filter — no self-join, no candidate blowup; at 10^12
    rows this is the canonical replacement for the quadratic
    dominance join the oracle runs."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'2024-01-01 00:00:00', ts)"
    )
    p = ev.select("event_id", "event_type", "value", ts_us.alias("ts_us"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts_us").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    mx = F.max("value").over(w)
    return (
        p.withColumn("mx_later", mx)
        .filter(F.col("mx_later").isNull() | (F.col("mx_later") <= F.col("value")))
        .select("event_id", "event_type", "value", "ts_us")
        .orderBy("event_type", "event_id")
    )


# user-user similarity (the collaborative-filtering neighbor step):
# cosine over per-user event-type count vectors, ranked by the SQUARED
# cosine as a scaled integer — dot^2 * 1e6 // (|a|^2 * |b|^2) is
# monotone in cosine for non-negative counts, so the top-3 ranking is
# exact while nothing but integers crosses engines.
@register_extra(
    "user_similarity_top3",
    """
    WITH v AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    nrm AS (SELECT user_id, sum(c * c) AS n2 FROM v GROUP BY user_id),
    dot AS (
      SELECT a.user_id AS ua, b.user_id AS ub, sum(a.c * b.c) AS d
      FROM v a JOIN v b ON a.event_type = b.event_type
               AND a.user_id <> b.user_id
      GROUP BY a.user_id, b.user_id
    ),
    s AS (
      SELECT dot.ua, dot.ub,
             (dot.d * dot.d * 1000000) // (na.n2 * nb.n2) AS cos2_e6
      FROM dot
      JOIN nrm na ON na.user_id = dot.ua
      JOIN nrm nb ON nb.user_id = dot.ub
    ),
    r AS (
      SELECT ua, ub, cos2_e6,
             row_number() OVER (PARTITION BY ua
                                ORDER BY cos2_e6 DESC, ub) AS rank
      FROM s
    )
    SELECT CAST(ua AS BIGINT) AS user_id, CAST(rank AS INT) AS rank,
           CAST(ub AS BIGINT) AS similar_user,
           CAST(cos2_e6 AS BIGINT) AS cos2_e6
    FROM r WHERE rank <= 3 ORDER BY user_id, rank
    """,
)
def user_similarity_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most similar users by behavior profile (event-type count
    vectors). Scale shape: the profile vectors live in TYPE space (a
    handful of dimensions), so the pair dot products come from one
    equi-join ON event_type — candidate volume is sum of per-type user
    counts squared over types, the inverted-index join every
    item-based CF system uses, never an all-pairs user join. Window
    top-3 ties pin on user id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    nrm = v.groupBy("user_id").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    a = v.select(
        F.col("user_id").alias("ua"), "event_type", F.col("c").alias("ca")
    )
    b = v.select(
        F.col("user_id").alias("ub"), "event_type", F.col("c").alias("cb")
    )
    dot = (
        a.join(b, "event_type")
        .filter(F.col("ua") != F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("d"))
    )
    s = (
        dot.join(nrm.select(F.col("user_id").alias("ua"), F.col("n2").alias("na")), "ua")
        .join(nrm.select(F.col("user_id").alias("ub"), F.col("n2").alias("nb")), "ub")
        .select(
            "ua", "ub",
            F.expr("(d * d * 1000000) div (na * nb)").alias("cos2_e6"),
        )
    )
    w = Window.partitionBy("ua").orderBy(F.col("cos2_e6").desc(), F.col("ub"))
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("ua").cast("bigint").alias("user_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("ub").cast("bigint").alias("similar_user"),
            F.col("cos2_e6").cast("bigint").alias("cos2_e6"),
        )
        .orderBy("user_id", "rank")
    )


@register_extra(
    "rfm_segmentation",
    """
    WITH mx AS (SELECT max(o_orderdate) AS dmax FROM orders),
    f AS (
      SELECT o_custkey,
             CAST(datediff('day', max(o_orderdate),
                           (SELECT dmax FROM mx)) AS BIGINT) AS r_days,
             CAST(count(*) AS BIGINT) AS f_cnt,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS m_cents
      FROM orders GROUP BY 1
    ),
    q AS (
      SELECT o_custkey, r_days, f_cnt, m_cents,
             ntile(4) OVER (ORDER BY r_days, o_custkey) AS r_q,
             ntile(4) OVER (ORDER BY f_cnt DESC, o_custkey) AS f_q,
             ntile(4) OVER (ORDER BY m_cents DESC, o_custkey) AS m_q
      FROM f
    )
    SELECT o_custkey, r_days, f_cnt, m_cents,
           CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
    FROM q ORDER BY o_custkey
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation — the
    warehouse-classic marketing rollup: per customer, days since last
    order (vs the global max date), order count, lifetime cents
    (floor(price*100) — identical IEEE then floor in both engines),
    and the 3-digit quartile code (best quartile = 1 on every axis).
    ntile ties are pinned by the customer key, so bucket assignment is
    hash-exact. Scale shape: the fact table collapses to the CUSTOMER
    DIM via one partial-aggregable groupBy before any window; the
    three ntile windows then run over dim-sized data (at a true 1e9-
    customer dim you'd swap ntile for the sorted-neighborhood global-
    rank decomposition this repo already ships — noted, not needed at
    gate scale). The global max date is a 1-row broadcast, the
    gapfill bounds-join discipline."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mx = orders.agg(F.max("o_orderdate").alias("dmax"))
    f = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("dlast"),
            F.count("*").alias("f_cnt"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("long")
            ).alias("m_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(F.col("dmax"), F.col("dlast"))
            .cast("long")
            .alias("r_days"),
            "f_cnt",
            "m_cents",
        )
    )
    rw = Window.orderBy("r_days", "o_custkey")
    fw = Window.orderBy(F.col("f_cnt").desc(), "o_custkey")
    mw = Window.orderBy(F.col("m_cents").desc(), "o_custkey")
    return (
        f.select(
            "o_custkey",
            "r_days",
            "f_cnt",
            "m_cents",
            (
                F.ntile(4).over(rw) * 100
                + F.ntile(4).over(fw) * 10
                + F.ntile(4).over(mw)
            )
            .cast("int")
            .alias("rfm_code"),
        )
        .orderBy("o_custkey")
    )


@register_extra(
    "fk_orphan_audit",
    """
    WITH po AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 50 <> 0),
    pc AS (SELECT c_custkey FROM customer WHERE c_custkey % 50 <> 0),
    pn AS (SELECT n_nationkey FROM nation WHERE n_nationkey % 5 <> 0)
    SELECT 'lineitem->orders' AS rel,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM po
                              WHERE po.o_orderkey = l.l_orderkey))
             AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM pc
                              WHERE pc.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM pn
                              WHERE pn.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM pn
                              WHERE pn.n_nationkey = s.s_nationkey))
    ORDER BY rel
    """,
)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across four FK relations — the
    data-quality sweep every warehouse load runs: child rows whose
    parent key has no match, counted via LEFT ANTI joins (the parent
    sets are deterministically damaged — every 50th order/customer and
    every 5th nation dropped — so each relation reports a nonzero,
    hash-gated orphan count instead of a vacuous zero). Scale shape:
    each audit is one anti-join on the FK (broadcast when the parent
    is a dim, shuffle-hash otherwise — Spark picks per AQE) plus a
    count; the four 1-row results union. The oracle states the same
    audits as NOT EXISTS."""

    def audit(rel, child, key, parent, pkey, pfilter):
        c = spark.read.parquet(f"{sf_dir}/{child}.parquet")
        par = spark.read.parquet(f"{sf_dir}/{parent}.parquet").filter(pfilter)
        orphans = c.join(
            par.select(F.col(pkey).alias(key)), key, "left_anti"
        )
        return (
            c.groupBy()
            .agg(F.count("*").alias("n_rows"))
            .crossJoin(
                orphans.groupBy().agg(F.count("*").alias("n_orphans"))
            )
            .select(F.lit(rel).alias("rel"), "n_rows", "n_orphans")
        )

    out = (
        audit(
            "lineitem->orders", "lineitem", "l_orderkey", "orders",
            "o_orderkey", F.col("o_orderkey") % 50 != 0,
        )
        .unionByName(
            audit(
                "orders->customer", "orders", "o_custkey", "customer",
                "c_custkey", F.col("c_custkey") % 50 != 0,
            )
        )
        .unionByName(
            audit(
                "customer->nation", "customer", "c_nationkey", "nation",
                "n_nationkey", F.col("n_nationkey") % 5 != 0,
            )
        )
        .unionByName(
            audit(
                "supplier->nation", "supplier", "s_nationkey", "nation",
                "n_nationkey", F.col("n_nationkey") % 5 != 0,
            )
        )
    )
    return out.orderBy("rel")


@register_extra(
    "k_anonymity_audit",
    """
    WITH qi AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal) AS BIGINT) // 1000 AS bal_band
      FROM customer
    ),
    cls AS (
      SELECT nat, seg, bal_band, count(*) AS sz FROM qi GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n_rows FROM cls)
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_class,
           CAST(count(*) FILTER (WHERE sz < 5) AS BIGINT)
             AS n_violating_classes,
           CAST(COALESCE(sum(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
             AS n_rows_at_risk,
           CAST(COALESCE(sum(sz) FILTER (WHERE sz < 5), 0) * 10000
                // max(t.n_rows) AS BIGINT) AS risk_rate_e4
    FROM cls CROSS JOIN tot t
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k = 5) over the quasi-identifier tuple
    (nation, market segment, account-balance band) — the privacy
    screen run before releasing a dataset: equivalence classes smaller
    than k let individuals be re-identified. Reports class count,
    smallest class, violating classes, rows at risk and the e-4 risk
    rate — all exact integers (balance banded via floor(bal)//1000;
    identical IEEE-then-floor in both engines). Scale shape: ONE
    partial-aggregable groupBy on the QI tuple; everything after runs
    on the class dim, with the total as a broadcast 1-row aggregate."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    qi = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(floor(c_acctbal) AS BIGINT) div 1000").alias(
            "bal_band"
        ),
    )
    cls = qi.groupBy("nat", "seg", "bal_band").agg(
        F.count("*").alias("sz")
    )
    tot = cls.agg(F.sum("sz").alias("n_rows"))
    return (
        cls.crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(
            F.count("*").alias("n_classes"),
            F.min("sz").alias("min_class"),
            F.count(F.when(F.col("sz") < 5, 1)).alias(
                "n_violating_classes"
            ),
            F.coalesce(
                F.sum(F.when(F.col("sz") < 5, F.col("sz"))), F.lit(0)
            ).alias("n_rows_at_risk"),
            F.expr(
                "COALESCE(sum(CASE WHEN sz < 5 THEN sz END), 0)"
                " * 10000 div max(n_rows)"
            ).alias("risk_rate_e4"),
        )
    )


@register_extra(
    "weighted_median_cents",
    """
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    c AS (
      SELECT flag, cents, w,
             sum(w) OVER (PARTITION BY flag ORDER BY cents, w
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
      FROM v
    ),
    m AS (
      SELECT flag, min(cents) AS wmedian_cents
      FROM c WHERE cw >= (tw + 1) // 2 GROUP BY 1
    )
    SELECT m.flag, m.wmedian_cents,
           (SELECT CAST(sum(w) AS BIGINT) FROM v WHERE v.flag = m.flag)
             AS total_weight
    FROM m ORDER BY m.flag
    """,
)
def weighted_median_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted lower median of extended price per return
    flag — the weighted-quantile member of the percentile family
    (plain exact quartiles are already gated): the first price whose
    cumulative quantity reaches ceil(W/2). Exact integers end-to-end
    (floor-cents; weighted rank via a running-sum window ordered
    (cents, w) — the tie order does not move the crossing VALUE, only
    which duplicate row crosses, so the min() is hash-stable). One
    window shuffle on the group key; at true scale the same crossing
    point comes from the bucket-count + offsets decomposition the SNM
    rank machinery demonstrates."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    cw = (
        Window.partitionBy("flag")
        .orderBy("cents", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tww = Window.partitionBy("flag")
    c = v.select(
        "flag",
        "cents",
        F.sum("w").over(cw).alias("cw"),
        F.sum("w").over(tww).alias("tw"),
    )
    m = (
        c.filter(F.col("cw") >= F.expr("(tw + 1) div 2"))
        .groupBy("flag")
        .agg(F.min("cents").alias("wmedian_cents"))
    )
    tot = v.groupBy("flag").agg(F.sum("w").alias("total_weight"))
    return m.join(tot, "flag").orderBy("flag")


@register_extra(
    "abc_pareto_classes",
    """
    WITH rev AS (
      SELECT l_partkey AS part,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    r AS (
      SELECT part, cents,
             sum(cents) OVER (ORDER BY cents DESC, part
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
             sum(cents) OVER () AS total
      FROM rev
    ),
    cls AS (
      SELECT part, cents,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM r
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(cents) * 10000 // max(t.total) AS BIGINT) AS share_e4
    FROM cls CROSS JOIN (SELECT sum(cents) AS total FROM rev) t
    GROUP BY 1 ORDER BY 1
    """,
)
def abc_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/15/5) inventory classification — the operations
    classic: parts ranked by revenue, class A while the running share
    stays within 80%, B to 95%, C after, decided by the EXACT integer
    cross-multiplication cum*100 <= total*80 (no percentage floats).
    Ranking ties pin on the part key. Scale shape: the fact table
    collapses to per-part revenue first (partial agg); the running-
    share window then runs over the PART DIM — with the usual in-code
    note that a 1e9-part dim swaps the global window for the bucketed
    global-rank decomposition."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents")
    )
    cw = (
        Window.orderBy(F.col("cents").desc(), "part")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tw = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = rev.select(
        "part",
        "cents",
        F.sum("cents").over(cw).alias("cum"),
        F.sum("cents").over(tw).alias("total"),
    )
    cls = r.select(
        "cents",
        "total",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        cls.groupBy("abc")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents").alias("revenue_cents"),
            F.expr("sum(cents) * 10000 div max(total)").alias("share_e4"),
        )
        .orderBy("abc")
    )


@register_extra(
    "ship_lead_time_stats",
    """
    WITH lt AS (
      SELECT l_suppkey % 25 AS supp_bucket,
             CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    r AS (
      SELECT supp_bucket, lead_days,
             row_number() OVER (PARTITION BY supp_bucket
                                ORDER BY lead_days) AS rn,
             count(*) OVER (PARTITION BY supp_bucket) AS n
      FROM lt
    )
    SELECT supp_bucket, CAST(max(n) AS BIGINT) AS n_lines,
           CAST(min(lead_days) AS BIGINT) AS min_days,
           CAST(max(lead_days) AS BIGINT) AS max_days,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lead_days END)
                AS BIGINT) AS median_days
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def ship_lead_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per supplier bucket — the supply-chain
    SLA rollup, and the one query in the new analytics set that joins
    the TWO FACT TABLES (lineitem x orders on the order key — at scale
    the join both sides are bucketed by, so it plans shuffle-free on a
    bucketed layout; operators/bucketing.py demonstrates the zero-
    Exchange plan). Exact integer day deltas; the lower median comes
    from the rank window per bucket (25 buckets)."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lt = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        (F.col("l_suppkey") % 25).alias("supp_bucket"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("lead_days"),
    )
    rw = Window.partitionBy("supp_bucket").orderBy("lead_days")
    cw = Window.partitionBy("supp_bucket")
    r = lt.select(
        "supp_bucket",
        "lead_days",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(cw).alias("n"),
    )
    return (
        r.groupBy("supp_bucket")
        .agg(
            F.max("n").cast("long").alias("n_lines"),
            F.min("lead_days").alias("min_days"),
            F.max("lead_days").alias("max_days"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("lead_days"))
            ).alias("median_days"),
        )
        .orderBy("supp_bucket")
    )


# ------------------------------------------------- robust statistics


@register_extra(
    "robust_value_stats",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    n AS (SELECT event_type, count(*) AS n FROM c GROUP BY 1),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn
      FROM c
    ),
    med AS (
      SELECT r.event_type,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END)
           + sum(CASE WHEN rn = (n + 2) // 2 THEN cents ELSE 0 END)
               AS BIGINT) AS med_x2
      FROM r JOIN n USING (event_type) GROUP BY 1
    ),
    dev AS (
      SELECT c.event_type, abs(2 * c.cents - med.med_x2) AS d
      FROM c JOIN med USING (event_type)
    ),
    rd AS (
      SELECT event_type, d,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM dev
    ),
    mad AS (
      SELECT rd.event_type,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN d ELSE 0 END)
           + sum(CASE WHEN rn = (n + 2) // 2 THEN d ELSE 0 END)
               AS BIGINT) AS mad_x4
      FROM rd JOIN n USING (event_type) GROUP BY 1
    ),
    freq AS (
      SELECT event_type, cents, count(*) AS k FROM c GROUP BY 1, 2
    ),
    mode AS (
      SELECT event_type, cents AS mode_cents, k AS mode_count
      FROM (
        SELECT event_type, cents, k,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY k DESC, cents) AS rn
        FROM freq
      ) WHERE rn = 1
    )
    SELECT n.event_type, CAST(n.n AS BIGINT) AS n,
           mode.mode_cents, CAST(mode.mode_count AS BIGINT) AS mode_count,
           med.med_x2, mad.mad_x4
    FROM n JOIN med USING (event_type) JOIN mad USING (event_type)
           JOIN mode USING (event_type)
    ORDER BY event_type
    """,
)
def robust_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics in EXACT integers over value cents:
    mode (tie -> smallest value), median, and MAD (median absolute
    deviation, the robust spread estimator). Integer discipline: the
    median is carried as med_x2 = sum of the two middle order
    statistics (odd n contributes the middle twice via the two
    coinciding ranks), deviations as |2x - med_x2| (2x the usual), and
    the MAD as the same two-rank sum over deviations (4x) — no halving
    ever happens, so there is no float or rounding anywhere and the
    hash gate is exact. Scale shape: two rank windows + one count agg
    per group key; partials combine map-side; no driver round-trip."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    n = c.groupBy("event_type").agg(F.count("*").alias("n"))
    wr = Window.partitionBy("event_type").orderBy("cents")
    r = c.withColumn("rn", F.row_number().over(wr))
    med = (
        r.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents")
                    ).otherwise(0)
                )
                + F.sum(
                    F.when(
                        F.col("rn") == F.expr("(n + 2) div 2"), F.col("cents")
                    ).otherwise(0)
                )
            ).alias("med_x2")
        )
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(2 * F.col("cents") - F.col("med_x2")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    rd = dev.withColumn("rn", F.row_number().over(wd))
    mad = (
        rd.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("rn") == F.expr("(n + 1) div 2"), F.col("d")
                    ).otherwise(0)
                )
                + F.sum(
                    F.when(
                        F.col("rn") == F.expr("(n + 2) div 2"), F.col("d")
                    ).otherwise(0)
                )
            ).alias("mad_x4")
        )
    )
    freq = c.groupBy("event_type", "cents").agg(F.count("*").alias("k"))
    wm = Window.partitionBy("event_type").orderBy(
        F.desc("k"), F.asc("cents")
    )
    mode = (
        freq.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("cents").alias("mode_cents"),
            F.col("k").cast("long").alias("mode_count"),
        )
    )
    return (
        n.select("event_type", F.col("n").cast("long").alias("n"))
        .join(med, "event_type")
        .join(mad, "event_type")
        .join(mode, "event_type")
        .orderBy("event_type")
    )


# -------------------------------------------------- Mann-Whitney U


@register_extra(
    "mannwhitney_u_pairs",
    """
    WITH c AS (
      SELECT event_type AS t,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    hist AS (SELECT t, v, count(*) AS c FROM c GROUP BY 1, 2),
    n AS (SELECT t, count(*) AS n FROM c GROUP BY 1),
    pr AS (
      SELECT a.t AS ta, b.t AS tb
      FROM (SELECT DISTINCT t FROM c) a
      JOIN (SELECT DISTINCT t FROM c) b ON a.t < b.t
    ),
    sa AS (SELECT pr.ta, pr.tb, h.v, h.c AS ca
           FROM pr JOIN hist h ON h.t = pr.ta),
    sb AS (SELECT pr.ta, pr.tb, h.v, h.c AS cb
           FROM pr JOIN hist h ON h.t = pr.tb),
    spine AS (
      SELECT coalesce(sa.ta, sb.ta) AS ta, coalesce(sa.tb, sb.tb) AS tb,
             coalesce(sa.v, sb.v) AS v,
             coalesce(sa.ca, 0) AS ca, coalesce(sb.cb, 0) AS cb
      FROM sa FULL OUTER JOIN sb
        ON sb.ta = sa.ta AND sb.tb = sa.tb AND sb.v = sa.v
    ),
    cum AS (
      SELECT ta, tb, ca, cb,
             sum(cb) OVER (PARTITION BY ta, tb ORDER BY v) - cb AS cb_lt
      FROM spine
    ),
    u AS (
      SELECT ta, tb,
             CAST(sum(ca * (2 * cb_lt + cb)) AS BIGINT) AS u2
      FROM cum GROUP BY 1, 2
    )
    SELECT u.ta AS type_a, u.tb AS type_b,
           na.n AS n_a, nb.n AS n_b, u.u2,
           CAST((1000000 * (u.u2 - na.n * nb.n)) // (na.n * nb.n)
             AS BIGINT) AS cliff_delta_e6
    FROM u JOIN n na ON na.t = u.ta JOIN n nb ON nb.t = u.tb
    ORDER BY type_a, type_b
    """,
)
def mannwhitney_u_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum statistic + Cliff's delta effect size
    for every event-type pair, EXACT integers: tie handling by the
    doubled statistic U2 = sum over x in A of 2*#(B < x) + #(B = x)
    (i.e. ranks doubled so midranks never produce .5), and delta =
    (U2 - n_a*n_b) / (n_a*n_b) ppm-quantized with one truncating
    division. The nonparametric two-sample location test a data-quality
    pipeline runs when distributions are non-normal (complements the
    KS-drift query). Scale shape: the fact table collapses to per-type
    value histograms first (map-side partial), the pair spine is
    histogram-sized, and the rank accumulation is one window cumsum
    per pair — no pooled re-ranking of raw rows, no n^2 value join."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("t"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    hist = c.groupBy("t", "v").agg(F.count("*").alias("cnt"))
    n = c.groupBy("t").agg(F.count("*").alias("n"))
    types = c.select("t").distinct()
    pr = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.t") < F.col("b.t"))
        .select(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
    )
    sa = pr.join(hist, pr.ta == hist.t).select(
        "ta", "tb", "v", F.col("cnt").alias("ca")
    )
    sb = pr.join(hist, pr.tb == hist.t).select(
        "ta", "tb", "v", F.col("cnt").alias("cb")
    )
    spine = sa.join(sb, ["ta", "tb", "v"], "full_outer").select(
        "ta",
        "tb",
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.partitionBy("ta", "tb").orderBy("v")
    cum = spine.select(
        "ta",
        "tb",
        "ca",
        "cb",
        (F.sum("cb").over(w) - F.col("cb")).alias("cb_lt"),
    )
    u = cum.groupBy("ta", "tb").agg(
        F.sum(F.col("ca") * (2 * F.col("cb_lt") + F.col("cb")))
        .cast("long")
        .alias("u2")
    )
    na = n.select(F.col("t").alias("ta"), F.col("n").alias("n_a"))
    nb = n.select(F.col("t").alias("tb"), F.col("n").alias("n_b"))
    return (
        u.join(F.broadcast(na), "ta")
        .join(F.broadcast(nb), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "n_a",
            "n_b",
            "u2",
            F.expr(
                "(1000000 * (u2 - n_a * n_b)) div (n_a * n_b)"
            ).alias("cliff_delta_e6"),
        )
        .orderBy("type_a", "type_b")
    )


# ------------------------------------------------- FIFO matching


@register_extra(
    "fifo_match_ledger",
    """
    WITH li AS (
      SELECT l_partkey,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
             l_returnflag = 'R' AS is_in,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem
    ),
    outs AS (
      SELECT l_partkey, sum(qty) AS tot_out
      FROM li WHERE NOT is_in GROUP BY 1
    ),
    ins AS (
      SELECT l_partkey, qty,
             sum(qty) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM li WHERE is_in
    ),
    m AS (
      SELECT i.l_partkey, i.qty,
             greatest(0, least(i.cum, coalesce(o.tot_out, 0))
                       - least(i.cum - i.qty, coalesce(o.tot_out, 0)))
               AS matched
      FROM ins i LEFT JOIN outs o USING (l_partkey)
    )
    SELECT l_partkey % 20 AS bucket,
           count(*) AS n_inflows,
           CAST(sum(matched) AS BIGINT) AS matched_qty,
           count(*) FILTER (WHERE matched = qty) AS n_exhausted,
           count(*) FILTER (WHERE matched = 0) AS n_untouched
    FROM m GROUP BY 1 ORDER BY bucket
    """,
)
def fifo_match_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching via the cumulative-range trick (the ledger /
    cost-basis engine kernel): per part, inflow lots (returnflag 'R',
    ship-date order) are consumed by the part's total outflow demand;
    a lot's matched quantity is the overlap of its cumulative-sum
    interval [cum-qty, cum) with [0, total_out) — ONE window cumsum +
    one join, no iterative matching loop, which is what makes FIFO
    tractable at warehouse scale (the naive row-pairing is a per-key
    sequential scan). Exact integers; reports per part-bucket lot
    counts, matched quantity, fully-exhausted and untouched lots."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        (F.col("l_returnflag") == "R").alias("is_in"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    outs = (
        li.filter(~F.col("is_in"))
        .groupBy("l_partkey")
        .agg(F.sum("qty").alias("tot_out"))
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ins = li.filter(F.col("is_in")).select(
        "l_partkey", "qty", F.sum("qty").over(w).alias("cum")
    )
    m = ins.join(outs, "l_partkey", "left").select(
        "l_partkey",
        "qty",
        F.greatest(
            F.lit(0),
            F.least(F.col("cum"), F.coalesce("tot_out", F.lit(0)))
            - F.least(
                F.col("cum") - F.col("qty"), F.coalesce("tot_out", F.lit(0))
            ),
        ).alias("matched"),
    )
    return (
        m.groupBy((F.col("l_partkey") % 20).alias("bucket"))
        .agg(
            F.count("*").alias("n_inflows"),
            F.sum("matched").cast("long").alias("matched_qty"),
            F.count(F.when(F.col("matched") == F.col("qty"), 1)).alias(
                "n_exhausted"
            ),
            F.count(F.when(F.col("matched") == 0, 1)).alias("n_untouched"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------- bitmap indexes


@register_extra(
    "bitmap_intersect_cards",
    """
    WITH bm AS (
      SELECT event_type AS t, user_id // 32 AS w,
             bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
      FROM events GROUP BY 1, 2
    ),
    card AS (
      SELECT t, CAST(sum(bit_count(bits)) AS BIGINT) AS card FROM bm
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.t AS ta, b.t AS tb,
             CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_and
      FROM bm a JOIN bm b ON a.t < b.t AND a.w = b.w
      GROUP BY 1, 2
    )
    SELECT p.ta AS type_a, p.tb AS type_b,
           ca.card AS card_a, cb.card AS card_b, p.n_and,
           ca.card + cb.card - p.n_and AS n_or,
           CAST((1000000 * p.n_and)
                // (ca.card + cb.card - p.n_and) AS BIGINT) AS jaccard_e6
    FROM pairs p
    JOIN card ca ON ca.t = p.ta
    JOIN card cb ON cb.t = p.tb
    ORDER BY type_a, type_b
    """,
)
def bitmap_intersect_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra (the roaring/bitmap join-index pattern):
    per event_type, pack the distinct-user set into 32-bit word chunks
    with a bit_or aggregate; pairwise audience overlap is then a word-
    aligned AND + popcount join — cardinalities, union size, and ppm
    Jaccard, all exact integers. This is how OLAP engines answer
    segment-overlap questions without materializing id pair joins:
    the shuffled payload is one word per 32 ids, and intersection cost
    is bitwise, independent of set density. Scale shape: one partial
    bit_or shuffle, then a word-keyed equi-join over ~|ids|/32 rows."""
    ev = _t(spark, sf_dir, "events")
    bm = (
        ev.groupBy(
            F.col("event_type").alias("t"),
            F.expr("user_id div 32").alias("w"),
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, cast(user_id % 32 as int)))"
            ).alias("bits")
        )
    )
    card = bm.groupBy("t").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("card")
    )
    a = bm.select(
        F.col("t").alias("ta"), "w", F.col("bits").alias("ba")
    )
    b = bm.select(
        F.col("t").alias("tb"), "w", F.col("bits").alias("bb")
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
            .cast("long")
            .alias("n_and")
        )
    )
    ca = card.select(F.col("t").alias("ta"), F.col("card").alias("card_a"))
    cb = card.select(F.col("t").alias("tb"), F.col("card").alias("card_b"))
    return (
        pairs.join(F.broadcast(ca), "ta")
        .join(F.broadcast(cb), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "card_a",
            "card_b",
            "n_and",
            (F.col("card_a") + F.col("card_b") - F.col("n_and")).alias(
                "n_or"
            ),
            F.expr(
                "(1000000 * n_and) div (card_a + card_b - n_and)"
            ).alias("jaccard_e6"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------- trimmed/winsorized


@register_extra(
    "trimmed_value_stats",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    n AS (SELECT event_type, count(*) AS n FROM c GROUP BY 1),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn
      FROM c
    ),
    j AS (
      SELECT r.event_type, r.cents, r.rn, n.n,
             n.n // 10 AS k
      FROM r JOIN n USING (event_type)
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(cents) FILTER (WHERE rn > k AND rn <= n - k)
                AS BIGINT) AS trim_sum,
           CAST(max(n) - 2 * max(k) AS BIGINT) AS trim_n,
           CAST(sum(CASE
                 WHEN rn <= k THEN (SELECT cents FROM j j2
                    WHERE j2.event_type = j.event_type
                      AND j2.rn = j.k + 1)
                 WHEN rn > n - k THEN (SELECT cents FROM j j2
                    WHERE j2.event_type = j.event_type
                      AND j2.rn = j.n - j.k)
                 ELSE cents END) AS BIGINT) AS winsor_sum
    FROM j GROUP BY event_type ORDER BY event_type
    """,
)
def trimmed_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed and winsorized aggregates per group in exact
    integers: drop (trim) or clamp (winsorize) the k = n//10 smallest
    and largest cents values before summing — the robust-mean pair
    every metrics pipeline keeps next to the raw mean to survive
    outliers. Emits exact sums + counts instead of divided means so
    nothing ever needs float rounding. Spark: one rank window, then
    conditional sums with the clamp bounds (the (k+1)-th and (n-k)-th
    order statistics) joined in as 1-row-per-group aggregates; the
    oracle reads the same bounds via correlated subqueries — different
    derivations of the same order statistics."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    n = c.groupBy("event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("cents")
    r = c.withColumn("rn", F.row_number().over(w))
    j = r.join(F.broadcast(n), "event_type").withColumn(
        "k", F.expr("n div 10")
    )
    bounds = j.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("cents"))).alias(
            "lo"
        ),
        F.max(
            F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("cents"))
        ).alias("hi"),
    )
    jb = j.join(F.broadcast(bounds), "event_type")
    return (
        jb.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(
                F.when(
                    (F.col("rn") > F.col("k"))
                    & (F.col("rn") <= F.col("n") - F.col("k")),
                    F.col("cents"),
                )
            )
            .cast("long")
            .alias("trim_sum"),
            (F.max("n") - 2 * F.max("k")).cast("long").alias("trim_n"),
            F.sum(
                F.when(F.col("rn") <= F.col("k"), F.col("lo"))
                .when(F.col("rn") > F.col("n") - F.col("k"), F.col("hi"))
                .otherwise(F.col("cents"))
            )
            .cast("long")
            .alias("winsor_sum"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- selectivity estimation

# (lo, hi) half-open cents predicates probed against the histogram
_SEL_PREDS = [(2_000_000, 5_000_000), (10_000_000, 20_000_000),
              (30_000_000, 49_000_000)]
_SEL_B = 16  # equi-depth buckets


@register_extra(
    "histogram_selectivity_audit",
    f"""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
             count(*) OVER () AS n
      FROM c
    ),
    bk AS (
      SELECT ((rn - 1) * {_SEL_B}) // n AS b,
             min(cents) AS bmin, max(cents) AS bmax,
             count(*) AS cnt
      FROM r GROUP BY 1
    ),
    preds(pid, lo, hi) AS (VALUES
      {", ".join(f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(_SEL_PREDS))}),
    est AS (
      SELECT p.pid,
             CAST(sum(
               bk.cnt * 1000000 *
               greatest(0, least(p.hi, bk.bmax + 1) - greatest(p.lo, bk.bmin))
               // (bk.bmax + 1 - bk.bmin)
             ) AS BIGINT) AS est_rows_e6
      FROM preds p CROSS JOIN bk
      GROUP BY 1
    ),
    act AS (
      SELECT p.pid, count(c.cents) AS actual_rows
      FROM preds p LEFT JOIN c
        ON c.cents >= p.lo AND c.cents < p.hi
      GROUP BY 1
    )
    SELECT est.pid AS pred_id, est.est_rows_e6, act.actual_rows
    FROM est JOIN act USING (pid) ORDER BY pred_id
    """,
)
def histogram_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram selectivity estimation — the cardinality
    model inside every cost-based optimizer: build a 16-bucket
    equi-depth histogram over price cents (rank-sliced, so bucket
    populations are exact), then estimate each range predicate's row
    count by per-bucket linear interpolation (integer e6 scaling, one
    truncating division per bucket term — identical in both engines)
    and report it against the true count. Scale shape: the histogram
    is one rank window + 16-row agg; estimation touches only the
    16-row synopsis — the entire point of the structure."""
    o = _t(spark, sf_dir, "orders")
    c = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents")
    )
    w = Window.orderBy("cents")
    r = c.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    bk = (
        r.groupBy(F.expr(f"((rn - 1) * {_SEL_B}) div n").alias("b"))
        .agg(
            F.min("cents").alias("bmin"),
            F.max("cents").alias("bmax"),
            F.count("*").alias("cnt"),
        )
    )
    preds = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(_SEL_PREDS)],
        "pid int, lo long, hi long",
    )
    est = (
        preds.crossJoin(F.broadcast(bk))
        .select(
            "pid",
            F.expr(
                "cnt * 1000000 *"
                " greatest(0L, least(hi, bmax + 1) - greatest(lo, bmin))"
                " div (bmax + 1 - bmin)"
            ).alias("term"),
        )
        .groupBy("pid")
        .agg(F.sum("term").cast("long").alias("est_rows_e6"))
    )
    act = (
        preds.crossJoin(c)
        .select(
            "pid",
            ((F.col("cents") >= F.col("lo")) & (F.col("cents") < F.col("hi")))
            .cast("long")
            .alias("hit"),
        )
        .groupBy("pid")
        .agg(F.sum("hit").alias("actual_rows"))
    )
    return (
        est.join(act, "pid")
        .select(F.col("pid").alias("pred_id"), "est_rows_e6", "actual_rows")
        .orderBy("pred_id")
    )


# ---------------------------------------------------- zone maps


_ZM_ZONE = 1000  # orderkey-range zone width


@register_extra(
    "zonemap_skipping_audit",
    f"""
    WITH z AS (
      SELECT o_orderkey // {_ZM_ZONE} AS zone,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    zm AS (
      SELECT zone, min(cents) AS zmin, max(cents) AS zmax,
             count(*) AS zrows
      FROM z GROUP BY 1
    ),
    preds(pid, lo, hi) AS (VALUES
      {", ".join(f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(_SEL_PREDS))}),
    audit AS (
      SELECT p.pid, zm.zrows,
             (zm.zmax < p.lo OR zm.zmin >= p.hi) AS pruned
      FROM preds p CROSS JOIN zm
    ),
    act AS (
      SELECT p.pid, count(z.cents) AS actual_hits
      FROM preds p LEFT JOIN z ON z.cents >= p.lo AND z.cents < p.hi
      GROUP BY 1
    )
    SELECT a.pid AS pred_id,
           count(*) AS n_zones,
           count(*) FILTER (WHERE a.pruned) AS n_pruned,
           CAST(sum(CASE WHEN a.pruned THEN 0 ELSE a.zrows END) AS BIGINT)
             AS rows_scanned,
           max(act.actual_hits) AS actual_hits
    FROM audit a JOIN act ON act.pid = a.pid
    GROUP BY 1 ORDER BY pred_id
    """,
)
def zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max data skipping) effectiveness audit — the
    mechanism behind parquet row-group pruning and warehouse
    micro-partition skipping: zones are orderkey ranges, each keeps
    only (min, max, rows) of the price column; a range predicate prunes
    a zone iff zmax < lo or zmin >= hi. Reports, per predicate, the
    zones pruned, the rows an engine would still scan, and the true
    hit count — i.e. how well THIS clustering serves THIS predicate
    (unclustered values -> wide zones -> no skipping, the audit a
    table-layout tuner runs before choosing a sort key). Exact
    integers; the zone synopsis is a 15-row partial-agg."""
    o = _t(spark, sf_dir, "orders")
    z = o.select(
        F.expr(f"o_orderkey div {_ZM_ZONE}").alias("zone"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    zm = z.groupBy("zone").agg(
        F.min("cents").alias("zmin"),
        F.max("cents").alias("zmax"),
        F.count("*").alias("zrows"),
    )
    preds = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(_SEL_PREDS)],
        "pid int, lo long, hi long",
    )
    audit = preds.crossJoin(F.broadcast(zm)).select(
        "pid",
        "zrows",
        ((F.col("zmax") < F.col("lo")) | (F.col("zmin") >= F.col("hi"))).alias(
            "pruned"
        ),
    )
    act = (
        preds.crossJoin(z)
        .select(
            "pid",
            ((F.col("cents") >= F.col("lo")) & (F.col("cents") < F.col("hi")))
            .cast("long")
            .alias("hit"),
        )
        .groupBy("pid")
        .agg(F.sum("hit").alias("actual_hits"))
    )
    return (
        audit.groupBy("pid")
        .agg(
            F.count("*").alias("n_zones"),
            F.count(F.when(F.col("pruned"), 1)).alias("n_pruned"),
            F.sum(F.when(F.col("pruned"), 0).otherwise(F.col("zrows")))
            .cast("long")
            .alias("rows_scanned"),
        )
        .join(act, "pid")
        .select(
            F.col("pid").alias("pred_id"),
            "n_zones",
            "n_pruned",
            "rows_scanned",
            "actual_hits",
        )
        .orderBy("pred_id")
    )


# ---------------------------------------------------- Merkle roots


@register_extra(
    "merkle16_partition_roots",
    """
    WITH leaf AS (
      SELECT o_orderkey // 1000 AS zone, o_orderkey AS k,
             md5(CAST(o_orderkey AS VARCHAR) || ':'
                 || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         AS VARCHAR)
                 || ':' || o_orderstatus) AS h
      FROM orders
    ),
    l0 AS (
      SELECT zone, h,
             row_number() OVER (PARTITION BY zone ORDER BY k) - 1 AS i
      FROM leaf
    ),
    l1 AS (
      SELECT zone, i // 16 AS i,
             md5(string_agg(h, '' ORDER BY i)) AS h
      FROM l0 GROUP BY zone, i // 16
    ),
    l2 AS (
      SELECT zone, i // 16 AS i,
             md5(string_agg(h, '' ORDER BY i)) AS h
      FROM l1 GROUP BY zone, i // 16
    ),
    root AS (
      SELECT zone, md5(string_agg(h, '' ORDER BY i)) AS merkle_root,
             count(*) AS n_l2
      FROM l2 GROUP BY zone
    )
    SELECT zone, merkle_root,
           (SELECT count(*) FROM leaf lf WHERE lf.zone = root.zone)
             AS n_rows
    FROM root ORDER BY zone
    """,
)
def merkle16_partition_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-16 Merkle tree root per table zone — the content-integrity
    fingerprint a lakehouse computes per partition to detect drift or
    tampering without re-reading neighbors (Delta/Iceberg-style
    manifests carry exactly this shape of summary). Leaves are md5 of
    the canonical row rendering in key order; two 16-ary combine levels
    then the zone root. Deterministic strings end to end. Scale shape:
    the combines are ordered-collect_list aggregations per 16-group —
    partial-friendly, fan-in 16 keeps the shuffle payload at 1/16 per
    level; nothing ever sorts globally."""
    o = _t(spark, sf_dir, "orders")
    leaf = o.select(
        F.expr("o_orderkey div 1000").alias("zone"),
        F.col("o_orderkey").alias("k"),
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long")
                .cast("string"),
                F.lit(":"),
                F.col("o_orderstatus"),
            ).cast("binary")
        ).alias("h"),
    )
    w = Window.partitionBy("zone").orderBy("k")
    l0 = leaf.select(
        "zone", "h", (F.row_number().over(w) - 1).alias("i")
    )

    def combine(df):
        return (
            df.groupBy("zone", F.expr("i div 16").alias("gi"))
            .agg(
                F.md5(
                    F.concat_ws(
                        "",
                        F.expr(
                            "transform(sort_array(collect_list("
                            "struct(i, h))), x -> x.h)"
                        ),
                    ).cast("binary")
                ).alias("h")
            )
            .withColumnRenamed("gi", "i")
        )

    l2 = combine(combine(l0))
    root = l2.groupBy("zone").agg(
        F.md5(
            F.concat_ws(
                "",
                F.expr(
                    "transform(sort_array(collect_list(struct(i, h))),"
                    " x -> x.h)"
                ),
            ).cast("binary")
        ).alias("merkle_root")
    )
    nrows = leaf.groupBy("zone").agg(F.count("*").alias("n_rows"))
    return root.join(nrows, "zone").orderBy("zone")


# ------------------------------------------------ consistent hashing

_CH_SERVERS = 8
_CH_VNODES = 16


@register_extra(
    "consistent_hash_balance",
    f"""
    WITH ring AS (
      SELECT 's' || CAST(s.range AS VARCHAR) AS server,
             ('0x' || substr(md5('vn:s' || CAST(s.range AS VARCHAR)
                                 || ':' || CAST(v.range AS VARCHAR)),
                             1, 8))::BIGINT AS vpos
      FROM range({_CH_SERVERS}) s, range({_CH_VNODES}) v
    ),
    keys AS (
      SELECT o_orderkey,
             ('0x' || substr(md5('key:' || CAST(o_orderkey AS VARCHAR)),
                             1, 8))::BIGINT AS kpos
      FROM orders
    ),
    wrap AS (
      SELECT server AS wserver
      FROM ring ORDER BY vpos, server LIMIT 1
    ),
    assign AS (
      SELECT k.o_orderkey,
             coalesce(
               (SELECT r.server FROM ring r
                WHERE r.vpos >= k.kpos
                ORDER BY r.vpos, r.server LIMIT 1),
               (SELECT wserver FROM wrap)) AS server
      FROM keys k
    )
    SELECT server, count(*) AS n_keys
    FROM assign GROUP BY 1 ORDER BY server
    """,
)
def consistent_hash_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing ring balance audit: 8 servers x 16 virtual
    nodes on a 32-bit md5 ring, every order key routed to the successor
    vnode (wraparound to the ring minimum) — the shard-placement design
    check run before picking vnode counts (too few vnodes -> hot
    shards). Exact integers/strings. Spark: the ring is a 128-row
    broadcast; assignment is min-over-candidates + global-min fallback
    in one pass — no per-key subquery, the identical semantics the
    oracle writes as correlated LIMIT 1 lookups. Scale shape: broadcast
    dim join, map-side only."""
    o = _t(spark, sf_dir, "orders")
    ring = (
        spark.range(_CH_SERVERS)
        .select(F.concat(F.lit("s"), F.col("id").cast("string")).alias("server"))
        .crossJoin(spark.range(_CH_VNODES).select(F.col("id").alias("v")))
        .select(
            "server",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("vn:"),
                            F.col("server"),
                            F.lit(":"),
                            F.col("v").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("vpos"),
        )
    )
    keys = o.select(
        "o_orderkey",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("key:"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("kpos"),
    )
    cand = keys.join(
        F.broadcast(ring), F.col("vpos") >= F.col("kpos"), "left"
    )
    wsucc = Window.partitionBy("o_orderkey").orderBy(
        F.asc_nulls_last("vpos"), F.asc_nulls_last("server")
    )
    first = (
        cand.withColumn("rn", F.row_number().over(wsucc))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", F.col("server").alias("succ"))
    )
    wrap = ring.orderBy("vpos", "server").limit(1).select(
        F.col("server").alias("wserver")
    )
    assign = first.crossJoin(F.broadcast(wrap)).select(
        "o_orderkey", F.coalesce("succ", F.col("wserver")).alias("server")
    )
    return (
        assign.groupBy("server")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("server")
    )


# ------------------------------------------------ encoding advisor


@register_extra(
    "encoding_advisor",
    """
    WITH s AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             user_id,
             row_number() OVER (ORDER BY ts, event_id) AS rn
      FROM events
    ),
    v AS (
      SELECT rn, 'event_type' AS col,
             CAST(length(event_type) AS BIGINT) AS width,
             event_type AS val FROM s
      UNION ALL
      SELECT rn, 'user_id', 8, CAST(user_id AS VARCHAR) FROM s
      UNION ALL
      SELECT rn, 'cents', 8, CAST(cents AS VARCHAR) FROM s
    ),
    runs AS (
      SELECT col, sum(isnew) AS n_runs FROM (
        SELECT col,
               CASE WHEN val IS DISTINCT FROM
                   lag(val) OVER (PARTITION BY col ORDER BY rn)
                   THEN 1 ELSE 0 END AS isnew
        FROM v
      ) GROUP BY col
    ),
    stats AS (
      SELECT col, count(*) AS n,
             CAST(sum(width) AS BIGINT) AS plain_bytes,
             count(DISTINCT val) AS nd,
             CAST(sum(width) FILTER (WHERE rn_d = 1) AS BIGINT)
               AS dict_payload
      FROM (
        SELECT *, row_number() OVER (PARTITION BY col, val
                                     ORDER BY rn) AS rn_d
        FROM v
      ) GROUP BY col
    )
    SELECT stats.col,
           stats.plain_bytes,
           CAST(stats.nd AS BIGINT) AS n_distinct,
           stats.dict_payload
             + (stats.n * length(bin(stats.nd - 1)) + 7) // 8
             AS dict_bytes,
           CAST(runs.n_runs AS BIGINT) AS n_runs
    FROM stats JOIN runs USING (col)
    ORDER BY col
    """,
)
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor (the decision parquet/ORC writers make
    per page): for each candidate column compute the PLAIN size (sum
    of value widths), the DICTIONARY size (distinct payload + n
    indices at ceil(log2(nd)) bits), and the RLE run count in storage
    (ts, event_id) order — exact integers, the inputs to a
    bytes-per-encoding comparison that picks the layout. Scale shape:
    one long-format union scan, a distinct-rank window for the
    dictionary payload, and a lag window for runs — all
    partial-aggregable per column; nothing materializes an encoded
    copy."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        "user_id",
        F.row_number().over(w).alias("rn"),
    )
    v = (
        s.select(
            "rn",
            F.lit("event_type").alias("col"),
            F.length("event_type").cast("long").alias("width"),
            F.col("event_type").alias("val"),
        )
        .unionAll(
            s.select(
                "rn",
                F.lit("user_id"),
                F.lit(8).cast("long"),
                F.col("user_id").cast("string"),
            )
        )
        .unionAll(
            s.select(
                "rn",
                F.lit("cents"),
                F.lit(8).cast("long"),
                F.col("cents").cast("string"),
            )
        )
    )
    wr = Window.partitionBy("col").orderBy("rn")
    runs = v.select(
        "col",
        F.when(
            ~F.col("val").eqNullSafe(F.lag("val").over(wr)), 1
        )
        .otherwise(0)
        .alias("isnew"),
    ).groupBy("col").agg(F.sum("isnew").cast("long").alias("n_runs"))
    wd = Window.partitionBy("col", "val").orderBy("rn")
    stats = (
        v.withColumn("rn_d", F.row_number().over(wd))
        .groupBy("col")
        .agg(
            F.count("*").alias("n"),
            F.sum("width").cast("long").alias("plain_bytes"),
            F.countDistinct("val").cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("rn_d") == 1, F.col("width")))
            .cast("long")
            .alias("dict_payload"),
        )
    )
    return (
        stats.join(runs, "col")
        .select(
            "col",
            "plain_bytes",
            "n_distinct",
            (
                F.col("dict_payload")
                + F.expr(
                    "(n * length(bin(n_distinct - 1)) + 7) div 8"
                )
            ).alias("dict_bytes"),
            "n_runs",
        )
        .orderBy("col")
    )


# ------------------------------------------------ PVM waterfall


@register_extra(
    "pvm_waterfall",
    """
    WITH li AS (
      SELECT l_partkey % 20 AS bucket,
             CAST(year(l_shipdate) AS INT) AS yr,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
      WHERE year(l_shipdate) IN (1996, 1997)
    ),
    agg AS (
      SELECT bucket, yr, sum(q) AS q, sum(cents) AS rev
      FROM li GROUP BY 1, 2
    ),
    p AS (
      SELECT a.bucket,
             a.q AS q0, a.rev AS r0, b.q AS q1, b.rev AS r1
      FROM agg a JOIN agg b
        ON b.bucket = a.bucket AND a.yr = 1996 AND b.yr = 1997
    )
    SELECT bucket,
           CAST(r1 - r0 AS BIGINT) AS delta_rev,
           CAST((q1 - q0) * r0 // q0 AS BIGINT) AS volume_effect,
           CAST(r1 - r0 - ((q1 - q0) * r0 // q0) AS BIGINT)
             AS price_mix_effect
    FROM p ORDER BY bucket
    """,
)
def pvm_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix waterfall: decompose each part-bucket's
    1996->1997 revenue change into the volume effect (quantity change
    at the base year's average unit revenue, (dq * r0) // q0 — one
    truncating integer division) and the residual price/mix effect —
    the variance-bridge every finance review runs on revenue deltas.
    Exact cents; both engines compute the identical quotient. Scale
    shape: two partial-agg passes and a self-join on the 20-row
    bucket dim."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate").isin(1996, 1997))
        .select(
            (F.col("l_partkey") % 20).alias("bucket"),
            F.year("l_shipdate").alias("yr"),
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("q"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    agg = li.groupBy("bucket", "yr").agg(
        F.sum("q").alias("q"), F.sum("cents").alias("rev")
    )
    a = agg.filter(F.col("yr") == 1996).select(
        "bucket", F.col("q").alias("q0"), F.col("rev").alias("r0")
    )
    b = agg.filter(F.col("yr") == 1997).select(
        "bucket", F.col("q").alias("q1"), F.col("rev").alias("r1")
    )
    return (
        a.join(b, "bucket")
        .select(
            "bucket",
            (F.col("r1") - F.col("r0")).alias("delta_rev"),
            F.expr("(q1 - q0) * r0 div q0").alias("volume_effect"),
            F.expr("r1 - r0 - ((q1 - q0) * r0 div q0)").alias(
                "price_mix_effect"
            ),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------ Gini


@register_extra(
    "gini_concentration",
    """
    WITH c AS (
      SELECT o_orderpriority AS seg,
             -- whole dollars, not cents: 1e6 * n * tot must stay int64
             CAST(floor(o_totalprice + 0.5) AS BIGINT) AS d
      FROM orders
    ),
    r AS (
      SELECT seg, d,
             row_number() OVER (PARTITION BY seg ORDER BY d) AS i
      FROM c
    ),
    s AS (
      SELECT seg, count(*) AS n,
             CAST(sum(d) AS BIGINT) AS tot,
             CAST(sum(i * d) AS BIGINT) AS wsum
      FROM r GROUP BY 1
    )
    SELECT seg, CAST(n AS BIGINT) AS n, tot,
           CAST((1000000 * (2 * wsum - (n + 1) * tot)) // (n * tot)
             AS BIGINT) AS gini_e6
    FROM s ORDER BY seg
    """,
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration per order-priority
    segment — the inequality measure behind whale-dependence audits
    (how much of the book the top orders carry): with values sorted
    ascending and rank-weighted, G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)), ppm-quantized with one truncating division, exact
    integers everywhere (ranks are deterministic: equal values are
    interchangeable in the formula, so tie order cannot change the
    sum). Scale shape: one rank window + partial sums per segment."""
    o = _t(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderpriority").alias("seg"),
        # whole dollars, not cents: 1e6 * n * tot must stay int64
        F.floor(F.col("o_totalprice") + 0.5).cast("long").alias("d"),
    )
    w = Window.partitionBy("seg").orderBy("d")
    r = c.withColumn("i", F.row_number().over(w))
    s = r.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("d").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("d")).cast("long").alias("wsum"),
    )
    return s.select(
        "seg",
        F.col("n").cast("long").alias("n"),
        "tot",
        F.expr("(1000000 * (2 * wsum - (n + 1) * tot)) div (n * tot)").alias(
            "gini_e6"
        ),
    ).orderBy("seg")


# ----------------------------------------------------- l-diversity


@register_extra(
    "l_diversity_audit",
    """
    WITH q AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 21600 AS day_q,
             user_id % 10 AS sensitive
      FROM events
    ),
    g AS (
      SELECT event_type, day_q,
             count(*) AS group_size,
             count(DISTINCT sensitive) AS l
      FROM q GROUP BY 1, 2
    )
    SELECT CAST(l AS INT) AS l,
           count(*) AS n_groups,
           CAST(min(group_size) AS BIGINT) AS min_group_size
    FROM g GROUP BY 1 ORDER BY l
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity privacy audit (the k-anonymity companion): for each
    quasi-identifier group (event_type x 6-hour time-of-day quarter),
    how many DISTINCT sensitive values (user cohort) it contains — a
    group that is k-anonymous but 1-diverse still leaks the sensitive
    attribute outright, which is exactly what this histogram exposes
    before a data release. Exact integers; one partial-agg with a
    distinct count per group. Scale shape: quasi-ID groups are the
    shuffle key; sensitive cardinality per group is bounded by the
    domain (10), so state stays tiny."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.expr("(unix_timestamp(ts) % 86400) div 21600").alias("day_q"),
        (F.col("user_id") % 10).alias("sensitive"),
    )
    g = q.groupBy("event_type", "day_q").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("sensitive").alias("l"),
    )
    return (
        g.groupBy(F.col("l").cast("int").alias("l"))
        .agg(
            F.count("*").alias("n_groups"),
            F.min("group_size").cast("long").alias("min_group_size"),
        )
        .orderBy("l")
    )


# ------------------------------------------------- Mattson curve

_LRU_CAPS = [1, 2, 4, 8]


@register_extra(
    "mattson_lru_curve",
    f"""
    WITH pos AS (
      SELECT user_id,
             CAST(props ->> 'k' AS BIGINT) % 8 AS item,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
      WHERE CAST(props ->> 'k' AS BIGINT) IS NOT NULL
    ),
    acc AS (
      SELECT user_id, item, rn,
             lag(rn) OVER (PARTITION BY user_id, item ORDER BY rn)
               AS prev_rn
      FROM pos
    ),
    sd AS (
      SELECT a.user_id, a.rn,
             (SELECT count(DISTINCT p.item) FROM pos p
              WHERE p.user_id = a.user_id
                AND p.rn > a.prev_rn AND p.rn < a.rn) + 1 AS depth
      FROM acc a WHERE a.prev_rn IS NOT NULL
    ),
    tot AS (
      SELECT (SELECT count(*) FROM pos) AS n_accesses,
             (SELECT count(*) FROM acc WHERE prev_rn IS NULL)
               AS n_compulsory
    ),
    caps(c) AS (VALUES {", ".join(f"({c})" for c in _LRU_CAPS)})
    SELECT CAST(caps.c AS INT) AS capacity,
           CAST(count(sd.rn) FILTER (WHERE sd.depth <= caps.c) AS BIGINT)
             AS n_hits,
           tot.n_accesses, tot.n_compulsory
    FROM caps CROSS JOIN tot LEFT JOIN sd ON true
    GROUP BY 1, 3, 4 ORDER BY capacity
    """,
)
def mattson_lru_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mattson stack-distance algorithm: the ENTIRE LRU hit-rate
    curve from one pass — an access hits an LRU cache of capacity C
    iff its stack depth (1 + distinct items touched since its previous
    access) is <= C, so simulating every capacity separately is
    wasted work. Item stream: each user's props key mod 8 in event
    order. Spark runs the real stack simulation per user
    (applyInPandas: move-to-front list, depth histogram — the
    inclusion property makes one simulated stack serve all C); the
    oracle derives depths declaratively via lag + a correlated
    distinct count over the reuse window. Reported at capacities
    1/2/4/8 with compulsory-miss accounting. Exact integers."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "ts", "event_id",
        (F.get_json_object("props", "$.k").cast("long") % 8).alias("item"),
    ).filter(F.col("item").isNotNull())

    def _stack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        stack: list[int] = []
        depths = []
        compulsory = 0
        for it in pdf["item"]:
            it = int(it)
            if it in stack:
                d = stack.index(it) + 1
                depths.append(d)
                stack.remove(it)
            else:
                compulsory += 1
            stack.insert(0, it)
        rows = []
        for c in _LRU_CAPS:
            rows.append(
                (c, sum(1 for d in depths if d <= c), len(pdf), compulsory)
            )
        return pd.DataFrame(
            rows,
            columns=["capacity", "n_hits", "n_accesses", "n_compulsory"],
        )

    per_user = base.groupBy("user_id").applyInPandas(
        lambda pdf: _stack(pdf),
        "capacity int, n_hits long, n_accesses long, n_compulsory long",
    )
    return (
        per_user.groupBy("capacity")
        .agg(
            F.sum("n_hits").cast("long").alias("n_hits"),
            F.sum("n_accesses").cast("long").alias("n_accesses"),
            F.sum("n_compulsory").cast("long").alias("n_compulsory"),
        )
        .orderBy("capacity")
    )


@register_extra(
    "t_closeness_audit",
    """
    WITH q AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 21600 AS day_q,
             user_id % 10 AS sensitive
      FROM events
    ),
    cls AS (
      SELECT event_type, day_q, sensitive, CAST(count(*) AS BIGINT) AS c
      FROM q GROUP BY 1, 2, 3
    ),
    gt AS (
      SELECT sensitive, CAST(count(*) AS BIGINT) AS g FROM q GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
    grps AS (
      SELECT event_type, day_q, CAST(count(*) AS BIGINT) AS sz
      FROM q GROUP BY 1, 2
    ),
    dom AS (SELECT range AS sensitive FROM range(10)),
    full_ AS (
      SELECT gr.event_type, gr.day_q, gr.sz, d.sensitive,
             coalesce(c.c, 0) AS c, gl.g, t.n
      FROM grps gr CROSS JOIN dom d
      JOIN gt gl USING (sensitive)
      CROSS JOIN tot t
      LEFT JOIN cls c ON c.event_type = gr.event_type
                     AND c.day_q = gr.day_q AND c.sensitive = d.sensitive
    )
    SELECT event_type, CAST(day_q AS BIGINT) AS day_q,
           CAST(max(sz) AS BIGINT) AS group_size,
           CAST(sum(abs(c * n - g * sz)) * 10000
                // (2 * max(sz) * max(n)) AS BIGINT) AS t_e4
    FROM full_ GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third leg of the release-privacy triad
    next to the gated k-anonymity and l-diversity rows: per
    quasi-identifier group (event_type x 6-hour quarter, the same QI as
    l_diversity_audit), the variational distance between the group's
    sensitive-value distribution and the global one, t = 1/2 *
    sum_s |c_s/sz - g_s/N|. A group can pass k and l yet sit far from
    the corpus distribution, which is the leak t-closeness bounds.
    Exact integers: the distance is cross-multiplied to
    sum |c*N - g*sz| over the full sensitive domain (missing values
    contribute their global mass), divided once, truncating, at e-4
    scale. Scale shape: two partial-agg scans build (group, sensitive)
    and global histograms; the domain completion is a broadcast of a
    10-row dim; nothing wide shuffles."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.expr("(unix_timestamp(ts) % 86400) div 21600").alias("day_q"),
        (F.col("user_id") % 10).alias("sensitive"),
    )
    cls = q.groupBy("event_type", "day_q", "sensitive").agg(
        F.count("*").cast("long").alias("c")
    )
    gt = q.groupBy("sensitive").agg(F.count("*").cast("long").alias("g"))
    tot = q.agg(F.count("*").cast("long").alias("n"))
    grps = q.groupBy("event_type", "day_q").agg(
        F.count("*").cast("long").alias("sz")
    )
    dom = spark.range(10).select(F.col("id").alias("sensitive"))
    full = (
        grps.crossJoin(F.broadcast(dom))
        .join(F.broadcast(gt), "sensitive")
        .crossJoin(F.broadcast(tot))
        .join(cls, ["event_type", "day_q", "sensitive"], "left")
        .select(
            "event_type",
            "day_q",
            "sz",
            F.coalesce("c", F.lit(0)).alias("c"),
            "g",
            "n",
        )
    )
    return (
        full.groupBy("event_type", "day_q")
        .agg(
            F.max("sz").cast("long").alias("group_size"),
            F.expr(
                "CAST(sum(abs(c * n - g * sz)) * 10000"
                " div (2 * max(sz) * max(n)) AS BIGINT)"
            ).alias("t_e4"),
        )
        .select(
            "event_type",
            F.col("day_q").cast("long").alias("day_q"),
            "group_size",
            "t_e4",
        )
        .orderBy("event_type", "day_q")
    )


# ---------------------------------------- k-anon generalization ladder


@register_extra(
    "kanon_generalization_ladder",
    """
    WITH rec AS (
      SELECT ('0x' || substr(md5('kga:' || CAST(event_id AS VARCHAR)),
                             1, 6))::BIGINT % 90 AS age,
             ('0x' || substr(md5('kgz:' || CAST(event_id AS VARCHAR)),
                             1, 8))::BIGINT % 100000 AS zip
      FROM events
    ),
    lv AS (SELECT l.range AS level FROM range(5) l),
    gen AS (
      SELECT level,
             CASE level WHEN 0 THEN age WHEN 1 THEN age // 5
                        WHEN 2 THEN age // 10 WHEN 3 THEN age // 20
                        ELSE -1 END AS gage,
             CASE level WHEN 0 THEN zip WHEN 1 THEN zip // 10
                        WHEN 2 THEN zip // 100 WHEN 3 THEN zip // 1000
                        ELSE -1 END AS gzip
      FROM rec CROSS JOIN lv
    ),
    grp AS (
      SELECT level, gage, gzip, count(*) AS n
      FROM gen GROUP BY 1, 2, 3
    ),
    stats AS (
      SELECT level, count(*) AS n_groups, min(n) AS min_group
      FROM grp GROUP BY level
    ),
    chosen AS (
      SELECT min(level) AS lsel FROM stats WHERE min_group >= 10
    )
    SELECT s.level, CAST(s.n_groups AS BIGINT) AS n_groups,
           CAST(s.min_group AS BIGINT) AS min_group_size,
           CAST(s.level = (SELECT lsel FROM chosen) AS BOOLEAN)
             AS is_chosen
    FROM stats s ORDER BY s.level
    """,
)
def kanon_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-generalization search for k-anonymity (k = 10) — the
    Samarati/Incognito ladder walk: evaluate a fixed hierarchy of
    quasi-identifier generalizations (exact age/zip -> coarser bands
    -> full suppression) and pick the LEAST general level whose
    smallest equivalence class already has k records (level 4 is full
    suppression, so a choice always exists). Complements the gated
    k-anonymity/l-diversity/t-closeness AUDITS, which check one fixed
    schema — this query chooses the schema. Spark evaluates every
    rung in ONE pass: records cross-joined with the 5-level ladder,
    generalized keys by CASE, a single groupBy for class sizes and a
    second tiny agg for per-level minima — one shuffle regardless of
    ladder height (the Incognito trick of sharing scans across
    lattice nodes). Exact integers; the chosen rung is a cross-level
    min both engines derive independently."""
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

    rec = ev.select(
        (_h("kga:", 6) % 90).alias("age"),
        (_h("kgz:", 8) % 100000).alias("zip"),
    )
    lv = spark.range(5).select(F.col("id").alias("level"))
    gen = rec.crossJoin(lv).select(
        "level",
        F.expr(
            "CASE level WHEN 0 THEN age WHEN 1 THEN age div 5"
            " WHEN 2 THEN age div 10 WHEN 3 THEN age div 20"
            " ELSE -1 END"
        ).alias("gage"),
        F.expr(
            "CASE level WHEN 0 THEN zip WHEN 1 THEN zip div 10"
            " WHEN 2 THEN zip div 100 WHEN 3 THEN zip div 1000"
            " ELSE -1 END"
        ).alias("gzip"),
    )
    grp = gen.groupBy("level", "gage", "gzip").agg(F.count("*").alias("n"))
    stats = grp.groupBy("level").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
    )
    chosen = stats.filter(F.col("min_group_size") >= 10).agg(
        F.min("level").alias("lsel")
    )
    return (
        stats.crossJoin(F.broadcast(chosen))
        .select(
            "level",
            "n_groups",
            "min_group_size",
            (F.col("level") == F.col("lsel")).alias("is_chosen"),
        )
        .orderBy("level")
    )


# ---------------------------------------- FD discovery / audit


@register_extra(
    "fd_violation_audit",
    """
    WITH rec AS (
      SELECT user_id AS uid,
             (('0x' || substr(md5('fdc:' || CAST(user_id AS VARCHAR)),
                              1, 6))::BIGINT
              + CASE WHEN ('0x' || substr(md5('fderr:'
                             || CAST(event_id AS VARCHAR)), 1, 4))::INT
                          % 50 = 0 THEN 1 ELSE 0 END) % 10 AS country,
             ('0x' || substr(md5('fdy:' || CAST(user_id AS VARCHAR)),
                             1, 6))::BIGINT % 100 AS city
      FROM events
    ),
    cands AS (
      SELECT 'uid->country' AS fd, uid AS lhs, country AS rhs FROM rec
      UNION ALL
      SELECT 'uid->city', uid, city FROM rec
      UNION ALL
      SELECT 'country->city', country, city FROM rec
    ),
    grp AS (
      SELECT fd, lhs, rhs, count(*) AS n FROM cands GROUP BY 1, 2, 3
    ),
    per_lhs AS (
      SELECT fd, lhs, count(*) AS n_rhs, max(n) AS maxn, sum(n) AS tot
      FROM grp GROUP BY 1, 2
    )
    SELECT fd, CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(count(*) FILTER (n_rhs > 1) AS BIGINT) AS n_violating_lhs,
           CAST(sum(tot - maxn) AS BIGINT) AS g3_rows
    FROM per_lhs GROUP BY fd ORDER BY fd
    """,
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency violation audit (Metanome/profiling
    style): for each candidate FD, how many LHS groups carry more
    than one RHS value and the g3 error — the minimum number of rows
    to delete for the FD to hold exactly (total minus each group's
    majority). Candidates over a synthetic denormalized event feed:
    uid->city holds by construction, uid->country is broken by a 2%
    corruption channel (the dirty-replication bug this audit exists to
    catch), country->city fails structurally. Exact integers. Spark:
    one groupBy per (fd, lhs, rhs) then a per-lhs partial agg — two
    map-side-combining shuffles for ALL candidates at once (the
    shared-scan lattice trick); 100 TB shape is unchanged since state
    is one row per observed (lhs, rhs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid = F.col("user_id").cast("string")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, col, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    rec = ev.select(
        F.col("user_id").alias("uid"),
        (
            (
                _h("fdc:", uid, 6)
                + F.when(_h("fderr:", eid, 4).cast("int") % 50 == 0, 1)
                .otherwise(0)
            )
            % 10
        ).alias("country"),
        (_h("fdy:", uid, 6) % 100).alias("city"),
    )
    cands = (
        rec.select(
            F.lit("uid->country").alias("fd"),
            F.col("uid").alias("lhs"),
            F.col("country").alias("rhs"),
        )
        .unionByName(
            rec.select(
                F.lit("uid->city").alias("fd"),
                F.col("uid").alias("lhs"),
                F.col("city").alias("rhs"),
            )
        )
        .unionByName(
            rec.select(
                F.lit("country->city").alias("fd"),
                F.col("country").alias("lhs"),
                F.col("city").alias("rhs"),
            )
        )
    )
    grp = cands.groupBy("fd", "lhs", "rhs").agg(F.count("*").alias("n"))
    per_lhs = grp.groupBy("fd", "lhs").agg(
        F.count("*").alias("n_rhs"),
        F.max("n").alias("maxn"),
        F.sum("n").alias("tot"),
    )
    return (
        per_lhs.groupBy("fd")
        .agg(
            F.count("*").cast("long").alias("n_lhs"),
            F.count(F.when(F.col("n_rhs") > 1, 1))
            .cast("long")
            .alias("n_violating_lhs"),
            F.sum(F.col("tot") - F.col("maxn")).cast("long").alias("g3_rows"),
        )
        .orderBy("fd")
    )


# ---------------------------------------- inclusion dependencies


@register_extra(
    "ind_coverage_audit",
    """
    WITH cands AS (
      SELECT 'lineitem.l_orderkey<orders.o_orderkey' AS ind,
             (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_lhs,
             (SELECT count(*) FROM
                (SELECT DISTINCT l_orderkey AS k FROM lineitem) l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.k)) AS n_missing
      UNION ALL
      SELECT 'orders.o_custkey<customer.c_custkey',
             (SELECT count(DISTINCT o_custkey) FROM orders),
             (SELECT count(*) FROM
                (SELECT DISTINCT o_custkey AS k FROM orders) l
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = l.k))
      UNION ALL
      SELECT 'customer.c_custkey<orders.o_custkey',
             (SELECT count(DISTINCT c_custkey) FROM customer),
             (SELECT count(*) FROM
                (SELECT DISTINCT c_custkey AS k FROM customer) l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = l.k))
      UNION ALL
      SELECT 'customer.c_nationkey<nation.n_nationkey',
             (SELECT count(DISTINCT c_nationkey) FROM customer),
             (SELECT count(*) FROM
                (SELECT DISTINCT c_nationkey AS k FROM customer) l
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = l.k))
      UNION ALL
      SELECT 'nation.n_nationkey<customer.c_nationkey',
             (SELECT count(DISTINCT n_nationkey) FROM nation),
             (SELECT count(*) FROM
                (SELECT DISTINCT n_nationkey AS k FROM nation) l
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_nationkey = l.k))
    )
    SELECT ind, CAST(n_lhs AS BIGINT) AS n_lhs,
           CAST(n_missing AS BIGINT) AS n_missing,
           CAST(((n_lhs - n_missing) * 1000000) // n_lhs AS BIGINT)
             AS coverage_e6,
           n_missing = 0 AS holds
    FROM cands ORDER BY ind
    """,
)
def ind_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery audit — the other half of schema
    profiling next to the FD g3 audit: for each candidate column pair
    A < B, does every distinct A value appear in B (a foreign-key
    candidate), and if not, what coverage does it reach? Candidates
    span the TPC-H-ish join graph in BOTH directions, so the holds
    column separates true FKs from their (partial) reverses —
    exactly how profiling tools propose join paths on unknown data.
    Spark: each candidate is one distinct-projection + left-anti join
    (the scalable no-EXISTS formulation; the anti join broadcasts the
    smaller side); the oracle uses correlated NOT EXISTS — two
    different join strategies for the same set semantics. coverage =
    exact e6 truncating ratio."""
    tabs = {
        n: spark.read.parquet(f"{sf_dir}/{n}.parquet")
        for n in ["lineitem", "orders", "customer", "nation"]
    }
    cands = [
        ("lineitem.l_orderkey<orders.o_orderkey",
         tabs["lineitem"].select(F.col("l_orderkey").alias("k")),
         tabs["orders"].select(F.col("o_orderkey").alias("k"))),
        ("orders.o_custkey<customer.c_custkey",
         tabs["orders"].select(F.col("o_custkey").alias("k")),
         tabs["customer"].select(F.col("c_custkey").alias("k"))),
        ("customer.c_custkey<orders.o_custkey",
         tabs["customer"].select(F.col("c_custkey").alias("k")),
         tabs["orders"].select(F.col("o_custkey").alias("k"))),
        ("customer.c_nationkey<nation.n_nationkey",
         tabs["customer"].select(F.col("c_nationkey").alias("k")),
         tabs["nation"].select(F.col("n_nationkey").alias("k"))),
        ("nation.n_nationkey<customer.c_nationkey",
         tabs["nation"].select(F.col("n_nationkey").alias("k")),
         tabs["customer"].select(F.col("c_nationkey").alias("k"))),
    ]
    out = None
    for name, lhs, rhs in cands:
        dl = lhs.distinct()
        stats = dl.join(rhs.distinct(), "k", "left_anti").agg(
            F.count("*").alias("n_missing")
        ).crossJoin(dl.agg(F.count("*").alias("n_lhs")))
        row = stats.select(
            F.lit(name).alias("ind"),
            F.col("n_lhs").cast("long").alias("n_lhs"),
            F.col("n_missing").cast("long").alias("n_missing"),
            F.expr("((n_lhs - n_missing) * 1000000) div n_lhs")
            .cast("long")
            .alias("coverage_e6"),
            (F.col("n_missing") == 0).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("ind")


# ---------------------------------------- inventory policy


@register_extra(
    "inventory_policy_optim",
    """
    WITH d AS (
      SELECT l_partkey % 8 AS prod, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ),
    costs AS (
      SELECT p.range AS prod,
             1 + ('0x' || substr(md5('cu:' || p.range), 1, 4))::INT % 9
               AS cu,
             1 + ('0x' || substr(md5('co:' || p.range), 1, 4))::INT % 9
               AS co,
             50 + ('0x' || substr(md5('eS:' || p.range), 1, 4))::INT % 100
               AS s_cost,
             1 + ('0x' || substr(md5('eH:' || p.range), 1, 4))::INT % 9
               AS h
      FROM range(8) p
    ),
    n AS (SELECT prod, count(*) AS n, sum(q) AS dtot FROM d GROUP BY prod),
    cand AS (SELECT DISTINCT prod, q AS s FROM d),
    cdf AS (
      SELECT c.prod, c.s, count(*) AS le
      FROM cand c JOIN d ON d.prod = c.prod AND d.q <= c.s
      GROUP BY 1, 2
    ),
    nv AS (
      SELECT cdf.prod, min(cdf.s) AS stock
      FROM cdf JOIN n USING (prod) JOIN costs USING (prod)
      WHERE cdf.le * (costs.cu + costs.co) >= n.n * costs.cu
      GROUP BY cdf.prod
    ),
    ev AS (
      SELECT n.prod, q.range + 1 AS q,
             (1000 * n.dtot * c.s_cost) // (q.range + 1)
               + 500 * c.h * (q.range + 1) AS cst
      FROM n JOIN costs c USING (prod), range(5000) q
    ),
    eoq AS (
      SELECT prod, min(cst * 10000 + q) % 10000 AS eoq_q
      FROM ev GROUP BY prod
    )
    SELECT n.prod, CAST(n.n AS BIGINT) AS n_obs,
           CAST(n.dtot AS BIGINT) AS total_demand,
           CAST(c.cu AS BIGINT) AS underage_c,
           CAST(c.co AS BIGINT) AS overage_c,
           CAST(nv.stock AS BIGINT) AS newsvendor_stock,
           CAST(eoq.eoq_q AS BIGINT) AS eoq_qty
    FROM n JOIN costs c USING (prod) JOIN nv USING (prod)
           JOIN eoq USING (prod)
    ORDER BY n.prod
    """,
)
def inventory_policy_optim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two classical inventory policies solved EXACTLY from the demand
    history, per product family: (1) the newsvendor stock — the
    smallest level whose empirical demand CDF reaches the critical
    ratio cu/(cu+co), decided by the cross-multiplied integer
    inequality count(d<=s)*(cu+co) >= n*cu (no percentile float ever);
    (2) the economic order quantity — argmin over 1..5000 of the
    e3-quantized holding-plus-setup cost, packed as cost*10000+q so
    the tie takes the smaller lot. The demand aggregation (counts,
    totals, distinct levels, CDF ranks) is the distributed part —
    one pass over lineitem with map-side combines; the 5000-point
    cost grid is a broadcast range. The oracle repeats both
    optimizations relationally; newsvendor's argmin-over-candidates
    and EOQ's quantized evaluation must land on identical integers."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(
        F.pmod(F.col("l_partkey"), F.lit(8)).alias("prod"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    prods = spark.range(8).select(F.col("id").alias("prod"))

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("prod").cast("string"))
                    .cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")

    costs = prods.select(
        "prod",
        (1 + _h("cu:") % 9).alias("cu"),
        (1 + _h("co:") % 9).alias("co"),
        (50 + _h("eS:") % 100).alias("s_cost"),
        (1 + _h("eH:") % 9).alias("h"),
    )
    n = d.groupBy("prod").agg(
        F.count("*").alias("n"), F.sum("q").alias("dtot")
    )
    cand = d.distinct().withColumnRenamed("q", "s")
    cdf = (
        cand.alias("c")
        .join(
            d.alias("dd"),
            (F.col("c.prod") == F.col("dd.prod"))
            & (F.col("dd.q") <= F.col("c.s")),
        )
        .groupBy(F.col("c.prod").alias("prod"), F.col("c.s").alias("s"))
        .agg(F.count("*").alias("le"))
    )
    nv = (
        cdf.join(n, "prod")
        .join(F.broadcast(costs), "prod")
        .filter(
            F.col("le") * (F.col("cu") + F.col("co"))
            >= F.col("n") * F.col("cu")
        )
        .groupBy("prod")
        .agg(F.min("s").alias("newsvendor_stock"))
    )
    qs = spark.range(5000).select((F.col("id") + 1).alias("qq"))
    ev = (
        n.join(F.broadcast(costs), "prod")
        .crossJoin(F.broadcast(qs))
        .select(
            "prod",
            (
                F.expr("(1000 * dtot * s_cost) div qq")
                + 500 * F.col("h") * F.col("qq")
            ).alias("cst"),
            "qq",
        )
    )
    eoq = ev.groupBy("prod").agg(
        (F.min(F.col("cst") * 10000 + F.col("qq")) % 10000).alias("eoq_qty")
    )
    return (
        n.join(F.broadcast(costs), "prod")
        .join(nv, "prod")
        .join(eoq, "prod")
        .select(
            "prod",
            F.col("n").cast("long").alias("n_obs"),
            F.col("dtot").cast("long").alias("total_demand"),
            F.col("cu").cast("long").alias("underage_c"),
            F.col("co").cast("long").alias("overage_c"),
            F.col("newsvendor_stock").cast("long"),
            F.col("eoq_qty").cast("long"),
        )
        .orderBy("prod")
    )


# --------------------------------------- System-R join-order cost audit


@register_extra(
    "join_order_cost_audit",
    """
    WITH s AS (
      SELECT (SELECT count(*) FROM customer) AS tc,
             (SELECT count(*) FROM orders) AS tor,
             (SELECT count(*) FROM lineitem) AS tl,
             (SELECT count(DISTINCT c_custkey) FROM customer) AS vcc,
             (SELECT count(DISTINCT o_custkey) FROM orders) AS voc,
             (SELECT count(DISTINCT o_orderkey) FROM orders) AS voo,
             (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS vlo
    ),
    est AS (
      SELECT 'customer_orders_first' AS join_order,
             tc * tor // greatest(vcc, voc) AS est_intermediate,
             (tc * tor // greatest(vcc, voc)) * tl
               // greatest(voo, vlo) AS est_final
      FROM s
      UNION ALL
      SELECT 'orders_lineitem_first',
             tor * tl // greatest(voo, vlo),
             (tor * tl // greatest(voo, vlo)) * tc
               // greatest(vcc, voc)
      FROM s
      UNION ALL
      SELECT 'cross_product_first',
             tc * tl,
             (tc * tl) * tor
               // (greatest(vcc, voc) * greatest(voo, vlo))
      FROM s
    ),
    costed AS (
      SELECT join_order, est_intermediate, est_final,
             est_intermediate + est_final AS est_cost
      FROM est
    )
    SELECT join_order, est_intermediate, est_final, est_cost,
           est_cost = (SELECT min(est_cost) FROM costed) AS chosen
    FROM costed ORDER BY join_order
    """,
)
def join_order_cost_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System-R style left-deep join-order costing — the catalog-stats
    arithmetic every cost-based optimizer (and Catalyst's CBO with
    ANALYZE stats) runs before picking a join tree. Estimates each
    left-deep order of customer x orders x lineitem with the classic
    |A JOIN B| = T(A)*T(B) / max(V(A,k), V(B,k)) containment formula
    (integer division — exact on both engines), including the
    cross-product-first order the optimizer must reject; cost = sum of
    intermediate result sizes. Spark gathers T/V stats with ONE
    distributed agg per table (count + exact countDistinct, the same
    partial-agg shuffle ANALYZE TABLE issues) and the 3-row enumeration
    is pure column arithmetic on the collected scalar stats; the oracle
    recomputes the identical formulas from scalar subqueries. At 100 TB
    the stats pass is the only data-proportional work — enumeration
    cost is independent of table size."""
    c = _t(spark, sf_dir, "customer").agg(
        F.count(F.lit(1)).alias("tc"),
        F.countDistinct("c_custkey").alias("vcc"),
    )
    o = _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("tor"),
        F.countDistinct("o_custkey").alias("voc"),
        F.countDistinct("o_orderkey").alias("voo"),
    )
    li = _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("tl"),
        F.countDistinct("l_orderkey").alias("vlo"),
    )
    s = c.crossJoin(o).crossJoin(li)
    co = F.expr("tc * tor div greatest(vcc, voc)")
    ol = F.expr("tor * tl div greatest(voo, vlo)")
    est = (
        s.select(
            F.lit("customer_orders_first").alias("join_order"),
            co.alias("est_intermediate"),
            (co * F.col("tl")).cast("long").alias("_n2"),
            F.expr("greatest(voo, vlo)").alias("_d2"),
        )
        .unionAll(
            s.select(
                F.lit("orders_lineitem_first"),
                ol,
                (ol * F.col("tc")).cast("long"),
                F.expr("greatest(vcc, voc)"),
            )
        )
        .unionAll(
            s.select(
                F.lit("cross_product_first"),
                (F.col("tc") * F.col("tl")).cast("long"),
                (F.col("tc") * F.col("tl") * F.col("tor")).cast("long"),
                F.expr("greatest(vcc, voc) * greatest(voo, vlo)"),
            )
        )
        .select(
            "join_order",
            "est_intermediate",
            F.expr("_n2 div _d2").alias("est_final"),
        )
        .withColumn(
            "est_cost", F.col("est_intermediate") + F.col("est_final")
        )
    )
    w = Window.partitionBy()
    return (
        est.withColumn(
            "chosen", F.col("est_cost") == F.min("est_cost").over(w)
        )
        .orderBy("join_order")
    )


# ------------------------------------------------- write-skew audit


@register_extra(
    "write_skew_pairs",
    """
    WITH tx AS (
      SELECT event_id AS tid,
             ('0x' || substr(md5('t0:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 1000 AS t0,
             ('0x' || substr(md5('rk:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 30 AS rkey,
             ('0x' || substr(md5('wk:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 30 AS wkey
      FROM events
      WHERE ('0x' || substr(md5('tg:' || CAST(event_id AS VARCHAR)),
                            1, 4))::BIGINT % 29 = 0
    ),
    t AS (
      SELECT tid, t0,
             t0 + ('0x' || substr(md5('td:' || CAST(tid AS VARCHAR)),
                                  1, 4))::BIGINT % 50 + 1 AS t1,
             rkey, wkey
      FROM tx
    )
    SELECT a.tid AS tid1, b.tid AS tid2,
           a.rkey AS key1, b.rkey AS key2
    FROM t a JOIN t b
      ON a.tid < b.tid
     AND a.rkey = b.wkey AND b.rkey = a.wkey
     AND a.wkey <> b.wkey
     AND a.t0 < b.t1 AND b.t0 < a.t1
    ORDER BY tid1, tid2
    """,
)
def write_skew_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-skew anomaly detection under snapshot isolation — the
    dangerous-structure audit serializable-SI databases (PostgreSQL
    SSI, the Cahill algorithm) run online, here as the batch forensic
    query: two CONCURRENT transactions where each READ what the other
    WROTE and their write sets are disjoint — the classic on-call
    doctors anomaly SI permits and serializability forbids. Pure
    relational algebra: one self-equi-join on the rw-antidependency
    keys plus the interval-overlap predicate (the same range-join
    family as interval_max_concurrency). md5-derived transaction
    read/write keys and intervals; at scale the join keys (rkey =
    wkey) partition the pair space so the quadratic never
    materializes."""
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

    tx = ev.filter(_h("tg:", eid, 4) % 29 == 0).select(
        F.col("event_id").alias("tid"),
        (_h("t0:", eid, 4) % 1000).alias("t0"),
        (_h("rk:", eid, 4) % 30).alias("rkey"),
        (_h("wk:", eid, 4) % 30).alias("wkey"),
    )
    t = tx.withColumn(
        "t1",
        F.col("t0")
        + _h("td:", F.col("tid").cast("string"), 4) % 50
        + 1,
    )
    a = t.select(
        F.col("tid").alias("tid1"), F.col("t0").alias("a0"),
        F.col("t1").alias("a1"), F.col("rkey").alias("key1"),
        F.col("wkey").alias("w1"),
    )
    b = t.select(
        F.col("tid").alias("tid2"), F.col("t0").alias("b0"),
        F.col("t1").alias("b1"), F.col("rkey").alias("key2"),
        F.col("wkey").alias("w2"),
    )
    return (
        a.join(
            b,
            (F.col("tid1") < F.col("tid2"))
            & (F.col("key1") == F.col("w2"))
            & (F.col("key2") == F.col("w1"))
            & (F.col("w1") != F.col("w2"))
            & (F.col("a0") < F.col("b1"))
            & (F.col("b0") < F.col("a1")),
        )
        .select("tid1", "tid2", "key1", "key2")
        .orderBy("tid1", "tid2")
    )


# --------------------------------------------- randomized response audit

# LOCAL differential privacy's original mechanism (Warner 1965, the
# RAPPOR primitive): each user reports their sensitive bit XOR a coin
# flip with P(flip) = 1/4, and the aggregator de-biases the observed
# rate: E[yes] = 3/4 p + 1/4 (1-p)  =>  p = (4*yes/n - 1)/2. The
# engine keeps the estimator as an exact integer numerator /
# denominator pair (no division, so no float and no rounding rule to
# disagree on) and audits it against the exact truth the synthetic
# world knows. Flips are md5-derived, identical in both engines.
_RR_ORACLE = """
WITH u AS (SELECT DISTINCT user_id AS uid FROM events),
r AS (
  SELECT uid, uid % 10 AS grp,
         uid % 3 = 0 AS truth,
         ('0x' || substr(md5('rr:' || CAST(uid AS VARCHAR)), 1, 8))::BIGINT
           % 4 = 0 AS flip
  FROM u
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (truth <> flip) AS BIGINT) AS n_reported_yes,
       CAST(count(*) FILTER (truth) AS BIGINT) AS n_true_yes,
       CAST(4 * count(*) FILTER (truth <> flip) - count(*) AS BIGINT)
         AS est_num,
       CAST(2 * count(*) AS BIGINT) AS est_den
FROM r GROUP BY grp ORDER BY grp
"""


@register_extra("randomized_response_audit", _RR_ORACLE)
def randomized_response_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response (local DP) with exact de-biasing —
    per cohort, the reported-yes count, the integer estimator
    (num/den kept unreduced to avoid any division), and the ground
    truth for the audit. reported = truth XOR flip, flip an md5 coin
    with p = 1/4. Plan: one distinct on users, one partial-agg
    groupBy on the 10 cohorts — JVM expressions only."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    u = ev.select(F.col("user_id").alias("uid")).distinct()
    r = u.select(
        (F.col("uid") % 10).alias("grp"),
        (F.col("uid") % 3 == 0).alias("truth"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("rr:"), F.col("uid").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 4
            == 0
        ).alias("flip"),
    )
    return (
        r.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("truth") != F.col("flip"), 1)).alias(
                "n_reported_yes"
            ),
            F.count(F.when(F.col("truth"), 1)).alias("n_true_yes"),
        )
        .select(
            F.col("grp").cast("long").alias("grp"),
            F.col("n").cast("long").alias("n"),
            F.col("n_reported_yes").cast("long").alias("n_reported_yes"),
            F.col("n_true_yes").cast("long").alias("n_true_yes"),
            (4 * F.col("n_reported_yes") - F.col("n"))
            .cast("long")
            .alias("est_num"),
            (2 * F.col("n")).cast("long").alias("est_den"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------- CIDR longest-prefix

# Longest-prefix-match routing / GeoIP-style enrichment: each md5-
# derived 32-bit address takes the MOST SPECIFIC matching prefix from
# a 26-entry table (13 covering CIDRs of length 6-12, 12 CIDRs NESTED
# +6 bits inside them, and the 0/0 default route, so every address
# routes and nested ranges force real specificity decisions). The LPM argmax is
# max(struct(len, -key)) — longest prefix, then lowest route key on
# ties — a broadcast-dim join + partial-agg, the exact shape of an
# IP-enrichment join over 10^12 flow records.
_LPM_ORACLE = """
WITH p0 AS (
  SELECT n_nationkey AS rk,
         3221225472 + (n_nationkey // 2 * 2654435761) % 1073741824 AS base,
         6 + (n_nationkey // 2) % 7 AS blen,
         n_nationkey % 2 = 1 AS deeper
  FROM nation
),
-- odd keys NEST inside the preceding even key's prefix (+6 bits), so
-- addresses in those ranges match BOTH and LPM must pick the longer
pfx AS (
  SELECT rk,
         CASE WHEN deeper THEN base ELSE
           base >> (32 - blen) << (32 - blen) END AS net,
         CASE WHEN deeper THEN blen + 6 ELSE blen END AS len
  FROM p0
  UNION ALL SELECT 99, 0, 0
),
ips AS (
  SELECT event_id,
         3221225472 + ('0x' || substr(md5('ip:' || CAST(event_id AS VARCHAR)),
                         1, 8))::BIGINT % 1073741824 AS ip
  FROM events WHERE event_id % 3 = 0
),
m AS (
  SELECT i.event_id, i.ip, p.rk, p.len
  FROM ips i JOIN pfx p
    ON i.ip >> (32 - p.len) = p.net >> (32 - p.len)
),
best AS (
  SELECT event_id, ip, rk, len FROM (
    SELECT *, row_number() OVER (PARTITION BY event_id
                                 ORDER BY len DESC, rk) AS rn
    FROM m) WHERE rn = 1
)
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(ip AS BIGINT) AS ip,
       CAST(rk AS INT) AS route_key, CAST(len AS INT) AS prefix_len
FROM best ORDER BY event_id
"""


@register_extra("cidr_lpm_routing", _LPM_ORACLE)
def cidr_lpm_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match enrichment (see oracle comment): the
    26-row prefix dim broadcasts, the match predicate is a pair of
    variable bit shifts in codegen, and the per-address argmax is one
    max(struct) partial aggregation — zero extra shuffles beyond the
    output sort. DuckDB takes the ranked-window route instead."""
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    base = (
        F.lit(3221225472).cast("long")
        + (F.expr("n_nationkey div 2") * 2654435761) % 1073741824
    )
    blen = (6 + F.expr("n_nationkey div 2") % 7).cast("long")
    deeper = F.col("n_nationkey") % 2 == 1
    pfx = nat.select(
        F.col("n_nationkey").cast("long").alias("rk"),
        F.when(deeper, base)
        .otherwise(
            F.expr(
                "shiftleft(shiftright("
                "3221225472 + (n_nationkey div 2 * 2654435761) % 1073741824,"
                " cast(32 - (6 + n_nationkey div 2 % 7) as int)),"
                " cast(32 - (6 + n_nationkey div 2 % 7) as int))"
            ).cast("long")
        )
        .alias("net"),
        F.when(deeper, blen + 6).otherwise(blen).alias("len"),
    ).unionByName(
        spark.range(1).select(
            F.lit(99).cast("long").alias("rk"),
            F.lit(0).cast("long").alias("net"),
            F.lit(0).cast("long").alias("len"),
        )
    )
    ips = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 3 == 0)
        .select(
            "event_id",
            (
                F.lit(3221225472).cast("long")
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ip:"), F.col("event_id").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 1073741824
            ).alias("ip"),
        )
    )
    m = ips.crossJoin(F.broadcast(pfx)).filter(
        F.expr("shiftright(ip, cast(32 - len as int))")
        == F.expr("shiftright(net, cast(32 - len as int))")
    )
    best = m.groupBy("event_id", "ip").agg(
        F.max(F.struct(F.col("len"), (-F.col("rk")).alias("nk"), F.col("rk"))).alias(
            "b"
        )
    )
    return best.select(
        F.col("event_id").cast("long"),
        F.col("ip").cast("long"),
        F.col("b.rk").cast("int").alias("route_key"),
        F.col("b.len").cast("int").alias("prefix_len"),
    ).orderBy("event_id")


# ---------------------------------------------- Slope One predictor

# Slope One collaborative filtering (Lemire & Maclachlan 2005) — the
# classic "deviations" recommender: dev(i, j) = mean over co-raters of
# (r_i - r_j); the prediction for user u on unrated item i is the
# support-weighted mean of (dev(i, j) + r_uj) over u's rated items j.
# Everything stays EXACT: deviations ride as (numerator, denominator)
# pairs and the final prediction is an e4 floor of the exact rational
# sum( dev_num_ij + r_uj * den_ij ) / sum( den_ij ). Ratings derive
# from a 1/12 deterministic subsample of events (so the user x item
# matrix stays SPARSE at every sf — without it the grid saturates and
# the unrated-target set collapses); item = md5 % 24, rating =
# md5 % 5 + 1, max-aggregated per (user, item) so the relation is
# deterministic. The e4 floor is written as (a - mod(a, d)) / d with a
# nonnegative mod in BOTH engines, so trunc-vs-floor division
# differences can never surface even on negative numerators.
_SLOPE1_ORACLE = """
WITH r AS (
  SELECT user_id % 60 AS u,
         ('0x' || substr(md5('it:' || CAST(event_id AS VARCHAR)),
                         1, 5))::BIGINT % 24 AS item,
         max(1 + ('0x' || substr(md5('rt:' || CAST(event_id AS VARCHAR)),
                                 1, 5))::BIGINT % 5) AS rating
  FROM events
  WHERE ('0x' || substr(md5('kp:' || CAST(event_id AS VARCHAR)),
                        1, 5))::BIGINT % 12 = 0
  GROUP BY 1, 2
),
dev AS (
  SELECT a.item AS i, b.item AS j,
         sum(a.rating - b.rating) AS num, count(*) AS den
  FROM r a JOIN r b ON b.u = a.u AND b.item <> a.item
  GROUP BY 1, 2
),
target AS (
  SELECT uu.u, it.item AS i
  FROM (SELECT DISTINCT u FROM r) uu
  CROSS JOIN (SELECT DISTINCT item FROM r) it
  LEFT JOIN r rr ON rr.u = uu.u AND rr.item = it.item
  WHERE rr.u IS NULL
),
pred AS (
  SELECT t.u, t.i,
         sum(d.num + rj.rating * d.den) AS pnum,
         sum(d.den) AS pden
  FROM target t
  JOIN r rj ON rj.u = t.u
  JOIN dev d ON d.i = t.i AND d.j = rj.item
  GROUP BY 1, 2
)
SELECT CAST(u AS BIGINT) AS user_id, CAST(i AS INT) AS item,
       CAST(pnum AS BIGINT) AS pred_num, CAST(pden AS BIGINT) AS pred_den,
       CAST((10000 * pnum
             - ((10000 * pnum % pden) + pden) % pden) // pden AS BIGINT)
         AS pred_e4
FROM pred WHERE pden > 0
ORDER BY user_id, item
"""


@register_extra("slope_one_predictions", _SLOPE1_ORACLE)
def slope_one_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slope One rating predictions for every (user, unrated item)
    pair (see oracle comment). Plan: the deviation matrix is one
    co-rater self-join + partial agg on ITEM-PAIR keys (item-pair
    space is bounded — 24x24 here, catalog^2 at worst, never
    user-sized); predictions are one join of the user's ratings
    against the broadcastable deviation matrix + a partial-agg
    rational sum. The e4 floor is the only division, applied to exact
    integers in both engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, 5
            ),
            16,
            10,
        ).cast("long")

    r = (
        ev.filter(_h("kp:") % 12 == 0)
        .select(
            (F.col("user_id") % 60).alias("u"),
            (_h("it:") % 24).alias("item"),
            (1 + _h("rt:") % 5).alias("rating"),
        )
        .groupBy("u", "item")
        .agg(F.max("rating").alias("rating"))
        .localCheckpoint(eager=True)
    )
    b = r.select(
        F.col("u").alias("u2"), F.col("item").alias("j"), F.col("rating").alias("rj")
    )
    dev = (
        r.join(b, (F.col("u2") == F.col("u")) & (F.col("j") != F.col("item")))
        .groupBy(F.col("item").alias("i"), "j")
        .agg(
            F.sum(F.col("rating") - F.col("rj")).alias("num"),
            F.count(F.lit(1)).alias("den"),
        )
    )
    users = r.select("u").distinct()
    items = r.select(F.col("item").alias("i")).distinct()
    target = users.crossJoin(items).join(
        r.select("u", F.col("item").alias("i")), ["u", "i"], "left_anti"
    )
    pred = (
        target.join(r.select(F.col("u"), F.col("item").alias("j"), "rating"), "u")
        .join(F.broadcast(dev), ["i", "j"])
        .groupBy("u", "i")
        .agg(
            F.sum(F.col("num") + F.col("rating") * F.col("den")).alias("pnum"),
            F.sum("den").alias("pden"),
        )
        .filter(F.col("pden") > 0)
    )
    return pred.select(
        F.col("u").cast("long").alias("user_id"),
        F.col("i").cast("int").alias("item"),
        F.col("pnum").cast("long").alias("pred_num"),
        F.col("pden").cast("long").alias("pred_den"),
        F.expr("(10000 * pnum - pmod(10000 * pnum, pden)) div pden")
        .cast("long")
        .alias("pred_e4"),
    ).orderBy("user_id", "item")


# ------------------------------------- Johnson two-machine flow shop

# Johnson's rule (Johnson 1954) — the classic optimal schedule for the
# two-machine flow shop: jobs with a < b run first in ascending a, the
# rest last in descending b. The makespan of ANY fixed sequence has the
# closed form max_i( sum_{j<=i} a_j + sum_{j>=i} b_j ), which is pure
# prefix/suffix window arithmetic — no simulation needed, so both the
# optimal and the FIFO baseline makespans stay fully relational. Job
# times derive from md5 (1..99); Johnson's optimality shows up in the
# gated rows as gap_fifo >= 0 with strict improvements in every group.
_JOHNSON_ORACLE = """
WITH j AS (
  SELECT o_custkey % 40 AS grp, o_orderkey AS okey,
         1 + ('0x' || substr(md5('ja:' || CAST(o_orderkey AS VARCHAR)),
                             1, 5))::BIGINT % 99 AS a,
         1 + ('0x' || substr(md5('jb:' || CAST(o_orderkey AS VARCHAR)),
                             1, 5))::BIGINT % 99 AS b
  FROM orders
),
seq AS (
  SELECT *, CASE WHEN a < b THEN 0 ELSE 1 END AS cls,
         CASE WHEN a < b THEN a ELSE 200 - b END AS k1
  FROM j
),
jo AS (
  SELECT grp, b,
         sum(a) OVER w AS pa, sum(b) OVER w AS pb,
         sum(b) OVER (PARTITION BY grp) AS totb
  FROM seq
  WINDOW w AS (PARTITION BY grp ORDER BY cls, k1, okey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
fo AS (
  SELECT grp, b,
         sum(a) OVER w AS pa, sum(b) OVER w AS pb,
         sum(b) OVER (PARTITION BY grp) AS totb
  FROM seq
  WINDOW w AS (PARTITION BY grp ORDER BY okey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ms AS (
  SELECT grp, count(*) AS n_jobs, max(pa + totb - pb + b) AS ms_johnson
  FROM jo GROUP BY 1
),
msf AS (
  SELECT grp, max(pa + totb - pb + b) AS ms_fifo FROM fo GROUP BY 1
),
lb AS (
  SELECT grp, greatest(sum(a) + min(b), sum(b) + min(a)) AS lower_bound
  FROM j GROUP BY 1
)
SELECT CAST(ms.grp AS BIGINT) AS grp, CAST(n_jobs AS BIGINT) AS n_jobs,
       CAST(ms_johnson AS BIGINT) AS ms_johnson,
       CAST(ms_fifo AS BIGINT) AS ms_fifo,
       CAST(lower_bound AS BIGINT) AS lower_bound,
       CAST(ms_fifo - ms_johnson AS BIGINT) AS gap_fifo
FROM ms JOIN msf ON msf.grp = ms.grp JOIN lb ON lb.grp = ms.grp
ORDER BY grp
"""


@register_extra("johnson_two_machine", _JOHNSON_ORACLE)
def johnson_two_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-machine flow-shop makespans under Johnson's optimal rule vs
    FIFO, plus the standard lower bound (see oracle comment). Plan: one
    scan of orders, two window passes over the SAME grp partitioning
    (one Exchange — both sorts reuse the hash partition), then a
    partial-agg max per group. Scale: group count is the only output
    cardinality; per-group job lists stream through the window
    operator, nothing is collected."""
    o = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("string")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), okey).cast("binary")), 1, 5
            ),
            16,
            10,
        ).cast("long")

    j = o.select(
        (F.col("o_custkey") % 40).alias("grp"),
        F.col("o_orderkey").alias("okey"),
        (1 + _h("ja:") % 99).alias("a"),
        (1 + _h("jb:") % 99).alias("b"),
    ).withColumn(
        "cls", F.when(F.col("a") < F.col("b"), 0).otherwise(1)
    ).withColumn(
        "k1",
        F.when(F.col("a") < F.col("b"), F.col("a")).otherwise(200 - F.col("b")),
    )

    def _makespan(order_cols, out_name):
        w = (
            Window.partitionBy("grp")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wg = Window.partitionBy("grp")
        return (
            j.select(
                "grp",
                "b",
                F.sum("a").over(w).alias("pa"),
                F.sum("b").over(w).alias("pb"),
                F.sum("b").over(wg).alias("totb"),
            )
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_jobs"),
                F.max(
                    F.col("pa") + F.col("totb") - F.col("pb") + F.col("b")
                ).alias(out_name),
            )
        )

    ms = _makespan(["cls", "k1", "okey"], "ms_johnson")
    msf = _makespan(["okey"], "ms_fifo").drop("n_jobs")
    lb = j.groupBy("grp").agg(
        F.greatest(
            F.sum("a") + F.min("b"), F.sum("b") + F.min("a")
        ).alias("lower_bound")
    )
    return (
        ms.join(msf, "grp")
        .join(lb, "grp")
        .select(
            F.col("grp").cast("long"),
            F.col("n_jobs").cast("long"),
            F.col("ms_johnson").cast("long"),
            F.col("ms_fifo").cast("long"),
            F.col("lower_bound").cast("long"),
            (F.col("ms_fifo") - F.col("ms_johnson")).cast("long").alias("gap_fifo"),
        )
        .orderBy("grp")
    )


# ------------------------------------- matrix chain multiplication

# Matrix-chain ordering (Godbole 1973; CLRS ch. 15) — the canonical
# interval DP: cost(i,j) = min_k cost(i,k) + cost(k+1,j) +
# d_{i-1} d_k d_j. Chains of 8 matrices per customer group, md5 dims
# in 5..60 (costs stay < 2^21, exact int64). The DP unrolls by
# interval LENGTH — each length joins two shorter-interval relations
# and min-reduces, so both engines run the identical 7 staged rounds;
# the top-level argmin split and the exact left-to-right baseline make
# the optimization visible (ratio_e6 floor < 1e6 in nearly every
# group).
_MCM_M = 8

_MCM_LEN_SQL = """
b{L} AS MATERIALIZED (
  SELECT * FROM b{P}
  UNION ALL
  SELECT g, i, j, min(cost) AS cost,
         min_by(k, cost * 16 + k) AS split
  FROM (
    SELECT l.g, l.i, r.j, l.j AS k,
           l.cost + r.cost
             + di.d * dk.d * dj.d AS cost
    FROM b{P} l
    JOIN b{P} r ON r.g = l.g AND r.i = l.j + 1
                AND r.j - l.i + 1 = {L}
    JOIN dims di ON di.g = l.g AND di.t = l.i - 1
    JOIN dims dk ON dk.g = l.g AND dk.t = l.j
    JOIN dims dj ON dj.g = l.g AND dj.t = r.j
  )
  GROUP BY g, i, j
)
"""

_MCM_ORACLE = (
    """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT o_custkey % 50 AS g FROM orders
),
dims AS MATERIALIZED (
  SELECT g, t,
         CAST(5 + ('0x' || substr(md5('mc:' || CAST(g AS VARCHAR) || ':'
                || CAST(t AS VARCHAR)), 1, 5))::BIGINT % 56 AS BIGINT) AS d
  FROM grp, (SELECT unnest(generate_series(0, """
    + str(_MCM_M)
    + """)) AS t)
),
b1 AS MATERIALIZED (
  SELECT g, t AS i, t AS j, CAST(0 AS BIGINT) AS cost,
         CAST(0 AS BIGINT) AS split
  FROM dims WHERE t >= 1
),
"""
    + ",".join(
        _MCM_LEN_SQL.format(L=L, P=L - 1) for L in range(2, _MCM_M + 1)
    )
    + f"""
, naive AS MATERIALIZED (
  SELECT a.g, sum(d0.d * a.d * b.d) AS naive_cost
  FROM dims a
  JOIN dims b ON b.g = a.g AND b.t = a.t - 1
  JOIN dims d0 ON d0.g = a.g AND d0.t = 0
  WHERE a.t >= 2
  GROUP BY a.g
)
SELECT CAST(b.g AS BIGINT) AS g, CAST({_MCM_M} AS INT) AS n_matrices,
       CAST(b.cost AS BIGINT) AS opt_cost,
       CAST(n.naive_cost AS BIGINT) AS naive_cost,
       CAST(b.split AS INT) AS top_split,
       CAST(1000000 * b.cost // n.naive_cost AS BIGINT) AS ratio_e6
FROM b{_MCM_M} b JOIN naive n ON n.g = b.g
WHERE b.i = 1 AND b.j = {_MCM_M}
ORDER BY g
"""
)


@register_extra("matrix_chain_order", _MCM_ORACLE)
def matrix_chain_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-chain DP (see oracle comment). Plan: the interval table
    is (groups x 36) rows max; each of the 7 length rounds is one
    equi-join of the accumulated table with itself plus three
    broadcast dim lookups and a partial-agg min — group count is the
    only scale axis, intervals per group are m^2-bounded, so at 100 TB
    this is a dim-sized iterative job after one distinct over the fact
    keys."""
    o = _t(spark, sf_dir, "orders")
    grp = o.select((F.col("o_custkey") % 50).alias("g")).distinct()
    dims = (
        grp.crossJoin(
            spark.range(0, _MCM_M + 1).select(F.col("id").cast("int").alias("t"))
        )
        .select(
            "g",
            "t",
            (
                5
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("mc:"),
                                F.col("g").cast("string"),
                                F.lit(":"),
                                F.col("t").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        5,
                    ),
                    16,
                    10,
                ).cast("long")
                % 56
            ).alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    best = dims.filter(F.col("t") >= 1).select(
        "g",
        F.col("t").alias("i"),
        F.col("t").alias("j"),
        F.lit(0).cast("long").alias("cost"),
        F.lit(0).cast("long").alias("split"),
    )
    for L in range(2, _MCM_M + 1):
        left = best.select(
            F.col("g").alias("lg"), F.col("i").alias("li"),
            F.col("j").alias("lj"), F.col("cost").alias("lc"),
        )
        right = best.select(
            F.col("g").alias("rg"), F.col("i").alias("ri"),
            F.col("j").alias("rj"), F.col("cost").alias("rc"),
        )
        cand = (
            left.join(
                right,
                (F.col("rg") == F.col("lg"))
                & (F.col("ri") == F.col("lj") + 1)
                & (F.col("rj") - F.col("li") + 1 == L),
            )
            .join(
                F.broadcast(
                    dims.select(
                        F.col("g").alias("lg"),
                        (F.col("t") + 1).alias("li"),
                        F.col("d").alias("d_im1"),
                    )
                ),
                ["lg", "li"],
            )
            .join(
                F.broadcast(
                    dims.select(
                        F.col("g").alias("lg"),
                        F.col("t").alias("lj"),
                        F.col("d").alias("d_k"),
                    )
                ),
                ["lg", "lj"],
            )
            .join(
                F.broadcast(
                    dims.select(
                        F.col("g").alias("lg"),
                        F.col("t").alias("rj"),
                        F.col("d").alias("d_j"),
                    )
                ),
                ["lg", "rj"],
            )
            .select(
                F.col("lg").alias("g"),
                F.col("li").alias("i"),
                F.col("rj").alias("j"),
                F.col("lj").alias("k"),
                (
                    F.col("lc")
                    + F.col("rc")
                    + F.col("d_im1") * F.col("d_k") * F.col("d_j")
                ).alias("cost"),
            )
        )
        new = cand.groupBy("g", "i", "j").agg(
            F.min("cost").alias("cost"),
            F.expr("min_by(k, cost * 16 + k)").cast("long").alias("split"),
        )
        best = best.unionByName(new).localCheckpoint(eager=True)
    naive = (
        dims.filter(F.col("t") >= 2)
        .join(
            dims.select(
                F.col("g").alias("g"), (F.col("t") + 1).alias("t"),
                F.col("d").alias("d_prev"),
            ),
            ["g", "t"],
        )
        .join(
            F.broadcast(
                dims.filter(F.col("t") == 0).select("g", F.col("d").alias("d0"))
            ),
            "g",
        )
        .groupBy("g")
        .agg(F.sum(F.col("d0") * F.col("d_prev") * F.col("d")).alias("naive_cost"))
    )
    return (
        best.filter((F.col("i") == 1) & (F.col("j") == _MCM_M))
        .join(naive, "g")
        .select(
            F.col("g").cast("long"),
            F.lit(_MCM_M).cast("int").alias("n_matrices"),
            F.col("cost").cast("long").alias("opt_cost"),
            F.col("naive_cost").cast("long"),
            F.col("split").cast("int").alias("top_split"),
            F.expr("CAST(1000000 * cost div naive_cost AS BIGINT)").alias(
                "ratio_e6"
            ),
        )
        .orderBy("g")
    )


# ------------------------------------------- BOM requirements explosion

# Multi-level bill-of-materials explosion — the MRP primitive under
# every ERP system: total demand for a component = sum over all
# assembly paths of the product of per-edge quantities. The BOM DAG
# derives from part: each part at level L (partkey % 4) uses 2
# md5-chosen components at level L+1 with qty 1..5; acyclicity is by
# construction (edges only go level L -> L+1). The closure is the
# SUM-PRODUCT semiring (not the boolean/min closures the reachability
# rows use): paths accumulate multiplicatively, parallel paths add —
# 3 staged join rounds cover the 4-level DAG exactly. DuckDB twin
# runs the identical staged algebra.
_BOM_ORACLE = """
WITH parts AS MATERIALIZED (
  SELECT p_partkey AS pk, p_partkey % 4 AS lvl,
         p_partkey % 500 AS fam
  FROM part
),
edges AS MATERIALIZED (
  SELECT a.pk AS parent, b.pk AS child,
         1 + ('0x' || substr(md5('bq:' || CAST(a.pk AS VARCHAR) || ':'
                || CAST(k.k AS VARCHAR)), 1, 4))::BIGINT % 5 AS qty
  FROM parts a
  CROSS JOIN (SELECT unnest([0, 1]) AS k) k
  JOIN parts b
    ON b.lvl = a.lvl + 1
   AND b.fam = ('0x' || substr(md5('bc:' || CAST(a.pk AS VARCHAR) || ':'
                  || CAST(k.k AS VARCHAR)), 1, 5))::BIGINT % 500
  WHERE a.lvl < 3
),
-- sum-product closure: R1 = E, R2 = R1 + R1*E, R3 = R2 + R2*E
r1 AS MATERIALIZED (
  SELECT parent, child, CAST(sum(qty) AS BIGINT) AS qty
  FROM edges GROUP BY 1, 2
),
r2 AS MATERIALIZED (
  SELECT parent, child, CAST(sum(qty) AS BIGINT) AS qty FROM (
    SELECT parent, child, qty FROM r1
    UNION ALL
    SELECT r.parent, e.child, r.qty * e.qty
    FROM r1 r JOIN r1 e ON e.parent = r.child
  ) GROUP BY 1, 2
),
r3 AS MATERIALIZED (
  SELECT parent, child, CAST(sum(qty) AS BIGINT) AS qty FROM (
    SELECT parent, child, qty FROM r1
    UNION ALL
    SELECT r.parent, e.child, r.qty * e.qty
    FROM r2 r JOIN r1 e ON e.parent = r.child
  ) GROUP BY 1, 2
)
SELECT parent AS root_part, count(*) AS n_components,
       CAST(sum(qty) AS BIGINT) AS total_required,
       CAST(max(qty) AS BIGINT) AS max_single
FROM r3
JOIN parts p ON p.pk = parent AND p.lvl = 0
GROUP BY parent
ORDER BY root_part
"""


@register_extra("bom_explosion", _BOM_ORACLE)
def bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM requirements explosion (see oracle comment). Plan: the
    level-stratified DAG caps closure depth at 3 join rounds; each
    round shuffles on the join key and partial-aggregates the
    sum-product — at 100 TB the edge list is the only fact-sized
    relation and every round is one hash join + map-side combine,
    the standard iterative-datalog shape."""
    p = _t(spark, sf_dir, "part")
    parts = p.select(
        F.col("p_partkey").alias("pk"),
        (F.col("p_partkey") % 4).alias("lvl"),
        (F.col("p_partkey") % 500).alias("fam"),
    ).localCheckpoint(eager=True)
    ks = parts.sparkSession.range(0, 2).select(
        F.col("id").cast("int").alias("k")
    )

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("pk").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    ).cast("binary")
                ),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    a = (
        parts.filter(F.col("lvl") < 3)
        .crossJoin(F.broadcast(ks))
        .select(
            F.col("pk"),
            F.col("lvl"),
            F.col("k"),
            (1 + _h("bq:", 4) % 5).alias("qty"),
            (_h("bc:", 5) % 500).alias("cfam"),
        )
    )
    edges = (
        a.join(
            parts.select(
                F.col("pk").alias("child"),
                F.col("lvl").alias("clvl"),
                F.col("fam").alias("cfam2"),
            ),
            (F.col("clvl") == F.col("lvl") + 1)
            & (F.col("cfam2") == F.col("cfam")),
        )
        .groupBy(F.col("pk").alias("parent"), "child")
        .agg(F.sum("qty").cast("long").alias("qty"))
        .localCheckpoint(eager=True)
    )
    r = edges
    for _ in range(2):
        step = (
            r.alias("r")
            .join(
                edges.alias("e"),
                F.col("e.parent") == F.col("r.child"),
            )
            .select(
                F.col("r.parent").alias("parent"),
                F.col("e.child").alias("child"),
                (F.col("r.qty") * F.col("e.qty")).alias("qty"),
            )
        )
        r = (
            edges.unionByName(step)
            .groupBy("parent", "child")
            .agg(F.sum("qty").cast("long").alias("qty"))
            .localCheckpoint(eager=True)
        )
    roots = parts.filter(F.col("lvl") == 0).select(F.col("pk").alias("parent"))
    return (
        r.join(F.broadcast(roots), "parent")
        .groupBy("parent")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("qty").cast("long").alias("total_required"),
            F.max("qty").cast("long").alias("max_single"),
        )
        .select(
            F.col("parent").alias("root_part"),
            "n_components",
            "total_required",
            "max_single",
        )
        .orderBy("root_part")
    )


# ------------------------------------------- Banker's algorithm

# Dijkstra's Banker's algorithm (1965) — the deadlock-avoidance
# safety check: a system state is SAFE iff some order lets every
# process finish. The greedy is confluent (granting every currently
# satisfiable process at once is equivalent to any order), so the
# check unrolls as 5 staged rounds: finish all processes whose
# remaining need fits the available vector, release their
# allocations, repeat. 40 systems x 5 processes x 3 resources from
# md5 (alloc 0..3, extra need 0..3, initial avail 0..5) — tuned so
# both safe and deadlocked systems occur. Output is per process with
# its finish round (0 = never -> system unsafe), all exact integers.
_BANKER_ROUND_SQL = """
f{r} AS MATERIALIZED (
  SELECT p.g, p.p,
         CASE WHEN f.fr > 0 THEN f.fr
              WHEN p.n1 <= a.a1 AND p.n2 <= a.a2 AND p.n3 <= a.a3
              THEN {r} ELSE 0 END AS fr
  FROM procs p
  JOIN f{p} f ON f.g = p.g AND f.p = p.p
  JOIN av{p} a ON a.g = p.g
),
av{r} AS MATERIALIZED (
  SELECT a.g,
         a.a1 + coalesce(sum(CASE WHEN f.fr = {r} THEN p.al1 END), 0) AS a1,
         a.a2 + coalesce(sum(CASE WHEN f.fr = {r} THEN p.al2 END), 0) AS a2,
         a.a3 + coalesce(sum(CASE WHEN f.fr = {r} THEN p.al3 END), 0) AS a3
  FROM av{p} a
  LEFT JOIN f{r} f ON f.g = a.g
  LEFT JOIN procs p ON p.g = f.g AND p.p = f.p
  GROUP BY a.g, a.a1, a.a2, a.a3
)
"""

_BANKER_ORACLE = (
    """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT o_custkey % 40 AS g FROM orders
),
procs AS MATERIALIZED (
  SELECT g, pp.p,
         ('0x' || substr(md5('ba1:' || CAST(g AS VARCHAR) || ':'
            || CAST(pp.p AS VARCHAR)), 1, 4))::BIGINT % 4 AS al1,
         ('0x' || substr(md5('ba2:' || CAST(g AS VARCHAR) || ':'
            || CAST(pp.p AS VARCHAR)), 1, 4))::BIGINT % 4 AS al2,
         ('0x' || substr(md5('ba3:' || CAST(g AS VARCHAR) || ':'
            || CAST(pp.p AS VARCHAR)), 1, 4))::BIGINT % 4 AS al3,
         ('0x' || substr(md5('bn1:' || CAST(g AS VARCHAR) || ':'
            || CAST(pp.p AS VARCHAR)), 1, 4))::BIGINT % 4 AS n1,
         ('0x' || substr(md5('bn2:' || CAST(g AS VARCHAR) || ':'
            || CAST(pp.p AS VARCHAR)), 1, 4))::BIGINT % 4 AS n2,
         ('0x' || substr(md5('bn3:' || CAST(g AS VARCHAR) || ':'
            || CAST(pp.p AS VARCHAR)), 1, 4))::BIGINT % 4 AS n3
  FROM grp, (SELECT unnest(generate_series(1, 5)) AS p) pp
),
f0 AS MATERIALIZED (SELECT g, p, 0 AS fr FROM procs),
av0 AS MATERIALIZED (
  SELECT g,
         ('0x' || substr(md5('av1:' || CAST(g AS VARCHAR)),
                         1, 4))::BIGINT % 6 AS a1,
         ('0x' || substr(md5('av2:' || CAST(g AS VARCHAR)),
                         1, 4))::BIGINT % 6 AS a2,
         ('0x' || substr(md5('av3:' || CAST(g AS VARCHAR)),
                         1, 4))::BIGINT % 6 AS a3
  FROM grp
),
"""
    + ",".join(
        _BANKER_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, 6)
    )
    + """
, verdict AS MATERIALIZED (
  SELECT g, CASE WHEN min(CASE WHEN fr > 0 THEN 1 ELSE 0 END) = 1
                 THEN 1 ELSE 0 END AS safe
  FROM f5 GROUP BY g
)
SELECT CAST(f.g AS BIGINT) AS g, CAST(f.p AS INT) AS proc,
       CAST(p.n1 AS BIGINT) AS need1, CAST(p.n2 AS BIGINT) AS need2,
       CAST(p.n3 AS BIGINT) AS need3,
       CAST(f.fr AS INT) AS finish_round,
       CAST(v.safe AS INT) AS system_safe
FROM f5 f
JOIN procs p ON p.g = f.g AND p.p = f.p
JOIN verdict v ON v.g = f.g
ORDER BY g, proc
"""
)


@register_extra("banker_safety_check", _BANKER_ORACLE)
def banker_safety_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's-algorithm safety audit (see oracle comment). Plan:
    per-system state is a 1-row avail vector and 5 process rows; each
    of the 5 rounds is one broadcast-sized join + partial-agg release
    — system count is the only scale axis, the fact table contributes
    just the distinct group keys."""
    o = _t(spark, sf_dir, "orders")
    grp = o.select((F.col("o_custkey") % 40).alias("g")).distinct()
    pp = grp.crossJoin(
        o.sparkSession.range(1, 6).select(F.col("id").cast("int").alias("p"))
    )

    def _h(prefix: str, with_p: bool = True) -> F.Column:
        parts = [F.lit(prefix), F.col("g").cast("string")]
        if with_p:
            parts += [F.lit(":"), F.col("p").cast("string")]
        return (
            F.conv(
                F.substring(F.md5(F.concat(*parts).cast("binary")), 1, 4),
                16,
                10,
            ).cast("long")
        )

    procs = pp.select(
        "g",
        "p",
        (_h("ba1:") % 4).alias("al1"),
        (_h("ba2:") % 4).alias("al2"),
        (_h("ba3:") % 4).alias("al3"),
        (_h("bn1:") % 4).alias("n1"),
        (_h("bn2:") % 4).alias("n2"),
        (_h("bn3:") % 4).alias("n3"),
    ).localCheckpoint(eager=True)
    av = grp.select(
        "g",
        (_h("av1:", False) % 6).alias("a1"),
        (_h("av2:", False) % 6).alias("a2"),
        (_h("av3:", False) % 6).alias("a3"),
    ).localCheckpoint(eager=True)
    fin = procs.select("g", "p", F.lit(0).alias("fr"))
    for r in range(1, 6):
        fin = (
            procs.join(fin, ["g", "p"])
            .join(F.broadcast(av), "g")
            .select(
                "g",
                "p",
                F.when(F.col("fr") > 0, F.col("fr"))
                .when(
                    (F.col("n1") <= F.col("a1"))
                    & (F.col("n2") <= F.col("a2"))
                    & (F.col("n3") <= F.col("a3")),
                    r,
                )
                .otherwise(0)
                .alias("fr"),
            )
            .localCheckpoint(eager=True)
        )
        rel = (
            fin.filter(F.col("fr") == r)
            .join(procs, ["g", "p"])
            .groupBy("g")
            .agg(
                F.sum("al1").alias("r1"),
                F.sum("al2").alias("r2"),
                F.sum("al3").alias("r3"),
            )
        )
        av = (
            av.join(rel, "g", "left")
            .select(
                "g",
                (F.col("a1") + F.coalesce("r1", F.lit(0))).alias("a1"),
                (F.col("a2") + F.coalesce("r2", F.lit(0))).alias("a2"),
                (F.col("a3") + F.coalesce("r3", F.lit(0))).alias("a3"),
            )
            .localCheckpoint(eager=True)
        )
    verdict = fin.groupBy("g").agg(
        F.min(F.when(F.col("fr") > 0, 1).otherwise(0)).alias("safe")
    )
    return (
        fin.join(procs, ["g", "p"])
        .join(F.broadcast(verdict), "g")
        .select(
            F.col("g").cast("long"),
            F.col("p").cast("int").alias("proc"),
            F.col("n1").cast("long").alias("need1"),
            F.col("n2").cast("long").alias("need2"),
            F.col("n3").cast("long").alias("need3"),
            F.col("fr").cast("int").alias("finish_round"),
            F.col("safe").cast("int").alias("system_safe"),
        )
        .orderBy("g", "proc")
    )


# ------------------------------------------- Raft commit-index audit

# Raft's commit rule (Ongaro & Ousterhout 2014, §5.4.2 / Figure 8):
# a leader may count an entry committed only if a MAJORITY stores it
# AND its term equals the leader's current term — the naive
# majority-only rule can "commit" an old-term entry that a future
# leader is still allowed to overwrite. 30 clusters of 5 replicas:
# the leader log is 12 entries with md5-driven nondecreasing terms
# (a prefix-sum of term bumps), each follower stores an md5 prefix.
# naive_commit = deepest majority-replicated index; raft_commit
# additionally requires term(idx) = current term at that index or
# transitively below a qualifying one. at_risk = their difference —
# the Figure-8 window, nonzero in a fair share of clusters.
_RAFT_ORACLE = """
WITH grp AS MATERIALIZED (
  SELECT DISTINCT c_custkey % 30 AS g FROM customer
),
logidx AS MATERIALIZED (
  SELECT g, CAST(i AS BIGINT) AS idx
  FROM grp, (SELECT unnest(generate_series(1, 12)) AS i)
),
terms AS MATERIALIZED (
  SELECT g, idx,
         1 + sum(CASE WHEN ('0x' || substr(md5('tb:'
                   || CAST(g AS VARCHAR) || ':'
                   || CAST(idx AS VARCHAR)), 1, 4))::BIGINT % 4 = 0
                 THEN 1 ELSE 0 END)
             OVER (PARTITION BY g ORDER BY idx) AS term
  FROM logidx
),
cur AS MATERIALIZED (
  SELECT g, max(term) AS current_term FROM terms GROUP BY g
),
followers AS MATERIALIZED (
  SELECT g, f.f,
         ('0x' || substr(md5('mi:' || CAST(g AS VARCHAR) || ':'
            || CAST(f.f AS VARCHAR)), 1, 4))::BIGINT % 13 AS match_idx
  FROM grp, (SELECT unnest(generate_series(1, 4)) AS f) f
),
repl AS MATERIALIZED (
  SELECT t.g, t.idx, t.term,
         1 + coalesce(sum(CASE WHEN fo.match_idx >= t.idx
                               THEN 1 ELSE 0 END), 0) AS n_repl
  FROM terms t LEFT JOIN followers fo ON fo.g = t.g
  GROUP BY t.g, t.idx, t.term
)
SELECT CAST(r.g AS BIGINT) AS g,
       CAST(any_value(c.current_term) AS BIGINT) AS current_term,
       CAST(coalesce(max(CASE WHEN n_repl >= 3 THEN idx END), 0)
            AS BIGINT) AS naive_commit,
       CAST(coalesce(max(CASE WHEN n_repl >= 3
                              AND term = c.current_term THEN idx END), 0)
            AS BIGINT) AS raft_commit,
       CAST(coalesce(max(CASE WHEN n_repl >= 3 THEN idx END), 0)
            - coalesce(max(CASE WHEN n_repl >= 3
                                AND term = c.current_term THEN idx END), 0)
            AS BIGINT) AS at_risk
FROM repl r JOIN cur c ON c.g = r.g
GROUP BY r.g
ORDER BY g
"""


@register_extra("raft_commit_audit", _RAFT_ORACLE)
def raft_commit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raft commit-rule audit (see oracle comment). Plan: cluster
    state is dim-sized (30 x 12 log rows + 30 x 4 matchIndex rows);
    one window prefix-sum builds the term sequence, one broadcast
    join counts replication — the fact table contributes only
    distinct keys, so the audit is O(clusters) at any corpus scale."""
    c = _t(spark, sf_dir, "customer")
    grp = c.select((F.col("c_custkey") % 30).alias("g")).distinct()
    sess = c.sparkSession
    logidx = grp.crossJoin(
        sess.range(1, 13).select(F.col("id").cast("long").alias("idx"))
    )

    def _h(prefix: str, col: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("g").cast("string"),
                        F.lit(":"),
                        F.col(col).cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    terms = logidx.withColumn(
        "term",
        1
        + F.sum(F.when(_h("tb:", "idx") % 4 == 0, 1).otherwise(0)).over(
            Window.partitionBy("g").orderBy("idx")
        ),
    )
    cur = terms.groupBy("g").agg(F.max("term").alias("current_term"))
    followers = grp.crossJoin(
        sess.range(1, 5).select(F.col("id").cast("int").alias("f"))
    ).select("g", "f", (_h("mi:", "f") % 13).alias("match_idx"))
    repl = (
        terms.join(followers, "g", "left")
        .groupBy("g", "idx", "term")
        .agg(
            (
                1
                + F.coalesce(
                    F.sum(
                        F.when(
                            F.col("match_idx") >= F.col("idx"), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
            ).alias("n_repl")
        )
    )
    return (
        repl.join(F.broadcast(cur), "g")
        .groupBy("g")
        .agg(
            F.first("current_term").cast("long").alias("current_term"),
            F.coalesce(
                F.max(F.when(F.col("n_repl") >= 3, F.col("idx"))), F.lit(0)
            )
            .cast("long")
            .alias("naive_commit"),
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("n_repl") >= 3)
                        & (F.col("term") == F.col("current_term")),
                        F.col("idx"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("raft_commit"),
        )
        .withColumn(
            "at_risk", (F.col("naive_commit") - F.col("raft_commit")).cast("long")
        )
        .select(
            F.col("g").cast("long"),
            "current_term",
            "naive_commit",
            "raft_commit",
            "at_risk",
        )
        .orderBy("g")
    )


# ------------------------------------- Merkle inclusion proofs

# Inclusion-proof verification over the gated degree-16 Merkle zones
# (merkle16_partition_roots): for a 1-in-60 md5 sample of leaves,
# recompute the authentication path — the leaf's level-1 group hash
# from its 15 siblings, the level-2 hash from the level-1 cohort,
# the zone root — and check it equals the independently-built root
# (path_ok frozen 1). The integrity theorem rides next to it: the
# SAME path recomputed with the leaf tampered (+1 cent) must flip
# the root (tamper_detected frozen 1) — no silent corruption can
# survive a proof check.
_MERKLE_PROOF_ORACLE = """
WITH leaf AS MATERIALIZED (
  SELECT o_orderkey // 1000 AS zone, o_orderkey AS k,
         md5(CAST(o_orderkey AS VARCHAR) || ':'
             || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     AS VARCHAR) || ':' || o_orderstatus) AS h,
         md5(CAST(o_orderkey AS VARCHAR) || ':'
             || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1
                     AS VARCHAR) || ':' || o_orderstatus) AS ht
  FROM orders
),
l0 AS MATERIALIZED (
  SELECT zone, k, h, ht,
         row_number() OVER (PARTITION BY zone ORDER BY k) - 1 AS i
  FROM leaf
),
l1 AS MATERIALIZED (
  SELECT zone, i // 16 AS i, md5(string_agg(h, '' ORDER BY i)) AS h
  FROM l0 GROUP BY zone, i // 16
),
l2 AS MATERIALIZED (
  SELECT zone, i // 16 AS i, md5(string_agg(h, '' ORDER BY i)) AS h
  FROM l1 GROUP BY zone, i // 16
),
root AS MATERIALIZED (
  SELECT zone, md5(string_agg(h, '' ORDER BY i)) AS r FROM l2
  GROUP BY zone
),
sample0 AS MATERIALIZED (
  SELECT zone, k, i FROM l0
  WHERE ('0x' || substr(md5('mp:' || CAST(k AS VARCHAR)),
                        1, 4))::BIGINT % 60 = 0
),
p1 AS MATERIALIZED (
  -- level-1 hash of the sampled leaf's group, clean and tampered
  SELECT s.zone, s.k, s.i // 16 AS gi,
         md5(string_agg(m.h, '' ORDER BY m.i)) AS h1,
         md5(string_agg(CASE WHEN m.i = s.i THEN m.ht ELSE m.h END,
                        '' ORDER BY m.i)) AS h1t
  FROM sample0 s
  JOIN l0 m ON m.zone = s.zone AND m.i // 16 = s.i // 16
  GROUP BY s.zone, s.k, s.i // 16
),
p2 AS MATERIALIZED (
  SELECT p.zone, p.k, p.gi // 16 AS gi,
         md5(string_agg(CASE WHEN m.i = p.gi THEN p.h1 ELSE m.h END,
                        '' ORDER BY m.i)) AS h2,
         md5(string_agg(CASE WHEN m.i = p.gi THEN p.h1t ELSE m.h END,
                        '' ORDER BY m.i)) AS h2t
  FROM p1 p
  JOIN l1 m ON m.zone = p.zone AND m.i // 16 = p.gi // 16
  GROUP BY p.zone, p.k, p.gi // 16
),
p3 AS MATERIALIZED (
  SELECT p.zone, p.k,
         md5(string_agg(CASE WHEN m.i = p.gi THEN p.h2 ELSE m.h END,
                        '' ORDER BY m.i)) AS rr,
         md5(string_agg(CASE WHEN m.i = p.gi THEN p.h2t ELSE m.h END,
                        '' ORDER BY m.i)) AS rrt
  FROM p2 p
  JOIN l2 m ON m.zone = p.zone
  GROUP BY p.zone, p.k, p.gi
)
SELECT CAST(p.zone AS BIGINT) AS zone, CAST(p.k AS BIGINT) AS leaf_key,
       CAST(CASE WHEN p.rr = r.r THEN 1 ELSE 0 END AS INT) AS path_ok,
       CAST(CASE WHEN p.rrt <> r.r THEN 1 ELSE 0 END AS INT)
         AS tamper_detected
FROM p3 p JOIN root r ON r.zone = p.zone
ORDER BY zone, leaf_key
"""


@register_extra("merkle_inclusion_proofs", _MERKLE_PROOF_ORACLE)
def merkle_inclusion_proofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle inclusion-proof verification (see oracle comment).
    Plan: the tree levels build once (the gated root query's shape);
    each sampled proof joins only its sibling cohorts (16 rows per
    level) — proof checks are O(log n) joins over dim-sized cohorts,
    never a second full-table pass."""
    o = _t(spark, sf_dir, "orders")

    def leaf_h(bump: int):
        return F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                (
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                    + bump
                ).cast("string"),
                F.lit(":"),
                F.col("o_orderstatus"),
            ).cast("binary")
        )

    leaf = o.select(
        F.expr("o_orderkey div 1000").alias("zone"),
        F.col("o_orderkey").alias("k"),
        leaf_h(0).alias("h"),
        leaf_h(1).alias("ht"),
    )
    w = Window.partitionBy("zone").orderBy("k")
    l0 = leaf.withColumn("i", F.row_number().over(w) - 1).localCheckpoint(
        eager=False
    )

    def combine(df, tag):
        return df.groupBy("zone", F.expr("i div 16").alias("gi")).agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list(struct(i, h))),"
                        " x -> x.h)"
                    ),
                ).cast("binary")
            ).alias("h")
        ).select("zone", F.col("gi").alias("i"), "h")

    l1 = combine(l0, "l1").localCheckpoint(eager=False)
    l2 = combine(l1, "l2").localCheckpoint(eager=False)
    root = l2.groupBy("zone").agg(
        F.md5(
            F.concat_ws(
                "",
                F.expr(
                    "transform(array_sort(collect_list(struct(i, h))),"
                    " x -> x.h)"
                ),
            ).cast("binary")
        ).alias("r")
    )
    sample0 = l0.filter(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("mp:"), F.col("k").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 60
        == 0
    ).select("zone", "k", F.col("i").alias("si"))

    p1 = (
        sample0.join(
            l0.select(
                "zone",
                F.col("i").alias("mi"),
                F.col("h").alias("mh"),
                F.col("ht").alias("mht"),
            ),
            "zone",
        )
        .filter(F.expr("mi div 16 = si div 16"))
        .groupBy("zone", "k", F.expr("si div 16").alias("gi"))
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list(struct(mi, mh))),"
                        " x -> x.mh)"
                    ),
                ).cast("binary")
            ).alias("h1"),
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list("
                        " struct(mi, IF(mi = si, mht, mh)))), x -> x.col2)"
                    ),
                ).cast("binary")
            ).alias("h1t"),
        )
    )
    p2 = (
        p1.join(
            l1.select(
                "zone", F.col("i").alias("mi"), F.col("h").alias("mh")
            ),
            "zone",
        )
        .filter(F.expr("mi div 16 = gi div 16"))
        .groupBy("zone", "k", F.expr("gi div 16").alias("gi2"), "gi")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list("
                        " struct(mi, IF(mi = gi, h1, mh)))), x -> x.col2)"
                    ),
                ).cast("binary")
            ).alias("h2"),
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list("
                        " struct(mi, IF(mi = gi, h1t, mh)))), x -> x.col2)"
                    ),
                ).cast("binary")
            ).alias("h2t"),
        )
        .select("zone", "k", F.col("gi2").alias("gi"), "h2", "h2t")
    )
    p3 = (
        p2.join(
            l2.select(
                "zone", F.col("i").alias("mi"), F.col("h").alias("mh")
            ),
            "zone",
        )
        .groupBy("zone", "k")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list("
                        " struct(mi, IF(mi = gi, h2, mh)))), x -> x.col2)"
                    ),
                ).cast("binary")
            ).alias("rr"),
            F.md5(
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list("
                        " struct(mi, IF(mi = gi, h2t, mh)))), x -> x.col2)"
                    ),
                ).cast("binary")
            ).alias("rrt"),
        )
    )
    return (
        p3.join(root, "zone")
        .select(
            F.col("zone").cast("long"),
            F.col("k").cast("long").alias("leaf_key"),
            F.when(F.col("rr") == F.col("r"), 1).otherwise(0).cast("int")
            .alias("path_ok"),
            F.when(F.col("rrt") != F.col("r"), 1).otherwise(0).cast("int")
            .alias("tamper_detected"),
        )
        .orderBy("zone", "leaf_key")
    )


# ------------------------------------- round-robin scheduling

# The circle method (Kirkman 1847) — the 1-factorization behind every
# league schedule: fix team 0, rotate 1..n-1; round r pairs the fixed
# team with team r+1... encoded closed-form: in round r (0..n-2),
# team 0 plays 1 + ((r) mod (n-1)), and teams i, j (>0) meet in the
# round where (i + j - 2) = r mod (n-1). The query GENERATES the
# schedule for n = 8 and 12 teams and freezes the design properties:
# every pair meets EXACTLY once, every team plays EXACTLY once per
# round — recomputed as counts, hash-fatal.
_RR_ORACLE = """
WITH ns AS MATERIALIZED (SELECT unnest([8, 12]) AS n),
rounds AS MATERIALIZED (
  SELECT n, r.r FROM ns, (SELECT unnest(generate_series(0, 10)) AS r) r
  WHERE r.r < n - 1
),
slots AS MATERIALIZED (
  SELECT n, r, k.k FROM rounds,
       (SELECT unnest(generate_series(0, 5)) AS k) k
  WHERE k.k < n // 2
),
games AS MATERIALIZED (
  -- circle method: position p holds team 0 if p = 0 else
  -- 1 + ((p - 1 + r) mod (n - 1)); slot k pairs positions k and n-1-k
  SELECT n, r, k,
         CASE WHEN k = 0 THEN 0
              ELSE 1 + ((k - 1 + r) % (n - 1)) END AS home,
         1 + ((n - 2 - k + r) % (n - 1)) AS away
  FROM slots
),
pairs AS MATERIALIZED (
  SELECT n, least(home, away) AS a, greatest(home, away) AS b,
         count(*) AS meets
  FROM games GROUP BY 1, 2, 3
),
perround AS MATERIALIZED (
  SELECT n, r, t, count(*) AS plays FROM (
    SELECT n, r, home AS t FROM games
    UNION ALL SELECT n, r, away FROM games
  ) GROUP BY 1, 2, 3
)
SELECT CAST(n AS INT) AS n,
       CAST((SELECT count(*) FROM pairs p WHERE p.n = x.n) AS BIGINT)
         AS n_pairs,
       CAST((SELECT min(meets) FROM pairs p WHERE p.n = x.n) AS BIGINT)
         AS min_meets,
       CAST((SELECT max(meets) FROM pairs p WHERE p.n = x.n) AS BIGINT)
         AS max_meets,
       CAST((SELECT min(plays) FROM perround q WHERE q.n = x.n)
            AS BIGINT) AS min_plays_per_round,
       CAST((SELECT max(plays) FROM perround q WHERE q.n = x.n)
            AS BIGINT) AS max_plays_per_round
FROM ns x ORDER BY n
"""


@register_extra("round_robin_schedule", _RR_ORACLE)
def round_robin_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circle-method round-robin 1-factorization (see oracle
    comment): n_pairs must equal C(n,2), min = max = 1 for both pair
    meetings and per-round appearances — the combinatorial-design
    certificate, hash-frozen for n = 8 and 12."""
    sess = spark
    ns = sess.createDataFrame([(8,), (12,)], "n int")
    rr = sess.range(0, 11).select(F.col("id").cast("int").alias("r"))
    kk = sess.range(0, 6).select(F.col("id").cast("int").alias("k"))
    games = (
        ns.crossJoin(F.broadcast(rr))
        .filter(F.col("r") < F.col("n") - 1)
        .crossJoin(F.broadcast(kk))
        .filter(F.col("k") < F.expr("n div 2"))
        .selectExpr(
            "n",
            "r",
            "k",
            "CASE WHEN k = 0 THEN 0"
            " ELSE 1 + ((k - 1 + r) % (n - 1)) END AS home",
            "1 + ((n - 2 - k + r) % (n - 1)) AS away",
        )
        .localCheckpoint(eager=True)
    )
    pairs = games.groupBy(
        "n", F.least("home", "away").alias("a"),
        F.greatest("home", "away").alias("b"),
    ).agg(F.count(F.lit(1)).alias("meets"))
    perround = (
        games.selectExpr("n", "r", "home AS t")
        .unionAll(games.selectExpr("n", "r", "away AS t"))
        .groupBy("n", "r", "t")
        .agg(F.count(F.lit(1)).alias("plays"))
    )
    pa = pairs.groupBy("n").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("meets").alias("min_meets"),
        F.max("meets").alias("max_meets"),
    )
    pr = perround.groupBy("n").agg(
        F.min("plays").alias("min_plays_per_round"),
        F.max("plays").alias("max_plays_per_round"),
    )
    return (
        pa.join(pr, "n")
        .select(
            F.col("n").cast("int"),
            F.col("n_pairs").cast("long"),
            F.col("min_meets").cast("long"),
            F.col("max_meets").cast("long"),
            F.col("min_plays_per_round").cast("long"),
            F.col("max_plays_per_round").cast("long"),
        )
        .orderBy("n")
    )
