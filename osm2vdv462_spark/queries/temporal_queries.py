"""Temporal / reshaping operator families the reference lacks and Spark
has no single built-in for, each re-expressed as a scale-shaped
composition of DataFrame ops (SURVEY §2 'beyond the reference' mandate):

- as-of join (latest state at or before each probe timestamp) — the
  union + last(ignore_nulls) window form: ONE shuffle on the key, no
  per-row range scan, no inequality-join explosion. The naive form
  (theta join ts >= ts, then argmax) is quadratic per key at 100 TB;
  this form is linear after a single sort and is how streaming engines
  implement temporal joins.
- range join (point-in-interval) — epoch-bucketed candidate generation
  + exact refine, the 1D analog of this repo's PIP/DWithin spatial
  joins: interval length == bucket width, so every interval covers at
  most 2 buckets and the join is a plain equi-join on (key, bucket),
  never an inequality-driven nested loop.
- pivot with PINNED values — `df.groupBy().pivot(col, values)` only
  stays one-pass when values are pinned; omitting them makes Spark run
  an eager distinct() job over the fact table first (a full extra scan
  at 100 TB). The oracle is conditional aggregation (FILTER), the
  canonical SQL equivalent.
- exact grouped percentiles — quartiles over integer cents: positions
  (n-1)*k/4 and linear interpolation are binary-exact for k/4
  fractions, so Spark's `percentile` and DuckDB's `quantile_cont`
  agree byte-for-byte with no float-rounding shims.

All extra-tier (the 50-row driver gate is full — CLAUDE.md invariant);
held to the same DuckDB oracles by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register_extra(
    "asof_join_state",
    """
    WITH state AS (
      SELECT user_id, ts, max(value) AS state_val
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id,
           CAST(s.state_val AS DOUBLE) AS last_view_value
    FROM events e ASOF LEFT JOIN state s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def asof_join_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the value of the latest 'view'
    event for the same user at or before its own timestamp (sensor /
    price-lookup semantics; DuckDB's native ASOF LEFT JOIN is the
    oracle). Implementation is the scalable union form: tag state rows
    sort-before probe rows at equal ts (inclusive '>=' boundary), then
    last(state_val, ignore_nulls) over an unbounded-preceding row frame.
    One Exchange on user_id; state is deduped per (user_id, ts) first so
    the as-of match is well-defined under timestamp ties."""
    ev = _t(spark, sf_dir, "events")
    state = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("state_val"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.lit(0).alias("is_probe"),
            "state_val",
        )
    )
    probes = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("double").alias("state_val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        probes.unionByName(state)
        .withColumn("last_view_value", F.last("state_val", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("event_id", "user_id", "last_view_value")
    )


@register_extra(
    "range_join_windows",
    """
    SELECT er.event_id AS error_id,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') er
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = er.user_id
     AND c.ts >= er.ts AND c.ts < er.ts + INTERVAL 10 MINUTE
    GROUP BY er.event_id
    """,
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join: clicks falling inside the 10-min
    window after each error, per user. Candidate generation is a plain
    equi-join on (user_id, epoch_bucket) with bucket width == interval
    length, so each interval explodes to exactly 2 buckets and each
    point maps to 1 — no inequality nested loop (the 1D twin of
    operators/spatial_join.py's grid strategy). The true timestamp
    predicate then refines exactly; left semantics keep zero-click
    errors (both exploded rows carry NULL, count() ignores them and the
    error still groups to 0)."""
    ev = _t(spark, sf_dir, "events")
    bucket_s = 600  # == interval length: the <=2-bucket cover guarantee
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("ets"),
        F.explode(
            F.array(
                F.floor(F.unix_timestamp("ts") / bucket_s),
                F.floor(F.unix_timestamp("ts") / bucket_s) + 1,
            )
        ).alias("bucket"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("cts"),
        F.floor(F.unix_timestamp("ts") / bucket_s).alias("c_bucket"),
    )
    cond = (
        (err.user_id == clk.c_user_id)
        & (err.bucket == clk.c_bucket)
        & (clk.cts >= err.ets)
        & (clk.cts < err.ets + F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        err.join(clk, cond, "left")
        .groupBy("error_id")
        .agg(F.count("click_id").cast("long").alias("n_clicks"))
    )


@register_extra(
    "pivot_order_matrix",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_open,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_filled,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS rev_pending
    FROM orders GROUP BY 1
    """,
)
def pivot_order_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide) with pinned pivot values: order counts and
    exact-decimal revenue per (priority x status). Pinning ["O","F","P"]
    keeps this ONE aggregation pass — an unpinned pivot() first runs a
    distinct() job over the fact table to discover values, a full extra
    scan at 100 TB. Oracle is the FILTER-clause conditional-aggregation
    equivalent."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            # count(lit(1)), not count("*"): star is rejected inside a Pivot agg
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.col("O_n").cast("long").alias("n_open"),
        F.col("O_rev").alias("rev_open"),
        F.col("F_n").cast("long").alias("n_filled"),
        F.col("F_rev").alias("rev_filled"),
        F.col("P_n").cast("long").alias("n_pending"),
        F.col("P_rev").alias("rev_pending"),
    )


@register_extra(
    "percentile_quartiles",
    """
    SELECT event_type,
           CAST(quantile_cont(cents, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont(cents, 0.50) AS DOUBLE) AS p50,
           CAST(quantile_cont(cents, 0.75) AS DOUBLE) AS p75,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events)
    GROUP BY event_type
    """,
)
def percentile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (quartiles of integer cents per event
    type). Engine-exact by construction: both Spark's percentile() and
    DuckDB's quantile_cont() use position (n-1)*q with linear
    interpolation, and q in {1/4, 1/2, 3/4} over integers yields
    binary-exact multiples of 0.25 — no rounding shim needed. Exact
    percentile is a sort-per-group; at 100 TB prefer approx_percentile
    (t-digest sketch, partial-aggregable) unless exactness is the spec —
    that trade-off is the point of this row."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    return (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            F.expr("percentile(cents, 0.25)").cast("double").alias("p25"),
            F.expr("percentile(cents, 0.50)").cast("double").alias("p50"),
            F.expr("percentile(cents, 0.75)").cast("double").alias("p75"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )


@register_extra(
    "unpivot_order_longform",
    """
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
             CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
             CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, metric, n FROM wide
    UNPIVOT (n FOR metric IN (n_open, n_filled, n_pending))
    """,
)
def unpivot_order_longform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, the inverse of pivot_order_matrix): the
    pivoted status-count matrix melted back to (priority, metric, n)
    rows via stack() — a zero-shuffle generator expression (each input
    row expands in place; no explode of a built array, no join).
    DuckDB's native UNPIVOT is the oracle twin."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.col("O").cast("long").alias("n_open"),
            F.col("F").cast("long").alias("n_filled"),
            F.col("P").cast("long").alias("n_pending"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.expr(
            "stack(3, 'n_open', n_open, 'n_filled', n_filled,"
            " 'n_pending', n_pending) AS (metric, n)"
        ),
    )


@register_extra(
    "timeseries_gapfill",
    """
    WITH b AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS h,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM b
    ),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(h0, h1, 3600)) AS h FROM bounds
      ) g
    )
    SELECT grid.event_type, grid.h AS hour_epoch,
           CAST(coalesce(b.n, 0) AS BIGINT) AS n
    FROM grid LEFT JOIN b
      ON b.event_type = grid.event_type AND b.h = grid.h
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: hourly event counts per
    type over the FULL dense hour grid (empty hours materialized as 0) —
    the densification step before any rolling/forecast feature. The
    dense grid is generated with sequence() off a 1-row global-bounds
    aggregate (broadcast cross join, no driver round-trip) and exploded
    against the distinct-type dim; observed counts left-join in. Scale
    shape: grid size is types x hours (tiny vs the fact table); the
    fact side aggregates BEFORE the join, so the join carries one row
    per (type, hour), never raw events."""
    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("n"))
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("h"),
    )
    return grid.join(b, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("hour_epoch"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )


@register_extra(
    "funnel_steps",
    """
    WITH f AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    e AS (SELECT user_id, event_type, ts FROM f WHERE rn <= 8),
    t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM e
      WHERE event_type = 'signup' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM e JOIN t1 ON t1.user_id = e.user_id
      WHERE e.event_type = 'view' AND e.ts >= t1.ts1
      GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM e JOIN t2 ON t2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= t2.ts2
      GROUP BY 1
    )
    SELECT * FROM (
      SELECT 1 AS step, 'signup' AS event_type,
             (SELECT count(*) FROM t1) AS n_users
      UNION ALL
      SELECT 2, 'view', (SELECT count(*) FROM t2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM t3)
    ) ORDER BY step
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup -> view -> purchase within each
    user's FIRST 8 interactions — the early-funnel restriction makes
    step order genuinely selective on this data: 120 -> 71 -> 29 at
    sf0.01): users who performed each step AT OR AFTER their earliest
    completion of the previous step — the product-analytics sequence
    operator Spark has no built-in for. Implementation is the chained
    earliest-completion form: one user_id window + one aggregate per
    step, ALL on the same user_id shuffle key (at scale, pre-partition
    events by user_id once and every window/aggregate/join reuses that
    partitioning — zero extra exchanges). Inclusive (>=) boundary and
    (ts, event_id) tie-break, pinned identically in the oracle.
    All-integer output."""
    from pyspark.sql import Window

    raw = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    wrn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        raw.withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") <= 8)
        .select("user_id", "event_type", "ts")
    )
    t1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "view")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    rows = []
    for step, name, df in [(1, "signup", t1), (2, "view", t2), (3, "purchase", t3)]:
        rows.append(
            df.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(step).alias("step"),
                F.lit(name).alias("event_type"),
                "n_users",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


@register_extra(
    "ohlc_hourly_bars",
    """
    WITH b AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
               AS bucket_epoch,
             ts, event_id, value,
             row_number() OVER (
               PARTITION BY event_type,
                            time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY event_type,
                            time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket_epoch,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n
    FROM b GROUP BY 1, 2
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the canonical time-series rollup: per
    (series, hour) the first value, extremes, and last value. Open and
    close are ORDER-SENSITIVE selections, so they carry the pinned
    (ts, event_id) total order (the A7/O1 discipline: an unpinned
    first_value is nondeterministic under retries and across engines);
    high/low/count are plain aggregates. No arithmetic touches the
    values — pure selection — so raw doubles hash bit-identically with
    no rounding step. One exchange on (event_type, bucket) serves both
    window sorts and the rollup."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    b = ev.select(
        "event_type", bucket.alias("bucket_epoch"), "ts", "event_id", "value"
    )
    w_a = Window.partitionBy("event_type", "bucket_epoch").orderBy(
        "ts", "event_id"
    )
    w_d = Window.partitionBy("event_type", "bucket_epoch").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b = b.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return b.groupBy("event_type", "bucket_epoch").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n"),
    )


@register_extra(
    "interval_max_concurrency",
    """
    WITH iv AS (
      SELECT user_id % 20 AS g, ts AS s,
             ts + to_minutes(CAST(event_id % 7 + 1 AS BIGINT)) AS e
      FROM events
    ),
    probe AS (SELECT DISTINCT g, s FROM iv),
    c AS (
      SELECT p.g, p.s AS t, count(*) AS conc
      FROM probe p JOIN iv b ON b.g = p.g AND b.s <= p.s AND b.e > p.s
      GROUP BY 1, 2
    ),
    pk AS (SELECT g, max(conc) AS peak FROM c GROUP BY 1)
    SELECT c.g, pk.peak, min(c.t) AS peak_t
    FROM c JOIN pk ON pk.g = c.g AND c.conc = pk.peak
    GROUP BY 1, 2 ORDER BY c.g
    """,
)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max concurrency: per user bucket, the peak number of
    simultaneously-open sessions (end-EXCLUSIVE intervals ts ..
    ts + (event_id%7+1) min) and the earliest instant attaining it —
    the capacity-planning query (max concurrent connections / calls /
    jobs). Spark is the O(n log n) boundary sweep: +1/-1 deltas, one
    running-sum window per group ordered (t, delta) so closings apply
    before openings at the same instant (end-exclusive pinned), then a
    max + earliest-argmax rollup; within an equal-(t, delta) run the
    prefix-sum SET is permutation-invariant (all deltas equal), so the
    result is deterministic under any shuffle order. The oracle is the
    INDEPENDENT quadratic formulation: count overlapping intervals at
    every distinct start point. Peaks always occur at a start, so both
    derivations agree exactly — concurrency changes only there."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.select(
        (F.col("user_id") % 20).alias("g"),
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_dt_interval(0, 0, CAST(event_id % 7 + 1 AS INT), 0)"
        ).alias("e"),
    )
    b = iv.select("g", F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select("g", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = b.select("g", "t", "d", F.sum("d").over(w).alias("run"))
    pk = run.groupBy("g").agg(F.max("run").alias("peak"))
    return (
        run.join(pk, "g")
        .filter(F.col("run") == F.col("peak"))
        .groupBy("g", "peak")
        .agg(F.min("t").alias("peak_t"))
        .orderBy("g")
    )


@register_extra(
    "interval_union_coverage",
    """
    WITH iv AS (
      SELECT user_id % 20 AS g, ts AS s,
             ts + to_minutes(CAST(event_id % 7 + 1 AS BIGINT)) AS e
      FROM events
    ),
    m AS (
      SELECT g, s, e,
             max(e) OVER (PARTITION BY g ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT g, s, e,
             sum(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY g ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS island
      FROM m
    ),
    merged AS (
      SELECT g, island, epoch_us(max(e)) - epoch_us(min(s)) AS len_us
      FROM isl GROUP BY 1, 2
    )
    SELECT g, CAST(sum(len_us) AS BIGINT) AS covered_us,
           count(*) AS n_merged
    FROM merged GROUP BY 1 ORDER BY g
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per group: total time covered by the
    union of (possibly overlapping) sessions and the number of merged
    stretches — the utilization/uptime rollup. Touching intervals
    merge (union semantics), pinned by ordering openings BEFORE
    closings at equal instants. Spark is the boundary sweep: +1/-1
    deltas, one window per group ordered (t, delta DESC); a micro-
    second span [prev_t, t) counts iff the running sum was positive
    entering it, and a merged stretch starts wherever an opening
    raises the sum to 1. The oracle is the INDEPENDENT gaps-and-
    islands derivation: cumulative max-end over the start-sorted
    intervals splits islands, then max(e)-min(s) per island — interval
    -level, not boundary-level. Exact integer microseconds."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.select(
        (F.col("user_id") % 20).alias("g"),
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_dt_interval(0, 0, CAST(event_id % 7 + 1 AS INT), 0)"
        ).alias("e"),
    )
    b = iv.select("g", F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select("g", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy(F.col("t"), F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("g").orderBy(F.col("t"), F.col("d").desc())
    r = b.select(
        "g",
        "t",
        "d",
        F.sum("d").over(w).alias("run"),
        F.lag("t").over(wl).alias("pt"),
        F.lag(F.sum("d").over(w)).over(wl).alias("prun"),
    )
    return (
        r.groupBy("g")
        .agg(
            F.sum(
                F.when(
                    F.col("prun") >= 1,
                    F.expr("timestampdiff(MICROSECOND, pt, t)"),
                ).otherwise(F.lit(0))
            ).alias("covered_us"),
            F.count(
                F.when((F.col("d") == 1) & (F.col("run") == 1), 1)
            ).alias("n_merged"),
        )
        .orderBy("g")
    )


@register_extra(
    "hopping_window_counts",
    """
    WITH b AS (
      SELECT user_id, epoch_us(ts) // 900000000 AS hop FROM events
    ),
    w AS (
      SELECT make_timestamp((hop - j.range) * 900000000) AS window_start,
             user_id
      FROM b CROSS JOIN range(4) j
    )
    SELECT window_start, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM w GROUP BY 1 ORDER BY 1
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — 1-hour windows every 15
    minutes via Spark's NATIVE F.window(slideDuration) fan-out, the
    operator Structured Streaming uses for overlapping-window aggs
    (here exercised batch-side so the 4x window assignment itself is
    hash-gated against an explicit hop-index fan-out in SQL: every
    event belongs to exactly the 4 windows starting at the preceding
    quarter-hour marks, epoch-aligned). Counts and per-window distinct
    users; the distinct adds the standard second partial-agg shuffle.
    Timestamps are NTZ in both engines, so alignment is naive-time
    exact."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "n_users"
        )
        .orderBy("window_start")
    )


@register_extra(
    "theil_sen_trend",
    """
    WITH p0 AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events WHERE event_id % 20 = 0
    ),
    p AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS x
      FROM p0
    ),
    sl AS (
      SELECT a.event_type,
             (b.y - a.y) * 1000000 // (b.x - a.x) AS s_q
      FROM p a JOIN p b
        ON b.event_type = a.event_type AND b.x > a.x
    ),
    r AS (
      SELECT event_type, s_q,
             row_number() OVER (PARTITION BY event_type ORDER BY s_q) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM sl
    )
    SELECT event_type, CAST(max(n_pairs) AS BIGINT) AS n_pairs,
           CAST(max(CASE WHEN rn = (n_pairs + 1) // 2 THEN s_q END)
                AS BIGINT) AS med_slope_q
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event type: the median of
    all pairwise slopes over the rank-indexed value series — the
    outlier-resistant alternative to least squares (grouped_trend_
    lines is the OLS sibling). Slopes are quantized to exact integers
    (dy * 1e6 with TRUNCATING division — Spark div and DuckDB // both
    truncate toward zero, so negative slopes agree) and the lower
    median is picked by rank, so the estimate is hash-exact. The
    1-in-20 sample bounds the pair set; at true scale you'd swap in
    the repeated-median or a sampled variant (the quadratic pair join
    is the textbook definition, kept verifiable here). Value cents via
    floor(value*100) — identical IEEE then floor in both engines."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p0 = ev.filter(F.col("event_id") % 20 == 0).select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    rw = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = p0.select(
        "event_type", "y", F.row_number().over(rw).cast("long").alias("x")
    )
    a = p.select("event_type", F.col("y").alias("ya"), F.col("x").alias("xa"))
    b = p.select("event_type", F.col("y").alias("yb"), F.col("x").alias("xb"))
    sl = (
        a.join(b, "event_type")
        .filter(F.col("xb") > F.col("xa"))
        .select(
            "event_type",
            F.expr("(yb - ya) * 1000000 div (xb - xa)").alias("s_q"),
        )
    )
    mw = Window.partitionBy("event_type").orderBy("s_q")
    cw = Window.partitionBy("event_type")
    r = sl.select(
        "event_type",
        "s_q",
        F.row_number().over(mw).alias("rn"),
        F.count("*").over(cw).alias("n_pairs"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n_pairs").cast("long").alias("n_pairs"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n_pairs + 1) div 2"), F.col("s_q")
                )
            )
            .cast("long")
            .alias("med_slope_q"),
        )
        .orderBy("event_type")
    )


@register_extra(
    "max_drawdown_series",
    """
    WITH s AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) - 5000 AS dy
      FROM events
    ),
    p AS (
      SELECT event_type,
             row_number() OVER w AS rn,
             sum(dy) OVER (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS pfx
      FROM s WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    d AS (
      SELECT event_type, rn, pfx,
             max(pfx) OVER (PARTITION BY event_type ORDER BY rn
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - pfx AS dd,
             pfx - min(pfx) OVER (PARTITION BY event_type ORDER BY rn
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS runup
      FROM p
    ),
    mx AS (
      SELECT event_type, max(dd) AS max_drawdown,
             max(COALESCE(runup, 0)) AS best_runup
      FROM d GROUP BY 1
    )
    SELECT m.event_type, m.max_drawdown, m.best_runup,
           CAST(min(d.rn) AS BIGINT) AS dd_at_rank
    FROM mx m JOIN d ON d.event_type = m.event_type
                    AND d.dd = m.max_drawdown
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def max_drawdown_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown + best run-up over each event type's
    cumulative cents series — the risk metric pair every quant stack
    computes, done DISTRIBUTED without Kadane's sequential scan: a
    drawdown is (running max of prefix) - prefix and the best
    contiguous-window gain is prefix - (running min of earlier
    prefixes), so BOTH reduce to prefix-sum windows over one shuffle
    on the series key (the classic scan-based reformulation of a
    sequential DP). Exact integers (cents, demeaned by the constant
    5000); earliest rank attaining the max drawdown is pinned by
    min(rn). Oracle: the identical recurrences stated as SQL windows
    — both engines must agree on every tie."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.floor(F.col("value") * 100).cast("long") - 5000).alias("dy"),
    )
    ow = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = s.select(
        "event_type",
        F.row_number().over(ow).alias("rn"),
        F.sum("dy")
        .over(ow.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("pfx"),
    )
    rw = Window.partitionBy("event_type").orderBy("rn")
    d = p.select(
        "event_type",
        "rn",
        (
            F.max("pfx").over(
                rw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("pfx")
        ).alias("dd"),
        (
            F.col("pfx")
            - F.min("pfx").over(
                rw.rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("runup"),
    )
    mx = d.groupBy("event_type").agg(
        F.max("dd").alias("max_drawdown"),
        F.max(F.coalesce("runup", F.lit(0))).alias("best_runup"),
    )
    return (
        d.join(mx, "event_type")
        .filter(F.col("dd") == F.col("max_drawdown"))
        .groupBy("event_type", "max_drawdown", "best_runup")
        .agg(F.min("rn").cast("long").alias("dd_at_rank"))
        .orderBy("event_type")
    )


@register_extra(
    "cusum_changepoint",
    """
    WITH s AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events
    ),
    p AS (
      SELECT event_type,
             row_number() OVER w AS rn,
             sum(y) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS pfx
      FROM s WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    t AS (
      SELECT event_type, CAST(max(rn) AS BIGINT) AS n,
             CAST(max(CASE WHEN rn_last THEN pfx END) AS BIGINT) AS tot
      FROM (SELECT event_type, rn, pfx,
                   rn = max(rn) OVER (PARTITION BY event_type) AS rn_last
            FROM p)
      GROUP BY 1
    ),
    c AS (
      SELECT p.event_type, p.rn,
             abs(p.pfx * t.n - p.rn * t.tot) AS cusum_n
      FROM p JOIN t USING (event_type) WHERE p.rn < t.n
    ),
    m AS (SELECT event_type, max(cusum_n) AS max_cusum_n FROM c GROUP BY 1)
    SELECT m.event_type, t.n, m.max_cusum_n,
           CAST(min(c.rn) AS BIGINT) AS cp_rank
    FROM m JOIN t USING (event_type)
    JOIN c ON c.event_type = m.event_type AND c.cusum_n = m.max_cusum_n
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the split rank
    maximizing |CUSUM_j| where CUSUM_j = prefix_j - j*mean — scaled by
    n to the EXACT integer |n*prefix_j - j*total| (no rational mean
    ever materializes, the m00-scaling trick on the time axis;
    |.| < n * total ~ 1e14 at sf0.1 << int64). This is the
    single-changepoint screen a drift monitor runs BEFORE the
    two-sample KS test (source_ks_drift) localizes the break. One
    prefix-sum window per series + a broadcast 1-row total join;
    earliest argmax rank pinned by min(rn). Oracle states the same
    scaled recurrence in SQL windows."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    ow = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = s.select(
        "event_type",
        F.row_number().over(ow).alias("rn"),
        F.sum("y")
        .over(ow.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("pfx"),
    )
    t = p.groupBy("event_type").agg(
        F.max("rn").cast("long").alias("n"),
        F.max(F.struct("rn", "pfx")).getField("pfx").alias("tot"),
    )
    c = (
        p.join(F.broadcast(t), "event_type")
        .filter(F.col("rn") < F.col("n"))
        .select(
            "event_type",
            "rn",
            "n",
            F.abs(
                F.col("pfx") * F.col("n") - F.col("rn") * F.col("tot")
            ).alias("cusum_n"),
        )
    )
    m = c.groupBy("event_type", "n").agg(
        F.max("cusum_n").alias("max_cusum_n")
    )
    return (
        c.drop("n")
        .join(m, "event_type")
        .filter(F.col("cusum_n") == F.col("max_cusum_n"))
        .groupBy("event_type", "n", "max_cusum_n")
        .agg(F.min("rn").cast("long").alias("cp_rank"))
        .orderBy("event_type")
    )


@register_extra(
    "streaming_hopping_counts",
    """
    WITH b AS (
      SELECT epoch_us(ts) // 900000000 AS hop,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT (hop - j.range) * 900 AS window_start_epoch, cents
      FROM b CROSS JOIN range(4) j
    )
    SELECT CAST(window_start_epoch AS BIGINT) AS window_start_epoch,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM w GROUP BY 1 ORDER BY 1
    """,
)
def streaming_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sliding-window aggregation (1h window, 15min hop)
    drained with Trigger.AvailableNow — gates the overlapping-window
    STATE path of Structured Streaming (each event updates 4 window
    states under the watermark), the streaming twin of the batch
    hopping_window_counts row. Aggregates are exact integers (count +
    floor-cents sum; streaming distinct is not incremental, so the
    distinct-user column stays batch-only by design). The oracle is
    the explicit hop-index fan-out — the same algebra the streaming
    state must converge to once AvailableNow drains everything."""
    import os
    import tempfile

    from ..streaming import events as se

    work = tempfile.mkdtemp(prefix="stream_hop_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    os.symlink(
        f"{sf_dir}/events.parquet", os.path.join(src, "part-0.parquet")
    )
    out = os.path.join(work, "out")
    df = se.hopping_event_counts_stream(
        spark,
        src,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )

    def _sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        df.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(out)
        .select(
            F.col("window_start").cast("long").alias("window_start_epoch"),
            "n_events",
            "value_cents",
        )
        .orderBy("window_start_epoch")
    )


# ------------------------------------------------------------ ACF


@register_extra(
    "acf_lags",
    """
    WITH b AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS h,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(h0, h1, 3600)) AS h FROM bounds
      ) g
    ),
    x AS (
      SELECT grid.event_type, grid.h,
             CAST(coalesce(b.n, 0) AS BIGINT) AS x
      FROM grid LEFT JOIN b
        ON b.event_type = grid.event_type AND b.h = grid.h
    ),
    st AS (
      SELECT event_type, count(*) AS n, sum(x) AS s FROM x GROUP BY 1
    ),
    c AS (
      SELECT x.event_type, x.h, st.n * x.x - st.s AS c
      FROM x JOIN st USING (event_type)
    ),
    led AS (
      SELECT event_type, c,
             lead(c, 1) OVER w AS c1,
             lead(c, 2) OVER w AS c2,
             lead(c, 3) OVER w AS c3
      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(c * c) AS BIGINT) AS den,
             CAST(sum(c * c1) AS BIGINT) AS num1,
             CAST(sum(c * c2) AS BIGINT) AS num2,
             CAST(sum(c * c3) AS BIGINT) AS num3
      FROM led GROUP BY 1
    )
    SELECT event_type, CAST(lag AS INT) AS lag,
           (1000000 * num) // den AS r_e6
    FROM (
      SELECT event_type, 1 AS lag, num1 AS num, den FROM agg
      UNION ALL
      SELECT event_type, 2, num2, den FROM agg
      UNION ALL
      SELECT event_type, 3, num3, den FROM agg
    )
    ORDER BY event_type, lag
    """,
)
def acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1-3 of the gap-filled hourly
    count series per event_type, in EXACT integer arithmetic: center
    by multiplying through with n (c_t = n*x_t - S, so the rational
    mean never appears), r_k = sum(c_t * c_{t+k}) / sum(c_t^2), and
    emit ppm-quantized r via one truncating division — both engines
    truncate toward zero, so the hash gate needs no float discipline
    anywhere. |c| <= n*max(x) keeps every product int64-safe at the
    bench scales. Scale shape: the dense grid is types x hours (tiny),
    partials aggregate map-side, the lead() window sorts each type's
    series once — the standard seasonality probe before a forecast
    feature pipeline."""
    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long")
            .alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("n"))
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("h"),
        )
    )
    x = grid.join(b, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("long").alias("x")
    )
    st = x.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    c = x.join(F.broadcast(st), "event_type").select(
        "event_type", "h", (F.col("n") * F.col("x") - F.col("s")).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    led = c.select(
        "event_type",
        "c",
        F.lead("c", 1).over(w).alias("c1"),
        F.lead("c", 2).over(w).alias("c2"),
        F.lead("c", 3).over(w).alias("c3"),
    )
    agg = led.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("den"),
        F.sum(F.col("c") * F.col("c1")).cast("long").alias("num1"),
        F.sum(F.col("c") * F.col("c2")).cast("long").alias("num2"),
        F.sum(F.col("c") * F.col("c3")).cast("long").alias("num3"),
    )
    out = agg.select(
        "event_type",
        F.expr(
            "stack(3, 1, num1, 2, num2, 3, num3) AS (lag, num)"
        ),
        "den",
    ).select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.expr("(1000000 * num) div den").alias("r_e6"),
    )
    return out.orderBy("event_type", "lag")


# ------------------------------------------------------------ Gorilla


@register_extra(
    "gorilla_dod_bits",
    """
    WITH t AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    d AS (
      SELECT event_type, rn, t,
             t - lag(t, 1) OVER w AS delta,
             (t - lag(t, 1) OVER w) - (lag(t, 1) OVER w - lag(t, 2) OVER w)
               AS dod
      FROM t WINDOW w AS (PARTITION BY event_type ORDER BY rn)
    ),
    bits AS (
      SELECT event_type,
             CASE WHEN rn = 1 THEN 64
                  WHEN rn = 2 THEN 14
                  WHEN dod = 0 THEN 1
                  WHEN dod BETWEEN -63 AND 64 THEN 9
                  WHEN dod BETWEEN -255 AND 256 THEN 12
                  WHEN dod BETWEEN -2047 AND 2048 THEN 16
                  ELSE 36 END AS b
      FROM d
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_ts,
           CAST(sum(b) AS BIGINT) AS total_bits,
           (1000 * CAST(sum(b) AS BIGINT)) // count(*) AS bits_per_ts_e3
    FROM bits GROUP BY 1 ORDER BY event_type
    """,
)
def gorilla_dod_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla/Facebook delta-of-delta timestamp compression sizing per
    event_type stream: sort by (ts, event_id), first stamp costs 64
    bits, the second a 14-bit delta, every later one the DoD bucket
    cost (0 -> 1 bit; [-63,64] -> 9; [-255,256] -> 12; [-2047,2048] ->
    16; else 36) — the exact variable-length scheme of the Gorilla
    paper section 4.1. Reports total bits and milli-bits-per-stamp —
    the capacity-planning number a TSDB ingest pipeline derives before
    provisioning. All integers; the only division truncates identically
    in both engines. Scale: one window sort per series key, partial
    sums map-side; no state beyond two lags."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = ev.select(
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("t"),
        F.row_number().over(w).alias("rn"),
    )
    w2 = Window.partitionBy("event_type").orderBy("rn")
    d = t.select(
        "event_type",
        "rn",
        (F.col("t") - F.lag("t", 1).over(w2)).alias("delta"),
        (
            (F.col("t") - F.lag("t", 1).over(w2))
            - (F.lag("t", 1).over(w2) - F.lag("t", 2).over(w2))
        ).alias("dod"),
    )
    bits = d.select(
        "event_type",
        F.when(F.col("rn") == 1, 64)
        .when(F.col("rn") == 2, 14)
        .when(F.col("dod") == 0, 1)
        .when(F.col("dod").between(-63, 64), 9)
        .when(F.col("dod").between(-255, 256), 12)
        .when(F.col("dod").between(-2047, 2048), 16)
        .otherwise(36)
        .alias("b"),
    )
    return (
        bits.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_ts"),
            F.sum("b").cast("long").alias("total_bits"),
        )
        .select(
            "event_type",
            "n_ts",
            "total_bits",
            F.expr("(1000 * total_bits) div n_ts").alias("bits_per_ts_e3"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ Allen relations


@register_extra(
    "allen_relation_counts",
    """
    WITH iv AS (
      SELECT o.o_custkey AS k, o.o_orderkey,
             CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS s,
             -- clamp: synthetic shipdates can precede the order date,
             -- and Allen's relations are defined only for s <= e
             greatest(CAST(floor(epoch(o.o_orderdate)) AS BIGINT),
                      CAST(floor(epoch(max(l.l_shipdate))) AS BIGINT)) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, o.o_orderdate
    ),
    seq AS (
      SELECT k, s, e,
             lead(s) OVER w AS s2, lead(e) OVER w AS e2
      FROM iv WINDOW w AS (PARTITION BY k ORDER BY s, e, o_orderkey)
    ),
    rel AS (
      SELECT CASE
               WHEN s = s2 AND e = e2 THEN 'equals'
               WHEN s = s2 AND e < e2 THEN 'starts'
               WHEN s = s2 AND e > e2 THEN 'started_by'
               WHEN e < s2 THEN 'precedes'
               WHEN e = s2 THEN 'meets'
               WHEN e < e2 THEN 'overlaps'
               WHEN e = e2 THEN 'finished_by'
               ELSE 'contains'
             END AS relation
      FROM seq WHERE s2 IS NOT NULL
    )
    SELECT relation, count(*) AS n_pairs
    FROM rel GROUP BY 1 ORDER BY relation
    """,
)
def allen_relation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra over order lifetimes: each order spans
    [orderdate, max shipdate of its lines]; consecutive intervals per
    customer (canonical (start, end, key) order, so only the 8 forward
    relations arise) are classified into Allen's relations — equals /
    starts / started_by / precedes / meets / overlaps / finished_by /
    contains — and counted. The temporal-join taxonomy every
    interval-reasoning pipeline (care episodes, network flows, session
    stitching) needs; epoch-seconds integers end to end. Scale shape:
    interval build is one partial-agg join; classification is a lead()
    window per customer — linear, no interval self-join blowup."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("maxship"))
        .select(
            F.col("o_custkey").alias("k"),
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("long").alias("s"),
            # clamp backward synthetic intervals — Allen relations are
            # defined only for s <= e (see the oracle comment)
            F.greatest(
                F.unix_timestamp("o_orderdate").cast("long"),
                F.unix_timestamp("maxship").cast("long"),
            ).alias("e"),
        )
    )
    w = Window.partitionBy("k").orderBy("s", "e", "o_orderkey")
    seq = iv.select(
        "s",
        "e",
        F.lead("s").over(w).alias("s2"),
        F.lead("e").over(w).alias("e2"),
    ).filter(F.col("s2").isNotNull())
    rel = seq.select(
        F.when(
            (F.col("s") == F.col("s2")) & (F.col("e") == F.col("e2")),
            "equals",
        )
        .when(
            (F.col("s") == F.col("s2")) & (F.col("e") < F.col("e2")),
            "starts",
        )
        .when(
            (F.col("s") == F.col("s2")) & (F.col("e") > F.col("e2")),
            "started_by",
        )
        .when(F.col("e") < F.col("s2"), "precedes")
        .when(F.col("e") == F.col("s2"), "meets")
        .when(F.col("e") < F.col("e2"), "overlaps")
        .when(F.col("e") == F.col("e2"), "finished_by")
        .otherwise("contains")
        .alias("relation")
    )
    return (
        rel.groupBy("relation")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("relation")
    )


# --------------------------------------------------- decayed score

_DECAY_CAP = 20  # cap the day-age exponent: weight = 2^(CAP - min(age, CAP))


@register_extra(
    "decay_score_topk",
    f"""
    WITH mx AS (
      SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS tmax FROM events
    ),
    s AS (
      SELECT e.event_type, e.user_id,
             CAST(floor(e.value * 100 + 0.5) AS BIGINT)
             * (1::BIGINT << ({_DECAY_CAP} - least(
                 (mx.tmax - CAST(floor(epoch(e.ts)) AS BIGINT)) // 86400,
                 {_DECAY_CAP}))) AS wscore
      FROM events e CROSS JOIN mx
    ),
    agg AS (
      SELECT event_type, user_id,
             CAST(sum(wscore) AS BIGINT) AS score
      FROM s GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, user_id, score,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY score DESC, user_id) AS rk
      FROM agg
    )
    SELECT event_type, CAST(rk AS INT) AS rk, user_id, score
    FROM r WHERE rk <= 5
    ORDER BY event_type, rk
    """,
)
def decay_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score (half-life = 1 day)
    with EXACT dyadic weights: age in whole days from the corpus max
    timestamp, weight 2^(20 - min(age, 20)) — an integer power of two,
    so the decayed sum is exact int64 (score <= cents * 2^20 * group
    size ~ 1e14) with zero float decay drift across engines; ages past
    the 20-day cap floor at weight 1 (documented cap, not underflow).
    Top-5 users per event_type by decayed score — the freshness-aware
    leaderboard feature a feature store materializes. Scale shape: one
    broadcast of the 1-row max-ts agg, map-side weight computation, one
    partial-agg shuffle, one top-k window."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(
        F.unix_timestamp(F.max("ts")).cast("long").alias("tmax")
    )
    s = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "user_id",
        (
            F.floor(F.col("value") * 100 + 0.5).cast("long")
            * F.expr(
                f"shiftleft(1L, {_DECAY_CAP} - least("
                f"(tmax - unix_timestamp(ts)) div 86400, {_DECAY_CAP}))"
            )
        ).alias("wscore"),
    )
    agg = s.groupBy("event_type", "user_id").agg(
        F.sum("wscore").cast("long").alias("score")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("score"), F.asc("user_id")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("event_type", "rk", "user_id", "score")
        .orderBy("event_type", "rk")
    )


# ---------------------------------------------------- token bucket

_TB_CAP = 5
_TB_REFILL_S = 600  # one token per 10 minutes


@register_extra(
    "token_bucket_throttle",
    f"""
    WITH RECURSIVE pos AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    st(user_id, rn, t, tokens, allowed) AS (
      SELECT user_id, rn, t, {_TB_CAP} - 1, 1
      FROM pos WHERE rn = 1
      UNION ALL
      SELECT p.user_id, p.rn, p.t,
             least({_TB_CAP}, s.tokens + (p.t - s.t) // {_TB_REFILL_S})
               - CASE WHEN least({_TB_CAP},
                   s.tokens + (p.t - s.t) // {_TB_REFILL_S}) >= 1
                 THEN 1 ELSE 0 END,
             CASE WHEN least({_TB_CAP},
                   s.tokens + (p.t - s.t) // {_TB_REFILL_S}) >= 1
                 THEN 1 ELSE 0 END
      FROM st s JOIN pos p
        ON p.user_id = s.user_id AND p.rn = s.rn + 1
    ),
    per_user AS (
      SELECT user_id, sum(allowed) AS n_allowed,
             count(*) - sum(allowed) AS n_throttled
      FROM st GROUP BY 1
    )
    SELECT user_id % 10 AS bucket,
           count(*) AS n_users,
           CAST(sum(n_allowed) AS BIGINT) AS allowed,
           CAST(sum(n_throttled) AS BIGINT) AS throttled
    FROM per_user GROUP BY 1 ORDER BY bucket
    """,
)
def token_bucket_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate limiting replayed over each user's event
    stream (capacity 5, refill 1 token / 10 min, integer refill
    (delta_t // 600), start full) — the API-abuse / scraper-detection
    audit: how much of the historical traffic WOULD have been
    throttled under a proposed limit. Inherently sequential per-key
    state, so Spark runs it as applyInPandas (state never leaves one
    task — the same shape as the gated sessionization operators); the
    oracle replays the identical recurrence as a recursive CTE chained
    on row number. Exact integers; reported per user-id bucket."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "ts", "event_id",
        F.unix_timestamp("ts").cast("long").alias("t"),
    )

    import pandas as pd

    def _tb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        tokens, prev_t, allowed = _TB_CAP, None, 0
        n = 0
        for t in pdf["t"]:
            n += 1
            if prev_t is not None:
                tokens = min(_TB_CAP, tokens + (t - prev_t) // _TB_REFILL_S)
            if tokens >= 1:
                tokens -= 1
                allowed += 1
            prev_t = t
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_allowed": [allowed],
                "n_throttled": [n - allowed],
            }
        )

    per_user = base.groupBy("user_id").applyInPandas(
        _tb, "user_id long, n_allowed long, n_throttled long"
    )
    return (
        per_user.groupBy((F.col("user_id") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_allowed").cast("long").alias("allowed"),
            F.sum("n_throttled").cast("long").alias("throttled"),
        )
        .orderBy("bucket")
    )


# -------------------------------------------- interval scheduling


@register_extra(
    "interval_scheduling_max",
    """
    WITH RECURSIVE iv AS (
      SELECT o.o_custkey AS k, o.o_orderkey AS okey,
             CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS s,
             -- clamp: synthetic shipdates can precede the order date;
             -- a scheduling interval is [s, max(s, e)] (and without the
             -- clamp, backward intervals create s >= e cycles that make
             -- the chain closure non-terminating)
             greatest(CAST(floor(epoch(o.o_orderdate)) AS BIGINT),
                      CAST(floor(epoch(max(l.l_shipdate))) AS BIGINT)) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, o.o_orderdate
    ),
    chain(k, okey, s, e, n) AS (
      SELECT k, okey, s, e, 1 FROM iv
      UNION
      -- strict (s, e, okey) progress: every compatible set sorted by
      -- this key is a valid chain, and the strict order kills the
      -- zero-length ping-pong cycles
      SELECT b.k, b.okey, b.s, b.e, c.n + 1
      FROM chain c JOIN iv b ON b.k = c.k AND b.s >= c.e
        AND (b.s > c.s OR (b.s = c.s AND
             (b.e > c.e OR (b.e = c.e AND b.okey > c.okey))))
    ),
    mx AS (SELECT k, max(n) AS max_disjoint FROM chain GROUP BY 1)
    SELECT CAST(max_disjoint AS INT) AS max_disjoint,
           count(*) AS n_customers
    FROM mx GROUP BY 1 ORDER BY max_disjoint
    """,
)
def interval_scheduling_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval scheduling maximization per customer: the largest set
    of non-overlapping order lifetimes ([orderdate, max shipdate];
    touching endpoints compatible) — the classic greedy-by-earliest-
    end problem, i.e. how many sequential engagements a key actually
    sustains. Spark runs the O(n log n) greedy per customer in
    applyInPandas (provably optimal); the oracle takes the INDEPENDENT
    route: max chain length under the s >= e partial order via a
    recursive UNION-dedup closure — greedy vs DP derivations agreeing
    is itself the correctness check. Output: histogram of the maximum
    per customer. Exact epoch-second integers."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("maxship"))
        .select(
            F.col("o_custkey").alias("k"),
            F.unix_timestamp("o_orderdate").cast("long").alias("s"),
            # clamp backward synthetic intervals to [s, max(s, e)] —
            # see the oracle comment
            F.greatest(
                F.unix_timestamp("o_orderdate").cast("long"),
                F.unix_timestamp("maxship").cast("long"),
            ).alias("e"),
        )
    )

    import pandas as pd

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        n, last_end = 0, None
        for s, e in sorted(zip(pdf["s"], pdf["e"]), key=lambda x: (x[1], x[0])):
            if last_end is None or s >= last_end:
                n += 1
                last_end = e
        return pd.DataFrame(
            {"k": [pdf["k"].iloc[0]], "max_disjoint": [n]}
        )

    mx = iv.groupBy("k").applyInPandas(
        _greedy, "k long, max_disjoint int"
    )
    return (
        mx.groupBy("max_disjoint")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("max_disjoint")
    )


# --------------------------------------------------- business days


@register_extra(
    "business_days_aging",
    """
    WITH iv AS (
      SELECT o.o_orderpriority AS priority,
             CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS d0,
             greatest(
               CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400,
               CAST(floor(epoch(max(l.l_shipdate))) AS BIGINT) // 86400)
               AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, o.o_orderkey, o.o_orderdate
    ),
    bd AS (
      SELECT priority,
             (5 * ((d1 + 3) // 7) + least((d1 + 3) % 7, 5))
           - (5 * ((d0 + 3) // 7) + least((d0 + 3) % 7, 5)) AS bizdays
      FROM iv
    )
    SELECT priority,
           count(*) AS n_orders,
           CAST(sum(bizdays) AS BIGINT) AS sum_bizdays,
           CAST(max(bizdays) AS BIGINT) AS max_bizdays
    FROM bd GROUP BY 1 ORDER BY priority
    """,
)
def business_days_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day aging (order date -> last shipment) per priority —
    the SLA metric every ops dashboard needs, in PURE INTEGER calendar
    arithmetic: day_index = epoch//86400, align m = day+3 so m%7 == 0
    is Monday (1970-01-01 was a Thursday), and weekdays-before-day is
    the closed form f(m) = 5*(m//7) + min(m%7, 5); the business-day
    span is f(end) - f(start). No engine date/dow builtins — their
    week-numbering conventions differ across engines, the epoch
    formula cannot. Backward synthetic ship intervals clamp to zero
    span. Scale shape: map-side arithmetic + one partial agg."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("maxship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.expr("unix_timestamp(o_orderdate) div 86400").alias("d0"),
            F.greatest(
                F.expr("unix_timestamp(o_orderdate) div 86400"),
                F.expr("unix_timestamp(maxship) div 86400"),
            ).alias("d1"),
        )
    )
    f0 = F.expr("5 * ((d0 + 3) div 7) + least((d0 + 3) % 7, 5L)")
    f1 = F.expr("5 * ((d1 + 3) div 7) + least((d1 + 3) % 7, 5L)")
    bd = iv.select("priority", (f1 - f0).alias("bizdays"))
    return (
        bd.groupBy("priority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("bizdays").cast("long").alias("sum_bizdays"),
            F.max("bizdays").cast("long").alias("max_bizdays"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------- isotonic PAVA

_ISO_BUCKET_S = 6 * 3600  # 6-hour buckets keep the oracle's
#                           O(n^3) hull-membership test tractable


@register_extra(
    "isotonic_fit_probes",
    f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // {_ISO_BUCKET_S} AS h,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    grid AS (
      SELECT t.event_type, g.h,
             row_number() OVER (PARTITION BY t.event_type
                                ORDER BY g.h) AS i
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h
                  FROM bounds) g
    ),
    x AS (
      SELECT grid.event_type, grid.i,
             CAST(coalesce(b.y, 0) AS BIGINT) AS y
      FROM grid LEFT JOIN b
        ON b.event_type = grid.event_type AND b.h = grid.h
    ),
    n AS (SELECT event_type, max(i) AS n FROM x GROUP BY 1),
    cum AS (
      SELECT event_type, i AS k,
             sum(y) OVER (PARTITION BY event_type ORDER BY i
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM x
      UNION ALL
      SELECT event_type, 0, 0 FROM n
    ),
    -- interior cum point m is a GCM vertex iff it lies on-or-below
    -- EVERY chord (a, b) straddling it (exact cross-multiplied test)
    nonv AS (
      SELECT DISTINCT m.event_type, m.k
      FROM cum m
      JOIN cum a ON a.event_type = m.event_type AND a.k < m.k
      JOIN cum b ON b.event_type = m.event_type AND b.k > m.k
      WHERE (m.s - a.s) * (b.k - a.k) > (b.s - a.s) * (m.k - a.k)
    ),
    verts AS (
      SELECT c.event_type, c.k, c.s
      FROM cum c LEFT JOIN nonv
        ON nonv.event_type = c.event_type AND nonv.k = c.k
      WHERE nonv.k IS NULL
    ),
    probes AS (
      SELECT event_type, n,
             unnest([(n + 3) // 4, (n + 1) // 2, (3 * n) // 4]) AS i
      FROM n
    ),
    fit AS (
      SELECT p.event_type, p.n, p.i,
             (SELECT max(v.k) FROM verts v
              WHERE v.event_type = p.event_type AND v.k < p.i) AS vp,
             (SELECT min(v.k) FROM verts v
              WHERE v.event_type = p.event_type AND v.k >= p.i) AS vn
      FROM probes p
    ),
    fv AS (
      SELECT f.event_type, f.n, f.i,
             (1000000 * (sn.s - sp.s)) // (f.vn - f.vp) AS fit_e6
      FROM fit f
      JOIN cum sp ON sp.event_type = f.event_type AND sp.k = f.vp
      JOIN cum sn ON sn.event_type = f.event_type AND sn.k = f.vn
    ),
    pools AS (
      SELECT event_type, 1 + sum(CASE WHEN step THEN 1 ELSE 0 END)
               AS n_pools
      FROM (
        SELECT event_type,
               ((s - lag(s) OVER w) * (lead(k) OVER w - k)) <>
               ((lead(s) OVER w - s) * (k - lag(k) OVER w)) AS step
        FROM verts WINDOW w AS (PARTITION BY event_type ORDER BY k)
      ) WHERE step IS NOT NULL GROUP BY 1
    )
    SELECT fv.event_type, CAST(fv.n AS BIGINT) AS n_buckets,
           CAST(pools.n_pools AS BIGINT) AS n_pools,
           CAST(fv.i AS INT) AS probe_i,
           CAST(fv.fit_e6 AS BIGINT) AS fit_e6
    FROM fv JOIN pools USING (event_type)
    ORDER BY event_type, probe_i
    """,
)
def isotonic_fit_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) regression of the 6-hourly
    count series per event_type — the calibration-curve fitter of
    ML-ops (reliability diagrams, dose-response): Spark runs the exact
    O(n) POOL-ADJACENT-VIOLATORS fold per series (integer pool sums,
    cross-multiplied average compares, merge while prev_avg >=
    cur_avg); the oracle derives the identical fit from the GREATEST
    CONVEX MINORANT characterization — the fit at i is the slope of
    the GCM of the cumulative-sum graph over the step containing i,
    with hull membership decided by exact all-chords integer tests.
    PAVA == GCM-slope is the classical duality theorem; the hash gate
    checks it. Reports pool count (distinct-slope runs) and
    ppm-quantized fit at the quartile probe positions."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.expr(f"unix_timestamp(ts) div {_ISO_BUCKET_S}").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("y"))
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    x = grid.join(b, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )

    def _pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        ys = [int(v) for v in pdf["y"]]
        pools: list[list[int]] = []  # [sum, len]
        for v in ys:
            pools.append([v, 1])
            while (
                len(pools) >= 2
                and pools[-2][0] * pools[-1][1]
                >= pools[-1][0] * pools[-2][1]
            ):
                s, ln = pools.pop()
                pools[-1][0] += s
                pools[-1][1] += ln
            # strictly increasing pool averages by construction
        n = len(ys)
        fit = []
        for s, ln in pools:
            fit.extend([(s, ln)] * ln)
        rows = []
        for i in ((n + 3) // 4, (n + 1) // 2, (3 * n) // 4):
            s, ln = fit[i - 1]
            rows.append(
                (
                    pdf["event_type"].iloc[0],
                    n,
                    len(pools),
                    i,
                    (1000000 * s) // ln,
                )
            )
        return pd.DataFrame(
            rows,
            columns=["event_type", "n_buckets", "n_pools", "probe_i",
                     "fit_e6"],
        )

    return (
        x.groupBy("event_type")
        .applyInPandas(
            _pava,
            "event_type string, n_buckets long, n_pools long,"
            " probe_i int, fit_e6 long",
        )
        .orderBy("event_type", "probe_i")
    )


# ------------------------------------------------------------ EWMA

_EWMA_W = 20  # truncated window: weight 2^(i) for the i-th newest


@register_extra(
    "ewma_forecast_probes",
    f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    grid AS (
      SELECT t.event_type, g.h,
             row_number() OVER (PARTITION BY t.event_type
                                ORDER BY g.h) AS i
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h
                  FROM bounds) g
    ),
    x AS (
      SELECT grid.event_type, grid.i,
             CAST(coalesce(b.y, 0) AS BIGINT) AS y
      FROM grid LEFT JOIN b
        ON b.event_type = grid.event_type AND b.h = grid.h
    ),
    n AS (SELECT event_type, max(i) AS n FROM x GROUP BY 1),
    probes AS (
      SELECT event_type, n,
             unnest([(n + 1) // 2, n]) AS p
      FROM n
    ),
    ew AS (
      SELECT pr.event_type, pr.n, pr.p,
             CAST(sum(x.y * (1::BIGINT <<
               CAST({_EWMA_W} - 1 - (pr.p - x.i) AS INT))) AS BIGINT)
               AS num
      FROM probes pr JOIN x
        ON x.event_type = pr.event_type
       AND x.i > pr.p - {_EWMA_W} AND x.i <= pr.p
      GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(p AS INT) AS probe_i,
           CAST((1000000 * num) // ((1::BIGINT << {_EWMA_W}) - 1)
             AS BIGINT) AS ewma_e6
    FROM ew ORDER BY event_type, probe_i
    """,
)
def ewma_forecast_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA level (alpha = 1/2) of the hourly count series per
    event_type as EXACT dyadic arithmetic: a half-life decay with a
    20-step truncated window makes every weight the integer 2^k, so
    the smoothed level is (sum y_i * 2^(W-1-age)) / (2^W - 1) — one
    ppm-quantized truncating division, no float exponentials, no
    engine drift. Probed at mid-series and at the final hour (the
    'current level' a forecaster ships). Scale shape: the window join
    is bounded (20 rows per probe); at full scale the same weights
    ride a rangeBetween window over the dense series — no sequential
    recursion despite EWMA's recursive definition, because truncation
    makes it a finite kernel."""
    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.expr("unix_timestamp(ts) div 3600").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("y"))
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    wI = Window.partitionBy("event_type").orderBy("h")
    x = (
        grid.join(b, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
        .withColumn("i", F.row_number().over(wI))
    )
    n = x.groupBy("event_type").agg(F.max("i").alias("n"))
    probes = n.select(
        "event_type",
        "n",
        F.explode(
            F.array(F.expr("(n + 1) div 2"), F.col("n").cast("long"))
        ).alias("p"),
    )
    j = probes.join(x, "event_type").filter(
        (F.col("i") > F.col("p") - _EWMA_W) & (F.col("i") <= F.col("p"))
    )
    ew = j.groupBy("event_type", "p").agg(
        F.sum(
            F.col("y")
            * F.expr(
                f"shiftleft(1L, cast({_EWMA_W} - 1 - (p - i) as int))"
            )
        )
        .cast("long")
        .alias("num")
    )
    return ew.select(
        "event_type",
        F.col("p").cast("int").alias("probe_i"),
        F.expr(f"(1000000 * num) div (shiftleft(1L, {_EWMA_W}) - 1)").alias(
            "ewma_e6"
        ),
    ).orderBy("event_type", "probe_i")


# -------------------------------------------------- seasonal index


@register_extra(
    "dow_seasonal_index",
    """
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx
      FROM events
    ),
    byday AS (
      SELECT event_type, day_idx, (day_idx + 3) % 7 AS dow,
             count(*) AS y
      FROM d GROUP BY 1, 2, 3
    ),
    per_dow AS (
      SELECT event_type, dow,
             sum(y) AS s, count(*) AS nd
      FROM byday GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(y) AS st, count(*) AS ndt
      FROM byday GROUP BY 1
    )
    SELECT p.event_type, CAST(p.dow AS INT) AS dow,
           CAST(p.s AS BIGINT) AS n_events,
           CAST((1000000 * p.s * tot.ndt) // (p.nd * tot.st) AS BIGINT)
             AS index_e6
    FROM per_dow p JOIN tot USING (event_type)
    ORDER BY event_type, dow
    """,
)
def dow_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event_type: mean daily volume on
    each weekday relative to the overall mean daily volume —
    index = (s_dow/nd_dow) / (s_all/nd_all), cross-multiplied into
    ONE exact ppm division so no rational mean ever materializes.
    Weekday comes from the pure-epoch closed form ((epoch//86400 + 3)
    % 7; 0 = Monday) — no engine dow builtins with their conflicting
    numbering conventions. The multiplicative seasonality profile a
    demand forecaster fits first. Scale shape: two partial aggs."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("day_idx"),
    )
    byday = d.groupBy(
        "event_type", "day_idx", F.expr("(day_idx + 3) % 7").alias("dow")
    ).agg(F.count("*").alias("y"))
    per_dow = byday.groupBy("event_type", "dow").agg(
        F.sum("y").alias("s"), F.count("*").alias("nd")
    )
    tot = byday.groupBy("event_type").agg(
        F.sum("y").alias("st"), F.count("*").alias("ndt")
    )
    return (
        per_dow.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("s").cast("long").alias("n_events"),
            F.expr("(1000000 * s * ndt) div (nd * st)").alias("index_e6"),
        )
        .orderBy("event_type", "dow")
    )


# --------------------------------------------- loan amortization


@register_extra(
    "loan_amortization_replay",
    """
    WITH RECURSIVE loans AS (
      SELECT event_id AS loan_id,
             100000 + ('0x' || substr(md5('amp:'
               || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 900000
               AS principal,
             25 + ('0x' || substr(md5('amr:'
               || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 175 AS r_bp,
             6 + ('0x' || substr(md5('amn:'
               || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 19 AS n
      FROM events WHERE event_id % 37 = 0
    ),
    pay AS (
      SELECT *, (principal // n) + (principal * r_bp // 10000) AS pmt
      FROM loans
    ),
    sim(loan_id, k, bal, int_sum, pmt, r_bp, n) AS (
      SELECT loan_id, 0, principal, CAST(0 AS BIGINT), pmt, r_bp, n
      FROM pay
      UNION ALL
      SELECT loan_id, k + 1,
             greatest(bal + (bal * r_bp // 10000) - pmt, 0),
             int_sum + (bal * r_bp // 10000),
             pmt, r_bp, n
      FROM sim WHERE bal > 0 AND k < 2 * n
    )
    SELECT loan_id, CAST(max(k) AS BIGINT) AS periods_paid,
           CAST(max(int_sum) AS BIGINT) AS total_interest_c
    FROM sim GROUP BY loan_id ORDER BY loan_id
    """,
)
def loan_amortization_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loan amortization replay in exact integer cents — the fintech
    ledger op where floats are a compliance bug: per period, interest
    accrues at r basis points (truncating bankers' arithmetic), a
    fixed payment is applied, and the loan closes when the balance
    hits zero. The schedule is INHERENTLY sequential (each period's
    interest depends on the running balance), so this exercises the
    per-entity fold pattern: Spark runs one F.aggregate lambda over a
    bounded period sequence — a single whole-stage-codegen expression
    per loan, no shuffle at all (embarrassingly parallel across
    loans, the right shape for a 100 TB loan book); the oracle
    replays the identical recurrence as a recursive CTE stepping all
    loans in lockstep. Payment = principal/n + first-period interest,
    which always terminates within 2n periods (asserted by the cap)."""
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

    loans = ev.filter(F.col("event_id") % 37 == 0).select(
        F.col("event_id").alias("loan_id"),
        (100000 + _h("amp:", 8) % 900000).alias("principal"),
        (25 + _h("amr:", 4) % 175).alias("r_bp"),
        (6 + _h("amn:", 4) % 19).alias("n"),
    )
    sim = loans.withColumn(
        "pmt", F.expr("(principal div n) + (principal * r_bp div 10000)")
    ).withColumn(
        "acc",
        F.expr(
            """
            aggregate(
              sequence(1L, 2 * n),
              named_struct('bal', principal, 'k', 0L, 'int_sum', 0L),
              (a, i) -> CASE WHEN a.bal > 0 THEN named_struct(
                  'bal', greatest(a.bal + (a.bal * r_bp div 10000) - pmt,
                                  0L),
                  'k', a.k + 1L,
                  'int_sum', a.int_sum + (a.bal * r_bp div 10000))
                ELSE a END)
            """
        ),
    )
    return sim.select(
        "loan_id",
        F.col("acc.k").cast("long").alias("periods_paid"),
        F.col("acc.int_sum").cast("long").alias("total_interest_c"),
    ).orderBy("loan_id")


# --------------------------------------------- auction clearing


@register_extra(
    "auction_uniform_clearing",
    """
    WITH ords AS (
      SELECT user_id % 8 AS inst,
             ('0x' || substr(md5('aucs:' || CAST(event_id AS VARCHAR)),
                             1, 4))::INT % 2 AS is_bid,
             50 + ('0x' || substr(md5('aucp:' || CAST(event_id AS VARCHAR)),
                                  1, 4))::BIGINT % 100 AS price,
             1 + ('0x' || substr(md5('aucq:' || CAST(event_id AS VARCHAR)),
                                 1, 4))::BIGINT % 50 AS qty
      FROM events WHERE event_id % 7 = 0
    ),
    cand AS (SELECT DISTINCT inst, price FROM ords),
    cum AS (
      SELECT c.inst, c.price,
             coalesce(sum(CASE WHEN o.is_bid = 1 AND o.price >= c.price
                               THEN o.qty END), 0) AS demand,
             coalesce(sum(CASE WHEN o.is_bid = 0 AND o.price <= c.price
                               THEN o.qty END), 0) AS supply
      FROM cand c JOIN ords o ON o.inst = c.inst
      GROUP BY 1, 2
    ),
    vol AS (SELECT inst, price, least(demand, supply) AS v,
                   demand, supply FROM cum),
    best AS (SELECT inst, max(v * 1000 + (999 - price)) AS enc
             FROM vol GROUP BY inst)
    SELECT b.inst, CAST(999 - (b.enc % 1000) AS BIGINT) AS clear_price,
           CAST(b.enc // 1000 AS BIGINT) AS volume,
           CAST(v.demand - v.supply AS BIGINT) AS imbalance
    FROM best b JOIN vol v ON v.inst = b.inst
                          AND v.price = 999 - (b.enc % 1000)
    ORDER BY b.inst
    """,
)
def auction_uniform_clearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-price call-auction clearing (the exchange opening/
    closing cross): per instrument, find the price maximizing matched
    volume min(demand, supply), where demand is bid quantity at or
    above p and supply is ask quantity at or below p; ties take the
    LOWEST such price; report the matched volume and the residual
    imbalance. Integer ticks and quantities, argmax packed into one
    BIGINT (volume*1000 + inverted price) so the tie-break is a plain
    max in both engines. Spark computes the supply/demand curves the
    SCALE-SHAPED way — aggregate qty per (inst, price, side), then a
    prefix-sum window for supply and a suffix-sum window for demand
    over the sorted tick ladder (one shuffle on inst, O(ticks) state)
    — while the oracle uses the quadratic candidate-join definition;
    the two formulations cross-check the cumulative identity."""
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

    ords = ev.filter(F.col("event_id") % 7 == 0).select(
        F.pmod(F.col("user_id"), F.lit(8)).alias("inst"),
        (_h("aucs:", 4).cast("int") % 2).alias("is_bid"),
        (50 + _h("aucp:", 4) % 100).alias("price"),
        (1 + _h("aucq:", 4) % 50).alias("qty"),
    )
    per_tick = ords.groupBy("inst", "price").agg(
        F.sum(F.when(F.col("is_bid") == 1, F.col("qty")).otherwise(0))
        .alias("bid_q"),
        F.sum(F.when(F.col("is_bid") == 0, F.col("qty")).otherwise(0))
        .alias("ask_q"),
    )
    w = Window.partitionBy("inst").orderBy("price")
    vol = per_tick.select(
        "inst",
        "price",
        F.sum("bid_q")
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("demand"),
        F.sum("ask_q")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("supply"),
    ).withColumn("v", F.least("demand", "supply"))
    best = vol.groupBy("inst").agg(
        F.max(F.col("v") * 1000 + (999 - F.col("price"))).alias("enc")
    )
    return (
        best.join(
            vol,
            (vol["inst"] == best["inst"])
            & (vol["price"] == 999 - (best["enc"] % 1000)),
        )
        .select(
            best["inst"],
            (999 - (F.col("enc") % 1000)).cast("long").alias("clear_price"),
            F.expr("enc div 1000").cast("long").alias("volume"),
            (F.col("demand") - F.col("supply"))
            .cast("long")
            .alias("imbalance"),
        )
        .orderBy("inst")
    )


# --------------------------------------------- LTTB downsampling


@register_extra(
    "lttb_downsample",
    """
    WITH RECURSIVE pts0 AS (
      SELECT user_id % 10 AS s, event_id,
             ('0x' || substr(md5('lv:' || event_id), 1, 5))::BIGINT % 1000
               AS y,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY event_id) - 1 AS x
      FROM events
    ),
    pts AS (SELECT s, x, y FROM pts0 WHERE x < 52),
    cands AS MATERIALIZED (
      SELECT s, CAST((x - 1) // 5 + 1 AS BIGINT) AS b,
             list({'i': (x - 1) % 5, 'x': x, 'y': y} ORDER BY x) AS cl
      FROM pts WHERE x BETWEEN 1 AND 50
      GROUP BY 1, 2
    ),
    nxt AS MATERIALIZED (
      SELECT s, b - 1 AS b, 5 AS n, sum(x) AS sx, sum(y) AS sy
      FROM (SELECT s, CAST((x - 1) // 5 + 1 AS BIGINT) AS b, x, y
            FROM pts WHERE x BETWEEN 1 AND 50) GROUP BY 1, 2
      UNION ALL
      SELECT s, 10, 1, x, y FROM pts WHERE x = 51
    ),
    sel(s, b, xp, yp) AS (
      SELECT s, CAST(0 AS BIGINT), CAST(0 AS BIGINT), y
      FROM pts WHERE x = 0
      UNION ALL
      SELECT q.s, q.b, q.bx, q.by FROM (
        SELECT st.s, c.b,
          c.cl[CAST(list_min(list_transform(c.cl, t ->
            (600000 - abs((t.x - st.xp) * (n.sy - n.n * st.yp)
                        - (n.sx - n.n * st.xp) * (t.y - st.yp))) * 8 + t.i
          )) % 8 AS INT) + 1].x AS bx,
          c.cl[CAST(list_min(list_transform(c.cl, t ->
            (600000 - abs((t.x - st.xp) * (n.sy - n.n * st.yp)
                        - (n.sx - n.n * st.xp) * (t.y - st.yp))) * 8 + t.i
          )) % 8 AS INT) + 1].y AS by
        FROM sel st
        JOIN cands c ON c.s = st.s AND c.b = st.b + 1
        JOIN nxt n ON n.s = st.s AND n.b = st.b + 1
        WHERE st.b < 10
      ) q
    ),
    lastp AS (SELECT s, CAST(51 AS BIGINT) AS x, y FROM pts WHERE x = 51)
    SELECT s, xp AS x, yp AS y FROM sel
    UNION ALL SELECT * FROM lastp
    ORDER BY s, x
    """,
)
def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling — the de-facto
    time-series decimation algorithm (Grafana/Influx) that keeps the
    points preserving visual shape: per bucket, keep the point forming
    the largest triangle with the PREVIOUSLY KEPT point and the next
    bucket's centroid (first/last points always kept). Sequential by
    construction (the previous selection feeds the next triangle), so
    this exercises the per-key fold pattern: Spark runs one
    applyInPandas per series (state never crosses a task; series fan
    out across executors), the oracle replays the identical fold as a
    recursive CTE whose argmax is a packed list_min over the bucket's
    candidate list. EXACT integers: the next-bucket centroid is kept
    as (sum, n) and the triangle area is the cross product scaled by
    2n — no fraction ever materializes; ties take the earliest point,
    packed into the same argmin on both sides. 52 points -> 12 per
    series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        F.pmod(F.col("user_id"), F.lit(10)).alias("s"),
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lv:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    5,
                ),
                16,
                10,
            ).cast("long")
            % 1000
        ).alias("y"),
    )
    w = Window.partitionBy("s").orderBy("event_id")
    pts = pts.withColumn("x", F.row_number().over(w) - 1).filter(
        F.col("x") < 52
    )

    def _lttb(key, pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("x")
        xs = pdf["x"].to_numpy(np.int64)
        ys = pdf["y"].to_numpy(np.int64)
        s = int(key[0])
        out = [(s, int(xs[0]), int(ys[0]))]
        xp, yp = int(xs[0]), int(ys[0])
        for b in range(1, 11):
            lo, hi = 5 * (b - 1) + 1, 5 * (b - 1) + 5
            cx, cy = xs[lo : hi + 1], ys[lo : hi + 1]
            if b < 10:
                nlo, nhi = 5 * b + 1, 5 * b + 5
                n = 5
                sx, sy = int(xs[nlo : nhi + 1].sum()), int(
                    ys[nlo : nhi + 1].sum()
                )
            else:
                n, sx, sy = 1, int(xs[51]), int(ys[51])
            area = np.abs(
                (cx - xp) * (sy - n * yp) - (sx - n * xp) * (cy - yp)
            )
            enc = (600000 - area) * 8 + np.arange(len(cx))
            i = int(enc.argmin())
            xp, yp = int(cx[i]), int(cy[i])
            out.append((s, xp, yp))
        out.append((s, int(xs[51]), int(ys[51])))
        return pd.DataFrame(out, columns=["s", "x", "y"])

    return (
        pts.groupBy("s")
        .applyInPandas(_lttb, "s long, x long, y long")
        .orderBy("s", "x")
    )


# ------------------------------------------------- SAX symbolization


@register_extra(
    "sax_symbol_strings",
    """
    WITH pts0 AS (
      SELECT user_id % 12 AS s,
             ('0x' || substr(md5('sax:' || CAST(event_id AS VARCHAR)),
                             1, 5))::BIGINT % 1000 AS y,
             row_number() OVER (PARTITION BY user_id % 12
                                ORDER BY event_id) - 1 AS x
      FROM events
    ),
    pts AS (SELECT s, x // 5 AS seg, y FROM pts0 WHERE x < 60),
    segs AS (
      SELECT s, seg, sum(y) AS ssum FROM pts GROUP BY 1, 2
    ),
    syms AS (
      SELECT s, seg,
             CASE WHEN ssum < 1875 THEN 'a'
                  WHEN ssum < 2500 THEN 'b'
                  WHEN ssum < 3125 THEN 'c'
                  ELSE 'd' END AS sym
      FROM segs
    ),
    sax AS (
      SELECT s, string_agg(sym, '' ORDER BY seg) AS sax FROM syms
      GROUP BY 1
    )
    SELECT s, sax,
           CAST(len(list_distinct(list_transform(
             list_filter(string_split(sax, ''), (c, i) -> i <= 10),
             (c, i) -> substr(sax, CAST(i AS INT), 3)))) AS BIGINT)
             AS n_trigrams
    FROM sax ORDER BY s
    """,
)
def sax_symbol_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) — the classic time-series
    symbolization behind motif/anomaly indexing (Lin/Keogh): PAA the
    series into fixed segments, quantize each segment mean against
    breakpoints, emit a short string that inherits the series' shape
    and lower-bounds its distance. 12 series (user_id % 12), first 60
    md5-derived points, 12 segments of 5; the quantization compares the
    exact SEGMENT SUM against pre-scaled breakpoints (1875/2500/3125 =
    5x the 375/500/625 mean cuts) so no division or float ever appears.
    Spark: one partial-agg shuffle for the segment sums, an ordered
    collect_list -> concat for the string, and the distinct-trigram
    count as pure JVM array expressions (sequence/transform/substring);
    oracle mirrors with string_agg + indexed-lambda list algebra. The
    alphabet string is what a 100 TB motif index would bucket on —
    shuffles carry 12-char strings, not the series."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        F.pmod(F.col("user_id"), F.lit(12)).alias("s"),
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("sax:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    5,
                ),
                16,
                10,
            ).cast("long")
            % 1000
        ).alias("y"),
    )
    w = Window.partitionBy("s").orderBy("event_id")
    pts = (
        pts.withColumn("x", F.row_number().over(w) - 1)
        .filter(F.col("x") < 60)
        .select("s", F.expr("x div 5").alias("seg"), "y")
    )
    segs = pts.groupBy("s", "seg").agg(F.sum("y").alias("ssum"))
    syms = segs.select(
        "s",
        "seg",
        F.when(F.col("ssum") < 1875, F.lit("a"))
        .when(F.col("ssum") < 2500, F.lit("b"))
        .when(F.col("ssum") < 3125, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("sym"),
    )
    sax = syms.groupBy("s").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda t: t["sym"],
            ),
        ).alias("sax")
    )
    return sax.select(
        "s",
        "sax",
        F.expr(
            "size(array_distinct(transform(sequence(1, 10),"
            " i -> substring(sax, i, 3))))"
        )
        .cast("long")
        .alias("n_trigrams"),
    ).orderBy("s")


# ------------------------------------------------- maximum subarray


@register_extra(
    "kadane_max_subarray",
    """
    WITH pts0 AS (
      SELECT user_id % 12 AS s,
             ('0x' || substr(md5('kd:' || CAST(event_id AS VARCHAR)),
                             1, 5))::BIGINT % 201 - 100 AS y,
             row_number() OVER (PARTITION BY user_id % 12
                                ORDER BY event_id) - 1 AS x
      FROM events
    ),
    pts AS (SELECT s, x, y FROM pts0 WHERE x < 60)
    SELECT s, max(ss) AS best_sum FROM (
      SELECT a.s, a.x AS i, b.x AS j, sum(e.y) AS ss
      FROM pts a
      JOIN pts b ON b.s = a.s AND b.x >= a.x
      JOIN pts e ON e.s = a.s AND e.x BETWEEN a.x AND b.x
      GROUP BY 1, 2, 3
    ) GROUP BY s ORDER BY s
    """,
)
def kadane_max_subarray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-subarray (Kadane) per series — the change-detection /
    burst-finding primitive ('which contiguous stretch of this metric
    gained the most'). Cross-derivation gate: Spark computes it as the
    PREFIX-SUM SWEEP (best_j = prefix_j - min(prefix_i, i<j, with the
    empty prefix 0), one window pass per series — the O(n) scan that
    range-partitions at scale), while the oracle evaluates the
    DEFINITION: every (i, j) span's sum via a 3-way self-join, max per
    series. Signed md5-derived integers (y in [-100, 100]), 60 points
    x 12 series; the quadratic stays in the oracle only."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        F.pmod(F.col("user_id"), F.lit(12)).alias("s"),
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("kd:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    5,
                ),
                16,
                10,
            ).cast("long")
            % 201
            - 100
        ).alias("y"),
    )
    w = Window.partitionBy("s").orderBy("event_id")
    pts = pts.withColumn("x", F.row_number().over(w) - 1).filter(
        F.col("x") < 60
    )
    wp = Window.partitionBy("s").orderBy("x")
    wprev = (
        Window.partitionBy("s")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        pts.withColumn("prefix", F.sum("y").over(wp))
        .withColumn(
            "m", F.least(F.lit(0), F.coalesce(F.min("prefix").over(wprev), F.lit(0)))
        )
        .withColumn("c", F.col("prefix") - F.col("m"))
    )
    return (
        cand.groupBy("s")
        .agg(F.max("c").cast("long").alias("best_sum"))
        .orderBy("s")
    )


# ----------------------------------------------- EDF schedulability


@register_extra(
    "jackson_edf_check",
    """
    WITH t0 AS (
      SELECT user_id % 10 AS s,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY event_id) - 1 AS tid,
             ('0x' || substr(md5('ec:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 9 + 1 AS c,
             ('0x' || substr(md5('ed:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 40 + 5 AS d
      FROM events
    ),
    t AS (SELECT s, tid, c, d FROM t0 WHERE tid < 12),
    ord AS (
      SELECT s, tid, c, d,
             sum(c) OVER (PARTITION BY s ORDER BY d, tid
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    viol AS (
      SELECT s, min(d * 1000 + tid) AS firstv
      FROM ord WHERE cum > d GROUP BY 1
    )
    SELECT o.s,
           CAST(sum(o.c) AS BIGINT) AS total_load,
           v.firstv IS NULL AS feasible,
           CAST(coalesce(v.firstv % 1000, -1) AS BIGINT)
             AS first_violator
    FROM ord o LEFT JOIN viol v USING (s)
    GROUP BY o.s, v.firstv ORDER BY o.s
    """,
)
def jackson_edf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDF / Jackson's-rule schedulability check — deadline-feasibility
    for a batch of jobs released together on one machine (the workload-
    admission test behind deadline-aware job schedulers): sort by
    deadline, feasible iff every prefix's cumulative work meets its
    deadline (EDF is optimal for this class, so this check is exact,
    not heuristic). One cumulative-sum window per task set + a min
    for the first violator (packed d*1000+tid so 'earliest deadline,
    lowest id' is a single integer argmin). 10 task sets x 12
    md5-derived jobs; at fleet scale the sets are the parallel axis
    and each is one ordered window pass."""
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

    w0 = Window.partitionBy("s").orderBy("event_id")
    t = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(10)).alias("s"),
            "event_id",
            (_h("ec:", 4) % 9 + 1).alias("c"),
            (_h("ed:", 4) % 40 + 5).alias("d"),
        )
        .withColumn("tid", F.row_number().over(w0) - 1)
        .filter(F.col("tid") < 12)
    )
    wc = (
        Window.partitionBy("s")
        .orderBy("d", "tid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ord_ = t.withColumn("cum", F.sum("c").over(wc))
    viol = (
        ord_.filter(F.col("cum") > F.col("d"))
        .groupBy("s")
        .agg(F.min(F.col("d") * 1000 + F.col("tid")).alias("firstv"))
    )
    return (
        ord_.groupBy("s")
        .agg(F.sum("c").alias("tl"))
        .join(viol, "s", "left")
        .select(
            "s",
            F.col("tl").cast("long").alias("total_load"),
            F.col("firstv").isNull().alias("feasible"),
            F.coalesce(F.pmod(F.col("firstv"), F.lit(1000)), F.lit(-1))
            .cast("long")
            .alias("first_violator"),
        )
        .orderBy("s")
    )


# ------------------------------------------------ LSM compaction sim


@register_extra(
    "lsm_compaction_sim",
    """
    WITH RECURSIVE shards AS (
      SELECT unnest(generate_series(0, 5)) AS s
    ),
    st(s, t, nf0, b0, s1, s2, wamp) AS (
      SELECT s, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM shards
      UNION ALL
      SELECT q.s, q.t,
             CASE WHEN q.full0 THEN 0 ELSE q.nf0a END,
             CASE WHEN q.full0 THEN 0 ELSE q.b0a END,
             CASE WHEN q.full0 AND q.s1a > 1500 THEN 0
                  WHEN q.full0 THEN q.s1a ELSE q.s1 END,
             CASE WHEN q.full0 AND q.s1a > 1500 THEN q.s2 + q.s1a
                  ELSE q.s2 END,
             q.wamp + q.g
               + CASE WHEN q.full0 THEN q.b0a + q.s1 ELSE 0 END
               + CASE WHEN q.full0 AND q.s1a > 1500
                      THEN q.s1a + q.s2 ELSE 0 END
      FROM (
        SELECT s0.*, s0.nf0 + 1 AS nf0a, s0.b0 + s0.g AS b0a,
               s0.nf0 + 1 = 4 AS full0,
               s0.s1 + s0.b0 + s0.g AS s1a
        FROM (
          SELECT st.s, st.t + 1 AS t, st.nf0, st.b0, st.s1, st.s2,
                 st.wamp,
                 ('0x' || substr(md5('lsm:' || CAST(st.s AS VARCHAR)
                    || ':' || CAST(st.t + 1 AS VARCHAR)), 1, 4))::BIGINT
                   % 90 + 10 AS g
          FROM st WHERE st.t < 50
        ) s0
      ) q
    )
    SELECT s, CAST(s1 AS BIGINT) AS l1_bytes,
           CAST(s2 AS BIGINT) AS l2_bytes,
           CAST(b0 AS BIGINT) AS l0_bytes,
           CAST(wamp AS BIGINT) AS bytes_written
    FROM (SELECT *, row_number() OVER (PARTITION BY s
                                       ORDER BY t DESC) AS rn
          FROM st) WHERE rn = 1
    ORDER BY s
    """,
)
def lsm_compaction_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leveled LSM-tree compaction replay — the write-amplification
    accounting every RocksDB/LevelDB capacity plan starts from: each
    ingest batch lands as an L0 file; 4 L0 files trigger an L0->L1
    compaction that rewrites L1 (cost = L0 bytes + existing L1), and
    L1 beyond its 1500-byte budget cascades into L2 the same way.
    bytes_written accumulates ingest + every rewrite — the
    write-amplification numerator. Pure integer state machine, 6
    shards x 50 md5-sized batches; Spark folds per shard in
    applyInPandas (a fleet sizes thousands of shards this way), the
    oracle replays identical column-state recursion. The invariant a
    reviewer can check by eye: bytes_written >= sum of ingested
    bytes, with equality only if no compaction ever fired."""
    shards = spark.range(0, 6).select(F.col("id").alias("s"))
    import hashlib

    def _mh(sstr: str) -> int:
        return int(hashlib.md5(sstr.encode()).hexdigest()[:4], 16)

    def _replay(key, pdf):
        import pandas as pd

        s = int(key[0])
        nf0 = b0 = s1 = s2 = wamp = 0
        for t in range(1, 51):
            g = _mh(f"lsm:{s}:{t}") % 90 + 10
            wamp += g
            b0 += g
            nf0 += 1
            if nf0 == 4:
                wamp += b0 + s1
                s1 += b0
                b0 = nf0 = 0
                if s1 > 1500:
                    wamp += s1 + s2
                    s2 += s1
                    s1 = 0
        return pd.DataFrame(
            [(s, s1, s2, b0, wamp)],
            columns=["s", "l1_bytes", "l2_bytes", "l0_bytes",
                     "bytes_written"],
        )

    return (
        shards.groupBy("s")
        .applyInPandas(
            _replay,
            "s long, l1_bytes long, l2_bytes long, l0_bytes long,"
            " bytes_written long",
        )
        .orderBy("s")
    )


# ------------------------------------------- CLOCK page replacement


@register_extra(
    "clock_page_replacement",
    """
    WITH RECURSIVE shards AS (
      SELECT unnest(generate_series(0, 3)) AS s
    ),
    st(s, t, fr, hand, hits, misses) AS (
      SELECT s, CAST(0 AS BIGINT),
             [{'page': CAST(-1 AS BIGINT), 'ref': CAST(0 AS BIGINT)},
              {'page': CAST(-2 AS BIGINT), 'ref': CAST(0 AS BIGINT)},
              {'page': CAST(-3 AS BIGINT), 'ref': CAST(0 AS BIGINT)},
              {'page': CAST(-4 AS BIGINT), 'ref': CAST(0 AS BIGINT)}],
             CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM shards
      UNION ALL
      SELECT s2.s, s2.t,
             CASE WHEN s2.hitk > 0 THEN
               list_transform(s2.fr, (f, i) ->
                 CASE WHEN i = s2.hitk
                      THEN {'page': f.page, 'ref': CAST(1 AS BIGINT)}
                      ELSE f END)
             ELSE
               list_transform(s2.fr, (f, i) ->
                 CASE WHEN i = s2.victim
                      THEN {'page': s2.p, 'ref': CAST(0 AS BIGINT)}
                      WHEN ((i - s2.hand + 4) % 4) + 1 < s2.vk
                      THEN {'page': f.page, 'ref': CAST(0 AS BIGINT)}
                      ELSE f END)
             END,
             CASE WHEN s2.hitk > 0 THEN s2.hand
                  ELSE (s2.victim % 4) + 1 END,
             s2.hits + CASE WHEN s2.hitk > 0 THEN 1 ELSE 0 END,
             s2.misses + CASE WHEN s2.hitk > 0 THEN 0 ELSE 1 END
      FROM (
        SELECT s1.*,
               CASE WHEN s1.vk0 = 9 THEN s1.hand
                    ELSE ((s1.hand - 1 + s1.vk0 - 1) % 4) + 1
               END AS victim,
               CASE WHEN s1.vk0 = 9 THEN CAST(9 AS BIGINT)
                    ELSE s1.vk0 END AS vk
        FROM (
          SELECT s0.*,
                 coalesce(list_min(list_filter(
                   list_transform([1, 2, 3, 4], k ->
                     CASE WHEN s0.fr[
                            ((s0.hand - 1 + k - 1) % 4) + 1].ref = 0
                          THEN CAST(k AS BIGINT) END),
                   x -> x IS NOT NULL)), 9) AS vk0,
                 coalesce(list_min(list_filter(
                   list_transform(s0.fr, (f, i) ->
                     CASE WHEN f.page = s0.p
                          THEN CAST(i AS BIGINT) END),
                   x -> x IS NOT NULL)), 0) AS hitk
          FROM (
            SELECT st.s, st.t + 1 AS t, st.fr, st.hand, st.hits,
                   st.misses,
                   least(
                     ('0x' || substr(md5('cpa:'
                        || CAST(st.s AS VARCHAR) || ':'
                        || CAST(st.t + 1 AS VARCHAR)), 1, 4))::BIGINT
                       % 12,
                     ('0x' || substr(md5('cpb:'
                        || CAST(st.s AS VARCHAR) || ':'
                        || CAST(st.t + 1 AS VARCHAR)), 1, 4))::BIGINT
                       % 12) AS p
            FROM st WHERE st.t < 120
          ) s0
        ) s1
      ) s2
    )
    SELECT s, CAST(hits AS BIGINT) AS n_hits,
           CAST(misses AS BIGINT) AS n_misses,
           CAST(list_sum(list_transform(fr, (f, i) -> f.page * i))
                AS BIGINT) AS frame_chk,
           CAST(hand AS BIGINT) AS hand
    FROM (SELECT *, row_number() OVER (PARTITION BY s
                                       ORDER BY t DESC) AS rn
          FROM st) WHERE rn = 1
    ORDER BY s
    """,
)
def clock_page_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLOCK (second-chance) page replacement replay — the buffer-pool
    eviction policy real databases and kernels run instead of true LRU
    (one ref bit + a sweeping hand, no list maintenance per hit). The
    hand sweep is folded into CLOSED FORM per miss: the victim is the
    first frame in circular hand order with ref=0 (or the hand's own
    frame after a full clearing sweep), every frame strictly before it
    gets its ref cleared, and the hand parks one past the victim —
    identical algebra on both engines, so the inner while-loop never
    appears. Skewed page stream (least of two md5 draws % 12) against
    4 frames; hits set the ref bit; inserts arrive with ref=0 (classic
    variant). 4 shards x 120 steps, per-shard applyInPandas fold vs
    recursive list machine; outputs hit/miss counts and an exact
    final-frame checksum."""
    shards = spark.range(0, 4).select(F.col("id").alias("s"))
    import hashlib

    def _mh(sstr: str) -> int:
        return int(hashlib.md5(sstr.encode()).hexdigest()[:4], 16)

    def _replay(key, pdf):
        import pandas as pd

        s = int(key[0])
        fr = [[-1 - i, 0] for i in range(4)]
        hand = 1
        hits = misses = 0
        for t in range(1, 121):
            p = min(_mh(f"cpa:{s}:{t}") % 12, _mh(f"cpb:{s}:{t}") % 12)
            hitk = next(
                (i + 1 for i, f in enumerate(fr) if f[0] == p), 0
            )
            if hitk:
                fr[hitk - 1][1] = 1
                hits += 1
            else:
                misses += 1
                vk0 = next(
                    (
                        k
                        for k in range(1, 5)
                        if fr[(hand - 1 + k - 1) % 4][1] == 0
                    ),
                    9,
                )
                victim = (
                    hand if vk0 == 9 else ((hand - 1 + vk0 - 1) % 4) + 1
                )
                for i in range(4):
                    if ((i + 1 - hand + 4) % 4) + 1 < vk0 and i + 1 != victim:
                        fr[i][1] = 0
                fr[victim - 1] = [p, 0]
                hand = (victim % 4) + 1
        chk = sum(f[0] * (i + 1) for i, f in enumerate(fr))
        return pd.DataFrame(
            [(s, hits, misses, chk, hand)],
            columns=["s", "n_hits", "n_misses", "frame_chk", "hand"],
        )

    return (
        shards.groupBy("s")
        .applyInPandas(
            _replay,
            "s long, n_hits long, n_misses long, frame_chk long,"
            " hand long",
        )
        .orderBy("s")
    )


# ---------------------------------------------------- Easter computus


@register_extra(
    "easter_computus",
    """
    WITH y AS (SELECT unnest(generate_series(2024, 2059)) AS yr),
    c AS (
      SELECT yr,
             yr % 19 AS a,
             yr // 100 AS b,
             yr % 100 AS cc,
             b // 4 AS d,
             b % 4 AS e,
             (b + 8) // 25 AS f,
             (b - f + 1) // 3 AS g,
             (19 * a + b - d - g + 15) % 30 AS h,
             cc // 4 AS i,
             cc % 4 AS k,
             (32 + 2 * e + 2 * i - h - k) % 7 AS l,
             (a + 11 * h + 22 * l) // 451 AS m
      FROM y
    )
    SELECT yr AS year,
           CAST((h + l - 7 * m + 114) // 31 AS BIGINT) AS month,
           CAST(((h + l - 7 * m + 114) % 31) + 1 AS BIGINT) AS day
    FROM c ORDER BY yr
    """,
)
def easter_computus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gregorian Easter by the anonymous Gauss computus — the
    calendrical integer algorithm behind every business-calendar /
    holiday-aware scheduling table (pairs with business_days_aging):
    golden number, century solar+lunar corrections, epact, and the
    Sunday letter, all in div/mod arithmetic that both engines execute
    exactly. Years 2024-2059; the output table is the kind of
    broadcast dimension a 100 TB pipeline joins against, generated
    in-engine rather than imported. Known anchors (2024-03-31,
    2025-04-20, 2038-04-25 — the latest Easter this century) fall out
    of the same formula and are pinned by the hash."""
    y = spark.range(2024, 2060).select(F.col("id").alias("yr"))
    c = (
        y.withColumn("a", F.expr("yr % 19"))
        .withColumn("b", F.expr("yr div 100"))
        .withColumn("cc", F.expr("yr % 100"))
        .withColumn("d", F.expr("b div 4"))
        .withColumn("e", F.expr("b % 4"))
        .withColumn("f", F.expr("(b + 8) div 25"))
        .withColumn("g", F.expr("(b - f + 1) div 3"))
        .withColumn("h", F.expr("(19 * a + b - d - g + 15) % 30"))
        .withColumn("i", F.expr("cc div 4"))
        .withColumn("k", F.expr("cc % 4"))
        .withColumn("l", F.expr("(32 + 2 * e + 2 * i - h - k) % 7"))
        .withColumn("m", F.expr("(a + 11 * h + 22 * l) div 451"))
        .withColumn("month", F.expr("(h + l - 7 * m + 114) div 31"))
        .withColumn("day", F.expr("((h + l - 7 * m + 114) % 31) + 1"))
    )
    return c.select(
        F.col("yr").alias("year"),
        F.col("month").cast("long").alias("month"),
        F.col("day").cast("long").alias("day"),
    ).orderBy("year")


# ------------------------------------------------ bitemporal as-of grid

# BITEMPORAL reconstruction — the regulatory-reporting query family
# (XBRL restatements, risk back-testing): "as of transaction time T,
# what did we BELIEVE the state at valid time V was?" Observations
# carry both a valid day and a transaction sequence; later
# transactions can restate earlier valid days (the synthetic valid
# day is deliberately DECORRELATED from the transaction sequence), so
# the answer at a
# probe (T, V) is the max-(vt, tx) observation among {tx <= T,
# vt <= V} per entity. The engine evaluates a 4x4 probe grid in one
# pass: broadcast the 16 probes, one partial-aggregated max_by per
# (probe, entity), then the per-probe rollup — the scan count is
# independent of the grid because both aggs partial-combine map-side.
_BITEMPORAL_ORACLE = """
WITH obs AS (
  SELECT user_id AS entity,
         (event_id * 131) % 30 AS vt,
         event_id AS tx,
         (event_id * 97 + 13) % 1000 AS val
  FROM events
),
bounds AS (
  SELECT max(tx) AS tmax, min(vt) AS vmin, max(vt) AS vmax FROM obs
),
probes AS (
  SELECT tk, vk,
         (SELECT tmax FROM bounds) * tk // 4 AS t_cut,
         (SELECT vmin FROM bounds)
           + ((SELECT vmax FROM bounds) - (SELECT vmin FROM bounds))
             * vk // 4 AS v_cut
  FROM (SELECT unnest(generate_series(1, 4)) AS tk) a
  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS vk) b
),
best AS (
  -- (vt, tx) folded into one scalar key: tx is globally unique and
  -- < 2^40, so vt * 2^40 + tx orders exactly like the pair
  SELECT p.tk, p.vk, o.entity,
         max_by(o.val, o.vt * 1099511627776 + o.tx) AS believed_val
  FROM probes p
  JOIN obs o ON o.tx <= p.t_cut AND o.vt <= p.v_cut
  GROUP BY p.tk, p.vk, o.entity
)
SELECT CAST(tk AS BIGINT) AS tk, CAST(vk AS BIGINT) AS vk,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(believed_val) AS BIGINT) AS sum_believed
FROM best GROUP BY tk, vk ORDER BY tk, vk
"""


@register_extra("bitemporal_asof_grid", _BITEMPORAL_ORACLE)
def bitemporal_asof_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal (valid time x transaction time) point-in-time
    reconstruction over a 4x4 probe grid — see the oracle comment for
    semantics. All arithmetic integer (value is a closed form of the
    transaction id; the probe cuts are integer floor divisions of the
    observed bounds), so the believed-state sums hash exactly."""
    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        F.col("user_id").alias("entity"),
        ((F.col("event_id") * 131) % 30).alias("vt"),
        F.col("event_id").alias("tx"),
        ((F.col("event_id") * 97 + 13) % 1000).alias("val"),
    )
    b = obs.agg(
        F.max("tx").alias("tmax"),
        F.min("vt").alias("vmin"),
        F.max("vt").alias("vmax"),
    )
    ks = spark.range(1, 5).select(F.col("id").alias("tk"))
    vs = spark.range(1, 5).select(F.col("id").alias("vk"))
    probes = (
        ks.crossJoin(vs)
        .crossJoin(F.broadcast(b))
        .select(
            "tk",
            "vk",
            F.expr("tmax * tk div 4").alias("t_cut"),
            F.expr("vmin + (vmax - vmin) * vk div 4").alias("v_cut"),
        )
    )
    best = (
        obs.join(
            F.broadcast(probes),
            (F.col("tx") <= F.col("t_cut")) & (F.col("vt") <= F.col("v_cut")),
            "inner",
        )
        .groupBy("tk", "vk", "entity")
        .agg(
            F.max_by(
                F.col("val"),
                F.col("vt") * F.lit(1099511627776) + F.col("tx"),
            ).alias("believed_val")
        )
    )
    return (
        best.groupBy("tk", "vk")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("believed_val").alias("sum_believed"),
        )
        .orderBy("tk", "vk")
    )


# --------------------------------------------------- RRULE expansion

# Calendar recurrence expansion (RFC 5545), the op every scheduling /
# booking pipeline runs: DAILY;INTERVAL=n;COUNT=k rules expand by pure
# arithmetic; WEEKLY;INTERVAL=n;BYDAY=...;COUNT=k rules take the first
# k dates >= DTSTART whose Monday-based weekday bit is in the BYDAY
# mask AND whose Monday-start week index is a multiple of INTERVAL
# from DTSTART's week (WKST=MO, the RFC default). Weekday and week
# index derive from epoch days (1970-01-05 was a Monday), so both
# engines share exact integer calendar math — the classic
# date-function cross-engine trap (dayofweek conventions) is avoided
# by never calling a weekday builtin.
_RRULE_ORACLE = """
WITH rules AS (
  SELECT o_orderkey AS rule_id,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS ed0,
         o_orderkey % 2 = 0 AS weekly,
         1 + o_orderkey % 3 AS iv,
         5 + o_orderkey % 6 AS cnt,
         1 + (o_orderkey // 7) % 127 AS mask
  FROM orders WHERE o_orderkey % 37 = 0
),
daily AS (
  SELECT rule_id, k + 1 AS seq, ed0 + iv * k AS ed
  FROM rules CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) g
  WHERE NOT weekly AND k < cnt
),
wk AS (
  SELECT rule_id, cnt, ed0 + k AS ed,
         row_number() OVER (PARTITION BY rule_id ORDER BY k) AS seq
  FROM rules CROSS JOIN (SELECT unnest(generate_series(0, 250)) AS k) g
  WHERE weekly
    AND (mask >> ((ed0 + k - 4) % 7)) & 1 = 1
    AND ((ed0 + k - 4) // 7 - (ed0 - 4) // 7) % iv = 0
),
weekly_occ AS (SELECT rule_id, seq, ed FROM wk WHERE seq <= cnt)
SELECT rule_id, CAST(seq AS BIGINT) AS seq, CAST(ed AS BIGINT) AS ed,
       DATE '1970-01-01' + CAST(ed AS INT) AS occ_date
FROM (SELECT * FROM daily UNION ALL SELECT * FROM weekly_occ)
ORDER BY rule_id, seq
"""


@register_extra("rrule_expansion", _RRULE_ORACLE)
def rrule_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 5545 recurrence expansion (see oracle comment): ~1/37 of
    orders become rules (DTSTART = order date; parity bit picks
    DAILY vs WEEKLY+BYDAY; interval 1-3; count 5-10; 7-bit BYDAY
    mask). Plan: rules explode map-side over a bounded horizon
    (<= 251 candidate days — COUNT*INTERVAL*7 <= 210 guarantees the
    horizon always contains the first k matches), one window ranks
    weekly matches per rule; at 10^9 rules this is pure fanout plus
    a rule-key window, no join anywhere."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 37 == 0)
        .select(
            F.col("o_orderkey").alias("rule_id"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("long")
            .alias("ed0"),
            (F.col("o_orderkey") % 2 == 0).alias("weekly"),
            (1 + F.col("o_orderkey") % 3).alias("iv"),
            (5 + F.col("o_orderkey") % 6).alias("cnt"),
            (1 + (F.col("o_orderkey") / 7).cast("long") % 127).alias("mask"),
        )
    )
    daily = (
        o.filter(~F.col("weekly"))
        .select(
            "*", F.explode(F.expr("sequence(0L, cnt - 1)")).alias("k")
        )
        .select(
            "rule_id",
            (F.col("k") + 1).alias("seq"),
            (F.col("ed0") + F.col("iv") * F.col("k")).alias("ed"),
        )
    )
    wkw = Window.partitionBy("rule_id").orderBy("k")
    weekly = (
        o.filter(F.col("weekly"))
        .select("*", F.explode(F.expr("sequence(0L, 250L)")).alias("k"))
        .withColumn("ed", F.col("ed0") + F.col("k"))
        .filter(
            F.expr(
                "shiftright(mask, cast((ed - 4) % 7 as int)) % 2 = 1"
                " and ((ed - 4) div 7 - (ed0 - 4) div 7) % iv = 0"
            )
        )
        .withColumn("seq", F.row_number().over(wkw))
        .filter(F.col("seq") <= F.col("cnt"))
        .select("rule_id", F.col("seq").cast("long").alias("seq"), "ed")
    )
    out = daily.unionAll(weekly)
    return out.select(
        "rule_id",
        "seq",
        "ed",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("ed").cast("int"))
        .alias("occ_date"),
    ).orderBy("rule_id", "seq")


# --------------------------------------------------- Hampel despiking

# The Hampel filter — the standard robust spike detector for sensor /
# metric streams (moving median + MAD, immune to the spikes that wreck
# mean/stddev versions): x is a spike iff |x - med7| > 3 * MAD7 over
# the +-3-row window within its user's (ts, event_id)-ordered series.
# Integer values throughout (synthetic spikes injected every 101st
# event id), LOWER median convention at even window sizes (edges), so
# both engines agree bit-for-bit with no tie-averaging.
_HAMPEL_ORACLE = """
WITH s AS (
  SELECT user_id, event_id, ts,
         (event_id * 97) % 100
         + CASE WHEN event_id % 101 = 0 THEN 400 ELSE 0 END AS x
  FROM events
),
r AS (
  SELECT *, row_number()
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM s
),
nb AS (
  SELECT a.user_id, a.event_id, a.x, b.x AS nx
  FROM r a JOIN r b ON b.user_id = a.user_id
                   AND b.rn BETWEEN a.rn - 3 AND a.rn + 3
),
med AS (
  SELECT user_id, event_id, x, nx AS med FROM (
    SELECT user_id, event_id, x, nx,
           row_number() OVER (PARTITION BY user_id, event_id
                              ORDER BY nx) AS k,
           count(*) OVER (PARTITION BY user_id, event_id) AS c
    FROM nb
  ) WHERE k = (c + 1) // 2
),
mad AS (
  SELECT user_id, event_id, dev AS mad FROM (
    SELECT nb.user_id, nb.event_id, abs(nb.nx - med.med) AS dev,
           row_number() OVER (PARTITION BY nb.user_id, nb.event_id
                              ORDER BY abs(nb.nx - med.med)) AS k,
           count(*) OVER (PARTITION BY nb.user_id, nb.event_id) AS c
    FROM nb JOIN med ON med.user_id = nb.user_id
                    AND med.event_id = nb.event_id
  ) WHERE k = (c + 1) // 2
)
SELECT CAST(med.user_id AS BIGINT) AS user_id,
       CAST(med.event_id AS BIGINT) AS event_id,
       CAST(med.x AS BIGINT) AS x,
       CAST(med.med AS BIGINT) AS med,
       CAST(mad.mad AS BIGINT) AS mad,
       abs(med.x - med.med) > 3 * mad.mad AS is_spike
FROM med JOIN mad ON mad.user_id = med.user_id
                 AND mad.event_id = med.event_id
ORDER BY user_id, event_id
"""


@register_extra("hampel_despike", _HAMPEL_ORACLE)
def hampel_despike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over per-user event series (see oracle comment).
    Plan: ONE window pass — collect_list over the +-3 row frame, then
    the median AND the MAD both come out of in-row array expressions
    (array_sort + element_at + transform), zero extra shuffles beyond
    the per-user sort the window already needs; the oracle takes the
    opposite route (neighbor self-join + two ranked passes), so the
    engines share only the definition. At 10^12 rows this is the
    sessionization shuffle shape: one exchange on user_id, frames
    never leave their partition."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        (
            (F.col("event_id") * 97) % 100
            + F.when(F.col("event_id") % 101 == 0, 400).otherwise(0)
        ).alias("x"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    arr = s.withColumn("arr", F.collect_list("x").over(w))
    med = arr.withColumn(
        "med",
        F.expr(
            "element_at(array_sort(arr),"
            " cast((size(arr) + 1) div 2 as int))"
        ),
    )
    mad = med.withColumn(
        "mad",
        F.expr(
            "element_at(array_sort(transform(arr, a -> abs(a - med))),"
            " cast((size(arr) + 1) div 2 as int))"
        ),
    )
    return mad.select(
        F.col("user_id").cast("long"),
        F.col("event_id").cast("long"),
        F.col("x").cast("long"),
        F.col("med").cast("long"),
        F.col("mad").cast("long"),
        (F.abs(F.col("x") - F.col("med")) > 3 * F.col("mad")).alias(
            "is_spike"
        ),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------- ISO week-year rollup

# ISO 8601 week numbering from scratch — the calendar trap every
# reporting pipeline hits (Jan 1 can be week 52/53 of the PREVIOUS
# iso-year, Dec 29-31 can be week 1 of the NEXT): the week containing
# the year's first Thursday is week 1, weeks start Monday. Derived
# with pure epoch-day integer arithmetic (1970-01-01 was a Thursday:
# weekday = (epochday + 3) % 7, Monday = 0; iso year = calendar year
# of the week's Thursday; week = (thursday - jan1(iso_year)) / 7 + 1)
# — no engine week-function is trusted on either side, since their
# conventions are exactly what this audits around.
_ISOWEEK_ORACLE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS dt, count(*) AS n_orders
  FROM orders GROUP BY 1
),
e AS (
  SELECT dt, n_orders,
         date_diff('day', DATE '1970-01-01', dt) AS ed
  FROM d
),
t AS (
  SELECT dt, n_orders, ed, (ed + 3) % 7 AS wd,
         ed - (ed + 3) % 7 + 3 AS thu
  FROM e
),
y AS (
  SELECT dt, n_orders, ed, wd, thu,
         year(DATE '1970-01-01' + CAST(thu AS INT)) AS iso_year
  FROM t
),
w AS (
  SELECT dt, n_orders, wd, iso_year,
         (thu - date_diff('day', DATE '1970-01-01',
                          make_date(CAST(iso_year AS INT), 1, 1))) // 7 + 1
           AS iso_week
  FROM y
)
SELECT CAST(iso_year AS INT) AS iso_year,
       CAST(iso_week AS INT) AS iso_week,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       CAST(count(*) AS INT) AS n_days,
       min(dt) AS first_day, max(dt) AS last_day
FROM w GROUP BY 1, 2 ORDER BY iso_year, iso_week
"""


@register_extra("iso_week_rollup", _ISOWEEK_ORACLE)
def iso_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders rolled up by from-scratch ISO week-year (see oracle
    comment). One distinct-date collapse (dates, not orders, drive
    every downstream op), all-integer epoch-day week derivation in
    codegen, then a (iso_year, iso_week) partial-agg rollup — the
    year-boundary rows (Jan 1 in last year's week 52/53, Dec 29-31 in
    next year's week 1) are present in the 1992-1998 order range and
    hash-fatal if either engine's derivation drifts."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("dt"))
        .agg(F.count("*").alias("n_orders"))
        .withColumn(
            "ed",
            F.datediff(F.col("dt"), F.lit("1970-01-01").cast("date")).cast(
                "long"
            ),
        )
        .withColumn("wd", (F.col("ed") + 3) % 7)
        .withColumn("thu", F.col("ed") - F.col("wd") + 3)
        .withColumn(
            "iso_year",
            F.year(
                F.date_add(
                    F.lit("1970-01-01").cast("date"), F.col("thu").cast("int")
                )
            ),
        )
        .withColumn(
            "jan1ed",
            F.datediff(
                F.make_date(F.col("iso_year"), F.lit(1), F.lit(1)),
                F.lit("1970-01-01").cast("date"),
            ).cast("long"),
        )
        .withColumn(
            "iso_week", F.expr("(thu - jan1ed) div 7 + 1")
        )
    )
    return (
        d.groupBy("iso_year", "iso_week")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.count("*").cast("int").alias("n_days"),
            F.min("dt").alias("first_day"),
            F.max("dt").alias("last_day"),
        )
        .select(
            F.col("iso_year").cast("int"),
            F.col("iso_week").cast("int"),
            "n_orders",
            "n_days",
            "first_day",
            "last_day",
        )
        .orderBy("iso_year", "iso_week")
    )


# ---------------------------------------------- day-count conventions

# Bond day-count conventions — the fixed-income calendar trap: the
# SAME date pair accrues differently under 30/360 US (months are 30
# days, with the d1/d2 end-of-month clamps) vs ACT/365F (raw day
# count). Pairs = consecutive order dates per customer (a coupon
# schedule stand-in). All integer: day components via year/month/day
# extraction, the 30/360 clamps as CASE, accrual scaled e9 by floor
# division.
_DAYCOUNT_ORACLE = """
WITH d AS (
  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS dt,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
p AS (
  SELECT a.ck, a.dt AS d1, b.dt AS d2
  FROM d a JOIN d b ON b.ck = a.ck AND b.rn = a.rn + 1
  WHERE a.dt < b.dt
),
c AS (
  SELECT ck, d1, d2,
         year(d1) AS y1, month(d1) AS m1, day(d1) AS dd1,
         year(d2) AS y2, month(d2) AS m2, day(d2) AS dd2,
         date_diff('day', d1, d2) AS act
  FROM p
),
u AS (
  SELECT ck, d1, d2, act, y1, m1, y2, m2,
         CASE WHEN dd1 = 31 THEN 30 ELSE dd1 END AS e1,
         CASE WHEN dd2 = 31 AND dd1 >= 30 THEN 30 ELSE dd2 END AS e2
  FROM c
)
SELECT CAST(ck AS BIGINT) AS custkey, d1, d2,
       CAST(act AS INT) AS act_days,
       CAST(360 * (y2 - y1) + 30 * (m2 - m1) + e2 - e1 AS INT)
         AS days_30360,
       CAST(1000000000 * (360 * (y2 - y1) + 30 * (m2 - m1) + e2 - e1)
            // 360 AS BIGINT) AS accrual_30360_e9,
       CAST(1000000000 * act // 365 AS BIGINT) AS accrual_act365_e9
FROM u ORDER BY custkey, d1
"""


@register_extra("daycount_accruals", _DAYCOUNT_ORACLE)
def daycount_accruals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30/360 US vs ACT/365F accrual over per-customer consecutive
    order-date pairs (see oracle comment). One window pass pairs the
    dates, the conventions are codegen CASE arithmetic — the
    divergence between the two columns on month-end pairs is the
    hash-gated payload."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").cast("date").alias("dt"),
        F.row_number().over(w).alias("rn"),
    )
    b = d.select(
        F.col("ck").alias("ck2"), F.col("dt").alias("d2"), F.col("rn").alias("rn2")
    )
    p = (
        d.join(b, (F.col("ck2") == F.col("ck")) & (F.col("rn2") == F.col("rn") + 1))
        .filter(F.col("dt") < F.col("d2"))
        .select(F.col("ck"), F.col("dt").alias("d1"), "d2")
    )
    c = p.select(
        "ck",
        "d1",
        "d2",
        F.year("d1").alias("y1"),
        F.month("d1").alias("m1"),
        F.dayofmonth("d1").alias("dd1"),
        F.year("d2").alias("y2"),
        F.month("d2").alias("m2"),
        F.dayofmonth("d2").alias("dd2"),
        F.datediff("d2", "d1").alias("act"),
    ).select(
        "*",
        F.when(F.col("dd1") == 31, 30).otherwise(F.col("dd1")).alias("e1"),
        F.when((F.col("dd2") == 31) & (F.col("dd1") >= 30), 30)
        .otherwise(F.col("dd2"))
        .alias("e2"),
    )
    d30 = (
        360 * (F.col("y2") - F.col("y1"))
        + 30 * (F.col("m2") - F.col("m1"))
        + F.col("e2")
        - F.col("e1")
    )
    return c.select(
        F.col("ck").cast("long").alias("custkey"),
        "d1",
        "d2",
        F.col("act").cast("int").alias("act_days"),
        d30.cast("int").alias("days_30360"),
        F.expr(
            "1000000000 * cast(360 * (y2 - y1) + 30 * (m2 - m1) + e2 - e1"
            " as bigint) div 360"
        ).alias("accrual_30360_e9"),
        F.expr("1000000000 * cast(act as bigint) div 365").alias(
            "accrual_act365_e9"
        ),
    ).orderBy("custkey", "d1")


# ------------------------------------- real-time schedulability (RTA)

_RTA_ITERS = 15


@register_extra(
    "response_time_analysis",
    f"""
    WITH RECURSIVE tasks0 AS (
      SELECT p_partkey % 60 AS grp, p_partkey AS pk,
             CAST(1 + ('0x' || substr(md5('C:' || CAST(p_partkey AS VARCHAR)),
                                      1, 5))::BIGINT % 19 AS BIGINT) AS c,
             CAST(20 + ('0x' || substr(md5('T:' || CAST(p_partkey AS VARCHAR)),
                                       1, 5))::BIGINT % 180 AS BIGINT) AS t
      FROM part
    ),
    tasks AS (
      SELECT * FROM (
        SELECT grp, pk, c, t,
               row_number() OVER (PARTITION BY grp ORDER BY t, pk) AS rk
        FROM tasks0
      ) WHERE rk <= 5
    ),
    hp AS (
      SELECT a.grp, a.rk,
             coalesce(list(struct_pack(c := b.c, t := b.t)
                           ORDER BY b.rk) FILTER (b.rk IS NOT NULL),
                      []) AS hp
      FROM tasks a LEFT JOIN tasks b
        ON b.grp = a.grp AND b.rk < a.rk
      GROUP BY a.grp, a.rk
    ),
    st(grp, rk, c, t, hp, m, r, rprev) AS (
      SELECT a.grp, a.rk, a.c, a.t, h.hp, 0, a.c, CAST(NULL AS BIGINT)
      FROM tasks a JOIN hp h ON h.grp = a.grp AND h.rk = a.rk
      UNION ALL
      SELECT grp, rk, c, t, hp, m + 1,
             c + coalesce(list_sum(list_transform(hp,
                   s -> ((r + s.t - 1) // s.t) * s.c)), 0),
             r
      FROM st WHERE m < {_RTA_ITERS}
    ),
    fin AS (
      SELECT grp, rk, c, t, r, rprev
      FROM st WHERE m = {_RTA_ITERS}
    ),
    hyper AS (
      SELECT grp,
             CASE WHEN product(t + c) <= 2 * product(t)
                  THEN 1 ELSE 0 END AS hyper_ok
      FROM tasks GROUP BY grp
    )
    SELECT CAST(f.grp AS BIGINT) AS grp, CAST(f.rk AS INT) AS prio_rank,
           f.c AS wcet, f.t AS period,
           CAST(f.r AS BIGINT) AS response_time,
           CASE WHEN f.r = f.rprev AND f.r <= f.t THEN 'ok'
                WHEN f.r > f.t THEN 'miss' ELSE 'open' END AS verdict,
           CAST(h.hyper_ok AS INT) AS hyper_ok
    FROM fin f JOIN hyper h ON h.grp = f.grp
    ORDER BY grp, prio_rank
    """,
)
def response_time_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-priority response-time analysis (Joseph & Pandya 1986) for
    rate-monotonic task sets, plus Bini's hyperbolic schedulability
    bound prod(1 + C_i/T_i) <= 2 as the exact integer inequality
    prod(T_i + C_i) <= 2*prod(T_i). Task sets derive from part (60
    groups x <=5 tasks, C in 1..19, T in 20..199, priority = smaller
    period). The RTA recurrence R <- C_i + sum_j ceil(R/T_j)*C_j over
    higher-priority tasks runs 15 exact-integer iterations — Spark as
    chained higher-order folds over the per-task interference list
    (collect_list is bounded by tasks-per-group, never data-sized),
    the oracle as a recursive CTE carrying the same list. Monotonicity
    makes the verdicts sound: 'miss' once R exceeds the deadline,
    'ok' only at a converged fixpoint, 'open' otherwise. The
    hyperbolic bound is SUFFICIENT, so hyper_ok=1 groups must be all
    'ok' — a cross-method invariant the gate hash freezes."""
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("string")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), pk).cast("binary")), 1, 5
            ),
            16,
            10,
        ).cast("long")

    t0 = p.select(
        (F.col("p_partkey") % 60).alias("grp"),
        F.col("p_partkey").alias("pk"),
        (1 + _h("C:") % 19).cast("long").alias("c"),
        (20 + _h("T:") % 180).cast("long").alias("t"),
    )
    w = Window.partitionBy("grp").orderBy("t", "pk")
    tasks = (
        t0.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .localCheckpoint(eager=False)
    )
    b = tasks.select(
        F.col("grp").alias("g2"),
        F.col("rk").alias("rk2"),
        F.col("c").alias("c2"),
        F.col("t").alias("t2"),
    )
    hp = (
        tasks.join(
            b,
            (F.col("g2") == F.col("grp")) & (F.col("rk2") < F.col("rk")),
            "left",
        )
        .groupBy("grp", "rk")
        .agg(
            F.coalesce(
                F.expr(
                    "sort_array(collect_list(CASE WHEN rk2 IS NOT NULL THEN"
                    " named_struct('rk2', rk2, 'c', c2, 't', t2) END))"
                ),
                F.expr("CAST(array() AS array<struct<rk2:int,c:bigint,t:bigint>>)"),
            ).alias("hp0")
        )
        .withColumn("hp", F.expr("transform(hp0, s -> struct(s.c AS c, s.t AS t))"))
        .drop("hp0")
    )
    cur = tasks.join(hp, ["grp", "rk"]).withColumn("r", F.col("c")).withColumn(
        "rprev", F.lit(None).cast("long")
    )
    step = (
        "c + coalesce(aggregate(hp, 0L,"
        " (a, s) -> a + ((%s + s.t - 1) div s.t) * s.c), 0L)"
    )
    for it in range(_RTA_ITERS):
        cur = cur.withColumn("rnext", F.expr(step % "r")).withColumn(
            "rprev", F.col("r")
        ).withColumn("r", F.col("rnext")).drop("rnext")
        if it % 5 == 4:
            # lineage cut: 15 stacked higher-order folds otherwise pile
            # into one Catalyst tree that analysis/janino can't chew
            # under a 1g driver (CLAUDE.md invariant)
            cur = cur.localCheckpoint(eager=True)
    hyper = tasks.groupBy("grp").agg(
        F.when(
            F.expr("aggregate(collect_list(t + c), 1L, (a, x) -> a * x)")
            <= 2 * F.expr("aggregate(collect_list(t), 1L, (a, x) -> a * x)"),
            1,
        )
        .otherwise(0)
        .alias("hyper_ok")
    )
    return (
        cur.join(hyper, "grp")
        .select(
            F.col("grp").cast("long"),
            F.col("rk").cast("int").alias("prio_rank"),
            F.col("c").alias("wcet"),
            F.col("t").alias("period"),
            F.col("r").cast("long").alias("response_time"),
            F.when(
                (F.col("r") == F.col("rprev")) & (F.col("r") <= F.col("t")), "ok"
            )
            .when(F.col("r") > F.col("t"), "miss")
            .otherwise("open")
            .alias("verdict"),
            F.col("hyper_ok").cast("int"),
        )
        .orderBy("grp", "prio_rank")
    )


# ---------------------------------------- Belady OPT vs LRU replay

_OPT_STEPS = 160


@register_extra(
    "belady_opt_replacement",
    f"""
    WITH RECURSIVE shards AS (
      SELECT unnest(generate_series(0, 3)) AS s
    ),
    trace AS MATERIALIZED (
      SELECT s, CAST(t AS BIGINT) AS t,
             least(('0x' || substr(md5('opa:' || CAST(s AS VARCHAR) || ':'
                      || CAST(t AS VARCHAR)), 1, 4))::BIGINT % 12,
                   ('0x' || substr(md5('opb:' || CAST(s AS VARCHAR) || ':'
                      || CAST(t AS VARCHAR)), 1, 4))::BIGINT % 12) AS p
      FROM shards, (SELECT unnest(generate_series(1, {_OPT_STEPS})) AS t)
    ),
    tnu AS MATERIALIZED (
      SELECT s, t, p,
             coalesce(lead(t) OVER (PARTITION BY s, p ORDER BY t),
                      9999) AS nxt
      FROM trace
    ),
    st(s, t, fro, flru, mo, ml) AS (
      SELECT s, CAST(0 AS BIGINT),
             [{{'page': CAST(-1 AS BIGINT), 'nu': CAST(9999 AS BIGINT)}},
              {{'page': CAST(-2 AS BIGINT), 'nu': CAST(9999 AS BIGINT)}},
              {{'page': CAST(-3 AS BIGINT), 'nu': CAST(9999 AS BIGINT)}},
              {{'page': CAST(-4 AS BIGINT), 'nu': CAST(9999 AS BIGINT)}}],
             [CAST(-1 AS BIGINT), CAST(-2 AS BIGINT),
              CAST(-3 AS BIGINT), CAST(-4 AS BIGINT)],
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM shards
      UNION ALL
      SELECT s2.s, s2.t,
             CASE WHEN s2.hok > 0 THEN
               list_transform(s2.fro, (f, i) ->
                 CASE WHEN i = s2.hok
                      THEN {{'page': f.page, 'nu': s2.nxt}} ELSE f END)
             ELSE
               list_transform(s2.fro, (f, i) ->
                 CASE WHEN i = s2.vk
                      THEN {{'page': s2.p, 'nu': s2.nxt}} ELSE f END)
             END,
             CASE WHEN s2.hlru
                  THEN list_prepend(s2.p,
                         list_filter(s2.flru, x -> x <> s2.p))
                  ELSE list_prepend(s2.p, s2.flru[1:3]) END,
             s2.mo + CASE WHEN s2.hok > 0 THEN 0 ELSE 1 END,
             s2.ml + CASE WHEN s2.hlru THEN 0 ELSE 1 END
      FROM (
        SELECT s1.*,
               CASE WHEN s1.freek > 0 THEN s1.freek
                    ELSE 16 - (list_max(list_transform(s1.fro,
                           (f, i) -> f.nu * 16 + (16 - i))) % 16)
               END AS vk
        FROM (
          SELECT s0.*,
                 coalesce(list_min(list_filter(
                   list_transform(s0.fro, (f, i) ->
                     CASE WHEN f.page = s0.p
                          THEN CAST(i AS BIGINT) END),
                   x -> x IS NOT NULL)), 0) AS hok,
                 coalesce(list_min(list_filter(
                   list_transform(s0.fro, (f, i) ->
                     CASE WHEN f.page < 0
                          THEN CAST(i AS BIGINT) END),
                   x -> x IS NOT NULL)), 0) AS freek,
                 list_contains(s0.flru, s0.p) AS hlru
          FROM (
            SELECT st.s, st.t + 1 AS t, st.fro, st.flru, st.mo, st.ml,
                   n.p, n.nxt
            FROM st JOIN tnu n ON n.s = st.s AND n.t = st.t + 1
            WHERE st.t < {_OPT_STEPS}
          ) s0
        ) s1
      ) s2
    )
    SELECT s, CAST({_OPT_STEPS} AS BIGINT) AS n_access,
           CAST(mo AS BIGINT) AS misses_opt,
           CAST(ml AS BIGINT) AS misses_lru,
           CAST(list_sum(list_transform(fro, (f, i) -> f.page * i))
                AS BIGINT) AS opt_frame_chk,
           CAST(CASE WHEN mo <= ml THEN 1 ELSE 0 END AS INT) AS opt_le_lru
    FROM (SELECT *, row_number() OVER (PARTITION BY s
                                       ORDER BY t DESC) AS rn
          FROM st) WHERE rn = 1
    ORDER BY s
    """,
)
def belady_opt_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Belady's OPT (MIN) page replacement — the provably optimal
    clairvoyant policy every cache study benchmarks against — replayed
    next to LRU on the same skewed md5 page stream the gated CLOCK row
    uses (4 frames, least-of-two-draws % 12, 4 shards x 160 steps).
    The 'clairvoyance' is just a relational LEAD: next-use indices are
    precomputed per (shard, page) and carried with each access, so the
    replay state machine evicts the frame with max next-use (free
    slots first, slot-index tie-break via an exact nu*16+(16-i)
    encoding). Spark runs the fold per shard in applyInPandas over the
    window-derived trace; the oracle is the identical recursive list
    machine. misses_opt <= misses_lru is hash-frozen per shard —
    OPT's optimality, visible in the gate."""
    shards = spark.range(0, 4).select(F.col("id").alias("s"))
    tr = shards.select(
        "s", F.explode(F.sequence(F.lit(1), F.lit(_OPT_STEPS))).alias("t")
    ).select(
        "s",
        F.col("t").cast("long"),
        F.least(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("opa:"),
                            F.col("s").cast("string"),
                            F.lit(":"),
                            F.col("t").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 12,
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("opb:"),
                            F.col("s").cast("string"),
                            F.lit(":"),
                            F.col("t").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 12,
        ).alias("p"),
    )
    tnu = tr.withColumn(
        "nxt",
        F.coalesce(
            F.lead("t").over(Window.partitionBy("s", "p").orderBy("t")),
            F.lit(9999),
        ),
    )

    def _replay(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("t")
        fro = [[-1 - i, 9999] for i in range(4)]
        flru = [-1, -2, -3, -4]
        mo = ml = 0
        for p, nxt in zip(pdf["p"], pdf["nxt"]):
            p, nxt = int(p), int(nxt)
            hit = next((i for i, f in enumerate(fro) if f[0] == p), -1)
            if hit >= 0:
                fro[hit][1] = nxt
            else:
                mo += 1
                free = next(
                    (i for i, f in enumerate(fro) if f[0] < 0), -1
                )
                if free >= 0:
                    fro[free] = [p, nxt]
                else:
                    enc = [f[1] * 16 + (15 - i) for i, f in enumerate(fro)]
                    vk = 15 - (max(enc) % 16)
                    fro[vk] = [p, nxt]
            if p in flru:
                flru.remove(p)
                flru.insert(0, p)
            else:
                ml += 1
                flru = [p] + flru[:3]
        return pd.DataFrame(
            {
                "s": [int(key[0])],
                "n_access": [len(pdf)],
                "misses_opt": [mo],
                "misses_lru": [ml],
                "opt_frame_chk": [
                    sum(f[0] * (i + 1) for i, f in enumerate(fro))
                ],
                "opt_le_lru": [1 if mo <= ml else 0],
            }
        )

    return (
        tnu.groupBy("s")
        .applyInPandas(
            _replay,
            "s long, n_access long, misses_opt long, misses_lru long,"
            " opt_frame_chk long, opt_le_lru int",
        )
        .orderBy("s")
    )


# ---------------------------------------------- AIMD cwnd replay


@register_extra(
    "aimd_cwnd_replay",
    """
    WITH RECURSIVE pos AS MATERIALIZED (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CASE WHEN ('0x' || substr(md5('ls:'
                    || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 8 = 0
                  THEN 1 ELSE 0 END AS loss
      FROM events
    ),
    n AS MATERIALIZED (
      SELECT user_id, max(rn) AS nr FROM pos GROUP BY 1
    ),
    st(user_id, rn, cwnd, nloss, mx, sm) AS (
      SELECT p.user_id, 1,
             CASE WHEN p.loss = 1 THEN CAST(5 AS BIGINT)
                  ELSE CAST(11 AS BIGINT) END,
             CAST(p.loss AS BIGINT),
             CASE WHEN p.loss = 1 THEN CAST(5 AS BIGINT)
                  ELSE CAST(11 AS BIGINT) END,
             CASE WHEN p.loss = 1 THEN CAST(5 AS BIGINT)
                  ELSE CAST(11 AS BIGINT) END
      FROM pos p WHERE p.rn = 1
      UNION ALL
      SELECT s.user_id, p.rn,
             CASE WHEN p.loss = 1 THEN greatest(s.cwnd // 2, 1)
                  ELSE s.cwnd + 1 END,
             s.nloss + p.loss,
             greatest(s.mx, CASE WHEN p.loss = 1
                                 THEN greatest(s.cwnd // 2, 1)
                                 ELSE s.cwnd + 1 END),
             s.sm + CASE WHEN p.loss = 1 THEN greatest(s.cwnd // 2, 1)
                         ELSE s.cwnd + 1 END
      FROM st s JOIN pos p ON p.user_id = s.user_id AND p.rn = s.rn + 1
    )
    SELECT s.user_id, CAST(n.nr AS BIGINT) AS n_rounds,
           CAST(s.nloss AS BIGINT) AS n_losses,
           CAST(s.cwnd AS BIGINT) AS final_cwnd,
           CAST(s.mx AS BIGINT) AS max_cwnd,
           CAST(s.sm AS BIGINT) AS sum_cwnd,
           CAST(10000 * s.sm // n.nr AS BIGINT) AS tput_e4
    FROM st s JOIN n ON n.user_id = s.user_id AND n.nr = s.rn
    ORDER BY s.user_id
    """,
)
def aimd_cwnd_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TCP AIMD congestion control (Chiu & Jain 1989) replayed over
    each user's event stream as RTT rounds: cwnd starts at 10 segments,
    +1 per loss-free round, floor-halved (min 1) on the md5-gated
    1-in-8 loss rounds — the sawtooth whose average-throughput law
    every congestion-control paper cites. Inherently sequential per
    flow, so Spark folds it as one zero-join higher-order aggregate
    over the per-user ordered round list (same shape as the gated
    token-bucket row); the oracle replays the identical recurrence as
    a row-chained recursive CTE. Exact integers throughout; the e4
    mean uses plain floor (all values nonnegative)."""
    ev = _t(spark, sf_dir, "events")
    rounds = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ls:"), F.col("event_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 8
            == 0,
            1,
        )
        .otherwise(0)
        .alias("loss"),
    )
    per = rounds.groupBy("user_id").agg(
        F.expr(
            "aggregate("
            " transform(array_sort(collect_list(struct(ts, event_id, loss))),"
            "           x -> x.loss),"
            " named_struct('cwnd', 10L, 'nloss', 0L, 'mx', 0L, 'sm', 0L,"
            "              'nr', 0L),"
            " (a, l) -> named_struct("
            "   'cwnd', IF(l = 1, greatest(a.cwnd div 2, 1L), a.cwnd + 1),"
            "   'nloss', a.nloss + l,"
            "   'mx', greatest(a.mx, IF(l = 1, greatest(a.cwnd div 2, 1L),"
            "                           a.cwnd + 1)),"
            "   'sm', a.sm + IF(l = 1, greatest(a.cwnd div 2, 1L),"
            "                   a.cwnd + 1),"
            "   'nr', a.nr + 1))"
        ).alias("st")
    )
    return per.select(
        "user_id",
        F.col("st.nr").cast("long").alias("n_rounds"),
        F.col("st.nloss").cast("long").alias("n_losses"),
        F.col("st.cwnd").cast("long").alias("final_cwnd"),
        F.col("st.mx").cast("long").alias("max_cwnd"),
        F.col("st.sm").cast("long").alias("sum_cwnd"),
        F.expr("CAST(10000 * st.sm div st.nr AS BIGINT)").alias("tput_e4"),
    ).orderBy("user_id")


# ------------------------------------------- crash recovery audit


@register_extra(
    "crash_recovery_audit",
    """
    WITH grp AS MATERIALIZED (
      SELECT DISTINCT s_suppkey % 30 AS sys FROM supplier
    ),
    log AS MATERIALIZED (
      SELECT sys, CAST(l.l AS BIGINT) AS lsn,
             ('0x' || substr(md5('tx:' || CAST(sys AS VARCHAR) || ':'
                || CAST(l.l AS VARCHAR)), 1, 4))::BIGINT % 6 AS txn,
             ('0x' || substr(md5('pg:' || CAST(sys AS VARCHAR) || ':'
                || CAST(l.l AS VARCHAR)), 1, 4))::BIGINT % 8 AS page,
             ('0x' || substr(md5('vl:' || CAST(sys AS VARCHAR) || ':'
                || CAST(l.l AS VARCHAR)), 1, 4))::BIGINT % 100 AS val
      FROM grp, (SELECT unnest(generate_series(1, 40)) AS l) l
    ),
    commits AS MATERIALIZED (
      SELECT sys, t.t AS txn,
             ('0x' || substr(md5('cm:' || CAST(sys AS VARCHAR) || ':'
                || CAST(t.t AS VARCHAR)), 1, 4))::BIGINT % 50 AS clsn
      FROM grp, (SELECT unnest(generate_series(0, 5)) AS t) t
    ),
    marked AS MATERIALIZED (
      SELECT l.sys, l.lsn, l.txn, l.page, l.val,
             CASE WHEN c.clsn <= 40 AND c.clsn >= l.lsn
                  THEN 1 ELSE 0 END AS winner
      FROM log l JOIN commits c ON c.sys = l.sys AND c.txn = l.txn
    ),
    pages AS (
      SELECT sys, p.p AS page FROM grp,
             (SELECT unnest(generate_series(0, 7)) AS p) p
    )
    SELECT CAST(p.sys AS BIGINT) AS sys, CAST(p.page AS INT) AS page,
           CAST(coalesce(max_by(m.val, m.lsn)
                  FILTER (m.winner = 1), 0) AS BIGINT) AS recovered_val,
           CAST(coalesce(max(m.lsn) FILTER (m.winner = 1), 0) AS BIGINT)
             AS last_winner_lsn,
           CAST(coalesce(sum(1 - m.winner), 0) AS BIGINT)
             AS n_undone_writes
    FROM pages p
    LEFT JOIN marked m ON m.sys = p.sys AND m.page = p.page
    GROUP BY p.sys, p.page
    ORDER BY sys, page
    """,
)
def crash_recovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARIES-contract crash recovery (Mohan 1992): after redo-all +
    undo-losers, every page must hold the value of its LAST write by
    a COMMITTED-before-crash transaction (a write is durable iff its
    txn's commit LSN lands at or after it and before the crash at
    LSN 40), and every loser write is undone. 30 md5 log streams x 6
    txns x 8 pages; the per-page recovered value, the last winner LSN
    and the undo count are hash-frozen. Pure windows/aggregation —
    the declarative statement of the recovery theorem rather than the
    sequential replay (the replay IS the gated applyInPandas family;
    this row freezes its contract)."""
    s = _t(spark, sf_dir, "supplier")
    sess = s.sparkSession
    grp = s.select((F.col("s_suppkey") % 30).alias("sys")).distinct()

    def _h4(prefix: str, col: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("sys").cast("string"),
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

    log = grp.crossJoin(
        sess.range(1, 41).select(F.col("id").cast("long").alias("lsn"))
    ).select(
        "sys",
        "lsn",
        (_h4("tx:", "lsn") % 6).alias("txn"),
        (_h4("pg:", "lsn") % 8).alias("page"),
        (_h4("vl:", "lsn") % 100).alias("val"),
    )
    commits = grp.crossJoin(
        sess.range(0, 6).select(F.col("id").cast("long").alias("txn"))
    ).select("sys", "txn", (_h4("cm:", "txn") % 50).alias("clsn"))
    marked = log.join(F.broadcast(commits), ["sys", "txn"]).withColumn(
        "winner",
        F.when(
            (F.col("clsn") <= 40) & (F.col("clsn") >= F.col("lsn")), 1
        ).otherwise(0),
    )
    pages = grp.crossJoin(
        sess.range(0, 8).select(F.col("id").cast("int").alias("page"))
    )
    return (
        pages.join(marked, ["sys", "page"], "left")
        .groupBy("sys", "page")
        .agg(
            F.coalesce(
                F.expr("max_by(val, IF(winner = 1, lsn, -1))").cast("long"),
                F.lit(0),
            ).alias("rv0"),
            F.coalesce(
                F.max(F.when(F.col("winner") == 1, F.col("lsn"))), F.lit(0)
            )
            .cast("long")
            .alias("last_winner_lsn"),
            F.coalesce(F.sum(1 - F.col("winner")), F.lit(0))
            .cast("long")
            .alias("n_undone_writes"),
        )
        .withColumn(
            "recovered_val",
            F.when(F.col("last_winner_lsn") > 0, F.col("rv0")).otherwise(0),
        )
        .select(
            F.col("sys").cast("long"),
            F.col("page").cast("int"),
            F.col("recovered_val").cast("long"),
            "last_winner_lsn",
            "n_undone_writes",
        )
        .orderBy("sys", "page")
    )


# ------------------------------------------- EDF demand-bound test


@register_extra(
    "edf_demand_bound",
    """
    WITH grp AS MATERIALIZED (
      SELECT DISTINCT s_suppkey % 80 AS g FROM supplier
    ),
    tasks AS MATERIALIZED (
      SELECT g, t.t AS task,
             [6, 8, 12, 24][CAST(('0x' || substr(md5('eT:'
                || CAST(g AS VARCHAR) || ':' || CAST(t.t AS VARCHAR)),
                1, 4))::BIGINT % 4 AS INT) + 1] AS period,
             1 + ('0x' || substr(md5('eC:' || CAST(g AS VARCHAR) || ':'
                || CAST(t.t AS VARCHAR)), 1, 4))::BIGINT % 4 AS c
      FROM grp, (SELECT unnest(generate_series(1, 4)) AS t) t
    ),
    tasks2 AS MATERIALIZED (
      SELECT g, task, period, c,
             c + ('0x' || substr(md5('eD:' || CAST(g AS VARCHAR) || ':'
                || CAST(task AS VARCHAR)), 1, 4))::BIGINT
                 % (period - c + 1) AS d
      FROM tasks
    ),
    util AS MATERIALIZED (
      SELECT g, sum(c * (24 // period)) AS demand24
      FROM tasks2 GROUP BY g
    ),
    pts AS MATERIALIZED (
      SELECT DISTINCT t.g, k.k * t.period + t.d AS tp
      FROM tasks2 t, (SELECT unnest(generate_series(0, 3)) AS k) k
      WHERE k.k * t.period + t.d <= 24
    ),
    dbf AS MATERIALIZED (
      SELECT p.g, p.tp,
             sum(CASE WHEN p.tp >= t.d
                 THEN ((p.tp - t.d) // t.period + 1) * t.c
                 ELSE 0 END) AS demand
      FROM pts p JOIN tasks2 t ON t.g = p.g
      GROUP BY p.g, p.tp
    ),
    verdict AS MATERIALIZED (
      SELECT d.g, min(d.tp - d.demand) AS worst_slack,
             min_by(d.tp, (d.tp - d.demand) * 100 + d.tp) AS crit_t
      FROM dbf d GROUP BY d.g
    )
    SELECT CAST(v.g AS BIGINT) AS g,
           CAST(u.demand24 AS BIGINT) AS demand_hyper,
           CAST(24 AS BIGINT) AS hyperperiod,
           CAST(v.worst_slack AS BIGINT) AS worst_slack,
           CAST(v.crit_t AS BIGINT) AS crit_t,
           CAST(CASE WHEN u.demand24 <= 24 AND v.worst_slack >= 0
                THEN 1 ELSE 0 END AS INT) AS edf_schedulable
    FROM verdict v JOIN util u ON u.g = v.g
    ORDER BY g
    """,
)
def edf_demand_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDF processor-demand criterion (Baruah-Rosier-Howell 1990):
    a synchronous constrained-deadline task set is EDF-schedulable
    iff dbf(t) = sum_i (floor((t - D_i)/T_i) + 1) C_i <= t at every
    absolute deadline t in one hyperperiod AND total demand fits the
    hyperperiod. Harmonic-friendly periods {6, 8, 12, 24} pin the
    hyperperiod at 24, so the test-point explode is exact and tiny;
    the worst slack and its critical instant are hash-frozen. The
    fixed-priority sibling is the gated response_time_analysis row —
    together they freeze both classic schedulability theories."""
    s = _t(spark, sf_dir, "supplier")
    sess = s.sparkSession
    grp = s.select((F.col("s_suppkey") % 80).alias("g")).distinct()

    def _h4(prefix: str, col: str) -> F.Column:
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

    tasks = (
        grp.crossJoin(
            sess.range(1, 5).select(F.col("id").cast("long").alias("task"))
        )
        .select(
            "g",
            "task",
            F.expr(
                "element_at(array(6L, 8L, 12L, 24L),"
                " CAST(CAST(conv(substring(md5(CAST(concat('eT:',"
                " CAST(g AS STRING), ':', CAST(task AS STRING))"
                " AS BINARY)), 1, 4), 16, 10) AS BIGINT) % 4 AS INT) + 1)"
            ).alias("period"),
            (1 + _h4("eC:", "task") % 4).alias("c"),
        )
        .withColumn(
            "d",
            F.col("c")
            + _h4("eD:", "task") % (F.col("period") - F.col("c") + 1),
        )
        .localCheckpoint(eager=True)
    )
    util = tasks.groupBy("g").agg(
        F.sum(F.col("c") * F.expr("24 div period")).alias("demand24")
    )
    ks = sess.range(0, 4).select(F.col("id").cast("long").alias("k"))
    pts = (
        tasks.crossJoin(F.broadcast(ks))
        .select("g", (F.col("k") * F.col("period") + F.col("d")).alias("tp"))
        .filter(F.col("tp") <= 24)
        .distinct()
    )
    dbf = (
        pts.join(
            tasks.select(
                F.col("g"), F.col("period").alias("tper"),
                F.col("c").alias("tc"), F.col("d").alias("td"),
            ),
            "g",
        )
        .groupBy("g", "tp")
        .agg(
            F.sum(
                F.when(
                    F.col("tp") >= F.col("td"),
                    (
                        F.expr("(tp - td) div tper") + 1
                    )
                    * F.col("tc"),
                ).otherwise(0)
            ).alias("demand")
        )
    )
    verdict = dbf.groupBy("g").agg(
        F.min(F.col("tp") - F.col("demand")).alias("worst_slack"),
        F.expr("min_by(tp, (tp - demand) * 100 + tp)").alias("crit_t"),
    )
    return (
        verdict.join(util, "g")
        .select(
            F.col("g").cast("long"),
            F.col("demand24").cast("long").alias("demand_hyper"),
            F.lit(24).cast("long").alias("hyperperiod"),
            F.col("worst_slack").cast("long"),
            F.col("crit_t").cast("long"),
            F.when(
                (F.col("demand24") <= 24) & (F.col("worst_slack") >= 0), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("edf_schedulable"),
        )
        .orderBy("g")
    )


# ------------------------------------------- SIR epidemic replay


@register_extra(
    "sir_epidemic_replay",
    """
    WITH RECURSIVE grp AS MATERIALIZED (
      SELECT DISTINCT s_suppkey % 150 AS g FROM supplier
    ),
    par AS MATERIALIZED (
      SELECT g,
             1000 + ('0x' || substr(md5('sb:' || CAST(g AS VARCHAR)),
                                    1, 4))::BIGINT % 7000 AS beta_e4,
             1000 + ('0x' || substr(md5('sg:' || CAST(g AS VARCHAR)),
                                    1, 4))::BIGINT % 3000 AS gamma_e4
      FROM grp
    ),
    st(g, t, s, i, r, peak_i, peak_t) AS (
      SELECT g, 0, CAST(9990 AS BIGINT), CAST(10 AS BIGINT),
             CAST(0 AS BIGINT), CAST(10 AS BIGINT), CAST(0 AS BIGINT)
      FROM par
      UNION ALL
      SELECT x.g, x.t + 1, x.s - ni, x.i + ni - nr, x.r + nr,
             CASE WHEN x.i + ni - nr > x.peak_i
                  THEN x.i + ni - nr ELSE x.peak_i END,
             CASE WHEN x.i + ni - nr > x.peak_i
                  THEN x.t + 1 ELSE x.peak_t END
      FROM (
        SELECT st.*, p.beta_e4, p.gamma_e4,
               least(st.s, p.beta_e4 * st.s * st.i // 100000000) AS ni,
               p.gamma_e4 * st.i // 10000 AS nr
        FROM st JOIN par p ON p.g = st.g
        WHERE st.t < 100
      ) x
    )
    SELECT CAST(st.g AS BIGINT) AS g,
           CAST(10000 * p.beta_e4 // p.gamma_e4 AS BIGINT) AS r0_e4,
           CAST(st.peak_i AS BIGINT) AS peak_infected,
           CAST(st.peak_t AS BIGINT) AS peak_day,
           CAST(st.r AS BIGINT) AS final_recovered,
           CAST(CASE WHEN st.r >= 5000 THEN 1 ELSE 0 END AS INT)
             AS major_outbreak
    FROM st JOIN par p ON p.g = st.g
    WHERE st.t = 100
    ORDER BY g
    """,
)
def sir_epidemic_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete SIR epidemic (Kermack-McKendrick 1927) in exact
    integers: N=10000, I0=10, e4 fixed-point rates, 100 daily steps
    with floored flows (new infections capped at S). The threshold
    theorem is visible in the gate rows: R0 = beta/gamma above ~1
    produces major outbreaks (attack rate > 50%), below it the
    epidemic dies out — peak size/day and the final attack rate are
    hash-frozen per parameter draw. One fold per group, map-only."""
    s = _t(spark, sf_dir, "supplier")
    grp = s.select((F.col("s_suppkey") % 150).alias("g")).distinct()

    def _h4(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix), F.col("g").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    par = grp.select(
        "g",
        (1000 + _h4("sb:") % 7000).alias("beta_e4"),
        (1000 + _h4("sg:") % 3000).alias("gamma_e4"),
    )
    fold = (
        "aggregate(sequence(1, 100),"
        " named_struct('s', 9990L, 'i', 10L, 'r', 0L,"
        "              'peak_i', 10L, 'peak_t', 0L),"
        " (a, t) -> named_struct("
        "   's', a.s - least(a.s, beta_e4 * a.s * a.i div 100000000),"
        "   'i', a.i + least(a.s, beta_e4 * a.s * a.i div 100000000)"
        "        - gamma_e4 * a.i div 10000,"
        "   'r', a.r + gamma_e4 * a.i div 10000,"
        "   'peak_i', IF(a.i + least(a.s, beta_e4 * a.s * a.i"
        "        div 100000000) - gamma_e4 * a.i div 10000 > a.peak_i,"
        "     a.i + least(a.s, beta_e4 * a.s * a.i div 100000000)"
        "        - gamma_e4 * a.i div 10000, a.peak_i),"
        "   'peak_t', IF(a.i + least(a.s, beta_e4 * a.s * a.i"
        "        div 100000000) - gamma_e4 * a.i div 10000 > a.peak_i,"
        "     CAST(t AS BIGINT), a.peak_t)))"
    )
    return (
        par.withColumn("st", F.expr(fold))
        .select(
            F.col("g").cast("long"),
            F.expr("10000 * beta_e4 div gamma_e4")
            .cast("long")
            .alias("r0_e4"),
            F.col("st.peak_i").cast("long").alias("peak_infected"),
            F.col("st.peak_t").cast("long").alias("peak_day"),
            F.col("st.r").cast("long").alias("final_recovered"),
            F.when(F.col("st.r") >= 5000, 1).otherwise(0).cast("int")
            .alias("major_outbreak"),
        )
        .orderBy("g")
    )


# ------------------------------------- conflict serializability


@register_extra(
    "conflict_serializability",
    """
    WITH RECURSIVE grp AS MATERIALIZED (
      SELECT DISTINCT s_suppkey % 35 AS h FROM supplier
    ),
    ops AS MATERIALIZED (
      SELECT h, CAST(i AS BIGINT) AS ts,
             ('0x' || substr(md5('ot:' || CAST(h AS VARCHAR) || ':'
                || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 4 AS txn,
             ('0x' || substr(md5('oi:' || CAST(h AS VARCHAR) || ':'
                || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 10 AS item,
             CASE WHEN ('0x' || substr(md5('ow:' || CAST(h AS VARCHAR)
                    || ':' || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 3 = 0
                  THEN 1 ELSE 0 END AS is_write
      FROM grp, (SELECT unnest(generate_series(1, 12)) AS i) i
      UNION ALL
      -- engineered non-serializable history: r1(x) w2(x) r2(y) w1(y)
      SELECT * FROM (VALUES
        (-1, 1, 1, 0, 0), (-1, 2, 2, 0, 1),
        (-1, 3, 2, 1, 0), (-1, 4, 1, 1, 1)
      ) v(h, ts, txn, item, is_write)
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT a.h, a.txn AS t1, b.txn AS t2
      FROM ops a
      JOIN ops b ON b.h = a.h AND b.item = a.item
       AND b.txn <> a.txn AND b.ts > a.ts
       AND (a.is_write = 1 OR b.is_write = 1)
    ),
    reach(h, t1, t2, d) AS (
      SELECT h, t1, t2, 1 FROM edges
      UNION
      SELECT r.h, r.t1, e.t2, r.d + 1
      FROM reach r JOIN edges e ON e.h = r.h AND e.t1 = r.t2
      WHERE r.d < 5
    ),
    verdict AS MATERIALIZED (
      SELECT h,
             CASE WHEN count(*) FILTER (t1 = t2) > 0 THEN 0 ELSE 1 END
               AS serializable
      FROM reach GROUP BY h
    ),
    ecnt AS MATERIALIZED (
      SELECT h, count(*) AS n_edges FROM edges GROUP BY h
    )
    SELECT CAST(g.h AS BIGINT) AS history,
           CAST(coalesce(e.n_edges, 0) AS BIGINT) AS n_conflict_edges,
           CAST(coalesce(v.serializable, 1) AS INT) AS serializable
    FROM (SELECT h FROM grp UNION ALL SELECT -1) g
    LEFT JOIN ecnt e ON e.h = g.h
    LEFT JOIN verdict v ON v.h = g.h
    ORDER BY history
    """,
)
def conflict_serializability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conflict-serializability audit (Eswaran/Gray 1976): a history
    is conflict-serializable iff its precedence graph (edges between
    txns with ordered conflicting ops on the same item) is ACYCLIC.
    35 md5 histories of 12 ops over 4 txns x 10 items (sparse
    enough that both verdicts occur), plus the
    textbook non-serializable fixture r1(x) w2(x) r2(y) w1(y) — its
    2-cycle keeps serializable frozen at 0. Cycle test = bounded
    transitive closure (4 txns -> depth 5) checking self-reachability.
    Complements the gated write_skew_pairs row (which freezes the SI
    anomaly this test would reject)."""
    s = _t(spark, sf_dir, "supplier")
    sess = s.sparkSession
    grp = s.select((F.col("s_suppkey") % 35).alias("h")).distinct()

    def _h4(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.col("h").cast("string"),
                        F.lit(":"),
                        F.col("ts").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")

    ops = (
        grp.crossJoin(
            sess.range(1, 13).select(F.col("id").cast("long").alias("ts"))
        )
        .select(
            "h",
            "ts",
            (_h4("ot:") % 4).alias("txn"),
            (_h4("oi:") % 10).alias("item"),
            F.when(_h4("ow:") % 3 == 0, 1).otherwise(0).alias("is_write"),
        )
        .unionByName(
            sess.createDataFrame(
                [
                    (-1, 1, 1, 0, 0), (-1, 2, 2, 0, 1),
                    (-1, 3, 2, 1, 0), (-1, 4, 1, 1, 1),
                ],
                "h long, ts long, txn long, item long, is_write int",
            )
        )
        .localCheckpoint(eager=True)
    )
    b = ops.select(
        F.col("h").alias("h2"), F.col("ts").alias("ts2"),
        F.col("txn").alias("txn2"), F.col("item").alias("item2"),
        F.col("is_write").alias("w2"),
    )
    edges = (
        ops.join(
            b,
            (F.col("h2") == F.col("h"))
            & (F.col("item2") == F.col("item"))
            & (F.col("txn2") != F.col("txn"))
            & (F.col("ts2") > F.col("ts"))
            & ((F.col("is_write") == 1) | (F.col("w2") == 1)),
        )
        .select("h", F.col("txn").alias("t1"), F.col("txn2").alias("t2"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reach = edges
    for _ in range(4):
        nxt = reach.alias("r").join(
            edges.alias("e"),
            (F.col("e.h") == F.col("r.h")) & (F.col("e.t1") == F.col("r.t2")),
        ).select(
            F.col("r.h").alias("h"),
            F.col("r.t1").alias("t1"),
            F.col("e.t2").alias("t2"),
        )
        reach = reach.unionByName(nxt).distinct().localCheckpoint(eager=True)
    verdict = reach.groupBy("h").agg(
        F.when(
            F.sum(F.when(F.col("t1") == F.col("t2"), 1).otherwise(0)) > 0, 0
        )
        .otherwise(1)
        .alias("serializable")
    )
    ecnt = edges.groupBy("h").agg(F.count(F.lit(1)).alias("n_edges"))
    hist = grp.unionByName(
        sess.createDataFrame([(-1,)], "h long")
    )
    return (
        hist.join(F.broadcast(ecnt), "h", "left")
        .join(F.broadcast(verdict), "h", "left")
        .select(
            F.col("h").cast("long").alias("history"),
            F.coalesce("n_edges", F.lit(0)).cast("long")
            .alias("n_conflict_edges"),
            F.coalesce("serializable", F.lit(1)).cast("int")
            .alias("serializable"),
        )
        .orderBy("history")
    )
