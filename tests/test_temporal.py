"""Plan-shape + semantics guards for the temporal operator family
(queries/temporal_queries.py). Value parity vs DuckDB is covered by
tests/test_oracle_parity.py; these tests pin the PHYSICAL shape the
docstrings promise — the whole point of the bucketed/union forms is
what they avoid (nested-loop joins, extra shuffles, distinct jobs).
"""

import datetime as dt

from pyspark.sql import Row, Window, functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    from osm2vdv462_spark.queries.temporal_queries import range_join_windows

    plan = _plan(range_join_windows(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # candidate generation must be a hash-able equi join on (user, bucket)
    assert "Join" in plan


def test_asof_join_single_exchange(spark, sf_dir):
    from osm2vdv462_spark.queries.temporal_queries import asof_join_state

    plan = _plan(asof_join_state(spark, sf_dir))
    assert "Join" not in plan  # union + window form: no join operator at all
    # one Exchange for the state dedup agg + one for the window sort is the
    # ceiling; the probe side must not add its own third repartition
    assert plan.count("Exchange hashpartitioning") <= 2


def test_pivot_pinned_values_runs_no_distinct_job(spark, sf_dir):
    from osm2vdv462_spark.queries.temporal_queries import pivot_order_matrix

    # Pinned pivot values: building the plan must not trigger the eager
    # distinct() value-discovery job an unpinned pivot() runs over the
    # fact table. The parquet read itself may schedule listing jobs, so
    # measure the DELTA of each variant against the shared read.
    # count jobs inside a DEDICATED job group: under the shared suite
    # session, unrelated async jobs (checkpoint GC, AQE probes from
    # neighbouring tests) otherwise race the delta and flake it
    tracker = spark.sparkContext.statusTracker()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sc = spark.sparkContext

    def jobs(group: str) -> int:
        return len(tracker.getJobIdsForGroup(group) or [])

    sc.setJobGroup("pivot_probe_pinned", "pinned pivot laziness probe")
    try:
        pinned = o.groupBy("o_orderpriority").pivot(
            "o_orderstatus", ["O", "F", "P"]
        ).agg(F.count(F.lit(1)))
        pinned_delta = jobs("pivot_probe_pinned")
    finally:
        sc.setJobGroup("pivot_probe_unpinned", "unpinned pivot probe")
    try:
        o.groupBy("o_orderpriority").pivot("o_orderstatus").agg(
            F.count(F.lit(1))
        )
        unpinned_delta = jobs("pivot_probe_unpinned")
    finally:
        sc.setJobGroup("", "")

    assert pinned_delta == 0, "pivot() with pinned values must stay lazy"
    assert unpinned_delta >= 1, "unpinned pivot() should eagerly discover values"
    assert "Exchange" in _plan(pivot_order_matrix(spark, sf_dir))


def test_asof_inclusive_boundary_and_tie():
    """An event that IS a state change matches itself (>= boundary), and
    a probe older than every state row gets NULL — the ASOF LEFT
    semantics DuckDB implements natively."""
    from osm2vdv462_spark.session import get_spark

    spark = get_spark("tests", cores=4)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, sec, typ, val):
        return Row(
            event_id=eid,
            ts=t0 + dt.timedelta(seconds=sec),
            user_id=1,
            event_type=typ,
            value=float(val),
            props="{}",
        )

    rows = [
        ev(1, 0, "click", 1.0),  # before any view -> NULL
        ev(2, 10, "view", 5.0),  # self-match -> 5.0
        ev(3, 10, "click", 2.0),  # tie with the view at t=10 -> 5.0
        ev(4, 20, "view", 7.0),
        ev(5, 30, "click", 3.0),  # latest prior view -> 7.0
    ]
    df = spark.createDataFrame(rows)
    state = (
        df.filter(F.col("event_type") == "view")
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
    probes = df.select(
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
    got = {
        r["event_id"]: r["last_view_value"]
        for r in probes.unionByName(state)
        .withColumn("last_view_value", F.last("state_val", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .collect()
    }
    assert got == {1: None, 2: 5.0, 3: 5.0, 4: 7.0, 5: 7.0}


def test_randomized_ties_vs_bruteforce(spark):
    """Seeded random events with DELIBERATE timestamp collisions (50
    distinct seconds across 400 events) — the as-of union-window form
    and the bucketed range join must both match an O(n^2) Python
    reference, including inclusive boundaries and ties. The range join
    runs with a TIGHT 7-second bucket == gap so bucket-boundary cases
    are hit constantly (the gate query's 600 s never stresses them)."""
    import numpy as np

    rng = np.random.default_rng(42)
    t0 = dt.datetime(2024, 1, 1)
    types = ["view", "click", "error"]
    rows = [
        Row(
            event_id=i,
            ts=t0 + dt.timedelta(seconds=int(rng.integers(0, 50))),
            user_id=int(rng.integers(0, 5)),
            event_type=types[int(rng.integers(0, 3))],
            value=float(rng.integers(0, 100)),
            props="{}",
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)

    # ---- as-of: union + last(ignore_nulls) window ----
    state = (
        df.filter(F.col("event_type") == "view")
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
    probes = df.select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("double").alias("state_val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got_asof = {
        r["event_id"]: r["v"]
        for r in probes.unionByName(state)
        .withColumn("v", F.last("state_val", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .collect()
    }
    # brute force
    st_rows = {}
    for r in rows:
        if r.event_type == "view":
            k = (r.user_id, r.ts)
            st_rows[k] = max(st_rows.get(k, -1.0), r.value)
    for r in rows:
        cands = [
            (ts, v) for (u, ts), v in st_rows.items()
            if u == r.user_id and ts <= r.ts
        ]
        want = max(cands)[1] if cands else None
        assert got_asof[r.event_id] == want, r.event_id

    # ---- range join: 7 s buckets == 7 s gap ----
    B = 7
    err = df.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("ets"),
        F.explode(
            F.array(
                F.floor(F.unix_timestamp("ts") / B),
                F.floor(F.unix_timestamp("ts") / B) + 1,
            )
        ).alias("bucket"),
    )
    clk = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.floor(F.unix_timestamp("ts") / B).alias("cb"),
    )
    cond = (
        (err.user_id == clk.cu)
        & (err.bucket == clk.cb)
        & (clk.cts >= err.ets)
        & (clk.cts < err.ets + F.expr(f"INTERVAL {B} SECONDS"))
    )
    got_rj = {
        r["error_id"]: r["n"]
        for r in err.join(clk, cond, "left")
        .groupBy("error_id")
        .agg(F.count("click_id").alias("n"))
        .collect()
    }
    for r in rows:
        if r.event_type != "error":
            continue
        want = sum(
            1
            for c in rows
            if c.event_type == "click"
            and c.user_id == r.user_id
            and r.ts <= c.ts < r.ts + dt.timedelta(seconds=B)
        )
        assert got_rj[r.event_id] == want, r.event_id


class TestFunnel:
    def test_order_violations_excluded(self, spark):
        """A user who views BEFORE signing up must not count for step 2;
        a purchase between signup and view must not count for step 3."""
        import datetime as dt

        from osm2vdv462_spark.queries.temporal_queries import funnel_steps

        t0 = dt.datetime(2024, 1, 1)

        def ev(eid, uid, typ, hours):
            return (eid, t0 + dt.timedelta(hours=hours), uid, typ, 0.0, "p")

        rows = [
            # u1: clean chain signup(1) -> view(2) -> purchase(3)
            ev(1, 1, "signup", 1), ev(2, 1, "view", 2), ev(3, 1, "purchase", 3),
            # u2: view before signup, none after -> stops at step 1
            ev(4, 2, "view", 1), ev(5, 2, "signup", 2),
            # u3: purchase BETWEEN signup and view -> reaches step 2 (the
            # view at h3 is after signup) but NOT step 3 (no purchase
            # at/after the qualifying view)
            ev(6, 3, "signup", 1), ev(7, 3, "purchase", 2), ev(8, 3, "view", 3),
            # u4: no signup at all -> counts nowhere
            ev(9, 4, "view", 1), ev(10, 4, "purchase", 2),
            # u5: simultaneous signup+view (inclusive >= boundary) then purchase
            ev(11, 5, "signup", 1), ev(12, 5, "view", 1), ev(13, 5, "purchase", 2),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        import tempfile

        d = tempfile.mkdtemp(prefix="funnel_t_")
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {r.step: r.n_users for r in funnel_steps(spark, d).collect()}
        assert got == {1: 4, 2: 3, 3: 2}
