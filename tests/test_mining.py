"""Mining family (queries/mining_queries.py): hand-built fixtures for
A-Priori frequent pairs and SCD type-2. Cross-engine value parity is
covered by tests/test_oracle_parity.py."""

import datetime as dt
import tempfile


def _write_events(spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="mining_t_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_frequent_pairs_planted(spark):
    """6 users; (a,b) co-occurs for 4 of them (>= minsup ceil(6/3)=2 is
    too permissive, so plant a selective world: items c..h are
    singletons so no other PAIR reaches support 2 except the planted
    ones)."""
    from osm2vdv462_spark.queries.mining_queries import frequent_item_pairs

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b", "d"],
        3: ["a", "b", "e"],
        4: ["a", "b", "f"],
        5: ["a", "g"],
        6: ["b", "h"],
    }
    for uid, items in baskets.items():
        for it in items:
            rows.append((eid, t0, uid, "view", 0.0, it))
            eid += 1
    d = _write_events(spark, rows)
    got = {
        (r.item_a, r.item_b): r.n_users
        for r in frequent_item_pairs(spark, d).collect()
    }
    # minsup = ceil(6/3) = 2; frequent-1 = {a(5), b(5)}; the singleton
    # items never enter pair generation, so ONLY (a,b) can qualify
    assert got == {("a", "b"): 4}


def test_scd2_collapses_noops_and_flags_current(spark):
    from osm2vdv462_spark.queries.mining_queries import scd2_user_context

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, hours, attr):
        return (eid, t0 + dt.timedelta(hours=hours), uid, "signup", 0.0, attr)

    rows = [
        # u1: gold -> gold (no-op, collapses) -> silver -> gold
        ev(1, 1, 0, "gold"), ev(2, 1, 1, "gold"),
        ev(3, 1, 2, "silver"), ev(4, 1, 3, "gold"),
        # u2: single version, stays current
        ev(5, 2, 0, "bronze"),
        # noise another type: ignored
        (6, t0, 1, "view", 0.0, "noise"),
    ]
    d = _write_events(spark, rows)
    got = [
        (r.user_id, r.attr, r.valid_to_epoch is None, r.is_current)
        for r in scd2_user_context(spark, d).collect()
    ]
    assert got == [
        (1, "gold", False, False),
        (1, "silver", False, False),
        (1, "gold", True, True),
        (2, "bronze", True, True),
    ]
    # intervals chain: each valid_to equals the next valid_from
    rows2 = scd2_user_context(spark, d).collect()
    u1 = [r for r in rows2 if r.user_id == 1]
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to_epoch == b.valid_from_epoch
