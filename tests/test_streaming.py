"""Structured Streaming: availableNow drain must equal batch semantics."""

import os

import pytest

from osm2vdv462_spark.streaming import events as se

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _src_dir(sf_dir, tmp_path):
    # file streaming sources need a DIRECTORY; the driver table is a file
    d = tmp_path / "events_src"
    d.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


class TestStreaming:
    def test_available_now_equals_batch(self, spark, sf_dir, tmp_path):
        src = _src_dir(sf_dir, tmp_path)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        se.run_available_now(spark, src, SCHEMA, out, ckpt)
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.read.parquet(out).collect()
        }
        batch = se.windowed_event_counts_batch(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
        want = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in batch.collect()
        }
        assert got == want and len(got) > 0

    def test_resume_from_checkpoint_is_idempotent(self, spark, sf_dir, tmp_path):
        src = _src_dir(sf_dir, tmp_path)
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ckpt2")
        se.run_available_now(spark, src, SCHEMA, out, ckpt)
        first = sorted(
            tuple(r) for r in spark.read.parquet(out).collect()
        )
        # rerun with the same checkpoint: no new data -> output unchanged
        se.run_available_now(spark, src, SCHEMA, out, ckpt)
        second = sorted(
            tuple(r) for r in spark.read.parquet(out).collect()
        )
        assert first == second


class TestStreamingDedup:
    def test_stream_dedup_equals_batch_with_injected_dups(
        self, spark, sf_dir, tmp_path
    ):
        from pyspark.sql import functions as F

        from osm2vdv462_spark.streaming import dedup as sd

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # inject exact copies under new ids: canonical must stay the min
        dups = docs.limit(20).withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000)
        )
        both = docs.unionByName(dups)
        src = tmp_path / "docs_src"
        src.mkdir()
        both.coalesce(1).write.mode("overwrite").parquet(str(src / "p"))
        srcdir = str(src / "p")
        out = str(tmp_path / "dedup_out")
        sd.run_available_now(spark, srcdir, out, str(tmp_path / "dedup_ckpt"))
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        want = sorted(
            tuple(r)
            for r in sd.dedup_batch(spark.read.parquet(srcdir)).collect()
        )
        assert got == want and len(got) > 0
        assert sum(r[2] for r in got) == both.count()  # all rows accounted
        assert any(r[2] > 1 for r in got)  # the copies collapsed
        for r in got:
            assert r[1] < 10_000_000  # canonical is always an original


class TestSessionize:
    """Stateful sessionizer (applyInPandasWithState) vs batch
    gaps-and-islands: every emitted session must be byte-equal to a batch
    session, and sessions provably closed by the watermark must emit."""

    def _split_src(self, spark, sf_dir, tmp_path):
        # two chronological file groups -> two microbatches, so the
        # watermark advances between them and event-time timeouts fire
        from pyspark.sql import functions as F

        d = tmp_path / "sess_src"
        d.mkdir()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        split = ev.selectExpr("percentile_approx(ts, 0.7) AS s").collect()[0]["s"]
        ev.filter(F.col("ts") <= F.lit(split)).coalesce(1).write.parquet(
            str(d / "a")
        )
        ev.filter(F.col("ts") > F.lit(split)).coalesce(1).write.parquet(
            str(d / "b")
        )
        return str(d) + "/*"

    def test_stream_sessions_match_batch(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from osm2vdv462_spark.streaming import sessions as ss

        src = self._split_src(spark, sf_dir, tmp_path)
        out = str(tmp_path / "sess_out")
        ckpt = str(tmp_path / "sess_ckpt")
        ss.run_sessionize_available_now(
            spark, src, SCHEMA, out, ckpt, gap_minutes=360, watermark="1 hour"
        )
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out).collect()
        }
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        batch = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in ss.sessionize_batch(ev, 360).collect()
        }
        # exactness: everything the stream emitted is a true session
        assert got <= batch, got - batch
        # completeness up to the watermark: sessions that closed before
        # the first microbatch's watermark must have been emitted
        split = ev.selectExpr("percentile_approx(ts, 0.7) AS s").collect()[0]["s"]
        import datetime

        wm1 = split - datetime.timedelta(hours=1)
        must_emit = {
            s for s in batch
            if s[2] + datetime.timedelta(minutes=360) < wm1
        }
        assert must_emit <= got, len(must_emit - got)
        assert len(got) > 0

    def test_out_of_order_stragglers_converge_to_batch(
        self, spark, tmp_path
    ):
        """Watermark-admitted events OLDER than the open session must
        follow batch gaps-and-islands: in-gap stragglers extend
        session_start; stragglers more than a gap before it become
        their own (earlier) island (ADVICE r2)."""
        import datetime as dt

        from osm2vdv462_spark.streaming import sessions as ss

        def _write(name, rows, mtime):
            p = tmp_path / "ooo_src"
            p.mkdir(exist_ok=True)
            df = spark.createDataFrame(
                [
                    (i, dt.datetime(2024, 1, 1, h, m), 1, "c", 0.0, "{}")
                    for i, (h, m) in enumerate(rows)
                ],
                SCHEMA,
            )
            f = p / name
            df.coalesce(1).write.mode("overwrite").parquet(str(f))
            os.utime(f, (mtime, mtime))
            return str(p)

        # batch A: session opens [10:00, 10:10] (gap=10min)
        # batch B: 09:55 (in-gap straggler -> start extends to 09:55),
        #          09:30 (> gap before start -> standalone island)
        # batch C: 14:00 pushes watermark past 10:10+gap -> closes session
        _write("a", [(10, 0), (10, 10)], 1_000_000)
        _write("b", [(9, 55), (9, 30)], 1_000_100)
        src = _write("c", [(14, 0)], 1_000_200)
        out = str(tmp_path / "ooo_out")
        ckpt = str(tmp_path / "ooo_ckpt")
        ss.run_sessionize_available_now(
            spark,
            src + "/*",
            SCHEMA,
            out,
            ckpt,
            gap_minutes=10,
            watermark="1 hour",
            max_files_per_trigger=1,
        )
        got = {
            (r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out).collect()
        }
        t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
        assert (t(9, 30), t(9, 30), 1) in got, got
        assert (t(9, 55), t(10, 10), 3) in got, got

    def test_straggler_pairs_and_bridges_merge(self, spark, tmp_path):
        """ADVICE r3: (a) two stragglers within gap of each other —
        across batches — must form ONE earlier session, not two
        singletons; (b) a straggler that lands between an earlier
        island and the open session must FUSE them into one session.
        Both are the batch gaps-and-islands result."""
        import datetime as dt

        from osm2vdv462_spark.streaming import sessions as ss

        def _write(name, rows, mtime):
            p = tmp_path / "pair_src"
            p.mkdir(exist_ok=True)
            df = spark.createDataFrame(
                [
                    (i, dt.datetime(2024, 1, 1, h, m), uid, "c", 0.0, "{}")
                    for i, (uid, h, m) in enumerate(rows)
                ],
                SCHEMA,
            )
            f = p / name
            df.coalesce(1).write.mode("overwrite").parquet(str(f))
            os.utime(f, (mtime, mtime))
            return str(p)

        # watermark floor: global max ts after batch a is 10:05, so
        # wm = 9:05 — stragglers must sit ABOVE it or Spark drops them
        # as late before the operator ever sees them.
        # user 1 (straggler pair): open session at 10:00; stragglers
        # 09:20 then 09:25 in separate batches -> one island [9:20,9:25]
        # user 2 (bridge): open session [10:00,10:05]; straggler 09:40
        # (own island), then 09:50 bridges 09:40 <-> 10:00 (both gaps
        # <= 10 min) -> ONE session [9:40, 10:05]
        _write("a", [(1, 10, 0), (2, 10, 0), (2, 10, 5)], 1_000_000)
        _write("b", [(1, 9, 20), (2, 9, 40)], 1_000_100)
        _write("c", [(1, 9, 25), (2, 9, 50)], 1_000_200)
        src = _write("d", [(1, 14, 0), (2, 14, 0)], 1_000_300)
        out = str(tmp_path / "pair_out")
        ckpt = str(tmp_path / "pair_ckpt")
        ss.run_sessionize_available_now(
            spark,
            src + "/*",
            SCHEMA,
            out,
            ckpt,
            gap_minutes=10,
            watermark="1 hour",
            max_files_per_trigger=1,
        )
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out).collect()
        }
        t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
        assert (1, t(9, 20), t(9, 25), 2) in got, got  # merged pair
        assert not any(
            g[0] == 1 and g[3] == 1 and g[1] < t(10, 0) for g in got
        ), got  # no singleton stragglers for user 1
        assert (2, t(9, 40), t(10, 5), 4) in got, got  # bridged fusion


class TestStreamToTable:
    """streaming/ingest.py: exactly-once streaming appends into the
    snapshot table (replayed epochs commit nothing, restarts don't
    duplicate, downstream changelog reads see each row once)."""

    def _drain(self, spark, src, table, ckpt):
        from osm2vdv462_spark.streaming import ingest

        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = ingest.stream_to_table(
            stream, table, ckpt, ingest_id="ev", cluster_by="event_id"
        )
        q.awaitTermination(120)

    def test_stream_lands_exactly_in_table(self, spark, sf_dir, tmp_path):
        from osm2vdv462_spark.sources import snaptable as st

        src = _src_dir(sf_dir, tmp_path)
        table, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
        self._drain(spark, src, table, ckpt)
        batch = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = st.read_table(spark, table)
        assert sorted(map(tuple, got.select(*batch.columns).collect())) == \
            sorted(map(tuple, batch.collect()))

    def test_restart_commits_nothing_new(self, spark, sf_dir, tmp_path):
        from osm2vdv462_spark.sources import snaptable as st

        src = _src_dir(sf_dir, tmp_path)
        table, ckpt = str(tmp_path / "tbl2"), str(tmp_path / "ck2")
        self._drain(spark, src, table, ckpt)
        v1 = st.current_version(table)
        # restart from the same checkpoint: no new files -> no new epoch
        self._drain(spark, src, table, ckpt)
        assert st.current_version(table) == v1

    def test_replayed_epoch_is_deduped(self, spark, sf_dir, tmp_path):
        """Simulate crash-replay: deliver the SAME epoch twice directly
        through the sink function — second call must be a no-op."""
        from osm2vdv462_spark.sources import snaptable as st
        from osm2vdv462_spark.streaming import ingest

        batch = spark.read.parquet(f"{sf_dir}/events.parquet").limit(100)
        table = str(tmp_path / "tbl3")
        v = ingest.append_epoch(batch, table, "q1", 0, cluster_by="event_id")
        assert v == 1
        assert ingest.append_epoch(batch, table, "q1", 0) is None  # replay
        assert st.current_version(table) == 1
        assert st.read_table(spark, table).count() == 100
        # a NEW epoch from the same query still lands, and the changelog
        # window between them is exactly that epoch's rows
        v2 = ingest.append_epoch(batch, table, "q1", 1)
        assert v2 == 2
        assert st.read_table(spark, table, since=1).count() == 100

    def test_stream_append_preserves_pending_deletes(self, spark, sf_dir, tmp_path):
        """Epoch appends must carry pending merge-on-read deletes
        forward — otherwise streaming into a table after a delete
        resurrects the deleted rows."""
        from osm2vdv462_spark.sources import snaptable as st
        from osm2vdv462_spark.streaming import ingest

        batch = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "event_type"
        ).limit(100)
        table = str(tmp_path / "tbl4")
        ingest.append_epoch(batch, table, "q2", 0, cluster_by="event_id")
        hi = batch.agg({"event_id": "max"}).first()[0]
        st.delete_where(table, [("event_id", "<=", int(hi))])  # delete all
        assert st.read_table(spark, table).count() == 0
        ingest.append_epoch(batch, table, "q2", 1)
        # exactly the new epoch's rows — the old ones stay deleted
        assert st.read_table(spark, table).count() == 100


class TestIntervalJoin:
    def test_pairs_match_batch(self, spark, sf_dir, tmp_path):
        from osm2vdv462_spark.streaming import joins as sj

        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        src = tmp_path / "src"
        src.mkdir()
        os.symlink(f"{sf_dir}/events.parquet", src / "part-0.parquet")
        out = str(tmp_path / "out")
        sj.run_available_now(spark, str(src), schema, out, str(tmp_path / "ck"))
        got = {
            (r["error_id"], r["click_id"])
            for r in spark.read.parquet(out).collect()
        }
        want = {
            (r["error_id"], r["click_id"])
            for r in sj.interval_join_pairs_batch(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        assert got == want

    def test_state_survives_across_microbatches(self, spark, tmp_path):
        """A click arriving a MICROBATCH after its error must still pair
        (the error waits in join state); a click outside the 10-min
        window must not."""
        import datetime as dt

        from osm2vdv462_spark.streaming import joins as sj

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def ev(eid, sec, typ):
            return (eid, t0 + dt.timedelta(seconds=sec), 1, typ, 0.0, "{}")

        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        src = tmp_path / "src"
        src.mkdir()
        # batch 1: the error (plus a same-batch matching click)
        spark.createDataFrame([ev(1, 0, "error"), ev(2, 60, "click")], schema)\
            .coalesce(1).write.parquet(str(tmp_path / "a"))
        # batch 2: a late in-window click + an out-of-window click
        spark.createDataFrame([ev(3, 300, "click"), ev(4, 4000, "click")], schema)\
            .coalesce(1).write.parquet(str(tmp_path / "b"))
        import glob
        import shutil
        import time

        for i, d in enumerate(["a", "b"]):
            (part,) = glob.glob(str(tmp_path / d / "part-*.parquet"))
            dst = src / f"{d}.parquet"
            shutil.copy(part, dst)
            os.utime(dst, (time.time() + i * 10, time.time() + i * 10))
        out = str(tmp_path / "out")
        sj.run_available_now(
            spark, str(src), schema, out, str(tmp_path / "ck"),
            max_files_per_trigger=1,
        )
        got = {
            (r["error_id"], r["click_id"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == {(1, 2), (1, 3)}


class TestStreamingHLL:
    def test_streamed_registers_equal_batch_sketch(self, spark, sf_dir, tmp_path):
        """Drained streaming registers must equal the batch sketch on
        the same data (the max-aggregate is associative, so incremental
        execution IS the merge), and per-window state must stay within
        the m-register bound."""
        from pyspark.sql import functions as F

        from osm2vdv462_spark.operators import sketches as sk
        from osm2vdv462_spark.streaming import sketches as ssk

        src = _src_dir(sf_dir, tmp_path)
        out = str(tmp_path / "hll_out")
        ssk.run_available_now(spark, src, SCHEMA, out, str(tmp_path / "hll_ckpt"))
        regs = spark.read.parquet(out)
        got = {
            (r["window_start"], r["hll_bucket"]): r["hll_reg"]
            for r in regs.collect()
        }
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        items = ev.select(
            F.window("ts", "1 hour").start.alias("window_start"),
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"), F.col("props")
            ).alias("item"),
        )
        want = {
            (r["window_start"], r["hll_bucket"]): r["hll_reg"]
            for r in sk.hll_registers(items, ["window_start"], "item").collect()
        }
        assert got == want and len(got) > 0
        per_window = regs.groupBy("window_start").count().agg(F.max("count")).first()[0]
        assert per_window <= sk.HLL_M
