"""Snapshot table format (sources/snaptable.py): atomic commits,
O(new-data) appends + time travel, and manifest-driven file pruning —
the from-scratch stand-in for the north rule's Iceberg stage tables."""

import os

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.sources import snaptable as st


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )


class TestRoundtrip:
    def test_create_and_read_back(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t1")
        v = st.create_table(df, path, cluster_by="event_id")
        assert v == 1
        got = st.read_table(spark, path)
        assert got.count() == df.count()
        # exact content parity, order-insensitive
        assert (
            sorted(map(tuple, got.collect()))
            == sorted(map(tuple, df.collect()))
        )

    def test_binary_payload_column_roundtrip(self, spark, sf_dir, tmp_path):
        """input_hint-shaped table: binary column rides along untouched;
        stats harvesting skips it (binary has no usable order) but the
        id column still prunes."""
        from osm2vdv462_spark.pipeline import images as im

        df = im.images_df(spark, sf_dir, every=100)
        path = str(tmp_path / "imgs")
        st.create_table(df, path, cluster_by="image_id", files_hint=4)
        rep: dict = {}
        got = st.read_table(spark, path, report=rep)
        assert got.count() == df.count()
        assert dict(got.dtypes)["bytes"] == "binary"


class TestPruning:
    def test_point_filter_prunes_files(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t2")
        st.create_table(df, path, cluster_by="event_id", files_hint=8)
        some_id = df.agg(F.max("event_id")).collect()[0][0]
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", "==", some_id)], report=rep
        )
        assert rep["files_scanned"] < rep["files_total"]
        assert rep["files_scanned"] >= 1
        assert got.count() == df.filter(F.col("event_id") == some_id).count()

    def test_range_filter_parity_and_pruning(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t3")
        st.create_table(df, path, cluster_by="event_id", files_hint=8)
        cut = df.approxQuantile("event_id", [0.9], 0.01)[0]
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", ">=", cut)], report=rep
        )
        assert rep["files_scanned"] < rep["files_total"]
        assert rep["rows_skipped"] > 0
        assert got.count() == df.filter(F.col("event_id") >= cut).count()

    def test_impossible_filter_scans_nothing(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t4")
        st.create_table(df, path, cluster_by="event_id")
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", "<", -1)], report=rep
        )
        assert rep["files_scanned"] == 0
        assert got.count() == 0
        assert got.columns == df.columns  # schema survives the empty scan

    def test_pruning_is_metadata_only(self, spark, sf_dir, tmp_path):
        """plan_scan touches only manifest JSON — no Spark, no parquet
        opens (the 100 TB property: planning cost is O(files), not
        O(bytes))."""
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t5")
        st.create_table(df, path, cluster_by="event_id", files_hint=8)
        plan = st.plan_scan(path, filters=[("event_id", "==", 1)])
        assert plan["files_scanned"] <= plan["files_total"]
        for f in plan["files"]:
            assert os.path.exists(f)


class TestSnapshots:
    def test_append_and_time_travel(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        half = df.filter(F.col("event_id") % 2 == 0)
        rest = df.filter(F.col("event_id") % 2 == 1)
        path = str(tmp_path / "t6")
        assert st.create_table(half, path, cluster_by="event_id") == 1
        assert st.append_table(rest, path) == 2
        assert st.current_version(path) == 2
        assert st.read_table(spark, path).count() == df.count()
        # time travel: v1 still sees exactly the first half
        assert (
            st.read_table(spark, path, snapshot=1).count() == half.count()
        )

    def test_orphan_data_file_is_invisible(self, spark, sf_dir, tmp_path):
        """A crashed writer leaves data files but never flips the version
        hint — readers must not see them."""
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t7")
        st.create_table(df, path, cluster_by="event_id")
        n = st.read_table(spark, path).count()
        # simulate a torn write: a real parquet file lands in data/
        # without a snapshot commit
        df.limit(10).write.mode("overwrite").parquet(str(tmp_path / "orph"))
        orphan = [
            f for f in os.listdir(str(tmp_path / "orph"))
            if f.endswith(".parquet")
        ][0]
        os.replace(
            str(tmp_path / "orph" / orphan),
            os.path.join(path, "data", "orphan.parquet"),
        )
        assert st.read_table(spark, path).count() == n

    def test_append_keeps_old_files(self, spark, sf_dir, tmp_path):
        """Appends are O(new data): snapshot 2 reuses snapshot 1's files
        byte-for-byte (same paths), plus new ones."""
        df = _events(spark, sf_dir)
        path = str(tmp_path / "t8")
        st.create_table(df.limit(100), path, cluster_by="event_id")
        v1_files = set(st.plan_scan(path, snapshot=1)["files"])
        st.append_table(df.limit(50), path)
        v2_files = set(st.plan_scan(path, snapshot=2)["files"])
        assert v1_files <= v2_files
        assert len(v2_files) > len(v1_files)


class TestIncrementalRead:
    def _three_snapshots(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "inc")
        st.create_table(df.filter(F.col("event_id") % 3 == 0), path,
                        cluster_by="event_id", files_hint=4)
        st.append_table(df.filter(F.col("event_id") % 3 == 1), path,
                        files_hint=4)
        st.append_table(df.filter(F.col("event_id") % 3 == 2), path,
                        files_hint=4)
        return df, path

    def test_since_reads_only_appended_rows(self, spark, sf_dir, tmp_path):
        df, path = self._three_snapshots(spark, sf_dir, tmp_path)
        inc = st.read_table(spark, path, since=1)
        assert sorted(map(tuple, inc.collect())) == sorted(
            map(tuple, df.filter(F.col("event_id") % 3 != 0).collect())
        )
        only_last = st.read_table(spark, path, since=2)
        assert sorted(map(tuple, only_last.collect())) == sorted(
            map(tuple, df.filter(F.col("event_id") % 3 == 2).collect())
        )

    def test_since_window_between_snapshots(self, spark, sf_dir, tmp_path):
        df, path = self._three_snapshots(spark, sf_dir, tmp_path)
        window = st.read_table(spark, path, snapshot=2, since=1)
        assert sorted(map(tuple, window.collect())) == sorted(
            map(tuple, df.filter(F.col("event_id") % 3 == 1).collect())
        )

    def test_since_current_is_empty_with_schema(self, spark, sf_dir, tmp_path):
        df, path = self._three_snapshots(spark, sf_dir, tmp_path)
        cur = st.current_version(path)
        empty = st.read_table(spark, path, since=cur)
        assert empty.count() == 0
        assert empty.schema == st.read_table(spark, path).schema

    def test_since_composes_with_pruning(self, spark, sf_dir, tmp_path):
        df, path = self._three_snapshots(spark, sf_dir, tmp_path)
        lo = df.filter(F.col("event_id") % 3 == 2).agg(
            F.min("event_id")
        ).collect()[0][0]
        rep: dict = {}
        got = st.read_table(
            spark, path, since=2, filters=[("event_id", "==", int(lo))],
            report=rep,
        )
        assert got.count() == 1
        # pruning counters are RELATIVE to the appended file set
        assert rep["files_scanned"] < rep["files_total"] <= 4

    def test_since_newer_than_snapshot_raises(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        _, path = self._three_snapshots(spark, sf_dir, tmp_path)
        with _pt.raises(ValueError):
            st.plan_scan(path, snapshot=1, since=3)


class TestZOrder:
    BOX = [("lon", ">=", 0.0), ("lon", "<=", 0.1),
           ("lat", ">=", 0.0), ("lat", "<=", 0.1)]

    def _pts(self, spark, sf_dir):
        from osm2vdv462_spark.pipeline import datagen

        return datagen.geo_points(spark, sf_dir)

    def test_bbox_roundtrip_and_pruning(self, spark, sf_dir, tmp_path):
        pts = self._pts(spark, sf_dir)
        path = str(tmp_path / "z")
        st.create_table(pts, path, cluster_by=["lon", "lat"], files_hint=16)
        rep: dict = {}
        got = st.read_table(spark, path, filters=self.BOX, report=rep)
        expected = pts.filter(
            (F.col("lon") >= 0.0) & (F.col("lon") <= 0.1)
            & (F.col("lat") >= 0.0) & (F.col("lat") <= 0.1)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expected.collect())
        )
        assert rep["files_scanned"] < rep["files_total"]

    def test_zorder_prunes_each_dimension_alone(self, spark, tmp_path):
        """The point of Z-order vs 1-D clustering: BOTH dimensions prune.
        A lon-range-clustered table cannot prune a lat-only predicate;
        the z-ordered one prunes lat-only AND lon-only.

        Uses an UNCORRELATED 64x64 grid: geo_points' lon and lat are a
        bijection of the same LCG cycle, so 1-D lon clustering would
        accidentally order lat too and the control wouldn't control."""
        pts = spark.range(64 * 64).select(
            F.col("id").alias("event_id"),
            ((F.col("id") % 64) / 64.0 - 0.5).alias("lon"),
            ((F.col("id") / 64).cast("long") % 64 / 64.0 - 0.5).alias("lat"),
        )
        zpath, lpath = str(tmp_path / "z2"), str(tmp_path / "lon1d")
        st.create_table(pts, zpath, cluster_by=["lon", "lat"], files_hint=16)
        st.create_table(pts, lpath, cluster_by="lon", files_hint=16)
        lat_only = [("lat", ">=", 0.15)]
        lon_only = [("lon", ">=", 0.15)]
        for filt in (lat_only, lon_only):
            rep: dict = {}
            st.read_table(spark, zpath, filters=filt, report=rep)
            assert rep["files_scanned"] < rep["files_total"], filt
        rep1d: dict = {}
        st.read_table(spark, lpath, filters=lat_only, report=rep1d)
        assert rep1d["files_scanned"] == rep1d["files_total"]  # control


class TestCompactionAndExpiry:
    def _frag_table(self, spark, sf_dir, tmp_path):
        """A fragmented table: create + 3 appends at files_hint=4 -> 16
        small files (the streaming small-file problem in miniature)."""
        df = _events(spark, sf_dir)
        path = str(tmp_path / "frag")
        st.create_table(df.filter(F.col("event_id") % 4 == 0), path,
                        cluster_by="event_id", files_hint=4)
        for r in (1, 2, 3):
            st.append_table(df.filter(F.col("event_id") % 4 == r), path,
                            files_hint=4)
        return df, path

    def test_compact_reduces_files_preserves_content(self, spark, sf_dir, tmp_path):
        df, path = self._frag_table(spark, sf_dir, tmp_path)
        before = st.plan_scan(path)
        v = st.compact_table(spark, path, files_hint=4)
        after = st.plan_scan(path)
        assert after["files_total"] < before["files_total"]
        got = st.read_table(spark, path)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, df.collect())
        )
        # pruning is sharp again post-compaction (re-clustered)
        lo = df.agg(F.min("event_id")).first()[0]
        rep: dict = {}
        st.read_table(spark, path, filters=[("event_id", "==", int(lo))],
                      report=rep)
        assert rep["files_scanned"] < rep["files_total"]
        # pre-compaction snapshots still time-travel
        old = st.read_table(spark, path, snapshot=v - 1)
        assert old.count() == df.count()

    def test_incremental_refuses_to_cross_compaction(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df, path = self._frag_table(spark, sf_dir, tmp_path)
        cv = st.compact_table(spark, path, files_hint=4)
        with _pt.raises(ValueError, match="replace"):
            st.plan_scan(path, since=1)
        # but a window starting AT the compaction is a clean changelog
        st.append_table(df.limit(10), path, files_hint=1)
        inc = st.read_table(spark, path, since=cv)
        assert inc.count() == 10

    def test_expire_snapshots_gc(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df, path = self._frag_table(spark, sf_dir, tmp_path)
        cv = st.compact_table(spark, path, files_hint=4)
        ndata = lambda: len(os.listdir(os.path.join(path, "data")))
        files_before = ndata()
        out = st.expire_snapshots(path, keep_from=cv)
        assert out["snapshots_removed"] == cv - 1
        assert out["files_removed"] > 0 and out["bytes_removed"] > 0
        assert ndata() == files_before - out["files_removed"]
        # current read unaffected, expired version unreadable
        assert st.read_table(spark, path).count() == df.count()
        with _pt.raises(FileNotFoundError):
            st.plan_scan(path, snapshot=1)


class TestRowLevelDeletes:
    def test_delete_parity_and_metadata_only(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "del")
        st.create_table(df, path, cluster_by="event_id", files_hint=8)
        data_before = sorted(os.listdir(os.path.join(path, "data")))
        cut = df.approxQuantile("event_id", [0.5], 0.01)[0]
        v = st.delete_where(path, [("event_id", ">=", cut)])
        # metadata-only: no data file written or rewritten
        assert sorted(os.listdir(os.path.join(path, "data"))) == data_before
        got = st.read_table(spark, path)
        want = df.filter(F.col("event_id") < cut)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # fully-covered files were dropped from the manifest at commit
        assert (
            st.plan_scan(path)["files_total"]
            < st.plan_scan(path, snapshot=v - 1)["files_total"]
        )
        # time travel still sees everything
        assert st.read_table(spark, path, snapshot=v - 1).count() == df.count()

    def test_later_appends_survive_the_delete(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "del2")
        st.create_table(df, path, cluster_by="event_id", files_hint=4)
        hi = df.agg(F.max("event_id")).first()[0]
        st.delete_where(path, [("event_id", "<=", hi)])  # delete ALL
        assert st.read_table(spark, path).count() == 0
        # rows appended AFTER the delete match the predicate but must
        # NOT be deleted (delete applies at its sequence point)
        st.append_table(df.limit(70), path, files_hint=2)
        assert st.read_table(spark, path).count() == 70

    def test_compaction_materializes_deletes(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "del3")
        st.create_table(df, path, cluster_by="event_id", files_hint=4)
        cut = df.approxQuantile("event_id", [0.3], 0.01)[0]
        st.delete_where(path, [("event_id", "<", cut)])
        n_live = st.read_table(spark, path).count()
        cv = st.compact_table(spark, path, files_hint=4)
        snap = st.plan_scan(path)
        assert st._load_snapshot(path, cv)["deletes"] == []
        assert st.read_table(spark, path).count() == n_live
        assert sum(e["stats"]["rows"] for e in snap["entries"]) == n_live

    def test_incremental_refuses_to_cross_delete(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df = _events(spark, sf_dir)
        path = str(tmp_path / "del4")
        st.create_table(df.limit(100), path, files_hint=2)
        st.append_table(df.limit(150), path, files_hint=2)
        st.delete_where(path, [("event_id", ">=", 0)])
        with _pt.raises(ValueError, match="delete"):
            st.plan_scan(path, since=1)

    def test_delete_composes_with_filters_and_pruning(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "del5")
        st.create_table(df, path, cluster_by="event_id", files_hint=8)
        q1, q3 = df.approxQuantile("event_id", [0.25, 0.75], 0.01)
        st.delete_where(path, [("event_id", "<", q1)])
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", "<=", q3)], report=rep
        )
        want = df.filter((F.col("event_id") >= q1) & (F.col("event_id") <= q3))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert rep["files_scanned"] < rep["files_total"]


class TestSchemaEvolution:
    def test_add_column_append(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "evo")
        st.create_table(df.limit(100), path, cluster_by="event_id",
                        files_hint=2)
        widened = df.limit(40).withColumn(
            "score", (F.col("event_id") % 7).cast("double")
        )
        st.append_table(widened, path, files_hint=2,
                        allow_schema_evolution=True)
        got = st.read_table(spark, path)
        assert "score" in got.columns
        assert got.count() == 140
        # old files read the new column as null; new rows carry values
        assert got.filter(F.col("score").isNull()).count() == 100
        assert got.filter(F.col("score") >= 0).count() == 40

    def test_omitted_column_reads_null(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "evo2")
        st.create_table(df.limit(50), path, files_hint=1)
        st.append_table(df.limit(20).drop("event_type"), path, files_hint=1,
                        allow_schema_evolution=True)
        got = st.read_table(spark, path)
        assert got.count() == 70
        assert got.filter(F.col("event_type").isNull()).count() == 20

    def test_mismatch_without_flag_raises(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df = _events(spark, sf_dir)
        path = str(tmp_path / "evo3")
        st.create_table(df.limit(10), path, files_hint=1)
        with _pt.raises(ValueError, match="allow_schema_evolution"):
            st.append_table(df.limit(5).withColumn("x", F.lit(1)), path)

    def test_type_change_always_raises(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df = _events(spark, sf_dir)
        path = str(tmp_path / "evo4")
        st.create_table(df.limit(10), path, files_hint=1)
        retyped = df.limit(5).withColumn(
            "event_type", F.lit(3).cast("int")
        )
        with _pt.raises(ValueError, match="type change"):
            st.append_table(retyped, path, allow_schema_evolution=True)


class TestUpsert:
    def test_upsert_updates_and_inserts(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "up")
        base = df.filter(F.col("event_id") < 200)
        st.create_table(base, path, cluster_by="event_id", files_hint=4)
        # change 50 existing rows + insert 30 brand-new keys
        changed = (
            df.filter(F.col("event_id") < 50)
            .withColumn("event_type", F.lit("UPDATED"))
        )
        fresh = df.filter(
            (F.col("event_id") >= 5000) & (F.col("event_id") < 5030)
        )
        st.upsert_table(spark, changed.unionByName(fresh), path, "event_id")
        got = st.read_table(spark, path)
        want = (
            base.filter(F.col("event_id") >= 50)
            .unionByName(changed)
            .unionByName(fresh)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # merge-on-read: no pre-existing data file was rewritten
        assert st.read_table(spark, path, snapshot=1).count() == base.count()

    def test_append_after_upsert_is_not_deleted(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "up2")
        st.create_table(df.filter(F.col("event_id") < 100), path, files_hint=2)
        st.upsert_table(
            spark, df.filter(F.col("event_id") < 100), path, "event_id"
        )
        # same keys appended AFTER the upsert: sequence point protects them
        st.append_table(df.filter(F.col("event_id") < 100), path, files_hint=2)
        n_keys = df.filter(F.col("event_id") < 100).count()
        assert st.read_table(spark, path).count() == 2 * n_keys

    def test_compact_materializes_upsert(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "up3")
        st.create_table(df.filter(F.col("event_id") < 300), path,
                        cluster_by="event_id", files_hint=4)
        upd = df.filter(F.col("event_id") < 80).withColumn(
            "event_type", F.lit("X")
        )
        st.upsert_table(spark, upd, path, "event_id")
        live = sorted(map(tuple, st.read_table(spark, path).collect()))
        cv = st.compact_table(spark, path, files_hint=4)
        assert st._load_snapshot(path, cv)["eq_deletes"] == []
        assert sorted(map(tuple, st.read_table(spark, path).collect())) == live

    def test_expire_gc_includes_delete_files(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "up4")
        st.create_table(df.limit(100), path, files_hint=2)
        st.upsert_table(spark, df.limit(40), path, "event_id")
        cv = st.compact_table(spark, path, files_hint=2)
        assert os.listdir(os.path.join(path, "deletes"))  # exists pre-GC
        st.expire_snapshots(path, keep_from=cv)
        assert os.listdir(os.path.join(path, "deletes")) == []  # GC'd
        assert st.read_table(spark, path).count() == 100

    def test_incremental_refuses_to_cross_upsert(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df = _events(spark, sf_dir)
        path = str(tmp_path / "up5")
        st.create_table(df.limit(100), path, files_hint=2)
        st.upsert_table(spark, df.limit(10), path, "event_id")
        with _pt.raises(ValueError, match="upsert"):
            st.plan_scan(path, since=1)

    def test_bad_key_raises(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        df = _events(spark, sf_dir)
        path = str(tmp_path / "up6")
        st.create_table(df.limit(10), path, files_hint=1)
        with _pt.raises(ValueError, match="not in table schema"):
            st.upsert_table(spark, df.limit(5), path, "nope")


class TestConcurrentCommits:
    def test_version_claim_is_exclusive(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir)
        path = str(tmp_path / "cc")
        st.create_table(df.limit(50), path, files_hint=1)
        parent = st._load_snapshot(path, 1)
        snap_a = dict(parent, version=2, parent=1, operation="append")
        snap_b = dict(parent, version=2, parent=1, operation="append")
        st._commit(path, snap_a)
        with pytest.raises(st.CommitConflict):
            st._commit(path, snap_b)

    def test_racing_appends_both_land(self, spark, sf_dir, tmp_path):
        """Two writers appending concurrently: with optimistic
        concurrency + rebase-retry, NEITHER append is lost."""
        import threading

        df = _events(spark, sf_dir)
        path = str(tmp_path / "cc2")
        st.create_table(df.limit(10), path, files_hint=1)
        b1 = df.filter((F.col("event_id") >= 100) & (F.col("event_id") < 150))
        b2 = df.filter((F.col("event_id") >= 200) & (F.col("event_id") < 260))
        n1, n2 = b1.count(), b2.count()
        barrier = threading.Barrier(2)
        errs = []

        def _go(frame):
            try:
                barrier.wait(30)
                st.append_table(frame, path, files_hint=1)
            except Exception as e:  # surface in the main thread
                errs.append(e)

        ts = [threading.Thread(target=_go, args=(b,)) for b in (b1, b2)]
        [t.start() for t in ts]
        [t.join(120) for t in ts]
        assert not errs, errs
        assert st.current_version(path) == 3  # two real commits
        assert st.read_table(spark, path).count() == 10 + n1 + n2

    def test_loser_files_stay_invisible(self, spark, sf_dir, tmp_path):
        """A claim that loses leaves only orphan data files — readers
        never see them (same invariant as the torn-write test)."""
        df = _events(spark, sf_dir)
        path = str(tmp_path / "cc3")
        st.create_table(df.limit(20), path, files_hint=1)
        # stage data files like a loser would, then never commit
        st._write_data_files(df.limit(5), path, None, 1)
        assert st.read_table(spark, path).count() == 20


class TestScanEfficiency:
    def test_read_table_prunes_columns(self, spark, sf_dir, tmp_path):
        """The table-format read path must not break Spark's parquet
        column pruning: selecting 2 of 9 input_hint columns reads only
        those 2 (the multi-KB bytes column stays on disk)."""
        from osm2vdv462_spark.pipeline import images as im

        df = im.images_df(spark, sf_dir, every=100)
        path = str(tmp_path / "prune")
        st.create_table(df, path, cluster_by="image_id", files_hint=2)
        plan = (
            st.read_table(spark, path)
            .select("image_id", "lon")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ReadSchema" in plan
        assert "bytes" not in plan and "caption" not in plan

    def test_merge_on_read_still_prunes_columns(self, spark, sf_dir, tmp_path):
        """Pending deletes add an anti-filter/anti-join on top of the
        scan — the scan itself must still be column-pruned."""
        df = _events(spark, sf_dir)
        path = str(tmp_path / "prune2")
        st.create_table(df, path, cluster_by="event_id", files_hint=2)
        st.delete_where(path, [("event_id", "<", 10)])
        plan = (
            st.read_table(spark, path)
            .select("event_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ReadSchema" in plan and "user_id" not in plan


class TestBloom:
    """Per-file bloom filters in the manifest (bloom_cols): equality
    pruning on keys the physical clustering scatters — where min/max
    can prove nothing. Build (executor-side nested closure) and probe
    (driver-side module code) use independent implementations of the
    same hash scheme, so these round trips also guard them against
    drifting apart."""

    def _table(self, spark, sf_dir, tmp_path, bloom):
        # cluster by user_id so each file's event_id min/max spans
        # nearly the whole key range: min/max pruning is useless for an
        # event_id lookup by construction, and any pruning proves bloom.
        df = _events(spark, sf_dir)
        path = str(tmp_path / ("b" if bloom else "nob"))
        st.create_table(
            df, path, cluster_by="user_id", files_hint=8,
            bloom_cols=["event_id"] if bloom else None,
        )
        return df, path

    def test_lookup_prunes_where_minmax_cannot(self, spark, sf_dir, tmp_path):
        df, path = self._table(spark, sf_dir, tmp_path, bloom=True)
        _, ctrl = self._table(spark, sf_dir, tmp_path, bloom=False)
        # a MID-RANGE id: the global max would sit outside 7 of 8
        # files' [lo, hi] and min/max alone could prune it
        hi = df.agg(F.max("event_id")).collect()[0][0]
        some_id = (
            df.filter(F.col("event_id") <= hi // 2)
            .agg(F.max("event_id")).collect()[0][0]
        )
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", "==", some_id)], report=rep
        ).collect()
        assert rep["files_scanned"] < rep["files_total"]
        assert [r.event_id for r in got] == [some_id]
        # control: without blooms the same lookup scans everything
        crep: dict = {}
        st.read_table(
            spark, ctrl, filters=[("event_id", "==", some_id)], report=crep
        )
        assert crep["files_scanned"] == crep["files_total"]

    def test_absent_key_scans_zero_files(self, spark, sf_dir, tmp_path):
        _, path = self._table(spark, sf_dir, tmp_path, bloom=True)
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", "==", -987654321)], report=rep
        )
        # deterministic data + deterministic md5 probes: a false
        # positive here would fail reproducibly, not flake
        assert rep["files_scanned"] == 0
        assert got.count() == 0

    def test_pruning_is_superset_result_parity(self, spark, sf_dir, tmp_path):
        df, path = self._table(spark, sf_dir, tmp_path, bloom=True)
        ids = [r.event_id for r in df.limit(200).collect()][::37]
        for key in ids:
            got = st.read_table(
                spark, path, filters=[("event_id", "==", key)]
            ).collect()
            want = df.filter(F.col("event_id") == key).collect()
            assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_append_inherits_compact_rebuilds(self, spark, sf_dir, tmp_path):
        _, path = self._table(spark, sf_dir, tmp_path, bloom=True)
        extra = spark.createDataFrame(
            [(999999999, 77, "view")],
            "event_id long, user_id long, event_type string",
        )
        st.append_table(extra, path, files_hint=1)
        rep: dict = {}
        got = st.read_table(
            spark, path, filters=[("event_id", "==", 999999999)], report=rep
        ).collect()
        assert rep["files_scanned"] == 1  # the appended file bloomed too
        assert len(got) == 1
        st.compact_table(spark, path, files_hint=2)
        rep2: dict = {}
        got2 = st.read_table(
            spark, path, filters=[("event_id", "==", 999999999)], report=rep2
        ).collect()
        assert len(got2) == 1
        assert rep2["files_scanned"] <= rep2["files_total"] <= 2
        # absent key still proves absence through the rewritten blooms
        rep3: dict = {}
        st.read_table(
            spark, path, filters=[("event_id", "==", -987654321)], report=rep3
        )
        assert rep3["files_scanned"] == 0

    def test_unhashable_bloom_type_raises(self, spark, sf_dir, tmp_path):
        df = _events(spark, sf_dir).withColumn("score", F.rand(7))
        with pytest.raises(ValueError, match="bloom column"):
            st.create_table(
                df, str(tmp_path / "bad"), bloom_cols=["score"]
            )

    def test_delete_where_in_op(self, spark, sf_dir, tmp_path):
        """The batched 'in' op composes with merge-on-read deletes:
        the anti-filter drops exactly the listed keys."""
        df, path = self._table(spark, sf_dir, tmp_path, bloom=True)
        doomed = [r.event_id for r in df.limit(3).collect()]
        st.delete_where(path, [("event_id", "in", doomed)])
        got = st.read_table(spark, path)
        assert got.filter(F.col("event_id").isin(doomed)).count() == 0
        assert got.count() == df.count() - len(doomed)


class TestMetadataCount:
    def test_count_matches_scan_and_uses_metadata(self, spark, tmp_path):
        import pandas as pd

        from osm2vdv462_spark.sources import snaptable as st

        df = spark.createDataFrame(
            pd.DataFrame(
                {"k": range(1000), "v": [i % 7 for i in range(1000)]}
            )
        )
        t = str(tmp_path / "tbl")
        st.create_table(df, t, cluster_by="k", files_hint=5)
        rep: dict = {}
        n = st.count_rows(spark, t, filters=[("k", ">=", 300)], report=rep)
        assert n == 700
        assert rep["files_meta_counted"] > 0
        assert rep["files_scanned"] < rep["files_total"]
        assert rep["rows_from_metadata"] + (n - rep["rows_from_metadata"]) == n
        # unfiltered count: pure metadata, zero scans
        rep2: dict = {}
        assert st.count_rows(spark, t, report=rep2) == 1000
        assert rep2["files_scanned"] == 0
        assert rep2["rows_from_metadata"] == 1000

    def test_delete_pending_falls_back_correctly(self, spark, tmp_path):
        import pandas as pd

        from osm2vdv462_spark.sources import snaptable as st

        df = spark.createDataFrame(
            pd.DataFrame(
                {"k": range(100), "v": [i % 7 for i in range(100)]}
            )
        )
        t = str(tmp_path / "tbl2")
        st.create_table(df, t, cluster_by="k", files_hint=2)
        st.delete_where(t, [("k", ">=", 30), ("k", "<", 40)])
        rep: dict = {}
        n = st.count_rows(spark, t, report=rep)
        assert n == 90
        assert rep.get("fallback") or rep["files_meta_counted"] >= 0
