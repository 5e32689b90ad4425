"""Checkpoint/resume + lineage manifest tests (north rule)."""

import json
import os

import pytest

from osm2vdv462_spark.pipeline.runner import run_full_pipeline


@pytest.fixture(scope="module")
def first_run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt"))
    out = run_full_pipeline(spark, wd, n_areas=2, seed=42)
    return wd, out


class TestCheckpoint:
    def test_all_stages_computed_first_run(self, first_run):
        wd, out = first_run
        assert all(not s["skipped"] for s in out["stats"].values())
        assert os.path.getsize(out["document"]) > 1000

    def test_manifests_have_lineage_and_metrics(self, first_run):
        wd, out = first_run
        m = json.load(open(os.path.join(wd, "final_quays.manifest.json")))
        assert m["input_snapshots"]  # lineage recorded
        assert m["metrics"]["rows"] > 0
        assert m["metrics"]["bytes"] > 0
        assert m["metrics"]["content_hash"] > 0
        assert m["partitions"] and all(
            "rows" in p and "bytes" in p for p in m["partitions"]
        )
        assert sum(p["rows"] for p in m["partitions"]) == m["metrics"]["rows"]

    def test_rerun_skips_everything_and_is_bit_stable(self, spark, first_run):
        wd, out1 = first_run
        doc1 = open(out1["document"]).read()
        out2 = run_full_pipeline(spark, wd, n_areas=2, seed=42)
        assert all(s["skipped"] for s in out2["stats"].values())
        assert open(out2["document"]).read() == doc1
        # content hashes stable across runs
        for name, s in out2["stats"].items():
            assert s["content_hash"] == out1["stats"][name]["content_hash"]

    def test_partial_resume_after_manifest_loss(self, spark, first_run):
        wd, out1 = first_run
        os.remove(os.path.join(wd, "path_links.manifest.json"))
        out3 = run_full_pipeline(spark, wd, n_areas=2, seed=42)
        st = out3["stats"]
        assert st["final_quays"]["skipped"]  # upstream untouched
        assert not st["path_links"]["skipped"]  # recomputed
        # recomputation is bit-identical
        assert st["path_links"]["content_hash"] == out1["stats"]["path_links"]["content_hash"]

    def test_two_parallelism_levels_byte_identical(self, spark, tmp_path):
        # SURVEY §5 determinism gate: same input at two parallelism
        # levels -> identical content hashes and identical document
        # (guards the order-sensitive merges A1/A6/A8)
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = run_full_pipeline(spark, str(tmp_path / "p3"), n_areas=1, seed=42)
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = run_full_pipeline(spark, str(tmp_path / "p17"), n_areas=1, seed=42)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        for name in a["stats"]:
            assert (
                a["stats"][name]["content_hash"] == b["stats"][name]["content_hash"]
            ), name
        assert open(a["document"]).read() == open(b["document"]).read()

    def test_input_change_invalidates(self, spark, first_run):
        wd, _ = first_run
        out = run_full_pipeline(spark, wd, n_areas=1, seed=7)  # new generator
        assert not out["stats"]["world_platforms"]["skipped"]
        assert not out["stats"]["final_quays"]["skipped"]


class TestObserveMetrics:
    """r6: stage metrics ride the write job (observe + parquet footers)
    instead of a second full read-back scan — pin the replacements
    against the old computations."""

    def test_parquet_footer_rows_match_spark(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from osm2vdv462_spark.pipeline.checkpoint import parquet_num_rows

        p = str(tmp_path / "t")
        (
            spark.range(0, 5000, 1, 9)
            .select(
                "id",
                F.map_from_arrays(
                    F.array(F.lit("a")), F.array(F.col("id").cast("string"))
                ).alias("m"),
                F.encode(F.col("id").cast("string"), "utf-8").alias("b"),
            )
            .write.mode("overwrite")
            .parquet(p)
        )
        import os

        per_file_spark = {
            r["f"].rsplit("/", 1)[-1]: r["n"]
            for r in spark.read.parquet(p)
            .groupBy(F.input_file_name().alias("f"))
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        checked = 0
        for fn in os.listdir(p):
            if fn.endswith(".parquet"):
                mine = parquet_num_rows(os.path.join(p, fn))
                assert mine == per_file_spark.get(fn, 0), fn
                checked += 1
        assert checked >= 9 and sum(per_file_spark.values()) == 5000

    def test_observed_hash_equals_readback_hash(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from osm2vdv462_spark.pipeline.checkpoint import (
            StageCheckpoint,
            content_hash,
        )

        ck = StageCheckpoint(spark, str(tmp_path))
        df = spark.range(0, 777, 1, 5).select(
            "id",
            (F.col("id") * -1.5).alias("d"),
            F.map_from_arrays(
                F.array(F.lit("k"), F.lit("z")),
                F.array(F.col("id").cast("string"), F.lit("v")),
            ).alias("m"),
        )
        ck.materialize("s", lambda: df, {"i": "1"})
        st = ck.stats["s"]
        rb = content_hash(spark.read.parquet(str(tmp_path / "s")))
        assert st["content_hash"] == rb  # pre-write == post-read
        assert st["rows"] == 777

    def test_empty_stage_materializes(self, spark, tmp_path):
        from osm2vdv462_spark.pipeline.checkpoint import StageCheckpoint

        ck = StageCheckpoint(spark, str(tmp_path))
        empty = spark.createDataFrame([], "id string, label string")
        ck.materialize("e", lambda: empty, {"i": "1"})
        assert ck.stats["e"]["rows"] == 0
        assert ck.stats["e"]["content_hash"] == 0


class TestTemplateCache:
    def test_xml_templates_cached_per_app(self, spark):
        from osm2vdv462_spark.pipeline import export as ex_mod

        a = ex_mod._stop_place_templates(spark)
        b = ex_mod._stop_place_templates(spark)
        assert a is b  # second call is a dict lookup, not a rebuild
        assert set(a) == {"ing", "frags", "head"}
        assert [c for c, _ in a["frags"]] == [
            "QUAY", "ENTRANCE", "ACCESS_SPACE", "SITE_PATH_LINK",
        ]
