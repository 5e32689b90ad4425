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
