"""Checkpoint/resume semantics of the image geo pipeline
(pipeline/geopipe.py) — the north rule's "all stages checkpoint-resumable
with per-partition lineage manifests and row/byte metrics"."""

import json
import os

import pytest

from osm2vdv462_spark.pipeline.geopipe import run_image_pipeline

STAGES = ["images", "verify", "join_rows", "tile_assign", "tile_counts"]


@pytest.fixture(scope="module")
def pipe(spark, sf_dir, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("geopipe"))
    out = run_image_pipeline(spark, work, sf_dir, every=10)
    return work, out


def test_all_stages_materialize_with_metrics(pipe):
    work, out = pipe
    for s in STAGES:
        st = out["stats"][s]
        assert not st["skipped"]
        assert st["rows"] > 0 and st["bytes"] > 0
        assert "content_hash" in st and "wall_sec" in st


def test_manifests_carry_per_partition_lineage(pipe):
    work, out = pipe
    for s in STAGES:
        m = json.load(open(os.path.join(work, f"{s}.manifest.json")))
        assert m["partitions"], s
        assert all(p["bytes"] > 0 for p in m["partitions"])
        assert sum(p["rows"] for p in m["partitions"]) == m["metrics"]["rows"]
        assert m["input_snapshots"], s  # lineage: inputs fingerprinted


def test_rerun_resumes_all_stages(spark, sf_dir, pipe):
    work, out = pipe
    again = run_image_pipeline(spark, work, sf_dir, every=10)
    assert all(again["stats"][s]["skipped"] for s in STAGES)
    for s in STAGES:
        assert (
            again["stats"][s]["content_hash"] == out["stats"][s]["content_hash"]
        )


def test_damaged_stage_recomputes_bit_stable(spark, sf_dir, pipe):
    work, out = pipe
    # truncate one tile_assign data file -> size mismatch vs manifest
    ddir = os.path.join(work, "tile_assign")
    part = next(
        f for f in sorted(os.listdir(ddir)) if f.endswith(".parquet")
    )
    with open(os.path.join(ddir, part), "ab") as fh:
        fh.write(b"x")  # corrupt: size no longer matches lineage record
    again = run_image_pipeline(spark, work, sf_dir, every=10)
    assert not again["stats"]["tile_assign"]["skipped"]  # recomputed
    assert again["stats"]["images"]["skipped"]  # upstream untouched
    # recompute is bit-stable -> downstream skips on matching snapshot
    assert again["stats"]["tile_counts"]["skipped"]
    assert (
        again["stats"]["tile_assign"]["content_hash"]
        == out["stats"]["tile_assign"]["content_hash"]
    )


def test_param_change_invalidates_lineage(spark, sf_dir, pipe):
    work, _ = pipe
    again = run_image_pipeline(spark, work, sf_dir, every=20)
    assert not again["stats"]["images"]["skipped"]
    assert not again["stats"]["tile_counts"]["skipped"]


def test_verify_stage_invariant_all_green(spark, pipe):
    """The materialized per-row invariant verdicts (input_hint: decoded
    pixels, caption equality, phash recompute) must be ALL true on the
    synthetic corpus — a decode/caption regression flips rows here."""
    work, _ = pipe
    v = spark.read.parquet(os.path.join(work, "verify"))
    n = v.count()
    for c in ("pixel_ok", "caption_ok", "phash_ok"):
        assert v.filter(f"{c} = true").count() == n, c


def test_geo_stage_scan_prunes_bytes(spark, pipe):
    work, out = pipe
    imgs = spark.read.parquet(os.path.join(work, "images"))
    plan = (
        imgs.select("image_id", "caption", "lon", "lat")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema" in plan and "bytes" not in plan
