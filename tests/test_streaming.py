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
