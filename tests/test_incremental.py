"""Incremental materialized-view maintenance (pipeline/incremental.py):
the refreshed rollup must equal a full recompute, refreshes must be
idempotent, and broken changelog windows must surface, not corrupt."""

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.pipeline import incremental as iv
from osm2vdv462_spark.sources import snaptable as st


def _pts(spark, sf_dir, lo, hi):
    from osm2vdv462_spark.pipeline import datagen

    p = datagen.geo_points(spark, sf_dir)
    return p.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))


def _counts_dict(df):
    return {(r["res"], r["cell"]): r["n_images"] for r in df.collect()}


class TestIncrementalView:
    def test_refresh_equals_full_recompute(self, spark, sf_dir, tmp_path):
        src, view = str(tmp_path / "src"), str(tmp_path / "view")
        st.create_table(_pts(spark, sf_dir, 0, 400), src,
                        cluster_by="event_id", files_hint=4)
        iv.init_tile_view(spark, src, view)
        st.append_table(_pts(spark, sf_dir, 400, 700), src, files_hint=4)
        st.append_table(_pts(spark, sf_dir, 700, 1000), src, files_hint=4)
        out = iv.refresh_tile_view(spark, src, view)
        assert out["refreshed"] and out["keys_upserted"] > 0
        got = _counts_dict(st.read_table(spark, view))
        want = _counts_dict(
            iv._tile_counts(st.read_table(spark, src), (8, 10, 12))
        )
        assert got == want

    def test_refresh_is_idempotent(self, spark, sf_dir, tmp_path):
        src, view = str(tmp_path / "src"), str(tmp_path / "view")
        st.create_table(_pts(spark, sf_dir, 0, 300), src, files_hint=2)
        iv.init_tile_view(spark, src, view)
        st.append_table(_pts(spark, sf_dir, 300, 700), src, files_hint=2)
        iv.refresh_tile_view(spark, src, view)
        before = _counts_dict(st.read_table(spark, view))
        out = iv.refresh_tile_view(spark, src, view)  # replay: no-op
        assert not out["refreshed"]
        assert _counts_dict(st.read_table(spark, view)) == before

    def test_broken_changelog_surfaces(self, spark, sf_dir, tmp_path):
        src, view = str(tmp_path / "src"), str(tmp_path / "view")
        st.create_table(_pts(spark, sf_dir, 0, 300), src, files_hint=2)
        iv.init_tile_view(spark, src, view)
        st.compact_table(spark, src, files_hint=2)  # rewrite: not a changelog
        with pytest.raises(ValueError, match="replace"):
            iv.refresh_tile_view(spark, src, view)
        # recovery path: full recompute re-baselines the watermark
        import shutil

        shutil.rmtree(view)
        iv.init_tile_view(spark, src, view)
        st.append_table(_pts(spark, sf_dir, 300, 500), src, files_hint=2)
        assert iv.refresh_tile_view(spark, src, view)["refreshed"]
        got = _counts_dict(st.read_table(spark, view))
        want = _counts_dict(
            iv._tile_counts(st.read_table(spark, src), (8, 10, 12))
        )
        assert got == want
