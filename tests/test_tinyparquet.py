"""Driver-side tiny-parquet reader (sources/tinyparquet) vs independent
readers — r6: removes the fixed per-call Spark job behind dimension-table
collects (datagen.stop_area_octagons)."""

import os

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.sources.tinyparquet import read_int_column

duckdb = pytest.importorskip("duckdb")


def _duck(path, col):
    return [
        r[0]
        for r in duckdb.sql(
            f'SELECT "{col}" FROM read_parquet(\'{path}\')'
        ).fetchall()
    ]


class TestAgainstTestdata:
    @pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
    def test_nation_key_column(self, sf):
        path = f"/root/testdata/sf{sf}/nation.parquet"
        if not os.path.isfile(path):
            pytest.skip("testdata layout changed")
        mine = read_int_column(path, "n_nationkey")
        assert mine is not None, "nation dim fell out of reader scope"
        assert mine == _duck(path, "n_nationkey")

    def test_every_small_int_column_matches(self):
        root = "/root/testdata/sf0.01"
        checked = 0
        for fn in sorted(os.listdir(root)):
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(root, fn)
            if not os.path.isfile(path):
                continue
            cols = duckdb.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
            for cname, ctype, *_ in cols:
                if ctype not in ("INTEGER", "BIGINT"):
                    continue
                mine = read_int_column(path, cname, max_bytes=64 * 1024 * 1024)
                if mine is None:  # out of scope -> fallback path, fine
                    continue
                assert mine == _duck(path, cname), (path, cname)
                checked += 1
        assert checked >= 10


class TestSparkWritten:
    def _one_file(self, df, path, codec="snappy", block=None):
        w = df.coalesce(1).write.mode("overwrite").option("compression", codec)
        if block:
            w = w.option("parquet.block.size", block)
        w.parquet(path)
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert len(parts) == 1
        return os.path.join(path, parts[0])

    def test_nulls_and_negatives(self, spark, tmp_path):
        p = self._one_file(
            spark.range(0, 500).select(
                F.when(F.col("id") % 7 != 0, F.col("id").cast("int") - 250)
                .alias("v")
            ),
            str(tmp_path / "nulls"),
        )
        assert read_int_column(p, "v") == _duck(p, "v")

    def test_plain_pages_high_cardinality_int64(self, spark, tmp_path):
        # dictionary falls back to PLAIN mid-chunk at high cardinality
        p = self._one_file(
            spark.range(0, 200000).select(
                (F.col("id") * 2654435761).alias("v")
            ),
            str(tmp_path / "plain64"),
        )
        assert (
            read_int_column(p, "v", max_bytes=64 * 1024 * 1024)
            == _duck(p, "v")
        )

    def test_multiple_row_groups(self, spark, tmp_path):
        p = self._one_file(
            spark.range(0, 300000).select(
                (F.col("id") % 1000).cast("int").alias("v")
            ),
            str(tmp_path / "multirg"),
            block=256 * 1024,
        )
        assert (
            read_int_column(p, "v", max_bytes=64 * 1024 * 1024)
            == _duck(p, "v")
        )

    def test_unsupported_codec_falls_back_to_none(self, spark, tmp_path):
        p = self._one_file(
            spark.range(0, 100).select(F.col("id").alias("v")),
            str(tmp_path / "z"),
            codec="zstd",
        )
        assert read_int_column(p, "v") is None

    def test_oversized_file_falls_back_to_none(self):
        path = "/root/testdata/sf0.1/events.parquet"
        if not os.path.isfile(path):
            pytest.skip("testdata layout changed")
        assert read_int_column(path, "event_id", max_bytes=1024) is None


class TestQuayDimRows:
    @pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
    def test_driver_rows_bit_identical_to_spark_collect(self, spark, sf):
        import struct

        from osm2vdv462_spark.pipeline import datagen

        df = datagen.quay_sites(spark, f"/root/testdata/sf{sf}")
        fast = getattr(df, "_graft_dim_rows", None)
        assert fast is not None, "supplier dim fell out of reader scope"
        slow = [tuple(r) for r in df.collect()]
        assert len(fast) == len(slow)
        for f_, s_ in zip(sorted(fast), sorted(slow)):
            assert f_[0] == s_[0]
            # doubles must match to the BIT, not approximately
            assert struct.pack("<dd", *f_[1:]) == struct.pack("<dd", *s_[1:])


class TestOctagonDimUsesReader:
    def test_octagons_identical_to_fallback(self, spark):
        from osm2vdv462_spark.operators._guard import collect_dim
        from osm2vdv462_spark.pipeline import datagen

        sf = "/root/testdata/sf0.01"
        df = datagen.stop_area_octagons(spark, sf)
        fast = sorted((r[0], bytes(r[1])) for r in df._graft_dim_rows)
        nat = collect_dim(
            spark.read.parquet(f"{sf}/nation.parquet").select("n_nationkey"),
            "test",
        )
        slow = []
        for r in nat:
            key = r["n_nationkey"]
            cx = datagen.GRID_LON0 + datagen.GRID_STEP * (key % 5)
            cy = datagen.GRID_LAT0 + datagen.GRID_STEP * (key // 5)
            from osm2vdv462_spark.geo import wkb as _wkb

            slow.append(
                (
                    int(key),
                    bytes(
                        _wkb.encode_polygon([datagen._octagon_ring(cx, cy)])
                    ),
                )
            )
        assert fast == sorted(slow)
