"""Scan-efficiency guards: predicate pushdown and column pruning must
reach the parquet scans (a scan reading all columns for a 2-column
projection is wrong at any scale — task brief)."""

from pyspark.sql import functions as F


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln or
            "PushedFilters" in ln or "ReadSchema" in ln]


class TestScanEfficiency:
    def test_filter_pushes_to_parquet(self, spark, sf_dir):
        df = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.col("l_shipdate") <= "1998-09-02")
            .select("l_returnflag", "l_quantity")
        )
        txt = " ".join(_scan_lines(df))
        assert "PushedFilters: [" in txt and "l_shipdate" in txt.split(
            "PushedFilters"
        )[1], txt

    def test_projection_prunes_columns(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.length("text").alias("n")
        )
        txt = " ".join(_scan_lines(df))
        rs = txt.split("ReadSchema:")[1]
        # only the two consumed columns reach the scan
        assert "doc_id" in rs and "text" in rs
        assert "source" not in rs and "lang" not in rs, rs

    def test_registry_scan_prunes(self, spark, sf_dir):
        """A registry query's scan must not read unused columns
        (pricing_summary touches 7 of lineitem's 16)."""
        from osm2vdv462_spark import queries as q

        df = q.queries()["pricing_summary"](spark, sf_dir)
        txt = " ".join(_scan_lines(df))
        rs = txt.split("ReadSchema:")[1] if "ReadSchema:" in txt else ""
        assert "l_comment" not in rs and "l_shipmode" not in rs, rs
