"""Bucketed storage co-location: the join must plan with NO shuffle."""

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.operators import bucketing as bk


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir, tmp_path):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select(
            "doc_id", F.length("text").alias("n_chars_exact")
        )
        # external paths: spark.sql.warehouse.dir is static per-session,
        # so an explicit location keeps the data under pytest's tmp dir
        bk.write_bucketed(
            docs, "b_docs", "doc_id", n_buckets=8, path=str(tmp_path / "d")
        )
        bk.write_bucketed(
            stats, "b_stats", "doc_id", n_buckets=8, path=str(tmp_path / "s")
        )
        try:
            j = bk.bucketed_join(spark, "b_docs", "b_stats", "doc_id")
            # the join itself must not shuffle either side
            assert not bk.plan_has_exchange(j.select("doc_id", "n_chars_exact"))
            # and an aggregation on the bucket key is also exchange-free
            agg = (
                spark.table("b_docs")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n"))
            )
            assert not bk.plan_has_exchange(agg)
            # correctness: same rows as the plain join
            want = docs.join(stats, "doc_id").count()
            assert j.count() == want > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS b_docs")
            spark.sql("DROP TABLE IF EXISTS b_stats")

    def test_unbucketed_join_does_exchange(self, spark, sf_dir):
        # control: the same join over plain parquet shuffles (proves the
        # assertion above is detecting bucketing, not something else)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select("doc_id", F.length("text").alias("n"))
        with _no_broadcast(spark):
            j = docs.join(stats, "doc_id")
            assert bk.plan_has_exchange(j)


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *a):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
