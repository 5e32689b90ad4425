"""Hot-cell skew handling (north rule: "salted repartitioning on hot
cells — dense urban stop clusters"): a pathological distribution where
~90% of points fall into ONE grid cell must still produce exact results
through the salted shuffle plan, and salting must actually spread the
hot cell across partitions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.geo import wkb as _wkb
from osm2vdv462_spark.operators.spatial_join import pip_join_broadcast, pip_join_shuffle
from osm2vdv462_spark.pipeline.world import _rect


@pytest.fixture(scope="module")
def skewed(spark):
    # 20k points: 90% inside one "city" polygon cell, 10% spread out
    n = 20_000
    city = spark.range(0, int(n * 0.9)).select(
        F.col("id").alias("event_id"),
        (F.lit(11.5000) + (F.col("id") % 97) * 1e-6).alias("lon"),
        (F.lit(48.1000) + (F.col("id") % 89) * 1e-6).alias("lat"),
    )
    rest = spark.range(int(n * 0.9), n).select(
        F.col("id").alias("event_id"),
        (F.lit(11.0) + (F.col("id") % 1000) * 1e-3).alias("lon"),
        (F.lit(47.8) + (F.col("id") % 700) * 1e-3).alias("lat"),
    )
    pts = city.unionByName(rest)
    polys = spark.createDataFrame(
        [
            (1, bytearray(_wkb.encode_polygon([_rect(11.5, 48.1, 400, 400)]))),
            (2, bytearray(_wkb.encode_polygon([_rect(11.3, 48.0, 400, 400)]))),
        ],
        "relation_id long, geom binary",
    )
    return pts.cache(), polys


class TestSkew:
    def test_salted_shuffle_matches_broadcast(self, spark, skewed):
        pts, polys = skewed
        a = pip_join_broadcast(
            pts, polys, point_keep=["event_id"], poly_id="relation_id",
            poly_wkb="geom", res=14,
        )
        b = pip_join_shuffle(
            pts, polys, point_keep=["event_id"], poly_id="relation_id",
            poly_wkb="geom", res=14, salt=8,
        )
        ra = sorted((r["event_id"], r["relation_id"]) for r in a.collect())
        rb = sorted((r["event_id"], r["relation_id"]) for r in b.collect())
        assert ra == rb and len(ra) >= int(20_000 * 0.9)

    def test_salt_spreads_hot_cell(self, spark, skewed):
        pts, polys = skewed
        from osm2vdv462_spark.geo.columns import cell_of

        keyed = pts.withColumn("_cell", cell_of(F.col("lon"), F.col("lat"), 14))
        top = keyed.groupBy("_cell").count().orderBy(F.desc("count")).first()
        assert top["count"] >= 15_000  # the skew is real
        salted = keyed.withColumn(
            "_salt", F.pmod(F.xxhash64("event_id"), F.lit(8)).cast("int")
        )
        per_key = (
            salted.filter(F.col("_cell") == top["_cell"])
            .groupBy("_salt")
            .count()
            .collect()
        )
        counts = [r["count"] for r in per_key]
        assert len(counts) == 8  # hot cell split into 8 shuffle keys
        assert max(counts) < top["count"] * 0.25  # no residual hot key