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

    def test_image_table_join_prunes_bytes(self, spark, sf_dir, tmp_path):
        """The headline join (geotagged images -> PIP+kNN) over a parquet
        materialization of the image+caption table must scan ONLY
        (image_id, lon, lat): the KB-scale `bytes` payload and caption
        never leave the columnar file. This is what keeps the metric
        compute-bound at the 10^12-image scale BASELINE.json names."""
        from osm2vdv462_spark.operators.jvm_pip import pip_knn_assign_codegen
        from osm2vdv462_spark.pipeline import datagen, images as im

        path = str(tmp_path / "images.parquet")
        im.images_df(spark, sf_dir, every=50).write.parquet(path)
        imgs = spark.read.parquet(path).select("image_id", "lon", "lat")
        polys = datagen.stop_area_octagons(spark, sf_dir)
        quays = datagen.quay_sites(spark, sf_dir)
        df = pip_knn_assign_codegen(
            imgs, polys, quays, point_keep=["image_id"],
            poly_id="relation_id", target_id="quay_id", poly_res=12,
        )
        # the plan printer truncates long paths, so identify the image
        # scan by its ReadSchema content (the only scan with image_id)
        img_scan_lines = [
            ln for ln in _scan_lines(df)
            if "ReadSchema:" in ln and "image_id" in ln.split("ReadSchema:")[1]
        ]
        assert img_scan_lines, _scan_lines(df)
        rs = img_scan_lines[0].split("ReadSchema:")[1]
        assert "image_id" in rs and "lon" in rs and "lat" in rs, rs
        assert "bytes" not in rs and "caption" not in rs and "phash" not in rs, rs
        assert df.count() > 0

    def test_registry_scan_prunes(self, spark, sf_dir):
        """A registry query's scan must not read unused columns
        (pricing_summary touches 7 of lineitem's 16)."""
        from osm2vdv462_spark import queries as q

        qs = {**q.queries(), **q.extra_queries()}  # tier-agnostic:
        # rotation moves rows between the gate and parity tiers
        df = qs["pricing_summary"](spark, sf_dir)
        txt = " ".join(_scan_lines(df))
        rs = txt.split("ReadSchema:")[1] if "ReadSchema:" in txt else ""
        assert "l_comment" not in rs and "l_shipmode" not in rs, rs


class TestFinalR4PlanShapes:
    """Guards for the PLANS.md claims of the final-r4 batch."""

    def test_stratified_sample_prunes_and_avoids_exchange(self, spark, sf_dir):
        from osm2vdv462_spark.queries.text_queries import stratified_sample

        df = stratified_sample(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rs = plan.split("ReadSchema:")[1].splitlines()[0]
        # scan carries only the two consumed columns, never text
        assert "doc_id" in rs and "source" in rs and "text" not in rs, rs
        # stateless filter: the only exchange is the final global sort
        body = plan.split("Sort")[0] if "Sort" in plan else plan
        assert "Exchange hashpartitioning" not in body, plan

    def test_tile_clip_no_shuffle_between_explode_and_clip(self, spark, sf_dir):
        from osm2vdv462_spark.queries.geo_queries import tile_clip_areas

        df = tile_clip_areas(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # candidate fan-out (Generate/explode) and the Arrow clip stage
        # must share one task pipeline: no Exchange may sit between the
        # parquet scan and the python mapper (only the final sort
        # repartitions)
        mapper_at = plan.find("MapInPandas")
        scan_at = plan.find("FileScan parquet")
        assert mapper_at != -1 and scan_at != -1, plan
        between = plan[mapper_at:scan_at]
        assert "Exchange" not in between, between
        assert "Generate explode" in plan, plan


class TestDynamicPartitionPruning:
    """Spark's DPP must engage on partitioned fact scans joined to a
    filtered dim — the runtime analogue of the static partition-pruning
    tests above, and the mechanism that keeps dim-filtered joins from
    scanning the full 10^12-row fact table."""

    def test_dpp_engages_on_partitioned_fact_join(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        fact = ev.withColumn(
            "part_key", (F.col("event_id") % 10).cast("int")
        )
        path = str(tmp_path / "part_events")
        fact.write.partitionBy("part_key").parquet(path)
        f = spark.read.parquet(path)
        dim = (
            spark.range(10)
            .select(
                F.col("id").cast("int").alias("part_key"),
                (F.col("id") % 3).alias("grp"),
            )
            .filter("grp = 0")
        )
        j = f.join(dim, "part_key")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        # semantics: matches the static filter exactly
        want = fact.filter(F.col("part_key").isin(0, 3, 6, 9)).count()
        assert j.count() == want
