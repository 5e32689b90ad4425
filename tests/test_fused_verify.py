"""r6: with_decode_verify fuses with images_df into one MapInPandas
(operator fusion, one Python crossing) — pin plan shape + bit-identity
against the unfused path."""

from osm2vdv462_spark.pipeline import images as im

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestFusedVerify:
    def test_single_crossing_and_identical_rows(self, spark):
        fused = im.with_decode_verify(im.images_df(spark, SF, mixed_formats=True))
        assert _plan(fused).count("MapInPandas") == 1

        plain = im.images_df(spark, SF, mixed_formats=True)
        plain.__dict__.pop("_graft_gen", None)  # force the unfused path
        unfused = im.with_decode_verify(plain)
        assert _plan(unfused).count("MapInPandas") == 2

        a = sorted(tuple(r) for r in fused.drop("bytes").collect())
        b = sorted(tuple(r) for r in unfused.drop("bytes").collect())
        assert a == b
        assert sorted(bytes(r["bytes"]) for r in fused.collect()) == sorted(
            bytes(r["bytes"]) for r in unfused.collect()
        )

    def test_transformed_frame_falls_back(self, spark):
        # any transform drops the marker -> the verify must still work
        df = im.images_df(spark, SF).filter("w = 32")
        out = im.with_decode_verify(df)
        assert _plan(out).count("MapInPandas") == 2
        rows = out.select("pixel_ok", "phash_ok").collect()
        assert rows and all(r["pixel_ok"] and r["phash_ok"] for r in rows)

    def test_exif_chain_fuses(self, spark):
        fused = im.with_exif_gps(im.exif_images_df(spark, SF))
        assert _plan(fused).count("MapInPandas") == 1
        plain = im.exif_images_df(spark, SF)
        plain.__dict__.pop("_graft_gen", None)
        unfused = im.with_exif_gps(plain)
        assert _plan(unfused).count("MapInPandas") == 2
        assert sorted(tuple(r) for r in fused.collect()) == sorted(
            tuple(r) for r in unfused.collect()
        )

    def test_progressive_path_fuses_too(self, spark):
        fused = im.with_decode_verify(
            im.images_df(spark, SF, mixed_formats="prog")
        )
        assert _plan(fused).count("MapInPandas") == 1
        rows = fused.select("fmt", "pixel_ok").collect()
        assert any(r["fmt"] == "jpeg_prog" for r in rows)
        assert all(r["pixel_ok"] for r in rows)
