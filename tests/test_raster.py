"""Raster <-> vector operators (operators/raster.py)."""

import numpy as np
from pyspark.sql import functions as F

from osm2vdv462_spark.operators import raster as R
from osm2vdv462_spark.pipeline import datagen


class TestRasterize:
    def test_mask_matches_count_and_area(self, spark, sf_dir):
        polys = datagen.stop_area_octagons(spark, sf_dir)
        out = R.rasterize_polygons(polys, res=12, px=16).collect()
        assert len(out) > 0
        per_poly = {}
        for r in out:
            m = np.unpackbits(
                np.frombuffer(bytes(r["mask"]), np.uint8), count=256
            )
            # packed mask bit count == reported inside count
            assert int(m.sum()) == r["n_inside"]
            per_poly[r["relation_id"]] = per_poly.get(r["relation_id"], 0) + r[
                "n_inside"
            ]
        # pixel-counted area ~ analytic octagon area (within pixel error)
        a, b = 0.0299, 0.0451
        c = b - a
        area = (2 * a) ** 2 - 2 * c * c
        px_deg = 180.0 / (1 << 12) / 16
        for k, n in per_poly.items():
            assert abs(n * px_deg * px_deg - area) / area < 0.05, (k, n)

    def test_zonal_equals_rasterize_weighted_band(self, spark, sf_dir):
        """raster->vector and vector->raster agree: summing the band
        under each rasterized mask reproduces zonal_stats."""
        polys = datagen.stop_area_octagons(spark, sf_dir)
        tiles = R.synth_tile_table(polys, res=12, px=16)
        zs = {
            r["relation_id"]: (r["n_px"], r["sum_v"])
            for r in R.zonal_stats(tiles, polys, res=12, px=16).collect()
        }
        burn = R.rasterize_polygons(polys, res=12, px=16).collect()
        acc = {}
        for r in burn:
            m = np.unpackbits(
                np.frombuffer(bytes(r["mask"]), np.uint8), count=256
            ).reshape(16, 16).astype(bool)
            band = R.synth_band(int(r["cell"]), 16)
            n, s = acc.get(r["relation_id"], (0, 0))
            acc[r["relation_id"]] = (n + int(m.sum()), s + int(band[m].sum()))
        assert acc == zs

    def test_partition_invariance(self, spark, sf_dir):
        polys = datagen.stop_area_octagons(spark, sf_dir)
        a = R.zonal_stats(
            R.synth_tile_table(polys.repartition(1), res=12, px=16),
            polys, res=12, px=16,
        ).collect()
        b = R.zonal_stats(
            R.synth_tile_table(polys.repartition(7), res=12, px=16),
            polys, res=12, px=16,
        ).collect()
        ka = sorted((r["relation_id"], r["n_px"], r["sum_v"]) for r in a)
        kb = sorted((r["relation_id"], r["n_px"], r["sum_v"]) for r in b)
        assert ka == kb
