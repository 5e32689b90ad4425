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


class TestFocalStats:
    PX = 8
    R_ = 12

    def _tiles(self, spark, coords):
        from osm2vdv462_spark.geo import cells as C

        rows = []
        for ix, iy in coords:
            cell = int(
                C.pack(
                    self.R_,
                    np.array([ix], np.int64),
                    np.array([iy], np.int64),
                )[0]
            )
            rows.append(
                (cell, bytearray(R.synth_band(cell, self.PX).tobytes()))
            )
        return spark.createDataFrame(rows, "cell bigint, band binary")

    def _serial_focal36(self, coords):
        """Assemble the whole block into one global array and convolve
        serially — independent of the halo-exchange plan."""
        from osm2vdv462_spark.geo import cells as C

        px = self.PX
        xs = sorted({c[0] for c in coords})
        ys = sorted({c[1] for c in coords})
        x0, y0 = xs[0], ys[0]
        W, H = (xs[-1] - x0 + 1) * px, (ys[-1] - y0 + 1) * px
        big = np.zeros((H, W), np.int64)
        for ix, iy in coords:
            cell = int(
                C.pack(
                    self.R_, np.array([ix], np.int64), np.array([iy], np.int64)
                )[0]
            )
            big[
                (iy - y0) * px : (iy - y0 + 1) * px,
                (ix - x0) * px : (ix - x0 + 1) * px,
            ] = R.synth_band(cell, px)
        out = {}
        for ix, iy in coords:
            cell = int(
                C.pack(
                    self.R_, np.array([ix], np.int64), np.array([iy], np.int64)
                )[0]
            )
            s = mn = None
            mx = None
            tot = 0
            for i in range((iy - y0) * px, (iy - y0 + 1) * px):
                for j in range((ix - x0) * px, (ix - x0 + 1) * px):
                    acc = cnt = 0
                    for u in (-1, 0, 1):
                        for v in (-1, 0, 1):
                            if 0 <= i + u < H and 0 <= j + v < W:
                                acc += big[i + u, j + v]
                                cnt += 1
                    f36 = acc * 36 // cnt
                    tot += f36
                    mn = f36 if mn is None else min(mn, f36)
                    mx = f36 if mx is None else max(mx, f36)
            out[cell] = (tot, mn, mx)
        return out

    def test_halo_exchange_matches_serial_convolution(self, spark):
        coords = [(100 + a, 200 + b) for a in range(3) for b in range(2)]
        got = {
            r["cell"]: (r["sum_foc36"], r["min_foc36"], r["max_foc36"])
            for r in R.focal_stats36(self._tiles(spark, coords), self.PX).collect()
        }
        want = self._serial_focal36(coords)
        assert got == want

    def test_single_tile_block_is_all_boundary(self, spark):
        coords = [(50, 60)]
        got = R.focal_stats36(self._tiles(spark, coords), self.PX).collect()
        want = self._serial_focal36(coords)
        assert len(got) == 1
        r = got[0]
        assert (r["sum_foc36"], r["min_foc36"], r["max_foc36"]) == want[
            r["cell"]
        ]

    def test_non_rectangular_coverage_raises(self, spark):
        # L-shape: counts of 8 appear at the inner corner -> not /36
        coords = [(10, 10), (11, 10), (10, 11)]
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError

        with _pytest.raises(Exception) as ei:
            R.focal_stats36(self._tiles(spark, coords), self.PX).collect()
        assert "rectangular" in str(ei.value)
