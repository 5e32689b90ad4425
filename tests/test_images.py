"""Image codec + images-table tests (input_hint invariant)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.functions import imagecodec as ic
from osm2vdv462_spark.pipeline import images as im


class TestCodec:
    def test_png_roundtrip_exact(self):
        px = ic.synth_pixels(42, 32, 32)
        data = ic.encode_png(px)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        got = ic.decode_png(data)
        np.testing.assert_array_equal(got, px)
        assert ic.psnr_db(px, got) == float("inf")

    def test_png_filters_decode(self):
        # exercise filter reconstruction against a tiny hand-filtered image
        import struct, zlib

        w = h = 4
        px = ic.synth_pixels(7, w, h)
        # encode with filter type 2 (Up) manually
        rows = []
        prev = np.zeros(w * 3, np.uint8)
        for y in range(h):
            line = px[y].reshape(-1)
            rows.append(b"\x02" + ((line.astype(np.int64) - prev) % 256).astype(np.uint8).tobytes())
            prev = line
        raw = b"".join(rows)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + ic._chunk(b"IHDR", ihdr)
            + ic._chunk(b"IDAT", zlib.compress(raw))
            + ic._chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(ic.decode_png(data), px)

    def test_jpeg_real_since_r4(self):
        # decode_image routes jpeg to the from-scratch baseline codec
        from osm2vdv462_spark.functions import jpegcodec as J

        px = ic.synth_pixels_smooth(11, 16, 16)
        dec = ic.decode_image(J.encode_jpeg(px, quality=95), "jpeg")
        assert ic.psnr_db(px, dec) >= 40.0
        # truncated stream fails loudly, not with a random IndexError
        with pytest.raises(ValueError):
            ic.decode_image(b"\xff\xd8\xff", "jpeg")

    def test_phash_stability_and_sensitivity(self):
        a = ic.synth_pixels(1)
        assert ic.phash64(a) == ic.phash64(a.copy())
        b = ic.synth_pixels(2)
        assert ic.phash64(a) != ic.phash64(b)

    def test_psnr(self):
        a = ic.synth_pixels(3)
        noisy = a.astype(np.int16).copy()
        noisy[0, 0, 0] += 5
        p = ic.psnr_db(a, np.clip(noisy, 0, 255).astype(np.uint8))
        assert 40 < p < 100


class TestImagesTable:
    def test_schema_and_invariant(self, spark, sf_dir):
        df = im.images_df(spark, sf_dir)
        v = im.with_decode_verify(df)
        rows = v.select("pixel_ok", "caption_ok", "phash_ok", "psnr").collect()
        assert len(rows) == 1000
        assert all(r["pixel_ok"] and r["caption_ok"] and r["phash_ok"] for r in rows)
        assert all(r["psnr"] == float("inf") for r in rows)  # lossless

    def test_resize_plumbing(self, spark, sf_dir):
        df = im.images_df(spark, sf_dir).limit(20)
        th = im.with_resized_phash(df, 8, 8).collect()
        assert len(th) == 20
        for r in th:
            px = ic.decode_png(bytes(r["thumb"]))
            assert px.shape == (8, 8, 3)
            assert r["thumb_phash"] is not None

    # video frame sampling moved to pipeline/video.py in r4 (real
    # RIFF/AVI decode path) — see tests/test_video.py


class TestSharpness:
    def _lap_var_e4(self, t: np.ndarray) -> int:
        t = t.astype(np.int64)
        lap = (
            4 * t[1:-1, 1:-1]
            - t[:-2, 1:-1]
            - t[2:, 1:-1]
            - t[1:-1, :-2]
            - t[1:-1, 2:]
        )
        n = lap.size
        s1, s2 = int(lap.sum()), int((lap * lap).sum())
        return (n * s2 - s1 * s1) * 10000 // (n * n)

    def test_blur_lowers_score(self):
        """The whole point of the metric: a box-blurred copy of the
        same image must score strictly lower."""
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (32, 32, 3)).astype(np.int64)
        t = px.sum(axis=2)
        blurred = (
            t[:-2, :-2] + t[:-2, 1:-1] + t[:-2, 2:]
            + t[1:-1, :-2] + t[1:-1, 1:-1] + t[1:-1, 2:]
            + t[2:, :-2] + t[2:, 1:-1] + t[2:, 2:]
        ) // 9
        assert self._lap_var_e4(blurred) < self._lap_var_e4(t) // 4

    def test_matches_decode_path(self, spark, sf_dir):
        """with_sharpness through the real PNG decode == the metric on
        the closed-form reference pixels."""
        df = im.images_df(spark, sf_dir, every=100).limit(10)
        got = {r["image_id"]: r["lap_var_e4"] for r in im.with_sharpness(df).collect()}
        assert got
        for image_id, v in got.items():
            eid = int(image_id.split("_")[1])
            ref = ic.synth_pixels(eid, 32, 32).astype(np.int64).sum(axis=2)
            assert v == self._lap_var_e4(ref), image_id


class TestEdgeStats:
    def _mag(self, t: np.ndarray) -> np.ndarray:
        t = t.astype(np.int64)
        gx = (t[:-2, 2:] + 2 * t[1:-1, 2:] + t[2:, 2:]) - (
            t[:-2, :-2] + 2 * t[1:-1, :-2] + t[2:, :-2]
        )
        gy = (t[2:, :-2] + 2 * t[2:, 1:-1] + t[2:, 2:]) - (
            t[:-2, :-2] + 2 * t[:-2, 1:-1] + t[:-2, 2:]
        )
        return np.abs(gx) + np.abs(gy)

    def test_flat_image_has_zero_edges(self):
        t = np.full((32, 32), 300, np.int64)
        assert self._mag(t).max() == 0

    def test_step_edge_detected_and_blur_lowers_density(self):
        """A hard vertical step fires the threshold along the step;
        box-blurring the same image strictly lowers the edge count."""
        t = np.zeros((32, 32), np.int64)
        t[:, 16:] = 765
        mag = self._mag(t)
        assert (mag >= im.EDGE_T).sum() >= 30  # the step column
        rng = np.random.default_rng(7)
        noisy = rng.integers(0, 256, (32, 32)).astype(np.int64) * 3
        blurred = (
            noisy[:-2, :-2] + noisy[:-2, 1:-1] + noisy[:-2, 2:]
            + noisy[1:-1, :-2] + noisy[1:-1, 1:-1] + noisy[1:-1, 2:]
            + noisy[2:, :-2] + noisy[2:, 1:-1] + noisy[2:, 2:]
        ) // 9
        n_sharp = (self._mag(noisy) >= im.EDGE_T).sum()
        n_blur = (self._mag(blurred) >= im.EDGE_T).sum()
        assert n_blur < n_sharp // 2

    def test_matches_decode_path(self, spark, sf_dir):
        df = im.images_df(spark, sf_dir, every=100).limit(10)
        got = {
            r["image_id"]: (r["edge_count"], r["mag_sum"])
            for r in im.with_edge_stats(df).collect()
        }
        assert got
        for image_id, (ec, ms) in got.items():
            eid = int(image_id.split("_")[1])
            ref = ic.synth_pixels(eid, 32, 32).astype(np.int64).sum(axis=2)
            mag = self._mag(ref)
            assert ec == int((mag >= im.EDGE_T).sum()), image_id
            assert ms == int(mag.sum()), image_id


class TestDctPhash:
    """True pHash (DCT) kernel — cross-checks the batched einsum path in
    pipeline/images.with_dct_phash against the scalar kernel and the
    perceptual property aHash lacks."""

    def test_scalar_matches_batched_einsum(self, spark, sf_dir):
        df = im.images_df(spark, sf_dir, every=100).limit(10)
        got = {
            r["image_id"]: (r["dct_phash"], r["n_above"])
            for r in im.with_dct_phash(df).collect()
        }
        assert got
        for image_id, (h, n_above) in got.items():
            eid = int(image_id.split("_")[1])
            px = ic.synth_pixels(eid, 32, 32)
            ref = ic.dct_phash64(px)
            # dct_phash64 returns the unsigned packing (bit 63 is never
            # set: DC is excluded), so no sign fixup is needed
            assert h == ref, image_id
            assert 0 < n_above <= 32

    def test_brightness_shift_invariance(self):
        # a uniform brightness shift is pure DC; with no clipping the 63
        # AC coefficients (and their median) are EXACTLY unchanged, so
        # the hash is bit-identical — the invariance aHash only
        # approximates
        for eid in (2, 4, 6, 8):
            px = (ic.synth_pixels(eid, 32, 32) // 2 + 40).astype(np.uint8)
            shifted = (px.astype(np.int64) + 6).astype(np.uint8)  # max 173
            assert ic.dct_phash64(px) == ic.dct_phash64(shifted)

    def test_requantization_robustness(self):
        # the reason pHash exists: JPEG requantization perturbs pixels
        # but leaves low-frequency DCT signs (vs their median) stable —
        # PROVIDED the image is band-limited (real photos are; a raw
        # sawtooth whose low block is noise-floor is the documented
        # out-of-regime case). Fixture: 4x box-blurred patterns, the
        # 32x32-downscale-of-a-photo operating point.
        from osm2vdv462_spark.functions import jpegcodec

        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        def boxblur(a):
            p = np.pad(a, ((1, 1), (1, 1), (0, 0)), mode="edge").astype(np.float64)
            return (
                p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
                + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
            ) / 9

        hashes = []
        for eid in (2, 4, 6, 8, 10, 12):
            px = ic.synth_pixels(eid, 32, 32).astype(np.float64)
            for _ in range(4):
                px = boxblur(px)
            px = np.clip(px, 0, 249).astype(np.uint8)
            h0 = ic.dct_phash64(px)
            hashes.append(h0)
            rq = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(px, quality=80))
            assert ham(h0, ic.dct_phash64(rq)) <= 6
        cross = min(
            ham(a, b) for i, a in enumerate(hashes) for b in hashes[i + 1 :]
        )
        assert cross >= 16  # requantized-self is FAR inside the cross margin

    def test_distinct_images_far_apart(self):
        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        hs = [ic.dct_phash64(ic.synth_pixels(e, 32, 32)) for e in range(0, 40, 4)]
        pairs = [(i, j) for i in range(len(hs)) for j in range(i + 1, len(hs))]
        dists = [ham(hs[i], hs[j]) for i, j in pairs]
        assert min(dists) >= 10  # unrelated patterns don't collide


class TestBinaryStageParallelism:
    """Direct-memory-aware decode concurrency (sf1 incident: netty's
    16 MiB arena chunks x 32 concurrent Arrow crossings exceeded the
    1 GiB direct cap of a plain session and killed the JVM — see
    deploy.binary_stage_parallelism and BENCH/sf1_round5.json)."""

    def test_capped_by_reported_direct_memory(self, spark):
        from osm2vdv462_spark import deploy

        par = deploy.binary_stage_parallelism(spark)
        max_direct = int(
            spark._jvm.io.netty.util.internal.PlatformDependent.maxDirectMemory()
        )
        budget_cap = max(4, (max_direct - (256 << 20)) // (64 << 20))
        assert par == min(
            spark.sparkContext.defaultParallelism * 2, budget_cap
        )
        assert par >= 4  # floor: never serializes the stage entirely
        # test session (8g driver) must NOT be capped below its cores
        assert par >= spark.sparkContext.defaultParallelism

    def test_decode_stage_partition_count_follows_cap(self, spark, sf_dir):
        from osm2vdv462_spark import deploy
        from osm2vdv462_spark.pipeline import images as im

        df = im.images_df(spark, sf_dir, size=8, every=50)
        assert (
            df.rdd.getNumPartitions()
            == deploy.binary_stage_parallelism(spark)
        )

    def test_cap_is_local_mode_only(self, spark, monkeypatch):
        """On a real cluster the probe would read the DRIVER's direct
        memory while crossings run on executors — the cap must not
        throttle a cluster-wide stage to one JVM's budget."""
        from osm2vdv462_spark import deploy

        class FakeSC:
            master = "spark://head:7077"
            defaultParallelism = 4096

        class FakeSpark:
            sparkContext = FakeSC()

        assert deploy.binary_stage_parallelism(FakeSpark()) == 8192
