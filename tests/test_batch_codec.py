"""Batch-vs-per-image equivalence pins for the vectorized codec paths
(round-6 optimization): encode_jpeg_batch / decoded_pixels_from_coeffs /
decode_jpeg_many and the imagecodec batched twins must be BIT-IDENTICAL
to the per-image functions they replace inside images_df /
with_decode_verify — the gate oracles hash their outputs."""

from __future__ import annotations

import numpy as np
import pytest

from osm2vdv462_spark.functions import imagecodec as ic, jpegcodec as J

IDS = np.array(
    list(range(0, 120)) + [999, 12345, 999999, 10**7 + 3], np.int64
)


@pytest.mark.parametrize("size", [16, 32])
@pytest.mark.parametrize("quality", [80, 92])
def test_encode_jpeg_batch_byte_identical(size, quality):
    px = np.stack([ic.synth_pixels_smooth(int(i), size, size) for i in IDS])
    blobs, _ = J.encode_jpeg_batch(px, quality=quality)
    for k, i in enumerate(IDS):
        assert blobs[k] == J.encode_jpeg(px[k], quality=quality)


def test_encode_jpeg_batch_nonmultiple_size_pads_like_single():
    px = np.stack([ic.synth_pixels_smooth(int(i), 20, 12) for i in IDS[:30]])
    blobs, coeffs = J.encode_jpeg_batch(px, quality=92)
    for k in range(len(blobs)):
        assert blobs[k] == J.encode_jpeg(px[k], quality=92)
    dp = J.decoded_pixels_from_coeffs(coeffs, 92, 12, 20)
    for k, b in enumerate(blobs):
        assert np.array_equal(dp[k], J.decode_jpeg(b))


def test_encode_jpeg_batch_sawtooth_high_energy():
    # sawtooth content exercises ZRL runs and long symbol streams
    px = np.stack([ic.synth_pixels(int(i), 32, 32) for i in IDS[:60]])
    for q in (50, 92):
        blobs, _ = J.encode_jpeg_batch(px, quality=q)
        for k in range(len(blobs)):
            assert blobs[k] == J.encode_jpeg(px[k], quality=q)


def test_decoded_pixels_from_coeffs_equals_decode():
    px = np.stack([ic.synth_pixels_smooth(int(i), 32, 32) for i in IDS])
    blobs, coeffs = J.encode_jpeg_batch(px, quality=92)
    dp = J.decoded_pixels_from_coeffs(coeffs, 92, 32, 32)
    for k, b in enumerate(blobs):
        assert np.array_equal(dp[k], J.decode_jpeg(b))


def test_decode_jpeg_many_mixed_batch():
    base = [
        J.encode_jpeg(ic.synth_pixels_smooth(i, 32, 32), quality=92)
        for i in range(6)
    ]
    prog = J.encode_jpeg_progressive(
        ic.synth_pixels_smooth(3, 32, 32), quality=92
    )
    small = J.encode_jpeg(ic.synth_pixels_smooth(9, 16, 16), quality=80)
    mix = base + [prog, small]
    got = J.decode_jpeg_many(mix)
    for k, b in enumerate(mix):
        assert np.array_equal(got[k], J.decode_jpeg(b))


def test_decode_jpeg_many_skip_errors_yields_none():
    good = J.encode_jpeg(ic.synth_pixels_smooth(1, 16, 16), quality=92)
    # arithmetic-coded SOF marker -> NotImplementedError per image
    bad = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    out = J.decode_jpeg_many([good, bad, good], skip_errors=True)
    assert out[1] is None
    assert np.array_equal(out[0], J.decode_jpeg(good))
    assert np.array_equal(out[2], J.decode_jpeg(good))
    with pytest.raises(NotImplementedError):
        J.decode_jpeg_many([good, bad])


@pytest.mark.parametrize("size", [16, 32])
def test_imagecodec_batched_twins(size):
    sp = ic.synth_pixels_batch(IDS, size, size)
    ss = ic.synth_pixels_smooth_batch(IDS, size, size)
    for k, i in enumerate(IDS):
        assert np.array_equal(sp[k], ic.synth_pixels(int(i), size, size))
        assert np.array_equal(
            ss[k], ic.synth_pixels_smooth(int(i), size, size)
        )
    hb = ic.phash64_batch(sp)
    hs = ic.phash64_batch(ss)
    for k in range(len(IDS)):
        assert int(hb[k]) == ic.phash64(sp[k])
        assert int(hs[k]) == ic.phash64(ss[k])
    pv = ic.psnr_db_batch(sp, ss)
    for k in range(len(IDS)):
        assert pv[k] == ic.psnr_db(sp[k], ss[k])
    assert np.isinf(ic.psnr_db_batch(sp, sp)).all()


def test_png_filter0_fast_path_roundtrip():
    for i in range(0, 50, 7):
        px = ic.synth_pixels(i, 32, 32)
        assert np.array_equal(ic.decode_png(ic.encode_png(px)), px)
