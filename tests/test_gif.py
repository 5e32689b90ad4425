"""GIF codec gate: the writer/parser pair must be bit-exact (GIF is
lossless indexed color), including the LZW edge paths — variable code
widths across every palette size, KwKwK self-reference, dictionary-full
clear-code resets, sub-block splits past 255 bytes — plus loud failures
on the features we never emit (interlace, truncation).
"""

import numpy as np
import pytest

from osm2vdv462_spark.functions import gifcodec, imagecodec


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("ncolors", [1, 2, 3, 16, 64, 200, 256])
def test_roundtrip_every_palette_size(ncolors):
    rng = _rng(ncolors)
    idx = rng.integers(0, ncolors, size=(17, 23), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    data = gifcodec.encode_gif(idx, pal)
    out = gifcodec.decode_gif(data)
    assert out.shape == (17, 23, 3)
    assert np.array_equal(out, pal[idx])


def test_dictionary_reset_path_large_noise_image():
    # 128x128 of 256-color noise assigns far beyond 4096 LZW codes,
    # forcing at least one mid-stream clear + width reset on both sides
    rng = _rng(7)
    idx = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    data = gifcodec.encode_gif(idx, pal)
    assert len(data) > 4096  # enough stream to have cycled the table
    assert np.array_equal(gifcodec.decode_gif(data), pal[idx])


def test_kwkwk_and_flat_runs():
    # long constant runs exercise the code==len(table) (KwKwK) branch
    idx = np.zeros((9, 300), dtype=np.uint8)
    idx[:, 150:] = 1
    pal = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    out = gifcodec.decode_gif(gifcodec.encode_gif(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_decode_image_dispatch_and_extension_skip():
    idx = (np.add.outer(np.arange(8), np.arange(8)) % 4).astype(np.uint8)
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    data = bytearray(gifcodec.encode_gif(idx, pal))
    # splice a graphic-control extension between the GCT and the image
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    insert_at = 13 + 3 * 4  # header + LSD + 4-entry GCT
    data = bytes(data[:insert_at]) + gce + bytes(data[insert_at:])
    out = imagecodec.decode_image(data, "gif")
    assert np.array_equal(out, pal[idx])


def test_unsupported_and_corrupt_inputs_raise():
    idx = np.zeros((4, 4), dtype=np.uint8)
    pal = np.array([[1, 2, 3]], dtype=np.uint8)
    data = bytearray(gifcodec.encode_gif(idx, pal))
    with pytest.raises(ValueError):
        gifcodec.decode_gif(b"NOTGIF" + bytes(data[6:]))
    # flip the interlace bit in the image descriptor (after header+LSD+GCT)
    flagged = bytearray(data)
    desc_at = 13 + 3 * 2  # 1-color palette pads to 2 entries
    assert flagged[desc_at] == 0x2C
    flagged[desc_at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gifcodec.decode_gif(bytes(flagged))
    with pytest.raises(ValueError):
        gifcodec.decode_gif(bytes(data[: len(data) // 2]))
    with pytest.raises(ValueError):
        gifcodec.encode_gif(idx + 5, pal)  # index beyond palette
