"""BMP + GIF codecs vs the reference's published checksums
(``autotest/gcore/bmp_read.py:36-39``, ``autotest/gdrivers/gif.py:48``)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from raydal.io.bmp import decode_bmp, encode_bmp
from raydal.io.codecs import decode
from raydal.io.gif import decode_gif
from raydal.kernels.checksum import checksum

GCORE = "/root/reference/autotest/gcore/data/"
GIF = "/root/reference/autotest/gdrivers/data/gif/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(GCORE), reason="reference fixtures not present")


@needs_fixtures
@pytest.mark.parametrize("fn,expected", [
    ("1bit.bmp", 200),          # 1-bit packed
    ("4bit_pal.bmp", 2587),     # 4-bit nibbles
    ("8bit_pal.bmp", 4672),     # 8-bit paletted
    ("byte_rle8.bmp", 4672),    # RLE8 compression
])
def test_bmp_published_checksums(fn, expected):
    img, pal = decode_bmp(open(GCORE + fn, "rb").read())
    assert checksum(img) == expected
    # codec dispatch sniffs the BM magic
    assert checksum(decode(open(GCORE + fn, "rb").read())) == expected


@needs_fixtures
def test_bmp_round_trips():
    img, pal = decode_bmp(open(GCORE + "8bit_pal.bmp", "rb").read())
    img2, pal2 = decode_bmp(encode_bmp(img, pal))
    np.testing.assert_array_equal(img, img2)
    np.testing.assert_array_equal(pal, pal2[:len(pal)])
    rgb = np.random.default_rng(0).integers(
        0, 255, (33, 37, 3), dtype=np.uint8)
    rgb2, _ = decode_bmp(encode_bmp(rgb))
    np.testing.assert_array_equal(rgb, rgb2)


@needs_fixtures
def test_gif_published_checksum():
    # autotest/gdrivers/gif.py:48 — bug407.gif band 1 checksum 57921
    idx, pal, tr = decode_gif(open(GIF + "bug407.gif", "rb").read())
    assert idx.shape == (400, 400)
    assert checksum(idx) == 57921
    assert checksum(decode(open(GIF + "bug407.gif", "rb").read())) == 57921


@needs_fixtures
def test_gif_byte_family():
    # byte_with_xmp.gif carries the byte.tif raster (family value 4672)
    idx, pal, tr = decode_gif(open(GIF + "byte_with_xmp.gif", "rb").read())
    assert checksum(idx) == 4672


@needs_fixtures
def test_gif_encode_createcopy_value():
    """CreateCopy parity (autotest/gdrivers/gif.py:95): byte.tif written
    to GIF reads back with the published checksum 4672."""
    from raydal.io.gif import encode_gif
    from raydal.io.tiff import read_tiff

    byte = read_tiff(open(GCORE + "byte.tif", "rb").read()).bands[0]
    idx, pal, tr = decode_gif(encode_gif(byte))
    np.testing.assert_array_equal(idx, byte)
    assert checksum(idx) == 4672


def test_gif_encode_round_trips():
    from raydal.io.gif import encode_gif

    rng = np.random.default_rng(1)
    # >4096 dictionary entries forces the in-stream CLEAR/reset path
    big = rng.integers(0, 256, (300, 400), dtype=np.uint8)
    idx, _, _ = decode_gif(encode_gif(big))
    np.testing.assert_array_equal(idx, big)
    # low-color palette exercises small initial code widths
    small = rng.integers(0, 4, (64, 64)).astype(np.uint8)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx2, pal2, _ = decode_gif(encode_gif(small, palette=pal))
    np.testing.assert_array_equal(idx2, small)
    np.testing.assert_array_equal(pal2, pal)


@needs_fixtures
def test_gif_palette_rgb_expand_golden():
    """gdal_translate -expand rgb parity: bug407.gif expanded through its
    color table gives the published per-band checksums
    (autotest/utilities/test_gdal_translate_lib.py:158-162)."""
    idx, pal, tr = decode_gif(open(GIF + "bug407.gif", "rb").read())
    rgb = pal[idx]
    assert [checksum(rgb[:, :, b]) for b in range(3)] == \
        [20615, 59147, 63052]
