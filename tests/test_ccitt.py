"""CCITT T.4/T.6 codec parity: published checksums (tiff_read.py
test_tiff_g4_split → slim_g4.tif cs 3322; nitf.py test_nitf_19 →
U_1050A.NTF cs 65024) plus encoder/decoder round-trips."""

import os

import numpy as np
import pytest

from raydal.io.ccitt import (decode_g3, decode_g4, encode_g3_1d,
                             encode_g4)
from raydal.kernels.checksum import checksum

REF = "/root/reference/autotest"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference autotest data absent")


@pytest.mark.parametrize("shape,seed,dens", [
    ((37, 101), 5, 0.3), ((16, 64), 7, 0.5), ((200, 321), 1, 0.2),
    ((8, 2560 + 70), 3, 0.01),        # long runs exercise makeup codes
])
def test_roundtrips(shape, seed, dens):
    rng = np.random.default_rng(seed)
    img = (rng.random(shape) < dens).astype(np.uint8)
    h, w = shape
    assert (decode_g4(encode_g4(img), w, h) == img).all()
    assert (decode_g3(encode_g3_1d(img), w, h) == img).all()


def test_rows_starting_black():
    img = np.zeros((4, 20), np.uint8)
    img[1, :] = 1
    img[2, :3] = 1
    assert (decode_g4(encode_g4(img), 20, 4) == img).all()
    assert (decode_g3(encode_g3_1d(img), 20, 4) == img).all()


@needs_ref
def test_slim_g4_checksum():
    from raydal.io.tiff import read_tiff
    r = read_tiff(open(REF + "/gcore/data/slim_g4.tif", "rb").read())
    a = np.asarray(r.bands)[0]
    assert a.shape == (7200, 1000)
    assert checksum(a) == 3322


@needs_ref
def test_nitf_c1_bilevel():
    from raydal.io.nitf import read_nitf
    arr, _gt, _nd = read_nitf(
        REF + "/gdrivers/data/nitf/U_1050A.NTF")
    assert arr.shape == (1, 1024, 1024)
    assert checksum(arr[0]) == 65024
