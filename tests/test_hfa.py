"""Erdas Imagine HFA reader vs the reference's published
expectations (``autotest/gdrivers/hfa.py``)."""

import numpy as np
import pytest

from raydal.io.hfa import hfa_geotransform, open_hfa, read_hfa
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/hfa/"


def test_hfa_int_read():
    # hfa.py test_hfa_int_read: checksum 6691 (s32, ESRI RLE blocks)
    a, gt, nd = read_hfa(DATA + "int.img")
    assert a.dtype == np.int32
    assert checksum(a[0]) == 6691
    # MapInfo pixel-center corners widened by half a pixel
    assert gt == (135362.5, 100.0, 0.0, 7122712.5, 0.0, -100.0)


def test_hfa_float_read():
    # test_hfa_float_read: checksum 23529, pixel (100,100) value
    a, _, _ = read_hfa(DATA + "float.img")
    assert a.dtype == np.float32
    assert checksum(a[0]) == 23529
    assert a[0, 100, 100] == pytest.approx(41.021659851074219,
                                           abs=0.0001)


def test_hfa_spill_and_rrd_overview():
    # test_hfa_rde_overviews: band cs 1631 (spill .ige), overview
    # cs 340 (spill.rrd -> spill.rde external stack)
    a, _, _ = read_hfa(DATA + "spill.img")
    assert checksum(a[0]) == 1631
    ov, _, _ = read_hfa(DATA + "spill.rrd")
    assert checksum(ov[0]) == 340


def test_hfa_bit2grayscale_overview():
    # test_hfa_read_bit2grayscale: 8-bit grayscale overview of the
    # 1-bit image, checksum 4247
    ov, _, _ = read_hfa(DATA + "small1bit.rrd")
    assert checksum(ov[0]) == 4247


def test_hfa_rotated_geotransform():
    # test_hfa_rotated_read: order-1 MapToPixelXForm inverted with
    # the half-pixel shift
    want = (11856857.07898215, 0.895867662235625,
            0.02684252936279331, 7041861.472946444,
            0.01962103617166367, -0.9007880319529181)
    gt = hfa_geotransform(open_hfa(DATA + "fg118-91.aux"))
    eps = (abs(want[1]) + abs(want[2])) / 100.0
    for g, w in zip(gt, want):
        assert g == pytest.approx(w, abs=eps)


def test_hfa_compressed_u8_and_1bit():
    # i8u_c_i.img is the RLE-compressed u8 fixture used by the
    # unique-values tests; small1bit exercises sub-byte expansion
    a, _, _ = read_hfa(DATA + "i8u_c_i.img")
    assert a.dtype == np.uint8 and a.shape == (1, 250, 233)
    b, _, _ = read_hfa(DATA + "small1bit.img")
    assert set(np.unique(b)) <= {0, 1}
