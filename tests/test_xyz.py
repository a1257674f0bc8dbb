"""XYZ ASCII-grid driver (raydal.io.xyz) against the published
autotest/gdrivers/xyz.py cases."""
import os

import numpy as np
import pytest

from raydal.io.xyz import read_xyz, write_xyz
from raydal.kernels.checksum import checksum

BYTE = "/root/reference/autotest/gcore/data/byte.tif"
needs_ref = pytest.mark.skipif(not os.path.exists(BYTE),
                               reason="reference autotest data absent")


def test_xyz3_header_reorder():
    # test_xyz_3: "Y X Z" header swaps the axes
    a, gt, nd = read_xyz(
        "Y X Z\n0 0 65\n0 1 66\n1 0 67\n1 1 68\n2 0 69\n2 1 70\n")
    assert a.tolist() == [[65, 66], [67, 68], [69, 70]]
    assert a.dtype == np.uint8 and nd is None


def test_xyz4_sparse_grid():
    # test_xyz_4: missing samples → nodata 0, steps from tolerant merge
    content = """
440750.001 3751290 1
440809.999 3751290 2
440690 3751170.001 3
440750.001 3751170.001 4
440870 3751170.001 6
440810 3751050 7"""
    a, gt, nd = read_xyz(content)
    assert a.tolist() == [[0, 1, 2, 0], [3, 4, 0, 6], [0, 0, 7, 0]]
    assert nd == 0 and a.dtype == np.int16      # sparse Byte→Int16
    want = (440660.0, 60.0, 0.0, 3751350.0, 0.0, -120.0)
    assert gt == pytest.approx(want, abs=1e-5)
    assert a[a != 0].min() == 1 and a.max() == 7


def test_xyz5_comma_separator():
    a, gt, nd = read_xyz(
        "0,1,100\n0.5,1,100\n1,1,100\n0,2,100\n0.5,2,100\n1,2,100\n")
    assert a.shape == (2, 3)
    assert gt == pytest.approx((-0.25, 0.5, 0.0, 0.5, 0.0, 1.0),
                               abs=1e-5)


def test_xyz6_comma_decimal_separator():
    # test_xyz_6: semicolon fields demote the comma to decimal sep
    a, gt, nd = read_xyz(
        "0;1;100\n0,5;1;100\n1;1;100\n0;2;100\n0,5;2;100\n1;2;100\n")
    assert a.shape == (2, 3)
    assert gt == pytest.approx((-0.25, 0.5, 0.0, 0.5, 0.0, 1.0),
                               abs=1e-5)


def test_xyz7_descending_y():
    content = "y x z\n" + "".join(
        f"   {51.5 - 0.025 * r:.6f}  {354.483333 + 0.0333335 * c:.6f}"
        f"     {54.7 - r - c:.3f}\n"
        for r in range(5) for c in range(3))
    a, gt, nd = read_xyz(content)
    assert a.shape == (5, 3)
    assert gt == pytest.approx(
        (354.46666625, 0.0333335, 0.0, 51.5125, 0.0, -0.025), abs=1e-5)
    assert a.dtype == np.float32
    assert a[0, 0] == pytest.approx(54.7, abs=1e-3)


@needs_ref
def test_xyz_byte_roundtrip_checksum():
    # test_xyz_1 family: byte.tif through XYZ keeps checksum 4672
    from raydal.io.tiff import read_tiff
    img = read_tiff(open(BYTE, "rb").read())
    b, gt, nd = read_xyz(write_xyz(img.bands[0], img.geotransform))
    assert checksum(b) == 4672
    assert gt == pytest.approx(tuple(img.geotransform), abs=1e-6)
    assert b.dtype == np.uint8 and nd is None


def test_xyz_float_roundtrip():
    rng = np.random.default_rng(5)
    a = (rng.standard_normal((7, 9)) * 100).astype(np.float32)
    gt = (500000.0, 10.0, 0.0, 4200000.0, 0.0, -10.0)
    b, gtb, nd = read_xyz(write_xyz(a, gt))
    assert b.dtype == np.float32
    assert np.allclose(b, a, rtol=1e-6)
    assert gtb == pytest.approx(gt, abs=1e-6)


def test_xyz_south_up_storage_order():
    # ascending-Y file keeps file order with a positive dy
    a, gt, nd = read_xyz("0 0 1\n1 0 2\n0 1 3\n1 1 4\n")
    assert a.tolist() == [[1, 2], [3, 4]] and gt[5] > 0


def test_xyz_comment_lines():
    a, gt, nd = read_xyz("/ comment\n/ another\n0 0 5\n1 0 6\n")
    assert a.tolist() == [[5, 6]]


def test_xyz_rejects_column_organization():
    with pytest.raises(ValueError, match="column-organized"):
        read_xyz("0 0 1\n0 1 2\n0 2 3\n1 0 4\n1 1 5\n1 2 6\n")


def test_xyz_rejects_ungridded():
    with pytest.raises(ValueError):
        read_xyz("0 0 1\n1 0 2\n1.7 0 3\n2.9 0 4\n")


def test_xyz_int32_promotion():
    a, _, _ = read_xyz("0 0 100000\n1 0 2\n")
    assert a.dtype == np.int32
    a, _, _ = read_xyz("0 0 -5\n1 0 2\n")
    assert a.dtype == np.int16