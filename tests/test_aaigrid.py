"""AAIGrid reader/writer vs the reference's published checksums
(``autotest/gdrivers/aaigrid.py``)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from raydal.io.aaigrid import read_aaigrid, write_aaigrid
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/aaigrid/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference fixtures not present")


@needs_fixtures
@pytest.mark.parametrize("fn,expected,nodata", [
    ("byte.tif.grd", 4672, None),          # aaigrid.py:35
    ("pixel_per_line.asc", 1123, -99999.0),  # aaigrid.py:44
    ("case_sensitive.ASC", 1123, -99999.0),  # aaigrid.py:163
])
def test_published_checksums(fn, expected, nodata):
    arr, gt, nd = read_aaigrid(D + fn)
    assert checksum(arr) == expected
    assert nd == nodata


@needs_fixtures
def test_geotransform_and_dtype():
    arr, gt, nd = read_aaigrid(D + "byte.tif.grd")
    assert arr.dtype == np.int32          # integer samples → int
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    arrf, _, ndf = read_aaigrid(D + "float64.asc")
    assert arrf.dtype == np.float64


@needs_fixtures
def test_round_trip():
    arr, gt, nd = read_aaigrid(D + "byte.tif.grd")
    arr2, gt2, nd2 = read_aaigrid(write_aaigrid(arr, gt))
    np.testing.assert_array_equal(arr, arr2)
    assert np.allclose(gt, gt2)


def test_xllcenter_shift(tmp_path):
    txt = ("ncols 2\nnrows 2\nxllcenter 10\nyllcenter 20\ncellsize 2\n"
           "1 2\n3 4\n")
    arr, gt, nd = read_aaigrid(txt)
    assert gt[0] == 9.0            # center − cell/2
    assert gt[3] == 23.0           # yll 19 + 2 rows × 2
