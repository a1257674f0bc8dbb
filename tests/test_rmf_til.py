"""Panorama RMF and EarthWatch TIL drivers vs the reference's
published expectations (``autotest/gdrivers/{rmf,til}.py``)."""

import numpy as np
import pytest

from raydal.io.rmf import read_rmf
from raydal.io.til import read_til
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/"


@pytest.mark.parametrize("fname,band,cs", [
    ("rmf/byte.rsw", 1, 4672),           # rmf.py test 1
    ("rmf/byte-lzw.rsw", 1, 40503),      # test 2 (Panorama LZW)
    ("rmf/float64.mtw", 1, 4672),        # test 3 (MTW Float64)
    ("rmf/rgbsmall.rsw", 1, 21212),      # test 4 (BGR extraction)
    ("rmf/rgbsmall.rsw", 2, 21053),
    ("rmf/rgbsmall.rsw", 3, 21349),
    ("rmf/rgbsmall-lzw.rsw", 1, 40503),  # test 5
    ("rmf/rgbsmall-lzw.rsw", 2, 41429),
    ("rmf/rgbsmall-lzw.rsw", 3, 40238),
    ("rmf/big-endian.rsw", 1, 7782),     # test 6 (\\0WSR variant)
    ("rmf/big-endian.rsw", 2, 8480),
])
def test_rmf_published_checksums(fname, band, cs):
    a, _gt, _nd = read_rmf(DATA + fname)
    assert checksum(a[band - 1]) == cs


def test_rmf_mtw_nodata_and_type():
    a, _gt, nd = read_rmf(DATA + "rmf/float64.mtw")
    assert a.dtype == np.dtype("<f8")
    assert nd is not None


def test_til_published(tmp_path):
    # til.py test 1: testtil.til mosaics byte.tif → 4672
    a, gt, _ = read_til(DATA + "til/testtil.til")
    assert checksum(a[0]) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_ray_sources(ray_session):
    from raydal.pipeline import SOURCE_REGISTRY
    assert SOURCE_REGISTRY["rmf"](DATA + "rmf/rgbsmall.rsw") \
        .count() == 3
    assert SOURCE_REGISTRY["til"](DATA + "til/testtil.til") \
        .count() == 1
