"""DTED + SRTM HGT elevation drivers (raydal.io.dem) against the
reference's published expectations (autotest/gdrivers/dted.py,
autotest/gdrivers/srtmhgt.py)."""
import os

import numpy as np
import pytest

from raydal.io.dem import (DTED_NODATA, HGT_NODATA, parse_hgt_name,
                           read_dted, read_hgt, write_dted, write_hgt)
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data"
N43 = os.path.join(DATA, "n43.dt0")
needs_ref = pytest.mark.skipif(not os.path.exists(N43),
                               reason="reference autotest data absent")


@needs_ref
def test_n43_published_checksum():
    # autotest/gdrivers/dted.py test_dted_1: band checksum 49187
    a, gt, nodata = read_dted(N43)
    assert a.shape == (121, 121) and a.dtype == np.int16
    assert checksum(a) == 49187
    # test_dted_4: 5x5 window at (5,5) → 305
    assert checksum(a[5:10, 5:10]) == 305


@needs_ref
def test_n43_geotransform_nodata():
    # test_dted_2 expectations
    a, gt, nodata = read_dted(N43)
    want = (-80.004166666666663, 1 / 120, 0, 44.00416666666667,
            0, -1 / 120)
    assert np.allclose(gt, want, atol=1e-9)
    assert nodata == -32767


@needs_ref
def test_partial_columns():
    # test_dted_13: sequential-columns file → checksum 56006,
    # absent columns filled with nodata
    p, gt, _ = read_dted(
        os.path.join(DATA, "dted", "n43_partial_cols.dt0"))
    assert checksum(p) == 56006
    assert (p[:, 0] == DTED_NODATA).all()
    assert (p[:, 2] != DTED_NODATA).any()


@needs_ref
def test_bad_crc():
    # test_dted_8: DTED_VERIFY_CHECKSUM behavior
    bad = os.path.join(DATA, "dted", "n43_bad_crc.dt0")
    with pytest.raises(ValueError, match="checksum"):
        read_dted(bad)
    a, _, _ = read_dted(bad, verify_checksum=False)
    assert a.shape == (121, 121)


@needs_ref
def test_leading_hdr_record():
    # test_dted_12 (#2951): HDR1 tape record before UHL, zero records
    t, gt, _ = read_dted(
        os.path.join(DATA, "dted", "w118n033_trunc.dt1"))
    assert t.shape == (1201, 1201) and (t == DTED_NODATA).all()


@needs_ref
def test_dted_roundtrip_n43():
    a, gt, _ = read_dted(N43)
    rt, gt2, _ = read_dted(write_dted(a, -80, 43))
    assert (rt == a).all()
    assert np.allclose(gt2, gt, atol=1e-9)


def test_dted_signed_magnitude():
    neg = np.array([[-5, 100], [32767, -32767]], np.int16)
    rt, _, _ = read_dted(write_dted(neg, 7, -33))
    assert (rt == neg).all()
    with pytest.raises(ValueError, match="range"):
        write_dted(np.array([[-32768]], np.int32), 0, 0)


def test_dted_rejects_garbage():
    with pytest.raises(ValueError, match="UHL"):
        read_dted(b"not a dted file" * 20)


@needs_ref
def test_hgt_published_checksum():
    # autotest/gdrivers/srtmhgt.py test_srtmhgt_1: n43.dt0 nearest-
    # upsampled 121→1201 (ReadRaster convention floor((i+.5)·ratio)),
    # written as N43W080.hgt → checksum 60918
    a, _, _ = read_dted(N43)
    idx = ((np.arange(1201) * 2 + 1) * 121) // (2 * 1201)
    up = a[np.ix_(idx, idx)]
    h, gt, nodata = read_hgt(write_hgt(up), name="N43W080.hgt")
    assert checksum(h) == 60918
    assert nodata == HGT_NODATA
    want = (-80.0004166666666663, 1 / 1200, 0, 44.0004166666666670,
            0, -1 / 1200)
    assert np.allclose(gt, want, atol=1e-9)


def test_hgt_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.integers(-500, 8000, size=(121, 121), dtype=np.int16)
    p = str(tmp_path / "S12E045.hgt")
    write_hgt(a, p)
    h, gt, _ = read_hgt(p)
    assert (h == a).all()
    assert np.allclose(gt[0], 45 - gt[1] / 2) and np.allclose(gt[3], -11 + gt[1] / 2)


def test_hgt_name_parse():
    assert parse_hgt_name("N43W080.hgt") == (43, -80)
    assert parse_hgt_name("/x/y/s05e112.SRTMGL1.hgt") == (-5, 112)
    with pytest.raises(ValueError):
        parse_hgt_name("whatever.hgt")


def test_hgt_rejects_nonsquare():
    with pytest.raises(ValueError, match="square"):
        read_hgt(b"\x00" * 10, name="N00E000.hgt")
    with pytest.raises(ValueError, match="square"):
        write_hgt(np.zeros((3, 4), np.int16))
