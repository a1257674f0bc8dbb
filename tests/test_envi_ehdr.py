"""ENVI + ESRI EHdr raw-binary drivers (raydal.io.envi) against the
published autotest expectations (gdrivers/envi.py, gdrivers/ehdr.py)."""
import os

import numpy as np
import pytest

from raydal.io.envi import read_ehdr, read_envi, write_ehdr, write_envi
from raydal.kernels.checksum import checksum

ENVI = "/root/reference/autotest/gdrivers/data/envi"
EHDR = "/root/reference/autotest/gdrivers/data/ehdr"
RGBSMALL = "/root/reference/autotest/gdrivers/data/rgbsmall.tif"
needs_ref = pytest.mark.skipif(not os.path.isdir(ENVI),
                               reason="reference autotest data absent")


@needs_ref
def test_envi_aea_published_checksum():
    # test_envi_1: aea.dat band 1 checksum 14823
    a, gt, hdr = read_envi(os.path.join(ENVI, "aea.hdr"))
    assert a.shape == (1, 3, 434) and a.dtype == np.uint8
    assert checksum(a[0]) == 14823
    # map info → geotransform (ref pixel 1,1 anchored top-left)
    assert gt == pytest.approx(
        (-936408.178, 28.5, 0.0, 2423902.344, 0.0, -28.5))
    assert hdr["sensor type"] == "Landsat TM"


@needs_ref
def test_envi_gzip_compressed():
    # test_envi_9: file compression = 1 → same 14823
    a, gt, _ = read_envi(os.path.join(ENVI, "aea_compressed.hdr"))
    assert checksum(a[0]) == 14823


@needs_ref
def test_envi_interleaving_trio_matches_tiff():
    # the three interleavings decode identically and match the
    # rgbsmall.tif pixels (cross-format oracle; the ENVI fixtures
    # carry the first 49 rows)
    from raydal.io.tiff import read_tiff
    tif = read_tiff(open(RGBSMALL, "rb").read())
    grids = {}
    for il in ("bsq", "bil", "bip"):
        a, gt, hdr = read_envi(
            os.path.join(ENVI, f"envi_rgbsmall_{il}.hdr"))
        assert hdr["interleave"] == il
        assert a.shape == (3, 49, 50)
        grids[il] = a
    assert all((grids["bsq"] == grids[k]).all() for k in grids)
    for b in range(3):
        assert (grids["bsq"][b] == tif.bands[b][:49]).all()


@needs_ref
def test_ehdr_published_checksums():
    # test_ehdr_3: float32.bil → 27; 10/11: ehdr10.bil + ehdr11.flt →
    # 8202 (the nbits-less .bil infers float32 from 4 bytes/pixel)
    a, gt, nd = read_ehdr(os.path.join(EHDR, "float32.hdr"))
    assert checksum(a[0]) == 27 and a.dtype == np.float32
    # ULXMAP/ULYMAP are pixel CENTERS → byte.tif-family georef
    assert gt == pytest.approx((440720.0, 60.0, 0, 3751320.0, 0, -60.0))
    b, gt1, _ = read_ehdr(os.path.join(EHDR, "ehdr10.hdr"))
    assert checksum(b[0]) == 8202
    c, gt2, _ = read_ehdr(os.path.join(EHDR, "ehdr11.hdr"))
    assert checksum(c[0]) == 8202
    # GridFloat dialect: corner-anchored
    assert gt1[0] == pytest.approx(-17973801.662435)
    assert gt1[3] == pytest.approx(2041811.701239 + 2 * 2500.0)


@needs_ref
@pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
def test_envi_roundtrip(il):
    rng = np.random.default_rng(7)
    b = rng.integers(0, 255, (3, 7, 9)).astype(np.uint8)
    gt = (100.0, 5.0, 0.0, 900.0, 0.0, -5.0)
    txt, raw = write_envi(b, gt, interleave=il)
    rb, rgt, hdr = read_envi(txt, raw)
    assert (rb == b).all()
    assert rgt == pytest.approx(gt)


@pytest.mark.parametrize("dt", [np.int16, np.uint16, np.int32,
                                np.float32, np.float64])
def test_envi_dtype_roundtrip(dt):
    rng = np.random.default_rng(3)
    b = rng.integers(0, 100, (2, 4, 5)).astype(dt)
    txt, raw = write_envi(b, None)
    rb, rgt, _ = read_envi(txt, raw)
    assert rb.dtype == dt and (rb == b).all() and rgt is None


def test_ehdr_roundtrip_with_nodata():
    rng = np.random.default_rng(5)
    b = (rng.standard_normal((2, 6, 8)) * 50).astype(np.float32)
    gt = (1000.0, 30.0, 0.0, 2000.0, 0.0, -30.0)
    txt, raw = write_ehdr(b, gt, nodata=-9999)
    rb, rgt, nd = read_ehdr(txt, raw)
    assert (rb == b).all() and nd == -9999
    assert rgt == pytest.approx(gt)


def test_ehdr_negative_nodata_implies_signed():
    # worldclim convention (ehdrdataset.cpp:1175)
    hdr = ("NROWS 2\nNCOLS 2\nNBANDS 1\nNBITS 16\n"
           "NODATA -32768\nBYTEORDER I\nLAYOUT BIL\n")
    raw = np.array([[-5, 3], [-32768, 7]], "<i2").tobytes()
    a, _, nd = read_ehdr(hdr, raw)
    assert a.dtype == np.int16 and a[0, 0, 0] == -5 and nd == -32768


def test_envi_rejects_non_envi():
    with pytest.raises(ValueError, match="ENVI"):
        read_envi("not a header", b"")
    with pytest.raises(ValueError, match="nrows"):
        read_ehdr("garbage", b"")