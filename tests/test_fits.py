"""FITS driver vs the reference's round-trip expectations
(``autotest/gdrivers/fits.py`` test_fits parametrization: every
gcore fixture type preserves its checksum and data type through a
FITS round-trip)."""

import numpy as np
import pytest

from raydal.io.fits import read_fits, write_fits
from raydal.io.tiff import read_tiff
from raydal.kernels.checksum import checksum

GCORE = "/root/reference/autotest/gcore/data/"
DATA = "/root/reference/autotest/gdrivers/data/fits/"

_DTYPES = {"byte": np.uint8, "int16": np.int16, "uint16": np.uint16,
           "int32": np.int32, "uint32": np.uint32,
           "float32": np.float32, "float64": np.float64}


@pytest.mark.parametrize("name", list(_DTYPES))
def test_roundtrip_preserves_checksum_and_type(tmp_path, name):
    r = read_tiff(open(GCORE + name + ".tif", "rb").read())
    src = np.stack(r.bands).astype(_DTYPES[name])
    p = str(tmp_path / (name + ".fits"))
    write_fits(src, p)
    a, _, _, _m = read_fits(p)
    assert a.dtype == _DTYPES[name]
    assert checksum(a[0]) == checksum(src[0])


def test_byte_merc_fixture_reads():
    # test_fits_read_georef_merc asserts WKT/gt only; the grid is the
    # byte.tif payload (4672 in file order, 4855 through the FITS
    # bottom-up flip this driver shares with its own writer)
    a, _, _, _ = read_fits(DATA + "byte_merc.fits")
    assert a.shape == (1, 20, 20) and a.dtype == np.uint8
    assert {checksum(a[0]), checksum(a[0][::-1])} == {4672, 4855}


def test_image_in_second_hdu():
    # the primary HDU is headerless (NAXIS 0); the image follows
    a, _, _, _ = read_fits(DATA + "image_in_second_hdu.fits")
    assert a.size > 0
    a2, _, _, _ = read_fits(
        DATA + "image_in_first_and_second_hdu.fits")
    assert a2.size > 0


def test_unsigned_promotion_bzero():
    # uint16 travels as int16 + BZERO 32768 (fitsdataset.cpp:350)
    import io
    import tempfile
    src = np.array([[0, 1, 32768, 65535]], np.uint16)
    import os
    p = os.path.join(tempfile.mkdtemp(), "u16.fits")
    write_fits(src, p)
    raw = open(p, "rb").read()
    assert b"BZERO" in raw and b"BITPIX  =                   16" in raw
    a, _, _, _ = read_fits(p)
    assert a.dtype == np.uint16 and np.array_equal(a[0], src)


def test_ray_registry(ray_session, tmp_path):
    from raydal.pipeline import SINK_REGISTRY, SOURCE_REGISTRY
    out = SINK_REGISTRY["fits"](
        SOURCE_REGISTRY["fits"](DATA + "byte_merc.fits"),
        str(tmp_path / "fits_out"))
    paths = [r["path"] for r in out.take_all()]
    a, _, _, _ = read_fits(paths[0])
    assert a.shape == (1, 20, 20)
