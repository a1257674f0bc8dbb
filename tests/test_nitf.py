"""NITF reader/writer parity vs the reference's published expectations
(autotest/gdrivers/nitf.py)."""

import os

import numpy as np
import pytest

from raydal.io.nitf import nitf_info, read_nitf, write_nitf
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/nitf/"

needs_ref = pytest.mark.skipif(not os.path.isdir(DATA),
                               reason="reference autotest data absent")


@needs_ref
def test_rgb_checksum_and_geotransform():
    # test_nitf_6: band 3 checksum 21349 + adjusted-IGEOLO geotransform
    arr, gt, nd = read_nitf(DATA + "rgb.ntf")
    assert arr.shape == (3, 50, 50)
    assert checksum(arr[2]) == 21349
    want = (-44.842029478458, 0.003503401360, 0,
            -22.930748299319, 0, -0.003503401360)
    assert gt == pytest.approx(want, abs=1e-10)


@needs_ref
@pytest.mark.parametrize("fn", ["i_3034c.ntf", "i_3034f.ntf",
                                "ns3034d.nsf"])
def test_1bit_files(fn):
    # test_nitf_11 / 38 / 39: 1-bit data promotes to 0/1, checksum 170
    arr, _gt, _nd = read_nitf(DATA + fn)
    assert arr.shape == (1, 18, 35)
    assert checksum(arr[0]) == 170


@needs_ref
def test_fake_nsif_blocka_and_cgm():
    # test_nitf_12: BLOCKA TRE + CGM SEGMENT_COUNT 0
    info = nitf_info(DATA + "fake_nsif.ntf")
    assert info["version"].startswith("NSIF01.00")
    expected = ("010000001000000000                "
                "+41.319331+020.078400+41.317083+020.126072"
                "+41.281634+020.122570+41.283881+020.074924     ")
    assert info["tre"]["BLOCKA"] == expected
    assert info["cgm_segment_count"] == 0


@needs_ref
def test_no_image_segments():
    # test_nitf_18-ish: U_0006A has graphics only → 0 raster images
    info = nitf_info(DATA + "U_0006A.NTF")
    assert len(info["images"]) == 0
    with pytest.raises(ValueError):
        read_nitf(DATA + "U_0006A.NTF")


@needs_ref
def test_header_only_rejected():
    # test_nitf_20: U_0002A.NTF is header-only → open fails
    with pytest.raises(Exception):
        nitf_info(DATA + "U_0002A.NTF")


@needs_ref
def test_c1_bilevel_decode():
    # test_nitf_19: C1 (G3 2D, COMRAT=2DH) decodes via the from-scratch
    # T.4 codec — checksum 65024
    arr, _gt, _nd = read_nitf(DATA + "U_1050A.NTF")
    assert checksum(arr[0]) == 65024


@needs_ref
def test_jpeg_subdataset_decode():
    # test_nitf_45: overview (2× nearest) of the 2nd JPEG image has
    # checksum 1086 — proves the base C3 decode is pixel-exact
    arr, _gt, _nd = read_nitf(DATA + "two_images_jpeg.ntf", image=1)
    assert arr.shape[1:] == (20, 20)
    assert checksum(arr[0][0::2, 0::2]) == 1086
    info = nitf_info(DATA + "two_images_jpeg.ntf")
    assert len(info["images"]) == 2
    assert info["images"][1]["IC"].strip() in ("C3", "M3")


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (3, 40, 61), np.uint8)
    gt = (-100.0, 0.01, 0, 45.0, 0, -0.01)
    p = str(tmp_path / "t.ntf")
    write_nitf(p, img, gt)
    back, gt2, _ = read_nitf(p)
    assert (back == img).all()
    assert gt2 == pytest.approx(gt, abs=1e-9)

    i16 = rng.integers(0, 60000, (1, 33, 47)).astype(np.uint16)
    p2 = str(tmp_path / "t16.ntf")
    write_nitf(p2, i16)
    back16, gt16, _ = read_nitf(p2)
    assert (back16 == i16).all()
    assert gt16 is None


def test_write_blocked_read_modes(tmp_path):
    # a synthesized multi-band file read back through the registry
    from raydal.pipeline import open_source
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (2, 16, 16), np.uint8)
    p = str(tmp_path / "s.ntf")
    write_nitf(p, img)
    ds = open_source("nitf", p)
    df = ds.to_pandas()
    assert len(df) == 2
    b0 = np.frombuffer(df["data"][0], np.uint8).reshape(16, 16)
    assert (b0 == img[0]).all()


@needs_ref
def test_registry_source(ray_session):
    from raydal.pipeline import open_source
    df = open_source("nitf", DATA + "rgb.ntf").to_pandas()
    assert len(df) == 3
    b3 = np.frombuffer(df["data"][2], np.uint8).reshape(50, 50)
    assert checksum(b3) == 21349
