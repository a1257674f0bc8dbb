"""TGA and EOSAT FAST readers vs published autotest checksums."""

import os

import numpy as np
import pytest

from raydal.io.fast import read_fast
from raydal.io.tga import read_tga, tga_info
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/"
needs_ref = pytest.mark.skipif(not os.path.isdir(D),
                               reason="reference autotest data absent")

TGA_CASES = [
    ("tga/ref_test_suite/ubw8.tga", [43089]),
    ("tga/ref_test_suite/cbw8.tga", [43089]),
    ("tga/ref_test_suite/ucm8.tga", [38151]),
    ("tga/ref_test_suite/ccm8.tga", [38151]),
    ("tga/ref_test_suite/utc16.tga", [64747, 64839, 64796]),
    ("tga/ref_test_suite/utc24.tga", [9797, 9952, 9848]),
    ("tga/ref_test_suite/ctc24.tga", [9797, 9952, 9848]),
    ("tga/ref_test_suite/utc32.tga", [9797, 9952, 9848, 0]),
    ("tga/stefan_full_rgba.tga", [12603, 58561, 36064, 10807]),
    ("tga/from_ffmpeg_samples/test1g.tga", [13077]),
]


@needs_ref
@pytest.mark.parametrize("fn,want", TGA_CASES,
                         ids=[c[0].split("/")[-1] for c in TGA_CASES])
def test_tga(fn, want):
    arr, _gt, _nd = read_tga(D + fn)
    assert [checksum(arr[i]) for i in range(arr.shape[0])] == want


@needs_ref
def test_tga_metadata_palette():
    info = tga_info(D + "tga/ref_test_suite/cbw8.tga")
    assert info["metadata"]["AUTHOR_NAME"] == "Ricky True"
    assert info["metadata"]["IMAGE_ID"] == \
        "Truevision(R) Sample Image"
    assert "black and white" in info["metadata"]["COMMENTS"]
    info = tga_info(D + "tga/ref_test_suite/ccm8.tga")
    pal = info["palette"]
    assert pal.shape[0] == 256
    assert pal[0].tolist() == [0, 0, 0, 255]
    assert pal[1].tolist() == [8, 8, 8, 255]
    assert pal[64].tolist() == [248, 0, 0, 255]


@needs_ref
def test_fast_l7a():
    arr, _gt, _nd = read_fast(D + "fast/L71118038_03820020111_HPN.FST")
    assert checksum(arr[0][0:1, 0:5000]) == 60323       # fast.py fast_2
    arr, gt, _nd = read_fast(D + "fast/L71230079_07920021111_HTM.FST")
    assert arr.shape[0] == 2
    assert checksum(arr[1][0:1, 0:7000]) == 19110       # fast_5
    assert gt == pytest.approx((528417.25, 30, 0, 7071187, 0, -30))


@needs_ref
def test_fast_euromap():
    arr, gt, _nd = read_fast(D + "fast/n0o0y867.0fl")
    assert arr.shape[0] == 4                            # LISS3 bands
    assert gt == pytest.approx((
        14640936.89174916, 1.008817518246492, 24.9876841746236,
        664274.3912497687, 24.98828832116786,
        -0.9907878581173808), rel=1e-9)                 # fast_6
    arr, gt, _nd = read_fast(D + "fast/h0o0y867.1ah")
    assert arr.shape[0] == 1                            # PAN band
    assert gt == pytest.approx((676565.09, 5, 0, 5348341.5, 0, -5))


@needs_ref
def test_registry(ray_session):
    from raydal.pipeline import open_source
    df = open_source("tga", D + "tga/ref_test_suite/utc24.tga"
                     ).to_pandas()
    assert len(df) == 3 and df["w"][0] == 128
