"""Long-tail sweep #2 readers vs published autotest checksums."""

import os

import numpy as np
import pytest

from raydal.io.rawmisc import (read_ctg, read_genbin, read_gsc,
                               read_isce, read_isg, read_jdem,
                               read_mff, read_noaa_b, read_ntv2,
                               read_roipac, read_rraster)
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/"
needs_ref = pytest.mark.skipif(not os.path.isdir(D),
                               reason="reference autotest data absent")


def _ccs(b):
    inter = np.empty((b.shape[0], b.shape[1] * 2), np.float64)
    inter[:, 0::2] = b.real
    inter[:, 1::2] = b.imag
    return checksum(inter)


@needs_ref
def test_rraster():
    a, gt, _nd = read_rraster(D + "rraster/byte_rraster.grd")
    assert checksum(a[0]) == 4672            # rraster.py test_rraster_1
    assert gt == pytest.approx((440720, 60, 0, 3751320, 0, -60))


@needs_ref
def test_rraster_rgba():
    a, _gt, _nd = read_rraster(D + "rraster/rgba_rraster.grd")
    assert a.shape[0] == 4


@needs_ref
def test_isg():
    a, gt, nd = read_isg(D + "isg/test.isg")
    assert checksum(a[0]) == 159             # isg.py test_isg_1
    assert gt == pytest.approx((120, 0.25, 0, 41, 0, -0.25))
    assert nd == -9999.0


@needs_ref
def test_jdem():
    a, gt, _nd = read_jdem(D + "jdem/fakejdem.mem")
    assert checksum(a[0]) == 15              # jdem.py test_jdem_1
    assert gt[0] == pytest.approx(1.0)


@needs_ref
def test_gsc():
    a, _gt, _nd = read_gsc(D + "gsc/fakegsc.gsc")
    assert checksum(a[0]) == 0               # gsc.py test_gsc_1


@needs_ref
@pytest.mark.parametrize("fn", ["test.b", "test_little_endian.b"])
def test_noaa_b(fn):
    a, gt, _nd = read_noaa_b(D + "noaa_b/" + fn)
    assert checksum(a[0]) == 3               # noaa_b.py tests
    assert gt == pytest.approx((1.75, 0.5, 0, 49.25, 0, -0.5))


@needs_ref
def test_ctg():
    a, gt, _nd = read_ctg(D + "ctg/fake_grid_cell")
    assert a.shape[0] == 6
    assert checksum(a[0]) == 21              # ctg.py test_ctg_1
    assert gt == (421100.0, 200.0, 0.0, 5094300.0, 0.0, -200.0)


@needs_ref
def test_mff():
    a, _gt, _nd = read_mff(D + "mff/fakemff.hdr")
    b = a[0].real if np.iscomplexobj(a[0]) else a[0]
    assert checksum(b) == 1                  # mff.py test_mff_1
    a, _gt, _nd = read_mff(D + "mff/bytemff.hdr")
    assert checksum(a[0]) == 4672            # mff.py test_mff_3


@needs_ref
def test_roipac():
    a, gt, _nd = read_roipac(D + "roipac/srtm.dem")
    assert checksum(a[0]) == 64074           # roipac.py test_roipac_1
    assert gt[0] == pytest.approx(-180.0125, abs=1e-6)


@needs_ref
def test_isce():
    a, _gt, _nd = read_isce(D + "isce/isce.slc")
    assert np.iscomplexobj(a)
    assert _ccs(a[0]) == 350                 # isce.py test_isce_1


@needs_ref
@pytest.mark.parametrize("fn", ["test_ntv2_le.gsb", "test_ntv2_be.gsb"])
def test_ntv2(fn):
    a, _gt, _nd = read_ntv2(D + "ntv2/" + fn)
    assert a.shape[0] == 4
    assert checksum(a[1]) == 10              # ntv2.py tests (band 2)


@needs_ref
def test_genbin():
    a, _gt, _nd = read_genbin(D + "genbin/tm4628_96.bil")
    # genbin.py test_genbin_1: checksum over the 500×1 window
    assert checksum(a[0][0:1, 0:500]) == 5738


@needs_ref
def test_registry(ray_session):
    from raydal.pipeline import open_source
    df = open_source("rraster",
                     D + "rraster/byte_rraster.grd").to_pandas()
    assert len(df) == 1 and df["w"][0] == 20
    df = open_source("ntv2", D + "ntv2/test_ntv2_le.gsb").to_pandas()
    assert len(df) == 4
