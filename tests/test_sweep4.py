"""Long-tail sweep #4 readers vs published autotest expectations:
Arc/Info Binary Grid (AIG), PCRaster CSF, PCIDSK (flat + tiled v1/v2),
MRF, BAG, S-102."""

import os

import numpy as np
import pytest

from raydal.io.aig import aig_info, read_aig
from raydal.io.bathy import read_bag, read_s102
from raydal.io.mrf import read_mrf
from raydal.io.pcidsk import _read_tiled_channel, pcidsk_info, \
    read_pcidsk
from raydal.io.pcraster import read_pcraster, write_pcraster
from raydal.io.tiff import read_tiff
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/"
GC = "/root/reference/autotest/gcore/data/"
needs_ref = pytest.mark.skipif(not os.path.isdir(D),
                               reason="reference autotest data absent")


# ---------------------------------------------------------------- AIG

@needs_ref
def test_aig_abc3x1():
    # aigrid.py test_aigrid_1/2/3: checksum 3, gt, nodata 255, clr
    a, gt, nd = read_aig(D + "aigrid/abc3x1")
    assert checksum(a[0]) == 3
    assert a.dtype == np.uint8 and nd == 255.0
    assert gt == pytest.approx((-0.5, 1.0, 0.0, 0.5, 0.0, -1.0))
    ct = aig_info(D + "aigrid/abc3x1")["color_table"]
    assert ct[0] == (95, 113, 150) and ct[1] == (95, 57, 29)


@needs_ref
def test_aig_uppercase():
    # aigrid.py test_aigrid_4/5: uppercase coverage + parent .CLR
    a, _gt, nd = read_aig(D + "aigrid/ABC3X1UC")
    assert checksum(a[0]) == 3 and nd == 255.0
    ct = aig_info(D + "aigrid/ABC3X1UC")["color_table"]
    assert ct[0] == (95, 113, 150) and ct[1] == (95, 57, 29)


@needs_ref
def test_aig_sta_24bytes():
    # aigrid.py test_aigrid_6: 24-byte LSB sta.adf min 0 max 2
    info = aig_info(D + "aigrid/aigrid_sta_24bytes/teststa")
    assert info["min"] == 0.0 and info["max"] == 2.0


# ----------------------------------------------------------- PCRaster

@needs_ref
def test_pcraster_ldd():
    # pcraster.py test_pcraster_1/2: checksum 4528, gt, nodata 255
    a, gt, nd = read_pcraster(D + "pcraster/ldd.map")
    assert checksum(a[0]) == 4528
    assert gt == pytest.approx((182140.0, 10, 0, 327880.0, 0, -10))
    assert nd == 255.0 and a.dtype == np.uint8


@needs_ref
def test_pcraster_createcopy(tmp_path):
    # pcraster.py test_pcraster_createcopy round trip
    a, gt, nd = read_pcraster(D + "pcraster/ldd.map")
    p = tmp_path / "ldd.map"
    write_pcraster(a, gt, str(p), nodata=nd, value_scale=0xF0)
    b, gt2, nd2 = read_pcraster(str(p))
    assert checksum(b[0]) == 4528
    assert gt2 == pytest.approx(gt) and nd2 == nd


def test_pcraster_float_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.random((9, 7)).astype(np.float32)
    a[0, 0] = -9.0
    p = tmp_path / "f.map"
    write_pcraster(a, (10, 5, 0, 100, 0, -5), str(p), nodata=-9.0)
    b, gt, nd = read_pcraster(str(p))
    assert b.dtype == np.float32
    assert b[0][0, 0] == np.float32(nd)           # MV translated
    assert np.array_equal(b[0][1:], a[1:])


# ------------------------------------------------------------- PCIDSK

@needs_ref
def test_pcidsk_utm():
    # pcidsk.py test_pcidsk_1: checksum 39576; GEO segment transform
    a, gt, _nd = read_pcidsk(D + "pcidsk/utm.pix")
    assert checksum(a[0]) == 39576
    assert gt == pytest.approx((440720, 60, 0, 3751320, 0, -60))


@needs_ref
@pytest.mark.parametrize("fn", ["tile_v1.1.pix", "tile_v2.pix"])
def test_pcidsk_tiled(fn):
    # pcidsk.py test_pcidsk_tile_v1/v2: checksum 49526; overview
    # layer checksum 12003
    a, gt, _nd = read_pcidsk(D + "pcidsk/" + fn)
    assert a.shape == (1, 65, 65)
    assert checksum(a[0]) == 49526
    info = pcidsk_info(D + "pcidsk/" + fn)
    ov = _read_tiled_channel(D + "pcidsk/" + fn, info, 1)
    assert ov.shape == (32, 32) and checksum(ov) == 12003


# ---------------------------------------------------------------- MRF

@needs_ref
@pytest.mark.parametrize("sub", ["png", "deflate", "none"])
def test_mrf_lossless(sub):
    # lossless MRF fixtures decode identical to their byte.tif source
    ref = read_tiff(open(GC + "byte.tif", "rb").read()).bands[0]
    a, gt, _nd = read_mrf(D + f"mrf/{sub}/byte.mrf")
    assert a.shape == (1, 20, 20)
    assert checksum(a[0]) == 4672
    assert np.array_equal(a[0], ref)
    assert gt == pytest.approx((440720, 60, 0, 3751320, 0, -60))


@needs_ref
def test_mrf_jpeg():
    ref = read_tiff(open(GC + "byte.tif", "rb").read()).bands[0]
    a, _gt, _nd = read_mrf(D + "mrf/jpeg/byte.mrf")
    assert a.shape == (1, 20, 20)
    md = np.abs(a[0].astype(int) - ref.astype(int)).max()
    assert md <= 32                       # lossy tile, bounded error


# ---------------------------------------------------------------- BAG

@needs_ref
def test_bag_true_n_nominal():
    # bag.py test_bag_2: checksums 1072/150/1315, nodata 1e6
    a, gt, nd = read_bag(D + "bag/true_n_nominal.bag")
    assert [checksum(b) for b in a] == [1072, 150, 1315]
    assert nd == 1000000.0
    v = a[0][a[0] != nd]
    assert v.min() == pytest.approx(10, abs=0.01)
    assert v.max() == pytest.approx(19.8, abs=0.1)
    assert gt is not None


# -------------------------------------------------------------- S-102

@needs_ref
@pytest.mark.parametrize("fn", ["test_s102_v2.1.h5",
                                "test_s102_v2.2.h5"])
def test_s102_basic(fn):
    # s102.py test_s102_basic: gt, band order, exact grid values
    a, gt, nd = read_s102(D + "s102/" + fn)
    assert a.shape == (2, 2, 3) and nd == 1e6
    assert gt == pytest.approx((1.8, 0.4, 0.0, 48.75, 0.0, -0.5))
    assert tuple(a[0].ravel()) == (1e6, 4, 5, 0, 1, 2)
    assert tuple(a[1].ravel()) == (103, 1e6, 105, 100, 101, 102)


@needs_ref
def test_s102_elevation():
    # s102.py test_s102_elevation: DEPTH_OR_ELEVATION=ELEVATION
    a, _gt, _nd = read_s102(D + "s102/test_s102_v2.1.h5",
                            elevation=True)
    assert tuple(a[0].ravel()) == (1e6, -4, -5, 0, -1, -2)


# ---------------------------------------------------- source registry

@needs_ref
def test_sweep4_sources(ray_session, tmp_path):
    from raydal.pipeline import open_source, write_sink

    df = open_source("aig", D + "aigrid/abc3x1").to_pandas()
    assert df.iloc[0]["w"] == 3 and df.iloc[0]["nodata"] == 255.0

    df = open_source("pcidsk", D + "pcidsk/tile_v2.pix").to_pandas()
    assert df.iloc[0]["w"] == 65

    df = open_source("mrf", D + "mrf/png/byte.mrf").to_pandas()
    assert df.iloc[0]["w"] == 20

    df = open_source("bag", D + "bag/true_n_nominal.bag").to_pandas()
    assert len(df) == 3                   # three bands

    df = open_source("s102", D + "s102/test_s102_v2.1.h5").to_pandas()
    assert len(df) == 2

    # pcraster sink/source round trip
    ds = open_source("pcraster", D + "pcraster/ldd.map")
    dst = tmp_path / "o.map"
    write_sink("pcraster", ds, str(dst), value_scale=0xF0)
    df = open_source("pcraster", str(dst)).to_pandas()
    arr = np.frombuffer(df.iloc[0]["data"], np.uint8).reshape(
        df.iloc[0]["h"], df.iloc[0]["w"])
    assert checksum(arr) == 4528


# --------------------------------------------------------------- ADRG

@needs_ref
def test_adrg_gen_and_thf():
    from raydal.io.adrg import read_adrg

    # adrg.py test_adrg_read_gen / test_adrg_read_transh: 62833
    a, gt, _nd = read_adrg(D + "adrg/SMALL_ADRG/ABCDEF01.GEN")
    assert a.shape == (3, 128, 128)
    assert checksum(a[0]) == 62833
    a2, _gt, _ = read_adrg(D + "adrg/SMALL_ADRG/TRANSH01.THF")
    assert checksum(a2[0]) == 62833
    # explicit IMG subdataset path
    a3, _gt, _ = read_adrg(D + "adrg/SMALL_ADRG/ABCDEF01.GEN",
                           img_path=D + "adrg/SMALL_ADRG/ABCDEF01.IMG")
    assert checksum(a3[0]) == 62833


@needs_ref
def test_adrg_polar_geotransforms():
    from raydal.io.adrg import read_adrg

    # adrg.py test_adrg_zna_9 / test_adrg_zna_18 published transforms
    _a, gt9, _ = read_adrg(D + "adrg/SMALL_ADRG_ZNA9/ABCDEF01.GEN")
    assert gt9 == pytest.approx(
        (-307675.73602473765, 100.09145391818853, 0.0,
         -179477.5051066006, 0.0, -100.09145391818853), abs=1e-5)
    _a, gt18, _ = read_adrg(D + "adrg/SMALL_ADRG_ZNA18/ABCDEF01.GEN")
    assert gt18 == pytest.approx(
        (-307675.73602473765, 100.09145391818853, 0.0,
         179477.5051066006, 0.0, -100.09145391818853), abs=1e-5)


# ------------------------------------------------------------ NWT_GRD

@needs_ref
def test_nwt_grd_bands():
    from raydal.io.nwt import read_nwt_grd

    # nwt_grd.py test_nwt_grd_1: RGB shading + Z band checksums
    a, gt, nd = read_nwt_grd(D + "nwt_grd/nwt_grd.grd")
    assert [checksum(b) for b in a] == [28093, 33690, 20365, 25856]
    assert nd == pytest.approx(-1.0e37, rel=1e-6)


@needs_ref
def test_nwt_grc():
    from raydal.io.nwt import read_nwt_grc

    # nwt_grc.py test_nwt_grc_1: checksum 46760
    a, _gt, nd = read_nwt_grc(D + "nwt_grc/nwt_grc.grc")
    assert checksum(a[0]) == 46760 and nd == 0.0


# ---------------------------------------------------------------- SRP

@needs_ref
@pytest.mark.parametrize("pcb", [0, 4, 8])
def test_srp_usrp(pcb):
    from raydal.io.srp import read_srp, srp_info

    # srp.py test_srp_1: checksum 24576 at every PCB compression,
    # UTM gt, 4-entry color table, QAL metadata
    p = D + f"srp/USRP_PCB{pcb}/FKUSRP01.GEN"
    a, gt, _nd = read_srp(p)
    assert a.shape == (1, 128, 128)
    assert checksum(a[0]) == 24576
    assert gt == pytest.approx((500000.0, 5.0, 0.0, 5000000.0,
                                0.0, -5.0))
    info = srp_info(p)
    ct = info["color_table"]
    assert len(ct) == 4
    assert ct[0] == (0, 0, 0) and ct[1] == (255, 0, 0)
    assert info["metadata"]["SRP_CLASSIFICATION"] == "U"
    assert info["metadata"]["SRP_CREATIONDATE"] == "20120505"
    # THF path resolves the sibling GEN
    a2, _gt, _ = read_srp(D + f"srp/USRP_PCB{pcb}/TRANSH01.THF")
    assert checksum(a2[0]) == 24576


# --------------------------------------------------------------- IRIS

@needs_ref
def test_iris():
    from raydal.io.iris import read_iris

    # iris.py test_iris_1/2: checksums 65532 / 52872 + Mercator gt
    a, _gt, _nd = read_iris(D + "iris/fakeiris.dat")
    assert checksum(a[0]) == 65532
    a, gt, nd = read_iris(D + "iris/iristest.dat")
    assert a.shape == (1, 262, 260)
    assert checksum(a[0]) == 52872
    assert nd == -9999.0
    want = (16435.721785269096, 1370.4263720754534, 0.0,
            5289830.4584420761, 0.0, -1357.6498705837876)
    for g, w in zip(gt, want):
        if w == 0.0:
            assert g == 0.0
        else:
            assert abs(g - w) / abs(w) <= 1e-5


# --------------------------------------------------------------- MFF2

@needs_ref
def test_mff2():
    from raydal.io.rawmisc import read_mff2

    # mff2.py test_mff2_1: checksum 4672
    a, _gt, _nd = read_mff2(D + "mff2/bytemff2")
    assert a.shape == (1, 20, 20) and a.dtype == np.uint8
    assert checksum(a[0]) == 4672
