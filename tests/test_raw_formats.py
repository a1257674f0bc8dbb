"""PNM / Golden Software / LAN / PAux / BYN / KRO / Terragen / ZMap
drivers vs the reference's published expectations.

Checksums are the values asserted in ``autotest/gdrivers/{pnm,gsg,
lan,paux,byn,kro,terragen,zmap}.py`` on the same fixture files (or,
for the create-only KRO/ZMap tests, on round-trips through the same
sources the reference uses).
"""

import os

import numpy as np
import pytest

from raydal.io.gsg import read_gs7bg, read_gsbg, write_gs7bg, write_gsbg
from raydal.io.pnm import read_pnm, write_pnm
from raydal.io.rawgrids import (read_byn, read_kro, read_lan, read_paux,
                                read_terragen, write_kro)
from raydal.io.tiff import read_tiff
from raydal.io.zmap import read_zmap, write_zmap
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/"
GCORE = "/root/reference/autotest/gcore/data/"


@pytest.mark.parametrize("fname,band,cs", [
    ("pnm/byte.pgm", 1, 4672),            # pnm.py test_pnm_1
    ("pnm/rgbsmall.ppm", 2, 21053),       # pnm.py test_pnm_2
    ("lan/fakelan.lan", 1, 10),           # lan.py test_lan_1
    ("lan/fakelan4bit.lan", 1, 10),       # lan.py test_lan_2
    ("paux/small16.raw", 2, 12816),       # paux.py test_paux_1
    ("byn/cgg2013ai08_reduced.byn", 1, 64764),        # byn.py
    ("byn/test_invalid_header_bytes.byn", 1, 64764),  # byn.py
    ("gsg/gsg_binary.grd", 1, 4672),      # gsg.py test_gsg_1
    ("gsg/gsg_7binary.grd", 1, 4672),     # gsg.py test_gsg_2
    ("terragen/float32.ter", 1, 1128),    # terragen.py test_terragen_1
])
def test_published_checksums(fname, band, cs):
    readers = {"pnm": read_pnm, "lan": read_lan, "pau": read_paux,
               "byn": read_byn, "ter": read_terragen}
    key = fname.split("/")[0][:3]
    if key == "gsg":
        rd = read_gs7bg if "7" in fname else read_gsbg
    else:
        rd = readers[key]
    arr, _gt, _nd = rd(DATA + fname)
    assert checksum(arr[band - 1]) == cs


def test_gsg_geotransform_matches_byte_tif():
    # both Surfer fixtures were generated from byte.tif: cell-center
    # header extents must recover the byte.tif corner geotransform
    for rd, f in ((read_gsbg, "gsg/gsg_binary.grd"),
                  (read_gs7bg, "gsg/gsg_7binary.grd")):
        _a, gt, _ = rd(DATA + f)
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_gsg_writers_roundtrip(tmp_path):
    arr, gt, _ = read_gsbg(DATA + "gsg/gsg_binary.grd")
    p6 = str(tmp_path / "rt6.grd")
    write_gsbg(arr, gt, p6)
    a2, gt2, nd = read_gsbg(p6)
    assert checksum(a2[0]) == 4672 and gt2 == gt
    p7 = str(tmp_path / "rt7.grd")
    write_gs7bg(arr, gt, p7)
    a3, gt3, _ = read_gs7bg(p7)
    assert checksum(a3[0]) == 4672 and gt3 == gt


def test_paux_geotransform():
    _a, gt, _ = read_paux(DATA + "paux/small16.raw")
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_byn_geotransform_degrees():
    _a, gt, nd = read_byn(DATA + "byn/cgg2013ai08_reduced.byn")
    # half-cell-extended arcsec extents over Canada, in degrees
    assert gt[1] > 0 and gt[5] < 0 and -180 < gt[0] < 0 and \
        40 < gt[3] <= 90
    assert nd == 9999000.0          # Int32: 9999 * factor(1000)


def test_pnm_writer_roundtrip(tmp_path):
    arr, _, _ = read_pnm(DATA + "pnm/rgbsmall.ppm")
    p = str(tmp_path / "rt.ppm")
    write_pnm(arr, p)
    a2, _, _ = read_pnm(p)
    assert checksum(a2[1]) == 21053
    # 16-bit path (maxval > 255 → big-endian shorts)
    g16 = (arr[0].astype(np.uint16) * 257)
    p16 = str(tmp_path / "rt16.pgm")
    write_pnm(g16, p16)
    a3, _, _ = read_pnm(p16)
    assert np.array_equal(a3[0], g16)


@pytest.mark.parametrize("src,band,cs,dtype", [
    (DATA + "rgbsmall.tif", 2, 21053, np.uint8),   # kro.py test_kro_2
    (GCORE + "uint16.tif", 1, 4672, np.uint16),    # kro.py test_kro_3
    (GCORE + "float32.tif", 1, 4672, np.float32),  # kro.py test_kro_4
])
def test_kro_roundtrip_published(tmp_path, src, band, cs, dtype):
    r = read_tiff(open(src, "rb").read())
    p = str(tmp_path / "rt.kro")
    write_kro(np.stack(r.bands).astype(dtype), p)
    arr, _, _ = read_kro(p)
    assert checksum(arr[band - 1]) == cs


def test_kro_rgba16_published(tmp_path):
    # kro.py test_kro_5: 16-bit RGBA from png/rgba16.png, band 1 = 1886
    from raydal.io.png import decode_png
    px = np.asarray(decode_png(
        open(DATA + "png/rgba16.png", "rb").read()))
    p = str(tmp_path / "rgba16.kro")
    write_kro(np.ascontiguousarray(px.transpose(2, 0, 1))
              .astype(np.uint16), p)
    arr, _, _ = read_kro(p)
    assert arr.shape[0] == 4 and checksum(arr[0]) == 1886


def test_zmap_roundtrip_published(tmp_path):
    # zmap.py test_zmap_1: byte.tif → ZMap → checksum 4672
    r = read_tiff(open(GCORE + "byte.tif", "rb").read())
    p = str(tmp_path / "byte.zmap")
    write_zmap(np.asarray(r.bands[0], np.float64), r.geotransform, p)
    arr, gt, nodata = read_zmap(p)
    assert checksum(arr[0]) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert nodata == 1e30


def test_terragen_scale_offset():
    # terragendataset.cpp:778-779: scale = SCAL/65536*heightscale,
    # offset = SCAL*baseheight
    _a, _gt, meta = read_terragen(DATA + "terragen/float32.ter")
    assert meta["scale"] == pytest.approx(60.0 / 65536.0 * 6)
    assert meta["offset"] == pytest.approx(120.0)


def test_ray_source_registry(ray_session, tmp_path):
    from raydal.pipeline import SINK_REGISTRY, SOURCE_REGISTRY

    rows = SOURCE_REGISTRY["gsbg"](DATA + "gsg/gsg_binary.grd") \
        .take_all()
    assert len(rows) == 1 and rows[0]["w"] == 20
    arr = np.frombuffer(rows[0]["data"],
                        dtype=rows[0]["dtype"]).reshape(20, 20)
    assert checksum(arr) == 4672

    out = SINK_REGISTRY["zmap"](
        SOURCE_REGISTRY["gsbg"](DATA + "gsg/gsg_binary.grd"),
        str(tmp_path / "zm_out"))
    paths = [r["path"] for r in out.take_all()]
    arr, _gt, _ = read_zmap(paths[0])
    assert checksum(arr[0]) == 4672


# ------------------------------------------------- HF2 / Leveller / ACE2

def test_hf2_byte_roundtrip_published(tmp_path):
    # hf2.py test_hf2_1/2: byte.tif CreateCopy keeps checksum 4672,
    # including COMPRESS=YES BLOCKSIZE=10 (.hfz)
    from raydal.io.hf2 import read_hf2, write_hf2
    r = read_tiff(open(GCORE + "byte.tif", "rb").read())
    p = str(tmp_path / "byte.hf2")
    write_hf2(np.asarray(r.bands[0]), r.geotransform, p)
    a, gt, _ = read_hf2(p)
    assert checksum(a[0]) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    pz = str(tmp_path / "byte.hfz")
    write_hf2(np.asarray(r.bands[0]), r.geotransform, pz,
              tile_size=10, compress=True)
    a, _, _ = read_hf2(pz)
    assert checksum(a[0]) == 4672


def test_hf2_n43_roundtrip_published(tmp_path):
    # hf2.py test_hf2_4: n43.dt0 CreateCopy keeps checksum 49187
    from raydal.io.dem import read_dted
    from raydal.io.hf2 import read_hf2, write_hf2
    arr, gt0, _ = read_dted(DATA + "n43.dt0")
    p = str(tmp_path / "n43.hf2")
    write_hf2(arr, gt0, p)
    a, _, _ = read_hf2(p)
    assert checksum(a[0]) == 49187


def test_hf2_float_path_within_precision(tmp_path):
    from raydal.io.hf2 import read_hf2, write_hf2
    r = read_tiff(open(GCORE + "float32.tif", "rb").read())
    src = np.asarray(r.bands[0], np.float32)
    p = str(tmp_path / "f32.hf2")
    write_hf2(src, r.geotransform, p, vert_pres=0.01)
    a, _, _ = read_hf2(p)
    assert checksum(a[0]) == 4672
    assert np.abs(a[0] - src).max() <= 0.01


def test_leveller_published():
    # leveller.py test_leveller_1: ter6test.ter band 1 = 33441
    from raydal.io.rawgrids import read_leveller
    a, _gt, _meta = read_leveller(DATA + "leveller/ter6test.ter")
    assert a.shape == (1, 96, 64)
    assert checksum(a[0]) == 33441


def test_ace2_filename_geometry(tmp_path):
    # ace2.py test_ace2_1: constructed 45N015E_5M tile → gt + cs 0
    from raydal.io.rawgrids import read_ace2
    p = str(tmp_path / "45N015E_5M.ACE2")
    open(p, "wb").write(b"\x00" * (180 * 180 * 4))
    a, gt, _ = read_ace2(p)
    assert checksum(a[0]) == 0
    assert gt == (15.0, 0.08333333333333333, 0.0,
                  60.0, 0.0, -0.08333333333333333)


# ------------------------------------------- USGSDEM / GXF / GTX

@pytest.mark.parametrize("fname,cs", [
    ("usgsdem/022gdeme_truncated", 1583),        # usgsdem.py test 1
    ("usgsdem/39079G6_truncated.dem", 61424),    # test 3 (UTM)
    ("usgsdem/39109h1_truncated.dem", 39443),    # test 4 (893 offset)
])
def test_usgsdem_published(fname, cs):
    from raydal.io.usgsdem import read_usgsdem
    a, _gt, nd = read_usgsdem(DATA + fname)
    assert checksum(a[0]) == cs and nd == -32767.0


def test_usgsdem_geotransforms_published():
    # usgsdem.py test 2/3 geotransform assertions
    from raydal.io.usgsdem import read_usgsdem
    _a, gt, _ = read_usgsdem(DATA + "usgsdem/022gdeme_truncated")
    assert gt == pytest.approx((-67.00041667, 0.00083333, 0.0,
                                50.000416667, 0.0, -0.00083333),
                               abs=1e-8)
    _a, gt, _ = read_usgsdem(DATA + "usgsdem/39079G6_truncated.dem")
    assert gt == (606855.0, 30.0, 0.0, 4414605.0, 0.0, -30.0)


@pytest.mark.parametrize("fname,cs", [
    ("gxf/small.gxf", 90),           # gxf.py test 1 (GTYPE 0)
    ("gxf/small2.gxf", 65042),       # gxf.py test 2 (base-90)
])
def test_gxf_published(fname, cs):
    from raydal.io.gxf import read_gxf
    a, _gt, _nd = read_gxf(DATA + fname)
    assert checksum(a[0]) == cs


def test_gtx_published():
    # gtx.py test 1: hydroc1.gtx = 64183
    from raydal.io.rawgrids import read_gtx
    a, gt, nd = read_gtx(DATA + "gtx/hydroc1.gtx")
    assert checksum(a[0]) == 64183
    assert nd == -88.8888
    assert gt[1] > 0 and gt[5] < 0


def test_snodas_published():
    # snodas.py test 1: fake_snodas.hdr opens 6935x3351, checksum 0
    from raydal.io.rawgrids import read_snodas
    a, gt, nd = read_snodas(DATA + "snodas/fake_snodas.hdr")
    assert a.shape == (1, 3351, 6935)
    assert checksum(a[0]) == 0
    assert nd == -9999.0
    assert gt[0] == pytest.approx(-124.733749999995)


@pytest.mark.parametrize("fname,want", [
    ("lcp/test_FARSITE_UTM12.LCP",
     [18645, 16431, 18851, 26182, 30038, 22077, 30388, 23249]),
    ("lcp/test_USGS_LFNM_Alb83.lcp",
     [28381, 25824, 28413, 19052, 30164, 22316, 30575, 23304]),
])
def test_lcp_published_checksums(fname, want):
    # lcp.py test 1/2: all eight crown-fuel band checksums
    from raydal.io.rawgrids import read_lcp
    a, gt, _ = read_lcp(DATA + fname)
    assert a.shape[0] == 8
    assert [checksum(a[i]) for i in range(8)] == want
    assert gt[1] > 0 and gt[5] < 0


def test_rst_published_checksums():
    # idrisi.py tests 1-2: byte.rst 5044, real.rst 5275
    from raydal.io.rawgrids import read_rst
    a, gt, nd = read_rst(DATA + "rst/byte.rst")
    assert checksum(a[0]) == 5044
    assert a.dtype == np.uint8 and nd is None
    assert gt[0] == 50.0 and gt[3] == 70.0
    assert gt[1] == pytest.approx(20.0 / 21)
    a, _, _ = read_rst(DATA + "rst/real.rst")
    assert a.dtype == np.float32
    assert checksum(a[0]) == 5275


def test_doq2_published():
    # doq2.py test 1: first-row band checksums 4201/4010/5820,
    # gt (377054, 1, 0, 4082205, 0, -1), QUADRANGLE_NAME metadata
    from raydal.io.rawgrids import read_doq2
    a, gt, md = read_doq2(DATA + "doq2/C3607614_truncated.NWS")
    assert a.shape == (3, 7631, 500)
    assert [checksum(a[i, :1, :500]) for i in range(3)] == \
        [4201, 4010, 5820]
    assert gt == (377054.0, 1.0, 0.0, 4082205.0, 0.0, -1.0)
    assert md["QUADRANGLE_NAME"] == "NORFOLK SOUTH 3.45 or 7.5-min. name*"


def test_ilwis_published():
    # ilwis.py test 1: LanduseSmall.mpr checksum 2351
    from raydal.io.ilwis import read_ilwis
    a, gt, _ = read_ilwis(DATA + "ilwis/LanduseSmall.mpr")
    assert checksum(a[0]) == 2351
    assert gt == (795480.0, 20.0, 0.0, 8090520.0, 0.0, -20.0)


def test_saga_published():
    # saga.py test 1: 4byteFloat.sdat checksum 108; pixel-center
    # extent widened half a cell, bottom-up rows
    from raydal.io.rawgrids import read_saga
    a, gt, nd = read_saga(DATA + "saga/4byteFloat.sgrd")
    assert checksum(a[0]) == 108
    assert gt == (328.3, 10.0, 0.0, 650.5, 0.0, -10.0)
    assert nd == -99999.0


@pytest.mark.parametrize("fname", [
    "ngsgeoid/g2009u01_le_truncated.bin",
    "ngsgeoid/g2009u01_be_truncated.bin",
])
def test_ngsgeoid_published(fname):
    # ngsgeoid.py tests 1-2: checksum 65534 + published gt for both
    # endiannesses
    from raydal.io.rawgrids import read_ngsgeoid
    a, gt, _ = read_ngsgeoid(DATA + fname)
    assert checksum(a[0]) == 65534
    want = (229.99166666666667, 0.016666666666670001, 0.0,
            40.00833333333334, 0.0, -0.016666666666670001)
    assert gt == pytest.approx(want, abs=1e-12)


def test_loslas_published():
    # loslas.py test 1: gt + band statistics
    from raydal.io.rawgrids import read_loslas
    a, gt, _ = read_loslas(DATA + "loslas/wyhpgn.los")
    assert gt == (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25)
    assert a.min() == pytest.approx(-0.027868999168276787)
    assert a.max() == pytest.approx(0.033906999975442886)
    assert a.mean() == pytest.approx(0.009716129862575248)
    assert a.std() == pytest.approx(0.008260044951413324)


def test_ndf_published():
    # ndf.py test 1: first-row checksum 6510 + corner-derived gt
    from raydal.io.rawgrids import read_ndf
    a, gt, _ = read_ndf(DATA + "ndf/LE7134052000500350.H3")
    assert a.shape == (1, 14680, 15620)
    assert checksum(a[0, :1, :]) == 6510
    assert gt == (320325.75, 14.25, 0.0, 1383062.25, 0.0, -14.25)


def test_eir_published():
    # eir.py test 1: fakeeir.hdr checksum 1
    from raydal.io.rawgrids import read_eir
    a, _, _ = read_eir(DATA + "eir/fakeeir.hdr")
    assert a.shape == (1, 1, 1) and checksum(a[0]) == 1


def test_sigdem_roundtrip_published():
    # sigdem.py: byte.tif through CreateCopy keeps checksum 4672;
    # mirrored as write_sigdem -> read_sigdem
    from raydal.io.sigdem import read_sigdem, write_sigdem
    from raydal.io.tiff import read_tiff
    img = read_tiff(open(GCORE + "byte.tif", "rb").read())
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    out = "/tmp/raydal_sigdem_rt.sdem"
    write_sigdem(np.asarray(img.bands[0], float), gt, out)
    a, rgt, nd = read_sigdem(out)
    assert checksum(a[0]) == 4672
    assert rgt == gt
