"""ERMapper ERS and NASA PDS3 drivers vs the reference's published
expectations (``autotest/gdrivers/{ers,pds}.py``)."""

import numpy as np
import pytest

from raydal.io.ers import read_ers, write_ers
from raydal.io.pds import read_pds
from raydal.io.tiff import read_tiff
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/"


def test_ers_srtm_published():
    # test_ers_1: checksum 64074 + the exact STATISTICS_* metadata
    a, gt, nd, stats = read_ers(DATA + "ers/srtm.ers")
    assert checksum(a[0]) == 64074
    assert nd == 9999.0
    assert stats == {"STATISTICS_MEAN": "-4020.25",
                     "STATISTICS_MINIMUM": "-4315",
                     "STATISTICS_MAXIMUM": "-3744",
                     "STATISTICS_MEDIAN": "-4000"}
    # registration cell 1,1 shifts the DMS origin by one cell
    assert gt == pytest.approx((-180.00833333, 0.00833333, 0.0,
                                -59.99166667, 0.0, -0.00833333))


def test_ers_dem_published():
    # test_ers_4: checksum 56588 + published geotransform
    a, gt, _nd, _ = read_ers(DATA + "ers/ers_dem.ers")
    assert checksum(a[0]) == 56588
    assert gt == pytest.approx((143.59625, 0.025, 0.0,
                                -39.38125, 0.0, -0.025), abs=1e-8)


def test_ers_int8_celltype():
    # test_ers_5: Signed8BitInteger → int8
    a, _gt, _nd, _ = read_ers(DATA + "ers/8s.ers")
    assert a.dtype == np.int8


def test_ers_writer_roundtrips(tmp_path):
    # test_ers_2/3 shapes: float32 cs 27 and rgbsmall band 2 = 21053
    from raydal.io.envi import read_ehdr
    arr, gt, _ = read_ehdr(DATA + "ehdr/float32.hdr")
    p = str(tmp_path / "f32.ers")
    write_ers(np.asarray(arr, np.float32), gt, p)
    b, gt2, _, _ = read_ers(p)
    assert checksum(b[0]) == 27 and gt2 == gt
    r = read_tiff(open(DATA + "rgbsmall.tif", "rb").read())
    p = str(tmp_path / "rgb.ers")
    write_ers(np.stack(r.bands).astype(np.uint8), r.geotransform, p)
    b, _, _, _ = read_ers(p)
    assert checksum(b[1]) == 21053


@pytest.mark.parametrize("fname,cs", [
    ("pds/mc02_truncated.img", 47151),
    ("pds/fl73n003_truncated.img", 34962),
    ("pds/EN0001426030M_truncated.IMG", 1367),
])
def test_pds_published_checksums(fname, cs):
    a, _gt, _nd, _m = read_pds(DATA + fname)
    assert checksum(a[0]) == cs


def test_pds_geotransform_and_band_metadata():
    # test_pds_1/2 with PDS_*ProjOffset_Shift=-0.5
    _a, gt, _nd, _m = read_pds(DATA + "pds/mc02_truncated.img",
                               sample_shift=-0.5, line_shift=-0.5)
    assert gt == pytest.approx(
        (-10668384.9037885, 926.115274429, 0,
         3852176.48398876, 0, -926.115274429), rel=1e-6)
    _a, gt, nd, m = read_pds(DATA + "pds/fl73n003_truncated.img",
                             sample_shift=-0.5, line_shift=-0.5)
    assert gt == pytest.approx(
        (587861.559, 75.000003, 0.0, -7815243.4746, 0.0, -75.000003),
        rel=1e-6)
    assert nd == 7 and m["scale"] == 0.2 and m["offset"] == -20.2
    # per #3939: MISSING_CONSTANT variant also carries nodata 7
    _a, _gt, nd, _ = read_pds(DATA + "pds/fl73n003_alt_truncated.img")
    assert nd == 7


def test_ray_registry(ray_session, tmp_path):
    from raydal.pipeline import SINK_REGISTRY, SOURCE_REGISTRY

    rows = SOURCE_REGISTRY["ers"](DATA + "ers/srtm.ers").take_all()
    assert len(rows) == 1 and rows[0]["nodata"] == 9999.0
    out = SINK_REGISTRY["ers"](
        SOURCE_REGISTRY["ers"](DATA + "ers/srtm.ers"),
        str(tmp_path / "ers_out"))
    paths = [r["path"] for r in out.take_all()]
    b, _, _, _ = read_ers(paths[0])
    assert checksum(b[0]) == 64074
    assert SOURCE_REGISTRY["pds"](
        DATA + "pds/EN0001426030M_truncated.IMG").count() == 1


# ------------------------------------------------------------- BSB

@pytest.mark.parametrize("fname", [
    "bsb/rgbsmall.kap",                  # bsb.py test_bsb_1/2
    "bsb/rgbsmall_index.kap",            # test_bsb_4 (offset table)
    "bsb/transverse_mercator.kap",
    "bsb/rgbsmall_with_line_break.kap",  # test_bsb_5 (mid-row break)
])
def test_bsb_published_checksums(fname):
    from raydal.io.bsb import read_bsb
    a, _gt, _nd, pal = read_bsb(DATA + fname)
    assert checksum(a[0]) == 30321
    assert len(pal) == 127


def test_bsb_truncated_opens():
    # test_bsb_3/3_2: truncated variants must still decode
    from raydal.io.bsb import read_bsb
    for f in ("bsb/rgbsmall_truncated.kap",
              "bsb/rgbsmall_truncated2.kap"):
        a, _, _, _ = read_bsb(DATA + f)
        assert a.shape == (1, 50, 50)


def test_bsb_ray_source(ray_session):
    from raydal.pipeline import SOURCE_REGISTRY
    rows = SOURCE_REGISTRY["bsb"](DATA + "bsb/rgbsmall.kap").take_all()
    assert len(rows) == 1 and rows[0]["w"] == 50
    arr = np.frombuffer(rows[0]["data"],
                        dtype=rows[0]["dtype"]).reshape(50, 50)
    assert checksum(arr) == 30321


# ------------------------------------------------------------ ISIS

def test_isis3_published_checksums():
    # isis.py test 1/2: tiled SignedWord cube + detached label
    from raydal.io.isis import read_isis3
    a, _, _, m = read_isis3(DATA + "isis3/isis3_unit_test.cub")
    assert checksum(a[0]) == 42403
    assert m["scale"] == pytest.approx(0.25006486667989)
    assert m["offset"] == pytest.approx(8190.1245134999)
    a, _, _, _ = read_isis3(DATA + "isis3/isis3_detached.lbl")
    assert checksum(a[0]) == 9978


def test_isis2_published_checksum():
    # isis2.py test 1: SUN_REAL qube
    from raydal.io.isis import read_isis2
    a, _, _, _ = read_isis2(
        DATA + "isis2/arvidson_original_truncated.cub")
    assert checksum(a[0]) == 382


def test_isis_ray_sources(ray_session):
    from raydal.pipeline import SOURCE_REGISTRY
    assert SOURCE_REGISTRY["isis3"](
        DATA + "isis3/isis3_unit_test.cub").count() == 1
    assert SOURCE_REGISTRY["isis2"](
        DATA + "isis2/arvidson_original_truncated.cub").count() == 1
