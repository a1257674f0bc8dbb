"""Esri Compact Cache V2 / tpkx reader vs the reference's published
expectations (autotest/gdrivers/esric.py)."""

import os
import tarfile

import pytest

from raydal.io.esric import read_esric_conf, read_esric_level, read_tpkx
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/esric"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


@pytest.fixture(scope="module")
def layers_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("esric")
    with tarfile.open(os.path.join(D, "Layers.tar")) as t:
        t.extractall(base)
    return str(base / "Layers" / "conf.xml")


@need_ref
class TestConfXML:
    def test_grid(self, layers_dir):
        info = read_esric_conf(layers_dir)
        # test_esric_2: 2048x2048, 4 bands, 3 overviews (4 LODs)
        assert info["size"] == (2048, 2048)
        assert info["nbands"] == 4
        assert len(info["lods"]) == 4
        gt = info["geotransform"]
        assert gt[0] == pytest.approx(-20037508, abs=1)
        assert gt[1] == pytest.approx(20037508 / 1024, abs=1)
        assert gt[3] == pytest.approx(20037508, abs=1)
        assert gt[5] == pytest.approx(-20037508 / 1024, abs=1)

    def test_missing_level_reads_black(self, layers_dir):
        info = read_esric_conf(layers_dir)
        arr = read_esric_level(info, info["lods"][0][0])
        assert checksum(arr[0]) == 0          # test_esric_3

    def test_png_level_checksum(self, layers_dir):
        info = read_esric_conf(layers_dir)
        # overview 1 == third-finest LOD; 4 PNG tiles, one grayscale
        arr = read_esric_level(info, info["lods"][2][0])
        assert arr.shape == (4, 512, 512)
        assert checksum(arr[1]) == 46857      # test_esric_4


@pytest.fixture(scope="module")
def usa_info():
    return read_tpkx(os.path.join(D, "Usa.tpkx"))


@need_ref
class TestTpkx:
    def test_tiling_scheme_grid(self, usa_info):
        info = usa_info
        assert info["size"] == (8192, 8192)   # test_tpkx_2
        assert info["nbands"] == 4
        assert len(info["lods"]) == 6
        assert info["crs"] == "EPSG:3857"
        gt = info["geotransform"]
        assert gt[0] == pytest.approx(-20037508, abs=1)
        assert gt[1] == pytest.approx(20037508 / 4096, abs=1)

    def test_full_res_checksums(self, usa_info):
        arr = read_esric_level(usa_info, usa_info["lods"][0][0])
        assert [checksum(arr[b]) for b in range(4)] == \
            [61275, 57672, 61542, 19476]      # test_tpkx_3

    def test_overview_checksum(self, usa_info):
        arr = read_esric_level(usa_info, usa_info["lods"][2][0])
        assert arr.shape == (4, 2048, 2048)
        assert checksum(arr[1]) == 53503      # test_tpkx_4

    def test_full_extent_crop(self):
        # test_tpkx_default_full_extent: projwin snap gives 2533x1922
        info = read_tpkx(os.path.join(D, "Usa.tpkx"),
                         extent_source="FULL_EXTENT")
        assert info["size"] == (2533, 1922)
        arr = read_esric_level(info, info["lods"][0][0])
        assert arr.shape[1:] == (1922, 2533)
        assert arr.sum() > 0

    def test_min_lod_not_zero(self):
        # test_tpkx_minLOD_not_zero: probe lon=-100 lat=40 is not black
        info = read_tpkx(os.path.join(D, "Usa_lod5.tpkx"))
        gt = info["geotransform"]
        x = int((-11131949 - gt[0]) / gt[1])
        y = int((4865942 - gt[3]) / gt[5])
        arr = read_esric_level(info, info["lods"][0][0])
        assert arr[0, y, x] != 0
