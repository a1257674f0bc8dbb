"""RasterLite2 reader vs the reference's published expectations
(autotest/gdrivers/rl2.py)."""

import os

import numpy as np
import pytest

from raydal.io.rl2 import read_rl2, rl2_coverages
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/rasterlite2"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


@need_ref
class TestRL2:
    def test_byte(self):
        # test_rl2_2: cs 4672, exact geotransform, EPSG:26711
        r = read_rl2(os.path.join(D, "byte.rl2"))
        assert r["data"].shape == (1, 20, 20)
        assert checksum(r["data"][0]) == 4672
        assert r["geotransform"] == \
            (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert r["crs"] == "EPSG:26711"
        assert int(r["data"].min()) == 74     # GetMinimum
        # the hidden pyramid overview renders by nearest decimation
        assert checksum(r["data"][0][::2, ::2]) == 1087

    def test_small_world_rgb_jpeg(self):
        # test_rl2_3: JPEG RGB, band checksums + sections
        r = read_rl2(os.path.join(D, "small_world.rl2"))
        assert r["data"].shape == (3, 200, 400)
        assert checksum(r["data"][0]) == 25550
        assert checksum(r["data"][1]) == 28146
        assert [s["name"] for s in r["sections"]] == \
            ["world_west", "world_east"]
        assert r["levels"] == [0, 1, 2]

    def test_small_world_section(self):
        r = read_rl2(os.path.join(D, "small_world.rl2"),
                     section="world_west")
        assert r["data"].shape == (3, 200, 200)
        assert r["data"].sum() > 0

    def test_small_world_stored_pyramid(self):
        # pyramid levels step by 8x (levels table)
        r = read_rl2(os.path.join(D, "small_world.rl2"), level=1)
        assert r["data"].shape == (3, 25, 50)
        assert r["geotransform"][1] == pytest.approx(7.2)

    def test_palette(self):
        # test_rl2_4: cs 14890, 256 entries, entry 1 (176,184,176),
        # overview via nearest decimation cs 35614
        r = read_rl2(os.path.join(D, "small_world_pct.rl2"))
        assert checksum(r["data"][0]) == 14890
        assert r["palette"].shape[0] == 256
        assert tuple(r["palette"][1]) == (176, 184, 176)
        assert checksum(r["data"][0][::2, ::2]) == 35614

    def test_multi_type_coverages(self):
        path = os.path.join(D, "multi_type.rl2")
        names = rl2_coverages(path)
        assert set(names) >= {"uint8", "int16", "float", "double",
                              "1bit", "2bit", "4bit"}
        for cov, dt in [("uint8", "uint8"), ("int16", "int16"),
                        ("uint32", "uint32"), ("float", "float32"),
                        ("double", "float64")]:
            r = read_rl2(path, coverage=cov)
            assert r["dtype"] == dt, cov
            assert r["data"].size > 0
        r = read_rl2(path, coverage="1bit")
        assert set(np.unique(r["data"])) <= {0, 1}
        # the 2bit/4bit coverages ship without tile data
        with pytest.raises(ValueError, match="no tiles"):
            read_rl2(path, coverage="4bit")
