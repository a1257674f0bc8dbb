"""PDS4 label reader vs the reference's published expectations
(autotest/gdrivers/pds4.py)."""

import os

import pytest

from raydal.io.pds4 import pds4_subdatasets, read_pds4
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/pds4"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


@need_ref
class TestPDS4:
    @pytest.mark.parametrize("fn", [
        "byte_pds4_cart_1700.xml", "byte_pds4_cart_1b00.xml",
        "byte_pds4_cart_1d00_1933.xml", "byte_pds4_cart_1g00_1950.xml",
    ])
    def test_cart_versions(self, fn):
        # test_pds4_read_cart_versions: cs 4672, exact geotransform
        r = read_pds4(os.path.join(D, fn))
        assert checksum(r["data"][0]) == 4672
        assert r["geotransform"] == \
            (-59280.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert r["projection"]["name"] == "Transverse Mercator"
        p = r["projection"]["params"]
        assert p["longitude_of_central_meridian"] == -117
        assert p["scale_factor_at_central_meridian"] == \
            pytest.approx(0.9996)

    def test_km_unit_conversion(self):
        # the 1700 label declares pixel_resolution_y in km/pixel and
        # semi_major_radius in km — both must land in meters
        r = read_pds4(os.path.join(D, "byte_pds4_cart_1700.xml"))
        assert r["geotransform"][5] == -60.0
        assert r["geodetic"]["semi_major_radius"] == \
            pytest.approx(6378206.4)
        assert r["nodata"] == 74.0          # missing_constant

    def test_multi_sds(self):
        # test_pds4's multi-subdataset label: 3 arrays over 2 files
        p = os.path.join(D, "byte_pds4_cart_1700_multi_sds.xml")
        subs = pds4_subdatasets(p)
        assert [(s[0], s[1], s[3]) for s in subs] == [
            (1, 1, "first_sds"), (1, 2, "second_sds"),
            (2, 1, "third_sds")]
        assert checksum(read_pds4(p, 1, 1)["data"][0]) == 2315
        assert checksum(read_pds4(p, 1, 2)["data"][0]) == 2302
        assert checksum(read_pds4(p, 2, 1)["data"][0]) == 3496

    def test_oblique_cylindrical_georef(self):
        # test_pds4_oblique_cylindrical_read: 90-degree
        # map_projection_rotation rotates the geotransform
        r = read_pds4(os.path.join(D, "oblique_cylindrical.xml"))
        assert r["geotransform"] == pytest.approx(
            (-3190898.22208, 0, 351.11116,
             -764017.88416, 351.11116, 0), rel=1e-8)
        assert r["projection"]["name"] == "Oblique Cylindrical"
        assert r["data"].dtype.name == "float32"

    def test_bad_indices_raise(self):
        p = os.path.join(D, "byte_pds4_cart_1700.xml")
        with pytest.raises(ValueError):
            read_pds4(p, 3, 1)
        with pytest.raises(ValueError):
            read_pds4(p, 1, 5)
