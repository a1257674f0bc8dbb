"""Sentinel-2 L1C product reader vs the reference's published
expectations (autotest/gdrivers/sentinel2.py test_sentinel2_l1c_1/2)."""

import os

import numpy as np
import pytest

from raydal.io.sentinel2 import (read_sentinel2_product,
                                 read_sentinel2_subdataset)

MTD = ("/root/reference/autotest/gdrivers/data/sentinel2/fake_l1c/"
       "S2A_OPER_PRD_MSIL1C.SAFE/S2A_OPER_MTD_SAFL1C.xml")

need_ref = pytest.mark.skipif(not os.path.exists(MTD),
                              reason="reference fixtures not available")

EXPECTED_MD = {
    "CLOUD_COVERAGE_ASSESSMENT": "0.0",
    "DATATAKE_1_DATATAKE_SENSING_START": "2015-12-31T23:59:59.999Z",
    "DATATAKE_1_DATATAKE_TYPE": "INS-NOBS",
    "DATATAKE_1_ID": "GS2A_20151231T235959_000123_N01.03",
    "DATATAKE_1_SENSING_ORBIT_DIRECTION": "DESCENDING",
    "DATATAKE_1_SENSING_ORBIT_NUMBER": "22",
    "DATATAKE_1_SPACECRAFT_NAME": "Sentinel-2A",
    "DEGRADED_ANC_DATA_PERCENTAGE": "0",
    "DEGRADED_MSI_DATA_PERCENTAGE": "0",
    "FOOTPRINT": "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))",
    "FORMAT_CORRECTNESS_FLAG": "PASSED",
    "GENERAL_QUALITY_FLAG": "PASSED",
    "GENERATION_TIME": "2015-12-31T23:59:59.999Z",
    "GEOMETRIC_QUALITY_FLAG": "PASSED",
    "PREVIEW_GEO_INFO": "BrowseImageFootprint",
    "PREVIEW_IMAGE_URL": "http://example.com",
    "PROCESSING_BASELINE": "01.03",
    "PROCESSING_LEVEL": "Level-1C",
    "PRODUCT_START_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_STOP_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_TYPE": "S2MSI1C",
    "QUANTIFICATION_VALUE": "1000",
    "RADIOMETRIC_QUALITY_FLAG": "PASSED",
    "REFERENCE_BAND": "B1",
    "REFLECTANCE_CONVERSION_U": "0.97",
    "SENSOR_QUALITY_FLAG": "PASSED",
    "SPECIAL_VALUE_NODATA": "1",
    "SPECIAL_VALUE_SATURATED": "0",
}


@need_ref
class TestSentinel2L1C:
    def test_product_metadata_exact(self):
        # the reference's full expected_md dict, key-for-key
        got = read_sentinel2_product(MTD)["metadata"]
        assert got == EXPECTED_MD

    def test_subdataset_descriptions(self):
        subs = read_sentinel2_product(MTD)["subdatasets"]
        descs = [s["desc"] for s in subs]
        assert descs == [
            "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N",
            "Bands B5, B6, B7, B8A, B11, B12 with 20m resolution, "
            "UTM 32N",
            "Bands B1, B9, B10 with 60m resolution, UTM 32N",
            "RGB preview, UTM 32N",
        ]

    def test_10m_mosaic_grid(self):
        s = read_sentinel2_subdataset(MTD, "10m", 32632,
                                      load_pixels=False)
        assert s["size"] == (20984, 20980)
        assert s["geotransform"] == (699960.0, 10.0, 0.0, 5100060.0,
                                     0.0, -10.0)
        # second granule lands at the reference's DstRect offsets
        pl = sorted((x["xoff"], x["yoff"]) for x in s["placements"]
                    if x["band"] == "B8")
        assert pl == [(0, 0), (10004, 10000)]
        for x in s["placements"]:
            assert os.path.exists(x["path"]), x["path"]

    def test_band_order_and_metadata(self):
        s = read_sentinel2_subdataset(MTD, "10m", 32632,
                                      load_pixels=False)
        assert s["band_names"] == ["B4", "B3", "B2", "B8"]
        b4 = s["band_meta"][0]
        assert b4["BANDNAME"] == "B4"
        assert b4["WAVELENGTH"] == "665"
        assert b4["BANDWIDTH"] == "30"
        assert b4["SOLAR_IRRADIANCE"] == "1500"
        assert b4["colorinterp"] == "red"
        b8 = s["band_meta"][3]
        assert b8["BANDNAME"] == "B8"
        assert b8["SOLAR_IRRADIANCE"] == "1000"
        assert b8["colorinterp"] == "nir"

    def test_decode_mosaic_pixels(self):
        s = read_sentinel2_subdataset(MTD, "60m", 32632)
        assert s["data"].shape == (3, 3497, 3497)
        assert s["data"].dtype == np.uint16
        assert s["band_names"] == ["B1", "B9", "B10"]

    def test_invalid_subdatasets_rejected(self):
        with pytest.raises(ValueError):
            read_sentinel2_subdataset(MTD, "50m", 32632,
                                      load_pixels=False)
        with pytest.raises(ValueError):
            read_sentinel2_subdataset(MTD, "10m", 32633,
                                      load_pixels=False)
