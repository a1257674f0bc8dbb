"""SAFE / RS2 / RCM / PRF product readers vs the reference's published
expectations (autotest/gdrivers/{safe,rs2,rcm,prf}.py)."""

import os

import numpy as np
import pytest

from raydal.io.prf import read_prf
from raydal.io.satproducts import read_rcm, read_rs2, read_safe
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


@need_ref
class TestSAFE:
    def test_band_order_and_checksums(self):
        # test_safe_1/2: band 1 (IW_VH) cs 65372, band 2 (IW_VV) 3732
        s = read_safe(os.path.join(D, "SAFE_FAKE/test.SAFE/manifest.safe"))
        assert [checksum(b) for b in s["bands"]] == [65372, 3732]
        assert s["band_meta"][0] == {"swath": "IW", "polarisation": "VH"}
        assert s["band_meta"][1] == {"swath": "IW", "polarisation": "VV"}

    def test_open_from_dir(self):
        s = read_safe(os.path.join(D, "SAFE_FAKE/test.SAFE"))
        assert len(s["bands"]) == 2

    def test_footprint_exact(self):
        s = read_safe(os.path.join(D, "SAFE_FAKE/test.SAFE/manifest.safe"))
        assert s["footprint"] == (
            "POLYGON((-8.407759 38.130520,-11.335915 38.535374,"
            "-11.026125 40.036644,-8.035001 39.633217,"
            " -8.407759 38.130520))")


@need_ref
class TestRS2:
    def test_uncalibrated(self):
        r = read_rs2(os.path.join(D, "rs2/product.xml"))
        assert [checksum(b) for b in r["bands"]] == [4672, 4672]
        assert r["poles"] == ["HH", "HV"]

    def test_beta0_calibration(self):
        # test_rs2_2: BETA0 = (DN² + offset)/gain, cs 4848
        r = read_rs2(os.path.join(D, "rs2/product.xml"),
                     calibration="BETA0")
        assert checksum(r["bands"][0]) == 4848
        assert r["bands"][0].dtype == np.float32

    def test_rpc_mapping(self):
        # test_rs2_3's full expected RPC dictionary
        r = read_rs2(os.path.join(D, "rs2/product.xml"))
        assert r["rpc"] == {
            "ERR_BIAS": "biasError", "ERR_RAND": "randomError",
            "HEIGHT_OFF": "heightOffset",
            "HEIGHT_SCALE": "heightScale",
            "LAT_OFF": "latitudeOffset", "LAT_SCALE": "latitudeScale",
            "LINE_DEN_COEFF": "lineDenominatorCoefficients",
            "LINE_NUM_COEFF": "lineNumeratorCoefficients",
            "LINE_OFF": "lineOffset", "LINE_SCALE": "lineScale",
            "LONG_OFF": "longitudeOffset",
            "LONG_SCALE": "longitudeScale",
            "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
            "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
            "SAMP_OFF": "pixelOffset", "SAMP_SCALE": "pixelScale"}

    def test_unknown_calibration_raises(self):
        with pytest.raises(ValueError, match="Unsupported calibration"):
            read_rs2(os.path.join(D, "rs2/product.xml"),
                     calibration="unhandled")


@need_ref
class TestRCM:
    PROD = os.path.join(D, "rcm/fake_VV_VH_GRD")

    @pytest.mark.parametrize("sub", ["", "metadata",
                                     "metadata/product.xml"])
    def test_open_entry_points(self, sub):
        r = read_rcm(os.path.join(self.PROD, sub) if sub else self.PROD,
                     load_pixels=False)
        assert len(r["poles"]) == 2

    def test_band_order_and_size(self):
        r = read_rcm(self.PROD, load_pixels=False)
        assert r["poles"] == ["VH", "VV"]   # polarizations order, not ipdf
        assert r["size"] == (17915, 3297)

    def test_metadata_matrix(self):
        r = read_rcm(self.PROD, load_pixels=False)
        md = r["metadata"]
        expected = {
            "ACQUISITION_START_TIME": "rawDataStartTime",
            "ACQUISITION_TYPE": "Medium Resolution 50m",
            "BEAMS": "beams",
            "BEAM_MODE": "Medium Resolution 50m",
            "BEAM_MODE_DEFINITION_ID": "beamModeDefinitionId",
            "BEAM_MODE_MNEMONIC": "beamModeMnemonic",
            "BITS_PER_SAMPLE": "16",
            "DATA_TYPE": "Integer",
            "FACILITY_IDENTIFIER": "inputDatasetFacilityId",
            "FAR_RANGE_INCIDENCE_ANGLE": "incAngFarRng",
            "FIRST_LINE_TIME": "zeroDopplerTimeFirstLine",
            "GEODETIC_TERRAIN_HEIGHT": "200",
            "LAST_LINE_TIME": "zeroDopplerTimeLastLine",
            "LINE_SPACING": "sampledLineSpacing",
            "LINE_TIME_ORDERING": "Increasing",
            "LUT_APPLIED": "Mixed",
            "NEAR_RANGE_INCIDENCE_ANGLE": "incAngNearRng",
            "ORBIT_DATA_FILE": "orbitDataFileName",
            "ORBIT_DATA_SOURCE": "Downlinked",
            "ORBIT_DIRECTION": "Descending",
            "PER_POLARIZATION_SCALING": "true",
            "PIXEL_SPACING": "sampledPixelSpacing",
            "PIXEL_TIME_ORDERING": "Decreasing",
            "POLARIZATIONS": "VH VV",
            "POLARIZATION_DATA_MODE": "Dual Co/Cross",
            "PROCESSING_FACILITY": "processingFacility",
            "PROCESSING_TIME": "processingTime",
            "PRODUCT_ID": "productId",
            "PRODUCT_TYPE": "GRD",
            "SAMPLED_LINE_SPACING_TIME": "sampledLineSpacingTime",
            "SAMPLED_PIXEL_SPACING_TIME": "sampledPixelSpacingTime",
            "SAMPLE_TYPE": "Magnitude Detected",
            "SATELLITE_HEIGHT": "600000",
            "SATELLITE_IDENTIFIER": "RCM-1",
            "SECURITY_CLASSIFICATION": "Non classifié / Unclassified",
            "SENSOR_IDENTIFIER": "SAR",
            "SLANT_RANGE_FAR_EDGE": "slantRangeFarEdge",
            "SLANT_RANGE_NEAR_EDGE": "slantRangeNearEdge",
        }
        for k, v in expected.items():
            assert md.get(k) == v, k
        # per-band LUT path lists, band order VH,VV
        assert md["BETA_NOUGHT_LUT"].endswith(
            "lutBeta_VV.xml") and "lutBeta_VH.xml" in md["BETA_NOUGHT_LUT"]

    def test_gcp(self):
        r = read_rcm(self.PROD, load_pixels=False)
        assert r["gcps"] == [{"pixel": 2.0, "line": 1.0,
                              "x": 2.5, "y": 1.5, "z": 3.5}]
        assert r["gcp_crs"] == "EPSG:4326"

    def test_calibration_subdatasets(self):
        for calib in ("BETA0", "SIGMA0", "GAMMA", "UNCALIB"):
            r = read_rcm(self.PROD, calibration=calib)
            assert len(r["bands"]) == 2
        with pytest.raises(ValueError, match="Unsupported calibration"):
            read_rcm(self.PROD, calibration="unhandled")
        with pytest.raises(FileNotFoundError):
            read_rcm("i_do_not_exist/product.xml", calibration="UNCALIB")


@need_ref
class TestPRF:
    def test_ph_prf(self):
        # test_prf_1: cs 43190, gt (1,2,3,-7,5,6); test_prf_5: EPSG 32601
        r = read_prf(os.path.join(D, "PRF/ph.prf"))
        assert checksum(r["data"]) == 43190
        assert r["geotransform"] == (1.0, 2.0, 3.0, -7.0, 5.0, 6.0)
        assert "UTM zone 1N" in r["wkt"]
        assert r["overviews"] == []       # test_prf_3

    def test_x_dem(self):
        # test_prf_2/4: 4330x4663 float32, unit m, one overview,
        # gt (1.5,1,0,9329,0,-2), cs 0
        r = read_prf(os.path.join(D, "PRF/dem.x-dem"))
        assert r["size"] == (4330, 4663)
        assert r["dtype"] == np.float32
        assert r["unit"] == "m"
        assert r["geotransform"] == (1.5, 1.0, 0.0, 9329.0, 0.0, -2.0)
        assert checksum(r["data"]) == 0
        assert len(r["overviews"]) == 1
        assert r["nodata"] == -1111111.0
