"""GCP georeferencing vs the reference's published expectations
(autotest/gcore/gcps2geotransform.py — every case), plus the
polynomial/TPS transformer family (alg/gdal_crs.cpp, gdal_tps.cpp
capabilities) and warp integration."""

from __future__ import annotations

import numpy as np
import pytest

from raydal.geo import affine
from raydal.geo.gcp import (GCPPolynomialTransformer, TPSTransformer,
                            gcps_to_geotransform)


def _check(gt, want, tol=1e-6):
    assert gt is not None
    for a, b in zip(gt, want):
        assert abs(a - b) <= tol * max(1.0, abs(b)) or abs(a - b) <= tol


class TestGcpsToGeoTransform:
    """Published cases, same numbering as gcps2geotransform.py."""

    def test_1_exact_three_points(self):
        _check(gcps_to_geotransform(
            [(0, 0, 400000, 370000), (100, 0, 410000, 370000),
             (100, 200, 410000, 368000)]),
            (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0))

    def test_2_least_squares_non_exact(self):
        _check(gcps_to_geotransform(
            [(0, 0, 400000, 370000), (100, 0, 410000, 370000),
             (100, 200, 410000, 368000), (0, 200, 400000, 368000.01)]),
            (400000.0, 100.0, 0.0, 370000.0025, -5e-05, -9.999975))

    def test_3_approx_ok_false_rejects_bad_fit(self):
        assert gcps_to_geotransform(
            [(0, 0, 400000, 370000), (100, 0, 410000, 370000),
             (100, 200, 410000, 368000), (0, 200, 400000, 360000)],
            approx_ok=False) is None

    def test_4_single_point_rejected(self):
        assert gcps_to_geotransform([(0, 0, 400000, 370000)]) is None

    def test_5_two_points_scale_offset(self):
        _check(gcps_to_geotransform(
            [(0, 0, 400000, 370000), (100, 200, 410000, 368000)]),
            (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0))

    def test_6_7_four_corner_orders(self):
        for order in ([(400000, 370000), (410000, 370000),
                       (410000, 368000), (400000, 368000)],
                      [(400000, 370000), (410000, 368000),
                       (410000, 370000), (400000, 368000)]):
            gcps = [(x, y, x, y) for x, y in order]
            _check(gcps_to_geotransform(gcps),
                   (0.0, 1.0, 0.0, 0.0, 0.0, 1.0))

    def test_8_messy_real_world(self):
        gt = gcps_to_geotransform(
            [(0.01, 0.04, -87.05528672907, 39.22759504228),
             (0.01, 2688.02, -86.97079900719, 39.27075713986),
             (4031.99, 2688.04, -87.05960736744, 39.37569137000),
             (1988.16, 1540.80, -87.055069186699924,
              39.304963106777514),
             (1477.41, 2400.83, -87.013419295885001,
              39.304705030894979),
             (1466.02, 2376.92, -87.013906298363295,
              39.304056190007913)])
        want = (-87.056612873288, -2.232795668658e-05,
                3.178617809303e-05, 39.227856615716,
                2.6091510188921e-05, 1.596921026218e-05)
        assert gt is not None
        for a, b in zip(gt, want):
            assert abs(a - b) <= 1e-5

    def test_broken_hour_glass_rejected(self):
        """github.com/OSGeo/gdal/issues/11618: degenerate hour-glass
        GCP layouts must return None, both variants."""
        assert gcps_to_geotransform(
            [(0, 0, 0, 0), (0, 10, 0, 10),
             (10, 0, 10, 10), (10, 10, 10, 0)]) is None
        assert gcps_to_geotransform(
            [(0, 0, 0, 0), (0, 10, 10, 0),
             (10, 0, 0, 10), (10, 10, 10, 10)]) is None


class TestPolynomialTransformer:
    def _affine_gcps(self, rng, n=20):
        A = (1000.0, 2.5, 0.3, 500.0, -0.2, -3.0)
        px = rng.uniform(0, 100, n)
        ln = rng.uniform(0, 80, n)
        gx = A[0] + A[1] * px + A[2] * ln
        gy = A[3] + A[4] * px + A[5] * ln
        return px, ln, gx, gy

    def test_order1_recovers_affine_both_directions(self):
        px, ln, gx, gy = self._affine_gcps(np.random.default_rng(3))
        t = GCPPolynomialTransformer(
            np.column_stack([px, ln, gx, gy]), order=1)
        tx, ty = t.transform(px, ln)
        np.testing.assert_allclose(tx, gx)
        np.testing.assert_allclose(ty, gy)
        ix, iy = t.inverse(gx, gy)
        np.testing.assert_allclose(ix, px)
        np.testing.assert_allclose(iy, ln)

    def test_order2_fits_quadratic_order1_cannot(self):
        px, ln, gx, gy = self._affine_gcps(np.random.default_rng(4))
        gx2 = gx + 0.01 * px * px - 0.02 * px * ln
        gy2 = gy + 0.005 * ln * ln
        g = np.column_stack([px, ln, gx2, gy2])
        tx, _ = GCPPolynomialTransformer(g, order=2).transform(px, ln)
        np.testing.assert_allclose(tx, gx2)
        tx1, _ = GCPPolynomialTransformer(g, order=1).transform(px, ln)
        assert not np.allclose(tx1, gx2)

    def test_order3_fits_cubic(self):
        rng = np.random.default_rng(5)
        px = rng.uniform(0, 50, 30)
        ln = rng.uniform(0, 50, 30)
        gx = 1 + px + 1e-4 * px ** 3
        gy = 2 + ln + 1e-4 * ln ** 2 * px
        t = GCPPolynomialTransformer(
            np.column_stack([px, ln, gx, gy]), order=3)
        tx, ty = t.transform(px, ln)
        np.testing.assert_allclose(tx, gx, atol=1e-8)
        np.testing.assert_allclose(ty, gy, atol=1e-8)

    def test_min_gcp_counts_enforced(self):
        g = [(0, 0, 0, 0), (1, 0, 1, 0), (0, 1, 0, 1)]
        GCPPolynomialTransformer(g, order=1)
        with pytest.raises(ValueError, match="needs >= 6"):
            GCPPolynomialTransformer(g, order=2)


class TestTPS:
    def test_exact_interpolation_at_gcps(self):
        rng = np.random.default_rng(6)
        px = rng.uniform(0, 100, 20)
        ln = rng.uniform(0, 80, 20)
        gx = 1000 + 2 * px + 5 * np.sin(px / 20.0)
        gy = 500 - 3 * ln + 4 * np.cos(ln / 15.0)
        t = TPSTransformer(np.column_stack([px, ln, gx, gy]))
        tx, ty = t.transform(px, ln)
        np.testing.assert_allclose(tx, gx, atol=1e-6)
        np.testing.assert_allclose(ty, gy, atol=1e-6)

    def test_reduces_to_affine_for_affine_data(self):
        rng = np.random.default_rng(7)
        px = rng.uniform(0, 100, 15)
        ln = rng.uniform(0, 80, 15)
        gx = 10 + 2 * px + 0.5 * ln
        gy = -5 - 0.25 * px + 3 * ln
        t = TPSTransformer(np.column_stack([px, ln, gx, gy]))
        qx = rng.uniform(10, 90, 40)
        qy = rng.uniform(10, 70, 40)
        tx, ty = t.transform(qx, qy)
        np.testing.assert_allclose(tx, 10 + 2 * qx + 0.5 * qy,
                                   atol=1e-5)
        np.testing.assert_allclose(ty, -5 - 0.25 * qx + 3 * qy,
                                   atol=1e-5)


class _GcpDstToSrc:
    """dst-world → src-pixel chain for warp_array (inverse GCP fit,
    identity source geotransform) — the gdalwarp -order/-tps shape."""

    src, dst = "geo", "pixel"

    def __init__(self, t):
        self.t = t

    def transform(self, x, y):
        return self.t.inverse(x, y)


class TestGcpWarp:
    def test_gcp_warp_matches_direct_affine_warp(self):
        from raydal.io.images import image_pixels
        from raydal.ops.warp import warp_array

        src = image_pixels(1).astype(np.float64)[:, :, 0]
        h, w = src.shape
        src_gt = (5000.0, 2.0, 0.0, 8000.0, 0.0, -2.0)
        corners = [(0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1),
                   (w // 2, h // 3)]
        gcps = [(cx, cy, *affine.apply_gt(src_gt, cx, cy))
                for cx, cy in corners]
        tf = GCPPolynomialTransformer(gcps, order=1)
        got, ok1 = warp_array(src, (0, 1, 0, 0, 0, 1), "pixel",
                              src_gt, w, h, "geo", "bilinear",
                              transformer=_GcpDstToSrc(tf))
        want, ok2 = warp_array(src, src_gt, 4326, src_gt, w, h, 4326,
                               "bilinear")
        m = ok1 & ok2
        np.testing.assert_allclose(got[m], want[m], atol=1e-6)


class TestRPC:
    """RPC00B rational-polynomial transformer vs the reference's
    published points (autotest/gcore/transformer.py test_transformer_5,
    coefficients from its rpc.vrt fixture)."""

    @staticmethod
    def _rpc():
        import re

        txt = open("/root/reference/autotest/gcore/data/rpc.vrt").read()
        md = dict(re.findall(r'<MDI key="([A-Z_]+)">([^<]+)</MDI>',
                             txt))
        return {k: v for k, v in md.items()
                if "COEFF" in k or k.endswith("_OFF")
                or k.endswith("_SCALE")}

    def test_published_forward_point(self):
        """transformer.py:194-200: (20.5, 10.5) →
        (125.64830100509131, 39.869433991997553) within 1e-6."""
        from raydal.geo.gcp import RPCTransformer

        t = RPCTransformer(self._rpc(), pixel_error_threshold=0.05)
        lon, lat = t.transform(np.array([20.5]), np.array([10.5]))
        assert abs(lon[0] - 125.64830100509131) < 1e-6
        assert abs(lat[0] - 39.869433991997553) < 1e-6

    def test_published_inverse_round_trip(self):
        from raydal.geo.gcp import RPCTransformer

        t = RPCTransformer(self._rpc(), pixel_error_threshold=0.05)
        lon, lat = t.transform(np.array([20.5]), np.array([10.5]))
        px, ln = t.inverse(lon, lat)
        assert abs(px[0] - 20.5) < 0.05 and abs(ln[0] - 10.5) < 0.05

    def test_published_height_30_point(self):
        """transformer.py:212-218 (and the RPC_HEIGHT=30 variant):
        same pixel at height 30 →
        (125.64828521533849, 39.869345204440144)."""
        from raydal.geo.gcp import RPCTransformer

        t = RPCTransformer(self._rpc(), height=30,
                           pixel_error_threshold=0.05)
        lon, lat = t.transform(np.array([20.5]), np.array([10.5]))
        assert abs(lon[0] - 125.64828521533849) < 1e-6
        assert abs(lat[0] - 39.869345204440144) < 1e-6

    def test_vectorized_grid(self):
        from raydal.geo.gcp import RPCTransformer

        t = RPCTransformer(self._rpc(), pixel_error_threshold=0.05)
        px, ln = np.meshgrid(np.linspace(0, 2000, 9),
                             np.linspace(0, 2000, 9))
        lon, lat = t.transform(px, ln)
        assert lon.shape == px.shape
        bx, by = t.inverse(lon, lat)
        assert np.abs(bx - px).max() < 0.05
        assert np.abs(by - ln).max() < 0.05

    def test_coefficient_validation(self):
        import pytest

        from raydal.geo.gcp import RPCTransformer

        rpc = self._rpc()
        rpc["LINE_NUM_COEFF"] = "1 2 3"
        with pytest.raises(ValueError, match="20 coefficients"):
            RPCTransformer(rpc)


class TestHomographyAndGcpsVrtPoint:
    """transformer.py test_transformer_3 / test_transformer_homography:
    the gcps.vrt corner GCPs map (20, 10) → (441920, 3750720) under
    both GCP_TPS and GCP_HOMOGRAPHY, with exact reverses."""

    GCPS = [(0, 0, 440720, 3751320), (100, 0, 446720, 3751320),
            (0, 100, 440720, 3745320), (100, 100, 446720, 3745320)]

    def test_published_point_tps_and_homography(self):
        from raydal.geo.gcp import GCPHomographyTransformer

        for T in (GCPHomographyTransformer(self.GCPS),
                  TPSTransformer(self.GCPS)):
            x, y = T.transform(np.array([20.0]), np.array([10.0]))
            assert abs(x[0] - 441920) < 1e-3
            assert abs(y[0] - 3750720) < 1e-3
            bx, by = T.inverse(x, y)
            assert abs(bx[0] - 20) < 1e-3 and abs(by[0] - 10) < 1e-3

    def test_projective_mapping_recovered_exactly(self):
        from raydal.geo.gcp import GCPHomographyTransformer

        rng = np.random.default_rng(9)
        H = np.array([[1.2, 0.1, 5.0], [-0.05, 0.9, 2.0],
                      [1e-3, -2e-3, 1.0]])
        px = rng.uniform(0, 100, 12)
        ln = rng.uniform(0, 100, 12)
        w = H[2, 0] * px + H[2, 1] * ln + 1
        gx = (H[0, 0] * px + H[0, 1] * ln + H[0, 2]) / w
        gy = (H[1, 0] * px + H[1, 1] * ln + H[1, 2]) / w
        t = GCPHomographyTransformer(np.column_stack([px, ln, gx, gy]))
        tx, ty = t.transform(px, ln)
        np.testing.assert_allclose(tx, gx, atol=1e-8)
        np.testing.assert_allclose(ty, gy, atol=1e-8)

    def test_min_gcps(self):
        from raydal.geo.gcp import GCPHomographyTransformer

        with pytest.raises(ValueError, match=">= 4"):
            GCPHomographyTransformer(self.GCPS[:3])


class TestGeolocArray:
    """GEOLOC_ARRAY transformer vs the published transformer.py
    test_transformer_4 point, geolocation bands read from the
    reference's own sstgeo.tif fixture with the from-scratch TIFF
    reader."""

    @staticmethod
    def _t():
        from raydal.geo.gcp import GeolocArrayTransformer
        from raydal.io.tiff import read_tiff

        img = read_tiff(open(
            "/root/reference/autotest/gcore/data/sstgeo.tif",
            "rb").read())
        return GeolocArrayTransformer(img.bands[0], img.bands[1])

    def test_published_forward_and_inverse(self):
        """(20, 10) → (-81.961341857910156, 29.612689971923828),
        both directions at 1e-6 (transformer.py:162-178)."""
        t = self._t()
        x, y = t.transform(np.array([20.0]), np.array([10.0]))
        assert abs(x[0] - -81.961341857910156) < 1e-6
        assert abs(y[0] - 29.612689971923828) < 1e-6
        px, ln = t.inverse(x, y)
        assert abs(px[0] - 20) < 1e-6 and abs(ln[0] - 10) < 1e-6

    def test_fractional_positions_round_trip(self):
        t = self._t()
        rng = np.random.default_rng(12)
        px = rng.uniform(1, 58, 25)
        ln = rng.uniform(1, 37, 25)
        x, y = t.transform(px, ln)
        bx, by = t.inverse(x, y)
        np.testing.assert_allclose(bx, px, atol=1e-6)
        np.testing.assert_allclose(by, ln, atol=1e-6)

    def test_edge_extension_clamps(self):
        t = self._t()
        x, y = t.transform(np.array([-5.0, 1e6]), np.array([-5.0, 1e6]))
        assert np.isfinite(x).all() and np.isfinite(y).all()


class TestGeolocWarp:
    def test_geoloc_warp_matches_direct_affine_warp(self):
        """A geolocation array generated from a hidden affine must warp
        identically to the direct affine path — dst world → src pixel
        via GeolocArrayTransformer.inverse plugged into warp_array."""
        from raydal.geo.gcp import GeolocArrayTransformer
        from raydal.io.images import image_pixels
        from raydal.ops.warp import warp_array

        src = image_pixels(1).astype(np.float64)[:, :, 0]
        h, w = src.shape
        src_gt = (5000.0, 2.0, 0.0, 8000.0, 0.0, -2.0)
        px, py = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        gx, gy = affine.apply_gt(src_gt, px, py)
        t = GeolocArrayTransformer(gx, gy)

        class _DstToSrc:
            src, dst = "geo", "pixel"

            def transform(self, x, y):
                return t.inverse(x, y)

        got, ok1 = warp_array(src, (0, 1, 0, 0, 0, 1), "pixel",
                              src_gt, w, h, "geo", "bilinear",
                              transformer=_DstToSrc())
        want, ok2 = warp_array(src, src_gt, 4326, src_gt, w, h, 4326,
                               "bilinear")
        # the geoloc grid ends at the last pixel CENTER, so the outer
        # half-pixel ring clamps instead of extrapolating (same as the
        # reference's geoloc transformer) — compare the interior
        m = (ok1 & ok2)[1:-1, 1:-1]
        assert m.mean() > 0.9
        np.testing.assert_allclose(got[1:-1, 1:-1][m],
                                   want[1:-1, 1:-1][m], atol=1e-6)


class TestRPCDem:
    """RPC + DEM intersection path vs the published DEM scenarios in
    autotest/gcore/transformer.py test_transformer_5:249-414 (100x100
    EPSG:32652 DEM, GT [213300,200,0,4418700,0,-200], constant 15,
    RPC_HEIGHT_SCALE=2); tolerances are the autotest's own 1e-6/0.05."""

    @staticmethod
    def _rpc():
        import re

        txt = open("/root/reference/autotest/gcore/data/rpc.vrt").read()
        md = dict(re.findall(r'<MDI key="([A-Z_]+)">([^<]+)</MDI>', txt))
        return {k: v for k, v in md.items()
                if "COEFF" in k or k.endswith("_OFF")
                or k.endswith("_SCALE")}

    @staticmethod
    def _dem(interpolation="bilinear", gt=(213300, 200, 0, 4418700, 0, -200),
             missing_value=None, band=None):
        from raydal.geo import crs
        from raydal.geo.gcp import RPCDem

        if band is None:
            band = np.full((100, 100), 15.0)
        return RPCDem(band, gt, interpolation=interpolation,
                      missing_value=missing_value,
                      to_dem_crs=lambda lon, lat:
                      crs.lonlat_to_utm(lon, lat, 32652))

    def test_published_dem_bilinear(self):
        """transformer.py:259-281: pixel (20.5, 10.5) over the constant
        15 m DEM with HEIGHT_SCALE=2 equals the RPC_HEIGHT=30 point."""
        from raydal.geo.gcp import RPCTransformer

        t = RPCTransformer(self._rpc(), height_scale=2, dem=self._dem(),
                           pixel_error_threshold=0.05)
        lon, lat = t.transform(np.array([20.5]), np.array([10.5]))
        assert abs(lon[0] - 125.64828521533849) < 1e-6
        assert abs(lat[0] - 39.869345204440144) < 1e-6
        px, ln = t.inverse(lon, lat)
        assert abs(px[0] - 20.5) < 0.05 and abs(ln[0] - 10.5) < 0.05

    def test_published_dem_near_and_cubic(self):
        """transformer.py:295-357 (near golden 125.64828521503811,
        39.869345204874911; cubic same point as bilinear)."""
        from raydal.geo.gcp import RPCTransformer

        for interp, elon, elat in [
                ("near", 125.64828521503811, 39.869345204874911),
                ("cubic", 125.64828521533849, 39.869345204440144)]:
            t = RPCTransformer(self._rpc(), height_scale=2,
                               dem=self._dem(interp),
                               pixel_error_threshold=0.05)
            lon, lat = t.transform(np.array([20.5]), np.array([10.5]))
            assert abs(lon[0] - elon) < 1e-6
            assert abs(lat[0] - elat) < 1e-6
            px, ln = t.inverse(lon, lat)
            assert abs(px[0] - 20.5) < 0.05 and abs(ln[0] - 10.5) < 0.05

    def test_outside_dem_extent_errors(self):
        """transformer.py:366-375: both directions fail (NaN here)
        outside the DEM when no missing value is set."""
        from raydal.geo.gcp import RPCTransformer

        t = RPCTransformer(self._rpc(), height_scale=2, dem=self._dem(),
                           pixel_error_threshold=0.05)
        lon, lat = t.transform(np.array([40000.0]), np.array([0.0]))
        assert np.isnan(lon[0]) and np.isnan(lat[0])
        px, ln = t.geo_to_pixel(np.array([125.0]), np.array([40.0]))
        assert np.isnan(px[0]) and np.isnan(ln[0])

    def test_published_dem_missing_value(self):
        """transformer.py:377-409: 100x100 1-metre DEM +
        RPC_DEM_MISSING_VALUE=0 → pixel (-99.5, 0.5) transforms via the
        substituted 0 height."""
        from raydal.geo.gcp import RPCTransformer

        dem = self._dem(gt=(213300, 1, 0, 4418700, 0, -1),
                        missing_value=0)
        t = RPCTransformer(self._rpc(), height_scale=2, dem=dem,
                           pixel_error_threshold=0.05)
        lon, lat = t.transform(np.array([-99.5]), np.array([0.5]))
        assert abs(lon[0] - 125.64746155942839) < 1e-6
        assert abs(lat[0] - 39.869506789921168) < 1e-6
        px, ln = t.inverse(lon, lat)
        assert abs(px[0] - -99.5) < 0.05 and abs(ln[0] - 0.5) < 0.05

    def test_sloped_dem_round_trip(self):
        """Terrain with real relief: every pixel→geo→pixel round trip
        stays within the pixel error threshold."""
        from raydal.geo.gcp import RPCTransformer

        yy, xx = np.mgrid[0:100, 0:100]
        band = 200.0 + 3.0 * xx + 1.5 * yy   # ramp 200-650 m
        # 40 km DEM centred on the scene so iteration guesses stay on it
        t = RPCTransformer(
            self._rpc(),
            dem=self._dem(band=band,
                          gt=(203300, 400, 0, 4428700, 0, -400)),
            pixel_error_threshold=0.05)
        px, ln = np.meshgrid(np.linspace(0, 100, 5),
                             np.linspace(0, 100, 5))
        lon, lat = t.transform(px, ln)
        assert not np.isnan(lon).any()
        bx, by = t.inverse(lon, lat)
        assert np.abs(bx - px).max() < 0.05
        assert np.abs(by - ln).max() < 0.05

    def test_dem_heights_actually_used(self):
        """The same pixel over a 0 m vs 500 m terrain must map to
        different ground coordinates (parallax)."""
        from raydal.geo.gcp import RPCTransformer

        big = (203300, 400, 0, 4428700, 0, -400)
        lo = RPCTransformer(self._rpc(),
                            dem=self._dem(band=np.zeros((100, 100)),
                                          gt=big),
                            pixel_error_threshold=0.05)
        hi = RPCTransformer(self._rpc(),
                            dem=self._dem(band=np.full((100, 100), 500.0),
                                          gt=big),
                            pixel_error_threshold=0.05)
        lon0, lat0 = lo.transform(np.array([20.5]), np.array([10.5]))
        lon5, lat5 = hi.transform(np.array([20.5]), np.array([10.5]))
        assert abs(lon5[0] - lon0[0]) > 1e-5 or abs(lat5[0] - lat0[0]) > 1e-5
