"""Tests for marching-squares contour extraction."""

import numpy as np
import pytest

from raydal.ops.contour import chain_segments, contour_length, \
    contour_segments


class TestContour:
    def test_flat_has_no_contours(self):
        assert len(contour_segments(np.full((10, 10), 5.0), 7.0)) == 0

    def test_vertical_gradient_straight_line(self):
        # z = row → level 4.5 crosses between rows 4 and 5, a straight
        # horizontal line of total length = width-1 (pixel-center span)
        z = np.tile(np.arange(10, dtype=np.float64)[:, None], (1, 8))
        segs = contour_segments(z, 4.5)
        assert len(segs) == 7
        np.testing.assert_allclose(segs[:, :, 1], 4.5)
        assert contour_length(segs) == pytest.approx(7.0)

    def test_interpolation_position(self):
        z = np.array([[0.0, 0.0], [10.0, 10.0]])
        segs = contour_segments(z, 2.5)
        # crossing at 1/4 of the way down between the two rows
        np.testing.assert_allclose(segs[0, :, 1], 0.25)

    def test_cone_contour_circle_like(self):
        yy, xx = np.mgrid[0:41, 0:41].astype(np.float64)
        r = np.hypot(xx - 20, yy - 20)
        z = 100.0 - r
        segs = contour_segments(z, 90.0)  # circle radius 10
        L = contour_length(segs)
        assert L == pytest.approx(2 * np.pi * 10, rel=0.02)
        lines = chain_segments(segs)
        assert len(lines) == 1  # one closed ring
        ring = lines[0]
        np.testing.assert_allclose(ring[0], ring[-1], atol=1e-9)

    def test_world_coordinates(self):
        z = np.tile(np.arange(4, dtype=np.float64)[:, None], (1, 4))
        gt = (100.0, 2.0, 0.0, 50.0, 0.0, -2.0)
        segs = contour_segments(z, 1.5, gt=gt)
        # pixel row 1.5 center → world y = 50 - (1.5+0.5)*2 = 46
        np.testing.assert_allclose(segs[:, :, 1], 46.0)

    def test_saddle_consistency(self):
        # checkerboard saddle cell: both diagonal corners high
        z = np.array([[1.0, 0.0], [0.0, 1.0]])
        segs = contour_segments(z, 0.5)
        assert len(segs) == 2  # saddle resolves to two segments


# ------------------------------------------------ polygonal contouring

from raydal.ops.contour import band_areas, contour_polygons


class TestContourPolygons:
    def _pyramid(self, n=33):
        x, y = np.meshgrid(np.arange(n, dtype=float),
                           np.arange(n, dtype=float))
        return np.minimum(np.minimum(x, y),
                          np.minimum(n - 1 - x, n - 1 - y))

    def test_pyramid_band_areas_closed_form(self):
        n = 33
        z = self._pyramid(n)
        levels = [0.5, 1.5, 2.5, 3.5, 4.5, 5.5]

        def side(l):
            return (n - 1) - 2 * l

        res = band_areas(z, levels)
        for lo, hi, area in res:
            if not np.isfinite(lo):
                want = (n - 1) ** 2 - (side(hi) ** 2 - 0.5)
            elif not np.isfinite(hi):
                want = side(lo) ** 2 - 0.5
            else:
                # marching-squares corner chamfers cancel between the
                # two bounding square rings
                want = side(lo) ** 2 - side(hi) ** 2
            assert area == pytest.approx(want, abs=1e-9)

    def test_pyramid_topology(self):
        z = self._pyramid(33)
        res = contour_polygons(z, [0.5, 1.5, 5.5])
        # interior bands are annuli: one outer with one hole
        for band in res[:-1]:
            assert len(band["polys"]) == 1
            assert len(band["polys"][0][1]) == 1
        # apex band is simply connected
        assert len(res[-1]["polys"]) == 1
        assert len(res[-1]["polys"][0][1]) == 0

    def test_bands_partition_domain(self):
        rng = np.random.default_rng(5)
        z = rng.normal(0, 1, (24, 31))
        levels = [-1.0, -0.25, 0.25, 1.0]
        total = sum(a for _, _, a in band_areas(z, levels))
        assert total == pytest.approx(23 * 30, abs=1e-6)

    def test_linear_plane_exact_strips(self):
        x = np.meshgrid(np.arange(11, dtype=float),
                        np.arange(7, dtype=float))[0]
        res = band_areas(x, [2.5, 7.25])
        # vertical strips of the 10 x 6 pixel-center domain
        assert res[0][2] == pytest.approx(2.5 * 6)
        assert res[1][2] == pytest.approx((7.25 - 2.5) * 6)
        assert res[2][2] == pytest.approx((10 - 7.25) * 6)

    def test_two_components(self):
        z = np.zeros((9, 19))
        z[3:6, 2:7] = 10.0                    # two separate plateaus
        z[3:6, 12:17] = 10.0
        res = contour_polygons(z, [5.0])
        high = res[1]
        assert len(high["polys"]) == 2
        assert all(not hs for _, hs in high["polys"])
        low = res[0]
        # low band is the full domain with two holes
        assert len(low["polys"]) == 1
        assert len(low["polys"][0][1]) == 2

    def test_world_transform_scales_area(self):
        z = self._pyramid(17)
        gt = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
        px = band_areas(z, [1.5])
        wd = band_areas(z, [1.5], gt=gt)
        for (_, _, a_px), (_, _, a_wd) in zip(px, wd):
            assert a_wd == pytest.approx(a_px * 4.0)

    def test_constant_array_single_band(self):
        z = np.full((5, 8), 3.0)
        res = contour_polygons(z, [1.0, 5.0])
        areas = [sum(abs_area for _, _, abs_area in band_areas(z, [1.0, 5.0]))]
        assert len(res[1]["polys"]) == 1      # whole domain in [1, 5)
        assert not res[0]["polys"] and not res[2]["polys"]
        assert band_areas(z, [1.0, 5.0])[1][2] == pytest.approx(7 * 4)


class TestGenerateLevels:
    def test_interval_and_base(self):
        from raydal.ops.contour import generate_levels
        assert generate_levels(0, 100, interval=10) == [
            0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
        assert generate_levels(3, 47, interval=10, base=5) == [
            5, 15, 25, 35, 45]
        assert generate_levels(-25, 25, interval=10) == [
            -20, -10, 0, 10, 20]

    def test_exp_base(self):
        from raydal.ops.contour import generate_levels
        assert generate_levels(1, 100, exp_base=2) == [
            1, 2, 4, 8, 16, 32, 64]
        assert generate_levels(5, 100, exp_base=10) == [10, 100]

    def test_fixed_precedence_and_validation(self):
        from raydal.ops.contour import generate_levels
        assert generate_levels(0, 1, fixed=[9.0], interval=1) == [9.0]
        with pytest.raises(ValueError):
            generate_levels(0, 1)
        with pytest.raises(ValueError):
            generate_levels(0, 1, exp_base=1.0)

    def test_interval_step_generates_per_image_levels(self, ray_session):
        import ray.data

        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        df = run_pipeline(ray.data.from_arrow(t),
                          [("raster-contour", {"interval": 64.0})]
                          ).to_pandas()
        assert len(df) > 0
        assert all(lv % 64.0 == 0 for lv in df["level"])
