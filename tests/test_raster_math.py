"""Tests for per-pixel raster math, DEM kernels, and band statistics."""

import numpy as np
import pytest

from raydal.ops import raster_math as rm


class TestPixelFunctions:
    def setup_method(self):
        rng = np.random.default_rng(5)
        self.a = rng.uniform(1, 100, (8, 8))
        self.b = rng.uniform(1, 100, (8, 8))

    def test_arithmetic(self):
        np.testing.assert_allclose(
            rm.apply_pixel_function("sum", self.a, self.b), self.a + self.b)
        np.testing.assert_allclose(
            rm.apply_pixel_function("diff", self.a, self.b),
            self.a - self.b)
        np.testing.assert_allclose(
            rm.apply_pixel_function("norm_diff", self.a, self.b),
            (self.a - self.b) / (self.a + self.b))
        np.testing.assert_allclose(
            rm.apply_pixel_function("scale", self.a, scale=2.0, offset=3.0),
            self.a * 2 + 3)

    def test_statistical(self):
        np.testing.assert_allclose(
            rm.apply_pixel_function("mean", self.a, self.b),
            (self.a + self.b) / 2)
        np.testing.assert_allclose(
            rm.apply_pixel_function("geometric_mean", self.a, self.b),
            np.sqrt(self.a * self.b))
        np.testing.assert_allclose(
            rm.apply_pixel_function("harmonic_mean", self.a, self.b),
            2.0 / (1 / self.a + 1 / self.b))

    def test_mode_first_tiebreak(self):
        a = np.array([[1.0]])
        b = np.array([[2.0]])
        assert rm.apply_pixel_function("mode", a, b)[0, 0] == 1.0

    def test_replace_nodata(self):
        a = np.array([[0.0, 5.0]])
        out = rm.apply_pixel_function("replace_nodata", a, nodata=0.0,
                                      to=-1.0)
        np.testing.assert_allclose(out, [[-1.0, 5.0]])


class TestSetTypeReclassify:
    def test_set_type_copywords(self):
        arr = np.array([0.5, 1.4, 255.7, -3.0, 300.0])
        out = rm.set_type(arr, np.uint8)
        np.testing.assert_array_equal(out, [1, 1, 255, 0, 255])

    def test_reclassify_ranges_and_values(self):
        arr = np.array([[1.0, 5.0, 10.0, 42.0]])
        out = rm.reclassify(arr, {(0, 6): 100.0, 10.0: 200.0})
        np.testing.assert_allclose(out, [[100, 100, 200, 42]])
        out2 = rm.reclassify(arr, {(0, 6): 1.0}, default=0.0)
        np.testing.assert_allclose(out2, [[1, 1, 0, 0]])


class TestDem:
    def test_flat_surface(self):
        z = np.full((10, 10), 50.0)
        assert rm.slope(z, 1, 1).max() == 0.0
        hs = rm.hillshade(z, 1, 1)
        assert (hs == hs[0, 0]).all()
        assert rm.tri(z).max() == 0 and rm.roughness(z).max() == 0

    def test_inclined_plane_slope(self):
        # z = x → dz/dx = 1 → slope 45°
        z = np.tile(np.arange(20, dtype=np.float64), (20, 1))
        s = rm.slope(z, 1, 1)
        np.testing.assert_allclose(s[5:-5, 5:-5], 45.0, atol=1e-9)

    def test_aspect_east_facing(self):
        # z decreases eastward → downslope toward +x → aspect = 90 (east)
        z = np.tile(np.arange(20, 0, -1, dtype=np.float64), (20, 1))
        a = rm.aspect(z, 1, 1)
        np.testing.assert_allclose(a[5:-5, 5:-5], 90.0, atol=1e-9)

    def test_tpi_peak(self):
        z = np.zeros((5, 5))
        z[2, 2] = 10.0
        assert rm.tpi(z)[2, 2] == 10.0


class TestStats:
    def test_partial_merge_final_vs_global(self):
        rng = np.random.default_rng(9)
        full = rng.integers(0, 255, size=10000).astype(np.float64)
        parts = np.array_split(full, 7)
        acc = rm.stats_partial(parts[0])
        for p in parts[1:]:
            acc = rm.stats_merge(acc, rm.stats_partial(p))
        got = rm.stats_final(acc)
        assert got["count"] == 10000
        assert got["min"] == full.min() and got["max"] == full.max()
        assert got["mean"] == pytest.approx(full.mean(), rel=1e-12)
        assert got["std"] == pytest.approx(full.std(), rel=1e-9)
        np.testing.assert_array_equal(
            got["hist"], np.histogram(full, 256, (0, 256))[0])

    def test_nodata_excluded(self):
        arr = np.array([1.0, -9999.0, 3.0])
        p = rm.stats_partial(arr, nodata=-9999.0)
        assert p["count"] == 2 and p["sum"] == 4.0


class TestReclassifyMappingDSL:
    def test_reference_example_semantics(self):
        """The exact mapping string from
        test_gdalalg_raster_reclassify.py:46-48 (minus the NO_DATA rule,
        which needs a band nodata the image table doesn't carry)."""
        from raydal.ops.raster_math import reclassify_mapping

        m = ("165 = 120; (-inf, 0) = 140; (0, 100] = 140; "
             "(100,  130] = PASS_THROUGH; DEFAULT = 160")
        arr = np.array([165.0, -5.0, 50.0, 120.0, 150.0, 0.0, 100.0,
                        130.0])
        out = reclassify_mapping(arr, m)
        np.testing.assert_array_equal(
            out, [120, 140, 140, 120, 160, 160, 140, 130])

    def test_comments_and_newlines(self):
        from raydal.ops.raster_math import reclassify_mapping

        m = """
        # A sample reclassification
        165         = 120
        [0, 100)    = 7  # closed-open
        """
        out = reclassify_mapping(np.array([165.0, 0.0, 100.0]), m)
        np.testing.assert_array_equal(out, [120, 7, 100])

    def test_nodata_rules_raise(self):
        from raydal.ops.raster_math import parse_reclassify_mapping

        with pytest.raises(ValueError):
            parse_reclassify_mapping("NO_DATA = 5")
        with pytest.raises(ValueError):
            parse_reclassify_mapping("5 = NO_DATA")


class TestReclassifyMappingEdges:
    def test_default_pass_through(self):
        from raydal.ops.raster_math import reclassify_mapping

        out = reclassify_mapping(np.array([1.0, 5.0]),
                                 "5 = 9; DEFAULT = PASS_THROUGH")
        np.testing.assert_array_equal(out, [1.0, 9.0])

    def test_nan_source_rule(self):
        from raydal.ops.raster_math import reclassify_mapping

        out = reclassify_mapping(np.array([np.nan, 1.0]),
                                 "NAN = 5; DEFAULT = 9")
        np.testing.assert_array_equal(out, [5.0, 9.0])
