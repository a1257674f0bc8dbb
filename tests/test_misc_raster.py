"""Tests for pansharpen, clean-collar, raster footprint."""

import numpy as np
import pytest

from raydal.ops.raster_math import clean_collar, pansharpen
from raydal.ops.vector import raster_footprint


class TestPansharpen:
    def test_identity_when_pan_equals_pseudo(self):
        rgb = np.full((4, 4, 3), 90, dtype=np.uint8)
        out = pansharpen(np.full((4, 4), 90.0), rgb)
        assert (out == 90).all()

    def test_brovey_scaling(self):
        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        rgb[..., 0] = 60
        rgb[..., 1] = 90
        rgb[..., 2] = 120
        pan = np.full((2, 2), 180.0)  # pseudo = 90 → ratio 2
        out = pansharpen(pan, rgb)
        assert tuple(out[0, 0]) == (120, 180, 240)

    def test_clip_at_bit_depth(self):
        rgb = np.full((1, 1, 3), 200, dtype=np.uint8)
        out = pansharpen(np.full((1, 1), 2000.0), rgb)
        assert (out == 255).all()

    def test_high_bit_depth_not_clamped_to_255(self):
        rgb = np.full((1, 1, 3), 500, dtype=np.uint16)
        out = pansharpen(np.full((1, 1), 1000.0), rgb, bit_depth=11)
        assert out.dtype == np.uint16
        assert (out == 1000).all()


class TestCleanCollar:
    def test_black_collar_trimmed_interior_kept(self):
        img = np.full((10, 10), 200, dtype=np.uint8)
        img[0, :] = 3
        img[:, 0] = 2
        img[1, 0:5] = 4   # collar chain reaching inward
        img[5, 5] = 1     # isolated interior dark pixel
        cleaned, collar = clean_collar(img, threshold=15)
        assert collar[0, 3] and collar[1, 3]
        assert not collar[5, 5]
        assert cleaned[5, 5] == 1  # interior preserved
        assert cleaned[0, 3] == 0  # collar burned to pure black

    def test_pixel_distance_jumps_gap(self):
        """A 1-px bright seam between border collar and inner dark region:
        pixel_distance=2 jumps it, 0 does not (reference semantics)."""
        img = np.full((8, 12), 200, dtype=np.uint8)
        img[:, 0:3] = 2          # border collar
        img[2:6, 4:7] = 3        # inner dark region behind a bright seam
        out0, col0 = clean_collar(img, threshold=15, pixel_distance=0)
        assert not col0[2:6, 4:7].any()
        out2, col2 = clean_collar(img, threshold=15, pixel_distance=2)
        assert col2[2:6, 4:7].all()

    def test_white_collar(self):
        img = np.full((6, 6), 100, dtype=np.uint8)
        img[-1, :] = 252
        cleaned, collar = clean_collar(img, threshold=10, color="white",
                                       pixel_distance=0)
        assert collar[-1, :].all()
        assert (cleaned[-1, :] == 255).all()


class TestRasterFootprint:
    def test_rect_mask_footprint(self):
        m = np.zeros((8, 8), dtype=bool)
        m[2:6, 1:7] = True
        gt = (100.0, 1.0, 0.0, 50.0, 0.0, -1.0)
        rings = raster_footprint(m, gt)
        assert len(rings) == 1
        ring = rings[0]
        assert ring[:, 0].min() == 101.0 and ring[:, 0].max() == 107.0
        assert ring[:, 1].min() == 44.0 and ring[:, 1].max() == 48.0

    def test_simplify_reduces_vertices(self):
        m = np.zeros((20, 20), dtype=bool)
        m[2:18, 2:18] = True
        gt = (0.0, 1.0, 0.0, 20.0, 0.0, -1.0)
        full = raster_footprint(m, gt)[0]
        simp = raster_footprint(m, gt, simplify_tol=0.1)[0]
        assert len(simp) < len(full)
        assert len(simp) == 5  # rectangle collapses to 4 corners + close

    def test_empty_mask(self):
        assert raster_footprint(np.zeros((4, 4), bool),
                                (0, 1, 0, 0, 0, -1)) == []

    def test_disjoint_components_all_reported(self):
        m = np.zeros((10, 10), dtype=bool)
        m[1:3, 1:3] = True
        m[6:9, 6:9] = True
        gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        rings = raster_footprint(m, gt)
        assert len(rings) == 2
        from raydal.geo.wkb import polygon_area
        areas = sorted(polygon_area([r]) for r in rings)
        assert areas == [4.0, 9.0]

    def test_hull_of_l_shape(self):
        m = np.zeros((10, 10), dtype=bool)
        m[1:9, 1:4] = True
        m[6:9, 1:9] = True
        gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        hull = raster_footprint(m, gt, hull=True)[0]
        from raydal.geo.wkb import polygon_area
        assert polygon_area([hull]) >= 24 + 15  # ≥ L-shape area
