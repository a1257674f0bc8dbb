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
        ring = raster_footprint(m, gt)
        assert ring[:, 0].min() == 101.0 and ring[:, 0].max() == 107.0
        assert ring[:, 1].min() == 44.0 and ring[:, 1].max() == 48.0

    def test_simplify_reduces_vertices(self):
        m = np.zeros((20, 20), dtype=bool)
        m[2:18, 2:18] = True
        gt = (0.0, 1.0, 0.0, 20.0, 0.0, -1.0)
        full = raster_footprint(m, gt)
        simp = raster_footprint(m, gt, simplify_tol=0.1)
        assert len(simp) < len(full)
        assert len(simp) == 5  # rectangle collapses to 4 corners + close

    def test_empty_mask(self):
        assert raster_footprint(np.zeros((4, 4), bool),
                                (0, 1, 0, 0, 0, -1)) is None

    def test_hull_of_l_shape(self):
        m = np.zeros((10, 10), dtype=bool)
        m[1:9, 1:4] = True
        m[6:9, 1:9] = True
        gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        hull = raster_footprint(m, gt, hull=True)
        from raydal.geo.wkb import polygon_area
        assert polygon_area([hull]) >= 24 + 15  # ≥ L-shape area
