"""Tests for gdal_grid-style interpolation and color operations."""

import numpy as np
import pytest

from raydal.ops.color import (apply_color_map, color_relief,
                              histogram_partial_rgb, median_cut,
                              rgb_to_palette)
from raydal.ops.grid import grid_tile
from raydal.ops.join import build_cell_points


def _index(vals, x, y):
    return build_cell_points(np.asarray(vals, dtype=np.float64),
                             np.asarray(x, dtype=np.float64),
                             np.asarray(y, dtype=np.float64),
                             z=3, window=(0.0, 0.0, 10.0, 10.0))


class TestGrid:
    def test_nearest(self):
        idx = _index([5.0, 9.0], [2.0, 8.0], [5.0, 5.0])
        out = grid_tile(idx, "nearest", 0, 0, 10, 10, 10, 10)
        assert out[5, 1] == 5.0   # near x=2
        assert out[5, 8] == 9.0   # near x=8

    def test_invdist_exact_hit_and_weighting(self):
        idx = _index([10.0, 20.0], [2.05, 8.05], [5.05, 5.05])
        # pixel center exactly at a point → exact value
        out = grid_tile(idx, "invdist", 0, 0, 10, 10, 100, 100)
        assert out[49, 20] == 10.0  # center (2.05, 5.05)
        # midpoint between both points → mean
        mid = out[49, 50]
        assert 12.0 < mid < 18.0

    def test_invdistnn_uses_k_neighbors(self):
        vals = [1.0, 1.0, 1.0, 100.0]
        idx = _index(vals, [1, 2, 3, 9.5], [1, 2, 3, 9.5])
        out = grid_tile(idx, "invdistnn", 0, 0, 4, 4, 4, 4, n_neighbors=3)
        # far 100-value excluded from the 3-NN of the lower-left corner
        assert out[3, 0] == pytest.approx(1.0)

    def test_metrics(self):
        idx = _index([2.0, 4.0, 6.0], [5.0, 5.2, 5.4], [5.0, 5.0, 5.0])
        cnt = grid_tile(idx, "count", 4, 4, 6, 6, 2, 2, radius=2.0)
        assert cnt.max() == 3
        rng = grid_tile(idx, "range", 4, 4, 6, 6, 2, 2, radius=2.0)
        assert rng.max() == 4.0
        avg = grid_tile(idx, "average", 4, 4, 6, 6, 2, 2, radius=2.0)
        assert avg.max() == pytest.approx(4.0)

    def test_empty_region_nodata(self):
        idx = _index([1.0], [0.5, ], [0.5])
        out = grid_tile(idx, "nearest", 8, 8, 10, 10, 4, 4, radius=1.0,
                        nodata=-5)
        assert (out == -5).all()


class TestColor:
    def test_lut(self):
        lut = np.zeros((256, 3), dtype=np.uint8)
        lut[7] = (10, 20, 30)
        band = np.array([[7, 0]], dtype=np.uint8)
        out = apply_color_map(band, lut)
        assert tuple(out[0, 0]) == (10, 20, 30)
        assert tuple(out[0, 1]) == (0, 0, 0)

    def test_color_relief_interp(self):
        bp = [(0.0, 0, 0, 0), (100.0, 200, 100, 50)]
        out = color_relief(np.array([[50.0]]), bp)
        assert tuple(out[0, 0]) == (100, 50, 25)

    def test_median_cut_two_clusters(self):
        img = np.zeros((10, 10, 3), dtype=np.uint8)
        img[:, 5:] = (250, 10, 10)
        img[:, :5] = (10, 10, 250)
        hist = histogram_partial_rgb(img)
        pal = median_cut(hist, n_colors=2)
        assert len(pal) == 2
        # one reddish, one blueish entry
        reds = pal[:, 0] > pal[:, 2]
        assert reds.any() and (~reds).any()

    def test_partials_merge_equals_global(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
        full = histogram_partial_rgb(img)
        parts = (histogram_partial_rgb(img[:10]) +
                 histogram_partial_rgb(img[10:]))
        np.testing.assert_array_equal(full, parts)

    def test_rgb_to_palette_roundtrip(self):
        pal = np.array([[0, 0, 0], [255, 0, 0], [0, 0, 255]],
                       dtype=np.uint8)
        img = np.array([[[250, 5, 5], [2, 2, 2], [10, 0, 240]]],
                       dtype=np.uint8)
        idx = rgb_to_palette(img, pal)
        assert idx.tolist() == [[1, 0, 2]]


class TestColorMerge:
    def test_full_colorspace_identity(self):
        """Replicates test_gdalalg_raster_color_merge_check_rgb_hsb_conversion:
        merging RGB with gray == max(r,g,b) (its own HSV value channel)
        must reproduce the input byte-exactly over the quantized cube."""
        from raydal.ops.color import color_merge

        N = 64
        r, g, b = np.meshgrid(np.arange(N), np.arange(N), np.arange(N),
                              indexing="ij")

        def scale(x):
            return np.where(x == N - 1, 255, x * (256 // N)).astype(np.uint8)

        rgb = np.stack([scale(r).ravel(), scale(g).ravel(),
                        scale(b).ravel()], axis=-1).reshape(1, -1, 3)
        gray = rgb.max(axis=-1)
        np.testing.assert_array_equal(color_merge(rgb, gray), rgb)

    def test_value_replacement(self):
        from raydal.ops.color import color_merge

        rgb = np.array([[[200, 100, 0]]], dtype=np.uint8)
        out = color_merge(rgb, np.array([[100]], dtype=np.uint8))
        # hue preserved (red-orange sector), value halved
        assert out[0, 0].max() == 100
        assert out[0, 0, 0] == 100 and out[0, 0, 2] == 0
