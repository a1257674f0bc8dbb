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
