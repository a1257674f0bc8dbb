"""Tests for fillnodata / sieve / proximity."""

import numpy as np
import pytest

from raydal.ops.fill import fillnodata, proximity, sieve


class TestProximity:
    def test_single_target_euclidean(self):
        a = np.zeros((9, 9))
        a[4, 4] = 1
        d = proximity(a)
        assert d[4, 4] == 0
        assert d[4, 0] == pytest.approx(4.0)
        assert d[0, 0] == pytest.approx(np.hypot(4, 4))

    def test_target_values_and_maxdist(self):
        a = np.zeros((5, 5))
        a[0, 0] = 7
        a[4, 4] = 3
        d = proximity(a, target_values=[7], max_dist=3.0, nodata=-1)
        assert d[0, 0] == 0
        assert d[0, 3] == 3.0
        assert d[4, 4] == -1  # beyond max_dist from the 7-target

    def test_no_targets(self):
        d = proximity(np.zeros((4, 4)), nodata=-9)
        assert (d == -9).all()


class TestFillNodata:
    def test_fills_small_hole_exactly_on_flat(self):
        a = np.full((8, 8), 10.0)
        a[3:5, 3:5] = -1
        out = fillnodata(a, nodata=-1, max_dist=5)
        np.testing.assert_allclose(out, 10.0)

    def test_gradient_hole_plausible(self):
        xx = np.tile(np.arange(10, dtype=np.float64), (10, 1))
        a = xx.copy()
        a[4:6, 4:6] = -1
        out = fillnodata(a, nodata=-1, max_dist=6)
        assert (out != -1).all()
        # filled values between the flanking columns
        assert 3.0 <= out[4, 4] <= 6.0

    def test_distant_hole_stays_nodata(self):
        a = np.full((40, 40), -1.0)
        a[0, 0] = 5.0
        out = fillnodata(a, nodata=-1, max_dist=3)
        assert out[20, 20] == -1.0
        assert out[0, 1] == 5.0


class TestSieve:
    def test_small_island_removed(self):
        a = np.zeros((8, 8), dtype=np.int32)
        a[2:4, 2:4] = 1  # 4-px island (below threshold 5)
        out = sieve(a, threshold=5)
        assert (out == 0).all()

    def test_large_region_survives(self):
        a = np.zeros((8, 8), dtype=np.int32)
        a[2:6, 2:6] = 1  # 16 px
        out = sieve(a, threshold=5)
        assert (out[2:6, 2:6] == 1).all()

    def test_merge_into_largest_neighbor(self):
        a = np.zeros((6, 9), dtype=np.int32)
        a[:, :4] = 2          # big region value 2 (24 px)
        a[2, 4] = 7           # 1-px island wedged between 2 and 0
        a[:, 5:] = 3          # region value 3 (24 px)
        out = sieve(a, threshold=2)
        assert out[2, 4] in (0, 2)  # merged into a large neighbor
        assert (out != 7).all()
