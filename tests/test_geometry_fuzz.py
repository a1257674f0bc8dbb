"""Property/fuzz tests for geometry predicates against sampling oracles."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raydal.geo import wkb as W
from raydal.ops.vector import convex_hull, simplify_dp


def _random_convex(rng, cx, cy, r, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return np.vstack([ring, ring[:1]])


class TestIntersectsVsSampling:
    @pytest.mark.parametrize("seed", range(8))
    def test_polygon_intersects_matches_dense_sampling(self, seed):
        """If dense sampling finds a common point, intersects must be
        True; if the predicate is True, the pair must be 'close'."""
        rng = np.random.default_rng(seed)
        a = _random_convex(rng, 0.0, 0.0, rng.uniform(1, 3), 12)
        dx, dy = rng.uniform(-5, 5, 2)
        b = _random_convex(rng, dx, dy, rng.uniform(1, 3), 12)
        got = W.polygon_intersects_polygon([a], [b])
        # sampling oracle: grid points inside both?
        xs = np.linspace(-6, 8, 120)
        ys = np.linspace(-6, 8, 120)
        XX, YY = np.meshgrid(xs, ys)
        in_a = W.points_in_polygon([a], XX.ravel(), YY.ravel())
        in_b = W.points_in_polygon([b], XX.ravel(), YY.ravel())
        overlap = bool((in_a & in_b).any())
        if overlap:
            assert got, "sampling found overlap but predicate said no"
        if not got:
            assert not overlap

    @pytest.mark.parametrize("seed", range(6))
    def test_containment_detected_without_edge_crossing(self, seed):
        rng = np.random.default_rng(100 + seed)
        outer = _random_convex(rng, 0.0, 0.0, 5.0, 16)
        inner = _random_convex(rng, 0.0, 0.0, 1.0, 8)
        assert W.polygon_intersects_polygon([outer], [inner])
        assert W.polygon_intersects_polygon([inner], [outer])


class TestPipProperties:
    @given(st.integers(0, 10_000))
    @settings(max_examples=80, deadline=None)
    def test_crossing_winding_agree_off_boundary(self, seed):
        rng = np.random.default_rng(seed)
        ring = _random_convex(rng, 0.0, 0.0, rng.uniform(0.5, 4), 10)
        px = rng.uniform(-5, 5, 30)
        py = rng.uniform(-5, 5, 30)
        on = W.points_on_ring_boundary(ring, px, py)
        a = W.points_in_ring(ring, px, py)
        b = W.winding_number(ring, px, py) != 0
        assert (a[~on] == b[~on]).all()

    @given(st.integers(0, 10_000))
    @settings(max_examples=50, deadline=None)
    def test_convex_pip_matches_halfplane_test(self, seed):
        """For convex CCW rings, inside ⇔ left of every edge."""
        rng = np.random.default_rng(seed)
        ring = _random_convex(rng, 0.0, 0.0, 2.0, 9)
        px = rng.uniform(-3, 3, 40)
        py = rng.uniform(-3, 3, 40)
        a0 = ring[:-1]
        b0 = ring[1:]
        cross = ((b0[:, 0] - a0[:, 0])[None, :]
                 * (py[:, None] - a0[:, 1][None, :])
                 - (px[:, None] - a0[:, 0][None, :])
                 * (b0[:, 1] - a0[:, 1])[None, :])
        strict_inside = (cross > 1e-12).all(axis=1)
        strict_outside = (cross < -1e-12).any(axis=1)
        got = W.points_in_ring(ring, px, py)
        assert (got[strict_inside]).all()
        assert (~got[strict_outside]).all()


class TestWkbRoundtripFuzz:
    @given(st.integers(0, 10_000))
    @settings(max_examples=60, deadline=None)
    def test_polygon_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3, 40))
        ring = _random_convex(rng, rng.uniform(-100, 100),
                              rng.uniform(-100, 100),
                              rng.uniform(0.01, 1000), n)
        blob = W.polygon_wkb([ring])
        t, rings = W.parse_wkb(blob)
        assert t == W.POLYGON
        np.testing.assert_array_equal(rings[0], ring)

    @given(st.integers(0, 10_000))
    @settings(max_examples=40, deadline=None)
    def test_hull_contains_all_points(self, seed):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-10, 10, (int(rng.integers(3, 60)), 2))
        hull = convex_hull(pts)
        if len(hull) < 4:
            return  # degenerate (collinear)
        on = np.zeros(len(pts), dtype=bool)
        for i in range(len(pts)):
            on[i] = bool(W.points_on_ring_boundary(
                hull, [pts[i, 0]], [pts[i, 1]], eps=1e-9)[0])
        inside = W.points_in_polygon([hull], pts[:, 0], pts[:, 1])
        assert (inside | on).all()

    @given(st.integers(0, 10_000))
    @settings(max_examples=40, deadline=None)
    def test_simplify_endpoints_preserved(self, seed):
        rng = np.random.default_rng(seed)
        line = rng.uniform(-5, 5, (int(rng.integers(3, 50)), 2))
        out = simplify_dp(line, rng.uniform(0.01, 2.0))
        np.testing.assert_array_equal(out[0], line[0])
        np.testing.assert_array_equal(out[-1], line[-1])
        assert len(out) <= len(line)
