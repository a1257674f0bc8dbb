"""General polygon boolean engine (raydal.geo.boolean).

Reference scope: GEOS-backed ``ogr/ogrgeometry.cpp:4893`` Intersection,
``:5012`` Union, ``:5113`` Difference, ``:5163`` SymDifference — here
for concave, holed, multi-ring operands.  Oracles: closed-form areas,
an independent grid-rasterization check for rectilinear shapes, and the
exact Sutherland-Hodgman path for convex pairs.
"""

import numpy as np
import pytest

from raydal.geo.boolean import (boolean_area, boolean_op,
                                normalize_polygons, union_all)
from raydal.geo.clip import (is_convex, polygon_area_rings, ring_area,
                             sutherland_hodgman)


def ring(*pts):
    a = np.asarray(pts, float)
    return np.vstack([a, a[:1]])


def box(x0, y0, x1, y1):
    return ring((x0, y0), (x1, y0), (x1, y1), (x0, y1))


def area(polys):
    return sum(polygon_area_rings(p) for p in polys)


class TestBasicOps:
    A = [[box(0, 0, 10, 10)]]
    B = [[box(5, 5, 15, 15)]]

    @pytest.mark.parametrize("op,expected", [
        ("and", 25.0), ("or", 175.0), ("sub", 75.0), ("xor", 150.0)])
    def test_rect_pair(self, op, expected):
        assert boolean_area(self.A, self.B, op) == pytest.approx(expected)
        assert area(boolean_op(self.A, self.B, op)) == \
            pytest.approx(expected)

    def test_disjoint(self):
        C = [[box(20, 20, 22, 22)]]
        assert boolean_area(self.A, C, "and") == 0.0
        assert boolean_area(self.A, C, "or") == pytest.approx(104.0)
        assert len(boolean_op(self.A, C, "or")) == 2

    def test_contained(self):
        inner = [[box(2, 2, 4, 4)]]
        assert boolean_area(self.A, inner, "and") == pytest.approx(4.0)
        sub = boolean_op(self.A, inner, "sub")
        assert area(sub) == pytest.approx(96.0)
        # difference has a hole
        assert [len(p) for p in sub] == [2]

    def test_identical(self):
        assert boolean_area(self.A, self.A, "and") == pytest.approx(100.0)
        assert boolean_area(self.A, self.A, "xor") == 0.0
        assert boolean_area(self.A, self.A, "or") == pytest.approx(100.0)

    def test_shared_edge_union(self):
        B = [[box(10, 0, 20, 10)]]
        u = boolean_op(self.A, B, "or")
        assert len(u) == 1
        assert area(u) == pytest.approx(200.0)
        assert boolean_area(self.A, B, "and") == 0.0

    def test_corner_touch_two_rings(self):
        B = [[box(10, 10, 20, 20)]]
        u = boolean_op(self.A, B, "or")
        assert len(u) == 2
        assert [len(p) for p in u] == [1, 1]
        assert area(u) == pytest.approx(200.0)


class TestConcaveAndHoles:
    L = [[ring((0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10))]]
    R = [[box(2, 2, 8, 8)]]

    def test_concave_ops(self):
        assert boolean_area(self.L, self.R, "and") == pytest.approx(20.0)
        assert boolean_area(self.L, self.R, "or") == pytest.approx(80.0)
        assert boolean_area(self.L, self.R, "sub") == pytest.approx(44.0)

    def test_donut_strip(self):
        D = [[box(0, 0, 10, 10), box(3, 3, 7, 7)[::-1]]]
        S = [[box(4, -2, 6, 12)]]
        assert boolean_area(D, S, "and") == pytest.approx(12.0)
        assert boolean_area(D, S, "sub") == pytest.approx(72.0)
        assert boolean_area(D, S, "or") == pytest.approx(100.0)
        sub = boolean_op(D, S, "sub")
        assert len(sub) == 2
        assert area(sub) == pytest.approx(72.0)

    def test_hole_filling_union(self):
        D = [[box(0, 0, 10, 10), box(3, 3, 7, 7)[::-1]]]
        plug = [[box(3, 3, 7, 7)]]
        u = boolean_op(D, plug, "or")
        assert area(u) == pytest.approx(100.0)
        assert [len(p) for p in u] == [1]

    def test_normalize_orientation(self):
        # outer given CW, hole given CCW → normalized to CCW/CW
        p = normalize_polygons([[box(0, 0, 4, 4)[::-1], box(1, 1, 2, 2)]])
        assert ring_area(p[0][0]) > 0
        assert ring_area(p[0][1]) < 0


class TestUnionAll:
    def test_disjoint_parts_survive_iteration(self):
        # regression: the r2 _inside bug treated a second disjoint
        # component as a hole and dropped it from later unions
        rects = [[[box(1, 8, 3, 9)]], [[box(6, 11, 10, 15)]],
                 [[box(8, 9, 11, 10)]]]
        u = union_all(rects)
        assert area(u) == pytest.approx(2 + 16 + 3)
        assert len(u) == 3

    def test_overlapping(self):
        u = union_all([[[box(0, 0, 4, 4)]], [[box(2, 2, 6, 6)]],
                       [[box(4, 4, 8, 8)]]])
        assert area(u) == pytest.approx(16 * 3 - 4 - 4)


class TestFuzzRectilinear:
    def test_grid_oracle(self):
        rng = np.random.default_rng(42)

        def rand_shape():
            rects = []
            for _ in range(rng.integers(1, 4)):
                x0, y0 = rng.integers(0, 12, 2)
                w, h = rng.integers(1, 6, 2)
                rects.append([[box(x0, y0, x0 + w, y0 + h)]])
            return union_all(rects), rects

        xs = np.arange(0.25, 20, 0.5)
        X, Y = np.meshgrid(xs, xs)

        def grid_mask(rects):
            m = np.zeros(X.shape, bool)
            for r in rects:
                b = r[0][0]
                m |= (X > b[:, 0].min()) & (X < b[:, 0].max()) \
                    & (Y > b[:, 1].min()) & (Y < b[:, 1].max())
            return m

        for _ in range(40):
            A, ra = rand_shape()
            B, rb = rand_shape()
            ma, mb = grid_mask(ra), grid_mask(rb)
            exp = {"and": ma & mb, "or": ma | mb,
                   "sub": ma & ~mb, "xor": ma ^ mb}
            for op in ("and", "or", "sub", "xor"):
                got = boolean_area(A, B, op)
                assert got == pytest.approx(exp[op].sum() * 0.25,
                                            abs=1e-6), op
            got_rings = area(boolean_op(A, B, "xor"))
            assert got_rings == pytest.approx(
                boolean_area(A, B, "xor"), abs=1e-6)


class TestFuzzConvexDifferential:
    def test_vs_sutherland_hodgman(self):
        rng = np.random.default_rng(7)

        def hull(pts):
            pts = sorted(map(tuple, pts))

            def half(ps):
                h = []
                for p in ps:
                    while len(h) >= 2 and \
                            (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1]) - \
                            (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0]) <= 0:
                        h.pop()
                    h.append(p)
                return h
            lo, hi = half(pts), half(reversed(pts))
            return np.array(lo[:-1] + hi[:-1] + [lo[0]], float)

        n = 0
        for _ in range(60):
            a = hull(rng.uniform(0, 10, (8, 2)).round(2))
            b = hull(rng.uniform(0, 10, (8, 2)).round(2))
            if len(a) < 4 or len(b) < 4 or not is_convex(a) \
                    or not is_convex(b):
                continue
            if ring_area(a) < 0:
                a = a[::-1]
            if ring_area(b) < 0:
                b = b[::-1]
            clipped = sutherland_hodgman(a, b)
            exp = abs(ring_area(clipped)) if len(clipped) else 0.0
            assert boolean_area([[a]], [[b]], "and") == \
                pytest.approx(exp, abs=1e-6)
            aa, bb = abs(ring_area(a)), abs(ring_area(b))
            o = boolean_area([[a]], [[b]], "or")
            s = boolean_area([[a]], [[b]], "sub")
            x = boolean_area([[a]], [[b]], "xor")
            assert o == pytest.approx(aa + bb - exp, abs=1e-6)
            assert s == pytest.approx(aa - exp, abs=1e-6)
            assert x == pytest.approx(o - exp, abs=1e-6)
            n += 1
        assert n >= 30
