"""Round-2 gap closers: dither, make-valid, concave buffer, TIN grid.

The dither expectation hash was produced by compiling the reference's
own algorithm (cube build + /6 error diffusion transcribed from
alg/gdaldither.cpp into a C harness) and running it on the same
deterministic input — an independent oracle, not a self-pin.
"""

import numpy as np
import pytest

import raydal.geo.wkb as W
from raydal.ops.color import dither_rgb_to_pct
from raydal.ops.grid import delaunay_triangulate, linear_interpolate_grid
from raydal.ops.vector import buffer_convex, buffer_ring, make_valid_ring

PAL6 = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
        (0, 0, 255), (128, 128, 128)]


class TestDither:
    def test_matches_compiled_reference_semantics(self):
        W_, H_ = 37, 29
        img = np.zeros((H_, W_, 3), np.uint8)
        for y in range(H_):
            for x in range(W_):
                img[y, x] = ((x * 255) // (W_ - 1), (y * 255) // (H_ - 1),
                             (x * 7 + y * 13) % 256)
        out = dither_rgb_to_pct(img, PAL6)
        h = np.uint64(1469598103934665603)
        for v in out.ravel():
            h = np.uint64((int(h) ^ int(v)) * 1099511628211
                          & 0xFFFFFFFFFFFFFFFF)
        # FNV-1a of the compiled alg/gdaldither.cpp transcription's output
        assert int(h) == 4657676524047421709

    def test_flat_region_maps_to_nearest(self):
        img = np.full((8, 8, 3), 250, np.uint8)
        out = dither_rgb_to_pct(img, PAL6)
        assert (out == 1).all()  # white

    def test_local_average_tracks_source(self):
        # a mid-gray not in the palette dithers between entries; the
        # reference's /6 scheme deliberately diffuses only ~5/6 of each
        # error (sum of shares is e − e/6), so the mean tracks the
        # source with a damped bias rather than exactly
        img = np.full((64, 64, 3), 200, np.uint8)
        out = dither_rgb_to_pct(img, [(0, 0, 0), (255, 255, 255)])
        rec = np.array([(0, 0, 0), (255, 255, 255)])[out]
        assert abs(rec.mean() - 200) < 15
        assert 0 < (out == 1).mean() < 1  # genuinely dithered


class TestMakeValid:
    def test_bowtie_splits_into_two_triangles(self):
        bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], float)
        loops = make_valid_ring(bow)
        areas = sorted(abs(W.polygon_area([lp])) for lp in loops)
        assert len(loops) == 2
        assert areas == pytest.approx([1.0, 1.0])

    def test_simple_ring_unchanged(self):
        sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        loops = make_valid_ring(sq)
        assert len(loops) == 1
        assert abs(W.polygon_area([loops[0]])) == pytest.approx(1.0)

    def test_asymmetric_bowtie_area_conserved(self):
        bow = np.array([[0, 0], [4, 1], [4, 0], [0, 1], [0, 0]], float)
        loops = make_valid_ring(bow)
        total = sum(abs(W.polygon_area([lp])) for lp in loops)
        assert len(loops) == 2
        assert total == pytest.approx(4 * 1 / 2.0)  # w*h/4 per loop


class TestBufferRing:
    def test_concave_L_area(self):
        L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4],
                      [0, 0]], float)
        rings = buffer_ring(L, 0.5, px=0.03)
        area = sum(abs(W.polygon_area([r])) for r in rings)
        # exact = 7 (poly) + 16*0.5 (edges) + (2pi-? corners): five
        # convex 90° corners contribute quarter-discs (5·π·r²/4) and the
        # one reflex corner subtracts nothing beyond the edge overlap →
        # exact = 7 + 8 + 1.25π·0.25 − r² corner overlap at the reflex
        exact = 7 + 16 * 0.5 + 5 * np.pi * 0.25 / 4 - 0.25
        assert area == pytest.approx(exact, rel=0.05)

    def test_matches_convex_buffer_on_square(self):
        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
        exact = abs(W.polygon_area([buffer_convex(sq, 0.5)]))
        approx = sum(abs(W.polygon_area([r]))
                     for r in buffer_ring(sq, 0.5, px=0.02))
        assert approx == pytest.approx(exact, rel=0.05)


class TestTinGrid:
    def test_linear_field_reproduced_exactly(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 10, (40, 2))
        vals = 3.0 * pts[:, 0] - 2.0 * pts[:, 1] + 1.0
        xs = np.linspace(1, 9, 30)
        XX, YY = np.meshgrid(xs, xs)
        out = linear_interpolate_grid(pts, vals, XX, YY, nodata=np.nan)
        exact = 3.0 * XX - 2.0 * YY + 1.0
        ok = ~np.isnan(out)
        assert ok.sum() > 0.8 * out.size
        assert np.abs(out[ok] - exact[ok]).max() < 1e-9

    def test_outside_hull_is_nodata(self):
        pts = np.array([[0, 0], [1, 0], [0, 1]], float)
        vals = np.array([1.0, 2.0, 3.0])
        XX, YY = np.meshgrid([5.0], [5.0])
        out = linear_interpolate_grid(pts, vals, XX, YY, nodata=-1.0)
        assert out[0, 0] == -1.0

    def test_delaunay_empty_circumcircles(self):
        rng = np.random.default_rng(11)
        pts = rng.uniform(0, 1, (25, 2))
        tris = delaunay_triangulate(pts)
        for t in tris:
            a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
            # circumcenter
            d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                     + c[0] * (a[1] - b[1]))
            ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
                  + (c @ c) * (a[1] - b[1])) / d
            uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
                  + (c @ c) * (b[0] - a[0])) / d
            r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
            dist2 = ((pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2)
            inside = dist2 < r2 - 1e-9
            inside[list(t)] = False
            assert not inside.any()
