"""Tests for vector geometry operators (reproject, explode, simplify...)."""

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo import wkb as W
from raydal.geo.crs import Transformer
from raydal.ops import vector as V


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], dtype=np.float64)


class TestReproject:
    def test_roundtrip_polygon(self):
        blob = W.polygon_wkb([_sq(2.0, 45.0, 1.0)])
        fwd = V.reproject_wkb(blob, Transformer(4326, 3857))
        back = V.reproject_wkb(fwd, Transformer(3857, 4326))
        t, rings = W.parse_wkb(back)
        np.testing.assert_allclose(rings[0], _sq(2.0, 45.0, 1.0), atol=1e-9)

    def test_actor_batch(self):
        tbl = pa.Table.from_pydict({
            "id": pa.array([1, 2], pa.int64()),
            "wkb": pa.array([W.point_wkb(0.0, 0.0),
                             W.point_wkb(3.0, 0.0)], pa.binary())})
        out = V.VectorReproject(4326, 32631)(tbl)
        t, c = W.parse_wkb(out["wkb"][1].as_py())
        assert c[0, 0] == pytest.approx(500000.0, abs=1e-6)

    def test_multipolygon_reproject(self):
        blob = W.multipolygon_wkb([[_sq(0, 0, 1)], [_sq(5, 5, 1)]])
        out = V.reproject_wkb(blob, Transformer(4326, 3857))
        assert W.wkb_geom_type(out) == W.MULTIPOLYGON


class TestExplode:
    def test_multi_explodes_singles_pass(self):
        tbl = pa.Table.from_pydict({
            "gid": pa.array(["m", "s"], pa.string()),
            "wkb": pa.array([
                W.multipolygon_wkb([[_sq(0, 0, 1)], [_sq(3, 3, 1)],
                                    [_sq(6, 6, 1)]]),
                W.polygon_wkb([_sq(9, 9, 1)])], pa.binary())})
        out = V.explode_batch(tbl)
        assert out.num_rows == 4
        assert out["gid"].to_pylist() == ["m", "m", "m", "s"]
        assert out["part_index"].to_pylist() == [0, 1, 2, 0]
        for b in out["wkb"].to_pylist():
            assert W.wkb_geom_type(b) == W.POLYGON


class TestGeomOps:
    def test_swap_xy(self):
        out = V.swap_xy(W.point_wkb(1.0, 2.0))
        _, c = W.parse_wkb(out)
        np.testing.assert_allclose(c, [[2.0, 1.0]])

    def test_segmentize(self):
        line = np.array([[0.0, 0.0], [10.0, 0.0]])
        out = V.segmentize(line, 3.0)
        assert len(out) == 5  # 0, 2.5, 5, 7.5, 10
        assert np.diff(out[:, 0]).max() <= 3.0

    def test_simplify_dp(self):
        # nearly-collinear middle point removed at tol, kept when sharp
        line = np.array([[0, 0], [5, 0.01], [10, 0]], dtype=np.float64)
        assert len(V.simplify_dp(line, 0.1)) == 2
        line2 = np.array([[0, 0], [5, 3.0], [10, 0]], dtype=np.float64)
        assert len(V.simplify_dp(line2, 0.1)) == 3

    def test_centroid_square_and_hole(self):
        assert V.centroid([_sq(0, 0, 4)]) == (2.0, 2.0)
        # hole pulls centroid away: square 4x4 with 1x1 hole at (3,3)..(4,4)
        cx, cy = V.centroid([_sq(0, 0, 4), _sq(3, 3, 1)])
        assert cx < 2.0 and cy < 2.0

    def test_convex_hull(self):
        pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]],
                       dtype=np.float64)
        hull = V.convex_hull(pts)
        assert len(hull) == 5  # 4 corners closed
        assert abs(W.polygon_area([hull]) - 16.0) < 1e-12

    def test_buffer_point_area(self):
        ring = V.buffer_point(0.0, 0.0, 2.0, quad_segs=16)
        area = W.polygon_area([ring])
        assert area == pytest.approx(np.pi * 4, rel=0.01)

    def test_buffer_convex_square(self):
        ring = V.buffer_convex(_sq(0, 0, 2), 1.0, quad_segs=16)
        area = W.polygon_area([ring])
        # square side 2 buffered by 1: area = 4 + 4*2*1 + pi*1^2
        assert area == pytest.approx(4 + 8 + np.pi, rel=0.01)
        # all original corners at distance >= 1 inside
        assert W.points_in_polygon([ring], [0.0], [0.0])[0]

    def test_buffer_concave_raises(self):
        concave = np.array([[0, 0], [4, 0], [4, 4], [2, 1], [0, 4], [0, 0]],
                           dtype=np.float64)
        with pytest.raises(NotImplementedError):
            V.buffer_convex(concave, 0.5)

    def test_geometry_stats(self):
        tbl = pa.Table.from_pydict({
            "wkb": pa.array([W.polygon_wkb([_sq(0, 0, 2)]),
                             W.multipolygon_wkb([[_sq(0, 0, 1)],
                                                 [_sq(5, 5, 2)]])],
                            pa.binary())})
        out = V.geometry_stats_batch(tbl)
        assert out["geom_area"].to_pylist() == [4.0, 5.0]
        assert out["n_parts"].to_pylist() == [1, 2]
        assert out["centroid_x"][0].as_py() == pytest.approx(1.0)


class TestRound3Scalars:
    """UnaryUnion / ConcaveHull / SimplifyPreserveTopology
    (ogrgeometry.cpp:5227/:4305/:6419 semantics on engine kernels)."""

    def test_unary_union_overlap_and_disjoint(self):
        from raydal.geo.wkb import box_polygon, polygon_wkb, \
            polygons_from_wkb
        from raydal.ops.vector import unary_union_wkb

        blobs = [polygon_wkb(box_polygon(0, 0, 4, 4)),
                 polygon_wkb(box_polygon(2, 2, 6, 6)),
                 polygon_wkb(box_polygon(10, 10, 11, 11))]
        blob, area = unary_union_wkb(blobs)
        assert area == pytest.approx(16 + 16 - 4 + 1)
        assert len(polygons_from_wkb(blob)) == 2  # merged pair + island

    def test_concave_hull_ratio1_is_convex_hull(self):
        from raydal.geo.clip import ring_area
        from raydal.ops.vector import concave_hull, convex_hull

        pts = [(r * np.cos(t), r * np.sin(t))
               for t in np.linspace(0, 1.5 * np.pi, 60)
               for r in (4, 4.5, 5)]
        pts = np.array(pts)
        ch = concave_hull(pts, ratio=1.0)
        hull = np.asarray(convex_hull(pts))
        assert abs(ring_area(ch)) == pytest.approx(abs(ring_area(hull)))

    def test_concave_hull_hugs_c_shape(self):
        from raydal.geo.clip import ring_area
        from raydal.ops.vector import concave_hull

        pts = np.array([(r * np.cos(t), r * np.sin(t))
                        for t in np.linspace(0, 1.5 * np.pi, 60)
                        for r in (4, 4.5, 5)])
        cc = abs(ring_area(concave_hull(pts, ratio=0.05)))
        # the C band is ~1.5π·4.5 ≈ 21.2; convex hull is 71.3
        assert 15 < cc < 30

    def test_concave_hull_grid_cocircular(self):
        from raydal.geo.clip import ring_area
        from raydal.ops.vector import concave_hull

        gx, gy = np.meshgrid(np.arange(10), np.arange(6))
        grid = np.stack([gx.ravel(), gy.ravel()], 1).astype(float)
        assert abs(ring_area(concave_hull(grid, ratio=1.0))) == \
            pytest.approx(45.0)

    def test_simplify_preserve_topology_guards(self):
        from raydal.ops.vector import (_ring_self_intersects,
                                       simplify_preserve_topology)

        sq = np.array([[0, 0], [10, 0.01], [20, 0], [20, 10],
                       [10, 10.01], [0, 10], [0, 0]], float)
        sp = simplify_preserve_topology(sq, 1.0)
        assert len(sp) == 5  # collinear bumps removed
        # a huge tolerance must never collapse the ring below 4 points
        sp2 = simplify_preserve_topology(sq, 1e9)
        assert len(sp2) >= 4
        assert not _ring_self_intersects(sp2)
        # U-shape where aggressive DP would self-intersect: result must
        # stay simple
        u = np.array([[0, 0], [10, 0], [10, 8], [6, 8], [6, 2], [4, 2],
                      [4, 8], [0, 8], [0, 0]], float)
        r = simplify_preserve_topology(u, 3.0)
        assert not _ring_self_intersects(r)


def test_geometry_stats_length_column():
    import pyarrow as pa

    from raydal.geo.wkb import linestring_wkb, polygon_wkb, box_polygon
    from raydal.ops.vector import geometry_stats_batch

    t = pa.Table.from_pydict({"wkb": pa.array(
        [linestring_wkb([[0, 0], [3, 4]]),
         polygon_wkb(box_polygon(0, 0, 2, 2))], pa.binary())})
    out = geometry_stats_batch(t)
    assert out["geom_length"].to_pylist() == [5.0, 8.0]
