"""Unit tests for the pure-numpy geo core (no Ray needed)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raydal.geo import affine, cells, crs, wkb


class TestAffine:
    def test_apply_and_invert_roundtrip(self):
        gt = (100.0, 0.5, 0.1, 200.0, -0.05, -0.5)
        px = np.array([0.0, 3.5, 10.0])
        py = np.array([0.0, 2.0, 7.5])
        x, y = affine.apply_gt(gt, px, py)
        inv = affine.invert_gt(gt)
        px2, py2 = affine.apply_gt(inv, x, y)
        np.testing.assert_allclose(px2, px, atol=1e-9)
        np.testing.assert_allclose(py2, py, atol=1e-9)

    def test_extent_north_up(self):
        gt = affine.north_up_gt(10.0, 50.0, 0.1, 0.2)
        assert affine.gt_extent(gt, 100, 100) == (10.0, 30.0, 20.0, 50.0)

    def test_pixel_centers(self):
        gt = affine.north_up_gt(0.0, 2.0, 1.0, 1.0)
        X, Y = affine.pixel_centers(gt, 2, 2)
        np.testing.assert_allclose(X, [[0.5, 1.5], [0.5, 1.5]])
        np.testing.assert_allclose(Y, [[1.5, 1.5], [0.5, 0.5]])


class TestCrs:
    @given(lon=st.floats(-179, 179), lat=st.floats(-84, 84))
    @settings(max_examples=60, deadline=None)
    def test_mercator_roundtrip(self, lon, lat):
        x, y = crs.lonlat_to_mercator(lon, lat)
        lo, la = crs.mercator_to_lonlat(x, y)
        assert abs(float(lo) - lon) < 1e-9
        assert abs(float(la) - lat) < 1e-9

    def test_utm_known_point(self):
        # Freiburg (zone 32N), published UTM coordinates
        e, n = crs.lonlat_to_utm(np.array([7.8509671]),
                                 np.array([47.9941214]), 32632)
        assert abs(e[0] - 414278.16) < 0.5
        assert abs(n[0] - 5316285.59) < 0.5

    def test_utm_central_meridian(self):
        e, n = crs.lonlat_to_utm(np.array([3.0]), np.array([0.0]), 32631)
        assert e[0] == pytest.approx(500000.0, abs=1e-6)
        assert n[0] == pytest.approx(0.0, abs=1e-6)

    @given(lon=st.floats(-2, 8), lat=st.floats(-70, 70))
    @settings(max_examples=60, deadline=None)
    def test_utm_roundtrip(self, lon, lat):
        e, n = crs.lonlat_to_utm(lon, lat, 32631)
        lo, la = crs.utm_to_lonlat(e, n, 32631)
        assert abs(float(lo) - lon) < 1e-7
        assert abs(float(la) - lat) < 1e-7

    def test_transformer_compose(self):
        tf = crs.Transformer(32631, 3857)
        e, n = crs.lonlat_to_utm(np.array([4.0]), np.array([45.0]), 32631)
        x, y = tf.transform(e, n)
        xe, ye = crs.lonlat_to_mercator(4.0, 45.0)
        assert abs(float(x[0]) - float(xe)) < 1e-3
        assert abs(float(y[0]) - float(ye)) < 1e-3


class TestCells:
    def test_tile_indices_epsilon_parity(self):
        """floor(frac + 1e-3) + clamp, per apps/gdalalg_raster_tile.cpp:274."""
        tm = cells.web_mercator_quad(2)
        # extent exactly on a tile boundary: EPSILON pushes index up
        x_edge = tm.top_left_x + tm.tile_span_x  # boundary of tile 0|1
        tx0, ty0, tx1, ty1 = cells.tile_indices(
            tm, x_edge, -1.0, x_edge + 1.0, 1.0)
        assert int(tx0) == 1
        # just inside (more than epsilon*span below the edge) stays at 0
        tx0, _, _, _ = cells.tile_indices(
            tm, x_edge - 0.002 * tm.tile_span_x, -1.0, x_edge, 1.0)
        assert int(tx0) == 0
        # clamp at the matrix limits
        tx0, ty0, tx1, ty1 = cells.tile_indices(tm, -1e9, -1e9, 1e9, 1e9)
        assert (int(tx0), int(ty0), int(tx1), int(ty1)) == (0, 0, 3, 3)

    def test_file_y_conventions(self):
        tm = cells.web_mercator_quad(3)
        assert cells.file_y(2, tm, "xyz") == 2
        assert cells.file_y(2, tm, "tms") == 5

    def test_pack_unpack_roundtrip(self):
        z = np.array([3, 10, 28])
        x = np.array([5, 1000, (1 << 28) - 1])
        y = np.array([2, 999, 12345])
        zz, xx, yy = cells.unpack_cell(cells.pack_cell(z, x, y))
        np.testing.assert_array_equal(zz, z)
        np.testing.assert_array_equal(xx, x)
        np.testing.assert_array_equal(yy, y)

    def test_parent_child_keying(self):
        cell = cells.pack_cell(5, 10, 7)
        z, x, y = cells.unpack_cell(cells.parent_cell(cell))
        assert (int(z), int(x), int(y)) == (4, 5, 3)
        kids = cells.children_cells(cell)
        assert len(kids) == 4
        assert set(int(c) for c in
                   np.array([cells.parent_cell(k) for k in kids]).ravel()
                   ) == {int(cell)}

    def test_grid_ring_counts(self):
        assert len(cells.grid_ring(5, 16, 16, 0)) == 1
        assert len(cells.grid_ring(5, 16, 16, 1)) == 8
        assert len(cells.grid_ring(5, 16, 16, 2)) == 16
        assert len(cells.grid_disk(5, 16, 16, 2)) == 25
        # clipped at the pole edge
        assert len(cells.grid_ring(5, 16, 0, 1)) == 5

    def test_quadkey(self):
        assert cells.quadkey(3, 5, 3) == "123"
        assert cells.quadkey(1, 0, 0) == "0"

    def test_hilbert_locality(self):
        # consecutive d values are adjacent cells (the curve is continuous)
        order = 4
        n = 1 << order
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = cells.hilbert_d(order, xs.ravel(), ys.ravel())
        assert sorted(d.tolist()) == list(range(n * n))
        pos = np.empty((n * n, 2), dtype=np.int64)
        pos[d] = np.stack([xs.ravel(), ys.ravel()], axis=1)
        steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
        assert (steps == 1).all()


class TestWkb:
    def test_point_roundtrip(self):
        t, c = wkb.parse_wkb(wkb.point_wkb(1.5, -2.5))
        assert t == wkb.POINT
        np.testing.assert_allclose(c, [[1.5, -2.5]])

    def test_polygon_roundtrip_and_area(self):
        ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
        blob = wkb.polygon_wkb([ring, hole])
        t, rings = wkb.parse_wkb(blob)
        assert t == wkb.POLYGON and len(rings) == 2
        assert wkb.wkb_area(blob) == pytest.approx(15.0)
        assert wkb.wkb_bbox(blob) == (0.0, 0.0, 4.0, 4.0)

    def test_multipolygon(self):
        blob = wkb.multipolygon_wkb([wkb.box_polygon(0, 0, 1, 1),
                                     wkb.box_polygon(2, 2, 3, 3)])
        assert wkb.wkb_geom_type(blob) == wkb.MULTIPOLYGON
        assert wkb.wkb_area(blob) == pytest.approx(2.0)
        assert len(wkb.polygons_from_wkb(blob)) == 2

    def test_pip_crossing_with_hole(self):
        rings = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
                 np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)]
        px = np.array([0.5, 1.5, 3.0, 5.0, -1.0])
        py = np.array([0.5, 1.5, 3.0, 5.0, 2.0])
        np.testing.assert_array_equal(
            wkb.points_in_polygon(rings, px, py),
            [True, False, True, False, False])
        # winding fallback agrees off-boundary
        np.testing.assert_array_equal(
            wkb.points_in_polygon(rings, px, py, method="winding"),
            [True, False, True, False, False])

    def test_pip_boundary(self):
        ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        px = np.array([0.0, 2.0, 4.0, 2.0, 2.0])
        py = np.array([0.0, 0.0, 4.0, 2.0, 4.5])
        np.testing.assert_array_equal(
            wkb.points_on_ring_boundary(ring, px, py),
            [True, True, True, False, False])

    @given(px=st.floats(-1, 5), py=st.floats(-1, 5))
    @settings(max_examples=100, deadline=None)
    def test_pip_crossing_vs_winding_agree(self, px, py):
        ring = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4],
                         [0, 0]], float)
        on = wkb.points_on_ring_boundary(ring, px, py)[0]
        if not on:
            a = wkb.points_in_ring(ring, px, py)[0]
            b = wkb.winding_number(ring, px, py)[0] != 0
            assert a == b

    def test_polygon_intersects(self):
        a = wkb.box_polygon(0, 0, 2, 2)
        assert wkb.polygon_intersects_polygon(a, wkb.box_polygon(1, 1, 3, 3))
        assert not wkb.polygon_intersects_polygon(a, wkb.box_polygon(3, 3, 4, 4))
        # containment without edge crossing
        assert wkb.polygon_intersects_polygon(a, wkb.box_polygon(0.5, 0.5, 1.5, 1.5))
        assert wkb.polygon_intersects_polygon(wkb.box_polygon(0.5, 0.5, 1.5, 1.5), a)
        # touching edge counts as intersecting
        assert wkb.polygon_intersects_polygon(a, wkb.box_polygon(2, 0, 3, 2))
