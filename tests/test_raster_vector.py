"""Tests for rasterize (scanline burn) and polygonize (CC + dissolve)."""

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo import cells, wkb as W
from raydal.ops.polygonize import (dissolve_across_tiles, label_components,
                                   polygonize_array, polygonize_tiles,
                                   trace_boundary)  # noqa: F401
from raydal.ops.rasterize import (burn_line_all_touched, burn_point,
                                  burn_polygons_tile, fill_polygon_even_odd,
                                  rasterize_zones)


class TestScanlineFill:
    def test_rectangle_exact(self):
        # rect [1,1]..[4,3] in pixel coords: pixel centers inside are
        # cols 1..3, rows 1..2
        rings = [np.array([[1, 1], [4, 1], [4, 3], [1, 3], [1, 1]], float)]
        out = fill_polygon_even_odd(rings, 6, 5)
        expect = np.zeros((5, 6))
        expect[1:3, 1:4] = 1
        np.testing.assert_array_equal(out, expect)

    def test_triangle_pixel_centers(self):
        rings = [np.array([[0, 0], [6, 0], [0, 6], [0, 0]], float)]
        out = fill_polygon_even_odd(rings, 6, 6)
        # GDAL polyInts convention (floor(x+0.5)): a center exactly ON
        # the right boundary at a half-integer crossing IS filled —
        # inside means (c+.5)+(r+.5) <= 6 here (validated against the
        # published rasterize checksums 6452/16265/121)
        for r in range(6):
            for c in range(6):
                inside = (c + 0.5) + (r + 0.5) <= 6
                assert out[r, c] == (1.0 if inside else 0.0), (r, c)

    def test_hole_even_odd(self):
        rings = [np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], float),
                 np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], float)]
        out = fill_polygon_even_odd(rings, 8, 8)
        assert out[1, 1] == 1 and out[4, 4] == 0 and out[6, 1] == 1

    def test_add_merge(self):
        rings = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
        out = fill_polygon_even_odd(rings, 4, 4, value=2.0, merge="add")
        out = fill_polygon_even_odd(rings, 4, 4, out=out, value=3.0,
                                    merge="add")
        assert (out == 5.0).all()

    def test_point_and_line_burn(self):
        out = np.zeros((5, 5))
        burn_point(out, [1.5, 4.9], [1.5, 0.1], value=7)
        assert out[1, 1] == 7 and out[0, 4] == 7
        out2 = np.zeros((5, 5))
        burn_line_all_touched(out2, [[0.5, 0.5], [4.5, 4.5]], value=1)
        assert all(out2[i, i] == 1 for i in range(5))

    def test_burn_polygons_tile_world_coords(self):
        gt = (100.0, 1.0, 0.0, 50.0, 0.0, -1.0)  # world [100..356]x[..50]
        blob = W.polygon_wkb(W.box_polygon(102.0, 46.0, 106.0, 48.0))
        out = burn_polygons_tile([blob], [9.0], gt, w=10, h=10)
        # x 102..106 → cols 2..5; y 46..48 → rows 2..3
        assert (out[2:4, 2:6] == 9.0).all()
        assert out.sum() == 9.0 * 8


class TestRasterizeDistributed:
    def test_rasterize_zones_add(self, ray_session):
        import ray.data

        zones = pa.Table.from_pydict({
            "zone_id": pa.array(["a", "b"]),
            "wkb": pa.array([
                W.polygon_wkb(W.box_polygon(0.0, 0.0, 10.0, 10.0)),
                W.polygon_wkb(W.box_polygon(5.0, 5.0, 15.0, 12.0))],
                pa.binary()),
            "pop": pa.array([1, 10], pa.int64())})
        out = rasterize_zones(ray.data.from_arrow(zones), z=6,
                              value_col="pop", merge="add").to_pandas()
        assert len(out) >= 1
        total = sum(np.frombuffer(d, dtype=np.float64).sum()
                    for d in out["data"])
        assert total > 0
        # overlap region has value 11 somewhere
        maxv = max(np.frombuffer(d, dtype=np.float64).max()
                   for d in out["data"])
        assert maxv == 11.0


class TestPolygonize:
    def test_label_components_basic(self):
        a = np.array([[1, 1, 0], [0, 1, 0], [2, 0, 1]], dtype=np.int32)
        lab = label_components(a, 4, background=0)
        assert lab[0, 0] == lab[0, 1] == lab[1, 1]
        assert lab[2, 0] != 0 and lab[2, 0] != lab[0, 0]
        assert lab[2, 2] != lab[1, 1]  # diagonal not connected at 4-conn
        lab8 = label_components(a, 8, background=0)
        # value must STILL match for merge: a[2,2]=1 diag-touches a[1,1]=1
        assert lab8[2, 2] == lab8[1, 1]

    def test_polygonize_array_values_and_counts(self):
        a = np.zeros((8, 8))
        a[1:3, 1:4] = 5.0
        a[5:7, 5:7] = 9.0
        comps = polygonize_array(a, background=0.0)
        got = {(c["value"], c["n_pixels"]) for c in comps}
        assert got == {(5.0, 6), (9.0, 4)}

    def test_trace_boundary_rectangle(self):
        m = np.zeros((6, 6), dtype=bool)
        m[2:4, 1:5] = True
        ring = trace_boundary(m)
        xs, ys = ring[:, 0], ring[:, 1]
        assert xs.min() == 1 and xs.max() == 5
        assert ys.min() == 2 and ys.max() == 4
        # closed ring
        assert (ring[0] == ring[-1]).all()

    def test_8conn_diagonal_pinch_boundary(self):
        """Regression: diagonal pinch corners carry two boundary edges;
        the trace must pass through them and stay closed."""
        a = np.array([[1, 0], [0, 1]], dtype=np.int8)
        lab = label_components(a, 8, background=0)
        assert lab.max() == 1
        ring = trace_boundary(lab == 1)
        assert (ring[0] == ring[-1]).all()
        from raydal.geo.wkb import polygon_area
        assert polygon_area([ring]) == 2.0
        comps = polygonize_array(a, connectivity=8, background=0)
        assert [c["n_pixels"] for c in comps] == [2]

    def test_polygonize_hole_detection(self):
        a = np.zeros((8, 8))
        a[1:7, 1:7] = 3.0
        a[3:5, 3:5] = 0.0  # hole
        comps = polygonize_array(a, background=0.0)
        assert len(comps) == 1
        assert comps[0]["n_holes"] == 1

    def test_cross_tile_dissolve(self, ray_session):
        """A component spanning two adjacent tiles merges into one."""
        import ray.data

        ts = 16
        z = 5
        # two neighboring tiles (x=3, x=4 at y=2) share a vertical edge;
        # burn a band crossing it at rows 4..6
        a = np.zeros((ts, ts))
        b = np.zeros((ts, ts))
        a[4:7, 10:] = 2.0   # touches right edge of tile 3
        b[4:7, :5] = 2.0    # touches left edge of tile 4
        b[12:14, 8:10] = 7.0  # interior component, stays separate
        tiles = pa.Table.from_pydict({
            "cell": pa.array([int(cells.pack_cell(z, 3, 2)),
                              int(cells.pack_cell(z, 4, 2))], pa.int64()),
            "data": pa.array([a.tobytes(), b.tobytes()], pa.binary())})
        comps = polygonize_tiles(ray.data.from_arrow(tiles),
                                 tile_size=ts).to_pandas()
        assert len(comps) == 3  # band-left, band-right, interior
        dissolved = dissolve_across_tiles(comps)
        assert len(dissolved) == 2
        band = dissolved[dissolved["value"] == 2.0].iloc[0]
        assert band["n_pixels"] == 3 * 6 + 3 * 5
        assert band["n_tiles"] == 2
        inner = dissolved[dissolved["value"] == 7.0].iloc[0]
        assert inner["n_tiles"] == 1

    def test_dissolve_interior_stays_distributed(self, ray_session,
                                                 monkeypatch):
        """With interior components ≫ border components, only the border
        set may reach the driver: spy on Dataset.to_pandas and assert the
        largest driver materialization is bounded by the border count."""
        import ray.data

        ts = 16
        z = 5
        # tile A: 16 interior blobs + 1 band touching the right edge;
        # tile B: the band's continuation + 16 more interior blobs
        a = np.zeros((ts, ts))
        b = np.zeros((ts, ts))
        for k in range(16):
            y = 2 + (k % 4) * 3
            x = 2 + (k // 4) * 3
            a[y, x] = 10.0 + k
            b[y, x] = 40.0 + k
        a[14:15, 10:] = 2.0
        b[14:15, :5] = 2.0
        tiles = pa.Table.from_pydict({
            "cell": pa.array([int(cells.pack_cell(z, 3, 2)),
                              int(cells.pack_cell(z, 4, 2))], pa.int64()),
            "data": pa.array([a.tobytes(), b.tobytes()], pa.binary())})
        comps = polygonize_tiles(ray.data.from_arrow(tiles), tile_size=ts)

        pulled = []
        orig = ray.data.Dataset.to_pandas

        def spy(self, *args, **kwargs):
            df = orig(self, *args, **kwargs)
            pulled.append(len(df))
            return df

        monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
        out = dissolve_across_tiles(comps)
        result = orig(out)  # consume WITHOUT the spy counting it
        # 32 interior + 1 dissolved border component
        assert len(result) == 33
        assert result[result["value"] == 2.0].iloc[0]["n_tiles"] == 2
        # driver saw only the 2 border rows, never the 32 interior rows
        assert pulled and max(pulled) == 2
