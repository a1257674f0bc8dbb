"""Halo exchange: windowed ops across tile seams match whole-raster."""

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo import cells
from raydal.ops.raster_math import hillshade, slope
from raydal.ops.stencil import apply_with_halo, emit_halo_strips


def _make_tiles(world, z, x0, y0, ts):
    """Split a (2ts, 2ts) world array into 4 tiles at (x0..x0+1, y0..y0+1)."""
    rows = []
    for dy in range(2):
        for dx in range(2):
            tile = world[dy * ts:(dy + 1) * ts, dx * ts:(dx + 1) * ts]
            rows.append({"cell": int(cells.pack_cell(z, x0 + dx, y0 + dy)),
                         "data": np.ascontiguousarray(tile).tobytes()})
    return pa.Table.from_pylist(rows)


class TestHaloExchange:
    def test_strip_emission_counts(self):
        ts = 8
        t = _make_tiles(np.arange(4 * ts * ts, dtype=np.float64)
                        .reshape(2 * ts, 2 * ts), 4, 4, 4, ts)
        out = emit_halo_strips(t, tile_size=ts, r=1)
        kinds = out.to_pandas().groupby("kind").size()
        # 4 tiles + each tile sends strips to its in-matrix neighbors:
        # the 2x2 block interior exchange = 4 horizontal + 4 vertical +
        # 4 diagonal strips, plus strips leaving toward outside cells
        assert kinds["tile"] == 4
        assert (out.num_rows - 4) >= 12

    def test_windowed_mean_matches_whole_raster(self, ray_session):
        import ray.data

        ts = 16
        rng = np.random.default_rng(8)
        world = rng.uniform(0, 100, (2 * ts, 2 * ts))
        tiles = _make_tiles(world, 5, 10, 10, ts)

        def mean3(p):
            h, w = p.shape
            return sum(p[dy:dy + h - 2, dx:dx + w - 2]
                       for dy in range(3) for dx in range(3)) / 9.0

        out = apply_with_halo(ray.data.from_arrow(tiles), mean3,
                              tile_size=ts, r=1).to_pandas()
        # whole-raster oracle (zero-padded, matching fill=0.0)
        pw = np.zeros((2 * ts + 2, 2 * ts + 2))
        pw[1:-1, 1:-1] = world
        expect_full = sum(pw[dy:dy + 2 * ts, dx:dx + 2 * ts]
                          for dy in range(3) for dx in range(3)) / 9.0
        for _, row in out.iterrows():
            z, x, y = (int(v) for v in cells.unpack_cell(
                np.int64(row["cell"])))
            got = np.frombuffer(row["data"],
                                dtype=np.float64).reshape(ts, ts)
            ex = expect_full[(y - 10) * ts:(y - 9) * ts,
                             (x - 10) * ts:(x - 9) * ts]
            np.testing.assert_allclose(got, ex, atol=1e-12)

    def test_hillshade_seamless_across_tiles(self, ray_session):
        """Hillshade computed per tile WITH halos == whole-raster result
        at every interior seam pixel (the per-tile-without-halo version
        differs there)."""
        import ray.data

        ts = 16
        yy, xx = np.mgrid[0:2 * ts, 0:2 * ts].astype(np.float64)
        world = 10 * np.sin(xx / 5) + 8 * np.cos(yy / 7) + xx * 0.3
        tiles = _make_tiles(world, 5, 2, 2, ts)

        out = apply_with_halo(
            ray.data.from_arrow(tiles),
            lambda p: hillshade(p, 1.0, 1.0).astype(np.float64),
            tile_size=ts, r=1).to_pandas()
        full = hillshade(world, 1.0, 1.0).astype(np.float64)
        for _, row in out.iterrows():
            z, x, y = (int(v) for v in cells.unpack_cell(
                np.int64(row["cell"])))
            got = np.frombuffer(row["data"],
                                dtype=np.float64).reshape(ts, ts)
            ex = full[(y - 2) * ts:(y - 1) * ts, (x - 2) * ts:(x - 1) * ts]
            # interior pixels (away from the WORLD edge, where padding
            # semantics differ) must match exactly, including tile seams
            sl_y = slice(1, ts) if y == 2 else slice(0, ts - 1)
            sl_x = slice(1, ts) if x == 2 else slice(0, ts - 1)
            np.testing.assert_array_equal(got[sl_y, sl_x], ex[sl_y, sl_x])
