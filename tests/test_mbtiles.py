"""MBTiles reader/writer — parity vs the reference's published values
(``autotest/gdrivers/mbtiles.py``) plus write→read round-trips."""

from __future__ import annotations

import os

import numpy as np
import pytest

from raydal.io.mbtiles import (MAX_GM, read_mbtiles_metadata,
                               read_mbtiles_raster, read_mbtiles_tiles,
                               write_mbtiles)
from raydal.io.png import encode_png
from raydal.kernels.checksum import checksum

MBT = "/root/reference/autotest/gdrivers/data/mbtiles/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(MBT), reason="reference fixtures not present")


@needs_fixtures
class TestReferenceParity:
    def test_byte_checksum(self):
        # autotest/gdrivers/mbtiles.py:545 — band 1 checksum 4118
        rgba, gt = read_mbtiles_raster(MBT + "byte.mbtiles")
        assert rgba.shape == (19, 19, 4)
        assert checksum(rgba[:, :, 0]) == 4118
        # gray tile: RGB bands identical, alpha from the PNG alpha band
        assert checksum(rgba[:, :, 1]) == 4118
        assert checksum(rgba[:, :, 2]) == 4118

    def test_world_l1_no_bounds(self):
        # test_mbtiles_2 (USE_BOUNDS=NO): bands [6324, 19386, 45258]
        # (libjpeg-6b decode; jpeg8/9b builds publish alternate sets)
        rgba, gt = read_mbtiles_raster(MBT + "world_l1.mbtiles",
                                       use_bounds=False)
        assert rgba.shape == (512, 512, 4)
        assert [checksum(rgba[:, :, b]) for b in range(3)] == \
            [6324, 19386, 45258]

    def test_world_l1_overview(self):
        # test_mbtiles_2 overview (z=0): [16642, 15772, 10029]
        rgba, gt = read_mbtiles_raster(MBT + "world_l1.mbtiles",
                                       zoom_level=0, use_bounds=False)
        assert rgba.shape == (256, 256, 4)
        assert [checksum(rgba[:, :, b]) for b in range(3)] == \
            [16642, 15772, 10029]

    def test_world_l1_bounds_geotransform(self):
        # test_mbtiles_4: 512x510, exact published geotransform
        rgba, gt = read_mbtiles_raster(MBT + "world_l1.mbtiles")
        assert rgba.shape[:2] == (510, 512)
        expected = (-20037508.342789244, 78271.516964020484, 0.0,
                    19971868.880408563, 0.0, -78271.516964020484)
        assert gt == pytest.approx(expected, rel=1e-15)


class TestRoundTrip:
    def _tiles(self, z=2):
        rng = np.random.default_rng(7)
        rows = []
        for (x, y) in [(0, 0), (1, 2), (3, 3)]:
            px = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
            rows.append((z, x, y, encode_png(px)))
        return rows

    def test_write_read_tiles(self, tmp_path):
        path = str(tmp_path / "t.mbtiles")
        rows = self._tiles()
        write_mbtiles(path, rows, metadata={"format": "png"})
        md = read_mbtiles_metadata(path)
        assert md["format"] == "png"
        t = read_mbtiles_tiles(path)
        assert t.num_rows == 3
        # XYZ y=0 at z=2 → TMS row 3
        got = dict(zip(t["tile_column"].to_pylist(),
                       t["tile_row"].to_pylist()))
        assert got[0] == 3 and got[1] == 1 and got[3] == 0

    def test_raster_round_trip(self, tmp_path):
        path = str(tmp_path / "rt.mbtiles")
        z = 1
        px = np.arange(256 * 256, dtype=np.uint32).reshape(256, 256)
        px = (px % 251).astype(np.uint8)
        rgb = np.stack([px, px[::-1], px.T], axis=2)
        write_mbtiles(path, [(z, 0, 0, encode_png(rgb))])
        rgba, gt = read_mbtiles_raster(path)       # tile-extent bounds
        assert rgba.shape == (256, 256, 4)
        np.testing.assert_array_equal(rgba[:, :, :3], rgb)
        assert rgba[:, :, 3].min() == 255
        # tile (0, 0) at z=1 is the north-west quadrant
        assert gt[0] == pytest.approx(-MAX_GM)
        assert gt[3] == pytest.approx(MAX_GM)

    def test_sink_and_source_registry(self, ray_session, tmp_path):
        import ray.data

        from raydal.pipeline import open_source, write_sink

        path = str(tmp_path / "sink.mbtiles")
        rows = self._tiles()
        ds = ray.data.from_items(
            [{"z": z, "x": x, "y": y, "tile": data}
             for (z, x, y, data) in rows])
        write_sink("mbtiles", ds, path)
        back = open_source("mbtiles", path)
        assert back.count() == 3
