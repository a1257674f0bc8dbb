"""GeoPackage reader vs the reference's own fixtures.

poly_golden.gpkg is the reference's ogr2ogr conversion of poly.shp
(autotest/ogr/ogr_gpkg.py:10894) — cross-format differential against
our own shapefile reader.  byte.gpkg carries the published band
checksum 4672 (autotest/gdrivers/gpkg.py:3567).
"""

import numpy as np
import pytest

from raydal.io.gpkg import (gpkg_layers, parse_gpb, read_gpkg_features,
                            read_gpkg_raster, read_gpkg_tiles)

GPKG = "/root/reference/autotest/ogr/data/gpkg/"
GDRV = "/root/reference/autotest/gdrivers/data/gpkg/"


class TestFeatures:
    def test_poly_golden_matches_shapefile(self):
        from raydal.geo.wkb import polygons_from_wkb
        from raydal.io.shapefile import read_shapefile

        g = read_gpkg_features(GPKG + "poly_golden.gpkg")
        s = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        assert g.num_rows == s.num_rows == 10
        assert g["EAS_ID"].to_pylist() == s["EAS_ID"].to_pylist()
        assert g["AREA"].to_pylist() == pytest.approx(
            s["AREA"].to_pylist())
        # geometry coordinates identical ring-for-ring
        for i in range(10):
            pg = polygons_from_wkb(g["wkb"][i].as_py())
            ps = polygons_from_wkb(s["wkb"][i].as_py())
            assert len(pg) == len(ps)
            for rg, rs in zip(pg[0], ps[0]):
                assert np.allclose(rg, rs)

    def test_layer_listing(self):
        assert gpkg_layers(GPKG + "poly_golden.gpkg") == \
            [("poly", "features")]

    @pytest.mark.parametrize("name", ["2d_envelope", "3d_envelope",
                                      "no_envelope"])
    def test_envelope_variants(self, name):
        t = read_gpkg_features(GPKG + name + ".gpkg")
        assert t.num_rows == 2
        assert all(t["wkb"][i].as_py() is not None for i in range(2))

    def test_null_geometry(self):
        t = read_gpkg_features(GPKG + "first_geometry_null.gpkg")
        assert t.num_rows == 2
        assert t["wkb"][0].as_py() is None
        assert t["wkb"][1].as_py() is not None


class TestGpb:
    def test_parse_roundtrip_fields(self):
        blob = open(GPKG + "poly_golden.gpkg", "rb")  # not a GPB
        blob.close()
        import sqlite3
        con = sqlite3.connect(
            f"file:{GPKG}poly_golden.gpkg?mode=ro", uri=True)
        raw = con.execute("SELECT geom FROM poly").fetchone()[0]
        con.close()
        srs, env, wkb = parse_gpb(raw)
        assert srs == 27700
        assert len(env) == 4
        assert wkb[:1] in (b"\x00", b"\x01")

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            parse_gpb(b"XX\x00\x00\x00\x00\x00\x00")


class TestRaster:
    def test_byte_gpkg_published_checksum(self):
        from raydal.kernels.checksum import checksum

        arr, gt = read_gpkg_raster(GDRV + "byte.gpkg")
        band = arr[:, :, 0] if arr.ndim == 3 else arr
        assert band.shape == (20, 20)
        assert checksum(band) == 4672     # autotest/gdrivers/gpkg.py:3567
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

    def test_tile_table(self):
        t = read_gpkg_tiles(GDRV + "byte.gpkg")
        assert t.num_rows == 1
        assert t["zoom_level"][0].as_py() == 0

    def test_registered_sources(self, ray_session):
        from raydal.pipeline import open_source

        ds = open_source("gpkg", GPKG + "poly_golden.gpkg")
        assert ds.count() == 10
        ds2 = open_source("gpkg-tiles", GDRV + "byte.gpkg")
        assert ds2.count() == 1


class TestReviewRegressions:
    def test_truncated_gpb_raises_valueerror(self):
        # envelope indicator 3 declares 48 envelope bytes; blob is short
        blob = b"GP\x00\x07" + b"\x00\x00\x00\x00" + b"\x00" * 8
        with pytest.raises(ValueError):
            parse_gpb(blob)
