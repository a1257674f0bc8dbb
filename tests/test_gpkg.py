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


class TestWriter:
    """write_gpkg_features → re-read parity + spec conformance
    (reference write path: ogrgeopackagetablelayer.cpp:2698 R-tree
    bulk load)."""

    def _write(self, table, **kw):
        import os
        import tempfile

        from raydal.io.gpkg import write_gpkg_features

        p = os.path.join(tempfile.mkdtemp(), "out.gpkg")
        write_gpkg_features(table, p, layer="poly", srs_id=4326, **kw)
        return p

    def test_round_trip_matches_reference_golden(self):
        """Our write of poly.shp re-reads byte-identical WKB and
        matches the reference's own ogr2ogr conversion
        (poly_golden.gpkg) geometry-for-geometry."""
        from raydal.geo.wkb import polygons_from_wkb
        from raydal.io.shapefile import read_shapefile

        s = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        p = self._write(s)
        t = read_gpkg_features(p, layer="poly")
        assert t.num_rows == 10
        assert t["wkb"].to_pylist() == s["wkb"].to_pylist()
        for c in ("AREA", "EAS_ID", "PRFEDEA"):
            assert t[c].to_pylist() == s[c].to_pylist()
        g = read_gpkg_features(GPKG + "poly_golden.gpkg")
        for i in range(10):
            pg = polygons_from_wkb(g["wkb"][i].as_py())
            pt = polygons_from_wkb(t["wkb"][i].as_py())
            for rg, rt in zip(pg[0], pt[0]):
                assert np.allclose(rg, rt)

    def test_qgis_compatible_pragmas_and_srs(self):
        import sqlite3

        from raydal.io.shapefile import read_shapefile

        p = self._write(read_shapefile(
            "/root/reference/autotest/ogr/data/poly.shp"))
        con = sqlite3.connect(p)
        assert con.execute("PRAGMA application_id").fetchone()[0] \
            == 0x47504B47
        assert con.execute("PRAGMA user_version").fetchone()[0] \
            == 10300
        srs = dict(con.execute(
            "SELECT srs_id, organization FROM gpkg_spatial_ref_sys"))
        assert {-1, 0, 4326} <= set(srs)
        gc = con.execute("SELECT table_name, column_name, "
                         "geometry_type_name, srs_id FROM "
                         "gpkg_geometry_columns").fetchone()
        assert gc == ("poly", "geom", "POLYGON", 4326)
        # contents extent = published poly.shp extent
        ext = con.execute("SELECT min_x, min_y, max_x, max_y FROM "
                          "gpkg_contents").fetchone()
        assert ext == (478315.53125, 4762880.5,
                       481645.3125, 4765610.5)
        con.close()

    def test_rtree_bulk_load_and_window_query(self):
        import sqlite3

        from raydal.io.shapefile import read_shapefile

        p = self._write(read_shapefile(
            "/root/reference/autotest/ogr/data/poly.shp"))
        con = sqlite3.connect(p)
        assert con.execute(
            "SELECT count(*) FROM rtree_poly_geom").fetchone()[0] == 10
        # same published window as the fgb/ogr tests: 5 bbox hits
        hits = con.execute(
            "SELECT id FROM rtree_poly_geom WHERE maxx >= 479586.0 "
            "AND minx <= 479808.2 AND maxy >= 4764618.6 "
            "AND miny <= 4764797.8").fetchall()
        assert len(hits) == 5
        assert ("gpkg_rtree_index",) in con.execute(
            "SELECT extension_name FROM gpkg_extensions").fetchall()
        con.close()

    def test_null_geometry_and_fresh_fids(self):
        import pyarrow as pa

        # two null geometries — writer must not crash, reader returns
        # null geometry rows with synthesized fids
        t = pa.table({
            "wkb": pa.array([None, None], pa.binary()),
            "name": pa.array(["a", "b"])})
        p = self._write(t)
        back = read_gpkg_features(p, layer="poly")
        assert back.num_rows == 2
        assert back["wkb"].to_pylist() == [None, None]
        assert back["fid"].to_pylist() == [1, 2]
        assert back["name"].to_pylist() == ["a", "b"]

    def test_sink_registered(self, ray_session):
        import os
        import tempfile

        from raydal.pipeline import open_source, write_sink

        ds = open_source(
            "shapefile", "/root/reference/autotest/ogr/data/poly.shp")
        p = os.path.join(tempfile.mkdtemp(), "sink.gpkg")
        write_sink("gpkg", ds, p, layer="poly")
        assert open_source("gpkg", p, layer="poly").count() == 10


class TestNullGeometryGPB:
    def test_null_geometry_blob_has_wellformed_empty_wkb_body(self):
        """A null geometry's GPB must carry a well-formed (empty) WKB
        body after the header — POINT EMPTY as NaN coords — so strict
        external readers don't reject the blob."""
        import struct

        from raydal.io.gpkg import _encode_gpb, parse_gpb

        blob = _encode_gpb(None, 4326)
        # header: GP, version, flags (LE | empty), srs_id
        magic, ver, flags, srs = struct.unpack_from("<2sBBi", blob, 0)
        assert magic == b"GP" and flags & 0x10 and srs == 4326
        body = blob[8:]
        assert body[:5] == b"\x01\x01\x00\x00\x00"   # LE point
        x, y = struct.unpack("<2d", body[5:])
        assert np.isnan(x) and np.isnan(y)
        srs2, env, wkb = parse_gpb(blob)
        assert srs2 == 4326 and wkb is None   # our reader: empty → None
