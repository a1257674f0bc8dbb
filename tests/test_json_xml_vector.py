"""EsriJSON / JSON-FG / GeoRSS / JML readers vs the reference's
published expectations (autotest/ogr/ogr_esrijson.py, ogr_jsonfg.py,
ogr_georss.py, ogr_jml.py)."""

import glob
import os
import struct

import pytest

from raydal.io.esrijson import read_esrijson
from raydal.io.georss import read_georss, write_georss
from raydal.io.jml import read_jml, write_jml
from raydal.io.jsonfg import parse_coordrefsys, read_jsonfg
from raydal.io.wkt import wkb_to_wkt

ESRI = "/root/reference/autotest/ogr/data/esrijson"
FG = "/root/reference/autotest/ogr/data/jsonfg"
RSS = "/root/reference/autotest/ogr/data/georss"
JML = "/root/reference/autotest/ogr/data/jml"

need_ref = pytest.mark.skipif(not os.path.isdir(ESRI),
                              reason="reference fixtures not available")


def _pt(wkb):
    return struct.unpack("<2d", wkb[5:21])


@need_ref
class TestEsriJSON:
    def test_point_fields_and_crs(self):
        t = read_esrijson(os.path.join(ESRI, "esripoint.json"))
        assert t.schema.metadata[b"crs"] == b"EPSG:4326"
        r = t.to_pylist()[0]
        assert wkb_to_wkt(r["wkb"]) == "POINT (2 49)"
        assert r["fid"] == 1
        assert r["fooSmallInt"] == 2
        assert r["fooInt"] == 1234567890
        assert r["fooSingle"] == 1.5
        assert r["fooDouble"] == 3.4
        assert r["fooString"] == "56"
        # test_ogr_esrijson_read_point: epoch-ms 1640908800000
        assert r["fooDate"] == "2021/12/31 00:00:00+00"

    def test_linestring(self):
        t = read_esrijson(os.path.join(ESRI, "esrilinestring.json"))
        assert wkb_to_wkt(t["wkb"][0].as_py()) == "LINESTRING (2 49,3 50)"

    def test_multipath_polyline(self):
        doc = {"geometryType": "esriGeometryPolyline", "fields": [],
               "features": [{"geometry": {"paths": [
                   [[2, 49], [2.1, 49.1]], [[3, 50], [3.1, 50.1]]]}}]}
        t = read_esrijson(doc)
        assert wkb_to_wkt(t["wkb"][0].as_py()) == \
            "MULTILINESTRING ((2 49,2.1 49.1),(3 50,3.1 50.1))"

    def test_polygon_hole_assignment(self):
        t = read_esrijson(os.path.join(ESRI, "esripolygon.json"))
        assert wkb_to_wkt(t["wkb"][0].as_py()) == (
            "MULTIPOLYGON (((2 49,2 50,3 50,3 49,2 49),"
            "(2.1 49.1,2.1 49.9,2.9 49.9,2.9 49.1,2.1 49.1)),"
            "((-2 49,-2 50,-3 50,-3 49,-2 49)))")

    def test_polygon_empty(self):
        t = read_esrijson(os.path.join(ESRI, "esripolygonempty.json"))
        assert wkb_to_wkt(t["wkb"][0].as_py()) == "POLYGON EMPTY"

    def test_multipoint(self):
        t = read_esrijson(os.path.join(ESRI, "esrimultipoint.json"))
        assert wkb_to_wkt(t["wkb"][0].as_py()) == "MULTIPOINT (2 49,3 50)"

    def test_starting_with_features(self):
        t = read_esrijson(os.path.join(
            ESRI, "esrijsonstartingwithfeaturesgeometry.json"))
        assert t.num_rows == 1
        assert wkb_to_wkt(t["wkb"][0].as_py()).startswith("MULTIPOLYGON")

    def test_z_fixtures_drop_z(self):
        for fn in ("esrizpoint.json", "esrizlinestring.json",
                   "esrizmultipoint.json", "esrizpolygon.json"):
            t = read_esrijson(os.path.join(ESRI, fn))
            assert t.num_rows >= 1
            assert t["wkb"][0].as_py() is not None


@need_ref
class TestJsonFG:
    # (filename, expected crs metadata, x, y) — the reference's
    # test_jsonfg_read_crs matrix (GetX/GetY on the first feature).
    MATRIX = [
        ("crs_32631_fc_only.json", "EPSG:32631", 500000, 4500000),
        ("crs_32631_feat.json", "EPSG:32631", 500000, 4500000),
        ("crs_32631_fc_and_feat.json", "EPSG:32631", 500000, 4500000),
        ("crs_32631_fc_place_null.json", "EPSG:32631", 500000, 0),
        ("crs_32631_fc_geometry_null.json", "EPSG:32631",
         500000, 4500000),
        ("crs_32631_fc_4326_feat.json", "EPSG:4326", 3, 0),
        ("crs_32631_feat_only.json", "EPSG:32631", 500000, 4500000),
        ("crs_32631_geom_only.json", "EPSG:32631", 500000, 4500000),
        ("crs_4326_fc_only.json", "EPSG:4326", 2, 49),
        ("crs_4326_fc_and_feat.json", "EPSG:4326", 2, 49),
        ("crs_4326_fc_place_null.json", "EPSG:4326", 2, 49),
        ("crs_4326_fc_32631_feat.json", "EPSG:32631", 500000, 0),
        ("crs_4326_feat_only.json", "EPSG:4326", 2, 49),
        ("crs_none.json", "EPSG:4326", 2, 49),
        ("crs_none_fc_mixed_feat_no_conformsTo.json", "EPSG:4326",
         2, 49),
    ]

    @pytest.mark.parametrize("fn,crs,x,y", MATRIX)
    def test_crs_matrix(self, fn, crs, x, y):
        t = list(read_jsonfg(os.path.join(FG, fn)).values())[0]
        assert (t.schema.metadata or {}).get(b"crs", b"").decode() == crs
        gx, gy = _pt(t["wkb"][0].as_py())
        assert gx == pytest.approx(x, abs=1e-6)
        assert gy == pytest.approx(y, abs=1e-6)

    def test_mixed_feat_reprojects_into_fc_crs(self):
        t = list(read_jsonfg(
            os.path.join(FG, "crs_32631_fc_mixed_feat.json")).values())[0]
        assert t.schema.metadata[b"crs"] == b"EPSG:32631"
        for i, (ex, ey) in enumerate([(500000, 0), (0, 0)]):
            gx, gy = _pt(t["wkb"][i].as_py())
            assert gx == pytest.approx(ex, abs=1e-4)
            assert gy == pytest.approx(ey, abs=1e-4)

    def test_mixed_feat_no_fc_crs_keeps_native(self):
        t = list(read_jsonfg(
            os.path.join(FG, "crs_none_fc_mixed_feat.json")).values())[0]
        assert b"crs" not in (t.schema.metadata or {})
        assert _pt(t["wkb"][0].as_py()) == pytest.approx((3, 0))
        assert _pt(t["wkb"][1].as_py()) == pytest.approx((0, 10000000))

    def test_two_feature_types(self):
        layers = read_jsonfg(os.path.join(FG, "two_feature_types.json"))
        assert set(layers) == {"type1", "type2"}
        t1 = layers["type1"]
        assert t1.num_rows == 2
        assert t1["foo"].to_pylist() == ["1", "bar"]  # int+str promote
        assert t1["fid"].to_pylist() == [1, 2]
        t2 = layers["type2"]
        assert t2["bar"].to_pylist() == ["baz"]
        assert wkb_to_wkt(t2["wkb"][0].as_py()) == \
            "LINESTRING (2 49,3 50)"                  # Z dropped

    def test_prism_point_base(self):
        t = list(read_jsonfg(os.path.join(FG, "pylon.json")).values())[0]
        # reference: LINESTRING Z (81220.15 455113.71 2.02, ... 8.02);
        # 2-D engine keeps the footprint + the extrusion interval.
        assert wkb_to_wkt(t["wkb"][0].as_py()) == \
            "POINT (81220.15 455113.71)"
        assert t["prism_lower"][0].as_py() == 2.02
        assert t["prism_upper"][0].as_py() == 8.02

    def test_prism_polygon_base_swaps_4979(self):
        t = list(read_jsonfg(os.path.join(
            FG, "prism_with_polygon_base.json")).values())[0]
        # reference POLYHEDRALSURFACE ring (0 0 10,1 0 10,0 2 10,...)
        assert wkb_to_wkt(t["wkb"][0].as_py()) == \
            "POLYGON ((0 0,1 0,0 2,0 0))"
        assert t["prism_lower"][0].as_py() == 10.0
        assert t["prism_upper"][0].as_py() == 20.0

    def test_all_fixtures_parse(self):
        for p in sorted(glob.glob(os.path.join(FG, "*.json"))):
            layers = read_jsonfg(p)
            assert isinstance(layers, dict) and layers

    def test_parse_coordrefsys(self):
        assert parse_coordrefsys("[EPSG:32631]") == 32631
        assert parse_coordrefsys(
            "http://www.opengis.net/def/crs/EPSG/0/4979") == 4979
        assert parse_coordrefsys("[OGC:CRS84]") == 4326
        assert parse_coordrefsys("EPSG:4258") == 4258
        assert parse_coordrefsys("garbage") is None


@need_ref
class TestGeoRSS:
    def test_rss_simple(self):
        t = read_georss(os.path.join(RSS, "test_georss_simple.xml"))
        r = t.to_pylist()
        assert wkb_to_wkt(r[0]["wkb"]) == "POINT (2 49)"
        assert r[0]["title"] == "A point"
        assert r[0]["author"] == "Author"
        assert r[0]["pubDate"] == "2008/12/07 20:13:00+02"
        assert r[0]["category"] == "First category"
        assert r[0]["category_domain"] == "first_domain"
        assert r[0]["category2"] == "Second category"
        assert r[0]["category2_domain"] == "second_domain"
        assert wkb_to_wkt(r[1]["wkb"]) == \
            "LINESTRING (2 48,2.1 48.1,2.2 48)"
        assert wkb_to_wkt(r[2]["wkb"]) == \
            "POLYGON ((2 50,2.1 50.1,2.2 48.1,2.1 46.1,2 50))"
        assert wkb_to_wkt(r[3]["wkb"]) == \
            "POLYGON ((2 49,2 49.5,2.2 49.5,2.2 49,2 49))"

    def test_rss_gml_geometries(self):
        t = read_georss(os.path.join(RSS, "test_georss_gml.xml"))
        wkts = [wkb_to_wkt(x) for x in t["wkb"].to_pylist()]
        assert wkts[0] == "POINT (2 49)"
        assert wkts[1] == "LINESTRING (2 48,2.1 48.1,2.2 48)"
        assert wkts[2].startswith("POLYGON ((2 50")
        assert wkts[3] == "POLYGON ((2 49,2 49.5,2.2 49.5,2.2 49,2 49))"

    ATOM_FIELDS = [
        ("title", "Atom draft-07 snapshot"),
        ("link_rel", "alternate"), ("link_type", "text/html"),
        ("link_href", "http://example.org/2005/04/02/atom"),
        ("link2_rel", "enclosure"), ("link2_type", "audio/mpeg"),
        ("link2_length", 1337),
        ("link2_href", "http://example.org/audio/ph34r_my_podcast.mp3"),
        ("id", "tag:example.org,2003:3.2397"),
        ("updated", "2005/07/31 12:29:29+00"),
        ("published", "2003/12/13 08:29:29-04"),
        ("author_name", "Mark Pilgrim"),
        ("author_uri", "http://example.org/"),
        ("author_email", "f8dy@example.com"),
        ("contributor_name", "Sam Ruby"),
        ("contributor2_name", "Joe Gregorio"),
        ("content_type", "xhtml"), ("content_xml_lang", "en"),
        ("content_xml_base", "http://diveintomark.org/"),
    ]

    def test_atom_fields(self):
        t = read_georss(os.path.join(RSS, "atom_rfc_sample.xml"))
        r = t.to_pylist()[0]
        for k, e in self.ATOM_FIELDS:
            assert r.get(k) == e, k
        assert '<div xmlns="http://www.w3.org/1999/xhtml">' in r["content"]

    def test_atom_roundtrip(self, tmp_path):
        t = read_georss(os.path.join(RSS, "atom_rfc_sample.xml"))
        p = str(tmp_path / "atom.xml")
        write_georss(t, p, fmt="atom")
        r = read_georss(p).to_pylist()[0]
        for k, e in self.ATOM_FIELDS:
            assert r.get(k) == e, k

    def test_rss_roundtrip(self, tmp_path):
        t = read_georss(os.path.join(RSS, "test_georss_simple.xml"))
        p = str(tmp_path / "rss.xml")
        write_georss(t, p, fmt="rss")
        t2 = read_georss(p)
        assert t2["title"].to_pylist() == t["title"].to_pylist()
        assert t2["pubDate"].to_pylist() == t["pubDate"].to_pylist()
        assert t2["category2_domain"].to_pylist() == \
            t["category2_domain"].to_pylist()
        assert [wkb_to_wkt(x) for x in t2["wkb"].to_pylist()] == \
            [wkb_to_wkt(x) for x in t["wkb"].to_pylist()]


@need_ref
class TestJML:
    def test_read_reference_matrix(self):
        t = read_jml(os.path.join(JML, "test.jml"))
        assert [n for n in t.column_names
                if n not in ("fid", "ogr_style", "wkb")] == [
            "first_property", "another_property", "objectAttr", "attr2",
            "attr3", "int", "double", "date", "datetime", "R_G_B",
            "not_ignored"]
        r = t.to_pylist()
        assert len(r) == 3
        f = r[0]
        assert f["first_property"] == "even"
        assert f["another_property"] == "rouault"
        assert f["objectAttr"] == "foo"
        assert f["attr2"] == "bar"
        assert f["attr3"] == "baz"
        assert f["int"] == 123
        assert f["double"] == 1.23
        assert f["date"] == "2014/10/18 00:00:00"
        assert f["datetime"] == "2014/10/18 21:36:45"
        assert f["R_G_B"] == "0000FF"
        assert f["not_ignored"] is None
        assert f["ogr_style"] == "BRUSH(fc:#0000FF)"
        assert wkb_to_wkt(f["wkb"]) == \
            "POLYGON ((0 0,0 10,10 10,10 0,0 0))"
        f = r[1]
        assert f["datetime"] == "2014/10/18 21:36:45+02"
        assert f["ogr_style"] == "PEN(c:#FF00FF)"
        assert wkb_to_wkt(f["wkb"]) == "POINT (-1 -1)"
        assert r[2]["wkb"] is None

    def test_roundtrip(self, tmp_path):
        t = read_jml(os.path.join(JML, "test.jml"))
        p = str(tmp_path / "rt.jml")
        write_jml(t, p)
        t2 = read_jml(p)
        assert t2["int"].to_pylist() == t["int"].to_pylist()
        assert t2["double"].to_pylist() == t["double"].to_pylist()
        assert t2["datetime"].to_pylist() == t["datetime"].to_pylist()
        got = [wkb_to_wkt(x) for x in t2["wkb"].to_pylist()[:2]]
        want = [wkb_to_wkt(x) for x in t["wkb"].to_pylist()[:2]]
        assert got == want

    def test_single_point(self):
        t = read_jml(os.path.join(JML, "one_point_srid_4326.jml"))
        assert t.num_rows == 1
        assert wkb_to_wkt(t["wkb"][0].as_py()).startswith("POINT")
