"""VDV-452/IDF, GTFS, and MapML drivers vs the reference's published
expectations (autotest/ogr/ogr_vdv.py, ogr_gtfs.py, ogr_mapml.py)."""

import os
import struct

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raydal.io.gtfs import read_gtfs
from raydal.io.mapml import read_mapml, write_mapml
from raydal.io.vdv import read_idf, read_vdv, write_vdv
from raydal.io.wkt import wkb_to_wkt, wkt_to_wkb

VDV = "/root/reference/autotest/ogr/data/vdv"
GTFS = "/root/reference/autotest/ogr/data/gtfs"
MAPML = "/root/reference/autotest/ogr/data/mapml"

need_ref = pytest.mark.skipif(not os.path.isdir(VDV),
                              reason="reference fixtures not available")


@need_ref
class TestIDF:
    def test_idf_layers_and_geometry(self):
        ls = read_idf(os.path.join(VDV, "test.idf"))
        assert list(ls) == ["Node", "Link", "LinkCoordinate", "Other"]
        f = ls["Node"].to_pylist()[0]
        assert f["NODE_ID"] == 1 and f["foo"] == "U"
        assert wkb_to_wkt(f["wkb"]) == "POINT (2 49)"
        links = ls["Link"].to_pylist()
        assert wkb_to_wkt(links[0]["wkb"]) == \
            "LINESTRING (2 49,2.5 49.5,2.7 49.7,3 50)"
        # links referencing missing nodes carry no geometry
        assert links[1]["wkb"] is None and links[2]["wkb"] is None
        assert wkb_to_wkt(links[3]["wkb"]) == "LINESTRING (2 49,3 50)"
        lc = ls["LinkCoordinate"].to_pylist()[0]
        assert wkb_to_wkt(lc["wkb"]) == "POINT (2.5 49.5)"
        assert ls["Other"].to_pylist()[0]["FOO"] == 1

    def test_idf_3d_keeps_z_as_attributes(self):
        ls = read_idf(os.path.join(VDV, "test_3d.idf"))
        f = ls["Node"].to_pylist()[0]
        assert wkb_to_wkt(f["wkb"]) == "POINT (2 49)"   # 2-D engine
        assert f["Z"] == 10
        assert wkb_to_wkt(ls["Link"].to_pylist()[0]["wkb"]) == \
            "LINESTRING (2 49,2.5 49.5,2.7 49.7,3 50)"


@need_ref
class TestVDVWriter:
    def test_byte_exact_vs_reference(self, tmp_path):
        # mirrors autotest test_ogr_vdv_2's expected file byte-for-byte
        another = pa.table(
            {"str_field": pa.array([str(i) for i in range(5)])})
        lyr1 = pa.table({
            "str_field": pa.array(['a"b', None]),
            "int_field": pa.array([12, None], type=pa.int32()),
            "int64_field": pa.array([None, None], type=pa.int64()),
            "bool_field": pa.array([True, None], type=pa.bool_()),
            "str2_field": pa.array([None, None], type=pa.string()),
            "int2_field": pa.array([None, None], type=pa.int32()),
        })
        empty = pa.table({})
        p = str(tmp_path / "out.x10")
        write_vdv({"another_layer": another, "lyr_1": lyr1,
                   "empty": empty, "empty2": empty}, p,
                  headers={"foo": "bar"},
                  widths={"str2_field": 2, "int2_field": 2},
                  src_date="01.01.1970", src_time="00.00.00")
        got = open(p, encoding="latin1").read()
        expected = (
            "mod; DD.MM.YYYY; HH:MM:SS; free\n"
            'src; "UNKNOWN"; "01.01.1970"; "00.00.00"\n'
            'chs; "ISO8859-1"\n'
            'ver; "1.4"\nifv; "1.4"\ndve; "1.4"\nfft; ""\n'
            'foo; "bar"\n'
            "tbl; another_layer\natr; str_field\nfrm; char[80]\n"
            'rec; "0"\nrec; "1"\nrec; "2"\nrec; "3"\nrec; "4"\n'
            "end; 5\n"
            "tbl; lyr_1\n"
            "atr; str_field; int_field; int64_field; bool_field; "
            "str2_field; int2_field\n"
            "frm; char[80]; num[10.0]; num[19.0]; boolean; char[2]; "
            "num[1.0]\n"
            'rec; "a""b"; 12; NULL; 1; NULL; NULL\n'
            "rec; NULL; NULL; NULL; NULL; NULL; NULL\n"
            "end; 2\n"
            "tbl; empty\natr;\nfrm;\nend; 0\n"
            "tbl; empty2\natr;\nfrm;\nend; 0\n"
            "eof; 4\n")
        assert got == expected

    def test_roundtrip(self, tmp_path):
        t = pa.table({"a": pa.array(["x;y", 'q"z', None]),
                      "b": pa.array([1, None, 3], type=pa.int64()),
                      "c": pa.array([1.5, None, -2.25])})
        p = str(tmp_path / "rt.x10")
        write_vdv({"lyr": t}, p)
        back = read_vdv(p)["lyr"]
        assert back["a"].to_pylist() == ["x;y", 'q"z', None]
        assert back["b"].to_pylist() == [1, None, 3]
        assert back["c"].to_pylist() == [1.5, None, -2.25]


@need_ref
class TestGTFS:
    @pytest.fixture(scope="class")
    def feed(self):
        return read_gtfs(os.path.join(GTFS, "gtfs_extract.zip"))

    def test_nine_layers(self, feed):
        # 8 well-formed .txt + shapes_geom; error_warning.txt skipped
        assert len(feed) == 9
        assert "error_warning" not in feed
        assert "shapes_geom" in feed

    def test_agency_calendar(self, feed):
        assert feed["agency"].num_rows == 1
        assert feed["agency"]["agency_name"][0].as_py() == "SOLEA"
        assert feed["calendar"]["start_date"][0].as_py() == "2023/01/02"
        assert feed["calendar"]["monday"][0].as_py() is True

    def test_routes_type_filter(self, feed):
        r = feed["routes"]
        assert pc.sum(pc.equal(r["route_type"], 3)).as_py() == 30

    def test_stops_geometry(self, feed):
        f = feed["stops"].to_pylist()[0]
        assert f["arrival_time"] == "05:37:00"
        x, y = struct.unpack("<2d", f["wkb"][5:21])
        assert (x, y) == (7.280823, 47.763704)

    def test_trips_linestring(self, feed):
        w = wkb_to_wkt(feed["trips"].to_pylist()[0]["wkb"])
        assert w.startswith(
            "LINESTRING (7.280823 47.763704,7.278051 47.762217,"
            "7.278683 47.760148,7.284615 47.761364")
        assert w.endswith("7.331684 47.809187,7.336407 47.809084)")

    def test_shapes_geom(self, feed):
        g = feed["shapes_geom"]
        assert g.num_rows == 1
        f = g.to_pylist()[0]
        assert f["shape_id"] == "80013"
        w = wkb_to_wkt(f["wkb"])
        assert w.startswith("LINESTRING (7.28084 47.763684,7.28073")
        assert w.endswith("7.33591 47.80898,7.336401 47.809094)")

    def test_missing_required_raises(self, tmp_path):
        d = tmp_path / "feed"
        d.mkdir()
        (d / "agency.txt").write_text("agency_name\nX\n")
        with pytest.raises(ValueError, match="required"):
            read_gtfs(str(d))


@need_ref
class TestMapML:
    def test_read_poly(self):
        ls = read_mapml(os.path.join(MAPML, "poly.mapml"))
        t = ls["poly"]
        assert t.num_rows == 10
        r = t.to_pylist()[0]
        assert r["AREA"] == 215229.266
        assert r["EAS_ID"] == 168
        assert r["fid"] == 1
        assert wkb_to_wkt(r["wkb"]).startswith(
            "POLYGON ((2.75225922 43.03904529")

    def test_basic_roundtrip(self, tmp_path):
        # mirrors test_ogr_mapml_basic's write-then-read sequence
        geoms = [
            None, "POINT (1 2)", "LINESTRING (1 2,3 4)",
            "POLYGON ((0 0,0 1,1 0,0 0),"
            "(0.1 0.1,0.1 0.7,0.7 0.1,0.1 0.1))",
            "MULTIPOINT (0 1,2 3)",
            "MULTILINESTRING ((1 2,3 4),(5 6,7 8))",
            "MULTIPOLYGON (((0 0,0 1,1 0,0 0)),"
            "((10 0,10 1,11 0,10 0)))",
        ]
        t = pa.table({
            "fid": pa.array([1, 10, 11, 12, 13, 14, 15],
                            type=pa.int64()),
            "intfield": pa.array([None, 1] + [None] * 5,
                                 type=pa.int64()),
            "int64field": pa.array(
                [None, 1, 1234567890123, 1, None, None, None],
                type=pa.int64()),
            "realfield": pa.array([None, 1.0, 1.25, 1.0,
                                   None, None, None]),
            "stringfield": pa.array([None, "1", "x", "1",
                                     None, None, None]),
            "datetimefield": pa.array(
                [None, "2020/03/31 12:34:56"] + [None] * 5),
            "wkb": pa.array([wkt_to_wkb(g) if g else None
                             for g in geoms], type=pa.binary()),
        })
        p = str(tmp_path / "out.mapml")
        write_mapml({"test": t}, p)
        back = read_mapml(p)["test"].to_pylist()
        assert back[0]["fid"] == 1
        assert back[1]["fid"] == 10
        assert back[1]["datetimefield"] == "2020/03/31 12:34:56"
        assert wkb_to_wkt(back[1]["wkb"]) == "POINT (1 2)"
        assert back[2]["int64field"] == 1234567890123
        assert back[2]["realfield"] == 1.25
        assert back[2]["stringfield"] == "x"
        assert wkb_to_wkt(back[2]["wkb"]) == "LINESTRING (1 2,3 4)"
        # writer normalizes winding: exterior CCW, holes CW
        assert wkb_to_wkt(back[3]["wkb"]) == (
            "POLYGON ((0 0,1 0,0 1,0 0),"
            "(0.1 0.1,0.1 0.7,0.7 0.1,0.1 0.1))")
        assert wkb_to_wkt(back[4]["wkb"]) == "MULTIPOINT (0 1,2 3)"
        assert wkb_to_wkt(back[5]["wkb"]) == \
            "MULTILINESTRING ((1 2,3 4),(5 6,7 8))"
        assert wkb_to_wkt(back[6]["wkb"]) == (
            "MULTIPOLYGON (((0 0,1 0,0 1,0 0)),"
            "((10 0,11 0,10 1,10 0)))")

    def test_no_class_layer_name(self, tmp_path):
        doc = ("<mapml><body><feature><geometry><point>"
               "<coordinates>5 6</coordinates></point></geometry>"
               "</feature></body></mapml>")
        ls = read_mapml(doc)
        assert list(ls) == ["mapml"]
        assert wkb_to_wkt(ls["mapml"]["wkb"][0].as_py()) == "POINT (5 6)"
