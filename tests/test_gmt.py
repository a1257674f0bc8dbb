"""GMT ASCII vector driver + GeoJSON Text Sequence vs the
reference's published expectations (``autotest/ogr/ogr_gmt.py``,
``autotest/ogr/ogr_geojson_seq.py`` fixtures)."""

import numpy as np
import pyarrow as pa
import pytest

from raydal.io.geojson import read_geojson_seq, write_geojson_seq
from raydal.io.gmt import read_gmt, write_gmt
from raydal.io.shapefile import read_shapefile
from raydal.io.wkt import wkb_to_wkt, wkt_to_wkb

OGR = "/root/reference/autotest/ogr/data/"


def test_multilinestring_published():
    # ogr_gmt.py test_ogr_gmt_4 (#3802): published WKTs + names
    t = read_gmt(OGR + "gmt/test_multi.gmt")
    assert t.num_rows == 2
    assert wkb_to_wkt(t["wkb"][0].as_py(), precision=12) == \
        "MULTILINESTRING ((175 -45,176 -45),(180 -45.3,179 -45.4))"
    assert wkb_to_wkt(t["wkb"][1].as_py(), precision=12) == \
        ("MULTILINESTRING ((175.1 -45,175.2 -45.1),"
         "(180.1 -45.3,180 -45.2))")
    assert t["name"].to_pylist() == ["feature 1", "feature 2"]
    assert t["id"].to_pylist() == [1, 2]


def test_poly_roundtrip_published(tmp_path):
    # ogr_gmt.py test_ogr_gmt_2: poly.shp → GMT → read back; filtered
    # eas_id list and per-feature geometry/attribute equality
    shp = read_shapefile(OGR + "poly.shp")
    p = str(tmp_path / "tpoly.gmt")
    write_gmt(shp, p)
    rt = read_gmt(p)
    assert rt.num_rows == shp.num_rows == 10
    eas = [v for v in rt["EAS_ID"].to_pylist() if v < 170]
    assert eas == [168, 169, 166, 158, 165]
    for i in range(10):
        assert wkb_to_wkt(shp["wkb"][i].as_py(), precision=9) == \
            wkb_to_wkt(rt["wkb"][i].as_py(), precision=9)
        assert shp["AREA"][i].as_py() == pytest.approx(
            rt["AREA"][i].as_py())
        assert shp["PRFEDEA"][i].as_py() == rt["PRFEDEA"][i].as_py()


def test_multipolygon_holes_roundtrip(tmp_path):
    # ogr_gmt.py test_ogr_gmt_5 shape: multipolygon incl. a hole
    wkt = ("MULTIPOLYGON (((0 0,10 0,10 10,0 10,0 0),"
           "(2 2,4 2,4 4,2 4,2 2)),((20 0,25 0,25 5,20 0)))")
    t = pa.table({"fid": pa.array([0], pa.int64()),
                  "wkb": pa.array([wkt_to_wkb(wkt)], pa.binary()),
                  "tag": pa.array(["a"], pa.string())})
    p = str(tmp_path / "mp.gmt")
    write_gmt(t, p)
    rt = read_gmt(p)
    assert wkb_to_wkt(rt["wkb"][0].as_py(), precision=12) == wkt
    assert rt["tag"][0].as_py() == "a"


def test_point_layer_roundtrip(tmp_path):
    wkts = ["POINT (1.5 2.5)", "POINT (-3 4)"]
    t = pa.table({"fid": pa.array([0, 1], pa.int64()),
                  "wkb": pa.array([wkt_to_wkb(w) for w in wkts],
                                  pa.binary()),
                  "v": pa.array([1.25, -2.5], pa.float64())})
    p = str(tmp_path / "pts.gmt")
    write_gmt(t, p)
    rt = read_gmt(p)
    assert [wkb_to_wkt(b.as_py()) for b in rt["wkb"]] == wkts
    assert rt["v"].to_pylist() == [1.25, -2.5]


@pytest.mark.parametrize("fname", ["geojsonseq/test.geojsonl",
                                   "geojsonseq/test.geojsons"])
def test_geojsonseq_published(fname):
    t = read_geojson_seq(OGR + fname)
    assert t.num_rows == 2
    assert t["foo"].to_pylist() == ["bar", "baz"]
    assert wkb_to_wkt(t["wkb"][0].as_py()) == "POINT (1 2)"
    assert wkb_to_wkt(t["wkb"][1].as_py()) == "POINT (3 4)"


@pytest.mark.parametrize("rs", [False, True])
def test_geojsonseq_roundtrip(tmp_path, rs):
    t = read_geojson_seq(OGR + "geojsonseq/test.geojsonl")
    p = str(tmp_path / ("rt.geojsons" if rs else "rt.geojsonl"))
    write_geojson_seq(t, p, rs=rs)
    rt = read_geojson_seq(p)
    assert rt["foo"].to_pylist() == ["bar", "baz"]
    raw = open(p, "rb").read()
    assert raw.startswith(b"\x1e") == rs


def test_ray_registry_roundtrip(ray_session, tmp_path):
    from raydal.pipeline import SINK_REGISTRY, SOURCE_REGISTRY

    ds = SOURCE_REGISTRY["gmt"](OGR + "gmt/test_multi.gmt")
    assert ds.count() == 2
    p = str(tmp_path / "rt.geojsonl")
    SINK_REGISTRY["geojsonseq"](ds.drop_columns(["timer"]), p)
    rt = read_geojson_seq(p)
    assert rt.num_rows == 2 and rt["name"].to_pylist() == \
        ["feature 1", "feature 2"]


def test_point_layer_without_attribute_lines():
    # a bare POINT layer emits one feature per coordinate line
    t = read_gmt(b"# @VGMT1.0 @GPOINT\n# FEATURE_DATA\n"
                 b"1 2\n3 4\n5 6\n")
    assert t.num_rows == 3
    assert [wkb_to_wkt(b.as_py()) for b in t["wkb"]] == \
        ["POINT (1 2)", "POINT (3 4)", "POINT (5 6)"]
