"""TopoJSON reader (raydal.io.topojson) against the published
autotest/ogr/ogr_topojson.py expected matrices."""
import os

import pytest

from raydal.io.topojson import read_topojson
from raydal.io.wkt import wkb_to_wkt

DATA = "/root/reference/autotest/ogr/data/topojson"
needs_ref = pytest.mark.skipif(not os.path.isdir(DATA),
                               reason="reference autotest data absent")


def _wkt(buf):
    return wkb_to_wkt(buf).replace(", ", ",")


# test_ogr_topojson_objects_is_array expected matrix, verbatim
EXPECTED_ARRAY = [
    ("foo", None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT (100 1010)"),
] + [(None, None, "LINESTRING EMPTY")] * 8 + [
    (None, "0", "LINESTRING EMPTY"),
    (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None,
     "POLYGON ((100 1000,110 1000,110 1100,100 1100,100 1000),"
     "(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None,
     "POLYGON ((110 1100,110 1000,100 1000,100 1100,110 1100),"
     "(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None,
     "MULTIPOLYGON (((110 1100,110 1000,100 1000,100 1100,110 1100)),"
     "((101 1010,109 1010,109 1090,101 1090,101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None,
     "MULTILINESTRING ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000))"),
    (None, None,
     "MULTILINESTRING ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))"),
]


@needs_ref
def test_objects_is_array():
    layers = read_topojson(os.path.join(DATA, "topojson1.topojson"))
    assert list(layers) == ["a_layer", "TopoJSON"]
    a = layers["a_layer"]
    assert a.num_rows == 1
    assert _wkt(a["wkb"][0].as_py()) == \
        "LINESTRING (100 1000,110 1000,110 1100)"

    t = layers["TopoJSON"]
    assert t.column_names == ["fid", "id", "name", "wkb"]
    assert t.num_rows == len(EXPECTED_ARRAY)
    ids = t["id"].to_pylist()
    names = t["name"].to_pylist()
    wkbs = t["wkb"].to_pylist()
    for i, (eid, ename, ewkt) in enumerate(EXPECTED_ARRAY):
        assert (ids[i], names[i], _wkt(wkbs[i])) == \
            (eid, ename, ewkt), f"feature {i}"


@needs_ref
def test_objects_is_dict():
    layers = read_topojson(os.path.join(DATA, "topojson2.topojson"))
    a = layers["a_layer"]
    assert a["id"][0].as_py() == "foo"
    assert a["name"][0].as_py() == "line"
    assert _wkt(a["wkb"][0].as_py()) == \
        "LINESTRING (100 1000,110 1000,110 1100)"
    t = layers["TopoJSON"]
    assert _wkt(t["wkb"][0].as_py()) == \
        "LINESTRING (100 1000,110 1000,110 1100)"


@needs_ref
def test_no_transform_absolute_arcs():
    layers = read_topojson(os.path.join(DATA, "topojson3.topojson"))
    for lyr in ("a_layer", "TopoJSON"):
        tbl = layers[lyr]
        assert _wkt(tbl["wkb"][0].as_py()) == \
            "LINESTRING (0 0,10 0,0 10,10 0,0 0)"
        assert not (tbl.schema.metadata or {})  # no CRS member


@needs_ref
def test_crs_detection():
    layers = read_topojson(
        os.path.join(DATA, "topojson_with_crs.topojson"))
    for tbl in layers.values():
        assert (tbl.schema.metadata or {}).get(b"crs") == b"EPSG:4326"


def test_inline_document_and_rejects():
    doc = {"type": "Topology",
           "arcs": [[[0, 0], [2, 3]]],
           "objects": {"only": {"type": "LineString", "arcs": [0],
                                "id": 7}}}
    layers = read_topojson(doc)
    t = layers["TopoJSON"]
    assert t["id"][0].as_py() == "7"
    assert _wkt(t["wkb"][0].as_py()) == "LINESTRING (0 0,2 3)"
    with pytest.raises(ValueError):
        read_topojson({"type": "FeatureCollection"})
