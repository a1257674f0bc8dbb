"""OpenFileGDB reader goldens vs the reference's published fixtures.

Parity targets from ``autotest/ogr/ogr_openfilegdb.py``: the
curves.gdb / curve_circle_by_center.gdb / polygonzm CSV comparisons
(test_ogr_openfilegdb_18/20 — arc, bezier, ellipse and full-circle
segments, Z/M), the testopenfilegdb.gdb layer/value matrix, and the
ArcGIS Pro 3.2 field types (int64 / date / time / offset)."""

import csv
import struct
import zipfile

import numpy as np
import pytest

from raydal.geo import curves as C
from raydal.io.filegdb import FileGDB, filegdb_layers, read_filegdb

D = "/root/reference/autotest/ogr/data/filegdb/"


@pytest.fixture(scope="module")
def big_gdb(tmp_path_factory):
    root = tmp_path_factory.mktemp("fgdb")
    with zipfile.ZipFile(D + "testopenfilegdb.gdb.zip") as z:
        z.extractall(root)
    return str(root / "testopenfilegdb.gdb")


def _unwrap(n):
    base, payload, dims = n
    if base in (C.MULTICURVE, C.MULTISURFACE, C.MULTILINESTRING,
                C.MULTIPOLYGON) and len(payload) == 1:
        return payload[0]
    return n


def _sig(n):
    base, payload, dims = n
    if base in (C.LINESTRING, C.CIRCULARSTRING, C.POINT):
        return (base, dims)
    if base in (C.POLYGON, C.TRIANGLE):
        return (base, dims, len(payload))
    return (base, dims, [_sig(q) for q in payload])


def _nums(n):
    base, payload, dims = n
    if base in (C.LINESTRING, C.CIRCULARSTRING):
        return [np.asarray(payload, float)]
    if base == C.POINT:
        return [np.atleast_2d(payload)]
    if base in (C.POLYGON, C.TRIANGLE):
        return [np.asarray(r, float) for r in payload]
    return [x for q in payload for x in _nums(q)]


@pytest.mark.parametrize("gdb,layer,csvf", [
    ("curves.gdb", "line", "curves_line.csv"),
    ("curves.gdb", "polygon", "curves_polygon.csv"),
    ("curve_circle_by_center.gdb", None, "curve_circle_by_center.csv"),
    ("filegdb_polygonzm_m_not_closing_with_curves.gdb", None,
     "filegdb_polygonzm_m_not_closing_with_curves.gdb.csv"),
    ("filegdb_polygonzm_nan_m_with_curves.gdb", None,
     "filegdb_polygonzm_nan_m_with_curves.gdb.csv"),
])
def test_curve_csv_parity(gdb, layer, csvf):
    # published WKT goldens, structural (modulo single-element MULTI
    # promotion, which GDAL applies at the layer level) and numeric
    g = FileGDB(D + gdb)
    layer = layer or g.layer_names()[0]
    t = g.layer_table(layer)
    with open(D + csvf) as f:
        exp = list(csv.DictReader(f))
    assert len(t) == len(exp)
    for i, row in enumerate(t.to_pylist()):
        got = _unwrap(C.parse_wkb_curve(row["wkb"]))
        want = _unwrap(C.parse_wkt_curve(exp[i]["WKT"]))
        assert _sig(got) == _sig(want), f"row {i} structure"
        for a, b in zip(_nums(got), _nums(want)):
            assert a.shape == b.shape, f"row {i} point counts"
            assert np.allclose(a, b, atol=2e-5, equal_nan=True), \
                f"row {i} coordinates"


def test_layer_catalog(big_gdb):
    names = filegdb_layers(big_gdb)
    assert len(names) == 37
    assert names[:4] == ["none", "point", "multipoint", "linestring"]
    assert "multipatch" in names and "polygonzm" in names


def test_point_attributes(big_gdb):
    # autotest ogr_openfilegdb value matrix, first feature of 'point'
    t = read_filegdb(big_gdb, "point")
    assert len(t) == 5
    r = t.to_pylist()[0]
    assert r["id"] == 1
    assert r["str"] == "foo_é"
    assert r["smallint"] == -13
    assert r["int"] == 123
    assert r["float"] == 1.5
    assert r["real"] == 4.56
    assert r["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
    assert r["xml"] == "<foo></foo>"
    assert r["binary"] == b"\x00\xff\x7f"
    assert r["nullint"] is None
    kind, coords, dims = C.parse_wkb_curve(r["wkb"])
    assert kind == C.POINT and dims == ""
    assert np.allclose(coords, [1, 2], atol=1e-10)


@pytest.mark.parametrize("layer,wkt_prefix", [
    ("point25D", "POINT Z (1"),
    ("pointm", "POINT M (1"),
    ("pointzm", "POINT ZM (1"),
    ("linestring25D", "LINESTRING Z (1"),
    ("linestringzm", "LINESTRING ZM (1"),
    ("polygon25D", "POLYGON Z ((0"),
    ("polygonzm", "POLYGON ZM ((0"),
])
def test_zm_geometries(big_gdb, layer, wkt_prefix):
    t = read_filegdb(big_gdb, layer)
    b = next(x for x in t["wkb"].to_pylist() if x)
    wkt = C.format_wkt_curve(C.parse_wkb_curve(b))
    assert wkt.startswith(wkt_prefix), wkt[:60]


def test_pointzm_values(big_gdb):
    t = read_filegdb(big_gdb, "pointzm")
    kind, coords, dims = C.parse_wkb_curve(t["wkb"].to_pylist()[0])
    assert dims == "ZM"
    assert np.allclose(coords, [1, 2, 3, 4], atol=1e-10)


def test_multipatch(big_gdb):
    t = read_filegdb(big_gdb, "multipatch")
    node = C.parse_wkb_curve(t["wkb"].to_pylist()[0])
    base, parts, dims = node
    assert dims == "Z"
    assert base in (7, C.TIN, C.MULTIPOLYGON)   # GC of TIN+rings


def test_every_layer_reads(big_gdb):
    g = FileGDB(big_gdb)
    for n in g.layer_names():
        t = g.layer_table(n)
        assert t.num_rows >= 0


def test_big_layer(big_gdb):
    t = read_filegdb(big_gdb, "big_layer")
    rows = t.to_pylist()
    assert len(rows) == 341
    assert rows[0]["OBJECTID"] == 1 and rows[-1]["OBJECTID"] == 341
    reals = [r["real"] for r in rows]
    assert set(reals) == {0.0, 1.0, 2.0, 3.0}


def test_arcgis_pro_32_types():
    g = FileGDB(D + "arcgis_pro_32_types.gdb")
    t = g.layer_table("big_int")
    rows = t.to_pylist()
    assert rows[0]["big"] == 9007199254740991     # exact int64
    assert rows[1]["big"] == -9007199254740991
    assert rows[0]["short"] == 32767
    d = g.layer_table("date_types").to_pylist()[0]
    assert d["date_only"] == 45259.0              # days since 1899-12-30
    assert abs(d["time_only"] - 0.5515625) < 1e-12


def test_domains_catalog():
    g = FileGDB(D + "Domains.gdb")
    assert g.layer_names() == ["Roads"]
    assert len(g.layer_table("Roads")) == 0


def test_hole_layer_sparse_shapes(big_gdb):
    # 'hole' exercises rows rewritten at varying widths; shapes null
    t = read_filegdb(big_gdb, "hole")
    assert len(t) == 12
    assert t.to_pylist()[0]["str"] == "fid2"


def test_writer_roundtrip(tmp_path):
    from raydal.io.filegdb import write_filegdb

    rows = [{"SHAPE": (10.5 + i, 20.25 + 2 * i), "val": 7 * i,
             "score": 0.5 * i, "tag": f"row{i}"} for i in range(6)]
    rows[3] = {"SHAPE": None, "val": None, "score": None, "tag": None}
    gdb = str(tmp_path / "mini.gdb")
    write_filegdb(gdb, {"pts": rows})
    assert filegdb_layers(gdb) == ["pts"]
    t = read_filegdb(gdb, "pts").to_pylist()
    assert len(t) == 6
    assert t[0]["val"] == 0 and t[5]["val"] == 35
    assert t[3]["val"] is None and t[3]["wkb"] is None
    assert t[1]["tag"] == "row1"
    kind, coords, dims = C.parse_wkb_curve(t[2]["wkb"])
    assert np.allclose(coords, (12.5, 24.25))
