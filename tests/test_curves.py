"""Curve geometry goldens — every expected value below is published in
the reference's ``autotest/ogr/ogr_geom.py`` (test_ogr_geom_circularstring
:1464, _compoundcurve :1878, _curvepolygon :2146, _multicurve :2424,
_multisurface :2499, _tin :295, _polyhedral_surface :199) or follows the
WKB/WKT layouts of ``ogr/ogr_core.h:422-499``."""

import math

import numpy as np
import pytest

from raydal.geo import curves as C
from raydal.geo import wkb as W

STEP45 = 45  # autotest runs stroking goldens at OGR_ARC_STEPSIZE=45


# -- round-trips (the curve extension of the wkb_wkt corpus) ---------------

CORPUS = [
    "CIRCULARSTRING (0 0,1 1,1 -1)",
    "CIRCULARSTRING Z (0 0 10,1 1 20,2 0 30)",
    "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1))",
    "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1),(1 -1,0 0))",
    "COMPOUNDCURVE Z (CIRCULARSTRING Z (0 0 10,1 1 20,2 0 30),"
    "(2 0 30,0 0 10))",
    "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))",
    "CURVEPOLYGON ((0 0,0 10,10 10,10 0,0 0))",
    "CURVEPOLYGON Z (CIRCULARSTRING Z (0 0 10,1 0 10,0 0 10))",
    "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),(2 0,0 0)),"
    "(0.1 0.1,0.1 0.2,0.2 0.2,0.2 0.1,0.1 0.1),"
    "CIRCULARSTRING (0.25 0.25,0.75 0.25,0.25 0.25))",
    "MULTICURVE (CIRCULARSTRING (0 0,1 1,1 -1),(0 0,1 1))",
    "MULTICURVE (CIRCULARSTRING (0 0,1 0,0 0),(0 0,1 1),"
    "COMPOUNDCURVE ((0 0,1 1),CIRCULARSTRING (1 1,2 2,3 3)))",
    "MULTICURVE Z (CIRCULARSTRING Z (0 0 10,1 0 10,0 0 10))",
    "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0)))",
    "MULTISURFACE (((0 0,0 10,10 10,10 0,0 0)))",
    "MULTISURFACE Z (CURVEPOLYGON Z (CIRCULARSTRING Z (0 0 10,1 0 10,"
    "0 0 10)))",
    "TRIANGLE ((0 0,0 1,1 1,0 0))",
    "TIN Z (((0 0 0,0 0 1,0 1 0,0 0 0)),((0 0 0,0 1 0,1 1 0,0 0 0)))",
    "POLYHEDRALSURFACE Z (((0 0 0,0 0 1,0 1 1,0 1 0,0 0 0)),"
    "((0 0 0,0 1 0,1 1 0,1 0 0,0 0 0)))",
]


@pytest.mark.parametrize("wkt", CORPUS)
def test_wkt_roundtrip(wkt):
    g = C.parse_wkt_curve(wkt)
    assert C.format_wkt_curve(g) == wkt


@pytest.mark.parametrize("wkt", CORPUS)
def test_wkb_roundtrip(wkt):
    g = C.parse_wkt_curve(wkt)
    g2 = C.parse_wkb_curve(C.write_wkb_curve(g))
    assert C.format_wkt_curve(g2) == wkt


def test_bare_z_ordinate_promotes():
    # GDAL infers Z from a bare third ordinate (TIN autotest builds
    # "TIN (((0 0 0,...)))" and exports "TIN Z (...)")
    g = C.parse_wkt_curve("TIN (((0 0 0,0 0 1,0 1 0,0 0 0)))")
    assert C.format_wkt_curve(g) == "TIN Z (((0 0 0,0 0 1,0 1 0,0 0 0)))"


def test_tin_wkbsize_227():
    # autotest test_ogr_geom_tin: WkbSize() == 227
    g = C.parse_wkt_curve(
        "TIN Z (((0 0 0,0 0 1,0 1 0,0 0 0)),((0 0 0,0 1 0,1 1 0,0 0 0)))")
    assert len(C.write_wkb_curve(g)) == 227


# -- stroking goldens (OGR_ARC_STEPSIZE=45) --------------------------------

def _assert_stroke(in_wkt, expected_wkt, step=STEP45):
    lin = C.linearize(C.parse_wkt_curve(in_wkt), step)
    exp = C.parse_wkt_curve(expected_wkt)
    assert lin[0] == exp[0]
    assert lin[1].shape == exp[1].shape
    np.testing.assert_allclose(lin[1], exp[1], atol=1e-8)


def test_stroke_half_arc():
    _assert_stroke(
        "CIRCULARSTRING (0 0,1 1,1 -1)",
        "LINESTRING (0 0,0.218168517531969 0.623489801858729,"
        "0.777479066043687 0.974927912181831,"
        "1.433883739117561 0.900968867902435,"
        "1.900968867902463 0.433883739117562,"
        "1.974927912181821 -0.222520933956316,"
        "1.623489801858719 -0.78183148246804,1 -1)")


def test_stroke_full_circle_3pt():
    # CCW winding chosen like PostGIS for the ambiguous 3-point circle
    _assert_stroke(
        "CIRCULARSTRING (0 0,1 0,0 0)",
        "LINESTRING (0 0,0.116977778440514 -0.321393804843282,"
        "0.413175911166547 -0.49240387650611,0.75 -0.433012701892224,"
        "0.969846310392967 -0.171010071662835,"
        "0.969846310392967 0.171010071662835,0.75 0.433012701892224,"
        "0.413175911166547 0.49240387650611,"
        "0.116977778440514 0.321393804843282,0 0)")


def test_stroke_full_circle_5pt_and_reverse():
    _assert_stroke(
        "CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,0.0 0.0)",
        "LINESTRING (0 0,0.049515566048791 0.216941869558781,"
        "0.188255099070638 0.390915741234018,"
        "0.388739533021848 0.48746395609092,"
        "0.611260466978166 0.48746395609092,"
        "0.811744900929369 0.390915741234018,"
        "0.950484433951232 0.216941869558781,1 0,"
        "0.950484433951232 -0.216941869558781,"
        "0.811744900929369 -0.390915741234018,"
        "0.611260466978166 -0.48746395609092,"
        "0.388739533021848 -0.48746395609092,"
        "0.188255099070638 -0.390915741234018,"
        "0.049515566048791 -0.216941869558781,0 0)")
    _assert_stroke(
        "CIRCULARSTRING (0 0,0.5 -0.5,1.0 0.0,0.5 0.5,0.0 0.0)",
        "LINESTRING (0 0,0.049515566048791 -0.216941869558781,"
        "0.188255099070638 -0.390915741234018,"
        "0.388739533021848 -0.48746395609092,"
        "0.611260466978166 -0.48746395609092,"
        "0.811744900929369 -0.390915741234018,"
        "0.950484433951232 -0.216941869558781,1 0,"
        "0.950484433951232 0.216941869558781,"
        "0.811744900929369 0.390915741234018,"
        "0.611260466978166 0.48746395609092,"
        "0.388739533021848 0.48746395609092,"
        "0.188255099070638 0.390915741234018,"
        "0.049515566048791 0.216941869558781,0 0)")


def test_stroke_full_circle_z():
    _assert_stroke(
        "CIRCULARSTRING (0 0 1,1 0 2,0 0 1)",
        "LINESTRING (0 0 1,0.116977778440514 -0.321393804843282 1,"
        "0.413175911166547 -0.49240387650611 1,0.75 -0.433012701892224 1,"
        "0.969846310392967 -0.171010071662835 1,"
        "0.969846310392967 0.171010071662835 1,0.75 0.433012701892224 1,"
        "0.413175911166547 0.49240387650611 1,"
        "0.116977778440514 0.321393804843282 1,0 0 1)")


def test_stroke_colinear():
    _assert_stroke("CIRCULARSTRING (0 0,1 1,2 2)",
                   "LINESTRING (0 0,1 1,2 2)")
    _assert_stroke("CIRCULARSTRING (0 0 1,1 1 2,2 2 1)",
                   "LINESTRING (0 0 1,1 1 2,2 2 1)")


def test_stroke_curvepolygon_to_polygon():
    lin = C.linearize(
        C.parse_wkt_curve("CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"),
        STEP45)
    exp = C.parse_wkt_curve(
        "POLYGON ((0 0,0.116977778440514 -0.321393804843282,"
        "0.413175911166547 -0.49240387650611,0.75 -0.433012701892224,"
        "0.969846310392967 -0.171010071662835,"
        "0.969846310392967 0.171010071662835,0.75 0.433012701892224,"
        "0.413175911166547 0.49240387650611,"
        "0.116977778440514 0.321393804843282,0 0))")
    assert lin[0] == C.POLYGON
    np.testing.assert_allclose(lin[1][0], exp[1][0], atol=1e-8)


def test_stroke_symmetry_binary():
    # curveToLineString guarantees binary-identical reversed output for
    # the inverted arc
    a = C.curve_to_linestring((0, 0), (1.2, 1), (2, 0), STEP45)
    b = C.curve_to_linestring((2, 0), (1.2, 1), (0, 0), STEP45)
    assert a == b[::-1]


# -- exact metrics ---------------------------------------------------------

def test_length_goldens():
    assert C.curve_length(C.parse_wkt_curve(
        "CIRCULARSTRING (0 0,1 1,1 -1)")) == pytest.approx(1.5 * math.pi)
    assert C.curve_length(C.parse_wkt_curve(
        "CIRCULARSTRING (0 0,1 0,0 0)")) == pytest.approx(math.pi)
    assert C.curve_length(C.parse_wkt_curve(
        "CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,0.0 0.0)")
    ) == pytest.approx(math.pi)
    assert C.curve_length(C.parse_wkt_curve(
        "CIRCULARSTRING (0 0,1 1,2 2)")) == pytest.approx(2 * math.sqrt(2))
    assert C.curve_length(C.parse_wkt_curve(
        "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1),(1 -1,0 0))")
    ) == pytest.approx(1.5 * math.pi + math.sqrt(2))


def test_envelope_goldens():
    env = C.curve_envelope(C.parse_wkt_curve("CIRCULARSTRING (0 0,1 1,1 -1)"))
    np.testing.assert_allclose(env, (0, 2, -1, 1), atol=1e-8)
    env = C.curve_envelope(C.parse_wkt_curve(
        "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"))
    np.testing.assert_allclose(env, (0, 1, -0.5, 0.5), atol=1e-8)
    env = C.curve_envelope(C.parse_wkt_curve(
        "COMPOUNDCURVE Z (CIRCULARSTRING Z (0 0 10,1 1 20,2 0 30),"
        "(2 0 30,0 0 10))"))
    np.testing.assert_allclose(env, (0, 2, 0, 1), atol=1e-8)


def test_area_full_circle_exact():
    g = C.parse_wkt_curve("CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))")
    assert C.curve_area(g) == pytest.approx(math.pi * 0.25, abs=1e-8)
    # 5-point full circle outer ring
    g = C.parse_wkt_curve(
        "CURVEPOLYGON (CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,"
        "0.0 0.0))")
    assert C.curve_area(g) == pytest.approx(math.pi * 0.25, abs=1e-8)


def test_area_with_hole():
    g = C.parse_wkt_curve(
        "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0),"
        "(0.3 -0.1,0.3 0.1,0.5 0.1,0.5 -0.1,0.3 -0.1))")
    assert C.curve_area(g) == pytest.approx(math.pi * 0.25 - 0.04, abs=1e-8)


def test_area_multisurface():
    g = C.parse_wkt_curve(
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0)),"
        "((10 10,10 11,11 11,11 10,10 10)))")
    assert C.curve_area(g) == pytest.approx(math.pi * 0.25 + 1.0, abs=1e-8)


def test_value_circularstring():
    g = C.parse_wkt_curve("CIRCULARSTRING (0 0,1 1,1 -1)")
    L = C.curve_length(g)
    cases = [(-1, (0, 0)), (0, (0, 0)),
             (L / 6, (0.292893218813453, 0.707106781186548)),
             (L / 3, (1, 1)),
             (L / 2, (1.707106781186547, 0.707106781186547)),
             (2 * L / 3, (2, 0)), (L, (1, -1)), (L + 1, (1, -1))]
    for d, exp in cases:
        np.testing.assert_allclose(C.curve_value(g, d), exp, atol=1e-8)


def test_value_compoundcurve_z():
    g = C.parse_wkt_curve(
        "COMPOUNDCURVE Z (CIRCULARSTRING Z (0 0 10,1 1 20,2 0 30),"
        "(2 0 30,0 0 10))")
    cases = [(-1e-3, (0, 0, 10)), (math.pi / 2, (1, 1, 20)),
             (math.pi, (2, 0, 30)), (math.pi + 1, (1, 0, 20)),
             (math.pi + 2 + 1e-3, (0, 0, 10))]
    for d, exp in cases:
        np.testing.assert_allclose(C.curve_value(g, d), exp, atol=1e-6)


# -- segmentize ------------------------------------------------------------

def test_segmentize_full_circle():
    g = C.parse_wkt_curve(
        "CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,0.0 0.0)")
    seg = C.segmentize_circularstring(g[1], "", 0.5)
    exp = C.parse_wkt_curve(
        "CIRCULARSTRING (0 0,0.146446609406726 0.353553390593274,0.5 0.5,"
        "0.853553390593274 0.353553390593274,1 0,"
        "0.853553390593274 -0.353553390593274,0.5 -0.5,"
        "0.146446609406726 -0.353553390593274,0 0)")
    assert seg.shape == exp[1].shape
    np.testing.assert_allclose(seg, exp[1], atol=1e-8)
    # length is invariant under segmentize
    assert C.curve_length((C.CIRCULARSTRING, seg, "")) == pytest.approx(
        math.pi)


def test_segmentize_colinear_z():
    g = C.parse_wkt_curve("CIRCULARSTRING (0 0 1,1 1 2,2 2 1)")
    seg = C.segmentize_circularstring(g[1], "Z", 0.5)
    exp = C.parse_wkt_curve(
        "CIRCULARSTRING Z (0 0 1,"
        "0.166666666666667 0.166666666666667 1.166666666666667,"
        "0.333333333333333 0.333333333333333 1.333333333333333,0.5 0.5 1.5,"
        "0.666666666666667 0.666666666666667 1.666666666666667,"
        "0.833333333333333 0.833333333333333 1.833333333333333,1 1 2,"
        "1.166666666666667 1.166666666666667 1.833333333333333,"
        "1.333333333333333 1.333333333333333 1.666666666666667,1.5 1.5 1.5,"
        "1.666666666666667 1.666666666666667 1.333333333333333,"
        "1.833333333333333 1.833333333333333 1.166666666666667,2 2 1)")
    assert seg.shape == exp[1].shape
    np.testing.assert_allclose(seg, exp[1], atol=1e-8)


def test_segmentize_symmetry():
    s1 = C.segmentize_circularstring(
        C.parse_wkt_curve("CIRCULARSTRING (0 0,1.2 1,2 0)")[1], "", 0.25)
    s2 = C.segmentize_circularstring(
        C.parse_wkt_curve("CIRCULARSTRING (2 0,1.2 1,0 0)")[1], "", 0.25)
    assert np.array_equal(s1, s2[::-1])


def test_segmentize_z_full_circle():
    g = C.parse_wkt_curve("CIRCULARSTRING (0 0 1,1 0 2,0 0 1)")
    seg = C.segmentize_circularstring(g[1], "Z", 0.5)
    exp = C.parse_wkt_curve(
        "CIRCULARSTRING Z (0 0 1,"
        "0.146446609406726 -0.353553390593274 1.25,0.5 -0.5 1.5,"
        "0.853553390593274 -0.353553390593274 1.75,1 0 2,"
        "0.853553390593274 0.353553390593274 1.75,0.5 0.5 1.5,"
        "0.146446609406727 0.353553390593274 1.25,0 0 1)")
    assert seg.shape == exp[1].shape
    np.testing.assert_allclose(seg, exp[1], atol=1e-8)


# -- engine integration (tolerant rejection removed) -----------------------

def test_engine_parse_curvepolygon():
    buf = C.write_wkb_curve(
        C.parse_wkt_curve("CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"))
    t, rings = W.parse_wkb(buf)
    assert t == W.POLYGON
    assert len(rings) == 1 and len(rings[0]) == 92   # 4-degree stroke
    assert W.wkb_geom_type(buf) == C.CURVEPOLYGON
    # exact metrics straight off the curve WKB
    assert W.wkb_area(buf) == pytest.approx(math.pi * 0.25, abs=1e-8)
    np.testing.assert_allclose(W.wkb_bbox(buf), (0, -0.5, 1, 0.5),
                               atol=1e-8)
    inside = W.points_in_polygon(rings, np.array([0.5]), np.array([0.0]))
    outside = W.points_in_polygon(rings, np.array([0.5]), np.array([0.9]))
    assert inside[0] and not outside[0]


def test_engine_parse_circularstring_metrics():
    cs = C.write_wkb_curve(C.parse_wkt_curve("CIRCULARSTRING (0 0,1 1,1 -1)"))
    assert W.wkb_length(cs) == pytest.approx(1.5 * math.pi, abs=1e-8)
    np.testing.assert_allclose(W.wkb_bbox(cs), (0, -1, 2, 1), atol=1e-8)
    t, coords = W.parse_wkb(cs)
    assert t == W.LINESTRING and len(coords) >= 8


def test_engine_parse_tin_polyhedral():
    tin = C.write_wkb_curve(
        C.parse_wkt_curve("TIN Z (((0 0 0,0 1 0,1 1 0,0 0 0)))"))
    t, parts = W.parse_wkb(tin)
    assert t == W.MULTIPOLYGON and parts[0][0] == W.POLYGON
    ps = C.write_wkb_curve(C.parse_wkt_curve(
        "POLYHEDRALSURFACE Z (((0 0 0,0 1 0,1 1 0,1 0 0,0 0 0)))"))
    t, parts = W.parse_wkb(ps)
    assert t == W.MULTIPOLYGON
    assert W.wkb_area(ps) == pytest.approx(1.0)


def test_engine_wkb_bbox_many_mixed():
    bufs = [
        W.point_wkb(5, 6),
        C.write_wkb_curve(C.parse_wkt_curve("CIRCULARSTRING (0 0,1 0,0 0)")),
    ]
    xmin, ymin, xmax, ymax = W.wkb_bbox_many(bufs)
    np.testing.assert_allclose(xmin, [5, 0], atol=1e-8)
    np.testing.assert_allclose(ymin, [6, -0.5], atol=1e-8)


def test_to_engine_wkb():
    buf = C.to_engine_wkb(
        C.parse_wkt_curve("MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING "
                          "(0 0,1 0,0 0)))"), STEP45)
    t, parts = W.parse_wkb(buf)
    assert t == W.MULTIPOLYGON
    assert len(parts[0][1][0]) == 10   # 45-degree stroke ring


# -- curve WKB through the vector writers ----------------------------------

def test_geojson_export_linearizes_curves():
    """GeoJSON has no curve types: exporting curve WKB strokes arcs
    (the reference's OGR_STROKE_CURVE-on-GeoJSON-write behavior)."""
    from raydal.io.geojson import geojson_to_wkb, wkb_to_geojson

    buf = C.write_wkb_curve(
        C.parse_wkt_curve("CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"))
    gj = wkb_to_geojson(buf)
    assert gj["type"] == "Polygon"
    ring = np.asarray(gj["coordinates"][0])
    assert len(ring) == 92          # 4-degree default stroke
    # round-trips as plain linear WKB afterwards
    again = W.parse_wkb(geojson_to_wkb(gj))
    assert again[0] == W.POLYGON


def test_gpkg_roundtrip_curve_feature(tmp_path):
    """Curve WKB passes through the GPKG writer unchanged (GPKG's
    extension geometry types) with the arc-exact envelope in the GPB
    header; the reader hands back the identical curve WKB."""
    import pyarrow as pa

    from raydal.io.gpkg import read_gpkg_features, write_gpkg_features

    cs = C.write_wkb_curve(
        C.parse_wkt_curve("CIRCULARSTRING (0 0,1 1,1 -1)"))
    t = pa.Table.from_pydict({
        "fid": pa.array([1], pa.int64()),
        "wkb": pa.array([cs], pa.binary()),
        "name": pa.array(["arc"], pa.string())})
    path = str(tmp_path / "curves.gpkg")
    write_gpkg_features(t, path, layer="arcs")
    back = read_gpkg_features(path, layer="arcs")
    got = back["wkb"][0].as_py()
    assert bytes(got) == cs
    # envelope written in the GPB header is the exact arc envelope
    import sqlite3
    con = sqlite3.connect(path)
    blob = con.execute("SELECT geom FROM arcs").fetchone()[0]
    con.close()
    import struct as _s
    env = _s.unpack_from("<4d", blob, 8)
    np.testing.assert_allclose(env, (0.0, 2.0, -1.0, 1.0), atol=1e-9)
