"""GML driver vs the reference-published autotest expectations
(autotest/ogr/ogr_gml.py + data/gml fixtures)."""

import re
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import pytest

from raydal.io.gml import read_gml, write_gml
from raydal.io.wkt import wkb_to_wkt, wkt_to_wkb

GML_DATA = "/root/reference/autotest/ogr/data/gml"


def _nums(wkt):
    return [float(x) for x in re.findall(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?",
                                         wkt)]


def test_rnf_eg_published():
    """test_ogr_gml_3: RoadSegment layer, field values + exact
    LINESTRING WKT published in ogr_gml.py."""
    layers = read_gml(f"{GML_DATA}/rnf_eg.gml")
    assert [l for l, _ in layers] == ["RoadSegment"]
    t = dict(layers)["RoadSegment"]
    assert t.num_rows == 1
    assert t["ngd_id"][0].as_py() == 817792
    assert t["type"][0].as_py() == "HWY"
    assert t["gml_id"][0].as_py() == "GEO_RT_1095878"
    exp = ("LINESTRING (-63.500411040289066 46.240122507771368,"
           "-63.501009714909742 46.240344881690326,"
           "-63.502170462373471 46.241041855639622,"
           "-63.505862621395394 46.24195250605576,"
           "-63.506719184531178 46.242002742901576,"
           "-63.507197272602212 46.241931577811606,"
           "-63.508403092799554 46.241752283460158,"
           "-63.509946573455622 46.241745397977233)")
    got = wkb_to_wkt(t["wkb"][0].as_py(), precision=17)
    assert np.allclose(_nums(got), _nums(exp), atol=1e-12)


def test_bom_nested_fields_published():
    """test_ogr_gml_4: BOM + nested elements (#3680) — nested
    textRendering/anchorPosition surfaces as leaf-named field."""
    t = dict(read_gml(f"{GML_DATA}/bom.gml"))["CartographicText"]
    assert t.num_rows == 3
    assert t["featureCode"][0].as_py() == 10198
    assert t["anchorPosition"][0].as_py() == 8
    assert wkb_to_wkt(t["wkb"][0].as_py()) == "POINT (347243.85 461299.5)"
    assert t["featureCode"][1].as_py() == 10069
    assert wkb_to_wkt(t["wkb"][1].as_py()) == "POINT (347251.45 461250.85)"
    # string/real inference alongside the ints
    assert t["versionDate"][0].as_py() == "09/11/2001 00:00:00"
    assert t["height"][0].as_py() == 1.5
    assert t["descriptiveTerm"][0].as_py() is None  # sparse field


def test_ionic_wfs_gml2_polygon():
    """test_ogr_gml_2 fixture: GML2 outerBoundaryIs polygon, plain
    EPSG:4326 srsName (no axis swap)."""
    t = dict(read_gml(f"{GML_DATA}/ionic_wfs.gml"))["GEM"]
    assert t.num_rows == 1
    assert t["Name"][0].as_py() == "Aartselaar"
    wkt = wkb_to_wkt(t["wkb"][0].as_py())
    assert wkt.startswith("POLYGON ((44038 511549,44015 511548")
    assert _nums(wkt)[:2] == [44038.0, 511549.0]


def test_writer_matches_published_gml3_golden():
    """Writer output token-for-token equals the reference-published
    expected_gml_gml3.gml (autotest golden for GML3 + urn srsName)."""
    t = pa.Table.from_pydict({
        "string_field": pa.array([None, "foo"], pa.string()),
        "wkb": pa.array([struct.pack("<BIdd", 1, 1, 2.0, 49.0),
                         struct.pack("<BIdd", 1, 1, 3.0, 48.0)],
                        pa.binary())})
    data = write_gml([("firstlayer", t)])

    def norm(e, out, path=""):
        tag = e.tag.split("}")[-1]
        p = path + "/" + tag
        out.append((p, tuple(sorted(
            (k.split("}")[-1], v) for k, v in e.attrib.items()
            if "schemaLocation" not in k)), (e.text or "").strip()))
        for c in e:
            norm(c, out, p)

    exp, got = [], []
    norm(ET.parse(f"{GML_DATA}/expected_gml_gml3.gml").getroot(), exp)
    norm(ET.fromstring(data), got)
    assert got == exp


def test_urn_axis_swap_roundtrip():
    """urn srsName → file stores lat lon; read swaps back to x=lon."""
    t = pa.Table.from_pydict({
        "wkb": pa.array([struct.pack("<BIdd", 1, 1, 2.0, 49.0)],
                        pa.binary())})
    back = dict(read_gml(write_gml([("pts", t)])))["pts"]
    assert wkb_to_wkt(back["wkb"][0].as_py()) == "POINT (2 49)"
    # plain EPSG srsName → no swap on either side
    back2 = dict(read_gml(write_gml([("pts", t)],
                                    srs_name="EPSG:32631")))["pts"]
    assert wkb_to_wkt(back2["wkb"][0].as_py()) == "POINT (2 49)"


@pytest.mark.parametrize("wkt", [
    "LINESTRING (1 2,3 4,5 6)",
    "POLYGON ((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))",
    "MULTIPOINT ((1 2),(3 4))",
    "MULTILINESTRING ((1 2,3 4),(5 6,7 8))",
    "MULTIPOLYGON (((0 0,4 0,4 4,0 4,0 0)),((5 5,7 5,7 7,5 7,5 5)))",
])
def test_writer_reader_roundtrip_linear(wkt):
    t = pa.Table.from_pydict({
        "tag": pa.array(["a"], pa.string()),
        "wkb": pa.array([wkt_to_wkb(wkt)], pa.binary())})
    back = dict(read_gml(write_gml([("f", t)])))["f"]
    got = wkb_to_wkt(back["wkb"][0].as_py())
    # MultiPolygon reads back from gml:MultiSurface; MLS via MultiCurve
    assert _nums(got) == _nums(wkt)
    assert got.split(" ", 1)[0].replace("MULTISURFACE", "MULTIPOLYGON") \
        == wkt.split(" ", 1)[0]
    assert back["tag"][0].as_py() == "a"


def test_gml2_coordinates_attrs():
    """decimal/cs/ts attribute handling on GML2 coordinates."""
    doc = b"""<?xml version="1.0"?>
    <FC xmlns:gml="http://www.opengis.net/gml">
      <member><f><geom><gml:LineString>
        <gml:coordinates decimal="," cs=";" ts="|">1,5;2|3;4,25</gml:coordinates>
      </gml:LineString></geom></f></member>
    </FC>"""
    t = dict(read_gml(doc))["f"]
    assert wkb_to_wkt(t["wkb"][0].as_py()) == "LINESTRING (1.5 2,3 4.25)"


def test_curve_segments_linestring_and_arc():
    """Curve/segments: all-linear concatenates (shared endpoints
    dropped); Arc segments produce COMPOUNDCURVE with CIRCULARSTRING
    legs (curve WKB support from the round-5 codec work)."""
    doc = b"""<?xml version="1.0"?>
    <FC xmlns:gml="http://www.opengis.net/gml">
      <member><f><geom><gml:Curve><gml:segments>
        <gml:LineStringSegment><gml:posList>0 0 1 1</gml:posList></gml:LineStringSegment>
        <gml:LineStringSegment><gml:posList>1 1 2 0</gml:posList></gml:LineStringSegment>
      </gml:segments></gml:Curve></geom></f></member>
      <member><g><geom><gml:Curve><gml:segments>
        <gml:LineStringSegment><gml:posList>0 0 1 1</gml:posList></gml:LineStringSegment>
        <gml:Arc><gml:posList>1 1 2 0 3 1</gml:posList></gml:Arc>
      </gml:segments></gml:Curve></geom></g></member>
    </FC>"""
    layers = dict(read_gml(doc))
    assert wkb_to_wkt(layers["f"]["wkb"][0].as_py()) == \
        "LINESTRING (0 0,1 1,2 0)"
    got = wkb_to_wkt(layers["g"]["wkb"][0].as_py())
    assert got == ("COMPOUNDCURVE ((0 0,1 1),"
                   "CIRCULARSTRING (1 1,2 0,3 1))")


def test_surface_patches():
    doc = b"""<?xml version="1.0"?>
    <FC xmlns:gml="http://www.opengis.net/gml">
      <member><f><geom><gml:Surface><gml:patches>
        <gml:PolygonPatch><gml:exterior><gml:LinearRing>
          <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
        </gml:LinearRing></gml:exterior></gml:PolygonPatch>
      </gml:patches></gml:Surface></geom></f></member>
    </FC>"""
    t = dict(read_gml(doc))["f"]
    assert wkb_to_wkt(t["wkb"][0].as_py()) == \
        "POLYGON ((0 0,4 0,4 4,0 4,0 0))"


def test_field_name_collision_uses_path():
    """Same leaf under two different parents → second gets full path
    (gmlreader.cpp SetFeaturePropertyDirectly collision rule)."""
    doc = b"""<?xml version="1.0"?>
    <FC>
      <member><f>
        <a><code>1</code></a>
        <b><code>2</code></b>
      </f></member>
    </FC>"""
    t = dict(read_gml(doc))["f"]
    assert t["code"][0].as_py() == 1
    assert t["b_code"][0].as_py() == 2


def test_registry_source_sink(ray_session, tmp_path):
    import ray.data

    from raydal.pipeline import open_source, write_sink

    ds = open_source("gml", f"{GML_DATA}/bom.gml")
    t = ds.take_all()
    assert len(t) == 3
    assert t[0]["layer"] == "CartographicText"

    src = pa.Table.from_pydict({
        "name": pa.array(["x", "y"], pa.string()),
        "wkb": pa.array([struct.pack("<BIdd", 1, 1, 1.0, 2.0),
                         struct.pack("<BIdd", 1, 1, 3.0, 4.0)],
                        pa.binary())})
    out = str(tmp_path / "pts.gml")
    write_sink("gml", ray.data.from_arrow(src), out)
    back = dict(read_gml(out))["features"]
    assert back.num_rows == 2
    assert back["name"][1].as_py() == "y"
    assert wkb_to_wkt(back["wkb"][1].as_py()) == "POINT (3 4)"
