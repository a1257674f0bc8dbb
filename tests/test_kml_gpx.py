"""KML + GPX vector drivers against the reference's published autotest
expectations (autotest/ogr/ogr_kml.py, ogr_gpx.py)."""
import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from raydal.io.gpx import read_gpx, write_gpx
from raydal.io.kml import read_kml, write_kml

KML_DATA = "/root/reference/autotest/ogr/data/kml"
GPX_DATA = "/root/reference/autotest/ogr/data/gpx"
needs_ref = pytest.mark.skipif(not os.path.isdir(KML_DATA),
                               reason="reference autotest data absent")


def _zparse_point(wkb):
    buf = bytes(wkb)
    code = struct.unpack_from("<I", buf, 1)[0]
    n = 3 if code >= 1000 else 2
    return struct.unpack_from("<" + "d" * n, buf, 5)


# ------------------------------------------------------------------ KML

@needs_ref
def test_kml_samples_layers_and_attributes():
    layers = dict(read_kml(os.path.join(KML_DATA, "samples.kml")))
    # test_ogr_kml_attributes_1/2/4
    pm = layers["Placemarks"]
    assert pm["Name"].to_pylist() == [
        "Simple placemark", "Floating placemark", "Extruded placemark"]
    assert pm["description"].to_pylist()[0] == (
        "Attached to the ground. Intelligently places itself at the\n"
        "height of the underlying terrain.")
    assert pm["description"].to_pylist()[1] == \
        "Floats a defined distance above the ground."
    assert pm["description"].to_pylist()[2] == \
        'Tethered to the ground by a customizable\n"tail"'
    hi = layers["Highlighted Icon"]
    assert hi.num_rows == 1
    assert hi["Name"].to_pylist() == ["Roll over this icon"]
    assert hi["description"].to_pylist() == [""]
    gc = layers["Google Campus"]
    assert gc["Name"].to_pylist() == [f"Building {i}" for i in
                                      range(40, 44)]


@needs_ref
def test_kml_samples_geometry():
    layers = dict(read_kml(os.path.join(KML_DATA, "samples.kml")))
    # test_ogr_kml_point_read
    pts = [_zparse_point(w) for w in
           layers["Placemarks"]["wkb"].to_pylist()]
    assert pts[0] == pytest.approx(
        (-122.0822035425683, 37.42228990140251, 0))
    assert pts[1] == pytest.approx((-122.084075, 37.4220033612141, 50))
    assert pts[2] == pytest.approx(
        (-122.0857667006183, 37.42156927867553, 50))
    # test_ogr_kml_linestring_read: first Paths feature
    buf = bytes(layers["Paths"]["wkb"].to_pylist()[0])
    code, n = struct.unpack_from("<II", buf, 1)
    assert code == 1002 and n == 2
    vals = struct.unpack_from("<" + "d" * 6, buf, 9)
    assert vals[:3] == pytest.approx(
        (-112.081423783034495, 36.106778704771372, 0))
    # test_ogr_kml_polygon_read: first Google Campus polygon, 22 pts
    buf = bytes(layers["Google Campus"]["wkb"].to_pylist()[0])
    code, nrings = struct.unpack_from("<II", buf, 1)
    assert code == 1003 and nrings == 1
    npts = struct.unpack_from("<I", buf, 9)[0]
    assert npts == 22
    first = struct.unpack_from("<ddd", buf, 13)
    assert first == pytest.approx(
        (-122.084893845961204, 37.422571240447859, 17))


@needs_ref
@pytest.mark.parametrize("fname,want", [
    ("empty.kml", []),
    ("emptylayers.kml", [("Layer1", 0), ("Layer2", 0)]),
    ("folder_with_subfolder_placemark.kml", [("MainFolder", 0)]),
    ("weird_empty_folders.kml", [("", 0)]),
    ("duplicate_folder_name.kml", [("layer", 1), ("layer (#2)", 1)]),
    ("placemark_with_kml_prefix.kml", [("", 1)]),
])
def test_kml_layer_structure(fname, want):
    got = [(n, t.num_rows) for n, t in
           read_kml(os.path.join(KML_DATA, fname))]
    assert got == want


@needs_ref
def test_kml_placemark_in_root_and_subfolder():
    layers = dict(read_kml(os.path.join(
        KML_DATA, "placemark_in_root_and_subfolder.kml")))
    assert layers["TopLevel"].num_rows == 1
    assert layers["SubFolder1"].num_rows == 1


@needs_ref
def test_kml_invalid_documents_raise():
    for f in ("truncated.kml", "junk_content_after_valid_doc.kml"):
        with pytest.raises(Exception):
            read_kml(os.path.join(KML_DATA, f))


@needs_ref
def test_kml_description_with_inline_xml():
    layers = read_kml(os.path.join(KML_DATA, "description_with_xml.kml"))
    assert layers[0][1]["description"].to_pylist()[0] == \
        'Description<br></br><i attr="val">Interesting</i><br></br>'


def test_kml_roundtrip():
    from raydal.geo.wkb import linestring_wkb, point_wkb, polygon_wkb
    t = pa.Table.from_pydict({
        "Name": pa.array(["a", "b", "c"], pa.string()),
        "description": pa.array(["d1", "", "<markup>"], pa.string()),
        "wkb": pa.array([
            point_wkb(1.5, -2.5),
            linestring_wkb([(0, 0), (1, 1), (2, 0)]),
            polygon_wkb([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                         [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]]),
        ], pa.binary())})
    layers = read_kml(write_kml([("L", t)]))
    assert len(layers) == 1 and layers[0][0] == "L"
    back = layers[0][1]
    assert back["Name"].to_pylist() == ["a", "b", "c"]
    assert back["description"].to_pylist() == ["d1", "", "<markup>"]
    assert back["wkb"].to_pylist() == t["wkb"].to_pylist()


def test_kml_roundtrip_z_and_multi():
    # Z point + MultiGeometry survive a write→read cycle
    zpt = struct.pack("<BIddd", 1, 1001, 7.0, 8.0, 9.0)
    multi = struct.pack("<BII", 1, 4, 2) + \
        struct.pack("<BIdd", 1, 1, 0.0, 1.0) + \
        struct.pack("<BIdd", 1, 1, 2.0, 3.0)
    t = pa.Table.from_pydict({
        "Name": pa.array(["z", "m"], pa.string()),
        "wkb": pa.array([zpt, multi], pa.binary())})
    back = read_kml(write_kml(t))[0][1]
    assert back["wkb"].to_pylist()[0] == zpt
    assert back["wkb"].to_pylist()[1] == multi


def test_kml_rejects_non_kml():
    with pytest.raises(ValueError, match="KML"):
        read_kml("<gpx></gpx>")


# ------------------------------------------------------------------ GPX

@needs_ref
def test_gpx_five_layers():
    # test_ogr_gpx_1..5
    layers = read_gpx(os.path.join(GPX_DATA, "test.gpx"))
    assert sorted(layers) == ["route_points", "routes", "track_points",
                              "tracks", "waypoints"]
    wp = layers["waypoints"]
    assert wp.num_rows == 2
    assert wp["ele"].to_pylist() == [2.0, None]
    assert wp["name"].to_pylist() == ["waypoint name", None]
    assert wp["link1_href"].to_pylist() == ["href", None]
    assert wp["link1_text"].to_pylist() == ["text", None]
    assert wp["link1_type"].to_pylist() == ["type", None]
    assert wp["link2_href"].to_pylist() == ["href2", None]
    assert _zparse_point(wp["wkb"].to_pylist()[0])[:2] == (1.0, 0.0)
    assert _zparse_point(wp["wkb"].to_pylist()[1])[:2] == (4.0, 3.0)


@needs_ref
def test_gpx_routes_and_tracks():
    layers = read_gpx(os.path.join(GPX_DATA, "test.gpx"))
    rt = layers["routes"]
    assert rt.num_rows == 2
    buf = bytes(rt["wkb"].to_pylist()[0])
    assert struct.unpack_from("<II", buf, 1) == (2, 3)   # 3-pt line
    assert struct.unpack_from("<dd", buf, 9) == (6.0, 5.0)
    # empty route → LINESTRING EMPTY
    assert struct.unpack_from("<II", bytes(rt["wkb"].to_pylist()[1]),
                              1) == (2, 0)
    tk = layers["tracks"]
    assert tk.num_rows == 3
    buf = bytes(tk["wkb"].to_pylist()[0])
    assert struct.unpack_from("<II", buf, 1) == (5, 2)   # 2 segments
    # empty track and empty-trkseg track → MULTILINESTRING EMPTY
    for i in (1, 2):
        assert struct.unpack_from(
            "<II", bytes(tk["wkb"].to_pylist()[i]), 1) == (5, 0)


@needs_ref
def test_gpx_point_layers():
    layers = read_gpx(os.path.join(GPX_DATA, "test.gpx"))
    rp = layers["route_points"]
    assert rp["name"].to_pylist() == ["route point name", None, None]
    assert rp["route_fid"].to_pylist() == [0, 0, 0]
    assert _zparse_point(rp["wkb"].to_pylist()[0])[:2] == (6.0, 5.0)
    tp = layers["track_points"]
    assert tp["name"].to_pylist() == ["track point name", None, None,
                                      None]
    assert list(zip(tp["track_fid"].to_pylist(),
                    tp["track_seg_id"].to_pylist(),
                    tp["track_seg_point_id"].to_pylist())) == \
        [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)]


@needs_ref
def test_gpx_roundtrip():
    layers = read_gpx(os.path.join(GPX_DATA, "test.gpx"))
    back = read_gpx(write_gpx(layers))
    for k in ("waypoints", "routes", "tracks"):
        assert back[k]["wkb"].to_pylist() == layers[k]["wkb"].to_pylist()
        assert back[k]["name"].to_pylist() == \
            layers[k]["name"].to_pylist()
    assert back["waypoints"]["ele"].to_pylist() == [2.0, None]
    assert back["waypoints"]["link2_text"].to_pylist() == \
        layers["waypoints"]["link2_text"].to_pylist()


def test_gpx_rejects_non_gpx():
    with pytest.raises(ValueError, match="GPX"):
        read_gpx("<kml></kml>")
