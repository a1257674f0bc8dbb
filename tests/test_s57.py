"""S-57 ENC reader goldens vs the reference's published expectations
(``autotest/ogr/ogr_s57.py``): layer list/counts/types, COALNE /
M_QUAL / SOUNDG / ROADWY feature WKTs, double-byte national
attributes (bug1526), the C.1.5.1 zero-record-length ISO 8211
variant, and sequential ``.001`` update application (DSID case)."""

import struct

import numpy as np
import pytest

from raydal.geo import wkb as W
from raydal.io.s57 import S57File, read_s57, s57_layers

D = "/root/reference/autotest/ogr/data/s57/"
MAIN = D + "1B5X02NE.000"

# autotest test_ogr_s57_check_layers: (name, geom type, feature count)
LAYERS = [
    ("DSID", "NONE", 1),
    ("COALNE", "UNKNOWN", 1),
    ("DEPARE", "UNKNOWN", 4),
    ("DEPCNT", "UNKNOWN", 4),
    ("LNDARE", "UNKNOWN", 1),
    ("LNDELV", "UNKNOWN", 2),
    ("SBDARE", "UNKNOWN", 2),
    ("SLCONS", "UNKNOWN", 1),
    ("SLOTOP", "UNKNOWN", 1),
    ("SOUNDG", "MULTIPOINT Z", 2),
    ("M_COVR", "POLYGON", 1),
    ("M_NSYS", "POLYGON", 1),
    ("M_QUAL", "POLYGON", 1),
]


def test_layer_list_counts_types():
    f = S57File(MAIN)
    assert f.layer_names() == [name for name, _t, _c in LAYERS]
    for name, typ, count in LAYERS:
        assert f.layer_geom_type(name) == typ, name
        assert len(f.layer_table(name)) == count, name


def test_coalne_feature():
    # autotest test_ogr_s57_COALNE
    t = read_s57(MAIN, "COALNE").to_pylist()[0]
    assert t["RCID"] == 1
    assert t["LNAM"] == "FFFF7F4F0FB002D3"
    assert t["OBJL"] == 30
    assert t["AGEN"] == 65535
    kind, c = W.parse_wkb(t["wkb"])
    assert kind == 2                    # linestring
    exp = [(60.976834, -32.494426), (60.977182, -32.494538),
           (60.977424, -32.494774), (60.977748, -32.49504),
           (60.977916, -32.495472), (60.97793, -32.495818),
           (60.977944, -32.496178), (60.978044, -32.496476),
           (60.978002, -32.497038), (60.978002, -32.497266),
           (60.978058, -32.497494), (60.978128, -32.497732),
           (60.97827, -32.497948), (60.979102, -32.498486),
           (60.979426, -32.498666)]
    assert np.allclose(np.asarray(c), exp, atol=1e-9)


def _canon_ring(r):
    r = np.asarray(r)[:-1]
    i = np.lexsort((r[:, 1], r[:, 0]))[0]
    fwd = np.roll(r, -i, axis=0)
    rr = r[::-1]
    j = np.lexsort((rr[:, 1], rr[:, 0]))[0]
    rev = np.roll(rr, -j, axis=0)
    return min(fwd.tobytes(), rev.tobytes())


def test_m_qual_polygon():
    # autotest test_ogr_s57_M_QUAL (ring compared start/direction-
    # insensitively; the point set and adjacency are exact)
    t = read_s57(MAIN, "M_QUAL").to_pylist()[0]
    assert t["RCID"] == 15 and t["OBJL"] == 308 and t["AGEN"] == 65535
    kind, rings = W.parse_wkb(t["wkb"])
    assert kind == 3 and len(rings) == 1
    exp = ("60.97683400 -32.49534000,60.97683400 -32.49762000,"
           "60.97683400 -32.49866600,60.97869000 -32.49866600,"
           "60.97942600 -32.49866600,60.98215200 -32.49866600,"
           "60.98316600 -32.49866600,60.98316600 -32.49755800,"
           "60.98316600 -32.49477000,60.98316600 -32.49350000,"
           "60.98146800 -32.49350000,60.98029800 -32.49350000,"
           "60.97947400 -32.49350000,60.97901600 -32.49350000,"
           "60.97683400 -32.49350000,60.97683400 -32.49442600,"
           "60.97683400 -32.49469800,60.97683400 -32.49534000")
    ring_exp = np.array([[float(v) for v in p.split()]
                         for p in exp.split(",")])
    assert _canon_ring(rings[0]) == _canon_ring(ring_exp)


def test_soundg_multipoint_z():
    # autotest test_ogr_s57_SOUNDG
    t = read_s57(MAIN, "SOUNDG").to_pylist()[0]
    assert t["RCID"] == 20 and t["OBJL"] == 129 and t["AGEN"] == 65535
    assert t["QUASOU"] == ["1"]
    buf = t["wkb"]
    assert struct.unpack("<I", buf[1:5])[0] == 1004    # multipoint Z
    n = struct.unpack("<I", buf[5:9])[0]
    pts = [struct.unpack("<3d", buf[9 + 29 * i + 5:9 + 29 * i + 29])
           for i in range(n)]
    exp = [(60.981644, -32.49449, 3.4), (60.981344, -32.496424, 1.4),
           (60.978142, -32.494874, -3.2), (60.980712, -32.495196, 1.2)]
    assert np.allclose(pts, exp, atol=1e-9)


def test_double_byte_attrs():
    # autotest test_ogr_s57_double_byte_attrs (bug1526): ATTF latin +
    # NATF UCS-2LE at lexical level 2
    t = read_s57(D + "bug1526.000", "FOGSIG").to_pylist()[0]
    assert t["INFORM"] == ("During South winds nautophone is not "
                           "always heard in S direction from lighthouse")
    assert len(t["NINFOM"]) >= 1


def test_multilinestring():
    # autotest test_ogr_s57_multilinestring (bug2147): 8-part
    # MULTILINESTRING, first part 21 points starting/ending as published
    t = read_s57(D + "bug2147_3R7D0889.000", "ROADWY").to_pylist()[0]
    kind, parts = W.parse_wkb(t["wkb"])
    assert kind == 5 and len(parts) == 8
    first = np.asarray(parts[0][1])
    assert len(first) == 21
    assert np.allclose(first[0], (22.5659615, 44.5541942))
    assert np.allclose(first[-1], (22.5526434, 44.5237888))
    assert np.allclose(np.asarray(parts[1][1])[0],
                       (22.5656187, 44.5500822))


def test_fake_s57_and_variant_c151():
    # autotest test_ogr_s57_10/11: DSID EXPP=2; the variant file uses
    # ISO 8211 C.1.5.1 zero record-length leaders
    assert S57File(D + "fake_s57.000").dsid["EXPP"] == 2
    assert S57File(D + "fake_s57_variant_C151.000").dsid["EXPP"] == 2


def test_update_dsid():
    # autotest test_ogr_s57_update_dsid: .001 overrides EDTN/UPDN/ISDT,
    # UADT stays from the base file
    f = S57File(D + "fake_s57_update_dsid.000")
    assert f.dsid["EDTN"] == "0"
    assert f.dsid["UPDN"] == "1"
    assert f.dsid["UADT"] == "20190211"
    assert f.dsid["ISDT"] == "20190212"
    base = S57File(D + "fake_s57_update_dsid.000", apply_updates=False)
    assert base.dsid["EDTN"] == "28" and base.dsid["UPDN"] == "0"


def test_module_helpers():
    assert s57_layers(MAIN)[0] == "DSID"
    layers = read_s57(MAIN)
    assert set(layers) == {n for n, _t, _c in LAYERS}
    assert len(layers["DEPARE"]) == 4


def test_dsid_layer_table():
    t = read_s57(MAIN, "DSID").to_pylist()[0]
    assert t["DSNM"] == "1B5X02NE.000"
    assert t["NOED"] == 25              # DSSI edge count


def test_write_roundtrip_full_fixture():
    # the reference's S57-to-S57 conversion test (test_ogr_s57_write_1):
    # read the real ENC, re-serialize the model, re-read — every layer
    # table must be identical
    from raydal.io.s57 import write_s57

    src = S57File(MAIN)
    rt = S57File(write_s57(src))
    assert rt.layer_names() == src.layer_names()
    for name in src.layer_names():
        a, b = src.layer_table(name), rt.layer_table(name)
        assert a.num_rows == b.num_rows, name
        if name == "DSID":
            continue
        assert a.column_names == b.column_names, name
        for c in a.column_names:
            assert a[c].to_pylist() == b[c].to_pylist(), (name, c)
