"""MiraMon structured vector reader vs the reference's published
expectations (autotest/ogr/ogr_miramon_vector.py)."""

import os

import pytest

from raydal.io.miramon import read_miramon
from raydal.io.wkt import wkb_to_wkt

D = "/root/reference/autotest/ogr/data/miramon"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


@need_ref
class TestMiraMon:
    def test_simple_points(self):
        # check_simple_point
        t = read_miramon(os.path.join(
            D, "Points/SimplePoints/SimplePointsFile.pnt"))
        assert t.num_rows == 3
        r = t.to_pylist()
        assert wkb_to_wkt(r[0]["wkb"]) == \
            "POINT (513.488106565226 848.806850618409)"
        assert r[0]["ID_GRAFIC"] == 0
        assert r[0]["ATT1"] == "A"
        assert r[0]["ATTRIBUTE_2"] == "B"      # extended DBF long name
        assert r[0]["LOGICALY"] is True
        assert r[0]["LOGICALN"] is False
        assert wkb_to_wkt(r[1]["wkb"]) == \
            "POINT (342.325404376834 715.680304471881)"
        assert r[1]["ATT1"] == "C"
        assert wkb_to_wkt(r[2]["wkb"]) == \
            "POINT (594.503182156354 722.692543360232)"
        assert r[2]["ATT1"] == ""

    def test_simple_arcs(self):
        # check_simple_arc
        t = read_miramon(os.path.join(
            D, "Arcs/SimpleArcs/SimpleArcFile.arc"))
        assert t.num_rows == 4
        r = t.to_pylist()
        assert wkb_to_wkt(r[0]["wkb"]) == (
            "LINESTRING (351.333967649907 610.58039961936,"
            "474.450999048575 824.784015223546,"
            "758.721217887776 838.797335870549,"
            "1042.99143672698 610.58039961936,"
            "1369.30161750719 562.534728829636)")
        assert r[0]["ID_GRAFIC"] == 0
        assert r[0]["N_VERTEXS"] == 5
        assert r[0]["LONG_ARC"] == pytest.approx(1226.052754666,
                                                 abs=1e-5)
        assert r[0]["NODE_INI"] == 0
        assert r[0]["NODE_FI"] == 1
        assert r[0]["ATT1"] == "A"
        assert r[1]["ID_GRAFIC"] == 1
        assert r[1]["N_VERTEXS"] == 7
        assert r[1]["NODE_INI"] == 2
        assert r[1]["NODE_FI"] == 3

    def test_simple_polygons(self):
        # check_simple_polygon: universal polygon skipped
        t = read_miramon(os.path.join(
            D, "Polygons/SimplePolygons/SimplePolFile.pol"))
        assert t.num_rows == 3
        r = t.to_pylist()[0]
        assert wkb_to_wkt(r["wkb"]) == (
            "POLYGON ((335.318744053333 769.731684110321,"
            "552.525214081877 856.814462416696,"
            "775.737392959137 707.672692673594,"
            "648.616555661325 493.469077069408,"
            "386.367269267414 498.473834443337,"
            "335.318744053333 769.731684110321))")
        assert r["ID_GRAFIC"] == 1
        assert r["N_VERTEXS"] == 6
        assert r["PERIMETRE"] == pytest.approx(1289.866489495,
                                               abs=1e-5)
        assert r["AREA"] == pytest.approx(112471.221989, abs=1e-5)
        assert r["N_ARCS"] == 1
        assert r["N_POLIG"] == 1
        assert r["ATT1"] == "A"

    def test_multipolygon(self):
        # check_multi_polygon: two exterior rings, holes attached
        t = read_miramon(os.path.join(
            D, "Polygons/Multipolygons/Multipolygons.pol"))
        assert t.num_rows == 1
        w = wkb_to_wkt(t["wkb"][0].as_py())
        assert w.startswith(
            "MULTIPOLYGON (((32.699999937575 36.072500062925,")
        assert w.count("((") == 2              # 2 polygons
        assert w.endswith(
            "34.269999937575 35.602500062925)))")
        # hole rings present inside the first polygon
        assert "42.449999937575 38.462500062925" in w
