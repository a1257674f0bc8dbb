"""DXF reader vs the reference's published expectations
(``autotest/ogr/ogr_dxf.py`` tests 1-11)."""

import math
import re

import numpy as np
import pytest

from raydal.io.dxf import aci_color_table, read_dxf, read_dxf_features

DATA = "/root/reference/autotest/ogr/data/dxf/"

SAMPLE_TEXT = 'Text Sample1¿λ\n"abc"'
SAMPLE_STYLE = 'Text Sample1¿λ\n\\"abc\\"'


@pytest.fixture(scope="module")
def assorted():
    return read_dxf_features(DATA + "assorted.dxf")


def _env_area(g):
    c = g[1]
    return (c[:, 0].max() - c[:, 0].min()) * \
        (c[:, 1].max() - c[:, 1].min())


def test_dxf_1_counts(assorted):
    # ogr_dxf_1: 22 features, 6 fields
    assert len(assorted) == 22
    t = read_dxf(DATA + "assorted.dxf")
    assert {"layer", "subclasses", "linetype", "entityhandle",
            "text", "paperspace"} <= set(t.column_names)


def test_dxf_2_ellipse(assorted):
    f = assorted[0]
    assert f.fields["Layer"] == "0"
    assert f.fields["PaperSpace"] is None
    assert f.fields["SubClasses"] == "AcDbEntity:AcDbEllipse"
    assert f.fields["Linetype"] == "ByLayer"
    assert f.fields["EntityHandle"] == "43"
    assert f.style == "PEN(c:#000000)"
    assert f.geom[0] == "line" and f.geom[2]          # LineString25D
    assert _env_area(f.geom) == pytest.approx(1596.12, abs=0.5)
    assert f.geom[1][0, 0] == pytest.approx(73.25, abs=0.001)
    assert f.geom[1][0, 1] == pytest.approx(139.75, abs=0.001)


def test_dxf_3_partial_ellipse(assorted):
    f = assorted[1]
    assert _env_area(f.geom) == pytest.approx(311.864, abs=0.5)
    assert f.geom[1][0, 0] == pytest.approx(61.133, abs=0.01)
    assert f.geom[1][0, 1] == pytest.approx(103.592, abs=0.01)


def test_dxf_4_point_truecolor(assorted):
    f = assorted[2]
    assert np.allclose(f.geom[1][0], [83.5, 160.0, 0.0])
    assert f.style == "PEN(c:#ffbeb8)"


def test_dxf_5_line(assorted):
    f = assorted[3]
    assert np.allclose(f.geom[1],
                       [[97.0, 159.5, 0.0], [108.5, 132.25, 0.0]])
    assert f.geom[2]                                  # kept 3D


def test_dxf_6_mtext(assorted):
    f = assorted[4]
    assert np.allclose(f.geom[1][0][:2], [84, 126])
    assert not f.geom[2]                              # kept 2D
    assert f.style == \
        'LABEL(f:"Arial",t:"Test",a:30,s:5g,p:7,c:#000000)'


def test_dxf_7_partial_arc(assorted):
    f = assorted[5]
    assert _env_area(f.geom) == pytest.approx(445.748, abs=0.5)
    assert f.geom[1][0, 0] == pytest.approx(115.258, abs=0.01)
    assert f.geom[1][0, 1] == pytest.approx(107.791, abs=0.01)


def test_dxf_8_paperspace_and_dimension(assorted):
    assert assorted[6].fields["PaperSpace"] == 1
    dim = assorted[7]
    assert dim.geom[0] == "multiline"
    want = [
        [[63.8628719444825, 149.209935992088],
         [24.3419606685507, 111.934531038653]],
        [[72.3255686642474, 140.237438265109],
         [63.0051995752285, 150.119275371538]],
        [[32.8046573883157, 102.962033311673],
         [23.4842882992968, 112.843870418103]]]
    assert len(dim.geom[1]) == 3
    for part, w in zip(dim.geom[1], want):
        assert np.allclose(part[1][:, :2], w)
    a1 = assorted[8]
    assert a1.geom[0] == "polygon" and a1.geom[2]
    assert np.allclose(a1.geom[1][0][:, :2], [
        [61.7583023958313, 147.797704380064],
        [63.8628719444825, 149.209935992088],
        [62.3300839753339, 147.191478127097],
        [61.7583023958313, 147.797704380064]])
    a2 = assorted[9]
    assert np.allclose(a2.geom[1][0][:, :2], [
        [26.4465302172018, 113.346762650677],
        [24.3419606685507, 111.934531038653],
        [25.8747486376992, 113.952988903644],
        [26.4465302172018, 113.346762650677]])
    txt = assorted[10]
    assert np.allclose(txt.geom[1][0][:2],
                       [42.815907752635709, 131.936242584545397])
    assert txt.style == \
        'LABEL(f:"Arial",t:"54.33",p:5,a:43.3,s:2.5g,c:#000000)'


def test_dxf_9_block_inlined(assorted):
    blk = assorted[19]
    assert blk.geom[0] == "multiline" and blk.geom[2]
    want0 = [[79.069506278985116, 121.003652476272777, 0],
             [79.716898725419625, 118.892590150942851, 0]]
    assert len(blk.geom[1]) == 5
    assert np.allclose(blk.geom[1][0][1], want0)
    m1 = assorted[20]
    assert m1.fields["Text"] == SAMPLE_TEXT
    assert m1.style == ('LABEL(f:"Arial",t:"%s",a:45,s:0.5g,'
                        'p:5,c:#000000)' % SAMPLE_STYLE)
    assert np.allclose(m1.geom[1][0],
                       [77.602201427662891, 120.775897075866169, 0])
    m2 = assorted[21]
    assert m2.fields["Text"] == "Second"
    assert m2.fields["SubClasses"] == "AcDbEntity:AcDbMText"
    assert np.allclose(m2.geom[1][0],
                       [79.977331629005178, 119.698291706738644, 0])


def test_dxf_10_lwpolyline_ocs():
    fs = read_dxf_features(DATA + "LWPOLYLINE-OCS.dxf")
    f = fs[1]
    assert f.geom[0] == "line" and f.geom[2]
    assert np.allclose(f.geom[1], [
        [600325.567999998573214, 3153021.253000000491738,
         562.760000000052969],
        [600255.215999998385087, 3151973.98600000096485,
         536.950000000069849],
        [597873.927999997511506, 3152247.628000000491738,
         602.705000000089058]])
    # bulge + OCS (fid 12 in the reference test)
    g = fs[12].geom[1]
    assert np.allclose(g[0], [611415.459819656, 3139300.00002682,
                              1807.37309215522], atol=1e-6)
    assert np.allclose(g[3], [611244.054791235, 3139723.12875936,
                              1807.27984293229], atol=1e-6)
    assert np.allclose(g[-1], [610699.99993399, 3141066.17711854,
                               1792.31638281001], atol=1e-6)


def test_dxf_11_entities_only():
    fs = read_dxf_features(DATA + "entities_only.dxf")
    assert np.allclose(fs[0].geom[1][0], [672500.0, 242000.0,
                                          539.986])
    assert np.allclose(fs[1].geom[1][0], [672750.0, 242000.0,
                                          558.974])


def test_dxf_aci_palette_matches_reference_table():
    # the generated ACI palette must match the reference's
    # ACGetColorTable values entry for entry
    src = open("/root/reference/ogr/ogrsf_frmts/dxf/"
               "ogr_autocad_services.cpp").read()
    body = src[src.index("abyDXFColors[768]"):]
    body = body[:body.index("};")]
    body = re.sub(r"//[^\n]*", "", body.split("{", 1)[1])
    nums = [int(x) for x in re.findall(r"\d+", body)]
    assert len(nums) == 768
    ref = np.array(nums, np.uint8).reshape(256, 3)
    mine = aci_color_table()
    assert np.array_equal(mine, ref)
