"""DGN v7 reader vs the reference's published expectations
(``autotest/ogr/ogr_dgn.py`` tests 2-4 on smalltest.dgn)."""

import re

import numpy as np

from raydal.io.dgn import default_color_table, read_dgn, \
    read_dgn_features

DATA = "/root/reference/autotest/ogr/data/dgn/smalltest.dgn"


def test_dgn_text_element():
    # ogr_dgn_2: Type 17, Level 1, text + exact point + LABEL style
    f = read_dgn_features(DATA)[0]
    assert f.type == 17 and f.level == 1
    assert f.text == "Demo Text"
    assert np.allclose(f.geom[1][0], [0.7365, 4.2198])
    assert f.style == \
        'LABEL(t:"Demo Text",c:#ffffff,s:1.000g,f:ENGINEERING)'


def test_dgn_circle_element():
    # ogr_dgn_3: Type 15 Level 2 ellipse → linestring, >= 15 points,
    # published envelope
    f = read_dgn_features(DATA)[1]
    assert f.type == 15 and f.level == 2
    g = f.geom[1]
    assert f.geom[0] == "line" and len(g) >= 15
    assert 0.328593 <= g[:, 0].min() <= 0.328594
    assert 9.68780 <= g[:, 0].max() <= 9.68781
    assert -0.09611 <= g[:, 1].min() <= -0.09610
    assert 9.26310 <= g[:, 1].max() <= 9.26311


def test_dgn_filled_shape():
    # ogr_dgn_4: Type 6 Level 2 ColorIndex 83, exact polygon + BRUSH
    f = read_dgn_features(DATA)[2]
    assert f.type == 6 and f.level == 2 and f.color_index == 83
    want = [[4.5355, 3.3170], [4.3832, 2.6517], [4.9441, 2.5235],
            [4.8320, 3.3331], [4.5355, 3.3170]]
    assert np.allclose(f.geom[1][:, :2], want)
    assert f.style == 'BRUSH(fc:#b40000,id:"ogr-brush-0")'


def test_dgn_table_api():
    t = read_dgn(DATA)
    assert t.num_rows == 4
    assert t["type"].to_pylist() == [17, 15, 6, 3]


def test_dgn_default_palette_matches_reference():
    src = open("/root/reference/ogr/ogrsf_frmts/dgn/"
               "dgnhelp.cpp").read()
    i = src.index("abyDefaultPCT")
    body = src[i:src.index("};", i)]
    body = re.sub(r"//[^\n]*", "", body.split("{", 1)[1])
    nums = [int(x) for x in re.findall(r"\d+", body)]
    assert len(nums) == 768
    ref = np.array(nums, np.uint8).reshape(256, 3)
    assert np.array_equal(default_color_table(), ref)
