"""OGR feature-style strings (ogr/ogrfeaturestyle.cpp parity;
autotest/ogr/ogr_style.py StyleTable behaviors)."""

import pyarrow as pa
import pytest

from raydal.ops.featurestyle import (StyleTable, explode_style_column,
                                     get_rgb_from_string, parse_style,
                                     serialize_style, split_style_parts)

AUTOTEST_STYLE = 'SYMBOL(id:"http://style1_normal",c:#67452301)'


def test_parse_pen_units():
    parts = parse_style("PEN(c:#FF0000,w:5px)")
    assert len(parts) == 1
    p = parts[0]
    assert p["tool"] == "PEN"
    assert p["params"]["c"] == "#FF0000"
    assert p["params"]["w"] == 5.0
    assert p["units"]["w"] == "px"


def test_parse_default_unit_mm():
    p = parse_style("PEN(w:2)")[0]
    assert p["params"]["w"] == 2.0
    assert p["units"]["w"] == "mm"


def test_parse_quoted_value_with_url():
    # the autotest style string: ':' inside quotes must not split
    p = parse_style(AUTOTEST_STYLE)[0]
    assert p["tool"] == "SYMBOL"
    assert p["params"]["id"] == "http://style1_normal"
    assert p["params"]["c"] == "#67452301"


def test_parse_label_quoted_comma_and_booleans():
    p = parse_style('LABEL(f:"Arial, Bold",s:12pt,t:"Hello, World",bo)')[0]
    assert p["params"]["f"] == "Arial, Bold"
    assert p["params"]["s"] == 12.0
    assert p["units"]["s"] == "pt"
    assert p["params"]["t"] == "Hello, World"
    assert p["params"]["bo"] == 1       # legacy: bare boolean reads 1


def test_parse_multipart():
    parts = parse_style("BRUSH(fc:#0000FF);PEN(c:#000000,w:1px)")
    assert [p["tool"] for p in parts] == ["BRUSH", "PEN"]
    assert split_style_parts(
        'LABEL(t:"a;b");PEN(c:#000000)') == ['LABEL(t:"a;b")',
                                             "PEN(c:#000000)"]


def test_parse_unknown_token_skipped():
    p = parse_style("PEN(c:#FF0000,zz:9)")[0]
    assert p["params"] == {"c": "#FF0000"}


def test_parse_unknown_tool_raises():
    with pytest.raises(ValueError):
        parse_style("WOBBLE(x:1)")


def test_serialize_reference_layout():
    # table order, %f doubles, unit suffix on georeferenced params
    parts = parse_style("PEN(w:5px,c:#FF0000)")
    assert serialize_style(parts) == "PEN(c:#FF0000,w:5.000000px)"
    parts = parse_style("LABEL(s:10g,f:Arial)")
    assert serialize_style(parts) == "LABEL(f:Arial,s:10.000000g)"


def test_serialize_requotes_special_chars():
    parts = parse_style('LABEL(t:"Hello, World")')
    out = serialize_style(parts)
    assert out == 'LABEL(t:"Hello, World")'
    assert parse_style(out)[0]["params"]["t"] == "Hello, World"


def test_rgb_from_string():
    assert get_rgb_from_string("#67452301") == (0x67, 0x45, 0x23, 0x01,
                                                True)
    assert get_rgb_from_string("#FF0000") == (255, 0, 0, 255, True)
    assert get_rgb_from_string("red") == (0, 0, 0, 255, False)
    assert get_rgb_from_string("#ab") == (0, 0, 0, 255, False)
    # sscanf greediness: 5 hex digits → third field gets 1 digit
    assert get_rgb_from_string("#abcde") == (0xAB, 0xCD, 0xE, 255, True)


def test_style_table_autotest_flow(tmp_path):
    # mirrors autotest/ogr/ogr_style.py test_ogr_style_styletable
    st = StyleTable()
    assert st.add_style("style1_normal", AUTOTEST_STYLE)
    path = str(tmp_path / "out.txt")
    assert st.save(path)

    st2 = StyleTable()
    assert st2.load(path)
    assert st2.find("non_existing_style") is None
    assert st2.find("style1_normal") == AUTOTEST_STYLE
    assert st2.get_next_style() == AUTOTEST_STYLE
    assert st2.get_last_style_name() == "style1_normal"
    assert st2.get_next_style() is None
    st2.reset_style_string_reading()
    assert st2.get_next_style() == AUTOTEST_STYLE


def test_explode_style_column(ray_session):
    import ray.data

    t = pa.Table.from_pydict({
        "fid": pa.array([10, 11, 12], pa.int64()),
        "style": pa.array(["PEN(c:#FF0000,w:5px)",
                           "BRUSH(fc:#0000FF);PEN(c:#000000,w:1px)",
                           None], pa.string())})
    out = explode_style_column(ray.data.from_arrow(t), "style",
                               id_col="fid").take_all()
    rows = {(r["id"], r["part"], r["tool"], r["param"]): r for r in out}
    assert rows[(10, 0, "PEN", "w")]["value"] == "5.0"
    assert rows[(10, 0, "PEN", "w")]["unit"] == "px"
    assert rows[(11, 0, "BRUSH", "fc")]["value"] == "#0000FF"
    assert rows[(11, 1, "PEN", "c")]["value"] == "#000000"
    assert not any(r["id"] == 12 for r in out)


def test_parse_dgn_reader_styles():
    # the repo's DGN reader emits OGR-parity style strings — they must
    # all parse cleanly
    from raydal.io.shapefile import read_shapefile  # noqa: F401
    samples = [
        "PEN(id:\"ogr-pen-0\",c:#ffffff)",
        "BRUSH(fc:#0000ff,id:\"ogr-brush-0\")",
        'LABEL(f:ENGINEERING,s:10g,t:"sample text")',
    ]
    for s in samples:
        assert parse_style(s)
