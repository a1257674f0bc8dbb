"""XLSX / ODS readers vs the published autotest expectations
(ogr_xlsx.py ogr_xlsx_check / ogr_ods.py ogr_ods_check)."""

import datetime as dt
import os

import pytest

from raydal.io.ods import ods_sheet_names, read_ods
from raydal.io.xlsx import read_xlsx, xlsx_sheet_names

DX = "/root/reference/autotest/ogr/data/xlsx/"
DO = "/root/reference/autotest/ogr/data/ods/"
needs_ref = pytest.mark.skipif(not os.path.isdir(DX),
                               reason="reference autotest data absent")

# the published Feuille7 field-type matrix (OGR types → arrow)
_WANT_TYPES = ["string", "int32", "double", "double", "date32[day]",
               "timestamp[ms]", "double", "time64[us]", "double",
               "int32", "double", "timestamp[ms]"]


def _check_feuille7(t):
    assert t.num_columns == 12
    assert [str(x) for x in t.schema.types] == _WANT_TYPES
    row = [t.column(i)[0].as_py() for i in range(12)]
    assert row[0] == "val"
    assert row[1] == 23
    assert row[2] == 3.45
    assert row[3] == 0.52
    assert row[4] == dt.date(2012, 1, 22)
    assert row[5] == dt.datetime(2012, 1, 22, 18, 49)
    # second feature has field 2 unset
    assert t.column(2)[1].as_py() is None


@needs_ref
def test_xlsx_check():
    sheets = read_xlsx(DX + "test.xlsx")
    assert len(sheets) == 8
    assert list(sheets)[0] == "Feuille1"
    assert sheets["Feuille1"].num_rows == 26
    _check_feuille7(sheets["Feuille7"])


@needs_ref
def test_xlsx_headers_disable():
    # ogr_xlsx_2: OGR_XLSX_HEADERS=DISABLE → 3 features
    t = read_xlsx(DX + "test.xlsx", sheet="Feuille7",
                  headers="DISABLE")
    assert t.num_rows == 3


@needs_ref
def test_xlsx_inline_str():
    # ogr_xlsx_6 (FORCE headers): 1 feature, exact values
    t = read_xlsx(DX + "inlineStr.xlsx", sheet="inlineStr",
                  headers="FORCE")
    assert t.num_rows == 1
    assert t["Bl_District_t"][0].as_py() == "text6"
    assert float(t["Lat"][0].as_py()) == pytest.approx(23.6247122,
                                                       abs=1e-5)


@needs_ref
def test_xlsx_edge_fixtures():
    # ogr_xlsx_13/14: header names survive sparse data rows
    for f in ("test_empty_last_field.xlsx",
              "test_missing_row1_data.xlsx"):
        t = read_xlsx(DX + f)["Sheet1"]
        assert t.num_columns == 18
        assert t.column_names[0] == "Asset Reference"
    # ogr_xlsx_11: columns appearing after row 1
    t = read_xlsx(DX + "not_all_columns_present.xlsx")
    t = t[list(t)[0]]
    for i in (0, 27, 28, 29):
        assert t[f"Field{i + 1}"][0].as_py() == f"val{i + 1}"
    # xml-prefixed documents; t="str" cells count as non-text for
    # header detection
    t = read_xlsx(DX + "with_xml_prefix.xlsx")
    t = t[list(t)[0]]
    assert t.column_names == ["Col1", "Col2"]
    assert t["Col1"][0].as_py() == "foo"
    assert t["Col2"][0].as_py() == "bar"
    # row without r attribute
    t = read_xlsx(DX + "row_without_r_attribute.xlsx")
    t = t[list(t)[0]]
    assert t.num_rows == 1


@needs_ref
def test_ods_check():
    sheets = read_ods(DO + "test.ods")
    assert len(sheets) == 8
    assert list(sheets)[0] == "Feuille1"
    assert sheets["Feuille1"].num_rows == 26
    _check_feuille7(sheets["Feuille7"])
    assert ods_sheet_names(DO + "test.ods")[0] == "Feuille1"


@needs_ref
def test_ods_fixture_variants():
    s = read_ods(DO + "test_kspread.ods")
    assert s["Feuille1"].num_rows == 26
    s = read_ods(DO + "multiple_text_p_elements.ods")
    t = s[list(s)[0]]
    # multi-paragraph cell joins with newlines
    assert any("\n" in str(v.as_py())
               for c in t.columns for v in c
               if v.as_py() is not None)
    s = read_ods(DO + "testrepeatedcolatendofrow.ods")
    t = s[list(s)[0]]
    assert t.num_rows >= 1


@needs_ref
def test_spreadsheet_sources(ray_session):
    from raydal.pipeline import open_source

    df = open_source("xlsx", DX + "test.xlsx",
                     sheet="Feuille7").to_pandas()
    assert len(df) == 2 and len(df.columns) == 12
    df = open_source("ods", DO + "test.ods",
                     sheet="Feuille7").to_pandas()
    assert len(df) == 2

    names = xlsx_sheet_names(DX + "test.xlsx")
    assert names[0] == "Feuille1" and len(names) == 9
