"""MapInfo TAB binary reader vs the reference's published golden
(autotest/ogr/ogr_mitab.py test_ogr_mitab_41: all_geoms.tab must match
all_geoms.mif.golden.csv feature-for-feature in geometry AND style)."""

import csv
import os

import numpy as np
import pytest

from raydal.geo import wkb as W
from raydal.io.mitab import read_tab
from raydal.io.wkt import wkt_to_wkb
from raydal.io.xls import read_xls

D = "/root/reference/autotest/ogr/data/mitab"
XLS = "/root/reference/autotest/ogr/data/xls"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


def _coords(wkb):
    out = []

    def rec(p):
        kind, data = p
        if isinstance(data, np.ndarray):
            out.append(data)
        elif isinstance(data, list):
            for d in data:
                if isinstance(d, np.ndarray):
                    out.append(d)
                else:
                    rec(d)

    rec(W.parse_wkb(wkb))
    return np.vstack(out) if out else np.zeros((0, 2))


@need_ref
class TestMitabAllGeoms:
    @pytest.fixture(scope="class")
    def pair(self):
        t = read_tab(os.path.join(D, "all_geoms.tab"))
        golden = list(csv.DictReader(
            open(os.path.join(D, "all_geoms.mif.golden.csv"))))
        return t.to_pylist(), golden

    def test_feature_count(self, pair):
        rows, golden = pair
        assert len(rows) == len(golden) == 16

    def test_geometry_parity(self, pair):
        rows, golden = pair
        for i, (r, g) in enumerate(zip(rows, golden)):
            a = _coords(r["wkb"])
            b = _coords(wkt_to_wkb(g["WKT"]))
            assert a.shape == b.shape, i
            assert np.allclose(a, b, atol=1e-7), i

    def test_style_parity(self, pair):
        rows, golden = pair
        for i, (r, g) in enumerate(zip(rows, golden)):
            assert (r.get("ogr_style") or "") == g["ogr_style"], i

    def test_other_fixtures_parse(self):
        t = read_tab(os.path.join(D, "first_table.tab"))
        assert t.num_rows == 1
        t = read_tab(os.path.join(D, "aspatial.tab"))
        assert t.num_rows == 3
        # uppercase extensions, zero records
        t = read_tab(os.path.join(D, "lambert93_francais.TAB"))
        assert t.num_rows == 0


@pytest.mark.skipif(not os.path.isdir(XLS),
                    reason="reference fixtures not available")
class TestXLS:
    def test_reference_matrix(self):
        # autotest/ogr/ogr_xls.py test_ogr_xls_1 expectations
        t = read_xls(os.path.join(XLS, "test972000xp.xls"))
        assert t.schema.metadata[b"sheet"] == b"Feuille1"
        assert t.num_rows == 3
        assert [str(f.type) for f in t.schema] == \
            ["int64", "double", "string", "string", "string"]
        r = t.to_pylist()[0]
        assert r["FirstCol"] == 1
        assert r["SecondCol"] == 1.0
        assert r["ThirdCol"] is None
        assert r["FourthCol"] == "1980/01/01"
        assert r["FifthCol"] == "1980/01/01 00:00:00"

    def test_headers_disabled(self):
        # test_ogr_xls_2: OGR_XLS_HEADERS=DISABLE → 4 rows
        t = read_xls(os.path.join(XLS, "test972000xp.xls"),
                     headers=False)
        assert t.num_rows == 4
        assert t.column_names[0] == "Field1"

    def test_sheet_selection(self):
        from raydal.io.xls import xls_sheet_names
        names = xls_sheet_names(os.path.join(XLS, "test972000xp.xls"))
        assert names == ["Feuille1", "Feuille2", "Feuille3"]
