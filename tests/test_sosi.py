"""SOSI reader vs the reference's published expectations
(autotest/ogr/ogr_sosi.py test_ogr_sosi_2/3)."""

import os

import pytest

from raydal.io.sosi import read_sosi
from raydal.io.wkt import wkb_to_wkt

P = ("/root/reference/autotest/ogr/data/sosi/"
     "test_duplicate_fields.sos")


@pytest.mark.skipif(not os.path.exists(P),
                    reason="reference fixtures not available")
class TestSOSI:
    def test_layers_and_counts(self):
        # test_ogr_sosi_2: curve layer 17 features, surface layer 1
        ls = read_sosi(P)
        assert ls["KURVE"].num_rows == 17
        assert ls["FLATE"].num_rows == 1

    def test_duplicate_field_first_wins(self):
        # default: the first duplicated BEITEBRUKERID value wins (YD)
        f = read_sosi(P)["FLATE"].to_pylist()[0]
        assert f["BEITEBRUKERID"] == "YD"
        assert f["OBJTYPE"] == "Flyttelei"

    def test_append_fields_map(self):
        # test_ogr_sosi_3: appendFieldsMap joins duplicates with '&'
        f = read_sosi(P, append_fields={"BEITEBRUKERID"})[
            "FLATE"].to_pylist()[0]
        assert f["BEITEBRUKERID"] == "YD&YG"

    def test_flate_ring_assembly(self):
        # the surface chains its 17 REF'd curves (with sign-reversal)
        # into one closed ring in scaled coordinates (ENHET 0.01)
        f = read_sosi(P)["FLATE"].to_pylist()[0]
        w = wkb_to_wkt(f["wkb"])
        assert w.startswith("POLYGON ((")
        first = w.split("((")[1].split(",")[0]
        assert w.rstrip("))").endswith(first)

    def test_curves_scaled(self):
        k = read_sosi(P)["KURVE"].to_pylist()[0]
        w = wkb_to_wkt(k["wkb"])
        assert w.startswith("LINESTRING (830019.68 7831173.05")
