"""Arc/Info Coverage (E00 + binary) readers vs the reference's
published expectations (autotest/ogr/ogr_avc.py)."""

import os

import pytest

from raydal.io.avc import read_avcbin, read_e00
from raydal.io.wkt import wkb_to_wkt

D = "/root/reference/autotest/ogr/data/avc"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


@need_ref
class TestE00:
    def test_arc_layer(self):
        # test_ogr_avc_1 / check_content
        ls = read_e00(os.path.join(D, "test.e00"))
        arc = ls["ARC"]
        assert arc["UserId"].to_pylist() == [1, 2, 3, 4, 5, 6, 7]
        w = wkb_to_wkt(arc["wkb"][0].as_py())
        assert w == ("LINESTRING (340099.88 4100200,340400.06 4100399.5,"
                     "340900.12 4100200,340700.03 4100199.5)")

    def test_compressed_rejected(self):
        # test_ogr_avc_3
        with pytest.raises(ValueError, match="compressed"):
            read_e00(os.path.join(D, "compressed.e00"))

    def test_point_coverage(self):
        # test_ogr_avc_4 (testpoint.e00 variant)
        lab = read_e00(os.path.join(D, "testpoint.e00"))["LAB"]
        assert lab.num_rows == 80
        r = lab.to_pylist()[-1]
        assert r["ValueId"] == 80
        assert r["WELLS-ID"] == 80
        assert len([c for c in lab.column_names
                    if c not in ("fid", "wkb")]) == 7

    def test_polygon_coverage(self):
        # test_ogr_avc_5 (testpoly.e00 variant)
        pal = read_e00(os.path.join(D, "testpoly.e00"))["PAL"]
        assert pal.num_rows == 3              # universe poly skipped
        r = pal.to_pylist()[-1]
        assert r["ArcIds"] == [-4, -5]
        assert r["AREA"] == pytest.approx(9939.059, abs=1e-3)
        assert len([c for c in pal.column_names
                    if c not in ("fid", "wkb")]) == 5
        assert wkb_to_wkt(r["wkb"]) == (
            "POLYGON ((340700.03 4100199.5,340500 4100199.8,"
            "340599.97 4100100.2,340700.03 4100199.5))")


@need_ref
class TestAVCBin:
    def test_arc_layer(self):
        # test_ogr_avc_2
        ls = read_avcbin(os.path.join(D, "testavc/testavc"))
        arc = ls["ARC"]
        assert arc["UserId"].to_pylist() == [1, 2, 3, 4, 5, 6, 7]
        assert wkb_to_wkt(arc["wkb"][0].as_py()) == (
            "LINESTRING (340099.875 4100200,340400.0625 4100399.5,"
            "340900.125 4100200,340700.03125 4100199.5)")

    def test_point_coverage(self):
        # test_ogr_avc_4 (binary variant, external PAT table)
        lab = read_avcbin(os.path.join(
            D, "testpointavc/testpointavc"))["LAB"]
        assert lab.num_rows == 80
        r = lab.to_pylist()[-1]
        assert r["ValueId"] == 80
        assert r["TESTPOINTAVC-ID"] == 80
        assert len([c for c in lab.column_names
                    if c not in ("fid", "wkb")]) == 7

    def test_polygon_coverage(self):
        # test_ogr_avc_5 (binary variant)
        pal = read_avcbin(os.path.join(
            D, "testpolyavc/testpolyavc"))["PAL"]
        assert pal.num_rows == 3
        r = pal.to_pylist()[-1]
        assert r["ArcIds"] == [-4, -5]
        assert r["AREA"] == pytest.approx(9939.059, abs=1e-3)
        assert wkb_to_wkt(r["wkb"]) == (
            "POLYGON ((340700.03125 4100199.5,340500 4100199.75,"
            "340599.96875 4100100.25,340700.03125 4100199.5))")
