"""WKT ↔ WKB codec — the reference's published wkb_wkt corpus run
through the same normalize-both-sides protocol as
``autotest/ogr/ogr_wkbwkt_geom.py::test_wkbwkt_geom``."""

from __future__ import annotations

import os

import pytest

from raydal.geo.wkb import parse_wkb, point_wkb, wkb_geom_type
from raydal.io.wkt import wkb_to_wkt, wkt_to_wkb

CORPUS = "/root/reference/autotest/ogr/data/wkb_wkt/"

pairs = (sorted(f[:-4] for f in os.listdir(CORPUS) if f.endswith(".wkb"))
         if os.path.isdir(CORPUS) else [])


@pytest.mark.skipif(not pairs, reason="reference fixtures not present")
@pytest.mark.parametrize("base", pairs)
def test_wkbwkt_corpus(base):
    raw_wkb = open(CORPUS + base + ".wkb", "rb").read()
    raw_wkt = open(CORPUS + base + ".wkt").read().strip()
    # WKT derived from the WKB must match the normalized provided WKT
    from_wkb = wkb_to_wkt(raw_wkb)
    from_wkt = wkb_to_wkt(wkt_to_wkb(raw_wkt))
    assert from_wkb == from_wkt
    # geometry type parity (incl. broken-3D / DB2 byte-order variants)
    assert wkb_geom_type(raw_wkb) == wkb_geom_type(wkt_to_wkb(raw_wkt))
    # text round-trip is a fixed point
    assert wkb_to_wkt(wkt_to_wkb(from_wkb)) == from_wkb


def test_tolerant_wkb_flags():
    # old-style 2.5D bit, "Z flag in 2nd byte", DB2 ASCII byte order
    for base in ["3d_1", "3d_broken_point", "db2_poly"]:
        if not pairs:
            pytest.skip("reference fixtures not present")
        t, _ = parse_wkb(open(CORPUS + base + ".wkb", "rb").read())
        assert 1 <= t <= 7


def test_multipoint_both_forms():
    a = wkt_to_wkb("MULTIPOINT (1 2,3 4)")
    b = wkt_to_wkb("MULTIPOINT ((1 2),(3 4))")
    assert a == b
    assert wkb_to_wkt(a) == "MULTIPOINT (1 2,3 4)"


def test_z_m_suffixes_dropped():
    assert wkt_to_wkb("POINT Z (1 2 3)") == point_wkb(1, 2)
    assert wkt_to_wkb("POINT ZM (1 2 3 4)") == point_wkb(1, 2)
    assert wkt_to_wkb("LINESTRING (1 2 3,4 5 6)") == \
        wkt_to_wkb("LINESTRING (1 2,4 5)")


def test_empty_geometries():
    assert wkb_to_wkt(wkt_to_wkb("MULTIPOLYGON EMPTY")) == \
        "MULTIPOLYGON EMPTY"
    assert wkb_to_wkt(wkt_to_wkb("GEOMETRYCOLLECTION EMPTY")) == \
        "GEOMETRYCOLLECTION EMPTY"
    assert wkb_to_wkt(wkt_to_wkb("POINT EMPTY")) == "POINT EMPTY"


def test_formatting_matches_reference_rules():
    # integer coordinates print bare; <1 uses fixed; >=1 uses 15
    # significant digits (OGRFormatDouble, ogr/ogrutils.cpp:226)
    assert wkb_to_wkt(wkt_to_wkb("POINT (7 2)")) == "POINT (7 2)"
    assert wkb_to_wkt(wkt_to_wkb("POINT (0.5 10.001213439856656)")) == \
        "POINT (0.5 10.0012134398567)"
