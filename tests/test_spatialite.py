"""SpatiaLite reader vs the reference's fixtures
(``autotest/ogr/ogr_sqlite.py`` expectations; geometry parity is
checked against the poly.shp twin of the same canonical layer)."""

import numpy as np

from raydal.geo import wkb as W
from raydal.io.shapefile import read_shapefile
from raydal.io.spatialite import read_spatialite

DATA = "/root/reference/autotest/ogr/data/"


def test_spatialite_poly_matches_shapefile_twin():
    t = read_spatialite(DATA + "sqlite/poly_spatialite.sqlite")
    s = read_shapefile(DATA + "poly.shp")
    assert t.num_rows == 10
    assert t["eas_id"].to_pylist() == \
        [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]
    bb1 = W.wkb_bbox_many(t["wkb"].to_pylist())
    bb2 = W.wkb_bbox_many(s["wkb"].to_pylist())
    for a, b in zip(bb1, bb2):
        assert np.allclose(a, b)
    # ring vertices decode exactly (v2.4 fixture is compressed —
    # delta-accumulated float32 — but start/end vertices are full
    # doubles and poly.shp vertices are the ground truth)
    for wkb_a, wkb_b in zip(t["wkb"].to_pylist(),
                            s["wkb"].to_pylist()):
        _, ca = W.parse_wkb(wkb_a)
        _, cb = W.parse_wkb(wkb_b)
        assert np.allclose(ca, cb, atol=1e-3)


def test_spatialite_v4_uncompressed():
    t = read_spatialite(DATA + "sqlite/poly_spatialite4.sqlite")
    s = read_shapefile(DATA + "poly.shp")
    assert t.num_rows == 10
    _, ca = W.parse_wkb(t["wkb"][0].as_py())
    _, cb = W.parse_wkb(s["wkb"][0].as_py())
    assert np.allclose(ca, cb)


def test_spatialite_null_geometry():
    # ogr_sqlite first_geometry_null.db: NULL geometry rows survive
    t = read_spatialite(DATA + "sqlite/first_geometry_null.db")
    assert t.num_rows == 2
    assert t["wkb"][0].as_py() is None
