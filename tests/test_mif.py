"""MapInfo MIF/MID driver vs the reference's shipped golden CSV
(``autotest/ogr/data/mitab/all_geoms.mif.golden.csv``) and field
fixtures (all_possible_fields.mif/.mid)."""

import csv
import re

import numpy as np
import pyarrow as pa
import pytest

from raydal.io.mif import read_mif, write_mif
from raydal.io.shapefile import read_shapefile
from raydal.io.wkt import wkb_to_wkt, wkt_to_wkb

MITAB = "/root/reference/autotest/ogr/data/mitab/"
OGR = "/root/reference/autotest/ogr/data/"


def _flat(wkb):
    w = wkb_to_wkt(wkb, precision=15)
    nums = np.array(re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", w),
                    float)
    return w.split(" ", 1)[0], nums


def test_all_geoms_golden_csv():
    # every geometry type incl. the 181-point arc, 180-segment
    # ellipse and 45-segment round-rect corners, against the
    # reference's own published WKT goldens
    t = read_mif(MITAB + "all_geoms.mif")
    gold = list(csv.DictReader(open(MITAB +
                                    "all_geoms.mif.golden.csv")))
    assert t.num_rows == len(gold) == 16
    for i, g in enumerate(gold):
        h1, n1 = _flat(t["wkb"][i].as_py())
        h2, n2 = _flat(wkt_to_wkb(g["WKT"]))
        assert h1 == h2, i
        assert len(n1) == len(n2), i
        assert np.allclose(n1, n2, atol=1e-12, rtol=1e-12), i


def test_all_possible_fields():
    t = read_mif(MITAB + "all_possible_fields.mif")
    r = {n: t[n][0].as_py() for n in t.schema.names}
    assert r["field1"] == "test" and r["Field2"] == 120
    assert r["Field3"] == 12345
    assert r["Field4"] == 123456789012345      # LargeInt
    assert r["Field5"] == 12.34 and r["Field6"] == 12.34
    assert r["Field7"] == "20221231"           # Date as text
    assert r["Field10"] is True                # Logical
    assert t["Field10"][1].as_py() is False
    assert t["wkb"][0].as_py() is None         # 'none' geometry


def test_empty_first_field_with_tab_delimiter():
    t = read_mif(MITAB + "empty_first_field_with_tab_delimiter.mif")
    assert t.num_rows >= 1


def test_poly_roundtrip(tmp_path):
    shp = read_shapefile(OGR + "poly.shp")
    p = str(tmp_path / "tpoly.mif")
    write_mif(shp, p)
    rt = read_mif(p)
    assert rt.num_rows == 10
    eas = [v for v in rt["EAS_ID"].to_pylist() if v < 170]
    assert eas == [168, 169, 166, 158, 165]
    for i in range(10):
        assert wkb_to_wkt(shp["wkb"][i].as_py(), precision=9) == \
            wkb_to_wkt(rt["wkb"][i].as_py(), precision=9)
        assert shp["PRFEDEA"][i].as_py() == rt["PRFEDEA"][i].as_py()


def test_multigeometry_roundtrip(tmp_path):
    wkts = ["MULTIPOLYGON (((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,"
            "1 1)),((8 8,9 8,9 9,8 8)))",
            "MULTILINESTRING ((0 0,1 1),(2 2,3 3))",
            "MULTIPOINT (5 5,6 6)",
            "POINT (7 7)", None]
    t = pa.table({
        "fid": pa.array(range(5), pa.int64()),
        "wkb": pa.array([None if w is None else wkt_to_wkb(w)
                         for w in wkts], pa.binary()),
        "flag": pa.array([True, False, True, False, None], pa.bool_()),
        "name": pa.array(["a", "b", "c", "d", "e"], pa.string())})
    p = str(tmp_path / "multi.mif")
    write_mif(t, p)
    rt = read_mif(p)
    for i, w in enumerate(wkts):
        got = rt["wkb"][i].as_py()
        if w is None:
            assert got is None
        else:
            assert wkb_to_wkt(got, precision=12) == w
    assert rt["flag"].to_pylist()[:4] == [True, False, True, False]
    assert rt["name"].to_pylist() == ["a", "b", "c", "d", "e"]


def test_ray_registry(ray_session, tmp_path):
    from raydal.pipeline import SINK_REGISTRY, SOURCE_REGISTRY

    ds = SOURCE_REGISTRY["mif"](MITAB + "all_geoms.mif")
    assert ds.count() == 16
    shp_ds = SOURCE_REGISTRY["shapefile"](OGR + "poly.shp") \
        if "shapefile" in SOURCE_REGISTRY else None
    p = str(tmp_path / "rt.mif")
    SINK_REGISTRY["mif"](SOURCE_REGISTRY["mif"](MITAB +
                                                "all_geoms.mif"), p)
    rt = read_mif(p)
    assert rt.num_rows == 16
