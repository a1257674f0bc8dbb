"""GeoJSON IO — parity vs the reference's own fixtures and published
expectations (``autotest/ogr/ogr_geojson.py``)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from raydal.geo import wkb as W
from raydal.io.geojson import (geojson_to_wkb, read_geojson,
                               wkb_to_geojson, write_geojson)

GJ = "/root/reference/autotest/ogr/data/geojson/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(GJ), reason="reference fixtures not present")


@needs_fixtures
class TestReferenceFixtures:
    def test_sparse_fields_published_order(self):
        # autotest/ogr/ogr_geojson.py::test_ogr_geojson_sparse_fields
        t = read_geojson(GJ + "sparse_fields.geojson")
        names = [c for c in t.column_names if c not in ("fid", "wkb")]
        assert names == ["C", "B", "A", "D", "E_prev", "E", "E_next",
                         "F", "X"]

    def test_bare_features_document(self):
        # test_ogr_geojson_67 (#7198): {"features":[...]} with no "type"
        t = read_geojson(GJ + "grenada.geojson")
        assert t.num_rows == 1
        assert W.wkb_geom_type(t["wkb"][0].as_py()) == W.MULTIPOLYGON

    @pytest.mark.parametrize("fn,expected", [
        ("point.geojson", W.POINT),
        ("linestring.geojson", W.LINESTRING),
        ("polygon.geojson", W.POLYGON),
        ("multipoint.geojson", W.MULTIPOINT),
        ("multilinestring.geojson", W.MULTILINESTRING),
        ("multipolygon.geojson", W.MULTIPOLYGON),
        ("geometrycollection.geojson", W.GEOMETRYCOLLECTION),
    ])
    def test_all_geometry_types_round_trip(self, fn, expected):
        t = read_geojson(GJ + fn)
        buf = t["wkb"][0].as_py()
        assert W.wkb_geom_type(buf) == expected
        # wkb → geojson → wkb is byte-identical
        assert geojson_to_wkb(wkb_to_geojson(buf)) == buf

    def test_point_coordinates(self):
        t = read_geojson(GJ + "point.geojson")
        _, payload = W.parse_wkb(t["wkb"][0].as_py())
        np.testing.assert_allclose(np.asarray(payload)[0], [100.0, 0.0])

    def test_pointz_drops_z(self):
        t = read_geojson(GJ + "pointz.json")
        assert W.wkb_geom_type(t["wkb"][0].as_py()) == W.POINT

    def test_null_values_and_properties(self):
        t = read_geojson(GJ + "nullvalues.geojson")
        assert t.num_rows >= 1  # null-typed fields don't crash typing


class TestRoundTrip:
    def test_write_read_types_and_nulls(self, tmp_path):
        import pyarrow as pa

        t = pa.Table.from_pydict({
            "fid": pa.array([0, 1], pa.int64()),
            "name": pa.array(["a", None], pa.string()),
            "n": pa.array([3, None], pa.int64()),
            "x": pa.array([1.5, 2.5], pa.float64()),
            "wkb": pa.array([W.point_wkb(1, 2), None], pa.binary()),
        })
        path = str(tmp_path / "t.geojson")
        write_geojson(t, path)
        back = read_geojson(path)
        assert back.num_rows == 2
        assert back["wkb"][1].as_py() is None
        assert back["wkb"][0].as_py() == W.point_wkb(1, 2)
        doc = json.loads(open(path).read())
        assert doc["type"] == "FeatureCollection"
        assert doc["features"][0]["properties"]["n"] == 3

    def test_field_order_cycle_edges_skipped(self):
        # attempted cycle A→B→A collapses to first-seen topology
        src = json.dumps({"type": "FeatureCollection", "features": [
            {"type": "Feature", "geometry": None,
             "properties": {"A": 1, "B": 2}},
            {"type": "Feature", "geometry": None,
             "properties": {"B": 1, "A": 2}},
        ]})
        t = read_geojson(src)
        names = [c for c in t.column_names if c not in ("fid", "wkb")]
        assert names == ["A", "B"]

    def test_source_sink_registry(self, ray_session, tmp_path):
        from raydal.pipeline import open_source, write_sink

        src = json.dumps({"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"v": i},
             "geometry": {"type": "Point", "coordinates": [i, -i]}}
            for i in range(5)]})
        p1 = str(tmp_path / "in.geojson")
        open(p1, "w").write(src)
        ds = open_source("geojson", p1)
        assert ds.count() == 5
        p2 = str(tmp_path / "out.geojson")
        write_sink("geojson", ds, p2)
        assert read_geojson(p2).num_rows == 5


@needs_fixtures
def test_scalar_type_promotion_matrix():
    """OGR's field promotion ladder (published fixture pair
    test_type_promotion.json / _ref.json, ogr_geojson.py:3178+): bool →
    int → real → string for the scalar cells; promoted values follow the
    _ref serialization (true → 1 into int, "true" into string)."""
    import pyarrow as pa

    t = read_geojson(GJ + "test_type_promotion.json")
    got = {f.name: f.type for f in t.schema}
    assert got["bool_then_bool"] == pa.bool_()
    assert got["bool_then_int"] == pa.int64()
    assert got["bool_then_real"] == pa.float64()
    assert got["bool_then_string"] == pa.string()
    assert got["int_then_real"] == pa.float64()
    assert got["int_then_string"] == pa.string()
    assert got["real_then_int"] == pa.float64()   # real never narrows
    assert got["string_then_int"] == pa.string()
    assert t["bool_then_int"].to_pylist()[0] == 1
    assert t["bool_then_string"].to_pylist()[0] == "true"
