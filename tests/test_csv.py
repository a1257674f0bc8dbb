"""CSV vector driver vs the reference's own fixtures
(``autotest/ogr/data/csv/``, ``autotest/ogr/ogr_csv.py`` behaviors)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from raydal.geo.wkb import POLYGON, wkb_geom_type, point_wkb
from raydal.io.csv import read_csv_features, write_csv_features

D = "/root/reference/autotest/ogr/data/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference fixtures not present")


@needs_fixtures
class TestReferenceFixtures:
    def test_csvt_sidecar_types(self):
        t = read_csv_features(D + "csv/testcsvt.csv")
        got = {f.name: f.type for f in t.schema}
        assert got["INTCOL"] == pa.int64()
        assert got["REALCOL"] == pa.float64()
        assert got["STRINGCOL"] == pa.string()
        assert got["DATETIME"] == pa.timestamp("us")
        assert got["DATE"] == pa.date32()
        assert t["INTCOL"][0].as_py() == 12
        assert t["REALCOL"][0].as_py() == 5.7

    def test_wkt_geometry_column(self):
        t = read_csv_features(D + "wkt.csv")
        assert "wkb" in t.column_names and "WKT" not in t.column_names
        assert all(wkb_geom_type(b) == POLYGON
                   for b in t["wkb"].to_pylist())

    def test_tsv_delimiter_sniffing(self):
        t = read_csv_features(D + "csv/test_eurostat.tsv")
        assert len(t.column_names) > 1

    def test_autodetect_promotes_and_demotes(self):
        t = read_csv_features(D + "csv/testtypeautodetect.csv",
                              autodetect_types=True)
        got = {f.name: f.type for f in t.schema}
        assert got["real1"] == pa.float64()
        # later non-numeric rows demote to string (full scan)
        assert got["int1"] == pa.string()

    def test_utf8_bom(self):
        t = read_csv_features(D + "csv/csv_with_utf8_bom.csv")
        assert not t.column_names[0].startswith("﻿")


class TestRoundTripAndPoints:
    def test_xy_point_building(self, tmp_path):
        p = str(tmp_path / "pts.csv")
        open(p, "w").write("id,lon,lat\n1,10.5,-3.25\n2,,\n")
        t = read_csv_features(p)
        assert t["wkb"][0].as_py() == point_wkb(10.5, -3.25)
        assert t["wkb"][1].as_py() is None

    def test_write_read_round_trip(self, tmp_path):
        t = pa.Table.from_pydict({
            "id": pa.array([1, 2], pa.int64()),
            "name": pa.array(["a", None], pa.string()),
            "wkb": pa.array([point_wkb(1, 2), point_wkb(3, 4)],
                            pa.binary())})
        p = str(tmp_path / "rt.csv")
        write_csv_features(t, p, write_csvt=True)
        back = read_csv_features(p)
        assert back["wkb"].to_pylist() == t["wkb"].to_pylist()
        assert back["id"].to_pylist() == [1, 2]   # csvt preserves int64

    def test_source_sink_registry(self, ray_session, tmp_path):
        from raydal.pipeline import open_source, write_sink

        p1 = str(tmp_path / "in.csv")
        open(p1, "w").write(
            "id,WKT\n1,\"POINT (1 2)\"\n2,\"POINT (3 4)\"\n")
        ds = open_source("csv", p1)
        assert ds.count() == 2
        p2 = str(tmp_path / "out.csv")
        write_sink("csv", ds, p2)
        assert read_csv_features(p2).num_rows == 2
