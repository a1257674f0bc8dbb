"""FlatGeobuf reader vs the reference's published expectations
(autotest/ogr/ogr_flatgeobuf.py) — extent, spatial-filter counts via
the packed Hilbert R-tree index, the full column-type matrix, and
cross-format parity with the shapefile reader on the same layer."""

from __future__ import annotations

import numpy as np
import pytest

from raydal.geo import wkb as W
from raydal.io.flatgeobuf import read_flatgeobuf

FGB = "/root/reference/autotest/ogr/data/testfgb/"


class TestPolyGoldens:
    def test_feature_count_and_published_extent(self):
        """ogr_flatgeobuf.py:135-139: 10 features, extent
        (478315.53125, 481645.3125, 4762880.5, 4765610.5)."""
        t = read_flatgeobuf(FGB + "poly.fgb")
        assert t.num_rows == 10
        bb = np.array([W.wkb_bbox(b) for b in t["wkb"].to_pylist()])
        assert (bb[:, 0].min(), bb[:, 2].max(),
                bb[:, 1].min(), bb[:, 3].max()) == (
            478315.53125, 481645.3125, 4762880.5, 4765610.5)

    @pytest.mark.parametrize("bbox,want", [
        ((478315.531250, 4762880.5, 481645.3125, 4765610.5), 10),
        ((878315.531250, 4762880.5, 881645.3125, 4765610.5), 0),
        # published non-GEOS (bbox-semantics) count (ogr_flatgeobuf
        # .py:158-162)
        ((479586.0, 4764618.6, 479808.2, 4764797.8), 5),
    ])
    def test_spatial_filter_counts_via_index(self, bbox, want):
        assert read_flatgeobuf(FGB + "poly.fgb",
                               bbox=bbox).num_rows == want

    def test_no_index_variant_scan_fallback(self):
        """poly_no_index.fgb: same layer without the packed R-tree —
        full counts and post-decode bbox filtering must agree."""
        t = read_flatgeobuf(FGB + "poly_no_index.fgb")
        assert t.num_rows == 10
        got = read_flatgeobuf(
            FGB + "poly_no_index.fgb",
            bbox=(479586.0, 4764618.6, 479808.2, 4764797.8)).num_rows
        assert got == 5

    def test_parity_with_shapefile_reader(self):
        """poly.fgb is the reference's conversion of poly.shp; the two
        readers must agree on attributes and per-feature bboxes
        (multiset — fgb is Hilbert-sorted by design)."""
        from raydal.io.shapefile import read_shapefile

        t = read_flatgeobuf(FGB + "poly.fgb")
        s = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        assert sorted(t["EAS_ID"].to_pylist()) == sorted(
            s["EAS_ID"].to_pylist())
        assert sorted(t["PRFEDEA"].to_pylist()) == sorted(
            s["PRFEDEA"].to_pylist())
        fb = sorted(tuple(W.wkb_bbox(b)) for b in t["wkb"].to_pylist())
        sb = sorted(tuple(W.wkb_bbox(b)) for b in s["wkb"].to_pylist())
        assert fb == sb

    def test_index_filter_equals_scan_filter(self):
        """Index-driven selection must match brute-force post-decode
        filtering on arbitrary windows."""
        full = read_flatgeobuf(FGB + "poly.fgb")
        boxes = np.array([W.wkb_bbox(b)
                          for b in full["wkb"].to_pylist()])
        for bbox in [(479000, 4763000, 480000, 4764500),
                     (480500, 4765000, 481700, 4765700),
                     (478315.0, 4762880.0, 478400.0, 4763000.0)]:
            want = int(np.count_nonzero(
                ~((boxes[:, 2] < bbox[0]) | (boxes[:, 3] < bbox[1])
                  | (boxes[:, 0] > bbox[2]) | (boxes[:, 1] > bbox[3]))))
            got = read_flatgeobuf(FGB + "poly.fgb",
                                  bbox=bbox).num_rows
            assert got == want, bbox


class TestDatatypes:
    def test_testdatatypes_published_values(self):
        """ogr_flatgeobuf.py:383-391."""
        d = read_flatgeobuf(FGB + "testdatatypes.fgb")
        assert d["int"][0].as_py() == 1
        assert d["int64"][0].as_py() == 1234567890123
        assert d["double"][0].as_py() == 1.25
        assert d["string"][0].as_py() == "my string"

    def test_alldatatypes_published_values(self):
        """ogr_flatgeobuf.py:393-411: every ColumnType."""
        a = read_flatgeobuf(FGB + "alldatatypes.fgb")
        r = {c: a[c][0].as_py() for c in a.schema.names
             if c not in ("fid", "wkb")}
        assert r["byte"] == -1 and r["ubyte"] == 255
        assert r["bool"] is True
        assert r["short"] == -1 and r["ushort"] == 65535
        assert r["int"] == -1 and r["uint"] == 4294967295
        assert r["long"] == -1 and r["ulong"] == 2 ** 64 - 1
        assert r["float"] == 0.0 and r["double"] == 0.0
        assert r["string"] == "X" and r["json"] == "X"
        assert r["binary"] == b"\x58"
        assert r["datetime"] == "2020-02-29T12:34:56Z"

    def test_single_item_index_has_root_level(self):
        """numItems=1 still allocates a parent node (the reference's
        do-while in generateLevelBounds) — alldatatypes.fgb regression
        anchor for the tree-size computation."""
        from raydal.io.flatgeobuf import _tree_size

        assert _tree_size(1, 16) == 80           # 1 leaf + 1 root
        assert _tree_size(10, 16) == 440         # 10 leaves + 1 root
        assert _tree_size(0, 16) == 0


class TestSource:
    def test_registered_pipeline_source(self, ray_session):
        from raydal.pipeline import open_source

        ds = open_source("flatgeobuf", FGB + "poly.fgb")
        assert ds.count() == 10
        ds2 = open_source("flatgeobuf", FGB + "poly.fgb",
                          bbox=(479586.0, 4764618.6,
                                479808.2, 4764797.8))
        assert ds2.count() == 5


class TestWriter:
    """write_flatgeobuf → re-read round-trips (writer shape:
    ogrflatgeobuflayer.cpp + packedrtree.cpp hilbertSort/bulk-build)."""

    def test_poly_shp_round_trip(self, tmp_path):
        from raydal.io.flatgeobuf import write_flatgeobuf
        from raydal.io.shapefile import read_shapefile

        s = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        p = str(tmp_path / "rt.fgb")
        write_flatgeobuf(s, p, layer="poly")
        t = read_flatgeobuf(p)
        assert t.num_rows == 10
        assert sorted(t["EAS_ID"].to_pylist()) == sorted(
            s["EAS_ID"].to_pylist())
        fb = sorted(tuple(W.wkb_bbox(b)) for b in t["wkb"].to_pylist())
        sb = sorted(tuple(W.wkb_bbox(b)) for b in s["wkb"].to_pylist())
        assert fb == sb
        # our index answers the published 5-hit window
        assert read_flatgeobuf(
            p, bbox=(479586.0, 4764618.6,
                     479808.2, 4764797.8)).num_rows == 5

    def test_multilevel_index_filter_exact(self, tmp_path):
        """1000 points → 3-level packed tree; index-filtered reads
        must equal brute-force membership on arbitrary windows."""
        import pyarrow as pa

        from raydal.io.flatgeobuf import write_flatgeobuf

        rng = np.random.default_rng(11)
        xy = rng.uniform(0, 100, (1000, 2))
        t = pa.table({
            "wkb": pa.array([W.point_wkb(x, y) for x, y in xy],
                            pa.binary()),
            "v": pa.array(rng.integers(0, 1000, 1000))})
        p = str(tmp_path / "pts.fgb")
        write_flatgeobuf(t, p)
        assert read_flatgeobuf(p).num_rows == 1000
        for bbox in [(10, 10, 20, 20), (0, 0, 100, 100),
                     (99.5, 99.5, 100, 100), (200, 200, 300, 300)]:
            want = int(np.count_nonzero(
                (xy[:, 0] >= bbox[0]) & (xy[:, 0] <= bbox[2])
                & (xy[:, 1] >= bbox[1]) & (xy[:, 1] <= bbox[3])))
            assert read_flatgeobuf(p, bbox=bbox).num_rows == want

    def test_all_geometry_types_round_trip(self, tmp_path):
        import pyarrow as pa

        from raydal.io.flatgeobuf import write_flatgeobuf
        from raydal.io.wkt import wkt_to_wkb

        wkts = [
            "POINT (1 2)",
            "LINESTRING (0 0,1 1,2 0)",
            "POLYGON ((0 0,10 0,10 10,0 10,0 0),"
            "(2 2,2 4,4 4,4 2,2 2))",
            "MULTIPOINT (0 0,10 20,5 5)",
            "MULTILINESTRING ((0 0,1 1),(5 5,6 7,8 8))",
            "MULTIPOLYGON (((0 0,4 0,4 4,0 4,0 0)),"
            "((10 10,14 10,14 14,10 14,10 10)))"]
        for w in wkts:
            t = pa.table({"wkb": pa.array([wkt_to_wkb(w)], pa.binary()),
                          "tag": pa.array([1])})
            p = str(tmp_path / "g.fgb")
            from raydal.io.flatgeobuf import write_flatgeobuf

            write_flatgeobuf(t, p)
            back = read_flatgeobuf(p)["wkb"][0].as_py()
            va = np.vstack(list(W._iter_coord_arrays(
                W.parse_wkb(wkt_to_wkb(w)))))
            vb = np.vstack(list(W._iter_coord_arrays(
                W.parse_wkb(back))))
            assert np.array_equal(va, vb), w

    def test_property_types_bit_exact(self, tmp_path):
        import pyarrow as pa

        from raydal.io.flatgeobuf import write_flatgeobuf

        t = pa.table({
            "wkb": pa.array([W.point_wkb(float(i), 0.0)
                             for i in range(4)], pa.binary()),
            "i": pa.array([1, -1, 2 ** 62, None], pa.int64()),
            "f": pa.array([0.1 + 0.2, -1e300, 0.0, None], pa.float64()),
            "s": pa.array(["a", "", "héllo", None]),
            "flag": pa.array([True, False, None, True]),
            "blob": pa.array([b"\x00\xff", b"", None, b"x"],
                             pa.binary())})
        p = str(tmp_path / "attrs.fgb")
        write_flatgeobuf(t, p)
        back = read_flatgeobuf(p)
        # fgb is hilbert-sorted: re-align on x coordinate
        order = np.argsort([W.wkb_bbox(b)[0]
                            for b in back["wkb"].to_pylist()])
        for col in ("i", "f", "s", "flag", "blob"):
            got = [back[col][int(j)].as_py() for j in order]
            want = t[col].to_pylist()
            # absent (None) properties read back as None
            assert got == want, col

    def test_sink_registered(self, ray_session, tmp_path):
        from raydal.pipeline import open_source, write_sink

        ds = open_source(
            "shapefile", "/root/reference/autotest/ogr/data/poly.shp")
        p = str(tmp_path / "sink.fgb")
        write_sink("flatgeobuf", ds, p, layer="poly")
        assert open_source("flatgeobuf", p).count() == 10
