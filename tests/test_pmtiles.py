"""MVT tile codec + PMTiles v3 archive — parity vs the reference's
published expectations (``autotest/ogr/ogr_mvt.py``,
``autotest/ogr/ogr_pmtiles.py``) plus write→read round-trips and the
tile-parallel Ray source."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo.wkb import _iter_coord_arrays, parse_wkb
from raydal.io.mvt import (decode_mvt, encode_mvt, feature_wkb,
                           mvt_layer_tables, tile_to_3857)
from raydal.io.pmtiles import (PMTilesReader, read_pmtiles,
                               read_pmtiles_tiles, tileid_to_zxy,
                               write_pmtiles, write_pmtiles_dataset,
                               write_pmtiles_features, zxy_to_tileid)

MVT = "/root/reference/autotest/ogr/data/mvt/"
PMT = "/root/reference/autotest/ogr/data/pmtiles/"

needs_mvt = pytest.mark.skipif(not os.path.isdir(MVT),
                               reason="reference fixtures not present")
needs_pmt = pytest.mark.skipif(not os.path.isdir(PMT),
                               reason="reference fixtures not present")


def _load_pbf(path):
    raw = open(path, "rb").read()
    return gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw


def _coords(wkb):
    return np.vstack(list(_iter_coord_arrays(parse_wkb(wkb))))


# ------------------------------------------------------------- tile ids

class TestTileIds:
    def test_zoom_bases(self):
        # cumulative pyramid base (4^z - 1) / 3
        assert zxy_to_tileid(0, 0, 0) == 0
        assert zxy_to_tileid(1, 0, 0) == 1
        assert zxy_to_tileid(2, 0, 0) == 5
        assert zxy_to_tileid(3, 0, 0) == 21

    def test_roundtrip(self):
        for z in (0, 1, 3, 7, 12):
            n = 1 << z
            for x, y in [(0, 0), (n - 1, 0), (0, n - 1),
                         (n - 1, n - 1), (n // 2, n // 3)]:
                tid = zxy_to_tileid(z, x, y)
                assert tileid_to_zxy(tid) == (z, x, y)

    def test_hilbert_is_bijective_z3(self):
        ids = {zxy_to_tileid(3, x, y)
               for x in range(8) for y in range(8)}
        assert ids == set(range(21, 21 + 64))


# ------------------------------------------------------------ MVT codec

class TestMVTCodec:
    def test_value_types_roundtrip(self):
        tags = {"b_t": True, "b_f": False, "i_pos": 7,
                "i_neg": -123456789012345, "f": 2.5, "s": "héllo"}
        tile = encode_mvt([{
            "name": "L", "extent": 4096, "version": 2,
            "features": [{"id": 42, "type": 1, "tags": tags,
                          "parts": [np.array([[10, 20]])]}]}])
        L = decode_mvt(tile)[0]
        assert L["name"] == "L" and L["extent"] == 4096
        f = L["features"][0]
        assert f["id"] == 42
        assert f["tags"] == tags
        assert f["tags"]["b_t"] is True

    def test_geometry_roundtrip_multipart(self):
        line1 = np.array([[0, 0], [100, 50], [100, 200]])
        line2 = np.array([[500, 500], [400, 600]])
        tile = encode_mvt([{
            "name": "g", "extent": 4096, "version": 2,
            "features": [{"id": 1, "type": 2, "tags": {},
                          "parts": [line1, line2]}]}])
        f = decode_mvt(tile)[0]["features"][0]
        assert len(f["parts"]) == 2
        np.testing.assert_array_equal(f["parts"][0], line1)
        np.testing.assert_array_equal(f["parts"][1], line2)

    def test_polygon_close_path(self):
        ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
        tile = encode_mvt([{
            "name": "p", "extent": 256, "version": 2,
            "features": [{"id": 1, "type": 3, "tags": {},
                          "parts": [ring]}]}])
        f = decode_mvt(tile)[0]["features"][0]
        part = f["parts"][0]
        assert len(part) == 5                   # ClosePath repeats v0
        np.testing.assert_array_equal(part[-1], part[0])
        assert f["closed"] == [True]

    def test_polygon_hole_grouping(self):
        # exterior = positive shoelace in tile space, hole = negative
        ext = np.array([[0, 0], [100, 0], [100, 100], [0, 100]])
        hole = np.array([[20, 20], [20, 40], [40, 40], [40, 20]])
        tile = encode_mvt([{
            "name": "p", "extent": 4096, "version": 2,
            "features": [{"id": 1, "type": 3, "tags": {},
                          "parts": [ext, hole]}]}])
        f = decode_mvt(tile)[0]["features"][0]
        wkb, g = feature_wkb(f, 0, 0, 0, 4096)
        assert g == "MULTIPOLYGON"
        base, polys = parse_wkb(wkb)
        assert base == 6 and len(polys) == 1   # ONE poly, two rings
        arrs = list(_iter_coord_arrays((base, polys)))
        assert len(arrs) == 2

    def test_tile_georef_z0_corners(self):
        E = 20037508.342789244
        pts = np.array([[0, 0], [4096, 4096]])
        out = tile_to_3857(pts, 0, 0, 0, 4096)
        np.testing.assert_allclose(out[0], [-E, E])
        np.testing.assert_allclose(out[1], [E, -E])


@needs_mvt
class TestMVTReferenceGoldens:
    def test_datatypes(self):
        # autotest/ogr/ogr_mvt.py:35 published field values
        L = decode_mvt(_load_pbf(MVT + "datatypes/0/0/0.pbf"))[0]
        t = L["features"][0]["tags"]
        assert t["bool_true"] is True and t["bool_false"] is False
        assert t["pos_int_value"] == 1
        assert t["pos_int64_value"] == 123456789012345
        assert t["neg_int_value"] == -1
        assert t["neg_int64_value"] == -123456789012345
        assert t["pos_sint_value"] == 1
        assert t["neg_sint64_value"] == -123456789012345
        assert t["uint_value"] == 2000000000
        assert t["uint64_value"] == 4000000000
        assert t["float_value"] == 1.25
        assert t["real_value"] == 1.23456789
        assert t["string_value"] == "str"

    def test_linestring(self):
        # ogr_mvt.py:205 published MULTILINESTRING coords
        L = decode_mvt(_load_pbf(MVT + "linestring/0/0/0.pbf"))[0]
        wkb, g = feature_wkb(L["features"][0], 0, 0, 0, L["extent"])
        assert g == "MULTILINESTRING"
        np.testing.assert_allclose(
            _coords(wkb),
            [[215246.671651058, 6281289.23636264],
             [332653.947097085, 6447616.20991119]], rtol=1e-12)

    def test_multilinestring(self):
        L = decode_mvt(_load_pbf(MVT +
                                 "multilinestring/0/0/0.pbf"))[0]
        wkb, g = feature_wkb(L["features"][0], 0, 0, 0, L["extent"])
        arrs = list(_iter_coord_arrays(parse_wkb(wkb)))
        assert len(arrs) == 3
        np.testing.assert_allclose(
            arrs[2],
            [[665307.894194175, 6985732.88903883],
             [772931.230019704, 7171627.74182838]], rtol=1e-12)

    def test_polygon(self):
        # ogr_mvt.py:251 — exact ring order preserved
        L = decode_mvt(_load_pbf(MVT + "polygon/0/0/0.pbf"))[0]
        wkb, g = feature_wkb(L["features"][0], 0, 0, 0, L["extent"])
        assert g == "MULTIPOLYGON"
        np.testing.assert_allclose(
            _coords(wkb),
            [[332653.947097085, 6447616.20991119],
             [332653.947097085, 6281289.23636264],
             [215246.671651058, 6281289.23636264],
             [215246.671651058, 6447616.20991119],
             [332653.947097085, 6447616.20991119]], rtol=1e-12)

    def test_point_polygon_ring_grouping(self):
        # ogr_mvt.py:273 — 3 polygons: a concave 9-vertex exterior,
        # then two positive-winding rings that become own polygons
        L = decode_mvt(_load_pbf(MVT + "point_polygon/0/0/0.pbf"))
        poly_layer = [x for x in L if any(
            f["type"] == 3 for f in x["features"])][0]
        f = [f for f in poly_layer["features"] if f["type"] == 3][0]
        wkb, g = feature_wkb(f, 0, 0, 0, poly_layer["extent"])
        parsed = parse_wkb(wkb)
        arrs = list(_iter_coord_arrays(parsed))
        assert len(arrs) == 3
        assert [len(a) for a in arrs] == [9, 5, 5]
        np.testing.assert_allclose(
            arrs[0][0], [440277.282922614, 450061.222543117],
            rtol=1e-12)


# -------------------------------------------------------------- archive

@needs_pmt
class TestPMTilesReferenceGoldens:
    def test_poly_header_and_metadata(self):
        # ogr_pmtiles.py:28 published metadata + extent
        rd = PMTilesReader(PMT + "poly.pmtiles")
        assert (rd.min_zoom, rd.max_zoom) == (0, 5)
        assert rd.tile_type == 1
        md = rd.metadata()
        assert md["name"] == "poly" and md["format"] == "pbf"
        assert md["scheme"] == "tms" and md["type"] == "overlay"
        np.testing.assert_allclose(
            rd.bounds_3857(),
            (304325.6246808182, 308876.1762213128,
             5314763.0069798315, 5318507.966831126), rtol=1e-12)

    def test_poly_features(self):
        # 8 MultiPolygon features at maxzoom; first-feature fields
        t = read_pmtiles(PMT + "poly.pmtiles")
        assert t.num_rows == 8
        assert set(t["geom_type"].to_pylist()) == {"MULTIPOLYGON"}
        i = t["PRFEDEA"].to_pylist().index("35043411")
        assert t["AREA"][i].as_py() == 215229.266
        assert t["EAS_ID"][i].as_py() == 168

    def test_poly_zoom0(self):
        # ogr_pmtiles.py:92 — ZOOM_LEVEL=0 has 1 feature
        assert read_pmtiles(PMT + "poly.pmtiles",
                            zoom_level=0).num_rows == 1

    def test_poly_zoom_invalid(self):
        with pytest.raises(ValueError):
            read_pmtiles(PMT + "poly.pmtiles", zoom_level=6)
        with pytest.raises(ValueError):
            read_pmtiles(PMT + "poly.pmtiles", zoom_level=-1)

    def test_leaf_directories(self):
        # ogr_pmtiles.py test_ogrsf parity: leaf-dir variant reads
        # identically to the flat one
        a = read_pmtiles(PMT + "poly.pmtiles")
        b = read_pmtiles(PMT + "poly_with_leaf_dir.pmtiles")
        assert b.num_rows == a.num_rows
        assert sorted(b["EAS_ID"].to_pylist()) == \
            sorted(a["EAS_ID"].to_pylist())

    def test_run_length_max(self):
        # ogr_pmtiles.py:220 — 2^32 addressed tiles, never expanded
        rd = PMTilesReader(PMT + "run_length_max.pmtiles")
        assert rd.addressed_count() == (1 << 32)
        with pytest.raises(ValueError, match="more than"):
            read_pmtiles(PMT + "run_length_max.pmtiles")

    def test_run_length_max_bbox_counts(self):
        # published spatial-filter counts: 4 at origin, 1 / 64 at
        # the extent corners
        p = PMT + "run_length_max.pmtiles"
        rd = PMTilesReader(p)
        xmin, xmax, ymin, ymax = rd.bounds_3857()
        assert read_pmtiles(p, bbox=(0, 0, 1000, 1000)).num_rows == 4
        for x in (xmin, xmax):
            for y in (ymin, ymax):
                assert read_pmtiles(
                    p, bbox=(x - 500, y - 500,
                             x + 500, y + 500)).num_rows == 1
                assert read_pmtiles(
                    p, bbox=(x - 5000, y - 5000,
                             x + 5000, y + 5000)).num_rows == 64

    def test_france_bbox_prune(self):
        # ne_10m france: a bbox far from France reads nothing
        p = PMT + "ne_10m_admin_0_france.pmtiles"
        far = read_pmtiles(p, bbox=(-2.0e7, -2.0e7,
                                    -1.9e7, -1.9e7))
        assert far.num_rows == 0
        home = read_pmtiles(p, zoom_level=PMTilesReader(p).min_zoom)
        assert home.num_rows >= 1


class TestWriterRoundtrip:
    def _feats(self):
        return {
            (2, 1, 2): [
                {"id": 7, "type": 1, "tags": {"name": "a", "v": 3},
                 "parts": [np.array([[100, 200]])]},
                {"id": 8, "type": 3, "tags": {"v": -2},
                 "parts": [np.array([[0, 0], [50, 0], [50, 50],
                                     [0, 50]])]}],
            (2, 2, 2): [
                {"id": 9, "type": 2, "tags": {"name": "b"},
                 "parts": [np.array([[10, 10], [400, 300]])]}],
        }

    def test_features_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.pmtiles")
        write_pmtiles_features(p, self._feats(), layer="lyr",
                               min_zoom=2, max_zoom=2)
        rd = PMTilesReader(p)
        assert rd.metadata()["format"] == "pbf"
        t = read_pmtiles(p)
        assert t.num_rows == 3
        assert sorted(t["mvt_id"].to_pylist()) == [7, 8, 9]
        assert set(t["layer"].to_pylist()) == {"lyr"}
        i = t["mvt_id"].to_pylist().index(7)
        assert t["name"][i].as_py() == "a"
        assert t["v"][i].as_py() == 3
        # recover tile-local ints through the 3857 inverse
        E = 20037508.342789244
        size = 2 * E / 4
        arr = _coords(t["wkb"][i].as_py())
        u = (arr[0, 0] + E) / size - 1
        v = (E - arr[0, 1]) / size - 2
        assert round(u * 4096) == 100 and round(v * 4096) == 200

    def test_bbox_filter(self, tmp_path):
        p = str(tmp_path / "t.pmtiles")
        write_pmtiles_features(p, self._feats(), min_zoom=2,
                               max_zoom=2)
        E = 20037508.342789244
        size = 2 * E / 4
        # bbox covering only tile (2, 2, 2)'s top-left corner, where
        # feature 9's envelope lives (tile coords 10..400 of 4096)
        bbox = (-E + 2.0 * size, E - 2.2 * size,
                -E + 2.2 * size, E - 2.0 * size)
        t = read_pmtiles(p, bbox=bbox)
        assert t["mvt_id"].to_pylist() == [9]

    def test_dedup_and_run_merge(self, tmp_path):
        # identical payloads stored once; consecutive identical tiles
        # merge into one run-length entry
        tile = encode_mvt([{"name": "x", "extent": 256, "version": 2,
                            "features": [{"id": 1, "type": 1,
                                          "tags": {},
                                          "parts": [np.array(
                                              [[1, 1]])]}]}])
        tiles = {(3, x, y): tile for x in range(8) for y in range(8)}
        p = str(tmp_path / "d.pmtiles")
        write_pmtiles(p, tiles)
        rd = PMTilesReader(p)
        assert rd.n_addressed == 64
        assert rd.n_contents == 1           # one stored payload
        assert rd.n_entries == 1            # hilbert order → one run
        assert rd.addressed_count() == 64
        assert rd.tile_bytes(3, 5, 3) == tile
        assert rd.tile_bytes(3, 0, 0) == tile
        assert rd.tile_bytes(4, 0, 0) is None

    def test_dataset_conversion_path(self, tmp_path):
        # (z, x, y, tile) arrow table → archive → rows back
        tile_a = encode_mvt([{"name": "x", "extent": 256,
                              "version": 2,
                              "features": [{"id": 1, "type": 1,
                                            "tags": {},
                                            "parts": [np.array(
                                                [[1, 2]])]}]}])
        tile_b = encode_mvt([{"name": "x", "extent": 256,
                              "version": 2,
                              "features": [{"id": 2, "type": 1,
                                            "tags": {},
                                            "parts": [np.array(
                                                [[3, 4]])]}]}])
        tbl = pa.table({"z": pa.array([1, 1], pa.int32()),
                        "x": pa.array([0, 1], pa.int32()),
                        "y": pa.array([0, 1], pa.int32()),
                        "tile": pa.array([tile_a, tile_b],
                                         pa.binary())})
        p = str(tmp_path / "c.pmtiles")
        write_pmtiles_dataset(p, tbl)
        back = read_pmtiles_tiles(p)
        assert back.num_rows == 2
        got = dict(zip(zip(back["z"].to_pylist(),
                           back["x"].to_pylist(),
                           back["y"].to_pylist()),
                       back["tile"].to_pylist()))
        assert got[(1, 0, 0)] == tile_a and got[(1, 1, 1)] == tile_b

    def test_bounds_e7_roundtrip(self, tmp_path):
        p = str(tmp_path / "b.pmtiles")
        write_pmtiles(p, {(0, 0, 0): b"x"}, compress_tiles=False,
                      bounds=(-10.5, -20.25, 30.75, 40.0))
        rd = PMTilesReader(p)
        assert rd.min_lon_e7 == -105000000
        assert rd.min_lat_e7 == -202500000
        assert rd.max_lon_e7 == 307500000
        assert rd.max_lat_e7 == 400000000


class TestRaySource:
    def test_pmtiles_source_and_sink(self, ray_session, tmp_path):
        from raydal.pipeline import open_source, write_sink

        feats = {(1, x, y): [{"id": 10 * x + y, "type": 1,
                              "tags": {"x": x},
                              "parts": [np.array([[x * 7, y * 9]])]}]
                 for x in range(2) for y in range(2)}
        p = str(tmp_path / "s.pmtiles")
        write_pmtiles_features(p, feats, min_zoom=1, max_zoom=1)
        ds = open_source("pmtiles", p)
        t = pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow"))
        assert t.num_rows == 4
        assert sorted(t["mvt_id"].to_pylist()) == [0, 1, 10, 11]
        assert set(t.column_names) >= {"tile_z", "tile_x", "tile_y",
                                       "layer", "mvt_id", "wkb",
                                       "geom_type", "tags"}
        import json as _json
        tags = [_json.loads(s) for s in t["tags"].to_pylist()]
        assert {d["x"] for d in tags} == {0, 1}

        # sink: raw tiles → new archive, identical payload set
        import ray.data
        raw = read_pmtiles_tiles(p)
        ds2 = ray.data.from_arrow(raw)
        p2 = str(tmp_path / "s2.pmtiles")
        write_sink("pmtiles", ds2, p2)
        back = read_pmtiles_tiles(p2)
        assert sorted(back["tile"].to_pylist()) == \
            sorted(raw["tile"].to_pylist())
