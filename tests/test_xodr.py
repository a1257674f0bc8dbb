"""OpenDRIVE reader vs the reference's published expectations
(autotest/ogr/ogr_xodr.py over the 5G Living Lab A39 fixture)."""

import os
import struct

import numpy as np
import pytest

from raydal.io.xodr import read_xodr

P = ("/root/reference/autotest/ogr/data/xodr/"
     "5g_living_lab_A39_Wolfsburg-West.xodr")

need_ref = pytest.mark.skipif(not os.path.exists(P),
                              reason="reference fixtures not available")


def _line_pts(wkb):
    n = struct.unpack_from("<I", wkb, 5)[0]
    return np.array([struct.unpack_from("<3d", wkb, 9 + 24 * i)
                     for i in range(n)])


@need_ref
class TestXODR:
    @pytest.fixture(scope="class")
    def layers(self):
        return read_xodr(P)

    def test_layer_counts(self, layers):
        # published: 41 roads, 230 lane borders, 174 lanes,
        # 273 road objects, 50 signals
        assert layers["ReferenceLine"].num_rows == 41
        assert layers["LaneBorder"].num_rows == 230
        assert layers["Lane"].num_rows == 174
        assert layers["RoadObject"].num_rows == 273
        assert layers["RoadSignal"].num_rows == 50

    def test_schemas(self, layers):
        ref = layers["ReferenceLine"]
        assert [f for f in ref.column_names if f != "wkb"] == \
            ["ID", "Length", "Junction"]
        assert str(ref.schema.field("Length").type) == "double"
        lb = layers["LaneBorder"]
        assert [f for f in lb.column_names if f != "wkb"] == \
            ["ID", "RoadID", "Type", "Predecessor", "Successor"]
        assert str(lb.schema.field("ID").type) == "int32"
        lane = layers["Lane"]
        assert [f for f in lane.column_names if f != "wkb"] == \
            ["LaneID", "RoadID", "Type", "Predecessor", "Successor"]
        ro = layers["RoadObject"]
        assert [f for f in ro.column_names if f != "wkb"] == \
            ["ObjectID", "RoadID", "Type", "Name"]
        rs = layers["RoadSignal"]
        assert len([f for f in rs.column_names if f != "wkb"]) == 10

    def test_spatial_ref(self, layers):
        assert layers["ReferenceLine"].schema.metadata[
            b"proj4"].decode() == (
            "+proj=utm +zone=32 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 "
            "+units=m +no_defs")

    def test_first_reference_line_endpoints_exact(self, layers):
        # feature order follows lexicographic road ids; the published
        # eps=1.0 WKT's first/last vertices are analytic evaluations
        r = layers["ReferenceLine"].to_pylist()[0]
        assert r["ID"] == "2233498"
        pts = _line_pts(r["wkb"])
        assert pts[0] == pytest.approx(
            (618251.572934302, 5809506.96459625, 102.378603962182),
            abs=1e-7)
        assert pts[-1] == pytest.approx(
            (618258.290734177, 5809506.56065761, 102.363999939623),
            abs=1e-7)

    def test_eps_deviation_contract(self, layers):
        # our adaptive subdivision keeps the <= eps linear-deviation
        # contract against the published eps=0.1 vertex list
        published = np.array([
            (618251.572934302, 5809506.96459625, 102.378603962182),
            (618254.944363001, 5809506.95481165, 102.371268481462),
            (618257.937110798, 5809506.62607284, 102.364759846201),
            (618258.290734177, 5809506.56065761, 102.363999939623)])
        r = read_xodr(P, eps=0.1)["ReferenceLine"].to_pylist()[0]
        pts = _line_pts(r["wkb"])
        # every published vertex lies within eps of our polyline
        for p in published:
            d = np.min(np.linalg.norm(pts[:, :2] - p[:2], axis=1))
            seg_min = d
            for a, b in zip(pts[:-1, :2], pts[1:, :2]):
                ab = b - a
                tproj = np.clip(np.dot(p[:2] - a, ab)
                                / max(np.dot(ab, ab), 1e-12), 0, 1)
                seg_min = min(seg_min,
                              np.linalg.norm(a + tproj * ab - p[:2]))
            assert seg_min <= 0.1 + 1e-6

    def test_lane_border_geometry(self, layers):
        lb = layers["LaneBorder"].to_pylist()
        r = [x for x in lb if x["RoadID"] == "2233498"]
        assert len(r) >= 2
        for x in r:
            pts = _line_pts(x["wkb"])
            assert len(pts) >= 2
        ids = sorted(set(x["ID"] for x in r))
        assert 0 in ids                       # center border included

    def test_lane_polygons(self, layers):
        lane = layers["Lane"].to_pylist()
        assert all(x["LaneID"] != 0 for x in lane)
        first = lane[0]
        assert first["wkb"][0:1] == b"\x01"
