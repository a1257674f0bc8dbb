"""Clipping kernels + layer algebra with geometry outputs.

Reference semantics: ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-3763
(Intersection/Clip/Erase emit clipped geometries with merged attrs).
"""

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo import clip as C
from raydal.geo.wkb import box_polygon, polygon_wkb, polygons_from_wkb
from raydal.ops.layer_algebra import (MethodLayer, clip_batch, erase_batch,
                                      intersect_batch)


class TestClipKernels:
    def test_rect_rect(self):
        r = C.clip_polygon_rect(box_polygon(0, 0, 10, 10), 5, 5, 20, 20)
        assert C.polygon_area_rings(r) == pytest.approx(25.0)

    def test_disjoint(self):
        assert C.clip_polygon_rect(box_polygon(0, 0, 1, 1), 5, 5, 6, 6) == []

    def test_containment_both_ways(self):
        inner = C.clip_polygon_rect(box_polygon(2, 2, 4, 4), 0, 0, 10, 10)
        assert C.polygon_area_rings(inner) == pytest.approx(4.0)
        outer = C.clip_polygon_rect(box_polygon(0, 0, 10, 10), 2, 2, 4, 4)
        assert C.polygon_area_rings(outer) == pytest.approx(4.0)

    def test_triangle_clip(self):
        tri = [np.array([[0, 0], [10, 0], [0, 10], [0, 0]], float)]
        # clip to x,y <= 8: removes the corner triangle beyond the
        # diagonal — area = 50 - 2*2/2... compute directly: region
        # x+y<=10 within [0,8]^2 → 64 - overlap... easier: exact 48
        r = C.clip_polygon_rect(tri, 0, 0, 8, 8)
        # area of {x,y>=0, x+y<=10, x<=8, y<=8} = 50 - 2*(2*2/2) = 46
        assert C.polygon_area_rings(r) == pytest.approx(46.0)

    def test_holes_subtract(self):
        holed = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                          float),
                 np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)]
        r = C.clip_polygon_rect(holed, 0, 0, 5, 5)
        assert C.polygon_area_rings(r) == pytest.approx(24.0)

    def test_convex_hexagon_clip(self):
        hexr = np.array([[2, 0], [4, 0], [6, 3], [4, 6], [2, 6], [0, 3],
                         [2, 0]], float)
        assert C.is_convex(hexr)
        r = C.sutherland_hodgman(np.array(box_polygon(0, 0, 10, 10)[0]),
                                 hexr)
        assert abs(C.ring_area(r)) == pytest.approx(abs(C.ring_area(hexr)))

    def test_erase_pieces_and_conservation(self):
        sq = box_polygon(0, 0, 10, 10)
        pieces = C.erase_polygon_rect(sq, 4, 4, 6, 6)
        assert len(pieces) == 4
        assert sum(C.polygon_area_rings(p) for p in pieces) == \
            pytest.approx(96.0)
        # A = A∩B + A\B for a partial overlap
        A = box_polygon(0, 0, 7, 7)
        inter = C.polygon_area_rings(C.clip_polygon_rect(A, 5, 5, 9, 9))
        er = sum(C.polygon_area_rings(p)
                 for p in C.erase_polygon_rect(A, 5, 5, 9, 9))
        assert inter + er == pytest.approx(49.0)

    def test_concave_detection(self):
        conc = np.array([[0, 0], [4, 0], [4, 4], [2, 1], [0, 4], [0, 0]],
                        float)
        assert not C.is_convex(conc)


def _feat_table(rects, id_name="feat_id"):
    return pa.Table.from_pydict({
        id_name: pa.array(range(len(rects)), pa.int64()),
        "wkb": pa.array([polygon_wkb(box_polygon(*r)) for r in rects],
                        pa.binary())})


class TestLayerAlgebra:
    def test_intersection_geometry_output(self):
        feats = _feat_table([(0, 0, 4, 4), (10, 10, 12, 12)])
        method = MethodLayer(_feat_table([(2, 2, 6, 6)], "zone_id"))
        out = intersect_batch(feats, method)
        assert out.num_rows == 1
        assert out["area"][0].as_py() == pytest.approx(4.0)
        rings = polygons_from_wkb(out["wkb"][0].as_py())[0]
        xs = rings[0][:, 0]
        ys = rings[0][:, 1]
        assert (xs.min(), ys.min(), xs.max(), ys.max()) == (2, 2, 4, 4)

    def test_clip_multi_method(self):
        feats = _feat_table([(0, 0, 10, 1)])
        method = MethodLayer(_feat_table([(1, 0, 2, 1), (5, 0, 7, 1)],
                                         "zone_id"))
        out = clip_batch(feats, method)
        assert out.num_rows == 1
        assert out["area"][0].as_py() == pytest.approx(3.0)

    def test_erase_sequential(self):
        feats = _feat_table([(0, 0, 10, 10)])
        method = MethodLayer(_feat_table([(0, 0, 5, 10), (5, 0, 7, 10)],
                                         "zone_id"))
        out = erase_batch(feats, method)
        assert out.num_rows == 1
        assert out["area"][0].as_py() == pytest.approx(30.0)

    def test_concave_method_raises(self):
        conc = [np.array([[0, 0], [4, 0], [4, 4], [2, 1], [0, 4], [0, 0]],
                         float)]
        t = pa.Table.from_pydict({
            "zone_id": pa.array([0], pa.int64()),
            "wkb": pa.array([polygon_wkb(conc)], pa.binary())})
        with pytest.raises(NotImplementedError):
            MethodLayer(t)


class TestConvexEraseUnion:
    def test_erase_convex_hexagon(self):
        hexr = np.array([[4, 2], [6, 2], [8, 5], [6, 8], [4, 8], [2, 5],
                         [4, 2]], float)
        pieces = C.erase_polygon_convex(box_polygon(0, 0, 10, 10), hexr)
        area = sum(C.polygon_area_rings(p) for p in pieces)
        assert area == pytest.approx(100 - abs(C.ring_area(hexr)))
        # pieces are disjoint: pairwise clip areas vanish
        for i in range(len(pieces)):
            for j in range(i + 1, len(pieces)):
                inter = C.clip_rings_convex(pieces[i], pieces[j][0])
                a = C.polygon_area_rings(inter) if inter else 0.0
                assert a == pytest.approx(0.0, abs=1e-9)

    def test_union_inclusion_exclusion(self):
        hexr = np.array([[4, 2], [6, 2], [8, 5], [6, 8], [4, 8], [2, 5],
                         [4, 2]], float)
        off = box_polygon(7, 7, 12, 12)
        u = C.union_convex([hexr], off)
        ua = sum(C.polygon_area_rings(p) for p in u)
        ov = C.polygon_area_rings(C.clip_rings_convex(off, hexr))
        assert ua == pytest.approx(abs(C.ring_area(hexr)) + 25 - ov)

    def test_union_disjoint_and_contained(self):
        hexr = np.array([[4, 2], [6, 2], [8, 5], [6, 8], [4, 8], [2, 5],
                         [4, 2]], float)
        far = C.union_convex([hexr], box_polygon(20, 20, 22, 22))
        assert sum(C.polygon_area_rings(p) for p in far) == \
            pytest.approx(abs(C.ring_area(hexr)) + 4)
        inside = C.union_convex([hexr], box_polygon(4, 4, 5, 5))
        assert sum(C.polygon_area_rings(p) for p in inside) == \
            pytest.approx(abs(C.ring_area(hexr)))


class TestPolygonDistance:
    def test_distance_cases(self):
        from raydal.geo.wkb import polygon_distance
        assert polygon_distance(box_polygon(0, 0, 1, 1),
                                box_polygon(3, 0, 4, 1)) == \
            pytest.approx(2.0)
        # diagonal gap: corner-to-corner
        assert polygon_distance(box_polygon(0, 0, 1, 1),
                                box_polygon(4, 5, 6, 7)) == \
            pytest.approx(np.hypot(3, 4))
        # overlapping and contained → 0
        assert polygon_distance(box_polygon(0, 0, 2, 2),
                                box_polygon(1, 1, 3, 3)) == 0.0
        assert polygon_distance(box_polygon(0, 0, 2, 2),
                                box_polygon(0.5, 0.5, 1, 1)) == 0.0
        # touching edges → 0 (intersects counts touching)
        assert polygon_distance(box_polygon(0, 0, 1, 1),
                                box_polygon(1, 0, 2, 1)) == 0.0
        # vertex-to-edge minimum (triangle tip facing a box edge)
        tri = [np.array([[5, 0.5], [7, 0], [7, 1], [5, 0.5]], float)]
        assert polygon_distance(box_polygon(0, 0, 4, 1), tri) == \
            pytest.approx(1.0)
