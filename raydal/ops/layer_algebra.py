"""Layer algebra with GEOMETRY outputs (Intersection / Clip / Erase).

Semantics follow ``ogr/ogrsf_frmts/generic/ogrlayer.cpp``:

* Intersection (``:3345``): for every (input, method) feature pair whose
  geometries intersect, emit the CLIPPED geometry with both features'
  attributes.
* Clip (``:3555``): input geometry ∩ method layer; input attributes only.
* Erase (``:3763``): input geometry minus the method layer.

Physical shape: the method layer is broadcast (``ray.put`` once, read
per worker via the zone-index memo), candidates come from the same bbox
grid as the spatial join, and the clip kernel is Sutherland-Hodgman
(:mod:`raydal.geo.clip`).  Method geometries must be CONVEX (Erase
additionally requires axis-aligned rectangles); concave method
geometries raise ``NotImplementedError`` — the subject side is
unrestricted (holes supported).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import clip as C
from ..geo import wkb as W
from .join import resolve_zone_index_cached

__all__ = ["MethodLayer", "intersect_batch", "clip_batch", "erase_batch",
           "layer_intersection", "layer_clip", "layer_erase"]


class MethodLayer:
    """Parsed broadcast side: per-feature convex rings + bbox grid."""

    def __init__(self, table: pa.Table, wkb_col="wkb", id_col="zone_id",
                 cell_deg=5.0):
        self.ids = np.asarray(table[id_col])
        self.rings = []
        self.bbox = np.empty((table.num_rows, 4))
        self.is_rect = np.zeros(table.num_rows, dtype=bool)
        for i, blob in enumerate(table[wkb_col].to_pylist()):
            polys = W.polygons_from_wkb(blob)
            if len(polys) != 1 or len(polys[0]) != 1:
                raise NotImplementedError(
                    "method layer features must be single-ring polygons")
            ring = polys[0][0]
            if not C.is_convex(ring):
                raise NotImplementedError(
                    "concave method geometry (convex required)")
            self.rings.append(np.asarray(ring, dtype=np.float64))
            xs, ys = ring[:, 0], ring[:, 1]
            self.bbox[i] = (xs.min(), ys.min(), xs.max(), ys.max())
            ux, uy = np.unique(xs), np.unique(ys)
            self.is_rect[i] = (len(ring) == 5 and len(ux) == 2
                               and len(uy) == 2)
        self.cell_deg = cell_deg
        self.grid = {}
        for i in range(table.num_rows):
            b = self.bbox[i]
            for gx in range(int(b[0] // cell_deg), int(b[2] // cell_deg) + 1):
                for gy in range(int(b[1] // cell_deg),
                                int(b[3] // cell_deg) + 1):
                    self.grid.setdefault((gx, gy), []).append(i)

    def candidates(self, xmin, ymin, xmax, ymax):
        cand = set()
        for gx in range(int(xmin // self.cell_deg),
                        int(xmax // self.cell_deg) + 1):
            for gy in range(int(ymin // self.cell_deg),
                            int(ymax // self.cell_deg) + 1):
                cand.update(self.grid.get((gx, gy), ()))
        out = []
        for i in cand:
            b = self.bbox[i]
            if b[0] <= xmax and b[2] >= xmin and b[1] <= ymax \
                    and b[3] >= ymin:
                out.append(i)
        return sorted(out)


def _parse_subject(blob):
    """WKB → list of polygons (ring lists) + bbox."""
    polys = W.polygons_from_wkb(blob)
    allc = np.concatenate([r for p in polys for r in p])
    return polys, (allc[:, 0].min(), allc[:, 1].min(),
                   allc[:, 0].max(), allc[:, 1].max())


def intersect_batch(batch: pa.Table, method: MethodLayer,
                    id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Intersection: per intersecting pair emit clipped WKB +
    both ids + area."""
    out = {"feat_id": [], "zone_id": [], "wkb": [], "area": []}
    ids = batch[id_col].to_pylist()
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        polys, bb = _parse_subject(blob)
        for mi in method.candidates(*bb):
            pieces = []
            for rings in polys:
                cl = C.clip_rings_convex(rings, method.rings[mi])
                if cl:
                    pieces.append(cl)
            area = sum(C.polygon_area_rings(p) for p in pieces)
            if area <= 1e-12:
                continue
            blob_out = (W.polygon_wkb(pieces[0]) if len(pieces) == 1
                        else W.multipolygon_wkb(pieces))
            out["feat_id"].append(ids[i])
            out["zone_id"].append(method.ids[mi])
            out["wkb"].append(blob_out)
            out["area"].append(area)
    return pa.Table.from_pydict({
        "feat_id": pa.array(out["feat_id"]),
        "zone_id": pa.array(out["zone_id"]),
        "wkb": pa.array(out["wkb"], pa.binary()),
        "area": pa.array(out["area"], pa.float64())})


def clip_batch(batch: pa.Table, method: MethodLayer,
               id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Clip: input ∩ method layer, input attrs only.

    Assumes method geometries are pairwise disjoint (pieces are emitted
    per overlapping method feature and their areas summed)."""
    out = {"feat_id": [], "wkb": [], "area": []}
    ids = batch[id_col].to_pylist()
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        polys, bb = _parse_subject(blob)
        pieces = []
        for mi in method.candidates(*bb):
            for rings in polys:
                cl = C.clip_rings_convex(rings, method.rings[mi])
                if cl and C.polygon_area_rings(cl) > 1e-12:
                    pieces.append(cl)
        if not pieces:
            continue
        blob_out = (W.polygon_wkb(pieces[0]) if len(pieces) == 1
                    else W.multipolygon_wkb(pieces))
        out["feat_id"].append(ids[i])
        out["wkb"].append(blob_out)
        out["area"].append(sum(C.polygon_area_rings(p) for p in pieces))
    return pa.Table.from_pydict({
        "feat_id": pa.array(out["feat_id"]),
        "wkb": pa.array(out["wkb"], pa.binary()),
        "area": pa.array(out["area"], pa.float64())})


def erase_batch(batch: pa.Table, method: MethodLayer,
                id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Erase: input minus method layer (rect method only)."""
    out = {"feat_id": [], "wkb": [], "area": []}
    ids = batch[id_col].to_pylist()
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        polys, bb = _parse_subject(blob)
        pieces = [rings for rings in polys]
        for mi in method.candidates(*bb):
            if not method.is_rect[mi]:
                raise NotImplementedError("Erase needs rectangular method")
            b = method.bbox[mi]
            nxt = []
            for rings in pieces:
                nxt.extend(C.erase_polygon_rect(rings, *b))
            pieces = nxt
        area = sum(C.polygon_area_rings(p) for p in pieces)
        if not pieces or area <= 1e-12:
            continue
        blob_out = (W.polygon_wkb(pieces[0]) if len(pieces) == 1
                    else W.multipolygon_wkb(pieces))
        out["feat_id"].append(ids[i])
        out["wkb"].append(blob_out)
        out["area"].append(area)
    return pa.Table.from_pydict({
        "feat_id": pa.array(out["feat_id"]),
        "wkb": pa.array(out["wkb"], pa.binary()),
        "area": pa.array(out["area"], pa.float64())})


def _as_op(ds, method_table, fn):
    import ray

    ref = ray.put(MethodLayer(method_table))

    def run(t: pa.Table) -> pa.Table:
        return fn(t, resolve_zone_index_cached(ref))

    return ds.map_batches(run, batch_format="pyarrow")


def layer_intersection(ds, method_table):
    return _as_op(ds, method_table, intersect_batch)


def layer_clip(ds, method_table):
    return _as_op(ds, method_table, clip_batch)


def layer_erase(ds, method_table):
    return _as_op(ds, method_table, erase_batch)
