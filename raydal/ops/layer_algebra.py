"""Layer algebra with GEOMETRY outputs — the full OGR family.

Semantics follow ``ogr/ogrsf_frmts/generic/ogrlayer.cpp``:

* Intersection (``:3345``): for every (input, method) feature pair whose
  geometries intersect, emit the CLIPPED geometry with both features'
  attributes.
* Union (``:3763``): intersection pairs + input-minus-method leftovers
  (method attrs null) + method-minus-input leftovers (input attrs null).
* SymDifference (``:3948``): both leftover sides only.
* Identity (``:4118``): intersection pairs + input leftovers.
* Update (``:4283``): input minus method (input attrs) + method features
  unchanged.
* Clip (``:4446``): input ∩ UNION of the method layer; input attrs only.
* Erase (``:4576``): input minus the union of the method layer.

Method geometries may be CONCAVE, HOLED and MULTI-RING — clipping runs
on the general boolean engine (:mod:`raydal.geo.boolean`); convex
single-ring method features take the exact Sutherland-Hodgman fast path
for intersection.  Clip/Erase subtract each method feature from the
remaining subject incrementally, so OVERLAPPING method features no
longer double-count area (input ∩ ∪method, per reference semantics).

Physical shape: the method layer is broadcast (``ray.put`` once, read
per worker via the zone-index memo); candidates come from a bbox grid.
The method-side leftovers of Union/SymDifference aggregate every
intersection piece per zone — a ``groupby(zone_id).map_groups`` over
the (small) pair set, bounded by the broadcast method layer's size,
never by the streaming input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import boolean as B
from ..geo import clip as C
from ..geo import wkb as W
from .join import resolve_zone_index_cached

__all__ = ["MethodLayer", "intersect_batch", "clip_batch", "erase_batch",
           "identity_batch", "symdiff_subject_batch",
           "layer_intersection", "layer_clip", "layer_erase",
           "layer_identity", "layer_union", "layer_symdifference",
           "layer_update", "method_leftovers"]


class MethodLayer:
    """Parsed broadcast side: per-feature polygons + bbox grid.

    Features may be arbitrary (multi)polygons with holes; convex
    single-ring features are flagged for the exact Sutherland-Hodgman
    intersection fast path."""

    def __init__(self, table: pa.Table, wkb_col="wkb", id_col="zone_id",
                 cell_deg=5.0):
        self.ids = np.asarray(table[id_col])
        self.polys = []
        self.bbox = np.empty((table.num_rows, 4))
        self.convex = np.zeros(table.num_rows, dtype=bool)
        self.wkbs = table[wkb_col].to_pylist()
        for i, blob in enumerate(self.wkbs):
            polys = B.normalize_polygons(W.polygons_from_wkb(blob))
            self.polys.append(polys)
            if not polys:
                # degenerate (zero-area/collinear) method feature:
                # empty bbox so it never becomes a candidate
                self.bbox[i] = (np.inf, np.inf, -np.inf, -np.inf)
                continue
            allc = np.concatenate([r for p in polys for r in p])
            self.bbox[i] = (allc[:, 0].min(), allc[:, 1].min(),
                            allc[:, 0].max(), allc[:, 1].max())
            self.convex[i] = (len(polys) == 1 and len(polys[0]) == 1
                              and C.is_convex(polys[0][0]))
        self.cell_deg = cell_deg
        self.grid = {}
        for i in range(table.num_rows):
            b = self.bbox[i]
            if not np.isfinite(b[0]):
                continue
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

    def intersect(self, subject_polys, mi):
        """subject ∩ method[mi] → list of polygons (fast path when the
        method feature is convex single-ring)."""
        if self.convex[mi]:
            ring = self.polys[mi][0][0]
            pieces = []
            for rings in subject_polys:
                cl = C.clip_rings_convex(rings, ring)
                if cl and C.polygon_area_rings(cl) > 1e-12:
                    pieces.append(cl)
            return pieces
        return B.boolean_op(subject_polys, self.polys[mi], "and")


def _parse_subject(blob):
    polys = B.normalize_polygons(W.polygons_from_wkb(blob))
    if not polys:
        # degenerate subject: skip rather than crash the whole batch
        return [], None
    allc = np.concatenate([r for p in polys for r in p])
    return polys, (allc[:, 0].min(), allc[:, 1].min(),
                   allc[:, 0].max(), allc[:, 1].max())


def _polys_area(polys):
    return sum(C.polygon_area_rings(p) for p in polys)


def _polys_wkb(polys):
    return (W.polygon_wkb(polys[0]) if len(polys) == 1
            else W.multipolygon_wkb(polys))


def _zid_type(method):
    return (pa.int64() if np.issubdtype(method.ids.dtype, np.integer)
            else pa.string())


def _pair_table(out, fid_type, zid_type):
    return pa.Table.from_pydict({
        "feat_id": pa.array(out["feat_id"], fid_type),
        "zone_id": pa.array(out["zone_id"], zid_type),
        "wkb": pa.array(out["wkb"], pa.binary()),
        "area": pa.array(out["area"], pa.float64())})


def intersect_batch(batch: pa.Table, method: MethodLayer,
                    id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Intersection: per intersecting pair emit clipped WKB +
    both ids + area."""
    out = {"feat_id": [], "zone_id": [], "wkb": [], "area": []}
    ids = batch[id_col].to_pylist()
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        polys, bb = _parse_subject(blob)
        if bb is None:
            continue
        for mi in method.candidates(*bb):
            pieces = method.intersect(polys, mi)
            area = _polys_area(pieces)
            if area <= 1e-9:
                continue
            out["feat_id"].append(ids[i])
            out["zone_id"].append(method.ids[mi])
            out["wkb"].append(_polys_wkb(pieces))
            out["area"].append(area)
    return _pair_table(out, batch.schema.field(id_col).type,
                       _zid_type(method))


def _erase_all(polys, method, cands):
    """subject minus every candidate method feature, incrementally."""
    remaining = polys
    for mi in cands:
        if not remaining:
            break
        remaining = B.boolean_op(remaining, method.polys[mi], "sub")
    return remaining


def clip_batch(batch: pa.Table, method: MethodLayer,
               id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Clip: input ∩ (∪ method), input attrs only.  Pieces are
    carved per method feature from the not-yet-clipped remainder, so
    overlapping method features are not double-counted."""
    out = {"feat_id": [], "wkb": [], "area": []}
    ids = batch[id_col].to_pylist()
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        polys, bb = _parse_subject(blob)
        if bb is None:
            continue
        remaining = polys
        pieces = []
        for mi in method.candidates(*bb):
            if not remaining:
                break
            inter = method.intersect(remaining, mi)
            if _polys_area(inter) > 1e-9:
                pieces.extend(inter)
                remaining = B.boolean_op(remaining, method.polys[mi],
                                         "sub")
        if not pieces:
            continue
        out["feat_id"].append(ids[i])
        out["wkb"].append(_polys_wkb(pieces))
        out["area"].append(_polys_area(pieces))
    return pa.Table.from_pydict({
        "feat_id": pa.array(out["feat_id"],
                            batch.schema.field(id_col).type),
        "wkb": pa.array(out["wkb"], pa.binary()),
        "area": pa.array(out["area"], pa.float64())})


def erase_batch(batch: pa.Table, method: MethodLayer,
                id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Erase: input minus the union of the method layer."""
    out = {"feat_id": [], "wkb": [], "area": []}
    ids = batch[id_col].to_pylist()
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        polys, bb = _parse_subject(blob)
        if bb is None:
            continue
        remaining = _erase_all(polys, method, method.candidates(*bb))
        area = _polys_area(remaining)
        if not remaining or area <= 1e-9:
            continue
        out["feat_id"].append(ids[i])
        out["wkb"].append(_polys_wkb(remaining))
        out["area"].append(area)
    return pa.Table.from_pydict({
        "feat_id": pa.array(out["feat_id"],
                            batch.schema.field(id_col).type),
        "wkb": pa.array(out["wkb"], pa.binary()),
        "area": pa.array(out["area"], pa.float64())})


def identity_batch(batch: pa.Table, method: MethodLayer,
                   id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """ogrlayer Identity: intersection pairs + input leftovers (method
    id null on the leftover rows)."""
    pairs = intersect_batch(batch, method, id_col, wkb_col)
    left = erase_batch(batch, method, id_col, wkb_col)
    left = pa.Table.from_pydict({
        "feat_id": left["feat_id"],
        "zone_id": pa.nulls(left.num_rows, _zid_type(method)),
        "wkb": left["wkb"],
        "area": left["area"]})
    return pa.concat_tables([pairs, left])


def symdiff_subject_batch(batch: pa.Table, method: MethodLayer,
                          id_col="feat_id", wkb_col="wkb") -> pa.Table:
    """The input-side half of SymDifference: input minus method layer,
    method id null."""
    left = erase_batch(batch, method, id_col, wkb_col)
    return pa.Table.from_pydict({
        "feat_id": left["feat_id"],
        "zone_id": pa.nulls(left.num_rows, _zid_type(method)),
        "wkb": left["wkb"],
        "area": left["area"]})


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


def layer_identity(ds, method_table):
    return _as_op(ds, method_table, identity_batch)


def method_leftovers(pairs_ds, method_table):
    """Method-minus-input leftovers from the intersection-pair pieces:
    groupby(zone_id) over the pair set (+ one seed row per zone so
    zones intersecting nothing still surface), each group computes
    ``zone_geom \\ union(pieces)``.  Output rows: (feat_id=null,
    zone_id, wkb, area).  Bounded by the method layer's cardinality ×
    pieces per zone, not by the streaming input."""
    import ray
    import ray.data

    ml = MethodLayer(method_table)
    ref = ray.put(ml)
    zid_type = _zid_type(ml)
    zone_ids = method_table["zone_id"].to_pylist()
    seeds = pa.Table.from_pydict({
        "zone_id": pa.array(zone_ids, zid_type),
        "wkb": pa.array([b""] * len(zone_ids), pa.binary())})

    def reduce_zone(t: pa.Table) -> pa.Table:
        method = resolve_zone_index_cached(ref)
        zid = t["zone_id"][0].as_py()
        mi = int(np.nonzero(np.asarray(method.ids) == zid)[0][0])
        remaining = method.polys[mi]
        for blob in t["wkb"].to_pylist():
            if not blob or not remaining:
                continue
            piece = B.normalize_polygons(W.polygons_from_wkb(blob))
            remaining = B.boolean_op(remaining, piece, "sub")
        area = _polys_area(remaining) if remaining else 0.0
        if not remaining or area <= 1e-9:
            return pa.Table.from_pydict({
                "feat_id": pa.array([], pa.int64()),
                "zone_id": pa.array([], zid_type),
                "wkb": pa.array([], pa.binary()),
                "area": pa.array([], pa.float64())})
        return pa.Table.from_pydict({
            "feat_id": pa.nulls(1, pa.int64()),
            "zone_id": pa.array([zid], zid_type),
            "wkb": pa.array([_polys_wkb(remaining)], pa.binary()),
            "area": pa.array([area], pa.float64())})

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"zone_id": t["zone_id"],
                                     "wkb": t["wkb"]})

    pieces = pairs_ds.map_batches(project, batch_format="pyarrow") \
        .union(ray.data.from_arrow(seeds))
    return pieces.groupby("zone_id").map_groups(
        reduce_zone, batch_format="pyarrow")


def layer_union(ds, method_table):
    """Full ogrlayer Union: pairs + input leftovers + method leftovers.

    The pair set is materialized once — it feeds BOTH the output union
    and the method-leftover reduction, and without materialization the
    whole intersection pipeline would execute twice via lineage."""
    pairs = layer_intersection(ds, method_table).materialize()
    subject_left = _as_op(ds, method_table, symdiff_subject_batch)
    mleft = method_leftovers(pairs, method_table)
    return pairs.union(subject_left).union(mleft)


def layer_symdifference(ds, method_table):
    """ogrlayer SymDifference: both leftover sides, no pairs."""
    # pairs only feed the method-leftover reduction here, but running
    # the clip pipeline lazily twice (union consumers may iterate more
    # than once) is still avoided by materializing the small pair set
    pairs = layer_intersection(ds, method_table).materialize()
    subject_left = _as_op(ds, method_table, symdiff_subject_batch)
    mleft = method_leftovers(pairs, method_table)
    return subject_left.union(mleft)


def layer_update(ds, method_table):
    """ogrlayer Update: input minus method (input attrs) + method
    features unchanged (method wkb/area, feat_id null)."""
    import ray.data

    erased = _as_op(ds, method_table, symdiff_subject_batch)
    ml = MethodLayer(method_table)
    mt = pa.Table.from_pydict({
        "feat_id": pa.nulls(len(ml.ids), pa.int64()),
        "zone_id": pa.array(ml.ids.tolist(), _zid_type(ml)),
        "wkb": pa.array(ml.wkbs, pa.binary()),
        "area": pa.array([_polys_area(p) for p in ml.polys],
                         pa.float64())})
    return erased.union(ray.data.from_arrow(mt))
