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
from .join import (cell_cover_bbox, pbsm_keep_mask,
                   resolve_zone_index_cached)

__all__ = ["MethodLayer", "intersect_batch", "clip_batch", "erase_batch",
           "identity_batch", "symdiff_subject_batch",
           "layer_intersection", "layer_clip", "layer_erase",
           "layer_identity", "layer_union", "layer_symdifference",
           "layer_update", "method_leftovers",
           "layer_intersection_shuffled", "candidate_pairs_shuffled",
           "layer_clip_shuffled", "layer_erase_shuffled",
           "layer_identity_shuffled", "layer_union_shuffled",
           "layer_symdifference_shuffled", "layer_update_shuffled",
           "layer_op_auto", "METHOD_BROADCAST_BUDGET_BYTES"]


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


# ---------------------------------------------------------------------------
# Cell-partitioned (shuffled) variants — method layers beyond the
# broadcast budget.
#
# The broadcast family above ships MethodLayer once via ``ray.put``;
# right when the method layer fits in actor memory.  When it does not,
# BOTH layers flat-map onto a covering grid (ONE ``groupby(cell)``
# all-to-all), candidate pairs form inside each co-located group, and
# the PBSM reference-point rule keeps each pair exactly once — the
# distributed analogue of the reference's streaming method side
# (``ogrlayer.cpp:3345`` iterates the method layer under a per-feature
# spatial filter, never materializing it).
#
# Two physical shapes:
#   * Intersection: ONE shuffle — per-cell MethodLayer, clip in place.
#   * Clip/Erase/Identity/Union/SymDifference/Update: the union-of-
#     method semantics need every method feature touching a subject in
#     one place, so stage 1 emits PBSM-deduped candidate PAIRS (+ one
#     anchor row per feature from the feature's own min-corner cell)
#     and stage 2 is a ``groupby(feat_id)`` (and, for the method-side
#     leftovers, ``groupby(zone_id)``) carve.  Group sizes are bounded
#     by candidates-per-feature, never by layer cardinality.


def _shuffle_cover(ds, id_col, wkb_col, side, z, window, fid_type,
                   zid_type):
    """Flat-map a polygon layer onto covering cells with a tagged,
    union-compatible schema."""
    def cover(t: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = W.wkb_bbox_many(t[wkb_col].to_pylist())
        tb = pa.Table.from_pydict({
            "_id": t[id_col], "wkb": t[wkb_col],
            "xmin": pa.array(x0, pa.float64()),
            "ymin": pa.array(y0, pa.float64()),
            "xmax": pa.array(x1, pa.float64()),
            "ymax": pa.array(y1, pa.float64())})
        c = cell_cover_bbox(tb, z, ["_id", "wkb", "xmin", "ymin",
                                    "xmax", "ymax"],
                            planar_window=window)
        n = c.num_rows
        fid = (c["_id"] if side == "s"
               else pa.nulls(n, fid_type))
        zid = (c["_id"] if side == "m"
               else pa.nulls(n, zid_type))
        return pa.Table.from_pydict({
            "cell": c["cell"],
            "side": pa.array([side] * n, pa.string()),
            "feat_id": fid, "zone_id": zid,
            "wkb": c["wkb"],
            "xmin": c["xmin"], "ymin": c["ymin"],
            "xmax": c["xmax"], "ymax": c["ymax"]})

    return ds.map_batches(cover, batch_format="pyarrow")


def _split_sides(g: pa.Table):
    import pyarrow.compute as pc

    mask = pc.equal(g["side"], "s")
    return g.filter(mask), g.filter(pc.invert(mask))


def layer_intersection_shuffled(ds, method_ds, z, window,
                                id_col="feat_id", wkb_col="wkb",
                                m_id_col="zone_id", m_wkb_col="wkb",
                                fid_type=None, zid_type=None):
    """Intersection without broadcasting the method layer: one
    ``groupby(cell)`` co-locates both sides; each group builds a LOCAL
    MethodLayer over only its method rows and clips its subject rows;
    PBSM keeps each pair in exactly one cell.  Output schema matches
    :func:`layer_intersection`."""
    fid_type = fid_type or pa.int64()
    zid_type = zid_type or pa.int64()
    s_cells = _shuffle_cover(ds, id_col, wkb_col, "s", z, window,
                             fid_type, zid_type)
    m_cells = _shuffle_cover(method_ds, m_id_col, m_wkb_col, "m", z,
                             window, fid_type, zid_type)
    # inner pruning grid sized to the shuffle cell
    inner_deg = max((window[2] - window[0]) / (1 << z) / 4.0, 1e-6)

    def intersect_cell(g: pa.Table) -> pa.Table:
        out = {"feat_id": [], "zone_id": [], "wkb": [], "area": []}
        s, m = _split_sides(g)
        if s.num_rows and m.num_rows:
            ml = MethodLayer(pa.Table.from_pydict({
                "wkb": m["wkb"], "zone_id": m["zone_id"]}),
                cell_deg=inner_deg)
            cell_val = g["cell"][0].as_py()
            # PBSM must bucket the EXACT bbox mins used by the cover
            # step (carried columns), not re-derived parse bboxes
            m_xmin = np.asarray(m["xmin"])
            m_ymin = np.asarray(m["ymin"])
            s_xmin = np.asarray(s["xmin"])
            s_ymin = np.asarray(s["ymin"])
            sids = s["feat_id"].to_pylist()
            for i, blob in enumerate(s["wkb"].to_pylist()):
                polys, bb = _parse_subject(blob)
                if bb is None:
                    continue
                cands = ml.candidates(*bb)
                if not cands:
                    continue
                k = len(cands)
                keep = pbsm_keep_mask(
                    np.full(k, cell_val, dtype=np.int64), z,
                    np.full(k, s_xmin[i]), np.full(k, s_ymin[i]),
                    m_xmin[cands], m_ymin[cands],
                    planar_window=window)
                for j, mi in enumerate(cands):
                    if not keep[j]:
                        continue
                    pieces = ml.intersect(polys, mi)
                    area = _polys_area(pieces)
                    if area <= 1e-9:
                        continue
                    out["feat_id"].append(sids[i])
                    out["zone_id"].append(ml.ids[mi])
                    out["wkb"].append(_polys_wkb(pieces))
                    out["area"].append(area)
        return _pair_table(out, fid_type, zid_type)

    return (s_cells.union(m_cells)
            .groupby("cell")
            .map_groups(intersect_cell, batch_format="pyarrow"))


def candidate_pairs_shuffled(ds, method_ds, z, window,
                             id_col="feat_id", wkb_col="wkb",
                             m_id_col="zone_id", m_wkb_col="wkb",
                             fid_type=None, zid_type=None):
    """Stage 1 of the shuffled union-of-method ops: PBSM-deduped
    bbox-overlap candidate pairs carrying BOTH geometries, plus one
    anchor row per feature (emitted from the cell of the feature's own
    bbox min corner, so features with zero candidates still reach the
    stage-2 groupby).

    Rows: (feat_id, zone_id, s_wkb, m_wkb) — anchors have the other
    side's columns null."""
    fid_type = fid_type or pa.int64()
    zid_type = zid_type or pa.int64()
    s_cells = _shuffle_cover(ds, id_col, wkb_col, "s", z, window,
                             fid_type, zid_type)
    m_cells = _shuffle_cover(method_ds, m_id_col, m_wkb_col, "m", z,
                             window, fid_type, zid_type)

    def empty():
        return pa.Table.from_pydict({
            "feat_id": pa.array([], fid_type),
            "zone_id": pa.array([], zid_type),
            "s_wkb": pa.array([], pa.binary()),
            "m_wkb": pa.array([], pa.binary())})

    def pairs_cell(g: pa.Table) -> pa.Table:
        s, m = _split_sides(g)
        cell_val = g["cell"][0].as_py()
        parts = []
        ns, nm = s.num_rows, m.num_rows

        def anchors(side_tbl, n):
            cells_arr = np.full(n, cell_val, dtype=np.int64)
            xm = np.asarray(side_tbl["xmin"])
            ym = np.asarray(side_tbl["ymin"])
            # ref point of (f, f) is f's own min corner
            return pbsm_keep_mask(cells_arr, z, xm, ym, xm, ym,
                                  planar_window=window)

        if ns:
            ka = anchors(s, ns)
            if ka.any():
                sa = s.filter(pa.array(ka))
                parts.append(pa.Table.from_pydict({
                    "feat_id": sa["feat_id"],
                    "zone_id": pa.nulls(sa.num_rows, zid_type),
                    "s_wkb": sa["wkb"],
                    "m_wkb": pa.nulls(sa.num_rows, pa.binary())}))
        if nm:
            ka = anchors(m, nm)
            if ka.any():
                ma = m.filter(pa.array(ka))
                parts.append(pa.Table.from_pydict({
                    "feat_id": pa.nulls(ma.num_rows, fid_type),
                    "zone_id": ma["zone_id"],
                    "s_wkb": pa.nulls(ma.num_rows, pa.binary()),
                    "m_wkb": ma["wkb"]}))
        if ns and nm:
            sx0 = np.asarray(s["xmin"])[:, None]
            sy0 = np.asarray(s["ymin"])[:, None]
            sx1 = np.asarray(s["xmax"])[:, None]
            sy1 = np.asarray(s["ymax"])[:, None]
            mx0 = np.asarray(m["xmin"])[None, :]
            my0 = np.asarray(m["ymin"])[None, :]
            mx1 = np.asarray(m["xmax"])[None, :]
            my1 = np.asarray(m["ymax"])[None, :]
            hit = (sx0 <= mx1) & (sx1 >= mx0) \
                & (sy0 <= my1) & (sy1 >= my0)
            si, mi = np.nonzero(hit)
            if len(si):
                keep = pbsm_keep_mask(
                    np.full(len(si), cell_val, dtype=np.int64), z,
                    sx0[si, 0], sy0[si, 0], mx0[0, mi], my0[0, mi],
                    planar_window=window)
                si, mi = si[keep], mi[keep]
            if len(si):
                ii = pa.array(si, pa.int64())
                jj = pa.array(mi, pa.int64())
                parts.append(pa.Table.from_pydict({
                    "feat_id": s["feat_id"].take(ii),
                    "zone_id": m["zone_id"].take(jj),
                    "s_wkb": s["wkb"].take(ii),
                    "m_wkb": m["wkb"].take(jj)}))
        return pa.concat_tables(parts) if parts else empty()

    return (s_cells.union(m_cells)
            .groupby("cell")
            .map_groups(pairs_cell, batch_format="pyarrow"))


def _filter_side(pairs_ds, col):
    import pyarrow.compute as pc

    return pairs_ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[col])), batch_format="pyarrow")


def _carve_feat_groups(pairs_ds, mode, fid_type, zid_type):
    """Stage 2 over ``groupby(feat_id)``: each group holds one subject
    (every row carries s_wkb) and its candidate method geometries.

    mode: 'erase' | 'clip' | 'identity' | 'symdiff_subject' —
    identical per-subject semantics to the broadcast *_batch fns."""

    def carve(g: pa.Table) -> pa.Table:
        out = {"feat_id": [], "zone_id": [], "wkb": [], "area": []}
        fid = g["feat_id"][0].as_py()
        polys, bb = _parse_subject(g["s_wkb"][0].as_py())
        m_wkbs = [b for b in g["m_wkb"].to_pylist() if b]
        zids = [z_ for b, z_ in zip(g["m_wkb"].to_pylist(),
                                    g["zone_id"].to_pylist()) if b]
        if bb is not None:
            if mode == "identity":
                # per-pair intersections (NOT carved incrementally)
                for blob, zid in zip(m_wkbs, zids):
                    mp = B.normalize_polygons(W.polygons_from_wkb(blob))
                    pieces = B.boolean_op(polys, mp, "and")
                    area = _polys_area(pieces)
                    if area <= 1e-9:
                        continue
                    out["feat_id"].append(fid)
                    out["zone_id"].append(zid)
                    out["wkb"].append(_polys_wkb(pieces))
                    out["area"].append(area)
            remaining = polys
            pieces_clip = []
            for blob in m_wkbs:
                if not remaining:
                    break
                mp = B.normalize_polygons(W.polygons_from_wkb(blob))
                if mode == "clip":
                    inter = B.boolean_op(remaining, mp, "and")
                    if _polys_area(inter) > 1e-9:
                        pieces_clip.extend(inter)
                remaining = B.boolean_op(remaining, mp, "sub")
            if mode == "clip":
                if pieces_clip:
                    out["feat_id"].append(fid)
                    out["zone_id"].append(None)
                    out["wkb"].append(_polys_wkb(pieces_clip))
                    out["area"].append(_polys_area(pieces_clip))
            else:   # erase / identity / symdiff_subject leftovers
                area = _polys_area(remaining) if remaining else 0.0
                if remaining and area > 1e-9:
                    out["feat_id"].append(fid)
                    out["zone_id"].append(None)
                    out["wkb"].append(_polys_wkb(remaining))
                    out["area"].append(area)
        t = _pair_table(out, fid_type, zid_type)
        if mode in ("erase", "clip"):
            return t.drop_columns(["zone_id"])
        return t

    return pairs_ds.groupby("feat_id").map_groups(
        carve, batch_format="pyarrow")


def _zone_leftovers_shuffled(pairs_ds, fid_type, zid_type):
    """Method-minus-input from the stage-1 pair set: groupby(zone_id);
    every pair row carries the zone geometry in m_wkb, anchors cover
    zones with no candidates."""

    def carve(g: pa.Table) -> pa.Table:
        zid = g["zone_id"][0].as_py()
        m_blob = next(b for b in g["m_wkb"].to_pylist() if b)
        remaining = B.normalize_polygons(W.polygons_from_wkb(m_blob))
        for blob in g["s_wkb"].to_pylist():
            if not blob or not remaining:
                continue
            sp = B.normalize_polygons(W.polygons_from_wkb(blob))
            remaining = B.boolean_op(remaining, sp, "sub")
        area = _polys_area(remaining) if remaining else 0.0
        out = {"feat_id": [], "zone_id": [], "wkb": [], "area": []}
        if remaining and area > 1e-9:
            out["feat_id"].append(None)
            out["zone_id"].append(zid)
            out["wkb"].append(_polys_wkb(remaining))
            out["area"].append(area)
        return _pair_table(out, fid_type, zid_type)

    return pairs_ds.groupby("zone_id").map_groups(
        carve, batch_format="pyarrow")


def layer_clip_shuffled(ds, method_ds, z, window, **kw):
    fid_type = kw.pop("fid_type", pa.int64())
    zid_type = kw.pop("zid_type", pa.int64())
    pairs = candidate_pairs_shuffled(ds, method_ds, z, window,
                                     fid_type=fid_type,
                                     zid_type=zid_type, **kw)
    return _carve_feat_groups(_filter_side(pairs, "feat_id"), "clip",
                              fid_type, zid_type)


def layer_erase_shuffled(ds, method_ds, z, window, **kw):
    fid_type = kw.pop("fid_type", pa.int64())
    zid_type = kw.pop("zid_type", pa.int64())
    pairs = candidate_pairs_shuffled(ds, method_ds, z, window,
                                     fid_type=fid_type,
                                     zid_type=zid_type, **kw)
    return _carve_feat_groups(_filter_side(pairs, "feat_id"), "erase",
                              fid_type, zid_type)


def layer_identity_shuffled(ds, method_ds, z, window, **kw):
    fid_type = kw.pop("fid_type", pa.int64())
    zid_type = kw.pop("zid_type", pa.int64())
    pairs = candidate_pairs_shuffled(ds, method_ds, z, window,
                                     fid_type=fid_type,
                                     zid_type=zid_type, **kw)
    return _carve_feat_groups(_filter_side(pairs, "feat_id"),
                              "identity", fid_type, zid_type)


def layer_union_shuffled(ds, method_ds, z, window, **kw):
    """pairs + input leftovers (groupby feat) + method leftovers
    (groupby zone) off ONE materialized stage-1 pair set."""
    fid_type = kw.pop("fid_type", pa.int64())
    zid_type = kw.pop("zid_type", pa.int64())
    pairs = candidate_pairs_shuffled(
        ds, method_ds, z, window, fid_type=fid_type,
        zid_type=zid_type, **kw).materialize()
    ident = _carve_feat_groups(_filter_side(pairs, "feat_id"),
                               "identity", fid_type, zid_type)
    mleft = _zone_leftovers_shuffled(_filter_side(pairs, "zone_id"),
                                     fid_type, zid_type)
    return ident.union(mleft)


def layer_symdifference_shuffled(ds, method_ds, z, window, **kw):
    fid_type = kw.pop("fid_type", pa.int64())
    zid_type = kw.pop("zid_type", pa.int64())
    pairs = candidate_pairs_shuffled(
        ds, method_ds, z, window, fid_type=fid_type,
        zid_type=zid_type, **kw).materialize()
    sleft = _carve_feat_groups(_filter_side(pairs, "feat_id"),
                               "symdiff_subject", fid_type, zid_type)
    mleft = _zone_leftovers_shuffled(_filter_side(pairs, "zone_id"),
                                     fid_type, zid_type)
    return sleft.union(mleft)


def layer_update_shuffled(ds, method_ds, z, window, **kw):
    """input-minus-method (shuffled erase, zone null) + method features
    unchanged (streamed straight off the method dataset)."""
    fid_type = kw.pop("fid_type", pa.int64())
    zid_type = kw.pop("zid_type", pa.int64())
    m_id_col = kw.get("m_id_col", "zone_id")
    m_wkb_col = kw.get("m_wkb_col", "wkb")
    pairs = candidate_pairs_shuffled(ds, method_ds, z, window,
                                     fid_type=fid_type,
                                     zid_type=zid_type, **kw)
    erased = _carve_feat_groups(_filter_side(pairs, "feat_id"),
                                "symdiff_subject", fid_type, zid_type)

    def mrows(t: pa.Table) -> pa.Table:
        blobs = t[m_wkb_col].to_pylist()
        areas = [_polys_area(B.normalize_polygons(
            W.polygons_from_wkb(b))) for b in blobs]
        return pa.Table.from_pydict({
            "feat_id": pa.nulls(t.num_rows, fid_type),
            "zone_id": t[m_id_col].cast(zid_type),
            "wkb": pa.array(blobs, pa.binary()),
            "area": pa.array(areas, pa.float64())})

    return erased.union(
        method_ds.map_batches(mrows, batch_format="pyarrow"))


# conservative library default: a method layer comfortably held once
# per node via ray.put; above this the shuffle family runs instead
METHOD_BROADCAST_BUDGET_BYTES = 256 << 20

_SHUFFLED = {
    "intersection": layer_intersection_shuffled,
    "clip": layer_clip_shuffled,
    "erase": layer_erase_shuffled,
    "identity": layer_identity_shuffled,
    "union": layer_union_shuffled,
    "symdifference": layer_symdifference_shuffled,
    "update": layer_update_shuffled,
}
_BROADCAST = {
    "intersection": layer_intersection,
    "clip": layer_clip,
    "erase": layer_erase,
    "identity": layer_identity,
    "union": layer_union,
    "symdifference": layer_symdifference,
    "update": layer_update,
}


def layer_op_auto(op, ds, method, z=None, window=None,
                  method_bytes=None,
                  budget_bytes=METHOD_BROADCAST_BUDGET_BYTES, **kw):
    """Budget-gated dispatch (the q25-asof pattern: decide from
    METADATA, never by materializing the method side).

    ``method`` is a ``pa.Table`` (broadcast-sized, bytes known exactly)
    or a ``ray.data.Dataset`` with ``method_bytes`` estimated from
    parquet/source metadata by the caller.  The shuffled path needs the
    covering grid (``z``, ``window``)."""
    if method_bytes is None:
        if isinstance(method, pa.Table):
            method_bytes = method.nbytes
        else:
            raise ValueError(
                "layer_op_auto needs method_bytes for a Dataset method "
                "side (estimate from source metadata)")
    if method_bytes <= budget_bytes:
        tbl = method
        if not isinstance(tbl, pa.Table):
            tbl = pa.concat_tables(
                b for b in method.iter_batches(batch_format="pyarrow"))
        return _BROADCAST[op](ds, tbl)
    if z is None or window is None:
        raise ValueError("shuffled layer algebra needs z and window")
    import ray.data

    mds = method
    if isinstance(mds, pa.Table):
        mds = ray.data.from_arrow(mds)
    return _SHUFFLED[op](ds, mds, z, window, **kw)
