"""Spatial joins: broadcast zone join, PIP join, cell-partitioned join, kNN.

Three physical strategies, chosen by side size (the layer-algebra
semantics of ``ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345`` — envelope
pre-filter then exact predicate, ``:3427-3502`` — re-expressed for Ray):

* **Broadcast join** (small method layer): :class:`ZoneIndex` is built once
  on the driver, ``ray.put`` once, and read by every actor in
  ``__init__`` — never re-shipped per batch.  Candidate lookup goes
  through a cell→zones grid; the exact predicate is vectorized PIP /
  polygon-intersects.
* **Cell-partitioned join** (both sides large): both sides ``flat_map`` to
  covering cells, one ``groupby(cell).map_groups`` joins co-located
  groups; duplicate multi-cell pairs are suppressed with the PBSM
  reference-point rule (a pair is reported only in the cell containing
  the intersection's top-left corner).
* **kNN** via cell-ring expansion (the quadtree analogue of the
  reference's expanding per-quadrant search, ``alg/gdalgrid.cpp:347-426``):
  probe ring k = 0, 1, 2, … until ``k`` hits are found and the next
  ring's minimum possible distance exceeds the current kth distance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import cells, wkb as W

__all__ = ["ZoneIndex", "SpatialJoinZones", "PIPJoinZones",
           "cell_cover_bbox", "pbsm_keep_mask", "KnnJoin", "build_cell_points"]


def _planar_grid_idx(v, lo, hi, n):
    """Equal-step grid bucket of ``v`` over [lo, hi) into n cells.

    One shared implementation for the cover, PBSM reference-point, point
    index, and kNN probe paths — identical float expression everywhere so
    the bucketings can never drift apart.
    """
    return np.clip(np.floor((np.asarray(v) - lo) * n / (hi - lo)),
                   0, n - 1).astype(np.int64)


class ZoneIndex:
    """Broadcast-side spatial index over a zones Arrow table.

    Parses each zone's WKB once into numpy ring arrays, keeps per-zone
    bboxes, and grids zone ids into WebMercatorQuad-style lon/lat cells at
    ``index_z`` for candidate lookup.  Cell keys here are computed on a
    simple equal-angle grid over the lon/lat window — the join only needs
    a consistent bucketing, not projected cells.
    """

    def __init__(self, zones: pa.Table, index_z=7,
                 wkb_col="wkb", id_col="zone_id", attrs=()):
        self.index_z = index_z
        self.ids = np.asarray(zones[id_col])
        self.attrs = {a: np.asarray(zones[a]) for a in attrs}
        self.polys = []   # per zone: list of polygons (list of rings)
        n = len(self.ids)
        self.bbox = np.empty((n, 4), dtype=np.float64)
        # per-zone vectorization state: for each polygon of the zone, its
        # outer-ring vertices, all-ring segments, and bbox (drives the
        # batched rect×polygon predicate in SpatialJoinZones)
        self.poly_outer = []
        self.poly_segs = []
        self.poly_bbox = []
        for i, blob in enumerate(zones[wkb_col].to_pylist()):
            polys = W.polygons_from_wkb(blob)
            self.polys.append(polys)
            outs, segs, bbs = [], [], []
            for p in polys:
                outs.append(p[0])
                segs.append(np.concatenate(
                    [W._ring_segments(r) for r in p]))
                pc = np.concatenate(p)
                bbs.append((pc[:, 0].min(), pc[:, 1].min(),
                            pc[:, 0].max(), pc[:, 1].max()))
            self.poly_outer.append(outs)
            self.poly_segs.append(segs)
            self.poly_bbox.append(bbs)
            allc = np.concatenate([r for p in polys for r in p])
            self.bbox[i] = (allc[:, 0].min(), allc[:, 1].min(),
                            allc[:, 0].max(), allc[:, 1].max())
        # grid cells (equal-angle) covering each zone bbox
        self.grid = {}
        cx0, cy0, cx1, cy1 = self._cells_of_bbox(
            self.bbox[:, 0], self.bbox[:, 1], self.bbox[:, 2], self.bbox[:, 3])
        for i in range(n):
            for gx in range(int(cx0[i]), int(cx1[i]) + 1):
                for gy in range(int(cy0[i]), int(cy1[i]) + 1):
                    self.grid.setdefault((gx, gy), []).append(i)

    def _cells_of_bbox(self, xmin, ymin, xmax, ymax):
        scale = (1 << self.index_z) / 360.0
        cx0 = np.floor((np.asarray(xmin) + 180.0) * scale).astype(np.int64)
        cx1 = np.floor((np.asarray(xmax) + 180.0) * scale).astype(np.int64)
        cy0 = np.floor((np.asarray(ymin) + 90.0) * scale).astype(np.int64)
        cy1 = np.floor((np.asarray(ymax) + 90.0) * scale).astype(np.int64)
        return cx0, cy0, cx1, cy1

    def candidates_for_bbox(self, xmin, ymin, xmax, ymax):
        """Zone indices whose grid cells overlap the bbox (bbox-filtered)."""
        cx0, cy0, cx1, cy1 = self._cells_of_bbox(xmin, ymin, xmax, ymax)
        cand = set()
        for gx in range(int(cx0), int(cx1) + 1):
            for gy in range(int(cy0), int(cy1) + 1):
                cand.update(self.grid.get((gx, gy), ()))
        if not cand:
            return np.empty(0, dtype=np.int64)
        cand = np.fromiter(cand, dtype=np.int64)
        b = self.bbox[cand]
        keep = ((b[:, 0] <= xmax) & (b[:, 2] >= xmin)
                & (b[:, 1] <= ymax) & (b[:, 3] >= ymin))
        return cand[keep]

    def candidate_pairs_for_bboxes(self, xmin, ymin, xmax, ymax):
        """Batched candidate generation: (row_idx, zone_idx) arrays for a
        whole bbox batch, bbox-filtered.  Single-cell bboxes (the common
        case) group by unique cell in one vectorized pass; multi-cell
        bboxes fall back to a per-row set union."""
        cx0, cy0, cx1, cy1 = self._cells_of_bbox(xmin, ymin, xmax, ymax)
        single = (cx0 == cx1) & (cy0 == cy1)
        rows_l, zones_l = [], []
        si = np.nonzero(single)[0]
        if len(si):
            keys, inv = np.unique(
                np.stack([cx0[si], cy0[si]], 1), axis=0, return_inverse=True)
            for ki, (gx, gy) in enumerate(keys):
                zl = self.grid.get((int(gx), int(gy)))
                if not zl:
                    continue
                rr = si[inv == ki]
                za = np.asarray(zl, dtype=np.int64)
                rows_l.append(np.repeat(rr, len(za)))
                zones_l.append(np.tile(za, len(rr)))
        for i in np.nonzero(~single)[0]:
            cand = set()
            for gx in range(int(cx0[i]), int(cx1[i]) + 1):
                for gy in range(int(cy0[i]), int(cy1[i]) + 1):
                    cand.update(self.grid.get((gx, gy), ()))
            if cand:
                za = np.fromiter(cand, dtype=np.int64)
                rows_l.append(np.full(len(za), i, dtype=np.int64))
                zones_l.append(za)
        if not rows_l:
            e = np.empty(0, dtype=np.int64)
            return e, e
        rows = np.concatenate(rows_l)
        zns = np.concatenate(zones_l)
        b = self.bbox[zns]
        keep = ((b[:, 0] <= xmax[rows]) & (b[:, 2] >= xmin[rows])
                & (b[:, 1] <= ymax[rows]) & (b[:, 3] >= ymin[rows]))
        return rows[keep], zns[keep]

    def rects_intersect_zone(self, zi, rxmin, rymin, rxmax, rymax):
        """Vectorized exact predicate: which of R rects intersect zone
        ``zi``?  Same result as ``any(polygon_intersects_polygon(rect,
        poly) for poly in polys[zi])``: the three OR-ed sub-tests (rect
        corner strictly inside polygon / polygon outer vertex inside
        rect / boundary segments crossing) evaluated batched.  The
        vertex-in-rect sub-test uses closed intervals where the scalar
        path uses the crossing rule's half-open edges — on-edge cases
        always also trigger the segment-crossing test, so the OR is
        identical."""
        nrect = len(rxmin)
        hit = np.zeros(nrect, dtype=bool)
        corner_x = np.stack([rxmin, rxmax, rxmax, rxmin], axis=1)
        corner_y = np.stack([rymin, rymin, rymax, rymax], axis=1)
        for outer, segs, (bx0, by0, bx1, by1), rings in zip(
                self.poly_outer[zi], self.poly_segs[zi],
                self.poly_bbox[zi], self.polys[zi]):
            live = ~hit & ((bx0 <= rxmax) & (bx1 >= rxmin)
                           & (by0 <= rymax) & (by1 >= rymin))
            li = np.nonzero(live)[0]
            if len(li) == 0:
                continue
            # 1. any rect corner inside the polygon (holes subtract)
            cin = W.points_in_polygon(
                rings, corner_x[li].ravel(), corner_y[li].ravel())
            t1 = cin.reshape(len(li), 4).any(axis=1)
            # 2. any polygon outer vertex inside the rect
            vx, vy = outer[:, 0], outer[:, 1]
            t2 = ((vx[None, :] >= rxmin[li, None])
                  & (vx[None, :] <= rxmax[li, None])
                  & (vy[None, :] >= rymin[li, None])
                  & (vy[None, :] <= rymax[li, None])).any(axis=1)
            # 3. boundary crossing: 4 rect edges × polygon segments
            need = np.nonzero(~(t1 | t2))[0]
            t3 = np.zeros(len(li), dtype=bool)
            if len(need):
                ri = li[need]
                c0 = np.stack([corner_x[ri], corner_y[ri]], axis=2)
                c1 = np.roll(c0, -1, axis=1)
                edges = np.stack([c0, c1], axis=2).reshape(-1, 2, 2)
                m = W.segments_cross_matrix(edges, segs)
                t3[need] = m.reshape(len(ri), 4, -1).any(axis=(1, 2))
            hit[li] |= t1 | t2 | t3
        return hit

    def candidates_for_points(self, px, py):
        """For a point batch: dict zone_idx → point positions in its bbox."""
        out = {}
        scale = (1 << self.index_z) / 360.0
        gx = np.floor((px + 180.0) * scale).astype(np.int64)
        gy = np.floor((py + 90.0) * scale).astype(np.int64)
        keys, inverse = np.unique(np.stack([gx, gy], 1), axis=0,
                                  return_inverse=True)
        for ki, (kx, ky) in enumerate(keys):
            zids = self.grid.get((int(kx), int(ky)))
            if not zids:
                continue
            pts = np.nonzero(inverse == ki)[0]
            for zi in zids:
                out.setdefault(zi, []).append(pts)
        return {zi: np.concatenate(v) for zi, v in out.items()}


_ZONE_MEMO = {}


def resolve_zone_index_cached(ref):
    """Fetch a ``ray.put`` ZoneIndex once per WORKER PROCESS (memoized by
    object ref).  Lets task-pool ``map_batches`` use the broadcast index
    without per-task deserialization — workers persist across tasks, so
    this has actor-pool economics without actor-pool startup latency."""
    try:
        import ray
        if isinstance(ref, ray.ObjectRef):
            key = ref.hex()
            if key not in _ZONE_MEMO:
                if len(_ZONE_MEMO) >= 4:   # bound worker RSS: each entry
                    _ZONE_MEMO.pop(next(iter(_ZONE_MEMO)))  # is a full index
                _ZONE_MEMO[key] = ray.get(ref)
            return _ZONE_MEMO[key]
    except ImportError:
        pass
    return ref


class SpatialJoinZones:
    """Actor: image footprints (bbox in zone CRS) × zones intersects-join.

    Construct with ``zones_ref`` (a ``ray.put`` handle of
    :class:`ZoneIndex`) so the index ships once per actor, or with the
    index itself for local use.  Emits ``(image_id, zone_id)`` plus any
    carried attrs.  The footprint is treated as its bbox rectangle in
    zone space (axis-aligned), the exact predicate is
    rectangle-polygon intersects.
    """

    def __init__(self, zones_ref, id_col="image_id"):
        self.index = self._resolve(zones_ref)
        self.id_col = id_col

    @staticmethod
    def _resolve(ref):
        try:
            import ray
            if isinstance(ref, ray.ObjectRef):
                return ray.get(ref)
        except ImportError:
            pass
        return ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        xmin = np.asarray(batch["xmin"])
        ymin = np.asarray(batch["ymin"])
        xmax = np.asarray(batch["xmax"])
        ymax = np.asarray(batch["ymax"])
        ids = np.asarray(batch[self.id_col])
        id_type = batch.schema.field(self.id_col).type
        zid_type = (pa.int64() if np.issubdtype(self.index.ids.dtype,
                                                np.integer) else pa.string())
        rows, zns = self.index.candidate_pairs_for_bboxes(
            np.asarray(xmin, dtype=np.float64),
            np.asarray(ymin, dtype=np.float64),
            np.asarray(xmax, dtype=np.float64),
            np.asarray(ymax, dtype=np.float64))
        keep = np.zeros(len(rows), dtype=bool)
        if len(rows):
            order = np.argsort(zns, kind="stable")
            zs = zns[order]
            bounds = np.flatnonzero(np.diff(zs)) + 1
            for grp in np.split(order, bounds):
                zi = int(zns[grp[0]])
                rr = rows[grp]
                keep[grp] = self.index.rects_intersect_zone(
                    zi, xmin[rr], ymin[rr], xmax[rr], ymax[rr])
        rows, zns = rows[keep], zns[keep]
        # batch row order, then zone order — same emit order as the
        # scalar loop (row-major over candidates)
        order = np.lexsort((zns, rows))
        rows, zns = rows[order], zns[order]
        return pa.Table.from_pydict({
            self.id_col: pa.array(ids[rows], id_type),
            "zone_id": pa.array(self.index.ids[zns], zid_type)})


class PIPJoinZones:
    """Actor: point-in-polygon join of a point batch against the zones.

    Emits ``(point_id, zone_id, inside, on_boundary)`` per candidate hit:
    ``inside`` is the crossing-number interior test
    (``ogr/ogrlinearring.cpp:462`` parity, holes subtract), ``on_boundary``
    the exact boundary test (``:543``).  ``Contains`` ≡ inside & ~boundary,
    ``Intersects`` ≡ inside | boundary.
    """

    def __init__(self, zones_ref, x_col="x", y_col="y", id_col="point_id",
                 emit="intersects"):
        self.index = SpatialJoinZones._resolve(zones_ref)
        self.x_col, self.y_col, self.id_col = x_col, y_col, id_col
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = np.asarray(batch[self.x_col], dtype=np.float64)
        py = np.asarray(batch[self.y_col], dtype=np.float64)
        ids = np.asarray(batch[self.id_col])
        id_type = batch.schema.field(self.id_col).type
        zid_type = (pa.int64() if np.issubdtype(self.index.ids.dtype,
                                                np.integer) else pa.string())
        cand = self.index.candidates_for_points(px, py)
        sel_rows, sel_zis, sel_in, sel_bd = [], [], [], []
        for zi, pts in cand.items():
            b = self.index.bbox[zi]
            in_bb = ((px[pts] >= b[0]) & (px[pts] <= b[2])
                     & (py[pts] >= b[1]) & (py[pts] <= b[3]))
            pts = pts[in_bb]
            if len(pts) == 0:
                continue
            x, y = px[pts], py[pts]
            inside = np.zeros(len(pts), dtype=bool)
            boundary = np.zeros(len(pts), dtype=bool)
            for poly in self.index.polys[zi]:
                inside |= W.points_in_polygon(poly, x, y)
                for ring in poly:
                    boundary |= W.points_on_ring_boundary(ring, x, y)
            if self.emit == "intersects":
                hit = inside | boundary
            elif self.emit == "contains":
                hit = inside & ~boundary
            else:
                hit = np.ones(len(pts), dtype=bool)
            hi = np.nonzero(hit)[0]
            if len(hi) == 0:
                continue
            sel_rows.append(pts[hi])
            sel_zis.append(np.full(len(hi), zi, dtype=np.int64))
            sel_in.append(inside[hi])
            sel_bd.append(boundary[hi])
        if sel_rows:
            rows = np.concatenate(sel_rows)
            zis = np.concatenate(sel_zis)
            ins = np.concatenate(sel_in)
            bds = np.concatenate(sel_bd)
        else:
            rows = zis = np.array([], dtype=np.int64)
            ins = bds = np.array([], dtype=bool)
        return pa.Table.from_pydict({
            self.id_col: pa.array(ids[rows], id_type),
            "zone_id": pa.array(self.index.ids[zis], zid_type),
            "inside": pa.array(ins, pa.bool_()),
            "on_boundary": pa.array(bds, pa.bool_())})


# ---------------------------------------------------------------------------
# cell-partitioned large×large machinery


def cell_cover_bbox(batch: pa.Table, z, carry_cols, cell_col="cell",
                    planar_window=None) -> pa.Table:
    """flat_map helper: one output row per cell covering each bbox row.

    ``planar_window=(x0, y0, x1, y1)`` buckets on an equal-step grid over
    that window (for lon/lat or arbitrary planar data); default uses
    WebMercatorQuad cells via the projected bbox columns.
    """
    xmin = np.asarray(batch["xmin"], dtype=np.float64)
    ymin = np.asarray(batch["ymin"], dtype=np.float64)
    xmax = np.asarray(batch["xmax"], dtype=np.float64)
    ymax = np.asarray(batch["ymax"], dtype=np.float64)
    if planar_window is not None:
        x0, y0, x1, y1 = planar_window
        n = 1 << z
        cx0 = _planar_grid_idx(xmin, x0, x1, n)
        cx1 = _planar_grid_idx(xmax, x0, x1, n)
        cy0 = _planar_grid_idx(ymin, y0, y1, n)
        cy1 = _planar_grid_idx(ymax, y0, y1, n)
    else:
        tm = cells.web_mercator_quad(z)
        cx0, cy0, cx1, cy1 = cells.tile_indices(tm, xmin, ymin, xmax, ymax)
    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(batch.num_rows), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    nx_r = np.repeat(nx, counts)
    gx = np.repeat(cx0, counts) + offs % nx_r
    gy = np.repeat(cy0, counts) + offs // nx_r
    cols = {c: batch[c].take(pa.array(row_idx, pa.int64()))
            for c in carry_cols}
    cols[cell_col] = pa.array(cells.pack_cell(np.full(total, z), gx, gy))
    return pa.Table.from_pydict(cols)


def pbsm_keep_mask(cell, z, axmin, aymin, bxmin, bymin, planar_window=None):
    """True where this cell is the canonical reporter for pair (a, b).

    PBSM reference-point rule: report only in the cell that contains the
    intersection bbox's min corner ``(max(axmin, bxmin), max(aymin,
    bymin))``.
    """
    rx = np.maximum(np.asarray(axmin), np.asarray(bxmin))
    ry = np.maximum(np.asarray(aymin), np.asarray(bymin))
    if planar_window is not None:
        x0, y0, x1, y1 = planar_window
        gx = _planar_grid_idx(rx, x0, x1, 1 << z)
        gy = _planar_grid_idx(ry, y0, y1, 1 << z)
    else:
        # must bucket with the SAME epsilon rule as cells.tile_indices
        # (used by the cover path) or boundary-adjacent pairs land in a
        # cell where neither side was flat-mapped and vanish
        tm = cells.web_mercator_quad(z)
        gx0, gy0, _, _ = cells.tile_indices(tm, rx, ry, rx, ry)
        gx, gy = gx0, gy0
    ref_cell = cells.pack_cell(np.full(len(gx), z), gx.astype(np.int64),
                               gy.astype(np.int64))
    return np.asarray(cell) == ref_cell


# ---------------------------------------------------------------------------
# kNN via cell-ring expansion


def build_cell_points(ids, x, y, z, window):
    """Group reference points by equal-step grid cell → broadcastable dict.

    Returns ``{(gx, gy): (ids_arr, xy_arr)}`` plus the grid geometry —
    the side-table index an actor pulls once via ``ray.put`` handle.
    """
    x0, y0, x1, y1 = window
    n = 1 << z
    gx = _planar_grid_idx(x, x0, x1, n)
    gy = _planar_grid_idx(y, y0, y1, n)
    order = np.lexsort((gy, gx))
    ids = np.asarray(ids)[order]
    xy = np.stack([np.asarray(x)[order], np.asarray(y)[order]], axis=1)
    gx, gy = gx[order], gy[order]
    grid = {}
    keys, starts = np.unique(np.stack([gx, gy], 1), axis=0, return_index=True)
    starts = list(starts) + [len(ids)]
    for ki, (kx, ky) in enumerate(keys):
        sl = slice(starts[ki], starts[ki + 1])
        grid[(int(kx), int(ky))] = (ids[sl], xy[sl])
    return {"grid": grid, "z": z, "window": window}


class KnnJoin:
    """Actor: k nearest reference points per probe, by cell-ring expansion.

    Reference semantics model: the expanding-radius quadtree search of
    gdal_grid (``alg/gdalgrid.cpp:347-426``) — expand ring by ring until
    ``k`` candidates are found *and* the next ring cannot contain a closer
    point.  Planar Euclidean distance; ties broken by reference id for
    determinism.  Emits ``(probe_id, rank, neighbor_id, dist)``.
    """

    def __init__(self, index_ref, k=5, x_col="x", y_col="y",
                 id_col="point_id"):
        self.index = SpatialJoinZones._resolve(index_ref)
        self.k = k
        self.x_col, self.y_col, self.id_col = x_col, y_col, id_col
        x0, y0, x1, y1 = self.index["window"]
        n = 1 << self.index["z"]
        self.cell_w = (x1 - x0) / n
        self.cell_h = (y1 - y0) / n

    def _knn_one(self, pxv, pyv, gx, gy):
        grid = self.index["grid"]
        n = 1 << self.index["z"]
        ids = None
        d2 = None
        ring = 0
        while True:
            new_ids, new_xy = [], []
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if max(abs(dx), abs(dy)) != ring:
                        continue
                    cx, cy = gx + dx, gy + dy
                    if not (0 <= cx < n and 0 <= cy < n):
                        continue
                    ent = grid.get((cx, cy))
                    if ent is not None:
                        new_ids.append(ent[0])
                        new_xy.append(ent[1])
            if new_ids:
                # incremental: only the new ring's distances are computed;
                # squared distance keeps the SQL oracle's float ops exactly
                nids = np.concatenate(new_ids)
                nxy = np.concatenate(new_xy)
                ddx = nxy[:, 0] - pxv
                ddy = nxy[:, 1] - pyv
                nd2 = ddx * ddx + ddy * ddy
                ids = nids if ids is None else np.concatenate([ids, nids])
                d2 = nd2 if d2 is None else np.concatenate([d2, nd2])
            if ids is not None and len(ids) >= self.k:
                order = np.lexsort((ids, d2))[:self.k]
                kth = d2[order[-1]]
                # stop only when NO future point can tie or beat the kth:
                # a next-ring point at exactly ring_min distance could win
                # the id tie-break, so the comparison is strict
                ring_min = ring * min(self.cell_w, self.cell_h)
                if kth < ring_min * ring_min or ring >= n:
                    return ids[order], np.sqrt(d2[order])
            ring += 1
            if ring > n:  # degenerate: fewer than k points exist
                if ids is not None:
                    order = np.lexsort((ids, d2))[:self.k]
                    return ids[order], np.sqrt(d2[order])
                return np.empty(0, dtype=object), np.empty(0)

    def _knn_cell_group(self, pxv, pyv, gx, gy):
        """Vectorized kNN for ALL probes sharing grid cell (gx, gy).

        Same candidate rings and stop rule as :meth:`_knn_one` (probes in
        one cell see identical rings), but one distance matrix + one
        multi-row lexsort instead of a Python loop per probe.  Returns
        (ids (P, k') object rows as list, dists list) per probe.
        """
        grid = self.index["grid"]
        n = 1 << self.index["z"]
        cand_ids, cand_xy = [], []
        ring = 0
        P = len(pxv)
        while True:
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if max(abs(dx), abs(dy)) != ring:
                        continue
                    cx, cy = gx + dx, gy + dy
                    if not (0 <= cx < n and 0 <= cy < n):
                        continue
                    ent = grid.get((cx, cy))
                    if ent is not None:
                        cand_ids.append(ent[0])
                        cand_xy.append(ent[1])
            total = sum(len(c) for c in cand_ids)
            if total >= self.k or ring > n:
                nids = (np.concatenate(cand_ids) if cand_ids
                        else np.empty(0, dtype=np.int64))
                nxy = (np.concatenate(cand_xy) if cand_xy
                       else np.empty((0, 2)))
                if total == 0:
                    return [np.empty(0, dtype=nids.dtype)] * P, \
                        [np.empty(0)] * P
                ddx = nxy[:, 0][None, :] - pxv[:, None]
                ddy = nxy[:, 1][None, :] - pyv[:, None]
                d2 = ddx * ddx + ddy * ddy            # (P, N)
                order = np.lexsort(
                    (np.broadcast_to(nids, d2.shape), d2), axis=-1)
                kk = min(self.k, total)
                top = order[:, :kk]
                kth = np.take_along_axis(d2, top[:, -1:], axis=1)[:, 0]
                ring_min = ring * min(self.cell_w, self.cell_h)
                if (total >= self.k
                        and (kth < ring_min * ring_min).all()) or ring > n:
                    tid = nids[top]
                    td = np.sqrt(np.take_along_axis(d2, top, axis=1))
                    return [tid[i] for i in range(P)], \
                        [td[i] for i in range(P)]
            ring += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = self.index["window"]
        n = 1 << self.index["z"]
        px = np.asarray(batch[self.x_col], dtype=np.float64)
        py = np.asarray(batch[self.y_col], dtype=np.float64)
        ids = np.asarray(batch[self.id_col])  # native dtype preserved
        out = {"probe_id": [], "rank": [], "neighbor_id": [], "dist": []}
        gx = _planar_grid_idx(px, x0, x1, n)
        gy = _planar_grid_idx(py, y0, y1, n)
        # group probes by their grid cell: one vectorized ring expansion
        # + distance matrix per cell instead of a Python loop per probe
        keys, inv = np.unique(np.stack([gx, gy], 1), axis=0,
                              return_inverse=True)
        for ki, (cgx, cgy) in enumerate(keys):
            sel = np.nonzero(inv == ki)[0]
            nid_rows, nd_rows = self._knn_cell_group(
                px[sel], py[sel], int(cgx), int(cgy))
            # vectorized rank fan-out: repeat probe ids by neighbor
            # counts, per-row arange for ranks
            lens = np.fromiter((len(r) for r in nid_rows), dtype=np.int64,
                               count=len(nid_rows))
            total = int(lens.sum())
            if total == 0:
                continue
            ranks = (np.arange(total, dtype=np.int64)
                     - np.repeat(np.cumsum(lens) - lens, lens) + 1)
            out["probe_id"].append(np.repeat(ids[sel], lens))
            out["rank"].append(ranks)
            out["neighbor_id"].append(np.concatenate(
                [r for r in nid_rows if len(r)]))
            out["dist"].append(np.concatenate(
                [r for r in nd_rows if len(r)]).astype(np.float64))
        if out["probe_id"]:
            for k in out:
                out[k] = np.concatenate(out[k])
        else:
            out["probe_id"] = ids[:0]
            out["rank"] = np.array([], dtype=np.int64)
            out["neighbor_id"] = np.array([], dtype=object)
            out["dist"] = np.array([], dtype=np.float64)
        probe_type = batch.schema.field(self.id_col).type
        nbr_dtype = self.index["grid"]
        nbr_type = None
        for ent in nbr_dtype.values():
            arr = np.asarray(ent[0])
            nbr_type = (pa.int64() if np.issubdtype(arr.dtype, np.integer)
                        else pa.float64() if np.issubdtype(arr.dtype,
                                                           np.floating)
                        else pa.string())
            break
        return pa.Table.from_pydict({
            "probe_id": pa.array(out["probe_id"], probe_type),
            "rank": pa.array(out["rank"], pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], nbr_type),
            "dist": pa.array(out["dist"], pa.float64())})
