"""General polygon boolean operations (concave, holes, multipolygons).

Replaces the convex-only Sutherland-Hodgman scope of :mod:`raydal.geo.clip`
for layer algebra.  Reference semantics: GEOS-backed
``ogr/ogrgeometry.cpp:4893`` (Intersection), ``:5012`` (Union), and the
layer operators ``ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-3763``.

Method: planar overlay via segment subdivision + side classification
(the "field classification" formulation of polygon overlay, equivalent in
result to Martinez-Rueda / Greiner-Hormann but degenerate-case-robust
for the small per-feature polygons this engine clips inside
``map_batches``):

1. split every boundary segment of A at its intersections with B's
   segments (and vice versa), including collinear-overlap endpoints;
2. classify each sub-segment by evaluating the boolean result predicate
   ``R = op(inside_A, inside_B)`` at a point ε to the left and ε to the
   right of its midpoint;
3. a sub-segment is a result-boundary edge iff R differs across it;
   orient it so the result region lies on its LEFT (shared A/B edges
   then collapse to one directed edge — deduplicated);
4. assemble directed edges into rings (interior-on-left face walk);
   CCW rings are outers, CW rings are holes, holes assigned by
   containment.

Complexity is O(|A|·|B|) per pair — the operands here are single
features (tens of vertices), clipped independently per batch, so
robustness beats asymptotics.  All coordinate math is numpy float64.

Polygons are lists of closed (N,2) rings, ring[0] = outer; a
"multi-polygon" operand is a list of such polygons.
"""

from __future__ import annotations

import numpy as np

from .wkb import (_ring_signed_area as _wkb_signed_area,
                  points_in_polygon, points_in_ring)

__all__ = [
    "normalize_polygons", "boolean_op", "boolean_area", "union_all",
]

_QUANT = 1e9     # vertex key quantization (1e-9 grid)
_TEPS = 1e-12    # parameter-space tolerance


def _ring_signed_area(ring):
    # shared implementation in geo/wkb.py: wrapping shoelace, so rings
    # are implicitly closed like the reference's OGRLinearRing
    return _wkb_signed_area(np.asarray(ring, dtype=np.float64))


def normalize_polygons(polys):
    """Outer rings CCW, holes CW; drop degenerate rings (<3 distinct)."""
    out = []
    for rings in polys:
        nr = []
        for k, ring in enumerate(rings):
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 4:
                continue
            a = _ring_signed_area(r)
            if abs(a) < 1e-300:
                continue
            want_ccw = k == 0
            if (a > 0) != want_ccw:
                r = r[::-1]
            nr.append(r)
        if nr:
            out.append(nr)
    return out


def _segments_of(polys):
    """All directed boundary segments of a (multi)polygon as two (M,2)
    endpoint arrays."""
    p0, p1 = [], []
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            a, b = r[:-1], r[1:]
            keep = np.any(a != b, axis=1)
            p0.append(a[keep])
            p1.append(b[keep])
    if not p0:
        z = np.empty((0, 2))
        return z, z
    return np.concatenate(p0), np.concatenate(p1)


def _split_params(p0, p1, q0, q1):
    """For each segment of (p0,p1), parameter values t in (0,1) where it
    meets any segment of (q0,q1).  Vectorized one-vs-all per subject
    segment; handles crossing, T-junction and collinear overlap."""
    m = len(q0)
    out = [[] for _ in range(len(p0))]
    if m == 0:
        return out
    qd = q1 - q0
    for i in range(len(p0)):
        p, r = p0[i], p1[i] - p0[i]
        rxs = r[0] * qd[:, 1] - r[1] * qd[:, 0]
        pq = q0 - p
        qpxr = pq[:, 0] * r[1] - pq[:, 1] * r[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (pq[:, 0] * qd[:, 1] - pq[:, 1] * qd[:, 0]) / rxs
            u = qpxr / rxs
        cross = (np.abs(rxs) > 1e-300) & (t > _TEPS) & (t < 1 - _TEPS) \
            & (u >= -_TEPS) & (u <= 1 + _TEPS)
        if cross.any():
            out[i].extend(t[cross].tolist())
        # collinear overlap: rxs == 0 and q0 on the line of p
        col = (np.abs(rxs) <= 1e-300) & (np.abs(qpxr) <= 1e-9)
        if col.any():
            rr = float(np.dot(r, r))
            if rr > 0:
                for j in np.nonzero(col)[0]:
                    for qq in (q0[j], q1[j]):
                        tt = float(np.dot(qq - p, r)) / rr
                        if _TEPS < tt < 1 - _TEPS:
                            out[i].append(tt)
    return out


def _subdivide(p0, p1, params):
    """Split segments at the given parameter lists → sub-segment
    endpoint arrays (s0, s1)."""
    s0, s1 = [], []
    for i in range(len(p0)):
        ts = params[i]
        if not ts:
            s0.append(p0[i])
            s1.append(p1[i])
            continue
        ts = np.unique(np.clip(np.asarray(ts, dtype=np.float64), 0.0, 1.0))
        ts = ts[(ts > _TEPS) & (ts < 1 - _TEPS)]
        pts = np.vstack([p0[i],
                         p0[i] + ts[:, None] * (p1[i] - p0[i]),
                         p1[i]])
        s0.extend(pts[:-1])
        s1.extend(pts[1:])
    if not s0:
        z = np.empty((0, 2))
        return z, z
    return np.asarray(s0), np.asarray(s1)


def _all_rings(polys):
    return [r for rings in polys for r in rings]


def _inside(polys, px, py):
    """Even-odd inside test of points against ALL rings of a valid
    (multi)polygon: XOR of per-ring crossing parity, so disjoint
    components and holes both work (``points_in_polygon`` would treat
    every ring after the first as a hole of the first)."""
    acc = np.zeros(len(px), dtype=bool)
    for rings in polys:
        for r in rings:
            acc ^= points_in_ring(r, px, py)
    return acc


_OPS = {
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "sub": lambda a, b: a & ~b,
    "xor": lambda a, b: a ^ b,
}


def _boundary_edges(pa, pb, op, eps=None):
    """Oriented, deduplicated result-boundary edges for op(A, B) →
    (e0, e1) arrays with the result region on the LEFT of each edge."""
    fn = _OPS[op]
    a0, a1 = _segments_of(pa)
    b0, b1 = _segments_of(pb)
    s0a, s1a = _subdivide(a0, a1, _split_params(a0, a1, b0, b1))
    s0b, s1b = _subdivide(b0, b1, _split_params(b0, b1, a0, a1))
    s0 = np.concatenate([s0a, s0b]) if len(s0a) or len(s0b) \
        else np.empty((0, 2))
    s1 = np.concatenate([s1a, s1b]) if len(s1a) or len(s1b) \
        else np.empty((0, 2))
    if len(s0) == 0:
        return s0, s1
    d = s1 - s0
    ln = np.hypot(d[:, 0], d[:, 1])
    keep = ln > 1e-12
    s0, s1, d, ln = s0[keep], s1[keep], d[keep], ln[keep]
    if eps is None:
        scale = max(1.0, float(np.abs(s0).max()), float(np.abs(s1).max()))
        eps = 1e-7 * scale
    nx, ny = -d[:, 1] / ln, d[:, 0] / ln      # left normal
    mx, my = (s0[:, 0] + s1[:, 0]) * 0.5, (s0[:, 1] + s1[:, 1]) * 0.5
    lx, ly = mx + eps * nx, my + eps * ny
    rx, ry = mx - eps * nx, my - eps * ny
    r_left = fn(_inside(pa, lx, ly), _inside(pb, lx, ly))
    r_right = fn(_inside(pa, rx, ry), _inside(pb, rx, ry))
    sel = r_left != r_right
    s0, s1 = s0[sel], s1[sel]
    flip = ~r_left[sel]
    s0f = np.where(flip[:, None], s1, s0)
    s1f = np.where(flip[:, None], s0, s1)
    # dedup shared A/B edges (same oriented sub-segment from both inputs)
    k0 = np.round(s0f * _QUANT).astype(np.int64)
    k1 = np.round(s1f * _QUANT).astype(np.int64)
    keys = np.concatenate([k0, k1], axis=1)
    _, idx = np.unique(keys, axis=0, return_index=True)
    idx.sort()
    return s0f[idx], s1f[idx]


def boolean_area(pa, pb, op):
    """Area of op(A, B) without ring assembly: 0.5·Σ cross(e0, e1) over
    the oriented boundary edges (region-on-left ⇒ shoelace over the
    edge soup is the net enclosed area, holes negative automatically)."""
    pa = normalize_polygons(pa)
    pb = normalize_polygons(pb)
    e0, e1 = _boundary_edges(pa, pb, op)
    if len(e0) == 0:
        return 0.0
    return 0.5 * float(np.sum(e0[:, 0] * e1[:, 1] - e1[:, 0] * e0[:, 1]))


def _assemble_rings(e0, e1):
    """Directed edge soup (region on left) → list of closed rings.

    Face walk: at each vertex follow the outgoing edge that is the most
    CLOCKWISE from the reversed incoming direction (max CCW angle from
    the incoming direction), which keeps each traced face simple at
    degree-4 touch points (corner-touching squares come out as two
    rings, not a figure-8)."""
    n = len(e0)
    if n == 0:
        return []
    k0 = [tuple(v) for v in np.round(e0 * _QUANT).astype(np.int64)]
    k1 = [tuple(v) for v in np.round(e1 * _QUANT).astype(np.int64)]
    out_edges = {}
    for i in range(n):
        out_edges.setdefault(k0[i], []).append(i)
    used = np.zeros(n, dtype=bool)
    rings = []
    for start in range(n):
        if used[start]:
            continue
        path = [start]
        used[start] = True
        cur = start
        guard = 0
        while guard <= n:
            guard += 1
            end_key = k1[cur]
            cands = [j for j in out_edges.get(end_key, ()) if not used[j]]
            if not cands and end_key == k0[start]:
                break       # ring closed
            if not cands:
                path = None  # dangling (numeric sliver) — drop
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                din = e1[cur] - e0[cur]
                ain = np.arctan2(din[1], din[0])
                best, best_ang = None, None
                for j in cands:
                    dj = e1[j] - e0[j]
                    ang = (np.arctan2(dj[1], dj[0]) - ain - np.pi) \
                        % (2 * np.pi)
                    if best is None or ang > best_ang:
                        best, best_ang = j, ang
                nxt = best
            # close as soon as we return to the start vertex
            used[nxt] = True
            path.append(nxt)
            cur = nxt
            if k1[cur] == k0[start]:
                break
        if path is None or len(path) < 3:
            continue
        pts = np.vstack([e0[path], e0[path[0]]])
        rings.append(pts)
    return rings


def _interior_sample(ring):
    """A point strictly inside the region bounded by the ring (on the
    left of its directed edges)."""
    r = np.asarray(ring, dtype=np.float64)
    d = r[1] - r[0]
    ln = float(np.hypot(d[0], d[1]))
    scale = max(1.0, float(np.abs(r).max()))
    eps = 1e-7 * scale
    mid = (r[0] + r[1]) * 0.5
    return mid[0] - d[1] / ln * eps, mid[1] + d[0] / ln * eps


def boolean_op(pa, pb, op):
    """op(A, B) → list of polygons (each ``[outer_ccw, hole_cw, ...]``).

    ``op`` ∈ {"and", "or", "sub", "xor"}."""
    pa = normalize_polygons(pa)
    pb = normalize_polygons(pb)
    e0, e1 = _boundary_edges(pa, pb, op)
    rings = _assemble_rings(e0, e1)
    outers, holes = [], []
    for ring in rings:
        a = _ring_signed_area(ring)
        if abs(a) < 1e-12:
            continue
        (outers if a > 0 else holes).append((ring, abs(a)))
    outers.sort(key=lambda t: t[1])   # smallest first for containment
    polys = [[ring] for ring, _ in outers]
    for hole, _ in holes:
        # sample on the left of the CW hole ring = in the polygon
        # interior just outside the hole — inside the owning outer
        hx, hy = _interior_sample(hole)
        placed = False
        for i, (outer, _) in enumerate(outers):
            if bool(points_in_polygon([outer], np.array([hx]),
                                      np.array([hy]))[0]):
                polys[i].append(hole)
                placed = True
                break
        if not placed and polys:
            polys[0].append(hole)
    return polys


def union_all(polys_list):
    """Iterated union of a list of (multi)polygons → one multipolygon."""
    acc = []
    for p in polys_list:
        acc = boolean_op(acc, p, "or") if acc else normalize_polygons(p)
    return acc
