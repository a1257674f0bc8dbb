"""Polygon clipping: Sutherland-Hodgman against convex clips, plus the
rect complement decomposition that turns it into an Erase (difference).

Backs the layer-algebra operators with *geometry outputs*
(``ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-3763`` Intersection / Clip /
Erase semantics: clipped geometry + merged attributes), replacing the
round-1 id-pairs-only result.  Scope: the clip side must be CONVEX
(axis-aligned rectangles get a dedicated fast path); concave method
geometries raise — the subject side may be any polygon, holes included.

All coordinate math is numpy; rings are (N, 2) float64 closed arrays
(first == last vertex).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sutherland_hodgman", "clip_rings_convex", "clip_polygon_rect",
    "erase_polygon_rect", "erase_polygon_convex", "union_convex",
    "ring_area", "polygon_area_rings", "is_convex",
]


def ring_area(ring):
    """Signed shoelace area (CCW positive)."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygon_area_rings(rings):
    """Absolute area of outer ring minus holes."""
    if not rings:
        return 0.0
    a = abs(ring_area(rings[0]))
    for h in rings[1:]:
        a -= abs(ring_area(h))
    return a


def is_convex(ring):
    """True if the closed ring is convex (all turns one way)."""
    r = np.asarray(ring, dtype=np.float64)[:-1]
    if len(r) < 3:
        return False
    d = np.diff(np.vstack([r, r[:2]]), axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool((cross >= -1e-12).all() or (cross <= 1e-12).all())


def _clip_half_plane(ring, a, b, c):
    """Clip closed ring against half-plane a*x + b*y <= c."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0:
        return r
    pts = r[:-1]
    n = len(pts)
    out = []
    d = a * pts[:, 0] + b * pts[:, 1] - c
    inside = d <= 1e-12
    for i in range(n):
        j = (i + 1) % n
        if inside[i]:
            out.append(pts[i])
            if not inside[j]:
                t = d[i] / (d[i] - d[j])
                out.append(pts[i] + t * (pts[j] - pts[i]))
        elif inside[j]:
            t = d[i] / (d[i] - d[j])
            out.append(pts[i] + t * (pts[j] - pts[i]))
    if len(out) < 3:
        return np.empty((0, 2), dtype=np.float64)
    out.append(out[0])
    return np.asarray(out, dtype=np.float64)


def sutherland_hodgman(ring, clip_ring):
    """Clip a closed subject ring by a CONVEX closed clip ring.

    The clip ring may wind either way; it is normalized to CCW so the
    interior is consistently on the left of each directed edge.
    """
    clip = np.asarray(clip_ring, dtype=np.float64)
    if ring_area(clip) < 0:
        clip = clip[::-1]
    out = np.asarray(ring, dtype=np.float64)
    for i in range(len(clip) - 1):
        x1, y1 = clip[i]
        x2, y2 = clip[i + 1]
        # interior (left of edge): cross((p2-p1), (p-p1)) >= 0
        # → (y2-y1)*x + (x1-x2)*y <= x1*y2 - x2*y1
        out = _clip_half_plane(out, y2 - y1, x1 - x2, x1 * y2 - x2 * y1)
        if len(out) == 0:
            break
    return out


def clip_rings_convex(rings, clip_ring):
    """Clip a polygon-with-holes by a convex ring → list of rings.

    The outer ring and each hole are clipped independently (valid for
    area/attribute semantics whenever holes stay inside the clipped
    outer — always true since holes ⊆ outer)."""
    out = sutherland_hodgman(rings[0], clip_ring)
    if len(out) == 0:
        return []
    res = [out]
    for h in rings[1:]:
        hc = sutherland_hodgman(h, clip_ring)
        if len(hc):
            res.append(hc)
    return res


def _rect_ring(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)


def clip_polygon_rect(rings, x0, y0, x1, y1):
    """Polygon ∩ axis-aligned rect → list of rings (possibly empty)."""
    return clip_rings_convex(rings, _rect_ring(x0, y0, x1, y1))


def erase_polygon_rect(rings, x0, y0, x1, y1):
    """Polygon minus axis-aligned rect → list of polygons (each a ring
    list).  The rect's complement is decomposed into four half-plane
    strips (left, right, bottom-middle, top-middle); the polygon clipped
    by each strip yields disjoint pieces whose union is the difference.
    """
    big = 1e30
    strips = [
        (-big, -big, x0, big),    # left of rect
        (x1, -big, big, big),     # right of rect
        (x0, -big, x1, y0),       # below, within x span
        (x0, y1, x1, big),        # above, within x span
    ]
    pieces = []
    for sx0, sy0, sx1, sy1 in strips:
        c = clip_polygon_rect(rings, sx0, sy0, sx1, sy1)
        if c and abs(ring_area(c[0])) > 1e-12:
            pieces.append(c)
    return pieces


def _half_plane_of_edge(x1, y1, x2, y2):
    """Coefficients (a, b, c) with interior (left of CCW edge) =
    a*x + b*y <= c."""
    return (y2 - y1, x1 - x2, x1 * y2 - x2 * y1)


def erase_polygon_convex(rings, clip_ring):
    """Polygon minus a CONVEX clip ring → list of disjoint polygons.

    The convex complement decomposes into per-edge wedges: piece_i =
    subject ∩ outside(edge_i) ∩ inside(edge_0..i-1) — successive
    Sutherland-Hodgman half-plane clips, so pieces are disjoint by
    construction (generalizes :func:`erase_polygon_rect` to any convex
    clip; reference scope ``ogrgeometry.cpp:5129`` Difference)."""
    clip = np.asarray(clip_ring, dtype=np.float64)
    if ring_area(clip) < 0:
        clip = clip[::-1]
    # drop zero-length edges: their half-plane degenerates to (0,0,0)
    # which would keep the ENTIRE subject as a spurious wedge
    keep = np.any(clip[:-1] != clip[1:], axis=1)
    clip = np.vstack([clip[:-1][keep], clip[:1]])
    pieces = []
    for i in range(len(clip) - 1):
        a, b, c = _half_plane_of_edge(*clip[i], *clip[i + 1])
        piece = []
        for ring in rings:
            # outside of edge i: a*x + b*y >= c  → clip by (-a, -b, -c)
            r = _clip_half_plane(np.asarray(ring, dtype=np.float64),
                                 -a, -b, -c)
            if len(r):
                piece.append(r)
        if not piece:
            continue
        # restrict to inside of all previous edges (disjointness)
        ok = True
        for j in range(i):
            aj, bj, cj = _half_plane_of_edge(*clip[j], *clip[j + 1])
            piece = [_clip_half_plane(r, aj, bj, cj) for r in piece]
            piece = [r for r in piece if len(r)]
            if not piece:
                ok = False
                break
        if ok and piece and abs(ring_area(piece[0])) > 1e-12:
            pieces.append(piece)
    return pieces


def union_convex(rings_a, rings_b):
    """Union of polygon B with CONVEX polygon A → list of disjoint
    polygons covering A ∪ B (A itself plus B \\ A wedges).  Reference
    scope: ``ogrgeometry.cpp:5012`` Union, restricted to a convex
    operand."""
    a_outer = np.asarray(rings_a[0], dtype=np.float64)
    if not is_convex(a_outer):
        raise NotImplementedError("union_convex needs a convex first "
                                  "operand")
    if len(rings_a) > 1:
        # B inside one of A's holes would vanish from the outer-ring
        # erase — out of scope rather than silently wrong
        raise NotImplementedError("union_convex: first operand must "
                                  "have no holes")
    pieces = [list(rings_a)]
    pieces.extend(erase_polygon_convex(rings_b, a_outer))
    return pieces
