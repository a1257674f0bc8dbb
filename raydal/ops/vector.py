"""Vector geometry operators over WKB columns (GEOS-free, numpy).

The per-geometry surface of the reference's ``vector geom`` subcommands
(``apps/gdalalg_vector_geom.cpp:38-44``) and ogr2ogr's geometry stage
(validate → reproject → clip order, ``apps/ogr2ogr_lib.cpp:6427``),
reimplemented on ring coordinate arrays:

* ``reproject_wkb`` — in-WKB coordinate transform, the
  ``OGRWKBUpdatePoints`` pattern (``ogr/ogr_wkb.h:45-58``); the
  actor-pool stage (:class:`VectorReproject`) concatenates every
  coordinate of the batch, transforms ONCE, and splits back — one
  vectorized transform per batch, not per ring.
* ``explode_batch`` — Multi* → one row per part
  (``apps/gdalalg_vector_explode_collections.cpp``).
* ``swap_xy``, ``segmentize`` (max-length densify), ``simplify``
  (Douglas-Peucker, the non-topology-preserving ``Simplify`` of
  ``ogr/ogrgeometry.cpp:6360``), ``centroid`` (area-weighted,
  ``:6106``), ``convex_hull`` (Andrew monotone chain, ``:4186``),
  ``buffer`` for points and convex rings (edge offset + arc join;
  concave input raises — GEOS-grade buffering is out of scope and
  documented as such).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .contour import chain_segments, contour_segments
from .fill import _edt2
from ..geo import wkb as W
from ..geo.boolean import union_all
from ..geo.clip import polygon_area_rings, ring_area
from ..geo.crs import Transformer
from .grid import delaunay_triangulate
from .polygonize import label_components, trace_boundary

__all__ = ["VectorReproject", "reproject_wkb", "explode_batch", "swap_xy",
           "segmentize", "simplify_dp", "centroid", "convex_hull",
           "buffer_point", "buffer_convex", "geometry_stats_batch",
           "raster_footprint", "segmentize_wkb", "simplify_wkb",
           "make_valid_wkb", "buffer_wkb", "erode_ring", "simplify_coverage"]


def _map_coords(parsed, fn):
    t, payload = parsed
    if t in (W.POINT, W.LINESTRING):
        return (t, fn(payload))
    if t == W.POLYGON:
        return (t, [fn(r) for r in payload])
    return (t, [_map_coords(p, fn) for p in payload])


import struct as _struct


def _rebuild(parsed):
    t, payload = parsed
    if t == W.POINT:
        return W.point_wkb(payload[0, 0], payload[0, 1])
    if t == W.LINESTRING:
        return W.linestring_wkb(payload)
    if t == W.POLYGON:
        return W.polygon_wkb(payload)
    if t == W.MULTIPOLYGON:
        return W.multipolygon_wkb([p for (_, p) in payload])
    if t in (W.MULTIPOINT, W.MULTILINESTRING, W.GEOMETRYCOLLECTION):
        parts = [_rebuild(sub) for sub in payload]
        return (_struct.pack("<BII", 1, t, len(parts)) + b"".join(parts))
    raise ValueError(f"rebuild unsupported for type {t}")


def reproject_wkb(blob, transformer):
    """Transform every coordinate of one WKB blob (any supported type)."""
    parsed = W.parse_wkb(blob)

    def tx(coords):
        x, y = transformer.transform(coords[:, 0], coords[:, 1])
        return np.stack([x, y], axis=1)

    return _rebuild(_map_coords(parsed, tx))


class VectorReproject:
    """Actor: reproject a WKB column; transformer built once per actor."""

    def __init__(self, src_crs, dst_crs, wkb_col="wkb"):
        self.tf = Transformer(src_crs, dst_crs)
        self.wkb_col = wkb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized: gather every ring of every geometry, transform
        # all coordinates in one call, then rebuild per geometry
        parsed = [W.parse_wkb(b) for b in batch[self.wkb_col].to_pylist()]
        chunks = []

        def collect(node):
            t, payload = node
            if t in (W.POINT, W.LINESTRING):
                chunks.append(payload)
            elif t == W.POLYGON:
                chunks.extend(payload)
            else:
                for sub in payload:
                    collect(sub)

        for p in parsed:
            collect(p)
        if chunks:
            allc = np.concatenate(chunks)
            tx, ty = self.tf.transform(allc[:, 0], allc[:, 1])
            allc = np.stack([tx, ty], axis=1)
            offsets = np.cumsum([0] + [len(c) for c in chunks])
            it = iter(range(len(chunks)))

            def replace(node):
                t, payload = node
                if t in (W.POINT, W.LINESTRING):
                    k = next(it)
                    return (t, allc[offsets[k]:offsets[k + 1]])
                if t == W.POLYGON:
                    out_rings = []
                    for _ in payload:
                        k = next(it)
                        out_rings.append(allc[offsets[k]:offsets[k + 1]])
                    return (t, out_rings)
                return (t, [replace(sub) for sub in payload])

            parsed = [replace(p) for p in parsed]
        out = [_rebuild(p) for p in parsed]
        idx = batch.schema.get_field_index(self.wkb_col)
        return batch.set_column(idx, self.wkb_col,
                                pa.array(out, pa.binary()))


def explode_batch(batch: pa.Table, wkb_col="wkb") -> pa.Table:
    """Multi* → one output row per part; singles pass through.

    Appends ``part_index`` (0-based); other columns replicate.
    """
    take_idx, parts, part_no = [], [], []
    for i, blob in enumerate(batch[wkb_col].to_pylist()):
        t, payload = W.parse_wkb(blob)
        if t in (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON,
                 W.GEOMETRYCOLLECTION):
            for j, sub in enumerate(payload):
                take_idx.append(i)
                parts.append(_rebuild(sub))
                part_no.append(j)
        else:
            take_idx.append(i)
            parts.append(blob)
            part_no.append(0)
    out = batch.take(pa.array(take_idx, pa.int64()))
    idx = out.schema.get_field_index(wkb_col)
    out = out.set_column(idx, wkb_col, pa.array(parts, pa.binary()))
    return out.append_column("part_index", pa.array(part_no, pa.int64()))


def swap_xy(blob):
    return _rebuild(_map_coords(W.parse_wkb(blob),
                                lambda c: c[:, ::-1].copy()))


def segmentize(coords, max_len):
    """Insert vertices so no segment exceeds ``max_len`` (planar)."""
    coords = np.asarray(coords, dtype=np.float64)
    out = [coords[0]]
    for i in range(1, len(coords)):
        seg = coords[i] - coords[i - 1]
        d = float(np.hypot(*seg))
        n = max(int(np.ceil(d / max_len)), 1)  # zero-length segments must
        for k in range(1, n + 1):              # still emit their endpoint
            out.append(coords[i - 1] + seg * (k / n))
    return np.asarray(out)


def simplify_dp(coords, tol):
    """Douglas-Peucker simplification of a (closed or open) line."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 3:
        return coords.copy()
    keep = np.zeros(len(coords), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = coords[b] - coords[a]
        L = np.hypot(*seg)
        pts = coords[a + 1:b]
        if L == 0:
            d = np.hypot(pts[:, 0] - coords[a, 0], pts[:, 1] - coords[a, 1])
        else:
            d = np.abs(np.cross(seg, pts - coords[a])) / L
        imax = int(np.argmax(d))
        if d[imax] > tol:
            m = a + 1 + imax
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return coords[keep]


def _ring_centroid_area(ring):
    """(abs area, centroid) of one ring, orientation-independent."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = cross.sum() / 2.0
    if a == 0:
        return 0.0, (float(x.mean()), float(y.mean()))
    cx = ((x + x1) * cross).sum() / (6.0 * a)
    cy = ((y + y1) * cross).sum() / (6.0 * a)
    return abs(a), (cx, cy)


def centroid(rings):
    """Area-weighted polygon centroid: outer ring minus holes."""
    a0, c0 = _ring_centroid_area(rings[0])
    num_x = a0 * c0[0]
    num_y = a0 * c0[1]
    den = a0
    for hole in rings[1:]:
        ah, ch = _ring_centroid_area(hole)
        num_x -= ah * ch[0]
        num_y -= ah * ch[1]
        den -= ah
    if den == 0:
        allc = np.concatenate(rings)
        return float(allc[:, 0].mean()), float(allc[:, 1].mean())
    return float(num_x / den), float(num_y / den)


def convex_hull(coords):
    """Andrew monotone chain; returns closed CCW ring."""
    pts = np.unique(np.asarray(coords, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return np.vstack([pts, pts[:1]])
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                             p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


def buffer_point(x, y, dist, quad_segs=8):
    """Point buffer: a 4*quad_segs-gon circle (GEOS default segmentation)."""
    n = 4 * quad_segs
    ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([x + dist * np.cos(ang), y + dist * np.sin(ang)],
                    axis=1)
    return np.vstack([ring, ring[:1]])


def _is_convex(ring):
    a = ring[:-1]
    b = np.roll(a, -1, axis=0)
    c = np.roll(a, -2, axis=0)
    cross = np.cross(b - a, c - b)
    return (cross >= -1e-12).all() or (cross <= 1e-12).all()


def buffer_convex(ring, dist, quad_segs=8):
    """Positive buffer of a convex ring: offset edges + vertex arcs.

    Exact for convex input; raises ``NotImplementedError`` for concave
    rings (GEOS-grade buffering is a documented non-goal of this build).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if not _is_convex(ring):
        raise NotImplementedError(
            "buffer of concave rings requires a full offset-curve "
            "algorithm; only point and convex-ring buffers ship in round 1")
    a = ring[:-1]
    b = np.roll(a, -1, axis=0)
    # ensure CCW
    area2 = np.cross(a, b).sum()
    if area2 < 0:
        ring = ring[::-1].copy()
        a = ring[:-1]
        b = np.roll(a, -1, axis=0)
    edges = b - a
    # CCW interior lies left of each edge → outward normal is the right
    # normal (dy, -dx)
    nrm = np.stack([edges[:, 1], -edges[:, 0]], axis=1)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
    out = []
    m = len(a)
    for i in range(m):
        out.append(a[i] + nrm[i] * dist)
        out.append(b[i] + nrm[i] * dist)
        # arc from this edge normal to the next edge's normal at vertex b
        ang0 = np.arctan2(nrm[i][1], nrm[i][0])
        ang1 = np.arctan2(nrm[(i + 1) % m][1], nrm[(i + 1) % m][0])
        while ang1 < ang0:
            ang1 += 2 * np.pi
        steps = max(int(np.ceil((ang1 - ang0) / (np.pi / 2 / quad_segs))), 1)
        for s in range(1, steps):
            t = ang0 + (ang1 - ang0) * s / steps
            out.append(b[i] + dist * np.array([np.cos(t), np.sin(t)]))
    out = np.asarray(out)
    return np.vstack([out, out[:1]])


def geometry_stats_batch(batch: pa.Table, wkb_col="wkb") -> pa.Table:
    """Per-geometry derived columns: area, length (OGR ``Length()``),
    n_parts, n_rings, n_vertices, centroid — the OGR special fields
    (OGR_GEOM_AREA etc.) as a batch op.
    """
    areas, lengths, parts, rings_n, verts, cx, cy = \
        [], [], [], [], [], [], []
    for blob in batch[wkb_col].to_pylist():
        lengths.append(W.wkb_length(blob))
        t = W.wkb_geom_type(blob)
        if t in (W.POLYGON, W.MULTIPOLYGON):
            polys = W.polygons_from_wkb(blob)
            areas.append(sum(W.polygon_area(p) for p in polys))
            parts.append(len(polys))
            rings_n.append(sum(len(p) for p in polys))
            verts.append(sum(len(r) for p in polys for r in p))
            # area-weighted centroid across ALL parts
            num_x = num_y = den = 0.0
            for p in polys:
                a = W.polygon_area(p)
                c = centroid(p)
                num_x += a * c[0]
                num_y += a * c[1]
                den += a
            if den > 0:
                cx.append(num_x / den)
                cy.append(num_y / den)
            else:
                allc = np.concatenate([r for p in polys for r in p])
                cx.append(float(allc[:, 0].mean()))
                cy.append(float(allc[:, 1].mean()))
        else:
            parsed = W.parse_wkb(blob)
            coord_arrays = list(W._iter_coord_arrays(parsed))
            coords = np.concatenate(coord_arrays)
            areas.append(0.0)
            parts.append(len(coord_arrays)
                         if t in (W.MULTIPOINT, W.MULTILINESTRING,
                                  W.GEOMETRYCOLLECTION) else 1)
            rings_n.append(0)
            verts.append(len(coords))
            cx.append(float(coords[:, 0].mean()))
            cy.append(float(coords[:, 1].mean()))
    out = batch
    for name, vals, typ in (("geom_area", areas, pa.float64()),
                            ("geom_length", lengths, pa.float64()),
                            ("n_parts", parts, pa.int64()),
                            ("n_rings", rings_n, pa.int64()),
                            ("n_vertices", verts, pa.int64()),
                            ("centroid_x", cx, pa.float64()),
                            ("centroid_y", cy, pa.float64())):
        out = out.append_column(name, pa.array(vals, typ))
    return out


def raster_footprint(valid_mask, gt, simplify_tol=0.0, hull=False):
    """Raster footprint: valid mask → boundary polygons (world coords).

    The ``gdal footprint`` chain (``apps/gdal_footprint_lib.cpp:143-191``):
    mask → per-component polygonize boundary → optional Douglas-Peucker
    simplify → optional convex hull (of all components together, like the
    reference's convex-hull mode).  Returns a list of closed rings, one
    per connected component ([] for an empty mask); with ``hull=True`` a
    single-ring list.
    """
    mask = np.asarray(valid_mask, dtype=bool)
    if not mask.any():
        return []
    labels = label_components(mask.astype(np.int8), 4, background=0)
    rings = []
    for lab in range(1, labels.max() + 1):
        ring_px = trace_boundary(labels == lab)
        if simplify_tol > 0:
            ring_px = simplify_dp(ring_px, simplify_tol)
            if (ring_px[0] != ring_px[-1]).any():
                ring_px = np.vstack([ring_px, ring_px[:1]])
        rings.append(ring_px)
    if hull:
        rings = [convex_hull(np.concatenate(rings))]
    out = []
    for ring_px in rings:
        gx = gt[0] + ring_px[:, 0] * gt[1] + ring_px[:, 1] * gt[2]
        gy = gt[3] + ring_px[:, 0] * gt[4] + ring_px[:, 1] * gt[5]
        out.append(np.stack([gx, gy], axis=1))
    return out


def _seg_intersection_point(p1, p2, q1, q2):
    """Proper intersection point of two segments, or None."""
    r = p2 - p1
    s = q2 - q1
    rxs = r[0] * s[1] - r[1] * s[0]
    if rxs == 0:
        return None
    qp = q1 - p1
    t = (qp[0] * s[1] - qp[1] * s[0]) / rxs
    u = (qp[0] * r[1] - qp[1] * r[0]) / rxs
    if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
        return p1 + t * r
    return None


def make_valid_ring(ring, eps=1e-9):
    """Split a self-intersecting ring into simple loops (MakeValid).

    Reference: ``OGRGeometry::MakeValid`` (``ogr/ogrgeometry.cpp:3922``)
    produces a valid geometry covering the same point set; for the
    common self-intersection cases (bow-tie / figure-eight / pinch
    points) that is the set of simple loops between repeated crossing
    points, which is what this computes:

    1. subdivide every segment at its proper intersections with
       non-adjacent segments;
    2. walk the subdivided ring with a stack — when a point repeats,
       the vertices since its first occurrence close one loop.

    Returns a list of closed rings (each simple, nonzero area).  A ring
    that is already simple comes back unchanged as ``[ring]``.
    """
    ring = np.asarray(ring, dtype=np.float64)
    pts = ring[:-1]
    n = len(pts)
    # collect split points per segment
    splits = {i: [] for i in range(n)}
    any_split = False
    for i in range(n):
        p1, p2 = pts[i], pts[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            q1, q2 = pts[j], pts[(j + 1) % n]
            x = _seg_intersection_point(p1, p2, q1, q2)
            if x is not None:
                any_split = True
                splits[i].append(((x[0] - p1[0]) ** 2
                                  + (x[1] - p1[1]) ** 2, x))
                splits[j].append(((x[0] - q1[0]) ** 2
                                  + (x[1] - q1[1]) ** 2, x))
    if not any_split:
        return [np.vstack([pts, pts[:1]])]
    walk = []
    for i in range(n):
        walk.append(pts[i])
        for _, x in sorted(splits[i], key=lambda kv: kv[0]):
            walk.append(x)
    # stack-based loop extraction on (rounded) repeated points
    loops = []
    stack = []
    seen = {}

    def key(p):
        return (round(float(p[0]) / eps) * eps,
                round(float(p[1]) / eps) * eps)

    for p in walk + [walk[0]]:
        k = key(p)
        if k in seen:
            start = seen[k]
            loop = stack[start:]
            if len(loop) >= 3:
                closed = np.vstack([loop, [loop[0]]])
                if abs(W.polygon_area([closed])) > eps:
                    loops.append(closed)
            for q in stack[start:]:
                seen.pop(key(q), None)
            del stack[start:]
            if k not in seen:
                seen[k] = len(stack)
                stack.append(np.asarray(p, dtype=np.float64))
        else:
            seen[k] = len(stack)
            stack.append(np.asarray(p, dtype=np.float64))
    if len(stack) >= 3:
        closed = np.vstack([stack, [stack[0]]])
        if abs(W.polygon_area([closed])) > eps:
            loops.append(closed)
    return loops


def buffer_ring(ring, dist, px=None):
    """Buffer of an ARBITRARY (concave OK) ring via its distance field.

    The exact Euclidean distance transform of the rasterized interior is
    contoured at ``dist`` (marching squares) — a resolution-bounded
    approximation (error ≤ ~1 px) that composes two operators the engine
    already trusts (fill.proximity EDT + contour marching squares)
    instead of a GEOS-grade offset-curve algorithm.  ``px`` defaults to
    dist/8.  Returns a list of closed rings in world coordinates.
    """
    ring = np.asarray(ring, dtype=np.float64)
    if dist <= 0:
        raise ValueError("buffer_ring needs dist > 0")
    if px is None:
        px = dist / 8.0
    x0, y0 = ring[:, 0].min(), ring[:, 1].min()
    x1, y1 = ring[:, 0].max(), ring[:, 1].max()
    pad = dist + 3 * px
    gx0, gy0 = x0 - pad, y0 - pad
    w = int(np.ceil((x1 - x0 + 2 * pad) / px)) + 1
    h = int(np.ceil((y1 - y0 + 2 * pad) / px)) + 1
    xs = gx0 + (np.arange(w) + 0.5) * px
    ys = gy0 + (np.arange(h) + 0.5) * px
    XX, YY = np.meshgrid(xs, ys)
    inside = W.points_in_polygon([ring], XX.ravel(),
                                 YY.ravel()).reshape(h, w)
    d = np.sqrt(_edt2(inside)) * px  # distance to the interior (0 inside)
    segs = contour_segments(d, dist)
    rings = chain_segments(segs)
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        # contour coords are (col+0.5, row+0.5)-based pixel coords? they
        # are (x=col, y=row) grid coords at cell centers — map to world
        wr = np.stack([gx0 + (r[:, 0] + 0.5) * px,
                       gy0 + (r[:, 1] + 0.5) * px], axis=1)
        if not np.allclose(wr[0], wr[-1]):
            wr = np.vstack([wr, wr[:1]])
        out.append(wr)
    return out


# ---------------------------------------------------------------------------
# round-3 scalars: UnaryUnion / ConcaveHull / SimplifyPreserveTopology
# (ogr/ogrgeometry.cpp:5227, :4305, :6419 — GEOS-backed in the
# reference; implemented here on the engine's own kernels)


def unary_union_polys(polys_list):
    """UnaryUnion (ogrgeometry.cpp:5227): dissolve a collection of
    polygons into one (multi)polygon via the general boolean engine."""
    return union_all(polys_list)


def unary_union_wkb(blobs):
    """UnaryUnion over WKB polygon blobs → (wkb, area)."""
    polys = [W.polygons_from_wkb(b) for b in blobs]
    merged = unary_union_polys(polys)
    if not merged:
        return None, 0.0
    blob = (W.polygon_wkb(merged[0]) if len(merged) == 1
            else W.multipolygon_wkb(merged))
    return blob, sum(polygon_area_rings(p) for p in merged)


def _ring_self_intersects(ring):
    """True if any two non-adjacent segments of the closed ring cross."""
    r = np.asarray(ring, dtype=np.float64)
    segs = np.stack([r[:-1], r[1:]], axis=1)
    n = len(segs)
    if n < 4:
        return False
    m = W.segments_cross_matrix(segs, segs)
    # mask self + adjacent (wrap-around) pairs
    idx = np.arange(n)
    adj = (np.abs(idx[:, None] - idx[None, :]) <= 1) | \
        (np.abs(idx[:, None] - idx[None, :]) == n - 1)
    return bool((m & ~adj).any())


def simplify_preserve_topology(ring, tol):
    """SimplifyPreserveTopology (ogrgeometry.cpp:6419 semantics):
    Douglas-Peucker on the closed ring, backing the tolerance off
    (halving) until the result keeps ≥4 vertices and stays simple —
    the ring never collapses or self-intersects, unlike plain
    Simplify."""
    ring = np.asarray(ring, dtype=np.float64)
    t = float(tol)
    for _ in range(64):
        r = simplify_dp(ring, t)
        if len(r) >= 4 and not _ring_self_intersects(r):
            return r
        t /= 2.0
        if t <= 0:
            break
    return ring.copy()


def concave_hull(points, ratio=0.3):
    """ConcaveHull of a point set (ogrgeometry.cpp:4305 semantics —
    GEOS ConcaveHullOfPoints): Delaunay triangulation eroded by the
    chi-shape rule (Duckham et al. 2008) — repeatedly remove the
    border triangle whose boundary edge is longest, while the edge
    exceeds ``lmin + ratio·(lmax−lmin)`` and removal keeps the shape
    regular (the exposed vertex is interior).  ``ratio=1`` returns the
    convex hull; smaller ratios hug concavities.  Returns a closed
    (N, 2) ring (CCW)."""
    import heapq

    pts = np.asarray(points, dtype=np.float64)
    scale = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-12)
    # deterministic symbolic perturbation: cocircular point sets (grids,
    # arcs) break the incremental incircle test — jitter the COPY used
    # for triangulation, keep original coords for output
    tris = np.empty((0, 3))
    for mag in (1e-9, 1e-7, 1e-5):
        rs = np.random.RandomState(12345)
        jit = pts + (rs.rand(*pts.shape) - 0.5) * scale * mag
        tris = delaunay_triangulate(jit)
        if len(tris) == 0:
            continue
        V = len(np.unique(tris))
        edges = set()
        for t in map(tuple, tris.tolist()):
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges.add((a, b) if a < b else (b, a))
        if V - len(edges) + len(tris) == 1:   # triangulated disc
            break
    if len(tris) == 0:
        raise ValueError("concave_hull needs ≥3 non-collinear points")
    alive = set(map(tuple, tris.tolist()))

    def edge_key(a, b):
        return (a, b) if a < b else (b, a)

    def elen(e):
        return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

    # edge → incident alive triangles
    inc = {}
    for t in alive:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            inc.setdefault(edge_key(*e), []).append(t)
    all_lens = [elen(e) for e in inc]
    lmin, lmax = min(all_lens), max(all_lens)
    threshold = lmin + float(ratio) * (lmax - lmin)

    def boundary_edges():
        return [e for e, ts in inc.items()
                if sum(1 for t in ts if t in alive) == 1]

    heap = [(-elen(e), e) for e in boundary_edges()]
    heapq.heapify(heap)
    vert_on_boundary = set()
    for e in boundary_edges():
        vert_on_boundary.update(e)
    while heap:
        neg, e = heapq.heappop(heap)
        if -neg <= threshold:
            break
        ts = [t for t in inc.get(e, ()) if t in alive]
        if len(ts) != 1:
            continue  # stale heap entry
        t = ts[0]
        apex = next(v for v in t if v not in e)
        # regularity: removing must not pinch the region — apex must be
        # interior, and the triangle must have exactly one border edge
        others = [edge_key(*pair) for pair in ((t[0], t[1]), (t[1], t[2]),
                                               (t[2], t[0]))
                  if edge_key(*pair) != e]
        border_count = sum(
            1 for o in others
            if sum(1 for x in inc.get(o, ()) if x in alive) == 1)
        if apex in vert_on_boundary or border_count or len(alive) == 1:
            continue
        alive.remove(t)
        vert_on_boundary.add(apex)
        for o in others:
            heapq.heappush(heap, (-elen(o), o))

    # chain the boundary edges of the remaining triangulation
    border = [e for e, ts in inc.items()
              if sum(1 for t in ts if t in alive) == 1]
    nxt = {}
    for a, b in border:
        nxt.setdefault(a, []).append(b)
        nxt.setdefault(b, []).append(a)
    start = border[0][0]
    ringv = [start]
    prev = None
    cur = start
    for _ in range(len(border)):
        cands = [v for v in nxt[cur] if v != prev]
        if not cands:
            break
        prev, cur = cur, cands[0]
        if cur == start:
            break
        ringv.append(cur)
    ring = np.vstack([pts[ringv], pts[ringv[:1]]])
    if ring_area(ring) < 0:
        ring = ring[::-1]
    return ring


# ---------------------------------------------------------------------------
# round-5 blob-level wrappers: the ``gdal vector`` per-geometry verbs
# (apps/gdalalg_vector_segmentize.cpp, _simplify.cpp, _buffer.cpp,
# _make_valid.cpp) as WKB → WKB functions, so the pipeline/CLI can
# expose one step per verb over any geometry type the codec parses.


def segmentize_wkb(blob, max_length):
    """``vector segmentize`` (OGRGeometry::segmentize): densify every
    coordinate run so no segment exceeds ``max_length``."""
    return _rebuild(_map_coords(W.parse_wkb(blob),
                                lambda c: segmentize(c, max_length)))


def simplify_wkb(blob, tolerance):
    """``vector simplify`` (non-topology-preserving Douglas-Peucker,
    ``ogr/ogrgeometry.cpp:6360``) applied per coordinate run."""
    return _rebuild(_map_coords(W.parse_wkb(blob),
                                lambda c: simplify_dp(c, tolerance)))


def make_valid_wkb(blob):
    """``vector make-valid`` over a WKB (multi)polygon.

    Reference: ``OGRGeometry::MakeValid`` (``ogr/ogrgeometry.cpp:3922``,
    GEOS Structure method).  Scope here matches the engine's
    :func:`make_valid_ring` contract: self-intersecting rings split
    into their simple loops.  Outer-ring loops become shells; each hole
    loop attaches to the first shell containing its first vertex
    (unmatched holes become standalone shells, like GEOS' keep-collapsed
    Structure fallback).  Already-valid input returns unchanged.
    Non-polygonal input passes through untouched (the reference's
    MakeValid is a no-op for valid lines/points).
    """
    t = W.wkb_geom_type(blob)
    if t not in (W.POLYGON, W.MULTIPOLYGON):
        return blob
    shells, holes = [], []
    dirty = False
    for rings in W.polygons_from_wkb(blob):
        for ri, ring in enumerate(rings):
            loops = make_valid_ring(np.asarray(ring, dtype=np.float64))
            if len(loops) > 1:
                dirty = True
            (shells if ri == 0 else holes).extend(loops)
    if not dirty:
        return blob
    polys = [[s] for s in shells]
    for h in holes:
        for p in polys:
            if bool(W.points_in_ring(p[0], h[:1, 0], h[:1, 1])[0]):
                p.append(h)
                break
        else:
            polys.append([h])
    if len(polys) == 1:
        return W.polygon_wkb(polys[0])
    return W.multipolygon_wkb(polys)


def erode_ring(ring, dist, px=None):
    """Negative buffer (erosion) of the region enclosed by ``ring``:
    the distance field measured INWARD from the boundary, contoured at
    ``dist`` — the complement construction of :func:`buffer_ring`,
    same resolution bound (error ≤ ~1 px).  Returns the surviving
    rings (possibly none — the region can vanish)."""
    ring = np.asarray(ring, dtype=np.float64)
    if dist <= 0:
        raise ValueError("erode_ring needs dist > 0")
    if px is None:
        px = dist / 8.0
    x0, y0 = ring[:, 0].min(), ring[:, 1].min()
    x1, y1 = ring[:, 0].max(), ring[:, 1].max()
    pad = 3 * px
    gx0, gy0 = x0 - pad, y0 - pad
    w = int(np.ceil((x1 - x0 + 2 * pad) / px)) + 1
    h = int(np.ceil((y1 - y0 + 2 * pad) / px)) + 1
    xs = gx0 + (np.arange(w) + 0.5) * px
    ys = gy0 + (np.arange(h) + 0.5) * px
    XX, YY = np.meshgrid(xs, ys)
    inside = W.points_in_polygon([ring], XX.ravel(),
                                 YY.ravel()).reshape(h, w)
    d = np.sqrt(_edt2(~inside)) * px   # distance to the EXTERIOR
    segs = contour_segments(d, dist)
    out = []
    for r in chain_segments(segs):
        r = np.asarray(r, dtype=np.float64)
        wr = np.stack([gx0 + (r[:, 0] + 0.5) * px,
                       gy0 + (r[:, 1] + 0.5) * px], axis=1)
        if not np.allclose(wr[0], wr[-1]):
            wr = np.vstack([wr, wr[:1]])
        if abs(ring_area(wr)) > (2 * px) ** 2:
            out.append(wr)
    return out


def buffer_wkb(blob, distance, quad_segs=8, px=None):
    """``vector buffer`` over WKB: exact circle/offset-arc buffers for
    points and convex rings (:func:`buffer_point` /
    :func:`buffer_convex`); concave rings route through the
    distance-field buffer (:func:`buffer_ring`, error ≤ ~1 px of its
    grid).  Lines and negative distances raise — same documented scope
    as the underlying kernels."""
    if distance <= 0:
        raise ValueError("buffer_wkb needs distance > 0")
    t, payload = W.parse_wkb(blob)
    if t == W.POINT:
        return W.polygon_wkb([buffer_point(payload[0, 0], payload[0, 1],
                                           distance, quad_segs)])
    if t == W.MULTIPOINT:
        return W.multipolygon_wkb(
            [[buffer_point(p[0, 0], p[0, 1], distance, quad_segs)]
             for (_, p) in payload])
    if t in (W.POLYGON, W.MULTIPOLYGON):
        out = []
        for rings in ([payload] if t == W.POLYGON
                      else [p for (_, p) in payload]):
            outer = np.asarray(rings[0], dtype=np.float64)
            if _is_convex(outer):
                poly = [buffer_convex(outer, distance, quad_segs)]
            else:
                loops = buffer_ring(outer, distance, px=px)
                poly = [max(loops, key=lambda r: abs(ring_area(r)))]
            # positive buffer SHRINKS holes by the same distance
            # (GEOS Buffer keeps eroded interior rings); holes that
            # erode away vanish
            for hole in rings[1:]:
                poly.extend(erode_ring(
                    np.asarray(hole, dtype=np.float64), distance,
                    px=px))
            out.append(poly)
        if len(out) == 1:
            return W.polygon_wkb(out[0])
        return W.multipolygon_wkb(out)
    raise NotImplementedError(
        f"buffer of WKB geometry type {t} is out of scope "
        "(points and polygons ship; lines need a full offset curve)")


def simplify_coverage(rings_by_id, tolerance):
    """Coverage-preserving simplification — ``gdal vector
    simplify-coverage`` (apps/gdalalg_vector_simplify_coverage.cpp,
    GEOS 3.12 CoverageSimplifier semantics): every shared boundary
    simplifies ONCE, so adjacent polygons keep identical edges and the
    coverage stays gap- and overlap-free.

    ``rings_by_id``: {feature_id: outer ring ndarray (closed)}.
    Algorithm: (1) decompose rings into undirected edges and find
    junction nodes (vertex degree != 2 in the shared-edge graph);
    (2) cut each ring into arcs at junctions; (3) Douglas-Peucker each
    UNIQUE arc once (endpoints pinned); (4) rebuild every ring from
    the shared simplified arcs.  Rings with no junctions simplify as
    one closed arc anchored at their first vertex.
    """
    def key(p):
        return (float(p[0]), float(p[1]))

    # 1. undirected edge degree per vertex
    from collections import defaultdict

    neighbors = defaultdict(set)
    for rid, ring in rings_by_id.items():
        pts = np.asarray(ring, dtype=np.float64)
        for i in range(len(pts) - 1):
            a, b = key(pts[i]), key(pts[i + 1])
            neighbors[a].add(b)
            neighbors[b].add(a)
    junctions = {v for v, ns in neighbors.items() if len(ns) != 2}

    # 2/3. arcs, simplified once per unique undirected chain
    cache = {}

    def simp_arc(chain):
        k_fwd = tuple(key(p) for p in chain)
        k_rev = k_fwd[::-1]
        if k_fwd in cache:
            return cache[k_fwd]
        if k_rev in cache:
            return cache[k_rev][::-1]
        out = simplify_dp(np.asarray(chain, dtype=np.float64),
                          tolerance)
        cache[k_fwd] = out
        return out

    out_rings = {}
    for rid, ring in rings_by_id.items():
        pts = np.asarray(ring, dtype=np.float64)[:-1]  # drop closure
        n = len(pts)
        cut = [i for i in range(n) if key(pts[i]) in junctions]
        if not cut:
            # closed isolated ring: anchor at vertex 0 so the shared
            # cache still applies if an identical ring recurs
            closed = np.vstack([pts, pts[:1]])
            s = simp_arc(closed)
            if len(s) < 4:
                s = closed  # too coarse to stay a ring — keep input
            out_rings[rid] = s
            continue
        parts = []
        for ci in range(len(cut)):
            i0, i1 = cut[ci], cut[(ci + 1) % len(cut)]
            if i1 > i0:
                chain = pts[i0:i1 + 1]
            else:
                chain = np.vstack([pts[i0:], pts[:i1 + 1]])
            parts.append(simp_arc(chain))
        seq = [parts[0]]
        for p in parts[1:]:
            seq.append(p[1:])
        ring_out = np.vstack(seq)
        if not np.array_equal(ring_out[0], ring_out[-1]):
            ring_out = np.vstack([ring_out, ring_out[:1]])
        out_rings[rid] = ring_out
    return out_rings
