"""Contour extraction — marching squares over pixel-center grids.

The reference's contour writer (``alg/contour.cpp`` +
``alg/marching_squares/*.h``) walks the same cell classification; this
implementation emits the per-cell iso-segments fully vectorized (one pass
per case id over all cells), with the standard center-average rule for the
two saddle cases.  Segments are in pixel-center coordinates (or world
coordinates when a geotransform is given); polyline chaining is provided
for closed/open line assembly.

Distribution shape: embarrassingly parallel per tile; cross-tile chaining
keys segments by their shared-edge endpoints (same pattern as the
polygonize edge dissolve).
"""

from __future__ import annotations

import numpy as np

__all__ = ["contour_segments", "chain_segments", "contour_length",
           "contour_polygons", "band_areas", "generate_levels"]

# case → list of (edge_in, edge_out) pairs; edges: 0=top,1=right,2=bottom,3=left
_CASES = {
    1: [(3, 2)], 2: [(2, 1)], 3: [(3, 1)], 4: [(0, 1)],
    6: [(0, 2)], 7: [(3, 0)], 8: [(0, 3)],
    9: [(0, 2)], 11: [(0, 1)], 12: [(3, 1)],
    13: [(2, 1)], 14: [(3, 2)],
}
# saddles resolved per cell by the center average: 5 → like (1&4) or (7&13)


def _edge_points(edge, y, x, fx_top, fx_bot, fy_left, fy_right):
    """Interpolated point on a cell edge (pixel-center coords)."""
    if edge == 0:   # top: between (y, x) and (y, x+1)
        return x + fx_top, y
    if edge == 2:   # bottom: between (y+1, x) and (y+1, x+1)
        return x + fx_bot, y + 1.0
    if edge == 3:   # left: between (y, x) and (y+1, x)
        return x * 1.0, y + fy_left
    return x + 1.0, y + fy_right  # right


def contour_segments(arr, level, gt=None):
    """Iso-segments of ``arr`` at ``level`` → (N, 2, 2) float64.

    Coordinates are pixel-center based ((col, row) of the top-left sample
    = (0, 0)); with ``gt`` they are mapped to world coordinates of pixel
    centers.
    """
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    if h < 2 or w < 2:
        return np.empty((0, 2, 2))
    tl = a[:-1, :-1]
    tr = a[:-1, 1:]
    bl = a[1:, :-1]
    br = a[1:, 1:]
    case = ((tl >= level).astype(np.int8) * 8
            + (tr >= level).astype(np.int8) * 4
            + (br >= level).astype(np.int8) * 2
            + (bl >= level).astype(np.int8))

    with np.errstate(divide="ignore", invalid="ignore"):
        fx_top = (level - tl) / (tr - tl)
        fx_bot = (level - bl) / (br - bl)
        fy_left = (level - tl) / (bl - tl)
        fy_right = (level - tr) / (br - tr)
    for f in (fx_top, fx_bot, fy_left, fy_right):
        np.clip(f, 0.0, 1.0, out=f)
        np.nan_to_num(f, copy=False, nan=0.5)

    segs = []

    def emit(mask, pairs):
        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            return
        for e0, e1 in pairs:
            p0x, p0y = _edge_points(e0, ys.astype(np.float64),
                                    xs.astype(np.float64),
                                    fx_top[ys, xs], fx_bot[ys, xs],
                                    fy_left[ys, xs], fy_right[ys, xs])
            p1x, p1y = _edge_points(e1, ys.astype(np.float64),
                                    xs.astype(np.float64),
                                    fx_top[ys, xs], fx_bot[ys, xs],
                                    fy_left[ys, xs], fy_right[ys, xs])
            seg = np.stack([np.stack([p0x, p0y], axis=1),
                            np.stack([p1x, p1y], axis=1)], axis=1)
            segs.append(seg)

    for c, pairs in _CASES.items():
        emit(case == c, pairs)
    # saddle cases: center mean decides the pairing
    center = (tl + tr + bl + br) / 4.0
    emit((case == 5) & (center >= level), [(3, 0), (2, 1)])
    emit((case == 5) & (center < level), [(3, 2), (0, 1)])
    emit((case == 10) & (center >= level), [(0, 1), (3, 2)])
    emit((case == 10) & (center < level), [(0, 3), (2, 1)])

    if not segs:
        return np.empty((0, 2, 2))
    out = np.concatenate(segs)
    if gt is not None:
        # pixel-center (col, row) → world
        px = out[..., 0] + 0.5
        py = out[..., 1] + 0.5
        wx = gt[0] + px * gt[1] + py * gt[2]
        wy = gt[3] + px * gt[4] + py * gt[5]
        out = np.stack([wx, wy], axis=-1)
    return out


def chain_segments(segments, tol=1e-9):
    """Greedy chaining of an iso-segment soup into polylines.

    Endpoint matching is orientation-agnostic (segments flip as needed)
    and lines extend from both ends.  Returns a list of (M, 2) arrays;
    closed rings end where they start.
    """
    if len(segments) == 0:
        return []
    scale = 1.0 / max(tol, 1e-12)

    def key(p):
        return (round(p[0] * scale), round(p[1] * scale))

    by_end = {}
    for i, seg in enumerate(segments):
        by_end.setdefault(key(seg[0]), []).append(i)
        by_end.setdefault(key(seg[1]), []).append(i)
    used = np.zeros(len(segments), dtype=bool)
    lines = []
    for i in range(len(segments)):
        if used[i]:
            continue
        used[i] = True
        line = [segments[i][0].copy(), segments[i][1].copy()]

        def extend(tail):
            """Grow from the line's tail (append) until no match."""
            while True:
                k = key(line[-1] if tail else line[0])
                nxt = None
                for j in by_end.get(k, []):
                    if not used[j]:
                        nxt = j
                        break
                if nxt is None:
                    return
                used[nxt] = True
                seg = segments[nxt]
                # orient so the matched endpoint touches the line
                if key(seg[0]) == k:
                    p = seg[1].copy()
                else:
                    p = seg[0].copy()
                if tail:
                    line.append(p)
                else:
                    line.insert(0, p)

        extend(True)
        extend(False)
        lines.append(np.asarray(line))
    return lines


def contour_length(segments):
    """Total length of an iso-segment set."""
    if len(segments) == 0:
        return 0.0
    d = segments[:, 1, :] - segments[:, 0, :]
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


# ---------------------------------------------------------------------------
# Polygonal contouring (the reference's POLYGONIZE mode,
# alg/contour.cpp:681 + polygon_ring_appender.h): between consecutive
# levels the band region {lo <= z < hi} becomes polygons with holes.
# ---------------------------------------------------------------------------

def _inband_interval(z0, z1, lo, hi):
    """Sub-interval of t in [0, 1] where the linear z(t) from z0 to z1
    satisfies lo <= z < hi (half-open-ness has measure zero; crossing
    params use the exact marching-squares formula so ring endpoints
    chain bit-identically)."""
    if z1 == z0:
        return (0.0, 1.0) if lo <= z0 < hi else None
    inv = 1.0 / (z1 - z0)
    if np.isfinite(lo):
        tc = (lo - z0) * inv
        ge_lo = (max(0.0, tc), 1.0) if z1 > z0 else (0.0, min(1.0, tc))
    else:
        ge_lo = (0.0, 1.0)
    if np.isfinite(hi):
        th = (hi - z0) * inv
        lt_hi = (0.0, min(1.0, th)) if z1 > z0 else (max(0.0, th), 1.0)
    else:
        lt_hi = (0.0, 1.0)
    ta = max(ge_lo[0], lt_hi[0])
    tb = min(ge_lo[1], lt_hi[1])
    return (ta, tb) if tb - ta > 1e-12 else None


def _border_pieces(a, lo, hi):
    """Boundary-of-domain segments where the border z lies in the band.

    The domain is the pixel-center rectangle [0, w-1] x [0, h-1]; z is
    linear along each border edge between adjacent centers."""
    h, w = a.shape
    sides = [
        (a[0, :], lambda t: (t, 0.0)),
        (a[:, -1], lambda t: (float(w - 1), t)),
        (a[-1, ::-1], lambda t: (float(w - 1) - t, float(h - 1))),
        (a[::-1, 0], lambda t: (0.0, float(h - 1) - t)),
    ]
    out = []
    for vals, to_xy in sides:
        v = np.asarray(vals, np.float64)
        for i in range(len(v) - 1):
            iv = _inband_interval(v[i], v[i + 1], lo, hi)
            if iv is None:
                continue
            p0 = to_xy(i + iv[0])
            p1 = to_xy(i + iv[1])
            out.append([[p0[0], p0[1]], [p1[0], p1[1]]])
    return np.asarray(out, np.float64) if out else np.empty((0, 2, 2))


def _ring_signed_area(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _point_in_ring(px, py, r):
    """Even-odd crossing test (ring closed: r[0] == r[-1])."""
    x, y = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
    cond = (y <= py) != (y2 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.count_nonzero(cond & (xs > px)) & 1)


def _inband_delta(v, a, lo, hi):
    """Unit direction ALONG the grid edge holding vertex ``v`` that
    points toward the in-band side.  z is LINEAR along grid edges, so
    this side is exact — no bilinear-vs-chord curvature ambiguity.
    Returns None for vertices at grid samples (degenerate crossings)."""
    h, w = a.shape
    eps = 1e-6
    x, y = float(v[0]), float(v[1])
    on_ix = abs(x - round(x)) < 1e-9
    on_iy = abs(y - round(y)) < 1e-9
    if on_ix == on_iy:                    # at a sample, or off-grid
        return None
    if on_iy:                             # horizontal grid edge
        row = int(round(y))
        c0 = int(np.floor(x))
        if not (0 <= row < h and 0 <= c0 < w - 1):
            return None
        z0, z1 = a[row, c0], a[row, c0 + 1]
        t = x - c0
        for dt in (eps, -eps):
            tt = t + dt
            if 0.0 < tt < 1.0 and lo <= z0 + tt * (z1 - z0) < hi:
                return (1.0, 0.0) if dt > 0 else (-1.0, 0.0)
    else:                                 # vertical grid edge
        col = int(round(x))
        r0 = int(np.floor(y))
        if not (0 <= col < w and 0 <= r0 < h - 1):
            return None
        z0, z1 = a[r0, col], a[r0 + 1, col]
        t = y - r0
        for dt in (eps, -eps):
            tt = t + dt
            if 0.0 < tt < 1.0 and lo <= z0 + tt * (z1 - z0) < hi:
                return (0.0, 1.0) if dt > 0 else (0.0, -1.0)
    return None


def _ring_is_outer(ring, a, lo, hi):
    """Outer iff the in-band side points INTO the ring's interior,
    decided by an exact local wedge test at a transversal crossing
    vertex (a PIP ray from a point 1e-6 off a vertex is
    ill-conditioned; the wedge test is not).  Rings with no usable
    vertex consist of border runs only — always outers (an all-border
    hole would put the band outside the domain)."""
    area = _ring_signed_area(ring)
    pts = ring[:-1]
    n = len(pts)
    for i in range(n):
        d = _inband_delta(pts[i], a, lo, hi)
        if d is None:
            continue
        u = pts[i] - pts[i - 1]
        w = pts[(i + 1) % n] - pts[i]
        cu = u[0] * d[1] - u[1] * d[0]
        cw = w[0] * d[1] - w[1] * d[0]
        if abs(cu) < 1e-9 * np.hypot(*u) or \
                abs(cw) < 1e-9 * np.hypot(*w):
            continue                      # delta parallel to an edge
        if u[0] * w[1] - u[1] * w[0] >= 0:
            inside = cu > 0 and cw > 0    # convex vertex (interior-left)
        else:
            inside = cu > 0 or cw > 0     # reflex vertex
        return inside if area > 0 else not inside
    return True


def contour_polygons(arr, levels, gt=None):
    """Polygonal contouring: band polygons between consecutive levels.

    Mirrors the reference's POLYGONIZE option (``alg/contour.cpp:681``,
    ring assembly per ``alg/marching_squares/polygon_ring_appender.h``):
    for bands (-inf, l0), [l0, l1), ..., [lk, +inf) the region
    {lo <= z < hi} over the pixel-center domain becomes rings (iso
    segments at the two bounding levels plus domain-border pieces),
    classified into outers and holes.

    Returns a list of dicts ``{"lo", "hi", "polys": [(outer, [holes])]}``
    with rings as (M, 2) float64 arrays (closed; pixel-center coords, or
    world coords when ``gt`` is given).
    """
    a = np.asarray(arr, np.float64)
    lv = sorted(float(l) for l in levels)
    bounds = [-np.inf] + lv + [np.inf]
    out = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        soup = [s for s in (
            contour_segments(a, lo) if np.isfinite(lo) else None,
            contour_segments(a, hi) if np.isfinite(hi) else None,
            _border_pieces(a, lo, hi)) if s is not None and len(s)]
        polys = []
        if soup:
            rings = [r for r in chain_segments(np.concatenate(soup))
                     if len(r) >= 4
                     and np.hypot(*(r[0] - r[-1])) < 1e-7]
            outers, holes = [], []
            for r in rings:
                if abs(_ring_signed_area(r)) < 1e-12:
                    continue
                if _ring_is_outer(r, a, lo, hi):
                    outers.append(r)
                else:
                    holes.append(r)
            polys = [(o, []) for o in outers]
            for hr in holes:
                # smallest containing outer gets the hole
                cands = [(abs(_ring_signed_area(o)), k)
                         for k, (o, _) in enumerate(polys)
                         if _point_in_ring(hr[0, 0], hr[0, 1], o)]
                if cands:
                    polys[min(cands)[1]][1].append(hr)
        if gt is not None:
            def _world(r):
                px = r[:, 0] + 0.5
                py = r[:, 1] + 0.5
                return np.stack([gt[0] + px * gt[1] + py * gt[2],
                                 gt[3] + px * gt[4] + py * gt[5]],
                                axis=1)
            polys = [(_world(o), [_world(x) for x in hs])
                     for o, hs in polys]
        out.append({"lo": lo, "hi": hi, "polys": polys})
    return out


def band_areas(arr, levels, gt=None):
    """Absolute band areas (outer minus holes) per level interval —
    the scalar the polygonal-contour oracle pins down in closed form."""
    res = contour_polygons(arr, levels, gt=gt)
    return [(b["lo"], b["hi"],
             sum(abs(_ring_signed_area(o))
                 - sum(abs(_ring_signed_area(x)) for x in hs)
                 for o, hs in b["polys"]))
            for b in res]


def generate_levels(zmin, zmax, interval=None, base=0.0, exp_base=None,
                    fixed=None):
    """Contour level generation mirroring the reference's iterators
    (``alg/marching_squares/level_generator.h``): an explicit
    ``fixed`` list has precedence; ``exp_base`` generates
    ``exp_base**k`` levels; else ``base + k*interval`` for every k
    with the level inside [zmin, zmax] (GDAL's LEVEL_BASE /
    LEVEL_INTERVAL / LEVEL_EXP_BASE options)."""
    zmin, zmax = float(zmin), float(zmax)
    if fixed is not None:
        return [float(l) for l in fixed]
    if exp_base is not None:
        b = float(exp_base)
        if b <= 1.0:
            raise ValueError("exp_base must be > 1")
        out, k = [], 0
        while b ** k <= zmax:
            if b ** k >= zmin and b ** k > 0:
                out.append(b ** k)
            k += 1
            if k > 1024:
                break
        return out
    if interval is None or interval <= 0:
        raise ValueError("need fixed levels, interval > 0, or exp_base")
    k1 = int(np.ceil((zmin - base) / interval))
    k2 = int(np.floor((zmax - base) / interval))
    return [base + k * interval for k in range(k1, k2 + 1)]
