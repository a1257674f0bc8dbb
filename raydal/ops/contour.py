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

__all__ = ["contour_segments", "chain_segments", "contour_length"]

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
