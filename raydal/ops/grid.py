"""Point-cloud → raster interpolation (the gdal_grid family).

Algorithms follow ``alg/gdal_alg.h:400-416`` / ``alg/gdalgrid.cpp``:
``invdist`` (inverse-distance-to-a-power with radius + smoothing),
``invdistnn`` (IDW over the N nearest, found by the cell-ring expansion
that mirrors the reference's expanding quadtree search,
``alg/gdalgrid.cpp:347-426``), ``average``, ``nearest``, and the data
metrics ``minimum / maximum / range / count / average_distance``.

Distribution shape: the point cloud is grid-bucketed once
(:func:`raydal.ops.join.build_cell_points` — broadcastable), each output
tile is computed by one task from the buckets overlapping its search
radius — the per-worker shared read-only index of the reference
(``alg/gdalgrid.cpp:260-276``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .join import SpatialJoinZones

__all__ = ["grid_tile", "GridInterpolate", "delaunay_triangulate",
           "linear_interpolate_grid"]


def _candidates(index, x0, y0, x1, y1, radius):
    """Points from all buckets intersecting the padded tile bbox."""
    gx0, gy0, gx1, gy1 = index["window"]
    n = 1 << index["z"]
    sx = n / (gx1 - gx0)
    sy = n / (gy1 - gy0)
    cx0 = max(int(np.floor((x0 - radius - gx0) * sx)), 0)
    cx1 = min(int(np.floor((x1 + radius - gx0) * sx)), n - 1)
    cy0 = max(int(np.floor((y0 - radius - gy0) * sy)), 0)
    cy1 = min(int(np.floor((y1 + radius - gy0) * sy)), n - 1)
    vals, xys = [], []
    for cx in range(cx0, cx1 + 1):
        for cy in range(cy0, cy1 + 1):
            ent = index["grid"].get((cx, cy))
            if ent is not None:
                vals.append(ent[0])
                xys.append(ent[1])
    if not vals:
        return np.empty(0), np.empty((0, 2))
    return np.concatenate(vals), np.concatenate(xys)


def grid_tile(index, algorithm, x0, y0, x1, y1, w, h, radius=None,
              power=2.0, smoothing=0.0, n_neighbors=8, nodata=0.0):
    """Interpolate one (w, h) tile over bbox [x0,x1]×[y0,y1].

    ``index`` comes from ``build_cell_points(values_as_ids, x, y, ...)``
    — the "ids" slot carries the point VALUES.  Pixel centers follow the
    raster convention (row 0 at the top, y decreasing).
    """
    if radius is None:
        radius = max(x1 - x0, y1 - y0)
    vals, xy = _candidates(index, x0, y0, x1, y1, radius)
    px = x0 + (np.arange(w) + 0.5) * (x1 - x0) / w
    py = y1 - (np.arange(h) + 0.5) * (y1 - y0) / h
    out = np.full((h, w), nodata, dtype=np.float64)
    if len(vals) == 0:
        return out
    vals = np.asarray(vals, dtype=np.float64)
    if algorithm == "linear":
        # TIN linear: per-tile local Delaunay over the candidate points
        # (the scale path — the triangulation never needs to be global)
        XX, YY = np.meshgrid(px, py)
        return linear_interpolate_grid(xy, vals, XX, YY, nodata=nodata)
    # dx is row-invariant: hoist it (and its square) out of the row loop
    dx = px[None, :] - xy[:, 0:1]
    dx2 = dx * dx
    # distance matrix per row of pixels (keeps memory bounded)
    for r in range(h):
        dy = py[r] - xy[:, 1:2]
        d2 = dx2 + dy * dy  # (N, w)
        if algorithm == "nearest":
            k = np.argmin(d2, axis=0)
            dmin = d2[k, np.arange(w)]
            row = np.where(dmin <= radius * radius, vals[k], nodata)
        elif algorithm in ("minimum", "maximum", "range", "count",
                           "average"):
            inr = d2 <= radius * radius
            cnt = inr.sum(axis=0)
            if algorithm == "count":
                row = cnt.astype(np.float64)
            else:
                big = np.where(inr, vals[:, None], np.nan)
                with np.errstate(all="ignore"):
                    if algorithm == "minimum":
                        row = np.nanmin(big, axis=0)
                    elif algorithm == "maximum":
                        row = np.nanmax(big, axis=0)
                    elif algorithm == "range":
                        row = np.nanmax(big, axis=0) - np.nanmin(big,
                                                                 axis=0)
                    else:
                        row = np.nanmean(big, axis=0)
                row = np.where(cnt > 0, row, nodata)
        elif algorithm == "invdist":
            inr = d2 <= radius * radius
            with np.errstate(invalid="ignore", divide="ignore"):
                wgt = np.where(inr, 1.0 / np.power(
                    d2 + smoothing * smoothing, power / 2.0), 0.0)
            exact = d2 < 1e-18
            wgt = np.where(np.isfinite(wgt), wgt, 0.0)
            wsum = wgt.sum(axis=0)
            num = (wgt * vals[:, None]).sum(axis=0)
            with np.errstate(invalid="ignore", divide="ignore"):
                row = np.where(wsum > 0, num / wsum, nodata)
            hit = exact.any(axis=0)
            if hit.any():
                first = np.argmax(exact, axis=0)
                row = np.where(hit, vals[first], row)
        elif algorithm == "invdistnn":
            k = min(n_neighbors, len(vals))
            part = np.argpartition(d2, k - 1, axis=0)[:k]
            dk = np.take_along_axis(d2, part, axis=0)
            vk = vals[part]
            # GDAL invdistnn bounds the neighbor search by radius
            # (alg/gdalgrid.cpp GDALGridInverseDistanceToAPowerNearest
            # Neighbor): beyond-radius neighbors contribute nothing and
            # a pixel with no in-radius neighbor emits nodata.
            inr = dk <= radius * radius
            wgt = np.where(inr, 1.0 / np.power(dk + 1e-18, power / 2.0),
                           0.0)
            wsum = wgt.sum(axis=0)
            with np.errstate(invalid="ignore", divide="ignore"):
                row = np.where(wsum > 0,
                               (wgt * vk).sum(axis=0) / wsum, nodata)
        else:
            raise ValueError(f"unknown grid algorithm {algorithm!r}")
        out[r] = row
    return out


class GridInterpolate:
    """Actor: interpolate tiles from a broadcast point index.

    Input rows: (tile_id, x0, y0, x1, y1); emits (tile_id, data bytes).
    """

    def __init__(self, index_ref, algorithm="invdist", w=64, h=64, **kw):
        self.index = SpatialJoinZones._resolve(index_ref)
        self.algorithm = algorithm
        self.w = w
        self.h = h
        self.kw = kw

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_data = [], []
        for i in range(batch.num_rows):
            x0, y0, x1, y1 = (batch[c][i].as_py()
                              for c in ("x0", "y0", "x1", "y1"))
            arr = grid_tile(self.index, self.algorithm, x0, y0, x1, y1,
                            self.w, self.h, **self.kw)
            out_id.append(batch["tile_id"][i].as_py())
            out_data.append(arr.tobytes())
        return pa.Table.from_pydict({
            "tile_id": pa.array(out_id, pa.int64()),
            "data": pa.array(out_data, pa.binary())})


def delaunay_triangulate(pts):
    """Bowyer-Watson Delaunay triangulation → (T, 3) vertex indices.

    The linear/TIN interpolation backbone (reference:
    ``alg/delaunay.c`` / ``GDALTriangulationCreateDelaunay``).  O(n²)
    incremental — fine for the per-tile candidate sets the bucketed
    gridder feeds it (the scale path is per-tile local triangulation,
    not a global one).
    """
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # super-triangle
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    m = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-9) * 10
    sup = np.array([[cx - 2 * m, cy - m], [cx + 2 * m, cy - m],
                    [cx, cy + 2 * m]])
    P = np.vstack([pts, sup])
    tris = [(n, n + 1, n + 2)]

    def circum_ok(tri, p):
        a, b, c = P[tri[0]], P[tri[1]], P[tri[2]]
        ax, ay = a - p
        bx, by = b - p
        cx2, cy2 = c - p
        det = ((ax * ax + ay * ay) * (bx * cy2 - by * cx2)
               - (bx * bx + by * by) * (ax * cy2 - ay * cx2)
               + (cx2 * cx2 + cy2 * cy2) * (ax * by - ay * bx))
        # sign depends on orientation of tri
        o = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return det * np.sign(o) > 0

    for i in range(n):
        p = P[i]
        bad = [t for t in tris if circum_ok(t, p)]
        edges = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        boundary = [k for k, cnt in edges.items() if cnt == 1]
        tris = [t for t in tris if t not in bad]
        for (u, v) in boundary:
            tris.append((u, v, i))
    out = [t for t in tris if max(t) < n]
    return np.array(out, dtype=np.int64) if out else \
        np.empty((0, 3), dtype=np.int64)


def linear_interpolate_grid(pts, vals, XX, YY, nodata=0.0):
    """TIN linear interpolation of scattered (pts, vals) at grid points.

    Barycentric interpolation inside each Delaunay triangle; points
    outside the convex hull get ``nodata`` (GDALGridLinear semantics
    with dfRadius = 0 → nodata outside the triangulation)."""
    tris = delaunay_triangulate(pts)
    out = np.full(XX.shape, nodata, dtype=np.float64)
    if len(tris) == 0:
        return out
    px = XX.ravel()
    py = YY.ravel()
    flat = out.ravel()
    todo = np.ones(len(px), dtype=bool)
    P = np.asarray(pts, dtype=np.float64)
    V = np.asarray(vals, dtype=np.float64)
    for t in tris:
        if not todo.any():
            break
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(det) < 1e-30:
            continue
        idx = np.nonzero(todo)[0]
        l1 = ((b[1] - c[1]) * (px[idx] - c[0])
              + (c[0] - b[0]) * (py[idx] - c[1])) / det
        l2 = ((c[1] - a[1]) * (px[idx] - c[0])
              + (a[0] - c[0]) * (py[idx] - c[1])) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -1e-12) & (l2 >= -1e-12) & (l3 >= -1e-12)
        hit = idx[inside]
        flat[hit] = (l1[inside] * V[t[0]] + l2[inside] * V[t[1]]
                     + l3[inside] * V[t[2]])
        todo[hit] = False
    return flat.reshape(XX.shape)
