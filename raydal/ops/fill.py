"""Hole-filling / cleanup rasters: fill-nodata, sieve, proximity.

Per-tile numpy implementations of the reference's cleanup algorithms —
all embarrassingly parallel ``map_batches`` stages over tile rows (1-px
halos matter only for cross-tile exactness; like the reference's chunked
paths, edges degrade gracefully without them):

* :func:`fillnodata` — inverse-distance-weighted interpolation of nodata
  holes from the nearest valid ring, iterated smoothing
  (``alg/rasterfill.cpp`` semantics: IDW from up to ``max_dist`` pixels,
  then ``smoothing_iterations`` of 3×3 averaging over filled cells).
* :func:`sieve` — remove connected components smaller than a threshold by
  merging them into their largest neighbor (``alg/gdalsievefilter.cpp``,
  4/8-connectivity).
* :func:`proximity` — distance to nearest target pixel, exact Euclidean
  via the two-pass Felzenszwalb-Huttenlocher distance transform
  (``alg/gdalproximity.cpp`` computes the same metric).
"""

from __future__ import annotations

import numpy as np

from .polygonize import label_components

__all__ = ["fillnodata", "sieve", "proximity"]


def _edt_1d(f):
    """1-D squared-distance transform (lower envelope of parabolas)."""
    n = len(f)
    d = np.empty(n)
    v = np.zeros(n, dtype=np.int64)
    z = np.empty(n + 1)
    k = 0
    z[0] = -np.inf
    z[1] = np.inf
    for q in range(1, n):
        s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        while s <= z[k]:
            k -= 1
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q
                                                             - 2 * v[k])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def _edt2(mask):
    """Squared Euclidean distance to the nearest True pixel."""
    h, w = mask.shape
    INF = 1e18
    f = np.where(mask, 0.0, INF)
    tmp = np.empty_like(f)
    for x in range(w):
        tmp[:, x] = _edt_1d(f[:, x])
    out = np.empty_like(f)
    for y in range(h):
        out[y, :] = _edt_1d(tmp[y, :])
    return out


def proximity(arr, target_values=None, max_dist=None, nodata=65535.0):
    """Distance (pixels) to the nearest target pixel.

    ``target_values=None`` treats any non-zero pixel as target (the
    gdal_proximity default).  Distances beyond ``max_dist`` become
    ``nodata``.
    """
    arr = np.asarray(arr)
    if target_values is None:
        mask = arr != 0
    else:
        mask = np.isin(arr, np.asarray(target_values))
    if not mask.any():
        return np.full(arr.shape, nodata, dtype=np.float64)
    d = np.sqrt(_edt2(mask))
    if max_dist is not None:
        d = np.where(d > max_dist, nodata, d)
    return d


def fillnodata(arr, nodata, max_dist=16, smoothing_iterations=0):
    """IDW-fill nodata holes from surrounding valid pixels.

    For each nodata pixel within ``max_dist`` of valid data, the value is
    the inverse-distance-weighted mean of the nearest valid pixels in the
    8 compass directions (the reference's scanline approach); farther
    holes stay nodata.  Optional 3×3 smoothing over filled pixels.
    """
    arr = np.asarray(arr, dtype=np.float64).copy()
    invalid = arr == nodata
    if not invalid.any():
        return arr
    h, w = arr.shape
    fill_acc = np.zeros((h, w))
    wgt_acc = np.zeros((h, w))
    # 8 directions: for each, distance to nearest valid pixel + its value
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                   (1, 1), (1, -1), (-1, 1), (-1, -1)):
        val = np.full((h, w), np.nan)
        dist = np.full((h, w), np.inf)
        step = np.hypot(dy, dx)
        # iterate scanlines in direction order
        if dy == 0:
            rng = range(w) if dx > 0 else range(w - 1, -1, -1)
            cur_val = np.full(h, np.nan)
            cur_d = np.full(h, np.inf)
            for x in rng:
                col_valid = ~invalid[:, x]
                cur_val = np.where(col_valid, arr[:, x], cur_val)
                cur_d = np.where(col_valid, 0.0, cur_d + step)
                val[:, x] = cur_val
                dist[:, x] = cur_d
        else:
            rng = range(h) if dy > 0 else range(h - 1, -1, -1)
            cur_val = np.full(w, np.nan)
            cur_d = np.full(w, np.inf)
            for y in rng:
                if dx == 0:
                    row_valid = ~invalid[y, :]
                    cur_val = np.where(row_valid, arr[y, :], cur_val)
                    cur_d = np.where(row_valid, 0.0, cur_d + step)
                else:  # diagonal: shift the running buffers by dx
                    cur_val = np.roll(cur_val, dx)
                    cur_d = np.roll(cur_d, dx)
                    edge = 0 if dx > 0 else w - 1
                    cur_val[edge] = np.nan
                    cur_d[edge] = np.inf
                    row_valid = ~invalid[y, :]
                    cur_val = np.where(row_valid, arr[y, :], cur_val)
                    cur_d = np.where(row_valid, 0.0, cur_d + step)
                val[y, :] = cur_val
                dist[y, :] = cur_d
        ok = invalid & np.isfinite(dist) & (dist <= max_dist) \
            & ~np.isnan(val)
        wgt = np.where(ok, 1.0 / np.maximum(dist, 1e-9), 0.0)
        fill_acc += np.where(ok, val * wgt, 0.0)
        wgt_acc += wgt
    filled = invalid & (wgt_acc > 0)
    arr[filled] = fill_acc[filled] / wgt_acc[filled]
    for _ in range(smoothing_iterations):
        # 3x3 average over VALID pixels only — unfilled nodata neighbors
        # must not bleed sentinel values into the smoothed result
        ok = (arr != nodata).astype(np.float64)
        p = np.pad(arr * ok, 1, mode="edge")
        pw = np.pad(ok, 1, mode="edge")
        s = sum(p[dy:dy + h, dx:dx + w]
                for dy in range(3) for dx in range(3))
        n_ok = sum(pw[dy:dy + h, dx:dx + w]
                   for dy in range(3) for dx in range(3))
        with np.errstate(invalid="ignore"):
            avg = np.where(n_ok > 0, s / n_ok, arr)
        arr[filled] = avg[filled]
    return arr


def sieve(arr, threshold, connectivity=4):
    """Remove components smaller than ``threshold`` pixels by merging them
    into their largest border neighbor (GDALSieveFilter semantics); the
    neighbor search uses the same connectivity as the labeling."""
    arr = np.asarray(arr).copy()
    labels = label_components(arr, connectivity)
    nlab = labels.max()
    sizes = np.bincount(labels.ravel(), minlength=nlab + 1)
    small = np.nonzero((sizes > 0) & (sizes < threshold))[0]
    small = small[small > 0]
    # iterate smallest-first so chained merges behave like the reference
    for lab in sorted(small, key=lambda s: sizes[s]):
        mask = labels == lab
        if not mask.any():
            continue
        # border neighbors (4- or 8-neighborhood per `connectivity`)
        grow = np.zeros_like(mask)
        grow[:-1, :] |= mask[1:, :]
        grow[1:, :] |= mask[:-1, :]
        grow[:, :-1] |= mask[:, 1:]
        grow[:, 1:] |= mask[:, :-1]
        if connectivity == 8:
            grow[:-1, :-1] |= mask[1:, 1:]
            grow[:-1, 1:] |= mask[1:, :-1]
            grow[1:, :-1] |= mask[:-1, 1:]
            grow[1:, 1:] |= mask[:-1, :-1]
        border = grow & ~mask
        if not border.any():
            continue
        # GDALSieveFilter merges into the LARGEST neighbor polygon by
        # total pixel count (alg/gdalsievefilter.cpp), not the neighbor
        # sharing the most border pixels; ties resolve to the smallest
        # label for determinism.
        neigh = np.unique(labels[border])
        neigh = neigh[neigh > 0]
        if len(neigh) == 0:
            continue
        target = int(neigh[np.argmax(sizes[neigh])])
        tv = arr[labels == target].flat[0]
        arr[mask] = tv
        labels[mask] = target           # chained merges see the absorber
        sizes[target] += sizes[lab]
        sizes[lab] = 0
    return arr
