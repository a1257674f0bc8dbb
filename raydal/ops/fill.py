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


def proximity(arr, target_values=None, max_dist=None, nodata=65535.0,
              fixed_buf_val=None, src_nodata=None):
    """Distance (pixels) to the nearest target pixel —
    ``GDALComputeProximity`` semantics (``alg/gdalproximity.cpp``):

    * ``target_values=None`` treats any non-zero pixel as target,
    * distances beyond ``max_dist`` become ``nodata``,
    * ``fixed_buf_val`` replaces STRICTLY-POSITIVE in-range distances
      (target pixels stay 0 — the ``> 0.0`` test at ``:386-388``),
    * ``src_nodata`` (the USE_INPUT_NODATA=YES path) forces input-nodata
      pixels to ``nodata`` regardless of distance.

    Validated against the published pat.tif checksums
    (``autotest/alg/proximity.py``: 1941 / 3256 / 1465).
    """
    arr = np.asarray(arr)
    if target_values is None:
        mask = arr != 0
    else:
        mask = np.isin(arr, np.asarray(target_values))
    if not mask.any():
        return np.full(arr.shape, nodata, dtype=np.float64)
    dist = np.sqrt(_edt2(mask))
    d = (np.where(dist > 0, float(fixed_buf_val), 0.0)
         if fixed_buf_val is not None else dist)
    if max_dist is not None:
        d = np.where(dist > max_dist, nodata, d)
    if src_nodata is not None:
        d = np.where(arr == src_nodata, nodata, d)
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
    """Remove components smaller than ``threshold`` pixels —
    ``GDALSieveFilter`` semantics (``alg/gdalsievefilter.cpp``) exactly:

    * each polygon's "big neighbour" is its largest-by-ORIGINAL-size
      neighbour, ties resolved to the FIRST edge in scan order (the
      ``CompareNeighbour`` strictly-less update, ``:119-124``; sizes are
      never updated while merging),
    * a small polygon chain-walks big neighbours (cycle-guarded) until
      one ≥ threshold is found (``:503-524``); an unmergeable small
      polygon is left UNCHANGED (``:526-531``),
    * every pixel of a merged polygon takes the final target's value.

    Validated against the published checksums in
    ``autotest/alg/sieve.py`` (364/370/451/98)."""
    arr = np.asarray(arr)
    labels = label_components(arr, connectivity)
    h, w = labels.shape
    nlab = int(labels.max())
    sizes = np.bincount(labels.ravel(), minlength=nlab + 1)

    # edge stream in the reference's scan order: per pixel (iY, iX) the
    # pairs (this, up), [8conn: (this, up-left), (this, up-right)],
    # (this, left) — order index (iY*w + iX)*4 + k
    pairs_a, pairs_b, order = [], [], []

    def add(a, b, oy, ox, k):
        pairs_a.append(a.ravel())
        pairs_b.append(b.ravel())
        order.append(((oy * w + ox) * 4 + k).ravel())

    iy, ix = np.mgrid[1:h, 0:w]
    add(labels[1:, :], labels[:-1, :], iy, ix, np.int64(0))
    if connectivity == 8:
        iy, ix = np.mgrid[1:h, 1:w]
        add(labels[1:, 1:], labels[:-1, :-1], iy, ix, np.int64(1))
        iy, ix = np.mgrid[1:h, 0:w - 1]
        add(labels[1:, :-1], labels[:-1, 1:], iy, ix, np.int64(2))
    iy, ix = np.mgrid[0:h, 1:w]
    add(labels[:, 1:], labels[:, :-1], iy, ix, np.int64(3))
    a = np.concatenate(pairs_a)
    b = np.concatenate(pairs_b)
    o = np.concatenate(order)
    keep = a != b
    a, b, o = a[keep], b[keep], o[keep]
    # both endpoints see the edge
    P = np.concatenate([a, b])
    N = np.concatenate([b, a])
    O = np.concatenate([o, o])
    big = np.full(nlab + 1, -1, np.int64)
    if len(P):
        # per polygon: neighbour with max size, tie → earliest edge
        srt = np.lexsort((O, -sizes[N], P))
        Ps, Ns = P[srt], N[srt]
        first = np.ones(len(Ps), dtype=bool)
        first[1:] = Ps[1:] != Ps[:-1]
        big[Ps[first]] = Ns[first]

    # chain-walk small polygons to a >= threshold target
    values = np.zeros(nlab + 1, arr.dtype)
    flat_lab = labels.ravel()
    uniq, idx = np.unique(flat_lab, return_index=True)
    values[uniq] = arr.ravel()[idx]
    target = np.arange(nlab + 1)
    for p in range(1, nlab + 1):
        if sizes[p] == 0 or sizes[p] >= threshold or big[p] == -1:
            continue
        visited = {p}
        cur = int(big[p])
        ok = False
        while cur >= 0:
            if sizes[cur] >= threshold:
                ok = True
                break
            if cur in visited:
                break
            visited.add(cur)
            cur = int(big[cur])
        if ok:
            target[p] = cur
    out_vals = values[target]
    return out_vals[flat_lab].reshape(h, w)
