"""Resampling kernels with GDAL formula parity, numpy-vectorized.

Kernel closed forms replicate the reference:

* bilinear — tent ``1-|x|`` (``GWKBilinear``, ``alg/gdalwarpkernel.cpp:3429``)
* cubic — Catmull-Rom ``W(x)`` with a = −0.5 (``CubicKernel``,
  ``alg/gdalresamplingkernels.h:23-44``)
* cubicspline — cubic B-spline (``CubicSplineKernel``,
  ``alg/gdalresamplingkernels.h:46-61``)
* lanczos — r = 3 windowed sinc ``sinc(x)·sinc(x/3)`` (``GWKLanczosSinc``,
  ``alg/gdalwarpkernel.cpp:3369-3398``)
* area resamplers average/mode/min/max/med/q1/q3/sum/rms
  (``alg/gdalwarper.h:35-67`` enum) for integer block reduction, with the
  ``GWKTS_First`` tie-break for mode (``alg/gdalwarper.h:134-139``): ties
  resolve to the value seen first in scan order.

The gather loop runs one vectorized pass per kernel tap ((2r)² taps) over
the whole destination grid — no per-pixel Python.
"""

from __future__ import annotations

import numpy as np

__all__ = ["interpolate_at_point", 
    "KERNEL_RADIUS", "kernel_weights", "resample_grid",
    "bilinear_sample_fast", "block_reduce",
    "downsample2_average", "copy_words_cast", "psnr",
]

KERNEL_RADIUS = {"near": 0, "bilinear": 1, "cubic": 2,
                 "cubicspline": 2, "lanczos": 3}


def _w_bilinear(x):
    ax = np.abs(x)
    return np.where(ax <= 1.0, 1.0 - ax, 0.0)


def _w_cubic(x):
    # CubicKernel: a=-0.5 Catmull-Rom
    ax = np.abs(x)
    x2 = x * x
    inner = x2 * (1.5 * ax - 2.5) + 1.0
    outer = x2 * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0
    return np.where(ax <= 1.0, inner, np.where(ax <= 2.0, outer, 0.0))


def _w_cubicspline(x):
    v = np.abs(x)
    xm1, xp1, xp2 = v - 1.0, v + 1.0, v + 2.0
    a = np.where(xp2 > 0.0, xp2 ** 3, 0.0)
    b = np.where(xp1 > 0.0, xp1 ** 3, 0.0)
    c = np.where(v > 0.0, v ** 3, 0.0)
    d = np.where(xm1 > 0.0, xm1 ** 3, 0.0)
    return np.where(v > 2.0, 0.0,
                    (a - 4.0 * b + 6.0 * c - 4.0 * d) / 6.0)


def _w_lanczos(x):
    ax = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        pix = np.pi * x
        val = (np.sin(pix) * np.sin(pix / 3.0)) / (pix * pix / 3.0)
    val = np.where(x == 0.0, 1.0, val)
    return np.where(ax < 3.0, val, 0.0)


_KERNELS = {"bilinear": _w_bilinear, "cubic": _w_cubic,
            "cubicspline": _w_cubicspline, "lanczos": _w_lanczos}


def kernel_weights(name, x):
    return _KERNELS[name](np.asarray(x, dtype=np.float64))


def resample_grid(src, sx, sy, resample="bilinear", nodata=None,
                  acc_dtype=np.float64, gdal_edges=False,
                  xscale=1.0, yscale=1.0):
    """Sample band(s) ``src`` at fractional pixel coords (corner-based).

    ``sx``/``sy`` are continuous source pixel coordinates in the GDAL
    convention (integer values at pixel corners, pixel (i, j) spans
    [i, i+1)).  ``src`` may be 2-D (H, W) or multi-band 3-D (H, W, C) —
    the coordinate/weight math is computed once and all channels gather
    together (one fancy-index per tap).  Returns ``(values float64,
    valid bool)``: values has shape ``sx.shape`` (+ ``(C,)`` for 3-D
    input), valid has ``sx.shape``.  Contributions from outside the
    raster (or equal to ``nodata``) are dropped and the remaining weights
    renormalized — the density-style handling of the reference's masked
    kernels; all-invalid pixels come back invalid.
    """
    src = np.asarray(src)
    multi = src.ndim == 3
    h, w = src.shape[:2]
    sx = np.asarray(sx, dtype=np.float64)
    sy = np.asarray(sy, dtype=np.float64)

    def _ex(mask):
        """Broadcast a spatial mask/weight over trailing channels."""
        return mask[..., None] if multi else mask

    if gdal_edges and resample == "cubic" and xscale >= 0.95 and \
            yscale >= 0.95:
        # GWKCubicResample4Sample (alg/gdalwarpkernel.cpp:3005-3008):
        # where the full 4x4 support crosses the raster edge, GDAL falls
        # back to bilinear instead of renormalizing the cubic weights.
        out, valid = resample_grid(src, sx, sy, "cubic", nodata, acc_dtype)
        i0 = np.floor(sx - 0.5).astype(np.int64)
        j0 = np.floor(sy - 0.5).astype(np.int64)
        edge = (i0 - 1 < 0) | (i0 + 2 >= w) | (j0 - 1 < 0) | (j0 + 2 >= h)
        if edge.any():
            bo, bv = resample_grid(src, sx, sy, "bilinear", nodata, acc_dtype)
            em = edge[..., None] if multi else edge
            out = np.where(em, bo, out)
            valid = np.where(edge, bv, valid)
        return out, valid

    if resample == "near":
        ix = np.floor(sx).astype(np.int64)
        iy = np.floor(sy).astype(np.int64)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = np.clip(ix, 0, w - 1)
        iyc = np.clip(iy, 0, h - 1)
        vals = src[iyc, ixc].astype(np.float64)
        if nodata is not None:
            bad = (vals == nodata)
            valid &= ~(bad.any(axis=-1) if multi else bad)
        return vals, valid

    r = KERNEL_RADIUS[resample]
    kern = _KERNELS[resample]
    # center-based sample coordinate: integer u means the center of pixel u
    ux = sx - 0.5
    uy = sy - 0.5
    ix0 = np.floor(ux).astype(np.int64)
    iy0 = np.floor(uy).astype(np.int64)
    fx = ux - ix0
    fy = uy - iy0

    # GWKResample (alg/gdalwarpkernel.cpp:3789-3845): when downsampling
    # (scale < 1) the kernel is dilated — weight K((t - frac) * scale)
    # over an expanded radius ceil(r / scale); weights are normalized by
    # their sum, so zero-weight fringe taps are harmless.
    xs = min(1.0, float(xscale))
    ys = min(1.0, float(yscale))
    if xs < 1.0:
        rx = int(np.ceil(r / xs))
        taps_x = range(-rx, rx + 1)
        wx = {t: kern((t - fx) * xs) for t in taps_x}
    else:
        taps_x = range(-r + 1, r + 1)  # bilinear: {0, 1}; cubic: {-1..2}
        wx = {t: kern(fx - t) for t in taps_x}
    if ys < 1.0:
        ry = int(np.ceil(r / ys))
        taps_y = range(-ry, ry + 1)
        wy = {t: kern((t - fy) * ys) for t in taps_y}
    else:
        taps_y = range(-r + 1, r + 1)
        wy = {t: kern(fy - t) for t in taps_y}

    out_shape = sx.shape + ((src.shape[2],) if multi else ())
    acc = np.zeros(out_shape, dtype=acc_dtype)
    if nodata is None:
        # fast path: validity is purely spatial; weights zeroed out of
        # bounds make the (clipped-index) gathered values inert — no
        # np.where in the inner loop, one spatial weight accumulator.
        wsum2 = np.zeros(sx.shape, dtype=acc_dtype)
        for ty in taps_y:
            yy = iy0 + ty
            in_y = (yy >= 0) & (yy < h)
            yyc = np.clip(yy, 0, h - 1)
            wyv = wy[ty]
            for tx in taps_x:
                xx = ix0 + tx
                ok = in_y & (xx >= 0) & (xx < w)
                xxc = np.clip(xx, 0, w - 1)
                wgt = (wx[tx] * wyv).astype(acc_dtype, copy=False)
                wgt *= ok
                acc += src[yyc, xxc] * _ex(wgt)
                wsum2 += wgt
        valid = wsum2 > 1e-10
        safe = np.maximum(wsum2, 1e-300)
        out = acc / _ex(safe)
        out[~valid] = 0.0
        return out, valid
    wsum = np.zeros(out_shape, dtype=np.float64)
    for ty in taps_y:
        yy = iy0 + ty
        in_y = (yy >= 0) & (yy < h)
        yyc = np.clip(yy, 0, h - 1)
        wyv = wy[ty]
        for tx in taps_x:
            xx = ix0 + tx
            ok = in_y & (xx >= 0) & (xx < w)
            xxc = np.clip(xx, 0, w - 1)
            v = src[yyc, xxc].astype(np.float64)
            okv = _ex(ok) & (v != nodata)
            wgtv = _ex(wx[tx] * wyv) * okv
            acc += np.where(okv, v, 0.0) * wgtv
            wsum += wgtv
    valid_full = wsum > 1e-10
    with np.errstate(divide="ignore", invalid="ignore"):
        out = acc / wsum
    out = np.where(valid_full, out, nodata)
    valid = valid_full.any(axis=-1) if multi else valid_full
    return out, valid


def block_reduce(src, fy, fx, how="average", nodata=None):
    """Reduce ``src`` by integer factors (fy, fx) with an area resampler.

    Trailing rows/cols that don't fill a block are edge-padded (replicate),
    matching overview behavior at the right/bottom borders closely enough
    for maxdiff-style comparison.  ``mode`` ties resolve to the value first
    seen in row-major scan order (``GWKTS_First``).
    """
    src = np.asarray(src)
    h, w = src.shape
    H = -(-h // fy) * fy
    W = -(-w // fx) * fx
    if H != h or W != w:
        src = np.pad(src, ((0, H - h), (0, W - w)), mode="edge")
    blocks = src.reshape(H // fy, fy, W // fx, fx).transpose(0, 2, 1, 3)
    flat = blocks.reshape(H // fy, W // fx, fy * fx).astype(np.float64)
    if nodata is not None:
        maskv = flat != nodata
        cnt = maskv.sum(axis=2)
    else:
        maskv = np.ones(flat.shape, dtype=bool)
        cnt = np.full(flat.shape[:2], fy * fx)

    if how == "average":
        s = np.where(maskv, flat, 0.0).sum(axis=2)
        out = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
    elif how == "sum":
        out = np.where(maskv, flat, 0.0).sum(axis=2)
    elif how == "min":
        out = np.where(maskv, flat, np.inf).min(axis=2)
    elif how == "max":
        out = np.where(maskv, flat, -np.inf).max(axis=2)
    elif how == "rms":
        s = np.where(maskv, flat * flat, 0.0).sum(axis=2)
        out = np.sqrt(np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan))
    elif how in ("med", "q1", "q3"):
        # GWKAOM_Quant (alg/gdalwarpkernel.cpp:7605-7607): discrete
        # selection sorted[ceil(q*n - 1)], NOT interpolated quantile.
        q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[how]
        srt = np.sort(np.where(maskv, flat, np.inf), axis=2)
        n = cnt
        idx = np.ceil(q * n - 1).astype(np.int64)
        idx = np.clip(idx, 0, flat.shape[2] - 1)
        out = np.take_along_axis(srt, idx[..., None], axis=2)[..., 0]
        out = np.where(n > 0, out, np.nan)
    elif how == "mode":
        # GWKTS_First (alg/gdalwarpkernel.cpp:7392-7420): incremental
        # scan — the winner is the value that FIRST REACHES the maximal
        # count in row-major order (not earliest-first-occurrence).
        out = np.empty(flat.shape[:2], dtype=np.float64)
        for i in range(flat.shape[0]):
            for j in range(flat.shape[1]):
                vals = flat[i, j][maskv[i, j]]
                if len(vals) == 0:
                    out[i, j] = np.nan
                    continue
                counts = {}
                best_val, best_cnt = vals[0], 0
                for v in vals:
                    c = counts.get(v, 0) + 1
                    counts[v] = c
                    if c > best_cnt:
                        best_cnt = c
                        best_val = v
                out[i, j] = best_val
    else:
        raise ValueError(f"unknown area resampler {how!r}")
    return out


def downsample2_average(src):
    """2× average downsample (the pyramid reducer; overview AVERAGE)."""
    return block_reduce(src, 2, 2, how="average")


def copy_words_cast(arr, dtype):
    """Float → integer cast with GDALCopyWords semantics: add 0.5,
    floor, clamp to the dtype range (same convention the reference's
    checksum float path uses; verified on utmsmall-int16-neg goldens
    where trunc-toward-zero gives off-by-one on negatives)."""
    arr = np.asarray(arr, dtype=np.float64)
    info = np.iinfo(dtype)
    v = np.floor(arr + 0.5)
    return np.clip(v, info.min, info.max).astype(dtype)


def psnr(a, b, peak=255.0):
    """Peak signal-to-noise ratio in dB (north-rule lossy gate)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def bilinear_sample_fast(src, sx, sy):
    """Specialized bilinear gather for uint8 multi-band sources.

    Edge handling is clamp-to-edge (replicate) instead of the generic
    path's weight renormalization — identical in the interior, within one
    quantization step at borders; use for throughput-critical stages
    (the flagship actor), keep :func:`resample_grid` as the
    reference-parity kernel.  float32 arithmetic (error ≤1e-5 ≪ the
    copy-words rounding step for 8-bit payloads).

    Returns (values float32 (..., C) or (...,), valid bool).
    """
    src = np.asarray(src)
    multi = src.ndim == 3
    h, w = src.shape[:2]
    sx = np.asarray(sx, dtype=np.float64)
    sy = np.asarray(sy, dtype=np.float64)
    ux = (sx - 0.5).astype(np.float32)
    uy = (sy - 0.5).astype(np.float32)
    valid = (sx >= 0.0) & (sx <= w) & (sy >= 0.0) & (sy <= h)
    np.clip(ux, 0.0, w - 1.0, out=ux)
    np.clip(uy, 0.0, h - 1.0, out=uy)
    x0 = ux.astype(np.int32)
    y0 = uy.astype(np.int32)
    np.clip(x0, 0, w - 2, out=x0) if w > 1 else None
    np.clip(y0, 0, h - 2, out=y0) if h > 1 else None
    fx = ux - x0
    fy = uy - y0
    flat = src.reshape(-1, src.shape[2]) if multi else src.reshape(-1)
    idx = (y0.astype(np.int64) * w + x0).ravel()
    v00 = flat[idx]
    v01 = flat[idx + (1 if w > 1 else 0)]
    v10 = flat[idx + (w if h > 1 else 0)]
    v11 = flat[idx + ((w + 1) if (h > 1 and w > 1) else 0)]
    fxr = fx.ravel().astype(np.float32)
    fyr = fy.ravel().astype(np.float32)
    if multi:
        fxr = fxr[:, None]
        fyr = fyr[:, None]
    top = v00 + (v01.astype(np.float32) - v00) * fxr
    bot = v10 + (v11.astype(np.float32) - v10) * fxr
    out = top + (bot - top) * fyr
    out_shape = sx.shape + ((src.shape[2],) if multi else ())
    return out.reshape(out_shape), valid


def interpolate_at_point(band, x, y, resample="bilinear"):
    """``GDALRasterBand::InterpolateAtPoint`` semantics
    (``alg/gdal_interpolateatpoint.cpp:165-204``): corner-based
    pixel/line coordinates, valid domain ``[0, size]`` inclusive,
    nearest-neighbour coordinates right at the bottom/right edge nudge
    inside by 0.25 (``:172-181``), and the algorithm downgrades on tiny
    rasters (cubic→bilinear under 4 px, bilinear→nearest under 2 px).
    Returns the value or None out of domain.  Validated against the
    published byte.tif values (``autotest/gcore/interpolateatpoint.py``).
    """
    band = np.asarray(band, dtype=np.float64)
    h, w = band.shape
    x, y = float(x), float(y)
    if resample in ("near", "nearest"):
        if w <= x <= w + 1e-5:
            x -= 0.25
        if h <= y <= h + 1e-5:
            y -= 0.25
        resample = "near"
    if x < 0 or x > w or y < 0 or y > h:
        return None
    if (w < 4 or h < 4) and resample in ("cubic", "cubicspline"):
        resample = "bilinear"
    if (w < 2 or h < 2) and resample == "bilinear":
        resample = "near"
    vals, ok = resample_grid(band, np.array([[x]]), np.array([[y]]),
                             resample, gdal_edges=True)
    return float(vals[0, 0]) if ok[0, 0] else None
