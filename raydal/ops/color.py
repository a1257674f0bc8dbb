"""Color operations: LUT color-map, median-cut palette, rgb→palette.

* :func:`apply_color_map` — palette/color-relief LUT application
  (``apps/gdalalg_raster_color_map.cpp`` semantics: exact-match LUT, or
  linear color-relief interpolation between breakpoints).
* Median-cut quantization (``alg/gdalmediancut.cpp``): the global color
  histogram is a mergeable per-batch partial (5-bit RGB boxes like the
  reference), the box-splitting finish runs on the driver — partial+final.
* :func:`rgb_to_palette` — nearest palette entry per pixel (vectorized).
  Error-diffusion dithering (``alg/gdaldither.cpp``) is inherently
  sequential per scanline and is a documented non-goal this round.
"""

from __future__ import annotations

import numpy as np

__all__ = ["apply_color_map", "color_relief", "histogram_partial_rgb",
           "median_cut", "rgb_to_palette"]


def apply_color_map(band, lut):
    """uint8 band → RGB via a (256, 3) LUT."""
    lut = np.asarray(lut, dtype=np.uint8)
    return lut[np.asarray(band).astype(np.uint8)]


def color_relief(band, breakpoints):
    """DEM color-relief: linear interpolation between (value, r, g, b)
    breakpoints (gdaldem color-relief default mode)."""
    bp = np.asarray(breakpoints, dtype=np.float64)
    bp = bp[np.argsort(bp[:, 0])]
    v = np.asarray(band, dtype=np.float64)
    out = np.empty((*v.shape, 3), dtype=np.uint8)
    for c in range(3):
        out[..., c] = np.clip(
            np.interp(v, bp[:, 0], bp[:, c + 1]), 0, 255).astype(np.uint8)
    return out


def histogram_partial_rgb(img, bits=5):
    """Mergeable color histogram partial: (2^bits)^3 counts (uint64)."""
    img = np.asarray(img)
    shift = 8 - bits
    r = img[..., 0].ravel() >> shift
    g = img[..., 1].ravel() >> shift
    b = img[..., 2].ravel() >> shift
    n = 1 << bits
    idx = (r.astype(np.int64) * n + g) * n + b
    return np.bincount(idx, minlength=n ** 3).astype(np.int64)


def median_cut(hist, n_colors=256, bits=5):
    """Driver-side finish: split populated color boxes by the widest axis
    at the median until ``n_colors`` boxes; returns (n, 3) uint8 palette.
    """
    n = 1 << bits
    idx = np.nonzero(hist)[0]
    counts = hist[idx]
    r = (idx // (n * n)).astype(np.int64)
    g = ((idx // n) % n).astype(np.int64)
    b = (idx % n).astype(np.int64)
    cols = np.stack([r, g, b], axis=1)
    boxes = [(cols, counts)]
    while len(boxes) < n_colors:
        # split the box with the largest population that can still split
        boxes.sort(key=lambda bc: -int(bc[1].sum()))
        for bi, (c, w) in enumerate(boxes):
            spans = c.max(axis=0) - c.min(axis=0) if len(c) else [0, 0, 0]
            if len(c) > 1 and max(spans) > 0:
                axis = int(np.argmax(spans))
                order = np.argsort(c[:, axis], kind="stable")
                c, w = c[order], w[order]
                cum = np.cumsum(w)
                split = int(np.searchsorted(cum, cum[-1] / 2.0)) + 1
                split = min(max(split, 1), len(c) - 1)
                boxes[bi] = (c[:split], w[:split])
                boxes.append((c[split:], w[split:]))
                break
        else:
            break  # nothing splittable
    pal = np.empty((len(boxes), 3), dtype=np.uint8)
    shift = 8 - bits
    for i, (c, w) in enumerate(boxes):
        # reference midpoint rule ((min+max)<<shift)/2 — preserves exact
        # black/white (alg/gdalmediancut.cpp), unlike a +0.5 box center
        lo = c.min(axis=0) if len(c) else np.zeros(3, dtype=np.int64)
        hi = c.max(axis=0) if len(c) else np.zeros(3, dtype=np.int64)
        pal[i] = np.clip(((lo + hi) << shift) // 2, 0, 255).astype(np.uint8)
    return pal


def rgb_to_palette(img, palette):
    """Nearest palette index per pixel (squared-distance argmin)."""
    img = np.asarray(img, dtype=np.int32)
    pal = np.asarray(palette, dtype=np.int32)
    flat = img.reshape(-1, 3)
    # (P, K) distances in chunks to bound memory
    out = np.empty(len(flat), dtype=np.uint8 if len(pal) <= 256
                   else np.int32)
    chunk = 1 << 16
    for s in range(0, len(flat), chunk):
        d = ((flat[s:s + chunk, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
        out[s:s + chunk] = np.argmin(d, axis=1)
    return out.reshape(img.shape[:2])


def _nearest_color_cube(palette, n_bits=5):
    """(2^b)^3 cube cell → nearest palette index by L1 distance, first
    index on ties (FindNearestColor, ``alg/gdaldither.cpp:651-676``);
    cell sample value is ``i*255//(levels-1)`` (``:629-640``)."""
    pal = np.asarray(palette, dtype=np.int64)  # (C, 3) RGB
    lv = 1 << n_bits
    samp = (np.arange(lv) * 255) // (lv - 1)
    rr, gg, bb = np.meshgrid(samp, samp, samp, indexing="ij")
    pts = np.stack([rr, gg, bb], axis=-1).reshape(-1, 1, 3)
    dist = np.abs(pts - pal[None, :, :]).sum(axis=2)
    return np.argmin(dist, axis=1).reshape(lv, lv, lv).astype(np.uint8)


def dither_rgb_to_pct(img, palette, n_bits=5):
    """GDALDitherRGB2PCT parity: error-diffusion quantization to a
    palette (``alg/gdaldither.cpp`` — the reference's /6 diffusion
    scheme, NOT textbook Floyd-Steinberg).

    Per pixel the residual error e splits as: 2·(e/6) to the right
    neighbor (same line), e/6 below-left, e−5·(e/6) below, e/6
    below-right — integer division truncating toward zero, clamped
    adds, nearest color via the 2^nBits color cube (L1, first-wins).
    """
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("dither_rgb_to_pct expects uint8 RGB")
    cube = _nearest_color_cube(palette, n_bits)
    pal = np.asarray(palette, dtype=np.int64)
    lv = 1 << n_bits
    h, w = img.shape[:2]
    out = np.empty((h, w), dtype=np.uint8)
    # panError layout: slot s*3+c applies to next-line pixel s-1
    err = [0] * ((w + 2) * 3)
    for y in range(h):
        # apply previous line's carried error, then rebuild it
        red = [max(0, min(255, int(img[y, i, 0]) + err[i * 3 + 3]))
               for i in range(w)]
        green = [max(0, min(255, int(img[y, i, 1]) + err[i * 3 + 4]))
                 for i in range(w)]
        blue = [max(0, min(255, int(img[y, i, 2]) + err[i * 3 + 5]))
                for i in range(w)]
        err = [0] * ((w + 2) * 3)
        last = [0, 0, 0]
        for i in range(w):
            rv = max(0, min(255, red[i] + last[0]))
            gv = max(0, min(255, green[i] + last[1]))
            bv = max(0, min(255, blue[i] + last[2]))
            idx = int(cube[rv * lv // 256, gv * lv // 256, bv * lv // 256])
            out[y, i] = idx
            for c, v in enumerate((rv, gv, bv)):
                e = v - int(pal[idx, c])
                sixth = int(e / 6)  # C trunc-toward-zero division
                err[i * 3 + c] += sixth
                err[i * 3 + 6 + c] = sixth
                err[i * 3 + 3 + c] += e - 5 * sixth
                last[c] = 2 * sixth
    return out


def color_relief_gdal(band, entries):
    """gdaldem color-relief parity (GDALColorReliefGetRGBA interpolate
    mode): entries = [(value, r, g, b), ...] in any order; per pixel,
    linear interpolation between the bracketing entries with
    int(0.5 + before + ratio*(after-before)) rounding, clamped ends.
    Validated against the published n43.tif color_file.txt checksums
    (autotest/utilities/test_gdaldem_lib.py:543-554)."""
    ent = sorted(entries)
    vals = np.array([e[0] for e in ent], dtype=np.float64)
    rgb = np.array([[e[1], e[2], e[3]] for e in ent], dtype=np.float64)
    v = np.asarray(band, dtype=np.float64)
    # i = first entry index with vals[i] >= v  (the reference's lower
    # bound search); clip for the interpolation lookup
    i = np.searchsorted(vals, v, side="left")
    below = i == 0
    above = i == len(vals)
    ii = np.clip(i, 1, len(vals) - 1)
    v0 = vals[ii - 1]
    v1 = vals[ii]
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = (v - v0) / (v1 - v0)
    out = np.empty(v.shape + (3,), dtype=np.uint8)
    for c in range(3):
        c0 = rgb[ii - 1, c]
        c1 = rgb[ii, c]
        interp = np.floor(0.5 + c0 + ratio * (c1 - c0))
        interp = np.clip(interp, 0, 255)
        exact_hi = v == v1
        interp = np.where(exact_hi, rgb[ii, c], interp)
        exact_lo = v == v0
        interp = np.where(exact_lo, rgb[ii - 1, c], interp)
        interp = np.where(below, rgb[0, c], interp)
        interp = np.where(above, rgb[-1, c], interp)
        out[..., c] = interp.astype(np.uint8)
    return out


def rgb_to_hs(r, g, b):
    """Vectorized hue/saturation of uint8 RGB — float32 arithmetic
    matching ``rgb_to_hs`` in ``apps/gdalalg_raster_color_merge.cpp``
    exactly (the branch structure collapses to max/min; hue sector by
    which channel holds the max, with the reference's tie preferences:
    r<=g and r<=b → max(g,b); g<b keeps g only when r>g etc.)."""
    r = r.astype(np.int32)
    g = g.astype(np.int32)
    b = b.astype(np.int32)
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    d = (maxc - minc).astype(np.float32)
    s = d / np.maximum(1, maxc).astype(np.float32)
    d6 = np.where(d == 0, np.float32(1.0), np.float32(6.0) * d)
    # sector selection: the reference tests maxc==b first, then
    # maxc==g, else r — value comparisons, so ties resolve to b, then g
    h_b = np.float32(4.0 / 6.0) + (r - g).astype(np.float32) / d6
    h_g = np.float32(2.0 / 6.0) + (b - r).astype(np.float32) / d6
    h_r0 = (g - b).astype(np.float32) / d6
    h_r = np.where(h_r0 < 0, h_r0 + np.float32(1.0), h_r0)
    is_b = b == maxc
    is_g = ~is_b & (g == maxc)
    h = np.where(is_b, h_b, np.where(is_g, h_g, h_r)).astype(np.float32)
    return h, s.astype(np.float32)


def hsv_to_rgb(h, s, v):
    """Vectorized ``hsv_to_rgb`` (same file, :216): sector ``i = int(6h)``
    and the p/q/t ladder with ``+0.5`` byte rounding."""
    h = h.astype(np.float32)
    s = s.astype(np.float32)
    i = (np.float32(6.0) * h).astype(np.int32)
    f = np.float32(6.0) * h - i.astype(np.float32)
    vf = v.astype(np.float32)
    p = (vf * (np.float32(1.0) - s) + np.float32(0.5)).astype(np.uint8)
    q = (vf * (np.float32(1.0) - s * f) + np.float32(0.5)).astype(np.uint8)
    t = (vf * (np.float32(1.0) - s * (np.float32(1.0) - f))
         + np.float32(0.5)).astype(np.uint8)
    v8 = v.astype(np.uint8)
    ii = np.clip(i, 0, 5)
    r = np.choose(ii, [v8, q, p, p, t, v8])
    g = np.choose(ii, [t, v8, v8, q, p, p])
    b = np.choose(ii, [p, p, t, v8, v8, q])
    return r, g, b


def color_merge(rgb, gray):
    """``gdal raster color-merge``: keep the RGB(A) hue/saturation,
    replace value with the grayscale band (HSV merge —
    ``apps/gdalalg_raster_color_merge.cpp`` HSVMergeDataset).  Identity
    when ``gray == max(r, g, b)``, verified over the full quantized
    color cube like the reference's own
    ``test_gdalalg_raster_color_merge_check_rgb_hsb_conversion``."""
    rgb = np.asarray(rgb)
    h, s = rgb_to_hs(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    r, g, b = hsv_to_rgb(h, s, np.asarray(gray))
    out = rgb.copy()
    out[..., 0] = r
    out[..., 1] = g
    out[..., 2] = b
    return out
