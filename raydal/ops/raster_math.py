"""Per-pixel raster math: pixel-function registry, dtype casts, DEM
kernels, band statistics.

* Pixel functions replicate the reference's VRT registry
  (``frmts/vrt/pixelfunctions.cpp:2787+``): sum, diff, mul, div, min,
  max, mean, median, mode, geometric_mean, harmonic_mean, norm_diff,
  sqrt, log10, exp, pow, inv, mod, scale, replace_nodata — table-driven
  numpy ufuncs applied inside ``map_batches``.
* ``set_type`` follows GDALCopyWords float→int conversion (+0.5,
  truncate, clamp — ``alg/gdalchecksum.cpp:65-80`` documents the rule).
* DEM ops use the Horn 3×3 gradient (``apps/gdaldem_lib.cpp:767-797``):
  hillshade, slope, aspect, TRI, TPI, roughness.  Tiles need a 1-px halo
  for exactness at borders; without it edges carry nodata, the same
  degradation the reference accepts tile-wise.
* Band statistics are the classic partial+final (count/sum/sumsq/min/
  max/histogram per batch → tiny merge), matching ``ComputeStatistics``
  (``gcore/gdalrasterband.cpp:6491``).
"""

from __future__ import annotations

import numpy as np

from ..kernels.resample import copy_words_cast

__all__ = ["PIXEL_FUNCTIONS", "apply_pixel_function", "set_type",
           "gdal_histogram", "parse_reclassify_mapping", "reclassify_mapping", "apply_reclassify_rules",
           "reclassify", "hillshade", "slope", "aspect", "tri", "tpi",
           "roughness", "stats_partial", "stats_merge", "stats_final",
           "pansharpen", "clean_collar"]


def _nanguard(fn):
    def wrapped(*bands, **kw):
        with np.errstate(divide="ignore", invalid="ignore"):
            return fn(*bands, **kw)
    return wrapped


PIXEL_FUNCTIONS = {
    "sum": lambda *b, k=0.0: np.sum(b, axis=0) + k,
    "diff": lambda a, b: a - b,
    "mul": lambda *b: np.prod(np.stack(b), axis=0),
    "div": _nanguard(lambda a, b: a / b),
    "min": lambda *b: np.min(np.stack(b), axis=0),
    "max": lambda *b: np.max(np.stack(b), axis=0),
    "mean": lambda *b: np.mean(np.stack(b), axis=0),
    "median": lambda *b: np.median(np.stack(b), axis=0),
    "mode": lambda *b: _mode_stack(np.stack(b)),
    "geometric_mean": _nanguard(
        lambda *b: np.exp(np.mean(np.log(np.stack(b)), axis=0))),
    "harmonic_mean": _nanguard(
        lambda *b: len(b) / np.sum(1.0 / np.stack(b), axis=0)),
    "norm_diff": _nanguard(lambda a, b: (a - b) / (a + b)),
    "sqrt": lambda a: np.sqrt(a),
    "log10": _nanguard(lambda a: np.log10(a)),
    "exp": lambda a: np.exp(a),
    "pow": lambda a, power=2.0: np.power(a, power),
    "inv": _nanguard(lambda a: 1.0 / a),
    "mod": lambda a, b: np.mod(a, b),
    "scale": lambda a, scale=1.0, offset=0.0: a * scale + offset,
    "replace_nodata": lambda a, nodata=0.0, to=np.nan: np.where(
        a == nodata, to, a),
}


def _mode_stack(stack):
    """Per-pixel mode across bands, first-seen tie-break (GWKTS_First)."""
    out = stack[0].copy()
    best = np.ones(stack.shape[1:], dtype=np.int32)
    for i in range(stack.shape[0]):
        cnt = (stack == stack[i]).sum(axis=0)
        take = cnt > best
        out[take] = stack[i][take]
        best[take] = cnt[take]
    return out


def apply_pixel_function(name, *bands, **kwargs):
    """Run a registered pixel function over float64 band arrays."""
    fn = PIXEL_FUNCTIONS[name]
    return fn(*[np.asarray(b, dtype=np.float64) for b in bands], **kwargs)


def set_type(arr, dtype):
    """Dtype cast with GDALCopyWords semantics (round-half then truncate,
    clamp) for integer targets; plain cast for floats."""
    arr = np.asarray(arr)
    if np.issubdtype(np.dtype(dtype), np.integer):
        info = np.iinfo(dtype)
        v = np.trunc(arr.astype(np.float64) + 0.5)
        return np.clip(v, info.min, info.max).astype(dtype)
    return arr.astype(dtype)


def parse_reclassify_mapping(text):
    """Parse the reference's reclassify mapping DSL
    (``frmts/vrt/vrtreclassifier.cpp`` Interval::Parse +
    ``test_gdalalg_raster_reclassify.py`` examples):
    ``165 = 120; (-inf, 0) = 140; (0, 100] = PASS_THROUGH; DEFAULT = 160``
    — ``#`` comments, newline/semicolon separators, open/closed interval
    bounds, ``-inf``/``inf``, PASS_THROUGH and DEFAULT.

    Returns ``(rules, default)`` where rules are
    ``(lo, hi, lo_inc, hi_inc, target)`` evaluated in order (a scalar
    key becomes a closed single-point interval); target is a float or
    the string ``"PASS_THROUGH"``."""
    import re

    rules = []
    default = None
    body = re.sub(r"#[^\n]*", "", text)
    for part in re.split(r"[;\n]", body):
        part = part.strip()
        if not part:
            continue
        lhs, _, rhs = part.partition("=")
        lhs, rhs = lhs.strip(), rhs.strip()
        if rhs.upper() == "PASS_THROUGH":
            tgt = "PASS_THROUGH"
        elif rhs.upper() == "NO_DATA":
            raise ValueError(
                "NO_DATA targets need a band nodata value; the image "
                "table carries none (reference parity gap documented)")
        else:
            tgt = float(rhs)
        if lhs.upper() == "DEFAULT":
            # DEFAULT = PASS_THROUGH (SetDefaultPassThrough) == no default
            default = None if tgt == "PASS_THROUGH" else tgt
            continue
        if lhs.upper() == "NO_DATA":
            raise ValueError(
                "NO_DATA source needs a band nodata value; unsupported "
                "on the image table")
        if lhs.upper() == "NAN":
            rules.append(("nan", None, False, False, tgt))
            continue
        m = re.match(r"^([\(\[])\s*(-?inf|[-+0-9.eE]+)\s*,"
                     r"\s*(-?inf|\+?inf|[-+0-9.eE]+)\s*([\)\]])$", lhs)
        if m:
            lo = float(m.group(2))
            hi = float(m.group(3))
            rules.append((lo, hi, m.group(1) == "[", m.group(4) == "]",
                          tgt))
        else:
            v = float(lhs)
            rules.append((v, v, True, True, tgt))
    return rules, default


def apply_reclassify_rules(arr, rules, default):
    """Apply pre-parsed mapping rules (first match wins; DEFAULT for the
    rest; no DEFAULT → pass through)."""
    arr = np.asarray(arr, dtype=np.float64)
    out = arr.copy()
    matched = np.zeros(arr.shape, dtype=bool)
    for lo, hi, lo_inc, hi_inc, tgt in rules:
        if lo == "nan":                      # NAN source rule
            sel = np.isnan(arr) & ~matched
        else:
            sel = (arr >= lo) if lo_inc else (arr > lo)
            sel &= (arr <= hi) if hi_inc else (arr < hi)
            sel &= ~matched
        if tgt != "PASS_THROUGH":
            out[sel] = tgt
        matched |= sel
    if default is not None:
        out[~matched] = default
    return out


def reclassify_mapping(arr, text):
    """Apply a DSL mapping string (first matching rule wins, DEFAULT for
    the rest; unmatched without DEFAULT passes through — the
    vrtreclassifier evaluation order)."""
    rules, default = parse_reclassify_mapping(text)
    return apply_reclassify_rules(arr, rules, default)


def reclassify(arr, table, default=None):
    """Value→value remap (``frmts/vrt/vrtreclassifier.cpp`` semantics):
    ``table`` maps either scalars or (lo, hi) inclusive ranges to outputs.
    """
    arr = np.asarray(arr, dtype=np.float64)
    out = np.full(arr.shape, np.nan if default is None else default,
                  dtype=np.float64)
    untouched = np.ones(arr.shape, dtype=bool)
    for key, val in table.items():
        if isinstance(key, tuple):
            m = (arr >= key[0]) & (arr <= key[1]) & untouched
        else:
            m = (arr == key) & untouched
        out[m] = val
        untouched &= ~m
    if default is None:
        out[untouched] = arr[untouched]
    return out


def _horn_gradients(z, xres, yres, z_factor=1.0):
    """Horn 3×3 gradients (apps/gdaldem_lib.cpp:767-797 formula)."""
    z = np.asarray(z, dtype=np.float64) * z_factor
    p = np.pad(z, 1, mode="edge")
    a = p[:-2, :-2]
    b = p[:-2, 1:-1]
    c = p[:-2, 2:]
    d = p[1:-1, :-2]
    f = p[1:-1, 2:]
    g = p[2:, :-2]
    h = p[2:, 1:-1]
    i = p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * xres)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * yres)
    return dzdx, dzdy


def slope(z, xres, yres, z_factor=1.0, degrees=True):
    dzdx, dzdy = _horn_gradients(z, xres, yres, z_factor)
    s = np.sqrt(dzdx * dzdx + dzdy * dzdy)
    return np.degrees(np.arctan(s)) if degrees else s


def aspect(z, xres, yres):
    dzdx, dzdy = _horn_gradients(z, xres, yres)
    az = np.degrees(np.arctan2(dzdy, -dzdx))
    # GDAL convention: 0 = north, clockwise
    out = 90.0 - az
    out = np.where(out < 0, out + 360.0, out)
    out = np.where(out >= 360.0, out - 360.0, out)
    return out


def hillshade(z, xres, yres, azimuth=315.0, altitude=45.0, z_factor=1.0):
    """Horn hillshade, 0-255 (gdaldem hillshade default constants)."""
    dzdx, dzdy = _horn_gradients(z, xres, yres, z_factor)
    slope_rad = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect_rad = np.arctan2(dzdy, -dzdx)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    shaded = (np.sin(alt) * np.cos(slope_rad)
              + np.cos(alt) * np.sin(slope_rad)
              * np.cos(az - aspect_rad))
    return set_type(np.clip(shaded, 0, 1) * 254.0 + 1.0, np.uint8)


def _pad_windows(z):
    p = np.pad(np.asarray(z, dtype=np.float64), 1, mode="edge")
    return [p[dy:dy + z.shape[0], dx:dx + z.shape[1]]
            for dy in range(3) for dx in range(3)]


def tri(z):
    """Terrain ruggedness: mean |neighbor − center| (Wilson variant)."""
    w = _pad_windows(z)
    center = w[4]
    diffs = [np.abs(w[i] - center) for i in range(9) if i != 4]
    return np.mean(diffs, axis=0)


def tpi(z):
    """Topographic position: center − mean(neighbors)."""
    w = _pad_windows(z)
    center = w[4]
    return center - np.mean([w[i] for i in range(9) if i != 4], axis=0)


def roughness(z):
    """max − min over the 3×3 window."""
    w = np.stack(_pad_windows(z))
    return w.max(axis=0) - w.min(axis=0)


# ---------------------------------------------------------------------------
# band statistics: partial + final (ComputeStatistics shape)


def gdal_histogram(arr, vmin, vmax, buckets, include_out_of_range=False):
    """``GDALRasterBand::GetHistogram`` bucket semantics
    (``gcore/gdalrasterband.cpp:4146``): bucket = floor((v - min) *
    buckets / (max - min)); ``include_out_of_range`` clamps under/
    overflow into the first/last bucket, otherwise they are dropped.
    Validated against the published utmsmall / int32_withneg histograms
    (``autotest/gcore/histogram.py``)."""
    a = np.asarray(arr, dtype=np.float64).ravel()
    a = a[a == a]                        # NaN skipped (:4362 `continue`)
    scale = buckets / (vmax - vmin)
    fidx = np.floor((a - vmin) * scale)  # range tests in FLOAT domain
    if include_out_of_range:
        fidx = np.clip(fidx, 0, buckets - 1)
    else:
        fidx = fidx[(fidx >= 0) & (fidx < buckets)]
    return np.bincount(fidx.astype(np.int64),
                       minlength=buckets).astype(np.int64)


def stats_partial(arr, nodata=None, hist_bins=256, hist_range=(0, 256)):
    arr = np.asarray(arr, dtype=np.float64).ravel()
    if nodata is not None:
        arr = arr[arr != nodata]
    hist, _ = np.histogram(arr, bins=hist_bins, range=hist_range)
    if len(arr) == 0:
        return {"count": 0, "sum": 0.0, "sumsq": 0.0, "min": np.inf,
                "max": -np.inf, "hist": hist}
    return {"count": int(len(arr)), "sum": float(arr.sum()),
            "sumsq": float((arr * arr).sum()), "min": float(arr.min()),
            "max": float(arr.max()), "hist": hist}


def stats_merge(a, b):
    return {"count": a["count"] + b["count"], "sum": a["sum"] + b["sum"],
            "sumsq": a["sumsq"] + b["sumsq"],
            "min": min(a["min"], b["min"]), "max": max(a["max"], b["max"]),
            "hist": a["hist"] + b["hist"]}


def stats_final(p):
    n = max(p["count"], 1)
    mean = p["sum"] / n
    var = max(p["sumsq"] / n - mean * mean, 0.0)
    return {"count": p["count"], "min": p["min"], "max": p["max"],
            "mean": mean, "std": float(np.sqrt(var)), "hist": p["hist"]}


def pansharpen(pan, rgb, weights=(1 / 3, 1 / 3, 1 / 3), bit_depth=8):
    """Weighted-Brovey pan-sharpening (``alg/gdalpansharpen.cpp``):
    ``out_b = rgb_b * pan / pseudo_pan`` with
    ``pseudo_pan = Σ w_b · rgb_b``.  ``pan`` (H, W) at the target
    resolution, ``rgb`` (H, W, 3) upsampled to match."""
    pan = np.asarray(pan, dtype=np.float64)
    rgb = np.asarray(rgb, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    pseudo = (rgb * w[None, None, :]).sum(axis=2)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(pseudo > 0, pan / pseudo, 0.0)
    out = rgb * ratio[:, :, None]
    dtype = np.uint8 if bit_depth <= 8 else np.uint16
    return set_type(np.clip(out, 0, (1 << bit_depth) - 1), dtype)


def clean_collar(img, threshold=15, color="black", pixel_distance=2):
    """Trim the near-black/near-white collar reachable from the borders
    (``apps/gdalalg_raster_clean_collar.cpp`` semantics): border-connected
    pixels within ``threshold`` of the collar color become 0 (black) /
    255 (white); interior pixels of the same color survive.  Returns
    (cleaned, collar_mask)."""
    img = np.asarray(img)
    # nearblack_lib.cpp:588-598: a pixel is collar-colored iff EVERY
    # band is within nearDist of the target color
    if color == "black":
        fill_value = 0
        near = (img <= threshold if img.ndim == 2
                else (img <= threshold).all(axis=2))
    else:
        fill_value = 255
        near = (img >= 255 - threshold if img.ndim == 2
                else (img >= 255 - threshold).all(axis=2))
    h, w = near.shape
    collar = np.zeros_like(near)
    collar[0, :] = near[0, :]
    collar[-1, :] = near[-1, :]
    collar[:, 0] = near[:, 0]
    collar[:, -1] = near[:, -1]

    def _dilate(mask):
        grow = np.zeros_like(mask)
        grow[:-1, :] |= mask[1:, :]
        grow[1:, :] |= mask[:-1, :]
        grow[:, :-1] |= mask[:, 1:]
        grow[:, 1:] |= mask[:, :-1]
        return grow

    # Flood through `near` pixels; the search may additionally jump over
    # up to `pixel_distance` non-collar-colored pixels (the reference's
    # --pixel-distance semantics), so after each flood fixpoint the
    # reachable set dilates over ANY pixels by that budget and flooding
    # resumes from newly reached near pixels.
    while True:
        # flood to fixpoint across near pixels
        while True:
            frontier = _dilate(collar) & near & ~collar
            if not frontier.any():
                break
            collar |= frontier
        if not pixel_distance:
            break
        reach = collar.copy()
        for _ in range(pixel_distance + 1):
            reach |= _dilate(reach)
        jumped = reach & near & ~collar
        if not jumped.any():
            break
        collar |= jumped
    out = img.copy()
    out[collar] = fill_value
    return out, collar


def _gradient_gdal(z, gt, xscale, yscale, z_factor, alg):
    """Shared gdaldem 3x3 gradient: returns (x, y, zf, window_list)."""
    h_, w_ = z.shape
    w = [z[dy:h_ - 2 + dy, dx:w_ - 2 + dx]
         for dy in range(3) for dx in range(3)]
    if alg == "zevenbergen_thorne":
        # alg/gdaldem_lib.cpp Gradient<ZEVENBERGEN_THORNE>: central
        # differences, z factor divided by 2 instead of 8
        x = (w[3] - w[5]) / (gt[1] * xscale)
        y = (w[7] - w[1]) / (gt[5] * yscale)
        zf = z_factor / 2.0
    else:
        x = ((w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])) \
            / (gt[1] * xscale)
        y = ((w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])) \
            / (gt[5] * yscale)
        zf = z_factor / 8.0
    return x, y, zf, w


def _nodata_window_mask(w, src_nodata):
    """True where any of the 9 window samples equals src_nodata / NaN
    (gdaldem ComputeVal: such pixels emit dstnodata)."""
    bad = np.zeros(w[0].shape, dtype=bool)
    for wi in w:
        if src_nodata is not None:
            bad |= wi == src_nodata
        bad |= ~np.isfinite(wi)
    return bad


def hillshade_gdal(z, gt, z_factor=1.0, xscale=1.0, yscale=1.0,
                   azimuth=315.0, altitude=45.0, alg="horn",
                   src_nodata=None):
    """gdaldem-exact hillshade (apps/gdaldem_lib.cpp GDALHillshadeAlg).

    Returns uint8 with the reference's conventions: value = 1 +
    254·cang (clamped at 1 when non-positive), 1-pixel border = 0
    (nodata — the ``compute_edges=False`` default), Horn gradients
    divided by (res·scale) with z/8 folded into the z factor.
    Validated against the published n43.tif checksums
    (autotest/utilities/test_gdaldem_lib.py:50-66).
    """
    z = np.asarray(z, dtype=np.float64)
    x, y, zf, w = _gradient_gdal(z, gt, xscale, yscale, z_factor, alg)
    alt = np.radians(altitude)
    az = np.radians(azimuth)
    num = (254.0 * np.sin(alt)
           - (y * 254.0 * np.cos(az) * np.cos(alt) * zf
              - x * 254.0 * np.sin(az) * np.cos(alt) * zf))
    cang254 = num / np.sqrt(1.0 + zf * zf * (x * x + y * y))
    val = np.where(cang254 <= 0.0, 1.0, 1.0 + cang254)
    # gdaldem quantizes per pixel through float32 before the Byte write
    val = val.astype(np.float32)
    bad = _nodata_window_mask(w, src_nodata)
    val = np.where(bad, 0.0, val)
    out = np.zeros(z.shape, dtype=np.uint8)
    out[1:-1, 1:-1] = copy_words_cast(val, np.uint8)
    return out


def hillshade_gdal_combined(z, gt, z_factor=1.0, xscale=1.0, yscale=1.0,
                            azimuth=315.0, altitude=45.0, alg="horn",
                            src_nodata=None):
    """gdaldem hillshade -combined (GDALHillshadeCombinedAlg):
    cang = 1 − acos(shade) · atan(√slope) · (2/π)², scaled to 1+254."""
    z = np.asarray(z, dtype=np.float64)
    x, y, zf, w = _gradient_gdal(z, gt, xscale, yscale, z_factor, alg)
    alt = np.radians(altitude)
    az = np.radians(azimuth)
    xx_plus_yy = x * x + y * y
    slope_sq = xx_plus_yy * zf * zf
    shade = (np.sin(alt) - (y * np.cos(az) * np.cos(alt) * zf
                            - x * np.sin(az) * np.cos(alt) * zf)) \
        / np.sqrt(1.0 + slope_sq)
    cang = np.arccos(np.clip(shade, -1.0, 1.0))
    inv_sq_half_pi = 1.0 / (np.pi * np.pi / 4.0)
    cang = 1.0 - cang * np.arctan(np.sqrt(slope_sq)) * inv_sq_half_pi
    val = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang).astype(np.float32)
    val = np.where(_nodata_window_mask(w, src_nodata), 0.0, val)
    out = np.zeros(z.shape, dtype=np.uint8)
    out[1:-1, 1:-1] = copy_words_cast(val, np.uint8)
    return out


def _dem_border(interior, shape, nodata):
    out = np.full(shape, nodata, dtype=np.float32)
    out[1:-1, 1:-1] = interior.astype(np.float32)
    return out


def slope_gdal(z, gt, xscale=1.0, yscale=1.0, alg="horn", degrees=True,
               nodata=-9999.0):
    """gdaldem slope parity (GDALSlope{Horn,ZevenbergenThorne}Alg):
    float32 output, −9999 borders; validated against the published
    ZT checksum 64393 (test_gdaldem_lib.py:791-808)."""
    z = np.asarray(z, dtype=np.float64)
    x, y, _, w = _gradient_gdal(z, gt, xscale, yscale, 1.0, alg)
    div = 2.0 if alg == "zevenbergen_thorne" else 8.0
    key = np.sqrt(x * x + y * y) / div
    val = np.degrees(np.arctan(key)) if degrees else 100.0 * key
    return _dem_border(val, z.shape, nodata)


def aspect_gdal(z, alg="horn", azimuth=True, nodata=-9999.0):
    """gdaldem aspect parity (GDALAspectAlg): azimuth convention, flat
    cells → nodata; validated against the published ZT checksum 50539
    (test_gdaldem_lib.py:815-830).  Note aspect ignores resolution."""
    z = np.asarray(z, dtype=np.float64)
    h_, w_ = z.shape
    w = [z[dy:h_ - 2 + dy, dx:w_ - 2 + dx]
         for dy in range(3) for dx in range(3)]
    if alg == "zevenbergen_thorne":
        dx = w[5] - w[3]
        dy = w[7] - w[1]
    else:
        dx = (w[2] + 2 * w[5] + w[8]) - (w[0] + 2 * w[3] + w[6])
        dy = (w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])
    asp = np.degrees(np.arctan2(dy, -dx)).astype(np.float32)
    if azimuth:
        asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    else:
        asp = np.where(asp < 0, asp + 360.0, asp)
    asp = np.where(asp == 360.0, 0.0, asp)
    asp = np.where((dx == 0) & (dy == 0), nodata, asp)
    return _dem_border(asp, z.shape, nodata)


def tpi_gdal(z, nodata=-9999.0):
    """gdaldem tpi parity (GDALTPIAlg): center − mean of 8 neighbors;
    published checksum 60504 on n43.tif."""
    z = np.asarray(z, dtype=np.float64)
    h_, w_ = z.shape
    w = [z[dy:h_ - 2 + dy, dx:w_ - 2 + dx]
         for dy in range(3) for dx in range(3)]
    neigh = sum(w[i] for i in range(9) if i != 4)
    return _dem_border(w[4] - neigh * np.float32(0.125), z.shape, nodata)


def tri_gdal(z, alg="riley", nodata=-9999.0):
    """gdaldem tri parity: Riley sqrt-of-squared-diffs (default;
    checksum 41233) or Wilson mean |diff| (checksum 61143)."""
    z = np.asarray(z, dtype=np.float64)
    h_, w_ = z.shape
    w = [z[dy:h_ - 2 + dy, dx:w_ - 2 + dx]
         for dy in range(3) for dx in range(3)]
    c = w[4]
    if alg == "wilson":
        val = sum(np.abs(w[i] - c) for i in range(9) if i != 4) \
            * np.float32(0.125)
    else:
        val = np.sqrt(sum((w[i] - c) ** 2 for i in range(9) if i != 4))
    return _dem_border(val, z.shape, nodata)


def roughness_gdal(z, nodata=-9999.0):
    """gdaldem roughness parity: 3×3 window max − min (checksum 38624)."""
    z = np.asarray(z, dtype=np.float64)
    h_, w_ = z.shape
    w = np.stack([z[dy:h_ - 2 + dy, dx:w_ - 2 + dx]
                  for dy in range(3) for dx in range(3)])
    return _dem_border(w.max(axis=0) - w.min(axis=0), z.shape, nodata)


def _windows_compute_edges(z):
    """The 9 gdaldem 3×3 window arrays WITH -compute_edges semantics
    (GDALGeneric3x3Processing, apps/gdaldem_lib.cpp:451-500 + :599-621):
    top/bottom rows extrapolate vertically (2a−b) with CLAMPED columns;
    left/right columns of interior rows extrapolate horizontally."""
    z = np.asarray(z, dtype=np.float64)
    p = np.pad(z, 1, mode="edge")
    h_, w_ = p.shape
    W = [p[dy:h_ - 2 + dy, dx:w_ - 2 + dx].copy()
         for dy in range(3) for dx in range(3)]
    for k in range(3):          # top row: vertical extrapolation
        W[k][0, :] = 2 * W[k + 3][0, :] - W[k + 6][0, :]
    for k in range(6, 9):       # bottom row
        W[k][-1, :] = 2 * W[k - 3][-1, :] - W[k - 6][-1, :]
    for k in (0, 3, 6):         # left column, interior rows only
        W[k][1:-1, 0] = 2 * W[k + 1][1:-1, 0] - W[k + 2][1:-1, 0]
    for k in (2, 5, 8):         # right column
        W[k][1:-1, -1] = 2 * W[k - 1][1:-1, -1] - W[k - 2][1:-1, -1]
    return W


def hillshade_multidirectional(z, gt, z_factor=1.0, xscale=1.0,
                               yscale=1.0, altitude=45.0,
                               compute_edges=True):
    """gdaldem hillshade -multidirectional (USGS OF 92-422 weighting of
    azimuths 225/270/315/360; GDALHillshadeMultiDirectionalAlg).
    Validated against the published n43.tif checksum 51784
    (test_gdaldem_lib.py:440-456, computeEdges=True)."""
    z = np.asarray(z, dtype=np.float64)
    if compute_edges:
        W = _windows_compute_edges(z)
    else:
        p = np.pad(z, 1, mode="edge")
        h_, w_ = p.shape
        W = [p[dy:h_ - 2 + dy, dx:w_ - 2 + dx]
             for dy in range(3) for dx in range(3)]
    x = ((W[0] + 2 * W[3] + W[6]) - (W[2] + 2 * W[5] + W[8])) \
        / (gt[1] * xscale)
    y = ((W[6] + 2 * W[7] + W[8]) - (W[0] + 2 * W[1] + W[2])) \
        / (gt[5] * yscale)
    zf = z_factor / 8.0
    alt = np.radians(altitude)
    cos_alt_mul_z = np.cos(alt) * zf
    s127 = 127.0 * np.sin(alt)
    c225_127 = 127.0 * np.cos(np.radians(225.0)) * cos_alt_mul_z
    c127 = 127.0 * cos_alt_mul_z
    xx = x * x
    yy = y * y
    xy = xx + yy
    v225 = np.maximum(s127 + (x - y) * c225_127, 0.0)
    v270 = np.maximum(s127 - x * c127, 0.0)
    v315 = np.maximum(s127 + (x + y) * c225_127, 0.0)
    v360 = np.maximum(s127 - y * c127, 0.0)
    w225 = 0.5 * xy - x * y
    w315 = xy - w225
    with np.errstate(invalid="ignore", divide="ignore"):
        cang127 = ((w225 * v225 + xx * v270 + w315 * v315 + yy * v360)
                   / xy) / np.sqrt(1.0 + zf * zf * xy)
    val = np.where(xy == 0.0, 1.0 + 2.0 * s127,
                   1.0 + cang127).astype(np.float32)
    out = copy_words_cast(val, np.uint8)
    if not compute_edges:
        out[0, :] = out[-1, :] = 0
        out[:, 0] = out[:, -1] = 0
    return out
