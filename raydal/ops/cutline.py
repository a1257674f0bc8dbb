"""Warp cutline mask generation — ``GDALWarpCutlineMasker`` semantics.

Replicates ``alg/gdalcutline.cpp``: the cutline polygon (in SOURCE
pixel/line coordinates, ``alg/gdalwarper.h`` CUTLINE docs) is burned into
a byte mask with the standard even-odd scanline rasterizer
(``GDALRasterizeGeometries`` with an identity geotransform,
``alg/gdalcutline.cpp:338-365``), then either

* ``blend_dist == 0`` — the mask hard-zeroes source validity outside the
  polygon (``alg/gdalcutline.cpp:376-383``), or
* ``blend_dist > 0`` — ``BlendMaskGenerator`` (``alg/gdalcutline.cpp:52``)
  feathers validity across the boundary: for each pixel center within
  ``blend_dist`` of the polygon boundary (the polygon converted to lines,
  so the ramp applies on BOTH sides of the edge), validity is multiplied
  by ``0.5 + dist/blend*0.5`` inside the burned mask and
  ``0.5 - dist/blend*0.5`` outside (``:169-174``); pixels farther than
  ``blend_dist`` keep validity 1 inside and drop to 0 outside.

The resulting float density feeds the warp exactly like GDAL's unified
source density: a nearest-kernel destination pixel over density ``d``
becomes ``src`` when ``d >= 0.9999``, stays at the initialized value when
``d < 0.0001``, and otherwise blends ``src*d + init*(1-d)`` with
GDALCopyWords rounding (``GWKSetPixelValue``,
``alg/gdalwarpkernel.cpp:1626-1760``; thresholds ``:1642-1645``).

Distribution note: per-chunk execution in the reference clips the
boundary lines to the chunk rect expanded by ``blend_dist + 1``
(``alg/gdalcutline.cpp:70-101``) purely as an optimization — distances to
boundary parts outside that rect exceed ``blend_dist`` and cannot change
the ramp, so computing against the full boundary (as here, per image row
inside ``map_batches``) is equivalent.
"""

from __future__ import annotations

import numpy as np

from ..geo.wkb import _points_to_segments_dist, _ring_segments
from ..kernels.resample import copy_words_cast
from .rasterize import burn_line_all_touched, fill_polygon_even_odd

__all__ = ["cutline_density_mask", "apply_cutline"]


def cutline_density_mask(rings_px, w, h, blend_dist=0.0,
                         all_touched=False, validity=None):
    """Float32 (h, w) source-density mask for a cutline polygon.

    ``rings_px``: iterable of (N, 2) ring coordinate arrays in source
    pixel space — pass every ring of a (Multi)Polygon together so holes
    and multiple parts resolve by the even-odd rule, exactly like
    ``GDALCollectRingsFromGeometry`` feeding one
    ``GDALdllImageFilledPolygon`` pass (``alg/gdalrasterize.cpp:569``).
    ``validity``: optional existing float mask to scale (defaults to 1.0
    everywhere, the no-other-masks case).
    """
    rings_px = [np.asarray(r, dtype=np.float64) for r in rings_px]
    poly = np.zeros((h, w), dtype=np.float64)
    fill_polygon_even_odd(rings_px, w, h, out=poly, value=1.0)
    if all_touched:
        for ring in rings_px:
            burn_line_all_touched(poly, ring, value=1.0)
    inside = poly > 0
    mask = (np.ones((h, w), dtype=np.float32) if validity is None
            else np.asarray(validity, dtype=np.float32).copy())
    if blend_dist <= 0.0:
        mask[~inside] = 0.0
        return mask

    segs = np.concatenate([_ring_segments(r) for r in rings_px])
    # candidate band: polygon envelope expanded by blend_dist
    # (alg/gdalcutline.cpp:121-128); everything outside it is farther
    # than blend_dist from the boundary, so outside-mask pixels zero.
    xmin = min(r[:, 0].min() for r in rings_px)
    xmax = max(r[:, 0].max() for r in rings_px)
    ymin = min(r[:, 1].min() for r in rings_px)
    ymax = max(r[:, 1].max() for r in rings_px)
    ix0 = max(0, int(np.floor(xmin - blend_dist)))
    ix1 = min(w, int(np.ceil(xmax + blend_dist)))
    iy0 = max(0, int(np.floor(ymin - blend_dist)))
    iy1 = min(h, int(np.ceil(ymax + blend_dist)) + 1)
    out_of_band = np.ones((h, w), dtype=bool)
    out_of_band[iy0:iy1, ix0:ix1] = False
    mask[out_of_band & ~inside] = 0.0
    if ix1 <= ix0 or iy1 <= iy0:
        return mask

    # Distances run in row blocks with per-block segment pre-filtering
    # (the reference clips boundary lines to the chunk rect + blend+1,
    # alg/gdalcutline.cpp:70-101) so memory stays
    # block_pixels × nearby_segments instead of band_pixels × segments.
    cols = np.arange(ix0, ix1, dtype=np.float64) + 0.5
    seg_ymin = np.minimum(segs[:, 0, 1], segs[:, 1, 1])
    seg_ymax = np.maximum(segs[:, 0, 1], segs[:, 1, 1])
    block = max(1, int(4e6 / max(1, len(segs)) / max(1, ix1 - ix0)))
    for by in range(iy0, iy1, block):
        by1 = min(by + block, iy1)
        near_segs = segs[(seg_ymax >= by - blend_dist - 1)
                         & (seg_ymin <= by1 + blend_dist + 1)]
        band_inside = inside[by:by1, ix0:ix1]
        sub = mask[by:by1, ix0:ix1]
        if len(near_segs) == 0:
            sub[~band_inside] = 0.0    # farther than blend from boundary
            continue
        rows = np.arange(by, by1, dtype=np.float64) + 0.5
        X, Y = np.meshgrid(cols, rows)
        dist = _points_to_segments_dist(
            X.ravel(), Y.ravel(), near_segs).min(axis=1).reshape(X.shape)
        near = dist <= blend_dist
        ratio = np.where(band_inside, 0.5 + dist / blend_dist * 0.5,
                         0.5 - dist / blend_dist * 0.5)
        sub[near] *= ratio[near].astype(np.float32)
        sub[~near & ~band_inside] = 0.0
    return mask


def apply_cutline(px_band, density, init=0.0, dtype=None):
    """Blend one source band against ``init`` by the cutline density —
    the ``GWKSetPixelValue`` composite for INIT_DEST with no destination
    alpha (``alg/gdalwarpkernel.cpp:1642-1765``): full density copies the
    source, sub-threshold density keeps ``init``, intermediate density
    mixes ``src*d + init*(1-d)`` then clamps/rounds per the working
    dtype (GDALCopyWords ``floor(v + 0.5)``)."""
    dtype = dtype or px_band.dtype
    src = px_band.astype(np.float64)
    mixed = src * density + init * (1.0 - density)
    out = copy_words_cast(mixed, dtype)
    full = density >= 0.9999
    out[full] = px_band[full].astype(dtype)
    blank = copy_words_cast(np.full_like(src, init), dtype)
    low = density < 0.0001
    out[low] = blank[low]
    return out
