"""Affine geotransform math (GDAL 6-coefficient convention).

Semantics follow the reference's geotransform contract
(``gcore/gdaldataset.cpp:1361``):

    Xgeo = GT[0] + P * GT[1] + L * GT[2]
    Ygeo = GT[3] + P * GT[4] + L * GT[5]

where (P, L) is the pixel/line coordinate of the *top-left corner* of the
pixel; pixel centers are at (P + 0.5, L + 0.5).  All functions are
vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "apply_gt",
    "invert_gt",
    "gt_extent",
    "north_up_gt",
    "pixel_centers",
]


def apply_gt(gt, px, py):
    """Pixel/line → georeferenced coords. ``gt`` is the 6-tuple above."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x = gt[0] + px * gt[1] + py * gt[2]
    y = gt[3] + px * gt[4] + py * gt[5]
    return x, y


def invert_gt(gt):
    """Return the inverse geotransform (world → pixel).

    Mirrors ``GDALInvGeoTransform`` semantics: solves the 2x2 linear system;
    raises ``ValueError`` for a singular transform.
    """
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if abs(det) < 1e-300:
        raise ValueError("non-invertible geotransform")
    inv_det = 1.0 / det
    # inverse of [[gt1, gt2], [gt4, gt5]] applied after removing the origin
    i1 = gt[5] * inv_det
    i2 = -gt[2] * inv_det
    i4 = -gt[4] * inv_det
    i5 = gt[1] * inv_det
    i0 = -(i1 * gt[0] + i2 * gt[3])
    i3 = -(i4 * gt[0] + i5 * gt[3])
    return (i0, i1, i2, i3, i4, i5)


def gt_extent(gt, w, h):
    """(xmin, ymin, xmax, ymax) of the full raster footprint.

    Handles rotated transforms by taking the bbox of the four corners.
    """
    cx = np.array([0.0, w, 0.0, w])
    cy = np.array([0.0, 0.0, h, h])
    x, y = apply_gt(gt, cx, cy)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def north_up_gt(xmin, ymax, xres, yres):
    """Standard north-up geotransform from origin + pixel sizes.

    ``yres`` is the positive pixel height; stored negative per convention.
    """
    return (float(xmin), float(xres), 0.0, float(ymax), 0.0, -float(yres))


def pixel_centers(gt, w, h):
    """Georeferenced coordinates of every pixel center as (X, Y) 2-D arrays."""
    px = np.arange(w, dtype=np.float64) + 0.5
    py = np.arange(h, dtype=np.float64) + 0.5
    PX, PY = np.meshgrid(px, py)
    return apply_gt(gt, PX, PY)
