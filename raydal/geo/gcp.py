"""GCP-based georeferencing — affine fit, polynomial transformers and
thin-plate splines, from public formulas.

* :func:`gcps_to_geotransform` — the reference's
  ``GDALGCPsToGeoTransform`` semantics (``gcore/gdal_misc.cpp:3110``):
  2-GCP scale/offset special case, the axis-aligned 4-corner special
  case, min/max normalization of both spaces, closed-form least-squares
  affine, hour-glass degeneracy rejection, and the 0.25-pixel
  back-substitution gate when ``approx_ok=False``.  Validated against
  every published case in ``autotest/gcore/gcps2geotransform.py``.
* :class:`GCPPolynomialTransformer` — order 1/2/3 polynomial fit with
  mean-centering (``alg/gdal_crs.cpp`` CRS_compute_georef_equations
  semantics), forward + inverse fits.
* :class:`TPSTransformer` — thin-plate spline interpolation
  (``alg/gdal_tps.cpp`` capability; classic U(r) = r² log r² radial
  basis with affine part, solved as one dense system).

All transformers expose ``.transform(x, y)`` (vectorized) so they slot
into :func:`raydal.ops.warp.warp_array` / ``project_grid`` in place of
the CRS transformer — the reference's ``-order n`` / ``-tps`` gdalwarp
modes.
"""

from __future__ import annotations

import numpy as np

from . import affine

__all__ = ["gcps_to_geotransform", "GCPPolynomialTransformer",
           "TPSTransformer"]


def _compose_gt(a, b):
    """Compose geotransforms: apply ``a`` then ``b`` (the reference's
    GDALComposeGeoTransforms argument order)."""
    return (
        b[0] + b[1] * a[0] + b[2] * a[3],
        b[1] * a[1] + b[2] * a[4],
        b[1] * a[2] + b[2] * a[5],
        b[3] + b[4] * a[0] + b[5] * a[3],
        b[4] * a[1] + b[5] * a[4],
        b[4] * a[2] + b[5] * a[5],
    )


def gcps_to_geotransform(gcps, approx_ok=True, pixel_threshold=0.25):
    """GCPs [(pixel, line, geox, geoy), ...] → geotransform tuple or
    ``None`` (degenerate / over-threshold when ``approx_ok=False``)."""
    g = np.asarray(gcps, dtype=np.float64)
    if g.ndim != 2 or g.shape[1] < 4 or len(g) < 2:
        return None
    px, ln, gx, gy = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    n = len(g)

    if n == 2:
        if px[1] == px[0] or ln[1] == ln[0]:
            return None
        gt1 = (gx[1] - gx[0]) / (px[1] - px[0])
        gt5 = (gy[1] - gy[0]) / (ln[1] - ln[0])
        return (gx[0] - px[0] * gt1, gt1, 0.0,
                gy[0] - ln[0] * gt5, 0.0, gt5)

    # axis-aligned 4-corner rectangle: exact, bypasses least squares
    if (n == 4 and ln[0] == ln[1] and ln[2] == ln[3]
            and px[0] == px[3] and px[1] == px[2]
            and ln[0] != ln[2] and px[0] != px[1]
            and gy[0] == gy[1] and gy[2] == gy[3]
            and gx[0] == gx[3] and gx[1] == gx[2]
            and gy[0] != gy[2] and gx[0] != gx[1]):
        gt1 = (gx[1] - gx[0]) / (px[1] - px[0])
        gt5 = (gy[2] - gy[1]) / (ln[2] - ln[1])
        return (gx[0] - px[0] * gt1, gt1, 0.0,
                gy[0] - ln[0] * gt5, 0.0, gt5)

    eps = 1.0e-12
    if (px.ptp() < eps or ln.ptp() < eps
            or gx.ptp() < eps or gy.ptp() < eps):
        return None

    # normalize both spaces to [0, 1] before the fit (conditioning)
    pl_norm = (-px.min() / px.ptp(), 1.0 / px.ptp(), 0.0,
               -ln.min() / ln.ptp(), 0.0, 1.0 / ln.ptp())
    geo_norm = (-gx.min() / gx.ptp(), 1.0 / gx.ptp(), 0.0,
                -gy.min() / gy.ptp(), 0.0, 1.0 / gy.ptp())
    npx, nln = affine.apply_gt(pl_norm, px, ln)
    ngx, ngy = affine.apply_gt(geo_norm, gx, gy)

    A = np.column_stack([np.ones(n), npx, nln])
    try:
        cx, *_ = np.linalg.lstsq(A, ngx, rcond=None)
        cy, *_ = np.linalg.lstsq(A, ngy, rcond=None)
    except np.linalg.LinAlgError:
        return None
    gt_norm = (float(cx[0]), float(cx[1]), float(cx[2]),
               float(cy[0]), float(cy[1]), float(cy[2]))

    inv_geo = affine.invert_gt(geo_norm)
    gt = _compose_gt(_compose_gt(pl_norm, gt_norm), inv_geo)

    # hour-glass degenerate fits collapse a scale term to ~0
    if abs(gt[1]) <= 1e-15 or abs(gt[5]) <= 1e-15:
        return None

    if not approx_ok:
        pixel_size = 0.5 * (abs(gt[1]) + abs(gt[2])
                            + abs(gt[4]) + abs(gt[5]))
        if pixel_size == 0.0:
            return None
        fx, fy = affine.apply_gt(gt, px, ln)
        err = np.hypot(fx - gx, fy - gy) / pixel_size
        if err.max() > pixel_threshold:
            return None
    return gt


def _poly_terms(x, y, order):
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x ** 3, y ** 3]
    return np.column_stack(cols)


class GCPPolynomialTransformer:
    """Order 1/2/3 polynomial GCP transformer (forward pixel→geo and
    inverse geo→pixel fits, both mean-centered for conditioning —
    ``alg/gdal_crs.cpp`` semantics).

    ``transform(x, y)`` maps pixel → geo; ``inverse(x, y)`` maps geo →
    pixel (its own least-squares fit, like CRS_compute_georef_equations
    fitting both directions)."""

    # distinct src/dst markers so project_grid's identity check sees a
    # real transform
    src = "pixel"
    dst = "geo"

    def __init__(self, gcps, order=1):
        g = np.asarray(gcps, dtype=np.float64)
        need = {1: 3, 2: 6, 3: 10}[order]
        if len(g) < need:
            raise ValueError(
                f"order-{order} polynomial needs >= {need} GCPs")
        self.order = order
        px, ln, gx, gy = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
        self._p_mean = (px.mean(), ln.mean())
        self._g_mean = (gx.mean(), gy.mean())
        Af = _poly_terms(px - self._p_mean[0], ln - self._p_mean[1],
                         order)
        self._fx, *_ = np.linalg.lstsq(Af, gx - self._g_mean[0],
                                       rcond=None)
        self._fy, *_ = np.linalg.lstsq(Af, gy - self._g_mean[1],
                                       rcond=None)
        Ai = _poly_terms(gx - self._g_mean[0], gy - self._g_mean[1],
                         order)
        self._ix, *_ = np.linalg.lstsq(Ai, px - self._p_mean[0],
                                       rcond=None)
        self._iy, *_ = np.linalg.lstsq(Ai, ln - self._p_mean[1],
                                       rcond=None)

    def transform(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self._p_mean[0]
        y = np.asarray(y, dtype=np.float64) - self._p_mean[1]
        T = _poly_terms(x.ravel(), y.ravel(), self.order)
        return ((T @ self._fx).reshape(x.shape) + self._g_mean[0],
                (T @ self._fy).reshape(y.shape) + self._g_mean[1])

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self._g_mean[0]
        y = np.asarray(y, dtype=np.float64) - self._g_mean[1]
        T = _poly_terms(x.ravel(), y.ravel(), self.order)
        return ((T @ self._ix).reshape(x.shape) + self._p_mean[0],
                (T @ self._iy).reshape(y.shape) + self._p_mean[1])


def _tps_kernel(r2):
    # U(r) = r^2 log r^2 (equivalently 2 r^2 log r); U(0) = 0
    with np.errstate(divide="ignore", invalid="ignore"):
        u = r2 * np.log(r2)
    return np.where(r2 > 0, u, 0.0)


class TPSTransformer:
    """Thin-plate-spline GCP transformer: exact interpolation at the
    GCPs, smooth in between (``alg/gdal_tps.cpp`` capability; classic
    radial-basis solve).  Forward = pixel→geo; ``inverse`` fits the
    swapped direction."""

    src = "pixel"
    dst = "geo"

    def __init__(self, gcps):
        g = np.asarray(gcps, dtype=np.float64)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = self._fit(g[:, 0], g[:, 1], g[:, 2], g[:, 3])
        self._inv = self._fit(g[:, 2], g[:, 3], g[:, 0], g[:, 1])

    @staticmethod
    def _fit(x, y, tx, ty):
        n = len(x)
        d2 = ((x[:, None] - x[None, :]) ** 2
              + (y[:, None] - y[None, :]) ** 2)
        K = _tps_kernel(d2)
        P = np.column_stack([np.ones(n), x, y])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        bx = np.concatenate([tx, np.zeros(3)])
        by = np.concatenate([ty, np.zeros(3)])
        try:
            wx = np.linalg.solve(A, bx)
            wy = np.linalg.solve(A, by)
        except np.linalg.LinAlgError:
            wx, *_ = np.linalg.lstsq(A, bx, rcond=None)
            wy, *_ = np.linalg.lstsq(A, by, rcond=None)
        return x, y, wx, wy

    @staticmethod
    def _eval(fit, qx, qy):
        x, y, wx, wy = fit
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        shape = qx.shape
        fq = qx.ravel()
        gq = qy.ravel()
        d2 = ((fq[:, None] - x[None, :]) ** 2
              + (gq[:, None] - y[None, :]) ** 2)
        U = _tps_kernel(d2)
        n = len(x)
        ox = U @ wx[:n] + wx[n] + wx[n + 1] * fq + wx[n + 2] * gq
        oy = U @ wy[:n] + wy[n] + wy[n + 1] * fq + wy[n + 2] * gq
        return ox.reshape(shape), oy.reshape(shape)

    def transform(self, x, y):
        return self._eval(self._fwd, x, y)

    def inverse(self, x, y):
        return self._eval(self._inv, x, y)
