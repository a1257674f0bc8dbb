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
* :class:`RPCTransformer` — RPC00B rational polynomials
  (``alg/gdal_rpc.cpp`` semantics: 20-term basis order, the
  center-of-pixel → corner +0.5 convention, and the reference's exact
  fixed-point inverse iteration) — validated against the published
  ``autotest/gcore/transformer.py`` points at 1e-6 degrees.

All transformers expose ``.transform(x, y)`` (vectorized) so they slot
into :func:`raydal.ops.warp.warp_array` / ``project_grid`` in place of
the CRS transformer — the reference's ``-order n`` / ``-tps`` gdalwarp
modes.
"""

from __future__ import annotations

import numpy as np

from ..kernels.resample import interpolate_at_point
from . import affine

__all__ = ["gcps_to_geotransform", "GCPPolynomialTransformer",
           "TPSTransformer", "RPCTransformer", "RPCDem",
           "GCPHomographyTransformer", "GeolocArrayTransformer"]


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


def _rpc_terms(L, P, H):
    """RPC00B 20-term cubic basis in the standard coefficient order
    (L = normalized longitude, P = normalized latitude, H = normalized
    height) — ``alg/gdal_rpc.cpp`` RPCEvaluate term order."""
    return np.stack([
        np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P,
        H * H, P * L * H, L ** 3, L * P * P, L * H * H, L * L * P,
        P ** 3, P * H * H, L * L * H, P * P * H, H ** 3], axis=-1)


class RPCDem:
    """Terrain source for :class:`RPCTransformer` — the reference's
    RPC_DEM / RPC_DEMINTERPOLATION / RPC_DEM_MISSING_VALUE transformer
    options (``alg/gdal_rpc.cpp`` GDALRPCGetHeightAtLongLat:549 →
    GDALRPCGetDEMHeight:1378, which delegates to
    ``GDALInterpolateAtPoint``).

    ``band``: 2-D elevation array.  ``geotransform``: the DEM's affine
    GT.  ``to_dem_crs``: optional vectorized ``(lon, lat) → (x, y)``
    callable when the DEM is not in the RPC's WGS84 space (the
    reference builds an OGRCoordinateTransformation; pass e.g.
    ``lambda lon, lat: crs.lonlat_to_utm(lon, lat, 32652)``).
    ``missing_value``: substituted where the DEM has no sample
    (RPC_DEM_MISSING_VALUE); without it a miss is a hard failure."""

    def __init__(self, band, geotransform, interpolation="bilinear",
                 missing_value=None, to_dem_crs=None):
        self.band = np.asarray(band, dtype=np.float64)
        self.gt = tuple(float(v) for v in geotransform)
        self.inv_gt = affine.invert_gt(self.gt)
        if interpolation not in ("near", "nearest", "bilinear", "cubic",
                                 "cubicspline"):
            raise ValueError(f"unknown DEM interpolation {interpolation!r}")
        self.interpolation = interpolation
        self.missing_value = missing_value
        self.ct = to_dem_crs

    def pixel_line(self, lon, lat):
        x, y = (lon, lat) if self.ct is None else self.ct(lon, lat)
        ig = self.inv_gt
        return (ig[0] + ig[1] * x + ig[2] * y,
                ig[3] + ig[4] * x + ig[5] * y)

    def raw_height(self, px, ln):
        """GDALRPCGetDEMHeight: interpolated value or None."""
        return interpolate_at_point(self.band, px, ln, self.interpolation)

    def height(self, lon, lat):
        """GetHeightAtLongLat's DEM leg → (ok, demh, dem_px, dem_ln);
        the missing-value substitution is applied here, height
        offset/scale by the caller."""
        px, ln = self.pixel_line(float(lon), float(lat))
        v = self.raw_height(px, ln)
        if v is None:
            if self.missing_value is not None:
                return True, float(self.missing_value), px, ln
            return False, 0.0, px, ln
        return True, float(v), px, ln


class RPCTransformer:
    """RPC00B rational-polynomial transformer (``alg/gdal_rpc.cpp``
    capability): the native model maps (long, lat, height) → (pixel,
    line) as 20-term cubic ratios over offset/scale-normalized
    coordinates; the pixel→geo direction is solved by Newton iteration
    with a numeric Jacobian (the reference iterates to an
    RPC_PIXEL_ERROR_THRESHOLD the same way).

    ``rpc``: dict with the standard RPC metadata keys (LINE_OFF,
    SAMP_OFF, LAT_OFF, LONG_OFF, HEIGHT_OFF, *_SCALE, and the four
    20-float coefficient lists LINE_NUM_COEFF / LINE_DEN_COEFF /
    SAMP_NUM_COEFF / SAMP_DEN_COEFF, as floats or space-separated
    strings).  Validated against the published
    autotest/gcore/transformer.py test_transformer_5 point."""

    src = "pixel"
    dst = "geo"

    def __init__(self, rpc, height=0.0, height_scale=1.0, dem=None,
                 pixel_error_threshold=0.05, max_iterations=None):
        def num(k):
            return float(rpc[k])

        def coefs(k):
            v = rpc[k]
            if isinstance(v, str):
                v = v.replace(",", " ").split()
            a = np.asarray([float(c) for c in v], dtype=np.float64)
            if len(a) != 20:
                raise ValueError(f"{k} needs 20 coefficients")
            return a

        self.line_off = num("LINE_OFF")
        self.samp_off = num("SAMP_OFF")
        self.lat_off = num("LAT_OFF")
        self.long_off = num("LONG_OFF")
        self.height_off = num("HEIGHT_OFF")
        self.line_scale = num("LINE_SCALE")
        self.samp_scale = num("SAMP_SCALE")
        self.lat_scale = num("LAT_SCALE")
        self.long_scale = num("LONG_SCALE")
        # HEIGHT_SCALE metadata normalizes the model's H term; distinct
        # from the RPC_HEIGHT_SCALE *option* (self.height_scale) that
        # multiplies DEM samples
        self.hscale_norm = num("HEIGHT_SCALE")
        self.line_num = coefs("LINE_NUM_COEFF")
        self.line_den = coefs("LINE_DEN_COEFF")
        self.samp_num = coefs("SAMP_NUM_COEFF")
        self.samp_den = coefs("SAMP_DEN_COEFF")
        self.height = float(height)          # RPC_HEIGHT user offset
        self.height_scale = float(height_scale)   # RPC_HEIGHT_SCALE
        self.dem = dem                       # RPC_DEM terrain source
        self.threshold = float(pixel_error_threshold)
        # gdal_rpc.cpp:1189: default 10 iterations, 20 with a DEM
        self.max_iter = int(max_iterations) if max_iterations \
            else (20 if dem is not None else 10)
        # linear pixel/line → lat/long approximation built exactly like
        # the reference (gdal_rpc.cpp GDALCreateRPCTransformerV2):
        # finite differences of the native model at the offset-center
        # reference point with a 0.0001-degree delta, then inverted.
        # The reference evaluates at dfRefZ = GetHeightAtLongLat of the
        # reference point (gdal_rpc.cpp:1054-1074) — RPC_HEIGHT plus
        # the scaled DEM sample when a DEM is attached.
        ref_lon, ref_lat = self.long_off, self.lat_off
        refz = self._height_at(ref_lon, ref_lat)
        self._ref_z = self.height if refz is None else refz
        ref_px, ref_ln = self._forward(ref_lon, ref_lat, self._ref_z)
        d = 1e-4
        px_dl, ln_dl = self._forward(ref_lon + d, ref_lat, self._ref_z)
        px_dp, ln_dp = self._forward(ref_lon, ref_lat + d, self._ref_z)
        gt_from_ll = (
            float(ref_px - (px_dl - ref_px) / d * ref_lon
                  - (px_dp - ref_px) / d * ref_lat),
            float((px_dl - ref_px) / d), float((px_dp - ref_px) / d),
            float(ref_ln - (ln_dl - ref_ln) / d * ref_lon
                  - (ln_dp - ref_ln) / d * ref_lat),
            float((ln_dl - ref_ln) / d), float((ln_dp - ref_ln) / d))
        self._pl_to_ll = affine.invert_gt(gt_from_ll)

    def _height_at(self, lon, lat):
        """GetHeightAtLongLat: RPC_HEIGHT + scaled DEM sample → total
        height, or None on a hard DEM miss."""
        if self.dem is None:
            return self.height
        ok, demh, _, _ = self.dem.height(float(lon), float(lat))
        if not ok:
            return None
        return self.height + demh * self.height_scale

    def _forward(self, lon, lat, h):
        """Native RPC model at an explicit height: (long, lat, h) →
        (pixel, line)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        hh = np.broadcast_to(np.asarray(h, dtype=np.float64),
                             lon.shape) if lon.shape else \
            np.asarray(h, dtype=np.float64)
        L = (lon - self.long_off) / self.long_scale
        P = (lat - self.lat_off) / self.lat_scale
        H = (hh - self.height_off) / self.hscale_norm
        T = _rpc_terms(L, P, H)
        line = (T @ self.line_num) / (T @ self.line_den)
        samp = (T @ self.samp_num) / (T @ self.samp_den)
        # RPCs use center-of-upper-left-pixel = (0,0); GDAL raster
        # space uses top-left corner = (0,0) → +0.5 (gdal_rpc.cpp:461)
        return (samp * self.samp_scale + self.samp_off + 0.5,
                line * self.line_scale + self.line_off + 0.5)

    def geo_to_pixel(self, lon, lat, h=None):
        """(long, lat[, height]) → (pixel, line).  With a DEM attached
        the per-point height is ``h + RPC_HEIGHT + dem*scale`` (the
        reference's padfZ + GetHeightAtLongLat); DEM misses yield NaN.
        Without a DEM, ``h`` (when given) is the absolute height,
        else RPC_HEIGHT."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        if self.dem is None:
            hh = self.height if h is None else h
            return self._forward(lon, lat, hh)
        flat_lon = np.atleast_1d(lon).ravel()
        flat_lat = np.atleast_1d(lat).ravel()
        user = np.zeros_like(flat_lon) if h is None else \
            np.broadcast_to(np.asarray(h, dtype=np.float64),
                            flat_lon.shape).ravel()
        heights = np.empty_like(flat_lon)
        for i in range(len(flat_lon)):
            ht = self._height_at(flat_lon[i], flat_lat[i])
            heights[i] = np.nan if ht is None else user[i] + ht
        px, ln = self._forward(flat_lon, flat_lat, heights)
        return px.reshape(lon.shape), ln.reshape(lat.shape)

    def transform(self, px, ln):
        """(pixel, line) → (long, lat): the reference's fixed-point
        iteration (RPCInverseTransformPoint) — initial guess AND
        per-step correction both use the precomputed linear
        approximation, stopping when the back-projected pixel error
        drops below the threshold (default 10 iterations, no-DEM
        path).  Matching the scheme exactly reproduces the published
        transformer.py point values, early-stop and all."""
        px = np.asarray(px, dtype=np.float64)
        ln = np.asarray(ln, dtype=np.float64)
        g = self._pl_to_ll
        if self.dem is not None:
            flat_px = np.atleast_1d(px).ravel()
            flat_ln = np.atleast_1d(ln).ravel()
            lon = np.empty_like(flat_px)
            lat = np.empty_like(flat_px)
            for i in range(len(flat_px)):
                lon[i], lat[i] = self._inverse_dem_point(
                    flat_px[i], flat_ln[i])
            return lon.reshape(px.shape), lat.reshape(ln.shape)
        lon = g[0] + g[1] * px + g[2] * ln
        lat = g[3] + g[4] * px + g[5] * ln
        for _ in range(self.max_iter):
            bpx, bln = self.geo_to_pixel(lon, lat)
            dx = bpx - px
            dy = bln - ln
            if max(np.abs(dx).max(initial=0),
                   np.abs(dy).max(initial=0)) < self.threshold:
                break
            lon = lon - dx * g[1] - dy * g[2]
            lat = lat - dx * g[4] - dy * g[5]
        return lon, lat

    def _inverse_dem_point(self, px, ln, user_h=0.0):
        """Reference RPCInverseTransformPoint with a DEM
        (``alg/gdal_rpc.cpp:1128-1372``): re-sample the terrain at each
        guess, snap to the DEM boundary (or fall back to the reference
        Z) on a first-iteration miss, hard-fail on later misses,
        dampen sign-flip oscillation with an error-weighted mean, and
        boost the step 10x after 5 consecutive sub-2-pixel errors.
        Returns (long, lat) or (nan, nan)."""
        g = self._pl_to_ll
        rx = g[0] + g[1] * px + g[2] * ln
        ry = g[3] + g[4] * px + g[5] * ln
        last_rx = last_ry = last_dx = last_dy = 0.0
        last_valid = False
        below2 = 0
        converged = False
        for it in range(self.max_iter):
            ok, demh, dem_px, dem_ln = self.dem.height(rx, ry)
            if ok:
                height = self.height + demh * self.height_scale
            elif it == 0:
                # first guess may be outside the DEM: snap to its
                # boundary; the reference's line-<0 branch re-clamps
                # the pixel (gdal_rpc.cpp:1222-1230, kept verbatim)
                h_, w_ = self.dem.band.shape
                if dem_px >= w_:
                    dem_px = w_ - 0.5
                elif dem_px < 0:
                    dem_px = 0.5
                if dem_ln >= h_:
                    dem_ln = h_ - 0.5
                elif dem_px < 0:
                    dem_px = 0.5
                raw = self.dem.raw_height(dem_px, dem_ln)
                height = raw if raw is not None else self._ref_z
            else:
                return np.nan, np.nan
            bpx, bln = self._forward(rx, ry, user_h + height)
            dx = float(bpx - px)
            dy = float(bln - ln)
            err = max(abs(dx), abs(dy))
            if err < self.threshold:
                converged = True
                break
            if last_valid and dx * last_dx < 0 and dy * last_dy < 0:
                # oscillation: error-weighted mean of the two guesses
                rx = (abs(dx) * last_rx + abs(last_dx) * rx) / \
                    (abs(dx) + abs(last_dx))
                ry = (abs(dy) * last_ry + abs(last_dy) * ry) / \
                    (abs(dy) + abs(last_dy))
                last_valid = False
                below2 = 0
                continue
            boost = 10.0 if (below2 >= 5 and err < 2) else 1.0
            below2 = below2 + 1 if err < 2 else 0
            last_rx, last_ry = rx, ry
            rx = rx - (dx * g[1] + dy * g[2]) * boost
            ry = ry - (dx * g[4] + dy * g[5]) * boost
            last_dx, last_dy = dx, dy
            last_valid = True
        if not converged:
            return np.nan, np.nan
        return rx, ry

    def inverse(self, lon, lat):
        return self.geo_to_pixel(lon, lat)


class GCPHomographyTransformer:
    """Projective (homography) GCP transformer — the reference's
    GCP_HOMOGRAPHY method (``alg/gdal_homography.cpp``): 8-parameter
    DLT least-squares fit with coordinate normalization; the inverse
    is the matrix inverse of the forward homography."""

    src = "pixel"
    dst = "geo"

    def __init__(self, gcps):
        g = np.asarray(gcps, dtype=np.float64)
        if len(g) < 4:
            raise ValueError("homography needs >= 4 GCPs")
        self._H = self._fit(g[:, 0], g[:, 1], g[:, 2], g[:, 3])
        try:
            self._Hinv = np.linalg.inv(self._H)
        except np.linalg.LinAlgError as e:
            raise ValueError("degenerate homography") from e

    @staticmethod
    def _norm(x, y):
        mx, my = x.mean(), y.mean()
        s = np.sqrt(2) / max(np.hypot(x - mx, y - my).mean(), 1e-300)
        T = np.array([[s, 0, -s * mx], [0, s, -s * my], [0, 0, 1.0]])
        return T

    @classmethod
    def _fit(cls, px, ln, gx, gy):
        # normalized DLT (Hartley): condition both spaces first
        T1 = cls._norm(px, ln)
        T2 = cls._norm(gx, gy)
        p = T1 @ np.stack([px, ln, np.ones_like(px)])
        q = T2 @ np.stack([gx, gy, np.ones_like(gx)])
        n = len(px)
        A = np.zeros((2 * n, 9))
        A[0::2, 0:3] = p.T
        A[0::2, 6:9] = -q[0][:, None] * p.T
        A[1::2, 3:6] = p.T
        A[1::2, 6:9] = -q[1][:, None] * p.T
        _u, _s, vt = np.linalg.svd(A)
        Hn = vt[-1].reshape(3, 3)
        H = np.linalg.inv(T2) @ Hn @ T1
        return H / H[2, 2]

    @staticmethod
    def _apply(H, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
        return ((H[0, 0] * x + H[0, 1] * y + H[0, 2]) / w,
                (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / w)

    def transform(self, x, y):
        return self._apply(self._H, x, y)

    def inverse(self, x, y):
        return self._apply(self._Hinv, x, y)


class GeolocArrayTransformer:
    """Geolocation-array transformer (``alg/gdalgeoloc.cpp``
    GEOLOC_ARRAY method): per-pixel longitude/latitude arrays map the
    raster to geography.

    Forward (pixel, line) → (geox, geoy): geoloc index = (coord −
    OFFSET) / STEP (TOP_LEFT_CORNER convention, the reference
    default), bilinear between the four surrounding samples with
    closest-cell extension beyond the edges — the reference's
    PixelLineToXY.  Inverse: coarse nearest-cell seed over the arrays
    followed by Newton iteration on the local bilinear patch (the
    reference uses a precomputed backmap; same fixed point).

    Validated against the published ``autotest/gcore/transformer.py``
    test_transformer_4 point on the reference's sstgeo fixture."""

    src = "pixel"
    dst = "geo"

    def __init__(self, geo_x, geo_y, pixel_offset=0.0, pixel_step=1.0,
                 line_offset=0.0, line_step=1.0):
        self.gx = np.asarray(geo_x, dtype=np.float64)
        self.gy = np.asarray(geo_y, dtype=np.float64)
        if self.gx.shape != self.gy.shape or self.gx.ndim != 2:
            raise ValueError("geolocation arrays must be same-shape 2D")
        self.pixel_offset = float(pixel_offset)
        self.pixel_step = float(pixel_step)
        self.line_offset = float(line_offset)
        self.line_step = float(line_step)

    def _sample(self, fx, fy):
        """Bilinear sample of both arrays at fractional geoloc index
        (fx, fy), clamped with edge extension."""
        h, w = self.gx.shape
        fx = np.clip(np.asarray(fx, dtype=np.float64), 0, w - 1)
        fy = np.clip(np.asarray(fy, dtype=np.float64), 0, h - 1)
        ix = np.minimum(fx.astype(np.int64), w - 2) \
            if w > 1 else np.zeros_like(fx, dtype=np.int64)
        iy = np.minimum(fy.astype(np.int64), h - 2) \
            if h > 1 else np.zeros_like(fy, dtype=np.int64)
        tx = fx - ix
        ty = fy - iy
        def bil(a):
            return ((1 - ty) * ((1 - tx) * a[iy, ix]
                                + tx * a[iy, ix + 1])
                    + ty * ((1 - tx) * a[iy + 1, ix]
                            + tx * a[iy + 1, ix + 1]))
        return bil(self.gx), bil(self.gy)

    def transform(self, px, ln):
        fx = (np.asarray(px, dtype=np.float64)
              - self.pixel_offset) / self.pixel_step
        fy = (np.asarray(ln, dtype=np.float64)
              - self.line_offset) / self.line_step
        return self._sample(fx, fy)

    def inverse(self, gx, gy):
        gx = np.asarray(gx, dtype=np.float64)
        gy = np.asarray(gy, dtype=np.float64)
        shape = gx.shape
        qx = gx.ravel()
        qy = gy.ravel()
        h, w = self.gx.shape
        # coarse seed: nearest geoloc sample, chunked so memory stays
        # O(chunk × grid) instead of O(n_queries × grid) — warp-sized
        # query batches over large geolocation arrays must not build
        # the full distance matrix
        gxf = self.gx.ravel()
        gyf = self.gy.ravel()
        seed = np.empty(len(qx), dtype=np.int64)
        # ~4e6-element budget keeps per-chunk temporaries ~tens of MB
        # even with many concurrent warp actors
        step = max(1, int(4e6) // max(gxf.size, 1))
        for lo in range(0, len(qx), step):
            hi = min(lo + step, len(qx))
            d2 = ((gxf[None, :] - qx[lo:hi, None]) ** 2
                  + (gyf[None, :] - qy[lo:hi, None]) ** 2)
            seed[lo:hi] = np.argmin(d2, axis=1)
        fy = (seed // w).astype(np.float64)
        fx = (seed % w).astype(np.float64)
        eps = 1e-6
        for _ in range(25):
            sx, sy = self._sample(fx, fy)
            ex = qx - sx
            ey = qy - sy
            if max(np.abs(ex).max(initial=0),
                   np.abs(ey).max(initial=0)) < 1e-12:
                break
            # finite differences step INWARD at the grid edge (an
            # outward step would clamp to the same sample and produce
            # a singular zero Jacobian)
            fxd = np.where(fx + eps > w - 1, fx - eps, fx + eps)
            fyd = np.where(fy + eps > h - 1, fy - eps, fy + eps)
            sxp, syp = self._sample(fxd, fy)
            sxl, syl = self._sample(fx, fyd)
            j00 = (sxp - sx) / (fxd - fx)
            j10 = (syp - sy) / (fxd - fx)
            j01 = (sxl - sx) / (fyd - fy)
            j11 = (syl - sy) / (fyd - fy)
            det = j00 * j11 - j01 * j10
            bad = ~np.isfinite(det) | (np.abs(det) < 1e-300)
            det = np.where(bad, 1.0, det)
            ux = np.where(bad, 0.0, (ex * j11 - ey * j01) / det)
            uy = np.where(bad, 0.0, (ey * j00 - ex * j10) / det)
            fx = np.clip(fx + ux, 0, w - 1)
            fy = np.clip(fy + uy, 0, h - 1)
        px = fx * self.pixel_step + self.pixel_offset
        ln = fy * self.line_step + self.line_offset
        return px.reshape(shape), ln.reshape(shape)
