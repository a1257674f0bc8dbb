"""Viewshed generation (Wang-Robinson-White line-sweep).

Semantics follow the reference implementation
``alg/viewshed/viewshed_executor.cpp`` / ``viewshed.cpp`` exactly:

* the observer's row is processed first, then rows sweep outward above
  and below, each keeping the previous row's *observable heights*;
* per cell the minimum observable height ``Z`` interpolates from the
  already-processed neighbors along the ray back to the observer —
  axis cells use ``CalcHeightLine`` (``Za·n/(n−1)``), diagonal cells the
  diagonal rule, everything else the selected cell mode (default Edge:
  ``CalcHeightEdge``, plus Diagonal/Min/Max variants);
* ``setOutput`` marks a cell visible when ``height + target_height ≥ Z``
  and raises the stored observable height to ``max(height, Z)``;
* output modes: ``normal`` (visible/invisible values), ``dem`` (minimum
  visible elevation, clamped ≥ 0 against the input DEM), ``ground``
  (minimum height above ground to be visible);
* ``min_distance``/``max_distance`` ring masking with the reference's
  output-extent shrink (EPSILON 1e-8, the ±1 y adjustment for the
  inverse-transform sign) and per-line limits.  Reference quirk kept
  for parity: when one side of a row is ENTIRELY out of range, the
  executor's early return (``processLineLeft``
  ``if (iStart <= iEnd) return;``) skips ``maskLineLeft``, so those
  cells keep the zero result-buffer fill rather than
  ``out_of_range_val`` — identical to GDAL, observable only when
  ``out_of_range_val`` differs from 0;
* ``low_pitch`` raises the observable height to the pitch line,
  ``high_pitch`` marks cells above the pitch cone out-of-range;
* earth-curvature adjustment ``height −= curve_coeff/(2·semimajor)·R²``.

Validated against the reference's own published expected grids
(``autotest/cpp/test_viewshed.cpp``): min/max-distance mask, high/low
pitch masks, all-visible, simple-height observable values, and the
dem-vs-ground cases of GDAL issue #9501 (tests/test_viewshed.py).

Distribution shape: one viewshed is an inherently sequential sweep per
observer (each row depends on the previous), but the BATCH of observers
is embarrassingly parallel — :func:`viewshed_batch` runs inside
``map_batches`` over an observer table with the DEM broadcast once per
actor (``ray.put`` in the driver, resolved in ``__init__``).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["viewshed", "viewshed_batch", "ViewshedActor"]

_EPS = 1e-8


def _calc_height_line(n, za):
    n = abs(n)
    return za * n / (n - 1)


def _calc_height_diagonal(i, j, za, zb):
    return (za * i + zb * j) / (i + j - 1)


def _calc_height_edge(i, j, za, zb):
    return (za * i + zb * (j - i)) / (j - 1)


def _zcalc_edge(nx, ny, this_prev, last, last_prev):
    if nx >= ny:
        return _calc_height_edge(ny, nx, last_prev, this_prev)
    return _calc_height_edge(nx, ny, last_prev, last)


def _zcalc_diagonal(nx, ny, this_prev, last, last_prev):
    return _calc_height_diagonal(nx, ny, this_prev, last)


def _zcalc_min(nx, ny, this_prev, last, last_prev):
    return min(_zcalc_edge(nx, ny, this_prev, last, last_prev),
               _zcalc_diagonal(nx, ny, this_prev, last, last_prev))


def _zcalc_max(nx, ny, this_prev, last, last_prev):
    return max(_zcalc_edge(nx, ny, this_prev, last, last_prev),
               _zcalc_diagonal(nx, ny, this_prev, last, last_prev))


_ZCALC = {"edge": _zcalc_edge, "diagonal": _zcalc_diagonal,
          "min": _zcalc_min, "max": _zcalc_max}


class _State:
    pass


# --- angle masking (viewshed.cpp normalizeAngle / util.cpp intersects) ---

def _normalize_angle(deg):
    a = 90.0 - deg
    if a < 0:
        a += 360.0
    return math.radians(a)


def _real_eq(a, b):
    return abs(a - b) <= 1e-10 * max(1.0, abs(a), abs(b))


def _horizontal_intersect(angle, nx, ny, y):
    if ny == y:
        return float(nx)
    if ny > y:
        if _real_eq(angle, math.pi / 2):
            return float(nx)
        if 0 < angle < math.pi:
            return nx + (ny - y) / math.tan(angle)
    else:
        if _real_eq(angle, 3 * math.pi / 2):
            return float(nx)
        if angle > math.pi:
            return nx - (y - ny) / math.tan(angle)
    return math.nan


def _h_isect(angle, nx, ny, y):
    x = _horizontal_intersect(angle, nx, ny, y)
    return None if math.isnan(x) else int(round(x))


def _h_isect_win(angle, nx, ny, ys, ye, xs, xe):
    if _real_eq(angle, math.pi):
        return xs
    if _real_eq(angle, 0.0):
        return xe
    x = _horizontal_intersect(angle, nx, ny, ys)
    if math.isnan(x):
        x = _horizontal_intersect(angle, nx, ny, ye)
    return min(max(int(round(x)), xs), xe)


def _vertical_intersect(angle, nx, ny, x):
    if nx == x:
        return float(ny)
    if nx < x:
        if _real_eq(angle, 0.0):
            return float(ny)
        if angle < math.pi / 2 or angle > 3 * math.pi / 2:
            return ny + (nx - x) * math.tan(angle)
    else:
        if _real_eq(angle, math.pi):
            return float(ny)
        if math.pi / 2 < angle < 3 * math.pi / 2:
            return ny - (x - nx) * math.tan(angle)
    return math.nan


def _v_isect_win(angle, nx, ny, xs, xe, ys, ye):
    if _real_eq(angle, math.pi / 2):
        return ys
    if _real_eq(angle, 3 * math.pi / 2):
        return ye
    y = _vertical_intersect(angle, nx, ny, xs)
    if math.isnan(y):
        y = _vertical_intersect(angle, nx, ny, xe)
    return min(max(int(round(y)), ys), ye)


def _ray_between(start, end, test):
    start, end = end, start   # angles run counterclockwise
    if start < end:
        return start <= test <= end
    if start > end:
        return test >= start or test <= end
    return False


def _shrink_window_for_angles(xs, xe, ys, ye, nx, ny, start, end):
    """viewshed.cpp shrinkWindowForAngles."""
    sax = _h_isect_win(start, nx, ny, ys, ye, xs, xe)
    eax = _h_isect_win(end, nx, ny, ys, ye, xs, xe)
    if not _ray_between(start, end, 0.0):
        xe = min(xe, max(nx, sax, eax) + 1)
    if not _ray_between(start, end, math.pi):
        xs = max(xs, min(nx, sax, eax))
    say = _v_isect_win(start, nx, ny, xs, xe, ys, ye)
    eay = _v_isect_win(end, nx, ny, xs, xe, ys, ye)
    if not _ray_between(start, end, math.pi / 2):
        ys = max(ys, min(ny, say, eay))
    if not _ray_between(start, end, 3 * math.pi / 2):
        ye = min(ye, max(ny, say, eay) + 1)
    return xs, xe, ys, ye


def viewshed(dem, observer_x, observer_y, observer_height=0.0, *,
             gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0), target_height=0.0,
             visible_val=255.0, invisible_val=0.0, out_of_range_val=0.0,
             min_distance=0.0, max_distance=0.0, curve_coeff=0.0,
             semi_major=None, cell_mode="edge", low_pitch=-90.0,
             high_pitch=90.0, mode="normal", start_angle=0.0,
             end_angle=0.0):
    """Compute a viewshed; observer given in PIXEL coordinates.

    Returns ``(out, (x_start, y_start))`` — the output array and its
    window origin within the input raster (max_distance shrinks the
    window exactly like the reference's ``calcExtents``).
    """
    dem = np.asarray(dem, dtype=np.float64)
    H, W = dem.shape
    nX0, nY = int(observer_x), int(observer_y)
    s = _State()
    s.mode = mode
    s.visible = float(visible_val)
    s.invisible = float(invisible_val)
    s.oor = float(out_of_range_val)
    s.target = float(target_height)
    s.min2 = float(min_distance) ** 2
    s.max2 = float(max_distance) ** 2
    if s.max2 == 0:
        s.max2 = np.inf
    s.gt = gt
    s.low_tan = math.tan(math.radians(low_pitch)) \
        if low_pitch != -90.0 else None
    s.high_tan = math.tan(math.radians(high_pitch)) \
        if high_pitch != 90.0 else None
    s.adj = (curve_coeff / (2.0 * semi_major)) if semi_major else 0.0
    s.zcalc = _ZCALC[cell_mode]
    s.obs_z = float(observer_height)

    # output extent (viewshed.cpp calcExtents)
    x_start, x_stop, y_start, y_stop = 0, W, 0, H
    if max_distance > 0:
        inv1 = 1.0 / gt[1]
        inv5 = 1.0 / gt[5]
        xs = int(math.floor(nX0 - inv1 * max_distance + _EPS))
        xe = int(math.ceil(nX0 + inv1 * max_distance - _EPS)) + 1
        ys = int(math.floor(nY - abs(inv5) * max_distance + _EPS)) \
            - (1 if inv5 > 0 else 0)
        ye = int(math.ceil(nY + abs(inv5) * max_distance - _EPS)) \
            + (1 if inv5 < 0 else 0)
        if xs >= x_stop or xe < 0 or ys >= y_stop or ye < 0:
            raise ValueError("empty viewshed window")
        x_start, x_stop = max(xs, 0), min(xe, x_stop)
        y_start, y_stop = max(ys, 0), min(ye, y_stop)

    s.ang = None
    if start_angle != end_angle:
        if not (0 <= nX0 < W and 0 <= nY < H):
            raise ValueError("angle masking requires in-raster observer")
        sa = _normalize_angle(start_angle)
        ea = _normalize_angle(end_angle)
        x_start, x_stop, y_start, y_stop = _shrink_window_for_angles(
            x_start, x_stop, y_start, y_stop, nX0, nY, sa, ea)
        s.ang = (sa, ea)

    s.xsize = x_stop - x_start
    s.nX = nX0 - x_start   # normalized to the window
    s.nY = nY
    s.y_start, s.y_stop = y_start, y_stop
    s.dem = dem
    s.x_start = x_start
    if s.ang:
        # quadrant test angles (viewshed_executor calcTestAngles)
        t = {1: math.atan2(s.nY + 1, (s.xsize - s.nX) / 2.0),
             2: math.atan2(s.nY + 1, -(s.nX + 1) / 2.0),
             3: math.atan2(-(s.y_stop - s.nY), -(s.nX + 1) / 2.0),
             4: math.atan2(-(s.y_stop - s.nY), (s.xsize - s.nX) / 2.0)}
        s.test_angle = {k: (v + 2 * math.pi if v < 0 else v)
                        for k, v in t.items()}
    out = np.zeros((y_stop - y_start, s.xsize), dtype=np.float64)

    first = min(max(nY, y_start), y_stop - 1)
    last_line = _first_line(s, out, first)
    ll_up = last_line.copy()
    for line in range(first - 1, y_start - 1, -1):
        ll_up = _process_line(s, out, line, ll_up)
    ll_dn = last_line
    for line in range(first + 1, y_stop):
        ll_dn = _process_line(s, out, line, ll_dn)
    return out, (x_start, y_start)


def _contains_x(s, x):
    return 0 <= x < s.xsize


def _clamp_x(s, x):
    return min(max(x, 0), s.xsize - 1)


def _mask_low(s, z, nx, ny):
    if s.low_tan is None:
        return z
    dx = s.gt[1] * nx + s.gt[2] * ny
    dy = s.gt[4] * nx + s.gt[5] * ny
    return max(z, math.hypot(dx, dy) * s.low_tan)


def _mask_high(s, res, z, nx, ny, out, row, col):
    if s.high_tan is None:
        return
    dx = s.gt[1] * nx + s.gt[2] * ny
    dy = s.gt[4] * nx + s.gt[5] * ny
    if math.hypot(dx, dy) * s.high_tan < z:
        out[row, col] = s.oor


def _set_output(s, out, row, col, this, i, z):
    """viewshed_executor setOutput: write result, raise observable."""
    if s.mode != "normal":
        out[row, col] += (z - this[i])
        out[row, col] = max(0.0, out[row, col])
    else:
        out[row, col] = s.invisible if this[i] + s.target < z \
            else s.visible
    this[i] = max(this[i], z)


def _adjust_height(s, ny_off, this):
    """adjustHeight: subtract observer Z (+ curvature), return line
    limits (left, left_min, right_min, right)."""
    left, right = 0, s.xsize
    left_min = right_min = s.nX + 1
    nx_start = _clamp_x(s, s.nX)
    if s.adj or s.min2 > 0 or np.isfinite(s.max2):
        line_x = s.gt[2] * ny_off
        line_y = s.gt[5] * ny_off
        for nx_off in range(nx_start - s.nX, -s.nX - 1, -1):
            dx = s.gt[1] * nx_off + line_x
            dy = s.gt[4] * nx_off + line_y
            r2 = dx * dx + dy * dy
            if r2 < s.min2:
                left_min -= 1
            elif r2 > s.max2:
                left = nx_off + s.nX + 1
                break
            this[nx_off + s.nX] -= s.adj * r2 + s.zobs
        for nx_off in range(nx_start - s.nX + 1, s.xsize - s.nX):
            dx = s.gt[1] * nx_off + line_x
            dy = s.gt[4] * nx_off + line_y
            r2 = dx * dx + dy * dy
            if r2 < s.min2:
                right_min += 1
            elif r2 > s.max2:
                right = nx_off + s.nX
                break
            this[nx_off + s.nX] -= s.adj * r2 + s.zobs
        return [left, left_min, right_min, right]
    this -= s.zobs
    return [left, left_min, right_min, right]


def _mask_angle_left(s, out, row, n_line):
    """maskAngleLeft: returns True when the whole left half is masked."""
    if not s.ang:
        return False
    sa, ea = s.ang

    def clamp(x):
        return None if (x is None or x < 0 or x >= s.nX) else x

    if n_line != s.nY:
        sax = clamp(_h_isect(sa, s.nX, s.nY, n_line))
        eax = clamp(_h_isect(ea, s.nX, s.nY, n_line))
        if sax is None and eax is None:
            test = s.test_angle[2] if n_line < s.nY else s.test_angle[3]
            if not _ray_between(sa, ea, test):
                out[row, :s.nX] = s.oor
                return True
            return False
        if n_line > s.nY:
            sax, eax = eax, sax
        if sax is None:
            sax = 0
        if eax is None:
            eax = s.nX - 1
        if sax <= eax:
            out[row, :sax] = s.oor
            out[row, eax + 1:s.nX] = s.oor
        else:
            out[row, eax + 1:sax] = s.oor
    elif not _ray_between(sa, ea, math.pi):
        out[row, :s.nX] = s.oor
        return True
    return False


def _mask_angle_right(s, out, row, n_line):
    if not s.ang:
        return False
    sa, ea = s.ang
    n = s.xsize

    def clamp(x):
        return None if (x is None or x <= s.nX or x >= n) else x

    if n_line != s.nY:
        sax = clamp(_h_isect(sa, s.nX, s.nY, n_line))
        eax = clamp(_h_isect(ea, s.nX, s.nY, n_line))
        if sax is None and eax is None:
            test = s.test_angle[1] if n_line < s.nY else s.test_angle[4]
            if not _ray_between(sa, ea, test):
                out[row, s.nX + 1:] = s.oor
                return True
            return False
        if n_line > s.nY:
            sax, eax = eax, sax
        if eax is None:
            eax = n - 1
        if sax is None:
            sax = s.nX + 1
        if sax <= eax:
            out[row, s.nX + 1:sax] = s.oor
            out[row, eax + 1:] = s.oor
        else:
            out[row, eax + 1:sax] = s.oor
    elif not _ray_between(sa, ea, 0.0):
        out[row, s.nX + 1:] = s.oor
        return True
    return False


def _mask_line_left(s, out, row, ll, n_line):
    if _mask_angle_left(s, out, row, n_line):
        return
    out[row, :ll[0]] = s.oor
    if ll[1] < s.nX:
        out[row, ll[1]:s.nX] = s.oor


def _mask_line_right(s, out, row, ll, n_line):
    if _mask_angle_right(s, out, row, n_line):
        return
    out[row, s.nX + 1:ll[2]] = s.oor
    if ll[3] + 1 < s.xsize:
        out[row, ll[3] + 1:] = s.oor


def _first_line(s, out, n_line):
    ny_off = n_line - s.nY
    row = n_line - s.y_start
    this = s.dem[n_line, s.x_start:s.x_start + s.xsize].copy()
    s.zobs = 0.0
    obs_in_x = _contains_x(s, s.nX)
    if obs_in_x:
        s.zobs = this[s.nX]
        if s.mode == "normal":
            out[row, s.nX] = s.visible
    s.zobs += s.obs_z
    if s.mode == "dem":
        out[row, :] = s.dem[n_line, s.x_start:s.x_start + s.xsize]
    ll = _adjust_height(s, ny_off, this)
    if obs_in_x and ll[1] != ll[2]:
        out[row, s.nX] = s.oor
    if not (s.y_start <= s.nY < s.y_stop):
        # observer above/below the raster: first line all visible in
        # range
        for i in range(ll[0], ll[3]):
            if s.mode == "normal":
                out[row, i] = s.visible
            else:
                _set_output(s, out, row, i, this, i, this[i])
        out[row, :ll[0]] = s.oor
        out[row, ll[3]:] = s.oor
        return this
    _first_line_left(s, out, row, ll, this)
    _first_line_right(s, out, row, ll, this)
    return this


def _first_line_left(s, out, row, ll, this):
    i_end = ll[0] - 1
    i_start = s.nX - 1
    if i_end >= i_start:
        return
    i_start = _clamp_x(s, i_start)
    if i_start + 1 == s.nX or i_start + 1 == s.xsize:
        z = this[i_start]
        if s.mode == "normal":
            out[row, i_start] = s.visible
        else:
            z = _mask_low(s, z, 1, 0)
            _set_output(s, out, row, i_start, this, i_start, z)
        _mask_high(s, None, z, 1, 0, out, row, i_start)
        i_start -= 1
    for i in range(i_start, i_end, -1):
        nx = abs(i - s.nX)
        z = _calc_height_line(nx, this[i + 1])
        z = _mask_low(s, z, nx, 0)
        _set_output(s, out, row, i, this, i, z)
        _mask_high(s, None, z, nx, 0, out, row, i)
    _mask_line_left(s, out, row, ll, s.nY)


def _first_line_right(s, out, row, ll, this):
    i_start = s.nX + 1
    i_end = ll[3]
    if i_start >= i_end:
        return
    i_start = _clamp_x(s, i_start)
    if i_start - 1 == s.nX or i_start == 0:
        z = this[i_start]
        if s.mode == "normal":
            out[row, i_start] = s.visible
        else:
            z = _mask_low(s, z, 1, 0)
            _set_output(s, out, row, i_start, this, i_start, z)
        _mask_high(s, None, z, 1, 0, out, row, i_start)
        i_start += 1
    for i in range(i_start, i_end):
        nx = abs(i - s.nX)
        z = _calc_height_line(nx, this[i - 1])
        z = _mask_low(s, z, nx, 0)
        _set_output(s, out, row, i, this, i, z)
        _mask_high(s, None, z, nx, 0, out, row, i)
    _mask_line_right(s, out, row, ll, s.nY)


def _process_line(s, out, n_line, last):
    ny_off = n_line - s.nY
    row = n_line - s.y_start
    this = s.dem[n_line, s.x_start:s.x_start + s.xsize].copy()
    if s.mode == "dem":
        out[row, :] = this
    ll = _adjust_height(s, ny_off, this)
    if _contains_x(s, s.nX):
        if ll[0] < ll[3] and ll[1] == ll[2]:
            if abs(ny_off) == 1:
                z = this[s.nX]
            else:
                z = _calc_height_line(ny_off, last[s.nX])
            z = _mask_low(s, z, 0, ny_off)
            _set_output(s, out, row, s.nX, this, s.nX, z)
            _mask_high(s, None, z, 0, ny_off, out, row, s.nX)
        else:
            out[row, s.nX] = s.oor
        if s.ang:   # maskInitial
            sa, ea = s.ang
            if n_line < s.nY and not _ray_between(sa, ea, math.pi / 2):
                out[row, s.nX] = s.oor
            elif n_line > s.nY and not _ray_between(sa, ea,
                                                    3 * math.pi / 2):
                out[row, s.nX] = s.oor
    _line_left(s, out, row, ny_off, ll, this, last)
    _line_right(s, out, row, ny_off, ll, this, last)
    return this


def _line_left(s, out, row, ny_off, ll, this, last):
    i_start = s.nX - 1
    i_end = ll[0] - 1
    if i_start <= i_end:
        return
    i_start = _clamp_x(s, i_start)
    ny = abs(ny_off)
    if i_start == s.xsize - 1:
        z = this[i_start]
        if s.mode == "normal":
            out[row, i_start] = s.visible
        else:
            z = _mask_low(s, z, s.nX - i_start, ny)
            _set_output(s, out, row, i_start, this, i_start, z)
        _mask_high(s, None, z, s.nX - i_start, ny, out, row, i_start)
        i_start -= 1
    for i in range(i_start, i_end, -1):
        nx = abs(i - s.nX)
        if nx == ny:
            z = this[i] if nx == 1 else _calc_height_line(nx, last[i + 1])
        else:
            z = s.zcalc(nx, ny, this[i + 1], last[i], last[i + 1])
        z = _mask_low(s, z, nx, ny)
        _set_output(s, out, row, i, this, i, z)
        _mask_high(s, None, z, nx, ny, out, row, i)
    _mask_line_left(s, out, row, ll, s.nY + ny_off)


def _line_right(s, out, row, ny_off, ll, this, last):
    i_start = s.nX + 1
    i_end = ll[3]
    if i_start >= i_end:
        return
    i_start = _clamp_x(s, i_start)
    ny = abs(ny_off)
    if i_start == 0:
        z = this[i_start]
        if s.mode == "normal":
            out[row, i_start] = s.visible
        else:
            z = _mask_low(s, z, s.nX, ny)
            _set_output(s, out, row, 0, this, 0, z)
        _mask_high(s, None, z, s.nX, ny, out, row, 0)
        i_start += 1
    for i in range(i_start, i_end):
        nx = abs(i - s.nX)
        if nx == ny:
            z = this[i] if nx == 1 else _calc_height_line(nx, last[i - 1])
        else:
            z = s.zcalc(nx, ny, this[i - 1], last[i], last[i - 1])
        z = _mask_low(s, z, nx, ny)
        _set_output(s, out, row, i, this, i, z)
        _mask_high(s, None, z, nx, ny, out, row, i)
    _mask_line_right(s, out, row, ll, s.nY + ny_off)


def viewshed_batch(batch, dem, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0), **kw):
    """Viewsheds for a BATCH of observers over one (broadcast) DEM —
    the map_batches shape: each row (observer_id, px, py, height) →
    (observer_id, n_visible, n_cells).  Observers are independent; the
    DEM ships once per actor."""
    import pyarrow as pa

    if kw.get("mode", "normal") != "normal":
        raise ValueError("viewshed_batch counts visible cells — "
                         "normal mode only")
    vis = float(kw.get("visible_val", 255.0))
    ids = batch["observer_id"].to_pylist()
    px = np.asarray(batch["px"], dtype=np.int64)
    py = np.asarray(batch["py"], dtype=np.int64)
    hz = np.asarray(batch["height"], dtype=np.float64)
    n_vis, n_cells = [], []
    for i in range(len(ids)):
        out, _ = viewshed(dem, int(px[i]), int(py[i]), float(hz[i]),
                          gt=gt, **kw)
        n_vis.append(int((out == vis).sum()))
        n_cells.append(out.size)
    return pa.Table.from_pydict({
        "observer_id": pa.array(ids, pa.int64()),
        "n_visible": pa.array(n_vis, pa.int64()),
        "n_cells": pa.array(n_cells, pa.int64())})


class ViewshedActor:
    """Actor-pool stage: broadcast DEM resolved once per actor."""

    def __init__(self, dem_ref, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0), **kw):
        import ray

        self.dem = ray.get(dem_ref)
        self.gt = gt
        self.kw = kw

    def __call__(self, batch):
        return viewshed_batch(batch, self.dem, gt=self.gt, **self.kw)
