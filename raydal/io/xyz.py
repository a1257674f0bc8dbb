"""XYZ ASCII-grid raster reader/writer — ``frmts/xyz/xyzdataset.cpp``
semantics for row-organized files.

Header line with column names reorders the axes (``x``/``lon*``/
``east*``, ``y``/``lat*``/``north*``, ``z``/``alt*``/``height``;
IdentifyEx at xyzdataset.cpp:826); separators are space/tab/comma/
semicolon, with the comma demoted to a DECIMAL separator when
semicolons also appear on the line (``23,5;33;45`` — Open at :1040);
X/Y spacings merge under the driver's 1e-3 relative tolerance with
missing samples recognized as step multiples (:1187+); the grid is
``1 + int((max-min)/step + 0.5)`` cells per axis with the step
re-derived from the extent; files listing Y ascending keep a south-up
(positive dy) geotransform, descending Y north-up, both with the
half-pixel shift.  Dtype promotes Byte→Int16→Int32→Float32 from the
values; sparse grids additionally promote (Byte→Int16, Int32→Float32,
:1495) and expose nodata 0 (all-positive Z) or -32768
(GetNoDataValue at :622).  Column-organized files are not supported
(the reference rejects sparse ones too).

Validated against the published autotest/gdrivers/xyz.py cases 3-7
and the byte.tif family checksum 4672 on write→read.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_xyz", "write_xyz"]

_REL = 1e-3


def _is_x(tok):
    t = tok.lower().strip('"')
    return t == "x" or t.startswith("lon") or t.startswith("east")


def _is_y(tok):
    t = tok.lower().strip('"')
    return t == "y" or t.startswith("lat") or t.startswith("north")


def _is_z(tok):
    t = tok.lower().strip('"')
    return t == "z" or t.startswith("alt") or t == "height"


def _tokenize(line, decimal_sep):
    seps = " \t;" + ("" if decimal_sep == "," else ",")
    out, cur = [], []
    for ch in line:
        if ch in seps:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _merge_step(steps, dx):
    """Merge a new positive X step into the step list with the
    reference's 1e-3 relative tolerance / multiple handling."""
    for i, s in enumerate(steps):
        if abs((dx - s) / dx) < _REL:
            return steps                         # same step
        if dx < s and abs(s - round(s / dx) * dx) / dx < _REL:
            # existing step is a multiple of the new finer one
            return steps[:i] + steps[i + 1:] + [dx]
        if dx > s and abs(dx - round(dx / s) * s) / dx < _REL:
            return steps                         # gap: multiple of base
    return steps + [dx]


def read_xyz(src):
    """XYZ text/path → (array north-ordered-as-stored, geotransform,
    nodata_or_None)."""
    if isinstance(src, (bytes, bytearray)):
        text = bytes(src).decode("ascii", "replace")
    elif isinstance(src, str) and ("\n" in src or not os.path.exists(src)):
        text = src
    else:
        with open(src) as f:
            text = f.read()
    lines = [ln for ln in text.splitlines()]
    # leading '/' comment lines
    i0 = 0
    while i0 < len(lines) and lines[i0].startswith("/"):
        i0 += 1
    lines = [ln for ln in lines[i0:] if ln.strip()]
    if not lines:
        raise ValueError("empty XYZ file")

    xi, yi, zi = 0, 1, 2
    first = lines[0]
    # header iff any letter other than the exponent e/E (IdentifyEx
    # checks numeric chars before the alpha branch)
    if any((c.isalpha() and c not in "eE") or c == '"' for c in first):
        toks = _tokenize(first, ".")
        fx = fy = fz = -1
        for i, t in enumerate(toks):
            if _is_x(t):
                fx = i
            elif _is_y(t):
                fy = i
            elif _is_z(t):
                fz = i
        if fx >= 0 and fy >= 0 and fz >= 0:
            xi, yi, zi = fx, fy, fz
        lines = lines[1:]

    # decimal-separator sniff, per line until determined (Open at :1040)
    dec = None
    xs, ys, zs = [], [], []
    for ln in lines:
        if dec is None:
            ncomma = ln.count(",")
            nother = ln.count(";") + ln.count("\t")
            if ncomma >= 2 and nother == 0:
                dec = "."
            elif ncomma > 0 and nother > 0:
                dec = ","
        d = dec or "."
        toks = _tokenize(ln, d)
        if len(toks) <= max(xi, yi, zi):
            raise ValueError(f"XYZ line has too few columns: {ln!r}")
        conv = (lambda s: float(s.replace(",", "."))) if d == "," \
            else float
        xs.append(conv(toks[xi]))
        ys.append(conv(toks[yi]))
        zs.append(conv(toks[zi]))
    x = np.asarray(xs)
    y = np.asarray(ys)
    z = np.asarray(zs)
    if len(x) >= 2 and x[1] == x[0]:
        raise ValueError("column-organized XYZ files are not supported")

    step_x, step_y = [], []
    ysign = 0
    for k in range(1, len(x)):
        dy = y[k] - y[k - 1]
        if dy == 0.0:
            dx = x[k] - x[k - 1]
            if dx <= 0:
                raise ValueError("ungridded XYZ: non-increasing X in row")
            step_x = _merge_step(step_x, dx)
            if len(step_x) > 1:
                # keep collecting; must collapse to one by the end
                pass
        else:
            s = -1 if dy < 0 else 1
            if ysign and s != ysign:
                raise ValueError("ungridded XYZ: change of Y direction")
            ysign = s
            ady = abs(dy)
            if not step_y:
                step_y.append(ady)
            elif abs((step_y[0] - ady) / ady) > _REL:
                if ady > step_y[0] and abs(
                        round(ady / step_y[0]) - ady / step_y[0]) <= _REL:
                    pass                          # missing line(s)
                else:
                    raise ValueError("ungridded XYZ: inconsistent Y step")
    if len(step_x) != 1:
        raise ValueError("could not determine X spacing")
    if len(step_y) != 1:
        step_y = step_y or [1.0]
    if ysign == 0:
        ysign = -1

    minx, maxx = x.min(), x.max()
    miny, maxy = y.min(), y.max()
    w = int(1 + ((maxx - minx) / step_x[0] + 0.5))
    h = int(1 + ((maxy - miny) / step_y[0] + 0.5))
    sx = (maxx - minx) / (w - 1) if w > 1 else step_x[0]
    sy = (maxy - miny) / (h - 1) if h > 1 else step_y[0]

    sparse = len(x) != w * h
    frac = (z != np.floor(z)).any() or abs(z).max(initial=0) > 2**31
    if frac:
        dt = np.float32
    else:
        zmin, zmax = (z.min(), z.max()) if len(z) else (0, 0)
        if 0 <= zmin and zmax <= 255:
            dt = np.uint8
        elif -32768 <= zmin and zmax <= 32767:
            dt = np.int16
        else:
            dt = np.int32
    nodata = None
    if sparse:
        if dt == np.uint8:
            dt = np.int16
        elif dt == np.int32:
            dt = np.float32
        zmin = z.min() if len(z) else 0
        if zmin > -32768:
            nodata = 0.0 if zmin > 0 else -32768.0

    arr = np.full((h, w), nodata or 0, dt)
    col = np.rint((x - minx) / sx).astype(np.int64)
    row = np.rint(((maxy - y) if ysign < 0 else (y - miny)) / sy) \
        .astype(np.int64)
    arr[row, col] = z.astype(dt)
    if ysign < 0:
        gt = (minx - sx / 2, sx, 0.0, maxy + sy / 2, 0.0, -sy)
    else:
        gt = (minx - sx / 2, sx, 0.0, miny - sy / 2, 0.0, sy)
    return arr, gt, nodata


def write_xyz(arr, geotransform, path=None, decimals=10):
    """2-D array + geotransform → XYZ text (cell-center coordinates,
    row-major in storage order, the CreateCopy layout)."""
    a = np.asarray(arr)
    h, w = a.shape
    x0, dx, _, y0, _, dy = geotransform
    lines = []
    xc = x0 + (np.arange(w) + 0.5) * dx
    for r in range(h):
        yc = y0 + (r + 0.5) * dy
        for c in range(w):
            v = a[r, c]
            vs = f"{v:.{decimals}g}" if np.issubdtype(a.dtype,
                                                      np.floating) \
                else str(int(v))
            lines.append(f"{xc[c]:.{decimals}f} {yc:.{decimals}f} {vs}")
    text = "\n".join(lines) + "\n"
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
