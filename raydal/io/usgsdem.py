"""USGS ASCII DEM reader, from scratch on the published A/B-record
layout.

Reference semantics (``frmts/usgsdem/usgsdemdataset.cpp``):

* data-start detection (LoadFromFile, :583-635): record at 1024 with
  row=1/col∈{0,1} → new format (1025 when the records carry a
  leading newline), else undocumented 893 / 918 variants, else the
  864 old format;
* header fields at fixed offsets — coord system + UTM zone @156,
  ground/vertical units @528, corners (4 × two D24 fortran doubles)
  @546, dx/dy/vres (D12) @816, profile count @858;
* geotransform: UTM/state-plane/unknown snap the y extents to the
  dy grid and take x from the first profile's dxStart (:788-812);
  geographic divides arcsec by 3600 (:816-830);
* profiles (IReadBlock, :363-512): whitespace-separated ints for
  row/col/npoints/ncols, EXACTLY-24-char fortran doubles for
  dxStart/dyStart/elevOffset + two junk, ``lygap`` bottom-anchored
  placement, value = nElev*vres + elevOffset (float32), Int16 bands
  unless vertical unit is feet or vres < 1; nodata −32767; new-format
  profiles pad to 1024-byte record boundaries (:500-511).

Published parity (``autotest/gdrivers/usgsdem.py``):
022gdeme_truncated = 1583, 39079G6_truncated.dem = 61424,
39109h1_truncated.dem = 39443 (the 893-offset variant).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_usgsdem"]

NODATA = -32767


class _Cur:
    """Exact-offset cursor mirroring the reference Buffer."""

    def __init__(self, buf):
        self.buf = buf
        self.i = 0

    def read_int(self):
        b = self.buf
        n = len(b)
        while self.i < n and b[self.i:self.i + 1].isspace():
            self.i += 1
        if self.i >= n:
            return None
        sign = 1
        c = b[self.i]
        val = 0
        if c == 0x2D:
            sign = -1
            self.i += 1
        elif c == 0x2B:
            self.i += 1
        elif 0x30 <= c <= 0x39:
            val = c - 0x30
            self.i += 1
        else:
            return None
        while self.i < n and 0x30 <= b[self.i] <= 0x39:
            val = val * 10 + (b[self.i] - 0x30)
            self.i += 1
        return sign * val

    def read_dbl(self, width):
        s = self.buf[self.i:self.i + width].replace(b"D", b"E")
        self.i += width
        try:
            return float(s)
        except ValueError:
            return float(s.split()[0]) if s.split() else 0.0


def _dconv(buf, off, width):
    s = buf[off:off + width].replace(b"D", b"E")
    try:
        return float(s)
    except ValueError:
        parts = s.split()
        return float(parts[0]) if parts else 0.0


def read_usgsdem(src):
    """USGS DEM (path or bytes) → (array[1, h, w], geotransform,
    nodata)."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()

    cur = _Cur(buf)
    cur.i = 864
    row = cur.read_int()
    col = cur.read_int()
    new_format = cur.i >= 1024 or row != 1 or col != 1
    if new_format:
        cur.i = 1024
        i1 = cur.read_int()
        j1 = cur.read_int()
        if i1 != 1 or (j1 not in (0, 1)):
            cur.i = 893
            i1, j1 = cur.read_int(), cur.read_int()
            if i1 == 1 and j1 == 1:
                start = 893
            else:
                cur.i = 918
                i1, j1 = cur.read_int(), cur.read_int()
                if i1 != 1 or j1 != 1:
                    raise ValueError("not a USGS DEM file")
                start = 918
        else:
            start = 1024
            if len(buf) > 2050 and buf[1024] == 0x0A and \
                    buf[1024 + 1024 + 1] == 0x0A:
                start = 1025
    else:
        start = 864

    cur.i = 156
    coordsys = cur.read_int()
    _utm_zone = cur.read_int()
    cur.i = 528
    _gunit = cur.read_int()
    vunit = cur.read_int()
    dxdelta = _dconv(buf, 816, 12)
    dydelta = _dconv(buf, 828, 12)
    vres = _dconv(buf, 840, 12)
    if dydelta == 0:
        raise ValueError("zero dy spacing")
    is_float = vunit == 1 or vres < 1.0

    corners = [( _dconv(buf, 546 + k * 48, 24),
                 _dconv(buf, 546 + k * 48 + 24, 24))
               for k in range(4)]        # SW, NW, NE, SE
    xmin = min(corners[0][0], corners[1][0])
    ymin = min(corners[0][1], corners[3][1])
    ymax = max(corners[1][1], corners[2][1])

    cur.i = 858
    nprofiles = cur.read_int()

    geographic = coordsys not in (1, 2, -9999)
    if not geographic:
        ymin = np.floor(ymin / dydelta) * dydelta
        ymax = np.ceil(ymax / dydelta) * dydelta
        cur.i = start
        for _ in range(4):
            cur.read_int()
        dx_start = cur.read_dbl(24)
        ny = int((ymax - ymin) / dydelta + 1.5)
        gt = (dx_start - dxdelta / 2.0, dxdelta, 0.0,
              ymax + dydelta / 2.0, 0.0, -dydelta)
    else:
        ny = int((ymax - ymin) / dydelta + 1.5)
        gt = ((xmin - dxdelta / 2.0) / 3600.0, dxdelta / 3600.0, 0.0,
              (ymax + dydelta / 2.0) / 3600.0, 0.0, -dydelta / 3600.0)
    nx = nprofiles

    arr = np.full((ny, nx), NODATA,
                  np.float32 if is_float else np.int16)
    ymin_center = gt[3] + (ny - 0.5) * gt[5]

    cur.i = start
    for i in range(nx):
        cur.read_int()                   # row number (1)
        cur.read_int()                   # column number (i+1)
        npts = cur.read_int()
        cur.read_int()                   # number of columns (1)
        cur.read_dbl(24)                 # dxStart
        dy_start = cur.read_dbl(24)
        elev_off = cur.read_dbl(24)
        cur.read_dbl(24)
        cur.read_dbl(24)
        if geographic:
            dy_start /= 3600.0
        lygap = int((ymin_center - dy_start) / gt[5] + 0.5)
        for j in range(lygap, npts + lygap):
            iy = ny - j - 1
            nelev = cur.read_int()
            if nelev is None:
                raise ValueError("truncated USGS DEM profile")
            if 0 <= iy < ny and nelev != NODATA:
                v = np.float32(nelev * vres + elev_off)
                if is_float:
                    arr[iy, i] = v
                else:
                    arr[iy, i] = np.int16(
                        max(-32768, min(32767, int(v))))
        if start == 1024:                # pad to the 1024 record
            cur.i = (cur.i + 1023) // 1024 * 1024
    return arr[None], gt, float(NODATA)
