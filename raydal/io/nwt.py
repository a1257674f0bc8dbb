"""Northwood/VerticalMapper GRD (and GRC) reader, from scratch.

Reference driver: ``frmts/northwood/`` (``northwood.cpp``
``nwt_ParseHeader``/``nwt_LoadColors``/``createIP``/``linearColor``,
``grddataset.cpp`` band synthesis).  A ``.grd`` holds a 1024-byte
header (sizes at 9/11 with 32-bit escapes at 128/132, bounds as LE
doubles at 13..45, Z range floats at 45/49, color inflection table
at 516/518, bytes-per-pixel at 1023) followed by row-major LE uint16
cells where 0 is null and ``z = zmin + (raw-1)·(zmax-zmin)/65534``.

The reference synthesizes four bands: R/G/B from a 4096-entry color
ramp (``ColorMap[raw/16]``) interpolated between the header's
inflection points exactly as ``createIP`` does (integer truncation
of ``+0.5`` rounding included), plus the float32 Z band.  This
reader reproduces all four.

Validated against ``autotest/gdrivers/nwt_grd.py`` test_nwt_grd_1
(band checksums 28093 / 33690 / 20365 / 25856).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_nwt_grd", "read_nwt_grc"]

_NODATA = np.float32(-1.0e37)


def _create_ip(cmap, index, rgb, marker):
    """createIP (northwood.cpp:352-390): linear fill from the last
    watermark to ``index``."""
    if index == 0:
        cmap[0] = rgb
        return 0
    if index <= marker:
        return marker
    wm = marker
    base = cmap[wm].astype(np.float32)
    slope = (np.asarray(rgb, np.float32) - base) / float(index - wm)
    for i in range(wm + 1, index):
        cmap[i] = (base + (i - wm) * slope + 0.5).astype(np.uint8)
    cmap[index] = rgb
    return index


def _linear_color(lo, hi, mid):
    """linearColor (northwood.cpp:322-350)."""
    zlo, rlo = lo
    zhi, rhi = hi
    if mid < zlo:
        return rlo
    if mid > zhi:
        return rhi
    scale = (mid - zlo) / (zhi - zlo)
    return tuple(int(scale * (h - l) + l + 0.5)
                 for l, h in zip(rlo, rhi))


def _load_colors(inflections, zmin, zmax, map_size=4096):
    """nwt_LoadColors (northwood.cpp:242-320)."""
    cmap = np.zeros((map_size, 3), np.uint8)
    marker = _create_ip(cmap, 0, (255, 255, 255), 0)
    if not inflections:
        return cmap
    n = len(inflections)
    if zmin <= inflections[0][0]:
        marker = _create_ip(cmap, 1, inflections[0][1], marker)
        i = 1
    else:
        i = 1
        while i < n:
            if zmin < inflections[i][0]:
                c = _linear_color(inflections[i - 1],
                                  inflections[i], zmin)
                marker = _create_ip(cmap, 1, c, marker)
                break
            i += 1
    if i >= n:
        marker = _create_ip(cmap, 1, inflections[-1][1], marker)
        _create_ip(cmap, map_size - 1, inflections[-1][1], marker)
        return cmap
    index = 0
    while i < n:
        if zmax < inflections[i][0]:
            c = _linear_color(inflections[i - 1], inflections[i],
                              zmax)
            index = map_size - 1
            marker = _create_ip(cmap, index, c, marker)
            break
        index = int(((inflections[i][0] - zmin) / (zmax - zmin))
                    * map_size)
        index = min(index, map_size - 1)
        marker = _create_ip(cmap, index, inflections[i][1], marker)
        i += 1
    if index < map_size - 1:
        _create_ip(cmap, map_size - 1, inflections[-1][1], marker)
    return cmap


def read_nwt_grc(path):
    """Northwood classified grid (.grc, ``grcdataset.cpp``): one
    band of raw class ids (8/16/32-bit LE; ``nwt_ParseHeader``'s
    ``nBitsPerPixel = hdr[1023]*4`` quirk for classified grids,
    0 → 16), class 0 transparent.  Published parity:
    ``autotest/gdrivers/nwt_grc.py`` (checksum 46760)."""
    with open(path, "rb") as f:
        hdr = f.read(1024)
        data = f.read()
    if len(hdr) < 1024 or hdr[4:5] != b"8":
        raise ValueError("not a Northwood classified grid")
    w = struct.unpack("<H", hdr[9:11])[0]
    if w == 0:
        w = struct.unpack("<I", hdr[128:132])[0]
    h = struct.unpack("<H", hdr[11:13])[0]
    if h == 0:
        h = struct.unpack("<I", hdr[132:136])[0]
    minx, maxx, miny, maxy = struct.unpack("<4d", hdr[13:45])
    bits = 16 if hdr[1023] == 0 else hdr[1023] * 4
    dt = {8: "<u1", 16: "<u2", 32: "<u4"}.get(bits)
    if dt is None:
        raise ValueError(f"bad GRC bits per pixel {bits}")
    step = (maxx - minx) / (w - 1)
    gt = (minx - step * 0.5, step, 0.0, maxy + step * 0.5, 0.0,
          -step)
    a = np.frombuffer(data, dt, count=w * h).reshape(h, w)
    return a.astype(np.dtype(dt).newbyteorder("="))[None], gt, 0.0


def read_nwt_grd(path):
    """GRD → ``(array [4, h, w] — R, G, B uint8 views + Z float32 —
    returned as float32, geotransform, nodata)`` matching the
    reference's four-band exposure."""
    with open(path, "rb") as f:
        hdr = f.read(1024)
        data = f.read()
    if len(hdr) < 1024 or hdr[:3] != b"HGB" and hdr[4:5] not in \
            (b"1", b"8"):
        raise ValueError("not a Northwood grid")
    if hdr[4:5] != b"1":
        raise NotImplementedError("GRC classified grids")
    w = struct.unpack("<H", hdr[9:11])[0]
    if w == 0:
        w = struct.unpack("<I", hdr[128:132])[0]
    h = struct.unpack("<H", hdr[11:13])[0]
    if h == 0:
        h = struct.unpack("<I", hdr[132:136])[0]
    if w <= 1 or h < 1:
        raise ValueError("bad Northwood grid dimensions")
    minx, maxx, miny, maxy = struct.unpack("<4d", hdr[13:45])
    zmin, zmax = struct.unpack("<2f", hdr[45:53])
    n_infl = struct.unpack("<H", hdr[516:518])[0]
    if n_infl > 32:
        raise ValueError("corrupt Northwood header")
    inflections = []
    for i in range(n_infl):
        z = struct.unpack("<f", hdr[518 + 7 * i:522 + 7 * i])[0]
        r, g, b = hdr[522 + 7 * i:525 + 7 * i]
        inflections.append((z, (r, g, b)))
    step = (maxx - minx) / (w - 1)
    gt = (minx - step * 0.5, step, 0.0, maxy + step * 0.5, 0.0,
          -step)
    raw = np.frombuffer(data, "<u2", count=w * h).reshape(h, w)
    scale = (zmax - zmin) / 65534.0       # SCALE16BIT
    z = np.where(raw == 0, _NODATA,
                 np.float32(zmin)
                 + (raw.astype(np.float32) - 1)
                 * np.float32(scale)).astype(np.float32)
    cmap = _load_colors(inflections, zmin, zmax)
    rgb = cmap[raw // 16]                  # (h, w, 3)
    bands = np.stack([rgb[:, :, 0].astype(np.float32),
                      rgb[:, :, 1].astype(np.float32),
                      rgb[:, :, 2].astype(np.float32), z])
    return bands, gt, float(_NODATA)
