"""Golden Software Surfer grid reader-writers (GSBG binary v6,
GS7BG Surfer-7 binary), from scratch on the published format layout.

Reference semantics: ``frmts/gsg/gsbgdataset.cpp`` and
``gs7bgdataset.cpp`` — rows are stored bottom-up (IReadBlock seeks
``header + rowsize * (ny - 1 - row)``, gsbgdataset.cpp:238-241);
header x/y are CELL CENTERS, so the geotransform extends by half a
step (gsbgdataset.cpp:625-630); the blank/nodata sentinel is
1.701410009187828e38 (gsbgdataset.cpp:70, gs7bgdataset.cpp:33).
Published parity: ``autotest/gdrivers/gsg.py`` gsg_binary.grd /
gsg_7binary.grd band 1 = 4672.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_gsbg", "read_gs7bg", "write_gsbg", "write_gs7bg"]

NODATA = 1.701410009187828e+38


def _gt(minx, maxx, miny, maxy, nx, ny):
    dx = (maxx - minx) / (nx - 1) if nx > 1 else 1.0
    dy = (maxy - miny) / (ny - 1) if ny > 1 else 1.0
    return (minx - dx / 2, dx, 0.0, maxy + dy / 2, 0.0, -dy)


def read_gsbg(src):
    """Surfer 6 binary grid → (array[1, ny, nx] float32 north-up,
    geotransform, nodata)."""
    buf = src if isinstance(src, (bytes, bytearray)) else \
        open(src, "rb").read()
    if buf[:4] != b"DSBB":
        raise ValueError("not a Surfer 6 binary grid (DSBB)")
    nx, ny = struct.unpack_from("<hh", buf, 4)
    minx, maxx, miny, maxy, _minz, _maxz = \
        struct.unpack_from("<6d", buf, 8)
    arr = np.frombuffer(buf, dtype="<f4", count=nx * ny, offset=56) \
        .reshape(ny, nx)[::-1]      # bottom-up → north-up
    return arr[None].astype(np.float32), \
        _gt(minx, maxx, miny, maxy, nx, ny), NODATA


def read_gs7bg(src):
    """Surfer 7 binary grid → (array[1, ny, nx] float64 north-up,
    geotransform, nodata)."""
    buf = src if isinstance(src, (bytes, bytearray)) else \
        open(src, "rb").read()
    if buf[:4] != b"DSRB":
        raise ValueError("not a Surfer 7 binary grid (DSRB)")
    pos = 4 + 4 + 4                 # header tag + size + version
    grid = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = struct.unpack_from("<i", buf, pos + 4)[0]
        pos += 8
        if tag == b"GRID":
            ny, nx = struct.unpack_from("<ii", buf, pos)
            (xll, yll, dx, dy, _zmin, _zmax, _rot, blank) = \
                struct.unpack_from("<8d", buf, pos + 8)
            grid = (nx, ny, xll, yll, dx, dy, blank)
            pos += size
        elif tag == b"DATA":
            if grid is None:
                raise ValueError("DATA section before GRID")
            nx, ny, xll, yll, dx, dy, blank = grid
            arr = np.frombuffer(buf, dtype="<f8", count=nx * ny,
                                offset=pos).reshape(ny, nx)[::-1]
            gt = (xll - dx / 2, dx, 0.0,
                  yll + (ny - 1) * dy + dy / 2, 0.0, -dy)
            return arr[None].astype(np.float64), gt, blank
        else:
            pos += size
    raise ValueError("no DATA section in Surfer 7 grid")


def write_gsbg(arr, geotransform, path):
    """float array[ny, nx] (north-up) + geotransform → DSBB file."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 3:
        a = a[0]
    ny, nx = a.shape
    gt = geotransform
    minx, maxx = gt[0] + gt[1] / 2, gt[0] + gt[1] / 2 + (nx - 1) * gt[1]
    maxy = gt[3] + gt[5] / 2
    miny = maxy + (ny - 1) * gt[5]
    valid = a[a != np.float32(NODATA)]
    zmin = float(valid.min()) if valid.size else 0.0
    zmax = float(valid.max()) if valid.size else 0.0
    with open(path, "wb") as f:
        f.write(b"DSBB" + struct.pack("<hh", nx, ny)
                + struct.pack("<6d", minx, maxx, miny, maxy,
                              zmin, zmax))
        f.write(np.ascontiguousarray(a[::-1]).astype("<f4").tobytes())
    return path


def write_gs7bg(arr, geotransform, path):
    """float array[ny, nx] (north-up) + geotransform → DSRB file."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a[0]
    ny, nx = a.shape
    gt = geotransform
    xll = gt[0] + gt[1] / 2
    yll = gt[3] + gt[5] / 2 + (ny - 1) * gt[5]
    valid = a[a != NODATA]
    zmin = float(valid.min()) if valid.size else 0.0
    zmax = float(valid.max()) if valid.size else 0.0
    grid = struct.pack("<ii8d", ny, nx, xll, yll, gt[1], -gt[5],
                       zmin, zmax, 0.0, NODATA)
    data = np.ascontiguousarray(a[::-1]).astype("<f8").tobytes()
    with open(path, "wb") as f:
        f.write(b"DSRB" + struct.pack("<ii", 4, 1))
        f.write(b"GRID" + struct.pack("<i", len(grid)) + grid)
        f.write(b"DATA" + struct.pack("<i", len(data)) + data)
    return path
