"""ZMap Plus ASCII grid reader-writer, from scratch on the published
layout.

Reference semantics (``frmts/zmap/zmapdataset.cpp``): '!' comment
lines, then three comma-separated header lines — ``@<name>, GRID,
valuesPerLine`` / ``fieldSize, nodata, <blank>, decimals, 1`` /
``nrows, ncols, minX, maxX, minY, maxY`` — a dummy line, an ``@``
terminator, then the samples COLUMN-major (west→east columns, each
listed north→south; CreateCopy loop zmapdataset.cpp:676-700).  The
default pixel-is-area geotransform divides the extents by ncols/nrows
(zmapdataset.cpp:455-462).  Round-trip parity with
``autotest/gdrivers/zmap.py`` (byte.tif checksum 4672).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_zmap", "write_zmap"]


def read_zmap(src):
    """ZMap grid (path or bytes) → (array[1, ny, nx] float64
    north-up, geotransform, nodata)."""
    if isinstance(src, (bytes, bytearray)):
        text = src.decode("ascii", "replace")
    else:
        with open(src) as f:
            text = f.read()
    lines = text.splitlines()
    i = 0
    while i < len(lines) and (not lines[i] or lines[i][0] == "!"):
        i += 1
    first = lines[i].split(",")
    if not first[0].startswith("@") or len(first) != 3:
        raise ValueError("not a ZMap grid header")
    second = lines[i + 1].split(",")
    nodata = float(second[1])
    third = lines[i + 2].split(",")
    nrows, ncols = int(third[0]), int(third[1])
    minx, maxx = float(third[2]), float(third[3])
    miny, maxy = float(third[4]), float(third[5])
    # skip the dummy line, then require the '@' data marker
    j = i + 4
    if not lines[j].startswith("@"):
        raise ValueError("missing ZMap '@' data marker")
    vals = np.array(" ".join(lines[j + 1:]).split(), dtype=np.float64)
    if vals.size < nrows * ncols:
        raise ValueError("truncated ZMap data section")
    arr = vals[:nrows * ncols].reshape(ncols, nrows).T
    gt = (minx, (maxx - minx) / ncols, 0.0,
          maxy, 0.0, -(maxy - miny) / nrows)
    return arr[None], gt, nodata


def write_zmap(arr, geotransform, path, nodata=1e30,
               values_per_line=4, field_size=18, decimals=7):
    """array[ny, nx] (north-up) + geotransform → ZMap grid file."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a[0]
    ny, nx = a.shape
    gt = geotransform
    minx, maxx = gt[0], gt[0] + gt[1] * nx
    maxy, miny = gt[3], gt[3] + gt[5] * ny
    fmt = f"%{field_size}.{decimals}f"
    out = ["!", "! Created by raydal.", "!",
           f"@GRID FILE, GRID, {values_per_line}",
           f"{field_size:>10}, {nodata:>{field_size}.{decimals}f}, "
           f"{'':>10}, {decimals:>10}, {1:>10}",
           f"{ny:>10}, {nx:>10}, {minx:>14.7f}, {maxx:>14.7f}, "
           f"{miny:>14.7f}, {maxy:>14.7f}",
           "0.0, 0.0, 0.0", "@"]
    cols = a.T                      # column-major, north→south
    for col in cols:
        for k in range(0, ny, values_per_line):
            out.append("".join(fmt % v
                               for v in col[k:k + values_per_line]))
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    return path
