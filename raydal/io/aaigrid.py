"""Arc/Info ASCII Grid (AAIGrid) reader/writer —
``frmts/aaigrid/aaigriddataset.cpp`` semantics.

Header keys ``ncols/nrows``, ``xllcorner|xllcenter`` /
``yllcorner|yllcenter`` (center variants shift by half a cell),
``cellsize`` or ``dx``+``dy``, optional ``NODATA_value`` — all
case-insensitive; then row-major whitespace-separated samples, north row
first.  Dtype follows the reference's inference: any ``.``/``e`` in the
samples (or a float nodata) → float64, else int32.  Validated against
the published checksums (``autotest/gdrivers/aaigrid.py``:
byte.tif.grd 4672, pixel_per_line.asc 1123, case_sensitive.ASC 1123).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_aaigrid", "write_aaigrid", "read_grassascii"]

_HEADER_KEYS = {"ncols", "nrows", "xllcorner", "xllcenter", "yllcorner",
                "yllcenter", "cellsize", "dx", "dy", "nodata_value"}


def read_aaigrid(src):
    """AAIGrid text or path → (array (nrows, ncols), geotransform,
    nodata_or_None)."""
    if isinstance(src, (bytes, bytearray)):
        text = src.decode("ascii", "replace")
    elif isinstance(src, str) and not os.path.exists(src):
        text = src
    else:
        with open(src) as f:
            text = f.read()
    toks = text.split()
    hdr = {}
    i = 0
    while i + 1 < len(toks) and toks[i].lower() in _HEADER_KEYS:
        hdr[toks[i].lower()] = toks[i + 1]
        i += 2
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("not an AAIGrid: missing ncols/nrows")
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    if "cellsize" in hdr:
        dx = dy = float(hdr["cellsize"])
    else:
        dx, dy = float(hdr["dx"]), float(hdr["dy"])
    if "xllcorner" in hdr:
        x0 = float(hdr["xllcorner"])
    else:
        x0 = float(hdr["xllcenter"]) - dx / 2
    if "yllcorner" in hdr:
        y0 = float(hdr["yllcorner"])
    else:
        y0 = float(hdr["yllcenter"]) - dy / 2
    nodata = hdr.get("nodata_value")
    vals = toks[i:i + w * h]
    if len(vals) < w * h:
        raise ValueError("truncated AAIGrid data")
    is_float = (nodata is not None and any(c in nodata for c in ".eE")) \
        or any(("." in v or "e" in v or "E" in v or v in ("nan", "-nan"))
               for v in vals)
    arr = np.array(vals, dtype=np.float64 if is_float else np.int32)
    arr = arr.reshape(h, w)
    if nodata is not None:
        nodata = float(nodata) if is_float else int(float(nodata))
    gt = (x0, dx, 0.0, y0 + h * dy, 0.0, -dy)
    return arr, gt, nodata


def read_grassascii(src):
    """GRASS ASCII grid (the AAIGrid driver's sibling,
    ``frmts/aaigrid/aaigriddataset.cpp`` GRASSASCIIDataset): header
    keys ``north south east west rows cols`` plus optional ``null:``
    and ``type:``; data north row first.  Published parity:
    ``autotest/gdrivers/grassasciigrid.py`` (checksum 212, gt
    (-100, 62.5, 0, 250, 0, -41.666...))."""
    if isinstance(src, (bytes, bytearray)):
        text = src.decode("ascii", "replace")
    elif isinstance(src, str) and not os.path.exists(src):
        text = src
    else:
        with open(src) as f:
            text = f.read()
    toks = text.split()
    keys = {"north:", "south:", "east:", "west:", "rows:", "cols:",
            "null:", "type:"}
    hdr = {}
    i = 0
    while i + 1 < len(toks) and toks[i].lower() in keys:
        hdr[toks[i].lower().rstrip(":")] = toks[i + 1]
        i += 2
    if "rows" not in hdr or "cols" not in hdr:
        raise ValueError("not a GRASS ASCII grid: missing rows/cols")
    h, w = int(hdr["rows"]), int(hdr["cols"])
    north, south = float(hdr["north"]), float(hdr["south"])
    east, west = float(hdr["east"]), float(hdr["west"])
    vals = toks[i:i + w * h]
    if len(vals) < w * h:
        raise ValueError("truncated GRASS ASCII grid")
    t = hdr.get("type", "").lower()
    if t in ("float", "double"):
        dt = np.float32 if t == "float" else np.float64
    elif t == "int":
        dt = np.int32
    else:
        is_float = any(("." in v or "e" in v or "E" in v) for v in vals)
        dt = np.float64 if is_float else np.int32
    arr = np.array(vals, np.float64).astype(dt).reshape(h, w)
    nodata = None
    if "null" in hdr:
        nodata = float(hdr["null"])
        if dt == np.int32:
            nodata = int(nodata)
    gt = (west, (east - west) / w, 0.0, north, 0.0,
          -(north - south) / h)
    return arr, gt, nodata


def write_aaigrid(arr, gt, path=None, nodata=None, decimals=6):
    """Array + north-up geotransform → AAIGrid text (written to ``path``
    when given)."""
    arr = np.asarray(arr)
    h, w = arr.shape
    if abs(abs(gt[1]) - abs(gt[5])) > 1e-12 * abs(gt[1]):
        cell = f"dx           {gt[1]:.12f}\ndy           {-gt[5]:.12f}"
    else:
        cell = f"cellsize     {gt[1]:.12f}"
    lines = [f"ncols        {w}", f"nrows        {h}",
             f"xllcorner    {gt[0]:.12f}",
             f"yllcorner    {gt[3] + h * gt[5]:.12f}", cell]
    if nodata is not None:
        lines.append(f"NODATA_value {nodata}")
    if np.issubdtype(arr.dtype, np.integer):
        body = "\n".join(" ".join(str(int(v)) for v in row)
                         for row in arr)
    else:
        body = "\n".join(" ".join(f"{v:.{decimals}f}" for v in row)
                         for row in arr)
    text = "\n".join(lines) + "\n" + body + "\n"
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
