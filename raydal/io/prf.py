"""Racurs PHOTOMOD PRF / x-dem tiled raster reader, from scratch.

Mirrors the reference's PRF driver (``frmts/prf/phprfdataset.cpp``)
semantics, derived from its published test matrix
(``autotest/gdrivers/prf.py``):

* a ``.prf`` / ``.x-dem`` document is a ``phini`` XML: global
  Width/Height/QChans/BytesPS plus one element per tile part
  (``ph_0_0`` …) carrying Width/Height/DispX/DispY (and ``Scale`` > 0
  for pyramid overviews, which are listed but not mosaicked into the
  base image); tile files live in ``<stem>/<partname>.<parts_ext>``
  and decode through this engine's TIFF reader,
* megatiff georeferencing: GT = (A_0, A_1, A_2, B_0 − B_1 − B_2,
  B_1, B_2) — the reference shifts the origin down one row
  (``PH_GEOREF_SHIFT_Y``; ``test_prf_1`` expects (1,2,3,−7,5,6)),
* x-dem georeferencing from XR_0/XR_1/YR_0/YR_1 pixel-center ranges:
  gt1 = (XR_1−XR_0)/(W−1), gt5 = (YR_0−YR_1)/(H−1), origin shifted
  half a pixel (``test_prf_4`` expects (1.5,1,0,9329,0,−2)); DEM
  bands are float32 with unit ``m``, BadZ is the nodata value,
* the WKT in a sibling ``.prj`` is surfaced as ``wkt``.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from .tiff import read_tiff
from .vrtxml import read_vrt

__all__ = ["read_prf"]

_DTYPES = {(b, t): d for (b, t), d in {
    (1, "U"): np.uint8, (2, "U"): np.uint16, (4, "U"): np.uint32,
    (1, "F"): np.float32, (2, "F"): np.float32, (4, "F"): np.float32,
}.items()}


def _items(elem):
    out = {}
    for c in elem:
        n = c.get("n")
        if n is not None and "v" in c.attrib:
            out[n] = c.get("v")
    return out


def _tile_bands(tile_path):
    """A PRF part is normally a TIFF, but the reference's x-dem
    fixtures ship VRT XML tiles (sourceless bands read as zeros)."""
    raw = open(tile_path, "rb").read()
    if raw.lstrip()[:4] == b"<VRT":
        arr = np.asarray(read_vrt(tile_path)[0])   # (bands, h, w)
        return [arr[c] for c in range(arr.shape[0])]
    return read_tiff(raw).bands


def read_prf(path, load_pixels=True):
    """PRF/x-dem document → dict with ``data`` (2-D/3-D array),
    ``geotransform``, ``wkt``, ``nodata``, ``unit``, ``overviews``
    (list of (scale, tile files))."""
    root = ET.parse(path).getroot()
    top = _items(root)
    width = int(top.get("Width", 0))
    height = int(top.get("Height", 0))
    nchan = int(top.get("QChans", 1))
    bytes_ps = int(top.get("BytesPS", 1))
    parts_ext = top.get("parts_ext", "tif")
    is_dem = path.lower().endswith(".x-dem")

    chan_type = "U"
    for e in root:
        if e.get("n") == "ChannelsInfo":
            chan_type = _items(e).get("type", "U")
    dt = _DTYPES.get((bytes_ps, chan_type), np.uint8)

    gt = None
    for e in root:
        if e.get("n") == "GeoRef":
            vals = _items(e)
            try:
                g = [float(vals[k]) for k in
                     ("A_0", "A_1", "A_2", "B_0", "B_1", "B_2")]
                # PH_GEOREF_SHIFT_Y: origin moves down one raster row
                g[3] -= g[4] + g[5]
                gt = tuple(g)
            except KeyError:
                pass
    if is_dem:
        try:
            xr0, xr1 = float(top["XR_0"]), float(top["XR_1"])
            yr0, yr1 = float(top["YR_0"]), float(top["YR_1"])
            g1 = (xr1 - xr0) / (width - 1)
            g5 = (yr0 - yr1) / (height - 1)
            gt = (xr0 - 0.5 * g1, g1, 0.0, yr1 - 0.5 * g5, 0.0, g5)
        except (KeyError, ZeroDivisionError):
            pass

    nodata = None
    if "BadZ" in top:
        nodata = float(top["BadZ"])

    stem = os.path.splitext(path)[0]
    data = np.zeros((height, width) if nchan == 1 else
                    (height, width, nchan), dtype=dt) if load_pixels \
        else None
    overviews = []
    for e in root:
        sub = _items(e)
        if "Width" not in sub or "Height" not in sub:
            continue
        name = e.get("n")
        w, h = int(sub["Width"]), int(sub["Height"])
        ox, oy = int(sub.get("DispX", 0)), int(sub.get("DispY", 0))
        scale = int(sub.get("Scale", 0))
        tile_path = os.path.join(stem, f"{name}.{parts_ext}")
        if is_dem:
            tile_path = os.path.join(stem, f"{name}.demtif")
        if scale > 0:
            overviews.append((scale, tile_path))
            continue
        if not load_pixels:
            continue
        if not os.path.exists(tile_path):
            continue
        bands = _tile_bands(tile_path)
        th = min(h, bands[0].shape[0], height - oy)
        tw = min(w, bands[0].shape[1], width - ox)
        if nchan == 1:
            data[oy:oy + th, ox:ox + tw] = bands[0][:th, :tw].astype(dt)
        else:
            for c in range(min(nchan, len(bands))):
                data[oy:oy + th, ox:ox + tw, c] = \
                    bands[c][:th, :tw].astype(dt)

    wkt = None
    prj = os.path.splitext(path)[0] + ".prj"
    if os.path.exists(prj):
        wkt = open(prj, encoding="latin1").read().strip()

    return {"data": data, "size": (width, height), "dtype": dt,
            "geotransform": gt, "wkt": wkt, "nodata": nodata,
            "unit": "m" if is_dem else None, "overviews": overviews}
