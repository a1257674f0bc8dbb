"""ILWIS raster map reader — ``.mpr`` single map or ``.mpl`` map
list, from scratch on the ini-style layout.

Reference semantics (``frmts/ilwis/ilwisdataset.cpp``):

* a ``.mpr`` is a Windows-ini text file; pixels live in the
  ``[MapStore] Data=`` companion (conventionally ``.mp#``) with
  ``Type`` one of Byte/Int/Long/Float/Real → uint8 / int16 / int32 /
  float32 / float64, little-endian (:339-367, :915-920);
* dimensions come from ``[Map] Size=lines cols`` (rows first);
* the geotransform comes from the ``[GeoRef]`` file named by
  ``GeoRef=``: GeoRefCorners MinX/MinY/MaxX/MaxY with pixel size
  ``delta / size``; ``CornersOfCorners=Yes`` means the extent is
  outer-corner based, otherwise it is pixel-center based and is
  widened by half a pixel (:504-540);
* a ``.mpl`` is ``[MapList] Maps=N`` + ``Map0..MapN-1`` entries, one
  ``.mpr`` per band (:709-725).

Published parity: ``autotest/gdrivers/ilwis.py`` test 1 —
LanduseSmall.mpr checksum 2351.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_ilwis"]

_TYPES = {"byte": np.dtype("u1"), "int": np.dtype("<i2"),
          "long": np.dtype("<i4"), "float": np.dtype("<f4"),
          "real": np.dtype("<f8")}


def _read_ini(path):
    sections = {}
    cur = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            if line.startswith("[") and line.endswith("]"):
                cur = line[1:-1].strip().lower()
                sections.setdefault(cur, {})
            elif "=" in line and cur is not None:
                k, v = line.split("=", 1)
                sections[cur][k.strip().lower()] = v.strip()
    return sections


def _sibling(path, name):
    return os.path.join(os.path.dirname(os.path.abspath(path)), name)


def _georef(path, ini):
    grf_name = (ini.get("map", {}).get("georef")
                or ini.get("maplist", {}).get("georef"))
    if not grf_name or grf_name.lower() == "none.grf":
        return None
    grf = _read_ini(_sibling(path, grf_name))
    if grf.get("georef", {}).get("type", "").lower() != "georefcorners":
        return None
    c = grf.get("georefcorners", {})
    cols = int(grf["georef"]["columns"])
    lines = int(grf["georef"]["lines"])
    minx, miny = float(c["minx"]), float(c["miny"])
    maxx, maxy = float(c["maxx"]), float(c["maxy"])
    px = (maxx - minx) / cols
    py = (maxy - miny) / lines
    if c.get("cornersofcorners", "").lower() == "yes":
        x0, y0 = minx, maxy
    else:
        x0, y0 = minx - px / 2.0, maxy + py / 2.0
    return (x0, px, 0.0, y0, 0.0, -py)


def _read_band(mpr_path):
    ini = _read_ini(mpr_path)
    store = ini.get("mapstore", {})
    size = ini.get("map", {}).get("size", "").split()
    lines, cols = int(size[0]), int(size[1])
    dt = _TYPES[store.get("type", "byte").lower()]
    if store.get("swapbytes", "no").lower() == "yes":
        dt = dt.newbyteorder(">")
    data_name = store.get("data") or \
        os.path.basename(os.path.splitext(mpr_path)[0]) + ".mp#"
    with open(_sibling(mpr_path, data_name), "rb") as f:
        buf = f.read()
    arr = np.frombuffer(buf, dt, count=lines * cols).reshape(lines, cols)
    return arr, ini


def read_ilwis(src):
    """ILWIS ``.mpr``/``.mpl`` → (array[bands, h, w], geotransform,
    None)."""
    src = str(src)
    ini = _read_ini(src)
    if "maplist" in ini:
        ml = ini["maplist"]
        n = int(ml["maps"])
        bands = []
        for i in range(n):
            name = ml[f"map{i}"]
            if not os.path.splitext(name)[1]:
                name += ".mpr"
            b, _ = _read_band(_sibling(src, name))
            bands.append(b)
        return np.stack(bands), _georef(src, ini), None
    arr, ini = _read_band(src)
    return arr[None], _georef(src, ini), None
