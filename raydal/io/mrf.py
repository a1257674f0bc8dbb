"""Meta Raster Format (MRF) reader, from scratch.

Reference driver: ``frmts/mrf/`` (``marfa.h`` / ``mrf_band.cpp``):
a ``.mrf`` XML document (``Raster/Size``, ``PageSize``,
``Compression``, ``DataType``, ``GeoTags/BoundingBox``), a ``.idx``
tile index of big-endian ``(offset u64, size u64)`` records, and a
data file whose extension follows the compression (PNG→``.ppg``,
JPEG→``.pjg``, DEFLATE→``.pzp``, NONE→``.til``, TIF→``.ptf``,
LERC→``.lrc``).  A zero-size index entry is a missing page (fill).

Implemented compressions: PNG, JPEG (via the repo's own codecs),
DEFLATE, NONE.  LERC/ZSTD/QB3 raise ``NotImplementedError``
(documented swap points).  Validated against the reference's own
``autotest/gdrivers/data/mrf/{png,deflate,none,jpeg}/byte.*``
fixtures: the lossless ones decode checksum-identical (4672) to the
``byte.tif`` they were created from.
"""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET
import zlib as _zlib

import numpy as np

from .jpeg import decode_jpeg
from .png import decode_png

__all__ = ["read_mrf", "mrf_info"]

_DATA_EXT = {
    "PNG": ".ppg", "PPNG": ".ppg", "JPEG": ".pjg", "JPNG": ".pjp",
    "DEFLATE": ".pzp", "NONE": ".til", "TIF": ".ptf", "LERC": ".lrc",
    "ZSTD": ".pzs", "QB3": ".pq3",
}
_GDAL_DTYPES = {
    "Byte": np.uint8, "Int8": np.int8, "UInt16": np.uint16,
    "Int16": np.int16, "UInt32": np.uint32, "Int32": np.int32,
    "UInt64": np.uint64, "Int64": np.int64,
    "Float32": np.float32, "Float64": np.float64,
}


def mrf_info(path):
    root = ET.parse(path).getroot()
    if root.tag != "MRF_META":
        raise ValueError("not an MRF metadata document")
    raster = root.find("Raster")
    size = raster.find("Size")
    page = raster.find("PageSize")
    w = int(size.get("x"))
    h = int(size.get("y"))
    c = int(size.get("c", "1"))
    px = int(page.get("x", "512")) if page is not None else 512
    py = int(page.get("y", "512")) if page is not None else 512
    pc = int(page.get("c", "1")) if page is not None else 1
    comp = (raster.findtext("Compression") or "PNG").upper()
    dtype = _GDAL_DTYPES.get(raster.findtext("DataType") or "Byte",
                             np.uint8)
    gt = None
    bbox = root.find("GeoTags/BoundingBox")
    if bbox is not None:
        minx = float(bbox.get("minx"))
        miny = float(bbox.get("miny"))
        maxx = float(bbox.get("maxx"))
        maxy = float(bbox.get("maxy"))
        gt = (minx, (maxx - minx) / w, 0.0, maxy, 0.0,
              -(maxy - miny) / h)
    nodata = None
    nd = root.find("Raster/DataValues")
    if nd is not None and nd.get("NoData") is not None:
        nodata = float(nd.get("NoData").split()[0])
    base = os.path.splitext(path)[0]
    data_file = root.findtext("Raster/DataFile") or \
        base + _DATA_EXT.get(comp, ".til")
    idx_file = root.findtext("Raster/IndexFile") or base + ".idx"
    return {"w": w, "h": h, "c": c, "page_x": px, "page_y": py,
            "page_c": pc, "compression": comp, "dtype": dtype,
            "geotransform": gt, "nodata": nodata,
            "data_file": data_file, "index_file": idx_file}


def _decode_page(raw, comp, px, py, pc, dtype):
    if comp in ("PNG", "PPNG"):
        a = decode_png(bytes(raw))
        if a.ndim == 2:
            a = a[:, :, None]
        return a
    if comp == "JPEG":
        a = decode_jpeg(bytes(raw))
        if a.ndim == 2:
            a = a[:, :, None]
        return a
    if comp == "DEFLATE":
        raw = _zlib.decompress(raw)
    elif comp != "NONE":
        raise NotImplementedError(
            f"MRF compression {comp!r} (LERC/ZSTD/QB3 swap point)")
    a = np.frombuffer(raw, dtype, count=px * py * pc)
    return a.reshape(py, px, pc)


def read_mrf(path):
    """.mrf → ``(array [bands, h, w], geotransform | None,
    nodata | None)``."""
    info = mrf_info(path)
    w, h, c = info["w"], info["h"], info["c"]
    px, py, pc = info["page_x"], info["page_y"], info["page_c"]
    dtype = np.dtype(info["dtype"])
    tpr = (w + px - 1) // px
    tpc = (h + py - 1) // py
    bands_per_page = pc
    page_groups = (c + pc - 1) // pc     # band-interleaved page sets
    with open(info["index_file"], "rb") as f:
        idx_raw = f.read()
    n_idx = len(idx_raw) // 16
    entries = [struct.unpack(">QQ", idx_raw[i * 16:(i + 1) * 16])
               for i in range(n_idx)]
    fill = info["nodata"] if info["nodata"] is not None else 0
    out = np.full((c, h, w), fill, dtype)
    with open(info["data_file"], "rb") as f:
        for g in range(page_groups):
            for ty in range(tpc):
                for tx in range(tpr):
                    ti = g * tpc * tpr + ty * tpr + tx
                    if ti >= len(entries):
                        continue
                    off, size = entries[ti]
                    if size == 0:
                        continue
                    f.seek(off)
                    page = _decode_page(f.read(size),
                                        info["compression"],
                                        px, py, pc, dtype)
                    x0, y0 = tx * px, ty * py
                    cw = min(px, w - x0)
                    ch = min(py, h - y0)
                    for bi in range(min(bands_per_page,
                                        c - g * pc)):
                        out[g * pc + bi, y0:y0 + ch, x0:x0 + cw] = \
                            page[:ch, :cw, bi].astype(dtype,
                                                      copy=False)
    return out, info["geotransform"], info["nodata"]
