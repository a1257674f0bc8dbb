"""Minimal VRT XML raster reader, from scratch.

Reference driver: ``frmts/vrt/vrtdataset.cpp`` /
``vrtsources.cpp``.  The engine's own virtual-dataset role is the
lazy Ray Data plan (``raydal/pipeline.py``); this module exists for
the *file format* — .vrt documents on disk referenced by other
datasets (e.g. the DIMAP fixture's IMAGERY.TIF is a VRT wrapper,
``autotest/gdrivers/data/dimap/IMAGERY.TIF``).

Supported surface: ``VRTDataset rasterXSize/rasterYSize``,
``GeoTransform``, per-band ``dataType`` / ``NoDataValue``,
``SimpleSource`` and ``ComplexSource`` (``ScaleOffset``/
``ScaleRatio``/``NODATA``) with ``SourceFilename relativeToVRT``,
``SourceBand``, ``SrcRect``/``DstRect`` and nearest-neighbour
resampling on size mismatch (the reference's default).  Source files
are opened by content sniff (TIFF, nested VRT, PNG, HFA).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from .hfa import read_hfa
from .png import decode_png
from .tiff import read_tiff

__all__ = ["read_vrt", "parse_vrt"]

_GDAL_DTYPES = {
    "Byte": np.uint8, "Int8": np.int8,
    "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32,
    "UInt64": np.uint64, "Int64": np.int64,
    "Float32": np.float32, "Float64": np.float64,
    "CFloat32": np.complex64, "CFloat64": np.complex128,
}


def _open_source(path):
    """Sniff + decode a referenced raster → (bands, h, w) ndarray."""
    with open(path, "rb") as f:
        head = f.read(16)
    if head[:2] in (b"II", b"MM") and head[2:3] in (b"*", b"+", b"\x2a"):
        img = read_tiff(open(path, "rb").read())
        return np.stack(img.bands)
    if head.lstrip()[:1] == b"<":
        return read_vrt(path)[0]
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        a = decode_png(open(path, "rb").read())
        return a.transpose(2, 0, 1) if a.ndim == 3 else a[None]
    if head[:4] == b"\xea\xfa\xac\xca" or path.lower().endswith(".img"):
        return read_hfa(path)[0]
    raise NotImplementedError(
        f"unrecognized VRT source format for {path!r}")


def _rect(el, default):
    if el is None:
        return default
    return (float(el.get("xOff", 0)), float(el.get("yOff", 0)),
            float(el.get("xSize", default[2])),
            float(el.get("ySize", default[3])))


def parse_vrt(src):
    """VRT text/path → parsed document dict (w, h, gt, bands)."""
    if isinstance(src, (bytes, bytearray)):
        text = bytes(src).decode("utf-8", "replace")
        base = "."
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        text = src
        base = "."
    else:
        with open(src, "r", encoding="utf-8") as f:
            text = f.read()
        base = os.path.dirname(os.path.abspath(str(src)))
    root = ET.fromstring(text)
    if root.tag != "VRTDataset":
        raise ValueError("not a VRTDataset document")
    w = int(root.get("rasterXSize"))
    h = int(root.get("rasterYSize"))
    gt = None
    gt_el = root.find("GeoTransform")
    if gt_el is not None and gt_el.text:
        gt = tuple(float(v) for v in gt_el.text.split(","))
    bands = []
    for bel in root.findall("VRTRasterBand"):
        dt = _GDAL_DTYPES.get(bel.get("dataType", "Byte"), np.uint8)
        nd_el = bel.find("NoDataValue")
        nodata = float(nd_el.text) if nd_el is not None and nd_el.text \
            else None
        sources = []
        for sel in bel:
            if sel.tag not in ("SimpleSource", "ComplexSource",
                               "AveragedSource"):
                continue
            fn_el = sel.find("SourceFilename")
            if fn_el is None or not fn_el.text:
                continue
            fn = fn_el.text.strip()
            if fn_el.get("relativeToVRT", "0") == "1":
                fn = os.path.join(base, fn)
            sb_el = sel.find("SourceBand")
            sband = int(sb_el.text) if sb_el is not None and sb_el.text \
                else 1
            scale_off = sel.find("ScaleOffset")
            scale_ratio = sel.find("ScaleRatio")
            src_nd = sel.find("NODATA")
            sources.append({
                "path": fn, "band": sband,
                "src_rect": sel.find("SrcRect"),
                "dst_rect": sel.find("DstRect"),
                "scale_offset": (float(scale_off.text)
                                 if scale_off is not None else 0.0),
                "scale_ratio": (float(scale_ratio.text)
                                if scale_ratio is not None else 1.0),
                "nodata": (float(src_nd.text)
                           if src_nd is not None else None),
            })
        bands.append({"dtype": dt, "nodata": nodata,
                      "sources": sources})
    return {"w": w, "h": h, "gt": gt, "bands": bands}


def read_vrt(src):
    """VRT document → ``(array [bands, h, w], geotransform | None,
    nodata | None)``, compositing every source like
    ``VRTSimpleSource::RasterIO`` (nearest resampling)."""
    doc = parse_vrt(src)
    w, h = doc["w"], doc["h"]
    out_bands = []
    nodata = None
    cache = {}
    for band in doc["bands"]:
        fill = band["nodata"] if band["nodata"] is not None else 0
        arr = np.full((h, w), fill, band["dtype"])
        if band["nodata"] is not None:
            nodata = band["nodata"]
        for s in band["sources"]:
            if s["path"] not in cache:
                cache[s["path"]] = _open_source(s["path"])
            src_arr = cache[s["path"]]
            sb = src_arr[min(s["band"], src_arr.shape[0]) - 1]
            sh, sw = sb.shape
            sx, sy, sxs, sys = _rect(s["src_rect"], (0, 0, sw, sh))
            dx, dy, dxs, dys = _rect(s["dst_rect"], (0, 0, w, h))
            dx0, dy0 = int(round(dx)), int(round(dy))
            dxs_i, dys_i = int(round(dxs)), int(round(dys))
            dx1 = min(dx0 + dxs_i, w)
            dy1 = min(dy0 + dys_i, h)
            if dx1 <= dx0 or dy1 <= dy0:
                continue
            # nearest-neighbour pick of source pixels per dst pixel
            cols = (sx + (np.arange(dx0, dx1) - dx + 0.5)
                    * (sxs / dxs)).astype(np.int64)
            rows = (sy + (np.arange(dy0, dy1) - dy + 0.5)
                    * (sys / dys)).astype(np.int64)
            cols = np.clip(cols, 0, sw - 1)
            rows = np.clip(rows, 0, sh - 1)
            patch = sb[rows[:, None], cols[None, :]]
            if s["scale_ratio"] != 1.0 or s["scale_offset"] != 0.0:
                patch = patch * s["scale_ratio"] + s["scale_offset"]
            if s["nodata"] is not None:
                keep = patch != s["nodata"]
                dst = arr[dy0:dy1, dx0:dx1]
                dst[keep] = patch.astype(band["dtype"],
                                         copy=False)[keep]
                arr[dy0:dy1, dx0:dx1] = dst
            else:
                arr[dy0:dy1, dx0:dx1] = patch.astype(band["dtype"],
                                                     copy=False)
        out_bands.append(arr)
    return np.stack(out_bands), doc["gt"], nodata
