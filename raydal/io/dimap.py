"""SPOT DIMAP (v1) dataset reader.

Reference driver: ``frmts/dimap/dimapdataset.cpp`` — a
``METADATA.DIM`` XML document describing raster dimensions, the
imagery file (``Data_Access.Data_File.DATA_FILE_PATH href``), tie
points (→ GCPs; ``RASTER_CS POINT`` / ``PIXEL_ORIGIN 1`` shifts
pixel/line by the origin so DATA_X=1 → GCPPixel 0.5), the horizontal
CRS, and metadata translated from the ``Production`` /
``Data_Processing`` / ``Image_Interpretation.Spectral_Band_Info``
subtrees (``dimapdataset.cpp:957-971`` translation table).

Validated against ``autotest/gdrivers/dimap.py`` test_dimap_1
(6000×6000, window checksum 21586, PROCESSING_LEVEL=1A,
SPECTRAL_PHYSICAL_BIAS=0.000000, 4 GCPs at half-pixel centers).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from .tiff import read_tiff
from .vrtxml import read_vrt

__all__ = ["read_dimap", "dimap_info"]

# DIMAP v1 metadata translation table (dimapdataset.cpp:957):
# XML subtree path → item prefix
_MD_TRANSLATION = [
    ("Production", ""),
    ("Production/Facility", "FACILITY_"),
    ("Dataset_Sources/Source_Information/Scene_Source", ""),
    ("Data_Processing", ""),
    ("Image_Interpretation/Spectral_Band_Info", "SPECTRAL_"),
]


def _parse(path):
    if os.path.isdir(path):
        path = os.path.join(path, "METADATA.DIM")
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return ET.fromstring(f.read()), os.path.dirname(
            os.path.abspath(path))


def dimap_info(path):
    """METADATA.DIM → dict with ``ncols nrows nbands data_file
    metadata gcps gcp_crs crs geotransform``."""
    root, base = _parse(path)
    dims = root.find("Raster_Dimensions")
    info = {
        "ncols": int(dims.findtext("NCOLS")) if dims is not None
        else None,
        "nrows": int(dims.findtext("NROWS")) if dims is not None
        else None,
        "nbands": int(dims.findtext("NBANDS") or 1)
        if dims is not None else 1,
    }
    href = None
    df = root.find("Data_Access/Data_File/DATA_FILE_PATH")
    if df is not None:
        href = df.get("href") or (df.text or "").strip()
    info["data_file"] = os.path.join(base, href) if href else None
    # metadata translation (flatten leaf elements of each subtree)
    md = {}
    for subtree, prefix in _MD_TRANSLATION:
        parent = root.find(subtree)
        if parent is None:
            continue
        for child in parent:
            if len(child) == 0 and child.text and child.text.strip():
                md[prefix + child.tag] = child.text.strip()
    info["metadata"] = md
    # CRS
    info["crs"] = root.findtext(
        "Coordinate_Reference_System/Horizontal_CS/"
        "HORIZONTAL_CS_CODE")
    # pixel origin: RASTER_CS POINT / PIXEL_ORIGIN 1 → tie points are
    # pixel centers numbered from 1
    origin = float(root.findtext("Raster_CS/PIXEL_ORIGIN") or 1)
    gcps = []
    for tp in root.findall("Geoposition/Geoposition_Points/Tie_Point"):
        gcps.append({
            "pixel": float(tp.findtext("TIE_POINT_DATA_X"))
            - origin + 0.5,
            "line": float(tp.findtext("TIE_POINT_DATA_Y"))
            - origin + 0.5,
            "x": float(tp.findtext("TIE_POINT_CRS_X")),
            "y": float(tp.findtext("TIE_POINT_CRS_Y")),
            "z": float(tp.findtext("TIE_POINT_CRS_Z") or 0.0),
        })
    info["gcps"] = gcps
    info["gcp_crs"] = info["crs"]
    # explicit geotransform when the document carries Geoposition_Insert
    ins = root.find("Geoposition/Geoposition_Insert")
    gt = None
    if ins is not None:
        ulx = float(ins.findtext("ULXMAP"))
        uly = float(ins.findtext("ULYMAP"))
        xdim = float(ins.findtext("XDIM"))
        ydim = float(ins.findtext("YDIM"))
        gt = (ulx - xdim / 2, xdim, 0.0, uly + ydim / 2, 0.0, -ydim)
    info["geotransform"] = gt
    return info


def read_dimap(path):
    """DIMAP dataset → ``(array [bands, h, w], geotransform | None,
    nodata | None)``; imagery is opened by content sniff (TIFF or a
    VRT wrapper, like the reference's GDALOpen of the href)."""
    info = dimap_info(path)
    fp = info["data_file"]
    if fp is None or not os.path.exists(fp):
        raise FileNotFoundError(
            f"DIMAP imagery file missing: {fp!r}")
    with open(fp, "rb") as f:
        head = f.read(8)
    if head[:2] in (b"II", b"MM"):
        img = read_tiff(open(fp, "rb").read())
        arr = np.stack(img.bands)
        gt = info["geotransform"] or img.geotransform
        nodata = img.nodata
    else:
        arr, vgt, nodata = read_vrt(fp)
        gt = info["geotransform"] or vgt
    return arr, gt, nodata
