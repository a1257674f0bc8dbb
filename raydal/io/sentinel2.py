"""Sentinel-2 L1C product reader, from scratch.

Mirrors the reference's SENTINEL2 driver
(``frmts/sentinel2/sentinel2dataset.cpp``) semantics for the L1C
User Product layout, derived from its published test matrix
(``autotest/gdrivers/sentinel2.py`` test_sentinel2_l1c_1/2):

* the product MTD XML yields the reference's exact metadata
  dictionary (PRODUCT_START_TIME … SPECIAL_VALUE_*, DATATAKE_1_*,
  quality flags, FOOTPRINT from EXT_POS_LIST lat,lon swapped),
* subdatasets: one per distinct resolution (10/20/60 m) and EPSG
  code, plus a PREVIEW entry; descriptions sort band names naturally
  (``Bands B2, B3, B4, B8 with 10m resolution``),
* a subdataset mosaics every granule's JP2 tiles into one grid:
  geotransform from the min ULX / max ULY across granules, each tile
  placed at ((ULX−minULX)/XDIM, (maxULY−ULY)/|YDIM|) —
  the fixture's 10m grid is 20984×20980 with tile 2 at
  (10004, 10000),
* band order: zero-padded band numbers sorted ascending, then
  B2,B3,B4 swapped to B4,B3,B2 when they lead (RGB display order);
  per-band metadata (WAVELENGTH/BANDWIDTH from the public band
  table, SOLAR_IRRADIANCE per bandId from the XML),
* decoding rides on this engine's from-scratch JPEG 2000 codec.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from .jp2 import decode_jp2
from .tiff import read_tiff

__all__ = ["read_sentinel2_product", "read_sentinel2_subdataset",
           "S2_BANDS"]

# (name, resolution m, wavelength nm, bandwidth nm, color interp)
S2_BANDS = {
    "B1": (60, 443, 20, "coastal"), "B2": (10, 490, 65, "blue"),
    "B3": (10, 560, 35, "green"), "B4": (10, 665, 30, "red"),
    "B5": (20, 705, 15, "rededge"), "B6": (20, 740, 15, "rededge"),
    "B7": (20, 783, 20, "rededge"), "B8": (10, 842, 115, "nir"),
    "B8A": (20, 865, 20, "nir"), "B9": (60, 945, 20, "nir"),
    "B10": (60, 1375, 30, "otherir"), "B11": (20, 1610, 90, "swir"),
    "B12": (20, 2190, 180, "swir"),
}


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _find(root, name):
    for e in root.iter():
        if _local(e.tag) == name:
            return e
    return None


def _text(root, name, default=None):
    e = _find(root, name)
    return (e.text or "").strip() if e is not None and e.text else default


def _pad(name):
    """B8A → '08A', B2 → '02' (the reference's sortable form)."""
    m = re.fullmatch(r"B(\d+)(A?)", name)
    return f"{int(m.group(1)):02d}{m.group(2)}"


def _band_name(padded):
    s = padded.lstrip("0")
    return "B" + (s if s else "0")


def read_sentinel2_product(mtd_xml):
    """L1C product MTD XML → dict with ``metadata`` (the reference's
    key set), ``subdatasets`` and ``granules``."""
    root = ET.parse(mtd_xml).getroot()
    base = os.path.dirname(mtd_xml)

    md = {}
    for key in ("PRODUCT_START_TIME", "PRODUCT_STOP_TIME",
                "PROCESSING_LEVEL", "PRODUCT_TYPE",
                "PROCESSING_BASELINE", "GENERATION_TIME",
                "PREVIEW_IMAGE_URL", "PREVIEW_GEO_INFO"):
        v = _text(root, key)
        if v:
            md[key] = v

    dt = _find(root, "Datatake")
    if dt is not None:
        md["DATATAKE_1_ID"] = dt.get("datatakeIdentifier", "")
        for src, key in [("SPACECRAFT_NAME", "SPACECRAFT_NAME"),
                         ("DATATAKE_TYPE", "DATATAKE_TYPE"),
                         ("DATATAKE_SENSING_START",
                          "DATATAKE_SENSING_START"),
                         ("SENSING_ORBIT_NUMBER", "SENSING_ORBIT_NUMBER"),
                         ("SENSING_ORBIT_DIRECTION",
                          "SENSING_ORBIT_DIRECTION")]:
            v = _text(dt, src)
            if v:
                md[f"DATATAKE_1_{key}"] = v

    for sv in root.iter():
        if _local(sv.tag) == "Special_Values":
            txt = _text(sv, "SPECIAL_VALUE_TEXT")
            idx = _text(sv, "SPECIAL_VALUE_INDEX")
            if txt and idx is not None:
                md[f"SPECIAL_VALUE_{txt}"] = idx

    qv = _find(root, "QUANTIFICATION_VALUE")
    if qv is not None and qv.text:
        md["QUANTIFICATION_VALUE"] = qv.text.strip()
    u = _text(root, "U")
    if u:
        md["REFLECTANCE_CONVERSION_U"] = u
    ref_band = _text(root, "REFERENCE_BAND")
    if ref_band is not None:
        names = list(S2_BANDS)
        try:
            md["REFERENCE_BAND"] = names[int(ref_band)]
        except (ValueError, IndexError):
            md["REFERENCE_BAND"] = ref_band

    cca = _text(root, "Cloud_Coverage_Assessment")
    if cca:
        md["CLOUD_COVERAGE_ASSESSMENT"] = cca
    for key in ("DEGRADED_ANC_DATA_PERCENTAGE",
                "DEGRADED_MSI_DATA_PERCENTAGE",
                "SENSOR_QUALITY_FLAG", "GEOMETRIC_QUALITY_FLAG",
                "GENERAL_QUALITY_FLAG", "FORMAT_CORRECTNESS_FLAG",
                "RADIOMETRIC_QUALITY_FLAG"):
        v = _text(root, key)
        if v:
            md[key] = v

    ext = _text(root, "EXT_POS_LIST")
    if ext:
        vals = ext.split()
        pairs = [f"{vals[i + 1]} {vals[i]}"
                 for i in range(0, len(vals) - 1, 2)]
        md["FOOTPRINT"] = "POLYGON((" + ", ".join(pairs) + "))"

    irradiance = {}
    for e in root.iter():
        if _local(e.tag) == "SOLAR_IRRADIANCE" and e.get("bandId"):
            irradiance[int(e.get("bandId"))] = (
                (e.text or "").strip(), e.get("unit", ""))

    granules = []
    for e in root.iter():
        if _local(e.tag) == "Granules" or (
                _local(e.tag) == "Granule" and e.get("granuleIdentifier")):
            gid = e.get("granuleIdentifier")
            if gid:
                granules.append(_granule_info(base, gid))

    # subdatasets: distinct (resolution, epsg) over granule bands
    epsgs = sorted({g["epsg"] for g in granules})
    subds = []
    for res in (10, 20, 60):
        bands = sorted((n for n, d in S2_BANDS.items() if d[0] == res),
                       key=_pad)
        for epsg in epsgs:
            zone = epsg % 100
            hemi = "N" if (epsg // 100) % 10 == 6 else "S"
            subds.append({
                "resolution": f"{res}m", "epsg": epsg, "bands": bands,
                "desc": "Bands %s with %dm resolution, UTM %d%s" % (
                    ", ".join(bands), res, zone, hemi)})
    for epsg in epsgs:
        zone, hemi = epsg % 100, "N" if (epsg // 100) % 10 == 6 else "S"
        subds.append({"resolution": "PREVIEW", "epsg": epsg,
                      "bands": [],
                      "desc": f"RGB preview, UTM {zone}{hemi}"})

    return {"metadata": md, "subdatasets": subds, "granules": granules,
            "irradiance": irradiance}


def _granule_info(base, gid):
    gdir = os.path.join(base, "GRANULE", gid)
    stem = re.sub(r"_N[\d.]+$", "", gid)
    mtd = os.path.join(gdir, stem.replace("_MSI_", "_MTD_") + ".xml")
    root = ET.parse(mtd).getroot()
    code = _text(root, "HORIZONTAL_CS_CODE", "EPSG:0")
    epsg = int(code.split(":")[1])
    geo = {}
    for e in root.iter():
        if _local(e.tag) == "Geoposition":
            res = int(e.get("resolution"))
            geo.setdefault(res, {}).update(
                ulx=float(_text(e, "ULX")), uly=float(_text(e, "ULY")),
                xdim=float(_text(e, "XDIM")),
                ydim=float(_text(e, "YDIM")))
        elif _local(e.tag) == "Size":
            res = int(e.get("resolution"))
            geo.setdefault(res, {}).update(
                nrows=int(_text(e, "NROWS")), ncols=int(_text(e, "NCOLS")))
    return {"id": gid, "dir": gdir, "stem": stem, "epsg": epsg,
            "geo": geo}


def _decode_tile(raw):
    """Granule tiles are nominally JP2 but the reference sniffs by
    content (its fake fixtures are TIFFs wearing .jp2 names)."""
    if raw[:4] in (b"II*\x00", b"MM\x00*"):
        return np.asarray(read_tiff(raw).bands[0])
    return np.asarray(decode_jp2(raw))


def read_sentinel2_subdataset(mtd_xml, resolution, epsg,
                              load_pixels=True):
    """One (resolution, EPSG) subdataset → dict with ``size``,
    ``geotransform``, ``band_names`` (display order), ``band_meta``,
    ``placements`` (tile jp2 → dst offset) and, when ``load_pixels``,
    the mosaicked ``data`` array (bands, h, w) decoded through the
    engine's JP2 codec."""
    res = int(str(resolution).rstrip("m"))
    prod = read_sentinel2_product(mtd_xml)
    grans = [g for g in prod["granules"] if g["epsg"] == epsg]
    if not grans or not all(res in g["geo"] for g in grans):
        raise ValueError(f"no granules at {resolution}/EPSG:{epsg}")

    ulxs = [g["geo"][res]["ulx"] for g in grans]
    ulys = [g["geo"][res]["uly"] for g in grans]
    xdim = grans[0]["geo"][res]["xdim"]
    ydim = grans[0]["geo"][res]["ydim"]
    minx, maxy = min(ulxs), max(ulys)
    width = max(int(round((g["geo"][res]["ulx"] - minx) / xdim))
                + g["geo"][res]["ncols"] for g in grans)
    height = max(int(round((maxy - g["geo"][res]["uly"]) / -ydim))
                 + g["geo"][res]["nrows"] for g in grans)
    gt = (minx, xdim, 0.0, maxy, 0.0, ydim)

    padded = sorted(_pad(n) for n, d in S2_BANDS.items() if d[0] == res)
    if padded[:3] == ["02", "03", "04"]:
        padded[0], padded[2] = padded[2], padded[0]   # RGB display order
    band_names = [_band_name(p) for p in padded]

    names = list(S2_BANDS)
    band_meta = []
    for n in band_names:
        resn, wl, bw, ci = S2_BANDS[n]
        meta = {"BANDNAME": n, "WAVELENGTH": str(wl),
                "WAVELENGTH_UNIT": "nm", "BANDWIDTH": str(bw),
                "BANDWIDTH_UNIT": "nm", "colorinterp": ci}
        irr = prod["irradiance"].get(names.index(n))
        if irr:
            meta["SOLAR_IRRADIANCE"] = irr[0]
            meta["SOLAR_IRRADIANCE_UNIT"] = "W/m2/um"
        band_meta.append(meta)

    placements = []
    for g in grans:
        ox = int(round((g["geo"][res]["ulx"] - minx) / xdim))
        oy = int(round((maxy - g["geo"][res]["uly"]) / -ydim))
        for n in band_names:
            jp2 = os.path.join(g["dir"], "IMG_DATA",
                               f"{g['stem']}_{n if len(n) > 2 else 'B0' + n[1]}.jp2")
            placements.append({"band": n, "path": jp2, "xoff": ox,
                               "yoff": oy,
                               "xsize": g["geo"][res]["ncols"],
                               "ysize": g["geo"][res]["nrows"]})

    data = None
    if load_pixels:
        data = np.zeros((len(band_names), height, width),
                        dtype=np.uint16)
        bidx = {n: i for i, n in enumerate(band_names)}
        for pl in placements:
            if not os.path.exists(pl["path"]):
                continue
            arr = _decode_tile(open(pl["path"], "rb").read())
            if arr.ndim == 3:
                arr = arr[0] if arr.shape[0] <= 4 else arr[:, :, 0]
            h = min(arr.shape[0], height - pl["yoff"])
            w = min(arr.shape[1], width - pl["xoff"])
            data[bidx[pl["band"]], pl["yoff"]:pl["yoff"] + h,
                 pl["xoff"]:pl["xoff"] + w] = arr[:h, :w]

    return {"size": (width, height), "geotransform": gt,
            "epsg": epsg, "band_names": band_names,
            "band_meta": band_meta, "placements": placements,
            "data": data, "metadata": prod["metadata"]}
