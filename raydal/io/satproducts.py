"""SAR satellite product readers — Sentinel-1 SAFE, RADARSAT-2,
RADARSAT Constellation Mission (RCM) — from scratch.

These products are XML manifests over per-polarization GeoTIFF
measurements; decoding rides on this engine's own TIFF reader.
Semantics mirror the reference drivers, derived from their published
test matrices:

* SAFE (``frmts/sentinel1/safedataset.cpp``,
  ``autotest/gdrivers/safe.py``): bands follow the manifest's
  annotation dataObject order (the fake fixture's band 1 is IW_VH,
  checksum 65372; band 2 IW_VV, 3732); the FOOTPRINT metadata string
  reproduces the reference's exact rendering — coordinates are
  lat,lon in the manifest, swapped to ``lon lat`` and closed with a
  ``", "``-prefixed copy of the first vertex,
* RS2 (``frmts/rs2/rs2dataset.cpp``, ``autotest/gdrivers/rs2.py``):
  bands from ``imageAttributes/fullResolutionImageData`` (pole
  attribute), RPC metadata from
  ``geographicInformation/rationalFunctions`` with the reference's
  RPC key mapping, calibration ``float = (DN² + offset) / gain[col]``
  from the referenced ``lut.xml`` (BETA0/SIGMA0/GAMMA lookupTable
  selected by the ``incidenceAngleCorrection`` attribute;
  test expects uncalibrated cs 4672 → BETA0 cs 4848),
* RCM (``frmts/rcm/rcmdataset.cpp``, ``autotest/gdrivers/rcm.py``):
  opens from the product root dir, ``metadata/`` dir or
  ``product.xml``; bands ordered by ``radarParameters/polarizations``
  (VH VV → band 1 is VH); the full reference metadata dictionary
  (ACQUISITION_START_TIME … SLANT_RANGE_NEAR_EDGE), RPC from
  ``rationalFunctions`` and tie-point GCPs (pixel/line → lon/lat/h).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from .tiff import read_tiff

__all__ = ["read_safe", "read_rs2", "read_rcm"]


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _find_all(root, name):
    return [e for e in root.iter() if _local(e.tag) == name]


def _find(root, name):
    for e in root.iter():
        if _local(e.tag) == name:
            return e
    return None


def _text(root, name, default=None):
    e = _find(root, name)
    return (e.text or "").strip() if e is not None and e.text else default


# ------------------------------------------------------------------ SAFE

def read_safe(path):
    """Sentinel-1 SAFE product (``.SAFE`` dir or ``manifest.safe``) →
    dict with ``bands`` (list of 2-D arrays), ``band_meta``
    (swath/polarisation per band) and ``footprint`` (WKT string in the
    reference's rendering)."""
    if os.path.isdir(path):
        manifest = os.path.join(path, "manifest.safe")
    else:
        manifest = path
    base = os.path.dirname(manifest)
    root = ET.parse(manifest).getroot()

    # annotation hrefs in dataObject order drive the band order
    ann_hrefs = []
    for dobj in _find_all(root, "dataObject"):
        for loc in _find_all(dobj, "fileLocation"):
            href = loc.get("href", "")
            if "/annotation/" in href and href.endswith(".xml") and \
                    "/calibration/" not in href:
                ann_hrefs.append(href)

    bands, meta = [], []
    for href in ann_hrefs:
        ann_path = os.path.normpath(os.path.join(base, href))
        ann = ET.parse(ann_path).getroot()
        pol = _text(ann, "polarisation")
        swath = _text(ann, "swath")
        meas = os.path.normpath(os.path.join(
            base, href.replace("/annotation/", "/measurement/")
            .replace(".xml", ".tiff")))
        img = read_tiff(open(meas, "rb").read())
        bands.append(img.bands[0])
        meta.append({"swath": swath, "polarisation": pol})

    footprint = None
    for e in root.iter():
        if _local(e.tag) == "coordinates" and e.text:
            pairs = []
            for tok in e.text.split():
                lat, lon = tok.split(",")[:2]
                pairs.append(f"{lon} {lat}")
            if pairs:
                footprint = ("POLYGON((" + ",".join(pairs) +
                             ", " + pairs[0] + "))")
            break

    return {"bands": bands, "band_meta": meta, "footprint": footprint}


# ------------------------------------------------------------------- RS2

_RPC_MAP = [
    ("ERR_BIAS", "biasError"), ("ERR_RAND", "randomError"),
    ("LINE_OFF", "lineOffset"), ("SAMP_OFF", "pixelOffset"),
    ("LAT_OFF", "latitudeOffset"), ("LONG_OFF", "longitudeOffset"),
    ("HEIGHT_OFF", "heightOffset"), ("LINE_SCALE", "lineScale"),
    ("SAMP_SCALE", "pixelScale"), ("LAT_SCALE", "latitudeScale"),
    ("LONG_SCALE", "longitudeScale"), ("HEIGHT_SCALE", "heightScale"),
    ("LINE_NUM_COEFF", "lineNumeratorCoefficients"),
    ("LINE_DEN_COEFF", "lineDenominatorCoefficients"),
    ("SAMP_NUM_COEFF", "pixelNumeratorCoefficients"),
    ("SAMP_DEN_COEFF", "pixelDenominatorCoefficients"),
]


def _parse_rpc(root):
    rf = _find(root, "rationalFunctions")
    if rf is None:
        return None
    vals = {_local(e.tag): (e.text or "").strip() for e in rf}
    out = {}
    for key, src in _RPC_MAP:
        if src in vals:
            out[key] = vals[src]
    return out or None


def _parse_lut(path):
    root = ET.parse(path).getroot()
    offset = float(_text(root, "offset", "0") or 0)
    gains = np.array([float(v) for v in
                      (_text(root, "gains", "") or "").split()],
                     dtype=np.float64)
    return offset, gains


def _calibrate(arr, offset, gains):
    g = gains
    if g.size < arr.shape[1]:
        g = np.pad(g, (0, arr.shape[1] - g.size), constant_values=1.0)
    g = g[:arr.shape[1]]
    a = arr.astype(np.float64)
    return ((a * a + offset) / g[None, :]).astype(np.float32)


_CALIB_ATTR = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
               "GAMMA": "Gamma"}


def read_rs2(product_xml, calibration=None):
    """RADARSAT-2 product.xml → dict with ``bands``, ``poles`` and
    ``rpc``.  ``calibration`` in {None/'UNCALIB','BETA0','SIGMA0',
    'GAMMA'} applies the referenced LUT per the reference's
    ``(DN² + offset) / gain`` detected-value path."""
    base = os.path.dirname(product_xml)
    root = ET.parse(product_xml).getroot()

    lut = None
    if calibration and calibration != "UNCALIB":
        want = _CALIB_ATTR.get(calibration)
        if want is None:
            raise ValueError(f"Unsupported calibration type {calibration}")
        for e in _find_all(root, "lookupTable"):
            if e.get("incidenceAngleCorrection") == want:
                lut = _parse_lut(os.path.join(base, (e.text or "").strip()))
                break
        if lut is None:
            raise ValueError(f"no LUT for {calibration}")

    bands, poles = [], []
    for e in _find_all(root, "fullResolutionImageData"):
        img = read_tiff(open(os.path.join(
            base, (e.text or "").strip()), "rb").read())
        arr = img.bands[0]
        if lut is not None:
            arr = _calibrate(arr, *lut)
        bands.append(arr)
        poles.append(e.get("pole"))
    return {"bands": bands, "poles": poles, "rpc": _parse_rpc(root)}


# ------------------------------------------------------------------- RCM

_RCM_MD = [
    # (metadata key, element name)
    ("ACQUISITION_START_TIME", "rawDataStartTime"),
    ("ACQUISITION_TYPE", "acquisitionType"),
    ("BEAMS", "beams"),
    ("BEAM_MODE", "beamMode"),
    ("BEAM_MODE_DEFINITION_ID", "beamModeDefinitionId"),
    ("BEAM_MODE_MNEMONIC", "beamModeMnemonic"),
    ("BITS_PER_SAMPLE", "bitsPerSample"),
    ("DATA_TYPE", "dataType"),
    ("FACILITY_IDENTIFIER", "inputDatasetFacilityId"),
    ("FAR_RANGE_INCIDENCE_ANGLE", "incAngFarRng"),
    ("FIRST_LINE_TIME", "zeroDopplerTimeFirstLine"),
    ("GEODETIC_TERRAIN_HEIGHT", "geodeticTerrainHeight"),
    ("LAST_LINE_TIME", "zeroDopplerTimeLastLine"),
    ("LINE_SPACING", "sampledLineSpacing"),
    ("LINE_TIME_ORDERING", "lineTimeOrdering"),
    ("LUT_APPLIED", "lutApplied"),
    ("NEAR_RANGE_INCIDENCE_ANGLE", "incAngNearRng"),
    ("ORBIT_DATA_FILE", "orbitDataFileName"),
    ("ORBIT_DATA_SOURCE", "orbitDataSource"),
    ("ORBIT_DIRECTION", "passDirection"),
    ("PER_POLARIZATION_SCALING", "perPolarizationScaling"),
    ("PIXEL_SPACING", "sampledPixelSpacing"),
    ("PIXEL_TIME_ORDERING", "pixelTimeOrdering"),
    ("POLARIZATIONS", "polarizations"),
    ("POLARIZATION_DATA_MODE", "polarizationDataMode"),
    ("PROCESSING_FACILITY", "processingFacility"),
    ("PROCESSING_TIME", "processingTime"),
    ("PRODUCT_ID", "productId"),
    ("PRODUCT_TYPE", "productType"),
    ("SAMPLED_LINE_SPACING_TIME", "sampledLineSpacingTime"),
    ("SAMPLED_PIXEL_SPACING_TIME", "sampledPixelSpacingTime"),
    ("SAMPLE_TYPE", "sampleType"),
    ("SATELLITE_HEIGHT", "satelliteHeight"),
    ("SATELLITE_IDENTIFIER", "satellite"),
    ("SECURITY_CLASSIFICATION", "securityClassification"),
    ("SENSOR_IDENTIFIER", "sensor"),
    ("SLANT_RANGE_FAR_EDGE", "slantRangeFarEdge"),
    ("SLANT_RANGE_NEAR_EDGE", "slantRangeNearEdge"),
]


def read_rcm(path, calibration=None, load_pixels=True):
    """RCM product (root dir / ``metadata`` dir / ``product.xml``) →
    dict with ``bands``, ``poles``, ``size`` (xml-declared W,H),
    ``metadata`` (the reference's key set), ``rpc`` and ``gcps``."""
    if os.path.isdir(path):
        cand = os.path.join(path, "product.xml")
        if not os.path.exists(cand):
            cand = os.path.join(path, "metadata", "product.xml")
        product_xml = cand
    else:
        product_xml = path
    if not os.path.exists(product_xml):
        raise FileNotFoundError(product_xml)
    base = os.path.dirname(product_xml)
    root = ET.parse(product_xml).getroot()

    md = {}
    for key, elem in _RCM_MD:
        v = _text(root, elem)
        if v is not None:
            md[key] = v

    pols = (md.get("POLARIZATIONS") or "").split()
    ipdf = {e.get("pole"): (e.text or "").strip()
            for e in _find_all(root, "ipdf")}
    # LUT metadata lists per-band calibration files in band order
    cal_dir = os.path.join(base, "calibration")
    for key, stem in [("BETA_NOUGHT_LUT", "lutBeta"),
                      ("SIGMA_NOUGHT_LUT", "lutSigma"),
                      ("GAMMA_LUT", "lutGamma")]:
        files = [os.path.join(cal_dir, f"{stem}_{p}.xml") for p in pols]
        if all(os.path.exists(f) for f in files):
            md[key] = ",".join(files)

    w = int(_text(root, "samplesPerLine", "0") or 0)
    h = int(_text(root, "numLines", "0") or 0)

    lut = None
    if calibration and calibration != "UNCALIB":
        stem = {"BETA0": "lutBeta", "SIGMA0": "lutSigma",
                "GAMMA": "lutGamma"}.get(calibration)
        if stem is None:
            raise ValueError(f"Unsupported calibration type {calibration}")
        lut = stem

    bands, poles = [], []
    for p in pols:
        href = ipdf.get(p)
        if href is None:
            continue
        poles.append(p)
        if not load_pixels:
            bands.append(None)
            continue
        img = read_tiff(open(os.path.normpath(
            os.path.join(base, href)), "rb").read())
        arr = img.bands[0]
        if lut is not None:
            off, gains = _parse_lut(os.path.join(cal_dir,
                                                 f"{lut}_{p}.xml"))
            arr = _calibrate(arr, off, gains)
        bands.append(arr)

    gcps = []
    for tp in _find_all(root, "imageTiePoint"):
        vals = {_local(e.tag): (e.text or "").strip()
                for e in tp.iter() if e is not tp and e.text}
        try:
            gcps.append({
                "pixel": float(vals["pixel"]), "line": float(vals["line"]),
                "x": float(vals["longitude"]), "y": float(vals["latitude"]),
                "z": float(vals.get("height", 0) or 0)})
        except (KeyError, ValueError):
            pass

    return {"bands": bands, "poles": poles, "size": (w, h),
            "metadata": md, "rpc": _parse_rpc(root), "gcps": gcps,
            "gcp_crs": "EPSG:4326"}
