"""EOSAT FAST Format (Landsat FAST-L7A / IRS Euromap) reader, from
scratch — mirrors ``frmts/raw/fastdataset.cpp``.

* fixed-width ``KEY =value`` admin-record text header,
* band files located via the FILENAME fields, the L7A
  ``BANDS PRESENT`` + ``BAND<n>.DAT`` convention, or the Euromap
  IRS-1C/1D channel-letter conventions (PAN header letter → digit,
  LISS3 header letter → the next four letters; em_names.pdf),
* raw byte/uint16 pixels (OUTPUT BITS PER PIXEL), zero-filled when a
  band file is shorter than the raster (the reference's raw-band
  behavior on placeholder products),
* corner coordinates (13-char values 28 chars after the UL/UR/LL/LR
  markers following "PROJECTION"), zone-million easting strip, and the
  4-corner pixel-center GCP → geotransform fit via
  :func:`raydal.geo.gcp.gcps_to_geotransform`.

Goldens: autotest/gdrivers/fast.py — HPN row checksum 60323, HTM band
2 19110 with gt (528417.25, 30, 0, 7071187, 0, -30), Euromap LISS3 /
PAN geotransforms (rotated affine for n0o0y867.0fl).
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..geo.gcp import gcps_to_geotransform

__all__ = ["read_fast", "fast_info"]


def _value(header: str, name: str, size: int):
    i = header.find(name)
    if i < 0:
        return None
    i += len(name)
    while i < len(header) and header[i] == " ":
        i += 1
    while i < len(header) and header[i] == "=":
        i += 1
    return header[i:i + size].strip()


def _find_file(dirname: str, name: str):
    for cand in (name, name.lower(), name.upper()):
        p = os.path.join(dirname, cand)
        if os.path.exists(p):
            return p
    return None


def fast_info(path):
    header = open(path, "rb").read(4608).decode("latin-1", "replace")
    info = {
        "ACQUISITION_DATE": _value(header, "ACQUISITION DATE", 8),
        "SATELLITE": _value(header, "SATELLITE", 10),
        "SENSOR": _value(header, "SENSOR", 10),
        "BANDS_PRESENT": _value(header, "BANDS PRESENT", 32),
        "BITS": _value(header, "OUTPUT BITS PER PIXEL", 2),
        "PIXELS": _value(header, "PIXELS PER LINE", 5),
        "LINES": (_value(header, "LINES PER BAND", 5) or
                  _value(header, "LINES PER IMAGE", 5)),
        "ZONE": _value(header, "USGS MAP ZONE", 6),
    }
    return info, header


_LISS3_GROUPS = ["02345", "6789a", "bcdef", "ghijk", "lmnop", "qrstu",
                 "vwxyz"]


def _band_files(path, header, info):
    d = os.path.dirname(os.path.abspath(path)) or "."
    files = []
    # 1) explicit FILENAME fields
    for m in re.finditer(r"FILENAME\s*=?\s*", header):
        name = header[m.end():m.end() + 29].strip()
        if name:
            p = _find_file(d, name)
            if p:
                files.append(p)
    if files:
        return files
    sensor = (info.get("SENSOR") or "").upper()
    last = os.path.basename(path)[-1]
    if sensor == "PAN":
        cl = last.lower()
        if "a" <= cl <= "j":
            cand = os.path.basename(path)[:-1] + chr(
                ord(cl) - ord("a") + ord("0"))
            p = _find_file(d, cand)
            if p:
                return [p]
        elif "k" <= cl <= "m":
            cand = os.path.basename(path)[:-1] + chr(
                ord(cl) - ord("k") + ord("n"))
            p = _find_file(d, cand)
            if p:
                return [p]
    elif sensor == "LISS3":
        for grp in _LISS3_GROUPS:
            if last.lower() == grp[0]:
                out = []
                for ch in grp[1:]:
                    cand = os.path.basename(path)[:-1] + ch
                    p = _find_file(d, cand)
                    if p:
                        out.append(p)
                if out:
                    return out
    # 2) L7A BAND<n>.DAT convention
    digits = re.sub(r"\D", "", info.get("BANDS_PRESENT") or "")
    out = []
    for dgt in digits:
        p = _find_file(d, f"BAND{dgt}.DAT")
        if p:
            out.append(p)
    return out


def read_fast(path):
    """→ (array [bands, h, w], geotransform | None, None)."""
    info, header = fast_info(path)
    w = int(info["PIXELS"] or 0)
    h = int(info["LINES"] or 0)
    if w <= 0 or h <= 0:
        raise ValueError("FAST header lacks image dimensions")
    bits = int(info["BITS"] or "8")
    dt = np.dtype(">u2") if bits > 8 else np.dtype("u1")
    bands = _band_files(path, header, info)
    if not bands:
        raise ValueError("no FAST band files found")
    out = np.zeros((len(bands), h, w), dt.newbyteorder("="))
    for i, bf in enumerate(bands):
        raw = np.fromfile(bf, dt, count=w * h)
        flat = out[i].reshape(-1)
        flat[:len(raw)] = raw.astype(dt.newbyteorder("="))

    gt = None
    gi = header.find("PROJECTION")
    if gi >= 0:
        geom = header[gi:]
        corners = {}
        for key in ("UL ", "UR ", "LL ", "LR "):
            j = geom.find(key)
            if j >= 0:
                base = j + len(key) + 28
                try:
                    x = float(geom[base:base + 13])
                    y = float(geom[base + 14:base + 27])
                    corners[key.strip()] = (x, y)
                except ValueError:
                    pass
        if len(corners) == 4 and all(
                v != (0.0, 0.0) for v in corners.values()):
            zone = int(info["ZONE"] or 0)
            cc = {}
            for k, (x, y) in corners.items():
                if x >= 1000000.0:
                    x -= zone * 1000000.0
                cc[k] = (x, y)
            gcps = [
                (0.5, 0.5, *cc["UL"]),
                (w - 0.5, 0.5, *cc["UR"]),
                (w - 0.5, h - 0.5, *cc["LR"]),
                (0.5, h - 0.5, *cc["LL"]),
            ]
            gt = gcps_to_geotransform(gcps)
    return out, gt, None
