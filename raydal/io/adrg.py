"""ADRG (ARC Digitized Raster Graphics) reader over the repo's own
ISO 8211 parser.

Reference driver: ``frmts/adrg/adrgdataset.cpp`` — a ``.GEN`` ISO
8211 module holding a ``GIN`` record (``DSI`` product/name, ``GEN``
georeferencing: ARV/BRV pixel densities, LSO/PSO origin in
``±DDDMMSS.SS`` strings, ZNA zone, ``SPR`` tile grid NFL×NFC of
128×128 pages, ``BAD`` image file, optional ``TIM`` tile index), and
a ``.IMG`` file whose payload (after its own 8211 header, located by
scanning for the ``IMG`` field terminator, ``adrgdataset.cpp:
686-737``) is band-sequential R,G,B 128×128 tiles.  ``TRANSH01.THF``
transmittal headers open the sibling GEN.

Geotransform per zone (``adrgdataset.cpp:758-812``): ZNA 9/18 are
the ARC polar Azimuthal-Equidistant cases, others are geographic
``(LSO, 360/ARV, 0, PSO, 0, -360/BRV)``.

Validated against ``autotest/gdrivers/adrg.py`` (checksum 62833 via
GEN, THF and explicit-IMG paths; ZNA 9/18 geotransforms).
"""

from __future__ import annotations

import math
import os

import numpy as np

from .iso8211 import ISO8211File

__all__ = ["read_adrg", "adrg_info"]

_DEG_M = 111319.4907933
_CIRC = 40075016.68558


def _lon(s):
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:4]) + float(s[4:6]) / 60
                   + float(s[6:11]) / 3600)


def _lat(s):
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:3]) + float(s[3:5]) / 60
                   + float(s[5:10]) / 3600)


def _first(rec, tag):
    v = rec.get(tag)
    if not v:
        return None
    inst = v[0]
    return inst[0] if isinstance(inst, list) and inst else inst


def adrg_info(gen_path):
    """GEN file → dict (nfl, nfc, img path, tile index,
    geotransform, zna, sca, name)."""
    p = str(gen_path)
    if p.upper().endswith(".THF"):
        d = os.path.dirname(os.path.abspath(p))
        gens = [f for f in sorted(os.listdir(d))
                if f.upper().endswith(".GEN")]
        if not gens:
            raise FileNotFoundError("THF without sibling .GEN")
        p = os.path.join(d, gens[0])
    mod = ISO8211File(p)
    rec = None
    for r in mod.records:
        rty = _first(r, "001")
        if rty and rty.get("RTY") == "GIN" and "GEN" in r \
                and "SPR" in r:
            rec = r
            break
    if rec is None:
        raise ValueError("no GIN record in ADRG GEN file")
    gen = _first(rec, "GEN")
    spr = _first(rec, "SPR")
    if int(spr["PNC"]) != 128 or int(spr["PNL"]) != 128:
        raise ValueError("ADRG pages must be 128x128")
    arv, brv = int(gen["ARV"]), int(gen["BRV"])
    lso, pso = _lon(gen["LSO"]), _lat(gen["PSO"])
    zna = int(gen.get("ZNA", 1))
    nfl, nfc = int(spr["NFL"]), int(spr["NFC"])
    bad = str(spr["BAD"]).split()[0]
    tile_index = None
    if str(spr.get("TIF", "N")).startswith("Y") and "TIM" in rec:
        tim = rec["TIM"][0]
        tile_index = [int(t["TSI"]) for t in tim]
    if zna == 9:                            # North Polar ARC
        gt = (_DEG_M * (90.0 - pso) * math.sin(math.radians(lso)),
              _CIRC / arv, 0.0,
              -_DEG_M * (90.0 - pso) * math.cos(math.radians(lso)),
              0.0, -_CIRC / arv)
    elif zna == 18:                         # South Polar ARC
        gt = (_DEG_M * (90.0 + pso) * math.sin(math.radians(lso)),
              _CIRC / arv, 0.0,
              _DEG_M * (90.0 + pso) * math.cos(math.radians(lso)),
              0.0, -_CIRC / arv)
    else:
        gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
    img = os.path.join(os.path.dirname(os.path.abspath(p)), bad)
    if not os.path.exists(img):             # case-insensitive lookup
        d = os.path.dirname(img)
        for f in os.listdir(d):
            if f.lower() == bad.lower():
                img = os.path.join(d, f)
                break
    return {"gen": p, "img": img, "nfl": nfl, "nfc": nfc,
            "tile_index": tile_index, "geotransform": gt,
            "zna": zna, "sca": int(gen.get("SCA", 0)),
            "name": _first(rec, "DSI")["NAM"]}


def _img_data_offset(buf):
    """Scan the IMG's leading 8211 header for the IMG field start
    (adrgdataset.cpp:686-737): a 0x1e terminator followed by 'IMG',
    then 7 bytes + any padding spaces."""
    i = 0
    n = len(buf)
    while i < n:
        if buf[i] == 30 and buf[i + 1:i + 4] == b"IMG":
            i += 1 + 3 + 4 + 3
            while i < n and buf[i] == 0x20:
                i += 1
            return i + 1
        i += 1
    raise ValueError("no IMG field in ADRG .IMG file")


def read_adrg(path, img_path=None):
    """GEN/THF (or GEN + explicit IMG) → ``(array [3, h, w] uint8
    RGB, geotransform, None)``."""
    info = adrg_info(path)
    img = img_path or info["img"]
    with open(img, "rb") as f:
        buf = f.read()
    off = _img_data_offset(buf)
    nfl, nfc = info["nfl"], info["nfc"]
    out = np.zeros((3, nfl * 128, nfc * 128), np.uint8)
    tsize = 128 * 128 * 3
    for block in range(nfl * nfc):
        if info["tile_index"] is not None:
            tsi = info["tile_index"][block]
            if tsi <= 0:
                continue
            toff = off + (tsi - 1) * tsize
        else:
            toff = off + block * tsize
        ty, tx = divmod(block, nfc)
        tile = np.frombuffer(buf, np.uint8, count=tsize,
                             offset=toff).reshape(3, 128, 128)
        out[:, ty * 128:(ty + 1) * 128,
            tx * 128:(tx + 1) * 128] = tile
    return out, info["geotransform"], None
