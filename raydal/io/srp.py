"""SRP (ASRP/USRP Standard Raster Product) reader over the repo's
ISO 8211 parser.

Reference driver: ``frmts/adrg/srpdataset.cpp`` — the ADRG sibling:
a ``.GEN`` module whose GIN record carries ``DSI.PRT`` (ASRP/USRP),
``GEN`` georeferencing (ZNA/ARV/BRV/LSO/PSO/LOD/LAD) and an ``SPR``
tile grid of single-band 128×128 pages with ``PCB`` run-length
compression (0 = raw, 8 = count/value byte pairs, 4 = packed
4-bit-count half-byte stream with a row-boundary nibble flush,
``srpdataset.cpp:236-312``); colors come from the sibling ``.QAL``
module's ``COL`` field (CCD → NSR/NSG/NSB).

Geotransforms (``srpdataset.cpp:379-433``): USRP uses LSO/PSO meters
with LOD/LAD spacing; ASRP uses arc-second LSO/PSO with the ZNA 9/18
polar formulas.

Validated against ``autotest/gdrivers/srp.py`` (USRP PCB 0/4/8
checksum 24576, gt (500000, 5, 0, 5000000, 0, -5), 4-entry color
table).
"""

from __future__ import annotations

import math
import os

import numpy as np

from .adrg import _img_data_offset
from .iso8211 import ISO8211File

__all__ = ["read_srp", "srp_info"]

_DEG_M = 111319.4907933
_CIRC = 40075016.68558


def _first(rec, tag):
    v = rec.get(tag)
    if not v:
        return None
    inst = v[0]
    return inst[0] if isinstance(inst, list) and inst else inst


def _ci_path(dirname, base, ext):
    cand = os.path.join(dirname, base + "." + ext)
    if os.path.exists(cand):
        return cand
    for f in os.listdir(dirname):
        root, e = os.path.splitext(f)
        if root.lower() == base.lower() and \
                e.lower() == "." + ext.lower():
            return os.path.join(dirname, f)
    return None


def srp_info(gen_path):
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
        raise ValueError("no GIN record in SRP GEN file")
    dsi = _first(rec, "DSI")
    gen = _first(rec, "GEN")
    spr = _first(rec, "SPR")
    product = str(dsi["PRT"]).strip()
    if int(spr["PNC"]) != 128 or int(spr["PNL"]) != 128:
        raise ValueError("SRP pages must be 128x128")
    pcb, pvb = int(spr.get("PCB", 0)), int(spr.get("PVB", 8))
    if pcb not in (0, 4, 8) or pvb != 8:
        raise NotImplementedError(
            f"SRP PCB={pcb}/PVB={pvb} unsupported (matches the "
            "reference's constraint)")
    zna = int(gen.get("ZNA", 0))
    arv = int(gen.get("ARV", 0) or 0)
    brv = int(gen.get("BRV", 0) or 0)
    lso = float(gen.get("LSO", 0.0))
    pso = float(gen.get("PSO", 0.0))
    lod = float(gen.get("LOD", 0.0))
    lad = float(gen.get("LAD", 0.0))
    if product == "ASRP":
        if zna == 9:
            gt = (_DEG_M * (90.0 - pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  _CIRC / arv, 0.0,
                  -_DEG_M * (90.0 - pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -_CIRC / arv)
        elif zna == 18:
            gt = (_DEG_M * (90.0 + pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  _CIRC / arv, 0.0,
                  _DEG_M * (90.0 + pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -_CIRC / arv)
        else:
            gt = (lso / 3600.0, 360.0 / arv, 0.0, pso / 3600.0,
                  0.0, -360.0 / brv)
    else:                                   # USRP: meters + spacing
        gt = (lso, lod, 0.0, pso, 0.0, -lad)
    nfl, nfc = int(spr["NFL"]), int(spr["NFC"])
    bad = str(spr["BAD"]).split()[0]
    tile_index = None
    if str(spr.get("TIF", "N")).startswith("Y") and "TIM" in rec:
        tile_index = [int(t["TSI"]) for t in rec["TIM"][0]]
    d = os.path.dirname(os.path.abspath(p))
    base = os.path.splitext(os.path.basename(p))[0]
    img = os.path.join(d, bad)
    if not os.path.exists(img):
        for f in os.listdir(d):
            if f.lower() == bad.lower():
                img = os.path.join(d, f)
                break
    # color table + metadata from the .QAL module
    colors = {}
    meta = {"SRP_PRODUCT": product, "SRP_ZNA": zna,
            "SRP_SCA": int(gen.get("SCA", 0) or 0)}
    qal = _ci_path(d, base, "QAL")
    if qal:
        qmod = ISO8211File(qal)
        for r in qmod.records:
            if "COL" in r:
                for item in r["COL"][0]:
                    ccd = int(item["CCD"])
                    if 0 <= ccd <= 255:
                        colors[ccd] = (int(item["NSR"]),
                                       int(item["NSG"]),
                                       int(item["NSB"]))
            if "QSR" in r:
                qsr = _first(r, "QSR")
                if str(qsr.get("QSS", "")).strip():
                    meta["SRP_CLASSIFICATION"] = \
                        str(qsr["QSS"]).strip()
            if "QUV" in r:
                quv = _first(r, "QUV")
                edn = str(quv.get("EDN", "")).strip()
                if edn.isdigit():
                    meta["SRP_EDN"] = int(edn)
                # CDV07/CDV24 on USRP 1.3+; the 1.2 layout packs the
                # dates as "NNN,YYYYMMDD" in DAT1/DAT2
                for new, old, dst in (
                        ("CDV07", "DAT1", "SRP_CREATIONDATE"),
                        ("CDV24", "DAT2", "SRP_REVISIONDATE")):
                    v = str(quv.get(new, "") or "").strip()
                    if v:
                        meta[dst] = v
                        continue
                    v = str(quv.get(old, "") or "").strip()
                    if len(v) >= 12:
                        meta[dst] = v[4:12]
    return {"gen": p, "img": img, "nfl": nfl, "nfc": nfc,
            "pcb": pcb, "tile_index": tile_index,
            "geotransform": gt, "color_table": colors,
            "metadata": meta, "product": product}


def _decode_pcb8(data, out):
    i = 0
    px = 0
    flat = out.ravel()
    n = flat.size
    while px < n:
        count, value = data[i], data[i + 1]
        i += 2
        flat[px:px + count] = value
        px += count


def _decode_pcb4(data, out):
    """PCB 4 (srpdataset.cpp:274-297): 4-bit count + 8-bit value,
    nibble-packed, with a flush byte at 128-pixel row boundaries when
    a half byte is pending."""
    i = 0
    px = 0
    flat = out.ravel()
    n = flat.size
    half = False
    while px < n:
        if px % 128 == 0 and half:
            i += 1
            half = False
            continue
        if half:
            count = data[i] & 0xF
            value = data[i + 1]
            i += 2
            half = False
        else:
            count = data[i] >> 4
            value = ((data[i] & 0xF) << 4) | (data[i + 1] >> 4)
            i += 1
            half = True
        flat[px:px + count] = value
        px += count


def read_srp(path):
    """GEN/THF → ``(array [1, h, w] uint8, geotransform, None)``."""
    info = srp_info(path)
    with open(info["img"], "rb") as f:
        buf = f.read()
    off = _img_data_offset(buf)
    nfl, nfc, pcb = info["nfl"], info["nfc"], info["pcb"]
    out = np.zeros((nfl * 128, nfc * 128), np.uint8)
    for block in range(nfl * nfc):
        tile = np.zeros((128, 128), np.uint8)
        if info["tile_index"] is not None:
            tsi = info["tile_index"][block]
            if tsi <= 0:
                continue
            toff = off + ((tsi - 1) * 128 * 128 if pcb == 0
                          else tsi - 1)
        else:
            toff = off + block * 128 * 128
        if pcb == 0:
            tile = np.frombuffer(buf, np.uint8, count=128 * 128,
                                 offset=toff).reshape(128, 128)
        elif pcb == 8:
            _decode_pcb8(buf[toff:], tile)
        else:
            _decode_pcb4(buf[toff:], tile)
        ty, tx = divmod(block, nfc)
        out[ty * 128:(ty + 1) * 128, tx * 128:(tx + 1) * 128] = tile
    return out[None], info["geotransform"], None
