"""IHO S-57 ENC vector reader, from scratch on :mod:`raydal.io.iso8211`.

Parity target: the reference's S-57 driver
(``ogr/ogrsf_frmts/s57/s57reader.cpp`` ReadVector/ReadFeature +
AssembleLineGeometry/AssemblePointGeometry/AssembleAreaGeometry,
``ogrs57datasource.cpp`` class-based layer generation,
``s57featuredefns.cpp`` geometry typing).  Semantics re-derived from
the public IHO S-57 edition 3.1 product specification:

* DSPM ``COMF``/``SOMF`` scale divisors for coordinates / soundings,
* vector records VRID (RCNM 110 VI / 120 VC / 130 VE / 140 VF) with
  SG2D/SG3D arrays and VRPT begin/end-node pointers (TOPI 1/2),
* feature records FRID/FOID/ATTF/NATF/FSPT; NAME pointers are 5-byte
  ``B(40)``: RCNM byte + RCID uint32le,
* layer per object class (OBJL → acronym via the public Appendix A
  catalogue in :mod:`raydal.io.s57_catalog`), ordered by OBJL code
  with the DSID header layer first,
* geometry typing: single-primitive 'A' classes → POLYGON, 'P' →
  POINT (SOUNDG → MULTIPOINT Z), 'L' or mixed → per-feature,
* line/area assembly: per-FSPT edge = begin node + SG2D + end node,
  ORNT=2 reverses, chains join end-to-start; areas close rings and
  pick the largest-|area| ring as the exterior.

Goldens: ``autotest/ogr/ogr_s57.py`` layer list/counts and the
published COALNE/M_QUAL/SOUNDG/ROADWY feature WKTs.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from raydal.io.iso8211 import (ISO8211File, _parse_formats, build_ddr,
                               build_record)
from raydal.io.s57_catalog import ATTRIBUTES, OBJECT_CLASSES

__all__ = ["S57File", "read_s57", "s57_layers", "write_s57"]


def _name5(b):
    """B(40) NAME pointer → (RCNM, RCID)."""
    return b[0], int.from_bytes(b[1:5], "little")


def _point_wkb(x, y):
    return b"\x01\x01\x00\x00\x00" + struct.pack("<2d", x, y)


def _linestring_wkb(pts):
    return (b"\x01\x02\x00\x00\x00" + struct.pack("<I", len(pts))
            + np.asarray(pts, float).tobytes())


def _multilinestring_wkb(lines):
    return (b"\x01\x05\x00\x00\x00" + struct.pack("<I", len(lines))
            + b"".join(_linestring_wkb(ln) for ln in lines))


def _polygon_wkb(rings):
    out = [b"\x01\x03\x00\x00\x00", struct.pack("<I", len(rings))]
    for r in rings:
        out.append(struct.pack("<I", len(r)))
        out.append(np.asarray(r, float).tobytes())
    return b"".join(out)


def _multipoint_z_wkb(pts):
    # EWKB-free ISO multipoint Z (1004), point Z members (1001)
    out = [b"\x01", struct.pack("<II", 1004, len(pts))]
    for x, y, z in pts:
        out.append(b"\x01" + struct.pack("<I3d", 1001, x, y, z))
    return b"".join(out)


class S57File:
    """Parsed S-57 module: spatial primitives + feature records."""

    def __init__(self, src, apply_updates=True):
        mod = ISO8211File(src)
        self.dsid = {}
        self.dssi = {}
        self.comf = 1.0
        self.somf = 1.0
        # (rcnm, rcid) → {"coords": [(x, y)], "z": [v], "vrpt": [...]}
        self.nodes = {}
        self._fe = {}                 # feature RCID → feature dict
        self.nall = 1
        self._ingest(mod)
        if apply_updates and isinstance(src, str) and \
                src.endswith(".000"):
            import os
            i = 1
            while True:
                up = src[:-3] + "%03d" % i
                if not os.path.exists(up):
                    break
                self._apply_updates(ISO8211File(up))
                i += 1

    @property
    def features(self):
        return list(self._fe.values())

    def _ingest(self, mod):
        for rec, raw in zip(mod.records, mod.raw):
            if "DSID" in rec:
                self.dsid = rec["DSID"][0][0]
                if "DSSI" in rec:
                    self.dssi = rec["DSSI"][0][0]
                    self.nall = self.dssi.get("NALL", 1) or 1
            elif "DSPM" in rec:
                p = rec["DSPM"][0][0]
                self.comf = float(p.get("COMF", 1) or 1)
                self.somf = float(p.get("SOMF", 1) or 1)
            elif "VRID" in rec:
                self._add_vector(rec)
            elif "FRID" in rec:
                self._add_feature(rec, raw)

    # ------------------------------------------------------- updates

    def _apply_updates(self, mod):
        """One update module (.001/.002/…) against the loaded indices
        — ``s57reader.cpp`` ApplyUpdates semantics."""
        for rec, raw in zip(mod.records, mod.raw):
            if "DSID" in rec:
                d = rec["DSID"][0][0]
                edtn = d.get("EDTN")
                if edtn is not None:
                    cur = str(self.dsid.get("EDTN", ""))
                    if cur and edtn not in ("0", cur):
                        return        # edition mismatch: skip file
                    self.dsid["EDTN"] = edtn
                updn = d.get("UPDN")
                if updn is not None:
                    cur = str(self.dsid.get("UPDN", ""))
                    try:
                        if cur and int(cur) + 1 != int(updn):
                            return    # non-sequential update
                    except ValueError:
                        pass
                    self.dsid["UPDN"] = updn
                if d.get("ISDT") is not None:
                    self.dsid["ISDT"] = d["ISDT"]
            elif "VRID" in rec:
                self._update_vector(rec)
            elif "FRID" in rec:
                self._update_feature(rec, raw)

    def _update_vector(self, rec):
        v = rec["VRID"][0][0]
        key = (v["RCNM"], v["RCID"])
        ruin = v.get("RUIN", 1)
        if ruin == 1:                 # whole-record insert
            self._add_vector(rec)
            return
        node = self.nodes.get(key)
        if node is None:
            return
        if ruin == 2:                 # whole-record delete
            del self.nodes[key]
            return
        if "SGCC" in rec:             # coordinate splice
            c = rec["SGCC"][0][0]
            new_xy = []
            new_z = []
            for inst in rec.get("SG2D", []):
                for g in inst:
                    new_xy.append((g["XCOO"] / self.comf,
                                   g["YCOO"] / self.comf))
            for inst in rec.get("SG3D", []):
                for g in inst:
                    new_xy.append((g["XCOO"] / self.comf,
                                   g["YCOO"] / self.comf))
                    new_z.append(g["VE3D"] / self.somf)
            self._splice(node["coords"], c.get("CCUI", 3),
                         c.get("CCIX", 1), c.get("CCNC", 0), new_xy)
            if new_z or node["z"]:
                self._splice(node["z"], c.get("CCUI", 3),
                             c.get("CCIX", 1), c.get("CCNC", 0), new_z)
        if "VRPC" in rec:             # pointer splice
            c = rec["VRPC"][0][0]
            ptrs = []
            for inst in rec.get("VRPT", []):
                for g in inst:
                    rcnm, rcid = _name5(g["NAME"])
                    ptrs.append({"rcnm": rcnm, "rcid": rcid,
                                 "ornt": g.get("ORNT", 255),
                                 "usag": g.get("USAG", 255),
                                 "topi": g.get("TOPI", 255),
                                 "mask": g.get("MASK", 255)})
            self._splice(node["vrpt"], c.get("VPUI", 3),
                         c.get("VPIX", 1), c.get("NVPT", 0), ptrs)

    def _update_feature(self, rec, raw):
        f0 = rec["FRID"][0][0]
        rcid = f0["RCID"]
        ruin = f0.get("RUIN", 1)
        if ruin == 1:
            self._add_feature(rec, raw)
            return
        tgt = self._fe.get(rcid)
        if tgt is None:
            return
        if ruin == 2:
            del self._fe[rcid]
            return
        tgt["RVER"] = (tgt.get("RVER") or 1) + 1
        # attribute replace-or-append; ATVL 0x7F deletes
        upd = {}
        if self.nall == 2 and raw is not None and "NATF" in raw:
            for body in raw["NATF"]:
                for code, sval in self._natf_ll2(body):
                    upd[code] = sval
        natf_tags = () if self.nall == 2 else ("NATF",)
        for tag in ("ATTF",) + natf_tags:
            for inst in rec.get(tag, []):
                for g in inst:
                    upd[g["ATTL"]] = g["ATVL"]
        for code, sval in upd.items():
            name, typ = ATTRIBUTES.get(code, (f"ATTR_{code}", "S"))
            if sval == "\x7f":
                tgt["attrs"].pop(name, None)
                continue
            tgt["attrs"][name] = self._attr_value(sval, typ)
        if "FSPC" in rec:
            c = rec["FSPC"][0][0]
            ptrs = []
            for inst in rec.get("FSPT", []):
                for g in inst:
                    rcnm, rcid2 = _name5(g["NAME"])
                    ptrs.append({"rcnm": rcnm, "rcid": rcid2,
                                 "ornt": g.get("ORNT", 255),
                                 "usag": g.get("USAG", 255),
                                 "mask": g.get("MASK", 255)})
            self._splice(tgt["fspt"], c.get("FSUI", 3),
                         c.get("FSIX", 1), c.get("NSPT", 0), ptrs)

    @staticmethod
    def _splice(lst, mode, ix, n, new):
        i = ix - 1
        if mode == 1:                 # insert before index
            lst[i:i] = new
        elif mode == 2:               # delete n entries
            del lst[i:i + n]
        else:                         # modify in place
            lst[i:i + len(new)] = new

    # ------------------------------------------------------- vectors

    def _add_vector(self, rec):
        v = rec["VRID"][0][0]
        key = (v["RCNM"], v["RCID"])
        coords = []
        zs = []
        for inst in rec.get("SG2D", []):
            for g in inst:
                coords.append((g["XCOO"] / self.comf,
                               g["YCOO"] / self.comf))
        for inst in rec.get("SG3D", []):
            for g in inst:
                coords.append((g["XCOO"] / self.comf,
                               g["YCOO"] / self.comf))
                zs.append(g["VE3D"] / self.somf)
        vrpt = []
        for inst in rec.get("VRPT", []):
            for g in inst:
                rcnm, rcid = _name5(g["NAME"])
                vrpt.append({"rcnm": rcnm, "rcid": rcid,
                             "ornt": g.get("ORNT", 255),
                             "usag": g.get("USAG", 255),
                             "topi": g.get("TOPI", 255),
                             "mask": g.get("MASK", 255)})
        attrs = {}
        for inst in rec.get("ATTV", []):
            for g in inst:
                attrs[g["ATTL"]] = g["ATVL"]
        self.nodes[key] = {"coords": coords, "z": zs, "vrpt": vrpt,
                           "attrs": attrs}

    # ------------------------------------------------------ features

    @staticmethod
    def _natf_ll2(body):
        """NATF field bytes at lexical level 2: ATTL u16le + UTF-16LE
        text terminated by the 2-byte UT (0x1F 0x00) — S-57 §2.4
        'delimiters are encoded in two bytes at lexical level 2'."""
        out = []
        pos = 0
        n = len(body)
        while pos + 2 <= n:
            attl = int.from_bytes(body[pos:pos + 2], "little")
            pos += 2
            end = pos
            while end + 1 < n and not (body[end] == 0x1F
                                       and body[end + 1] == 0x00):
                end += 2
            out.append((attl,
                        body[pos:end].decode("utf-16-le", "replace")))
            pos = end + 2
        return out

    def _add_feature(self, rec, raw=None):
        f = dict(rec["FRID"][0][0])
        foid = rec.get("FOID", [[{}]])[0][0]
        f["AGEN"] = foid.get("AGEN")
        f["FIDN"] = foid.get("FIDN")
        f["FIDS"] = foid.get("FIDS")
        if f["AGEN"] is not None:
            f["LNAM"] = "%04X%08X%04X" % (f["AGEN"], f["FIDN"],
                                          f["FIDS"])
        else:
            f["LNAM"] = None
        attrs = {}
        for tag in ("ATTF", "NATF"):
            if tag == "NATF" and self.nall == 2 and raw is not None:
                pairs = []
                for body in raw.get("NATF", []):
                    pairs.extend(self._natf_ll2(body))
            else:
                pairs = [(g["ATTL"], g["ATVL"])
                         for inst in rec.get(tag, []) for g in inst]
            for code, sval in pairs:
                name, typ = ATTRIBUTES.get(code, (f"ATTR_{code}", "S"))
                attrs[name] = self._attr_value(sval, typ)
        f["attrs"] = attrs
        fspt = []
        for inst in rec.get("FSPT", []):
            for g in inst:
                rcnm, rcid = _name5(g["NAME"])
                fspt.append({"rcnm": rcnm, "rcid": rcid,
                             "ornt": g.get("ORNT", 255),
                             "usag": g.get("USAG", 255),
                             "mask": g.get("MASK", 255)})
        f["fspt"] = fspt
        self._fe[f["RCID"]] = f

    @staticmethod
    def _attr_value(sval, typ):
        """ATVL text → typed value per the catalogue attribute type."""
        val = sval.rstrip("\x00")
        if typ in ("I", "E"):
            try:
                return int(val)
            except ValueError:
                return val
        if typ == "F":
            try:
                return float(val)
            except ValueError:
                return val
        if typ == "L":
            return val.split(",")
        return val

    # ------------------------------------------------------ geometry

    def _edge_coords(self, ptr):
        """One FSPT edge pointer → coordinate list (begin node +
        SG2D chain + end node, reversed when ORNT=2)."""
        edge = self.nodes.get((ptr["rcnm"], ptr["rcid"]))
        if edge is None:
            return []
        pts = []
        begin = end = None
        for vp in edge["vrpt"]:
            node = self.nodes.get((vp["rcnm"], vp["rcid"]))
            if node is None or not node["coords"]:
                continue
            if vp["topi"] == 1 and begin is None:
                begin = node["coords"][0]
            elif vp["topi"] == 2:
                end = node["coords"][0]
            elif begin is None:
                begin = node["coords"][0]
            else:
                end = node["coords"][0]
        if begin is not None:
            pts.append(begin)
        pts.extend(edge["coords"])
        if end is not None:
            pts.append(end)
        if ptr["ornt"] == 2:
            pts.reverse()
        return pts

    @staticmethod
    def _join_chains(segs):
        """Edge coordinate lists → joined chains (s57reader.cpp
        AssembleLineGeometry: extend while next begins where the
        current ends, else start a new chain)."""
        chains = []
        cur = []
        for seg in segs:
            if not seg:
                continue
            if not cur:
                cur = list(seg)
            elif cur[-1] == seg[0]:
                cur.extend(seg[1:])
            else:
                chains.append(cur)
                cur = list(seg)
        if cur:
            chains.append(cur)
        return chains

    def geometry_wkb(self, f):
        prim = f.get("PRIM", 255)
        objl = f.get("OBJL", 0)
        acr = OBJECT_CLASSES.get(objl, ("", ""))[0]
        if prim == 1:                           # point
            if acr == "SOUNDG":
                pts = []
                for ptr in f["fspt"]:
                    node = self.nodes.get((ptr["rcnm"], ptr["rcid"]))
                    if node is None:
                        continue
                    for (x, y), z in zip(node["coords"], node["z"]):
                        pts.append((x, y, z))
                return _multipoint_z_wkb(pts) if pts else None
            for ptr in f["fspt"]:
                node = self.nodes.get((ptr["rcnm"], ptr["rcid"]))
                if node and node["coords"]:
                    x, y = node["coords"][0]
                    return _point_wkb(x, y)
            return None
        if prim == 2:                           # line
            segs = [self._edge_coords(p) for p in f["fspt"]]
            chains = self._join_chains(segs)
            if not chains:
                return None
            if len(chains) == 1:
                return _linestring_wkb(chains[0])
            return _multilinestring_wkb(chains)
        if prim == 3:                           # area
            ext_segs = [self._edge_coords(p) for p in f["fspt"]
                        if p["usag"] != 2]
            int_segs = [self._edge_coords(p) for p in f["fspt"]
                        if p["usag"] == 2]
            rings = []
            for group in (ext_segs, int_segs):
                for chain in self._join_chains(group):
                    if len(chain) >= 3:
                        if chain[0] != chain[-1]:
                            chain.append(chain[0])
                        rings.append(chain)
            if not rings:
                return None

            def area(r):
                a = np.asarray(r)
                return abs(np.sum(a[:-1, 0] * a[1:, 1]
                                  - a[1:, 0] * a[:-1, 1]))

            rings.sort(key=area, reverse=True)
            return _polygon_wkb(rings)
        return None

    # -------------------------------------------------------- layers

    def layer_names(self):
        objls = sorted({f["OBJL"] for f in self.features})
        return ["DSID"] + [OBJECT_CLASSES.get(o, (f"O_{o}", ""))[0]
                           for o in objls]

    def layer_geom_type(self, name):
        """GDAL-parity declared geometry type (s57featuredefns.cpp
        S57GenerateObjectClassDefn)."""
        if name == "DSID":
            return "NONE"
        prim = next((p for a, p in OBJECT_CLASSES.values()
                     if a == name), "")
        if name == "SOUNDG":
            return "MULTIPOINT Z"
        if len(prim) != 1:
            return "UNKNOWN" if prim else "NONE"
        return {"P": "POINT", "A": "POLYGON", "L": "UNKNOWN"}[prim[0]]

    def layer_table(self, name):
        if name == "DSID":
            d = {**self.dsid, **self.dssi}
            return pa.table({k: [v] for k, v in d.items()})
        objl = next((c for c, (a, _p) in OBJECT_CLASSES.items()
                     if a == name), None)
        feats = [f for f in self.features if f["OBJL"] == objl]
        cols = {
            "RCID": pa.array([f["RCID"] for f in feats], pa.int64()),
            "PRIM": pa.array([f.get("PRIM") for f in feats],
                             pa.int64()),
            "GRUP": pa.array([f.get("GRUP") for f in feats],
                             pa.int64()),
            "OBJL": pa.array([f["OBJL"] for f in feats], pa.int64()),
            "RVER": pa.array([f.get("RVER") for f in feats],
                             pa.int64()),
            "AGEN": pa.array([f.get("AGEN") for f in feats],
                             pa.int64()),
            "FIDN": pa.array([f.get("FIDN") for f in feats],
                             pa.int64()),
            "FIDS": pa.array([f.get("FIDS") for f in feats],
                             pa.int64()),
            "LNAM": pa.array([f.get("LNAM") for f in feats],
                             pa.string()),
        }
        attr_names = []
        for f in feats:
            for k in f["attrs"]:
                if k not in attr_names:
                    attr_names.append(k)
        for k in attr_names:
            vals = [f["attrs"].get(k) for f in feats]
            sample = next((v for v in vals if v is not None), "")
            if isinstance(sample, list):
                cols[k] = pa.array(
                    [v if v is not None else None for v in vals],
                    pa.list_(pa.string()))
            elif isinstance(sample, int):
                cols[k] = pa.array(vals, pa.int64())
            elif isinstance(sample, float):
                cols[k] = pa.array(vals, pa.float64())
            else:
                cols[k] = pa.array(vals, pa.string())
        cols["wkb"] = pa.array([self.geometry_wkb(f) for f in feats],
                               pa.binary())
        return pa.table(cols)


def s57_layers(src):
    """S-57 file → ordered layer name list (DSID first, then object
    classes by OBJL code)."""
    return S57File(src).layer_names()


def read_s57(src, layer=None):
    """S-57 ENC → pyarrow Table for ``layer``, or dict of all layers
    when ``layer`` is None."""
    f = S57File(src)
    if layer is not None:
        return f.layer_table(layer)
    return {name: f.layer_table(name) for name in f.layer_names()}


# ---------------------------------------------------------------- writer

# The S-57 standard's own field table (edition 3.1 §7.3; identical to
# the DDR every ENC ships, e.g. autotest 1B5X02NE.000).
_DDR_DEFS = [
    ("0001", "0500", "ISO/IEC 8211 Record Identifier", "", "(b12)"),
    ("DSID", "1600", "Data set identification field",
     "RCNM!RCID!EXPP!INTU!DSNM!EDTN!UPDN!UADT!ISDT!STED!PRSP!PSDN!"
     "PRED!PROF!AGEN!COMT",
     "(b11,b14,2b11,3A,2A(8),R(4),b11,2A,b11,b12,A)"),
    ("DSSI", "1600", "Data set structure information field",
     "DSTR!AALL!NALL!NOMR!NOCR!NOGR!NOLR!NOIN!NOCN!NOED!NOFA",
     "(3b11,8b14)"),
    ("DSPM", "1600", "Data set parameter field",
     "RCNM!RCID!HDAT!VDAT!SDAT!CSCL!DUNI!HUNI!PUNI!COUN!COMF!SOMF!"
     "COMT", "(b11,b14,3b11,b14,4b11,2b14,A)"),
    ("VRID", "1600", "Vector record identifier field",
     "RCNM!RCID!RVER!RUIN", "(b11,b14,b12,b11)"),
    ("ATTV", "2600", "Vector record attribute field", "*ATTL!ATVL",
     "(b12,A)"),
    ("VRPT", "2600", "Vector record pointer field",
     "*NAME!ORNT!USAG!TOPI!MASK", "(B(40),4b11)"),
    ("SG2D", "2500", "2-D Coordinate field", "*YCOO!XCOO", "(2b24)"),
    ("SG3D", "2500", "3-D Coordinate (sounding array) field",
     "*YCOO!XCOO!VE3D", "(3b24)"),
    ("FRID", "1600", "Feature record identifier field",
     "RCNM!RCID!PRIM!GRUP!OBJL!RVER!RUIN", "(b11,b14,2b11,2b12,b11)"),
    ("FOID", "1600", "Feature object identifier field",
     "AGEN!FIDN!FIDS", "(b12,b14,b12)"),
    ("ATTF", "2600", "Feature record attribute field", "*ATTL!ATVL",
     "(b12,A)"),
    ("FSPT", "2600", "Feature record to spatial record pointer field",
     "*NAME!ORNT!USAG!MASK", "(B(40),3b11)"),
]

_ACR_TO_CODE = {a: c for c, (a, _t) in ATTRIBUTES.items()}


def _enc_b(v, width):
    size = width % 10
    return int(v).to_bytes(size, "little", signed=width >= 20)


def _enc_sub(v, kind, width):
    if kind == "b":
        return _enc_b(v or 0, width)
    if kind == "B":
        return bytes(v)[: (width + 7) // 8]
    s = "" if v is None else (f"{v}" if not isinstance(v, float)
                              else f"{v:.1f}")
    if width:
        return s.encode("latin-1")[:width].ljust(width)
    return s.encode("latin-1") + b"\x1f"


class _S57Writer:
    def __init__(self):
        self._build_record = build_record
        self.ddr = build_ddr(_DDR_DEFS)
        self.formats = {t: (labels, _parse_formats(f))
                        for t, _c, _n, labels, f in _DDR_DEFS}
        self.recs = []
        self.rid = 0

    def field(self, tag, groups):
        """tag + list of per-group dicts → encoded field bytes."""
        labels, fmts = self.formats[tag]
        labs = [s for s in labels.lstrip("*").split("!") if s] or [""]
        out = bytearray()
        for g in groups:
            for lab, (kind, width) in zip(labs, fmts):
                out += _enc_sub(g.get(lab), kind, width)
        return bytes(out) + b"\x1e"

    def record(self, fields):
        self.rid += 1
        body = [("0001", struct.pack("<H", self.rid & 0xFFFF)
                 + b"\x1e")]
        body += [(t, self.field(t, g)) for t, g in fields]
        self.recs.append(self._build_record(body))

    def tobytes(self):
        return self.ddr + b"".join(self.recs)


def _name5_bytes(rcnm, rcid):
    return bytes([rcnm]) + int(rcid).to_bytes(4, "little")


def write_s57(model, path=None):
    """:class:`S57File` model → S-57 ENC bytes (or file).

    Re-serializes the full vector/feature model — DSID/DSSI/DSPM,
    VI/VC/VE primitives with VRPT topology and SG2D/SG3D arrays,
    FRID/FOID/ATTF/FSPT features — so a read→write→read round trip
    reproduces every layer table (the reference's S57-to-S57
    conversion test, autotest ogr_s57.py test_ogr_s57_write_1)."""
    w = _S57Writer()
    dsid = {"RCNM": 10, "RCID": 1, "EXPP": 1, "INTU": 4,
            "DSNM": "RAYDAL.000", "EDTN": "1", "UPDN": "0",
            "UADT": "20260101", "ISDT": "20260101", "STED": 3.1,
            "PRSP": 1, "PSDN": "", "PRED": "2.0", "PROF": 1,
            "AGEN": 65535, "COMT": ""}
    dsid.update(model.dsid or {})
    nodes = sorted(model.nodes.items())
    feats = model.features
    dssi = {"DSTR": 2, "AALL": 1, "NALL": 1, "NOMR": len(feats),
            "NOCR": 0, "NOGR": 0, "NOLR": 0,
            "NOIN": sum(1 for (r, _i), _n in nodes if r == 110),
            "NOCN": sum(1 for (r, _i), _n in nodes if r == 120),
            "NOED": sum(1 for (r, _i), _n in nodes if r == 130),
            "NOFA": 0}
    dssi.update(model.dssi or {})
    w.record([("DSID", [dsid]), ("DSSI", [dssi])])
    w.record([("DSPM", [{"RCNM": 20, "RCID": 1, "HDAT": 2,
                         "VDAT": 17, "SDAT": 23, "CSCL": 1,
                         "DUNI": 1, "HUNI": 1, "PUNI": 1, "COUN": 1,
                         "COMF": int(model.comf),
                         "SOMF": int(model.somf), "COMT": ""}])])
    for (rcnm, rcid), node in nodes:
        fields = [("VRID", [{"RCNM": rcnm, "RCID": rcid,
                             "RVER": node.get("rver", 1), "RUIN": 1}])]
        if node.get("attrs"):
            fields.append(("ATTV", [{"ATTL": k, "ATVL": v}
                                    for k, v in node["attrs"].items()]))
        if node.get("vrpt"):
            fields.append(("VRPT", [
                {"NAME": _name5_bytes(p["rcnm"], p["rcid"]),
                 "ORNT": p["ornt"], "USAG": p["usag"],
                 "TOPI": p["topi"], "MASK": p["mask"]}
                for p in node["vrpt"]]))
        coords = node["coords"]
        zs = node["z"]
        if zs:
            fields.append(("SG3D", [
                {"YCOO": round(y * model.comf),
                 "XCOO": round(x * model.comf),
                 "VE3D": round(z * model.somf)}
                for (x, y), z in zip(coords, zs)]))
        elif coords:
            fields.append(("SG2D", [
                {"YCOO": round(y * model.comf),
                 "XCOO": round(x * model.comf)}
                for x, y in coords]))
        w.record(fields)
    for f in feats:
        fields = [("FRID", [{"RCNM": 100, "RCID": f["RCID"],
                             "PRIM": f.get("PRIM", 255),
                             "GRUP": f.get("GRUP", 2),
                             "OBJL": f["OBJL"],
                             "RVER": f.get("RVER", 1), "RUIN": 1}])]
        if f.get("AGEN") is not None:
            fields.append(("FOID", [{"AGEN": f["AGEN"],
                                     "FIDN": f["FIDN"],
                                     "FIDS": f["FIDS"]}]))
        attf = []
        for name, val in f["attrs"].items():
            code = _ACR_TO_CODE.get(name)
            if code is None and name.startswith("ATTR_"):
                code = int(name[5:])
            if code is None:
                continue
            if isinstance(val, list):
                val = ",".join(val)
            try:
                f"{val}".encode("latin-1")
            except UnicodeEncodeError:
                continue               # NATF lexical-level-2 payloads
            attf.append({"ATTL": code, "ATVL": val})
        if attf:
            fields.append(("ATTF", attf))
        if f["fspt"]:
            fields.append(("FSPT", [
                {"NAME": _name5_bytes(p["rcnm"], p["rcid"]),
                 "ORNT": p["ornt"], "USAG": p["usag"],
                 "MASK": p["mask"]} for p in f["fspt"]]))
        w.record(fields)
    blob = w.tobytes()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob
