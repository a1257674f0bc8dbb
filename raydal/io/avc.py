"""Arc/Info Coverage reader — AVCE00 (ASCII .e00) and AVCBin (binary
coverage directory) — from scratch.

Mirrors the reference's AVCE00/AVCBIN drivers
(``ogr/ogrsf_frmts/avc/``) semantics, derived from their published
test matrix (``autotest/ogr/ogr_avc.py``):

* E00 sections parse at the reference's fixed column offsets
  (``avc_e00parse.cpp``): ARC (7 header ints + vertex pairs), LAB
  (value/polyid + coords), PAL (numArcs + MBR + arcId/fNode/adjPoly
  triplets), CNT, and IFO tables (32-char names, field defs at
  offsets 16/21/28/32/34/65, records accumulated over 80-char lines
  with type-specific E00 widths: char=size, fixnum=14, binint4=11,
  binint2=6, binfloat4=14, binfloat8=24),
* binary coverages (``avc_bin.cpp``): big-endian .adf files with a
  100-byte header, arc/lab/pal/cnt record layouts, INFO tables via
  ``info/arc.dir`` (380-byte entries) + ``arcXXXX.nit`` field
  definitions + ``arcXXXX.dat`` records,
* layer model (``ogravclayer.cpp``): ARC → linestrings with
  UserId/FNODE_/TNODE_/LPOLY_/RPOLY_ plus AAT attributes (first four
  AAT fields skipped), LAB → points with ValueId/PolyId plus PAT
  attributes, PAL → polygons (universe polygon skipped, bridge arcs
  whose adjacent polygon is the polygon itself discarded, remaining
  arcs chained into rings) with ArcIds plus PAT attributes,
* ``compressed.e00`` (partial-export archives) are rejected like the
  reference.
"""

from __future__ import annotations

import os
import re
import struct

import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_e00", "read_avcbin"]


# ------------------------------------------------------------------ E00

def _f(line, off, width=14):
    s = line[off:off + width].strip()
    return float(s) if s else 0.0


def _i(line, off, width=10):
    s = line[off:off + width].strip()
    return int(s) if s and s not in ("-",) else 0


def _parse_e00(path):
    with open(path, encoding="latin1") as fh:
        lines = fh.read().splitlines()
    if not lines or not lines[0].startswith("EXP"):
        raise ValueError("not an E00 file")
    if lines[0].startswith("EXP  1") or lines[0].startswith("EXP 1"):
        raise ValueError("compressed E00 is not supported")

    arcs, labs, pals, cnts, tables = {}, [], [], [], {}
    i = 1
    n = len(lines)
    while i < n:
        line = lines[i]
        tok = line[:4].strip()
        if tok == "ARC":
            dbl = _i(line, 4, 4) == 3
            i += 1
            while i < n:
                hdr = lines[i]
                aid = _i(hdr, 0)
                if aid == -1:
                    i += 1
                    break
                user, fn, tn, lp, rp, nv = (_i(hdr, 10), _i(hdr, 20),
                                            _i(hdr, 30), _i(hdr, 40),
                                            _i(hdr, 50), _i(hdr, 60))
                i += 1
                pts = []
                while len(pts) < nv:
                    cl = lines[i]
                    if dbl:
                        pts.append((_f(cl, 0, 21), _f(cl, 21, 21)))
                    else:
                        pts.append((_f(cl, 0), _f(cl, 14)))
                        if len(pts) < nv and len(cl) >= 42:
                            pts.append((_f(cl, 28), _f(cl, 42)))
                    i += 1
                arcs[aid] = {"user": user, "fnode": fn, "tnode": tn,
                             "lpoly": lp, "rpoly": rp, "pts": pts}
        elif tok == "LAB":
            dbl = _i(line, 4, 4) == 3
            i += 1
            while i < n:
                hdr = lines[i]
                val = _i(hdr, 0)
                if val == -1:
                    i += 1
                    break
                poly = _i(hdr, 10)
                if dbl:
                    x, y = _f(hdr, 20, 21), _f(hdr, 41, 21)
                    i += 3                   # box coords on 2 lines
                else:
                    x, y = _f(hdr, 20), _f(hdr, 34)
                    i += 2                   # box coords on 1 line
                labs.append({"value": val, "poly": poly, "x": x, "y": y})
        elif tok == "PAL":
            dbl = _i(line, 4, 4) == 3
            i += 1
            pid = 0
            while i < n:
                hdr = lines[i]
                na = _i(hdr, 0)
                if na == -1:
                    i += 1
                    break
                pid += 1
                i += 1
                if dbl:
                    i += 1                   # max on second line
                trips = []
                remaining = max(na, 1) if na == 0 else na
                if na == 0:
                    remaining = 1            # reference allocs 1 dummy
                vals = []
                while len(vals) < 3 * na:
                    cl = lines[i]
                    for off in (0, 10, 20, 30, 40, 50):
                        if len(vals) >= 3 * na:
                            break
                        if off < len(cl):
                            vals.append(_i(cl, off))
                    i += 1
                for k in range(na):
                    trips.append((vals[3 * k], vals[3 * k + 1],
                                  vals[3 * k + 2]))
                pals.append({"id": pid, "arcs": trips})
        elif tok == "CNT":
            dbl = _i(line, 4, 4) == 3
            i += 1
            while i < n:
                hdr = lines[i]
                nl = _i(hdr, 0)
                if nl == -1:
                    i += 1
                    break
                x, y = (_f(hdr, 10, 21), _f(hdr, 31, 21)) if dbl else \
                    (_f(hdr, 10), _f(hdr, 24))
                i += 1
                ids = []
                while len(ids) < nl:
                    cl = lines[i]
                    for off in range(0, 80, 10):
                        if len(ids) >= nl or off >= len(cl):
                            break
                        ids.append(_i(cl, off))
                    i += 1
                cnts.append({"x": x, "y": y, "labels": ids})
        elif tok == "IFO":
            i += 1
            while i < n and not lines[i].startswith("EOI"):
                name = lines[i][:32].strip()
                if not name:
                    i += 1
                    continue
                numf = _i(lines[i], 34, 4)
                recsz = _i(lines[i], 42, 4)
                numrec = _i(lines[i], 46, 10)
                i += 1
                fields = []
                for _ in range(numf):
                    fl = lines[i]
                    fields.append({
                        "name": fl[:16].strip(),
                        "size": _i(fl, 16, 3),
                        "fmt_width": _i(fl, 28, 4),
                        "fmt_prec": _i(fl, 32, 2),
                        "type": _i(fl, 34, 3) // 10 * 10,
                        "index": _i(fl, 65, 4),
                    })
                    i += 1
                reclen = sum(_e00_width(f) for f in fields)
                records = []
                for _ in range(numrec):
                    buf = ""
                    while len(buf) < reclen and i < n:
                        buf += lines[i].ljust(min(80, reclen - len(buf)))
                        i += 1
                    records.append(_parse_e00_record(buf, fields))
                tables[name.upper()] = {"fields": fields,
                                        "records": records}
            i += 1
        else:
            i += 1
    return {"arcs": arcs, "labs": labs, "pals": pals, "cnts": cnts,
            "tables": tables}


def _e00_width(f):
    t, s = f["type"], f["size"]
    if t in (10, 20, 30):                     # date/char/fixint
        return s
    if t == 40:                               # fixnum
        return 14
    if t == 50:                               # binint
        return 11 if s == 4 else 6
    if t == 60:                               # binfloat
        return 14 if s == 4 else 24
    return s


def _parse_e00_record(buf, fields):
    out, pos = [], 0
    for f in fields:
        w = _e00_width(f)
        chunk = buf[pos:pos + w]
        pos += w
        t = f["type"]
        if t in (10, 20):
            out.append(chunk[:f["size"]].rstrip())
        elif t in (30, 50):
            s = chunk.strip()
            out.append(int(s) if s else 0)
        else:
            s = chunk.strip()
            out.append(float(s) if s else 0.0)
    return out


# --------------------------------------------------------------- AVCBin

def _be_reader(buf):
    class R:
        pos = 0

        @staticmethod
        def i16():
            v = struct.unpack_from(">h", buf, R.pos)[0]
            R.pos += 2
            return v

        @staticmethod
        def i32():
            v = struct.unpack_from(">i", buf, R.pos)[0]
            R.pos += 4
            return v

        @staticmethod
        def f32():
            v = struct.unpack_from(">f", buf, R.pos)[0]
            R.pos += 4
            return v

        @staticmethod
        def f64():
            v = struct.unpack_from(">d", buf, R.pos)[0]
            R.pos += 8
            return v

        @staticmethod
        def raw(n):
            v = buf[R.pos:R.pos + n]
            R.pos += n
            return v

        @staticmethod
        def eof():
            return R.pos >= len(buf)

    return R


def _read_adf(path, kind):
    """arc/lab/pal/cnt .adf file → list of records."""
    buf = open(path, "rb").read()
    rd = _be_reader(buf)
    sig = rd.i32()
    if sig not in (9993, 9994):
        raise ValueError(f"bad coverage file signature {sig}")
    precision = rd.i32()
    dbl = precision < 0 or precision > 1000   # reference's double test
    rd.pos = 100                              # end of header
    coord = rd.f64 if dbl else rd.f32

    out = []
    while not rd.eof():
        try:
            if kind == "arc":
                rd.i32()                      # arc id (record #)
                recsize = rd.i32() * 2
                start = rd.pos
                user, fn, tn, lp, rp, nv = (rd.i32(), rd.i32(),
                                            rd.i32(), rd.i32(),
                                            rd.i32(), rd.i32())
                pts = [(coord(), coord()) for _ in range(nv)]
                rd.pos = start + recsize
                out.append({"user": user, "fnode": fn, "tnode": tn,
                            "lpoly": lp, "rpoly": rp, "pts": pts})
            elif kind == "pal":
                pid = rd.i32()
                recsize = rd.i32() * 2
                start = rd.pos
                coord(), coord(), coord(), coord()   # MBR
                na = rd.i32()
                trips = [(rd.i32(), rd.i32(), rd.i32())
                         for _ in range(na)]
                rd.pos = start + recsize
                out.append({"id": pid, "arcs": trips})
            elif kind == "lab":
                val = rd.i32()
                poly = rd.i32()
                x, y = coord(), coord()
                coord(), coord(), coord(), coord()   # box
                out.append({"value": val, "poly": poly, "x": x, "y": y})
            elif kind == "cnt":
                rd.i32()                      # poly id
                recsize = rd.i32() * 2
                start = rd.pos
                x, y = coord(), coord()
                nl = rd.i32()
                ids = [rd.i32() for _ in range(nl)]
                rd.pos = start + recsize
                out.append({"x": x, "y": y, "labels": ids})
        except struct.error:
            break
    return out


def _read_info_tables(info_dir):
    """info/arc.dir + arcXXXX.nit/.dat → dict name → table."""
    tables = {}
    dirf = None
    for cand in ("arc.dir", "ARC.DIR"):
        p = os.path.join(info_dir, cand)
        if os.path.exists(p):
            dirf = p
            break
    if dirf is None:
        return tables
    buf = open(dirf, "rb").read()
    for off in range(0, len(buf) - 379, 380):
        name = buf[off:off + 32].decode("latin1").strip()
        info_file = buf[off + 32:off + 40].decode("latin1").strip()
        numf, recsz = struct.unpack_from(">hh", buf, off + 40)
        numrec = struct.unpack_from(">i", buf, off + 64)[0]
        external = buf[off + 78:off + 80] == b"XX"
        if not name or numf <= 0:
            continue
        base = info_file.lower()
        nit = os.path.join(info_dir, base + ".nit")
        dat = os.path.join(info_dir, base + ".dat")
        if not (os.path.exists(nit) and os.path.exists(dat)):
            continue
        fields = _read_nit(nit, numf)
        if external:
            # arcXXXX.dat holds an 80-byte path relative to info/
            rel = open(dat, "rb").read(80).decode(
                "latin1").strip().replace("\\", "/")
            dat = os.path.normpath(os.path.join(info_dir, rel))
            if not os.path.exists(dat):
                continue
        records = _read_dat(dat, fields, numrec, recsz)
        tables[name.upper()] = {"fields": fields, "records": records}
    return tables


def _read_nit(path, numf):
    buf = open(path, "rb").read()
    fields = []
    for k in range(numf):
        off = k * 144
        if off + 144 > len(buf):
            break
        name = buf[off:off + 16].decode("latin1").strip()
        size = struct.unpack_from(">h", buf, off + 16)[0]
        fmt_width = struct.unpack_from(">h", buf, off + 26)[0]
        fmt_prec = struct.unpack_from(">h", buf, off + 28)[0]
        type1 = struct.unpack_from(">h", buf, off + 30)[0]
        index = struct.unpack_from(">h", buf, off + 114)[0]
        fields.append({"name": name, "size": size,
                       "fmt_width": fmt_width, "fmt_prec": fmt_prec,
                       "type": type1 * 10, "index": index})
    return fields


def _read_dat(path, fields, numrec, recsz):
    buf = open(path, "rb").read()
    # record size rounded to a multiple of 2 bytes
    rsz = recsz if recsz % 2 == 0 else recsz + 1
    records = []
    for r in range(numrec):
        off = r * rsz
        if off + recsz > len(buf):
            break
        vals, pos = [], off
        for f in fields:
            t, s = f["type"], f["size"]
            if t in (10, 20, 30, 40):
                raw = buf[pos:pos + s].decode("latin1")
                if t in (10, 20):
                    vals.append(raw.rstrip())
                elif t == 30:
                    ss = raw.strip()
                    vals.append(int(ss) if ss else 0)
                else:
                    ss = raw.strip()
                    vals.append(float(ss) if ss else 0.0)
            elif t == 50:
                vals.append(struct.unpack_from(
                    ">i" if s == 4 else ">h", buf, pos)[0])
            elif t == 60:
                vals.append(struct.unpack_from(
                    ">f" if s == 4 else ">d", buf, pos)[0])
            else:
                vals.append(None)
            pos += s
        records.append(vals)
    return records


# -------------------------------------------------------- layer assembly

def _chain_rings(arc_pts):
    """List of arc point-lists → list of closed rings (reference:
    OGRBuildPolygonFromEdges exact-endpoint chaining)."""
    unused = [list(p) for p in arc_pts if len(p) >= 2]
    rings = []
    while unused:
        ring = unused.pop(0)
        extended = True
        while extended and ring[0] != ring[-1]:
            extended = False
            for k, cand in enumerate(unused):
                if cand[0] == ring[-1]:
                    ring.extend(cand[1:])
                elif cand[-1] == ring[-1]:
                    ring.extend(reversed(cand[:-1]))
                elif cand[-1] == ring[0]:
                    ring[0:0] = cand[:-1]
                elif cand[0] == ring[0]:
                    ring[0:0] = list(reversed(cand[1:]))
                else:
                    continue
                unused.pop(k)
                extended = True
                break
        if ring[0] != ring[-1]:
            ring.append(ring[0])
        rings.append(ring)
    return rings


def _poly_wkb(rings):
    polys = []
    for r in rings:
        placed = False
        if len(r) >= 4:
            x0, y0 = r[0]
            for p in polys:
                if bool(W.points_in_ring(p[0], [x0], [y0])[0]):
                    p.append(r)
                    placed = True
                    break
        if not placed:
            polys.append([r])
    if len(polys) == 1:
        return W.polygon_wkb(polys[0])
    return W.multipolygon_wkb(polys)


def _table_arrays(table, skip_aat=False):
    """INFO table → (names, column lists) per the reference's
    AppendTableDefinition rules."""
    names, cols = [], []
    for j, f in enumerate(table["fields"]):
        if f["index"] < 0:
            continue
        if skip_aat and j < 4:
            continue
        name = f["name"].split(" ")[0]
        names.append(name)
        cols.append([rec[j] for rec in table["records"]])
    return names, cols


def _find_table(tables, suffix):
    for name, t in tables.items():
        if name.endswith(suffix):
            return t
    return None


def _build_layers(cov, wkb_col="wkb"):
    layers = {}
    arcs = cov["arcs"]
    tables = cov["tables"]

    if arcs:
        aat = _find_table(tables, ".AAT")
        ids = sorted(arcs)
        arrays = {
            "fid": ids,
            "UserId": [arcs[i]["user"] for i in ids],
            "FNODE_": [arcs[i]["fnode"] for i in ids],
            "TNODE_": [arcs[i]["tnode"] for i in ids],
            "LPOLY_": [arcs[i]["lpoly"] for i in ids],
            "RPOLY_": [arcs[i]["rpoly"] for i in ids],
        }
        t = pa.table({k: pa.array(v) for k, v in arrays.items()})
        if aat and len(aat["records"]) >= len(ids):
            for name, col in zip(*_table_arrays(aat, skip_aat=True)):
                t = t.append_column(name, pa.array(
                    [col[i - 1] for i in ids]))
        t = t.append_column(wkb_col, pa.array(
            [W.linestring_wkb(arcs[i]["pts"]) for i in ids],
            type=pa.binary()))
        layers["ARC"] = t

    if cov["labs"]:
        pat = None if cov["pals"] else _find_table(tables, ".PAT")
        labs = cov["labs"]
        t = pa.table({
            "fid": pa.array([lb["value"] for lb in labs]),
            "ValueId": pa.array([lb["value"] for lb in labs]),
            "PolyId": pa.array([lb["poly"] for lb in labs]),
        })
        if pat and len(pat["records"]) >= len(labs):
            for name, col in zip(*_table_arrays(pat)):
                t = t.append_column(name, pa.array(col[:len(labs)]))
        t = t.append_column(wkb_col, pa.array(
            [W.point_wkb(lb["x"], lb["y"]) for lb in labs],
            type=pa.binary()))
        layers["LAB"] = t

    if cov["pals"]:
        pat = _find_table(tables, ".PAT")
        pals = cov["pals"][1:]                # skip universe polygon
        arc_ids_col, wkbs, fids = [], [], []
        for p in cov["pals"]:
            fids.append(p["id"])
        for p in pals:
            arc_ids_col.append([a for a, _, _ in p["arcs"]])
            pts = []
            for aid, _, adj in p["arcs"]:
                if aid == 0 or adj == p["id"]:
                    continue                  # bridge arcs discarded
                arc = arcs.get(abs(aid))
                if arc is None:
                    continue
                pts.append(arc["pts"])
            wkbs.append(_poly_wkb(_chain_rings(pts)) if pts else None)
        t = pa.table({
            "fid": pa.array([p["id"] for p in pals]),
            "ArcIds": pa.array(arc_ids_col,
                               type=pa.list_(pa.int64())),
        })
        if pat and len(pat["records"]) >= len(cov["pals"]):
            for name, col in zip(*_table_arrays(pat)):
                t = t.append_column(name, pa.array(
                    [col[p["id"] - 1] for p in pals]))
        t = t.append_column(wkb_col, pa.array(wkbs, type=pa.binary()))
        layers["PAL"] = t

    if cov["cnts"]:
        cnts = cov["cnts"]
        t = pa.table({
            "fid": pa.array(list(range(1, len(cnts) + 1))),
            "LabelIds": pa.array([c["labels"] for c in cnts],
                                 type=pa.list_(pa.int64())),
        })
        t = t.append_column(wkb_col, pa.array(
            [W.point_wkb(c["x"], c["y"]) for c in cnts],
            type=pa.binary()))
        layers["CNT"] = t
    return layers


def read_e00(path, wkb_col="wkb"):
    """E00 interchange file → dict of layer name → Arrow table."""
    return _build_layers(_parse_e00(path), wkb_col)


def read_avcbin(path, wkb_col="wkb"):
    """Binary coverage directory → dict of layer name → Arrow
    table.  ``path`` is the coverage dir (containing arc.adf …)."""
    cov_dir = path
    info_dir = os.path.join(os.path.dirname(cov_dir.rstrip("/")),
                            "info")

    def adf(stem):
        for cand in (stem + ".adf", stem.upper() + ".ADF"):
            p = os.path.join(cov_dir, cand)
            if os.path.exists(p):
                return p
        return None

    cov = {"arcs": {}, "labs": [], "pals": [], "cnts": [],
           "tables": {}}
    p = adf("arc")
    if p:
        for k, rec in enumerate(_read_adf(p, "arc")):
            cov["arcs"][k + 1] = rec
    p = adf("lab")
    if p:
        cov["labs"] = _read_adf(p, "lab")
    p = adf("pal")
    if p:
        for k, rec in enumerate(_read_adf(p, "pal")):
            rec["id"] = k + 1
            cov["pals"].append(rec)
    p = adf("cnt")
    if p:
        cov["cnts"] = _read_adf(p, "cnt")
    if os.path.isdir(info_dir):
        cov["tables"] = _read_info_tables(info_dir)
    return _build_layers(cov, wkb_col)
