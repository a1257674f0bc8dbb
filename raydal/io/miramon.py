"""MiraMon structured vector reader (.pnt / .arc / .pol + extended
DBF), from scratch.

Mirrors the reference's MiraMonVector driver
(``ogr/ogrsf_frmts/miramon/``) read semantics, derived from its
published test matrix (``autotest/ogr/ogr_miramon_vector.py``):

* the common topological header (``MMReadHeader``): 7-byte magic
  (``PNT 1.1`` / ``ARC 1.1`` / ``POL 1.1``), flag byte, MBR
  (MinX, MaxX, MinY, MaxY doubles), element count (u32 in version
  1.x, u64 in 2.x) — data starts at offset 48,
* ``.pnt``: (x, y) double pairs follow directly,
* ``.arc``: per-arc headers (BB + vertex count + data offset +
  first/last node + length, ``MMReadAHArcSection``), vertices at the
  stored offsets,
* ``.pol``: per-polygon headers (BB + arc count + external-ring count
  + ring count + offset + perimeter + area); the arc list is
  (VFG flag byte + arc index) pairs where 0x01 marks an exterior
  ring, 0x02 ends a ring and 0x04 reverses the arc's vertices; rings
  concatenate arcs dropping the duplicated join vertex; polygon 0 is
  the universal polygon and is skipped,
* attributes come from the sibling extended DBF (``<base>T.dbf`` /
  ``A.dbf`` / ``P.dbf``): version byte 0x90, zero ``BytesPerField``
  redirects to the u32 at reserved_2+3, long field names resolve
  through the reserved_2+7 offset / +11 size indirection
  (``MM_ReadExtendedDBFHeaderFromFile``).
"""

from __future__ import annotations

import os
import struct

import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_miramon"]


def _read_header(buf):
    magic = buf[:7].decode("latin1")
    ftype, version = magic[:3], magic[4:7]
    mbr = struct.unpack_from("<4d", buf, 8)
    if version.startswith("1"):
        count = struct.unpack_from("<I", buf, 40)[0]
        v2 = False
    else:
        count = struct.unpack_from("<Q", buf, 40)[0]
        v2 = True
    return ftype, v2, mbr, count


def _read_extended_dbf(path):
    """MiraMon extended DBF → (field_names, row dicts)."""
    buf = open(path, "rb").read()
    nrec = struct.unpack_from("<I", buf, 4)[0]
    hdr_size, rec_size = struct.unpack_from("<HH", buf, 8)
    fields = []
    off = 32
    while off + 32 <= len(buf) and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\0")[0].decode("latin1")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        if flen == 0:                         # extended size indirection
            flen = struct.unpack_from("<I", buf, off + 18 + 3)[0]
        ext_off = struct.unpack_from("<I", buf, off + 18 + 7)[0]
        ext_size = buf[off + 18 + 11]
        if ext_off and ext_size and ext_off + ext_size <= len(buf):
            name = buf[ext_off:ext_off + ext_size].decode("latin1")
        fields.append((name, ftype, flen, fdec))
        off += 32

    rows = []
    pos = hdr_size
    for _ in range(nrec):
        if pos + rec_size > len(buf):
            break
        p = pos + 1                           # delete flag
        row = {}
        for name, ftype, flen, fdec in fields:
            raw = buf[p:p + flen].decode("latin1", "replace").strip()
            p += flen
            if ftype in ("N", "F"):
                if not raw:
                    row[name] = None
                elif fdec > 0 or "." in raw or "e" in raw.lower():
                    try:
                        row[name] = float(raw)
                    except ValueError:
                        row[name] = None
                else:
                    try:
                        row[name] = int(raw)
                    except ValueError:
                        row[name] = None
            elif ftype == "L":
                row[name] = (None if raw in ("", "?")
                             else raw in ("Y", "y", "T", "t", "1"))
            else:
                row[name] = raw
        rows.append(row)
        pos += rec_size
    return [f[0] for f in fields], rows


def _attr_table(path, suffix):
    base = os.path.splitext(path)[0]
    for cand in (base + suffix + ".dbf", base + suffix + ".DBF"):
        if os.path.exists(cand):
            return _read_extended_dbf(cand)
    return [], []


def _arc_headers(buf, count, v2):
    """→ list of dicts per MMReadAHArcSection."""
    out = []
    pos = 48
    isz, ifmt = (8, "<Q") if v2 else (4, "<I")
    for _ in range(count):
        bb = struct.unpack_from("<4d", buf, pos)
        pos += 32
        nv = struct.unpack_from(ifmt, buf, pos)[0]
        pos += isz
        off = struct.unpack_from(ifmt, buf, pos)[0]
        pos += isz
        fnode = struct.unpack_from(ifmt, buf, pos)[0]
        pos += isz
        lnode = struct.unpack_from(ifmt, buf, pos)[0]
        pos += isz
        length = struct.unpack_from("<d", buf, pos)[0]
        pos += 8
        out.append({"bb": bb, "nv": nv, "off": off, "fnode": fnode,
                    "lnode": lnode, "length": length})
    return out


def _arc_vertices(buf, hdr):
    return [struct.unpack_from("<2d", buf, hdr["off"] + 16 * i)
            for i in range(hdr["nv"])]


def read_miramon(path, wkb_col="wkb"):
    """MiraMon layer (.pnt / .arc / .pol) → Arrow table (fid,
    attributes..., wkb)."""
    buf = open(path, "rb").read()
    ftype, v2, mbr, count = _read_header(buf)

    if ftype == "PNT":
        pts = [struct.unpack_from("<2d", buf, 48 + 16 * i)
               for i in range(count)]
        wkbs = [W.point_wkb(x, y) for x, y in pts]
        names, rows = _attr_table(path, "T")
        fids = list(range(count))
    elif ftype == "ARC":
        hdrs = _arc_headers(buf, count, v2)
        wkbs = [W.linestring_wkb(_arc_vertices(buf, h)) for h in hdrs]
        names, rows = _attr_table(path, "A")
        fids = list(range(count))
    elif ftype == "POL":
        arc_path = None
        base = os.path.splitext(path)[0]
        for cand in (base + ".arc", base + ".ARC"):
            if os.path.exists(cand):
                arc_path = cand
                break
        if arc_path is None:
            raise ValueError("polygon layer lacks its .arc sibling")
        abuf = open(arc_path, "rb").read()
        _, av2, _, acount = _read_header(abuf)
        ahdrs = _arc_headers(abuf, acount, av2)

        isz, ifmt = (8, "<Q") if v2 else (4, "<I")
        phdrs = []
        # the PS (polygon-side) section — one entry per ARC — precedes
        # the polygon headers (MMReadPHPolygonSection offset math)
        pos = 48 + acount * (16 if v2 else 8)
        for _ in range(count):
            struct.unpack_from("<4d", buf, pos)
            pos += 32
            narcs = struct.unpack_from(ifmt, buf, pos)[0]
            pos += isz
            next_ = struct.unpack_from(ifmt, buf, pos)[0]  # ext rings
            pos += isz
            nrings = struct.unpack_from(ifmt, buf, pos)[0]
            pos += isz
            off = struct.unpack_from(ifmt, buf, pos)[0]
            pos += isz
            perim, area = struct.unpack_from("<2d", buf, pos)
            pos += 16
            phdrs.append({"narcs": narcs, "next": next_,
                          "nrings": nrings, "off": off,
                          "perim": perim, "area": area})

        wkbs, fids = [], []
        for ipol, ph in enumerate(phdrs):
            if ipol == 0:
                continue                      # universal polygon
            rings = []                        # (is_exterior, pts)
            ring = []
            ring_ext = False
            p = ph["off"]
            for _ in range(ph["narcs"]):
                vfg = buf[p]
                p += 1
                (iarc,) = struct.unpack_from(ifmt, buf, p)
                p += isz
                pts = _arc_vertices(abuf, ahdrs[iarc])
                if vfg & 0x04:                # MM_ROTATE_ARC
                    pts = pts[::-1]
                if not ring:
                    ring_ext = bool(vfg & 0x01)   # MM_EXTERIOR_ARC_SIDE
                else:
                    pts = pts[1:]             # drop duplicated join pt
                ring.extend(pts)
                if vfg & 0x02:                # MM_END_ARC_IN_RING
                    if ring and ring[0] != ring[-1]:
                        ring.append(ring[0])
                    rings.append((ring_ext, ring))
                    ring = []
            if ring:
                if ring[0] != ring[-1]:
                    ring.append(ring[0])
                rings.append((ring_ext, ring))
            # exterior rings start polygons; following interiors are
            # their holes (MULTIPOLYGON when several exteriors)
            polys = []
            for ext, r in rings:
                if ext or not polys:
                    polys.append([r])
                else:
                    polys[-1].append(r)
            if not polys:
                wkbs.append(None)
            elif len(polys) == 1:
                wkbs.append(W.polygon_wkb(polys[0]))
            else:
                wkbs.append(W.multipolygon_wkb(polys))
            fids.append(ipol - 1)
        names, rows = _attr_table(path, "P")
        rows = rows[1:] if len(rows) == count else rows
    else:
        raise ValueError(f"unsupported MiraMon file type {ftype!r}")

    if ftype != "POL":
        pass
    arrays = [pa.array(fids, type=pa.int64())]
    col_names = ["fid"]
    n = len(wkbs)
    for name in names:
        vals = [rows[i].get(name) if i < len(rows) else None
                for i in range(n)]
        kinds = {type(v) for v in vals if v is not None}
        if kinds <= {int}:
            arrays.append(pa.array(vals, type=pa.int64()))
        elif kinds <= {int, float}:
            arrays.append(pa.array(
                [None if v is None else float(v) for v in vals],
                type=pa.float64()))
        elif kinds <= {bool}:
            arrays.append(pa.array(vals, type=pa.bool_()))
        else:
            arrays.append(pa.array(
                [None if v is None else str(v) for v in vals],
                type=pa.string()))
        col_names.append(name)
    arrays.append(pa.array(wkbs, type=pa.binary()))
    col_names.append(wkb_col)
    return pa.table(arrays, names=col_names)
