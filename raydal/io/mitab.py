"""MapInfo TAB binary (.tab/.dat/.id/.map) vector reader, from
scratch.

Mirrors the reference's MITAB driver (``ogr/ogrsf_frmts/mitab/``)
semantics, derived from its published test matrix
(``autotest/ogr/ogr_mitab.py`` test_ogr_mitab_41: every feature of
``all_geoms.tab`` must match ``all_geoms.mif.golden.csv`` in both
geometry and style string):

* ``.dat`` is dBASE III (shared parser with the shapefile driver),
  ``.id`` is one uint32 per feature pointing at its object record in
  the ``.map``,
* the ``.map`` header block (magic 42424242 at 0x100,
  ``mitab_mapheaderblock.cpp``) supplies coordinate scale/
  displacement, origin quadrant sign flips and the tool-block chain;
  object blocks (type 2) carry a center for compressed int16 deltas;
  coordinate blocks (type 3) chain via a next-block pointer,
* object records follow ``mitab_mapobjectblock.cpp`` layouts: SYMBOL /
  FONTSYMBOL / CUSTOMSYMBOL points, LINE, PLINE, REGION /
  MULTIPLINE (+V450/V800 wide counts), ARC, RECT / ROUNDRECT /
  ELLIPSE, TEXT, MULTIPOINT and COLLECTION (mini-headers per
  component),
* curve objects synthesize vertices exactly like the reference:
  ``TABGenerateArc`` (numPoints + repeated end point), 180-point
  ellipses, 4×45-point rounded corners, arc angle flips per origin
  quadrant,
* pen/brush/symbol/font definitions parse from tool blocks
  (``mitab_tooldef.cpp``) and render the reference's OGR style
  strings byte-for-byte (PEN/BRUSH/SYMBOL/LABEL formats from
  ``mitab_feature.cpp``).
"""

from __future__ import annotations

import math
import os
import struct

import pyarrow as pa

from ..geo import wkb as W
from .shapefile import _parse_dbf

__all__ = ["read_tab"]

BLK = 512


class _MapFile:
    def __init__(self, buf):
        self.buf = buf
        # ---- header block (offsets per mitab_mapheaderblock.cpp)
        if struct.unpack_from("<i", buf, 0x100)[0] != 42424242:
            raise ValueError("not a MapInfo .map file (bad magic)")
        self.version, self.block_size = struct.unpack_from("<hh", buf,
                                                           0x104)
        self.first_tool_block = struct.unpack_from("<i", buf, 0x138)[0]
        (self.dist_units, self.max_depth, self.coord_precision,
         self.quadrant, self.reflect_x) = struct.unpack_from(
            "<5B", buf, 0x15e)
        self.xscale, self.yscale, self.xdispl, self.ydispl = \
            struct.unpack_from("<4d", buf, 0x170)
        if self.version <= 100:
            self.xscale = self.yscale = 10.0 ** self.coord_precision
            self.xdispl = self.ydispl = 0.0
        # UpdatePrecision(): round to the scale's decade
        self.xprec = 10.0 ** round(math.log10(self.xscale)) \
            if self.xscale > 0 else 0
        self.yprec = 10.0 ** round(math.log10(self.yscale)) \
            if self.yscale > 0 else 0
        self._load_tools()

    # ---- coordinate conversion (Int2Coordsys)
    def int2xy(self, nx, ny):
        if self.quadrant in (0, 2, 3):
            x = -1.0 * (nx + self.xdispl) / self.xscale
        else:
            x = (nx - self.xdispl) / self.xscale
        if self.quadrant in (0, 3, 4):
            y = -1.0 * (ny + self.ydispl) / self.yscale
        else:
            y = (ny - self.ydispl) / self.yscale
        if self.xprec > 0 and self.yprec > 0:
            x = round(x * self.xprec) / self.xprec
            y = round(y * self.yprec) / self.yprec
        return x, y

    def int2dist(self, n, axis="y"):
        return n / (self.yscale if axis == "y" else self.xscale)

    # ---- tool definitions
    def _load_tools(self):
        self.pens, self.brushes, self.symbols, self.fonts = \
            [], [], [], []
        addr = self.first_tool_block
        chunks = []
        while addr > 0:
            btype = self.buf[addr]
            ndata = struct.unpack_from("<h", self.buf, addr + 2)[0]
            nxt = struct.unpack_from("<i", self.buf, addr + 4)[0]
            chunks.append(self.buf[addr + 8:addr + 8 + ndata])
            if btype != 5:
                break
            addr = nxt
        data = b"".join(chunks)
        off = 0
        while off < len(data):
            kind = data[off]
            off += 1
            if kind == 1:                     # PEN
                (width, pattern, pointw) = struct.unpack_from(
                    "<xxxx3B", data, off)
                r, g, b = data[off + 7:off + 10]
                if width > 7:                 # high point-width bits
                    pointw += (width - 8) * 0x100
                    width = 1
                self.pens.append({"pixel_width": width,
                                  "pattern": pattern,
                                  "point_width": pointw,
                                  "color": (r << 16) | (g << 8) | b})
                off += 10
            elif kind == 2:                   # BRUSH
                fill, transparent = data[off + 4], data[off + 5]
                fg = (data[off + 6] << 16) | (data[off + 7] << 8) | \
                    data[off + 8]
                bg = (data[off + 9] << 16) | (data[off + 10] << 8) | \
                    data[off + 11]
                self.brushes.append({"fill": fill,
                                     "transparent": transparent,
                                     "fg": fg, "bg": bg})
                off += 12
            elif kind == 3:                   # FONT name
                name = data[off + 4:off + 36].split(b"\0")[0].decode(
                    "latin1")
                self.fonts.append(name)
                off += 36
            elif kind == 4:                   # SYMBOL
                no, size = struct.unpack_from("<hh", data, off + 4)
                color = (data[off + 9] << 16) | (data[off + 10] << 8) \
                    | data[off + 11]
                self.symbols.append({"no": no, "size": size,
                                     "color": color})
                off += 12
            else:
                break


class _Reader:
    """Sequential reader over the object record bytes."""

    def __init__(self, mf, pos):
        self.mf = mf
        self.pos = pos
        block_start = (pos // BLK) * BLK
        self.center = struct.unpack_from("<ii", mf.buf, block_start + 4)

    def u8(self):
        v = self.mf.buf[self.pos]
        self.pos += 1
        return v

    def i16(self):
        v = struct.unpack_from("<h", self.mf.buf, self.pos)[0]
        self.pos += 2
        return v

    def i32(self):
        v = struct.unpack_from("<i", self.mf.buf, self.pos)[0]
        self.pos += 4
        return v

    def coord(self, compressed):
        if compressed:
            return (self.i16() + self.center[0],
                    self.i16() + self.center[1])
        return self.i32(), self.i32()


class _CoordStream:
    """Walks the chained coordinate blocks starting at an absolute
    file offset (which may point mid-block)."""

    def __init__(self, mf, pos):
        self.mf = mf
        self.pos = pos
        self.org = (0, 0)                    # object's ComprOrg
        self._sync()

    def _sync(self):
        self.block_start = (self.pos // BLK) * BLK
        ndata = struct.unpack_from("<h", self.mf.buf,
                                   self.block_start + 2)[0]
        self.block_end = self.block_start + 8 + ndata
        self.next_block = struct.unpack_from("<i", self.mf.buf,
                                             self.block_start + 4)[0]

    def _advance(self, n):
        out = b""
        while n > 0:
            if self.pos >= self.block_end:
                if self.next_block <= 0:
                    raise ValueError("coord chain exhausted")
                self.pos = self.next_block + 8
                self._sync()
            take = min(n, self.block_end - self.pos)
            out += self.mf.buf[self.pos:self.pos + take]
            self.pos += take
            n -= take
        return out

    def i16(self):
        return struct.unpack("<h", self._advance(2))[0]

    def i32(self):
        return struct.unpack("<i", self._advance(4))[0]

    def bytes(self, n):
        return self._advance(n)

    def coord(self, compressed):
        if compressed:
            return self.i16() + self.org[0], self.i16() + self.org[1]
        return self.i32(), self.i32()


def _generate_arc(num_points, cx, cy, rx, ry, a0, a1):
    """TABGenerateArc parity: numPoints samples + repeated end."""
    if a1 < a0:
        a1 += 2.0 * math.pi
    step = (a1 - a0) / (num_points - 1.0)
    pts = []
    a = a0
    for i in range(num_points):
        a = a0 + i * step
        pts.append((cx + rx * math.cos(a), cy + ry * math.sin(a)))
    pts.append((cx + rx * math.cos(a), cy + ry * math.sin(a)))
    return pts


def _close_ring(pts):
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])
    return pts


def _rings_to_polygons_wkb(rings):
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


_SYM_OGR = {31: 0, 32: 5, 33: 5, 34: 3, 35: 9, 36: 7, 37: 7, 38: 4,
            39: 4, 40: 2, 41: 8, 42: 6, 43: 6, 44: 5, 45: 7, 46: 3,
            49: 0, 50: 1}
_SYM_ANGLE = {33: 45, 37: 180, 39: 45, 43: 180}

_PEN_OGR = {1: (1, ""), 2: (0, ""), 3: (3, "1 1"), 4: (3, "2 1"),
            5: (3, "3 1"), 6: (3, "6 1"), 7: (4, "12 2"),
            8: (4, "24 4"), 9: (3, "4 3"), 10: (5, "1 4"),
            11: (3, "4 6"), 12: (3, "6 4"), 13: (4, "12 12"),
            14: (6, "8 2 1 2"), 15: (6, "12 1 1 1"),
            16: (6, "12 1 3 1"), 17: (6, "24 6 4 6"),
            18: (7, "24 3 3 3 3 3"), 19: (7, "24 3 3 3 3 3 3 3"),
            20: (7, "6 3 1 3 1 3"), 21: (7, "12 2 1 2 1 2"),
            22: (7, "12 2 1 2 1 2 1 2"), 23: (6, "4 1 1 1"),
            24: (7, "4 1 1 1 1"), 25: (6, "4 1 1 1 2 1 1 1")}

_BRUSH_OGR = {1: 1, 3: 2, 4: 3, 5: 5, 6: 4, 7: 6, 8: 7}


def _pen_style(mf, pen_id):
    if pen_id < 1 or pen_id > len(mf.pens):
        return None
    p = mf.pens[pen_id - 1]
    ogr, pattern = _PEN_OGR.get(p["pattern"], (0, ""))
    if p["point_width"] > 0:
        w = "%dpt" % max(1, int(p["point_width"]))
    else:
        w = "%dpx" % p["pixel_width"]
    if pattern:
        return ('PEN(w:%s,c:#%06x,id:"mapinfo-pen-%d,ogr-pen-%d",'
                'p:"%spx",cap:r,j:r)' % (w, p["color"], p["pattern"],
                                         ogr, pattern))
    return ('PEN(w:%s,c:#%06x,id:"mapinfo-pen-%d,ogr-pen-%d",'
            'cap:r,j:r)' % (w, p["color"], p["pattern"], ogr))


def _brush_style(mf, brush_id):
    if brush_id < 1 or brush_id > len(mf.brushes):
        return None
    b = mf.brushes[brush_id - 1]
    ogr = _BRUSH_OGR.get(b["fill"], 0)
    if b["transparent"]:
        return ('BRUSH(fc:#%06x,id:"mapinfo-brush-%d,ogr-brush-%d")'
                % (b["fg"], b["fill"], ogr))
    return ('BRUSH(fc:#%06x,bc:#%06x,id:"mapinfo-brush-%d,'
            'ogr-brush-%d")' % (b["fg"], b["bg"], b["fill"], ogr))


def _symbol_style(mf, sym_id):
    if sym_id < 1 or sym_id > len(mf.symbols):
        return None
    s = mf.symbols[sym_id - 1]
    ogr = _SYM_OGR.get(s["no"], 0)
    angle = _SYM_ANGLE.get(s["no"], 0)
    return ('SYMBOL(a:%d,c:#%06x,s:%dpt,id:"mapinfo-sym-%d,'
            'ogr-sym-%d")' % (angle, s["color"], s["size"], s["no"],
                              ogr))


def _read_object(mf, pos):
    """One object record → (wkb, style string or None)."""
    rd = _Reader(mf, pos)
    otype = rd.u8()
    rd.i32()                                  # object id
    compressed = (otype % 3) == 1             # *_C variants
    if otype in (0x01, 0x02):                 # SYMBOL point
        nx, ny = rd.coord(compressed)
        sym = rd.u8()
        return W.point_wkb(*mf.int2xy(nx, ny)), _symbol_style(mf, sym)
    if otype in (0x28, 0x29):                 # FONTSYMBOL point
        sym_no = rd.u8()
        size = rd.u8()
        font_style = rd.i16()
        r, g, b = rd.u8(), rd.u8(), rd.u8()
        rd.u8(), rd.u8(), rd.u8()
        angle = rd.i16() / 10.0
        nx, ny = rd.coord(compressed)
        font_id = rd.u8()
        color = (r << 16) | (g << 8) | b
        outline = ",o:#000000" if font_style & 16 else \
            (",o:#ffffff" if font_style & 512 else "")
        font = mf.fonts[font_id - 1] if 1 <= font_id <= len(mf.fonts) \
            else ""
        style = ('SYMBOL(a:%d,c:#%06x,s:%dpt,id:"font-sym-%d,'
                 'ogr-sym-9"%s,f:"%s")' % (int(angle), color, size,
                                           sym_no, outline, font))
        return W.point_wkb(*mf.int2xy(nx, ny)), style
    if otype in (0x2b, 0x2c):                 # CUSTOMSYMBOL point
        rd.u8()                               # unknown
        custom_style = rd.u8()
        nx, ny = rd.coord(compressed)
        sym_id = rd.u8()
        font_id = rd.u8()
        s = mf.symbols[sym_id - 1] if 1 <= sym_id <= len(mf.symbols) \
            else {"no": 0, "size": 0, "color": 0}
        font = mf.fonts[font_id - 1] if 1 <= font_id <= len(mf.fonts) \
            else ""
        color = ",c:#%06x" % s["color"] if custom_style & 0x02 else ""
        ext = font.rsplit(".", 1)[1].lower() if "." in font else ""
        style = ('SYMBOL(a:0%s,s:%dpt,id:"mapinfo-custom-sym-%d-%s,'
                 '%s-%s,ogr-sym-9")' % (color, s["size"], custom_style,
                                        font, ext, font))
        return W.point_wkb(*mf.int2xy(nx, ny)), style
    if otype in (0x04, 0x05):                 # LINE
        x1, y1 = rd.coord(compressed)
        x2, y2 = rd.coord(compressed)
        pen = rd.u8()
        return (W.linestring_wkb([mf.int2xy(x1, y1),
                                  mf.int2xy(x2, y2)]),
                _pen_style(mf, pen))
    if otype in (0x07, 0x08, 0x0d, 0x0e, 0x25, 0x26,
                 0x2e, 0x2f, 0x31, 0x32):     # PLINE/REGION/MULTIPLINE
        return _read_pline_region(mf, rd, otype, compressed)
    if otype in (0x0a, 0x0b):                 # ARC
        return _read_arc(mf, rd, compressed)
    if otype in (0x13, 0x14, 0x16, 0x17, 0x19, 0x1a):  # RECT/RR/ELL
        return _read_rect_ellipse(mf, rd, otype, compressed)
    if otype in (0x10, 0x11):                 # TEXT
        return _read_text(mf, rd, compressed)
    if otype in (0x34, 0x35):                 # MULTIPOINT
        return _read_multipoint(mf, rd, compressed)
    if otype in (0x37, 0x38):                 # COLLECTION
        return _read_collection(mf, rd, compressed)
    return None, None


def _pline_kind(otype):
    if otype in (0x07, 0x08):
        return "pline"
    if otype in (0x0d, 0x0e, 0x2e, 0x2f):
        return "region"
    return "multipline"


def _read_pline_region(mf, rd, otype, compressed):
    coord_ptr = rd.i32()
    coord_size = rd.i32() & 0x7FFFFFFF
    kind = _pline_kind(otype)
    wide = otype in (0x2e, 0x2f, 0x31, 0x32)  # V450 wide counts
    if kind == "pline":
        nsections = 1
    else:
        nsections = rd.i16()
    if compressed:
        rd.i16(), rd.i16()                    # label
        org = (rd.i32(), rd.i32())
        rd.i16(), rd.i16(), rd.i16(), rd.i16()
    else:
        rd.i32(), rd.i32()
        mins = (rd.i32(), rd.i32())
        maxs = (rd.i32(), rd.i32())
        org = ((mins[0] + maxs[0]) // 2, (mins[1] + maxs[1]) // 2)
    pen = rd.u8()
    brush = rd.u8() if kind == "region" else 0

    cs = _CoordStream(mf, coord_ptr)
    cs.org = org
    if kind == "pline":
        nv = coord_size // (4 if compressed else 8)
        pts = [mf.int2xy(*cs.coord(compressed)) for _ in range(nv)]
        return W.linestring_wkb(pts), _pen_style(mf, pen)
    counts = _read_section_hdrs(cs, nsections, compressed, wide)
    parts = []
    for nv in counts:
        parts.append([mf.int2xy(*cs.coord(compressed))
                      for _ in range(nv)])
    if kind == "region":
        rings = [_close_ring(p) for p in parts]
        styles = [s for s in (_brush_style(mf, brush),
                              _pen_style(mf, pen)) if s]
        return _rings_to_polygons_wkb(rings), ";".join(styles) or None
    out = [struct.pack("<BII", 1, W.MULTILINESTRING, len(parts))]
    out.extend(W.linestring_wkb(p) for p in parts)
    return b"".join(out), _pen_style(mf, pen)


def _read_section_hdrs(cs, nsections, compressed, wide):
    counts = []
    for _ in range(nsections):
        nv = cs.i32() if wide else cs.i16()   # V450+: int32 vertices
        cs.i16()                              # numHoles
        cs.coord(compressed)                  # section MBR min
        cs.coord(compressed)                  # section MBR max
        cs.i32()                              # data offset
        counts.append(nv)
    return counts


def _read_arc(mf, rd, compressed):
    a_start = rd.i16()
    a_end = rd.i16()
    exmin, eymin = rd.coord(compressed)
    exmax, eymax = rd.coord(compressed)
    rd.coord(compressed)                      # arc MBR
    rd.coord(compressed)
    pen = rd.u8()
    if mf.quadrant in (0, 1, 3):
        d0, d1 = a_start / 10.0, a_end / 10.0
    else:
        d0, d1 = a_end / 10.0, a_start / 10.0
    if mf.quadrant in (0, 2, 3):
        d0 = (180.0 - d0) if d0 <= 180.0 else (540.0 - d0)
        d1 = (180.0 - d1) if d1 <= 180.0 else (540.0 - d1)
    if mf.quadrant in (0, 3, 4):
        d0, d1 = 360.0 - d0, 360.0 - d1
    x0, y0 = mf.int2xy(exmin, eymin)
    x1, y1 = mf.int2xy(exmax, eymax)
    xmin, xmax = min(x0, x1), max(x0, x1)
    ymin, ymax = min(y0, y1), max(y0, y1)
    cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
    rx, ry = (xmax - xmin) / 2, (ymax - ymin) / 2
    if d1 < d0:
        npts = int(abs((d1 + 360) - d0) / 2 + 1)
    else:
        npts = int(abs(d1 - d0) / 2 + 1)
    npts = max(2, npts)
    pts = _generate_arc(npts, cx, cy, rx, ry,
                        d0 * math.pi / 180.0, d1 * math.pi / 180.0)
    return W.linestring_wkb(pts), _pen_style(mf, pen)


def _read_rect_ellipse(mf, rd, otype, compressed):
    roundrect = otype in (0x16, 0x17)
    ellipse = otype in (0x19, 0x1a)
    cw = ch = 0
    if roundrect:
        if compressed:
            cw, ch = rd.i16(), rd.i16()
        else:
            cw, ch = rd.i32(), rd.i32()
    nxmin, nymin = rd.coord(compressed)
    nxmax, nymax = rd.coord(compressed)
    pen, brush = rd.u8(), rd.u8()
    x0, y0 = mf.int2xy(nxmin, nymin)
    x1, y1 = mf.int2xy(nxmax, nymax)
    xmin, xmax = min(x0, x1), max(x0, x1)
    ymin, ymax = min(y0, y1), max(y0, y1)
    if ellipse:
        cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
        rx, ry = (xmax - xmin) / 2, (ymax - ymin) / 2
        ring = _close_ring(_generate_arc(180, cx, cy, rx, ry, 0.0,
                                         2.0 * math.pi))
    elif roundrect and cw and ch:
        rx = min(mf.int2dist(cw, "x") / 2.0, (xmax - xmin) / 2.0)
        ry = min(mf.int2dist(ch, "y") / 2.0, (ymax - ymin) / 2.0)
        ring = []
        ring += _generate_arc(45, xmin + rx, ymin + ry, rx, ry,
                              math.pi, 1.5 * math.pi)
        ring += _generate_arc(45, xmax - rx, ymin + ry, rx, ry,
                              1.5 * math.pi, 2.0 * math.pi)
        ring += _generate_arc(45, xmax - rx, ymax - ry, rx, ry,
                              0.0, 0.5 * math.pi)
        ring += _generate_arc(45, xmin + rx, ymax - ry, rx, ry,
                              0.5 * math.pi, math.pi)
        ring = _close_ring(ring)
    else:
        ring = [(xmin, ymin), (xmax, ymin), (xmax, ymax),
                (xmin, ymax), (xmin, ymin)]
    styles = [s for s in (_brush_style(mf, brush),
                          _pen_style(mf, pen)) if s]
    return W.polygon_wkb([ring]), ";".join(styles) or None


def _read_text(mf, rd, compressed):
    coord_ptr = rd.i32()
    strlen = rd.i16()
    alignment = rd.i16()
    angle = rd.i16() / 10.0
    font_style = rd.i16()
    fr, fg, fb = rd.u8(), rd.u8(), rd.u8()
    br, bg, bb = rd.u8(), rd.u8(), rd.u8()
    rd.coord(compressed)                      # label line end
    height = rd.i16() if compressed else rd.i32()
    font_id = rd.u8()
    nxmin, nymin = rd.coord(compressed)
    nxmax, nymax = rd.coord(compressed)
    rd.u8()                                   # pen
    x0, y0 = mf.int2xy(nxmin, nymin)
    x1, y1 = mf.int2xy(nxmax, nymax)
    xmin, xmax = min(x0, x1), max(x0, x1)
    ymin, ymax = min(y0, y1), max(y0, y1)
    d_height = mf.int2dist(height)
    text = ""
    if strlen > 0:
        cs = _CoordStream(mf, coord_ptr)
        text = cs.bytes(strlen).decode("latin1")
    # lower-left corner before rotation (TABText geometry rule)
    s, c = math.sin(math.radians(angle)), math.cos(math.radians(angle))
    if s > 0.0 and c > 0.0:
        px, py = xmin + d_height * s, ymin
    elif s > 0.0 and c < 0.0:
        px, py = xmax, ymin - d_height * c
    elif s < 0.0 and c < 0.0:
        px, py = xmax + d_height * s, ymax
    else:
        px, py = xmin, ymax - d_height * c
    just = 2 if alignment & 0x0200 else (3 if alignment & 0x0400 else 1)
    esc = text.replace('"', '\\"')
    fgc = (fr << 16) | (fg << 8) | fb
    bgc = (br << 16) | (bg << 8) | bb
    parts = ""
    if font_style & 0x0100:                   # box → background color
        parts += ",b:#%06x" % bgc
    if font_style & 0x0200:
        parts += ",o:#%06x" % bgc
    if font_style & 0x0020:
        parts += ",h:#%06x" % bgc
    if font_style & 0x0001:
        parts += ",bo:1"
    if font_style & 0x0002:
        parts += ",it:1"
    if font_style & 0x0004:
        parts += ",un:1"
    font = mf.fonts[font_id - 1] if 1 <= font_id <= len(mf.fonts) \
        else ""
    style = ('LABEL(t:"%s",a:%f,s:%fg,c:#%06x%s,p:%d,f:"%s")'
             % (esc, angle, d_height * 0.69, fgc, parts, just, font))
    return W.point_wkb(px, py), style


def _read_multipoint(mf, rd, compressed):
    coord_ptr = rd.i32()
    npoints = rd.i32()
    rd.i32(), rd.i32(), rd.i32()
    rd.u8(), rd.u8(), rd.u8()
    sym = rd.u8()
    rd.u8()
    if compressed:
        rd.i16(), rd.i16()
        org = (rd.i32(), rd.i32())
        rd.i16(), rd.i16(), rd.i16(), rd.i16()
    else:
        rd.i32(), rd.i32()
        mins = (rd.i32(), rd.i32())
        maxs = (rd.i32(), rd.i32())
        org = ((mins[0] + maxs[0]) // 2, (mins[1] + maxs[1]) // 2)
    cs = _CoordStream(mf, coord_ptr)
    cs.org = org
    pts = [mf.int2xy(*cs.coord(compressed)) for _ in range(npoints)]
    out = [struct.pack("<BII", 1, W.MULTIPOINT, len(pts))]
    out.extend(W.point_wkb(x, y) for x, y in pts)
    return b"".join(out), _symbol_style(mf, sym)


def _read_collection(mf, rd, compressed):
    coord_ptr = rd.i32()
    n_mpoints = rd.i32()
    rd.i32()                                  # region data size
    rd.i32()                                  # polyline data size
    n_reg = rd.i16()
    n_pline = rd.i16()
    rd.i32(), rd.i32(), rd.i32()
    rd.u8(), rd.u8(), rd.u8()
    mp_sym = rd.u8()
    rd.u8()
    reg_pen = rd.u8()
    pline_pen = rd.u8()
    reg_brush = rd.u8()
    if compressed:
        org = (rd.i32(), rd.i32())
    else:
        mins = (rd.i32(), rd.i32())
        maxs = (rd.i32(), rd.i32())
        org = ((mins[0] + maxs[0]) // 2, (mins[1] + maxs[1]) // 2)

    cs = _CoordStream(mf, coord_ptr)
    cs.org = org
    parts = []
    style = _symbol_style(mf, mp_sym)
    if n_reg > 0:
        cs.coord(compressed)                  # mini-header: label
        cs.coord(compressed)                  # MBR min
        cs.coord(compressed)                  # MBR max
        counts = _read_section_hdrs(cs, n_reg, compressed, wide=True)
        rings = []
        for nv in counts:
            rings.append(_close_ring(
                [mf.int2xy(*cs.coord(compressed)) for _ in range(nv)]))
        parts.append(_rings_to_polygons_wkb(rings))
    if n_pline > 0:
        cs.coord(compressed)
        cs.coord(compressed)
        cs.coord(compressed)
        counts = _read_section_hdrs(cs, n_pline, compressed, wide=True)
        for nv in counts:
            parts.append(W.linestring_wkb(
                [mf.int2xy(*cs.coord(compressed)) for _ in range(nv)]))
    if n_mpoints > 0:
        cs.coord(compressed)
        cs.coord(compressed)
        cs.coord(compressed)
        pts = [mf.int2xy(*cs.coord(compressed))
               for _ in range(n_mpoints)]
        mp = [struct.pack("<BII", 1, W.MULTIPOINT, len(pts))]
        mp.extend(W.point_wkb(x, y) for x, y in pts)
        parts.append(b"".join(mp))
    out = [struct.pack("<BII", 1, W.GEOMETRYCOLLECTION, len(parts))]
    out.extend(parts)
    return b"".join(out), style


def read_tab(path, wkb_col="wkb"):
    """``.tab`` dataset → Arrow table (fid, attributes...,
    [ogr_style], wkb)."""
    base = os.path.splitext(path)[0]

    def sibling(ext):
        for cand in (base + ext, base + ext.upper()):
            if os.path.exists(cand):
                return cand
        return None

    names, rows = [], []
    dat = sibling(".dat")
    if dat:
        names, rows = _parse_dbf(open(dat, "rb").read())

    ids = []
    idf = sibling(".id")
    if idf:
        raw = open(idf, "rb").read()
        ids = list(struct.unpack(f"<{len(raw) // 4}I", raw))

    mf = None
    mapf = sibling(".map")
    if mapf:
        mf = _MapFile(open(mapf, "rb").read())

    n = max(len(rows), len(ids)) or len(rows)
    wkbs, styles = [], []
    for i in range(n):
        wkb = style = None
        if mf is not None and i < len(ids) and ids[i] > 0:
            wkb, style = _read_object(mf, ids[i])
        wkbs.append(wkb)
        styles.append(style)

    arrays = [pa.array(list(range(1, n + 1)), type=pa.int64())]
    col_names = ["fid"]
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
    if any(s is not None for s in styles):
        arrays.append(pa.array(styles, type=pa.string()))
        col_names.append("ogr_style")
    arrays.append(pa.array(wkbs, type=pa.binary()))
    col_names.append(wkb_col)
    return pa.table(arrays, names=col_names)
