"""MapInfo MIF/MID interchange driver, from scratch on the published
grammar.

Reference semantics (``ogr/ogrsf_frmts/mitab/mitab_feature_mif.cpp``
unless noted):

* geometry keywords — Point, Line, Pline (bare count line / inline
  count / ``PLINE MULTIPLE n``), Region (n rings, each count+points,
  rings organized into polygons/holes), Rect, RoundRect (rounding
  *diameter*, radius = value/2, 45-segment corner arcs CCW from
  lower-left, mitab_feature_mif.cpp:1240-1316), Ellipse (180-segment
  arc over the bbox, :1423), Arc (5- or 7-token form,
  ``numPts = |end-start|/2 + 1`` at 2° steps, mitab_feature.cpp:
  5151), Text (OGRPoint at the pre-rotation lower-left corner via the
  quadrant formula, mitab_feature_mif.cpp TABText + the angle cases),
  MultiPoint, Collection, ``none``.  Arc/corner vertices come from
  ``TABGenerateArc`` (mitab_utils.cpp:58-85): numPoints at step
  (end−start)/(numPoints−1), the final point REPEATED, and rings
  closed by ``TABCloseRing`` only when not exactly closed.
* fields — Char/Integer/Smallint/LargeInt → int64, Float/Decimal →
  float64, Logical → bool, Date/Time/DateTime surfaced as strings;
  MID rows split on the header ``Delimiter`` honouring quotes.

Published parity: ``autotest/ogr/data/mitab/all_geoms.mif`` against
its shipped ``all_geoms.mif.golden.csv`` WKT column (every geometry
type, including the 181-point arc and the 45-segment round-rect
corners), and all_possible_fields.mif/.mid field decode
(tests/test_mif.py).
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

from .wkt import wkb_to_wkt, wkt_to_wkb

__all__ = ["read_mif", "write_mif"]

_INT_TYPES = ("integer", "smallint", "largeint")


from .gmt import _split_bar as _split_delim_base


def _split_delim(line, delim):
    return _split_delim_base(line, delim)


def _fmt(v):
    return f"{v:.15g}"


def _pts_wkt(pts):
    return ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)


def _generate_arc(num, cx, cy, rx, ry, a0, a1):
    """TABGenerateArc (mitab_utils.cpp:58): numPoints over [a0, a1]
    (a1 += 2π if behind), last point REPEATED."""
    if a1 < a0:
        a1 += 2.0 * math.pi
    step = (a1 - a0) / (num - 1.0)
    pts = []
    ang = a0
    for i in range(num):
        ang = a0 + i * step
        pts.append((cx + rx * math.cos(ang), cy + ry * math.sin(ang)))
    pts.append((cx + rx * math.cos(ang), cy + ry * math.sin(ang)))
    return pts


def _close_ring(pts):
    if pts and pts[-1] != pts[0]:
        pts.append(pts[0])
    return pts


def _organize_rings(rings):
    """Rings → POLYGON/MULTIPOLYGON WKT body: a ring contained in a
    previous outer becomes its hole (point-in-ring test on the first
    vertex), else starts a new polygon."""
    def inside(pt, ring):
        x, y = pt
        n = 0
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            if (y1 > y) != (y2 > y):
                if x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                    n += 1
        return n & 1

    polys = []
    for ring in rings:
        placed = False
        for poly in polys:
            if inside(ring[0], poly[0]):
                poly.append(ring)
                placed = True
                break
        if not placed:
            polys.append([ring])
    bodies = ["(" + ",".join("(" + _pts_wkt(r) + ")" for r in rings_)
              + ")" for rings_ in polys]
    if len(bodies) == 1:
        return "POLYGON " + bodies[0]
    return "MULTIPOLYGON (" + ",".join(bodies) + ")"


_OPT_WORDS = ("pen", "brush", "symbol", "font", "smooth", "center",
              "spacing", "justify", "label")

_GEOM_WORDS = ("point", "line", "pline", "region", "rect", "roundrect",
               "ellipse", "arc", "text", "multipoint", "collection",
               "none")


class _Lines:
    def __init__(self, lines):
        self.lines = [ln for ln in lines if ln.strip()]
        self.i = 0

    def peek(self):
        return self.lines[self.i] if self.i < len(self.lines) else None

    def next(self):
        ln = self.peek()
        self.i += 1
        return ln


def _first_word(ln):
    m = re.match(r"\s*([A-Za-z]+)", ln)
    return m.group(1).lower() if m else ""


def _parse_geometry(L):
    """Parse one geometry block starting at the current line; returns
    a WKT string or None (``none`` keyword)."""
    ln = L.next()
    toks = ln.split()
    kw = toks[0].lower()

    def skip_options():
        while True:
            nxt = L.peek()
            if nxt is None or _first_word(nxt) not in _OPT_WORDS:
                return
            L.next()

    if kw == "none":
        return None
    if kw == "point":
        x, y = float(toks[1]), float(toks[2])
        skip_options()
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if kw == "line":
        x1, y1, x2, y2 = map(float, toks[1:5])
        skip_options()
        return f"LINESTRING ({_fmt(x1)} {_fmt(y1)},{_fmt(x2)} {_fmt(y2)})"
    if kw == "pline":
        sections = []
        if len(toks) >= 2 and toks[1].lower() == "multiple":
            nsec = int(toks[2])
            for _ in range(nsec):
                n = int(L.next().split()[0])
                sections.append([tuple(map(float, L.next().split()[:2]))
                                 for _ in range(n)])
        else:
            n = int(toks[1]) if len(toks) >= 2 else int(L.next().split()[0])
            sections.append([tuple(map(float, L.next().split()[:2]))
                             for _ in range(n)])
        skip_options()
        if len(sections) == 1:
            return "LINESTRING (" + _pts_wkt(sections[0]) + ")"
        return "MULTILINESTRING (" + ",".join(
            "(" + _pts_wkt(s) + ")" for s in sections) + ")"
    if kw == "region":
        nring = int(toks[1])
        rings = []
        for _ in range(nring):
            n = int(L.next().split()[0])
            pts = [tuple(map(float, L.next().split()[:2]))
                   for _ in range(n)]
            rings.append(_close_ring(pts))
        skip_options()
        return _organize_rings(rings)
    if kw in ("rect", "roundrect"):
        x1, y1, x2, y2 = map(float, toks[1:5])
        xmin, xmax = min(x1, x2), max(x1, x2)
        ymin, ymax = min(y1, y2), max(y1, y2)
        r = 0.0
        if kw == "roundrect":
            if len(toks) >= 6:
                r = float(toks[5]) / 2.0
            else:
                r = float(L.next().split()[0]) / 2.0
        skip_options()
        if kw == "roundrect" and r != 0.0:
            rx = min(r, (xmax - xmin) / 2.0)
            ry = min(r, (ymax - ymin) / 2.0)
            pts = []
            pts += _generate_arc(45, xmin + rx, ymin + ry, rx, ry,
                                 math.pi, 3 * math.pi / 2)
            pts += _generate_arc(45, xmax - rx, ymin + ry, rx, ry,
                                 3 * math.pi / 2, 2 * math.pi)
            pts += _generate_arc(45, xmax - rx, ymax - ry, rx, ry,
                                 0.0, math.pi / 2)
            pts += _generate_arc(45, xmin + rx, ymax - ry, rx, ry,
                                 math.pi / 2, math.pi)
            _close_ring(pts)
        else:
            pts = [(xmin, ymin), (xmax, ymin), (xmax, ymax),
                   (xmin, ymax), (xmin, ymin)]
        return "POLYGON ((" + _pts_wkt(pts) + "))"
    if kw == "ellipse":
        x1, y1, x2, y2 = map(float, toks[1:5])
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        rx, ry = abs(x2 - x1) / 2.0, abs(y2 - y1) / 2.0
        skip_options()
        pts = _generate_arc(180, cx, cy, rx, ry, 0.0, 2 * math.pi)
        _close_ring(pts)
        return "POLYGON ((" + _pts_wkt(pts) + "))"
    if kw == "arc":
        if len(toks) >= 7:
            x1, y1, x2, y2, a0, a1 = map(float, toks[1:7])
        else:
            x1, y1, x2, y2 = map(float, toks[1:5])
            a0, a1 = map(float, L.next().split()[:2])
        skip_options()
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        rx, ry = abs(x2 - x1) / 2.0, abs(y2 - y1) / 2.0
        if a1 < a0:
            num = int(abs((a1 + 360) - a0) / 2) + 1
        else:
            num = int(abs(a1 - a0) / 2) + 1
        num = max(2, num)
        pts = _generate_arc(num, cx, cy, rx, ry,
                            a0 * math.pi / 180, a1 * math.pi / 180)
        return "LINESTRING (" + _pts_wkt(pts) + ")"
    if kw == "text":
        if len(toks) < 2:                # string on the next line
            L.next()
        bbox = L.next().split()
        x1, y1, x2, y2 = map(float, bbox[:4])
        xmin, xmax = min(x1, x2), max(x1, x2)
        ymin, ymax = min(y1, y2), max(y1, y2)
        height = ymax - ymin
        angle = 0.0
        while True:
            nxt = L.peek()
            if nxt is None or _first_word(nxt) not in \
                    _OPT_WORDS + ("angle",):
                break
            ln2 = L.next()
            m = re.match(r"\s*angle\s+([-\d.eE+]+)", ln2, re.I)
            if m:
                angle = float(m.group(1))
        s, c = math.sin(math.radians(angle)), math.cos(math.radians(angle))
        # pre-rotation lower-left corner (TABText quadrant formula)
        if s > 0.0 and c > 0.0:
            dx, dy = xmin + height * s, ymin
        elif s > 0.0 and c < 0.0:
            dx, dy = xmax, ymin - height * c
        elif s < 0.0 and c < 0.0:
            dx, dy = xmax + height * s, ymax
        else:
            dx, dy = xmin, ymax - height * c
        return f"POINT ({_fmt(dx)} {_fmt(dy)})"
    if kw == "multipoint":
        n = int(toks[1])
        pts = [tuple(map(float, L.next().split()[:2])) for _ in range(n)]
        skip_options()
        return "MULTIPOINT (" + _pts_wkt(pts) + ")"
    if kw == "collection":
        n = int(toks[1])
        parts = [_parse_geometry(L) for _ in range(n)]
        skip_options()
        return "GEOMETRYCOLLECTION (" + \
            ",".join(p for p in parts if p) + ")"
    raise ValueError(f"unknown MIF geometry keyword {toks[0]!r}")


def read_mif(path):
    """``.mif`` (+ optional sibling ``.mid``) → Arrow table with
    columns (fid:int64, wkb:binary-nullable, <attributes...>)."""
    import os

    with open(path, encoding="latin-1") as f:
        text = f.read()
    lines = text.splitlines()
    delim = ","
    fields = []                     # (name, miftype)
    data_at = 0
    i = 0
    while i < len(lines):
        s = lines[i].strip()
        low = s.lower()
        if low.startswith("delimiter"):
            m = re.search(r'"(.)"', s)
            if m:
                delim = m.group(1)
        elif low.startswith("columns"):
            ncol = int(s.split()[1])
            for j in range(ncol):
                i += 1
                toks = lines[i].strip().split(None, 1)
                fields.append((toks[0],
                               toks[1].split("(")[0].strip().lower()))
        elif low == "data":
            data_at = i + 1
            break
        i += 1

    L = _Lines(lines[data_at:])
    wkts = []
    while L.peek() is not None:
        if _first_word(L.peek()) in _GEOM_WORDS:
            wkts.append(_parse_geometry(L))
        else:
            L.next()

    cols = {"fid": pa.array(range(len(wkts)), pa.int64()),
            "wkb": pa.array([None if w is None else wkt_to_wkb(w)
                             for w in wkts], pa.binary())}

    mid = None
    for ext in (".mid", ".MID"):
        cand = os.path.splitext(path)[0] + ext
        if os.path.exists(cand):
            mid = cand
            break
    if mid is not None and fields:
        with open(mid, encoding="latin-1") as f:
            rows = [_split_delim(ln, delim)
                    for ln in f.read().splitlines() if ln != ""]
        for j, (name, t) in enumerate(fields):
            raw = [r[j] if j < len(r) else None for r in rows]
            raw += [None] * (len(wkts) - len(raw))
            if t in _INT_TYPES:
                cols[name] = pa.array(
                    [int(v) if v not in (None, "") else None
                     for v in raw], pa.int64())
            elif t in ("float", "decimal"):
                cols[name] = pa.array(
                    [float(v) if v not in (None, "") else None
                     for v in raw], pa.float64())
            elif t == "logical":
                cols[name] = pa.array(
                    [None if v in (None, "") else v.upper() in
                     ("T", "TRUE", "1") for v in raw], pa.bool_())
            else:
                cols[name] = pa.array(raw, pa.string())
    return pa.table(cols)


def _mif_type(t):
    if pa.types.is_boolean(t):
        return "Logical"
    if pa.types.is_integer(t):
        return "Integer"
    if pa.types.is_floating(t):
        return "Float"
    return "Char(254)"


def write_mif(table, path):
    """Arrow table (wkb + attribute columns) → .mif + .mid pair.

    Geometries map Point/LineString/MultiLineString/Polygon/
    MultiPolygon/MultiPoint to their MIF keywords (mitab
    WriteGeometryToMIFFile shapes); attributes go to the ``.mid``
    with the standard comma delimiter.
    """
    import os

    attr = [n for n in table.schema.names if n not in ("fid", "wkb")]
    out = ["Version 300", 'Charset "Neutral"', 'Delimiter ","',
           f"Columns {len(attr)}"]
    for n in attr:
        out.append(f"  {n} {_mif_type(table.schema.field(n).type)}")
    out.append("Data")
    out.append("")

    def coords(seg):
        return [tuple(map(float, p.split()))
                for p in re.findall(r"-?[\d.eE+-]+ -?[\d.eE+-]+", seg)]

    def gc_members(w):
        """Split a GEOMETRYCOLLECTION body at depth-0 commas."""
        body = w[w.index("(") + 1:w.rindex(")")]
        parts, depth, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(body[start:i].strip())
                start = i + 1
        parts.append(body[start:].strip())
        return parts

    def emit(w):
        head = w.split(" ", 1)[0].split("(")[0].strip()
        if head == "GEOMETRYCOLLECTION":
            parts = gc_members(w)
            out.append(f"Collection {len(parts)}")
            for p2 in parts:
                emit(p2)
            return
        _emit_simple(w, head)

    def _emit_simple(w, head):
        if head == "POINT":
            (x, y), = coords(w)
            out.append(f"Point {_fmt(x)} {_fmt(y)}")
        elif head == "LINESTRING":
            pts = coords(w)
            out.append(f"Pline {len(pts)}")
            out.extend(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)
        elif head == "MULTILINESTRING":
            segs = re.findall(r"\(([^()]+)\)", w)
            out.append(f"Pline Multiple {len(segs)}")
            for seg in segs:
                pts = coords(seg)
                out.append(f"  {len(pts)}")
                out.extend(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)
        elif head in ("POLYGON", "MULTIPOLYGON"):
            if head == "POLYGON":
                rings = re.findall(r"\(([^()]+)\)", w)
            else:
                rings = [r2 for p in re.findall(r"\(\(.*?\)\)", w)
                         for r2 in re.findall(r"\(([^()]+)\)", p)]
            out.append(f"Region {len(rings)}")
            for ring in rings:
                pts = coords(ring)
                out.append(f"  {len(pts)}")
                out.extend(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)
        elif head == "MULTIPOINT":
            pts = coords(w)
            out.append(f"MultiPoint {len(pts)}")
            out.extend(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)
        else:
            raise ValueError(f"MIF writer: unsupported geometry {head}")

    for r in range(table.num_rows):
        b = table["wkb"][r].as_py()
        if b is None:
            out.append("none")
            continue
        w = wkb_to_wkt(b, precision=15)
        emit(w)

    with open(path, "w", encoding="latin-1") as f:
        f.write("\n".join(out) + "\n")

    mid_lines = []
    for r in range(table.num_rows):
        vals = []
        for n in attr:
            v = table[n][r].as_py()
            t = table.schema.field(n).type
            if v is None:
                vals.append('""' if pa.types.is_string(t) else "0")
            elif pa.types.is_boolean(t):
                vals.append("T" if v else "F")
            elif pa.types.is_floating(t):
                vals.append(f"{v:.15g}")
            elif pa.types.is_integer(t):
                vals.append(str(v))
            else:
                vals.append('"' + str(v).replace('"', "") + '"')
        mid_lines.append(",".join(vals))
    with open(os.path.splitext(path)[0] + ".mid", "w",
              encoding="latin-1") as f:
        f.write("\n".join(mid_lines) + ("\n" if mid_lines else ""))
    return path
