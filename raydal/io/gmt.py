"""OGR GMT ASCII vector driver, from scratch on the published
format (GMT "OGR-compatible" dialect).

Reference semantics (``ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp``):
header comments ``# @VGMT1.0 @G<TYPE>``, ``# @R<xmin/xmax/ymin/
ymax>``, ``# @N<name|name|...>`` / ``# @T<type|type|...>``, then
``FEATURE_DATA``.  Each feature starts at a ``>`` segment separator;
``# @D<v1|v2|...>`` carries the attributes (strings quoted).  A
``>`` NOT followed by a ``@D`` line continues the current feature —
a new part for MULTILINESTRING/MULTIPOLYGON (GetNextRawFeature
multi-part logic, ogrgmtlayer.cpp:453-496), and a ``# @H`` marker
after ``>`` opens a hole ring in the current polygon while ``# @P``
opens a new perimeter (writer at ogrgmtlayer.cpp:893-906).  Types
map integer/double/string/datetime (datetime round-trips as text).

Published parity: ``autotest/ogr/ogr_gmt.py`` — test_multi.gmt reads
two MULTILINESTRING features with the published WKTs and names
(test_ogr_gmt_4); poly.shp round-trips geometry + AREA/EAS_ID/
PRFEDEA attributes (test_ogr_gmt_2/5, tests/test_gmt.py).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .wkt import wkb_to_wkt, wkt_to_wkb

__all__ = ["read_gmt", "write_gmt"]

_TYPE_TO_ARROW = {"integer": pa.int64(), "double": pa.float64(),
                  "string": pa.string(), "datetime": pa.string()}


def _split_bar(s, delim="|"):
    """Split on a single-char delimiter honouring double-quoted
    fields (shared with the MIF/MID driver's MID-row splitter)."""
    out, cur, q = [], [], False
    for c in s:
        if c == '"':
            q = not q
        elif c == delim and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    out.append("".join(cur))
    return out


def read_gmt(src):
    """GMT ASCII file (path or bytes) → Arrow table with columns
    (fid:int64, wkb:binary, <attributes...>)."""
    if isinstance(src, (bytes, bytearray)):
        text = src.decode("utf-8", "replace")
    else:
        with open(src) as f:
            text = f.read()
    lines = text.splitlines()

    gtype = "POINT"
    names, types = [], []
    i = 0
    for i, ln in enumerate(lines):
        if ln.startswith("#"):
            m = re.search(r"@G(\w+)", ln)
            if m:
                gtype = m.group(1)
            m = re.search(r"@N(.*)$", ln)
            if m and "@G" not in ln:
                names = _split_bar(m.group(1).strip())
            m = re.search(r"@T(.*)$", ln)
            if m:
                types = _split_bar(m.group(1).strip())
        elif ln.strip() == "FEATURE_DATA" or \
                ln.startswith("# FEATURE_DATA"):
            break
        if "FEATURE_DATA" in ln:
            break
    body = lines[i + 1:]

    # collect features: list of (attrs, parts) where parts is a list
    # of (is_hole, coords)
    feats = []
    attrs = None
    parts = []
    cur = []
    hole = False
    pend_hole = False

    def close_part():
        nonlocal cur, hole
        if cur:
            parts.append((hole, np.array(cur, np.float64)))
        cur, hole = [], False

    def close_feat():
        nonlocal parts, attrs
        close_part()
        if parts:
            feats.append((attrs, parts))
        parts, attrs = [], None

    for ln in body:
        s = ln.strip()
        if not s:
            continue
        if s.startswith(">"):
            close_part()
            pend_hole = False
            continue
        if s.startswith("#"):
            m = re.search(r"@D(.*)$", s)
            if m:
                close_feat()
                attrs = _split_bar(m.group(1))
            elif re.search(r"@H\b", s):
                pend_hole = True
            continue
        xy = s.split()
        if len(xy) >= 2:
            # a POINT layer emits one feature per coordinate line
            # (the attribute line, when present, binds to the next
            # point only) — OGR's GMT reader does the same
            if gtype == "POINT" and cur:
                close_feat()
            if not cur:
                hole = pend_hole
                pend_hole = False
            cur.append((float(xy[0]), float(xy[1])))
    close_feat()

    def fmt_pts(c):
        return ",".join(f"{x:.17g} {y:.17g}" for x, y in c)

    wkbs, rows = [], []
    for attrs, parts in feats:
        if gtype == "POINT":
            x, y = parts[0][1][0]
            wkt = f"POINT ({x:.17g} {y:.17g})"
        elif gtype == "MULTIPOINT":
            wkt = "MULTIPOINT (" + fmt_pts(
                np.vstack([p[1] for p in parts])) + ")"
        elif gtype == "LINESTRING":
            wkt = "LINESTRING (" + fmt_pts(parts[0][1]) + ")"
        elif gtype == "MULTILINESTRING":
            wkt = "MULTILINESTRING (" + ",".join(
                "(" + fmt_pts(p[1]) + ")" for p in parts) + ")"
        elif gtype in ("POLYGON", "MULTIPOLYGON"):
            polys = []
            for is_hole, c in parts:
                if is_hole and polys:
                    polys[-1].append(c)
                else:
                    polys.append([c])
            ring = lambda c: "(" + fmt_pts(c) + ")"  # noqa: E731
            ps = ["(" + ",".join(ring(r) for r in rings) + ")"
                  for rings in polys]
            if gtype == "POLYGON":
                wkt = "POLYGON " + ps[0]
            else:
                wkt = "MULTIPOLYGON (" + ",".join(ps) + ")"
        else:
            raise ValueError(f"unsupported GMT geometry type {gtype}")
        wkbs.append(wkt_to_wkb(wkt))
        rows.append(attrs)

    cols = {"fid": pa.array(range(len(wkbs)), pa.int64()),
            "wkb": pa.array(wkbs, pa.binary())}
    for j, name in enumerate(names):
        at = _TYPE_TO_ARROW.get(types[j] if j < len(types) else
                                "string", pa.string())
        vals = []
        for r in rows:
            v = r[j] if r is not None and j < len(r) else None
            if v is None or v == "":
                vals.append(None)
            elif at == pa.int64():
                vals.append(int(v))
            elif at == pa.float64():
                vals.append(float(v))
            else:
                vals.append(v)
        cols[name] = pa.array(vals, at)
    return pa.table(cols)


def _arrow_gmt_type(t):
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "double"
    return "string"


def write_gmt(table, path, layer_type=None):
    """Arrow table (wkb + attribute columns) → GMT ASCII file."""
    wkts = [wkb_to_wkt(b.as_py() if hasattr(b, "as_py") else b,
                       precision=12)
            for b in table["wkb"]]
    if layer_type is None:
        heads = {w.split(" ", 1)[0].split("(")[0].strip()
                 for w in wkts}
        order = ["MULTIPOLYGON", "POLYGON", "MULTILINESTRING",
                 "LINESTRING", "MULTIPOINT", "POINT"]
        layer_type = next((t for t in order if t in heads), "POINT")
    attr_names = [n for n in table.schema.names
                  if n not in ("fid", "wkb")]

    # region from all coordinates
    nums = [np.array(re.findall(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?",
                                w), np.float64).reshape(-1, 2)
            for w in wkts if "EMPTY" not in w]
    allc = np.vstack(nums) if nums else np.zeros((1, 2))

    out = [f"# @VGMT1.0 @G{layer_type}",
           "# @R{:.12g}/{:.12g}/{:.12g}/{:.12g}".format(
               allc[:, 0].min(), allc[:, 0].max(),
               allc[:, 1].min(), allc[:, 1].max())]
    if attr_names:
        out.append("# @N" + "|".join(attr_names))
        out.append("# @T" + "|".join(
            _arrow_gmt_type(table.schema.field(n).type)
            for n in attr_names))
    out.append("# FEATURE_DATA")

    def emit_coords(seg):
        for pt in re.findall(r"-?[\d.eE+-]+ -?[\d.eE+-]+", seg):
            x, y = pt.split()
            out.append(f"{float(x):.12g} {float(y):.12g}")

    for r in range(table.num_rows):
        out.append(">")
        if attr_names:
            vals = []
            for n in attr_names:
                v = table[n][r].as_py()
                t = table.schema.field(n).type
                if v is None:
                    vals.append("")
                elif pa.types.is_floating(t):
                    vals.append(f"{v:.12g}")
                elif pa.types.is_integer(t):
                    vals.append(str(v))
                else:
                    vals.append('"' + str(v).replace('"', "") + '"')
            out.append("# @D" + "|".join(vals))
        w = wkts[r]
        head = w.split(" ", 1)[0].split("(")[0].strip()
        if head in ("POINT", "LINESTRING", "MULTIPOINT"):
            emit_coords(w)
        elif head == "MULTILINESTRING":
            segs = re.findall(r"\(([^()]+)\)", w)
            for k, seg in enumerate(segs):
                if k:
                    out.append(">")
                emit_coords(seg)
        elif head in ("POLYGON", "MULTIPOLYGON"):
            # split into polygons, then rings
            if head == "POLYGON":
                polys = [re.findall(r"\(([^()]+)\)", w)]
            else:
                polys = [re.findall(r"\(([^()]+)\)", p)
                         for p in re.findall(r"\(\(.*?\)\)", w)]
            first = True
            for rings in polys:
                for ri, ring in enumerate(rings):
                    if not first:
                        out.append(">")
                    out.append("# @H" if ri else "# @P")
                    emit_coords(ring)
                    first = False
        else:
            raise ValueError(f"unsupported geometry {head}")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    return path
