"""MapML vector reader/writer, from scratch.

Mirrors the reference's MapML driver
(``ogr/ogrsf_frmts/mapml/ogrmapmldataset.cpp``) semantics, derived
from its published test matrix (``autotest/ogr/ogr_mapml.py``):

* features group into layers by their ``class`` attribute (absent →
  layer ``mapml``); FIDs parse from the ``id`` attribute's trailing
  integer (``test.10`` → 10),
* properties live in the HTML table
  (``properties/div/table/tbody/tr/td[@itemprop]``); field types are
  inferred from the VALUES with promotion rules int → int64 → real
  and ``YYYY/MM/DD[ HH:MM:SS]`` / ``HH:MM:SS`` datetime detection
  (mapmldataset.cpp:345-420),
* geometry elements: point / linestring / polygon (one
  ``coordinates`` per ring) / multipoint / multilinestring /
  multipolygon / geometrycollection; coordinates are x y pairs,
* the writer normalizes polygon winding (exterior CCW, holes CW) and
  flattens nested geometry collections, matching the reference's
  read-back expectations (``POLYGON ((0 0,1 0,0 1,0 0),...)``).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_mapml", "write_mapml"]


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _coords(elem):
    vals = [float(v) for v in (elem.text or "").split()]
    return [(vals[i], vals[i + 1]) for i in range(0, len(vals) - 1, 2)]


def _geom_children(elem, name=None):
    for c in elem:
        ln = _local(c.tag)
        if name is None or ln == name:
            yield ln, c


def _geom_wkb(elem):
    import struct
    kind = _local(elem.tag)
    if kind == "point":
        for _, c in _geom_children(elem, "coordinates"):
            pts = _coords(c)
            if pts:
                return W.point_wkb(*pts[0])
        return None
    if kind == "linestring":
        for _, c in _geom_children(elem, "coordinates"):
            return W.linestring_wkb(_coords(c))
        return None
    if kind == "polygon":
        rings = [_coords(c) for _, c in _geom_children(elem,
                                                       "coordinates")]
        return W.polygon_wkb(rings)
    if kind == "multipoint":
        for _, c in _geom_children(elem, "coordinates"):
            pts = _coords(c)
            out = [struct.pack("<BII", 1, W.MULTIPOINT, len(pts))]
            out.extend(W.point_wkb(x, y) for x, y in pts)
            return b"".join(out)
        return None
    if kind == "multilinestring":
        lines = [_coords(c) for _, c in _geom_children(elem,
                                                       "coordinates")]
        out = [struct.pack("<BII", 1, W.MULTILINESTRING, len(lines))]
        out.extend(W.linestring_wkb(li) for li in lines)
        return b"".join(out)
    if kind == "multipolygon":
        polys = []
        for ln, c in _geom_children(elem, "polygon"):
            polys.append([_coords(cc) for _, cc in
                          _geom_children(c, "coordinates")])
        return W.multipolygon_wkb(polys)
    if kind == "geometrycollection":
        parts = [w for _, c in _geom_children(elem)
                 for w in [_geom_wkb(c)] if w is not None]
        out = [struct.pack("<BII", 1, W.GEOMETRYCOLLECTION
                           if hasattr(W, "GEOMETRYCOLLECTION") else 7,
                           len(parts))]
        out.extend(parts)
        return b"".join(out)
    return None


_DT_RE = re.compile(r"\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}")
_D_RE = re.compile(r"\d{4}/\d{2}/\d{2}")
_T_RE = re.compile(r"\d{2}:\d{2}:\d{2}")
_INT_RE = re.compile(r"[+-]?\d+")
_REAL_RE = re.compile(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?")


def _value_kind(v):
    if _INT_RE.fullmatch(v):
        n = int(v)
        return "int64" if (n < -2**31 or n > 2**31 - 1) else "int"
    if _REAL_RE.fullmatch(v):
        return "real"
    if _DT_RE.fullmatch(v):
        return "datetime"
    if _D_RE.fullmatch(v):
        return "date"
    if _T_RE.fullmatch(v):
        return "time"
    return "str"


def _promote(old, new):
    if old == new:
        return old
    nums = {"int", "int64", "real"}
    if old in nums and new in nums:
        order = ["int", "int64", "real"]
        return order[max(order.index(old), order.index(new))]
    return "str"


def read_mapml(src, wkb_col="wkb"):
    """MapML document (path / str / bytes) → dict of layer name →
    Arrow table (fid, inferred fields..., wkb)."""
    if isinstance(src, (bytes, bytearray)):
        root = ET.fromstring(src)
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        root = ET.fromstring(src)
    else:
        root = ET.parse(src).getroot()

    feats = [e for e in root.iter() if _local(e.tag) == "feature"]
    layers: dict[str, list] = {}
    for f in feats:
        cls = f.get("class") or "mapml"
        fid = None
        fid_attr = f.get("id")
        if fid_attr:
            m = re.search(r"(\d+)$", fid_attr)
            if m:
                fid = int(m.group(1))
        props = {}
        for td in f.iter():
            if _local(td.tag) == "td" and td.get("itemprop"):
                props[td.get("itemprop")] = (td.text or "").strip()
        wkb = None
        for g in f.iter():
            if _local(g.tag) == "geometry":
                for _, c in _geom_children(g):
                    wkb = _geom_wkb(c)
                    if wkb is not None:
                        break
                break
        layers.setdefault(cls, []).append((fid, props, wkb))

    out = {}
    for cls, rows in layers.items():
        names, kinds = [], {}
        for _, props, _ in rows:
            for k, v in props.items():
                kind = _value_kind(v)
                if k not in kinds:
                    names.append(k)
                    kinds[k] = kind
                else:
                    kinds[k] = _promote(kinds[k], kind)
        fids, auto = [], 1
        for fid, _, _ in rows:
            if fid is None:
                fid = auto
            fids.append(fid)
            auto = fid + 1
        arrays = [pa.array(fids, type=pa.int64())]
        col_names = ["fid"]
        _PA = {"int": pa.int64(), "int64": pa.int64(),
               "real": pa.float64(), "datetime": pa.string(),
               "date": pa.string(), "time": pa.string(),
               "str": pa.string()}
        conv = {"int": int, "int64": int, "real": float}
        for n in names:
            k = kinds[n]
            vals = []
            for _, props, _ in rows:
                v = props.get(n)
                if v is None or v == "":
                    vals.append(None)
                else:
                    vals.append(conv.get(k, str)(v))
            arrays.append(pa.array(vals, type=_PA[k]))
            col_names.append(n)
        arrays.append(pa.array([w for _, _, w in rows],
                               type=pa.binary()))
        col_names.append(wkb_col)
        out[cls] = pa.table(arrays, names=col_names)
    return out


def _ring_ccw(ring):
    a = 0.0
    for i in range(len(ring) - 1):
        a += (ring[i][0] * ring[i + 1][1] -
              ring[i + 1][0] * ring[i][1])
    return a > 0


def _fmt(x):
    return f"{x:.10g}"


def _coords_text(pts):
    return " ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)


def _poly_xml(rings):
    parts = ["<polygon>"]
    for i, ring in enumerate(rings):
        ring = [tuple(p) for p in np.asarray(ring)]
        want_ccw = i == 0
        if _ring_ccw(ring) != want_ccw:
            ring = ring[::-1]
        parts.append(f"<coordinates>{_coords_text(ring)}</coordinates>")
    parts.append("</polygon>")
    return "".join(parts)


def _geom_xml(wkb):
    kind, data = W.parse_wkb(wkb)
    base = kind % 1000
    if base == W.POINT:
        return ("<point><coordinates>%s</coordinates></point>"
                % _coords_text(data))
    if base == W.LINESTRING:
        return ("<linestring><coordinates>%s</coordinates></linestring>"
                % _coords_text(data))
    if base == W.POLYGON:
        return _poly_xml(data)
    if base == W.MULTIPOINT:
        pts = [tuple(g[1][0]) for g in data]
        return ("<multipoint><coordinates>%s</coordinates></multipoint>"
                % _coords_text(pts))
    if base == W.MULTILINESTRING:
        parts = ["<multilinestring>"]
        parts.extend("<coordinates>%s</coordinates>"
                     % _coords_text(g[1]) for g in data)
        parts.append("</multilinestring>")
        return "".join(parts)
    if base == W.MULTIPOLYGON:
        parts = ["<multipolygon>"]
        parts.extend(_poly_xml(g[1]) for g in data)
        parts.append("</multipolygon>")
        return "".join(parts)
    # geometry collection: flatten nested collections (reference
    # behavior: GEOMETRYCOLLECTION (POINT, GC(POINT)) reads back flat)
    parts = ["<geometrycollection>"]

    def emit(items):
        for g in items:
            k = g[0] % 1000
            if k == 7:
                emit(g[1])
            else:
                import struct as _s
                sub = _rebuild_wkb(g)
                parts.append(_geom_xml(sub))

    emit(data)
    parts.append("</geometrycollection>")
    return "".join(parts)


def _rebuild_wkb(parsed):
    """(kind, data) from parse_wkb → standalone WKB."""
    import struct
    kind, data = parsed
    base = kind % 1000
    if base == W.POINT:
        return W.point_wkb(data[0][0], data[0][1])
    if base == W.LINESTRING:
        return W.linestring_wkb([tuple(p) for p in data])
    if base == W.POLYGON:
        return W.polygon_wkb([[tuple(p) for p in r] for r in data])
    if base == W.MULTIPOINT:
        out = [struct.pack("<BII", 1, W.MULTIPOINT, len(data))]
        out.extend(_rebuild_wkb(g) for g in data)
        return b"".join(out)
    if base == W.MULTILINESTRING:
        out = [struct.pack("<BII", 1, W.MULTILINESTRING, len(data))]
        out.extend(_rebuild_wkb(g) for g in data)
        return b"".join(out)
    if base == W.MULTIPOLYGON:
        return W.multipolygon_wkb(
            [[[tuple(p) for p in r] for r in g[1]] for g in data])
    out = [struct.pack("<BII", 1, 7, len(data))]
    out.extend(_rebuild_wkb(g) for g in data)
    return b"".join(out)


def write_mapml(layers, path, wkb_col="wkb"):
    """dict of layer name → Arrow table → MapML document; inverse of
    :func:`read_mapml`."""
    if isinstance(layers, pa.Table):
        layers = {"mapml": layers}
    out = ["<mapml><head><title>raydal</title></head><body>"]
    for cls, t in layers.items():
        cols = [n for n in t.column_names if n not in ("fid", wkb_col)]
        auto = 1
        for r in t.to_pylist():
            fid = r.get("fid")
            if fid is None:
                fid = auto
            auto = fid + 1
            out.append(f'<feature id="{escape(str(cls))}.{fid}" '
                       f'class="{escape(str(cls))}">')
            kv = [(n, r[n]) for n in cols if r.get(n) is not None]
            if kv:
                out.append('<properties><div class="table-container">'
                           "<table><tbody>")
                out.append("<tr><th role=\"columnheader\" scope=\"col\">"
                           "Property name</th><th role=\"columnheader\" "
                           "scope=\"col\">Property value</th></tr>")
                for n, v in kv:
                    if isinstance(v, float) and v == int(v) and \
                            abs(v) < 1e15:
                        sv = _fmt(v)
                    else:
                        sv = str(v)
                    out.append(
                        f'<tr><th scope="row">{escape(n)}</th>'
                        f'<td itemprop="{escape(n)}">{escape(sv)}</td>'
                        "</tr>")
                out.append("</tbody></table></div></properties>")
            wkb = r.get(wkb_col)
            if wkb:
                out.append(f"<geometry>{_geom_xml(wkb)}</geometry>")
            out.append("</feature>")
    out.append("</body></mapml>")
    with open(path, "wb") as f:
        f.write("".join(out).encode("utf-8"))
    return path
