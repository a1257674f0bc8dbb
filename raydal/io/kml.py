"""KML vector reader/writer, from scratch on ``xml.etree``.

Reproduces the reference's *old* KML driver semantics
(``ogr/ogrsf_frmts/kml/``): every container (Folder/Document/kml) whose
subtree carries geometry becomes a layer (``kmlvector.cpp:64``
findLayers); when the whole document is geometry-free every Folder
survives as an empty layer (``ogrkmldatasource.cpp:146`` keeps empty
containers only in that case, ``kmlnode.cpp:299`` eliminateEmpty
otherwise prunes them, including layers it already registered);
features are the *direct* Placemark children (``kmlnode.cpp``
getNumFeatures) with fields ``Name`` / ``description``; description
content re-assembles inline XML exactly like the expat handler
(``kml.cpp:214`` — child elements inlined as ``<tag attr="val">`` …
``</tag>``, per-line leading whitespace stripped); coordinates are
``lon,lat[,alt]`` whitespace-separated tuples, any 3-ordinate tuple
switching the subtree to 2.5D (``kmlnode.cpp`` classify), missing
altitudes backfilled with 0.  Layer names deduplicate as
``name (#2)`` (``ogrkmldatasource.cpp``).

Validated against the published autotest expectations
(``autotest/ogr/ogr_kml.py``: samples.kml layers/attributes/geometry
WKTs, emptylayers, folder_with_subfolder_placemark,
duplicate_folder_name, description_with_xml, …).
"""

from __future__ import annotations

import re
import struct
import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = ["read_kml", "write_kml"]

_CONTAINERS = {"kml", "Folder", "Document"}
_FEATURE_CONTAINERS = {"Placemark", "MultiGeometry", "MultiPolygon",
                       "MultiLineString", "MultiPoint"}
_GEOMS = {"Point", "LineString", "Polygon"}

_EMPTY, _MIXED = "Empty", "Mixed"


def _local(tag):
    if isinstance(tag, str):
        if tag.startswith("{"):
            return tag.split("}", 1)[1]
        if ":" in tag:
            return tag.split(":", 1)[1]
    return tag


class _Node:
    __slots__ = ("name", "elem", "children", "etype", "b25d", "tuples")

    def __init__(self, name, elem):
        self.name = name
        self.elem = elem
        self.children = []
        self.etype = _EMPTY
        self.b25d = False
        self.tuples = None


def _inline_xml(elem):
    """Serialize an element's mixed content the way the expat handler
    accumulates it inside <description>."""
    parts = [elem.text or ""]
    for ch in elem:
        tag = _local(ch.tag)
        attrs = "".join(f' {k}="{v}"' for k, v in ch.attrib.items())
        parts.append(f"<{tag}{attrs}>")
        parts.append(_inline_xml(ch))
        parts.append(f"</{tag}>")
        parts.append(ch.tail or "")
    return "".join(parts)


def _reassemble(text):
    """Per-line leading-whitespace strip + newline join (kml.cpp
    endElement content normalization)."""
    out = []
    for line in re.split(r"[\r\n]", text):
        line = line.lstrip(" \t")
        if line:
            out.append(line)
    return "\n".join(out)


def _build(elem):
    node = _Node(_local(elem.tag), elem)
    if node.name == "coordinates":
        node.tuples = (elem.text or "").split()
        node.b25d = any(t.count(",") == 2 for t in node.tuples)
        return node
    if node.name == "description":
        return node
    for ch in elem:
        node.children.append(_build(ch))
    return node


def _classify(node):
    alltype = _EMPTY
    if node.name in _GEOMS:
        node.etype = node.name
    for ch in node.children:
        _classify(ch)
        node.b25d |= ch.b25d
        cur = ch.etype
        if cur != alltype and alltype != _EMPTY and cur != _EMPTY:
            node.etype = ("MultiGeometry"
                          if node.name in _FEATURE_CONTAINERS
                          and node.name != "Placemark" else _MIXED)
        elif cur != _EMPTY:
            alltype = cur
    if node.etype == _EMPTY and node.name not in _GEOMS:
        if node.name in ("MultiGeometry", "MultiPolygon",
                         "MultiLineString", "MultiPoint"):
            node.etype = {"Point": "MultiPoint",
                          "LineString": "MultiLineString",
                          "Polygon": "MultiPolygon"}.get(
                              alltype, "MultiGeometry")
        else:
            node.etype = alltype
    elif node.etype == _MIXED and node.name not in _CONTAINERS \
            and node.name not in _FEATURE_CONTAINERS:
        pass
    return node


def _eliminate_empty(node, removed):
    kept = []
    for ch in node.children:
        if ch.etype == _EMPTY and (ch.name in _CONTAINERS
                                   or ch.name in _FEATURE_CONTAINERS):
            _collect(ch, removed)
        else:
            _eliminate_empty(ch, removed)
            kept.append(ch)
    node.children = kept


def _collect(node, acc):
    acc.add(id(node))
    for ch in node.children:
        _collect(ch, acc)


def _find_layers(node, keep_empty, layers):
    if node.name in _GEOMS or node.name in _FEATURE_CONTAINERS:
        return
    if node.name not in _CONTAINERS:
        return
    empty = True
    for ch in node.children:
        if ch.name in _CONTAINERS:
            _find_layers(ch, keep_empty, layers)
        elif ch.name in _FEATURE_CONTAINERS:
            empty = False
    if keep_empty and node.name == "Folder":
        if not empty:
            removed = set()
            _eliminate_empty(node, removed)
            layers[:] = [n for n in layers if id(n) not in removed]
    elif empty:
        return
    if keep_empty or node.etype in _GEOMS or node.etype in (
            _MIXED, "MultiGeometry", "MultiPoint", "MultiLineString",
            "MultiPolygon"):
        layers.append(node)


# ------------------------------------------------------------ geometry

def _coords(node):
    """coordinates node → list of (x, y, z) floats (z None if absent)."""
    out = []
    for t in node.tuples or []:
        parts = t.split(",")
        if len(parts) < 2:
            continue
        x, y = float(parts[0]), float(parts[1])
        z = float(parts[2]) if len(parts) > 2 and parts[2] else None
        out.append((x, y, z))
    return out


def _wkb_coords(pts, z):
    out = b""
    for x, y, zz in pts:
        out += struct.pack("<dd", x, y)
        if z:
            out += struct.pack("<d", zz if zz is not None else 0.0)
    return out


def _child(node, name):
    for ch in node.children:
        if ch.name == name:
            return ch
    return None


def _geom_wkb(node, z):
    """geometry node → WKB bytes (ISO Z codes when ``z``)."""
    code_off = 1000 if z else 0
    if node.name == "Point":
        c = _child(node, "coordinates")
        pts = _coords(c) if c is not None else []
        if not pts:
            return None
        return struct.pack("<BI", 1, 1 + code_off) + _wkb_coords(pts[:1], z)
    if node.name in ("LineString", "LinearRing"):
        c = _child(node, "coordinates")
        pts = _coords(c) if c is not None else []
        if not pts:
            return None
        return struct.pack("<BII", 1, 2 + code_off, len(pts)) + \
            _wkb_coords(pts, z)
    if node.name == "Polygon":
        rings = []
        outer = _child(node, "outerBoundaryIs")
        ring = outer and _child(outer, "LinearRing")
        c = ring and _child(ring, "coordinates")
        if c is not None:
            rings.append(_coords(c))
        for ch in node.children:
            if ch.name == "innerBoundaryIs":
                r = _child(ch, "LinearRing")
                ci = r and _child(r, "coordinates")
                if ci is not None:
                    rings.append(_coords(ci))
        if not rings:
            return None
        body = struct.pack("<I", len(rings))
        for r in rings:
            body += struct.pack("<I", len(r)) + _wkb_coords(r, z)
        return struct.pack("<BI", 1, 3 + code_off) + body
    if node.name in ("MultiGeometry", "MultiPoint", "MultiLineString",
                     "MultiPolygon"):
        parts = [w for w in (_geom_wkb(ch, z) for ch in node.children
                             if ch.name in _GEOMS
                             or ch.name in _FEATURE_CONTAINERS)
                 if w is not None]
        code = {"MultiPoint": 4, "MultiLineString": 5,
                "MultiPolygon": 6, "MultiGeometry": 7}[
                    node.etype if node.etype in (
                        "MultiPoint", "MultiLineString", "MultiPolygon")
                    else "MultiGeometry"]
        return struct.pack("<BII", 1, code + code_off, len(parts)) + \
            b"".join(parts)
    return None


def _placemark_feature(pm):
    """Placemark node → (Name, description, wkb) or None when the
    placemark carries no usable geometry (kmlnode.cpp getFeature)."""
    if pm.etype == _EMPTY or pm.etype == _MIXED:
        return None
    name_el = _child(pm, "name")
    name = _reassemble("".join(name_el.elem.itertext())) \
        if name_el is not None else ""
    desc_el = _child(pm, "description")
    desc = _reassemble(_inline_xml(desc_el.elem)) \
        if desc_el is not None else ""
    if pm.etype in _GEOMS:
        want = pm.etype
    else:
        want = "MultiGeometry"
    for ch in pm.children:
        if ch.name == want or (want == "MultiGeometry"
                               and ch.name in ("MultiPolygon",
                                               "MultiLineString",
                                               "MultiPoint")):
            wkb = _geom_wkb(ch, ch.b25d)
            if wkb is not None:
                return name, desc, wkb
    return None


def read_kml(src):
    """KML document (path, str or bytes) → list of
    ``(layer_name, Arrow table(fid, Name, description, wkb))``."""
    if isinstance(src, (bytes, bytearray)):
        text = bytes(src)
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        text = src
    else:
        with open(src, "rb") as f:
            text = f.read()
    root = ET.fromstring(text)
    if _local(root.tag) != "kml":
        raise ValueError("not a KML document (missing <kml> root)")
    trunk = _classify(_build(root))
    keep_empty = trunk.etype == _EMPTY
    if not keep_empty:
        _eliminate_empty(trunk, set())
    layers = []
    _find_layers(trunk, keep_empty, layers)

    out, seen = [], {}
    for node in layers:
        name_el = _child(node, "name")
        lname = _reassemble("".join(name_el.elem.itertext())) \
            if name_el is not None else ""
        seen[lname] = seen.get(lname, 0) + 1
        if seen[lname] > 1:
            lname = f"{lname} (#{seen[lname]})"
        feats = [f for f in (_placemark_feature(ch)
                             for ch in node.children
                             if ch.name == "Placemark") if f]
        out.append((lname, pa.Table.from_pydict({
            "fid": pa.array(range(len(feats)), pa.int64()),
            "Name": pa.array([f[0] for f in feats], pa.string()),
            "description": pa.array([f[1] for f in feats], pa.string()),
            "wkb": pa.array([f[2] for f in feats], pa.binary())})))
    return out


# -------------------------------------------------------------- writer

def _xml_escape(s):
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _fmt_tuple(x, y, z):
    s = f"{x:.15g},{y:.15g}"
    return s + (f",{z:.15g}" if z is not None else "")


def _zparse(buf, off):
    """Z-preserving WKB parse (the shared :func:`raydal.geo.wkb.parse_wkb`
    flattens to XY) → ((base, ndim, payload), off)."""
    little = buf[off] == 1
    e = "<" if little else ">"
    code = struct.unpack_from(e + "I", buf, off + 1)[0]
    off += 5
    base = code % 1000 if code < 3000 else code % 1000
    ndim = 3 if (1000 <= code < 2000 or code & 0x80000000) else 2
    if code & 0x80000000:
        base = code & 0xFF
    if base == 1:
        vals = struct.unpack_from(e + "d" * ndim, buf, off)
        return (base, ndim, [vals]), off + 8 * ndim
    if base == 2:
        n = struct.unpack_from(e + "I", buf, off)[0]
        off += 4
        vals = struct.unpack_from(e + "d" * (n * ndim), buf, off)
        pts = [vals[i * ndim:(i + 1) * ndim] for i in range(n)]
        return (base, ndim, pts), off + 8 * n * ndim
    if base == 3:
        nr = struct.unpack_from(e + "I", buf, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(e + "I", buf, off)[0]
            off += 4
            vals = struct.unpack_from(e + "d" * (n * ndim), buf, off)
            rings.append([vals[i * ndim:(i + 1) * ndim]
                          for i in range(n)])
            off += 8 * n * ndim
        return (base, ndim, rings), off
    if base in (4, 5, 6, 7):
        ng = struct.unpack_from(e + "I", buf, off)[0]
        off += 4
        parts = []
        for _ in range(ng):
            g, off = _zparse(buf, off)
            parts.append(g)
        return (base, ndim, parts), off
    raise ValueError(f"KML writer: unsupported geometry code {code}")


def _wkb_to_kml_geom(parsed):
    base, ndim, payload = parsed

    def tup(p):
        return _fmt_tuple(p[0], p[1], p[2] if len(p) > 2 else None)

    if base == 1:
        return ("<Point><coordinates>" + tup(payload[0])
                + "</coordinates></Point>")
    if base == 2:
        body = " ".join(tup(p) for p in payload)
        return f"<LineString><coordinates>{body}</coordinates></LineString>"
    if base == 3:
        parts = ["<Polygon>"]
        for i, ring in enumerate(payload):
            tag = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            body = " ".join(tup(p) for p in ring)
            parts.append(f"<{tag}><LinearRing><coordinates>{body}"
                         f"</coordinates></LinearRing></{tag}>")
        parts.append("</Polygon>")
        return "".join(parts)
    if base in (4, 5, 6, 7):
        parts = ["<MultiGeometry>"]
        for g in payload:
            parts.append(_wkb_to_kml_geom(g))
        parts.append("</MultiGeometry>")
        return "".join(parts)
    raise ValueError(f"KML writer: unsupported geometry {base}")


def write_kml(layers, path=None, wkb_col="wkb", name_col="Name",
              desc_col="description"):
    """``[(layer_name, table)]`` (or a single table) → KML text.

    Geometry comes from ``wkb_col``; ``name_col`` / ``desc_col`` fill
    the Placemark name/description when present.
    """
    if isinstance(layers, pa.Table):
        layers = [("layer", layers)]
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<kml xmlns="http://www.opengis.net/kml/2.2">',
           "<Document>"]
    for lname, t in layers:
        out.append(f"<Folder><name>{_xml_escape(lname)}</name>")
        names = t[name_col].to_pylist() if name_col in t.column_names \
            else [None] * t.num_rows
        descs = t[desc_col].to_pylist() if desc_col in t.column_names \
            else [None] * t.num_rows
        for wkb, nm, ds in zip(t[wkb_col].to_pylist(), names, descs):
            out.append("<Placemark>")
            if nm:
                out.append(f"<name>{_xml_escape(nm)}</name>")
            if ds:
                out.append(f"<description>{_xml_escape(ds)}</description>")
            if wkb:
                out.append(_wkb_to_kml_geom(_zparse(bytes(wkb), 0)[0]))
            out.append("</Placemark>")
        out.append("</Folder>")
    out += ["</Document>", "</kml>"]
    text = "\n".join(out)
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    return text
