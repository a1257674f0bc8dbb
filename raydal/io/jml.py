"""OpenJUMP JML vector reader/writer, from scratch.

Mirrors the reference's JML driver (``ogr/ogrsf_frmts/jml/``)
semantics, derived from its published test matrix
(``autotest/ogr/ogr_jml.py``):

* the ``JCSGMLInputTemplate`` header declares the schema: each
  ``column`` carries a ``valueElement`` match rule (element name +
  optional gating attribute name/value) and a ``valueLocation``
  (``body`` or a named attribute); columns declared AFTER the closing
  ``</JCSGMLInputTemplate>`` are ignored,
* features are ``FeatureElement``-named descendants of the first
  ``CollectionElement``-named element, matched at any nesting depth
  (the fixture hides them under ``some_element2``); feature-like
  elements outside the collection are ignored,
* each feature's subtree is searched for the geometry element
  (``GeometryElement`` name, GML payload) and for each column's first
  matching element,
* DATE columns normalize to GDAL datetime rendering:
  ``2014/10/18`` → ``2014/10/18 00:00:00``,
  ``2014-10-18T21:36:45.000+0200`` → ``2014/10/18 21:36:45+02``,
* an ``R_G_B`` column yields the reference's implied style string
  (``BRUSH(fc:#hex)`` for polygons, ``PEN(c:#hex)`` otherwise) in an
  ``ogr_style`` output column.

The writer emits GDAL's JML shape (template + body-position string
columns + GML geometry) so write→read round-trips.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

from ..geo import wkb as W
from .gml import _geom_wkb

__all__ = ["read_jml", "write_jml"]


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _norm_datetime(v):
    v = v.strip()
    m = re.fullmatch(r"(\d{4})[/-](\d{2})[/-](\d{2})", v)
    if m:
        return "%s/%s/%s 00:00:00" % m.groups()
    m = re.fullmatch(
        r"(\d{4})[/-](\d{2})[/-](\d{2})[T ](\d{2}):(\d{2}):(\d{2})"
        r"(?:\.\d+)?\s*(Z|[+-]\d{2}:?\d{2})?", v)
    if m:
        y, mo, d, hh, mi, ss, tz = m.groups()
        if not tz or tz == "Z":
            tzs = "" if tz is None else "+00"
        else:
            tz = tz.replace(":", "")
            tzs = tz[:3] if tz[3:] in ("00", "") else f"{tz[:3]}:{tz[3:]}"
        return f"{y}/{mo}/{d} {hh}:{mi}:{ss}{tzs}"
    return v


def _parse_template(root):
    tmpl = None
    for e in root.iter():
        if _local(e.tag) == "JCSGMLInputTemplate":
            tmpl = e
            break
    if tmpl is None:
        raise ValueError("not a JML document (no JCSGMLInputTemplate)")

    def text_of(name, default):
        for e in tmpl:
            if _local(e.tag) == name:
                return (e.text or "").strip() or default
        return default

    collection = text_of("CollectionElement", "featureCollection")
    feature = text_of("FeatureElement", "feature")
    geometry = text_of("GeometryElement", "geometry")

    columns = []
    for col in tmpl.iter():
        if _local(col.tag) == "column":
            name = typ = None
            velem = vloc = None
            for c in col:
                ln = _local(c.tag)
                if ln == "name":
                    name = (c.text or "").strip()
                elif ln == "type":
                    typ = (c.text or "").strip().upper()
                elif ln == "valueElement":
                    velem = c.attrib
                elif ln == "valueLocation":
                    vloc = c.attrib
            if name and velem is not None:
                columns.append({
                    "name": name, "type": typ or "STRING",
                    "elem": velem.get("elementName"),
                    "gate_attr": velem.get("attributeName"),
                    "gate_val": velem.get("attributeValue"),
                    "pos": (vloc or {}).get("position", "body"),
                    "val_attr": (vloc or {}).get("attributeName"),
                })
    return collection, feature, geometry, columns


def _column_value(feat_elem, col):
    for e in feat_elem.iter():
        if e is feat_elem or _local(e.tag) != col["elem"]:
            continue
        if col["gate_attr"] and col["gate_val"] is not None:
            if e.attrib.get(col["gate_attr"]) != col["gate_val"]:
                continue
        if col["pos"] == "attribute":
            if col["val_attr"] in e.attrib:
                return e.attrib[col["val_attr"]]
            continue
        return e.text if e.text is not None else ""
    return None


def _convert(v, typ):
    if v is None or v == "":
        return None
    if typ == "INTEGER":
        try:
            return int(v)
        except ValueError:
            return None
    if typ == "DOUBLE":
        try:
            return float(v)
        except ValueError:
            return None
    if typ == "DATE":
        return _norm_datetime(v)
    return v


def _style_for(rgb, wkb):
    if not rgb or wkb is None:
        return None
    kind = W.wkb_geom_type(wkb) % 1000
    if kind in (W.POLYGON, 6):
        return f"BRUSH(fc:#{rgb})"
    return f"PEN(c:#{rgb})"


def read_jml(src, wkb_col="wkb"):
    """JML document (path / str / bytes) → Arrow table (fid,
    declared columns..., [ogr_style], wkb)."""
    if isinstance(src, (bytes, bytearray)):
        root = ET.fromstring(src)
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        root = ET.fromstring(src)
    else:
        root = ET.parse(src).getroot()

    collection, feature, geometry, columns = _parse_template(root)

    coll_elem = None
    for e in root.iter():
        if _local(e.tag) == collection:
            coll_elem = e
            break
    feats = []

    def _collect(elem):
        for e in elem:
            if _local(e.tag) == feature:
                feats.append(e)          # don't descend into features
            else:
                _collect(e)

    if coll_elem is not None:
        _collect(coll_elem)

    rows, wkbs, styles = [], [], []
    for f in feats:
        row = {}
        for col in columns:
            row[col["name"]] = _convert(_column_value(f, col),
                                        col["type"])
        geom_wkb = None
        for e in f.iter():
            if e is not f and _local(e.tag) == geometry:
                for g in e:
                    geom_wkb = _geom_wkb(g, swap=False)
                    if geom_wkb is not None:
                        break
                break
        rows.append(row)
        wkbs.append(geom_wkb)
        styles.append(_style_for(row.get("R_G_B"), geom_wkb))

    arrays = [pa.array(list(range(1, len(rows) + 1)), type=pa.int64())]
    names = ["fid"]
    _PA = {"INTEGER": pa.int64(), "DOUBLE": pa.float64()}
    for col in columns:
        names.append(col["name"])
        arrays.append(pa.array([r.get(col["name"]) for r in rows],
                               type=_PA.get(col["type"], pa.string())))
    if any(s is not None for s in styles):
        names.append("ogr_style")
        arrays.append(pa.array(styles, type=pa.string()))
    names.append(wkb_col)
    arrays.append(pa.array(wkbs, type=pa.binary()))
    return pa.table(arrays, names=names)


def _gml_geom(wkb):
    if wkb is None:
        return "<gml:GeometryCollection></gml:GeometryCollection>"
    kind, data = W.parse_wkb(wkb)
    base = kind % 1000

    def coords(arr):
        return " ".join(f"{x:.10g},{y:.10g}" for x, y in arr)

    if base == W.POINT:
        return (f"<gml:Point><gml:coordinates>{coords(data)}"
                "</gml:coordinates></gml:Point>")
    if base == W.LINESTRING:
        return (f"<gml:LineString><gml:coordinates>{coords(data)}"
                "</gml:coordinates></gml:LineString>")
    if base == W.POLYGON:
        parts = ["<gml:Polygon>"]
        for i, ring in enumerate(data):
            wrap = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            parts.append(f"<gml:{wrap}><gml:LinearRing><gml:coordinates>"
                         f"{coords(ring)}</gml:coordinates>"
                         f"</gml:LinearRing></gml:{wrap}>")
        parts.append("</gml:Polygon>")
        return "".join(parts)
    raise ValueError(f"JML writer: unsupported geometry kind {kind}")


_JML_TYPES = {pa.int64(): "INTEGER", pa.int32(): "INTEGER",
              pa.float64(): "DOUBLE", pa.float32(): "DOUBLE"}


def write_jml(table, path, wkb_col="wkb"):
    """Arrow table → JML document; inverse of :func:`read_jml`."""
    cols = [n for n in table.column_names
            if n not in ("fid", "ogr_style", wkb_col)]
    out = ["<?xml version='1.0' encoding='UTF-8'?>",
           "<JCSDataFile xmlns:gml=\"http://www.opengis.net/gml\" "
           "xmlns:xsi=\"http://www.w3.org/2000/10/XMLSchema-instance\">",
           "<JCSGMLInputTemplate>",
           "<CollectionElement>featureCollection</CollectionElement>",
           "<FeatureElement>feature</FeatureElement>",
           "<GeometryElement>geometry</GeometryElement>",
           "<ColumnDefinitions>"]
    for n in cols:
        typ = _JML_TYPES.get(table.schema.field(n).type, "STRING")
        out.append(
            "<column><name>%s</name><type>%s</type>"
            "<valueElement elementName=\"property\" "
            "attributeName=\"name\" attributeValue=\"%s\"/>"
            "<valueLocation position=\"body\"/></column>"
            % (escape(n), typ, escape(n, {'"': "&quot;"})))
    out.append("</ColumnDefinitions>")
    out.append("</JCSGMLInputTemplate>")
    out.append("<featureCollection>")
    for r in table.to_pylist():
        out.append("<feature>")
        out.append("<geometry>%s</geometry>" % _gml_geom(r.get(wkb_col)))
        for n in cols:
            v = r.get(n)
            if v is None:
                continue
            out.append("<property name=\"%s\">%s</property>"
                       % (escape(n, {'"': "&quot;"}), escape(str(v))))
        out.append("</feature>")
    out.append("</featureCollection>")
    out.append("</JCSDataFile>")
    with open(path, "wb") as f:
        f.write("\n".join(out).encode("utf-8"))
    return path
