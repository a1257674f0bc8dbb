"""GeoRSS vector reader/writer (RSS 2.0 + Atom 1.0), from scratch.

Mirrors the reference's GeoRSS driver (``ogr/ogrsf_frmts/georss/``)
semantics, derived from its published test matrix
(``autotest/ogr/ogr_georss.py``):

* RSS ``channel/item`` and Atom ``feed/entry`` documents both open as
  one layer named ``georss``,
* field flattening: nested person/content constructs join with ``_``
  (``author_name``), attributes append their name (``link_rel``,
  ``category_domain``, ``content_xml_lang``), repeated elements number
  from 2 (``link2_href``, ``contributor2_name``, ``category2``),
* ``pubDate`` (RFC 822) and ``updated``/``published`` (RFC 3339)
  render in GDAL's ``YYYY/MM/DD HH:MM:SS±HH`` form
  (``Sun, 07 Dec 2008 20:13:00 +0200`` → ``2008/12/07 20:13:00+02``),
* GeoRSS-simple geometries are lat,lon ordered: ``georss:point``,
  ``georss:line``, ``georss:polygon`` (single outer ring),
  ``georss:box`` (lat1 lon1 lat2 lon2 → the box polygon the reference
  emits: (lon1 lat1, lon1 lat2, lon2 lat2, lon2 lat1, close)),
* ``georss:where`` wraps GML geometries (axis-swapped, reuses the GML
  reader's geometry parser),
* ``content`` with XML payloads keeps the serialized inner XML
  (the reference's ``<div xmlns=...`` expectation).

The writer emits RSS 2.0 by default or Atom with ``fmt="atom"``; the
atom writer reconstitutes flattened fields into nested elements and
attributes so the reference's write-then-read test sequence
(``test_ogr_georss_1bis``) round-trips.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

from ..geo import wkb as W
from .gml import _geom_wkb

__all__ = ["read_georss", "write_georss"]

_GEORSS_NS = "http://www.georss.org/georss"
_ATOM_NS = "http://www.w3.org/2005/Atom"
_XML_NS = "http://www.w3.org/XML/1998/namespace"

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}

_RFC822 = re.compile(
    r"(?:\w{3},\s*)?(\d{1,2})\s+(\w{3})\s+(\d{4})\s+"
    r"(\d{2}):(\d{2}):(\d{2})\s*([+-]\d{4}|\w{1,3})?")
_RFC3339 = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})"
    r"(?:\.\d+)?(Z|[+-]\d{2}:?\d{2})?")

_DATE_FIELDS = {"pubDate", "updated", "published", "lastBuildDate", "dc_date"}


def _tz_suffix(tz):
    if not tz or tz in ("Z", "UT", "GMT", "UTC"):
        return "+00"
    tz = tz.replace(":", "")
    if re.fullmatch(r"[+-]\d{4}", tz):
        hh, mm = tz[:3], tz[3:]
        return hh if mm == "00" else f"{hh}:{mm}"
    return "+00"


def _parse_date(text, field):
    if field not in _DATE_FIELDS:
        return None
    m = _RFC822.fullmatch(text.strip())
    if m and m.group(2) in _MONTHS:
        d, mon, y, hh, mm, ss, tz = m.groups()
        return (f"{y}/{_MONTHS[mon]:02d}/{int(d):02d} "
                f"{hh}:{mm}:{ss}{_tz_suffix(tz)}")
    m = _RFC3339.fullmatch(text.strip())
    if m:
        y, mon, d, hh, mm, ss, tz = m.groups()
        return f"{y}/{mon}/{d} {hh}:{mm}:{ss}{_tz_suffix(tz)}"
    return None


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _attr_key(k):
    if k.startswith("{%s}" % _XML_NS):
        return "xml_" + k.rsplit("}", 1)[-1]
    return _local(k)


def _inner_xml(elem):
    parts = [elem.text or ""]
    for child in elem:
        ns = child.tag.split("}")[0].lstrip("{") if "}" in child.tag \
            else None
        try:                       # serialize xhtml payloads with their
            s = ET.tostring(child, encoding="unicode",   # default xmlns
                            default_namespace=ns)
        except ValueError:
            s = ET.tostring(child, encoding="unicode")
        parts.append(s)
        parts.append(child.tail or "")
    return "".join(parts).strip()


def _numbered(base, counts):
    n = counts.get(base, 0) + 1
    counts[base] = n
    return base if n == 1 else f"{base}{n}"


def _simple_coords(text):
    vals = [float(v) for v in text.replace(",", " ").split()]
    return [(vals[i + 1], vals[i]) for i in range(0, len(vals) - 1, 2)]


def _item_geom(item):
    for child in item:
        ns, name = (child.tag.rsplit("}", 1) + [""])[:2] \
            if "}" in child.tag else ("", child.tag)
        ns = ns.lstrip("{")
        if ns != _GEORSS_NS:
            continue
        if name == "point":
            pts = _simple_coords(child.text or "")
            if pts:
                return W.point_wkb(*pts[0])
        elif name == "line":
            return W.linestring_wkb(_simple_coords(child.text or ""))
        elif name == "polygon":
            ring = _simple_coords(child.text or "")
            return W.polygon_wkb([ring])
        elif name == "box":
            vals = [float(v) for v in (child.text or "").split()]
            if len(vals) >= 4:
                lat1, lon1, lat2, lon2 = vals[:4]
                ring = [(lon1, lat1), (lon1, lat2), (lon2, lat2),
                        (lon2, lat1), (lon1, lat1)]
                return W.polygon_wkb([ring])
        elif name == "where":
            for g in child:
                if _local(g.tag) == "Envelope":
                    lo = g.find("{*}lowerCorner")
                    up = g.find("{*}upperCorner")
                    if lo is None or up is None:
                        continue
                    lat1, lon1 = [float(v) for v in lo.text.split()[:2]]
                    lat2, lon2 = [float(v) for v in up.text.split()[:2]]
                    ring = [(lon1, lat1), (lon1, lat2), (lon2, lat2),
                            (lon2, lat1), (lon1, lat1)]
                    return W.polygon_wkb([ring])
                wkb = _geom_wkb(g, swap=True)
                if wkb is not None:
                    return wkb
    return None


_SKIP = {_GEORSS_NS}


def _flatten(item, row, counts):
    for child in item:
        if "}" in child.tag and child.tag.split("}")[0].lstrip("{") in _SKIP:
            continue
        name = _local(child.tag)
        key = _numbered(name, counts)
        has_elem_children = len(child) > 0
        text = (child.text or "").strip()
        if name == "content" and has_elem_children:
            row[key] = _inner_xml(child)
        elif has_elem_children:
            for sub in child:
                sname = f"{key}_{_local(sub.tag)}"
                sval = (sub.text or "").strip()
                if sval:
                    row[sname] = sval
        elif text:
            row[key] = _parse_date(text, name) or text
        for k, v in child.attrib.items():
            row[f"{key}_{_attr_key(k)}"] = v


def read_georss(src, wkb_col="wkb"):
    """GeoRSS/Atom document (path / str / bytes) → Arrow table
    (fid, flattened fields..., wkb)."""
    if isinstance(src, (bytes, bytearray)):
        root = ET.fromstring(src)
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        root = ET.fromstring(src)
    else:
        root = ET.parse(src).getroot()

    tag = _local(root.tag)
    if tag == "rss":
        channel = root.find("channel")
        items = channel.findall("item") if channel is not None else []
    elif tag == "feed":
        items = [e for e in root if _local(e.tag) == "entry"]
    else:
        raise ValueError("not a GeoRSS/Atom document")

    rows, wkbs, names, seen = [], [], [], set()
    for item in items:
        row, counts = {}, {}
        _flatten(item, row, counts)
        rows.append(row)
        wkbs.append(_item_geom(item))
        for k in row:
            if k not in seen:
                seen.add(k)
                names.append(k)

    arrays = [pa.array(list(range(1, len(rows) + 1)), type=pa.int64())]
    out_names = ["fid"]
    for n in names:
        vals = [r.get(n) for r in rows]
        ints = all(v is None or re.fullmatch(r"-?\d+", v) for v in vals)
        if ints and any(v is not None for v in vals) and n.endswith(
                ("_length",)):
            arrays.append(pa.array(
                [None if v is None else int(v) for v in vals],
                type=pa.int64()))
        else:
            arrays.append(pa.array(vals, type=pa.string()))
        out_names.append(n)
    out_names.append(wkb_col)
    arrays.append(pa.array(wkbs, type=pa.binary()))
    return pa.table(arrays, names=out_names)


# ---------------------------------------------------------------- writer

_ATOM_ATTRS = {
    "link": {"rel", "type", "href", "hreflang", "length", "title"},
    "category": {"domain", "term", "scheme", "label"},
    "content": {"type"},
    "generator": {"uri", "version"},
}
_STRIP_NUM = re.compile(r"^([a-zA-Z]+?)(\d+)?$")


def _gdal_dt_to_rfc3339(v):
    m = re.fullmatch(
        r"(\d{4})/(\d{2})/(\d{2}) (\d{2}):(\d{2}):(\d{2})"
        r"([+-]\d{2}(?::?\d{2})?)?", v)
    if not m:
        return v
    y, mo, d, hh, mm, ss, tz = m.groups()
    if not tz or tz == "+00":
        tzs = "Z"
    else:
        tzs = tz if ":" in tz or len(tz) == 3 else tz
        if len(tzs) == 3:
            tzs += ":00"
    return f"{y}-{mo}-{d}T{hh}:{mm}:{ss}{tzs}"


def _wkb_simple(buf):
    """WKB → (tag, 'lat lon ...') GeoRSS-simple pair."""
    kind, data = W.parse_wkb(buf)
    if kind == W.POINT:
        return "point", f"{data[0][1]:.6g} {data[0][0]:.6g}"
    if kind == W.LINESTRING:
        return "line", " ".join(f"{y:.6g} {x:.6g}" for x, y in data)
    if kind == W.POLYGON and len(data):
        return "polygon", " ".join(f"{y:.6g} {x:.6g}" for x, y in data[0])
    return None, None


def write_georss(table, path, fmt="rss", wkb_col="wkb"):
    """Arrow table (flattened fields + wkb) → GeoRSS RSS 2.0 or Atom
    document; inverse of :func:`read_georss`."""
    cols = [n for n in table.column_names if n not in ("fid", wkb_col)]
    rows = table.to_pylist()
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    atom = fmt.lower() == "atom"
    if atom:
        out.append(f'<feed xmlns="{_ATOM_NS}" '
                   f'xmlns:georss="{_GEORSS_NS}">')
        item_tag = "entry"
    else:
        out.append(f'<rss version="2.0" xmlns:georss="{_GEORSS_NS}">')
        out.append("<channel>")
        out.append("<title>raydal</title><link>.</link>"
                   "<description>raydal</description>")
        item_tag = "item"

    for r in rows:
        out.append(f"<{item_tag}>")
        # Group flattened names back into (element, n, sub) parts.
        groups: dict[str, dict] = {}
        order: list[str] = []
        for name in cols:
            v = r.get(name)
            if v is None:
                continue
            head, _, rest = name.partition("_")
            m = _STRIP_NUM.fullmatch(head)
            base, num = (m.group(1), m.group(2) or "") if m else (head, "")
            gkey = head
            if gkey not in groups:
                groups[gkey] = {"elem": base, "attrs": {}, "subs": {},
                                "text": None}
                order.append(gkey)
            g = groups[gkey]
            v = str(v)
            if name in ("updated", "published", "pubDate",
                        "lastBuildDate"):
                v = _gdal_dt_to_rfc3339(v) if atom else v
            if not rest:
                g["text"] = v
            elif rest in ("xml_lang", "xml_base"):
                g["attrs"]["xml:" + rest[4:]] = v
            elif rest in _ATOM_ATTRS.get(g["elem"], set()) or (
                    not atom and rest == "domain"):
                g["attrs"][rest] = v
            else:
                g["subs"][rest] = v
        for gkey in order:
            g = groups[gkey]
            attrs = "".join(f' {k}="{escape(v, {chr(34): "&quot;"})}"'
                            for k, v in g["attrs"].items())
            body = ""
            if g["elem"] == "content" and g["text"] and \
                    g["text"].lstrip().startswith("<"):
                body = g["text"]
            elif g["text"] is not None:
                body = escape(g["text"])
            for k, v in g["subs"].items():
                body += f"<{k}>{escape(v)}</{k}>"
            if body:
                out.append(f"<{g['elem']}{attrs}>{body}</{g['elem']}>")
            else:
                out.append(f"<{g['elem']}{attrs}/>")
        wkb = r.get(wkb_col)
        if wkb:
            tag, txt = _wkb_simple(wkb)
            if tag:
                out.append(f"<georss:{tag}>{txt}</georss:{tag}>")
        out.append(f"</{item_tag}>")

    out.append("</feed>" if atom else "</channel></rss>")
    data = "\n".join(out).encode("utf-8")
    with open(path, "wb") as f:
        f.write(data)
    return path
