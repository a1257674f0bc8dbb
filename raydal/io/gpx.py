"""GPX vector reader/writer, from scratch on ``xml.etree``.

Reproduces the reference GPX driver's five-layer model
(``ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp``): ``waypoints`` (Point per
``<wpt>``), ``routes`` (LineString per ``<rte>`` over its ``rtept``s —
EMPTY when a route has none), ``tracks`` (MultiLineString per ``<trk>``
with one line per non-empty ``trkseg`` — EMPTY when all segments are
empty, ``autotest/ogr/ogr_gpx.py`` test_ogr_gpx_4), ``route_points``
and ``track_points`` (Point per ``rtept``/``trkpt`` with parent FIDs
and segment ids).  Coordinates come from the ``lat``/``lon``
attributes (x = lon, y = lat); ``<ele>`` stays a float field (the
reference's default, 2.5D only behind GPX_ELE_AS_25D); ``<link>``
children flatten to ``link1_href``/``link1_text``/``link1_type``/
``link2_…`` fields; ``<time>`` is kept as the raw ISO-8601 string.

Validated against the published test.gpx expectations
(autotest/ogr/ogr_gpx.py tests 1-5: layer count 5, field values,
geometry WKTs incl. the EMPTY route/track cases).
"""

from __future__ import annotations

import struct
import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = ["read_gpx", "write_gpx"]

_WPT_FIELDS = ("ele", "time", "magvar", "geoidheight", "name", "cmt",
               "desc", "src", "sym", "type")
_FLOAT_FIELDS = {"ele", "magvar", "geoidheight"}
_N_LINKS = 2


def _local(tag):
    return tag.split("}", 1)[1] if isinstance(tag, str) and \
        tag.startswith("{") else tag


def _children(elem):
    return {(_local(c.tag)): c for c in elem}


def _point_wkb(lon, lat):
    return struct.pack("<BIdd", 1, 1, lon, lat)


def _linestring_wkb(pts):
    return struct.pack("<BII", 1, 2, len(pts)) + \
        b"".join(struct.pack("<dd", x, y) for x, y in pts)


def _multilinestring_wkb(lines):
    return struct.pack("<BII", 1, 5, len(lines)) + \
        b"".join(_linestring_wkb(ln) for ln in lines)


def _pt_fields(elem, row):
    for c in elem:
        t = _local(c.tag)
        if t in _WPT_FIELDS:
            txt = (c.text or "").strip()
            row[t] = float(txt) if t in _FLOAT_FIELDS and txt else \
                (txt or None)
        elif t == "link":
            for i in range(1, _N_LINKS + 1):
                if f"link{i}_href" not in row:
                    row[f"link{i}_href"] = c.get("href")
                    sub = _children(c)
                    row[f"link{i}_text"] = (sub.get("text") is not None
                                            and sub["text"].text) or None
                    row[f"link{i}_type"] = (sub.get("type") is not None
                                            and sub["type"].text) or None
                    break


def _pt_schema_cols(rows):
    names = list(_WPT_FIELDS) + [f"link{i}_{k}" for i in
                                 range(1, _N_LINKS + 1)
                                 for k in ("href", "text", "type")]
    cols = {}
    for n in names:
        typ = pa.float64() if n in _FLOAT_FIELDS else pa.string()
        cols[n] = pa.array([r.get(n) for r in rows], typ)
    return cols


def read_gpx(src):
    """GPX document (path, str or bytes) → dict of the five layer
    tables (waypoints, routes, tracks, route_points, track_points),
    each with fid + fields + wkb."""
    if isinstance(src, (bytes, bytearray)):
        root = ET.fromstring(bytes(src))
    elif isinstance(src, str) and src.lstrip().startswith("<"):
        root = ET.fromstring(src)
    else:
        root = ET.parse(src).getroot()
    if _local(root.tag) != "gpx":
        raise ValueError("not a GPX document (missing <gpx> root)")

    wpt_rows, wpt_geom = [], []
    rte_rows, rte_geom = [], []
    trk_rows, trk_geom = [], []
    rtep_rows, rtep_geom, rtep_fid = [], [], []
    trkp_rows, trkp_geom, trkp_ids = [], [], []

    for el in root:
        t = _local(el.tag)
        if t == "wpt":
            row = {}
            _pt_fields(el, row)
            wpt_rows.append(row)
            wpt_geom.append(_point_wkb(float(el.get("lon")),
                                       float(el.get("lat"))))
        elif t == "rte":
            row, pts = {}, []
            _pt_fields(el, row)
            for c in el:
                if _local(c.tag) == "rtept":
                    xy = (float(c.get("lon")), float(c.get("lat")))
                    pts.append(xy)
                    prow = {}
                    _pt_fields(c, prow)
                    rtep_rows.append(prow)
                    rtep_geom.append(_point_wkb(*xy))
                    rtep_fid.append(len(rte_rows))
            rte_rows.append(row)
            rte_geom.append(_linestring_wkb(pts))
        elif t == "trk":
            row = {}
            _pt_fields(el, row)
            lines, seg_id = [], 0
            for c in el:
                if _local(c.tag) != "trkseg":
                    continue
                pts, pt_id = [], 0
                for p in c:
                    if _local(p.tag) != "trkpt":
                        continue
                    xy = (float(p.get("lon")), float(p.get("lat")))
                    pts.append(xy)
                    prow = {}
                    _pt_fields(p, prow)
                    trkp_rows.append(prow)
                    trkp_geom.append(_point_wkb(*xy))
                    trkp_ids.append((len(trk_rows), seg_id, pt_id))
                    pt_id += 1
                if pts:
                    lines.append(pts)
                seg_id += 1
            trk_rows.append(row)
            trk_geom.append(_multilinestring_wkb(lines))

    def table(rows, geoms, extra=None):
        cols = {"fid": pa.array(range(len(rows)), pa.int64())}
        if extra:
            cols.update(extra)
        cols.update(_pt_schema_cols(rows))
        cols["wkb"] = pa.array(geoms, pa.binary())
        return pa.Table.from_pydict(cols)

    return {
        "waypoints": table(wpt_rows, wpt_geom),
        "routes": table(rte_rows, rte_geom),
        "tracks": table(trk_rows, trk_geom),
        "route_points": table(
            rtep_rows, rtep_geom,
            {"route_fid": pa.array(rtep_fid, pa.int64())}),
        "track_points": table(
            trkp_rows, trkp_geom,
            {"track_fid": pa.array([i[0] for i in trkp_ids], pa.int64()),
             "track_seg_id": pa.array([i[1] for i in trkp_ids],
                                      pa.int64()),
             "track_seg_point_id": pa.array([i[2] for i in trkp_ids],
                                            pa.int64())}),
    }


# -------------------------------------------------------------- writer

def _esc(s):
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _fields_xml(row, indent="  "):
    out = []
    for k in _WPT_FIELDS:
        v = row.get(k)
        if v is not None and v == v:            # skip None/NaN
            if k in _FLOAT_FIELDS:
                out.append(f"{indent}<{k}>{v:.15g}</{k}>")
            else:
                out.append(f"{indent}<{k}>{_esc(v)}</{k}>")
    for i in range(1, _N_LINKS + 1):
        href = row.get(f"link{i}_href")
        if href is not None:
            inner = "".join(
                f"<{k}>{_esc(row[f'link{i}_{k}'])}</{k}>"
                for k in ("text", "type")
                if row.get(f"link{i}_{k}") is not None)
            out.append(f'{indent}<link href="{_esc(href)}">{inner}'
                       "</link>")
    return out


def _xy_of(wkb):
    x, y = struct.unpack_from("<dd", bytes(wkb), 5)
    return x, y


def _lines_of(wkb):
    buf = bytes(wkb)
    code = struct.unpack_from("<I", buf, 1)[0]
    if code % 1000 == 2:                        # single LineString
        n = struct.unpack_from("<I", buf, 5)[0]
        vals = struct.unpack_from("<" + "d" * (2 * n), buf, 9)
        return [[(vals[2 * i], vals[2 * i + 1]) for i in range(n)]]
    ng = struct.unpack_from("<I", buf, 5)[0]
    off, lines = 9, []
    for _ in range(ng):
        n = struct.unpack_from("<I", buf, off + 5)[0]
        vals = struct.unpack_from("<" + "d" * (2 * n), buf, off + 9)
        lines.append([(vals[2 * i], vals[2 * i + 1]) for i in range(n)])
        off += 9 + 16 * n
    return lines


def write_gpx(layers, path=None):
    """dict with any of ``waypoints`` / ``routes`` / ``tracks`` tables
    (wkb + field columns as produced by :func:`read_gpx`) → GPX text.

    Route/track point fields live on the parent tables only; point
    layers are derived on read, so they are not written back.
    """
    out = ['<?xml version="1.0"?>',
           '<gpx version="1.1" creator="raydal" '
           'xmlns="http://www.topografix.com/GPX/1/1">']
    wp = layers.get("waypoints")
    if wp is not None:
        for row, wkb in zip(wp.to_pylist(), wp["wkb"].to_pylist()):
            x, y = _xy_of(wkb)
            out.append(f'<wpt lat="{y:.15g}" lon="{x:.15g}">')
            out += _fields_xml(row)
            out.append("</wpt>")
    rt = layers.get("routes")
    if rt is not None:
        for row, wkb in zip(rt.to_pylist(), rt["wkb"].to_pylist()):
            out.append("<rte>")
            out += _fields_xml(row)
            for line in _lines_of(wkb):
                for x, y in line:
                    out.append(f'  <rtept lat="{y:.15g}" lon="{x:.15g}"/>')
            out.append("</rte>")
    tk = layers.get("tracks")
    if tk is not None:
        for row, wkb in zip(tk.to_pylist(), tk["wkb"].to_pylist()):
            out.append("<trk>")
            out += _fields_xml(row)
            for line in _lines_of(wkb):
                out.append("  <trkseg>")
                for x, y in line:
                    out.append(f'    <trkpt lat="{y:.15g}" '
                               f'lon="{x:.15g}"/>')
                out.append("  </trkseg>")
            out.append("</trk>")
    out.append("</gpx>")
    text = "\n".join(out)
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    return text
