"""TopoJSON vector reader, from scratch.

Mirrors the reference's TopoJSON driver
(``ogr/ogrsf_frmts/geojson/ogrtopojsonreader.cpp``) semantics, derived
from its test matrix (``autotest/ogr/ogr_topojson.py``):

* ``arcs`` are delta-encoded and quantized when a ``transform``
  (scale/translate) is present, absolute otherwise,
* negative arc index ``i`` means arc ``~i`` reversed; consecutive
  stitched arcs drop the duplicated join point,
* ``objects`` may be a dict (keys are layer names) or an array
  (GeometryCollections become layers named by their ``id``); all
  non-collection geometries pool into a ``TopoJSON`` layer,
* every feature carries exactly the ``id`` and ``name`` fields
  (from the object's ``id`` or its ``properties``), stringified,
* malformed coordinates/arcs degrade to typed EMPTY geometries, never
  errors (the reference's tolerant reader).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

__all__ = ["read_topojson"]


def _loads_tolerant(text):
    """json-c-style parse: the reference's fixtures carry trailing
    commas before ``]``/``}``, which strict JSON rejects.  Strip them
    outside string literals, then parse strictly."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    out = []
    in_str = False
    esc = False
    pend = None            # a held-back comma awaiting a non-space
    for ch in text:
        if in_str:
            out.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if pend is not None:
            if ch.isspace():
                pend += ch
                continue
            if ch not in "]}":
                out.append(pend)
            else:
                out.append(pend[1:])   # drop the comma, keep spacing
            pend = None
        if ch == ",":
            pend = ch
            continue
        out.append(ch)
        if ch == '"':
            in_str = True
    if pend is not None:
        out.append(pend)
    return json.loads("".join(out))


_LE = 1
_CODES = {"Point": 1, "LineString": 2, "Polygon": 3, "MultiPoint": 4,
          "MultiLineString": 5, "MultiPolygon": 6}


def _wkb_empty(code):
    if code == 1:
        return struct.pack("<BIdd", _LE, 1, float("nan"), float("nan"))
    return struct.pack("<BII", _LE, code, 0)


def _wkb_point(x, y):
    return struct.pack("<BIdd", _LE, 1, x, y)


def _wkb_line(pts):
    out = [struct.pack("<BII", _LE, 2, len(pts))]
    out += [struct.pack("<dd", x, y) for x, y in pts]
    return b"".join(out)


def _wkb_poly(rings):
    out = [struct.pack("<BII", _LE, 3, len(rings))]
    for r in rings:
        out.append(struct.pack("<I", len(r)))
        out += [struct.pack("<dd", x, y) for x, y in r]
    return b"".join(out)


def _wkb_multi(code, parts):
    return (struct.pack("<BII", _LE, code, len(parts)) +
            b"".join(parts))


def _decode_arcs(doc):
    """arcs → list of point lists (or None for malformed arcs)."""
    tr = doc.get("transform") if isinstance(doc.get("transform"),
                                            dict) else None
    if tr:
        sx, sy = tr.get("scale", [1, 1])
        tx, ty = tr.get("translate", [0, 0])
    arcs = []
    raw = doc.get("arcs")
    if not isinstance(raw, list):
        return []
    for arc in raw:
        if not isinstance(arc, list) or not arc:
            arcs.append(None)
            continue
        pts = []
        cx = cy = 0.0
        ok = True
        for p in arc:
            if not isinstance(p, list) or len(p) < 2 or \
                    not all(isinstance(v, (int, float)) for v in p[:2]):
                ok = False
                break
            if tr:
                cx += p[0]
                cy += p[1]
                pts.append((cx * sx + tx, cy * sy + ty))
            else:
                pts.append((float(p[0]), float(p[1])))
        arcs.append(pts if ok and pts else None)
    return arcs


def _stitch(indices, arcs):
    """arc index list → point list, or None if any index is invalid."""
    if not isinstance(indices, list) or not indices:
        return None
    pts = []
    for idx in indices:
        if not isinstance(idx, int) or isinstance(idx, bool):
            return None
        j = ~idx if idx < 0 else idx
        if j < 0 or j >= len(arcs) or arcs[j] is None:
            return None
        seg = arcs[j][::-1] if idx < 0 else arcs[j]
        if pts and pts[-1] == seg[0]:
            seg = seg[1:]
        pts.extend(seg)
    return pts if len(pts) >= 2 else None


def _point_of(coords, tr):
    if not isinstance(coords, list) or len(coords) < 2 or \
            not all(isinstance(v, (int, float)) and
                    not isinstance(v, bool) for v in coords[:2]):
        return None
    x, y = float(coords[0]), float(coords[1])
    if tr:
        sx, sy = tr.get("scale", [1, 1])
        tx, ty = tr.get("translate", [0, 0])
        return (x * sx + tx, y * sy + ty)
    return (x, y)


def _geom_wkb(g, arcs, tr):
    """Geometry object → WKB, EMPTY WKB, or None (feature dropped).

    The reference drops a feature outright when the ``coordinates`` /
    ``arcs`` member is missing, JSON ``null`` or not an array
    (ogrtopojsonreader.cpp only instantiates a feature once that array
    exists); malformed *contents* of the array degrade to a typed
    EMPTY geometry instead (autotest/ogr/ogr_topojson.py expected
    matrix)."""
    t = g.get("type")
    code = _CODES.get(t if isinstance(t, str) else "")
    if code is None:
        return None
    member = "coordinates" if t in ("Point", "MultiPoint") else "arcs"
    body = g.get(member)
    if not isinstance(body, list):
        return None
    if t == "Point":
        p = _point_of(body, tr)
        return _wkb_point(*p) if p else _wkb_empty(1)
    if t == "MultiPoint":
        if not body:
            return _wkb_empty(4)
        pts = [_point_of(c, tr) for c in body]
        if any(p is None for p in pts):
            return _wkb_empty(4)
        return _wkb_multi(4, [_wkb_point(*p) for p in pts])
    if t == "LineString":
        pts = _stitch(body, arcs)
        return _wkb_line(pts) if pts else _wkb_empty(2)
    if t == "MultiLineString":
        if not body:
            return _wkb_empty(5)
        lines = [_stitch(a, arcs) for a in body]
        if any(x is None for x in lines):
            return _wkb_empty(5)
        return _wkb_multi(5, [_wkb_line(p) for p in lines])
    if t == "Polygon":
        if not body or not all(isinstance(a, list) for a in body):
            return _wkb_empty(3)
        rings = [_stitch(a, arcs) for a in body]
        if any(r is None for r in rings):
            return _wkb_empty(3)
        return _wkb_poly(rings)
    if t == "MultiPolygon":
        if not body:
            return _wkb_empty(6)
        polys = []
        for pol in body:
            if not isinstance(pol, list) or not pol or \
                    not all(isinstance(a, list) for a in pol):
                return _wkb_empty(6)
            rings = [_stitch(a, arcs) for a in pol]
            if any(r is None for r in rings):
                return _wkb_empty(6)
            polys.append(_wkb_poly(rings))
        return _wkb_multi(6, polys)
    return None


def _str_of(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _feature_row(g, arcs, tr):
    wkb = _geom_wkb(g, arcs, tr)
    if wkb is None:
        return None
    fid = _str_of(g.get("id"))
    name = None
    props = g.get("properties")
    if isinstance(props, dict):
        if fid is None:
            fid = _str_of(props.get("id"))
        name = _str_of(props.get("name"))
    return (fid, name, wkb)


def read_topojson(src):
    """TopoJSON document (path / str / dict) → dict of layer name →
    Arrow table (fid, id, name, wkb)."""
    if isinstance(src, dict):
        doc = src
    elif isinstance(src, (bytes, bytearray)):
        doc = _loads_tolerant(src.decode("utf-8-sig"))
    elif isinstance(src, str) and src.lstrip().startswith("{"):
        doc = _loads_tolerant(src)
    else:
        with open(src, encoding="utf-8-sig") as f:
            doc = _loads_tolerant(f.read())
    if doc.get("type") != "Topology":
        raise ValueError("not a TopoJSON Topology document")
    arcs = _decode_arcs(doc)
    tr = doc.get("transform") if isinstance(doc.get("transform"),
                                            dict) else None

    layers: dict[str, list] = {}
    pool: list = []

    def add_gc(name, gc):
        rows = []
        geoms = gc.get("geometries")
        if isinstance(geoms, list):
            for g in geoms:
                if isinstance(g, dict):
                    row = _feature_row(g, arcs, tr)
                    if row:
                        rows.append(row)
        layers[name] = rows

    objs = doc.get("objects")
    if isinstance(objs, dict):
        for key, obj in objs.items():
            if not isinstance(obj, dict):
                continue
            if obj.get("type") == "GeometryCollection":
                add_gc(key, obj)
            else:
                row = _feature_row(obj, arcs, tr)
                if row:
                    pool.append(row)
    elif isinstance(objs, list):
        for obj in objs:
            if not isinstance(obj, dict):
                continue
            if obj.get("type") == "GeometryCollection":
                if obj.get("geometries") is not None:
                    add_gc(_str_of(obj.get("id")) or "TopoJSON",
                           obj)
            else:
                row = _feature_row(obj, arcs, tr)
                if row:
                    pool.append(row)
    if pool:
        layers["TopoJSON"] = pool

    crs = _crs_code(doc.get("crs"))
    meta = {b"crs": crs.encode()} if crs else None
    out = {}
    for name, rows in layers.items():
        tbl = pa.table({
            "fid": pa.array(np.arange(len(rows), dtype=np.int64)),
            "id": pa.array([r[0] for r in rows], pa.string()),
            "name": pa.array([r[1] for r in rows], pa.string()),
            "wkb": pa.array([r[2] for r in rows], pa.binary()),
        })
        if meta:
            tbl = tbl.replace_schema_metadata(meta)
        out[name] = tbl
    return out


def _crs_code(crs):
    """Named-CRS member → ``EPSG:n`` string (CRS84 folds to 4326, the
    reference's OGRSpatialReference importFromURN behaviour)."""
    if not isinstance(crs, dict) or crs.get("type") != "name":
        return None
    props = crs.get("properties")
    name = props.get("name") if isinstance(props, dict) else None
    if not isinstance(name, str):
        return None
    low = name.lower()
    if "crs84" in low or low.endswith("epsg::4326") \
            or low.endswith("epsg:4326"):
        return "EPSG:4326"
    for sep in ("::", ":"):
        tail = low.rsplit(sep, 1)[-1]
        if tail.isdigit() and "epsg" in low:
            return "EPSG:" + tail
    return None
