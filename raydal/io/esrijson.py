"""EsriJSON (ArcGIS FeatureService JSON) vector reader, from scratch.

Mirrors the reference's ESRIJSON driver
(``ogr/ogrsf_frmts/geojson/ogresrijsonreader.cpp``) semantics, derived
from its published test matrix (``autotest/ogr/ogr_esrijson.py``):

* geometry envelopes: ``{"x","y"}`` → POINT (NaN / ``"NaN"`` → empty),
  ``{"points"}`` → MULTIPOINT, ``{"paths"}`` → LINESTRING when exactly
  one path else MULTILINESTRING, ``{"rings"}`` → MULTIPOLYGON with
  hole assignment by point-in-ring containment (a ring whose first
  vertex lies strictly inside an already-accepted exterior becomes one
  of its holes — ``OGRESRIJSONReadPolygon`` + organizePolygons),
  zero rings → POLYGON EMPTY,
* Z/M ordinates are accepted and dropped (2-D engine, same convention
  as the GeoJSON reader),
* the ``fields`` array drives the schema: ``esriFieldTypeOID`` is the
  FID column, ``esriFieldTypeDate`` values are epoch-milliseconds and
  render in GDAL's ``YYYY/MM/DD HH:MM:SS+00`` form
  (``test_ogr_esrijson_read_point`` expects ``2021/12/31 00:00:00+00``
  for 1640908800000),
* documents starting directly at ``{"features": [{"geometry": ...``
  with no ``geometryType`` open fine
  (``esrijsonstartingwithfeaturesgeometry.json``),
* ``spatialReference.wkid`` / ``latestWkid`` is surfaced as an
  ``EPSG:<code>`` string on the table metadata (``crs`` key).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_esrijson", "esri_geometry_to_wkb"]


def _num(v):
    if isinstance(v, (int, float)):
        return float(v)
    return float("nan")


def _point(g):
    x, y = g.get("x"), g.get("y")
    if not isinstance(x, (int, float)) or not isinstance(y, (int, float)):
        return W.point_wkb(float("nan"), float("nan"))
    return W.point_wkb(float(x), float(y))


def _multipoint(g):
    pts = [(p[0], p[1]) for p in g.get("points") or []
           if isinstance(p, list) and len(p) >= 2]
    import struct
    out = [struct.pack("<BII", 1, W.MULTIPOINT, len(pts))]
    for x, y in pts:
        out.append(W.point_wkb(float(x), float(y)))
    return b"".join(out)


def _polyline(g):
    paths = [[(c[0], c[1]) for c in p if isinstance(c, list) and len(c) >= 2]
             for p in g.get("paths") or []]
    if len(paths) == 1:
        return W.linestring_wkb(paths[0])
    import struct
    out = [struct.pack("<BII", 1, W.MULTILINESTRING, len(paths))]
    for p in paths:
        out.append(W.linestring_wkb(p))
    return b"".join(out)


def _polygon(g):
    rings = [[(c[0], c[1]) for c in r if isinstance(c, list) and len(c) >= 2]
             for r in g.get("rings") or []]
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return W.polygon_wkb([])
    # Hole assignment: a ring whose first vertex falls strictly inside
    # an accepted exterior ring is that exterior's hole; otherwise it
    # starts a new polygon (reference: organizePolygons default path).
    polys = []                       # list of [outer, hole, hole, ...]
    for r in rings:
        x0, y0 = r[0]
        placed = False
        for p in polys:
            inside = W.points_in_ring(p[0], [x0], [y0])
            if bool(inside[0]):
                p.append(r)
                placed = True
                break
        if not placed:
            polys.append([r])
    return W.multipolygon_wkb(polys)


def esri_geometry_to_wkb(g):
    """One Esri geometry object → little-endian WKB (2-D)."""
    if not isinstance(g, dict):
        return None
    if "x" in g or "y" in g:
        return _point(g)
    if "points" in g:
        return _multipoint(g)
    if "paths" in g:
        return _polyline(g)
    if "rings" in g:
        return _polygon(g)
    return None


def _fmt_esri_date(ms):
    """Epoch-milliseconds → GDAL's DateTime rendering with a UTC
    offset (``2021/12/31 00:00:00+00``)."""
    try:
        dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    except (OverflowError, OSError, ValueError):
        return None
    base = dt.strftime("%Y/%m/%d %H:%M:%S")
    if dt.microsecond:
        base += (".%03d" % (dt.microsecond // 1000))
    return base + "+00"


def read_esrijson(src, wkb_col="wkb"):
    """EsriJSON document (path / str / bytes / dict) → Arrow table with
    declared fields plus a ``wkb`` geometry column; ``crs`` metadata
    carries ``EPSG:<wkid>`` when a spatialReference is present."""
    if isinstance(src, dict):
        doc = src
    elif isinstance(src, (bytes, bytearray)):
        doc = json.loads(src.decode("utf-8-sig"))
    elif isinstance(src, str) and src.lstrip().startswith("{"):
        doc = json.loads(src)
    else:
        with open(src, encoding="utf-8-sig") as f:
            doc = json.load(f)

    feats = doc.get("features")
    if not isinstance(feats, list):
        raise ValueError("not an EsriJSON feature document")

    fields = doc.get("fields") or []
    oid_name = doc.get("objectIdFieldName") or None
    date_fields, declared = set(), []
    for fd in fields:
        if not isinstance(fd, dict) or not fd.get("name"):
            continue
        name, ftype = fd["name"], fd.get("type", "")
        if ftype == "esriFieldTypeOID" and oid_name is None:
            oid_name = name
        if ftype == "esriFieldTypeDate":
            date_fields.add(name)
        declared.append((name, ftype))

    # Schema: declared order first, then any undeclared keys in
    # first-appearance order (tolerant reader).
    names = [n for n, _ in declared]
    seen = set(names)
    for f in feats:
        attrs = f.get("attributes") if isinstance(f, dict) else None
        if isinstance(attrs, dict):
            for k in attrs:
                if k not in seen:
                    seen.add(k)
                    names.append(k)

    cols = {n: [] for n in names}
    wkbs, fids = [], []
    for f in feats:
        if not isinstance(f, dict):
            continue
        attrs = f.get("attributes") or {}
        for n in names:
            v = attrs.get(n)
            if n in date_fields and isinstance(v, (int, float)):
                v = _fmt_esri_date(v)
            cols[n].append(v)
        wkbs.append(esri_geometry_to_wkb(f.get("geometry")))
        fid = attrs.get(oid_name) if oid_name else None
        fids.append(fid if isinstance(fid, int) else len(fids) + 1)

    arrays, out_names = [], []
    out_names.append("fid")
    arrays.append(pa.array(fids, type=pa.int64()))
    for n in names:
        vals = cols[n]
        typ = _infer(vals)
        if typ == pa.string():
            vals = [None if v is None else
                    (v if isinstance(v, str) else json.dumps(v))
                    for v in vals]
        out_names.append(n)
        arrays.append(pa.array(vals, type=typ))
    out_names.append(wkb_col)
    arrays.append(pa.array(wkbs, type=pa.binary()))

    meta = {}
    sr = doc.get("spatialReference")
    if isinstance(sr, dict):
        code = sr.get("latestWkid") or sr.get("wkid")
        if isinstance(code, int):
            meta[b"crs"] = f"EPSG:{code}".encode()
    t = pa.table(arrays, names=out_names)
    if meta:
        t = t.replace_schema_metadata(meta)
    return t


def _infer(vals):
    has_f = any(isinstance(v, float) for v in vals)
    has_i = any(isinstance(v, int) and not isinstance(v, bool)
                for v in vals)
    has_s = any(isinstance(v, str) for v in vals)
    has_b = any(isinstance(v, bool) for v in vals)
    has_o = any(isinstance(v, (dict, list)) for v in vals)
    kinds = sum([has_f or has_i, has_s, has_b, has_o])
    if has_s or has_o or kinds > 1:
        return pa.string()
    if has_f:
        return pa.float64()
    if has_i:
        return pa.int64()
    if has_b:
        return pa.bool_()
    return pa.string()
