"""GeoJSON reader/writer (RFC 7946) — the reference's most-used text
vector format (``ogr/ogrsf_frmts/geojson/``), reimplemented on stdlib
``json`` with Arrow/WKB output.

Parity pieces replicated from the reference:

* geometry model: all seven OGC types incl. nested GeometryCollection,
  converted straight to/from little-endian WKB (the engine's native
  geometry layout); Z ordinates are accepted and dropped (engine is 2-D),
* schema union across features with GDAL's field-ordering semantics:
  consecutive property keys form edges of a directed acyclic graph,
  cycle-creating edges are skipped, and the layer schema is Kahn's
  topological order with ties broken by FIELD NAME
  (``ogr/ogrsf_frmts/geojson/directedacyclicgraph.hpp:205-246``
  ``getTopologicalOrdering``; validated against the published
  ``sparse_fields.geojson`` order in
  ``autotest/ogr/ogr_geojson.py::test_ogr_geojson_sparse_fields``),
* bare ``{"features": [...]}`` objects (no ``"type"``) open like
  FeatureCollections (``autotest/ogr/ogr_geojson.py::test_ogr_geojson_67``,
  #7198), and a single Geometry / single Feature document is promoted to
  a one-row collection (``OGRGeoJSONReader`` accepts all three roots).

Property typing: bool → bool, int → int64, float → float64, string →
string; mixed int/float promotes to float64; nested objects/arrays are
serialized back to JSON strings (the reference's default non-flattening
behavior maps them to String-typed JSON).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

from ..geo import wkb as W

__all__ = ["geojson_to_wkb", "wkb_to_geojson", "read_geojson",
           "write_geojson", "read_geojson_dataset"]

_LE = 1
_TYPE_CODE = {"Point": W.POINT, "LineString": W.LINESTRING,
              "Polygon": W.POLYGON, "MultiPoint": W.MULTIPOINT,
              "MultiLineString": W.MULTILINESTRING,
              "MultiPolygon": W.MULTIPOLYGON,
              "GeometryCollection": W.GEOMETRYCOLLECTION}
_CODE_TYPE = {v: k for k, v in _TYPE_CODE.items()}


def _coords_bytes(coords):
    a = np.asarray(coords, dtype="<f8")[:, :2]
    return struct.pack("<I", len(a)) + a.tobytes()


def geojson_to_wkb(geom):
    """GeoJSON geometry dict → little-endian 2-D WKB (None passes
    through for null geometries)."""
    if geom is None:
        return None
    t = geom.get("type")
    if t not in _TYPE_CODE:
        raise ValueError(f"unsupported GeoJSON geometry type {t!r}")
    code = _TYPE_CODE[t]
    if t == "GeometryCollection":
        parts = [geojson_to_wkb(g) for g in geom.get("geometries", [])]
        return (struct.pack("<BII", _LE, code, len(parts))
                + b"".join(parts))
    c = geom.get("coordinates")
    if t == "Point":
        return struct.pack("<BIdd", _LE, code, float(c[0]), float(c[1]))
    if t == "LineString":
        return struct.pack("<BI", _LE, code) + _coords_bytes(c)
    if t == "Polygon":
        return (struct.pack("<BII", _LE, code, len(c))
                + b"".join(_coords_bytes(r) for r in c))
    if t == "MultiPoint":
        parts = [geojson_to_wkb({"type": "Point", "coordinates": p})
                 for p in c]
    elif t == "MultiLineString":
        parts = [geojson_to_wkb({"type": "LineString", "coordinates": p})
                 for p in c]
    else:  # MultiPolygon
        parts = [geojson_to_wkb({"type": "Polygon", "coordinates": p})
                 for p in c]
    return struct.pack("<BII", _LE, code, len(parts)) + b"".join(parts)


def _coords_list(arr):
    return [[float(x), float(y)] for x, y in np.asarray(arr)]


def _payload_to_geojson(t, payload):
    if t == W.POINT:
        x, y = np.asarray(payload)[0]
        return {"type": "Point", "coordinates": [float(x), float(y)]}
    if t == W.LINESTRING:
        return {"type": "LineString", "coordinates": _coords_list(payload)}
    if t == W.POLYGON:
        return {"type": "Polygon",
                "coordinates": [_coords_list(r) for r in payload]}
    sub = [_payload_to_geojson(st, sp) for (st, sp) in payload]
    if t == W.MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [g["coordinates"] for g in sub]}
    if t == W.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [g["coordinates"] for g in sub]}
    if t == W.MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [g["coordinates"] for g in sub]}
    return {"type": "GeometryCollection", "geometries": sub}


def wkb_to_geojson(buf):
    """WKB → GeoJSON geometry dict (None for null)."""
    if buf is None:
        return None
    t, payload = W.parse_wkb(buf)
    return _payload_to_geojson(t, payload)


def _field_order(key_lists):
    """GDAL's DAG field ordering: nodes = field names, edges between
    consecutive keys per feature (cycle-creating edges skipped), Kahn's
    topological sort with lexicographic-by-name tie-break."""
    nodes: list[str] = []
    seen = set()
    out: dict[str, set] = {}
    inc: dict[str, set] = {}

    def has_path(a, b):  # DFS a → b over out-edges
        stack, visited = [a], set()
        while stack:
            n = stack.pop()
            if n == b:
                return True
            if n in visited:
                continue
            visited.add(n)
            stack.extend(out.get(n, ()))
        return False

    for keys in key_lists:
        for k in keys:
            if k not in seen:
                seen.add(k)
                nodes.append(k)
        for a, b in zip(keys, keys[1:]):
            if a == b or b in out.get(a, ()):
                continue
            if has_path(b, a):      # would create a cycle — skip
                continue
            out.setdefault(a, set()).add(b)
            inc.setdefault(b, set()).add(a)
    order = []
    avail = sorted(n for n in nodes if not inc.get(n))
    indeg = {n: len(inc.get(n, ())) for n in nodes}
    while avail:
        n = avail.pop(0)
        order.append(n)
        added = False
        for m in out.get(n, ()):
            indeg[m] -= 1
            if indeg[m] == 0:
                avail.append(m)
                added = True
        if added:
            avail.sort()
    return order


def _infer_arrow_type(values):
    """Field type from the value set with OGR's promotion ladder
    (``ogrgeojsonreader.cpp`` OGRGeoJSONSchemaAdd / the published
    test_type_promotion matrix): bool → int → real → string; anything
    mixed with strings/objects/arrays becomes string (nested values
    serialize as JSON — the reference's non-flattened String-JSON
    mapping)."""
    kinds = set()
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("int")
        elif isinstance(v, float):
            kinds.add("float")
        elif isinstance(v, str):
            kinds.add("str")
        else:
            kinds.add("json")
    if kinds == {"bool"}:
        return pa.bool_(), None
    if kinds and kinds <= {"bool", "int"}:
        return pa.int64(), int
    if kinds and kinds <= {"bool", "int", "float"}:
        return pa.float64(), float
    # everything else (strings/objects/arrays in the mix) → string;
    # non-string values serialize as JSON (bools spell true/false)
    return pa.string(), (lambda v: v if isinstance(v, str)
                         else json.dumps(v))


def read_geojson(src, wkb_col="wkb"):
    """GeoJSON document (path or str) → Arrow table
    (fid, <properties in GDAL DAG order>, wkb)."""
    if isinstance(src, (dict, list)):
        doc = src                        # already parsed
    elif isinstance(src, (bytes, bytearray)):
        doc = json.loads(src.decode("utf-8-sig"))
    elif isinstance(src, str) and src.lstrip().startswith(("{", "[")):
        doc = json.loads(src)
    else:
        with open(src, encoding="utf-8-sig") as f:
            doc = json.load(f)
    if isinstance(doc, list):        # bare feature array
        doc = {"features": doc}
    if not isinstance(doc, dict):
        raise ValueError("not a GeoJSON document")
    t = doc.get("type")
    if t == "Feature":
        feats = [doc]
    elif "features" in doc:          # FeatureCollection or bare #7198 form
        feats = doc["features"]
    elif t in _TYPE_CODE:            # bare geometry document
        feats = [{"type": "Feature", "geometry": doc, "properties": {}}]
    else:
        raise ValueError("not a GeoJSON document")

    props = [f.get("properties") or {} for f in feats]
    order = _field_order([list(p.keys()) for p in props])
    cols = {"fid": pa.array(
        [f.get("id") if isinstance(f.get("id"), int) else i
         for i, f in enumerate(feats)], pa.int64())}
    for name in order:
        vals = [p.get(name) for p in props]
        typ, conv = _infer_arrow_type(vals)
        if conv:
            vals = [None if v is None else conv(v) for v in vals]
        cols[name] = pa.array(vals, typ)
    cols[wkb_col] = pa.array(
        [geojson_to_wkb(f.get("geometry")) for f in feats], pa.binary())
    return pa.Table.from_pydict(cols)


def _jsonable(v):
    import datetime

    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        return None if v != v else v
    if isinstance(v, (int, bool, str)):
        return v
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (datetime.date, datetime.time)):
        return v.isoformat()
    return str(v)


def write_geojson(table, path=None, wkb_col="wkb", fid_col="fid"):
    """Arrow table / pandas frame → GeoJSON FeatureCollection (returned
    as str; also written to ``path`` when given).  Columns iterate via
    ``to_pylist`` (not ``to_pandas``) so nullable int64 stays int and
    timestamp/date values serialize as strings instead of crashing
    ``json.dumps``."""
    if not isinstance(table, pa.Table):
        table = pa.Table.from_pandas(table, preserve_index=False)
    names = list(table.column_names)
    attr_cols = [c for c in names if c not in (wkb_col, fid_col)]
    data = {c: table[c].to_pylist() for c in names}
    feats = []
    for i in range(table.num_rows):
        props = {c: _jsonable(data[c][i]) for c in attr_cols}
        geom = data[wkb_col][i] if wkb_col in data else None
        feat = {"type": "Feature", "properties": props,
                "geometry": wkb_to_geojson(geom)
                if geom is not None else None}
        if fid_col in data:
            feat["id"] = int(data[fid_col][i])
        feats.append(feat)
    doc = json.dumps({"type": "FeatureCollection", "features": feats})
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(doc)
    return doc


def read_geojson_dataset(src, **kwargs):
    """GeoJSON → ``ray.data.Dataset`` (side-table sized; the heavy side
    of every pipeline stays parquet)."""
    import ray.data

    return ray.data.from_arrow(read_geojson(src, **kwargs))


def read_geojson_seq(src, wkb_col="wkb"):
    """GeoJSON Text Sequence → Arrow table.

    Both published variants (``ogr/ogrsf_frmts/geojson/
    ogrgeojsonseqdriver.cpp``): RFC 8142 RS-separated (``\\x1e``
    prefix, features may span lines — .geojsons) and
    newline-delimited (one feature per line — .geojsonl/ndjson).
    Published parity: ``autotest/ogr/ogr_geojson_seq.py`` fixtures.
    """
    if isinstance(src, (bytes, bytearray)):
        text = src.decode("utf-8-sig")
    else:
        with open(src, encoding="utf-8-sig") as f:
            text = f.read()
    if "\x1e" in text:
        chunks = [c for c in text.split("\x1e") if c.strip()]
    else:
        chunks = [ln for ln in text.splitlines() if ln.strip()]
    feats = [json.loads(c) for c in chunks]
    return read_geojson({"type": "FeatureCollection",
                         "features": feats}, wkb_col=wkb_col)


def write_geojson_seq(table, path, wkb_col="wkb", fid_col="fid",
                      rs=False):
    """Arrow table → GeoJSON Text Sequence file (newline-delimited by
    default; ``rs=True`` emits RFC 8142 RS separators)."""
    doc = json.loads(write_geojson(table, wkb_col=wkb_col,
                                   fid_col=fid_col))
    with open(path, "w", encoding="utf-8") as f:
        for feat in doc["features"]:
            if rs:
                f.write("\x1e")
            f.write(json.dumps(feat) + "\n")
    return path
