"""GeoParquet (v1.0.0, geoparquet.org spec) interop for vector
datasets — WKB geometry columns with the standard ``geo`` file
metadata, written distributedly.

The reference ships a (Geo)Parquet OGR driver
(``ogr/ogrsf_frmts/parquet/``, spec metadata per
``ogrparquetwriterdataset.cpp``); here the metadata rides the Arrow
schema of every block (``replace_schema_metadata`` inside a
``map_batches``), so Ray Data's parallel ``write_parquet`` puts a
spec-compliant footer in every output file with no driver-side
materialization — each file of a partitioned layout is independently
a valid GeoParquet file, which is what makes resumable partitioned
output interoperable.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geo.wkb import wkb_bbox as _wkb_bbox

__all__ = ["geo_metadata", "attach_geo_metadata", "write_geoparquet",
           "read_geoparquet_metadata"]

_VERSION = "1.0.0"

# WKB base code → GeoParquet geometry type name
_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
               4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
               7: "GeometryCollection"}


def geo_metadata(wkb_col="wkb", geometry_types=(), bbox=None, crs=None):
    """The ``geo`` metadata JSON (spec §file-metadata) as a dict."""
    col = {"encoding": "WKB",
           "geometry_types": sorted(set(geometry_types))}
    if bbox is not None:
        col["bbox"] = [float(v) for v in bbox]
    if crs is not None:
        col["crs"] = crs
    return {"version": _VERSION,
            "primary_column": wkb_col,
            "columns": {wkb_col: col}}


def _wkb_type_names(wkb_arr):
    """Geometry type names present in a WKB column (base 2D names;
    Z variants get the ' Z' suffix per spec)."""
    names = set()
    for buf in wkb_arr:
        b = buf.as_py() if hasattr(buf, "as_py") else buf
        if b is None or len(b) < 5:
            continue
        code = int.from_bytes(b[1:5], "little" if b[0] == 1 else "big")
        base = code % 1000
        # Z: the 2.5D flag bit, or the ISO 1000- (Z) / 3000- (ZM) ranges
        z = bool(code & 0x80000000) or 1000 <= code < 2000 \
            or 3000 <= code < 4000
        name = _TYPE_NAMES.get(base)
        if name:
            names.add(name + " Z" if z else name)
    return names


def attach_geo_metadata(t: pa.Table, wkb_col="wkb", crs=None,
                        compute_types=True, compute_bbox=False,
                        bbox_fn=None) -> pa.Table:
    """Stamp the GeoParquet ``geo`` key onto a table's schema metadata
    (callable inside ``map_batches`` — each written file then carries
    its own spec-compliant footer)."""
    if wkb_col not in t.column_names:
        raise ValueError(f"missing geometry column {wkb_col!r}")
    types = _wkb_type_names(t[wkb_col]) if compute_types else ()
    bbox = None
    if compute_bbox:
        # top-level import: a runtime `from ..geo import` here would
        # break worker deserialization off-repo (test_no_runtime_imports)
        fn = bbox_fn or _wkb_bbox
        boxes = [fn(b.as_py()) for b in t[wkb_col]
                 if b.as_py() is not None]
        if boxes:
            arr = np.asarray(boxes, np.float64)
            bbox = [arr[:, 0].min(), arr[:, 1].min(),
                    arr[:, 2].max(), arr[:, 3].max()]
    meta = dict(t.schema.metadata or {})
    meta[b"geo"] = json.dumps(
        geo_metadata(wkb_col, types, bbox, crs)).encode()
    return t.replace_schema_metadata(meta)


def write_geoparquet(ds, path, wkb_col="wkb", crs=None,
                     compute_bbox=True, **kwargs):
    """Write a Ray Dataset with a WKB column as GeoParquet: the geo
    footer is stamped per block in parallel, then Ray's streaming
    ``write_parquet`` fans files out as usual."""
    stamped = ds.map_batches(
        lambda t: attach_geo_metadata(t, wkb_col=wkb_col, crs=crs,
                                      compute_bbox=compute_bbox),
        batch_format="pyarrow")
    return stamped.write_parquet(path, **kwargs)


def read_geoparquet_metadata(file_path):
    """Parse the ``geo`` metadata of one parquet file (footer only —
    no row groups are read)."""
    import pyarrow.parquet as pq

    meta = pq.read_schema(file_path).metadata or {}
    if b"geo" not in meta:
        raise ValueError("not a GeoParquet file (no 'geo' metadata)")
    return json.loads(meta[b"geo"].decode())
