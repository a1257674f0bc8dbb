"""Minimal ESRI Shapefile (.shp + .dbf) reader → Arrow table.

Scope: shape types Point (1), PolyLine (3), Polygon (5), MultiPoint (8)
and their Z/M variants (coordinates beyond XY are dropped), plus the
dBASE III attribute table (C/N/F/L/D fields).  Geometry is emitted as
the engine's WKB; polygon rings follow the spec's orientation rule
(clockwise = outer, counter-clockwise = hole, holes assigned to the
containing outer ring).  Reference driver:
``ogr/ogrsf_frmts/shape/`` (shapelib); validated against the published
``poly.shp`` expectations in ``autotest/ogr/ogr_shape.py``.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..geo import wkb as W
from ..geo.clip import ring_area

__all__ = ["read_shapefile", "read_shapefile_dataset"]


def _rings_to_polygons(rings):
    """Shapefile ring soup → list of polygons [outer, holes...].

    CW (negative shoelace in y-up coords... the spec defines CW=outer
    with screen-style area sign) rings are outers; others are holes
    attached to the first outer that contains their first vertex."""
    outers = []
    holes = []
    for r in rings:
        if ring_area(r) < 0:  # clockwise in XY → outer per spec
            outers.append([r])
        else:
            holes.append(r)
    if not outers:  # degenerate: treat everything as outers
        return [[r] for r in rings]
    for hole in holes:
        placed = False
        for poly in outers:
            if W.points_in_ring(poly[0], hole[0, 0], hole[0, 1])[0]:
                poly.append(hole)
                placed = True
                break
        if not placed:
            outers[0].append(hole)
    return outers


def _parse_shp(buf):
    """Yield (fid, wkb_bytes or None) from .shp record stream."""
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = flen_words * 2
    off = 100
    out = []
    while off + 8 <= end:
        rec_no, content_len = struct.unpack_from(">ii", buf, off)
        off += 8
        rec_end = off + content_len * 2
        if content_len <= 0 or rec_end > len(buf):
            raise ValueError("corrupt shapefile record header")
        (stype,) = struct.unpack_from("<i", buf, off)
        # explicit Z/M variant map — NOT stype % 10, which would parse
        # e.g. MultiPatch (31) as a Point from its bbox bytes
        _BASE = {0: 0, 1: 1, 3: 3, 5: 5, 8: 8, 11: 1, 13: 3, 15: 5,
                 18: 8, 21: 1, 23: 3, 25: 5, 28: 8}
        if stype not in _BASE:
            raise NotImplementedError(f"shape type {stype}")
        base = _BASE[stype]
        if stype == 0:
            out.append((rec_no, None))
        elif base == 1:  # Point
            x, y = struct.unpack_from("<2d", buf, off + 4)
            out.append((rec_no, W.point_wkb(x, y)))
        elif base == 8:  # MultiPoint
            (n,) = struct.unpack_from("<i", buf, off + 36)
            pts = np.frombuffer(buf, dtype="<f8", count=2 * n,
                                offset=off + 40).reshape(n, 2)
            blob = struct.pack("<BII", 1, W.MULTIPOINT, n) + b"".join(
                W.point_wkb(p[0], p[1]) for p in pts)
            out.append((rec_no, blob))
        elif base in (3, 5):  # PolyLine / Polygon
            nparts, npts = struct.unpack_from("<2i", buf, off + 36)
            parts = np.frombuffer(buf, dtype="<i4", count=nparts,
                                  offset=off + 44)
            pts = np.frombuffer(buf, dtype="<f8", count=2 * npts,
                                offset=off + 44 + 4 * nparts).reshape(
                npts, 2)
            bounds = list(parts) + [npts]
            rings = [np.asarray(pts[bounds[i]:bounds[i + 1]],
                                dtype=np.float64)
                     for i in range(nparts)
                     if bounds[i + 1] - bounds[i] >= 2]
            if base == 3:
                if len(rings) == 1:
                    out.append((rec_no, W.linestring_wkb(rings[0])))
                else:
                    blob = struct.pack("<BII", 1, W.MULTILINESTRING,
                                       len(rings)) + b"".join(
                        W.linestring_wkb(r) for r in rings)
                    out.append((rec_no, blob))
            else:
                polys = _rings_to_polygons(rings)
                blob = (W.polygon_wkb(polys[0]) if len(polys) == 1
                        else W.multipolygon_wkb(polys))
                out.append((rec_no, blob))
        else:
            raise NotImplementedError(f"shape type {stype}")  # unreachable
        off = rec_end
    return out


def _parse_dbf(buf):
    """dBASE III → (field_names, list of row dicts)."""
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while off < hdr_size - 1 and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = []
    off = hdr_size
    for _ in range(n_rec):
        if off + rec_size > len(buf):
            break
        deleted = buf[off] == 0x2A
        pos = off + 1
        row = {}
        for name, ftype, flen, fdec in fields:
            raw = buf[pos:pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if ftype in ("N", "F"):
                if raw == "" or raw == "*" * flen:
                    row[name] = None
                elif fdec > 0 or ftype == "F" or "." in raw:
                    row[name] = float(raw)
                else:
                    row[name] = int(raw)
            elif ftype == "L":
                row[name] = raw in ("Y", "y", "T", "t")
            else:
                row[name] = raw
        # keep positional alignment with .shp records: deleted rows
        # become all-None placeholders instead of being dropped
        rows.append({name: None for name, *_ in fields} if deleted
                    else row)
        off += rec_size
    return [f[0] for f in fields], rows


def read_shapefile(path):
    """Read ``<path>.shp`` (+ sibling ``.dbf``) → Arrow table with
    columns (fid:int64, wkb:binary, <attributes...>)."""
    base, _ = os.path.splitext(path)
    with open(base + ".shp", "rb") as f:
        geoms = _parse_shp(f.read())
    names, rows = [], []
    for dbf in (base + ".dbf", base + ".DBF"):
        if os.path.exists(dbf):
            with open(dbf, "rb") as f:
                names, rows = _parse_dbf(f.read())
            break
    cols = {
        "fid": pa.array([g[0] for g in geoms], pa.int64()),
        "wkb": pa.array([g[1] for g in geoms], pa.binary()),
    }
    for name in names:
        vals = [rows[i].get(name) if i < len(rows) else None
                for i in range(len(geoms))]
        cols[name] = pa.array(vals)
    return pa.Table.from_pydict(cols)


def read_shapefile_dataset(path, **kwargs):
    """Shapefile → ``ray.data.Dataset`` (one read; shapefiles are small
    side tables — the heavy side of every pipeline stays parquet)."""
    import ray.data

    return ray.data.from_arrow(read_shapefile(path))
