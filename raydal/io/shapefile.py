"""Minimal ESRI Shapefile (.shp + .shx + .dbf) reader and writer.

Read scope: shape types Point (1), PolyLine (3), Polygon (5),
MultiPoint (8) and their Z/M variants (coordinates beyond XY are
dropped), plus the dBASE III attribute table (C/N/F/L/D fields).
Geometry is emitted as the engine's WKB; polygon rings follow the
spec's orientation rule (clockwise = outer, counter-clockwise = hole,
holes assigned to the containing outer ring).

Write scope (:func:`write_shapefile`): the same four base types from
WKB columns, with ring orientation normalized to spec on the way out,
a spec-conformant ``.shx`` index, and dBASE fields derived from the
Arrow schema (string → C, int → N(18,0), float → N(30,15),
bool → L).  One shapefile holds ONE shape type (spec constraint);
mixed-type tables raise.

Reference driver: ``ogr/ogrsf_frmts/shape/`` (shapelib, write path
``ogrshapelayer.cpp``); validated against the published ``poly.shp``
expectations in ``autotest/ogr/ogr_shape.py`` and write→re-read
round-trips of the same file.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..geo import wkb as W
from ..geo.clip import ring_area

__all__ = ["read_shapefile", "read_shapefile_dataset",
           "write_shapefile"]


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
                # blank / '?' = uninitialized per dBASE spec → null
                row[name] = (None if raw in ("", "?")
                             else raw in ("Y", "y", "T", "t"))
            else:
                # all-blank C cells read as unset (OGR's default
                # empty-string handling for shapefiles)
                row[name] = raw if raw else None
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


def _closed(r):
    r = np.asarray(r, dtype=np.float64)
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _oriented(r, outer):
    """Close + orient a ring: spec says outer rings are clockwise
    (negative shoelace in XY), holes counter-clockwise."""
    r = _closed(r)
    a = ring_area(r)
    if (outer and a > 0) or (not outer and a < 0):
        r = r[::-1]
    return r


def _shape_record(stype, wkb_bytes):
    """WKB → .shp record content bytes for the layer's shape type."""
    if wkb_bytes is None:
        return struct.pack("<i", 0)
    t, payload = W.parse_wkb(wkb_bytes)
    if stype == 1:                               # Point
        return struct.pack("<i2d", 1, float(payload[0, 0]),
                           float(payload[0, 1]))
    if stype == 8:                               # MultiPoint
        pts = (payload if t == W.POINT
               else np.vstack([sub[1] for sub in payload]))
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
        return (struct.pack("<i4d", 8, *_bbox(pts))
                + struct.pack("<i", len(pts))
                + pts.astype("<f8").tobytes())
    # PolyLine (3) / Polygon (5): parts + one point stream
    if stype == 3:
        parts = ([payload] if t == W.LINESTRING
                 else [sub[1] for sub in payload])
    else:
        polys = ([payload] if t == W.POLYGON
                 else [sub[1] for sub in payload])
        parts = []
        for rings in polys:
            for j, r in enumerate(rings):
                parts.append(_oriented(r, outer=j == 0))
    parts = [np.asarray(p, dtype=np.float64) for p in parts]
    pts = np.vstack(parts)
    offs = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    return (struct.pack("<i4d", stype, *_bbox(pts))
            + struct.pack("<2i", len(parts), len(pts))
            + offs.tobytes() + pts.astype("<f8").tobytes())


def _bbox(pts):
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


_SHAPE_OF = {W.POINT: 1, W.MULTIPOINT: 8, W.LINESTRING: 3,
             W.MULTILINESTRING: 3, W.POLYGON: 5, W.MULTIPOLYGON: 5}


def _dbf_fields(table, skip):
    """Arrow schema → dBASE field descriptors + per-row formatters."""
    fields = []
    for name, typ in zip(table.schema.names, table.schema.types):
        if name in skip:
            continue
        col = table[name]
        if pa.types.is_boolean(typ):
            fields.append((name, "L", 1, 0))
        elif pa.types.is_integer(typ):
            # widen past the OGR default 18 when values need it (e.g.
            # int64 extremes are 20 chars) — silent truncation would
            # corrupt the value on re-read; min/max bound the width
            # without materializing the column
            import pyarrow.compute as pc

            mm = pc.min_max(col).as_py()
            width = max([18] + [len(str(v))
                                for v in (mm["min"], mm["max"])
                                if v is not None])
            fields.append((name, "N", min(width, 30), 0))
        elif pa.types.is_floating(typ):
            fields.append((name, "N", 30, 15))
        elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
            width = max([1] + [len(str(v)) for v in col.to_pylist()
                               if v is not None])
            fields.append((name, "C", min(width, 254), 0))
        else:
            raise NotImplementedError(
                f"dBASE has no mapping for column {name!r} ({typ})")
    return fields


def _dbf_cell(v, ftype, flen):
    if v is None:
        return b" " * flen
    if ftype == "L":
        return b"T" if v else b"F"
    if ftype == "N":
        # repr = shortest exact round-trip for float64 (float(repr(v))
        # == v), so numeric attributes survive write → re-read bit-exact
        s = (f"{int(v)}" if isinstance(v, (int, np.integer))
             else repr(float(v)))
        if len(s) > flen:
            raise ValueError(
                f"numeric value {s!r} exceeds dBASE field width "
                f"{flen} — refusing silent truncation")
        s = s.rjust(flen)
    else:
        s = str(v)[:flen].ljust(flen)
    return s.encode("ascii", "replace")


def write_shapefile(table, path):
    """Arrow table with a ``wkb`` binary column (+ attributes) →
    ``<path>.shp`` / ``.shx`` / ``.dbf``.

    ``fid`` columns are treated as the implicit record number and not
    written as an attribute (matching the reader's synthesized fid).
    Reference write path: ``ogr/ogrsf_frmts/shape/ogrshapelayer.cpp``.
    """
    if isinstance(table, pa.Table) is False:
        table = pa.table(table)
    base, _ = os.path.splitext(path)
    wkbs = table["wkb"].to_pylist()

    stypes = {W.wkb_geom_type(b) for b in wkbs if b is not None}
    shapes = {_SHAPE_OF[t] for t in stypes if t in _SHAPE_OF}
    if any(t not in _SHAPE_OF for t in stypes):
        raise NotImplementedError(
            f"unsupported geometry types for shapefile: {stypes}")
    if len(shapes) > 1:
        raise ValueError(
            f"a shapefile holds one shape type, got {sorted(shapes)}")
    stype = shapes.pop() if shapes else 0

    recs = [_shape_record(stype, b) for b in wkbs]
    # headers: file length in 16-bit words, big-endian slot 24
    shp_len = 100 + sum(8 + len(r) for r in recs)
    shx_len = 100 + 8 * len(recs)

    def _header(flen, bb):
        return (struct.pack(">i", 9994) + b"\0" * 20
                + struct.pack(">i", flen // 2)
                + struct.pack("<2i", 1000, stype)
                + struct.pack("<4d", *bb) + struct.pack("<4d", 0, 0, 0, 0))

    pts = [W.wkb_bbox(b) for b in wkbs if b is not None]
    bb = ((min(p[0] for p in pts), min(p[1] for p in pts),
           max(p[2] for p in pts), max(p[3] for p in pts))
          if pts else (0.0, 0.0, 0.0, 0.0))

    with open(base + ".shp", "wb") as f:
        f.write(_header(shp_len, bb))
        for i, r in enumerate(recs):
            f.write(struct.pack(">2i", i + 1, len(r) // 2) + r)
    with open(base + ".shx", "wb") as f:
        f.write(_header(shx_len, bb))
        off = 100
        for r in recs:
            f.write(struct.pack(">2i", off // 2, len(r) // 2))
            off += 8 + len(r)

    fields = _dbf_fields(table, skip={"wkb", "fid"})
    rec_size = 1 + sum(fl for _, _, fl, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(base + ".dbf", "wb") as f:
        f.write(struct.pack("<4B", 0x03, 95, 7, 26)
                + struct.pack("<IHH", len(recs), hdr_size, rec_size)
                + b"\0" * 20)
        for name, ftype, flen, fdec in fields:
            f.write(name.encode("ascii")[:10].ljust(11, b"\0")
                    + ftype.encode("ascii") + b"\0" * 4
                    + struct.pack("<2B", flen, fdec) + b"\0" * 14)
        f.write(b"\x0d")
        cols = {name: table[name].to_pylist()
                for name, *_ in fields}
        for i in range(len(recs)):
            f.write(b" " + b"".join(
                _dbf_cell(cols[name][i], ftype, flen)
                for name, ftype, flen, _ in fields))
        f.write(b"\x1a")
    return base + ".shp"


def read_shapefile_dataset(path, **kwargs):
    """Shapefile → ``ray.data.Dataset`` (one read; shapefiles are small
    side tables — the heavy side of every pipeline stays parquet)."""
    import ray.data

    return ray.data.from_arrow(read_shapefile(path))
