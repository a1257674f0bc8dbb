"""ESRI File Geodatabase (OpenFileGDB) vector reader, from scratch.

Parity target: the reference's OpenFileGDB driver
(``ogr/ogrsf_frmts/openfilegdb/filegdbtable.cpp`` row/geometry decode,
``ogrpgeogeometry.cpp`` extended-shape curve semantics), built from
the publicly documented FGDB file structure (the reverse-engineered
spec published with the reference):

* ``.gdbtable`` — 40-byte header (int64 field-section offset at 32),
  field descriptors (the 17 FGFT types incl. ArcGIS Pro 3.2 int64 /
  date / time / datetime-with-offset), rows addressed through the
  ``.gdbtablx`` 4/5/6-byte offset index (0 = deleted),
* rows — null bitmap over nullable fields, varuint-prefixed UTF-8
  strings and blobs, float64 datetimes (days since 1899-12-30),
* shape blobs — varuint geometry type with EXT_SHAPE Z/M/CURVE flags,
  (value·scale+origin)+1 varuint points, signed-varint (bit 0x40 of
  the first byte) delta-coded coordinate arrays, curve segments (arc
  by interior point / center point, cubic bezier) emitted as
  CIRCULARSTRING / COMPOUNDCURVE / CURVEPOLYGON / MULTICURVE WKB via
  :mod:`raydal.geo.curves`,
* catalog — layer list from ``a00000001`` GDB_SystemCatalog (system
  ``GDB_*`` tables skipped), table file ``a%08x.gdbtable`` of the
  catalog row id.

Goldens: the reference's own fixture expectations (curves.gdb vs
curves_line.csv / curves_polygon.csv WKTs, Domains.gdb catalog,
testopenfilegdb.gdb.zip field/value matrix).
"""

from __future__ import annotations

import math
import os
import struct
import uuid as _uuid

import numpy as np
import pyarrow as pa

from raydal.geo import curves as C
from raydal.geo import wkb as W
from raydal.io.shapefile import _rings_to_polygons

__all__ = ["GdbTable", "FileGDB", "read_filegdb", "filegdb_layers",
           "write_filegdb"]

# FGFT field type codes (filegdbtable.h:52)
T_INT16, T_INT32, T_F32, T_F64, T_STRING, T_DATETIME, T_OBJECTID, \
    T_GEOMETRY, T_BINARY, T_RASTER, T_GUID, T_GLOBALID, T_XML, \
    T_INT64, T_DATE, T_TIME, T_DATETIME_TZ = range(17)

SHAPE_Z = 0x80000000
SHAPE_M = 0x40000000
SHAPE_CURVE = 0x20000000

SEG_ARC, SEG_BEZIER, SEG_ELLIPSE = 1, 4, 5
ARC_EMPTY, ARC_CCW, ARC_MINOR, ARC_LINE, ARC_POINT, ARC_IP = \
    0x1, 0x8, 0x10, 0x20, 0x40, 0x80
ELL_CENTER_TO, ELL_CENTER_FROM = 0x200, 0x400
ELL_MINOR, ELL_COMPLETE = 0x1000, 0x2000


def _angle_on_ellipse(px, py, cx, cy, rot_deg, smaj, smin):
    """Parametric angle (deg, (-180,180]) of a point on a rotated
    ellipse — ogrpgeogeometry.cpp GetAngleOnEllipse."""
    if smaj == 0.0 or smin == 0.0:
        return 0.0
    r = math.radians(rot_deg)
    cr, sr = math.cos(r), math.sin(r)
    dx, dy = px - cx, py - cy
    ca = (cr * dx - sr * dy) / smaj
    sa = (sr * dx + cr * dy) / smin
    a = math.degrees(math.atan2(sa, ca))
    return a + 360 if a < -180 else a


def _approximate_arc_angles(cx, cy, smaj, smin, rot_deg, a0, a1,
                            step_deg=C.DEFAULT_ARC_STEP_DEG):
    """Sampled ellipse arc — OGRGeometryFactory::approximateArcAngles
    (angles CW on entry, internally negated; 4° default step)."""
    full = abs(a1 - a0) == 360.0
    a0, a1 = -a0, -a1
    n = max(2, int(math.ceil(abs(a1 - a0) / step_deg)) + 1)
    sl = (a1 - a0) / (n - 1)
    if full:
        n -= 1
    ang = np.radians(a0 + sl * np.arange(n))
    ex = np.cos(ang) * smaj
    ey = np.sin(ang) * smin
    r = math.radians(rot_deg)
    cr, sr = math.cos(r), math.sin(r)
    x = cx + ex * cr + ey * sr
    y = cy - ex * sr + ey * cr
    pts = np.column_stack([x, y])
    if full:
        pts = np.vstack([pts, pts[:1]])
    return pts


def _varuint(b, p):
    v = 0
    s = 0
    while True:
        x = b[p]
        p += 1
        v |= (x & 0x7F) << s
        if not x & 0x80:
            return v, p
        s += 7


def _varint(b, p):
    """FGDB signed varint: byte0 carries 6 value bits + sign 0x40."""
    x = b[p]
    p += 1
    v = x & 0x3F
    neg = bool(x & 0x40)
    s = 6
    while x & 0x80:
        x = b[p]
        p += 1
        v |= (x & 0x7F) << s
        s += 7
    return (-v if neg else v), p


class _Field:
    __slots__ = ("name", "type", "nullable",
                 "xorigin", "yorigin", "xyscale", "zorigin", "zscale",
                 "morigin", "mscale", "has_z", "has_m", "wkt")

    def __init__(self, name, ftype, flag):
        self.name = name
        self.type = ftype
        self.nullable = bool(flag & 1)


class GdbTable:
    """One ``.gdbtable`` + ``.gdbtablx`` pair."""

    def __init__(self, prefix):
        with open(prefix + ".gdbtable", "rb") as f:
            self.buf = f.read()
        buf = self.buf
        self.n_valid = struct.unpack("<i", buf[4:8])[0]
        fdo = struct.unpack("<q", buf[32:40])[0]
        size = struct.unpack("<i", buf[fdo:fdo + 4])[0]
        self._parse_fields(buf[fdo + 4:fdo + 4 + size])
        with open(prefix + ".gdbtablx", "rb") as f:
            tx = f.read()
        _m, _nb, nrows, szoff = struct.unpack("<IIII", tx[:16])
        self.offsets = [
            int.from_bytes(tx[16 + i * szoff:16 + (i + 1) * szoff],
                           "little") for i in range(nrows)]

    # ------------------------------------------------------ schema

    def _parse_fields(self, sec):
        # layout per filegdbtable.cpp:1000-1420 (sec starts after the
        # int32 section length; their abyHeader offsets are sec+4)
        p = 4                          # version int32
        self.table_geom_type = sec[p] & 0xFF
        self.utf8_strings = bool(sec[p + 1] & 1)
        tflags = sec[p + 3]
        self.table_has_m = bool(tflags & (1 << 6))
        self.table_has_z = bool(tflags & (1 << 7))
        p += 4
        nf = struct.unpack("<H", sec[p:p + 2])[0]
        p += 2
        self.fields = []
        for _ in range(nf):
            nlen = sec[p]
            p += 1
            name = sec[p:p + 2 * nlen].decode("utf-16-le")
            p += 2 * nlen
            alen = sec[p]
            p += 1 + 2 * alen
            t = sec[p]
            p += 1
            if t in (T_GEOMETRY, T_RASTER):
                f = _Field(name, t, sec[p + 1])
                p += 2
                if t == T_RASTER:
                    rl = sec[p]
                    p += 1 + 2 * rl
                wktlen = struct.unpack("<H", sec[p:p + 2])[0]
                p += 2
                f.wkt = sec[p:p + wktlen].decode("utf-16-le")
                p += wktlen
                gflags = sec[p]
                p += 1
                has_m_ost = bool(gflags & 2)
                has_z_ost = bool(gflags & 4)
                f.has_m = self.table_has_m
                f.has_z = self.table_has_z
                if t == T_GEOMETRY or gflags > 0:
                    nvals = 3 + 2 * has_m_ost + 2 * has_z_ost
                    vals = struct.unpack("<%dd" % nvals,
                                         sec[p:p + 8 * nvals])
                    p += 8 * nvals
                    f.xorigin, f.yorigin, f.xyscale = vals[:3]
                    rest = list(vals[3:])
                    if has_m_ost:
                        f.morigin, f.mscale = rest[:2]
                        rest = rest[2:]
                    if has_z_ost:
                        f.zorigin, f.zscale = rest[:2]
                    # tolerances: xy + m? + z?
                    p += 8 * (1 + has_m_ost + has_z_ost)
                if t == T_RASTER:
                    p += 1             # raster storage type
                else:
                    p += 8 * 4         # xmin/ymin/xmax/ymax
                    if self.table_has_z:
                        p += 16        # zmin/zmax
                    if self.table_has_m:
                        p += 16        # mmin/mmax
                    p += 1             # zero byte
                    ngrid = struct.unpack("<i", sec[p:p + 4])[0]
                    p += 4 + 8 * ngrid
                self.fields.append(f)
                continue
            if t == T_STRING:
                flag = sec[p + 4]
                p += 5
                ndef, p = _varuint(sec, p)
            elif t in (T_OBJECTID, T_BINARY, T_GUID, T_GLOBALID,
                       T_XML):
                flag = sec[p + 1]
                p += 2
                ndef = 0
            else:                      # numeric / datetime family
                flag = sec[p + 1]
                ndef = sec[p + 2]
                p += 3
            if flag & 4:               # editable → default present
                p += ndef
            self.fields.append(_Field(name, t, flag))
        self.nullable_count = sum(f.nullable for f in self.fields)
        self.geom_field = next((f for f in self.fields
                                if f.type == T_GEOMETRY), None)

    # -------------------------------------------------------- rows

    def rows(self):
        """Yield (object_id, dict of field values; geometry as 'wkb')."""
        nb = (self.nullable_count + 7) // 8
        buf = self.buf
        for rid, o in enumerate(self.offsets, 1):
            if o == 0:
                continue
            ln = struct.unpack("<i", buf[o:o + 4])[0]
            row = buf[o + 4:o + 4 + ln]
            bm = row[:nb]
            p = nb
            ni = 0
            vals = {}
            for f in self.fields:
                if f.type == T_OBJECTID:
                    vals[f.name] = rid
                    continue
                if f.nullable:
                    isnull = bm[ni >> 3] >> (ni & 7) & 1
                    ni += 1
                    if isnull:
                        vals[f.name] = None
                        continue
                if f.type == T_INT16:
                    vals[f.name] = struct.unpack("<h", row[p:p + 2])[0]
                    p += 2
                elif f.type in (T_INT32,):
                    vals[f.name] = struct.unpack("<i", row[p:p + 4])[0]
                    p += 4
                elif f.type == T_F32:
                    vals[f.name] = struct.unpack("<f", row[p:p + 4])[0]
                    p += 4
                elif f.type == T_F64:
                    vals[f.name] = struct.unpack("<d", row[p:p + 8])[0]
                    p += 8
                elif f.type in (T_DATETIME, T_DATE, T_TIME,
                                T_DATETIME_TZ):
                    days = struct.unpack("<d", row[p:p + 8])[0]
                    p += 8
                    if f.type == T_DATETIME_TZ:
                        # int16 offset in minutes follows
                        tz = struct.unpack("<h", row[p:p + 2])[0]
                        p += 2
                        vals[f.name] = (days, tz)
                    elif f.type == T_TIME:
                        vals[f.name] = days
                    else:
                        vals[f.name] = days
                elif f.type == T_INT64:
                    vals[f.name] = struct.unpack("<q", row[p:p + 8])[0]
                    p += 8
                elif f.type in (T_STRING, T_XML):
                    l, p = _varuint(row, p)
                    vals[f.name] = row[p:p + l].decode("utf-8",
                                                       "replace")
                    p += l
                elif f.type in (T_GUID, T_GLOBALID):
                    vals[f.name] = "{%s}" % str(
                        _uuid.UUID(bytes_le=row[p:p + 16])).upper()
                    p += 16
                elif f.type in (T_BINARY, T_RASTER):
                    l, p = _varuint(row, p)
                    vals[f.name] = row[p:p + l]
                    p += l
                elif f.type == T_GEOMETRY:
                    l, p = _varuint(row, p)
                    vals["wkb"] = self._geometry_wkb(row[p:p + l])
                    p += l
            yield rid, vals

    # ---------------------------------------------------- geometry

    def _xy(self, ints_x, ints_y):
        g = self.geom_field
        x = np.asarray(ints_x, np.float64) / g.xyscale + g.xorigin
        y = np.asarray(ints_y, np.float64) / g.xyscale + g.yorigin
        return np.column_stack([x, y])

    def _read_deltas(self, blob, p, n):
        xs = np.empty(n, np.int64)
        ys = np.empty(n, np.int64)
        dx = dy = 0
        for i in range(n):
            v, p = _varint(blob, p)
            dx += v
            v, p = _varint(blob, p)
            dy += v
            xs[i] = dx
            ys[i] = dy
        return xs, ys, p

    def _read_z(self, blob, p, n):
        g = self.geom_field
        out = np.empty(n, np.float64)
        dz = 0
        for i in range(n):
            v, p = _varint(blob, p)
            dz += v
            out[i] = dz / g.zscale + g.zorigin
        return out, p

    def _geometry_wkb(self, blob):
        if not blob:
            return None
        gt, p = _varuint(blob, 0)
        base = gt & 0xFF
        g = self.geom_field
        has_z = bool(gt & SHAPE_Z) or base in (9, 11, 20, 18, 10,
                                               13, 19, 15)
        has_m = bool(gt & SHAPE_M) or base in (21, 11, 28, 18, 23,
                                               13, 25, 15)
        has_curves = bool(gt & SHAPE_CURVE)
        if base == 0:
            return None
        if base in (1, 9, 11, 21, 52):           # point
            xr, p = _varuint(blob, p)
            yr, p = _varuint(blob, p)
            if xr == 0 or yr == 0:
                return None                      # empty
            x = (xr - 1) / g.xyscale + g.xorigin
            y = (yr - 1) / g.xyscale + g.yorigin
            coords = [x, y]
            dims = ""
            if has_z:
                zr, p = _varuint(blob, p)
                coords.append((zr - 1) / g.zscale + g.zorigin
                              if zr else float("nan"))
                dims = "Z"
            if has_m and p < len(blob):
                mr, p = _varuint(blob, p)
                coords.append((mr - 1) / g.mscale + g.morigin
                              if mr else float("nan"))
                dims += "M"
            return C.write_wkb_curve((C.POINT, coords, dims))
        if base in (8, 20, 28, 18, 53):          # multipoint
            n, p = _varuint(blob, p)
            if n == 0:
                return (b"\x01\x04\x00\x00\x00"
                        + struct.pack("<I", 0))
            for _ in range(4):                   # bbox
                _v, p = _varuint(blob, p)
            xs, ys, p = self._read_deltas(blob, p, n)
            pts = self._xy(xs, ys)
            if has_z:
                zs, p = self._read_z(blob, p, n)
                out = [b"\x01", struct.pack("<II", 1004, n)]
                for i in range(n):
                    out.append(b"\x01" + struct.pack(
                        "<I3d", 1001, pts[i, 0], pts[i, 1], zs[i]))
                return b"".join(out)
            out = [b"\x01\x04\x00\x00\x00", struct.pack("<I", n)]
            for i in range(n):
                out.append(b"\x01\x01\x00\x00\x00"
                           + struct.pack("<2d", pts[i, 0], pts[i, 1]))
            return b"".join(out)
        if base in (3, 10, 13, 23, 50,           # polyline
                    5, 19, 15, 25, 51):          # polygon
            is_poly = base in (5, 19, 15, 25, 51)
            n, p = _varuint(blob, p)
            if n == 0:
                code = 3 if is_poly else 2
                return (b"\x01" + struct.pack("<I", code)
                        + struct.pack("<I", 0))
            nparts, p = _varuint(blob, p)
            ncurves = 0
            if has_curves:
                ncurves, p = _varuint(blob, p)
            for _ in range(4):                   # bbox
                _v, p = _varuint(blob, p)
            counts = []
            for _ in range(max(nparts - 1, 0)):
                c, p = _varuint(blob, p)
                counts.append(c)
            counts.append(n - sum(counts))
            xs, ys, p = self._read_deltas(blob, p, n)
            pts = self._xy(xs, ys)
            zs = None
            ms = None
            if has_z:
                zs, p = self._read_z(blob, p, n)
            if has_m and p < len(blob):
                # absence of M is marked with a single byte 66
                # (explicit check on the curve path, length heuristic
                # on the plain path — filegdbtable.cpp:3713, :3935)
                if (blob[p] == 66 and ncurves) or \
                        (not ncurves and len(blob) - p < n):
                    p += 1 if blob[p] == 66 else 0
                else:
                    ms = np.empty(n, np.float64)
                    dm = 0
                    for i in range(n):
                        v, p = _varint(blob, p)
                        dm += v
                        ms[i] = dm / g.mscale + g.morigin
            curves = []
            for _ in range(ncurves):
                sidx, p = _varuint(blob, p)
                ctype, p = _varuint(blob, p)
                if ctype == SEG_ARC:
                    v1, v2 = struct.unpack("<2d", blob[p:p + 16])
                    bits = struct.unpack("<I", blob[p + 16:p + 20])[0]
                    p += 20
                    curves.append((sidx, "arc", v1, v2, bits))
                elif ctype == SEG_BEZIER:
                    x1, y1, x2, y2 = struct.unpack("<4d",
                                                   blob[p:p + 32])
                    p += 32
                    curves.append((sidx, "bezier", x1, y1, x2, y2))
                elif ctype == SEG_ELLIPSE:
                    vs0, vs1, rot, smaj, ratio = struct.unpack(
                        "<5d", blob[p:p + 40])
                    bits = struct.unpack("<I", blob[p + 40:p + 44])[0]
                    p += 44
                    curves.append((sidx, "ellipse", vs0, vs1, rot,
                                   smaj, ratio, bits))
                else:
                    break
            parts = []
            s = 0
            for c in counts:
                parts.append((s, c))
                s += c
            if curves:
                return self._curve_wkb(parts, pts, zs, ms, curves,
                                       is_poly)
            return self._linear_wkb(parts, pts, zs, ms, is_poly)
        if base in (31, 32, 54):                 # multipatch
            if base in (31, 32):
                has_z = True
            n, p = _varuint(blob, p)
            if n == 0:
                return b"\x01\x03\x00\x00\x00\x00\x00\x00\x00"
            _skip, p = _varuint(blob, p)
            nparts, p = _varuint(blob, p)
            for _ in range(4):
                _v, p = _varuint(blob, p)
            counts = []
            for _ in range(max(nparts - 1, 0)):
                c, p = _varuint(blob, p)
                counts.append(c)
            counts.append(n - sum(counts))
            ptypes = []
            for _ in range(nparts):
                v, p = _varuint(blob, p)
                ptypes.append(v & 0xF)
            xs, ys, p = self._read_deltas(blob, p, n)
            pts = self._xy(xs, ys)
            if has_z:
                zvals, p = self._read_z(blob, p, n)
            else:
                zvals = np.zeros(n)
            coords = np.column_stack([pts, zvals])
            return self._multipatch_wkb(counts, ptypes, coords)
        raise ValueError(f"unsupported shape type {base}")

    @staticmethod
    def _multipatch_wkb(counts, ptypes, coords):
        """Multipatch parts → TIN / MULTIPOLYGON / GEOMETRYCOLLECTION
        Z WKB (ogrpgeogeometry.cpp OGRCreateFromMultiPatchPart)."""
        gc = []
        mp_polys = []                 # accumulated ring polygons
        cur_poly = None
        s = 0
        for c, pt in zip(counts, ptypes):
            part = coords[s:s + c]
            s += c
            if pt in (0, 1, 6):       # tristrip / trifan / triangles
                if cur_poly is not None:
                    mp_polys.append(cur_poly)
                    cur_poly = None
                tris = []
                if pt == 0:
                    rng = range(c - 2)
                    tri = lambda i: (part[i], part[i + 1], part[i + 2])
                elif pt == 1:
                    rng = range(c - 2)
                    tri = lambda i: (part[0], part[i + 1], part[i + 2])
                else:
                    rng = range(0, c - 2, 3)
                    tri = lambda i: (part[i], part[i + 1], part[i + 2])
                for i in rng:
                    a, b, d = tri(i)
                    ring = np.vstack([a, b, d, a])
                    tris.append((C.TRIANGLE, [ring], "Z"))
                gc.append((C.TIN, tris, "Z"))
            else:                     # ring kinds (2/3/4/5)
                ring = part
                if len(ring) and not np.array_equal(ring[0], ring[-1]):
                    ring = np.vstack([ring, ring[:1]])
                if pt in (2, 4) and cur_poly is not None:
                    mp_polys.append(cur_poly)
                    cur_poly = None
                if cur_poly is None:
                    cur_poly = []
                cur_poly.append(ring)
        if cur_poly is not None:
            mp_polys.append(cur_poly)
        if mp_polys:
            gc.append((C.MULTIPOLYGON,
                       [(C.POLYGON, poly, "Z") for poly in mp_polys],
                       "Z"))
        if len(gc) == 1:
            return C.write_wkb_curve(gc[0])
        return C.write_wkb_curve((7, gc, "Z"))

    @staticmethod
    def _stack(pts, zs, ms):
        cols = [pts]
        dims = ""
        if zs is not None:
            cols.append(zs[:, None])
            dims = "Z"
        if ms is not None:
            cols.append(ms[:, None])
            dims += "M"
        return (np.hstack(cols) if len(cols) > 1 else pts), dims

    def _linear_wkb(self, parts, pts, zs, ms, is_poly):
        arr, dims = self._stack(pts, zs, ms)
        if is_poly:
            rings = [arr[s:s + c] for s, c in parts]
            # winding-rule grouping (shapefile convention: CW outer);
            # map the grouped xy views back to full-width rings by id
            xy_views = [r[:, :2] if dims else r for r in rings]
            by_id = {id(v): r for v, r in zip(xy_views, rings)}
            polys = [[by_id[id(v)] for v in group]
                     for group in _rings_to_polygons(xy_views)]
            node_polys = [(C.POLYGON, list(poly), dims)
                          for poly in polys]
            if len(node_polys) == 1:
                return C.write_wkb_curve(node_polys[0])
            return C.write_wkb_curve(
                (C.MULTIPOLYGON, node_polys, dims))
        nodes = [(C.LINESTRING, arr[s:s + c], dims) for s, c in parts]
        if len(nodes) == 1:
            return C.write_wkb_curve(nodes[0])
        return C.write_wkb_curve((C.MULTILINESTRING, nodes, dims))

    # curve assembly per ogrpgeogeometry.cpp OGRShapeCreateCompoundCurve
    def _curve_wkb(self, parts, pts, zs, ms, curves, is_poly):
        coords, dims = self._stack(pts, zs, ms)
        coords = np.atleast_2d(coords)

        def xy(i):
            return tuple(coords[i])

        part_nodes = []
        ci = 0
        for s, c in parts:
            segs = []
            last = s
            for cv in curves:
                sidx = cv[0]
                if sidx < s:
                    continue
                if sidx >= s + c:
                    break
                if sidx + 1 >= s + c:
                    continue
                if sidx > last:
                    seg = [xy(i) for i in range(last, sidx + 1)]
                    segs.append((C.LINESTRING, np.asarray(seg), dims))
                p1 = xy(sidx)
                p3 = xy(sidx + 1)
                # synthesized points: arcs/ellipses carry p1's z, M is
                # left unset (0); bezier samples get z=0 too
                # (ogrpgeogeometry.cpp addPoint(x, y) vs OGRPoint z)
                extras = ()
                if "Z" in dims:
                    extras += (p1[2],)
                if "M" in dims:
                    extras += (0.0,)
                bez_extras = tuple(0.0 for _ in dims)
                if cv[1] == "arc":
                    _s, _k, v1, v2, bits = cv
                    if (bits & ARC_IP) and not (bits & ARC_LINE):
                        p2 = (v1, v2) + extras
                        if (p1[0] == p3[0] and p1[1] == p3[1]
                                and (p1[0] != v1 or p1[1] != v2)):
                            # full circle → 5-point variant
                            cx = (p1[0] + v1) / 2
                            cy = (p1[1] + v2) / 2
                            i1 = (cx - (v2 - cy),
                                  cy + (p1[0] - cx)) + extras
                            i2 = (cx + (v2 - cy),
                                  cy - (p1[0] - cx)) + extras
                            seg_a = np.asarray([p1, i1, p2, i2, p3])
                        else:
                            seg_a = np.asarray([p1, p2, p3])
                        segs.append((C.CIRCULARSTRING, seg_a, dims))
                    elif not (bits & (ARC_EMPTY | ARC_LINE
                                      | ARC_POINT)):
                        # deprecated center-point arc
                        cx, cy = v1, v2
                        a0 = math.atan2(p1[1] - cy, p1[0] - cx)
                        a1 = math.atan2(p3[1] - cy, p3[0] - cx)
                        r = math.hypot(p3[0] - cx, p3[1] - cy)
                        if bits & ARC_CCW:
                            if a0 >= a1:
                                a1 += 2 * math.pi
                        else:
                            if a0 <= a1:
                                a1 -= 2 * math.pi
                        am = (a0 + a1) / 2
                        p2 = (cx + r * math.cos(am),
                              cy + r * math.sin(am)) + extras
                        segs.append((C.CIRCULARSTRING,
                                     np.asarray([p1, p2, p3]), dims))
                    else:
                        segs.append((C.LINESTRING,
                                     np.asarray([p1, p3]), dims))
                elif cv[1] == "ellipse":        # → sampled line
                    _s, _k, vs0, vs1, rot, smaj, ratio, bits = cv
                    if bits & (ELL_CENTER_TO | ELL_CENTER_FROM):
                        segs.append((C.LINESTRING,
                                     np.asarray([p1, p3]), dims))
                        last = sidx + 1
                        continue
                    smin = smaj * ratio
                    rot_deg = -math.degrees(rot)
                    a0 = _angle_on_ellipse(p1[0], p1[1], vs0, vs1,
                                           rot_deg, smaj, smin)
                    a1 = _angle_on_ellipse(p3[0], p3[1], vs0, vs1,
                                           rot_deg, smaj, smin)
                    s_ap, e_ap = -a0, -a1
                    if bits & ELL_COMPLETE:
                        e_ap = s_ap + 360
                    elif bits & ELL_MINOR:
                        if e_ap > s_ap + 180:
                            e_ap -= 360
                        elif e_ap < s_ap - 180:
                            e_ap += 360
                    else:
                        if s_ap < e_ap < s_ap + 180:
                            e_ap -= 360
                        elif s_ap - 180 < e_ap < s_ap:
                            e_ap += 360
                    seg_a = _approximate_arc_angles(vs0, vs1, smaj,
                                                    smin, rot_deg,
                                                    s_ap, e_ap)
                    if extras:
                        seg_a = np.hstack([seg_a, np.tile(
                            extras, (len(seg_a), 1))])
                    seg_a[0] = p1
                    seg_a[-1] = p3
                    segs.append((C.LINESTRING, seg_a, dims))
                else:                           # bezier → sampled line
                    _s, _k, x1, y1, x2, y2 = cv
                    x0, y0 = p1[0], p1[1]
                    x3, y3 = p3[0], p3[1]
                    a0 = math.atan2(y1 - y0, x1 - x0)
                    a1 = math.atan2(y3 - y2, x3 - x2)
                    if a0 + math.pi < a1:
                        a0 += 2 * math.pi
                    elif a1 + math.pi < a0:
                        a1 += 2 * math.pi
                    step = C.DEFAULT_ARC_STEP_DEG / 180.0 * math.pi
                    lt0 = (x1 - x0) ** 2 + (y1 - y0) ** 2
                    lt1 = (x3 - x2) ** 2 + (y3 - y2) ** 2
                    ll = (x3 - x0) ** 2 + (y3 - y0) ** 2
                    nsteps = 1 if ll < 1e-9 else int(min(
                        1000.0, math.ceil(
                            max(2.0, abs(a1 - a0) / step)
                            * max(1.0, 5.0 * (lt0 + lt1) / ll))))
                    ts = np.linspace(0.0, 1.0, nsteps + 1)
                    bx = ((1 - ts) ** 3 * x0
                          + 3 * (1 - ts) ** 2 * ts * x1
                          + 3 * (1 - ts) * ts ** 2 * x2 + ts ** 3 * x3)
                    by = ((1 - ts) ** 3 * y0
                          + 3 * (1 - ts) ** 2 * ts * y1
                          + 3 * (1 - ts) * ts ** 2 * y2 + ts ** 3 * y3)
                    bx[0], by[0] = x0, y0
                    bx[-1], by[-1] = x3, y3
                    seg_a = np.column_stack([bx, by])
                    if bez_extras:
                        seg_a = np.hstack([seg_a, np.tile(
                            bez_extras, (len(seg_a), 1))])
                        seg_a[0] = p1
                        seg_a[-1] = p3
                    segs.append((C.LINESTRING, seg_a, dims))
                last = sidx + 1
            if last < s + c - 1 or not segs:
                seg = [xy(i) for i in range(last, s + c)]
                if len(seg) >= 2:
                    segs.append((C.LINESTRING, np.asarray(seg), dims))
            # parity: parts containing an arc stay COMPOUNDCURVE even
            # with one member; all-linear parts are forced to a single
            # LINESTRING (OGRShapeCreateCompoundCurve tail)
            if any(sg[0] == C.CIRCULARSTRING for sg in segs):
                part_nodes.append((C.COMPOUNDCURVE, segs, dims))
            else:
                merged = np.atleast_2d(np.asarray(segs[0][1]))
                for sg in segs[1:]:
                    a = np.atleast_2d(np.asarray(sg[1]))
                    if np.array_equal(merged[-1], a[0]):
                        merged = np.vstack([merged, a[1:]])
                    else:
                        merged = np.vstack([merged, a])
                part_nodes.append((C.LINESTRING, merged, dims))
        if is_poly:
            if len(part_nodes) == 1:
                return C.write_wkb_curve(
                    (C.CURVEPOLYGON, part_nodes, dims))
            # organizePolygons(ONLY_CCW) parity: group ring parts by
            # shapefile winding using the raw stream vertices
            xy_rings = [pts[s:s + c] for s, c in parts]
            by_id = {id(r): node for r, node in zip(xy_rings,
                                                    part_nodes)}
            groups = _rings_to_polygons(xy_rings)
            cps = [(C.CURVEPOLYGON, [by_id[id(r)] for r in grp], dims)
                   for grp in groups]
            if len(cps) == 1:
                return C.write_wkb_curve(cps[0])
            return C.write_wkb_curve((C.MULTISURFACE, cps, dims))
        if len(part_nodes) == 1:
            return C.write_wkb_curve(part_nodes[0])
        return C.write_wkb_curve((C.MULTICURVE, part_nodes, dims))


class FileGDB:
    """A ``.gdb`` directory: catalog + per-layer tables."""

    def __init__(self, path):
        self.path = path
        cat = GdbTable(os.path.join(path, "a00000001"))
        self.catalog = {}             # name → table id
        for rid, vals in cat.rows():
            name = vals.get("Name")
            if not name or name.startswith("GDB_"):
                continue
            self.catalog[name] = rid

    def layer_names(self):
        return list(self.catalog)

    def table(self, name):
        rid = self.catalog[name]
        return GdbTable(os.path.join(self.path, "a%08x" % rid))

    def layer_table(self, name):
        t = self.table(name)
        rows = [(rid, vals) for rid, vals in t.rows()]
        cols = {}
        names = [f.name for f in t.fields if f.type != T_RASTER]
        for f in t.fields:
            key = "wkb" if f.type == T_GEOMETRY else f.name
            data = [v.get(key) for _r, v in rows]
            if f.type in (T_INT16, T_INT32):
                cols[key] = pa.array(data, pa.int32())
            elif f.type in (T_INT64, T_OBJECTID):
                cols[key] = pa.array(data, pa.int64())
            elif f.type == T_F32:
                cols[key] = pa.array(data, pa.float32())
            elif f.type in (T_F64, T_DATETIME, T_DATE, T_TIME):
                cols[key] = pa.array(data, pa.float64())
            elif f.type == T_GEOMETRY:
                cols[key] = pa.array(data, pa.binary())
            elif f.type in (T_BINARY,):
                cols[key] = pa.array(data, pa.binary())
            elif f.type == T_DATETIME_TZ:
                cols[key] = pa.array(
                    [None if d is None else d[0] for d in data],
                    pa.float64())
            elif f.type == T_RASTER:
                continue
            else:
                cols[key] = pa.array(data, pa.string())
        return pa.table(cols)


def filegdb_layers(path):
    """``.gdb`` directory → user layer/table names."""
    return FileGDB(path).layer_names()


def read_filegdb(path, layer=None):
    """FileGDB → pyarrow Table for ``layer`` (or dict of all)."""
    g = FileGDB(path)
    if layer is not None:
        return g.layer_table(layer)
    return {n: g.layer_table(n) for n in g.layer_names()}


# ---------------------------------------------------------------- writer

def _wvaruint(v):
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


_W_XYORIGIN, _W_XYSCALE = -400.0, 1e9


def _gdbtable_bytes(fields, rows):
    """fields: [(name, kind)] with kind in {'objectid','int32',
    'float64','string','geometry_point'}; rows: list of dicts
    (geometry as (x, y) tuple) → (.gdbtable bytes, .gdbtablx bytes).

    Layout per the public FGDB spec / filegdbtable_write.cpp:130."""
    # ---- field descriptor section
    sec = bytearray()
    sec += struct.pack("<i", 4)                  # version
    geomtype = 1 if any(k == "geometry_point"
                        for _n, k in fields) else 0
    sec += bytes([geomtype, 3, 0, 0])            # type, utf8+?, 0, flags
    sec += struct.pack("<H", len(fields))
    nullable = []
    for name, kind in fields:
        nm = name.encode("utf-16-le")
        sec += bytes([len(name)]) + nm + b"\x00"  # name + empty alias
        if kind == "objectid":
            sec += bytes([6, 4, 2])
            nullable.append(False)
        elif kind == "int32":
            sec += bytes([1, 4, 5, 0])
            nullable.append(True)
        elif kind == "float64":
            sec += bytes([3, 8, 5, 0])
            nullable.append(True)
        elif kind == "string":
            sec += bytes([4]) + struct.pack("<i", 160) + bytes([5, 0])
            nullable.append(True)
        elif kind == "geometry_point":
            sec += bytes([7, 0, 7])
            wkt = "{B286C06B-0879-11D2-AACA-00C04FA33C20}"
            w16 = wkt.encode("utf-16-le")
            sec += struct.pack("<H", len(w16)) + w16
            sec += bytes([0])                    # no z/m origin groups
            sec += struct.pack("<4d", _W_XYORIGIN, _W_XYORIGIN,
                               _W_XYSCALE, 1.0 / _W_XYSCALE)
            sec += struct.pack("<4d", 0, 0, 0, 0)  # bbox (updated never)
            sec += bytes([0]) + struct.pack("<i", 1) \
                + struct.pack("<d", 1000.0)
            nullable.append(True)
        else:
            raise ValueError(kind)
    nb = (sum(nullable) + 7) // 8
    # ---- rows
    blobs = []
    for row in rows:
        body = bytearray(b"\x00" * nb)
        ni = 0
        for (name, kind), isnull in zip(fields, nullable):
            v = row.get(name)
            if kind == "objectid":
                continue
            if isnull:
                if v is None:
                    body[ni >> 3] |= 1 << (ni & 7)
                    ni += 1
                    continue
                ni += 1
            if kind == "int32":
                body += struct.pack("<i", v)
            elif kind == "float64":
                body += struct.pack("<d", v)
            elif kind == "string":
                enc = str(v).encode("utf-8")
                body += _wvaruint(len(enc)) + enc
            elif kind == "geometry_point":
                x, y = v
                g = (_wvaruint(1)
                     + _wvaruint(round((x - _W_XYORIGIN)
                                       * _W_XYSCALE) + 1)
                     + _wvaruint(round((y - _W_XYORIGIN)
                                       * _W_XYSCALE) + 1))
                body += _wvaruint(len(g)) + g
        blobs.append(bytes(body))
    # ---- assemble .gdbtable
    header = bytearray(40)
    struct.pack_into("<6i", header, 0, 3, len(rows),
                     max([len(b) for b in blobs] + [len(sec)]),
                     5, 0, 0)
    pos = 40
    offsets = []
    data = bytearray()
    for b in blobs:
        offsets.append(pos + len(data))
        data += struct.pack("<i", len(b)) + b
    fdo = 40 + len(data)
    struct.pack_into("<q", header, 32, fdo)
    table = bytes(header) + bytes(data) \
        + struct.pack("<i", len(sec)) + bytes(sec)
    struct.pack_into("<q", bytearray(8), 0, len(table))
    table = table[:24] + struct.pack("<q", len(table)) + table[32:]
    # ---- .gdbtablx: 5-byte offsets in 1024-slot blocks + trailer
    nblocks = max(1, -(-len(rows) // 1024))
    tx = bytearray(struct.pack("<4I", 3, nblocks, len(rows), 5))
    for o in offsets:
        tx += int(o).to_bytes(5, "little")
    tx += b"\x00" * 5 * (nblocks * 1024 - len(offsets))
    tx += struct.pack("<4I", 0, nblocks, nblocks, 0)
    return table, bytes(tx)


def write_filegdb(path, layers):
    """{layer_name: rows} → minimal ``.gdb`` directory.

    Each row dict maps field name → value; a ``"SHAPE"`` key holding
    an (x, y) tuple makes a point layer.  Field kinds are inferred
    from the first non-null value (int → int32, float → float64,
    str → string).  Emits the GDB_SystemCatalog (a00000001) plus one
    aNNNNNNNN table per layer, readable by :class:`FileGDB` and by
    the reference's OpenFileGDB driver layout."""
    os.makedirs(path, exist_ok=True)
    system = ["GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs",
              "GDB_Items", "GDB_ItemRelationships",
              "GDB_ItemRelationshipTypes", "GDB_ItemTypes",
              "GDB_ReplicaLog"]
    cat_fields = [("ID", "objectid"), ("Name", "string"),
                  ("FileFormat", "int32")]
    cat_rows = [{"Name": n, "FileFormat": 0} for n in system]
    ids = {}
    for i, name in enumerate(layers, len(system) + 1):
        ids[name] = i
        cat_rows.append({"Name": name, "FileFormat": 0})
    tbl, tx = _gdbtable_bytes(cat_fields, cat_rows)
    with open(os.path.join(path, "a00000001.gdbtable"), "wb") as f:
        f.write(tbl)
    with open(os.path.join(path, "a00000001.gdbtablx"), "wb") as f:
        f.write(tx)
    for name, rows in layers.items():
        fields = [("OBJECTID", "objectid")]
        sample = rows[0] if rows else {}
        for k in sample:
            v = next((r[k] for r in rows if r.get(k) is not None),
                     None)
            if k == "SHAPE":
                fields.append(("SHAPE", "geometry_point"))
            elif isinstance(v, int):
                fields.append((k, "int32"))
            elif isinstance(v, float):
                fields.append((k, "float64"))
            else:
                fields.append((k, "string"))
        tbl, tx = _gdbtable_bytes(fields, rows)
        base = os.path.join(path, "a%08x" % ids[name])
        with open(base + ".gdbtable", "wb") as f:
            f.write(tbl)
        with open(base + ".gdbtablx", "wb") as f:
            f.write(tx)
