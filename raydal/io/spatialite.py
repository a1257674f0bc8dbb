"""SpatiaLite / plain-SQLite vector reader — stdlib ``sqlite3``
(read-only URI) + a from-scratch SpatiaLite-blob → WKB converter.

Reference semantics (``ogr/ogrsf_frmts/sqlite/``): feature layers
are enumerated from ``geometry_columns`` (SpatiaLite flavor:
f_table_name / f_geometry_column, geometry type name or code);
geometry values are SpatiaLite serialized blobs
(``ogrsqlitegeometry / OGRSQLiteLayer::ImportSpatiaLiteGeometry``):

    0x00 | endian (1 = LE) | srid i32 | MBR 4×f8 | 0x7C |
    class-type i32 | body … | 0xFE

The body shares WKB's layout but carries NO per-geometry endian
byte; sub-geometries of Multi*/Collections are introduced by a
0x69 entity marker + class i32.  Class codes: 1-7 like WKB, with
+1000 (Z), +2000 (M), +3000 (ZM) offsets; 1000000+ marks the
compressed variants, whose sequences store first/last vertices as
doubles and intermediate vertices as float32 deltas accumulated
from the previous vertex (``ogrsqlitelayer.cpp:1397-1449``).

Published parity: ``autotest/ogr/ogr_sqlite.py`` —
poly_spatialite.sqlite is the canonical ``poly`` layer (10
features, eas_id 168…151, same rings as poly.shp) and
first_geometry_null.db exercises NULL geometry rows.
"""

from __future__ import annotations

import sqlite3
import struct

import pyarrow as pa

__all__ = ["read_spatialite", "spatialite_to_wkb"]


def _ncoord(dims):
    return 2 + (1 if dims in (1, 2) else 2 if dims == 3 else 0)


def _read_ring(blob, pos, dims, compressed):
    """Decode one point sequence → (float64 array rows, newpos)."""
    import numpy as np
    nc = _ncoord(dims)
    n = struct.unpack_from("<i", blob, pos)[0]
    pos += 4
    if not compressed:
        flat = np.frombuffer(blob, "<f8", count=n * nc, offset=pos)
        return flat.reshape(n, nc), pos + 8 * n * nc
    # compressed: first/last vertices full f8, intermediates are
    # float32 deltas accumulated from the previous vertex
    # (ogrsqlitelayer.cpp:1397-1449)
    pts = np.empty((n, nc), "f8")
    for i in range(n):
        if i == 0 or i == n - 1:
            pts[i] = struct.unpack_from("<%dd" % nc, blob, pos)
            pos += 8 * nc
        else:
            deltas = struct.unpack_from("<%df" % nc, blob, pos)
            pos += 4 * nc
            pts[i] = pts[i - 1] + np.asarray(deltas, "f8")
    return pts, pos


def _encode_ring(pts):
    import numpy as np
    return struct.pack("<i", len(pts)) + \
        np.ascontiguousarray(pts, "<f8").tobytes()


def spatialite_to_wkb(blob):
    """SpatiaLite serialized geometry → standard little-endian WKB
    (or None for NULL/empty blobs)."""
    if blob is None or len(blob) < 44 or blob[0] != 0x00:
        return None
    if blob[1] != 0x01:
        raise ValueError("big-endian SpatiaLite blobs not supported")
    if blob[38] != 0x7C:
        raise ValueError("malformed SpatiaLite blob (no MBR marker)")
    pos = 39
    cls = struct.unpack_from("<i", blob, pos)[0]
    pos += 4

    def convert(cls, pos):
        compressed = cls >= 1000000
        rem = cls - 1000000 if compressed else cls
        dims = rem // 1000          # 0=XY 1=Z 2=M 3=ZM
        base = rem % 1000
        wkb_code = base + (0x80000000 if dims in (1, 3) else 0) \
            + (0x40000000 if dims in (2, 3) else 0)
        hdr = b"\x01" + struct.pack("<I", wkb_code)
        nc = _ncoord(dims)
        if base == 1:                                  # point
            body = blob[pos:pos + 8 * nc]
            return hdr + body, pos + 8 * nc
        if base == 2:                                  # linestring
            pts, pos = _read_ring(blob, pos, dims, compressed)
            return hdr + _encode_ring(pts), pos
        if base == 3:                                  # polygon
            nr = struct.unpack_from("<i", blob, pos)[0]
            pos += 4
            body = struct.pack("<i", nr)
            for _ in range(nr):
                pts, pos = _read_ring(blob, pos, dims, compressed)
                body += _encode_ring(pts)
            return hdr + body, pos
        # multi / collection: n entities, each 0x69 + class i32
        n = struct.unpack_from("<i", blob, pos)[0]
        pos += 4
        out = hdr + struct.pack("<i", n)
        for _ in range(n):
            if blob[pos] != 0x69:
                raise ValueError("missing SpatiaLite entity marker")
            sub_cls = struct.unpack_from("<i", blob, pos + 1)[0]
            sub, pos = convert(sub_cls, pos + 5)
            out += sub
        return out, pos

    wkb, _ = convert(cls, pos)
    return wkb


_DECL_TYPES = {"INTEGER": pa.int64(), "INT": pa.int64(),
               "BIGINT": pa.int64(), "FLOAT": pa.float64(),
               "DOUBLE": pa.float64(), "REAL": pa.float64(),
               "TEXT": pa.string(), "VARCHAR": pa.string(),
               "BLOB": pa.binary()}


def _pa_type(decl):
    d = (decl or "").upper().split("(")[0].strip()
    return _DECL_TYPES.get(d, pa.string())


def read_spatialite(path, layer=None, wkb_col="wkb"):
    """One feature layer → Arrow table (fid, plain-WKB geometry,
    attrs...)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        gc = list(con.execute(
            "SELECT f_table_name, f_geometry_column "
            "FROM geometry_columns"))
        if layer is None:
            if not gc:
                raise ValueError("no feature layers")
            table, geom_col = gc[0]
        else:
            hit = [r for r in gc if r[0].lower() == layer.lower()]
            if not hit:
                raise ValueError(f"no such layer {layer!r}")
            table, geom_col = hit[0]
        info = list(con.execute(f'PRAGMA table_info("{table}")'))
        pk = [r[1] for r in info if r[5]]
        fid_col = pk[0] if len(pk) == 1 else info[0][1]
        attr_cols = [(r[1], r[2]) for r in info
                     if r[1] not in (fid_col, geom_col)]
        names = ", ".join(f'"{c}"' for c, _ in attr_cols)
        sel = f'"{fid_col}", "{geom_col}"' + \
            (", " + names if names else "")
        rows = list(con.execute(f'SELECT {sel} FROM "{table}"'))
        cols = {"fid": pa.array([r[0] for r in rows], pa.int64()),
                wkb_col: pa.array([spatialite_to_wkb(r[1])
                                   for r in rows], pa.binary())}
        for i, (cname, decl) in enumerate(attr_cols):
            vals = [r[2 + i] for r in rows]
            typ = _pa_type(decl)
            if typ == pa.string():
                vals = [None if v is None else str(v) for v in vals]
            cols[cname] = pa.array(vals, typ)
        return pa.table(cols)
    finally:
        con.close()
