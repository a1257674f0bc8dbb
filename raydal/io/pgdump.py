"""PostgreSQL dump (PGDump) write-only vector driver, from scratch
on the published SQL surface.

Reference semantics (``ogr/ogrsf_frmts/pgdump/ogrpgdumplayer.cpp`` +
``ogrpgdumpdatasource.cpp``): DROP TABLE IF EXISTS …;
DELETE FROM geometry_columns …; BEGIN; CREATE TABLE "schema"."t"();
ogc_fid SERIAL PRIMARY KEY; SELECT AddGeometryColumn(...); one ALTER
TABLE ADD COLUMN per field (Real→FLOAT8, Integer→INTEGER,
Integer64→BIGINT, String→VARCHAR[(w)], Boolean→BOOLEAN); INSERT rows
(NULL fields omitted from the column list) or ``COPY … FROM STDIN``
with tab-separated rows and ``\\N`` nulls when PG_USE_COPY; geometry
as hex WKB — DIM=3 sets the old-style 0x80000000 z flag with z=0
appended, SRID ≥ 0 adds the EWKB 0x20000000 srid block; GIST index;
COMMIT.

Published parity: the exact statement list ``autotest/ogr/
ogr_pgdump.py`` test_ogr_pgdump_1 asserts on poly.shp (incl. the
byte-exact 3D hex INSERT of feature 1 and the FLOAT8/VARCHAR(8)
DDL), tests/test_pgdump.py.
"""

from __future__ import annotations

import struct

import pyarrow as pa

__all__ = ["write_pgdump"]


def _wkb_force_3d(wkb):
    """2-D WKB → old-style 3-D (type | 0x80000000, z = 0).  Little-
    endian single geometries (point/line/polygon/multi*/collection)."""
    out = bytearray()

    def rec(buf, pos):
        if buf[pos] != 1:
            raise ValueError("little-endian WKB expected")
        gtype = struct.unpack_from("<I", buf, pos + 1)[0]
        base = gtype & 0xFF
        out.append(1)
        out.extend(struct.pack("<I", base | 0x80000000))
        pos += 5
        if base == 1:                        # point
            x, y = struct.unpack_from("<2d", buf, pos)
            out.extend(struct.pack("<3d", x, y, 0.0))
            return pos + 16
        if base == 2:                        # linestring
            n = struct.unpack_from("<I", buf, pos)[0]
            out.extend(struct.pack("<I", n))
            pos += 4
            for _ in range(n):
                x, y = struct.unpack_from("<2d", buf, pos)
                out.extend(struct.pack("<3d", x, y, 0.0))
                pos += 16
            return pos
        if base == 3:                        # polygon
            nr = struct.unpack_from("<I", buf, pos)[0]
            out.extend(struct.pack("<I", nr))
            pos += 4
            for _ in range(nr):
                n = struct.unpack_from("<I", buf, pos)[0]
                out.extend(struct.pack("<I", n))
                pos += 4
                for _ in range(n):
                    x, y = struct.unpack_from("<2d", buf, pos)
                    out.extend(struct.pack("<3d", x, y, 0.0))
                    pos += 16
            return pos
        # multi*/collection: recurse
        n = struct.unpack_from("<I", buf, pos)[0]
        out.extend(struct.pack("<I", n))
        pos += 4
        for _ in range(n):
            pos = rec(buf, pos)
        return pos

    rec(wkb, 0)
    return bytes(out)


def _wkb_with_srid(wkb, srid):
    """EWKB: set 0x20000000 on the (outer) type and insert the srid."""
    gtype = struct.unpack_from("<I", wkb, 1)[0]
    return (wkb[:1] + struct.pack("<I", gtype | 0x20000000)
            + struct.pack("<i", srid) + wkb[9:])


def _pg_type(t, width=None):
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_floating(t):
        return "FLOAT8"
    if pa.types.is_integer(t):
        return "INTEGER" if t.bit_width <= 32 else "BIGINT"
    return f"VARCHAR({width})" if width else "VARCHAR"


def _esc_ident(name):
    return '"' + name.replace('"', '""') + '"'


def _sql_literal(v, t):
    if pa.types.is_boolean(t):
        return "'t'" if v else "'f'"
    if pa.types.is_floating(t):
        return f"{v:.15g}"
    if pa.types.is_integer(t):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def write_pgdump(table, path, layer="tpoly", schema="public",
                 geometry_name="wkb_geometry", srid=-1, dim=2,
                 postgis_version="1.5", use_copy=False, widths=None,
                 int32_cols=(), crlf=False):
    """Arrow table (wkb + attribute columns) → PostgreSQL .sql dump.

    ``widths`` maps column name → VARCHAR width; ``int32_cols`` names
    int64 Arrow columns that should be declared INTEGER (the OGR
    default Integer type, as in the published tpoly schema).
    """
    attr = [n for n in table.schema.names if n not in ("fid", "wkb")]
    widths = widths or {}
    eol = "\r\n" if crlf else "\n"
    q_schema, q_table = _esc_ident(schema), _esc_ident(layer)
    qual = f"{q_schema}.{q_table}"
    def lit(s):                          # single-quote escape for
        return s.replace("'", "''")      # string-literal contexts

    lines = [
        f"DROP TABLE IF EXISTS {qual} CASCADE;",
        f"DELETE FROM geometry_columns WHERE f_table_name = "
        f"'{lit(layer)}' AND f_table_schema = '{lit(schema)}';",
        "BEGIN;",
        f"CREATE TABLE {qual}();",
        f"ALTER TABLE {qual} ADD COLUMN \"ogc_fid\" SERIAL "
        f"CONSTRAINT {_esc_ident(layer + '_pk')} PRIMARY KEY;",
        f"SELECT AddGeometryColumn('{lit(schema)}','{lit(layer)}',"
        f"'{lit(geometry_name)}',{srid},'GEOMETRY',{dim});",
    ]

    lowered = {n: n.lower() for n in attr}
    for n in attr:
        t = table.schema.field(n).type
        pgt = _pg_type(t, widths.get(n))
        if n in int32_cols and pgt == "BIGINT":
            pgt = "INTEGER"
        lines.append(f"ALTER TABLE {qual} ADD COLUMN "
                     f"{_esc_ident(lowered[n])} {pgt};")

    def hex_geom(b):
        g = _wkb_force_3d(b) if dim == 3 else b
        if srid >= 0:
            g = _wkb_with_srid(g, srid)
        return g.hex().upper()

    q_geom = _esc_ident(geometry_name)
    if use_copy:
        cols = ", ".join([q_geom] + [_esc_ident(lowered[n])
                                     for n in attr])
        lines.append(f"COPY {qual} ({cols}) FROM STDIN;")
        for r in range(table.num_rows):
            vals = []
            b = table["wkb"][r].as_py()
            vals.append(hex_geom(b) if b is not None else "\\N")
            for n in attr:
                v = table[n][r].as_py()
                t = table.schema.field(n).type
                if v is None:
                    vals.append("\\N")
                elif pa.types.is_boolean(t):
                    vals.append("t" if v else "f")
                elif pa.types.is_floating(t):
                    vals.append(f"{v:.15g}")
                else:
                    vals.append(str(v))
            lines.append("\t".join(vals))
        lines.append("\\.")
    else:
        for r in range(table.num_rows):
            cols, vals = [], []
            b = table["wkb"][r].as_py()
            if b is not None:
                cols.append(q_geom)
                vals.append(f"'{hex_geom(b)}'")
            for n in attr:
                v = table[n][r].as_py()
                if v is None:
                    continue             # NULL fields omitted
                cols.append(_esc_ident(lowered[n]))
                vals.append(_sql_literal(v, table.schema.field(n).type))
            if cols:
                lines.append(f"INSERT INTO {qual} ({', '.join(cols)})"
                             f" VALUES ({', '.join(vals)});")
            else:                        # all-NULL row
                lines.append(f"INSERT INTO {qual} DEFAULT VALUES;")

    lines.append(
        f"CREATE INDEX {_esc_ident(layer + '_' + geometry_name + '_geom_idx')}"
        f" ON {qual} USING GIST ({q_geom});")
    lines.append("COMMIT;")
    with open(path, "w", newline="") as f:
        f.write(eol.join(lines) + eol)
    return path
