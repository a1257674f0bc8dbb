"""PGDump write-only driver vs the exact statement list the
reference asserts (``autotest/ogr/ogr_pgdump.py`` test_ogr_pgdump_1
on poly.shp, incl. the byte-exact 3D hex INSERT)."""

import pyarrow as pa
import pytest

from raydal.io.pgdump import write_pgdump
from raydal.io.shapefile import read_shapefile
from raydal.io.wkt import wkt_to_wkb

OGR = "/root/reference/autotest/ogr/data/"

# the full INSERT the reference test asserts character-for-character
_PUBLISHED_INSERT = (
    'INSERT INTO "public"."tpoly" ("wkb_geometry", "area", "eas_id", '
    '"prfedea") VALUES (\'0103000080010000001400000000000060'
    "2F491D41000000207F2D52410000000000000000000000C028471D41000000E0"
    "922D52410000000000000000000000007C461D4100000060AE2D524100000000"
    "0000000000000080C9471D4100000020B62D5241000000000000000000000020"
    "9C4C1D41000000E0D82D52410000000000000000000000608D4C1D41000000A0"
    "DD2D52410000000000000000000000207F4E1D41000000A0EA2D524100000000"
    "0000000000000020294F1D4100000080CA2D5241000000000000000000000000"
    "B4511D41000000E0552D52410000000000000000000000C016521D4100000080"
    "452D52410000000000000000000000E0174E1D41000000202E2D524100000000"
    "0000000000000020414D1D41000000E04C2D52410000000000000000000000E0"
    "4B4D1D41000000605E2D5241000000000000000000000040634D1D41000000E0"
    "742D52410000000000000000000000A0EF4C1D41000000E08D2D524100000000"
    "00000000000000E04E4C1D41000000E0A12D52410000000000000000000000E0"
    "B04B1D4100000060B82D5241000000000000000000000080974A1D4100000080"
    "AE2D5241000000000000000000000080CF491D4100000080952D524100000000"
    "00000000000000602F491D41000000207F2D52410000000000000000', "
    "215229.266, 168, '35043411');")


def _tpoly_table():
    shp = read_shapefile(OGR + "poly.shp")
    return shp.append_column(
        "SHORTNAME", pa.array([None] * shp.num_rows, pa.string()))


def test_published_statement_sequence(tmp_path):
    p = str(tmp_path / "tpoly.sql")
    write_pgdump(_tpoly_table(), p, dim=3,
                 widths={"SHORTNAME": 8}, int32_cols=("EAS_ID",))
    sql = open(p).read()
    needles = [
        'DROP TABLE IF EXISTS "public"."tpoly" CASCADE;',
        "DELETE FROM geometry_columns WHERE f_table_name = 'tpoly' "
        "AND f_table_schema = 'public';",
        "BEGIN;",
        'CREATE TABLE "public"."tpoly"();',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "ogc_fid" SERIAL '
        'CONSTRAINT "tpoly_pk" PRIMARY KEY;',
        "SELECT AddGeometryColumn('public','tpoly','wkb_geometry',"
        "-1,'GEOMETRY',3);",
        'ALTER TABLE "public"."tpoly" ADD COLUMN "area" FLOAT8;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "eas_id" INTEGER;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "prfedea" VARCHAR;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "shortname" '
        'VARCHAR(8);',
        _PUBLISHED_INSERT,
        'CREATE INDEX "tpoly_wkb_geometry_geom_idx" ON '
        '"public"."tpoly" USING GIST ("wkb_geometry");',
        "COMMIT;",
    ]
    pos = 0
    for nd in needles:
        i = sql.find(nd, pos)
        assert i >= 0, nd
        pos = i + len(nd)


def test_copy_mode_with_srid(tmp_path):
    # PG_USE_COPY=YES shape of test_ogr_pgdump_2: COPY FROM STDIN,
    # tab-separated rows, \N nulls, EWKB srid block, CRLF line ends
    t = pa.table({
        "fid": pa.array([0, 1], pa.int64()),
        "wkb": pa.array([wkt_to_wkb("POINT (1 2)"), None],
                        pa.binary()),
        "name": pa.array(["a", None], pa.string())})
    p = str(tmp_path / "copy.sql")
    write_pgdump(t, p, layer="pts", srid=4326, use_copy=True,
                 crlf=True)
    raw = open(p, "rb").read()
    assert b"\r\n" in raw
    sql = raw.decode()
    assert 'COPY "public"."pts" ("wkb_geometry", "name") FROM STDIN;' \
        in sql
    # EWKB: 0x20000000 srid flag + srid 4326 little-endian
    assert "0101000020E6100000" in sql
    assert "\\N\t\\N" in sql and "\\." in sql


def test_quoted_identifiers(tmp_path):
    t = pa.table({"fid": pa.array([0], pa.int64()),
                  "wkb": pa.array([wkt_to_wkb("POINT (0 0)")],
                                  pa.binary())})
    p = str(tmp_path / "q.sql")
    write_pgdump(t, p, layer='xx"yyy', schema='ano"ther_schema',
                 geometry_name='the_"geom')
    sql = open(p).read()
    assert '"ano""ther_schema"."xx""yyy"' in sql
    assert '"the_""geom"' in sql


def test_all_null_row_emits_default_values(tmp_path):
    t = pa.table({"fid": pa.array([0], pa.int64()),
                  "wkb": pa.array([None], pa.binary()),
                  "name": pa.array([None], pa.string())})
    p = str(tmp_path / "null.sql")
    write_pgdump(t, p, layer="nulls")
    sql = open(p).read()
    assert 'INSERT INTO "public"."nulls" DEFAULT VALUES;' in sql
    assert "() VALUES ();" not in sql


def test_apostrophe_in_layer_name_escaped(tmp_path):
    t = pa.table({"fid": pa.array([0], pa.int64()),
                  "wkb": pa.array([wkt_to_wkb("POINT (0 0)")],
                                  pa.binary())})
    p = str(tmp_path / "apos.sql")
    write_pgdump(t, p, layer="o'brien")
    sql = open(p).read()
    assert "f_table_name = 'o''brien'" in sql
    assert "AddGeometryColumn('public','o''brien'" in sql
