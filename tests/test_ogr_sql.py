"""OGR SQL dialect tests, mirroring the reference's
autotest/ogr/ogr_sql_test.py + ogr_sql_rfc28.py cases over the raydal
engine (expected values are the reference suite's published
expectations; the input fixtures replicate the autotest layers'
relevant columns)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo.wkb import box_polygon, point_wkb, polygon_wkb
from raydal.sql import OGRSQLError, execute_sql_table, parse_select

# data/poly.shp's attribute table (AREA, EAS_ID, PRFEDEA), FIDs 0..9 —
# the values every ogr_sql_test case asserts against
_POLY_AREA = [215229.266, 247328.172, 261752.781, 547597.188, 15775.758,
              101429.977, 268597.625, 1634833.391, 596610.313, 5268.813]
_POLY_EAS = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]
_POLY_PRF = ["35043411", "35043423", "35043414", "35043416", "35043417",
             "35043410", "35043413", "35043369", "35043408", "35043421"]
# data/idlink.dbf EAS_ID/NAME pairs
_IDLINK_EAS = [168, 179, 171, 173, 172, 169, 166]
_IDLINK_NAME = ["_168_", "_179_", "_171_", "_173_", "_172_", "_169_",
                "_166_"]


@pytest.fixture(scope="module")
def poly():
    return pa.table({
        "area": pa.array(_POLY_AREA),
        "eas_id": pa.array(_POLY_EAS, pa.int32()),
        "prfedea": pa.array(_POLY_PRF),
    })


@pytest.fixture(scope="module")
def idlink():
    # reference idlink has 7 rows with eas_id 158..179; rebuild the
    # exact set used by test_ogr_sql_5's published statistics
    eas = [158, 165, 166, 168, 170, 171, 179]
    return pa.table({
        "eas_id": pa.array(eas, pa.int32()),
        "name": pa.array([f"_{e}_" for e in eas]),
    })


def Q(sql, layers, **kw):
    return execute_sql_table(sql, layers, **kw)


# ----------------------------------------------------------- recordset

def test_where_basic(ray_session, poly):
    t = Q("SELECT * FROM poly WHERE eas_id < 167", {"poly": poly})
    assert t.num_rows == 3
    assert t.schema.names == ["area", "eas_id", "prfedea"]


def test_distinct_first_seen(ray_session, poly):
    t = Q("select distinct eas_id from poly where eas_id < 170",
          {"poly": poly})
    assert t["eas_id"].to_pylist() == [168, 169, 166, 158, 165]


def test_distinct_order(ray_session, poly):
    t = Q("select distinct eas_id from poly where eas_id < 170 "
          "order by eas_id", {"poly": poly})
    assert t["eas_id"].to_pylist() == [158, 165, 166, 168, 169]
    t = Q("select distinct eas_id from poly where eas_id < 170 "
          "order by eas_id desc", {"poly": poly})
    assert t["eas_id"].to_pylist() == [169, 168, 166, 165, 158]


def test_distinct_strings_sorted(ray_session, idlink):
    t = Q("select distinct name from idlink order by name asc",
          {"idlink": idlink})
    assert t["name"].to_pylist() == [
        "_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_"]


def test_column_functions(ray_session, idlink):
    # published expectations of test_ogr_sql_5
    t = Q("select max(eas_id), min(eas_id), avg(eas_id), "
          "STDDEV_POP(eas_id), STDDEV_SAMP(eas_id), sum(eas_id), "
          "count(eas_id) from idlink", {"idlink": idlink})
    assert t["MAX_eas_id"][0].as_py() == 179
    assert t["MIN_eas_id"][0].as_py() == 158
    assert t["AVG_eas_id"][0].as_py() == pytest.approx(
        168.142857142857, abs=1e-12)
    assert t["STDDEV_POP_eas_id"][0].as_py() == pytest.approx(
        5.9384599116647205, rel=1e-12)
    assert t["STDDEV_SAMP_eas_id"][0].as_py() == pytest.approx(
        6.414269805898183, rel=1e-12)
    assert t["SUM_eas_id"][0].as_py() == 1177
    assert t["COUNT_eas_id"][0].as_py() == 7


def test_count_star(ray_session, poly):
    t = Q("select count(*) from poly", {"poly": poly})
    assert t["COUNT_*"].to_pylist() == [10]


def test_fid_select_and_filter(ray_session, poly):
    t = Q("select eas_id, fid from poly where eas_id in (158,165)",
          {"poly": poly})
    assert sorted(t["fid"].to_pylist()) == [7, 8]
    t = Q("select fid,eas_id,prfedea from poly where fid = 7",
          {"poly": poly})
    assert t["fid"].to_pylist() == [7]
    assert t["eas_id"].to_pylist() == [158]


def test_wildcard_and_quoted_table(ray_session, poly):
    t = Q('select * from "poly" where eas_id in (158,165)',
          {"poly": poly})
    assert sorted(t["prfedea"].to_pylist()) == ["35043369", "35043408"]


def test_like_ilike(ray_session):
    pm = pa.table({"PRIME_MERIDIAN_NAME": ["Greenwich", "Paris",
                                           "Ferro"]})
    L = {"prime_meridian": pm}
    assert Q("select * from prime_meridian where PRIME_MERIDIAN_NAME "
             "ilike 'GREEN%'", L).num_rows == 1
    assert Q("select * from prime_meridian where PRIME_MERIDIAN_NAME "
             "ilike '%WICH'", L).num_rows == 1
    assert Q("select * from prime_meridian where PRIME_MERIDIAN_NAME "
             "ilike 'FOO%'", L).num_rows == 0
    assert Q("select * from prime_meridian where PRIME_MERIDIAN_NAME "
             "like 'Green%'", L).num_rows == 1
    assert Q("select * from prime_meridian where PRIME_MERIDIAN_NAME "
             "like 'GREEN%'", L).num_rows == 0


def test_max_on_empty(ray_session):
    empty = pa.table({"eas_id": pa.array([], pa.int32())})
    t = Q("select max(eas_id) from empty", {"empty": empty})
    assert t["MAX_eas_id"].to_pylist() == [None]
    t = Q("select distinct eas_id from empty", {"empty": empty})
    assert t.num_rows == 0


def test_string_case_insensitive_equality(ray_session):
    # '=' is strcasecmp in the dialect (swq_op_general.cpp:944)
    t = pa.table({"s": ["Hilda", "ANN"]})
    assert Q("select * from t where s = 'hilda'", {"t": t}).num_rows == 1
    assert Q("select * from t where s = 'ann'", {"t": t}).num_rows == 1
    assert Q("select * from t where s < 'H'", {"t": t}).num_rows == 1


def test_is_null(ray_session):
    t = pa.table({"strfield": ["a", "b", None]})
    assert Q("select * from my_layer where strfield is null",
             {"my_layer": t}).num_rows == 1
    assert Q("select * from my_layer where strfield is not null",
             {"my_layer": t}).num_rows == 2


def test_min_count_mixed(ray_session, poly):
    t = Q("select min(eas_id), count(*) from poly", {"poly": poly})
    assert t["COUNT_*"].to_pylist() == [10]
    assert t["MIN_eas_id"].to_pylist() == [158]


def test_agg_on_empty_where(ray_session, poly):
    t = Q("select min(eas_id) from poly where area = 0", {"poly": poly})
    assert t["MIN_eas_id"].to_pylist() == [None]


def test_string_to_numeric_in(ray_session, poly):
    t = Q("select count(*) from poly where eas_id in ('165')",
          {"poly": poly})
    assert t["COUNT_*"].to_pylist() == [1]
    with pytest.raises(OGRSQLError):
        Q("select count(*) from poly where eas_id in ('a165')",
          {"poly": poly})


def test_huge_select_list(ray_session, poly):
    cols = "area"
    for _ in range(10):
        cols = cols + "," + cols
    t = Q(f"select {cols} from poly", {"poly": poly})
    assert t.num_columns == 1024


def test_distinct_null_ordering(ray_session):
    lyr = pa.table({
        "intfield": pa.array([1, None], pa.int32()),
        "floatfield": pa.array([2.3, None]),
        "strfield": pa.array(["456", None]),
        "int64field": pa.array([1234567890123, None], pa.int64()),
    })
    for f in ("intfield", "int64field", "floatfield", "strfield"):
        t = Q(f"select distinct {f} from layer order by {f} asc",
              {"layer": lyr})
        vals = t[f].to_pylist()
        assert vals[0] is None and vals[1] is not None, f
        t = Q(f"select distinct {f} from layer order by {f} desc",
              {"layer": lyr})
        vals = t[f].to_pylist()
        assert vals[0] is not None and vals[1] is None, f


def test_count_and_null(ray_session):
    lyr = pa.table({
        "intfield": pa.array([1, 1, None, None], pa.int32()),
        "floatfield": pa.array([None, None, 2.3, 2.3]),
        "strfield": pa.array(["456", "456", None, None]),
        "intfield_never_set": pa.array([None] * 4, pa.int32()),
        "strfield_first_null": pa.array([None, None, "foo", None]),
    })
    L = {"layer": lyr}
    for f in ("intfield", "floatfield", "strfield"):
        t = Q(f"select count({f}), count(distinct {f}), count(*) "
              f"from layer", L)
        assert t[f"COUNT_{f}"].to_pylist() == [2]
        assert t.column(1).to_pylist() == [1]
        assert t["COUNT_*"].to_pylist() == [4]
    t = Q("select avg(intfield) a, STDDEV_POP(intfield) s from layer "
          "where intfield is null", L)
    assert t["a"].to_pylist() == [None]
    assert t["s"].to_pylist() == [None]
    t = Q("select distinct strfield_first_null from layer", L)
    assert t["strfield_first_null"].to_pylist() == [None, "foo"]
    t = Q("select min(intfield_never_set) a, max(intfield_never_set) b,"
          " avg(intfield_never_set) c, sum(intfield_never_set) d, "
          "count(intfield_never_set) e from layer", L)
    assert t["a"].to_pylist() == [None]
    assert t["d"].to_pylist() == [None]
    assert t["e"].to_pylist() == [0]


def test_order_by_fid_desc(ray_session, poly):
    t = Q("SELECT fid FROM poly ORDER BY FID DESC", {"poly": poly})
    assert t["fid"][0].as_py() == 9


def test_empty_string_compare(ray_session, poly):
    t = Q("SELECT * FROM poly WHERE prfedea <> ''", {"poly": poly})
    assert t.num_rows == 10


def test_escape_sequences(ray_session, poly):
    t = Q("SELECT '\"' as a, '\\' as b, '''' as c FROM poly LIMIT 1",
          {"poly": poly})
    assert t["a"][0].as_py() == '"'
    assert t["b"][0].as_py() == "\\"
    assert t["c"][0].as_py() == "'"


# ------------------------------------------------------------- hstore

@pytest.mark.parametrize("sql", [
    "SELECT hstore_get_value('a') FROM poly",
    "SELECT hstore_get_value(1, 1) FROM poly",
])
def test_hstore_invalid_params(ray_session, poly, sql):
    with pytest.raises(OGRSQLError):
        Q(sql, {"poly": poly})


@pytest.mark.parametrize("sql", [
    "SELECT hstore_get_value('a', null) h FROM poly",
    "SELECT hstore_get_value(null, 'a') h FROM poly",
    "SELECT hstore_get_value('a', 'a') h FROM poly",
    "SELECT hstore_get_value('a=>b', 'c') h FROM poly",
    "SELECT hstore_get_value('a=>', 'a') h FROM poly",
    "SELECT hstore_get_value(' a => ', 'a') h FROM poly",
    "SELECT hstore_get_value('a=>b,z,c=>d', 'c') h FROM poly",
    "SELECT hstore_get_value('\"a', 'a') h FROM poly",
    "SELECT hstore_get_value('\"a\"', 'a') h FROM poly",
    "SELECT hstore_get_value('\"a\"=', 'a') h FROM poly",
    "SELECT hstore_get_value('\"a\" =>', 'a') h FROM poly",
    "SELECT hstore_get_value('\"a\" => ', 'a') h FROM poly",
    "SELECT hstore_get_value('\"a\" => \"', 'a') h FROM poly",
    "SELECT hstore_get_value('\"a\" => \"\" z', 'a') h FROM poly",
])
def test_hstore_invalid_syntax(ray_session, poly, sql):
    t = Q(sql + " LIMIT 1", {"poly": poly})
    assert t["h"][0].as_py() is None, sql


@pytest.mark.parametrize("sql,expected", [
    ("SELECT hstore_get_value('a=>b', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value(' a => b ', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value('\"a\"=>b', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value(' \"a\" =>b', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value('a=>\"b\"', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value('a=> \"b\" ', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value('\"a\"=>\"b\"', 'a') h FROM poly", "b"),
    ("SELECT hstore_get_value(' \"a\" => \"b\" ', 'a') h FROM poly",
     "b"),
    ('SELECT hstore_get_value(\' "a\\"b" => "b" \', \'a"b\') h '
     "FROM poly", "b"),
])
def test_hstore_valid(ray_session, poly, sql, expected):
    t = Q(sql + " LIMIT 1", {"poly": poly})
    assert t["h"][0].as_py() == expected, sql


# ----------------------------------------------------- strict quoting

@pytest.fixture(scope="module")
def quoting_ds():
    return pa.table({
        "id": pa.array([1, 3], pa.int32()),
        "from": pa.array(["not_from", "from"]),
    })


def test_strict_quoting_non_aggregate(ray_session, quoting_ds):
    t = Q('select id, \'id\', "id" as id2, id as "id3", "from" '
          'from test where "from" = \'from\'', {"test": quoting_ds})
    assert t.num_rows == 1
    assert t["id"][0].as_py() == 3
    assert t.column(1)[0].as_py() == "id"
    assert t["id2"][0].as_py() == 3
    assert t["id3"][0].as_py() == 3
    assert t["from"][0].as_py() == "from"


def test_strict_quoting_aggregate(ray_session, quoting_ds):
    t = Q('select max("id"), max(id) m2, count("id") c1, count(id) c2 '
          'from "test"', {"test": quoting_ds})
    assert t["MAX_id"][0].as_py() == 3
    assert t["m2"][0].as_py() == 3
    assert t["c1"][0].as_py() == 2
    assert t["c2"][0].as_py() == 2


@pytest.mark.parametrize("sql", [
    "select * from 'test'",
    "select max('id') from test",
    "select id as 'id2' from test",
])
def test_strict_quoting_errors(ray_session, quoting_ds, sql):
    with pytest.raises(OGRSQLError):
        Q(sql, {"test": quoting_ds})


# -------------------------------------------------------- order/limit

def test_null_sorting(ray_session):
    t = pa.table({"text_value": pa.array(
        ["c", None, "a", "b", None, "d"])})
    r = Q("SELECT * FROM sort_test ORDER BY text_value",
          {"sort_test": t})
    vals = ["" if v is None else v for v in r["text_value"].to_pylist()]
    assert vals == sorted(vals)


def test_sort_1000(ray_session):
    vals = [(i + 1) if i % 2 == 0 else (1001 - i) for i in range(1000)]
    t = pa.table({"int_field": pa.array(vals, pa.int32())})
    r = Q("SELECT * FROM test ORDER BY int_field", {"test": t})
    assert r["int_field"].to_pylist() == list(range(1, 1001))


@pytest.mark.parametrize("expression,expected", [
    ("1/1", 1),
    ("1/1.", 1.0),
    ("cast((1) as integer)/1.", 1.0),
    ("1./cast((1) as integer)", 1.0),
    ("1.5+1", 2.5),
    ("(1*1)+1.5", 2.5),
    ("1+1", 2),
    ("cast(1 as integer)+ 1234567890123", 1234567890124),
    ("cast(1 as integer)* 1234567890123", 1234567890123),
])
def test_arithmetic(ray_session, poly, expression, expected):
    t = Q(f"select {expression} as result from poly limit 1",
          {"poly": poly})
    assert t["result"][0].as_py() == expected


def test_arith_precedence(ray_session):
    lyr = pa.table({"intfield": pa.array([2], pa.int32())})
    t = Q("select -intfield + 1 + 2 * 3 + 5 - 3 * 2 r from my_layer",
          {"my_layer": lyr})
    assert t["r"][0].as_py() == 4


def test_modulus(ray_session, poly):
    t = Q("select count(*) from poly where eas_id % 5 = 1",
          {"poly": poly})
    # eas_id values with mod-5 == 1: 171, 166 → 2 rows
    assert t["COUNT_*"].to_pylist() == [2]


def test_limit_offset(ray_session, poly):
    L = {"poly": poly}
    assert Q("SELECT * FROM POLY LIMIT 0", L).num_rows == 0
    assert Q("SELECT * FROM POLY LIMIT 1", L).num_rows == 1
    t = Q("SELECT * FROM POLY ORDER BY EAS_ID LIMIT 1", L)
    assert t["eas_id"].to_pylist() == [158]
    assert Q("SELECT * FROM POLY WHERE EAS_ID = 168 LIMIT 11",
             L).num_rows == 1
    assert Q("SELECT * FROM POLY WHERE EAS_ID = 168 OFFSET 1",
             L).num_rows == 0
    assert Q("SELECT * FROM POLY OFFSET 10", L).num_rows == 0
    assert Q("SELECT * FROM POLY OFFSET 8", L).num_rows == 2
    assert Q("SELECT * FROM POLY LIMIT 1 OFFSET 8", L).num_rows == 1
    t = Q("SELECT * FROM POLY ORDER BY EAS_ID DESC LIMIT 2", L)
    assert t["eas_id"].to_pylist() == [179, 173]


# ------------------------------------------------------ special fields

@pytest.fixture(scope="module")
def geo_layer():
    return pa.table({
        "test": pa.array(["0", "1"]),
        "geometry": pa.array([
            polygon_wkb(box_polygon(0, 0, 1, 1)),
            polygon_wkb(box_polygon(0, 0, 0.5, 0.5)),
        ], pa.binary()),
    })


def test_ogr_geom_area(ray_session, geo_layer):
    t = Q("SELECT test, OGR_GEOM_AREA from my_layer WHERE "
          "OGR_GEOM_AREA > 0.9", {"my_layer": geo_layer})
    assert t.num_rows == 1
    assert t["OGR_GEOM_AREA"][0].as_py() == 1.0
    assert t["test"][0].as_py() == "0"


def test_ogr_geometry_field(ray_session, geo_layer):
    t = Q("select ogr_geometry from my_layer where "
          "ogr_geometry = 'POLYGON'", {"my_layer": geo_layer})
    assert t["ogr_geometry"].to_pylist() == ["POLYGON", "POLYGON"]


def test_ogr_geom_wkt_like(ray_session, geo_layer):
    t = Q("select test from my_layer where ogr_geom_wkt "
          "LIKE 'POLYGON%'", {"my_layer": geo_layer})
    assert t.num_rows == 2


def test_max_geom_area(ray_session, geo_layer):
    t = Q("SELECT MAX(OGR_GEOM_AREA) FROM my_layer",
          {"my_layer": geo_layer})
    assert t["MAX_OGR_GEOM_AREA"][0].as_py() == pytest.approx(1.0)


def test_order_by_geom_area(ray_session, geo_layer):
    t = Q("SELECT test FROM my_layer ORDER BY OGR_GEOM_AREA",
          {"my_layer": geo_layer})
    assert t["test"].to_pylist() == ["1", "0"]


def test_order_by_geometry_errors(ray_session, geo_layer):
    with pytest.raises(OGRSQLError):
        Q("SELECT * FROM my_layer ORDER BY geometry",
          {"my_layer": geo_layer})


def test_geometry_passthrough(ray_session, geo_layer):
    t = Q("SELECT test FROM my_layer", {"my_layer": geo_layer})
    assert "geometry" in t.schema.names


def test_select_except_geometry(ray_session, geo_layer):
    t = Q('SELECT * EXCEPT (test, "_ogr_geometry_") FROM my_layer',
          {"my_layer": geo_layer})
    assert t.schema.names == []
    t = Q('SELECT * EXCEPT ("_ogr_geometry_") FROM my_layer',
          {"my_layer": geo_layer})
    assert t.schema.names == ["test"]


# --------------------------------------------------------- wildcards

def test_wildcard_multi_expansion(ray_session):
    lyr = pa.table({"test": pa.array(["x"])})
    t = Q("SELECT *, fid, *, my_layer.* from my_layer",
          {"my_layer": lyr})
    # reference keeps duplicate names; arrow requires unique names so
    # duplicates get _N suffixes, order preserved
    assert t.num_columns == 4
    assert t.schema.names[0] == "test"
    assert t.schema.names[1] == "fid"
    assert t.schema.names[3].startswith("my_layer.test")


def test_select_except(ray_session, poly):
    t = Q("SELECT * EXCEPT (EAS_ID, PRFEDEA) FROM poly", {"poly": poly})
    assert t.schema.names == ["area"]
    t = Q("SELECT * EXCEPT (EAS_ID), * FROM poly", {"poly": poly})
    assert t.num_columns == 5
    assert [n.split("_")[0] for n in t.schema.names][:2] == \
        ["area", "prfedea"]


@pytest.mark.parametrize("body", [
    "(", ")", "()", "(*)", "(EASID, ", "(EASID, DOES_NOT_EXIST)",
    "(EAS_ID, EAS_ID)", "(EAS_ID,, AREA)",
])
def test_select_except_errors(ray_session, poly, body):
    with pytest.raises(OGRSQLError):
        Q(f"SELECT * EXCEPT {body} FROM poly", {"poly": poly})


# --------------------------------------------------------------- joins

@pytest.fixture(scope="module")
def join_ds():
    point = pa.table({
        "id": pa.array([1], pa.int32()),
        "name": pa.array(["test"]),
        "geometry": pa.array([point_wkb(0, 0)], pa.binary()),
    })
    line = pa.table({"id": pa.array([1], pa.int32())})
    return {"point": point, "line": line}


def test_join_star(ray_session, join_ds):
    t = Q("SELECT * FROM point JOIN line ON point.id = line.id",
          join_ds)
    assert t.num_rows == 1
    names = t.schema.names
    assert names[0] == "id" and names[1] == "name"
    assert "line.id" in names


def test_join_except(ray_session, join_ds):
    t = Q("SELECT * EXCEPT (id) FROM point JOIN line "
          "ON point.id = line.id", join_ds)
    fields = [n for n in t.schema.names if n != "geometry"]
    assert fields == ["name", "line.id"]


def test_join_exclude_secondary(ray_session, join_ds):
    t = Q("SELECT * EXCLUDE (line.id) FROM point JOIN line "
          "ON point.id = line.id", join_ds)
    fields = [n for n in t.schema.names if n != "geometry"]
    assert fields == ["id", "name"]


def test_join_first_match_and_left(ray_session):
    point = pa.table({"id": pa.array([1, 2], pa.int32()),
                      "name": ["a", "b"]})
    line = pa.table({"id": pa.array([1, 1], pa.int32()),
                     "kind": ["first", "second"]})
    t = Q("SELECT name, kind FROM point JOIN line ON point.id = line.id"
          " ORDER BY name", {"point": point, "line": line})
    assert t["name"].to_pylist() == ["a", "b"]
    assert t["kind"].to_pylist() == ["first", None]


def test_join_string_numeric_cast(ray_session):
    a = pa.table({"k": ["1", "2"], "va": ["x", "y"]})
    b = pa.table({"k2": pa.array([1, 2], pa.int32()), "vb": ["p", "q"]})
    t = Q("SELECT va, vb FROM a JOIN b ON a.k = b.k2 ORDER BY va",
          {"a": a, "b": b})
    assert t["vb"].to_pylist() == ["p", "q"]


# --------------------------------------------------------- edge cases

def test_min_max_string(ray_session):
    empty = pa.table({"str_field": pa.array([], pa.string())})
    t = Q("select min(str_field), max(str_field) from test",
          {"test": empty})
    assert t["MIN_str_field"].to_pylist() == [None]
    assert t["MAX_str_field"].to_pylist() == [None]
    full = pa.table({"str_field": ["z", "b", "ab"]})
    t = Q("select min(str_field), max(str_field) from test",
          {"test": full})
    assert t["MIN_str_field"][0].as_py() == "ab"
    assert t["MAX_str_field"][0].as_py() == "z"


@pytest.mark.parametrize("inp,expected", [
    ((1, 1e100, 1, -1e100), 2),
    ((float("inf"), 1), float("inf")),
    ((1, float("-inf")), float("-inf")),
    ((1, float("nan")), float("nan")),
    ((float("inf"), float("-inf")), float("nan")),
])
def test_kbn_sum(ray_session, inp, expected):
    t = pa.table({"v": pa.array(list(inp), pa.float64())})
    r = Q("SELECT SUM(v) FROM test", {"test": t})
    got = r["SUM_v"][0].as_py()
    if math.isnan(expected):
        assert math.isnan(got)
    else:
        assert got == expected


def test_expr_depth(ray_session, poly):
    for op in ("+", "*", "<", "="):
        Q("SELECT " + op.join(["1"] * 127) + " c FROM poly LIMIT 1",
          {"poly": poly})
        with pytest.raises(OGRSQLError,
                           match="Maximum expression depth reached"):
            parse_select("SELECT " + op.join(["1"] * 128) + " FROM t")
    parse_select("SELECT CAST(" + "+".join(["1"] * 126) +
                 " AS CHARACTER) FROM t")
    with pytest.raises(OGRSQLError):
        parse_select("SELECT CAST(" + "+".join(["1"] * 127) +
                     " AS CHARACTER) FROM t")
    with pytest.raises(OGRSQLError):
        parse_select("SELECT " + "+".join(["1"] * 126) +
                     " IS NOT NULL FROM t")


def test_like_utf8(ray_session):
    t = pa.table({"x": pa.array([1], pa.int32())})

    def n(where):
        return Q(f"select * from test where {where}", {"test": t}).num_rows
    assert n("'é' LIKE 'É'") == 0
    assert n("'É' LIKE 'É'") == 1
    assert n("'é' LIKE '_'") == 1
    assert n("'éven' LIKE '_ven'") == 1
    assert n("'éven' LIKE '%ven'") == 1
    assert n("'' LIKE '_'") == 0
    assert n("'éven' LIKE '_xen'") == 0
    assert n("'é' ILIKE 'É'") == 1
    assert n("'É' ILIKE 'é'") == 1
    assert n("'é' ILIKE 'ê'") == 0
    assert n("'éven' ILIKE '_ven'") == 1


def test_union_all(ray_session, poly):
    t = Q("SELECT eas_id FROM poly WHERE eas_id = 158 UNION ALL "
          "SELECT eas_id FROM poly WHERE eas_id > 175", {"poly": poly})
    assert sorted(t["eas_id"].to_pylist()) == [158, 179]


def test_identifier_named_like_keywordish(ray_session):
    lyr = pa.table({"hidden": ["val"]})
    t = Q("SELECT hidden FROM hidden", {"hidden": lyr})
    assert t["hidden"].to_pylist() == ["val"]
    t = Q("SELECT hidden hidden FROM hidden hidden", {"hidden": lyr})
    assert t["hidden"].to_pylist() == ["val"]
    t = Q("SELECT 'foo' AS hidden FROM hidden", {"hidden": lyr})
    assert t["hidden"].to_pylist() == ["foo"]


def test_ogr_style_hidden(ray_session):
    lyr = pa.table({"intfield": pa.array([1, None], pa.int32()),
                    "strfield": ["my_style", None]})
    t = Q("SELECT 'BRUSH(fc:#01234567)' AS OGR_STYLE HIDDEN FROM layer",
          {"layer": lyr})
    assert t.num_columns == 0 or t.num_rows == 2
    t = Q("SELECT strfield OGR_STYLE HIDDEN, * FROM layer",
          {"layer": lyr})
    assert t.num_columns == 2
    with pytest.raises(OGRSQLError,
                       match="HIDDEN keyword only supported"):
        Q("SELECT 'foo' AS not_OGR_STYLE HIDDEN FROM layer",
          {"layer": lyr})


def test_same_case_fields(ray_session):
    lyr = pa.table({"id": ["foo"], "ID": ["bar"], "ID2": ["baz"]})
    t = Q("SELECT * FROM test", {"test": lyr})
    assert t.num_columns == 3
    assert t.column(0).to_pylist() == ["foo"]
    assert t.column(1).to_pylist() == ["bar"]
    assert t.column(2).to_pylist() == ["baz"]


def test_datetime_where_order(ray_session):
    ts = ["2010/04/12 10:13:00", "2009/12/31 23:00:00",
          "2010/01/01 00:00:00", "2009/12/15 12:00:00",
          "2010/03/31 23:59:59"]
    names = ["foo1", "foo2", "foo3", "foo4", "foo5"]
    t = pa.table({
        "name": pa.array(names),
        "timestamp": pa.array(
            [np.datetime64(s.replace("/", "-").replace(" ", "T"), "us")
             for s in ts], pa.timestamp("us")),
    })
    r = Q("SELECT * FROM testdatetime WHERE "
          "timestamp < '2010/04/01 00:00:00' AND "
          "timestamp > '2009/11/15 11:59:59' AND "
          "timestamp != '2009/12/31 23:00:00' "
          "ORDER BY timestamp DESC", {"testdatetime": t})
    assert r["name"].to_pylist() == ["foo5", "foo3", "foo4"]


def test_cast_types(ray_session):
    lyr = pa.table({"fid0": pa.array([1, 2], pa.int32()),
                    "data": pa.array([2.5, 3.25])})
    t = Q("select CAST(fid0 as CHARACTER(10)) c, "
          "CAST(data as numeric(7,3)) n from small", {"small": lyr})
    assert t["c"].to_pylist() == ["1", "2"]
    assert t["c"].type == pa.string()
    assert t["n"].type == pa.float64()
    t = Q("select CAST('12ab' AS INTEGER) i, CAST('abc' AS INTEGER) z, "
          "CAST(3.9 AS INTEGER) tr, CAST(2.5 AS CHARACTER) s "
          "from small LIMIT 1", {"small": lyr})
    assert t["i"][0].as_py() == 12
    assert t["z"][0].as_py() == 0
    assert t["tr"][0].as_py() == 3
    assert t["s"][0].as_py() == "2.5"


def test_div_by_zero_int_max(ray_session):
    lyr = pa.table({"a": pa.array([10], pa.int32()),
                    "b": pa.array([0], pa.int32())})
    t = Q("select a / b d, a % b m, a / 0.0 f from t", {"t": lyr})
    assert t["d"][0].as_py() == 2147483647
    assert t["m"][0].as_py() == 2147483647
    assert t["f"][0].as_py() == 2147483647.0


def test_substr_variants(ray_session):
    lyr = pa.table({"s": ["abcdef"]})
    t = Q("select SUBSTR(s, 2, 3) a, SUBSTR(s, -2) b, SUBSTR(s, 0) c, "
          "SUBSTR(s, 10) d, SUBSTR(s, 2, -1) e from t", {"t": lyr})
    assert t["a"][0].as_py() == "bcd"
    assert t["b"][0].as_py() == "ef"
    assert t["c"][0].as_py() == "abcdef"
    assert t["d"][0].as_py() == ""
    assert t["e"][0].as_py() == ""
    with pytest.raises(OGRSQLError):
        Q("SELECT SUBSTR(s) from t", {"t": lyr})
    with pytest.raises(OGRSQLError):
        Q("SELECT SUBSTR(1,2) from t", {"t": lyr})


def test_count_zero_rows(ray_session, poly):
    t = Q("SELECT COUNT(*) from poly where 0 = 1", {"poly": poly})
    assert t["COUNT_*"].to_pylist() == [0]


def test_table_alias_star(ray_session):
    lyr = pa.table({"a": [1], "b": [2]})
    t = Q("select l.* from my_layer l", {"my_layer": lyr})
    assert t.schema.names == ["l.a", "l.b"]


def test_literal_column_naming(ray_session, poly):
    t = Q("SELECT 'x', 1+1 FROM poly LIMIT 1", {"poly": poly})
    assert t.schema.names == ["FIELD_1", "FIELD_2"]


INVALID_STATEMENTS = [
    "", "1", "*", "SELECT",
    "SELECT + FROM my_layer",
    "SELECT (1 FROM my_layer",
    "SELECT (1)) FROM my_layer",
    "SELECT (1,) FROM my_layer",
    "SELECT 1 + FROM my_layer",
    "SELECT 1 + 'a' FROM my_layer",
    "SELECT 1 - FROM my_layer",
    "SELECT 1 * FROM my_layer",
    "SELECT 1 % FROM my_layer",
    "SELECT x.",
    "SELECT x AS",
    "SELECT *",
    "SELECT * FROM",
    "SELECT * FROM foo",
    "SELECT FROM my_layer",
    "SELECT 'strfield' 'strfield'",
    "SELECT CONCAT('strfield')",
    "SELECT foo(strfield) FROM my_layer",
    "SELECT strfield, FROM my_layer",
    "SELECT strfield, foo FROM my_layer",
    "SELECT strfield AS FROM my_layer",
    "SELECT strfield AS 1 FROM my_layer",
    "SELECT strfield AS strfield2 FROM",
    "SELECT strfield + intfield FROM my_layer",
    "SELECT CAST", "SELECT CAST(", "SELECT CAST(strfield",
    "SELECT CAST(strfield AS", "SELECT CAST(strfield AS foo",
    "SELECT CAST(strfield AS foo)",
    "SELECT CAST(strfield AS foo) FROM my_layer",
    "SELECT CAST(strfield AS CHARACTER",
    "SELECT CAST(strfield AS CHARACTER(2",
    "SELECT CAST(strfield AS CHARACTER(2)",
    "SELECT CAST(strfield AS CHARACTER(2)) FROM",
    "SELECT CAST(strfield AS CHARACTER(2)) FROM foo",
    "SELECT CAST(strfield AS 1) FROM my_layer",
    "SELECT * FROM my_layer WHERE",
    "SELECT * FROM my_layer WHERE strfield = ",
    "SELECT * FROM my_layer WHERE strfield = foo",
    "SELECT * FROM my_layer WHERE foo = 'a'",
    "SELECT * FROM my_layer WHERE strfield = 'a' ORDER ",
    "SELECT * FROM my_layer WHERE strfield = 'a' ORDER BY",
    "SELECT * FROM my_layer WHERE strfield = 'a' ORDER BY foo",
    "SELECT * FROM my_layer WHERE strfield = 'a' ORDER BY strfield UNK",
    "SELECT FOO(*) FROM my_layer",
    "SELECT FOO(*) AS bar FROM my_layer",
    "SELECT COUNT", "SELECT COUNT(",
    "SELECT COUNT() FROM my_layer",
    "SELECT COUNT(*", "SELECT COUNT(*)", "SELECT COUNT(*) FROM",
    "SELECT COUNT(* FROM my_layer",
    "SELECT COUNT(i_dont_exist) FROM my_layer",
    "SELECT COUNT(DISTINCT intfield FROM my_layer",
    "SELECT COUNT(DISTINCT i_dont_exist) FROM my_layer",
    "SELECT COUNT(DISTINCT *) FROM my_layer",
    "SELECT FOO(DISTINCT intfield) FROM my_layer",
    "SELECT DISTINCT foo FROM my_layer",
    "SELECT DISTINCT FROM my_layer",
    "SELECT DISTINCT strfield, COUNT(DISTINCT intfield) FROM my_layer",
    "SELECT MIN(intfield*2) FROM my_layer",
    "SELECT MIN(intfield,2) FROM my_layer",
    "SELECT MIN(foo) FROM my_layer",
    "SELECT SUM(strfield) FROM my_layer",
    "SELECT AVG(strfield) FROM my_layer",
    "SELECT AVG(intfield, intfield) FROM my_layer",
    "SELECT * FROM my_layer WHERE AVG(intfield) = 1",
    "SELECT * FROM 'foo' foo",
    "SELECT * FROM my_layer WHERE strfield = intfield",
    "SELECT * FROM my_layer WHERE strfield = 1",
    "SELECT * FROM my_layer WHERE strfield = '1' AND",
    "SELECT * FROM my_layer WHERE strfield LIKE",
    "SELECT * FROM my_layer WHERE strfield LIKE 1",
    "SELECT * FROM my_layer WHERE strfield IS",
    "SELECT * FROM my_layer WHERE strfield IS NOT",
    "SELECT * FROM my_layer WHERE strfield IS foo",
    "SELECT * FROM my_layer WHERE strfield IS NOT foo",
    "SELECT * FROM my_layer WHERE (strfield IS NOT NULL",
    "SELECT * FROM my_layer WHERE strfield IN",
    "SELECT * FROM my_layer WHERE strfield IN(",
    "SELECT * FROM my_layer WHERE strfield IN()",
    "SELECT * FROM my_layer WHERE strfield IN('a'",
    "SELECT * FROM my_layer WHERE strfield IN('a',",
    "SELECT * FROM my_layer WHERE strfield IN('a','b'",
    "SELECT * FROM my_layer WHERE strfield IN('a','b'))",
    "SELECT * FROM my_layer LEFT",
    "SELECT * FROM my_layer LEFT JOIN",
    "SELECT * FROM my_layer LEFT JOIN foo",
    "SELECT * FROM my_layer LEFT JOIN foo ON my_layer.strfield = "
    "my_layer2.strfield",
    "SELECT * FROM my_layer LEFT JOIN my_layer2 ON my_layer.strfield "
    "= foo.strfield",
    "SELECT * FROM my_layer LEFT JOIN my_layer2 ON my_layer.strfield "
    "= my_layer2.foo",
    "SELECT * FROM my_layer UNION",
    "SELECT * FROM my_layer UNION ALL",
    "SELECT * FROM my_layer UNION ALL SELECT",
    "SELECT * FROM my_layer UNION ALL SELECT *",
    "SELECT * FROM my_layer UNION ALL SELECT * FROM",
]


@pytest.mark.parametrize("sql", INVALID_STATEMENTS)
def test_invalid_statements(ray_session, sql):
    my_layer = pa.table({
        "strfield": pa.array(["a"]),
        "intfield": pa.array([1], pa.int32()),
        "geom": pa.array([point_wkb(0, 0)], pa.binary()),
    })
    my_layer2 = pa.table({"strfield": ["a"], "strfield2": ["b"]})
    with pytest.raises((OGRSQLError, KeyError, ValueError)):
        execute_sql_table(sql, {"my_layer": my_layer,
                                "my_layer2": my_layer2})


def test_order_by_geom_named_field_error(ray_session):
    my_layer = pa.table({
        "strfield": pa.array(["a"]),
        "geom": pa.array([point_wkb(0, 0)], pa.binary()),
    })
    with pytest.raises(OGRSQLError):
        execute_sql_table("SELECT * FROM my_layer ORDER BY geom",
                          {"my_layer": my_layer})
