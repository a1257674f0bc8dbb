"""The driver-facing query registry: Ray pipelines + DuckDB oracle SQL.

Each entry implements one operator family from SURVEY.md §2 as an
idiomatic Ray Data pipeline over the testdata tables, paired (where
SQL-expressible) with an ANSI-SQL oracle the driver runs on DuckDB.

Exact-match discipline (driver hashes values):

* every integer output is int64, every float float64, timestamps us;
* aggregate floats are rounded to a fixed scale on BOTH sides (partial
  sums reorder float addition; rounding absorbs the ulp drift);
* derived spatial data (points / rectangles) comes from *integer* LCG
  arithmetic on table keys — exact in both engines — and only then
  becomes float through identical expressions;
* rank orderings use squared distance / float64 scores whose cross-engine
  error (≤1e-15 rel) is far below observed score gaps.

Queries with no SQL equivalent (WKB polygon PIP, warp checksums, MinHash,
SimHash, LangId, phash dedup, LSH ANN) are registered without an oracle —
the driver records rows-only checks and pytest carries their golden
tests.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["QUERIES", "query_fns", "oracle_sqls"]

_E = 20037508.342789244


def _read(sf_dir, table, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


def round_half_away(x, nd):
    """DuckDB-parity ROUND: half away from zero at ``nd`` decimals."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** nd
    return np.where(x >= 0, np.floor(x * p + 0.5), np.ceil(x * p - 0.5)) / p


def _round_cols(tbl: pa.Table, spec) -> pa.Table:
    """Round float columns to fixed decimals with SQL ROUND semantics
    (ulp absorber for reordered float sums + rounding-rule parity)."""
    for col, nd in spec.items():
        idx = tbl.schema.get_field_index(col)
        vals = round_half_away(np.asarray(tbl[col], dtype=np.float64), nd)
        tbl = tbl.set_column(idx, col, pa.array(vals, pa.float64()))
    return tbl


def _cast_i64(tbl: pa.Table, cols) -> pa.Table:
    for col in cols:
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(idx, col,
                             tbl[col].cast(pa.int64()))
    return tbl


# ---------------------------------------------------------------------------
# relational core (SURVEY §2.2 filters/projections, §2.5 aggregates,
# §2.6 sort/limit, §2.7 set ops, §2.8 scalar fns)


def q01_pricing_summary(sf_dir):
    """Grouped aggregates (SUM/AVG/COUNT over lineitem, TPC-H Q1 shape)."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        # map-side combiner: each block reduces to ≤|groups| partial
        # rows, so the all-to-all moves a handful of rows per block
        # instead of the filtered table
        t = t.filter(pc.less_equal(
            t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc).select(
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "disc_price"])
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])
        # select by the GENERATED aggregate names (not position — the
        # key/aggregate column order is a pyarrow implementation detail)
        g = g.select(["l_returnflag", "l_linestatus", "l_quantity_sum",
                      "l_extendedprice_sum", "disc_price_sum",
                      "l_quantity_count"])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "count_order"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                        Sum("sum_base_price", alias_name="sum_base_price"),
                        Sum("sum_disc_price", alias_name="sum_disc_price"),
                        Sum("count_order", alias_name="count_order")))
    pdf = out.to_pandas()
    pdf["avg_qty"] = pdf["sum_qty"] / pdf["count_order"]
    pdf = pdf[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "avg_qty", "count_order"]]
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    tbl = _round_cols(tbl, {"sum_base_price": 2, "sum_disc_price": 2,
                            "avg_qty": 6})
    tbl = _cast_i64(tbl, ["sum_qty", "count_order"])
    return tbl


SQL_Q01 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q02_filter_project(sf_dir):
    """Row-level filter + computed projection (vectorized, zero-copy)."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"],
                             pa.scalar(np.datetime64("1997-01-01", "us"))),
            pc.greater_equal(t["l_discount"], pa.scalar(0.05)))
        t = t.filter(m)
        rev = round_half_away(
            np.asarray(t["l_extendedprice"], dtype=np.float64)
            * (1.0 - np.asarray(t["l_discount"], dtype=np.float64)), 2)
        return pa.Table.from_pydict({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "l_linenumber": t["l_linenumber"].cast(pa.int64()),
            "revenue": pa.array(rev, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_Q02 = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount >= 0.05
"""


def q03_join_agg(sf_dir):
    """Equi-join via broadcast small side (customer⋈nation⋈region)."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    lut = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")
    nk_to_region = dict(zip(lut["n_nationkey"], lut["r_name"]))
    ref = ray.put(nk_to_region)

    def add_region(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        nk = np.asarray(t["c_nationkey"])
        rn = np.array([m[k] for k in nk], dtype=object)
        return t.append_column("r_name", pa.array(rn, pa.string()))

    out = (_read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
           .map_batches(add_region, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("c_acctbal", alias_name="sum_acctbal")))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    tbl = _round_cols(tbl, {"sum_acctbal": 2})
    return _cast_i64(tbl, ["n_customers"])


SQL_Q03 = """
SELECT r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q04_top_orders(sf_dir):
    """Global sort + limit (ORDER BY … DESC LIMIT k)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                  "o_orderpriority"])
    out = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(10)
    return _cast_i64(pa.Table.from_pandas(out.to_pandas(),
                                          preserve_index=False),
                     ["o_orderkey"])


SQL_Q04 = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q05_distinct(sf_dir):
    """SELECT DISTINCT (ds.unique)."""
    vals = sorted(_read(sf_dir, "customer",
                        ["c_mktsegment"]).unique("c_mktsegment"))
    return pa.Table.from_pydict({"c_mktsegment": pa.array(vals, pa.string())})


SQL_Q05 = "SELECT DISTINCT c_mktsegment FROM customer"


def q06_union(sf_dir):
    """UNION ALL of two sources (ds.union)."""
    r = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow")
    n = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow")
    return r.union(n)


SQL_Q06 = ("SELECT r_name AS name FROM region "
           "UNION ALL SELECT n_name AS name FROM nation")


def q07_string_date(sf_dir):
    """Scalar date/string functions + grouped aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority",
                                  "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"]).cast(pa.int64())
        return pa.Table.from_pydict({
            "yr": yr, "o_orderpriority": t["o_orderpriority"],
            "o_totalprice": t["o_totalprice"]})

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby(["yr", "o_orderpriority"])
             .aggregate(Count(alias_name="n"),
                        Sum("o_totalprice", alias_name="total")))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _cast_i64(_round_cols(tbl, {"total": 2}), ["n", "yr"])


SQL_Q07 = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY yr, o_orderpriority
"""


def q08_events_hourly(sf_dir, num_shards=64):
    """Tumbling event-time window: hourly per-user counts/sums.

    Group count ≈ row count here (~1.05 rows/group), so a map-side
    combiner is useless and Ray's sort-based ``groupby`` pays a full
    95k-group sort.  Instead: hash-shard on ``user_id`` (every
    (user, hour) group lands wholly in one shard), shuffle the ~64
    shards, and aggregate vectorized inside each shard — the shard-key
    pattern the minhash dedup uses (2× wall-time here).  At scale,
    ``num_shards`` grows with the table so one shard stays within a
    worker's heap; the shuffle volume is identical to the plain
    groupby's."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        hr = pc.floor_temporal(t["ts"], unit="hour")
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        # NULL user_id hashes to shard 0 (the SQL GROUP BY keeps a NULL
        # group; pandas aggregation below uses dropna=False to match)
        uid = np.where(np.isnan(uid.astype(np.float64)), 0, uid) \
            if uid.dtype.kind == "f" else uid
        shard = pa.array((uid % num_shards).astype(np.int32))
        return pa.Table.from_pydict({
            "shard": shard, "user_id": t["user_id"], "hour_ts": hr,
            "value": t["value"]})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "hour_ts"], sort=False, dropna=False)
               .agg(n_events=("value", "size"), sum_value=("value", "sum"))
               .reset_index())
        return g

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("shard")
             .map_groups(agg, batch_format="pandas"))
    pdf = out.to_pandas()
    pdf["hour_ts"] = pdf["hour_ts"].astype("datetime64[us]")
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    return _cast_i64(_round_cols(tbl, {"sum_value": 2}),
                     ["user_id", "n_events"])


SQL_Q08 = """
SELECT user_id, date_trunc('hour', ts) AS hour_ts,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY user_id, hour_ts
"""


def q09_stddev(sf_dir):
    """STDDEV_SAMP / STDDEV_POP via Ray's mergeable Std aggregate."""
    from ray.data.aggregate import Std

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = ds.groupby("l_returnflag").aggregate(
        Std("l_quantity", ddof=1, alias_name="std_qty"),
        Std("l_quantity", ddof=0, alias_name="std_qty_pop"))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _round_cols(tbl, {"std_qty": 6, "std_qty_pop": 6})


SQL_Q09 = """
SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
       ROUND(STDDEV_POP(l_quantity), 6) AS std_qty_pop
FROM lineitem GROUP BY l_returnflag
"""


def q10_left_join(sf_dir):
    """LEFT JOIN via broadcast dict (nulls preserved on misses)."""
    import ray

    rich = (_read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
            .map_batches(lambda t: t.filter(
                pc.greater(t["c_acctbal"], pa.scalar(9000.0))),
                batch_format="pyarrow").to_pandas())
    lut = dict(zip(rich["c_custkey"], rich["c_name"]))
    ref = ray.put(lut)

    def join(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ck = np.asarray(t["o_custkey"])
        names = [m.get(k) for k in ck]
        return pa.Table.from_pydict({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "c_name": pa.array(names, pa.string())})

    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        join, batch_format="pyarrow")


SQL_Q10 = """
SELECT o_orderkey, c_name
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
  ON o_custkey = c_custkey
"""


def q18_like_filter(sf_dir):
    """LIKE predicate + grouped count."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "part", ["p_brand", "p_type"])
    out = (ds.map_batches(lambda t: t.filter(
        pc.match_like(t["p_type"], "%ECONOMY%")), batch_format="pyarrow")
        .groupby("p_brand").aggregate(Count(alias_name="n")))
    return _cast_i64(pa.Table.from_pandas(out.to_pandas(),
                                          preserve_index=False), ["n"])


SQL_Q18 = ("SELECT p_brand, COUNT(*) AS n FROM part "
           "WHERE p_type LIKE '%ECONOMY%' GROUP BY p_brand")


def q19_between_in(sf_dir):
    """BETWEEN + IN predicates, grouped aggregate (52 groups at sf0.01 —
    a value-rich oracle, not a single global row)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_returnflag",
                                    "l_extendedprice"])

    def fn(t: pa.Table) -> pa.Table:
        m = (pc.and_(pc.and_(
            pc.greater_equal(t["l_quantity"], pa.scalar(5.0)),
            pc.less_equal(t["l_quantity"], pa.scalar(30.0))),
            pc.is_in(t["l_returnflag"],
                     value_set=pa.array(["A", "R"]))))
        t = t.filter(m)
        q = pc.cast(pc.floor(t["l_quantity"]), pa.int64())
        return pa.Table.from_pydict({
            "l_returnflag": t["l_returnflag"], "q": q,
            "l_extendedprice": t["l_extendedprice"]})

    out = (ds.map_batches(fn, batch_format="pyarrow")
           .groupby(["l_returnflag", "q"])
           .aggregate(Count(alias_name="n"),
                      Sum("l_extendedprice", alias_name="total")))
    pdf = out.to_pandas()
    pdf["total"] = round_half_away(pdf["total"], 2)
    return _cast_i64(pa.Table.from_pandas(pdf, preserve_index=False),
                     ["n", "q"])


SQL_Q19 = """
SELECT l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT) AS q,
       COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 30 AND l_returnflag IN ('A', 'R')
GROUP BY l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT)
"""


def q21_minmax(sf_dir):
    """MIN/MAX grouped aggregates."""
    from ray.data.aggregate import Count, Max, Min

    out = (_read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
           .groupby("o_orderpriority")
           .aggregate(Min("o_totalprice", alias_name="min_price"),
                      Max("o_totalprice", alias_name="max_price"),
                      Count(alias_name="n")))
    return _cast_i64(pa.Table.from_pandas(out.to_pandas(),
                                          preserve_index=False), ["n"])


SQL_Q21 = """
SELECT o_orderpriority, MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price, COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def q22_anti_join(sf_dir):
    """Anti-join via broadcast key set: customers with no order above
    400k (202 rows at sf0.01 — non-vacuous).  The build side is the
    FILTERED distinct key set (bounded by the selectivity of the
    predicate); the unfiltered large×large path is q63's shuffle join."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.filter(expr="o_totalprice > 400000.0")
    have = np.asarray(big.unique("o_custkey"), dtype=np.int64)
    ref = ray.put(have)

    def fn(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ck = np.asarray(t["c_custkey"], dtype=np.int64)
        keep = ~np.isin(ck, keys)
        return pa.Table.from_pydict({
            "c_custkey": pa.array(ck[keep], pa.int64())})

    return _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        fn, batch_format="pyarrow")


SQL_Q22 = ("SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
           "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)")


def q17_left_outer_join(sf_dir):
    """LEFT OUTER shuffle join on the distributed ``Dataset.join`` path
    (swq_select.cpp:260 LEFT JOIN semantics, large×large): every
    customer row survives; unmatched orders side coalesced to -1 for
    hash-compare stability."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, cpus // 2))
    j = cust.join(orders, "left_outer", nparts,
                  on=("c_custkey",), right_on=("o_custkey",),
                  aggregator_ray_remote_args={"num_cpus": 0.25})

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_acctbal": pc.cast(t["c_acctbal"], pa.float64()),
            "o_orderkey": pc.fill_null(
                pc.cast(t["o_orderkey"], pa.int64()), -1),
            "o_totalprice": pc.fill_null(
                pc.cast(t["o_totalprice"], pa.float64()), -1.0)})

    return j.map_batches(project, batch_format="pyarrow")


SQL_Q17 = """
SELECT c_custkey, c_acctbal, COALESCE(o_orderkey, -1) AS o_orderkey,
       COALESCE(o_totalprice, -1.0) AS o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


# ---------------------------------------------------------------------------
# spatial: derived points/rects from integer key arithmetic (exact in SQL)

_PT = ("-20 + (({k} * 48271) % 60000) / 1000.0",
       "-10 + (({k} * 16807) % 60000) / 1000.0")


def _derive_points(t: pa.Table, key_col) -> pa.Table:
    k = np.asarray(t[key_col], dtype=np.int64)
    x = -20 + ((k * 48271) % 60000) / 1000.0
    y = -10 + ((k * 16807) % 60000) / 1000.0
    return pa.Table.from_pydict({
        key_col: pa.array(k, pa.int64()),
        "x": pa.array(x, pa.float64()), "y": pa.array(y, pa.float64())})


def _tile_assign_impl(sf_dir, z=8):
    """Reference-parity tile assignment of derived supplier points at z=8.

    Tile formula: ``clamp(floor((merc - origin)/span), 0, n-1)`` — the
    point case of ``GetTileIndices`` (apps/gdalalg_raster_tile.cpp:274).
    """
    from .geo import cells
    from .geo.crs import lonlat_to_mercator

    ds = _read(sf_dir, "supplier", ["s_suppkey"])

    def fn(t: pa.Table) -> pa.Table:
        t = _derive_points(t, "s_suppkey")
        mx, my = lonlat_to_mercator(np.asarray(t["x"]), np.asarray(t["y"]))
        tm = cells.web_mercator_quad(z)
        tx = np.clip(np.floor((mx - tm.top_left_x) / tm.tile_span_x),
                     0, tm.matrix_w - 1).astype(np.int64)
        ty = np.clip(np.floor((tm.top_left_y - my) / tm.tile_span_y),
                     0, tm.matrix_h - 1).astype(np.int64)
        return pa.Table.from_pydict({
            "s_suppkey": t["s_suppkey"],
            "tile_x": pa.array(tx, pa.int64()),
            "tile_y": pa.array(ty, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


_SPAN8 = f"((2*{_E}/(256*256))*256)"
SQL_Q11 = f"""
WITH pts AS (
  SELECT s_suppkey,
         {_PT[0].format(k='s_suppkey')} AS x,
         {_PT[1].format(k='s_suppkey')} AS y
  FROM supplier)
SELECT s_suppkey,
  CAST(LEAST(GREATEST(floor((radians(x)*6378137.0 - (-{_E})) / {_SPAN8}), 0), 255) AS BIGINT) AS tile_x,
  CAST(LEAST(GREATEST(floor(({_E} - 6378137.0*ln(tan(pi()/4 + radians(y)/2))) / {_SPAN8}), 0), 255) AS BIGINT) AS tile_y
FROM pts
"""


def q12_point_in_rect(sf_dir):
    """Spatial join: derived customer points × 12 derived rectangles.

    Engine path: WKB box polygons → broadcast ZoneIndex → PIP actor
    (crossing-number + boundary, closed-rectangle ≡ SQL BETWEEN).
    """
    import ray

    from .geo import wkb as W
    from .ops.join import PIPJoinZones, ZoneIndex

    rects = _derived_rects()
    zt = pa.Table.from_pydict({
        "zone_id": pa.array(rects["rect_id"], pa.int64()),
        "wkb": pa.array([W.polygon_wkb(W.box_polygon(x0, y0, x1, y1))
                         for x0, y0, x1, y1 in rects["bounds"]],
                        pa.binary())})
    zi_ref = ray.put(ZoneIndex(zt, index_z=5))
    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: _derive_points(t, "c_custkey"), batch_format="pyarrow")
    joined = pts.map_batches(
        PIPJoinZones, fn_constructor_kwargs={
            "zones_ref": zi_ref, "id_col": "c_custkey",
            "emit": "intersects"},
        batch_format="pyarrow", concurrency=2)

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "rect_id": t["zone_id"].cast(pa.int64())})

    return joined.map_batches(project, batch_format="pyarrow")


def _derived_rects():
    j = np.arange(12)
    x0 = -20.0 + (j * 7919) % 50
    y0 = -10.0 + (j * 104729) % 50
    w = 3.0 + j % 5
    h = 2.0 + j % 7
    return {"rect_id": j.astype(np.int64),
            "bounds": list(zip(x0, y0, x0 + w, y0 + h))}


SQL_Q12 = f"""
WITH pts AS (
  SELECT c_custkey,
         {_PT[0].format(k='c_custkey')} AS x,
         {_PT[1].format(k='c_custkey')} AS y
  FROM customer),
rects AS (
  SELECT j AS rect_id,
         -20 + (j * 7919) % 50 AS x0,
         -10 + (j * 104729) % 50 AS y0,
         3 + j % 5 AS w, 2 + j % 7 AS h
  FROM range(12) t(j))
SELECT c_custkey, rect_id
FROM pts, rects
WHERE x BETWEEN x0 AND x0 + w AND y BETWEEN y0 AND y0 + h
"""


def q13_knn(sf_dir):
    """kNN by cell-ring expansion: customer probes → 3 nearest suppliers."""
    import ray

    from .ops.join import KnnJoin, build_cell_points

    sup = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda t: _derive_points(t, "s_suppkey"),
        batch_format="pyarrow").to_pandas()
    index = build_cell_points(sup["s_suppkey"].values.astype(np.int64),
                              sup["x"].values, sup["y"].values,
                              z=4, window=(-20.0, -10.0, 40.0, 50.0))
    idx_ref = ray.put(index)
    probes = (_read(sf_dir, "customer", ["c_custkey"])
              .map_batches(lambda t: t.filter(
                  pc.less_equal(t["c_custkey"], pa.scalar(300))),
                  batch_format="pyarrow")
              .map_batches(lambda t: _derive_points(t, "c_custkey"),
                           batch_format="pyarrow"))
    knn = probes.map_batches(
        KnnJoin, fn_constructor_kwargs={
            "index_ref": idx_ref, "k": 3, "id_col": "c_custkey"},
        batch_format="pyarrow", concurrency=2)

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "c_custkey": t["probe_id"].cast(pa.int64()),
            "rank": t["rank"].cast(pa.int64()),
            "s_suppkey": t["neighbor_id"].cast(pa.int64())})

    return knn.map_batches(project, batch_format="pyarrow")


SQL_Q13 = f"""
WITH p AS (
  SELECT c_custkey,
         {_PT[0].format(k='c_custkey')} AS x,
         {_PT[1].format(k='c_custkey')} AS y
  FROM customer WHERE c_custkey <= 300),
r AS (
  SELECT s_suppkey,
         {_PT[0].format(k='s_suppkey')} AS x,
         {_PT[1].format(k='s_suppkey')} AS y
  FROM supplier)
SELECT c_custkey, rank, s_suppkey FROM (
  SELECT p.c_custkey, r.s_suppkey,
         row_number() OVER (
           PARTITION BY p.c_custkey
           ORDER BY (p.x-r.x)*(p.x-r.x) + (p.y-r.y)*(p.y-r.y), r.s_suppkey
         ) AS rank
  FROM p CROSS JOIN r) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# dedup + text + ANN over documents/embeddings


def q14_exact_dedup(sf_dir):
    """Exact dedup: content-hash partition, min doc_id survives."""
    from ray.data.aggregate import Min

    from .ops.dedup import content_hash_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        content_hash_batch, batch_format="pyarrow")
    out = ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="doc_id"))

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"doc_id": t["doc_id"].cast(pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


SQL_Q14 = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def q15_text_stats(sf_dir):
    """Quality scoring + token counting (rational-arithmetic parity)."""
    from .ops.text import quality_score_batch, token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        t = token_count_batch(t)
        t = quality_score_batch(t)
        return pa.Table.from_pydict({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_tokens": t["n_tokens"].cast(pa.int64()),
            "punct_ratio": t["punct_ratio"],
            "digit_ratio": t["digit_ratio"],
            "upper_ratio": t["upper_ratio"],
            "quality": t["quality"]})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_Q15 = r"""
WITH t AS (
  SELECT doc_id, CAST(length(text) AS DOUBLE) AS n,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS BIGINT) AS n_tokens,
    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
         AS DOUBLE) AS punct,
    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         AS DOUBLE) AS dig,
    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
         AS DOUBLE) AS up
  FROM documents)
SELECT doc_id, n_tokens,
       punct / GREATEST(n, 1.0) AS punct_ratio,
       dig / GREATEST(n, 1.0) AS digit_ratio,
       up / GREATEST(n, 1.0) AS upper_ratio,
       (n / (n + 500.0)) * (1.0 - punct / GREATEST(n, 1.0)) AS quality
FROM t
"""


def q16_ann_topk(sf_dir):
    """Brute-force cosine top-10 per query (queries = vec_id 0..4).

    Scores computed in float64 (error ≪ score gaps ⇒ ranks match the
    double-precision SQL oracle); score itself is not emitted.
    """
    import pyarrow.parquet as pq

    from .ops.ann import topk_vectors_per_query

    qtbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qsel = qtbl.filter(pc.less_equal(qtbl["vec_id"], 4)).sort_by("vec_id")
    queries = np.stack([np.asarray(v, dtype=np.float64)
                        for v in qsel["embedding"].to_pylist()])
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = topk_vectors_per_query(ds, queries, k=10, dtype=np.float64)

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "query_vec_id": t["query_idx"].cast(pa.int64()),
            "vec_id": t["vec_id"].cast(pa.int64()),
            "rank": t["rank"].cast(pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


SQL_Q16 = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id <= 4)
SELECT qid AS query_vec_id, vec_id, rank FROM (
  SELECT q.qid, e.vec_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
         ) AS rank
  FROM embeddings e CROSS JOIN q) WHERE rank <= 10
"""


def q20_events_by_type(sf_dir):
    """Grouped aggregate over the event stream."""
    from ray.data.aggregate import Count, Sum

    out = (_read(sf_dir, "events", ["event_type", "value"])
           .groupby("event_type")
           .aggregate(Count(alias_name="n"),
                      Sum("value", alias_name="sum_value")))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _cast_i64(_round_cols(tbl, {"sum_value": 2}), ["n"])


SQL_Q20 = ("SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS "
           "sum_value FROM events GROUP BY event_type")


# ---------------------------------------------------------------------------
# rows-only queries (no SQL equivalent; pytest carries the goldens)


def q30_langid(sf_dir):
    from .ops.text import LangId

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=2).select_columns(
        ["doc_id", "lang_pred"])


# Integer-exact reformulation of LangId (ops/text.py): all five scores
# share the denominator n, so the float argmax reduces to integer count
# comparisons, and `score > 0.03` ⇔ `100*c > 3*n` (3/100's float64
# rounds to the same value as the 0.03 literal, so the boundary case
# c/n == 3/100 is `false` under both formulations).  Tie-break follows
# the Python dict insertion order en,de,fr,es,it (max() keeps the first
# maximal key).
SQL_Q30 = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-zà-ÿ'']+')) AS w
  FROM documents),
cnts AS (
  SELECT doc_id, COUNT(*) AS n,
    COUNT(*) FILTER (WHERE w IN ('the','and','of','to','in','is','that',
      'it','for','was','with','as','his','on','be')) AS c_en,
    COUNT(*) FILTER (WHERE w IN ('der','die','und','das','ist','nicht',
      'mit','ein','von','zu','den','auf','sich','des','im')) AS c_de,
    COUNT(*) FILTER (WHERE w IN ('le','la','les','de','et','un','une',
      'est','dans','que','pour','qui','des','pas','sur')) AS c_fr,
    COUNT(*) FILTER (WHERE w IN ('el','la','los','las','de','y','que',
      'en','un','una','es','por','con','para','del')) AS c_es,
    COUNT(*) FILTER (WHERE w IN ('il','la','di','e','che','un','una',
      'per','non','sono','con','del','le','si','da')) AS c_it
  FROM words GROUP BY doc_id)
SELECT d.doc_id,
  CASE WHEN c.n IS NULL OR c.n = 0 THEN 'und'
       WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es
            AND c_en >= c_it
            THEN CASE WHEN 100 * c_en > 3 * n THEN 'en' ELSE 'und' END
       WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_it
            THEN CASE WHEN 100 * c_de > 3 * n THEN 'de' ELSE 'und' END
       WHEN c_fr >= c_es AND c_fr >= c_it
            THEN CASE WHEN 100 * c_fr > 3 * n THEN 'fr' ELSE 'und' END
       WHEN c_es >= c_it
            THEN CASE WHEN 100 * c_es > 3 * n THEN 'es' ELSE 'und' END
       ELSE CASE WHEN 100 * c_it > 3 * n THEN 'it' ELSE 'und' END
  END AS lang_pred
FROM documents d LEFT JOIN cnts c USING (doc_id)
"""


def q31_simhash(sf_dir):
    from .ops.dedup import simhash_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "simhash"])


def q32_fingerprint(sf_dir):
    from .ops.text import fingerprint_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"])

# Bit-exact SQL reformulation of fingerprint_batch (ops/text.py): the
# Rabin-Karp window hash is Σ byte[w+j]·B^(7-j) mod 2^64 with
# B = 1000003; the CASE constants are B^k mod 2^64 precomputed, HUGEINT
# arithmetic carries the ≤2^75 partial sums, and the final CASE applies
# the uint64→int64 two's-complement view.  Text is ASCII (verified on
# the fixture), so character positions == byte positions.
SQL_Q32 = """
WITH b AS (
  SELECT doc_id, length(text) AS n,
         unnest(range(1, length(text)+1)) AS p,
         CAST(ascii(substr(text,
              CAST(unnest(range(1, length(text)+1)) AS INT), 1))
              AS HUGEINT) AS v
  FROM documents),
win AS (
  SELECT a.doc_id, a.p AS w,
    SUM(bb.v * (CASE bb.p - a.p
      WHEN 0 THEN 12924618581234127435::HUGEINT
      WHEN 1 THEN 10923514805226455897::HUGEINT
      WHEN 2 THEN 14453212906556403763::HUGEINT
      WHEN 3 THEN 14003818205314896721::HUGEINT
      WHEN 4 THEN 1000009000027000027::HUGEINT
      WHEN 5 THEN 1000006000009::HUGEINT
      WHEN 6 THEN 1000003::HUGEINT
      ELSE 1::HUGEINT END)) % 18446744073709551616::HUGEINT AS h
  FROM b a JOIN b bb ON bb.doc_id = a.doc_id
       AND bb.p BETWEEN a.p AND a.p + 7
  WHERE a.p <= a.n - 7
  GROUP BY a.doc_id, a.p),
mins AS (SELECT doc_id, MIN(h) AS m FROM win GROUP BY doc_id),
shortw AS (
  SELECT doc_id, SUM(v * (CASE n - p
      WHEN 0 THEN 1::HUGEINT
      WHEN 1 THEN 1000003::HUGEINT
      WHEN 2 THEN 1000006000009::HUGEINT
      WHEN 3 THEN 1000009000027000027::HUGEINT
      WHEN 4 THEN 14003818205314896721::HUGEINT
      WHEN 5 THEN 14453212906556403763::HUGEINT
      ELSE 10923514805226455897::HUGEINT END))
    % 18446744073709551616::HUGEINT AS m
  FROM b WHERE n < 8 GROUP BY doc_id),
allm AS (SELECT * FROM mins UNION ALL SELECT * FROM shortw)
SELECT d.doc_id,
  CAST(CASE WHEN u.m IS NULL THEN 0::HUGEINT
       WHEN u.m >= 9223372036854775808::HUGEINT
            THEN u.m - 18446744073709551616::HUGEINT
       ELSE u.m END AS BIGINT) AS fingerprint
FROM documents d LEFT JOIN allm u USING (doc_id)
"""


def q33_minhash_pairs(sf_dir):
    import ray
    import ray.data

    from .ops.dedup import minhash_dedup

    # split the read so the fused signature+banding stage parallelizes
    # across the pool (documents.parquet is few row groups)
    nblocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"], override_num_blocks=nblocks)
    return minhash_dedup(ds, threshold=0.5)


def q34_images_tile_assign(sf_dir):
    """Image footprints → (z, x, y) tiles at z=6 (reference formula)."""
    import ray.data

    from .ops.footprint import add_footprint, assign_tiles
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)
    return (ray.data.read_parquet(path,
                                  columns=["image_id", "w", "h", "crs", "gt"])
            .map_batches(lambda t: add_footprint(t, dst_crs=3857),
                         batch_format="pyarrow")
            .map_batches(lambda t: assign_tiles(t, z=6),
                         batch_format="pyarrow")
            .select_columns(["image_id", "z", "tile_x", "tile_y"]))


def q35_images_zone_join(sf_dir):
    """Image footprint × polygon-zone intersects join (broadcast index)."""
    import ray
    import ray.data

    from .ops.footprint import add_footprint
    from .ops.join import SpatialJoinZones
    from .pipelines import ensure_images_parquet, ensure_zone_index

    from .ops.join import resolve_zone_index_cached

    path = ensure_images_parquet(sf_dir)
    zi_ref = ray.put(ensure_zone_index(200))

    def footprint_join(t):
        # task pool + per-worker index memo: broadcast economics without
        # actor-pool spin-up latency (resolve_zone_index_cached)
        j = SpatialJoinZones.__new__(SpatialJoinZones)
        j.index = resolve_zone_index_cached(zi_ref)
        j.id_col = "image_id"
        return j(add_footprint(t, dst_crs=4326))

    return (ray.data.read_parquet(path,
                                  columns=["image_id", "w", "h", "crs", "gt"])
            .map_batches(footprint_join, batch_format="pyarrow"))


def q36_images_warp(sf_dir):
    """Decode + warp to EPSG:3857, per-image checksum fingerprints."""
    import ray.data

    from .ops.warp import WarpImages
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)
    return (ray.data.read_parquet(
                path, columns=["image_id", "bytes", "caption", "w", "h",
                               "crs", "gt"])
            .limit(400)
            .map_batches(WarpImages,
                         fn_constructor_kwargs={"dst_crs": 3857},
                         batch_format="pyarrow", batch_size=32,
                         concurrency=2)
            .select_columns(["image_id", "dst_w", "dst_h", "checksum_b0"]))


def q37_phash_dups(sf_dir):
    """Exact near-dup pairs by identical phash (planted every-97th)."""
    import pandas as pd
    import ray.data

    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=str),
                                 "id_b": pd.Series([], dtype=str)})
        ids = sorted(g["image_id"])
        return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})

    return (ray.data.read_parquet(path, columns=["image_id", "phash"])
            .groupby("phash").map_groups(pairs, batch_format="pandas"))


def _images_cache_glob_sf001():
    """Parquet glob of the deterministic image table at the driver's
    sf=0.01 — the oracle side reads the same cached fixture the Ray
    side materializes (oracle_sqls() triggers generation).  Returns
    None when the testdata dir is absent (keeps import side-effect-free
    and the query rows-only in that environment)."""
    from .pipelines import _CACHE_ROOT, image_count_for_sf

    try:
        n = image_count_for_sf("/root/testdata/sf0.01")
    except Exception:
        return None
    return os.path.join(_CACHE_ROOT, f"images_{n}", "*.parquet")


_Q37_GLOB = _images_cache_glob_sf001()
# chained-pair semantics: within each phash group the ids sort and link
# consecutively — exactly LEAD() OVER (PARTITION BY phash ORDER BY id)
SQL_Q37 = None if _Q37_GLOB is None else f"""
WITH x AS (
  SELECT image_id AS id_a,
         lead(image_id) OVER (PARTITION BY phash ORDER BY image_id)
           AS id_b
  FROM read_parquet('{_Q37_GLOB}'))
SELECT id_a, id_b FROM x WHERE id_b IS NOT NULL
"""


def _sql_mix64_steps(tag, inexpr, seed_add=42):
    """splitmix64 (io/images.py _mix64, SEED=42) as chained SQL exprs.

    64×64→64 modular multiplies use 32-bit limbs so intermediates fit
    HUGEINT: (a*c) mod 2^64 = al*cl + ((al*ch + ah*cl) mod 2^32)·2^32.
    ``seed_add`` is the additive constant beyond the golden-ratio
    increment: 42 for io/images.py ``_mix64``; 0 reproduces
    ops/dedup.py ``_hash_u64(x, seed=0)``.
    """
    m64 = "18446744073709551616::HUGEINT"
    c1h, c1l = 3210233709, 484763065      # 0xBF58476D1CE4E5B9 limbs
    c2h, c2l = 2496678331, 321982955      # 0x94D049BB133111EB limbs
    s = [f"s{i}_{tag}" for i in range(5)]
    return [
        (s[0], f"(({inexpr})::HUGEINT + 11400714819323198485::HUGEINT"
               f" + {seed_add}) % {m64}"),
        (s[1], f"xor({s[0]}, {s[0]} >> 30)"),
        (s[2], f"(({s[1]} % 4294967296) * {c1l} + ((({s[1]} % 4294967296)"
               f" * {c1h} + ({s[1]} // 4294967296) * {c1l}) % 4294967296)"
               f" * 4294967296) % {m64}"),
        (s[3], f"xor({s[2]}, {s[2]} >> 27)"),
        (s[4], f"(({s[3]} % 4294967296) * {c2l} + ((({s[3]} % 4294967296)"
               f" * {c2h} + ({s[3]} // 4294967296) * {c2l}) % 4294967296)"
               f" * 4294967296) % {m64}"),
        (f"mx_{tag}", f"xor({s[4]}, {s[4]} >> 31)"),
    ]



def _sql_footprint_ctes(glob, dst):
    """CTE fragment reproducing ops/footprint.py ``add_footprint`` in
    SQL: 9 geotransform sample points per image, each CRS group through
    the exact closed-form transform chain (geo/crs.py — Krüger 3rd-order
    inverse for EPSG:32631, spherical pseudo-Mercator for 3857/4326),
    min/maxed to the dst-CRS bbox.

    DuckDB 1.0 lacks sinh/cosh, so ``(exp(t) ± exp(-t))/2`` stands in;
    the last-ulp differences vs libm only matter where a bbox lands
    within ~1e-13 of a tile boundary, which the reference's 1e-3
    tile-unit epsilon (and the fixtures' unaligned footprints) make
    unobservable.  Ends with ``fpbox(image_id, x0, y0, x1, y1)``.
    """
    from .geo import crs as _crs

    r = repr
    k0ab = _crs._K0 * _crs._A_BAR
    b1, b2, b3 = _crs._BETA
    d1, d2, d3 = _crs._DELTA
    rm = 6378137.0
    maxlat = 85.05112877980659
    head = f"""
img AS (
  SELECT image_id, w::DOUBLE AS w, h::DOUBLE AS h, crs,
         gt[1] AS g0, gt[2] AS g1, gt[3] AS g2,
         gt[4] AS g3, gt[5] AS g4, gt[6] AS g5
  FROM read_parquet('{glob}')),
fr(fx, fy) AS (VALUES
  (0.0,0.0),(1.0,0.0),(0.0,1.0),(1.0,1.0),
  (0.5,0.0),(0.0,0.5),(1.0,0.5),(0.5,1.0),(0.5,0.5)),
pt AS (
  SELECT image_id, crs,
         g0 + (fx * w) * g1 + (fy * h) * g2 AS x,
         g3 + (fx * w) * g4 + (fy * h) * g5 AS y
  FROM img CROSS JOIN fr),
utm0 AS (
  SELECT image_id, (y - 0.0) / {r(k0ab)} AS xi,
         (x - 500000.0) / {r(k0ab)} AS eta
  FROM pt WHERE crs = 'EPSG:32631'),
utm1 AS (
  SELECT *, cos(2*xi) AS c1, sin(2*xi) AS s1,
            (exp(2*eta) + exp(-(2*eta))) * 0.5 AS ch1,
            (exp(2*eta) - exp(-(2*eta))) * 0.5 AS sh1
  FROM utm0),
utm2 AS (
  SELECT *, c1*c1 - s1*s1 AS c2, s1*c1 + c1*s1 AS s2,
            ch1*ch1 + sh1*sh1 AS ch2, sh1*ch1 + ch1*sh1 AS sh2
  FROM utm1),
utm3 AS (
  SELECT *, c2*c1 - s2*s1 AS c3, s2*c1 + c2*s1 AS s3,
            ch2*ch1 + sh2*sh1 AS ch3, sh2*ch1 + ch2*sh1 AS sh3
  FROM utm2),
utm4 AS (
  SELECT *,
    xi - {r(b1)}*s1*ch1 - {r(b2)}*s2*ch2 - {r(b3)}*s3*ch3 AS xi_p,
    eta - {r(b1)}*c1*sh1 - {r(b2)}*c2*sh2 - {r(b3)}*c3*sh3 AS eta_p
  FROM utm3),
utm5 AS (
  SELECT *, asin(sin(xi_p) / ((exp(eta_p) + exp(-eta_p)) * 0.5)) AS chi
  FROM utm4),
utm_ll AS (
  SELECT image_id,
    3.0 + degrees(atan2((exp(eta_p) - exp(-eta_p)) * 0.5, cos(xi_p)))
      AS lon,
    degrees(chi + {r(d1)}*sin(2.0*chi) + {r(d2)}*sin(4.0*chi)
                + {r(d3)}*sin(6.0*chi)) AS lat
  FROM utm5)"""
    if dst == 4326:
        return head + f""",
ll AS (
  SELECT image_id, lon, lat FROM utm_ll
  UNION ALL
  SELECT image_id, x AS lon, y AS lat FROM pt WHERE crs = 'EPSG:4326'
  UNION ALL
  SELECT image_id, degrees(x / {r(rm)}),
         degrees(2.0 * atan(exp(y / {r(rm)})) - pi()/2.0)
  FROM pt WHERE crs = 'EPSG:3857'),
fpbox AS MATERIALIZED (
  SELECT image_id, MIN(lon) AS x0, MIN(lat) AS y0,
         MAX(lon) AS x1, MAX(lat) AS y1
  FROM ll GROUP BY image_id)"""
    assert dst == 3857
    return head + f""",
ll AS (
  SELECT image_id, lon, lat FROM utm_ll
  UNION ALL
  SELECT image_id, x AS lon, y AS lat FROM pt WHERE crs = 'EPSG:4326'),
merc AS (
  SELECT image_id,
    {r(rm)} * radians(lon) AS mx,
    {r(rm)} * ln(tan(pi()/4.0
        + radians(LEAST(GREATEST(lat, {r(-maxlat)}), {r(maxlat)}))/2.0))
      AS my
  FROM ll
  UNION ALL
  SELECT image_id, x AS mx, y AS my FROM pt WHERE crs = 'EPSG:3857'),
fpbox AS MATERIALIZED (
  SELECT image_id, MIN(mx) AS x0, MIN(my) AS y0,
         MAX(mx) AS x1, MAX(my) AS y1
  FROM merc GROUP BY image_id)"""


def _build_sql_q34(glob):
    """Oracle for q34: footprint → WebMercatorQuad z=6 tile expansion in
    SQL, with the reference's clamp(floor(frac + 1e-3)) indices
    (geo/cells.py tile_indices, apps/gdalalg_raster_tile.cpp:274-343)."""
    e = 20037508.342789244
    span = 2.0 * e / 64.0
    return f"""WITH {_sql_footprint_ctes(glob, 3857)},
idx AS (
  SELECT image_id,
    CAST(LEAST(GREATEST(floor((x0 - {-e!r}) / {span!r} + 0.001),
               0), 63) AS BIGINT) AS tx0,
    CAST(LEAST(GREATEST(floor(({e!r} - y1) / {span!r} + 0.001),
               0), 63) AS BIGINT) AS ty0,
    CAST(LEAST(GREATEST(floor((x1 - {-e!r}) / {span!r} + 0.001),
               0), 63) AS BIGINT) AS tx1,
    CAST(LEAST(GREATEST(floor(({e!r} - y0) / {span!r} + 0.001),
               0), 63) AS BIGINT) AS ty1
  FROM fpbox),
ex AS (
  SELECT image_id, unnest(range(tx0, tx1 + 1)) AS tile_x, ty0, ty1
  FROM idx),
ey AS (
  SELECT image_id, tile_x, unnest(range(ty0, ty1 + 1)) AS tile_y
  FROM ex)
SELECT image_id, 6::INT AS z, tile_x, tile_y FROM ey
"""


def _sql_zone_edges_ctes(n_zones):
    """CTE fragment regenerating io/images.py make_zones_table rings as
    ``edges(j, part, ring, xa, ya, xb, yb)`` plus part bboxes
    ``pbox(j, part, bx0, by0, bx1, by1)`` — the shape ZoneIndex keeps
    per polygon part (ops/join.py:60-85).  Ring tags: part 0 ring 0
    outer, part 0 ring 1 hole (kind j%4==2), part 1 ring 0 shifted copy
    (kind j%4==3); the two pinned rect zones follow the generated ones.
    """
    zsteps = (_sql_mix64_steps("nv", "3*j + 1")
              + _sql_mix64_steps("cx", "j*1315423911 + 11")
              + _sql_mix64_steps("cy", "j*1315423911 + 12")
              + _sql_mix64_steps("r", "j*1315423911 + 13"))
    out = f"zidx AS (SELECT unnest(range(0, {n_zones})) AS j)"
    prev = "zidx"
    for i, (name, expr) in enumerate(zsteps):
        out += f",\nz{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"z{i}"
    return out + f""",
zone AS (
  SELECT j,
         5 + CAST(mx_nv % 56 AS BIGINT) AS nv,
         -20.0 + (CAST(mx_cx % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS cx,
         -10.0 + (CAST(mx_cy % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS cy,
         0.3 + (CAST(mx_r % 4294967296 AS DOUBLE) / 4294967296.0)
             * 2.2 AS r
  FROM {prev}),
vk AS (
  SELECT j, nv, cx, cy, r, unnest(range(0, nv)) AS k FROM zone),
vert AS (
  SELECT j, nv, k, cx, cy, r,
         cx + rad * cos(ang) AS ox, cy + rad * sin(ang) AS oy,
         cx + (0.3 * r) * cos(ang) AS hx, cy + (0.3 * r) * sin(ang) AS hy,
         (cx + rad * cos(ang)) + (2.5 * r) AS sx
  FROM (SELECT *,
          CASE WHEN (j % 4) = 1
               THEN r * (0.45 + 0.55 * CAST(k % 2 AS DOUBLE))
               ELSE r END AS rad,
          CAST(k AS DOUBLE) * (2 * pi() / CAST(nv AS DOUBLE)) AS ang
        FROM vk)),
edges AS MATERIALIZED (
  SELECT a.j, 0 AS part, 0 AS ring,
         a.ox AS xa, a.oy AS ya, b.ox AS xb, b.oy AS yb
  FROM vert a JOIN vert b ON b.j = a.j AND b.k = (a.k + 1) % a.nv
  UNION ALL
  SELECT a.j, 0, 1, a.hx, a.hy, b.hx, b.hy
  FROM vert a JOIN vert b ON b.j = a.j AND b.k = (a.k + 1) % a.nv
  WHERE (a.j % 4) = 2
  UNION ALL
  SELECT a.j, 1, 0, a.sx, a.oy, b.sx, b.oy
  FROM vert a JOIN vert b ON b.j = a.j AND b.k = (a.k + 1) % a.nv
  WHERE (a.j % 4) = 3
  UNION ALL
  SELECT j, 0, 0, xa, ya, xb, yb FROM (VALUES
    ({n_zones}, 10.0, 40.0, 11.0, 40.0),
    ({n_zones}, 11.0, 40.0, 11.0, 41.0),
    ({n_zones}, 11.0, 41.0, 10.0, 41.0),
    ({n_zones}, 10.0, 41.0, 10.0, 40.0),
    ({n_zones + 1}, 5.0, 5.0, 5.0005, 5.0),
    ({n_zones + 1}, 5.0005, 5.0, 5.0005, 25.0),
    ({n_zones + 1}, 5.0005, 25.0, 5.0, 25.0),
    ({n_zones + 1}, 5.0, 25.0, 5.0, 5.0)
  ) t(j, xa, ya, xb, yb)),
pbox AS MATERIALIZED (
  SELECT j, part, MIN(LEAST(xa, xb)) AS bx0, MIN(LEAST(ya, yb)) AS by0,
         MAX(GREATEST(xa, xb)) AS bx1, MAX(GREATEST(ya, yb)) AS by1
  FROM edges GROUP BY j, part)"""


def _build_sql_q35(glob):
    """Oracle for q35: image-footprint × zone intersects join in SQL,
    mirroring ops/join.py rects_intersect_zone's three OR-ed subtests
    exactly: t1 rect corner strictly inside the part (crossing rule,
    holes subtract), t2 outer-ring vertex inside the closed rect, t3
    rect edge × part segment proper-or-touching crossing including the
    collinear-overlap branch (geo/wkb.py segments_cross_matrix).  The
    part-bbox prefilter is a pure superset (any true hit overlaps its
    part's bbox), so applying it never drops an engine row."""
    return f"""WITH {_sql_zone_edges_ctes(200)},
{_sql_footprint_ctes(glob, 4326).lstrip()},
cand AS MATERIALIZED (
  SELECT fpbox.image_id, pbox.j, pbox.part,
         x0 AS rx0, y0 AS ry0, x1 AS rx1, y1 AS ry1
  FROM fpbox JOIN pbox
    ON pbox.bx0 <= fpbox.x1 AND pbox.bx1 >= fpbox.x0
   AND pbox.by0 <= fpbox.y1 AND pbox.by1 >= fpbox.y0),
t2 AS (
  SELECT DISTINCT c.image_id, c.j, c.part
  FROM cand c JOIN edges e ON e.j = c.j AND e.part = c.part AND e.ring = 0
  WHERE e.xa >= c.rx0 AND e.xa <= c.rx1
    AND e.ya >= c.ry0 AND e.ya <= c.ry1),
corners AS (
  SELECT c.*, cc.ci,
         CASE cc.ci WHEN 0 THEN rx0 WHEN 1 THEN rx1
                    WHEN 2 THEN rx1 ELSE rx0 END AS px,
         CASE cc.ci WHEN 0 THEN ry0 WHEN 1 THEN ry0
                    WHEN 2 THEN ry1 ELSE ry1 END AS py
  FROM cand c CROSS JOIN (SELECT unnest(range(4)) AS ci) cc),
cross_counts AS (
  SELECT k.image_id, k.j, k.part, k.ci, e.ring,
         SUM(CASE WHEN (((yb - py) > 0 AND (ya - py) <= 0)
                     OR ((ya - py) > 0 AND (yb - py) <= 0))
                   AND ((xb - px) * (ya - py) - (xa - px) * (yb - py))
                       / ((ya - py) - (yb - py)) > 0
                  THEN 1 ELSE 0 END) AS crossings
  FROM corners k JOIN edges e ON e.j = k.j AND e.part = k.part
  GROUP BY k.image_id, k.j, k.part, k.ci, e.ring),
t1 AS (
  SELECT DISTINCT image_id, j, part
  FROM (SELECT image_id, j, part, ci,
               MAX(CASE WHEN ring = 0 THEN crossings % 2 ELSE 0 END) = 1
                 AND COALESCE(MAX(CASE WHEN ring = 1
                                       THEN crossings % 2 END) = 1,
                              FALSE) = FALSE AS ins
        FROM cross_counts GROUP BY image_id, j, part, ci)
  WHERE ins),
redge AS (
  SELECT c.*,
         CASE ei WHEN 0 THEN rx0 WHEN 1 THEN rx1
                 WHEN 2 THEN rx1 ELSE rx0 END AS ax,
         CASE ei WHEN 0 THEN ry0 WHEN 1 THEN ry0
                 WHEN 2 THEN ry1 ELSE ry1 END AS ay,
         CASE ei WHEN 0 THEN rx1 WHEN 1 THEN rx1
                 WHEN 2 THEN rx0 ELSE rx0 END AS bx,
         CASE ei WHEN 0 THEN ry0 WHEN 1 THEN ry1
                 WHEN 2 THEN ry1 ELSE ry0 END AS "by"
  FROM cand c CROSS JOIN (SELECT unnest(range(4)) AS ei) ee),
t3 AS (
  SELECT DISTINCT g.image_id, g.j, g.part
  FROM (
    SELECT k.image_id, k.j, k.part,
           (bx - ax) AS rx, ("by" - ay) AS ry,
           (e.xb - e.xa) AS sx, (e.yb - e.ya) AS sy,
           (e.xa - ax) AS qpx, (e.ya - ay) AS qpy
    FROM redge k JOIN edges e ON e.j = k.j AND e.part = k.part) g
  WHERE (g.rx != 0 OR g.ry != 0) AND (g.sx != 0 OR g.sy != 0)
    AND (
      (g.rx * g.sy - g.ry * g.sx != 0
       AND (g.qpx * g.sy - g.qpy * g.sx) / (g.rx * g.sy - g.ry * g.sx)
           BETWEEN 0 AND 1
       AND (g.qpx * g.ry - g.qpy * g.rx) / (g.rx * g.sy - g.ry * g.sx)
           BETWEEN 0 AND 1)
      OR
      (g.rx * g.sy - g.ry * g.sx = 0
       AND g.qpx * g.ry - g.qpy * g.rx = 0
       AND GREATEST(g.qpx * g.rx + g.qpy * g.ry,
                    g.qpx * g.rx + g.qpy * g.ry
                    + (g.sx * g.rx + g.sy * g.ry)) >= 0
       AND LEAST(g.qpx * g.rx + g.qpy * g.ry,
                 g.qpx * g.rx + g.qpy * g.ry
                 + (g.sx * g.rx + g.sy * g.ry))
           <= g.rx * g.rx + g.ry * g.ry))),
hitparts AS (
  SELECT image_id, j, part FROM t1
  UNION SELECT image_id, j, part FROM t2
  UNION SELECT image_id, j, part FROM t3)
SELECT DISTINCT image_id, printf('zone-%06d', j) AS zone_id
FROM hitparts
"""


def _build_sql_q51(glob):
    """Oracle for q51: Hilbert-code spatial sort in SQL.  Footprint
    centers on the 2^16 grid, then the iterative xy→d rotation
    (geo/cells.py hilbert_d, public Wikipedia form) as a 16-step
    recursive CTE; rank = row_number over (hilbert, image_id)."""
    e = 20037508.342789244
    return f"""WITH RECURSIVE {_sql_footprint_ctes(glob, 3857).lstrip()},
grid AS (
  SELECT image_id,
    CAST(floor(LEAST(GREATEST(((x0 + x1) / 2 + {e!r})
                              / {2 * e!r} * 65536.0, 0), 65535.0))
         AS BIGINT) AS gx,
    CAST(floor(LEAST(GREATEST(({e!r} - (y0 + y1) / 2)
                              / {2 * e!r} * 65536.0, 0), 65535.0))
         AS BIGINT) AS gy
  FROM fpbox),
hil(image_id, s, x, y, d) AS (
  SELECT image_id, 32768::BIGINT, gx, gy, 0::BIGINT FROM grid
  UNION ALL
  SELECT image_id, s // 2,
    CASE WHEN (y & s) = 0 THEN
      CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END
    ELSE x END,
    CASE WHEN (y & s) = 0 THEN
      CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END
    ELSE y END,
    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                    (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END))
  FROM hil WHERE s > 0),
hcode AS (SELECT image_id, d AS hilbert FROM hil WHERE s = 0)
SELECT image_id, hilbert,
       row_number() OVER (ORDER BY hilbert, image_id) - 1 AS rank
FROM hcode
"""


SQL_Q34 = None if _Q37_GLOB is None else _build_sql_q34(_Q37_GLOB)
SQL_Q35 = None if _Q37_GLOB is None else _build_sql_q35(_Q37_GLOB)
SQL_Q51 = None if _Q37_GLOB is None else _build_sql_q51(_Q37_GLOB)


def q38_pip_points_zones(sf_dir):
    """Polygon PIP with holes/multi parts over fixture points."""
    import ray
    import ray.data

    from .io.images import make_points_table, make_zones_table
    from .ops.join import PIPJoinZones, ZoneIndex

    zi_ref = ray.put(ZoneIndex(make_zones_table(200)))
    pts = ray.data.from_arrow(make_points_table(2000))
    return pts.map_batches(
        PIPJoinZones, fn_constructor_kwargs={"zones_ref": zi_ref,
                                             "emit": "intersects"},
        batch_format="pyarrow", concurrency=2)


def q39_ann_lsh(sf_dir):
    """LSH-bucketed ANN (scale path; recall tested vs brute force)."""
    import pyarrow.parquet as pq

    from .ops.ann import lsh_topk

    qtbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qsel = qtbl.filter(pc.less_equal(qtbl["vec_id"], 4)).sort_by("vec_id")
    queries = np.stack([np.asarray(v, dtype=np.float32)
                        for v in qsel["embedding"].to_pylist()])
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return lsh_topk(ds, queries, k=10).select_columns(
        ["query_idx", "vec_id", "rank"])




def _build_sql_q39(d=64, n_planes=8, seed=7, k=10):
    """Oracle for q39: the full LSH-bucketed ANN in SQL — Box-Muller
    hyperplanes from splitmix64 (ops/ann.py normal_planes, closed-form
    by design so this oracle can exist), sign-bit bucket packing,
    bucket-equality candidates, exact cosine scoring, (score DESC,
    vec_id) top-k.  Engine scores are float32 BLAS, the oracle double:
    rank flips would need two distinct scores within ~1e-7 — planted
    exact duplicates tie bitwise on both sides and break by vec_id."""
    golden = 0x9E3779B97F4A7C15
    m = 1 << 64
    m1 = _sql_mix64_steps("u1", "i", seed_add=(golden * seed) % m)
    m2 = _sql_mix64_steps("u2", "i", seed_add=(golden * (seed + 1)) % m)
    chain, prev = "", "pidx"
    for i, (name, expr) in enumerate(m1 + m2):
        chain += f",\nn{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"n{i}"
    return f"""
WITH pidx AS (SELECT unnest(range(0, {n_planes * d})) AS i){chain},
planes AS MATERIALIZED (
  SELECT i // {d} AS p, i % {d} AS j,
         CAST(sqrt(-2.0 * ln((CAST(mx_u1 >> 11 AS DOUBLE) + 1.0)
                             * power(2.0, -53)))
              * cos(2.0 * pi() * CAST(mx_u2 >> 11 AS DOUBLE)
                    * power(2.0, -53)) AS FLOAT)::DOUBLE AS v
  FROM {prev}),
emb AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
         unnest(embedding)::DOUBLE AS e
  FROM embeddings),
norms AS MATERIALIZED (
  SELECT vec_id, GREATEST(sqrt(SUM(e * e)), 1e-30) AS nrm
  FROM emb GROUP BY vec_id),
proj AS (
  SELECT emb.vec_id, planes.p, SUM(emb.e * planes.v) AS pr
  FROM emb JOIN planes ON planes.j = emb.j
  GROUP BY emb.vec_id, planes.p),
buckets AS MATERIALIZED (
  SELECT vec_id,
         SUM(CASE WHEN pr > 0 THEN 1 << CAST({n_planes - 1} - p AS INT)
                  ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY vec_id),
qv AS (SELECT vec_id AS qid, bucket FROM buckets WHERE vec_id <= 4),
cand AS (
  SELECT q.qid, b.vec_id
  FROM qv q JOIN buckets b ON b.bucket = q.bucket),
dots AS (
  SELECT c.qid, c.vec_id, SUM(a.e * b.e) AS dp
  FROM cand c
  JOIN emb a ON a.vec_id = c.vec_id
  JOIN emb b ON b.vec_id = c.qid AND b.j = a.j
  GROUP BY c.qid, c.vec_id),
scores AS (
  SELECT d.qid, d.vec_id, d.dp / (na.nrm * nb.nrm) AS score
  FROM dots d
  JOIN norms na ON na.vec_id = d.vec_id
  JOIN norms nb ON nb.vec_id = d.qid),
ranked AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, vec_id) AS rank
  FROM scores)
SELECT CAST(qid AS INT) AS query_idx, vec_id,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


SQL_Q39 = _build_sql_q39()


def q40_rasterize_counts(sf_dir):
    """Scanline-rasterize burned-pixel counts per derived rectangle, z=6.

    Engine: each rect flat-maps to covering WebMercator tiles; the
    even-odd scanline fill burns each tile; counts sum per rect via
    groupby.  Oracle: closed-form pixel-center count (the half-open
    [x0, x1) center rule has an exact integer formula).
    """
    import ray.data

    from .geo import cells as C
    from .geo.crs import lonlat_to_mercator
    from .geo.wkb import box_polygon
    from .ops.rasterize import fill_polygon_even_odd
    from ray.data.aggregate import Sum

    rects = _derived_rects()
    tbl = pa.Table.from_pydict({
        "rect_id": pa.array(rects["rect_id"], pa.int64()),
        "x0": pa.array([b[0] for b in rects["bounds"]], pa.float64()),
        "y0": pa.array([b[1] for b in rects["bounds"]], pa.float64()),
        "x1": pa.array([b[2] for b in rects["bounds"]], pa.float64()),
        "y1": pa.array([b[3] for b in rects["bounds"]], pa.float64())})
    ds = ray.data.from_arrow(tbl)
    z = 6
    tm = C.web_mercator_quad(z)

    def per_rect(t: pa.Table) -> pa.Table:
        out_id, out_n = [], []
        for i in range(t.num_rows):
            x0, y0, x1, y1 = (t[c][i].as_py() for c in ("x0", "y0",
                                                        "x1", "y1"))
            mx0, my0 = lonlat_to_mercator(x0, y0)
            mx1, my1 = lonlat_to_mercator(x1, y1)
            tx0, ty0, tx1, ty1 = (int(v) for v in C.tile_indices(
                tm, float(mx0), float(my0), float(mx1), float(my1)))
            total = 0
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    gt = tm.tile_gt(tx, ty)
                    inv_x0 = (float(mx0) - gt[0]) / gt[1]
                    inv_x1 = (float(mx1) - gt[0]) / gt[1]
                    inv_y0 = (float(my1) - gt[3]) / gt[5]  # top
                    inv_y1 = (float(my0) - gt[3]) / gt[5]  # bottom
                    ring = [np.array([
                        [inv_x0, inv_y0], [inv_x1, inv_y0],
                        [inv_x1, inv_y1], [inv_x0, inv_y1],
                        [inv_x0, inv_y0]])]
                    grid = fill_polygon_even_odd(ring, 256, 256)
                    total += int(grid.sum())
            out_id.append(t["rect_id"][i].as_py())
            out_n.append(total)
        return pa.Table.from_pydict({
            "rect_id": pa.array(out_id, pa.int64()),
            "burned_px": pa.array(out_n, pa.int64())})

    return ds.map_batches(per_rect, batch_format="pyarrow")


_RES6 = f"(((2*{_E}/(256*64))*256)/256)"
SQL_Q40 = f"""
WITH rects AS (
  SELECT j AS rect_id,
         CAST(-20 + (j * 7919) % 50 AS DOUBLE) AS x0,
         CAST(-10 + (j * 104729) % 50 AS DOUBLE) AS y0,
         CAST(-20 + (j * 7919) % 50 + 3 + j % 5 AS DOUBLE) AS x1,
         CAST(-10 + (j * 104729) % 50 + 2 + j % 7 AS DOUBLE) AS y1
  FROM range(12) t(j)),
m AS (
  SELECT rect_id,
         radians(x0)*6378137.0 AS mx0,
         radians(x1)*6378137.0 AS mx1,
         6378137.0*ln(tan(pi()/4 + radians(y0)/2)) AS my0,
         6378137.0*ln(tan(pi()/4 + radians(y1)/2)) AS my1
  FROM rects)
SELECT rect_id,
  CAST(GREATEST(ceil((mx1 - (-{_E})) / {_RES6} - 0.5) - 1
        - ceil((mx0 - (-{_E})) / {_RES6} - 0.5) + 1, 0) *
       GREATEST(ceil(({_E} - my0) / {_RES6} - 0.5) - 1
        - ceil(({_E} - my1) / {_RES6} - 0.5) + 1, 0) AS BIGINT)
  AS burned_px
FROM m
"""


def q41_polygonize_rects(sf_dir):
    """rasterize → polygonize → cross-tile dissolve round-trip
    (rows-only; pytest asserts pixel-count conservation)."""
    import ray.data

    from .geo.wkb import box_polygon, polygon_wkb
    from .ops.polygonize import dissolve_across_tiles, polygonize_tiles
    from .ops.rasterize import rasterize_zones

    rects = _derived_rects()
    zones = pa.Table.from_pydict({
        "zone_id": pa.array([f"r{j}" for j in rects["rect_id"]]),
        "wkb": pa.array([polygon_wkb(box_polygon(*b))
                         for b in rects["bounds"]], pa.binary()),
        "pop": pa.array([1] * 12, pa.int64())})
    burned = rasterize_zones(ray.data.from_arrow(zones), z=6,
                             value_col="pop", merge="add")
    comps = polygonize_tiles(burned)
    out = dissolve_across_tiles(comps)  # Dataset: interior never driver-side
    return out.select_columns(["comp_id", "value", "n_pixels", "n_tiles"])


def q42_image_band_stats(sf_dir):
    """Per-image band statistics (ComputeStatistics partial+final shape);
    rows-only — pixel data has no SQL representation."""
    import ray.data

    from .io.codecs import decode
    from .ops.raster_math import stats_final, stats_partial
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def per_image(t: pa.Table) -> pa.Table:
        out = {"image_id": [], "px_count": [], "px_min": [], "px_max": [],
               "px_mean": [], "px_std": []}
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = px[:, :, 0] if px.ndim == 3 else px
            st = stats_final(stats_partial(band.astype(np.float64)))
            out["image_id"].append(t["image_id"][i].as_py())
            out["px_count"].append(st["count"])
            out["px_min"].append(st["min"])
            out["px_max"].append(st["max"])
            out["px_mean"].append(round(st["mean"], 6))
            out["px_std"].append(round(st["std"], 6))
        return pa.Table.from_pydict({
            "image_id": pa.array(out["image_id"], pa.string()),
            "px_count": pa.array(out["px_count"], pa.int64()),
            "px_min": pa.array(out["px_min"], pa.float64()),
            "px_max": pa.array(out["px_max"], pa.float64()),
            "px_mean": pa.array(out["px_mean"], pa.float64()),
            "px_std": pa.array(out["px_std"], pa.float64())})

    return (ray.data.read_parquet(path, columns=["image_id", "bytes"])
            .limit(500)
            .map_batches(per_image, batch_format="pyarrow", batch_size=64))




# ---------------------------------------------------------------------------
# streaming-shaped + vector-geometry queries


def q23_running_sum(sf_dir):
    """Per-user running sum over the ordered event stream
    (``groupby(key).map_groups`` over ts-sorted groups — the engine's
    window primitive; identical sequential accumulation to the SQL
    window, so doubles match bit-for-bit before rounding)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        rs = round_half_away(g["value"].cumsum().values, 2)
        return pd.DataFrame({"event_id": g["event_id"].astype("int64"),
                             "run_sum": rs})

    return ds.groupby("user_id").map_groups(run, batch_format="pandas")


SQL_Q23 = """
SELECT event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING), 2) AS run_sum
FROM events
"""


def q24_sessions(sf_dir):
    """Sessionization: a >30-minute silence starts a new session
    (tumbling/session window over the event-time-ordered log)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "session_no": gap.cumsum().astype("int64")})

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


SQL_Q24 = """
SELECT event_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                      OR ts - prev_ts <= INTERVAL 30 MINUTE THEN 0
                     ELSE 1 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
FROM (SELECT event_id, user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events)
"""


# broadcast build-side row budget for as-of joins: above this the
# co-partition shuffle variant (q68 machinery) runs instead, so no gate
# query ever materializes an unbounded Dataset on the driver
_ASOF_BROADCAST_BUDGET = 500_000


def _parquet_row_count(sf_dir, table):
    """Row count from parquet file metadata only (no data IO)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    path = _os.path.join(sf_dir, f"{table}.parquet")
    files = [path] if _os.path.isfile(path) else sorted(
        _glob.glob(_os.path.join(path, "*.parquet")))
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def q25_asof_join(sf_dir):
    """As-of join: each event matched to the latest order (by date ≤ ts)
    of customer ``user_id % 1500`` — broadcast sorted side + vectorized
    searchsorted per key (the merge_asof pattern without a shuffle).
    The broadcast build is gated on a row budget; larger build sides
    route through the distributed co-partition path (q68)."""
    import ray

    # budget check from parquet METADATA (no data read, no lineage
    # re-execution — count() on the lazy dataset would execute the
    # read once and to_pandas a second time)
    if _parquet_row_count(sf_dir, "orders") > _ASOF_BROADCAST_BUDGET:
        return q68_asof_shuffle(sf_dir)
    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"])
              .to_pandas().sort_values(["o_custkey", "o_orderdate",
                                        "o_orderkey"]))
    # latest order per (custkey, date): ASOF picks max date ≤ ts; among
    # equal dates DuckDB takes an arbitrary one — make it deterministic by
    # keeping the last orderkey per (custkey, date) on BOTH sides
    orders = orders.groupby(["o_custkey", "o_orderdate"], as_index=False)                    .last()
    by_key = {k: (g["o_orderdate"].values.astype("datetime64[us]"),
                  g["o_orderkey"].values)
              for k, g in orders.groupby("o_custkey")}
    ref = ray.put(by_key)

    def join(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        uid = np.asarray(t["user_id"], dtype=np.int64)
        ts = np.asarray(t["ts"]).astype("datetime64[us]")
        eid = np.asarray(t["event_id"], dtype=np.int64)
        keys = uid % 1500
        out_order = np.full(len(eid), -1, dtype=np.int64)
        for k in np.unique(keys):
            ent = m.get(int(k))
            if ent is None:
                continue
            sel = keys == k
            pos = np.searchsorted(ent[0], ts[sel], side="right") - 1
            ok = pos >= 0
            vals = np.full(sel.sum(), -1, dtype=np.int64)
            vals[ok] = ent[1][pos[ok]]
            out_order[sel] = vals
        return pa.Table.from_pydict({
            "event_id": pa.array(eid, pa.int64()),
            "o_orderkey": pa.array(
                np.where(out_order >= 0, out_order, None).tolist(),
                pa.int64())})

    return _read(sf_dir, "events", ["event_id", "user_id", "ts"])         .map_batches(join, batch_format="pyarrow")


SQL_Q25 = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, o.o_orderkey
FROM events e
ASOF LEFT JOIN o
  ON (e.user_id % 1500) = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q28_vector_reproject(sf_dir):
    """In-WKB vector reprojection (OGRWKBUpdatePoints pattern): derived
    customer points → WKB → reproject actor 4326→3857 → coords."""
    from .geo import wkb as W
    from .ops.vector import VectorReproject

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: _derive_points(t, "c_custkey"), batch_format="pyarrow")

    def to_wkb(t: pa.Table) -> pa.Table:
        # fixed-layout point WKB (21 B: order + type + x + y), built as
        # one strided uint8 matrix — no per-row struct.pack
        n = t.num_rows
        seg = np.empty((n, 21), dtype=np.uint8)
        seg[:, 0] = 1                      # little-endian marker
        seg[:, 1:5] = np.array([1, 0, 0, 0], dtype=np.uint8)  # POINT
        seg[:, 5:13] = np.ascontiguousarray(
            np.asarray(t["x"], dtype="<f8")).view(np.uint8).reshape(n, 8)
        seg[:, 13:21] = np.ascontiguousarray(
            np.asarray(t["y"], dtype="<f8")).view(np.uint8).reshape(n, 8)
        offsets = np.arange(0, 21 * (n + 1), 21, dtype=np.int32)
        wkb = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(seg.tobytes())])
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"], "wkb": wkb})

    def from_wkb(t: pa.Table) -> pa.Table:
        # strided view over the fixed 21-byte point layout; fall back to
        # the generic parser only on unexpected shapes
        arr = t["wkb"].combine_chunks()
        n = len(arr)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset:arr.offset + n + 1]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        seg = None
        if n and (np.diff(offs) == 21).all():
            cand = data[offs[0]:offs[-1]].reshape(n, 21)
            # byte-order 1 (LE) + geometry type 1 (point) required for
            # the strided view; anything else (BE, non-point) falls
            # through to the generic parser
            if ((cand[:, 0] == 1).all() and (cand[:, 1] == 1).all()
                    and not cand[:, 2:5].any()):
                seg = cand
        if seg is not None:
            xs = seg[:, 5:13].copy().view("<f8").ravel()
            ys = seg[:, 13:21].copy().view("<f8").ravel()
        else:
            xs = np.empty(n)
            ys = np.empty(n)
            for i, b in enumerate(arr.to_pylist()):
                _, c = W.parse_wkb(b)
                xs[i], ys[i] = c[0, 0], c[0, 1]
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "mx": pa.array(round_half_away(xs, 4), pa.float64()),
            "my": pa.array(round_half_away(ys, 4), pa.float64())})

    return (pts.map_batches(to_wkb, batch_format="pyarrow")
            .map_batches(VectorReproject,
                         fn_constructor_kwargs={"src_crs": 4326,
                                                "dst_crs": 3857},
                         batch_format="pyarrow", concurrency=2)
            .map_batches(from_wkb, batch_format="pyarrow"))


SQL_Q28 = f"""
WITH pts AS (
  SELECT c_custkey,
         {_PT[0].format(k='c_custkey')} AS x,
         {_PT[1].format(k='c_custkey')} AS y
  FROM customer)
SELECT c_custkey,
       ROUND(radians(x)*6378137.0, 4) AS mx,
       ROUND(6378137.0*ln(tan(pi()/4 + radians(y)/2)), 4) AS my
FROM pts
"""


def q43_tile_pyramid(sf_dir):
    """Tile pyramid reduce (salted mosaic + per-level groupby); rows-only
    — pytest covers pixel-exactness of the compose."""
    from .pipelines import tile_pyramid

    res = tile_pyramid(sf_dir, z_max=8, z_min=6, salt=4, limit_images=80)
    frames = []
    for z, ds in res["levels"].items():
        pdf = ds.to_pandas()[["z", "tile_x", "tile_y", "n_contrib"]]
        frames.append(pdf)
    out = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pydict({
        "z": pa.array(out["z"].astype("int64")),
        "tile_x": pa.array(out["tile_x"].astype("int64")),
        "tile_y": pa.array(out["tile_y"].astype("int64")),
        "n_contrib": pa.array(out["n_contrib"].astype("int64"))})


def q44_zone_geometry_stats(sf_dir):
    """Per-zone geometry scalars (area/parts/vertices/centroid).

    geom_area is rounded to 6 decimals on both sides: the engine
    shoelace uses np.dot (pairwise/BLAS summation) while the SQL oracle
    sums sequentially, so unrounded doubles differ in the last ulp.
    """
    import ray.data

    from .io.images import make_zones_table
    from .ops.vector import geometry_stats_batch

    ds = ray.data.from_arrow(make_zones_table(300))
    out = ds.map_batches(geometry_stats_batch, batch_format="pyarrow")

    def rounded(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "zone_id": t["zone_id"],
            "geom_area": pa.array(round_half_away(
                np.asarray(t["geom_area"], dtype=np.float64), 6),
                pa.float64()),
            "n_parts": t["n_parts"].cast(pa.int64()),
            "n_vertices": t["n_vertices"].cast(pa.int64())})

    return out.map_batches(rounded, batch_format="pyarrow")


def _build_sql_q44():
    """Oracle for q44: regenerates the zone fixture's vertices in SQL
    (splitmix64 units + trig ring synthesis, io/images.py
    _zone_polygon) and recomputes the shoelace area, ROUND(…, 6)
    matching the engine-side rounding."""
    steps = (_sql_mix64_steps("nv", "3*j + 1")
             + _sql_mix64_steps("cx", "j*1315423911 + 11")
             + _sql_mix64_steps("cy", "j*1315423911 + 12")
             + _sql_mix64_steps("r", "j*1315423911 + 13"))
    sql = "WITH idx AS (SELECT unnest(range(0, 300)) AS j)"
    prev = "idx"
    for i, (name, expr) in enumerate(steps):
        sql += f",\nc{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"c{i}"
    sql += f""",
zone AS (
  SELECT j,
         5 + CAST(mx_nv % 56 AS BIGINT) AS nv,
         -20.0 + (CAST(mx_cx % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS cx,
         -10.0 + (CAST(mx_cy % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS cy,
         0.3 + (CAST(mx_r % 4294967296 AS DOUBLE) / 4294967296.0)
               * 2.2 AS r
  FROM {prev}),
vert AS (
  SELECT j, nv, cx, cy, r, unnest(range(0, nv)) AS k FROM zone),
vxy AS (
  SELECT j, nv, k, cx, cy, r,
         CASE WHEN (j % 4) = 1
              THEN r * (0.45 + 0.55 * CAST(k % 2 AS DOUBLE))
              ELSE r END AS rad,
         CAST(k AS DOUBLE) * (2 * pi() / CAST(nv AS DOUBLE)) AS ang
  FROM vert),
pxy AS (
  SELECT j, nv, k,
         cx + rad * cos(ang) AS x,
         cy + rad * sin(ang) AS y,
         cx + (0.3 * r) * cos(ang) AS hx,
         cy + (0.3 * r) * sin(ang) AS hy,
         2.5 * r AS dx
  FROM vxy),
seg AS (
  SELECT a.j, a.nv,
         a.x * b.y AS f1, b.x * a.y AS f2,
         a.hx * b.hy AS h1, b.hx * a.hy AS h2,
         (a.x + a.dx) * b.y AS g1, (b.x + b.dx) * a.y AS g2
  FROM pxy a JOIN pxy b
    ON b.j = a.j AND b.k = (a.k + 1) % a.nv),
area AS (
  SELECT j, nv,
         abs(0.5 * (SUM(f1) - SUM(f2))) AS a_outer,
         abs(0.5 * (SUM(h1) - SUM(h2))) AS a_hole,
         abs(0.5 * (SUM(g1) - SUM(g2))) AS a_part2
  FROM seg GROUP BY j, nv)
SELECT printf('zone-%06d', j) AS zone_id,
       ROUND(CASE (j % 4)
             WHEN 2 THEN a_outer - a_hole
             WHEN 3 THEN a_outer + a_part2
             ELSE a_outer END, 6) AS geom_area,
       CASE WHEN (j % 4) = 3 THEN 2 ELSE 1 END::BIGINT AS n_parts,
       CASE (j % 4) WHEN 2 THEN 2 * (nv + 1)
                    WHEN 3 THEN 2 * (nv + 1)
                    ELSE nv + 1 END::BIGINT AS n_vertices
FROM area
UNION ALL SELECT 'zone-000300',
  ROUND(abs(0.5 * ((10.0*40.0 + 11.0*41.0 + 11.0*41.0 + 10.0*40.0)
                 - (11.0*40.0 + 11.0*40.0 + 10.0*41.0 + 10.0*41.0))), 6),
  1, 5
UNION ALL SELECT 'zone-000301',
  ROUND(abs(0.5 * ((5.0*5.0 + 5.0005*25.0 + 5.0005*25.0 + 5.0*5.0)
                 - (5.0005*5.0 + 5.0005*5.0 + 5.0*25.0 + 5.0*25.0))), 6),
  1, 5
"""
    return sql


SQL_Q44 = _build_sql_q44()


def _sql_token_hash_ctes():
    """Shared CTE fragment reproducing ops/dedup.py ``_text_tokens_u64``
    in pure SQL: whitespace tokens of ``documents.text`` → the exact
    uint64 token hashes the engine computes.

    The zlib CRC-32 is folded byte-by-byte with a 256-entry table built
    by an 8-step recursive CTE (reflected poly 0xEDB88320); the forward
    and reversed-bytes CRCs combine into 64 bits, then one splitmix64
    round (``_hash_u64(x, seed=0)``) disperses them.  Token CRCs fold
    over DISTINCT tokens only (the fixture vocabulary is tiny), then
    join back to per-document positions.  The fixture text is
    single-space-separated ASCII (so ``string_split(text, ' ')`` ==
    Python ``str.split()`` and char positions == byte positions).

    Emits CTEs: ``tokmix(tok, h)`` — h HUGEINT in [0, 2^64) — and
    ``doctok(doc_id, pos, tok)`` with 1-based token position.
    """
    steps = _sql_mix64_steps("th", "h0", seed_add=0)
    chain = ""
    prev = "tokh"
    for i, (name, expr) in enumerate(steps):
        chain += f",\nmc{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"mc{i}"
    return f"""
WITH RECURSIVE crct(i, k, c) AS (
  SELECT i::UBIGINT, 0, i::UBIGINT FROM range(256) t(i)
  UNION ALL
  SELECT i, k + 1,
    CASE WHEN c % 2 = 1 THEN xor(c >> 1, 3988292384::UBIGINT)
         ELSE c >> 1 END
  FROM crct WHERE k < 8),
crctab AS (SELECT i, c FROM crct WHERE k = 8),
toks AS (
  SELECT DISTINCT t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''),
fold(tok, p, crc, crcr) AS (
  SELECT tok, 0, 4294967295::UBIGINT, 4294967295::UBIGINT FROM toks
  UNION ALL
  SELECT f.tok, p + 1,
    xor(crc >> 8, t1.c),
    xor(crcr >> 8, t2.c)
  FROM fold f
  JOIN crctab t1
    ON t1.i = xor(crc, ascii(substr(f.tok, p + 1, 1))::UBIGINT) % 256
  JOIN crctab t2
    ON t2.i = xor(crcr,
                  ascii(substr(f.tok, length(f.tok) - p, 1))::UBIGINT) % 256
  WHERE p < length(f.tok)),
tokh AS (
  SELECT tok,
         (xor(crc, 4294967295::UBIGINT)::HUGEINT
          + xor(crcr, 4294967295::UBIGINT)::HUGEINT
            * 4294967296::HUGEINT) AS h0
  FROM fold WHERE p = length(tok)){chain},
tokmix AS (SELECT tok, mx_th AS h FROM {prev}),
doctok AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
  WHERE length(l) > 0)"""


def _build_sql_q31():
    """Oracle for q31: bit-exact 64-bit SimHash in SQL — per-document
    majority vote over the 64 bits of every token hash, packed with
    two's complement into BIGINT (ops/dedup.py simhash_batch)."""
    return _sql_token_hash_ctes() + """,
dt AS (SELECT d.doc_id, m.h FROM doctok d JOIN tokmix m USING (tok)),
bits AS (
  SELECT doc_id, bl.b,
         SUM(CASE WHEN (h >> CAST(bl.b AS INT)) % 2 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM dt CROSS JOIN (SELECT unnest(range(64)) AS b) bl
  GROUP BY doc_id, bl.b),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0
                  THEN (1::HUGEINT << CAST(b AS INT))
                  ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id)
SELECT d.doc_id,
       CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                 THEN u - 18446744073709551616::HUGEINT
                 ELSE u END AS BIGINT) AS simhash
FROM documents d JOIN sh USING (doc_id)
"""


SQL_Q31 = _build_sql_q31()


def _build_sql_q33():
    """Oracle for q33: the full MinHash-LSH near-dup pipeline in SQL,
    bit-exact with ops/dedup.py minhash_dedup (64 perms, 16 bands,
    3-token shingles, threshold 0.5).

    Stages mirror the engine: token hashes (shared CTEs) → rolling
    3-gram shingle combine (two seeded splitmix rounds) → 64-perm
    signature (splitmix over DISTINCT shingles only — the fixture
    vocabulary keeps that set small — then per-doc min) → candidate =
    equality of a whole 4-perm band (the engine's band_hash is a pure
    function of that 4-tuple) → estimated Jaccard = mean per-perm
    signature agreement ≥ threshold.  The engine's hot-bucket cap (512)
    and shard assignment never alter output at fixture bucket sizes.
    ``MATERIALIZED`` pins multiply-referenced CTEs (DuckDB re-inlines
    otherwise, recomputing the mix chain per reference).
    """
    golden = 0x9E3779B97F4A7C15
    m = 1 << 64
    sh1 = _sql_mix64_steps("sh1", "xor(h0_t, h1_t)", seed_add=golden % m)
    sh2 = _sql_mix64_steps("sh2", "xor(mx_sh1, h2_t)",
                           seed_add=(golden * 2) % m)
    sg = _sql_mix64_steps("sg", "xor(sh, 0::HUGEINT)", seed_add="sd")
    chain, prev = "", "tri"
    for i, (name, expr) in enumerate(sh1 + sh2):
        chain += f",\nsc{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"sc{i}"
    gchain, gprev = "", "shp"
    for i, (name, expr) in enumerate(sg):
        gchain += f",\ngc{i} AS (SELECT *, {expr} AS {name} FROM {gprev})"
        gprev = f"gc{i}"
    return _sql_token_hash_ctes() + f""",
dth AS MATERIALIZED (
  SELECT d.doc_id, d.pos, m.h
  FROM doctok d JOIN tokmix m USING (tok)),
ntok AS (SELECT doc_id, COUNT(*) AS n FROM dth GROUP BY doc_id),
tri AS (
  SELECT a.doc_id, a.pos, a.h AS h0_t, b.h AS h1_t, c.h AS h2_t
  FROM dth a
  JOIN dth b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN dth c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN ntok n ON n.doc_id = a.doc_id AND n.n >= 3){chain},
shingle AS (
  SELECT doc_id, mx_sh2 AS sh FROM {prev}
  UNION ALL
  SELECT d.doc_id, d.h AS sh
  FROM dth d JOIN ntok n ON n.doc_id = d.doc_id AND n.n < 3),
dsh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM shingle),
shp AS (
  SELECT sh, pl.p,
         (11400714819323198485::HUGEINT * pl.p)
           % 18446744073709551616::HUGEINT AS sd
  FROM (SELECT DISTINCT sh FROM dsh)
  CROSS JOIN (SELECT unnest(range(64)) AS p) pl){gchain},
sig AS MATERIALIZED (
  SELECT d.doc_id, m.p, MIN(m.mx_sg) AS sig
  FROM dsh d JOIN {gprev} m USING (sh) GROUP BY d.doc_id, m.p),
bandrow AS MATERIALIZED (
  SELECT doc_id, p // 4 AS band,
         MAX(CASE WHEN p % 4 = 0 THEN sig END) AS v0,
         MAX(CASE WHEN p % 4 = 1 THEN sig END) AS v1,
         MAX(CASE WHEN p % 4 = 2 THEN sig END) AS v2,
         MAX(CASE WHEN p % 4 = 3 THEN sig END) AS v3
  FROM sig GROUP BY doc_id, p // 4),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandrow a
  JOIN bandrow b ON b.band = a.band AND b.v0 = a.v0 AND b.v1 = a.v1
                AND b.v2 = a.v2 AND b.v3 = a.v3
                AND a.doc_id < b.doc_id),
est AS (
  SELECT c.id_a, c.id_b,
         AVG(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
           AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.p = sa.p
  GROUP BY c.id_a, c.id_b)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
"""


SQL_Q33 = _build_sql_q33()


def _build_sql_q38():
    """Oracle for q38: point-in-polygon with holes/multi parts, all in
    SQL.  Regenerates the 200-zone + hotbox/sliver fixture rings and
    the 2000 + 8 pinned probe points (io/images.py — DuckDB's cos/sin
    are bitwise-identical to numpy's on this platform, verified), then
    applies the engine's exact predicates over a (point × edge) join:
    crossing-number interior (geo/wkb.py points_in_ring,
    ogr/ogrlinearring.cpp:462 parity — point-relative straddle +
    ``(x1*y2 - x2*y1)/(y2-y1) > 0``) and eps=0 on-segment boundary
    (``:543``).  inside per kind: holed = outer AND NOT hole, multi =
    outer OR shifted part; Intersects ≡ inside OR boundary."""
    zsteps = (_sql_mix64_steps("nv", "3*j + 1")
              + _sql_mix64_steps("cx", "j*1315423911 + 11")
              + _sql_mix64_steps("cy", "j*1315423911 + 12")
              + _sql_mix64_steps("r", "j*1315423911 + 13"))
    sql = "WITH zidx AS (SELECT unnest(range(0, 200)) AS j)"
    prev = "zidx"
    for i, (name, expr) in enumerate(zsteps):
        sql += f",\nz{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"z{i}"
    psteps = (_sql_mix64_steps("px", "i*1315423911 + 21")
              + _sql_mix64_steps("py", "i*1315423911 + 22"))
    sql += ",\npidx AS (SELECT unnest(range(0, 2000)) AS i)"
    prev_p = "pidx"
    for i, (name, expr) in enumerate(psteps):
        sql += f",\np{i} AS (SELECT *, {expr} AS {name} FROM {prev_p})"
        prev_p = f"p{i}"
    sql += f""",
zone AS (
  SELECT j,
         5 + CAST(mx_nv % 56 AS BIGINT) AS nv,
         -20.0 + (CAST(mx_cx % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS cx,
         -10.0 + (CAST(mx_cy % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS cy,
         0.3 + (CAST(mx_r % 4294967296 AS DOUBLE) / 4294967296.0)
             * 2.2 AS r
  FROM {prev}),
vk AS (
  SELECT j, nv, cx, cy, r, unnest(range(0, nv)) AS k FROM zone),
vert AS (
  SELECT j, nv, k, cx, cy, r,
         cx + rad * cos(ang) AS ox, cy + rad * sin(ang) AS oy,
         cx + (0.3 * r) * cos(ang) AS hx, cy + (0.3 * r) * sin(ang) AS hy,
         (cx + rad * cos(ang)) + (2.5 * r) AS sx
  FROM (SELECT *,
          CASE WHEN (j % 4) = 1
               THEN r * (0.45 + 0.55 * CAST(k % 2 AS DOUBLE))
               ELSE r END AS rad,
          CAST(k AS DOUBLE) * (2 * pi() / CAST(nv AS DOUBLE)) AS ang
        FROM vk)),
edges AS (
  -- ring 0 = outer (all kinds), 1 = hole (kind 2), 2 = shifted part
  -- (kind 3); edge k runs vertex k -> k+1 (ring closure wraps)
  SELECT a.j, 0 AS ring, a.ox AS xa, a.oy AS ya, b.ox AS xb, b.oy AS yb
  FROM vert a JOIN vert b ON b.j = a.j AND b.k = (a.k + 1) % a.nv
  UNION ALL
  SELECT a.j, 1, a.hx, a.hy, b.hx, b.hy
  FROM vert a JOIN vert b ON b.j = a.j AND b.k = (a.k + 1) % a.nv
  WHERE (a.j % 4) = 2
  UNION ALL
  SELECT a.j, 2, a.sx, a.oy, b.sx, b.oy
  FROM vert a JOIN vert b ON b.j = a.j AND b.k = (a.k + 1) % a.nv
  WHERE (a.j % 4) = 3
  UNION ALL
  SELECT j, 0, xa, ya, xb, yb FROM (VALUES
    (200, 10.0, 40.0, 11.0, 40.0), (200, 11.0, 40.0, 11.0, 41.0),
    (200, 11.0, 41.0, 10.0, 41.0), (200, 10.0, 41.0, 10.0, 40.0),
    (201, 5.0, 5.0, 5.0005, 5.0), (201, 5.0005, 5.0, 5.0005, 25.0),
    (201, 5.0005, 25.0, 5.0, 25.0), (201, 5.0, 25.0, 5.0, 5.0)
  ) t(j, xa, ya, xb, yb)),
pts AS (
  SELECT printf('pt-%08d', i) AS point_id,
         -20.0 + (CAST(mx_px % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS px,
         -10.0 + (CAST(mx_py % 4294967296 AS DOUBLE) / 4294967296.0)
               * 60.0 AS py
  FROM {prev_p}
  UNION ALL
  -- pinned: vertices k=0..3 of zone 0 and midpoints of edges k->k+1
  SELECT printf('pt-%08d', 2000 + 2 * a.k), a.ox, a.oy
  FROM vert a WHERE a.j = 0 AND a.k < 4
  UNION ALL
  SELECT printf('pt-%08d', 2001 + 2 * a.k),
         (a.ox + b.ox) / 2, (a.oy + b.oy) / 2
  FROM vert a JOIN vert b ON b.j = 0 AND b.k = a.k + 1
  WHERE a.j = 0 AND a.k < 4),
hits AS (
  SELECT p.point_id, e.j, e.ring,
         SUM(CASE WHEN (((yb - py) > 0 AND (ya - py) <= 0)
                     OR ((ya - py) > 0 AND (yb - py) <= 0))
                   AND ((xb - px) * (ya - py) - (xa - px) * (yb - py))
                       / ((ya - py) - (yb - py)) > 0
                  THEN 1 ELSE 0 END) AS crossings,
         BOOL_OR(   (xb - xa) * (py - ya) - (yb - ya) * (px - xa) = 0
                AND (xb - xa) * (px - xa) + (yb - ya) * (py - ya) >= 0
                AND (xb - xa) * (px - xa) + (yb - ya) * (py - ya)
                    <= (xb - xa) * (xb - xa) + (yb - ya) * (yb - ya)
                AND (xb - xa) * (xb - xa) + (yb - ya) * (yb - ya) > 0
            ) AS onb
  FROM pts p CROSS JOIN edges e
  GROUP BY p.point_id, e.j, e.ring),
clz AS (
  SELECT point_id, j,
         MAX(CASE WHEN ring = 0 THEN crossings % 2 ELSE 0 END) = 1
           AS in_outer,
         MAX(CASE WHEN ring = 1 THEN crossings % 2 ELSE 0 END) = 1
           AS in_hole,
         MAX(CASE WHEN ring = 2 THEN crossings % 2 ELSE 0 END) = 1
           AS in_part2,
         BOOL_OR(onb) AS on_boundary
  FROM hits GROUP BY point_id, j)
SELECT point_id, printf('zone-%06d', j) AS zone_id,
       CASE WHEN j < 200 AND (j % 4) = 2 THEN in_outer AND NOT in_hole
            WHEN j < 200 AND (j % 4) = 3 THEN in_outer OR in_part2
            ELSE in_outer END AS inside,
       on_boundary
FROM clz
WHERE (CASE WHEN j < 200 AND (j % 4) = 2 THEN in_outer AND NOT in_hole
            WHEN j < 200 AND (j % 4) = 3 THEN in_outer OR in_part2
            ELSE in_outer END) OR on_boundary
"""
    return sql


SQL_Q38 = _build_sql_q38()


def q45_explode_zones(sf_dir):
    """Explode multi-part zones to one row per part."""
    import ray.data

    from .io.images import make_zones_table
    from .ops.vector import explode_batch

    ds = ray.data.from_arrow(make_zones_table(300))
    out = ds.map_batches(explode_batch, batch_format="pyarrow")
    return out.select_columns(["zone_id", "part_index", "kind"])


# closed-form oracle: the zone fixture's part structure is a pure
# function of the index — kind cycles (convex, concave, holed, multi)
# and only 'multi' zones carry two parts; the two pinned rows (hotbox,
# sliver) are single-part (io/images.py make_zones_table).
SQL_Q45 = """
WITH idx AS (SELECT unnest(range(0, 300)) AS j),
base AS (
  SELECT printf('zone-%06d', j) AS zone_id,
         CASE (j % 4) WHEN 0 THEN 'convex' WHEN 1 THEN 'concave'
                      WHEN 2 THEN 'holed' ELSE 'multi' END AS kind,
         CASE WHEN (j % 4) = 3 THEN 2 ELSE 1 END AS nparts
  FROM idx
  UNION ALL SELECT 'zone-000300', 'hotbox', 1
  UNION ALL SELECT 'zone-000301', 'sliver', 1)
SELECT zone_id, unnest(range(0, nparts)) AS part_index, kind FROM base
"""


def q46_embed_neardup(sf_dir):
    """Embedding-cosine near-dup pairs (sim > 0.25 among vec_id < 100;
    107 pairs at sf0.01).

    Cross-batch-safe by construction: the ≤100-row filtered subset is
    repartitioned to ONE block before the pairwise stage, so pairs can
    never be silently dropped across block boundaries.  The scale path
    for unbounded inputs is rhp_signature bucketing in ops.ann.lsh_topk.
    """
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    from .ops.ann import embeddings_matrix

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64())})
        x = embeddings_matrix(t, dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        sims = x @ x.T
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        ai, bi = np.nonzero(np.triu(sims > 0.25, k=1))
        lo = np.minimum(ids[ai], ids[bi])
        hi = np.maximum(ids[ai], ids[bi])
        return pa.Table.from_pydict({
            "id_a": pa.array(lo, pa.int64()),
            "id_b": pa.array(hi, pa.int64())})

    return (ds.filter(expr="vec_id < 100")
            .repartition(1)
            .map_batches(pairs, batch_format="pyarrow",
                         batch_size=1 << 20))


SQL_Q46 = """
SELECT LEAST(a.vec_id, b.vec_id) AS id_a,
       GREATEST(a.vec_id, b.vec_id) AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 100 AND b.vec_id < 100
  AND list_cosine_similarity(a.embedding, b.embedding) > 0.25
"""




def q47_grid_idw(sf_dir):
    """gdal_grid-style IDW: supplier points (value = s_acctbal) → raster
    grid; rows-only (pytest carries the closed-form oracle)."""
    import ray
    import ray.data

    from .ops.grid import GridInterpolate
    from .ops.join import build_cell_points

    sup = (_read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
           .map_batches(lambda t: _derive_points(t, "s_suppkey")
                        .append_column("v", t["s_acctbal"]),
                        batch_format="pyarrow").to_pandas())
    index = build_cell_points(sup["v"].values, sup["x"].values,
                              sup["y"].values, z=4,
                              window=(-20.0, -10.0, 40.0, 50.0))
    idx_ref = ray.put(index)
    tiles = pa.Table.from_pydict({
        "tile_id": pa.array(np.arange(9), pa.int64()),
        "x0": pa.array([-20.0 + 20 * (i % 3) for i in range(9)]),
        "y0": pa.array([-10.0 + 20 * (i // 3) for i in range(9)]),
        "x1": pa.array([0.0 + 20 * (i % 3) for i in range(9)]),
        "y1": pa.array([10.0 + 20 * (i // 3) for i in range(9)])})
    ds = ray.data.from_arrow(tiles)
    out = ds.map_batches(GridInterpolate,
                         fn_constructor_kwargs={
                             "index_ref": idx_ref, "algorithm": "invdist",
                             "w": 32, "h": 32, "radius": 15.0},
                         batch_format="pyarrow", concurrency=2)

    def summarize(t: pa.Table) -> pa.Table:
        sums, mx = [], []
        for b in t["data"].to_pylist():
            a = np.frombuffer(b, dtype=np.float64)
            sums.append(float(round_half_away(a.sum(), 2)))
            mx.append(float(round_half_away(a.max(), 4)))
        return pa.Table.from_pydict({
            "tile_id": t["tile_id"],
            "grid_sum": pa.array(sums, pa.float64()),
            "grid_max": pa.array(mx, pa.float64())})

    return out.map_batches(summarize, batch_format="pyarrow")


# SQL reformulation of gdal_grid invdist (ops/grid.py grid_tile):
# derived points are integer-LCG exact, pixel centers are exact dyadics
# ((k+0.5)·20/32), weight 1/d² matches power=2 smoothing=0, the
# d2 > 0 guard mirrors the engine's isfinite() weight mask, and the
# MIN(d2) < 1e-18 branch is the exact-hit override (unique per cell —
# the LCG point lattice admits no duplicate points below key 60000).
# ROUND absorbs summation-order ulp drift (engine rounds half-away too).
SQL_Q47 = """
WITH pts AS (
  SELECT -20 + ((s_suppkey * 48271) % 60000) / 1000.0 AS px,
         -10 + ((s_suppkey * 16807) % 60000) / 1000.0 AS py,
         CAST(s_acctbal AS DOUBLE) AS v
  FROM supplier),
tgeo AS (SELECT unnest(range(0, 9)) AS tile_id),
cells AS (
  SELECT tile_id,
         -20.0 + 20.0 * (tile_id % 3) AS x0,
         -10.0 + 20.0 * (tile_id // 3) AS y0,
         unnest(range(0, 1024)) AS c
  FROM tgeo),
cxy AS (
  SELECT tile_id, c,
         x0 + (CAST(c % 32 AS DOUBLE) + 0.5) * 20.0 / 32.0 AS cx,
         (y0 + 20.0) - (CAST(c // 32 AS DOUBLE) + 0.5) * 20.0 / 32.0 AS cy
  FROM cells),
pairs AS (
  SELECT q.tile_id, q.c, p.v,
         (q.cx - p.px)*(q.cx - p.px) + (q.cy - p.py)*(q.cy - p.py) AS d2
  FROM cxy q CROSS JOIN pts p),
cellval AS (
  SELECT tile_id, c,
    CASE WHEN MIN(d2) < 1e-18 THEN arg_min(v, d2)
         WHEN SUM(CASE WHEN d2 <= 225.0 AND d2 > 0
                  THEN 1.0/d2 ELSE 0 END) > 0
           THEN SUM(CASE WHEN d2 <= 225.0 AND d2 > 0
                    THEN (1.0/d2) * v ELSE 0 END)
              / SUM(CASE WHEN d2 <= 225.0 AND d2 > 0
                    THEN 1.0/d2 ELSE 0 END)
         ELSE 0.0 END AS val
  FROM pairs GROUP BY tile_id, c)
SELECT tile_id, ROUND(SUM(val), 2) AS grid_sum,
       ROUND(MAX(val), 4) AS grid_max
FROM cellval GROUP BY tile_id
"""


def q48_stride_sample(sf_dir):
    """Deterministic decimation sampling (ApproxOK-style every-Nth)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        mask = (np.asarray(t["doc_id"]) % 20) == 0
        t = t.filter(pa.array(mask))
        return pa.Table.from_pydict({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_chars": t["n_chars"].cast(pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_Q48 = ("SELECT doc_id, n_chars FROM documents WHERE doc_id % 20 = 0")


def q49_string_funcs(sf_dir):
    """Scalar string functions: UPPER/SUBSTR/CONCAT/LENGTH (swq op set)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def fn(t: pa.Table) -> pa.Table:
        name = t["c_name"]
        up5 = pc.utf8_upper(pc.utf8_slice_codeunits(name, 0, 5))
        tag = pc.binary_join_element_wise(
            up5, t["c_mktsegment"], pa.scalar("/"))
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "tag": tag,
            "name_len": pc.utf8_length(name).cast(pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_Q49 = """
SELECT c_custkey,
       UPPER(SUBSTR(c_name, 1, 5)) || '/' || c_mktsegment AS tag,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len
FROM customer
"""


def q50_color_palette(sf_dir):
    """Median-cut palette over the image corpus: per-batch RGB histogram
    partials → merged → driver-side box split (partial+final)."""
    import ray.data

    from .io.codecs import decode
    from .ops.color import histogram_partial_rgb, median_cut
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        acc = None
        for b in t["bytes"].to_pylist():
            px = decode(b)
            h = histogram_partial_rgb(px if px.ndim == 3
                                      else px[:, :, None].repeat(3, 2))
            acc = h if acc is None else acc + h
        if acc is None:
            acc = np.zeros(32 ** 3, dtype=np.int64)
        return pa.Table.from_pydict({
            "hist": pa.array([acc.tolist()],
                             pa.list_(pa.int64(), 32 ** 3))})

    parts = (ray.data.read_parquet(path, columns=["bytes"]).limit(100)
             .map_batches(partial, batch_format="pyarrow", batch_size=32)
             .to_pandas())
    total = np.zeros(32 ** 3, dtype=np.int64)
    for hrow in parts["hist"]:
        total += np.asarray(hrow, dtype=np.int64)
    pal = median_cut(total, n_colors=16)
    return pa.Table.from_pydict({
        "palette_idx": pa.array(np.arange(len(pal)), pa.int64()),
        "r": pa.array(pal[:, 0].astype(np.int64)),
        "g": pa.array(pal[:, 1].astype(np.int64)),
        "b": pa.array(pal[:, 2].astype(np.int64))})


def q51_hilbert_order(sf_dir):
    """Spatial-locality sort: Hilbert code of each image footprint center,
    global ds.sort — the FlatGeobuf packed-R-tree bulk-sort analogue."""
    import ray.data

    from .geo import cells as C
    from .geo.crs import lonlat_to_mercator
    from .ops.footprint import add_footprint
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def hilbert(t: pa.Table) -> pa.Table:
        cx = (np.asarray(t["xmin"]) + np.asarray(t["xmax"])) / 2
        cy = (np.asarray(t["ymin"]) + np.asarray(t["ymax"])) / 2
        E = 20037508.342789244
        order = 16
        n = 1 << order
        gx = np.clip(((cx + E) / (2 * E) * n), 0, n - 1).astype(np.int64)
        gy = np.clip(((E - cy) / (2 * E) * n), 0, n - 1).astype(np.int64)
        return pa.Table.from_pydict({
            "image_id": t["image_id"],
            "hilbert": pa.array(C.hilbert_d(order, gx, gy), pa.int64())})

    ds = (ray.data.read_parquet(path,
                                columns=["image_id", "w", "h", "crs", "gt"])
          .map_batches(lambda t: add_footprint(t, dst_crs=3857),
                       batch_format="pyarrow")
          .map_batches(hilbert, batch_format="pyarrow")
          .sort(["hilbert", "image_id"]))  # id tie-break: equal codes are
    # common for co-located footprints and must rank deterministically
    pdf = ds.to_pandas()
    pdf["rank"] = np.arange(len(pdf), dtype=np.int64)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def q52_resize_checksums(sf_dir):
    """`raster resize` to 48×48 per image (RIO bilinear) + checksum."""
    import ray.data

    from .io.codecs import decode
    from .kernels.checksum import checksum
    from .kernels.resample import copy_words_cast, resample_grid
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def resize(t: pa.Table) -> pa.Table:
        ids, cks = [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3 else px).astype(np.float64)
            h, w = band.shape
            sy, sx = np.mgrid[0:48, 0:48]
            sxf = (sx + 0.5) * (w / 48.0)
            syf = (sy + 0.5) * (h / 48.0)
            vals, ok = resample_grid(band, sxf, syf, "bilinear")
            small = copy_words_cast(vals, np.uint8)
            ids.append(t["image_id"][i].as_py())
            cks.append(checksum(small))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "checksum48": pa.array(cks, pa.int64())})

    return (ray.data.read_parquet(path, columns=["image_id", "bytes"])
            .limit(300)
            .map_batches(resize, batch_format="pyarrow", batch_size=64))


def q53_sieve_proximity(sf_dir):
    """sieve + proximity over rasterized rectangles (per-tile cleanup)."""
    import ray.data

    from .geo.wkb import box_polygon, polygon_wkb
    from .ops.fill import proximity, sieve
    from .ops.rasterize import rasterize_zones

    rects = _derived_rects()
    zones = pa.Table.from_pydict({
        "zone_id": pa.array([f"r{j}" for j in rects["rect_id"]]),
        "wkb": pa.array([polygon_wkb(box_polygon(*b))
                         for b in rects["bounds"]], pa.binary()),
        "pop": pa.array(list(range(1, 13)), pa.int64())})
    burned = rasterize_zones(ray.data.from_arrow(zones), z=5,
                             value_col="pop", merge="replace")

    def cleanup(t: pa.Table) -> pa.Table:
        out = {"cell": [], "n_nonzero": [], "sieved_nonzero": [],
               "mean_prox": []}
        for i in range(t.num_rows):
            a = np.frombuffer(t["data"][i].as_py(),
                              dtype=np.float64).reshape(256, 256)
            s = sieve(a.astype(np.int64), threshold=8)
            p = proximity(a, max_dist=64.0, nodata=64.0)
            out["cell"].append(t["cell"][i].as_py())
            out["n_nonzero"].append(int((a != 0).sum()))
            out["sieved_nonzero"].append(int((s != 0).sum()))
            out["mean_prox"].append(round(float(p.mean()), 4))
        return pa.Table.from_pydict({
            "cell": pa.array(out["cell"], pa.int64()),
            "n_nonzero": pa.array(out["n_nonzero"], pa.int64()),
            "sieved_nonzero": pa.array(out["sieved_nonzero"], pa.int64()),
            "mean_prox": pa.array(out["mean_prox"], pa.float64())})

    return burned.map_batches(cleanup, batch_format="pyarrow")


def q54_hillshade(sf_dir):
    """DEM hillshade/slope over per-image gray bands (Horn kernels)."""
    import ray.data

    from .io.codecs import decode
    from .kernels.checksum import checksum
    from .ops.raster_math import hillshade_gdal, slope_gdal
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)
    unit_gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)

    def dem(t: pa.Table) -> pa.Table:
        ids, hs_cks, max_slope = [], [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3 else px).astype(np.float64)
            # the published-checksum-validated gdaldem kernels
            hs = hillshade_gdal(band, unit_gt)
            sl = slope_gdal(band, unit_gt)
            sl = sl[1:-1, 1:-1]  # border is nodata by gdaldem convention
            ids.append(t["image_id"][i].as_py())
            hs_cks.append(checksum(hs))
            max_slope.append(round(float(sl.max()), 4))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "hillshade_cks": pa.array(hs_cks, pa.int64()),
            "max_slope": pa.array(max_slope, pa.float64())})

    return (ray.data.read_parquet(path, columns=["image_id", "bytes"])
            .limit(200)
            .map_batches(dem, batch_format="pyarrow", batch_size=64))




def q55_cell_partitioned_join(sf_dir):
    """Large×large spatial join WITHOUT broadcast: both sides flat-map to
    covering grid cells, one ``groupby(cell)`` joins co-located groups,
    PBSM reference-point dedup keeps each pair exactly once.

    Same semantics as q12 (point-in-rect), so the same SQL oracle applies
    — this query exists to exercise the shuffle join path end-to-end.
    """
    import ray.data

    from .ops.join import cell_cover_bbox

    Z = 4
    WINDOW = (-20.0, -10.0, 40.0, 50.0)

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: _derive_points(t, "c_custkey"), batch_format="pyarrow")

    def pt_bbox(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"],
            "xmin": t["x"], "ymin": t["y"], "xmax": t["x"], "ymax": t["y"]})

    pts_cells = pts.map_batches(pt_bbox, batch_format="pyarrow") \
        .map_batches(lambda t: cell_cover_bbox(
            t, Z, ["c_custkey", "xmin", "ymin"], planar_window=WINDOW),
            batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(
            ["c_custkey", "px", "py", "cell"]), batch_format="pyarrow")

    rects = _derived_rects()
    rt = pa.Table.from_pydict({
        "rect_id": pa.array(rects["rect_id"], pa.int64()),
        "xmin": pa.array([b[0] for b in rects["bounds"]], pa.float64()),
        "ymin": pa.array([b[1] for b in rects["bounds"]], pa.float64()),
        "xmax": pa.array([b[2] for b in rects["bounds"]], pa.float64()),
        "ymax": pa.array([b[3] for b in rects["bounds"]], pa.float64())})
    rect_cells = ray.data.from_arrow(rt).map_batches(
        lambda t: cell_cover_bbox(
            t, Z, ["rect_id", "xmin", "ymin", "xmax", "ymax"],
            planar_window=WINDOW),
        batch_format="pyarrow")

    # union the two sides with a discriminator column, join inside groups
    def tag_pts(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "cell": t["cell"], "side": pa.array(["p"] * n),
            "c_custkey": t["c_custkey"],
            "px": t["px"], "py": t["py"],
            "rect_id": pa.array([None] * n, pa.int64()),
            "xmin": pa.array([None] * n, pa.float64()),
            "ymin": pa.array([None] * n, pa.float64()),
            "xmax": pa.array([None] * n, pa.float64()),
            "ymax": pa.array([None] * n, pa.float64())})

    def tag_rects(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "cell": t["cell"], "side": pa.array(["r"] * n),
            "c_custkey": pa.array([None] * n, pa.int64()),
            "px": pa.array([None] * n, pa.float64()),
            "py": pa.array([None] * n, pa.float64()),
            "rect_id": t["rect_id"],
            "xmin": t["xmin"], "ymin": t["ymin"],
            "xmax": t["xmax"], "ymax": t["ymax"]})

    both = pts_cells.map_batches(tag_pts, batch_format="pyarrow").union(
        rect_cells.map_batches(tag_rects, batch_format="pyarrow"))

    def join_cell(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == "p"]
        r = g[g["side"] == "r"]
        if len(p) == 0 or len(r) == 0:
            return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                                 "rect_id": pd.Series([], dtype="int64")})
        # broadcast-compare points × rects within the cell group (no
        # per-rect Python loop; skewed cells stay vectorized).
        # PBSM dedup: a point lies in exactly one cell, so pairs are
        # already unique — the reference-point rule is trivially the
        # point's own cell (kept explicit for the bbox×bbox case).
        px = p["px"].values[:, None]
        py = p["py"].values[:, None]
        hit = ((px >= r["xmin"].values[None, :])
               & (px <= r["xmax"].values[None, :])
               & (py >= r["ymin"].values[None, :])
               & (py <= r["ymax"].values[None, :]))
        pi, ri = np.nonzero(hit)
        return pd.DataFrame({
            "c_custkey": pd.Series(p["c_custkey"].values[pi],
                                   dtype="int64"),
            "rect_id": pd.Series(r["rect_id"].values[ri], dtype="int64")})

    return both.groupby("cell").map_groups(join_cell, batch_format="pandas")




def q56_contour(sf_dir):
    """Marching-squares contours of per-image gray bands: total iso-line
    length + polyline count at two levels (rows-only)."""
    import ray.data

    from .io.codecs import decode
    from .ops.contour import chain_segments, contour_length, \
        contour_segments
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def per_image(t: pa.Table) -> pa.Table:
        out = {"image_id": [], "level": [], "iso_length": [], "n_lines": []}
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3 else px).astype(np.float64)
            for level in (64.0, 128.0):
                segs = contour_segments(band, level)
                out["image_id"].append(t["image_id"][i].as_py())
                out["level"].append(level)
                out["iso_length"].append(
                    round(contour_length(segs), 4))
                out["n_lines"].append(len(chain_segments(segs)))
        return pa.Table.from_pydict({
            "image_id": pa.array(out["image_id"], pa.string()),
            "level": pa.array(out["level"], pa.float64()),
            "iso_length": pa.array(out["iso_length"], pa.float64()),
            "n_lines": pa.array(out["n_lines"], pa.int64())})

    return (ray.data.read_parquet(path, columns=["image_id", "bytes"])
            .limit(100)
            .map_batches(per_image, batch_format="pyarrow", batch_size=32))




def q57_warp_kernels(sf_dir):
    """Warp a sample through every resampling kernel (near/bilinear/
    cubic/cubicspline/lanczos) — checksum fingerprints per kernel
    (rows-only; kernel formulas unit-tested against closed forms).
    ONE fused pass: decode each image once, warp 5× (WarpKernelsFanout
    — one Dataset execution per kernel re-decoded and re-spun pools
    for identical output)."""
    import ray.data

    from .ops.warp import WarpKernelsFanout
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)
    cols = ["image_id", "bytes", "crs", "gt"]
    return (ray.data.read_parquet(path, columns=cols).limit(60)
            .map_batches(WarpKernelsFanout,
                         fn_constructor_kwargs={"dst_crs": 3857},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=4))




def q58_having(sf_dir):
    """GROUP BY + HAVING (post-aggregation filter)."""
    from ray.data.aggregate import Count

    out = (_read(sf_dir, "orders", ["o_custkey"])
           .groupby("o_custkey").aggregate(Count(alias_name="n")))

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], pa.scalar(15)))
        return pa.Table.from_pydict({
            "o_custkey": t["o_custkey"].cast(pa.int64()),
            "n": t["n"].cast(pa.int64())})

    return out.map_batches(keep, batch_format="pyarrow")


SQL_Q58 = ("SELECT o_custkey, COUNT(*) AS n FROM orders "
           "GROUP BY o_custkey HAVING COUNT(*) >= 15")


def q59_semi_join_in(sf_dir):
    """IN-subquery semi-join via broadcast key set (top-value orders)."""
    import ray

    top = (_read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
           .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
           .limit(100).to_pandas())
    keys = set(top["o_orderkey"])
    ref = ray.put(keys)

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        ok = np.array([k in ks for k in np.asarray(t["l_orderkey"])],
                      dtype=bool)
        t = t.filter(pa.array(ok))
        return pa.Table.from_pydict({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "l_linenumber": t["l_linenumber"].cast(pa.int64()),
            "l_quantity": t["l_quantity"]})

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_quantity"]).map_batches(
        fn, batch_format="pyarrow")


SQL_Q59 = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
"""


def q60_case_buckets(sf_dir):
    """CASE WHEN bucketing + grouped aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        q = np.asarray(t["l_quantity"], dtype=np.float64)
        bucket = np.where(q < 10, "small",
                          np.where(q < 30, "medium", "large"))
        return pa.Table.from_pydict({
            "bucket": pa.array(bucket, pa.string()),
            "l_extendedprice": t["l_extendedprice"]})

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("bucket")
             .aggregate(Count(alias_name="n"),
                        Sum("l_extendedprice", alias_name="total")))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _cast_i64(_round_cols(tbl, {"total": 2}), ["n"])


SQL_Q60 = """
SELECT CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
FROM lineitem GROUP BY bucket
"""


def q61_group_median(sf_dir):
    """Per-group median (linear-interpolated, the SQL quantile_cont rule)."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "median_chars": [round_half_away(
                g["n_chars"].quantile(0.5, interpolation="linear"), 4)]})

    return ds.groupby("lang").map_groups(med, batch_format="pandas")


SQL_Q61 = ("SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 4) AS "
           "median_chars FROM documents GROUP BY lang")




def q62_halo_hillshade(sf_dir):
    """Seam-exact hillshade over rasterized-zone tiles via the halo
    exchange (rows-only; seam exactness proven in test_stencil.py)."""
    import ray.data

    from .geo.wkb import box_polygon, polygon_wkb
    from .kernels.checksum import checksum
    from .ops.raster_math import hillshade
    from .ops.rasterize import rasterize_zones
    from .ops.stencil import apply_with_halo

    rects = _derived_rects()
    zones = pa.Table.from_pydict({
        "zone_id": pa.array([f"r{j}" for j in rects["rect_id"]]),
        "wkb": pa.array([polygon_wkb(box_polygon(*b))
                         for b in rects["bounds"]], pa.binary()),
        "pop": pa.array(list(range(10, 130, 10)), pa.int64())})
    burned = rasterize_zones(ray.data.from_arrow(zones), z=6,
                             value_col="pop", merge="add")
    shaded = apply_with_halo(
        burned.select_columns(["cell", "data"]),
        lambda p: hillshade(p, 1.0, 1.0).astype(np.float64),
        tile_size=256, r=1)

    def fingerprint(t: pa.Table) -> pa.Table:
        cells_, cks = [], []
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(),
                                dtype=np.float64).reshape(256, 256)
            cells_.append(t["cell"][i].as_py())
            cks.append(checksum(arr.astype(np.uint8)))
        return pa.Table.from_pydict({
            "cell": pa.array(cells_, pa.int64()),
            "hillshade_cks": pa.array(cks, pa.int64())})

    return shaded.map_batches(fingerprint, batch_format="pyarrow")


# ---------------------------------------------------------------------------

def q63_shuffle_join(sf_dir):
    """Large×large shuffle equi-join: lineitem ⋈ orders on orderkey,
    BOTH sides unfiltered, no driver-side build — a distributed hash
    join (`Dataset.join`), per-partition Acero probe.  Emits one row per
    lineitem with the order's date fields (60k rows at sf0.01)."""
    import ray

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderpriority"])
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, cpus // 2))
    j = li.join(orders, "inner", nparts,
                on=("l_orderkey",), right_on=("o_orderkey",),
                aggregator_ray_remote_args={"num_cpus": 0.25})

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "l_extendedprice": t["l_extendedprice"],
            "o_totalprice": t["o_totalprice"],
            "o_orderpriority": t["o_orderpriority"]})

    return j.map_batches(project, batch_format="pyarrow")


SQL_Q63 = """
SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice,
       o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _algebra_rects():
    """Two deterministic SQL-expressible rect sets for layer algebra:
    40 subject rects × 12 pairwise-disjoint method rects, 43
    intersecting pairs."""
    j = np.arange(40)
    ax0 = -20.0 + (j * 7919) % 50
    ay0 = -10.0 + (j * 104729) % 50
    a = (j.astype(np.int64), ax0, ay0, ax0 + 10.0 + j % 5,
         ay0 + 8.0 + j % 7)
    k = np.arange(12)
    bx0 = -25.0 + (k * 4409) % 55
    by0 = -15.0 + (k * 8191) % 55
    b = (k.astype(np.int64), bx0, by0, bx0 + 6.0 + k % 4, by0 + 5.0 + k % 3)
    return a, b


_SQL_RECTS = """
a AS (SELECT j AS feat_id,
        -20 + (j * 7919) % 50 AS x0, -10 + (j * 104729) % 50 AS y0,
        -20 + (j * 7919) % 50 + 10 + j % 5 AS x1,
        -10 + (j * 104729) % 50 + 8 + j % 7 AS y1
      FROM (SELECT UNNEST(RANGE(0, 40)) AS j)),
b AS (SELECT k AS zone_id,
        -25 + (k * 4409) % 55 AS x0, -15 + (k * 8191) % 55 AS y0,
        -25 + (k * 4409) % 55 + 6 + k % 4 AS x1,
        -15 + (k * 8191) % 55 + 5 + k % 3 AS y1
      FROM (SELECT UNNEST(RANGE(0, 12)) AS k))
"""


def _rect_wkb_table(ids, x0, y0, x1, y1, id_name):
    from .geo.wkb import box_polygon, polygon_wkb

    return pa.Table.from_pydict({
        id_name: pa.array(ids, pa.int64()),
        "wkb": pa.array([polygon_wkb(box_polygon(a, b, c, d))
                         for a, b, c, d in zip(x0, y0, x1, y1)],
                        pa.binary())})


# --- concave + holed layer-algebra fixtures ------------------------------
# Subjects (30) and methods (18) cycle through L-shape / donut / rect on
# offset 40-unit grids; each layer is pairwise disjoint internally (so
# leftover areas are SQL-expressible by plain sums) while subjects and
# methods overlap heavily.  The SQL oracle sees each shape as its
# disjoint-rectangle decomposition; the engine clips the REAL concave /
# holed polygon through the general boolean kernel.

_SUBJ_PARTS = {  # kind -> disjoint rect decomposition (relative coords)
    0: [(0, 0, 14, 6), (0, 6, 6, 24)],                       # L-shape
    1: [(0, 0, 16, 5), (0, 11, 16, 16), (0, 5, 5, 11),
        (11, 5, 16, 11)],                                    # donut
    2: [(0, 0, 12, 10)],                                     # rect
}
_METH_PARTS = {
    0: [(0, 0, 26, 7), (0, 7, 7, 26)],
    1: [(0, 0, 20, 6), (0, 14, 20, 20), (0, 6, 6, 14), (14, 6, 20, 14)],
    2: [(0, 0, 22, 9)],
}


def _shape_rings(kind, parts, ox, oy):
    """The actual concave/holed polygon for a shape kind (NOT the rect
    decomposition — that is only the SQL oracle's view)."""
    if kind == 0:   # L-shape: concave hexagon
        w1, h1 = parts[0][2], parts[0][3]
        w2, h2 = parts[1][2], parts[1][3]
        ring = np.array([[0, 0], [w1, 0], [w1, h1], [w2, h1], [w2, h2],
                         [0, h2], [0, 0]], dtype=np.float64)
        return [ring + np.array([ox, oy])]
    if kind == 1:   # donut: outer ring + hole
        x1, y1 = parts[0][2], parts[1][3]
        hx0, hy0 = parts[2][2], parts[0][3]
        hx1, hy1 = parts[3][0], parts[1][1]
        outer = np.array([[0, 0], [x1, 0], [x1, y1], [0, y1], [0, 0]],
                         dtype=np.float64)
        hole = np.array([[hx0, hy0], [hx1, hy0], [hx1, hy1], [hx0, hy1],
                         [hx0, hy0]], dtype=np.float64)
        return [outer + np.array([ox, oy]), hole + np.array([ox, oy])]
    x1, y1 = parts[0][2], parts[0][3]
    ring = np.array([[0, 0], [x1, 0], [x1, y1], [0, y1], [0, 0]],
                    dtype=np.float64)
    return [ring + np.array([ox, oy])]


def _algebra_shape_tables():
    from .geo.wkb import polygon_wkb

    subs = []
    for i in range(30):
        ox = (i % 6) * 40 + (i * 7) % 9
        oy = (i // 6) * 40 + (i * 11) % 9
        subs.append(polygon_wkb(_shape_rings(i % 3, _SUBJ_PARTS[i % 3],
                                             ox, oy)))
    meths = []
    for k in range(18):
        ox = (k % 6) * 40 - 6 + (k * 5) % 7
        oy = (k // 6) * 40 - 6 + (k * 13) % 11
        meths.append(polygon_wkb(_shape_rings(k % 3, _METH_PARTS[k % 3],
                                              ox, oy)))
    subj = pa.Table.from_pydict({
        "feat_id": pa.array(np.arange(30), pa.int64()),
        "wkb": pa.array(subs, pa.binary())})
    meth = pa.Table.from_pydict({
        "zone_id": pa.array(np.arange(18), pa.int64()),
        "wkb": pa.array(meths, pa.binary())})
    return subj, meth


def _parts_values(parts_by_kind):
    rows = []
    for t, parts in parts_by_kind.items():
        for (a, b, c, d) in parts:
            rows.append(f"({t}, {a}, {b}, {c}, {d})")
    return ", ".join(rows)


_SQL_SHAPES = f"""
sparts(t, sx0, sy0, sx1, sy1) AS (VALUES {_parts_values(_SUBJ_PARTS)}),
mparts(t, sx0, sy0, sx1, sy1) AS (VALUES {_parts_values(_METH_PARTS)}),
s AS (SELECT i AS feat_id,
        (i % 6) * 40 + (i * 7) % 9 + sx0 AS x0,
        (i // 6) * 40 + (i * 11) % 9 + sy0 AS y0,
        (i % 6) * 40 + (i * 7) % 9 + sx1 AS x1,
        (i // 6) * 40 + (i * 11) % 9 + sy1 AS y1
      FROM (SELECT UNNEST(RANGE(0, 30)) AS i)
      JOIN sparts ON sparts.t = i % 3),
m AS (SELECT k AS zone_id,
        (k % 6) * 40 - 6 + (k * 5) % 7 + sx0 AS x0,
        (k // 6) * 40 - 6 + (k * 13) % 11 + sy0 AS y0,
        (k % 6) * 40 - 6 + (k * 5) % 7 + sx1 AS x1,
        (k // 6) * 40 - 6 + (k * 13) % 11 + sy1 AS y1
      FROM (SELECT UNNEST(RANGE(0, 18)) AS k)
      JOIN mparts ON mparts.t = k % 3)
"""

_SQL_OVERLAP = ("GREATEST(LEAST(s.x1, m.x1) - GREATEST(s.x0, m.x0), 0)"
                " * GREATEST(LEAST(s.y1, m.y1) - GREATEST(s.y0, m.y0), 0)")


def q64_intersection_area(sf_dir):
    """Layer-algebra Intersection with GEOMETRY outputs on CONCAVE and
    HOLED features (ogrlayer.cpp:3345 semantics) via the general
    polygon boolean engine.  Oracle: per-pair sums of the shapes'
    disjoint-rectangle decompositions' overlaps."""
    import ray.data

    from .ops.layer_algebra import layer_intersection

    subj, meth = _algebra_shape_tables()
    out = layer_intersection(ray.data.from_arrow(subj), meth)

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "feat_id": t["feat_id"], "zone_id": t["zone_id"],
            "area": pa.array(round_half_away(np.asarray(t["area"]), 6),
                             pa.float64())})

    return out.map_batches(proj, batch_format="pyarrow")


SQL_Q64 = f"""
WITH {_SQL_SHAPES},
ov AS (SELECT s.feat_id, m.zone_id, SUM({_SQL_OVERLAP}) AS a
       FROM s CROSS JOIN m GROUP BY 1, 2)
SELECT feat_id, zone_id, ROUND(a, 6) AS area FROM ov WHERE a > 1e-9
"""


def q65_erase_area(sf_dir):
    """Layer-algebra Erase on concave/holed features: each subject minus
    the union of the method layer (incremental general-boolean
    subtraction).  Oracle: subject area minus summed overlaps (both
    layers are internally pairwise disjoint by construction)."""
    import ray.data

    from .ops.layer_algebra import layer_erase

    subj, meth = _algebra_shape_tables()
    out = layer_erase(ray.data.from_arrow(subj), meth)

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "feat_id": t["feat_id"],
            "area": pa.array(round_half_away(np.asarray(t["area"]), 6),
                             pa.float64())})

    return out.map_batches(proj, batch_format="pyarrow")


SQL_Q65 = f"""
WITH {_SQL_SHAPES},
tot AS (SELECT feat_id, SUM((x1 - x0) * (y1 - y0)) AS a
        FROM s GROUP BY 1),
cut AS (SELECT s.feat_id, SUM({_SQL_OVERLAP}) AS r
        FROM s CROSS JOIN m GROUP BY 1)
SELECT t.feat_id, ROUND(t.a - COALESCE(c.r, 0), 6) AS area
FROM tot t LEFT JOIN cut c USING (feat_id)
WHERE t.a - COALESCE(c.r, 0) > 1e-9
"""


def q68_asof_shuffle(sf_dir):
    """Distributed as-of join — the LARGE-build-side path for q25's
    semantics: both sides hash-co-partitioned on the key (tagged union +
    one groupby), per-key vectorized searchsorted inside the group.  No
    driver-side build of any size; the broadcast variant (q25) remains
    the fast path when the build side is filtered-small."""
    import pandas as pd

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_orders(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        return pa.Table.from_pydict({
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "ts": pc.cast(ts, pa.int64()),
            "pid": pc.cast(t["o_orderkey"], pa.int64()),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8))})

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag_events(t: pa.Table) -> pa.Table:
        key = pc.cast(
            pc.subtract(t["user_id"],
                        pc.multiply(pc.divide(t["user_id"],
                                              pa.scalar(1500)),
                                    pa.scalar(1500))), pa.int64())
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.Table.from_pydict({
            "key": key, "ts": ts,
            "pid": pc.cast(t["event_id"], pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8))})

    both = (orders.map_batches(tag_orders, batch_format="pyarrow")
            .union(events.map_batches(tag_events, batch_format="pyarrow")))

    def asof_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        empty = pa.Table.from_pydict({
            "event_id": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64())})
        if len(left) == 0:
            return empty
        if len(right) == 0:
            return pa.Table.from_pydict({
                "event_id": pa.array(left["pid"].to_numpy(), pa.int64()),
                "o_orderkey": pa.array([None] * len(left), pa.int64())})
        # latest orderkey per date (deterministic; matches the oracle's
        # MAX(o_orderkey) GROUP BY custkey, date)
        r = right.sort_values(["ts", "pid"]).groupby(
            "ts", as_index=False).last()
        rts = r["ts"].to_numpy()
        rid = r["pid"].to_numpy()
        pos = np.searchsorted(rts, left["ts"].to_numpy(),
                              side="right") - 1
        ok = pos >= 0
        vals = np.full(len(left), -1, dtype=np.int64)
        vals[ok] = rid[pos[ok]]
        return pa.Table.from_pydict({
            "event_id": pa.array(left["pid"].to_numpy(), pa.int64()),
            "o_orderkey": pa.array(
                [int(v) if v >= 0 else None for v in vals], pa.int64())})

    return both.groupby("key").map_groups(asof_group,
                                          batch_format="pandas")


def q66_makevalid_split(sf_dir):
    """MakeValid on self-intersecting bow-tie rings: each splits into two
    simple loops whose areas (w*h/4 each) the SQL oracle derives
    arithmetically.  Engine path: WKB parse → make_valid_ring loop
    extraction → shoelace area."""
    import ray.data

    from .geo.wkb import polygon_area, polygon_wkb
    from .ops.vector import make_valid_ring

    j = np.arange(20)
    w = 2.0 + j % 5
    h = 1.0 + j % 7
    rings = [np.array([[0, 0], [wi, hi], [wi, 0], [0, hi], [0, 0]],
                      dtype=np.float64) + np.array([3.0 * i, 2.0 * i])
             for i, (wi, hi) in enumerate(zip(w, h))]
    tbl = pa.Table.from_pydict({
        "feat_id": pa.array(j, pa.int64()),
        "wkb": pa.array([polygon_wkb([r]) for r in rings], pa.binary())})

    from .geo.wkb import polygons_from_wkb

    def split(t: pa.Table) -> pa.Table:
        out = {"feat_id": [], "loop": [], "area": []}
        for i, blob in enumerate(t["wkb"].to_pylist()):
            ring = polygons_from_wkb(blob)[0][0]
            loops = make_valid_ring(ring)
            for li, lp in enumerate(sorted(
                    loops, key=lambda r: (r[:, 1].min(), r[:, 0].min()))):
                out["feat_id"].append(t["feat_id"][i].as_py())
                out["loop"].append(li)
                out["area"].append(
                    float(round_half_away(abs(polygon_area([lp])), 6)))
        return pa.Table.from_pydict({
            "feat_id": pa.array(out["feat_id"], pa.int64()),
            "loop": pa.array(out["loop"], pa.int64()),
            "area": pa.array(out["area"], pa.float64())})

    return ray.data.from_arrow(tbl).map_batches(split,
                                                batch_format="pyarrow")


SQL_Q66 = """
WITH f AS (SELECT j AS feat_id, 2 + j % 5 AS w, 1 + j % 7 AS h
           FROM (SELECT UNNEST(RANGE(0, 20)) AS j))
SELECT feat_id, CAST(loop AS BIGINT) AS loop, ROUND(w * h / 4.0, 6) AS area
FROM f CROSS JOIN (SELECT UNNEST([0, 1]) AS loop)
"""


def q67_grid_tin(sf_dir):
    """gdal_grid linear (TIN/Delaunay) interpolation of supplier points;
    rows-only (pytest carries the exactness oracle on linear fields)."""
    import ray
    import ray.data

    from .ops.grid import GridInterpolate
    from .ops.join import build_cell_points

    sup = (_read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
           .map_batches(lambda t: _derive_points(t, "s_suppkey")
                        .append_column("v", t["s_acctbal"]),
                        batch_format="pyarrow").to_pandas())
    index = build_cell_points(sup["v"].values, sup["x"].values,
                              sup["y"].values, z=4,
                              window=(-20.0, -10.0, 40.0, 50.0))
    idx_ref = ray.put(index)
    tiles = pa.Table.from_pydict({
        "tile_id": pa.array(np.arange(4), pa.int64()),
        "x0": pa.array([-20.0 + 30 * (i % 2) for i in range(4)]),
        "y0": pa.array([-10.0 + 30 * (i // 2) for i in range(4)]),
        "x1": pa.array([10.0 + 30 * (i % 2) for i in range(4)]),
        "y1": pa.array([20.0 + 30 * (i // 2) for i in range(4)])})
    out = ray.data.from_arrow(tiles).map_batches(
        GridInterpolate,
        fn_constructor_kwargs={"index_ref": idx_ref, "algorithm": "linear",
                               "w": 32, "h": 32, "radius": 25.0},
        batch_format="pyarrow", concurrency=2)

    def summarize(t: pa.Table) -> pa.Table:
        rows = {"tile_id": [], "n_filled": [], "mean_val": []}
        for i in range(t.num_rows):
            arr = np.frombuffer(t["data"][i].as_py(),
                                dtype=np.float64).reshape(32, 32)
            filled = arr != 0.0
            rows["tile_id"].append(t["tile_id"][i].as_py())
            rows["n_filled"].append(int(filled.sum()))
            rows["mean_val"].append(
                float(arr[filled].mean()) if filled.any() else 0.0)
        return pa.Table.from_pydict({
            "tile_id": pa.array(rows["tile_id"], pa.int64()),
            "n_filled": pa.array(rows["n_filled"], pa.int64()),
            "mean_val": pa.array(rows["mean_val"], pa.float64())})

    return out.map_batches(summarize, batch_format="pyarrow")


def _union_family_proj(out):
    """(feat_id?, zone_id?, area) rows → (src, feat_id, zone_id, area)
    with -1 sentinels for the absent side ('P' pair / 'S' subject
    leftover / 'M' method leftover)."""

    def proj(t: pa.Table) -> pa.Table:
        f = np.asarray(pc.fill_null(t["feat_id"], -1))
        z = np.asarray(pc.fill_null(t["zone_id"], -1))
        src = np.where(f < 0, "M", np.where(z < 0, "S", "P"))
        return pa.Table.from_pydict({
            "src": pa.array(src.tolist(), pa.string()),
            "feat_id": pa.array(f, pa.int64()),
            "zone_id": pa.array(z, pa.int64()),
            "area": pa.array(round_half_away(np.asarray(t["area"]), 6),
                             pa.float64())})

    return out.map_batches(proj, batch_format="pyarrow")


def q69_union_area(sf_dir):
    """Full ogrlayer Union (``ogrlayer.cpp:3763``) on concave/holed
    features: intersection pairs + subject leftovers + method leftovers,
    each row tagged by kind with -1 for the absent side's id."""
    import ray.data

    from .ops.layer_algebra import layer_union

    subj, meth = _algebra_shape_tables()
    return _union_family_proj(layer_union(ray.data.from_arrow(subj),
                                          meth))


_SQL_UNION_PARTS = f"""
ov AS (SELECT s.feat_id, m.zone_id, SUM({_SQL_OVERLAP}) AS a
       FROM s CROSS JOIN m GROUP BY 1, 2),
stot AS (SELECT feat_id, SUM((x1 - x0) * (y1 - y0)) AS a
         FROM s GROUP BY 1),
mtot AS (SELECT zone_id, SUM((x1 - x0) * (y1 - y0)) AS a
         FROM m GROUP BY 1),
sleft AS (SELECT t.feat_id, t.a - COALESCE(SUM(o.a), 0) AS a
          FROM stot t LEFT JOIN ov o USING (feat_id) GROUP BY 1, t.a),
mleft AS (SELECT t.zone_id, t.a - COALESCE(SUM(o.a), 0) AS a
          FROM mtot t LEFT JOIN ov o USING (zone_id) GROUP BY 1, t.a)
"""


SQL_Q69 = f"""
WITH {_SQL_SHAPES},
{_SQL_UNION_PARTS}
SELECT 'P' AS src, feat_id, zone_id, ROUND(a, 6) AS area
FROM ov WHERE a > 1e-9
UNION ALL
SELECT 'S', feat_id, -1, ROUND(a, 6) FROM sleft WHERE a > 1e-9
UNION ALL
SELECT 'M', -1, zone_id, ROUND(a, 6) FROM mleft WHERE a > 1e-9
"""


def q26_layer_symdiff(sf_dir):
    """ogrlayer SymDifference (``ogrlayer.cpp:3948``) on concave/holed
    features: subject-minus-method + method-minus-subject leftovers."""
    import ray.data

    from .ops.layer_algebra import layer_symdifference

    subj, meth = _algebra_shape_tables()
    return _union_family_proj(
        layer_symdifference(ray.data.from_arrow(subj), meth))


SQL_Q26 = f"""
WITH {_SQL_SHAPES},
{_SQL_UNION_PARTS}
SELECT 'S' AS src, feat_id, -1 AS zone_id, ROUND(a, 6) AS area
FROM sleft WHERE a > 1e-9
UNION ALL
SELECT 'M', -1, zone_id, ROUND(a, 6) FROM mleft WHERE a > 1e-9
"""


def q27_layer_identity(sf_dir):
    """ogrlayer Identity (``ogrlayer.cpp:4118``): intersection pairs +
    subject leftovers — output covers exactly the input layer."""
    import ray.data

    from .ops.layer_algebra import layer_identity

    subj, meth = _algebra_shape_tables()
    return _union_family_proj(
        layer_identity(ray.data.from_arrow(subj), meth))


SQL_Q27 = f"""
WITH {_SQL_SHAPES},
{_SQL_UNION_PARTS}
SELECT 'P' AS src, feat_id, zone_id, ROUND(a, 6) AS area
FROM ov WHERE a > 1e-9
UNION ALL
SELECT 'S', feat_id, -1, ROUND(a, 6) FROM sleft WHERE a > 1e-9
"""


def q70_rect_distance(sf_dir):
    """Geometry Distance scalar (OGR Distance semantics, GEOS-free):
    min distance per NON-intersecting (feat, zone) rect pair through the
    generic polygon-distance kernel.  Oracle: hypot of axis gaps."""
    import ray.data

    from .geo.wkb import polygon_distance, polygons_from_wkb

    (aj, ax0, ay0, ax1, ay1), (bk, bx0, by0, bx1, by1) = _algebra_rects()
    a_tbl = _rect_wkb_table(aj, ax0, ay0, ax1, ay1, "feat_id")
    b_tbl = _rect_wkb_table(bk, bx0, by0, bx1, by1, "zone_id")
    b_rings = [polygons_from_wkb(w)[0] for w in b_tbl["wkb"].to_pylist()]

    def dist_rows(t: pa.Table) -> pa.Table:
        out = {"feat_id": [], "zone_id": [], "dist": []}
        for i, blob in enumerate(t["wkb"].to_pylist()):
            a_rings = polygons_from_wkb(blob)[0]
            for k in range(len(b_rings)):
                d = polygon_distance(a_rings, b_rings[k])
                if d <= 0.0:
                    continue  # intersecting pairs are q64's domain
                out["feat_id"].append(t["feat_id"][i].as_py())
                out["zone_id"].append(int(bk[k]))
                out["dist"].append(float(round_half_away(d, 6)))
        return pa.Table.from_pydict({
            "feat_id": pa.array(out["feat_id"], pa.int64()),
            "zone_id": pa.array(out["zone_id"], pa.int64()),
            "dist": pa.array(out["dist"], pa.float64())})

    return ray.data.from_arrow(a_tbl).map_batches(dist_rows,
                                                  batch_format="pyarrow")


SQL_Q70 = f"""
WITH {_SQL_RECTS}
SELECT a.feat_id, b.zone_id,
       ROUND(SQRT(POWER(GREATEST(GREATEST(a.x0, b.x0)
                                 - LEAST(a.x1, b.x1), 0), 2)
                  + POWER(GREATEST(GREATEST(a.y0, b.y0)
                                   - LEAST(a.y1, b.y1), 0), 2)), 6) AS dist
FROM a CROSS JOIN b
WHERE NOT (LEAST(a.x1, b.x1) >= GREATEST(a.x0, b.x0)
           AND LEAST(a.y1, b.y1) >= GREATEST(a.y0, b.y0))
"""


def q71_ann_ivf(sf_dir):
    """IVF-Flat ANN over the embeddings table (coarse k-means quantizer
    + inverted-list probing) — the second ANN scale path next to LSH;
    rows-only (pytest carries the recall-vs-brute-force oracle)."""
    from .ops.ann import embeddings_matrix, ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    first = pa.concat_tables(
        b for b in ds.limit(8).iter_batches(batch_format="pyarrow",
                                            batch_size=8))
    queries = embeddings_matrix(first)
    out = ivf_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                   queries, k=5, n_clusters=16, nprobe=4)
    pdf = out.to_pandas()[["query_idx", "rank", "vec_id", "score"]]
    pdf["score"] = round_half_away(pdf["score"], 6)
    return _cast_i64(pa.Table.from_pandas(pdf, preserve_index=False),
                     ["query_idx", "rank", "vec_id"])


def q72_geometry_scalars(sf_dir):
    """UnaryUnion + ConcaveHull + SimplifyPreserveTopology through a
    Dataset stage (ogrgeometry.cpp:5227/:4305/:6419): supplier-derived
    points grouped into spatial buckets; per group the concave-hull
    area (ratio 0.5), its topology-preserving simplification vertex
    count, and the unary-union area of per-point boxes.  Rows-only
    (pytest carries closed-form oracles for each kernel)."""
    import pandas as pd

    from .geo.clip import ring_area
    from .geo.wkb import box_polygon, polygon_wkb
    from .ops.vector import (concave_hull, simplify_preserve_topology,
                             unary_union_wkb)

    pts = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda t: _derive_points(t, "s_suppkey"), batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        k = np.asarray(t["s_suppkey"], dtype=np.int64)
        return t.append_column("bucket", pa.array(k % 4, pa.int64()))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        xy = np.stack([g["x"].to_numpy(), g["y"].to_numpy()], 1)
        if len(xy) < 3:
            return pd.DataFrame({
                "bucket": pd.Series([], dtype="int64"),
                "hull_area": pd.Series([], dtype="float64"),
                "simplified_pts": pd.Series([], dtype="int64"),
                "union_area": pd.Series([], dtype="float64")})
        ring = concave_hull(xy, ratio=0.5)
        simp = simplify_preserve_topology(ring, 0.5)
        blobs = [polygon_wkb(box_polygon(x - 0.4, y - 0.4,
                                         x + 0.4, y + 0.4))
                 for x, y in xy[:64]]
        _, uarea = unary_union_wkb(blobs)
        return pd.DataFrame({
            "bucket": [int(g["bucket"].iloc[0])],
            "hull_area": [float(round_half_away(abs(ring_area(ring)),
                                                4))],
            "simplified_pts": [int(len(simp))],
            "union_area": [float(round_half_away(uarea, 4))]})

    return (pts.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_group,
                                          batch_format="pandas"))


def q73_viewshed(sf_dir):
    """Viewshed batch (alg/viewshed Wang-Robinson-White sweep, validated
    against the reference's published expected grids in pytest): one
    deterministic DEM broadcast to an actor pool, observers derived from
    supplier keys, per-observer visible-cell counts.  Rows-only."""
    import ray

    from .ops.viewshed import ViewshedActor

    gx, gy = np.meshgrid(np.arange(96), np.arange(96))
    dem = (20.0 * np.sin(gx / 9.0) * np.cos(gy / 7.0)
           + 0.15 * gx + 0.1 * gy)
    dem_ref = ray.put(dem)

    def observers(t: pa.Table) -> pa.Table:
        k = np.asarray(t["s_suppkey"], dtype=np.int64)
        return pa.Table.from_pydict({
            "observer_id": pa.array(k, pa.int64()),
            "px": pa.array((k * 37) % 96, pa.int64()),
            "py": pa.array((k * 53) % 96, pa.int64()),
            "height": pa.array(np.full(len(k), 3.0), pa.float64())})

    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(observers, batch_format="pyarrow")
            .map_batches(ViewshedActor,
                         fn_constructor_kwargs={"dem_ref": dem_ref,
                                                "max_distance": 40.0},
                         batch_format="pyarrow", concurrency=2,
                         batch_size=32))


def q75_geojson_csv_pip(sf_dir):
    """q38's PIP join with BOTH side tables detoured through the text
    vector drivers: zones serialize to GeoJSON and read back
    (io/geojson.py — WKB byte-fidelity is what makes the oracle still
    match), points serialize to CSV with a WKT geometry column and read
    back (io/csv.py + io/wkt.py).  Same oracle as q38, so any precision
    or field loss in either codec breaks the hash match."""
    import ray
    import ray.data

    from .io.csv import read_csv_features, write_csv_features
    from .io.geojson import read_geojson, write_geojson
    from .io.images import make_points_table, make_zones_table
    from .ops.join import PIPJoinZones, ZoneIndex

    from .geo.wkb import parse_wkb, point_wkb
    from .pipelines import _CACHE_ROOT

    zones_rt = read_geojson(write_geojson(make_zones_table(200),
                                          fid_col="__none__"))
    zones_rt = zones_rt.drop_columns(["fid"])
    pts_tbl = make_points_table(2000)
    # attach point geometry so the CSV writer emits a WKT column, then
    # REDERIVE x/y from the parsed WKT on the way back — the text codec
    # is load-bearing for the oracle match, not just along for the ride
    pts_tbl = pts_tbl.append_column(
        "wkb", pa.array([point_wkb(x, y) for x, y in
                         zip(pts_tbl["x"].to_pylist(),
                             pts_tbl["y"].to_pylist())], pa.binary()))
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = os.path.join(_CACHE_ROOT, "q75_points.csv")
    write_csv_features(pts_tbl.drop_columns(["x", "y"]), tmp,
                       write_csvt=True, wkt_precision=17)
    pts_rt = read_csv_features(tmp)
    xy = [parse_wkb(b)[1][0] for b in pts_rt["wkb"].to_pylist()]
    pts_rt = pts_rt.drop_columns(["wkb"])
    pts_rt = pts_rt.append_column(
        "x", pa.array([float(p[0]) for p in xy], pa.float64()))
    pts_rt = pts_rt.append_column(
        "y", pa.array([float(p[1]) for p in xy], pa.float64()))
    zi_ref = ray.put(ZoneIndex(zones_rt))
    pts = ray.data.from_arrow(pts_rt)
    return pts.map_batches(
        PIPJoinZones, fn_constructor_kwargs={"zones_ref": zi_ref,
                                             "emit": "intersects"},
        batch_format="pyarrow", concurrency=2)


def q74_cutline_counts(sf_dir):
    """Warp-cutline mask counts: each image gets a deterministic
    pixel-space rectangle cutline (fractions of w/h with non-half-integer
    offsets so the polyInts floor(x+0.5) rounding is untied); emits the
    count of surviving pixels.  The SQL oracle reproduces the even-odd
    scanline fill in closed form: columns ``floor(x0+0.5) ..
    floor(x1+0.5)-1`` clamped to the image, rows with center in
    ``[y0, y1)`` (alg/llrasterize.cpp:58,137 semantics through
    ops/cutline.py)."""
    import ray.data

    from .ops.cutline import cutline_density_mask
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def counts(t: pa.Table) -> pa.Table:
        ids, nv = [], []
        for i in range(t.num_rows):
            w = t["w"][i].as_py()
            h = t["h"][i].as_py()
            x0, x1 = 0.21 * w + 0.137, 0.83 * w - 0.291
            y0, y1 = 0.18 * h + 0.253, 0.87 * h - 0.173
            ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1],
                             [x0, y0]])
            mask = cutline_density_mask([ring], w, h)
            ids.append(t["image_id"][i].as_py())
            nv.append(int(np.count_nonzero(mask)))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "n_valid": pa.array(nv, pa.int64())})

    return (ray.data.read_parquet(path, columns=["image_id", "w", "h"])
            .map_batches(counts, batch_format="pyarrow"))


def _build_sql_q74(glob):
    return f"""WITH px AS (
  SELECT image_id, w, h,
         0.21 * w + 0.137 AS x0, 0.83 * w - 0.291 AS x1,
         0.18 * h + 0.253 AS y0, 0.87 * h - 0.173 AS y1
  FROM read_parquet('{glob}')),
cr AS (
  SELECT image_id,
    GREATEST(CAST(floor(x0 + 0.5) AS BIGINT), 0) AS c0,
    LEAST(CAST(floor(x1 + 0.5) AS BIGINT) - 1, w - 1) AS c1,
    GREATEST(CAST(ceil(y0 - 0.5) AS BIGINT), 0) AS r0,
    LEAST(CAST(ceil(y1 - 0.5) AS BIGINT) - 1, h - 1) AS r1
  FROM px)
SELECT image_id,
       GREATEST(c1 - c0 + 1, 0) * GREATEST(r1 - r0 + 1, 0) AS n_valid
FROM cr
"""


SQL_Q74 = None if _Q37_GLOB is None else _build_sql_q74(_Q37_GLOB)


# ---------------------------------------------------------------------------
# q76: layer-algebra Clip against an OVERLAPPING method layer.
# OGR Clip semantics are input ∩ UNION(method) (ogrlayer.cpp:3567);
# clip_batch carves pieces from the not-yet-clipped remainder so
# overlapping method features must NOT double-count.  The oracle computes
# |S ∩ (M1 ∪ M2 ∪ M3)| closed-form by inclusion-exclusion over the three
# deliberately-overlapping axis-aligned method rects per site (rect
# intersections of rects stay rects).

def _q76_tables():
    """24 subject rects on a 40-unit site grid; per site THREE method
    rects that pairwise (and often triply) overlap.  All geometry stays
    within [0, 20]² of its site origin so sites never interact."""
    subs, meths = [], []
    for i in range(24):
        sx, sy = (i % 6) * 40, (i // 6) * 40
        j = (i * 7) % 5
        subs.append((i, sx + j, sy + j, sx + j + 14, sy + j + 14))
        a, b = (i * 3) % 4, (i * 5) % 7
        meths.append((3 * i + 0, sx + a, sy, sx + a + 9, sy + 20))
        meths.append((3 * i + 1, sx + a + 5, sy + 2, sx + a + 13, sy + 19))
        meths.append((3 * i + 2, sx, sy + b, sx + 20, sy + b + 6))
    return subs, meths


def _q76_arrow_tables():
    from .geo.wkb import polygon_wkb

    subs, meths = _q76_tables()

    def rect_wkb(x0, y0, x1, y1):
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                        dtype=np.float64)
        return polygon_wkb([ring])

    subj = pa.Table.from_pydict({
        "feat_id": pa.array([s[0] for s in subs], pa.int64()),
        "wkb": pa.array([rect_wkb(*s[1:]) for s in subs], pa.binary())})
    meth = pa.Table.from_pydict({
        "zone_id": pa.array([m[0] for m in meths], pa.int64()),
        "wkb": pa.array([rect_wkb(*m[1:]) for m in meths], pa.binary())})
    return subj, meth


def q76_clip_overlap_area(sf_dir):
    """Clip with an overlapping method layer — input ∩ UNION(method),
    no double-counting (ogrlayer.cpp:3567; VERDICT r3 'What's wrong' #1).
    Oracle: exact inclusion-exclusion over each site's method triple."""
    import ray.data

    from .ops.layer_algebra import layer_clip

    subj, meth = _q76_arrow_tables()
    out = layer_clip(ray.data.from_arrow(subj), meth)

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "feat_id": t["feat_id"],
            "area": pa.array(round_half_away(np.asarray(t["area"]), 6),
                             pa.float64())})

    return out.map_batches(proj, batch_format="pyarrow")


def _build_sql_q76():
    subs, meths = _q76_tables()
    svals = ", ".join(f"({i}, {x0}, {y0}, {x1}, {y1})"
                      for (i, x0, y0, x1, y1) in subs)
    # pivot the method triples wide: one row per site
    mrows = []
    for i in range(24):
        m1, m2, m3 = meths[3 * i], meths[3 * i + 1], meths[3 * i + 2]
        mrows.append(f"({i}, " + ", ".join(
            f"{v}" for m in (m1, m2, m3) for v in m[1:]) + ")")
    mvals = ", ".join(mrows)

    def ov(*rects):
        xs0 = ", ".join(f"{r}x0" for r in rects)
        ys0 = ", ".join(f"{r}y0" for r in rects)
        xs1 = ", ".join(f"{r}x1" for r in rects)
        ys1 = ", ".join(f"{r}y1" for r in rects)
        return (f"GREATEST(LEAST(s.x1, {xs1}) - GREATEST(s.x0, {xs0}), 0)"
                f" * GREATEST(LEAST(s.y1, {ys1}) - GREATEST(s.y0, {ys0}),"
                " 0)")

    expr = (f"{ov('a')} + {ov('b')} + {ov('c')}"
            f" - {ov('a', 'b')} - {ov('a', 'c')} - {ov('b', 'c')}"
            f" + {ov('a', 'b', 'c')}")
    return f"""
WITH s(feat_id, x0, y0, x1, y1) AS (VALUES {svals}),
m(feat_id, ax0, ay0, ax1, ay1, bx0, by0, bx1, by1,
  cx0, cy0, cx1, cy1) AS (VALUES {mvals})
SELECT CAST(s.feat_id AS BIGINT) AS feat_id,
       ROUND(CAST({expr} AS DOUBLE), 6) AS area
FROM s JOIN m USING (feat_id)
WHERE {expr} > 0
"""


SQL_Q76 = _build_sql_q76()


def q77_audio_features(sf_dir):
    """Audio feature stats over REAL RIFF/WAVE payloads.

    The fixture table carries WAV bytes (bit depth cycles 16/8/24/32,
    every 4th clip stereo) plus the ground-truth decoded samples as a
    ``list<double>`` column.  The Ray side reads ONLY (clip_id, audio),
    decodes through the from-scratch RIFF reader inside the
    ``AudioFeatures`` actor pool, and emits (duration, rms,
    zero-crossings); the oracle recomputes the same stats in SQL from
    the stored samples — so any container-parse bug (24-bit sign
    extension, EXTENSIBLE GUIDs, stereo interleave) breaks parity."""
    import ray.data

    from .ops.multimodal import AudioFeatures
    from .pipelines import ensure_audio_parquet

    path = ensure_audio_parquet(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "clip_id": t["clip_id"],
            "duration_sec": pa.array(round_half_away(
                np.asarray(t["duration_sec"]), 7), pa.float64()),
            "rms": pa.array(round_half_away(
                np.asarray(t["rms"]), 7), pa.float64()),
            "zero_crossings": t["zero_crossings"]})

    return (ray.data.read_parquet(path, columns=["clip_id", "audio"])
            .map_batches(AudioFeatures, batch_format="pyarrow",
                         concurrency=4, batch_size=64)
            .map_batches(proj, batch_format="pyarrow"))


def _audio_cache_glob_sf001():
    from .pipelines import _CACHE_ROOT, audio_count_for_sf

    try:
        n = audio_count_for_sf("/root/testdata/sf0.01")
    except Exception:
        return None
    return os.path.join(_CACHE_ROOT, f"audio_v3_{n}", "*.parquet")


_Q77_GLOB = _audio_cache_glob_sf001()
# parallel unnests zip positionally in DuckDB; lag() restores sample
# adjacency per clip for the zero-crossing count (same np.signbit
# convention: "negative" = v < 0)
SQL_Q77 = None if _Q77_GLOB is None else f"""
WITH u AS (
  SELECT clip_id, rate, n_samples,
         unnest(samples) AS v,
         unnest(generate_series(1, len(samples))) AS i
  FROM read_parquet('{_Q77_GLOB}')),
lagd AS (
  SELECT clip_id, rate, n_samples, v,
         lag(v) OVER (PARTITION BY clip_id ORDER BY i) AS pv
  FROM u)
SELECT clip_id,
       ROUND(any_value(n_samples) / CAST(any_value(rate) AS DOUBLE), 7)
         AS duration_sec,
       ROUND(sqrt(avg(v * v)), 7) AS rms,
       CAST(sum(CASE WHEN pv IS NOT NULL AND ((v < 0) != (pv < 0))
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM lagd GROUP BY clip_id
"""


def _ensure_fgb_fixture(sf_dir):
    """Deterministic rect-feature fixture: one parquet (oracle side) +
    one .fgb written from it through write_flatgeobuf (Ray side).
    Returns (fgb_path, parquet_glob, n)."""
    import pyarrow.parquet as pq

    from .geo import wkb as W
    from .io.flatgeobuf import write_flatgeobuf
    from .pipelines import _CACHE_ROOT, image_count_for_sf

    n = max(200, image_count_for_sf(sf_dir))
    out = os.path.join(_CACHE_ROOT, f"fgb_{n}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(_CACHE_ROOT, exist_ok=True)
        tmp = f"{out}.tmp.{os.getpid()}"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        i = np.arange(n, dtype=np.int64)
        # splitmix64-ish scatter (same style as the image fixture)
        h = (i * np.int64(-7046029254386353131)) & np.int64(2**62 - 1)
        x0 = (h % 100000) / 100.0
        y0 = ((h // 100000) % 100000) / 100.0 % 1000.0
        w = 1.0 + (i % 17).astype(np.float64)
        ht = 1.0 + (i % 13).astype(np.float64)
        tbl = pa.Table.from_pydict({
            "feat_id": pa.array(i, pa.int64()),
            "x0": pa.array(x0, pa.float64()),
            "y0": pa.array(y0, pa.float64()),
            "x1": pa.array(x0 + w, pa.float64()),
            "y1": pa.array(y0 + ht, pa.float64())})
        pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"),
                       row_group_size=256)
        wkbs = [W.polygon_wkb([np.array(
            [[a, b], [c, b], [c, d], [a, d], [a, b]])])
            for a, b, c, d in zip(x0, y0, x0 + w, y0 + ht)]
        write_flatgeobuf(pa.table({
            "wkb": pa.array(wkbs, pa.binary()),
            "feat_id": pa.array(i, pa.int64())}),
            os.path.join(tmp, "data.fgb"), layer="rects")
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        try:
            os.replace(tmp, out)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return (os.path.join(out, "data.fgb"),
            os.path.join(out, "*.parquet"), n)


_Q78_BBOX = (200.0, 150.0, 420.0, 400.0)


def q78_fgb_roundtrip_filter(sf_dir):
    """FlatGeobuf write → packed-R-tree bbox read, oracled in SQL.

    The fixture rects are written to .fgb through write_flatgeobuf
    (Hilbert sort + bulk-built index); the query reads the file back
    WITH a bbox (so the packed-R-tree search drives feature selection)
    and re-derives each rect from the decoded WKB.  The oracle applies
    the same bbox-intersects predicate to the parquet twin — any bug in
    the flatbuffer encode/decode, Hilbert sort, tree build, or index
    search breaks parity."""
    import ray.data

    from .geo import wkb as W

    fgb, _glob, _n = _ensure_fgb_fixture(sf_dir)
    from .io.flatgeobuf import read_flatgeobuf

    t = read_flatgeobuf(fgb, bbox=_Q78_BBOX)

    def rect_cols(tbl: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = W.wkb_bbox_many(tbl["wkb"].to_pylist())
        return pa.Table.from_pydict({
            "feat_id": tbl["feat_id"],
            "x0": pa.array(x0, pa.float64()),
            "y0": pa.array(y0, pa.float64()),
            "x1": pa.array(x1, pa.float64()),
            "y1": pa.array(y1, pa.float64())})

    return (ray.data.from_arrow(t)
            .map_batches(rect_cols, batch_format="pyarrow"))


def _fgb_cache_glob_sf001():
    from .pipelines import _CACHE_ROOT, image_count_for_sf

    try:
        n = max(200, image_count_for_sf("/root/testdata/sf0.01"))
    except Exception:
        return None
    return os.path.join(_CACHE_ROOT, f"fgb_{n}", "*.parquet")


_Q78_GLOB = _fgb_cache_glob_sf001()
SQL_Q78 = None if _Q78_GLOB is None else f"""
SELECT feat_id, x0, y0, x1, y1
FROM read_parquet('{_Q78_GLOB}')
WHERE x1 >= {_Q78_BBOX[0]!r} AND x0 <= {_Q78_BBOX[2]!r}
  AND y1 >= {_Q78_BBOX[1]!r} AND y0 <= {_Q78_BBOX[3]!r}
"""


def q79_vector_writers_roundtrip(sf_dir):
    """Shapefile AND GeoPackage writer fidelity, oracled in SQL.

    The same fixture rects flow through BOTH vector writers —
    write_shapefile (.shp/.shx/.dbf) and write_gpkg_features (GPB
    blobs + R-tree) — are read back by the corresponding readers, and
    the recovered (feat_id, bbox) rows from the two formats are
    unioned with a format tag.  The oracle recomputes the expected
    union from the parquet twin: any drift in either writer/reader
    pair (dBASE numeric formatting, ring orientation, GPB envelopes,
    fid handling) breaks parity."""
    import tempfile

    import ray.data

    from .geo import wkb as W

    _fgb, _glob, n = _ensure_fgb_fixture(sf_dir)
    import pyarrow.parquet as _pq

    src_tbl = _pq.read_table(_glob.replace("*.parquet",
                                           "part-0.parquet"))
    wkbs = [W.polygon_wkb([np.array(
        [[a, b], [c, b], [c, d], [a, d], [a, b]])])
        for a, b, c, d in zip(src_tbl["x0"].to_pylist(),
                              src_tbl["y0"].to_pylist(),
                              src_tbl["x1"].to_pylist(),
                              src_tbl["y1"].to_pylist())]
    feats = pa.table({
        "wkb": pa.array(wkbs, pa.binary()),
        "feat_id": src_tbl["feat_id"]})

    from .io.gpkg import read_gpkg_features, write_gpkg_features
    from .io.shapefile import read_shapefile, write_shapefile

    # fixed cache dir keyed by fixture size (like _ensure_fgb_fixture)
    # instead of a fresh mkdtemp per invocation, which leaked dirs
    # across repeated driver runs
    from .pipelines import _CACHE_ROOT
    d = os.path.join(_CACHE_ROOT, f"q79_rt_{n}")
    if os.path.isdir(d):
        import shutil
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    write_shapefile(feats, os.path.join(d, "rt.shp"))
    shp = read_shapefile(os.path.join(d, "rt.shp"))
    write_gpkg_features(feats, os.path.join(d, "rt.gpkg"),
                        layer="rects", srs_id=0)
    gp = read_gpkg_features(os.path.join(d, "rt.gpkg"), layer="rects")

    def rows(tbl, fmt, ids):
        x0, y0, x1, y1 = W.wkb_bbox_many(tbl["wkb"].to_pylist())
        return pa.Table.from_pydict({
            "fmt": pa.array([fmt] * tbl.num_rows, pa.string()),
            "feat_id": pa.array(ids, pa.int64()),
            "x0": pa.array(x0, pa.float64()),
            "y0": pa.array(y0, pa.float64()),
            "x1": pa.array(x1, pa.float64()),
            "y1": pa.array(y1, pa.float64())})

    both = pa.concat_tables([
        rows(shp, "shp", shp["feat_id"].to_pylist()),
        rows(gp, "gpkg", gp["feat_id"].to_pylist())])
    return ray.data.from_arrow(both)


SQL_Q79 = None if _Q78_GLOB is None else f"""
SELECT fmt, feat_id, x0, y0, x1, y1
FROM (SELECT 'shp' AS fmt, feat_id, x0, y0, x1, y1
      FROM read_parquet('{_Q78_GLOB}')
      UNION ALL
      SELECT 'gpkg' AS fmt, feat_id, x0, y0, x1, y1
      FROM read_parquet('{_Q78_GLOB}'))
"""



def q80_video_frame_sample(sf_dir):
    """Video probe/seek/sampling over REAL MJPEG-AVI payloads, oracled
    in SQL.

    VideoFrameSample probes each AVI's header for (n_frames, fps),
    picks k=4 evenly-spaced frame indices (unique((arange(k)*n)//k)),
    seeks them via the idx1 index and JPEG-decodes ONLY those frames.
    The emitted (clip_id, frame_index, ts_sec) rows are pure container
    arithmetic, so the oracle recomputes them exactly from the stored
    (n_frames, fps) metadata columns — a header-parse, index-seek or
    frame-count bug breaks parity (and a JPEG decode failure aborts
    the query).  The phash/frame_mean columns (lossy-pixel-derived)
    are checked by pytest instead."""
    import ray.data

    from .ops.multimodal import VideoFrameSample
    from .pipelines import ensure_video_parquet

    path = ensure_video_parquet(sf_dir)

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "clip_id": t["clip_id"],
            "frame_index": t["frame_index"],
            "ts_sec": pa.array(round_half_away(
                np.asarray(t["ts_sec"]), 7), pa.float64())})

    return (ray.data.read_parquet(path, columns=["clip_id", "video"])
            .map_batches(VideoFrameSample,
                         fn_constructor_kwargs={"k": 4},
                         batch_format="pyarrow",
                         concurrency=4, batch_size=16)
            .map_batches(proj, batch_format="pyarrow"))


def _video_cache_glob_sf001():
    from .pipelines import _CACHE_ROOT, video_count_for_sf

    try:
        n = video_count_for_sf("/root/testdata/sf0.01")
    except Exception:
        return None
    return os.path.join(_CACHE_ROOT, f"video_{n}", "*.parquet")


_Q80_GLOB = _video_cache_glob_sf001()
# k=4 sampled indices = unique((j*n)//4 for j in 0..3); ts = idx/fps
SQL_Q80 = None if _Q80_GLOB is None else f"""
WITH j AS (SELECT unnest([0, 1, 2, 3]) AS j),
s AS (
  SELECT clip_id, fps, (j.j * n_frames) // 4 AS frame_index
  FROM read_parquet('{_Q80_GLOB}'), j
  GROUP BY clip_id, fps, (j.j * n_frames) // 4)
SELECT clip_id, frame_index,
       ROUND(frame_index / CAST(fps AS DOUBLE), 7) AS ts_sec
FROM s
"""


def q81_gcp_georef_recovery(sf_dir):
    """GCP → geotransform recovery over the image table, oracled in
    SQL.

    For every image, three corner GCPs are derived from its stored
    geotransform (the exact-3-point case of GDALGCPsToGeoTransform),
    the affine is RECOVERED via gcps_to_geotransform's normalized
    least-squares path, and the footprint bbox is computed from the
    recovered transform.  The oracle recomputes the same bbox in SQL
    straight from the stored gt columns — any drift in the GCP fit
    (normalization, composition, inversion) breaks parity."""
    import ray.data

    from .geo.gcp import gcps_to_geotransform
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        ws = np.asarray(t["w"], dtype=np.float64)
        hs = np.asarray(t["h"], dtype=np.float64)
        gts = [tuple(v) for v in t["gt"].to_pylist()]
        x0, y0, x1, y1 = [], [], [], []
        for w, h, gt in zip(ws, hs, gts):
            corners = [(0.0, 0.0), (w, 0.0), (w, h)]
            gcps = [(cx, cy,
                     gt[0] + gt[1] * cx + gt[2] * cy,
                     gt[3] + gt[4] * cx + gt[5] * cy)
                    for cx, cy in corners]
            r = gcps_to_geotransform(gcps, approx_ok=False)
            xs = [r[0] + r[1] * cx + r[2] * cy
                  for cx in (0.0, w) for cy in (0.0, h)]
            ys = [r[3] + r[4] * cx + r[5] * cy
                  for cx in (0.0, w) for cy in (0.0, h)]
            x0.append(min(xs))
            y0.append(min(ys))
            x1.append(max(xs))
            y1.append(max(ys))
        # 3 decimals (mm at meter scale): the LS recovery agrees with
        # the stored gt to ~1e-9 relative, so mm-rounding is collision-
        # safe while still proving the fit end-to-end
        return pa.Table.from_pydict({
            "image_id": t["image_id"],
            "x0": pa.array(round_half_away(np.array(x0), 3),
                           pa.float64()),
            "y0": pa.array(round_half_away(np.array(y0), 3),
                           pa.float64()),
            "x1": pa.array(round_half_away(np.array(x1), 3),
                           pa.float64()),
            "y1": pa.array(round_half_away(np.array(y1), 3),
                           pa.float64())})

    return (ray.data.read_parquet(
        path, columns=["image_id", "w", "h", "gt"])
        .map_batches(fn, batch_format="pyarrow"))


SQL_Q81 = None if _Q37_GLOB is None else f"""
SELECT image_id,
  ROUND(LEAST(gt[1], gt[1] + gt[2] * w, gt[1] + gt[3] * h,
              gt[1] + gt[2] * w + gt[3] * h), 3) AS x0,
  ROUND(LEAST(gt[4], gt[4] + gt[5] * w, gt[4] + gt[6] * h,
              gt[4] + gt[5] * w + gt[6] * h), 3) AS y0,
  ROUND(GREATEST(gt[1], gt[1] + gt[2] * w, gt[1] + gt[3] * h,
                 gt[1] + gt[2] * w + gt[3] * h), 3) AS x1,
  ROUND(GREATEST(gt[4], gt[4] + gt[5] * w, gt[4] + gt[6] * h,
                 gt[4] + gt[5] * w + gt[6] * h), 3) AS y1
FROM read_parquet('{_Q37_GLOB}')
"""


_Q82_WINDOW = (-20.0, -10.0, 40.0, 50.0)


def _q82_subject_rects(t: pa.Table) -> pa.Table:
    from .geo.wkb import box_polygon, polygon_wkb

    k = np.asarray(t["c_custkey"], dtype=np.int64)
    cx = -20.0 + ((k * 48271) % 59000) / 1000.0
    cy = -10.0 + ((k * 16807) % 59000) / 1000.0
    w = (5 + k % 36) / 100.0
    h = (5 + k % 46) / 100.0
    wkbs = [polygon_wkb(box_polygon(cx[i], cy[i], cx[i] + w[i],
                                    cy[i] + h[i]))
            for i in range(len(k))]
    return pa.Table.from_pydict({
        "feat_id": pa.array(k, pa.int64()),
        "wkb": pa.array(wkbs, pa.binary())})


def _q82_method_rects(t: pa.Table) -> pa.Table:
    from .geo.wkb import box_polygon, polygon_wkb

    k = np.asarray(t["o_orderkey"], dtype=np.int64)
    cx = -20.0 + ((k * 69621) % 59000) / 1000.0
    cy = -10.0 + ((k * 40692) % 59000) / 1000.0
    w = (5 + k % 26) / 100.0
    h = (5 + k % 31) / 100.0
    wkbs = [polygon_wkb(box_polygon(cx[i], cy[i], cx[i] + w[i],
                                    cy[i] + h[i]))
            for i in range(len(k))]
    return pa.Table.from_pydict({
        "zone_id": pa.array(k, pa.int64()),
        "wkb": pa.array(wkbs, pa.binary())})


def q82_layer_intersection_shuffled(sf_dir):
    """Layer-algebra Intersection through the CELL-PARTITIONED path —
    the method layer (one rect per order, 10× the subject layer) is
    beyond the broadcast budget: both layers flat-map onto a z=5
    covering grid, ONE ``groupby(cell)`` co-locates them, each group
    clips against a local MethodLayer, and PBSM reference-point dedup
    keeps each pair exactly once (ops/layer_algebra.py; reference
    streaming-method semantics ogrlayer.cpp:3345).

    Routed via ``layer_op_auto`` with the method side estimated from
    parquet METADATA (q25 as-of gate pattern) against a budget set
    below the method layer's size, so the driver exercises the shuffle
    path end-to-end at every sf.  Oracle: closed-form rect∩rect areas
    in SQL."""
    from .ops.layer_algebra import layer_op_auto

    subj = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _q82_subject_rects, batch_format="pyarrow")
    meth = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        _q82_method_rects, batch_format="pyarrow")
    # metadata-only size estimate: rows × (93-byte rect WKB + 8-byte id)
    m_bytes = _parquet_row_count(sf_dir, "orders") * 101
    out = layer_op_auto("intersection", subj, meth, z=5,
                        window=_Q82_WINDOW, method_bytes=m_bytes,
                        budget_bytes=1_000_000)

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "feat_id": t["feat_id"],
            "zone_id": t["zone_id"],
            "area": pa.array(round_half_away(np.asarray(t["area"]), 6),
                             pa.float64())})

    return out.map_batches(proj, batch_format="pyarrow")


SQL_Q82 = """
WITH s AS (
  SELECT c_custkey AS feat_id,
         -20 + ((c_custkey * 48271) % 59000) / 1000.0 AS x0,
         -10 + ((c_custkey * 16807) % 59000) / 1000.0 AS y0,
         (5 + c_custkey % 36) / 100.0 AS w,
         (5 + c_custkey % 46) / 100.0 AS h
  FROM customer),
m AS (
  SELECT o_orderkey AS zone_id,
         -20 + ((o_orderkey * 69621) % 59000) / 1000.0 AS x0,
         -10 + ((o_orderkey * 40692) % 59000) / 1000.0 AS y0,
         (5 + o_orderkey % 26) / 100.0 AS w,
         (5 + o_orderkey % 31) / 100.0 AS h
  FROM orders)
SELECT feat_id, zone_id, ROUND(CAST(raw AS DOUBLE), 6) AS area
FROM (
  SELECT s.feat_id, m.zone_id,
         (LEAST(s.x0 + s.w, m.x0 + m.w) - GREATEST(s.x0, m.x0)) *
         (LEAST(s.y0 + s.h, m.y0 + m.h) - GREATEST(s.y0, m.y0)) AS raw
  FROM s JOIN m
    ON s.x0 < m.x0 + m.w AND s.x0 + s.w > m.x0
   AND s.y0 < m.y0 + m.h AND s.y0 + s.h > m.y0)
-- same sliver gate as the engine: touching rects whose fp corner sums
-- differ by ~1e-13 must not surface as zero-area pairs
WHERE raw > 1e-9
"""


def affine_rpc_from_gt(gt, w, h):
    """RPC00B metadata whose rational polynomials encode exactly the
    inverse of an axis-aligned affine geotransform (a degenerate linear
    RPC: numerators ``c0 + cL·L + cP·P``, unit denominators) — lets the
    full RPC machinery, including its fixed-point iterative inverse
    (``alg/gdal_rpc.cpp`` RPCInverseTransformPoint), run on synthetic
    imagery with a closed-form SQL oracle.  Offsets/scales anchor at
    the image centre; the −0.5 in ``c0`` cancels the reference's
    centre-of-pixel → corner shift (gdal_rpc.cpp:461)."""
    from .geo import affine as _affine

    ig = _affine.invert_gt(tuple(float(v) for v in gt))
    long_off = gt[0] + gt[1] * w / 2.0
    lat_off = gt[3] + gt[5] * h / 2.0
    long_scale = abs(gt[1]) * w / 2.0
    lat_scale = abs(gt[5]) * h / 2.0

    def lin(g0, gx, gy, off, scale):
        num = [0.0] * 20
        num[0] = (g0 + gx * long_off + gy * lat_off - 0.5 - off) / scale
        num[1] = gx * long_scale / scale
        num[2] = gy * lat_scale / scale
        den = [0.0] * 20
        den[0] = 1.0
        return num, den

    samp_num, samp_den = lin(ig[0], ig[1], ig[2], w / 2.0, w / 2.0)
    line_num, line_den = lin(ig[3], ig[4], ig[5], h / 2.0, h / 2.0)
    return {
        "LINE_OFF": h / 2.0, "LINE_SCALE": h / 2.0,
        "SAMP_OFF": w / 2.0, "SAMP_SCALE": w / 2.0,
        "LAT_OFF": lat_off, "LAT_SCALE": lat_scale,
        "LONG_OFF": long_off, "LONG_SCALE": long_scale,
        "HEIGHT_OFF": 0.0, "HEIGHT_SCALE": 1.0,
        "LINE_NUM_COEFF": line_num, "LINE_DEN_COEFF": line_den,
        "SAMP_NUM_COEFF": samp_num, "SAMP_DEN_COEFF": samp_den,
    }


def q83_gcp_warp_parity(sf_dir):
    """GCP-family transformers driven through the ACTUAL warp, oracled
    in SQL.

    Per image (a sample of 240): (a) a TPS transformer fitted from 5
    gt-derived GCPs warps the decoded pixels via ``warp_with_gcp`` —
    project_grid's GDALApproxTransform scanline path included — onto a
    2×-coarser grid inset 3 source pixels; a direct affine warp of the
    identical grid must agree (``mismatch_px`` = pixels differing by
    more than 1e-6, expected 0).  (b) The TPS chain's projected
    source-coordinate extent is reported; for an exact-affine fit it is
    closed-form in w/h.  (c) An exactly-affine RPC
    (:func:`affine_rpc_from_gt`) recovers the image's geo bbox through
    its ITERATIVE pixel→geo inverse (q81 recovered-bbox pattern).  The
    oracle recomputes (b) and (c) from the stored gt/w/h columns and
    pins (a) at zero."""
    import ray.data

    from .geo.gcp import RPCTransformer, TPSTransformer
    from .io.codecs import decode
    from .ops.warp import (GroundControlChain, project_grid, warp_array,
                           warp_with_gcp)
    from .pipelines import ensure_images_parquet

    path = ensure_images_parquet(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        out = {"image_id": [], "sx0": [], "sx1": [], "sy0": [],
               "sy1": [], "rx0": [], "ry0": [], "rx1": [], "ry1": [],
               "mismatch_px": []}
        for i in range(t.num_rows):
            w = int(t["w"][i].as_py())
            h = int(t["h"][i].as_py())
            gt = tuple(t["gt"][i].as_py())
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3 else px).astype(
                np.float64)
            # (a)+(b): TPS through the warp on the inset 2x grid
            pts = [(0.0, 0.0), (float(w), 0.0), (0.0, float(h)),
                   (float(w), float(h)), (w / 2.0, h / 2.0)]
            gcps = [(cx, cy,
                     gt[0] + gt[1] * cx + gt[2] * cy,
                     gt[3] + gt[4] * cx + gt[5] * cy)
                    for cx, cy in pts]
            tps = TPSTransformer(gcps)
            dst_w, dst_h = (w - 6) // 2, (h - 6) // 2
            dst_gt = (gt[0] + 3 * gt[1], 2 * gt[1], 0.0,
                      gt[3] + 3 * gt[5], 0.0, 2 * gt[5])
            got, ok_g = warp_with_gcp(band, tps, dst_gt, dst_w, dst_h,
                                      "bilinear")
            want, ok_w = warp_array(band, gt, 32631, dst_gt, dst_w,
                                    dst_h, 32631, "bilinear")
            m = ok_g & ok_w
            mism = int((np.abs(got[m] - want[m]) > 1e-6).sum()
                       + (ok_g != ok_w).sum())
            sx, sy = project_grid(
                GroundControlChain(tps),
                (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), dst_gt, dst_w, dst_h)
            # (c): exact-affine RPC corners through the iterative
            # inverse.  The default 0.05-px stop would leave up to
            # 0.05·|gt1| ≈ metres of residual on projected imagery;
            # 1e-8 px forces the fixed-point loop to actually refine
            # (2+ iterations) so mm-rounding parity holds.
            rpc = RPCTransformer(affine_rpc_from_gt(gt, w, h),
                                 pixel_error_threshold=1e-8)
            cx = np.array([0.0, w, 0.0, w])
            cy = np.array([0.0, 0.0, h, h])
            lon, lat = rpc.transform(cx, cy)
            out["image_id"].append(t["image_id"][i].as_py())
            out["sx0"].append(float(sx.min()))
            out["sx1"].append(float(sx.max()))
            out["sy0"].append(float(sy.min()))
            out["sy1"].append(float(sy.max()))
            out["rx0"].append(float(lon.min()))
            out["ry0"].append(float(lat.min()))
            out["rx1"].append(float(lon.max()))
            out["ry1"].append(float(lat.max()))
            out["mismatch_px"].append(mism)
        return pa.Table.from_pydict({
            "image_id": pa.array(out["image_id"], pa.string()),
            **{k: pa.array(round_half_away(np.array(out[k]), 3),
                           pa.float64())
               for k in ("sx0", "sx1", "sy0", "sy1",
                         "rx0", "ry0", "rx1", "ry1")},
            "mismatch_px": pa.array(out["mismatch_px"], pa.int64())})

    return (ray.data.read_parquet(
        path, columns=["image_id", "bytes", "w", "h", "gt"])
        .map_batches(fn, batch_format="pyarrow", batch_size=32))


SQL_Q83 = None if _Q37_GLOB is None else f"""
SELECT image_id,
  4.0 AS sx0,
  CAST(2 + 2 * FLOOR((w - 6) / 2) AS DOUBLE) AS sx1,
  4.0 AS sy0,
  CAST(2 + 2 * FLOOR((h - 6) / 2) AS DOUBLE) AS sy1,
  ROUND(LEAST(gt[1], gt[1] + gt[2] * w), 3) AS rx0,
  ROUND(LEAST(gt[4], gt[4] + gt[6] * h), 3) AS ry0,
  ROUND(GREATEST(gt[1], gt[1] + gt[2] * w), 3) AS rx1,
  ROUND(GREATEST(gt[4], gt[4] + gt[6] * h), 3) AS ry1,
  CAST(0 AS BIGINT) AS mismatch_px
FROM read_parquet('{_Q37_GLOB}')
"""


def q84_curve_metrics(sf_dir):
    """Curve-geometry WKB metrics, oracled in closed form.

    Per customer key a full-circle CIRCULARSTRING ring (3-point form,
    centre/radius derived from the key) is wrapped in a CURVEPOLYGON
    with a square hole; the engine computes area / length / envelope
    straight off the curve WKB through the EXACT arc paths
    (geo/curves.py full-circle πr², arc length, quadrant-aware
    envelope — ogr_geom.py semantics).  SQL recomputes πr² − s²,
    2πr + 4s and the circle bbox from the same key arithmetic."""
    import ray.data

    from .geo import curves as _c
    from .geo import wkb as _w

    def fn(t: pa.Table) -> pa.Table:
        k = np.asarray(t["c_custkey"], dtype=np.int64)
        r = 0.5 + (k % 37) / 10.0
        cx = (k % 100).astype(np.float64)
        cy = (k // 100 % 100).astype(np.float64)
        s = 0.1 + (k % 7) / 100.0          # hole half-side
        area, length, x0, y0, x1, y1 = [], [], [], [], [], []
        for i in range(len(k)):
            ring = np.array([[cx[i] - r[i], cy[i]],
                             [cx[i] + r[i], cy[i]],
                             [cx[i] - r[i], cy[i]]])
            hole = np.array([[cx[i] - s[i], cy[i] - s[i]],
                             [cx[i] - s[i], cy[i] + s[i]],
                             [cx[i] + s[i], cy[i] + s[i]],
                             [cx[i] + s[i], cy[i] - s[i]],
                             [cx[i] - s[i], cy[i] - s[i]]])
            node = (_c.CURVEPOLYGON,
                    [(_c.CIRCULARSTRING, ring, ""),
                     (_c.LINESTRING, hole, "")], "")
            buf = _c.write_wkb_curve(node)
            area.append(_w.wkb_area(buf))
            length.append(_w.wkb_length(buf))
            bb = _w.wkb_bbox(buf)
            x0.append(bb[0])
            y0.append(bb[1])
            x1.append(bb[2])
            y1.append(bb[3])
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"],
            "area": pa.array(round_half_away(np.array(area), 6),
                             pa.float64()),
            "length": pa.array(round_half_away(np.array(length), 6),
                               pa.float64()),
            "x0": pa.array(round_half_away(np.array(x0), 6), pa.float64()),
            "y0": pa.array(round_half_away(np.array(y0), 6), pa.float64()),
            "x1": pa.array(round_half_away(np.array(x1), 6), pa.float64()),
            "y1": pa.array(round_half_away(np.array(y1), 6), pa.float64()),
        })

    return _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        fn, batch_format="pyarrow")


SQL_Q84 = """
SELECT c_custkey,
  ROUND(PI() * r * r - 4 * s * s, 6) AS area,
  ROUND(2 * PI() * r + 8 * s, 6) AS length,
  ROUND(cx - r, 6) AS x0, ROUND(cy - r, 6) AS y0,
  ROUND(cx + r, 6) AS x1, ROUND(cy + r, 6) AS y1
FROM (
  SELECT c_custkey,
         0.5 + (c_custkey % 37) / 10.0 AS r,
         CAST(c_custkey % 100 AS DOUBLE) AS cx,
         CAST((c_custkey // 100) % 100 AS DOUBLE) AS cy,
         0.1 + (c_custkey % 7) / 100.0 AS s
  FROM customer)
"""


def q85_webp_roundtrip(sf_dir):
    """VP8L lossless codec driven per row, oracled in SQL.

    Per part key a deterministic 16×16 RGB tile (pixel value =
    (3k + 7i + 13j + 31c) mod 256) is ENCODED to a RIFF/WEBP container
    and DECODED back (io/webp.py — the full prefix-code + subtract-green
    loop); the query reports the decoded pixel sum and the count of
    pixels differing from the generation formula (pinned at 0).  The
    oracle recomputes the pixel sum by expanding the same formula over
    a generate_series cross join."""
    import ray.data

    from .io.webp import decode_webp, encode_webp

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["p_partkey"], dtype=np.int64)
        keep = (keys % 8) == 0          # deterministic, order-free subset
        keys = keys[keep]
        ii, jj, cc = np.mgrid[0:16, 0:16, 0:3]
        base = (7 * ii + 13 * jj + 31 * cc).astype(np.int64)
        sums, mism = [], []
        for k in keys:
            tile = ((3 * int(k) + base) % 256).astype(np.uint8)
            out = decode_webp(encode_webp(tile))
            sums.append(int(out[:, :, :3].astype(np.int64).sum()))
            mism.append(int((out[:, :, :3] != tile).sum()))
        return pa.Table.from_pydict({
            "p_partkey": pa.array(keys, pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "mismatch_px": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "part", ["p_partkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=256))


SQL_Q85 = """
SELECT p_partkey,
       CAST(SUM((3 * p_partkey + 7 * i.g + 13 * j.g + 31 * c.g) % 256)
            AS BIGINT) AS pixel_sum,
       CAST(0 AS BIGINT) AS mismatch_px
FROM (SELECT p_partkey FROM part WHERE p_partkey % 8 = 0),
     generate_series(0, 15) i(g),
     generate_series(0, 15) j(g),
     generate_series(0, 2) c(g)
GROUP BY p_partkey
"""


def q86_flac_roundtrip(sf_dir):
    """FLAC lossless codec driven per row, oracled in SQL.

    Per supplier key a deterministic 1024-sample stereo int16 clip
    (sample = (7919k + 977i + 31i² + 131071c) mod 65536 − 32768) is
    ENCODED to a spec-conformant FLAC stream and DECODED back
    (io/flac.py — RFC 9639 fixed predictors, Rice residuals, stereo
    decorrelation, CRC-8/16 + stream-MD5 verification on the way
    back); the query reports the decoded sample sum and the count of
    samples differing from the generation formula (pinned at 0).  The
    oracle recomputes the sum by expanding the same formula over a
    generate_series cross join."""
    from .io.flac import decode_flac, encode_flac

    i = np.arange(1024, dtype=np.int64)
    base = 977 * i + 31 * i * i

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["s_suppkey"], dtype=np.int64)
        sums, mism = [], []
        for k in keys:
            clip = ((7919 * int(k) + base)[:, None]
                    + 131071 * np.arange(2)[None, :]) % 65536 - 32768
            out, rate, bps = decode_flac(
                encode_flac(clip, rate=16000, bps=16, block_size=256))
            sums.append(int(out.astype(np.int64).sum()))
            mism.append(int((out != clip).sum()))
        return pa.Table.from_pydict({
            "s_suppkey": pa.array(keys, pa.int64()),
            "sample_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=64))


SQL_Q86 = """
SELECT s_suppkey,
       CAST(SUM((7919 * s_suppkey + 977 * i.g + 31 * i.g * i.g
                 + 131071 * c.g) % 65536 - 32768) AS BIGINT)
         AS sample_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM supplier,
     generate_series(0, 1023) i(g),
     generate_series(0, 1) c(g)
GROUP BY s_suppkey
"""


def q88_ogg_roundtrip(sf_dir):
    """FLAC-in-Ogg container driven per row, oracled in SQL.

    Same contract as q86 but through the Ogg encapsulation
    (io/ogg.py — RFC 3533 pages with the unreflected CRC-32 page
    checksum and the Xiph FLAC-to-Ogg packet mapping): per supplier
    key a deterministic 1024-sample stereo int16 clip
    (sample = (6803k + 641i + 17i² + 99991c) mod 65536 − 32768) is
    encoded to Ogg pages (block_size 192 → 6 audio packets, one per
    FLAC frame) and decoded back via page-CRC + frame-CRC + stream-MD5
    verification; the query reports the decoded sample sum and the
    mismatch count (pinned 0).  The oracle expands the same formula.
    """
    from .io.ogg import decode_ogg_flac, encode_ogg_flac

    i = np.arange(1024, dtype=np.int64)
    base = 641 * i + 17 * i * i

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["s_suppkey"], dtype=np.int64)
        sums, mism = [], []
        for k in keys:
            clip = ((6803 * int(k) + base)[:, None]
                    + 99991 * np.arange(2)[None, :]) % 65536 - 32768
            out, rate, bps = decode_ogg_flac(
                encode_ogg_flac(clip, rate=16000, bps=16,
                                block_size=192))
            sums.append(int(out.astype(np.int64).sum()))
            mism.append(int((out != clip).sum()))
        return pa.Table.from_pydict({
            "s_suppkey": pa.array(keys, pa.int64()),
            "sample_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=64))


SQL_Q88 = """
SELECT s_suppkey,
       CAST(SUM((6803 * s_suppkey + 641 * i.g + 17 * i.g * i.g
                 + 99991 * c.g) % 65536 - 32768) AS BIGINT)
         AS sample_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM supplier,
     generate_series(0, 1023) i(g),
     generate_series(0, 1) c(g)
GROUP BY s_suppkey
"""


def q89_dted_roundtrip(sf_dir):
    """DTED elevation codec driven per row, oracled in SQL.

    Per nation key a deterministic 121×121 int16 terrain grid
    (elev = (1327k + 31r + 57c + r·c) mod 1200 − 100) is written as a
    MIL-PRF-89020B DTED cell (io/dem.py — UHL/DSI/ACC headers,
    signed-magnitude south→north records with arithmetic checksums;
    reader validated against the reference's published n43.dt0
    expectations: checksums 49187/305/56006, test_dted_2 geotransform)
    and read back with checksum verification on; the query reports the
    decoded elevation sum and mismatch count (pinned 0).  The oracle
    expands the same formula over a generate_series cross join.
    """
    from .io.dem import read_dted, write_dted

    r = np.arange(121, dtype=np.int64)[:, None]
    c = np.arange(121, dtype=np.int64)[None, :]
    base = 31 * r + 57 * c + r * c

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        sums, mism = [], []
        for k in keys:
            grid = ((1327 * int(k) + base) % 1200 - 100).astype(np.int16)
            out, gt, nodata = read_dted(
                write_dted(grid, lon0=-80, lat0=43))
            sums.append(int(out.astype(np.int64).sum()))
            mism.append(int((out != grid).sum()))
        return pa.Table.from_pydict({
            "n_nationkey": t["n_nationkey"],
            "elev_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


SQL_Q89 = """
SELECT n_nationkey,
       CAST(SUM((1327 * n_nationkey + 31 * r.g + 57 * c.g
                 + r.g * c.g) % 1200 - 100) AS BIGINT) AS elev_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM nation,
     generate_series(0, 120) r(g),
     generate_series(0, 120) c(g)
GROUP BY n_nationkey
"""


def q90_kml_gpx_roundtrip(sf_dir):
    """KML + GPX vector drivers driven per batch, oracled in SQL.

    Each customer batch becomes one multi-feature KML document
    (io/kml.py — old-KML-driver layer semantics validated against the
    published samples.kml expectations) and one GPX document
    (io/gpx.py — five-layer model per ogr_gpx.py) holding the
    deterministic point x = (7k mod 1000)/8 + 0.125,
    y = (13k mod 1000)/8 − 40 per key; both documents are parsed back
    and the query emits the KML-decoded coordinates plus a
    ``fmt_match`` flag (KML WKB == GPX WKB bit-for-bit, pinned 1).
    The oracle recomputes the closed-form coordinates (exact in
    binary: eighth steps)."""
    from .io.gpx import read_gpx, write_gpx
    from .io.kml import read_kml, write_kml

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        x = (keys * 7 % 1000) / 8.0 + 0.125
        y = (keys * 13 % 1000) / 8.0 - 40.0
        wkbs = [struct.pack("<BIdd", 1, 1, xi, yi)
                for xi, yi in zip(x, y)]
        feats = pa.Table.from_pydict({
            "Name": pa.array([str(k) for k in keys], pa.string()),
            "wkb": pa.array(wkbs, pa.binary())})
        back_kml = read_kml(write_kml([("pts", feats)]))[0][1]
        back_gpx = read_gpx(write_gpx({"waypoints": feats}))["waypoints"]
        kml_wkb = back_kml["wkb"].to_pylist()
        gpx_wkb = back_gpx["wkb"].to_pylist()
        coords = np.frombuffer(b"".join(kml_wkb), np.uint8)
        coords = coords.reshape(len(kml_wkb), 21)[:, 5:]
        xy = coords.copy().view("<f8")
        match = [int(a == b) for a, b in zip(kml_wkb, gpx_wkb)]
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"],
            "x": pa.array(xy[:, 0], pa.float64()),
            "y": pa.array(xy[:, 1], pa.float64()),
            "fmt_match": pa.array(match, pa.int64())})

    return (_read(sf_dir, "customer", ["c_custkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=256))


SQL_Q90 = """
SELECT c_custkey,
       (c_custkey * 7 % 1000) / 8.0 + 0.125 AS x,
       (c_custkey * 13 % 1000) / 8.0 - 40.0 AS y,
       CAST(1 AS BIGINT) AS fmt_match
FROM customer
"""


def q91_grib_roundtrip(sf_dir):
    """GRIB2 codec driven per row, oracled in SQL.

    Per nation key a deterministic 96×96 integer field
    (val = (911k + 17r + 43c + 2rc) mod 1500 − 250) is encoded as a
    single-message GRIB2 file (io/grib.py write_grib2 — template 3.0
    lat/lon grid, simple packing through the g2clib simpack parameter
    selection; writer validated against the reference's published
    re-encode checksum 41640 on ds.mint.bin and the byte.tif 4672
    matrix, ``autotest/gdrivers/grib.py`` write tests) and decoded
    with read_grib (validated on 17 published fixture checksums).
    Integer-valued fields round-trip exactly under simple packing
    (step 1, float32-exact magnitudes), so the query reports the
    decoded value sum and a mismatch count pinned at 0; the oracle
    expands the same formula over a generate_series cross join.
    """
    from .io.grib import read_grib, write_grib2

    r = np.arange(96, dtype=np.int64)[:, None]
    c = np.arange(96, dtype=np.int64)[None, :]
    base = 17 * r + 43 * c + 2 * r * c
    gt = (2.0, 0.01, 0.0, 50.0, 0.0, -0.01)

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        sums, mism = [], []
        for k in keys:
            grid = ((911 * int(k) + base) % 1500 - 250) \
                .astype(np.float64)
            out = read_grib(write_grib2(grid, gt))[0]["data"]
            sums.append(int(out.astype(np.int64).sum()))
            mism.append(int((out != grid).sum()))
        return pa.Table.from_pydict({
            "n_nationkey": t["n_nationkey"],
            "val_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


SQL_Q91 = """
SELECT n_nationkey,
       CAST(SUM((911 * n_nationkey + 17 * r.g + 43 * c.g
                 + 2 * r.g * c.g) % 1500 - 250) AS BIGINT) AS val_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM nation,
     generate_series(0, 95) r(g),
     generate_series(0, 95) c(g)
GROUP BY n_nationkey
"""


_Q92_FORMATS = ("gsbg", "zmap", "kro", "hf2", "pnm", "grib",
                "nitf")


def q92_format_matrix(sf_dir):
    """Round-5 format-driver matrix driven per row, oracled in SQL.

    Per nation key a deterministic 64×64 integer grid
    (val = (577k + 13r + 29c + rc) mod 1000) is round-tripped
    through SEVEN of the from-scratch drivers — Surfer GSBG
    (io/gsg.py), ZMap Plus ASCII (io/zmap.py), Autopano KRO
    (io/rawgrids.py), HF2 (io/hf2.py), PNM (io/pnm.py), GRIB2
    simple packing (io/grib.py) and NITF 2.1 uncompressed IMODE=B
    (io/nitf.py) — every codec in the set validated
    elsewhere against its own ``autotest`` published checksums.
    Integer values are exact in all six encodings, so each
    (nation, format) row reports the decoded sum and a mismatch
    count pinned at 0; the oracle expands the same formula over a
    generate_series cross join times the format list.
    """
    import os
    import tempfile

    from .io.grib import read_grib, write_grib2
    from .io.gsg import read_gsbg, write_gsbg
    from .io.nitf import read_nitf, write_nitf
    from .io.hf2 import read_hf2, write_hf2
    from .io.pnm import read_pnm, write_pnm
    from .io.rawgrids import read_kro, write_kro
    from .io.zmap import read_zmap, write_zmap

    r = np.arange(64, dtype=np.int64)[:, None]
    c = np.arange(64, dtype=np.int64)[None, :]
    base = 13 * r + 29 * c + r * c
    gt = (10.0, 0.02, 0.0, 55.0, 0.0, -0.02)

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out_k, out_f, sums, mism = [], [], [], []
        tmp = tempfile.mkdtemp(prefix="raydal_q92_")
        try:
            for k in keys:
                grid = ((577 * int(k) + base) % 1000).astype(np.int64)
                rts = {
                    "gsbg": lambda: read_gsbg(_w(
                        write_gsbg, grid.astype(np.float32), gt,
                        os.path.join(tmp, "g.grd")))[0][0],
                    "zmap": lambda: read_zmap(_w(
                        write_zmap, grid.astype(np.float64), gt,
                        os.path.join(tmp, "g.zmap")))[0][0],
                    "kro": lambda: read_kro(write_kro(
                        grid.astype(np.uint16),
                        os.path.join(tmp, "g.kro")))[0][0],
                    "hf2": lambda: read_hf2(_w(
                        write_hf2, grid.astype(np.int16), gt,
                        os.path.join(tmp, "g.hf2")))[0][0],
                    "pnm": lambda: read_pnm(write_pnm(
                        grid.astype(np.uint16),
                        os.path.join(tmp, "g.pgm")))[0][0],
                    "grib": lambda: read_grib(write_grib2(
                        grid.astype(np.float64), gt))[0]["data"],
                    "nitf": lambda: read_nitf(_w2(
                        write_nitf, grid.astype(np.uint16), gt,
                        os.path.join(tmp, "g.ntf")))[0][0],
                }
                for fmt in _Q92_FORMATS:
                    dec = np.asarray(rts[fmt]()).astype(np.int64)
                    out_k.append(int(k))
                    out_f.append(fmt)
                    sums.append(int(dec.sum()))
                    mism.append(int((dec != grid).sum()))
        finally:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(
                out_k, t.schema.field("n_nationkey").type),
            "fmt": pa.array(out_f, pa.string()),
            "val_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


def _w(writer, arr, gt, path):
    writer(arr, gt, path)
    return path


def _w2(writer, arr, gt, path):
    writer(path, arr, gt)
    return path


_Q93_FORMATS = ("rst", "ilwis", "doq2", "lcp")


def q93_readonly_driver_matrix(sf_dir):
    """Round-5 read-only-driver matrix: the RST / ILWIS / DOQ2 / LCP
    readers decode hand-synthesized files, oracled in SQL.

    These four drivers have no writer (matching the reference), so
    the fixture bytes are laid out directly from each format's
    published spec — Idrisi ``.rdc`` text + int16 payload
    (``frmts/idrisi/IdrisiDataset.cpp``), ILWIS ``.mpr``/``.grf``
    ini + ``.mp#`` int16 (``frmts/ilwis/ilwisdataset.cpp``), USGS
    DOQ2 keyword header + byte BIP (``frmts/raw/doq2dataset.cpp``),
    FARSITE LCP 7316-byte header + pixel-interleaved int16 bands
    (``frmts/raw/lcpdataset.cpp``) — and decoded through the same
    io/ readers that carry published-checksum parity in pytest.
    Values are integer-exact in every encoding; the oracle expands
    the identical value formula per format (64×64 int16 grids mod
    1000 for rst/ilwis; a 500×500 byte grid mod 251 for doq2; five
    64×64 bands offset 7·b for lcp).
    """
    import os
    import struct
    import tempfile

    from .io.ilwis import read_ilwis
    from .io.rawgrids import read_doq2, read_lcp, read_rst

    r64 = np.arange(64, dtype=np.int64)[:, None]
    c64 = np.arange(64, dtype=np.int64)[None, :]
    base64g = 13 * r64 + 29 * c64 + r64 * c64
    r500 = np.arange(500, dtype=np.int64)[:, None]
    c500 = np.arange(500, dtype=np.int64)[None, :]
    base500 = 13 * r500 + 29 * c500 + r500 * c500

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out_k, out_f, sums, mism = [], [], [], []
        tmp = tempfile.mkdtemp(prefix="raydal_q93_")
        try:
            for k in keys:
                g16 = ((577 * int(k) + base64g) % 1000).astype("<i2")
                g8 = ((577 * int(k) + base500) % 251).astype(np.uint8)

                # --- Idrisi RST: .rdc text companion + raw int16
                rst = os.path.join(tmp, "g.rst")
                with open(rst, "wb") as f:
                    f.write(g16.tobytes())
                with open(os.path.join(tmp, "g.rdc"), "w") as f:
                    f.write("file format : IDRISI Raster A.1\n"
                            "data type   : integer\n"
                            "file type   : binary\n"
                            "columns     : 64\nrows        : 64\n"
                            "unit dist.  : 1.0\n"
                            "min. X      : 0.0\nmax. X      : 64.0\n"
                            "min. Y      : 0.0\nmax. Y      : 64.0\n"
                            "flag value  : none\n")

                # --- ILWIS: .mpr ini + .grf georef + .mp# int16
                mpr = os.path.join(tmp, "g.mpr")
                with open(os.path.join(tmp, "g.mp#"), "wb") as f:
                    f.write(g16.tobytes())
                with open(os.path.join(tmp, "g.grf"), "w") as f:
                    f.write("[GeoRef]\nColumns=64\nLines=64\n"
                            "Type=GeoRefCorners\n[GeoRefCorners]\n"
                            "CornersOfCorners=Yes\nMinX=0\nMinY=0\n"
                            "MaxX=64\nMaxY=64\n")
                with open(mpr, "w") as f:
                    f.write("[Ilwis]\nType=BaseMap\n[Map]\n"
                            "GeoRef=g.grf\nSize=64 64\n[MapStore]\n"
                            "Data=g.mp#\nType=Int\nSwapBytes=No\n")

                # --- USGS DOQ2: keyword header + byte BIP
                doq = os.path.join(tmp, "g.doq")
                hdr = (b"BEGIN_USGS_DOQ_HEADER\n"
                       b"SAMPLES_AND_LINES 500 500\n"
                       b"BYTE_COUNT 400\n"
                       b"XY_ORIGIN 1000.0 2000.0\n"
                       b"HORIZONTAL_RESOLUTION 1.0\n"
                       b"BAND_CONTENT BLACK&WHITE\n"
                       b"BITS_PER_PIXEL 8\n"
                       b"END_USGS_DOQ_HEADER\n")
                with open(doq, "wb") as f:
                    f.write(hdr + b"\x00" * (400 - len(hdr)))
                    f.write(g8.tobytes())

                # --- FARSITE LCP: 7316-byte header, 5 bands BIP
                lcp = os.path.join(tmp, "g.lcp")
                head = bytearray(7316)
                struct.pack_into("<i", head, 0, 20)      # no crown
                struct.pack_into("<i", head, 4, 20)      # no ground
                struct.pack_into("<2i", head, 4164, 64, 64)
                struct.pack_into("<4d", head, 4172,
                                 64.0, 0.0, 64.0, 0.0)   # E W N S
                struct.pack_into("<2d", head, 4208, 1.0, 1.0)
                bands = np.stack([(g16.astype(np.int64) + 7 * b)
                                  % 1000 for b in range(5)]) \
                    .astype("<i2")
                with open(lcp, "wb") as f:
                    f.write(bytes(head))
                    f.write(np.ascontiguousarray(
                        bands.transpose(1, 2, 0)).tobytes())

                decoded = {
                    "rst": lambda: read_rst(rst)[0],
                    "ilwis": lambda: read_ilwis(mpr)[0],
                    "doq2": lambda: read_doq2(doq)[0],
                    "lcp": lambda: read_lcp(lcp)[0],
                }
                expect = {
                    "rst": g16.astype(np.int64)[None],
                    "ilwis": g16.astype(np.int64)[None],
                    "doq2": g8.astype(np.int64)[None],
                    "lcp": bands.astype(np.int64),
                }
                for fmt in _Q93_FORMATS:
                    dec = np.asarray(decoded[fmt]()).astype(np.int64)
                    out_k.append(int(k))
                    out_f.append(fmt)
                    sums.append(int(dec.sum()))
                    mism.append(int((dec != expect[fmt]).sum()))
        finally:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(
                out_k, t.schema.field("n_nationkey").type),
            "fmt": pa.array(out_f, pa.string()),
            "val_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


SQL_Q93 = """
WITH g64 AS (
  SELECT n_nationkey, fmt,
         CAST(SUM((577 * n_nationkey + 13 * r.g + 29 * c.g
                   + r.g * c.g) % 1000) AS BIGINT) AS val_sum
  FROM nation,
       (VALUES ('rst'), ('ilwis')) fmts(fmt),
       generate_series(0, 63) r(g), generate_series(0, 63) c(g)
  GROUP BY n_nationkey, fmt
), gdoq AS (
  SELECT n_nationkey, 'doq2' AS fmt,
         CAST(SUM((577 * n_nationkey + 13 * r.g + 29 * c.g
                   + r.g * c.g) % 251) AS BIGINT) AS val_sum
  FROM nation,
       generate_series(0, 499) r(g), generate_series(0, 499) c(g)
  GROUP BY n_nationkey
), glcp AS (
  SELECT n_nationkey, 'lcp' AS fmt,
         CAST(SUM(((577 * n_nationkey + 13 * r.g + 29 * c.g
                    + r.g * c.g) % 1000 + 7 * b.g) % 1000)
              AS BIGINT) AS val_sum
  FROM nation,
       generate_series(0, 63) r(g), generate_series(0, 63) c(g),
       generate_series(0, 4) b(g)
  GROUP BY n_nationkey
)
SELECT n_nationkey, fmt, val_sum, CAST(0 AS BIGINT) AS mismatch
FROM (SELECT * FROM g64 UNION ALL SELECT * FROM gdoq
      UNION ALL SELECT * FROM glcp)
"""



SQL_Q92 = """
SELECT n_nationkey, fmt,
       CAST(SUM((577 * n_nationkey + 13 * r.g + 29 * c.g
                 + r.g * c.g) % 1000) AS BIGINT) AS val_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM nation,
     (VALUES ('gsbg'), ('zmap'), ('kro'), ('hf2'), ('pnm'),
             ('grib'), ('nitf')) fmts(fmt),
     generate_series(0, 63) r(g),
     generate_series(0, 63) c(g)
GROUP BY n_nationkey, fmt
"""


def q87_contour_polygon_bands(sf_dir):
    """Polygonal contouring (POLYGONIZE mode) with a closed-form
    oracle.

    Per supplier key a W×W pyramid raster z = min(x, y, W-1-x, W-1-y)
    with W = 17 + 2(k mod 5) is banded between levels 0.5..5.5
    (ops/contour.py contour_polygons — iso rings + border closure +
    outer/hole classification, `alg/contour.cpp:681` POLYGONIZE
    semantics).  Band areas are exact in closed form because the
    marching-squares corner chamfers (0.125 each) cancel between the
    two bounding square rings: interior band [l, l+1) has area
    s(l)² − s(l+1)² with s(l) = (W−1) − 2l; the below-min band is
    (W−1)² − (s(0.5)² − ½) and the above-max band s(5.5)² − ½.  Hole
    counts are pinned too (annulus topology: one hole per interior
    band, none at the apex)."""
    from .ops.contour import band_areas, contour_polygons

    levels = [0.5, 1.5, 2.5, 3.5, 4.5, 5.5]

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["s_suppkey"], dtype=np.int64)
        out_k, out_b, out_a, out_h = [], [], [], []
        for k in keys:
            w = 17 + 2 * (int(k) % 5)
            gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(w, dtype=np.float64))
            z = np.minimum(np.minimum(gx, gy),
                           np.minimum(w - 1 - gx, w - 1 - gy))
            polys = contour_polygons(z, levels)
            areas = band_areas(z, levels)
            for b, ((_, _, area), band) in enumerate(
                    zip(areas, polys)):
                out_k.append(int(k))
                out_b.append(b)
                out_a.append(round_half_away(np.array([area]), 6)[0])
                out_h.append(sum(len(hs) for _, hs in band["polys"]))
        return pa.Table.from_pydict({
            "s_suppkey": pa.array(out_k, pa.int64()),
            "band": pa.array(out_b, pa.int64()),
            "area": pa.array(out_a, pa.float64()),
            "n_holes": pa.array(out_h, pa.int64())})

    return (_read(sf_dir, "supplier", ["s_suppkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=128))


SQL_Q87 = """
WITH g AS (
  SELECT s_suppkey,
         CAST(16 + 2 * (s_suppkey % 5) AS DOUBLE) AS d,  -- W - 1
         b.g AS band
  FROM supplier, generate_series(0, 6) b(g))
SELECT s_suppkey, band,
  ROUND(CASE
    WHEN band = 0 THEN d * d - ((d - 1) * (d - 1) - 0.5)
    WHEN band = 6 THEN (d - 11) * (d - 11) - 0.5
    ELSE (d - 2 * band + 1) * (d - 2 * band + 1)
         - (d - 2 * band - 1) * (d - 2 * band - 1)
  END, 6) AS area,
  CAST(CASE WHEN band = 6 THEN 0 ELSE 1 END AS BIGINT) AS n_holes
FROM g
"""


def q94_ogr_sql_recordset(sf_dir):
    """OGR SQL dialect executor (raydal/sql) — recordset statement
    exercising WHERE + BETWEEN + LIKE + arithmetic + SUBSTR + ORDER BY
    + LIMIT, parsed by the from-scratch swq-grammar parser
    (ogr/swq_parser.cpp semantics) and executed as a streaming Ray
    pipeline.  The statement is simultaneously valid ANSI SQL, so the
    oracle runs the identical text in DuckDB."""
    from .sql import execute_sql

    return execute_sql(SQL_Q94, {"orders": _read(sf_dir, "orders")})


SQL_Q94 = """
SELECT o_orderkey, o_totalprice * 2 AS dbl,
       SUBSTR(o_orderpriority, 1, 1) AS pri
FROM orders
WHERE o_totalprice BETWEEN 1000 AND 100000
  AND o_orderpriority LIKE '%URGENT'
ORDER BY o_orderkey LIMIT 2000
"""


def q95_ogr_sql_summary(sf_dir):
    """OGR SQL summary mode (PrepareSummary, ogr_gensql.cpp:845): one
    output feature carrying MIN/MAX/SUM (Kahan-Babuska-Neumaier,
    swq.cpp:475) / AVG / COUNT / STDDEV (Welford, swq.cpp:543) partials
    merged across streamed batches.  Floats rounded to 7 decimals for
    the hash compare, as the relational queries do."""
    from .sql import execute_sql

    ds = execute_sql(
        "SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,"
        " SUM(l_quantity) AS sum_qty, COUNT(l_partkey) AS cnt_pk,"
        " COUNT(*) AS cnt_all, AVG(l_extendedprice) AS avg_price,"
        " STDDEV_POP(l_tax) AS sd_tax, STDDEV_SAMP(l_tax) AS sd_tax_s"
        " FROM lineitem"
        " WHERE l_returnflag = 'R' AND l_discount > 0.05",
        {"lineitem": _read(sf_dir, "lineitem")})

    def rnd(t: pa.Table) -> pa.Table:
        out = {}
        for n in t.schema.names:
            col = t[n]
            if pa.types.is_floating(col.type) and n != "min_qty" and \
                    n != "max_qty" and n != "sum_qty":
                out[n] = pa.array(round_half_away(
                    col.to_numpy(zero_copy_only=False), 7))
            else:
                out[n] = col
        return pa.Table.from_pydict(out)

    return ds.map_batches(rnd, batch_format="pyarrow")


SQL_Q95 = """
SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       SUM(l_quantity) AS sum_qty, COUNT(l_partkey) AS cnt_pk,
       COUNT(*) AS cnt_all,
       ROUND(AVG(l_extendedprice), 7) AS avg_price,
       ROUND(STDDEV_POP(l_tax), 7) AS sd_tax,
       ROUND(STDDEV_SAMP(l_tax), 7) AS sd_tax_s
FROM lineitem
WHERE l_returnflag = 'R' AND l_discount > 0.05
"""


def q96_ogr_sql_join_distinct(sf_dir):
    """OGR SQL first-match JOIN (ogr_gensql.cpp:1493 — one secondary
    feature per primary row, here exact because nation keys are unique)
    UNION ALL a DISTINCT-list statement run separately (swq.cpp
    SWQM_DISTINCT_LIST): both shapes through the Ray executor."""
    from .sql import execute_sql

    join = execute_sql(
        "SELECT c_custkey, c_name, n_name FROM customer "
        "JOIN nation ON customer.c_nationkey = nation.n_nationkey "
        "WHERE c_acctbal > 7500 ORDER BY c_custkey LIMIT 500",
        {"customer": _read(sf_dir, "customer"),
         "nation": _read(sf_dir, "nation")})
    dist = execute_sql(
        "SELECT DISTINCT o_orderpriority FROM orders "
        "ORDER BY o_orderpriority",
        {"orders": _read(sf_dir, "orders")})

    def as_rows(t: pa.Table, part: str) -> pa.Table:
        if part == "join":
            return pa.table({
                "part": pa.array(["join"] * t.num_rows),
                "k": pc.cast(t["c_custkey"], pa.int64()),
                "a": t["c_name"], "b": t["n_name"]})
        return pa.table({
            "part": pa.array(["dist"] * t.num_rows),
            "k": pa.nulls(t.num_rows, pa.int64()),
            "a": t["o_orderpriority"],
            "b": pa.nulls(t.num_rows, pa.string())})

    j = join.map_batches(lambda t: as_rows(t, "join"),
                         batch_format="pyarrow")
    d = dist.map_batches(lambda t: as_rows(t, "dist"),
                         batch_format="pyarrow")
    return j.union(d)


SQL_Q96 = """
SELECT 'join' AS part, c_custkey AS k, c_name AS a, n_name AS b
FROM (SELECT c_custkey, c_name, n_name FROM customer
      JOIN nation ON customer.c_nationkey = nation.n_nationkey
      WHERE c_acctbal > 7500 ORDER BY c_custkey LIMIT 500)
UNION ALL
SELECT 'dist' AS part, CAST(NULL AS BIGINT) AS k,
       o_orderpriority AS a, CAST(NULL AS VARCHAR) AS b
FROM (SELECT DISTINCT o_orderpriority FROM orders)
"""


def q97_topojson_roundtrip(sf_dir):
    """TopoJSON reader driven per batch, oracled in SQL.

    Each customer batch becomes one quantized TopoJSON Topology
    (io/topojson.py — ogrtopojsonreader.cpp semantics: delta-decoded
    arcs under a transform, ``~i`` arc reversal, per-feature id/name
    extraction).  Per key the arc starts at quantized
    (3k mod 640, 5k mod 640) with deltas (8,16) then (24,-8) under
    scale 1/8 and translate (0, -40) — every coordinate an exact
    binary eighth.  A ``lines`` GeometryCollection holds the forward
    LineStrings (arcs=[i]) and a ``rev`` collection the reversed ones
    (arcs=[~i]); the query emits the decoded endpoints plus
    ``rev_match`` (reversed stitch is the exact point-reversal,
    pinned 1) and ``name_ok`` (id/properties.name passthrough,
    pinned 1).  The oracle recomputes the closed-form endpoints."""
    from .io.topojson import read_topojson

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        q0x = keys * 3 % 640
        q0y = keys * 5 % 640
        arcs = [[[int(x), int(y)], [8, 16], [24, -8]]
                for x, y in zip(q0x, q0y)]
        fwd = [{"type": "LineString", "arcs": [i], "id": str(k),
                "properties": {"name": "n%d" % k}}
               for i, k in enumerate(keys)]
        rev = [{"type": "LineString", "arcs": [~i]}
               for i in range(len(keys))]
        doc = {
            "type": "Topology",
            "transform": {"scale": [0.125, 0.125],
                          "translate": [0.0, -40.0]},
            "objects": {
                "lines": {"type": "GeometryCollection",
                          "geometries": fwd},
                "rev": {"type": "GeometryCollection",
                        "geometries": rev},
            },
            "arcs": arcs,
        }
        layers = read_topojson(doc)
        lf, lr = layers["lines"], layers["rev"]
        # LineString of 3 points: 9-byte header + 3×16 coord bytes
        fb = np.frombuffer(b"".join(lf["wkb"].to_pylist()), np.uint8)
        fb = fb.reshape(len(keys), 57)[:, 9:]
        fxy = fb.copy().view("<f8").reshape(len(keys), 6)
        rb = np.frombuffer(b"".join(lr["wkb"].to_pylist()), np.uint8)
        rb = rb.reshape(len(keys), 57)[:, 9:]
        rxy = rb.copy().view("<f8").reshape(len(keys), 6)
        rev_match = (rxy == fxy[:, [4, 5, 2, 3, 0, 1]]) \
            .all(axis=1).astype(np.int64)
        ids = lf["id"].to_pylist()
        names = lf["name"].to_pylist()
        name_ok = np.array(
            [int(i == str(k) and n == "n%d" % k)
             for i, n, k in zip(ids, names, keys)], np.int64)
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"],
            "x0": pa.array(fxy[:, 0], pa.float64()),
            "y0": pa.array(fxy[:, 1], pa.float64()),
            "x2": pa.array(fxy[:, 4], pa.float64()),
            "y2": pa.array(fxy[:, 5], pa.float64()),
            "rev_match": pa.array(rev_match),
            "name_ok": pa.array(name_ok)})

    return (_read(sf_dir, "customer", ["c_custkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=256))


SQL_Q97 = """
SELECT c_custkey,
       (c_custkey * 3 % 640) / 8.0 AS x0,
       (c_custkey * 5 % 640) / 8.0 - 40 AS y0,
       (c_custkey * 3 % 640) / 8.0 + 4.0 AS x2,
       (c_custkey * 5 % 640) / 8.0 - 39.0 AS y2,
       CAST(1 AS BIGINT) AS rev_match,
       CAST(1 AS BIGINT) AS name_ok
FROM customer
"""


def q98_ms_adpcm_roundtrip(sf_dir):
    """Microsoft ADPCM codec (WAV tag 0x0002) driven per row, oracled
    in SQL.

    Per customer key a deterministic int16 triangle wave
    x_i = (|((37k + i·q) mod 510) − 255| − 128)·64 with
    q = (k mod 7) + 3 is encoded to MS ADPCM (io/wav.py encode_ms_adpcm — per-block
    predictor choice over the 7 standard coefficient pairs) and
    decoded back.  The format stores each block's first two samples
    losslessly in the header, so ``s0``/``s1`` are exact closed forms
    the oracle recomputes; ``head_ok`` pins that property across
    every block and ``snr_ok`` pins reconstruction quality (> 15 dB)
    for the 4-bit quantized remainder."""
    from .io.wav import decode_wav, encode_ms_adpcm

    N, SPB = 600, 300

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        i = np.arange(N, dtype=np.int64)
        s0 = np.empty(len(keys), np.int64)
        s1 = np.empty(len(keys), np.int64)
        head_ok = np.empty(len(keys), np.int64)
        snr_ok = np.empty(len(keys), np.int64)
        for j, k in enumerate(keys):
            q = int(k) % 7 + 3
            x = (np.abs((37 * int(k) + i * q) % 510 - 255) - 128) * 64
            buf = encode_ms_adpcm(x.astype(np.int16), 8000,
                                  samples_per_block=SPB)
            dec, _ = decode_wav(buf)
            d = np.round(dec * 32768.0).astype(np.int64)[:N]
            s0[j], s1[j] = d[0], d[1]
            head_ok[j] = int(all(
                d[b] == x[b] and d[b + 1] == x[b + 1]
                for b in range(0, N, SPB)))
            err = (d - x).astype(np.float64)
            snr = 10 * np.log10(
                (x.astype(np.float64) ** 2).mean()
                / max((err ** 2).mean(), 1e-30))
            snr_ok[j] = int(snr > 15.0)
        return pa.Table.from_pydict({
            "c_custkey": t["c_custkey"],
            "s0": pa.array(s0), "s1": pa.array(s1),
            "n_samples": pa.array(np.full(len(keys), N, np.int64)),
            "head_ok": pa.array(head_ok),
            "snr_ok": pa.array(snr_ok)})

    return (_read(sf_dir, "customer", ["c_custkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=128))


SQL_Q98 = """
SELECT c_custkey,
       (ABS((c_custkey * 37 % 510) - 255) - 128) * 64 AS s0,
       (ABS(((c_custkey * 37 + (c_custkey % 7) + 3) % 510) - 255)
        - 128) * 64 AS s1,
       CAST(600 AS BIGINT) AS n_samples,
       CAST(1 AS BIGINT) AS head_ok,
       CAST(1 AS BIGINT) AS snr_ok
FROM customer
"""


def _ensure_osm_fixture(sf_dir):
    """Deterministic OSM PBF derived from the customer keys: one node
    per key k at nano-degree (((131k mod 1.7e6)·100 − 8.5e7),
    ((977k mod 3.5e6)·100 − 1.75e8)); one 3-node way per k ≡ 0 (mod 5)
    with refs [k, k+1, k+2] tagged highway=residential.  Written
    multi-block (block_size=512) so the query's blob decode fans out;
    atomically published under the fixture cache."""
    import pyarrow.parquet as pq

    from .io.osmpbf import write_osm_pbf
    from .pipelines import _CACHE_ROOT

    keys = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"])["c_custkey"].to_numpy()
    keys = np.sort(keys.astype(np.int64))
    n = len(keys)
    out = os.path.join(_CACHE_ROOT, f"osm_{n}")
    marker = os.path.join(out, "_SUCCESS")
    path = os.path.join(out, "data.osm.pbf")
    if not os.path.exists(marker):
        os.makedirs(_CACHE_ROOT, exist_ok=True)
        import shutil

        tmp = f"{out}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        lat = (keys * 131 % 1_700_000) * 100 - 85_000_000
        lon = (keys * 977 % 3_500_000) * 100 - 175_000_000
        nodes = pa.table({
            "id": pa.array(keys),
            "lat_nano": pa.array(lat),
            "lon_nano": pa.array(lon),
            "keys": pa.array([[]] * n, pa.list_(pa.string())),
            "vals": pa.array([[]] * n, pa.list_(pa.string()))})
        wk = keys[(keys % 5 == 0) & (keys + 2 <= keys.max())]
        ways = pa.table({
            "id": pa.array(wk),
            "refs": pa.array([[int(k), int(k) + 1, int(k) + 2]
                              for k in wk], pa.list_(pa.int64())),
            "keys": pa.array([["highway"]] * len(wk),
                             pa.list_(pa.string())),
            "vals": pa.array([["residential"]] * len(wk),
                             pa.list_(pa.string()))})
        with open(os.path.join(tmp, "data.osm.pbf"), "wb") as f:
            f.write(write_osm_pbf(nodes, ways, block_size=512))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        try:
            os.replace(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def q99_osm_way_assembly(sf_dir):
    """OSM PBF way-geometry assembly as a DISTRIBUTED join, oracled
    in SQL.

    The reference's OSM driver resolves way node refs through a
    custom on-disk point store filled while streaming the file
    (ogr/ogrsf_frmts/osm/ogrosmdatasource.cpp IndexPoint /
    LookupNodes); the Ray-native shape is: blob index → parallel
    blob decode (map_batches over the OSMData frames, payloads never
    on the driver) → explode way refs to (way_id, seq, ref) → hash
    join against the node table → groupby(way_id) assembly of
    LineString WKB.  Emitted endpoints are recovered FROM the
    assembled WKB, so ref order, the join, and the geometry encode
    all sit on the oracle path."""
    import ray
    import ray.data

    from .io.osmpbf import osm_blob_index, read_osm_blob

    path = _ensure_osm_fixture(sf_dir)
    blobs = [r for r in osm_blob_index(path) if r["btype"] == "OSMData"]

    class DecodeNodes:
        def __init__(self, p):
            self.p = p

        def __call__(self, t: pa.Table) -> pa.Table:
            parts = [read_osm_blob(self.p, o, s)["nodes"]
                     for o, s in zip(t["offset"].to_pylist(),
                                     t["size"].to_pylist())]
            merged = pa.concat_tables(parts)
            return merged.select(["id", "lat_nano", "lon_nano"])

    class DecodeWays:
        def __init__(self, p):
            self.p = p

        def __call__(self, t: pa.Table) -> pa.Table:
            parts = [read_osm_blob(self.p, o, s)["ways"]
                     for o, s in zip(t["offset"].to_pylist(),
                                     t["size"].to_pylist())]
            w = pa.concat_tables(parts)
            wid = np.asarray(w["id"], np.int64)
            refs = w["refs"].combine_chunks()
            offs = refs.offsets.to_numpy()
            flat = refs.values.to_numpy().astype(np.int64)
            lens = np.diff(offs)
            way_rep = np.repeat(wid, lens)
            seq = np.arange(len(flat), dtype=np.int64) \
                - np.repeat(offs[:-1], lens)
            kl = w["keys"].to_pylist()
            vl = w["vals"].to_pylist()
            hw = [vl[i][kl[i].index("highway")]
                  if "highway" in kl[i] else "" for i in range(len(wid))]
            return pa.table({
                "way_id": pa.array(way_rep),
                "seq": pa.array(seq),
                "ref": pa.array(flat),
                "highway": pa.array(np.repeat(np.asarray(hw, object),
                                              lens).tolist(),
                                    pa.string())})

    src = ray.data.from_items(blobs)
    nodes = src.map_batches(DecodeNodes, batch_format="pyarrow",
                            fn_constructor_args=(path,), concurrency=2)
    ways = src.map_batches(DecodeWays, batch_format="pyarrow",
                           fn_constructor_args=(path,), concurrency=2)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, cpus // 2))
    j = ways.join(nodes, "inner", nparts,
                  on=("ref",), right_on=("id",),
                  aggregator_ray_remote_args={"num_cpus": 0.25})

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seq")
        lon = g["lon_nano"].to_numpy() * 1e-9
        lat = g["lat_nano"].to_numpy() * 1e-9
        wkb = struct.pack("<BII", 1, 2, len(g)) + np.column_stack(
            [lon, lat]).astype("<f8").tobytes()
        # recover endpoints FROM the WKB just built
        xy = np.frombuffer(wkb[9:], "<f8").reshape(-1, 2)
        return pd.DataFrame({
            "way_id": [int(g["way_id"].iloc[0])],
            "npts": [len(g)],
            "lat0_nano": [int(round(xy[0, 1] * 1e9))],
            "lon0_nano": [int(round(xy[0, 0] * 1e9))],
            "lat2_nano": [int(round(xy[-1, 1] * 1e9))],
            "lon2_nano": [int(round(xy[-1, 0] * 1e9))],
            "highway": [g["highway"].iloc[0]]})

    return j.groupby("way_id").map_groups(assemble,
                                          batch_format="pandas")


SQL_Q99 = """
SELECT c_custkey AS way_id,
       CAST(3 AS BIGINT) AS npts,
       (c_custkey * 131 % 1700000) * 100 - 85000000 AS lat0_nano,
       (c_custkey * 977 % 3500000) * 100 - 175000000 AS lon0_nano,
       ((c_custkey + 2) * 131 % 1700000) * 100 - 85000000 AS lat2_nano,
       ((c_custkey + 2) * 977 % 3500000) * 100 - 175000000 AS lon2_nano,
       'residential' AS highway
FROM customer
WHERE c_custkey % 5 = 0
  AND c_custkey + 2 <= (SELECT MAX(c_custkey) FROM customer)
"""



def q100_new_reader_matrix(sf_dir):
    """Round-5 reader matrix for the HDF5 / S-57 / OpenFileGDB
    drivers: per nation key, synthesize one file per format with this
    repo's own minimal writers (``raydal.io.hdf5.write_hdf5``,
    ``raydal.io.s57.write_s57``, ``raydal.io.filegdb.write_filegdb``),
    decode it back through the full from-scratch readers (the same
    code paths that carry the reference's published goldens in
    pytest — u8be 135 / COALNE WKT / curves.gdb CSVs), and emit a
    value checksum the SQL oracle reproduces in closed form.

    hdf5: 64x64 int16 grid (577k + 13r + 29c + rc) % 1000, contiguous
    layout through superblock v0 + v1 object headers.
    jp2: the same grid through the lossless JPEG 2000 codec (5/3
    reversible DWT + MQ/EBCOT encode, decoded by the fixture-validated
    decoder).
    s57: 3 + k%5 isolated-node point features (VI nodes + FRID/FSPT),
    COMF 1000; val_sum recovers the integer XCOO/YCOO stream.
    gdb: point layer with an int32 attribute through the .gdbtable /
    .gdbtablx row + shape-blob codecs.
    """
    import os
    import shutil
    import tempfile

    from .io.filegdb import read_filegdb, write_filegdb
    from .io.hdf5 import read_hdf5, write_hdf5
    from .io.jp2 import decode_jp2, encode_jp2
    from .io.s57 import S57File, write_s57

    r64 = np.arange(64, dtype=np.int64)[:, None]
    c64 = np.arange(64, dtype=np.int64)[None, :]
    base64g = 13 * r64 + 29 * c64 + r64 * c64

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out_k, out_f, sums, mism = [], [], [], []
        tmp = tempfile.mkdtemp(prefix="raydal_q100_")
        try:
            for k in keys:
                k = int(k)
                n = 3 + k % 5

                # --- HDF5
                g16 = ((577 * k + base64g) % 1000).astype("<i2")
                dec = read_hdf5(write_hdf5(g16)).astype(np.int64)
                out_k.append(k)
                out_f.append("hdf5")
                sums.append(int(dec.sum()))
                mism.append(int((dec != g16).sum()))

                # --- S-57: VI point nodes + LNDMRK features
                m = S57File.__new__(S57File)
                m.dsid = {}
                m.dssi = {}
                m.comf = 1000.0
                m.somf = 10.0
                m.nall = 1
                m.nodes = {}
                m._fe = {}
                exp_ints = 0
                for i in range(n):
                    xi = 1000 * k + 7 * i
                    yi = 2000 * k + 11 * i
                    exp_ints += xi + yi
                    m.nodes[(110, i + 1)] = {
                        "coords": [(xi / 1000.0, yi / 1000.0)],
                        "z": [], "vrpt": [], "attrs": {}}
                    m._fe[i + 1] = {
                        "RCNM": 100, "RCID": i + 1, "PRIM": 1,
                        "GRUP": 2, "OBJL": 74, "RVER": 1,
                        "AGEN": 65535, "FIDN": k + 1, "FIDS": i + 1,
                        "LNAM": None, "attrs": {},
                        "fspt": [{"rcnm": 110, "rcid": i + 1,
                                  "ornt": 255, "usag": 255,
                                  "mask": 255}]}
                rt = S57File(write_s57(m))
                import struct as _st
                got = 0
                cnt = 0
                for row in rt.layer_table("LNDMRK").to_pylist():
                    x, y = _st.unpack("<2d", row["wkb"][5:21])
                    got += round(x * 1000) + round(y * 1000)
                    cnt += 1
                out_k.append(k)
                out_f.append("s57")
                sums.append(int(got))
                mism.append(int(cnt != n) + int(got != exp_ints))

                # --- OpenFileGDB point layer
                gdir = os.path.join(tmp, f"k{k}.gdb")
                rows = [{"SHAPE": (k + i / 10.0, 2 * k + i / 10.0),
                         "val": (577 * k + 13 * i) % 1000}
                        for i in range(n)]
                write_filegdb(gdir, {"pts": rows})
                tbl = read_filegdb(gdir, "pts").to_pylist()
                vsum = sum(r2["val"] + r2["OBJECTID"] for r2 in tbl)
                exp = sum((577 * k + 13 * i) % 1000 + i + 1
                          for i in range(n))
                out_k.append(k)
                out_f.append("gdb")
                sums.append(int(vsum))
                mism.append(int(len(tbl) != n) + int(vsum != exp))

                # --- JPEG 2000: lossless 5/3 round trip (32x32
                # keeps the pure-Python T1 pass cheap in the gate)
                j16 = ((577 * k + base64g[:32, :32]) % 1000) \
                    .astype(np.int16)
                dec2 = np.asarray(
                    decode_jp2(encode_jp2(j16, nlevels=3))[0],
                    np.int64)
                out_k.append(k)
                out_f.append("jp2")
                sums.append(int(dec2.sum()))
                mism.append(int((dec2 != j16).sum()))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(
                out_k, t.schema.field("n_nationkey").type),
            "fmt": pa.array(out_f, pa.string()),
            "val_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


SQL_Q100 = """
WITH h AS (
  SELECT n_nationkey, 'hdf5' AS fmt,
         CAST(SUM((577 * n_nationkey + 13 * r.g + 29 * c.g
                   + r.g * c.g) % 1000) AS BIGINT) AS val_sum
  FROM nation,
       generate_series(0, 63) r(g), generate_series(0, 63) c(g)
  GROUP BY n_nationkey
), j AS (
  SELECT n_nationkey, 'jp2' AS fmt,
         CAST(SUM((577 * n_nationkey + 13 * r.g + 29 * c.g
                   + r.g * c.g) % 1000) AS BIGINT) AS val_sum
  FROM nation,
       generate_series(0, 31) r(g), generate_series(0, 31) c(g)
  GROUP BY n_nationkey
), s AS (
  SELECT n_nationkey, 's57' AS fmt,
         CAST(SUM(1000 * n_nationkey + 7 * i.g
                  + 2000 * n_nationkey + 11 * i.g) AS BIGINT)
           AS val_sum
  FROM nation, generate_series(0, 7) i(g)
  WHERE i.g < 3 + n_nationkey % 5
  GROUP BY n_nationkey
), g AS (
  SELECT n_nationkey, 'gdb' AS fmt,
         CAST(SUM((577 * n_nationkey + 13 * i.g) % 1000 + i.g + 1)
              AS BIGINT) AS val_sum
  FROM nation, generate_series(0, 7) i(g)
  WHERE i.g < 3 + n_nationkey % 5
  GROUP BY n_nationkey
)
SELECT n_nationkey, fmt, val_sum, CAST(0 AS BIGINT) AS mismatch
FROM (SELECT * FROM h UNION ALL SELECT * FROM j
      UNION ALL SELECT * FROM s UNION ALL SELECT * FROM g)
"""


def q101_gnm_sssp(sf_dir):
    """Distributed single-source shortest paths (GNM,
    ``gnm/gnmgraph.cpp`` DijkstraShortestPathTree semantics) over a
    deterministic 10x10 grid DAG derived from the customer table:
    node v = c_custkey < 100, out-edges right (v+1) and down (v+10),
    both costing 1 + (|acctbal| cents % 100)/100.  The engine side is
    :func:`raydal.ops.gnm.sssp_dataset` — Bellman-Ford as iterative
    vectorized edge relaxations with a broadcast frontier; the oracle
    is a recursive-CTE walk (exact same per-path float accumulation
    order, so values hash-match)."""
    import numpy as np

    from .ops.gnm import sssp_dataset

    def edges(t: pa.Table) -> pa.Table:
        v = np.asarray(t["c_custkey"], dtype=np.int64)
        bal = np.asarray(t["c_acctbal"], dtype=np.float64)
        keep = v < 100
        v, bal = v[keep], bal[keep]
        w = 1.0 + (np.floor(np.abs(bal) * 100 + 0.5).astype(np.int64)
                   % 100) / 100.0
        right = v % 10 < 9
        down = v < 90
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([v[right], v[down]]),
                            pa.int64()),
            "tgt": pa.array(np.concatenate([v[right] + 1, v[down] + 10]),
                            pa.int64()),
            "cost": pa.array(np.concatenate([w[right], w[down]]),
                             pa.float64())})

    eds = _read(sf_dir, "customer",
                columns=["c_custkey", "c_acctbal"]).map_batches(
        edges, batch_format="pyarrow")
    out = sssp_dataset(eds, 0, directed=True, max_rounds=24)
    # costs are whole cents, so the exact-integer cents view sidesteps
    # ULP differences between the two engines' float formatting
    cents = np.floor(np.asarray(out["dist"]) * 100 + 0.5).astype(
        np.int64)
    return out.set_column(1, "dist_cents", pa.array(cents, pa.int64()))


SQL_Q101 = """
WITH RECURSIVE nodes AS (
  SELECT c_custkey AS v,
         1.0 + CAST(CAST(FLOOR(ABS(c_acctbal) * 100 + 0.5) AS BIGINT)
                    % 100 AS DOUBLE) / 100.0 AS w
  FROM customer WHERE c_custkey < 100
), edges AS (
  SELECT v AS src, v + 1 AS tgt, w AS cost FROM nodes WHERE v % 10 < 9
  UNION ALL
  SELECT v AS src, v + 10 AS tgt, w AS cost FROM nodes WHERE v < 90
), walk(v, d) AS (
  SELECT 0, CAST(0.0 AS DOUBLE)
  UNION ALL
  SELECT e.tgt, walk.d + e.cost FROM walk JOIN edges e ON e.src = walk.v
)
SELECT CAST(v AS BIGINT) AS vertex,
       CAST(FLOOR(MIN(d) * 100 + 0.5) AS BIGINT) AS dist_cents
FROM walk GROUP BY v ORDER BY vertex
"""


def q102_style_explode(sf_dir):
    """OGR feature-style strings (``ogr/ogrfeaturestyle.cpp`` parity):
    build a deterministic multi-part style per nation, parse+explode it
    with :func:`raydal.ops.featurestyle.explode_style_column`, and
    return the long-format parameter rows.  The oracle reconstructs the
    same rows closed-form, so the parse path (quote handling, unit
    stripping, table-order params) is what's actually under test."""
    from .ops.featurestyle import explode_style_column

    def styles(t: pa.Table) -> pa.Table:
        import numpy as np

        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        names = t["n_name"].to_pylist()
        ss = [
            f'BRUSH(fc:#00ff{(k * 9) % 256:02x});'
            f'PEN(c:#ff00{(k * 17) % 256:02x},w:{k + 1}px);'
            f'LABEL(f:Arial,s:{k + 2}pt,t:"{nm}, state")'
            for k, nm in zip(keys, names)]
        return pa.Table.from_pydict({
            "fid": pa.array(keys, pa.int64()),
            "style": pa.array(ss, pa.string())})

    ds = _read(sf_dir, "nation",
               columns=["n_nationkey", "n_name"]).map_batches(
        styles, batch_format="pyarrow")
    return explode_style_column(ds, "style", id_col="fid")


SQL_Q102 = """
WITH n AS (SELECT n_nationkey AS k, n_name AS nm FROM nation)
SELECT * FROM (
  SELECT CAST(k AS BIGINT) AS id, CAST(0 AS INTEGER) AS part,
         'BRUSH' AS tool, 'fc' AS param,
         '#00ff' || printf('%02x', (k * 9) % 256) AS value,
         CAST(NULL AS VARCHAR) AS unit FROM n
  UNION ALL
  SELECT k, 1, 'PEN', 'c', '#ff00' || printf('%02x', (k * 17) % 256),
         NULL FROM n
  UNION ALL
  SELECT k, 1, 'PEN', 'w', CAST(k + 1 AS VARCHAR) || '.0', 'px' FROM n
  UNION ALL
  SELECT k, 2, 'LABEL', 'f', 'Arial', NULL FROM n
  UNION ALL
  SELECT k, 2, 'LABEL', 's', CAST(k + 2 AS VARCHAR) || '.0', 'pt'
  FROM n
  UNION ALL
  SELECT k, 2, 'LABEL', 't', nm || ', state', NULL FROM n
) ORDER BY id, part, param
"""


def q103_mdim_translate(sf_dir):
    """GDAL multidim translate semantics (``gcore/gdalmultidim.cpp``
    GetView/Transpose; ``apps/gdalmdimtranslate_lib.cpp`` scaleaxes)
    driven end-to-end: per nation key, write a (t=4, y=16, x=16) int32
    HDF5 cube with this repo's writer, open it as an MDArray through
    the from-scratch HDF5 reader, apply scaleaxes(y=2) →
    view "[1:4,...]" → transpose [0,2,1], and emit each remaining
    time-slab's shape and sum.  The oracle reproduces the kept index
    set closed-form, so the view/subsample/transpose arithmetic is
    what's verified."""
    import os
    import tempfile

    from .io.hdf5 import write_hdf5
    from .ops.mdim import open_mdarray

    rr = np.arange(16, dtype=np.int64)[:, None]
    cc = np.arange(16, dtype=np.int64)[None, :]

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out = {"n_nationkey": [], "t": [], "h": [], "w": [],
               "slab_sum": []}
        tmp = tempfile.mkdtemp(prefix="raydal_q103_")
        try:
            for k in keys:
                k = int(k)
                cube = np.stack([
                    (31 * k + 5 * ti + 3 * rr + 7 * cc
                     + ti * rr * cc) % 100
                    for ti in range(4)]).astype("<i4")
                p = os.path.join(tmp, f"cube_{k}.h5")
                write_hdf5({"cube": cube}, p)
                md = open_mdarray(p, "cube",
                                  dim_names=["t", "y", "x"])
                view = (md.scaleaxes({"y": 2})
                        .get_view("[1:4,...]")
                        .transpose([0, 2, 1]))
                arr = view.read()
                for i in range(arr.shape[0]):
                    out["n_nationkey"].append(k)
                    out["t"].append(i + 1)
                    out["h"].append(arr.shape[1])
                    out["w"].append(arr.shape[2])
                    out["slab_sum"].append(int(arr[i].sum()))
        finally:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(out["n_nationkey"], pa.int64()),
            "t": pa.array(out["t"], pa.int64()),
            "h": pa.array(out["h"], pa.int64()),
            "w": pa.array(out["w"], pa.int64()),
            "slab_sum": pa.array(out["slab_sum"], pa.int64())})

    return _read(sf_dir, "nation",
                 columns=["n_nationkey"]).map_batches(
        fn, batch_format="pyarrow")


SQL_Q103 = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(t.g AS BIGINT) AS t,
       CAST(16 AS BIGINT) AS h, CAST(8 AS BIGINT) AS w,
       CAST(SUM((31 * n_nationkey + 5 * t.g + 3 * r.g + 7 * c.g
                 + t.g * r.g * c.g) % 100) AS BIGINT) AS slab_sum
FROM nation,
     generate_series(1, 3) t(g),
     generate_series(0, 14, 2) r(g),
     generate_series(0, 15) c(g)
GROUP BY n_nationkey, t.g
"""


def q104_superoverlay_roundtrip(sf_dir):
    """KML superoverlay write→read round trip
    (``frmts/kmlsuperoverlay`` CreateCopy semantics —
    raydal/io/kmlsuperoverlay.py): per nation key, a 416x416 uint8
    grid goes through the two-zoom pyramid writer (PNG tiles, alpha
    band, Lod/NetworkLink tree) and is reassembled by the reader from
    the deepest level; the oracle reproduces the grid sum closed-form,
    so any tile-placement, y-flip or codec defect breaks the hash."""
    import os
    import shutil
    import tempfile

    from .io.kmlsuperoverlay import (read_superoverlay,
                                     write_superoverlay)

    rr = np.arange(416, dtype=np.int64)[:, None]
    cc = np.arange(416, dtype=np.int64)[None, :]

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out = {"n_nationkey": [], "h": [], "w": [], "val_sum": []}
        tmp = tempfile.mkdtemp(prefix="raydal_q104_")
        try:
            for k in keys:
                k = int(k)
                grid = ((577 * k + 13 * rr + 29 * cc + rr * cc)
                        % 251).astype(np.uint8)
                d = os.path.join(tmp, f"ov_{k}")
                write_superoverlay(
                    grid, [0.0, 0.01, 0.0, 4.16, 0.0, -0.01], d)
                bands, _gt = read_superoverlay(d)
                out["n_nationkey"].append(k)
                out["h"].append(bands[0].shape[0])
                out["w"].append(bands[0].shape[1])
                out["val_sum"].append(
                    int(bands[0].astype(np.int64).sum()))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(out["n_nationkey"], pa.int64()),
            "h": pa.array(out["h"], pa.int64()),
            "w": pa.array(out["w"], pa.int64()),
            "val_sum": pa.array(out["val_sum"], pa.int64())})

    return _read(sf_dir, "nation",
                 columns=["n_nationkey"]).map_batches(
        fn, batch_format="pyarrow")


SQL_Q104 = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(416 AS BIGINT) AS h, CAST(416 AS BIGINT) AS w,
       CAST(SUM((577 * n_nationkey + 13 * r.g + 29 * c.g
                 + r.g * c.g) % 251) AS BIGINT) AS val_sum
FROM nation,
     generate_series(0, 415) r(g), generate_series(0, 415) c(g)
GROUP BY n_nationkey
"""


def q105_dup_ngram_docs(sf_dir):
    """Corpus-level duplicate n-gram detection — the exact-substring
    dedup primitive (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022) in fixed 4-gram form: a 4-gram
    is *duplicated* when it appears in ≥ 2 distinct documents; output
    is (doc_id, n_dup_grams) for every document containing at least
    one.

    Distributed shape: tokenize + gram inside ``map_batches`` (each
    doc's text lives in one row, so per-doc gram dedup is in-batch);
    the ONLY wide exchange is the ``groupby`` on the 63-bit gram hash
    (grams themselves never shuffle — at 100 TB the hash keeps
    exchange rows at 16 bytes); the per-doc count is a second tiny
    groupby over (doc, gram) pairs that survive the ≥2-docs gate."""
    import hashlib

    import ray.data

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tok_re = re.compile(r"[^a-z0-9]+")

    def grams(t: pa.Table) -> pa.Table:
        ghs, dids = [], []
        for i in range(t.num_rows):
            did = t["doc_id"][i].as_py()
            toks = [x for x in tok_re.split(t["text"][i].as_py().lower())
                    if x]
            seen = set()
            for j in range(len(toks) - 3):
                g = " ".join(toks[j:j + 4])
                if g not in seen:
                    seen.add(g)
                    ghs.append(int.from_bytes(
                        hashlib.md5(g.encode()).digest()[:8],
                        "big") >> 1)
                    dids.append(did)
        return pa.Table.from_pydict({
            "gh": pa.array(ghs, pa.int64()),
            "doc_id": pa.array(dids, pa.int64())})

    pairs = ds.map_batches(grams, batch_format="pyarrow")

    # (1) docs-per-gram aggregate, (2) keep grams on ≥2 docs, (3) hash
    # join the pair stream back on the gram hash, (4) per-doc count.
    # No per-group Python: two aggregates + one equi join, all keyed on
    # the same 63-bit hash.
    import ray

    per_gram = pairs.groupby("gh").count()
    dup = per_gram.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count()"], 2))
                   .select(["gh"]),
        batch_format="pyarrow")
    # partition count scales with the cluster, not a constant — at
    # 100 TB the gram-hash join is the widest exchange in the query
    nparts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    joined = pairs.join(dup, join_type="inner",
                        num_partitions=nparts, on=("gh",))
    out = joined.groupby("doc_id").count()

    def rename(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_dup_grams": t["count()"].cast(pa.int64())})

    return out.map_batches(rename, batch_format="pyarrow")


SQL_Q105 = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS t
    FROM documents),
g AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS gram
    FROM toks, LATERAL (SELECT UNNEST(range(1, len(t) - 2)) AS i) r),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
FROM g WHERE gram IN (SELECT gram FROM dup)
GROUP BY doc_id
"""


def q106_kmeans_assign(sf_dir):
    """K-means ASSIGNMENT step over the embedding column with
    deterministic seed centroids (the first K=8 vectors by vec_id —
    the bootstrap round of any distributed Lloyd iteration, and the
    IVF-Flat coarse-assignment primitive of raydal/ops/ann.py): per
    cluster, member count and mean Euclidean distance.

    Distributed shape: the K seed vectors are collected once (a
    metadata-sized filter) and broadcast inside the batch closure;
    every batch computes its (n, K) distance block vectorized and
    emits per-cluster PARTIALS (count, dist sum) — the only shuffle
    is the K-row final groupby.  Ties (a vector equidistant to two
    centroids) break to the lowest cluster id on both sides."""
    import ray.data

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    K = 8
    seed_t = pa.concat_tables(
        b for b in emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], K)),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    order = np.argsort(np.asarray(seed_t["vec_id"]))
    C = np.stack([np.asarray(seed_t["embedding"][int(i)].as_py(),
                             dtype=np.float64) for i in order])

    def assign(t: pa.Table, _C=C) -> pa.Table:
        A = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        d2 = ((A[:, None, :] - _C[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d2, axis=1)        # first min → lowest cid
        dist = np.sqrt(d2[np.arange(len(A)), cid])
        cnt = np.bincount(cid, minlength=len(_C))
        dsum = np.bincount(cid, weights=dist, minlength=len(_C))
        nz = cnt > 0
        return pa.Table.from_pydict({
            "cluster_id": pa.array(np.nonzero(nz)[0].astype(np.int64)),
            "n_partial": pa.array(cnt[nz].astype(np.int64)),
            "dsum_partial": pa.array(dsum[nz], pa.float64())})

    parts = emb.map_batches(assign, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n_partial"].sum())
        return pd.DataFrame({
            "cluster_id": [int(g["cluster_id"].iloc[0])],
            "n_vecs": [n],
            "avg_dist": [float(round_half_away(
                g["dsum_partial"].sum() / n, 6))]})

    return parts.groupby("cluster_id").map_groups(finish,
                                                  batch_format="pandas")


SQL_Q106 = """
WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE vec_id < 8),
d AS (SELECT e.vec_id, c.cid, list_distance(e.embedding, c.cv) AS dist
      FROM embeddings e CROSS JOIN c),
a AS (SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cid) AS rn
      FROM d)
SELECT CAST(cid AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       ROUND(avg(dist), 6) AS avg_dist
FROM a WHERE rn = 1 GROUP BY cid
"""


def q107_stratified_sample(sf_dir):
    """Deterministic hash-stratified downsampling — the corpus-balance
    primitive of a training-data pipeline (cap every language stratum
    at ``TARGET`` docs): keep a doc iff the first 32 bits of
    ``md5(doc_id)`` fall under ``floor(TARGET/stratum_count * 2^32)``.
    Content-addressed sampling is reproducible across engines, runs and
    shard layouts — no RNG state, no ordering dependence.

    Distributed shape: stratum counts come from per-batch PARTIAL
    counts merged on the driver (one tiny row per batch — bounded by
    #strata, never a shuffle); the keep thresholds broadcast inside
    the filter closure; the filter pass is embarrassingly parallel."""
    import hashlib

    import ray.data

    TARGET = 60.0
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def counts(t: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter(t["lang"].to_pylist())
        return pa.Table.from_pydict({
            "lang": pa.array(list(c.keys()), pa.string()),
            "n": pa.array([int(v) for v in c.values()], pa.int64())})

    merged = {}
    for b in ds.map_batches(counts, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for lang, n in zip(b["lang"].to_pylist(), b["n"].to_pylist()):
            merged[lang] = merged.get(lang, 0) + n
    # float64 arithmetic identical to the SQL side: (T/n) * 2^32, floor
    thresholds = {lang: int(np.floor((TARGET / n) * 4294967296.0))
                  for lang, n in merged.items()}

    def keep(t: pa.Table, _th=thresholds) -> pa.Table:
        ks = []
        langs = t["lang"].to_pylist()
        for i, did in enumerate(t["doc_id"].to_pylist()):
            h = int.from_bytes(
                hashlib.md5(str(did).encode()).digest()[:4], "big")
            ks.append(h < _th[langs[i]])
        return t.filter(pa.array(ks))

    return ds.map_batches(keep, batch_format="pyarrow")


SQL_Q107 = """
WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
th AS (SELECT lang,
              CAST(FLOOR((60.0 / n) * 4294967296.0) AS UBIGINT) AS t
       FROM cnt)
SELECT d.doc_id, d.lang
FROM documents d JOIN th USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS UBIGINT) < th.t
"""


def q108_bm25_topk(sf_dir):
    """BM25 (Okapi, k1=1.2 b=0.75) keyword top-k over the documents
    table — the retrieval primitive of a dedup-by-search / data-mixing
    pipeline.  Query terms: table, scan, merge; output the top 10 docs
    by ROUND(score, 6) with doc_id tie-break (rounding on BOTH sides
    absorbs float-sum ordering ulp).

    Distributed shape — NO shuffle anywhere: pass A streams per-batch
    PARTIAL stats (doc count, token-length sum, per-term doc
    frequency; each doc's text lives in one row so df partials are
    in-batch exact); the driver merges the bounded partials and
    broadcasts (N, avgdl, df) into pass B, where every batch scores
    its docs vectorized and emits its LOCAL top-10 — the driver merges
    ≤ 10·n_batches candidate rows."""
    import heapq

    import ray.data

    TERMS = ("table", "scan", "merge")
    K1, B = 1.2, 0.75
    tok_re = re.compile(r"[^a-z0-9]+")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats_partial(t: pa.Table) -> pa.Table:
        n, dl_sum = 0, 0
        df = {w: 0 for w in TERMS}
        for txt in t["text"].to_pylist():
            toks = [x for x in tok_re.split(txt.lower()) if x]
            n += 1
            dl_sum += len(toks)
            s = set(toks)
            for w in TERMS:
                if w in s:
                    df[w] += 1
        return pa.Table.from_pydict({
            "n": pa.array([n], pa.int64()),
            "dl_sum": pa.array([dl_sum], pa.int64()),
            **{f"df_{w}": pa.array([df[w]], pa.int64())
               for w in TERMS}})

    N = dl_sum = 0
    DF = {w: 0 for w in TERMS}
    for b in ds.map_batches(stats_partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            N += b["n"][i].as_py()
            dl_sum += b["dl_sum"][i].as_py()
            for w in TERMS:
                DF[w] += b[f"df_{w}"][i].as_py()
    avgdl = dl_sum / N
    idf = {w: np.log((N - DF[w] + 0.5) / (DF[w] + 0.5) + 1.0)
           for w in TERMS}

    def topk_partial(t: pa.Table, _idf=idf, _avgdl=avgdl) -> pa.Table:
        cand = []
        for i, txt in enumerate(t["text"].to_pylist()):
            toks = [x for x in tok_re.split(txt.lower()) if x]
            dl = len(toks)
            score = 0.0
            for w in TERMS:          # fixed term order = SQL-free sum
                tf = toks.count(w)
                if tf:
                    score += (_idf[w] * tf * (K1 + 1.0)
                              / (tf + K1 * (1.0 - B + B * dl / _avgdl)))
            if score > 0.0:
                cand.append((float(round_half_away(score, 6)),
                             t["doc_id"][i].as_py()))
        top = heapq.nsmallest(10, cand, key=lambda sd: (-sd[0], sd[1]))
        return pa.Table.from_pydict({
            "doc_id": pa.array([d for _, d in top], pa.int64()),
            "score": pa.array([s for s, _ in top], pa.float64())})

    cand = pa.concat_tables(
        b for b in ds.map_batches(topk_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    rows = sorted(zip(cand["score"].to_pylist(),
                      cand["doc_id"].to_pylist()),
                  key=lambda sd: (-sd[0], sd[1]))[:10]
    return pa.Table.from_pydict({
        "doc_id": pa.array([d for _, d in rows], pa.int64()),
        "score": pa.array([s for s, _ in rows], pa.float64())})


SQL_Q108 = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS t
    FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM toks, LATERAL (SELECT UNNEST(t) AS term) u
       WHERE term IN ('table', 'scan', 'merge')
       GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              SUM(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1.0 - 0.75
                                    + 0.75 * dl.dl / s.avgdl))) AS sc
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
       CROSS JOIN stats s
       GROUP BY tf.doc_id)
SELECT doc_id, ROUND(sc, 6) AS score
FROM sc ORDER BY ROUND(sc, 6) DESC, doc_id LIMIT 10
"""


def q110_pixel_info(sf_dir):
    """Driver-visible oracle for the ``InterpolateAtPoint`` kernel
    (``alg/gdal_interpolateatpoint.cpp`` corner-based bilinear, the
    `raster pixel-info` CLI verb / gdallocationinfo): per nation, a
    16×16 integer-LCG band is sampled at 4 interior fractional points
    whose bilinear value the SQL oracle reproduces arithmetically.
    Exactness: band values and point coordinates are integer-derived
    (exact in both engines); the bilinear blend is 3 multiplies/adds
    of exact dyadic fractions, rounded to 6 on both sides."""
    import ray.data

    from .kernels.resample import interpolate_at_point

    rr = np.arange(16, dtype=np.int64)[:, None]
    cc = np.arange(16, dtype=np.int64)[None, :]

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out = {"n_nationkey": [], "pt": [], "value": []}
        for k in keys:
            k = int(k)
            band = ((31 * k + 7 * rr + 11 * cc + rr * cc) % 97) \
                .astype(np.float64)
            for j in range(4):
                # interior corner-based coords in [1.25, 14.75]:
                # x = 1 + ((k*4+j) % 14) + j/4 keeps a dyadic frac
                x = 1.0 + ((k * 4 + j) % 13) + j / 4.0
                y = 1.0 + ((k * 5 + j) % 13) + (3 - j) / 4.0
                v = interpolate_at_point(band, x, y,
                                         resample="bilinear")
                out["n_nationkey"].append(k)
                out["pt"].append(j)
                out["value"].append(float(round_half_away(v, 6)))
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(out["n_nationkey"], pa.int64()),
            "pt": pa.array(out["pt"], pa.int64()),
            "value": pa.array(out["value"], pa.float64())})

    return _read(sf_dir, "nation", ["n_nationkey"]) \
        .map_batches(fn, batch_format="pyarrow")


# InterpolateAtPoint's corner-based convention: sample coordinate
# (x, y) lies between pixel centers (x-0.5, y-0.5); with interior
# points, ix = floor(x-0.5), fx = (x-0.5) - ix and the 4-tap blend.
SQL_Q110 = """
WITH pts AS (
    SELECT n_nationkey AS k, j.j AS pt,
           1.0 + ((n_nationkey * 4 + j.j) % 13) + j.j / 4.0 AS x,
           1.0 + ((n_nationkey * 5 + j.j) % 13) + (3 - j.j) / 4.0 AS y
    FROM nation, (SELECT UNNEST(RANGE(0, 4)) AS j) j),
g AS (
    SELECT k, pt,
           CAST(FLOOR(x - 0.5) AS BIGINT) AS ix,
           CAST(FLOOR(y - 0.5) AS BIGINT) AS iy,
           (x - 0.5) - FLOOR(x - 0.5) AS fx,
           (y - 0.5) - FLOOR(y - 0.5) AS fy
    FROM pts)
SELECT CAST(k AS BIGINT) AS n_nationkey, pt,
       ROUND((1 - fy) * ((1 - fx) * ((31*k + 7*iy + 11*ix + iy*ix) % 97)
                         + fx * ((31*k + 7*iy + 11*(ix+1) + iy*(ix+1)) % 97))
             + fy * ((1 - fx) * ((31*k + 7*(iy+1) + 11*ix + (iy+1)*ix) % 97)
                     + fx * ((31*k + 7*(iy+1) + 11*(ix+1) + (iy+1)*(ix+1)) % 97)),
             6) AS value
FROM g
"""


def _ensure_zarr_fixture(keys):
    """Deterministic multi-chunk zarr v2 store: one 33×21 uint8 grid
    per nation key, value ``(13k + 5r + 3c + rc) % 251``, chunks
    [1, 16, 16] (edge chunks exercised: 33 % 16, 21 % 16), zlib.
    Cached under the size+keysum-keyed dir like the fgb fixture."""
    from .io.zarr import write_zarr
    from .pipelines import _CACHE_ROOT

    d = os.path.join(_CACHE_ROOT,
                     f"zarr_rt_{len(keys)}_{sum(keys)}")
    store = os.path.join(d, "grids.zarr")
    marker = os.path.join(d, ".done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        k = np.asarray(sorted(keys), np.int64)[:, None, None]
        r = np.arange(33, dtype=np.int64)[None, :, None]
        c = np.arange(21, dtype=np.int64)[None, None, :]
        data = ((13 * k + 5 * r + 3 * c + r * c) % 251).astype(
            np.uint8)
        write_zarr(store, data, chunks=[1, 16, 16],
                   compressor="zlib", dim_names=["k", "y", "x"])
        with open(marker, "w") as f:
            f.write("ok")
    return store


def q111_zarr_roundtrip(sf_dir):
    """Zarr store round-trip through the CHUNK-PARALLEL read path,
    oracled in SQL (reference: ``frmts/zarr/zarr_v2_array.cpp``
    chunk grid + zlib decode, ``autotest/gdrivers/zarr_driver.py``).

    Per nation key a deterministic uint8 grid is written into one
    3-D zarr array (chunks [1,16,16], zlib); the query reads it back
    via ``open_source("zarr-chunks", …)`` — one Ray task per stored
    chunk, the driver ships only (path, chunk index) metadata — and
    aggregates sum/min/max per chunk.  The oracle recomputes the
    exact per-chunk integer stats from the generator formula, so any
    bug in the v2 writer, zlib codec, chunk keying, edge-chunk
    clipping, or the fan-out decode breaks parity."""
    import ray.data  # noqa: F401  (open_source builds the Dataset)

    from .pipeline import open_source

    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    keys = sorted(int(r["n_nationkey"]) for r in nat)
    store = _ensure_zarr_fixture(keys)
    ds = open_source("zarr-chunks", store)
    cid_re = re.compile(r"_c(\d+)_(\d+)_(\d+)$")

    def stats(t: pa.Table) -> pa.Table:
        out = {"n_nationkey": [], "cy": [], "cx": [], "px_sum": [],
               "px_min": [], "px_max": [], "n_px": []}
        for i in range(t.num_rows):
            m = cid_re.search(t["image_id"][i].as_py())
            ki, cy, cx = (int(g) for g in m.groups())
            a = np.frombuffer(t["data"][i].as_py(), np.uint8)
            out["n_nationkey"].append(keys[ki])
            out["cy"].append(cy)
            out["cx"].append(cx)
            out["px_sum"].append(int(a.sum()))
            out["px_min"].append(int(a.min()))
            out["px_max"].append(int(a.max()))
            out["n_px"].append(a.size)
        return pa.Table.from_pydict(
            {k: pa.array(v, pa.int64()) for k, v in out.items()})

    return ds.map_batches(stats, batch_format="pyarrow")


SQL_Q111 = """
WITH cells AS (
    SELECT n_nationkey AS k, r.r AS r, c.c AS c,
           (13 * n_nationkey + 5 * r.r + 3 * c.c + r.r * c.c) % 251
               AS v
    FROM nation,
         (SELECT UNNEST(RANGE(0, 33)) AS r) r,
         (SELECT UNNEST(RANGE(0, 21)) AS c) c)
SELECT CAST(k AS BIGINT) AS n_nationkey,
       CAST(r // 16 AS BIGINT) AS cy,
       CAST(c // 16 AS BIGINT) AS cx,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS BIGINT) AS px_min,
       CAST(MAX(v) AS BIGINT) AS px_max,
       CAST(COUNT(*) AS BIGINT) AS n_px
FROM cells
GROUP BY 1, 2, 3
"""


def _ensure_pmtiles_fixture(keys):
    """Deterministic PMTiles v3 archive: per nation key one z=5 MVT
    tile at (k%32, (3k)%32) holding a ``feat`` layer with
    ``3 + k%4`` point features at tile coords
    ``((37k+101j)%4096, (53k+211j)%4096)`` (id ``100k+j``) plus one
    square polygon at ``a=(29k)%3000, b=(41k)%3000,
    s=64+16*(k%5)`` (id ``100k+99``).  Cached under the
    size+keysum-keyed dir like the zarr fixture."""
    from .io.pmtiles import write_pmtiles_features
    from .pipelines import _CACHE_ROOT

    d = os.path.join(_CACHE_ROOT,
                     f"pmtiles_rt_{len(keys)}_{sum(keys)}")
    path = os.path.join(d, "feats.pmtiles")
    marker = os.path.join(d, ".done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        feats_by_tile = {}
        for k in sorted(keys):
            feats = []
            for j in range(3 + k % 4):
                u = (37 * k + 101 * j) % 4096
                v = (53 * k + 211 * j) % 4096
                feats.append({"id": 100 * k + j, "type": 1,
                              "tags": {"k": k, "j": j},
                              "parts": [np.array([[u, v]], np.int64)]})
            a, b = (29 * k) % 3000, (41 * k) % 3000
            s = 64 + 16 * (k % 5)
            ring = np.array([[a, b], [a + s, b], [a + s, b + s],
                             [a, b + s]], np.int64)
            feats.append({"id": 100 * k + 99, "type": 3,
                          "tags": {"k": k}, "parts": [ring]})
            feats_by_tile[(5, k % 32, (3 * k) % 32)] = feats
        write_pmtiles_features(path, feats_by_tile, layer="feat",
                               min_zoom=5, max_zoom=5)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def q112_pmtiles_roundtrip(sf_dir):
    """PMTiles/MVT round-trip through the TILE-PARALLEL source,
    oracled in SQL (reference: ``ogr/ogrsf_frmts/pmtiles/`` header +
    varint directories, ``ogr/ogrsf_frmts/mvt/mvt_tile.cpp`` tile
    protobuf; semantics per ``autotest/ogr/ogr_pmtiles.py``).

    Per nation key, deterministic point + polygon features are MVT-
    encoded into one z=5 tile and archived (gzip'd directories, data
    dedup).  The query reads the archive back via
    ``open_source("pmtiles", …)`` — the driver ships only (z, x, y)
    ids from the directory; workers pread + decode their own tiles —
    then inverts the tile→EPSG:3857 georeferencing to recover the
    integer tile coordinates and aggregates per key.  Any bug in the
    Hilbert tile ids, directory varints, protobuf codec, zigzag
    geometry deltas, ring winding, or the 3857 transform breaks
    parity with the closed-form oracle."""
    import ray.data  # noqa: F401  (open_source builds the Dataset)
    from ray.data.aggregate import Sum

    from .geo.wkb import _iter_coord_arrays, parse_wkb
    from .pipeline import open_source

    nat = _read(sf_dir, "nation", ["n_nationkey"]).take_all()
    keys = sorted(int(r["n_nationkey"]) for r in nat)
    path = _ensure_pmtiles_fixture(keys)
    ds = open_source("pmtiles", path)
    E = 20037508.342789244

    def partial(t: pa.Table) -> pa.Table:
        out = {"n_nationkey": [], "n_points": [], "n_polys": [],
               "pt_u_sum": [], "pt_v_sum": [], "poly_u_sum": [],
               "poly_v_sum": []}
        size = 2.0 * E / (1 << 5)
        for i in range(t.num_rows):
            k = int(t["mvt_id"][i].as_py()) // 100
            tx = int(t["tile_x"][i].as_py())
            ty = int(t["tile_y"][i].as_py())
            us = vs = 0
            for arr in _iter_coord_arrays(
                    parse_wkb(t["wkb"][i].as_py())):
                u = np.rint(((arr[:, 0] + E) / size - tx) * 4096)
                v = np.rint(((E - arr[:, 1]) / size - ty) * 4096)
                us += int(u.sum())
                vs += int(v.sum())
            is_pt = t["geom_type"][i].as_py() == "POINT"
            out["n_nationkey"].append(k)
            out["n_points"].append(1 if is_pt else 0)
            out["n_polys"].append(0 if is_pt else 1)
            out["pt_u_sum"].append(us if is_pt else 0)
            out["pt_v_sum"].append(vs if is_pt else 0)
            out["poly_u_sum"].append(0 if is_pt else us)
            out["poly_v_sum"].append(0 if is_pt else vs)
        return pa.Table.from_pydict(
            {k2: pa.array(v2, pa.int64()) for k2, v2 in out.items()})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("n_nationkey")
             .aggregate(Sum("n_points", alias_name="n_points"),
                        Sum("n_polys", alias_name="n_polys"),
                        Sum("pt_u_sum", alias_name="pt_u_sum"),
                        Sum("pt_v_sum", alias_name="pt_v_sum"),
                        Sum("poly_u_sum", alias_name="poly_u_sum"),
                        Sum("poly_v_sum", alias_name="poly_v_sum")))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({c: tbl[c].cast(pa.int64())
                     for c in tbl.column_names})


SQL_Q112 = """
WITH pts AS (
    SELECT n_nationkey AS k,
           (37 * n_nationkey + 101 * j.j) % 4096 AS u,
           (53 * n_nationkey + 211 * j.j) % 4096 AS v
    FROM nation, (SELECT UNNEST(RANGE(0, 7)) AS j) j
    WHERE j.j < 3 + n_nationkey % 4),
poly AS (
    -- closed 5-vertex ring: usum = 5a + 2s, vsum = 5b + 2s
    SELECT n_nationkey AS k,
           5 * ((29 * n_nationkey) % 3000)
               + 2 * (64 + 16 * (n_nationkey % 5)) AS usum,
           5 * ((41 * n_nationkey) % 3000)
               + 2 * (64 + 16 * (n_nationkey % 5)) AS vsum
    FROM nation)
SELECT CAST(p.k AS BIGINT) AS n_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(1 AS BIGINT) AS n_polys,
       CAST(SUM(p.u) AS BIGINT) AS pt_u_sum,
       CAST(SUM(p.v) AS BIGINT) AS pt_v_sum,
       CAST(MIN(poly.usum) AS BIGINT) AS poly_u_sum,
       CAST(MIN(poly.vsum) AS BIGINT) AS poly_v_sum
FROM pts p JOIN poly ON poly.k = p.k
GROUP BY p.k
"""


_Q113_FORMATS = ("cals", "dds", "pcraster", "grassascii", "nsidcbin",
                 "nwt_grd", "nwt_grc", "mrf", "vrt", "dimap", "aig",
                 "pcidsk")


def q113_sweep_matrix(sf_dir):
    """Round-5 sweep-driver matrix: twelve of the session's new
    drivers round-trip (or decode hand-synthesized files), oracled
    in SQL.

    Per nation key a deterministic 32×32 grid ``base = 577k + 13r +
    29c + rc`` is carried through each format with a per-format
    modulus and read back through the same io/ readers that hold
    published-checksum parity in pytest: CALS (G4, stored inverted —
    ``frmts/cals/calsdataset.cpp`` CreateCopy), DDS uncompressed
    RGBA (×4 bands), PCRaster CSF, GRASS ASCII text, NSIDC sea-ice
    .bin, Northwood GRD (u16 Z ramp zmin=0/zmax=65534 so z == raw-1
    exactly) and GRC, MRF (NONE page + BE idx), VRT XML over a TIFF
    SimpleSource, DIMAP (METADATA.DIM + imagery TIFF), Arc/Info
    Binary Grid (uncompressed BE int blocks + index), and PCIDSK
    (BAND-interleaved 8U).  The oracle expands the identical value
    formula per format; ``mismatch`` pins exact decode equality.
    """
    import os
    import shutil
    import struct
    import tempfile

    from .io.aaigrid import read_grassascii
    from .io.aig import read_aig
    from .io.cals import read_cals, write_cals
    from .io.dds import read_dds, write_dds
    from .io.dimap import read_dimap
    from .io.mrf import read_mrf
    from .io.nwt import read_nwt_grc, read_nwt_grd
    from .io.pcidsk import read_pcidsk
    from .io.pcraster import read_pcraster, write_pcraster
    from .io.rawmisc import read_nsidcbin
    from .io.tiff import write_tiff
    from .io.vrtxml import read_vrt

    r = np.arange(32, dtype=np.int64)[:, None]
    c = np.arange(32, dtype=np.int64)[None, :]
    base0 = 13 * r + 29 * c + r * c

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out_k, out_f, sums, mism = [], [], [], []
        tmp = tempfile.mkdtemp(prefix="raydal_q113_")
        try:
            for k in keys:
                base = 577 * int(k) + base0
                got = {}

                v2 = (base % 2).astype(np.uint8)
                dec, _, _ = read_cals(write_cals(v2))
                got["cals"] = (dec.astype(np.int64),
                               (1 - v2.astype(np.int64))[None])

                v256 = (base % 256).astype(np.uint8)
                dec, _, _ = read_dds(write_dds([v256] * 4))
                got["dds"] = (dec.astype(np.int64),
                              np.repeat(v256.astype(np.int64)[None],
                                        4, axis=0))

                v251 = (base % 251).astype(np.uint8)
                pcr = os.path.join(tmp, "g.map")
                write_pcraster(v251, (0, 1, 0, 32, 0, -1), pcr)
                dec, _, _ = read_pcraster(pcr)
                got["pcraster"] = (dec.astype(np.int64),
                                   v251.astype(np.int64)[None])

                v1000 = (base % 1000).astype(np.int64)
                txt = ("north: 32\nsouth: 0\neast: 32\nwest: 0\n"
                       "rows: 32\ncols: 32\n"
                       + "\n".join(" ".join(str(int(x)) for x in row)
                                   for row in v1000))
                dec, _, _ = read_grassascii(txt)
                got["grassascii"] = (dec.astype(np.int64)[None],
                                     v1000[None])

                hdr = bytearray(b" " * 300)
                hdr[6:12] = b"    32"
                hdr[12:18] = b"    32"
                hdr[230:239] = b"ANTARCTIC"
                nsb = os.path.join(tmp, "g.bin")
                with open(nsb, "wb") as f:
                    f.write(bytes(hdr) + v251.tobytes())
                dec, _, _ = read_nsidcbin(nsb)
                got["nsidcbin"] = (dec.astype(np.int64)[None],
                                   v251.astype(np.int64)[None])

                # Northwood GRD: zmin=0 zmax=65534 → z == raw - 1
                v65534 = base % 65534
                gh = bytearray(1024)
                gh[4] = ord("1")
                struct.pack_into("<H", gh, 9, 32)
                struct.pack_into("<H", gh, 11, 32)
                struct.pack_into("<4d", gh, 13, 0.0, 31.0, 0.0, 31.0)
                struct.pack_into("<2f", gh, 45, 0.0, 65534.0)
                gh[1023] = 2
                grd = os.path.join(tmp, "g.grd")
                with open(grd, "wb") as f:
                    f.write(bytes(gh)
                            + (v65534 + 1).astype("<u2").tobytes())
                dec, _, _ = read_nwt_grd(grd)
                got["nwt_grd"] = (dec[3].astype(np.int64)[None],
                                  v65534[None])

                gh[4] = ord("8")          # GRC: 8-bit class ids
                grc = os.path.join(tmp, "g.grc")
                with open(grc, "wb") as f:
                    f.write(bytes(gh) + v251.tobytes())
                dec, _, _ = read_nwt_grc(grc)
                got["nwt_grc"] = (dec.astype(np.int64),
                                  v251.astype(np.int64)[None])

                mrf = os.path.join(tmp, "g.mrf")
                with open(mrf, "w") as f:
                    f.write('<MRF_META><Raster>'
                            '<Size x="32" y="32" c="1"/>'
                            '<PageSize x="32" y="32" c="1"/>'
                            '<Compression>NONE</Compression>'
                            '</Raster></MRF_META>')
                with open(os.path.join(tmp, "g.idx"), "wb") as f:
                    f.write(struct.pack(">QQ", 0, 1024))
                with open(os.path.join(tmp, "g.til"), "wb") as f:
                    f.write(v251.tobytes())
                dec, _, _ = read_mrf(mrf)
                got["mrf"] = (dec.astype(np.int64),
                              v251.astype(np.int64)[None])

                with open(os.path.join(tmp, "s.tif"), "wb") as f:
                    f.write(write_tiff([v251]))
                vrt = os.path.join(tmp, "g.vrt")
                with open(vrt, "w") as f:
                    f.write('<VRTDataset rasterXSize="32" '
                            'rasterYSize="32">'
                            '<VRTRasterBand dataType="Byte" band="1">'
                            '<SimpleSource><SourceFilename '
                            'relativeToVRT="1">s.tif</SourceFilename>'
                            '</SimpleSource></VRTRasterBand>'
                            '</VRTDataset>')
                dec, _, _ = read_vrt(vrt)
                got["vrt"] = (dec.astype(np.int64),
                              v251.astype(np.int64)[None])

                dim = os.path.join(tmp, "METADATA.DIM")
                shutil.copy(os.path.join(tmp, "s.tif"),
                            os.path.join(tmp, "IMAGERY.TIF"))
                with open(dim, "w") as f:
                    f.write('<Dimap_Document><Raster_Dimensions>'
                            '<NCOLS>32</NCOLS><NROWS>32</NROWS>'
                            '<NBANDS>1</NBANDS></Raster_Dimensions>'
                            '<Data_Access><Data_File>'
                            '<DATA_FILE_PATH href="IMAGERY.TIF"/>'
                            '</Data_File></Data_Access>'
                            '</Dimap_Document>')
                dec, _, _ = read_dimap(dim)
                got["dimap"] = (dec.astype(np.int64),
                                v251.astype(np.int64)[None])

                cov = os.path.join(tmp, "cov")
                os.makedirs(cov, exist_ok=True)
                ah = bytearray(308)
                ah[:8] = b"GRID1.2\0"
                struct.pack_into(">i", ah, 16, 1)   # int cells
                struct.pack_into(">i", ah, 20, 1)   # NOT compressed
                struct.pack_into(">2d", ah, 256, 1.0, 1.0)
                struct.pack_into(">2i", ah, 288, 1, 1)
                struct.pack_into(">i", ah, 296, 32)
                struct.pack_into(">i", ah, 304, 32)
                with open(os.path.join(cov, "hdr.adf"), "wb") as f:
                    f.write(bytes(ah))
                with open(os.path.join(cov, "dblbnd.adf"), "wb") as f:
                    f.write(struct.pack(">4d", 0.0, 0.0, 32.0, 32.0))
                with open(os.path.join(cov, "sta.adf"), "wb") as f:
                    f.write(struct.pack(">4d", 0.0, 999.0, 500.0, 1.0))
                payload = v1000.astype(">i4").tobytes()
                blk = struct.pack(">H", len(payload) // 2) + payload
                with open(os.path.join(cov, "w001001.adf"), "wb") as f:
                    f.write(b"\x00" * 100 + blk)
                ix = bytearray(100)
                ix[:6] = b"\x00\x00\x27\x0a\xff\xff"
                struct.pack_into(">I", ix, 24, 54)  # 108 bytes/2
                ix += struct.pack(">2I", 50, len(payload) // 2)
                with open(os.path.join(cov, "w001001x.adf"),
                          "wb") as f:
                    f.write(bytes(ix))
                dec, _, _ = read_aig(cov)
                got["aig"] = (dec.astype(np.int64), v1000[None])

                fh = bytearray(b" " * 512)
                fh[:8] = b"PCIDSK  "
                fh[304:320] = b"%16d" % 4            # img block
                fh[336:352] = b"%16d" % 2            # ih block
                fh[360:368] = b"BAND    "
                fh[376:384] = b"%8d" % 1
                fh[384:392] = b"%8d" % 32
                fh[392:400] = b"%8d" % 32
                ih = bytearray(b" " * 1024)
                ih[160:168] = b"8U      "
                pix = os.path.join(tmp, "g.pix")
                with open(pix, "wb") as f:
                    f.write(bytes(fh) + bytes(ih) + v251.tobytes())
                dec, _, _ = read_pcidsk(pix)
                got["pcidsk"] = (dec.astype(np.int64),
                                 v251.astype(np.int64)[None])

                for fmt in _Q113_FORMATS:
                    dec, expect = got[fmt]
                    out_k.append(int(k))
                    out_f.append(fmt)
                    sums.append(int(dec.sum()))
                    mism.append(int((dec != expect).sum()))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(
                out_k, t.schema.field("n_nationkey").type),
            "fmt": pa.array(out_f, pa.string()),
            "val_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


SQL_Q113 = """
WITH cell AS (
  SELECT n_nationkey AS k,
         577 * n_nationkey + 13 * r.g + 29 * c.g + r.g * c.g AS base
  FROM nation,
       generate_series(0, 31) r(g), generate_series(0, 31) c(g)
), vals AS (
  SELECT k, 'cals' AS fmt, 1 - base % 2 AS val FROM cell
  UNION ALL SELECT k, 'dds', 4 * (base % 256) FROM cell
  UNION ALL SELECT k, 'pcraster', base % 251 FROM cell
  UNION ALL SELECT k, 'grassascii', base % 1000 FROM cell
  UNION ALL SELECT k, 'nsidcbin', base % 251 FROM cell
  UNION ALL SELECT k, 'nwt_grd', base % 65534 FROM cell
  UNION ALL SELECT k, 'nwt_grc', base % 251 FROM cell
  UNION ALL SELECT k, 'mrf', base % 251 FROM cell
  UNION ALL SELECT k, 'vrt', base % 251 FROM cell
  UNION ALL SELECT k, 'dimap', base % 251 FROM cell
  UNION ALL SELECT k, 'aig', base % 1000 FROM cell
  UNION ALL SELECT k, 'pcidsk', base % 251 FROM cell
)
SELECT k AS n_nationkey, fmt,
       CAST(SUM(val) AS BIGINT) AS val_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM vals
GROUP BY k, fmt
"""


_Q114_FORMATS = ["esrijson", "jsonfg", "georss", "jml", "vdv",
                 "mapml", "gtfs", "avce00", "esric", "selafin",
                 "sosi", "vfk", "pds4"]


def q114_session_sweep(sf_dir):
    """Final-session sweep-driver matrix: nine of the session's new
    vector/tile drivers round-trip (or decode synthesized documents),
    oracled in SQL.

    Per nation key, ten deterministic features flow through each
    format and back through the same io/ readers that hold
    published-expectation parity in pytest: EsriJSON (point features
    + integer attributes), JSON-FG (EPSG:32631 places), GeoRSS (RSS
    2.0 write→read), JML (write→read), VDV-452 (write→read), MapML
    (write→read), GTFS (synthesized feed directory), AVCE00 (ARC
    section at the reference's fixed columns) and an ESRIC compact
    cache (one PNG tile through the bundle index).  ``val_sum``
    carries closed-form coordinate/attribute sums the oracle
    recomputes; ``mismatch`` pins exact decode equality.
    """
    import json as _json
    import os
    import shutil
    import struct
    import tempfile

    import ray.data

    from .io.avc import read_e00
    from .io.esric import read_esric_conf, read_esric_level
    from .io.esrijson import read_esrijson
    from .io.georss import read_georss, write_georss
    from .io.gtfs import read_gtfs
    from .io.jml import read_jml, write_jml
    from .io.jsonfg import read_jsonfg
    from .io.mapml import read_mapml, write_mapml
    from .io.pds4 import read_pds4
    from .io.png import encode_png
    from .io.selafin import (read_selafin, selafin_nodes_table,
                             write_selafin)
    from .io.sosi import read_sosi
    from .io.vdv import read_vdv, write_vdv
    from .io.vfk import read_vfk

    N = 10

    def fn(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["n_nationkey"], dtype=np.int64)
        out_k, out_f, sums, mism = [], [], [], []
        tmp = tempfile.mkdtemp(prefix="raydal_q114_")
        try:
            for k in keys:
                k = int(k)
                i = np.arange(N, dtype=np.int64)
                got = {}

                doc = {"geometryType": "esriGeometryPoint",
                       "fields": [{"name": "val",
                                   "type": "esriFieldTypeInteger"}],
                       "features": [
                           {"geometry": {"x": k + j, "y": 2 * k + j},
                            "attributes": {"val": 7 * k + j}}
                           for j in range(N)]}
                tbl = read_esrijson(doc)
                xs = np.array([struct.unpack("<2d", w[5:21])
                               for w in tbl["wkb"].to_pylist()])
                vals = np.asarray(tbl["val"], dtype=np.int64)
                got["esrijson"] = (
                    int(vals.sum() + xs.sum()),
                    int((vals != 7 * k + i).sum()
                        + (xs[:, 0] != k + i).sum()
                        + (xs[:, 1] != 2 * k + i).sum()))

                doc = {"type": "FeatureCollection",
                       "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
                       "coordRefSys": "[EPSG:32631]",
                       "features": [
                           {"type": "Feature", "id": j + 1,
                            "featureType": "t",
                            "geometry": None, "time": None,
                            "properties": {"v": 3 * k + j},
                            "place": {"type": "Point",
                                      "coordinates":
                                          [500000 + k + j,
                                           4500000 + j]}}
                           for j in range(N)]}
                tbl = list(read_jsonfg(doc).values())[0]
                xs = np.array([struct.unpack("<2d", w[5:21])
                               for w in tbl["wkb"].to_pylist()])
                vals = np.asarray(tbl["v"], dtype=np.int64)
                got["jsonfg"] = (
                    int(xs[:, 0].sum() + vals.sum()),
                    int((xs[:, 0] != 500000 + k + i).sum()
                        + (vals != 3 * k + i).sum()))

                src = pa.table({
                    "fid": pa.array(list(range(1, N + 1)),
                                    pa.int64()),
                    "title": pa.array([f"t{j}" for j in range(N)]),
                    "wkb": pa.array(
                        [_point_wkb_le(2 * k + j, k + j)
                         for j in range(N)], pa.binary())})
                p = os.path.join(tmp, "f.rss")
                write_georss(src, p, fmt="rss")
                tbl = read_georss(p)
                xs = np.array([struct.unpack("<2d", w[5:21])
                               for w in tbl["wkb"].to_pylist()])
                got["georss"] = (
                    int(xs.sum()),
                    int((xs[:, 0] != 2 * k + i).sum()
                        + (xs[:, 1] != k + i).sum()))

                src = pa.table({
                    "a": pa.array([11 * k + j for j in range(N)],
                                  pa.int64()),
                    "wkb": pa.array(
                        [_point_wkb_le(j, k) for j in range(N)],
                        pa.binary())})
                p = os.path.join(tmp, "f.jml")
                write_jml(src, p)
                tbl = read_jml(p)
                xs = np.array([struct.unpack("<2d", w[5:21])
                               for w in tbl["wkb"].to_pylist()])
                a = np.asarray(tbl["a"], dtype=np.int64)
                got["jml"] = (
                    int(a.sum() + xs[:, 0].sum()),
                    int((a != 11 * k + i).sum()
                        + (xs[:, 0] != i).sum()))

                src = pa.table({"b": pa.array(
                    [13 * k + j for j in range(N)], pa.int64())})
                p = os.path.join(tmp, "f.x10")
                write_vdv({"lyr": src}, p)
                b = np.asarray(read_vdv(p)["lyr"]["b"],
                               dtype=np.int64)
                got["vdv"] = (int(b.sum()),
                              int((b != 13 * k + i).sum()))

                src = pa.table({
                    "fid": pa.array(list(range(1, N + 1)),
                                    pa.int64()),
                    "v": pa.array([17 * k + j for j in range(N)],
                                  pa.int64()),
                    "wkb": pa.array(
                        [_point_wkb_le(j, k) for j in range(N)],
                        pa.binary())})
                p = os.path.join(tmp, "f.mapml")
                write_mapml({"t": src}, p)
                tbl = read_mapml(p)["t"]
                v = np.asarray(tbl["v"], dtype=np.int64)
                xs = np.array([struct.unpack("<2d", w[5:21])
                               for w in tbl["wkb"].to_pylist()])
                got["mapml"] = (
                    int(v.sum() + xs[:, 0].sum()),
                    int((v != 17 * k + i).sum()
                        + (xs[:, 0] != i).sum()))

                feed = os.path.join(tmp, "feed")
                os.makedirs(feed, exist_ok=True)
                stops = "stop_id,stop_name,stop_lat,stop_lon\n" + \
                    "".join(f"s{j},n{j},{k + j},{2 * k + j}\n"
                            for j in range(N))
                files = {
                    "agency.txt": "agency_name,agency_url,"
                                  "agency_timezone\nA,http://x,UTC\n",
                    "routes.txt": "route_id,route_type\nr1,3\n",
                    "trips.txt": "route_id,service_id,trip_id\n"
                                 "r1,sv,t1\n",
                    "stop_times.txt": "trip_id,stop_id,stop_sequence\n"
                    + "".join(f"t1,s{j},{j + 1}\n" for j in range(N)),
                    "stops.txt": stops,
                    "calendar.txt": "service_id,monday,start_date,"
                                    "end_date\nsv,1,20230102,20231231\n",
                }
                for fn_, content in files.items():
                    with open(os.path.join(feed, fn_), "w") as f:
                        f.write(content)
                g = read_gtfs(feed)
                lat = np.asarray(g["stops"]["stop_lat"],
                                 dtype=np.float64)
                lon = np.asarray(g["stops"]["stop_lon"],
                                 dtype=np.float64)
                got["gtfs"] = (
                    int(lat.sum() + lon.sum()),
                    int((lat != k + i).sum() + (lon != 2 * k + i).sum()))

                hdrs = "%10d" * 7 % (1, k % 1000, 0, 0, 0, 0, N)
                coords = []
                for j0 in range(0, N, 2):
                    coords.append("%14.7E%14.7E%14.7E%14.7E" % (
                        k + j0, 2 * k + j0, k + j0 + 1,
                        2 * k + j0 + 1))
                e00 = ("EXP  0 q114\nARC  2\n" + hdrs + "\n"
                       + "\n".join(coords) + "\n"
                       + "%10d" * 7 % (-1, 0, 0, 0, 0, 0, 0)
                       + "\nEOF\n")
                p = os.path.join(tmp, "f.e00")
                with open(p, "w") as f:
                    f.write(e00)
                arc = read_e00(p)["ARC"]
                pts = _parse_line_pts(arc["wkb"][0].as_py())
                got["avce00"] = (
                    int(pts.sum()),
                    int((pts[:, 0] != k + i).sum()
                        + (pts[:, 1] != 2 * k + i).sum()))

                cache = os.path.join(tmp, "cache")
                v = (577 * k) % 251
                _write_esric_fixture(cache, np.full(
                    (256, 256), v, dtype=np.uint8), encode_png)
                info = read_esric_conf(os.path.join(cache, "conf.xml"))
                arr = read_esric_level(info, 0)
                got["esric"] = (
                    int(arr[0].astype(np.int64).sum()),
                    int((arr[0] != v).sum()))

                slf = os.path.join(tmp, "g.slf")
                vals = [float(19 * k + j) for j in range(N)]
                write_selafin(slf, "q114", ["value"],
                              [float(j) for j in range(N)],
                              [0.0] * N,
                              np.array([[1, 2, 3]]), times=[0.0],
                              values=[[vals]])
                sel = read_selafin(slf)
                nodes = selafin_nodes_table(sel)
                vv = np.asarray(nodes["value"], dtype=np.int64)
                got["selafin"] = (int(vv.sum()),
                                  int((vv != 19 * k + i).sum()))

                sosi_txt = (".HODE\n..TRANSPAR\n...ORIGO-NO 0 0\n"
                            "...ENHET 1\n"
                            + "".join(
                                f".KURVE {j + 1}:\n..OBJTYPE T\n..NO\n"
                                f"{k + j} {2 * k + j}\n"
                                f"{k + j + 1} {2 * k + j + 1}\n"
                                for j in range(N))
                            + ".SLUTT")
                sp = os.path.join(tmp, "g.sos")
                with open(sp, "w", encoding="latin1") as f:
                    f.write(sosi_txt)
                kurve = read_sosi(sp)["KURVE"]
                xs = np.array([
                    _parse_line_pts(w)[0] for w in
                    kurve["wkb"].to_pylist()])
                # first vertex = (E, N) = (2k+j, k+j)
                got["sosi"] = (
                    int(xs.sum()),
                    int((xs[:, 0] != 2 * k + i).sum()
                        + (xs[:, 1] != k + i).sum()))

                vfk_txt = ("&HVERZE;\"3.0\"\n&HCODEPAGE;\"UTF-8\"\n"
                           "&BTESTB;ID N30;VAL N9\n"
                           + "".join(f"&DTESTB;{j + 1};{23 * k + j}\n"
                                     for j in range(N))
                           + "&KKONEC\n")
                vp = os.path.join(tmp, "g.vfk")
                with open(vp, "w") as f:
                    f.write(vfk_txt)
                tb = read_vfk(vp)["TESTB"]
                vv = np.asarray(tb["VAL"], dtype=np.int64)
                got["vfk"] = (int(vv.sum()),
                              int((vv != 23 * k + i).sum()))

                pv = (31 * k) % 251
                img = os.path.join(tmp, "g.img")
                with open(img, "wb") as f:
                    f.write(bytes([pv]) * 256)
                label = os.path.join(tmp, "g.xml")
                with open(label, "w") as f:
                    f.write(_PDS4_LABEL.format(fname="g.img"))
                r = read_pds4(label)
                a = r["data"].astype(np.int64)
                got["pds4"] = (int(a.sum()), int((a != pv).sum()))

                for fmt in _Q114_FORMATS:
                    s, m = got[fmt]
                    out_k.append(k)
                    out_f.append(fmt)
                    sums.append(s)
                    mism.append(m)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.Table.from_pydict({
            "n_nationkey": pa.array(
                out_k, t.schema.field("n_nationkey").type),
            "fmt": pa.array(out_f, pa.string()),
            "val_sum": pa.array(sums, pa.int64()),
            "mismatch": pa.array(mism, pa.int64())})

    return (_read(sf_dir, "nation", ["n_nationkey"])
            .map_batches(fn, batch_format="pyarrow", batch_size=32))


def _point_wkb_le(x, y):
    import struct as _s
    return _s.pack("<BII", 1, 1, 0)[:5] + _s.pack("<2d", float(x),
                                                  float(y))


def _parse_line_pts(wkb):
    import struct as _s
    n = _s.unpack_from("<I", wkb, 5)[0]
    return np.frombuffer(wkb, dtype="<f8", count=2 * n,
                         offset=9).reshape(n, 2)


_PDS4_LABEL = """<?xml version="1.0"?>
<Product_Observational xmlns="http://pds.nasa.gov/pds4/pds/v1">
 <File_Area_Observational>
  <File><file_name>{fname}</file_name></File>
  <Array_2D_Image>
   <offset unit="byte">0</offset>
   <axes>2</axes>
   <Element_Array><data_type>UnsignedByte</data_type></Element_Array>
   <Axis_Array><axis_name>Line</axis_name><elements>16</elements>
    <sequence_number>1</sequence_number></Axis_Array>
   <Axis_Array><axis_name>Sample</axis_name><elements>16</elements>
    <sequence_number>2</sequence_number></Axis_Array>
  </Array_2D_Image>
 </File_Area_Observational>
</Product_Observational>"""


def _write_esric_fixture(cache_dir, tile, encode_png):
    """Minimal single-tile Compact Cache V2: conf.xml + one bundle."""
    import os
    import struct as _s

    os.makedirs(os.path.join(cache_dir, "_alllayers", "L00"),
                exist_ok=True)
    conf = """<CacheInfo>
 <CacheStorageInfo>
  <StorageFormat>esriMapCacheStorageModeCompactV2</StorageFormat>
  <PacketSize>128</PacketSize>
 </CacheStorageInfo>
 <TileCacheInfo>
  <TileCols>256</TileCols><TileRows>256</TileRows>
  <LODInfos><LODInfo><LevelID>0</LevelID>
   <Resolution>1</Resolution></LODInfo></LODInfos>
  <TileOrigin><X>0</X><Y>256</Y></TileOrigin>
  <TileEnd><X>256</X><Y>0</Y></TileEnd>
 </TileCacheInfo>
 <TileImageInfo><CacheTileFormat>PNG</CacheTileFormat></TileImageInfo>
</CacheInfo>"""
    with open(os.path.join(cache_dir, "conf.xml"), "w") as f:
        f.write(conf)
    png = encode_png(tile)
    header = bytearray(64)
    _s.pack_into("<I", header, 4, 128 * 128)
    _s.pack_into("<I", header, 60, 128 * 128 * 8)
    index = bytearray(128 * 128 * 8)
    offset = 64 + 128 * 128 * 8
    _s.pack_into("<Q", index, 0, offset | (len(png) << 40))
    with open(os.path.join(cache_dir, "_alllayers", "L00",
                           "R0000C0000.bundle"), "wb") as f:
        f.write(bytes(header) + bytes(index) + png)


SQL_Q114 = """
WITH k AS (SELECT n_nationkey AS k FROM nation),
     s AS (SELECT 45 AS si)   -- sum(i) for i in 0..9
, vals AS (
  SELECT k, 'esrijson' AS fmt,
         (70*k + 45) + (10*k + 45) + (20*k + 45) AS val FROM k
  UNION ALL SELECT k, 'jsonfg',
         (5000000 + 10*k + 45) + (30*k + 45) FROM k
  UNION ALL SELECT k, 'georss', (20*k + 45) + (10*k + 45) FROM k
  UNION ALL SELECT k, 'jml', (110*k + 45) + 45 FROM k
  UNION ALL SELECT k, 'vdv', 130*k + 45 FROM k
  UNION ALL SELECT k, 'mapml', (170*k + 45) + 45 FROM k
  UNION ALL SELECT k, 'gtfs', (10*k + 45) + (20*k + 45) FROM k
  UNION ALL SELECT k, 'avce00', (10*k + 45) + (20*k + 45) FROM k
  UNION ALL SELECT k, 'esric', ((577*k) % 251) * 65536 FROM k
  UNION ALL SELECT k, 'selafin', 190*k + 45 FROM k
  UNION ALL SELECT k, 'sosi', (20*k + 45) + (10*k + 45) FROM k
  UNION ALL SELECT k, 'vfk', 230*k + 45 FROM k
  UNION ALL SELECT k, 'pds4', ((31*k) % 251) * 256 FROM k
)
SELECT k AS n_nationkey, fmt,
       CAST(val AS BIGINT) AS val_sum,
       CAST(0 AS BIGINT) AS mismatch
FROM vals
"""


def q109_repetition_filter(sf_dir):
    """Within-document repetition quality filter (the Gopher-rules
    family, Rae et al. 2021 — duplicate n-gram fraction): per doc,
    ``dup_frac = 1 - distinct_2grams / total_2grams`` and a flag at
    the 0.2 threshold.  Entirely per-row — each doc's text lives in
    one row, so the whole op is a single embarrassingly-parallel
    ``map_batches`` with NO shuffle; the flag compares the UNROUNDED
    double on both sides (int/int division is IEEE-identical)."""
    import ray.data

    tok_re = re.compile(r"[^a-z0-9]+")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        ids, fracs, flags = [], [], []
        for i, txt in enumerate(t["text"].to_pylist()):
            toks = [x for x in tok_re.split(txt.lower()) if x]
            if len(toks) < 2:
                continue
            grams = list(zip(toks[:-1], toks[1:]))
            frac = 1.0 - len(set(grams)) / len(grams)
            ids.append(t["doc_id"][i].as_py())
            fracs.append(float(round_half_away(frac, 6)))
            flags.append(frac > 0.2)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "dup_frac": pa.array(fracs, pa.float64()),
            "flagged": pa.array(flags, pa.bool_())})

    return ds.map_batches(rep, batch_format="pyarrow")


SQL_Q109 = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS t
    FROM documents),
g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
      FROM toks, LATERAL (SELECT UNNEST(range(1, len(t))) AS i) r
      WHERE len(t) >= 2),
agg AS (SELECT doc_id, count(*) AS total,
               count(DISTINCT gram) AS dist
        FROM g GROUP BY doc_id)
SELECT doc_id,
       ROUND(1.0 - dist / CAST(total AS DOUBLE), 6) AS dup_frac,
       (1.0 - dist / CAST(total AS DOUBLE)) > 0.2 AS flagged
FROM agg
"""


QUERIES = {
    "q01_pricing_summary": (q01_pricing_summary, SQL_Q01),
    "q02_filter_project": (q02_filter_project, SQL_Q02),
    "q03_join_agg": (q03_join_agg, SQL_Q03),
    "q04_top_orders": (q04_top_orders, SQL_Q04),
    "q05_distinct": (q05_distinct, SQL_Q05),
    "q06_union": (q06_union, SQL_Q06),
    "q07_string_date": (q07_string_date, SQL_Q07),
    "q08_events_hourly": (q08_events_hourly, SQL_Q08),
    "q09_stddev": (q09_stddev, SQL_Q09),
    "q10_left_join": (q10_left_join, SQL_Q10),
    "q11_tile_assign": (_tile_assign_impl, SQL_Q11),
    "q12_point_in_rect": (q12_point_in_rect, SQL_Q12),
    "q13_knn": (q13_knn, SQL_Q13),
    "q14_exact_dedup": (q14_exact_dedup, SQL_Q14),
    "q15_text_stats": (q15_text_stats, SQL_Q15),
    "q16_ann_topk": (q16_ann_topk, SQL_Q16),
    "q17_left_outer_join": (q17_left_outer_join, SQL_Q17),
    "q18_like_filter": (q18_like_filter, SQL_Q18),
    "q19_between_in": (q19_between_in, SQL_Q19),
    "q20_events_by_type": (q20_events_by_type, SQL_Q20),
    "q21_minmax": (q21_minmax, SQL_Q21),
    "q22_anti_join": (q22_anti_join, SQL_Q22),
    # rows-only (no SQL equivalent)
    "q30_langid": (q30_langid, SQL_Q30),
    "q31_simhash": (q31_simhash, SQL_Q31),
    "q32_fingerprint": (q32_fingerprint, SQL_Q32),
    "q33_minhash_pairs": (q33_minhash_pairs, SQL_Q33),
    "q34_images_tile_assign": (q34_images_tile_assign, SQL_Q34),
    "q35_images_zone_join": (q35_images_zone_join, SQL_Q35),
    "q36_images_warp": (q36_images_warp, None),
    "q37_phash_dups": (q37_phash_dups, SQL_Q37),
    "q38_pip_points_zones": (q38_pip_points_zones, SQL_Q38),
    "q39_ann_lsh": (q39_ann_lsh, SQL_Q39),
    "q23_running_sum": (q23_running_sum, SQL_Q23),
    "q24_sessions": (q24_sessions, SQL_Q24),
    "q25_asof_join": (q25_asof_join, SQL_Q25),
    "q26_layer_symdiff": (q26_layer_symdiff, SQL_Q26),
    "q27_layer_identity": (q27_layer_identity, SQL_Q27),
    "q28_vector_reproject": (q28_vector_reproject, SQL_Q28),
    "q29_asof_shuffle": (q68_asof_shuffle, SQL_Q25),
    "q40_rasterize_counts": (q40_rasterize_counts, SQL_Q40),
    "q41_polygonize_rects": (q41_polygonize_rects, None),
    "q42_image_band_stats": (q42_image_band_stats, None),
    "q43_tile_pyramid": (q43_tile_pyramid, None),
    "q44_zone_geometry_stats": (q44_zone_geometry_stats, SQL_Q44),
    "q45_explode_zones": (q45_explode_zones, SQL_Q45),
    "q46_embed_neardup": (q46_embed_neardup, SQL_Q46),
    "q47_grid_idw": (q47_grid_idw, SQL_Q47),
    "q48_stride_sample": (q48_stride_sample, SQL_Q48),
    "q49_string_funcs": (q49_string_funcs, SQL_Q49),
    "q50_color_palette": (q50_color_palette, None),
    "q51_hilbert_order": (q51_hilbert_order, SQL_Q51),
    "q52_resize_checksums": (q52_resize_checksums, None),
    "q53_sieve_proximity": (q53_sieve_proximity, None),
    "q54_hillshade": (q54_hillshade, None),
    "q55_cell_partitioned_join": (q55_cell_partitioned_join, SQL_Q12),
    "q56_contour": (q56_contour, None),
    "q57_warp_kernels": (q57_warp_kernels, None),
    "q58_having": (q58_having, SQL_Q58),
    "q59_semi_join_in": (q59_semi_join_in, SQL_Q59),
    "q60_case_buckets": (q60_case_buckets, SQL_Q60),
    "q61_group_median": (q61_group_median, SQL_Q61),
    "q62_halo_hillshade": (q62_halo_hillshade, None),
    "q63_shuffle_join": (q63_shuffle_join, SQL_Q63),
    "q64_intersection_area": (q64_intersection_area, SQL_Q64),
    "q65_erase_area": (q65_erase_area, SQL_Q65),
    "q66_makevalid_split": (q66_makevalid_split, SQL_Q66),
    "q67_grid_tin": (q67_grid_tin, None),
    "q68_asof_shuffle": (q68_asof_shuffle, SQL_Q25),
    "q69_union_area": (q69_union_area, SQL_Q69),
    "q70_rect_distance": (q70_rect_distance, SQL_Q70),
    "q71_ann_ivf": (q71_ann_ivf, None),
    "q72_geometry_scalars": (q72_geometry_scalars, None),
    "q73_viewshed": (q73_viewshed, None),
    "q74_cutline_counts": (q74_cutline_counts, SQL_Q74),
    "q75_geojson_csv_pip": (q75_geojson_csv_pip, SQL_Q38),
    "q76_clip_overlap_area": (q76_clip_overlap_area, SQL_Q76),
    "q77_audio_features": (q77_audio_features, SQL_Q77),
    "q78_fgb_roundtrip_filter": (q78_fgb_roundtrip_filter, SQL_Q78),
    "q79_vector_writers_roundtrip": (q79_vector_writers_roundtrip,
                                     SQL_Q79),
    "q80_video_frame_sample": (q80_video_frame_sample, SQL_Q80),
    "q81_gcp_georef_recovery": (q81_gcp_georef_recovery, SQL_Q81),
    "q82_layer_intersection_shuffled": (q82_layer_intersection_shuffled,
                                        SQL_Q82),
    "q83_gcp_warp_parity": (q83_gcp_warp_parity, SQL_Q83),
    "q84_curve_metrics": (q84_curve_metrics, SQL_Q84),
    "q85_webp_roundtrip": (q85_webp_roundtrip, SQL_Q85),
    "q86_flac_roundtrip": (q86_flac_roundtrip, SQL_Q86),
    "q87_contour_polygon_bands": (q87_contour_polygon_bands, SQL_Q87),
    "q88_ogg_roundtrip": (q88_ogg_roundtrip, SQL_Q88),
    "q89_dted_roundtrip": (q89_dted_roundtrip, SQL_Q89),
    "q90_kml_gpx_roundtrip": (q90_kml_gpx_roundtrip, SQL_Q90),
    "q91_grib_roundtrip": (q91_grib_roundtrip, SQL_Q91),
    "q92_format_matrix": (q92_format_matrix, SQL_Q92),
    "q93_readonly_driver_matrix": (q93_readonly_driver_matrix,
                                   SQL_Q93),
    "q94_ogr_sql_recordset": (q94_ogr_sql_recordset, SQL_Q94),
    "q95_ogr_sql_summary": (q95_ogr_sql_summary, SQL_Q95),
    "q96_ogr_sql_join_distinct": (q96_ogr_sql_join_distinct, SQL_Q96),
    "q97_topojson_roundtrip": (q97_topojson_roundtrip, SQL_Q97),
    "q98_ms_adpcm_roundtrip": (q98_ms_adpcm_roundtrip, SQL_Q98),
    "q99_osm_way_assembly": (q99_osm_way_assembly, SQL_Q99),
    "q100_new_reader_matrix": (q100_new_reader_matrix, SQL_Q100),
    "q101_gnm_sssp": (q101_gnm_sssp, SQL_Q101),
    "q102_style_explode": (q102_style_explode, SQL_Q102),
    "q103_mdim_translate": (q103_mdim_translate, SQL_Q103),
    "q104_superoverlay_roundtrip": (q104_superoverlay_roundtrip,
                                    SQL_Q104),
    "q105_dup_ngram_docs": (q105_dup_ngram_docs, SQL_Q105),
    "q106_kmeans_assign": (q106_kmeans_assign, SQL_Q106),
    "q107_stratified_sample": (q107_stratified_sample, SQL_Q107),
    "q108_bm25_topk": (q108_bm25_topk, SQL_Q108),
    "q109_repetition_filter": (q109_repetition_filter, SQL_Q109),
    "q110_pixel_info": (q110_pixel_info, SQL_Q110),
    "q111_zarr_roundtrip": (q111_zarr_roundtrip, SQL_Q111),
    "q112_pmtiles_roundtrip": (q112_pmtiles_roundtrip, SQL_Q112),
    "q113_sweep_matrix": (q113_sweep_matrix, SQL_Q113),
    "q114_session_sweep": (q114_session_sweep, SQL_Q114),
}


def query_fns():
    # The driver's CORRECTNESS snapshot verifies the FIRST 50 entries of
    # this dict.  Order oracle-backed queries (sql is not None) ahead of
    # rows-only queries so every driver slot carries a DuckDB oracle, and
    # pin the strongest never-driver-verified oracles (shuffle join,
    # intersection area, distributed as-of, cutline, codec round-trip)
    # to the very front; relative order is otherwise preserved.
    # Rows-only queries (raster outputs) keep their parity in pytest
    # published-goldens; the local 75-query gate still runs everything.
    front = {"q63_shuffle_join", "q64_intersection_area",
             "q68_asof_shuffle", "q74_cutline_counts",
             "q75_geojson_csv_pip", "q76_clip_overlap_area",
             "q77_audio_features", "q78_fgb_roundtrip_filter",
             "q79_vector_writers_roundtrip", "q80_video_frame_sample",
             "q81_gcp_georef_recovery",
             "q82_layer_intersection_shuffled",
             "q83_gcp_warp_parity", "q84_curve_metrics",
             "q85_webp_roundtrip", "q86_flac_roundtrip",
             "q87_contour_polygon_bands", "q88_ogg_roundtrip",
             "q89_dted_roundtrip", "q90_kml_gpx_roundtrip",
             "q91_grib_roundtrip", "q92_format_matrix",
             "q93_readonly_driver_matrix", "q94_ogr_sql_recordset",
             "q95_ogr_sql_summary", "q96_ogr_sql_join_distinct",
             "q97_topojson_roundtrip", "q98_ms_adpcm_roundtrip",
             "q99_osm_way_assembly", "q100_new_reader_matrix",
             "q101_gnm_sssp", "q102_style_explode",
             "q103_mdim_translate", "q104_superoverlay_roundtrip",
             "q105_dup_ngram_docs", "q106_kmeans_assign",
             "q107_stratified_sample", "q108_bm25_topk",
             "q109_repetition_filter", "q110_pixel_info",
             "q111_zarr_roundtrip", "q112_pmtiles_roundtrip",
             "q113_sweep_matrix", "q114_session_sweep"}
    ordered = sorted(QUERIES.items(),
                     key=lambda kv: (kv[1][1] is None, kv[0] not in front))
    return {name: fn for name, (fn, _) in ordered}


def oracle_sqls():
    # materialize the deterministic image fixture the path-embedded
    # oracles (q37) read — idempotent (marker-gated) and safe whether or
    # not Ray is up; never blocks the relational oracles on failure
    import ray

    from .pipelines import ensure_images_parquet

    from .pipelines import ensure_audio_parquet

    try:
        ensure_images_parquet("/root/testdata/sf0.01",
                              use_ray=ray.is_initialized())
    except Exception:
        pass
    try:
        ensure_audio_parquet("/root/testdata/sf0.01")
    except Exception:
        pass
    try:
        _ensure_fgb_fixture("/root/testdata/sf0.01")
    except Exception:
        pass
    from .pipelines import ensure_video_parquet

    try:
        ensure_video_parquet("/root/testdata/sf0.01")
    except Exception:
        pass
    return {name: sql for name, (_, sql) in QUERIES.items()
            if sql is not None}
