"""OGR SQL execution over Ray Datasets.

Executes the dialect parsed by :mod:`raydal.sql.parser` with the
reference's result semantics (``ogr/ogrsf_frmts/generic/ogr_gensql.cpp``)
on top of ``ray.data.Dataset`` pipelines:

* recordset queries stream: one ``map_batches`` evaluates WHERE, one
  computes the projected columns (plus ORDER BY key columns), and
  ``Dataset.sort`` / ``limit`` finish — no full materialization;
* JOINs are the reference's first-match left joins
  (ogr_gensql.cpp:1493 fetches at most ONE secondary feature per
  primary row): the secondary layer is deduplicated to its first
  feature per key (groupby + min-FID, one shuffle) and joined with a
  distributed hash join (``Dataset.join``, left_outer);
* summary queries (aggregates / DISTINCT) compute bounded per-batch
  partials in ``map_batches`` and merge them driver-side — the merge
  state is one row of accumulators (or the distinct value set, which
  the reference itself holds in memory as a ``std::set``,
  swq.cpp:324);
* ``SELECT *`` expansion, ``EXCEPT``/``EXCLUDE``, table-prefix
  collision naming, special fields (FID, OGR_GEOMETRY, OGR_GEOM_WKT,
  OGR_GEOM_AREA, OGR_STYLE), aggregate naming (``MAX_field``,
  ``COUNT_*``), Kahan-Babuska-Neumaier SUM and Welford STDDEV all
  follow the reference implementations cited inline.

Column pruning: only the columns an individual statement references
are read from each layer (``Dataset.select_columns``), so wide tables
don't ship unused data through the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .expr import (OGRSQLError, arrow_type_of, bind_expr, eval_expr,
                   swq_type_of_arrow, truth_mask)
from .parser import Agg, Cast, Col, Lit, Op, Select, parse_select

__all__ = ["execute_sql", "execute_sql_table"]

_SPECIAL_TYPES = {
    "FID": "integer64",
    "OGR_GEOMETRY": "string",
    "OGR_GEOM_WKT": "string",
    "OGR_GEOM_AREA": "float",
    "OGR_STYLE": "string",
}

_GEOM_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
    5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION",
    8: "CIRCULARSTRING", 9: "COMPOUNDCURVE", 10: "CURVEPOLYGON",
    11: "MULTICURVE", 12: "MULTISURFACE",
}


def _is_dataset(obj) -> bool:
    import ray.data
    return isinstance(obj, ray.data.Dataset)


class _SchemaView:
    def __init__(self, names):
        self.names = names


class _Layer:
    def __init__(self, name, obj, geom_col=None, style_col=None,
                 fid_col=None):
        self.name = name
        self.obj = obj
        if _is_dataset(obj):
            s = obj.schema()      # ray.data Schema: .names + .types
            names = list(s.names)
            types = list(s.types)
        else:
            names = list(obj.schema.names)
            types = [obj.schema.field(n).type for n in names]
        self.schema = _SchemaView(names)
        self.fields = [(n, swq_type_of_arrow(t))
                       for n, t in zip(names, types)]
        if geom_col is None:
            for cand in ("geometry", "wkb", "geom", "_ogr_geometry_"):
                for n, t in self.fields:
                    if n.lower() == cand and t == "geometry":
                        geom_col = n
                        break
                if geom_col:
                    break
        self.geom_col = geom_col
        self.style_col = style_col
        if fid_col is None and any(n.lower() == "fid" for n in names):
            fid_col = next(n for n in names if n.lower() == "fid")
        self.fid_col = fid_col
        # attribute fields exclude the geometry column
        self.attr_fields = [(n, t) for n, t in self.fields
                            if n != self.geom_col]

    def dataset(self, columns):
        """A Dataset of this layer pruned to ``columns`` (source order
        preserved)."""
        import ray.data
        cols = [c for c in dict.fromkeys(columns) if c != "__fid__"]
        need_fid = "__fid__" in columns
        if not cols and not need_fid and self.schema.names:
            # zero-column selections (SELECT COUNT(*) / literal-only
            # projections) still need the row count: keep one column
            cols = [self.schema.names[0]]
        if _is_dataset(self.obj):
            ds = self.obj
            if need_fid and self.fid_col is None:
                ds = _with_fid(ds.select_columns(cols) if cols else ds)
                return ds
            sel = cols + ([self.fid_col] if need_fid and
                          self.fid_col not in cols else [])
            ds = ds.select_columns(sel) if sel else ds
            if need_fid and self.fid_col != "__fid__":
                fidc = self.fid_col

                def add(t: pa.Table) -> pa.Table:
                    return t.append_column(
                        "__fid__", pc.cast(t[fidc], pa.int64()))
                ds = ds.map_batches(add, batch_format="pyarrow")
                if fidc not in cols:
                    ds = ds.select_columns(cols + ["__fid__"])
            return ds
        tbl = self.obj
        if need_fid:
            if self.fid_col is not None:
                fid = pc.cast(tbl[self.fid_col], pa.int64())
            else:
                fid = pa.array(np.arange(tbl.num_rows, dtype=np.int64))
            tbl = tbl.select(cols).append_column("__fid__", fid) \
                if cols else pa.table({"__fid__": fid})
        else:
            tbl = tbl.select(cols)
        return ray.data.from_arrow(tbl)


def _with_fid(ds):
    """Attach a stable 0-based ``__fid__`` to a Dataset using per-block
    row counts (metadata only travels to the driver; blocks stay in the
    object store).  Materializes the upstream pipeline once — only used
    when a statement actually needs FID semantics."""
    import ray

    mat = ds.materialize()
    bundles = list(mat.iter_internal_ref_bundles())
    refs, offs = [], []
    off = 0
    for b in bundles:
        for ref, meta in b.blocks:
            refs.append(ref)
            offs.append(off)
            off += meta.num_rows

    @ray.remote
    def add(block, start):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(
            block)
        return t.append_column("__fid__", pa.array(
            np.arange(start, start + t.num_rows, dtype=np.int64)))

    import ray.data
    return ray.data.from_arrow_refs(
        [add.remote(r, o) for r, o in zip(refs, offs)])


# ------------------------------------------------------------ planning

class _OutCol:
    def __init__(self, expr, name, src_table=0):
        self.expr = expr
        self.name = name
        self.src_table = src_table


class _Plan:
    def __init__(self):
        self.layers: list[_Layer] = []
        self.aliases: list[str] = []
        self.out: list[_OutCol] = []
        self.geom_out: str | None = None     # passthrough geometry column
        self.mode = "recordset"              # | 'summary' | 'distinct'


def _contains_agg(node) -> bool:
    if isinstance(node, Agg):
        return True
    if isinstance(node, Cast):
        return _contains_agg(node.arg)
    return any(_contains_agg(a) for a in getattr(node, "args", []) or [])


def _special_key(name: str) -> str | None:
    up = name.upper()
    return up if up in _SPECIAL_TYPES else None


def _make_binder(plan: _Plan, sel: Select, used: list[set]):
    """binder(table, name) -> (bound_key, swq_type); records referenced
    source columns per table in ``used``."""
    def binder(table: str, name: str):
        cand_tables = range(len(plan.layers))
        if table:
            idx = None
            for i, al in enumerate(plan.aliases):
                if al.lower() == table.lower():
                    idx = i
                    break
            if idx is None:
                raise OGRSQLError(f"Unknown table {table}")
            cand_tables = [idx]
        for ti in cand_tables:
            lyr = plan.layers[ti]
            for n, t in lyr.attr_fields:
                if n.lower() == name.lower():
                    used[ti].add(n)
                    return (f"t{ti}.{n}", t)
            if lyr.geom_col is not None and \
                    name.lower() in (lyr.geom_col.lower(),
                                     "_ogr_geometry_"):
                used[ti].add(lyr.geom_col)
                return (f"t{ti}.{lyr.geom_col}", "geometry")
        sp = _special_key(name)
        if sp is not None:
            ti = 0
            if sp == "FID":
                used[0].add("__fid__")
            elif sp == "OGR_STYLE":
                if plan.layers[0].style_col:
                    used[0].add(plan.layers[0].style_col)
            else:
                if plan.layers[0].geom_col is None:
                    raise OGRSQLError(
                        f"no geometry field for special field {name}")
                used[0].add(plan.layers[0].geom_col)
            return (f"sp{ti}.{sp}", _SPECIAL_TYPES[sp])
        raise OGRSQLError(f"Unknown field {name}")
    return binder


def _expand_columns(plan: _Plan, sel: Select):
    """Wildcard expansion per swq_select::expand_wildcard (prefix with
    the table alias for explicit ``t.*`` or on duplicate names) plus
    EXCEPT/EXCLUDE filtering."""
    out: list[_OutCol] = []
    geom_excluded = False
    all_fields = []                      # (ti, name)
    for ti, lyr in enumerate(plan.layers):
        for n, _t in lyr.attr_fields:
            all_fields.append((ti, n))

    for c in sel.columns:
        if c.wildcard_table is None:
            out.append(("expr", c))
            continue
        if c.wildcard_table == "":
            items = list(all_fields)
            explicit = False
        else:
            idx = None
            for i, al in enumerate(plan.aliases):
                if al.lower() == c.wildcard_table.lower():
                    idx = i
                    break
            if idx is None:
                raise OGRSQLError(
                    f"Table {c.wildcard_table} not recognised from "
                    f"{c.wildcard_table}.* definition.")
            items = [(ti, n) for ti, n in all_fields if ti == idx]
            explicit = True
        exc = {(t.lower(), n.lower()) for t, n in c.except_fields}
        if exc:
            # validate the EXCEPT list
            for t, n in c.except_fields:
                ok = any((not t or plan.aliases[ti].lower() == t.lower())
                         and fn.lower() == n.lower()
                         for ti, fn in all_fields)
                geomname = plan.layers[0].geom_col
                if n.lower() == "_ogr_geometry_" or (
                        geomname and n.lower() == geomname.lower()):
                    ok = True
                if not ok:
                    raise OGRSQLError(f"Unknown field {n} in EXCEPT list")
            seen = set()
            dup = [x for x in c.except_fields
                   if (x[0].lower(), x[1].lower()) in seen or
                   seen.add((x[0].lower(), x[1].lower()))]
            if dup:
                raise OGRSQLError("duplicate field in EXCEPT list")
        kept = []
        for ti, n in items:
            key = None
            if (plan.aliases[ti].lower(), n.lower()) in exc or \
                    ("", n.lower()) in exc and \
                    (not any(pt != ti and pn.lower() == n.lower()
                             for pt, pn in all_fields) or ti == 0):
                continue
            kept.append((ti, n))
        gname = plan.layers[0].geom_col
        if gname is not None:
            gl = gname.lower()
            if ("", "_ogr_geometry_") in exc or ("", gl) in exc or \
                    (plan.aliases[0].lower(), gl) in exc:
                geom_excluded = True
        for ti, n in kept:
            prefix = explicit
            if not prefix and ti != 0:
                # duplicate of an earlier field anywhere → prefix
                my_pos = all_fields.index((ti, n))
                for pt, pn in all_fields[:my_pos]:
                    if pn.lower() == n.lower():
                        prefix = True
                        break
            name = f"{plan.aliases[ti]}.{n}" if prefix else n
            out.append(("field", ti, n, name))
    return out, geom_excluded


_AGG_CANON = {"MIN": "MIN", "MAX": "MAX", "AVG": "AVG", "SUM": "SUM",
              "COUNT": "COUNT", "STDDEV_POP": "STDDEV_POP",
              "STDDEV_SAMP": "STDDEV_SAMP"}


def _out_name(c, expr, field_count):
    if c.alias:
        return c.alias
    if isinstance(expr, Agg):
        base = expr.col.name if expr.col is not None else "*"
        return f"{_AGG_CANON[expr.func]}_{base}"
    if isinstance(expr, Op) and expr.name in ("CONCAT", "SUBSTR") and \
            isinstance(expr.args[0], Col):
        return f"{expr.name}_{expr.args[0].name}"
    if isinstance(expr, Col):
        return (f"{expr.table}.{expr.name}" if expr.table else expr.name)
    if isinstance(expr, Cast) and isinstance(expr.arg, Col):
        return expr.arg.name
    return f"FIELD_{field_count + 1}"


# ---------------------------------------------------------- execution

def execute_sql(sql: str, layers: dict, *, geom_columns=None,
                style_columns=None, fid_columns=None):
    """Execute an OGR SQL SELECT over ``layers`` (mapping layer name →
    ``ray.data.Dataset`` or ``pyarrow.Table``).  Returns a
    ``ray.data.Dataset``.

    ``geom_columns`` / ``style_columns`` / ``fid_columns`` optionally
    map layer names to the column carrying WKB geometry / OGR style
    strings / stable feature ids (auto-detected otherwise).
    """
    sel = parse_select(sql)
    return _exec_select(sel, layers, geom_columns or {},
                        style_columns or {}, fid_columns or {})


def execute_sql_table(sql: str, layers: dict, **kw) -> pa.Table:
    """Convenience for tests: execute and materialize to one pa.Table."""
    ds = execute_sql(sql, layers, **kw)
    tbls = [b for b in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None)]
    if not tbls:
        return pa.table({})
    t = pa.concat_tables([pa.table(b) if not isinstance(b, pa.Table)
                          else b for b in tbls])
    return t


def _exec_select(sel: Select, layers, geom_columns, style_columns,
                 fid_columns):
    import ray.data

    plan = _Plan()
    lmap = {k.lower(): (k, v) for k, v in layers.items()}
    for tref in sel.tables:
        hit = lmap.get(tref.name.lower())
        if hit is None:
            raise OGRSQLError(f"Unknown table {tref.name}")
        key, obj = hit
        plan.layers.append(_Layer(
            key, obj, geom_col=geom_columns.get(key),
            style_col=style_columns.get(key),
            fid_col=fid_columns.get(key)))
        plan.aliases.append(tref.alias)

    used = [set() for _ in plan.layers]
    binder = _make_binder(plan, sel, used)

    expanded, geom_excluded = _expand_columns(plan, sel)

    # classify: summary (aggregates) / distinct-list / recordset
    has_agg = False
    has_plain = False
    distinct = False
    for e in expanded:
        if e[0] == "field":
            has_plain = True
        else:
            c = e[1]
            if c.distinct:
                distinct = True
            elif isinstance(c.expr, Agg):
                has_agg = True
            else:
                has_plain = True
    if has_agg and distinct:
        raise OGRSQLError("mixing DISTINCT and aggregate functions "
                          "is not supported")
    if has_agg and has_plain:
        raise OGRSQLError("mixing field list with aggregate functions "
                          "is not supported")

    # bind every expression (records used source columns)
    out_cols: list[_OutCol] = []
    nfields = 0
    for e in expanded:
        if e[0] == "field":
            # wildcard-expanded fields bind by exact column identity
            # (case-insensitive lookup would collapse id/ID/ID2)
            _k, ti, n, name = e
            expr = Col(plan.aliases[ti], n)
            expr.bound = f"t{ti}.{n}"
            expr.rtype = dict(plan.layers[ti].attr_fields)[n]
            used[ti].add(n)
            out_cols.append(_OutCol(expr, name, ti))
        else:
            c = e[1]
            bind_expr(c.expr, binder)
            name = _out_name(c, c.expr, nfields)
            if c.hidden:
                continue
            out_cols.append(_OutCol(c.expr, name))
        nfields += 1
    names_seen = {}
    for oc in out_cols:
        if oc.name in names_seen:
            names_seen[oc.name] += 1
            oc.name = f"{oc.name}_{names_seen[oc.name]}"
        else:
            names_seen[oc.name] = 0
    # undo suffixing for exact-duplicate display names the reference
    # keeps duplicated (SELECT *, * FROM ...) — pyarrow tables cannot
    # hold duplicate names, so we keep the _N suffix but remember the
    # display name in metadata-free fashion (documented divergence).

    where = sel.where
    if where is not None:
        if _contains_agg(where):
            raise OGRSQLError(
                "aggregate functions are not allowed in a WHERE clause")
        t = bind_expr(where, binder)
        if t == "geometry":
            raise OGRSQLError("WHERE clause must evaluate to boolean")

    for jd in sel.joins:
        bind_expr(jd.cond, binder, join_cast=True)

    # ORDER BY binding (source fields / special fields only)
    order_keys = []
    for od in sel.order:
        key, typ = binder(od.table, od.name)
        if typ == "geometry":
            raise OGRSQLError(
                f"Cannot use geometry field '{od.name}' in a ORDER BY "
                "clause")
        order_keys.append((key, typ, od.ascending))

    if distinct:
        if sel.order:
            if len(sel.order) > 1:
                raise OGRSQLError(
                    "Can't ORDER BY a DISTINCT list by more than one key.")
            c0 = expanded[0][1].expr
            if sel.order[0].name.lower() != c0.name.lower():
                raise OGRSQLError(
                    "Only selected DISTINCT field can be used for "
                    "ORDER BY.")
        return _exec_distinct(plan, sel, out_cols, where, used)

    if has_agg:
        return _exec_summary(plan, sel, out_cols, where, used)

    return _exec_recordset(plan, sel, out_cols, where, order_keys, used,
                            geom_excluded)


# ------------------------------------------------------ common helpers

def _batch_cols(plan, ti, t: pa.Table):
    """Column map for eval_expr from a source batch of table ti."""
    cols = {}
    lyr = plan.layers[ti]
    for n in t.schema.names:
        if n == "__fid__":
            cols[f"sp{ti}.FID"] = t[n].combine_chunks() if isinstance(
                t[n], pa.ChunkedArray) else t[n]
        else:
            cols[f"t{ti}.{n}"] = t[n]
    return cols


def _add_specials(plan, cols, n):
    """Synthesize referenced special fields from the geometry column."""
    lyr = plan.layers[0]
    g = cols.get(f"t0.{lyr.geom_col}") if lyr.geom_col else None
    if g is not None:
        from ..geo.wkb import wkb_area, wkb_geom_type
        from ..io.wkt import wkb_to_wkt
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        bufs = g.to_pylist()

        def names():
            out = []
            for b in bufs:
                if b is None:
                    out.append(None)
                    continue
                code = wkb_geom_type(b)
                base = _GEOM_NAMES.get(code % 1000, "GEOMETRY")
                out.append(base)
            return out
        cols["sp0.OGR_GEOMETRY"] = pa.array(names(), pa.string())
        cols["sp0.OGR_GEOM_WKT"] = pa.array(
            [None if b is None else wkb_to_wkt(b) for b in bufs],
            pa.string())
        cols["sp0.OGR_GEOM_AREA"] = pa.array(
            [None if b is None else float(wkb_area(b)) for b in bufs],
            pa.float64())
    if lyr.style_col:
        cols["sp0.OGR_STYLE"] = cols.get(f"t0.{lyr.style_col}")
    else:
        cols["sp0.OGR_STYLE"] = pa.nulls(n, pa.string())
    return cols


def _referenced_specials(used0: set, lyr) -> list[str]:
    return [c for c in used0]


def _canon_key(arr: pa.Array) -> pa.Array:
    """Join keys must agree in type across both sides: numerics widen
    to float64, temporals to int64 microseconds, strings stay."""
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_floating(t) or \
            pa.types.is_boolean(t) or pa.types.is_decimal(t):
        return pc.cast(arr, pa.float64())
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
    return pc.cast(arr, pa.string())


def _extract_equi(plan, join):
    """ON condition → (primary_key_expr, secondary_key_expr, sec_index).
    Only the reference's supported shape (equality between a prior
    table's field and the secondary's field) is accepted."""
    cond = join.cond
    if not (isinstance(cond, Op) and cond.name == "=" and
            len(cond.args) == 2):
        raise OGRSQLError(
            "JOIN ON condition must be a single field equality")
    sec_alias = join.table.alias.lower()

    def table_of(e):
        x = e.arg if isinstance(e, Cast) else e
        if not isinstance(x, Col):
            return None
        return x.table.lower()

    t0, t1 = table_of(cond.args[0]), table_of(cond.args[1])
    if t0 is None or t1 is None:
        raise OGRSQLError(
            "JOIN ON condition must compare two table fields")
    if t0 == sec_alias and t1 != sec_alias:
        return cond.args[1], cond.args[0]
    if t1 == sec_alias and t0 != sec_alias:
        return cond.args[0], cond.args[1]
    raise OGRSQLError(
        "JOIN ON condition must reference the joined table on one side")


def _exec_recordset(plan, sel, out_cols, where, order_keys, used,
                    geom_excluded):
    import ray.data

    need_fid = "__fid__" in used[0]
    # geometry passthrough (GenSQL keeps the primary geometry unless
    # explicitly excluded)
    geom_name = None
    lyr0 = plan.layers[0]
    if lyr0.geom_col is not None and not geom_excluded and \
            not any(oc.expr.rtype == "geometry" for oc in out_cols):
        geom_name = lyr0.geom_col
        used[0].add(geom_name)

    cols0 = sorted(c for c in used[0] if c != "__fid__")
    ds = lyr0.dataset(cols0 + (["__fid__"] if need_fid else []))

    joins = []
    for ji, jd in enumerate(sel.joins, start=1):
        pk, sk = _extract_equi(plan, jd)
        joins.append((ji, pk, sk))

    ds = _flat_rename(ds, {n: f"t0.{n}" for n in cols0})

    for ji, pk, sk in joins:
        lyr = plan.layers[ji]
        sec_used = sorted(used[ji])
        sec = lyr.dataset(sec_used + ["__fid__"])
        kcol, rkcol = f"__jk{ji}", f"__jk{ji}r"

        def make_sec_prep(ji=ji, sk=sk, sec_used=tuple(sec_used),
                          rkcol=rkcol):
            def prep(t: pa.Table) -> pa.Table:
                cols = {f"t{ji}.{n}": t[n] for n in sec_used}
                cols[f"sp{ji}.FID"] = t["__fid__"]
                key = _canon_key(eval_expr(sk, cols, t.num_rows))
                out = {f"t{ji}.{n}": t[n] for n in sec_used}
                out[rkcol] = key
                out["__sfid__"] = t["__fid__"]
                # null join keys never match (SQL semantics; the
                # reference skips the join on a null source key too,
                # ogr_gensql.cpp:1509)
                return pa.table(out).filter(pc.is_valid(key))
            return prep

        sec = sec.map_batches(make_sec_prep(), batch_format="pyarrow")

        # first-match dedup: min FID per key (one shuffle;
        # OGRGenSQLResultsLayer fetches GetNextFeature() once)
        def first_per_key(df):
            return df.loc[[df["__sfid__"].idxmin()]]
        sec = sec.groupby(rkcol).map_groups(
            first_per_key, batch_format="pandas")
        sec = sec.map_batches(
            lambda t: t.drop_columns(["__sfid__"]),
            batch_format="pyarrow")

        def make_prim_key(pk=pk, kcol=kcol):
            def add_key(t: pa.Table) -> pa.Table:
                cols = {}
                for n in t.schema.names:
                    if n == "__fid__":
                        cols["sp0.FID"] = pc.cast(t[n], pa.int64())
                    else:
                        cols[n] = t[n]
                key = _canon_key(eval_expr(pk, cols, t.num_rows))
                return t.append_column(kcol, key)
            return add_key

        ds = ds.map_batches(make_prim_key(), batch_format="pyarrow")
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4))
        nparts = max(2, min(16, cpus // 2))
        ds = ds.join(sec, "left_outer", nparts, on=(kcol,),
                     right_on=(rkcol,),
                     aggregator_ray_remote_args={"num_cpus": 0.25})
        ds = ds.map_batches(
            lambda t, d=(kcol, rkcol): t.drop_columns(
                [c for c in d if c in t.schema.names]),
            batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for cn in t.schema.names:
            if cn == "__fid__":
                cols["sp0.FID"] = pc.cast(t[cn], pa.int64())
            else:
                cols[cn] = t[cn]
        if any(k.startswith("sp0.") and k != "sp0.FID"
               for k in _all_special_refs(out_cols, where, order_keys)):
            _add_specials_flat(plan, cols, n)
        if where is not None:
            mask = truth_mask(eval_expr(where, cols, n))
            t2 = {}
            for k, v in cols.items():
                arr = v.combine_chunks() if isinstance(
                    v, pa.ChunkedArray) else v
                t2[k] = arr.filter(mask)
            cols = t2
            n = len(next(iter(cols.values()))) if cols else 0
        out = {}
        for oc in out_cols:
            arr = eval_expr(oc.expr, cols, n)
            out[oc.name] = pc.cast(arr, arrow_type_of(oc.expr.rtype),
                                   safe=False)
        if geom_name is not None:
            gk = f"t0.{geom_name}"
            out[geom_name] = cols[gk]
        for i, (key, typ, asc) in enumerate(order_keys):
            arr = cols[key]
            arr = arr.combine_chunks() if isinstance(
                arr, pa.ChunkedArray) else arr
            out[f"__ord{i}"] = _sortable(arr, typ)
            out[f"__nn{i}"] = pc.is_valid(arr)
        return pa.table(out)

    ds = ds.map_batches(project, batch_format="pyarrow")

    if order_keys:
        keys = []
        desc = []
        for i, (_k, _t, asc) in enumerate(order_keys):
            keys += [f"__nn{i}", f"__ord{i}"]
            desc += [not asc, not asc]
        ds = ds.sort(keys, descending=desc)
        drop = [f"__ord{i}" for i in range(len(order_keys))] + \
               [f"__nn{i}" for i in range(len(order_keys))]
        ds = ds.map_batches(
            lambda t, d=tuple(drop): t.drop_columns(list(d)),
            batch_format="pyarrow")

    if sel.offset:
        lim = sel.offset + sel.limit if sel.limit is not None else None
        if lim is not None:
            ds = ds.limit(lim)
        parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None)]
        tbl = (pa.concat_tables([pa.table(b) for b in parts])
               if parts else None)
        if tbl is None or tbl.num_rows <= sel.offset:
            tbl = (tbl.slice(0, 0) if tbl is not None else pa.table({}))
        else:
            tbl = tbl.slice(sel.offset)
        import ray.data
        ds = ray.data.from_arrow(tbl)
    elif sel.limit is not None:
        ds = ds.limit(sel.limit)

    if sel.union_all is not None:
        other = _exec_select(sel.union_all, _relayer(plan), {}, {}, {})
        ds = ds.union(other)
    return ds


def _relayer(plan):
    return {l.name: l.obj for l in plan.layers}


def _flat_rename(ds, mapping: dict):
    if not mapping:
        return ds

    def ren(t: pa.Table, m=tuple(mapping.items())) -> pa.Table:
        names = [dict(m).get(n, n) for n in t.schema.names]
        return t.rename_columns(names)
    return ds.map_batches(ren, batch_format="pyarrow")


def _all_special_refs(out_cols, where, order_keys):
    refs = set()

    def walk(node):
        if isinstance(node, Col) and isinstance(node.bound, str) and \
                node.bound.startswith("sp"):
            refs.add(node.bound)
        for a in getattr(node, "args", []) or []:
            walk(a)
        if isinstance(node, Cast):
            walk(node.arg)
        if isinstance(node, Agg) and node.col is not None:
            walk(node.col)
    for oc in out_cols:
        walk(oc.expr)
    if where is not None:
        walk(where)
    for key, _t, _a in order_keys:
        if key.startswith("sp"):
            refs.add(key)
    return refs


def _add_specials_flat(plan, cols, n):
    _add_specials(plan, cols, n)


def _sortable(arr: pa.Array, typ: str) -> pa.Array:
    """Null-free sortable key column (nulls ranked via the __nn flag)."""
    if typ in ("integer", "integer64"):
        return pc.fill_null(pc.cast(arr, pa.int64()), 0)
    if typ == "float":
        return pc.fill_null(pc.cast(arr, pa.float64()), 0.0)
    if typ in ("timestamp", "date", "time"):
        return pc.fill_null(pc.cast(arr, pa.timestamp("us")),
                            pa.scalar(0, pa.timestamp("us")))
    return pc.fill_null(pc.cast(arr, pa.string()), "")


# ------------------------------------------------------------ summary

def _exec_summary(plan, sel, out_cols, where, used):
    """Aggregate query → exactly one output row (PrepareSummary,
    ogr_gensql.cpp:845).  Per-batch partials stream through map_batches;
    the driver merges a bounded list of single-row partial tables."""
    import ray.data

    if len(plan.layers) > 1:
        raise OGRSQLError(
            "aggregates over joined tables are not supported")
    lyr = plan.layers[0]
    cols0 = sorted(c for c in used[0] if c != "__fid__")
    ds = lyr.dataset(cols0)
    ds = _flat_rename(ds, {n: f"t0.{n}" for n in cols0})

    aggs = [oc.expr for oc in out_cols]
    specs = []
    for a in aggs:
        specs.append((a.func, a.col.bound if a.col is not None else None,
                      a.col.rtype if a.col is not None else None,
                      a.distinct))

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {cn: t[cn] for cn in t.schema.names}
        if any((k or "").startswith("sp0.") for _f, k, _t, _d in specs) \
                or (where is not None):
            _add_specials_flat(plan, cols, n)
        if where is not None:
            mask = truth_mask(eval_expr(where, cols, n))
            cols = {k: (v.combine_chunks() if isinstance(
                v, pa.ChunkedArray) else v).filter(mask)
                for k, v in cols.items()}
            n = len(next(iter(cols.values()))) if cols else 0
        out = {"__rows": pa.array([n], pa.int64())}
        for i, (func, key, typ, dist) in enumerate(specs):
            arr = cols[key] if key is not None else None
            if arr is not None and isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if func == "COUNT":
                if key is None:
                    out[f"a{i}_count"] = pa.array([n], pa.int64())
                elif dist:
                    vals = pc.drop_null(arr).unique()
                    out[f"a{i}_set"] = pa.array(
                        [vals.to_pylist()])
                else:
                    out[f"a{i}_count"] = pa.array(
                        [n - arr.null_count], pa.int64())
                continue
            valid = pc.drop_null(arr)
            cnt = len(valid)
            if typ == "string":
                vv = valid.to_pylist()
                out[f"a{i}_min"] = pa.array(
                    [min(vv) if vv else None], pa.string())
                out[f"a{i}_max"] = pa.array(
                    [max(vv) if vv else None], pa.string())
                out[f"a{i}_count"] = pa.array([cnt], pa.int64())
                continue
            f = pc.cast(valid, pa.float64()) if typ not in (
                "timestamp", "date", "time") else pc.cast(
                pc.cast(valid, pa.timestamp("us")), pa.int64())
            fn = f.to_numpy(zero_copy_only=False) if cnt else \
                np.empty(0, np.float64)
            out[f"a{i}_count"] = pa.array([cnt], pa.int64())
            if cnt:
                fin = bool(np.isfinite(fn.astype(np.float64)).all())
                if fin:
                    s, c = _kbn_sum(fn.astype(np.float64))
                else:
                    # the reference freezes the correction once a
                    # non-finite term appears (swq.cpp:482): plain IEEE
                    # summation semantics take over
                    s, c = float(np.sum(fn.astype(np.float64))), 0.0
                out[f"a{i}_min"] = pa.array([float(np.min(fn))])
                out[f"a{i}_max"] = pa.array([float(np.max(fn))])
                out[f"a{i}_sum"] = pa.array([s])
                out[f"a{i}_corr"] = pa.array([c])
                out[f"a{i}_finite"] = pa.array([fin])
                m = float(np.mean(fn.astype(np.float64)))
                out[f"a{i}_mean"] = pa.array([m])
                out[f"a{i}_m2"] = pa.array(
                    [float(np.sum((fn.astype(np.float64) - m) ** 2))])
            else:
                for suf in ("min", "max", "sum", "corr", "mean", "m2"):
                    out[f"a{i}_{suf}"] = pa.array([None], pa.float64())
                out[f"a{i}_finite"] = pa.array([True])
        return pa.table(out)

    parts = [pa.table(b) for b in ds.map_batches(
        partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None)]

    # string min/max need their own pass structure — handled above via
    # typed partials; merge now
    out = {}
    for i, ((func, key, typ, dist), oc) in enumerate(zip(specs, out_cols)):
        name = out_cols[i].name
        at = arrow_type_of(out_cols[i].expr.rtype)
        if func == "COUNT":
            if dist:
                seen = set()
                for p in parts:
                    if f"a{i}_set" in p.schema.names:
                        for v in p[f"a{i}_set"].to_pylist():
                            seen.update(v)
                out[name] = pa.array([len(seen)], pa.int64())
            else:
                tot = sum(p[f"a{i}_count"][0].as_py() for p in parts)
                out[name] = pa.array([tot], pa.int64())
            continue
        if typ == "string":
            mins = [p[f"a{i}_min"][0].as_py() for p in parts
                    if p[f"a{i}_min"][0].is_valid]
            maxs = [p[f"a{i}_max"][0].as_py() for p in parts
                    if p[f"a{i}_max"][0].is_valid]
            if func == "MIN":
                out[name] = pa.array([min(mins) if mins else None],
                                     pa.string())
            else:
                out[name] = pa.array([max(maxs) if maxs else None],
                                     pa.string())
            continue
        cnt = sum(p[f"a{i}_count"][0].as_py() for p in parts)
        vals = [p for p in parts if p[f"a{i}_count"][0].as_py() > 0]
        if cnt == 0:
            out[name] = pa.nulls(1, at)
            continue
        if func == "MIN":
            v = min(p[f"a{i}_min"][0].as_py() for p in vals)
            out[name] = pa.array([v]).cast(at)
        elif func == "MAX":
            v = max(p[f"a{i}_max"][0].as_py() for p in vals)
            out[name] = pa.array([v]).cast(at)
        elif func == "SUM":
            s = 0.0
            c = 0.0
            all_fin = all(p[f"a{i}_finite"][0].as_py() for p in vals)
            if all_fin:
                for p in vals:
                    s, c = _kbn_add(s, c, p[f"a{i}_sum"][0].as_py())
                    c += p[f"a{i}_corr"][0].as_py()
                total = s + c
            else:
                total = float(np.sum([p[f"a{i}_sum"][0].as_py()
                                      for p in vals]))
            if out_cols[i].expr.rtype in ("integer", "integer64"):
                out[name] = pa.array([int(total)], pa.int64()).cast(at)
            else:
                out[name] = pa.array([total], pa.float64())
        elif func == "AVG":
            s = sum(p[f"a{i}_sum"][0].as_py() + p[f"a{i}_corr"][0].as_py()
                    for p in vals)
            if typ in ("timestamp", "date", "time"):
                us = int(round(s / cnt))
                out[name] = pa.array(
                    np.array([us], dtype="int64")).cast(
                    pa.timestamp("us"))
            else:
                out[name] = pa.array([s / cnt], pa.float64())
        else:    # STDDEV_POP / STDDEV_SAMP via Chan's parallel merge
            tc = 0.0
            tm = 0.0
            tm2 = 0.0
            for p in vals:
                c2 = p[f"a{i}_count"][0].as_py()
                m2v = p[f"a{i}_m2"][0].as_py()
                mv = p[f"a{i}_mean"][0].as_py()
                if tc == 0:
                    tc, tm, tm2 = c2, mv, m2v
                else:
                    d = mv - tm
                    tot = tc + c2
                    tm2 = tm2 + m2v + d * d * tc * c2 / tot
                    tm = tm + d * c2 / tot
                    tc = tot
            if func == "STDDEV_SAMP":
                if tc < 2:
                    out[name] = pa.nulls(1, pa.float64())
                else:
                    out[name] = pa.array([float(np.sqrt(tm2 / (tc - 1)))])
            else:
                out[name] = pa.array([float(np.sqrt(tm2 / tc))])

    import ray.data
    res = ray.data.from_arrow(pa.table(out))
    if sel.union_all is not None:
        raise OGRSQLError("UNION ALL with aggregates is not supported")
    return res


def _kbn_sum(x: np.ndarray):
    """Kahan-Babuska-Neumaier sum (swq.cpp:475)."""
    s = 0.0
    c = 0.0
    for v in x.tolist():
        s, c = _kbn_add(s, c, v)
    return s, c


def _kbn_add(s, c, v):
    t = s + v
    if abs(s) >= abs(v):
        c += (s - t) + v
    else:
        c += (v - t) + s
    return t, c


# ----------------------------------------------------------- distinct

def _exec_distinct(plan, sel, out_cols, where, used):
    """SELECT DISTINCT field: first-seen order without ORDER BY, value
    order (nulls first asc / last desc) with it (swq.cpp:324 +
    ogr_sql_test 2/3/36)."""
    import ray.data

    lyr = plan.layers[0]
    oc = out_cols[0]
    cols0 = sorted(c for c in used[0] if c != "__fid__")
    ds = lyr.dataset(cols0 + ["__fid__"])
    ds = _flat_rename(ds, {n: f"t0.{n}" for n in cols0})

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {cn: t[cn] for cn in t.schema.names}
        cols["sp0.FID"] = pc.cast(t["__fid__"], pa.int64())
        if isinstance(oc.expr, Col) and isinstance(oc.expr.bound, str) \
                and oc.expr.bound.startswith("sp0.") or where is not None:
            _add_specials_flat(plan, cols, n)
        if where is not None:
            mask = truth_mask(eval_expr(where, cols, n))
            cols = {k: (v.combine_chunks() if isinstance(
                v, pa.ChunkedArray) else v).filter(mask)
                for k, v in cols.items()}
            n = len(next(iter(cols.values()))) if cols else 0
        v = eval_expr(oc.expr, cols, n)
        fid = cols["sp0.FID"]
        tt = pa.table({"v": v, "f": fid})
        g = tt.group_by("v").aggregate([("f", "min")])
        return pa.table({"v": g["v"], "f": g["f_min"]})

    parts = [pa.table(b) for b in ds.map_batches(
        partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None)]
    if parts:
        allp = pa.concat_tables(parts)
        g = allp.group_by("v").aggregate([("f", "min")])
    else:
        g = pa.table({"v": pa.nulls(0, arrow_type_of(oc.expr.rtype)),
                      "f_min": pa.nulls(0, pa.int64())})
    if sel.order:
        asc = sel.order[0].ascending
        idx = pc.sort_indices(
            g, sort_keys=[("v", "ascending" if asc else "descending")],
            null_placement="at_start" if asc else "at_end")
        g = g.take(idx)
    else:
        g = g.take(pc.sort_indices(g, sort_keys=[("f_min", "ascending")]))
    arr = pc.cast(g["v"], arrow_type_of(oc.expr.rtype), safe=False)
    res = pa.table({oc.name: arr})
    if sel.limit is not None:
        res = res.slice(sel.offset or 0, sel.limit)
    elif sel.offset:
        res = res.slice(sel.offset)
    return ray.data.from_arrow(res)
