"""OGR SQL expression type-checking and vectorized evaluation.

Mirrors the reference's evaluator semantics (``ogr/swq_op_general.cpp``)
over pyarrow arrays instead of per-feature nodes:

* type promotion (``SWQAutoPromoteIntegerToInteger64OrFloat``,
  ``SWQAutoConvertStringToNumeric`` — string CONSTANTS become floats in
  numeric comparisons, unparseable ones stay strings and then fail the
  argument-type check, which is how ``eas_id IN ('a165')`` errors),
* string comparisons are ASCII-case-insensitive (``strcasecmp``) for
  ``= <> < <= > >= IN BETWEEN``, while LIKE stays case-sensitive and
  ILIKE case-insensitive (``swq_test_like``),
* arithmetic: int/int stays integer with C truncating division;
  division or modulus by zero yields INT_MAX = 2147483647 (the
  reference's literal behavior, not an error),
* NULL handling: comparison/arithmetic operators propagate NULL;
  AND/OR use Kleene logic; IN returns NULL when no item matched but a
  NULL item was present,
* CAST follows ``SWQCastEvaluator``: ``atoi``-style prefix parsing for
  string→int, ``%.15g`` for float→string, CHARACTER(n) truncation,
* SUBSTR uses 1-based byte offsets with the reference's negative-offset
  and clamping rules; HSTORE_GET_VALUE ports ``OGRHStoreGetValue``'s
  quote grammar.

All hot paths are pyarrow.compute kernels; the only per-row Python is
in rare dynamic-argument SUBSTR and hstore parsing (decode-boundary
string munging on already-filtered batches).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .parser import Agg, Cast, Col, Lit, OGRSQLError, Op

__all__ = ["bind_expr", "eval_expr", "swq_type_of_arrow", "arrow_type_of",
           "truth_mask", "hstore_get_value", "parse_ogr_datetime"]

INT_MAX = 2147483647

_NUMERIC = ("integer", "integer64", "float", "boolean")
_TEMPORAL = ("date", "time", "timestamp")
_BOOL_OPS = ("=", "<>", "<", "<=", ">", ">=", "IN", "BETWEEN", "LIKE",
             "ILIKE", "IS NULL", "AND", "OR", "NOT")


def swq_type_of_arrow(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        if t.bit_width <= 32 and not pa.types.is_uint32(t):
            return "integer"
        return "integer64"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_time(t):
        return "time"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "geometry"
    raise OGRSQLError(f"unsupported column type {t} in OGR SQL")


def arrow_type_of(swq: str) -> pa.DataType:
    return {
        "boolean": pa.bool_(),
        "integer": pa.int32(),
        "integer64": pa.int64(),
        "float": pa.float64(),
        "string": pa.string(),
        "date": pa.timestamp("us"),
        "time": pa.string(),
        "timestamp": pa.timestamp("us"),
        "geometry": pa.binary(),
        "null": pa.string(),
    }[swq]


# ------------------------------------------------------------- binding

def _is_int(t: str) -> bool:
    return t in ("integer", "integer64")


def _promote_numeric(args: list) -> str:
    """SWQAutoPromoteIntegerToInteger64OrFloat over already-typed args."""
    t = args[0].rtype
    for a in args[1:]:
        if _is_int(t) and a.rtype == "float":
            t = "float"
        elif t == "integer" and a.rtype == "integer64":
            t = "integer64"
    return t


def _convert_string_constants(args: list) -> None:
    """SWQAutoConvertStringToNumeric: when numeric and string args mix,
    retype string CONSTANTS that parse as numbers to float; leave the
    rest (their mismatch is caught by the argument-type check)."""
    types = [a.rtype for a in args]
    has_num = any(t in _NUMERIC for t in types)
    has_str = any(t == "string" for t in types)
    if not (has_num and has_str):
        return
    for a in args:
        if isinstance(a, Lit) and a.rtype == "string":
            try:
                a.value = float(a.value)
            except (TypeError, ValueError):
                continue
            a.rtype = "float"
            a.type = "float"


def _promote_string_datetime(args: list) -> None:
    """SWQAutoPromoteStringToDateTime: string constants compared against
    date/time/timestamp args become timestamps."""
    if not any(a.rtype in _TEMPORAL for a in args):
        return
    for a in args:
        if isinstance(a, Lit) and a.rtype == "string":
            a.value = parse_ogr_datetime(a.value)
            if a.value is None:
                raise OGRSQLError(
                    "Failed to parse date evaluating OGR WHERE expression")
            a.rtype = "timestamp"
        elif a.rtype in ("date", "time"):
            a.rtype = "timestamp"


def bind_expr(node, binder, *, join_cast: bool = False):
    """Resolve columns through ``binder(table, name) -> (key, swq_type)``
    and annotate every node with its result type, applying the
    reference's promotion/checking rules.  Returns the node's type."""
    if isinstance(node, Lit):
        node.rtype = node.type
        return node.rtype
    if isinstance(node, Col):
        key, typ = binder(node.table, node.name)
        node.bound = key
        node.rtype = typ
        return typ
    if isinstance(node, Cast):
        argt = bind_expr(node.arg, binder)
        t = {"boolean": "boolean", "character": "string",
             "integer": "integer", "smallint": "integer",
             "bigint": "integer64", "float": "float", "real": "float",
             "numeric": "float", "timestamp": "timestamp",
             "date": "date", "time": "time",
             "geometry": "geometry"}[node.typename]
        if argt == "geometry" and node.typename not in ("character",
                                                        "geometry"):
            raise OGRSQLError(f"Cannot cast geometry to {node.typename}")
        if node.typename == "geometry" and argt not in ("geometry",
                                                        "string"):
            raise OGRSQLError(f"Cannot cast {argt} to geometry")
        node.rtype = t
        return t
    if isinstance(node, Agg):
        if node.col is not None:
            ct = bind_expr(node.col, binder)
            if node.func in ("AVG", "SUM", "STDDEV_POP", "STDDEV_SAMP") \
                    and ct not in _NUMERIC and ct not in _TEMPORAL:
                raise OGRSQLError(
                    f"{node.func}() on non-numeric field")
            if ct == "geometry" and node.func != "COUNT":
                raise OGRSQLError(
                    "Cannot use geometry field in this operation.")
        if node.func == "COUNT":
            node.rtype = "integer64"
        elif node.func in ("AVG", "STDDEV_POP", "STDDEV_SAMP"):
            node.rtype = "float"
        else:                       # MIN/MAX/SUM keep the source type
            node.rtype = node.col.rtype
        return node.rtype
    if not isinstance(node, Op):
        raise OGRSQLError("invalid expression node")

    for i in range(len(node.args)):
        bind_expr(node.args[i], binder)

    name = node.name
    if name == "IS NULL":        # the reference allows IS NULL on any type
        node.rtype = "boolean"
        return "boolean"
    if name in ("AND", "OR", "NOT"):
        for a in node.args:
            if a.rtype == "geometry":
                raise OGRSQLError(
                    "Cannot use geometry field in this operation.")
        node.rtype = "boolean"
        return "boolean"
    if name in ("=", "<>", "<", "<=", ">", ">=", "IN", "BETWEEN"):
        for a in node.args:
            if a.rtype == "geometry":
                raise OGRSQLError(
                    "Cannot use geometry field in this operation.")
        _convert_string_constants(node.args)
        _promote_numeric(node.args)
        _promote_string_datetime(node.args)
        # normalized argument class check (SWQGeneralChecker tail);
        # NULL literals compare with anything
        def _cls(t):
            return "float" if t in _NUMERIC else (
                "timestamp" if t in _TEMPORAL else t)
        want = next((_cls(a.rtype) for a in node.args
                     if a.rtype != "null"), "null")
        for i, a in enumerate(node.args):
            if _cls(a.rtype) != want and a.rtype != "null":
                if join_cast and name == "=" and len(node.args) == 2 and \
                        isinstance(node.args[0], Col) and \
                        isinstance(node.args[1], Col) and \
                        {want, _cls(a.rtype)} == {"float", "string"}:
                    # join convenience: cast the string side to FLOAT
                    j = i if _cls(a.rtype) == "string" else 0
                    node.args[j] = Cast(node.args[j], "float")
                    node.args[j].rtype = "float"
                    break
                raise OGRSQLError(
                    f"Type mismatch or improper type of arguments "
                    f"to {name} operator.")
        node.rtype = "boolean"
        return "boolean"
    if name in ("LIKE", "ILIKE"):
        for a in node.args:
            if a.rtype not in ("string", "null"):
                raise OGRSQLError(
                    f"Type mismatch or improper type of arguments "
                    f"to {name} operator.")
        node.rtype = "boolean"
        return "boolean"
    if name == "+":
        _promote_numeric(node.args)
        t0, t1 = node.args[0].rtype, node.args[1].rtype
        if t0 == "string" or t1 == "string":
            # '+' on strings concatenates; mixing string and numeric is
            # an error (SELECT 1 + 'a' is rejected)
            if not (t0 in ("string", "null") and t1 in ("string", "null")):
                raise OGRSQLError(
                    "Type mismatch or improper type of arguments "
                    "to + operator.")
            node.rtype = "string"
        elif "float" in (t0, t1):
            node.rtype = "float"
        elif "integer64" in (t0, t1):
            node.rtype = "integer64"
        else:
            node.rtype = "integer"
        return node.rtype
    if name in ("-", "*", "/", "%"):
        _promote_numeric(node.args)
        t0, t1 = node.args[0].rtype, node.args[1].rtype
        for t in (t0, t1):
            if t not in _NUMERIC and t != "null":
                raise OGRSQLError(
                    f"Type mismatch or improper type of arguments "
                    f"to {name} operator.")
        if "float" in (t0, t1):
            node.rtype = "float"
        elif "integer64" in (t0, t1):
            node.rtype = "integer64"
        else:
            node.rtype = "integer"
        return node.rtype
    if name == "CONCAT":
        for a in node.args:
            if a.rtype not in ("string", "null"):
                raise OGRSQLError(
                    "Type mismatch or improper type of arguments "
                    "to CONCAT operator.")
        node.rtype = "string"
        return "string"
    if name == "SUBSTR":
        if len(node.args) not in (2, 3):
            raise OGRSQLError(
                f"Expected 2 or 3 arguments to SUBSTR(), "
                f"but got {len(node.args)}.")
        if node.args[0].rtype != "string" or \
                not _is_int(node.args[1].rtype) or \
                (len(node.args) > 2 and not _is_int(node.args[2].rtype)):
            raise OGRSQLError(
                "Wrong argument type for SUBSTR(), expected "
                "SUBSTR(string,int,int) or SUBSTR(string,int).")
        node.rtype = "string"
        return "string"
    if name == "HSTORE_GET_VALUE":
        if len(node.args) != 2:
            raise OGRSQLError(
                f"Expected 2 arguments to hstore_get_value(), "
                f"but got {len(node.args)}.")
        for a in node.args:
            if a.rtype not in ("string", "null"):
                raise OGRSQLError(
                    "Wrong argument type for hstore_get_value(), "
                    "expected hstore_get_value(string,string).")
        node.rtype = "string"
        return "string"
    raise OGRSQLError(f"unsupported operation {name}")


# ---------------------------------------------------------- datetime

_DT_RE = re.compile(
    r"^\s*(\d{4})[-/](\d{1,2})[-/](\d{1,2})"
    r"(?:[T ](\d{1,2}):(\d{2})(?::(\d{2}(?:\.\d+)?))?"
    r"(?:\s*(Z|[+-]\d{2}:?\d{2}|[+-]\d{2}))?)?\s*$")


def parse_ogr_datetime(s: str):
    """OGRParseDate subset: YYYY[-/]MM[-/]DD [HH:MM[:SS[.sss]]] with an
    optional timezone suffix (ignored for ordering, as naive UTC).
    Returns np.datetime64('us') or None."""
    if s is None:
        return None
    m = _DT_RE.match(str(s))
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = float(m.group(6) or 0)
    try:
        base = np.datetime64(f"{y:04d}-{mo:02d}-{d:02d}", "us")
    except ValueError:
        return None
    us = ((hh * 60 + mi) * 60) * 1_000_000 + int(round(ss * 1_000_000))
    return base + np.timedelta64(us, "us")


# --------------------------------------------------------- evaluation

def _const_array(value, swq, n):
    at = arrow_type_of(swq)
    if value is None:
        return pa.nulls(n, at)
    if swq in ("timestamp", "date"):
        value = np.datetime64(value, "us")
        return pa.array(np.full(n, value, dtype="datetime64[us]"))
    return pa.array([value] * n, type=at)


def _as_float(arr):
    if pa.types.is_floating(arr.type):
        return arr
    return pc.cast(arr, pa.float64())


def _cmp_prepare(args, arrs):
    """Comparison argument normalization: numeric→float64,
    temporal→timestamp(us), string→ascii_lower (strcasecmp parity)."""
    kinds = [a.rtype for a in args]
    if any(k in _NUMERIC for k in kinds):
        return [_as_float(x) if not pa.types.is_floating(x.type) else x
                for x in arrs]
    if any(k in _TEMPORAL for k in kinds):
        out = []
        for a, x in zip(args, arrs):
            if pa.types.is_timestamp(x.type):
                out.append(pc.cast(x, pa.timestamp("us")))
            elif pa.types.is_date(x.type):
                out.append(pc.cast(x, pa.timestamp("us")))
            else:           # string column holding datetimes
                vals = [parse_ogr_datetime(v) for v in x.to_pylist()]
                out.append(pa.array(
                    np.array([np.datetime64("NaT", "us") if v is None
                              else v for v in vals],
                             dtype="datetime64[us]"),
                    from_pandas=True))
        return out
    return [pc.ascii_lower(pc.cast(x, pa.string())) for x in arrs]


_CMP = {"=": pc.equal, "<>": pc.not_equal, "<": pc.less,
        "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}


def _like_regex(pattern: str, escape) -> str:
    """Translate an OGR LIKE pattern (swq_test_like: % _ and an optional
    custom escape char; no default escape) to an anchored regex."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if escape is not None and c == escape and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return "^(?s:" + "".join(out) + ")$"


def _eval_like(node, arrs):
    rx = None
    pat = node.args[1]
    if isinstance(pat, Lit):
        if pat.value is None:
            return pa.nulls(len(arrs[0]), pa.bool_())
        rx = _like_regex(str(pat.value), node.escape)
        flags = "(?i)" if node.name == "ILIKE" else ""
        res = pc.match_substring_regex(pc.cast(arrs[0], pa.string()),
                                       flags + rx)
    else:
        ci = node.name == "ILIKE"
        vals = arrs[0].to_pylist()
        pats = arrs[1].to_pylist()
        out = []
        for v, p in zip(vals, pats):
            if v is None or p is None:
                out.append(None)
            else:
                r = re.compile(_like_regex(p, node.escape),
                               re.I if ci else 0)
                out.append(bool(r.match(v)))
        res = pa.array(out, type=pa.bool_())
    if node.negated:
        res = pc.invert(res)
    return res


def _c_div_int(a, b):
    """C truncating integer division with the reference's /0 → INT_MAX."""
    mask = pc.or_(pc.is_null(a), pc.is_null(b))
    an = pc.fill_null(a, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    bn = pc.fill_null(b, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    bz = np.where(bn == 0, 1, bn)
    q = np.trunc(an / bz).astype(np.int64)
    big = np.abs(an) > 2**52        # float path loses precision
    if big.any():
        qq = np.where((an % bz != 0) & ((an < 0) ^ (bz < 0)),
                      an // bz + 1, an // bz)
        q = np.where(big, qq, q)
    q = np.where(bn == 0, INT_MAX, q)
    return pa.array(q, type=pa.int64(),
                    mask=mask.to_numpy(zero_copy_only=False))


def _c_mod(a, b, is_float):
    mask = pc.or_(pc.is_null(a), pc.is_null(b))
    an = pc.fill_null(a, 0).to_numpy(zero_copy_only=False).astype(np.float64)
    bn = pc.fill_null(b, 0).to_numpy(zero_copy_only=False).astype(np.float64)
    bz = np.where(bn == 0, 1.0, bn)
    r = np.fmod(an, bz)
    r = np.where(bn == 0, float(INT_MAX), r)
    if is_float:
        return pa.array(r, type=pa.float64(),
                        mask=mask.to_numpy(zero_copy_only=False))
    return pa.array(r.astype(np.int64), type=pa.int64(),
                    mask=mask.to_numpy(zero_copy_only=False))


def _atoi_like(arr, target):
    """String→numeric with C atoi/atof prefix semantics ('12ab' → 12,
    'ab' → 0)."""
    if target == "float":
        rx = r"^[ \t]*(?P<v>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
    else:
        rx = r"^[ \t]*(?P<v>[+-]?\d+)"
    s = pc.cast(arr, pa.string())
    ext = pc.extract_regex(s, rx)
    got = pc.struct_field(ext, 0)
    num = pc.if_else(pc.is_null(got),
                     pa.scalar("0", pa.string()), got)
    f = pc.cast(num, pa.float64())
    # keep original nulls only
    f = pc.if_else(pc.is_null(s), pa.scalar(None, pa.float64()), f)
    if target == "float":
        return f
    return pc.cast(pc.trunc(f), pa.int64(), safe=False)


def _format_g15(arr):
    vals = arr.to_numpy(zero_copy_only=False)
    null = pc.is_null(arr).to_numpy(zero_copy_only=False)
    out = np.array(["%.15g" % v if not m else None
                    for v, m in zip(vals, null)], dtype=object)
    return pa.array(out, type=pa.string())


def eval_expr(node, cols: dict, n: int) -> pa.Array:
    """Evaluate a bound expression over a batch.  ``cols`` maps bound
    column keys to pyarrow arrays of length ``n``."""
    if isinstance(node, Lit):
        return _const_array(node.value, node.rtype, n)
    if isinstance(node, Col):
        arr = cols[node.bound]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr
    if isinstance(node, Cast):
        return _eval_cast(node, cols, n)
    if isinstance(node, Agg):
        raise OGRSQLError("aggregate in a row-level expression")
    name = node.name
    arrs = [eval_expr(a, cols, n) for a in node.args]

    if name == "AND":
        return pc.and_kleene(pc.cast(arrs[0], pa.bool_()),
                             pc.cast(arrs[1], pa.bool_()))
    if name == "OR":
        return pc.or_kleene(pc.cast(arrs[0], pa.bool_()),
                            pc.cast(arrs[1], pa.bool_()))
    if name == "NOT":
        return pc.invert(pc.cast(arrs[0], pa.bool_()))
    if name == "IS NULL":
        res = pc.is_null(arrs[0])
        return pc.invert(res) if node.negated else res
    if name in _CMP:
        a, b = _cmp_prepare(node.args, arrs)
        return _CMP[name](a, b)
    if name == "IN":
        subj = node.args[0]
        res = None
        for item, arr in zip(node.args[1:], arrs[1:]):
            prepped = _cmp_prepare([subj, item], [arrs[0], arr])
            eq = pc.equal(prepped[0], prepped[1])
            res = eq if res is None else pc.or_kleene(res, eq)
        if node.negated:
            res = pc.invert(res)
        return res
    if name == "BETWEEN":
        a, lo, hi = _cmp_prepare(node.args, arrs)
        res = pc.and_kleene(pc.greater_equal(a, lo), pc.less_equal(a, hi))
        if node.negated:
            res = pc.invert(res)
        return res
    if name in ("LIKE", "ILIKE"):
        return _eval_like(node, arrs)
    if name == "+":
        if node.rtype == "string":
            return pc.binary_join_element_wise(
                pc.cast(arrs[0], pa.string()), pc.cast(arrs[1], pa.string()),
                "")
        return _arith(name, node, arrs)
    if name in ("-", "*", "/", "%"):
        return _arith(name, node, arrs)
    if name == "CONCAT":
        parts = [pc.cast(x, pa.string()) for x in arrs]
        return pc.binary_join_element_wise(*parts, "")
    if name == "SUBSTR":
        return _eval_substr(node, arrs, n)
    if name == "HSTORE_GET_VALUE":
        hs = arrs[0].to_pylist()
        keys = arrs[1].to_pylist()
        out = [None if (h is None or k is None)
               else hstore_get_value(h, k) for h, k in zip(hs, keys)]
        return pa.array(out, type=pa.string())
    raise OGRSQLError(f"unsupported operation {name}")


def _arith(name, node, arrs):
    is_float = node.rtype == "float"
    if is_float:
        a, b = _as_float(arrs[0]), _as_float(arrs[1])
        if name == "+":
            return pc.add(a, b)
        if name == "-":
            return pc.subtract(a, b)
        if name == "*":
            return pc.multiply(a, b)
        if name == "/":
            safe = pc.if_else(pc.equal(b, 0.0),
                              pa.scalar(1.0, pa.float64()), b)
            r = pc.divide(a, safe)
            return pc.if_else(pc.equal(b, 0.0),
                              pa.scalar(float(INT_MAX), pa.float64()), r)
        return _c_mod(a, b, True)
    a = pc.cast(arrs[0], pa.int64())
    b = pc.cast(arrs[1], pa.int64())
    if name == "+":
        return pc.add(a, b)
    if name == "-":
        return pc.subtract(a, b)
    if name == "*":
        return pc.multiply(a, b)
    if name == "/":
        return _c_div_int(a, b)
    return _c_mod(a, b, False)


def _eval_substr(node, arrs, n):
    src = pc.cast(arrs[0], pa.string())
    const_args = all(isinstance(a, Lit) for a in node.args[1:])
    if const_args:
        off = int(node.args[1].value)
        size = int(node.args[2].value) if len(node.args) > 2 else 100000
        starts = np.full(n, off, np.int64)
        sizes = np.full(n, size, np.int64)
    else:
        starts = pc.cast(arrs[1], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sizes = (pc.cast(arrs[2], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
            if len(node.args) > 2 else np.full(n, 100000, np.int64))
    vals = src.to_pylist()
    out = []
    for v, off0, size0 in zip(vals, starts, sizes):
        if v is None:
            out.append(None)
            continue
        b = v.encode("utf-8")
        off, size = int(off0), int(size0)
        ln = len(b)
        if off > 0:
            off -= 1
        elif off < 0:
            off = ln + off if ln + off >= 0 else 0
        if size < 0 or off > ln:
            off, size = 0, 0
        elif off + size > ln:
            size = ln - off
        out.append(b[off:off + size].decode("utf-8", "replace"))
    return pa.array(out, type=pa.string())


# ------------------------------------------------------------- hstore

def _hstore_next_string(s: str, pos: int, is_key: bool):
    """Port of OGRHStoreGetNextString + CheckEnd: returns
    (token, next_pos) or None on syntax error."""
    n = len(s)
    i = pos
    in_string = False
    start = None
    buf = []
    while i < n:
        ch = s[i]
        if in_string:
            if ch == '"':
                # check end
                i += 1
                while i < n:
                    if s[i] == " ":
                        i += 1
                    elif is_key and s[i] == "=" and i + 1 < n and \
                            s[i + 1] == ">":
                        return "".join(buf), i + 2
                    elif not is_key and s[i] == ",":
                        return "".join(buf), i + 1
                    else:
                        return None
                return "".join(buf), i
            if ch == "\\":
                i += 1
                if i >= n:
                    return None
                ch = s[i]
            buf.append(ch)
            i += 1
            continue
        if ch == " ":
            if start is not None:
                tok = "".join(buf)
                i += 1
                while i < n:
                    if s[i] == " ":
                        i += 1
                    elif is_key and s[i] == "=" and i + 1 < n and \
                            s[i + 1] == ">":
                        return tok, i + 2
                    elif not is_key and s[i] == ",":
                        return tok, i + 1
                    else:
                        return None
                return tok, i
            i += 1
            continue
        if is_key and ch == "=" and i + 1 < n and s[i + 1] == ">":
            if start is not None:
                return "".join(buf), i + 2
            i += 1
            continue
        if not is_key and ch == ",":
            if start is not None:
                return "".join(buf), i + 1
            i += 1
            continue
        if ch == '"':
            in_string = True
            start = i + 1
            i += 1
            continue
        if start is None:
            start = i
        buf.append(ch)
        i += 1
    if not in_string and start is not None:
        return "".join(buf), i
    return None


def hstore_get_value(hstore: str, key: str):
    """Port of OGRHStoreGetValue (swq_op_general.cpp:291): returns the
    value for ``key`` or None on missing key / syntax error."""
    pos = 0
    n = len(hstore)
    while pos < n:
        k = _hstore_next_string(hstore, pos, True)
        if k is None or k[1] >= n and False:
            return None
        ktok, pos2 = k
        if pos2 >= n:
            return None          # key with no value
        v = _hstore_next_string(hstore, pos2, False)
        if v is None:
            return None
        vtok, pos = v
        if ktok == key:
            return vtok
    return None


# --------------------------------------------------------------- cast

def _eval_cast(node: Cast, cols, n):
    arr = eval_expr(node.arg, cols, n)
    src = node.arg.rtype
    tgt = node.rtype
    if tgt in ("integer", "integer64"):
        if src in _NUMERIC:
            out = pc.cast(pc.trunc(_as_float(arr)), pa.int64(), safe=False) \
                if src == "float" else pc.cast(arr, pa.int64())
        else:
            out = _atoi_like(arr, "integer")
        return out
    if tgt == "float":
        if src in _NUMERIC:
            return _as_float(arr)
        return _atoi_like(arr, "float")
    if tgt in ("timestamp", "date", "time"):
        if src in _TEMPORAL:
            return pc.cast(arr, pa.timestamp("us"))
        vals = [parse_ogr_datetime(v) for v in
                pc.cast(arr, pa.string()).to_pylist()]
        return pa.array(
            np.array([np.datetime64("NaT", "us") if v is None else v
                      for v in vals], dtype="datetime64[us]"),
            from_pandas=True)
    if tgt == "geometry":
        if src == "geometry":
            return arr
        from ..io.wkt import wkt_to_wkb      # lazy: avoids import cycle
        vals = pc.cast(arr, pa.string()).to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
            else:
                try:
                    out.append(wkt_to_wkb(v))
                except Exception:
                    out.append(None)
        return pa.array(out, type=pa.binary())
    if tgt == "boolean":
        if src in _NUMERIC:
            return pc.not_equal(_as_float(arr), 0.0)
        raise OGRSQLError("cannot cast string to boolean")
    # string target
    if src == "float":
        out = _format_g15(arr)
    elif src in ("integer", "integer64", "boolean"):
        out = pc.cast(pc.cast(arr, pa.int64()), pa.string())
    elif src == "geometry":
        from ..io.wkt import wkb_to_wkt
        vals = arr.to_pylist()
        out = pa.array([None if v is None else wkb_to_wkt(v)
                        for v in vals], type=pa.string())
    else:
        out = pc.cast(arr, pa.string())
    if node.width and node.width > 0:
        out = pc.utf8_slice_codeunits(out, 0, node.width)
    return out


def truth_mask(arr: pa.Array) -> pa.Array:
    """WHERE-clause truth: TRUE only (NULL is not a match)."""
    b = pc.cast(arr, pa.bool_())
    return pc.and_kleene(pc.is_valid(b), pc.fill_null(b, False))
