"""OGR SQL dialect — lexer, AST and recursive-descent parser.

Re-implements, from its published grammar and test suite, the SELECT
surface of the reference's OGR SQL dialect (``ogr/swq_parser.cpp``
grammar, ``ogr/swq.cpp`` preparse, ``autotest/ogr/ogr_sql_test.py`` +
``ogr_sql_rfc28.py`` behavior):

* ``SELECT [DISTINCT] cols FROM table [alias] [[LEFT] JOIN t2 ON ...]*
  [WHERE expr] [ORDER BY f [ASC|DESC], ...] [LIMIT n] [OFFSET n]
  [UNION ALL SELECT ...]``
* column forms: expression [``AS``] alias, ``*``, ``table.*``,
  ``* EXCEPT (f, ...)`` / ``* EXCLUDE (f, ...)``, ``OGR_STYLE HIDDEN``
* operators: OR AND NOT, ``= <> != < <= =< > >= =>``, LIKE/ILIKE
  [ESCAPE], IN, BETWEEN, IS [NOT] NULL, ``+ - * / %``, CONCAT, SUBSTR,
  HSTORE_GET_VALUE, CAST(x AS type[(w[,p])]), aggregates MIN MAX AVG
  SUM COUNT STDDEV_POP STDDEV_SAMP (plain-column argument only, plus
  COUNT(*) and COUNT(DISTINCT col)).

Quoting is strict, as in the reference (``swq.cpp`` tokenizer): single
quotes make string LITERALS (never identifiers), double quotes make
identifiers; ``''`` escapes a quote inside a string, no backslash
escapes.  Expression depth is capped at 127 nodes with the reference's
"Maximum expression depth reached" error (``swq_parser`` via
``swq_expr_node::nMaxDepth``); ``IS NOT NULL`` counts as two nodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

__all__ = ["OGRSQLError", "parse_select", "tokenize"]

MAX_EXPR_DEPTH = 127

AGG_FUNCS = {"MIN", "MAX", "AVG", "SUM", "COUNT", "STDDEV_POP",
             "STDDEV_SAMP"}
SCALAR_FUNCS = {"CONCAT", "SUBSTR", "HSTORE_GET_VALUE"}

_KEYWORDS = {
    "SELECT", "FROM", "WHERE", "ORDER", "BY", "ASC", "DESC", "LIMIT",
    "OFFSET", "UNION", "ALL", "DISTINCT", "AS", "AND", "OR", "NOT",
    "LIKE", "ILIKE", "ESCAPE", "IN", "BETWEEN", "IS", "NULL", "CAST",
    "JOIN", "LEFT", "ON",
}
# HIDDEN / EXCEPT / EXCLUDE are contextual (usable as identifiers, like
# the reference grammar allows — autotest test_ogr_sql_identifier_hidden)


class OGRSQLError(ValueError):
    """Raised for any statement the OGR SQL dialect rejects."""


# ---------------------------------------------------------------- lexer

@dataclass
class Tok:
    kind: str          # 'ident' | 'qident' | 'str' | 'int' | 'float' | 'op'
    text: str
    value: object = None


_OPS2 = ("<>", "<=", ">=", "!=", "=<", "=>")
_OPS1 = "=<>+-*/%(),."


def tokenize(sql: str) -> list[Tok]:
    out: list[Tok] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "'" or c == '"':
            q = c
            i += 1
            buf = []
            while True:
                if i >= n:
                    raise OGRSQLError("unterminated quoted token")
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:   # '' / "" escape
                        buf.append(q)
                        i += 2
                        continue
                    i += 1
                    break
                buf.append(sql[i])
                i += 1
            out.append(Tok("str" if q == "'" else "qident", "".join(buf),
                           "".join(buf)))
            continue
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            isf = False
            while j < n and (sql[j].isdigit() or sql[j] in ".eE" or
                             (sql[j] in "+-" and j > i and
                              sql[j - 1] in "eE")):
                if sql[j] in ".eE":
                    isf = True
                j += 1
            text = sql[i:j]
            i = j
            if isf:
                out.append(Tok("float", text, float(text)))
            else:
                out.append(Tok("int", text, int(text)))
            continue
        if sql[i:i + 2] in _OPS2:
            out.append(Tok("op", sql[i:i + 2]))
            i += 2
            continue
        if c in _OPS1:
            out.append(Tok("op", c))
            i += 1
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            out.append(Tok("ident", sql[i:j]))
            i = j
            continue
        raise OGRSQLError(f"unexpected character {c!r} in SQL statement")
    return out


# ----------------------------------------------------------------- AST

@dataclass
class Lit:
    value: object              # int | float | str | None
    type: str                  # 'integer'|'integer64'|'float'|'string'|'null'
    rtype: str = ""


@dataclass
class Col:
    table: str                 # '' when unqualified
    name: str
    rtype: str = ""
    bound: object = None       # filled by the binder


@dataclass
class Op:
    name: str                  # registry spelling (upper)
    args: list
    negated: bool = False      # for IN / BETWEEN / LIKE / ILIKE / IS NULL
    escape: Optional[str] = None     # LIKE ... ESCAPE 'x'
    rtype: str = ""


@dataclass
class Cast:
    arg: object
    typename: str              # lower-case target
    width: int = 0
    precision: int = 0
    rtype: str = ""


@dataclass
class Agg:
    func: str                  # MIN/MAX/AVG/SUM/COUNT/STDDEV_POP/STDDEV_SAMP
    func_as_typed: str         # spelling used in the statement
    col: Optional[Col]         # None for COUNT(*)
    distinct: bool = False
    rtype: str = ""


@dataclass
class SelectCol:
    expr: object = None        # Lit|Col|Op|Cast|Agg, or None for wildcards
    alias: Optional[str] = None
    hidden: bool = False
    distinct: bool = False
    wildcard_table: Optional[str] = None   # '' for bare *, name for t.*
    except_fields: list = field(default_factory=list)  # (table, name)


@dataclass
class TableRef:
    name: str
    alias: str


@dataclass
class JoinDef:
    table: TableRef
    cond: object               # ON expression


@dataclass
class OrderDef:
    table: str
    name: str
    ascending: bool = True


@dataclass
class Select:
    columns: list
    tables: list               # [TableRef] — index 0 is the primary
    joins: list
    where: object = None
    order: list = field(default_factory=list)
    limit: Optional[int] = None
    offset: Optional[int] = None
    union_all: Optional["Select"] = None


# --------------------------------------------------------------- parser

class _P:
    def __init__(self, toks: list[Tok]):
        self.t = toks
        self.i = 0

    def peek(self, ahead: int = 0) -> Optional[Tok]:
        j = self.i + ahead
        return self.t[j] if j < len(self.t) else None

    def next(self) -> Tok:
        if self.i >= len(self.t):
            raise OGRSQLError("unexpected end of SQL statement")
        tok = self.t[self.i]
        self.i += 1
        return tok

    def at_kw(self, *kws: str) -> bool:
        tok = self.peek()
        return (tok is not None and tok.kind == "ident"
                and tok.text.upper() in kws)

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise OGRSQLError(f"expected {kw}")
        self.next()

    def at_op(self, *ops: str) -> bool:
        tok = self.peek()
        return tok is not None and tok.kind == "op" and tok.text in ops

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            got = self.peek().text if self.peek() else "end of statement"
            raise OGRSQLError(f"expected {op!r}, got {got!r}")
        self.next()

    # identifiers: bare or double-quoted; NEVER single-quoted (strict
    # quoting, swq.cpp tokenizer / ogr_sql_test strict_quoting cases)
    def ident(self, what: str = "identifier") -> str:
        tok = self.peek()
        if tok is None:
            raise OGRSQLError(f"expected {what}")
        if tok.kind == "ident":
            if tok.text.upper() in _KEYWORDS and tok.text.upper() not in (
                    "LEFT",):
                raise OGRSQLError(
                    f"expected {what}, got keyword {tok.text}")
            self.next()
            return tok.text
        if tok.kind == "qident":
            self.next()
            return tok.text
        raise OGRSQLError(f"expected {what}, got {tok.text!r}")


def _depth(node) -> int:
    if isinstance(node, (Lit, Col)):
        return 1
    if isinstance(node, Cast):
        return 1 + _depth(node.arg)
    if isinstance(node, Agg):
        return 2
    if isinstance(node, Op):
        d = 1 + max((_depth(a) for a in node.args), default=0)
        # IS NOT NULL / NOT IN / NOT LIKE / NOT BETWEEN wrap in a NOT
        # node in the reference grammar
        if node.negated:
            d += 1
        return d
    return 1


def _check_depth(node) -> None:
    if _depth(node) > MAX_EXPR_DEPTH:
        raise OGRSQLError("Maximum expression depth reached")


class _ExprParser:
    """Precedence-climbing expression parser (mirrors the swq grammar:
    OR < AND < NOT < predicate < additive < multiplicative < unary)."""

    def __init__(self, p: _P):
        self.p = p

    def parse(self):
        node = self.or_expr()
        _check_depth(node)
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.p.at_kw("OR"):
            self.p.next()
            node = Op("OR", [node, self.and_expr()])
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.p.at_kw("AND"):
            self.p.next()
            node = Op("AND", [node, self.not_expr()])
        return node

    def not_expr(self):
        if self.p.at_kw("NOT"):
            self.p.next()
            return Op("NOT", [self.not_expr()])
        return self.predicate()

    def predicate(self):
        node = self.additive()
        negate = False
        if self.p.at_kw("NOT"):
            nxt = self.p.peek(1)
            if nxt is not None and nxt.kind == "ident" and \
                    nxt.text.upper() in ("LIKE", "ILIKE", "IN", "BETWEEN"):
                self.p.next()
                negate = True
            else:
                raise OGRSQLError("misplaced NOT")
        if self.p.at_kw("LIKE", "ILIKE"):
            opname = self.p.next().text.upper()
            pat = self.additive()
            esc = None
            if self.p.at_kw("ESCAPE"):
                self.p.next()
                etok = self.p.next()
                if etok.kind != "str" or len(etok.value) != 1:
                    raise OGRSQLError("ESCAPE requires a 1-char string")
                esc = etok.value
            return Op(opname, [node, pat], negated=negate, escape=esc)
        if self.p.at_kw("IN"):
            self.p.next()
            self.p.eat_op("(")
            items = [self.or_expr()]
            while self.p.at_op(","):
                self.p.next()
                items.append(self.or_expr())
            self.p.eat_op(")")
            return Op("IN", [node] + items, negated=negate)
        if self.p.at_kw("BETWEEN"):
            self.p.next()
            lo = self.additive()
            self.p.eat_kw("AND")
            hi = self.additive()
            return Op("BETWEEN", [node, lo, hi], negated=negate)
        if self.p.at_kw("IS"):
            self.p.next()
            neg = False
            if self.p.at_kw("NOT"):
                self.p.next()
                neg = True
            if not self.p.at_kw("NULL"):
                raise OGRSQLError("expected NULL after IS")
            self.p.next()
            return Op("IS NULL", [node], negated=neg)
        # left-associative comparison chaining (the reference grammar
        # accepts "1 = 1 = 1" — see max_expr_depth's operator list)
        while self.p.at_op("=", "<>", "!=", "<", "<=", ">", ">=",
                           "=<", "=>"):
            op = self.p.next().text
            op = {"!=": "<>", "=<": "<=", "=>": ">="}.get(op, op)
            rhs = self.additive()
            node = Op(op, [node, rhs])
        return node

    def additive(self):
        node = self.multiplicative()
        while self.p.at_op("+", "-"):
            op = self.p.next().text
            node = Op(op, [node, self.multiplicative()])
        return node

    def multiplicative(self):
        node = self.unary()
        while self.p.at_op("*", "/", "%"):
            op = self.p.next().text
            node = Op(op, [node, self.unary()])
        return node

    def unary(self):
        if self.p.at_op("-"):
            self.p.next()
            arg = self.unary()
            if isinstance(arg, Lit) and arg.type in (
                    "integer", "integer64", "float"):
                return Lit(-arg.value, arg.type)
            return Op("*", [Lit(-1, "integer"), arg])
        return self.primary()

    def primary(self):
        tok = self.p.peek()
        if tok is None:
            raise OGRSQLError("unexpected end of expression")
        if tok.kind == "str":
            self.p.next()
            return Lit(tok.value, "string")
        if tok.kind == "int":
            self.p.next()
            t = "integer" if -2**31 <= tok.value < 2**31 else "integer64"
            return Lit(tok.value, t)
        if tok.kind == "float":
            self.p.next()
            return Lit(tok.value, "float")
        if tok.kind == "op" and tok.text == "(":
            self.p.next()
            node = self.or_expr()
            self.p.eat_op(")")
            return node
        if tok.kind == "ident" and tok.text.upper() == "NULL":
            self.p.next()
            return Lit(None, "null")
        if tok.kind == "ident" and tok.text.upper() == "CAST":
            return self.cast()
        up = tok.text.upper() if tok.kind == "ident" else None
        nxt = self.p.peek(1)
        is_call = (nxt is not None and nxt.kind == "op" and nxt.text == "(")
        if up in AGG_FUNCS and is_call:
            return self.aggregate()
        if (up in SCALAR_FUNCS) and is_call:
            fname = self.p.next().text.upper()
            self.p.eat_op("(")
            args = [self.or_expr()]
            while self.p.at_op(","):
                self.p.next()
                args.append(self.or_expr())
            self.p.eat_op(")")
            if fname == "CONCAT" and len(args) < 2:
                raise OGRSQLError("CONCAT requires at least 2 arguments")
            return Op(fname, args)
        if tok.kind in ("ident", "qident"):
            if is_call:
                raise OGRSQLError(
                    f"Undefined function '{tok.text}' used.")
            name = self.p.ident("field name")
            if self.p.at_op(".") :
                self.p.next()
                fname = self.p.ident("field name")
                return Col(name, fname)
            return Col("", name)
        raise OGRSQLError(f"unexpected token {tok.text!r} in expression")

    def cast(self):
        self.p.next()                      # CAST
        self.p.eat_op("(")
        arg = self.or_expr()
        self.p.eat_kw("AS")
        tname = self.p.ident("type name").lower()
        # two-word types: "character varying" not in OGR; NUMERIC(w,p) /
        # CHARACTER(n) take parens
        width = prec = 0
        if self.p.at_op("("):
            self.p.next()
            wtok = self.p.next()
            if wtok.kind != "int":
                raise OGRSQLError("expected integer CAST width")
            width = wtok.value
            if self.p.at_op(","):
                self.p.next()
                ptok = self.p.next()
                if ptok.kind != "int":
                    raise OGRSQLError("expected integer CAST precision")
                prec = ptok.value
            self.p.eat_op(")")
        self.p.eat_op(")")
        if tname not in ("boolean", "character", "integer", "bigint",
                         "smallint", "float", "real", "numeric",
                         "timestamp", "date", "time", "geometry"):
            raise OGRSQLError(
                f"Unrecognized typename {tname} in CAST operator.")
        return Cast(arg, tname, width, prec)

    def aggregate(self):
        ftok = self.p.next()
        fname = ftok.text.upper()
        self.p.eat_op("(")
        distinct = False
        if self.p.at_kw("DISTINCT"):
            self.p.next()
            distinct = True
        col: Optional[Col] = None
        if self.p.at_op("*"):
            self.p.next()
            if fname != "COUNT" or distinct:
                raise OGRSQLError(f"{fname}(*) is not supported")
        else:
            tok = self.p.peek()
            if tok is None or tok.kind not in ("ident", "qident"):
                raise OGRSQLError(
                    f"argument of {fname}() must be a field name")
            name = self.p.ident("field name")
            if self.p.at_op("."):
                self.p.next()
                col = Col(name, self.p.ident("field name"))
            else:
                col = Col("", name)
            if distinct and fname != "COUNT":
                raise OGRSQLError(
                    "DISTINCT is only supported in COUNT()")
        if self.p.at_op(","):
            raise OGRSQLError(f"{fname}() takes a single argument")
        self.p.eat_op(")")
        return Agg(fname, ftok.text, col, distinct)


def _parse_select_body(p: _P) -> Select:
    p.eat_kw("SELECT")
    ep = _ExprParser(p)
    cols: list[SelectCol] = []
    while True:
        sc = SelectCol()
        if p.at_kw("DISTINCT"):
            p.next()
            sc.distinct = True
        tok = p.peek()
        if tok is None:
            raise OGRSQLError("expected select column")
        if tok.kind == "op" and tok.text == "*":
            p.next()
            sc.wildcard_table = ""
            if p.at_kw("EXCEPT", "EXCLUDE"):
                p.next()
                p.eat_op("(")
                while True:
                    nm = p.ident("field name")
                    if p.at_op("."):
                        p.next()
                        sc.except_fields.append((nm, p.ident("field name")))
                    else:
                        sc.except_fields.append(("", nm))
                    if p.at_op(","):
                        p.next()
                        continue
                    break
                p.eat_op(")")
                if not sc.except_fields:
                    raise OGRSQLError("empty EXCEPT list")
        elif (tok.kind in ("ident", "qident")
              and p.peek(1) is not None and p.peek(1).kind == "op"
              and p.peek(1).text == "."
              and p.peek(2) is not None and p.peek(2).kind == "op"
              and p.peek(2).text == "*"):
            sc.wildcard_table = p.ident("table name")
            p.next()       # .
            p.next()       # *
        else:
            sc.expr = ep.parse()
            # alias: AS ident | bare ident (not a keyword)
            if p.at_kw("AS"):
                p.next()
                sc.alias = p.ident("alias")
            else:
                atok = p.peek()
                if atok is not None and atok.kind in ("ident", "qident") \
                        and not (atok.kind == "ident"
                                 and atok.text.upper() in _KEYWORDS):
                    sc.alias = p.ident("alias")
            # HIDDEN is contextual: it is the hidden-column marker only
            # when an alias (or bare-alias) was already consumed —
            # otherwise "SELECT hidden FROM t" keeps working
            if sc.alias is not None and p.at_kw("HIDDEN"):
                p.next()
                sc.hidden = True
                if sc.alias.upper() != "OGR_STYLE":
                    raise OGRSQLError("HIDDEN keyword only supported on a "
                                      "column named OGR_STYLE")
        cols.append(sc)
        if p.at_op(","):
            p.next()
            continue
        break
    if not cols:
        raise OGRSQLError("no columns in SELECT")

    p.eat_kw("FROM")
    tables: list[TableRef] = []
    joins: list[JoinDef] = []

    def table_ref() -> TableRef:
        nm = p.ident("table name")
        alias = nm
        if p.at_kw("AS"):
            p.next()
            alias = p.ident("table alias")
        else:
            atok = p.peek()
            if atok is not None and atok.kind in ("ident", "qident") and \
                    not (atok.kind == "ident"
                         and atok.text.upper() in _KEYWORDS):
                alias = p.ident("table alias")
        return TableRef(nm, alias)

    tables.append(table_ref())
    while p.at_kw("JOIN", "LEFT"):
        if p.at_kw("LEFT"):
            p.next()
        p.eat_kw("JOIN")
        tr = table_ref()
        p.eat_kw("ON")
        cond = ep.parse()
        tables.append(tr)
        joins.append(JoinDef(tr, cond))

    where = None
    if p.at_kw("WHERE"):
        p.next()
        where = ep.parse()

    order: list[OrderDef] = []
    if p.at_kw("ORDER"):
        p.next()
        p.eat_kw("BY")
        while True:
            nm = p.ident("field name")
            tn = ""
            if p.at_op("."):
                p.next()
                tn, nm = nm, p.ident("field name")
            od = OrderDef(tn, nm)
            if p.at_kw("ASC"):
                p.next()
            elif p.at_kw("DESC"):
                p.next()
                od.ascending = False
            order.append(od)
            if p.at_op(","):
                p.next()
                continue
            break

    limit = offset = None
    if p.at_kw("LIMIT"):
        p.next()
        tok = p.next()
        if tok.kind != "int":
            raise OGRSQLError("expected integer after LIMIT")
        limit = tok.value
    if p.at_kw("OFFSET"):
        p.next()
        tok = p.next()
        if tok.kind != "int":
            raise OGRSQLError("expected integer after OFFSET")
        offset = tok.value

    sel = Select(cols, tables, joins, where, order, limit, offset)
    if p.at_kw("UNION"):
        p.next()
        p.eat_kw("ALL")
        sel.union_all = _parse_select_body(p)
    return sel


def parse_select(sql: str) -> Select:
    """Parse an OGR SQL SELECT statement to an AST, raising
    :class:`OGRSQLError` on anything the dialect rejects."""
    if sql is None or not str(sql).strip():
        raise OGRSQLError("empty SQL statement")
    p = _P(tokenize(str(sql)))
    sel = _parse_select_body(p)
    if p.peek() is not None:
        raise OGRSQLError(
            f"unexpected token {p.peek().text!r} after statement")
    # DISTINCT column-mode constraints (swq_select::preparse: the
    # DISTINCT keyword applies to a single selected field)
    n_distinct = sum(1 for c in sel.columns if c.distinct)
    if n_distinct:
        if len(sel.columns) != 1:
            raise OGRSQLError(
                "SELECT DISTINCT applies to a single field only")
        c = sel.columns[0]
        if c.wildcard_table is not None:
            raise OGRSQLError("SELECT DISTINCT * is not supported")
        if isinstance(c.expr, Agg):
            raise OGRSQLError(
                "SELECT DISTINCT with an aggregate is not supported")
        if not isinstance(c.expr, Col):
            raise OGRSQLError("SELECT DISTINCT requires a field name")
    return sel
