"""ODS (OpenDocument spreadsheet) vector reader, from scratch on
stdlib ``zipfile`` + ``xml.etree``.

Reference driver: ``ogr/ogrsf_frmts/ods/ogrodsdatasource.cpp`` —
semantics reproduced: ``content.xml`` table:table elements,
``table:number-rows-repeated`` / ``number-columns-repeated``
expansion, ``office:value-type`` typing (float/currency → Integer or
Real by value, percentage → Real, date → Date when ``YYYY-MM-DD``
else DateTime, time → Time from ``PTxxHxxMxxS``, boolean), formula
cells (``of:=TRUE()``/``FALSE()`` → bool), text:p fallback values,
the same first-line header detection as XLSX, and the same
column-type promotion ladder (``GetOGRFieldType``,
``ogrodsdatasource.cpp:587-631``).

Validated against ``autotest/ogr/ogr_ods.py`` ogr_ods_check
(8 layers, Feuille1 26 features, Feuille7's 12-field type matrix and
first-feature values).
"""

from __future__ import annotations

import datetime as _dt
import re
import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

from .xlsx import _ARROW

__all__ = ["read_ods", "ods_sheet_names"]

_T = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_X = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_MAX_REPEAT = 10000


def _cell_kind(vtype, value):
    """office:value-type + raw value → merge-channel kind."""
    if vtype in ("float", "currency"):
        s = str(value)
        if re.fullmatch(r"[+-]?\d+", s):
            return "integer" if -2**31 <= int(s) < 2**31 \
                else "integer64"
        return "real"
    if vtype == "percentage":
        return "real"
    if vtype == "date":
        return "date" if len(str(value)) == 10 else "datetime"
    if vtype == "time":
        return "time"
    if vtype in ("boolean", "bool"):
        return "bool"
    return "string"


def _parse_time(v):
    m = re.fullmatch(
        r"PT(\d+)H(\d+)M(\d+(?:\.\d+)?)S", str(v))
    if not m:
        return None
    sec = float(m.group(3))
    return _dt.time(int(m.group(1)) % 24, int(m.group(2)),
                    int(sec), int(round((sec % 1) * 1e6)))


def _convert(kind, vtype, value):
    if value is None or value == "":
        return None
    try:
        if kind == "string":
            return str(value)
        if kind in ("integer", "integer64"):
            return int(float(value))
        if kind == "real":
            return float(value)
        if kind == "bool":
            return str(value).lower() in ("1", "true")
        if kind == "date":
            return _dt.date.fromisoformat(str(value)[:10])
        if kind == "datetime":
            if vtype == "date":
                s = str(value)
                return _dt.datetime.fromisoformat(
                    s if "T" in s else s + "T00:00:00")
            return None
        if kind == "time":
            return _parse_time(value)
    except (ValueError, OverflowError):
        return None
    return str(value)


def _merge(cur, k):
    if cur is None:
        return k
    if cur == k:
        return cur
    if cur == "string" or k == "string":
        return "string"
    if {cur, k} <= {"integer", "integer64"}:
        return "integer64"
    if {cur, k} <= {"integer", "integer64", "real", "bool"}:
        return "real" if "real" in (cur, k) else cur
    if {cur, k} <= {"date", "time", "datetime"}:
        return "datetime"
    return "string"


def ods_sheet_names(path):
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("content.xml"))
    return [t.get(_T + "name") for t in root.iter(_T + "table")]


def _rows_of(table):
    rows = []
    for row in table.iter(_T + "table-row"):
        nrep = min(int(row.get(_T + "number-rows-repeated", "1")),
                   _MAX_REPEAT)
        cells = []
        for c in list(row):
            if c.tag == _T + "covered-table-cell":
                cells.append(("", None))
                continue
            if c.tag != _T + "table-cell":
                continue
            vtype = c.get(_O + "value-type", "")
            value = c.get(_O + "value")
            if value is None:
                value = c.get(_O + "date-value")
            if value is None:
                value = c.get(_O + "time-value")
            formula = c.get(_T + "formula")
            if formula and formula.startswith("of:="):
                if formula == "of:=TRUE()":
                    vtype, value = "bool", "1"
                elif formula == "of:=FALSE()":
                    vtype, value = "bool", "0"
            if value is None:
                # concatenated text:p content (fallback)
                ps = c.findall(_X + "p")
                if ps:
                    value = "\n".join(
                        "".join(p.itertext()) for p in ps)
                    if not vtype:
                        vtype = "string"
            crep = min(int(c.get(
                _T + "number-columns-repeated", "1")), _MAX_REPEAT)
            for _ in range(crep):
                cells.append((vtype if value is not None else "",
                              value))
        # drop trailing empty cells of the row (repeat-to-max cols)
        while cells and (cells[-1][1] is None or
                         cells[-1][1] == ""):
            cells.pop()
        for _ in range(nrep):
            rows.append(list(cells))
    while rows and not rows[-1]:
        rows.pop()
    return rows


def _sheet_table(rows, headers):
    if not rows:
        return pa.table({})
    first_all_string = len(rows[0]) > 0 and all(
        t == "string" for t, _v in rows[0])
    use_headers = False
    if headers == "FORCE":
        use_headers = True
    elif headers == "DISABLE":
        use_headers = False
    elif first_all_string and len(rows) > 1:
        cur = rows[1]
        n_text = sum(1 for t, _v in cur if t == "string")
        n_nonempty = sum(1 for t, _v in cur
                         if t not in ("", "string"))
        if len(rows[0]) >= len(cur) and n_text != len(rows[0]) \
                and n_nonempty != 0:
            use_headers = True
    if use_headers:
        names = [str(v) if v not in (None, "") else f"Field{i + 1}"
                 for i, (_t, v) in enumerate(rows[0])]
        rows = rows[1:]
    else:
        names = None
    ncols = max((len(r) for r in rows), default=0)
    if names is not None:
        ncols = max(ncols, len(names))
    if names is None:
        names = [f"Field{i + 1}" for i in range(ncols)]
    while len(names) < ncols:
        names.append(f"Field{len(names) + 1}")
    kinds = [None] * ncols
    for r in rows:
        for i in range(min(ncols, len(r))):
            t, v = r[i]
            if t == "" or v is None or v == "":
                continue
            kinds[i] = _merge(kinds[i], _cell_kind(t, v))
    kinds = ["string" if k is None else k for k in kinds]
    cols = {}
    for i in range(ncols):
        vals = []
        for r in rows:
            t, v = r[i] if i < len(r) else ("", None)
            vals.append(_convert(kinds[i], t, v))
        cols[names[i]] = pa.array(vals, type=_ARROW[kinds[i]])
    return pa.Table.from_pydict(cols)


def read_ods(path, sheet=None, headers=None):
    """ODS → ``{sheet_name: pyarrow.Table}`` (or one table when
    ``sheet`` is given).  ``headers``: None (auto) | 'FORCE' |
    'DISABLE', matching OGR_ODS_HEADERS."""
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("content.xml"))
    out = {}
    for table in root.iter(_T + "table"):
        name = table.get(_T + "name")
        if sheet is not None and name != sheet:
            continue
        t = _sheet_table(_rows_of(table), headers)
        if sheet is None and t.num_columns == 0:
            continue
        out[name] = t
    if sheet is not None:
        if sheet not in out:
            raise KeyError(f"sheet {sheet!r} not found in {path}")
        return out[sheet]
    return out
