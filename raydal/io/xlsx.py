"""XLSX (Office Open XML spreadsheet) vector reader, from scratch on
stdlib ``zipfile`` + ``xml.etree``.

Reference driver: ``ogr/ogrsf_frmts/xlsx/ogrxlsxdatasource.cpp`` —
semantics reproduced:

* sheets from ``xl/workbook.xml`` in order, resolved through the
  workbook rels;
* cell values: ``t="s"`` shared-string lookup, ``t="inlineStr"``,
  ``t="b"`` boolean, ``t="str"`` formula string, numeric otherwise;
* styles: ``cellXfs`` numFmtId → Date (14-17), Time (18-21),
  DateTime (22); custom formats ≥164 classified by DD/YY vs HH
  substrings with ``SS.000`` millisecond detection
  (``ogrxlsxdatasource.cpp:1735-1800``);
* date serials: days since 1899-12-30
  (``NUMBER_OF_DAYS_BETWEEN_1900_AND_1970 = 25569``);
* header detection (``DetectHeaderLine``): first line all-string,
  second line not all-string-or-empty (OGR_XLSX_HEADERS
  FORCE/DISABLE overrides);
* per-column type promotion across rows: Integer→Integer64→Real,
  Date/Time + DateTime → DateTime, anything else → String
  (``:1135-1185``).

Validated against ``autotest/ogr/ogr_xlsx.py`` ogr_xlsx_check
(8 layers, Feuille1 26 features, Feuille7's 12-field type matrix and
first-feature values).
"""

from __future__ import annotations

import datetime as _dt
import os
import re
import xml.etree.ElementTree as ET
import zipfile

import numpy as np
import pyarrow as pa

__all__ = ["read_xlsx", "xlsx_sheet_names"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships}")
_PKG_REL = ("{http://schemas.openxmlformats.org/package/2006/"
            "relationships}")
_EPOCH = _dt.datetime(1899, 12, 30)


def _col_index(ref):
    """'AB12' → 0-based column index 27."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _styles(z):
    """styles.xml → list of cellXfs types: 'float' | 'date' | 'time'
    | 'datetime' | 'datetime_ms'."""
    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return []
    custom = {}
    for nf in root.iter(_NS + "numFmt"):
        code = nf.get("formatCode", "")
        fid = int(nf.get("numFmtId", "-1"))
        if fid >= 164 and code:
            has_date = any(s in code for s in ("DD", "dd", "YY", "yy"))
            has_time = "HH" in code or "hh" in code
            if has_date and has_time:
                custom[fid] = "datetime_ms" if ("SS.000" in code or
                                                "ss.000" in code) \
                    else "datetime"
            elif has_date:
                custom[fid] = "date"
            elif has_time:
                custom[fid] = "time"
            else:
                custom[fid] = "float"
    styles = []
    cellxfs = root.find(_NS + "cellXfs")
    if cellxfs is not None:
        for xf in cellxfs.findall(_NS + "xf"):
            fid = int(xf.get("numFmtId", "-1"))
            t = "float"
            if 0 <= fid < 164:
                if 14 <= fid <= 17:
                    t = "date"
                elif 18 <= fid <= 21:
                    t = "time"
                elif fid == 22:
                    t = "datetime"
            elif fid >= 164:
                t = custom.get(fid, "float")
            styles.append(t)
    return styles


def _shared_strings(z):
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(_NS + "si"):
        out.append("".join(t.text or "" for t in si.iter(_NS + "t")))
    return out


def xlsx_sheet_names(path):
    with zipfile.ZipFile(path) as z:
        return [name for name, _t in _sheet_targets(z)]


def _sheet_targets(z):
    rels = {}
    try:
        rroot = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot.findall(_PKG_REL + "Relationship"):
            tgt = rel.get("Target")
            if tgt.startswith("/"):
                tgt = tgt[1:]
            elif not tgt.startswith("xl/"):
                tgt = "xl/" + tgt
            rels[rel.get("Id")] = tgt
    except KeyError:
        pass
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    out = []
    for sheet in wb.iter(_NS + "sheet"):
        rid = sheet.get(_NSR + "id")
        target = rels.get(rid)
        if target is None:
            target = f"xl/worksheets/sheet{sheet.get('sheetId')}.xml"
        if target in z.namelist():
            out.append((sheet.get("name"), target))
    return out


def _cell_type_for_row(rows_types, rows_values, ncols):
    """Column types via the reference's promotion ladder."""
    kinds = [None] * ncols
    for types, values in zip(rows_types, rows_values):
        for i in range(ncols):
            t = types[i] if i < len(types) else ""
            v = values[i] if i < len(values) else None
            if t == "" or v is None:
                continue
            k = t
            if t == "float":
                # GetOGRFieldType: CPLGetValueType on the raw text
                s = str(v)
                if re.fullmatch(r"[+-]?\d+", s):
                    k = "integer" if -2**31 <= int(s) < 2**31 \
                        else "integer64"
                elif re.fullmatch(
                        r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s):
                    k = "real"
                else:
                    k = "string"
            elif t in ("datetime", "datetime_ms"):
                k = "datetime"
            cur = kinds[i]
            if cur is None:
                kinds[i] = k
            elif cur == k:
                pass
            elif cur == "string" or k == "string":
                kinds[i] = "string"
            elif {cur, k} <= {"integer", "integer64"}:
                kinds[i] = "integer64"
            elif {cur, k} <= {"integer", "integer64", "real",
                              "bool"}:
                kinds[i] = "real" if "real" in (cur, k) else cur
            elif {cur, k} <= {"date", "time", "datetime"}:
                kinds[i] = "datetime" if "datetime" in (cur, k) or \
                    {cur, k} == {"date", "time"} else cur
            else:
                kinds[i] = "string"
    return ["string" if k is None else k for k in kinds]


def _serial_to_dt(v):
    return _EPOCH + _dt.timedelta(days=float(v))


def _convert_column(kind, types, values):
    out = []
    for t, v in zip(types, values):
        if t == "" or v is None or (t != "string" and str(v) == ""):
            out.append(None)
            continue
        try:
            if kind == "string":
                if t == "date":
                    out.append(_serial_to_dt(v).strftime("%Y/%m/%d"))
                elif t in ("datetime", "datetime_ms"):
                    out.append(_serial_to_dt(v).strftime(
                        "%Y/%m/%d %H:%M:%S"))
                elif t == "time":
                    secs = round(float(v) * 86400)
                    out.append(str(_dt.timedelta(seconds=secs)))
                else:
                    out.append(str(v))
            elif kind in ("integer", "integer64"):
                out.append(int(float(v)))
            elif kind == "real":
                out.append(float(v))
            elif kind == "bool":
                out.append(bool(int(v)))
            elif kind == "date":
                out.append(_serial_to_dt(v).date())
            elif kind == "time":
                secs = round(float(v) * 86400 * 1e6)
                out.append(_dt.time(
                    int(secs // 3.6e9) % 24,
                    int(secs // 6e7) % 60,
                    int(secs // 1e6) % 60,
                    int(secs % 1e6)))
            elif kind == "datetime":
                out.append(_serial_to_dt(v))
            else:
                out.append(str(v))
        except (ValueError, OverflowError):
            out.append(None)
    return out


_ARROW = {"string": pa.string(), "integer": pa.int32(),
          "integer64": pa.int64(), "real": pa.float64(),
          "bool": pa.bool_(), "date": pa.date32(),
          "time": pa.time64("us"), "datetime": pa.timestamp("ms")}


def _read_sheet(z, target, styles, strings, headers):
    root = ET.fromstring(z.read(target))
    rows_types, rows_values = [], []
    for row in root.iter(_NS + "row"):
        # row-number gaps materialize as empty features, like the
        # reference's padding loop (ogrxlsxdatasource.cpp:833-856)
        r_attr = row.get("r")
        if r_attr is not None:
            target_line = int(r_attr) - 1
            while len(rows_values) < min(target_line,
                                         len(rows_values) + 10000):
                rows_values.append([])
                rows_types.append([])
        types, values = [], []
        for c in row.findall(_NS + "c"):
            ref = c.get("r")
            if ref is not None:
                ci = _col_index(ref)
                while len(values) < ci:
                    values.append(None)
                    types.append("")
            t = "float"
            s = c.get("s")
            if s is not None and 0 <= int(s) < len(styles):
                st = styles[int(s)]
                if st != "float":
                    t = st
            ct = c.get("t", "")
            v_el = c.find(_NS + "v")
            raw = v_el.text if v_el is not None else None
            if ct == "s":
                t = "string"
                idx = int(raw) if raw is not None else -1
                raw = strings[idx] if 0 <= idx < len(strings) \
                    else None
            elif ct == "inlineStr":
                t = "string"
                is_el = c.find(_NS + "is")
                raw = "".join(tt.text or "" for tt in
                              is_el.iter(_NS + "t")) \
                    if is_el is not None else None
            elif ct == "b":
                t = "bool"
            # t="str" (formula string) stays in the "float" channel:
            # the reference types it via CPLGetValueType, and header
            # detection counts it as non-text (with_xml_prefix.xlsx)
            values.append(raw)
            types.append(t)
        rows_types.append(types)
        rows_values.append(values)
    # drop trailing fully-empty rows
    while rows_values and all(v is None or v == ""
                              for v in rows_values[-1]):
        rows_values.pop()
        rows_types.pop()
    if not rows_values:
        return pa.table({})
    # header detection (DetectHeaderLine)
    first_all_string = all(t == "string" for t in rows_types[0]) \
        and len(rows_types[0]) > 0
    use_headers = False
    if headers == "FORCE":
        use_headers = True
    elif headers == "DISABLE":
        use_headers = False
    elif first_all_string and len(rows_values) > 1:
        cur = rows_types[1]
        n_text = sum(1 for t in cur if t == "string")
        n_nonempty = sum(1 for t in cur if t not in ("", "string"))
        if len(rows_types[0]) >= len(cur) and \
                n_text != len(rows_types[0]) and n_nonempty != 0:
            use_headers = True
    if use_headers:
        names = [str(v) if v not in (None, "") else f"Field{i + 1}"
                 for i, v in enumerate(rows_values[0])]
        rows_types = rows_types[1:]
        rows_values = rows_values[1:]
    else:
        names = None
    ncols = max((len(v) for v in rows_values), default=0)
    if names is not None:
        ncols = max(ncols, len(names))   # header may name more cols
    if names is None:
        names = [f"Field{i + 1}" for i in range(ncols)]
    while len(names) < ncols:
        names.append(f"Field{len(names) + 1}")
    kinds = _cell_type_for_row(rows_types, rows_values, ncols)
    cols = {}
    for i in range(ncols):
        ctypes = [t[i] if i < len(t) else "" for t in rows_types]
        cvals = [v[i] if i < len(v) else None for v in rows_values]
        cols[names[i]] = pa.array(
            _convert_column(kinds[i], ctypes, cvals),
            type=_ARROW[kinds[i]])
    return pa.Table.from_pydict(cols)


def read_xlsx(path, sheet=None, headers=None):
    """XLSX → ``{sheet_name: pyarrow.Table}`` (or one table when
    ``sheet`` is given).  ``headers``: None (auto) | 'FORCE' |
    'DISABLE', matching OGR_XLSX_HEADERS."""
    with zipfile.ZipFile(path) as z:
        styles = _styles(z)
        strings = _shared_strings(z)
        out = {}
        for name, target in _sheet_targets(z):
            if sheet is not None and name != sheet:
                continue
            t = _read_sheet(z, target, styles, strings, headers)
            if sheet is None and t.num_columns == 0:
                continue                 # empty sheets are no layer
            out[name] = t
    if sheet is not None:
        if sheet not in out:
            raise KeyError(f"sheet {sheet!r} not found in {path}")
        return out[sheet]
    return out
