"""CSV vector driver — ``ogr/ogrsf_frmts/csv/`` semantics on stdlib
``csv``.

Replicated reference behaviors:

* ``.csvt`` sidecar types (``ogrcsvlayer.cpp`` OGRCSVReadParseLineL
  family): ``Integer``/``Integer64`` → int64, ``Real`` → float64,
  ``String`` → string, ``DateTime``/``Date`` → timestamp/date32,
  ``Time`` → string; width/precision qualifiers like ``Integer(5)`` or
  ``Real (10.7)`` are accepted and ignored (they only set field widths),
* optional type auto-detection (the AUTODETECT_TYPE open option):
  all-integer → int64, numeric → float64, else string,
* geometry from a ``WKT`` column (case-insensitive, the driver's
  default geometry recognition) parsed through :mod:`raydal.io.wkt`
  into the engine's ``wkb`` column, or point-building from X/Y columns
  (the ``X_POSSIBLE_NAMES``/``Y_POSSIBLE_NAMES`` mechanism — here the
  common default spellings x/lon/longitude, y/lat/latitude),
* delimiter sniffing over ``, ; \\t |`` by header field count,
* UTF-8 BOM tolerated.

Writer emits the symmetric layout (WKT geometry column + optional
``.csvt``).
"""

from __future__ import annotations

import csv as _csv
import io
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.wkb import point_wkb
from .wkt import wkb_to_wkt, wkt_to_wkb

__all__ = ["read_csv_features", "write_csv_features"]

_X_NAMES = ("x", "lon", "long", "longitude")
_Y_NAMES = ("y", "lat", "latitude")


def _csvt_type(tok):
    t = tok.strip().strip('"').split("(")[0].strip().lower()
    return {
        "integer": pa.int64(), "integer64": pa.int64(),
        "real": pa.float64(), "string": pa.string(),
        "datetime": pa.timestamp("us"), "date": pa.date32(),
        "time": pa.string(),
    }.get(t, pa.string())


def _sniff_delimiter(header_line):
    best, best_n = ",", 0
    for d in (",", ";", "\t", "|"):
        n = len(next(_csv.reader([header_line], delimiter=d)))
        if n > best_n:
            best, best_n = d, n
    return best


def _autodetect(vals):
    non_null = [v for v in vals if v not in ("", None)]
    if not non_null:
        return pa.string()
    try:
        ints = [int(v) for v in non_null]
        if all(str(i) == v.strip() for i, v in zip(ints, non_null)):
            return pa.int64()
    except ValueError:
        pass
    try:
        [float(v) for v in non_null]
        return pa.float64()
    except ValueError:
        return pa.string()


def _convert(vals, typ):
    clean = [None if v in ("", None) else v for v in vals]
    if typ == pa.int64():
        # int(v) first: int(float(v)) silently corrupts values > 2^53
        def _as_int(v):
            try:
                return int(v)
            except ValueError:
                return int(float(v))
        return pa.array([None if v is None else _as_int(v)
                         for v in clean], typ)
    if typ == pa.float64():
        return pa.array([None if v is None else float(v)
                         for v in clean], typ)
    if typ == pa.timestamp("us"):
        return pa.array(pd.to_datetime(clean, format="mixed")
                        .astype("datetime64[us]"), typ)
    if typ == pa.date32():
        norm = [None if v is None else v.replace("/", "-") for v in clean]
        return pa.array([None if v is None else pd.Timestamp(v).date()
                         for v in norm], typ)
    return pa.array(clean, pa.string())


def read_csv_features(path, delimiter=None, autodetect_types=False,
                      x_col=None, y_col=None, wkt_col=None,
                      wkb_col="wkb"):
    """CSV (path or text) → Arrow table; geometry from a WKT column or
    X/Y point columns when present."""
    # a string is literal CSV content only when it embeds a newline;
    # anything else is a path (a mistyped path raises, not mis-parses)
    if isinstance(path, str) and "\n" in path:
        text = path
    else:
        with open(path, encoding="utf-8-sig") as f:
            text = f.read()
    lines = text.splitlines()
    if not lines:
        raise ValueError("empty CSV")
    if delimiter is None:
        delimiter = _sniff_delimiter(lines[0])
    rows = list(_csv.reader(io.StringIO(text), delimiter=delimiter))
    header = rows[0]
    data = [r for r in rows[1:] if r]
    cols = {h: [r[i] if i < len(r) else None for r in data]
            for i, h in enumerate(header)}

    types = None
    if isinstance(path, str) and os.path.exists(str(path) + "t"):
        with open(str(path) + "t", encoding="utf-8-sig") as f:
            toks = next(_csv.reader([f.read().strip()]))
        types = {h: _csvt_type(t) for h, t in zip(header, toks)}

    lower = {h.lower(): h for h in header}
    if wkt_col is None and "wkt" in lower:
        wkt_col = lower["wkt"]
    if wkt_col is None and x_col is None:
        for xn in _X_NAMES:
            if xn in lower:
                for yn in _Y_NAMES:
                    if yn in lower:
                        x_col, y_col = lower[xn], lower[yn]
                        break
                break

    out = {}
    for h in header:
        if h == wkt_col:
            continue
        vals = cols[h]
        if types is not None:
            typ = types.get(h, pa.string())
        elif autodetect_types:
            typ = _autodetect(vals)
        else:
            typ = pa.string()
        out[h] = _convert(vals, typ)
    if wkt_col is not None:
        def _wkb_or_null(v):
            # unparseable WKT → null geometry with the row kept, the
            # reference driver's behavior on bad cells
            if v in ("", None):
                return None
            try:
                return wkt_to_wkb(v)
            except ValueError:
                return None

        out[wkb_col] = pa.array([_wkb_or_null(v) for v in cols[wkt_col]],
                                pa.binary())
    elif x_col is not None:
        out[wkb_col] = pa.array(
            [None if x in ("", None) or y in ("", None)
             else point_wkb(float(x), float(y))
             for x, y in zip(cols[x_col], cols[y_col])], pa.binary())
    return pa.Table.from_pydict(out)


_CSVT_NAME = {pa.int64(): "Integer64", pa.float64(): "Real",
              pa.string(): "String", pa.timestamp("us"): "DateTime",
              pa.date32(): "Date"}


def write_csv_features(table, path, wkb_col="wkb", write_csvt=False,
                       wkt_precision=15):
    """Arrow table / pandas frame → CSV with a WKT geometry column
    (``wkt_precision=17`` emits round-trip-exact coordinates — the
    OGR_WKT_PRECISION analogue)."""
    if not isinstance(table, pa.Table):
        table = pa.Table.from_pandas(table, preserve_index=False)
    names = [c for c in table.column_names if c != wkb_col]
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = _csv.writer(f)
        hdr = names + (["WKT"] if wkb_col in table.column_names else [])
        w.writerow(hdr)
        cols = [table[c].to_pylist() for c in names]
        geoms = (table[wkb_col].to_pylist()
                 if wkb_col in table.column_names else None)
        for i in range(table.num_rows):
            row = [("" if c[i] is None else c[i]) for c in cols]
            if geoms is not None:
                row.append("" if geoms[i] is None
                           else wkb_to_wkt(geoms[i], wkt_precision))
            w.writerow(row)
    if write_csvt:
        toks = [_CSVT_NAME.get(table.schema.field(c).type, "String")
                for c in names]
        if wkb_col in table.column_names:
            toks.append("WKT")
        with open(path + "t", "w", encoding="utf-8") as f:
            f.write(",".join(f'"{t}"' for t in toks) + "\n")
    return path
