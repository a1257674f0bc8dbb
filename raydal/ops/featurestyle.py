"""OGR feature styles — parse/serialize style strings, style tables,
and a vectorized style-explode operator.

Reference semantics: ``ogr/ogrfeaturestyle.cpp`` — the four
OGRStyleParamId tables (asStylePen/Brush/Symbol/Label, :60-117),
OGRStyleTool::Parse (:1687 — ``TOOL(tok:val,...)`` with quote-honouring
tokenization), SetInternalInputUnitFromParam (unit suffix search order
g, px, pt, mm, cm, in; default mm), GetStyleString (serialize in TABLE
order, ``%f`` doubles, unit suffix on georeferenced params),
GetRGBFromString (:1524 — ``#RRGGBB[AA]``), OGRStyleMgr part handling
(parts separated by ``;`` outside quotes) and OGRStyleTable
(name:style lines, Find/GetNextStyle).
"""

from __future__ import annotations

__all__ = ["PEN", "BRUSH", "SYMBOL", "LABEL", "TOOL_PARAMS",
           "parse_style", "serialize_style", "split_style_parts",
           "get_rgb_from_string", "StyleTable", "explode_style_column"]

# (token, type, georef) in reference table order
PEN = [("c", "str", False), ("w", "float", True), ("p", "str", False),
       ("id", "str", False), ("dp", "float", True),
       ("cap", "str", False), ("j", "str", False), ("l", "int", False)]
BRUSH = [("fc", "str", False), ("bc", "str", False), ("id", "str", False),
         ("a", "float", False), ("s", "float", True),
         ("dx", "float", True), ("dy", "float", True), ("l", "int", False)]
SYMBOL = [("id", "str", False), ("a", "float", False), ("c", "str", False),
          ("s", "float", True), ("dx", "float", True),
          ("dy", "float", True), ("ds", "float", True),
          ("dp", "float", True), ("di", "float", True),
          ("l", "int", False), ("f", "str", False), ("o", "str", False)]
LABEL = [("f", "str", False), ("s", "float", True), ("t", "str", False),
         ("a", "float", False), ("c", "str", False), ("b", "str", False),
         ("m", "str", False), ("p", "int", False), ("dx", "float", True),
         ("dy", "float", True), ("dp", "float", True),
         ("bo", "bool", False), ("it", "bool", False),
         ("un", "bool", False), ("l", "int", False),
         ("st", "bool", False), ("w", "float", False),
         ("h", "str", False), ("o", "str", False)]

TOOL_PARAMS = {"PEN": PEN, "BRUSH": BRUSH, "SYMBOL": SYMBOL,
               "LABEL": LABEL}

_UNITS = ("g", "px", "pt", "mm", "cm", "in")   # reference search order


def _split_quoted(s, seps):
    """Split on any char in ``seps`` outside double quotes, keeping
    quotes and backslash escapes (CSLTokenizeString2 HONOURSTRINGS +
    PRESERVEQUOTES + PRESERVEESCAPES)."""
    out, cur, inq, i = [], [], False, 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            cur.append(ch)
            cur.append(s[i + 1])
            i += 2
            continue
        if ch == '"':
            inq = not inq
            cur.append(ch)
        elif not inq and ch in seps:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


def _unquote(s):
    s = s.strip()
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        s = s[1:-1]
    return s.replace('\\"', '"')


def _strip_unit(value):
    """(bare_value, unit) per SetInternalInputUnitFromParam — the FIRST
    matching substring in the order g, px, pt, mm, cm, in wins; value
    is truncated at it; default unit mm."""
    for u in _UNITS:
        k = value.find(u)
        if k >= 0:
            return value[:k], u
    return value, "mm"


def split_style_parts(style):
    """Top-level parts of a multi-tool style string (';' outside
    quotes/parens)."""
    out, cur, inq, depth = [], [], False, 0
    for ch in style:
        if ch == '"':
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth = max(0, depth - 1)
            elif ch == ";" and depth == 0:
                part = "".join(cur).strip()
                if part:
                    out.append(part)
                cur = []
                continue
        cur.append(ch)
    part = "".join(cur).strip()
    if part:
        out.append(part)
    return out


def parse_style(style):
    """Parse a (possibly multi-part) style string.

    Returns a list of ``{"tool": name, "params": {token: value},
    "units": {token: unit}}`` — values typed per the reference tables
    (strings unquoted, doubles/ints parsed, booleans with no value
    read as 1 — legacy behavior), unknown tokens skipped like the
    reference's silent non-match.
    """
    parts = []
    for part in split_style_parts(style):
        toks = _split_quoted(part, "()")
        if not 1 <= len(toks) <= 2:
            raise ValueError(f"malformed style tool: {part!r}")
        tool = toks[0].strip().upper()
        if tool not in TOOL_PARAMS:
            raise ValueError(f"unknown style tool {toks[0]!r}")
        table = TOOL_PARAMS[tool]
        params, units = {}, {}
        for elem in (_split_quoted(toks[1], ",") if len(toks) == 2
                     else []):
            pair = _split_quoted(elem, ":")
            if not 1 <= len(pair) <= 2:
                continue                    # reference: warn + skip
            key = pair[0].strip().lower()
            for token, typ, georef in table:
                if token != key:
                    continue
                raw = pair[1] if len(pair) == 2 else "1"
                if georef and len(pair) == 2:
                    raw, units[token] = _strip_unit(raw)
                raw = _unquote(raw)
                try:
                    if typ == "float":
                        params[token] = float(raw)
                    elif typ == "int":
                        params[token] = int(float(raw))
                    elif typ == "bool":
                        params[token] = 1 if raw not in ("0", "") else 0
                    else:
                        params[token] = raw
                except ValueError:
                    params[token] = raw
                break
        parts.append({"tool": tool, "params": params, "units": units})
    return parts


def serialize_style(parts):
    """Parts → style string, reference GetStyleString layout: params in
    TABLE order, ``%f`` doubles, unit suffix on georeferenced params
    (mm when unspecified), parts joined with ';'."""
    chunks = []
    for part in parts:
        table = TOOL_PARAMS[part["tool"]]
        elems = []
        for token, typ, georef in table:
            if token not in part["params"]:
                continue
            v = part["params"][token]
            if typ == "float":
                s = f"{token}:{float(v):f}"
            elif typ in ("int", "bool"):
                s = f"{token}:{int(v):d}"
            else:
                sv = str(v)
                if any(c in sv for c in ",():;"):
                    sv = '"' + sv.replace('"', '\\"') + '"'
                s = f"{token}:{sv}"
            if georef:
                s += part.get("units", {}).get(token, "mm")
            elems.append(s)
        chunks.append(f"{part['tool']}({','.join(elems)})")
    return ";".join(chunks)


def get_rgb_from_string(color):
    """``#RRGGBB[AA]`` → (r, g, b, a, ok) — alpha defaults 255
    (ogrfeaturestyle.cpp:1524)."""
    r = g = b = 0
    a = 255
    if not color or not color.startswith("#"):
        return 0, 0, 0, 255, False
    hexs = color[1:]
    # sscanf %2x semantics: greedily take 1-2 hex digits per field
    vals, pos = [], 0
    for _field in range(4):
        chunk = ""
        while pos < len(hexs) and len(chunk) < 2 \
                and hexs[pos] in "0123456789abcdefABCDEF":
            chunk += hexs[pos]
            pos += 1
        if not chunk:
            break
        vals.append(int(chunk, 16))
    n = len(vals)
    if n >= 3:
        r, g, b = vals[0], vals[1], vals[2]
        if n == 4:
            a = vals[3]
        return r, g, b, a, True
    return 0, 0, 0, 255, False


class StyleTable:
    """Name → style-string table; ``name:style`` lines on disk
    (OGRStyleTable, CSLSave/CSLLoad layout)."""

    def __init__(self):
        self._entries: list[tuple[str, str]] = []
        self._pos = 0
        self._last_name = None

    def add_style(self, name, style):
        if self.find(name) is not None:
            return False
        self._entries.append((name, style))
        return True

    def find(self, name):
        for n, s in self._entries:
            if n == name:
                return s
        return None

    def get_next_style(self):
        if self._pos >= len(self._entries):
            return None
        name, style = self._entries[self._pos]
        self._pos += 1
        self._last_name = name
        return style

    def get_last_style_name(self):
        return self._last_name

    def reset_style_string_reading(self):
        self._pos = 0

    def save(self, path):
        with open(path, "w", encoding="utf-8") as f:
            for name, style in self._entries:
                f.write(f"{name}:{style}\n")
        return True

    def load(self, path):
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                name, _, style = line.partition(":")
                self.add_style(name, style)
        return True


def explode_style_column(ds, col="style", id_col=None):
    """Dataset op: parse a style-string column into long-format rows
    (one per style parameter): id, part index, tool, param, value
    (stringified), unit.  Parsing is stateless string work per batch —
    a plain ``map_batches`` task pool, no shuffle."""
    import pyarrow as pa

    def explode(t: pa.Table) -> pa.Table:
        ids = (t[id_col].to_pylist() if id_col
               else list(range(t.num_rows)))
        out = {"id": [], "part": [], "tool": [], "param": [],
               "value": [], "unit": []}
        for rid, style in zip(ids, t[col].to_pylist()):
            if not style:
                continue
            try:
                parts = parse_style(style)
            except ValueError:
                continue
            for pi, part in enumerate(parts):
                for token, value in part["params"].items():
                    out["id"].append(rid)
                    out["part"].append(pi)
                    out["tool"].append(part["tool"])
                    out["param"].append(token)
                    out["value"].append(str(value))
                    out["unit"].append(
                        part["units"].get(token))
        return pa.Table.from_pydict({
            "id": pa.array(out["id"], pa.int64()),
            "part": pa.array(out["part"], pa.int32()),
            "tool": pa.array(out["tool"], pa.string()),
            "param": pa.array(out["param"], pa.string()),
            "value": pa.array(out["value"], pa.string()),
            "unit": pa.array(out["unit"], pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")
