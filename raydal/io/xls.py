"""Legacy Excel .xls (BIFF8 in an OLE2 compound document) vector
reader, from scratch.

Mirrors the reference's XLS driver (``ogr/ogrsf_frmts/xls/``, which
rides on freexl) semantics, derived from its published test matrix
(``autotest/ogr/ogr_xls.py``):

* the OLE2 container (512-byte sectors, DIFAT/FAT chains, directory,
  mini-FAT for streams under 4096 bytes) yields the ``Workbook`` /
  ``Book`` stream,
* BIFF8 records: BOUNDSHEET names+offsets, the shared string table
  (SST + CONTINUE splits, compressed/UTF-16 runs per fragment),
  LABELSST / NUMBER / RK / MULRK / LABEL / FORMULA(+STRING) cells,
  DATEMODE, FORMAT / XF for date detection,
* a cell whose XF points at a date/datetime number format (builtin
  14-22/27-36/45-58 or a custom mask with y/m/d/h outside brackets)
  renders GDAL-style (``1980/01/01``, ``1980/01/01 00:00:00``) from
  its Excel serial (1900 system with the Lotus leap bug, or 1904),
* the first row becomes the header when every populated cell is
  text (``headers=None`` autodetect; ``headers=False`` mirrors
  ``OGR_XLS_HEADERS=DISABLE``); column types come from scanning the
  cells (int vs real vs string vs date vs datetime).
"""

from __future__ import annotations

import datetime
import re
import struct

import pyarrow as pa

__all__ = ["read_xls", "xls_sheet_names"]

_OLE_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE, _ENDOFCHAIN = 0xFFFFFFFF, 0xFFFFFFFE


def _ole_stream(buf, want_names):
    """OLE2 compound file → first stream whose name is in want_names."""
    if buf[:8] != _OLE_SIG:
        raise ValueError("not an OLE2 compound document")
    ssz = 1 << struct.unpack_from("<H", buf, 30)[0]
    mssz = 1 << struct.unpack_from("<H", buf, 32)[0]
    n_fat = struct.unpack_from("<I", buf, 44)[0]
    dir_start = struct.unpack_from("<I", buf, 48)[0]
    mini_cutoff = struct.unpack_from("<I", buf, 56)[0]
    minifat_start = struct.unpack_from("<I", buf, 60)[0]
    n_minifat = struct.unpack_from("<I", buf, 64)[0]
    difat_start = struct.unpack_from("<I", buf, 68)[0]
    n_difat = struct.unpack_from("<I", buf, 72)[0]

    def sector(i):
        off = 512 + i * ssz
        return buf[off:off + ssz]

    difat = list(struct.unpack_from("<109I", buf, 76))
    s = difat_start
    for _ in range(n_difat):
        if s in (_FREE, _ENDOFCHAIN):
            break
        sec = sector(s)
        vals = struct.unpack(f"<{ssz // 4}I", sec)
        difat.extend(vals[:-1])
        s = vals[-1]
    fat = []
    for i in difat[:n_fat]:
        if i in (_FREE, _ENDOFCHAIN):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(i)))

    def chain(start):
        out, s = [], start
        seen = set()
        while s not in (_FREE, _ENDOFCHAIN) and s < len(fat) and \
                s not in seen:
            seen.add(s)
            out.append(s)
            s = fat[s]
        return out

    dir_bytes = b"".join(sector(i) for i in chain(dir_start))
    entries = []
    for off in range(0, len(dir_bytes) - 127, 128):
        e = dir_bytes[off:off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[:nlen - 2].decode("utf-16le", errors="replace")
        etype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    minifat = []
    s = minifat_start
    for _ in range(n_minifat):
        if s in (_FREE, _ENDOFCHAIN):
            break
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))
        s = fat[s] if s < len(fat) else _ENDOFCHAIN
    mini_stream = b""
    if root is not None:
        mini_stream = b"".join(sector(i) for i in chain(root[2]))

    for name, etype, start, size in entries:
        if etype != 2 or name not in want_names:
            continue
        if size < mini_cutoff:
            out, s = [], start
            seen = set()
            while s not in (_FREE, _ENDOFCHAIN) and s < len(minifat) \
                    and s not in seen:
                seen.add(s)
                out.append(mini_stream[s * mssz:(s + 1) * mssz])
                s = minifat[s]
            return b"".join(out)[:size]
        return b"".join(sector(i) for i in chain(start))[:size]
    raise ValueError(f"stream {sorted(want_names)} not found")


def _records(wb, start=0):
    off = start
    while off + 4 <= len(wb):
        op, ln = struct.unpack_from("<HH", wb, off)
        yield op, wb[off + 4:off + 4 + ln], off
        off += 4 + ln
        if op == 0x0A and start > 0:     # EOF of a substream
            return


def _parse_sst(payload_parts):
    """SST + CONTINUE payloads → list of strings (fragment-aware)."""
    strings = []
    parts = payload_parts
    pi, off = 0, 8                       # skip cstTotal/cstUnique
    def need(n):
        nonlocal pi, off
        out = b""
        while n > 0:
            avail = len(parts[pi]) - off
            if avail <= 0:
                pi += 1
                off = 0
                continue
            take = min(avail, n)
            out += parts[pi][off:off + take]
            off += take
            n -= take
        return out

    total = struct.unpack_from("<I", parts[0], 4)[0]
    for _ in range(total):
        cch = struct.unpack("<H", need(2))[0]
        flags = need(1)[0]
        high = flags & 1
        rich = (flags & 8) != 0
        ext = (flags & 4) != 0
        crun = struct.unpack("<H", need(2))[0] if rich else 0
        cbext = struct.unpack("<i", need(4))[0] if ext else 0
        chars = []
        remaining = cch
        while remaining > 0:
            if off >= len(parts[pi]):
                pi += 1
                off = 0
                high = need(1)[0] & 1   # fresh flags per continuation
            avail = len(parts[pi]) - off
            if high:
                n = min(remaining, avail // 2)
                if n == 0:
                    pi += 1
                    off = 0
                    high = need(1)[0] & 1
                    continue
                chars.append(need(2 * n).decode("utf-16le",
                                                errors="replace"))
            else:
                n = min(remaining, avail)
                if n == 0:
                    pi += 1
                    off = 0
                    high = need(1)[0] & 1
                    continue
                chars.append(need(n).decode("latin1"))
            remaining -= n
        need(4 * crun + max(0, cbext))
        strings.append("".join(chars))
    return strings


def _rk_value(rk):
    cent = rk & 1
    isint = rk & 2
    if isint:
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        val = float(v)
    else:
        val = struct.unpack("<d", struct.pack("<Q",
                                              (rk & ~3) << 32))[0]
    return val / 100.0 if cent else val


_BUILTIN_DATE = set(range(14, 23)) | set(range(27, 37)) | \
    set(range(45, 59))
_BUILTIN_TIME_ONLY = {18, 19, 20, 21, 45, 46, 47}
_BUILTIN_DATETIME = {22}


def _fmt_is_date(fmt):
    s = re.sub(r"\[[^\]]*\]|\"[^\"]*\"", "", fmt or "")
    return bool(re.search(r"[ymdhs]", s, re.I)) and not \
        re.search(r"[#0]", s)


def _serial_to_dt(v, date1904):
    if date1904:
        base = datetime.datetime(1904, 1, 1)
        days = v
    else:
        base = datetime.datetime(1899, 12, 31)
        days = v
        if v >= 60:                       # Lotus 1900 leap-bug
            days = v - 1
    frac = days - int(days)
    dt = base + datetime.timedelta(days=int(days))
    secs = int(round(frac * 86400))
    return dt + datetime.timedelta(seconds=secs)


class _Cell:
    __slots__ = ("kind", "value")

    def __init__(self, kind, value):
        self.kind = kind
        self.value = value


def _parse_workbook(wb):
    sheets = []                           # (name, offset)
    sst = []
    formats = {}                          # fmt id → format string
    xf_fmt = []                           # xf index → fmt id
    date1904 = False
    sst_parts = None
    for op, payload, off in _records(wb):
        if op == 0x85:                    # BOUNDSHEET
            pos = struct.unpack_from("<I", payload, 0)[0]
            cch = payload[6]
            high = payload[7] & 1
            raw = payload[8:8 + cch * (2 if high else 1)]
            name = raw.decode("utf-16le" if high else "latin1",
                              errors="replace")
            sheets.append((name, pos))
        elif op == 0xFC:
            sst_parts = [payload]
        elif op == 0x3C and sst_parts is not None:
            sst_parts.append(payload)
        elif op == 0x41E:                 # FORMAT
            fid = struct.unpack_from("<H", payload, 0)[0]
            cch = struct.unpack_from("<H", payload, 2)[0]
            high = payload[4] & 1
            raw = payload[5:5 + cch * (2 if high else 1)]
            formats[fid] = raw.decode("utf-16le" if high else "latin1",
                                      errors="replace")
        elif op == 0xE0:                  # XF
            xf_fmt.append(struct.unpack_from("<H", payload, 2)[0])
        elif op == 0x22:                  # DATEMODE
            date1904 = struct.unpack_from("<H", payload, 0)[0] == 1
        elif op == 0x0A and sheets:
            break                         # globals substream done
    if sst_parts:
        sst = _parse_sst(sst_parts)
    return sheets, sst, formats, xf_fmt, date1904


def _xf_kind(ixfe, xf_fmt, formats):
    if ixfe >= len(xf_fmt):
        return "num"
    fid = xf_fmt[ixfe]
    if fid in _BUILTIN_TIME_ONLY:
        return "time"
    if fid in _BUILTIN_DATETIME:
        return "datetime"
    if fid in _BUILTIN_DATE:
        return "date"
    fmt = formats.get(fid)
    if fmt and _fmt_is_date(fmt):
        s = re.sub(r"\[[^\]]*\]", "", fmt)
        has_d = re.search(r"[ymd]", s, re.I)
        has_t = re.search(r"[hs]|AM/PM", s, re.I)
        if has_d and has_t:
            return "datetime"
        if has_t:
            return "time"
        return "date"
    return "num"


def _sheet_cells(wb, start, sst, xf_fmt, formats, date1904):
    cells = {}
    pending_formula = None
    for op, payload, off in _records(wb, start):
        if op == 0x0A:
            break
        if op == 0xFD:                    # LABELSST
            r, c = struct.unpack_from("<HH", payload, 0)
            isst = struct.unpack_from("<I", payload, 6)[0]
            if isst < len(sst):
                cells[(r, c)] = _Cell("str", sst[isst])
        elif op in (0x203, 0x27E):        # NUMBER / RK
            r, c, ixfe = struct.unpack_from("<HHH", payload, 0)
            if op == 0x203:
                v = struct.unpack_from("<d", payload, 6)[0]
            else:
                v = _rk_value(struct.unpack_from("<I", payload, 6)[0])
            cells[(r, c)] = _num_cell(v, ixfe, xf_fmt, formats,
                                      date1904)
        elif op == 0xBD:                  # MULRK
            r, c0 = struct.unpack_from("<HH", payload, 0)
            n = (len(payload) - 6) // 6
            for i in range(n):
                ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * i)
                cells[(r, c0 + i)] = _num_cell(
                    _rk_value(rk), ixfe, xf_fmt, formats, date1904)
        elif op == 0x204:                 # LABEL (BIFF8 unicode)
            r, c = struct.unpack_from("<HH", payload, 0)
            cch = struct.unpack_from("<H", payload, 6)[0]
            high = payload[8] & 1
            raw = payload[9:9 + cch * (2 if high else 1)]
            cells[(r, c)] = _Cell("str", raw.decode(
                "utf-16le" if high else "latin1", errors="replace"))
        elif op == 0x06:                  # FORMULA
            r, c, ixfe = struct.unpack_from("<HHH", payload, 0)
            res = payload[6:14]
            if res[6:8] == b"\xff\xff":
                if res[0] == 0:           # string follows in STRING
                    pending_formula = (r, c)
                elif res[0] == 1:
                    cells[(r, c)] = _Cell("num", float(res[2]))
            else:
                v = struct.unpack("<d", res)[0]
                cells[(r, c)] = _num_cell(v, ixfe, xf_fmt, formats,
                                          date1904)
        elif op == 0x207 and pending_formula is not None:
            cch = struct.unpack_from("<H", payload, 0)[0]
            high = payload[2] & 1
            raw = payload[3:3 + cch * (2 if high else 1)]
            cells[pending_formula] = _Cell("str", raw.decode(
                "utf-16le" if high else "latin1", errors="replace"))
            pending_formula = None
    return cells


def _num_cell(v, ixfe, xf_fmt, formats, date1904):
    kind = _xf_kind(ixfe, xf_fmt, formats)
    if kind == "num":
        return _Cell("num", v)
    dt = _serial_to_dt(v, date1904)
    if kind == "date":
        return _Cell("date", dt.strftime("%Y/%m/%d"))
    if kind == "time":
        return _Cell("time", dt.strftime("%H:%M:%S"))
    return _Cell("datetime", dt.strftime("%Y/%m/%d %H:%M:%S"))


def xls_sheet_names(path):
    buf = open(path, "rb").read()
    wb = _ole_stream(buf, {"Workbook", "Book"})
    sheets, *_ = _parse_workbook(wb)
    return [n for n, _ in sheets]


def read_xls(path, sheet=None, headers=None):
    """.xls file → Arrow table for one sheet (first by default).
    ``headers``: None = autodetect (first row all-text), True/False =
    force (``OGR_XLS_HEADERS`` semantics)."""
    buf = open(path, "rb").read()
    wb = _ole_stream(buf, {"Workbook", "Book"})
    sheets, sst, formats, xf_fmt, date1904 = _parse_workbook(wb)
    if not sheets:
        raise ValueError("no sheets")
    if sheet is None:
        name, start = sheets[0]
    else:
        match = [s for s in sheets if s[0] == sheet]
        if not match:
            raise ValueError(f"sheet {sheet!r} not found")
        name, start = match[0]

    cells = _sheet_cells(wb, start, sst, xf_fmt, formats, date1904)
    if not cells:
        return pa.table({})
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1

    first = [cells.get((0, c)) for c in range(ncols)]
    if headers is None:
        headers = all(c is None or c.kind == "str" for c in first) and \
            any(c is not None for c in first)
    if headers:
        names = [(first[c].value if first[c] is not None
                  else f"Field{c + 1}") for c in range(ncols)]
        r0 = 1
    else:
        names = [f"Field{c + 1}" for c in range(ncols)]
        r0 = 0

    arrays = []
    for c in range(ncols):
        col = [cells.get((r, c)) for r in range(r0, nrows)]
        kinds = {x.kind for x in col if x is not None}
        if kinds <= {"num"}:
            vals = [None if x is None else x.value for x in col]
            ints = all(v is None or float(v).is_integer() for v in vals)
            if ints and any(v is not None for v in vals):
                arrays.append(pa.array(
                    [None if v is None else int(v) for v in vals],
                    type=pa.int64()))
            else:
                arrays.append(pa.array(vals, type=pa.float64()))
        elif kinds <= {"date", "datetime", "time"}:
            # the reference promotes a date+datetime mix to DateTime;
            # plain dates then render with a 00:00:00 time part
            promote = "datetime" in kinds and "date" in kinds
            vals = []
            for x in col:
                if x is None:
                    vals.append(None)
                elif promote and x.kind == "date":
                    vals.append(x.value + " 00:00:00")
                else:
                    vals.append(x.value)
            arrays.append(pa.array(vals, type=pa.string()))
        else:
            arrays.append(pa.array(
                [None if x is None else
                 (x.value if isinstance(x.value, str)
                  else _fmt_num(x.value)) for x in col],
                type=pa.string()))
    return pa.table(arrays, names=names).replace_schema_metadata(
        {b"sheet": name.encode()})


def _fmt_num(v):
    return str(int(v)) if float(v).is_integer() else repr(v)
