"""ISO/IEC 8211 data descriptive file parser, from scratch.

Parity target: the reference's ``frmts/iso8211/`` library (DDFModule /
DDFRecord / DDFField), re-implemented from the public ISO/IEC 8211:1994
interchange structure: a DDR (leader id ``L``) whose field area defines
per-tag subfield labels and format controls, followed by DRs (leader
id ``D``, or ``R`` reusing the previous leader+directory).  Used by the
S-57 reader (:mod:`raydal.io.s57`); SDTS shares the same base format.

Format controls supported — the full set S-57 / SDTS profiles use:
``A``/``I``/``R``/``C`` text (fixed ``A(n)`` or UT-terminated),
``B(n)`` raw bit fields (n/8 bytes), ``b11/b12/b14`` unsigned and
``b21/b22/b24`` signed little-endian binaries, leading repeat counts
(``2b24``), and ``*``-prefixed repeating label groups.
"""

from __future__ import annotations

import struct

__all__ = ["ISO8211File", "FieldDef"]

FT = 0x1E   # field terminator
UT = 0x1F   # unit terminator


class FieldDef:
    """One DDR field definition: subfield labels + format controls."""

    __slots__ = ("tag", "name", "labels", "repeating", "formats")

    def __init__(self, tag, name, labels, repeating, formats):
        self.tag = tag
        self.name = name
        self.labels = labels          # list[str]
        self.repeating = repeating    # bool — '*' array descriptor
        self.formats = formats        # list[(kind, width)] per label

    def decode(self, data):
        """Field-instance bytes (FT stripped) → list of dicts
        (one per repeat group; a single dict for non-repeating)."""
        out = []
        pos = 0
        n = len(data)
        while True:
            row = {}
            for label, (kind, width) in zip(self.labels, self.formats):
                if pos >= n and kind not in ("A", "I", "R", "C"):
                    return out
                if kind == "b":
                    # width encodes (signedness, size): 11/12/14 unsigned,
                    # 21/22/24 signed, little-endian
                    size = width % 10
                    signed = width >= 20
                    row[label] = int.from_bytes(
                        data[pos:pos + size], "little", signed=signed)
                    pos += size
                elif kind == "B":
                    size = (width + 7) // 8
                    row[label] = data[pos:pos + size]
                    pos += size
                else:                 # A / I / R / C text
                    if width:
                        raw = data[pos:pos + width]
                        pos += width
                    else:
                        end = pos
                        while end < n and data[end] != UT:
                            end += 1
                        raw = data[pos:end]
                        pos = end + 1    # consume the UT
                    txt = raw.decode("latin-1")
                    if kind == "I":
                        txt = txt.strip()
                        row[label] = int(txt) if txt else 0
                    elif kind == "R":
                        txt = txt.strip()
                        row[label] = float(txt) if txt else 0.0
                    else:
                        row[label] = txt
            out.append(row)
            if not self.repeating or pos >= n:
                return out


def _parse_formats(s):
    """``(b11,b14,2b12,A,B(40))`` → flat [(kind, width)] list."""
    s = s.strip()
    if s.startswith("(") and s.endswith(")"):
        s = s[1:-1]
    out = []
    for tok in s.split(","):
        tok = tok.strip()
        if not tok:
            continue
        # leading repeat count
        i = 0
        while i < len(tok) and tok[i].isdigit():
            i += 1
        count = int(tok[:i]) if i else 1
        tok = tok[i:]
        if not tok:
            continue
        kind = tok[0]
        rest = tok[1:]
        if kind == "b":
            width = int(rest)         # 11/12/14/21/22/24
        elif rest.startswith("(") and rest.endswith(")"):
            width = int(rest[1:-1])
        else:
            width = 0                 # UT-terminated variable text
        out.extend([(kind, width)] * count)
    return out


class ISO8211File:
    """Parsed ISO 8211 module: ``.fields`` (tag → FieldDef) and
    ``.records`` — one dict per DR mapping tag → list of decoded
    field instances (a tag may repeat within a record)."""

    def __init__(self, src):
        if isinstance(src, (bytes, bytearray, memoryview)):
            buf = bytes(src)
        else:
            with open(src, "rb") as f:
                buf = f.read()
        self.fields = {}
        self.records = []
        self.raw = []        # parallel to records: tag → [field bytes]
        pos = 0
        prev_layout = None
        while pos + 24 <= len(buf):
            try:
                reclen = int(buf[pos:pos + 5])
            except ValueError:
                break
            leader_id = buf[pos + 6:pos + 7]
            if leader_id == b"R" and prev_layout is not None:
                # reused leader: directory identical to the previous DR
                base, entries = prev_layout
                if reclen == 0:       # ISO 8211 C.1.5.1 zero-length
                    reclen = base + max(fp + ln for _t, ln, fp in entries)
                self._decode_dr(buf, pos, base, entries)
                pos += reclen
                continue
            if 0 < reclen <= 24:
                break
            base = int(buf[pos + 12:pos + 17])
            szlen = int(buf[pos + 20:pos + 21])
            szpos = int(buf[pos + 21:pos + 22])
            sztag = int(buf[pos + 23:pos + 24])
            ent = sztag + szlen + szpos
            d = buf[pos + 24:pos + base]
            ft = d.index(b"\x1e")
            entries = []
            for j in range(0, ft, ent):
                tag = d[j:j + sztag].decode("ascii")
                ln = int(d[j + sztag:j + sztag + szlen])
                fp = int(d[j + sztag + szlen:j + ent])
                entries.append((tag, ln, fp))
            if reclen == 0:           # ISO 8211 C.1.5.1: length from
                reclen = base + max(  # the directory instead
                    fp + ln for _t, ln, fp in entries)
            if leader_id == b"L":
                self._decode_ddr(buf, pos, base, entries)
            else:
                self._decode_dr(buf, pos, base, entries)
                prev_layout = (base, entries)
            pos += reclen

    # ------------------------------------------------------------ DDR

    def _decode_ddr(self, buf, rec0, base, entries):
        for tag, ln, fp in entries:
            body = buf[rec0 + base + fp:rec0 + base + fp + ln]
            if tag == "0000":
                continue              # field-tag pair list (tree)
            # field control (first chars up to the name), then
            # UT name parts: name ; labels ; formats
            parts = body.rstrip(b"\x1e").split(b"\x1f")
            ctrl_name = parts[0]
            name = ctrl_name[9:].decode("latin-1") if len(ctrl_name) > 9 \
                else ""
            labels_raw = parts[1].decode("latin-1") if len(parts) > 1 \
                else ""
            fmt_raw = parts[2].decode("latin-1") if len(parts) > 2 else ""
            repeating = labels_raw.startswith("*")
            labels = [s for s in labels_raw.lstrip("*").split("!") if s]
            formats = _parse_formats(fmt_raw) if fmt_raw else []
            if labels and formats:
                # cycle formats to match label count (ISO 8211 reuses
                # the last control for the remaining labels)
                while len(formats) < len(labels):
                    formats.append(formats[-1])
            elif not labels:
                labels = [""]
                formats = formats or [("A", 0)]
            self.fields[tag] = FieldDef(tag, name, labels, repeating,
                                        formats)

    # ------------------------------------------------------------- DR

    def _decode_dr(self, buf, rec0, base, entries):
        rec = {}
        raw = {}
        for tag, ln, fp in entries:
            body = buf[rec0 + base + fp:rec0 + base + fp + ln]
            body = body.rstrip(b"\x1e")
            fd = self.fields.get(tag)
            if fd is None:
                continue
            rec.setdefault(tag, []).append(fd.decode(body))
            raw.setdefault(tag, []).append(body)
        self.records.append(rec)
        self.raw.append(raw)


# ---------------------------------------------------------------- writer

def build_record(fields, leader_id=b"D", field_control_len="  "):
    """[(tag, field_bytes_incl_FT)] → one ISO 8211 record (leader +
    directory + field area).  Sizes of the directory length/position
    columns are chosen to fit."""
    szlen = 1
    szpos = 1
    pos = 0
    for _tag, body in fields:
        szlen = max(szlen, len(str(len(body))))
        pos += len(body)
    szpos = max(szpos, len(str(pos)))
    # sizes must also cover the final position written
    ents = []
    pos = 0
    for tag, body in fields:
        ents.append((tag, len(body), pos))
        pos += len(body)
    dirpart = "".join(
        f"{t:<4s}{ln:0{szlen}d}{fp:0{szpos}d}" for t, ln, fp in ents
    ).encode("ascii") + b"\x1e"
    base = 24 + len(dirpart)
    total = base + pos
    mid = b"3" + leader_id + b"E1 09" if leader_id == b"L" \
        else b" " + leader_id + b"     "
    leader = (f"{total:05d}".encode() + mid
              + f"{base:05d}".encode() + b" ! "
              + str(szlen).encode() + str(szpos).encode() + b"04")
    assert len(leader) == 24, leader
    return leader + dirpart + b"".join(b for _t, b in fields)


def build_ddr(defs):
    """[(tag, data_struct_code, name, labels, formats)] → DDR record.
    ``labels``/``formats`` are raw strings (labels may start '*')."""
    fields = [("0000", b"0000;&   \x1f" + b"".join(
        b"0001" + t.encode() for t, *_ in defs if t != "0001")
        + b"\x1e")]
    for tag, code, name, labels, fmts in defs:
        body = (f"{code}00;&   {name}\x1f{labels}\x1f{fmts}"
                .encode("latin-1") + b"\x1e")
        fields.append((tag, body))
    return build_record(fields, leader_id=b"L", field_control_len="09")
