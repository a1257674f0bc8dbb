"""JPL VICAR raster reader, from scratch.

Implements the VICAR v2 container the reference reads in
``frmts/pds/vicardataset.cpp`` + ``vicarkeywordhandler.cpp``:

* ASCII label: ``LBLSIZE=n`` first, then blank-separated
  ``KEY=value`` items (quoted strings, ``(a,b,c)`` lists), with the
  optional EOL=1 continuation label after the pixel records,
* layout: RECSIZE-byte records, NLB binary-header records skipped,
  NBB binary-prefix bytes per record stripped, ORG BSQ / BIL / BIP,
* formats BYTE / HALF / WORD / FULL / LONG / REAL / DOUB / COMP with
  INTFMT LOW|HIGH and REALFMT IEEE (big) | RIEEE (little) | VAX
  (F/D floats via the cpl_vax.cpp conversions, vectorized),
* COMPRESS BASIC / BASIC2: per-line bit-packed delta coding
  (vicardataset.cpp:642 ``basic_decode`` ported 1:1; BASIC prefixes
  each record with its uint32 size, BASIC2 stores all record sizes
  after the label).

Goldens: autotest/gdrivers/vicar.py read_datatypes_lists — 13 files
across datatypes/orgs/byte orders/VAX plus the BASIC/BASIC2
compressed variants, each with a published GDAL checksum.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_vicar", "vicar_label"]


def _parse_value(s: str):
    s = s.strip()
    if s.startswith("'") and s.endswith("'"):
        return s[1:-1]
    if s.startswith("("):
        return [_parse_value(x) for x in s[1:-1].split(",")]
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _parse_label_text(text: str) -> dict:
    """Blank-separated KEY=value items; values may contain blanks when
    quoted or parenthesized."""
    out = {}
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n\0":
            i += 1
        j = text.find("=", i)
        if j < 0:
            break
        key = text[i:j].strip()
        k = j + 1
        if k < n and text[k] == "'":
            e = text.find("'", k + 1)
            while e + 1 < n and text[e + 1] == "'":
                e = text.find("'", e + 2)
            val = text[k:e + 1]
            i = e + 1
        elif k < n and text[k] == "(":
            e = text.find(")", k)
            val = text[k:e + 1]
            i = e + 1
        else:
            e = k
            while e < n and text[e] not in " \t\r\n\0":
                e += 1
            val = text[k:e]
            i = e
        if key:
            out[key.upper()] = _parse_value(val)
    return out


def vicar_label(path) -> dict:
    with open(path, "rb") as f:
        head = f.read(64).decode("latin-1", "replace")
        if not head.startswith("LBLSIZE"):
            raise ValueError("not a VICAR file (no LBLSIZE)")
        lblsize = int(head.split("=", 1)[1].split()[0])
        f.seek(0)
        text = f.read(lblsize).decode("latin-1", "replace")
    lab = _parse_label_text(text)
    lab["_LBLSIZE"] = lblsize
    return lab


_COD1MASK = [0x00, 0x01, 0x03, 0x07, 0x0F, 0x1F, 0x3F, 0x7F, 0xFF]
_CMPRTRNS1 = (-3, -2, -1, 0, 1, 2, 3)


class _Bits:
    """MSB-first bit grabber (vicardataset.cpp grab1)."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, data):
        self.d = data
        self.pos = 0
        self.bit = 0

    def grab(self, nbit):
        shift = 8 - nbit - self.bit
        d = self.d
        if self.pos >= len(d):
            raise ValueError("out of BASIC decoding buffer")
        if shift > 0:
            val = (d[self.pos] >> shift) & _COD1MASK[nbit]
            self.bit += nbit
            return val
        if shift < 0:
            v1 = d[self.pos] & _COD1MASK[nbit + shift]
            self.pos += 1
            if self.pos >= len(d):
                raise ValueError("out of BASIC decoding buffer")
            v2 = (d[self.pos] >> (8 + shift)) & _COD1MASK[-shift]
            self.bit = -shift
            return ((v1 << (-shift)) + v2) & 0xFF
        val = d[self.pos] & _COD1MASK[nbit]
        self.pos += 1
        self.bit = 0
        return val


def basic_decode(code: bytes, ns: int, wid: int) -> bytes:
    """VICAR BASIC line decompression (vicardataset.cpp:642): per byte
    plane (iw) a 3-bit delta code, 8-bit literals and run lengths up to
    24 bits."""
    buf = bytearray(ns * wid)
    bits = _Bits(code)
    run = -3
    nval = 999999
    old = 0
    ptop = ns * wid
    for iw in range(wid):
        ip = iw
        while ip < ptop:
            if run > -3:
                buf[ip] = nval & 0xFF
                run -= 1
                ip += wid
                continue
            val = bits.grab(3)
            if val < 7:
                nval = (old + _CMPRTRNS1[val]) & 0xFFFFFFFF
                buf[ip] = nval & 0xFF
                old = nval
                ip += wid
                continue
            if bits.grab(1):
                rc = bits.grab(4)
                if rc == 15:
                    rc = bits.grab(8)
                    if rc == 255:
                        p0 = bits.grab(8)
                        p1 = bits.grab(8)
                        p2 = bits.grab(8)
                        run = p0 | (p1 << 8) | (p2 << 16)
                    else:
                        run = rc + 15
                else:
                    run = rc
                val = bits.grab(3)
                if val < 7:
                    nval = (old + _CMPRTRNS1[val]) & 0xFFFFFFFF
                else:
                    nval = bits.grab(8)
                buf[ip] = nval & 0xFF
                old = nval
            else:
                v = bits.grab(8)
                buf[ip] = v
                old = v
            ip += wid
    return bytes(buf)


def _vax_f_to_ieee(raw: np.ndarray) -> np.ndarray:
    """Vectorized VAX F_FLOAT → float32 (port/cpl_vax.cpp vax_ieee_r)."""
    b = raw.reshape(-1, 4).astype(np.uint32)
    # rational byte order: swap adjacent bytes
    u = (b[:, 1] << 24) | (b[:, 0] << 16) | (b[:, 3] << 8) | b[:, 2]
    sign = u & 0x80000000
    exp = (u >> 23) & 0xFF
    mant = u & 0x007FFFFF
    out = np.where(exp >= 3,
                   sign | (((exp - 2) & 0xFF) << 23) | mant,
                   0)
    full = 0x00800000 | mant
    out = np.where(exp == 2, sign | (full >> 1), out)
    out = np.where(exp == 1, sign | (full >> 2), out)
    out = np.where((exp == 0) & (sign != 0), 0x7FFFFFFF, out)
    out = np.where((exp == 0) & (sign == 0), 0, out)
    return out.astype(np.uint32).view(np.float32)


def _vax_d_to_ieee(raw: np.ndarray) -> np.ndarray:
    """Vectorized VAX D_FLOAT → float64 (cpl_vax.cpp CPLVaxToIEEEDouble,
    same arithmetic as io/dgn.py's scalar version)."""
    b = raw.reshape(-1, 8).astype(np.uint64)
    hi = b[:, 2] | (b[:, 3] << 8) | (b[:, 0] << 16) | (b[:, 1] << 24)
    lo = b[:, 6] | (b[:, 7] << 8) | (b[:, 4] << 16) | (b[:, 5] << 24)
    sign = hi & 0x80000000
    exponent = (hi >> 23) & 0xFF
    exponent = np.where(exponent != 0, exponent - 129 + 1023, 0)
    rnd = lo & 0x7
    lo2 = lo >> 3
    lo2 = (lo2 & 0x1FFFFFFF) | ((hi << 29) & 0xFFFFFFFF)
    lo2 = np.where(rnd != 0, lo2 | 1, lo2)
    hi2 = (hi >> 3) & 0x000FFFFF
    hi2 = hi2 | ((exponent & 0x7FF) << 20) | sign
    u = (hi2.astype(np.uint64) << np.uint64(32)) | lo2.astype(np.uint64)
    return u.view(np.float64) if u.dtype == np.uint64 else \
        u.astype(np.uint64).view(np.float64)


_FMT_SIZE = {"BYTE": 1, "HALF": 2, "WORD": 2, "FULL": 4, "LONG": 4,
             "REAL": 4, "DOUB": 8, "COMP": 8, "COMPLEX": 8}


def read_vicar(path):
    """→ (array [nb, nl, ns], geotransform None, nodata None)."""
    lab = vicar_label(path)
    nl = int(lab.get("NL", 0))
    ns = int(lab.get("NS", 0))
    nb = int(lab.get("NB", 1))
    fmt = str(lab.get("FORMAT", "BYTE")).upper()
    org = str(lab.get("ORG", "BSQ")).upper()
    nlb = int(lab.get("NLB", 0))
    nbb = int(lab.get("NBB", 0))
    recsize = int(lab.get("RECSIZE", 0))
    intfmt = str(lab.get("INTFMT", "LOW")).upper()
    realfmt = str(lab.get("REALFMT", "VAX")).upper()
    compress = str(lab.get("COMPRESS", "NONE")).upper()
    lblsize = lab["_LBLSIZE"]
    if nl <= 0 or ns <= 0 or nb <= 0:
        raise ValueError("invalid VICAR dimensions")
    isize = _FMT_SIZE.get(fmt)
    if isize is None:
        raise NotImplementedError(f"VICAR FORMAT {fmt}")

    int_bo = "<" if intfmt == "LOW" else ">"
    real_bo = {"IEEE": ">", "RIEEE": "<", "VAX": "vax"}.get(realfmt, ">")
    if fmt in ("BYTE",):
        dt = np.dtype("u1")
    elif fmt in ("HALF", "WORD"):
        dt = np.dtype(int_bo + "i2")
    elif fmt in ("FULL", "LONG"):
        dt = np.dtype(int_bo + "i4")
    elif fmt == "REAL":
        dt = np.dtype((real_bo if real_bo != "vax" else "<") + "f4")
    elif fmt == "DOUB":
        dt = np.dtype((real_bo if real_bo != "vax" else "<") + "f8")
    else:                                    # COMP: 2×REAL
        dt = np.dtype((real_bo if real_bo != "vax" else "<") + "f4")

    with open(path, "rb") as f:
        data = f.read()

    # BIP stores one PIXEL per record (RECSIZE = NB × item, N1 = NB)
    nrec_img = {"BSQ": nl * nb, "BIL": nl * nb, "BIP": nl * ns}[org]

    if compress in ("BASIC", "BASIC2"):
        # one record per (band, line); sizes framed per vicardataset
        nrec = nb * nl
        lines = []
        if compress == "BASIC":
            off = lblsize
            for _ in range(nrec):
                size = int.from_bytes(data[off:off + 4], "little")
                lines.append(basic_decode(
                    data[off + 4:off + size], ns, isize))
                off += size
        else:
            sizes = np.frombuffer(
                data[lblsize:lblsize + 4 * nrec], "<u4")
            off = lblsize + 4 * nrec
            for s in sizes:
                lines.append(basic_decode(
                    data[off:off + int(s)], ns, isize))
                off += int(s)
        raw = b"".join(lines)
        arr = _decode_items(raw, fmt, dt, realfmt)
        arr = arr.reshape(nb, nl, ns)
    else:
        if recsize <= 0:
            recsize = nbb + ns * isize * (nb if org == "BIP" else 1)
        body = data[lblsize + nlb * recsize:]
        rows = []
        for r in range(nrec_img):
            rec = body[r * recsize + nbb:
                       r * recsize + nbb + (recsize - nbb)]
            rows.append(rec)
        raw = b"".join(rows)
        arr = _decode_items(raw, fmt, dt, realfmt)
        per = nb if org == "BIP" else ns
        arr = arr.reshape(nrec_img, -1)[:, :per]
        if org == "BSQ":
            arr = arr.reshape(nb, nl, ns)
        elif org == "BIL":
            arr = arr.reshape(nl, nb, ns).transpose(1, 0, 2)
        else:                                # BIP
            arr = arr.reshape(nl, ns, nb).transpose(2, 0, 1)
    return np.ascontiguousarray(arr), None, None


def _decode_items(raw: bytes, fmt: str, dt: np.dtype, realfmt: str):
    if fmt in ("REAL", "DOUB", "COMP") and realfmt == "VAX":
        u8 = np.frombuffer(raw, np.uint8)
        if fmt == "DOUB":
            n = len(u8) // 8 * 8
            return _vax_d_to_ieee(u8[:n])
        n = len(u8) // 4 * 4
        vals = _vax_f_to_ieee(u8[:n])
        if fmt == "COMP":
            return vals[0::2] + 1j * vals[1::2]
        return vals
    a = np.frombuffer(raw, dt, count=len(raw) // dt.itemsize)
    a = a.astype(dt.newbyteorder("="))
    if fmt == "COMP":
        return a[0::2] + 1j * a[1::2]
    return a
