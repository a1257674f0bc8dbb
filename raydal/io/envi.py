"""ENVI and ESRI EHdr raw-binary raster readers/writers.

ENVI (reference ``frmts/raw/envidataset.cpp``): ``ENVI`` magic header
with ``key = value`` pairs (``{…}`` values span lines), raw data laid
out by ``interleave`` (bsq/bil/bip) in the ``data type`` codes
(1=u8 2=i16 3=i32 4=f32 5=f64 6=c64 9=c128 12=u16 13=u32 14=i64
15=u64), ``byte order`` 0/1 (LSB/MSB), optional ``header offset`` and
gzip ``file compression = 1``; the geotransform comes from
``map info = {name, refx, refy, easting, northing, dx, dy, …}`` with
the 1-based reference pixel anchored at its top-left corner.

EHdr (reference ``frmts/raw/ehdrdataset.cpp``): ``.hdr`` sidecars in
both dialects — BIL-style ``NROWS/NCOLS/NBANDS/NBITS/BYTEORDER I|M/
LAYOUT/ULXMAP/ULYMAP/XDIM/YDIM/PIXELTYPE`` (UL map coords are the
CENTER of the top-left pixel) and GridFloat-style ``ncols/nrows/
cellsize/xllcorner/yllcorner/byteorder msbfirst`` (corner-anchored);
``.flt`` payloads default to float32 when 32-bit and untyped.

Validated against the published expectations: aea.dat checksum 14823
(plain + gzip-compressed), the envi_rgbsmall_* interleaving trio
matching rgbsmall.tif band-for-band, float32.bil checksum 27,
ehdr10.bil / ehdr11.flt checksum 8202 (autotest/gdrivers/envi.py,
ehdr.py).
"""

from __future__ import annotations

import gzip
import os
import re

import numpy as np

__all__ = ["read_envi", "write_envi", "read_ehdr", "write_ehdr"]

_DTYPES = {1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8", 6: "c8",
           9: "c16", 12: "u2", 13: "u4", 14: "i8", 15: "u8"}
_CODES = {np.dtype(v): k for k, v in
          ((k, np.dtype(("<" + v) if not v.startswith("c") else
                        {"c8": "<c8", "c16": "<c16"}[v]))
           for k, v in _DTYPES.items())}


def parse_envi_header(text):
    """ENVI header text → dict (lower-cased keys, ``{}`` unwrapped)."""
    if not text.lstrip().startswith("ENVI"):
        raise ValueError("not an ENVI header (missing ENVI magic)")
    body = text.lstrip()[4:]
    out = {}
    pos = 0
    for m in re.finditer(r"^\s*([A-Za-z][A-Za-z0-9 _]*?)\s*=\s*",
                         body, re.M):
        key = m.group(1).strip().lower()
        rest = body[m.end():]
        if rest.startswith("{"):
            val = rest[1:rest.index("}")]
        else:
            val = rest.split("\n", 1)[0]
        out[key] = " ".join(val.split())
        pos = m.end()
    _ = pos
    return out


def _interleave(flat, h, w, nb, order):
    if order == "bsq":
        return flat.reshape(nb, h, w)
    if order == "bil":
        return flat.reshape(h, nb, w).transpose(1, 0, 2)
    if order == "bip":
        return flat.reshape(h, w, nb).transpose(2, 0, 1)
    raise ValueError(f"unknown interleave {order!r}")


def _map_info_gt(hdr):
    mi = hdr.get("map info")
    if not mi:
        return None
    f = [v.strip() for v in mi.split(",")]
    refx, refy = float(f[1]), float(f[2])
    east, north = float(f[3]), float(f[4])
    dx, dy = float(f[5]), float(f[6])
    return (east - (refx - 1) * dx, dx, 0.0,
            north + (refy - 1) * dy, 0.0, -dy)


def read_envi(hdr, data=None):
    """ENVI header path/text (+ optional raw data bytes) →
    (bands array (nb, h, w), geotransform_or_None, header dict)."""
    if data is None:
        with open(hdr) as f:
            text = f.read()
        base = hdr[:-4] if hdr.endswith(".hdr") else hdr
        for ext in ("", ".dat", ".img", ".bil", ".raw", ".bsq", ".bin"):
            if os.path.exists(base + ext) and base + ext != hdr:
                with open(base + ext, "rb") as f:
                    data = f.read()
                break
        if data is None:
            raise FileNotFoundError(f"no data file beside {hdr}")
    else:
        text = hdr if isinstance(hdr, str) else hdr.decode("ascii")
    h = parse_envi_header(text)
    w = int(h["samples"])
    rows = int(h["lines"])
    nb = int(h.get("bands", 1))
    code = int(h["data type"])
    if code not in _DTYPES:
        raise ValueError(f"unsupported ENVI data type {code}")
    off = int(h.get("header offset", 0))
    if int(h.get("file compression", 0)) == 1:
        data = gzip.decompress(data[off:])
        off = 0
    endian = ">" if int(h.get("byte order", 0)) == 1 else "<"
    dt = np.dtype(endian + _DTYPES[code])
    n = w * rows * nb
    flat = np.frombuffer(data, dt, count=n, offset=off)
    arr = _interleave(flat, rows, w, nb,
                      h.get("interleave", "bsq").lower())
    return np.ascontiguousarray(arr), _map_info_gt(h), h


def write_envi(bands, geotransform=None, interleave="bsq",
               hdr_path=None, data_path=None):
    """(nb, h, w) array → (header text, raw bytes); writes the pair
    when paths are given."""
    a = np.asarray(bands)
    if a.ndim == 2:
        a = a[None]
    nb, rows, w = a.shape
    dt = a.dtype.newbyteorder("<")
    code = _CODES.get(np.dtype(dt.str.lstrip("<=|")))
    if code is None:
        code = _CODES.get(dt)
    if code is None:
        raise ValueError(f"unsupported dtype {a.dtype}")
    if interleave == "bsq":
        raw = np.ascontiguousarray(a.astype(dt)).tobytes()
    elif interleave == "bil":
        raw = np.ascontiguousarray(
            a.astype(dt).transpose(1, 0, 2)).tobytes()
    elif interleave == "bip":
        raw = np.ascontiguousarray(
            a.astype(dt).transpose(1, 2, 0)).tobytes()
    else:
        raise ValueError(f"unknown interleave {interleave!r}")
    lines = ["ENVI", "description = {raydal export}",
             f"samples = {w}", f"lines   = {rows}", f"bands   = {nb}",
             "header offset = 0", "file type = ENVI Standard",
             f"data type = {code}", f"interleave = {interleave}",
             "byte order = 0"]
    if geotransform is not None:
        x0, dx, _, y0, _, dy = geotransform
        lines.append(f"map info = {{raydal, 1, 1, {x0!r}, {y0!r}, "
                     f"{dx!r}, {abs(dy)!r}}}")
    text = "\n".join(lines) + "\n"
    if hdr_path:
        with open(hdr_path, "w") as f:
            f.write(text)
    if data_path:
        with open(data_path, "wb") as f:
            f.write(raw)
    return text, raw


# ---------------------------------------------------------------- EHdr

def read_ehdr(hdr, data=None, float_hint=False):
    """EHdr ``.hdr`` path/text (+ optional raw bytes) →
    (bands (nb, h, w), geotransform, nodata_or_None).

    ``float_hint`` forces float32 for untyped 32-bit payloads (the
    reference keys this off the ``.flt`` extension)."""
    if data is None:
        with open(hdr) as f:
            text = f.read()
        base = os.path.splitext(hdr)[0]
        for ext in (".bil", ".flt", ".img", ".dat", ".raw", ".bsq"):
            if os.path.exists(base + ext):
                with open(base + ext, "rb") as f:
                    data = f.read()
                if ext == ".flt":
                    float_hint = True
                break
        if data is None:
            raise FileNotFoundError(f"no data file beside {hdr}")
    else:
        text = hdr if isinstance(hdr, str) else hdr.decode("ascii")
    kv = {}
    for ln in text.splitlines():
        parts = ln.split(None, 1)
        if len(parts) == 2:
            kv[parts[0].lower()] = parts[1].strip()
    if "nrows" not in kv or "ncols" not in kv:
        raise ValueError("not an EHdr header (missing nrows/ncols)")
    rows, w = int(kv["nrows"]), int(kv["ncols"])
    nb = int(kv.get("nbands", 1))
    ptype = kv.get("pixeltype", "").upper()
    nod = kv.get("nodata", kv.get("nodata_value"))
    nbits = int(kv["nbits"]) if "nbits" in kv else None
    if nbits is None and not ptype:
        # size-based inference (ehdrdataset.cpp:1149): ≥4 bytes/pixel
        # is assumed floating point
        bpp = len(data) // (rows * w * nb) if rows * w * nb else 0
        if bpp > 0 and bpp != 3:
            nbits = bpp * 8
        if bpp == 4:
            ptype = "FLOAT"
    if ptype == "" and float_hint:
        ptype = "FLOAT"
    if ptype == "" and nod is not None and float(nod) < 0:
        ptype = "SIGNEDINT"         # worldclim convention (:1175)
    if nbits is None:
        nbits = 32 if ptype == "FLOAT" else 8
    if nbits == 8:
        base_dt = "i1" if ptype == "SIGNEDINT" else "u1"
    elif nbits == 16:
        base_dt = "i2" if ptype == "SIGNEDINT" else "u2"
    elif nbits == 32:
        base_dt = "f4" if ptype == "FLOAT" else \
            ("i4" if ptype == "SIGNEDINT" else "u4")
    else:
        raise ValueError(f"unsupported NBITS {nbits}")
    bo = kv.get("byteorder", "I").lower()
    endian = ">" if bo in ("m", "msbfirst") else "<"
    dt = np.dtype(endian + base_dt)
    flat = np.frombuffer(data, dt, count=rows * w * nb,
                         offset=int(kv.get("skipbytes", 0)))
    arr = _interleave(flat, rows, w, nb,
                      kv.get("layout", "bil").lower())
    if "ulxmap" in kv:
        dx = float(kv.get("xdim", 1))
        dy = float(kv.get("ydim", 1))
        gt = (float(kv["ulxmap"]) - dx / 2, dx, 0.0,
              float(kv["ulymap"]) + dy / 2, 0.0, -dy)
    elif "xllcorner" in kv:
        cs = float(kv.get("cellsize", 1))
        gt = (float(kv["xllcorner"]), cs, 0.0,
              float(kv["yllcorner"]) + rows * cs, 0.0, -cs)
    else:
        gt = (0.0, 1.0, 0.0, float(rows), 0.0, -1.0)
    return (np.ascontiguousarray(arr), gt,
            float(nod) if nod is not None else None)


def write_ehdr(bands, geotransform, nodata=None, hdr_path=None,
               data_path=None):
    """(nb, h, w) array → (BIL-dialect header text, raw BIL bytes)."""
    a = np.asarray(bands)
    if a.ndim == 2:
        a = a[None]
    nb, rows, w = a.shape
    kind = a.dtype.kind
    if kind == "f":
        dt, nbits, ptype = "<f4", 32, "FLOAT"
    elif kind == "i":
        dt, nbits, ptype = ("<i2", 16, "SIGNEDINT") if \
            a.dtype.itemsize <= 2 else ("<i4", 32, "SIGNEDINT")
    else:
        dt, nbits, ptype = {1: ("<u1", 8, "UNSIGNEDINT"),
                            2: ("<u2", 16, "UNSIGNEDINT")}.get(
            a.dtype.itemsize, ("<u4", 32, "UNSIGNEDINT"))
    raw = np.ascontiguousarray(
        a.astype(np.dtype(dt)).transpose(1, 0, 2)).tobytes()
    x0, dx, _, y0, _, dy = geotransform
    lines = ["BYTEORDER      I", "LAYOUT         BIL",
             f"NROWS          {rows}", f"NCOLS          {w}",
             f"NBANDS         {nb}", f"NBITS          {nbits}",
             f"PIXELTYPE      {ptype}",
             f"ULXMAP         {x0 + dx / 2!r}",
             f"ULYMAP         {y0 + dy / 2!r}",
             f"XDIM           {dx!r}", f"YDIM           {abs(dy)!r}"]
    if nodata is not None:
        lines.append(f"NODATA         {nodata!r}")
    text = "\n".join(lines) + "\n"
    if hdr_path:
        with open(hdr_path, "w") as f:
            f.write(text)
    if data_path:
        with open(data_path, "wb") as f:
            f.write(raw)
    return text, raw
