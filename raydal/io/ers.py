"""ERMapper ERS raster driver, from scratch on the published header
grammar.

Reference semantics (``frmts/ers/ersdataset.cpp``): nested
``Block Begin``/``Block End`` ASCII header with ``Key = Value`` lines
(dotted lookups like ``RasterInfo.CellInfo.Xdimension``), '#'
comments outside quotes and ``{ ... }`` multi-line values; raw BIL
data in the sibling file named like the .ers minus its extension
(or ``DataFile``), byte order from ``ByteOrder``; cell types per the
CellType ladder (:953-975); geotransform from
RegistrationCoord Eastings/Northings (or DMS Latitude/Longitude via
ERSDMS2Dec, :572-598) minus RegistrationCellX/Y cell offsets
(:1195-1205); ``NullCellValue`` as nodata; per-region Stats surfaced
as STATISTICS_* metadata.

Published parity (``autotest/gdrivers/ers.py``): srtm.ers = 64074
with the exact STATISTICS_* metadata dict (test_ers_1), ers_dem.ers
= 56588 with gt (143.59625, 0.025, 0, -39.38125, 0, -0.025)
(test_ers_4), Int8 CellType (test_ers_5), float32.bil/rgbsmall
CreateCopy round-trips 27 / 21053 (test_ers_2/3).
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = ["read_ers", "write_ers"]

_CELL_TYPES = {
    "unsigned8bitinteger": np.uint8,
    "signed8bitinteger": np.int8,
    "unsigned16bitinteger": np.uint16,
    "signed16bitinteger": np.int16,
    "unsigned32bitinteger": np.uint32,
    "signed32bitinteger": np.int32,
    "ieee4bytereal": np.float32,
    "ieee8bytereal": np.float64,
}
_TYPE_NAMES = {
    np.dtype(np.uint8): "Unsigned8BitInteger",
    np.dtype(np.int8): "Signed8BitInteger",
    np.dtype(np.uint16): "Unsigned16BitInteger",
    np.dtype(np.int16): "Signed16BitInteger",
    np.dtype(np.uint32): "Unsigned32BitInteger",
    np.dtype(np.int32): "Signed32BitInteger",
    np.dtype(np.float32): "IEEE4ByteReal",
    np.dtype(np.float64): "IEEE8ByteReal",
}


def _preprocess(text):
    """One char-level pass: drop '#' comments outside quotes
    (honouring backslash escapes), and join brace-continued values
    onto one line (quote-aware brace counting)."""
    out = []
    q = False
    esc = False
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if esc:
            out.append(ch)
            esc = False
        elif ch == "\\" and q:
            out.append(ch)
            esc = True
        elif ch == '"':
            q = not q
            out.append(ch)
        elif ch == "#" and not q:
            while i < n and text[i] != "\n":
                i += 1
            continue
        elif ch == "{" and not q:
            depth += 1
            out.append(ch)
        elif ch == "}" and not q:
            depth -= 1
            out.append(ch)
        elif ch == "\n" and (q or depth > 0):
            out.append(" ")             # continue the logical line
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _dms2dec(s):
    toks = s.split(":")
    if len(toks) != 3:
        return float(s)
    v = abs(float(toks[0])) + float(toks[1]) / 60 + float(toks[2]) / 3600
    return -v if float(toks[0]) < 0 else v


def parse_ers_header(text):
    """ERS header text → flat dict of dotted keys (case preserved in
    values, keys lowercased)."""
    joined = _preprocess(text).splitlines()
    kv = {}
    stack = []
    for ln in joined:
        s = ln.strip()
        if not s:
            continue
        m = re.match(r"(\w+)\s+Begin\b", s, re.I)
        if m:
            stack.append(m.group(1))
            continue
        m = re.match(r"(\w+)\s+End\b", s, re.I)
        if m:
            if stack:
                stack.pop()
            continue
        if "=" in s:
            k, v = s.split("=", 1)
            v = v.strip()
            if v.startswith("{"):
                v = v.strip("{} \t")
            v = v.strip().strip('"')
            path = ".".join(
                [p for p in stack if p.lower() != "datasetheader"]
                + [k.strip()])
            kv[path.lower()] = v
    return kv


def read_ers(path):
    """``.ers`` header + sibling raw file → (array[bands, h, w],
    geotransform, nodata) plus the Stats in the 4th slot when
    present."""
    with open(path, encoding="latin-1") as f:
        kv = parse_ers_header(f.read())
    nx = int(kv["rasterinfo.nrofcellsperline"])
    ny = int(kv["rasterinfo.nroflines"])
    nb = int(kv.get("rasterinfo.nrofbands", "1"))
    dt = np.dtype(_CELL_TYPES[
        kv.get("rasterinfo.celltype",
               "Unsigned8BitInteger").lower()])
    bo = ">" if kv.get("byteorder", "LSBFirst").lower() == "msbfirst" \
        else "<"
    dt = dt.newbyteorder(bo)
    off = int(kv.get("headeroffset", "0"))

    datafile = kv.get("datafile")
    if datafile:
        raw_path = os.path.join(os.path.dirname(path), datafile)
    else:
        raw_path = os.path.splitext(path)[0]
    with open(raw_path, "rb") as f:
        buf = f.read()
    need = nx * ny * nb * dt.itemsize
    if len(buf) - off < need:       # short file: zero-fill the tail
        # (the reference's RawRasterBand reads lazily and only errors
        # on access past EOF; whole-array semantics pad instead)
        buf = buf + b"\x00" * (need - (len(buf) - off))
    arr = np.frombuffer(buf, dt, count=nx * ny * nb, offset=off) \
        .reshape(ny, nb, nx).transpose(1, 0, 2)   # BIL

    gt = None
    if "rasterinfo.registrationcoord.eastings" in kv:
        x0 = float(kv["rasterinfo.registrationcoord.eastings"])
        y0 = float(kv["rasterinfo.registrationcoord.northings"])
    elif "rasterinfo.registrationcoord.latitude" in kv:
        x0 = _dms2dec(kv["rasterinfo.registrationcoord.longitude"])
        y0 = _dms2dec(kv["rasterinfo.registrationcoord.latitude"])
    else:
        x0 = None
    if x0 is not None:
        dx = float(kv.get("rasterinfo.cellinfo.xdimension", "1"))
        dy = float(kv.get("rasterinfo.cellinfo.ydimension", "1"))
        cellx = float(kv.get("rasterinfo.registrationcellx", "0"))
        celly = float(kv.get("rasterinfo.registrationcelly", "0"))
        gt = (x0 - cellx * dx, dx, 0.0,
              y0 - celly * -dy, 0.0, -dy)
    nodata = None
    if "rasterinfo.nullcellvalue" in kv:
        nodata = float(kv["rasterinfo.nullcellvalue"])

    stats = {}
    for src, dst in (("minimumvalue", "STATISTICS_MINIMUM"),
                     ("maximumvalue", "STATISTICS_MAXIMUM"),
                     ("meanvalue", "STATISTICS_MEAN"),
                     ("medianvalue", "STATISTICS_MEDIAN")):
        k = f"rasterinfo.regioninfo.stats.{src}"
        if k in kv:
            stats[dst] = kv[k].strip()
    return np.ascontiguousarray(arr), gt, nodata, stats


def write_ers(arr, geotransform, path, nodata=None):
    """array[bands, h, w] + geotransform → .ers header + raw BIL."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[None]
    nb, ny, nx = a.shape
    dt = np.dtype(a.dtype).newbyteorder("=")
    if dt not in _TYPE_NAMES:
        raise ValueError(f"ERS cannot store dtype {dt}")
    gt = geotransform
    hdr = ["DatasetHeader Begin",
           '\tVersion = "6.0"',
           "\tDataSetType\t= ERStorage",
           "\tDataType\t= Raster",
           "\tByteOrder\t= LSBFirst",
           "\tRasterInfo Begin",
           f"\t\tCellType\t= {_TYPE_NAMES[dt]}"]
    if nodata is not None:
        hdr.append(f"\t\tNullCellValue\t= {nodata:.15g}")
    if gt is not None:
        hdr += ["\t\tCellInfo Begin",
                f"\t\t\tXdimension\t= {abs(gt[1]):.15g}",
                f"\t\t\tYdimension\t= {abs(gt[5]):.15g}",
                "\t\tCellInfo End"]
    hdr += [f"\t\tNrOfLines\t= {ny}",
            f"\t\tNrOfCellsPerLine\t= {nx}"]
    if gt is not None:
        hdr += ["\t\tRegistrationCoord Begin",
                f"\t\t\tEastings\t= {gt[0]:.15g}",
                f"\t\t\tNorthings\t= {gt[3]:.15g}",
                "\t\tRegistrationCoord End"]
    hdr += [f"\t\tNrOfBands\t= {nb}",
            "\tRasterInfo End",
            "DatasetHeader End"]
    with open(path, "w") as f:
        f.write("\n".join(hdr) + "\n")
    raw = os.path.splitext(path)[0]
    with open(raw, "wb") as f:
        f.write(np.ascontiguousarray(
            a.transpose(1, 0, 2)).astype(dt.newbyteorder("<"))
            .tobytes())
    return path
