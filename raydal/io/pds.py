"""NASA PDS3 planetary image reader, from scratch on the published
ODL label grammar.

Reference semantics (``frmts/pds/pdsdataset.cpp``): ``KEY = VALUE``
label (units in ``<...>``), OBJECT/END_OBJECT nesting prefixing keys
(IMAGE.*, IMAGE_MAP_PROJECTION.*), ``^IMAGE`` pointer as a 1-based
RECORD_BYTES record number or a ``<BYTES>`` offset; SAMPLE_TYPE
MSB/LSB integer + IEEE/PC real ladder with SAMPLE_BITS;
BAND_STORAGE_TYPE BAND_SEQUENTIAL / LINE_INTERLEAVED /
SAMPLE_INTERLEAVED; MISSING / MISSING_CONSTANT / NULL → nodata;
SCALING_FACTOR/OFFSET surfaced as band scale/offset metadata (values
stay raw); geotransform from MAP_SCALE (KM default ×1000, CM ÷100,
pdsdataset.cpp:305-341) with
``ULX = (SAMPLE_PROJECTION_OFFSET + shift) * dim * -1`` and
``ULY = (LINE_PROJECTION_OFFSET + shift) * dim`` per the
PDS_*ProjOffset_Shift/Mult options (:355-392).

Published parity (``autotest/gdrivers/pds.py``):
mc02_truncated.img = 47151 (+ its published gt at shift −0.5),
fl73n003_truncated.img = 34962 with nodata 7 / scale 0.2 / offset
−20.2, EN0001426030M_truncated.IMG = 1367 (MSB 16-bit).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["read_pds"]

_TYPES = {
    ("msb", 8): ">u1", ("msb", 16): ">u2", ("msb", 32): ">u4",
    ("lsb", 8): "<u1", ("lsb", 16): "<u2", ("lsb", 32): "<u4",
}


def _parse_label(buf):
    """PDS label bytes → dict of dotted keys (lowercased) plus the
    raw unit strings in a parallel dict."""
    text = buf.decode("latin-1", "replace")
    end = re.search(r"^\s*END\s*$", text, re.M)
    if end:
        text = text[:end.start()]
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    kv, units = {}, {}
    stack = []
    pending_key = None
    for ln in text.splitlines():
        s = ln.strip()
        if not s:
            continue
        if pending_key is not None:     # continuation of a quoted value
            kv[pending_key] += " " + s.strip()
            if s.count('"') % 2 == 1:
                kv[pending_key] = kv[pending_key].strip('"')
                pending_key = None
            continue
        if "=" not in s:
            continue
        k, v = s.split("=", 1)
        k, v = k.strip(), v.strip()
        if k.upper() == "OBJECT":
            stack.append(v.upper())
            continue
        if k.upper() == "END_OBJECT":
            if stack:
                stack.pop()
            continue
        m = re.match(r"(.*?)\s*<([^>]*)>\s*$", v)
        unit = None
        if m:
            v, unit = m.group(1).strip(), m.group(2)
        path = ".".join(stack + [k]).lower()
        if v.startswith('"') and v.count('"') == 1:
            kv[path] = v[1:]
            pending_key = path
            continue
        kv[path] = v.strip('"').strip()
        if unit is not None:
            units[path] = unit
    return kv, units


def read_pds(src, sample_shift=0.5, line_shift=0.5):
    """PDS3 .img (path or bytes) → (array[bands, h, w],
    geotransform or None, nodata, meta{scale, offset})."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    kv, units = _parse_label(buf)
    if kv.get("pds_version_id", "").upper() not in ("PDS3", "PDS2",
                                                    "PDS1"):
        raise ValueError("not a PDS label")

    record_bytes = int(float(kv.get("record_bytes", "0")))
    img_ptr = kv.get("^image")
    if img_ptr is None:
        raise ValueError("label has no ^IMAGE pointer")
    if units.get("^image", "").upper() == "BYTES":
        offset = int(float(img_ptr)) - 1
    else:
        offset = (int(float(img_ptr)) - 1) * record_bytes

    nx = int(kv["image.line_samples"])
    ny = int(kv["image.lines"])
    nb = int(kv.get("image.bands", "1"))
    stype = kv.get("image.sample_type", "UNSIGNED_INTEGER").upper()
    bits = int(kv.get("image.sample_bits", "8"))
    if "IEEE_REAL" in stype or stype in ("FLOAT", "REAL"):
        dt = np.dtype(">f4" if bits == 32 else ">f8")
    elif "PC_REAL" in stype:
        dt = np.dtype("<f4" if bits == 32 else "<f8")
    else:
        endian = "lsb" if stype.startswith(("LSB", "PC",
                                            "VAX")) else "msb"
        dt = np.dtype(_TYPES[(endian, bits)])
        if "UNSIGNED" not in stype:
            dt = np.dtype(dt.str.replace("u", "i"))

    n = nx * ny * nb
    flat = np.frombuffer(buf, dt, count=n, offset=offset)
    storage = kv.get("image.band_storage_type",
                     "BAND_SEQUENTIAL").upper()
    if nb == 1 or "SEQUENTIAL" in storage:
        arr = flat.reshape(nb, ny, nx)
    elif "LINE" in storage:
        arr = flat.reshape(ny, nb, nx).transpose(1, 0, 2)
    else:                               # SAMPLE_INTERLEAVED
        arr = flat.reshape(ny, nx, nb).transpose(2, 0, 1)

    nodata = None
    for key in ("image.missing", "image.missing_constant",
                "image.null"):
        if key in kv:
            try:
                nodata = float(kv[key])
                break
            except ValueError:
                pass
    meta = {}
    if "image.scaling_factor" in kv:
        meta["scale"] = float(kv["image.scaling_factor"])
    if "image.offset" in kv:
        meta["offset"] = float(kv["image.offset"])

    gt = None
    pfx = "image_map_projection."
    if pfx + "map_scale" in kv:
        dim = float(kv[pfx + "map_scale"])
        unit = units.get(pfx + "map_scale", "").split("/")[0].upper()
        if unit in ("M", "METER", "METERS"):
            pass
        elif unit == "CM":
            dim /= 100.0
        else:                            # PDS default: km → m
            dim *= 1000.0
        xoff = float(kv.get(pfx + "sample_projection_offset", "0"))
        yoff = float(kv.get(pfx + "line_projection_offset", "0"))
        gt = ((xoff + sample_shift) * dim * -1.0, dim, 0.0,
              (yoff + line_shift) * dim, 0.0, -dim)
    return np.ascontiguousarray(arr), gt, nodata, meta
