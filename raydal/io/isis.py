"""USGS ISIS3 cube and ISIS2 qube readers, from scratch on the
published PVL / PDS-label grammars.

Reference semantics:

* **ISIS3** (``frmts/pds/isis3dataset.cpp``): PVL label —
  ``Object =`` / ``Group =`` nesting with ``End_Object``/
  ``End_Group`` — whose ``IsisCube.Core`` carries StartByte (1-based),
  an optional detached ``^Core`` file, Format ``Tile`` (TileSamples ×
  TileLines tiles, row-major over the padded tile grid, per band) or
  ``BandSequential``, Dimensions, and Pixels Type
  (UnsignedByte/SignedWord/UnsignedWord/Real) + ByteOrder
  (Lsb/Msb) + Base/Multiplier (surfaced as scale/offset, values
  stay raw).
* **ISIS2** (``frmts/pds/isis2dataset.cpp``): PDS-style label with
  ``^QUBE`` record pointer (× RECORD_BYTES), ``CORE_ITEMS =
  (samples, lines, bands)``, CORE_ITEM_BYTES and CORE_ITEM_TYPE
  (SUN_* big-endian / PC_* little-endian, *_REAL float,
  *_INTEGER/_UNSIGNED_INTEGER ints), CORE_BASE/CORE_MULTIPLIER.

Published parity (``autotest/gdrivers/isis.py`` / ``isis2.py``):
isis3_unit_test.cub = 42403 (tiled SignedWord),
isis3_detached.lbl = 9978 (detached BandSequential),
arvidson_original_truncated.cub = 382 (SUN_REAL qube).
"""

from __future__ import annotations

import os
import re

import numpy as np

from .pds import _parse_label

__all__ = ["read_isis3", "read_isis2"]

_ISIS3_TYPES = {
    "unsignedbyte": "u1", "signedbyte": "i1",
    "unsignedword": "u2", "signedword": "i2",
    "unsignedinteger": "u4", "signedinteger": "i4",
    "real": "f4", "double": "f8",
}


def _parse_pvl(text):
    """PVL label → dict of dotted lowercase keys."""
    kv = {}
    stack = []
    end = re.search(r"^\s*End\s*$", text, re.M)
    if end:
        text = text[:end.start()]
    for ln in text.splitlines():
        s = ln.split("#")[0].strip()
        if not s:
            continue
        if "=" in s:
            k, v = s.split("=", 1)
            k, v = k.strip(), v.strip()
            if k.lower() in ("object", "group"):
                stack.append(v)
                continue
            v = re.sub(r"<[^>]*>\s*$", "", v).strip().strip('"')
            kv[".".join(stack + [k]).lower()] = v
        elif s.lower() in ("end_object", "end_group"):
            if stack:
                stack.pop()
    return kv


def read_isis3(path):
    """ISIS3 .cub / detached .lbl → (array[bands, h, w],
    None, None, {scale, offset})."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)
    kv = _parse_pvl(head.decode("latin-1", "replace"))
    pre = "isiscube.core."
    if pre + "dimensions.samples" not in kv:
        raise ValueError("not an ISIS3 cube label")
    nx = int(kv[pre + "dimensions.samples"])
    ny = int(kv[pre + "dimensions.lines"])
    nb = int(kv[pre + "dimensions.bands"])
    start = int(kv.get(pre + "startbyte", "1")) - 1
    fmt = kv.get(pre + "format", "BandSequential").lower()
    ptype = kv[pre + "pixels.type"].lower()
    bo = "<" if kv.get(pre + "pixels.byteorder",
                       "Lsb").lower() == "lsb" else ">"
    dt = np.dtype(bo + _ISIS3_TYPES[ptype])
    meta = {"scale": float(kv.get(pre + "pixels.multiplier", "1")),
            "offset": float(kv.get(pre + "pixels.base", "0"))}

    core = kv.get(pre + "^core")
    if core:
        data_path = os.path.join(os.path.dirname(path), core)
        with open(data_path, "rb") as f:
            buf = f.read()
    else:
        with open(path, "rb") as f:
            buf = f.read()

    if fmt == "tile":
        tw = int(kv[pre + "tilesamples"])
        th = int(kv[pre + "tilelines"])
        ntx = (nx + tw - 1) // tw
        nty = (ny + th - 1) // th
        arr = np.empty((nb, ny, nx), dt)
        pos = start
        tile_n = tw * th
        for b in range(nb):
            for ty in range(nty):
                for tx in range(ntx):
                    t = np.frombuffer(buf, dt, count=tile_n,
                                      offset=pos).reshape(th, tw)
                    pos += tile_n * dt.itemsize
                    h = min(th, ny - ty * th)
                    w = min(tw, nx - tx * tw)
                    arr[b, ty * th:ty * th + h,
                        tx * tw:tx * tw + w] = t[:h, :w]
    else:                                # BandSequential
        arr = np.frombuffer(buf, dt, count=nx * ny * nb,
                            offset=start).reshape(nb, ny, nx)
    return np.ascontiguousarray(arr), None, None, meta


def read_isis2(path):
    """ISIS2 qube → (array[bands, h, w], None, None,
    {scale, offset})."""
    with open(path, "rb") as f:
        buf = f.read()
    kv, _units = _parse_label(buf)
    if "^qube" not in kv:
        raise ValueError("not an ISIS2 qube label")
    record_bytes = int(float(kv.get("record_bytes", "512")))
    offset = (int(float(kv["^qube"])) - 1) * record_bytes

    items = kv["qube.core_items"].strip("()")
    nx, ny, nb = [int(t) for t in items.split(",")]
    ib = int(kv["qube.core_item_bytes"])
    ctype = kv.get("qube.core_item_type", "SUN_INTEGER").upper()
    bo = "<" if ctype.startswith(("PC", "LSB", "VAX")) else ">"
    if "REAL" in ctype:
        dt = np.dtype(f"{bo}f{ib}")
    elif "UNSIGNED" in ctype:
        dt = np.dtype(f"{bo}u{ib}")
    else:
        dt = np.dtype(f"{bo}i{ib}")
    meta = {"scale": float(kv.get("qube.core_multiplier", "1")),
            "offset": float(kv.get("qube.core_base", "0"))}
    n = nx * ny * nb
    avail = (len(buf) - offset) // dt.itemsize
    flat = np.frombuffer(buf, dt, count=min(n, avail), offset=offset)
    if len(flat) < n:                   # truncated fixture: zero-pad
        flat = np.concatenate([flat, np.zeros(n - len(flat), dt)])
    return (np.ascontiguousarray(flat.reshape(nb, ny, nx)),
            None, None, meta)
