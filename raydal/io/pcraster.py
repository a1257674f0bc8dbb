"""PCRaster CSF 2.0 raster reader/writer, from scratch.

Reference driver: ``frmts/pcraster/`` over ``libcsf`` (header layout
``libcsf/csf.h`` CSF_MAIN_HEADER/CSF_RASTER_HEADER with file offsets
``csfimpl.h``: main header at 0, raster header at 64, cells at 256).

Main header: 32-byte signature "RUU CROSS SYSTEM MAP FORMAT",
version u2, gisFileId u4, projection u2 (PT_YINCT2B=0 y-increases-
bottom-up / PT_YDECT2B=1), attrTable u4, mapType u2, byteOrder u4
(1 = little-endian).  Raster header: valueScale u2 (VS_* codes),
cellRepr u2 (CR_* codes), min/max as 8-byte cells, xUL/yUL f8,
nrRows/nrCols u4, cellSize f8 ×2, angle f8.

In-file missing values (MV_UINT1=255, MV_INT2=-32768, MV_INT4 all
bits, REAL4/8 all-ones NaN) are translated to the reference's nodata
per ``pcrasterutil.cpp missingValue()``: UINT1→255, INT4→
-2147483647, REAL4→float lowest.

Validated against ``autotest/gdrivers/pcraster.py``: ldd.map
checksum 4528, gt (182140, 10, 0, 327880, 0, -10), nodata 255, and
the CreateCopy round trip.
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["read_pcraster", "write_pcraster"]

_SIG = b"RUU CROSS SYSTEM MAP FORMAT"

# CR_* → (numpy dtype, in-file MV, exposed nodata)
_CELL_REPR = {
    0x00: ("u1", 255, 255.0),                       # CR_UINT1
    0x26: ("i4", -2147483648, -2147483647.0),       # CR_INT4
    0x5A: ("f4", None, float(np.finfo(np.float32).min)),  # CR_REAL4
    0x04: ("i1", -128, -128.0),                     # CR_INT1 (v1)
    0x15: ("i2", -32768, -32768.0),                 # CR_INT2 (v1)
    0x11: ("u2", 65535, 65535.0),                   # CR_UINT2 (v1)
    0x22: ("u4", 4294967295, 4294967295.0),         # CR_UINT4 (v1)
    0xDB: ("f8", None, float(np.finfo(np.float64).min)),  # CR_REAL8
}

# valueScale codes (csftypes.h)
VS_BOOLEAN, VS_NOMINAL, VS_ORDINAL = 0xE0, 0xE2, 0xF2
VS_SCALAR, VS_DIRECTION, VS_LDD = 0xEB, 0xFB, 0xF0


def read_pcraster(path):
    """CSF map → ``(array [1, h, w], geotransform, nodata)``."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:27] != _SIG:
        raise ValueError("not a PCRaster CSF map")
    byte_order = struct.unpack("<I", buf[46:50])[0]
    bo = "<" if byte_order == 1 else ">"
    u2 = lambda off: struct.unpack(bo + "H", buf[off:off + 2])[0]
    u4 = lambda off: struct.unpack(bo + "I", buf[off:off + 4])[0]
    f8 = lambda off: struct.unpack(bo + "d", buf[off:off + 8])[0]
    value_scale = u2(64)
    cell_repr = u2(66)
    if cell_repr not in _CELL_REPR:
        raise NotImplementedError(
            f"CSF cell representation {cell_repr:#x}")
    code, mv, nodata = _CELL_REPR[cell_repr]
    x_ul, y_ul = f8(84), f8(92)
    rows, cols = u4(100), u4(104)
    cell = f8(108)
    projection = u2(38)
    dt = np.dtype(bo + code)
    n = rows * cols
    a = np.frombuffer(buf, dt, count=n, offset=256).astype(
        dt.newbyteorder("="))
    a = a.reshape(rows, cols)
    if dt.kind == "f":
        # REAL4/8 MV is the all-ones bit pattern (a specific NaN)
        pat = np.frombuffer(
            b"\xff" * dt.itemsize, dt.newbyteorder("="))[0]
        is_mv = np.isnan(a)
        a = np.where(is_mv, np.array(nodata, a.dtype), a)
        _ = pat
    elif mv is not None:
        exposed = np.array(nodata).astype(a.dtype)
        a = np.where(a == np.array(mv).astype(a.dtype), exposed, a)
    # PT_YINCT2B (0): y increases bottom-up → flip rows so north is
    # first; yUL is then the bottom edge (pcrasterdataset.cpp)
    if projection == 0:
        gt = (x_ul, cell, 0.0, y_ul + rows * cell, 0.0, -cell)
        a = a[::-1]
    else:
        gt = (x_ul, cell, 0.0, y_ul, 0.0, -cell)
    return np.ascontiguousarray(a)[None], gt, nodata


def _infer_vs(dt):
    if dt.kind == "f":
        return VS_SCALAR, 0x5A
    if dt == np.uint8:
        return VS_NOMINAL, 0x00
    return VS_NOMINAL, 0x26


def write_pcraster(arr, gt, path=None, nodata=None, value_scale=None):
    """Raster → CSF 2.0 bytes/file (CreateCopy semantics: nodata
    cells are stored as the type's MV)."""
    a = np.asarray(arr)
    if a.ndim == 3:
        if a.shape[0] != 1:
            raise ValueError("CSF maps are single-band")
        a = a[0]
    vs, cr = _infer_vs(a.dtype)
    if value_scale is not None:
        vs = value_scale
    code, mv, exposed = _CELL_REPR[cr]
    dt = np.dtype("<" + code)
    data = a.astype(dt, copy=True)
    if nodata is not None:
        if dt.kind == "f":
            fill = np.frombuffer(b"\xff" * dt.itemsize, dt)[0]
        else:
            fill = np.array(mv).astype(dt)
        data = np.where(a == np.array(nodata).astype(a.dtype),
                        fill, data)
    rows, cols = data.shape
    valid = data
    if dt.kind == "f":
        valid = data[~np.isnan(data)]
    elif nodata is not None:
        valid = data[data != np.array(mv).astype(dt)]
    vmin = float(valid.min()) if valid.size else 0.0
    vmax = float(valid.max()) if valid.size else 0.0
    hdr = bytearray(256)
    hdr[:len(_SIG)] = _SIG
    struct.pack_into("<H", hdr, 32, 2)          # version
    struct.pack_into("<I", hdr, 34, 0)          # gisFileId
    struct.pack_into("<H", hdr, 38, 1)          # PT_YDECT2B
    struct.pack_into("<I", hdr, 40, 0)          # attrTable
    struct.pack_into("<H", hdr, 44, 1)          # mapType raster
    struct.pack_into("<I", hdr, 46, 1)          # little-endian
    struct.pack_into("<H", hdr, 64, vs)
    struct.pack_into("<H", hdr, 66, cr)
    # min/max stored as 8-byte cells of the repr, MV-padded
    mv_fill = b"\xff" * 8
    hdr[68:76] = mv_fill
    hdr[76:84] = mv_fill
    hdr[68:68 + dt.itemsize] = np.array(vmin).astype(dt).tobytes()
    hdr[76:76 + dt.itemsize] = np.array(vmax).astype(dt).tobytes()
    struct.pack_into("<d", hdr, 84, gt[0])      # xUL
    struct.pack_into("<d", hdr, 92, gt[3])      # yUL
    struct.pack_into("<I", hdr, 100, rows)
    struct.pack_into("<I", hdr, 104, cols)
    struct.pack_into("<d", hdr, 108, gt[1])
    struct.pack_into("<d", hdr, 116, gt[1])
    struct.pack_into("<d", hdr, 124, 0.0)       # angle
    out = bytes(hdr) + data.tobytes()
    if path is not None:
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(out)
        os.replace(tmp, path)
        return path
    return out
