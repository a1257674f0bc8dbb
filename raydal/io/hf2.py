"""HF2/HFZ heightfield driver, from scratch on the published layout.

Reference semantics (``frmts/hf2/hf2dataset.cpp``): 28-byte header —
``HF2\\0`` + version u16, width/height i32, tile size u16 (≥8),
vertical precision f32, horizontal scale f32, extended-header length
u32 — then ``bin\\0``-tagged extended blocks (``georef-extents``
carries minX/maxX/minY/maxY doubles, hf2dataset.cpp:930-940 writer /
:214-250 reader), then tiles bottom-up row-major.  Each tile: scale +
offset f32, then per tile row (bottom-up): a word-size byte (1/2/4),
an i32 first value, and (width−1) signed deltas of that word size;
value = n*scale + offset (IReadBlock, hf2dataset.cpp:110-250).  The
writer quantizes integer sources through the Int16 path (scale 1,
offset 0) and float sources per tile with
``scale=(max-min)/((max-min)/vertpres)``, offset=min, C float
TRUNCATION to int (CreateCopy, hf2dataset.cpp:990-1110); ``.hfz`` is
the whole stream gzipped.

Published parity: byte.tif and n43.dt0 CreateCopy round-trips keep
checksums 4672 / 49187 (``autotest/gdrivers/hf2.py`` test_hf2_1/2/4),
including the COMPRESS=YES BLOCKSIZE=10 variant.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

__all__ = ["read_hf2", "write_hf2"]


def read_hf2(src):
    """HF2/HFZ file (path or bytes) → (array[1, h, w] float32
    north-up, geotransform or None, None)."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    if buf[:4] != b"HF2\x00":
        raise ValueError("not an HF2 file")
    nx, ny = struct.unpack_from("<ii", buf, 6)
    tile = struct.unpack_from("<H", buf, 14)[0]
    _vertpres, _hscale = struct.unpack_from("<2f", buf, 16)
    extlen = struct.unpack_from("<I", buf, 24)[0]

    gt = None
    pos = 28
    end_ext = 28 + extlen
    while pos < end_ext:
        name = buf[pos + 4:pos + 20].rstrip(b"\x00").decode("ascii",
                                                            "replace")
        size = struct.unpack_from("<I", buf, pos + 20)[0]
        body = buf[pos + 24:pos + 24 + size]
        if name == "georef-extents" and size == 34:
            minx, maxx, miny, maxy = struct.unpack_from("<4d", body, 2)
            gt = (minx, (maxx - minx) / nx, 0.0,
                  maxy, 0.0, (miny - maxy) / ny)
        pos += 24 + size

    arr = np.zeros((ny, nx), np.float32)
    nxb = (nx + tile - 1) // tile
    nyb = (ny + tile - 1) // tile
    pos = end_ext
    for j in range(nyb):            # tile rows, bottom-up
        for i in range(nxb):
            scale, off = struct.unpack_from("<2f", buf, pos)
            pos += 8
            w = min(tile, nx - i * tile)
            h = min(tile, ny - j * tile)
            for k in range(h):      # tile-internal rows, bottom-up
                ws = buf[pos]
                pos += 1
                val = struct.unpack_from("<i", buf, pos)[0]
                pos += 4
                dt = {1: "<i1", 2: "<i2", 4: "<i4"}[ws]
                diffs = np.frombuffer(buf, dt, count=w - 1,
                                      offset=pos).astype(np.int64)
                pos += (w - 1) * ws
                vals = np.empty(w, np.int64)
                vals[0] = val
                if w > 1:
                    vals[1:] = val + np.cumsum(diffs)
                row_from_bottom = j * tile + k
                arr[ny - 1 - row_from_bottom,
                    i * tile:i * tile + w] = \
                    (vals * np.float64(np.float32(scale))
                     + np.float32(off)).astype(np.float32)
    return arr[None], gt, None


def _encode_rows(out, ivals):
    """Per-row best word size + first value + deltas (CreateCopy
    loop).  ``ivals``: int array rows already bottom-up."""
    for row in ivals:
        diffs = np.diff(row)
        if len(diffs) and (diffs.max(initial=0) > 32767
                           or diffs.min(initial=0) < -32768):
            ws, dt = 4, "<i4"
        elif len(diffs) and (diffs.max(initial=0) > 127
                             or diffs.min(initial=0) < -128):
            ws, dt = 2, "<i2"
        else:
            ws, dt = 1, "<i1"
        out.append(bytes([ws]))
        out.append(struct.pack("<i", int(row[0])))
        out.append(diffs.astype(dt).tobytes())


def write_hf2(arr, geotransform, path, tile_size=256,
              vert_pres=0.01, compress=False):
    """north-up 2-D array + geotransform → HF2 (or gzipped HFZ)."""
    a = np.asarray(arr)
    if a.ndim == 3:
        a = a[0]
    ny, nx = a.shape
    gt = geotransform
    is_int = np.issubdtype(a.dtype, np.integer) and \
        np.iinfo(np.int16).min <= a.min() and a.max() <= \
        np.iinfo(np.int16).max
    out = [b"HF2\x00", struct.pack("<H", 0),
           struct.pack("<ii", nx, ny),
           struct.pack("<H", tile_size),
           struct.pack("<f", vert_pres)]
    hscale = (abs(gt[1]) + abs(gt[5])) / 2 if gt is not None else 1.0
    out.append(struct.pack("<f", hscale))
    ext = b""
    if gt is not None:
        ext = (b"bin\x00" + b"georef-extents".ljust(16, b"\x00")
               + struct.pack("<I", 34) + struct.pack("<h", 0)
               + struct.pack("<4d", gt[0], gt[0] + nx * gt[1],
                             gt[3] + ny * gt[5], gt[3]))
    out.append(struct.pack("<I", len(ext)))
    out.append(ext)

    nxb = (nx + tile_size - 1) // tile_size
    nyb = (ny + tile_size - 1) // tile_size
    af = a.astype(np.float32)
    for j in range(nyb):
        for i in range(nxb):
            w = min(tile_size, nx - i * tile_size)
            h = min(tile_size, ny - j * tile_size)
            # north-up rows covering this bottom-up tile row
            top = ny - (j * tile_size + h)
            block = af[top:top + h, i * tile_size:i * tile_size + w]
            if is_int:
                out.append(struct.pack("<2f", 1.0, 0.0))
                ivals = block[::-1].astype(np.int64)
            else:
                vmin = float(block.min())
                vmax = float(block.max())
                int_range = np.float32((np.float32(vmax) -
                                        np.float32(vmin))
                                       / np.float32(vert_pres))
                scale = np.float32(1.0) if vmin == vmax else \
                    np.float32((np.float32(vmax) - np.float32(vmin))
                               / int_range)
                out.append(struct.pack("<2f", float(scale), vmin))
                # C float truncation toward zero (CreateCopy)
                ivals = ((block[::-1] - np.float32(vmin))
                         / scale).astype(np.int64)
            _encode_rows(out, ivals)
    blob = b"".join(out)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)
    return path
