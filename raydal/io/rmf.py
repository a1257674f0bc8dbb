"""Panorama RMF (.rsw raster / .mtw matrix) reader, from scratch on
the published layout.

Reference semantics (``frmts/rmf/rmfdataset.cpp`` + ``rmflzw.cpp``):
320-byte header — ``RSW\\0`` / ``MTW\\0`` magic (``\\0WSR`` =
big-endian variant), bit depth @52, height/width @56/60, tile grid
@64-87, color/tile tables @96-111, map params + pixel size / LL
corner doubles @124-207, compression byte @208, nodata double @296.
The tile table holds (offset, size) uint32 pairs, tiles row-major
top-down.  RSW depth 8 = one paletted byte band, 24 = three bands
stored BGR (band extraction ``iDstBand = nBands − nBand``,
rmfdataset.cpp:262-286), 16 = three 5-5-5 packed bands; MTW depths
16/32/64 map Int16/Int32/Float64.  Compression 1 is Panorama's
12-bit LZW with MID-SQUARE hashing — the CODE of a new string is its
hash-table slot (LZWUpdateTab: ``((pred + signed(follow)) | 0x800)²
>> 6 & 0xFFF``, collision chain + linear probe from slot+101,
rmflzw.cpp:60-110) — ported verbatim including the signed follower.

Published parity (``autotest/gdrivers/rmf.py``): byte.rsw 4672,
byte-lzw.rsw 40503, float64.mtw 4672, rgbsmall.rsw 21212/21053/21349,
rgbsmall-lzw.rsw 40503/41429/40238, big-endian.rsw 7782/8480.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_rmf"]

_NO_PRED = 0xFFFF


def _lzw_new_tab():
    used = np.zeros(4096, bool)
    nxt = np.zeros(4096, np.uint16)
    pred = np.zeros(4096, np.uint32)
    foll = np.zeros(4096, np.uint8)
    tab = [used, nxt, pred, foll]
    for c in range(256):
        _lzw_update(tab, _NO_PRED, c)
    return tab


def _lzw_update(tab, ipred, bfollow):
    used, nxt, pred, foll = tab
    ifollow = bfollow - 256 if bfollow >= 128 else bfollow
    nlocal = ((ipred + ifollow) & 0xFFFFFFFF) | 0x0800
    nlocal = ((nlocal * nlocal) >> 6) & 0x0FFF
    nnext = nlocal
    if used[nlocal]:
        while True:
            nn = int(nxt[nlocal])
            if nn == 0:
                break
            nlocal = nn
        nnext = (nlocal + 101) & 0x0FFF
        while used[nnext]:
            nnext += 1
            if nnext >= 4096:
                nnext = 0
        nxt[nlocal] = nnext
    used[nnext] = True
    nxt[nnext] = 0
    pred[nnext] = ipred
    foll[nnext] = bfollow
    return nnext


def _lzw_decompress(data, out_size):
    """rmflzw.cpp LZWReadStream port: 12-bit nibble-packed codes."""
    tab = _lzw_new_tab()
    used, nxt, pred, foll = tab
    out = bytearray()
    n = len(data)
    i = 0
    icode = ((data[i] << 4) & 0xFF0)
    i += 1
    icode += (data[i] >> 4) & 0x00F
    iold = icode
    bitsleft = True
    finchar = int(foll[icode])
    out.append(finchar)
    count = 4096 - 256
    while i < n - (0 if bitsleft else 0):
        if bitsleft:
            icode = ((data[i] & 0x0F) << 8) & 0xF00
            i += 1
            if i >= n:
                break
            icode += data[i]
            i += 1
            bitsleft = False
        else:
            icode = (data[i] << 4) & 0xFF0
            i += 1
            if i >= n:
                break
            icode += (data[i] >> 4) & 0x00F
            bitsleft = True
        iin = icode
        newcode = False
        lastchar = 0
        if not used[icode]:
            icode = iold
            lastchar = finchar
            newcode = True
        stack = []
        while pred[icode] != _NO_PRED:
            stack.append(int(foll[icode]))
            icode = int(pred[icode])
            if len(stack) > 4096:
                raise ValueError("corrupt RMF LZW stream")
        finchar = int(foll[icode])
        out.append(finchar)
        out.extend(reversed(stack))
        if newcode:
            finchar = lastchar
            out.append(finchar)
        if count > 0:
            count -= 1
            _lzw_update(tab, iold, finchar)
        iold = iin
        if len(out) >= out_size:
            break
    return bytes(out[:out_size])


def read_rmf(src):
    """RMF .rsw/.mtw (path or bytes) → (array[bands, h, w],
    geotransform or None, nodata)."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    sig = buf[:4]
    if sig == b"\x00WSR":
        bo, is_mtw = ">", False
    elif sig == b"RSW\x00":
        bo, is_mtw = "<", False
    elif sig == b"MTW\x00":
        bo, is_mtw = "<", True
    else:
        raise ValueError("not an RMF file")

    def u32(off):
        return struct.unpack_from(bo + "I", buf, off)[0]

    def f64(off):
        return struct.unpack_from(bo + "d", buf, off)[0]

    depth = u32(52)
    ny, nx = u32(56), u32(60)
    ntx, nty = u32(64), u32(68)
    th, tw = u32(72), u32(76)
    tile_tbl_off, tile_tbl_size = u32(104), u32(108)
    pixel_size = f64(152)
    lly, llx = f64(160), f64(168)
    compression = buf[208]
    nodata = f64(296)

    if is_mtw:
        dt = {16: "i2", 32: "i4", 64: "f8"}[depth]
        nb = 1
    else:
        nb = 3 if depth in (16, 24, 32) else 1
        dt = "u1"
    dtype = np.dtype(bo + dt) if dt != "u1" else np.dtype(np.uint8)
    georef = buf[244]
    gt = None
    if pixel_size != 0:
        gt = (llx, pixel_size, 0.0,
              lly + ny * pixel_size, 0.0, -pixel_size)
        if not georef:
            gt = None

    ntiles = ntx * nty
    pairs = [(u32(tile_tbl_off + 8 * i),
              u32(tile_tbl_off + 8 * i + 4))
             for i in range(min(ntiles, tile_tbl_size // 8))]

    arr = np.zeros((nb, ny, nx), dtype)
    bits_per_px = depth
    for t, (off, size) in enumerate(pairs):
        ty, tx = divmod(t, ntx)
        w = min(tw, nx - tx * tw)
        h = min(th, ny - ty * th)
        raw_bytes = w * h * bits_per_px // 8
        if size == 0:
            continue
        raw = buf[off:off + size]
        if compression == 1:
            raw = _lzw_decompress(raw, raw_bytes)
        elif compression != 0:
            raise NotImplementedError(
                f"RMF compression {compression} (JPEG/DEM) — the "
                "reference delegates to external codecs")
        if len(raw) < raw_bytes:
            raw = raw + b"\x00" * (raw_bytes - len(raw))
        if is_mtw or depth == 8:
            tile = np.frombuffer(raw, dtype,
                                 count=w * h).reshape(h, w)
            arr[0, ty * th:ty * th + h, tx * tw:tx * tw + w] = tile
        elif depth == 24:               # BGR interleaved
            tile = np.frombuffer(raw, np.uint8,
                                 count=w * h * 3).reshape(h, w, 3)
            for b in range(3):
                arr[b, ty * th:ty * th + h,
                    tx * tw:tx * tw + w] = tile[:, :, 2 - b]
        elif depth == 16:               # 5-5-5 packed
            tile = np.frombuffer(raw, np.dtype(bo + "u2"),
                                 count=w * h).reshape(h, w) \
                .astype(np.uint16)
            comps = (((tile >> 10) & 0x1F), ((tile >> 5) & 0x1F),
                     (tile & 0x1F))
            for b in range(3):
                arr[b, ty * th:ty * th + h, tx * tw:tx * tw + w] = \
                    (comps[b] << 3).astype(np.uint8)
        elif depth == 32:               # BGR0
            tile = np.frombuffer(raw, np.uint8,
                                 count=w * h * 4).reshape(h, w, 4)
            for b in range(3):
                arr[b, ty * th:ty * th + h,
                    tx * tw:tx * tw + w] = tile[:, :, 2 - b]
        else:
            raise NotImplementedError(f"RMF bit depth {depth}")
    return arr, gt, (nodata if is_mtw else None)
