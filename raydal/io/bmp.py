"""BMP reader/writer — ``frmts/bmp/bmpdataset.cpp`` semantics.

Coverage: BITMAPINFOHEADER files at 1/4/8/24/32 bits, BI_RGB and
BI_RLE8/BI_RLE4 compression, bottom-up and top-down rows, 4-byte row
padding.  Paletted depths (≤ 8 bit) read as ONE band of palette
indices — the reference's band model (the color table rides along) —
and 24/32-bit files read as RGB(A) with the file's BGR order unswizzled.
Validated against the published checksums in
``autotest/gcore/bmp_read.py:36-39`` (1bit 200, 4bit_pal 2587,
8bit_pal 4672, byte_rle8 4672).

Writer: BI_RGB, 8-bit (with gray or given palette) or 24-bit.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_bmp", "encode_bmp"]


def _rle_decode(data, w, h, four_bit):
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        c = data[i]
        v = data[i + 1]
        i += 2
        if c:                       # encoded run
            if four_bit:
                hi, lo = v >> 4, v & 0xF
                run = np.empty(c, np.uint8)
                run[0::2] = hi
                run[1::2] = lo
            else:
                run = np.full(c, v, np.uint8)
            m = min(c, w - x)
            if 0 <= y < h and m > 0:
                out[y, x:x + m] = run[:m]
            x += c
        elif v == 0:                # end of line
            x, y = 0, y + 1
        elif v == 1:                # end of bitmap
            break
        elif v == 2:                # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                       # absolute mode, word-aligned
            cnt = v
            if four_bit:
                nbytes = (cnt + 1) // 2
                raw = np.frombuffer(data, np.uint8, nbytes, i)
                vals = np.empty(nbytes * 2, np.uint8)
                vals[0::2] = raw >> 4
                vals[1::2] = raw & 0xF
                vals = vals[:cnt]
                i += nbytes + (nbytes & 1)
            else:
                vals = np.frombuffer(data, np.uint8, cnt, i)
                i += cnt + (cnt & 1)
            m = min(cnt, w - x)
            if 0 <= y < h and m > 0:
                out[y, x:x + m] = vals[:m]
            x += cnt
    return out


def decode_bmp(buf):
    """BMP bytes → (array, palette_or_None); array is (h, w) palette
    indices for ≤8-bit files, (h, w, 3|4) RGB(A) otherwise."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    (hdr_size, width, height, planes, bpp, comp) = \
        struct.unpack_from("<IiiHHI", buf, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    top_down = height < 0
    h, w = abs(height), width
    palette = None
    if bpp <= 8:
        (ncolors,) = struct.unpack_from("<I", buf, 46)
        if ncolors == 0:
            ncolors = 1 << bpp
        pal_off = 14 + hdr_size
        raw = np.frombuffer(buf, np.uint8, ncolors * 4, pal_off)
        bgra = raw.reshape(ncolors, 4)
        palette = bgra[:, [2, 1, 0]].copy()   # → RGB
    if comp in (1, 2):              # BI_RLE8 / BI_RLE4
        if bpp not in (4, 8):
            raise ValueError("RLE compression requires 4/8-bit BMP")
        img = _rle_decode(buf[data_off:], w, h, four_bit=(comp == 2))
        return (img if top_down else img[::-1]), palette
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} not supported")
    stride = ((w * bpp + 31) // 32) * 4
    rows = np.frombuffer(buf, np.uint8, stride * h, data_off)
    rows = rows.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 1:
        bits = np.unpackbits(rows[:, :(w + 7) // 8], axis=1)[:, :w]
        img = bits.astype(np.uint8)
    elif bpp == 4:
        nyb = np.empty((h, ((w + 1) // 2) * 2), np.uint8)
        half = rows[:, :(w + 1) // 2]
        nyb[:, 0::2] = half >> 4
        nyb[:, 1::2] = half & 0xF
        img = nyb[:, :w]
    elif bpp == 8:
        img = rows[:, :w].copy()
    elif bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)
        img = px[:, :, ::-1].copy()           # BGR → RGB
    elif bpp == 32:
        px = rows[:, :w * 4].reshape(h, w, 4)
        img = px[:, :, [2, 1, 0, 3]].copy()   # BGRA → RGBA
    else:
        raise NotImplementedError(f"BMP bit depth {bpp}")
    return img, palette


def encode_bmp(arr, palette=None):
    """(h, w) uint8 (+ optional (n, 3) palette, default gray ramp) or
    (h, w, 3) RGB → BI_RGB BMP bytes (bottom-up)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        if palette is None:
            palette = np.stack([np.arange(256, dtype=np.uint8)] * 3,
                               axis=1)
        pal = np.zeros((len(palette), 4), np.uint8)
        pal[:, :3] = np.asarray(palette, np.uint8)[:, ::-1]  # RGB → BGR
        stride = ((w + 3) // 4) * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = arr
        body = rows[::-1].tobytes()
        data_off = 14 + 40 + pal.size
        hdr = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                                   data_off)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                             len(body), 2835, 2835, len(palette), 0))
        return hdr + pal.tobytes() + body
    h, w = arr.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = arr[:, :, ::-1].reshape(h, w * 3)
    body = rows[::-1].tobytes()
    data_off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(body), 2835, 2835, 0, 0))
    return hdr + body
