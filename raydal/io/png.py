"""Minimal pure-Python/numpy PNG codec (8-bit gray / RGB / RGBA).

No imaging library exists in this environment, so the engine carries its
own codec built on stdlib ``zlib`` + the public PNG spec (RFC 2083): IHDR /
IDAT / IEND chunks, non-interlaced, bit depth 8.  The encoder emits filter
type 0 scanlines (speed over ratio — tile bytes are usually recompressed
downstream anyway); the decoder handles all five filter types so any
conforming 8-bit PNG reads back.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels → PNG color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # gray, rgb, gray+alpha, rgba


def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr, level=1):
    """uint8 array (H, W) / (H, W, 3) / (H, W, 4) → PNG bytes."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}; "
                         "expected 1 (gray), 3 (RGB) or 4 (RGBA)")
    ctype = _COLOR_TYPE[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _unfilter(raw, h, w, ch, sample_bytes=1):
    """Reverse scanline filters; works on BYTES with the pixel stride
    ``ch * sample_bytes`` (PNG filters are byte-oriented at any depth)."""
    ch = ch * sample_bytes
    stride = w * ch
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = data[:, 0]
    rows = data[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = ftypes[y]
        row = rows[y]
        if ft == 0:
            rec = row
        elif ft == 2:  # Up
            rec = (row + prior) & 0xFF
        elif ft == 1:  # Sub — per-channel cumulative sum mod 256
            rec = row.reshape(w, ch).cumsum(axis=0) & 0xFF
            rec = rec.reshape(stride)
        else:  # Average (3) / Paeth (4): sequential recurrence per pixel
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prior[i]
                if ft == 3:
                    rec[i] = (row[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (row[i] + pred) & 0xFF
        out[y] = rec
        prior = rec
    return out.astype(np.uint8).reshape(h, w, ch)  # ch includes sample bytes




_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _deinterlace_adam7(raw, h, w, ch, sample_bytes=1):
    """Adam7 interlaced PNG: seven filtered sub-images, re-assembled."""
    out = np.zeros((h, w, ch * sample_bytes), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = pw * ch * sample_bytes
        nbytes = ph * (1 + stride)
        sub = _unfilter(raw[off:off + nbytes], ph, pw, ch, sample_bytes)
        off += nbytes
        out[y0::dy, x0::dx, :] = sub
    return out


def decode_png(buf):
    """PNG bytes → uint8 array (H, W) for gray, else (H, W, C)."""
    buf = bytes(buf)
    if buf[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = ctype = None
    idat = []
    while off < len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4:off + 8]
        payload = buf[off + 8:off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload)
            if depth not in (8, 16) or inter not in (0, 1):
                raise ValueError("only 8/16-bit PNG supported")
            if ctype != 3 and ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
        elif tag == b"PLTE":
            pass  # palette intentionally not expanded: band = indices
                  # (the reference PNG driver exposes a color table too)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    ch = 1 if ctype == 3 else _CHANNELS[ctype]
    sb = depth // 8
    raw = zlib.decompress(b"".join(idat))
    if inter == 1:
        arr = _deinterlace_adam7(raw, h, w, ch, sb)
    else:
        arr = _unfilter(raw, h, w, ch, sb)
    arr = arr.reshape(h, w, ch * sb)
    if depth == 16:
        # samples are big-endian u16 (PNG network byte order)
        arr = arr.reshape(h, w, ch, 2)
        arr = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    if ctype == 3:
        # paletted: band value IS the palette index (the reference's
        # PNG driver exposes indices + a color table; frmts/png)
        return arr[:, :, 0].copy()
    return arr[:, :, 0] if ch == 1 else arr
