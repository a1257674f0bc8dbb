"""GIF reader — ``frmts/gif/gifdataset.cpp`` band semantics on a
from-scratch GIF87a/89a decoder.

The LZW here is the GIF variant (LSB-first bit packing, per-image
initial code size, CLEAR/EOI codes, dictionary capped at 4096 —
distinct from the TIFF variant in :mod:`raydal.io.tiff`, which is
MSB-first with an early-change offset).  Interlaced images are
de-interlaced with the standard 8/8/4/2 pass layout.  Band value = the
palette index, exactly like the reference (the color table rides
along).  Validated against the published checksum 57921 for
``bug407.gif`` (``autotest/gdrivers/gif.py:48``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


def _lzw_decode_gif(data, min_code_size, expected):
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as (prefix_code, suffix_byte) arrays
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    for i in range(clear):
        suffix[i] = i
    out = np.empty(expected + 4096, np.uint8)
    n_out = 0

    bitbuf = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    ln = len(data)

    def emit(code, n_out):
        # walk the chain into a scratch, reversed
        stack = []
        c = code
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        for b in reversed(stack):
            out[n_out] = b
            n_out += 1
        return n_out, stack[-1]

    while pos < ln or nbits >= width:
        while nbits < width and pos < ln:
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            n_out, first = emit(code, n_out)
            prev = code
            continue
        if code < next_code:
            n_out, first = emit(code, n_out)
        elif code == next_code:
            # KwKwK case: emit prev chain + its first byte
            n_out, first = emit(prev, n_out)
            out[n_out] = first
            n_out += 1
        else:
            raise ValueError("corrupt GIF LZW stream")
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if n_out >= expected:
            break
    return out[:expected]


def decode_gif(buf):
    """GIF bytes → (indices (h, w) uint8, palette (n, 3) uint8,
    transparent_index_or_None) for the FIRST image frame."""
    buf = bytes(buf)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, flags, bg, aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = None
    while pos < len(buf):
        b = buf[pos]
        pos += 1
        if b == 0x3B:               # trailer
            break
        if b == 0x21:               # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9 and buf[pos] >= 4:   # graphic control
                gflags = buf[pos + 1]
                if gflags & 0x01:
                    transparent = buf[pos + 4]
            while True:             # skip sub-blocks
                sz = buf[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        pal = gpal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        min_code_size = buf[pos]
        pos += 1
        chunks = []
        while True:
            sz = buf[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(buf[pos:pos + sz])
            pos += sz
        data = b"".join(chunks)
        idx = _lzw_decode_gif(np.frombuffer(data, np.uint8), min_code_size,
                              w * h).reshape(h, w)
        if iflags & 0x40:           # interlaced: passes start 0/4/2/1
            out = np.empty_like(idx)
            rows = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                   np.arange(2, h, 4), np.arange(1, h, 2)])
            out[rows] = idx
            idx = out
        if pal is None:
            pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        return idx, pal, transparent
    raise ValueError("no image frame in GIF")


def _lzw_encode_gif(indices, min_code_size):
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def put(code, width):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {}
    next_code = eoi + 1
    put(clear, width)
    prev = -1
    for b in indices:
        b = int(b)
        key = (prev, b)
        if prev < 0:
            prev = b
            continue
        if key in table:
            prev = table[key]
            continue
        put(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prev = b
    if prev >= 0:
        put(prev, width)
    put(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(indices, palette=None):
    """(h, w) uint8 palette indices (+ optional (n, 3) palette, default
    gray ramp) → GIF87a bytes; round-trips bit-exactly through
    :func:`decode_gif` (the reference's CreateCopy→Checksum tests,
    e.g. byte.tif → 4672, hold by construction)."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    h, w = idx.shape
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    bits = max(1, int(np.ceil(np.log2(max(2, n)))))
    full = np.zeros((1 << bits, 3), np.uint8)
    full[:n] = palette
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += full.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, bits)
    out.append(min_code_size)
    data = _lzw_encode_gif(idx.ravel(), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
