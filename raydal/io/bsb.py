"""Maptech/NOAA BSB nautical chart (.kap) reader, from scratch on
the published format (the reverse-engineering notes and patent
reproduced in the reference's own ``frmts/bsb/bsb_read.c``).

Reference semantics: ASCII header lines (``BSB/…,RA=w,h``,
``RGB/idx,r,g,b`` palette) terminated by ``0x1A 0x00``, then a
color-depth byte (ASCII-digit variants tolerated,
bsb_read.c:421-428); each scanline = a 7-bit big-endian varint line
marker (UpdateLineMarker loop) followed by RLE runs until a 0x00
byte — run byte: value = ``(b & valueMask) >> (7-colorSize)``,
count = ``b & countMask`` extended by 0x80-continuation bytes as
``count*128 + (b&0x7f)``, emitting count+1 pixels, clamped to the
line width (BSBReadScanline, bsb_read.c).  The trailing 4-byte
offset index is optional and ignored by the sequential decode.

Published parity (``autotest/gdrivers/bsb.py``): rgbsmall.kap =
30321 (test_bsb_1/2) and rgbsmall_index.kap = 30321 (test_bsb_4).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["read_bsb"]


def read_bsb(src):
    """.kap file (path or bytes) → (array[1, h, w] uint8 palette
    indices, None, None, palette dict idx→(r,g,b))."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()

    end_hdr = buf.find(b"\x1a\x00")
    if end_hdr < 0:
        raise ValueError("not a BSB file (no 0x1A 0x00 terminator)")
    header = buf[:end_hdr].decode("latin-1", "replace")

    nx = ny = None
    palette = {}
    for ln in header.splitlines():
        s = ln.strip()
        if "RA=" in s:
            m = re.search(r"RA=(\d+)\s*,\s*(\d+)", s)
            if m:
                nx, ny = int(m.group(1)), int(m.group(2))
        if s.startswith("RGB/"):
            parts = s[4:].split(",")
            palette[int(parts[0])] = (int(parts[1]), int(parts[2]),
                                      int(parts[3]))
    if nx is None:
        raise ValueError("BSB header has no RA= dimensions")

    pos = end_hdr + 2
    color_size = buf[pos]
    pos += 1
    if 0x31 <= color_size <= 0x38:      # ASCII digit variant
        color_size -= 0x30
    if not 0 < color_size <= 7:
        raise ValueError(f"bad BSB color size {color_size}")

    shift = 7 - color_size
    value_mask = ((1 << color_size) - 1) << shift
    count_mask = (1 << shift) - 1

    arr = np.zeros((ny, nx), np.uint8)
    n = len(buf)

    # Optional trailing index table: last 4 bytes = BE offset of a
    # table of ny BE line offsets (bsb_read.c:500-560).  When valid,
    # decode each line at its recorded offset and stop a short line
    # at the next line's offset instead of run-filling.
    first_line = pos
    if n >= 8:
        table_off = int.from_bytes(buf[n - 4:n], "big")
        if (first_line < table_off and
                table_off + 4 * ny <= n - 4 + 4):
            offs = [int.from_bytes(buf[table_off + 4 * i:
                                       table_off + 4 * i + 4], "big")
                    for i in range(ny)]
            if all(first_line <= o < table_off for o in offs) and \
                    all(offs[i] <= offs[i + 1]
                        for i in range(ny - 1)):
                bounds = offs[1:] + [table_off]
                for line in range(ny):
                    p = offs[line]
                    marker = 0
                    while p < n:        # line marker varint
                        b = buf[p]
                        p += 1
                        while line and marker == 0 and b == 0 \
                                and p < n:
                            b = buf[p]
                            p += 1
                        marker = marker * 128 + (b & 0x7F)
                        if not b & 0x80:
                            break
                    ipix = 0
                    while p < bounds[line]:
                        b = buf[p]
                        p += 1
                        if b == 0:
                            break
                        val = (b & value_mask) >> shift
                        count = b & count_mask
                        while b & 0x80 and p < n:
                            b = buf[p]
                            p += 1
                            count = count * 128 + (b & 0x7F)
                        count = min(count, nx - ipix - 1)
                        arr[line, ipix:ipix + count + 1] = val
                        ipix += count + 1
                arr[arr > 0] -= 1
                palette = {max(0, k - 1): v
                           for k, v in sorted(palette.items())}
                return arr[None], None, None, palette

    def read_marker(p, line):
        marker = 0
        while p < n:
            b = buf[p]
            p += 1
            # skip stray zeros before the marker (optech hack)
            while line != 0 and marker == 0 and b == 0 and p < n:
                b = buf[p]
                p += 1
            marker = marker * 128 + (b & 0x7F)
            if not b & 0x80:
                break
        return marker, p

    for line in range(ny):
        _marker, pos = read_marker(pos, line)
        ipix = 0
        # repeat run-reading if the line comes up short and the next
        # bytes are NOT the next line's marker (BSBReadScanline
        # do-while; handles mid-row line breaks, bsb_read.c)
        while True:
            while pos < n:
                b = buf[pos]
                pos += 1
                if b == 0:
                    break
                val = (b & value_mask) >> shift
                count = b & count_mask
                while b & 0x80 and pos < n:
                    b = buf[pos]
                    pos += 1
                    count = count * 128 + (b & 0x7F)
                count = min(count, nx - ipix - 1)
                arr[line, ipix:ipix + count + 1] = val
                ipix += count + 1
            if ipix >= nx - 1 or pos >= n or line == ny - 1:
                break
            nxt, _p2 = read_marker(pos, line + 1)
            if nxt in (line + 1, line + 2):
                break                   # genuine next scanline
        if pos >= n:
            break
    # the reference maps the 1-based chart indices to a 0-based
    # color table (bsbdataset.cpp:128-131: values > 0 shift down 1)
    arr[arr > 0] -= 1
    palette = {max(0, k - 1): v for k, v in sorted(palette.items())}
    return arr[None], None, None, palette
