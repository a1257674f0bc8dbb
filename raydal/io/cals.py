"""CALS Type 1 (MIL-STD-1840 / MIL-R-28002) raster reader/writer.

Reference driver: ``frmts/cals/calsdataset.cpp`` — a CALS file is a
2048-byte ASCII header of 128-byte space-padded records followed by a
raw CCITT T.6 (Group 4) codestream.  The reference exposes the stored
G4 bits UNCHANGED with an inverted palette (it synthesizes a
single-strip CCITTFAX4 ``PHOTOMETRIC_MINISWHITE`` TIFF around the
blob; GTiff "Pixel values remains unchanged",
``gtiffdataset_read.cpp:5209``), so value 1 = black.  On write the
source is inverted (``CALSWrapperSrcBand bInvertValues``,
``calsdataset.cpp:128-147``) unless its palette is already
white-then-black.

Validated against the published checksums in
``autotest/gdrivers/cals.py`` (small1bit.img → 9907,
oddsize1bit.tif → 3883).
"""

from __future__ import annotations

import os
import re

import numpy as np

from .ccitt import decode_g4, encode_g4

__all__ = ["read_cals", "write_cals", "cals_header"]

_HDR = 2048


def _load(src):
    if isinstance(src, (bytes, bytearray, memoryview)):
        return bytes(src)
    with open(src, "rb") as f:
        return f.read()


def cals_header(src):
    """Parse the 2048-byte header → dict with ``width height
    pixel_path line_progression density`` (``calsdataset.cpp``
    Open: rpelcnt / rorient / rdensty scans)."""
    buf = _load(src)[:_HDR]
    txt = buf.decode("ascii", "replace")
    if "rtype: 1" not in txt or "rpelcnt:" not in txt:
        raise ValueError("not a CALS Type 1 file")
    m = re.search(r"rpelcnt:\s*(\d+),\s*(\d+)", txt)
    if not m:
        raise ValueError("CALS header missing rpelcnt")
    w, h = int(m.group(1)), int(m.group(2))
    mo = re.search(r"rorient:\s*(-?\d+),\s*(-?\d+)", txt)
    angle1, angle2 = (int(mo.group(1)), int(mo.group(2))) if mo \
        else (0, 270)
    md = re.search(r"rdensty:\s*(\d+)", txt)
    density = int(md.group(1)) if md else 0
    return {"width": w, "height": h, "pixel_path": angle1,
            "line_progression": angle2, "density": density}


def read_cals(src):
    """CALS bytes/path → ``(array [1, h, w] uint8 of stored G4 bits,
    None, None)``.  Values follow the reference's convention
    (unchanged bits, palette index 0 = white / 1 = black)."""
    buf = _load(src)
    hdr = cals_header(buf)
    w, h = hdr["width"], hdr["height"]
    bits = decode_g4(buf[_HDR:], w, h)
    return bits[None, :, :].astype(np.uint8), None, None


def _field(buf, offset, text):
    b = text.encode("ascii")
    buf[offset:offset + len(b)] = b


def write_cals(arr, path=None, *, palette_white_black=False,
               pixel_path=None, line_progression=None, density=None):
    """0/1 raster → CALS Type 1 bytes (optionally written to
    ``path``).

    ``palette_white_black=True`` marks the input as already carrying
    the (255,255,255),(0,0,0) palette — values are stored unchanged;
    otherwise they are inverted first, matching
    ``CALSWrapperSrcBand`` (``calsdataset.cpp:136-147``).  Header
    record layout per ``CreateCopy`` (``calsdataset.cpp:505-567``).
    """
    a = np.asarray(arr)
    if a.ndim == 3:
        if a.shape[0] != 1:
            raise ValueError("CALS supports a single band")
        a = a[0]
    if a.shape[0] > 999999 or a.shape[1] > 999999:
        raise ValueError("CALS dimensions must be <= 999999")
    bits = (a != 0).astype(np.uint8)
    if not palette_white_black:
        bits = 1 - bits
    angle1 = 0 if pixel_path is None else int(pixel_path)
    angle2 = 270 if line_progression is None else int(line_progression)
    if pixel_path is None or line_progression is None:
        angle1, angle2 = 0, 270
    dens = 200
    if density is not None and 1 <= int(density) <= 9999:
        dens = int(density)
    hdr = bytearray(b" " * _HDR)
    _field(hdr, 0, "srcdocid: NONE")
    _field(hdr, 128, "dstdocid: NONE")
    _field(hdr, 128 * 2, "txtfilid: NONE")
    _field(hdr, 128 * 3, "figid: NONE")
    _field(hdr, 128 * 4, "srcgph: NONE")
    _field(hdr, 128 * 5, "doccls: NONE")
    _field(hdr, 128 * 6, "rtype: 1")
    _field(hdr, 128 * 7, f"rorient: {angle1:03d},{angle2:03d}")
    _field(hdr, 128 * 8,
           f"rpelcnt: {bits.shape[1]:06d},{bits.shape[0]:06d}")
    _field(hdr, 128 * 9, f"rdensty: {dens:04d}")
    _field(hdr, 128 * 10, "notes: NONE")
    out = bytes(hdr) + encode_g4(bits)
    if path is not None:
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(out)
        os.replace(tmp, path)
        return path
    return out
