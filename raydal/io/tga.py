"""TGA (Truevision Targa) reader, from scratch.

Mirrors ``frmts/tga/tgadataset.cpp``: image types 1/2/3 and their RLE
variants 9/10/11, 8/16/24/32-bit pixels (16-bit unpacks 5-5-5 with a
plain ``<<3`` per channel, tgadataset.cpp:368), color-mapped files
return the palette indices plus the decoded RGBA table, bottom-up
origin (descriptor bit 5 clear) flips rows, RLE runs may cross
scanlines, and the optional TRUEVISION-XFILE footer yields
AUTHOR_NAME / COMMENTS metadata with IMAGE_ID from the ID field.

Goldens: autotest/gdrivers/tga.py — the Truevision reference suite
checksums (ubw8/cbw8 43089, ucm8/ccm8 38151 + palette entries,
utc16 64747/64839/64796, utc24/ctc24/utc32 9797/9952/9848,
stefan_full_rgba per-band, test1g cross-scanline runs 13077).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_tga", "tga_info"]


def _parse_header(data: bytes):
    (idlen, cmaptype, imgtype, cm_first, cm_len, cm_size, _xo, _yo,
     w, h, bpp, desc) = struct.unpack_from("<BBBHHBHHHHBB", data, 0)
    return dict(idlen=idlen, cmaptype=cmaptype, imgtype=imgtype,
                cm_first=cm_first, cm_len=cm_len, cm_size=cm_size,
                w=w, h=h, bpp=bpp, desc=desc)


def tga_info(path):
    """Header fields + palette + footer metadata (AUTHOR_NAME,
    COMMENTS, IMAGE_ID)."""
    data = open(path, "rb").read()
    hd = _parse_header(data)
    off = 18
    image_id = data[off:off + hd["idlen"]].decode(
        "latin-1").rstrip("\0 ")
    off += hd["idlen"]
    palette = None
    if hd["cmaptype"] == 1 and hd["cm_len"]:
        nb = (hd["cm_size"] + 7) // 8
        raw = np.frombuffer(data, np.uint8, count=hd["cm_len"] * nb,
                            offset=off)
        raw = raw.reshape(hd["cm_len"], nb)
        palette = np.zeros((hd["cm_len"], 4), np.uint8)
        palette[:, 3] = 255
        if hd["cm_size"] == 24:
            palette[:, 0] = raw[:, 2]          # BGR storage
            palette[:, 1] = raw[:, 1]
            palette[:, 2] = raw[:, 0]
        elif hd["cm_size"] == 32:
            palette[:, 0] = raw[:, 2]
            palette[:, 1] = raw[:, 1]
            palette[:, 2] = raw[:, 0]
            palette[:, 3] = raw[:, 3]
        elif hd["cm_size"] in (15, 16):
            v = raw[:, 0].astype(np.uint16) | \
                (raw[:, 1].astype(np.uint16) << 8)
            palette[:, 0] = ((v >> 10) & 31) << 3
            palette[:, 1] = ((v >> 5) & 31) << 3
            palette[:, 2] = (v & 31) << 3
        off += hd["cm_len"] * nb
    meta = {}
    if image_id:
        meta["IMAGE_ID"] = image_id
    if len(data) >= 26 and data[-18:-1] == b"TRUEVISION-XFILE.":
        ext_off = struct.unpack_from("<I", data, len(data) - 26)[0]
        if ext_off and ext_off + 495 <= len(data):
            author = data[ext_off + 2:ext_off + 43].decode(
                "latin-1").rstrip("\0 ")
            if author:
                meta["AUTHOR_NAME"] = author
            comments = []
            for i in range(4):
                line = data[ext_off + 43 + 81 * i:
                            ext_off + 43 + 81 * (i + 1)]
                line = line.split(b"\0")[0].decode("latin-1").rstrip()
                if line:
                    comments.append(line)
            if comments:
                meta["COMMENTS"] = "\n".join(comments)
    hd["palette"] = palette
    hd["metadata"] = meta
    hd["_pixel_offset"] = off
    return hd


def read_tga(path):
    """→ (array [bands, h, w] uint8, None, None).  Gray/indexed → 1
    band (indices for color-mapped files); truecolor → R,G,B[,A]."""
    data = open(path, "rb").read()
    hd = tga_info(path)
    w, h, bpp = hd["w"], hd["h"], hd["bpp"]
    imgtype = hd["imgtype"]
    if imgtype not in (1, 2, 3, 9, 10, 11):
        raise NotImplementedError(f"TGA image type {imgtype}")
    nb = (bpp + 7) // 8
    npx = w * h
    off = hd["_pixel_offset"]

    if imgtype >= 9:                          # RLE (runs cross lines)
        out = np.empty(npx * nb, np.uint8)
        pos = off
        filled = 0
        while filled < npx * nb and pos < len(data):
            hdr = data[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:
                px = data[pos:pos + nb]
                pos += nb
                chunk = np.tile(np.frombuffer(px, np.uint8), count)
            else:
                chunk = np.frombuffer(
                    data, np.uint8, count=count * nb, offset=pos)
                pos += count * nb
            n = min(len(chunk), npx * nb - filled)
            out[filled:filled + n] = chunk[:n]
            filled += n
        raw = out
    else:
        raw = np.frombuffer(data, np.uint8, count=npx * nb, offset=off)

    px = raw.reshape(h, w, nb)
    if not (hd["desc"] & 0x20):              # bottom-up origin
        px = px[::-1]

    if bpp == 8:
        return np.ascontiguousarray(px[:, :, 0])[None], None, None
    if bpp in (15, 16):
        v = px[:, :, 0].astype(np.uint16) | \
            (px[:, :, 1].astype(np.uint16) << 8)
        if imgtype in (3, 11):               # 16-bit grayscale
            return v[None].astype(np.uint16), None, None
        r = (((v >> 10) & 31) << 3).astype(np.uint8)
        g = (((v >> 5) & 31) << 3).astype(np.uint8)
        b = ((v & 31) << 3).astype(np.uint8)
        return np.stack([r, g, b]), None, None
    if bpp == 24:
        return np.stack([px[:, :, 2], px[:, :, 1],
                         px[:, :, 0]]), None, None
    if bpp == 32:
        return np.stack([px[:, :, 2], px[:, :, 1], px[:, :, 0],
                         px[:, :, 3]]), None, None
    raise NotImplementedError(f"TGA depth {bpp}")
