"""FITS raster reader-writer, from scratch on the published FITS
standard (no cfitsio).

Reference semantics (``frmts/fits/fitsdataset.cpp``): 2880-byte
header units of 80-char ``KEY     = value / comment`` cards ended by
``END``; BITPIX 8/16/32/64 big-endian integers and −32/−64 IEEE
floats; rows stored BOTTOM-UP (band row 0 reads the last stored row,
fitsdataset.cpp:1738-1742); the unsigned types travel as signed with
``BZERO = 2^(bits−1)`` (uint16 ↔ int16 + 32768, fitsdataset.cpp:350),
applied on read and emitted on write; other BZERO/BSCALE pairs are
surfaced as offset/scale metadata; data units are padded to 2880
bytes and additional image HDUs follow (the primary HDU may be
headerless ``NAXIS = 0``).

Published parity (``autotest/gdrivers/fits.py``): the
byte/int16/uint16/int32/uint32/float32/float64 CreateCopy round-trips
preserve each gcore fixture's checksum and data type; byte_merc.fits
reads the byte.tif grid (4672).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_fits", "write_fits"]

_BITPIX_DT = {8: "u1", 16: ">i2", 32: ">i4", 64: ">i8",
              -32: ">f4", -64: ">f8"}


def _parse_header(buf, pos):
    """One FITS header unit at ``pos`` → (cards dict, data offset)."""
    cards = {}
    while True:
        block = buf[pos:pos + 2880]
        if len(block) < 2880:
            raise ValueError("truncated FITS header")
        done = False
        for i in range(0, 2880, 80):
            card = block[i:i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if card[8:10] != "= ":
                continue
            val = card[10:].split("/")[0].strip()
            cards[key] = val
        pos += 2880
        if done:
            return cards, pos


def read_fits(src, hdu=None):
    """FITS file (path or bytes) → (array[bands, h, w], None, None,
    {scale, offset}).  Reads the first image HDU with data unless
    ``hdu`` picks a specific 0-based HDU index."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    if not buf.startswith(b"SIMPLE"):
        raise ValueError("not a FITS file")
    pos = 0
    idx = 0
    while pos < len(buf):
        cards, dpos = _parse_header(buf, pos)
        bitpix = int(cards.get("BITPIX", "8"))
        naxis = int(cards.get("NAXIS", "0"))
        dims = [int(cards[f"NAXIS{i}"]) for i in range(1, naxis + 1)]
        nvals = int(np.prod(dims)) if dims else 0
        dsize = nvals * abs(bitpix) // 8
        is_image = naxis >= 2 and \
            cards.get("XTENSION", "'IMAGE'").strip("' ") in ("IMAGE",) \
            if "XTENSION" in cards else naxis >= 2
        take = is_image and (hdu is None or hdu == idx)
        if take:
            nx, ny = dims[0], dims[1]
            nb = dims[2] if naxis >= 3 else 1
            dt = np.dtype(_BITPIX_DT[bitpix])
            arr = np.frombuffer(buf, dt, count=nx * ny * nb,
                                offset=dpos).reshape(nb, ny, nx)
            arr = arr[:, ::-1]          # FITS rows are bottom-up
            bzero = float(cards.get("BZERO", "0"))
            bscale = float(cards.get("BSCALE", "1"))
            meta = {}
            # unsigned promotion (fitsdataset.cpp:350)
            if bscale == 1 and bitpix in (8, 16, 32, 64) and \
                    bzero == float(1 << (abs(bitpix) - 1)) and \
                    bitpix != 8:
                u = np.dtype(f">u{bitpix // 8}")
                arr = (arr.astype(np.int64) + int(bzero)).astype(u)
            elif bscale == 1 and bitpix == 8 and bzero == -128:
                arr = (arr.astype(np.int64) - 128).astype(np.int8)
            elif bzero != 0 or bscale != 1:
                meta = {"scale": bscale, "offset": bzero}
            arr = arr.astype(arr.dtype.newbyteorder("="))
            return (np.ascontiguousarray(arr), None, None, meta)
        pos = dpos + (dsize + 2879) // 2880 * 2880
        idx += 1
    raise ValueError("no image HDU found in FITS file")


def _card(key, val, comment=""):
    if isinstance(val, bool):
        body = f"{'T' if val else 'F':>20}"
    elif isinstance(val, str):
        body = f"'{val}'".ljust(20)
    else:
        body = f"{val:>20}"
    s = f"{key:<8}= {body}"
    if comment:
        s += f" / {comment}"
    return s[:80].ljust(80)


def write_fits(arr, path):
    """array[bands, h, w] → single-HDU FITS file (unsigned ints via
    the BZERO convention, rows flipped to FITS bottom-up order)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[None]
    nb, ny, nx = a.shape
    dt = np.dtype(a.dtype).newbyteorder("=")
    bzero = 0
    if dt == np.uint16:
        a, dt, bzero = a.astype(np.int64) - 32768, np.dtype(np.int16), 32768
    elif dt == np.uint32:
        a, dt, bzero = (a.astype(np.int64) - 2147483648,
                        np.dtype(np.int32), 2147483648)
    elif dt == np.int8:
        a, dt, bzero = a.astype(np.int64) + 128, np.dtype(np.uint8), -128
    bitpix = {np.dtype(np.uint8): 8, np.dtype(np.int16): 16,
              np.dtype(np.int32): 32, np.dtype(np.int64): 64,
              np.dtype(np.float32): -32,
              np.dtype(np.float64): -64}[dt]
    cards = [_card("SIMPLE", True, "file does conform to FITS standard"),
             _card("BITPIX", bitpix, "number of bits per data pixel"),
             _card("NAXIS", 3 if nb > 1 else 2, "number of data axes"),
             _card("NAXIS1", nx), _card("NAXIS2", ny)]
    if nb > 1:
        cards.append(_card("NAXIS3", nb))
    if bzero:
        cards.append(_card("BZERO", bzero))
        cards.append(_card("BSCALE", 1))
    cards.append("END".ljust(80))
    hdr = "".join(cards).encode("ascii")
    hdr += b" " * (-len(hdr) % 2880)
    body = np.ascontiguousarray(
        a[:, ::-1]).astype(np.dtype(_BITPIX_DT[bitpix])).tobytes()
    body += b"\x00" * (-len(body) % 2880)
    with open(path, "wb") as f:
        f.write(hdr + body)
    return path
