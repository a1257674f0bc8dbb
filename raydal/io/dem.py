"""DTED and SRTM HGT elevation readers/writers, from scratch.

DTED (MIL-PRF-89020B; reference driver ``frmts/dted/`` /
``frmts/dted/dted_api.c``): 80-byte UHL header (origin in DDDMMSSH,
intervals in tenths of arc seconds, line/point counts), 648-byte DSI,
2,700-byte ACC, then one record per longitude column — ``0xAA``
sentinel, 3-byte block count, 2-byte longitude/latitude counts, nlat
big-endian *signed-magnitude* elevations running south→north, and a
4-byte arithmetic checksum over the record.  An optional leading 80-byte
``HDR1`` tape record is skipped (reference issue #2951,
``autotest/gdrivers/dted.py`` test_dted_12); files with only a few
sequential columns place them by the record's longitude count and leave
the rest at the -32767 nodata (test_dted_13, checksum 56006).

SRTM HGT (reference driver ``frmts/srtmhgt/srtmhgtdataset.cpp``): raw
big-endian int16 square grid (1201² for 3", 3601² for 1"), north row
first, cell SW corner encoded in the ``N43W080``-style filename, void
value -32768.  Both formats are pixel-is-point grids published with the
half-pixel-shifted area geotransform the reference reports
(``autotest/gdrivers/dted.py`` test_dted_2: n43.dt0 →
(-80.0041666, 1/120, 0, 44.0041666, 0, -1/120)).
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = ["read_dted", "write_dted", "read_hgt", "write_hgt",
           "DTED_NODATA", "HGT_NODATA"]

DTED_NODATA = -32767
HGT_NODATA = -32768

_UHL_SIZE, _DSI_SIZE, _ACC_SIZE = 80, 648, 2700


def _parse_angle(field):
    """DDDMMSSH (or DDMMSSH for latitude) → signed degrees."""
    field = field.decode("ascii")
    hemi = field[-1]
    digits = field[:-1]
    ss = int(digits[-2:])
    mm = int(digits[-4:-2])
    dd = int(digits[:-4])
    val = dd + mm / 60.0 + ss / 3600.0
    return -val if hemi in "WSws" else val


def _fmt_angle(deg, lat=False):
    """signed degrees → DDDMMSSH (3-digit degrees on both axes, as in
    the reference's own n43.dt0: lat field ``0430000N``)."""
    hemi = ("S" if deg < 0 else "N") if lat else ("W" if deg < 0 else "E")
    a = abs(deg)
    dd = int(a)
    mm = int(round((a - dd) * 60)) % 60
    ss = int(round((a - dd - mm / 60.0) * 3600)) % 60
    return f"{dd:03d}{mm:02d}{ss:02d}{hemi}".encode("ascii")


def read_dted(src, verify_checksum=True):
    """DTED bytes or path → (int16 array (nlat, nlon) north row first,
    geotransform, nodata).

    Missing columns (partial-column files) are filled with the -32767
    nodata; per-record checksums are verified unless
    ``verify_checksum=False`` (the reference gates this behind
    DTED_VERIFY_CHECKSUM, test_dted_8).
    """
    buf = src if isinstance(src, (bytes, bytearray)) else \
        open(src, "rb").read()
    buf = bytes(buf)
    pos = 0
    if buf[:4] == b"HDR1":                     # leading tape header
        pos = _UHL_SIZE
    if buf[pos:pos + 4] != b"UHL1":
        raise ValueError("not a DTED file: missing UHL record")
    uhl = buf[pos:pos + _UHL_SIZE]
    lon0 = _parse_angle(uhl[4:12])
    lat0 = _parse_angle(uhl[12:20])
    dx = int(uhl[20:24]) / 10.0 / 3600.0
    dy = int(uhl[24:28]) / 10.0 / 3600.0
    nlon = int(uhl[47:51])
    nlat = int(uhl[51:55])
    pos += _UHL_SIZE + _DSI_SIZE + _ACC_SIZE

    arr = np.full((nlat, nlon), DTED_NODATA, np.int16)
    rec_len = 8 + 2 * nlat + 4
    while pos + rec_len <= len(buf):
        rec = buf[pos:pos + rec_len]
        if rec[0] != 0xAA:
            raise ValueError("bad DTED record sentinel")
        if verify_checksum:
            stored = int.from_bytes(rec[-4:], "big")
            if sum(rec[:-4]) != stored:
                raise ValueError("DTED record checksum mismatch")
        col = int.from_bytes(rec[4:6], "big")
        if col >= nlon:
            raise ValueError("DTED longitude count out of range")
        raw = np.frombuffer(rec, ">u2", count=nlat, offset=8)
        vals = (raw & 0x7FFF).astype(np.int16)
        np.negative(vals, out=vals, where=(raw & 0x8000) != 0)
        arr[:, col] = vals[::-1]               # south→north → north-first
        pos += rec_len
    gt = (lon0 - dx / 2, dx, 0.0,
          lat0 + (nlat - 1) * dy + dy / 2, 0.0, -dy)
    return arr, gt, DTED_NODATA


def write_dted(arr, lon0, lat0, interval_arcsec=None):
    """int16 grid (north row first) + SW-corner origin → DTED bytes.

    ``interval_arcsec`` defaults to the spacing that spans one degree
    across the grid (DTED level 0/1/2 for 121/1201/3601 points).
    """
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("DTED expects a single 2-D band")
    nlat, nlon = a.shape
    a = a.astype(np.int64)
    if a.min() < -32767 or a.max() > 32767:
        raise ValueError("elevations exceed signed-magnitude 15-bit range")
    if interval_arcsec is None:
        interval_arcsec = 3600.0 / (nlon - 1) if nlon > 1 else 30.0
    tenths = min(int(round(interval_arcsec * 10)), 9999)  # 4-char field

    uhl = bytearray(b" " * _UHL_SIZE)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _fmt_angle(lon0)
    uhl[12:20] = _fmt_angle(lat0, lat=True)
    uhl[20:24] = b"%04d" % tenths
    uhl[24:28] = b"%04d" % tenths
    uhl[28:32] = b"NA  "                       # vertical accuracy
    uhl[32:35] = b"U  "                        # security
    uhl[47:51] = b"%04d" % nlon
    uhl[51:55] = b"%04d" % nlat
    uhl[55:56] = b"0"                          # multiple accuracy

    dsi = bytearray(b" " * _DSI_SIZE)
    dsi[0:3] = b"DSI"
    dsi[3:4] = b"U"
    acc = bytearray(b" " * _ACC_SIZE)
    acc[0:3] = b"ACC"

    out = bytearray(uhl + dsi + acc)
    south_first = a[::-1, :]
    mag = np.abs(south_first).astype(np.uint16)
    mag[south_first < 0] |= 0x8000
    for col in range(nlon):
        rec = bytearray(8)
        rec[0] = 0xAA
        rec[1:4] = col.to_bytes(3, "big")
        rec[4:6] = col.to_bytes(2, "big")
        rec[6:8] = (0).to_bytes(2, "big")
        rec += np.ascontiguousarray(mag[:, col]).astype(">u2").tobytes()
        rec += sum(rec).to_bytes(4, "big")
        out += rec
    return bytes(out)


_HGT_NAME = re.compile(r"([NSns])(\d{1,2})([EWew])(\d{1,3})")


def parse_hgt_name(name):
    """``N43W080``-style cell name → SW corner (lat, lon)."""
    m = _HGT_NAME.search(os.path.basename(str(name)))
    if not m:
        raise ValueError(f"cannot parse HGT cell name from {name!r}")
    lat = int(m.group(2)) * (1 if m.group(1) in "Nn" else -1)
    lon = int(m.group(4)) * (1 if m.group(3) in "Ee" else -1)
    return lat, lon


def read_hgt(src, name=None):
    """SRTM ``.hgt`` path (or bytes + cell name) → (int16 array north
    row first, geotransform, nodata)."""
    if isinstance(src, (bytes, bytearray)):
        buf = bytes(src)
        if name is None:
            raise ValueError("cell name required with raw HGT bytes")
    else:
        buf = open(src, "rb").read()
        name = src if name is None else name
    npts = int(round((len(buf) // 2) ** 0.5))
    if 2 * npts * npts != len(buf):
        raise ValueError("HGT size is not a square int16 grid")
    lat, lon = parse_hgt_name(name)
    arr = np.frombuffer(buf, ">i2").reshape(npts, npts).astype(np.int16)
    d = 1.0 / (npts - 1)
    gt = (lon - d / 2, d, 0.0, lat + 1 + d / 2, 0.0, -d)
    return arr, gt, HGT_NODATA


def write_hgt(arr, path=None, name=None):
    """int16 square grid (north row first) → SRTM HGT bytes; writes to
    ``path`` when given (filename must carry the cell name)."""
    a = np.asarray(arr, np.int16)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError("HGT expects a square 2-D int16 grid")
    buf = a.astype(">i2").tobytes()
    if path is not None:
        parse_hgt_name(name or path)           # validate early
        with open(path, "wb") as f:
            f.write(buf)
    return buf
