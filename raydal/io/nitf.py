"""NITF 2.0 / 2.1 / NSIF 1.0 reader and minimal writer, from scratch.

Implements the fixed-width MIL-STD-2500 container the reference reads
in ``frmts/nitf/nitffile.c`` + ``nitfimage.c``:

* file header for NITF02.10/NSIF01.00 (security block at 119..286),
  NITF02.00 (40-char security fields + conditional FSDEVT when
  FSDWNG == 999998) and NITF01.xx (header-length field at offset 394);
  segment index (IM 6+10, GR 4+6, LA 4+3, TX 4+5, DE 4+9, RE 4+7) and
  file-level UDHD/XHD TREs,
* image subheader: both security layouts, ICORDS/IGEOLO corner
  parsing (G/C sexagesimal, D decimal, N/S UTM), comments, IC/COMRAT,
  band table with LUTs (mono LUT morphed to RGB like the reference),
  ISYNC/IMODE/NBPR/NBPC/NPPBH/NPPBV/NBPP, image TREs,
* pixel access: uncompressed NC/NM in IMODE B, P, S and R with
  big-endian words, the whole-block 1-bit packing special case
  (nitfimage.c NITFReadImageBlock), NM/M3 block-offset mask tables
  (IMDATOFF/BMRLNTH/TPXCD nodata) with 0xFFFFFFFF missing blocks, and
  C3/M3 JPEG blocks decoded by :mod:`raydal.io.jpeg`,
* georeferencing: the four IGEOLO corners become pixel-center GCPs
  (0.5-offset, nitfdataset.cpp:1190 ``bIsBoxCenterOfPixel``) fed to
  the repo's GDALGCPsToGeoTransform parity
  (:func:`raydal.geo.gcp.gcps_to_geotransform`),
* writer: minimal NITF02.10 with one uncompressed IMODE=B image
  segment (8/16-bit), ICORDS=D corner coordinates from a
  north-up geotransform.

* C1/M1 bilevel fax blocks decode through the from-scratch ITU-T
  T.4 codec (:mod:`raydal.io.ccitt`; 2D when COMRAT starts with '2',
  per nitfbilevel.cpp's GROUP3OPT_2DENCODING mapping).

Out of scope (documented NotImplementedError boundaries): C4
VQ/CADRG, C8 JPEG2000, 2/4/12-bit packing, graphic/text segment
payloads (counted, not decoded).

Goldens: autotest/gdrivers/nitf.py — rgb.ntf band 3 checksum 21349 +
WGS84 geotransform, i_3034c.ntf / i_3034f.ntf / ns3034d.nsf checksum
170 (1-bit), fake_nsif.ntf BLOCKA TRE string, U_0006A.NTF zero image
segments, U_0002A.NTF header-only rejection.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..geo.gcp import gcps_to_geotransform
from .ccitt import decode_g3
from .jpeg import decode_jpeg

__all__ = ["nitf_info", "read_nitf", "write_nitf"]

_UINT_MAX = 0xFFFFFFFF


def _f(buf, off, n):
    """Fixed-width ASCII field, trailing spaces preserved (use .strip()
    at call sites that want the trimmed value)."""
    return buf[off:off + n].decode("latin-1")


def _fi(buf, off, n):
    s = _f(buf, off, n).strip()
    return int(s) if s else 0


class _Seg:
    __slots__ = ("stype", "header_start", "header_size", "data_start",
                 "data_size")


def _parse_tres(data: bytes) -> dict:
    """Concatenated TREs: TAG(6) + LEN(5) + payload."""
    out = {}
    pos = 0
    while pos + 11 <= len(data):
        tag = data[pos:pos + 6].decode("latin-1").strip()
        try:
            ln = int(data[pos + 6:pos + 11])
        except ValueError:
            break
        payload = data[pos + 11:pos + 11 + ln].decode("latin-1")
        if tag and tag not in out:
            out[tag] = payload
        pos += 11 + ln
    return out


def _collect_segments(hdr, off, stype, hsz, dsz, next_data, segs):
    count = _fi(hdr, off, 3)
    off += 3
    nd = next_data[0]
    for _ in range(count):
        s = _Seg()
        s.stype = stype
        s.header_size = _fi(hdr, off, hsz)
        s.data_size = _fi(hdr, off + hsz, dsz)
        s.header_start = nd
        s.data_start = nd + s.header_size
        nd += s.header_size + s.data_size
        segs.append(s)
        off += hsz + dsz
    next_data[0] = nd
    return off


def _parse_igeolo(icords, igeolo):
    """Four corner (x, y) pairs per nitfimage.c:263-341."""
    corners = []
    zone = 0
    for i in range(4):
        cp = igeolo[i * 15:(i + 1) * 15]
        if icords in ("G", "C"):
            y = (int(cp[0:2]) + int(cp[2:4]) / 60.0 +
                 int(cp[4:6]) / 3600.0)
            if cp[6:7] in ("s", "S"):
                y = -y
            x = (int(cp[7:10]) + int(cp[10:12]) / 60.0 +
                 int(cp[12:14]) / 3600.0)
            if cp[14:15] in ("w", "W"):
                x = -x
        elif icords == "D":
            y = float(cp[0:7])
            x = float(cp[7:15])
        elif icords in ("N", "S"):
            zone = int(cp[0:2])
            x = float(cp[2:8])
            y = float(cp[8:15])
        else:
            raise NotImplementedError(
                f"ICORDS {icords!r} (MGRS) not supported")
        corners.append((x, y))
    return corners, zone


def _parse_image_subheader(hdr, version):
    im = {}
    if hdr[:2] != b"IM":
        raise ValueError("image subheader does not start with IM")
    im["IID1"] = _f(hdr, 2, 10).strip()
    im["IDATIM"] = _f(hdr, 12, 14).strip()
    im["IID2"] = _f(hdr, 43, 80).strip()
    off = 0
    if version.startswith("NITF02.10") or version.startswith("NSIF"):
        base = 372            # ISORCE at 291, NROWS at 333+16? see below
        # layout: ... ENCRYP(1)@290, ISORCE(42)@291, NROWS@333
        nrows_off = 333
    else:
        # NITF 2.0 / 1.x: conditional ISDEVT when ISDWNG == 999998
        off = 40 if _f(hdr, 284, 6) == "999998" else 0
        nrows_off = 333 + off
    im["NROWS"] = _fi(hdr, nrows_off, 8)
    im["NCOLS"] = _fi(hdr, nrows_off + 8, 8)
    im["PVTYPE"] = _f(hdr, nrows_off + 16, 3).strip()
    im["IREP"] = _f(hdr, nrows_off + 19, 8).strip()
    im["ICAT"] = _f(hdr, nrows_off + 27, 8).strip()
    im["ABPP"] = _fi(hdr, nrows_off + 35, 2)
    # PJUST(1), then ICORDS
    pos = nrows_off + 38
    icords = _f(hdr, pos, 1)
    pos += 1
    # NITF 2.0 treats 'N' as "no coordinates"
    if not (version.startswith("NITF02.10") or version.startswith("NSIF")) \
            and icords == "N":
        icords = " "
    im["ICORDS"] = icords
    corners = None
    zone = 0
    if icords != " ":
        igeolo = _f(hdr, pos, 60)
        pos += 60
        im["IGEOLO"] = igeolo
        try:
            corners, zone = _parse_igeolo(icords, igeolo)
        except (ValueError, NotImplementedError):
            corners = None
    im["corners"] = corners
    im["zone"] = zone
    nicom = _fi(hdr, pos, 1)
    pos += 1 + 80 * nicom
    im["IC"] = _f(hdr, pos, 2)
    pos += 2
    if im["IC"][0] not in ("N",):
        im["COMRAT"] = _f(hdr, pos, 4).strip()
        pos += 4
    nbands = _fi(hdr, pos, 1)
    pos += 1
    if nbands == 0:
        nbands = _fi(hdr, pos, 5)
        pos += 5
    im["NBANDS"] = nbands
    luts = []
    for _b in range(nbands):
        irepband = _f(hdr, pos, 2).strip()
        pos += 2
        _isubcat = _f(hdr, pos, 6)
        pos += 6
        pos += 4                       # IFC + IMFLT
        nluts = _fi(hdr, pos, 1)
        pos += 1
        lut = None
        if nluts:
            nelut = min(_fi(hdr, pos, 5), 256)
            pos += 5
            tabs = []
            for _l in range(nluts):
                tabs.append(np.frombuffer(
                    hdr[pos:pos + nelut], np.uint8).copy())
                pos += nelut
            if nluts >= 3:
                lut = tabs[:3]
            else:                      # grey LUT morphs to RGB
                lut = [tabs[0], tabs[0], tabs[0]]
        luts.append((irepband, lut))
    im["bands"] = luts
    pos += 1                           # ISYNC
    imode = _f(hdr, pos, 1)
    pos += 1
    im["IMODE"] = imode
    im["NBPR"] = _fi(hdr, pos, 4)
    im["NBPC"] = _fi(hdr, pos + 4, 4)
    im["NPPBH"] = _fi(hdr, pos + 8, 4)
    im["NPPBV"] = _fi(hdr, pos + 12, 4)
    im["NBPP"] = _fi(hdr, pos + 16, 2)
    pos += 18
    # MIL-STD-2500C 5.4.2.2-d: 0 block size with 1 block means full size
    if im["NBPR"] == 1 and im["NPPBH"] == 0:
        im["NPPBH"] = im["NCOLS"]
    if im["NBPC"] == 1 and im["NPPBV"] == 0:
        im["NPPBV"] = im["NROWS"]
    if im["ABPP"] == 0:
        im["ABPP"] = im["NBPP"]
    im["IDLVL"] = _fi(hdr, pos, 3)
    pos += 3 + 3 + 10 + 4              # IALVL, ILOC, IMAG
    # image TREs: UDIDL / IXSHDL
    tre = {}
    if pos + 10 <= len(hdr):
        udidl = _fi(hdr, pos, 5)
        pos += 5
        if udidl > 3:
            tre.update(_parse_tres(hdr[pos + 3:pos + udidl]))
        pos += max(udidl, 0)
        if pos + 5 <= len(hdr):
            ixshdl = _fi(hdr, pos, 5)
            pos += 5
            if ixshdl > 3:
                tre.update(_parse_tres(hdr[pos + 3:pos + ixshdl]))
    im["TRE"] = tre
    return im


def nitf_info(path):
    """Parse the container: returns a dict with ``version``, file
    ``tre`` dict, ``images`` (parsed subheaders), ``segments``
    (type/offset/size list) and ``cgm_segment_count``."""
    with open(path, "rb") as f:
        head = f.read(400)
        if len(head) < 360 or not (head.startswith(b"NITF") or
                                   head.startswith(b"NSIF")):
            raise ValueError("not an NITF/NSIF file")
        version = head[:9].decode("latin-1")
        if version.startswith("NITF01.") or head[280:286] == b"999998":
            hlen_off = 394
        else:
            hlen_off = 354
        f.seek(hlen_off)
        hlen = int(f.read(6))
        if hlen < hlen_off:
            raise ValueError("invalid NITF header length")
        f.seek(0)
        hdr = f.read(hlen)
        if len(hdr) < hlen:
            raise ValueError("truncated NITF header")

    segs: list[_Seg] = []
    next_data = [hlen]
    off = hlen_off + 6
    off = _collect_segments(hdr, off, "IM", 6, 10, next_data, segs)
    off = _collect_segments(hdr, off, "GR", 4, 6, next_data, segs)
    off = _collect_segments(hdr, off, "LA", 4, 3, next_data, segs)
    off = _collect_segments(hdr, off, "TX", 4, 5, next_data, segs)
    off = _collect_segments(hdr, off, "DE", 4, 9, next_data, segs)
    off = _collect_segments(hdr, off, "RE", 4, 7, next_data, segs)

    tre = {}
    if hlen >= off + 5:
        udhdl = _fi(hdr, off, 5)
        off += 5
        if udhdl > 3:
            tre.update(_parse_tres(hdr[off + 3:off + udhdl]))
        off += max(udhdl, 0)
        if hlen > off + 8:
            xhdl = _fi(hdr, off, 5)
            off += 5
            if xhdl > 3:
                tre.update(_parse_tres(hdr[off + 3:off + xhdl]))

    images = []
    with open(path, "rb") as f:
        for s in segs:
            if s.stype != "IM":
                continue
            f.seek(s.header_start)
            sub = f.read(s.header_size)
            im = _parse_image_subheader(sub, version)
            im["_data_start"] = s.data_start
            im["_data_size"] = s.data_size
            images.append(im)

    # the reference dataset's "TRE" metadata domain merges file-level
    # TREs with the first image segment's (nitfdataset.cpp InitializeTREMetadata)
    merged = dict(tre)
    if images:
        for k, v in images[0]["TRE"].items():
            merged.setdefault(k, v)

    return {
        "version": version,
        "tre": merged,
        "file_tre": tre,
        "images": images,
        "segments": [(s.stype, s.header_start, s.header_size,
                      s.data_start, s.data_size) for s in segs],
        "cgm_segment_count": sum(1 for s in segs if s.stype == "GR"),
    }


def _dtype_of(im):
    pv, nbpp = im["PVTYPE"], im["NBPP"]
    if pv == "B" or nbpp == 1:
        return np.dtype(np.uint8), 1
    word = 1 if nbpp <= 8 else (2 if nbpp <= 16 else
                                (4 if nbpp <= 32 else nbpp // 8))
    if pv == "R":
        return (np.dtype(">f4") if word == 4 else np.dtype(">f8")), word
    if pv == "SI":
        return np.dtype({1: ">i1", 2: ">i2", 4: ">i4",
                         8: ">i8"}[word]), word
    return np.dtype({1: ">u1", 2: ">u2", 4: ">u4", 8: ">u8"}[word]), word


def _block_starts(f, im, nbands):
    """Per-band block start offsets, UINT_MAX for missing (mask table
    semantics of nitfimage.c)."""
    nbpr, nbpc = im["NBPR"], im["NBPC"]
    w, h = im["NPPBH"], im["NPPBV"]
    word = max(1, im["NBPP"] // 8)
    ic = im["IC"].strip()
    imode = im["IMODE"]
    if imode == "S":
        line = w * im["NBPP"] // 8
        block = line * h
        band_off = block * nbpr * nbpc
        pixel = word
    elif imode == "P":
        pixel = word * nbands
        line = w * im["NBPP"] * nbands // 8
        band_off = word
        block = line * h
    elif imode == "R":
        pixel = word
        band_off = w * im["NBPP"] // 8
        line = band_off * nbands
        block = line * h
    else:                              # B
        pixel = word
        line = w * im["NBPP"] // 8
        band_off = h * line
        block = band_off * nbands
    layout = {"pixel": pixel, "line": line, "band": band_off,
              "block": block, "word": word}

    n = nbpr * nbpc * nbands
    starts = np.zeros(n, np.uint64)
    nodata = None
    if "M" in ic:                      # NM / M3: mask table
        f.seek(im["_data_start"])
        imdatoff, bmrlnth, _tmrlnth, tpxcdlnth = struct.unpack(
            ">IHHH", f.read(10))
        if tpxcdlnth == 8:
            nodata = f.read(1)[0]
        else:
            f.seek((tpxcdlnth + 7) // 8, os.SEEK_CUR)
        base = im["_data_start"] + imdatoff
        if bmrlnth == 4 and imode == "P":
            stored = nbpr * nbpc
            offs = np.frombuffer(f.read(4 * stored), ">u4")
            for i in range(stored):
                if offs[i] == _UINT_MAX:
                    starts[i::stored] = _UINT_MAX
                else:
                    for b in range(nbands):
                        starts[i + b * stored] = (base + int(offs[i]) +
                                                  b * band_off)
        elif bmrlnth == 4:
            offs = np.frombuffer(f.read(4 * n), ">u4")
            starts = np.where(offs == _UINT_MAX, np.uint64(_UINT_MAX),
                              offs.astype(np.uint64) + np.uint64(base))
        else:
            for by in range(nbpc):
                for bx in range(nbpr):
                    for b in range(nbands):
                        i = bx + by * nbpr + b * nbpr * nbpc
                        starts[i] = (base + (bx + by * nbpr) * block +
                                     b * band_off)
    else:
        for by in range(nbpc):
            for bx in range(nbpr):
                for b in range(nbands):
                    i = bx + by * nbpr + b * nbpr * nbpc
                    starts[i] = (im["_data_start"] +
                                 (bx + by * nbpr) * block + b * band_off)
    return starts, layout, nodata


def read_nitf(path, image=0):
    """→ (array [bands, h, w], geotransform or None, nodata or None).

    1-bit data promotes to uint8 0/1 (the reference raster band does
    the same before checksumming)."""
    info = nitf_info(path)
    if not info["images"]:
        raise ValueError("NITF file has no image segments")
    im = info["images"][image]
    nbands = im["NBANDS"]
    rows, cols = im["NROWS"], im["NCOLS"]
    ic = im["IC"].strip()
    dt, word = _dtype_of(im)

    if ic in ("C1", "M1"):
        # bilevel fax (nitfbilevel.cpp: G3, 2D when COMRAT starts '2')
        two_d = im.get("COMRAT", "").startswith("2")
        out = np.zeros((nbands, rows, cols), np.uint8)
        with open(path, "rb") as f:
            f.seek(im["_data_start"])
            data = f.read(im["_data_size"])
        blk = decode_g3(data, im["NPPBH"], im["NPPBV"], two_d=two_d)
        out[0] = blk[:rows, :cols]
        return out, _geotransform(im), None
    if ic in ("C4", "M4"):
        raise NotImplementedError("NITF VQ (C4/CADRG) compression")
    if ic in ("C8", "M8"):
        raise NotImplementedError("NITF JPEG2000 (C8)")

    out = np.zeros((nbands, rows, cols),
                   dt.newbyteorder("="))
    with open(path, "rb") as f:
        if im["NBPP"] == 1:
            # whole-image single block, bit-packed per band; NM data
            # starts after the mask table (panBlockStart[0])
            npx = im["NPPBH"] * im["NPPBV"]
            nbytes = (npx + 7) // 8
            starts, _lay, _nd = _block_starts(f, im, nbands)
            f.seek(int(starts[0]))
            for b in range(nbands):
                raw = np.frombuffer(f.read(nbytes), np.uint8)
                bits = np.unpackbits(raw)[:npx]
                blk = bits.reshape(im["NPPBV"], im["NPPBH"])
                out[b] = blk[:rows, :cols]
            gt = _geotransform(im)
            return out, gt, None

        starts, lay, nodata = _block_starts(f, im, nbands)
        nbpr, nbpc = im["NBPR"], im["NBPC"]
        bw, bh = im["NPPBH"], im["NPPBV"]
        for by in range(nbpc):
            for bx in range(nbpr):
                if ic in ("C3", "M3"):
                    i = bx + by * nbpr
                    if starts[i] == _UINT_MAX:
                        continue
                    f.seek(int(starts[i]))
                    # JPEG stream runs to the next block / segment end
                    later = [int(s) for s in starts
                             if int(s) > int(starts[i]) and
                             s != _UINT_MAX]
                    end = min(later) if later else (
                        im["_data_start"] + im["_data_size"])
                    px = decode_jpeg(f.read(end - int(starts[i])))
                    if px.ndim == 2:
                        px = px[:, :, None]
                    y0, x0 = by * bh, bx * bw
                    sy = min(bh, rows - y0)
                    sx = min(bw, cols - x0)
                    for b in range(min(nbands, px.shape[2])):
                        out[b, y0:y0 + sy, x0:x0 + sx] = \
                            px[:sy, :sx, b]
                    continue
                for b in range(nbands):
                    i = bx + by * nbpr + b * nbpr * nbpc
                    if starts[i] == _UINT_MAX:
                        if nodata is not None:
                            y0, x0 = by * bh, bx * bw
                            out[b, y0:y0 + bh, x0:x0 + bw] = nodata
                        continue
                    f.seek(int(starts[i]))
                    if im["IMODE"] == "P":
                        raw = f.read(lay["line"] * bh)
                        blk = np.frombuffer(raw, dt, count=bw * bh *
                                            nbands)
                        blk = blk.reshape(bh, bw, nbands)[:, :, b]
                    else:
                        raw = f.read(lay["line"] * bh)
                        blk = np.frombuffer(
                            raw, dt, count=bw * bh).reshape(bh, bw)
                    y0, x0 = by * bh, bx * bw
                    sy = min(bh, rows - y0)
                    sx = min(bw, cols - x0)
                    out[b, y0:y0 + sy, x0:x0 + sx] = blk[:sy, :sx]

    gt = _geotransform(im)
    nd = float(nodata) if nodata is not None else None
    return out, gt, nd


def _geotransform(im):
    corners = im.get("corners")
    if not corners:
        return None
    if all(x == 0 for x, _ in corners):
        return None
    w, h = im["NCOLS"], im["NROWS"]
    # IGEOLO corners are pixel centers (nitfdataset.cpp:1190)
    px = [(0.5, 0.5), (w - 0.5, 0.5), (w - 0.5, h - 0.5),
          (0.5, h - 0.5)]
    gcps = [(p, l, x, y) for (p, l), (x, y) in zip(px, corners)]
    try:
        return gcps_to_geotransform(gcps)
    except Exception:
        return None


def write_nitf(path, arr, gt=None):
    """Minimal NITF02.10 writer: one image segment, uncompressed
    IMODE=B, 8- or 16-bit unsigned, ICORDS=D corners from a north-up
    geotransform (nitffile.c NITFCreate analog)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[None]
    nbands, rows, cols = a.shape
    if a.dtype == np.uint8:
        nbpp, dt = 8, np.dtype(">u1")
    elif a.dtype in (np.uint16, np.dtype(">u2"), np.dtype("<u2")):
        nbpp, dt = 16, np.dtype(">u2")
    else:
        raise NotImplementedError(
            f"write_nitf supports uint8/uint16, not {a.dtype}")

    def F(val, n):
        s = str(val)
        if len(s) > n:
            raise ValueError(f"field overflow: {s!r} > {n}")
        return s.ljust(n).encode("ascii")

    def Z(val, n):
        return str(int(val)).rjust(n, "0").encode("ascii")

    sec21 = (b" " +                      # CLAS
             b" " * 2 + b" " * 11 + b" " * 2 + b" " * 20 + b" " * 2 +
             b" " * 8 + b" " * 4 + b" " + b" " * 8 + b" " * 43 + b" " +
             b" " * 40 + b" " + b" " * 8 + b" " * 15)

    icords = b"D" if gt is not None else b" "
    igeolo = b""
    if gt is not None:
        w, h = cols, rows

        def corner(px, ln):
            x = gt[0] + px * gt[1] + ln * gt[2]
            y = gt[3] + px * gt[4] + ln * gt[5]
            # ICORDS=D: ±dd.ddd (7) then ±ddd.ddd (8)
            return f"{y:+07.3f}".encode() + f"{x:+08.3f}".encode()
        igeolo = (corner(0.5, 0.5) + corner(w - 0.5, 0.5) +
                  corner(w - 0.5, h - 0.5) + corner(0.5, h - 0.5))

    sub = bytearray()
    sub += b"IM" + F("", 10) + F("", 14) + F("", 17) + F("", 80)
    sub += sec21
    sub += b"0"                           # ENCRYP
    sub += F("", 42)                      # ISORCE
    sub += Z(rows, 8) + Z(cols, 8)
    sub += F("INT", 3)
    sub += F("MULTI" if nbands > 1 else "MONO", 8)    # IREP
    sub += F("VIS", 8)
    sub += Z(nbpp, 2) + b"R"
    sub += icords + igeolo
    sub += b"0"                           # NICOM
    sub += b"NC"                          # IC
    sub += Z(nbands, 1) if nbands < 10 else b"0" + Z(nbands, 5)
    for _b in range(nbands):
        sub += F("M", 2) + F("", 6) + F("N", 1) + F("", 3) + b"0"
    sub += b"1"                           # ISYNC (unused, 1 per spec 0?)
    sub = sub[:-1] + b"0"                 # ISYNC must be 0
    sub += b"B"                           # IMODE
    sub += Z(1, 4) + Z(1, 4) + Z(cols, 4) + Z(rows, 4)
    sub += Z(nbpp, 2)
    sub += Z(1, 3) + Z(0, 3) + Z(0, 10) + b"1.0 "
    sub += Z(0, 5) + Z(0, 5)              # UDIDL, IXSHDL
    sub = bytes(sub)

    data = a.astype(dt).tobytes()

    hdr = bytearray()
    hdr += b"NITF02.10" + b"03" + b"BF01"
    hdr += F("RAYDAL", 10) + F("20260101000000", 14) + F("", 80)
    hdr += sec21
    hdr += Z(0, 5) + Z(0, 5)              # FSCOP, FSCPYS
    hdr += b"0"                           # ENCRYP
    hdr += bytes([0, 0, 0])               # FBKGC
    hdr += F("", 24) + F("", 18)          # ONAME, OPHONE
    # FL(12) HL(6) placeholders
    fl_off = len(hdr)
    hdr += b"0" * 12 + b"0" * 6
    hdr += Z(1, 3) + Z(len(sub), 6) + Z(len(data), 10)   # NUMI + LISH/LI
    hdr += Z(0, 3)                        # NUMS
    hdr += Z(0, 3)                        # NUMX
    hdr += Z(0, 3)                        # NUMT
    hdr += Z(0, 3)                        # NUMDES
    hdr += Z(0, 3)                        # NUMRES
    hdr += Z(0, 5) + Z(0, 5)              # UDHDL, XHDL
    hl = len(hdr)
    fl = hl + len(sub) + len(data)
    hdr[fl_off:fl_off + 12] = str(fl).rjust(12, "0").encode()
    hdr[fl_off + 12:fl_off + 18] = str(hl).rjust(6, "0").encode()

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(hdr) + sub + data)
    os.replace(tmp, path)
    return path
