"""Fixed-header raw raster drivers: Erdas LAN, PCI PAux, NRCan BYN,
Autopano KRO, Terragen — from scratch on each published layout.

Reference semantics (all under ``frmts/raw/`` unless noted):

* **LAN** (``landataset.cpp:25-80``): 128-byte header, magic
  ``HEADER`` (float32 dims) or ``HEAD74`` (int32 dims); pixel type
  0=8bit, 1=4bit (two pixels/byte, high nibble first,
  landataset.cpp:220-229), 2=16bit; BIL interleave; byte order
  detected from header[8] (landataset.cpp:386-389); geotransform
  from the UL-center floats at offsets 112-124 with the half-pixel
  shift (landataset.cpp:517-529).
* **PAux** (``pauxdataset.cpp``): text ``.aux`` sidecar —
  ``RawDefinition: cols rows bands`` and per-band
  ``ChanDefinition-N: type imgoff pixoff lineoff [Swapped]``
  (pauxdataset.cpp:631-679; types 8U/16U/16S/32R, "Swapped" =
  little-endian); UpLeftX/Y + LoRightX/Y corners give the
  geotransform.
* **BYN** (``byndataset.cpp:465-497`` header, ``:262-320`` open):
  80-byte little-endian header; dims
  ``(east-west+1)/dlon + 1`` (arcsec, x0.001 when nScale=1);
  geotransform in degrees with half-cell extension
  (byndataset.cpp:314-319); Int16 nodata 32767, Int32 nodata
  9999*factor (byndataset.cpp:78).
* **KRO** (``krodataset.cpp:94-215``): ``KRO\\x01`` + big-endian
  int32 xsize/ysize/depth-bits/ncomp; pixel-interleaved big-endian
  samples at offset 20; depth 8→uint8, 16→uint16, 32→float32.
* **Terragen** (``terragen/terragendataset.cpp:691-780``): 16-byte
  magic then chunked SIZE/XPTS/YPTS/SCAL/ALTW; ALTW carries
  heightscale+baseheight then raw int16 rows stored bottom-up
  (IReadBlock flip, terragendataset.cpp:250-257); the read-only
  band surfaces the RAW int16 values (eDataType GDT_Int16,
  terragendataset.cpp:228) with scale/offset as metadata.

Published parity (``autotest/gdrivers/{lan,paux,byn,kro,terragen}
.py``): fakelan.lan / fakelan4bit.lan = 10, small16.raw band 2 =
12816, cgg2013ai08_reduced.byn = 64764, float32.ter = 1128; KRO has
creation round-trips (rgbsmall 21053, uint16/float32 4672).
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

__all__ = ["read_lan", "read_paux", "read_byn", "read_kro",
           "write_kro", "read_terragen", "read_leveller",
           "read_ace2", "read_gtx", "read_snodas", "read_lcp",
           "read_rst", "read_doq2", "read_saga", "read_ngsgeoid",
           "read_loslas", "read_ndf", "read_eir"]


def _load(src):
    if isinstance(src, (bytes, bytearray, memoryview)):
        return bytes(src)
    with open(src, "rb") as f:
        return f.read()


# ------------------------------------------------------------- LAN

def read_lan(src):
    """Erdas LAN/GIS → (array[bands, h, w], geotransform, None)."""
    buf = _load(src)
    magic = buf[:6]
    if magic not in (b"HEADER", b"HEAD74"):
        raise ValueError("not an Erdas LAN file")
    # byte order from the low byte of the band count (landataset.cpp:386)
    bo = ">" if buf[8] == 0 else "<"
    pixtype, nbands = struct.unpack_from(bo + "hh", buf, 6)
    if magic == b"HEADER":
        w = int(struct.unpack_from(bo + "f", buf, 16)[0])
        h = int(struct.unpack_from(bo + "f", buf, 20)[0])
    else:
        w, h = struct.unpack_from(bo + "ii", buf, 16)
    ulx, uly, dx, dy = struct.unpack_from(bo + "4f", buf, 112)
    gt = None
    if dx != 0.0 and dy != 0.0:
        gt = (ulx - dx * 0.5, dx, 0.0, uly + dy * 0.5, 0.0, -dy)
    if pixtype == 0:
        line = w
        raw = np.frombuffer(buf, np.uint8, count=line * nbands * h,
                            offset=128).reshape(h, nbands, w)
        arr = raw.transpose(1, 0, 2)
    elif pixtype == 1:              # 4-bit: high nibble first
        line = (w + 1) // 2
        raw = np.frombuffer(buf, np.uint8, count=line * nbands * h,
                            offset=128).reshape(h, nbands, line)
        hi, lo = raw >> 4, raw & 0x0F
        pix = np.empty((h, nbands, line * 2), np.uint8)
        pix[:, :, 0::2] = hi
        pix[:, :, 1::2] = lo
        arr = pix[:, :, :w].transpose(1, 0, 2)
    elif pixtype == 2:
        line = w
        raw = np.frombuffer(buf, np.dtype(bo + "i2"),
                            count=line * nbands * h,
                            offset=128).reshape(h, nbands, w)
        arr = raw.transpose(1, 0, 2)
    else:
        raise ValueError(f"unsupported LAN pixel type {pixtype}")
    return np.ascontiguousarray(arr), gt, None


# ------------------------------------------------------------ PAux

_PAUX_TYPES = {"8U": np.uint8, "16U": "u2", "16S": "i2", "32R": "f4"}


def read_paux(src):
    """PCI .aux + raw pair (path to the RAW file) →
    (array[bands, h, w], geotransform, None)."""
    aux_path = None
    for cand in (str(src) + ".aux",
                 os.path.splitext(str(src))[0] + ".aux"):
        if os.path.exists(cand):
            aux_path = cand
            break
    if aux_path is None:
        raise ValueError(f"no .aux sidecar for {src}")
    with open(aux_path) as f:
        text = f.read()

    def field(key):
        m = re.search(rf"^{key}:\s*(.*)$", text, re.M)
        return m.group(1).strip() if m else None

    cols, rows, nbands = map(int, field("RawDefinition").split())
    buf = _load(src)
    bands = []
    for i in range(1, nbands + 1):
        toks = field(f"ChanDefinition-{i}").split()
        base = _PAUX_TYPES[toks[0]]
        imgoff, pixoff, lineoff = map(int, toks[1:4])
        if isinstance(base, str):
            endian = "<" if (len(toks) > 4 and
                             toks[4].lower() == "swapped") else ">"
            dt = np.dtype(endian + base)
        else:
            dt = np.dtype(base)
        b = np.empty((rows, cols), dt)
        for r in range(rows):
            off = imgoff + r * lineoff
            row = np.frombuffer(buf, dt,
                                count=(cols - 1) * pixoff //
                                dt.itemsize + 1, offset=off)
            b[r] = row[::pixoff // dt.itemsize][:cols]
        bands.append(b)
    gt = None
    if field("UpLeftX") is not None:
        ulx, uly = float(field("UpLeftX")), float(field("UpLeftY"))
        lrx, lry = float(field("LoRightX")), float(field("LoRightY"))
        gt = (ulx, (lrx - ulx) / cols, 0.0,
              uly, 0.0, (lry - uly) / rows)
    return np.stack(bands), gt, None


# ------------------------------------------------------------- BYN

def read_byn(src):
    """NRCan BYN geoid grid → (array[1, h, w], geotransform, nodata)."""
    buf = _load(src)
    south, north, west, east = struct.unpack_from("<4i", buf, 0)
    dlat, dlon = struct.unpack_from("<2h", buf, 16)
    factor = struct.unpack_from("<d", buf, 24)[0]
    sizeof = struct.unpack_from("<h", buf, 32)[0]
    byteorder, scale = struct.unpack_from("<2h", buf, 48)
    s = 0.001 if scale == 1 else 1.0
    fs, fn = south * s, north * s
    fw, fe = west * s, east * s
    fdlat, fdlon = dlat * s, dlon * s
    if fdlat == 0 or fdlon == 0:
        raise ValueError("BYN zero spacing")
    nx = int((fe - fw + 1.0) / fdlon + 1.0)
    ny = int((fn - fs + 1.0) / fdlat + 1.0)
    gt = ((fw - fdlon / 2) / 3600.0, fdlon / 3600.0, 0.0,
          (fn + fdlat / 2) / 3600.0, 0.0, -fdlat / 3600.0)
    bo = "<" if byteorder == 1 else ">"
    if sizeof == 2:
        dt, nodata = np.dtype(bo + "i2"), 32767.0
    elif sizeof == 4:
        dt, nodata = np.dtype(bo + "i4"), 9999.0 * factor
    else:
        raise ValueError(f"unsupported BYN sample size {sizeof}")
    arr = np.frombuffer(buf, dt, count=nx * ny, offset=80) \
        .reshape(ny, nx)
    return arr[None], gt, nodata


# ------------------------------------------------------------- KRO

_KRO_DT = {8: np.dtype(">u1"), 16: np.dtype(">u2"),
           32: np.dtype(">f4")}


def read_kro(src):
    """Autopano KRO → (array[bands, h, w], None, None)."""
    buf = _load(src)
    if buf[:4] != b"KRO\x01":
        raise ValueError("not a KRO file")
    w, h, depth, ncomp = struct.unpack_from(">4i", buf, 4)
    if depth not in _KRO_DT:
        raise ValueError(f"unhandled KRO depth {depth}")
    dt = _KRO_DT[depth]
    arr = np.frombuffer(buf, dt, count=w * h * ncomp, offset=20) \
        .reshape(h, w, ncomp).transpose(2, 0, 1)
    return np.ascontiguousarray(arr), None, None


def write_kro(arr, path):
    """array[bands, h, w] (uint8/uint16/float32) → KRO file."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[None]
    nb, h, w = a.shape
    if a.dtype == np.uint8:
        depth, dt = 8, ">u1"
    elif a.dtype == np.uint16:
        depth, dt = 16, ">u2"
    elif a.dtype == np.float32:
        depth, dt = 32, ">f4"
    else:
        raise ValueError(f"KRO cannot store dtype {a.dtype}")
    with open(path, "wb") as f:
        f.write(b"KRO\x01" + struct.pack(">4i", w, h, depth, nb))
        f.write(a.transpose(1, 2, 0).astype(dt).tobytes())
    return path


# -------------------------------------------------------- Terragen

def read_terragen(src):
    """Terragen .ter heightfield → (array[1, h, w] int16 raw values,
    None, None) plus per-band (scale, offset) left to the caller via
    the SCAL/ALTW metadata dict in the third slot."""
    buf = _load(src)
    if not buf.startswith(b"TERRAGENTERRAIN "):
        raise ValueError("not a Terragen terrain file")
    pos = 16
    nx = ny = None
    scal = 30.0
    while pos + 4 <= len(buf):
        tag = buf[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            n = struct.unpack_from("<H", buf, pos)[0]
            nx = ny = n + 1
            pos += 4                # value + pad
        elif tag == b"XPTS":
            nx = struct.unpack_from("<H", buf, pos)[0]
            pos += 4
        elif tag == b"YPTS":
            ny = struct.unpack_from("<H", buf, pos)[0]
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", buf, pos)[0]
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            hscale, base = struct.unpack_from("<hh", buf, pos)
            pos += 4
            arr = np.frombuffer(buf, "<i2", count=nx * ny,
                                offset=pos).reshape(ny, nx)[::-1]
            meta = {"scale": scal / 65536.0 * hscale,
                    "offset": scal * base}
            return arr[None], None, meta
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"unknown Terragen chunk {tag!r}")
    raise ValueError("no ALTW chunk in Terragen file")


# -------------------------------------------------------- Leveller

def read_leveller(src):
    """Leveller .ter heightfield → (array[1, h, w] float32, None,
    {scale, base}).

    Reference semantics (``frmts/leveller/levellerdataset.cpp``):
    ``trrn`` magic + version byte, then tags of the form
    [len-u8][name][datalen-u32-LE][data] (locate_data,
    levellerdataset.cpp:977-1022); the band surfaces the RAW
    ``hf_data`` float32 rows top-down (IReadBlock :520-560; versions
    < 6 store 16.16 fixed point /65536), with coordsys_em_scale/base
    exposed as band scale/offset, not applied.  Published parity:
    ter6test.ter checksum 33441 (``autotest/gdrivers/leveller.py``).
    """
    buf = _load(src)
    if buf[:4] != b"trrn":
        raise ValueError("not a Leveller terrain file")
    version = buf[4]
    tags = {}
    pos = 5
    while pos < len(buf):
        n = buf[pos]
        if n == 0 or n > 64:
            break
        name = buf[pos + 1:pos + 1 + n].decode("ascii", "replace")
        datalen = struct.unpack_from("<I", buf, pos + 1 + n)[0]
        off = pos + 1 + n + 4
        tags[name] = (off, datalen)
        pos = off + datalen

    def tag_int(name):
        off, ln = tags[name]
        return int.from_bytes(buf[off:off + ln], "little")

    w = tag_int("hf_w")
    h = tag_int("hf_b")
    off, ln = tags["hf_data"]
    if version >= 6:
        arr = np.frombuffer(buf, "<f4", count=w * h,
                            offset=off).reshape(h, w)
    else:
        arr = (np.frombuffer(buf, "<i4", count=w * h, offset=off)
               .astype(np.float32) / 65536.0).reshape(h, w)
    meta = {}
    for key, name in (("scale", "coordsys_em_scale"),
                      ("base", "coordsys_em_base")):
        if name in tags:
            o, ln2 = tags[name]
            meta[key] = struct.unpack_from("<d", buf, o)[0]
    return arr[None].astype(np.float32), None, meta or None


# ------------------------------------------------------------ ACE2

def read_ace2(path):
    """ACE2 tile → (array[1, n, n], geotransform, None).

    Reference semantics (``frmts/raw/ace2dataset.cpp``): the grid is
    headerless raw data whose geometry comes from the FILENAME —
    ``{lat}{N|S}{lon}{E|W}_{res}.ACE2`` is a 15°×15° tile anchored at
    that south-west corner; dims = sqrt(filesize/4) (float32 data;
    quality/confidence files are int16).  Published parity: the
    constructed 45N015E_5M fixture expects gt (15, 0.0833…, 0, 60,
    0, -0.0833…) and checksum 0 (``autotest/gdrivers/ace2.py``).
    """
    import os
    import re as _re

    name = os.path.basename(str(path))
    m = _re.match(r"(\d+)([NS])(\d+)([EW])_", name, _re.I)
    if not m:
        raise ValueError("ACE2 geometry is filename-encoded")
    lat = int(m.group(1)) * (1 if m.group(2).upper() == "N" else -1)
    lon = int(m.group(3)) * (1 if m.group(4).upper() == "E" else -1)
    buf = _load(path)
    n4 = int(round((len(buf) / 4) ** 0.5))
    if n4 * n4 * 4 == len(buf):
        n, dt = n4, np.dtype("<f4")
    else:
        n2 = int(round((len(buf) / 2) ** 0.5))
        if n2 * n2 * 2 != len(buf):
            raise ValueError("unexpected ACE2 file size")
        n, dt = n2, np.dtype("<i2")
    step = 15.0 / n
    gt = (float(lon), step, 0.0, float(lat) + 15.0, 0.0, -step)
    arr = np.frombuffer(buf, dt, count=n * n).reshape(n, n)
    return arr[None], gt, None


# ------------------------------------------------------------- GTX

def read_gtx(src):
    """NOAA .gtx vertical-datum shift grid → (array[1, h, w],
    geotransform, nodata).

    Reference semantics (``frmts/raw/gtxdataset.cpp:216-310``):
    40-byte big-endian header — lat_ll, lon_ll, dlat, dlon doubles +
    nrows/ncols int32 — data float32 BE (float64 when the size
    matches), rows stored south→north (the band maps row 0 to the
    LAST stored row, :303-308); cell-center origin extended by half a
    cell; nodata −88.8888 (:151).  Published parity: hydroc1.gtx
    checksum 64183 (``autotest/gdrivers/gtx.py``).
    """
    buf = _load(src)
    lat_ll, lon_ll, dlat, dlon = struct.unpack_from(">4d", buf, 0)
    ny, nx = struct.unpack_from(">2i", buf, 32)
    dt = np.dtype(">f8") if len(buf) - 40 == nx * ny * 8 \
        else np.dtype(">f4")
    arr = np.frombuffer(buf, dt, count=nx * ny, offset=40) \
        .reshape(ny, nx)[::-1]          # south-up storage → north-up
    gt = (lon_ll - dlon / 2, dlon, 0.0,
          lat_ll + dlat * (ny - 1) + dlat / 2, 0.0, -dlat)
    return arr[None], gt, -88.8888


# ---------------------------------------------------------- SNODAS

def read_snodas(hdr_path):
    """NOHRSC SNODAS .hdr + raw pair → (array[1, h, w],
    geotransform, nodata).

    Reference semantics (``frmts/raw/snodasdataset.cpp``):
    ``Key: value`` text header; big-endian int16 (or int8/int32 by
    "Data bytes per pixel") in the "Data file pathname" sibling;
    geotransform from the min/max axis coordinates with the declared
    resolutions; "Data slope"/"Data intercept" surface as band
    scale/offset (values stay raw).  Published parity:
    fake_snodas.hdr opens 6935×3351 with checksum 0
    (``autotest/gdrivers/snodas.py``).
    """
    with open(hdr_path) as f:
        kv = {}
        for ln in f:
            if ":" in ln:
                k, v = ln.split(":", 1)
                kv[k.strip().lower()] = v.strip()
    nx = int(kv["number of columns"])
    ny = int(kv["number of rows"])
    nbytes = int(kv.get("data bytes per pixel", "2"))
    dt = np.dtype({1: ">i1", 2: ">i2", 4: ">i4"}[nbytes])
    nodata = float(kv.get("no data value", "nan"))
    minx = float(kv["minimum x-axis coordinate"])
    maxx = float(kv["maximum x-axis coordinate"])
    miny = float(kv["minimum y-axis coordinate"])
    maxy = float(kv["maximum y-axis coordinate"])
    gt = (minx, (maxx - minx) / nx, 0.0,
          maxy, 0.0, -(maxy - miny) / ny)
    data_path = os.path.join(os.path.dirname(str(hdr_path)),
                             os.path.basename(
                                 kv["data file pathname"]))
    with open(data_path, "rb") as f:
        buf = f.read()
    need = nx * ny * dt.itemsize
    if len(buf) < need:                 # sparse/truncated: zero-fill
        buf = buf + b"\x00" * (need - len(buf))
    arr = np.frombuffer(buf, dt, count=nx * ny).reshape(ny, nx)
    return arr[None], gt, nodata


# ------------------------------------------------------------- LCP

def read_lcp(src):
    """FARSITE LCP landscape file → (array[bands, h, w] int16,
    geotransform, None).

    Reference semantics (``frmts/raw/lcpdataset.cpp``): 7316-byte
    little-endian header — crown/ground fuel flags at 0/4 (value 21 =
    present → 5/7/8/10 bands), dims at 4164/4168, E/W/N/S extents at
    4172-4203, cell sizes at 4208/4216 — then pixel-interleaved
    int16 bands.  Published parity: test_FARSITE_UTM12.LCP 8-band
    checksums 18645/16431/… (``autotest/gdrivers/lcp.py``).
    """
    buf = _load(src)
    crown = struct.unpack_from("<i", buf, 0)[0] - 20
    ground = struct.unpack_from("<i", buf, 4)[0] - 20
    nb = (10 if ground else 8) if crown else (7 if ground else 5)
    nx = struct.unpack_from("<i", buf, 4164)[0]
    ny = struct.unpack_from("<i", buf, 4168)[0]
    east, west, north, south = struct.unpack_from("<4d", buf, 4172)
    cx, cy = struct.unpack_from("<2d", buf, 4208)
    gt = (west, cx, 0.0, north, 0.0, -cy)
    arr = np.frombuffer(buf, "<i2", count=nx * ny * nb,
                        offset=7316).reshape(ny, nx, nb) \
        .transpose(2, 0, 1)
    return np.ascontiguousarray(arr), gt, None


# ------------------------------------------------------------- RST

def read_rst(rst_path):
    """Idrisi RST raster (+ ``.rdc`` text companion) →
    (array[bands, h, w], geotransform, nodata).

    Reference semantics (``frmts/idrisi/IdrisiDataset.cpp``): the
    ``.rdc`` is ``key : value`` text with 12-char keys; ``data type``
    byte/integer/real/rgb24 map to uint8 / int16-LE / float32-LE /
    3-byte BIP (:623-653).  The geotransform comes from min/max X/Y
    scaled by ``unit dist.`` (:686-705); rgb24 pixels are stored
    B,G,R and surface as bands R,G,B (band *n* reads byte ``3-n``,
    IdrisiRasterBand::IReadBlock).  ``flag value`` (when not
    ``none``) is the nodata marker.  Published parity: byte.rst
    checksum 5044, real.rst 5275 (``autotest/gdrivers/idrisi.py``
    tests 1-2).
    """
    base = os.path.splitext(rst_path)[0]
    rdc = None
    for ext in (".rdc", ".RDC"):
        if os.path.exists(base + ext):
            rdc = base + ext
            break
    if rdc is None:
        raise FileNotFoundError(f"no .rdc companion for {rst_path}")
    meta = {}
    with open(rdc, "r", errors="replace") as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                meta[k.strip().lower()] = v.strip()
    dtype = meta.get("data type", "byte").lower()
    cols = int(meta["columns"])
    rows = int(meta["rows"])
    unit = float(meta.get("unit dist.", "1") or 1) or 1.0
    x0 = float(meta["min. x"]) * unit
    x1 = float(meta["max. x"]) * unit
    y0 = float(meta["min. y"]) * unit
    y1 = float(meta["max. y"]) * unit
    gt = (x0, (x1 - x0) / cols, 0.0, y1, 0.0, (y0 - y1) / rows)
    nodata = None
    flag = meta.get("flag value", "none")
    if flag and flag.lower() not in ("none", "unknown", ""):
        try:
            nodata = float(flag)
        except ValueError:
            pass
    buf = _load(rst_path)
    if dtype == "byte":
        arr = np.frombuffer(buf, np.uint8, count=rows * cols) \
            .reshape(1, rows, cols)
    elif dtype == "integer":
        arr = np.frombuffer(buf, "<i2", count=rows * cols) \
            .reshape(1, rows, cols)
    elif dtype == "real":
        arr = np.frombuffer(buf, "<f4", count=rows * cols) \
            .reshape(1, rows, cols)
    elif dtype == "rgb24":
        bip = np.frombuffer(buf, np.uint8, count=rows * cols * 3) \
            .reshape(rows, cols, 3)
        arr = bip[:, :, ::-1].transpose(2, 0, 1)  # B,G,R file → R,G,B
    else:
        raise ValueError(f"unsupported RST data type {dtype!r}")
    return np.ascontiguousarray(arr), gt, nodata


# ------------------------------------------------------------- DOQ2

def read_doq2(src):
    """USGS DOQ (keyword-header) image → (array[bands, h, w] uint8,
    geotransform, metadata-dict).

    Reference semantics (``frmts/raw/doq2dataset.cpp:185-415``):
    text header lines up to ``END_USGS_DOQ_HEADER`` —
    ``SAMPLES_AND_LINES w h``, ``BYTE_COUNT`` header size,
    ``XY_ORIGIN ulx uly``, ``HORIZONTAL_RESOLUTION``; one
    ``BAND_CONTENT`` line per band; pixels are byte BIP starting at
    BYTE_COUNT (band *i* at pixel offset *i*).  All other keywords
    are kept as metadata with quote-stripped space-joined values.
    A short (truncated) data section is zero-padded, matching
    RawRasterBand's zero-filled partial reads.  Published parity:
    C3607614_truncated.NWS first-row checksums 4201/4010/5820 and
    gt (377054, 1, 0, 4082205, 0, -1)
    (``autotest/gdrivers/doq2.py``).
    """
    buf = _load(src)
    if not buf.startswith(b"BEGIN_USGS_DOQ_HEADER"):
        raise ValueError("not a USGS DOQ2 header")
    # files in the wild end the header with END_USGS_DOQ_HEADER or just
    # END_USGS_HEADER; the reference's loop also stops at the first
    # line with fewer than two tokens (doq2dataset.cpp:191-199), which
    # is what actually fires on the plain END_USGS_HEADER line
    end = buf.find(b"END_USGS")
    if end < 0:
        end = min(len(buf), 65536)
    hdr = buf[:end].decode("ascii", errors="replace")
    w = h = skip = 0
    ulx = uly = res = 0.0
    nbands = 0
    bpp = 1
    meta = {}
    lines = hdr.split("\n")
    for line in lines[1:]:          # first line is BEGIN_USGS_DOQ_HEADER
        toks = _doq_tokens(line)
        if len(toks) < 2:
            continue
        key = toks[0].upper()
        if key == "SAMPLES_AND_LINES" and len(toks) >= 3:
            w, h = int(toks[1]), int(toks[2])
        elif key == "BYTE_COUNT":
            skip = int(toks[1])
        elif key == "XY_ORIGIN" and len(toks) >= 3:
            ulx, uly = float(toks[1]), float(toks[2])
        elif key == "HORIZONTAL_RESOLUTION":
            res = float(toks[1])
        elif key == "BITS_PER_PIXEL":
            bpp = int(toks[1]) // 8
        elif key == "BAND_CONTENT":
            nbands += 1
        elif key in ("BAND_ORGANIZATION", "HORIZONTAL_COORDINATE_SYSTEM",
                     "COORDINATE_ZONE", "HORIZONTAL_UNITS",
                     "HORIZONTAL_DATUM"):
            meta[key] = " ".join(toks[1:])
        else:
            meta[key] = " ".join(toks[1:])
    if nbands < 2:
        nbands = bpp
    else:
        bpp *= nbands
    if not (500 <= w <= 25000 and 500 <= h <= 25000 and nbands >= 1):
        raise ValueError("implausible DOQ2 dimensions")
    need = skip + w * h * bpp
    body = buf[skip:need]
    if len(body) < w * h * bpp:
        body = body + b"\x00" * (w * h * bpp - len(body))
    arr = np.frombuffer(body, np.uint8).reshape(h, w, bpp) \
        .transpose(2, 0, 1)[:nbands]
    gt = (ulx, res, 0.0, uly, 0.0, -res)
    return np.ascontiguousarray(arr), gt, meta


def _doq_tokens(line):
    """Whitespace tokens honoring double quotes (CSLTokenizeString):
    a quoted span becomes part of the current token with quotes
    stripped."""
    toks = []
    cur = []
    in_q = False
    for ch in line:
        if ch == '"':
            in_q = not in_q
        elif ch in " \t\r" and not in_q:
            if cur:
                toks.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        toks.append("".join(cur))
    return toks


# ------------------------------------------------------------ SAGA

_SAGA_TYPES = {"BIT": "u1", "BYTE_UNSIGNED": "u1", "BYTE": "i1",
               "SHORTINT_UNSIGNED": "u2", "SHORTINT": "i2",
               "INTEGER_UNSIGNED": "u4", "INTEGER": "i4",
               "FLOAT": "f4", "DOUBLE": "f8"}


def read_saga(sgrd_path):
    """SAGA GIS binary grid (``.sgrd`` header + ``.sdat`` data) →
    (array[1, h, w], geotransform, nodata).

    Reference semantics (``frmts/saga/sagadataset.cpp:474-560,
    :718-726``): tab-separated KEY=VALUE header; POSITION_XMIN/YMIN
    are CELL CENTERS so the geotransform extends half a cell;
    TOPTOBOTTOM=FALSE (the normal case) stores rows bottom-up.
    Published parity: 4byteFloat.sdat checksum 108
    (``autotest/gdrivers/saga.py`` test 1).
    """
    hdr = {}
    with open(sgrd_path, "r", errors="replace") as f:
        for line in f:
            if "=" in line:
                k, v = line.split("=", 1)
                hdr[k.strip().upper()] = v.strip()
    w = int(hdr["CELLCOUNT_X"])
    h = int(hdr["CELLCOUNT_Y"])
    cell = float(hdr["CELLSIZE"])
    xmin = float(hdr["POSITION_XMIN"])
    ymin = float(hdr["POSITION_YMIN"])
    nodata = float(hdr.get("NODATA_VALUE", "nan") or "nan")
    bo = ">" if hdr.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE" \
        else "<"
    fmt = hdr.get("DATAFORMAT", "FLOAT").upper()
    dt = np.dtype(bo + _SAGA_TYPES[fmt])
    off = int(hdr.get("DATAFILE_OFFSET", "0") or 0)
    data_name = hdr.get("DATAFILE_NAME")
    if data_name:
        sdat = os.path.join(os.path.dirname(os.path.abspath(
            sgrd_path)), data_name)
    else:
        sdat = os.path.splitext(sgrd_path)[0] + ".sdat"
    buf = _load(sdat)
    arr = np.frombuffer(buf, dt, count=w * h, offset=off) \
        .reshape(h, w)
    if hdr.get("TOPTOBOTTOM", "FALSE").upper() != "TRUE":
        arr = arr[::-1]
    gt = (xmin - cell / 2, cell, 0.0,
          ymin + cell * (h - 0.5), 0.0, -cell)
    return np.ascontiguousarray(arr)[None], gt, nodata


# -------------------------------------------------------- NGSGEOID

def read_ngsgeoid(src):
    """NOAA NGS geoid height grid (.bin) → (array[1, h, w] float32,
    geotransform, None).

    Reference semantics (``frmts/ngsgeoid/ngsgeoiddataset.cpp``):
    44-byte header SLAT/WLON/DLAT/DLON (f8) + NLAT/NLON/IKIND (i4),
    endianness detected from IKIND == 1; float32 rows SOUTH-first
    (bottom-up); geotransform widened half a cell.  A truncated
    payload zero-pads (RawRasterBand partial-read semantics).
    Published parity: g2009u01_{le,be}_truncated.bin checksum 65534
    + gt (``autotest/gdrivers/ngsgeoid.py``).
    """
    buf = _load(src)
    for bo in ("<", ">"):
        ikind = struct.unpack_from(bo + "i", buf, 40)[0]
        if ikind == 1:
            break
    else:
        raise ValueError("not an NGS geoid bin file")
    slat, wlon, dlat, dlon = struct.unpack_from(bo + "4d", buf, 0)
    nlat, nlon = struct.unpack_from(bo + "2i", buf, 32)
    need = 44 + nlat * nlon * 4
    if len(buf) < need:
        buf = buf + b"\x00" * (need - len(buf))
    arr = np.frombuffer(buf, bo + "f4", count=nlat * nlon,
                        offset=44).reshape(nlat, nlon)[::-1]
    gt = (wlon - dlon / 2, dlon, 0.0,
          slat + nlat * dlat - dlat / 2, 0.0, -dlat)
    return np.ascontiguousarray(arr)[None], gt, None


# ---------------------------------------------------------- LOSLAS

def read_loslas(src):
    """NADCON .los/.las grid → (array[1, h, w] float32,
    geotransform, None).

    Reference semantics (``frmts/raw/loslasdataset.cpp:194-266``):
    little-endian dims at offset 64, min_lon/delta_lon/min_lat/
    delta_lat float32 at 76; records of ``w*4+4`` bytes, data from
    record 1 with a 4-byte prefix per row, southernmost row first.
    Published parity: wyhpgn.los gt + stats
    (``autotest/gdrivers/loslas.py``).
    """
    buf = _load(src)
    w, h = struct.unpack_from("<2i", buf, 64)
    min_lon, dlon, min_lat, dlat = struct.unpack_from("<4f", buf, 76)
    rec = w * 4 + 4
    rows = []
    for y in range(h):          # y = 0 is the northernmost row
        off = (h - y) * rec + 4
        rows.append(np.frombuffer(buf, "<f4", count=w, offset=off))
    arr = np.vstack(rows)
    gt = (min_lon - dlon * 0.5, float(dlon), 0.0,
          min_lat + (h - 0.5) * dlat, 0.0, -float(dlat))
    return np.ascontiguousarray(arr)[None], gt, None


# ------------------------------------------------------------- NDF

def read_ndf(hdr_path):
    """NLAPS NDF v2 → (array[bands, h, w] uint8, geotransform,
    None).

    Reference semantics (``frmts/raw/ndfdataset.cpp``): ``KEY=VALUE;``
    text header; BYTE/8-bit only; band files from
    ``BAND<n>_FILENAME``; the geotransform interpolates the
    UPPER_LEFT/UPPER_RIGHT/LOWER_LEFT corner pixel centers and
    shifts half a pixel (:375-398).  Short band files zero-pad.
    Published parity: LE7134052000500350.H3 first-row checksum 6510
    + gt (320325.75, 14.25, 0, 1383062.25, 0, -14.25)
    (``autotest/gdrivers/ndf.py``).
    """
    hdr = {}
    with open(hdr_path, "r", errors="replace") as f:
        for line in f:
            if "=" not in line:
                break
            k, v = line.split("=", 1)
            hdr[k.strip()] = v.strip().rstrip(";")
    if hdr.get("PIXEL_FORMAT") != "BYTE":
        raise ValueError("only BYTE NDF supported")
    w = int(hdr["PIXELS_PER_LINE"])
    h = int(hdr["LINES_PER_DATA_FILE"])
    nb = int(hdr.get("NUMBER_OF_BANDS_IN_VOLUME", "1"))
    base = os.path.dirname(os.path.abspath(hdr_path))
    bands = []
    for i in range(1, nb + 1):
        name = hdr.get(f"BAND{i}_FILENAME")
        path = os.path.join(base, name) if name else \
            os.path.splitext(hdr_path)[0] + f".I{i}"
        buf = _load(path)
        if len(buf) < w * h:
            buf = buf + b"\x00" * (w * h - len(buf))
        bands.append(np.frombuffer(buf, np.uint8,
                                   count=w * h).reshape(h, w))
    gt = None
    corners = {}
    for key in ("UPPER_LEFT_CORNER", "UPPER_RIGHT_CORNER",
                "LOWER_LEFT_CORNER"):
        toks = hdr.get(key, "").split(",")
        if len(toks) == 4:
            corners[key] = (float(toks[2]), float(toks[3]))
    if len(corners) == 3:
        ulx, uly = corners["UPPER_LEFT_CORNER"]
        urx, ury = corners["UPPER_RIGHT_CORNER"]
        llx, lly = corners["LOWER_LEFT_CORNER"]
        g1 = (urx - ulx) / (w - 1)
        g2 = (ury - uly) / (w - 1)
        g4 = (llx - ulx) / (h - 1)
        g5 = (lly - uly) / (h - 1)
        gt = (ulx - g1 * 0.5 - g4 * 0.5, g1, g2,
              uly - g2 * 0.5 - g5 * 0.5, g4, g5)
    return np.stack(bands), gt, None


# ------------------------------------------------------------- EIR

_EIR_TYPES = {"U1": "u1", "U2": "u1", "U4": "u1", "U8": "u1",
              "S8": "i1", "U16": "<u2", "S16": "<i2",
              "U32": "<u4", "S32": "<i4", "F32": "<f4",
              "F64": "<f8"}


def read_eir(hdr_path):
    """Erdas Imagine Raw (.hdr ``IMAGINE_RAW_FILE``) →
    (array[bands, h, w], geotransform, None).

    Reference semantics (``frmts/raw/eirdataset.cpp``): whitespace
    keyword header — WIDTH/HEIGHT/NUM_LAYERS/PIXEL_FILES/FORMAT
    (BIL/BIP/BSQ)/DATATYPE/DATA_OFFSET.  Published parity:
    fakeeir.hdr checksum 1 (``autotest/gdrivers/eir.py``).
    """
    hdr = {}
    with open(hdr_path, "r", errors="replace") as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2:
                hdr[toks[0].upper()] = toks[1]
    w = int(hdr["WIDTH"])
    h = int(hdr["HEIGHT"])
    nb = int(hdr.get("NUM_LAYERS", "1"))
    dt = np.dtype(_EIR_TYPES[hdr.get("DATATYPE", "U8").upper()])
    off = int(hdr.get("DATA_OFFSET", "0"))
    fmt = hdr.get("FORMAT", "BIL").upper()
    path = os.path.join(os.path.dirname(os.path.abspath(hdr_path)),
                        hdr["PIXEL_FILES"])
    buf = _load(path)
    n = w * h * nb
    raw = np.frombuffer(buf, dt, count=n, offset=off)
    if fmt == "BIP":
        arr = raw.reshape(h, w, nb).transpose(2, 0, 1)
    elif fmt == "BSQ":
        arr = raw.reshape(nb, h, w)
    else:                                   # BIL
        arr = raw.reshape(h, nb, w).transpose(1, 0, 2)
    return np.ascontiguousarray(arr), None, None
