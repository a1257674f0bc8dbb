"""Long-tail raw/ASCII raster readers, sweep #2 — from scratch.

Each reader mirrors one small reference driver (cited per function)
and is validated against the published checksum in the corresponding
``autotest/gdrivers/*.py`` file:

* RRASTER (R ``raster`` package .grd/.gri; frmts/raw/rrasterdataset.cpp)
* ISG (geoid grid text; frmts/aaigrid isg handling → own driver)
* JDEM (Japanese DEM .mem; frmts/jdem/jdemdataset.cpp)
* GSC (Geosoft GSC binary; frmts/raw/gscdataset.cpp)
* NOAA_B (geoid .b Fortran records; frmts/raw/noaabdataset.cpp)
* CTG (USGS LULC Composite Theme Grid; frmts/ctg/ctgdataset.cpp)
* MFF (Vexcel .hdr + .bNN channels; frmts/raw/mffdataset.cpp)
* ROI_PAC (.dem/.slc + .rsc; frmts/raw/roipacdataset.cpp)
* ISCE (raw + .xml property file; frmts/raw/iscedataset.cpp)
* NTv2 (.gsb datum shift grids; frmts/raw/ntv2dataset.cpp)
* GenBin (generic binary .bil + .hdr; frmts/raw/genbindataset.cpp)

All return the repo's raster-reader contract
``(array [bands, h, w] — complex64 where the format is complex —
geotransform | None, nodata | None)``.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

__all__ = ["read_rraster", "read_isg", "read_jdem", "read_gsc",
           "read_noaa_b", "read_ctg", "read_mff", "read_roipac",
           "read_isce", "read_ntv2", "read_genbin",
           "read_nsidcbin", "read_mff2"]


# ----------------------------------------------------------- RRASTER

_RR_TYPES = {
    "LOG1S": "u1", "INT1S": "i1", "INT2S": "i2", "INT4S": "i4",
    "INT8S": "i8", "INT1U": "u1", "INT2U": "u2", "INT4U": "u4",
    "FLT4S": "f4", "FLT8S": "f8",
}


def read_rraster(path):
    """R raster package .grd header + .gri raw data
    (frmts/raw/rrasterdataset.cpp)."""
    kv = {}
    section = ""
    for line in open(path, encoding="latin-1"):
        line = line.strip()
        if line.startswith("["):
            section = line.strip("[]").lower()
        elif "=" in line:
            k, v = line.split("=", 1)
            kv[f"{section}.{k.strip().lower()}"] = v.strip()
    nrows = int(kv["georeference.nrows"])
    ncols = int(kv["georeference.ncols"])
    nbands = int(kv.get("data.nbands", "1"))
    dt = np.dtype(_RR_TYPES[kv.get("data.datatype", "FLT8S").upper()])
    bo = "<" if kv.get("data.byteorder", "little") == "little" else ">"
    dt = dt.newbyteorder(bo)
    order = kv.get("data.bandorder", "BIL").upper()
    xmin = float(kv["georeference.xmin"])
    xmax = float(kv["georeference.xmax"])
    ymin = float(kv["georeference.ymin"])
    ymax = float(kv["georeference.ymax"])
    gri = os.path.splitext(path)[0] + ".gri"
    raw = np.fromfile(gri, dt, count=nrows * ncols * nbands)
    raw = raw.astype(dt.newbyteorder("="))
    if order == "BIL":
        arr = raw.reshape(nrows, nbands, ncols).transpose(1, 0, 2)
    elif order == "BIP":
        arr = raw.reshape(nrows, ncols, nbands).transpose(2, 0, 1)
    else:                                  # BSQ
        arr = raw.reshape(nbands, nrows, ncols)
    gt = (xmin, (xmax - xmin) / ncols, 0.0, ymax, 0.0,
          -(ymax - ymin) / nrows)
    nd = kv.get("data.nodatavalue")
    nodata = None if nd in (None, "NA") else float(nd)
    return np.ascontiguousarray(arr), gt, nodata


# --------------------------------------------------------------- ISG

def read_isg(path):
    """ISG 1.x/2.x geoid grid (frmts/isg; text head + row-major grid,
    north first)."""
    lines = open(path, encoding="latin-1").read().splitlines()
    head = {}
    data_start = 0
    in_head = False
    for i, line in enumerate(lines):
        if line.startswith("begin_of_head"):
            in_head = True
            continue
        if line.startswith("end_of_head"):
            data_start = i + 1
            break
        if in_head and ("=" in line or ":" in line):
            sep = "=" if "=" in line else ":"
            k, v = line.split(sep, 1)
            head[k.strip().lower()] = v.strip()

    def ang(key):
        v = head[key]
        m = re.match(r"(-?\d+)°(\d+)'([\d.]+)\"", v)
        if m:
            s = (abs(int(m.group(1))) + int(m.group(2)) / 60.0 +
                 float(m.group(3)) / 3600.0)
            return -s if v.strip().startswith("-") else s
        return float(v)

    lat_min, lat_max = ang("lat min"), ang("lat max")
    lon_min, lon_max = ang("lon min"), ang("lon max")
    dlat, dlon = ang("delta lat"), ang("delta lon")
    nrows = int(head["nrows"])
    ncols = int(head["ncols"])
    nodata = float(head.get("nodata", "-9999"))
    vals = []
    for line in lines[data_start:]:
        vals.extend(float(x) for x in line.split())
    arr = np.array(vals[:nrows * ncols], np.float64).reshape(nrows,
                                                             ncols)
    # data runs north → south; the reference treats lat/lon bounds as
    # CELL CENTERS unless the deltas exactly tile the extent
    if abs((lat_max - lat_min) / dlat - nrows) < 1e-8 and \
            abs((lon_max - lon_min) / dlon - ncols) < 1e-8:
        gt = (lon_min, dlon, 0.0, lat_max, 0.0, -dlat)
    else:
        gt = (lon_min - dlon / 2, dlon, 0.0, lat_max + dlat / 2, 0.0,
              -dlat)
    return arr[None], gt, nodata


# -------------------------------------------------------------- JDEM

def _jdem_field(buf, off, width):
    s = buf[off:off + width].decode("latin-1").strip()
    return int(s) if s else 0


def _jdem_angle(buf, off):
    n = _jdem_field(buf, off, 7)
    return n // 10000 + ((n // 100) % 100) / 60.0 + (n % 100) / 3600.0


def read_jdem(path):
    """Japanese DEM .mem (frmts/jdem/jdemdataset.cpp): 1011-byte
    header, per-row ASCII records of 0.1 m elevations."""
    data = open(path, "rb").read()
    if len(data) < 1011:
        raise ValueError("JDEM header too small")
    w = _jdem_field(data, 23, 3)
    h = _jdem_field(data, 26, 3)
    if w <= 0 or h <= 0:
        raise ValueError("invalid JDEM dimensions")
    recsize = w * 5 + 9 + 2
    arr = np.zeros((h, w), np.float32)
    for y in range(h):
        rec = data[1011 + recsize * y:1011 + recsize * (y + 1)]
        if len(rec) < 9 + 5 * w:
            break
        for x in range(w):
            arr[y, x] = _jdem_field(rec, 9 + 5 * x, 5) * 0.1
    ll_lat = _jdem_angle(data, 29)
    ll_lon = _jdem_angle(data, 36)
    ur_lat = _jdem_angle(data, 43)
    ur_lon = _jdem_angle(data, 50)
    gt = (ll_lon, (ur_lon - ll_lon) / w, 0.0, ur_lat, 0.0,
          -(ur_lat - ll_lat) / h)
    return arr[None], gt, None


# --------------------------------------------------------------- GSC

def read_gsc(path):
    """Geosoft GSC (frmts/raw/gscdataset.cpp): Fortran-style records,
    float32 rows, second record holds the geotransform floats."""
    data = open(path, "rb").read()
    reclen, npx, nlines = struct.unpack_from("<iii", data, 0)
    if reclen != npx * 4 or npx < 1 or nlines < 1:
        raise ValueError("not a GSC grid")
    reclen += 8                          # record length markers
    hdr = np.frombuffer(data, "<f4", count=8,
                        offset=reclen + 12)
    gt = (float(hdr[2]), float(hdr[0]), 0.0, float(hdr[5]), 0.0,
          -float(hdr[1]))
    arr = np.zeros((nlines, npx), np.float32)
    base = reclen * 2 + 4
    for y in range(nlines):
        off = base + y * reclen
        arr[y] = np.frombuffer(data, "<f4", count=npx, offset=off)
    return arr[None], gt, -1.0000000150474662199e+30


# ------------------------------------------------------------ NOAA_B

def read_noaa_b(path):
    """NOAA .b geoid grids (frmts/raw/noaabdataset.cpp): 4-byte
    Fortran record markers, header of 4 doubles + 3 int32, rows
    south → north."""
    data = open(path, "rb").read()

    def parse(bo):
        swlat, swlon, dlat, dlon = struct.unpack_from(bo + "dddd", data,
                                                      4)
        nrows, ncols, kind = struct.unpack_from(bo + "iii", data, 36)
        return swlat, swlon, dlat, dlon, nrows, ncols, kind

    for bo in ("<", ">"):
        swlat, swlon, dlat, dlon, nrows, ncols, kind = parse(bo)
        if (abs(swlat) <= 90 and abs(swlon) <= 360 and
                0 < nrows < 100000 and 0 < ncols < 100000 and
                0 < dlat <= 1 and 0 < dlon <= 1 and kind in (-1, 0, 1)):
            break
    else:
        raise ValueError("not a NOAA .b geoid grid")
    dt = {0: "i4", 1: "f4"}.get(kind, "i2")
    dt = np.dtype(bo + dt)
    line = 4 + ncols * dt.itemsize + 4
    arr = np.zeros((nrows, ncols), dt.newbyteorder("="))
    base = 52                             # file header record
    for r in range(nrows):               # stored south-first
        off = base + r * line + 4
        arr[nrows - 1 - r] = np.frombuffer(
            data, dt, count=ncols, offset=off)
    if swlon > 180:
        swlon -= 360
    gt = (swlon - dlon / 2, dlon, 0.0,
          swlat + (nrows - 1) * dlat + dlat / 2, 0.0, -dlat)
    return arr[None], gt, None


# --------------------------------------------------------------- CTG

def read_ctg(path):
    """USGS LULC Composite Theme Grid (frmts/ctg/ctgdataset.cpp):
    80-char records, 6 int32 themes per cell, sparse cell placement."""
    data = open(path, "rb").read().decode("latin-1", "replace")

    def fld(buf, off, width):
        s = buf[off:off + width].strip()
        try:
            return int(s)
        except ValueError:
            return 0

    header = data[:5 * 80]
    nrows = fld(header, 0, 10)
    ncols = fld(header, 20, 10)
    cell = fld(header, 35, 5)
    zone = fld(header, 50, 5)
    nwe = fld(header[3 * 80:], 40, 10)
    nwn = fld(header[3 * 80:], 50, 10)
    if nrows <= 0 or ncols <= 0 or cell <= 0:
        raise ValueError("not a CTG grid")
    arr = np.zeros((6, nrows, ncols), np.int32)
    pos = 5 * 80
    while pos + 80 <= len(data):
        line = data[pos:pos + 80]
        pos += 80
        if fld(line, 0, 3) != zone:
            raise ValueError("CTG record zone mismatch")
        x = fld(line, 3, 8) - cell // 2
        y = fld(line, 11, 8) + cell // 2
        dx, dy = x - nwe, nwn - y
        if dx < 0 or dy < 0 or dx % cell or dy % cell:
            raise ValueError("CTG unexpected cell coordinates")
        cx, cy = dx // cell, dy // cell
        if cx >= ncols or cy >= nrows:
            raise ValueError("CTG cell out of range")
        for i in range(6):
            v = fld(line, 20 + 10 * i, 10)
            arr[i, cy, cx] = 0 if v >= 2000000000 else v
    gt = (float(nwe), float(cell), 0.0, float(nwn), 0.0, float(-cell))
    return arr, gt, None


# --------------------------------------------------------------- MFF

_MFF_EXT_TYPES = {"b": "u1", "i": "u2", "j": "c_i2", "r": "f4",
                  "x": "c8"}


def read_mff(path):
    """Vexcel MFF (.hdr + channel files; frmts/raw/mffdataset.cpp):
    KEY = VALUE header, band files named <base>.<letter><NN>."""
    kv = {}
    for line in open(path, encoding="latin-1"):
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().upper()] = v.strip()
    if kv.get("IMAGE_FILE_FORMAT", "").upper() not in ("MFF",):
        raise ValueError("not an MFF header")
    h = int(kv["IMAGE_LINES"])
    w = int(kv["LINE_SAMPLES"])
    bo = "<" if kv.get("BYTE_ORDER", "LSB").upper() == "LSB" else ">"
    base = os.path.splitext(path)[0]
    d = os.path.dirname(os.path.abspath(path)) or "."
    stem = os.path.basename(base).lower()
    bands = []
    for fn in sorted(os.listdir(d)):
        fl = fn.lower()
        bstem, ext = os.path.splitext(fl)
        if bstem != stem or len(ext) < 2:
            continue
        letter = ext[1]
        if letter not in _MFF_EXT_TYPES or fl.endswith(".hdr"):
            continue
        spec = _MFF_EXT_TYPES[letter]
        raw = open(os.path.join(d, fn), "rb").read()
        if spec == "c_i2":
            a = np.frombuffer(raw, np.dtype(bo + "i2"),
                              count=2 * w * h)
            band = (a[0::2].astype(np.float32) +
                    1j * a[1::2].astype(np.float32)).reshape(h, w)
        elif spec == "c8":
            band = np.frombuffer(raw, np.dtype(bo + "c8"),
                                 count=w * h).reshape(h, w)
        else:
            dt = np.dtype(bo + spec)
            a = np.frombuffer(raw, dt, count=w * h)
            if len(a) < w * h:           # zero-size placeholder band
                full = np.zeros(w * h, dt.newbyteorder("="))
                full[:len(a)] = a
                a = full
            band = a.astype(dt.newbyteorder("=")).reshape(h, w)
        bands.append(band)
    if not bands:
        # still a valid dataset with zero-filled band (placeholders)
        bands = [np.zeros((h, w), np.uint8)]
    arr = np.stack(bands)
    return arr, None, None


# ------------------------------------------------------------ ROI_PAC

_ROIPAC_EXT = {
    "dem": ("i2", 1, "pixel"), "flg": ("u1", 1, "pixel"),
    "slc": ("c8", 1, "pixel"), "int": ("c8", 1, "pixel"),
    "amp": ("f4", 2, "pixel"), "cor": ("f4", 2, "line"),
    "hgt": ("f4", 2, "line"), "unw": ("f4", 2, "line"),
    "msk": ("f4", 2, "line"),
}


def read_roipac(path):
    """ROI_PAC raw + .rsc (frmts/raw/roipacdataset.cpp): data type and
    band interleave from the file extension."""
    rsc = path + ".rsc"
    kv = {}
    for line in open(rsc, encoding="latin-1"):
        parts = line.split(None, 1)
        if len(parts) == 2:
            kv[parts[0].upper()] = parts[1].strip()
    w = int(kv["WIDTH"])
    h = int(kv["FILE_LENGTH"])
    ext = os.path.splitext(path)[1][1:].lower()
    spec = _ROIPAC_EXT.get(ext)
    if spec is None:
        raise NotImplementedError(f"ROI_PAC extension .{ext}")
    code, nb, ileave = spec
    dt = np.dtype("<" + code)
    raw = np.fromfile(path, dt, count=w * h * nb)
    raw = raw.astype(dt.newbyteorder("="))
    if nb == 1:
        arr = raw.reshape(1, h, w)
    elif ileave == "pixel":
        arr = raw.reshape(h, w, nb).transpose(2, 0, 1)
    else:
        arr = raw.reshape(h, nb, w).transpose(1, 0, 2)
    gt = None
    if "X_FIRST" in kv:
        gt = (float(kv["X_FIRST"]) - float(kv["X_STEP"]) / 2,
              float(kv["X_STEP"]), 0.0,
              float(kv["Y_FIRST"]) - float(kv["Y_STEP"]) / 2, 0.0,
              float(kv["Y_STEP"]))
    return np.ascontiguousarray(arr), gt, None


# -------------------------------------------------------------- ISCE

_ISCE_TYPES = {"BYTE": "u1", "SHORT": "i2", "INT": "i4", "LONG": "i8",
               "FLOAT": "f4", "DOUBLE": "f8", "CBYTE": None,
               "CFLOAT": "c8", "CDOUBLE": "c16"}


def read_isce(path):
    """ISCE raw + .xml (frmts/raw/iscedataset.cpp): flat <property>
    name/value pairs give WIDTH/LENGTH/DATA_TYPE/BYTE_ORDER."""
    import xml.etree.ElementTree as ET
    xmlp = path + ".xml"
    root = ET.parse(xmlp).getroot()
    props = {}
    for p in root.findall("property"):
        v = p.find("value")
        if v is not None and p.get("name"):
            props[p.get("name").upper()] = (v.text or "").strip()
    w = int(props["WIDTH"])
    h = int(props["LENGTH"])
    code = _ISCE_TYPES.get(props.get("DATA_TYPE", "FLOAT").upper())
    if code is None:
        raise NotImplementedError(
            f"ISCE DATA_TYPE {props.get('DATA_TYPE')}")
    bo = "<" if props.get("BYTE_ORDER", "l").lower().startswith("l") \
        else ">"
    nb = int(props.get("NUMBER_BANDS", "1"))
    scheme = props.get("SCHEME", "BIP").upper()
    dt = np.dtype(bo + code)
    raw = np.fromfile(path, dt, count=w * h * nb)
    raw = raw.astype(dt.newbyteorder("="))
    if nb == 1:
        arr = raw.reshape(1, h, w)
    elif scheme == "BIL":
        arr = raw.reshape(h, nb, w).transpose(1, 0, 2)
    elif scheme == "BSQ":
        arr = raw.reshape(nb, h, w)
    else:
        arr = raw.reshape(h, w, nb).transpose(2, 0, 1)
    return np.ascontiguousarray(arr), None, None


# -------------------------------------------------------------- NTv2

def read_ntv2(path):
    """NTv2 .gsb datum-shift grid, first subgrid
    (frmts/raw/ntv2dataset.cpp): 16-byte records, 11-record file and
    subgrid headers, 4×float32 pixels stored bottom-to-top and
    east-to-west."""
    data = open(path, "rb").read()
    if data[:8] != b"NUM_OREC":
        raise ValueError("not an NTv2 grid shift file")
    n_orec = struct.unpack_from("<i", data, 8)[0]
    bo = "<" if n_orec == 11 else ">"
    if bo == ">" and struct.unpack_from(">i", data, 8)[0] != 11:
        raise ValueError("unrecognized NTv2 header")
    rec = 16
    sub = 11 * rec                      # first sub-grid header offset

    def f64(i, off=8):
        return struct.unpack_from(bo + "d", data,
                                  sub + i * rec + off)[0]

    s_lat, n_lat = f64(4), f64(5)
    e_long, w_long = -f64(6), -f64(7)
    lat_inc, long_inc = f64(8), f64(9)
    w = int(np.floor((e_long - w_long) / long_inc + 1.5))
    h = int(np.floor((n_lat - s_lat) / lat_inc + 1.5))
    px = np.frombuffer(data, bo + "f4", count=w * h * 4,
                       offset=sub + 11 * rec)
    grid = px.astype("=f4").reshape(h, w, 4)
    # stored south→north and east→west: flip both axes
    arr = grid[::-1, ::-1, :].transpose(2, 0, 1)
    gt = ((w_long - long_inc * 0.5) / 3600.0, long_inc / 3600.0, 0.0,
          (n_lat + lat_inc * 0.5) / 3600.0, 0.0, -lat_inc / 3600.0)
    return np.ascontiguousarray(arr), gt, None


# ------------------------------------------------------------- GenBin

_GENBIN_TYPES = {"U1": None, "U2": None, "U4": None, "U8": "u1",
                 "S8": "i1", "U16": "u2", "S16": "i2", "U32": "u4",
                 "S32": "i4", "F32": "f4", "F64": "f8"}


def read_genbin(path):
    """Generic binary .hdr + .bil (frmts/raw/genbindataset.cpp)."""
    hdr = os.path.splitext(path)[0] + ".hdr"
    kv = {}
    for line in open(hdr, encoding="latin-1"):
        if ":" in line:
            k, v = line.split(":", 1)
            kv[k.strip().upper()] = v.strip()
    bands = int(kv["BANDS"])
    rows = int(kv["ROWS"])
    cols = int(kv["COLS"])
    code = _GENBIN_TYPES.get(kv.get("DATATYPE", "U8").upper())
    if code is None:
        raise NotImplementedError(
            f"GenBin sub-byte DATATYPE {kv.get('DATATYPE')}")
    order = kv.get("INTERLEAVING", "BSQ").upper()
    bo = ">" if kv.get("BYTE_ORDER", "NA").upper().startswith("M") \
        else "<"
    dt = np.dtype(bo + code)
    raw = np.fromfile(path, dt, count=bands * rows * cols)
    full = np.zeros(bands * rows * cols, dt.newbyteorder("="))
    full[:len(raw)] = raw.astype(dt.newbyteorder("="))
    if order == "BIL":
        arr = full.reshape(rows, bands, cols).transpose(1, 0, 2)
    elif order == "BIP":
        arr = full.reshape(rows, cols, bands).transpose(2, 0, 1)
    else:
        arr = full.reshape(bands, rows, cols)
    gt = None
    if "UL_X_COORDINATE" in kv:
        ulx = float(kv["UL_X_COORDINATE"])
        uly = float(kv["UL_Y_COORDINATE"])
        pw = float(kv.get("PIXEL_WIDTH", "1"))
        ph = float(kv.get("PIXEL_HEIGHT", "1"))
        gt = (ulx, pw, 0.0, uly, 0.0, -ph)
    return np.ascontiguousarray(arr), gt, None


# ---------------------------------------------------------- NSIDCbin

def read_nsidcbin(path):
    """NSIDC sea-ice concentration .bin
    (frmts/raw/nsidcbindataset.cpp): 300-byte ASCII header of 6-byte
    records (columns at offset 6, rows at 12), uint8 samples; the
    polar-stereographic geotransform is fixed by hemisphere — the
    data-information record at offset 230 starting with ANTARCTIC
    selects the southern grid (EPSG:3976), else northern (EPSG:3413).
    Published parity: autotest/gdrivers/nsidcbin.py (316 cols, Byte,
    value 27 at (60, 44))."""
    with open(path, "rb") as f:
        hdr = f.read(300)
        data = f.read()
    if len(hdr) < 300:
        raise ValueError("truncated NSIDCbin header")
    try:
        w = int(hdr[6:12].split(b"\0")[0])
        h = int(hdr[12:18].split(b"\0")[0])
    except ValueError as e:
        raise ValueError(f"bad NSIDCbin header: {e}") from e
    if w <= 0 or h <= 0:
        raise ValueError("bad NSIDCbin dimensions")
    south = hdr[230:].startswith(b"ANTARCTIC")
    arr = np.frombuffer(data, np.uint8, count=w * h).reshape(h, w)
    if south:
        gt = (-3950000.0, 25000.0, 0.0, 4350000.0, 0.0, -25000.0)
    else:
        gt = (-3837500.0, 25000.0, 0.0, 5837500.0, 0.0, -25000.0)
    return arr.copy(), gt, None


# -------------------------------------------------------------- MFF2

def read_mff2(path):
    """Vexcel MFF2 / HKV blob directory (frmts/raw/hkvdataset.cpp):
    an ``attrib`` key=value file (extent.cols/rows, pixel.size in
    bits, pixel.encoding with the ``*``-marked selection,
    channel.enumeration, pixel.order) next to an ``image_data`` (or
    ``blob``) raw file; optional ``pixel.no_data``.  Dtype follows
    the driver's size/encoding matrix (hkvdataset.cpp:845-885).
    Published parity: autotest/gdrivers/mff2.py (bytemff2 checksum
    4672)."""
    d = path if os.path.isdir(path) else os.path.dirname(
        os.path.abspath(path))
    kv = {}
    with open(os.path.join(d, "attrib"), encoding="latin-1") as f:
        for line in f:
            if "=" in line:
                k, v = line.split("=", 1)
                kv[k.strip()] = v.strip()
    w = int(kv["extent.cols"])
    h = int(kv["extent.rows"])
    nbands = int(kv.get("channel.enumeration", "1"))
    size = int(kv.get("pixel.size", "8")) // 8
    enc = kv.get("pixel.encoding", "{ *unsigned }")
    field = kv.get("pixel.field", "")
    cplx = "*complex" in field
    if size == 1:
        dt = "u1"
    elif size == 2 and "*unsigned" in enc:
        dt = "u2"
    elif size == 2:
        dt = "i2"
    elif size == 4 and cplx:
        dt = None                        # CInt16 unsupported
    elif size == 4 and "*unsigned" in enc:
        dt = "u4"
    elif size == 4 and "*two" in enc:
        dt = "i4"
    elif size == 4:
        dt = "f4"
    elif size == 8 and cplx:
        dt = "c8"
    elif size == 8:
        dt = "f8"
    elif size == 16 and cplx:
        dt = "c16"
    else:
        dt = None
    if dt is None:
        raise NotImplementedError(
            f"MFF2 pixel size {size} encoding {enc!r}")
    bo = ">" if "*msbf" in kv.get("pixel.order", "") else "<"
    blob = os.path.join(d, "image_data")
    if not os.path.exists(blob):
        blob = os.path.join(d, "blob")
    raw = np.fromfile(blob, np.dtype(bo + dt),
                      count=w * h * nbands)
    arr = raw.astype(np.dtype(dt).newbyteorder("=")).reshape(
        nbands, h, w)
    nd = kv.get("pixel.no_data")
    nodata = float(nd) if nd is not None else None
    return np.ascontiguousarray(arr), None, nodata
