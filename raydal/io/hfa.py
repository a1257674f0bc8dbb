"""Erdas Imagine HFA (.img / .rrd / .aux) reader — from scratch on
the public HFA layout.

Reference semantics (``frmts/hfa/``):

* **Container** (``hfaopen.cpp:190-220``, ``hfaentry.cpp:71-102``):
  ``EHFA_HEADER_TAG`` + u4 header pos → Ehfa_File
  ``{version, freeList, rootEntryPtr, entryHeaderLength,
  dictionaryPtr}``; each tree entry is six i4 (next, prev, parent,
  child, data, dataSize) + 64-byte name + 32-byte type, all
  little-endian.
* **Data dictionary** (``hfadictionary.cpp``, ``hfafield.cpp:
  Initialize``): text at dictionaryPtr — ``{fields}TypeName,``
  repeated, '.'-terminated.  Field grammar: ``count:`` optional
  ``p``/``*`` pointer, item-type char in ``124cCesStlLfdmMbox``
  (sizes per hfadictionary.cpp:205-244), 'o' named / 'x' inline
  object, 'e' enum with name list, then the field name.  Pointer
  fields store u4 count + u4 offset then inline items
  (hfafield.cpp GetInstBytes); BASEDATA stores rows/cols/type/
  objecttype then ``ceil(bits/8)*rows*cols`` bytes.
* **Bands** (``hfaband.cpp``): Eimg_Layer nodes with width/height/
  pixelType/blockWidth/blockHeight; internal blocks via the
  RasterDMS (Edms_State) ``blockinfo[]`` offset/size/logvalid/
  compressionType table; spill files via ExternalRasterDMS —
  block *i* of stack layer *k* at ``layerStackDataOffset +
  blockSize*(i*layerStackCount) + k*blockSize`` with the validity
  bitmap 20 bytes into layerStackValidFlagsOffset
  (hfaband.cpp:LoadExternalBlockInfo / GetRasterBlock).
* **ESRI RLE blocks** (``hfaband.cpp:UncompressBlock``): u4 min,
  i4 numruns, i4 dataoffset, u1 numbits; numruns == -1 is a plain
  reduced-precision stream; otherwise repeat counters at 13 use a
  2-bit length prefix, values are packed at numbits (16/32-bit
  values BIG-endian inside the stream), output = raw + min with
  f32 written as the s32 bit pattern (GDAL bug #1000 behavior).
* **Geotransform** (``hfaopen.cpp:1026-1095``): Eprj_MapInfo
  pixel-center corners widened by half a pixel ("ds" units are
  arcseconds/3600); else the order-1 Efga_Polynomial
  ``MapToPixelXForm.XForm0`` inverted and shifted half a pixel.

Published parity (``autotest/gdrivers/hfa.py``): int.img 6691,
float.img 23529 + pixel(100,100) ≈ 41.0216598, spill.img 1631 with
spill.rrd overview 340, fg118-91.aux rotated geotransform,
erdas_cm.img empty-compressed checksum 0.
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["read_hfa", "open_hfa", "hfa_geotransform"]

# item-type char → byte size (hfadictionary.cpp:205-244)
_ITEM_SIZE = {"1": 1, "2": 1, "4": 1, "c": 1, "C": 1,
              "e": 2, "s": 2, "S": 2,
              "t": 4, "l": 4, "L": 4, "f": 4,
              "d": 8, "m": 8, "M": 16}

_ITEM_DTYPE = {"c": "u1", "C": "i1", "e": "<u2", "s": "<u2",
               "S": "<i2", "t": "<u4", "l": "<u4", "L": "<i4",
               "f": "<f4", "d": "<f8"}

# EPT pixel-type code → (numpy dtype, bits)
_EPT = {0: ("u1", 1), 1: ("u1", 2), 2: ("u1", 4), 3: ("u1", 8),
        4: ("i1", 8), 5: ("<u2", 16), 6: ("<i2", 16),
        7: ("<u4", 32), 8: ("<i4", 32), 9: ("<f4", 32),
        10: ("<f8", 64), 11: ("<c8", 64), 12: ("<c16", 128)}

_EPT_NAMES = {"u1": 0, "u2": 1, "u4": 2, "u8": 3, "s8": 4,
              "u16": 5, "s16": 6, "u32": 7, "s32": 8,
              "f32": 9, "f64": 10, "c64": 11, "c128": 12}


# ------------------------------------------------------- dictionary

class _Field:
    __slots__ = ("count", "pointer", "itype", "otype", "enums", "name")

    def __init__(self, count, pointer, itype, otype, enums, name):
        self.count = count
        self.pointer = pointer
        self.itype = itype
        self.otype = otype
        self.enums = enums
        self.name = name


def _parse_field(s, pos):
    """Parse one field definition at s[pos:] (hfafield.cpp
    Initialize grammar); returns (_Field, newpos)."""
    j = s.index(":", pos)
    count = int(s[pos:j] or "0")
    pos = j + 1
    pointer = ""
    if s[pos] in "p*":
        pointer = s[pos]
        pos += 1
    itype = s[pos]
    pos += 1
    otype = None
    enums = None
    if itype == "o":
        j = s.index(",", pos)
        otype = s[pos:j]
        pos = j + 1
    elif itype == "x" and s[pos] == "{":
        depth = 1
        pos += 1
        start = pos
        while depth:
            if s[pos] == "{":
                depth += 1
            elif s[pos] == "}":
                depth -= 1
            pos += 1
        inner = s[start:pos - 1]
        j = s.index(",", pos)
        otype = ("__inline__", inner)
        itype = "o"
        pos = j + 1
    elif itype == "e":
        j = s.index(":", pos)
        n = int(s[pos:j])
        pos = j + 1
        enums = []
        for _ in range(n):
            j = s.index(",", pos)
            enums.append(s[pos:j])
            pos = j + 1
    j = s.index(",", pos)
    name = s[pos:j]
    return _Field(count, pointer, itype, otype, enums, name), j + 1


def _parse_fields(s):
    fields = []
    pos = 0
    while pos < len(s):
        f, pos = _parse_field(s, pos)
        fields.append(f)
    return fields


def _parse_dictionary(text):
    """``{fields}TypeName,``... '.'  → {name: [fields]}."""
    types = {}
    pos = 0
    while pos < len(text) and text[pos] == "{":
        depth = 1
        pos += 1
        start = pos
        while depth:
            if text[pos] == "{":
                depth += 1
            elif text[pos] == "}":
                depth -= 1
            pos += 1
        inner = text[start:pos - 1]
        j = text.index(",", pos)
        name = text[pos:j]
        pos = j + 1
        types[name] = _parse_fields(inner)
    return types


class _Dict:
    def __init__(self, text):
        self.types = _parse_dictionary(text)
        self._inline = {}

    def fields(self, otype):
        if isinstance(otype, tuple):            # inline definition
            key = otype[1]
            if key not in self._inline:
                self._inline[key] = _parse_fields(key)
            return self._inline[key]
        return self.types.get(otype)


def _decode_instance(d, fields, buf, pos):
    """Decode one object instance → (dict, newpos)."""
    out = {}
    for f in fields:
        count = f.count
        if f.pointer:
            count, _off = struct.unpack_from("<II", buf, pos)
            pos += 8
        if f.itype == "b":                       # BASEDATA
            if count == 0:
                out[f.name] = None
                continue
            rows, cols, ept = struct.unpack_from("<iih", buf, pos)
            pos += 12
            dt, bits = _EPT.get(ept, ("u1", 8))
            nbytes = ((bits + 7) // 8) * rows * cols
            raw = buf[pos:pos + nbytes]
            pos += nbytes
            if bits >= 8:
                out[f.name] = np.frombuffer(raw, dt,
                                            count=rows * cols) \
                    .reshape(rows, cols)
            else:
                out[f.name] = np.frombuffer(raw, "u1").copy()
            continue
        if f.itype == "o":
            sub = d.fields(f.otype)
            if sub is None:
                raise ValueError(f"unknown HFA type {f.otype!r}")
            items = []
            for _ in range(count):
                o, pos = _decode_instance(d, sub, buf, pos)
                items.append(o)
            out[f.name] = items[0] if f.count == 1 and \
                not f.pointer else items
            continue
        if f.itype in ("c", "C"):
            raw = buf[pos:pos + count]
            pos += count
            out[f.name] = raw.split(b"\x00", 1)[0] \
                .decode("latin-1", errors="replace")
            continue
        size = _ITEM_SIZE[f.itype]
        dt = _ITEM_DTYPE.get(f.itype)
        raw = buf[pos:pos + size * count]
        pos += size * count
        if dt is None:                           # 1/2/4-bit scalars
            vals = np.frombuffer(raw, "u1")
        else:
            vals = np.frombuffer(raw, dt, count=count)
        if f.itype == "e" and f.enums is not None:
            vals = [f.enums[v] if v < len(f.enums) else int(v)
                    for v in vals]
            out[f.name] = vals[0] if count == 1 else vals
        elif count == 1:
            v = vals[0]
            out[f.name] = v.item() if hasattr(v, "item") else v
        else:
            out[f.name] = np.asarray(vals)
    return out, pos


# ------------------------------------------------------------ nodes

class _Node:
    __slots__ = ("hfa", "pos", "next", "child", "data_pos",
                 "data_size", "name", "type", "_decoded")

    def __init__(self, hfa, pos):
        self.hfa = hfa
        buf = hfa.buf
        nums = struct.unpack_from("<6i", buf, pos)
        self.pos = pos
        self.next = nums[0]
        self.child = nums[3]
        self.data_pos = nums[4]
        self.data_size = nums[5]
        self.name = buf[pos + 24:pos + 88].split(b"\x00", 1)[0] \
            .decode("latin-1")
        self.type = buf[pos + 88:pos + 120].split(b"\x00", 1)[0] \
            .decode("latin-1")
        self._decoded = None

    def children(self):
        p = self.child
        out = []
        while p:
            n = _Node(self.hfa, p)
            out.append(n)
            p = n.next
        return out

    def named_child(self, name):
        for c in self.children():
            if c.name == name:
                return c
        return None

    def fields(self):
        if self._decoded is None:
            defs = self.hfa.dict.fields(self.type)
            if defs is None or self.data_pos == 0:
                self._decoded = {}
            else:
                self._decoded, _ = _decode_instance(
                    self.hfa.dict, defs,
                    self.hfa.buf[self.data_pos:
                                 self.data_pos + self.data_size], 0)
        return self._decoded


class _HFA:
    def __init__(self, path):
        self.path = str(path)
        with open(path, "rb") as f:
            self.buf = f.read()
        if not self.buf.startswith(b"EHFA_HEADER_TAG"):
            raise ValueError("not an HFA file")
        hdr_pos = struct.unpack_from("<I", self.buf, 16)[0]
        (self.version, _free, root_ptr, _ehl,
         dict_ptr) = struct.unpack_from("<iIIhI", self.buf, hdr_pos)
        end = self.buf.find(b".", dict_ptr)
        # the dictionary's terminating '.' is at top level; a '.'
        # can't appear inside a type name, so first '.' after the
        # last '}' closes it
        text = self.buf[dict_ptr:].split(b"\x00", 1)[0] \
            .decode("latin-1", errors="replace")
        last = text.rfind("}")
        text = text[:text.index(".", last if last >= 0 else 0) + 1] \
            if "." in text[last:] else text
        self.dict = _Dict(text)
        self.root = _Node(self, root_ptr)

    def layers(self):
        out = []
        for c in self.root.children():
            if c.type not in ("Eimg_Layer", "Eimg_Layer_SubSample"):
                continue
            if "width" in c.fields():
                out.append(c)
            else:
                # data-less stub layer (e.g. an .rrd overview
                # container): surface its _ss_N_ subsample children
                out.extend(s for s in c.children()
                           if s.type == "Eimg_Layer_SubSample"
                           and "width" in s.fields())
        return out


def open_hfa(path):
    """Open an HFA container and return its parsed tree (_HFA)."""
    return _HFA(path)


# ------------------------------------------------------ block codec

def _unpack_bits(raw, nbits, count):
    """LSB-first sub-byte unpack (hfaband.cpp bit order)."""
    b = np.frombuffer(raw, "u1")
    if nbits == 1:
        vals = np.unpackbits(b, bitorder="little")
    elif nbits == 2:
        vals = np.empty(b.size * 4, "u1")
        vals[0::4] = b & 3
        vals[1::4] = (b >> 2) & 3
        vals[2::4] = (b >> 4) & 3
        vals[3::4] = (b >> 6) & 3
    else:                                       # 4
        vals = np.empty(b.size * 2, "u1")
        vals[0::2] = b & 0xF
        vals[1::2] = b >> 4
    return vals[:count]


def _rle_values(buf, off, nbits, count):
    """Read `count` packed values at buf[off:] (big-endian for
    16/32-bit, LSB-first for sub-byte; UncompressBlock)."""
    if nbits == 0:
        return np.zeros(count, "i4")
    if nbits in (1, 2, 4):
        nb = (nbits * count + 7) // 8
        return _unpack_bits(buf[off:off + nb], nbits, count) \
            .astype("i4")
    if nbits == 8:
        return np.frombuffer(buf, "u1", count=count,
                             offset=off).astype("i4")
    if nbits == 16:
        return np.frombuffer(buf, ">u2", count=count,
                             offset=off).astype("i4")
    if nbits == 32:
        return np.frombuffer(buf, ">i4", count=count, offset=off) \
            .astype("i4")
    raise ValueError(f"unsupported RLE bit width {nbits}")


def _store(vals, dt, bits, npix):
    """Apply int32 run/stream values to the output dtype the way
    UncompressBlock does (f32 = reinterpret s32 bits)."""
    if dt == "<f4":
        return vals[:npix].astype("<i4").view("<f4")
    if bits < 8:
        return vals[:npix].astype("u1")
    return vals[:npix].astype(dt)


def _uncompress_block(cbuf, npix, dt, bits):
    dmin = struct.unpack_from("<I", cbuf, 0)[0]
    nruns, doff = struct.unpack_from("<ii", cbuf, 4)
    nbits = cbuf[12]
    if nruns == -1:                             # reduced precision
        raw = _rle_values(cbuf, 13, nbits, npix)
        vals = (raw + np.int32(dmin)).astype("i4", copy=False)
        return _store(vals, dt, bits, npix)
    counts = np.empty(nruns, "i8")
    p = 13
    for i in range(nruns):
        b0 = cbuf[p]
        ln = (b0 >> 6) + 1
        v = b0 & 0x3F
        for k in range(1, ln):
            v = v * 256 + cbuf[p + k]
        counts[i] = v
        p += ln
    raw = _rle_values(cbuf, doff, nbits, nruns)
    vals = (raw + np.int32(dmin)).astype("i4", copy=False)
    total = int(counts.sum())
    out = np.repeat(vals, counts)[:npix]
    if total < npix:
        out = np.concatenate([out, np.zeros(npix - total, "i4")])
    return _store(out, dt, bits, npix)


def _expand_subbyte(block_bytes, bits, npix):
    return _unpack_bits(block_bytes, bits, npix)


# ------------------------------------------------------------ bands

def _bigint(v):
    """A 64-bit offset stored as a 2×u4 (lo, hi) pair
    (GetBigIntField semantics)."""
    a = np.asarray(v).ravel()
    if a.size >= 2:
        return int(a[0]) + (int(a[1]) << 32)
    return int(a[0])


def _ige_path(hfa, dms):
    name = dms.fields().get("fileName", {})
    if isinstance(name, dict):
        name = name.get("string", "")
    name = os.path.basename(str(name).replace("\\", "/"))
    base = os.path.dirname(os.path.abspath(hfa.path))
    cand = os.path.join(base, name)
    if name and os.path.exists(cand):
        return cand
    stem = os.path.splitext(hfa.path)[0]
    for ext in (".ige", ".rde"):
        if os.path.exists(stem + ext):
            return stem + ext
    raise FileNotFoundError(f"HFA spill file for {hfa.path}")


def _read_layer(hfa, node):
    f = node.fields()
    w, h = int(f["width"]), int(f["height"])
    bw, bh = int(f["blockWidth"]), int(f["blockHeight"])
    ept = f["pixelType"]
    if isinstance(ept, str):
        ept = _EPT_NAMES[ept]
    dt, bits = _EPT[int(ept)]
    bpr = (w + bw - 1) // bw
    bpc = (h + bh - 1) // bh
    npix = bw * bh
    out_dt = np.dtype(dt) if bits >= 8 else np.dtype("u1")
    arr = np.zeros((bpc * bh, bpr * bw), out_dt)

    dms = node.named_child("RasterDMS")
    ext = node.named_child("ExternalRasterDMS")
    if dms is not None:
        st = dms.fields()
        infos = st["blockinfo"]
        if isinstance(infos, dict):
            infos = [infos]
        for i, bi in enumerate(infos[:bpr * bpc]):
            lv = bi["logvalid"]
            if isinstance(lv, str):
                lv = lv.lower() == "true"
            if not lv:
                continue
            off = int(bi["offset"])
            size = int(bi["size"])
            comp = bi.get("compressionType", 0)
            if isinstance(comp, str):
                comp = 0 if comp in ("no compression", "0") else 1
            cbuf = hfa.buf[off:off + size]
            if comp:
                block = _uncompress_block(cbuf, npix, dt, bits)
            elif bits < 8:
                block = _expand_subbyte(cbuf, bits, npix)
            else:
                block = np.frombuffer(cbuf, dt, count=npix)
            r, c = divmod(i, bpr)
            arr[r * bh:(r + 1) * bh, c * bw:(c + 1) * bw] = \
                block.reshape(bh, bw)
    elif ext is not None:
        st = ext.fields()
        count = int(st["layerStackCount"])
        index = int(st["layerStackIndex"])
        vf_off = _bigint(st["layerStackValidFlagsOffset"])
        d_off = _bigint(st["layerStackDataOffset"])
        bsize = (bw * bh * bits + 7) // 8
        with open(_ige_path(hfa, ext), "rb") as fsp:
            spill = fsp.read()
        if not spill.startswith(b"ERDAS_IMG_EXTERNAL_RASTER"):
            raise ValueError("corrupt HFA spill file")
        bytes_per_row = (bpr + 7) // 8
        vmap = np.frombuffer(
            spill, "u1",
            count=bytes_per_row * bpc + 20, offset=vf_off)
        for i in range(bpr * bpc):
            col, row = i % bpr, i // bpr
            bit = row * bytes_per_row * 8 + col + 20 * 8
            if not (vmap[bit >> 3] >> (bit & 7)) & 1:
                continue
            off = d_off + bsize * i * count + index * bsize
            cbuf = spill[off:off + bsize]
            if bits < 8:
                block = _expand_subbyte(cbuf, bits, npix)
            else:
                block = np.frombuffer(cbuf, dt, count=npix)
            r, c = divmod(i, bpr)
            arr[r * bh:(r + 1) * bh, c * bw:(c + 1) * bw] = \
                block.reshape(bh, bw)
    else:
        raise ValueError(f"HFA layer {node.name} has no raster data")
    return arr[:h, :w]


def _nodata(node):
    nd = None
    for c in node.children():
        if c.type == "Eimg_NonInitializedValue":
            bd = c.fields().get("valueBD")
            if bd is not None and np.size(bd):
                nd = float(np.asarray(bd).ravel()[0])
    return nd


def _one(v):
    """Unwrap a pointer-decoded single-instance list."""
    return v[0] if isinstance(v, list) and len(v) == 1 else v


def hfa_geotransform(hfa):
    """MapInfo / XForm geotransform (hfaopen.cpp:1026-1095)."""
    layers = hfa.layers()
    if not layers:
        return None
    node = layers[0]
    mi = node.named_child("Map_Info")
    if mi is None:
        for c in node.children():
            if c.type == "Eprj_MapInfo":
                mi = c
                break
    if mi is not None:
        f = mi.fields()
        ul = _one(f["upperLeftCenter"])
        lr = _one(f["lowerRightCenter"])
        px = _one(f["pixelSize"])
        pw = float(px.get("width", px.get("x", 1.0)))
        ph = float(px.get("height", px.get("y", 1.0)))
        g1 = pw or 1.0
        g5 = -ph if float(ul["y"]) >= float(lr["y"]) else ph
        g5 = g5 or 1.0
        gt = (float(ul["x"]) - g1 * 0.5, g1, 0.0,
              float(ul["y"]) - g5 * 0.5, 0.0, g5)
        if f.get("units") == "ds":
            gt = tuple(v / 3600.0 for v in gt)
        return gt
    xf = node.named_child("MapToPixelXForm")
    x0 = xf.named_child("XForm0") if xf is not None else None
    if x0 is None:
        return None
    f = x0.fields()
    if int(f.get("order", 0)) != 1 or int(f.get("termcount", 0)) != 3:
        return None
    vec = np.asarray(f["polycoefvector"], "f8").ravel()
    mtx = np.asarray(f["polycoefmtx"], "f8").ravel()
    fwd = (vec[0], mtx[0], mtx[2], vec[1], mtx[1], mtx[3])
    det = fwd[1] * fwd[5] - fwd[2] * fwd[4]
    if det == 0.0:
        return None
    inv_det = 1.0 / det
    g = [0.0] * 6
    g[1] = fwd[5] * inv_det
    g[4] = -fwd[4] * inv_det
    g[2] = -fwd[2] * inv_det
    g[5] = fwd[1] * inv_det
    g[0] = (fwd[2] * fwd[3] - fwd[0] * fwd[5]) * inv_det
    g[3] = (-fwd[1] * fwd[3] + fwd[0] * fwd[4]) * inv_det
    g[0] -= g[1] * 0.5 + g[2] * 0.5
    g[3] -= g[4] * 0.5 + g[5] * 0.5
    return tuple(g)


def read_hfa(src):
    """HFA → (array[bands, h, w], geotransform, nodata)."""
    hfa = _HFA(src)
    layers = hfa.layers()
    if not layers:
        raise ValueError("HFA file has no raster layers")
    bands = [_read_layer(hfa, n) for n in layers]
    nd = _nodata(layers[0])
    return np.stack(bands), hfa_geotransform(hfa), nd
