"""Zarr v2 / v3 chunked-array store, from scratch.

Reference driver: ``frmts/zarr/`` (``zarr_v2_array.cpp``,
``zarr_v3_array.cpp``, ``zarr_compressors.cpp``, ``zarr_filters.cpp``);
semantics validated against ``autotest/gdrivers/zarr_driver.py``
(compression methods, shuffle/delta/quantize/fixedscaleoffset filters,
Fortran order, compound dtypes, fill values, v3 groups/codecs,
``_ARRAY_DIMENSIONS`` / ``byte_cf1`` classic-raster CF georeferencing).

Store layout (all public spec):
  * v2 — per-directory ``.zgroup`` / ``.zarray`` / ``.zattrs`` JSON,
    chunk files ``i.j.k`` (``dimension_separator`` may be ``/``),
    optional consolidated ``.zmetadata`` at the root.
  * v3 — one ``zarr.json`` per node (``node_type`` group|array),
    chunks under ``c/i/j`` (separator configurable), codecs chain
    (``bytes`` endian + compressors), ``dimension_names``.

Codecs implemented here without external libs: zlib/gzip/lzma via the
stdlib, LZ4 block format and the Blosc1 container from scratch, and a
Zstandard frame parser for RAW/RLE blocks (FSE/Huffman-compressed
zstd blocks raise ``NotImplementedError`` — a documented swap point;
the reference's own fixture frames are RAW).  numcodecs filters:
``shuffle`` (byte transpose), ``delta`` (cumsum decode), ``quantize``
(decode is identity), ``fixedscaleoffset`` (``x/scale + offset``).

Scale path: :func:`chunk_refs` enumerates the chunk grid as pure
metadata so a Ray pipeline can fan one task out per chunk —
each worker opens the store independently and decodes only its own
chunk files; nothing but (array metadata, chunk index) ever sits on
the driver.
"""

from __future__ import annotations

import base64
import gzip as _gzip
import json
import lzma as _lzma
import math
import os
import struct
import zlib as _zlib

import numpy as np

__all__ = [
    "ZarrArray", "ZarrGroup", "open_zarr", "open_zarr_array",
    "read_zarr_raster", "write_zarr", "write_zarr_classic",
    "chunk_refs", "lz4_decompress", "lz4_compress",
]


# ---------------------------------------------------------------- codecs

def lz4_decompress(buf, out_size):
    """LZ4 *block* format decode (public spec: token nibbles, LSIC
    length continuation, 2-byte LE match offsets, 4-byte min match)."""
    src = memoryview(buf)
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            dst += src[i:i + lit]
            i += lit
        if i >= n:
            break                       # last sequence has no match
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("corrupt LZ4 block: zero offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(dst) - off
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        for _ in range(mlen):           # may self-overlap: byte-serial
            dst.append(dst[start])
            start += 1
        if len(dst) > out_size:
            raise ValueError("corrupt LZ4 block: output overrun")
    return bytes(dst)


def lz4_compress(data):
    """Valid (literal-only) LZ4 block stream — correct, not maximal."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n or n == 0:
        lit = n - i
        token = min(lit, 15) << 4
        out.append(token)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += data[i:i + lit]
        break
    return bytes(out)


def _zstd_decompress(buf):
    """Zstandard frame decode for RAW / RLE blocks (RFC 8878 framing).

    Compressed (FSE/Huffman) blocks are a documented
    ``NotImplementedError`` swap point; zarr fixtures at tiny chunk
    sizes emit RAW blocks.
    """
    src = memoryview(buf)
    if len(src) < 4 or struct.unpack("<I", src[:4])[0] != 0xFD2FB528:
        raise ValueError("not a zstd frame")
    i = 4
    fhd = src[i]
    i += 1
    single_segment = bool(fhd & 0x20)
    if fhd & 0x03:                       # dictionary id present
        i += (0, 1, 2, 4)[fhd & 0x03]
    if not single_segment:
        i += 1                           # window descriptor
    fcs_code = fhd >> 6
    fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_code]
    i += fcs_len
    out = bytearray()
    while True:
        hdr = src[i] | (src[i + 1] << 8) | (src[i + 2] << 16)
        i += 3
        last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        if btype == 0:                   # raw
            out += src[i:i + bsize]
            i += bsize
        elif btype == 1:                 # RLE: one byte repeated bsize×
            out += bytes([src[i]]) * bsize
            i += 1
        elif btype == 2:
            raise NotImplementedError(
                "zstd FSE/Huffman-compressed blocks not implemented "
                "(documented swap point; RAW/RLE frames decode)")
        else:
            raise ValueError("reserved zstd block type")
        if last:
            break
    return bytes(out)


def _zstd_compress(data):
    """Minimal valid zstd frame: single segment, RAW blocks."""
    out = bytearray(struct.pack("<I", 0xFD2FB528))
    n = len(data)
    # FHD: single_segment=1, FCS code by content size
    if n <= 255:
        out.append(0x20)
        out.append(n)
    else:
        out.append(0x20 | (2 << 6))      # 4-byte FCS
        out += struct.pack("<I", n)
    maxb = (1 << 21) - 1
    pos = 0
    while True:
        chunk = data[pos:pos + maxb]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        hdr = last | (0 << 1) | (len(chunk) << 3)
        out += struct.pack("<I", hdr)[:3]
        out += chunk
        if last:
            break
    return bytes(out)


def _unshuffle(raw, elementsize):
    """Inverse of the numcodecs/blosc byte shuffle: the buffer holds
    byte-plane 0 of every element, then plane 1, … — transpose back."""
    if elementsize <= 1:
        return raw
    n = len(raw) // elementsize
    a = np.frombuffer(raw[:n * elementsize], np.uint8)
    return a.reshape(elementsize, n).T.tobytes() + raw[n * elementsize:]


def _shuffle(raw, elementsize):
    if elementsize <= 1:
        return raw
    n = len(raw) // elementsize
    a = np.frombuffer(raw[:n * elementsize], np.uint8)
    return a.reshape(n, elementsize).T.tobytes() + raw[n * elementsize:]


def _blosc_decompress(buf):
    """Blosc1 container (public format.rst): 16-byte header
    ``version versionlz flags typesize | nbytes blocksize cbytes``.
    Handles the memcpy fast path and per-block LZ4/zlib streams with
    the ``[int32 csize][payload]`` split framing; byte-shuffle undone
    per the flags bit."""
    if len(buf) < 16:
        raise ValueError("short blosc header")
    flags, typesize = buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack("<III", buf[4:16])
    shuffled = bool(flags & 0x1)
    memcpyed = bool(flags & 0x2)
    if flags & 0x4:
        raise NotImplementedError("blosc bit-shuffle not implemented")
    cname = (flags >> 5) & 0x7           # 0 blosclz, 1 lz4/lz4hc, ...
    if memcpyed:
        raw = bytes(buf[16:16 + nbytes])
        return _unshuffle(raw, typesize) if shuffled else raw
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack("<%dI" % nblocks, buf[16:16 + 4 * nblocks])
    out = bytearray()
    for j, bstart in enumerate(bstarts):
        neblock = min(blocksize, nbytes - j * blocksize)
        # split into typesize streams when shuffled (blosc splits
        # shuffled blocks so each byte plane compresses alone)
        nstreams = typesize if shuffled and typesize > 1 and \
            neblock % typesize == 0 else 1
        per = neblock // nstreams
        pos = bstart
        block = bytearray()
        for _ in range(nstreams):
            csize = struct.unpack("<i", buf[pos:pos + 4])[0]
            pos += 4
            payload = buf[pos:pos + abs(csize)]
            pos += abs(csize)
            if csize == per or csize < 0:
                block += payload[:per]
            elif cname == 1:
                block += lz4_decompress(payload, per)
            elif cname == 4:
                block += _zlib.decompress(bytes(payload))
            else:
                raise NotImplementedError(
                    f"blosc inner codec {cname} not implemented")
        out += _unshuffle(bytes(block), typesize) if shuffled \
            else bytes(block)
    return bytes(out[:nbytes])


def _decompress_v2(buf, comp):
    if comp is None:
        return bytes(buf)
    cid = comp.get("id")
    if cid == "zlib":
        return _zlib.decompress(buf)
    if cid == "gzip":
        return _gzip.decompress(buf)
    if cid == "lzma":
        return _lzma.decompress(buf)
    if cid == "lz4":
        (osize,) = struct.unpack("<I", bytes(buf[:4]))
        return lz4_decompress(buf[4:], osize)
    if cid == "zstd":
        return _zstd_decompress(buf)
    if cid == "blosc":
        return _blosc_decompress(buf)
    raise NotImplementedError(f"zarr compressor {cid!r}")


def _compress_v2(raw, comp):
    if comp is None:
        return raw
    cid = comp.get("id")
    level = int(comp.get("level", 6))
    if cid == "zlib":
        return _zlib.compress(raw, level)
    if cid == "gzip":
        return _gzip.compress(raw, compresslevel=level)
    if cid == "lzma":
        return _lzma.compress(raw)
    if cid == "lz4":
        return struct.pack("<I", len(raw)) + lz4_compress(raw)
    if cid == "zstd":
        return _zstd_compress(raw)
    raise NotImplementedError(f"zarr write compressor {cid!r}")


def _decode_filters(raw, filters, dtype):
    """Apply the numcodecs filter chain in REVERSE on decode; returns
    (bytes, final_dtype) — filters may change the element type."""
    if not filters:
        return raw, dtype
    for f in reversed(filters):
        fid = f.get("id")
        if fid == "shuffle":
            raw = _unshuffle(raw, int(f.get("elementsize", 4)))
        elif fid == "delta":
            dt = np.dtype(f.get("dtype", str(dtype)))
            astype = np.dtype(f.get("astype", dt))
            if astype != dt:
                # the reference's CPL delta filter errors likewise
                # (port/cpl_compressor.cpp:1092 "Only ASTYPE=DTYPE
                # currently supported")
                raise NotImplementedError(
                    "zarr delta filter with astype != dtype")
            a = np.frombuffer(raw, dt)
            raw = np.cumsum(a, dtype=dt).tobytes()
        elif fid == "quantize":
            # quantize is lossy on encode; decode is a plain astype
            astype = np.dtype(f.get("astype", f.get("dtype", "<f4")))
            dt = np.dtype(f.get("dtype", "<f8"))
            raw = np.frombuffer(raw, astype).astype(dt).tobytes()
            dtype = dt
        elif fid == "fixedscaleoffset":
            astype = np.dtype(f.get("astype", "|u1"))
            dt = np.dtype(f.get("dtype", "<f8"))
            scale = float(f.get("scale", 1.0))
            offset = float(f.get("offset", 0.0))
            a = np.frombuffer(raw, astype).astype(dt)
            raw = (a / scale + offset).astype(dt).tobytes()
            dtype = dt
        else:
            raise NotImplementedError(f"zarr filter {fid!r}")
    return raw, dtype


# ------------------------------------------------------------- metadata

_V3_DTYPES = {
    "bool": "|b1", "int8": "|i1", "uint8": "|u1",
    "int16": "<i2", "uint16": "<u2", "int32": "<i4", "uint32": "<u4",
    "int64": "<i8", "uint64": "<u8",
    "float16": "<f2", "float32": "<f4", "float64": "<f8",
    "complex64": "<c8", "complex128": "<c16",
}


def _parse_dtype(spec, zarr_format):
    if zarr_format >= 3:
        if spec not in _V3_DTYPES:
            raise NotImplementedError(f"zarr v3 data_type {spec!r}")
        return np.dtype(_V3_DTYPES[spec])
    if isinstance(spec, list):            # compound: [[name, dtype], …]
        return np.dtype([(n, str(t).replace("!", ">"))
                         for n, t in spec])
    return np.dtype(str(spec).replace("!", ">"))


def _parse_fill(fv, dtype):
    """JSON fill_value → numpy scalar (spec: NaN/Infinity strings,
    base64 for raw bytes, null → undefined ⇒ zeros)."""
    if fv is None:
        return np.zeros((), dtype)[()]
    if dtype.names:
        return np.zeros((), dtype)[()]
    if isinstance(fv, str):
        if fv == "NaN":
            return dtype.type(np.nan)
        if fv == "Infinity":
            return dtype.type(np.inf)
        if fv == "-Infinity":
            return dtype.type(-np.inf)
        if dtype.kind in "SU":
            return dtype.type(fv.encode() if dtype.kind == "S" else fv)
        try:                               # base64-encoded raw scalar
            rawb = base64.b64decode(fv, validate=True)
            if len(rawb) == dtype.itemsize:
                return np.frombuffer(rawb, dtype)[0]
        except Exception:
            pass
        return dtype.type(float(fv))
    if isinstance(fv, bool):
        return dtype.type(fv)
    if isinstance(fv, list) and dtype.kind == "c" and len(fv) == 2:
        return dtype.type(complex(fv[0], fv[1]))
    return dtype.type(fv)


def _read_json(path):
    try:
        with open(path, "rb") as f:
            s = f.read().decode("utf-8")
    except FileNotFoundError:
        return None
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        # the reference's CPLJSON (json-c) tolerates single-quoted
        # strings (array_attrs.zarr fixture: "dtype": '!b1')
        return json.loads(s.replace("'", '"'))


class ZarrArray:
    """One zarr array node; ``read()`` assembles the full ndarray,
    ``read_chunk(idx)`` decodes a single chunk (the Ray fan-out
    unit)."""

    def __init__(self, path, name, meta, attrs=None, fmt=2):
        self.path = str(path)
        self.name = name
        self.fmt = fmt
        self.attrs = dict(attrs or {})
        if fmt >= 3:
            self.shape = [int(s) for s in meta["shape"]]
            grid = meta.get("chunk_grid", {})
            self.chunks = [int(c) for c in
                           grid.get("configuration", {}).get(
                               "chunk_shape", self.shape)]
            self.dtype = _parse_dtype(meta["data_type"], 3)
            self.order = "C"
            self.compressor = None
            self.filters = None
            self.codecs = meta.get("codecs")
            cke = meta.get("chunk_key_encoding",
                           {"name": "default"})
            self.key_name = cke.get("name", "default")
            self.separator = cke.get("configuration", {}).get(
                "separator", "/" if self.key_name == "default" else ".")
            self.dimension_names = meta.get("dimension_names")
            self.attrs.update(meta.get("attributes") or {})
        else:
            self.shape = [int(s) for s in meta["shape"]]
            self.chunks = [int(c) for c in meta["chunks"]]
            self.dtype = _parse_dtype(meta["dtype"], 2)
            self.order = meta.get("order", "C")
            self.compressor = meta.get("compressor")
            self.filters = meta.get("filters")
            self.codecs = None
            self.key_name = "v2"
            self.separator = meta.get("dimension_separator", ".")
            self.dimension_names = self.attrs.get("_ARRAY_DIMENSIONS")
        self.fill_value = _parse_fill(meta.get("fill_value"),
                                      self.dtype)
        self.meta = meta

    # -- layout -----------------------------------------------------
    @property
    def ndim(self):
        return len(self.shape)

    def grid_shape(self):
        return [max(1, -(-s // c)) for s, c in
                zip(self.shape, self.chunks)] if self.shape else []

    def chunk_key(self, idx):
        if self.fmt >= 3:
            if self.key_name == "v2":
                return self.separator.join(str(i) for i in idx) or "0"
            parts = ["c"] + [str(i) for i in idx]
            if not idx:
                parts.append("0")
            return self.separator.join(parts)
        return self.separator.join(str(i) for i in idx) or "0"

    # -- decode -----------------------------------------------------
    def _decode_bytes(self, buf):
        dtype, order = self.dtype, self.order
        if self.fmt >= 3:
            codecs = self.codecs or [{"name": "bytes"}]
            # run compressors in reverse down to the 'bytes' codec
            for c in reversed(codecs):
                nm = c.get("name")
                cfg = c.get("configuration", {}) or {}
                if nm == "gzip":
                    buf = _gzip.decompress(buf)
                elif nm == "zlib":
                    buf = _zlib.decompress(buf)
                elif nm == "zstd":
                    buf = _zstd_decompress(buf)
                elif nm == "blosc":
                    buf = _blosc_decompress(buf)
                elif nm == "lz4":
                    (osz,) = struct.unpack("<I", bytes(buf[:4]))
                    buf = lz4_decompress(buf[4:], osz)
                elif nm == "crc32c":
                    buf = buf[:-4]
                elif nm == "bytes" or nm == "endian":
                    if cfg.get("endian", "little") == "big":
                        dtype = dtype.newbyteorder(">")
                    else:
                        dtype = dtype.newbyteorder("<")
                elif nm == "transpose":
                    ordcfg = cfg.get("order")
                    if ordcfg == "F" or (isinstance(ordcfg, list) and
                                         list(ordcfg) ==
                                         list(range(self.ndim))[::-1]):
                        order = "F"
                else:
                    raise NotImplementedError(f"zarr v3 codec {nm!r}")
        else:
            buf = _decompress_v2(buf, self.compressor)
            buf, dtype = _decode_filters(buf, self.filters, dtype)
        n = int(np.prod(self.chunks)) if self.chunks else 1
        a = np.frombuffer(buf, dtype, count=n)
        if self.chunks:
            a = a.reshape(self.chunks, order="F" if order == "F"
                          else "C")
        else:
            a = a.reshape(())
        return a

    def read_chunk(self, idx):
        """Decode chunk ``idx`` (grid coordinates) or return a
        fill-valued chunk when the file is absent."""
        fp = os.path.join(self.path, *self.chunk_key(idx).split("/"))
        if not os.path.exists(fp):
            return np.full(self.chunks or (), self.fill_value,
                           self.dtype)
        with open(fp, "rb") as f:
            return self._decode_bytes(f.read())

    def read(self):
        if not self.shape:                  # 0-d scalar array
            return self.read_chunk(())
        out = np.full(self.shape, self.fill_value, self.dtype)
        for idx in np.ndindex(*self.grid_shape()):
            a = self.read_chunk(idx)
            sel = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, self.chunks, self.shape))
            clip = tuple(slice(0, sl.stop - sl.start) for sl in sel)
            out[sel] = a[clip]
        return out

    # -- encode -----------------------------------------------------
    def _encode_chunk(self, a):
        raw = np.ascontiguousarray(
            a, self.dtype).tobytes(order="F" if self.order == "F"
                                   else "C")
        if self.fmt >= 3:
            buf = raw
            for c in (self.codecs or [{"name": "bytes"}]):
                nm = c.get("name")
                cfg = c.get("configuration", {}) or {}
                if nm == "bytes":
                    if cfg.get("endian", "little") == "big":
                        buf = np.frombuffer(buf, self.dtype).astype(
                            self.dtype.newbyteorder(">")).tobytes()
                elif nm == "gzip":
                    buf = _gzip.compress(buf, compresslevel=int(
                        cfg.get("level", 6)))
                elif nm == "zlib":
                    buf = _zlib.compress(buf, int(cfg.get("level", 6)))
                else:
                    raise NotImplementedError(
                        f"zarr v3 write codec {nm!r}")
            return buf
        if self.filters:
            raise NotImplementedError("write with v2 filters")
        return _compress_v2(raw, self.compressor)

    def write_chunk(self, idx, a):
        key = self.chunk_key(idx)
        fp = os.path.join(self.path, *key.split("/"))
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            f.write(self._encode_chunk(a))

    def write(self, data):
        data = np.asarray(data, self.dtype).reshape(self.shape)
        if not self.shape:
            self.write_chunk((), data)
            return
        for idx in np.ndindex(*self.grid_shape()):
            sel = tuple(slice(i * c, min((i + 1) * c, s))
                        for i, c, s in zip(idx, self.chunks,
                                           self.shape))
            block = data[sel]
            if block.shape != tuple(self.chunks):   # pad edge chunks
                full = np.full(self.chunks, self.fill_value,
                               self.dtype)
                full[tuple(slice(0, b) for b in block.shape)] = block
                block = full
            self.write_chunk(idx, block)


class ZarrGroup:
    def __init__(self, path, name="/", attrs=None, fmt=2,
                 zmetadata=None, prefix=""):
        self.path = str(path)
        self.name = name
        self.fmt = fmt
        self.attrs = dict(attrs or {})
        self._zmeta = zmetadata      # consolidated v2 metadata dict
        self._prefix = prefix        # key prefix inside .zmetadata

    def _subdirs(self):
        try:
            return sorted(
                d for d in os.listdir(self.path)
                if os.path.isdir(os.path.join(self.path, d)))
        except FileNotFoundError:
            return []

    def group_names(self):
        out = []
        for d in self._subdirs():
            sub = os.path.join(self.path, d)
            if self.fmt >= 3:
                j = _read_json(os.path.join(sub, "zarr.json"))
                if j and j.get("node_type") == "group":
                    out.append(d)
            elif os.path.exists(os.path.join(sub, ".zgroup")):
                out.append(d)
        return out

    def array_names(self):
        out = []
        for d in self._subdirs():
            sub = os.path.join(self.path, d)
            if self.fmt >= 3:
                j = _read_json(os.path.join(sub, "zarr.json"))
                if j and j.get("node_type") == "array":
                    out.append(d)
            elif os.path.exists(os.path.join(sub, ".zarray")):
                out.append(d)
        return out

    def open_group(self, name):
        sub = os.path.join(self.path, name)
        if self.fmt >= 3:
            j = _read_json(os.path.join(sub, "zarr.json"))
            if not j or j.get("node_type") != "group":
                return None
            return ZarrGroup(sub, name, j.get("attributes"), 3)
        if not os.path.exists(os.path.join(sub, ".zgroup")):
            return None
        attrs = _read_json(os.path.join(sub, ".zattrs")) or {}
        return ZarrGroup(sub, name, attrs, 2, self._zmeta,
                         self._prefix + name + "/")

    def open_array(self, name):
        sub = os.path.join(self.path, name)
        if self.fmt >= 3:
            j = _read_json(os.path.join(sub, "zarr.json"))
            if not j or j.get("node_type") != "array":
                return None
            return ZarrArray(sub, name, j, fmt=3)
        meta = _read_json(os.path.join(sub, ".zarray"))
        if meta is None:
            return None
        attrs = _read_json(os.path.join(sub, ".zattrs")) or {}
        return ZarrArray(sub, name, meta, attrs, 2)

    def walk_arrays(self, prefix=""):
        """Yield (full_name, ZarrArray) over the whole subtree."""
        for n in self.array_names():
            yield prefix + "/" + n, self.open_array(n)
        for g in self.group_names():
            sub = self.open_group(g)
            yield from sub.walk_arrays(prefix + "/" + g)


def open_zarr(path):
    """Open a store root → ZarrGroup or ZarrArray."""
    p = str(path)
    j = _read_json(os.path.join(p, "zarr.json"))
    if j is not None:
        fmt = int(j.get("zarr_format", 3))
        if j.get("node_type") == "array":
            return ZarrArray(p, os.path.basename(p.rstrip("/")), j,
                             fmt=fmt)
        return ZarrGroup(p, "/", j.get("attributes"), fmt)
    meta = _read_json(os.path.join(p, ".zarray"))
    if meta is not None:
        attrs = _read_json(os.path.join(p, ".zattrs")) or {}
        return ZarrArray(p, os.path.basename(p.rstrip("/")), meta,
                         attrs, 2)
    zmeta = _read_json(os.path.join(p, ".zmetadata"))
    attrs = _read_json(os.path.join(p, ".zattrs")) or {}
    if zmeta is None and not os.path.exists(
            os.path.join(p, ".zgroup")):
        raise FileNotFoundError(f"no zarr metadata under {p}")
    return ZarrGroup(p, "/", attrs, 2,
                     (zmeta or {}).get("metadata"))


def open_zarr_array(path, name=None):
    """Open one array by ``/``-separated full name (or the sole array
    in the store when unnamed)."""
    root = open_zarr(path)
    if isinstance(root, ZarrArray):
        return root
    if name:
        node = root
        parts = [p for p in str(name).split("/") if p]
        for part in parts[:-1]:
            node = node.open_group(part)
            if node is None:
                raise KeyError(f"zarr group {part!r} not found")
        a = node.open_array(parts[-1])
        if a is None:
            raise KeyError(f"zarr array {name!r} not found")
        return a
    arrays = list(root.walk_arrays())
    main = [a for _, a in arrays if a.ndim >= 2] or \
           [a for _, a in arrays]
    if not main:
        raise KeyError(f"no arrays under {path}")
    return main[0]


# -------------------------------------------------- classic raster view

def _axis_gt(vals):
    """Center-coordinate vector → (origin_edge, step)."""
    v = np.asarray(vals, np.float64)
    step = (v[-1] - v[0]) / (len(v) - 1) if len(v) > 1 else 1.0
    return v[0] - step / 2.0, step


def read_zarr_raster(path, array=None):
    """Classic 2-D raster open (zarr_driver.py test_zarr_read_classic
    / byte_cf1 CF georeferencing): returns ``(arr, geotransform,
    nodata)`` with the geotransform recovered from the x/y indexing
    variables when ``_ARRAY_DIMENSIONS`` names them."""
    ar = open_zarr_array(path, array)
    data = ar.read()
    if data.ndim == 1:
        data = data[None, :]
    gt = None
    dn = ar.dimension_names
    if dn and len(dn) >= 2:
        root = open_zarr(path)
        if isinstance(root, ZarrGroup):
            yv = root.open_array(dn[-2])
            xv = root.open_array(dn[-1])
            if xv is not None and yv is not None:
                x0, dx = _axis_gt(xv.read())
                yvals = yv.read()
                y0, dy = _axis_gt(yvals)
                if dy > 0:
                    # CF south-up store: the reference flips rows so
                    # classic rasters keep a north-up geotransform
                    data = data[..., ::-1, :]
                    y0, dy = float(yvals[-1]) + dy / 2.0, -dy
                gt = (x0, dx, 0.0, y0, 0.0, dy)
    nodata = None
    if ar.meta.get("fill_value") is not None and \
            ar.dtype.kind in "iuf":
        nodata = float(ar.fill_value)
    return data, gt, nodata


def zarr_georef(path, array=None):
    """(geotransform, nodata) from the axis indexing variables ONLY —
    reads two 1-D coordinate arrays, never the pixel payload, so the
    driver can georeference a chunk grid without touching data.  The
    geotransform is in STORED row order (south-up stores keep dy>0);
    :func:`read_zarr_raster` is the row-flipping classic view."""
    ar = open_zarr_array(path, array)
    gt = None
    dn = ar.dimension_names
    if dn and len(dn) >= 2:
        root = open_zarr(path)
        if isinstance(root, ZarrGroup):
            yv = root.open_array(dn[-2])
            xv = root.open_array(dn[-1])
            if xv is not None and yv is not None:
                x0, dx = _axis_gt(xv.read())
                y0, dy = _axis_gt(yv.read())
                gt = (x0, dx, 0.0, y0, 0.0, dy)
    nodata = None
    if ar.meta.get("fill_value") is not None and \
            ar.dtype.kind in "iuf":
        nodata = float(ar.fill_value)
    return gt, nodata


# ------------------------------------------------------------- writers

def write_zarr(path, data, *, name=None, chunks=None, compressor="zlib",
               fill_value=0, attrs=None, dim_names=None, zarr_format=2,
               order="C", level=6):
    """Write one array (with a root group) as a zarr v2 or v3 store."""
    data = np.asarray(data)
    p = str(path)
    name = name or os.path.splitext(os.path.basename(p.rstrip("/")))[0]
    apath = os.path.join(p, name)
    os.makedirs(apath, exist_ok=True)
    chunks = list(chunks or data.shape)
    if zarr_format >= 3:
        with open(os.path.join(p, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group",
                       "attributes": {}}, f)
        codecs = [{"name": "bytes",
                   "configuration": {"endian": "little"}}]
        if compressor in ("zlib", "gzip"):
            codecs.append({"name": "gzip",
                           "configuration": {"level": level}})
        meta = {
            "zarr_format": 3, "node_type": "array",
            "shape": list(data.shape),
            "data_type": {v: k for k, v in _V3_DTYPES.items()}[
                data.dtype.newbyteorder("<").str.replace("=", "<")
                if data.dtype.itemsize > 1 else data.dtype.str],
            "chunk_grid": {"name": "regular",
                           "configuration":
                               {"chunk_shape": chunks}},
            "chunk_key_encoding": {"name": "default",
                                   "configuration":
                                       {"separator": "/"}},
            "fill_value": (fill_value if not (
                isinstance(fill_value, float) and
                math.isnan(fill_value)) else "NaN"),
            "codecs": codecs,
            "attributes": attrs or {},
        }
        if dim_names:
            meta["dimension_names"] = list(dim_names)
        with open(os.path.join(apath, "zarr.json"), "w") as f:
            json.dump(meta, f)
        ar = ZarrArray(apath, name, meta, fmt=3)
    else:
        with open(os.path.join(p, ".zgroup"), "w") as f:
            json.dump({"zarr_format": 2}, f)
        comp = None if compressor is None else (
            compressor if isinstance(compressor, dict)
            else {"id": compressor, "level": level})
        le = data.dtype.newbyteorder("<") if data.dtype.itemsize > 1 \
            else data.dtype
        meta = {
            "zarr_format": 2, "shape": list(data.shape),
            "chunks": chunks, "dtype": le.str,
            "compressor": comp, "filters": None, "order": order,
            "fill_value": (fill_value if not (
                isinstance(fill_value, float) and
                math.isnan(fill_value)) else "NaN"),
        }
        with open(os.path.join(apath, ".zarray"), "w") as f:
            json.dump(meta, f)
        a_attrs = dict(attrs or {})
        if dim_names:
            a_attrs["_ARRAY_DIMENSIONS"] = list(dim_names)
        if a_attrs:
            with open(os.path.join(apath, ".zattrs"), "w") as f:
                json.dump(a_attrs, f)
        ar = ZarrArray(apath, name, meta, a_attrs, 2)
    ar.write(data.astype(ar.dtype, copy=False))
    return ar


def write_zarr_classic(path, arr, gt=None, nodata=None, crs_wkt=None,
                       name=None, chunks=None, compressor="zlib"):
    """Classic-raster write in the CF layout the reference emits
    (byte_cf1.zarr: main array + ``x``/``y`` center-coordinate
    indexing variables + ``_ARRAY_DIMENSIONS``)."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[0] == 1:
        arr = arr[0]
    h, w = arr.shape[-2:]
    attrs = {}
    if crs_wkt:
        attrs["_CRS"] = {"wkt": crs_wkt}
    ar = write_zarr(path, arr, name=name, chunks=chunks,
                    compressor=compressor,
                    fill_value=(nodata if nodata is not None else 0),
                    attrs=attrs, dim_names=["y", "x"])
    if gt is not None:
        xs = gt[0] + gt[1] * (np.arange(w) + 0.5)
        ys = gt[3] + gt[5] * (np.arange(h) + 0.5)
        for axis, vals in (("x", xs), ("y", ys)):
            sub = os.path.join(str(path), axis)
            os.makedirs(sub, exist_ok=True)
            meta = {"zarr_format": 2, "shape": [len(vals)],
                    "chunks": [len(vals)], "dtype": "<f8",
                    "compressor": None, "filters": None,
                    "order": "C", "fill_value": 0.0}
            with open(os.path.join(sub, ".zarray"), "w") as f:
                json.dump(meta, f)
            with open(os.path.join(sub, ".zattrs"), "w") as f:
                json.dump({"_ARRAY_DIMENSIONS": [axis]}, f)
            ZarrArray(sub, axis, meta, fmt=2).write(
                vals.astype("<f8"))
    return ar


# --------------------------------------------------------- Ray fan-out

def chunk_refs(path, array=None):
    """Enumerate the chunk grid as metadata rows for a Ray pipeline:
    one ``(path, array, chunk_index, window)`` per chunk.  Workers
    call :meth:`ZarrArray.read_chunk` on their own index so the
    driver never touches pixel bytes — at a 100-TB store this is the
    unit of parallelism (millions of chunks → tasks)."""
    ar = open_zarr_array(path, array)
    full = array
    out = []
    for idx in np.ndindex(*ar.grid_shape()):
        window = [(int(i * c), int(min((i + 1) * c, s)))
                  for i, c, s in zip(idx, ar.chunks, ar.shape)]
        out.append({"path": str(path), "array": full,
                    "chunk": list(map(int, idx)), "window": window})
    return out
