"""Minimal from-scratch TIFF reader (classic TIFF + BigTIFF, strips +
tiles).

Scope (enough to read GDAL's own test fixtures as independent parity
oracles — see ``autotest/gcore/tiff_read.py:44-76`` for the published
checksum table this reader is validated against):

* byte orders ``II`` / ``MM``;
* compression: none (1), LZW (5, with TIFF "early change"), Deflate
  (8 / 32946, via :mod:`zlib`), PackBits (32773), CCITT RLE/G3/G4
  (2/3/4 via :mod:`raydal.io.ccitt`; slim_g4.tif checksum 3322,
  ``tiff_read.py`` test_tiff_g4_split);
* predictors: none (1), horizontal differencing (2), floating-point (3);
* sample formats: unsigned / signed int {8,16,32}, IEEE float {16,32,64};
* PlanarConfiguration contig (1) and separate (2), strip and tile layout,
  including partial edge strips/tiles (``tiff_read.py:67-70`` #1179);
* BigTIFF (magic 43): 8-byte offsets, u64 IFD counts, 20-byte entries,
  LONG8/SLONG8/IFD8 types — validated against the published
  strip-offset table (``tiff_read.py:3819-3846``) and
  byte_bigtiff_strip5lines checksum 4672 (``:1227-1235``).

The reference implementation this mirrors semantically is
``frmts/gtiff/gtiffdataset_read.cpp`` (strip/tile chunk walk) and
libtiff's LZW/predictor conventions; every line here is original.
"""

from __future__ import annotations

import struct
import zlib

from .ccitt import decode_g3 as _ccitt_g3, decode_g4 as _ccitt_g4

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["TiffImage", "read_tiff", "read_tiff_overviews",
           "write_tiff"]

_TAG_NAMES = {
    256: "width", 257: "height", 258: "bits_per_sample", 259: "compression",
    347: "jpeg_tables",
    262: "photometric", 273: "strip_offsets", 277: "samples_per_pixel",
    278: "rows_per_strip", 279: "strip_byte_counts", 284: "planar_config",
    292: "t4_options", 293: "t6_options",
    317: "predictor", 322: "tile_width", 323: "tile_length",
    324: "tile_offsets", 325: "tile_byte_counts", 339: "sample_format",
    33550: "model_pixel_scale", 33922: "model_tiepoint",
    42113: "gdal_nodata",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8, 18: 8}   # 16-18: BigTIFF LONG8
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q", 18: "Q"}


def _read_ifd_values(buf, bo, ttype, count, value_field, big=False):
    size = _TYPE_SIZES.get(ttype)
    if size is None:
        return None
    if count < 0 or count > (1 << 24):
        raise ValueError("implausible IFD entry count")
    nbytes = size * count
    inline = 8 if big else 4
    if nbytes <= inline:
        raw = value_field[:nbytes]
    else:
        (off,) = struct.unpack(bo + ("Q" if big else "I"), value_field)
        raw = buf[off:off + nbytes]
    if ttype in (5, 10):  # RATIONAL
        fmt = bo + ("II" if ttype == 5 else "ii") * count
        flat = struct.unpack(fmt, raw)
        return [flat[i] / flat[i + 1] if flat[i + 1] else 0.0
                for i in range(0, 2 * count, 2)]
    if ttype == 2:  # ASCII
        return raw.rstrip(b"\0").decode("latin-1")
    if ttype == 7:  # UNDEFINED: opaque bytes (JPEGTables etc.)
        if len(raw) < nbytes:
            raise ValueError("truncated IFD value")
        return bytes(raw[:nbytes])
    fmt = _TYPE_FMT.get(ttype)
    if fmt is None:
        return None
    if len(raw) < nbytes:
        raise ValueError("truncated IFD value")
    return np.frombuffer(raw[:nbytes],
                         dtype=np.dtype(fmt).newbyteorder(bo)).tolist()


def lzw_decode(data, max_out=1 << 30):
    """TIFF LZW (MSB-first codes, early code-width change)."""
    out = bytearray()
    # dictionary: entries 0-255 single bytes; 256=Clear, 257=EOI
    table = None
    code_width = 9
    next_code = 258
    prev = None
    bitbuf = 0
    bits = 0
    pos = 0
    n = len(data)
    while True:
        while bits < code_width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bits += 8
        code = (bitbuf >> (bits - code_width)) & ((1 << code_width) - 1)
        bits -= code_width
        if code == 256:  # Clear
            table = {i: bytes([i]) for i in range(256)}
            code_width = 9
            next_code = 258
            prev = None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if table is None:
            table = {i: bytes([i]) for i in range(256)}
        if prev is None:
            if code not in table:
                raise ValueError(f"corrupt LZW stream (code {code})")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds limit")
        prev = entry
        # TIFF early change: widen one code before the table is full
        if next_code >= (1 << code_width) - 1 and code_width < 12:
            code_width += 1
    return bytes(out)


def packbits_decode(data):
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            if i < n:
                out += bytes([data[i]]) * (257 - h)
                i += 1
        # h == 128: no-op
    return bytes(out)


def _jpeg_chunk_array(raw, tables):
    """JPEG-in-TIFF chunk (compression 7) → pixel array.

    Abbreviated per-chunk streams share DQT/DHT via the JPEGTables tag
    (TIFF-EP): splice the tables' segments after the chunk's SOI —
    libtiff ``tif_jpeg.c`` JPEGTables handling.  3-component chunks
    come back RGB (JFIF YCbCr convention), 4-component (RGBA/CMYK)
    come back as raw stored components, 12-bit as uint16 — all via
    the from-scratch JPEG decoder."""
    raw = bytes(raw)
    if tables and len(tables) > 4 and raw[:2] == b"\xff\xd8":
        core = bytes(tables)[2:]
        if core[-2:] == b"\xff\xd9":
            core = core[:-2]
        raw = raw[:2] + core + raw[2:]
    px = decode_jpeg(raw)
    return px if px.ndim == 3 else px[..., None]


def _decompress(chunk, compression, max_out=1 << 30):
    if compression == 1:
        return chunk
    if compression == 5:
        return lzw_decode(chunk, max_out=max_out)
    if compression in (8, 32946):
        # bounded: protects against deflate bombs in corrupt chunks
        return zlib.decompressobj().decompress(chunk, max_out)
    if compression == 32773:
        return packbits_decode(chunk)
    raise NotImplementedError(f"TIFF compression {compression} not supported")


def _dtype(sample_format, bits, bo):
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format, "u")
    if bits == 1:
        return None  # handled as bit-packed uint8 expansion
    if bits == 12 and kind == "u":
        return np.dtype("<u2")   # packed 12-bit expands to uint16
    if bits not in (8, 16, 32, 64):
        raise NotImplementedError(f"BitsPerSample {bits} not supported")
    if kind == "f" and bits == 8:
        raise NotImplementedError("8-bit float")
    ch = "<" if bo == "<" else ">"
    return np.dtype(f"{ch}{kind}{bits // 8}")


def _decode_chunk(raw, nrows, ncols, chans, dt, predictor):
    """Raw decompressed chunk bytes → (nrows, ncols, chans) native array.

    Predictors operate on the *file-order* bytes (libtiff ``horAcc``/
    ``fpAcc`` semantics), so they must run before byte-order conversion.
    """
    itemsize = dt.itemsize
    need = nrows * ncols * chans * itemsize
    if len(raw) < need:
        raw = raw.ljust(need, b"\0")
    if predictor == 3:
        # Floating-point predictor: encoder split each row's values into
        # byte planes (most-significant first), then differenced bytes.
        rb = np.frombuffer(raw[:need], dtype=np.uint8).reshape(
            nrows, ncols * chans * itemsize)
        acc = np.cumsum(rb, axis=1, dtype=np.uint8)
        planes = acc.reshape(nrows, itemsize, ncols * chans)
        be = np.ascontiguousarray(np.transpose(planes, (0, 2, 1)))
        arr = be.reshape(nrows, ncols * chans * itemsize).view(
            dt.newbyteorder(">")).reshape(nrows, ncols, chans)
        return arr.astype(dt.newbyteorder("="), copy=True)
    arr = np.frombuffer(raw[:need], dtype=dt).reshape(
        nrows, ncols, chans).astype(dt.newbyteorder("="), copy=True)
    if predictor == 2:
        np.cumsum(arr, axis=1, dtype=arr.dtype, out=arr)
    return arr


class TiffImage:
    """Decoded TIFF: ``bands`` is a list of 2-D numpy arrays."""

    def __init__(self, bands, tags):
        self.bands = bands
        self.tags = tags
        self.height, self.width = bands[0].shape

    @property
    def nodata(self):
        """Band nodata from the GDAL_NODATA ASCII tag (42113), or None."""
        v = self.tags.get("gdal_nodata")
        if v is None or str(v).strip() == "":
            return None
        try:
            return float(str(v).strip())
        except ValueError:
            return None

    @property
    def geotransform(self):
        scale = self.tags.get("model_pixel_scale")
        tie = self.tags.get("model_tiepoint")
        if not scale or not tie or len(tie) < 6:
            return None
        i, j, _, x, y, _ = tie[:6]
        return (x - i * scale[0], scale[0], 0.0, y + j * scale[1], 0.0,
                -scale[1])


def _unpack_bits12(raw, rows, cols_chans):
    """Expand packed 12-bit samples (MSB-first, rows byte-aligned) to
    a (rows, cols_chans) uint16 array — GDAL's NBITS=12 layout."""
    stride = (cols_chans * 12 + 7) // 8
    need = rows * stride
    if len(raw) < need:
        raw = raw.ljust(need, b"\0")
    a = np.frombuffer(raw[:need], dtype=np.uint8).reshape(rows, stride)
    bits = np.unpackbits(a, axis=1)[:, :cols_chans * 12]
    groups = bits.reshape(rows, cols_chans, 12).astype(np.uint16)
    weights = (1 << np.arange(11, -1, -1)).astype(np.uint16)
    return (groups * weights).sum(axis=2, dtype=np.uint16)


def _unpack_bits1(raw, rows, cols):
    """Expand 1-bit-packed rows (row-aligned to byte boundary)."""
    stride = (cols + 7) // 8
    a = np.frombuffer(raw[:rows * stride], dtype=np.uint8).reshape(rows,
                                                                   stride)
    bits = np.unpackbits(a, axis=1)[:, :cols]
    return bits


def read_tiff(buf, ifd_index=0):
    """Parse a classic-TIFF byte buffer → :class:`TiffImage`.

    ``ifd_index`` selects the IFD: 0 = full-resolution image, 1+ = the
    COG/overview chain (the GTiff driver's ``GetOverview(i)`` is IFD
    i+1; validated against the published byte_with_ovr.tif overview
    checksums 1087/328, ``autotest/gcore/libertiff.py:125-131``).
    :func:`read_tiff_overviews` lists every level.

    Corrupt input raises ``ValueError`` (truncated headers included) —
    pipeline callers see one typed decode error, not ``struct.error``.
    """
    try:
        return _read_tiff_impl(buf, ifd_index)
    except (struct.error, KeyError) as e:
        raise ValueError(f"corrupt TIFF: {e!r}") from e


def _read_tiff_impl(buf, ifd_index=0):
    buf = bytes(buf)
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    big = magic == 43
    if big:
        # BigTIFF: 8-byte offsets, u64 IFD counts, 20-byte entries
        offsize, pad = struct.unpack_from(bo + "HH", buf, 4)
        if offsize != 8 or pad != 0:
            raise ValueError("invalid BigTIFF header")
    elif magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    if big:
        (ifd_off,) = struct.unpack_from(bo + "Q", buf, 8)
        for _ in range(ifd_index):
            (n_here,) = struct.unpack_from(bo + "Q", buf, ifd_off)
            (ifd_off,) = struct.unpack_from(
                bo + "Q", buf, ifd_off + 8 + 20 * n_here)
            if ifd_off == 0:
                raise ValueError(f"no IFD {ifd_index} in file")
        (n_entries,) = struct.unpack_from(bo + "Q", buf, ifd_off)
        if n_entries > (1 << 20):
            raise ValueError("implausible IFD entry count")
        ent_base, ent_size, cnt_fmt = ifd_off + 8, 20, "HHQ"
    else:
        (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
        for _ in range(ifd_index):
            (n_here,) = struct.unpack_from(bo + "H", buf, ifd_off)
            (ifd_off,) = struct.unpack_from(bo + "I",
                                            buf, ifd_off + 2 + 12 * n_here)
            if ifd_off == 0:
                raise ValueError(f"no IFD {ifd_index} in file")
        (n_entries,) = struct.unpack_from(bo + "H", buf, ifd_off)
        ent_base, ent_size, cnt_fmt = ifd_off + 2, 12, "HHI"
    tags = {}
    for i in range(n_entries):
        base = ent_base + ent_size * i
        tag, ttype, count = struct.unpack_from(bo + cnt_fmt, buf, base)
        name = _TAG_NAMES.get(tag)
        if name is None:
            continue
        vfield = buf[base + (12 if big else 8):base + ent_size]
        vals = _read_ifd_values(buf, bo, ttype, count, vfield, big=big)
        if vals is None:
            continue
        tags[name] = vals

    def scalar(name, default=None):
        v = tags.get(name, default)
        if isinstance(v, list):
            return v[0]
        return v

    if scalar("width") is None or scalar("height") is None:
        raise ValueError("missing required TIFF dimensions")
    width = int(scalar("width"))
    height = int(scalar("height"))
    spp = int(scalar("samples_per_pixel", 1) or 1)
    if width <= 0 or height <= 0 or spp <= 0:
        raise ValueError("implausible TIFF dimensions "
                         f"{width}x{height}x{spp}")
    bits_list = tags.get("bits_per_sample", [1])
    bits = int(bits_list[0])
    compression = int(scalar("compression", 1))
    t4_options = int(scalar("t4_options", 0))
    predictor = int(scalar("predictor", 1))
    planar = int(scalar("planar_config", 1))
    sfmt_list = tags.get("sample_format", [1])
    sfmt = int(sfmt_list[0])
    jpeg_tables = tags.get("jpeg_tables")
    if compression == 7:
        # JPEG payloads decode through the JPEG codec; 12-bit frames
        # land in uint16 regardless of the dtype ladder
        dt = np.dtype("<u2" if bits > 8 else "u1")
    else:
        dt = _dtype(sfmt, bits, bo)
    itemsize = dt.itemsize if dt is not None else 1
    if width * height * spp * itemsize > (4 << 30):
        raise ValueError("TIFF exceeds the 4 GiB decode budget "
                         f"({width}x{height}x{spp}x{itemsize}B)")

    tiled = "tile_offsets" in tags
    if tiled:
        if scalar("tile_width") is None or scalar("tile_length") is None:
            raise ValueError("tiled TIFF missing tile dimensions")
        tw = int(scalar("tile_width"))
        th = int(scalar("tile_length"))
        if tw <= 0 or th <= 0:
            raise ValueError("corrupt tile size")
        offsets = tags["tile_offsets"]
        counts = tags.get("tile_byte_counts")
        tiles_across = (width + tw - 1) // tw
        tiles_down = (height + th - 1) // th
        if tiles_across * tiles_down > (1 << 20):
            raise ValueError("implausible tile count")
    else:
        rps = int(scalar("rows_per_strip", height) or height)
        rps = min(rps, height)
        offsets = tags["strip_offsets"]
        counts = tags.get("strip_byte_counts")
        strips_per_image = (height + rps - 1) // rps

    n_planes = spp if planar == 2 else 1
    chans_per_chunk = 1 if planar == 2 else spp

    if bits == 1:
        out = np.zeros((height, width, spp), dtype=np.uint8)
    else:
        out = np.zeros((height, width, spp), dtype=dt.newbyteorder("="))

    if tiled:
        chunk_px = tw * th
    else:
        chunk_px = rps * width
    max_chunk = chunk_px * spp * (bits // 8 if bits >= 8 else 1) + 4096

    def chunk_bytes(idx):
        off = int(offsets[idx])
        cnt = int(counts[idx]) if counts else None
        if off == 0 or cnt == 0:
            return None  # sparse/empty chunk: pixels stay zero-filled
        raw = buf[off:off + cnt] if cnt else buf[off:]
        if compression in (2, 3, 4, 7):
            return raw            # decoded by the fax/jpeg chunk paths
        return _decompress(raw, compression, max_out=max_chunk)

    def fax_chunk(raw, nrows, ncols):
        """CCITT strips/tiles (compressions 2/3/4) → (nrows, ncols, 1)
        uint8 0/1 via the from-scratch T.4/T.6 codec."""
        if compression == 4:
            bitsarr = _ccitt_g4(raw, ncols, nrows)
        else:
            two_d = compression == 3 and bool(t4_options & 1)
            bitsarr = _ccitt_g3(raw, ncols, nrows, two_d=two_d)
        # libtiff hands the decoded plane through unchanged (1 = black
        # run) regardless of photometric; GDAL checksums those raw bits
        return bitsarr[..., None]

    if tiled:
        per_plane = tiles_across * tiles_down
        for plane in range(n_planes):
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    idx = plane * per_plane + ty * tiles_across + tx
                    if idx >= len(offsets):
                        continue
                    raw = chunk_bytes(idx)
                    if raw is None:
                        continue
                    if compression == 7:
                        arr = _jpeg_chunk_array(raw, jpeg_tables)
                    elif compression in (2, 3, 4):
                        arr = fax_chunk(raw, th, tw)
                    elif bits == 1:
                        arr = _unpack_bits1(raw, th, tw)[..., None]
                    elif bits == 12:
                        arr = _unpack_bits12(
                            raw, th, tw * chans_per_chunk).reshape(
                            th, tw, chans_per_chunk)
                    else:
                        arr = _decode_chunk(raw, th, tw, chans_per_chunk,
                                            dt, predictor)
                    y0, x0 = ty * th, tx * tw
                    ye = min(y0 + th, height)
                    xe = min(x0 + tw, width)
                    piece = arr[:ye - y0, :xe - x0]
                    if planar == 2:
                        out[y0:ye, x0:xe, plane] = piece[..., 0]
                    else:
                        out[y0:ye, x0:xe, :] = piece
    else:
        for plane in range(n_planes):
            for s in range(strips_per_image):
                idx = plane * strips_per_image + s
                if idx >= len(offsets):
                    continue
                raw = chunk_bytes(idx)
                if raw is None:
                    continue
                y0 = s * rps
                nrows = min(rps, height - y0)
                if compression == 7:
                    arr = _jpeg_chunk_array(raw, jpeg_tables)
                    arr = arr[:nrows, :width]
                elif compression in (2, 3, 4):
                    arr = fax_chunk(raw, nrows, width)
                elif bits == 1:
                    arr = _unpack_bits1(raw, nrows, width)[..., None]
                elif bits == 12:
                    arr = _unpack_bits12(
                        raw, nrows, width * chans_per_chunk).reshape(
                        nrows, width, chans_per_chunk)
                else:
                    row_bytes = width * chans_per_chunk * dt.itemsize
                    if len(raw) < nrows * row_bytes:  # partial strip (#1179)
                        nrows = max(1, len(raw) // row_bytes)
                    arr = _decode_chunk(raw, nrows, width, chans_per_chunk,
                                        dt, predictor)
                nrows = min(nrows, arr.shape[0])
                if planar == 2:
                    out[y0:y0 + nrows, :arr.shape[1], plane] = \
                        arr[:nrows, :, 0]
                else:
                    out[y0:y0 + nrows, :arr.shape[1], :] = arr[:nrows]

    bands = [np.ascontiguousarray(out[:, :, c]) for c in range(spp)]
    return TiffImage(bands, tags)


def write_tiff(bands, geotransform=None, compression="none"):
    """Minimal classic-TIFF writer: little-endian, strip layout, one
    strip per image, uncompressed or Deflate, uint8/int16/uint16/int32/
    uint32/float32/float64 (matching the reader's dtype table), with
    ModelPixelScale/ModelTiepoint for a north-up geotransform.

    ``bands``: one 2-D array or a list of same-shape 2-D arrays
    (written contig/chunky).  Round-trips through :func:`read_tiff`.
    """
    import zlib as _zlib

    if isinstance(bands, np.ndarray) and bands.ndim == 2:
        bands = [bands]
    bands = [np.ascontiguousarray(b) for b in bands]
    h, w = bands[0].shape
    spp = len(bands)
    dt = bands[0].dtype
    kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    interleaved = np.stack(bands, axis=-1).astype(
        dt.newbyteorder("<"), copy=False)
    raw = interleaved.tobytes()
    if compression == "deflate":
        payload = _zlib.compress(raw)
        comp_tag = 8
    elif compression == "jpeg":
        if dt != np.uint8 or spp not in (1, 3):
            raise NotImplementedError(
                "jpeg compression writes uint8 gray/RGB only")
        payload = encode_jpeg(interleaved[:, :, 0] if spp == 1
                              else interleaved, quality=90,
                              subsample="444")
        comp_tag = 7
    elif compression == "none":
        payload = raw
        comp_tag = 1
    else:
        raise NotImplementedError(f"write compression {compression!r}")

    entries = []  # (tag, type, count, value_bytes_or_int)

    def tag_short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))

    def tag_long(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    tag_long(256, w)
    tag_long(257, h)
    if spp > 1:
        entries.append((258, 3, spp,
                        struct.pack(f"<{spp}H", *([bits] * spp))))
    else:
        tag_short(258, bits)
    tag_short(259, comp_tag)
    # JPEG 3-band payloads are stored YCbCr (JFIF convention)
    tag_short(262, (6 if comp_tag == 7 else 2) if spp >= 3 else 1)
    tag_long(273, 0)            # StripOffsets (patched below)
    tag_short(277, spp)
    tag_long(278, h)            # RowsPerStrip: single strip
    tag_long(279, len(payload))
    tag_short(284, 1)           # contig
    if spp > 1:
        entries.append((339, 3, spp,
                        struct.pack(f"<{spp}H", *([kind] * spp))))
    else:
        tag_short(339, kind)
    gt = geotransform
    if gt is not None and gt[2] == 0 and gt[4] == 0:
        entries.append((33550, 12, 3,
                        struct.pack("<3d", gt[1], -gt[5], 0.0)))
        entries.append((33922, 12, 6,
                        struct.pack("<6d", 0, 0, 0, gt[0], gt[3], 0)))

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4  # overflow area starts here
    overflow = bytearray()
    ifd = struct.pack("<H", n)
    for tag, ttype, count, val in entries:
        size = _TYPE_SIZES[ttype] * count
        if size <= 4:
            field = val.ljust(4, b"\0")
        else:
            field = struct.pack("<I", data_off + len(overflow))
            overflow += val
        ifd += struct.pack("<HHI", tag, ttype, count) + field
    ifd += struct.pack("<I", 0)  # next IFD
    strip_off = data_off + len(overflow)
    # patch StripOffsets (tag 273): find its entry position
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += ifd + overflow
    for i, (tag, ttype, count, val) in enumerate(entries):
        if tag == 273:
            pos = 8 + 2 + 12 * i + 8
            out[pos:pos + 4] = struct.pack("<I", strip_off)
    out += payload
    return bytes(out)


def _tile_payloads(bands, bs, compression):
    """Pad-and-cut a band list into bs×bs contig tiles (row-major)."""
    import zlib as _zlib

    h, w = bands[0].shape
    spp = len(bands)
    dt = bands[0].dtype
    tx = -(-w // bs)
    ty = -(-h // bs)
    inter = np.stack(bands, axis=-1).astype(dt.newbyteorder("<"),
                                            copy=False)
    if compression == "jpeg":
        if inter.dtype != np.uint8 or spp not in (1, 3):
            raise NotImplementedError(
                "jpeg tiles are uint8 gray/RGB only")
    tiles = []
    for tyy in range(ty):
        for txx in range(tx):
            sub = inter[tyy * bs:(tyy + 1) * bs, txx * bs:(txx + 1) * bs]
            if compression == "jpeg":
                # edge-replicate padding: zero padding would ring into
                # the valid pixels of lossy edge tiles
                tile = np.pad(sub, ((0, bs - sub.shape[0]),
                                    (0, bs - sub.shape[1]), (0, 0)),
                              mode="edge")
                tiles.append(encode_jpeg(
                    tile[:, :, 0] if spp == 1 else tile,
                    quality=90, subsample="444"))
                continue
            tile = np.zeros((bs, bs, spp), dtype=inter.dtype)
            tile[:sub.shape[0], :sub.shape[1]] = sub
            raw = tile.tobytes()
            if compression == "deflate":
                raw = _zlib.compress(raw)
            tiles.append(raw)
    return tiles


def write_cog(bands, geotransform=None, blocksize=256, compression="none",
              overviews="auto"):
    """Cloud-optimized GeoTIFF writer: TILED layout + internal overview
    IFD chain, single output buffer.

    Layout rules follow the reference's COG driver
    (``frmts/gtiff/cogdriver.cpp``): the full-resolution IFD comes
    first, each overview IFD carries ``NewSubfileType=1``
    (reduced-resolution image), every level is tiled ``blocksize²``,
    and tile data is laid out smallest-overview-first so a range-read
    of the file head fetches the pyramid top (the "ghost" data
    ordering).  Overviews default to NEAREST 2× decimation
    (``src[::2, ::2]`` — reproduces the reference's published
    byte.tif overview checksums 1087/328,
    ``autotest/gcore/libertiff.py:125-131``) down to
    ``min(w, h) <= blocksize``; pass a list of band-lists to supply
    precomputed levels, or ``None`` for no overviews.

    Round-trips through :func:`read_tiff_overviews`.
    """
    if isinstance(bands, np.ndarray) and bands.ndim == 2:
        bands = [bands]
    bands = [np.ascontiguousarray(b) for b in bands]
    if overviews == "auto":
        overviews = []
        cur = bands
        while min(cur[0].shape) > blocksize:
            cur = [b[::2, ::2] for b in cur]
            overviews.append(cur)
    elif overviews is None:
        overviews = []

    levels = [bands] + [[np.ascontiguousarray(b) for b in ov]
                        for ov in overviews]
    comp_tag = {"none": 1, "deflate": 8, "jpeg": 7}[compression]
    spp = len(bands)
    dt = bands[0].dtype
    kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8

    tiles_per_level = [_tile_payloads(lv, blocksize, compression)
                       for lv in levels]

    # --- first pass: compute per-IFD sizes ---------------------------
    def entries_for(li, tile_offsets):
        lv = levels[li]
        h, w = lv[0].shape
        tiles = tiles_per_level[li]
        nt = len(tiles)
        e = []
        if li > 0:
            e.append((254, 4, 1, struct.pack("<I", 1)))  # reduced-res
        e.append((256, 4, 1, struct.pack("<I", w)))
        e.append((257, 4, 1, struct.pack("<I", h)))
        e.append((258, 3, spp, struct.pack(f"<{spp}H", *([bits] * spp))))
        e.append((259, 3, 1, struct.pack("<HH", comp_tag, 0)))
        e.append((262, 3, 1, struct.pack(
            "<HH", ((6 if comp_tag == 7 else 2) if spp >= 3 else 1), 0)))
        e.append((277, 3, 1, struct.pack("<HH", spp, 0)))
        e.append((284, 3, 1, struct.pack("<HH", 1, 0)))
        e.append((322, 4, 1, struct.pack("<I", blocksize)))
        e.append((323, 4, 1, struct.pack("<I", blocksize)))
        e.append((324, 4, nt, struct.pack(f"<{nt}I", *tile_offsets)))
        e.append((325, 4, nt,
                  struct.pack(f"<{nt}I", *[len(t) for t in tiles])))
        e.append((339, 3, spp, struct.pack(f"<{spp}H", *([kind] * spp))))
        gt = geotransform
        if li == 0 and gt is not None and gt[2] == 0 and gt[4] == 0:
            e.append((33550, 12, 3,
                      struct.pack("<3d", gt[1], -gt[5], 0.0)))
            e.append((33922, 12, 6,
                      struct.pack("<6d", 0, 0, 0, gt[0], gt[3], 0)))
        e.sort(key=lambda x: x[0])
        return e

    def ifd_size(entries):
        n = len(entries)
        overflow = sum(_TYPE_SIZES[t] * c for _, t, c, _ in entries
                       if _TYPE_SIZES[t] * c > 4)
        return 2 + 12 * n + 4 + overflow

    dummy = [entries_for(li, [0] * len(tiles_per_level[li]))
             for li in range(len(levels))]
    ifd_offs = []
    pos = 8
    for e in dummy:
        ifd_offs.append(pos)
        pos += ifd_size(e)
    data_start = pos

    # tile data: smallest overview first (COG head-read ordering),
    # full resolution last
    order = list(range(len(levels) - 1, -1, -1))
    tile_offs = {}
    dpos = data_start
    for li in order:
        offs = []
        for t in tiles_per_level[li]:
            offs.append(dpos)
            dpos += len(t)
        tile_offs[li] = offs

    # --- second pass: emit with final offsets ------------------------
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_offs[0]))
    for li in range(len(levels)):
        entries = entries_for(li, tile_offs[li])
        n = len(entries)
        overflow = bytearray()
        ovf_base = ifd_offs[li] + 2 + 12 * n + 4
        ifd = struct.pack("<H", n)
        for tag, ttype, count, val in entries:
            size = _TYPE_SIZES[ttype] * count
            if size <= 4:
                field = val.ljust(4, b"\0")
            else:
                field = struct.pack("<I", ovf_base + len(overflow))
                overflow += val
            ifd += struct.pack("<HHI", tag, ttype, count) + field
        nxt = ifd_offs[li + 1] if li + 1 < len(levels) else 0
        ifd += struct.pack("<I", nxt)
        out += ifd + overflow
    for li in order:
        for t in tiles_per_level[li]:
            out += t
    return bytes(out)


def read_tiff_overviews(buf):
    """All IFDs of a (COG-style) TIFF → list of :class:`TiffImage`
    (index 0 = full resolution, then the overview pyramid).  A corrupt
    overview level truncates the returned list; a corrupt BASE image
    raises (level 0 errors are never swallowed)."""
    try:
        out = [read_tiff(buf, ifd_index=0)]
    except struct.error as e:
        raise ValueError(f"corrupt TIFF: {e}") from e
    i = 1
    while i <= 64:
        try:
            out.append(read_tiff(buf, ifd_index=i))
        except (ValueError, NotImplementedError, KeyError, struct.error,
                zlib.error, IndexError):
            break
        i += 1
    return out
