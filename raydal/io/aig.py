"""Arc/Info Binary Grid (AIG) coverage reader, from scratch.

Reference driver: ``frmts/aigrid/`` (``gridlib.c`` tile codecs,
``aigopen.c`` coverage assembly, ``aigdataset.cpp`` dtype/nodata
mapping).  A coverage is a DIRECTORY:

* ``hdr.adf``    — "GRID1.2" magic; cell type (1=int, 2=float) at
  offset 16, compressed flag (inverted) at 20, cell sizes (MSB
  doubles) at 256/264, blocks-per-row/column at 288/292, block
  width/height at 296/304 (``gridlib.c AIGReadHeader``).
* ``dblbnd.adf`` — LLX LLY URX URY as MSB doubles; pixels/lines =
  ``(UR-LL+0.5*cell)/cell`` (``aigopen.c:98-102``).
* ``sta.adf``    — min/max/mean/stddev MSB doubles, or the 24-byte
  LSB min/max/mean variant (``gridlib.c AIGReadStatistics``).
* ``w001001x.adf`` — block index: magic ``0000270AFFFF``, file length
  in shorts at 24, then (offset, size) MSB u32 pairs in shorts from
  byte 100.
* ``w001001.adf`` — blocks.  Integer compressed blocks carry a magic
  byte + minsize + big-endian min, then per-magic payload: 0x00
  constant, 0x01/0x04/0x08/0x10/0x20 raw 1/4/8/16/32-bit, 0xE0/0xF0/
  0xFC/0xF8 run-length 4/2/1-byte values, 0xDF min-runs, 0xD7/0xCF
  8/16-bit literals, marker>128 nodata runs (``gridlib.c
  AIGProcessBlock``).  Float blocks are raw BE float32.  The 0xFF
  CCITT-RLE type (vendored libtiff, ``aigccitt.c``) is a documented
  NotImplementedError swap point — none of the shipped fixtures use
  it.

Exposure matches ``aigdataset.cpp``: int grids with stats in
[0, 254] → uint8 with nodata 255, in ±32767 → int16 with nodata
-32768, else int32 with nodata -2147483647; float → float32.  A
``.clr`` color table beside or inside the coverage is parsed by
:func:`aig_info`.

Validated against ``autotest/gdrivers/aigrid.py`` (abc3x1 checksum 3,
gt (-0.5, 1, 0, 0.5, 0, -1), nodata 255, uppercase-name coverage,
24-byte sta min/max).
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["read_aig", "aig_info"]

_NO_DATA = -2147483647


def _find(dirpath, name):
    """Case-insensitive file lookup (the reference's AIGLLOpen try
    both cases; ABC3X1UC ships uppercase files)."""
    cand = os.path.join(dirpath, name)
    if os.path.exists(cand):
        return cand
    lower = name.lower()
    for f in os.listdir(dirpath):
        if f.lower() == lower:
            return os.path.join(dirpath, f)
    return None


def _read_msb_doubles(path, n):
    with open(path, "rb") as f:
        raw = f.read(8 * n)
    if len(raw) < 8 * n:
        raise ValueError(f"short read in {os.path.basename(path)}")
    return struct.unpack(">%dd" % n, raw)


def _decode_block(raw, cell_type, compressed, bw, bh):
    """One block payload (without the leading 2-byte size) →
    (bh, bw) int32 (int grids, nodata = _NO_DATA) or float32."""
    npix = bw * bh
    if cell_type == 2:                       # float: raw BE f32
        a = np.frombuffer(raw[:npix * 4], ">f4")
        if len(a) < npix:
            raise ValueError("AIG float block too small")
        return a.reshape(bh, bw).astype(np.float32)
    if not compressed:                       # int uncompressed: BE i32
        a = np.frombuffer(raw[:npix * 4], ">i4")
        if len(a) < npix:
            raise ValueError("AIG int block too small")
        return a.reshape(bh, bw).astype(np.int32)
    if len(raw) < 2:
        raise ValueError("AIG block header truncated")
    magic, minsize = raw[0], raw[1]
    pos = 2
    if minsize > 4:
        raise ValueError(f"corrupt AIG minsize {minsize}")
    if minsize == 4:
        nmin = struct.unpack(">i", raw[pos:pos + 4])[0]
    else:
        nmin = 0
        for i in range(minsize):
            nmin = nmin * 256 + raw[pos + i]
        if minsize and raw[2] > 127:         # sign extension quirk
            nmin -= 1 << (8 * minsize)
    pos += minsize
    data = raw[pos:]

    def roll(v):
        # AIG assumes unsigned rollover on signed adds
        return ((np.asarray(v, np.int64) + nmin) &
                0xFFFFFFFF).astype(np.uint32).astype(np.int64) \
            .astype(np.int32, casting="unsafe")

    out = np.full(npix, _NO_DATA, np.int32)
    if magic == 0x00:                        # constant
        out[:] = nmin
    elif magic == 0x08:                      # raw 8-bit
        out[:] = roll(np.frombuffer(data[:npix], np.uint8))
    elif magic == 0x04:                      # raw 4-bit, high first
        nb = (npix + 1) // 2
        b = np.frombuffer(data[:nb], np.uint8)
        pairs = np.empty(nb * 2, np.uint8)
        pairs[0::2] = b >> 4
        pairs[1::2] = b & 0xF
        out[:] = roll(pairs[:npix])
    elif magic == 0x01:                      # raw 1-bit, MSB first
        nb = (npix + 7) // 8
        bits = np.unpackbits(np.frombuffer(data[:nb], np.uint8))
        out[:] = roll(bits[:npix])
    elif magic == 0x10:                      # raw 16-bit BE
        out[:] = roll(np.frombuffer(data[:npix * 2], ">u2"))
    elif magic == 0x20:                      # raw 32-bit BE
        out[:] = roll(np.frombuffer(data[:npix * 4], ">i4"))
    elif magic == 0xFF:
        raise NotImplementedError(
            "AIG CCITT-RLE (0xFF) tile — documented swap point "
            "(reference vendors libtiff's G3 engine, aigccitt.c)")
    elif magic in (0xE0, 0xF0, 0xFC, 0xF8, 0xDF, 0xD7, 0xCF):
        i = 0
        npx = 0
        n = len(data)
        while npx < npix and i < n:
            marker = data[i]
            i += 1
            if magic == 0xE0:
                val = roll(struct.unpack(">i", data[i:i + 4])[0])
                i += 4
                out[npx:npx + marker] = val
                npx += marker
            elif magic == 0xF0:
                val = roll(data[i] * 256 + data[i + 1])
                i += 2
                out[npx:npx + marker] = val
                npx += marker
            elif magic in (0xFC, 0xF8):
                val = roll(data[i])
                i += 1
                out[npx:npx + marker] = val
                npx += marker
            elif magic == 0xDF and marker < 128:
                out[npx:npx + marker] = nmin
                npx += marker
            elif magic == 0xD7 and marker < 128:
                out[npx:npx + marker] = roll(
                    np.frombuffer(data[i:i + marker], np.uint8))
                i += marker
                npx += marker
            elif magic == 0xCF and marker < 128:
                out[npx:npx + marker] = roll(
                    np.frombuffer(data[i:i + 2 * marker], ">u2"))
                i += 2 * marker
                npx += marker
            elif marker > 128:               # nodata run
                out[npx:npx + 256 - marker] = _NO_DATA
                npx += 256 - marker
            else:
                raise ValueError(
                    f"bad AIG run marker {marker} for magic "
                    f"{magic:#x}")
        if npx < npix:
            raise ValueError("AIG block ran out of data")
    else:
        raise ValueError(f"unsupported AIG tile magic {magic:#x}")
    return out.reshape(bh, bw)


def aig_info(cover):
    """Coverage directory → header dict (cell_type, compressed,
    block/tile geometry, bounds, stats, geotransform, color table)."""
    cover = str(cover)
    if os.path.isfile(cover):                # hdr.adf etc. inside
        cover = os.path.dirname(cover)
    hdr_p = _find(cover, "hdr.adf")
    if hdr_p is None:
        raise FileNotFoundError(f"no hdr.adf under {cover}")
    with open(hdr_p, "rb") as f:
        hdr = f.read(308)
    if len(hdr) < 308 or hdr[:8] not in (b"GRID1.2\0", b"GRID1.2 "):
        raise ValueError("not an Arc/Info Binary Grid hdr.adf")
    cell_type = struct.unpack(">i", hdr[16:20])[0]
    compressed = not struct.unpack(">i", hdr[20:24])[0]
    cx, cy = struct.unpack(">2d", hdr[256:272])
    bpr, bpc = struct.unpack(">2i", hdr[288:296])
    bxs = struct.unpack(">i", hdr[296:300])[0]
    bys = struct.unpack(">i", hdr[304:308])[0]
    if cx <= 0 or cy <= 0 or bxs <= 0 or bys <= 0:
        raise ValueError("illegal AIG cell/block sizes")
    llx, lly, urx, ury = _read_msb_doubles(
        _find(cover, "dblbnd.adf"), 4)
    pixels = int((urx - llx + 0.5 * cx) / cx)
    lines = int((ury - lly + 0.5 * cy) / cy)
    sta_p = _find(cover, "sta.adf")
    dmin = dmax = 0.0
    if sta_p:
        with open(sta_p, "rb") as f:
            sraw = f.read(32)
        if len(sraw) == 32:
            dmin, dmax = struct.unpack(">2d", sraw[:16])
        elif len(sraw) >= 24:                # LSB 24-byte variant
            dmin, dmax = struct.unpack("<2d", sraw[:16])
        else:
            raise ValueError("wrong sta.adf content")
    # color table: <cover>.clr inside, or sibling of the directory
    clr = None
    base = os.path.basename(os.path.abspath(cover))
    for cand in ([_find(cover, base + ".clr")] +
                 [os.path.join(os.path.dirname(os.path.abspath(cover)),
                               base + ext) for ext in (".clr", ".CLR")]):
        if cand and os.path.exists(cand):
            clr = {}
            for line in open(cand, encoding="latin-1"):
                parts = line.split()
                if len(parts) >= 4 and not line.startswith("#"):
                    try:
                        clr[int(float(parts[0]))] = tuple(
                            int(float(v)) for v in parts[1:4])
                    except ValueError:
                        continue
            break
    return {
        "cover": cover, "cell_type": cell_type,
        "compressed": compressed,
        "block_x": bxs, "block_y": bys,
        "blocks_per_row": bpr, "blocks_per_column": bpc,
        "cell_size": (cx, cy),
        "bounds": (llx, lly, urx, ury),
        "pixels": pixels, "lines": lines,
        "min": dmin, "max": dmax,
        "geotransform": (llx, cx, 0.0, ury, 0.0, -cy),
        "color_table": clr,
    }


def _tile_basename(tx, ty):
    if ty == 0:
        return f"w{tx + 1:03d}001"
    if ty == 1:
        return f"w{tx + 1:03d}000"
    return f"z{tx + 1:03d}{ty - 1:03d}"


def read_aig(cover):
    """Coverage directory → ``(array [1, h, w], geotransform,
    nodata)`` with the reference's dtype/nodata narrowing."""
    info = aig_info(cover)
    cover = info["cover"]
    bxs, bys = info["block_x"], info["block_y"]
    bpr, bpc = info["blocks_per_row"], info["blocks_per_column"]
    w, h = info["pixels"], info["lines"]
    tile_w, tile_h = bxs * bpr, bys * bpc
    tiles_x = (w - 1) // tile_w + 1
    tiles_y = (h - 1) // tile_h + 1
    is_float = info["cell_type"] == 2
    full = np.full((h, w),
                   np.float32(-3.4028234663852886e38) if is_float
                   else _NO_DATA,
                   np.float32 if is_float else np.int32)
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            base = _tile_basename(tx, ty)
            idx_p = _find(cover, base + "x.adf")
            dat_p = _find(cover, base + ".adf")
            if idx_p is None or dat_p is None:
                continue                     # absent tile = all nodata
            with open(idx_p, "rb") as f:
                idx_raw = f.read()
            if idx_raw[:6] != b"\x00\x00\x27\x0a\xff\xff":
                raise ValueError(f"corrupt AIG index magic in {base}")
            nshorts = struct.unpack(">I", idx_raw[24:28])[0]
            nblocks = (nshorts * 2 - 100) // 8
            pairs = np.frombuffer(
                idx_raw[100:100 + nblocks * 8], ">u4").reshape(-1, 2)
            with open(dat_p, "rb") as f:
                dat = f.read()
            for bi in range(min(nblocks, bpr * bpc)):
                off = int(pairs[bi, 0]) * 2
                size = int(pairs[bi, 1]) * 2
                bx, by = bi % bpr, bi // bpr
                x0 = tx * tile_w + bx * bxs
                y0 = ty * tile_h + by * bys
                if x0 >= w or y0 >= h:
                    continue
                if size == 0:
                    continue                 # stays nodata
                stored = struct.unpack(">H", dat[off:off + 2])[0] * 2
                if stored != size:
                    raise ValueError(
                        f"corrupt AIG block {bi}: size {stored} != "
                        f"index {size}")
                block = _decode_block(dat[off + 2:off + 2 + size],
                                      info["cell_type"],
                                      info["compressed"], bxs, bys)
                bw_c = min(bxs, w - x0)
                bh_c = min(bys, h - y0)
                full[y0:y0 + bh_c, x0:x0 + bw_c] = \
                    block[:bh_c, :bw_c]
    if is_float:
        return full[None], info["geotransform"], float(
            np.float32(-3.4028234663852886e38))
    # aigdataset.cpp narrowing by the sta.adf range
    if info["min"] >= 0.0 and info["max"] <= 254.0:
        out = np.where(full == _NO_DATA, 255, full).astype(np.uint8)
        return out[None], info["geotransform"], 255.0
    if info["min"] >= -32767 and info["max"] <= 32767:
        out = np.where(full == _NO_DATA, -32768, full).astype(np.int16)
        return out[None], info["geotransform"], -32768.0
    return full[None], info["geotransform"], float(_NO_DATA)
