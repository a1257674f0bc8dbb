"""PCIDSK (.pix) database file reader, from scratch.

Reference driver: ``frmts/pcidsk/`` over the vendored PCIDSK SDK
(header parse ``sdk/core/cpcidskfile.cpp:505-745``, band channel
layout ``sdk/channel/cbandinterleavedchannel.cpp:55-66``, GEO
segment ``sdk/segment/cpcidskgeoref.cpp:85-150``).

Layout (all ASCII headers on 512-byte blocks, 1-based block
numbers):

* file header (512 B): magic ``PCIDSK``; image-header start block at
  336:16, image-data start block at 304:16, interleaving at 360:8
  (``BAND``/``PIXEL``/``FILE``), channel count 376:8, width 384:8,
  height 392:8, per-type channel counts at 464+ (blank = all 8U),
  segment-pointer start 440:16 and block count 456:8.
* channel image headers: 1024 B each from the ih start block; pixel
  type name at 160:8 (``8U 16S 16U 32R …``); FILE interleaving reads
  start byte 168:16, pixel offset 184:8, line offset 192:8.
* segment pointers: 32 B each — flag ``A|L``, type int at 1:3, name
  4:8, start block 12:11, size 23:9.  The GEO segment (type 150)
  data (after its own 1024 B header) is ``POLYNOMIAL`` or
  ``PROJECTION`` text with the affine transform as 26-char doubles
  (offsets 212/1642 resp. 1980/2526).

Tiled channels (``FILE`` interleaving with a ``/SIS=n`` link) read
through the block-map machinery: the v1 ASCII ``SysBMDir`` directory
(``sdk/blockdir/asciitiledir.cpp`` — 28-char block infos, 24-char
layer infos, SUBVERSION-1 partial layout with binary TileLayerInfo
structs) and the v2 binary ``TileDir``
(``sdk/blockdir/binarytiledir.cpp`` — packed BlockLayerInfo/
TileLayerInfo/BlockInfo).  A layer is a virtual file of fixed-size
blocks scattered over SysBData/TileData segments; tiles are NONE or
RLE compressed (``ctiledchannel.cpp RLEDecompressBlock``), sparse
tiles read as zeros.

Validated against ``autotest/gdrivers/pcidsk.py`` (utm.pix band 1
checksum 39576; tile_v1.1.pix / tile_v2.pix checksum 49526).
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["read_pcidsk", "pcidsk_info"]

_DTYPES = {
    "8U": "u1", "16S": "<i2", "16U": "<u2", "32R": "<f4",
    "32S": "<i4", "32U": "<u4", "64S": "<i8", "64U": "<u8",
    "64R": "<f8", "C16U": None, "C16S": None, "C32R": "<c8",
}
_TYPE_SIZE = {"8U": 1, "16S": 2, "16U": 2, "32R": 4, "32S": 4,
              "32U": 4, "64S": 8, "64U": 8, "64R": 8, "C16U": 4,
              "C16S": 4, "C32R": 8}


def _txt(buf, off, n):
    return buf[off:off + n].decode("ascii", "replace")


def _atoi(buf, off, n, default=0):
    s = _txt(buf, off, n).strip()
    return int(s) if s else default


def pcidsk_info(path):
    """File header + channel table + segment list → dict."""
    with open(path, "rb") as f:
        fh = f.read(512)
        if fh[:6] != b"PCIDSK":
            raise ValueError("not a PCIDSK file")
        width = _atoi(fh, 384, 8)
        height = _atoi(fh, 392, 8)
        nchan = _atoi(fh, 376, 8)
        interleaving = _txt(fh, 360, 8).strip()
        ih_start = _atoi(fh, 336, 16)
        img_start = _atoi(fh, 304, 16)
        seg_start = _atoi(fh, 440, 16)
        seg_blocks = _atoi(fh, 456, 8)
        # per-type channel counts (blank = all 8U)
        if _txt(fh, 464, 4) == "    ":
            counts = {"8U": nchan}
        else:
            counts = {
                "8U": _atoi(fh, 464, 4), "16S": _atoi(fh, 468, 4),
                "16U": _atoi(fh, 472, 4), "32R": _atoi(fh, 476, 4),
                "C16U": _atoi(fh, 480, 4), "C16S": _atoi(fh, 484, 4),
                "C32R": _atoi(fh, 488, 4),
            }
            for name, off in (("32S", 492), ("32U", 494),
                              ("64S", 496), ("64U", 498),
                              ("64R", 500), ("C32S", 502),
                              ("C32U", 504)):
                v = struct.unpack(">h", fh[off:off + 2])[0]
                counts[name] = 0 if v == 0x2020 else max(0, v)
        # channel image headers
        channels = []
        for c in range(nchan):
            f.seek((ih_start - 1) * 512 + c * 1024)
            ih = f.read(1024)
            ptype = _txt(ih, 160, 8).strip()
            if not ptype:
                # old-style: derive from counts in declaration order
                order = ["8U", "16S", "16U", "32R"]
                acc = 0
                for t in order:
                    acc += counts.get(t, 0)
                    if c < acc:
                        ptype = t
                        break
                else:
                    ptype = "32R"
            channels.append({
                "type": ptype,
                "filename": _txt(ih, 64, 64).strip(),
                "start_byte": _atoi(ih, 168, 16),
                "pixel_offset": _atoi(ih, 184, 8),
                "line_offset": _atoi(ih, 192, 8),
            })
        # segment pointers
        segments = []
        if seg_start > 0 and seg_blocks > 0:
            f.seek((seg_start - 1) * 512)
            sp = f.read(seg_blocks * 512)
            for i in range(len(sp) // 32):
                p = sp[i * 32:(i + 1) * 32]
                if p[:1] not in (b"A", b"L"):
                    continue
                segments.append({
                    "index": i + 1,
                    "type": _atoi(p, 1, 3),
                    "name": _txt(p, 4, 8).strip(),
                    "start": _atoi(p, 12, 11),
                    "blocks": _atoi(p, 23, 9),
                })
    return {"width": width, "height": height, "channels": channels,
            "interleaving": interleaving, "img_start": img_start,
            "segments": segments}


def _geo_transform(path, segments):
    """GEO segment (type 150) → geotransform tuple | None."""
    geo = next((s for s in segments if s["type"] == 150), None)
    if geo is None:
        return None
    with open(path, "rb") as f:
        f.seek((geo["start"] - 1) * 512 + 1024)  # skip segment header
        data = f.read(max(0, geo["blocks"] * 512 - 1024))

    def gd(off):
        # PCIDSK writes Fortran-style "D" exponents
        return float(data[off:off + 26].split()[0]
                     .replace(b"D", b"E").replace(b"d", b"e"))
    if data.startswith(b"POLYNOMIAL"):
        a1, a2, xrot = (gd(212 + 26 * i) for i in range(3))
        b1, yrot, b3 = (gd(1642 + 26 * i) for i in range(3))
    elif data.startswith(b"PROJECTION"):
        a1, a2, xrot = (gd(1980 + 26 * i) for i in range(3))
        b1, yrot, b3 = (gd(2526 + 26 * i) for i in range(3))
    else:
        return None
    return (a1, a2, xrot, b1, yrot, b3)


def _rle_decode(src, out_size, pixel_size):
    """PCIDSK tile RLE (ctiledchannel.cpp RLEDecompressBlock):
    marker > 127 → repeat one pixel (marker-128)×, else literal run
    of marker pixels."""
    out = bytearray()
    i, n = 0, len(src)
    while i + 1 + pixel_size <= n and len(out) < out_size:
        marker = src[i]
        i += 1
        if marker > 127:
            out += bytes(src[i:i + pixel_size]) * (marker - 128)
            i += pixel_size
        else:
            take = marker * pixel_size
            out += src[i:i + take]
            i += take
    if len(out) != out_size:
        raise ValueError("corrupt PCIDSK RLE tile")
    return bytes(out)


class _TileDir:
    """The SysBMDir (v1 ASCII) / TileDir (v2 binary) block map."""

    def __init__(self, path, segments):
        self.path = path
        self.seg_base = {s["index"]: (s["start"] - 1) * 512 + 1024
                         for s in segments}
        dseg = next((s for s in segments
                     if s["name"] in ("SysBMDir", "TileDir")), None)
        if dseg is None:
            raise ValueError("PCIDSK tiled channel without a "
                             "SysBMDir/TileDir segment")
        self.binary = dseg["name"] == "TileDir"
        with open(path, "rb") as f:
            f.seek(self.seg_base[dseg["index"]])
            hdr = f.read(512)
            if not hdr.startswith(b"VERSION"):
                raise ValueError("corrupt PCIDSK tile directory")
            if self.binary:
                nlayers, self.block_size = struct.unpack(
                    "<II", hdr[10:18])
                fixed = f.read(nlayers * 18 + nlayers * 38 + 18)
                self.layers = []
                for i in range(nlayers):
                    t, sb, bc, sz = struct.unpack(
                        "<HIIQ", fixed[i * 18:i * 18 + 18])
                    self.layers.append(
                        {"type": t, "start": sb, "count": bc,
                         "size": sz})
                toff = nlayers * 18
                self.tile_info = []
                for i in range(nlayers):
                    x, y, tx, ty, dt, comp, _nv, _nd = struct.unpack(
                        "<IIII4s8sHd",
                        fixed[toff + i * 38:toff + i * 38 + 38])
                    self.tile_info.append(
                        {"x": x, "y": y, "tx": tx, "ty": ty,
                         "dtype": dt.decode().strip(),
                         "compress": comp.decode().strip()})
                self.blocks_off = (512 + nlayers * 18
                                   + nlayers * 38 + 18)
                f.seek(self.seg_base[dseg["index"]] + self.blocks_off)
                maxb = max((ly["start"] + ly["count"]
                            for ly in self.layers), default=0)
                raw = f.read(maxb * 6)
                self.block_table = [
                    struct.unpack("<HI", raw[i * 6:i * 6 + 6])
                    for i in range(maxb)]
            else:
                self.block_size = 8192
                nlayers = int(hdr[10:18])
                nblocks = int(hdr[18:26])
                first_free = int(hdr[26:34].split(b"\0")[0])
                partial = hdr[128:140] == b"SUBVERSION 1"
                f.seek(self.seg_base[dseg["index"]] + 512)
                raw = f.read(nblocks * 28 + nlayers * 24
                             + (nlayers * 38 if partial else 0))
                self.block_table = []
                for i in range(nblocks):
                    e = raw[i * 28:i * 28 + 28]
                    self.block_table.append(
                        (int(e[0:4]), int(e[4:12])))
                loff = nblocks * 28
                self.layers = []
                for i in range(nlayers):
                    e = raw[loff + i * 24:loff + i * 24 + 24]
                    self.layers.append({
                        "type": int(e[0:4]),
                        "start": int(e[4:12]),
                        "size": int(e[12:24]), "count": 0})
                if partial:
                    toff = loff + nlayers * 24
                    self.tile_info = []
                    for i in range(nlayers):
                        x, y, tx, ty, dt, comp, _nv, _nd = \
                            struct.unpack(
                                "<IIII4s8sHd",
                                raw[toff + i * 38:toff + i * 38 + 38])
                        self.tile_info.append(
                            {"x": x, "y": y, "tx": tx, "ty": ty,
                             "dtype": dt.decode().strip(),
                             "compress": comp.decode().strip()})
                    # block counts from consecutive layer starts
                    live = [ly for ly in self.layers
                            if ly["start"] != -1]
                    bound = first_free if first_free != -1 else nblocks
                    for a, b in zip(live, live[1:] + [None]):
                        nxt = b["start"] if b is not None else bound
                        a["count"] = nxt - a["start"]
                else:
                    self.tile_info = [None] * nlayers
                    # full dir: block chains via the next pointers
                    nxts = [int(raw[i * 28 + 20:i * 28 + 28])
                            for i in range(nblocks)]
                    self._chains = nxts
                    for ly in self.layers:
                        cnt, b = 0, ly["start"]
                        while b != -1 and cnt <= nblocks:
                            cnt += 1
                            b = nxts[b]
                        ly["count"] = cnt

    def layer_blocks(self, idx):
        ly = self.layers[idx]
        if getattr(self, "_chains", None) is not None:
            out, b = [], ly["start"]
            while b != -1 and len(out) <= len(self.block_table):
                out.append(self.block_table[b])
                b = self._chains[b]
            return out
        return self.block_table[ly["start"]:ly["start"] + ly["count"]]

    def read_layer(self, f, idx, offset, size):
        """Read bytes from a layer's virtual block file."""
        blocks = self.layer_blocks(idx)
        bs = self.block_size
        out = bytearray()
        while size > 0:
            bi, rem = divmod(offset, bs)
            take = min(bs - rem, size)
            seg, start = blocks[bi]
            f.seek(self.seg_base[seg] + start * bs + rem)
            out += f.read(take)
            offset += take
            size -= take
        return bytes(out)

    def tile_header(self, f, idx):
        info = self.tile_info[idx]
        if info is None:                   # v1 full dir: in-layer hdr
            h = self.read_layer(f, idx, 0, 128)
            info = {"x": int(h[0:8]), "y": int(h[8:16]),
                    "tx": int(h[16:24]), "ty": int(h[24:32]),
                    "dtype": h[32:36].decode().strip(),
                    "compress": h[54:62].decode().strip()}
        return info

    def tile_list(self, f, idx, ntiles):
        if self.binary:
            raw = self.read_layer(f, idx, 0, ntiles * 12)
            return [struct.unpack("<qI", raw[i * 12:i * 12 + 12])
                    for i in range(ntiles)]
        raw = self.read_layer(f, idx, 128, ntiles * 20)
        offs = [int(raw[i * 12:i * 12 + 12]) for i in range(ntiles)]
        szs = [int(raw[ntiles * 12 + i * 8:ntiles * 12 + i * 8 + 8])
               for i in range(ntiles)]
        return list(zip(offs, szs))


def _read_tiled_channel(path, info, layer_idx):
    td = _TileDir(path, info["segments"])
    with open(path, "rb") as f:
        th = td.tile_header(f, layer_idx)
        dt = np.dtype(_DTYPES[th["dtype"]])
        x, y, tx, ty = th["x"], th["y"], th["tx"], th["ty"]
        tpr = (x + tx - 1) // tx
        tpc = (y + ty - 1) // ty
        tiles = td.tile_list(f, layer_idx, tpr * tpc)
        tile_bytes = tx * ty * dt.itemsize
        out = np.zeros((tpc * ty, tpr * tx), dt)
        for ti, (off, size) in enumerate(tiles):
            row, col = divmod(ti, tpr)
            if off == -1 or size == 0:     # sparse tile → zeros
                continue
            raw = td.read_layer(f, layer_idx, off, size)
            comp = th["compress"] or "NONE"
            if comp == "NONE":
                if size != tile_bytes:
                    raise ValueError("corrupt PCIDSK NONE tile size")
            elif comp == "RLE":
                raw = _rle_decode(raw, tile_bytes, dt.itemsize)
            else:
                raise NotImplementedError(
                    f"PCIDSK tile compression {comp!r} (JPEG swap "
                    "point)")
            out[row * ty:(row + 1) * ty,
                col * tx:(col + 1) * tx] = np.frombuffer(
                raw, dt, count=tx * ty).reshape(ty, tx)
    return out[:y, :x].astype(dt.newbyteorder("="))


def read_pcidsk(path):
    """PCIDSK → ``(array [bands, h, w], geotransform | None, None)``.
    BAND / PIXEL / FILE interleaving incl. tiled ``/SIS=n`` channels;
    complex 32R channels surface as complex64."""
    info = pcidsk_info(path)
    w, h = info["width"], info["height"]
    inter = info["interleaving"]
    img_off = (info["img_start"] - 1) * 512
    bands = []
    with open(path, "rb") as f:
        if inter == "PIXEL":
            group = sum(_TYPE_SIZE[c["type"]]
                        for c in info["channels"])
            line_bytes = group * w
            if line_bytes % 512:
                line_bytes += 512 - line_bytes % 512
            f.seek(img_off)
            raw = f.read(line_bytes * h)
            rows = np.frombuffer(raw, np.uint8,
                                 count=line_bytes * h).reshape(
                h, line_bytes)
            coff = 0
            for c in info["channels"]:
                size = _TYPE_SIZE[c["type"]]
                dt = _DTYPES.get(c["type"])
                if dt is None:
                    raise NotImplementedError(
                        f"PCIDSK pixel type {c['type']}")
                chan = rows[:, :group * w].reshape(h, w, group)[
                    :, :, coff:coff + size]
                bands.append(np.ascontiguousarray(chan).reshape(
                    h, w * size).view(np.dtype(dt)).reshape(h, w)
                    .astype(np.dtype(dt).newbyteorder("=")))
                coff += size
        else:
            running = img_off
            for c in info["channels"]:
                dt_name = c["type"]
                dt = _DTYPES.get(dt_name)
                if dt is None:
                    raise NotImplementedError(
                        f"PCIDSK pixel type {dt_name}")
                size = _TYPE_SIZE[dt_name]
                fn = c["filename"]
                if fn.startswith("/SIS="):
                    bands.append(_read_tiled_channel(
                        path, info, int(fn[5:] or "0")))
                    continue
                if inter == "FILE" and fn and fn != "<uninitialized>":
                    src = os.path.join(os.path.dirname(
                        os.path.abspath(path)), fn)
                    start = c["start_byte"]
                    poff = c["pixel_offset"] or size
                    loff = c["line_offset"] or size * w
                    fsrc = open(src, "rb")
                else:
                    fsrc = f
                    if inter == "FILE":
                        start = c["start_byte"]
                        poff = c["pixel_offset"] or size
                        loff = c["line_offset"] or size * w
                    else:
                        start, poff, loff = running, size, size * w
                        running += size * w * h
                fsrc.seek(start)
                raw = fsrc.read(loff * h)
                if fsrc is not f:
                    fsrc.close()
                if poff == size and loff == size * w:
                    a = np.frombuffer(raw, np.dtype(dt),
                                      count=w * h).reshape(h, w)
                else:
                    rows = np.frombuffer(
                        raw, np.uint8,
                        count=loff * h).reshape(h, loff)
                    stride = rows[:, :poff * w].reshape(h, w, poff)
                    a = np.ascontiguousarray(
                        stride[:, :, :size]).reshape(
                        h, w * size).view(np.dtype(dt)).reshape(h, w)
                bands.append(a.astype(
                    np.dtype(dt).newbyteorder("=")))
    gt = _geo_transform(path, info["segments"])
    return np.stack(bands), gt, None
