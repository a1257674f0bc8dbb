"""Esri Compact Cache V2 (ESRIC) / .tpkx tile-package reader, from
scratch.

Mirrors the reference's ESRIC driver
(``frmts/esric/esric_dataset.cpp``) semantics, derived from its
published test matrix (``autotest/gdrivers/esric.py``):

* a cache is ``conf.xml`` (CacheInfo: CacheStorageInfo PacketSize=128,
  TileCacheInfo LODInfos/TileOrigin/TileEnd) + ``_alllayers/L{lod:02d}/
  R{row:04x}C{col:04x}.bundle`` files, or a ``.tpkx`` zip whose
  ``root.json`` carries the same information with bundles under
  ``tile/``,
* a bundle is a 64-byte header + 128×128 little-endian u64 index;
  entry = offset (low 40 bits) | payload size (high 24); size 0 and
  missing bundles read as zeros (``test_esric_3`` expects checksum 0
  at a level with no tiles),
* tiles are PNG or JPEG payloads (sniffed), expanded to the dataset
  band count: grayscale replicates to RGB, RGB gains an opaque alpha,
  color-mapped PNGs expand through their PLTE/tRNS table — matching
  the reference's band-expansion path (L01 band-2 checksums 46857 /
  53503 on the fixtures),
* dataset grid: full resolution is the finest LOD
  (``TileOrigin``→``TileEnd`` at resolutions[0]); each coarser LOD is
  an overview level.
"""

from __future__ import annotations

import json
import math
import os
import struct
import xml.etree.ElementTree as ET
import zipfile

import numpy as np

from .jpeg import decode_jpeg
from .png import decode_png

__all__ = ["read_esric_conf", "read_tpkx", "read_esric_level"]

BSZ = 128


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _text(root, name, default=None):
    for e in root.iter():
        if _local(e.tag) == name and e.text:
            return e.text.strip()
    return default


class _DirFS:
    def __init__(self, base):
        self.base = base

    def read(self, rel):
        p = os.path.join(self.base, rel)
        if not os.path.exists(p):
            return None
        return open(p, "rb").read()


class _ZipFS:
    def __init__(self, path):
        self.z = zipfile.ZipFile(path)
        self.names = set(self.z.namelist())

    def read(self, rel):
        if rel not in self.names:
            return None
        return self.z.read(rel)


def read_esric_conf(conf_xml):
    """conf.xml → cache info dict (tsz, nbands, lods sorted finest
    first, origin, end, fs rooted at ``_alllayers``)."""
    root = ET.parse(conf_xml).getroot()
    fmt = _text(root, "StorageFormat", "")
    if fmt != "esriMapCacheStorageModeCompactV2":
        raise ValueError("not an esri V2 bundled cache")
    if float(_text(root, "PacketSize", "128")) != BSZ:
        raise ValueError("only PacketSize 128 supported")
    tsz = int(float(_text(root, "TileCols", "256")))
    lods = []
    for e in root.iter():
        if _local(e.tag) == "LODInfo":
            lods.append((int(_text(e, "LevelID", "0")),
                         float(_text(e, "Resolution", "0"))))
    lods.sort(key=lambda lr: lr[1])          # finest first
    origin_e = None
    for e in root.iter():
        if _local(e.tag) == "TileOrigin":
            origin_e = e
            break
    ox = float(_text(origin_e, "X", "-180"))
    oy = float(_text(origin_e, "Y", "90"))
    maxx, miny = -ox, -oy
    for e in root.iter():
        if _local(e.tag) == "TileEnd":
            maxx = float(_text(e, "X", str(maxx)))
            miny = float(_text(e, "Y", str(miny)))
    fmt_img = _text(root, "CacheTileFormat", "JPEG")
    nbands = 3 if fmt_img == "JPEG" else 4
    res = lods[0][1]
    width = int((maxx - ox) / res)
    height = int((oy - miny) / res)
    return {"tsz": tsz, "nbands": nbands, "lods": lods,
            "origin": (ox, oy), "end": (maxx, miny),
            "size": (width, height),
            "geotransform": (ox, res, 0.0, oy, 0.0, -res),
            "format": fmt_img, "crs": _text(root, "WKT"),
            "fs": _DirFS(os.path.join(os.path.dirname(conf_xml),
                                      "_alllayers")),
            "bundle_prefix": ""}


def read_tpkx(path, extent_source="TILING_SCHEME"):
    """.tpkx zip → cache info dict; ``extent_source`` mirrors the
    reference's open option (TILING_SCHEME = symmetric world grid,
    FULL_EXTENT/INITIAL_EXTENT = the JSON extents)."""
    fs = _ZipFS(path)
    doc = json.loads(fs.read("root.json"))
    if doc.get("storageInfo", {}).get("storageFormat") != \
            "esriMapCacheStorageModeCompactV2":
        raise ValueError("not an esri V2 bundled cache")
    if doc["storageInfo"].get("packetSize") != BSZ:
        raise ValueError("only PacketSize 128 supported")
    ti = doc["tileInfo"]
    tsz = int(ti.get("cols", 256))
    min_lod = int(doc.get("minLOD", 0))
    max_lod = int(doc.get("maxLOD", 0))
    lods = [(int(l["level"]), float(l["resolution"]))
            for l in ti["lods"]
            if min_lod <= int(l["level"]) <= max_lod]
    lods.sort(key=lambda lr: lr[1])
    ox = float(ti["origin"]["x"])
    oy = float(ti["origin"]["y"])
    res = lods[0][1]
    fmt_img = doc.get("tileImageInfo", {}).get("format", "JPEG")
    nbands = 3 if fmt_img in ("JPEG", "JPG") else 4
    if extent_source == "TILING_SCHEME":
        maxx, miny = -ox, -oy
        gx0, gy0 = ox, oy
        width = int((maxx - ox) / res)
        height = int((oy - miny) / res)
    else:
        key = "initialExtent" if extent_source == "INITIAL_EXTENT" \
            else "fullExtent"
        ext = doc.get(key) or doc["fullExtent"]
        # the reference crops via gdal_translate -projwin: offsets
        # floor(+eps), ends ceil(-eps) on the tiling-scheme grid
        eps = 1e-3
        xoff = math.floor((ext["xmin"] - ox) / res + eps)
        yoff = math.floor((oy - ext["ymax"]) / res + eps)
        xend = math.ceil((ext["xmax"] - ox) / res - eps)
        yend = math.ceil((oy - ext["ymin"]) / res - eps)
        width, height = xend - xoff, yend - yoff
        ox, oy = ox + xoff * res, oy - yoff * res
    sr = doc.get("spatialReference", {})
    epsg = sr.get("latestWkid") or sr.get("wkid")
    prefix = doc.get("tileBundlesPath", "./tile")
    prefix = prefix[2:] if prefix.startswith("./") else prefix
    crop = (0, 0)
    if extent_source != "TILING_SCHEME":
        crop = (xoff, yoff)
    return {"tsz": tsz, "nbands": nbands, "lods": lods,
            "origin": (ox, oy), "size": (width, height),
            "geotransform": (ox, res, 0.0, oy, 0.0, -res),
            "format": fmt_img, "crs": f"EPSG:{epsg}" if epsg else None,
            "fs": fs, "bundle_prefix": prefix + "/", "crop": crop}


def _parse_bundle(raw):
    if raw is None or len(raw) < 64 + BSZ * BSZ * 8:
        return None
    if struct.unpack_from("<I", raw, 60)[0] != BSZ * BSZ * 8:
        return None
    idx = np.frombuffer(raw, dtype="<u8", count=BSZ * BSZ, offset=64)
    return idx


def _decode_tile(payload, tsz, nbands):
    """tile payload → (tsz, tsz, nbands) uint8 (reference band
    expansion: gray→RGB, +opaque alpha, palette→CT expansion)."""
    out = np.full((tsz, tsz, nbands), 255, dtype=np.uint8)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        arr = decode_png(payload)
        pal = _png_palette(payload)
    else:
        arr = decode_jpeg(payload)
        pal = None
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    c = arr.shape[2]
    if pal is not None and c == 1:
        rgba = pal[arr[:, :, 0]]
        out[:h, :w, :] = rgba[:, :, :nbands]
        return out
    if c == 1:
        for b in range(min(3, nbands)):
            out[:h, :w, b] = arr[:, :, 0]
    else:
        out[:h, :w, :min(c, nbands)] = arr[:, :, :min(c, nbands)]
    return out


def _png_palette(buf):
    """PLTE (+tRNS) → (256, 4) uint8 table, or None."""
    off = 8
    plte = trns = None
    while off + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4:off + 8]
        if tag == b"PLTE":
            plte = buf[off + 8:off + 8 + length]
        elif tag == b"tRNS":
            trns = buf[off + 8:off + 8 + length]
        elif tag == b"IHDR":
            if buf[off + 8 + 9] != 3:      # not color-mapped
                return None
        off += 12 + length
    if plte is None:
        return None
    pal = np.zeros((256, 4), dtype=np.uint8)
    n = len(plte) // 3
    pal[:n, :3] = np.frombuffer(plte[:n * 3],
                                dtype=np.uint8).reshape(n, 3)
    pal[:n, 3] = 255
    if trns is not None:
        t = np.frombuffer(trns, dtype=np.uint8)
        pal[:len(t), 3] = t
    return pal


def read_esric_level(info, level_id):
    """One LOD → (nbands, h, w) uint8 mosaic of its bundles."""
    res = dict((lid, r) for lid, r in info["lods"])[level_id]
    base_res = info["lods"][0][1]
    scale = res / base_res
    width = max(1, int(round(info["size"][0] / scale)))
    height = max(1, int(round(info["size"][1] / scale)))
    cx, cy = info.get("crop", (0, 0))        # base-res pixel shift of
    px0 = int(round(cx / scale))             # the dataset origin in the
    py0 = int(round(cy / scale))             # tiling-scheme grid
    tsz, nbands = info["tsz"], info["nbands"]
    tx0, ty0 = px0 // tsz, py0 // tsz
    tx1 = (px0 + width + tsz - 1) // tsz
    ty1 = (py0 + height + tsz - 1) // tsz
    out = np.zeros((height, width, nbands), dtype=np.uint8)
    for by in range((ty0 // BSZ) * BSZ, ty1, BSZ):
        for bx in range((tx0 // BSZ) * BSZ, tx1, BSZ):
            rel = (f"{info['bundle_prefix']}L{level_id:02d}/"
                   f"R{by:04x}C{bx:04x}.bundle")
            raw = info["fs"].read(rel)
            idx = _parse_bundle(raw)
            if idx is None:
                continue
            for ty in range(max(by, ty0), min(by + BSZ, ty1)):
                for tx in range(max(bx, tx0), min(bx + BSZ, tx1)):
                    ent = int(idx[(ty - by) * BSZ + (tx - bx)])
                    offset, size = ent & ((1 << 40) - 1), ent >> 40
                    if size == 0:
                        continue
                    payload = raw[offset:offset + size]
                    if payload[:2] not in (b"\x89P", b"\xff\xd8"):
                        # some writers point past the 4-byte record
                        # size prefix; re-sync on the magic
                        payload = raw[offset - 4:offset - 4 + size]
                        if payload[:2] not in (b"\x89P", b"\xff\xd8"):
                            continue
                    tile = _decode_tile(payload, tsz, nbands)
                    y0, x0 = ty * tsz - py0, tx * tsz - px0
                    ys, xs = max(0, -y0), max(0, -x0)
                    ye = min(y0 + tsz, height)
                    xe = min(x0 + tsz, width)
                    if ye <= max(y0, 0) or xe <= max(x0, 0):
                        continue
                    out[y0 + ys:ye, x0 + xs:xe, :] = \
                        tile[ys:ye - y0, xs:xe - x0, :]
    return np.ascontiguousarray(out.transpose(2, 0, 1))
