"""RasterLite2 (.rl2 SpatiaLite raster coverage) reader, from scratch.

Mirrors the reference's SQLite/RasterLite2 raster surface
(``frmts/sqlite`` + librasterlite2) read semantics, derived from its
published test matrix (``autotest/gdrivers/rl2.py``):

* a coverage is ``raster_coverages`` metadata plus
  ``<cov>_sections`` / ``<cov>_tiles`` / ``<cov>_tile_data`` tables;
  tile placement comes from the SpatiaLite BLOB geometry MBR
  (doubles at offset 6),
* tile payloads split into odd/even-row blobs: a small header
  (start byte, 0xFA/0xDB block marker, endian, compression, sample,
  pixel, band count, tile width/height …) followed by the payload —
  located by its magic (zlib for DEFLATE, SOI for JPEG, PNG
  signature); odd rows 0,2,… and even rows 1,3,… interleave back
  into the tile,
* sections crop their tiles to the declared width/height
  (``byte.rl2``'s 20×20 section in a 512×512 tile reads to the
  published checksum 4672 with gt (440720,60,0,3751320,0,-60)),
* pyramid tiles (section_id NULL) carry coverage-level overviews at
  resolution ``base × 8^level`` (the ``<cov>_levels`` table also
  declares virtual 1:2/1:4/1:8 sub-resolutions that librasterlite2
  renders by decimation at query time — use the engine's own
  overview kernels for those),
* palettes decode from the coverage ``palette`` BLOB (3-byte RGB
  entries; entry 1 of small_world_pct is (176,184,176)),
* sub-byte sample types (1/2/4-BIT) unpack MSB-first.
"""

from __future__ import annotations

import sqlite3
import struct
import zlib

import numpy as np

from .jpeg import decode_jpeg
from .png import decode_png

__all__ = ["read_rl2", "rl2_coverages"]

_DTYPES = {
    "UINT8": np.uint8, "INT8": np.int8, "UINT16": np.uint16,
    "INT16": np.int16, "UINT32": np.uint32, "INT32": np.int32,
    "FLOAT": np.float32, "DOUBLE": np.float64,
    "1-BIT": np.uint8, "2-BIT": np.uint8, "4-BIT": np.uint8,
}


def rl2_coverages(path):
    con = sqlite3.connect(path)
    try:
        return [r[0] for r in con.execute(
            "SELECT coverage_name FROM raster_coverages")]
    finally:
        con.close()


def _geom_mbr(blob):
    """SpatiaLite BLOB geometry → (minx, miny, maxx, maxy)."""
    if blob is None or len(blob) < 43 or blob[0] != 0:
        return None
    return struct.unpack_from("<4d", blob, 6)


def _payload(blob):
    """Locate the compressed payload inside a tile blob by magic."""
    if blob is None:
        return None, None
    for off in range(4, min(len(blob) - 2, 64)):
        b0, b1 = blob[off], blob[off + 1]
        if b0 == 0x78 and b1 in (0x01, 0x9C, 0xDA, 0x5E):
            return "zlib", blob[off:]
        if b0 == 0xFF and b1 == 0xD8:
            return "jpeg", blob[off:]
        if blob[off:off + 8] == b"\x89PNG\r\n\x1a\n":
            return "png", blob[off:]
        if blob[off:off + 4] == b"RIFF":
            return "webp", blob[off:]
    return None, None


def _decode_rows(blob, width, nrows, nbands, dt, bits):
    kind, payload = _payload(blob)
    if kind is None:
        return None
    if kind == "zlib":
        raw = zlib.decompress(payload)
        if bits < 8:
            arr = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
            packed = arr.reshape(-1, bits)
            weights = (1 << np.arange(bits - 1, -1, -1))
            vals = (packed * weights).sum(axis=1).astype(np.uint8)
            vals = vals.reshape(nrows, -1)[:, :width * nbands]
            return vals.reshape(nrows, width, nbands)
        arr = np.frombuffer(raw, dtype=dt,
                            count=nrows * width * nbands)
        arr = arr.reshape(nrows, width, nbands)
        if len(blob) > 3 and blob[3] == 0x22 and \
                np.issubdtype(dt, np.integer):
            # RL2_COMPRESSION_DEFLATE applies a per-row horizontal
            # delta filter (PNG Sub); undo with a wrapping cumsum
            arr = np.cumsum(arr, axis=1,
                            dtype=np.dtype(dt).newbyteorder("=")
                            ).astype(dt)
        return arr
    if kind == "jpeg":
        arr = decode_jpeg(payload)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr[:nrows]
    if kind == "png":
        arr = decode_png(payload)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr[:nrows]
    return None


def _tile_array(odd, even, tw, th, nbands, dt, bits):
    kind, _ = _payload(odd)
    if kind in ("jpeg", "png"):
        # whole tile in the odd blob for image codecs
        return _decode_rows(odd, tw, th, nbands, dt, bits)
    n_odd = (th + 1) // 2
    n_even = th // 2
    rows_odd = _decode_rows(odd, tw, n_odd, nbands, dt, bits)
    out = np.zeros((th, tw, nbands), dtype=dt)
    if rows_odd is not None:
        out[0::2] = rows_odd[:n_odd]
    if even is not None and n_even:
        rows_even = _decode_rows(even, tw, n_even, nbands, dt, bits)
        if rows_even is not None:
            out[1::2] = rows_even[:n_even]
    return out


def read_rl2(path, coverage=None, level=0, section=None):
    """RasterLite2 coverage → dict with ``data`` (bands, h, w),
    ``geotransform``, ``crs``, ``palette`` (or None), ``levels``
    (pyramid levels that have tiles) and ``sections``."""
    con = sqlite3.connect(path)
    try:
        covs = [r for r in con.execute(
            "SELECT coverage_name, sample_type, pixel_type, num_bands,"
            " compression, tile_width, tile_height, horz_resolution,"
            " vert_resolution, srid, palette FROM raster_coverages")]
        if coverage is None:
            row = covs[0]
        else:
            row = next(r for r in covs if r[0] == coverage)
        (name, sample, pixel, nbands, compression, tw, th,
         resx, resy, srid, palette_blob) = row
        dt = _DTYPES.get(sample, np.uint8)
        bits = {"1-BIT": 1, "2-BIT": 2, "4-BIT": 4}.get(sample, 8)

        secs = [dict(zip(("id", "name", "w", "h", "mbr"),
                         (r[0], r[1], r[2], r[3], _geom_mbr(r[4]))))
                for r in con.execute(
                    f"SELECT section_id, section_name, width, height,"
                    f" geometry FROM \"{name}_sections\"")]
        tiles = [dict(zip(("id", "level", "section", "mbr"),
                          (r[0], r[1], r[2], _geom_mbr(r[3]))))
                 for r in con.execute(
                     f"SELECT tile_id, pyramid_level, section_id,"
                     f" geometry FROM \"{name}_tiles\"")]
        levels = sorted({t["level"] for t in tiles})

        if section is not None:
            secs = [s for s in secs if s["id"] == section
                    or s["name"] == section]
            tiles = [t for t in tiles
                     if t["section"] == secs[0]["id"]
                     or t["section"] is None]

        use = [t for t in tiles if t["level"] == level]
        if not use:
            raise ValueError(f"no tiles at pyramid level {level}")

        scale = 8 ** level     # pyramid levels step by 8 (levels table)
        rx, ry = resx * scale, resy * scale
        if section is not None and level == 0:
            minx, miny, maxx, maxy = secs[0]["mbr"]
        else:
            mbrs = [s["mbr"] for s in secs if s["mbr"]]
            minx = min(m[0] for m in mbrs)
            miny = min(m[1] for m in mbrs)
            maxx = max(m[2] for m in mbrs)
            maxy = max(m[3] for m in mbrs)
        width = int(round((maxx - minx) / rx))
        height = int(round((maxy - miny) / ry))

        out = np.zeros((height, width, nbands), dtype=dt)
        for t in use:
            odd, even = con.execute(
                f"SELECT tile_data_odd, tile_data_even FROM"
                f" \"{name}_tile_data\" WHERE tile_id=?",
                (t["id"],)).fetchone()
            arr = _tile_array(odd, even, tw, th, nbands, dt, bits)
            if arr is None or t["mbr"] is None:
                continue
            x0 = int(round((t["mbr"][0] - minx) / rx))
            y0 = int(round((maxy - t["mbr"][3]) / ry))
            ys, xs = max(0, -y0), max(0, -x0)
            ye = min(y0 + arr.shape[0], height)
            xe = min(x0 + arr.shape[1], width)
            if ye <= max(y0, 0) or xe <= max(x0, 0):
                continue
            out[y0 + ys:ye, x0 + xs:xe, :] = \
                arr[ys:ye - y0, xs:xe - x0, :nbands]

        palette = None
        if palette_blob and len(palette_blob) >= 6:
            n = struct.unpack_from("<H", palette_blob, 3)[0]
            n = n if 0 < n <= 256 else 256
            entries = np.frombuffer(
                palette_blob, dtype=np.uint8, count=n * 3,
                offset=6).reshape(n, 3)
            palette = entries.copy()

        gt = (minx, rx, 0.0, maxy, 0.0, -ry)
        return {"data": np.ascontiguousarray(out.transpose(2, 0, 1)),
                "geotransform": gt, "crs": f"EPSG:{srid}",
                "palette": palette, "levels": levels,
                "sections": secs, "coverage": name,
                "dtype": str(np.dtype(dt))}
    finally:
        con.close()
