"""PMTiles v3 single-file tile archive, from scratch.

Reference driver: ``ogr/ogrsf_frmts/pmtiles/`` (header/dir layout per
the public PMTiles v3 spec bundled at
``ogr/ogrsf_frmts/pmtiles/pmtiles/pmtiles.hpp``); read semantics
validated against ``autotest/ogr/ogr_pmtiles.py`` (poly.pmtiles
feature/extent/field expectations, run-length entries, leaf
directories).

Layout: 127-byte header (magic ``PMTiles`` + version 3, eight u64
section offsets/lengths, entry counts, compression/type bytes, e7
bounds) → gzip'd varint root directory → gzip'd JSON metadata →
optional leaf directories → tile data.  Tile ids order the zoom
pyramid by cumulative base ``(4^z - 1)/3`` plus the Hilbert index of
(x, y) on the 2^z grid; directory entries are delta-coded tile ids
with run lengths, lengths, and 0-means-contiguous offsets.
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
import struct

import numpy as np

from ..geo import wkb as _W
from .mvt import encode_mvt, mvt_layer_tables
from .osmpbf import _enc_uvarint, _uvarint

__all__ = ["PMTilesReader", "read_pmtiles", "write_pmtiles",
           "tileid_to_zxy", "zxy_to_tileid"]

_E = 20037508.342789244
_MAGIC = b"PMTiles"


# ------------------------------------------------------------ tile ids

def _hilbert_d2xy(z, d):
    n = 1 << z
    x = y = 0
    t = int(d)
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _hilbert_xy2d(z, x, y):
    n = 1 << z
    d = 0
    s = n // 2
    x, y = int(x), int(y)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _zoom_base(z):
    return ((1 << (2 * z)) - 1) // 3


def tileid_to_zxy(tid):
    z = 0
    while tid >= _zoom_base(z + 1):
        z += 1
    x, y = _hilbert_d2xy(z, tid - _zoom_base(z))
    return z, x, y


def zxy_to_tileid(z, x, y):
    return _zoom_base(z) + _hilbert_xy2d(z, x, y)


# ----------------------------------------------------------- directory

def _decode_dir(buf):
    """Varint directory → list of (tile_id, offset, length,
    run_length)."""
    pos = 0
    n, pos = _uvarint(buf, pos)
    tids, runs, lens, offs = [], [], [], []
    t = 0
    for _ in range(n):
        d, pos = _uvarint(buf, pos)
        t += d
        tids.append(t)
    for _ in range(n):
        r, pos = _uvarint(buf, pos)
        runs.append(r)
    for _ in range(n):
        ln, pos = _uvarint(buf, pos)
        lens.append(ln)
    for i in range(n):
        o, pos = _uvarint(buf, pos)
        if o == 0 and i > 0:
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(o - 1)
    return list(zip(tids, offs, lens, runs))


def _encode_dir(entries):
    out = bytearray(_enc_uvarint(len(entries)))
    last = 0
    for tid, _, _, _ in entries:
        out += _enc_uvarint(tid - last)
        last = tid
    for _, _, _, run in entries:
        out += _enc_uvarint(run)
    for _, _, ln, _ in entries:
        out += _enc_uvarint(ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out += _enc_uvarint(0)
        else:
            out += _enc_uvarint(off + 1)
    return bytes(out)


def _decompress(buf, method):
    if method == 0:                      # unknown: sniff gzip magic
        if len(buf) >= 2 and buf[0] == 0x1F and buf[1] == 0x8B:
            return _gzip.decompress(buf)
        return bytes(buf)
    if method == 1:
        return bytes(buf)
    if method == 2:
        return _gzip.decompress(buf)
    raise NotImplementedError(f"pmtiles compression {method} "
                              "(brotli/zstd swap point)")


class PMTilesReader:
    """Seek-based reader: ``__init__`` reads ONLY the 127-byte header
    and the root directory, so a driver enumerating tiles of a
    100-TB archive never pulls tile bytes; workers pread exactly
    their own tile ranges."""

    def __init__(self, path):
        self.path = str(path)
        with open(self.path, "rb") as f:
            b = f.read(127)
        if b[:7] != _MAGIC or b[7] != 3:
            raise ValueError("not a PMTiles v3 file")
        (self.root_off, self.root_len, self.meta_off, self.meta_len,
         self.leaf_off, self.leaf_len, self.data_off,
         self.data_len) = struct.unpack("<8Q", b[8:72])
        (self.n_addressed, self.n_entries,
         self.n_contents) = struct.unpack("<3Q", b[72:96])
        self.clustered = bool(b[96])
        self.internal_compression = b[97]
        self.tile_compression = b[98]
        self.tile_type = b[99]
        self.min_zoom, self.max_zoom = b[100], b[101]
        (self.min_lon_e7, self.min_lat_e7, self.max_lon_e7,
         self.max_lat_e7) = struct.unpack("<4i", b[102:118])
        self.center_zoom = b[118]
        self.center_lon_e7, self.center_lat_e7 = struct.unpack(
            "<2i", b[119:127])
        self.root = _decode_dir(_decompress(
            self._pread(self.root_off, self.root_len),
            self.internal_compression))

    def _pread(self, off, ln):
        with open(self.path, "rb") as f:
            f.seek(off)
            return f.read(ln)

    # -- metadata ----------------------------------------------------
    def metadata(self):
        raw = _decompress(self._pread(self.meta_off, self.meta_len),
                          self.internal_compression)
        return json.loads(raw) if raw.strip() else {}

    def bounds_3857(self):
        """Header e7 bounds → EPSG:3857 (the extent the reference
        layer reports)."""
        def x(lon_e7):
            return lon_e7 / 1e7 / 180.0 * _E

        def y(lat_e7):
            lat = lat_e7 / 1e7
            return _E / np.pi * np.log(np.tan(
                np.pi / 4 + np.radians(lat) / 2))
        return (x(self.min_lon_e7), x(self.max_lon_e7),
                y(self.min_lat_e7), y(self.max_lat_e7))

    # -- tile access -------------------------------------------------
    def _lookup(self, entries, tid, depth=0):
        lo, hi = 0, len(entries) - 1
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            if entries[mid][0] <= tid:
                best = entries[mid]
                lo = mid + 1
            else:
                hi = mid - 1
        if best is None:
            return None
        etid, off, ln, run = best
        if run == 0:
            # leaf-directory pointer: offset into the leaf section
            if depth > 3:
                raise ValueError("pmtiles leaf recursion too deep")
            sub = _decode_dir(_decompress(
                self._pread(self.leaf_off + off, ln),
                self.internal_compression))
            return self._lookup(sub, tid, depth + 1)
        if etid <= tid < etid + run:
            return (etid, off, ln, run)
        return None

    def tile_bytes(self, z, x, y):
        hit = self._lookup(self.root, zxy_to_tileid(z, x, y))
        if hit is None:
            return None
        _, off, ln, _ = hit
        return _decompress(self._pread(self.data_off + off, ln),
                           self.tile_compression)

    def tile_runs(self):
        """Addressed tiles as COMPRESSED (tile_id, run_length) pairs —
        run lengths can be 2^32 (run_length_max fixture), so runs are
        never expanded here; leaf directories are walked."""
        out = []

        def walk(entries, depth):
            for tid, off, ln, run in entries:
                if run == 0:
                    sub = _decode_dir(_decompress(
                        self._pread(self.leaf_off + off, ln),
                        self.internal_compression))
                    walk(sub, depth + 1)
                else:
                    out.append((tid, run))
        walk(self.root, 0)
        return out

    def addressed_count(self, zoom=None):
        """Number of addressed tiles (without expansion)."""
        total = 0
        lo = _zoom_base(zoom) if zoom is not None else None
        hi = _zoom_base(zoom + 1) if zoom is not None else None
        for tid, run in self.tile_runs():
            if zoom is None:
                total += run
            else:
                total += max(0, min(tid + run, hi) - max(tid, lo))
        return total

    def tile_ids(self, zoom=None, limit=None):
        """Iterate addressed tile ids lazily, optionally limited to
        one zoom level and capped at ``limit`` ids."""
        lo = _zoom_base(zoom) if zoom is not None else 0
        hi = _zoom_base(zoom + 1) if zoom is not None else None
        n = 0
        for tid, run in self.tile_runs():
            start = max(tid, lo)
            stop = tid + run if hi is None else min(tid + run, hi)
            for t in range(start, stop):
                yield t
                n += 1
                if limit is not None and n >= limit:
                    return

    def tiles_in_bbox(self, zoom, bbox_3857):
        """Addressed (z, x, y) whose tile square intersects the bbox
        — enumerates the grid cells of the bbox (cheap) and keeps the
        ones present in the directory, the reference layer's
        spatial-filter path."""
        xmin, ymin, xmax, ymax = bbox_3857
        size = 2.0 * _E / (1 << zoom)
        nmax = (1 << zoom) - 1

        def clamp(v):
            return min(max(v, 0), nmax)
        tx0 = clamp(int((xmin + _E) // size))
        tx1 = clamp(int((xmax + _E) // size))
        ty0 = clamp(int((_E - ymax) // size))
        ty1 = clamp(int((_E - ymin) // size))
        out = []
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                if self._lookup(self.root,
                                zxy_to_tileid(zoom, tx, ty)):
                    out.append((zoom, tx, ty))
        return out


def read_pmtiles(path, zoom_level=None, layer=None, bbox=None,
                 max_tiles=1_000_000):
    """PMTiles (MVT tile type) → pyarrow table of features at one
    zoom level (default: the archive's maxzoom, the reference's
    default layer view): columns ``tile_z/tile_x/tile_y/layer/mvt_id/
    wkb/geom_type`` + attribute columns, geometry in EPSG:3857.

    ``bbox`` (xmin, ymin, xmax, ymax in 3857) switches to grid-cell
    enumeration so run-length archives with 2^32 addressed tiles
    (run_length_max fixture) read without expanding the directory."""
    import pyarrow as pa

    rd = PMTilesReader(path)
    if rd.tile_type != 1:
        raise NotImplementedError("only MVT pmtiles are supported")
    z = rd.max_zoom if zoom_level is None else int(zoom_level)
    if not rd.min_zoom <= z <= rd.max_zoom:
        raise ValueError(f"zoom {z} outside [{rd.min_zoom}, "
                         f"{rd.max_zoom}]")
    if bbox is not None:
        zxys = rd.tiles_in_bbox(z, bbox)
    else:
        if rd.addressed_count(zoom=z) > max_tiles:
            raise ValueError(
                f"archive addresses more than {max_tiles} tiles at "
                f"zoom {z}; pass bbox= to read a window")
        zxys = (tileid_to_zxy(t) for t in rd.tile_ids(zoom=z))
    tables = []
    for tz, tx, ty in zxys:
        buf = rd.tile_bytes(tz, tx, ty)
        if not buf:
            continue
        for lname, t in mvt_layer_tables(buf, tz, tx, ty).items():
            if layer is not None and lname != layer:
                continue
            pre = pa.Table.from_pydict({
                "tile_z": pa.array([tz] * t.num_rows, pa.int32()),
                "tile_x": pa.array([tx] * t.num_rows, pa.int32()),
                "tile_y": pa.array([ty] * t.num_rows, pa.int32()),
                "layer": pa.array([lname] * t.num_rows, pa.string()),
            })
            for c in t.column_names:
                pre = pre.append_column(c, t[c])
            tables.append(pre)
    if not tables:
        return pa.table({"tile_z": pa.array([], pa.int32())})
    if bbox is not None:
        # the reference's SetSpatialFilterRect semantics: keep
        # features whose GEOMETRY envelope intersects the rect (the
        # tile test above only prunes candidate tiles)
        xmin, ymin, xmax, ymax = bbox
        kept = []
        for t in tables:
            x0, y0, x1, y1 = _W.wkb_bbox_many(t["wkb"].to_pylist())
            m = (np.asarray(x1) >= xmin) & (np.asarray(x0) <= xmax) \
                & (np.asarray(y1) >= ymin) & (np.asarray(y0) <= ymax)
            kept.append(t.filter(pa.array(m)))
        tables = kept
    schema_cols = {}
    for t in tables:                      # union of attribute columns
        for name, typ in zip(t.column_names, t.schema.types):
            schema_cols.setdefault(name, typ)
    aligned = []
    for t in tables:
        cols = {}
        for name, typ in schema_cols.items():
            if name in t.column_names:
                cols[name] = t[name]
            else:
                cols[name] = pa.nulls(t.num_rows, typ)
        aligned.append(pa.Table.from_pydict(cols))
    return pa.concat_tables(aligned, promote_options="permissive")


# -------------------------------------------------------------- writer

def write_pmtiles(path, tiles, *, metadata=None, tile_type=1,
                  min_zoom=None, max_zoom=None, bounds=None,
                  compress_tiles=True):
    """Write a PMTiles v3 archive.

    ``tiles``: dict {(z, x, y): tile_bytes} (MVT payloads, raw);
    identical payloads are deduplicated (clustered layout, like the
    reference's writer).  ``bounds``: (min_lon, min_lat, max_lon,
    max_lat) degrees.
    """
    items = sorted((zxy_to_tileid(z, x, y), (z, x, y), data)
                   for (z, x, y), data in tiles.items())
    zooms = [k[0] for _, k, _ in items]
    minz = min_zoom if min_zoom is not None else \
        (min(zooms) if zooms else 0)
    maxz = max_zoom if max_zoom is not None else \
        (max(zooms) if zooms else 0)
    data_blob = bytearray()
    offsets = {}
    entries = []
    n_contents = 0
    for tid, _zxy, data in items:
        payload = _gzip.compress(data, 5) if compress_tiles else data
        key = bytes(payload)
        if key not in offsets:
            offsets[key] = len(data_blob)
            data_blob += payload
            n_contents += 1
        entries.append((tid, offsets[key], len(payload), 1))
    # merge runs of identical consecutive tiles
    merged = []
    for e in entries:
        if merged and merged[-1][1] == e[1] and \
                merged[-1][2] == e[2] and \
                merged[-1][0] + merged[-1][3] == e[0]:
            t, o, ln, r = merged[-1]
            merged[-1] = (t, o, ln, r + 1)
        else:
            merged.append(e)
    root = _gzip.compress(_encode_dir(merged), 9)
    meta = _gzip.compress(json.dumps(
        metadata or {}, separators=(",", ":")).encode("utf-8"), 9)
    if bounds is None:
        bounds = (-180.0, -85.051129, 180.0, 85.051129)
    e7 = [int(round(v * 1e7)) for v in bounds]
    hdr_len = 127
    root_off = hdr_len
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off                     # no leaf dirs
    hdr = bytearray()
    hdr += _MAGIC + bytes([3])
    hdr += struct.pack("<8Q", root_off, len(root), meta_off,
                       len(meta), leaf_off, 0, data_off,
                       len(data_blob))
    hdr += struct.pack("<3Q", len(entries), len(merged), n_contents)
    hdr += bytes([1,                       # clustered
                  2,                       # internal gzip
                  2 if compress_tiles else 1,
                  tile_type, minz, maxz])
    hdr += struct.pack("<4i", e7[0], e7[1], e7[2], e7[3])
    hdr += bytes([maxz])
    hdr += struct.pack("<2i", int((e7[0] + e7[2]) / 2),
                       int((e7[1] + e7[3]) / 2))
    assert len(hdr) == hdr_len
    with open(path, "wb") as f:
        f.write(bytes(hdr) + root + meta + bytes(data_blob))
    return path


def write_pmtiles_dataset(path, tiles, *, metadata=None,
                          tile_type=1, bounds=None,
                          compress_tiles=True):
    """(z, x, y, tile) rows → PMTiles archive — the mbtiles→pmtiles
    conversion path (``ogrpmtilesfrommbtiles.cpp``).  ``tiles`` is an
    Arrow table, a Ray Dataset, or an iterable of 4-tuples; tile
    payloads that are already gzip'd are stored as-is."""
    td = {}

    def add(z, x, y, data):
        td[(int(z), int(x), int(y))] = bytes(data)

    if hasattr(tiles, "iter_batches"):            # ray.data.Dataset
        for b in tiles.iter_batches(batch_format="pandas"):
            for t in b.itertuples(index=False):
                add(t[0], t[1], t[2], t[3])
    else:
        import pyarrow as pa
        if isinstance(tiles, pa.Table):
            tiles = zip(*(tiles.column(i).to_pylist()
                          for i in range(4)))
        for z, x, y, data in tiles:
            add(z, x, y, data)
    pre_gz = all(d[:2] == b"\x1f\x8b" for d in td.values()) and td
    out = {}
    for k, d in td.items():
        out[k] = _gzip.decompress(d) if pre_gz and compress_tiles \
            else d
    return write_pmtiles(path, out, metadata=metadata,
                         tile_type=tile_type, bounds=bounds,
                         compress_tiles=compress_tiles)


def read_pmtiles_tiles(path, zoom_level=None, max_tiles=1_000_000):
    """Raw (z, x, y, tile) rows (tile bytes decompressed) — the
    counterpart of ``read_mbtiles_tiles`` for format conversion."""
    import pyarrow as pa

    rd = PMTilesReader(path)
    if rd.addressed_count(zoom=zoom_level) > max_tiles:
        raise ValueError(f"more than {max_tiles} addressed tiles")
    zs, xs, ys, blobs = [], [], [], []
    for tid in rd.tile_ids(zoom=zoom_level):
        z, x, y = tileid_to_zxy(tid)
        data = rd.tile_bytes(z, x, y)
        if data is None:
            continue
        zs.append(z)
        xs.append(x)
        ys.append(y)
        blobs.append(data)
    return pa.table({"z": pa.array(zs, pa.int32()),
                     "x": pa.array(xs, pa.int32()),
                     "y": pa.array(ys, pa.int32()),
                     "tile": pa.array(blobs, pa.binary())})


def write_pmtiles_features(path, feats_by_tile, *, layer="layer",
                           extent=4096, metadata=None, **kwargs):
    """Features (already binned per tile, in tile-local integer
    coords) → MVT tiles → archive.  ``feats_by_tile``:
    {(z, x, y): [{id, type, tags, parts}, …]}."""
    tiles = {}
    for zxy, feats in feats_by_tile.items():
        tiles[zxy] = encode_mvt([{"name": layer, "extent": extent,
                                  "version": 2, "features": feats}])
    md = dict(metadata or {})
    md.setdefault("format", "pbf")
    return write_pmtiles(path, tiles, metadata=md, **kwargs)
