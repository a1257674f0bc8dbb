"""MBTiles reader/writer — sqlite z/x/y tile archives.

The reference's MBTiles driver (``frmts/mbtiles/mbtilesdataset.cpp``)
sits on libsqlite3; this module does the same through stdlib ``sqlite3``.
Parity pieces replicated from the reference:

* tile addressing: the DB stores TMS rows (0 = south); the WMTS/XYZ row
  is ``(1 << z) - 1 - tile_row`` (``mbtilesdataset.cpp`` ReadTile path),
* raster extent: metadata ``bounds`` (lon/lat, comma-separated) through
  spherical Mercator with northings clamped to ±MAX_GM
  (``MBTilesGetBounds``, ``mbtilesdataset.cpp:2175``); without usable
  bounds, the min/max tile rectangle at max zoom
  (``MBTilesTileCoordToWorldCoord``, ``:2157``),
* raster size ``int(0.5 + extent/res)`` and geotransform anchored at the
  EXACT bounds (``InitRaster``, ``mbtilesdataset.cpp:1244-1268``),
* tile alignment: the global pixel shift is ROUNDED to integer pixels,
  ``floor(0.5 + (gt0 - TMS_ORIGIN_X)/res)``
  (``ComputeTileAndPixelShifts``, ``:1169-1188``), so tiles paste at
  integer offsets even for non-tile-aligned bounds,
* band model: everything expands to RGBA (the driver forces 4 bands,
  ``mbtilesdataset.cpp:2790`` "Force 4 bands by default (#6119)");
  missing tiles read as 0 (alpha 0),
* zoom levels below max act as overviews sharing the same world bounds.

Validated against the reference's own fixtures and published values
(``autotest/gdrivers/mbtiles.py``: byte.mbtiles band-1 checksum 4118,
world_l1 per-band checksums at z=1 and its z=0 overview).

Writer: ``write_mbtiles`` emits the standard ``metadata`` + ``tiles``
tables from XYZ-keyed tile rows (the layout of this engine's tile
pyramid), flipping rows to TMS.  At scale the sink is a DRIVER-side
finish over the bounded tile set (tiles ≤ 4^z with data; the heavy tile
rendering happens distributed upstream) — one sqlite file is the
format's contract, so the Dataset is consumed via ``iter_batches``.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

from ..geo.crs import lonlat_to_mercator
from .codecs import decode as _decode_image

__all__ = ["read_mbtiles_metadata", "read_mbtiles_tiles",
           "read_mbtiles_raster", "write_mbtiles"]

MAX_GM = 20037508.342789244  # pi * 6378137 (TMS_ORIGIN, mbtilesdataset.cpp)
_TILE = 256


def _connect(path):
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def read_mbtiles_metadata(path):
    """metadata table → dict."""
    con = _connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def read_mbtiles_tiles(path, zoom_level=None):
    """tiles table → Arrow (zoom_level, tile_column, tile_row [TMS],
    tile_data)."""
    con = _connect(path)
    try:
        q = "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        args = ()
        if zoom_level is not None:
            q += " WHERE zoom_level = ?"
            args = (zoom_level,)
        rows = list(con.execute(q, args))
    finally:
        con.close()
    return pa.Table.from_pydict({
        "zoom_level": pa.array([r[0] for r in rows], pa.int64()),
        "tile_column": pa.array([r[1] for r in rows], pa.int64()),
        "tile_row": pa.array([r[2] for r in rows], pa.int64()),
        "tile_data": pa.array([bytes(r[3]) for r in rows], pa.binary())})


def _to_rgba(px):
    """Decoded tile → (h, w, 4) uint8, reference band expansion."""
    if px.ndim == 2:
        px = px[:, :, None]
    c = px.shape[2]
    h, w = px.shape[:2]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:          # gray
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = 255
    elif c == 2:        # gray + alpha
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = px[:, :, 1]
    elif c == 3:        # rgb
        out[:, :, :3] = px
        out[:, :, 3] = 255
    else:               # rgba
        out[:, :, :4] = px[:, :, :4]
    return out


def _bounds_from_metadata(md):
    b = md.get("bounds")
    if not b:
        return None
    try:
        lon0, lat0, lon1, lat1 = [float(t) for t in b.split(",")]
    except ValueError:
        return None
    # validity gate per MBTilesGetBounds (mbtilesdataset.cpp:2196-2204)
    if (abs(lon0) > 180 or abs(lat0) >= 89.99 or abs(lon1) > 180
            or abs(lat1) >= 89.99 or lon0 > lon1 or lat0 > lat1):
        return None
    x0, y0 = lonlat_to_mercator(lon0, lat0)
    x1, y1 = lonlat_to_mercator(lon1, lat1)
    return (float(x0), float(np.clip(y0, -MAX_GM, MAX_GM)),
            float(x1), float(np.clip(y1, -MAX_GM, MAX_GM)))


def read_mbtiles_raster(path, zoom_level=None, use_bounds=True):
    """Assemble one zoom level into an RGBA raster.

    Returns ``(rgba (h, w, 4) uint8, geotransform)``.  ``zoom_level``
    defaults to the max level present; ``use_bounds=False`` mirrors the
    driver's USE_BOUNDS=NO open option (extent = present-tile
    rectangle)."""
    md = read_mbtiles_metadata(path)
    con = _connect(path)
    try:
        if zoom_level is None:
            if "maxzoom" in md:
                zoom_level = int(md["maxzoom"])
            else:
                mz = con.execute(
                    "SELECT MAX(zoom_level) FROM tiles").fetchone()[0]
                if mz is None:
                    raise ValueError("mbtiles file has no tiles")
                zoom_level = int(mz)
        bounds = _bounds_from_metadata(md) if use_bounds else None
        tile_dim = 2 * MAX_GM / (1 << zoom_level)
        if bounds is None:
            c0, c1, r0, r1 = con.execute(
                "SELECT min(tile_column), max(tile_column), min(tile_row),"
                " max(tile_row) FROM tiles WHERE zoom_level = ?",
                (zoom_level,)).fetchone()
            if c0 is None:
                raise ValueError(f"no tiles at zoom {zoom_level}")
            # MBTilesTileCoordToWorldCoord: -MAX_GM + coord * tile_dim
            bounds = (-MAX_GM + c0 * tile_dim, -MAX_GM + r0 * tile_dim,
                      -MAX_GM + (c1 + 1) * tile_dim,
                      -MAX_GM + (r1 + 1) * tile_dim)
        rows = list(con.execute(
            "SELECT tile_column, tile_row, tile_data FROM tiles "
            "WHERE zoom_level = ?", (zoom_level,)))
    finally:
        con.close()
    minx, miny, maxx, maxy = bounds
    res = 2 * MAX_GM / _TILE / (1 << zoom_level)
    w = int(0.5 + (maxx - minx) / res)
    h = int(0.5 + (maxy - miny) / res)
    # integer global-pixel shift (ComputeTileAndPixelShifts)
    shift_x = int(np.floor(0.5 + (minx - (-MAX_GM)) / res))
    shift_y = int(np.floor(0.5 + (maxy - MAX_GM) / (-res)))
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    n = 1 << zoom_level
    for tc, tr, data in rows:
        rgba = _to_rgba(_decode_image(bytes(data)))
        gx = tc * _TILE - shift_x            # global → raster pixel
        gy = (n - 1 - tr) * _TILE - shift_y  # TMS row → WMTS row
        sy0, sx0 = max(0, -gy), max(0, -gx)
        dy0, dx0 = max(0, gy), max(0, gx)
        ny = min(rgba.shape[0] - sy0, h - dy0)
        nx = min(rgba.shape[1] - sx0, w - dx0)
        if ny <= 0 or nx <= 0:
            continue
        canvas[dy0:dy0 + ny, dx0:dx0 + nx] = \
            rgba[sy0:sy0 + ny, sx0:sx0 + nx]
    gt = (minx, res, 0.0, maxy, 0.0, -res)
    return canvas, gt


def write_mbtiles(path, tiles, metadata=None, xyz=True):
    """Write (z, x, y, bytes) tile rows into a new .mbtiles file.

    ``tiles``: iterable of 4-tuples or an Arrow table / Dataset with
    columns (z, x, y, tile) — rows in XYZ convention by default
    (``xyz=False`` passes rows through as already-TMS).  ``metadata``:
    extra name→value pairs merged over the defaults."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        con.execute("CREATE TABLE tiles (zoom_level INTEGER, "
                    "tile_column INTEGER, tile_row INTEGER, "
                    "tile_data BLOB)")
        con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        md = {"name": os.path.splitext(os.path.basename(path))[0],
              "type": "overlay", "version": "1.1",
              "description": "raydal tiles", "format": "png"}
        md.update(metadata or {})
        con.executemany("INSERT INTO metadata VALUES (?, ?)",
                        sorted(md.items()))

        def norm(row):
            z, x, y, data = row
            if xyz:
                y = (1 << int(z)) - 1 - int(y)
            return (int(z), int(x), int(y), sqlite3.Binary(bytes(data)))

        if hasattr(tiles, "iter_batches"):        # ray.data.Dataset
            for b in tiles.iter_batches(batch_format="pandas"):
                con.executemany(
                    "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                    [norm(t) for t in b.itertuples(index=False)])
        else:
            if isinstance(tiles, pa.Table):
                tiles = zip(*(tiles.column(i).to_pylist()
                              for i in range(4)))
            con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)",
                            [norm(t) for t in tiles])
        con.commit()
    finally:
        con.close()
    return path
