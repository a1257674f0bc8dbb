"""Tile-matrix / cell indexing: WebMercatorQuad, quadkeys, Hilbert codes.

Tile-index math reproduces the reference's ``GetTileIndices``
(``apps/gdalalg_raster_tile.cpp:274-343``): ``floor((coord - origin)/span
+ EPSILON)`` with ``EPSILON = 1e-3`` (in tile units) and clamping to the
matrix, plus the xyz/tms y-flip of ``GetFileY``
(``apps/gdalalg_raster_tile.cpp:348-353``).

Cell ids double as the engine's spatial partition keys (the H3 role in the
north rule — H3 is not available in this environment, so the hexagonal
index is substituted by the equivalent quadtree cell scheme; ``grid_ring``
neighborhoods are provided for the kNN cell-ring expansion).  All functions
vectorize over numpy arrays and pack (z, x, y) into a single int64 key for
cheap groupby shuffles.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "WEB_MERCATOR_EXTENT",
    "TileMatrix",
    "web_mercator_quad",
    "tile_indices",
    "file_y",
    "pack_cell",
    "unpack_cell",
    "quadkey",
    "parent_cell",
    "children_cells",
    "grid_ring",
    "grid_disk",
    "hilbert_d",
    "lonlat_to_cell",
]

# Half-extent of the spherical-Mercator world: pi * 6378137 (WGS84 semi-major).
WEB_MERCATOR_EXTENT = 20037508.342789244

_EPSILON = 1e-3  # tile-unit epsilon, parity with gdalalg_raster_tile.cpp:297


class TileMatrix:
    """One zoom level of a tile matrix set (OGC TMS model)."""

    __slots__ = ("z", "top_left_x", "top_left_y", "res_x", "res_y",
                 "tile_w", "tile_h", "matrix_w", "matrix_h")

    def __init__(self, z, top_left_x, top_left_y, res_x, res_y,
                 tile_w, tile_h, matrix_w, matrix_h):
        self.z = z
        self.top_left_x = top_left_x
        self.top_left_y = top_left_y
        self.res_x = res_x
        self.res_y = res_y
        self.tile_w = tile_w
        self.tile_h = tile_h
        self.matrix_w = matrix_w
        self.matrix_h = matrix_h

    @property
    def tile_span_x(self):
        return self.res_x * self.tile_w

    @property
    def tile_span_y(self):
        return self.res_y * self.tile_h

    def tile_extent(self, tx, ty):
        """(xmin, ymin, xmax, ymax) of tile (tx, ty); vectorized."""
        tx = np.asarray(tx, dtype=np.float64)
        ty = np.asarray(ty, dtype=np.float64)
        xmin = self.top_left_x + tx * self.tile_span_x
        ymax = self.top_left_y - ty * self.tile_span_y
        return xmin, ymax - self.tile_span_y, xmin + self.tile_span_x, ymax

    def tile_gt(self, tx, ty):
        """North-up geotransform of one tile's pixel grid."""
        xmin, _, _, ymax = self.tile_extent(tx, ty)
        return (float(xmin), self.res_x, 0.0, float(ymax), 0.0, -self.res_y)


def web_mercator_quad(z, tile_size=256):
    """The WebMercatorQuad tile matrix at zoom ``z`` (EPSG:3857).

    Square world [-E, E]², 2^z × 2^z tiles of ``tile_size`` px.
    """
    n = 1 << z
    res = 2.0 * WEB_MERCATOR_EXTENT / (tile_size * n)
    return TileMatrix(z, -WEB_MERCATOR_EXTENT, WEB_MERCATOR_EXTENT,
                      res, res, tile_size, tile_size, n, n)


def tile_indices(tm: TileMatrix, xmin, ymin, xmax, ymax):
    """Tile index range covered by an extent, with reference parity.

    Returns ``(min_tx, min_ty, max_tx, max_ty)`` as int64 arrays (or
    scalars), each ``clamp(floor(frac + 1e-3), 0, matrix-1)``.
    """
    span_x = tm.tile_span_x
    span_y = tm.tile_span_y

    def _idx(frac, hi):
        return np.clip(np.floor(frac + _EPSILON), 0, hi - 1).astype(np.int64)

    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    min_tx = _idx((xmin - tm.top_left_x) / span_x, tm.matrix_w)
    min_ty = _idx((tm.top_left_y - ymax) / span_y, tm.matrix_h)
    max_tx = _idx((xmax - tm.top_left_x) / span_x, tm.matrix_w)
    max_ty = _idx((tm.top_left_y - ymin) / span_y, tm.matrix_h)
    return min_tx, min_ty, max_tx, max_ty


def file_y(ty, tm: TileMatrix, convention="xyz"):
    """Row index under the output naming convention (xyz vs tms y-flip)."""
    if convention == "xyz":
        return ty
    return tm.matrix_h - 1 - ty


# ---------------------------------------------------------------------------
# Packed int64 cell keys: z in bits 58..62, x in bits 29..57, y in bits 0..28.
# Supports z <= 28 (2^28 tiles per axis ≈ 15 cm cells at the equator).

_CELL_BITS = 29
_CELL_MASK = (1 << _CELL_BITS) - 1


def pack_cell(z, x, y):
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << (2 * _CELL_BITS)) | (x << _CELL_BITS) | y


def unpack_cell(cell):
    cell = np.asarray(cell, dtype=np.int64)
    z = cell >> (2 * _CELL_BITS)
    x = (cell >> _CELL_BITS) & _CELL_MASK
    y = cell & _CELL_MASK
    return z, x, y


def quadkey(z, x, y):
    """Bing-style quadkey string for one tile (scalar; for display/tests)."""
    out = []
    for i in range(int(z), 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if int(x) & mask:
            digit += 1
        if int(y) & mask:
            digit += 2
        out.append(str(digit))
    return "".join(out)


def parent_cell(cell):
    """Parent tile key one zoom up (child >> 1 keying, gdal2tiles.py:1477)."""
    z, x, y = unpack_cell(cell)
    return pack_cell(z - 1, x >> 1, y >> 1)


def children_cells(cell):
    """The 4 child keys one zoom down (scalar cell → int64[4])."""
    z, x, y = unpack_cell(np.asarray(cell))
    z, x, y = int(z), int(x), int(y)
    return pack_cell(
        np.full(4, z + 1), np.array([2 * x, 2 * x + 1, 2 * x, 2 * x + 1]),
        np.array([2 * y, 2 * y, 2 * y + 1, 2 * y + 1]))


def grid_ring(z, x, y, k):
    """Cells at Chebyshev distance exactly ``k`` from (x, y) at zoom ``z``.

    The quadtree analogue of H3 ``gridRingUnsafe`` used by the kNN
    cell-ring expansion (reference semantics: per-quadrant expanding search
    of ``alg/gdalgrid.cpp:347-426``).  X wraps around the antimeridian; Y is
    clipped at the poles.  Returns an int64 array of packed cells.
    """
    n = 1 << int(z)
    if k == 0:
        return pack_cell(np.array([z]), np.array([x]), np.array([y]))
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            xs.append(x + dx)
            ys.append(y + dy)
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            xs.append(x + dx)
            ys.append(y + dy)
    xs = np.asarray(xs, dtype=np.int64) % n
    ys = np.asarray(ys, dtype=np.int64)
    keep = (ys >= 0) & (ys < n)
    xs, ys = xs[keep], ys[keep]
    return pack_cell(np.full(len(xs), z, dtype=np.int64), xs, ys)


def grid_disk(z, x, y, k):
    """All cells within Chebyshev distance ``k`` (rings 0..k)."""
    parts = [grid_ring(z, x, y, i) for i in range(k + 1)]
    return np.concatenate(parts)


def hilbert_d(order, x, y):
    """Hilbert curve distance of cell (x, y) on a 2^order grid; vectorized.

    Public xy→d algorithm (Wikipedia "Hilbert curve", iterative rot form) —
    the same locality-preserving code the reference uses for its packed
    Hilbert R-tree bulk sort (``ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:86``
    semantics, not implementation).  Used for spatial-locality sorts.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x[flip], y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        x_s = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = x_s
        s >>= 1
    return d


def lonlat_to_cell(lon, lat, z):
    """Packed WebMercatorQuad cell containing each (lon, lat) point."""
    mx, my = _crs.lonlat_to_mercator(lon, lat)
    tm = web_mercator_quad(z)
    tx = np.clip(np.floor((mx - tm.top_left_x) / tm.tile_span_x),
                 0, tm.matrix_w - 1).astype(np.int64)
    ty = np.clip(np.floor((tm.top_left_y - my) / tm.tile_span_y),
                 0, tm.matrix_h - 1).astype(np.int64)
    return pack_cell(np.full_like(tx, z), tx, ty)


from . import crs as _crs  # noqa: E402  (no cycle: crs does not import cells)
