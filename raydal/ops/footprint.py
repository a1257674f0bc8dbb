"""Footprint + tile-assignment operators (stateless ``map_batches`` stages).

Vectorized per batch: geotransform corner math in bulk numpy, CRS
transforms grouped by source CRS (three supported codes → three vector
calls per batch, never per row), and tile-range expansion via
repeat/arange — no Python loop over rows or tiles.

Tile-index math carries the reference's exact floor+EPSILON+clamp
semantics (``apps/gdalalg_raster_tile.cpp:274-343``) via
:func:`raydal.geo.cells.tile_indices`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import cells
from ..geo.crs import Transformer

__all__ = ["add_footprint", "assign_tiles", "footprint_corners"]


def footprint_corners(gt_arr, w, h, densify_mid=True):
    """Per-row footprint sample points from geotransform + dims.

    Returns (n, k, 2) coords in each row's own CRS — 4 corners plus (when
    ``densify_mid``) edge midpoints + center, the cheap stand-in for the
    reference's 21×21 ``GDALSuggestedWarpOutput2`` sampling grid
    (``alg/gdaltransformer.cpp:342``) that bounds curvature error for the
    small footprints this engine handles.
    """
    n = len(w)
    g = np.asarray(gt_arr, dtype=np.float64).reshape(n, 6)
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    if densify_mid:
        fr = np.array([[0, 0], [1, 0], [0, 1], [1, 1],
                       [0.5, 0], [0, 0.5], [1, 0.5], [0.5, 1], [0.5, 0.5]])
    else:
        fr = np.array([[0, 0], [1, 0], [0, 1], [1, 1]])
    px = fr[None, :, 0] * w[:, None]
    py = fr[None, :, 1] * h[:, None]
    x = g[:, 0:1] + px * g[:, 1:2] + py * g[:, 2:3]
    y = g[:, 3:4] + px * g[:, 4:5] + py * g[:, 5:6]
    return np.stack([x, y], axis=2)


def _flatten_gt(batch, col="gt"):
    n = batch.num_rows
    gt = batch[col]
    if isinstance(gt, pa.ChunkedArray):
        gt = gt.combine_chunks()
    return np.asarray(gt.flatten(), dtype=np.float64).reshape(n, 6)


def add_footprint(batch: pa.Table, dst_crs=3857, drop_bytes=False) -> pa.Table:
    """Append dst-CRS footprint bbox columns (xmin, ymin, xmax, ymax).

    Rows are grouped by their ``crs`` value so each distinct CRS costs one
    vectorized transform of the whole group's sample points.
    """
    n = batch.num_rows
    gt = _flatten_gt(batch)
    w = np.asarray(batch["w"], dtype=np.float64)
    h = np.asarray(batch["h"], dtype=np.float64)
    pts = footprint_corners(gt, w, h)
    crs_col = np.asarray(batch["crs"]).astype(str)
    xmin = np.empty(n)
    ymin = np.empty(n)
    xmax = np.empty(n)
    ymax = np.empty(n)
    for code in np.unique(crs_col):
        idx = crs_col == code
        tf = Transformer(code, dst_crs)
        tx, ty = tf.transform(pts[idx, :, 0].ravel(), pts[idx, :, 1].ravel())
        k = pts.shape[1]
        tx = tx.reshape(-1, k)
        ty = ty.reshape(-1, k)
        xmin[idx] = tx.min(axis=1)
        xmax[idx] = tx.max(axis=1)
        ymin[idx] = ty.min(axis=1)
        ymax[idx] = ty.max(axis=1)
    out = batch.drop_columns(["bytes"]) if drop_bytes and "bytes" in batch.schema.names else batch
    for name, arr in (("xmin", xmin), ("ymin", ymin),
                      ("xmax", xmax), ("ymax", ymax)):
        out = out.append_column(name, pa.array(arr, pa.float64()))
    return out


def assign_tiles(batch: pa.Table, z, carry_cols=("image_id",),
                 convention="xyz") -> pa.Table:
    """Expand footprint bboxes to one row per covered (z, x, y) tile.

    Input must carry ``xmin/ymin/xmax/ymax`` (from :func:`add_footprint`).
    Output columns: carried cols + ``z, tile_x, tile_y, cell`` (packed
    int64 key).  Expansion is fully vectorized (repeat + arange).
    """
    tm = cells.web_mercator_quad(z)
    tx0, ty0, tx1, ty1 = cells.tile_indices(
        tm, np.asarray(batch["xmin"]), np.asarray(batch["ymin"]),
        np.asarray(batch["xmax"]), np.asarray(batch["ymax"]))
    nx = (tx1 - tx0 + 1)
    ny = (ty1 - ty0 + 1)
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(batch.num_rows), counts)
    # per expanded element: local offset within its row's tile rectangle
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    nx_r = np.repeat(nx, counts)
    tile_x = np.repeat(tx0, counts) + offs % nx_r
    tile_y = np.repeat(ty0, counts) + offs // nx_r
    tile_y_out = cells.file_y(tile_y, tm, convention)
    cols = {}
    for c in carry_cols:
        cols[c] = batch[c].take(pa.array(row_idx, pa.int64()))
    cols["z"] = pa.array(np.full(total, z, dtype=np.int32))
    cols["tile_x"] = pa.array(tile_x.astype(np.int64))
    cols["tile_y"] = pa.array(tile_y_out.astype(np.int64))
    # cell packs the SAME y the tile_y column carries, so unpack_cell and
    # the columns always agree regardless of the xyz/tms convention
    cols["cell"] = pa.array(cells.pack_cell(np.full(total, z), tile_x,
                                            tile_y_out))
    return pa.Table.from_pydict(cols)
