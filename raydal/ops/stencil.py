"""Distributed stencil support: halo exchange for windowed tile ops.

The reference's 3×3 DEM kernels (``apps/gdaldem_lib.cpp:767``) and other
windowed ops need neighbor pixels at tile borders; GDAL reads overlapping
source windows per chunk (``dfSrcXExtraSize``, ``alg/gdalwarpkernel.cpp:
976+``).  The Ray-native equivalent is a **halo exchange**: every tile
``flat_map``s its border strips to the 8 neighboring cells, one
``groupby(cell)`` reassembles each tile with an ``r``-pixel apron, and
the windowed kernel then computes exact values everywhere — tile seams
become invisible.

Shuffle cost: strips are ``r × tile`` pixels per edge — for r = 1 on
256² float64 tiles that is ~3% of the tile bytes, an acceptable exchange
even at planet scale (and the strips hash to the SAME cell keys the tile
data already shuffles on, so partitioning stays aligned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo import cells

__all__ = ["emit_halo_strips", "apply_with_halo"]


def emit_halo_strips(t: pa.Table, tile_size=256, r=1) -> pa.Table:
    """flat_map stage: each (cell, data) tile row emits itself plus its
    border strips keyed to the 8 neighbor cells.

    Output rows: (cell, kind, data) where kind = "tile" for the tile's own
    payload and "<dy>,<dx>" for a strip arriving from the neighbor at
    offset (dy, dx) relative to the receiving tile.
    """
    out_cell, out_kind, out_data = [], [], []
    for i in range(t.num_rows):
        cell = t["cell"][i].as_py()
        z, x, y = (int(v) for v in cells.unpack_cell(np.int64(cell)))
        n = 1 << z
        blob = t["data"][i].as_py()
        arr = np.frombuffer(blob,
                            dtype=np.float64).reshape(tile_size, tile_size)
        out_cell.append(cell)
        out_kind.append("tile")
        out_data.append(blob)  # forward original bytes, no re-serialize
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ny, nx = y + dy, x + dx
                if not (0 <= ny < n and 0 <= nx < n):
                    continue
                # the strip of THIS tile facing neighbor (dy, dx)
                ys = slice(0, r) if dy < 0 else \
                    (slice(tile_size - r, tile_size) if dy > 0
                     else slice(0, tile_size))
                xs = slice(0, r) if dx < 0 else \
                    (slice(tile_size - r, tile_size) if dx > 0
                     else slice(0, tile_size))
                strip = np.ascontiguousarray(arr[ys, xs])
                out_cell.append(int(cells.pack_cell(z, nx, ny)))
                # offset FROM the receiver's perspective (this strip sits
                # at the receiver's (-dy, -dx) side)
                out_kind.append(f"{-dy},{-dx}")
                out_data.append(strip.tobytes())
    return pa.Table.from_pydict({
        "cell": pa.array(out_cell, pa.int64()),
        "kind": pa.array(out_kind, pa.string()),
        "data": pa.array(out_data, pa.binary())})


def apply_with_halo(tiles_ds, fn, tile_size=256, r=1, fill=0.0):
    """Run ``fn(padded) -> array`` over every tile with an exact r-px apron.

    ``fn`` receives a ``(tile+2r, tile+2r)`` float64 array (missing
    neighbors padded with the constant ``fill`` — note this differs from
    the reference's edge-replicate at the world boundary; interior seams
    are exact, boundary tiles see a ``fill`` apron) and must return an
    array whose central ``tile×tile`` window is taken as the tile's
    result.  Input must carry exactly ONE tile row per cell (mosaic
    first if sources overlap — enforced).  Returns rows (cell, data).
    """
    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        ts = tile_size
        pad = np.full((ts + 2 * r, ts + 2 * r), fill, dtype=np.float64)
        center = None
        strips = []
        # single pass: locate the center tile and collect strips
        for kind, data in zip(g["kind"].values, g["data"].values):
            if kind == "tile":
                if center is not None:
                    raise ValueError(
                        "apply_with_halo: multiple tile rows for one cell "
                        "— mosaic overlapping sources before the stencil")
                center = np.frombuffer(data,
                                       dtype=np.float64).reshape(ts, ts)
            else:
                strips.append((kind, data))
        if center is None:
            # strips arriving for a tile that has no data of its own: the
            # neighbor exists but this cell is empty — nothing to emit
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "data": pd.Series([], dtype=object)})
        pad[r:r + ts, r:r + ts] = center
        for kind, data in strips:
            dy, dx = (int(v) for v in kind.split(","))
            h = r if dy != 0 else ts
            w = r if dx != 0 else ts
            strip = np.frombuffer(data, dtype=np.float64).reshape(h, w)
            ys = slice(0, r) if dy < 0 else \
                (slice(r + ts, 2 * r + ts) if dy > 0 else slice(r, r + ts))
            xs = slice(0, r) if dx < 0 else \
                (slice(r + ts, 2 * r + ts) if dx > 0 else slice(r, r + ts))
            pad[ys, xs] = strip
        out = np.asarray(fn(pad), dtype=np.float64)
        if out.shape != (ts, ts):
            out = out[r:r + ts, r:r + ts]
        return pd.DataFrame({"cell": [int(g["cell"].iloc[0])],
                             "data": [out.tobytes()]})

    return (tiles_ds
            .map_batches(lambda t: emit_halo_strips(t, tile_size, r),
                         batch_format="pyarrow")
            .groupby("cell")
            .map_groups(assemble, batch_format="pandas"))
