"""GTI-analogue: a footprint-index dataset over the image table, driving
window reads that touch only intersecting tiles.

The reference's GTI driver (``frmts/gti/gdaltileindexdataset.cpp``)
exposes a vector layer of per-tile footprints + paths as one virtual
raster; a window read consults the index and opens only overlapping
tiles.  Here the index is an Arrow table ``(image_id, xmin, ymin, xmax,
ymax, w, h, crs, gt)`` built in one metadata-only pass (no pixel bytes
move), and :class:`VirtualMosaic` serves window reads by bbox-pruned
parquet reads of just the needed rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from ..geo import affine
from ..geo.crs import Transformer
from ..io.codecs import decode
from ..kernels.resample import resample_grid
from .footprint import add_footprint

__all__ = ["build_tile_index", "VirtualMosaic"]


def build_tile_index(images_ds, dst_crs=3857):
    """Footprint index of an image Dataset → small Arrow table.

    One streaming metadata pass (``bytes`` never read); the result is
    the virtual mosaic's "vector index layer".
    """
    pruned = images_ds.select_columns(["image_id", "w", "h", "crs", "gt"])
    with_fp = pruned.map_batches(
        lambda t: add_footprint(t, dst_crs=dst_crs), batch_format="pyarrow")
    tbl = pa.concat_tables(
        b for b in with_fp.iter_batches(batch_format="pyarrow",
                                        batch_size=4096))
    return tbl


class VirtualMosaic:
    """Window reads over a footprint index (GTI semantics).

    ``read_window(x0, y0, x1, y1, w, h)`` composes the requested
    dst-CRS window at (w, h) resolution from ONLY the images whose
    footprints intersect it — later image ids paint over earlier ones
    (the reference's default last-in-index-wins ordering).
    """

    def __init__(self, index_tbl: pa.Table, images_path, dst_crs=3857):
        self.idx = index_tbl
        self.images_path = images_path
        self.dst_crs = dst_crs
        self.xmin = np.asarray(index_tbl["xmin"], dtype=np.float64)
        self.ymin = np.asarray(index_tbl["ymin"], dtype=np.float64)
        self.xmax = np.asarray(index_tbl["xmax"], dtype=np.float64)
        self.ymax = np.asarray(index_tbl["ymax"], dtype=np.float64)
        self.ids = np.asarray(index_tbl["image_id"])

    def select(self, x0, y0, x1, y1):
        """Image ids intersecting the window (the index lookup)."""
        hit = ((self.xmin <= x1) & (self.xmax >= x0)
               & (self.ymin <= y1) & (self.ymax >= y0))
        return self.ids[hit]

    def read_window(self, x0, y0, x1, y1, w, h, resample="bilinear"):
        """Compose the window from intersecting images only."""
        ids = self.select(x0, y0, x1, y1)
        out = np.zeros((h, w, 3), dtype=np.uint8)
        filled = np.zeros((h, w), dtype=bool)
        if len(ids) == 0:
            return out, filled
        dset = pads.dataset(self.images_path)
        tbl = dset.to_table(
            columns=["image_id", "bytes", "crs", "gt"],
            filter=pads.field("image_id").isin([str(i) for i in ids]))
        order = {str(i): k for k, i in enumerate(ids)}
        bbox_of = {str(self.ids[k]): (self.xmin[k], self.ymin[k],
                                      self.xmax[k], self.ymax[k])
                   for k in range(len(self.ids))}
        rows = sorted(range(tbl.num_rows),
                      key=lambda r: order[tbl["image_id"][r].as_py()])
        gx = x0 + (np.arange(w) + 0.5) * (x1 - x0) / w
        gy = y1 - (np.arange(h) + 0.5) * (y1 - y0) / h
        tfs = {}
        for r in rows:
            # clip the window grid to this image's footprint bbox first:
            # a window overlapping N small images costs the sum of the
            # covered sub-rects, not N full-window transforms
            bx0, by0, bx1, by1 = bbox_of[tbl["image_id"][r].as_py()]
            ci = np.nonzero((gx >= bx0) & (gx <= bx1))[0]
            rj = np.nonzero((gy >= by0) & (gy <= by1))[0]
            if len(ci) == 0 or len(rj) == 0:
                continue
            GX, GY = np.meshgrid(gx[ci], gy[rj])
            px = decode(tbl["bytes"][r].as_py())
            if px.ndim == 2:
                px = px[:, :, None].repeat(3, axis=2)
            gt = tuple(tbl["gt"][r].as_py())
            crs = tbl["crs"][r].as_py()
            if crs not in tfs:
                tfs[crs] = Transformer(self.dst_crs, crs)
            sxw, syw = tfs[crs].transform(GX, GY)
            inv = affine.invert_gt(gt)
            sx, sy = affine.apply_gt(inv, sxw, syw)
            vals, valid = resample_grid(px, sx, sy, resample=resample)
            vals = np.clip(vals + 0.5, 0, 255).astype(np.uint8)
            sub = out[np.ix_(rj, ci)]
            sub[valid] = vals[valid]
            out[np.ix_(rj, ci)] = sub
            fsub = filled[np.ix_(rj, ci)]
            fsub |= valid
            filled[np.ix_(rj, ci)] = fsub
        return out, filled
