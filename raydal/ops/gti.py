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

__all__ = ["build_tile_index", "VirtualMosaic", "mosaic_dataset"]


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


def mosaic_dataset(ds, res=None, extent=None, tile_size=512,
                   background=0):
    """Distributed mosaic of a same-CRS north-up image table — the
    ``gdal raster mosaic`` / gdal_merge composition model
    (``apps/gdalalg_raster_mosaic.cpp``; last image in id order paints
    over earlier ones, target grid = first image's resolution over the
    union extent unless overridden).

    Shape: one metadata pass merges per-batch extent partials on the
    driver (bounded: one row per batch); each image row then flat-maps
    to the output tiles its footprint covers, and a
    ``groupby(tile).map_groups`` paints every tile from only its own
    images — no driver-side pixel loop, no full-mosaic materialization.
    Reprojection is upstream's job (compose with the ``warp`` step);
    inputs here share one CRS and north-up geotransforms, like
    gdal_merge.
    """
    import ray.data  # noqa: F401  (driver-side import)

    names = ds.schema().names
    need = {"image_id", "bytes", "gt"}
    if not need <= set(names):
        raise ValueError(f"mosaic needs columns {sorted(need)}")

    meta_wh = "w" in names and "h" in names

    def extents(t: pa.Table) -> pa.Table:
        x0s, y0s, x1s, y1s = [], [], [], []
        min_id = min_rx = min_ry = None
        for i in range(t.num_rows):
            gt = t["gt"][i].as_py()
            if gt is None:
                continue
            if meta_wh:
                w, h = t["w"][i].as_py(), t["h"][i].as_py()
            else:
                h, w = decode(t["bytes"][i].as_py()).shape[:2]
            x0s.append(gt[0])
            x1s.append(gt[0] + gt[1] * w)
            y1s.append(gt[3])
            y0s.append(gt[3] + gt[5] * h)
            iid = str(t["image_id"][i].as_py())
            if min_id is None or iid < min_id:
                min_id, min_rx, min_ry = iid, abs(gt[1]), abs(gt[5])
        if not x0s:
            return pa.Table.from_pydict(
                {"x0": pa.array([], pa.float64()),
                 "y0": pa.array([], pa.float64()),
                 "x1": pa.array([], pa.float64()),
                 "y1": pa.array([], pa.float64()),
                 "rx": pa.array([], pa.float64()),
                 "ry": pa.array([], pa.float64()),
                 "min_id": pa.array([], pa.string())})
        return pa.Table.from_pydict({
            "x0": pa.array([min(x0s)]), "y0": pa.array([min(y0s)]),
            "x1": pa.array([max(x1s)]), "y1": pa.array([max(y1s)]),
            "rx": pa.array([min_rx]), "ry": pa.array([min_ry]),
            "min_id": pa.array([min_id], pa.string())})

    # resolution comes from the FIRST image in image_id order — a
    # deterministic choice (Ray block arrival order is not)
    x0 = y0 = x1 = y1 = rx = ry = None
    best_id = None
    for b in ds.map_batches(extents, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            vx0, vy0 = b["x0"][i].as_py(), b["y0"][i].as_py()
            vx1, vy1 = b["x1"][i].as_py(), b["y1"][i].as_py()
            x0 = vx0 if x0 is None else min(x0, vx0)
            y0 = vy0 if y0 is None else min(y0, vy0)
            x1 = vx1 if x1 is None else max(x1, vx1)
            y1 = vy1 if y1 is None else max(y1, vy1)
            bid = b["min_id"][i].as_py()
            if best_id is None or bid < best_id:
                best_id = bid
                rx, ry = b["rx"][i].as_py(), b["ry"][i].as_py()
    if x0 is None:
        raise ValueError("mosaic: no georeferenced input rows")
    if extent is not None:
        x0, y0, x1, y1 = (float(v) for v in extent)
    if res is not None:
        rx = ry = float(res)
    ts = int(tile_size)
    ntx = max(int(np.ceil((x1 - x0) / (rx * ts))), 1)
    nty = max(int(np.ceil((y1 - y0) / (ry * ts))), 1)

    has_wh = "w" in names and "h" in names

    def to_tiles(t: pa.Table) -> pa.Table:
        out = {"tile": [], "image_id": [], "bytes": [], "gt": []}
        for i in range(t.num_rows):
            gt = t["gt"][i].as_py()
            if gt is None:
                continue
            blob = t["bytes"][i].as_py()
            if has_wh:  # metadata-only tile cover — no decode
                w, h = t["w"][i].as_py(), t["h"][i].as_py()
            else:
                h, w = decode(blob).shape[:2]
            ix0, ix1 = gt[0], gt[0] + gt[1] * w
            iy1, iy0 = gt[3], gt[3] + gt[5] * h
            tx0 = max(int((ix0 - x0) / (rx * ts)), 0)
            tx1 = min(int(np.ceil((ix1 - x0) / (rx * ts))), ntx)
            tyn0 = max(int((y1 - iy1) / (ry * ts)), 0)
            tyn1 = min(int(np.ceil((y1 - iy0) / (ry * ts))), nty)
            for ty in range(tyn0, tyn1):
                for tx in range(tx0, tx1):
                    out["tile"].append(ty * ntx + tx)
                    out["image_id"].append(
                        str(t["image_id"][i].as_py()))
                    out["bytes"].append(blob)
                    out["gt"].append([float(v) for v in gt])
        return pa.Table.from_pydict({
            "tile": pa.array(out["tile"], pa.int64()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "gt": pa.array(out["gt"], pa.list_(pa.float64()))})

    def paint(g: pa.Table) -> pa.Table:
        tile = int(g["tile"][0].as_py())
        tx, ty = tile % ntx, tile // ntx
        wx0 = x0 + tx * ts * rx
        wy1 = y1 - ty * ts * ry
        tw = min(ts, int(round((x1 - wx0) / rx)))
        th = min(ts, int(round((wy1 - y0) / ry)))
        if tw <= 0 or th <= 0:
            return pa.Table.from_pydict({
                "image_id": pa.array([], pa.string()),
                "band": pa.array([], pa.int32()),
                "data": pa.array([], pa.binary()),
                "w": pa.array([], pa.int32()),
                "h": pa.array([], pa.int32()),
                "dtype": pa.array([], pa.string()),
                "geotransform": pa.array(
                    [], pa.list_(pa.float64()))})
        gx = wx0 + (np.arange(tw) + 0.5) * rx
        gy = wy1 - (np.arange(th) + 0.5) * ry
        nbands = None
        acc = None
        order = np.argsort(np.asarray(g["image_id"]).astype(str),
                           kind="stable")
        for r in order:
            px = decode(g["bytes"][int(r)].as_py())
            if px.ndim == 2:
                px = px[:, :, None]
            if acc is None:
                nbands = px.shape[2]
                acc = np.full((th, tw, nbands), background,
                              dtype=px.dtype)
            gt = g["gt"][int(r)].as_py()
            # nearest sample: world → source pixel index (north-up)
            cx = np.floor((gx - gt[0]) / gt[1]).astype(np.int64)
            cy = np.floor((gy - gt[3]) / gt[5]).astype(np.int64)
            ok_x = (cx >= 0) & (cx < px.shape[1])
            ok_y = (cy >= 0) & (cy < px.shape[0])
            if not ok_x.any() or not ok_y.any():
                continue
            sel_y = np.nonzero(ok_y)[0]
            sel_x = np.nonzero(ok_x)[0]
            block = px[cy[sel_y][:, None], cx[sel_x][None, :], :]
            if block.shape[2] >= nbands:
                block = block[:, :, :nbands]
            elif block.shape[2] == 1:   # gray replicates to all bands
                block = np.repeat(block, nbands, axis=2)
            else:                       # the reference errors likewise
                raise ValueError(
                    f"mosaic: input has {block.shape[2]} bands but "
                    f"the mosaic has {nbands}; mixed multi-band "
                    "counts are not composable")
            acc[np.ix_(sel_y, sel_x)] = block
        gt_out = [wx0, rx, 0.0, wy1, 0.0, -ry]
        rows = {"image_id": [], "band": [], "data": [], "w": [],
                "h": [], "dtype": [], "geotransform": []}
        for b in range(acc.shape[2]):
            rows["image_id"].append(f"mosaic_{tx}_{ty}")
            rows["band"].append(b + 1)
            rows["data"].append(
                np.ascontiguousarray(acc[:, :, b]).tobytes())
            rows["w"].append(tw)
            rows["h"].append(th)
            rows["dtype"].append(str(acc.dtype))
            rows["geotransform"].append(gt_out)
        return pa.Table.from_pydict({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "band": pa.array(rows["band"], pa.int32()),
            "data": pa.array(rows["data"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "dtype": pa.array(rows["dtype"], pa.string()),
            "geotransform": pa.array(rows["geotransform"],
                                     pa.list_(pa.float64()))})

    tiled = ds.map_batches(to_tiles, batch_format="pyarrow")
    return tiled.groupby("tile").map_groups(paint,
                                            batch_format="pyarrow")
