"""Warp / reproject operators — actor-pool ``map_batches`` stages.

The actor holds per-worker state exactly where the reference clones
per-thread state (transformer clones at ``alg/gdalwarpkernel.cpp:371-445``,
per-thread warp resources at ``apps/gdalalg_raster_tile.cpp:1938-2028``):
a Transformer cache and scratch-free vectorized kernels.  Per image the
inner loop is pure numpy over the full destination grid (one vectorized
pass per kernel tap), mirroring the reference's scanline kernel but
batch-wide.

Output-grid inference follows ``GDALSuggestedWarpOutput2`` in spirit:
transform densified footprint → dst bbox; resolution chosen to preserve
the source pixel count (`alg/gdaltransformer.cpp:342` behavior for the
square-ish case).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import affine, cells
from ..geo import wkb as W
from ..geo.crs import Transformer, _norm_crs
from ..io.codecs import decode
from ..io.png import encode_png
from .cutline import cutline_density_mask
from ..kernels.checksum import checksum
from ..kernels.resample import (bilinear_sample_fast,
                                copy_words_cast, resample_grid)
from .footprint import _flatten_gt, footprint_corners
from .join import SpatialJoinZones

__all__ = ["WarpImages", "WarpKernelsFanout", "WarpToTiles",
           "suggest_output_grid", "warp_array", "approx_project_rows",
           "project_grid", "APPROX_ERROR_DEFAULT"]

# gdalwarp's default approx-transformer error threshold, in source
# pixels (apps/gdalwarp_lib.cpp:1588 "-et 0.125")
APPROX_ERROR_DEFAULT = 0.125


def approx_project_rows(chain_fn, xcols, yrows, threshold=0.125):
    """Scanline approximate transform — GDALApproxTransform semantics
    (``alg/gdaltransformer.cpp`` GDALApproxTransformInternal): per
    scanline segment, transform start/middle/end exactly; if the L1
    midpoint error (|Δx|+|Δy|) of linear interpolation between the
    endpoints is within ``threshold`` (in the chain's OUTPUT units,
    i.e. source pixels for warp), interpolate the whole segment, else
    subdivide around the middle; segments of ≤5 points always use the
    exact transform.  (Deviation from the reference: both halves reuse
    the exact midpoint as a shared endpoint instead of re-transforming
    mid−1 — one fewer exact point, same error control.)

    Vectorized ACROSS rows: every recursion level issues one batched
    ``chain_fn`` call for all still-subdividing rows.  ``xcols``/
    ``yrows`` are the per-column input x and per-row input y (unrotated
    destination grids).  Returns (sx, sy) of shape (h, w).
    """
    xcols = np.asarray(xcols, dtype=np.float64)
    yrows = np.asarray(yrows, dtype=np.float64)
    h, w = len(yrows), len(xcols)
    sx = np.empty((h, w))
    sy = np.empty((h, w))

    def exact_fill(rows, lo, hi):
        X = np.broadcast_to(xcols[lo:hi + 1], (len(rows), hi - lo + 1))
        Y = np.broadcast_to(yrows[rows][:, None],
                            (len(rows), hi - lo + 1))
        tx, ty = chain_fn(X, Y)
        sx[rows, lo:hi + 1] = tx
        sy[rows, lo:hi + 1] = ty

    def solve(rows, lo, hi, lox, loy, hix, hiy):
        npts = hi - lo + 1
        if npts <= 5:
            exact_fill(rows, lo, hi)
            return
        mid = lo + (npts - 1) // 2
        mx, my = chain_fn(np.full(len(rows), xcols[mid]), yrows[rows])
        t = (xcols[mid] - xcols[lo]) / (xcols[hi] - xcols[lo])
        err = (np.abs(lox + (hix - lox) * t - mx)
               + np.abs(loy + (hiy - loy) * t - my))
        ok = err <= threshold          # NaN → subdivide → exact
        if ok.any():
            r = rows[ok]
            tt = ((xcols[lo:hi + 1] - xcols[lo])
                  / (xcols[hi] - xcols[lo]))[None, :]
            sx[r[:, None], np.arange(lo, hi + 1)[None, :]] = \
                lox[ok][:, None] + (hix - lox)[ok][:, None] * tt
            sy[r[:, None], np.arange(lo, hi + 1)[None, :]] = \
                loy[ok][:, None] + (hiy - loy)[ok][:, None] * tt
        bad = ~ok
        if bad.any():
            rb = rows[bad]
            solve(rb, lo, mid, lox[bad], loy[bad], mx[bad], my[bad])
            solve(rb, mid, hi, mx[bad], my[bad], hix[bad], hiy[bad])

    rows = np.arange(h)
    if w <= 5:
        exact_fill(rows, 0, w - 1)
        return sx, sy
    lox, loy = chain_fn(np.full(h, xcols[0]), yrows)
    hix, hiy = chain_fn(np.full(h, xcols[-1]), yrows)
    solve(rows, 0, w - 1, lox, loy, hix, hiy)
    return sx, sy


def project_grid(tf, inv_src_gt, dst_gt, dst_w, dst_h,
                 approx_error=APPROX_ERROR_DEFAULT):
    """Destination pixel centers → source pixel coordinates.

    Runs the approx scanline path (0.125 src px default, like gdalwarp)
    when the destination grid is unrotated; ``approx_error=0`` forces
    the exact per-pixel transform.  Identity CRS pairs skip the approx
    machinery entirely — the dst→src map is a pure affine composition
    there and the exact path is already the cheapest."""
    if (approx_error > 0 and dst_gt[2] == 0 and dst_gt[4] == 0
            and dst_w >= 8 and tf.src != tf.dst):
        xcols = dst_gt[0] + (np.arange(dst_w) + 0.5) * dst_gt[1]
        yrows = dst_gt[3] + (np.arange(dst_h) + 0.5) * dst_gt[5]

        def chain(x, y):
            wx, wy = tf.transform(x, y)
            return affine.apply_gt(inv_src_gt, wx, wy)

        return approx_project_rows(chain, xcols, yrows, approx_error)
    X, Y = affine.pixel_centers(dst_gt, dst_w, dst_h)
    sx_w, sy_w = tf.transform(X, Y)
    return affine.apply_gt(inv_src_gt, sx_w, sy_w)


def suggest_output_grid(gt, w, h, src_crs, dst_crs, densify=21):
    """(dst_gt, dst_w, dst_h) preserving approximate source pixel count."""
    tf = Transformer(src_crs, dst_crs)
    xmin, ymin, xmax, ymax = tf.transform_extent(
        *affine.gt_extent(gt, w, h), densify=densify)
    # preserve pixel count, keep square-ish pixels in dst units
    aspect = (xmax - xmin) / max(ymax - ymin, 1e-12)
    dst_w = max(int(round(np.sqrt(w * h * aspect))), 1)
    dst_h = max(int(round(w * h / max(dst_w, 1))), 1)
    dst_gt = (xmin, (xmax - xmin) / dst_w, 0.0, ymax, 0.0,
              -(ymax - ymin) / dst_h)
    return dst_gt, dst_w, dst_h


def warp_array(src_band, src_gt, src_crs, dst_gt, dst_w, dst_h, dst_crs,
               resample="bilinear", nodata=None, transformer=None,
               acc_dtype=np.float64, approx_error=None):
    """Warp one band onto an explicit destination grid.

    Returns (values (dst_h, dst_w), valid bool).  ``transformer``
    (dst→src) may be supplied from actor state to skip construction;
    ``acc_dtype=float32`` halves kernel memory traffic when float64
    accumulation precision isn't needed (uint8 payloads).
    ``approx_error`` enables the GDALApproxTransform scanline fast path
    (default: gdalwarp's 0.125 source px; pass 0 for exact per-pixel).
    """
    tf = transformer or Transformer(dst_crs, src_crs)
    inv = affine.invert_gt(src_gt)
    if approx_error is None:
        approx_error = APPROX_ERROR_DEFAULT
    sx, sy = project_grid(tf, inv, dst_gt, dst_w, dst_h, approx_error)
    return resample_grid(src_band, sx, sy, resample, nodata=nodata,
                         acc_dtype=acc_dtype)


class GroundControlChain:
    """dst-geo → src-pixel adapter that drives any fitted GCP-family
    transformer (polynomial / TPS / homography / RPC / geoloc array,
    all exposing ``inverse(geo_x, geo_y) → (pixel, line)``) through the
    warp — the reference's ``gdalwarp -order n / -tps / -rpc /
    -geoloc`` modes, where GDALGenImgProjTransformer swaps the GCP
    transformer in for the CRS hop (``alg/gdaltransformer.cpp``).

    Use with ``warp_array(..., src_gt=(0, 1, 0, 0, 0, 1),
    transformer=GroundControlChain(fitted))``: the identity src_gt
    makes the chain's pixel output the final source coordinate.  The
    distinct ``src``/``dst`` tags keep ``project_grid``'s
    GDALApproxTransform scanline fast path engaged."""

    src = "gcp-geo"
    dst = "gcp-pixel"

    def __init__(self, fitted):
        self._fitted = fitted

    def transform(self, x, y):
        return self._fitted.inverse(np.asarray(x, dtype=np.float64),
                                    np.asarray(y, dtype=np.float64))


def warp_with_gcp(src_band, fitted, dst_gt, dst_w, dst_h,
                  resample="bilinear", nodata=None, approx_error=None):
    """Warp one band onto a destination geo grid through a fitted
    GCP-family transformer (pixel→geo fit; its ``inverse`` maps the
    destination grid back to source pixels)."""
    return warp_array(src_band, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "pixel",
                      dst_gt, dst_w, dst_h, "geo", resample,
                      nodata=nodata, transformer=GroundControlChain(fitted),
                      approx_error=approx_error)


class _TransformerCache:
    def __init__(self):
        self._cache = {}

    def get(self, src, dst):
        key = (str(src), str(dst))
        if key not in self._cache:
            self._cache[key] = Transformer(src, dst)
        return self._cache[key]


class WarpImages:
    """Actor stage: decode + warp every image row to ``dst_crs``.

    Emits one row per image with the warped grid's fingerprint (dims,
    valid fraction, per-band means, GDAL-parity checksum of band 0) and
    the carried ``caption`` (byte-equality invariant).  Use
    ``keep_pixels=True`` to also emit the warped band-0 pixels (uint8
    PNG-encoded) for golden comparisons.
    """

    def __init__(self, dst_crs=3857, resample="bilinear", keep_pixels=False,
                 cutline=None):
        self.dst_crs = dst_crs
        self.resample = resample
        self.keep_pixels = keep_pixels
        # world-coordinate cutline rings (gdalwarp -cutline, hard mask):
        # applied as SOURCE validity before resampling, so cut taps drop
        # out of the kernel weights exactly like the reference's unified
        # source mask (GDALWarpCutlineMasker feeding pafUnifiedSrcDensity)
        self.cutline = ([np.asarray(r, dtype=np.float64) for r in cutline]
                        if cutline is not None else None)
        self.tfs = _TransformerCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        gt_col = _flatten_gt(batch)
        out = {k: [] for k in ("image_id", "caption", "dst_w", "dst_h",
                               "valid_frac", "mean_r", "mean_g", "mean_b",
                               "checksum_b0")}
        if self.keep_pixels:
            out["warped_png"] = []
        bytes_col = batch["bytes"]
        for i in range(n):
            px = decode(bytes_col[i].as_py())
            if px.ndim == 2:
                px = px[:, :, None].repeat(3, axis=2)
            gt = tuple(gt_col[i])
            src_crs = batch["crs"][i].as_py()
            h, w = px.shape[:2]
            dst_gt, dw, dh = suggest_output_grid(gt, w, h, src_crs,
                                                 self.dst_crs)
            tf = self.tfs.get(self.dst_crs, src_crs)
            nodata = None
            if self.cutline is not None:
                inv = affine.invert_gt(gt)
                rings_px = []
                for r in self.cutline:
                    cx, cy = affine.apply_gt(inv, r[:, 0], r[:, 1])
                    rings_px.append(np.stack([cx, cy], axis=1))
                cmask = cutline_density_mask(rings_px, w, h)
                px = px.astype(np.float64, copy=True)
                px[cmask == 0] = -1.0      # sentinel outside the cutline
                nodata = -1.0
            # one transform + one multi-band gather per image
            vals, valid = warp_array(px, gt, src_crs, dst_gt, dw, dh,
                                     self.dst_crs, self.resample,
                                     transformer=tf, nodata=nodata)
            bands = [vals[:, :, b] for b in range(3)]
            b0 = copy_words_cast(np.where(valid, bands[0], 0.0), np.uint8)
            out["image_id"].append(batch["image_id"][i].as_py())
            out["caption"].append(batch["caption"][i].as_py())
            out["dst_w"].append(dw)
            out["dst_h"].append(dh)
            out["valid_frac"].append(float(valid.mean()))
            for name, band in zip(("mean_r", "mean_g", "mean_b"), bands):
                sel = band[valid]
                out[name].append(float(sel.mean()) if sel.size else 0.0)
            out["checksum_b0"].append(checksum(b0))
            if self.keep_pixels:
                out["warped_png"].append(encode_png(b0))
        schema_overrides = {"dst_w": pa.int32(), "dst_h": pa.int32(),
                            "checksum_b0": pa.int32()}
        arrays, names = [], []
        for k, v in out.items():
            names.append(k)
            if k == "warped_png":
                arrays.append(pa.array(v, pa.binary()))
            else:
                arrays.append(pa.array(v, schema_overrides.get(k)))
        return pa.Table.from_arrays(arrays, names=names)


class WarpKernelsFanout:
    """Actor stage: decode each image ONCE, warp it through several
    resampling kernels, emit one (image_id, kernel, checksum_b0) row per
    kernel.

    The fused pass replaces one Dataset execution per kernel (which
    re-reads, re-decodes and re-spins an actor pool per kernel — 5×
    the decode work and 5× the pool latency for identical output).
    """

    def __init__(self, dst_crs=3857,
                 kernels=("near", "bilinear", "cubic", "cubicspline",
                          "lanczos")):
        self.dst_crs = dst_crs
        self.kernels = tuple(kernels)
        self.tfs = _TransformerCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        gt_col = _flatten_gt(batch)
        ids, kn, cks = [], [], []
        bytes_col = batch["bytes"]
        for i in range(batch.num_rows):
            px = decode(bytes_col[i].as_py())
            if px.ndim == 2:
                px = px[:, :, None].repeat(3, axis=2)
            gt = tuple(gt_col[i])
            src_crs = batch["crs"][i].as_py()
            h, w = px.shape[:2]
            dst_gt, dw, dh = suggest_output_grid(gt, w, h, src_crs,
                                                 self.dst_crs)
            tf = self.tfs.get(self.dst_crs, src_crs)
            img_id = batch["image_id"][i].as_py()
            # the dst→src coordinate grid is kernel-independent: compute
            # the projected source-pixel coordinates once (approx
            # scanline path), then run each resampling kernel over the
            # same (sx, sy) lattice
            sx, sy = project_grid(tf, affine.invert_gt(gt),
                                  dst_gt, dw, dh)
            band0 = px[:, :, 0]
            for kernel in self.kernels:
                vals, valid = resample_grid(band0, sx, sy, kernel)
                b0 = copy_words_cast(np.where(valid, vals, 0.0),
                                     np.uint8)
                ids.append(img_id)
                kn.append(kernel)
                cks.append(checksum(b0))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "kernel": pa.array(kn, pa.string()),
            "checksum_b0": pa.array(cks, pa.int64())})


class FlagshipActor:
    """Fused headline stage: decode → warp → tile-cover → zone-join, one
    pass over the image bytes.

    This is the scalable shape of the flagship pipeline: the heavy table
    (binary ``bytes``) is read and decoded exactly once; everything the
    downstream aggregations need leaves as *small* per-image columns
    (stats + covered-cell list + joined-zone list), so the only shuffles
    are over (cell, n) / (zone_id) rows.  The actor holds the transformer
    cache and the broadcast ``ZoneIndex`` (``ray.put`` once, fetched in
    ``__init__``).
    """

    def __init__(self, zones_ref, z=10, dst_crs=3857, resample="bilinear"):
        if _norm_crs(dst_crs) != 3857:
            raise ValueError(
                "FlagshipActor tile cover uses the WebMercatorQuad matrix; "
                "dst_crs must be EPSG:3857")
        self.index = SpatialJoinZones._resolve(zones_ref)
        self.z = z
        self.tm = cells.web_mercator_quad(z)
        self.dst_crs = dst_crs
        self.resample = resample
        self.tfs = _TransformerCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        gt_col = _flatten_gt(batch)
        ids = batch["image_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        crss = batch["crs"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out = {k: [] for k in ("image_id", "caption", "dst_w", "dst_h",
                               "valid_frac", "checksum_b0", "cells",
                               "zones")}
        bb = {k: [] for k in ("x0", "y0", "x1", "y1")}
        for i in range(n):
            px = decode(blobs[i])
            if px.ndim == 2:
                px = px[:, :, None].repeat(3, axis=2)
            gt = tuple(gt_col[i])
            src_crs = crss[i]
            h, w = px.shape[:2]
            dst_gt, dw, dh = suggest_output_grid(gt, w, h, src_crs,
                                                 self.dst_crs)
            tf = self.tfs.get(self.dst_crs, src_crs)
            if self.resample == "bilinear":
                # throughput path: approx scanline transform (gdalwarp
                # -et 0.125 default) + specialized uint8 bilinear gather
                sxp, syp = project_grid(tf, affine.invert_gt(gt),
                                        dst_gt, dw, dh)
                vals, valid = bilinear_sample_fast(px, sxp, syp)
            else:
                vals, valid = warp_array(px, gt, src_crs, dst_gt, dw, dh,
                                         self.dst_crs, self.resample,
                                         transformer=tf)
            b0 = copy_words_cast(
                np.where(valid, vals[:, :, 0], 0.0), np.uint8)
            # tile cover at z from the warped grid's extent (EPSG:3857)
            xmin = dst_gt[0]
            ymax = dst_gt[3]
            xmax = xmin + dst_gt[1] * dw
            ymin = ymax + dst_gt[5] * dh
            tx0, ty0, tx1, ty1 = (int(v) for v in cells.tile_indices(
                self.tm, xmin, ymin, xmax, ymax))
            cov = [int(cells.pack_cell(self.z, tx, ty))
                   for ty in range(ty0, ty1 + 1)
                   for tx in range(tx0, tx1 + 1)]
            # zone join on the lon/lat footprint bbox (same 9-point edge
            # sampling as ops.footprint.add_footprint, for parity)
            tf_ll = self.tfs.get(src_crs, 4326)
            pts = footprint_corners(np.asarray(gt)[None, :],
                                    np.array([w]), np.array([h]))[0]
            lxs, lys = tf_ll.transform(pts[:, 0], pts[:, 1])
            lx0, ly0, lx1, ly1 = (lxs.min(), lys.min(),
                                  lxs.max(), lys.max())
            bb["x0"].append(lx0)
            bb["y0"].append(ly0)
            bb["x1"].append(lx1)
            bb["y1"].append(ly1)
            out["image_id"].append(ids[i])
            out["caption"].append(caps[i])
            out["dst_w"].append(dw)
            out["dst_h"].append(dh)
            out["valid_frac"].append(float(valid.mean()))
            out["checksum_b0"].append(checksum(b0))
            out["cells"].append(cov)
        # zone join for the whole batch at once (vectorized candidate
        # generation + per-zone batched rect×polygon predicate)
        bx0 = np.asarray(bb["x0"])
        by0 = np.asarray(bb["y0"])
        bx1 = np.asarray(bb["x1"])
        by1 = np.asarray(bb["y1"])
        rows, zns = self.index.candidate_pairs_for_bboxes(bx0, by0, bx1,
                                                          by1)
        zones_per_img = [[] for _ in range(len(bx0))]
        if len(rows):
            keep = np.zeros(len(rows), dtype=bool)
            order = np.argsort(zns, kind="stable")
            zs = zns[order]
            bounds = np.flatnonzero(np.diff(zs)) + 1
            for grp in np.split(order, bounds):
                zi = int(zns[grp[0]])
                rr = rows[grp]
                keep[grp] = self.index.rects_intersect_zone(
                    zi, bx0[rr], by0[rr], bx1[rr], by1[rr])
            for r, z in zip(rows[keep], zns[keep]):
                zones_per_img[r].append(str(self.index.ids[z]))
        out["zones"] = zones_per_img
        return pa.Table.from_pydict({
            "image_id": pa.array(out["image_id"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "dst_w": pa.array(out["dst_w"], pa.int32()),
            "dst_h": pa.array(out["dst_h"], pa.int32()),
            "valid_frac": pa.array(out["valid_frac"], pa.float64()),
            "checksum_b0": pa.array(out["checksum_b0"], pa.int32()),
            "cells": pa.array(out["cells"], pa.list_(pa.int64())),
            "zones": pa.array(out["zones"], pa.list_(pa.string()))})


class WarpToTiles:
    """Actor stage: warp each image into every z-level tile it covers.

    Input rows need image bytes + gt + crs.  For each covered
    (z, tile_x, tile_y) the image is warped onto that tile's 256² grid
    (WebMercatorQuad); emits rows
    ``(cell, z, tile_x, tile_y, image_id, tile_rgb, tile_mask)`` with
    raw uint8 payloads, ready for the mosaic/compose groupby
    (multiple images per tile ⇒ ``groupby("cell").map_groups``).
    """

    def __init__(self, z, resample="bilinear", tile_size=256):
        self.z = z
        self.tm = cells.web_mercator_quad(z, tile_size)
        self.tile_size = tile_size
        self.resample = resample
        self.tfs = _TransformerCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = self.tile_size
        rows = {k: [] for k in ("cell", "z", "tile_x", "tile_y", "image_id",
                                "tile_rgb", "tile_mask")}
        n = batch.num_rows
        gt_col = _flatten_gt(batch)
        for i in range(n):
            src_crs = batch["crs"][i].as_py()
            gt = tuple(gt_col[i])
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            tf_fwd = self.tfs.get(src_crs, 3857)
            ext = tf_fwd.transform_extent(*affine.gt_extent(gt, w, h))
            tx0, ty0, tx1, ty1 = (int(v) for v in cells.tile_indices(
                self.tm, *ext))
            px = None
            tf_inv = self.tfs.get(3857, src_crs)
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    if px is None:
                        px = decode(batch["bytes"][i].as_py())
                        if px.ndim == 2:
                            px = px[:, :, None].repeat(3, axis=2)
                        px = px[:, :, :3]  # tile consumers are RGB-only
                    tile_gt = self.tm.tile_gt(tx, ty)
                    vals, valid = warp_array(px, gt, src_crs, tile_gt,
                                             ts, ts, 3857, self.resample,
                                             transformer=tf_inv)
                    if not valid.any():
                        continue
                    rgb = copy_words_cast(
                        np.where(valid[:, :, None], vals, 0.0), np.uint8)
                    rows["cell"].append(int(cells.pack_cell(self.z, tx, ty)))
                    rows["z"].append(self.z)
                    rows["tile_x"].append(tx)
                    rows["tile_y"].append(ty)
                    rows["image_id"].append(batch["image_id"][i].as_py())
                    rows["tile_rgb"].append(rgb.tobytes())
                    rows["tile_mask"].append(
                        np.packbits(valid.astype(np.uint8)).tobytes())
        return pa.Table.from_pydict({
            "cell": pa.array(rows["cell"], pa.int64()),
            "z": pa.array(rows["z"], pa.int32()),
            "tile_x": pa.array(rows["tile_x"], pa.int64()),
            "tile_y": pa.array(rows["tile_y"], pa.int64()),
            "image_id": pa.array(rows["image_id"], pa.string()),
            "tile_rgb": pa.array(rows["tile_rgb"], pa.binary()),
            "tile_mask": pa.array(rows["tile_mask"], pa.binary()),
        })
