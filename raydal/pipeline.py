"""Composable pipeline steps — the engine's analogue of the reference's
unified-CLI step registry.

The reference registers raster steps (``apps/gdalalg_raster_pipeline.cpp:
346-370``) and vector steps (``apps/gdalalg_vector_pipeline.cpp:292-309``)
as named, composable ``RunStep`` objects; ``gdal pipeline`` chains them.
Here a :class:`Step` is ``(Dataset, **params) -> Dataset``; a pipeline is
an ordered list applied left to right.  Ray Data's lazy plan plays the
VRT role (``frmts/vrt`` — the un-executed chain IS the virtual dataset),
so composing steps costs nothing until a sink consumes the stream.

The registry exposes the stages that operate dataset→dataset; geometry
kernels and actor classes remain directly importable for advanced use.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

__all__ = ["Step", "STEP_REGISTRY", "register_step", "run_pipeline",
           "pipeline_to_json", "pipeline_from_json", "save_pipeline",
           "load_pipeline", "SOURCE_REGISTRY", "SINK_REGISTRY",
           "register_source", "register_sink", "open_source",
           "write_sink"]


@dataclass
class Step:
    name: str
    fn: Callable
    params: dict = field(default_factory=dict)

    def __call__(self, ds):
        return self.fn(ds, **self.params)


STEP_REGISTRY: dict[str, Callable] = {}


def register_step(name):
    def deco(fn):
        STEP_REGISTRY[name] = fn
        return fn
    return deco


def run_pipeline(ds, steps):
    """Apply steps — each a Step, a (name, params) pair, or a name."""
    for s in steps:
        if isinstance(s, Step):
            ds = s(ds)
        elif isinstance(s, tuple):
            ds = STEP_REGISTRY[s[0]](ds, **(s[1] or {}))
        else:
            ds = STEP_REGISTRY[s](ds)
    return ds


# ---------------------------------------------------------------------------
# built-in steps (names follow the reference's CLI verbs)


@register_step("footprint")
def _footprint(ds, dst_crs=3857):
    from .ops.footprint import add_footprint

    return ds.map_batches(lambda t: add_footprint(t, dst_crs=dst_crs),
                          batch_format="pyarrow")


@register_step("tile-assign")
def _assign(ds, z=10, carry_cols=("image_id",)):
    from .ops.footprint import assign_tiles

    return ds.map_batches(
        lambda t: assign_tiles(t, z=z, carry_cols=carry_cols),
        batch_format="pyarrow")


@register_step("vector-reproject")
def _vreproject(ds, src_crs, dst_crs, wkb_col="wkb", concurrency=2):
    from .ops.vector import VectorReproject

    return ds.map_batches(VectorReproject,
                          fn_constructor_kwargs={"src_crs": src_crs,
                                                 "dst_crs": dst_crs,
                                                 "wkb_col": wkb_col},
                          batch_format="pyarrow", concurrency=concurrency)


@register_step("explode-collections")
def _explode(ds, wkb_col="wkb"):
    from .ops.vector import explode_batch

    return ds.map_batches(lambda t: explode_batch(t, wkb_col=wkb_col),
                          batch_format="pyarrow")


@register_step("geom-stats")
def _geom_stats(ds, wkb_col="wkb"):
    from .ops.vector import geometry_stats_batch

    return ds.map_batches(lambda t: geometry_stats_batch(t, wkb_col),
                          batch_format="pyarrow")


@register_step("warp")
def _warp(ds, dst_crs=3857, resample="bilinear", concurrency=4,
          batch_size=32, cutline=None):
    from .ops.warp import WarpImages

    return ds.map_batches(WarpImages,
                          fn_constructor_kwargs={"dst_crs": dst_crs,
                                                 "resample": resample,
                                                 "cutline": cutline},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


# the reference CLI names this verb "reproject"; keep both spellings
STEP_REGISTRY["raster-reproject"] = _warp


@register_step("georeference-gcps")
def _georeference_gcps(ds, gcps=None, order=None, method="polynomial",
                       approx_ok=True, rpc=None, rpc_height=0.0,
                       rpc_height_scale=1.0, dem=None, dem_geotransform=None,
                       dem_interpolation="bilinear", dem_missing_value=None):
    """Attach/replace each row's geotransform from GCPs (the
    `gdal_translate -gcp` + GCPsToGeoTransform shape when
    method='affine'; 'polynomial'/'tps'/'homography' fit the
    respective transformer and store its affine approximation of the
    image extent for downstream north-up steps).  ``method='rpc'``
    takes RPC00B metadata (``rpc=``) plus the RPC_HEIGHT /
    RPC_HEIGHT_SCALE / RPC_DEM option equivalents (``dem`` = elevation
    array + ``dem_geotransform``, reference ``alg/gdal_rpc.cpp``).

    ``gcps``: list of (pixel, line, geox, geoy) applied to every row.
    """
    import numpy as np
    import pyarrow as pa

    from .geo.gcp import (GCPHomographyTransformer,
                          GCPPolynomialTransformer, RPCDem, RPCTransformer,
                          TPSTransformer, gcps_to_geotransform)

    if method == "rpc":
        if rpc is None:
            raise ValueError("georeference-gcps method='rpc' requires rpc=")
        dem_obj = None
        if dem is not None:
            if dem_geotransform is None:
                raise ValueError("dem requires dem_geotransform")
            dem_obj = RPCDem(dem, dem_geotransform,
                             interpolation=dem_interpolation,
                             missing_value=dem_missing_value)
        tf = RPCTransformer(rpc, height=rpc_height,
                            height_scale=rpc_height_scale, dem=dem_obj)
        probe = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]
        fitted = [(cx, cy, *[float(v) for v in
                             (lambda r: (r[0][0], r[1][0]))(
                                 tf.transform(np.array([cx]),
                                              np.array([cy])))])
                  for cx, cy in probe]
        gt = gcps_to_geotransform(fitted)
    elif gcps is None:
        raise ValueError("georeference-gcps requires gcps")
    elif method == "affine":
        gt = gcps_to_geotransform(gcps, approx_ok=approx_ok)
        if gt is None:
            raise ValueError("GCPs do not admit an affine fit")
    else:
        tf = {"polynomial": lambda: GCPPolynomialTransformer(
                  gcps, order=order or 1),
              "tps": lambda: TPSTransformer(gcps),
              "homography": lambda: GCPHomographyTransformer(gcps),
              }[method]()
        # affine approximation through three fitted points (exact for
        # order-1; the general transformer itself is available via
        # raydal.geo.gcp for warp_array use)
        probe = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]
        fitted = [(cx, cy, *[float(v) for v in
                             (lambda r: (r[0][0], r[1][0]))(
                                 tf.transform([cx], [cy]))])
                  for cx, cy in probe]
        gt = gcps_to_geotransform(fitted)

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        col = pa.array([list(gt)] * n,
                       pa.list_(pa.float64(), 6))
        if "gt" in t.schema.names:
            t = t.drop_columns(["gt"])
        return t.append_column("gt", col)

    return ds.map_batches(fn, batch_format="pyarrow")


@register_step("text-quality")
def _quality(ds, col="text"):
    from .ops.text import quality_score_batch, token_count_batch

    return (ds.map_batches(lambda t: token_count_batch(t, col),
                           batch_format="pyarrow")
              .map_batches(lambda t: quality_score_batch(t, col),
                           batch_format="pyarrow"))


@register_step("lang-id")
def _langid(ds, concurrency=2):
    from .ops.text import LangId

    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=concurrency)


@register_step("exact-dedup")
def _dedup(ds, col="text", id_col="doc_id"):
    from .ops.dedup import exact_dedup

    return exact_dedup(ds, col=col, id_col=id_col)


# ---------------------------------------------------------------------------
# saved-pipeline (de)serialization — the GDALG analogue

FORMAT_TYPE = "raydal_pipeline"
FORMAT_VERSION = 2


def pipeline_to_json(steps):
    """Serialize a pipeline to the engine's saved-pipeline JSON.

    The reference's ``.gdalg`` files are JSON
    ``{"type": "gdal_streamed_alg", "command_line": ..., "gdal_version":
    ...}`` (``gcore/gdalalgorithm.cpp:4370-4378``); here the declarative
    step list replaces the command line.  Steps may be Step objects,
    (name, params) pairs, or bare names — params must be JSON-encodable.
    """
    import json

    out = []
    for s in steps:
        if isinstance(s, Step):
            out.append({"name": s.name, "params": s.params})
        elif isinstance(s, tuple):
            out.append({"name": s[0], "params": dict(s[1] or {})})
        else:
            out.append({"name": s, "params": {}})
    for entry in out:
        if entry["name"] not in STEP_REGISTRY:
            raise ValueError(f"unknown step {entry['name']!r}")
    return json.dumps({"type": FORMAT_TYPE, "version": FORMAT_VERSION,
                       "steps": out})


def pipeline_from_json(text):
    """Parse saved-pipeline JSON → list of (name, params) pairs, each
    validated against the step registry (unknown steps error at LOAD
    time, not at run time — same contract as the reference's GDALG
    instantiation)."""
    import json

    doc = json.loads(text)
    if doc.get("type") != FORMAT_TYPE:
        raise ValueError(f"not a {FORMAT_TYPE} document")
    steps = []
    for entry in doc["steps"]:
        name = entry["name"]
        if name not in STEP_REGISTRY:
            raise ValueError(f"unknown step {name!r}")
        steps.append((name, dict(entry.get("params") or {})))
    return steps


def save_pipeline(path, steps):
    with open(path, "w") as f:
        f.write(pipeline_to_json(steps))


def load_pipeline(path):
    with open(path) as f:
        return pipeline_from_json(f.read())


@register_step("raster-clip")
def _raster_clip(ds, xmin, ymin, xmax, ymax):
    """gdal_translate -projwin analogue over the image table: crop each
    image's pixels to the world-bbox intersection (src CRS), update
    w/h/gt, drop images entirely outside.  Decode → slice → re-encode
    per batch (apps/gdalalg_raster_clip.cpp semantics)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .geo.affine import invert_gt, apply_gt

    def clip(t: pa.Table) -> pa.Table:
        keep_rows = []
        blobs, ws, hs, gts = [], [], [], []
        for i in range(t.num_rows):
            gt = tuple(t["gt"][i].as_py())
            w = t["w"][i].as_py()
            h = t["h"][i].as_py()
            inv = invert_gt(gt)
            # projwin corners → pixel window (north-up gt assumed)
            c0, r0 = apply_gt(inv, np.array([xmin]), np.array([ymax]))
            c1, r1 = apply_gt(inv, np.array([xmax]), np.array([ymin]))
            x0 = max(int(np.floor(min(c0[0], c1[0]))), 0)
            x1 = min(int(np.ceil(max(c0[0], c1[0]))), w)
            y0 = max(int(np.floor(min(r0[0], r1[0]))), 0)
            y1 = min(int(np.ceil(max(r0[0], r1[0]))), h)
            if x1 <= x0 or y1 <= y0:
                continue
            px = decode(t["bytes"][i].as_py())
            sub = px[y0:y1, x0:x1]
            ngt = (gt[0] + x0 * gt[1] + y0 * gt[2], gt[1], gt[2],
                   gt[3] + x0 * gt[4] + y0 * gt[5], gt[4], gt[5])
            keep_rows.append(i)
            blobs.append(encode(sub, t["fmt"][i].as_py()))
            ws.append(x1 - x0)
            hs.append(y1 - y0)
            gts.append(list(ngt))
        out = t.take(pa.array(keep_rows, pa.int64()))
        for name, arr in (("bytes", pa.array(blobs, pa.binary())),
                          ("w", pa.array(ws, pa.int32())),
                          ("h", pa.array(hs, pa.int32())),
                          ("gt", pa.array(gts, pa.list_(pa.float64(), 6)))):
            idx = out.schema.get_field_index(name)
            out = out.set_column(idx, name, arr)
        return out

    return ds.map_batches(clip, batch_format="pyarrow")


@register_step("raster-select")
def _raster_select(ds, bands):
    """gdal_translate -b analogue: keep the listed (1-based) bands of
    each image, re-encoded (single band → grayscale payload)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode

    def select(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            if px.ndim == 2:
                px = px[:, :, None]
            sel = px[:, :, [b - 1 for b in bands]]
            if sel.shape[2] == 1:
                sel = sel[:, :, 0]
            elif sel.shape[2] == 2:
                raise NotImplementedError(
                    "raster-select: 2-band output has no codec "
                    "representation (gray or RGB only)")
            blobs.append(encode(np.ascontiguousarray(sel),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(select, batch_format="pyarrow")


def _per_image_band_step(fn, out_dtype=None):
    """Factory: lift an ``array → array`` kernel over band 1 of every
    image row (decode → kernel → GDALCopyWords cast → re-encode)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .kernels.resample import copy_words_cast

    def one(band, gt, dt):
        out = np.asarray(fn(band, gt), dtype=np.float64)
        if np.dtype(dt).kind == "f":
            return out.astype(dt)
        return copy_words_cast(out, np.dtype(dt))

    def step(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            gt = (tuple(t["gt"][i].as_py())
                  if "gt" in t.column_names else None)
            dt = out_dtype or px.dtype
            if np.dtype(dt) != np.uint8:
                raise NotImplementedError(
                    "image-table payloads are 8-bit PNG/JPEG; for other "
                    "working dtypes use the kernels directly "
                    "(ops/raster_math.set_type) on TIFF-backed pixels")
            if px.ndim == 3:           # every band, like the reference
                out = np.stack([one(px[:, :, b], gt, dt)
                                for b in range(px.shape[2])], axis=2)
            else:
                out = one(px, gt, dt)
            blobs.append(encode(out, t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return step


@register_step("raster-scale")
def _raster_scale(ds, scale=1.0, offset=0.0, exponent=None):
    """gdal raster scale analogue: dst = src*scale + offset, with an
    optional power applied afterwards (gdal_translate applies -exponent
    to the normalized source range; here the exponent acts on the
    already-scaled value — document-divergence kept simple since the
    engine exposes arbitrary expressions via raster-calc)."""
    def fn(band, gt):
        out = band.astype("float64") * scale + offset
        if exponent is not None:
            out = out ** exponent
        return out

    return ds.map_batches(_per_image_band_step(fn),
                          batch_format="pyarrow")


@register_step("raster-set-type")
def _raster_set_type(ds, dtype):
    """gdal raster set-type analogue: GDALCopyWords floor(x+0.5)/clamp
    cast of every band.  The encoded image table carries 8-bit payloads,
    so only ``uint8`` round-trips through this step; other working
    dtypes raise with a pointer at the library-level kernel."""
    return ds.map_batches(
        _per_image_band_step(lambda band, gt: band, out_dtype=dtype),
        batch_format="pyarrow")


@register_step("raster-reclassify")
def _raster_reclassify(ds, table=None, default=None, mapping=None):
    """gdal raster reclassify analogue.  ``mapping`` takes the
    reference's DSL string ("165 = 120; (0, 100] = 140; DEFAULT = 160",
    ``frmts/vrt/vrtreclassifier.cpp`` grammar incl. open/closed bounds,
    -inf/inf, PASS_THROUGH, # comments); ``table`` takes a dict of
    scalar or (lo, hi) inclusive-range keys."""
    from .ops.raster_math import (apply_reclassify_rules,
                                  parse_reclassify_mapping, reclassify)

    if mapping is not None:
        # parse ONCE at plan time; workers close over the rule list
        rules, default = parse_reclassify_mapping(mapping)
        for lo, hi, li, hi_inc, tgt in rules:
            if tgt != "PASS_THROUGH" and not (
                    0 <= tgt <= 255 and float(tgt).is_integer()):
                raise ValueError(
                    f"target {tgt!r} not representable in the 8-bit "
                    "payload (the reference errors the same way: "
                    "vrtreclassifier GDALIsValueExactAs)")
        return ds.map_batches(
            _per_image_band_step(
                lambda band, gt: apply_reclassify_rules(band, rules,
                                                        default)),
            batch_format="pyarrow")
    if table is None:
        raise ValueError("raster-reclassify needs 'table' or 'mapping'")
    # JSON-decoded scalar keys arrive as strings; (lo, hi) range keys
    # pass through to the kernel untouched
    tbl = {}
    for k, v in dict(table).items():
        if isinstance(k, (tuple, list)):
            tbl[tuple(float(x) for x in k)] = v
        else:
            tbl[float(k)] = v

    return ds.map_batches(
        _per_image_band_step(
            lambda band, gt: reclassify(band, tbl, default=default)),
        batch_format="pyarrow")


@register_step("raster-hillshade")
def _raster_hillshade(ds, z_factor=1.0, azimuth=315.0, altitude=45.0,
                      alg="horn"):
    """gdal raster hillshade analogue on the published-checksum-validated
    ``hillshade_gdal`` kernel (n43.tif parity); Byte output like the
    reference."""
    from .ops.raster_math import hillshade_gdal

    def fn(band, gt):
        g = gt if gt else (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        return hillshade_gdal(band.astype("float64"), g,
                              z_factor=z_factor, azimuth=azimuth,
                              altitude=altitude, alg=alg)

    return ds.map_batches(_per_image_band_step(fn, out_dtype="uint8"),
                          batch_format="pyarrow")


def _dem_step(kernel_name, needs_gt=False):
    """Factory for the gdaldem-family verbs over band 1, on the
    PUBLISHED-CHECKSUM-VALIDATED ``*_gdal`` kernels (n43.tif parity,
    ops/raster_math.py).  Outputs are Float32 like the reference's
    gdaldem, carried as TIFF payloads (``fmt`` column becomes
    ``tiff``); step params pass straight through to the kernel."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops import raster_math as RM

    kern = getattr(RM, kernel_name)

    def factory(ds, **params):
        def run(t: pa.Table) -> pa.Table:
            blobs, fmts = [], []
            for i in range(t.num_rows):
                px = decode(t["bytes"][i].as_py())
                band = (px[:, :, 0] if px.ndim == 3
                        else px).astype(np.float64)
                if needs_gt:
                    gt = (tuple(t["gt"][i].as_py())
                          if "gt" in t.column_names
                          else (0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
                    out = kern(band, gt, **params)
                else:
                    out = kern(band, **params)
                blobs.append(encode(out.astype(np.float32), "tiff"))
                fmts.append("tiff")
            out_t = t.set_column(t.schema.get_field_index("bytes"),
                                 "bytes", pa.array(blobs, pa.binary()))
            if "fmt" in out_t.column_names:
                out_t = out_t.set_column(
                    out_t.schema.get_field_index("fmt"), "fmt",
                    pa.array(fmts, pa.string()))
            return out_t

        return ds.map_batches(run, batch_format="pyarrow")

    return factory


STEP_REGISTRY["raster-slope"] = _dem_step("slope_gdal", needs_gt=True)
STEP_REGISTRY["raster-aspect"] = _dem_step("aspect_gdal")
STEP_REGISTRY["raster-tpi"] = _dem_step("tpi_gdal")
STEP_REGISTRY["raster-tri"] = _dem_step("tri_gdal")
STEP_REGISTRY["raster-roughness"] = _dem_step("roughness_gdal")


@register_step("raster-color-map")
def _raster_color_map(ds, breakpoints):
    """gdal raster color-map / color-relief analogue: band 1 through the
    interpolated color ramp → RGB re-encode."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.color import color_relief

    bps = [(float(v), float(rgb[0]), float(rgb[1]), float(rgb[2]))
           for v, rgb in breakpoints]

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = px[:, :, 0] if px.ndim == 3 else px
            rgb = color_relief(band.astype(np.float64), bps)
            blobs.append(encode(rgb, t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-clean-collar")
def _raster_clean_collar(ds, threshold=15, color="black",
                         pixel_distance=2):
    """gdal raster clean-collar / nearblack analogue (per-band near
    criterion, published-checksum validated)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.raster_math import clean_collar

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            out, mask = clean_collar(px, threshold=threshold,
                                     color=color,
                                     pixel_distance=pixel_distance)
            blobs.append(encode(out, t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-contour")
def _raster_contour(ds, levels=(64.0, 128.0), interval=None, base=0.0,
                    exp_base=None):
    """gdal raster contour analogue: marching-squares iso-lines of each
    image's band 1 at the given levels, emitted as one LineString-WKB
    row per chained polyline in world coordinates (raster → vector
    dataset-shape change, like the reference's contour step).  When
    ``interval`` or ``exp_base`` is given, levels are generated per
    image from its own min/max (LEVEL_INTERVAL / LEVEL_BASE /
    LEVEL_EXP_BASE semantics, alg/marching_squares/level_generator.h)."""
    import numpy as np
    import pyarrow as pa

    from .geo.affine import apply_gt
    from .geo.wkb import linestring_wkb
    from .io.codecs import decode
    from .ops.contour import (chain_segments, contour_segments,
                              generate_levels)

    auto = interval is not None or exp_base is not None
    levels = None if auto else tuple(float(v) for v in levels)

    def run(t: pa.Table) -> pa.Table:
        if "image_id" not in t.column_names:
            raise ValueError("raster-contour needs an 'image_id' column")
        ids, lvl, wkbs = [], [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3
                    else px).astype(np.float64)
            gt = (tuple(t["gt"][i].as_py())
                  if "gt" in t.column_names else None)
            img_id = t["image_id"][i].as_py()
            lvls = (generate_levels(band.min(), band.max(),
                                    interval=interval, base=base,
                                    exp_base=exp_base)
                    if auto else levels)
            for level in lvls:
                segs = contour_segments(band, level)
                for line in chain_segments(segs):
                    pts = np.asarray(line, dtype=np.float64)
                    if gt is not None:
                        # contour coords are pixel CENTERS; the affine
                        # expects corner-based pixel coords (+0.5)
                        gx, gy = apply_gt(gt, pts[:, 0] + 0.5,
                                          pts[:, 1] + 0.5)
                        pts = np.stack([gx, gy], axis=1)
                    ids.append(img_id)
                    lvl.append(level)
                    wkbs.append(linestring_wkb(pts))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "level": pa.array(lvl, pa.float64()),
            "wkb": pa.array(wkbs, pa.binary())})

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-contour-polygons")
def _raster_contour_polygons(ds, levels=(64.0, 128.0), interval=None,
                             base=0.0, exp_base=None):
    """gdal raster contour POLYGONIZE analogue (`alg/contour.cpp:681`):
    band regions between consecutive levels of each image's band 1 →
    one Polygon-WKB row (outer + holes) per connected component, with
    the reference's ELEV_MIN/ELEV_MAX attributes (±inf for the open
    end bands)."""
    import numpy as np
    import pyarrow as pa

    from .geo.affine import apply_gt
    from .geo.wkb import polygon_wkb
    from .io.codecs import decode
    from .ops.contour import contour_polygons, generate_levels

    auto = interval is not None or exp_base is not None
    levels = None if auto else tuple(float(v) for v in levels)

    def run(t: pa.Table) -> pa.Table:
        if "image_id" not in t.column_names:
            raise ValueError(
                "raster-contour-polygons needs an 'image_id' column")
        ids, emin, emax, nholes, wkbs = [], [], [], [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3
                    else px).astype(np.float64)
            gt = (tuple(t["gt"][i].as_py())
                  if "gt" in t.column_names else None)
            img_id = t["image_id"][i].as_py()
            lvls = (generate_levels(band.min(), band.max(),
                                    interval=interval, base=base,
                                    exp_base=exp_base)
                    if auto else levels)
            for b in contour_polygons(band, lvls):
                for outer, holes in b["polys"]:
                    rings = [outer] + list(holes)
                    if gt is not None:
                        # polygon coords are pixel CENTERS; the affine
                        # expects corner-based pixel coords (+0.5)
                        rings = [np.stack(apply_gt(
                            gt, r[:, 0] + 0.5, r[:, 1] + 0.5), axis=1)
                            for r in rings]
                    ids.append(img_id)
                    emin.append(b["lo"])
                    emax.append(b["hi"])
                    nholes.append(len(holes))
                    wkbs.append(polygon_wkb(rings))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "elev_min": pa.array(emin, pa.float64()),
            "elev_max": pa.array(emax, pa.float64()),
            "n_holes": pa.array(nholes, pa.int64()),
            "wkb": pa.array(wkbs, pa.binary())})

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-polygonize")
def _raster_polygonize(ds, connectivity=4, background=None):
    """gdal raster polygonize analogue: per-image connected components
    of band 1 → one polygon row (world-coordinate outer ring WKB, DN
    value, pixel count) — published-fixture-validated kernels
    (ops/polygonize.py)."""
    import numpy as np
    import pyarrow as pa

    from .geo.wkb import polygon_wkb
    from .io.codecs import decode
    from .ops.polygonize import polygonize_array

    def run(t: pa.Table) -> pa.Table:
        if "image_id" not in t.column_names:
            raise ValueError(
                "raster-polygonize needs an 'image_id' column")
        ids, dn, npx, holes, wkbs = [], [], [], [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = px[:, :, 0] if px.ndim == 3 else px
            gt = (tuple(t["gt"][i].as_py())
                  if "gt" in t.column_names else None)
            img_id = t["image_id"][i].as_py()
            for p in polygonize_array(band, gt=gt,
                                      connectivity=connectivity,
                                      background=background):
                ids.append(img_id)
                dn.append(float(p["value"]))
                npx.append(int(p["n_pixels"]))
                holes.append(int(p["n_holes"]))
                wkbs.append(polygon_wkb([np.asarray(p["ring"])]))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "dn": pa.array(dn, pa.float64()),
            "n_pixels": pa.array(npx, pa.int64()),
            "n_holes": pa.array(holes, pa.int64()),
            "wkb": pa.array(wkbs, pa.binary())})

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-sieve")
def _raster_sieve(ds, threshold, connectivity=4):
    """gdal raster sieve analogue over the image table (band 1),
    GDALSieveFilter-exact semantics (published-checksum-validated in
    ops/fill.py)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.fill import sieve

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = px[:, :, 0] if px.ndim == 3 else px
            out = sieve(band, threshold, connectivity)
            blobs.append(encode(out.astype(band.dtype),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-proximity")
def _raster_proximity(ds, target_values=None, max_dist=None,
                      nodata=65535.0):
    """gdal raster proximity analogue: per-image distance-to-target
    raster (band 1) re-encoded as Byte distances — the same clamp a
    Byte destination gets in the reference (test_proximity_1 semantics:
    values and the nodata sentinel alike saturate at 255)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .kernels.resample import copy_words_cast
    from .ops.fill import proximity

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = px[:, :, 0] if px.ndim == 3 else px
            d = proximity(band, target_values=target_values,
                          max_dist=max_dist, nodata=nodata)
            blobs.append(encode(copy_words_cast(
                np.minimum(d, 255.0), np.uint8), t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-fill-nodata")
def _raster_fill_nodata(ds, nodata, max_dist=16, smoothing_iterations=0):
    """gdal raster fill-nodata analogue (alg/rasterfill.cpp semantics,
    published-grid validated) over band 1 of each image."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .kernels.resample import copy_words_cast
    from .ops.fill import fillnodata

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = px[:, :, 0] if px.ndim == 3 else px
            out = fillnodata(band.astype(np.float64), nodata=nodata,
                             max_dist=max_dist,
                             smoothing_iterations=smoothing_iterations)
            blobs.append(encode(copy_words_cast(out, band.dtype),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-calc")
def _raster_calc(ds, expr, dtype="uint8"):
    """gdal raster calc analogue: evaluate a band-algebra expression per
    image (variables ``b1``..``bn`` = bands) and re-encode the result as
    a single-band image with GDALCopyWords rounding.  The expression
    compiles ONCE at plan-build time; per-batch work is vectorized
    numpy (``apps/gdalalg_raster_calc.cpp`` semantics on the engine's
    image table)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .kernels.resample import copy_words_cast
    from .ops.calc import compile_expression

    fn = compile_expression(expr)
    np_dtype = np.dtype(dtype)

    def calc(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            if px.ndim == 2:
                px = px[:, :, None]
            env = {f"b{b + 1}": px[:, :, b] for b in range(px.shape[2])}
            out = copy_words_cast(fn(env), np_dtype)
            blobs.append(encode(out, t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(calc, batch_format="pyarrow")


@register_step("raster-resize")
def _raster_resize(ds, width, height, resample="bilinear"):
    """gdal raster resize analogue: resample each image to (width,
    height) with the RIO kernels (``gcore/rasterio.cpp`` read-time
    resampling semantics — pixel-center mapping, no CRS change), update
    w/h and the geotransform scale."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .kernels.resample import copy_words_cast, resample_grid

    def resize(t: pa.Table) -> pa.Table:
        blobs, ws, hs, gts = [], [], [], []
        sy, sx = np.mgrid[0:height, 0:width]
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            if px.ndim == 2:
                px = px[:, :, None]
            h, w = px.shape[:2]
            sxf = (sx + 0.5) * (w / float(width))
            syf = (sy + 0.5) * (h / float(height))
            bands = []
            for b in range(px.shape[2]):
                vals, ok = resample_grid(px[:, :, b].astype(np.float64),
                                         sxf, syf, resample,
                                         xscale=width / w,
                                         yscale=height / h)
                bands.append(copy_words_cast(vals, px.dtype))
            out = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
            blobs.append(encode(out, t["fmt"][i].as_py()))
            ws.append(width)
            hs.append(height)
            gt = tuple(t["gt"][i].as_py())
            # full affine rescale: column terms scale by w/width, row
            # terms by h/height (rotated geotransforms included)
            gts.append([gt[0], gt[1] * w / width, gt[2] * h / height,
                        gt[3], gt[4] * w / width, gt[5] * h / height])
        for name, arr in (("bytes", pa.array(blobs, pa.binary())),
                          ("w", pa.array(ws, pa.int32())),
                          ("h", pa.array(hs, pa.int32())),
                          ("gt", pa.array(gts, pa.list_(pa.float64(), 6)))):
            idx = t.schema.get_field_index(name)
            t = t.set_column(idx, name, arr)
        return t

    return ds.map_batches(resize, batch_format="pyarrow")


@register_step("raster-cutline")
def _raster_cutline(ds, rings, blend_dist=0.0, all_touched=False):
    """gdalwarp -cutline analogue over the image table: mask each image
    against a polygon given in WORLD coordinates of the image CRS.  The
    rings are mapped into each image's pixel space through the inverse
    geotransform (the reference stores the cutline in source pixel/line
    coordinates, ``alg/gdalwarper.h`` CUTLINE doc), rasterized even-odd,
    optionally blended by ``blend_dist`` source pixels
    (``alg/gdalcutline.cpp`` BlendMaskGenerator), and applied to every
    band with the GWKSetPixelValue INIT_DEST=0 composite."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .geo.affine import apply_gt, invert_gt
    from .ops.cutline import apply_cutline, cutline_density_mask

    rings = [np.asarray(r, dtype=np.float64) for r in rings]

    def cut(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            gt = tuple(t["gt"][i].as_py())
            inv = invert_gt(gt)
            rings_px = []
            for r in rings:
                cx, cy = apply_gt(inv, r[:, 0], r[:, 1])
                rings_px.append(np.stack([cx, cy], axis=1))
            h, w = px.shape[:2]
            mask = cutline_density_mask(rings_px, w, h,
                                        blend_dist=blend_dist,
                                        all_touched=all_touched)
            if px.ndim == 2:
                out = apply_cutline(px, mask)
            else:
                out = np.stack([apply_cutline(px[:, :, b], mask)
                                for b in range(px.shape[2])], axis=2)
            blobs.append(encode(out, t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(cut, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# datasource / datasink plug-in registry (the driver-registration
# analogue of GDALDriverManager::RegisterDriver, gcore/gdaldrivermanager)

SOURCE_REGISTRY: dict[str, Callable] = {}
SINK_REGISTRY: dict[str, Callable] = {}


def register_source(name):
    def deco(fn):
        SOURCE_REGISTRY[name] = fn
        return fn
    return deco


def register_sink(name):
    def deco(fn):
        SINK_REGISTRY[name] = fn
        return fn
    return deco


def open_source(name, *args, **kwargs):
    """Instantiate a registered datasource → ``ray.data.Dataset``."""
    if name not in SOURCE_REGISTRY:
        raise KeyError(f"unknown source {name!r}; registered: "
                       f"{sorted(SOURCE_REGISTRY)}")
    return SOURCE_REGISTRY[name](*args, **kwargs)


def write_sink(name, ds, *args, **kwargs):
    """Send a Dataset to a registered datasink."""
    if name not in SINK_REGISTRY:
        raise KeyError(f"unknown sink {name!r}; registered: "
                       f"{sorted(SINK_REGISTRY)}")
    return SINK_REGISTRY[name](ds, *args, **kwargs)


@register_source("parquet")
def _src_parquet(path, **kwargs):
    import ray.data

    return ray.data.read_parquet(path, **kwargs)


@register_source("images")
def _src_images(sf_dir, **kwargs):
    import ray.data

    from .pipelines import ensure_images_parquet

    return ray.data.read_parquet(ensure_images_parquet(sf_dir), **kwargs)


@register_source("shapefile")
def _src_shapefile(path, **kwargs):
    from .io.shapefile import read_shapefile_dataset

    return read_shapefile_dataset(path, **kwargs)


@register_sink("parquet")
def _sink_parquet(ds, path, **kwargs):
    return ds.write_parquet(path, **kwargs)


@register_sink("geoparquet")
def _sink_geoparquet(ds, path, wkb_col="wkb", crs=None, **kwargs):
    """GeoParquet v1.0.0 sink: every output file carries the spec
    'geo' footer (stamped per block in parallel — io/geoparquet.py),
    mirroring the reference's Parquet OGR driver
    (ogr/ogrsf_frmts/parquet/ogrparquetwriterdataset.cpp)."""
    from .io.geoparquet import write_geoparquet

    return write_geoparquet(ds, path, wkb_col=wkb_col, crs=crs,
                            **kwargs)


@register_sink("checkpointed-parquet")
def _sink_ckpt(ds, out_dir, part_col, fingerprint):
    from .lineage import checkpointed_write

    return checkpointed_write(ds, out_dir, part_col, fingerprint)


@register_sink("cog")
def _sink_cog(ds, out_dir, name_col="image_id", band_cols=("data",),
              w_col="w", h_col="h", blocksize=256, compression="deflate",
              dtype="uint8"):
    """Write each row's raster payload as a cloud-optimized GeoTIFF
    under ``out_dir/<name>.tif`` (tiled + internal NEAREST overviews,
    frmts/gtiff/cogdriver.cpp layout).  Rows carry flat band bytes of
    ``dtype`` in ``band_cols`` plus width/height columns; one file per
    row keeps the sink resumable (a re-run skips rows whose file
    already exists)."""
    import os

    import numpy as np

    from .io.tiff import write_cog

    band_dt = np.dtype(dtype)

    def write_batch(t):
        os.makedirs(out_dir, exist_ok=True)
        names = t[name_col].to_pylist()
        ws = t[w_col].to_pylist()
        hs = t[h_col].to_pylist()
        written = []
        for i, name in enumerate(names):
            path = os.path.join(out_dir, f"{name}.tif")
            if not os.path.exists(path):
                bands = [np.frombuffer(t[c][i].as_py(), dtype=band_dt)
                         .reshape(hs[i], ws[i]) for c in band_cols]
                with open(path, "wb") as f:
                    f.write(write_cog(bands, blocksize=blocksize,
                                      compression=compression))
            written.append(path)
        import pyarrow as pa

        return pa.Table.from_pydict({
            name_col: t[name_col],
            "path": pa.array(written, pa.string())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


@register_source("gpkg")
def _src_gpkg(path, layer=None, **kwargs):
    from .io.gpkg import read_gpkg_dataset

    return read_gpkg_dataset(path, layer=layer)


@register_source("gpkg-tiles")
def _src_gpkg_tiles(path, table=None, **kwargs):
    import ray.data

    from .io.gpkg import read_gpkg_tiles

    return ray.data.from_arrow(read_gpkg_tiles(path, table=table))


@register_source("geojson")
def _src_geojson(src, **kwargs):
    from .io.geojson import read_geojson_dataset

    return read_geojson_dataset(src, **kwargs)


@register_sink("geojson")
def _sink_geojson(ds, path, **kwargs):
    from .io.geojson import write_geojson

    # vector side-tables are bounded; the driver-side finish mirrors the
    # single-file contract of the format (heavy outputs stay parquet)
    import pyarrow as pa

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_geojson(pa.concat_tables(tables), path, **kwargs)


@register_sink("gpkg")
def _sink_gpkg(ds, path, **kwargs):
    import pyarrow as pa

    from .io.gpkg import write_gpkg_features

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_gpkg_features(pa.concat_tables(tables), path, **kwargs)


@register_source("flatgeobuf")
def _src_flatgeobuf(path, bbox=None, **kwargs):
    import ray.data

    from .io.flatgeobuf import read_flatgeobuf

    return ray.data.from_arrow(read_flatgeobuf(path, bbox=bbox))


@register_sink("flatgeobuf")
def _sink_flatgeobuf(ds, path, **kwargs):
    import pyarrow as pa

    from .io.flatgeobuf import write_flatgeobuf

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_flatgeobuf(pa.concat_tables(tables), path, **kwargs)


@register_sink("shapefile")
def _sink_shapefile(ds, path, **kwargs):
    import pyarrow as pa

    from .io.shapefile import write_shapefile

    # single-file format contract: bounded vector output, driver-side
    # finish (heavy outputs stay parquet)
    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_shapefile(pa.concat_tables(tables), path, **kwargs)


@register_source("csv")
def _src_csv(path, **kwargs):
    import ray.data

    from .io.csv import read_csv_features

    return ray.data.from_arrow(read_csv_features(path, **kwargs))


@register_sink("csv")
def _sink_csv(ds, path, **kwargs):
    import pyarrow as pa

    from .io.csv import write_csv_features

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_csv_features(pa.concat_tables(tables), path, **kwargs)


@register_source("mbtiles")
def _src_mbtiles(path, zoom_level=None, **kwargs):
    import ray.data

    from .io.mbtiles import read_mbtiles_tiles

    return ray.data.from_arrow(read_mbtiles_tiles(path,
                                                  zoom_level=zoom_level))


@register_sink("mbtiles")
def _sink_mbtiles(ds, path, metadata=None, xyz=True, **kwargs):
    from .io.mbtiles import write_mbtiles

    return write_mbtiles(path, ds, metadata=metadata, xyz=xyz)


@register_source("pmtiles")
def _src_pmtiles(path, zoom_level=None, layer=None,
                 max_tiles=1_000_000, **kwargs):
    """Tile-parallel PMTiles (MVT) read: the driver decodes ONLY the
    127-byte header + varint directories (tile ids — pure metadata);
    each worker preads and protobuf-decodes its own tiles, so no
    tile byte ever crosses the driver.  Fixed feature schema
    ``tile_z/tile_x/tile_y/layer/mvt_id/wkb/geom_type/tags`` with
    geometry in EPSG:3857 and attributes JSON-encoded in ``tags``
    (the per-archive attribute union is not knowable without reading
    every tile, and Ray blocks need a stable schema).

    Reference: ``ogr/ogrsf_frmts/pmtiles/ogrpmtilesdataset.cpp``
    (header/dir walk) + ``ogrmvtdataset.cpp`` (tile georeferencing).
    """
    import json as _json

    import pyarrow as pa
    import ray.data

    from .io.mvt import mvt_layer_tables
    from .io.pmtiles import PMTilesReader, tileid_to_zxy

    rd = PMTilesReader(path)
    if rd.tile_type != 1:
        raise NotImplementedError("only MVT pmtiles sources")
    z = rd.max_zoom if zoom_level is None else int(zoom_level)
    if rd.addressed_count(zoom=z) > max_tiles:
        raise ValueError(f"more than {max_tiles} tiles at zoom {z}; "
                         "pass a higher max_tiles or a zoom_level")
    items = [{"z": tz, "x": tx, "y": ty}
             for tz, tx, ty in (tileid_to_zxy(t)
                                for t in rd.tile_ids(zoom=z))]
    apath, want = str(path), layer

    def decode(batch: pa.Table) -> pa.Table:
        rdr = PMTilesReader(apath)          # header+dirs per task only
        cols = {k: [] for k in ("tile_z", "tile_x", "tile_y", "layer",
                                "mvt_id", "wkb", "geom_type", "tags")}
        for row in batch.to_pylist():
            tz, tx, ty = row["z"], row["x"], row["y"]
            buf = rdr.tile_bytes(tz, tx, ty)
            if not buf:
                continue
            for lname, t in mvt_layer_tables(buf, tz, tx, ty).items():
                if want is not None and lname != want:
                    continue
                attrs = [c for c in t.column_names
                         if c not in ("mvt_id", "wkb", "geom_type")]
                for i in range(t.num_rows):
                    cols["tile_z"].append(tz)
                    cols["tile_x"].append(tx)
                    cols["tile_y"].append(ty)
                    cols["layer"].append(lname)
                    cols["mvt_id"].append(t["mvt_id"][i].as_py())
                    cols["wkb"].append(t["wkb"][i].as_py())
                    cols["geom_type"].append(t["geom_type"][i].as_py())
                    cols["tags"].append(_json.dumps(
                        {a: t[a][i].as_py() for a in attrs},
                        sort_keys=True))
        return pa.table({
            "tile_z": pa.array(cols["tile_z"], pa.int32()),
            "tile_x": pa.array(cols["tile_x"], pa.int32()),
            "tile_y": pa.array(cols["tile_y"], pa.int32()),
            "layer": pa.array(cols["layer"], pa.string()),
            "mvt_id": pa.array(cols["mvt_id"], pa.int64()),
            "wkb": pa.array(cols["wkb"], pa.binary()),
            "geom_type": pa.array(cols["geom_type"], pa.string()),
            "tags": pa.array(cols["tags"], pa.string()),
        })

    return ray.data.from_items(items).map_batches(
        decode, batch_format="pyarrow", batch_size=64)


@register_sink("pmtiles")
def _sink_pmtiles(ds, path, metadata=None, bounds=None,
                  compress_tiles=True, **kwargs):
    """(z, x, y, tile) rows → PMTiles v3 archive (the mbtiles→pmtiles
    conversion path, ``ogrpmtilesfrommbtiles.cpp``)."""
    from .io.pmtiles import write_pmtiles_dataset

    return write_pmtiles_dataset(path, ds, metadata=metadata,
                                 bounds=bounds,
                                 compress_tiles=compress_tiles)


@register_source("kml")
def _src_kml(src, layer=None, **kwargs):
    """KML → Dataset of features; all layers concatenated with a
    ``layer`` column (pass ``layer=`` to select one)."""
    import pyarrow as pa
    import ray.data

    from .io.kml import read_kml

    parts = []
    for lname, t in read_kml(src):
        if layer is not None and lname != layer:
            continue
        parts.append(t.append_column(
            "layer", pa.array([lname] * t.num_rows, pa.string())))
    if not parts:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {"fid": pa.array([], pa.int64()),
             "Name": pa.array([], pa.string()),
             "description": pa.array([], pa.string()),
             "wkb": pa.array([], pa.binary()),
             "layer": pa.array([], pa.string())}))
    return ray.data.from_arrow(pa.concat_tables(parts))


@register_sink("kml")
def _sink_kml(ds, path, layer_col=None, **kwargs):
    import pyarrow as pa

    from .io.kml import write_kml

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    t = pa.concat_tables(tables)
    if layer_col and layer_col in t.column_names:
        names = t[layer_col].to_pylist()
        layers = [(n, t.filter(pa.compute.equal(t[layer_col], n)))
                  for n in sorted(set(names))]
        return write_kml(layers, path, **kwargs)
    return write_kml(t, path, **kwargs)


@register_source("gpx")
def _src_gpx(src, layer="waypoints", **kwargs):
    import ray.data

    from .io.gpx import read_gpx

    return ray.data.from_arrow(read_gpx(src)[layer])


@register_sink("gpx")
def _sink_gpx(ds, path, layer="waypoints", **kwargs):
    import pyarrow as pa

    from .io.gpx import write_gpx

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_gpx({layer: pa.concat_tables(tables)}, path)


def _raster_rows(paths, reader):
    """paths → Arrow table with one row per band: image_id, band,
    data (flat bytes), w, h, dtype, geotransform, nodata."""
    import os as _os

    import numpy as np
    import pyarrow as pa

    ids, bands, datas, ws, hs, dts, gts, nds = ([] for _ in range(8))
    if isinstance(paths, (str, bytes)):
        paths = [paths]
    for p in paths:
        arr, gt, nodata = reader(p)
        if arr.ndim == 2:
            arr = arr[None]
        for b in range(arr.shape[0]):
            ids.append(_os.path.splitext(_os.path.basename(str(p)))[0])
            bands.append(b + 1)
            a = np.ascontiguousarray(arr[b])
            datas.append(a.tobytes())
            hs.append(a.shape[0])
            ws.append(a.shape[1])
            dts.append(str(a.dtype))
            gts.append(list(gt) if gt is not None else None)
            nds.append(float(nodata) if nodata is not None else None)
    return pa.Table.from_pydict({
        "image_id": pa.array(ids, pa.string()),
        "band": pa.array(bands, pa.int32()),
        "data": pa.array(datas, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "dtype": pa.array(dts, pa.string()),
        "geotransform": pa.array(gts, pa.list_(pa.float64())),
        "nodata": pa.array(nds, pa.float64())})


@register_source("dted")
def _src_dted(paths, **kwargs):
    import ray.data

    from .io.dem import read_dted

    return ray.data.from_arrow(_raster_rows(paths, read_dted))


@register_source("hgt")
def _src_hgt(paths, **kwargs):
    import ray.data

    from .io.dem import read_hgt

    return ray.data.from_arrow(_raster_rows(paths, read_hgt))


@register_source("xyz")
def _src_xyz(paths, **kwargs):
    import ray.data

    from .io.xyz import read_xyz

    return ray.data.from_arrow(_raster_rows(paths, read_xyz))


@register_source("envi")
def _src_envi(paths, **kwargs):
    import ray.data

    from .io.envi import read_envi

    def rd(p):
        arr, gt, _hdr = read_envi(p)
        return arr, gt, None

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("ehdr")
def _src_ehdr(paths, **kwargs):
    import ray.data

    from .io.envi import read_ehdr

    return ray.data.from_arrow(_raster_rows(paths, read_ehdr))


def _per_row_raster_sink(writer_ext):
    """Build a resumable one-file-per-row sink over the _raster_rows
    schema (skips rows whose output already exists, like the cog
    sink)."""
    def sink(ds, out_dir, **kwargs):
        import os as _os

        import numpy as np
        import pyarrow as pa

        writer, ext = writer_ext()

        def write_batch(t):
            _os.makedirs(out_dir, exist_ok=True)
            out = []
            for i in range(t.num_rows):
                name = t["image_id"][i].as_py()
                path = _os.path.join(out_dir, f"{name}{ext}")
                if not _os.path.exists(path):
                    a = np.frombuffer(
                        t["data"][i].as_py(),
                        dtype=np.dtype(t["dtype"][i].as_py())).reshape(
                            t["h"][i].as_py(), t["w"][i].as_py())
                    gt = t["geotransform"][i].as_py()
                    writer(a, gt, path, **kwargs)
                out.append(path)
            return pa.Table.from_pydict({
                "image_id": t["image_id"],
                "path": pa.array(out, pa.string())})

        return ds.map_batches(write_batch, batch_format="pyarrow")
    return sink


def _xyz_writer():
    from .io.xyz import write_xyz

    def w(a, gt, path):
        write_xyz(a, gt, path)
    return w, ".xyz"


def _ehdr_writer():
    from .io.envi import write_ehdr

    def w(a, gt, path):
        write_ehdr(a[None], gt, hdr_path=path,
                   data_path=path[:-4] + ".bil")
    return w, ".hdr"


def _dted_writer():
    from .io.dem import write_dted

    def w(a, gt, path):
        x0, dx, _, y0, _, dy = gt
        lon0 = x0 + dx / 2
        lat0 = y0 + dy / 2 + (a.shape[0] - 1) * dy
        with open(path, "wb") as f:
            f.write(write_dted(a, lon0, lat0,
                               interval_arcsec=abs(dx) * 3600))
    return w, ".dt0"


SINK_REGISTRY["xyz"] = _per_row_raster_sink(_xyz_writer)
SINK_REGISTRY["ehdr"] = _per_row_raster_sink(_ehdr_writer)
SINK_REGISTRY["dted"] = _per_row_raster_sink(_dted_writer)


@register_source("gml")
def _src_gml(src, layer=None, **kwargs):
    """GML → Dataset of features; all layers concatenated with a
    ``layer`` column (pass ``layer=`` to select one)."""
    import pyarrow as pa
    import ray.data

    from .io.gml import read_gml

    parts = []
    for lname, t in read_gml(src):
        if layer is not None and lname != layer:
            continue
        parts.append(t.append_column(
            "layer", pa.array([lname] * t.num_rows, pa.string())))
    if not parts:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {"gml_id": pa.array([], pa.string()),
             "wkb": pa.array([], pa.binary()),
             "layer": pa.array([], pa.string())}))
    return ray.data.from_arrow(pa.concat_tables(parts, promote_options="permissive"))


@register_sink("gml")
def _sink_gml(ds, path, layer_col=None, **kwargs):
    import pyarrow as pa

    from .io.gml import write_gml

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    t = pa.concat_tables(tables)
    if layer_col and layer_col in t.column_names:
        names = t[layer_col].to_pylist()
        layers = [(n, t.filter(pa.compute.equal(t[layer_col], n))
                   .drop_columns([layer_col]))
                  for n in sorted(set(names))]
        return write_gml(layers, path, **kwargs)
    return write_gml(t, path, **kwargs)


@register_source("netcdf")
def _src_netcdf(paths, var=None, **kwargs):
    import ray.data

    from .io.netcdf import read_netcdf

    def rd(p):
        import numpy as np
        r = read_netcdf(p, var=var)
        return (np.stack(r["bands"]), r["geotransform"],
                r["nodata"])

    return ray.data.from_arrow(_raster_rows(paths, rd))


def _netcdf_writer():
    from .io.netcdf import write_netcdf

    def w(a, gt, path):
        write_netcdf(a, geotransform=gt, path=path)
    return w, ".nc"


SINK_REGISTRY["netcdf"] = _per_row_raster_sink(_netcdf_writer)


@register_source("zarr")
def _src_zarr(paths, array=None, **kwargs):
    """Classic-raster zarr open (whole array; one row per band)."""
    import ray.data

    from .io.zarr import read_zarr_raster

    return ray.data.from_arrow(_raster_rows(
        paths, lambda p: read_zarr_raster(p, array)))


@register_source("zarr-chunks")
def _src_zarr_chunks(paths, array=None, **kwargs):
    """Chunk-parallel zarr read: one Ray task per stored chunk.

    The driver only enumerates the chunk grid (metadata); each worker
    opens the store itself and decodes its own chunk files — at a
    100-TB store this is the unit of parallelism and no pixel byte
    ever crosses the driver.  Rows carry a per-chunk geotransform so
    downstream tile/warp stages treat each chunk as its own raster.
    """
    import os as _os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from .io.zarr import chunk_refs, open_zarr_array, zarr_georef

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    refs = []
    for p in paths:
        gt0, nd0 = zarr_georef(p, array)   # axis vars only, no pixels
        for r in chunk_refs(p, array):
            r["gt"] = list(gt0) if gt0 is not None else None
            r["nodata"] = nd0
            refs.append(r)

    def decode(batch: pa.Table) -> pa.Table:
        ids, bands, datas, ws, hs, dts, gts, nds = \
            ([] for _ in range(8))
        cache = {}
        for row in batch.to_pylist():
            key = (row["path"], row["array"])
            if key not in cache:
                cache[key] = open_zarr_array(*key)
            ar = cache[key]
            gt0, nd0 = row["gt"], row["nodata"]
            a = np.asarray(ar.read_chunk(tuple(row["chunk"])))
            win = row["window"]
            sel = tuple(slice(0, hi - lo) for lo, hi in win)
            a = np.ascontiguousarray(a[sel])
            if a.ndim == 1:
                a = a[None]
            while a.ndim > 2:
                a = a.reshape(-1, a.shape[-1])
            gt = None
            if gt0 is not None and len(win) >= 2:
                (r0, _), (c0, _) = win[-2], win[-1]
                gt = [gt0[0] + c0 * gt0[1], gt0[1], gt0[2],
                      gt0[3] + r0 * gt0[5], gt0[4], gt0[5]]
            cid = "_".join(str(i) for i in row["chunk"]) or "0"
            base = _os.path.splitext(
                _os.path.basename(str(row["path"]).rstrip("/")))[0]
            ids.append(f"{base}_c{cid}")
            bands.append(1)
            datas.append(a.tobytes())
            hs.append(a.shape[0])
            ws.append(a.shape[1])
            dts.append(str(a.dtype))
            gts.append(gt)
            nds.append(float(nd0) if nd0 is not None else None)
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "band": pa.array(bands, pa.int32()),
            "data": pa.array(datas, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "dtype": pa.array(dts, pa.string()),
            "geotransform": pa.array(gts, pa.list_(pa.float64())),
            "nodata": pa.array(nds, pa.float64())})

    return ray.data.from_items(refs).map_batches(
        decode, batch_format="pyarrow")


def _zarr_writer():
    from .io.zarr import write_zarr_classic

    def w(a, gt, path):
        write_zarr_classic(path, a, gt=gt)
    return w, ".zarr"


SINK_REGISTRY["zarr"] = _per_row_raster_sink(_zarr_writer)


@register_source("grib")
def _src_grib(paths, **kwargs):
    """GRIB1/GRIB2 → one row per field (band), per-band nodata and
    GRIB element/comment columns (the reference surfaces these as
    band metadata, ``gribdataset.cpp`` GRIB_ELEMENT/GRIB_COMMENT)."""
    import os as _os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from .io.grib import read_grib

    ids, bands, datas, hs, ws, dts, gts, nds = \
        [], [], [], [], [], [], [], []
    names, comments = [], []
    if isinstance(paths, (str, bytes)):
        paths = [paths]
    for p in paths:
        for i, b in enumerate(read_grib(p)):
            a = np.ascontiguousarray(b["data"])
            ids.append(_os.path.splitext(_os.path.basename(str(p)))[0])
            bands.append(i + 1)
            datas.append(a.tobytes())
            hs.append(a.shape[0])
            ws.append(a.shape[1])
            dts.append(str(a.dtype))
            gt = b["geotransform"]
            gts.append(list(gt) if gt is not None else None)
            nds.append(float(b["nodata"])
                       if b["nodata"] is not None else None)
            names.append(b["name"])
            comments.append(b["comment"])
    t = pa.Table.from_pydict({
        "image_id": pa.array(ids, pa.string()),
        "band": pa.array(bands, pa.int32()),
        "data": pa.array(datas, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "dtype": pa.array(dts, pa.string()),
        "geotransform": pa.array(gts, pa.list_(pa.float64())),
        "nodata": pa.array(nds, pa.float64()),
        "element": pa.array(names, pa.string()),
        "comment": pa.array(comments, pa.string())})
    return ray.data.from_arrow(t)


@register_source("pnm")
def _src_pnm(paths, **kwargs):
    import ray.data

    from .io.pnm import read_pnm

    return ray.data.from_arrow(_raster_rows(paths, read_pnm))


@register_source("gsbg")
def _src_gsbg(paths, **kwargs):
    import ray.data

    from .io.gsg import read_gsbg

    return ray.data.from_arrow(_raster_rows(paths, read_gsbg))


@register_source("gs7bg")
def _src_gs7bg(paths, **kwargs):
    import ray.data

    from .io.gsg import read_gs7bg

    return ray.data.from_arrow(_raster_rows(paths, read_gs7bg))


@register_source("lan")
def _src_lan(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_lan

    return ray.data.from_arrow(_raster_rows(paths, read_lan))


@register_source("paux")
def _src_paux(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_paux

    return ray.data.from_arrow(_raster_rows(paths, read_paux))


@register_source("byn")
def _src_byn(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_byn

    return ray.data.from_arrow(_raster_rows(paths, read_byn))


@register_source("kro")
def _src_kro(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_kro

    return ray.data.from_arrow(_raster_rows(paths, read_kro))


@register_source("terragen")
def _src_terragen(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_terragen

    def rd(p):
        arr, gt, _meta = read_terragen(p)
        return arr, gt, None

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("zmap")
def _src_zmap(paths, **kwargs):
    import ray.data

    from .io.zmap import read_zmap

    return ray.data.from_arrow(_raster_rows(paths, read_zmap))


def _pnm_writer():
    from .io.pnm import write_pnm

    def w(a, gt, path):
        write_pnm(a, path)
    return w, ".pgm"


def _gsbg_writer():
    from .io.gsg import write_gsbg

    def w(a, gt, path):
        write_gsbg(a, gt, path)
    return w, ".grd"


def _gs7bg_writer():
    from .io.gsg import write_gs7bg

    def w(a, gt, path):
        write_gs7bg(a, gt, path)
    return w, ".grd"


def _kro_writer():
    from .io.rawgrids import write_kro

    def w(a, gt, path):
        write_kro(a, path)
    return w, ".kro"


def _zmap_writer():
    from .io.zmap import write_zmap

    def w(a, gt, path):
        write_zmap(a, gt, path)
    return w, ".zmap"


SINK_REGISTRY["pnm"] = _per_row_raster_sink(_pnm_writer)
SINK_REGISTRY["gsbg"] = _per_row_raster_sink(_gsbg_writer)
SINK_REGISTRY["gs7bg"] = _per_row_raster_sink(_gs7bg_writer)
SINK_REGISTRY["kro"] = _per_row_raster_sink(_kro_writer)
SINK_REGISTRY["zmap"] = _per_row_raster_sink(_zmap_writer)


@register_source("gmt")
def _src_gmt(src, **kwargs):
    import ray.data

    from .io.gmt import read_gmt

    return ray.data.from_arrow(read_gmt(src))


@register_sink("gmt")
def _sink_gmt(ds, path, **kwargs):
    import pyarrow as pa

    from .io.gmt import write_gmt

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_gmt(pa.concat_tables(tables), path, **kwargs)


@register_source("geojsonseq")
def _src_geojsonseq(src, **kwargs):
    import ray.data

    from .io.geojson import read_geojson_seq

    return ray.data.from_arrow(read_geojson_seq(src, **kwargs))


@register_sink("geojsonseq")
def _sink_geojsonseq(ds, path, **kwargs):
    import pyarrow as pa

    from .io.geojson import write_geojson_seq

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_geojson_seq(pa.concat_tables(tables), path, **kwargs)


def _grib_writer():
    from .io.grib import write_grib2

    def w(a, gt, path):
        write_grib2(a, gt if gt is not None
                    else (0.0, 1e-4, 0.0, 0.0, 0.0, -1e-4), path=path)
    return w, ".grb2"


SINK_REGISTRY["grib"] = _per_row_raster_sink(_grib_writer)


@register_source("mif")
def _src_mif(src, **kwargs):
    import ray.data

    from .io.mif import read_mif

    return ray.data.from_arrow(read_mif(src))


@register_sink("mif")
def _sink_mif(ds, path, **kwargs):
    import pyarrow as pa

    from .io.mif import write_mif

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_mif(pa.concat_tables(tables), path, **kwargs)


@register_sink("pgdump")
def _sink_pgdump(ds, path, **kwargs):
    import pyarrow as pa

    from .io.pgdump import write_pgdump

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_pgdump(pa.concat_tables(tables), path, **kwargs)


@register_source("hf2")
def _src_hf2(paths, **kwargs):
    import ray.data

    from .io.hf2 import read_hf2

    return ray.data.from_arrow(_raster_rows(paths, read_hf2))


@register_source("leveller")
def _src_leveller(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_leveller

    def rd(p):
        arr, gt, _meta = read_leveller(p)
        return arr, gt, None

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("ace2")
def _src_ace2(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_ace2

    return ray.data.from_arrow(_raster_rows(paths, read_ace2))


def _hf2_writer():
    from .io.hf2 import write_hf2

    def w(a, gt, path):
        write_hf2(a, gt, path)
    return w, ".hf2"


SINK_REGISTRY["hf2"] = _per_row_raster_sink(_hf2_writer)


@register_source("usgsdem")
def _src_usgsdem(paths, **kwargs):
    import ray.data

    from .io.usgsdem import read_usgsdem

    return ray.data.from_arrow(_raster_rows(paths, read_usgsdem))


@register_source("gxf")
def _src_gxf(paths, **kwargs):
    import ray.data

    from .io.gxf import read_gxf

    return ray.data.from_arrow(_raster_rows(paths, read_gxf))


@register_source("gtx")
def _src_gtx(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_gtx

    return ray.data.from_arrow(_raster_rows(paths, read_gtx))


@register_source("ers")
def _src_ers(paths, **kwargs):
    import ray.data

    from .io.ers import read_ers

    def rd(p):
        arr, gt, nodata, _stats = read_ers(p)
        return arr, gt, nodata

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("pds")
def _src_pds(paths, **kwargs):
    import ray.data

    from .io.pds import read_pds

    def rd(p):
        arr, gt, nodata, _meta = read_pds(p, **kwargs)
        return arr, gt, nodata

    return ray.data.from_arrow(_raster_rows(paths, rd))


def _ers_writer():
    from .io.ers import write_ers

    def w(a, gt, path):
        write_ers(a[None] if a.ndim == 2 else a, gt, path)
    return w, ".ers"


SINK_REGISTRY["ers"] = _per_row_raster_sink(_ers_writer)


@register_source("bsb")
def _src_bsb(paths, **kwargs):
    import ray.data

    from .io.bsb import read_bsb

    def rd(p):
        arr, gt, nodata, _pal = read_bsb(p)
        return arr, gt, nodata

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("isis3")
def _src_isis3(paths, **kwargs):
    import ray.data

    from .io.isis import read_isis3

    def rd(p):
        arr, gt, nodata, _meta = read_isis3(p)
        return arr, gt, nodata

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("isis2")
def _src_isis2(paths, **kwargs):
    import ray.data

    from .io.isis import read_isis2

    def rd(p):
        arr, gt, nodata, _meta = read_isis2(p)
        return arr, gt, nodata

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_source("fits")
def _src_fits(paths, **kwargs):
    import ray.data

    from .io.fits import read_fits

    def rd(p):
        arr, gt, nodata, _meta = read_fits(p, **kwargs)
        return arr, gt, nodata

    return ray.data.from_arrow(_raster_rows(paths, rd))


def _fits_writer():
    from .io.fits import write_fits

    def w(a, gt, path):
        write_fits(a, path)
    return w, ".fits"


SINK_REGISTRY["fits"] = _per_row_raster_sink(_fits_writer)


@register_source("snodas")
def _src_snodas(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_snodas

    return ray.data.from_arrow(_raster_rows(paths, read_snodas))


@register_source("til")
def _src_til(paths, **kwargs):
    import ray.data

    from .io.til import read_til

    return ray.data.from_arrow(_raster_rows(paths, read_til))


@register_source("rmf")
def _src_rmf(paths, **kwargs):
    import ray.data

    from .io.rmf import read_rmf

    return ray.data.from_arrow(_raster_rows(paths, read_rmf))


@register_source("lcp")
def _src_lcp(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_lcp

    return ray.data.from_arrow(_raster_rows(paths, read_lcp))


@register_source("rst")
def _src_rst(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_rst

    return ray.data.from_arrow(_raster_rows(paths, read_rst))


@register_source("doq2")
def _src_doq2(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_doq2

    return ray.data.from_arrow(_raster_rows(
        paths, lambda p: read_doq2(p)[:2] + (None,)))


@register_source("ilwis")
def _src_ilwis(paths, **kwargs):
    import ray.data

    from .io.ilwis import read_ilwis

    return ray.data.from_arrow(_raster_rows(paths, read_ilwis))


@register_source("hfa")
def _src_hfa(paths, **kwargs):
    import ray.data

    from .io.hfa import read_hfa

    return ray.data.from_arrow(_raster_rows(paths, read_hfa))


@register_source("dxf")
def _src_dxf(paths, **kwargs):
    import pyarrow as pa
    import ray.data

    from .io.dxf import read_dxf

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    return ray.data.from_arrow(pa.concat_tables(
        [read_dxf(p) for p in paths]))


@register_source("saga")
def _src_saga(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_saga

    return ray.data.from_arrow(_raster_rows(paths, read_saga))


@register_source("ngsgeoid")
def _src_ngsgeoid(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_ngsgeoid

    return ray.data.from_arrow(_raster_rows(paths, read_ngsgeoid))


@register_source("loslas")
def _src_loslas(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_loslas

    return ray.data.from_arrow(_raster_rows(paths, read_loslas))


@register_source("ndf")
def _src_ndf(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_ndf

    return ray.data.from_arrow(_raster_rows(paths, read_ndf))


@register_source("eir")
def _src_eir(paths, **kwargs):
    import ray.data

    from .io.rawgrids import read_eir

    return ray.data.from_arrow(_raster_rows(paths, read_eir))


@register_source("sigdem")
def _src_sigdem(paths, **kwargs):
    import ray.data

    from .io.sigdem import read_sigdem

    return ray.data.from_arrow(_raster_rows(paths, read_sigdem))


@register_source("spatialite")
def _src_spatialite(paths, **kwargs):
    import pyarrow as pa
    import ray.data

    from .io.spatialite import read_spatialite

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    return ray.data.from_arrow(pa.concat_tables(
        [read_spatialite(p, **kwargs) for p in paths]))


@register_source("dgn")
def _src_dgn(paths, **kwargs):
    import pyarrow as pa
    import ray.data

    from .io.dgn import read_dgn

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    return ray.data.from_arrow(pa.concat_tables(
        [read_dgn(p) for p in paths]))


@register_source("nitf")
def _src_nitf(paths, image=0, **kwargs):
    import ray.data

    from .io.nitf import read_nitf

    return ray.data.from_arrow(_raster_rows(
        paths, lambda p: read_nitf(p, image=image)))


@register_source("vicar")
def _src_vicar(paths, **kwargs):
    import ray.data

    from .io.vicar import read_vicar

    return ray.data.from_arrow(_raster_rows(paths, read_vicar))


@register_source("rraster")
def _src_rraster(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_rraster

    return ray.data.from_arrow(_raster_rows(paths, read_rraster))


@register_source("isg")
def _src_isg(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_isg

    return ray.data.from_arrow(_raster_rows(paths, read_isg))


@register_source("jdem")
def _src_jdem(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_jdem

    return ray.data.from_arrow(_raster_rows(paths, read_jdem))


@register_source("gsc")
def _src_gsc(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_gsc

    return ray.data.from_arrow(_raster_rows(paths, read_gsc))


@register_source("noaa_b")
def _src_noaa_b(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_noaa_b

    return ray.data.from_arrow(_raster_rows(paths, read_noaa_b))


@register_source("ctg")
def _src_ctg(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_ctg

    return ray.data.from_arrow(_raster_rows(paths, read_ctg))


@register_source("mff")
def _src_mff(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_mff

    return ray.data.from_arrow(_raster_rows(paths, read_mff))


@register_source("roipac")
def _src_roipac(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_roipac

    return ray.data.from_arrow(_raster_rows(paths, read_roipac))


@register_source("isce")
def _src_isce(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_isce

    return ray.data.from_arrow(_raster_rows(paths, read_isce))


@register_source("ntv2")
def _src_ntv2(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_ntv2

    return ray.data.from_arrow(_raster_rows(paths, read_ntv2))


@register_source("genbin")
def _src_genbin(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_genbin

    return ray.data.from_arrow(_raster_rows(paths, read_genbin))


@register_source("esrijson")
def _src_esrijson(path, **kwargs):
    import ray.data

    from .io.esrijson import read_esrijson

    return ray.data.from_arrow(read_esrijson(path))


@register_source("jsonfg")
def _src_jsonfg(path, layer=None, **kwargs):
    import ray.data

    from .io.jsonfg import read_jsonfg

    layers = read_jsonfg(path)
    if layer is None:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("georss")
def _src_georss(path, **kwargs):
    import ray.data

    from .io.georss import read_georss

    return ray.data.from_arrow(read_georss(path))


@register_sink("georss")
def _sink_georss(ds, path, fmt="rss", **kwargs):
    import pyarrow as pa

    from .io.georss import write_georss

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_georss(pa.concat_tables(tables), path, fmt=fmt)


@register_source("jml")
def _src_jml(path, **kwargs):
    import ray.data

    from .io.jml import read_jml

    return ray.data.from_arrow(read_jml(path))


@register_sink("jml")
def _sink_jml(ds, path, **kwargs):
    import pyarrow as pa

    from .io.jml import write_jml

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_jml(pa.concat_tables(tables), path)


@register_source("xodr")
def _src_xodr(path, layer="ReferenceLine", eps=1.0, **kwargs):
    import ray.data

    from .io.xodr import read_xodr

    layers = read_xodr(path, eps=float(eps))
    if layer not in layers:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("vfk")
def _src_vfk(path, layer="PAR", **kwargs):
    import ray.data

    from .io.vfk import read_vfk

    layers = read_vfk(path)
    if layer not in layers:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("sosi")
def _src_sosi(path, layer=None, **kwargs):
    import ray.data

    from .io.sosi import read_sosi

    layers = read_sosi(path)
    if layer is None:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("selafin")
def _src_selafin(path, layer="nodes", time=0, **kwargs):
    import ray.data

    from .io.selafin import (read_selafin, selafin_elements_table,
                             selafin_nodes_table)

    sel = read_selafin(path)
    t = (selafin_elements_table(sel, time=int(time))
         if layer == "elements"
         else selafin_nodes_table(sel, time=int(time)))
    return ray.data.from_arrow(t)


@register_source("ceos")
def _src_ceos(paths, **kwargs):
    import ray.data

    from .io.ceos import read_ceos

    def reader(p):
        r = read_ceos(p)
        return r["data"], None, None

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("rl2")
def _src_rl2(paths, coverage=None, level=0, **kwargs):
    import ray.data

    from .io.rl2 import read_rl2

    def reader(p):
        r = read_rl2(p, coverage=coverage, level=int(level))
        return r["data"], r["geotransform"], None

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("lvbag")
def _src_lvbag(path, **kwargs):
    import ray.data

    from .io.lvbag import read_lvbag

    return ray.data.from_arrow(read_lvbag(path))


@register_source("miramon")
def _src_miramon(path, **kwargs):
    import ray.data

    from .io.miramon import read_miramon

    return ray.data.from_arrow(read_miramon(path))


@register_source("pds4")
def _src_pds4(paths, file_index=1, array_index=1, **kwargs):
    import ray.data

    from .io.pds4 import read_pds4

    def reader(p):
        r = read_pds4(p, int(file_index), int(array_index))
        return r["data"], r["geotransform"], r["nodata"]

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("avce00")
def _src_avce00(path, layer="ARC", **kwargs):
    import ray.data

    from .io.avc import read_e00

    layers = read_e00(path)
    if layer not in layers:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("avcbin")
def _src_avcbin(path, layer="ARC", **kwargs):
    import ray.data

    from .io.avc import read_avcbin

    layers = read_avcbin(path)
    if layer not in layers:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("mitab")
def _src_mitab(path, **kwargs):
    import ray.data

    from .io.mitab import read_tab

    return ray.data.from_arrow(read_tab(path))


@register_source("xls")
def _src_xls(path, sheet=None, headers=None, **kwargs):
    import ray.data

    from .io.xls import read_xls

    return ray.data.from_arrow(read_xls(path, sheet=sheet,
                                        headers=headers))


@register_source("esric")
def _src_esric(path, level=None, extent_source="TILING_SCHEME",
               **kwargs):
    import ray.data

    from .io.esric import (read_esric_conf, read_esric_level,
                           read_tpkx)

    if str(path).lower().endswith(".tpkx"):
        info = read_tpkx(path, extent_source=extent_source)
    else:
        info = read_esric_conf(path)
    if level is None:
        level = info["lods"][0][0]

    def reader(_):
        return read_esric_level(info, int(level)), \
            info["geotransform"], None

    return ray.data.from_arrow(_raster_rows([path], reader))


@register_source("sentinel2")
def _src_sentinel2(path, resolution="10m", epsg=None, **kwargs):
    import numpy as np
    import ray.data

    from .io.sentinel2 import (read_sentinel2_product,
                               read_sentinel2_subdataset)

    if epsg is None:
        prod = read_sentinel2_product(path)
        epsg = prod["granules"][0]["epsg"]
    s = read_sentinel2_subdataset(path, resolution, int(epsg))

    def reader(_):
        return s["data"], s["geotransform"], None

    return ray.data.from_arrow(_raster_rows([path], reader))


@register_source("safe")
def _src_safe(paths, **kwargs):
    import numpy as np
    import ray.data

    from .io.satproducts import read_safe

    def reader(p):
        s = read_safe(p)
        return np.stack(s["bands"]), None, None

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("rs2")
def _src_rs2(paths, calibration=None, **kwargs):
    import numpy as np
    import ray.data

    from .io.satproducts import read_rs2

    def reader(p):
        r = read_rs2(p, calibration=calibration)
        return np.stack(r["bands"]), None, None

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("rcm")
def _src_rcm(paths, calibration=None, **kwargs):
    import numpy as np
    import ray.data

    from .io.satproducts import read_rcm

    def reader(p):
        r = read_rcm(p, calibration=calibration)
        return np.stack(r["bands"]), None, None

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("prf")
def _src_prf(paths, **kwargs):
    import ray.data

    from .io.prf import read_prf

    def reader(p):
        r = read_prf(p)
        arr = r["data"]
        if arr.ndim == 3:                  # (h, w, c) → (c, h, w)
            arr = arr.transpose(2, 0, 1)
        return arr, r["geotransform"], r["nodata"]

    return ray.data.from_arrow(_raster_rows(paths, reader))


@register_source("idf")
def _src_idf(path, layer=None, **kwargs):
    import ray.data

    from .io.vdv import read_idf

    layers = read_idf(path)
    if layer is None:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("vdv")
def _src_vdv(path, layer=None, **kwargs):
    import ray.data

    from .io.vdv import read_vdv

    layers = read_vdv(path)
    if layer is None:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_source("gtfs")
def _src_gtfs(path, layer="stops", **kwargs):
    import ray.data

    from .io.gtfs import read_gtfs

    return ray.data.from_arrow(read_gtfs(path)[layer])


@register_source("mapml")
def _src_mapml(path, layer=None, **kwargs):
    import ray.data

    from .io.mapml import read_mapml

    layers = read_mapml(path)
    if layer is None:
        layer = next(iter(layers))
    return ray.data.from_arrow(layers[layer])


@register_sink("mapml")
def _sink_mapml(ds, path, layer="mapml", **kwargs):
    import pyarrow as pa

    from .io.mapml import write_mapml

    tables = [pa.Table.from_pandas(b) for b in
              ds.iter_batches(batch_format="pandas")]
    return write_mapml({layer: pa.concat_tables(tables)}, path)


@register_source("xlsx")
def _src_xlsx(path, sheet=None, headers=None, **kwargs):
    import ray.data

    from .io.xlsx import read_xlsx, xlsx_sheet_names

    if sheet is None:
        names = xlsx_sheet_names(path)
        sheet = names[0] if names else None
    return ray.data.from_arrow(read_xlsx(path, sheet=sheet,
                                         headers=headers))


@register_source("ods")
def _src_ods(path, sheet=None, headers=None, **kwargs):
    import ray.data

    from .io.ods import ods_sheet_names, read_ods

    if sheet is None:
        names = ods_sheet_names(path)
        sheet = names[0] if names else None
    return ray.data.from_arrow(read_ods(path, sheet=sheet,
                                        headers=headers))


@register_source("iris")
def _src_iris(paths, **kwargs):
    import ray.data

    from .io.iris import read_iris

    return ray.data.from_arrow(_raster_rows(paths, read_iris))


@register_source("mff2")
def _src_mff2(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_mff2

    return ray.data.from_arrow(_raster_rows(paths, read_mff2))


@register_source("srp")
def _src_srp(paths, **kwargs):
    import ray.data

    from .io.srp import read_srp

    return ray.data.from_arrow(_raster_rows(paths, read_srp))


@register_source("adrg")
def _src_adrg(paths, **kwargs):
    import ray.data

    from .io.adrg import read_adrg

    return ray.data.from_arrow(_raster_rows(paths, read_adrg))


@register_source("nwt_grd")
def _src_nwt_grd(paths, **kwargs):
    import ray.data

    from .io.nwt import read_nwt_grd

    return ray.data.from_arrow(_raster_rows(paths, read_nwt_grd))


@register_source("nwt_grc")
def _src_nwt_grc(paths, **kwargs):
    import ray.data

    from .io.nwt import read_nwt_grc

    return ray.data.from_arrow(_raster_rows(paths, read_nwt_grc))


@register_source("aig")
def _src_aig(paths, **kwargs):
    import ray.data

    from .io.aig import read_aig

    return ray.data.from_arrow(_raster_rows(paths, read_aig))


@register_source("pcraster")
def _src_pcraster(paths, **kwargs):
    import ray.data

    from .io.pcraster import read_pcraster

    return ray.data.from_arrow(_raster_rows(paths, read_pcraster))


@register_source("pcidsk")
def _src_pcidsk(paths, **kwargs):
    import ray.data

    from .io.pcidsk import read_pcidsk

    return ray.data.from_arrow(_raster_rows(paths, read_pcidsk))


@register_source("mrf")
def _src_mrf(paths, **kwargs):
    import ray.data

    from .io.mrf import read_mrf

    return ray.data.from_arrow(_raster_rows(paths, read_mrf))


@register_source("bag")
def _src_bag(paths, **kwargs):
    import ray.data

    from .io.bathy import read_bag

    return ray.data.from_arrow(_raster_rows(paths, read_bag))


@register_source("s102")
def _src_s102(paths, elevation=False, **kwargs):
    import ray.data

    from .io.bathy import read_s102

    return ray.data.from_arrow(_raster_rows(
        paths, lambda p: read_s102(p, elevation=elevation)))


@register_sink("pcraster")
def _sink_pcraster(ds, path, **kwargs):
    """Raster rows → CSF map(s): a ``.map`` path writes the single
    row, a directory gets ``<image_id>.map`` files."""
    import os as _os

    import numpy as np

    from .io.pcraster import write_pcraster

    single = str(path).lower().endswith(".map")
    if not single:
        _os.makedirs(path, exist_ok=True)
    written = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            arr = np.frombuffer(r["data"],
                                np.dtype(r["dtype"])).reshape(
                r["h"], r["w"])
            gt = tuple(r.get("geotransform") or (0, 1, 0, 0, 0, -1))
            dst = path if single else _os.path.join(
                path, f"{r['image_id']}.map")
            write_pcraster(arr, gt, dst, nodata=r.get("nodata"),
                           **kwargs)
            written.append(dst)
    return written


@register_source("nsidcbin")
def _src_nsidcbin(paths, **kwargs):
    import ray.data

    from .io.rawmisc import read_nsidcbin

    return ray.data.from_arrow(_raster_rows(paths, read_nsidcbin))


@register_source("grassascii")
def _src_grassascii(paths, **kwargs):
    import ray.data

    from .io.aaigrid import read_grassascii

    return ray.data.from_arrow(_raster_rows(paths, read_grassascii))


@register_source("cals")
def _src_cals(paths, **kwargs):
    import ray.data

    from .io.cals import read_cals

    return ray.data.from_arrow(_raster_rows(paths, read_cals))


@register_source("dds")
def _src_dds(paths, **kwargs):
    import ray.data

    from .io.dds import read_dds

    return ray.data.from_arrow(_raster_rows(paths, read_dds))


@register_source("vrt")
def _src_vrt(paths, **kwargs):
    import ray.data

    from .io.vrtxml import read_vrt

    return ray.data.from_arrow(_raster_rows(paths, read_vrt))


@register_source("dimap")
def _src_dimap(paths, **kwargs):
    import ray.data

    from .io.dimap import read_dimap

    return ray.data.from_arrow(_raster_rows(paths, read_dimap))


@register_sink("cals")
def _sink_cals(ds, path, **kwargs):
    """1-bit raster rows → CALS Type 1 file(s)
    (calsdataset.cpp CreateCopy semantics): a ``.cal`` path writes the
    single image, a directory gets one ``<image_id>.cal`` per row."""
    import os as _os

    import numpy as np

    from .io.cals import write_cals

    single = str(path).lower().endswith((".cal", ".cals"))
    if not single:
        _os.makedirs(path, exist_ok=True)
    written = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            arr = np.frombuffer(r["data"],
                                np.dtype(r["dtype"])).reshape(
                r["h"], r["w"])
            dst = path if single else _os.path.join(
                path, f"{r['image_id']}.cal")
            write_cals(arr, dst, **kwargs)
            written.append(dst)
    return written


@register_sink("dds")
def _sink_dds(ds, path, fmt="UNCOMPRESSED", **kwargs):
    """Band rows (grouped by image_id) → one DDS per image: a
    ``.dds`` path writes the single image, a directory gets
    ``<image_id>.dds`` files."""
    import os as _os
    from collections import defaultdict

    import numpy as np

    from .io.dds import write_dds

    groups = defaultdict(list)
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            arr = np.frombuffer(r["data"],
                                np.dtype(r["dtype"])).reshape(
                r["h"], r["w"])
            groups[r["image_id"]].append((r["band"], arr))
    single = str(path).lower().endswith(".dds")
    if not single:
        _os.makedirs(path, exist_ok=True)
    written = []
    for gid, rs in groups.items():
        rs.sort(key=lambda t: t[0])
        dst = path if single else _os.path.join(path, f"{gid}.dds")
        write_dds([a for _b, a in rs], dst, fmt=fmt)
        written.append(dst)
    return written


@register_source("tga")
def _src_tga(paths, **kwargs):
    import ray.data

    from .io.tga import read_tga

    return ray.data.from_arrow(_raster_rows(paths, read_tga))


@register_source("fast")
def _src_fast(paths, **kwargs):
    import ray.data

    from .io.fast import read_fast

    return ray.data.from_arrow(_raster_rows(paths, read_fast))


@register_source("jp2")
def _src_jp2(paths, **kwargs):
    """JPEG 2000 → one row per component band (from-scratch T.800
    decoder, raydal/io/jp2.py)."""
    import numpy as np
    import ray.data

    from .io.jp2 import decode_jp2

    def rd(p):
        with open(p, "rb") as f:
            comps = decode_jp2(f.read())
        return np.stack([np.asarray(c) for c in comps]), None, None

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_sink("jp2")
def _sink_jp2(ds, path, nlevels=3, **kwargs):
    """Raster rows → one lossless 5/3 .jp2 per image_id (bands of an
    image become components)."""
    import os as _os
    from collections import defaultdict

    import numpy as np

    from .io.jp2 import encode_jp2

    _os.makedirs(path, exist_ok=True)
    groups = defaultdict(list)
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            arr = np.frombuffer(row["data"],
                                np.dtype(row["dtype"])).reshape(
                row["h"], row["w"])
            groups[row["image_id"]].append((row["band"], arr))
    for image_id, bands in groups.items():
        bands.sort(key=lambda t: t[0])
        blob = encode_jp2([a for _b, a in bands], nlevels=nlevels)
        with open(_os.path.join(path, f"{image_id}.jp2"), "wb") as f:
            f.write(blob)
    return path


@register_source("hdf5")
def _src_hdf5(paths, dataset=None, **kwargs):
    """HDF5 → one row per (dataset, band); 2-D datasets one band,
    3-D datasets one band per leading index (the reference's
    HDF5Image semantics)."""
    import os as _os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from .io.hdf5 import HDF5File

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    tables = []
    for p in paths:
        f = HDF5File(p)
        names = [dataset] if dataset else [
            n for n, (shape, dt) in f.datasets().items()
            if len(shape) >= 2 and not np.dtype(dt).kind == "S"]
        for name in names:
            arr = np.asarray(f.read(name))
            # rank > 3 flattens its leading dims into the band axis so
            # every emitted row's data buffer is exactly h*w items
            arr = arr.reshape((-1,) + arr.shape[-2:])
            base = _os.path.splitext(_os.path.basename(str(p)))[0]
            for b in range(arr.shape[0]):
                a = np.ascontiguousarray(arr[b])
                tables.append({
                    "image_id": f"{base}:{name}",
                    "band": b + 1, "data": a.tobytes(),
                    "w": a.shape[1], "h": a.shape[0],
                    "dtype": str(a.dtype),
                    "geotransform": None, "nodata": None})
    return ray.data.from_items(tables)


@register_source("hdf4")
def _src_hdf4(paths, dataset=None, **kwargs):
    import os as _os

    import numpy as np
    import ray.data

    from .io.hdf4 import HDF4File

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    rows = []
    for p in paths:
        f = HDF4File(p)
        names = [dataset] if dataset else list(f.datasets())
        base = _os.path.splitext(_os.path.basename(str(p)))[0]
        for name in names:
            a = np.ascontiguousarray(f.read(name))
            if a.ndim < 2:
                if dataset is None:
                    continue      # skip coordinate/attribute SDSs
                raise ValueError(
                    f"SDS {name!r} is {a.ndim}-D; need >= 2 dims")
            # rank > 2: one band per flattened leading index, like the
            # HDF5 source above
            a = a.reshape((-1,) + a.shape[-2:])
            for b in range(a.shape[0]):
                band = np.ascontiguousarray(a[b])
                rows.append({
                    "image_id": f"{base}:{name}", "band": b + 1,
                    "data": band.tobytes(), "w": band.shape[1],
                    "h": band.shape[0], "dtype": str(band.dtype),
                    "geotransform": None, "nodata": None})
    return ray.data.from_items(rows)


@register_source("s57")
def _src_s57(path, layer=None, **kwargs):
    """S-57 ENC → feature rows of one layer (or all object-class
    layers concatenated with a ``layer`` column)."""
    import pyarrow as pa
    import ray.data

    from .io.s57 import S57File

    f = S57File(path)
    if layer is not None:
        return ray.data.from_arrow(f.layer_table(layer))
    tables = []
    for name in f.layer_names():
        if name == "DSID":
            continue
        t = f.layer_table(name)
        t = t.append_column("layer", pa.array([name] * t.num_rows,
                                              pa.string()))
        # keep the shared base schema; attributes differ per class
        tables.append(t.select([c for c in
                                ("RCID", "PRIM", "OBJL", "LNAM",
                                 "wkb", "layer")
                                if c in t.column_names]))
    return ray.data.from_arrow(pa.concat_tables(tables,
                                                promote_options="default"))


@register_source("filegdb")
def _src_filegdb(path, layer=None, **kwargs):
    import ray.data

    from .io.filegdb import FileGDB

    g = FileGDB(path)
    if layer is None:
        layer = g.layer_names()[0]
    return ray.data.from_arrow(g.layer_table(layer))


@register_sink("filegdb")
def _sink_filegdb(ds, path, layer="layer0", **kwargs):
    """Point-feature rows (wkb POINT + scalar attrs) → minimal .gdb."""
    import struct as _st

    from .io.filegdb import write_filegdb

    rows = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            wkb = row.pop("wkb", None)
            out = {}
            if wkb is not None:
                bo = "<" if wkb[0] == 1 else ">"
                gtype = _st.unpack(bo + "I", wkb[1:5])[0] & 0xFF
                if gtype != 1:
                    raise ValueError(
                        f"filegdb sink writes POINT features only, "
                        f"got wkb type {gtype}")
                x, y = _st.unpack(bo + "2d", wkb[5:21])
                out["SHAPE"] = (x, y)
            else:
                out["SHAPE"] = None
            for k, v in row.items():
                if isinstance(v, (int, float, str)) or v is None:
                    out[k] = v
            rows.append(out)
    write_filegdb(path, {layer: rows})
    return path


@register_source("gtiff")
def _src_gtiff(paths, ifd_index=0, **kwargs):
    """GeoTIFF/COG → raster rows through the from-scratch reader
    (raydal/io/tiff.py; frmts/gtiff parity — strips/tiles, LZW/Deflate/
    PackBits/JPEG, BigTIFF, overview IFDs via ``ifd_index``)."""
    import numpy as np
    import ray.data

    from .io.tiff import read_tiff

    def rd(p):
        with open(p, "rb") as f:
            img = read_tiff(f.read(), ifd_index=ifd_index)
        return (np.stack(img.bands), img.geotransform, img.nodata)

    return ray.data.from_arrow(_raster_rows(paths, rd))


@register_sink("gtiff")
def _sink_gtiff(ds, path, compression="none", **kwargs):
    """Raster rows → one classic GeoTIFF per image_id (bands written
    contig; north-up geotransform carried through)."""
    import os as _os
    from collections import defaultdict

    import numpy as np

    from .io.tiff import write_tiff

    _os.makedirs(path, exist_ok=True)
    groups = defaultdict(list)
    gts = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            arr = np.frombuffer(row["data"],
                                np.dtype(row["dtype"])).reshape(
                row["h"], row["w"])
            groups[row["image_id"]].append((row["band"], arr))
            gts[row["image_id"]] = row.get("geotransform")
    for image_id, bands in groups.items():
        bands.sort(key=lambda t: t[0])
        blob = write_tiff([a for _b, a in bands],
                          geotransform=gts[image_id],
                          compression=compression)
        with open(_os.path.join(path, f"{image_id}.tif"), "wb") as f:
            f.write(blob)
    return path


@register_step("encode-image")
def _encode_image(ds, fmt="png"):
    """Band rows (the format drivers' schema: image_id/band/data/w/h/
    dtype/geotransform) → the encoded image table the raster steps
    operate on (image_id/bytes/fmt/gt...).  Bands of one image_id are
    co-located by a groupby — the only shuffle in the adapter."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import encode

    def assemble(g: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(g["band"])
        g = g.take(order)
        bands = []
        for i in range(g.num_rows):
            a = np.frombuffer(g["data"][i].as_py(),
                              np.dtype(g["dtype"][i].as_py()))
            bands.append(a.reshape(g["h"][i].as_py(),
                                   g["w"][i].as_py()))
        px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
        # tiff payloads carry any dtype losslessly; only the 8-bit
        # codecs (png/jpeg/bmp/gif) need the uint8 quantization
        if px.dtype != np.uint8 and fmt != "tiff":
            px = np.clip(np.floor(px.astype(np.float64) + 0.5), 0,
                         255).astype(np.uint8)
        gt = g["geotransform"][0].as_py() if "geotransform" in \
            g.column_names else None
        return pa.Table.from_pydict({
            "image_id": pa.array([g["image_id"][0].as_py()],
                                 pa.string()),
            "bytes": pa.array([encode(px, fmt)], pa.binary()),
            "w": pa.array([px.shape[1]], pa.int32()),
            "h": pa.array([px.shape[0]], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "gt": pa.array([gt], pa.list_(pa.float64()))})

    return ds.groupby("image_id").map_groups(assemble,
                                             batch_format="pyarrow")


@register_step("decode-image")
def _decode_image(ds):
    """Encoded image table → band rows (inverse of encode-image); a
    stateless per-batch decode, no shuffle."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode

    def explode(t: pa.Table) -> pa.Table:
        rows = {"image_id": [], "band": [], "data": [], "w": [],
                "h": [], "dtype": [], "geotransform": [],
                "nodata": []}
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            if px.ndim == 2:
                px = px[:, :, None]
            gt = (t["gt"][i].as_py()
                  if "gt" in t.column_names else None)
            for b in range(px.shape[2]):
                a = np.ascontiguousarray(px[:, :, b])
                rows["image_id"].append(t["image_id"][i].as_py())
                rows["band"].append(b + 1)
                rows["data"].append(a.tobytes())
                rows["w"].append(a.shape[1])
                rows["h"].append(a.shape[0])
                rows["dtype"].append(str(a.dtype))
                rows["geotransform"].append(gt)
                rows["nodata"].append(None)
        return pa.Table.from_pydict({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "band": pa.array(rows["band"], pa.int32()),
            "data": pa.array(rows["data"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "dtype": pa.array(rows["dtype"], pa.string()),
            "geotransform": pa.array(rows["geotransform"],
                                     pa.list_(pa.float64())),
            "nodata": pa.array(rows["nodata"], pa.float64())})

    return ds.map_batches(explode, batch_format="pyarrow")


@register_step("style-explode")
def _style_explode(ds, col="style", id_col=None):
    """OGR feature-style strings → long-format parameter rows
    (ogr/ogrfeaturestyle.cpp grammar, raydal/ops/featurestyle.py)."""
    from .ops.featurestyle import explode_style_column

    return explode_style_column(ds, col=col, id_col=id_col)


@register_sink("kmlsuperoverlay")
def _sink_kmlsuperoverlay(ds, path, fmt="png", **kwargs):
    """Band rows → one KML superoverlay directory per image_id
    (frmts/kmlsuperoverlay CreateCopy semantics).

    Distributed: a ``groupby(image_id).map_groups`` co-locates each
    image's bands and writes that overlay INSIDE the worker — the
    driver only collects one summary row per image, so an arbitrarily
    large image table streams through without a driver-side loop."""
    import os as _os

    import numpy as np
    import pyarrow as pa

    from .io.kmlsuperoverlay import write_superoverlay

    def write_one(g: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(g["band"])
        g = g.take(order)
        bands = []
        for i in range(g.num_rows):
            bands.append(np.frombuffer(
                g["data"][i].as_py(),
                np.dtype(g["dtype"][i].as_py())).reshape(
                g["h"][i].as_py(), g["w"][i].as_py()))
        image_id = g["image_id"][0].as_py()
        gt = (g["geotransform"][0].as_py()
              if "geotransform" in g.column_names else None)
        nodata = (g["nodata"][0].as_py()
                  if "nodata" in g.column_names else None)
        if gt is None:
            gt = [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
        files = write_superoverlay(
            bands, gt, _os.path.join(path, image_id), fmt=fmt,
            name=image_id, nodata=nodata, **kwargs)
        return pa.Table.from_pydict({
            "image_id": pa.array([image_id], pa.string()),
            "n_files": pa.array([len(files)], pa.int64())})

    _os.makedirs(path, exist_ok=True)
    (ds.groupby("image_id")
       .map_groups(write_one, batch_format="pyarrow")
       .count())    # count() drives the streamed write to completion
    return path


@register_source("kmlsuperoverlay")
def _src_kmlsuperoverlay(paths, **kwargs):
    """Superoverlay directory or .kmz → raster rows (deepest zoom
    reassembled; KmlSuperOverlayReadDataset analogue)."""
    import numpy as np
    import ray.data

    from .io.kmlsuperoverlay import read_superoverlay

    def rd(p):
        bands, gt = read_superoverlay(p)
        return np.stack(bands), gt, None

    return ray.data.from_arrow(_raster_rows(paths, rd))


# ---------------------------------------------------------------------------
# round-5 final-session verb sweep: every remaining reference CLI verb
# whose kernel already ships gets a pipeline step, so the unified CLI
# reaches full `gdal raster|vector <verb>` parity (apps/gdalalg_*.cpp).


def _wkb_map_step(ds, fn, wkb_col="wkb"):
    """Lift a blob → blob geometry function over the wkb column."""
    import pyarrow as pa

    def run(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index(wkb_col)
        out = [fn(b) for b in t[wkb_col].to_pylist()]
        return t.set_column(idx, wkb_col, pa.array(out, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("vector-swap-xy")
def _vector_swap_xy(ds, wkb_col="wkb"):
    """gdal vector swap-xy (apps/gdalalg_vector_swap_xy.cpp)."""
    from .ops.vector import swap_xy

    return _wkb_map_step(ds, swap_xy, wkb_col)


@register_step("vector-segmentize")
def _vector_segmentize(ds, max_length, wkb_col="wkb"):
    """gdal vector segmentize (apps/gdalalg_vector_segmentize.cpp)."""
    from .ops.vector import segmentize_wkb

    ml = float(max_length)
    return _wkb_map_step(ds, lambda b: segmentize_wkb(b, ml), wkb_col)


@register_step("vector-simplify")
def _vector_simplify(ds, tolerance, wkb_col="wkb"):
    """gdal vector simplify (apps/gdalalg_vector_simplify.cpp,
    non-topology-preserving Douglas-Peucker)."""
    from .ops.vector import simplify_wkb

    tol = float(tolerance)
    return _wkb_map_step(ds, lambda b: simplify_wkb(b, tol), wkb_col)


@register_step("vector-make-valid")
def _vector_make_valid(ds, wkb_col="wkb"):
    """gdal vector make-valid (apps/gdalalg_vector_make_valid.cpp)."""
    from .ops.vector import make_valid_wkb

    return _wkb_map_step(ds, make_valid_wkb, wkb_col)


@register_step("vector-buffer")
def _vector_buffer(ds, distance, quad_segs=8, wkb_col="wkb"):
    """gdal vector buffer (apps/gdalalg_vector_buffer.cpp)."""
    from .ops.vector import buffer_wkb

    d, q = float(distance), int(quad_segs)
    return _wkb_map_step(ds, lambda b: buffer_wkb(b, d, quad_segs=q),
                         wkb_col)


@register_step("vector-select")
def _vector_select(ds, fields):
    """gdal vector select (apps/gdalalg_vector_select.cpp): keep the
    listed fields, in the listed order."""
    if isinstance(fields, str):
        fields = [f.strip() for f in fields.split(",") if f.strip()]
    return ds.select_columns(list(fields))


@register_step("vector-filter")
def _vector_filter(ds, bbox=None, where=None, wkb_col="wkb"):
    """gdal vector filter (apps/gdalalg_vector_filter.cpp): bbox
    intersection test on the wkb column (direct-on-WKB bbox, no parse)
    and/or an OGR SQL WHERE clause (the swq grammar, raydal/sql)."""
    import numpy as np
    import pyarrow as pa

    from .geo.wkb import wkb_bbox_many
    from .sql.engine import execute_sql

    if bbox is not None:
        x0, y0, x1, y1 = (float(v) for v in bbox)

        def run(t: pa.Table) -> pa.Table:
            bx0, by0, bx1, by1 = wkb_bbox_many(t[wkb_col].to_pylist())
            keep = ((bx0 <= x1) & (bx1 >= x0)
                    & (by0 <= y1) & (by1 >= y0))
            return t.filter(pa.array(np.asarray(keep, dtype=bool)))

        ds = ds.map_batches(run, batch_format="pyarrow")
    if where is not None:
        ds = execute_sql(f"SELECT * FROM layer WHERE {where}",
                         {"layer": ds},
                         geom_columns={"layer": wkb_col} if wkb_col in
                         (ds.schema().names or []) else None)
    return ds


@register_step("vector-concat")
def _vector_concat(ds, others, format=None):
    """gdal vector concat (apps/gdalalg_vector_concat.cpp, mode=merge):
    UNION ALL of the input with the listed sources."""
    if isinstance(others, str):
        others = [others]
    for p in others:
        opts = {"format": format} if format else {}
        ds = ds.union(_open_for_step(p, opts))
    return ds


def _open_for_step(path, opts):
    """Resolve a path through the source registry like the CLI read."""
    from .__main__ import _open

    return _open(path, dict(opts))


@register_step("vector-rasterize")
def _vector_rasterize(ds, z=6, value_col=None, merge="add",
                      tile_size=256, id_col=None):
    """gdal vector rasterize (apps/gdalalg_vector_rasterize.cpp) on the
    distributed tile burner: zones with ``wkb`` (+value) → band rows
    (one image per WebMercator tile at zoom ``z``), writable by any
    raster sink.  ``id_col`` names the feature-id column used for the
    deterministic burn order (defaults to zone_id, then fid)."""
    import numpy as np
    import pyarrow as pa

    from .geo.cells import web_mercator_quad
    from .ops.rasterize import rasterize_zones

    tm = web_mercator_quad(int(z), int(tile_size))
    ox, oy, res = tm.top_left_x, tm.top_left_y, tm.res_x
    ts = int(tile_size)

    from .geo import wkb as _W

    names = ds.schema().names
    if "zone_id" not in names:
        src = id_col or ("fid" if "fid" in names else None)
        if src is None:
            raise ValueError("vector-rasterize needs a zone_id column "
                             "(or pass id_col=NAME)")
        ds = ds.map_batches(
            lambda t, _s=src: t.append_column("zone_id", t[_s]),
            batch_format="pyarrow")

    def polys_only(t: pa.Table) -> pa.Table:
        # the tile burner is polygon-only (points/lines burn through
        # the library kernels burn_point/burn_line directly)
        keep = np.array([_W.wkb_geom_type(b) in
                         (_W.POLYGON, _W.MULTIPOLYGON)
                         for b in t["wkb"].to_pylist()])
        return t.filter(pa.array(keep))

    ds = ds.map_batches(polys_only, batch_format="pyarrow")

    out = rasterize_zones(ds, int(z), value_col=value_col, merge=merge,
                          tile_size=ts)

    def to_band_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tx = np.asarray(t["tile_x"], dtype=np.int64)
        ty = np.asarray(t["tile_y"], dtype=np.int64)
        ids = [f"tile_{z}_{a}_{b}" for a, b in zip(tx, ty)]
        gts = [[ox + a * ts * res, res, 0.0,
                oy - b * ts * res, 0.0, -res]
               for a, b in zip(tx, ty)]
        return pa.Table.from_pydict({
            "image_id": pa.array(ids, pa.string()),
            "band": pa.array([1] * n, pa.int32()),
            "data": t["data"],
            "w": pa.array([ts] * n, pa.int32()),
            "h": pa.array([ts] * n, pa.int32()),
            "dtype": pa.array(["float64"] * n, pa.string()),
            "geotransform": pa.array(gts, pa.list_(pa.float64())),
        })

    return out.map_batches(to_band_rows, batch_format="pyarrow")


@register_step("vector-grid")
def _vector_grid(ds, algorithm="invdist", width=256, height=256,
                 extent=None, x_col="x", y_col="y", value_col=None,
                 wkb_col="wkb", z=4, **kw):
    """gdal vector grid (apps/gdalalg_vector_grid*.cpp, alg/gdalgrid.cpp):
    scattered points → one interpolated band-row raster.

    Like the reference, EVERY point feeds the neighbourhood search, so
    the layer is collected into a cell index once and broadcast
    (``ray.put``); the output grid interpolates tile-parallel through
    the :class:`~raydal.ops.grid.GridInterpolate` actor pool."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from .geo import wkb as _W
    from .ops.grid import grid_tile
    from .ops.join import SpatialJoinZones, build_cell_points

    names = ds.schema().names
    if x_col in names and y_col in names:
        cols = [x_col, y_col] + ([value_col] if value_col else [])
        pts = pa.concat_tables(
            b for b in ds.select_columns(cols)
            .iter_batches(batch_format="pyarrow", batch_size=65536))
        xs = np.asarray(pts[x_col], dtype=np.float64)
        ys = np.asarray(pts[y_col], dtype=np.float64)
    elif wkb_col in names:
        # point layer without x/y columns (gdal_grid's zfield model)
        cols = [wkb_col] + ([value_col] if value_col else [])
        pts = pa.concat_tables(
            b for b in ds.select_columns(cols)
            .iter_batches(batch_format="pyarrow", batch_size=65536))
        blobs = pts[wkb_col].to_pylist()
        is_pt = np.array([_W.wkb_geom_type(b) == _W.POINT
                          for b in blobs])
        coords = np.array([_W.parse_wkb(b)[1][0]
                           for b, p in zip(blobs, is_pt) if p],
                          dtype=np.float64).reshape(-1, 2)
        xs, ys = coords[:, 0], coords[:, 1]
        if value_col:
            pts = pts.filter(pa.array(is_pt))
    else:
        raise ValueError(
            f"vector-grid needs ({x_col!r}, {y_col!r}) columns or a "
            f"{wkb_col!r} point column")
    vs = (np.asarray(pts[value_col], dtype=np.float64)
          if value_col else np.ones(len(xs)))
    if extent is None:
        extent = [float(xs.min()), float(ys.min()),
                  float(xs.max()), float(ys.max())]
    x0, y0, x1, y1 = (float(v) for v in extent)
    index = build_cell_points(vs, xs, ys, z=int(z),
                              window=(x0, y0, x1, y1))
    idx_ref = ray.put(index)
    w, h = int(width), int(height)
    # split the target grid into row bands so interpolation parallelizes
    nstrips = max(min(h // 64, 16), 1)
    res_y = (y1 - y0) / h
    # strip world bounds derive from the PIXEL-row split (not an even
    # world split) so every strip renders at exactly the output
    # resolution and rows land where the geotransform says
    cum = np.round(np.linspace(0, h, nstrips + 1)).astype(int)
    hs = np.diff(cum)
    sy1 = y1 - cum[:-1] * res_y      # strip tops, north-first
    sy0 = y1 - cum[1:] * res_y
    tiles = pa.Table.from_pydict({
        "tile_id": pa.array(np.arange(nstrips), pa.int64()),
        "x0": pa.array([x0] * nstrips), "y0": pa.array(sy0),
        "x1": pa.array([x1] * nstrips), "y1": pa.array(sy1),
        "th": pa.array(hs.astype(np.int64))})
    grid_kw = dict(kw)
    # one block per strip so the strips actually run in parallel
    out = ray.data.from_arrow(tiles).repartition(nstrips)

    def interp(t: pa.Table, _idx=idx_ref) -> pa.Table:
        index_l = SpatialJoinZones._resolve(_idx)
        rows_id, rows_data = [], []
        for i in range(t.num_rows):
            sx0, sy0, sx1, sy1 = (t[c][i].as_py()
                                  for c in ("x0", "y0", "x1", "y1"))
            th = int(t["th"][i].as_py())
            if th == 0:
                continue
            arr = grid_tile(index_l, algorithm, sx0, sy0, sx1, sy1,
                            w, th, **grid_kw)
            rows_id.append(int(t["tile_id"][i].as_py()))
            rows_data.append(arr.tobytes())
        return pa.Table.from_pydict({
            "tile_id": pa.array(rows_id, pa.int64()),
            "data": pa.array(rows_data, pa.binary())})

    parts = pa.concat_tables(
        b for b in out.map_batches(interp, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    # grid_tile emits north-up rows per strip; strip ids count from
    # the NORTH edge now, so stack in ascending id order
    order = np.argsort(np.asarray(parts["tile_id"]))
    full = np.concatenate(
        [np.frombuffer(parts["data"][int(i)].as_py(),
                       dtype=np.float64).reshape(-1, w)
         for i in order], axis=0)
    gt = [x0, (x1 - x0) / w, 0.0, y1, 0.0, -res_y]
    tbl = pa.Table.from_pydict({
        "image_id": pa.array(["grid"], pa.string()),
        "band": pa.array([1], pa.int32()),
        "data": pa.array([np.ascontiguousarray(full).tobytes()],
                         pa.binary()),
        "w": pa.array([w], pa.int32()),
        "h": pa.array([h], pa.int32()),
        "dtype": pa.array(["float64"], pa.string()),
        "geotransform": pa.array([gt], pa.list_(pa.float64()))})
    return ray.data.from_arrow(tbl)


@register_step("raster-color-merge")
def _raster_color_merge(ds, gray_col="pan"):
    """gdal raster color-merge (apps/gdalalg_raster_color_merge.cpp):
    keep each RGB payload's hue/saturation, replace value with the
    grayscale payload carried in ``gray_col`` (same-size encoded
    image, band 1)."""
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.color import color_merge

    if gray_col not in ds.schema().names:
        raise ValueError(
            f"raster-color-merge needs a {gray_col!r} column carrying "
            "the grayscale payload (pass gray_col=NAME)")

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            rgb = decode(t["bytes"][i].as_py())
            gray = decode(t[gray_col][i].as_py())
            if gray.ndim == 3:
                gray = gray[:, :, 0]
            blobs.append(encode(color_merge(rgb, gray),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-pansharpen")
def _raster_pansharpen(ds, pan_col="pan", weights=(1 / 3, 1 / 3, 1 / 3),
                       bit_depth=8):
    """gdal raster pansharpen (alg/gdalpansharpen.cpp weighted Brovey):
    RGB payload in ``bytes`` (upsampled to pan resolution), pan band
    payload in ``pan_col``."""
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.raster_math import pansharpen

    if pan_col not in ds.schema().names:
        raise ValueError(
            f"raster-pansharpen needs a {pan_col!r} column carrying "
            "the pan-band payload (pass pan_col=NAME)")
    w = tuple(float(x) for x in weights)

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            rgb = decode(t["bytes"][i].as_py())
            pan = decode(t[pan_col][i].as_py())
            if pan.ndim == 3:
                pan = pan[:, :, 0]
            blobs.append(encode(pansharpen(pan, rgb, weights=w,
                                           bit_depth=int(bit_depth)),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-rgb-to-palette")
def _raster_rgb_to_palette(ds, n_colors=256, bits=5):
    """gdal raster rgb-to-palette (alg/gdalmediancut.cpp +
    gdaldither.cpp nearest): two-stage distributed — mergeable color
    histogram partials, ONE bounded driver-side median-cut over the
    (2^bits)^3 merged counts, then a broadcast palette maps every
    image to its index raster.  Output rows keep the image table shape
    with single-band index payloads plus a ``palette`` column
    (flattened [r,g,b,...] list, shared by all rows)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.color import histogram_partial_rgb, median_cut, \
        rgb_to_palette

    def as_rgb(px):
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=2)
        if px.dtype != np.uint8:
            px = np.clip(np.floor(px.astype(np.float64) + 0.5),
                         0, 255).astype(np.uint8)
        return px[:, :, :3]

    def hist_partial(t: pa.Table) -> pa.Table:
        h = None
        for i in range(t.num_rows):
            px = as_rgb(decode(t["bytes"][i].as_py()))
            hp = histogram_partial_rgb(px, bits=int(bits))
            h = hp if h is None else h + hp
        return pa.Table.from_pydict(
            {"hist": pa.array([h.tobytes()], pa.binary())})

    merged = None
    for b in ds.map_batches(hist_partial, batch_format="pyarrow") \
              .iter_batches(batch_format="pyarrow"):
        for blob in b["hist"].to_pylist():
            hp = np.frombuffer(blob, dtype=np.int64)
            merged = hp.copy() if merged is None else merged + hp
    pal = median_cut(merged, n_colors=int(n_colors), bits=int(bits))
    pal_flat = [int(v) for v in pal.ravel()]

    def apply_pal(t: pa.Table, _pal=pal) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = as_rgb(decode(t["bytes"][i].as_py()))
            blobs.append(encode(rgb_to_palette(px, _pal),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        out = t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))
        return out.append_column(
            "palette", pa.array([pal_flat] * t.num_rows,
                                pa.list_(pa.int32())))

    return ds.map_batches(apply_pal, batch_format="pyarrow")


@register_step("raster-viewshed")
def _raster_viewshed(ds, observer_x, observer_y, observer_height=2.0,
                     **kw):
    """gdal raster viewshed (alg/viewshed/, Wang-Robinson-White):
    band 1 of each image as the DEM, observer in PIXEL coordinates;
    output is the byte visibility grid re-encoded in the row's format
    (out-of-range cells keep the kernel's out_of_range_val)."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode
    from .ops.viewshed import viewshed

    ox, oy = float(observer_x), float(observer_y)
    vs_kw = dict(kw)

    def run(t: pa.Table) -> pa.Table:
        blobs = []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3
                    else px).astype(np.float64)
            gt = (tuple(t["gt"][i].as_py())
                  if "gt" in t.column_names
                  else (0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
            out, (xs, ys) = viewshed(band, ox, oy,
                                     observer_height=float(
                                         observer_height),
                                     gt=gt, **vs_kw)
            full = np.full(band.shape,
                           vs_kw.get("out_of_range_val", 0.0))
            full[ys:ys + out.shape[0], xs:xs + out.shape[1]] = out
            blobs.append(encode(full.astype(np.uint8),
                                t["fmt"][i].as_py()))
        idx = t.schema.get_field_index("bytes")
        return t.set_column(idx, "bytes", pa.array(blobs, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-pixel-info")
def _raster_pixel_info(ds, points, resample="bilinear"):
    """gdal raster pixel-info (gdallocationinfo /
    GDALRasterInterpolateAtPoint): sample every image's band 1 at the
    given world (or pixel, when the row has no gt) coordinates.
    Emits one row per (image, point): image_id, x, y, value."""
    import numpy as np
    import pyarrow as pa

    from .geo.affine import invert_gt
    from .io.codecs import decode
    from .kernels.resample import interpolate_at_point

    pts = [(float(p[0]), float(p[1])) for p in points]

    def run(t: pa.Table) -> pa.Table:
        ids, xs_o, ys_o, vals = [], [], [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py())
            band = (px[:, :, 0] if px.ndim == 3
                    else px).astype(np.float64)
            gt = (tuple(t["gt"][i].as_py())
                  if "gt" in t.column_names else None)
            inv = invert_gt(gt) if gt is not None else None
            img_id = t["image_id"][i].as_py()
            for (wx, wy) in pts:
                if inv is not None:
                    cx = inv[0] + inv[1] * wx + inv[2] * wy
                    cy = inv[3] + inv[4] * wx + inv[5] * wy
                else:
                    cx, cy = wx, wy
                ids.append(img_id)
                xs_o.append(wx)
                ys_o.append(wy)
                v = interpolate_at_point(band, cx, cy,
                                         resample=resample)
                # out-of-domain points report null, the
                # gdallocationinfo 'outside' case — never crash
                vals.append(None if v is None else float(v))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids),
            "x": pa.array(xs_o, pa.float64()),
            "y": pa.array(ys_o, pa.float64()),
            "value": pa.array(vals, pa.float64())})

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-unscale")
def _raster_unscale(ds, scale=None, offset=None):
    """gdal raster unscale (apps/gdalalg_raster_unscale.cpp): apply the
    scale/offset metadata (per-row ``scale``/``offset`` columns, or the
    step params) to produce true values — Float32 TIFF payloads out,
    like the reference's default Float32 working type."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode, encode

    def run(t: pa.Table) -> pa.Table:
        blobs, fmts = [], []
        for i in range(t.num_rows):
            px = decode(t["bytes"][i].as_py()).astype(np.float64)
            s = (float(t["scale"][i].as_py())
                 if "scale" in t.column_names and scale is None
                 else float(scale if scale is not None else 1.0))
            o = (float(t["offset"][i].as_py())
                 if "offset" in t.column_names and offset is None
                 else float(offset if offset is not None else 0.0))
            out = px * s + o
            if out.ndim == 3 and out.shape[2] == 1:
                out = out[:, :, 0]
            blobs.append(encode(out.astype(np.float32), "tiff"))
            fmts.append("tiff")
        out_t = t.set_column(t.schema.get_field_index("bytes"),
                             "bytes", pa.array(blobs, pa.binary()))
        if "fmt" in out_t.column_names:
            out_t = out_t.set_column(
                out_t.schema.get_field_index("fmt"), "fmt",
                pa.array(fmts, pa.string()))
        return out_t

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-index")
def _raster_index(ds, dst_crs=3857, crs=None):
    """gdal raster index (gdaltindex): one footprint-polygon vector row
    per image — streaming metadata pass, payload bytes never decoded.
    Rows without a ``crs`` column take the ``crs`` param (default
    4326, like gdaltindex's assume-source-SRS behavior)."""
    import pyarrow as pa

    from .ops.footprint import add_footprint

    names = ds.schema().names
    pruned = ds.select_columns(
        [c for c in ("image_id", "w", "h", "crs", "gt")
         if c in names])
    fill = str(crs if crs is not None else 4326)

    def fp(t: pa.Table) -> pa.Table:
        if "crs" not in t.column_names:
            t = t.append_column("crs",
                                pa.array([fill] * t.num_rows,
                                         pa.string()))
        return add_footprint(t, dst_crs=dst_crs)

    return pruned.map_batches(fp, batch_format="pyarrow")


@register_step("raster-mosaic")
def _raster_mosaic(ds, res=None, extent=None, tile_size=512,
                   background=0):
    """gdal raster mosaic (apps/gdalalg_raster_mosaic.cpp /
    gdal_merge): distributed same-CRS composition — union extent from
    per-batch partials, flat-map images onto output tiles,
    ``groupby(tile)`` paints each tile from only its images (last id
    wins).  Emits band rows, writable by any raster sink."""
    from .ops.gti import mosaic_dataset

    return mosaic_dataset(ds, res=res, extent=extent,
                          tile_size=tile_size, background=background)


@register_step("raster-stack")
def _raster_stack(ds, out_id="stack"):
    """gdal raster stack (apps/gdalalg_raster_stack.cpp): each input
    image becomes one band of a single output, in image_id order
    (the reference's separate/stack VRT composition).  One bounded
    metadata pass collects the distinct ids; the band reassignment is
    then embarrassingly parallel over band rows — the groupby that
    co-locates bands belongs to the SINK (one file), not this step."""
    import numpy as np
    import pyarrow as pa

    from .io.codecs import decode

    names = ds.schema().names
    if "bytes" in names:            # encoded image table → band rows
        def to_band(t: pa.Table) -> pa.Table:
            rows = {"image_id": [], "band": [], "data": [], "w": [],
                    "h": [], "dtype": [], "geotransform": []}
            for i in range(t.num_rows):
                px = decode(t["bytes"][i].as_py())
                if px.ndim == 2:
                    px = px[:, :, None]
                gt = (t["gt"][i].as_py()
                      if "gt" in t.column_names else None)
                for b in range(px.shape[2]):   # EVERY band stacks
                    band = np.ascontiguousarray(px[:, :, b])
                    rows["image_id"].append(
                        str(t["image_id"][i].as_py()))
                    rows["band"].append(b + 1)
                    rows["data"].append(band.tobytes())
                    rows["w"].append(band.shape[1])
                    rows["h"].append(band.shape[0])
                    rows["dtype"].append(str(band.dtype))
                    rows["geotransform"].append(gt)
            return pa.Table.from_pydict({
                "image_id": pa.array(rows["image_id"], pa.string()),
                "band": pa.array(rows["band"], pa.int32()),
                "data": pa.array(rows["data"], pa.binary()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "dtype": pa.array(rows["dtype"], pa.string()),
                "geotransform": pa.array(rows["geotransform"],
                                         pa.list_(pa.float64()))})

        ds = ds.map_batches(to_band, batch_format="pyarrow")

    # ONE bounded metadata pass: per-input max band index; ids are its
    # keys, sorted — bands of input k stack after all inputs < k
    counts = {}
    for b in ds.select_columns(["image_id", "band"]) \
               .iter_batches(batch_format="pyarrow"):
        for iid, bd in zip(b["image_id"].to_pylist(),
                           b["band"].to_pylist()):
            counts[iid] = max(counts.get(iid, 0), int(bd))
    base = {}
    off = 0
    for iid in sorted(counts):
        base[iid] = off
        off += counts[iid]

    def restack(t: pa.Table, _base=base) -> pa.Table:
        new_band = pa.array(
            [_base[iid] + int(bd)
             for iid, bd in zip(t["image_id"].to_pylist(),
                                t["band"].to_pylist())], pa.int32())
        t = t.set_column(t.schema.get_field_index("band"), "band",
                         new_band)
        return t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            pa.array([out_id] * t.num_rows, pa.string()))

    return ds.map_batches(restack, batch_format="pyarrow")


@register_step("vector-set-geom-type")
def _vector_set_geom_type(ds, to="multi", wkb_col="wkb"):
    """gdal vector set-geom-type (apps/gdalalg_vector_set_geom_type.cpp
    / ogr2ogr -nlt): ``to="multi"`` promotes single geometries to their
    Multi* wrapper (PROMOTE_TO_MULTI); ``to="single"`` unwraps
    one-part Multi* collections; ``to="linear"`` strokes curve types
    through the engine's GDAL-parity linearizer."""
    import struct as _struct

    import pyarrow as pa

    from .geo import wkb as _W
    from .geo.curves import linearize, parse_wkb_curve, \
        write_wkb_curve

    def promote(blob):
        t = _W.wkb_geom_type(blob)
        if t in (_W.POINT, _W.LINESTRING, _W.POLYGON):
            return _struct.pack("<BII", 1, t + 3, 1) + blob
        return blob

    def single(blob):
        t = _W.wkb_geom_type(blob)
        if t in (_W.MULTIPOINT, _W.MULTILINESTRING, _W.MULTIPOLYGON):
            n = int.from_bytes(blob[5:9], "little")
            if n == 1:
                return blob[9:]
        return blob

    def linear(blob):
        return write_wkb_curve(linearize(parse_wkb_curve(blob)))

    fn = {"multi": promote, "single": single,
          "linear": linear}.get(str(to))
    if fn is None:
        raise ValueError("set-geom-type 'to' must be multi|single|"
                         "linear")

    def run(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index(wkb_col)
        out = [fn(b) for b in t[wkb_col].to_pylist()]
        return t.set_column(idx, wkb_col, pa.array(out, pa.binary()))

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-create")
def _raster_create(ds, width=256, height=256, value=0, bands=1,
                   dtype="uint8", gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                   image_id="created"):
    """gdal raster create (apps/gdalalg_raster_create.cpp): append a
    constant-fill image row to the stream (or start one from an empty
    read) — band rows, any raster sink."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    rows = {"image_id": [], "band": [], "data": [], "w": [], "h": [],
            "dtype": [], "geotransform": []}
    arr = np.full((int(height), int(width)), value,
                  dtype=np.dtype(dtype))
    for b in range(int(bands)):
        rows["image_id"].append(str(image_id))
        rows["band"].append(b + 1)
        rows["data"].append(arr.tobytes())
        rows["w"].append(int(width))
        rows["h"].append(int(height))
        rows["dtype"].append(str(dtype))
        rows["geotransform"].append([float(v) for v in gt])
    new = ray.data.from_arrow(pa.Table.from_pydict({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int32()),
        "data": pa.array(rows["data"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "dtype": pa.array(rows["dtype"], pa.string()),
        "geotransform": pa.array(rows["geotransform"],
                                 pa.list_(pa.float64()))}))
    # same band-row schema upstream → append; anything else replaces
    # the stream (the reference's create is a standalone dataset too)
    if ds is not None and ds.schema().names == new.schema().names:
        return ds.union(new)
    return new


@register_step("raster-overview-add")
def _raster_overview_add(ds, levels=(2, 4)):
    """gdal raster overview add (apps/gdalalg_raster_overview_add.cpp):
    per band row, append 1/level average-decimated overview rows
    (``image_id@ovr_LEVEL``) — the same 2x2-average ladder the COG
    writer builds (kernels/resample.downsample2_average), exposed as a
    streamable step so any sink can persist the pyramid."""
    import numpy as np
    import pyarrow as pa

    from .kernels.resample import downsample2_average

    lv = sorted(int(v) for v in levels)
    for v in lv:
        if v < 2 or (v & (v - 1)):
            raise ValueError("overview levels must be powers of two")

    def run(t: pa.Table) -> pa.Table:
        rows = {c: [] for c in ("image_id", "band", "data", "w", "h",
                                "dtype", "geotransform")}

        def emit(iid, band, arr, gt, dt):
            rows["image_id"].append(iid)
            rows["band"].append(band)
            rows["data"].append(np.ascontiguousarray(arr).tobytes())
            rows["w"].append(arr.shape[1])
            rows["h"].append(arr.shape[0])
            rows["dtype"].append(dt)
            rows["geotransform"].append(gt)

        for i in range(t.num_rows):
            dt = t["dtype"][i].as_py()
            arr = np.frombuffer(t["data"][i].as_py(),
                                np.dtype(dt)).reshape(
                t["h"][i].as_py(), t["w"][i].as_py())
            gt = t["geotransform"][i].as_py()
            iid = str(t["image_id"][i].as_py())
            band = int(t["band"][i].as_py())
            emit(iid, band, arr, gt, dt)
            cur, level = arr, 1
            for v in lv:
                while level < v:
                    # the kernel computes in float64; overviews keep
                    # the band dtype like the reference's AVERAGE
                    cur = downsample2_average(cur).astype(
                        np.dtype(dt), copy=False)
                    level *= 2
                ogt = (None if gt is None else
                       [gt[0], gt[1] * v, gt[2], gt[3], gt[4],
                        gt[5] * v])
                emit(f"{iid}@ovr_{v}", band, cur, ogt, dt)
        return pa.Table.from_pydict({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "band": pa.array(rows["band"], pa.int32()),
            "data": pa.array(rows["data"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "dtype": pa.array(rows["dtype"], pa.string()),
            "geotransform": pa.array(rows["geotransform"],
                                     pa.list_(pa.float64()))})

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("vector-edit")
def _vector_edit(ds, rename=None, drop=None):
    """gdal vector edit (apps/gdalalg_vector_edit.cpp field-map
    subset): rename fields ({"old": "new"}) and/or drop fields."""
    import pyarrow as pa

    if rename is None and drop is None:
        raise ValueError("vector-edit needs rename= and/or drop=")
    ren = dict(rename or {})
    dr = set(drop or [])

    def run(t: pa.Table) -> pa.Table:
        if dr:
            t = t.drop_columns([c for c in t.column_names if c in dr])
        if ren:
            t = t.rename_columns([ren.get(c, c)
                                  for c in t.column_names])
        return t

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("raster-edit")
def _raster_edit(ds, gt=None, crs=None):
    """gdal raster edit (apps/gdalalg_raster_edit.cpp): override the
    geotransform and/or CRS metadata columns on every row (both the
    band-row ``geotransform`` and image-table ``gt`` spellings)."""
    import pyarrow as pa

    if gt is None and crs is None:
        raise ValueError("raster-edit needs gt= and/or crs=")
    new_gt = None if gt is None else [float(v) for v in gt]

    def run(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if new_gt is not None:
            for col in ("gt", "geotransform"):
                if col in t.column_names:
                    t = t.set_column(
                        t.schema.get_field_index(col), col,
                        pa.array([new_gt] * n, pa.list_(pa.float64())))
        if crs is not None:
            arr = pa.array([str(crs)] * n, pa.string())
            if "crs" in t.column_names:
                t = t.set_column(t.schema.get_field_index("crs"),
                                 "crs", arr)
            else:
                t = t.append_column("crs", arr)
        return t

    return ds.map_batches(run, batch_format="pyarrow")


@register_step("vector-simplify-coverage")
def _vector_simplify_coverage(ds, tolerance, id_col="fid",
                              wkb_col="wkb"):
    """gdal vector simplify-coverage
    (apps/gdalalg_vector_simplify_coverage.cpp, GEOS 3.12
    CoverageSimplifier semantics): shared boundaries simplify ONCE so
    the polygon coverage stays gap- and overlap-free.  Arc
    decomposition needs the whole coverage's junction graph, so the
    layer is collected once on the driver — exactly the reference's
    memory model (GEOS builds the full coverage in RAM); a 100-TB
    coverage would pre-partition by region and run this per region."""
    import pyarrow as pa
    import ray.data

    from .geo import wkb as _W
    from .ops.vector import simplify_coverage

    tbl = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow"))
    rings = {}
    for i in range(tbl.num_rows):
        rid = tbl[id_col][i].as_py()
        blob = tbl[wkb_col][i].as_py()
        if _W.wkb_geom_type(blob) != _W.POLYGON:
            raise ValueError("simplify-coverage expects a POLYGON "
                             "coverage")
        rings[rid] = _W.polygons_from_wkb(blob)[0][0]
    out = simplify_coverage(rings, float(tolerance))
    idx = tbl.schema.get_field_index(wkb_col)
    tbl = tbl.set_column(
        idx, wkb_col,
        pa.array([_W.polygon_wkb([out[tbl[id_col][i].as_py()]])
                  for i in range(tbl.num_rows)], pa.binary()))
    return ray.data.from_arrow(tbl)
