"""``python -m raydal`` — the unified CLI (the reference's ``gdal``
command, ``apps/gdalalg_*``: ``gdal raster pipeline``, ``gdal raster
convert``, ``gdal vector convert``, ``gdal mdim translate``, info).

Pipeline grammar mirrors ``gdalalg_raster_pipeline.cpp``::

    read SRC [opt=val...] ( ! STEP [opt=val...] )* ! write DST [opt=val...]

Formats resolve from the engine's source/sink registries
(``raydal.pipeline.SOURCE_REGISTRY`` / ``SINK_REGISTRY``) by explicit
``format=`` option or file extension.  ``write X.gdalg.json`` saves the
step list as a rerunnable pipeline document instead of executing a
sink — the reference's GDALG contract.

This module OWNS the Ray session (the library never calls
``ray.init``).
"""

from __future__ import annotations

import json
import os
import sys

_EXT_SOURCE = {
    ".parquet": "parquet", ".tif": "gtiff", ".tiff": "gtiff",
    ".shp": "shapefile", ".fgb": "flatgeobuf", ".gpkg": "gpkg",
    ".geojson": "geojson", ".json": "geojson", ".csv": "csv",
    ".gml": "gml", ".kml": "kml", ".gpx": "gpx", ".mif": "mif",
    ".nc": "netcdf", ".grb": "grib", ".grib2": "grib", ".jp2": "jp2",
    ".h5": "hdf5", ".hdf": "hdf4", ".000": "s57", ".gdb": "filegdb",
    ".dgn": "dgn", ".dxf": "dxf", ".mbtiles": "mbtiles",
    ".dt0": "dted", ".dt1": "dted", ".dt2": "dted", ".hgt": "hgt",
    ".xyz": "xyz", ".gmt": "gmt", ".kmz": "kmlsuperoverlay",
    ".zarr": "zarr", ".zr3": "zarr", ".pmtiles": "pmtiles",
    ".cal": "cals", ".cals": "cals", ".dds": "dds", ".vrt": "vrt",
    ".dim": "dimap", ".grd": "rraster", ".pix": "pcidsk",
    ".map": "pcraster", ".mrf": "mrf", ".bag": "bag",
    ".gen": "adrg", ".thf": "adrg", ".grc": "nwt_grc",
    ".xlsx": "xlsx", ".ods": "ods", ".jml": "jml", ".xls": "xls",
    ".tab": "mitab", ".tpkx": "esric",
}
_EXT_SINK = {
    ".parquet": "parquet", ".tif": "gtiff", ".tiff": "gtiff",
    ".shp": "shapefile", ".fgb": "flatgeobuf", ".gpkg": "gpkg",
    ".geojson": "geojson", ".json": "geojson", ".csv": "csv",
    ".gml": "gml", ".kml": "kml", ".gpx": "gpx", ".mif": "mif",
    ".nc": "netcdf", ".grb": "grib", ".jp2": "jp2", ".gdb": "filegdb",
    ".mbtiles": "mbtiles", ".dt0": "dted", ".dt1": "dted",
    ".dt2": "dted", ".xyz": "xyz", ".gmt": "gmt", ".zarr": "zarr",
    ".pmtiles": "pmtiles", ".cal": "cals", ".cals": "cals",
    ".dds": "dds", ".map": "pcraster", ".jml": "jml",
}


def _coerce(v):
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v in ("true", "True"):
        return True
    if v in ("false", "False"):
        return False
    if v.startswith("[") or v.startswith("{"):
        try:
            return json.loads(v)
        except json.JSONDecodeError:
            pass
    return v


def _parse_opts(tokens):
    """['a=1', 'b=x'] → {'a': 1, 'b': 'x'}; bare tokens are
    positional."""
    opts, pos = {}, []
    for t in tokens:
        if "=" in t:
            k, _, v = t.partition("=")
            opts[k.replace("-", "_")] = _coerce(v)
        else:
            pos.append(t)
    return opts, pos


def _split_pipeline(tokens):
    """Token stream → list of [verb, tok...] stages split on '!'."""
    stages, cur = [], []
    for t in tokens:
        if t == "!":
            if cur:
                stages.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        stages.append(cur)
    return stages


def _source_name(path, opts):
    if "format" in opts:
        return str(opts.pop("format"))
    ext = os.path.splitext(path)[1].lower()
    if path.endswith(".gdbtable") or (path.endswith(".gdb")
                                      and os.path.isdir(path)):
        return "filegdb"
    if ext in _EXT_SOURCE:
        return _EXT_SOURCE[ext]
    raise SystemExit(f"cannot infer source format for {path!r}; "
                     f"pass format=NAME")


def _sink_name(path, opts):
    if "format" in opts:
        return str(opts.pop("format"))
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXT_SINK:
        return _EXT_SINK[ext]
    raise SystemExit(f"cannot infer sink format for {path!r}; "
                     f"pass format=NAME")


def _open(path, opts):
    from .pipeline import open_source
    name = _source_name(path, opts)
    return open_source(name, [path] if name in
                       ("gtiff", "jp2", "hdf5", "hdf4", "dted", "hgt",
                        "xyz") else path, **opts)


def _parse_stages(tokens):
    """Token stream → (read_tokens, [(step, opts)], write_tokens|None);
    validates grammar without touching Ray or the source."""
    from .pipeline import STEP_REGISTRY

    stages = _split_pipeline(tokens)
    if not stages or stages[0][0] != "read":
        raise SystemExit("pipeline must start with: read SRC")
    steps = []
    write_stage = None
    for si, st in enumerate(stages[1:], start=1):
        if st[0] == "write":
            if si != len(stages) - 1:
                raise SystemExit("write must be the final stage; "
                                 "steps after it would be dropped")
            write_stage = st
            break
        opts, _pos = _parse_opts(st[1:])
        if st[0] not in STEP_REGISTRY:
            raise SystemExit(
                f"unknown step {st[0]!r}; available: "
                f"{', '.join(sorted(STEP_REGISTRY))}")
        steps.append((st[0], opts))
    return stages[0], steps, write_stage


def _execute(read_tokens, steps, write_stage):
    """Open → run steps → write/save; the one place Ray spins up."""
    import ray

    from .pipeline import pipeline_to_json, run_pipeline, write_sink

    if write_stage is not None:
        w_opts, w_pos = _parse_opts(write_stage[1:])
        if not w_pos:
            raise SystemExit("write needs a destination path")
        dst = w_pos[0]
        if dst.endswith(".gdalg.json"):
            # save as a rerunnable pipeline document (GDALG contract):
            # a pure metadata write, no Ray session, no source decode
            doc = json.loads(pipeline_to_json(steps))
            doc["read"] = list(read_tokens[1:])
            with open(dst, "w") as f:
                json.dump(doc, f)
            print(f"saved pipeline -> {dst}")
            return dst
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    opts, pos = _parse_opts(read_tokens[1:])
    if not pos:
        raise SystemExit("read needs a source path")
    ds = run_pipeline(_open(pos[0], opts), steps)
    if write_stage is None:
        n = ds.count()
        print(f"{n} rows (no write stage)")
        return ds
    out = write_sink(_sink_name(dst, w_opts), ds, dst, **w_opts)
    # per-row raster sinks return a LAZY Dataset whose map_batches
    # does the writing — consume it here or nothing hits disk
    if hasattr(out, "materialize") and hasattr(out, "take_all"):
        out = out.materialize()
    # some sinks return the serialized document rather than a path —
    # report the destination, not a content dump
    shown = out if isinstance(out, str) and len(out) <= 256 \
        and not out.lstrip().startswith(("{", "<")) else dst
    print(f"wrote {shown}")
    return out if out is not None else dst


def run_pipeline_tokens(tokens):
    """Execute (or save) one pipeline token stream; returns the sink's
    return value or the tail Dataset."""
    return _execute(*_parse_stages(tokens))


def run_saved_pipeline(path, extra_tokens=()):
    """Execute a ``.gdalg.json`` document saved by ``write``; extra
    tokens (e.g. ``! write DST``) append to the saved pipeline.  Steps
    run from the PARSED document (params keep their JSON types — lists
    and dicts are not round-tripped through token strings)."""
    from .pipeline import pipeline_from_json

    with open(path) as f:
        doc = json.load(f)
    saved_steps = pipeline_from_json(json.dumps(doc))
    read_tokens, extra_steps, write_stage = _parse_stages(
        ["read"] + list(doc.get("read", [])) + list(extra_tokens))
    return _execute(read_tokens, saved_steps + extra_steps,
                    write_stage)


def cmd_info(args):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    opts, pos = _parse_opts(args)
    if not pos:
        raise SystemExit("info needs a path")
    want_stats = bool(opts.pop("stats", False))
    ds = _open(pos[0], opts)
    schema = ds.schema()
    doc = {
        "path": pos[0],
        "rows": ds.count(),
        "columns": [{"name": c, "type": str(t)} for c, t in
                    zip(schema.names, schema.types)]}
    if want_stats and "data" in schema.names:
        # gdal raster info band block: min/max/mean/stddev + the
        # GDALChecksumImage checksum (kernels/checksum golden parity)
        import numpy as np
        import pyarrow as pa

        from .kernels.checksum import checksum

        def stats(t: pa.Table) -> pa.Table:
            rows = {"image_id": [], "band": [], "minimum": [],
                    "maximum": [], "mean": [], "stddev": [],
                    "checksum": []}
            for i in range(t.num_rows):
                a = np.frombuffer(
                    t["data"][i].as_py(),
                    np.dtype(t["dtype"][i].as_py())).reshape(
                    t["h"][i].as_py(), t["w"][i].as_py())
                rows["image_id"].append(t["image_id"][i].as_py())
                rows["band"].append(t["band"][i].as_py())
                rows["minimum"].append(float(a.min()))
                rows["maximum"].append(float(a.max()))
                rows["mean"].append(float(a.mean()))
                rows["stddev"].append(float(a.std()))
                rows["checksum"].append(int(checksum(a)))
            return pa.Table.from_pydict(rows)

        doc["bands"] = ds.map_batches(
            stats, batch_format="pyarrow").take_all()
    print(json.dumps(doc, indent=2))


def cmd_convert(args):
    opts, pos = _parse_opts(args)
    if len(pos) != 2:
        raise SystemExit("convert needs SRC and DST")
    tokens = ["read", pos[0]]
    if "input_format" in opts:
        tokens.append(f"format={opts.pop('input_format')}")
    tokens.append("!")
    tokens.append("write")
    tokens.append(pos[1])
    tokens.extend(f"{k}={v}" for k, v in opts.items())
    return run_pipeline_tokens(tokens)


def cmd_tile(args):
    """``raster tile`` (apps/gdalalg_raster_tile.cpp analogue): warp
    the image table into a z/x/y pyramid with the salted two-stage
    mosaic and resumable parquet output."""
    import ray

    from .pipelines import tile_pyramid

    opts, pos = _parse_opts(args)
    if len(pos) != 2:
        raise SystemExit("raster tile needs SF_DIR (or images dir) "
                         "and OUT_DIR")
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    res = tile_pyramid(
        pos[0], z_max=int(opts.pop("z_max", 8)),
        z_min=int(opts.pop("z_min", 6)),
        salt=int(opts.pop("salt", 4)), out_dir=pos[1],
        limit_images=opts.pop("limit_images", None))
    counts = {z: ds.count() for z, ds in res["levels"].items()}
    print(json.dumps({"tiles_per_level": counts, "out": pos[1]}))


def cmd_mdim_translate(args):
    import numpy as np

    from .ops.mdim import open_mdarray

    opts, pos = _parse_opts(args)
    if len(pos) != 2:
        raise SystemExit("mdim translate needs SRC and DST")
    array = opts.pop("array", None)
    if array is None:
        raise SystemExit("mdim translate needs array=NAME")
    md = open_mdarray(pos[0], str(array),
                      dim_names=opts.pop("dim_names", None))
    if "scaleaxes" in opts:
        sa = opts.pop("scaleaxes")
        if not isinstance(sa, dict):
            sa = json.loads(str(sa))
        md = md.scaleaxes({k: int(v) for k, v in sa.items()})
    if "view" in opts:
        md = md.get_view(str(opts.pop("view")))
    if "transpose" in opts:
        tr = opts.pop("transpose")
        md = md.transpose(tr if isinstance(tr, list)
                          else json.loads(str(tr)))
    arr = md.read()
    from .io.hdf5 import write_hdf5
    write_hdf5({md.name.lstrip("/") or "array": np.ascontiguousarray(
        arr)}, pos[1])
    print(f"wrote {pos[1]} shape={arr.shape} dtype={arr.dtype}")


def cmd_mdim_info(args):
    from .ops.mdim import open_mdarray

    opts, pos = _parse_opts(args)
    array = opts.pop("array", None)
    if not pos or array is None:
        raise SystemExit("mdim info needs SRC array=NAME")
    md = open_mdarray(pos[0], str(array))
    print(json.dumps({
        "array": md.name,
        "dtype": str(md.dtype),
        "dims": [{"name": d.name, "size": d.size} for d in md.dims]},
        indent=2))


def cmd_layer_algebra(args):
    """``vector layer-algebra`` (apps/gdalalg_vector_layer_algebra.cpp
    analogue): OP INPUT METHOD OUT with OP one of intersection, union,
    symdifference, identity, update, clip, erase.  The method layer is
    broadcast (ray.put once) below the budget and cell-shuffled above
    it (layer_op_auto)."""
    import pyarrow as pa
    import ray

    from .ops.layer_algebra import layer_op_auto

    opts, pos = _parse_opts(args)
    if len(pos) != 4:
        raise SystemExit("vector layer-algebra needs OP INPUT METHOD "
                         "OUT")
    op, src, method_path, dst = pos
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    def load(p, id_name, id_col=None):
        ds = _open(p, {})
        t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        cols = {c.lower(): c for c in t.column_names}
        # attribute ids win over the reader's record numbers ("fid")
        idc = (cols.get(str(id_col).lower()) if id_col
               else cols.get("id") or cols.get("fid"))
        ids = (t[idc] if idc
               else pa.array(range(t.num_rows), pa.int64()))
        return pa.Table.from_pydict({id_name: ids, "wkb": t["wkb"]})

    ids = load(src, "feat_id", opts.pop("id_col", None))
    method = load(method_path, "zone_id",
                  opts.pop("method_id_col", None))
    import ray.data
    out = layer_op_auto(str(op), ray.data.from_arrow(ids), method,
                        z=opts.pop("z", None),
                        window=opts.pop("window", None))
    from .pipeline import write_sink
    res = write_sink(_sink_name(dst, {}), out, dst)
    if hasattr(res, "materialize") and hasattr(res, "take_all"):
        res.materialize()
    print(f"wrote {dst}")


def cmd_vector_sql(args):
    """``vector sql`` (ogrinfo -sql / gdal vector sql analogue): run an
    OGR SQL SELECT (raydal/sql, swq grammar) over one or more source
    files; layer names are the file basenames.  Optional OUT path
    writes the result; otherwise rows print as JSON lines."""
    import ray

    from .sql.engine import execute_sql

    opts, pos = _parse_opts(args)
    if len(pos) < 2:
        raise SystemExit('vector sql "SELECT ..." SRC... [out=PATH]')
    sql, srcs = pos[0], pos[1:]
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    layers = {}
    for p in srcs:
        name = os.path.splitext(os.path.basename(p))[0]
        layers[name] = _open(p, {})
    out_path = opts.pop("out", None)
    ds = execute_sql(sql, layers)
    if out_path:
        from .pipeline import write_sink
        write_sink(_sink_name(str(out_path), {}), ds, str(out_path))
        print(f"wrote {out_path}")
        return
    for row in ds.iter_rows():
        print(json.dumps({k: (v if not isinstance(v, bytes)
                              else v.hex()) for k, v in row.items()}))


def cmd_gnm_path(args):
    """``gnm path`` — build a network from point+line layers
    (ConnectPointsByLines semantics) and run Dijkstra / K-shortest /
    connected-components between two global FIDs."""
    from .ops.gnm import build_network_from_tables

    opts, pos = _parse_opts(args)
    if len(pos) < 2:
        raise SystemExit("gnm path needs two or more layer paths plus "
                         "src=FID tgt=FID")
    layers = []
    for p in pos:
        name = os.path.splitext(os.path.basename(p))[0]
        from .io.shapefile import read_shapefile
        layers.append((name, read_shapefile(p)))
    g, ranges = build_network_from_tables(
        layers, float(opts.pop("tolerance", 1e-6)),
        cost=float(opts.pop("cost", 1.0)),
        inv_cost=float(opts.pop("inv_cost", 1.0)))
    src, tgt = int(opts.pop("src")), int(opts.pop("tgt"))
    algo = str(opts.pop("algorithm", "dijkstra"))
    if algo == "dijkstra":
        paths = [g.dijkstra_shortest_path(src, tgt)]
    elif algo in ("kshortest", "k-shortest"):
        paths = g.k_shortest_paths(src, tgt, int(opts.pop("k", 3)))
    elif algo in ("components", "connectedcomponents"):
        pairs = g.connected_components([src])
        print(json.dumps({"ranges": ranges,
                          "pairs": [list(p) for p in pairs]}))
        return
    else:
        raise SystemExit(f"unknown algorithm {algo!r}")
    print(json.dumps({
        "ranges": ranges,
        "paths": [{"vertices_edges": [list(p) for p in path],
                   "cost": sum(g.edges[e].dir_cost
                               for _v, e in path if e != -1)}
                  for path in paths if path]}))


def _list_registries():
    from .pipeline import (SINK_REGISTRY, SOURCE_REGISTRY,
                           STEP_REGISTRY)
    print(json.dumps({
        "sources": sorted(SOURCE_REGISTRY),
        "sinks": sorted(SINK_REGISTRY),
        "steps": sorted(STEP_REGISTRY)}, indent=2))


USAGE = """usage: python -m raydal COMMAND ...

commands:
  raster pipeline read SRC [opt=val] ( ! STEP [opt=val] )* ! write DST
  vector pipeline ... (same grammar)
  raster convert SRC DST [opt=val...]
  vector convert SRC DST [opt=val...]
  raster info SRC | vector info SRC
  raster tile SF_DIR OUT_DIR [z_max=8] [z_min=6] [limit_images=N]
  vector layer-algebra OP INPUT METHOD OUT   (intersection|union|
           symdifference|identity|update|clip|erase)
  vector sql "SELECT ..." SRC... [out=PATH]   (OGR SQL dialect)
  mdim info SRC array=NAME
  mdim translate SRC DST array=NAME [view=...] [transpose=[..]]
                 [scaleaxes={"dim": n}]
  gnm path LAYER.shp... src=FID tgt=FID [algorithm=dijkstra|kshortest|
           components] [k=3] [tolerance=1e-6] [cost=1]
  dataset identify|copy|rename|delete PATH [DST]
  pipeline run FILE.gdalg.json
  formats                      list sources/sinks/steps
  raster VERB SRC [DST] [opt=val...]   single-step sugar for any
           registered step (hillshade, slope, viewshed, reclassify,
           pixel-info, rgb-to-palette, unscale, index, ...)
  vector VERB SRC [DST] [opt=val...]   (buffer, simplify, segmentize,
           swap-xy, make-valid, filter, select, grid, rasterize,
           concat, reproject, explode-collections, ...)
"""


# raster steps whose INPUT is the encoded image table (image_id/bytes/
# fmt/gt) rather than the file drivers' band rows; the sugar verbs wrap
# file sources with encode-image for these.
_IMAGE_TABLE_OUT = {
    "raster-clip", "raster-select", "raster-scale", "raster-set-type",
    "raster-reclassify", "raster-hillshade", "raster-slope",
    "raster-aspect", "raster-tpi", "raster-tri", "raster-roughness",
    "raster-color-map", "raster-clean-collar", "raster-sieve",
    "raster-proximity", "raster-fill-nodata", "raster-calc",
    "raster-resize", "raster-cutline", "warp", "raster-reproject",
    "raster-viewshed", "raster-color-merge", "raster-pansharpen",
    "raster-unscale", "raster-rgb-to-palette",
}
_IMAGE_TABLE_IN = _IMAGE_TABLE_OUT | {
    "raster-contour", "raster-contour-polygons", "raster-polygonize",
    "raster-pixel-info", "raster-index", "raster-mosaic", "footprint",
    "tile-assign",
}


# unprefixed steps reachable as bare verbs, per kind — keeps
# `vector warp` from silently resolving the raster step
_BARE_VERBS = {
    "raster": {"warp", "footprint", "tile-assign", "encode-image",
               "decode-image", "georeference-gcps"},
    "vector": {"explode-collections", "geom-stats", "style-explode",
               "exact-dedup", "lang-id", "text-quality"},
}


def cmd_step_verb(kind, verb, rest):
    """Generic ``raster|vector VERB SRC [DST] [opt=val...]`` — sugar
    for a one-step pipeline, mirroring the reference's per-verb
    ``gdal raster hillshade`` style commands (apps/gdalalg_raster_*.cpp
    are each GDALPipelineStepAlgorithm subclasses; the standalone verb
    and the pipeline step are the same code there too)."""
    from .pipeline import STEP_REGISTRY

    cands = [f"{kind}-{verb}"]
    if verb in _BARE_VERBS.get(kind, ()):
        cands.append(verb)
    step = next((c for c in cands if c in STEP_REGISTRY), None)
    if step is None:
        raise SystemExit(
            f"unknown {kind} command {verb!r}; registered steps: "
            f"{', '.join(sorted(STEP_REGISTRY))}")
    opts, pos = _parse_opts(rest)
    if not pos:
        raise SystemExit(f"{kind} {verb} needs a source path")
    read_tokens = ["read", pos[0]]
    if "input_format" in opts:
        read_tokens.append(f"format={opts.pop('input_format')}")
    write_stage = None
    if len(pos) > 1:
        write_stage = ["write", pos[1]]
        for k in ("output_format", "format"):
            if k in opts:
                write_stage.append(f"format={opts.pop(k)}")
                break
    steps = [(step, opts)]
    # file raster sources yield band rows; bracket image-table steps
    # with the schema adapters so the sugar verb Just Works (the full
    # pipeline grammar stays explicit)
    if kind == "raster" and not pos[0].endswith(".parquet"):
        if step in _IMAGE_TABLE_IN:
            steps.insert(0, ("encode-image",
                             {"fmt": opts.pop("work_fmt", "tiff")}))
        if step in _IMAGE_TABLE_OUT and write_stage is not None and \
                not pos[1].endswith(".parquet"):
            steps.append(("decode-image", {}))
    return _execute(read_tokens, steps, write_stage)


def cmd_dataset(args):
    """``gdal dataset identify|copy|rename|delete`` analogues
    (apps/gdalalg_dataset_*.cpp): format identification via the
    source registry's extension/content sniff, and whole-dataset file
    management that carries sidecar files with the dataset (the
    reference moves .shp + .shx + .dbf + .prj together)."""
    import glob
    import shutil

    if not args:
        raise SystemExit("dataset needs a subcommand: "
                         "identify|copy|rename|delete")
    sub, rest = args[0], args[1:]
    opts, pos = _parse_opts(rest)
    if sub == "identify":
        if not pos:
            raise SystemExit("dataset identify needs a path")
        for p in pos:
            try:
                name = _source_name(p, dict(opts))
            except SystemExit:
                name = "unrecognized"
            print(json.dumps({"path": p, "driver": name}))
        return
    if sub not in ("copy", "rename", "delete"):
        raise SystemExit(f"unknown dataset command {sub!r}")
    if not pos or (sub != "delete" and len(pos) < 2):
        raise SystemExit(f"dataset {sub} needs "
                         + ("a path" if sub == "delete"
                            else "SRC and DST"))
    src = pos[0]

    def sidecars(path):
        # shapefile-style multi-file datasets move as a unit
        base, ext = os.path.splitext(path)
        if ext.lower() in (".shp", ".shx", ".dbf", ".prj", ".cpg"):
            return [f for f in glob.glob(glob.escape(base) + ".*")
                    if os.path.splitext(f)[1].lower() in
                    (".shp", ".shx", ".dbf", ".prj", ".cpg")]
        return [path]

    if not os.path.exists(src):
        raise SystemExit(f"dataset {sub}: {src!r} does not exist")
    files = sidecars(src)
    if sub == "delete":
        for f in files:
            (shutil.rmtree if os.path.isdir(f) else os.remove)(f)
        print(f"deleted {src}")
        return
    dst = pos[1]
    dbase = os.path.splitext(dst)[0]
    for f in files:
        target = (dbase + os.path.splitext(f)[1]
                  if len(files) > 1 else dst)
        if os.path.isdir(f):
            shutil.copytree(f, target, dirs_exist_ok=True)
        else:
            shutil.copy2(f, target)
        if sub == "rename":
            os.remove(f) if not os.path.isdir(f) else shutil.rmtree(f)
    print(f"{'renamed' if sub == 'rename' else 'copied'} "
          f"{src} -> {dst}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(USAGE)
        return 0
    import ray
    try:
        if argv[0] == "formats":
            _list_registries()
        elif argv[0] in ("raster", "vector") and len(argv) > 1:
            sub, rest = argv[1], argv[2:]
            if sub == "pipeline":
                run_pipeline_tokens(rest)
            elif sub == "convert":
                cmd_convert(rest)
            elif sub == "info":
                cmd_info(rest)
            elif sub == "tile" and argv[0] == "raster":
                cmd_tile(rest)
            elif sub == "layer-algebra" and argv[0] == "vector":
                cmd_layer_algebra(rest)
            elif sub == "sql" and argv[0] == "vector":
                cmd_vector_sql(rest)
            else:
                cmd_step_verb(argv[0], sub, rest)
        elif argv[0] == "mdim" and len(argv) > 1:
            # "convert" is the reference's alias for translate
            # (apps/gdalalg_mdim_convert.cpp)
            if argv[1] in ("translate", "convert"):
                cmd_mdim_translate(argv[2:])
            elif argv[1] == "info":
                cmd_mdim_info(argv[2:])
            else:
                raise SystemExit(f"unknown mdim command {argv[1]!r}")
        elif argv[0] == "dataset":
            cmd_dataset(argv[1:])
        elif argv[0] == "gnm" and len(argv) > 1 and argv[1] == "path":
            cmd_gnm_path(argv[2:])
        elif argv[0] == "pipeline":
            if len(argv) > 2 and argv[1] == "run":
                run_saved_pipeline(argv[2], argv[3:])
            else:
                run_pipeline_tokens(argv[1:])
        else:
            print(USAGE)
            return 2
        return 0
    finally:
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
