"""raydal — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the core raster/vector machinery of the
GDAL reference (semantics only — no code ported): affine/CRS math, tile
matrix indexing with `gdal raster tile` parity, WKB geometry with
crossing-number point-in-polygon, GDAL-parity resampling kernels and
checksums — all expressed as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, with actor pools holding
transformer / spatial-index state.

Layout:
  geo/      pure-numpy math: affine geotransforms, tile/cell/Hilbert codes,
            CRS transforms (WebMercator + UTM from public formulas), WKB.
  kernels/  resampling kernels (GDAL formula parity) and checksum.
  io/       image codecs (pure-Python PNG; deterministic fake lossy codec)
            and the synthetic Lance-equivalent image-table generator.
  ops/      Ray Data operators: decode, warp, tile assignment + pyramid,
            cell-partitioned spatial join, PIP, kNN, rasterize, polygonize,
            dedup (exact / MinHash-LSH / SimHash), text analysis, ANN.
  lineage.py  per-partition manifests + checkpoint-resume.

No module in this package calls ``ray.init()``; sessions are owned by the
caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"

# Library-boundary portability: Ray workers inherit the driver's cwd, so
# when the driver runs from the repo root they import `raydal` by name.
# From any other cwd the workers cannot resolve the package, so ship it
# by value with cloudpickle (same mechanism as __ray_entry__).  Gated on
# the cwd check to keep the common in-repo path on cheap by-reference
# pickling (and to avoid importing ray when it isn't needed).
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if (_os.getcwd() != _REPO_ROOT
        and _REPO_ROOT not in
        _os.environ.get("PYTHONPATH", "").split(_os.pathsep)):
    try:
        from ray import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:  # pragma: no cover — ray absent / older API
        pass
del _os, _sys
