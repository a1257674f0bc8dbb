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
