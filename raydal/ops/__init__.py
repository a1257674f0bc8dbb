from . import (ann, color, contour, dedup, fill, footprint, grid, join,
               polygonize, stencil,
               raster_math, rasterize, text, tile, vector, warp)  # noqa: F401
