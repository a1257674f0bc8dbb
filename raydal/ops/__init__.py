from . import ann, dedup, footprint, join, text, tile, warp  # noqa: F401
