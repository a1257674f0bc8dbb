from . import affine, cells, crs, wkb  # noqa: F401
