from . import checksum, resample  # noqa: F401
