"""Robustness: malformed codec inputs must fail cleanly (typed
exceptions, bounded work) — never hang, loop, or return garbage
silently.  Web-scale ingest sees truncated/corrupt files constantly."""

import zlib

import numpy as np
import pytest

from raydal.io.jpeg import decode_jpeg
from raydal.io.png import decode_png
from raydal.io.shapefile import read_shapefile
from raydal.io.tiff import read_tiff

OK_ERRORS = (ValueError, NotImplementedError, IndexError, KeyError,
             EOFError, OverflowError, MemoryError, zlib.error,
             struct_error := __import__("struct").error)

TIFF_FIX = "/root/reference/autotest/gcore/data/byte.tif"
JPEG_FIX = "/root/reference/autotest/gdrivers/data/jpeg/albania.jpg"
PNG_FIX = "/root/reference/autotest/gdrivers/data/png/test.png"


def _fuzz(decode, data, rng, n_trunc=25, n_flip=40):
    for _ in range(n_trunc):
        cut = int(rng.integers(0, len(data)))
        try:
            decode(data[:cut])
        except OK_ERRORS:
            pass
    for _ in range(n_flip):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 8))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        try:
            decode(bytes(buf))
        except OK_ERRORS:
            pass


def test_tiff_fuzz_clean_failures():
    with open(TIFF_FIX, "rb") as f:
        data = f.read()
    _fuzz(read_tiff, data, np.random.default_rng(1))


def test_jpeg_fuzz_clean_failures():
    with open(JPEG_FIX, "rb") as f:
        data = f.read()
    _fuzz(decode_jpeg, data, np.random.default_rng(2), n_trunc=10,
          n_flip=15)


def test_png_fuzz_clean_failures():
    with open(PNG_FIX, "rb") as f:
        data = f.read()
    _fuzz(decode_png, data, np.random.default_rng(3))


def test_shp_truncation_clean_failures(tmp_path):
    with open("/root/reference/autotest/ogr/data/poly.shp", "rb") as f:
        shp = f.read()
    rng = np.random.default_rng(4)
    for _ in range(20):
        cut = int(rng.integers(0, len(shp)))
        p = tmp_path / "t.shp"
        p.write_bytes(shp[:cut])
        try:
            read_shapefile(str(p))
        except OK_ERRORS:
            pass


def test_empty_and_tiny_inputs():
    for decode in (read_tiff, decode_jpeg, decode_png):
        for blob in (b"", b"\x00", b"II", b"\xff\xd8", b"\x89PNG"):
            with pytest.raises(OK_ERRORS):
                decode(blob)


def test_tiff_corrupt_errors_are_typed():
    """read_tiff normalizes corrupt input to ValueError — struct.error
    (truncated headers) and bare KeyError (corrupt LZW codes) must not
    leak to pipeline callers (ADVICE r2)."""
    data = open(TIFF_FIX, "rb").read()
    rng = np.random.default_rng(5)
    typed = (ValueError, NotImplementedError, IndexError, EOFError,
             OverflowError, MemoryError, zlib.error)
    for _ in range(80):
        cut = int(rng.integers(0, len(data)))
        try:
            read_tiff(data[:cut])
        except typed:
            pass
    for _ in range(80):
        b = bytearray(data)
        i = int(rng.integers(0, len(b)))
        b[i] ^= 0xFF
        try:
            read_tiff(bytes(b))
        except typed:
            pass
