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


def test_wav_fuzz_clean_failures():
    from raydal.io.wav import decode_wav, encode_wav

    rng = np.random.default_rng(21)
    data = encode_wav(
        (rng.standard_normal(500) * 0.4).astype(np.float64), 16000)
    _fuzz(decode_wav, data, rng)


def test_avi_fuzz_clean_failures():
    from raydal.io.avi import decode_avi_frames, encode_avi_mjpeg

    rng = np.random.default_rng(22)
    frames = (np.add.outer(np.arange(16), np.arange(24)) * 3
              % 200).astype(np.uint8)[None].repeat(4, axis=0)
    data = encode_avi_mjpeg(frames, fps=5)
    _fuzz(lambda b: decode_avi_frames(b, indices=[0, 3]), data, rng,
          n_trunc=15, n_flip=25)


def test_fgb_fuzz_clean_failures(tmp_path):
    import pyarrow as pa

    from raydal.geo import wkb as W
    from raydal.io.flatgeobuf import read_flatgeobuf, write_flatgeobuf

    rng = np.random.default_rng(23)
    t = pa.table({
        "wkb": pa.array([W.point_wkb(float(i), float(i % 7))
                         for i in range(40)], pa.binary()),
        "v": pa.array(list(range(40)))})
    p = str(tmp_path / "f.fgb")
    write_flatgeobuf(t, p)
    data = open(p, "rb").read()

    def decode(b):
        q = tmp_path / "fuzz.fgb"
        q.write_bytes(b)
        read_flatgeobuf(str(q))
        read_flatgeobuf(str(q), bbox=(0, 0, 10, 10))

    _fuzz(decode, data, rng, n_trunc=15, n_flip=25)


def test_gpkg_corrupt_blob_clean_failures(tmp_path):
    from raydal.io.gpkg import parse_gpb

    rng = np.random.default_rng(24)
    import struct as _s

    good = (b"GP\x00\x03" + _s.pack("<i", 4326)
            + _s.pack("<4d", 0, 1, 0, 1) + b"\x01" + b"\x00" * 20)
    for _ in range(30):
        buf = bytearray(good)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(0, len(buf)))] = int(
                rng.integers(0, 256))
        try:
            parse_gpb(bytes(buf))
        except OK_ERRORS:
            pass
