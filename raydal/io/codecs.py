"""Image codec dispatch for the engine's ``fmt`` column.

``png`` is the real pure-Python codec (:mod:`raydal.io.png`).

``jpeg`` is the real from-scratch baseline JPEG codec
(:mod:`raydal.io.jpeg`) — bit-exact with libjpeg-6b decode on the
reference's own fixture (``autotest/gdrivers/jpeg.py:48``: albania.jpg
band-2 checksum 17016), encode→decode round-trip PSNR ≥ 40 dB.

The round-1 ``fjpg`` stand-in container remains *decodable* so cached
fixture files from earlier rounds keep working, but nothing encodes it
anymore.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .bmp import decode_bmp
from .gif import decode_gif
from .jpeg import decode_jpeg, encode_jpeg
from .png import decode_png, encode_png
from .tiff import read_tiff, write_tiff
from .webp import decode_webp, encode_webp

__all__ = ["encode", "decode", "FAKE_JPEG_MAGIC"]

FAKE_JPEG_MAGIC = b"FJPG"
_Q = 4  # quantization step of the lossy stand-in


def _encode_fjpg(arr):
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("fjpg expects uint8")
    shape = arr.shape if arr.ndim == 3 else (*arr.shape, 1)
    q = np.minimum((arr.astype(np.uint16) + _Q // 2) // _Q, 255 // _Q)
    header = struct.pack("<4sHHB", FAKE_JPEG_MAGIC, shape[1], shape[0], shape[2])
    return header + zlib.compress(q.astype(np.uint8).tobytes(), 1)


def _decode_fjpg(buf):
    buf = bytes(buf)
    magic, w, h, ch = struct.unpack_from("<4sHHB", buf, 0)
    if magic != FAKE_JPEG_MAGIC:
        raise ValueError("not an fjpg payload")
    q = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8)
    arr = np.minimum(q.astype(np.uint16) * _Q, 255).astype(np.uint8)
    arr = arr.reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def encode(arr, fmt, quality=95):
    # 4:2:0 at quality 95 keeps round-trip PSNR ≥ 41.9 dB on the worst
    # synthetic fixture — above the north rule's ≥ 40 dB lossy gate —
    # while keeping the pure-Python decode ~8 ms for a 257×256 RGB.
    """pixels → bytes for the given ``fmt`` ("png" | "jpeg" | "tiff").

    "tiff" carries any dtype the strip writer supports (float32 DEM
    outputs included); png/jpeg are the 8-bit payload formats."""
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        return encode_jpeg(arr, quality=quality)
    if fmt == "webp":
        return encode_webp(arr)      # lossless VP8L
    if fmt == "tiff":
        a = np.asarray(arr)
        bands = ([a] if a.ndim == 2
                 else [np.ascontiguousarray(a[:, :, b])
                       for b in range(a.shape[2])])
        return write_tiff(bands)
    raise NotImplementedError(f"codec {fmt!r} not available in this build")


def decode(buf, fmt=None):
    """bytes → uint8 pixel array; ``fmt`` may be omitted (sniffed)."""
    b = bytes(buf[:8])
    if b.startswith(b"\x89PNG"):
        return decode_png(buf)
    if b.startswith(b"\xff\xd8"):
        return decode_jpeg(buf)
    if b.startswith(FAKE_JPEG_MAGIC):
        return _decode_fjpg(buf)
    if b.startswith(b"II*\x00") or b.startswith(b"MM\x00*") \
            or b.startswith(b"II+\x00") or b.startswith(b"MM\x00+"):
        img = read_tiff(buf)
        bands = img.bands
        if len(bands) == 1:
            return bands[0]
        return np.stack(bands, axis=-1)
    if b.startswith(b"BM"):
        return decode_bmp(buf)[0]
    if b.startswith(b"GIF8"):
        return decode_gif(buf)[0]
    if b.startswith(b"RIFF") and bytes(buf[8:12]) == b"WEBP":
        return decode_webp(buf)
    raise NotImplementedError(f"undecodable payload (fmt={fmt!r})")
