"""Image codec dispatch for the engine's ``fmt`` column.

``png`` is the real pure-Python codec (:mod:`raydal.io.png`).

``jpeg`` is a **deterministic lossy stand-in** — no JPEG library exists in
this container, so real JPEG decode is stubbed per the build contract: the
``fjpg`` container below quantizes samples to 6 bits (uniform q=4) and
zlib-compresses, giving a genuinely lossy round-trip with PSNR ≈ 46 dB
(above the north rule's ≥ 40 dB gate) while keeping every piece of
Ray-side plumbing (binary column → decode actor → pixel batches) real.
Swap :func:`decode` / :func:`encode`'s ``jpeg`` branch for libjpeg-turbo
bindings in a full deployment; everything downstream is format-agnostic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .png import decode_png, encode_png

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


def encode(arr, fmt):
    """uint8 pixels → bytes for the given ``fmt`` ("png" | "jpeg")."""
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        return _encode_fjpg(arr)
    raise NotImplementedError(f"codec {fmt!r} not available in this build")


def decode(buf, fmt=None):
    """bytes → uint8 pixel array; ``fmt`` may be omitted (sniffed)."""
    b = bytes(buf[:8])
    if b.startswith(b"\x89PNG"):
        return decode_png(buf)
    if b.startswith(FAKE_JPEG_MAGIC):
        return _decode_fjpg(buf)
    raise NotImplementedError(
        f"undecodable payload (fmt={fmt!r}); real JPEG decode is stubbed "
        "in this environment")
