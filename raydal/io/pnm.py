"""PNM (netpbm P5/P6) reader-writer, from scratch on the public
netpbm spec.

Reference semantics: ``frmts/raw/pnmdataset.cpp`` — P5 = one grey
band, P6 = three RGB bands; maxval > 255 switches the sample type to
UInt16 stored big-endian (pnmdataset.cpp:238).  Published parity:
``autotest/gdrivers/pnm.py`` byte.pgm band 1 = 4672, rgbsmall.ppm
band 2 = 21053 (tests/test_raw_formats.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_pnm", "write_pnm"]


def _tokens(buf, n):
    """Yield the first ``n`` whitespace-separated header tokens after
    the magic, honouring '#' comments; return (tokens, data_offset)."""
    toks = []
    i = 2
    while len(toks) < n:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            j = buf.find(b"\n", i)
            i = j + 1 if j >= 0 else len(buf)
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        toks.append(int(buf[i:j]))
        i = j
    return toks, i + 1          # single whitespace after maxval


def read_pnm(src):
    """P5/P6 file (path or bytes) → (array[bands, h, w], None, None)."""
    if isinstance(src, (bytes, bytearray, memoryview)):
        buf = bytes(src)
    else:
        with open(src, "rb") as f:
            buf = f.read()
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM (P5/P6) file")
    (w, h, maxval), off = _tokens(buf, 3)
    nb = 1 if magic == b"P5" else 3
    dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    need = w * h * nb
    arr = np.frombuffer(buf, dtype=dt, count=need, offset=off)
    if nb == 1:
        out = arr.reshape(1, h, w)
    else:
        out = arr.reshape(h, w, 3).transpose(2, 0, 1)
    return out.astype(np.uint16 if maxval > 255 else np.uint8), \
        None, None


def write_pnm(arr, path, maxval=None):
    """array[bands, h, w] (1 or 3 bands, uint8/uint16) → P5/P6 file."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None]
    nb, h, w = arr.shape
    if nb not in (1, 3):
        raise ValueError("PNM supports 1 (P5) or 3 (P6) bands")
    if maxval is None:
        maxval = 65535 if arr.dtype.itemsize > 1 else 255
    magic = b"P5" if nb == 1 else b"P6"
    dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    body = (arr[0] if nb == 1 else
            arr.transpose(1, 2, 0)).astype(dt).tobytes()
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n%d\n" % (w, h, maxval))
        f.write(body)
    return path
