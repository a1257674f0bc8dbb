"""GDAL-parity image checksum.

Replicates ``GDALChecksumImage`` (``alg/gdalchecksum.cpp:44,150-185``):

* primes [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43] cycled positionally —
  for pixel (x, y) of an ``nXSize``-wide window the prime index is
  ``(y * nXSize + x) % 11`` (the reference re-seeds ``iPrime`` per line
  exactly this way, ``:161-163``);
* floating data goes through the GDALCopyWords float→Int32 convention
  (``:64-85``): non-finite → INT_MIN, else add 0.5, clamp to ±2147483647,
  then **floor** (``static_cast<GInt32>(floor(dfVal))``);
* integer data is clamped to the Int32 range exactly as the reference's
  GDT_Int32 read path does;
* checksum accumulates ``int_val % prime`` and is masked ``& 0xffff``
  after every line.
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)

__all__ = ["checksum"]


def _int_from_double(a):
    a = np.asarray(a, dtype=np.float64)
    out = np.empty(a.shape, dtype=np.int64)
    finite = np.isfinite(a)
    v = a[finite] + 0.5
    v = np.clip(v, -2147483647.0, 2147483647.0)
    out[finite] = np.floor(v).astype(np.int64)
    out[~finite] = np.iinfo(np.int32).min
    return out


def checksum(arr):
    """16-bit checksum of a 2-D array, GDALChecksumImage parity.

    Integer dtypes are used as-is; floats go through the CopyWords
    conversion.  The positional prime cycle makes the result sensitive to
    pixel position, so tiles must be checksummed in their own frame.
    """
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("checksum expects a 2-D band")
    h, w = arr.shape
    if np.issubdtype(arr.dtype, np.floating):
        vals = _int_from_double(arr)
    else:
        # the reference reads integer bands through GDT_Int32 → clamp
        vals = np.clip(arr.astype(np.int64), -2147483648, 2147483647)
    idx = (np.arange(h, dtype=np.int64)[:, None] * w
           + np.arange(w, dtype=np.int64)[None, :]) % 11
    mods = vals % _PRIMES[idx]
    # C's % keeps the sign of the dividend; numpy's follows the divisor.
    neg = vals < 0
    if neg.any():
        mods = np.where(neg & (mods != 0), mods - _PRIMES[idx], mods)
    # per-line accumulate with & 0xffff after each line (parity)
    total = 0
    for row in mods.sum(axis=1, dtype=np.int64):
        total = (total + int(row)) & 0xFFFF
    return total
