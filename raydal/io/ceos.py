"""CEOS (LGSOWG Super-Structure) imagery reader, from scratch.

Mirrors the reference's generic CEOS driver
(``frmts/ceos/ceosopen.c``) semantics, derived from its published
test (``autotest/gdrivers/ceos.py``: the truncated IRS LGSOWG scene's
band 4 reads to checksum 9956 over its 5932×3 valid window):

* records carry a 12-byte header (sequence u32, 4 type bytes, length
  u32) in either byte order — the little-endian variant (#1862) is
  detected from the descriptor record's plausibility,
* the imagery file descriptor supplies the layout at the reference's
  exact column offsets: record count @180, record length @186, bits
  per pixel @216, bands @232, lines @236, pixels @248, prefix @276
  and suffix @288 bytes,
* band b / line l data starts at
  ``desc_len + l*(bands*rec_len) + b*rec_len + 12 + prefix``
  (band-interleaved-by-line); truncated files read available lines
  and zero-fill the rest.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_ceos"]


def _scan_int(buf, off, n):
    try:
        return int(buf[off:off + n].decode("ascii", "replace").strip()
                   or 0)
    except ValueError:
        return 0


def read_ceos(path):
    """CEOS imagery file → dict with ``data`` (bands, lines, pixels),
    ``valid_lines`` (lines actually present in a truncated file)."""
    buf = open(path, "rb").read()
    if len(buf) < 12:
        raise ValueError("not a CEOS file")
    len_le = struct.unpack_from("<I", buf, 8)[0]
    len_be = struct.unpack_from(">I", buf, 8)[0]
    little = 12 <= len_le <= len(buf) and not (12 <= len_be <= len_le)
    rec_len = len_le if little else len_be

    # offsets are into the whole record, header included (the
    # reference's pachData spans the full record)
    data = buf[:rec_len]
    nrec = _scan_int(data, 180, 6)
    img_rec_len = _scan_int(data, 186, 6)
    bits = _scan_int(data, 216, 4)
    nbands = _scan_int(data, 232, 4)
    nlines = _scan_int(data, 236, 8)
    npixels = _scan_int(data, 248, 8)
    prefix = _scan_int(data, 276, 4)
    if img_rec_len <= 0 or nbands <= 0 or npixels <= 0 or nlines <= 0:
        raise ValueError("implausible CEOS image descriptor")
    if bits != 8:
        raise NotImplementedError(f"CEOS {bits}-bit samples")

    line_off = nbands * img_rec_len
    out = np.zeros((nbands, nlines, npixels), dtype=np.uint8)
    valid = 0
    for line in range(nlines):
        base = rec_len + line * line_off
        if base + line_off > len(buf) + img_rec_len - 1:
            # allow a final partial line group only if every band of
            # this line is fully present
            pass
        complete = True
        for b in range(nbands):
            start = base + b * img_rec_len + 12 + prefix
            end = start + npixels
            if end > len(buf):
                complete = False
                break
            out[b, line] = np.frombuffer(buf, np.uint8, npixels, start)
        if not complete:
            break
        valid = line + 1
    return {"data": out, "valid_lines": valid, "bands": nbands,
            "lines": nlines, "pixels": npixels,
            "record_count": nrec, "little_endian": little}
