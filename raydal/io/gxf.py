"""Geosoft GXF ASCII grid reader, from scratch on the published
grammar.

Reference semantics (``frmts/gxf/gxfopen.c``): ``#TAG`` headers with
value lines until the next tag; ``#GRID`` starts the data.  GTYPE 0
is whitespace-separated ASCII values (dummy matched as a STRING
against the #DUMMY text, :483-516); GTYPE N>0 is base-90 compression
— each datum is N chars of ``(c-37)`` base-90 digits scaled by the
#TRANSFORM ``value*scale + offset``; ``!`` marks a dummy and ``"``
starts a (count, value) run, both padded to N chars (:520-590,
GXFParseBase90 :437-454).  Rows are stored per #SENSE — the default
GXFS_LL_UP (1) stores bottom-up left-to-right, mirrored to north-up
on read (GXFGetScanline).  Unset dummies surface as −1e12
(gxfopen.c:828).

Published parity (``autotest/gdrivers/gxf.py``): small.gxf = 90
(GTYPE 0), small2.gxf = 65042 (GTYPE 3 base-90 + TRANSFORM).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_gxf"]

DUMMY_TO = -1e12


def read_gxf(src):
    """GXF grid (path or bytes) → (array[1, h, w] float64 north-up,
    geotransform, nodata)."""
    if isinstance(src, (bytes, bytearray)):
        text = src.decode("latin-1")
    else:
        with open(src, encoding="latin-1") as f:
            text = f.read()
    lines = text.splitlines()

    tags = {}
    i = 0
    grid_at = None
    while i < len(lines):
        s = lines[i].strip()
        if s.startswith("#"):
            name = s[1:].split()[0].upper()
            if name.startswith("GRID"):
                grid_at = i + 1
                break
            vals = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith("#"):
                vals.append(lines[i])
                i += 1
            tags[name] = vals
            continue
        i += 1
    if grid_at is None:
        raise ValueError("no #GRID section in GXF file")

    def tag1(*names, default=None):
        for n in names:
            for k, v in tags.items():
                if k.startswith(n) and v:
                    return v[0].strip()
        return default

    nx = int(tag1("POIN"))
    ny = int(tag1("ROWS"))
    dx = float(tag1("PTSE", default="1"))
    dy = float(tag1("RWSE", default="1"))
    xorig = float(tag1("XORI", default="0"))
    yorig = float(tag1("YORI", default="0"))
    sense = int(tag1("SENS", default="1"))
    gtype = int(tag1("GTYP", default="0"))
    dummy_text = tag1("DUMM")
    scale, offset = 1.0, 0.0
    tr = tag1("TRAN")
    if tr:
        parts = tr.split()
        scale, offset = float(parts[0]), float(parts[1])

    vals = np.full(nx * ny, DUMMY_TO, np.float64)
    n_read = 0
    if gtype == 0:
        for ln in lines[grid_at:]:
            for tok in ln.split():
                if n_read >= nx * ny:
                    break
                vals[n_read] = DUMMY_TO if tok == dummy_text \
                    else float(tok)
                n_read += 1
            if n_read >= nx * ny:
                break
    else:
        g = gtype

        def base90(s):
            v = 0
            for c in s:
                v = v * 90 + (ord(c) - 37)
            return v

        # stream of g-char cells across data lines (cells never span
        # line breaks — the reference refills at a line boundary)
        pending_count = None
        stage = 0                       # 0 normal, 1 want count, 2 want value
        for ln in lines[grid_at:]:
            pos = 0
            while pos + g <= len(ln) and n_read < nx * ny:
                cell = ln[pos:pos + g]
                pos += g
                if stage == 1:
                    pending_count = base90(cell)
                    stage = 2
                elif stage == 2:
                    v = DUMMY_TO if cell[0] == "!" \
                        else base90(cell) * scale + offset
                    k = min(pending_count, nx * ny - n_read)
                    vals[n_read:n_read + k] = v
                    n_read += k
                    stage = 0
                elif cell[0] == "!":
                    vals[n_read] = DUMMY_TO
                    n_read += 1
                elif cell[0] == '"':
                    stage = 1
                else:
                    vals[n_read] = base90(cell) * scale + offset
                    n_read += 1
            if n_read >= nx * ny:
                break

    arr = vals.reshape(ny, nx)
    # SENSE handling (GXFGetScanline): 1 = LL_UP (bottom-up), the
    # north-up default; -1 = UL_RIGHT already top-down; ±2 columns
    # unsupported like the reference's scanline API
    if sense == 1:
        arr = arr[::-1]
    elif sense == -1:
        pass
    elif sense == -2 or sense == 2:
        raise NotImplementedError("column-oriented GXF #SENSE")
    gt = (xorig - dx / 2, dx, 0.0,
          yorig + (ny - 0.5) * dy, 0.0, -dy)
    return arr[None], gt, DUMMY_TO
