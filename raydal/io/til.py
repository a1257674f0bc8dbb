"""EarthWatch/DigitalGlobe .TIL tiled-mosaic reader, from scratch on
the published layout.

Reference semantics (``frmts/til/tildataset.cpp``): a text header —
``numTiles``, per-tile ``TILE_n.filename`` plus UL/LR pixel offsets —
describing a mosaic of sibling TIFF tiles; the dataset extent is the
offset envelope and each tile pastes at its UL offset.  Published
parity: testtil.til = 4672 (``autotest/gdrivers/til.py``).
"""

from __future__ import annotations

import os
import re

import numpy as np

from .tiff import read_tiff

__all__ = ["read_til"]


def read_til(path):
    """.TIL file → (array[bands, h, w], geotransform or None, None)."""
    with open(path, encoding="latin-1") as f:
        text = f.read()

    def vals(key):
        return re.findall(rf"TILE_(\d+)\.{key}\s*=\s*(\S+)", text)

    names = {int(i): v.strip('";') for i, v in vals("filename")}
    ulc = {int(i): int(v.rstrip(";")) for i, v in vals("ULColOffset")}
    ulr = {int(i): int(v.rstrip(";")) for i, v in vals("ULRowOffset")}
    if not names:
        raise ValueError("no TILE_n.filename entries in .TIL")
    base = os.path.dirname(path)

    tiles = {}
    for i, fn in names.items():
        with open(os.path.join(base, fn), "rb") as f:
            r = read_tiff(f.read())
        tiles[i] = (np.stack(r.bands), r.geotransform)

    nb = tiles[min(tiles)][0].shape[0]
    w = max(ulc[i] + tiles[i][0].shape[2] for i in tiles)
    h = max(ulr[i] + tiles[i][0].shape[1] for i in tiles)
    out = np.zeros((nb, h, w), tiles[min(tiles)][0].dtype)
    for i, (a, _gt) in tiles.items():
        out[:, ulr[i]:ulr[i] + a.shape[1],
            ulc[i]:ulc[i] + a.shape[2]] = a

    # geotransform from the tile at offset (0,0) when georeferenced
    gt = None
    for i, (a, tgt) in tiles.items():
        if tgt is not None and ulc[i] == 0 and ulr[i] == 0:
            gt = tgt
            break
    return out, gt, None
