"""Tile mosaic + pyramid reduction — the groupby-aggregate shuffle stage.

Mosaic semantics: per pixel, the contribution of the highest image index
wins ("last painted wins" under deterministic image_id order — the
order-sensitivity note of SURVEY §7.4 resolved by making the merge an
associative per-pixel argmax).  Because the merge is associative and
commutative, hot tiles can be **salted**: stage 1 composes partials per
``(cell, salt)``, stage 2 merges partials per ``cell`` — the two-stage
reduce the north rule mandates for skew; each partial carries a per-pixel
winner map so the merge is exact.

Pyramid: per level ``groupby(parent_cell).map_groups`` composes the ≤4
children (child key ``>>1``, gdal2tiles.py:1477 keying) and 2×-average
downsamples — one groupby per level, driver-looped (the z+1→z barrier of
``apps/gdalalg_raster_tile.cpp:3080``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo import cells
from ..io.codecs import encode as _codec_encode
from ..io.png import decode_png, encode_png
from ..kernels.resample import copy_words_cast, downsample2_average

__all__ = ["image_ord", "compose_group", "merge_partials_group",
           "mosaic_tiles", "pyramid_level", "build_pyramid"]

TILE = 256


def image_ord(image_id):
    """Deterministic paint-order integer for an image id (img-%012d).

    The fallback must be stable ACROSS PROCESSES (salt bucket and winner
    map are computed in different Ray workers) — crc32, never ``hash``
    (which is per-process randomized for strings).
    """
    import zlib

    s = str(image_id)
    tail = s.rsplit("-", 1)[-1]
    try:
        return int(tail)
    except ValueError:
        # 63-bit: forward + reversed crc32 (independent linear
        # functionals — same trick as dedup's content hash) so two
        # arbitrary ids virtually never collide; a 31-bit fallback made
        # paint order depend on shuffle arrival for colliding ids.
        b = s.encode("utf-8")
        return (zlib.crc32(b) | (zlib.crc32(b[::-1]) << 32)) \
            & 0x7FFFFFFFFFFFFFFF


def _unpack_mask(blob, ts=TILE):
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8),
                         count=ts * ts)
    return bits.reshape(ts, ts).astype(bool)


def _compose_rows(rgbs, masks, ords, ts=TILE):
    """Per-pixel winner compose → (rgb uint8, winner int64 map)."""
    winner = np.full((ts, ts), -1, dtype=np.int64)
    out = np.zeros((ts, ts, 3), dtype=np.uint8)
    order = np.argsort(ords, kind="stable")
    for i in order:  # ascending ord; later (higher) overwrites
        m = masks[i]
        out[m] = rgbs[i][m]
        winner[m] = ords[i]
    return out, winner


def compose_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn: all contributions of one (cell[, salt]) → one partial.

    Emits (cell, z, tile_x, tile_y, tile_rgb, winner, n_contrib).
    """
    ts = TILE
    rgbs = [np.frombuffer(b, dtype=np.uint8).reshape(ts, ts, 3)
            for b in g["tile_rgb"]]
    masks = [_unpack_mask(b, ts) for b in g["tile_mask"]]
    ords = np.array([image_ord(i) for i in g["image_id"]])
    rgb, winner = _compose_rows(rgbs, masks, ords, ts)
    return pd.DataFrame({
        "cell": [g["cell"].iloc[0]], "z": [g["z"].iloc[0]],
        "tile_x": [g["tile_x"].iloc[0]], "tile_y": [g["tile_y"].iloc[0]],
        "tile_rgb": [rgb.tobytes()], "winner": [winner.tobytes()],
        "n_contrib": [len(g)]})


def merge_partials_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn: merge salted partials of one cell (per-pixel argmax)."""
    ts = TILE
    # stack partials to (n, ts, ts[,3]) and reduce with one argmax —
    # first-max wins, matching the sequential strict-greater update
    # (all-invalid pixels carry rgb 0 in every partial, so gathering
    # from partial 0 there reproduces the zero fill)
    prgb = np.stack([np.frombuffer(b, dtype=np.uint8).reshape(ts, ts, 3)
                     for b in g["tile_rgb"]])
    pwin = np.stack([np.frombuffer(b, dtype=np.int64).reshape(ts, ts)
                     for b in g["winner"]])
    best = pwin.argmax(axis=0)
    winner = np.take_along_axis(pwin, best[None], 0)[0]
    rgb = np.take_along_axis(prgb, best[None, :, :, None], 0)[0]
    return pd.DataFrame({
        "cell": [g["cell"].iloc[0]], "z": [g["z"].iloc[0]],
        "tile_x": [g["tile_x"].iloc[0]], "tile_y": [g["tile_y"].iloc[0]],
        "tile_rgb": [rgb.tobytes()], "winner": [winner.tobytes()],
        "n_contrib": [int(g["n_contrib"].sum())]})


def mosaic_tiles(contrib_ds, salt=0):
    """Contributions (cell, z, x, y, image_id, tile_rgb, tile_mask) →
    one composed row per cell.

    ``salt > 0`` enables the two-stage skew-safe reduce: partials per
    ``(cell, salt)`` with ``salt = image_ord % salt``, then a final merge
    per cell.  With ``salt=0`` a single groupby composes directly.
    """
    if salt and salt > 1:
        def add_salt(t: pa.Table) -> pa.Table:
            s = np.array([image_ord(i) % salt
                          for i in t["image_id"].to_pylist()],
                         dtype=np.int32)
            return t.append_column("salt", pa.array(s))

        partials = (contrib_ds
                    .map_batches(add_salt, batch_format="pyarrow")
                    .groupby(["cell", "salt"])
                    .map_groups(compose_group, batch_format="pandas"))
        return partials.groupby("cell").map_groups(
            merge_partials_group, batch_format="pandas")
    return contrib_ds.groupby("cell").map_groups(
        compose_group, batch_format="pandas")


def _parent_key_batch(t: pa.Table) -> pa.Table:
    cell = np.asarray(t["cell"], dtype=np.int64)
    return t.append_column("parent",
                           pa.array(cells.parent_cell(cell), pa.int64()))


def _compose4_group(g: pd.DataFrame) -> pd.DataFrame:
    """4 children (z+1) → 1 parent tile at z (2×2 compose + 2× average).

    Validity (the ``winner`` map: −1 = never painted) propagates up the
    pyramid: each parent pixel averages only its VALID child pixels —
    missing children / uncovered pixels no longer darken coverage edges
    — and the parent's own winner map marks pixels with no valid child
    as −1."""
    ts = TILE
    parent = int(g["parent"].iloc[0])
    pz, px, py = (int(v) for v in cells.unpack_cell(np.int64(parent)))
    big = np.zeros((2 * ts, 2 * ts, 3), dtype=np.float64)
    valid = np.zeros((2 * ts, 2 * ts), dtype=bool)
    winners = (g["winner"].values if "winner" in g.columns
               else [None] * len(g))
    for cell_v, rgb_b, win_b in zip(g["cell"].values, g["tile_rgb"].values,
                                    winners):
        cz, cx, cy = (int(v) for v in cells.unpack_cell(np.int64(cell_v)))
        ox = (cx - 2 * px) * ts
        oy = (cy - 2 * py) * ts
        rgb = np.frombuffer(rgb_b, dtype=np.uint8).reshape(ts, ts, 3)
        big[oy:oy + ts, ox:ox + ts] = rgb
        if win_b is not None:
            w = np.frombuffer(win_b, dtype=np.int64).reshape(ts, ts)
            valid[oy:oy + ts, ox:ox + ts] = w >= 0
        else:
            valid[oy:oy + ts, ox:ox + ts] = True
    vblk = valid.reshape(ts, 2, ts, 2)
    cnt = vblk.sum(axis=(1, 3)).astype(np.float64)
    small = np.zeros((ts, ts, 3), dtype=np.uint8)
    for b in range(3):
        s = (big[:, :, b] * valid).reshape(ts, 2, ts, 2).sum(axis=(1, 3))
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
        small[:, :, b] = copy_words_cast(avg, np.uint8)
    pwin = np.where(cnt > 0, 0, -1).astype(np.int64)
    return pd.DataFrame({
        "cell": [parent], "z": [pz], "tile_x": [px], "tile_y": [py],
        "tile_rgb": [small.tobytes()], "winner": [pwin.tobytes()],
        "n_contrib": [int(g["n_contrib"].sum())]})


def pyramid_level(tiles_ds):
    """One pyramid step: tiles at z → composed tiles at z−1."""
    return (tiles_ds
            .map_batches(_parent_key_batch, batch_format="pyarrow")
            .groupby("parent")
            .map_groups(_compose4_group, batch_format="pandas"))


def build_pyramid(base_tiles_ds, z_max, z_min):
    """Full reduction z_max → z_min; returns {z: Dataset}.

    Each level is materialized before reducing further (the per-level
    barrier of the reference tiler); levels stay in the object store.
    """
    levels = {z_max: base_tiles_ds}
    cur = base_tiles_ds
    for z in range(z_max - 1, z_min - 1, -1):
        cur = pyramid_level(cur).materialize()
        levels[z] = cur
    return levels


def encode_tiles_batch(t: pa.Table, fmt="png") -> pa.Table:
    """Raw tile_rgb → encoded bytes (sink-side encode stage).

    ``fmt``: "png" (default), "webp" (lossless VP8L,
    :mod:`raydal.io.webp`) or "jpeg" — the reference tiler's
    ``gdal raster tile`` output-format choice (``frmts/webp/``
    precedent for the webp case)."""
    blobs = [_codec_encode(np.frombuffer(b, dtype=np.uint8)
                           .reshape(TILE, TILE, 3), fmt)
             for b in t["tile_rgb"].to_pylist()]
    out = t.drop_columns([c for c in ("tile_rgb", "winner")
                          if c in t.schema.names])
    return out.append_column(fmt, pa.array(blobs, pa.binary()))
