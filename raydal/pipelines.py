"""Flagship pipeline: image table → decode → warp → tile-assign → zone join.

This is the BASELINE.json headline workload (spatial-join +
tile-assignment throughput in images/sec).  The image table is derived
deterministically from the driver's ``part`` table keys (no external
data): synthesis is itself a Ray stage, cached once per scale under
``/tmp`` so the *timed* pipeline starts from a columnar read like a real
deployment reads Lance.

Physical plan (see :func:`flagship`): ONE fused actor-pool pass over the
image bytes (decode → warp → tile-cover → broadcast zone join) followed
by a single-pass streaming reduce of bounded-cardinality partials; the
unbounded tile reduction lives in :func:`tile_pyramid` (salted two-stage
groupby).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .io import images as imgfix
from .ops.footprint import add_footprint, assign_tiles
from .ops.join import SpatialJoinZones, ZoneIndex
from .ops.warp import WarpImages

__all__ = ["ensure_images_parquet", "ensure_zone_index", "flagship",
           "image_count_for_sf"]

_CACHE_ROOT = os.environ.get("RAYDAL_CACHE", "/tmp/raydal_cache")


def image_count_for_sf(sf_dir):
    """Image-table size derived from the sf's part-table row count."""
    return pq.read_metadata(os.path.join(sf_dir, "part.parquet")).num_rows


def ensure_images_parquet(sf_dir=None, n=None, use_ray=True):
    """Materialize (once) the deterministic image table for this scale.

    Uses the ``part`` table's key count as n; generation is a Ray
    ``map_batches`` fan-out over the index range.  Atomic publish via
    tmp + rename so concurrent callers are safe.
    """
    if n is None:
        n = image_count_for_sf(sf_dir)
    out = os.path.join(_CACHE_ROOT, f"images_{n}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    # per-writer tmp dir: concurrent callers must never share a staging
    # path (one writer's rmtree would eat the other's in-progress files)
    tmp = f"{out}.tmp.{os.getpid()}"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if use_ray:
        import ray.data

        def gen(batch: pa.Table) -> pa.Table:
            return imgfix.synthesize_images_batch(np.asarray(batch["id"]))

        # ~2500 rows (~50-80 MB) per output file: block-sized for the read
        # side — hundreds of tiny files would dominate the pipeline with
        # per-task overhead at read time.
        n_files = max(1, n // 640)
        (ray.data.range(n, override_num_blocks=max(n_files * 4, 8))
         .map_batches(gen, batch_format="pyarrow", batch_size=256)
         .repartition(n_files)
         .write_parquet(tmp, row_group_size=128))
    else:
        imgfix.write_images_parquet(os.path.join(tmp, "part-0.parquet"), n)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another writer won
    return out


def audio_count_for_sf(sf_dir):
    """Audio-clip-table size derived from the sf's part-table rows."""
    return max(40, image_count_for_sf(sf_dir) // 5)


def synthesize_audio_batch(indices):
    """Deterministic audio-clip rows for the given clip indices.

    Each clip is a two-tone sine mixture + seeded noise, quantized and
    containerized as a REAL audio file (bit depth cycles 16/16/8/24/32,
    every 4th clip stereo): every 10th clip is a FLAC-in-Ogg stream
    (:func:`raydal.io.ogg.encode_ogg_flac`), every other 5th a native
    FLAC stream (:func:`raydal.io.flac.encode_flac` — both lossless,
    same decoded values as PCM), the rest RIFF/WAVE via
    :func:`raydal.io.wav.encode_wav`.  The
    ground-truth decoded mono samples (quantization formula applied
    directly, independent of the container parse under test) are
    stored as a ``list<double>`` column so a SQL oracle can recompute
    feature stats without any codec.
    """
    from .io.flac import encode_flac
    from .io.images import _mix64
    from .io.ogg import encode_ogg_flac
    from .io.wav import encode_wav

    ids, blobs, rates, nss, samples = [], [], [], [], []
    for i in (int(v) for v in indices):
        rng = np.random.default_rng(_mix64(i ^ 0xA0D10) & 0xFFFFFFFF)
        rate = (8000, 16000, 22050)[i % 3]
        n = 1500 + int(_mix64(i) % 1200)
        bits = (16, 16, 8, 24, 32)[i % 5]
        stereo = i % 4 == 3
        t = np.arange(n) / rate
        f0 = 80.0 + (i % 40) * 23.0
        base = (0.45 * np.sin(2 * np.pi * f0 * t)
                + 0.25 * np.sin(2 * np.pi * 2.7 * f0 * t)
                + 0.08 * rng.standard_normal(n))
        sig = np.clip(
            np.stack([base, base * 0.5
                      + 0.1 * rng.standard_normal(n)], axis=1)
            if stereo else base, -0.999, 0.999)
        half = 1 << (bits - 1)
        qi = np.clip(np.round(sig * half), -half, half - 1)
        q = qi / float(half)
        mono = q.mean(axis=1) if stereo else q
        ids.append(f"clip_{i:07d}")
        if i % 10 == 0:                      # bits == 16 on this cycle
            blobs.append(encode_ogg_flac(qi.astype(np.int64), rate,
                                         bps=bits))
        elif i % 5 == 0:                     # bits == 16 here too
            blobs.append(encode_flac(qi.astype(np.int64), rate,
                                     bps=bits))
        else:
            blobs.append(encode_wav(sig, rate, bits=bits))
        rates.append(rate)
        nss.append(n)
        samples.append(mono)
    return pa.Table.from_pydict({
        "clip_id": pa.array(ids, pa.string()),
        "audio": pa.array(blobs, pa.binary()),
        "rate": pa.array(rates, pa.int64()),
        "n_samples": pa.array(nss, pa.int64()),
        "samples": pa.array([s.tolist() for s in samples],
                            pa.list_(pa.float64()))})


def ensure_audio_parquet(sf_dir=None, n=None, use_ray=None):
    """Materialize (once) the deterministic audio-clip table — WAV
    payload column + ground-truth sample column for SQL oracles.

    Same Ray ``map_batches`` fan-out over the index range as
    :func:`ensure_images_parquet` (rows are pure functions of the clip
    index, so the parallel build is bit-identical to the serial one);
    tiny tables skip the Ray overhead and build in-process."""
    if n is None:
        n = audio_count_for_sf(sf_dir)
    out = os.path.join(_CACHE_ROOT, f"audio_v3_{n}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if use_ray is None:
        use_ray = n >= 512
    if use_ray:
        import ray.data

        def gen(batch: pa.Table) -> pa.Table:
            return synthesize_audio_batch(np.asarray(batch["id"]))

        n_files = max(1, n // 640)
        (ray.data.range(n, override_num_blocks=max(n_files * 4, 8))
         .map_batches(gen, batch_format="pyarrow", batch_size=128)
         .repartition(n_files)
         .write_parquet(tmp, row_group_size=128))
    else:
        pq.write_table(synthesize_audio_batch(range(n)),
                       os.path.join(tmp, "part-0.parquet"),
                       row_group_size=128)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another writer won
    return out


def video_count_for_sf(sf_dir):
    """Video-clip-table size derived from the sf's part-table rows."""
    return max(24, image_count_for_sf(sf_dir) // 10)


def synthesize_video_batch(indices):
    """Deterministic video-clip rows: MJPEG-in-AVI containers with a
    PCM audio track (raydal.io.avi), procedural frames.  Container
    metadata (n_frames, fps) is stored alongside so SQL oracles can
    recompute the probe/seek arithmetic exactly."""
    from .io.avi import encode_avi_mjpeg
    from .io.images import _mix64

    ids, blobs, nfs, fpss = [], [], [], []
    for i in (int(v) for v in indices):
        n = 6 + int(_mix64(i) % 10)             # 6..15 frames
        fps = (4, 5, 8, 10)[i % 4]
        h = 24 + (i % 3) * 8
        w = 32 + (i % 2) * 16
        base = np.add.outer(np.arange(h), np.arange(w)).astype(
            np.float64)
        ph = (_mix64(i ^ 0x71DE0) % 89) / 10.0
        frames = np.stack([
            ((base * (f + 1) * 0.37 + ph * f) % 203 + 20)
            for f in range(n)]).astype(np.uint8)
        t = np.arange(2000) / 8000.0
        audio = 0.4 * np.sin(2 * np.pi * (100 + i % 50 * 7) * t)
        ids.append(f"vid_{i:07d}")
        blobs.append(encode_avi_mjpeg(frames, fps=fps, audio=audio,
                                      audio_rate=8000))
        nfs.append(n)
        fpss.append(fps)
    return pa.Table.from_pydict({
        "clip_id": pa.array(ids, pa.string()),
        "video": pa.array(blobs, pa.binary()),
        "n_frames": pa.array(nfs, pa.int64()),
        "fps": pa.array(fpss, pa.int64())})


def ensure_video_parquet(sf_dir=None, n=None, use_ray=None):
    """Materialize (once) the deterministic AVI video-clip table —
    Ray fan-out like :func:`ensure_images_parquet` past the tiny-table
    threshold, bit-identical rows either way."""
    if n is None:
        n = video_count_for_sf(sf_dir)
    out = os.path.join(_CACHE_ROOT, f"video_{n}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if use_ray is None:
        use_ray = n >= 512
    if use_ray:
        import ray.data

        def gen(batch: pa.Table) -> pa.Table:
            return synthesize_video_batch(np.asarray(batch["id"]))

        n_files = max(1, n // 320)
        (ray.data.range(n, override_num_blocks=max(n_files * 4, 8))
         .map_batches(gen, batch_format="pyarrow", batch_size=64)
         .repartition(n_files)
         .write_parquet(tmp, row_group_size=64))
    else:
        pq.write_table(synthesize_video_batch(range(n)),
                       os.path.join(tmp, "part-0.parquet"),
                       row_group_size=64)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another writer won
    return out


def ensure_zone_index(n_zones=500):
    """Zone index for the join side (built once per process)."""
    return ZoneIndex(imgfix.make_zones_table(n_zones))


def flagship(sf_dir, z=10, n_zones=500, warp_sample=None, concurrency=None,
             zone_index=None, epochs=1):
    """Run the headline pipeline; returns a dict of small result tables.

    Physical plan (the scalable shape — ONE pass over the heavy bytes):

    1. ``read_parquet`` of the full image table, row-group-split into
       ~4×pool blocks.
    2. ``map_batches(FlagshipActor, concurrency=N)`` — fused decode →
       warp → tile-cover → broadcast zone-join; emits small per-image
       rows (stats + cell list + zone list).  This stage is ~all of the
       compute, so N→4N scaling tracks the actor pool.
    3. The per-image table (tiny) is materialized once; three cheap
       aggregations (tile-cell groupby, per-zone counts, warp summary)
       run off it.

    ``warp_sample``: if set, limit the heavy stage to that many images
    (smoke runs).  ``epochs``: stream the input that many times through
    the same pool in ONE pipeline (steady-state scaling measurements —
    at production scale a job runs hours, so the few-second pool
    spin-up/ramp transient is measurement noise at small sf; 2 epochs
    halves its weight without changing the job shape).
    """
    import ray
    import ray.data

    from .ops.warp import FlagshipActor

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # leave PROPORTIONAL headroom (≈1/6 of the node, ≥1 cpu) for
        # read tasks, the driver's streaming consumer and Ray system
        # processes: 4→3, 8→7, 16→14, 32→27 actors.  A fixed 2-cpu
        # reserve under-occupied small nodes (4 cpus → 2 actors), which
        # skewed small→large scaling comparisons (r2 verdict)
        concurrency = max(2, cpus - max(1, cpus // 6))
    path = ensure_images_parquet(sf_dir)
    zi = zone_index or ensure_zone_index(n_zones)
    zi_ref = ray.put(zi)

    cols = ["image_id", "bytes", "caption", "w", "h", "crs", "gt"]
    nb = max(concurrency * 8, 16)
    full = ray.data.read_parquet(path, columns=cols,
                                 override_num_blocks=nb)
    for _ in range(int(epochs) - 1):
        full = full.union(ray.data.read_parquet(
            path, columns=cols, override_num_blocks=nb))
    if warp_sample:
        full = full.limit(warp_sample)
    per_image = full.map_batches(
        FlagshipActor,
        fn_constructor_kwargs={"zones_ref": zi_ref, "z": z},
        batch_format="pyarrow", batch_size=64,
        concurrency=concurrency)

    # --- single-pass streaming consumption -------------------------------
    # All three summaries have BOUNDED key cardinality (cells ≤ 4^z at the
    # fixed zoom, zones ≤ n_zones, warp stats O(1)), so the final reduce is
    # a driver-side partial merge over per-batch numpy partials — the
    # median-cut-histogram pattern — consuming the actor stream exactly
    # once with no materialization barrier.  Unbounded-key reductions (the
    # tile pyramid compose) use the distributed groupby path in
    # raydal.ops.tile instead.
    from collections import Counter

    cell_counts = Counter()
    zone_counts = Counter()
    n_img = 0
    sum_vf = 0.0
    for t in per_image.iter_batches(batch_size=4096,
                                    batch_format="pyarrow"):
        cells_col = (t["cells"].combine_chunks()
                     if isinstance(t["cells"], pa.ChunkedArray)
                     else t["cells"])
        flat = np.asarray(cells_col.flatten(), dtype=np.int64)
        uc, cnt = np.unique(flat, return_counts=True)
        cell_counts.update(dict(zip(uc.tolist(), cnt.tolist())))
        zc = (t["zones"].combine_chunks()
              if isinstance(t["zones"], pa.ChunkedArray) else t["zones"])
        zflat = zc.flatten().to_pylist()
        zone_counts.update(zflat)
        n_img += t.num_rows
        sum_vf += float(np.asarray(t["valid_frac"]).sum())

    tile_summary = pa.Table.from_pydict({
        "n_cells": pa.array([len(cell_counts)], pa.int64()),
        "n_assignments": pa.array([int(sum(cell_counts.values()))],
                                  pa.int64())})
    zk = sorted(zone_counts)
    per_zone = pa.Table.from_pydict({
        "zone_id": pa.array(zk, pa.string()),
        "n_images": pa.array([zone_counts[k] for k in zk], pa.int64())})
    warp_summary = pa.Table.from_pydict({
        "n": pa.array([n_img], pa.int64()),
        "valid_px_frac": pa.array([sum_vf / max(n_img, 1)], pa.float64())})

    return {
        "tile_summary": tile_summary,
        "per_zone": per_zone,
        "warp_summary": warp_summary,
    }


def tile_pyramid(sf_dir, z_max=8, z_min=6, salt=4, out_dir=None,
                 limit_images=None, concurrency=None):
    """End-to-end tiling job: warp images into z_max tiles, mosaic with the
    salted two-stage reduce, reduce the pyramid to z_min, and (optionally)
    write a resumable z/x/y parquet layout with lineage manifests.

    This is the workload the north rule names: the tile reduction is a
    ``groupby(cell)`` shuffle whose hot cells (the 1°×1° skew box) are
    salted into ``(cell, salt)`` partials first; each pyramid level is a
    ``groupby(parent)`` reduce with a per-level barrier
    (apps/gdalalg_raster_tile.cpp:3080 semantics).

    Returns {"levels": {z: Dataset}, "write_summary": DataFrame | None}.
    """
    import ray
    import ray.data

    from .lineage import checkpointed_write
    from .geo import cells
    from .ops.tile import (build_pyramid, encode_tiles_batch,
                           mosaic_tiles)
    from .ops.warp import WarpToTiles

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)
    path = ensure_images_parquet(sf_dir)
    full = ray.data.read_parquet(
        path, columns=["image_id", "bytes", "w", "h", "crs", "gt"],
        override_num_blocks=max(concurrency * 4, 16))
    if limit_images:
        full = full.limit(limit_images)
    contrib = full.map_batches(
        WarpToTiles, fn_constructor_kwargs={"z": z_max},
        batch_format="pyarrow", batch_size=32, concurrency=concurrency)
    base = mosaic_tiles(contrib, salt=salt).materialize()
    levels = build_pyramid(base, z_max, z_min)

    write_summary = None
    if out_dir is not None:
        import pandas as pd
        frames = []
        fingerprint = f"{path}:{z_max}:{z_min}:{limit_images}"
        for z, ds in levels.items():
            tiles = ds.map_batches(encode_tiles_batch,
                                   batch_format="pyarrow")
            # partition id = the tile's z_min ancestor cell → one output
            # file per coarse tile subtree, deterministic and resumable
            def part_col(t, z=z, C=cells):
                import numpy as np
                import pyarrow as _pa

                cell = np.asarray(t["cell"], dtype=np.int64)
                anc = cell
                for _ in range(z - z_min):
                    anc = C.parent_cell(anc)
                return t.append_column("part_id", _pa.array(anc))

            tiles = tiles.map_batches(part_col, batch_format="pyarrow")
            frames.append(checkpointed_write(
                tiles, os.path.join(out_dir, f"z{z}"), "part_id",
                fingerprint))
        write_summary = pd.concat(frames, ignore_index=True)
    return {"levels": levels, "write_summary": write_summary}
