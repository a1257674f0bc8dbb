"""Deterministic synthetic image / zone / point fixtures (FIXTURES.md).

The engine's primary input is a Lance table of image + caption pairs with
schema ``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` (BASELINE.json ``input_hint``).  Lance is
not installed in this container, so the same columnar batches are
materialized to Parquet — the Ray-side contract (`read_parquet` →
zero-copy Arrow batches) is identical, and ``read_images`` is the single
place a real `ray.data.read_lance` would be swapped in.

Everything is a pure function of ``(seed=42, index)``: pixel patterns
(gradient + checkerboard + seeded rectangles), geo-placement over
lon ∈ [-20, 40], lat ∈ [-10, 50] with 10 % of images forced into a hot
1°×1° box (spatial-skew fixture), CRS cycling {4326, 32631, 3857}, and an
exact-duplicate every 97th row (dedup fixture).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import wkb as wkbmod
from ..geo.crs import Transformer
from .codecs import encode

__all__ = [
    "IMAGE_SCHEMA", "image_spec", "image_pixels", "average_hash",
    "synthesize_images_batch", "write_images_parquet", "read_images",
    "make_zones_table", "write_zones_parquet", "make_points_table",
    "HOT_BOX",
]

SEED = 42
LON_RANGE = (-20.0, 40.0)
LAT_RANGE = (-10.0, 50.0)
HOT_BOX = (10.0, 40.0, 11.0, 41.0)  # lonmin, latmin, lonmax, latmax
_W_CYCLE = (64, 128, 256, 257)
_H_CYCLE = (64, 96, 256, 255)
_FMT_CYCLE = ("png", "jpeg")
_CRS_CYCLE = (4326, 32631, 3857)

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("crs", pa.string()),
    ("gt", pa.list_(pa.float64(), 6)),
])


_M64 = (1 << 64) - 1


def _mix64(x):
    """splitmix64 — the per-index deterministic hash everything derives from."""
    x = (int(x) + 0x9E3779B97F4A7C15 + SEED) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    x ^= x >> 31
    return x


def _unit(i, salt):
    """Deterministic float in [0, 1) from (index, salt)."""
    return (_mix64(i * 1315423911 + salt) & 0xFFFFFFFF) / 2.0 ** 32


def image_spec(i, dims=None):
    """Deterministic spec for image ``i``: dims, fmt, CRS, geotransform.

    The geotransform is expressed in the image's own CRS; placement is
    computed in lon/lat and the footprint corner is projected.
    ``dims`` overrides (w, h) — used by duplicate rows, whose pixel
    payload (and therefore true dims) comes from their source image.
    """
    i = int(i)
    if dims is not None:
        w, h = dims
    else:
        w = _W_CYCLE[i % 4]
        h = _H_CYCLE[(i // 4) % 4]
    if i >= 97 and i % 97 == 0 and dims is None:
        # duplicate rows: pixels are copied from i-97, so dims must match
        src = image_spec(i - 97)
        return image_spec(i, dims=(src["w"], src["h"]))
    fmt = _FMT_CYCLE[i % 2]
    crs = _CRS_CYCLE[i % 3]
    if i % 10 == 7:  # hot-box skew: ~10% of images in one 1°×1° cell
        lon0 = HOT_BOX[0] + _unit(i, 1) * (HOT_BOX[2] - HOT_BOX[0]) * 0.8
        lat1 = HOT_BOX[1] + _unit(i, 2) * (HOT_BOX[3] - HOT_BOX[1]) * 0.8 + 0.1
        span = 0.05 + _unit(i, 3) * 0.05
    else:
        lon0 = LON_RANGE[0] + _unit(i, 1) * (LON_RANGE[1] - LON_RANGE[0] - 0.5)
        lat1 = LAT_RANGE[0] + 0.5 + _unit(i, 2) * (LAT_RANGE[1] - LAT_RANGE[0] - 0.5)
        span = 0.05 + _unit(i, 3) * 0.45
    lon1, lat0 = lon0 + span, lat1 - span * h / max(w, 1)
    if crs == 4326:
        xmin, ymax, xmax = lon0, lat1, lon1
        ymin = lat0
    else:
        tf = Transformer(4326, crs)
        xmin, ymin, xmax, ymax = tf.transform_extent(lon0, lat0, lon1, lat1)
    gt = (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0, -(ymax - ymin) / h)
    return {"index": i, "w": w, "h": h, "fmt": fmt, "crs": f"EPSG:{crs}",
            "gt": gt, "lonlat_bbox": (lon0, lat0, lon1, lat1)}


def image_pixels(i):
    """(H, W, 3) uint8 procedural pattern; duplicates every 97th index."""
    i = int(i)
    if i >= 97 and i % 97 == 0:
        return image_pixels(i - 97)
    spec = image_spec(i)
    w, h = spec["w"], spec["h"]
    rng = np.random.default_rng(_mix64(i) & 0xFFFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    fy = yy / max(h - 1, 1)
    fx = xx / max(w - 1, 1)
    # smooth "natural-image-like" content: low-frequency sinusoid field
    # + a few soft gaussian blobs.  Deliberately DCT-friendly — photo
    # corpora (the 10^12-image target) are smooth, and hard synthetic
    # edges (checkerboards, mod-256 wraps) make lossy codecs pathologic.
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        a, b = rng.uniform(1.0, 3.0, 2)
        ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
        chan = (np.sin(2 * np.pi * a * fx + ph1)
                + np.cos(2 * np.pi * b * fy + ph2)
                + 0.5 * np.sin(2 * np.pi * (fx + fy) + c))
        img[:, :, c] = np.clip(107 + 50 * chan, 0, 255).astype(np.uint8)
    for _ in range(5):
        cx = rng.uniform(0, 1)
        cy = rng.uniform(0, 1)
        sig = rng.uniform(0.08, 0.25)
        amp = rng.uniform(-70, 70, size=3)
        g = np.exp(-(((fx - cx) ** 2) + ((fy - cy) ** 2)) / (2 * sig * sig))
        img[:] = np.clip(img + g[:, :, None] * amp[None, None, :],
                         0, 255).astype(np.uint8)
    return img


def average_hash(gray):
    """64-bit average hash of a 2-D array (8×8 block means vs global mean)."""
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    means = np.empty((8, 8), dtype=np.float64)
    g = gray.astype(np.float64)
    for r in range(8):
        rows = g[ys[r]:max(ys[r + 1], ys[r] + 1)]
        for c in range(8):
            means[r, c] = rows[:, xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
    bits = (means > means.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(bool(b))
    return val - (1 << 64) if val >= (1 << 63) else val


_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _caption(i):
    k = _mix64(i * 7 + 5)
    words = " ".join(_WORDS[(k >> (j * 4)) % len(_WORDS)] for j in range(6))
    return f"caption {i} {words}"


def synthesize_images_batch(indices):
    """Build one Arrow batch of the image table for the given indices.

    Usable directly inside ``map_batches`` (indices column → image rows) —
    this is the path the flagship pipeline uses to derive its image input
    from driver-provided key tables.
    """
    ids, blobs, ws, hs, fmts, caps, phs, crss, gts = ([] for _ in range(9))
    for i in np.asarray(indices, dtype=np.int64):
        i = int(i)
        spec = image_spec(i)
        px = image_pixels(i)
        gray = px.mean(axis=2)
        # duplicate rows already carry the source's pixels (image_pixels
        # recurses), so hashing `gray` IS the source phash
        ph = average_hash(gray)
        ids.append(f"img-{i:012d}")
        blobs.append(encode(px, spec["fmt"]))
        ws.append(spec["w"])
        hs.append(spec["h"])
        fmts.append(spec["fmt"])
        caps.append(_caption(i))
        phs.append(ph)
        crss.append(spec["crs"])
        gts.append(list(spec["gt"]))
    return pa.Table.from_arrays(
        [pa.array(ids, pa.string()), pa.array(blobs, pa.binary()),
         pa.array(ws, pa.int32()), pa.array(hs, pa.int32()),
         pa.array(fmts, pa.string()), pa.array(caps, pa.string()),
         pa.array(phs, pa.int64()), pa.array(crss, pa.string()),
         pa.array(gts, pa.list_(pa.float64(), 6))],
        schema=IMAGE_SCHEMA)


def write_images_parquet(path, n, batch=256):
    """Materialize the n-row image table as Parquet (Lance stand-in)."""
    import pyarrow.parquet as pq

    writer = pq.ParquetWriter(path, IMAGE_SCHEMA)
    for start in range(0, n, batch):
        writer.write_table(
            synthesize_images_batch(np.arange(start, min(start + batch, n))))
    writer.close()
    return path


def read_images(path, columns=None):
    """The Lance-equivalent source: columnar read → `ray.data.Dataset`.

    When the ``lance`` package is present and ``path`` is a Lance
    dataset (``.lance`` suffix or a ``_versions`` manifest dir), this
    goes through ``ray.data.read_lance`` directly; otherwise Parquet
    gives the same zero-copy Arrow contract (the sandbox ships no
    ``lance``, so the Parquet branch is the tested one).
    """
    import os

    import ray.data

    looks_lance = str(path).endswith(".lance") or os.path.isdir(
        os.path.join(str(path), "_versions"))
    if looks_lance:
        try:
            import lance  # noqa: F401  (absent in this sandbox)
        except ImportError as e:
            raise ImportError(
                "path looks like a Lance dataset but the 'lance' "
                "package is not installed") from e
        return ray.data.read_lance(str(path), columns=columns)
    return ray.data.read_parquet(path, columns=columns)


# ---------------------------------------------------------------------------
# zones (FIXTURES.md F2) — the spatial-join method layer


def _zone_polygon(j, n_zones):
    """Deterministic polygon(s) for zone ``j`` over the fixture window."""
    kind = ("convex", "concave", "holed", "multi")[j % 4]
    cx = LON_RANGE[0] + _unit(j, 11) * (LON_RANGE[1] - LON_RANGE[0])
    cy = LAT_RANGE[0] + _unit(j, 12) * (LAT_RANGE[1] - LAT_RANGE[0])
    r = 0.3 + _unit(j, 13) * 2.2
    nv = 5 + (_mix64(j * 3 + 1) % 56)
    ang = np.linspace(0.0, 2 * np.pi, nv, endpoint=False)
    if kind == "concave":
        rad = r * (0.45 + 0.55 * ((np.arange(nv) % 2)))
    else:
        rad = np.full(nv, r)
    ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    if kind == "holed":
        hole = np.stack([cx + 0.3 * r * np.cos(ang[::-1]),
                         cy + 0.3 * r * np.sin(ang[::-1])], axis=1)
        hole = np.vstack([hole, hole[:1]])
        return [[ring, hole]]
    if kind == "multi":
        ring2 = ring + np.array([2.5 * r, 0.0])
        return [[ring], [ring2]]
    return [[ring]]


def make_zones_table(n_zones=500):
    """Zone polygons as an Arrow table (zone_id, wkb, kind, pop, name).

    Includes the pinned degenerate cases: the final zone covers the entire
    hot box (worst-case candidate fan-out) and the one before it is a
    sliver thinner than a z-12 tile.
    """
    rows = []
    for j in range(n_zones):
        polys = _zone_polygon(j, n_zones)
        blob = (wkbmod.polygon_wkb(polys[0]) if len(polys) == 1
                else wkbmod.multipolygon_wkb(polys))
        rows.append((f"zone-{j:06d}", blob, ("convex", "concave", "holed",
                                             "multi")[j % 4],
                     _mix64(j * 17 + 3) % 1_000_000, f"name-{j % 97}"))
    # pinned: hot-box cover
    hot = wkbmod.polygon_wkb(wkbmod.box_polygon(*[HOT_BOX[k] for k in (0, 1, 2, 3)]))
    rows.append((f"zone-{n_zones:06d}", hot, "hotbox", 999_999, "hot"))
    # pinned: sliver thinner than a fine tile
    sliver = wkbmod.polygon_wkb(wkbmod.box_polygon(5.0, 5.0, 5.0005, 25.0))
    rows.append((f"zone-{n_zones + 1:06d}", sliver, "sliver", 1, "sliver"))
    ids, blobs, kinds, pops, names = zip(*rows)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(list(blobs), pa.binary()), pa.array(kinds),
         pa.array(pops, pa.int64()), pa.array(names)],
        names=["zone_id", "wkb", "kind", "pop", "name"])


def write_zones_parquet(path, n_zones=500):
    import pyarrow.parquet as pq

    pq.write_table(make_zones_table(n_zones), path)
    return path


def make_points_table(n_points=2000):
    """Probe points (point_id, x, y) with pinned boundary cases."""
    xs, ys = [], []
    for i in range(n_points):
        xs.append(LON_RANGE[0] + _unit(i, 21) * (LON_RANGE[1] - LON_RANGE[0]))
        ys.append(LAT_RANGE[0] + _unit(i, 22) * (LAT_RANGE[1] - LAT_RANGE[0]))
    # pinned: exact vertices + edge midpoints of zone 0
    ring = _zone_polygon(0, 1)[0][0]
    for k in range(min(4, len(ring) - 1)):
        xs.append(float(ring[k, 0]))
        ys.append(float(ring[k, 1]))
        xs.append(float((ring[k, 0] + ring[k + 1, 0]) / 2))
        ys.append(float((ring[k, 1] + ring[k + 1, 1]) / 2))
    ids = [f"pt-{i:08d}" for i in range(len(xs))]
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(xs, pa.float64()), pa.array(ys, pa.float64())],
        names=["point_id", "x", "y"])
