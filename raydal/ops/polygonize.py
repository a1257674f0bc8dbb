"""Polygonize (raster → vector connected components) + cross-tile dissolve.

Per-tile semantics follow ``GDALPolygonize`` (``alg/polygonize.cpp:500``):
group connected pixels of equal value into components (4- or
8-connectivity, ``GDALRasterPolygonEnumerator`` merge semantics) and emit
one feature per component carrying the pixel value.  The ring topology of
the reference's two-arm sweep polygonizer
(``alg/polygonize_polygonizer.h:36-105``) is reproduced as an outer
boundary ring traced on the component mask (holes are reported as
separate hole-count metadata in round 1 — documented deviation).

Cross-tile topology — the one inherently sequential part of the
reference — becomes a distributed **edge-dissolve reduce**: every
component touching a tile border emits (border-run) keys; components
sharing a run with equal value are merged by iterated min-label
propagation (``groupby`` rounds), after which per-component attributes
(pixel count, bbox) are re-aggregated.  SURVEY §7.4 risk 5.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo import cells

__all__ = ["label_components", "polygonize_array", "trace_boundary",
           "polygonize_tiles", "dissolve_across_tiles"]


def label_components(arr, connectivity=4, background=None):
    """Connected-component labels for equal-valued pixels (two-pass
    union-find over row runs; pure numpy + small python merge loop).

    Returns int32 labels (0 = background when ``background`` given,
    labels start at 1).
    """
    arr = np.asarray(arr)
    h, w = arr.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]  # parent[i] for union-find; 0 reserved

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    next_label = 1
    for y in range(h):
        row = arr[y]
        # run starts where the value changes
        starts = np.concatenate([[0], np.nonzero(row[1:] != row[:-1])[0] + 1])
        ends = np.concatenate([starts[1:], [w]])
        for s, e in zip(starts, ends):
            val = row[s]
            if background is not None and val == background:
                continue
            lab = 0
            if y > 0:
                above = labels[y - 1, s:e]
                same = above[(arr[y - 1, s:e] == val) & (above > 0)]
                if len(same):
                    lab = int(same.min())
                    for other in np.unique(same):
                        union(lab, int(other))
                if connectivity == 8:
                    for xx in (s - 1, e):
                        if 0 <= xx < w and arr[y - 1, xx] == val \
                                and labels[y - 1, xx] > 0:
                            if lab == 0:
                                lab = int(labels[y - 1, xx])
                            else:
                                union(lab, int(labels[y - 1, xx]))
            if lab == 0:
                lab = next_label
                parent.append(lab)
                next_label += 1
            labels[y, s:e] = lab
    # flatten labels
    lut = np.zeros(next_label, dtype=np.int32)
    remap = {}
    nxt = 1
    for i in range(1, next_label):
        r = find(i)
        if r not in remap:
            remap[r] = nxt
            nxt += 1
        lut[i] = remap[r]
    return lut[labels]


def trace_boundary(mask):
    """Outer boundary ring of a component mask, as pixel-corner coords.

    Moore-neighbor tracing on the pixel grid; the ring is closed and
    follows pixel edges (like the reference's arc walker, which emits
    pixel-corner polylines).
    """
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.empty((0, 2))
    # walk pixel edges: collect boundary edges then chain them
    edges = {}
    h, w = mask.shape
    m = np.zeros((h + 2, w + 2), dtype=bool)
    m[1:-1, 1:-1] = mask

    def add(a, b):
        edges.setdefault(a, []).append(b)

    for y, x in zip(ys + 1, xs + 1):
        # for each exposed side, an edge in CCW orientation; corners can
        # carry TWO outgoing edges at 8-connected diagonal pinches, so the
        # map is corner → list
        if not m[y - 1, x]:
            add((x - 1, y - 1), (x, y - 1))      # top, left→right
        if not m[y + 1, x]:
            add((x, y), (x - 1, y))              # bottom, right→left
        if not m[y, x - 1]:
            add((x - 1, y), (x - 1, y - 1))      # left, bottom→top
        if not m[y, x + 1]:
            add((x, y - 1), (x, y))              # right, top→bottom
    start = min(edges)
    ring = [start]
    outs = edges.pop(start)
    cur = outs[0]
    if len(outs) > 1:
        edges[start] = outs[1:]
    prev = start
    while cur != start and edges:
        ring.append(cur)
        cands = edges.pop(cur, None)
        if cands is None:
            break
        if len(cands) == 1:
            nxt = cands[0]
        else:
            # diagonal pinch: two outgoing edges share this corner — take
            # the sharpest left turn relative to the incoming direction so
            # the walk stays on the outer boundary (interior kept left)
            inx, iny = cur[0] - prev[0], cur[1] - prev[1]
            def turn(c):
                ox, oy = c[0] - cur[0], c[1] - cur[1]
                return inx * oy - iny * ox
            cands = sorted(cands, key=turn)
            nxt = cands[0]
            edges[cur] = [c for c in cands if c is not nxt]
        prev = cur
        cur = nxt
    ring.append(start)
    # edge keys are already expressed in original (unpadded) pixel-corner
    # coordinates
    return np.asarray(ring, dtype=np.float64)


def polygonize_array(arr, gt=None, connectivity=4, background=None):
    """Polygonize one array → list of dicts per component.

    Each dict: value, n_pixels, bbox (in world coords when ``gt`` given),
    ring (outer boundary, world coords), n_holes.
    """
    labels = label_components(arr, connectivity, background)
    out = []
    for lab in range(1, labels.max() + 1):
        mask = labels == lab
        ys, xs = np.nonzero(mask)
        val = arr[ys[0], xs[0]]
        ring_px = trace_boundary(mask)
        # hole count: euler characteristic approach — components of the
        # complement inside the bbox that don't touch the bbox border
        y0, y1 = ys.min(), ys.max()
        x0, x1 = xs.min(), xs.max()
        sub = ~mask[y0:y1 + 1, x0:x1 + 1]
        hole_labels = label_components(sub.astype(np.int8), 4, background=0)
        n_holes = 0
        for hl in range(1, hole_labels.max() + 1):
            hys, hxs = np.nonzero(hole_labels == hl)
            if (hys.min() > 0 and hxs.min() > 0
                    and hys.max() < sub.shape[0] - 1
                    and hxs.max() < sub.shape[1] - 1):
                n_holes += 1
        if gt is not None:
            gx = gt[0] + ring_px[:, 0] * gt[1] + ring_px[:, 1] * gt[2]
            gy = gt[3] + ring_px[:, 0] * gt[4] + ring_px[:, 1] * gt[5]
            ring = np.stack([gx, gy], axis=1)
            bx0 = gt[0] + x0 * gt[1]
            bx1 = gt[0] + (x1 + 1) * gt[1]
            by1 = gt[3] + y0 * gt[5]
            by0 = gt[3] + (y1 + 1) * gt[5]
            bbox = (min(bx0, bx1), min(by0, by1),
                    max(bx0, bx1), max(by0, by1))
        else:
            ring = ring_px
            bbox = (float(x0), float(y0), float(x1 + 1), float(y1 + 1))
        out.append({"value": float(val), "n_pixels": int(len(ys)),
                    "bbox": bbox, "ring": ring, "n_holes": n_holes})
    return out


def polygonize_tiles(tiles_ds, tile_size=256, connectivity=4,
                     background=0.0):
    """Distributed per-tile polygonize over (cell, data) tile rows.

    Emits one row per component:
    ``(cell, comp_id, value, n_pixels, xmin, ymin, xmax, ymax,
    edge_runs)`` where ``edge_runs`` is a list of border-run keys
    ("side:z:x:y:offset") used by the cross-tile dissolve.
    """
    def per_tile(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("cell", "comp_id", "value", "n_pixels",
                                "xmin", "ymin", "xmax", "ymax",
                                "edge_runs")}
        for i in range(t.num_rows):
            cell = t["cell"][i].as_py()
            z, tx, ty = (int(v) for v in cells.unpack_cell(np.int64(cell)))
            arr = np.frombuffer(t["data"][i].as_py(),
                                dtype=np.float64).reshape(tile_size,
                                                          tile_size)
            labels = label_components(arr, connectivity, background)
            tm = cells.web_mercator_quad(z, tile_size)
            gt = tm.tile_gt(tx, ty)
            for lab in range(1, labels.max() + 1):
                mask = labels == lab
                ys, xs = np.nonzero(mask)
                val = float(arr[ys[0], xs[0]])
                runs = []
                # border runs keyed canonically by the shared edge:
                # vertical edge between (tx,ty) and (tx+1,ty) is named by
                # the left tile; horizontal by the upper tile.
                if (xs == 0).any():
                    for y in np.nonzero(mask[:, 0])[0]:
                        runs.append(f"v:{z}:{tx - 1}:{ty}:{y}:{val}")
                if (xs == tile_size - 1).any():
                    for y in np.nonzero(mask[:, -1])[0]:
                        runs.append(f"v:{z}:{tx}:{ty}:{y}:{val}")
                if (ys == 0).any():
                    for x in np.nonzero(mask[0, :])[0]:
                        runs.append(f"h:{z}:{tx}:{ty - 1}:{x}:{val}")
                if (ys == tile_size - 1).any():
                    for x in np.nonzero(mask[-1, :])[0]:
                        runs.append(f"h:{z}:{tx}:{ty}:{x}:{val}")
                rows["cell"].append(cell)
                rows["comp_id"].append(f"{cell}:{lab}")
                rows["value"].append(val)
                rows["n_pixels"].append(int(mask.sum()))
                x0, x1 = xs.min(), xs.max() + 1
                y0, y1 = ys.min(), ys.max() + 1
                rows["xmin"].append(gt[0] + x0 * gt[1])
                rows["xmax"].append(gt[0] + x1 * gt[1])
                rows["ymax"].append(gt[3] + y0 * gt[5])
                rows["ymin"].append(gt[3] + y1 * gt[5])
                rows["edge_runs"].append(runs)
        return pa.Table.from_pydict({
            "cell": pa.array(rows["cell"], pa.int64()),
            "comp_id": pa.array(rows["comp_id"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "n_pixels": pa.array(rows["n_pixels"], pa.int64()),
            "xmin": pa.array(rows["xmin"], pa.float64()),
            "ymin": pa.array(rows["ymin"], pa.float64()),
            "xmax": pa.array(rows["xmax"], pa.float64()),
            "ymax": pa.array(rows["ymax"], pa.float64()),
            "edge_runs": pa.array(rows["edge_runs"],
                                  pa.list_(pa.string()))})

    return tiles_ds.map_batches(per_tile, batch_format="pyarrow")


def dissolve_across_tiles(comps_ds):
    """Merge per-tile components that touch across tile borders.

    Interior components (no border runs) are final already and aggregate
    distributed-side; only border-touching components (bounded by total
    tile perimeter, not raster area) come to the driver, where min-label
    propagation runs **to fixpoint** (no silent round cap — a component
    chained across T tiles needs up to T rounds).  Returns one row per
    dissolved component: (comp_id, value, n_pixels, xmin, ymin, xmax,
    ymax, n_tiles).
    """
    if hasattr(comps_ds, "map_batches"):  # Ray Dataset input
        def split_border(t: pa.Table) -> pa.Table:
            runs = (t["edge_runs"].combine_chunks()
                    if isinstance(t["edge_runs"], pa.ChunkedArray)
                    else t["edge_runs"])
            n_runs = np.asarray(
                pa.compute.list_value_length(runs), dtype=np.int64)
            return t.append_column("is_border",
                                   pa.array(n_runs > 0, pa.bool_()))

        # materialize once: BOTH branches (interior projection + border
        # pull) consume `marked`; without this the whole upstream
        # rasterize/polygonize lineage would execute twice
        marked = comps_ds.map_batches(split_border,
                                      batch_format="pyarrow").materialize()
        # interior components are final already — they aggregate
        # distributed-side (a pure projection to the output schema) and
        # NEVER reach the driver.  Only border-touching components (a
        # set bounded by total tile perimeter, not raster area) come
        # back for min-label propagation.
        import pyarrow.compute as pc

        def finalize_interior(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(t["is_border"]))
            return pa.Table.from_pydict({
                "comp_id": t["comp_id"], "value": t["value"],
                "n_pixels": t["n_pixels"], "xmin": t["xmin"],
                "ymin": t["ymin"], "xmax": t["xmax"], "ymax": t["ymax"],
                "n_tiles": pa.array(np.ones(t.num_rows, dtype=np.int64))})

        interior_ds = marked.map_batches(finalize_interior,
                                         batch_format="pyarrow")

        def only_border(t: pa.Table) -> pa.Table:
            return t.filter(t["is_border"])

        border = marked.map_batches(only_border,
                                    batch_format="pyarrow").to_pandas()
        border_agg = _dissolve_border(border)
        import ray.data
        return interior_ds.union(
            ray.data.from_arrow(pa.Table.from_pandas(
                border_agg, preserve_index=False).cast(
                pa.schema([("comp_id", pa.string()),
                           ("value", pa.float64()),
                           ("n_pixels", pa.int64()),
                           ("xmin", pa.float64()), ("ymin", pa.float64()),
                           ("xmax", pa.float64()), ("ymax", pa.float64()),
                           ("n_tiles", pa.int64())]))))

    df = comps_ds
    has_runs = df["edge_runs"].map(len) > 0
    interior = df[~has_runs]
    border = df[has_runs]

    border_agg = _dissolve_border(border)
    interior_final = interior.assign(n_tiles=1)[
        ["comp_id", "value", "n_pixels", "xmin", "ymin", "xmax", "ymax",
         "n_tiles"]]
    return pd.concat([interior_final, border_agg], ignore_index=True)


def _dissolve_border(border):
    """Min-label propagation + aggregation over border components only."""
    label = {c: c for c in border["comp_id"]}
    exploded = border[["comp_id", "edge_runs"]].explode("edge_runs")
    exploded = exploded[exploded["edge_runs"].notna()]
    run_members = {r: g.tolist() for r, g in
                   exploded.groupby("edge_runs")["comp_id"]}

    # fixpoint propagation; bound only as a runaway guard (diameter of the
    # tile graph can never exceed the number of border components)
    for _ in range(max(len(label), 1)):
        changed = False
        for r, members in run_members.items():
            if len(members) < 2:
                continue
            m = min(label[c] for c in members)
            for c in members:
                if label[c] != m:
                    label[c] = m
                    changed = True
        if not changed:
            break
    else:
        raise RuntimeError("edge-dissolve did not converge")

    border = border.assign(dissolved=[label[c] for c in border["comp_id"]])
    agg = border.groupby(["dissolved", "value"]).agg(
        n_pixels=("n_pixels", "sum"), xmin=("xmin", "min"),
        ymin=("ymin", "min"), xmax=("xmax", "max"), ymax=("ymax", "max"),
        n_tiles=("cell", "nunique")).reset_index()
    agg = agg.rename(columns={"dissolved": "comp_id"})
    return agg[["comp_id", "value", "n_pixels", "xmin", "ymin", "xmax",
                "ymax", "n_tiles"]]
