"""FlatGeobuf (.fgb) reader — cloud-native vector format, public spec
(flatgeobuf.org; reference driver ``ogr/ogrsf_frmts/flatgeobuf/``).

From scratch on two public wire formats:

* **FlatBuffers** table encoding (soffset → vtable, voffset field
  slots, length-prefixed vectors/strings) — a ~60-line reader below,
  no flatbuffers dependency;
* the **packed Hilbert R-tree** index (40-byte nodes, level-by-level
  root→leaves layout — ``packedrtree.h:86-105`` /
  ``packedrtree.cpp:463`` semantics): :func:`read_flatgeobuf` with a
  ``bbox`` walks the index and decodes ONLY intersecting features,
  falling back to a full scan when the file was written without one.

Layout: 8-byte magic ``fgb\\x03fgb\\x01`` → size-prefixed Header
flatbuffer → optional packed R-tree → size-prefixed Feature
flatbuffers.  Geometry maps to the engine's WKB; properties decode per
the header's column table.  Validated against the reference's
published expectations for ``testfgb/poly.fgb`` (extent, bbox-filter
counts) and ``alldatatypes.fgb`` (every column type) in
``autotest/ogr/ogr_flatgeobuf.py``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_flatgeobuf", "read_flatgeobuf_dataset"]

MAGIC = b"fgb\x03fgb"   # + 1-byte patch version (0 or 1)

# GeometryType enum (header_generated.h)
_GT_POINT, _GT_LINESTRING, _GT_POLYGON = 1, 2, 3
_GT_MULTIPOINT, _GT_MULTILINESTRING, _GT_MULTIPOLYGON = 4, 5, 6
_GT_COLLECTION = 7

# ColumnType enum → (struct fmt, size) for fixed-width types
_COLTYPES = {0: ("<b", 1), 1: ("<B", 1), 2: ("<B", 1), 3: ("<h", 2),
             4: ("<H", 2), 5: ("<i", 4), 6: ("<I", 4), 7: ("<q", 8),
             8: ("<Q", 8), 9: ("<f", 4), 10: ("<d", 8)}
_VARTYPES = {11, 12, 13, 14}   # String, Json, DateTime, Binary


class _FB:
    """Minimal FlatBuffers table reader."""

    def __init__(self, buf, table_pos):
        self.b = buf
        self.t = table_pos
        soff = struct.unpack_from("<i", buf, table_pos)[0]
        self.vt = table_pos - soff
        self.vt_size = struct.unpack_from("<H", buf, self.vt)[0]

    @classmethod
    def root(cls, buf, pos=0):
        off = struct.unpack_from("<I", buf, pos)[0]
        return cls(buf, pos + off)

    def _slot(self, field_id):
        voff = 4 + 2 * field_id
        if voff + 2 > self.vt_size:
            return 0
        return struct.unpack_from("<H", self.b, self.vt + voff)[0]

    def scalar(self, field_id, fmt, default=0):
        o = self._slot(field_id)
        if not o:
            return default
        return struct.unpack_from(fmt, self.b, self.t + o)[0]

    def _indirect(self, field_id):
        o = self._slot(field_id)
        if not o:
            return None
        p = self.t + o
        return p + struct.unpack_from("<I", self.b, p)[0]

    def string(self, field_id):
        p = self._indirect(field_id)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.b, p)[0]
        return self.b[p + 4:p + 4 + n].decode("utf-8")

    def vector(self, field_id, dtype):
        """Fixed-width element vector → numpy array (zero-copy view)."""
        p = self._indirect(field_id)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.b, p)[0]
        return np.frombuffer(self.b, dtype=dtype, count=n, offset=p + 4)

    def table_vector(self, field_id):
        """Vector of table offsets → list of _FB."""
        p = self._indirect(field_id)
        if p is None:
            return []
        n = struct.unpack_from("<I", self.b, p)[0]
        out = []
        for i in range(n):
            ep = p + 4 + 4 * i
            out.append(_FB(self.b,
                           ep + struct.unpack_from("<I", self.b, ep)[0]))
        return out

    def table(self, field_id):
        p = self._indirect(field_id)
        return None if p is None else _FB(self.b, p)


def _parse_header(fb):
    cols = []
    for c in fb.table_vector(7):                 # columns
        cols.append((c.string(0), c.scalar(1, "<B")))
    return {
        "name": fb.string(0),
        "envelope": fb.vector(1, "<f8"),
        "geometry_type": fb.scalar(2, "<B"),
        "columns": cols,
        "features_count": fb.scalar(8, "<Q"),
        "index_node_size": fb.scalar(9, "<H", 16),
    }


def _geometry_wkb(g, header_gt):
    """Geometry flatbuffer → engine WKB."""
    gt = g.scalar(6, "<B") or header_gt
    xy = g.vector(1, "<f8")
    ends = g.vector(0, "<u4")
    if gt == _GT_POINT:
        return W.point_wkb(float(xy[0]), float(xy[1]))
    pts = (np.asarray(xy, dtype=np.float64).reshape(-1, 2)
           if xy is not None else np.empty((0, 2)))

    def _split(pts, ends):
        if ends is None or len(ends) == 0:
            return [pts]
        out, lo = [], 0
        for e in ends:
            out.append(pts[lo:int(e)])
            lo = int(e)
        return out

    if gt == _GT_LINESTRING:
        return W.linestring_wkb(pts)
    if gt == _GT_POLYGON:
        return W.polygon_wkb(_split(pts, ends))
    if gt == _GT_MULTIPOINT:
        return (struct.pack("<BII", 1, W.MULTIPOINT, len(pts))
                + b"".join(W.point_wkb(x, y) for x, y in pts))
    if gt == _GT_MULTILINESTRING:
        lines = _split(pts, ends)
        return (struct.pack("<BII", 1, W.MULTILINESTRING, len(lines))
                + b"".join(W.linestring_wkb(ln) for ln in lines))
    if gt == _GT_MULTIPOLYGON:
        parts = g.table_vector(7)
        polys = []
        for p in parts:
            pxy = np.asarray(p.vector(1, "<f8"),
                             dtype=np.float64).reshape(-1, 2)
            polys.append(_split(pxy, p.vector(0, "<u4")))
        return W.multipolygon_wkb(polys)
    if gt == _GT_COLLECTION:
        subs = [_geometry_wkb(p, 0) for p in g.table_vector(7)]
        return (struct.pack("<BII", 1, W.GEOMETRYCOLLECTION, len(subs))
                + b"".join(subs))
    raise NotImplementedError(f"FlatGeobuf geometry type {gt}")


def _parse_properties(buf, columns):
    """Properties byte blob → dict per the header's column table."""
    row = {}
    if buf is None:
        return row
    b = bytes(buf)
    pos = 0
    while pos + 2 <= len(b):
        (ci,) = struct.unpack_from("<H", b, pos)
        pos += 2
        name, ctype = columns[ci]
        if ctype in _COLTYPES:
            fmt, size = _COLTYPES[ctype]
            (v,) = struct.unpack_from(fmt, b, pos)
            pos += size
            if ctype == 2:                       # Bool
                v = bool(v)
            row[name] = v
        elif ctype in _VARTYPES:
            (n,) = struct.unpack_from("<I", b, pos)
            pos += 4
            raw = b[pos:pos + n]
            pos += n
            row[name] = raw if ctype == 14 else raw.decode("utf-8")
        else:
            raise NotImplementedError(f"FlatGeobuf column type {ctype}")
    return row


def _level_bounds(num_items, node_size):
    """Per-level [start, end) node ranges, leaves first (level 0) —
    the reference's generateLevelBounds (packedrtree.cpp)."""
    if num_items <= 0:
        return [], 0
    # do-while (packedrtree.cpp generateLevelBounds): even a single
    # item gets a parent level, so numItems=1 → 2 nodes
    sizes = [num_items]
    while True:
        sizes.append((sizes[-1] + node_size - 1) // node_size)
        if sizes[-1] == 1:
            break
    # file layout is root..leaves; compute start offsets root-first
    starts = []
    acc = 0
    for s in reversed(sizes):
        starts.append(acc)
        acc += s
    bounds = [(st, st + sz) for st, sz in zip(starts, reversed(sizes))]
    return list(reversed(bounds)), acc           # leaves-first, total


def _tree_size(num_items, node_size):
    _, total = _level_bounds(num_items, node_size)
    return total * 40


def _search_index(tree, num_items, node_size, bbox):
    """Packed Hilbert R-tree search → sorted feature byte offsets.

    ``streamSearch`` shape (packedrtree.cpp:463): breadth-first from
    the root; internal items carry first-child node indices, leaf
    items carry feature byte offsets."""
    bounds, total = _level_bounds(num_items, node_size)
    num_levels = len(bounds)
    xmin, ymin, xmax, ymax = bbox
    nodes = np.frombuffer(tree, dtype=np.dtype(
        [("xmin", "<f8"), ("ymin", "<f8"), ("xmax", "<f8"),
         ("ymax", "<f8"), ("off", "<u8")]), count=total)
    hits = []
    queue = [(bounds[num_levels - 1][0], num_levels - 1)]
    leaf_start = bounds[0][0]
    while queue:
        node_index, level = queue.pop()
        end = min(node_index + node_size, bounds[level][1])
        chunk = nodes[node_index:end]
        ok = ~((chunk["xmax"] < xmin) | (chunk["ymax"] < ymin)
               | (chunk["xmin"] > xmax) | (chunk["ymin"] > ymax))
        for item in chunk[ok]:
            if level == 0:
                hits.append(int(item["off"]))
            else:
                queue.append((int(item["off"]), level - 1))
    return sorted(hits)


def read_flatgeobuf(path, bbox=None):
    """.fgb → Arrow table (fid:int64, wkb:binary, <attributes…>).

    ``bbox=(xmin, ymin, xmax, ymax)`` uses the packed R-tree index to
    decode only intersecting features (bbox semantics — no exact
    geometry test, matching the reference's non-GEOS path); without an
    index the filter falls back to a post-decode bbox test."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:7] != MAGIC:
        raise ValueError("not a FlatGeobuf file (bad magic)")
    (hsize,) = struct.unpack_from("<I", buf, 8)
    header = _parse_header(_FB.root(buf, 12))
    pos = 12 + hsize

    n = header["features_count"]
    node_size = header["index_node_size"]
    has_index = node_size > 0 and n > 0
    feat_base = pos + (_tree_size(n, node_size) if has_index else 0)

    offsets = None
    if bbox is not None and has_index:
        tree = buf[pos:feat_base]
        offsets = _search_index(tree, n, node_size, bbox)

    cols = header["columns"]
    fids, wkbs, rows = [], [], []

    def _decode_at(p, fid):
        (fsize,) = struct.unpack_from("<I", buf, p)
        fb = _FB.root(buf, p + 4)
        g = fb.table(0)
        wkbs.append(None if g is None
                    else _geometry_wkb(g, header["geometry_type"]))
        rows.append(_parse_properties(fb.vector(1, "u1"), cols))
        fids.append(fid)
        return p + 4 + fsize

    if offsets is not None:
        for i, off in enumerate(offsets):
            _decode_at(feat_base + off, i)
    else:
        p = feat_base
        fid = 0
        while p + 4 <= len(buf):
            p = _decode_at(p, fid)
            fid += 1
        if bbox is not None:
            keep = []
            for i, b in enumerate(wkbs):
                if b is None:
                    continue
                x0, y0, x1, y1 = W.wkb_bbox(b)
                if not (x1 < bbox[0] or y1 < bbox[1]
                        or x0 > bbox[2] or y0 > bbox[3]):
                    keep.append(i)
            fids = [j for j, _ in enumerate(keep)]
            wkbs = [wkbs[i] for i in keep]
            rows = [rows[i] for i in keep]

    out = {"fid": pa.array(fids, pa.int64()),
           "wkb": pa.array(wkbs, pa.binary())}
    for name, ctype in cols:
        vals = [r.get(name) for r in rows]
        if ctype == 8:                            # ULong: keep unsigned
            out[name] = pa.array(vals, pa.uint64())
        else:
            out[name] = pa.array(vals)
    return pa.Table.from_pydict(out)


def read_flatgeobuf_dataset(path, bbox=None, **kwargs):
    """.fgb → ``ray.data.Dataset`` (bounded vector side-table)."""
    import ray.data

    return ray.data.from_arrow(read_flatgeobuf(path, bbox=bbox))
