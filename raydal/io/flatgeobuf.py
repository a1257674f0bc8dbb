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
from ..geo.cells import hilbert_d

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
    if xy is None and gt not in (_GT_MULTIPOLYGON, _GT_COLLECTION):
        raise ValueError("corrupt FlatGeobuf geometry: missing xy")
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


class _Builder:
    """Minimal FlatBuffers builder (prepend-style, like the official
    implementation): offsets are tracked as distance-from-buffer-end,
    which makes uoffset/soffset arithmetic independent of final size.
    """

    def __init__(self):
        self.buf = bytearray()
        self.minalign = 4

    def _align(self, n):
        self.minalign = max(self.minalign, n)
        while len(self.buf) % n:
            self.buf[:0] = b"\x00"

    def _prepend(self, data):
        self.buf[:0] = data

    def pos(self):
        return len(self.buf)

    def string(self, s):
        raw = s.encode("utf-8") + b"\x00"
        # absolute 4-alignment of the length prefix: pad so the data
        # start lands on a 4-boundary (prefix sits directly before it)
        self._prepend(b"\x00" * ((-(len(self.buf) + len(raw))) % 4))
        self._prepend(raw)
        self._prepend(struct.pack("<I", len(raw) - 1))
        return self.pos()

    def vector(self, fmt_char, values):
        """Scalar vector; fmt_char one of 'd','I','B' etc.

        Element data must be elem-aligned in the FINISHED buffer:
        distance-from-end alignment + the finish pad to minalign give
        absolute alignment (the FlatBuffers verifier checks this)."""
        elem = struct.calcsize("<" + fmt_char)
        align_to = max(4, elem)
        self.minalign = max(self.minalign, align_to)
        raw = b"".join(struct.pack("<" + fmt_char, v) for v in values)
        pad = (-(len(self.buf) + len(raw))) % align_to
        self._prepend(b"\x00" * pad)
        self._prepend(raw)
        self._prepend(struct.pack("<I", len(values)))
        return self.pos()

    def byte_vector(self, raw):
        raw = bytes(raw)
        self._prepend(b"\x00" * ((-(len(self.buf) + len(raw))) % 4))
        self._prepend(raw)
        self._prepend(struct.pack("<I", len(raw)))
        return self.pos()

    def offset_vector(self, offsets):
        """Vector of uoffsets to already-built tables."""
        self._align(4)
        # build back-to-front so each slot's uoffset accounts for the
        # slots written after (i.e. before it in the file)
        for o in reversed(offsets):
            self._prepend(struct.pack("<I", self.pos() + 4 - o))
        self._prepend(struct.pack("<I", len(offsets)))
        return self.pos()

    def table(self, fields):
        """fields: list of (field_id, kind, value) with kind in
        {'offset', scalar struct fmt like 'B','H','Q','d'}; returns
        table end-offset.  Inline data laid out in the given order."""
        if not fields:
            # empty table: soffset + empty vtable
            vt = struct.pack("<HH", 4, 4)
            self._align(4)
            self._prepend(struct.pack("<i", 4))
            self._prepend(vt)
            return self.pos() - len(vt)
        max_id = max(f[0] for f in fields)
        # compute inline layout (relative to table start, after the
        # 4-byte soffset), aligning each scalar to its own size
        slots = {}
        off = 4
        layout = []
        for fid, kind, val in fields:
            size = 4 if kind == "offset" else struct.calcsize("<" + kind)
            pad = (-off) % size
            off += pad
            layout.append((fid, kind, val, pad, size))
            slots[fid] = off
            off += size
        table_size = off
        tail_pad = (-table_size) % 4
        vt_len = 4 + 2 * (max_id + 1)
        vt = struct.pack("<HH", vt_len, table_size) + b"".join(
            struct.pack("<H", slots.get(i, 0))
            for i in range(max_id + 1))

        # table start must be aligned to the widest inline scalar in
        # the finished buffer: distance alignment + finish pad
        max_align = max([4] + [sz for _f, k, _v, _p, sz in layout
                               if k != "offset"])
        self.minalign = max(self.minalign, max_align)
        tail_pad += (-(len(self.buf) + tail_pad + table_size)) \
            % max_align
        self._prepend(b"\x00" * tail_pad)
        # inline fields, back to front
        for fid, kind, val, pad, size in reversed(layout):
            if kind == "offset":
                self._prepend(struct.pack("<I", self.pos() + 4 - val))
            else:
                self._prepend(struct.pack("<" + kind, val))
            self._prepend(b"\x00" * pad)
        # soffset: vtable sits immediately before the table start
        self._prepend(struct.pack("<i", vt_len))
        table_pos = self.pos()
        self._prepend(vt)
        return table_pos

    def finish_size_prefixed(self, root):
        # absolute offset (within the flatbuffer, which starts AFTER
        # the u32 size prefix) = flatbuffer_size − distance; pad so
        # flatbuffer_size (root uoffset included, prefix excluded) is
        # a multiple of minalign, making every distance-aligned object
        # absolutely aligned — readers memcpy from after the prefix
        self._prepend(b"\x00" * ((-(len(self.buf) + 4))
                                  % self.minalign))
        self._prepend(struct.pack("<I", self.pos() + 4 - root))
        self._prepend(struct.pack("<I", len(self.buf)))
        return bytes(self.buf)


def _build_feature(wkb_bytes, props_blob):
    b = _Builder()
    fields = []
    if wkb_bytes is not None:
        g = W.parse_wkb(wkb_bytes)
        gt, payload = g
        gfields = []
        if gt == W.POINT:
            xy = b.vector("d", [float(payload[0, 0]),
                                float(payload[0, 1])])
            gfields.append((1, "offset", xy))
            gtype = _GT_POINT
        elif gt == W.LINESTRING:
            xy = b.vector("d", np.asarray(payload,
                                          np.float64).ravel().tolist())
            gfields.append((1, "offset", xy))
            gtype = _GT_LINESTRING
        elif gt == W.POLYGON:
            pts = np.vstack(payload)
            ends = np.cumsum([len(r) for r in payload])
            ev = b.vector("I", [int(e) for e in ends])
            xy = b.vector("d", pts.ravel().tolist())
            gfields.append((0, "offset", ev))
            gfields.append((1, "offset", xy))
            gtype = _GT_POLYGON
        elif gt == W.MULTIPOINT:
            pts = np.vstack([sub[1] for sub in payload])
            xy = b.vector("d", pts.ravel().tolist())
            gfields.append((1, "offset", xy))
            gtype = _GT_MULTIPOINT
        elif gt == W.MULTILINESTRING:
            lines = [sub[1] for sub in payload]
            pts = np.vstack(lines)
            ends = np.cumsum([len(ln) for ln in lines])
            ev = b.vector("I", [int(e) for e in ends])
            xy = b.vector("d", pts.ravel().tolist())
            gfields.append((0, "offset", ev))
            gfields.append((1, "offset", xy))
            gtype = _GT_MULTILINESTRING
        elif gt == W.MULTIPOLYGON:
            parts = []
            for _, rings in payload:
                pts = np.vstack(rings)
                ends = np.cumsum([len(r) for r in rings])
                pf = []
                ev = b.vector("I", [int(e) for e in ends])
                xy = b.vector("d", pts.ravel().tolist())
                pf.append((0, "offset", ev))
                pf.append((1, "offset", xy))
                pf.append((6, "B", _GT_POLYGON))
                parts.append(b.table(pf))
            pv = b.offset_vector(parts)
            gfields.append((7, "offset", pv))
            gtype = _GT_MULTIPOLYGON
        else:
            raise NotImplementedError(
                f"FlatGeobuf write for geometry type {gt}")
        gfields.append((6, "B", gtype))
        geom = b.table(gfields)
        fields.append((0, "offset", geom))
    if props_blob:
        pv = b.byte_vector(props_blob)
        fields.append((1, "offset", pv))
    root = b.table(fields)
    return b.finish_size_prefixed(root)


def _encode_properties(columns, row_vals):
    out = bytearray()
    for ci, ((name, ctype), v) in enumerate(zip(columns, row_vals)):
        if v is None:
            continue
        out += struct.pack("<H", ci)
        if ctype in _COLTYPES:
            fmt, _ = _COLTYPES[ctype]
            out += struct.pack(fmt, int(v) if ctype != 10 and ctype != 9
                               else float(v))
        else:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def _column_type_of(pa_type):
    if pa.types.is_boolean(pa_type):
        return 2
    if pa.types.is_integer(pa_type):
        return 7                                  # Long
    if pa.types.is_floating(pa_type):
        return 10                                 # Double
    if pa.types.is_binary(pa_type) or pa.types.is_large_binary(pa_type):
        return 14                                 # Binary
    return 11                                     # String


def write_flatgeobuf(table, path, layer="layer", node_size=16,
                     wkb_col="wkb"):
    """Arrow table with a plain-WKB column → .fgb with a packed Hilbert
    R-tree index (reference writer shape:
    ``ogrflatgeobuflayer.cpp`` + ``packedrtree.cpp`` hilbertSort/
    bulk-build).  Features are Hilbert-sorted on a 2^16 grid over the
    extent — the format's locality contract — then indexed bottom-up.
    Null-geometry rows are not writable to an indexed file (matching
    the reference, which rejects them when SPATIAL_INDEX=YES)."""
    wkbs = table[wkb_col].to_pylist()
    if any(b is None for b in wkbs):
        raise ValueError("null geometry not writable with a spatial "
                         "index (write the rows filtered, or extend "
                         "with node_size=0 support)")
    n = len(wkbs)
    boxes = np.array([W.wkb_bbox(b) for b in wkbs]) if n else \
        np.empty((0, 4))
    if n:
        ext = (boxes[:, 0].min(), boxes[:, 1].min(),
               boxes[:, 2].max(), boxes[:, 3].max())
        w = max(ext[2] - ext[0], 1e-12)
        h = max(ext[3] - ext[1], 1e-12)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        gx = np.clip(((cx - ext[0]) / w * 65535).astype(np.int64),
                     0, 65535)
        gy = np.clip(((cy - ext[1]) / h * 65535).astype(np.int64),
                     0, 65535)
        order = np.argsort(hilbert_d(16, gx, gy), kind="stable")
    else:
        ext = (0.0, 0.0, 0.0, 0.0)
        order = np.array([], np.int64)

    attrs = [(nm, t) for nm, t in zip(table.schema.names,
                                      table.schema.types)
             if nm not in (wkb_col, "fid")]
    columns = [(nm, _column_type_of(t)) for nm, t in attrs]
    acols = [table[nm].to_pylist() for nm, _ in attrs]

    feats = []
    offs = []
    total = 0
    for i in order:
        props = _encode_properties(columns,
                                   [c[i] for c in acols])
        blob = _build_feature(wkbs[i], props)
        offs.append(total)
        total += len(blob)
        feats.append(blob)

    gtypes = {W.wkb_geom_type(b) for b in wkbs}
    gname_code = ({W.POINT: 1, W.LINESTRING: 2, W.POLYGON: 3,
                   W.MULTIPOINT: 4, W.MULTILINESTRING: 5,
                   W.MULTIPOLYGON: 6}[gtypes.pop()]
                  if len(gtypes) == 1 else 0)

    # header
    b = _Builder()
    col_tabs = []
    for nm, ct in columns:
        s = b.string(nm)
        col_tabs.append(b.table([(0, "offset", s), (1, "B", ct)]))
    cols_vec = b.offset_vector(col_tabs) if col_tabs else None
    env = b.vector("d", [ext[0], ext[1], ext[2], ext[3]])
    nm_off = b.string(layer)
    hfields = [(0, "offset", nm_off), (1, "offset", env),
               (2, "B", gname_code)]
    if cols_vec is not None:
        hfields.append((7, "offset", cols_vec))
    hfields.append((8, "Q", n))
    hfields.append((9, "H", node_size if n else 0))
    header = b.finish_size_prefixed(b.table(hfields))

    # packed R-tree, bottom-up; file layout root..leaves
    tree = b""
    if n:
        item = np.dtype([("xmin", "<f8"), ("ymin", "<f8"),
                         ("xmax", "<f8"), ("ymax", "<f8"),
                         ("off", "<u8")])
        leaves = np.empty(n, item)
        sb = boxes[order]
        leaves["xmin"], leaves["ymin"] = sb[:, 0], sb[:, 1]
        leaves["xmax"], leaves["ymax"] = sb[:, 2], sb[:, 3]
        leaves["off"] = np.asarray(offs, np.uint64)
        levels = [leaves]
        while len(levels[-1]) > 1:
            child = levels[-1]
            m = (len(child) + node_size - 1) // node_size
            parent = np.empty(m, item)
            for j in range(m):
                grp = child[j * node_size:(j + 1) * node_size]
                parent[j]["xmin"] = grp["xmin"].min()
                parent[j]["ymin"] = grp["ymin"].min()
                parent[j]["xmax"] = grp["xmax"].max()
                parent[j]["ymax"] = grp["ymax"].max()
                parent[j]["off"] = 0        # child index filled below
            levels.append(parent)
        if len(levels) == 1:                 # single item still gets a
            levels.append(levels[0].copy())  # root (do-while semantics)
            levels[-1] = levels[-1][:1]
        levels.reverse()                     # root first
        # internal items point at the node index of their first child
        start = 0
        starts = []
        for lv in levels:
            starts.append(start)
            start += len(lv)
        for li in range(len(levels) - 1):
            child_start = starts[li + 1]
            for j in range(len(levels[li])):
                levels[li][j]["off"] = child_start + j * node_size
        tree = b"".join(lv.tobytes() for lv in levels)

    with open(path, "wb") as f:
        f.write(MAGIC + b"\x01")
        f.write(header)
        f.write(tree)
        for blob in feats:
            f.write(blob)
    return path
