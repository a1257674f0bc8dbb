"""Mapbox Vector Tile (MVT) 2.1 codec, from scratch.

Reference driver: ``ogr/ogrsf_frmts/mvt/`` (``mvt_tile.cpp`` tile
protobuf, ``ogrmvtdataset.cpp`` geometry assembly + tile→EPSG:3857
georeferencing); semantics validated against
``autotest/ogr/ogr_pmtiles.py`` published feature/field expectations.

The tile protobuf (public vector_tile.proto):
  Tile.layers=3; Layer{version=15, name=1, features=2, keys=3,
  values=4, extent=5}; Feature{id=1, tags=2 packed, type=3,
  geometry=4 packed}; Value{string=1, float=2, double=3, int=4,
  uint=5, sint=6, bool=7}.
Geometry commands: ``(cmd | count<<3)`` with MoveTo=1 / LineTo=2 /
ClosePath=7 and zigzag-encoded deltas.  Polygon rings are classified
by shoelace sign in tile space (y down): positive area = exterior,
negative = hole (spec §4.3.4.4).
"""

from __future__ import annotations

import struct

import numpy as np

from .osmpbf import (_enc_packed, _enc_uvarint, _fields, _ld,
                     _packed_uvarints, _tag, _unzigzag, _zigzag)

__all__ = ["decode_mvt", "encode_mvt", "mvt_layer_tables",
           "tile_to_3857"]

_E = 20037508.342789244

_GEOM_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON"}


def _decode_value(buf):
    for f, wt, v in _fields(buf):
        if f == 1:
            return bytes(v).decode("utf-8")
        if f == 2:
            return struct.unpack("<f", struct.pack(
                "<I", v & 0xFFFFFFFF))[0]
        if f == 3:
            return struct.unpack("<d", struct.pack("<Q", v))[0]
        if f == 4:                         # int64: two's complement
            return int(v) - (1 << 64) if v >= (1 << 63) else int(v)
        if f == 5:                         # uint64
            return int(v)
        if f == 6:
            return int(_unzigzag(np.array([v], np.uint64))[0])
        if f == 7:
            return bool(v)
    return None


def _decode_geometry(cmds):
    """Packed command ints → list of parts, each an (n, 2) int array
    of absolute tile coordinates; ClosePath repeats the part's first
    vertex.  Returns (parts, closed_flags)."""
    parts, closed = [], []
    cur = []
    x = y = 0
    i, n = 0, len(cmds)
    while i < n:
        c = int(cmds[i])
        i += 1
        cmd, cnt = c & 0x7, c >> 3
        if cmd == 1:                      # MoveTo starts a new part
            for _ in range(cnt):
                if cur:
                    parts.append(np.asarray(cur, np.int64))
                    closed.append(False)
                    cur = []
                x += int(_unzigzag(np.array([cmds[i]], np.uint64))[0])
                y += int(_unzigzag(np.array([cmds[i + 1]],
                                            np.uint64))[0])
                i += 2
                cur = [(x, y)]
        elif cmd == 2:                    # LineTo
            if cnt:
                d = _unzigzag(np.asarray(cmds[i:i + 2 * cnt],
                                         np.uint64))
                i += 2 * cnt
                pts = np.empty((cnt, 2), np.int64)
                pts[:, 0] = x + np.cumsum(d[0::2])
                pts[:, 1] = y + np.cumsum(d[1::2])
                x, y = int(pts[-1, 0]), int(pts[-1, 1])
                cur.extend(map(tuple, pts))
        elif cmd == 7:                    # ClosePath
            if cur:
                cur.append(cur[0])
                parts.append(np.asarray(cur, np.int64))
                closed.append(True)
                cur = []
        else:
            raise ValueError(f"bad MVT geometry command {cmd}")
    if cur:
        parts.append(np.asarray(cur, np.int64))
        closed.append(False)
    return parts, closed


def decode_mvt(buf):
    """Tile bytes → list of layer dicts:
    ``{name, extent, version, features: [{id, type, tags, parts}]}``
    with ``tags`` a plain dict and ``parts`` the decoded geometry
    parts in tile coordinates."""
    layers = []
    for f, wt, v in _fields(buf):
        if f != 3:
            continue
        name, extent, version = "", 4096, 1
        keys, values, raw_feats = [], [], []
        for lf, lwt, lv in _fields(v):
            if lf == 1:
                name = bytes(lv).decode("utf-8")
            elif lf == 15:
                version = int(lv)
            elif lf == 5:
                extent = int(lv)
            elif lf == 3:
                keys.append(bytes(lv).decode("utf-8"))
            elif lf == 4:
                values.append(_decode_value(lv))
            elif lf == 2:
                raw_feats.append(lv)
        feats = []
        for fv in raw_feats:
            fid, ftype, tags, parts, closed = None, 0, {}, [], []
            for ff, fwt, fvv in _fields(fv):
                if ff == 1:
                    fid = int(fvv)
                elif ff == 3:
                    ftype = int(fvv)
                elif ff == 2:
                    ti = _packed_uvarints(bytes(fvv)) if fwt == 2 \
                        else np.array([fvv], np.uint64)
                    for k, vi in zip(ti[0::2], ti[1::2]):
                        tags[keys[int(k)]] = values[int(vi)]
                elif ff == 4:
                    cmds = _packed_uvarints(bytes(fvv)) if fwt == 2 \
                        else np.array([fvv], np.uint64)
                    parts, closed = _decode_geometry(cmds)
            feats.append({"id": fid, "type": ftype, "tags": tags,
                          "parts": parts, "closed": closed})
        layers.append({"name": name, "extent": extent,
                       "version": version, "features": feats})
    return layers


def _ring_area2(pts):
    """Twice the signed shoelace area in tile space (y down)."""
    x, y = pts[:, 0].astype(np.float64), pts[:, 1].astype(np.float64)
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def tile_to_3857(pts, z, x, y, extent):
    """Tile-local integer coords → EPSG:3857 (xyz scheme, y from the
    top — ``ogrmvtdataset.cpp`` tile georeferencing)."""
    size = 2.0 * _E / (1 << z)
    px = -_E + (x + pts[:, 0] / float(extent)) * size
    py = _E - (y + pts[:, 1] / float(extent)) * size
    return np.column_stack([px, py])


def _wkb_rings(geom_type, rings):
    """rings: list of (n,2) float64 arrays → WKB (little-endian)."""
    out = bytearray()

    def ring(r):
        out.extend(struct.pack("<I", len(r)))
        out.extend(np.ascontiguousarray(r, np.float64).tobytes())

    if geom_type == "multipoint":
        out.extend(struct.pack("<bI", 1, 4))
        out.extend(struct.pack("<I", len(rings)))
        for r in rings:
            out.extend(struct.pack("<bI", 1, 1))
            out.extend(np.ascontiguousarray(r[0], np.float64)
                       .tobytes())
    elif geom_type == "point":
        out.extend(struct.pack("<bI", 1, 1))
        out.extend(np.ascontiguousarray(rings[0][0], np.float64)
                   .tobytes())
    elif geom_type == "multilinestring":
        out.extend(struct.pack("<bI", 1, 5))
        out.extend(struct.pack("<I", len(rings)))
        for r in rings:
            out.extend(struct.pack("<bI", 1, 2))
            ring(r)
    else:                                  # multipolygon of polys
        out.extend(struct.pack("<bI", 1, 6))
        out.extend(struct.pack("<I", len(rings)))
        for poly in rings:
            out.extend(struct.pack("<bI", 1, 3))
            out.extend(struct.pack("<I", len(poly)))
            for r in poly:
                ring(r)
    return bytes(out)


def feature_wkb(feat, z, x, y, extent):
    """One decoded MVT feature → (wkb, geom_type_name) in EPSG:3857.

    Polygons assemble per spec ring winding (positive shoelace in
    tile space = exterior); the multi variant is always emitted for
    polygon/line features, matching the reference's promotion of
    tiled layers to Multi* types."""
    parts = feat["parts"]
    t = feat["type"]
    if not parts:
        return None, None
    if t == 1:
        pts = [tile_to_3857(p, z, x, y, extent) for p in parts]
        if len(pts) == 1 and len(pts[0]) == 1:
            return _wkb_rings("point", pts), "POINT"
        return _wkb_rings("multipoint", pts), "MULTIPOINT"
    if t == 2:
        lines = [tile_to_3857(p, z, x, y, extent) for p in parts]
        return _wkb_rings("multilinestring", lines), \
            "MULTILINESTRING"
    # polygons: group rings into polys by winding
    polys = []
    for p in parts:
        r3857 = tile_to_3857(p, z, x, y, extent)
        if _ring_area2(p) >= 0:            # exterior (y-down CW)
            polys.append([r3857])
        elif polys:
            polys[-1].append(r3857)
        else:                              # orphan hole: own poly
            polys.append([r3857])
    return _wkb_rings("multipolygon", polys), "MULTIPOLYGON"


def mvt_layer_tables(buf, z, x, y):
    """Tile bytes → {layer_name: pyarrow.Table} with columns
    ``mvt_id, wkb, geom_type`` + one column per attribute key."""
    import pyarrow as pa

    out = {}
    for layer in decode_mvt(buf):
        rows = {"mvt_id": [], "wkb": [], "geom_type": []}
        attr_cols = {}
        feats = layer["features"]
        for i, feat in enumerate(feats):
            wkb, gname = feature_wkb(feat, z, x, y, layer["extent"])
            if wkb is None:
                continue
            rows["mvt_id"].append(feat["id"])
            rows["wkb"].append(wkb)
            rows["geom_type"].append(gname)
            for k, v in feat["tags"].items():
                attr_cols.setdefault(k, {})[len(rows["mvt_id"]) - 1] \
                    = v
        n = len(rows["mvt_id"])
        cols = {
            "mvt_id": pa.array(rows["mvt_id"], pa.int64()),
            "wkb": pa.array(rows["wkb"], pa.binary()),
            "geom_type": pa.array(rows["geom_type"], pa.string()),
        }
        for k, vals in attr_cols.items():
            seq = [vals.get(i) for i in range(n)]
            cols[k] = pa.array(seq)
        out[layer["name"]] = pa.Table.from_pydict(cols)
    return out


# ---------------------------------------------------------------- encode

def _encode_value(v):
    if isinstance(v, bool):
        return _tag(7, 0) + _enc_uvarint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        if v >= 0:
            return _tag(4, 0) + _enc_uvarint(int(v))
        return _tag(6, 0) + _enc_uvarint(
            int(_zigzag(np.array([v]))[0]))
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    return _ld(1, str(v).encode("utf-8"))


def _encode_geometry(parts, gtype, close):
    """Absolute tile coords → packed command ints."""
    cmds = []
    x = y = 0
    for p in parts:
        p = np.asarray(p, np.int64)
        if close and len(p) > 1 and tuple(p[-1]) == tuple(p[0]):
            p = p[:-1]
        if gtype == 1:
            cmds.append((len(p) << 3) | 1)
            for px, py in p:
                cmds.append(int(_zigzag(np.array([px - x]))[0]))
                cmds.append(int(_zigzag(np.array([py - y]))[0]))
                x, y = int(px), int(py)
            continue
        cmds.append((1 << 3) | 1)
        cmds.append(int(_zigzag(np.array([int(p[0, 0]) - x]))[0]))
        cmds.append(int(_zigzag(np.array([int(p[0, 1]) - y]))[0]))
        x, y = int(p[0, 0]), int(p[0, 1])
        rest = p[1:]
        if len(rest):
            cmds.append((len(rest) << 3) | 2)
            for px, py in rest:
                cmds.append(int(_zigzag(np.array([int(px) - x]))[0]))
                cmds.append(int(_zigzag(np.array([int(py) - y]))[0]))
                x, y = int(px), int(py)
        if close:
            cmds.append((1 << 3) | 7)
    return cmds


def encode_mvt(layers):
    """Inverse of :func:`decode_mvt` — layer dicts with features of
    ``{id, type, tags, parts}`` (absolute tile coords) → tile bytes."""
    out = bytearray()
    for layer in layers:
        keys, values = [], []
        kidx, vidx = {}, {}
        lbuf = bytearray()
        lbuf += _ld(1, layer["name"].encode("utf-8"))
        fbufs = []
        for feat in layer["features"]:
            fb = bytearray()
            if feat.get("id") is not None:
                fb += _tag(1, 0) + _enc_uvarint(int(feat["id"]))
            tag_ints = []
            for k, v in feat.get("tags", {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(values)
                    values.append(v)
                tag_ints += [kidx[k], vidx[vk]]
            if tag_ints:
                fb += _ld(2, _enc_packed(tag_ints))
            fb += _tag(3, 0) + _enc_uvarint(int(feat["type"]))
            cmds = _encode_geometry(feat["parts"], feat["type"],
                                    close=feat["type"] == 3)
            fb += _ld(4, _enc_packed(cmds))
            fbufs.append(bytes(fb))
        for fb in fbufs:
            lbuf += _ld(2, fb)
        for k in keys:
            lbuf += _ld(3, k.encode("utf-8"))
        for v in values:
            lbuf += _ld(4, _encode_value(v))
        lbuf += _tag(5, 0) + _enc_uvarint(
            int(layer.get("extent", 4096)))
        lbuf += _tag(15, 0) + _enc_uvarint(
            int(layer.get("version", 2)))
        out += _ld(3, bytes(lbuf))
    return bytes(out)
