"""AutoCAD DXF vector reader — from scratch on the public DXF group
-code layout, with OGR-parity entity translation.

Reference semantics (``ogr/ogrsf_frmts/dxf/``):

* **Reader**: the file is (group code, value) line pairs; sections
  HEADER ($ variables), TABLES (LAYER / LTYPE / DIMSTYLE / STYLE),
  BLOCKS (entity lists, base-point shifted), ENTITIES.
* **Entities** (``ogrdxflayer.cpp``): POINT, LINE, LWPOLYLINE /
  POLYLINE+VERTEX (bulge arcs via the sagitta construction of
  ``ogrdxf_polyline_smooth.cpp`` EmitArc), CIRCLE, ARC (codes 50/51
  are END/START negated), ELLIPSE (axis-endpoint + ratio, radian
  params), TEXT / MTEXT (point + Text field + LABEL style), INSERT
  (blocks inlined; non-label geometries merged into one feature —
  SimplifyBlockGeometry), DIMENSION (fallback rendering: dimension
  multiline + two default arrowheads + text label,
  ``ogrdxf_dimension.cpp``).
* **Arc stroking** (``ogrgeometryfactory.cpp`` approximateArcAngles):
  angles negated, ``max(2, ceil(|Δ|/4°)+1)`` vertices, rotation
  applied as x=cx+ex·cos r+ey·sin r / y=cy−ex·sin r+ey·cos r, full
  circles close exactly on the first vertex.
* **OCS** (``ogrdxf_ocstransformer.cpp``): arbitrary-axis algorithm —
  AX = (|Nx|,|Ny| < 1/64 ? WY : WZ) × N, AY = N × AX, world = x·AX +
  y·AY + z·N.
* **Styles** (``ogrdxf_feature.cpp`` GetColor, PrepareLineStyle,
  TranslateTEXT/MTEXT): PEN(c:#rrggbb[,w:..g]) and
  LABEL(f:"..",t:"..",..) with the fixed public ACI palette (index
  7 plots black; 10-249 the 24-hue × 5-value × 2-saturation chart;
  250-255 the gray ramp).

Published parity: ``autotest/ogr/ogr_dxf.py`` tests 1-11 (feature
count 22 on assorted.dxf incl. dimension fallback + inlined block,
exact ellipse/line/point/dimension WKTs, OCS LWPOLYLINE with bulge,
entities-only files).
"""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pyarrow as pa

__all__ = ["read_dxf", "aci_color_table"]

ARC_STEP_DEG = 4.0                     # OGR_ARC_STEPSIZE default

def _f(s):
    """CPLAtof semantics: parse the leading numeric prefix."""
    m = re.match(r"\s*[-+]?(\d+\.?\d*([eE][-+]?\d+)?|\.\d+([eE][-+]?\d+)?)", s)
    return float(m.group(0)) if m else 0.0


def _i(s):
    """atoi semantics: parse the leading integer prefix."""
    m = re.match(r"\s*[-+]?\d+", s)
    return int(m.group(0)) if m else 0




# ------------------------------------------------------- ACI palette

def aci_color_table():
    """256×3 uint8 AutoCAD Color Index palette.

    This is the fixed, publicly documented ACI palette (the same
    table every CAD implementation ships; ACGetColorTable parity
    asserted in tests/test_dxf.py against the reference's values).
    Index 7 plots black ("should be white, but that plots poorly"),
    10-249 are the 24-hue × 5-value × 2-saturation chart, 250-255
    the gray ramp.  Stored as data because the historical chart is
    not exactly reproducible by a rounding formula.
    """
    import base64
    data = base64.b64decode(
    "AAAA/wAA//8AAP8AAP//AAD//wD/AAAAf39/v7+//wAA/39/pQAApVJSfwAAfz8/"
    "TAAATCYmJgAAJhMT/z8A/59/pSkApWdSfx8Af08/TBMATC8mJgkAJhcT/38A/79/"
    "pVIApXxSfz8Af18/TCYATDkmJhMAJhwT/78A/99/pXwApZFSf18Af28/TDkATEIm"
    "JhwAJiET//8A//9/paUApaVSf38Af38/TEwATEwmJiYAJiYTv/8A3/9/fKUAkaVS"
    "X38Ab38/OUwAQkwmHCYAISYTf/8Av/9/UqUAfKVSP38AX38/JkwAOUwmEyYAHCYT"
    "P/8An/9/KaUAZ6VSH38AT38/E0wAL0wmCSYAFyYTAP8Af/9/AKUAUqVSAH8AP38/"
    "AEwAJkwmACYAEyYTAP8/f/+fAKUpUqVnAH8fP39PAEwTJkwvACYJEyYXAP9/f/+/"
    "AKVSUqV8AH8/P39fAEwmJkw5ACYTEyYcAP+/f//fAKV8UqWRAH9fP39vAEw5JkxC"
    "ACYcEyYhAP//f///AKWlUqWlAH9/P39/AExMJkxMACYmEyYmAL//f9//AHylUpGl"
    "AF9/P29/ADlMJkJMABwmEyEmAH//f7//AFKlUnylAD9/P19/ACZMJjlMABMmExwm"
    "AD//f5//ACmlUmelAB9/P09/ABNMJi9MAAkmExcmAAD/f3//AAClUlKlAAB/Pz9/"
    "AABMJiZMAAAmExMmPwD/n3//KQClZ1KlHwB/Tz9/EwBMLyZMCQAmFxMmfwD/v3//"
    "UgClfFKlPwB/Xz9/JgBMOSZMEwAmHBMmvwD/33//fAClkVKlXwB/bz9/OQBMQiZM"
    "HAAmIRMm/wD//3//pQClpVKlfwB/fz9/TABMTCZMJgAmJhMm/wC//3/fpQB8pVKR"
    "fwBffz9vTAA5TCZCJgAcJhMh/wB//3+/pQBSpVJ8fwA/fz9fTAAmTCY5JgATJhMc"
    "/wA//3+fpQAppVJnfwAffz9PTAATTCYvJgAJJhMXVFRUdnZ2mJiYurq63Nzc////")
    return np.frombuffer(data, np.uint8).reshape(256, 3)


_ACI = None


def _color_hex(idx):
    global _ACI
    if _ACI is None:
        _ACI = aci_color_table()
    if idx < 1 or idx > 255:
        idx = 7
    r, g, b = _ACI[idx]
    return f"#{r:02x}{g:02x}{b:02x}"


# ------------------------------------------------------- pair reader

class _Pairs:
    def __init__(self, path):
        with open(path, "rb") as f:
            text = f.read().decode("latin-1")
        self.lines = text.splitlines()
        self.i = 0

    def read(self):
        """→ (code, value) or None at EOF."""
        while self.i + 1 < len(self.lines):
            code_s = self.lines[self.i].strip()
            val = self.lines[self.i + 1]
            self.i += 2
            try:
                code = int(code_s)
            except ValueError:
                continue
            return code, val.strip()
        return None

    def unread(self):
        self.i -= 2


# ------------------------------------------------------ geometry kit

def _approximate_arc(cx, cy, z, r1, r2, rotation, a0, a1,
                     step=ARC_STEP_DEG):
    """approximateArcAngles parity: returns (N,3) float64."""
    rot = math.radians(rotation)
    full = abs(a1 - a0) == 360.0
    a0, a1 = -a0, -a1
    n = max(2, int(math.ceil(abs(a1 - a0) / step) + 1))
    slc = (a1 - a0) / (n - 1)
    if full:
        n -= 1
    ang = np.radians(a0 + slc * np.arange(n))
    ex = np.cos(ang) * r1
    ey = np.sin(ang) * r2
    x = cx + ex * math.cos(rot) + ey * math.sin(rot)
    y = cy - ex * math.sin(rot) + ey * math.cos(rot)
    pts = np.column_stack([x, y, np.full(n, float(z))])
    if full:
        pts = np.vstack([pts, pts[0]])
    return pts


class _SmoothPolyline:
    """DXFSmoothPolyline parity (bulge arcs, duplicate-point
    emission order included)."""

    def __init__(self):
        self.v = []        # (x, y, z, bulge)
        self.dim = 2
        self.closed = False

    def add(self, x, y, z, bulge):
        self.v.append((x, y, z, bulge))

    def close(self):
        if len(self.v) >= 2 and not self.closed:
            if (self.v[-1][0], self.v[-1][1]) != (self.v[0][0],
                                                  self.v[0][1]):
                self.v.append(self.v[0])
            self.closed = True

    def tessellate(self):
        """→ (kind, coords) with kind 'point'|'line'."""
        if len(self.v) == 1:
            x, y, z, _ = self.v[0]
            return "point", np.array([[x, y, z]])
        pts = []
        started = False
        for i in range(len(self.v) - 1):
            bx, by, bz, bb = self.v[i]
            ex, ey, ez, _ = self.v[i + 1]
            ln = math.hypot(ex - bx, ey - by)
            if ln == 0 or bb == 0 or bz != ez:
                if not started:
                    pts.append((bx, by, bz))
                    started = True
                pts.append((ex, ey, ez))
            else:
                h = bb * ln / 2.0
                radius = h / 2.0 + ln * ln / (8.0 * h)
                arc = _emit_arc((bx, by), (ex, ey), radius, ln, bb, bz)
                pts.extend(arc)
        return "line", np.array(pts, float)


def _emit_arc(start, end, radius, ln, bulge, z):
    """EmitArc parity (ogrdxf_polyline_smooth.cpp:105-190)."""
    rot = 0.0
    r = abs(radius)
    cw = bulge < 0
    if cw:
        bulge = -bulge
    sag = abs(bulge * ln / 2.0)
    apo = -(r - sag) if cw else -(sag - r)
    vx, vy = start[0] - end[0], start[1] - end[1]
    mx, my = end[0] + 0.5 * vx, end[1] + 0.5 * vy
    px, py = vy, -vx
    norm = math.hypot(px, py)
    if norm:
        px, py = px / norm, py / norm
    ccx, ccy = mx + px * apo, my + py * apo
    linedir = 1.0 if end[1] > start[1] else -1.0

    def ogr_angle(a):
        return -(a - 180.0) if a > 0.0 else -(a + 180.0)

    a = math.degrees(math.atan2(ccy - start[1], ccx - start[0]))
    if cw and linedir == 1.0:
        a += linedir * 180.0
    a_start = ogr_angle(a)
    a = math.degrees(math.atan2(ccy - end[1], ccx - end[0]))
    if cw and linedir == 1.0:
        a += linedir * 180.0
    a_end = ogr_angle(a)
    if not cw and a_start < a_end:
        a_end = -180.0 + linedir * a
    if cw and a_start > a_end:
        a_end += 360.0
    if cw and linedir == 1.0:
        rot = linedir * 180.0
    if abs(a_end - a_start) > 361.0:
        return []
    arc = _approximate_arc(ccx, ccy, z, r, r, rot, a_start, a_end)
    if len(arc) >= 2:
        arc[0, :2] = start
        arc[-1, :2] = end
    return [tuple(p) for p in arc]


def _ocs_axes(n):
    n = np.asarray(n, float)
    nl = np.linalg.norm(n)
    if nl:
        n = n / nl
    small = 1.0 / 64.0
    w = np.array([0.0, 1.0, 0.0]) if (abs(n[0]) < small and
                                      abs(n[1]) < small) \
        else np.array([0.0, 0.0, 1.0])
    ax = np.cross(w, n)
    axl = np.linalg.norm(ax)
    if axl:
        ax = ax / axl
    ay = np.cross(n, ax)
    ayl = np.linalg.norm(ay)
    if ayl:
        ay = ay / ayl
    return ax, ay, n


def _ocs_transform(coords, n):
    ax, ay, nz = _ocs_axes(n)
    c = np.asarray(coords, float)
    m = np.vstack([ax, ay, nz])          # rows are the OCS axes
    return c @ m


def _ocs_inverse(coords, n):
    ax, ay, nz = _ocs_axes(n)
    m = np.vstack([ax, ay, nz])
    return np.asarray(coords, float) @ np.linalg.inv(m)


# --------------------------------------------------------- features

class _Feat:
    __slots__ = ("geom", "fields", "style", "props", "ocs",
                 "is_blockref", "blockname", "blockcoords",
                 "blockscale", "blockangle")

    def __init__(self):
        # geom: (kind, payload, has_z) where kind in point/line/
        # polygon/multipoint/multiline/multipolygon/collection
        self.geom = None
        self.fields = {"Layer": "0", "SubClasses": None,
                       "Linetype": None, "EntityHandle": None,
                       "Text": None, "PaperSpace": None}
        self.style = None
        self.props = {}
        self.ocs = None
        self.is_blockref = False
        self.blockname = None
        self.blockcoords = (0.0, 0.0, 0.0)
        self.blockscale = (1.0, 1.0, 1.0)
        self.blockangle = 0.0

    def clone(self):
        f = _Feat()
        f.geom = _clone_geom(self.geom)
        f.fields = dict(self.fields)
        f.style = self.style
        f.props = dict(self.props)
        f.ocs = self.ocs
        f.is_blockref = self.is_blockref
        f.blockname = self.blockname
        f.blockcoords = self.blockcoords
        f.blockscale = self.blockscale
        f.blockangle = self.blockangle
        return f

    def apply_ocs(self, geom=None):
        g = geom if geom is not None else self.geom
        if g is None or self.ocs is None:
            return g
        n = self.ocs
        if n == (0.0, 0.0, 1.0):
            return g
        kind, payload, has_z = g
        initially_2d = not has_z

        def tx(c):
            return _ocs_transform(c, n)

        payload = _map_coords(payload, kind, tx)
        if initially_2d:
            zs = _all_z(payload, kind)
            has_z = bool(zs.size) and not (zs.min() == 0.0 and
                                           zs.max() == 0.0)
        out = (kind, payload, has_z)
        if geom is None:
            self.geom = out
        return out


def _clone_geom(g):
    if g is None:
        return None
    kind, payload, has_z = g
    if kind in ("point", "line"):
        return (kind, payload.copy(), has_z)
    if kind == "polygon":
        return (kind, [r.copy() for r in payload], has_z)
    return (kind, [_clone_geom(p) for p in payload], has_z)


def _map_coords(payload, kind, fn):
    if kind in ("point", "line"):
        return fn(payload)
    if kind == "polygon":
        return [fn(r) for r in payload]
    return [( _map_coords(p, k, fn), k, z)[0] if False else
            (k, _map_coords(p, k, fn), z)
            for (k, p, z) in payload]


def _all_z(payload, kind):
    if kind in ("point", "line"):
        return payload[:, 2]
    if kind == "polygon":
        return np.concatenate([r[:, 2] for r in payload]) \
            if payload else np.empty(0)
    parts = [_all_z(p, k) for (k, p, z) in payload]
    return np.concatenate(parts) if parts else np.empty(0)


def _transform_geom(g, fn):
    if g is None:
        return None
    kind, payload, has_z = g
    return (kind, _map_coords(payload, kind, fn), has_z)


def _insert_transform(coords, xs, ys, zs, angle, dx, dy, dz):
    c = np.asarray(coords, float).copy()
    c[:, 0] *= xs
    c[:, 1] *= ys
    c[:, 2] *= zs
    xn = c[:, 0] * math.cos(angle) - c[:, 1] * math.sin(angle)
    yn = c[:, 0] * math.sin(angle) + c[:, 1] * math.cos(angle)
    c[:, 0] = xn + dx
    c[:, 1] = yn + dy
    c[:, 2] += dz
    return c


# ------------------------------------------------------- datasource

_DIMCODE_NAMES = {40: "DIMSCALE", 41: "DIMASZ", 42: "DIMEXO",
                  44: "DIMEXE", 75: "DIMSE1", 76: "DIMSE2",
                  77: "DIMTAD", 140: "DIMTXT", 147: "DIMGAP",
                  176: "DIMCLRD", 178: "DIMCLRT", 271: "DIMDEC"}

_DIM_DEFAULTS = {"DIMSCALE": "1.0", "DIMASZ": "0.18",
                 "DIMEXO": "0.0625", "DIMEXE": "0.18",
                 "DIMSE1": "0", "DIMSE2": "0", "DIMTAD": "0",
                 "DIMTXT": "0.18", "DIMGAP": "0.09",
                 "DIMCLRD": "0", "DIMCLRT": "0", "DIMDEC": "4"}


class _DXF:
    def __init__(self, path):
        self.pairs = _Pairs(path)
        self.header = {}
        self.layers = {}
        self.linetypes = {}
        self.dimstyles = {}
        self.textstyles = {}
        self.blocks = {}
        self.features = []
        self._pending = []
        self._parse()

    # ---------------- document structure

    def _parse(self):
        p = self.pairs
        while True:
            pair = p.read()
            if pair is None:
                return
            code, val = pair
            if code != 0:
                continue
            if val == "SECTION":
                pair = p.read()
                if pair is None:
                    return
                name = pair[1]
                if name == "HEADER":
                    self._read_header()
                elif name == "TABLES":
                    self._read_tables()
                elif name == "BLOCKS":
                    self._read_blocks()
                elif name == "ENTITIES":
                    self._read_entities()
                else:
                    self._skip_section()
            elif val == "EOF":
                return

    def _skip_section(self):
        while True:
            pair = self.pairs.read()
            if pair is None or (pair[0] == 0 and pair[1] == "ENDSEC"):
                return

    def _read_header(self):
        var = None
        while True:
            pair = self.pairs.read()
            if pair is None:
                return
            code, val = pair
            if code == 0 and val == "ENDSEC":
                return
            if code == 9:
                var = val
            elif var is not None and var not in self.header:
                self.header[var] = val

    def _read_tables(self):
        while True:
            pair = self.pairs.read()
            if pair is None:
                return
            code, val = pair
            if code == 0 and val == "ENDSEC":
                return
            if code != 0:
                continue
            if val == "LAYER":
                self._read_layer()
            elif val == "LTYPE":
                self._read_ltype()
            elif val == "DIMSTYLE":
                self._read_dimstyle()
            elif val == "STYLE":
                self._read_textstyle()

    def _read_table_entry(self, spec):
        """Read until next 0-code; spec: {code: key}; returns dict +
        raw pairs."""
        props = {}
        while True:
            pair = self.pairs.read()
            if pair is None:
                return props
            code, val = pair
            if code == 0:
                self.pairs.unread()
                return props
            if code in spec:
                props[spec[code]] = val
        return props

    def _read_layer(self):
        props = {"Hidden": "0"}
        name = ""
        while True:
            pair = self.pairs.read()
            if pair is None:
                break
            code, val = pair
            if code == 0:
                self.pairs.unread()
                break
            if code == 2:
                name = val
            elif code == 6:
                props["Linetype"] = val
            elif code == 62:
                props["Color"] = val
                if _i(val) < 0 and props["Hidden"] != "2":
                    props["Hidden"] = "1"
            elif code == 420:
                props["TrueColor"] = val
            elif code == 70:
                if _i(val) & 1:
                    props["Hidden"] = "2"
            elif code in (370, 39):
                props["LineWeight"] = val
        self.layers[name] = props

    def _read_ltype(self):
        name = ""
        pat = []
        while True:
            pair = self.pairs.read()
            if pair is None:
                break
            code, val = pair
            if code == 0:
                self.pairs.unread()
                break
            if code == 2:
                name = val
            elif code == 49:
                pat.append(_f(val))
        self.linetypes[name.upper()] = pat

    def _read_dimstyle(self):
        name = ""
        props = dict(_DIM_DEFAULTS)
        while True:
            pair = self.pairs.read()
            if pair is None:
                break
            code, val = pair
            if code == 0:
                self.pairs.unread()
                break
            if code == 2:
                name = val
            elif code in _DIMCODE_NAMES:
                props[_DIMCODE_NAMES[code]] = val
        self.dimstyles[name] = props

    def _read_textstyle(self):
        name = ""
        props = {}
        while True:
            pair = self.pairs.read()
            if pair is None:
                break
            code, val = pair
            if code == 0:
                self.pairs.unread()
                break
            if code == 2:
                name = val
            elif code == 1000:
                props["Font"] = val
        self.textstyles[name] = props

    def _read_blocks(self):
        while True:
            pair = self.pairs.read()
            if pair is None:
                return
            code, val = pair
            if code == 0 and val == "ENDSEC":
                return
            if code != 0 or val != "BLOCK":
                continue
            name = ""
            base = [0.0, 0.0, 0.0]
            while True:
                pair = self.pairs.read()
                if pair is None:
                    return
                code, val = pair
                if code == 0:
                    break
                if code == 2:
                    name = val
                elif code == 10:
                    base[0] = -_f(val)
                elif code == 20:
                    base[1] = -_f(val)
                elif code == 30:
                    base[2] = -_f(val)
            if val == "ENDBLK":
                continue
            self.pairs.unread()
            feats = []
            while True:
                f = self._next_entity(inline_blocks=False)
                if f is None:
                    break
                if f.geom is not None and base != [0.0, 0.0, 0.0]:
                    f.geom = _transform_geom(
                        f.geom, lambda c: np.asarray(c, float) +
                        np.asarray(base))
                if f.is_blockref and base != [0.0, 0.0, 0.0]:
                    f.blockcoords = tuple(
                        np.asarray(f.blockcoords) + np.asarray(base))
                feats.append(f)
            self.blocks[name] = feats

    def _read_entities(self):
        while True:
            f = self._next_entity(inline_blocks=True)
            if f is None:
                return
            self.features.append(f)

    # ---------------- entity stream

    def _next_entity(self, inline_blocks):
        if self._pending:
            return self._pending.pop(0)
        while True:
            pair = self.pairs.read()
            if pair is None:
                return None
            code, val = pair
            if code != 0:
                continue
            if val in ("ENDSEC", "ENDBLK", "EOF"):
                self.pairs.unread()
                return None
            fn = {"POINT": self._tr_point, "LINE": self._tr_line,
                  "LWPOLYLINE": self._tr_lwpolyline,
                  "POLYLINE": self._tr_polyline,
                  "CIRCLE": self._tr_circle, "ARC": self._tr_arc,
                  "ELLIPSE": self._tr_ellipse,
                  "MTEXT": self._tr_mtext,
                  "TEXT": self._tr_text,
                  "SOLID": self._tr_solid, "TRACE": self._tr_solid,
                  "3DFACE": self._tr_3dface,
                  }.get(val)
            if fn is not None:
                f = fn()
                if f is not None:
                    return f
                continue
            if val == "INSERT":
                f = self._tr_insert(inline_blocks)
                if f is not None:
                    return f
                if self._pending:
                    return self._pending.pop(0)
                continue
            if val == "DIMENSION":
                f = self._tr_dimension(inline_blocks)
                if f is not None:
                    return f
                if self._pending:
                    return self._pending.pop(0)
                continue
            # unsupported entity: consume its codes
            self._consume()

    def _consume(self):
        while True:
            pair = self.pairs.read()
            if pair is None:
                return {}
            if pair[0] == 0:
                self.pairs.unread()
                return {}

    def _generic(self, f, code, val):
        if code == 8:
            f.fields["Layer"] = val
        elif code == 100:
            sc = f.fields["SubClasses"]
            f.fields["SubClasses"] = (sc + ":" + val) if sc else val
        elif code == 60:
            if _i(val):
                f.props["Hidden"] = "1"
        elif code == 67:
            if _i(val):
                f.fields["PaperSpace"] = 1
        elif code == 62:
            f.props["Color"] = val
        elif code == 420:
            f.props["TrueColor"] = val
        elif code == 6:
            f.fields["Linetype"] = val
        elif code == 48:
            f.props["LinetypeScale"] = val
        elif code in (370, 39):
            f.props["LineWeight"] = val
        elif code == 5:
            f.fields["EntityHandle"] = val
        elif code == 210:
            f.ocs = ((_f(val),) + (f.ocs[1:] if f.ocs else
                                      (0.0, 1.0)))
        elif code == 220:
            o = f.ocs or (0.0, 0.0, 1.0)
            f.ocs = (o[0], _f(val), o[2])
        elif code == 230:
            o = f.ocs or (0.0, 0.0, 1.0)
            f.ocs = (o[0], o[1], _f(val))

    def _entity_loop(self, f, handlers):
        """Drive the code/value loop for one entity."""
        while True:
            pair = self.pairs.read()
            if pair is None:
                return False
            code, val = pair
            if code == 0:
                self.pairs.unread()
                return True
            h = handlers.get(code)
            if h is not None:
                h(val)
            else:
                self._generic(f, code, val)

    # ---------------- styles

    def layer_prop(self, layer, prop):
        return self.layers.get(layer, {}).get(prop)

    def get_color(self, f, block_feat=None):
        hidden = False
        if "Hidden" in f.props or (block_feat and
                                   "Hidden" in block_feat.props):
            hidden = True
        else:
            lh = self.layer_prop(f.fields["Layer"], "Hidden")
            ih = _i(lh) if lh else 0
            if not ih and block_feat:
                bh = self.layer_prop(block_feat.fields["Layer"],
                                     "Hidden")
                if bh and _i(bh) == 2:
                    ih = 2
            hidden = bool(ih)
        color = 256                       # BYLAYER
        true_color = None
        if "TrueColor" in f.props:
            true_color = _i(f.props["TrueColor"])
        elif "Color" in f.props:
            color = _i(f.props["Color"])
        if true_color is None and color == 0 and block_feat:
            if "TrueColor" in block_feat.props:
                true_color = _i(block_feat.props["TrueColor"])
            elif "Color" in block_feat.props:
                color = _i(block_feat.props["Color"])
        if true_color is None and color == 256:
            layer = (block_feat.fields["Layer"]
                     if block_feat else f.fields["Layer"])
            tc = self.layer_prop(layer, "TrueColor")
            if tc:
                true_color = _i(tc)
            else:
                lc = self.layer_prop(layer, "Color")
                if lc is not None:
                    color = _i(lc)
        if true_color is not None:
            res = f"#{true_color & 0xFFFFFF:06x}"
        else:
            if color < 1 or color > 255:
                color = 7
            res = _color_hex(color)
        if hidden:
            res += "00"
        return res

    def prepare_line_style(self, f, block_feat=None):
        weight = f.props.get("LineWeight", "-1")
        if _f(weight) == -1:
            weight = self.layer_prop(f.fields["Layer"],
                                     "LineWeight") or "0"
        dfw = _f(weight) / 100.0
        style = "PEN(c:" + self.get_color(f, block_feat)
        if dfw > 0.0:
            style += ",w:%.2gg" % dfw
        lt = f.fields["Linetype"] or \
            self.layer_prop(f.fields["Layer"], "Linetype")
        pat = self.linetypes.get((lt or "").upper()) or []
        scale = _f(self.header.get("$LTSCALE", "1.0") or "1.0")
        if "LinetypeScale" in f.props:
            scale *= _f(f.props["LinetypeScale"])
        if pat:
            style += ',p:"' + " ".join(
                "%.11gg" % (abs(v) * scale) for v in pat) + '"'
        style += ")"
        f.style = style

    # ---------------- entity translators

    def _tr_point(self):
        f = _Feat()
        st = {"x": 0.0, "y": 0.0, "z": 0.0, "hz": False}
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("hz", True))})
        if not ok:
            return None
        f.geom = ("point", np.array([[st["x"], st["y"], st["z"]]]),
                  st["hz"])
        self.prepare_line_style(f)
        return f

    def _tr_line(self):
        f = _Feat()
        st = dict(x1=0.0, y1=0.0, z1=0.0, x2=0.0, y2=0.0, z2=0.0,
                  hz=False)
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x1", _f(v)),
            20: lambda v: st.__setitem__("y1", _f(v)),
            30: lambda v: (st.__setitem__("z1", _f(v)),
                           st.__setitem__("hz", True)),
            11: lambda v: st.__setitem__("x2", _f(v)),
            21: lambda v: st.__setitem__("y2", _f(v)),
            31: lambda v: (st.__setitem__("z2", _f(v)),
                           st.__setitem__("hz", True))})
        if not ok:
            return None
        f.geom = ("line", np.array([[st["x1"], st["y1"], st["z1"]],
                                    [st["x2"], st["y2"], st["z2"]]]),
                  st["hz"])
        self.prepare_line_style(f)
        return f

    def _tr_lwpolyline(self):
        f = _Feat()
        sp = _SmoothPolyline()
        st = {"x": 0.0, "y": 0.0, "z": 0.0, "bulge": 0.0,
              "havex": False, "havey": False, "flag": 0, "dim": 2}

        def flush():
            if st["havex"] and st["havey"]:
                sp.add(st["x"], st["y"], st["z"], st["bulge"])
                st["bulge"] = 0.0

        def on_x(v):
            if st["havex"] and st["havey"]:
                flush()
                st["havey"] = False
            st["x"] = _f(v)
            st["havex"] = True

        def on_y(v):
            if st["havex"] and st["havey"]:
                flush()
                st["havex"] = False
            st["y"] = _f(v)
            st["havey"] = True

        ok = self._entity_loop(f, {
            38: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("dim", 3)),
            70: lambda v: st.__setitem__("flag", _i(v)),
            10: on_x, 20: on_y,
            42: lambda v: st.__setitem__("bulge", _f(v)),
            90: lambda v: None})
        if not ok:
            return None
        flush()
        if not sp.v:
            return None
        if st["flag"] & 1:
            sp.close()
        kind, coords = sp.tessellate()
        has_z = st["dim"] == 3
        f.geom = (kind, coords, has_z)
        f.geom = f.apply_ocs()
        self.prepare_line_style(f)
        return f

    def _tr_polyline(self):
        f = _Feat()
        st = {"flag": 0}
        ok = self._entity_loop(f, {
            70: lambda v: st.__setitem__("flag", _i(v))})
        if not ok:
            return None
        if st["flag"] & 16:
            self._skip_to_seqend()
            return None
        sp = _SmoothPolyline()
        dim = 2
        # collect VERTEX sub-entities until SEQEND
        while True:
            pair = self.pairs.read()
            if pair is None:
                break
            code, val = pair
            if code != 0:
                continue
            if val == "SEQEND":
                self._consume()
                break
            if val != "VERTEX":
                self._consume()
                continue
            x = y = z = bulge = 0.0
            vflag = 0
            while True:
                pair = self.pairs.read()
                if pair is None:
                    break
                code, v = pair
                if code == 0:
                    self.pairs.unread()
                    break
                if code == 10:
                    x = _f(v)
                elif code == 20:
                    y = _f(v)
                elif code == 30:
                    z = _f(v)
                    dim = 3
                elif code == 42:
                    bulge = _f(v)
                elif code == 70:
                    vflag = _i(v)
            if (vflag & 16) == 0 and (vflag & 64) == 0:
                sp.add(x, y, z, bulge)
        if not sp.v:
            return None
        if st["flag"] & 1:
            sp.close()
        kind, coords = sp.tessellate()
        f.geom = (kind, coords, dim == 3)
        f.geom = f.apply_ocs()
        self.prepare_line_style(f)
        return f

    def _skip_to_seqend(self):
        while True:
            pair = self.pairs.read()
            if pair is None:
                return
            if pair[0] == 0 and pair[1] == "SEQEND":
                self._consume()
                return

    def _tr_circle(self):
        f = _Feat()
        st = dict(x=0.0, y=0.0, z=0.0, r=0.0, hz=False)
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("hz", True)),
            40: lambda v: st.__setitem__("r", _f(v)),
            39: lambda v: None})
        if not ok:
            return None
        pts = _approximate_arc(st["x"], st["y"], st["z"], st["r"],
                               st["r"], 0.0, 0.0, 360.0)
        f.geom = ("line", pts, st["hz"])
        f.geom = f.apply_ocs()
        self.prepare_line_style(f)
        return f

    def _tr_arc(self):
        f = _Feat()
        st = dict(x=0.0, y=0.0, z=0.0, r=0.0, a0=0.0, a1=360.0,
                  hz=False)
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("hz", True)),
            40: lambda v: st.__setitem__("r", _f(v)),
            # DXF angle codes are START=50 / END=51, but the
            # reference loads them negated AND swapped
            50: lambda v: st.__setitem__("a1", -_f(v)),
            51: lambda v: st.__setitem__("a0", -_f(v))})
        if not ok:
            return None
        a0, a1 = st["a0"], st["a1"]
        if a0 > a1:
            a1 += 360.0
        if abs(a1 - a0) > 361.0:
            return None
        pts = _approximate_arc(st["x"], st["y"], st["z"], st["r"],
                               st["r"], 0.0, a0, a1)
        f.geom = ("line", pts, st["hz"])
        f.geom = f.apply_ocs()
        self.prepare_line_style(f)
        return f

    def _tr_ellipse(self):
        f = _Feat()
        st = dict(x=0.0, y=0.0, z=0.0, ax=0.0, ay=0.0, az=0.0,
                  ratio=0.0, a0=0.0, a1=360.0, hz=False)
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("hz", True)),
            11: lambda v: st.__setitem__("ax", _f(v)),
            21: lambda v: st.__setitem__("ay", _f(v)),
            31: lambda v: st.__setitem__("az", _f(v)),
            40: lambda v: st.__setitem__("ratio", _f(v)),
            41: lambda v: st.__setitem__(
                "a1", -math.degrees(_f(v))),
            42: lambda v: st.__setitem__(
                "a0", -math.degrees(_f(v)))})
        if not ok:
            return None
        cx, cy, cz = st["x"], st["y"], st["z"]
        ax, ay, az = st["ax"], st["ay"], st["az"]
        apply_ocs = f.ocs is not None and f.ocs != (0.0, 0.0, 1.0)
        if apply_ocs:
            (cx, cy, cz), = _ocs_inverse([[cx, cy, cz]], f.ocs)
            (ax, ay, az), = _ocs_inverse([[ax, ay, az]], f.ocs)
        r1 = math.sqrt(ax * ax + ay * ay + az * az)
        r2 = st["ratio"] * r1
        rotation = -math.degrees(math.atan2(ay, ax))
        a0, a1 = st["a0"], st["a1"]
        if a0 > a1:
            a1 += 360.0
        if abs(a1 - a0) > 361.0:
            return None
        pts = _approximate_arc(cx, cy, cz, r1, r2, rotation, a0, a1)
        f.geom = ("line", pts, st["hz"])
        if apply_ocs:
            f.geom = f.apply_ocs()
        elif not st["hz"]:
            pass
        self.prepare_line_style(f)
        return f

    def _tr_solid(self):
        f = _Feat()
        st = {}
        for c in (10, 20, 30, 11, 21, 31, 12, 22, 32, 13, 23, 33):
            st[c] = 0.0
        handlers = {c: (lambda v, c=c: st.__setitem__(c, _f(v)))
                    for c in st}
        if not self._entity_loop(f, handlers):
            return None
        corners = [(st[10], st[20], st[30]), (st[11], st[21], st[31]),
                   (st[13], st[23], st[33]), (st[12], st[22], st[32])]
        ring = np.array(corners + [corners[0]], float)
        f.geom = ("polygon", [ring], bool(ring[:, 2].any()))
        f.geom = f.apply_ocs()
        self.prepare_line_style(f)
        return f

    def _tr_3dface(self):
        return self._tr_solid()

    def _text_common(self, f, st, mtext):
        x, y, z = st["x"], st["y"], st["z"]
        f.geom = ("point", np.array([[x, y, z]]), st["hz"])
        if not mtext:
            f.geom = f.apply_ocs()
        text = st["text"]
        if text.endswith("\n"):
            text = text[:-1]
        f.fields["Text"] = text
        esc = text.replace('"', '\\"')
        font = self.textstyles.get(st["stylename"], {}) \
            .get("Font", "Arial")
        style = f'LABEL(f:"{font}",t:"{esc}"'
        return style

    def _tr_mtext(self):
        f = _Feat()
        st = dict(x=0.0, y=0.0, z=0.0, hz=False, angle=0.0,
                  height=0.0, attach=-1, xdir=0.0, text="",
                  stylename="STANDARD")
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("hz", True)),
            40: lambda v: st.__setitem__("height", _f(v)),
            71: lambda v: st.__setitem__("attach", _i(v)),
            11: lambda v: st.__setitem__("xdir", _f(v)),
            21: lambda v: st.__setitem__(
                "angle", math.degrees(math.atan2(_f(v),
                                                 st["xdir"]))),
            1: lambda v: st.__setitem__(
                "text", st["text"] + _unescape(v, True)),
            3: lambda v: st.__setitem__(
                "text", st["text"] + _unescape(v, True)),
            50: lambda v: st.__setitem__("angle", _f(v)),
            7: lambda v: st.__setitem__("stylename", v)})
        if not ok:
            return None
        style = self._text_common(f, st, mtext=True)
        if st["angle"] != 0.0:
            style += ",a:%.3g" % st["angle"]
        if st["height"] != 0.0:
            style += ",s:%.3gg" % st["height"]
        if 0 <= st["attach"] <= 9:
            amap = [-1, 7, 8, 9, 4, 5, 6, 1, 2, 3]
            style += ",p:%d" % amap[st["attach"]]
        style += ",c:" + self.get_color(f) + ")"
        f.style = style
        return f

    def _tr_text(self):
        f = _Feat()
        st = dict(x=0.0, y=0.0, z=0.0, hz=False, angle=0.0,
                  height=0.0, width=1.0, alignx=0.0, aligny=0.0,
                  has_align=False, halign=0, valign=0, text="",
                  stylename="STANDARD")
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: (st.__setitem__("z", _f(v)),
                           st.__setitem__("hz", True)),
            11: lambda v: st.__setitem__("alignx", _f(v)),
            21: lambda v: (st.__setitem__("aligny", _f(v)),
                           st.__setitem__("has_align", True)),
            40: lambda v: st.__setitem__("height", _f(v)),
            41: lambda v: st.__setitem__("width", _f(v)),
            1: lambda v: st.__setitem__(
                "text", st["text"] + _unescape(v, False)),
            50: lambda v: st.__setitem__("angle", _f(v)),
            72: lambda v: st.__setitem__("halign", _i(v)),
            73: lambda v: st.__setitem__("valign", _i(v)),
            7: lambda v: st.__setitem__("stylename", v)})
        if not ok:
            return None
        anchor = 1
        if st["halign"] > 0 or st["valign"] > 0:
            anchor = {1: 10, 2: 4, 3: 7}.get(st["valign"],
                                             5 if st["halign"] == 4
                                             else 1)
            if st["halign"] < 3:
                anchor += st["halign"]
        style = self._text_common(f, st, mtext=False)
        style += ",p:%d" % anchor
        if st["angle"] != 0.0:
            style += ",a:%.3g" % st["angle"]
        if st["height"] != 0.0:
            style += ",s:%.3gg" % st["height"]
        if st["width"] != 1.0:
            style += ",w:%.4g" % (st["width"] * 100.0)
        if st["has_align"] and st["alignx"] != st["x"]:
            style += ",dx:%.6gg" % (st["alignx"] - st["x"])
        if st["has_align"] and st["aligny"] != st["y"]:
            style += ",dy:%.6gg" % (st["aligny"] - st["y"])
        style += ",c:" + self.get_color(f) + ")"
        f.style = style
        return f

    # ---------------- INSERT / blocks

    def _tr_insert(self, inline_blocks):
        f = _Feat()
        st = dict(x=0.0, y=0.0, z=0.0, xs=1.0, ys=1.0, zs=1.0,
                  angle=0.0, name="", cols=1, rows=1, colsp=0.0,
                  rowsp=0.0)
        ok = self._entity_loop(f, {
            10: lambda v: st.__setitem__("x", _f(v)),
            20: lambda v: st.__setitem__("y", _f(v)),
            30: lambda v: st.__setitem__("z", _f(v)),
            41: lambda v: st.__setitem__("xs", _f(v)),
            42: lambda v: st.__setitem__("ys", _f(v)),
            43: lambda v: st.__setitem__("zs", _f(v)),
            44: lambda v: st.__setitem__("colsp", _f(v)),
            45: lambda v: st.__setitem__("rowsp", _f(v)),
            50: lambda v: st.__setitem__(
                "angle", math.radians(_f(v))),
            66: lambda v: None,
            70: lambda v: st.__setitem__("cols", max(_i(v), 1)),
            71: lambda v: st.__setitem__("rows", max(_i(v), 1)),
            2: lambda v: st.__setitem__("name", v)})
        if not ok:
            return None
        if not inline_blocks:
            f.is_blockref = True
            f.blockname = st["name"]
            f.blockcoords = (st["x"], st["y"], st["z"])
            f.blockscale = (st["xs"], st["ys"], st["zs"])
            f.blockangle = math.degrees(st["angle"])
            f.geom = ("point",
                      np.array([[st["x"], st["y"], st["z"]]]), True)
            return f
        out = []
        for row in range(st["rows"]):
            for col in range(st["cols"]):
                dx = (col * st["colsp"] * math.cos(st["angle"]) +
                      row * st["rowsp"] * -math.sin(st["angle"]))
                dy = (col * st["colsp"] * math.sin(st["angle"]) +
                      row * st["rowsp"] * math.cos(st["angle"]))
                merged = self._insert_inline(
                    st["name"], f.clone(),
                    (st["x"] + dx, st["y"] + dy, st["z"]),
                    (st["xs"], st["ys"], st["zs"]), st["angle"],
                    merge=True, extras=out)
                if merged is not None:
                    out.insert(0, merged)
        if out:
            first = out.pop(0)
            self._pending.extend(out)
            return first
        return None

    def _insert_inline(self, name, template, offset, scale, angle,
                       merge, extras, depth=0):
        """InsertBlockInline parity; returns the merged feature or
        None (with label/text features appended to `extras`)."""
        if depth > 16 or name not in self.blocks:
            if name not in self.blocks:
                raise KeyError(name)
            return None
        # insertion point OCS → world
        ins = np.array([offset], float)
        if template.ocs is not None and \
                template.ocs != (0.0, 0.0, 1.0):
            ins = _ocs_transform(ins, template.ocs)
        dx, dy, dz = ins[0]
        merged = []
        for sub in self.blocks[name]:
            sf = sub.clone()
            if template.fields["PaperSpace"]:
                sf.fields["PaperSpace"] = 1
            if sf.is_blockref:
                inner_extras = []
                try:
                    inner = self._insert_inline(
                        sf.blockname, sf, sf.blockcoords,
                        sf.blockscale,
                        math.radians(sf.blockangle),
                        merge, inner_extras, depth + 1)
                except KeyError:
                    continue
                subs = ([inner] if inner is not None else []) \
                    + inner_extras
            else:
                subs = [sf]
            for s in subs:
                if s.geom is not None:
                    s.geom = _transform_geom(
                        s.geom,
                        lambda c: _insert_transform(
                            c, scale[0], scale[1], scale[2],
                            angle, 0.0, 0.0, 0.0))
                    s.geom = template.apply_ocs(s.geom)
                    s.geom = _transform_geom(
                        s.geom,
                        lambda c: np.asarray(c, float) +
                        np.array([dx, dy, dz]))
                is_label = s.style is not None and "LABEL" in s.style
                if merge and not is_label and s.geom is not None \
                        and not s.is_blockref:
                    merged.append(s.geom)
                else:
                    if s.fields["Layer"] == "0" and \
                            template.fields["Layer"]:
                        s.fields["Layer"] = template.fields["Layer"]
                    if template.fields["EntityHandle"]:
                        s.fields["EntityHandle"] = \
                            template.fields["EntityHandle"]
                    extras.append(s)
        if merge and merged:
            template.geom = _simplify_collection(merged)
            self.prepare_line_style(template)
            return template
        return None

    # ---------------- DIMENSION fallback

    def _tr_dimension(self, inline_blocks):
        f = _Feat()
        st = dict(ax1=0.0, ay1=0.0, tx1=0.0, ty1=0.0, tx2=0.0,
                  ty2=0.0, textx=0.0, texty=0.0, text=None,
                  block=None)
        props = dict(_DIM_DEFAULTS)

        def dimstyle(v):
            if v in self.dimstyles:
                props.update(self.dimstyles[v])

        ok = self._entity_loop(f, {
            2: lambda v: st.__setitem__("block", v),
            3: dimstyle,
            10: lambda v: st.__setitem__("ax1", _f(v)),
            20: lambda v: st.__setitem__("ay1", _f(v)),
            11: lambda v: st.__setitem__("textx", _f(v)),
            21: lambda v: st.__setitem__("texty", _f(v)),
            13: lambda v: st.__setitem__("tx2", _f(v)),
            23: lambda v: st.__setitem__("ty2", _f(v)),
            14: lambda v: st.__setitem__("tx1", _f(v)),
            24: lambda v: st.__setitem__("ty1", _f(v)),
            1: lambda v: st.__setitem__("text", v),
            70: lambda v: None, 30: lambda v: None,
            31: lambda v: None, 33: lambda v: None,
            34: lambda v: None})
        if not ok:
            return None
        if st["block"] and inline_blocks:
            try:
                extras = []
                merged = self._insert_inline(
                    st["block"], f, (0, 0, 0), (1, 1, 1), 0.0,
                    merge=True, extras=extras)
                self._pending.extend(extras)
                return merged
            except KeyError:
                pass
        scale = _f(props["DIMSCALE"])
        asz = _f(props["DIMASZ"])
        exe = _f(props["DIMEXE"])
        exo = _f(props["DIMEXO"])
        se1 = _i(props["DIMSE1"]) == 0
        se2 = _i(props["DIMSE2"]) == 0
        txt_h = _f(props["DIMTXT"])
        ndec = _i(props["DIMDEC"])
        centered = _i(props["DIMTAD"]) == 0
        ax1, ay1 = st["ax1"], st["ay1"]
        tx1, ty1 = st["tx1"], st["ty1"]
        tx2, ty2 = st["tx2"], st["ty2"]
        v1x, v1y = ax1 - tx1, ay1 - ty1
        v1l = math.hypot(v1x, v1y)
        if v1l > 0:
            v1x, v1y = v1x / v1l, v1y / v1l
        v2x, v2y = v1y, -v1x
        if v1x == 0.0 and v1y == 0.0:
            ax2, ay2 = tx2, ty2
        elif v1x == 0.0:
            ax2, ay2 = tx2, ay1
        elif v1y == 0.0:
            ax2, ay2 = ax1, ty2
        else:
            l1m = v1y / v1x
            l1b = ty2 - l1m * tx2
            l2m = v2y / v2x
            l2b = ay1 - l2m * ax1
            ax2 = (l2b - l1b) / (l1m - l2m)
            ay2 = l2m * ax2 + l2b
        lines = [np.array([[ax1, ay1, 0.0], [ax2, ay2, 0.0]])]
        arrows = []
        main = lines[0]
        for rev in (False, True):
            p1 = main[-1 if rev else 0, :2]
            p2 = main[-2 if rev else 1, :2]
            seg = math.hypot(p2[0] - p1[0], p2[1] - p1[1])
            sz = asz * scale
            if sz == 0.0 or seg == 0.0 or sz > 0.5 * seg:
                continue
            k = sz / seg
            par = (k * (p2[0] - p1[0]), k * (p2[1] - p1[1]))
            perp = (par[1], -par[0])
            ring = np.array([
                [p1[0] + par[0] + perp[0] / 6,
                 p1[1] + par[1] + perp[1] / 6, 0.0],
                [p1[0], p1[1], 0.0],
                [p1[0] + par[0] - perp[0] / 6,
                 p1[1] + par[1] - perp[1] / 6, 0.0]])
            ring = np.vstack([ring, ring[0]])
            arrows.append(ring)
        ext1 = np.array([[tx1 + v1x * exo, ty1 + v1y * exo, 0.0],
                         [ax1 + v1x * exe, ay1 + v1y * exe, 0.0]])
        if se1 and np.hypot(*(ext1[1, :2] - ext1[0, :2])) > 0:
            lines.append(ext1)
        ext2 = np.array([[tx2 + v1x * exo, ty2 + v1y * exo, 0.0],
                         [ax2 + v1x * exe, ay2 + v1y * exe, 0.0]])
        if se2 and np.hypot(*(ext2[1, :2] - ext2[0, :2])) > 0:
            lines.append(ext2)
        f.geom = ("multiline",
                  [("line", ln, False) for ln in lines], False)
        self.prepare_line_style(f)
        for ring in arrows:
            af = f.clone()
            af.geom = ("polygon", [ring], True)
            af.style = "BRUSH(fc:" + self.get_color(af) + ")"
            self._pending.append(af)
        if st["text"] == " ":
            return f
        label = f.clone()
        label.geom = ("point",
                      np.array([[st["textx"], st["texty"], 0.0]]),
                      False)
        text = st["text"] if st["text"] else "<>"
        if "<>" in text:
            dist = math.hypot(ax2 - ax1, ay2 - ay1)
            ndec = min(max(ndec, 0), 20)
            text = text.replace("<>", "%.*f" % (ndec, dist))
        text = _unescape(text, True)
        label.fields["Text"] = text
        style = 'LABEL(f:"Arial",t:"%s"' % text.replace('"', '\\"')
        style += ",p:11" if centered else ",p:5"
        tangle = (-90.0 if ax1 == ax2 else
                  math.degrees(math.atan((ay1 - ay2) / (ax1 - ax2))))
        if tangle != 0.0:
            style += ",a:%.3g" % tangle
        if txt_h != 0.0:
            style += ",s:%.3gg" % (txt_h * scale)
        label.props["Color"] = props["DIMCLRT"]
        style += ",c:" + self.get_color(label, f) + ")"
        label.style = style
        self._pending.append(label)
        return f


def _simplify_collection(geoms):
    """SimplifyBlockGeometry parity over (kind, payload, z) parts."""
    if len(geoms) == 1:
        return geoms[0]
    kinds = {g[0] for g in geoms}
    has_z = any(g[2] for g in geoms)
    if kinds == {"point"}:
        return ("multipoint", geoms, has_z)
    if kinds == {"line"}:
        return ("multiline", geoms, has_z)
    if kinds == {"polygon"}:
        return ("multipolygon", geoms, has_z)
    return ("collection", geoms, has_z)


def _unescape(s, mtext):
    """ACTextUnescape parity (ogr_autocad_services.cpp:20-206):
    ^-codes and %% escapes always; a second MTEXT pass strips
    formatting directives and resolves \\P, \\~, \\U+xxxx,
    stacked-fraction \\S..; blocks."""
    out = []
    i = 0
    low = s.lower()
    while i < len(s):
        ch = s[i]
        if ch == "^" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append("^" if nxt == " " else chr(ord(nxt.upper()) ^ 0x40))
            i += 2
            continue
        if low.startswith(("%%c", "%%d", "%%p"), i):
            out.append({"c": "\u2300", "d": "\u00b0",
                        "p": "\u00b1"}[low[i + 2]])
            i += 3
            continue
        if not mtext and low.startswith(("%%u", "%%o", "%%k"), i):
            i += 3
            continue
        out.append(ch)
        i += 1
    res = "".join(out)
    if not mtext:
        return res
    out = []
    s = res
    i = 0
    while i < len(s):
        ch = s[i]
        nxt = s[i + 1] if i + 1 < len(s) else ""
        if ch == "\\" and nxt == "P":
            out.append("\n")
            i += 2
        elif ch == "\\" and nxt == "~":
            out.append(" ")
            i += 2
        elif ch == "\\" and nxt == "U" and s[i + 2:i + 3] == "+" \
                and len(s) - i >= 7:
            try:
                out.append(chr(int(s[i + 3:i + 7], 16)))
            except ValueError:
                pass
            i += 7
        elif ch in "{}":
            i += 1
        elif ch == "\\" and nxt and nxt in "WTAHFfCcQp":
            j = s.find(";", i)
            if j < 0:
                break
            i = j + 1
        elif ch == "\\" and nxt and nxt in "KkLlOo":
            i += 2
        elif ch == "\\" and nxt == "S":
            i += 2
            while i < len(s) and s[i] != ";":
                if s[i] == "\\" and i + 1 < len(s) and \
                        s[i + 1] in "^/#~":
                    out.append(s[i + 1])
                    i += 2
                    if i >= len(s):
                        break
                    continue
                if s[i] not in "^/#~":
                    out.append(s[i])
                i += 1
            if i < len(s) and s[i] == ";":
                i += 1
            if i >= len(s):
                break
        elif ch == "\\" and nxt and nxt in "\\{}":
            out.append(nxt)
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# ------------------------------------------------------ WKB + table

def _wkb(geom):
    import struct as _s
    kind, payload, has_z = geom

    def coords_blob(c):
        c = np.asarray(c, float)
        cols = 3 if has_z else 2
        return (_s.pack("<I", len(c)) +
                np.ascontiguousarray(c[:, :cols]).tobytes())

    base = {"point": 1, "line": 2, "polygon": 3, "multipoint": 4,
            "multiline": 5, "multipolygon": 6, "collection": 7}[kind]
    code = base + (0x80000000 if has_z else 0)
    hdr = b"\x01" + _s.pack("<I", code)
    if kind == "point":
        c = np.asarray(payload, float)[0]
        n = 3 if has_z else 2
        return hdr + _s.pack("<%dd" % n, *c[:n])
    if kind == "line":
        return hdr + coords_blob(payload)
    if kind == "polygon":
        body = _s.pack("<I", len(payload))
        for r in payload:
            body += coords_blob(r)
        return hdr + body
    body = _s.pack("<I", len(payload))
    for part in payload:
        body += _wkb((part[0], part[1], has_z))
    return hdr + body


def read_dxf(path):
    """DXF → pyarrow Table (fid, wkb, Layer, SubClasses, Linetype,
    EntityHandle, Text, PaperSpace, style)."""
    dxf = _DXF(path)
    feats = dxf.features
    cols = {
        "fid": pa.array(range(len(feats)), pa.int64()),
        "wkb": pa.array([_wkb(f.geom) if f.geom is not None else None
                         for f in feats], pa.binary()),
        "layer": pa.array([f.fields["Layer"] for f in feats],
                          pa.string()),
        "subclasses": pa.array([f.fields["SubClasses"]
                                for f in feats], pa.string()),
        "linetype": pa.array(
            [f.fields["Linetype"] if f.fields["Linetype"]
             is not None else "" for f in feats], pa.string()),
        "entityhandle": pa.array([f.fields["EntityHandle"]
                                  for f in feats], pa.string()),
        "text": pa.array([f.fields["Text"] for f in feats],
                         pa.string()),
        "paperspace": pa.array([f.fields["PaperSpace"]
                                for f in feats], pa.int64()),
        "style": pa.array([f.style for f in feats], pa.string()),
    }
    return pa.table(cols)


def read_dxf_features(path):
    """DXF → list of parsed features (testing/inspection API)."""
    return _DXF(path).features
