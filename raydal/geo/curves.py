"""Curve geometries: CircularString / CompoundCurve / CurvePolygon /
MultiCurve / MultiSurface / PolyhedralSurface / TIN / Triangle.

From-scratch WKB/WKT codec (ISO codes 8-17 + Z/M/ZM variants,
``ogr/ogr_core.h:422-499``) and GDAL-parity arc machinery:

* ``get_curve_parameters`` — circle through 3 points with the reference's
  scale normalization, 1e-8 colinearity threshold, CCW-for-full-circle
  convention and winding-ordered angles
  (``OGRGeometryFactory::GetCurveParameters``,
  ``ogr/ogrgeometryfactory.cpp:5176``).
* ``curve_to_linestring`` — 3-point arc stroking with the symmetric
  start/end ordering swap, default 4-degree step (``OGR_ARC_STEPSIZE``),
  0.01-degree clamp, and the stealth step-count constraints (>= 1+6
  steps, odd parity) of ``curveToLineString``
  (``ogr/ogrgeometryfactory.cpp:5439``); the hidden-LSB alpha encoding
  is intentionally NOT applied — it perturbs only the last mantissa
  byte (~1e-16 relative) and exists solely so GDAL can reverse the
  stroking, which this engine does not do.
* ``linearize`` — ``GetLinearGeometry`` semantics: curves stroke to
  LineString/Polygon equivalents, linear members pass through.
* exact (non-stroked) ``curve_length`` / ``curve_envelope`` /
  ``curve_area`` / ``curve_value`` / ``segmentize`` mirroring
  ``ogr/ogrcircularstring.cpp`` (get_Length:205, IsFullCircle:755,
  get_AreaOfCurveSegments:808, get_Area:846,
  ExtendEnvelopeWithCircular:240, Value:549, segmentize:330) and
  ``ogr/ogrcurve.cpp:311`` (IsConvex).

Tree representation: a node is ``(base, payload, dims)`` where ``base``
is the 2-D WKB code (1-17), ``dims`` one of ``"" / "Z" / "M" / "ZM"``,
and ``payload`` is a coords array ``(N, 2+len(dims))`` for
point/linestring/circularstring, a list of rings (bare coord arrays)
for polygon/triangle, or a list of child nodes for everything else
(compoundcurve members, curvepolygon rings, multi*/collection parts,
polyhedralsurface/TIN patches).
"""

from __future__ import annotations

import math
import re
import struct

import numpy as np

__all__ = [
    "CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON", "MULTICURVE",
    "MULTISURFACE", "POLYHEDRALSURFACE", "TIN", "TRIANGLE",
    "CURVE_BASES", "is_curve_code",
    "parse_wkb_curve", "write_wkb_curve",
    "parse_wkt_curve", "format_wkt_curve",
    "get_curve_parameters", "curve_to_linestring", "linearize",
    "to_engine_wkb", "curve_length", "curve_envelope", "curve_area",
    "curve_value", "segmentize_circularstring",
]

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION = 4, 5, 6, 7
CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON = 8, 9, 10
MULTICURVE, MULTISURFACE = 11, 12
POLYHEDRALSURFACE, TIN, TRIANGLE = 15, 16, 17

# bases whose payload may contain circular arcs
CURVE_BASES = frozenset({CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON,
                         MULTICURVE, MULTISURFACE})
# bases beyond the engine's 7 linear types
EXTENDED_BASES = frozenset({CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON,
                            MULTICURVE, MULTISURFACE, POLYHEDRALSURFACE,
                            TIN, TRIANGLE})

_COORD_NODES = frozenset({POINT, LINESTRING, CIRCULARSTRING})
_RING_NODES = frozenset({POLYGON, TRIANGLE})

DEFAULT_ARC_STEP_DEG = 4.0   # OGR_ARC_STEPSIZE default


def is_curve_code(base):
    return base in EXTENDED_BASES


def _width(dims):
    return 2 + len(dims)


def _dims_from_code(code):
    """ISO WKB code → (base, dims). Accepts the PostGIS 0x80000000 Z /
    0x40000000 M bit variants for the extended types too."""
    dims = ""
    if code & 0x40000000:
        code &= ~0x40000000
        dims = "M"
    if code & 0x80000000:
        code &= 0xFF
        dims = "Z" + dims
    if code >= 3000:
        base, dims = code - 3000, "ZM"
    elif code >= 2000:
        base, dims = code - 2000, "M"
    elif code >= 1000:
        base, dims = code - 1000, "Z" if dims == "" else dims
    else:
        base = code
    if not (1 <= base <= 12 or 15 <= base <= 17):
        raise ValueError(f"unsupported WKB geometry code {code}")
    return base, dims


def _code_from(base, dims):
    return base + {"": 0, "Z": 1000, "M": 2000, "ZM": 3000}[dims]


# ---------------------------------------------------------------------------
# WKB

def _rd_u32(buf, off, little):
    return struct.unpack_from("<I" if little else ">I", buf, off)[0], off + 4


def _rd_coords(buf, off, n, w, little):
    dt = "<f8" if little else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=n * w, offset=off)
    return arr.reshape(n, w).astype(np.float64, copy=False), off + 8 * n * w


def _parse_node(buf, off):
    b = buf[off]
    if b in (0x30, 0x31):       # DB2 ASCII byte-order variant
        b -= 0x30
    if b not in (0, 1):
        raise ValueError(f"invalid WKB byte-order marker {b}")
    little = b == 1
    off += 1
    code, off = _rd_u32(buf, off, little)
    base, dims = _dims_from_code(code)
    w = _width(dims)
    if base == POINT:
        c, off = _rd_coords(buf, off, 1, w, little)
        return (POINT, c, dims), off
    if base in (LINESTRING, CIRCULARSTRING):
        n, off = _rd_u32(buf, off, little)
        c, off = _rd_coords(buf, off, n, w, little)
        return (base, c, dims), off
    if base in (POLYGON, TRIANGLE):
        nr, off = _rd_u32(buf, off, little)
        rings = []
        for _ in range(nr):
            n, off = _rd_u32(buf, off, little)
            c, off = _rd_coords(buf, off, n, w, little)
            rings.append(c)
        return (base, rings, dims), off
    # every other container holds full WKB children
    ng, off = _rd_u32(buf, off, little)
    parts = []
    for _ in range(ng):
        g, off = _parse_node(buf, off)
        parts.append(g)
    return (base, parts, dims), off


def parse_wkb_curve(buf):
    """Full-dimension WKB parse of all 17 geometry types → node tree."""
    g, _ = _parse_node(bytes(buf), 0)
    return g


def _wr_coords(c, w):
    c = np.ascontiguousarray(np.asarray(c, dtype="<f8")[:, :w])
    return struct.pack("<I", len(c)) + c.tobytes()


def _write_node(node):
    base, payload, dims = node
    w = _width(dims)
    hdr = struct.pack("<BI", 1, _code_from(base, dims))
    if base == POINT:
        c = np.asarray(payload, dtype="<f8").reshape(-1)[:w]
        return hdr + c.tobytes()
    if base in (LINESTRING, CIRCULARSTRING):
        return hdr + _wr_coords(payload, w)
    if base in (POLYGON, TRIANGLE):
        return (hdr + struct.pack("<I", len(payload)) +
                b"".join(_wr_coords(r, w) for r in payload))
    return (hdr + struct.pack("<I", len(payload)) +
            b"".join(_write_node(g) for g in payload))


def write_wkb_curve(node):
    """Node tree → little-endian ISO WKB."""
    return _write_node(node)


# ---------------------------------------------------------------------------
# WKT

_WKT_NAMES = {
    POINT: "POINT", LINESTRING: "LINESTRING", POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT", MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON", GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
    CIRCULARSTRING: "CIRCULARSTRING", COMPOUNDCURVE: "COMPOUNDCURVE",
    CURVEPOLYGON: "CURVEPOLYGON", MULTICURVE: "MULTICURVE",
    MULTISURFACE: "MULTISURFACE", POLYHEDRALSURFACE: "POLYHEDRALSURFACE",
    TIN: "TIN", TRIANGLE: "TRIANGLE",
}
_WKT_CODES = {v: k for k, v in _WKT_NAMES.items()}
_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


class _Scan:
    def __init__(self, text):
        self.t = text
        self.i = 0

    def peek(self):
        while self.i < len(self.t) and self.t[self.i].isspace():
            self.i += 1
        return self.t[self.i] if self.i < len(self.t) else ""

    def expect(self, ch):
        if self.peek() != ch:
            raise ValueError(
                f"WKT parse error at {self.i}: expected {ch!r} in "
                f"{self.t[self.i:self.i + 24]!r}")
        self.i += 1

    def word(self):
        self.peek()
        m = re.match(r"[A-Za-z]+", self.t[self.i:])
        if not m:
            return ""
        self.i += len(m.group(0))
        return m.group(0).upper()

    def number(self):
        self.peek()
        m = _NUM.match(self.t, self.i)
        if not m:
            raise ValueError(f"WKT parse error at {self.i}: expected number")
        self.i = m.end()
        return float(m.group(0))


def _scan_coords(sc, w):
    """Scan a parenthesized coordinate list.  ``w`` is the declared
    width (from a Z/M suffix); extra ordinates beyond it widen the
    result (GDAL infers Z from a third ordinate when no suffix is
    given), missing ones pad with 0."""
    sc.expect("(")
    pts = []
    wmax = w
    while True:
        pt = [sc.number()]
        while sc.peek() not in (",", ")", ""):
            pt.append(sc.number())
        wmax = min(4, max(wmax, len(pt)))
        pts.append(pt)
        if sc.peek() == ",":
            sc.i += 1
            continue
        break
    sc.expect(")")
    return np.asarray([p[:wmax] + [0.0] * (wmax - len(p)) for p in pts],
                      dtype=np.float64)


def _infer_dims(dims, arrs):
    """Widen a declared dims suffix when the scanned coordinates carry
    more ordinates (bare-3-ordinate → Z, bare-4 → ZM, per
    ``OGRGeometry::importFromWkt``)."""
    wmax = max((a.shape[1] for a in arrs if len(a)), default=_width(dims))
    if wmax <= _width(dims):
        return dims
    return {3: "Z" if "M" not in dims else dims, 4: "ZM"}.get(wmax, dims)


def _pad_to(arr, w):
    arr = np.asarray(arr, dtype=np.float64)
    if arr.shape[1] == w:
        return arr
    if arr.shape[1] > w:
        return arr[:, :w]
    out = np.zeros((len(arr), w))
    out[:, :arr.shape[1]] = arr
    return out


def _scan_dims(sc):
    save = sc.i
    word = sc.word()
    if word in ("Z", "M", "ZM"):
        return word
    sc.i = save
    return ""


def _scan_node(sc, inherit_dims="", bare_base=LINESTRING):
    """Parse one WKT geometry.  Inside curve containers a bare
    ``(x y,...)`` list is an implicit LINESTRING member
    (COMPOUNDCURVE / CURVEPOLYGON / MULTICURVE shorthand); inside
    MULTISURFACE a bare ``((x y,...))`` is an implicit POLYGON."""
    if sc.peek() == "(":
        w = _width(inherit_dims)
        if bare_base in (POLYGON, TRIANGLE):
            sc.expect("(")
            rings = [_scan_coords(sc, w)]
            while sc.peek() == ",":
                sc.i += 1
                rings.append(_scan_coords(sc, w))
            sc.expect(")")
            return (bare_base, rings, inherit_dims)
        return (LINESTRING, _scan_coords(sc, w), inherit_dims)
    name = sc.word()
    if name not in _WKT_CODES:
        raise ValueError(f"unsupported WKT type {name!r}")
    base = _WKT_CODES[name]
    dims = _scan_dims(sc)
    w = _width(dims)
    save = sc.i
    if sc.word() == "EMPTY":
        empty = (np.empty((0, w)) if base in _COORD_NODES
                 else [])
        return (base, empty, dims)
    sc.i = save
    if base == POINT:
        c = _scan_coords(sc, w)
        return (base, c[:1], dims)
    if base in (LINESTRING, CIRCULARSTRING):
        return (base, _scan_coords(sc, w), dims)
    if base in (POLYGON, TRIANGLE):
        sc.expect("(")
        rings = [_scan_coords(sc, w)]
        while sc.peek() == ",":
            sc.i += 1
            rings.append(_scan_coords(sc, w))
        sc.expect(")")
        return (base, rings, dims)
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        # parse members as bare lists or sub-WKT through the generic path
        sc.expect("(")
        parts = []
        member = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
                  MULTIPOLYGON: POLYGON}[base]
        while True:
            if member == POINT and sc.peek() != "(":
                pt = [sc.number()]
                while sc.peek() not in (",", ")", ""):
                    pt.append(sc.number())
                if len(pt) < w:
                    pt += [0.0] * (w - len(pt))
                parts.append((POINT, np.asarray([pt[:w]]), dims))
            elif member == POLYGON:
                sc.expect("(")
                rings = [_scan_coords(sc, w)]
                while sc.peek() == ",":
                    sc.i += 1
                    rings.append(_scan_coords(sc, w))
                sc.expect(")")
                parts.append((POLYGON, rings, dims))
            else:
                c = _scan_coords(sc, w)
                parts.append((member, c if member != POINT else c[:1], dims))
            if sc.peek() == ",":
                sc.i += 1
                continue
            break
        sc.expect(")")
        return (base, parts, dims)
    # containers of full sub-geometries
    bare = {MULTISURFACE: POLYGON, POLYHEDRALSURFACE: POLYGON,
            TIN: TRIANGLE}.get(base, LINESTRING)
    sc.expect("(")
    parts = [_scan_node(sc, dims, bare)]
    while sc.peek() == ",":
        sc.i += 1
        parts.append(_scan_node(sc, dims, bare))
    sc.expect(")")
    return (base, parts, dims)


def _union_dims(a, b):
    z = "Z" if ("Z" in a or "Z" in b) else ""
    m = "M" if ("M" in a or "M" in b) else ""
    return z + m


def _normalize(node):
    """Post-parse pass: infer widened dims from bare extra ordinates,
    promote containers to the union of member dims, pad arrays."""
    base, payload, dims = node
    if base in _COORD_NODES:
        arr = np.asarray(payload, dtype=np.float64).reshape(-1, max(
            2, np.asarray(payload).shape[-1] if len(payload) else 2))
        dims = _infer_dims(dims, [arr])
        return (base, _pad_to(arr, _width(dims)), dims)
    if base in _RING_NODES:
        rings = [np.asarray(r, dtype=np.float64) for r in payload]
        dims = _infer_dims(dims, rings)
        return (base, [_pad_to(r, _width(dims)) for r in rings], dims)
    parts = [_normalize(g) for g in payload]
    for g in parts:
        dims = _union_dims(dims, g[2])

    def _promote(g):
        b, p, d = g
        if d == dims:
            return g
        if b in _COORD_NODES:
            return (b, _pad_to(p, _width(dims)), dims)
        if b in _RING_NODES:
            return (b, [_pad_to(r, _width(dims)) for r in p], dims)
        return (b, [_promote(c) for c in p], dims)

    return (base, [_promote(g) for g in parts], dims)


def parse_wkt_curve(text):
    return _normalize(_scan_node(_Scan(text)))


def _fmt_num(v, precision=15):
    if v != v:
        return "nan"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    if precision >= 17:
        return repr(v)
    s = f"{v:.{precision}f}" if abs(v) < 1 else f"{v:.{precision}G}"
    if "." in s and "E" not in s:
        s = s.rstrip("0").rstrip(".")
    return s


def _fmt_coords(c, precision):
    return ",".join(" ".join(_fmt_num(v, precision) for v in row)
                    for row in np.asarray(c))


def _fmt_node(node, precision, bare=0):
    base, payload, dims = node
    sfx = f" {dims} " if dims else " "
    name = _WKT_NAMES[base]
    if base == bare:   # bare members print bare even with Z ordinates
        # (see COMPOUNDCURVE Z golden: member "(2 0 30,0 0 10)")
        if base == LINESTRING:
            return f"({_fmt_coords(payload, precision)})"
        if base in (POLYGON, TRIANGLE):
            return ("(" + ",".join(f"({_fmt_coords(r, precision)})"
                                   for r in payload) + ")")
    if base in _COORD_NODES:
        if len(payload) == 0:
            return f"{name}{sfx.rstrip()} EMPTY" if dims else f"{name} EMPTY"
        return f"{name}{sfx}({_fmt_coords(payload, precision)})"
    if base in _RING_NODES:
        if not payload:
            return f"{name}{sfx.rstrip()} EMPTY" if dims else f"{name} EMPTY"
        body = ",".join(f"({_fmt_coords(r, precision)})" for r in payload)
        return f"{name}{sfx}({body})"
    if not payload:
        return f"{name}{sfx.rstrip()} EMPTY" if dims else f"{name} EMPTY"
    member_bare = {COMPOUNDCURVE: LINESTRING, CURVEPOLYGON: LINESTRING,
                   MULTICURVE: LINESTRING, MULTISURFACE: POLYGON,
                   POLYHEDRALSURFACE: POLYGON, TIN: TRIANGLE}.get(base, 0)
    body = ",".join(_fmt_node(g, precision, bare=member_bare)
                    for g in payload)
    return f"{name}{sfx}({body})"


def format_wkt_curve(node, precision=15):
    """ISO WKT (reference ``exportToWkt`` layout: LINESTRING members of
    COMPOUNDCURVE / CURVEPOLYGON print as bare coordinate lists)."""
    return _fmt_node(node, precision)


# ---------------------------------------------------------------------------
# arc parameters + stroking

def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """Circle through three points → (ok, R, cx, cy, alpha0, alpha1,
    alpha2); reference ``GetCurveParameters`` semantics incl. the CCW
    full-circle convention and the 1e-8 normalized-determinant
    colinearity threshold."""
    if any(map(math.isnan, (x0, y0, x1, y1, x2, y2))):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    if x0 == x2 and y0 == y2:
        if x0 != x1 or y0 != y1:
            cx = (x0 + x1) / 2
            cy = (y0 + y1) / 2
            R = math.hypot(x0 - cx, y0 - cy)
            alpha0 = math.atan2(y0 - cy, x0 - cx)
            return True, R, cx, cy, alpha0, alpha0 + math.pi, \
                alpha0 + 2 * math.pi
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    dx01, dy01 = x1 - x0, y1 - y0
    dx12, dy12 = x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1.0e-8 or math.isnan(det):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    x01m, x12m = (x0 + x1) * inv, (x1 + x2) * inv
    y01m, y12m = (y0 + y1) * inv, (y1 + y2) * inv
    c01 = dx01 * x01m + dy01 * y01m
    c12 = dx12 * x12m + dy12 * y12m
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    alpha0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    alpha1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    alpha2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    R = math.hypot(x0 - cx, y0 - cy)
    if det < 0:
        if alpha1 > alpha0:
            alpha1 -= 2 * math.pi
        if alpha2 > alpha1:
            alpha2 -= 2 * math.pi
    else:
        if alpha1 < alpha0:
            alpha1 += 2 * math.pi
        if alpha2 < alpha1:
            alpha2 += 2 * math.pi
    return True, R, cx, cy, alpha0, alpha1, alpha2


def _stroke_arc(pts, cx, cy, R, z0, z1, has_z, alpha0, alpha1, step,
                stealth):
    """Reference ``OGRGeometryFactoryStrokeArc``: constant angle step,
    stealth forces >= 1+6 steps with odd parity, plain mode >= 4."""
    sign = 1 if step > 0 else -1
    nsteps = int(abs((alpha1 - alpha0) / step) + 0.5)
    if stealth:
        if nsteps < 1 + 6:
            nsteps = 1 + 6
        else:
            nsteps = 1 + 6 + 2 * ((nsteps - (1 + 6) + 1) // 2)
    elif nsteps < 4:
        nsteps = 4
    step = sign * abs((alpha1 - alpha0) / nsteps)
    alpha = alpha0 + step
    while (alpha - alpha1) * sign < -1e-8:
        x = cx + R * math.cos(alpha)
        y = cy + R * math.sin(alpha)
        if has_z:
            z = z0 + (z1 - z0) * (alpha - alpha0) / (alpha1 - alpha0)
            pts.append((x, y, z))
        else:
            pts.append((x, y))
        alpha += step


def curve_to_linestring(p0, p1, p2, max_step_deg=0.0, add_intermediate=None):
    """Stroke one 3-point arc → list of coordinate tuples, reference
    ``curveToLineString`` parity (ordering swap for binary symmetry,
    stealth step counts; hidden-LSB encoding omitted — see module doc).

    ``add_intermediate=None`` is the STEALTH default (intermediate point
    not explicitly emitted, stealth step counts); True/False map to
    ADD_INTERMEDIATE_POINT=YES/NO."""
    has_z = len(p0) > 2
    x0, y0 = p0[0], p0[1]
    x2, y2 = p2[0], p2[1]
    if x0 < x2 or (x0 == x2 and y0 < y2):
        out = curve_to_linestring(p2, p1, p0, max_step_deg, add_intermediate)
        return out[::-1]
    z0 = p0[2] if has_z else 0.0
    z1 = p1[2] if has_z else 0.0
    z2 = p2[2] if has_z else 0.0
    ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(
        x0, y0, p1[0], p1[1], x2, y2)
    if not ok:
        R = cx = cy = a0 = a1 = a2 = 0.0
    sign = 1 if a1 >= a0 else -1
    if max_step_deg < 1e-6:
        max_step_deg = DEFAULT_ARC_STEP_DEG
    step = max_step_deg / 180.0 * math.pi
    step = max(step, 0.01 / 180.0 * math.pi)
    step *= sign
    pts = [tuple(p0[:3]) if has_z else (x0, y0)]
    stealth = add_intermediate is None
    if not ok or add_intermediate is True:
        _stroke_arc(pts, cx, cy, R, z0, z1, has_z, a0, a1, step, False)
        pts.append(tuple(p1[:3]) if has_z else (p1[0], p1[1]))
        _stroke_arc(pts, cx, cy, R, z1, z2, has_z, a1, a2, step, False)
    else:
        _stroke_arc(pts, cx, cy, R, z0, z2, has_z, a0, a2, step, stealth)
    pts.append(tuple(p2[:3]) if has_z else (x2, y2))
    return pts


def _xyz(coords, dims):
    """(N, w) coords → (N, 2 or 3) slice keeping x, y and (when present)
    z — the M ordinate never participates in geometry math."""
    coords = np.asarray(coords, dtype=np.float64)
    if "Z" in dims:
        return coords[:, :3]
    return coords[:, :2]


def _circularstring_to_points(coords, dims, max_step_deg):
    """CircularString coords → stroked point list (x,y[,z])."""
    c = _xyz(coords, dims)
    n = len(c)
    if n == 0:
        return []
    out = [tuple(c[0])]
    for i in range(0, n - 2, 2):
        seg = curve_to_linestring(c[i], c[i + 1], c[i + 2], max_step_deg)
        out.extend(seg[1:])
    return out


def _curve_member_points(node, max_step_deg):
    base, payload, dims = node
    if base == LINESTRING:
        return [tuple(p) for p in _xyz(payload, dims)]
    if base == CIRCULARSTRING:
        return _circularstring_to_points(payload, dims, max_step_deg)
    if base == COMPOUNDCURVE:
        pts = []
        for g in payload:
            seg = _curve_member_points(g, max_step_deg)
            if pts and seg and pts[-1] == seg[0]:
                seg = seg[1:]
            pts.extend(seg)
        return pts
    raise ValueError(f"not a curve member: {_WKT_NAMES.get(base, base)}")


def linearize(node, max_step_deg=0.0):
    """``GetLinearGeometry`` parity: stroke every arc, map curve
    containers to their linear equivalents, preserve Z."""
    base, payload, dims = node
    out_dims = dims.replace("M", "") if dims else dims   # M dropped
    if base in (POINT, LINESTRING):
        return (base, _xyz(payload, dims), out_dims)
    if base in (POLYGON, TRIANGLE):
        return (base, [_xyz(r, dims) for r in payload], out_dims)
    if base == CIRCULARSTRING:
        pts = _circularstring_to_points(payload, dims, max_step_deg)
        w = 3 if "Z" in dims else 2
        return (LINESTRING,
                np.asarray(pts, dtype=np.float64).reshape(-1, w), out_dims)
    if base == COMPOUNDCURVE:
        pts = _curve_member_points(node, max_step_deg)
        w = 3 if "Z" in dims else 2
        return (LINESTRING,
                np.asarray(pts, dtype=np.float64).reshape(-1, w), out_dims)
    if base == CURVEPOLYGON:
        rings = []
        for g in payload:
            pts = _curve_member_points(g, max_step_deg)
            w = 3 if "Z" in dims else 2
            rings.append(np.asarray(pts, dtype=np.float64).reshape(-1, w))
        return (POLYGON, rings, out_dims)
    if base in (MULTICURVE, MULTISURFACE, MULTIPOINT, MULTILINESTRING,
                MULTIPOLYGON, GEOMETRYCOLLECTION, POLYHEDRALSURFACE, TIN):
        mapped = {MULTICURVE: MULTILINESTRING, MULTISURFACE: MULTIPOLYGON}
        parts = [linearize(g, max_step_deg) for g in payload]
        return (mapped.get(base, base), parts, out_dims)
    raise ValueError(f"unsupported geometry base {base}")


def to_engine_wkb(node, max_step_deg=0.0):
    """Linearize and re-express as the engine's 2-D little-endian WKB
    over the 7 linear types (Triangle → Polygon, PolyhedralSurface/TIN
    → MultiPolygon, per ``OGRGeometryFactory::forceTo`` conventions)."""
    lin = linearize(node, max_step_deg)

    def _to2d(n):
        base, payload, dims = n
        if base in _COORD_NODES:
            return (base, np.asarray(payload, dtype=np.float64)[:, :2], "")
        if base in _RING_NODES:
            return (POLYGON,
                    [np.asarray(r, dtype=np.float64)[:, :2]
                     for r in payload], "")
        if base in (POLYHEDRALSURFACE, TIN):
            return (MULTIPOLYGON, [_to2d(g) for g in payload], "")
        return (base, [_to2d(g) for g in payload], "")

    return _write_node(_to2d(lin))


# ---------------------------------------------------------------------------
# exact metrics

def _cs_arcs(coords):
    """Yield per-arc (x0,y0,x1,y1,x2,y2) triplets of a CircularString."""
    c = np.asarray(coords, dtype=np.float64)
    for i in range(0, len(c) - 2, 2):
        yield (c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1],
               c[i + 2, 0], c[i + 2, 1])


def _cs_length(coords):
    total = 0.0
    for x0, y0, x1, y1, x2, y2 in _cs_arcs(coords):
        ok, R, _, _, a0, _, a2 = get_curve_parameters(x0, y0, x1, y1, x2, y2)
        if ok:
            total += abs(a2 - a0) * R
        else:
            total += math.hypot(x2 - x0, y2 - y0)
    return total


def _ls_length(coords):
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return 0.0
    d = np.diff(c[:, :2], axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def curve_length(node):
    """Exact 2-D length (arc lengths for circular portions), reference
    ``get_Length`` semantics per type."""
    base, payload, dims = node
    if base == CIRCULARSTRING:
        return _cs_length(payload)
    if base == LINESTRING:
        return _ls_length(payload)
    if base in (POLYGON, TRIANGLE):
        return sum(_ls_length(r) for r in payload)
    if base == POINT:
        return 0.0
    return sum(curve_length(g) for g in payload)


def _cs_extend_envelope(coords, env):
    """Reference ``ExtendEnvelopeWithCircular`` — including its quirk of
    seeding MinY updates from MaxY (kept verbatim for parity)."""
    for x0, y0, x1, y1, x2, y2 in _cs_arcs(coords):
        ok, R, cx, cy, a0, _, a2 = get_curve_parameters(
            x0, y0, x1, y1, x2, y2)
        if not ok or math.isnan(a0) or math.isnan(a2):
            continue
        q0 = int(math.floor(a0 / (math.pi / 2)))
        q1 = int(math.floor(a2 / (math.pi / 2)))
        if q0 > q1:
            q0, q1 = q1, q0
        for j in range(q0 + 1, q1 + 1):
            k = (j + 8) % 4
            if k == 0:
                env[1] = max(env[1], cx + R)
            elif k == 1:
                env[3] = max(env[3], cy + R)
            elif k == 2:
                env[0] = min(env[0], cx - R)
            else:
                env[2] = min(env[3], cy - R)   # sic — reference quirk
    return env


def curve_envelope(node):
    """Exact envelope (xmin, xmax, ymin, ymax), arcs included
    (``OGRCircularString::getEnvelope`` semantics)."""
    env = [math.inf, -math.inf, math.inf, -math.inf]

    def _walk(n):
        base, payload, dims = n
        if base in _COORD_NODES or base == CIRCULARSTRING:
            c = np.asarray(payload, dtype=np.float64)
            if len(c):
                env[0] = min(env[0], float(c[:, 0].min()))
                env[1] = max(env[1], float(c[:, 0].max()))
                env[2] = min(env[2], float(c[:, 1].min()))
                env[3] = max(env[3], float(c[:, 1].max()))
            if base == CIRCULARSTRING:
                _cs_extend_envelope(c, env)
            return
        if base in _RING_NODES:
            for r in payload:
                c = np.asarray(r, dtype=np.float64)
                if len(c):
                    env[0] = min(env[0], float(c[:, 0].min()))
                    env[1] = max(env[1], float(c[:, 0].max()))
                    env[2] = min(env[2], float(c[:, 1].min()))
                    env[3] = max(env[3], float(c[:, 1].max()))
            return
        for g in payload:
            _walk(g)

    _walk(node)
    return tuple(env)


def _shoelace(c):
    c = np.asarray(c, dtype=np.float64)[:, :2]
    if len(c) < 3:
        return 0.0
    x, y = c[:, 0], c[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _cs_closed(c):
    c = np.asarray(c, dtype=np.float64)
    return len(c) >= 3 and c[0, 0] == c[-1, 0] and c[0, 1] == c[-1, 1]


def _is_convex(pts):
    """Reference ``OGRCurve::IsConvex``: rejects on any positive cross
    product — i.e. "convex" means clockwise-convex."""
    pts = np.asarray(pts, dtype=np.float64)[:, :2]
    if len(pts) < 3:
        return True
    v1 = pts[1:-1] - pts[:-2]
    v2 = pts[2:] - pts[1:-1]
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    return not bool((cross > 0).any())


def _cs_full_circle(c):
    """IsFullCircle → (True, cx, cy, R²) or (False, ...)."""
    c = np.asarray(c, dtype=np.float64)
    if len(c) == 3 and _cs_closed(c):
        cx = (c[0, 0] + c[1, 0]) / 2
        cy = (c[0, 1] + c[1, 1]) / 2
        sq = (c[1, 0] - cx) ** 2 + (c[1, 1] - cy) ** 2
        return True, cx, cy, sq
    if len(c) == 5 and _cs_closed(c):
        ok1, R1, cx1, cy1, a01, _, a21 = get_curve_parameters(
            c[0, 0], c[0, 1], c[1, 0], c[1, 1], c[2, 0], c[2, 1])
        ok2, R2, cx2, cy2, a02, _, a22 = get_curve_parameters(
            c[2, 0], c[2, 1], c[3, 0], c[3, 1], c[4, 0], c[4, 1])
        if (ok1 and ok2 and abs(R1 - R2) < 1e-10 and
                abs(cx1 - cx2) < 1e-10 and abs(cy1 - cy2) < 1e-10 and
                (a21 - a01) * (a22 - a02) > 0):
            return True, cx1, cy1, R1 * R1
    return False, 0.0, 0.0, 0.0


def _cs_area_of_curve_segments(c):
    total = 0.0
    for x0, y0, x1, y1, x2, y2 in _cs_arcs(c):
        ok, R, _, _, a0, a1, a2 = get_curve_parameters(x0, y0, x1, y1, x2, y2)
        if ok:
            d01, d12 = a1 - a0, a2 - a1
            total += 0.5 * R * R * abs(
                d01 - math.sin(d01) + d12 - math.sin(d12))
    return total


def _cs_ring_area(c, dims, max_step_deg=0.0):
    """Closed CircularString area, reference ``get_Area``: full circle →
    πR²; convex → shoelace of control points + circular segments; else
    linearize-and-shoelace."""
    c2 = _xyz(c, dims)[:, :2]
    if not _cs_closed(c2):
        return 0.0
    full, _, _, sq = _cs_full_circle(c2)
    if full:
        return math.pi * sq
    if _is_convex(c2):
        return abs(_shoelace(c2)) + _cs_area_of_curve_segments(c2)
    pts = _circularstring_to_points(c2, "", max_step_deg)
    return abs(_shoelace(np.asarray(pts)))


def _ring_node_area(g, max_step_deg=0.0):
    base, payload, dims = g
    if base == LINESTRING:
        return abs(_shoelace(_xyz(payload, dims)))
    if base == CIRCULARSTRING:
        return _cs_ring_area(payload, dims, max_step_deg)
    if base == COMPOUNDCURVE:
        # reference OGRCompoundCurve::get_Area: when the full control
        # chain is (clockwise-)convex, shoelace over every control point
        # + the bulge of each circular half-arc segment; otherwise
        # stroke and shoelace
        pts = []
        for _, mp, md in payload:
            mpts = [tuple(p) for p in _xyz(mp, md)[:, :2]]
            if pts and mpts and pts[-1] == mpts[0]:
                mpts = mpts[1:]
            pts.extend(mpts)
        arr = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
        if _is_convex(arr):
            bulge = sum(_cs_area_of_curve_segments(_xyz(mp, md)[:, :2])
                        for mb, mp, md in payload if mb == CIRCULARSTRING)
            return abs(_shoelace(arr)) + bulge
        lin = _curve_member_points(g, max_step_deg)
        return abs(_shoelace(np.asarray(lin, dtype=np.float64)[:, :2]))
    raise ValueError("not a ring curve")


def curve_area(node, max_step_deg=0.0):
    """Exact area for curve polygons (full-circle / convex closed-form,
    stroked fallback), recursing through surfaces and collections."""
    base, payload, dims = node
    if base == CURVEPOLYGON:
        if not payload:
            return 0.0
        area = _ring_node_area(payload[0], max_step_deg)
        for hole in payload[1:]:
            area -= _ring_node_area(hole, max_step_deg)
        return area
    if base in (POLYGON, TRIANGLE):
        if not payload:
            return 0.0
        area = abs(_shoelace(_xyz(payload[0], dims)))
        for hole in payload[1:]:
            area -= abs(_shoelace(_xyz(hole, dims)))
        return area
    if base in (MULTISURFACE, MULTIPOLYGON, GEOMETRYCOLLECTION,
                POLYHEDRALSURFACE, TIN):
        return sum(curve_area(g, max_step_deg) for g in payload)
    return 0.0


def curve_value(node, distance):
    """Point at ``distance`` along a curve — reference ``Value``
    semantics (clamp to start/end, exact arc interpolation).  Returns an
    (x, y) or (x, y, z) tuple."""
    base, payload, dims = node
    if base == COMPOUNDCURVE:
        if distance < 0:
            return curve_value(payload[0], 0.0)
        at = 0.0
        for g in payload:
            ln = curve_length(g)
            if distance - at <= ln:
                return curve_value(g, distance - at)
            at += ln
        return curve_value(payload[-1], math.inf)
    c = _xyz(payload, dims)
    has_z = c.shape[1] > 2
    if len(c) == 0:
        raise ValueError("empty curve")
    if distance < 0:
        return tuple(c[0])
    if base == LINESTRING:
        seg = np.diff(c[:, :2], axis=0)
        lens = np.hypot(seg[:, 0], seg[:, 1])
        at = 0.0
        for i, ln in enumerate(lens):
            if ln > 0 and at <= distance <= at + ln:
                r = (distance - at) / ln
                return tuple(c[i] * (1 - r) + c[i + 1] * r)
            at += ln
        return tuple(c[-1])
    at = 0.0
    for i in range(0, len(c) - 2, 2):
        x0, y0 = c[i, 0], c[i, 1]
        x1, y1 = c[i + 1, 0], c[i + 1, 1]
        x2, y2 = c[i + 2, 0], c[i + 2, 1]
        ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(
            x0, y0, x1, y1, x2, y2)
        if ok:
            seg_len = abs(a2 - a0) * R
            if seg_len > 0:
                if at <= distance <= at + seg_len:
                    r = (distance - at) / seg_len
                    alpha = a0 * (1 - r) + a2 * r
                    x = cx + R * math.cos(alpha)
                    y = cy + R * math.sin(alpha)
                    if has_z:
                        return (x, y, c[i, 2] * (1 - r) + c[i + 2, 2] * r)
                    return (x, y)
                at += seg_len
        else:
            seg_len = math.hypot(x2 - x0, y2 - y0)
            if seg_len > 0:
                if at <= distance <= at + seg_len:
                    r = (distance - at) / seg_len
                    out = c[i] * (1 - r) + c[i + 2] * r
                    return tuple(out)
                at += seg_len
    return tuple(c[-1])


def segmentize_circularstring(coords, dims, max_length):
    """Reference ``OGRCircularString::segmentize``: densify arcs with
    odd intermediate-point counts per half-arc, reversing first when
    needed so both directions produce binary-identical output."""
    c = _xyz(np.asarray(coords, dtype=np.float64), dims)
    if len(c) == 0:
        return c
    if (c[0, 0] < c[-1, 0] or
            (c[0, 0] == c[-1, 0] and c[0, 1] < c[-1, 1])):
        rev = segmentize_circularstring(c[::-1], "Z" if c.shape[1] > 2
                                        else "", max_length)
        return rev[::-1]
    has_z = c.shape[1] > 2
    out = []

    def _emit(x, y, z=None):
        out.append((x, y, z) if has_z else (x, y))

    for i in range(0, len(c) - 2, 2):
        x0, y0 = c[i, 0], c[i, 1]
        x1, y1 = c[i + 1, 0], c[i + 1, 1]
        x2, y2 = c[i + 2, 0], c[i + 2, 1]
        z0 = c[i, 2] if has_z else None
        z1 = c[i + 1, 2] if has_z else None
        z2 = c[i + 2, 2] if has_z else None
        ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(
            x0, y0, x1, y1, x2, y2)
        _emit(x0, y0, z0)
        if ok:
            len1 = abs(a1 - a0) * R
            len2 = abs(a2 - a1) * R
            dense = len1 > max_length or len2 > max_length
            if dense:
                nmid = 1 + 2 * int(math.floor(len1 / max_length / 2.0))
                step = (a1 - a0) / (nmid + 1)
                for j in range(1, nmid + 1):
                    alpha = a0 + step * j
                    z = (None if not has_z else
                         z0 + (z1 - z0) * (alpha - a0) / (a1 - a0))
                    _emit(cx + R * math.cos(alpha),
                          cy + R * math.sin(alpha), z)
            _emit(x1, y1, z1)
            if dense:
                nmid = 1 + 2 * int(math.floor(len2 / max_length / 2.0))
                step = (a2 - a1) / (nmid + 1)
                for j in range(1, nmid + 1):
                    alpha = a1 + step * j
                    z = (None if not has_z else
                         z1 + (z2 - z1) * (alpha - a1) / (a2 - a1))
                    _emit(cx + R * math.cos(alpha),
                          cy + R * math.sin(alpha), z)
        else:
            len1 = math.hypot(x1 - x0, y1 - y0)
            len2 = math.hypot(x2 - x1, y2 - y1)
            dense = len1 > max_length or len2 > max_length
            if dense:
                nmid = 1 + 2 * int(math.ceil(len1 / max_length / 2.0))
                for j in range(1, nmid + 1):
                    f = j / (nmid + 1)
                    z = None if not has_z else z0 + f * (z1 - z0)
                    _emit(x0 + f * (x1 - x0), y0 + f * (y1 - y0), z)
            _emit(x1, y1, z1)
            if dense:
                nmid = 1 + 2 * int(math.ceil(len2 / max_length / 2.0))
                for j in range(1, nmid + 1):
                    f = j / (nmid + 1)
                    z = None if not has_z else z1 + f * (z2 - z1)
                    _emit(x1 + f * (x2 - x1), y1 + f * (y2 - y1), z)
    _emit(*c[-1])
    return np.asarray(out, dtype=np.float64)
