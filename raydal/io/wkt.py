"""WKT ↔ WKB geometry codec — ``OGRGeometryFactory::createFromWkt`` /
``OGRGeometry::exportToWkt`` semantics (``ogr/ogrgeometryfactory.cpp``,
``ogr/ogrgeometry.cpp``) for the seven OGC types the engine carries.

Parser tolerances matching the reference: optional ``Z`` / ``M`` / ``ZM``
dimension suffixes (extra ordinates dropped — the engine is 2-D), both
MULTIPOINT forms (``MULTIPOINT (1 2, 3 4)`` and
``MULTIPOINT ((1 2), (3 4))``), leading-dot numerals (``.5``), ``EMPTY``
members, and nested GEOMETRYCOLLECTION.

Export formatting follows ``OGRFormatDouble`` defaults: ``%.15f`` with
trailing zeros trimmed, switching to ``%g`` for magnitudes where fixed
notation loses precision; classic (non-ISO) MULTIPOINT layout without
per-point parentheses, matching ``exportToWkt``'s default variant.
Validated against the reference's published corpus
(``autotest/ogr/data/wkb_wkt/*.wkb/.wkt`` pairs, compared through the
same normalize-both-sides protocol as
``autotest/ogr/ogr_wkbwkt_geom.py::test_wkbwkt_geom``).
"""

from __future__ import annotations

import re

import numpy as np

from ..geo import curves as _curves
from ..geo import wkb as W
from .geojson import geojson_to_wkb, wkb_to_geojson

__all__ = ["wkt_to_wkb", "wkb_to_wkt"]

_TYPES = ("GEOMETRYCOLLECTION", "MULTILINESTRING", "MULTIPOLYGON",
          "MULTIPOINT", "LINESTRING", "POLYGON", "POINT")
_CURVE_TYPES = ("CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON",
                "MULTICURVE", "MULTISURFACE", "POLYHEDRALSURFACE", "TIN",
                "TRIANGLE")
_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


class _Scanner:
    def __init__(self, text):
        self.t = text
        self.i = 0

    def skip_ws(self):
        while self.i < len(self.t) and self.t[self.i].isspace():
            self.i += 1

    def peek(self):
        self.skip_ws()
        return self.t[self.i] if self.i < len(self.t) else ""

    def expect(self, ch):
        if self.peek() != ch:
            raise ValueError(f"WKT parse error at {self.i}: expected "
                             f"{ch!r} in {self.t[self.i:self.i + 20]!r}")
        self.i += 1

    def word(self):
        self.skip_ws()
        m = re.match(r"[A-Za-z]+", self.t[self.i:])
        if not m:
            return ""
        self.i += len(m.group(0))
        return m.group(0).upper()

    def number(self):
        self.skip_ws()
        m = _NUM.match(self.t, self.i)
        if not m:
            raise ValueError(f"WKT parse error at {self.i}: expected "
                             f"number in {self.t[self.i:self.i + 20]!r}")
        self.i = m.end()
        return float(m.group(0))


def _coord(sc):
    pt = [sc.number(), sc.number()]
    while sc.peek() not in (",", ")", ""):   # Z/M ordinates: drop
        pt.append(sc.number())
    return pt[:2]


def _coord_list(sc):
    sc.expect("(")
    pts = [_coord(sc)]
    while sc.peek() == ",":
        sc.i += 1
        pts.append(_coord(sc))
    sc.expect(")")
    return pts


def _maybe_empty(sc):
    save = sc.i
    if sc.word() == "EMPTY":
        return True
    sc.i = save
    return False


def _parse_geom(sc):
    typ = sc.word()
    if typ not in _TYPES:
        raise ValueError(f"unsupported WKT type {typ!r}")
    save = sc.i
    dim = sc.word()
    if dim not in ("Z", "M", "ZM"):
        sc.i = save
    if _maybe_empty(sc):
        if typ == "POINT":
            return {"type": "Point", "coordinates": []}
        if typ == "GEOMETRYCOLLECTION":
            return {"type": "GeometryCollection", "geometries": []}
        name = {"LINESTRING": "LineString", "POLYGON": "Polygon",
                "MULTIPOINT": "MultiPoint",
                "MULTILINESTRING": "MultiLineString",
                "MULTIPOLYGON": "MultiPolygon"}[typ]
        return {"type": name, "coordinates": []}
    if typ == "POINT":
        sc.expect("(")
        c = _coord(sc)
        sc.expect(")")
        return {"type": "Point", "coordinates": c}
    if typ == "LINESTRING":
        return {"type": "LineString", "coordinates": _coord_list(sc)}
    if typ == "POLYGON":
        sc.expect("(")
        rings = [_coord_list(sc)]
        while sc.peek() == ",":
            sc.i += 1
            rings.append(_coord_list(sc))
        sc.expect(")")
        return {"type": "Polygon", "coordinates": rings}
    if typ == "MULTIPOINT":
        sc.expect("(")
        pts = []
        while True:
            if sc.peek() == "(":       # ISO per-point parens
                sc.expect("(")
                pts.append(_coord(sc))
                sc.expect(")")
            else:                      # classic bare form
                pts.append(_coord(sc))
            if sc.peek() == ",":
                sc.i += 1
                continue
            break
        sc.expect(")")
        return {"type": "MultiPoint", "coordinates": pts}
    if typ == "MULTILINESTRING":
        sc.expect("(")
        parts = [_coord_list(sc)]
        while sc.peek() == ",":
            sc.i += 1
            parts.append(_coord_list(sc))
        sc.expect(")")
        return {"type": "MultiLineString", "coordinates": parts}
    if typ == "MULTIPOLYGON":
        sc.expect("(")
        polys = []
        while True:
            sc.expect("(")
            rings = [_coord_list(sc)]
            while sc.peek() == ",":
                sc.i += 1
                rings.append(_coord_list(sc))
            sc.expect(")")
            polys.append(rings)
            if sc.peek() == ",":
                sc.i += 1
                continue
            break
        sc.expect(")")
        return {"type": "MultiPolygon", "coordinates": polys}
    # GEOMETRYCOLLECTION
    sc.expect("(")
    geoms = [_parse_geom(sc)]
    while sc.peek() == ",":
        sc.i += 1
        geoms.append(_parse_geom(sc))
    sc.expect(")")
    return {"type": "GeometryCollection", "geometries": geoms}


def wkt_to_wkb(text):
    """WKT string → little-endian WKB.  The 7 linear types emit 2-D
    WKB; curve/surface types (CIRCULARSTRING … TIN, incl. Z/M) keep
    their ISO curve codes — parse_wkb linearizes them on read."""
    head = text.lstrip().split("(", 1)[0].split()[0].upper() \
        if text.strip() else ""
    if head in _CURVE_TYPES:
        return _curves.write_wkb_curve(_curves.parse_wkt_curve(text))
    sc = _Scanner(text)
    g = _parse_geom(sc)
    if (g["type"] == "Point" and g["coordinates"] == []):
        # POINT EMPTY → the reference exports nan-coordinate WKB
        g = {"type": "Point", "coordinates": [float("nan"), float("nan")]}
    return geojson_to_wkb(g)


def _fmt(v, precision=15):
    # OGRFormatDouble defaults (ogr/ogrutils.cpp:226-259): fixed
    # %.15f for |v| < 1, otherwise general 15-significant-digit
    # notation (uppercase exponent), trailing zeros trimmed; integral
    # coordinates print bare (OGRMakeWktCoordinate int fast path).
    # precision >= 17 switches to round-trip-exact %.17g (the
    # OGR_WKT_PRECISION escape hatch).
    if v != v:   # nan
        return "nan"
    if v in (float("inf"), float("-inf")):
        return "inf" if v > 0 else "-inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    if precision >= 17:
        return repr(v)
    s = f"{v:.{precision}f}" if abs(v) < 1 else f"{v:.{precision}G}"
    if "." in s and "E" not in s:
        s = s.rstrip("0").rstrip(".")
    return s


def _fmt_coords(coords, precision=15):
    return ",".join(f"{_fmt(x, precision)} {_fmt(y, precision)}"
                    for x, y in coords)


def _geom_to_wkt(g, precision=15):
    t = g["type"]
    c = g.get("coordinates")
    P = precision
    if t == "Point":
        if not c or c[0] != c[0]:    # nan-coordinate WKB == POINT EMPTY
            return "POINT EMPTY"
        return f"POINT ({_fmt(c[0], P)} {_fmt(c[1], P)})"
    if t == "LineString":
        if not c:
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_fmt_coords(c, P)})"
    if t == "Polygon":
        if not c:
            return "POLYGON EMPTY"
        return ("POLYGON (" +
                ",".join(f"({_fmt_coords(r, P)})" for r in c) + ")")
    if t == "MultiPoint":
        if not c:
            return "MULTIPOINT EMPTY"
        return f"MULTIPOINT ({_fmt_coords(c, P)})"
    if t == "MultiLineString":
        if not c:
            return "MULTILINESTRING EMPTY"
        return ("MULTILINESTRING (" +
                ",".join(f"({_fmt_coords(p, P)})" for p in c) + ")")
    if t == "MultiPolygon":
        if not c:
            return "MULTIPOLYGON EMPTY"
        return ("MULTIPOLYGON (" + ",".join(
            "(" + ",".join(f"({_fmt_coords(r, P)})" for r in p) + ")"
            for p in c) + ")")
    geoms = g.get("geometries", [])
    if not geoms:
        return "GEOMETRYCOLLECTION EMPTY"
    return ("GEOMETRYCOLLECTION (" +
            ",".join(_geom_to_wkt(s, P) for s in geoms) + ")")


def wkb_to_wkt(buf, precision=15):
    """WKB → WKT string (classic variant formatting; ``precision >= 17``
    is round-trip exact — the OGR_WKT_PRECISION analogue).  Curve WKB
    (codes 8-17) formats as ISO curve WKT without linearizing."""
    if _curves.is_curve_code(W.wkb_geom_type(buf)):
        return _curves.format_wkt_curve(_curves.parse_wkb_curve(bytes(buf)),
                                        precision)
    return _geom_to_wkt(wkb_to_geojson(buf), precision)
