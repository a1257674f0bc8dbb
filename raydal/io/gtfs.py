"""GTFS (General Transit Feed Specification) vector reader, from
scratch.

Mirrors the reference's GTFS driver
(``ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp``) semantics, derived from
its published test matrix (``autotest/ogr/ogr_gtfs.py``):

* a feed is a directory or ``.zip`` of ``.txt`` CSVs; files whose
  header row isn't a clean identifier list (the fixture's
  ``error_warning.txt``) are skipped — the reference drops files
  the CSV driver names ``field_1``,
* typing rules (``OGRGTFSLayer`` ctor): ``stop_lat``/``stop_lon``/
  ``shape_pt_lat``/``shape_pt_lon``/``shape_dist_traveled`` → float,
  ``shape_pt_sequence``/``stop_sequence``/any ``*_type*`` → int,
  weekday flags → bool, ``date``/``start_date``/``end_date`` parse
  ``YYYYMMDD`` and render GDAL-style ``YYYY/MM/DD``,
  ``arrival_time``/``departure_time`` stay ``HH:MM:SS`` strings,
* geometry: ``stops`` and ``shapes`` rows become points from their
  lat/lon pairs; ``trips`` rows become linestrings by joining
  ``stop_times`` (ordered by ``stop_sequence``) against ``stops``
  coordinates; a synthesized ``shapes_geom`` layer carries one
  linestring per ``shape_id`` ordered by ``shape_pt_sequence``.
"""

from __future__ import annotations

import csv
import io
import os
import re
import zipfile

import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_gtfs"]

REQUIRED_FILES = ("agency.txt", "routes.txt", "trips.txt",
                  "stop_times.txt", "stops.txt", "calendar.txt")

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _read_members(src):
    """→ dict basename → text content of each .txt member."""
    out = {}
    if os.path.isdir(src):
        for fn in sorted(os.listdir(src)):
            if fn.lower().endswith(".txt"):
                with open(os.path.join(src, fn), "rb") as f:
                    out[fn] = f.read()
    else:
        with zipfile.ZipFile(src) as z:
            for fn in sorted(z.namelist()):
                if fn.lower().endswith(".txt") and "/" not in fn.strip("/"):
                    out[os.path.basename(fn)] = z.read(fn)
    return {k: v.decode("utf-8-sig", errors="replace")
            for k, v in out.items()}


def _parse_csv(text):
    rows = list(csv.reader(io.StringIO(text)))
    rows = [r for r in rows if r]
    if not rows:
        return None, None
    header = [h.strip() for h in rows[0]]
    if len(header) < 2 or not all(_IDENT.fullmatch(h) for h in header):
        return None, None                  # reference's field_1 skip
    return header, rows[1:]


def _col_type(name):
    if name in ("stop_lat", "stop_lon", "shape_pt_lat", "shape_pt_lon",
                "shape_dist_traveled"):
        return "float"
    if name in ("shape_pt_sequence", "stop_sequence") or "_type" in name:
        return "int"
    if name in ("date", "start_date", "end_date"):
        return "date"
    if name in ("monday", "tuesday", "wednesday", "thursday", "friday",
                "saturday", "sunday"):
        return "bool"
    return "str"


def _convert(v, kind):
    v = v.strip()
    if v == "":
        return None
    if kind == "float":
        try:
            return float(v)
        except ValueError:
            return None
    if kind == "int":
        try:
            return int(v)
        except ValueError:
            return None
    if kind == "bool":
        return v == "1"
    if kind == "date" and len(v) == 8 and v.isdigit():
        return f"{v[:4]}/{v[4:6]}/{v[6:8]}"
    return v


_PA = {"float": pa.float64(), "int": pa.int64(), "bool": pa.bool_(),
       "date": pa.string(), "str": pa.string()}


def _table(header, rows, wkbs=None, wkb_col="wkb"):
    kinds = [_col_type(h) for h in header]
    arrays, names = [], []
    for j, h in enumerate(header):
        vals = [_convert(r[j], kinds[j]) if j < len(r) else None
                for r in rows]
        arrays.append(pa.array(vals, type=_PA[kinds[j]]))
        names.append(h)
    if wkbs is not None:
        names.append(wkb_col)
        arrays.append(pa.array(wkbs, type=pa.binary()))
    return pa.table(arrays, names=names)


def read_gtfs(src, wkb_col="wkb"):
    """GTFS feed (zip path or directory) → dict of layer name → Arrow
    table, including the synthesized ``shapes_geom`` layer."""
    members = _read_members(src)
    found = sum(1 for f in REQUIRED_FILES if f in members)
    if found != len(REQUIRED_FILES):
        raise ValueError("GTFS: required .txt files missing")

    parsed = {}
    for fn, text in members.items():
        header, rows = _parse_csv(text)
        if header is not None:
            parsed[os.path.splitext(fn)[0]] = (header, rows)

    # trips geometry: stop_times (trip_id → ordered stop_ids) × stops.
    stop_lonlat = {}
    if "stops" in parsed:
        h, rows = parsed["stops"]
        idx = {c: h.index(c) for c in ("stop_id", "stop_lat", "stop_lon")
               if c in h}
        if len(idx) == 3:
            for r in rows:
                try:
                    stop_lonlat[r[idx["stop_id"]].strip()] = (
                        float(r[idx["stop_lon"]]),
                        float(r[idx["stop_lat"]]))
                except (ValueError, IndexError):
                    pass
    trip_stops: dict[str, list] = {}
    if "stop_times" in parsed:
        h, rows = parsed["stop_times"]
        idx = {c: h.index(c) for c in ("trip_id", "stop_id",
                                       "stop_sequence") if c in h}
        if len(idx) == 3:
            for r in rows:
                try:
                    trip_stops.setdefault(
                        r[idx["trip_id"]].strip(), []).append(
                        (int(r[idx["stop_sequence"]]),
                         r[idx["stop_id"]].strip()))
                except (ValueError, IndexError):
                    pass
            for v in trip_stops.values():
                v.sort()

    out = {}
    for name, (header, rows) in parsed.items():
        wkbs = None
        if name == "stops" and {"stop_lat", "stop_lon"} <= set(header):
            la, lo = header.index("stop_lat"), header.index("stop_lon")
            wkbs = [W.point_wkb(float(r[lo]), float(r[la]))
                    for r in rows]
        elif name == "shapes" and {"shape_pt_lat",
                                   "shape_pt_lon"} <= set(header):
            la = header.index("shape_pt_lat")
            lo = header.index("shape_pt_lon")
            wkbs = [W.point_wkb(float(r[lo]), float(r[la]))
                    for r in rows]
        elif name == "trips" and "trip_id" in header:
            ti = header.index("trip_id")
            wkbs = []
            for r in rows:
                pts = [stop_lonlat[sid] for _, sid in
                       trip_stops.get(r[ti].strip(), [])
                       if sid in stop_lonlat]
                wkbs.append(W.linestring_wkb(pts) if len(pts) >= 2
                            else None)
        out[name] = _table(header, rows, wkbs, wkb_col)

    if "shapes" in parsed:
        h, rows = parsed["shapes"]
        idx = {c: h.index(c) for c in
               ("shape_id", "shape_pt_lat", "shape_pt_lon",
                "shape_pt_sequence") if c in h}
        if len(idx) == 4:
            groups: dict[str, list] = {}
            order = []
            for r in rows:
                sid = r[idx["shape_id"]].strip()
                if sid not in groups:
                    groups[sid] = []
                    order.append(sid)
                groups[sid].append((int(r[idx["shape_pt_sequence"]]),
                                    float(r[idx["shape_pt_lon"]]),
                                    float(r[idx["shape_pt_lat"]])))
            ids, wkbs = [], []
            for sid in order:
                pts = sorted(groups[sid])
                ids.append(sid)
                wkbs.append(W.linestring_wkb([(x, y) for _, x, y in pts]))
            out["shapes_geom"] = pa.table(
                {"shape_id": pa.array(ids, type=pa.string()),
                 wkb_col: pa.array(wkbs, type=pa.binary())})
    return out
