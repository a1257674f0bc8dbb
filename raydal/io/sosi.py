"""SOSI (Norwegian Statens Kartverk) vector reader, from scratch.

Mirrors the reference's SOSI driver (``ogr/ogrsf_frmts/sosi/``)
read semantics, derived from its published test matrix
(``autotest/ogr/ogr_sosi.py`` — the duplicate-fields fixture yields a
17-feature curve layer and a 1-feature surface layer whose first
duplicated attribute value wins; ``appendFieldsMap`` joins duplicates
with a chosen separator):

* the dot-hierarchy grammar: ``.KURVE id:`` / ``.FLATE id:`` /
  ``.PUNKT id:`` records with ``..FIELD value`` attributes and
  ``..NØ`` coordinate blocks (northing easting integer pairs scaled
  by ``...ENHET`` and offset by ``...ORIGO-NØ``; trailing ``...KP n``
  knot markers ignored),
* ``.FLATE`` geometry assembles from its ``..REF`` list — ``:id``
  uses the referenced curve forward, ``:-id`` reversed — chained into
  a closed ring (the reference routes this through FYBA),
* layers split by geometry class (curves / surfaces / points), each
  with the union of its record fields (file-native names; the
  reference additionally renames via its SOSI type table).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_sosi"]


def read_sosi(path, append_fields=None, append_sep="&",
              wkb_col="wkb"):
    """SOSI file → dict of layer name (``KURVE``/``FLATE``/``PUNKT``)
    → Arrow table.  ``append_fields``: set of field names whose
    duplicated values join with ``append_sep`` (otherwise the first
    value wins, like the reference default)."""
    append_fields = set(append_fields or ())
    text = open(path, encoding="latin1").read()
    lines = text.splitlines()

    unit = 1.0
    origo = (0.0, 0.0)
    records = []                    # (kind, id, fields, coords, refs)
    cur = None
    mode = None                     # None | 'coords' | 'ref'
    for raw in lines:
        line = raw.rstrip()
        if not line or line.startswith("!"):
            continue
        if line.startswith("...ENHET"):
            unit = float(line.split()[-1])
            continue
        if line.startswith("...ORIGO-N"):
            parts = line.split()
            if len(parts) >= 3:
                origo = (float(parts[-1]), float(parts[-2]))
            continue
        if line.startswith(".") and not line.startswith(".."):
            m = re.match(r"\.(\w+)\s+(\d+):", line)
            cur = None
            mode = None
            if m and m.group(1) in ("KURVE", "FLATE", "PUNKT",
                                    "BUEP", "TEKST"):
                cur = {"kind": m.group(1), "id": int(m.group(2)),
                       "fields": {}, "coords": [], "refs": []}
                records.append(cur)
            continue
        if cur is None:
            continue
        if line.startswith(".."):
            body = line[2:]
            key, _, val = body.partition(" ")
            key = key.strip()
            if key.startswith("N"):          # ..NØ coordinate block
                mode = "coords"
                continue
            if key == "REF":
                mode = "ref"
                cur["refs"].extend(re.findall(r":(-?\d+)", val))
                continue
            mode = None
            val = val.strip()
            if key in cur["fields"]:
                if key in append_fields:
                    cur["fields"][key] += append_sep + val
                # else: first value wins (reference default)
            else:
                cur["fields"][key] = val
        elif mode == "coords":
            parts = line.split()
            nums = []
            for p in parts:
                if p.startswith("..."):
                    break
                try:
                    nums.append(float(p))
                except ValueError:
                    break
            for i in range(0, len(nums) - 1, 2):
                n, e = nums[i], nums[i + 1]
                cur["coords"].append((origo[0] + e * unit,
                                      origo[1] + n * unit))
        elif mode == "ref":
            cur["refs"].extend(re.findall(r":(-?\d+)", line))

    by_id = {r["id"]: r for r in records}
    layers: dict[str, list] = {}
    for r in records:
        kind = r["kind"]
        if kind == "FLATE":
            ring = []
            for ref in r["refs"]:
                rid = int(ref)
                src = by_id.get(abs(rid))
                if src is None:
                    continue
                pts = src["coords"]
                if rid < 0:
                    pts = pts[::-1]
                if ring and pts and ring[-1] == pts[0]:
                    pts = pts[1:]
                ring.extend(pts)
            if ring and ring[0] != ring[-1]:
                ring.append(ring[0])
            wkb = W.polygon_wkb([ring]) if len(ring) >= 4 else None
        elif kind == "PUNKT":
            wkb = W.point_wkb(*r["coords"][0]) if r["coords"] else None
        else:
            wkb = W.linestring_wkb(r["coords"]) \
                if len(r["coords"]) >= 2 else None
        layers.setdefault(kind, []).append((r, wkb))

    out = {}
    for kind, rows in layers.items():
        names, seen = [], set()
        for r, _ in rows:
            for k in r["fields"]:
                if k not in seen:
                    seen.add(k)
                    names.append(k)
        arrays = [pa.array([r["id"] for r, _ in rows],
                           type=pa.int64())]
        col_names = ["fid"]
        for n in names:
            col_names.append(n)
            arrays.append(pa.array(
                [r["fields"].get(n) for r, _ in rows],
                type=pa.string()))
        col_names.append(wkb_col)
        arrays.append(pa.array([w for _, w in rows],
                               type=pa.binary()))
        out[kind] = pa.table(arrays, names=col_names)
    return out
