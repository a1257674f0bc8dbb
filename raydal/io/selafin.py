"""Selafin / Seraphin (TELEMAC hydraulic mesh) reader + writer, from
scratch.

Mirrors the reference's Selafin driver (``ogr/ogrsf_frmts/selafin/``)
semantics, derived from its published test matrix
(``autotest/ogr/ogr_selafin.py``):

* the file is big-endian Fortran sequential records (4-byte length
  framing): 80-char title, (NBV1, NBV2), NBV1 32-char variable names,
  10 IPARAM ints (+ 6 date ints when IPARAM[9] = 1),
  (NELEM, NPOIN, NDP, 1), IKLE connectivity (1-based), IPOBO,
  X, Y, then per time step a float time record and NBV1 records of
  NPOIN floats,
* the OGR model exposes a point layer per time step (nodes with one
  real field per variable) and an element layer (polygons from the
  IKLE rings) whose attribute values are the MEAN of the element's
  node values — the published test expects element 5 → 9 and
  element 10 → 15 on the 5×5 grid with node values ``i*5+j``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..geo import wkb as W

__all__ = ["read_selafin", "write_selafin", "selafin_nodes_table",
           "selafin_elements_table"]


def _records(buf):
    pos = 0
    while pos + 4 <= len(buf):
        (n,) = struct.unpack_from(">i", buf, pos)
        payload = buf[pos + 4:pos + 4 + n]
        pos += 8 + n
        yield payload


def read_selafin(path):
    """Selafin file → dict with title, var_names, iparam, date,
    (x, y), ikle (nelem, ndp), ipobo, times, values[t][v] arrays."""
    buf = open(path, "rb").read()
    rec = _records(buf)
    title = next(rec).decode("latin1")
    nbv1, nbv2 = struct.unpack(">2i", next(rec))
    var_names = [next(rec).decode("latin1").rstrip()
                 for _ in range(nbv1 + nbv2)]
    iparam = struct.unpack(">10i", next(rec))
    date = None
    if iparam[9] == 1:
        date = struct.unpack(">6i", next(rec))
    nelem, npoin, ndp, _one = struct.unpack(">4i", next(rec))
    ikle = np.frombuffer(next(rec), ">i4").reshape(nelem, ndp)
    ipobo = np.frombuffer(next(rec), ">i4")
    x = np.frombuffer(next(rec), ">f4").astype(np.float64)
    y = np.frombuffer(next(rec), ">f4").astype(np.float64)

    times, values = [], []
    while True:
        try:
            t = struct.unpack(">f", next(rec))[0]
        except (StopIteration, struct.error):
            break
        frame = []
        for _ in range(nbv1 + nbv2):
            frame.append(np.frombuffer(next(rec),
                                       ">f4").astype(np.float64))
        times.append(t)
        values.append(frame)
    return {"title": title, "var_names": var_names, "iparam": iparam,
            "date": date, "x": x, "y": y, "ikle": ikle,
            "ipobo": ipobo, "times": times, "values": values}


def write_selafin(path, title, var_names, x, y, ikle, times=None,
                  values=None, date=None):
    """Inverse of :func:`read_selafin` (single-class variables)."""
    x = np.asarray(x, dtype=">f4")
    y = np.asarray(y, dtype=">f4")
    ikle = np.asarray(ikle, dtype=">i4")
    nelem, ndp = ikle.shape
    npoin = len(x)
    out = []

    def rec(payload):
        out.append(struct.pack(">i", len(payload)))
        out.append(payload)
        out.append(struct.pack(">i", len(payload)))

    rec(title.ljust(80)[:80].encode("latin1"))
    rec(struct.pack(">2i", len(var_names), 0))
    for v in var_names:
        rec(v.ljust(32)[:32].encode("latin1"))
    iparam = [0] * 10
    if date is not None:
        iparam[9] = 1
    rec(struct.pack(">10i", *iparam))
    if date is not None:
        rec(struct.pack(">6i", *date))
    rec(struct.pack(">4i", nelem, npoin, ndp, 1))
    rec(ikle.tobytes())
    rec(np.zeros(npoin, dtype=">i4").tobytes())
    rec(x.tobytes())
    rec(y.tobytes())
    for ti, t in enumerate(times or []):
        rec(struct.pack(">f", t))
        for vi in range(len(var_names)):
            rec(np.asarray(values[ti][vi], dtype=">f4").tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(out))
    return path


def selafin_nodes_table(sel, time=0, wkb_col="wkb"):
    """Point layer: one row per node with per-variable real fields."""
    arrays = [pa.array(range(len(sel["x"])), type=pa.int64())]
    names = ["fid"]
    if sel["times"]:
        for vi, vn in enumerate(sel["var_names"]):
            names.append(vn or f"var{vi}")
            arrays.append(pa.array(sel["values"][time][vi],
                                   type=pa.float64()))
    wkbs = [W.point_wkb(float(px), float(py))
            for px, py in zip(sel["x"], sel["y"])]
    names.append(wkb_col)
    arrays.append(pa.array(wkbs, type=pa.binary()))
    return pa.table(arrays, names=names)


def selafin_elements_table(sel, time=0, wkb_col="wkb"):
    """Element layer: polygons from IKLE rings; attributes are the
    MEAN of the element's node values (reference semantics)."""
    x, y, ikle = sel["x"], sel["y"], sel["ikle"]
    arrays = [pa.array(range(len(ikle)), type=pa.int64())]
    names = ["fid"]
    if sel["times"]:
        idx = ikle - 1
        for vi, vn in enumerate(sel["var_names"]):
            vals = np.asarray(sel["values"][time][vi])
            names.append(vn or f"var{vi}")
            arrays.append(pa.array(vals[idx].mean(axis=1),
                                   type=pa.float64()))
    wkbs = []
    for elem in ikle:
        ring = [(float(x[n - 1]), float(y[n - 1])) for n in elem]
        ring.append(ring[0])
        wkbs.append(W.polygon_wkb([ring]))
    names.append(wkb_col)
    arrays.append(pa.array(wkbs, type=pa.binary()))
    return pa.table(arrays, names=names)
