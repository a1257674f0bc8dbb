"""BAG and S-102 bathymetry readers over the repo's own HDF5 parser.

Reference drivers: ``frmts/hdf5/bagdataset.cpp`` and
``frmts/hdf5/s102dataset.cpp`` — both are HDF5 containers read here
through :mod:`raydal.io.hdf5` (no external libs).

* **BAG**: ``/BAG_root/{elevation, uncertainty,
  nominal_elevation}`` float32 grids stored south-up (the driver
  flips so row 0 is north); nodata 1 000 000; georeferencing from
  the ISO-metadata XML dataset's ``cornerPoints`` (SW/NE cell
  centers).  Published parity: ``autotest/gdrivers/bag.py``
  test_bag_2 (checksums 1072 / 150 / 1315, nodata 1e6).
* **S-102**: ``/BathymetryCoverage/BathymetryCoverage.01/Group_001/
  values`` compound {depth f4, uncertainty f4} south-up, grid
  origin/spacing attributes on the coverage group.  Published
  parity: ``autotest/gdrivers/s102.py`` test_s102_basic (gt
  (1.8, 0.4, 0, 48.75, 0, -0.5), band order depth then uncertainty,
  nodata 1e6, row-flipped values).
"""

from __future__ import annotations

import re

import numpy as np

from .hdf5 import HDF5File

__all__ = ["read_bag", "read_s102"]

_BAG_NODATA = 1000000.0


def read_bag(path):
    """BAG → ``(array [bands, h, w] float32, geotransform | None,
    nodata)`` with bands elevation, uncertainty
    [, nominal_elevation] — row 0 north, like the reference."""
    h5 = HDF5File(path)
    names = h5.datasets()
    bands = []
    for name in ("/BAG_root/elevation", "/BAG_root/uncertainty",
                 "/BAG_root/nominal_elevation"):
        if name in names:
            shape, _dt = names[name]
            a = np.asarray(h5.read(name)).reshape(shape)
            bands.append(a[::-1].astype(np.float32))
    if not bands:
        raise ValueError("not a BAG file (no /BAG_root/elevation)")
    gt = None
    if "/BAG_root/metadata" in names:
        shape, _dt = names["/BAG_root/metadata"]
        meta = np.asarray(h5.read("/BAG_root/metadata"))
        xml = meta.tobytes().decode("utf-8", "replace")
        m = re.search(
            r"cornerPoints>.*?coordinates[^>]*>([^<]+)<", xml, re.S)
        if m:
            pts = [tuple(float(v) for v in p.split(","))
                   for p in m.group(1).split()]
            if len(pts) >= 2:
                (x0, y0), (x1, y1) = pts[0], pts[1]
                hgt, wid = bands[0].shape
                dx = (x1 - x0) / max(wid - 1, 1)
                dy = (y1 - y0) / max(hgt - 1, 1)
                gt = (x0 - dx / 2, dx, 0.0, y1 + dy / 2, 0.0, -dy)
    return np.stack(bands), gt, _BAG_NODATA


def read_s102(path, elevation=False):
    """S-102 → ``(array [2, h, w] float32 (depth, uncertainty),
    geotransform, nodata)``; ``elevation=True`` negates depth like
    the reference's ``DEPTH_OR_ELEVATION=ELEVATION`` open option."""
    h5 = HDF5File(path)
    names = h5.datasets()
    values = next((n for n in names
                   if n.startswith("/BathymetryCoverage/")
                   and n.endswith("/values")), None)
    if values is None:
        raise ValueError("not an S-102 file (no BathymetryCoverage)")
    shape, dts = names[values]
    raw = np.asarray(h5.read(values)).reshape(shape)
    # compound {depth f4, uncertainty f4} parses as complex64 pairs
    if raw.dtype == np.complex64:
        depth = raw.real.astype(np.float32)
        unc = raw.imag.astype(np.float32)
    else:
        depth = raw["depth"].astype(np.float32)
        unc = raw["uncertainty"].astype(np.float32)
    depth = depth[::-1]
    unc = unc[::-1]
    if elevation:
        nod = depth == _BAG_NODATA
        depth = np.where(nod, np.float32(_BAG_NODATA),
                         -depth).astype(np.float32)
    cov = values.rsplit("/", 2)[0]
    at = h5.attrs(cov)
    x0 = float(at["gridOriginLongitude"])
    y0 = float(at["gridOriginLatitude"])
    dx = float(at["gridSpacingLongitudinal"])
    dy = float(at["gridSpacingLatitudinal"])
    hgt = shape[0]
    gt = (x0 - dx / 2, dx, 0.0, y0 + (hgt - 1) * dy + dy / 2,
          0.0, -dy)
    return np.stack([depth, unc]), gt, _BAG_NODATA
