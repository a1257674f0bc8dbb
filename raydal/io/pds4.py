"""NASA PDS4 (Planetary Data System v4) raster label reader, from
scratch.

Mirrors the reference's PDS4 driver (``frmts/pds/pds4dataset.cpp``)
read semantics, derived from its published test matrix
(``autotest/gdrivers/pds4.py`` test_pds4_read_cart_versions: all four
cartography schema generations — 1700/1B00/1D00_1933/1G00_1950 — of
the byte fixture decode to checksum 4672 with geotransform
(-59280, 60, 0, 3751320, 0, -60)):

* the ``Product_Observational`` label is parsed namespace-agnostic;
  ``File_Area_Observational`` yields the payload file, byte offset,
  ``Element_Array/data_type`` (Unsigned/Signed byte-to-8-byte MSB/LSB
  integers and IEEE754 floats) and the ``Axis_Array`` list ordered by
  ``sequence_number`` (``Last Index Fastest`` = C order),
* axes named Band/Line/Sample map to the (band, line, sample) cube,
* ``cart:Cartography`` supplies the geotransform from
  ``upperleft_corner_x/y`` and ``pixel_resolution_x/y`` with unit
  conversion (km → m), plus the projection name/parameters and the
  geodetic model radii,
* ``Special_Constants/missing_constant`` becomes the nodata value.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["read_pds4", "pds4_subdatasets"]

_DTYPES = {
    "UnsignedByte": "u1", "SignedByte": "i1",
    "UnsignedMSB2": ">u2", "SignedMSB2": ">i2",
    "UnsignedMSB4": ">u4", "SignedMSB4": ">i4",
    "UnsignedMSB8": ">u8", "SignedMSB8": ">i8",
    "UnsignedLSB2": "<u2", "SignedLSB2": "<i2",
    "UnsignedLSB4": "<u4", "SignedLSB4": "<i4",
    "UnsignedLSB8": "<u8", "SignedLSB8": "<i8",
    "IEEE754MSBSingle": ">f4", "IEEE754MSBDouble": ">f8",
    "IEEE754LSBSingle": "<f4", "IEEE754LSBDouble": "<f8",
    "ComplexMSB8": ">c8", "ComplexMSB16": ">c16",
}


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _find(root, name):
    for e in root.iter():
        if _local(e.tag) == name:
            return e
    return None


def _text(root, name, default=None):
    e = _find(root, name)
    return (e.text or "").strip() if e is not None and e.text else default


def _meters(elem):
    """value element with a unit attribute → meters."""
    if elem is None or not elem.text:
        return None
    v = float(elem.text.strip())
    unit = (elem.get("unit") or "m").lower()
    if unit.startswith("km"):
        return v * 1000.0
    return v


def _file_areas(root):
    return [e for e in root.iter()
            if _local(e.tag) == "File_Area_Observational"]


def _arrays(fao):
    return [e for e in fao if _local(e.tag).startswith("Array")]


def pds4_subdatasets(xml_path):
    """→ list of (file_index, array_index, file_name, array_name) —
    the reference's ``PDS4:label:f:a`` subdataset enumeration."""
    root = ET.parse(xml_path).getroot()
    out = []
    for fi, fao in enumerate(_file_areas(root), start=1):
        fname = _text(fao, "file_name")
        for ai, arr in enumerate(_arrays(fao), start=1):
            name = None
            for c in arr:
                if _local(c.tag) in ("local_identifier", "name"):
                    name = (c.text or "").strip()
                    break
            out.append((fi, ai, fname, name))
    return out


def read_pds4(xml_path, file_index=1, array_index=1):
    """PDS4 label → dict with ``data`` (bands, lines, samples),
    ``geotransform``, ``nodata``, ``projection`` (name + parameter
    dict), ``geodetic`` radii and ``dtype``.  ``file_index`` /
    ``array_index`` select a subdataset (1-based, the reference's
    ``PDS4:label:f:a`` syntax)."""
    root = ET.parse(xml_path).getroot()
    base = os.path.dirname(xml_path)

    faos = _file_areas(root)
    if not faos:
        raise ValueError("no File_Area_Observational in PDS4 label")
    if file_index < 1 or file_index > len(faos):
        raise ValueError(f"file index {file_index} out of range")
    fao = faos[file_index - 1]
    fname = _text(fao, "file_name")
    if not fname:
        raise ValueError("PDS4 label lacks file_name")

    arrays = _arrays(fao)
    if not arrays:
        raise ValueError("no Array object in PDS4 label")
    if array_index < 1 or array_index > len(arrays):
        raise ValueError(f"array index {array_index} out of range")
    arr_elem = arrays[array_index - 1]

    off_e = _find(arr_elem, "offset")
    offset = int(float(off_e.text)) if off_e is not None and off_e.text \
        else 0
    dtype_name = _text(arr_elem, "data_type", "UnsignedByte")
    dt = np.dtype(_DTYPES.get(dtype_name, "u1"))

    axes = []
    for e in arr_elem:
        if _local(e.tag) == "Axis_Array":
            axes.append((int(_text(e, "sequence_number", "0") or 0),
                         _text(e, "axis_name", ""),
                         int(_text(e, "elements", "0") or 0)))
    axes.sort()
    names = [a[1] for a in axes]
    shape = tuple(a[2] for a in axes)

    raw = open(os.path.join(base, fname), "rb").read()
    count = int(np.prod(shape)) if shape else 0
    data = np.frombuffer(raw, dtype=dt, count=count,
                         offset=offset).reshape(shape)

    # normalize to (band, line, sample)
    order = []
    for want in ("Band", "Line", "Sample"):
        if want in names:
            order.append(names.index(want))
    if len(order) == len(names) and order != list(range(len(names))):
        data = np.transpose(data, order)
    if data.ndim == 2:
        data = data[None]

    nodata = None
    mc = _text(arr_elem, "missing_constant")
    if mc is not None:
        nodata = float(mc)

    gt = None
    proj = None
    geodetic = {}
    cart = _find(root, "Cartography")
    if cart is not None:
        ulx = _meters(_find(cart, "upperleft_corner_x"))
        uly = _meters(_find(cart, "upperleft_corner_y"))
        resx = _meters(_find(cart, "pixel_resolution_x"))
        resy = _meters(_find(cart, "pixel_resolution_y"))
        if None not in (ulx, uly, resx, resy):
            gt = [ulx, resx, 0.0, uly, 0.0, -resy]
            rot = float(_text(cart, "map_projection_rotation", "0")
                        or 0)
            if rot != 0:
                import math
                s = 1.0 if rot == 90 else math.sin(math.radians(rot))
                c = 0.0 if rot == 90 else math.cos(math.radians(rot))
                gt = [c * gt[0] - s * gt[3],
                      c * gt[1] - s * gt[4],
                      c * gt[2] - s * gt[5],
                      s * gt[0] + c * gt[3],
                      s * gt[1] + c * gt[4],
                      s * gt[2] + c * gt[5]]
            gt = tuple(gt)
        name = _text(cart, "map_projection_name")
        params = {}
        for key in ("scale_factor_at_central_meridian",
                    "longitude_of_central_meridian",
                    "latitude_of_projection_origin",
                    "standard_parallel_1", "standard_parallel_2",
                    "straight_vertical_longitude_from_pole",
                    "false_easting", "false_northing",
                    "center_longitude", "center_latitude"):
            v = _text(cart, key)
            if v is not None:
                params[key] = float(v)
        proj = {"name": name, "params": params}
        for key in ("spheroid_name", "latitude_type",
                    "longitude_direction"):
            v = _text(cart, key)
            if v is not None:
                geodetic[key] = v
        for key in ("semi_major_radius", "semi_minor_radius",
                    "polar_radius"):
            v = _meters(_find(cart, key))
            if v is not None:
                geodetic[key] = v

    return {"data": data, "geotransform": gt, "nodata": nodata,
            "projection": proj, "geodetic": geodetic,
            "dtype": str(dt)}
