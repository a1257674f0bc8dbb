"""Vaisala Sigmet IRIS weather-radar product reader, from scratch.

Reference driver: ``frmts/iris/irisdataset.cpp`` — a 640-byte header
(12-byte structure header + product configuration): raster size at
112/116, band count at 120, product code at 24, data-type code at
142, projection code at 158, X/Y scale (cm) at 100/104, radar
location (grid fractions) at 124/128, and the ingest geo block at
+332: center lat/lon as 32-bit binary angles at 440/444, equatorial
radius (cm) at 552, inverse flattening (·1e6) at 556, projection
reference lat/lon at 572/576.

Pixels are stored bottom-up.  Implemented data types (the fixture
surface): dBT/dBZ 1-byte ``(raw-64)/2`` with 95.5 → -9999, dBT2/dBZ2
2-byte ``(raw-32768)/100``.  The Mercator geotransform reproduces
the driver's construction: two Vincenty direct shots (due east /
due north by one pixel, ``GeodesicCalculation``,
``irisdataset.cpp:528-608``) projected through an ellipsoidal
Mercator_1SP (k=1) — PROJ ignores the latitude_of_origin parameter,
matching the published numbers.

Validated against ``autotest/gdrivers/iris.py`` (fakeiris.dat 65532,
iristest.dat 52872 + geotransform to 1e-5 relative).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["read_iris", "iris_info"]

_NODATA = -9999.0


def _vincenty_direct(lat, lon, azimuth, dist, a, b, f):
    """Vincenty direct (irisdataset.cpp GeodesicCalculation) →
    (lon2, lat2) degrees."""
    alpha1 = math.radians(azimuth)
    sin_a1, cos_a1 = math.sin(alpha1), math.cos(alpha1)
    tan_u1 = (1 - f) * math.tan(math.radians(lat))
    cos_u1 = 1 / math.sqrt(1 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    sigma1 = math.atan2(tan_u1, cos_a1)
    sin_alpha = cos_u1 * sin_a1
    cos_sq = 1 - sin_alpha * sin_alpha
    usq = cos_sq * (a * a - b * b) / (b * b)
    big_a = 1 + usq / 16384 * (4096 + usq *
                               (-768 + usq * (320 - 175 * usq)))
    big_b = usq / 1024 * (256 + usq * (-128 + usq * (74 - 47 * usq)))
    sigma = dist / (b * big_a)
    sigma_p = 2 * math.pi
    sin_s = cos_s = cos2sm = 0.0
    for _ in range(100):
        if abs(sigma - sigma_p) <= 1e-12:
            break
        cos2sm = math.cos(2 * sigma1 + sigma)
        sin_s, cos_s = math.sin(sigma), math.cos(sigma)
        delta = big_b * sin_s * (
            cos2sm + big_b / 4 *
            (cos_s * (-1 + 2 * cos2sm * cos2sm)
             - big_b / 6 * cos2sm * (-3 + 4 * sin_s * sin_s)
             * (-3 + 4 * cos2sm * cos2sm)))
        sigma_p = sigma
        sigma = dist / (b * big_a) + delta
    tmp = sin_u1 * sin_s - cos_u1 * cos_s * cos_a1
    lat2 = math.atan2(sin_u1 * cos_s + cos_u1 * sin_s * cos_a1,
                      (1 - f) * math.sqrt(sin_alpha * sin_alpha
                                          + tmp * tmp))
    lam = math.atan2(sin_s * sin_a1,
                     cos_u1 * cos_s - sin_u1 * sin_s * cos_a1)
    c = f / 16 * cos_sq * (4 + f * (4 - 3 * cos_sq))
    ell = lam - (1 - c) * f * sin_alpha * (
        sigma + c * sin_s * (cos2sm + c * cos_s *
                             (-1 + 2 * cos2sm * cos2sm)))
    lon2 = math.radians(lon) + ell
    if lon2 > math.pi:
        lon2 -= 2 * math.pi
    if lon2 < -math.pi:
        lon2 += 2 * math.pi
    return math.degrees(lon2), math.degrees(lat2)


def _merc_fwd(lat, lon, lon0, a, inv_f):
    """Ellipsoidal Mercator 1SP forward, k0=1."""
    lam = math.radians(lon - lon0)
    phi = math.radians(lat)
    x = a * lam
    if inv_f == 0.0:
        y = a * math.log(math.tan(math.pi / 4 + phi / 2))
    else:
        e = math.sqrt(2 / inv_f - 1 / (inv_f * inv_f))
        es = e * math.sin(phi)
        y = a * math.log(math.tan(math.pi / 4 + phi / 2)
                         * ((1 - es) / (1 + es)) ** (e / 2))
    return x, y


def iris_info(path):
    with open(path, "rb") as f:
        hdr = f.read(640)
    if len(hdr) < 640:
        raise ValueError("IRIS header truncated")
    i4 = lambda off: int(np.frombuffer(hdr, "<i4", 1, off)[0])
    u4 = lambda off: int(np.frombuffer(hdr, "<u4", 1, off)[0])
    u2 = lambda off: int(np.frombuffer(hdr, "<u2", 1, off)[0])
    w, h = i4(112), i4(116)
    if w <= 0 or h <= 0:
        raise ValueError("bad IRIS dimensions")
    nbands = max(1, i4(120))
    dtype_code = u2(142)
    proj_code = hdr[158]
    # geo block (ingest header at +332)
    bang = 360.0 / 0xFFFFFFFF
    info = {
        "w": w, "h": h, "bands": nbands,
        "product_code": u2(24), "dtype_code": dtype_code,
        "projection_code": proj_code,
        "scale_x": i4(100) / 100.0, "scale_y": i4(104) / 100.0,
        "radar_loc_x": i4(124) / 1000.0,
        "radar_loc_y": i4(128) / 1000.0,
        "center_lat": u4(440) * bang, "center_lon": u4(444) * bang,
        "eq_radius": u4(552) / 100.0,
        "inv_flattening": u4(556) / 1e6,
        "ref_lat": u4(572) * bang, "ref_lon": u4(576) * bang,
    }
    return info


def _iris_geotransform(info):
    if info["projection_code"] != 1:        # Mercator only
        return None
    a = info["eq_radius"]
    inv_f = info["inv_flattening"]
    if a == 0.0:
        a, inv_f = 6371000.0, 0.0
    f = 1.0 / inv_f if inv_f else 0.0
    b = a * (1.0 - f)
    sx, sy = info["scale_x"], info["scale_y"]
    if sx <= 0 or sy <= 0 or sx >= b or sy >= b:
        return None
    clat, clon = info["center_lat"], info["center_lon"]
    lon_e, _lat_e = _vincenty_direct(clat, clon, 90.0, sx, a, b, f)
    _lon_n, lat_n = _vincenty_direct(clat, clon, 0.0, sy, a, b, f)
    x0, y0 = _merc_fwd(clat, clon, info["ref_lon"], a, inv_f)
    x2, _ = _merc_fwd(clat, lon_e, info["ref_lon"], a, inv_f)
    _, y2 = _merc_fwd(lat_n, clon, info["ref_lon"], a, inv_f)
    dx, dy = x2 - x0, y2 - y0
    return (x0 - info["radar_loc_x"] * dx, dx, 0.0,
            y0 + info["radar_loc_y"] * dy, 0.0, -dy)


def read_iris(path):
    """IRIS product → ``(array [bands, h, w] float32,
    geotransform | None, nodata)`` — rows flipped to north-first."""
    info = iris_info(path)
    w, h, nb = info["w"], info["h"], info["bands"]
    dtc = info["dtype_code"]
    with open(path, "rb") as f:
        f.seek(640)
        data = f.read()
    if dtc in (1, 2):                       # dBT / dBZ, 1 byte
        raw = np.frombuffer(data, np.uint8, count=w * h * nb)
        vals = (raw.astype(np.float32) - 64.0) / 2.0
        vals[vals == 95.5] = _NODATA
    elif dtc in (8, 9):                     # dBT2 / dBZ2, 2 bytes
        raw = np.frombuffer(data, "<u2", count=w * h * nb)
        vals = (raw.astype(np.float32) - 32768.0) / 100.0
        vals[vals == np.float32(327.67)] = _NODATA
    else:
        raise NotImplementedError(
            f"IRIS data type code {dtc} (fixture surface is "
            "dBT/dBZ/dBT2/dBZ2)")
    bands = vals.reshape(nb, h, w)[:, ::-1, :]
    return (np.ascontiguousarray(bands),
            _iris_geotransform(info), _NODATA)
