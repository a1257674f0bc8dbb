"""Parity tests against REFERENCE-PUBLISHED golden values.

Every expected number/raster in this module is published by the reference
repo itself (checksums hardcoded in ``autotest/gcore/tiff_read.py:44-76``,
``autotest/alg/rasterize.py:70``; golden warp rasters shipped as
``autotest/alg/data/utmsmall_*.tif(f)`` with tolerance maxdiff ≤ 1 per
``autotest/alg/warp.py:41-48``).  None of these expectations were derived
from this repo's own code — they are independent oracles for the TIFF
reader, the GDAL checksum, all five point resampling kernels (up- and
down-sampling), the eight area reducers, and the rasterizer.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from raydal.io.tiff import read_tiff
from raydal.kernels.checksum import checksum
from raydal.kernels.resample import (block_reduce, copy_words_cast,
                                     resample_grid)
from raydal.ops.rasterize import burn_line_bresenham, fill_polygon_even_odd

GCORE = "/root/reference/autotest/gcore/data/"
ALG = "/root/reference/autotest/alg/data/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GCORE), reason="reference fixtures not present")


def _tiff(path):
    with open(path, "rb") as f:
        return read_tiff(f.read())


# ---- TIFF reader + GDALChecksumImage vs autotest/gcore/tiff_read.py ----

TIFF_CHECKSUMS = [
    # (filename, band, published checksum) — tiff_read.py init_list
    ("byte.tif", 1, 4672),
    ("int16.tif", 1, 4672),
    ("uint16.tif", 1, 4672),
    ("int32.tif", 1, 4672),
    ("uint32.tif", 1, 4672),
    ("float16.tif", 1, 4672),
    ("float32.tif", 1, 4672),
    ("float64.tif", 1, 4672),
    ("contig_strip.tif", 2, 15234),
    ("seperate_strip.tif", 2, 15234),
    ("contig_tiled.tif", 2, 15234),
    ("separate_tiled.tif", 2, 15234),
    ("empty1bit.tif", 1, 0),
    ("gtiff/float32_lzw_predictor_3_big_endian.tif", 1, 4672),
]


@pytest.mark.parametrize("fn,band,expected", TIFF_CHECKSUMS,
                         ids=[t[0] for t in TIFF_CHECKSUMS])
def test_tiff_checksum_parity(fn, band, expected):
    img = _tiff(GCORE + fn)
    assert checksum(img.bands[band - 1]) == expected


def test_tiff_geotransform():
    # byte.tif GT is published all over autotest (e.g. gcore/tiff_read.py)
    img = _tiff(GCORE + "byte.tif")
    assert img.geotransform == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert (img.width, img.height) == (20, 20)


# ---- Warp kernels vs autotest/alg golden rasters (maxdiff ≤ 1) ----

SRC_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def _warp_affine(src, dst_w, dst_h, dst_gt, resample, dtype=np.uint8, **kw):
    jj, ii = np.meshgrid(np.arange(dst_h), np.arange(dst_w), indexing="ij")
    gx = dst_gt[0] + (ii + 0.5) * dst_gt[1]
    gy = dst_gt[3] + (jj + 0.5) * dst_gt[5]
    sx = (gx - SRC_GT[0]) / SRC_GT[1]
    sy = (gy - SRC_GT[3]) / SRC_GT[5]
    vals, _ = resample_grid(src, sx, sy, resample=resample, **kw)
    return copy_words_cast(vals, dtype)


@pytest.fixture(scope="module")
def utmsmall():
    return _tiff(GCORE + "utmsmall.tif").bands[0]


UPSAMPLE_GOLDENS = [  # autotest/alg/warp.py test_warp_1..6
    ("utmsmall_near.tiff", "near"),
    ("utmsmall_blinear.tiff", "bilinear"),
    ("utmsmall_cubic.tiff", "cubic"),
    ("utmsmall_cubicspline.tiff", "cubicspline"),
    ("utmsmall_lanczos.tiff", "lanczos"),
]


@pytest.mark.parametrize("fn,alg", UPSAMPLE_GOLDENS,
                         ids=[t[1] for t in UPSAMPLE_GOLDENS])
def test_warp_upsample_golden(utmsmall, fn, alg):
    ref = _tiff(ALG + fn).bands[0]
    mine = _warp_affine(utmsmall, 500, 500, (440720, 10, 0, 3751320, 0, -10),
                        alg, gdal_edges=True)
    assert int(np.abs(mine.astype(int) - ref.astype(int)).max()) <= 1


DOWNSAMPLE_GOLDENS = [  # autotest/alg/warp.py test_warp_*_downsize
    ("utmsmall_bilinear_2.tif", "bilinear", 50, 50, 0.5, 0.5, -120),
    ("utmsmall_cubic_2.tif", "cubic", 50, 50, 0.5, 0.5, -120),
    ("utmsmall_cubicspline_2.tif", "cubicspline", 50, 50, 0.5, 0.5, -120),
    ("utmsmall_lanczos_2.tif", "lanczos", 50, 50, 0.5, 0.5, -120),
    ("utmsmall_lanczos_50_75.tif", "lanczos", 50, 75, 0.5, 0.75, -80),
]


@pytest.mark.parametrize("fn,alg,w,h,xs,ys,gy", DOWNSAMPLE_GOLDENS,
                         ids=[t[0] for t in DOWNSAMPLE_GOLDENS])
def test_warp_downsample_golden(utmsmall, fn, alg, w, h, xs, ys, gy):
    ref = _tiff(ALG + fn).bands[0]
    mine = _warp_affine(utmsmall, w, h, (440720, 120, 0, 3751320, 0, gy),
                        alg, gdal_edges=True, xscale=xs, yscale=ys)
    assert int(np.abs(mine.astype(int) - ref.astype(int)).max()) <= 1


AREA_GOLDENS = [  # autotest/alg/warp.py average/mode/min/max/med/q1/q3
    ("utmsmall_average.tiff", "average"),
    ("utmsmall_mode.tiff", "mode"),
    ("utmsmall_min.tif", "min"),
    ("utmsmall_max.tif", "max"),
    ("utmsmall_med.tif", "med"),
    ("utmsmall_Q1.tif", "q1"),
    ("utmsmall_Q3.tif", "q3"),
]


@pytest.mark.parametrize("fn,how", AREA_GOLDENS,
                         ids=[t[1] for t in AREA_GOLDENS])
def test_warp_area_reducer_golden(utmsmall, fn, how):
    ref = _tiff(ALG + fn).bands[0]
    mine = copy_words_cast(block_reduce(utmsmall, 2, 2, how=how), np.uint8)
    assert int(np.abs(mine.astype(int) - ref.astype(int)).max()) <= 1


INT16_NEG_GOLDENS = [  # negative-value semantics (floor(v+0.5) cast)
    ("utmsmall-int16-neg_min.tif", "min"),
    ("utmsmall-int16-neg_max.tif", "max"),
    ("utmsmall-int16-neg_med.tif", "med"),
    ("utmsmall-int16-neg_Q1.tif", "q1"),
    ("utmsmall-int16-neg_Q3.tif", "q3"),
    ("utmsmall-int16-neg_mode.tiff", "mode"),
]


@pytest.mark.parametrize("fn,how", INT16_NEG_GOLDENS,
                         ids=[t[1] for t in INT16_NEG_GOLDENS])
def test_warp_area_reducer_int16_negative(fn, how):
    neg = _tiff(ALG + "utmsmall-int16-neg.tiff").bands[0]
    ref = _tiff(ALG + fn).bands[0]
    mine = copy_words_cast(block_reduce(neg, 2, 2, how=how), np.int16)
    assert int(np.abs(mine.astype(int) - ref.astype(int)).max()) == 0


# ---- JPEG decode vs autotest/gdrivers/jpeg.py published checksums ----

JPEG_DIR = "/root/reference/autotest/gdrivers/data/jpeg/"


def test_jpeg_albania_checksum():
    """Real-world 4:2:0 baseline JPEG: band 2 checksum must equal the
    published libjpeg-6b expectation 17016 (autotest/gdrivers/jpeg.py:48).
    Exercises Huffman decode, islow IDCT, h2v2 fancy upsampling and the
    integer YCbCr->RGB conversion bit-exactly."""
    from raydal.io.jpeg import decode_jpeg
    with open(JPEG_DIR + "albania.jpg", "rb") as f:
        img = decode_jpeg(f.read())
    assert img.shape == (260, 361, 3)
    assert checksum(img[:, :, 1]) == 17016


def test_jpeg_cmyk_checksums():
    """4-component Adobe CMYK raw read (autotest/gdrivers/jpeg.py:308-356:
    21187/21054/21499/21069) and the driver's CMYK->RGB conversion
    (C*K/255, jpgdataset.cpp:1494-1496; jpeg.py:263-291:
    20385/20865/19441)."""
    from raydal.io.jpeg import decode_jpeg
    with open(JPEG_DIR + "rgb_ntf_cmyk.jpg", "rb") as f:
        img = decode_jpeg(f.read())
    assert [checksum(img[:, :, b]) for b in range(4)] == \
        [21187, 21054, 21499, 21069]
    rgb = (img.astype(np.int32)[:, :, :3] * img.astype(np.int32)[:, :, 3:4]
           ) // 255
    assert [checksum(rgb[:, :, b].astype(np.uint8)) for b in range(3)] == \
        [20385, 20865, 19441]


def test_jpeg_roundtrip_psnr():
    from raydal.io.jpeg import decode_jpeg, encode_jpeg
    from raydal.kernels.resample import psnr
    x = np.linspace(0, 4 * np.pi, 96)
    y = np.linspace(0, 3 * np.pi, 64)
    g = np.sin(y)[:, None] * np.cos(x)[None, :] * 100 + 128
    base = np.stack([g, g * 0.8 + 20, 255 - g], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(base, quality=95))  # codec default
    assert psnr(base, dec) >= 40.0
    dec444 = decode_jpeg(encode_jpeg(base, quality=85, subsample="444"))
    assert psnr(base, dec444) >= 40.0
    gray = base[:, :, 0]
    dg = decode_jpeg(encode_jpeg(gray, quality=90))
    assert dg.shape == gray.shape
    assert psnr(gray, dg) >= 40.0


# ---- Rasterize vs autotest/alg/rasterize.py test_rasterize_1 ----

def test_rasterize_published_checksum():
    """100x100 byte raster, GT (1000,1,0,1100,0,-1); polygon
    POLYGON((1020 1030,1020 1045,1050 1045,1050 1030)) + linestring
    LINESTRING(1000 1000, 1100 1050) burned at 220 must checksum 6452
    (autotest/alg/rasterize.py:70)."""
    def to_px(coords):
        return [(x - 1000.0, 1100.0 - y) for x, y in coords]

    out = np.zeros((100, 100))
    poly = to_px([(1020, 1030), (1020, 1045), (1050, 1045), (1050, 1030),
                  (1020, 1030)])
    fill_polygon_even_odd([poly], 100, 100, out=out, value=220)
    burn_line_bresenham(out, to_px([(1000, 1000), (1100, 1050)]), value=220)
    assert checksum(copy_words_cast(out, np.uint8)) == 6452


def test_tiff_writer_roundtrip():
    """write_tiff → read_tiff round-trip preserves pixels, dtype, and
    geotransform; the reference byte.tif content keeps its published
    checksum 4672 through the round-trip."""
    from raydal.io.tiff import read_tiff, write_tiff
    ref = _tiff(GCORE + "byte.tif")
    blob = write_tiff(ref.bands[0], geotransform=ref.geotransform,
                      compression="deflate")
    back = read_tiff(blob)
    assert checksum(back.bands[0]) == 4672
    assert back.geotransform == ref.geotransform
    rng = np.random.default_rng(3)
    b1 = rng.uniform(-5, 5, (13, 17)).astype(np.float32)
    b2 = rng.uniform(0, 1, (13, 17)).astype(np.float32)
    back = read_tiff(write_tiff([b1, b2]))
    assert np.allclose(back.bands[0], b1)
    assert np.allclose(back.bands[1], b2)
    a = rng.integers(-300, 300, (9, 11)).astype(np.int16)
    assert (read_tiff(write_tiff(a)).bands[0] == a).all()


# ---- gdaldem vs autotest/utilities/test_gdaldem_lib.py checksums ----

N43 = "/root/reference/autotest/gdrivers/data/n43.tif"


@pytest.fixture(scope="module")
def n43():
    return _tiff(N43)


def test_hillshade_published_checksum(n43):
    """gdaldem hillshade n43.tif -z 30 -s 111120 → checksum 45587
    (test_gdaldem_lib.py:50-66)."""
    from raydal.ops.raster_math import hillshade_gdal
    hs = hillshade_gdal(n43.bands[0], n43.geotransform, z_factor=30,
                        xscale=111120, yscale=111120)
    assert checksum(hs) == 45587


def test_hillshade_combined_published_checksum(n43):
    """gdaldem hillshade -combined → 43876 (test_gdaldem_lib.py:240-258)."""
    from raydal.ops.raster_math import hillshade_gdal_combined
    hs = hillshade_gdal_combined(n43.bands[0], n43.geotransform,
                                 z_factor=30, xscale=111120, yscale=111120)
    assert checksum(hs) == 43876


def test_hillshade_zevenbergen_thorne_published_checksum(n43):
    """gdaldem hillshade -alg ZevenbergenThorne → 46544
    (test_gdaldem_lib.py:277-295)."""
    from raydal.ops.raster_math import hillshade_gdal
    hs = hillshade_gdal(n43.bands[0], n43.geotransform, z_factor=30,
                        xscale=111120, yscale=111120,
                        alg="zevenbergen_thorne")
    assert checksum(hs) == 46544


def test_color_relief_published_checksums(n43):
    """gdaldem color-relief with the published color_file.txt →
    band checksums 55066/37594/47768 (test_gdaldem_lib.py:543-554)."""
    from raydal.ops.color import color_relief_gdal
    entries = [(500, 255, 255, 255), (450, 235, 220, 175),
               (300, 190, 185, 135), (150, 240, 250, 150),
               (76, 50, 180, 50), (75, 200, 230, 255),
               (-32768, 200, 230, 255)]
    rgb = color_relief_gdal(n43.bands[0], entries)
    assert [checksum(rgb[:, :, c]) for c in range(3)] == \
        [55066, 37594, 47768]


# ---- PNG vs autotest/gdrivers/png.py + cross-format validation ----

def test_png_paletted_published_checksum():
    """Paletted PNG read: band 1 = palette indices, published checksum
    57921 (autotest/gdrivers/png.py:34-41, test.png)."""
    from raydal.io.png import decode_png
    with open("/root/reference/autotest/gdrivers/data/png/test.png",
              "rb") as f:
        img = decode_png(f.read())
    assert img.ndim == 2
    assert checksum(img) == 57921


def test_png_roundtrip_byte_checksum():
    """byte.tif pixels → PNG encode → decode keeps checksum 4672 (the
    png.py:207 lossless-copy expectation)."""
    from raydal.io.png import decode_png, encode_png
    ref = _tiff(GCORE + "byte.tif")
    assert checksum(decode_png(encode_png(ref.bands[0]))) == 4672


def test_png_adam7_matches_tiff_copy():
    """Interlaced (Adam7) RGBA PNG decodes pixel-identical to the
    reference's independent TIFF copy of the same image — two separate
    decode paths (PNG deinterlace vs TIFF strips) cross-validate."""
    from raydal.io.png import decode_png
    png = decode_png(open(GCORE + "stefan_full_rgba.png", "rb").read())
    tif = _tiff(GCORE + "stefan_full_rgba.tif")
    assert png.shape == (150, 162, 4)
    for c in range(4):
        np.testing.assert_array_equal(png[:, :, c], tif.bands[c])
    assert [checksum(png[:, :, c]) for c in range(4)] == \
        [12603, 58561, 36064, 10807]


# ---- Contour vs autotest/alg/contour.py published envelopes ----

def test_contour_published_envelopes():
    """The reference's test_contour_1 fixture (160x160 stepped squares,
    interval 10): contour envelopes at levels 10 and 20 must match the
    published expected_envelopes within precision/2 (contour.py:99-123).
    """
    from raydal.ops.contour import chain_segments, contour_segments
    size = 160
    precision = 1.0 / size
    a = np.full((size, size), 1.0)
    a[40:120, 40:120] = 10.0
    a[60:100, 60:100] = 20.0
    a[70:90, 70:90] = 25.0
    expected = {10: [1.25, 1.75, 49.25, 49.75],
                20: [1.375, 1.625, 49.375, 49.625]}
    tol = precision / 2 * 1.001
    for lvl, env_exp in expected.items():
        rings = chain_segments(contour_segments(a, lvl))
        pts = np.concatenate([np.asarray(r) for r in rings])
        wx = 1 + (pts[:, 0] + 0.5) * precision
        wy = 50 - (pts[:, 1] + 0.5) * precision
        env = [wx.min(), wx.max(), wy.min(), wy.max()]
        for j in range(4):
            assert abs(env[j] - env_exp[j]) <= tol


def test_rasterize_all_touched_published_checksum():
    """autotest/alg/rasterize.py test_rasterize_2: 12x12 raster, three
    cutline.csv polygons, ALL_TOUCHED=TRUE, burn 220 → checksum 121."""
    from raydal.ops.rasterize import (burn_line_all_touched,
                                      fill_polygon_even_odd)
    polys = [
        [(6.25, 1.25), (7.25, 1.25), (7.25, 2.25), (6.25, 2.25),
         (6.25, 1.25)],
        [(4.25, 4.25), (6.25, 4.25), (6.25, 6.25), (4.25, 6.25),
         (4.25, 4.25)],
        [(1.001, 1.001), (3.999, 3.999), (3.2, 1.6), (1.001, 1.001)],
    ]
    out = np.zeros((12, 12))
    for p in polys:
        px = [(x, 12 - y) for x, y in p]
        fill_polygon_even_odd([px], 12, 12, out=out, value=220)
        burn_line_all_touched(out, px, value=220)
    assert checksum(copy_words_cast(out, np.uint8)) == 121


def test_rasterize_attribute_published_checksum():
    """autotest/alg/rasterize.py test_rasterize_4: per-feature attribute
    burn over slanted polygons (one with a hole) + two linestrings →
    checksum 16265.  Exercises the floor(x+0.5) scanline rounding at
    non-integer intersections."""
    from raydal.ops.rasterize import (burn_line_bresenham,
                                      fill_polygon_even_odd)

    def to_px(coords):
        return [(x - 1000.0, 1100.0 - y) for x, y in coords]

    out = np.zeros((100, 100))
    polys = [
        ([(1020, 1030), (1020, 1045), (1050, 1045), (1050, 1030),
          (1020, 1030)], None, 50),
        ([(1010, 1046), (1015, 1055), (1055, 1060), (1054, 1048),
          (1010, 1046)], None, 255),
        ([(1020, 1076), (1025, 1085), (1065, 1090), (1064, 1078),
          (1020, 1076)],
         [(1023, 1079), (1061, 1081), (1062, 1087), (1028, 1082),
          (1023, 1079)], 60),
    ]
    lines = [([(1005, 1000), (1100, 1050)], 100),
             ([(1000, 1000), (1095, 1050), (1080, 1080)], 180)]
    for outer, hole, v in polys:
        rings = [to_px(outer)] + ([to_px(hole)] if hole else [])
        fill_polygon_even_odd(rings, 100, 100, out=out, value=v)
    for coords, v in lines:
        burn_line_bresenham(out, to_px(coords), value=v)
    assert checksum(copy_words_cast(out, np.uint8)) == 16265


def test_dem_scalar_published_checksums(n43):
    """gdaldem tpi/tri(Riley,Wilson)/roughness/slope-ZT/aspect-ZT on
    n43.tif all match the published checksums
    (test_gdaldem_lib.py: 60504/41233/61143/38624/64393/50539)."""
    from raydal.ops.raster_math import (aspect_gdal, roughness_gdal,
                                        slope_gdal, tpi_gdal, tri_gdal)
    z, gt = n43.bands[0], n43.geotransform
    assert checksum(tpi_gdal(z)) == 60504
    assert checksum(tri_gdal(z, "riley")) == 41233
    assert checksum(tri_gdal(z, "wilson")) == 61143
    assert checksum(roughness_gdal(z)) == 38624
    assert checksum(slope_gdal(z, gt, xscale=111120, yscale=111120,
                               alg="zevenbergen_thorne")) == 64393
    assert checksum(aspect_gdal(z, alg="zevenbergen_thorne")) == 50539


def test_hillshade_multidirectional_published_checksum(n43):
    """gdaldem hillshade -multidirectional -compute_edges -z 30
    -s 111120 → published checksum 51784 (test_gdaldem_lib.py:440-456);
    exercises the exact compute_edges window extrapolation rules."""
    from raydal.ops.raster_math import hillshade_multidirectional
    hs = hillshade_multidirectional(n43.bands[0], n43.geotransform,
                                    z_factor=30, xscale=111120,
                                    yscale=111120)
    assert checksum(hs) == 51784


# ---- Shapefile reader vs autotest/ogr/ogr_shape.py expectations ----

def test_shapefile_poly_published_expectations():
    """poly.shp: 10 features; eas_id < 170 in file order yields the
    published [168, 169, 166, 158, 165] (ogr_shape.py:99-102); the
    distinct set matches :159-162; the DBF AREA attribute agrees with
    the shoelace area of every decoded geometry."""
    from raydal.geo.wkb import polygon_area, polygons_from_wkb
    from raydal.io.shapefile import read_shapefile
    t = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
    assert t.num_rows == 10
    eas = list(np.asarray(t["EAS_ID"]))
    assert [v for v in eas if v < 170] == [168, 169, 166, 158, 165]
    assert sorted(set(eas), reverse=True) == \
        [179, 173, 172, 171, 170, 169, 168, 166, 165, 158]
    areas = np.asarray(t["AREA"])
    for i in range(t.num_rows):
        polys = polygons_from_wkb(t["wkb"][i].as_py())
        a = sum(polygon_area(p) for p in polys)
        # one fixture row stores a negative AREA; compare magnitudes
        assert a == pytest.approx(abs(float(areas[i])), rel=1e-6)


def test_shapefile_other_fixtures_parse():
    from raydal.io.shapefile import read_shapefile
    t = read_shapefile(
        "/root/reference/autotest/ogr/data/shp/testpoly.shp")
    assert t.num_rows == 14
    t2 = read_shapefile(
        "/root/reference/autotest/ogr/data/shp/CoHI_GCS12.shp")
    assert t2.num_rows == 4 and "atlas_name" in t2.column_names


def test_tiff_overview_chain_published_checksums():
    """Multi-IFD (COG-style) TIFF: byte_with_ovr.tif's base + two
    overview levels match the published checksums 4672/1087/328
    (autotest/gcore/libertiff.py:125-131)."""
    from raydal.io.tiff import read_tiff_overviews
    with open(GCORE + "byte_with_ovr.tif", "rb") as f:
        imgs = read_tiff_overviews(f.read())
    assert [(im.width, im.height) for im in imgs] == \
        [(20, 20), (10, 10), (5, 5)]
    assert [checksum(im.bands[0]) for im in imgs] == [4672, 1087, 328]


# ---- Band statistics vs published expectations ----

def test_band_statistics_published_values():
    """ComputeStatistics parity on reference-published numbers:
    byte.tif STAC stats (74/255/126.765/22.928,
    test_gdalinfo.py:998-1003), small_world.tif band 1 exact floats
    with and without nodata 0 (gdal_stats.py:503-520, rel 1e-10 — the
    reference's own tolerance), and minfloat.tif nodata-excluded stats
    [-3, 5, 1, 4] (gdal_stats.py:118-136)."""
    from raydal.ops.raster_math import stats_final, stats_partial

    def stats(vals):
        s = stats_final(stats_partial(np.asarray(vals, dtype=np.float64)))
        return [s["min"], s["max"], s["mean"], s["std"]]

    b = _tiff(GCORE + "byte.tif").bands[0]
    got = stats(b)
    assert got[0] == 74.0 and got[1] == 255.0
    assert round(got[2], 3) == 126.765
    assert round(got[3], 3) == 22.928

    sw = _tiff("/root/reference/autotest/gdrivers/data/small_world.tif")
    b1 = sw.bands[0].astype(np.float64)
    assert stats(b1) == pytest.approx(
        [0.0, 255.0, 50.22115, 67.119029288849973], rel=1e-10)
    assert stats(b1[b1 != 0]) == pytest.approx(
        [1.0, 255.0, 50.311081057390084, 67.14541389488096], rel=1e-10)

    mf = _tiff(GCORE + "minfloat.tif").bands[0]
    nodata = np.float32(-3.4028234663852886e38)
    assert stats(mf[mf != nodata].astype(np.float64)) == \
        pytest.approx([-3.0, 5.0, 1.0, 4.0])


def test_cog_writer_roundtrip_published_checksums():
    """COG writer (frmts/gtiff/cogdriver.cpp layout: tiled IFDs,
    NewSubfileType=1 overviews, smallest-overview-first tile data):
    byte.tif → COG with auto NEAREST overviews → re-read through our
    own multi-IFD reader reproduces the reference-published checksum
    chain 4672/1087/328 (autotest/gcore/libertiff.py:125-131), and the
    geotransform survives."""
    from raydal.io.tiff import read_tiff, read_tiff_overviews, write_cog

    base = read_tiff(open(GCORE + "byte.tif", "rb").read())
    cog = write_cog(base.bands, geotransform=base.geotransform,
                    blocksize=8, compression="deflate")
    imgs = read_tiff_overviews(cog)
    assert [(im.width, im.height) for im in imgs] == \
        [(20, 20), (10, 10), (5, 5)]
    assert [checksum(im.bands[0]) for im in imgs] == [4672, 1087, 328]
    assert imgs[0].geotransform == base.geotransform
    # overview IFDs are tagged reduced-resolution; base is not
    assert imgs[1].tags.get("new_subfile_type") in (1, [1], (1,), None)


def test_cog_writer_multiband_exact():
    from raydal.io.tiff import read_tiff_overviews, write_cog

    rng = np.random.default_rng(3)
    b3 = [rng.random((70, 53)).astype(np.float32) for _ in range(3)]
    cog = write_cog(b3, blocksize=32)
    imgs = read_tiff_overviews(cog)
    assert [(im.width, im.height) for im in imgs] == [(53, 70), (27, 35)]
    for i in range(3):
        assert (imgs[0].bands[i] == b3[i]).all()
        assert (imgs[1].bands[i] == b3[i][::2, ::2]).all()


def test_bigtiff_published_strip_offsets():
    """BigTIFF + classic strip-offset datatype matrix
    (autotest/gcore/tiff_read.py:3819-3846 published offsets) and the
    BigTIFF byte raster checksum (":1227-1235", cs 4672)."""
    from raydal.io.tiff import read_tiff

    cases = [
        ("classictiff_one_block_long.tif", [158]),
        ("classictiff_one_block_be_long.tif", [158]),
        ("classictiff_one_strip_long.tif", [146]),
        ("classictiff_one_strip_be_long.tif", [146]),
        ("classictiff_two_strip_short.tif", [162, 163]),
        ("classictiff_four_strip_short.tif", [178, 179, 180, 181]),
        ("bigtiff_four_strip_short.tif", [316, 317, 318, 319]),
        ("bigtiff_four_strip_be_short.tif", [316, 317, 318, 319]),
        ("bigtiff_one_block_long8.tif", [272]),
        ("bigtiff_one_block_be_long8.tif", [272]),
        ("bigtiff_one_strip_long.tif", [252]),
        ("bigtiff_one_strip_be_long.tif", [252]),
        ("bigtiff_one_strip_long8.tif", [252]),
        ("bigtiff_one_strip_be_long8.tif", [252]),
        ("bigtiff_two_strip_long.tif", [284, 285]),
        ("bigtiff_two_strip_be_long.tif", [284, 285]),
        ("bigtiff_two_strip_long8.tif", [284, 285]),
        ("bigtiff_two_strip_be_long8.tif", [284, 285]),
    ]
    for name, exp in cases:
        im = read_tiff(open(GCORE + name, "rb").read())
        offs = im.tags.get("strip_offsets") or im.tags.get("tile_offsets")
        assert list(offs) == exp, name
    im = read_tiff(open(GCORE + "byte_bigtiff_strip5lines.tif",
                        "rb").read())
    assert checksum(im.bands[0]) == 4672


# ---- Cutline masking vs autotest/alg/cutline.py published checksums ----

TRIANGLE = [np.array([[10, 10], [10, 50], [60, 50], [10, 10]], float)]
MULTIPOLY = TRIANGLE + [
    np.array([[70, 70], [70, 100], [100, 100], [100, 70], [70, 70]], float),
    np.array([[80, 80], [80, 90], [90, 90], [90, 80], [80, 80]], float),
]


@pytest.mark.parametrize("rings,blend,expected", [
    (TRIANGLE, 0.0, 11409),    # test_cutline_1 (cutline_noblend.vrt)
    (TRIANGLE, 5.0, 21395),    # test_cutline_2 (cutline_blend.vrt)
    (MULTIPOLY, 0.0, 20827),   # test_cutline_3 (cutline_multipolygon.vrt)
], ids=["noblend", "blend5", "multipolygon"])
def test_cutline_golden(utmsmall, rings, blend, expected):
    """Identity warp of utmsmall.tif through a cutline: the three VRTs in
    autotest/alg/data/cutline_*.vrt warp utmsmall onto its own grid with
    INIT_DEST=0, so the output equals the source blended against 0 by the
    cutline density mask; autotest/alg/cutline.py pins the checksums."""
    from raydal.ops.cutline import apply_cutline, cutline_density_mask

    mask = cutline_density_mask(rings, 100, 100, blend_dist=blend)
    out = apply_cutline(utmsmall, mask, init=0.0)
    assert checksum(out) == expected


# ---- Sieve vs autotest/alg/sieve.py published checksums ----

from raydal.io.aaigrid import read_aaigrid  # noqa: E402


@pytest.mark.parametrize("fn,threshold,conn,expected", [
    ("sieve_src.grd", 2, 4, 364),     # test_sieve_1
    ("sieve_src.grd", 2, 8, 370),     # test_sieve_2
    ("unmergable.grd", 2, 8, 451),    # test_sieve_3 (unmergeable stays)
    ("sieve_2634.grd", 2, 4, 98),     # test_sieve_4 (bug 2634)
], ids=["4conn", "8conn", "unmergable", "bug2634"])
def test_sieve_golden(fn, threshold, conn, expected):
    from raydal.ops.fill import sieve

    arr, gt, nd = read_aaigrid(ALG + fn)
    assert checksum(sieve(arr.astype(np.uint8), threshold, conn)) == expected


# ---- Polygonize vs autotest/alg/polygonize.py published expectations ----

def _cycle(pts):
    """Canonicalize a closed ring: drop collinear vertices, allow either
    rotation/orientation."""
    p = np.asarray(pts, dtype=np.float64)
    if np.array_equal(p[0], p[-1]):
        p = p[:-1]
    keep = []
    n = len(p)
    for i in range(n):
        a, b, c = p[i - 1], p[i], p[(i + 1) % n]
        if abs((b[0] - a[0]) * (c[1] - a[1])
               - (b[1] - a[1]) * (c[0] - a[0])) > 1e-9:
            keep.append(tuple(p[i]))
    best = min(range(len(keep)),
               key=lambda i: keep[i:] + keep[:i])
    fwd = tuple(keep[best:] + keep[:best])
    rev = tuple(reversed(fwd))
    besr = min(range(len(rev)), key=lambda i: rev[i:] + rev[:i])
    rev = tuple(list(rev[besr:]) + list(rev[:besr]))
    return min(fwd, rev)


def test_polygonize_golden_counts_and_values():
    from raydal.ops.polygonize import polygonize_array

    arr, gt, nd = read_aaigrid(ALG + "polygonize_in.grd")
    # test_polygonize_1: masked (nodata 132 excluded) → 13 features
    polys = polygonize_array(arr, gt=gt, connectivity=4, background=nd)
    assert len(polys) == 13
    assert sorted(int(p["value"]) for p in polys) == sorted(
        [107, 123, 115, 115, 140, 148, 123, 140, 100, 101, 102, 156, 103])
    # test_polygonize_2: unmasked → 17 features
    polys2 = polygonize_array(arr, gt=gt, connectivity=4, background=None)
    assert len(polys2) == 17
    # test_polygonize_3: complex looping fixture → 125 features
    arr2, gt2, nd2 = read_aaigrid(ALG + "polygonize_in_2.grd")
    assert len(polygonize_array(arr2, gt=gt2, connectivity=4,
                                background=None)) == 125


def test_polygonize_golden_geometry_156():
    """The published DN=156 geometry (polygonize.py:63-66): a square with
    one hole.  Outer ring compared as a canonical cycle (the reference
    emits corner-only vertices; ours densifies along edges)."""
    from raydal.ops.polygonize import polygonize_array

    arr, gt, nd = read_aaigrid(ALG + "polygonize_in.grd")
    polys = polygonize_array(arr, gt=gt, connectivity=4, background=nd)
    p = [q for q in polys if q["value"] == 156][0]
    expected_outer = [(440720, 3751200), (440720, 3751020),
                      (440900, 3751020), (440900, 3751200)]
    assert _cycle(p["ring"]) == _cycle(expected_outer)
    assert p["n_holes"] == 1
    assert p["n_pixels"] == 8


# ---- Proximity vs autotest/alg/proximity.py published checksums ----

def test_proximity_golden():
    from raydal.io.tiff import read_tiff
    from raydal.ops.fill import proximity

    img = read_tiff(open(ALG + "pat.tif", "rb").read())
    pat = img.bands[0]
    # test_proximity_1: defaults, Byte destination
    d = proximity(pat)
    out = copy_words_cast(np.minimum(d, 65535.0), np.uint8)
    assert checksum(out) == 1941
    # test_proximity_2: VALUES + MAXDIST + NODATA=-1 + FIXED_BUF_VAL=255
    d2 = proximity(pat, target_values=[65, 64], max_dist=12, nodata=-1.0,
                   fixed_buf_val=255)
    assert checksum(d2.astype(np.float32)) == 3256
    # test_proximity_3: USE_INPUT_NODATA=YES (pat nodata 255), NODATA=0
    assert img.nodata == 255.0
    d3 = proximity(pat, target_values=[65, 64], max_dist=12, nodata=0.0,
                   src_nodata=img.nodata)
    assert checksum(d3.astype(np.float32)) == 1465


# ---- FillNodata vs autotest/alg/fillnodata.py published grids ----

FILLNODATA_CASES = {
    "2x1": ([[1, 0]], 1, 0, [[1, 1]], 0),
    "3x1": ([[2, 0, 4]], 1, 0, [[2, 3, 4]], 0),
    "4x1": ([[2, 0, 0, 4]], 1, 0, [[2, 2, 4, 4]], 0),
    "1x3": ([[2], [0], [4]], 1, 0, [[2], [3], [4]], 0),
    "3x3_col": ([[2, 0, 4], [4, 0, 6], [6, 0, 8]], 1, 0,
                [[2, 3, 4], [4, 5, 6], [6, 7, 8]], 0),
    "3x3_line": ([[2, 3, 4], [0, 0, 0], [6, 7, 8]], 1, 0,
                 [[2, 3, 4], [4, 5, 6], [6, 7, 8]], 0),
    "3x3_cross": ([[2, 0, 4], [0, 0, 0], [6, 0, 8]], 1, 0,
                  [[2, 3, 4], [4, 0, 6], [6, 7, 8]], 0),
    "3x3_cross_1_5": ([[2, 0, 4], [0, 0, 0], [6, 0, 8]], 1.5, 0,
                      [[2, 3, 4], [4, 5, 6], [6, 7, 8]], 0),
    "4x4": ([[20, 30, 40, 50], [30, 0, 0, 60], [40, 0, 0, 70],
             [50, 60, 70, 80]], 1, 0,
            [[20, 30, 40, 50], [30, 30, 50, 60], [40, 50, 70, 70],
             [50, 60, 70, 80]], 0),
    "4x4_smooth_1": ([[20, 30, 40, 50], [30, 0, 0, 60], [40, 0, 0, 70],
                      [50, 60, 70, 80]], 1, 0,
                     [[20, 30, 40, 50], [30, 40, 50, 60],
                      [40, 50, 60, 70], [50, 60, 70, 80]], 1),
}


@pytest.mark.parametrize("name", sorted(FILLNODATA_CASES),
                         ids=sorted(FILLNODATA_CASES))
def test_fillnodata_golden(name):
    """Published grids from autotest/alg/fillnodata.py:37-123."""
    from raydal.ops.fill import fillnodata

    inp, max_dist, nd, expected, smooth = FILLNODATA_CASES[name]
    got = fillnodata(np.array(inp, dtype=np.float64), nodata=nd,
                     max_dist=max_dist, smoothing_iterations=smooth)
    np.testing.assert_array_equal(np.round(got).astype(int),
                                  np.array(expected))


def test_polygonize_golden_touching_holes():
    """test_polygonize_6 (autotest/alg/polygonize.py): two holes touching
    at a vertex stay separate holes of the enclosing polygon; published
    WKTs pin all three geometries."""
    from raydal.ops.polygonize import polygonize_array

    arr, gt, nd = read_aaigrid(ALG + "polygonize_in_4.grd")
    polys = polygonize_array(arr, gt=gt, connectivity=4, background=None)
    assert len(polys) == 3
    assert sorted(int(p["value"]) for p in polys) == [0, 0, 1]
    outer = [p for p in polys if p["value"] == 1][0]
    assert outer["n_holes"] == 2
    assert outer["n_pixels"] == 14
    holes = sorted([_cycle(p["ring"]) for p in polys if p["value"] == 0])
    # published: POLYGON ((2 3,2 2,3 2,3 3,2 3)) and ((1 2,1 1,2 1,2 2,1 2))
    expected = sorted([_cycle([(2, 3), (2, 2), (3, 2), (3, 3)]),
                       _cycle([(1, 2), (1, 1), (2, 1), (2, 2)])])
    assert holes == expected


# ---- GetHistogram vs autotest/gcore/histogram.py published counts ----

def test_histogram_golden(utmsmall):
    from raydal.ops.raster_math import gdal_histogram

    # test_histogram_2: 16 buckets over [-0.5, 255.5)
    assert gdal_histogram(utmsmall, -0.5, 255.5, 16).tolist() == \
        [10, 52, 115, 219, 371, 493, 825, 1077, 1279, 1302, 1127, 783,
         625, 462, 331, 929]
    # test_histogram_3/4: int32 grid with out-of-range values
    arr, gt, nd = read_aaigrid(GCORE + "int32_withneg.grd")
    assert gdal_histogram(arr, -100, 100, 21,
                          include_out_of_range=True).tolist() == \
        [0, 0, 0, 0, 0, 1, 0, 1, 1, 3, 3, 2, 0, 5, 3, 4, 0, 1, 1, 2, 3]
    assert gdal_histogram(arr, -100, 100, 21,
                          include_out_of_range=False).tolist() == \
        [0, 0, 0, 0, 0, 1, 0, 1, 1, 3, 3, 2, 0, 5, 3, 4, 0, 1, 1, 2, 0]


def test_png16_golden():
    """16-bit PNG decode vs published values: rgba16.png band 3/4
    checksums 1815/4873 (autotest/gdrivers/png.py:102-112) and the
    16-bit INTERLACED byte raster 4672 (:480-483)."""
    from raydal.io.png import decode_png

    D = "/root/reference/autotest/gdrivers/data/png/"
    px = decode_png(open(D + "rgba16.png", "rb").read())
    assert px.dtype == np.uint16 and px.shape == (20, 20, 4)
    assert checksum(px[:, :, 2]) == 1815
    assert checksum(px[:, :, 3]) == 4873
    px2 = decode_png(open(D + "uint16_interlaced.png", "rb").read())
    assert px2.dtype == np.uint16
    assert checksum(px2) == 4672


def test_interpolate_at_point_golden(utmsmall):
    """Published InterpolateAtPoint values on byte.tif
    (autotest/gcore/interpolateatpoint.py:28-66)."""
    from raydal.io.tiff import read_tiff
    from raydal.kernels.resample import interpolate_at_point as iap

    byte = read_tiff(open(GCORE + "byte.tif", "rb").read()).bands[0]
    assert iap(byte, 10, 12, "near") == pytest.approx(173, rel=1e-6)
    assert iap(byte, 10, 12, "bilinear") == pytest.approx(139.75, rel=1e-6)
    assert iap(byte, 10, 12, "cubicspline") == pytest.approx(138.02,
                                                             rel=1e-2)
    assert iap(byte, 10, 12, "cubic") == pytest.approx(145.57, rel=1e-2)
    # inclusive far edge (nearest nudges inside), exclusive past it
    assert iap(byte, 20, 20, "near") == pytest.approx(107.0)
    assert iap(byte, 18, 20, "near") == pytest.approx(99.0)
    assert iap(byte, 20, 18, "near") == pytest.approx(123.0)
    assert iap(byte, 20, 20, "bilinear") == pytest.approx(107.0)
    assert iap(byte, 1000, 12, "bilinear") is None
    assert iap(byte, -1, 0, "near") is None
    assert iap(byte, 0, -0.5, "near") is None


def test_rgbsmall_band_reorder_golden():
    """gdal_translate bandList=[3,2,1] parity on rgbsmall.tif
    (autotest/utilities/test_gdal_translate_lib.py:123-128): the
    reordered per-band checksums are published."""
    from raydal.io.tiff import read_tiff

    img = read_tiff(open(GCORE + "rgbsmall.tif", "rb").read())
    reordered = [img.bands[2], img.bands[1], img.bands[0]]
    assert [checksum(b) for b in reordered] == [21349, 21053, 21212]


def test_geometry_area_golden():
    """Published GetArea value (autotest/ogr/ogr_geom.py:53-67): a
    multipolygon with UNCLOSED rings (OGR treats rings as implicitly
    closed) measures 99.5."""
    from raydal.geo.wkb import wkb_area
    from raydal.io.wkt import wkt_to_wkb

    w = wkt_to_wkb("MULTIPOLYGON( ((0 0,1 1,1 0,0 0)),"
                   "((0 0,10 0, 10 10, 0 10),(1 1,1 2,2 2,2 1)) )")
    assert wkb_area(w) == pytest.approx(99.5, abs=1e-11)


def test_geometry_length_golden():
    """Published Length values (autotest/ogr/ogr_geom.py:1110-1140):
    multilinestring 2; mixed collection (polygon boundary counts) 8."""
    from raydal.geo.wkb import wkb_length
    from raydal.io.wkt import wkt_to_wkb

    assert wkb_length(wkt_to_wkb(
        "MULTILINESTRING((0 0,0 1),(0 0,0 1))")) == pytest.approx(2)
    gc = ("GEOMETRYCOLLECTION( POLYGON((0 0,0 1,1 1,1 0,0 0)), "
          "MULTILINESTRING((0 0,0 1),(0 0,0 1)), LINESTRING(0 0,0 1), "
          "LINESTRING(0 0,0 1), POINT(0 0), GEOMETRYCOLLECTION EMPTY )")
    assert wkb_length(wkt_to_wkb(gc)) == pytest.approx(8)


def test_transform_to_utm_golden():
    """Published TransformTo value (autotest/ogr/ogr_geom.py:625-638):
    POINT(2 49) EPSG:4326 → EPSG:32631 ≈ (426857, 5427937) within 1 m —
    pins the from-scratch Krueger UTM series."""
    from raydal.geo.crs import Transformer

    x, y = Transformer(4326, 32631).transform([2.0], [49.0])
    assert x[0] == pytest.approx(426857, abs=1)
    assert y[0] == pytest.approx(5427937, abs=1)


def test_nearblack_golden():
    """nearblack parity (autotest/utilities/test_nearblack_lib.py:35-39):
    rgbsmall with nearDist=15, maxNonBlack=0 → published per-band
    checksums (both reference algorithms agree on this fixture)."""
    from raydal.io.tiff import read_tiff
    from raydal.ops.raster_math import clean_collar

    img = read_tiff(open(GCORE + "rgbsmall.tif", "rb").read())
    rgb = np.stack(img.bands, axis=2)
    out, mask = clean_collar(rgb, threshold=15, color="black",
                             pixel_distance=0)
    assert [checksum(out[:, :, b]) for b in range(3)] == \
        [21106, 20736, 21309]


def test_footprint_golden():
    """gdal_footprint parity (test_gdal_footprint_lib.py:40-43): the
    footprint of all-valid byte.tif is the published extent rectangle
    MULTIPOLYGON (((440720 3751320,...,441920 3751320,...)))."""
    from raydal.io.tiff import read_tiff
    from raydal.ops.vector import raster_footprint

    img = read_tiff(open(GCORE + "byte.tif", "rb").read())
    rings = raster_footprint(np.ones((20, 20), bool), img.geotransform)
    assert len(rings) == 1
    expected = [(440720, 3751320), (440720, 3750120), (441920, 3750120),
                (441920, 3751320)]
    assert _cycle(rings[0]) == _cycle(expected)


class TestShapefileWriter:
    """write_shapefile → re-read parity (reference write path:
    ogr/ogrsf_frmts/shape/ogrshapelayer.cpp)."""

    def _round_trip(self, table):
        import tempfile

        from raydal.io.shapefile import read_shapefile, write_shapefile

        d = tempfile.mkdtemp()
        write_shapefile(table, os.path.join(d, "rt.shp"))
        return read_shapefile(os.path.join(d, "rt.shp"))

    def test_poly_shp_round_trip_published_counts(self):
        """Write→re-read of poly.shp reproduces the published eas_id
        ordering [168,169,166,158,165] (ogr_shape.py:99-102), per-
        feature bboxes, and every attribute bit-exactly."""
        from raydal.geo import wkb as W
        from raydal.io.shapefile import read_shapefile

        t = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        t2 = self._round_trip(t)
        assert t2.num_rows == 10
        eas = t2["EAS_ID"].to_pylist()
        assert [v for v in eas if v < 170] == [168, 169, 166, 158, 165]
        for a, b in zip(t["wkb"].to_pylist(), t2["wkb"].to_pylist()):
            assert W.wkb_bbox(a) == W.wkb_bbox(b)
        for c in ("AREA", "EAS_ID", "PRFEDEA"):
            assert t[c].to_pylist() == t2[c].to_pylist()

    def test_geometry_types_round_trip(self):
        """Every writable base type survives write→re-read with exact
        coordinates (corpus-style WKT fixtures)."""
        import pyarrow as pa

        from raydal.geo import wkb as W
        from raydal.io.wkt import wkb_to_wkt, wkt_to_wkb

        cases = {
            "point": ["POINT (1 2)", "POINT (-3.5 400000.25)"],
            "multipoint": ["MULTIPOINT (0 0,10 20,5 5)"],
            "line": ["LINESTRING (0 0,1 1,2 0)",
                     "MULTILINESTRING ((0 0,1 1),(5 5,6 7,8 8))"],
            "poly": ["POLYGON ((0 0,10 0,10 10,0 10,0 0),"
                     "(2 2,2 4,4 4,4 2,2 2))",
                     "MULTIPOLYGON (((0 0,4 0,4 4,0 4,0 0)),"
                     "((10 10,14 10,14 14,10 14,10 10)))"],
        }
        for name, wkts in cases.items():
            t = pa.table({
                "wkb": pa.array([wkt_to_wkb(w) for w in wkts],
                                pa.binary()),
                "tag": pa.array(list(range(len(wkts))), pa.int64())})
            t2 = self._round_trip(t)
            assert t2.num_rows == len(wkts)
            for orig, back in zip(wkts, t2["wkb"].to_pylist()):
                a = W.parse_wkb(wkt_to_wkb(orig))
                b = W.parse_wkb(back)
                # same vertex SET and bbox (polygon ring orientation /
                # closure may be normalized by the spec on write)
                ga = np.vstack(list(W._iter_coord_arrays(a)))
                gb = np.vstack(list(W._iter_coord_arrays(b)))
                assert set(map(tuple, ga)) == set(map(tuple, gb)), (
                    name, orig, wkb_to_wkt(back))

    def test_polygon_ring_orientation_written_to_spec(self):
        """Outer rings must come back clockwise (negative shoelace),
        holes counter-clockwise — regardless of input orientation."""
        import pyarrow as pa

        from raydal.geo import wkb as W
        from raydal.geo.clip import ring_area
        from raydal.io.wkt import wkt_to_wkb

        # outer CCW + hole CW: both must be flipped on write
        w = ("POLYGON ((0 0,10 0,10 10,0 10,0 0),"
             "(2 2,2 4,4 4,4 2,2 2))")
        t = pa.table({"wkb": pa.array([wkt_to_wkb(w)], pa.binary())})
        back = self._round_trip(t)["wkb"].to_pylist()[0]
        _, rings = W.parse_wkb(back)
        assert ring_area(rings[0]) < 0          # outer CW
        assert ring_area(rings[1]) > 0          # hole CCW
        # reader reassembles hole containment: 100 - 4 interior area
        assert abs(abs(ring_area(rings[0])) - 100) < 1e-9
        assert abs(abs(ring_area(rings[1])) - 4) < 1e-9

    def test_float_attrs_bit_exact_and_nulls(self):
        import pyarrow as pa

        from raydal.io.wkt import wkt_to_wkb

        vals = [0.1 + 0.2, 1e-17, -123456789.123456789, None]
        t = pa.table({
            "wkb": pa.array([wkt_to_wkb(f"POINT ({i} {i})")
                             for i in range(4)], pa.binary()),
            "x": pa.array(vals, pa.float64()),
            "flag": pa.array([True, False, None, True]),
            "label": pa.array(["a", None, "ccc", "dd"])})
        t2 = self._round_trip(t)
        assert t2["x"].to_pylist() == vals
        assert t2["flag"].to_pylist() == [True, False, None, True]
        assert t2["label"].to_pylist() == ["a", None, "ccc", "dd"]

    def test_null_geometry_and_mixed_types(self):
        import pyarrow as pa
        import pytest

        from raydal.io.wkt import wkt_to_wkb

        t = pa.table({"wkb": pa.array(
            [wkt_to_wkb("POINT (1 1)"), None], pa.binary())})
        t2 = self._round_trip(t)
        assert t2["wkb"].to_pylist()[1] is None
        bad = pa.table({"wkb": pa.array(
            [wkt_to_wkb("POINT (1 1)"),
             wkt_to_wkb("LINESTRING (0 0,1 1)")], pa.binary())})
        with pytest.raises(ValueError, match="one shape type"):
            self._round_trip(bad)

    def test_shx_index_matches_shp_records(self):
        """The .shx offsets must point exactly at each .shp record."""
        import struct
        import tempfile

        from raydal.io.shapefile import read_shapefile, write_shapefile

        t = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        d = tempfile.mkdtemp()
        write_shapefile(t, os.path.join(d, "rt.shp"))
        shp = open(os.path.join(d, "rt.shp"), "rb").read()
        shx = open(os.path.join(d, "rt.shx"), "rb").read()
        n = (len(shx) - 100) // 8
        assert n == 10
        for i in range(n):
            off_w, len_w = struct.unpack_from(">2i", shx, 100 + 8 * i)
            rec_no, clen = struct.unpack_from(">2i", shp, off_w * 2)
            assert rec_no == i + 1 and clen == len_w


class TestJpeg12BitAndLossless:
    """SOF1 12-bit extended-sequential + SOF3 lossless decode vs the
    reference's published expectations (autotest/gdrivers/jpeg.py)."""

    JP = "/root/reference/autotest/gdrivers/data/jpeg/"

    def test_lossless_published_checksum(self):
        """byte_lossless.jpg: checksum 4672, LOSSLESS reversibility
        (jpeg.py:1526-1531)."""
        from raydal.io.jpeg import decode_jpeg

        px = decode_jpeg(open(self.JP + "byte_lossless.jpg",
                              "rb").read())
        assert px.shape == (20, 20) and px.dtype == np.uint8
        assert checksum(px) == 4672

    def test_12bit_published_mean(self):
        """12bit_rose_extract.jpg: UInt16 band, mean in [3613, 3614]
        (jpeg.py:374-377)."""
        from raydal.io.jpeg import decode_jpeg

        px = decode_jpeg(open(self.JP + "12bit_rose_extract.jpg",
                              "rb").read())
        assert px.dtype == np.uint16 and px.shape == (50, 50)
        assert 3613 <= px.mean() <= 3614

    def test_lossless_round_trip_of_known_pixels(self):
        """byte_lossless.jpg is the reversible coding of the classic
        byte.tif — the decoded pixels must match that raster exactly,
        not just its checksum."""
        from raydal.io.jpeg import decode_jpeg
        from raydal.io.tiff import read_tiff

        px = decode_jpeg(open(self.JP + "byte_lossless.jpg",
                              "rb").read())
        ref = read_tiff(open(
            "/root/reference/autotest/gcore/data/byte.tif",
            "rb").read()).bands[0]
        assert np.array_equal(px, ref)

    def test_12bit_encode_round_trip(self):
        """encode_jpeg12 (optimal Huffman, like libjpeg's forced
        optimize_coding for >8-bit) decodes back at PSNR > 40 dB."""
        from raydal.io.jpeg import decode_jpeg, encode_jpeg12

        yy, xx = np.mgrid[0:60, 0:80]
        img = ((np.sin(xx / 9.0) + np.cos(yy / 7.0) + 2) / 4
               * 4095).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg12(img, quality=95))
        assert dec.dtype == np.uint16 and dec.shape == img.shape
        err = dec.astype(np.float64) - img.astype(np.float64)
        psnr = 10 * np.log10(4095 ** 2 / np.mean(err ** 2))
        assert psnr > 40

    def test_lossless_encode_bit_exact_all_predictors(self):
        """encode_jpeg_lossless → decode_jpeg reproduces the input
        exactly for every T.81 predictor, 8- and 16-bit, multi-chan."""
        from raydal.io.jpeg import decode_jpeg, encode_jpeg_lossless
        from raydal.io.tiff import read_tiff

        ref = read_tiff(open(
            "/root/reference/autotest/gcore/data/byte.tif",
            "rb").read()).bands[0]
        for p in range(1, 8):
            back = decode_jpeg(encode_jpeg_lossless(ref, predictor=p))
            assert np.array_equal(back, ref), p
        rng = np.random.default_rng(6)
        a16 = rng.integers(0, 65536, (40, 50)).astype(np.uint16)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(a16, predictor=4)), a16)
        c = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(c, predictor=7)), c)


class TestJpegInTiff:
    """TIFF compression 7 (JPEG, TIFF-EP JPEGTables splicing) vs the
    reference's published values (autotest/gcore/tiff_read.py,
    tiff_write.py)."""

    G = "/root/reference/autotest/gcore/data/"

    @pytest.mark.parametrize("name", [
        "stefan_full_rgba_jpeg_contig.tif",     # INTERLEAVE=PIXEL
        "stefan_full_rgba_jpeg_separate.tif",   # INTERLEAVE=BAND
    ])
    def test_rgba_published_checksums(self, name):
        """tiff_read.py:1069-1099: band checksums
        [16404, 62700, 37913, 14174] for both interleaves."""
        img = read_tiff(open(self.G + name, "rb").read())
        assert [checksum(b) for b in img.bands] == [
            16404, 62700, 37913, 14174]

    def test_12bit_jpeg_in_tiff_published_mean(self):
        """tiff_read.py:740-742: mandrilmini_12bitjpeg band-1 mean in
        [2150, 2180] (12-bit YCbCr 4:2:0 chunks)."""
        img = read_tiff(open(
            self.G + "mandrilmini_12bitjpeg.tif", "rb").read())
        assert img.bands[0].dtype == np.uint16
        assert 2150 <= img.bands[0].mean() <= 2180

    def test_unusual_jpegtables_published_checksum(self):
        """tiff_write.py:5841: byte_jpg_unusual_jpegtable.tif reads at
        checksum 4771 (JPEGTables with quirky padding)."""
        img = read_tiff(open(
            self.G + "byte_jpg_unusual_jpegtable.tif", "rb").read())
        assert checksum(img.bands[0]) == 4771

    def test_irregular_tile_size_fails_cleanly(self):
        """tiff_read.py:1261+: corrupt JPEG-in-TIFF with irregular
        tiles must error, not crash."""
        data = open(self.G + "irregular_tile_size_jpeg_in_tiff.tif",
                    "rb").read()
        try:
            read_tiff(data)
        except (ValueError, NotImplementedError):
            pass

    def test_12bit_rgb_encode_round_trip(self):
        """RGB input must go through the YCbCr transform the decoder
        reverses (regression: raw-channel writes decoded to garbage)."""
        from raydal.io.jpeg import decode_jpeg, encode_jpeg12

        yy, xx = np.mgrid[0:32, 0:48]
        rgb = np.stack([(np.sin(xx / 7.0) + 1) / 2,
                        (np.cos(yy / 9.0) + 1) / 2,
                        (np.sin((xx + yy) / 11.0) + 1) / 2], axis=-1)
        img = (rgb * 4095).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg12(img, quality=98))
        err = dec.astype(np.float64) - img.astype(np.float64)
        assert 10 * np.log10(4095 ** 2 / np.mean(err ** 2)) > 40
        with pytest.raises(ValueError, match="1 .gray. or 3"):
            encode_jpeg12(np.zeros((8, 8, 2), np.uint16))

    def test_int64_extremes_round_trip(self):
        """dBASE N fields widen past 18 chars instead of silently
        truncating int64 extremes."""
        import pyarrow as pa
        import tempfile

        from raydal.geo import wkb as W
        from raydal.io.shapefile import read_shapefile, write_shapefile

        t = pa.table({
            "wkb": pa.array([W.point_wkb(0.0, 0.0),
                             W.point_wkb(1.0, 1.0)], pa.binary()),
            "big": pa.array([-(2 ** 63), 2 ** 63 - 1], pa.int64())})
        d = tempfile.mkdtemp()
        write_shapefile(t, os.path.join(d, "big.shp"))
        back = read_shapefile(os.path.join(d, "big.shp"))
        assert back["big"].to_pylist() == [-(2 ** 63), 2 ** 63 - 1]

    def test_lossless_restart_intervals_round_trip(self):
        """DRI + RSTn in lossless streams: predictors reset per T.81
        H.1.1 (first sample after restart uses the default, rest of
        that line uses Ra) — byte.tif round-trips exactly across
        intervals and predictors."""
        from raydal.io.jpeg import decode_jpeg, encode_jpeg_lossless
        from raydal.io.tiff import read_tiff

        ref = read_tiff(open(
            "/root/reference/autotest/gcore/data/byte.tif",
            "rb").read()).bands[0]
        for ri in (7, 33):
            for p in (1, 4, 7):
                back = decode_jpeg(encode_jpeg_lossless(
                    ref, predictor=p, restart_interval=ri))
                assert np.array_equal(back, ref), (ri, p)
