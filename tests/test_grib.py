"""GRIB1/GRIB2 reader vs the reference's published expectations.

Every checksum below is a value asserted in
``autotest/gdrivers/grib.py`` on the same fixture file: ds.mint.bin
band 2 = 46927 (test_grib_1; GRIB2 template 5.3 complex packing +
spatial differencing, scan flag 0x50 boustrophedon, K→C normalize),
Sample_QuikSCAT.grb band 4 = 50714 (test_grib_2; GRIB1), bug3246.grb
band 4 = 4081 (different-sized messages padded to the dataset
window), subgrids.grib2 4672/4563 (section 4-7 repetition after one
section 3), subgrids_reuse_bitmap.grib2 (bitmap indicator 254),
MRMS 41854 (template 5.41 PNG packing), hwrfsat 48230 (PDS template
4.32, brightness temperature K→C), ieee754 4727 (template 5.4),
nbits-zero fixtures = 5 (constant fields), spatial_differencing_
order_1.grb2 = 46650, gfs.t06z 59985/59986/206.
"""

import numpy as np
import pytest

from raydal.io.grib import read_grib
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/grib/"


@pytest.mark.parametrize("fname,band,cs", [
    ("ds.mint.bin", 2, 46927),
    ("Sample_QuikSCAT.grb", 4, 50714),
    ("bug3246.grb", 4, 4081),
    ("subgrids.grib2", 1, 4672),
    ("subgrids.grib2", 2, 4563),
    ("subgrids_reuse_bitmap.grib2", 2, 4563),
    ("MRMS_EchoTop_18_00.50_20161015-133230.grib2", 1, 41854),
    ("twenty-se27w.2017102006.hwrfsat.core.0p02.f000_truncated.grb2",
     1, 48230),
    ("ieee754_single.grb2", 1, 4727),
    ("ieee754_double.grb2", 1, 4727),
    ("simple_packing_nbits_zero_decimal_scaled.grb2", 1, 5),
    ("png_nbits_zero_decimal_scaled.grb2", 1, 5),
    ("spatial_differencing_order_1.grb2", 1, 46650),
    ("gfs.t06z.pgrb2.10p0.f010.grib2", 1, 59985),
    ("gfs.t06z.pgrb2.10p0.f010.grib2", 2, 59986),
    ("gfs.t06z.pgrb2.10p0.f010.grib2", 6, 206),
    ("CMC_rdwps_lake-erie_ICEC_SFC_0_latlon0.05x0.05_2017111800_"
     "P000.grib2", 1, 0),
])
def test_published_checksums(fname, band, cs):
    bands = read_grib(DATA + fname)
    assert checksum(bands[band - 1]["data"]) == cs


def test_nodata_and_units():
    # test_grib_grib2_read_nodata + test_grib_read_units
    bands = read_grib(DATA + "ds.mint.bin")
    assert bands[0]["nodata"] == 9999 and bands[1]["nodata"] == 9999
    assert bands[0]["comment"] == "Minimum temperature [C]"
    assert bands[0]["unit"] == "[C]"
    v = bands[0]["data"]
    assert v[v != 9999.0].min() == pytest.approx(13, abs=1)
    # test_grib_2: GRIB1 nodata is also degrib's UNDEFINED
    assert read_grib(DATA + "Sample_QuikSCAT.grb")[0]["nodata"] == 9999.0


def test_nodata_bands_with_bitmap():
    # test_grib_grib2_read_nodata_bands_with_bitmap
    bands = read_grib(DATA + "two_bands_with_bitmap.grib2")
    assert bands[0]["nodata"] == 9999 and bands[1]["nodata"] == 9999


def test_brightness_temperature_range():
    # test_grib_grib2_read_template_4_32 ComputeRasterMinMax
    b = read_grib(DATA + "twenty-se27w.2017102006.hwrfsat.core.0p02."
                         "f000_truncated.grb2")[0]
    assert (b["data"].min(), b["data"].max()) == \
        pytest.approx((-9.765, 2.415), 1e-3)
    assert b["comment"] == "Brightness Temperature [C]"


def test_one_one_geotransform():
    # test_grib_read_geotransform_one_n_or_n_one (ticket #5532)
    b = read_grib(DATA + "one_one.grib2")[0]
    assert b["geotransform"] == (-114.25, 0.5, 0.0, 47.250, 0.0, -0.5)


def test_gfs_zip_payload_reads_from_bytes():
    # test_grib_read_vsizip equivalent: the reader accepts raw bytes
    import zipfile
    with zipfile.ZipFile(DATA + "gfs.t00z.mastergrb2f03.zip") as z:
        buf = z.read("gfs.t00z.mastergrb2f03")
    bands = read_grib(buf)
    assert len(bands) == 4
    assert [b["name"] for b in bands[:3]] == ["TMP", "UGRD", "VGRD"]


def test_different_sized_messages_padded_to_window():
    # bug3246: window = first message; others top-left anchored,
    # zero-padded (gribdataset.cpp:992-1023)
    bands = read_grib(DATA + "bug3246.grb")
    shapes = {b["data"].shape for b in bands}
    assert shapes == {bands[0]["data"].shape}


def test_jpeg2000_is_documented_swap_point():
    with pytest.raises(NotImplementedError):
        read_grib(DATA + "template_4_15.grb2")


def test_ray_source_registry(ray_session):
    from raydal.pipeline import SOURCE_REGISTRY

    rows = SOURCE_REGISTRY["grib"](DATA + "ds.mint.bin").take_all()
    assert len(rows) == 2
    r = rows[1]
    arr = np.frombuffer(r["data"], dtype=r["dtype"]).reshape(
        r["h"], r["w"])
    assert checksum(arr) == 46927
    assert r["nodata"] == 9999.0
    assert r["element"] == "TMIN"


# ------------------------------------------------------------- writer

GT = (2.0, 0.01, 0.0, 50.0, 0.0, -0.01)


def _byte_band():
    from raydal.io.tiff import read_tiff
    r = read_tiff(open("/root/reference/autotest/gcore/data/byte.tif",
                       "rb").read())
    return np.asarray(r.bands[0], np.float64), r


def test_write_simple_packing_lossless():
    # grib.py test_grib_grib2_write_data_encodings: byte.tif survives
    # SIMPLE_PACKING (4672) including DECIMAL_SCALE_FACTOR=1
    from raydal.io.grib import write_grib2
    a, _ = _byte_band()
    for kw in ({}, {"decimal_scale": 1}, {"encoding": "ieee"}):
        b = read_grib(write_grib2(a, GT, **kw))[0]
        assert checksum(b["data"]) == 4672, kw


def test_write_geotransform_roundtrip():
    from raydal.io.grib import write_grib2
    a, _ = _byte_band()
    b = read_grib(write_grib2(a, GT))[0]
    got = b["geotransform"]
    assert got == pytest.approx(GT, abs=1e-9)


def test_write_mint_reencode_published_41640():
    # grib.py test_grib_grib2_write_data_encodings_warnings_and_errors:
    # CreateCopy(ds.mint.bin, DATA_ENCODING=SIMPLE_PACKING) band 1 =
    # 41640.  The reference reuses the source band's DRS_NBITS (7) and
    # DRS_DECIMAL_SCALE_FACTOR (1) (gribcreatecopy.cpp:2020-2067),
    # applies the +273.15 C→K offset to data points only (nodata 9999
    # is packed raw), and simpack picks E via the fixed-nbits branch.
    from raydal.io.grib import write_grib2
    b1 = read_grib(DATA + "ds.mint.bin")[0]
    msg = write_grib2(b1["data"], GT, param=(0, 0, 5),
                      decimal_scale=1, nbits=7, nodata=9999.0)
    rb = read_grib(msg)[0]
    assert checksum(rb["data"]) == 41640
    assert rb["comment"] == "Minimum temperature [C]"


def test_write_constant_field_zero_bits():
    from raydal.io.grib import write_grib2
    a = np.full((8, 8), 3.25)
    b = read_grib(write_grib2(a, GT))[0]
    assert np.allclose(b["data"], np.float32(3.25))


def test_write_fixed_nbits_quantizes():
    from raydal.io.grib import write_grib2
    a, _ = _byte_band()
    b = read_grib(write_grib2(a, GT, nbits=5))[0]
    # 5-bit quantization of range 181: simpack picks binary scale
    # E = ceil(log2(181/31)) = 3 → step 8, max error 4
    assert checksum(b["data"]) == 4653
    assert np.abs(b["data"] - a).max() <= 4.0


def test_write_small_range_not_flattened():
    # g2clib's log(ceil(range)) picks 0 bits for a range of exactly 1
    # (and one bit short for power-of-two ranges); the writer widens
    # nbits so the quantized values actually fit
    from raydal.io.grib import write_grib2
    mask = (np.arange(32 * 32).reshape(32, 32) % 3 == 0) \
        .astype(np.float64)
    rb = read_grib(write_grib2(mask, GT))[0]["data"]
    assert np.array_equal(rb, mask)
    r = np.arange(257, dtype=np.float64).reshape(1, 257).repeat(4, 0)
    rb = read_grib(write_grib2(r, GT))[0]["data"]
    assert np.array_equal(rb, r)
