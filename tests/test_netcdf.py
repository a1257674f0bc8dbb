"""netCDF classic driver vs the reference's published expectations.

Checksums are the values asserted in ``autotest/gdrivers/netcdf.py``
on the same fixture files (byte.nc 4672, trmm-nan.nc 62519 in
test_netcdf_30, two_vars_scale_offset.nc z 65463 in test_netcdf_39,
int16-nogeo.nc 4672/4855 bottom-up pair in netcdf_11/13, unittype.nc
units "m/s" in test_netcdf_59).
"""

import numpy as np
import pytest

from raydal.io.netcdf import parse_netcdf, read_netcdf, write_netcdf
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/netcdf/"


@pytest.mark.parametrize("fname,var,cs", [
    ("byte.nc", None, 4672),
    ("trmm.nc", None, 14),
    ("trmm-nan.nc", None, 62519),          # NaN → _FillValue (CheckData)
    ("trmm-nc2.nc", None, 14),             # CDF-2 64-bit offsets
    ("two_vars_scale_offset.nc", "z", 65463),
    ("int16-nogeo.nc", None, 4672),        # bottom-up default flip
])
def test_published_checksums(fname, var, cs):
    r = read_netcdf(DATA + fname, var=var)
    assert checksum(r["bands"][0]) == cs


def test_byte_nc_geotransform_matches_byte_tif():
    r = read_netcdf(DATA + "byte.nc")
    assert r["geotransform"] == (440720.0, 60.0, 0.0,
                                 3751320.0, 0.0, -60.0)


def test_int16_nogeo_unflipped_is_4855():
    # WRITE_BOTTOMUP=YES stored the rows bottom-up; the raw (unflipped)
    # order checksums 4855 per the netcdf_11/13 pair
    r = read_netcdf(DATA + "int16-nogeo.nc")
    assert checksum(r["bands"][0][::-1]) == 4855


def test_unit_attr_surfaces():
    r = read_netcdf(DATA + "unittype.nc")
    assert r["attrs"]["units"] == "m/s"


def test_scale_offset_surfaced_not_applied():
    r = read_netcdf(DATA + "two_vars_scale_offset.nc", var="z")
    assert r["scale"] == 0.01 and r["offset"] == 1.5
    # raw stored values — 65463 is the raw checksum, not the scaled one
    assert not np.allclose(r["bands"][0] * 0.01 + 1.5, r["bands"][0])


def test_coordinates_bounds_vars_excluded():
    # orog has coordinates="lon lat": lat/lon 2-D aux vars must not
    # be raster candidates; *_bnds are excluded via bounds attrs
    r = read_netcdf(DATA + "orog_CRCM1.nc")
    assert r["var"] == "orog"
    r = read_netcdf(DATA + "reduce-cgcms.nc")
    assert r["var"] == "tas"


def test_multiple_vars_requires_selector():
    with pytest.raises(ValueError, match="several raster variables"):
        read_netcdf(DATA + "two_vars_scale_offset.nc")


def test_nc4_reads_through_hdf5():
    # netCDF-4 containers route through the from-scratch HDF5 reader
    # (autotest/gdrivers/netcdf.py test_netcdf_chunked_multiple → 4672)
    from raydal.kernels.checksum import checksum

    r = read_netcdf(DATA + "byte_chunked_multiple.nc")
    assert r["var"] == "Band1"
    assert checksum(r["bands"][0]) == 4672
    assert r["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    r = read_netcdf(DATA + "bug5291.nc")
    assert r["var"] == "z" and r["bands"][0].shape == (53, 104)


def test_record_variable_slabs():
    # trmm's pcp rides the unlimited time dimension — the record
    # cursor must stride recsize per record
    nc = parse_netcdf(DATA + "trmm.nc")
    v = nc.vars["pcp"]
    assert v.is_record and v.shape == (1, 40, 40)


def test_write_read_roundtrip_with_gt():
    rng = np.random.default_rng(11)
    band = rng.integers(-300, 300, (17, 23)).astype(np.int16)
    gt = (100.0, 2.5, 0.0, 80.0, 0.0, -2.5)
    blob = write_netcdf(band, geotransform=gt)
    r = read_netcdf(blob)
    assert np.array_equal(r["bands"][0], band)
    assert r["geotransform"] == gt


def test_write_read_multiband_float():
    rng = np.random.default_rng(12)
    bands = [rng.normal(size=(9, 11)).astype(np.float32)
             for _ in range(3)]
    blob = write_netcdf(bands, geotransform=(0, 1, 0, 9, 0, -1))
    r = read_netcdf(blob)
    assert len(r["bands"]) == 3
    for got, want in zip(r["bands"], bands):
        assert np.array_equal(got, want)


def test_write_bottom_up_false():
    band = np.arange(12, dtype=np.int32).reshape(3, 4)
    blob = write_netcdf(band, geotransform=(0, 1, 0, 3, 0, -1),
                        bottom_up=False)
    r = read_netcdf(blob)
    assert np.array_equal(r["bands"][0], band)


def test_registry_roundtrip(ray_session, tmp_path):
    import ray.data

    from raydal.pipeline import SINK_REGISTRY, SOURCE_REGISTRY

    ds = SOURCE_REGISTRY["netcdf"](DATA + "byte.nc")
    t = ds.take_all()
    assert len(t) == 1 and t[0]["w"] == 20 and t[0]["h"] == 20
    arr = np.frombuffer(t[0]["data"],
                        dtype=t[0]["dtype"]).reshape(20, 20)
    assert checksum(arr) == 4672

    out = SINK_REGISTRY["netcdf"](
        SOURCE_REGISTRY["netcdf"](DATA + "byte.nc"),
        str(tmp_path / "nc_out"))
    paths = [r["path"] for r in out.take_all()]
    r = read_netcdf(paths[0])
    assert checksum(r["bands"][0]) == 4672
    assert r["geotransform"] == (440720.0, 60.0, 0.0,
                                 3751320.0, 0.0, -60.0)
