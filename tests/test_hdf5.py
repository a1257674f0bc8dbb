"""HDF5 reader goldens vs the reference's published expectations.

Checksums and structural expectations come from
``autotest/gdrivers/hdf5.py`` (test_hdf5_3 → 135, test_hdf5_5 → 18,
test_hdf5_15/16/17 → 523/511/412, test_hdf5_single_dim → 231,
test_hdf5_eos_swath_chunking_optimization fixture = arange(24000),
test_hdf5_rasterio_optims fixture = arange(24)) and
``autotest/gdrivers/netcdf.py`` (byte_chunked_* → 4672 after the
netCDF bottom-up flip).  Fixtures are the reference's own binary test
files, read as opaque inputs.
"""

import glob

import numpy as np
import pytest

from raydal.io.hdf5 import HDF5File, hdf5_datasets, read_hdf5
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/hdf5/"
N = "/root/reference/autotest/gdrivers/data/netcdf/"


def test_u8be_checksum_135():
    # autotest/gdrivers/hdf5.py test_hdf5_3/test_hdf5_4
    f = HDF5File(D + "u8be.h5")
    assert f.datasets() == {"/TestArray": ((6, 5), "|u1")}
    a = f.read("/TestArray")
    assert a.dtype == np.uint8 and a.shape == (6, 5)
    assert checksum(a) == 135


def test_groups_dset1_checksum_18():
    # autotest/gdrivers/hdf5.py test_hdf5_5
    f = HDF5File(D + "groups.h5")
    assert set(f.datasets()) == {"/MyGroup/Group_A/dset2", "/MyGroup/dset1"}
    assert checksum(f.read("/MyGroup/dset1")) == 18


@pytest.mark.parametrize(
    "path,kind,cs",
    [("/f32", np.complex64, 523), ("/f64", np.complex128, 511), ("/f16", np.complex64, 412)],
)
def test_complex_checksums(path, kind, cs):
    # autotest/gdrivers/hdf5.py test_hdf5_15/16/17: GDAL checksums complex
    # bands over the interleaved real/imag scalar view.
    a = HDF5File(D + "complex.h5").read(path)
    assert a.dtype == kind
    flt = np.float32 if kind == np.complex64 else np.float64
    assert checksum(a.view(flt).reshape(a.shape[0], -1)) == cs


def test_netcdf4_single_dim_231():
    # autotest/gdrivers/hdf5.py test_hdf5_single_dim: HDF5:...nc://x
    f = HDF5File(N + "byte_chunked_multiple.nc")
    a = f.read("/x")
    assert a.shape == (20,)
    assert checksum(a.reshape(1, -1)) == 231


@pytest.mark.parametrize(
    "fn", ["byte_chunked_multiple.nc", "byte_chunked_not_multiple.nc"]
)
def test_netcdf4_chunked_band1_4672(fn):
    # autotest/gdrivers/netcdf.py test_netcdf_chunked_*: 4672 after the
    # netCDF driver's bottom-up y flip.
    a = HDF5File(N + fn).read("/Band1")
    assert checksum(np.flipud(a)) == 4672


def test_signature_at_offset():
    # autotest test_hdf5_signature_not_at_beginning: userblock offsets
    # (512 * 2^n) must be probed for the signature.
    a = HDF5File(N + "byte_hdf5_starting_at_offset_1024.nc").read("/Band1")
    assert checksum(np.flipud(a)) == 4672
    with open(D + "u8be.h5", "rb") as fh:
        raw = fh.read()
    assert checksum(HDF5File(b"\x00" * 512 + raw).read("/TestArray")) == 135


def test_eos_swath_plain_and_chunked():
    # autotest test_hdf5_rasterio_optims (arange 2*3*4) and
    # test_hdf5_eos_swath_chunking_optimization (gzip chunked arange 24000).
    p = "/HDFEOS/SWATHS/MySwath/Data Fields/MyDataField"
    a = HDF5File(D + "dummy_HDFEOS_swath.h5").read(p)
    assert a.shape == (2, 3, 4) and a.tobytes() == bytes(range(24))
    b = HDF5File(D + "dummy_HDFEOS_swath_chunked.h5").read(p)
    assert np.array_equal(
        b, np.arange(20 * 30 * 40, dtype=np.float32).reshape(20, 30, 40)
    )


def test_recursive_groups_guarded():
    # autotest test_hdf5_recursive_groups: link cycles must not hang.
    assert HDF5File(D + "recursive_groups.h5").datasets() == {}


def test_vlen_string_attrs():
    # autotest reads vlstr_metadata.h5 metadata; vlen strings live in the
    # global heap (GCOL).
    f = HDF5File(D + "vlstr_metadata.h5")
    at = f.attrs("/TEST")
    assert at["BANDNAMES"] == ["SAA"]
    assert at["NOVALUE"] == ["255"]
    assert at["MAPPING"][0] == "Geographic Lat/Lon"


def test_metadata_attr_shapes():
    at = HDF5File(D + "metadata.h5").attrs()
    assert at["attribute"][0].startswith("value")
    assert at["attribute with spaces"].dtype == np.int32


def test_all_fixtures_parse():
    # Every .h5 in the reference corpus either parses or is a family
    # continuation member (no standalone superblock).
    skip = {"test_family_1.h5", "test_family_2.h5"}
    for p in sorted(glob.glob(D + "*.h5")):
        name = p.rsplit("/", 1)[1]
        if name in skip:
            continue
        HDF5File(p).datasets()


def test_module_helpers():
    assert hdf5_datasets(D + "u8be.h5") == {"/TestArray": ((6, 5), "|u1")}
    a = read_hdf5(D + "u8be.h5", "/TestArray")
    assert isinstance(a, np.ndarray) and a.shape == (6, 5)


def test_writer_roundtrip():
    # minimal writer (v0 superblock + v1 headers + Link messages)
    from raydal.io.hdf5 import write_hdf5

    a = (np.arange(64 * 64, dtype=np.int16) % 1000).reshape(64, 64)
    b = np.linspace(0.0, 1.0, 50).reshape(5, 10)
    u = np.arange(12, dtype=np.uint8).reshape(3, 4)
    f = HDF5File(write_hdf5({"grid": a, "vals": b, "u8": u}))
    assert set(f.datasets()) == {"/grid", "/vals", "/u8"}
    assert np.array_equal(f.read("/grid"), a)
    assert np.allclose(f.read("/vals"), b)
    assert np.array_equal(f.read("/u8"), u)
