"""HDF4 SDS reader over the reference's fixture corpus
(``autotest/gdrivers/data/hdf4/hdifftst2.hdf`` — the file the
reference's own tests open through the HDF4 driver and explicitly NOT
through netCDF, autotest netcdf.py test_netcdf_22/23)."""

import numpy as np
import pytest

from raydal.io.hdf4 import HDF4File, hdf4_datasets, read_hdf4

FIX = "/root/reference/autotest/gdrivers/data/hdf4/hdifftst2.hdf"


def test_datasets():
    assert hdf4_datasets(FIX) == {
        "dset1": ((3, 2), ">i4"),
        "dset2": ((3, 2), ">i4"),
        "dset3": ((3, 2), ">i4"),
    }


def test_values():
    f = HDF4File(FIX)
    seq = np.arange(1, 7).reshape(3, 2)
    assert np.array_equal(f.read("dset1"), seq)
    assert np.array_equal(f.read("dset2"), seq)
    assert np.array_equal(f.read("dset3"),
                          [[120, 80], [0, 100], [0, 50]])


def test_vdata_attributes():
    v = HDF4File(FIX).vdatas()
    assert v["File_contents"].rstrip(b"\x00") == b"Storm_track_data2"
    assert np.frombuffer(v["Valid_range"], ">f4").tolist() == [1.0, 2.0]
    assert v["vdata1"] == b"XDATA"


def test_rejects_non_hdf4():
    with pytest.raises(ValueError, match="not an HDF4"):
        HDF4File(b"\x89HDF\r\n\x1a\nxxxx")


def test_read_requires_name_when_multiple():
    with pytest.raises(ValueError, match="dataset required"):
        read_hdf4(FIX)
    assert read_hdf4(FIX, "dset1").shape == (3, 2)
