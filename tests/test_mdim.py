"""MDArray view/transpose semantics vs the published mdimtranslate
goldens (autotest/utilities/test_gdalmdimtranslate_lib.py: the
transpose=[1,2,0] + view=[::-1,1,...] case over data/mdim.vrt — dims
(time=4, latitude=10, longitude=10), longitude values 0,2.5,...)."""

import numpy as np
import pyarrow as pa
import pytest

from raydal.ops.mdim import (Dimension, MDArray, mdarray_to_dataset,
                             open_mdarray, parse_view)


def _mdim_fixture():
    """my_variable_with_time_increasing from data/mdim.vrt, with real
    dimension metadata (values constant 1 in the reference fixture —
    here made distinct so views are value-checked too)."""
    arr = np.arange(4 * 10 * 10, dtype=np.int32).reshape(4, 10, 10)
    md = MDArray.from_numpy("my_variable_with_time_increasing", arr,
                            ["time_increasing", "latitude",
                             "longitude"])
    md.dims[1] = Dimension("latitude", 10, "HORIZONTAL_Y", "NORTH",
                           values=90 - 2.5 * np.arange(10))
    md.dims[2] = Dimension("longitude", 10, "HORIZONTAL_X", "EAST",
                           values=2.5 * np.arange(10))
    return arr, md


def test_parse_view():
    assert parse_view("[::-1,1,...]", 3) == (
        slice(None, None, -1), 1, slice(None))
    assert parse_view("[1:3]", 2) == (slice(1, 3), slice(None))
    assert parse_view("[...,2]", 3) == (slice(None), slice(None), 2)
    with pytest.raises(ValueError):
        parse_view("[1,2,3,4]", 2)


def test_transpose_and_view_golden():
    # the published golden: transpose [1,2,0] then view [::-1,1,...]
    # → dims (subset_latitude_9_-1_10 size 10, time_increasing 4),
    #   DIM_longitude_INDEX=1, DIM_longitude_VALUE=2.5
    arr, md = _mdim_fixture()
    out = md.transpose([1, 2, 0]).get_view("[::-1,1,...]")
    assert [d.name for d in out.dims] == ["subset_latitude_9_-1_10",
                                          "time_increasing"]
    assert out.shape == (10, 4)
    assert out.attributes["DIM_longitude_INDEX"] == 1
    assert out.attributes["DIM_longitude_VALUE"] == pytest.approx(2.5)
    want = np.transpose(arr, (1, 2, 0))[::-1, 1, :]
    np.testing.assert_array_equal(out.read(), want)


def test_view_drops_and_subsets():
    arr, md = _mdim_fixture()
    v = md.get_view("[2,0:10:2,:]")
    assert v.shape == (5, 10)
    assert [d.name for d in v.dims] == ["subset_latitude_0_2_5",
                                        "longitude"]
    assert v.attributes["DIM_time_increasing_INDEX"] == 2
    np.testing.assert_array_equal(v.read(), arr[2, 0:10:2, :])
    # negative integer index
    v2 = md.get_view("[-1,...]")
    assert v2.attributes["DIM_time_increasing_INDEX"] == 3


def test_scaleaxes():
    arr, md = _mdim_fixture()
    s = md.scaleaxes({"latitude": 2, "longitude": 5})
    assert s.shape == (4, 5, 2)
    np.testing.assert_array_equal(s.read(), arr[:, ::2, ::5])


def test_view_composition():
    arr, md = _mdim_fixture()
    v = md.get_view("[1:4]").get_view("[::-1]").transpose([0, 2, 1])
    want = np.transpose(arr[1:4][::-1], (0, 2, 1))
    np.testing.assert_array_equal(v.read(), want)
    assert v.shape == want.shape


def test_bad_transpose():
    _arr, md = _mdim_fixture()
    with pytest.raises(ValueError):
        md.transpose([0, 0, 1])


def test_open_mdarray_hdf5(tmp_path):
    from raydal.io.hdf5 import write_hdf5

    data = np.arange(3 * 4 * 5, dtype=np.int32).reshape(3, 4, 5)
    p = str(tmp_path / "cube.h5")
    write_hdf5({"cube": data}, p)
    md = open_mdarray(p, "cube", dim_names=["t", "y", "x"])
    assert md.shape == (3, 4, 5)
    assert md.dtype == np.int32
    np.testing.assert_array_equal(md.read(), data)
    np.testing.assert_array_equal(md.get_view("[1]").read(), data[1])


def test_open_mdarray_netcdf(tmp_path):
    from raydal.io.netcdf import write_netcdf

    band = np.arange(20, dtype=np.float32).reshape(4, 5)
    p = str(tmp_path / "grid.nc")
    blob = write_netcdf([band])
    with open(p, "wb") as f:
        f.write(blob)
    md = open_mdarray(p, "Band1")
    assert md.shape == (4, 5)
    got = md.read()
    assert got.shape == (4, 5)


def test_mdarray_to_dataset(ray_session, tmp_path):
    from raydal.io.hdf5 import write_hdf5

    data = np.arange(3 * 4 * 5, dtype=np.int32).reshape(3, 4, 5)
    p = str(tmp_path / "cube.h5")
    write_hdf5({"cube": data}, p)
    md = open_mdarray(p, "cube", dim_names=["t", "y", "x"])
    rows = mdarray_to_dataset(md, path=p, array="cube").take_all()
    assert len(rows) == 3
    by_id = {r["image_id"]: r for r in rows}
    for t in range(3):
        r = by_id[f"cube[t={t}]"]
        got = np.frombuffer(r["data"], np.int32).reshape(r["h"], r["w"])
        np.testing.assert_array_equal(got, data[t])


def test_view_tuple_spec_padding():
    # a short tuple spec pads with full slices like the string grammar
    arr, md = _mdim_fixture()
    v = md.get_view((0,))
    assert v.shape == (10, 10)
    assert [d.name for d in v.dims] == ["latitude", "longitude"]
    np.testing.assert_array_equal(v.read(), arr[0])
    with pytest.raises(ValueError):
        md.get_view((0, 0, 0, 0))
