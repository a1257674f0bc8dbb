"""Zarr v2/v3 store — goldens from autotest/gdrivers/zarr_driver.py.

Every expected value below is published in the reference test suite
(cited per test); the fixtures are the reference's own
``autotest/gdrivers/data/zarr/`` stores.
"""

import json
import os

import numpy as np
import pytest

from raydal.io.zarr import (
    ZarrArray, chunk_refs, lz4_compress, lz4_decompress, open_zarr,
    open_zarr_array, read_zarr_raster, write_zarr, write_zarr_classic,
    zarr_georef,
)
from raydal.kernels.checksum import checksum

Z = "/root/reference/autotest/gdrivers/data/zarr/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(Z), reason="reference zarr fixtures not present")


@needs_fixtures
class TestCompression:
    # zarr_driver.py test_zarr_read_compression_methods: each store
    # holds |u1 [1, 2]
    @pytest.mark.parametrize("name", [
        "blosc", "gzip", "lz4", "lzma", "lzma_with_filters", "zlib",
        "zstd"])
    def test_read(self, name):
        a = open_zarr_array(Z + name + ".zarr")
        assert a.read().tolist() == [1, 2]
        assert a.compressor["id"] == ("lzma" if "lzma" in name
                                      else name)

    def test_v3_gzip(self):
        # test_zarr_v3_read_compression_methods
        assert open_zarr_array(
            Z + "v3/gzip.zarr").read().ravel().tolist() == [1, 2]


@needs_fixtures
class TestFilters:
    def test_shuffle(self):
        # test_zarr_read_shuffle_filter: int16 [1, 2]
        a = open_zarr_array(Z + "shuffle.zarr")
        v = a.read()
        assert v.dtype == np.uint16 and v.tolist() == [1, 2]
        assert a.filters == [{"elementsize": 2, "id": "shuffle"}]

    def test_delta(self):
        # test_zarr_read_filters (delta_filter_i4): range(10)
        assert open_zarr_array(
            Z + "delta_filter_i4.zarr").read().tolist() == \
            list(range(10))

    def test_quantize(self):
        # test_zarr_read_shuffle_quantize first row of the published
        # 10x10 expectation
        q = open_zarr_array(Z + "quantize.zarr").read()
        assert q.shape == (10, 10) and q.dtype == np.float64
        assert q.ravel()[:10].tolist() == [
            0, 0.125, 0.1875, 0.3125, 0.375, 0.5, 0.625, 0.6875,
            0.8125, 0.875]

    @pytest.mark.parametrize("name", [
        "fixedscaleoffset_dtype_f4_astype_u1",
        "fixedscaleoffset_dtype_f8_astype_u1",
        "fixedscaleoffset_dtype_f8_astype_u2",
        "fixedscaleoffset_dtype_f8_astype_u4"])
    def test_fixedscaleoffset(self, name):
        # test_zarr_read_fixedscaleoffset published decode
        v = open_zarr_array(Z + name + ".zarr").read()
        np.testing.assert_allclose(v.astype(np.float64), [
            1000.0, 1000.1, 1000.2, 1000.3, 1000.4, 1000.6, 1000.7,
            1000.8, 1000.9, 1001.0], atol=1e-4)


@needs_fixtures
class TestLayout:
    @pytest.mark.parametrize("name", ["u1", "u2", "u4", "u8"])
    def test_fortran_order(self, name):
        # test_zarr_read_fortran_order: values 0..15 after byte cast
        v = open_zarr_array(Z + f"order_f_{name}.zarr").read()
        assert v.astype(np.uint8).ravel().tolist() == list(range(16))

    def test_fortran_order_3d(self):
        v = open_zarr_array(Z + "order_f_u1_3d.zarr").read()
        assert v.ravel().tolist() == list(range(24))

    def test_fortran_order_string(self):
        # test_zarr_read_fortran_order_string
        v = open_zarr_array(Z + "order_f_s3.zarr").read()
        assert [s.decode() for s in v.ravel()] == [
            "000", "111", "222", "333", "444", "555", "666", "777",
            "888", "999", "AAA", "BBB", "CCC", "DDD", "EEE", "FFF"]

    def test_empty_shape(self):
        # test_zarr_read_empty_shape: scalar 120
        assert int(open_zarr_array(Z + "empty.zarr").read()) == 120

    @pytest.mark.parametrize("e", ["le", "be"])
    def test_half_float(self, e):
        # test_zarr_read_half_float: [1.5, nan]
        v = open_zarr_array(Z + f"f2_{e}.zarr").read().astype(
            np.float32)
        assert v[0] == 1.5 and np.isnan(v[1])

    @pytest.mark.parametrize("e", ["le", "be"])
    def test_unicode(self, e):
        # test_zarr_read_unicode: single é
        v = open_zarr_array(Z + f"unicode_{e}.zarr").read()
        assert v.tolist() == ["é"]

    def test_compound_well_aligned(self):
        # test_zarr_read_compound_well_aligned published per-field
        v = open_zarr_array(Z + "compound_well_aligned.zarr").read()
        assert v["a"].tolist() == [1000, 4000, 0]
        assert v["b"].tolist() == [3000, 5000, 0]

    def test_compound_not_aligned(self):
        v = open_zarr_array(Z + "compound_not_aligned.zarr").read()
        assert v["a"].tolist() == [1000, 4000, 0]
        assert v["b"].tolist() == [2, 4, 0]
        assert v["c"].tolist() == [3000, 5000, 0]

    def test_array_attrs(self):
        # test_zarr_read_array_attributes (json-c liberal quoting)
        a = open_zarr_array(Z + "array_attrs.zarr")
        assert a.attrs["int64"] == 1234567890123
        assert a.attrs["strarray"] == ["foo", "bar"]
        assert a.attrs["doublearray"] == [1.5, 2.5]


@needs_fixtures
class TestGroups:
    @pytest.mark.parametrize("store", ["v3/test.zr3",
                                       "v3/test_deprecated_no_codecs.zr3"])
    def test_v3_tree(self, store):
        # test_zarr_read_v3: groups, attrs, array values
        rg = open_zarr(Z + store)
        assert rg.group_names() == ["marvin"]
        assert rg.array_names() == ["ar"]
        assert rg.attrs == {"root_foo": "bar"}
        assert rg.open_array("ar").read().tolist() == [1, 2]
        assert rg.open_group("not_existing") is None
        sub = rg.open_group("marvin")
        android = sub.open_array("android")
        assert android.read().ravel().tolist() == [1] * 20
        assert android.shape == [5, 4]

    def test_v2_group(self):
        rg = open_zarr(Z + "group.zarr")
        assert rg.group_names() == ["foo"]

    def test_v2_zmetadata_group(self):
        rg = open_zarr(Z + "group_with_zmetadata.zarr")
        assert rg.group_names() == ["foo"]

    def test_nczarr_v2(self):
        # test_zarr_read_nczarr_v2: MyGroup/dset1 3x3 of 1,2,3
        rg = open_zarr(Z + "nczarr_v2.zarr")
        mg = rg.open_group("MyGroup")
        assert set(mg.array_names()) >= {"dset1", "lat", "lon"}
        assert mg.open_array("dset1").read().tolist() == \
            [[1, 2, 3]] * 3

    def test_array_dimensions(self):
        # test_zarr_read_ARRAY_DIMENSIONS: var dims lat/lon
        a = open_zarr_array(Z + "array_dimensions.zarr", "var")
        assert a.dimension_names == ["lat", "lon"]
        from raydal.ops.mdim import open_mdarray
        md = open_mdarray(Z + "array_dimensions.zarr", "var")
        assert [d.name for d in md.dims] == ["lat", "lon"]
        assert md.dims[0].type == "HORIZONTAL_Y"
        assert md.dims[0].direction == "NORTH"
        assert md.dims[1].type == "HORIZONTAL_X"
        assert md.dims[1].direction == "EAST"


@needs_fixtures
class TestClassic:
    def test_classic_zlib(self):
        # test_zarr_read_classic
        arr, gt, nd = read_zarr_raster(Z + "zlib.zarr")
        assert arr.ravel().tolist() == [1, 2]

    @pytest.mark.parametrize("store", ["byte_cf1.zarr",
                                       "byte_cf1.zr3"])
    def test_byte_cf1(self, store):
        # byte.tif parity: checksum 4672 and its exact geotransform
        # (CF south-up store flipped to north-up, gdal classic view)
        arr, gt, nd = read_zarr_raster(Z + store, "Band1")
        assert arr.shape == (20, 20)
        assert checksum(arr) == 4672
        np.testing.assert_allclose(
            gt, (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))


class TestWrite:
    @pytest.mark.parametrize("fmt", [2, 3])
    @pytest.mark.parametrize("comp", ["zlib", "gzip", None])
    def test_roundtrip(self, tmp_path, fmt, comp):
        data = (np.arange(35 * 17).reshape(35, 17) % 251).astype(
            np.uint8)
        write_zarr(tmp_path / "t.zarr", data, chunks=[8, 5],
                   compressor=comp, zarr_format=fmt)
        back = open_zarr_array(tmp_path / "t.zarr")
        assert back.fmt == fmt
        assert np.array_equal(back.read(), data)

    @pytest.mark.parametrize("comp", ["lz4", "zstd", "lzma"])
    def test_roundtrip_exotic_codecs(self, tmp_path, comp):
        data = np.arange(1000, dtype=np.int32).reshape(25, 40)
        write_zarr(tmp_path / "t.zarr", data, chunks=[7, 13],
                   compressor=comp)
        assert np.array_equal(
            open_zarr_array(tmp_path / "t.zarr").read(), data)

    def test_roundtrip_float_nan_fill(self, tmp_path):
        data = np.random.RandomState(0).randn(10, 10)
        write_zarr(tmp_path / "f.zarr", data, chunks=[4, 4],
                   fill_value=float("nan"))
        a = open_zarr_array(tmp_path / "f.zarr")
        assert np.isnan(a.fill_value)
        assert np.allclose(a.read(), data)

    def test_classic_roundtrip_with_georef(self, tmp_path):
        data = np.arange(400, dtype=np.uint8).reshape(20, 20)
        gt0 = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        write_zarr_classic(tmp_path / "c.zarr", data, gt=gt0,
                           nodata=None)
        arr, gt, nd = read_zarr_raster(tmp_path / "c.zarr")
        assert np.array_equal(arr, data)
        np.testing.assert_allclose(gt, gt0)

    def test_missing_chunk_reads_fill(self, tmp_path):
        data = np.ones((6, 6), np.uint8)
        write_zarr(tmp_path / "m.zarr", data, chunks=[3, 3],
                   compressor=None, fill_value=7)
        a = open_zarr_array(tmp_path / "m.zarr")
        os.remove(os.path.join(a.path, "1.1"))
        out = a.read()
        assert out[:3, :3].tolist() == [[1] * 3] * 3
        assert out[3:, 3:].tolist() == [[7] * 3] * 3


class TestLZ4:
    def test_block_roundtrip(self):
        data = b"hello world " * 50 + b"tail"
        assert lz4_decompress(lz4_compress(data), len(data)) == data

    def test_fixture_block(self):
        # lz4.zarr chunk 0: 4-byte LE size + literal-only block
        if not os.path.isdir(Z):
            pytest.skip("no fixtures")
        buf = open(Z + "lz4.zarr/0", "rb").read()
        assert lz4_decompress(buf[4:], 2) == b"\x01\x02"


@needs_fixtures
class TestChunkRefs:
    def test_refs_metadata_only(self):
        refs = chunk_refs(Z + "byte_cf1.zarr", "Band1")
        assert refs == [{"path": Z + "byte_cf1.zarr",
                         "array": "Band1", "chunk": [0, 0],
                         "window": [(0, 20), (0, 20)]}]
        gt, nd = zarr_georef(Z + "byte_cf1.zarr", "Band1")
        # stored order is south-up: dy > 0, origin at the south edge
        np.testing.assert_allclose(
            gt, (440720.0, 60.0, 0.0, 3750120.0, 0.0, 60.0))

    def test_chunked_source_dataset(self, tmp_path, ray_session):
        from raydal.pipeline import open_source
        data = (np.arange(40 * 30) % 255).astype(np.uint8).reshape(
            40, 30)
        gt0 = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
        write_zarr_classic(tmp_path / "big.zarr", data, gt=gt0,
                           chunks=[16, 16])
        ds = open_source("zarr-chunks", str(tmp_path / "big.zarr"))
        rows = ds.take_all()
        assert len(rows) == 6            # 3x2 chunk grid
        # reassemble and compare against the plain reader
        out = np.zeros_like(data)
        for r in rows:
            a = np.frombuffer(r["data"], np.uint8).reshape(
                r["h"], r["w"])
            gt = r["geotransform"]
            c0 = round((gt[0] - 100.0) / 2.0)
            r0 = round((500.0 - gt[3]) / 2.0) if gt[5] < 0 else \
                round((gt[3] - (500.0 - 2.0 * 40)) / 2.0)
            if gt[5] > 0:                # stored south-up
                r0 = round((gt[3] - (500.0 - 2.0 * 40)) / 2.0)
                out[40 - r0 - r["h"]:40 - r0, c0:c0 + r["w"]] = \
                    a[::-1]
            else:
                out[r0:r0 + r["h"], c0:c0 + r["w"]] = a
        assert np.array_equal(out, data)

    def test_whole_source_dataset(self, tmp_path, ray_session):
        from raydal.pipeline import open_source
        data = np.arange(64, dtype=np.uint8).reshape(8, 8)
        write_zarr_classic(tmp_path / "s.zarr", data,
                           gt=(0, 1, 0, 8, 0, -1))
        ds = open_source("zarr", str(tmp_path / "s.zarr"))
        rows = ds.take_all()
        assert len(rows) == 1
        a = np.frombuffer(rows[0]["data"], np.uint8).reshape(8, 8)
        assert np.array_equal(a, data)


class TestMdimIntegration:
    def test_open_mdarray_view(self, tmp_path):
        from raydal.ops.mdim import open_mdarray
        data = np.arange(24, dtype=np.int32).reshape(2, 3, 4)
        write_zarr(tmp_path / "v.zarr", data, chunks=[1, 3, 4],
                   dim_names=["t", "y", "x"])
        md = open_mdarray(tmp_path / "v.zarr", "v")
        assert [d.name for d in md.dims] == ["t", "y", "x"]
        sub = md.get_view("[1,::-1,:2]") if hasattr(md, "get_view") \
            else None
        if sub is not None:
            assert sub.read().tolist() == \
                data[1, ::-1, :2].tolist()
        else:
            assert md.read().tolist() == data.tolist()
