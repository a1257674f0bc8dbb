"""Tests for resampling kernels, checksum parity, and image codecs."""

import numpy as np
import pytest

from raydal.io import codecs, images, png
from raydal.kernels import checksum as cks
from raydal.kernels import resample as rs


class TestKernelFormulas:
    def test_cubic_catmull_rom_closed_form(self):
        # CubicKernel (alg/gdalresamplingkernels.h:23): W(0)=1, W(±1)=0,
        # W(0.5) = 0.5625 for a=-0.5
        x = np.array([0.0, 1.0, -1.0, 0.5, 2.0, 2.5])
        w = rs.kernel_weights("cubic", x)
        np.testing.assert_allclose(w, [1.0, 0.0, 0.0, 0.5625, 0.0, 0.0],
                                   atol=1e-12)

    def test_cubic_partition_of_unity(self):
        for f in np.linspace(0, 1, 11):
            w = rs.kernel_weights("cubic", np.array([f + 1, f, f - 1, f - 2]))
            assert w.sum() == pytest.approx(1.0, abs=1e-12)

    def test_bilinear_tent(self):
        np.testing.assert_allclose(
            rs.kernel_weights("bilinear", np.array([0.0, 0.25, 1.0, 1.5])),
            [1.0, 0.75, 0.0, 0.0])

    def test_lanczos_r3(self):
        # sinc(x)*sinc(x/3): L(0)=1, L(n)=0 for integer n≠0, |x|>=3 → 0
        x = np.array([0.0, 1.0, 2.0, 3.0, 2.9999, -1.0])
        w = rs.kernel_weights("lanczos", x)
        assert w[0] == 1.0
        assert abs(w[1]) < 1e-12 and abs(w[2]) < 1e-12 and w[3] == 0.0
        assert w[5] == pytest.approx(w[1])

    def test_cubicspline_bspline_values(self):
        # B-spline: W(0)=2/3, W(1)=1/6, W(2)=0
        w = rs.kernel_weights("cubicspline", np.array([0.0, 1.0, 2.0]))
        np.testing.assert_allclose(w, [2 / 3, 1 / 6, 0.0], atol=1e-12)


class TestResampleGrid:
    def setup_method(self):
        rng = np.random.default_rng(7)
        self.src = rng.integers(0, 255, size=(16, 16)).astype(np.float64)

    def test_identity_at_centers(self):
        sy, sx = np.mgrid[0:16, 0:16] + 0.5
        for k in ("near", "bilinear", "cubic", "lanczos"):
            v, ok = rs.resample_grid(self.src, sx, sy, k)
            assert ok.all(), k
            np.testing.assert_allclose(v, self.src, atol=1e-9, err_msg=k)

    def test_bilinear_midpoint(self):
        v, ok = rs.resample_grid(self.src, np.array([1.0]), np.array([1.0]),
                                 "bilinear")
        expect = self.src[0:2, 0:2].mean()
        assert v[0] == pytest.approx(expect)

    def test_out_of_bounds_invalid(self):
        v, ok = rs.resample_grid(self.src, np.array([-5.0]), np.array([2.0]),
                                 "bilinear")
        assert not ok[0]

    def test_nodata_dropped_and_renormalized(self):
        src = self.src.copy()
        src[0, 0] = -999
        v, ok = rs.resample_grid(src, np.array([1.0]), np.array([1.0]),
                                 "bilinear", nodata=-999)
        expect = (src[0, 1] + src[1, 0] + src[1, 1]) / 3.0
        assert v[0] == pytest.approx(expect)

    def test_near_picks_containing_pixel(self):
        v, _ = rs.resample_grid(self.src, np.array([3.99, 4.0]),
                                np.array([0.5, 0.5]), "near")
        assert v[0] == self.src[0, 3]
        assert v[1] == self.src[0, 4]


class TestBlockReduce:
    def test_average_sum_minmax(self):
        a = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.float64)
        np.testing.assert_allclose(rs.block_reduce(a, 2, 2, "average"),
                                   [[3.5, 5.5]])
        np.testing.assert_allclose(rs.block_reduce(a, 2, 2, "sum"),
                                   [[14.0, 22.0]])
        np.testing.assert_allclose(rs.block_reduce(a, 2, 2, "min"), [[1, 3]])
        np.testing.assert_allclose(rs.block_reduce(a, 2, 2, "max"), [[6, 8]])

    def test_mode_first_tiebreak(self):
        # GWKTS_First is INCREMENTAL (alg/gdalwarpkernel.cpp:7392-7420):
        # the winner is the value that first REACHES the max count in scan
        # order.  [1,2,2,1]: 2 reaches count 2 before 1 does -> 2 wins.
        # (Validated against utmsmall_mode.tiff / int16-neg_mode goldens.)
        a = np.array([[1, 2], [2, 1]], dtype=np.float64)
        assert rs.block_reduce(a, 2, 2, "mode")[0, 0] == 2.0
        b = np.array([[2, 1], [1, 2]], dtype=np.float64)
        assert rs.block_reduce(b, 2, 2, "mode")[0, 0] == 1.0
        # no tie: clear majority wins regardless of order
        c = np.array([[3, 3], [1, 3]], dtype=np.float64)
        assert rs.block_reduce(c, 2, 2, "mode")[0, 0] == 3.0

    def test_rms(self):
        a = np.array([[3.0, 4.0]])
        assert rs.block_reduce(a, 1, 2, "rms")[0, 0] == pytest.approx(
            np.sqrt(12.5))

    def test_nodata_average(self):
        a = np.array([[10.0, -1.0], [20.0, -1.0]])
        out = rs.block_reduce(a, 2, 2, "average", nodata=-1)
        assert out[0, 0] == 15.0

    def test_downsample2_odd_pads_edge(self):
        a = np.arange(9, dtype=np.float64).reshape(3, 3)
        out = rs.downsample2_average(a)
        assert out.shape == (2, 2)
        assert out[0, 0] == pytest.approx(2.0)  # (0+1+3+4)/4


class TestChecksum:
    def test_zeros_and_known(self):
        assert cks.checksum(np.zeros((8, 8), np.uint8)) == 0
        # hand-computed: 1-pixel value 100 → 100 % 7
        assert cks.checksum(np.array([[100]], np.uint8)) == 100 % 7

    def test_prime_cycle_position_sensitivity(self):
        # same multiset of values, different layout → different checksum
        a = np.array([[10, 20], [30, 40]], np.uint8)
        b = np.array([[20, 10], [40, 30]], np.uint8)
        assert cks.checksum(a) != cks.checksum(b)

    def test_manual_small_case(self):
        # 1x12 row exercises the 11-prime wraparound:
        vals = np.arange(1, 13, dtype=np.int64)
        primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
        expect = sum(int(v) % primes[i % 11] for i, v in enumerate(vals)) & 0xFFFF
        assert cks.checksum(vals[None, :].astype(np.uint8)) == expect

    def test_float_copywords_rounding(self):
        # 0.5 → 1 (add .5 → 1.0 trunc 1); -0.4 → trunc(0.1)=0
        arr = np.array([[0.5, -0.4, 1.6]], dtype=np.float64)
        primes = [7, 11, 13]
        expect = (1 % 7 + 0 % 11 + 2 % 13) & 0xFFFF
        assert cks.checksum(arr) == expect


class TestCodecs:
    def test_png_roundtrip_shapes(self):
        for shape in [(5, 7), (8, 3, 3), (4, 4, 4)]:
            a = (np.arange(np.prod(shape)) % 256).astype(np.uint8).reshape(shape)
            out = png.decode_png(png.encode_png(a))
            np.testing.assert_array_equal(out, a.squeeze() if len(shape) == 2
                                          else a)

    def test_png_decodes_filtered_scanlines(self):
        import struct
        import zlib
        # hand-build a PNG with Sub(1) and Up(2) filters
        w, h = 4, 2
        row0 = bytes([1, 10, 5, 5, 5])        # Sub: 10,15,20,25
        row1 = bytes([2, 1, 1, 1, 1])         # Up: 11,16,21,26
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(row0 + row1))
               + chunk(b"IEND", b""))
        out = png.decode_png(buf)
        np.testing.assert_array_equal(out, [[10, 15, 20, 25], [11, 16, 21, 26]])

    def test_fake_jpeg_lossy_psnr_gate(self):
        px = images.image_pixels(3)
        rec = codecs.decode(codecs.encode(px, "jpeg"))
        assert rec.shape == px.shape
        p = rs.psnr(px, rec)
        assert p >= 40.0      # north-rule lossy gate
        assert p < 60.0       # genuinely lossy, not a pass-through

    def test_png_lossless(self):
        px = images.image_pixels(2)
        assert np.array_equal(codecs.decode(codecs.encode(px, "png")), px)


class TestImageFixtures:
    def test_determinism(self):
        a = images.synthesize_images_batch([5, 6])
        b = images.synthesize_images_batch([5, 6])
        assert a.equals(b)

    def test_duplicate_every_97(self):
        assert np.array_equal(images.image_pixels(97), images.image_pixels(0))
        t0 = images.synthesize_images_batch([0])
        t97 = images.synthesize_images_batch([97])
        assert t0["phash"][0].as_py() == t97["phash"][0].as_py()
        assert t0["image_id"][0].as_py() != t97["image_id"][0].as_py()

    def test_schema_matches_input_hint(self):
        t = images.synthesize_images_batch([0, 1, 2])
        assert t.schema.names[:7] == ["image_id", "bytes", "w", "h", "fmt",
                                      "caption", "phash"]

    def test_hot_box_placement(self):
        spec = images.image_spec(7)  # i % 10 == 7 → hot box
        lon0, lat0, lon1, lat1 = spec["lonlat_bbox"]
        assert images.HOT_BOX[0] <= lon0 <= images.HOT_BOX[2]

    def test_zones_and_points_tables(self):
        z = images.make_zones_table(40)
        assert z.num_rows == 42  # +hotbox +sliver
        from raydal.geo import wkb as W
        for blob in z["wkb"].to_pylist()[:8]:
            assert W.wkb_geom_type(blob) in (W.POLYGON, W.MULTIPOLYGON)
        p = images.make_points_table(100)
        assert p.num_rows >= 100


class TestJpegTiffWrite:
    """JPEG compression (tag 7) in write_tiff / write_cog — lossy
    round-trips through the from-scratch reader at PSNR >= 40 dB (the
    north rule's lossy gate)."""

    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255 ** 2 / mse)

    def test_strip_jpeg_rgb_and_gray(self):
        from raydal.io.images import image_pixels
        from raydal.io.tiff import read_tiff, write_tiff

        px = image_pixels(3)
        bands = [np.ascontiguousarray(px[:, :, i]) for i in range(3)]
        back = read_tiff(write_tiff(bands, compression="jpeg"))
        assert min(self._psnr(b, r)
                   for b, r in zip(bands, back.bands)) >= 40
        g = bands[0]
        back = read_tiff(write_tiff(g, compression="jpeg"))
        assert self._psnr(g, back.bands[0]) >= 40

    def test_cog_jpeg_tiles_and_overviews(self):
        from raydal.io.tiff import (read_tiff, read_tiff_overviews,
                                    write_cog)

        big = (np.add.outer(np.arange(600), np.arange(600))
               % 251).astype(np.uint8)
        cog = write_cog([big], blocksize=256, compression="jpeg")
        back = read_tiff(cog)
        assert self._psnr(big, back.bands[0]) >= 40
        ovs = read_tiff_overviews(cog)
        assert [o.bands[0].shape for o in ovs] == [
            (600, 600), (300, 300), (150, 150)]
        # lossy tiles compress: the file must be much smaller than raw
        assert len(cog) < big.nbytes // 3

    def test_jpeg_write_rejects_unsupported(self):
        from raydal.io.tiff import write_tiff

        with pytest.raises(NotImplementedError):
            write_tiff(np.zeros((8, 8), np.uint16), compression="jpeg")
