"""Viewshed vs the reference's own published expected grids.

Every expected array below is transcribed VERBATIM from
``autotest/cpp/test_viewshed.cpp`` (the reference's unit tests for
``alg/viewshed``) — min/max-distance masking with window shrink, angle
masking, high/low pitch masks, the three output modes, and all eight
out-of-raster observer cases of GDAL #9501.
"""

import numpy as np
import pytest

from raydal.ops.viewshed import viewshed

IN_5x3 = np.array([[1, 2, 0, 4, 1],
                   [0, 0, 2, 1, 0],
                   [1, 0, 0, 3, 3]], dtype=np.float64)


def to_i8(a):
    # GDALCopyWords float → Int8: floor(v + 0.5), clamp (255 → 127)
    return np.clip(np.floor(a + 0.5), -128, 127).astype(np.int8)


class TestPublishedGrids:
    def test_all_visible(self):
        dem = np.array([[1, 2, 3], [4, 5, 6], [3, 2, 1]], float)
        out, org = viewshed(dem, 1, 1)
        assert org == (0, 0)
        assert (out == 255.0).all()

    def test_min_max_mask(self):
        out, org = viewshed(np.zeros((15, 15)), 7, 7,
                            min_distance=2, max_distance=6)
        assert out.shape == (13, 13) and org == (1, 0)
        exp = np.array([
            0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
            127, 0, 0, 0, 0, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 0, 0, 127, 127, 127, 127, 0, 0, 0, 127, 127,
            127, 127, 0, 127, 127, 127, 127, 127, 0, 0, 0, 127, 127,
            127, 127, 127, 0, 127, 127, 127, 127, 0, 0, 0, 127, 127,
            127, 127, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 0,
            0, 0], dtype=np.int8).reshape(13, 13)
        assert (to_i8(out) == exp).all()

    def test_angle_slice(self):
        out, org = viewshed(np.zeros((17, 17)), 8, 8,
                            start_angle=0, end_angle=30)
        assert out.shape == (9, 6) and org == (8, 0)
        exp = np.array([
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
            127, 127, 127, 127, 0, 0, 127, 127, 127, 127, 0, 0, 127,
            127, 127, 0, 0, 0, 127, 127, 127, 0, 0, 0, 127, 127, 0, 0,
            0, 0, 127, 127, 0, 0, 0, 0, 127, 0, 0, 0, 0, 0],
            dtype=np.int8).reshape(9, 6)
        assert (to_i8(out) == exp).all()

    def test_angle_wide_slice(self):
        out, org = viewshed(np.zeros((11, 11)), 5, 5,
                            start_angle=0, end_angle=300)
        assert out.shape == (11, 11) and org == (0, 0)
        exp = np.array([
            0, 0, 0, 0, 0, 127, 127, 127, 127, 127, 127, 0, 0, 0,
            0, 0, 127, 127, 127, 127, 127, 127, 127, 0, 0, 0, 0,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 0, 0,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127],
            dtype=np.int8).reshape(11, 11)
        assert (to_i8(out) == exp).all()

    def test_high_pitch_mask(self):
        dem = np.zeros((15, 15))
        dem.ravel()[110:120] = [1, 3, 5, 7, 9, 11, 13, 15, 17, 19]
        out, _ = viewshed(dem, 3, 7, high_pitch=58)
        exp = np.array([
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 0, 0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127,
            127, 0, 0, 0, 0, 0, 0, 0, 0, 0, 127, 127, 127, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 0, 0, 0, 127, 127, 127,
            127, 127, 127, 0, 0, 0, 0, 0, 0, 0, 0, 0, 127, 127, 127,
            127, 127, 127, 127, 0, 0, 0, 0, 0, 0, 0, 0, 127, 127, 127,
            127, 127, 127, 127, 127, 0, 0, 0, 0, 0, 0, 0, 127, 127,
            127, 127, 127, 127, 127, 127, 127, 0, 0, 0, 0, 0, 0, 127,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 0, 0, 0, 0, 0,
            127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
            0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127,
            127, 127, 0, 0, 0], dtype=np.int8).reshape(15, 15)
        assert (to_i8(out) == exp).all()

    def test_low_pitch_dem_mode(self):
        dem = np.zeros((5, 5))
        dem[2, 2] = 5
        out, _ = viewshed(dem, 2, 2, low_pitch=-45, mode="dem")
        exp = np.array([
            2.17157, 2.76393, 3, 2.76393, 2.17157,
            2.76393, 3.58579, 4, 3.58579, 2.76393,
            3, 4, 5, 4, 3,
            2.76393, 3.58579, 4, 3.58579, 2.76393,
            2.17157, 2.76393, 3, 2.76393, 2.17157]).reshape(5, 5)
        assert np.allclose(out, exp, atol=1e-5)


class TestSimpleHeightModes:
    IN = np.array([[-1, 0, 1, 0, -1], [-1, 2, 0, 4, -1],
                   [-1, 1, 0, -1, -1], [0, 3, 0, 2, 0],
                   [-1, 0, 0, 3, -1]], dtype=np.float64)
    OBSERVABLE = np.array([[4, 2, 0, 4, 8], [3, 2, 0, 4, 3],
                           [2, 1, 0, -1, -2], [4, 3, 0, 2, 1],
                           [6, 3, 0, 2, 4]], dtype=np.float64)

    def test_normal(self):
        out, _ = viewshed(self.IN, 2, 2)
        exp = np.where(self.IN >= self.OBSERVABLE, 255.0, 0.0)
        assert (out == exp).all()

    def test_dem(self):
        out, _ = viewshed(self.IN, 2, 2, mode="dem")
        assert (out == np.maximum(self.OBSERVABLE, 0.0)).all()

    def test_ground(self):
        out, _ = viewshed(self.IN, 2, 2, mode="ground")
        assert (out == np.maximum(0.0, self.OBSERVABLE - self.IN)).all()


class TestDemVsGround:
    """GDAL issue #9501 cases (1-D rasters)."""

    CASES = [
        ([0, 0, 0, 1, 0, 0, 0, 0], (2, 0),
         [0, 0, 0, 0, 2, 3, 4, 5], [0, 0, 0, 1, 2, 3, 4, 5]),
        ([1, 1, 0, 1, 0, 1, 2, 2], (3, 0),
         [0, 0, 0, 0, 0, 0, 0, 1 / 3], [1, 0, 0, 1, 0, 0, 1, 7 / 3]),
        ([0, 0, 0, 1, 1, 0, 0, 0], (0, 0),
         [0, 0, 0, 0, 1 / 3, 5 / 3, 2, 7 / 3],
         [0, 0, 0, 0, 4 / 3, 5 / 3, 2, 7 / 3]),
        ([0, 0, 1, 2, 3, 4, 5, 6], (0, 0),
         [0] * 8, [0, 0, 0, 3 / 2, 8 / 3, 15 / 4, 24 / 5, 35 / 6]),
        ([0, 0, 1, 1, 3, 4, 5, 4], (0, 0),
         [0, 0, 0, .5, 0, 0, 0, 11 / 6],
         [0, 0, 0, 3 / 2, 2, 15 / 4, 24 / 5, 35 / 6]),
    ]

    @pytest.mark.parametrize("case", range(5))
    def test_case(self, case):
        inrow, obs, ground, demv = self.CASES[case]
        a = np.array([inrow], float)
        g, _ = viewshed(a, obs[0], obs[1], mode="ground")
        d, _ = viewshed(a, obs[0], obs[1], mode="dem")
        assert np.allclose(g[0], ground)
        assert np.allclose(d[0], demv)


class TestOutOfRasterObserver:
    """oor_right / oor_left / oor_above / oor_below DEM-mode grids."""

    CASES = [
        ((6, 1), [16 / 3, 29 / 6, 13 / 3, 1, 1, 3, 2.5, 4 / 3, 0, 0,
                  13 / 3, 23 / 6, 10 / 3, 3, 3]),
        ((6, 2), [26 / 5, 17 / 4, 11 / 3, .5, 1, 6, 4.5, 3, 1.5, 0,
                  9, 7.5, 6, 4.5, 3]),
        ((-2, 1), [1, 1, 2, 2.5, 4.5, 0, 0, 0, 2.5, 3, 1, 1, 1, 1.5,
                   3.5]),
        ((-2, 2), [1, .5, 5 / 3, 2.25, 4.2, 0, .5, 1, 2.5, 3.1, 1, 1.5,
                   2, 2.5, 3.6]),
        ((2, -2), [1, 2, 0, 4, 1, 2.5, 2, 0, 4, 4.5, 3, 8 / 3, 8 / 3,
                   14 / 3, 17 / 3]),
        ((-2, -2), [1, 2, 0, 4, 1, 0, 1.5, 2.5, 1.25, 3.15, 1, 0.5, 2,
                    3, 2.2]),
        ((2, 4), [1 / 3, 2 / 3, 8 / 3, 11 / 3, 5, 0.5, 0, 0, 3, 4.5,
                  1, 0, 0, 3, 3]),
        ((6, 4), [4.2, 6, 6, 1.5, 1, 1.35, 2.25, 4.5, 4.5, 0, 1, 0, 0,
                  3, 3]),
    ]

    @pytest.mark.parametrize("case", range(8))
    def test_case(self, case):
        obs, exp = self.CASES[case]
        out, _ = viewshed(IN_5x3, obs[0], obs[1], mode="dem")
        assert np.allclose(out, np.array(exp).reshape(3, 5))


class TestViewshedRay:
    def test_actor_batch(self, ray_session):
        import ray
        import ray.data
        import pyarrow as pa

        from raydal.ops.viewshed import ViewshedActor

        rng = np.random.default_rng(9)
        dem = rng.uniform(0, 20, (64, 64))
        dem_ref = ray.put(dem)
        obs = pa.Table.from_pydict({
            "observer_id": pa.array(np.arange(12), pa.int64()),
            "px": pa.array((np.arange(12) * 5 + 3) % 64, pa.int64()),
            "py": pa.array((np.arange(12) * 11 + 7) % 64, pa.int64()),
            "height": pa.array(np.full(12, 2.0), pa.float64())})
        out = (ray.data.from_arrow(obs)
               .map_batches(ViewshedActor,
                            fn_constructor_kwargs={"dem_ref": dem_ref},
                            batch_format="pyarrow", concurrency=2,
                            batch_size=4)
               .to_pandas().sort_values("observer_id"))
        assert len(out) == 12
        assert (out["n_cells"] == 64 * 64).all()
        assert (out["n_visible"] > 0).all()
        assert (out["n_visible"] <= out["n_cells"]).all()
        # serial replay matches the distributed result
        px = obs["px"].to_pylist()
        py = obs["py"].to_pylist()
        for _, r in out.head(3).iterrows():
            oid = int(r["observer_id"])
            grid, _ = viewshed(dem, px[oid], py[oid], 2.0)
            assert int((grid == 255.0).sum()) == r["n_visible"]


class TestReviewRegressions:
    def test_batch_respects_visible_val(self):
        import pyarrow as pa

        from raydal.ops.viewshed import viewshed_batch

        dem = np.zeros((9, 9))
        obs = pa.Table.from_pydict({
            "observer_id": pa.array([0], pa.int64()),
            "px": pa.array([4], pa.int64()),
            "py": pa.array([4], pa.int64()),
            "height": pa.array([1.0], pa.float64())})
        out = viewshed_batch(obs, dem, visible_val=1.0)
        assert out["n_visible"][0].as_py() == 81

    def test_batch_rejects_non_normal_mode(self):
        import pyarrow as pa

        from raydal.ops.viewshed import viewshed_batch

        obs = pa.Table.from_pydict({
            "observer_id": pa.array([0], pa.int64()),
            "px": pa.array([1], pa.int64()),
            "py": pa.array([1], pa.int64()),
            "height": pa.array([0.0], pa.float64())})
        with pytest.raises(ValueError):
            viewshed_batch(obs, np.zeros((3, 3)), mode="dem")
