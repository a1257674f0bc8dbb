"""Tests for the composable step registry (gdalalg-pipeline analogue)."""

import numpy as np
import pytest
import pyarrow as pa

from raydal.pipeline import STEP_REGISTRY, Step, run_pipeline


class TestStepRegistry:
    def test_registry_has_core_steps(self):
        for name in ("footprint", "tile-assign", "vector-reproject",
                     "explode-collections", "geom-stats", "warp",
                     "text-quality", "lang-id", "exact-dedup"):
            assert name in STEP_REGISTRY, name

    def test_compose_footprint_assign(self, ray_session):
        import ray.data

        from raydal.io.images import synthesize_images_batch

        ds = ray.data.from_arrow(synthesize_images_batch(np.arange(12)))
        out = run_pipeline(ds, [("footprint", {"dst_crs": 3857}),
                                ("tile-assign", {"z": 7})])
        pdf = out.to_pandas()
        assert {"image_id", "z", "tile_x", "tile_y", "cell"} <= set(pdf)
        assert (pdf["z"] == 7).all()

    def test_step_object_and_text_chain(self, ray_session):
        import ray.data

        docs = pa.Table.from_pydict({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["The quick brown fox and the dog",
                              "short"])})
        ds = ray.data.from_arrow(docs)
        out = run_pipeline(ds, [Step("q", STEP_REGISTRY["text-quality"])])
        pdf = out.to_pandas()
        assert "quality" in pdf and "n_tokens" in pdf
        assert pdf["n_tokens"].tolist() == [7, 1]


class TestSavedPipeline:
    """GDALG-analogue (de)serialization round trip."""

    def test_roundtrip_and_execution(self, ray_session, tmp_path):
        import ray.data

        from raydal.pipeline import (load_pipeline, run_pipeline,
                                     save_pipeline)
        from raydal.io.images import synthesize_images_batch

        steps = [("footprint", {"dst_crs": 3857}),
                 ("tile-assign", {"z": 6, "carry_cols": ["image_id"]})]
        p = tmp_path / "pipe.json"
        save_pipeline(p, steps)
        loaded = load_pipeline(p)
        assert loaded == [(n, dict(kw)) for n, kw in steps]
        t = synthesize_images_batch(np.arange(6)).drop_columns(["bytes"])
        ds = ray.data.from_arrow(t)
        out1 = run_pipeline(ds, steps).to_pandas()
        out2 = run_pipeline(ray.data.from_arrow(t), loaded).to_pandas()
        assert len(out1) == len(out2) > 0
        assert sorted(out1["cell"]) == sorted(out2["cell"])

    def test_unknown_step_rejected_at_load(self, tmp_path):
        import json

        import pytest as _pytest

        from raydal.pipeline import pipeline_from_json

        doc = json.dumps({"type": "raydal_pipeline", "version": 2,
                          "steps": [{"name": "no-such-step", "params": {}}]})
        with _pytest.raises(ValueError):
            pipeline_from_json(doc)


class TestVirtualMosaic:
    """GTI-analogue footprint-index dataset + window reads."""

    def test_index_prunes_and_window_composes(self, ray_session):
        import ray.data

        from raydal.ops.gti import VirtualMosaic, build_tile_index
        from raydal.pipelines import ensure_images_parquet

        path = ensure_images_parquet("/root/testdata/sf0.001")
        idx = build_tile_index(ray.data.read_parquet(path))
        assert idx.num_rows == 200
        vm = VirtualMosaic(idx, path)
        x0 = float(np.asarray(idx["xmin"])[0])
        x1 = float(np.asarray(idx["xmax"])[0])
        y0 = float(np.asarray(idx["ymin"])[0])
        y1 = float(np.asarray(idx["ymax"])[0])
        sel = vm.select(x0, y0, x1, y1)
        assert 1 <= len(sel) < idx.num_rows  # index actually prunes
        out, filled = vm.read_window(x0, y0, x1, y1, 64, 64)
        # UTM footprints are rotated in EPSG:3857 so the bbox window has
        # uncovered corners; most of it must still fill
        assert filled.mean() > 0.5
        assert out[filled].mean() > 0        # real pixels composed
        # empty window: nothing selected, nothing read
        far = vm.select(x0 + 1e9, y0 + 1e9, x0 + 1e9 + 10, y0 + 1e9 + 10)
        assert len(far) == 0


class TestRasterClipSelect:
    def test_clip_updates_window_and_gt(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(4))
        gt = t["gt"][0].as_py()
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        # window covering the left half of image 0 (in its own CRS)
        xmin = gt[0]
        xmax = gt[0] + gt[1] * (w // 2)
        ymax = gt[3]
        ymin = gt[3] + gt[5] * h
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-clip", {"xmin": xmin, "ymin": ymin,
                                             "xmax": xmax, "ymax": ymax})])
        df = out.to_pandas()
        row = df[df["image_id"] == t["image_id"][0].as_py()].iloc[0]
        assert row["w"] == w // 2
        px = decode(row["bytes"])
        assert px.shape[1] == w // 2
        orig = decode(t["bytes"][0].as_py())
        assert px.shape[0] == row["h"]
        # png round-trips losslessly: clipped pixels == original slice
        if t["fmt"][0].as_py() == "png":
            np.testing.assert_array_equal(px, orig[:row["h"], :w // 2])
        assert row["gt"][0] == gt[0]

    def test_select_single_band(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-select", {"bands": [2]})])
        df = out.to_pandas()
        px = decode(df.iloc[0]["bytes"])
        orig = decode(t["bytes"][0].as_py())
        assert px.ndim == 2
        if t["fmt"][0].as_py() == "png":
            np.testing.assert_array_equal(px, orig[:, :, 1])


class TestSourceSinkRegistry:
    def test_registered_sources_and_sinks(self, ray_session, tmp_path):
        from raydal.pipeline import (SINK_REGISTRY, SOURCE_REGISTRY,
                                     open_source, register_source,
                                     write_sink)

        assert {"parquet", "images", "shapefile"} <= set(SOURCE_REGISTRY)
        assert {"parquet", "checkpointed-parquet"} <= set(SINK_REGISTRY)
        ds = open_source("shapefile",
                         "/root/reference/autotest/ogr/data/poly.shp")
        assert ds.count() == 10
        write_sink("parquet", ds.select_columns(["fid", "EAS_ID"]),
                   str(tmp_path / "out"))
        import ray.data
        back = ray.data.read_parquet(str(tmp_path / "out"))
        assert back.count() == 10

        @register_source("ten-rows")
        def _ten():
            import ray.data
            return ray.data.range(10)

        assert open_source("ten-rows").count() == 10
        with pytest.raises(KeyError):
            open_source("no-such-source")


class TestRasterCutline:
    def test_cutline_masks_outside_keeps_inside(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        gt = t["gt"][0].as_py()
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        # world-coord rectangle covering pixel columns [0, w/2), all rows
        # of image 0 (north-up gt)
        x0, x1 = gt[0], gt[0] + gt[1] * (w // 2)
        y0, y1 = gt[3] + gt[5] * h, gt[3]
        ring = [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-cutline", {"rings": [ring]})])
        df = out.to_pandas()
        row = df[df["image_id"] == t["image_id"][0].as_py()].iloc[0]
        px = decode(row["bytes"])
        orig = decode(t["bytes"][0].as_py())
        if t["fmt"][0].as_py() == "png":
            b = px if px.ndim == 2 else px[:, :, 0]
            ob = orig if orig.ndim == 2 else orig[:, :, 0]
            np.testing.assert_array_equal(b[:, w // 2:], 0)
            np.testing.assert_array_equal(b[:, :w // 2], ob[:, :w // 2])

    def test_blend_feathers_boundary(self):
        from raydal.ops.cutline import cutline_density_mask

        ring = np.array([[4, 4], [4, 16], [16, 16], [16, 4], [4, 4]],
                        dtype=float)
        m = cutline_density_mask([ring], 20, 20, blend_dist=3.0)
        assert m[10, 10] == 1.0          # deep inside, beyond blend
        assert m[0, 0] == 0.0            # far outside
        inside_near = m[10, 5]           # 1 px inside the x=4 edge
        outside_near = m[10, 3]          # 0.5 px outside
        assert 0.5 < inside_near < 1.0
        assert 0.0 < outside_near < 0.5


class TestRasterResize:
    def test_resize_dims_and_gt(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-resize", {"width": 48, "height": 32})])
        df = out.to_pandas()
        row = df.iloc[0]
        assert row["w"] == 48 and row["h"] == 32
        px = decode(row["bytes"])
        assert px.shape[:2] == (32, 48)
        gt0 = t["gt"][0].as_py()
        # pixel size scales by the resize factor; origin unchanged
        assert row["gt"][1] == pytest.approx(gt0[1] * w / 48)
        assert row["gt"][5] == pytest.approx(gt0[5] * h / 32)
        assert row["gt"][0] == gt0[0] and row["gt"][3] == gt0[3]


class TestWarpCutline:
    def test_warp_with_cutline_masks_source(self, ray_session):
        import ray.data

        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        gt = t["gt"][0].as_py()
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        # left-half rectangle in world coords of image 0's CRS
        x0, x1 = gt[0], gt[0] + gt[1] * (w / 2)
        y0, y1 = gt[3] + gt[5] * h, gt[3]
        ring = [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]
        # cutline only makes sense per-CRS; run on image 0's row alone
        one = t.slice(0, 1)
        plain = run_pipeline(ray.data.from_arrow(one),
                             [("warp", {"concurrency": 1})]).to_pandas()
        cut = run_pipeline(
            ray.data.from_arrow(one),
            [("warp", {"concurrency": 1, "cutline": [ring]})]).to_pandas()
        assert cut.iloc[0]["valid_frac"] < plain.iloc[0]["valid_frac"]
        assert cut.iloc[0]["valid_frac"] > 0.2
        # caption byte-equality invariant survives the masked path
        assert cut.iloc[0]["caption"] == plain.iloc[0]["caption"]

    def test_full_extent_cutline_is_identity(self, ray_session):
        import ray.data

        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        gt = t["gt"][0].as_py()
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        pad = abs(gt[1])  # one source pixel of margin
        x0, x1 = gt[0] - pad, gt[0] + gt[1] * w + pad
        y0, y1 = gt[3] + gt[5] * h - pad, gt[3] + pad
        ring = [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]
        plain = run_pipeline(ray.data.from_arrow(t),
                             [("warp", {"concurrency": 1})]).to_pandas()
        cut = run_pipeline(
            ray.data.from_arrow(t),
            [("warp", {"concurrency": 1, "cutline": [ring]})]).to_pandas()
        assert cut.iloc[0]["checksum_b0"] == plain.iloc[0]["checksum_b0"]


class TestFillFamilySteps:
    def test_sieve_proximity_fill_steps(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        for step, params in [("raster-sieve", {"threshold": 4}),
                             ("raster-proximity", {"max_dist": 10}),
                             ("raster-fill-nodata", {"nodata": 0})]:
            out = run_pipeline(ray.data.from_arrow(t), [(step, params)])
            df = out.to_pandas()
            assert len(df) == 2
            px = decode(df.iloc[0]["bytes"])
            assert px.shape[:2] == decode(t["bytes"][0].as_py()).shape[:2]


class TestBandKernelSteps:
    def test_scale_settype_reclassify_hillshade_colormap_collar(
            self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        orig = decode(t["bytes"][0].as_py())
        b0 = orig[:, :, 0] if orig.ndim == 3 else orig

        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-scale", {"scale": 0.5})]).to_pandas()
        px = decode(out.iloc[0]["bytes"])
        p0 = px[:, :, 0] if px.ndim == 3 else px
        if t["fmt"][0].as_py() == "png":
            expect = np.clip(np.floor(b0 * 0.5 + 0.5), 0, 255)
            np.testing.assert_array_equal(p0, expect.astype(np.uint8))

        for step, params in [
                ("raster-set-type", {"dtype": "uint8"}),
                ("raster-reclassify", {"table": {0: 255}, "default": None}),
                ("raster-hillshade", {}),
                ("raster-color-map", {"breakpoints": [
                    (0, (0, 0, 255)), (255, (255, 0, 0))]}),
                ("raster-clean-collar", {"threshold": 10})]:
            df = run_pipeline(ray.data.from_arrow(t),
                              [(step, params)]).to_pandas()
            assert len(df) == 2
            assert decode(df.iloc[0]["bytes"]).shape[:2] == b0.shape


class TestContourStep:
    def test_contour_emits_world_polylines(self, ray_session):
        import ray.data

        from raydal.geo.wkb import parse_wkb, wkb_geom_type, LINESTRING
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-contour", {"levels": [128.0]})])
        df = out.to_pandas()
        assert len(df) > 0
        assert set(df["level"]) == {128.0}
        buf = df.iloc[0]["wkb"]
        assert wkb_geom_type(buf) == LINESTRING
        # world coordinates: inside the image's geotransformed extent
        gt = t["gt"][0].as_py()
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        _, coords = parse_wkb(buf)
        xs = coords[:, 0]
        assert xs.min() >= min(gt[0], gt[0] + gt[1] * w) - 1e-6
        assert xs.max() <= max(gt[0], gt[0] + gt[1] * w) + 1e-6


class TestContourPolygonsStep:
    def test_bands_partition_and_world_coords(self, ray_session):
        import ray.data

        from raydal.geo.wkb import POLYGON, wkb_area, wkb_geom_type
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-contour-polygons",
                             {"levels": [96.0, 160.0]})])
        df = out.to_pandas()
        assert len(df) > 0
        assert wkb_geom_type(df.iloc[0]["wkb"]) == POLYGON
        # three bands, ±inf open ends present
        assert np.isneginf(df["elev_min"].min())
        assert np.isposinf(df["elev_max"].max())
        # band polygons partition the pixel-center domain (world area
        # = pixel area x |gt scale|^2; wkb_area already nets out holes)
        gt = t["gt"][0].as_py()
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        total = sum(wkb_area(b) for b in df["wkb"])
        want = (w - 1) * (h - 1) * abs(gt[1] * gt[5])
        assert total == pytest.approx(want, rel=1e-9)


class TestPolygonizeStep:
    def test_polygonize_rows(self, ray_session):
        import ray.data

        from raydal.geo.wkb import POLYGON, wkb_geom_type
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        out = run_pipeline(
            ray.data.from_arrow(t),
            [("raster-sieve", {"threshold": 64}),  # coarsen components
             ("raster-polygonize", {})])
        df = out.to_pandas()
        assert len(df) > 0
        assert wkb_geom_type(df.iloc[0]["wkb"]) == POLYGON
        # pixel counts conserve the raster area
        w, h = t["w"][0].as_py(), t["h"][0].as_py()
        per_img = df.groupby("image_id")["n_pixels"].sum()
        assert int(per_img.iloc[0]) == w * h


class TestStepReviewRegressions:
    def test_scale_preserves_all_bands(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        orig = decode(t["bytes"][0].as_py())
        if orig.ndim != 3:
            pytest.skip("fixture not multiband")
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-scale", {"scale": 1.0})]).to_pandas()
        px = decode(out.iloc[0]["bytes"])
        assert px.ndim == 3 and px.shape[2] == orig.shape[2]
        if t["fmt"][0].as_py() == "png":
            np.testing.assert_array_equal(px, orig)

    def test_contour_world_coords_pixel_center_offset(self, ray_session):
        import ray.data

        from raydal.geo.wkb import parse_wkb
        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.ops.contour import contour_segments
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        px = decode(t["bytes"][0].as_py())
        band = (px[:, :, 0] if px.ndim == 3 else px).astype(np.float64)
        gt = t["gt"][0].as_py()
        # kernel's own gt path is the ground truth for world mapping
        segs = contour_segments(band, 128.0, gt=tuple(gt))
        ref_xs = np.asarray([p for s in segs for p in s])[:, 0]
        out = run_pipeline(ray.data.from_arrow(t),
                           [("raster-contour", {"levels": [128.0]})])
        xs = np.concatenate([
            parse_wkb(b)[1][:, 0]
            for b in out.to_pandas()["wkb"]])
        assert abs(xs.min() - ref_xs.min()) < 1e-9
        assert abs(xs.max() - ref_xs.max()) < 1e-9

    def test_reclassify_range_keys(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        out = run_pipeline(
            ray.data.from_arrow(t),
            [("raster-reclassify", {"table": {(0, 255): 7}})]).to_pandas()
        px = decode(out.iloc[0]["bytes"])
        if t["fmt"][0].as_py() == "png":
            assert (np.unique(px) == [7]).all()


class TestDemSteps:
    @pytest.mark.parametrize("step", ["raster-slope", "raster-aspect",
                                      "raster-tpi", "raster-tri",
                                      "raster-roughness"])
    def test_dem_family_steps_run(self, ray_session, step):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        out = run_pipeline(ray.data.from_arrow(t), [step]).to_pandas()
        px = decode(out.iloc[0]["bytes"])
        assert px.shape[:2] == decode(t["bytes"][0].as_py()).shape[:2]


class TestDemStepFloatOutputs:
    def test_aspect_full_range_survives(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        out = run_pipeline(ray.data.from_arrow(t),
                           ["raster-aspect"]).to_pandas()
        assert out.iloc[0]["fmt"] == "tiff"
        px = decode(out.iloc[0]["bytes"])
        assert px.dtype == np.float32
        vals = px[np.isfinite(px) & (px != -9999.0)]
        # azimuth degrees span past the old uint8 clamp point
        assert vals.max() > 255.5

    def test_reclassify_rejects_unrepresentable_target(self, ray_session):
        import ray.data

        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(1))
        with pytest.raises(ValueError):
            run_pipeline(ray.data.from_arrow(t),
                         [("raster-reclassify", {"mapping": "5 = 300"})])


class TestGeoreferenceGcpsStep:
    def test_affine_and_tps_methods(self, ray_session):
        import ray.data

        from raydal.pipeline import STEP_REGISTRY

        ds = ray.data.from_items([{"image_id": "a", "w": 100, "h": 80},
                                  {"image_id": "b", "w": 50, "h": 40}])
        gcps = [(0, 0, 400000, 370000), (100, 0, 410000, 370000),
                (100, 200, 410000, 368000)]
        out = STEP_REGISTRY["georeference-gcps"](
            ds, gcps=gcps, method="affine").to_pandas()
        gt = list(out["gt"].iloc[0])
        assert abs(gt[0] - 400000.0) < 1e-6
        assert abs(gt[1] - 100.0) < 1e-9
        assert abs(gt[5] - -10.0) < 1e-9
        out2 = STEP_REGISTRY["georeference-gcps"](
            ds, gcps=gcps, method="tps").to_pandas()
        gt2 = [round(v, 6) for v in out2["gt"].iloc[0]]
        assert gt2 == [400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0]

    def test_rejects_degenerate(self, ray_session):
        import pytest
        import ray.data

        from raydal.pipeline import STEP_REGISTRY

        ds = ray.data.from_items([{"image_id": "a"}])
        with pytest.raises(ValueError, match="affine fit"):
            STEP_REGISTRY["georeference-gcps"](
                ds, gcps=[(0, 0, 0, 0), (0, 10, 0, 10),
                          (10, 0, 10, 10), (10, 10, 10, 0)],
                method="affine")


def test_georeference_rpc_dem_step(ray_session):
    """georeference-gcps method='rpc' with a DEM: the stored affine
    approximation anchors at the RPC+DEM forward transform of pixel
    (0, 0)."""
    import re

    import numpy as np
    import pyarrow as pa
    import ray

    from raydal.geo.gcp import RPCDem, RPCTransformer
    from raydal.pipeline import STEP_REGISTRY

    txt = open("/root/reference/autotest/gcore/data/rpc.vrt").read()
    md = dict(re.findall(r'<MDI key="([A-Z_]+)">([^<]+)</MDI>', txt))
    rpc = {k: v for k, v in md.items()
           if "COEFF" in k or k.endswith("_OFF") or k.endswith("_SCALE")}
    # lat/long DEM centred on the scene, constant 120 m
    dem = np.full((50, 50), 120.0)
    dem_gt = (125.63, 0.002, 0.0, 39.95, 0.0, -0.002)

    ds = ray.data.from_items([{"image_id": "a"}])
    out = STEP_REGISTRY["georeference-gcps"](
        ds, method="rpc", rpc=rpc, dem=dem, dem_geotransform=dem_gt,
        rpc_height_scale=1.0).take_all()
    gt = out[0]["gt"]
    ref = RPCTransformer(rpc, dem=RPCDem(dem, dem_gt))
    lon, lat = ref.transform(np.array([0.0]), np.array([0.0]))
    assert abs(gt[0] - lon[0]) < 1e-9 and abs(gt[3] - lat[0]) < 1e-9
