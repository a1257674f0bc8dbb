"""Tests for the composable step registry (gdalalg-pipeline analogue)."""

import numpy as np
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
