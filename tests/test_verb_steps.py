"""Round-5 verb-sweep steps: the remaining reference CLI verbs
(apps/gdalalg_raster_*.cpp / gdalalg_vector_*.cpp) as pipeline steps,
plus the generic ``python -m raydal raster|vector VERB`` sugar."""

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from raydal.geo import wkb as W
from raydal.pipeline import STEP_REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "raydal"] + args,
                          cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=240)


def _vec_ds(ray_session):
    import ray.data

    sq = W.polygon_wkb([np.array([[0., 0.], [4., 0.], [4., 4.],
                                  [0., 4.], [0., 0.]])])
    bow = W.polygon_wkb([np.array([[0., 0.], [2., 1.], [2., 0.],
                                   [0., 1.], [0., 0.]])])
    pt = W.point_wkb(100.0, 100.0)
    tbl = pa.Table.from_pydict({
        "fid": pa.array([0, 1, 2], pa.int64()),
        "name": pa.array(["sq", "bow", "pt"], pa.string()),
        "wkb": pa.array([sq, bow, pt], pa.binary())})
    return ray.data.from_arrow(tbl)


def _collect(ds):
    return pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow"))


class TestVectorVerbSteps:
    def test_swap_xy(self, ray_session):
        out = _collect(STEP_REGISTRY["vector-swap-xy"](
            _vec_ds(ray_session)))
        t, p = W.parse_wkb(out["wkb"][2].as_py())
        assert t == W.POINT and tuple(p[0]) == (100.0, 100.0)
        t, p = W.parse_wkb(out["wkb"][0].as_py())
        # (4, 0) -> (0, 4)
        assert [0.0, 4.0] in p[0].tolist()

    def test_segmentize(self, ray_session):
        out = _collect(STEP_REGISTRY["vector-segmentize"](
            _vec_ds(ray_session), max_length=1.0))
        _, rings = W.parse_wkb(out["wkb"][0].as_py())
        # 4×4 square at max seg 1 → 16 edges + closing vertex
        assert len(rings[0]) == 17
        seg = np.diff(rings[0], axis=0)
        assert np.hypot(seg[:, 0], seg[:, 1]).max() <= 1.0 + 1e-12

    def test_simplify(self, ray_session):
        import ray.data

        line = W.linestring_wkb(np.array([[0., 0.], [5., 0.01],
                                          [10., 0.]]))
        ds = ray.data.from_arrow(pa.Table.from_pydict(
            {"wkb": pa.array([line], pa.binary())}))
        out = _collect(STEP_REGISTRY["vector-simplify"](
            ds, tolerance=0.1))
        _, pts = W.parse_wkb(out["wkb"][0].as_py())
        assert len(pts) == 2

    def test_make_valid_bowtie(self, ray_session):
        out = _collect(STEP_REGISTRY["vector-make-valid"](
            _vec_ds(ray_session)))
        mv = out["wkb"][1].as_py()
        assert W.wkb_geom_type(mv) == W.MULTIPOLYGON
        # bow-tie w=2 h=1 → two loops of area w*h/4 each
        assert W.wkb_area(mv) == pytest.approx(1.0, abs=1e-9)
        # valid input unchanged
        assert out["wkb"][0].as_py() == _vec_ds(
            ray_session).take(1)[0]["wkb"]

    def test_buffer(self, ray_session):
        out = _collect(STEP_REGISTRY["vector-buffer"](
            _vec_ds(ray_session), distance=1.0, quad_segs=16))
        # convex square: exact offset area 16 + 16 + pi (arc-segmented)
        a_sq = W.wkb_area(out["wkb"][0].as_py())
        assert a_sq == pytest.approx(16 + 16 + np.pi, rel=2e-3)
        # point: 64-gon circle area
        a_pt = W.wkb_area(out["wkb"][2].as_py())
        n = 64
        assert a_pt == pytest.approx(0.5 * n * np.sin(2 * np.pi / n),
                                     rel=1e-9)

    def test_select_and_filter(self, ray_session):
        sel = STEP_REGISTRY["vector-select"](
            _vec_ds(ray_session), fields="fid,name")
        assert sel.schema().names == ["fid", "name"]
        filt = _collect(STEP_REGISTRY["vector-filter"](
            _vec_ds(ray_session), bbox=[-1, -1, 10, 10]))
        assert filt.num_rows == 2  # the far point drops
        filt2 = _collect(STEP_REGISTRY["vector-filter"](
            _vec_ds(ray_session), where="name = 'pt'"))
        assert filt2.num_rows == 1
        assert filt2["fid"][0].as_py() == 2

    def test_concat(self, ray_session, tmp_path):
        import json

        p = tmp_path / "other.geojson"
        json.dump({"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"fid": 7, "name": "x"},
             "geometry": {"type": "Point",
                          "coordinates": [1.0, 1.0]}}]}, open(p, "w"))
        out = STEP_REGISTRY["vector-concat"](
            _vec_ds(ray_session), others=str(p))
        assert out.count() == 4

    def test_grid_nearest_exact(self, ray_session):
        import ray.data

        # one point per quadrant; nearest-neighbour grid cells take
        # exactly their quadrant's value
        tbl = pa.Table.from_pydict({
            "x": pa.array([1.0, 3.0, 1.0, 3.0]),
            "y": pa.array([1.0, 1.0, 3.0, 3.0]),
            "v": pa.array([10.0, 20.0, 30.0, 40.0])})
        ds = ray.data.from_arrow(tbl)
        out = _collect(STEP_REGISTRY["vector-grid"](
            ds, algorithm="nearest", width=4, height=4,
            extent=[0, 0, 4, 4], x_col="x", y_col="y", value_col="v",
            radius=10.0))
        assert out.num_rows == 1
        grid = np.frombuffer(out["data"][0].as_py(),
                             np.float64).reshape(4, 4)
        # band rows are north-up: row 0 is y≈3.5 → upper quadrants
        assert grid[0, 0] == 30.0 and grid[0, 3] == 40.0
        assert grid[3, 0] == 10.0 and grid[3, 3] == 20.0
        gt = out["geotransform"][0].as_py()
        assert gt == [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]

    def test_rasterize_band_rows(self, ray_session):
        import ray.data

        # a polygon spanning lon/lat (0..40, 0..40) at z=3
        poly = W.polygon_wkb([np.array([[0., 0.], [40., 0.],
                                        [40., 40.], [0., 40.],
                                        [0., 0.]])])
        ds = ray.data.from_arrow(pa.Table.from_pydict({
            "zone_id": pa.array([1], pa.int64()),
            "wkb": pa.array([poly], pa.binary())}))
        out = _collect(STEP_REGISTRY["vector-rasterize"](ds, z=3))
        assert out.num_rows >= 1
        assert set(out.column_names) >= {"image_id", "band", "data",
                                         "w", "h", "dtype",
                                         "geotransform"}
        total = sum(np.frombuffer(b, np.float64).sum()
                    for b in out["data"].to_pylist())
        assert total > 0


def _img_ds(ray_session, band, gt=(0.0, 1.0, 0.0, 4.0, 0.0, -1.0),
            fmt="tiff", extra=None):
    import ray.data

    from raydal.io.codecs import encode

    cols = {
        "image_id": pa.array(["img0"], pa.string()),
        "bytes": pa.array([encode(band, fmt)], pa.binary()),
        "fmt": pa.array([fmt], pa.string()),
        "gt": pa.array([list(gt)], pa.list_(pa.float64()))}
    for k, v in (extra or {}).items():
        cols[k] = v
    return ray.data.from_arrow(pa.Table.from_pydict(cols))


class TestRasterVerbSteps:
    def test_pixel_info_bilinear(self, ray_session):
        band = np.arange(16, dtype=np.uint8).reshape(4, 4)
        ds = _img_ds(ray_session, band)
        out = _collect(STEP_REGISTRY["raster-pixel-info"](
            ds, points=[[1.5, 2.5], [2.5, 1.5]]))
        # world (1.5, 2.5) → corner-based pixel (1.5, 1.5): the CENTER
        # of pixel (1,1) → exact band[1,1] = 5 (InterpolateAtPoint
        # corner convention, alg/gdal_interpolateatpoint.cpp)
        assert out["value"][0].as_py() == 5.0
        assert out["value"][1].as_py() == 10.0

    def test_unscale(self, ray_session):
        from raydal.io.codecs import decode

        band = np.array([[0, 10], [20, 30]], dtype=np.uint8)
        ds = _img_ds(ray_session, band)
        out = _collect(STEP_REGISTRY["raster-unscale"](
            ds, scale=0.5, offset=3.0))
        px = decode(out["bytes"][0].as_py())
        assert px.dtype == np.float32
        assert px[1, 1] == pytest.approx(18.0)
        assert out["fmt"][0].as_py() == "tiff"

    def test_unscale_row_columns(self, ray_session):
        from raydal.io.codecs import decode

        band = np.array([[4]], dtype=np.uint8)
        ds = _img_ds(ray_session, band,
                     extra={"scale": pa.array([2.0]),
                            "offset": pa.array([1.0])})
        out = _collect(STEP_REGISTRY["raster-unscale"](ds))
        assert decode(out["bytes"][0].as_py())[0, 0] == 9.0

    def test_viewshed_flat_dem(self, ray_session):
        from raydal.io.codecs import decode

        dem = np.zeros((9, 9), dtype=np.uint8)
        ds = _img_ds(ray_session, dem)
        out = _collect(STEP_REGISTRY["raster-viewshed"](
            ds, observer_x=4, observer_y=4, observer_height=2.0))
        vis = decode(out["bytes"][0].as_py())
        # flat terrain, raised observer: everything visible
        assert (vis == 255).all()

    def test_rgb_to_palette_exact_colors(self, ray_session):
        from raydal.io.codecs import decode

        # 2 distinct colors quantized at 5 bits; n_colors=4 covers them
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[:2] = [248, 0, 0]
        img[2:] = [0, 0, 248]
        ds = _img_ds(ray_session, img)
        out = _collect(STEP_REGISTRY["raster-rgb-to-palette"](
            ds, n_colors=4))
        idx = decode(out["bytes"][0].as_py())
        assert idx.ndim == 2
        assert len(np.unique(idx)) == 2
        pal = np.array(out["palette"][0].as_py()).reshape(-1, 3)
        # the reference midpoint rule maps the quantized cell back
        # to ((lo+hi)<<shift)//2 = value when lo==hi
        assert [248, 0, 0] in pal.tolist()
        assert [0, 0, 248] in pal.tolist()

    def test_color_merge_identity(self, ray_session):
        from raydal.io.codecs import decode, encode

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
        gray = rgb.max(axis=2)  # value channel → identity merge
        ds = _img_ds(ray_session, rgb, extra={
            "pan": pa.array([encode(gray, "tiff")], pa.binary())})
        out = _collect(STEP_REGISTRY["raster-color-merge"](ds))
        merged = decode(out["bytes"][0].as_py())
        assert (merged == rgb).all()

    def test_pansharpen_ratio(self, ray_session):
        from raydal.io.codecs import decode, encode

        rgb = np.full((4, 4, 3), 90, dtype=np.uint8)
        pan = np.full((4, 4), 180, dtype=np.uint8)
        ds = _img_ds(ray_session, rgb, extra={
            "pan": pa.array([encode(pan, "tiff")], pa.binary())})
        out = _collect(STEP_REGISTRY["raster-pansharpen"](ds))
        px = decode(out["bytes"][0].as_py())
        assert (px == 180).all()

    def test_index_footprint(self, ray_session):
        band = np.zeros((4, 4), dtype=np.uint8)
        ds = _img_ds(ray_session, band).map_batches(
            lambda t: t.append_column("w", pa.array([4], pa.int32()))
                       .append_column("h", pa.array([4], pa.int32())),
            batch_format="pyarrow")
        out = _collect(STEP_REGISTRY["raster-index"](
            ds, dst_crs=4326, crs=4326))
        assert out.num_rows == 1
        assert out["xmin"][0].as_py() == pytest.approx(0.0)
        assert out["ymax"][0].as_py() == pytest.approx(4.0)


class TestVerbCLI:
    @pytest.fixture(scope="class")
    def cli_dir(self, tmp_path_factory):
        import json

        from raydal.io.tiff import write_tiff

        d = tmp_path_factory.mktemp("verbs")
        band = (np.arange(64, dtype=np.uint8) % 200).reshape(8, 8)
        with open(d / "in.tif", "wb") as f:
            f.write(write_tiff(band,
                               geotransform=[0, 1, 0, 8, 0, -1]))
        json.dump({"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"fid": 0},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 0], [4, 0], [4, 4], [0, 4],
                            [0, 0]]]}}]},
                  open(d / "in.geojson", "w"))
        return d

    def test_raster_verb_sugar(self, cli_dir):
        r = _run_cli(["raster", "hillshade", "in.tif", "out_hs",
                      "format=gtiff", "z_factor=2"], cwd=cli_dir)
        assert r.returncode == 0, r.stderr[-800:]
        assert (cli_dir / "out_hs" / "in.tif").exists()

    def test_raster_pixel_info_sugar(self, cli_dir):
        r = _run_cli(["raster", "pixel-info", "in.tif",
                      "points=[[1.5,6.5]]"], cwd=cli_dir)
        assert r.returncode == 0, r.stderr[-800:]
        assert "1 rows" in r.stdout

    def test_vector_verb_sugar(self, cli_dir):
        r = _run_cli(["vector", "buffer", "in.geojson",
                      "out.geojson", "distance=1"], cwd=cli_dir)
        assert r.returncode == 0, r.stderr[-800:]
        import json

        doc = json.load(open(cli_dir / "out.geojson"))
        assert len(doc["features"]) == 1

    def test_unknown_verb_lists_steps(self, cli_dir):
        r = _run_cli(["vector", "frobnicate", "in.geojson"],
                     cwd=cli_dir)
        assert r.returncode != 0
        assert "registered steps" in r.stderr


class TestNewLLMQueries:
    """q105/q106 brute-force parity at sf0.001 (the gate carries the
    DuckDB oracle at sf0.01)."""

    def test_dup_ngram_bruteforce(self, ray_session, sf_dir):
        import re as _re

        import pyarrow.parquet as pq

        from raydal.queries import q105_dup_ngram_docs

        got = _collect(q105_dup_ngram_docs(sf_dir))
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
        tok = _re.compile(r"[^a-z0-9]+")
        per_doc = {}
        for did, text in zip(docs["doc_id"].to_pylist(),
                             docs["text"].to_pylist()):
            t = [x for x in tok.split(text.lower()) if x]
            per_doc[did] = {" ".join(t[j:j + 4])
                            for j in range(len(t) - 3)}
        from collections import Counter

        owners = Counter()
        for gs in per_doc.values():
            owners.update(gs)
        expect = {did: sum(1 for g in gs if owners[g] >= 2)
                  for did, gs in per_doc.items()}
        expect = {k: v for k, v in expect.items() if v > 0}
        assert dict(zip(got["doc_id"].to_pylist(),
                        got["n_dup_grams"].to_pylist())) == expect

    def test_kmeans_assign_bruteforce(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from raydal.queries import q106_kmeans_assign, round_half_away

        got = _collect(q106_kmeans_assign(sf_dir))
        emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
        vids = np.asarray(emb["vec_id"])
        A = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
        C = A[vids.argsort()][:8]  # vec_id 0..7 in order
        d2 = ((A[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)
        dist = np.sqrt(d2[np.arange(len(A)), cid])
        gm = {int(r["cluster_id"]): (int(r["n_vecs"]),
                                     float(r["avg_dist"]))
              for r in got.to_pylist()}
        for k in range(8):
            m = cid == k
            if not m.any():
                assert k not in gm
                continue
            assert gm[k][0] == int(m.sum())
            assert gm[k][1] == pytest.approx(
                float(round_half_away(dist[m].mean(), 6)), abs=2e-6)

    def test_stratified_sample_bruteforce(self, ray_session, sf_dir):
        import hashlib

        import pyarrow.parquet as pq

        from raydal.queries import q107_stratified_sample

        got = _collect(q107_stratified_sample(sf_dir))
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "lang"])
        from collections import Counter

        cnt = Counter(docs["lang"].to_pylist())
        th = {k: int(np.floor((60.0 / n) * 4294967296.0))
              for k, n in cnt.items()}
        expect = {did for did, lg in zip(docs["doc_id"].to_pylist(),
                                         docs["lang"].to_pylist())
                  if int.from_bytes(hashlib.md5(
                      str(did).encode()).digest()[:4], "big") < th[lg]}
        assert set(got["doc_id"].to_pylist()) == expect
        # every stratum lands at or under its expected cap scale:
        # content-addressed sampling is approximate, so just check the
        # sample is a strict, deterministic subset per language
        assert got.num_rows == len(expect) > 0

    def test_bm25_topk_bruteforce(self, ray_session, sf_dir):
        import math
        import re as _re

        import pyarrow.parquet as pq

        from raydal.queries import q108_bm25_topk, round_half_away

        got = q108_bm25_topk(sf_dir)
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
        tok = _re.compile(r"[^a-z0-9]+")
        TERMS, K1, B = ("table", "scan", "merge"), 1.2, 0.75
        toks = {d: [x for x in tok.split(t.lower()) if x]
                for d, t in zip(docs["doc_id"].to_pylist(),
                                docs["text"].to_pylist())}
        N = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / N
        df = {w: sum(1 for v in toks.values() if w in v)
              for w in TERMS}
        scores = []
        for d, v in toks.items():
            s = 0.0
            for w in TERMS:
                tf = v.count(w)
                if tf:
                    idf = math.log((N - df[w] + 0.5) / (df[w] + 0.5)
                                   + 1.0)
                    s += idf * tf * (K1 + 1) / (
                        tf + K1 * (1 - B + B * len(v) / avgdl))
            if s > 0:
                scores.append((float(round_half_away(s, 6)), d))
        top = sorted(scores, key=lambda sd: (-sd[0], sd[1]))[:10]
        assert got["doc_id"].to_pylist() == [d for _, d in top]
        assert got["score"].to_pylist() == pytest.approx(
            [s for s, _ in top], abs=1e-9)

    def test_repetition_filter_bruteforce(self, ray_session, sf_dir):
        import re as _re

        import pyarrow.parquet as pq

        from raydal.queries import q109_repetition_filter, \
            round_half_away

        got = _collect(q109_repetition_filter(sf_dir))
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
        tok = _re.compile(r"[^a-z0-9]+")
        gm = {int(r["doc_id"]): (float(r["dup_frac"]),
                                 bool(r["flagged"]))
              for r in got.to_pylist()}
        n_checked = 0
        for did, txt in zip(docs["doc_id"].to_pylist(),
                            docs["text"].to_pylist()):
            t = [x for x in tok.split(txt.lower()) if x]
            if len(t) < 2:
                assert did not in gm
                continue
            grams = list(zip(t[:-1], t[1:]))
            frac = 1.0 - len(set(grams)) / len(grams)
            assert gm[did] == (float(round_half_away(frac, 6)),
                               frac > 0.2)
            n_checked += 1
        assert n_checked == len(gm) > 0


class TestMosaicStep:
    def test_mosaic_last_wins_and_union_extent(self, ray_session):
        import ray.data

        from raydal.io.codecs import encode

        a = np.full((4, 4), 10, dtype=np.uint8)
        b = np.full((4, 4), 20, dtype=np.uint8)
        # a covers x 0..4 y 4..8; b covers x 2..6 y 2..6 (overlaps SE
        # quadrant of a); later image_id wins in the overlap
        tbl = pa.Table.from_pydict({
            "image_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([encode(a, "tiff"), encode(b, "tiff")],
                              pa.binary()),
            "fmt": pa.array(["tiff", "tiff"], pa.string()),
            "gt": pa.array([[0.0, 1.0, 0.0, 8.0, 0.0, -1.0],
                            [2.0, 1.0, 0.0, 6.0, 0.0, -1.0]],
                           pa.list_(pa.float64()))})
        ds = ray.data.from_arrow(tbl)
        out = _collect(STEP_REGISTRY["raster-mosaic"](ds))
        assert out.num_rows == 1  # one tile, one band
        w, h = out["w"][0].as_py(), out["h"][0].as_py()
        assert (w, h) == (6, 6)  # union extent 0..6 × 2..8 at res 1
        grid = np.frombuffer(out["data"][0].as_py(),
                             np.uint8).reshape(h, w)
        gt = out["geotransform"][0].as_py()
        assert gt == [0.0, 1.0, 0.0, 8.0, 0.0, -1.0]
        # north-west pixel: only a
        assert grid[0, 0] == 10
        # overlap (world 3.5, 5.5 → row 2, col 3): b wins
        assert grid[2, 3] == 20
        # b-only area (world 5.5, 3.5 → row 4, col 5)
        assert grid[4, 5] == 20
        # uncovered corner (world 0.5, 2.5 → row 5, col 0): background
        assert grid[5, 0] == 0

    def test_mosaic_tiles_split(self, ray_session):
        import ray.data

        from raydal.io.codecs import encode

        imgs, gts = [], []
        for k in range(3):
            imgs.append(np.full((4, 4), 50 + k, dtype=np.uint8))
            gts.append([4.0 * k, 1.0, 0.0, 4.0, 0.0, -1.0])
        tbl = pa.Table.from_pydict({
            "image_id": pa.array([f"i{k}" for k in range(3)]),
            "bytes": pa.array([encode(p, "tiff") for p in imgs],
                              pa.binary()),
            "fmt": pa.array(["tiff"] * 3),
            "gt": pa.array(gts, pa.list_(pa.float64()))})
        ds = ray.data.from_arrow(tbl)
        out = _collect(STEP_REGISTRY["raster-mosaic"](
            ds, tile_size=4))
        # 12 px wide at tile_size 4 → 3 tiles
        assert out.num_rows == 3
        vals = set()
        for i in range(3):
            g = np.frombuffer(out["data"][i].as_py(), np.uint8)
            vals.update(np.unique(g).tolist())
        assert vals == {50, 51, 52}


class TestStackStep:
    def test_stack_band_order(self, ray_session):
        import ray.data

        tbl = pa.Table.from_pydict({
            "image_id": pa.array(["b_img", "a_img"], pa.string()),
            "band": pa.array([1, 1], pa.int32()),
            "data": pa.array([np.full(4, 9, np.uint8).tobytes(),
                              np.full(4, 7, np.uint8).tobytes()],
                             pa.binary()),
            "w": pa.array([2, 2], pa.int32()),
            "h": pa.array([2, 2], pa.int32()),
            "dtype": pa.array(["uint8", "uint8"], pa.string()),
            "geotransform": pa.array([[0, 1, 0, 2, 0, -1]] * 2,
                                     pa.list_(pa.float64()))})
        ds = ray.data.from_arrow(tbl)
        out = _collect(STEP_REGISTRY["raster-stack"](ds))
        assert set(out["image_id"].to_pylist()) == {"stack"}
        by_band = {out["band"][i].as_py():
                   np.frombuffer(out["data"][i].as_py(), np.uint8)[0]
                   for i in range(out.num_rows)}
        # a_img sorts first → band 1; b_img → band 2
        assert by_band == {1: 7, 2: 9}


class TestDatasetVerbs:
    def test_identify_copy_rename_delete(self, tmp_path):
        with open(tmp_path / "a.geojson", "w") as f:
            f.write('{"type": "FeatureCollection", "features": []}')
        r = _run_cli(["dataset", "identify", "a.geojson", "b.qqq"],
                     cwd=tmp_path)
        assert r.returncode == 0, r.stderr[-500:]
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        import json as _json

        assert _json.loads(lines[0])["driver"] == "geojson"
        assert _json.loads(lines[1])["driver"] == "unrecognized"
        assert _run_cli(["dataset", "copy", "a.geojson", "b.geojson"],
                        cwd=tmp_path).returncode == 0
        assert (tmp_path / "b.geojson").exists()
        assert _run_cli(["dataset", "rename", "b.geojson",
                         "c.geojson"], cwd=tmp_path).returncode == 0
        assert not (tmp_path / "b.geojson").exists()
        assert _run_cli(["dataset", "delete", "c.geojson"],
                        cwd=tmp_path).returncode == 0
        assert not (tmp_path / "c.geojson").exists()

    def test_shapefile_sidecars_move_together(self, tmp_path):
        for ext in (".shp", ".shx", ".dbf"):
            with open(tmp_path / ("s" + ext), "wb") as f:
                f.write(b"\0" * 8)
        assert _run_cli(["dataset", "rename", "s.shp", "t.shp"],
                        cwd=tmp_path).returncode == 0
        for ext in (".shp", ".shx", ".dbf"):
            assert (tmp_path / ("t" + ext)).exists()
            assert not (tmp_path / ("s" + ext)).exists()


class TestSetGeomType:
    def test_promote_single_linear(self, ray_session):
        out = _collect(STEP_REGISTRY["vector-set-geom-type"](
            _vec_ds(ray_session), to="multi"))
        types = [W.wkb_geom_type(b) for b in out["wkb"].to_pylist()]
        assert types == [W.MULTIPOLYGON, W.MULTIPOLYGON, W.MULTIPOINT]
        # area preserved through the wrapper
        assert W.wkb_area(out["wkb"][0].as_py()) == 16.0
        back = _collect(STEP_REGISTRY["vector-set-geom-type"](
            ray_session.data.from_arrow(out), to="single"))
        assert [W.wkb_geom_type(b)
                for b in back["wkb"].to_pylist()] == \
            [W.POLYGON, W.POLYGON, W.POINT]

    def test_linearize_circularstring(self, ray_session):
        import ray.data

        from raydal.geo.curves import parse_wkt_curve, write_wkb_curve

        node = parse_wkt_curve(
            "CIRCULARSTRING (0 0, 1 1, 2 0)")
        blob = write_wkb_curve(node)
        ds = ray.data.from_arrow(pa.Table.from_pydict(
            {"wkb": pa.array([blob], pa.binary())}))
        out = _collect(STEP_REGISTRY["vector-set-geom-type"](
            ds, to="linear"))
        t, pts = W.parse_wkb(out["wkb"][0].as_py())
        assert t == W.LINESTRING and len(pts) > 3
        # every stroked vertex stays on the unit circle about (1, 0)
        r = np.hypot(pts[:, 0] - 1.0, pts[:, 1])
        assert np.allclose(r, 1.0, atol=1e-9)


class TestCreateAndOverviews:
    def test_create_appends_to_band_rows(self, ray_session):
        import ray.data

        base = ray.data.from_arrow(pa.Table.from_pydict({
            "image_id": pa.array(["x"], pa.string()),
            "band": pa.array([1], pa.int32()),
            "data": pa.array([np.zeros(4, np.uint8).tobytes()],
                             pa.binary()),
            "w": pa.array([2], pa.int32()),
            "h": pa.array([2], pa.int32()),
            "dtype": pa.array(["uint8"], pa.string()),
            "geotransform": pa.array([[0, 1, 0, 2, 0, -1]],
                                     pa.list_(pa.float64()))}))
        out = _collect(STEP_REGISTRY["raster-create"](
            base, width=3, height=2, value=7, image_id="new"))
        assert out.num_rows == 2
        row = [r for r in out.to_pylist() if r["image_id"] == "new"][0]
        assert np.frombuffer(row["data"], np.uint8).tolist() == [7] * 6

    def test_overview_add_ladder(self, ray_session):
        import ray.data

        arr = np.arange(64, dtype=np.float32).reshape(8, 8)
        base = ray.data.from_arrow(pa.Table.from_pydict({
            "image_id": pa.array(["x"], pa.string()),
            "band": pa.array([1], pa.int32()),
            "data": pa.array([arr.tobytes()], pa.binary()),
            "w": pa.array([8], pa.int32()),
            "h": pa.array([8], pa.int32()),
            "dtype": pa.array(["float32"], pa.string()),
            "geotransform": pa.array([[0, 1, 0, 8, 0, -1]],
                                     pa.list_(pa.float64()))}))
        out = _collect(STEP_REGISTRY["raster-overview-add"](
            base, levels=[2, 4]))
        rows = {r["image_id"]: r for r in out.to_pylist()}
        assert set(rows) == {"x", "x@ovr_2", "x@ovr_4"}
        o2 = np.frombuffer(rows["x@ovr_2"]["data"],
                           np.float32).reshape(4, 4)
        # 2x2 average of the top-left block: (0+1+8+9)/4 = 4.5
        assert o2[0, 0] == 4.5
        assert rows["x@ovr_2"]["geotransform"][1] == 2.0
        assert rows["x@ovr_4"]["w"] == 2


class TestEditSteps:
    def test_vector_edit_rename_drop(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.Table.from_pydict(
            {"a": [1, 2], "b": [3, 4], "c": [5, 6]}))
        out = _collect(STEP_REGISTRY["vector-edit"](
            ds, rename={"a": "x"}, drop=["b"]))
        assert out.column_names == ["x", "c"]
        assert out["x"].to_pylist() == [1, 2]

    def test_raster_edit_gt_crs(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.Table.from_pydict({
            "image_id": ["i"],
            "gt": pa.array([[0., 1., 0., 0., 0., -1.]],
                           pa.list_(pa.float64()))}))
        out = _collect(STEP_REGISTRY["raster-edit"](
            ds, gt=[5, 2, 0, 9, 0, -2], crs=32633))
        assert out["gt"][0].as_py() == [5.0, 2.0, 0.0, 9.0, 0.0, -2.0]
        assert out["crs"][0].as_py() == "32633"


class TestReviewFixes:
    """Regression coverage for the round-5 final-session review."""

    def test_pixel_info_outside_is_null(self, ray_session):
        band = np.zeros((4, 4), dtype=np.uint8)
        ds = _img_ds(ray_session, band)
        out = _collect(STEP_REGISTRY["raster-pixel-info"](
            ds, points=[[100.0, 100.0], [1.5, 2.5]]))
        assert out["value"][0].as_py() is None
        assert out["value"][1].as_py() == 0.0

    def test_buffer_keeps_shrunken_hole(self, ray_session):
        import ray.data

        outer = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.],
                          [0., 0.]])
        hole = np.array([[3., 3.], [7., 3.], [7., 7.], [3., 7.],
                         [3., 3.]])
        ds = ray.data.from_arrow(pa.Table.from_pydict(
            {"wkb": pa.array([W.polygon_wkb([outer, hole])],
                             pa.binary())}))
        out = _collect(STEP_REGISTRY["vector-buffer"](
            ds, distance=0.5))
        _, rings = W.parse_wkb(out["wkb"][0].as_py())
        assert len(rings) == 2  # the hole survives, shrunken
        from raydal.geo.clip import ring_area

        hole_area = abs(ring_area(rings[1]))
        # 4x4 hole eroded by 0.5 → ~3x3 (+rounded corners deficit),
        # within the distance-field kernel's ~1px resolution bound
        assert 7.0 < hole_area < 9.5
        # a hole smaller than the buffer distance vanishes
        tiny = np.array([[4., 4.], [4.6, 4.], [4.6, 4.6], [4., 4.6],
                         [4., 4.]])
        ds2 = ray.data.from_arrow(pa.Table.from_pydict(
            {"wkb": pa.array([W.polygon_wkb([outer, tiny])],
                             pa.binary())}))
        out2 = _collect(STEP_REGISTRY["vector-buffer"](
            ds2, distance=0.5))
        _, rings2 = W.parse_wkb(out2["wkb"][0].as_py())
        assert len(rings2) == 1

    def test_mosaic_gray_replicates_mixed_raises(self, ray_session):
        import ray.data

        from raydal.io.codecs import encode
        from raydal.ops.gti import mosaic_dataset

        rgb = np.zeros((4, 4, 3), dtype=np.uint8) + 30
        gray = np.full((4, 4), 90, dtype=np.uint8)
        tbl = pa.Table.from_pydict({
            "image_id": pa.array(["a_rgb", "b_gray"], pa.string()),
            "bytes": pa.array([encode(rgb, "tiff"),
                               encode(gray, "tiff")], pa.binary()),
            "gt": pa.array([[0.0, 1.0, 0.0, 4.0, 0.0, -1.0],
                            [4.0, 1.0, 0.0, 4.0, 0.0, -1.0]],
                           pa.list_(pa.float64()))})
        out = _collect(mosaic_dataset(
            ray_session.data.from_arrow(tbl)))
        assert out.num_rows == 3  # 3 bands
        g0 = np.frombuffer(out["data"][0].as_py(),
                           np.uint8).reshape(4, 8)
        assert g0[0, 0] == 30 and g0[0, 7] == 90  # gray replicated
        # mixed 2-band vs 3-band inputs raise instead of mis-tiling
        two = np.zeros((4, 4, 2), dtype=np.uint8)
        tbl2 = pa.Table.from_pydict({
            "image_id": pa.array(["a_rgb", "b_two"], pa.string()),
            "bytes": pa.array([encode(rgb, "tiff"),
                               encode(two, "tiff")], pa.binary()),
            "gt": pa.array([[0.0, 1.0, 0.0, 4.0, 0.0, -1.0],
                            [2.0, 1.0, 0.0, 4.0, 0.0, -1.0]],
                           pa.list_(pa.float64()))})
        with pytest.raises(Exception, match="bands"):
            _collect(mosaic_dataset(
                ray_session.data.from_arrow(tbl2)))

    def test_stack_image_table_all_bands(self, ray_session):
        import ray.data

        from raydal.io.codecs import encode

        rgb = np.stack([np.full((2, 2), v, np.uint8)
                        for v in (1, 2, 3)], axis=2)
        ds = ray.data.from_arrow(pa.Table.from_pydict({
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([encode(rgb, "tiff")], pa.binary()),
            "fmt": pa.array(["tiff"], pa.string()),
            "gt": pa.array([[0., 1., 0., 2., 0., -1.]],
                           pa.list_(pa.float64()))}))
        out = _collect(STEP_REGISTRY["raster-stack"](ds))
        assert out.num_rows == 3
        vals = {out["band"][i].as_py():
                np.frombuffer(out["data"][i].as_py(), np.uint8)[0]
                for i in range(3)}
        assert vals == {1: 1, 2: 2, 3: 3}

    def test_dataset_missing_path_errors(self, tmp_path):
        r = _run_cli(["dataset", "rename", "missing.shp", "out.shp"],
                     cwd=tmp_path)
        assert r.returncode != 0
        assert "does not exist" in r.stderr

    def test_cross_kind_bare_verb_rejected(self, tmp_path):
        import json as _json

        _json.dump({"type": "FeatureCollection", "features": []},
                   open(tmp_path / "e.geojson", "w"))
        r = _run_cli(["vector", "warp", "e.geojson"], cwd=tmp_path)
        assert r.returncode != 0
        assert "unknown vector command" in r.stderr

    def test_grid_non_divisible_height(self, ray_session):
        import ray.data

        # 96 rows / 1 strip boundary with h % nstrips issues: nearest
        # values must land exactly where the geotransform says even
        # when strips round unevenly
        tbl = pa.Table.from_pydict({
            "x": pa.array([0.5, 0.5]),
            "y": pa.array([0.25, 95.75]),
            "v": pa.array([1.0, 2.0])})
        ds = ray.data.from_arrow(tbl)
        out = _collect(STEP_REGISTRY["vector-grid"](
            ds, algorithm="nearest", width=1, height=96,
            extent=[0, 0, 1, 96], x_col="x", y_col="y",
            value_col="v", radius=200.0))
        grid = np.frombuffer(out["data"][0].as_py(),
                             np.float64).reshape(96, 1)
        assert grid[0, 0] == 2.0    # north row → the y=95.75 point
        assert grid[95, 0] == 1.0   # south row → the y=0.25 point


class TestSimplifyCoverage:
    def test_shared_boundary_stays_shared(self, ray_session):
        import ray.data

        from raydal.geo.clip import ring_area

        # 2x1 coverage with a densified wiggly shared edge at x=2
        t = np.linspace(0, 4, 17)
        shared = np.stack([2 + 0.05 * np.sin(np.pi * t), t], axis=1)
        left = np.vstack([shared, [[0, 4]], [[0, 0]], shared[:1]])
        right = np.vstack([shared[::-1], [[4, 0]], [[4, 4]],
                           shared[-1:]])
        ds = ray.data.from_arrow(pa.Table.from_pydict({
            "fid": pa.array([0, 1], pa.int64()),
            "wkb": pa.array([W.polygon_wkb([left]),
                             W.polygon_wkb([right])], pa.binary())}))
        out = _collect(STEP_REGISTRY["vector-simplify-coverage"](
            ds, tolerance=0.2))
        rl = W.polygons_from_wkb(out["wkb"][0].as_py())[0][0]
        rr = W.polygons_from_wkb(out["wkb"][1].as_py())[0][0]
        # simplified AND still a partition of the 4x4 square
        assert len(rl) < len(left) and len(rr) < len(right)
        assert abs(ring_area(rl)) + abs(ring_area(rr)) == \
            pytest.approx(16.0, abs=1e-9)
        # every vertex of the shared edge appears in BOTH outputs
        setl = {tuple(p) for p in rl}
        setr = {tuple(p) for p in rr}
        assert {(2.0, 0.0), (2.0, 4.0)} <= (setl & setr)
