"""Ray-integrated operator tests: pipelines, shuffles, goldens, resume."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydal.geo import cells, wkb as W
from raydal.io.images import (make_points_table, make_zones_table,
                              synthesize_images_batch)
from raydal.ops.footprint import add_footprint, assign_tiles
from raydal.ops.join import (KnnJoin, PIPJoinZones, SpatialJoinZones,
                             ZoneIndex, build_cell_points)


@pytest.fixture(scope="module")
def images_tbl():
    return synthesize_images_batch(np.arange(60))


class TestFootprintGolden:
    def test_tile_assign_matches_bruteforce(self, images_tbl):
        """Engine tile assignment == per-image reference formula replay."""
        from raydal.geo.affine import gt_extent
        from raydal.geo.crs import Transformer

        fp = add_footprint(images_tbl, dst_crs=3857)
        at = assign_tiles(fp, z=7)
        got = set(zip(at["image_id"].to_pylist(),
                      at["tile_x"].to_pylist(), at["tile_y"].to_pylist()))
        expect = set()
        tm = cells.web_mercator_quad(7)
        for i in range(images_tbl.num_rows):
            gt = images_tbl["gt"][i].as_py()
            w = images_tbl["w"][i].as_py()
            h = images_tbl["h"][i].as_py()
            crs = images_tbl["crs"][i].as_py()
            # golden: densified edge transform (same 9-pt sampling)
            tf = Transformer(crs, 3857)
            e = tf.transform_extent(*gt_extent(gt, w, h), densify=3)
            tx0, ty0, tx1, ty1 = (int(v) for v in cells.tile_indices(tm, *e))
            iid = images_tbl["image_id"][i].as_py()
            for tx in range(tx0, tx1 + 1):
                for ty in range(ty0, ty1 + 1):
                    expect.add((iid, tx, ty))
        assert got == expect

    def test_footprint_epsilon_boundary(self):
        """An extent landing exactly on a tile edge follows the reference
        EPSILON rule (floor(frac + 1e-3))."""
        tm = cells.web_mercator_quad(3)
        edge = tm.top_left_x + 2 * tm.tile_span_x
        tx0, _, tx1, _ = cells.tile_indices(tm, edge, 0.0, edge + 1.0, 1.0)
        assert int(tx0) == 2


class TestSpatialJoinGolden:
    def test_join_matches_shapely_free_oracle(self, images_tbl):
        """Broadcast join result == brute-force polygon-intersects oracle."""
        zones = make_zones_table(60)
        zi = ZoneIndex(zones)
        fp = add_footprint(images_tbl, dst_crs=4326)
        got = SpatialJoinZones(zi)(fp)
        got_pairs = set(zip(got["image_id"].to_pylist(),
                            got["zone_id"].to_pylist()))
        expect = set()
        for i in range(fp.num_rows):
            rect = W.box_polygon(fp["xmin"][i].as_py(), fp["ymin"][i].as_py(),
                                 fp["xmax"][i].as_py(), fp["ymax"][i].as_py())
            for zj, blob in enumerate(zones["wkb"].to_pylist()):
                if any(W.polygon_intersects_polygon(rect, poly)
                       for poly in W.polygons_from_wkb(blob)):
                    expect.add((fp["image_id"][i].as_py(),
                                zones["zone_id"][zj].as_py()))
        assert got_pairs == expect

    def test_pip_golden_with_boundary_cases(self):
        """PIP join against brute force incl. pinned vertex/edge points."""
        zones = make_zones_table(30)
        pts = make_points_table(300)
        zi = ZoneIndex(zones)
        got = PIPJoinZones(zi, emit="all")(pts)
        px = np.asarray(pts["x"])
        py = np.asarray(pts["y"])
        # brute force over every (point, zone)
        for row in range(0, got.num_rows, 17):
            pid = got["point_id"][row].as_py()
            zid = got["zone_id"][row].as_py()
            i = pts["point_id"].to_pylist().index(pid)
            zj = zones["zone_id"].to_pylist().index(zid)
            polys = W.polygons_from_wkb(zones["wkb"][zj].as_py())
            inside = any(bool(W.points_in_polygon(p, [px[i]], [py[i]])[0])
                         for p in polys)
            assert got["inside"][row].as_py() == inside

    def test_hotbox_zone_catches_skewed_images(self, images_tbl):
        """The pinned hot-box zone joins every hot-box image."""
        zones = make_zones_table(10)  # hotbox is zone-000010
        zi = ZoneIndex(zones)
        fp = add_footprint(images_tbl, dst_crs=4326)
        got = SpatialJoinZones(zi)(fp)
        hot_zone = f"zone-{10:06d}"
        hot_images = {got["image_id"][i].as_py()
                      for i in range(got.num_rows)
                      if got["zone_id"][i].as_py() == hot_zone}
        for i in range(images_tbl.num_rows):
            idx = int(images_tbl["image_id"][i].as_py().split("-")[1])
            if idx % 10 == 7:
                assert images_tbl["image_id"][i].as_py() in hot_images


class TestKnnGolden:
    def test_knn_equals_bruteforce(self):
        rng = np.random.default_rng(3)
        n = 400
        ids = np.arange(n, dtype=np.int64)
        x = rng.uniform(-20, 40, n)
        y = rng.uniform(-10, 50, n)
        index = build_cell_points(ids, x, y, z=4, window=(-20, -10, 40, 50))
        kj = KnnJoin(index, k=5, id_col="pid")
        probes = pa.Table.from_pydict({
            "pid": pa.array(np.arange(50, dtype=np.int64)),
            "x": pa.array(x[:50]), "y": pa.array(y[:50])})
        got = kj(probes)
        for p in range(0, 50, 7):
            dx = x - x[p]
            dy = y - y[p]
            d2 = dx * dx + dy * dy
            order = np.lexsort((ids, d2))[:5]
            rows = got.filter(pa.compute.equal(got["probe_id"], p))
            assert rows["neighbor_id"].to_pylist() == ids[order].tolist()


class TestMosaicPyramid:
    def test_mosaic_and_pyramid(self, ray_session):
        import ray.data

        from raydal.ops.tile import build_pyramid, mosaic_tiles
        from raydal.ops.warp import WarpToTiles

        t = synthesize_images_batch(np.arange(24))
        contrib = WarpToTiles(z=8)(t)
        assert contrib.num_rows > 0
        ds = ray.data.from_arrow(contrib)
        composed = mosaic_tiles(ds).materialize()
        cdf = composed.to_pandas()
        # one row per distinct cell
        assert cdf["cell"].is_unique
        assert int(cdf["n_contrib"].sum()) == contrib.num_rows
        # salted two-stage produces the identical mosaic
        salted = mosaic_tiles(ray.data.from_arrow(contrib), salt=4)
        sdf = salted.to_pandas().sort_values("cell").reset_index(drop=True)
        cdf2 = cdf.sort_values("cell").reset_index(drop=True)
        assert (sdf["cell"].values == cdf2["cell"].values).all()
        for a, b in zip(sdf["tile_rgb"], cdf2["tile_rgb"]):
            assert a == b
        # pyramid one level down: parents of every child cell exist
        levels = build_pyramid(composed, 8, 7)
        pdf = levels[7].to_pandas()
        child_parents = {int(cells.parent_cell(np.int64(c)))
                        for c in cdf["cell"]}
        assert set(pdf["cell"]) == child_parents

    def test_pyramid_pixel_average(self, ray_session):
        """Parent tile pixels == 2x2 average of composed children."""
        import ray.data

        from raydal.ops.tile import TILE, build_pyramid, mosaic_tiles
        from raydal.ops.warp import WarpToTiles

        t = synthesize_images_batch(np.arange(8))
        contrib = WarpToTiles(z=6)(t)
        composed = mosaic_tiles(ray.data.from_arrow(contrib)).materialize()
        cdf = composed.to_pandas()
        levels = build_pyramid(composed, 6, 5)
        pdf = levels[5].to_pandas()
        # verify one parent against manual composition
        prow = pdf.iloc[0]
        parent = int(prow["cell"])
        big = np.zeros((2 * TILE, 2 * TILE, 3), dtype=np.float64)
        valid = np.zeros((2 * TILE, 2 * TILE), dtype=bool)
        pz, pxx, pyy = (int(v) for v in cells.unpack_cell(np.int64(parent)))
        for _, crow in cdf.iterrows():
            cz, cx, cy = (int(v) for v in
                          cells.unpack_cell(np.int64(crow["cell"])))
            if cz == 6 and cx >> 1 == pxx and cy >> 1 == pyy:
                rgb = np.frombuffer(crow["tile_rgb"],
                                    dtype=np.uint8).reshape(TILE, TILE, 3)
                w = np.frombuffer(crow["winner"],
                                  dtype=np.int64).reshape(TILE, TILE)
                sl = (slice((cy - 2 * pyy) * TILE,
                            (cy - 2 * pyy + 1) * TILE),
                      slice((cx - 2 * pxx) * TILE,
                            (cx - 2 * pxx + 1) * TILE))
                big[sl] = rgb
                valid[sl] = w >= 0
        # validity-aware 2x average: only painted child pixels count
        from raydal.kernels.resample import copy_words_cast
        vblk = valid.reshape(TILE, 2, TILE, 2)
        cnt = vblk.sum(axis=(1, 3)).astype(np.float64)
        expect = np.zeros((TILE, TILE, 3), dtype=np.uint8)
        for b in range(3):
            s = (big[:, :, b] * valid).reshape(
                TILE, 2, TILE, 2).sum(axis=(1, 3))
            avg = np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
            expect[:, :, b] = copy_words_cast(avg, np.uint8)
        got = np.frombuffer(prow["tile_rgb"],
                            dtype=np.uint8).reshape(TILE, TILE, 3)
        np.testing.assert_array_equal(got, expect)
        # parent validity marks exactly the blocks with any valid child
        pw = np.frombuffer(prow["winner"],
                           dtype=np.int64).reshape(TILE, TILE)
        np.testing.assert_array_equal(pw >= 0, cnt > 0)


class TestDedupRay:
    def test_exact_dedup_images(self, ray_session):
        """Planted every-97th duplicates are exactly removed."""
        import ray.data

        from raydal.ops.dedup import exact_dedup

        t = synthesize_images_batch(np.arange(200))
        docs = pa.Table.from_pydict({
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array([str(p) for p in t["phash"].to_pylist()])})
        ds = ray.data.from_arrow(docs)
        kept = exact_dedup(ds).to_pandas()
        # expected survivors: min doc_id per distinct phash value (planted
        # every-97th duplicates plus any natural average-hash collisions)
        phashes = t["phash"].to_pylist()
        expect = set()
        seen = {}
        for i, p in enumerate(phashes):
            if p not in seen:
                seen[p] = i
                expect.add(i)
        assert set(kept["doc_id"].values) == expect
        assert 97 not in expect and 194 not in expect  # planted dups gone

    def test_minhash_finds_planted_near_dups(self, ray_session):
        import ray.data

        from raydal.ops.dedup import minhash_dedup

        base = ("the quick brown fox jumps over the lazy dog and runs far "
                "away into the deep green forest tonight").split()
        texts = []
        for i in range(40):
            words = list(base)
            words[i % len(words)] = f"tok{i}"
            texts.append(" ".join(words + [f"doc{i}"]))
        # plant a near-identical pair
        texts.append(texts[0] + " extra")
        docs = pa.Table.from_pydict({
            "doc_id": pa.array(np.arange(41, dtype=np.int64)),
            "text": pa.array(texts)})
        pairs = minhash_dedup(ray.data.from_arrow(docs),
                              threshold=0.5).to_pandas()
        assert ((pairs["id_a"] == 0) & (pairs["id_b"] == 40)).any()


class TestPhashBanding:
    def test_banding_guarantees_candidate_recall(self):
        """Pigeonhole property: every pair within max_hamming shares at
        least one (band, band_bits) bucket."""
        import pyarrow as pa

        from raydal.ops.dedup import phash_near_dup_batchfn

        rng = np.random.default_rng(4)
        base = int(rng.integers(0, 2 ** 63))
        variants = [base]
        for k in range(1, 5):  # flip up to 4 distinct bits
            v = base
            for b in rng.choice(64, size=k, replace=False):
                v ^= (1 << int(b))
            variants.append(v - (1 << 64) if v >= (1 << 63) else v)
        t = pa.Table.from_pydict({
            "phash": pa.array(variants, pa.int64()),
            "image_id": pa.array([f"im{i}" for i in range(len(variants))])})
        banded = phash_near_dup_batchfn(t, max_hamming=4).to_pandas()
        base_rows = banded[banded["image_id"] == "im0"]
        base_buckets = set(zip(base_rows["band"], base_rows["band_bits"]))
        for i in range(1, len(variants)):
            rows = banded[banded["image_id"] == f"im{i}"]
            buckets = set(zip(rows["band"], rows["band_bits"]))
            assert buckets & base_buckets, f"pair (im0, im{i}) not colocated"


class TestAnnRecall:
    def test_lsh_recall_vs_bruteforce(self, ray_session):
        import ray.data

        from raydal.ops.ann import lsh_topk, topk_vectors_per_query

        rng = np.random.default_rng(11)
        n, d = 600, 32
        X = rng.standard_normal((n, d)).astype(np.float32)
        tbl = pa.Table.from_pydict({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(X.tolist(),
                                  pa.list_(pa.float32(), d))})
        queries = X[:3]
        ds = ray.data.from_arrow(tbl)
        brute = topk_vectors_per_query(ds, queries, k=10).to_pandas()
        approx = lsh_topk(ray.data.from_arrow(tbl), queries, k=10,
                          n_planes=4).to_pandas()
        # recall of the LSH variant vs exact top-10
        recalls = []
        for q in range(3):
            exact = set(brute[brute["query_idx"] == q]["vec_id"])
            got = set(approx[approx["query_idx"] == q]["vec_id"])
            recalls.append(len(exact & got) / 10)
        assert np.mean(recalls) >= 0.3  # 4 planes ≈ 1/16 of space scanned
        # the query vector itself is always rank 1 in brute force
        for q in range(3):
            top1 = brute[(brute["query_idx"] == q)
                         & (brute["rank"] == 1)]["vec_id"].iloc[0]
            assert top1 == q


class TestLineageResume:
    def test_checkpointed_write_resume(self, ray_session, tmp_path):
        import ray.data

        from raydal.lineage import checkpointed_write, completed_partitions

        out = str(tmp_path / "out")
        df = pd.DataFrame({"part_id": np.repeat(np.arange(6), 10),
                           "val": np.arange(60)})
        ds = ray.data.from_pandas(df)
        s1 = checkpointed_write(ds, out, "part_id", fingerprint="fp1")
        assert sorted(s1["part"]) == list(range(6))
        assert not s1["skipped"].any()
        assert completed_partitions(out, "fp1") == set(range(6))
        # rerun: everything skipped, bytes identical
        import hashlib
        digests = {p: hashlib.md5(open(os.path.join(
            out, f"part-{p}.parquet"), "rb").read()).hexdigest()
            for p in range(6)}
        s2 = checkpointed_write(ray.data.from_pandas(df), out, "part_id",
                                fingerprint="fp1")
        assert s2["skipped"].all()
        for p in range(6):
            got = hashlib.md5(open(os.path.join(
                out, f"part-{p}.parquet"), "rb").read()).hexdigest()
            assert got == digests[p]
        # changed fingerprint invalidates and rewrites
        s3 = checkpointed_write(ray.data.from_pandas(df), out, "part_id",
                                fingerprint="fp2")
        assert not s3["skipped"].any()

    def test_partial_resume_after_kill(self, ray_session, tmp_path):
        """Simulate a killed run: delete some partitions, resume fills
        only the missing ones."""
        import ray.data

        from raydal.lineage import checkpointed_write

        out = str(tmp_path / "out2")
        df = pd.DataFrame({"part_id": np.repeat(np.arange(4), 5),
                           "val": np.arange(20)})
        checkpointed_write(ray.data.from_pandas(df), out, "part_id", "fp")
        # simulate crash that lost partitions 1 and 3
        for p in (1, 3):
            os.remove(os.path.join(out, f"part-{p}.parquet"))
            os.remove(os.path.join(out, "_manifest", f"part-{p}.json"))
        s = checkpointed_write(ray.data.from_pandas(df), out, "part_id",
                               "fp")
        redone = sorted(s[~s["skipped"]]["part"])
        assert redone == [1, 3]


class TestKnnDifferential:
    def test_cell_group_matches_per_probe_oracle(self):
        """_knn_one (the retained scalar path) is the oracle for the
        vectorized _knn_cell_group: identical ids AND distances over a
        randomized field including co-located probes and distance ties."""
        from raydal.ops.join import KnnJoin, build_cell_points, \
            _planar_grid_idx

        rng = np.random.default_rng(42)
        n = 300
        xs = rng.uniform(0, 100, n)
        ys = rng.uniform(0, 100, n)
        # plant exact-distance ties: mirrored points
        xs[10], ys[10] = 50.0, 50.0
        xs[11], ys[11] = 52.0, 50.0
        xs[12], ys[12] = 48.0, 50.0
        index = build_cell_points(np.arange(n), xs, ys, z=4,
                                  window=(0.0, 0.0, 100.0, 100.0))
        j = KnnJoin.__new__(KnnJoin)
        j.index = index
        j.k = 5
        x0, y0, x1, y1 = index["window"]
        ncell = 1 << index["z"]
        j.cell_w = (x1 - x0) / ncell
        j.cell_h = (y1 - y0) / ncell
        px = rng.uniform(0, 100, 60)
        py = rng.uniform(0, 100, 60)
        px[0], py[0] = 50.0, 50.0  # exactly on a point; ties both sides
        px[1], py[1] = 50.0, 50.0  # co-located probes share a cell group
        gx = _planar_grid_idx(px, x0, x1, ncell)
        gy = _planar_grid_idx(py, y0, y1, ncell)
        keys, inv = np.unique(np.stack([gx, gy], 1), axis=0,
                              return_inverse=True)
        for ki, (cgx, cgy) in enumerate(keys):
            sel = np.nonzero(inv == ki)[0]
            vid, vd = j._knn_cell_group(px[sel], py[sel], int(cgx),
                                        int(cgy))
            for jj, i in enumerate(sel):
                oid, od = j._knn_one(px[i], py[i], gx[i], gy[i])
                np.testing.assert_array_equal(vid[jj], oid)
                np.testing.assert_allclose(vd[jj], od)


class TestIvfAnn:
    def test_recall_vs_bruteforce(self, ray_session):
        import ray.data

        from raydal.ops.ann import ivf_topk

        rng = np.random.default_rng(9)
        n, d = 600, 16
        # clustered data so IVF lists are meaningful
        centers = rng.standard_normal((8, d)) * 3
        x = (centers[rng.integers(0, 8, n)]
             + rng.standard_normal((n, d))).astype(np.float32)
        tbl = pa.Table.from_pydict({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(x.tolist(),
                                  pa.list_(pa.float32(), d))})
        queries = x[:5]
        got = ivf_topk(ray.data.from_arrow(tbl), queries, k=5,
                       n_clusters=8, nprobe=3).to_pandas()
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        hit = 0
        for qi in range(5):
            s = xn @ qn[qi]
            true = set(np.argsort(-s)[:5].tolist())
            mine = set(got[got["query_idx"] == qi]["vec_id"].tolist())
            hit += len(true & mine)
        assert hit / 25 >= 0.8  # recall with nprobe=3/8 lists
        # each query's own vector must be its rank-1 hit
        for qi in range(5):
            top = got[(got["query_idx"] == qi) & (got["rank"] == 1)]
            assert top.iloc[0]["vec_id"] == qi
