"""The unified CLI (``python -m raydal`` — the reference's ``gdal``
command, apps/gdalalg_* pipeline grammar)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "raydal"] + args,
                          cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=240)


@pytest.fixture(scope="module")
def tif_fixture(tmp_path_factory):
    from raydal.io.tiff import write_tiff

    d = tmp_path_factory.mktemp("cli")
    src = (np.arange(400, dtype=np.uint8) % 251).reshape(20, 20)
    with open(d / "in.tif", "wb") as f:
        f.write(write_tiff(src, geotransform=[0, 1, 0, 20, 0, -1]))
    return d, src


def test_cli_usage():
    r = _run(["--help"], cwd="/tmp")
    assert r.returncode == 0
    assert "raster pipeline" in r.stdout


def test_cli_formats():
    r = _run(["formats"], cwd="/tmp")
    assert r.returncode == 0
    doc = json.loads(r.stdout)
    assert "gtiff" in doc["sources"] and "gtiff" in doc["sinks"]
    assert "raster-hillshade" in doc["steps"]


def test_cli_raster_info(tif_fixture):
    d, _src = tif_fixture
    r = _run(["raster", "info", "in.tif"], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout[r.stdout.index("{"):])
    assert doc["rows"] == 1
    assert any(c["name"] == "data" for c in doc["columns"])


def test_cli_pipeline_scale_roundtrip(tif_fixture):
    d, src = tif_fixture
    r = _run(["raster", "pipeline", "read", "in.tif", "!",
              "encode-image", "!", "raster-scale", "scale=0.5",
              "offset=2", "!", "decode-image", "!", "write", "out_dir",
              "format=gtiff"], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    from raydal.io.tiff import read_tiff
    with open(d / "out_dir" / "in.tif", "rb") as f:
        img = read_tiff(f.read())
    want = np.clip(np.floor(src * 0.5 + 2 + 0.5), 0,
                   255).astype(np.uint8)
    np.testing.assert_array_equal(img.bands[0], want)
    assert img.geotransform == (0.0, 1.0, 0.0, 20.0, 0.0, -1.0)


def test_cli_gdalg_save_and_run(tif_fixture):
    d, src = tif_fixture
    r = _run(["raster", "pipeline", "read", "in.tif", "!",
              "encode-image", "!", "decode-image", "!", "write",
              "p.gdalg.json"], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    assert (d / "p.gdalg.json").exists()
    r = _run(["pipeline", "run", "p.gdalg.json", "!", "write",
              "rerun_dir", "format=gtiff"], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    from raydal.io.tiff import read_tiff
    with open(d / "rerun_dir" / "in.tif", "rb") as f:
        img = read_tiff(f.read())
    np.testing.assert_array_equal(img.bands[0], src)


def test_cli_convert_and_vector_info(tif_fixture):
    d, _src = tif_fixture
    r = _run(["raster", "convert", "in.tif", "bands.parquet"], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    import pyarrow.parquet as pq
    t = pq.read_table(str(d / "bands.parquet"))
    assert t.num_rows == 1 and "data" in t.column_names

    wells = "/root/reference/autotest/gnm/data/wells.shp"
    r = _run(["vector", "info", wells], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout[r.stdout.index("{"):])
    assert doc["rows"] == 31


def test_cli_mdim(tmp_path):
    from raydal.io.hdf5 import write_hdf5

    cube = np.arange(2 * 6 * 8, dtype=np.int32).reshape(2, 6, 8)
    write_hdf5({"cube": cube}, str(tmp_path / "c.h5"))
    r = _run(["mdim", "info", "c.h5", "array=cube"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout)
    assert [d["size"] for d in doc["dims"]] == [2, 6, 8]

    r = _run(["mdim", "translate", "c.h5", "out.h5", "array=cube",
              "view=[1,::2,:]"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    from raydal.io.hdf5 import HDF5File
    got = HDF5File(str(tmp_path / "out.h5")).read("/cube")
    np.testing.assert_array_equal(got, cube[1, ::2, :])


def test_cli_raster_tile(tmp_path):
    r = _run(["raster", "tile", "/root/testdata/sf0.001", "tiles",
              "z_max=7", "z_min=7", "limit_images=10"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("{")][-1]
    doc = json.loads(line)
    assert doc["tiles_per_level"]["7"] > 0
    import glob
    assert glob.glob(str(tmp_path / "tiles" / "z7" / "*.parquet"))


def test_cli_rejects_steps_after_write(tif_fixture):
    d, _src = tif_fixture
    r = _run(["raster", "pipeline", "read", "in.tif", "!", "write",
              "o_dir", "format=gtiff", "!", "raster-scale", "scale=2"],
             cwd=d)
    assert r.returncode != 0
    assert "final stage" in (r.stderr + r.stdout)


def test_cli_gdalg_save_is_metadata_only(tmp_path):
    # saving must not open the (non-existent) source or start Ray
    r = _run(["raster", "pipeline", "read", "missing.tif", "!",
              "encode-image", "!", "write", "m.gdalg.json"],
             cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / "m.gdalg.json").exists()


def test_cli_gdalg_list_params_roundtrip(tif_fixture):
    # list-typed step params survive the save/run cycle with JSON
    # types (raster-select's bands=[1] must arrive as a list, not the
    # string "[1]")
    import json as _json
    d, src = tif_fixture
    doc = {"type": "raydal_pipeline", "version": 2,
           "read": ["in.tif"],
           "steps": [{"name": "encode-image", "params": {}},
                     {"name": "raster-select",
                      "params": {"bands": [1]}},
                     {"name": "decode-image", "params": {}}]}
    (d / "lp.gdalg.json").write_text(_json.dumps(doc))
    r = _run(["pipeline", "run", "lp.gdalg.json", "!", "write",
              "sel.parquet"], cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    import pyarrow.parquet as pq
    t = pq.read_table(str(d / "sel.parquet"))
    assert t.num_rows == 1
    got = np.frombuffer(t["data"][0].as_py(), np.uint8).reshape(20, 20)
    np.testing.assert_array_equal(got, src)


def test_cli_gnm_path():
    r = _run(["gnm", "path",
              "/root/reference/autotest/gnm/data/pipes.shp",
              "/root/reference/autotest/gnm/data/wells.shp",
              "src=61", "tgt=50", "algorithm=kshortest", "k=3"],
             cwd="/tmp")
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout)
    assert len(doc["paths"]) == 3
    costs = [p["cost"] for p in doc["paths"]]
    assert costs == sorted(costs)


def test_cli_raster_info_stats_published_checksum():
    # gdal raster info band stats over the canonical byte.tif — the
    # published GDALChecksumImage value is 4672
    r = _run(["raster", "info", "/root/reference/autotest/gcore/data/"
              "byte.tif", "stats=true"], cwd="/tmp")
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout[r.stdout.index("{"):])
    assert doc["bands"][0]["checksum"] == 4672
    assert doc["bands"][0]["minimum"] == 74.0
    assert doc["bands"][0]["maximum"] == 255.0


def test_cli_layer_algebra(tmp_path):
    import pyarrow as pa

    from raydal.geo.wkb import polygon_wkb
    from raydal.io.shapefile import write_shapefile

    def box(x0, y0, x1, y1):
        return polygon_wkb([[(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                             (x0, y0)]])

    write_shapefile(pa.Table.from_pydict({
        "id": pa.array([1, 2], pa.int64()),
        "wkb": pa.array([box(0, 0, 4, 4), box(10, 10, 12, 12)],
                        pa.binary())}), str(tmp_path / "la_in"))
    write_shapefile(pa.Table.from_pydict({
        "id": pa.array([7], pa.int64()),
        "wkb": pa.array([box(2, 2, 6, 6)], pa.binary())}),
        str(tmp_path / "la_m"))
    r = _run(["vector", "layer-algebra", "intersection", "la_in.shp",
              "la_m.shp", "out.parquet"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    import pyarrow.parquet as pq
    t = pq.read_table(str(tmp_path / "out.parquet"))
    assert t.num_rows == 1
    assert t["feat_id"][0].as_py() == 1
    assert t["zone_id"][0].as_py() == 7
    assert t["area"][0].as_py() == 4.0


def test_cli_vector_sql():
    r = _run(["vector", "sql",
              "SELECT COUNT(*) AS n, MIN(depth) AS mind, "
              "MAX(depth) AS maxd FROM wells",
              "/root/reference/autotest/gnm/data/wells.shp"],
             cwd="/tmp")
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout.strip().splitlines()[-1])
    assert doc == {"n": 31, "mind": 10, "maxd": 16}


def test_cli_convert_per_row_sink_materializes(tif_fixture):
    """Regression: per-row raster sinks return a lazy Dataset — the
    CLI must consume it or 'wrote ...' prints with nothing on disk."""
    d, src = tif_fixture
    r = _run(["raster", "convert", "in.tif", "outxyz", "format=xyz"],
             cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    assert (d / "outxyz" / "in.xyz").exists()

    r = _run(["raster", "convert", "in.tif", "outz", "format=zarr"],
             cwd=d)
    assert r.returncode == 0, r.stderr[-800:]
    from raydal.io.zarr import read_zarr_raster
    arr, gt, _nd = read_zarr_raster(str(d / "outz" / "in.zarr"))
    assert np.array_equal(arr, src)
    np.testing.assert_allclose(gt, [0, 1, 0, 20, 0, -1])


def test_cli_zarr_source_by_extension(tmp_path):
    """.zarr paths resolve to the zarr source in raster info."""
    from raydal.io.zarr import write_zarr_classic
    data = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    write_zarr_classic(tmp_path / "s.zarr", data, gt=(0, 1, 0, 8, 0, -1))
    r = _run(["raster", "info", "s.zarr"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    doc = json.loads(r.stdout[r.stdout.index("{"):])
    assert doc["rows"] == 1
