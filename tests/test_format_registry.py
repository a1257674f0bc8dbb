"""New-format source/sink registry entries driven through Ray Data."""
import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from raydal.pipeline import open_source, write_sink

KML_DATA = "/root/reference/autotest/ogr/data/kml"
GPX_DATA = "/root/reference/autotest/ogr/data/gpx"
DTED_N43 = "/root/reference/autotest/gdrivers/data/n43.dt0"
needs_ref = pytest.mark.skipif(not os.path.exists(DTED_N43),
                               reason="reference autotest data absent")


@needs_ref
def test_kml_source(ray_session):
    ds = open_source("kml", os.path.join(KML_DATA, "samples.kml"))
    t = ds.to_pandas()
    assert len(t) == 19                       # all layers concatenated
    assert set(t["layer"]) == {"Placemarks", "Highlighted Icon",
                               "Paths", "Google Campus",
                               "Extruded Polygon",
                               "Absolute and Relative"}
    one = open_source("kml", os.path.join(KML_DATA, "samples.kml"),
                      layer="Placemarks").to_pandas()
    assert len(one) == 3


@needs_ref
def test_gpx_source(ray_session):
    ds = open_source("gpx", os.path.join(GPX_DATA, "test.gpx"),
                     layer="track_points")
    df = ds.to_pandas()
    assert len(df) == 4
    assert df["track_seg_id"].tolist() == [0, 0, 1, 1]


@needs_ref
def test_kml_sink_roundtrip(ray_session, tmp_path):
    import ray.data

    from raydal.geo.wkb import point_wkb
    from raydal.io.kml import read_kml

    t = pa.Table.from_pydict({
        "Name": pa.array([f"pt{i}" for i in range(6)], pa.string()),
        "wkb": pa.array([point_wkb(i, -i) for i in range(6)],
                        pa.binary())})
    out = str(tmp_path / "pts.kml")
    write_sink("kml", ray.data.from_arrow(t), out)
    back = read_kml(out)[0][1]
    assert back["Name"].to_pylist() == [f"pt{i}" for i in range(6)]
    assert back["wkb"].to_pylist() == t["wkb"].to_pylist()


@needs_ref
def test_dted_source_and_sink(ray_session, tmp_path):
    from raydal.io.dem import read_dted
    from raydal.kernels.checksum import checksum

    ds = open_source("dted", DTED_N43)
    df = ds.to_pandas()
    assert len(df) == 1 and df["w"][0] == 121 and df["band"][0] == 1
    a = np.frombuffer(df["data"][0], np.int16).reshape(121, 121)
    assert checksum(a) == 49187
    # resumable per-row sink round-trips
    out = str(tmp_path / "dem")
    res = write_sink("dted", ds, out).to_pandas()
    assert len(res) == 1
    back, gt, _ = read_dted(res["path"][0])
    assert (back == a).all()
    assert gt == pytest.approx(tuple(df["geotransform"][0]), abs=1e-9)


@needs_ref
def test_xyz_source_sink(ray_session, tmp_path):
    from raydal.io.xyz import write_xyz

    p = str(tmp_path / "grid.xyz")
    rng = np.random.default_rng(2)
    a = rng.integers(0, 200, (6, 5)).astype(np.uint8)
    gt = (10.0, 2.0, 0.0, 50.0, 0.0, -2.0)
    write_xyz(a, gt, p)
    ds = open_source("xyz", p)
    df = ds.to_pandas()
    b = np.frombuffer(df["data"][0], np.uint8).reshape(6, 5)
    assert (b == a).all()
    out = str(tmp_path / "outgrids")
    res = write_sink("xyz", ds, out).to_pandas()
    assert os.path.exists(res["path"][0])


@needs_ref
def test_ehdr_source(ray_session):
    ds = open_source(
        "ehdr", "/root/reference/autotest/gdrivers/data/ehdr/float32.hdr")
    df = ds.to_pandas()
    assert df["dtype"][0] == "float32" and df["w"][0] == 20


@needs_ref
def test_envi_source(ray_session):
    ds = open_source(
        "envi",
        "/root/reference/autotest/gdrivers/data/envi/envi_rgbsmall_bil.hdr")
    df = ds.to_pandas()
    assert len(df) == 3                        # one row per band
    assert df["band"].tolist() == [1, 2, 3]