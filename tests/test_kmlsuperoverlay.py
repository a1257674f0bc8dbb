"""KML superoverlay writer vs the reference's published layout
(autotest/gdrivers/kmlsuperoverlay.py test_kmlsuperoverlay_3: a
512x512 source yields maxzoom 1 and exactly the files 0/0/0.*,
1/{0,1}/{0,1}.* plus the root doc)."""

import os

import numpy as np
import pytest

from raydal.io.codecs import decode
from raydal.io.kmlsuperoverlay import (superoverlay_plan,
                                       write_superoverlay)


def test_plan_published_512():
    # utm.tif is 512x512 -> maxzoom 1, 256x256 tiles (halve until <=400)
    assert superoverlay_plan(512, 512) == (1, 256, 256)
    assert superoverlay_plan(400, 400) == (0, 400, 400)
    assert superoverlay_plan(800, 400) == (1, 400, 200)


@pytest.fixture(scope="module")
def overlay(tmp_path_factory):
    d = tmp_path_factory.mktemp("so")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (512, 512), dtype=np.uint8)
    gt = [-117.639, 0.000645, 0.0, 33.903, 0.0, -0.000543]
    files = write_superoverlay(img, gt, str(d / "ov"), fmt="png",
                               name="tmp")
    return d / "ov", img, gt, files


def test_published_file_layout(overlay):
    out, _img, _gt, files = overlay
    # the exact published filelist shape of test_kmlsuperoverlay_3
    want = {"doc.kml", "0/0/0.png", "0/0/0.kml",
            "1/0/0.png", "1/0/0.kml", "1/0/1.png", "1/0/1.kml",
            "1/1/0.png", "1/1/0.kml", "1/1/1.png", "1/1/1.kml"}
    assert set(files) == want
    for f in want:
        assert (out / f).exists()


def test_root_kml_fields(overlay):
    out, _img, gt, _files = overlay
    data = (out / "doc.kml").read_text()
    # north/south/east/west from the geotransform corners
    assert f"<north>{gt[3]:f}</north>" in data
    assert f"<south>{gt[3] + gt[5] * 512:f}</south>" in data
    assert f"<east>{gt[0] + gt[1] * 512:f}</east>" in data
    assert f"<west>{gt[0]:f}</west>" in data
    assert "<href>0/0/0.kml</href>" in data
    assert "<minLodPixels>128</minLodPixels>" in data  # tilesize/2


def test_child_kml_structure(overlay):
    out, _img, _gt, _files = overlay
    k = (out / "0" / "0" / "0.kml").read_text()
    assert "<drawOrder>0</drawOrder>" in k
    assert "<href>0.png</href>" in k
    assert "<minLodPixels>1</minLodPixels>" in k       # zoom 0 rule
    # 4 children at zoom 1 with relative hrefs
    for cx, cy in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        assert f"<href>../../1/{cx}/{cy}.kml</href>" in k
    leaf = (out / "1" / "1" / "1.kml").read_text()
    assert "<maxLodPixels>-1</maxLodPixels>" in leaf
    assert "NetworkLink" not in leaf


def test_tile_pixels_full_res(overlay):
    out, img, _gt, _files = overlay
    # zoom 1 = native resolution: tile (ix=1, iy=1) is the top-right
    # 256x256 block (iy counts from the south edge)
    px = decode((out / "1" / "1" / "1.png").read_bytes())
    assert px.shape == (256, 256, 4)
    np.testing.assert_array_equal(px[:, :, 0], img[:256, 256:])
    assert (px[:, :, 3] == 255).all()
    # zoom 0 decimates 2:1 with center sampling
    px0 = decode((out / "0" / "0" / "0.png").read_bytes())
    np.testing.assert_array_equal(px0[:, :, 0], img[1::2, 1::2])


def test_latlonbox_math(overlay):
    out, _img, gt, _files = overlay
    # zoom 1 tile (0, 0): south-west corner tile
    k = (out / "1" / "0" / "0.kml").read_text()
    south = gt[3] + gt[5] * 512
    assert f"<south>{south:f}</south>" in k
    assert f"<north>{south + abs(gt[5]) * 256:f}</north>" in k
    assert f"<west>{gt[0]:f}</west>" in k
    assert f"<east>{gt[0] + gt[1] * 256:f}</east>" in k


def test_superoverlay_sink(ray_session, tmp_path):
    import ray.data

    from raydal.pipeline import SINK_REGISTRY

    img = np.arange(512 * 512, dtype=np.uint8).reshape(512, 512)
    ds = ray.data.from_items([{
        "image_id": "x", "band": 1, "data": img.tobytes(),
        "w": 512, "h": 512, "dtype": "uint8",
        "geotransform": [0.0, 0.01, 0.0, 5.0, 0.0, -0.01],
        "nodata": None}])
    SINK_REGISTRY["kmlsuperoverlay"](ds, str(tmp_path / "so"))
    assert (tmp_path / "so" / "x" / "doc.kml").exists()
    assert (tmp_path / "so" / "x" / "1" / "1" / "1.png").exists()


def test_kmz(tmp_path):
    import zipfile

    img = np.arange(512 * 512, dtype=np.uint8).reshape(512, 512)
    p = str(tmp_path / "o.kmz")
    from raydal.io.kmlsuperoverlay import write_superoverlay_kmz
    write_superoverlay_kmz(img, [0, 0.01, 0, 5, 0, -0.01], p)
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert "doc.kml" in names and "1/1/1.png" in names
        px = decode(z.read("1/1/1.png"))
        np.testing.assert_array_equal(px[:, :, 0], img[:256, 256:])


def test_read_superoverlay_roundtrip(tmp_path):
    from raydal.io.kmlsuperoverlay import (read_superoverlay,
                                           write_superoverlay)

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (512, 512), dtype=np.uint8)
    gt = [10.0, 0.01, 0.0, 60.0, 0.0, -0.01]
    write_superoverlay(img, gt, str(tmp_path / "ov"))
    bands, got_gt = read_superoverlay(str(tmp_path / "ov"))
    np.testing.assert_array_equal(bands[0], img)
    np.testing.assert_allclose(got_gt, gt, rtol=1e-9)


def test_read_superoverlay_kmz(tmp_path):
    from raydal.io.kmlsuperoverlay import (read_superoverlay,
                                           write_superoverlay_kmz)

    img = (np.arange(512 * 512, dtype=np.int64) % 251).astype(
        np.uint8).reshape(512, 512)
    p = str(tmp_path / "o.kmz")
    write_superoverlay_kmz(img, [0, 0.01, 0, 5, 0, -0.01], p)
    bands, _gt = read_superoverlay(p)
    np.testing.assert_array_equal(bands[0], img)


def test_superoverlay_source(ray_session, tmp_path):
    from raydal.io.kmlsuperoverlay import write_superoverlay
    from raydal.pipeline import SOURCE_REGISTRY

    img = (np.arange(512 * 512, dtype=np.int64) % 199).astype(
        np.uint8).reshape(512, 512)
    write_superoverlay(img, [0, 0.01, 0, 5, 0, -0.01],
                       str(tmp_path / "ov"))
    rows = SOURCE_REGISTRY["kmlsuperoverlay"](
        str(tmp_path / "ov")).take_all()
    a = np.frombuffer(rows[0]["data"], np.uint8).reshape(
        rows[0]["h"], rows[0]["w"])
    np.testing.assert_array_equal(a, img)


def test_projected_source_utm():
    # a UTM-11N source (the utm.tif shape of test_kmlsuperoverlay_3):
    # root box must be the Krüger-inverse corners, west < east both
    # negative longitudes, north > south
    import re

    import tempfile

    from raydal.geo.crs import utm_to_lonlat
    from raydal.io.kmlsuperoverlay import (epsg_to_lonlat,
                                           write_superoverlay)

    img = np.zeros((512, 512), np.uint8)
    gt = [440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0]
    d = tempfile.mkdtemp()
    write_superoverlay(img, gt, d, to_lonlat=epsg_to_lonlat(32611))
    doc = open(os.path.join(d, "doc.kml")).read()

    def field(tag):
        return float(re.search(f"<{tag}>([-0-9.]+)</{tag}>",
                               doc).group(1))

    wlon, slat = utm_to_lonlat(gt[0], gt[3] - 60.0 * 512, 32611)
    elon, nlat = utm_to_lonlat(gt[0] + 60.0 * 512, gt[3], 32611)
    assert field("west") == pytest.approx(float(wlon), abs=1e-5)
    assert field("east") == pytest.approx(float(elon), abs=1e-5)
    assert field("north") == pytest.approx(float(nlat), abs=1e-5)
    assert field("south") == pytest.approx(float(slat), abs=1e-5)
    assert -118.2 < field("west") < field("east") < -116.9
    assert 33.5 < field("south") < field("north") < 34.0
