"""GeoParquet writer/metadata tests — spec v1.0.0 footer structure,
distributed stamping, and read-back interop."""

import glob
import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydal.geo.wkb import (linestring_wkb, point_wkb, polygon_wkb)
from raydal.io.geoparquet import (attach_geo_metadata, geo_metadata,
                                  read_geoparquet_metadata,
                                  write_geoparquet)


def _square(x0, y0, s):
    return polygon_wkb([np.array([[x0, y0], [x0 + s, y0],
                                  [x0 + s, y0 + s], [x0, y0 + s],
                                  [x0, y0]], np.float64)])


def _fixture_table(n=10):
    wkbs = []
    for i in range(n):
        if i % 3 == 0:
            wkbs.append(point_wkb(float(i), float(2 * i)))
        elif i % 3 == 1:
            wkbs.append(linestring_wkb(
                np.array([[i, 0], [i + 1, 1]], np.float64)))
        else:
            wkbs.append(_square(float(i), 0.0, 1.0))
    return pa.Table.from_pydict({
        "fid": pa.array(range(n), pa.int64()),
        "wkb": pa.array(wkbs, pa.binary())})


def test_metadata_structure():
    meta = geo_metadata("wkb", ["Point", "Polygon"],
                        bbox=[0, 0, 9, 18])
    assert meta["version"] == "1.0.0"
    assert meta["primary_column"] == "wkb"
    col = meta["columns"]["wkb"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["Point", "Polygon"]
    assert col["bbox"] == [0.0, 0.0, 9.0, 18.0]


def test_attach_stamps_schema_and_types():
    t = attach_geo_metadata(_fixture_table(), compute_bbox=True)
    geo = json.loads(t.schema.metadata[b"geo"].decode())
    assert set(geo["columns"]["wkb"]["geometry_types"]) == {
        "Point", "LineString", "Polygon"}
    bbox = geo["columns"]["wkb"]["bbox"]
    # max x: square at x=8 spans to 9; points reach x=9
    assert bbox[0] == 0.0 and bbox[2] == 9.0


def test_attach_requires_column():
    t = pa.Table.from_pydict({"x": pa.array([1])})
    with pytest.raises(ValueError, match="missing geometry column"):
        attach_geo_metadata(t)


def test_footer_survives_parquet_roundtrip(tmp_path):
    t = attach_geo_metadata(_fixture_table(), compute_bbox=True)
    path = os.path.join(tmp_path, "a.parquet")
    pq.write_table(t, path)
    geo = read_geoparquet_metadata(path)
    assert geo["primary_column"] == "wkb"
    back = pq.read_table(path)
    assert back["wkb"].num_chunks >= 1


def test_read_metadata_rejects_plain_parquet(tmp_path):
    path = os.path.join(tmp_path, "plain.parquet")
    pq.write_table(pa.Table.from_pydict({"x": pa.array([1])}), path)
    with pytest.raises(ValueError, match="GeoParquet"):
        read_geoparquet_metadata(path)


def test_distributed_write(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_fixture_table(40)).repartition(4)
    out = os.path.join(tmp_path, "gp")
    write_geoparquet(ds, out, crs=None)
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert files
    # EVERY file is independently a valid GeoParquet file
    for f in files:
        geo = read_geoparquet_metadata(f)
        assert geo["version"] == "1.0.0"
        assert geo["columns"]["wkb"]["encoding"] == "WKB"
    # read-back sees all rows and the same geometry bytes
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 40
    src = _fixture_table(40).to_pandas()
    assert set(back["fid"]) == set(src["fid"])
