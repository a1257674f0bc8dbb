"""Long-tail sweep #3 readers vs published autotest expectations:
CALS, DDS, VRT-XML, DIMAP, GRASS ASCII grid, NSIDCbin."""

import os
import shutil

import numpy as np
import pytest

from raydal.io.aaigrid import read_grassascii
from raydal.io.cals import cals_header, read_cals, write_cals
from raydal.io.dds import _expand565, read_dds, write_dds
from raydal.io.dimap import dimap_info, read_dimap
from raydal.io.rawmisc import read_nsidcbin
from raydal.io.tiff import read_tiff
from raydal.io.vrtxml import read_vrt
from raydal.kernels.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/"
GC = "/root/reference/autotest/gcore/data/"
needs_ref = pytest.mark.skipif(not os.path.isdir(D),
                               reason="reference autotest data absent")


# ------------------------------------------------------------- GRASS

@needs_ref
def test_grassascii():
    # grassasciigrid.py test_grassasciigrid_1: checksum 212 + gt
    a, gt, _nd = read_grassascii(D + "grassasciigrid/grassascii.txt")
    assert checksum(a) == 212
    assert gt == pytest.approx(
        (-100.0, 62.5, 0.0, 250.0, 0.0, -41.666666666666664))
    assert a.dtype == np.int32


def test_grassascii_null_and_type():
    txt = ("north: 4\nsouth: 0\neast: 4\nwest: 0\n"
           "rows: 2\ncols: 2\nnull: -1\ntype: float\n-1 2\n3 4\n")
    a, gt, nd = read_grassascii(txt)
    assert a.dtype == np.float32 and nd == -1.0
    assert a[0, 0] == -1 and a[1, 1] == 4


# ---------------------------------------------------------- NSIDCbin

@needs_ref
def test_nsidcbin():
    # nsidcbin.py test_nsidcbin_1: 316 cols, Byte, px(60,44) == 27
    a, gt, _nd = read_nsidcbin(
        D + "nsidcbin/nt_20220409_f18_nrt_s.bin")
    assert a.shape == (332, 316)
    assert a.dtype == np.uint8
    assert a[44, 60] == 27
    assert gt[0] == -3950000.0          # southern grid (ANTARCTIC)


# --------------------------------------------------------------- CALS

@needs_ref
def test_cals_small1bit():
    # cals.py test_cals_1: CreateCopy(small1bit.img) checksum 9907
    from raydal.io.hfa import read_hfa

    a, _gt, _nd = read_hfa(D + "hfa/small1bit.img")
    blob = write_cals(a)
    r, _, _ = read_cals(blob)
    assert checksum(r[0]) == 9907
    hdr = cals_header(blob)
    assert (hdr["width"], hdr["height"]) == (300, 300)
    assert hdr["density"] == 200


@needs_ref
def test_cals_oddsize_and_palette():
    # cals.py test_cals_2/3: checksum 3883; a white,black-palette
    # source copies without inversion and keeps 3883
    img = read_tiff(open(GC + "oddsize1bit.tif", "rb").read())
    blob = write_cals(img.bands[0])
    r, _, _ = read_cals(blob)
    assert checksum(r[0]) == 3883
    blob2 = write_cals(r, palette_white_black=True, density=600)
    r2, _, _ = read_cals(blob2)
    assert checksum(r2[0]) == 3883
    assert cals_header(blob2)["density"] == 600


def test_cals_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    a = (rng.random((37, 53)) > 0.5).astype(np.uint8)
    p = tmp_path / "x.cal"
    write_cals(a, str(p))
    r, _, _ = read_cals(str(p))
    assert np.array_equal(r[0], 1 - a)   # stored inverted
    with pytest.raises(ValueError):
        write_cals(np.zeros((2, 2, 2), np.uint8))


# --------------------------------------------------------------- DDS

@needs_ref
def test_dds_uncompressed_fixture():
    # dds.py test_dds_no_compression: band checksums must equal the
    # stefan_full_rgba.tif source's
    ref = read_tiff(open(GC + "stefan_full_rgba.tif", "rb").read())
    want = [checksum(b) for b in ref.bands]
    a, _gt, _nd = read_dds(
        D + "dds/stefan_full_rgba_no_compression.dds")
    assert [checksum(b) for b in a] == want


def test_dds_dxt_roundtrips():
    rng = np.random.default_rng(7)
    c565 = rng.integers(0, 65536, (3, 4)).astype(np.uint16)
    r, g, b = _expand565(c565)
    img = np.zeros((12, 16, 4), np.uint8)
    for by in range(3):
        for bx in range(4):
            img[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4, 0] = r[by, bx]
            img[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4, 1] = g[by, bx]
            img[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4, 2] = b[by, bx]
    img[..., 3] = 255
    bands = [img[..., i] for i in range(4)]
    for fmt in ("DXT1", "DXT3", "DXT5", "UNCOMPRESSED"):
        dec, _, _ = read_dds(write_dds(bands, fmt=fmt))
        assert np.array_equal(dec, np.stack(bands)), fmt
    # odd sizes survive block padding
    odd = [b[:11, :13] for b in bands]
    for fmt in ("DXT1", "DXT3", "DXT5"):
        dec, _, _ = read_dds(write_dds(odd, fmt=fmt))
        assert dec.shape == (4, 11, 13)
        assert np.array_equal(dec[:3], np.stack(odd[:3])), fmt


def test_dds_dxt5_alpha_ramp():
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = np.linspace(0, 255, 64).reshape(8, 8)
    dec, _, _ = read_dds(write_dds([img[..., i] for i in range(4)],
                                   fmt="DXT5"))
    err = np.abs(dec[3].astype(int) - img[..., 3].astype(int)).max()
    assert err <= 8                      # 3-bit interpolated alpha


# --------------------------------------------------------------- VRT

@needs_ref
def test_vrt_simple_source(tmp_path):
    shutil.copy(D + "dimap/IMAGERY.TIF", tmp_path / "IMAGERY.TIF")
    shutil.copy(D + "rgbsmall.tif", tmp_path / "rgbsmall.tif")
    a, gt, _nd = read_vrt(str(tmp_path / "IMAGERY.TIF"))
    assert a.shape == (1, 6000, 6000)
    # dimap.py test_dimap_1 window checksum through the VRT wrapper
    assert checksum(a[0][:100, :100]) == 21586


def test_vrt_scale_and_rects(tmp_path):
    from raydal.io.tiff import write_tiff

    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    (tmp_path / "s.tif").write_bytes(write_tiff([src]))
    doc = """<VRTDataset rasterXSize="8" rasterYSize="4">
      <VRTRasterBand dataType="Int16" band="1">
        <NoDataValue>-1</NoDataValue>
        <ComplexSource>
          <SourceFilename relativeToVRT="1">s.tif</SourceFilename>
          <SourceBand>1</SourceBand>
          <SrcRect xOff="0" yOff="0" xSize="4" ySize="4"/>
          <DstRect xOff="4" yOff="0" xSize="4" ySize="4"/>
          <ScaleRatio>2</ScaleRatio>
          <ScaleOffset>10</ScaleOffset>
        </ComplexSource>
      </VRTRasterBand>
    </VRTDataset>"""
    p = tmp_path / "v.vrt"
    p.write_text(doc)
    a, _gt, nd = read_vrt(str(p))
    assert a.dtype == np.int16 and nd == -1
    assert np.all(a[0][:, :4] == -1)      # unfilled → nodata
    assert np.array_equal(a[0][:, 4:], src.astype(np.int16) * 2 + 10)


def test_vrt_nearest_resample(tmp_path):
    from raydal.io.tiff import write_tiff

    src = np.array([[0, 255]], np.uint8)
    (tmp_path / "s.tif").write_bytes(write_tiff([src]))
    doc = """<VRTDataset rasterXSize="4" rasterYSize="2">
      <VRTRasterBand dataType="Byte" band="1">
        <SimpleSource>
          <SourceFilename relativeToVRT="1">s.tif</SourceFilename>
          <SrcRect xOff="0" yOff="0" xSize="2" ySize="1"/>
          <DstRect xOff="0" yOff="0" xSize="4" ySize="2"/>
        </SimpleSource>
      </VRTRasterBand>
    </VRTDataset>"""
    p = tmp_path / "v.vrt"
    p.write_text(doc)
    a, _gt, _nd = read_vrt(str(p))
    assert np.array_equal(a[0],
                          np.tile([0, 0, 255, 255], (2, 1)))


# ------------------------------------------------------------- DIMAP

@needs_ref
def test_dimap_fixture(tmp_path):
    # dimap.py test_dimap_1: size, metadata translation, GCPs at
    # half-pixel centers, windowed checksum 21586
    shutil.copy(D + "dimap/METADATA.DIM", tmp_path / "METADATA.DIM")
    shutil.copy(D + "dimap/IMAGERY.TIF", tmp_path / "IMAGERY.TIF")
    shutil.copy(D + "rgbsmall.tif", tmp_path / "rgbsmall.tif")
    info = dimap_info(str(tmp_path / "METADATA.DIM"))
    assert (info["ncols"], info["nrows"], info["nbands"]) == \
        (6000, 6000, 1)
    assert info["metadata"]["PROCESSING_LEVEL"] == "1A"
    assert info["metadata"]["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
    assert info["crs"] == "EPSG:4326"
    g = info["gcps"]
    assert len(g) == 4
    assert g[0]["pixel"] == 0.5 and g[0]["line"] == 0.5
    assert g[0]["x"] == pytest.approx(4.3641728, abs=2e-7)
    assert g[0]["y"] == pytest.approx(44.2082255, abs=2e-7)
    assert g[0]["z"] == pytest.approx(0, abs=2e-7)
    a, _gt, _nd = read_dimap(str(tmp_path / "METADATA.DIM"))
    assert a.shape == (1, 6000, 6000)
    assert checksum(a[0][:100, :100]) == 21586


# ---------------------------------------------------- source registry

@needs_ref
def test_sweep3_sources(ray_session, tmp_path):
    from raydal.pipeline import open_source, write_sink

    df = open_source(
        "grassascii",
        D + "grassasciigrid/grassascii.txt").to_pandas()
    assert df.iloc[0]["w"] == 4 and df.iloc[0]["h"] == 6

    df = open_source(
        "nsidcbin", D + "nsidcbin/nt_20220409_f18_nrt_s.bin"
    ).to_pandas()
    assert df.iloc[0]["w"] == 316

    # cals sink + source round trip through the registry
    from raydal.io.hfa import read_hfa

    a, _gt, _nd = read_hfa(D + "hfa/small1bit.img")
    import pyarrow as pa
    import ray.data
    t = pa.table({
        "image_id": ["small1bit"], "band": pa.array([1], pa.int32()),
        "data": [(a[0] != 0).astype(np.uint8).tobytes()],
        "w": pa.array([a.shape[2]], pa.int32()),
        "h": pa.array([a.shape[1]], pa.int32()),
        "dtype": ["uint8"],
    })
    dst = tmp_path / "o.cal"
    write_sink("cals", ray.data.from_arrow(t), str(dst))
    r = open_source("cals", str(dst)).to_pandas()
    arr = np.frombuffer(r.iloc[0]["data"], np.uint8).reshape(
        r.iloc[0]["h"], r.iloc[0]["w"])
    assert checksum(arr) == 9907

    # dds sink round trip
    t2 = pa.table({
        "image_id": ["x"] * 3,
        "band": pa.array([1, 2, 3], pa.int32()),
        "data": [np.full((4, 4), v, np.uint8).tobytes()
                 for v in (255, 0, 128)],
        "w": pa.array([4] * 3, pa.int32()),
        "h": pa.array([4] * 3, pa.int32()),
        "dtype": ["uint8"] * 3,
    })
    dst2 = tmp_path / "o.dds"
    write_sink("dds", ray.data.from_arrow(t2), str(dst2))
    r2 = open_source("dds", str(dst2)).to_pandas()
    assert len(r2) == 4                  # RGBA bands
    b1 = np.frombuffer(r2.iloc[0]["data"], np.uint8)
    assert b1[0] == 255
