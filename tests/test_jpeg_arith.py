"""Arithmetic-coded JPEG (SOF9) — T.81 Annex D/F parity.

The reference publishes the end-to-end golden (autotest/gdrivers/
jpeg.py test_jpeg_24: ARITHMETIC=YES CreateCopy of byte.tif decodes
to checksum 4743) but its vendored IJG build omits the arithmetic
back end, so the independent oracle here is the SYSTEM libjpeg
(-turbo): a tiny C harness is compiled at test time to (a) produce
arithmetic streams for our decoder, (b) decode our encoder's output,
and (c) dump quantized coefficients so our entropy streams can be
compared byte-for-byte."""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

import raydal.io.jpeg_arith as JA
from raydal.io.jpeg import ZIGZAG, decode_jpeg, encode_jpeg, \
    encode_jpeg_arith
from raydal.io.tiff import read_tiff
from raydal.kernels.checksum import checksum

TOOL_SRC = r'''
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
int main(int argc, char** argv) {
    if (!strcmp(argv[1], "enc")) {
        int w = atoi(argv[2]), h = atoi(argv[3]), q = atoi(argv[4]);
        FILE* fi = fopen(argv[5], "rb");
        unsigned char* buf = malloc((size_t)w * h);
        fread(buf, 1, (size_t)w * h, fi); fclose(fi);
        struct jpeg_compress_struct c; struct jpeg_error_mgr e;
        c.err = jpeg_std_error(&e);
        jpeg_create_compress(&c);
        FILE* fo = fopen(argv[6], "wb");
        jpeg_stdio_dest(&c, fo);
        c.image_width = w; c.image_height = h;
        c.input_components = 1; c.in_color_space = JCS_GRAYSCALE;
        jpeg_set_defaults(&c);
        jpeg_set_quality(&c, q, TRUE);
        c.arith_code = TRUE;
        jpeg_start_compress(&c, TRUE);
        while (c.next_scanline < c.image_height) {
            JSAMPROW row = buf + (size_t)c.next_scanline * w;
            jpeg_write_scanlines(&c, &row, 1);
        }
        jpeg_finish_compress(&c); fclose(fo);
        jpeg_destroy_compress(&c); free(buf);
    } else if (!strcmp(argv[1], "dec")) {
        struct jpeg_decompress_struct d; struct jpeg_error_mgr e;
        d.err = jpeg_std_error(&e);
        jpeg_create_decompress(&d);
        FILE* fi = fopen(argv[2], "rb");
        jpeg_stdio_src(&d, fi);
        jpeg_read_header(&d, TRUE);
        jpeg_start_decompress(&d);
        int stride = d.output_width * d.output_components;
        unsigned char* row = malloc(stride);
        FILE* fo = fopen(argv[3], "wb");
        fprintf(stderr, "%d %d %d\n", d.output_width,
                d.output_height, d.output_components);
        while (d.output_scanline < d.output_height) {
            JSAMPROW r = row;
            jpeg_read_scanlines(&d, &r, 1);
            fwrite(row, 1, stride, fo);
        }
        fclose(fo); fclose(fi);
        jpeg_finish_decompress(&d); jpeg_destroy_decompress(&d);
        free(row);
    } else { /* coef dump */
        struct jpeg_decompress_struct d; struct jpeg_error_mgr e;
        d.err = jpeg_std_error(&e);
        jpeg_create_decompress(&d);
        FILE* fi = fopen(argv[2], "rb");
        jpeg_stdio_src(&d, fi);
        jpeg_read_header(&d, TRUE);
        jvirt_barray_ptr* coefs = jpeg_read_coefficients(&d);
        FILE* fo = fopen(argv[3], "wb");
        jpeg_component_info* comp = d.comp_info;
        int bw = comp->width_in_blocks, bh = comp->height_in_blocks;
        fwrite(&bw, 4, 1, fo); fwrite(&bh, 4, 1, fo);
        for (int by = 0; by < bh; by++) {
            JBLOCKARRAY rows = (*d.mem->access_virt_barray)
                ((j_common_ptr)&d, coefs[0], by, 1, FALSE);
            fwrite(rows[0], sizeof(JBLOCK), bw, fo);
        }
        fclose(fo); fclose(fi);
        jpeg_destroy_decompress(&d);
    }
    return 0;
}
'''


@pytest.fixture(scope="module")
def tool(tmp_path_factory):
    if shutil.which("cc") is None:
        pytest.skip("no C compiler")
    root = tmp_path_factory.mktemp("jarith")
    src = root / "tool.c"
    src.write_text(TOOL_SRC)
    exe = str(root / "tool")
    r = subprocess.run(["cc", "-O2", "-o", exe, str(src), "-ljpeg"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip("system libjpeg not linkable")
    return exe


def _byte_tif():
    t = read_tiff(open(
        "/root/reference/autotest/gcore/data/byte.tif", "rb").read())
    return np.asarray(t.bands[0], np.uint8)


def _entropy(path):
    d = open(path, "rb").read()
    i = d.find(b"\xff\xda")
    L = int.from_bytes(d[i + 2:i + 4], "big")
    return d[i + 2 + L:-2]


def test_published_checksum_4743(tool, tmp_path):
    # autotest/gdrivers/jpeg.py test_jpeg_24: byte.tif, ARITHMETIC=YES,
    # quality 75 → band checksum 4743
    arr = _byte_tif()
    raw = tmp_path / "in.raw"
    raw.write_bytes(arr.tobytes())
    jpg = str(tmp_path / "a.jpg")
    subprocess.run([tool, "enc", "20", "20", "75", str(raw), jpg],
                   check=True)
    out = decode_jpeg(open(jpg, "rb").read())
    assert checksum(out) == 4743


def test_decode_matches_system_libjpeg(tool, tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    raw = tmp_path / "r.raw"
    raw.write_bytes(arr.tobytes())
    jpg = str(tmp_path / "r.jpg")
    subprocess.run([tool, "enc", "64", "64", "75", str(raw), jpg],
                   check=True)
    ours = decode_jpeg(open(jpg, "rb").read())
    outraw = str(tmp_path / "r.out")
    r = subprocess.run([tool, "dec", jpg, outraw],
                       capture_output=True, check=True)
    w, h, _c = map(int, r.stderr.split())
    theirs = np.frombuffer(open(outraw, "rb").read(),
                           np.uint8).reshape(h, w)
    assert np.array_equal(ours, theirs)


def test_encoder_byte_exact_vs_system_libjpeg(tool, tmp_path):
    # entropy-code libjpeg's own quantized coefficients with our
    # models/coder: streams must match byte for byte (exercises the
    # 0xFF zero-stuffing and carry paths on the noise image)
    rng = np.random.default_rng(1)
    for name, arr in (("b", _byte_tif()),
                      ("r", rng.integers(0, 256, (64, 64),
                                         dtype=np.uint8))):
        raw = tmp_path / f"{name}.raw"
        raw.write_bytes(arr.tobytes())
        jpg = str(tmp_path / f"{name}.jpg")
        subprocess.run([tool, "enc", str(arr.shape[1]),
                        str(arr.shape[0]), "75", str(raw), jpg],
                       check=True)
        cf = str(tmp_path / f"{name}.coef")
        subprocess.run([tool, "coef", jpg, cf], check=True)
        rawc = open(cf, "rb").read()
        blocks = np.frombuffer(rawc[8:], np.int16).reshape(-1, 64)
        enc = JA.ArithEncoder()
        cs = JA._CompState()
        fixed = bytearray([JA.FIXED_BIN])
        for b in blocks:
            zz = b[ZIGZAG]
            JA.dc_encode(enc, cs, int(zz[0]) - cs.last_dc, 0, 1)
            cs.last_dc = int(zz[0])
            JA.ac_encode(enc, cs, zz, 5, fixed)
        assert bytes(enc.flush()) == _entropy(jpg), name


def test_system_libjpeg_decodes_our_files(tool, tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (45, 37), dtype=np.uint8)
    ours = encode_jpeg_arith(arr, quality=75)
    jpg = tmp_path / "ours.jpg"
    jpg.write_bytes(ours)
    outraw = str(tmp_path / "ours.raw")
    r = subprocess.run([tool, "dec", str(jpg), outraw],
                       capture_output=True, check=True)
    w, h, _c = map(int, r.stderr.split())
    theirs = np.frombuffer(open(outraw, "rb").read(),
                           np.uint8).reshape(h, w)
    assert np.array_equal(theirs, decode_jpeg(ours))


def test_entropy_swap_identity():
    # arithmetic vs Huffman over the same DCT pipeline: identical pixels
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (45, 37), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_arith(g, 75)),
                          decode_jpeg(encode_jpeg(g, 75)))
    c = rng.integers(0, 256, (33, 50, 3), dtype=np.uint8)
    for sub in ("420", "444"):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_arith(c, 85, subsample=sub)),
            decode_jpeg(encode_jpeg(c, 85, subsample=sub)))


def test_coder_roundtrip_fuzz():
    rng = np.random.default_rng(9)
    for _ in range(60):
        n = int(rng.integers(1, 600))
        ctxs = rng.integers(0, 60, n)
        ds = rng.integers(0, 2, n)
        enc = JA.ArithEncoder()
        st = bytearray(64)
        for c, d in zip(ctxs, ds):
            enc.encode(st, int(c), int(d))
        blob = bytes(enc.flush())
        dec = JA.ArithDecoder(blob)
        st2 = bytearray(64)
        assert all(dec.decode(st2, int(c)) == d
                   for c, d in zip(ctxs, ds))


def test_state_table_matches_system_library():
    # ARITH_TAB is T.81 Table D.3; the system libjpeg exports the same
    # table as jpeg_aritab — cross-check when the symbol is loadable
    import ctypes
    try:
        lib = ctypes.CDLL("libjpeg.so.62")
        tab = (ctypes.c_uint32 * 256).in_dll(lib, "jpeg_aritab")
    except OSError:
        pytest.skip("system libjpeg not loadable")
    for i in range(113):
        v = tab[2 * i]
        qe, nmps, nlps, sw = JA.ARITH_TAB[i]
        assert v >> 16 == qe
        assert (v >> 8) & 0xFF == nmps
        assert v & 0x7F == nlps
        assert (v >> 7) & 1 == sw
