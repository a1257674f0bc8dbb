"""WebP lossless (VP8L) codec tests.

Round-trips pin the encoder+decoder pair; the published anchor is the
reference's ``autotest/gdrivers/webp.py`` test_webp_5 LOSSLESS
expectation (stefan_full_rgba band1 checksum 12603, band4 10807 — a
lossless cycle must preserve them exactly).  The crafted-stream tests
exercise decoder paths the engine encoder never emits (predictor /
color-transform / palette transforms, color cache, LZ77, meta prefix)
by building the streams with a test-local FORWARD implementation."""

import numpy as np
import pytest

import raydal.io.webp as W
from raydal.io.webp import decode_vp8l, decode_webp, encode_webp


def _roundtrip(img):
    out = decode_webp(encode_webp(img))
    if img.ndim == 2:
        assert np.array_equal(out[:, :, 0], img)
        assert np.array_equal(out[:, :, 1], img)
    elif img.shape[2] == 3:
        assert np.array_equal(out[:, :, :3], img)
        assert (out[:, :, 3] == 255).all()
    else:
        assert np.array_equal(out, img)
    return out


class TestRoundTrip:
    def test_random_rgba(self):
        rng = np.random.default_rng(7)
        _roundtrip(rng.integers(0, 256, (37, 53, 4), dtype=np.uint8))

    def test_gradient_rgb_compresses(self):
        yy, xx = np.mgrid[0:64, 0:64]
        img = np.stack([(xx * 4) % 256, (yy * 4) % 256,
                        ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)
        buf = encode_webp(img)
        assert len(buf) < img.nbytes
        _roundtrip(img)

    def test_constant_and_tiny(self):
        _roundtrip(np.full((16, 16, 3), 77, dtype=np.uint8))
        _roundtrip(np.array([[[1, 2, 3, 4]]], dtype=np.uint8))
        _roundtrip(np.arange(256, dtype=np.uint8).reshape(16, 16))

    def test_odd_sizes(self):
        rng = np.random.default_rng(3)
        for h, w in [(1, 7), (7, 1), (3, 257), (33, 31)]:
            _roundtrip(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))

    def test_published_stefan_checksums(self):
        """webp.py test_webp_5: LOSSLESS=YES on stefan_full_rgba keeps
        band checksums 12603 (band 1) / 10807 (band 4)."""
        from raydal.io.tiff import read_tiff
        from raydal.kernels.checksum import checksum

        img = read_tiff(open(
            "/root/reference/autotest/gcore/data/stefan_full_rgba.tif",
            "rb").read())
        a = np.stack(img.bands, axis=-1).astype(np.uint8)
        assert checksum(a[:, :, 0]) == 12603      # source sanity
        assert checksum(a[:, :, 3]) == 10807
        rt = decode_webp(encode_webp(a))
        assert np.array_equal(rt, a)
        assert checksum(rt[:, :, 0]) == 12603
        assert checksum(rt[:, :, 3]) == 10807

    def test_lossy_is_swap_point(self):
        with pytest.raises(NotImplementedError):
            encode_webp(np.zeros((4, 4, 3), np.uint8), lossless=False)


# ---------------------------------------------------------------------------
# crafted streams: decoder-only features


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)
    bw.write(0, 3)


def _forward_predictor(orig, modes, bits):
    """Test-local forward predictor transform: residual = (pixel −
    prediction-from-ORIGINAL-neighbours) & 0xFF, same edge rules as the
    decoder inverse."""
    h, w = orig.shape
    a, r, g, b = W._argb_channels(orig)
    px = np.stack([a, r, g, b], axis=-1).astype(np.int64)
    res = np.zeros_like(px)
    black = np.array([0xFF, 0, 0, 0], dtype=np.int64)

    def avg2(p, q):
        return (p + q) // 2

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L, T = px[y, x - 1], px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pred = L if int(np.abs(p - L).sum()) <= \
                        int(np.abs(p - T).sum()) else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    avg = avg2(L, T)
                    pred = np.clip(
                        avg + np.trunc((avg - TL) / 2.0).astype(np.int64),
                        0, 255)
            res[y, x] = (px[y, x] - pred) & 0xFF
    return W._pack(res[:, :, 0], res[:, :, 1], res[:, :, 2],
                   res[:, :, 3])


def test_predictor_transform_all_modes():
    rng = np.random.default_rng(11)
    h, w = 12, 17
    bits = 2                     # 4-px blocks
    bw_blocks = (w + 3) >> 2
    bh_blocks = (h + 3) >> 2
    modes = rng.integers(0, 14, (bh_blocks, bw_blocks))
    orig = W._pack(*(rng.integers(0, 256, (h, w)) for _ in range(4)))
    res = _forward_predictor(orig, modes, bits)

    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)               # transform present
    bw.write(0, 2)               # predictor
    bw.write(bits - 2, 3)
    W._encode_spatial(bw, (modes << 8).astype(np.int64),
                      meta_allowed=False)
    bw.write(0, 1)               # no more transforms
    W._encode_spatial(bw, res)
    out = decode_vp8l(bw.finish())
    a, r, g, b = W._argb_channels(orig)
    want = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_color_transform():
    rng = np.random.default_rng(5)
    h, w = 9, 13
    bits = 3                     # 8-px blocks
    bwb, bhb = (w + 7) >> 3, (h + 7) >> 3
    g2r = rng.integers(0, 256, (bhb, bwb))
    g2b = rng.integers(0, 256, (bhb, bwb))
    r2b = rng.integers(0, 256, (bhb, bwb))
    cte_img = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
    orig = W._pack(*(rng.integers(0, 256, (h, w)) for _ in range(4)))
    # forward: subtract the deltas in the spec's forward order
    a, r, g, b = (c.astype(np.int64) for c in W._argb_channels(orig))
    yy, xx = np.mgrid[0:h, 0:w]
    e_g2r = g2r[yy >> bits, xx >> bits]
    e_g2b = g2b[yy >> bits, xx >> bits]
    e_r2b = r2b[yy >> bits, xx >> bits]
    new_b = (b - W._ct_delta(e_g2b, g) - W._ct_delta(e_r2b, r)) & 0xFF
    new_r = (r - W._ct_delta(e_g2r, g)) & 0xFF
    res = W._pack(a, new_r, g, new_b)

    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)               # color transform
    bw.write(bits - 2, 3)
    W._encode_spatial(bw, cte_img.astype(np.int64), meta_allowed=False)
    bw.write(0, 1)
    W._encode_spatial(bw, res)
    out = decode_vp8l(bw.finish())
    want = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_color_indexing_packed():
    """4-colour palette → 2-bit packed indices (4 pixels per green
    byte)."""
    rng = np.random.default_rng(9)
    h, w = 6, 11
    palette = np.array([0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0],
                       dtype=np.int64)
    idx = rng.integers(0, 4, (h, w))
    per = 4                      # pixels per packed byte (2 bits each)
    packed_w = (w + per - 1) // per
    packed = np.zeros((h, packed_w), dtype=np.int64)
    for k in range(per):
        cols = idx[:, k::per]
        packed[:, :cols.shape[1]] |= cols << (k * 2)
    # palette subimage is delta-coded
    deltas = np.zeros(4, dtype=np.int64)
    prev = 0
    for i, c in enumerate(palette):
        a0, r0, g0, b0 = W._argb_channels(np.int64(prev))
        a1, r1, g1, b1 = W._argb_channels(np.int64(c))
        deltas[i] = W._pack(a1 - a0, r1 - r0, g1 - g0, b1 - b0)
        prev = int(c)

    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)               # color indexing
    bw.write(3, 8)               # 4 colours - 1
    W._encode_spatial(bw, deltas.reshape(1, 4), meta_allowed=False)
    bw.write(0, 1)
    W._encode_spatial(bw, (packed << 8))
    out = decode_vp8l(bw.finish())
    want_argb = palette[idx]
    a, r, g, b = W._argb_channels(want_argb)
    want = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def _write_sym(bw, codes, sym):
    code, ln = codes[sym]
    bw.write(W._revbits(code, ln), ln)


def test_lz77_and_color_cache():
    """Stream with literals + an LZ77 back-reference (plane code > 120)
    + a color-cache hit: pixels A B [A B A] A(cache) on a 6x1 image."""
    w, h = 6, 1
    cache_bits = 4
    argb_a = 0xFF112233
    idx_a = ((W._CACHE_MUL * argb_a) & 0xFFFFFFFF) >> (32 - cache_bits)
    green_alpha = 256 + 24 + (1 << cache_bits)
    lit_a_g, lit_b_g = 0x22, 0x55
    len_code = 256 + 2            # PrefixDecode(2) = 3 → copy length 3
    cache_sym = 280 + idx_a
    glens = [0] * green_alpha
    for s in (lit_a_g, lit_b_g, len_code, cache_sym):
        glens[s] = 2
    rlens = [0] * 256
    rlens[0x11] = 1
    rlens[0x44] = 1
    blens = [0] * 256
    blens[0x33] = 1
    blens[0x66] = 1
    alens = [0] * 256
    alens[0xFF] = 1               # single symbol → 0 bits
    dlens = [0] * 40
    # plain distance 2 needs plane code 122: prefix code 13 → extra =
    # (13-2)>>1 = 5, offset = (2+1)<<5 = 96, value = 96 + rb(5) + 1
    # → rb(5) = 25
    dlens[13] = 1                 # single-symbol → 0 code bits

    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)                # no transforms
    bw.write(1, 1)                # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)                # no meta
    for lengths in (glens, rlens, blens, alens, dlens):
        W._write_prefix_code(bw, lengths)
    gcodes = W._canonical_codes(glens)
    rcodes = W._canonical_codes(rlens)
    bcodes = W._canonical_codes(blens)
    _write_sym(bw, gcodes, lit_a_g)       # literal A = ff112233
    _write_sym(bw, rcodes, 0x11)
    _write_sym(bw, bcodes, 0x33)
    _write_sym(bw, gcodes, lit_b_g)       # literal B = ff445566
    _write_sym(bw, rcodes, 0x44)
    _write_sym(bw, bcodes, 0x66)
    _write_sym(bw, gcodes, len_code)      # copy 3 @ dist 2
    bw.write(25, 5)                       # distance extra bits
    _write_sym(bw, gcodes, cache_sym)     # cache hit of A
    out = decode_vp8l(bw.finish())
    assert out.shape == (1, 6, 4)
    A = [0x11, 0x22, 0x33, 0xFF]
    B = [0x44, 0x55, 0x66, 0xFF]
    np.testing.assert_array_equal(out[0], [A, B, A, B, A, A])


def test_meta_prefix_groups():
    """Two meta groups with DIFFERENT literal codes: block 0 decodes
    through group 0, block 1 through group 1."""
    w, h = 8, 4
    meta_bits = 2                 # 4-px blocks → 2x1 blocks
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)                # no transforms
    bw.write(0, 1)                # no color cache
    bw.write(1, 1)                # meta prefix present
    bw.write(meta_bits - 2, 3)
    # entropy image 2 wide, 1 high: groups 0 and 1 (value in red<<8|green
    # → green channel for small ids)
    meta_img = np.array([[0 << 8, 1 << 8]], dtype=np.int64)
    W._encode_spatial(bw, meta_img, meta_allowed=False)
    # group 0: constant pixel (10, 20, 30); group 1: constant (1, 2, 3)
    for g_g, g_r, g_b in ((20, 10, 30), (2, 1, 3)):
        glens = [0] * (256 + 24)
        glens[g_g] = 1
        rlens = [0] * 256
        rlens[g_r] = 1
        blens = [0] * 256
        blens[g_b] = 1
        alens = [0] * 256
        alens[0xFF] = 1
        dlens = [0] * 40
        dlens[0] = 1
        for lengths in (glens, rlens, blens, alens, dlens):
            W._write_prefix_code(bw, lengths)
    # all codes are single-symbol → zero data bits for 32 pixels
    out = decode_vp8l(bw.finish())
    assert out.shape == (4, 8, 4)
    np.testing.assert_array_equal(out[0, 0], [10, 20, 30, 255])
    np.testing.assert_array_equal(out[0, 4], [1, 2, 3, 255])
    np.testing.assert_array_equal(out[3, 7], [1, 2, 3, 255])
    np.testing.assert_array_equal(out[3, 3], [10, 20, 30, 255])


def test_webp_tile_sink(ray_session):
    """encode_tiles_batch fmt='webp': tiles round-trip losslessly
    through the codec dispatch (the gdal-raster-tile webp output)."""
    import pyarrow as pa

    from raydal.io.codecs import decode
    from raydal.ops.tile import TILE, encode_tiles_batch

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
    t = pa.Table.from_pydict({
        "z": pa.array([3], pa.int64()),
        "x": pa.array([1], pa.int64()),
        "y": pa.array([2], pa.int64()),
        "tile_rgb": pa.array([rgb.tobytes()], pa.binary())})
    out = encode_tiles_batch(t, fmt="webp")
    assert "webp" in out.schema.names
    blob = out["webp"][0].as_py()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    back = decode(blob)
    np.testing.assert_array_equal(back[:, :, :3], rgb)
    # default stays PNG for compatibility
    out_png = encode_tiles_batch(t)
    assert "png" in out_png.schema.names
