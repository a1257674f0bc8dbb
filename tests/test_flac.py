"""FLAC codec tests — round-trips, spec-anchor goldens, and the
decoder-only paths (LPC, wasted bits, Rice escape) exercised through
hand-built streams written with the module's own bit writer.

CRC anchors are the published check values of CRC-8/SMBUS and
CRC-16/UMTS over b"123456789" (0xF4 / 0xFEE8) — the exact polynomials
RFC 9639 specifies (poly 0x07 init 0; poly 0x8005 init 0).
"""

import struct

import numpy as np
import pytest

from raydal.io import flac as F
from raydal.io.flac import crc8, crc16, decode_flac, encode_flac


def test_crc_published_check_values():
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0
    assert crc16(b"") == 0


def test_container_layout():
    buf = encode_flac(np.arange(-50, 50), rate=22050, bps=16)
    assert buf[:4] == b"fLaC"
    assert buf[4] == 0x80                       # last block, STREAMINFO
    assert int.from_bytes(buf[5:8], "big") == 34
    packed = int.from_bytes(buf[18:26], "big")
    assert packed >> 44 == 22050                # sample rate
    assert ((packed >> 41) & 7) + 1 == 1        # channels
    assert ((packed >> 36) & 0x1F) + 1 == 16    # bits per sample
    assert packed & ((1 << 36) - 1) == 100      # total samples


@pytest.mark.parametrize("n,block", [(1, 4096), (4095, 4096),
                                     (4096, 4096), (4097, 4096),
                                     (10000, 1024), (192, 192)])
def test_mono_roundtrip_lengths(n, block):
    rng = np.random.default_rng(n)
    x = rng.integers(-32768, 32768, n)
    y, rate, bps = decode_flac(encode_flac(x, 16000, 16, block))
    assert rate == 16000 and bps == 16
    assert np.array_equal(x, y)


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, 3000)
    y, _, got = decode_flac(encode_flac(x, 8000, bps, 1000))
    assert got == bps and np.array_equal(x, y)


def test_stereo_roundtrip_and_compression():
    rng = np.random.default_rng(3)
    left = np.cumsum(rng.integers(-200, 201, 8192)).clip(-30000, 30000)
    right = left + rng.integers(-40, 41, 8192)
    st = np.stack([left, right], 1)
    buf = encode_flac(st, 44100, 16)
    y, rate, _ = decode_flac(buf)
    assert rate == 44100 and np.array_equal(st, y)
    # correlated stereo must actually compress (side-channel coding)
    assert len(buf) < 0.6 * st.size * 2


def test_anticorrelated_picks_independent_and_roundtrips():
    rng = np.random.default_rng(4)
    st = rng.integers(-32768, 32768, (4096, 2))   # uncorrelated noise
    y, _, _ = decode_flac(encode_flac(st, 16000, 16))
    assert np.array_equal(st, y)


def test_multichannel():
    rng = np.random.default_rng(5)
    x = rng.integers(-2000, 2000, (1500, 5))
    y, _, _ = decode_flac(encode_flac(x, 16000, 16, 512))
    assert np.array_equal(x, y)


def test_constant_and_tiny_signals():
    for sig in ([7] * 500, [0], [-1, 1], list(range(4))):
        a = np.asarray(sig)
        assert np.array_equal(a, decode_flac(encode_flac(a, 16000, 16))[0])


def test_compresses_smooth_signal():
    t = np.arange(20000)
    x = np.round(20000 * np.sin(t / 50)).astype(np.int64)
    buf = encode_flac(x, 16000, 16)
    assert len(buf) < 0.5 * 2 * len(x)


def test_corruption_detected():
    x = np.arange(-500, 500) * 13
    buf = bytearray(encode_flac(x, 16000, 16))
    buf[len(buf) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(buf))


def test_md5_verification():
    x = np.arange(100)
    buf = bytearray(encode_flac(x, 16000, 16))
    buf[26] ^= 0xFF                              # corrupt stored MD5
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(buf))
    y, _, _ = decode_flac(bytes(buf), verify_md5=False)
    assert np.array_equal(x, y)


def test_range_validation():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 16000, 16)
    with pytest.raises(ValueError):
        decode_flac(b"NOPE")


def test_coded_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 1, (1 << 36) - 1]:
        bw = F._BitWriter()
        F._write_coded_number(bw, v)
        bw.align()
        br = F._BitReader(bytes(bw.out))
        assert F._read_coded_number(br) == v, v


def _build_stream(body_fn, n, rate=16000, bps=16, nch=1):
    """Assemble a single-frame FLAC stream whose subframe bits come
    from ``body_fn`` — used to exercise decoder-only paths."""
    bw = F._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(7, 4)                               # 16-bit blocksize field
    bw.write(0, 4)                               # rate from STREAMINFO
    bw.write(nch - 1, 4)
    bw.write(F._SS_CODE[bps], 3)
    bw.write(0, 1)
    F._write_coded_number(bw, 0)
    bw.write(n - 1, 16)
    bw.write(crc8(bw.out), 8)
    expected = body_fn(bw)
    bw.align()
    bw.write(crc16(bw.out), 16)
    frame = bytes(bw.out)
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    body = (struct.pack(">HH", n, n)
            + len(frame).to_bytes(3, "big") * 2
            + packed.to_bytes(8, "big") + b"\x00" * 16)
    return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
            + body + frame), expected


def _write_rice(bw, resid, k):
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(k, 4)
    for v in resid:
        u = int(v << 1 if v >= 0 else (-v << 1) - 1)
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


def test_lpc_decode():
    n = 64
    rng = np.random.default_rng(1)
    a = np.empty(n, np.int64)
    a[0], a[1] = 100, 120
    resid = rng.integers(-20, 21, n - 2)
    shift = 1
    for i in range(2, n):
        a[i] = resid[i - 2] + ((3 * a[i - 1] - a[i - 2]) >> shift)

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)                      # LPC, order 2
        bw.write(0, 1)
        bw.write(a[0], 16)
        bw.write(a[1], 16)
        bw.write(5 - 1, 4)                       # 5-bit precision
        bw.write(shift, 5)
        bw.write(3, 5)
        bw.write(-1, 5)
        _write_rice(bw, resid, 5)
        return a

    buf, want = _build_stream(body, n)
    y, _, _ = decode_flac(buf, verify_md5=False)
    assert np.array_equal(y, want)


def test_wasted_bits_decode():
    n = 64
    vals = (np.arange(n, dtype=np.int64) % 13 - 6) * 4

    def body(bw):
        bw.write(0, 1)
        bw.write(8, 6)                           # fixed order 0
        bw.write(1, 1)                           # wasted flag
        bw.write(1, 2)                           # unary 1 → 2 wasted
        _write_rice(bw, vals >> 2, 3)
        return vals

    buf, want = _build_stream(body, n)
    y, _, _ = decode_flac(buf, verify_md5=False)
    assert np.array_equal(y, want)


def test_rice2_escape_partitions_decode():
    n = 64
    vals = np.arange(n, dtype=np.int64) - 32

    def body(bw):
        bw.write(0, 1)
        bw.write(8, 6)
        bw.write(0, 1)
        bw.write(1, 2)                           # Rice2 (5-bit params)
        bw.write(2, 4)                           # 4 partitions
        for p in range(4):
            bw.write(31, 5)                      # escape
            bw.write(7, 5)                       # 7-bit raw
            for v in vals[p * 16:(p + 1) * 16]:
                bw.write(v, 7)
        return vals

    buf, want = _build_stream(body, n)
    y, _, _ = decode_flac(buf, verify_md5=False)
    assert np.array_equal(y, want)


def test_decode_audio_boundary():
    from raydal.ops.multimodal import decode_audio
    x = (np.sin(np.arange(4000) / 30) * 20000).astype(np.int64)
    st = np.stack([x, x // 2], 1)
    s, rate = decode_audio(encode_flac(st, 22050, 16))
    assert rate == 22050 and s.ndim == 1 and len(s) == 4000
    # normalization matches the WAV integer-PCM path: / 2^(bps-1)
    want = st.mean(axis=1) / 32768.0
    assert np.allclose(s, want, atol=1e-12)
