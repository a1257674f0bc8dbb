"""Ogg container framing + FLAC-in-Ogg mapping (raydal.io.ogg)."""
import numpy as np
import pytest

from raydal.io.flac import encode_flac, decode_flac
from raydal.io.ogg import (crc32_ogg, decode_ogg_flac, encode_ogg_flac,
                           ogg_packets, ogg_pages)
from raydal.ops.multimodal import decode_audio


def _sig(n, seed=7, lim=30000):
    rng = np.random.default_rng(seed)
    return rng.integers(-lim, lim, size=n, dtype=np.int64)


def test_crc32_vector():
    # CRC-32/MPEG-2 family without init/xorout: "123456789" under
    # poly 0x04C11DB7 unreflected, init 0, no final xor → 0x89A1897F
    assert crc32_ogg(b"123456789") == 0x89A1897F
    assert crc32_ogg(b"") == 0


def test_page_structure_bos_eos():
    x = _sig(5000)
    buf = encode_ogg_flac(x, rate=16000, bps=16, block_size=2048)
    pages = ogg_pages(buf)
    assert pages[0]["flags"] & 0x02           # BOS first
    assert pages[-1]["flags"] & 0x04          # EOS last
    assert all(not (p["flags"] & 0x02) for p in pages[1:])
    assert [p["seq"] for p in pages] == list(range(len(pages)))
    # granule of the last page = total samples
    assert pages[-1]["granule"] == 5000
    # header pages carry granule 0
    assert pages[0]["granule"] == 0 and pages[1]["granule"] == 0


def test_packet_mapping():
    x = _sig(5000)
    buf = encode_ogg_flac(x, block_size=2048)
    pkts, serial = ogg_packets(buf)
    # ident + vorbis-comment + 3 audio frames (2048+2048+904)
    assert len(pkts) == 5
    assert pkts[0][0] == 0x7F and pkts[0][1:5] == b"FLAC"
    assert pkts[0][9:13] == b"fLaC"
    assert pkts[1][0] == 0x84                 # last-flag VORBIS_COMMENT
    for p in pkts[2:]:
        assert p[0] == 0xFF                   # FLAC frame sync


@pytest.mark.parametrize("shape,bps", [((4000,), 16), ((4000, 2), 16),
                                       ((1000,), 8), ((3000, 2), 24)])
def test_roundtrip(shape, bps):
    rng = np.random.default_rng(11)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, size=shape, dtype=np.int64)
    out, rate, obps = decode_ogg_flac(
        encode_ogg_flac(x, rate=22050, bps=bps, block_size=1024))
    assert rate == 22050 and obps == bps
    ref = x if x.ndim > 1 else x
    assert out.shape == ref.shape
    assert (out.astype(np.int64) == ref).all()


def test_matches_native_flac():
    x = np.stack([_sig(4096, 3), _sig(4096, 4)], 1)
    ogg = decode_ogg_flac(encode_ogg_flac(x, bps=16, block_size=512))
    nat = decode_flac(encode_flac(x, bps=16, block_size=512))
    assert (ogg[0] == nat[0]).all() and ogg[1:] == nat[1:]


def test_continuation_pages():
    # 32-bit noise at block_size 8192 stereo → frames > 65025 bytes,
    # forcing >255 lacing values and continuation pages
    rng = np.random.default_rng(5)
    x = rng.integers(-2**31, 2**31, size=(9000, 2), dtype=np.int64)
    buf = encode_ogg_flac(x, bps=32, block_size=8192)
    pages = ogg_pages(buf)
    assert any(p["flags"] & 0x01 for p in pages)          # continued
    assert any(p["granule"] == -1 for p in pages)         # mid-packet
    out, rate, bps = decode_ogg_flac(buf)
    assert bps == 32 and (out.astype(np.int64) == x).all()


def test_crc_rejects_corruption():
    buf = bytearray(encode_ogg_flac(_sig(2000)))
    buf[len(buf) // 2] ^= 0x01
    with pytest.raises(ValueError):
        decode_ogg_flac(bytes(buf))


def test_bad_capture_pattern():
    with pytest.raises(ValueError):
        ogg_pages(b"NotO" + b"\x00" * 30)


def test_unknown_header_count_skip():
    # nhdr = 0 (unknown) → decoder skips non-0xFF packets heuristically
    buf = bytearray(encode_ogg_flac(_sig(1500)))
    # patch ident packet's ">H" header count (page 0 body offset 7)
    pages = ogg_pages(bytes(buf))
    nseg = buf[26]
    body0 = 27 + nseg
    assert buf[body0] == 0x7F
    buf[body0 + 7:body0 + 9] = b"\x00\x00"
    # fix page 0 CRC
    end0 = body0 + sum(pages[0]["lacings"])
    import struct as _s
    page0 = bytearray(buf[:end0])
    page0[22:26] = b"\x00" * 4
    buf[22:26] = _s.pack("<I", crc32_ogg(page0))
    out, rate, bps = decode_ogg_flac(bytes(buf))
    assert (out.astype(np.int64) == _sig(1500)).all()


def test_empty_stream():
    buf = encode_ogg_flac(np.empty((0,), np.int64))
    pages = ogg_pages(buf)
    assert pages[-1]["flags"] & 0x04
    out, rate, bps = decode_ogg_flac(buf)
    assert len(out) == 0


def test_decode_audio_dispatch():
    x = _sig(3000)
    s, rate = decode_audio(encode_ogg_flac(x, rate=8000, bps=16))
    assert rate == 8000
    assert np.allclose(s, x / 32768.0, atol=1e-12)
    # stereo averages to mono, same normalization as WAV path
    st = np.stack([x, x // 3], 1)
    s2, _ = decode_audio(encode_ogg_flac(st, rate=8000, bps=16))
    assert np.allclose(s2, st.mean(axis=1) / 32768.0, atol=1e-12)
