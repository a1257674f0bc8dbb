"""Compressed-WAV decode paths: G.711 mu-law / A-law and IMA ADPCM.

Independent oracle: the stdlib ``audioop`` module (CPython's own
G.711 + Intel/DVI ADPCM implementation, deprecated but present on
3.11) — our LUTs and the nibble-expansion core must match it
bit-exactly over every code / random nibble streams.
"""

import struct
import warnings

import numpy as np
import pytest

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import audioop

from raydal.io.wav import (_ALAW_LUT, _IMA_INDEX, _IMA_STEP, _MULAW_LUT,
                           _ima_core, decode_wav)


def _wav(tag, ch, rate, bits, block, payload):
    hdr = (b"WAVEfmt " + struct.pack("<IHHIIHH", 16, tag, ch, rate,
                                     rate * max(block, 1), block, bits)
           + b"data" + struct.pack("<I", len(payload)))
    pad = len(payload) & 1
    return (b"RIFF" + struct.pack("<I", len(hdr) + len(payload) + pad)
            + hdr + payload + b"\x00" * pad)


def test_g711_luts_match_audioop_all_codes():
    codes = bytes(range(256))
    assert np.array_equal(
        _MULAW_LUT, np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2"))
    assert np.array_equal(
        _ALAW_LUT, np.frombuffer(audioop.alaw2lin(codes, 2), "<i2"))


@pytest.mark.parametrize("tag,fn", [(0x0007, audioop.ulaw2lin),
                                    (0x0006, audioop.alaw2lin)])
def test_g711_container_decode(tag, fn):
    rng = np.random.default_rng(tag)
    payload = bytes(rng.integers(0, 256, 1001, dtype=np.uint8))
    s, rate = decode_wav(_wav(tag, 1, 8000, 8, 1, payload))
    assert rate == 8000 and len(s) == 1001
    want = np.frombuffer(fn(payload, 2), "<i2") / 32768.0
    assert np.array_equal(s, want)


def test_g711_stereo_interleave():
    payload = bytes([0x00, 0x80] * 10)           # mu-law min/max pairs
    s, _ = decode_wav(_wav(0x0007, 2, 8000, 8, 2, payload))
    assert s.shape == (10, 2)
    assert (s[:, 0] == -32124 / 32768.0).all()
    assert (s[:, 1] == 32124 / 32768.0).all()


def test_ima_core_matches_audioop():
    rng = np.random.default_rng(1)
    for trial in range(5):
        nibs = rng.integers(0, 16, 256).astype(np.uint8)
        pred = int(rng.integers(-30000, 30000))
        idx = int(rng.integers(0, 89))
        packed = bytes((int(nibs[i]) << 4) | int(nibs[i + 1])
                       for i in range(0, len(nibs), 2))
        want, _ = audioop.adpcm2lin(packed, 2, (pred, idx))
        got = _ima_core(nibs, pred, idx).astype(np.int16)
        assert np.array_equal(got, np.frombuffer(want, "<i2"))


def _ima_encode_channel(x, idx=0):
    """Test-local IMA encoder (standard quantization, lock-step with
    the decoder's own update) → (first_sample, index, nibbles)."""
    pred = int(x[0])
    first, start_idx = pred, idx
    nibbles = []
    for v in x[1:]:
        step = int(_IMA_STEP[idx])
        delta = int(v) - pred
        n = 0
        if delta < 0:
            n = 8
            delta = -delta
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        nibbles.append(n)
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX[n & 7])))
    return first, start_idx, nibbles


def _pack_ima_blocks(chans_samples, nwords):
    """chans_samples: list of per-channel int arrays, equal length
    1 + 8*nwords*nblocks → WAV blocks (4-byte headers + interleaved
    4-byte words, low nibble first)."""
    ch = len(chans_samples)
    n = len(chans_samples[0])
    spb = 1 + 8 * nwords
    out = bytearray()
    idxs = [0] * ch
    for boff in range(0, n, spb):
        headers = bytearray()
        streams = []
        for c in range(ch):
            seg = chans_samples[c][boff:boff + spb]
            first, sidx, nibs = _ima_encode_channel(seg, idxs[c])
            # carry the adapted index into the next block like real
            # encoders do: recompute by running the update
            idxs[c] = sidx
            for nb in nibs:
                idxs[c] = max(0, min(88, idxs[c]
                                     + int(_IMA_INDEX[nb & 7])))
            headers += struct.pack("<hBB", first, sidx, 0)
            nibs += [0] * (8 * nwords - len(nibs))
            streams.append(nibs)
        out += headers
        for w in range(nwords):
            for c in range(ch):
                for b in range(4):
                    lo = streams[c][w * 8 + 2 * b]
                    hi = streams[c][w * 8 + 2 * b + 1]
                    out.append(lo | (hi << 4))
    return bytes(out), 4 * ch + 4 * ch * nwords


def test_ima_adpcm_mono_container():
    t = np.arange(1 + 8 * 2 * 6)                 # 6 blocks of 2 words
    x = np.round(8000 * np.sin(t / 9)).astype(np.int64)
    payload, block_align = _pack_ima_blocks([x], 2)
    s, rate = decode_wav(_wav(0x0011, 1, 8000, 4, block_align, payload))
    assert rate == 8000
    got = np.round(s * 32768).astype(np.int64)
    # spot-exact: block-leading samples are stored verbatim
    spb = 1 + 8 * 2
    assert np.array_equal(got[::spb], x[: len(got): spb][: len(got[::spb])])
    # lossy tracking: small error once the step size has adapted past
    # the initial slope-overload transient (index starts at 0)
    n = min(len(got), len(x))
    err = np.abs(got[:n] - x[:n])
    assert err[32:].max() < 600 and err[32:].mean() < 120


def test_ima_adpcm_stereo_container():
    t = np.arange(1 + 8 * 3 * 4)                 # 4 blocks of 3 words
    left = np.round(6000 * np.sin(t / 7)).astype(np.int64)
    right = np.round(5000 * np.cos(t / 11)).astype(np.int64)
    payload, block_align = _pack_ima_blocks([left, right], 3)
    s, rate = decode_wav(_wav(0x0011, 2, 16000, 4, block_align, payload))
    assert s.shape[1] == 2
    got = np.round(s * 32768).astype(np.int64)
    n = min(len(got), len(left))
    assert np.abs(got[32:n, 0] - left[32:n]).mean() < 120
    assert np.abs(got[32:n, 1] - right[32:n]).mean() < 120


def test_ima_adpcm_matches_audioop_per_block():
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.integers(-300, 301, 1 + 8 * 4)).clip(-32000, 32000)
    payload, block_align = _pack_ima_blocks([x], 4)
    s, _ = decode_wav(_wav(0x0011, 1, 8000, 4, block_align, payload))
    got = np.round(s * 32768).astype(np.int16)
    # reconstruct the expectation with audioop from the block header
    pred, idx = struct.unpack_from("<hB", payload, 0)[:2]
    body = np.frombuffer(payload[4:], np.uint8)
    nibs = np.empty(2 * len(body), np.uint8)
    nibs[0::2] = body & 0x0F
    nibs[1::2] = body >> 4
    packed = bytes((int(nibs[i]) << 4) | int(nibs[i + 1])
                   for i in range(0, len(nibs), 2))
    want, _ = audioop.adpcm2lin(packed, 2, (pred, idx))
    want = np.concatenate([[pred], np.frombuffer(want, "<i2")])
    assert np.array_equal(got, want.astype(np.int16))


def test_decode_audio_g711_boundary():
    from raydal.ops.multimodal import decode_audio
    payload = bytes(range(256))
    s, rate = decode_audio(_wav(0x0007, 1, 8000, 8, 1, payload))
    want = np.frombuffer(audioop.ulaw2lin(payload, 2), "<i2") / 32768.0
    assert rate == 8000 and np.array_equal(s, want)


# ---------------------------------------------------------------- MS ADPCM


def _ms_block(ch, bpred, deltas, s1s, s2s, nibbles):
    """Hand-assemble one MS ADPCM block (header + packed nibbles)."""
    head = bytes(bpred) + struct.pack(
        "<%dh" % (3 * ch), *deltas, *s1s, *s2s)
    nibs = list(nibbles)
    if len(nibs) & 1:
        nibs.append(0)
    body = bytes((nibs[i] << 4) | nibs[i + 1]
                 for i in range(0, len(nibs), 2))
    return head + body


def test_ms_adpcm_hand_computed_vector():
    """Spec arithmetic worked by hand (WAVE_FORMAT_ADPCM algorithm):

    predictor 1 → coef (512, -256); idelta=32, samp1=100, samp2=50.
    nibble 0x03 (+3):
      pred  = trunc((100*512 + 50*-256)/256) = trunc(38400/256) = 150
      new   = 150 + 3*32 = 246
      delta = trunc(32*230/256) = 28 (>=16)
    nibble 0x0C (-4), with delta now 28:
      pred  = trunc((246*512 + 100*-256)/256) = trunc(100352/256) = 392
      new   = 392 - 4*28 = 280
    """
    block = _ms_block(1, [1], [32], [100], [50], [0x3, 0xC])
    buf = _wav(0x0002, 1, 8000, 4, len(block), block)
    s, rate = decode_wav(buf)
    got = np.round(s * 32768.0).astype(int)
    assert rate == 8000
    assert got[0] == 50 and got[1] == 100          # header passthrough
    assert got[2] == 246                           # +3 step
    # second nibble: delta adapted to trunc(32*230/256)=28
    assert got[3] == 392 - 4 * 28                  # == 280


def test_ms_adpcm_negative_truncation_matches_c():
    """C `/256` truncates toward zero: samp1=-100, samp2=-50,
    coef (512,-256) → (-100*512 + -50*-256) = -38400 → -150 exactly;
    with samp1=-99 → -37888-... use coef0 (256,0): -99*256/256 = -99
    and -99*256 = -25344, trunc/256 = -99; nibble +1, delta 16 →
    -99+16 = -83."""
    block = _ms_block(1, [0], [16], [-99], [-50], [0x1, 0x0])
    buf = _wav(0x0002, 1, 8000, 4, len(block), block)
    s, _ = decode_wav(buf)
    got = np.round(s * 32768.0).astype(int)
    assert got[0] == -50 and got[1] == -99
    assert got[2] == -99 + 16
    # nibble 0: pred = trunc((-83*256 + -99*0)/256) = -83; delta
    # adapted to max(16, trunc(16*230/256)=14) = 16 → -83 + 0
    assert got[3] == -83


def test_ms_adpcm_roundtrip_mono_stereo():
    from raydal.io.wav import encode_ms_adpcm

    t = np.arange(3000) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) \
        + 0.1 * np.sin(2 * np.pi * 997 * t)
    for ch in (1, 2):
        s = sig if ch == 1 else np.stack([sig, np.roll(sig, 5)], 1)
        dec, rate = decode_wav(encode_ms_adpcm(s, 16000,
                                               samples_per_block=500))
        d = np.atleast_2d(dec.T).T
        src = np.atleast_2d(s.T).T
        n = min(len(d), len(src))
        q = np.clip(np.round(src[:n] * 32768), -32768, 32767)
        # first two samples of every block are stored losslessly
        for b0 in range(0, n - 1, 500):
            assert (d[b0] * 32768 == q[b0]).all()
            assert (d[b0 + 1] * 32768 == q[b0 + 1]).all()
        snr = 10 * np.log10((src[:n] ** 2).mean()
                            / ((d[:n] - src[:n]) ** 2).mean())
        assert snr > 30.0, snr


def test_ms_adpcm_custom_coef_table_from_fmt():
    """A non-standard fmt-chunk coefficient table must be honoured:
    a single pair (256, 0) re-indexes predictor 0 of a 1-entry table."""
    from raydal.io.wav import encode_ms_adpcm

    sig = np.linspace(-0.3, 0.3, 600)
    buf = bytearray(encode_ms_adpcm(sig, 8000, samples_per_block=300))
    base = decode_wav(bytes(buf))[0]
    # corrupt coef pair 1 (offset: riff12 + 'WAVEfmt '8? locate fmt ext)
    i = bytes(buf).index(b"fmt ") + 8 + 16 + 6 + 4   # into pair 1 low
    buf[i:i + 2] = struct.pack("<h", 999)
    got = decode_wav(bytes(buf))[0]
    # blocks whose chosen predictor wasn't 1 are unchanged; the decode
    # must differ iff some block used predictor 1 — at minimum the
    # parse must not fall back to the builtin table silently when the
    # stream's table differs
    assert len(got) == len(base)
