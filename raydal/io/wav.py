"""RIFF/WAVE PCM codec — pure stdlib/numpy, public Microsoft/IBM spec.

Fills the real-audio side of the multimodal swap point
(:mod:`raydal.ops.multimodal`): ``decode_wav`` handles the formats a
training-data crawl actually contains — integer PCM at 8/16/24/32 bits
(format tag 1), IEEE float 32/64 (tag 3), ITU-T G.711 A-law / mu-law
(tags 6/7, LUTs bit-exact vs the stdlib ``audioop`` oracle), IMA/DVI
ADPCM (tag 0x11, block headers + interleaved nibble words; the
expansion core matches ``audioop.adpcm2lin`` bit-exactly), Microsoft
ADPCM (tag 0x02, per-block predictor/delta headers with the 7-pair
coefficient extension honoured from the fmt chunk; hand-computed
spec vectors in tests/test_wav_compressed.py), and
WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, sub-format resolved from the
GUID) — mono or multi-channel.  ``encode_wav`` writes canonical
44-byte-header PCM for round-trips.

Reference parity: GDAL ingests externally-decoded rasters through its
driver layer rather than shipping an audio codec; the contract this
module satisfies (bytes → (samples, rate) at a documented boundary) is
the one :class:`raydal.ops.multimodal.AudioFeatures` defines.  Golden
tests validate against Python's stdlib ``wave`` writer as an
independent public encoder (tests/test_multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "encode_ms_adpcm"]

_TAG_PCM = 0x0001
_TAG_MS_ADPCM = 0x0002
_TAG_FLOAT = 0x0003
_TAG_ALAW = 0x0006
_TAG_MULAW = 0x0007
_TAG_IMA_ADPCM = 0x0011
_TAG_EXTENSIBLE = 0xFFFE
# first 2 bytes of the KSDATAFORMAT_SUBTYPE_* GUIDs carry the tag
_SUBFORMAT_GUID_TAIL = bytes.fromhex("000000001000800000aa00389b71")


def _g711_tables():
    """ITU-T G.711 expansion tables (the classic public-domain
    ulaw2linear / alaw2linear formulas, e.g. Sun Microsystems g711.c),
    built once as 256-entry int16 LUTs."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    mulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)

    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)
    return mulaw, alaw


_MULAW_LUT, _ALAW_LUT = _g711_tables()

# IMA/DVI ADPCM quantizer tables (public IMA specification)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767], np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_core(nibs, pred, idx):
    """Serial IMA ADPCM nibble expansion (the adaptation loop is
    bit-serial by construction — same argument as the JPEG entropy
    decode)."""
    out = np.empty(len(nibs), np.int32)
    step_t = _IMA_STEP.tolist()
    ind_t = _IMA_INDEX.tolist()
    for i, n in enumerate(nibs.tolist()):
        step = step_t[idx]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = -32768 if pred < -32768 else \
            (32767 if pred > 32767 else pred)
        idx += ind_t[n & 7]
        idx = 0 if idx < 0 else (88 if idx > 88 else idx)
        out[i] = pred
    return out


def _decode_ima_adpcm(data, ch, block_align):
    """WAV IMA ADPCM (format tag 0x11): per-block 4-byte channel
    headers (int16 predictor, uint8 step index, reserved), then the
    nibble body interleaved in 4-byte words per channel, low nibble
    first."""
    if block_align < 4 * ch or block_align % 4:
        raise ValueError("invalid IMA ADPCM block alignment")
    chans = [[] for _ in range(ch)]
    for boff in range(0, len(data), block_align):
        block = data[boff:boff + block_align]
        if len(block) < 4 * ch:
            break
        body = np.frombuffer(block, np.uint8)[4 * ch:]
        nwords = len(body) // (4 * ch)
        words = body[:nwords * 4 * ch].reshape(nwords, ch, 4)
        for c in range(ch):
            pred, idx = struct.unpack_from("<hB", block, c * 4)[:2]
            idx = min(max(idx, 0), 88)
            raw = words[:, c, :].reshape(-1)
            nibs = np.empty(2 * len(raw), np.uint8)
            nibs[0::2] = raw & 0x0F
            nibs[1::2] = raw >> 4
            chans[c].append(np.int32(pred))
            chans[c].append(_ima_core(nibs, int(pred), idx))
    cols = [np.concatenate([np.atleast_1d(p) for p in parts])
            if parts else np.empty(0, np.int32) for parts in chans]
    return np.stack(cols, axis=1).astype(np.float64) / 32768.0


# Microsoft ADPCM (format tag 0x0002) — the 7 standard predictor
# coefficient pairs and the delta adaptation table from the public
# WAVE_FORMAT_ADPCM specification (Microsoft multimedia standards
# update; same constants ship in every fmt-chunk extension header)
_MS_COEF = np.array([[256, 0], [512, -256], [0, 0], [192, 64],
                     [240, 0], [460, -208], [392, -232]], np.int32)
_MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                      768, 614, 512, 409, 307, 230, 230, 230],
                     np.int64)


def _trunc_div256(a):
    """C-style `/ 256` (truncation toward zero, not floor) on exact
    float64 intermediates — |a| ≤ 32767·512·2 keeps it integral."""
    return np.trunc(a / 256.0)


def _decode_ms_adpcm(data, ch, block_align, coefs):
    """WAV Microsoft ADPCM (tag 0x0002): per-block header of
    per-channel predictor byte + int16 idelta + int16 sample1 (newer)
    + int16 sample2 (older), then signed 4-bit error nibbles
    interleaved across channels in time order, high nibble first.

    Blocks are independent, so the serial adaptation loop runs across
    all blocks×channels at once; only the per-nibble step is serial
    (same argument as the IMA core)."""
    hdr = 7 * ch
    if block_align <= hdr:
        raise ValueError("invalid MS ADPCM block alignment")
    nb = len(data) // block_align
    if nb == 0:
        return np.empty((0, ch), np.float64)
    blocks = np.frombuffer(
        data[:nb * block_align], np.uint8).reshape(nb, block_align)
    bpred = np.minimum(blocks[:, :ch].astype(np.int64),
                       len(coefs) - 1)                       # (nb, ch)
    ints = blocks[:, ch:hdr].copy().view("<i2").astype(np.int64)
    ints = ints.reshape(nb, 3, ch)
    delta = ints[:, 0, :].astype(np.float64)                 # (nb, ch)
    samp1 = ints[:, 1, :].astype(np.float64)
    samp2 = ints[:, 2, :].astype(np.float64)
    c1 = coefs[bpred, 0].astype(np.float64)
    c2 = coefs[bpred, 1].astype(np.float64)

    body = blocks[:, hdr:]
    nibs = np.empty((nb, body.shape[1] * 2), np.uint8)
    nibs[:, 0::2] = body >> 4
    nibs[:, 1::2] = body & 0x0F
    steps = nibs.shape[1] // ch
    nibs = nibs[:, :steps * ch].reshape(nb, steps, ch)

    out = np.empty((nb, steps + 2, ch), np.float64)
    out[:, 0, :] = samp2
    out[:, 1, :] = samp1
    adapt = _MS_ADAPT.astype(np.float64)
    for t in range(steps):
        n = nibs[:, t, :].astype(np.int64)
        signed = np.where(n >= 8, n - 16, n).astype(np.float64)
        pred = _trunc_div256(samp1 * c1 + samp2 * c2) + signed * delta
        pred = np.clip(pred, -32768.0, 32767.0)
        samp2 = samp1
        samp1 = pred
        delta = np.maximum(_trunc_div256(delta * adapt[n]), 16.0)
        out[:, t + 2, :] = pred
    return out.reshape(nb * (steps + 2), ch) / 32768.0


def encode_ms_adpcm(samples, rate=16000, samples_per_block=500):
    """samples (float in [-1, 1] or int16, (n,) or (n, ch)) →
    Microsoft ADPCM WAV bytes (tag 0x0002) with the standard 7-pair
    coefficient extension.  Per block and channel the best of the 7
    predictors is chosen by first-pass residual magnitude; the stored
    sample1/sample2 header words keep the first two samples of every
    block lossless (the property the q98 oracle pins)."""
    s = np.asarray(samples)
    if s.dtype.kind == "f":
        s = np.clip(np.round(s * 32768.0), -32768, 32767)
    s = s.astype(np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    spb = max(int(samples_per_block), 4)
    pad = (-n) % spb
    if pad:
        s = np.vstack([s, np.repeat(s[-1:], pad, axis=0)])
        n = len(s)
    block_align = 7 * ch + ((spb - 2) * ch + 1) // 2

    blocks = []
    for b0 in range(0, n, spb):
        blk = s[b0:b0 + spb]
        heads = bytearray()
        deltas = []
        s1s = []
        s2s = []
        preds = []
        for c in range(ch):
            x = blk[:, c].astype(np.float64)
            # predictor choice: least |residual| sum over the block
            errs = [np.abs(x[2:] - _trunc_div256(
                x[1:-1] * _MS_COEF[p, 0] + x[:-2] * _MS_COEF[p, 1])
            ).sum() for p in range(7)]
            p = int(np.argmin(errs))
            d = max(16, int(np.abs(np.diff(x)).mean() / 4) or 16)
            preds.append(p)
            deltas.append(float(d))
            s2s.append(float(blk[0, c]))
            s1s.append(float(blk[1, c]))
            heads.append(p)
        head = bytes(heads) + struct.pack(
            "<%dh" % (3 * ch),
            *[int(v) for v in deltas],
            *[int(v) for v in s1s], *[int(v) for v in s2s])
        samp1 = np.array(s1s)
        samp2 = np.array(s2s)
        delta = np.array(deltas)
        c1 = _MS_COEF[preds, 0].astype(np.float64)
        c2 = _MS_COEF[preds, 1].astype(np.float64)
        nibs = []
        for t in range(2, spb):
            pred = _trunc_div256(samp1 * c1 + samp2 * c2)
            err = blk[t].astype(np.float64) - pred
            nib = np.clip(np.trunc(err / delta), -8, 7)
            new = np.clip(pred + nib * delta, -32768.0, 32767.0)
            samp2 = samp1
            samp1 = new
            un = (nib.astype(np.int64) & 0x0F)
            delta = np.maximum(_trunc_div256(delta * _MS_ADAPT[un]),
                               16.0)
            nibs.extend(int(v) for v in un)
        if len(nibs) & 1:
            nibs.append(0)
        body = bytes((nibs[i] << 4) | nibs[i + 1]
                     for i in range(0, len(nibs), 2))
        blocks.append((head + body).ljust(block_align, b"\x00"))

    payload = b"".join(blocks)
    ext = struct.pack("<HHH", 32, spb, 7) + b"".join(
        struct.pack("<hh", int(a), int(b)) for a, b in _MS_COEF)
    avg = rate * block_align // spb
    hdr = (b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16 + len(ext), _TAG_MS_ADPCM, ch, rate, avg,
        block_align, 4) + ext
        + b"data" + struct.pack("<I", len(payload)))
    padb = len(payload) & 1
    return (b"RIFF" + struct.pack("<I", len(hdr) + len(payload) + padb)
            + hdr + payload + b"\x00" * padb)


def _iter_chunks(buf, start, end):
    """Yield (fourcc, payload_offset, size) walking even-aligned RIFF
    chunks in buf[start:end]."""
    pos = start
    while pos + 8 <= end:
        cc, size = struct.unpack_from("<4sI", buf, pos)
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_wav(buf):
    """WAV bytes → (samples float64 in [-1, 1] of shape (n,) mono or
    (n, ch), sample_rate).

    Raises ``ValueError`` on malformed containers and on compressed
    format tags this from-scratch reader does not implement (ADPCM,
    mu-law, MP3-in-WAV …).
    """
    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    riff_size = struct.unpack_from("<I", buf, 4)[0]
    end = min(len(buf), 8 + riff_size)

    fmt = None
    data = None
    ms_coefs = _MS_COEF
    for cc, off, size in _iter_chunks(buf, 12, end):
        if cc == b"fmt " and fmt is None:
            if size < 16 or off + 16 > len(buf):
                raise ValueError("truncated fmt chunk")
            tag, ch, rate, _bps, block, bits = struct.unpack_from(
                "<HHIIHH", buf, off)
            if tag == _TAG_MS_ADPCM and size >= 22 and \
                    off + 22 <= len(buf):
                # cbSize ext: wSamplesPerBlock, wNumCoef, coef pairs
                ncoef = struct.unpack_from("<H", buf, off + 20)[0]
                if ncoef and off + 22 + 4 * ncoef <= len(buf):
                    pairs = struct.unpack_from("<%dh" % (2 * ncoef),
                                               buf, off + 22)
                    ms_coefs = np.array(pairs, np.int32).reshape(-1, 2)
            if tag == _TAG_EXTENSIBLE:
                # cbSize >= 22: wValidBits, dwChannelMask, SubFormat GUID
                if size < 40 or off + 40 > len(buf):
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE")
                sub = buf[off + 24:off + 40]
                if sub[2:] != _SUBFORMAT_GUID_TAIL:
                    raise ValueError("unknown EXTENSIBLE sub-format GUID")
                tag = struct.unpack_from("<H", sub, 0)[0]
            fmt = (tag, ch, rate, block, bits)
        elif cc == b"data" and data is None:
            data = buf[off:off + min(size, len(buf) - off)]
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    tag, ch, rate, block, bits = fmt
    if ch < 1 or rate < 1:
        raise ValueError("invalid channel count / sample rate")

    if tag == _TAG_PCM:
        if bits == 8:            # unsigned, offset 128
            s = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            s = np.frombuffer(
                data[:len(data) // 2 * 2], "<i2").astype(np.float64) \
                / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[:len(data) // 3 * 3], np.uint8)
            raw = raw.reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            s = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            s = np.frombuffer(
                data[:len(data) // 4 * 4], "<i4").astype(np.float64) \
                / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _TAG_FLOAT:
        if bits == 32:
            s = np.frombuffer(
                data[:len(data) // 4 * 4], "<f4").astype(np.float64)
        elif bits == 64:
            s = np.frombuffer(data[:len(data) // 8 * 8],
                              "<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    elif tag == _TAG_MULAW:
        s = _MULAW_LUT[np.frombuffer(data, np.uint8)].astype(
            np.float64) / 32768.0
    elif tag == _TAG_ALAW:
        s = _ALAW_LUT[np.frombuffer(data, np.uint8)].astype(
            np.float64) / 32768.0
    elif tag == _TAG_IMA_ADPCM:
        s = _decode_ima_adpcm(data, ch, block)
        return (s[:, 0] if ch == 1 else s), rate
    elif tag == _TAG_MS_ADPCM:
        s = _decode_ms_adpcm(data, ch, block, ms_coefs)
        return (s[:, 0] if ch == 1 else s), rate
    else:
        raise ValueError(
            f"unsupported WAVE format tag 0x{tag:04x} (perceptual "
            "codecs are out of scope for the from-scratch reader)")

    if ch > 1:
        s = s[:len(s) // ch * ch].reshape(-1, ch)
    return s, rate


def encode_wav(samples, rate=16000, bits=16):
    """samples (float in [-1, 1] or int16) → canonical PCM WAV bytes.

    (n,) writes mono; (n, ch) interleaves channels."""
    s = np.asarray(samples)
    ch = 1 if s.ndim == 1 else s.shape[1]
    if s.dtype.kind == "f":
        s = np.clip(np.round(s * (1 << (bits - 1))),
                    -(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    if bits == 16:
        payload = s.astype("<i2").tobytes()
    elif bits == 8:
        payload = (s.astype(np.int64) + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        v = s.astype(np.int64) & 0xFFFFFF
        raw = np.empty((v.size, 3), np.uint8)
        flat = v.ravel()
        raw[:, 0] = flat & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = (flat >> 16) & 0xFF
        payload = raw.tobytes()
    elif bits == 32:
        payload = s.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block = ch * (bits // 8)
    hdr = (b"WAVEfmt " + struct.pack("<IHHIIHH", 16, _TAG_PCM, ch,
                                     rate, rate * block, block, bits)
           + b"data" + struct.pack("<I", len(payload)))
    # the odd-payload pad byte belongs INSIDE the RIFF chunk: include
    # it in the container size so strict parsers see no trailing junk
    pad = len(payload) & 1
    return (b"RIFF" + struct.pack("<I", len(hdr) + len(payload) + pad)
            + hdr + payload + b"\x00" * pad)
