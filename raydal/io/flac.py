"""FLAC codec — from-scratch numpy/stdlib implementation of the
public FLAC format (RFC 9639 / the xiph.org format specification).

Closes the "compressed audio" gap of the multimodal swap point
(:mod:`raydal.ops.multimodal`): a real web corpus carries compressed
audio, and lossless FLAC is fully implementable from the public spec
without external codec libraries.

Decoder (``decode_flac``) covers the full mandatory surface:

* STREAMINFO + skipped metadata blocks, stream MD5 verification
* frame headers — all block-size / sample-rate / sample-size codes,
  fixed and variable blocking, UTF-8-style coded numbers, CRC-8
* subframes — CONSTANT, VERBATIM, FIXED orders 0-4 (restored with a
  vectorized repeated-cumsum integration), LPC orders 1-32, wasted
  bits-per-sample
* residuals — Rice (4-bit) and Rice2 (5-bit) partitions incl. the
  escape-to-raw code
* stereo decorrelation — left/side, right/side, mid/side
* frame CRC-16 verification

Encoder (``encode_flac``) emits spec-conformant streams: fixed
predictors 0-4 chosen per subframe by residual magnitude, CONSTANT
and VERBATIM fallbacks, per-frame choice of independent vs L/S, R/S,
M/S stereo, single-partition Rice residuals with an exact
bit-cost-scanned parameter, correct CRC-8/CRC-16 and stream MD5.

Reference parity: GDAL delegates audio to external libs; the contract
here is the one :class:`raydal.ops.multimodal.AudioFeatures` defines
(bytes → (samples, rate) at a documented boundary).  CRC parity is
anchored to the published check values of CRC-8/SMBUS (0xF4) and
CRC-16/UMTS (0xFEE8) over b"123456789" (tests/test_flac.py).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "crc8", "crc16"]


# ---------------------------------------------------------------- CRC

def _crc_table(poly, width):
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        c = b << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tbl.append(c & mask)
    return tbl


_CRC8_T = _crc_table(0x07, 8)       # CRC-8 poly x^8+x^2+x+1, init 0
_CRC16_T = _crc_table(0x8005, 16)   # CRC-16 poly x^16+x^15+x^2+1, init 0


def crc8(data):
    c = 0
    for b in data:
        c = _CRC8_T[c ^ b]
    return c


def crc16(data):
    c = 0
    for b in data:
        c = (_CRC16_T[((c >> 8) ^ b) & 0xFF] ^ (c << 8)) & 0xFFFF
    return c


# ----------------------------------------------------------- bit I/O

class _BitReader:
    __slots__ = ("buf", "pos", "acc", "nbits")

    def __init__(self, buf, pos=0):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n):
        while self.nbits < n:
            if self.pos >= len(self.buf):
                raise ValueError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n):
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self):
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.nbits & 7:
            if self.read(self.nbits & 7):
                raise ValueError("non-zero frame padding bits")

    def byte_pos(self):
        # only meaningful when byte-aligned
        return self.pos - self.nbits // 8


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v, n):
        self.acc = (self.acc << n) | (int(v) & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q):
        # q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


# ------------------------------------------------------ coded number

def _read_coded_number(br):
    """UTF-8-style frame/sample number (RFC 9639 §9.1.5)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid coded number prefix")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw, v):
    if v < 0x80:
        bw.write(v, 8)
        return
    # count payload bits → continuation bytes
    for n in range(1, 7):
        if v < (1 << (6 * n + (6 - n))):
            break
    lead = (0xFF << (7 - n)) & 0xFF | (v >> (6 * n))
    bw.write(lead, 8)
    for i in range(n - 1, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


# ----------------------------------------------------------- tables

_BS_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
            256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
            8192: 13, 16384: 14, 32768: 15}
_SR_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
            22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
            96000: 11}
_SR_FROM = {v: k for k, v in _SR_CODE.items()}
_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SS_FROM = {v: k for k, v in _SS_CODE.items()}


# --------------------------------------------------------- residuals

def _read_rice_block(br, k, n, out, idx):
    if k:
        rd, ru, kk = br.read, br.read_unary, k
        for i in range(n):
            u = (ru() << kk) | rd(kk)
            out[idx + i] = (u >> 1) ^ -(u & 1)
    else:
        ru = br.read_unary
        for i in range(n):
            u = ru()
            out[idx + i] = (u >> 1) ^ -(u & 1)


def _decode_residual(br, bs, order):
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    esc = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("block size not divisible by partitions")
    psize = bs >> porder
    out = np.empty(bs - order, np.int64)
    idx = 0
    for p in range(nparts):
        n = psize - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("partition smaller than predictor order")
        k = br.read(pbits)
        if k == esc:
            raw = br.read(5)
            if raw:
                for i in range(n):
                    out[idx + i] = br.read_signed(raw)
            else:
                out[idx:idx + n] = 0
        else:
            _read_rice_block(br, k, n, out, idx)
        idx += n
    return out


def _write_residual(bw, resid):
    """Single-partition Rice/Rice2 with exact bit-cost-scanned k."""
    u = np.where(resid >= 0, resid << 1, (-resid << 1) - 1).astype(
        np.uint64)
    n = len(u)
    best_k, best_cost = 0, None
    for k in range(0, 31):
        cost = int((u >> np.uint64(k)).sum()) + n * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    method = 0 if best_k < 15 else 1
    bw.write(method, 2)
    bw.write(0, 4)                      # partition order 0
    bw.write(best_k, 4 + method)
    k = best_k
    ul = u.tolist()
    if k:
        mask = (1 << k) - 1
        for v in ul:
            bw.write_unary(v >> k)
            bw.write(v & mask, k)
    else:
        for v in ul:
            bw.write_unary(v)
    return best_cost + 6 + method


# --------------------------------------------------------- subframes

_FIXED_COEF = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(sig, order):
    return np.diff(sig, order) if order else sig


def _fixed_restore(warm, resid, order, bs):
    if order == 0:
        return resid.astype(np.int64).copy()
    a = np.empty(bs, np.int64)
    a[:order] = warm
    cur = resid.astype(np.int64)
    w = np.asarray(warm, np.int64)
    for j in range(order, 0, -1):
        seed = np.diff(w, j - 1)[-1] if j > 1 else w[-1]
        cur = seed + np.cumsum(cur)
    a[order:] = cur
    return a


def _lpc_restore(warm, resid, coefs, shift, bs):
    order = len(coefs)
    a = np.empty(bs, np.int64)
    a[:order] = warm
    c = np.asarray(coefs[::-1], np.int64)
    for i in range(order, bs):
        a[i] = resid[i - order] + (int(a[i - order:i] @ c) >> shift)
    return a


def _decode_subframe(br, bs, bps):
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if t == 0:                                   # CONSTANT
        out = np.full(bs, br.read_signed(eff), np.int64)
    elif t == 1:                                 # VERBATIM
        out = np.empty(bs, np.int64)
        rs = br.read_signed
        for i in range(bs):
            out[i] = rs(eff)
    elif 8 <= t <= 12:                           # FIXED 0-4
        order = t - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, bs, order)
        out = _fixed_restore(warm, resid, order, bs)
    elif t >= 32:                                # LPC 1-32
        order = (t & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, bs, order)
        out = _lpc_restore(warm, resid, coefs, shift, bs)
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    return out << wasted if wasted else out


def _encode_subframe(bw, sig, bps):
    sig = np.asarray(sig, np.int64)
    bs = len(sig)
    if bs and (sig == sig[0]).all():             # CONSTANT
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(sig[0]), bps)
        return
    best_order, best_cost, best_resid = 0, None, sig
    for order in range(0, 5):
        if bs <= order:
            break
        resid = _fixed_residual(sig, order)
        # quick magnitude proxy; exact cost decided by the Rice scan
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_resid = order, cost, resid
    # exact Rice cost for the winner vs VERBATIM
    u = np.where(best_resid >= 0, best_resid << 1,
                 (-best_resid << 1) - 1).astype(np.uint64)
    rice_cost = min(int((u >> np.uint64(k)).sum())
                    + len(u) * (k + 1) for k in range(0, 31))
    rice_total = rice_cost + best_order * bps + 6
    if rice_total >= bs * bps:                   # VERBATIM
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in sig.tolist():
            bw.write(v, bps)
        return
    bw.write(0, 1)
    bw.write(8 + best_order, 6)
    bw.write(0, 1)
    for v in sig[:best_order].tolist():
        bw.write(v, bps)
    _write_residual(bw, best_resid)


# ------------------------------------------------------------ frames

def _decode_frame(buf, pos, info):
    start = pos
    br = _BitReader(buf, pos)
    if br.read(14) != 0x3FFE:
        raise ValueError("lost frame sync")
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    br.read(1)                                   # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("reserved block size code")
    elif bs_code == 1:
        bs = 192
    elif bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code == 6:
        bs = br.read(8) + 1
    elif bs_code == 7:
        bs = br.read(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = info["rate"]
    elif sr_code in _SR_FROM:
        rate = _SR_FROM[sr_code]
    elif sr_code == 12:
        rate = br.read(8) * 1000
    elif sr_code == 13:
        rate = br.read(16)
    elif sr_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("invalid sample rate code")
    if ss_code == 0:
        bps = info["bps"]
    elif ss_code in _SS_FROM:
        bps = _SS_FROM[ss_code]
    else:
        raise ValueError("reserved sample size code")
    hdr_end = br.byte_pos()
    if crc8(buf[start:hdr_end]) != br.read(8):
        raise ValueError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        chans = [_decode_subframe(br, bs, bps)
                 for _ in range(ch_code + 1)]
        block = np.stack(chans, axis=1)
    elif ch_code == 8:                           # left / side
        left = _decode_subframe(br, bs, bps)
        side = _decode_subframe(br, bs, bps + 1)
        block = np.stack([left, left - side], axis=1)
    elif ch_code == 9:                           # side / right
        side = _decode_subframe(br, bs, bps + 1)
        right = _decode_subframe(br, bs, bps)
        block = np.stack([right + side, right], axis=1)
    elif ch_code == 10:                          # mid / side
        mid = _decode_subframe(br, bs, bps)
        side = _decode_subframe(br, bs, bps + 1)
        mid = (mid << 1) | (side & 1)
        block = np.stack([(mid + side) >> 1, (mid - side) >> 1], axis=1)
    else:
        raise ValueError("reserved channel assignment")

    br.align()
    crc_pos = br.byte_pos()
    if crc16(buf[start:crc_pos]) != br.read(16):
        raise ValueError("frame CRC-16 mismatch")
    return block, br.byte_pos(), rate, bps


def _stereo_cost(sig):
    """Order-2 fixed-predictor magnitude proxy used to pick the
    channel assignment (the exact cost is settled per subframe)."""
    return int(np.abs(np.diff(sig, 2)).sum()) if len(sig) > 2 else \
        int(np.abs(sig).sum())


def _encode_frame(block, frame_no, rate, bps, stream_rate):
    bs, nch = block.shape
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)                               # fixed blocking
    bs_code = _BS_CODE.get(bs)
    if bs_code is None:
        bs_code = 6 if bs <= 256 else 7
    bw.write(bs_code, 4)
    if rate == stream_rate:
        sr_code, sr_extra = 0, None
    elif rate in _SR_CODE:
        sr_code, sr_extra = _SR_CODE[rate], None
    elif rate % 1000 == 0 and rate // 1000 < 256:
        sr_code, sr_extra = 12, (rate // 1000, 8)
    elif rate < 65536:
        sr_code, sr_extra = 13, (rate, 16)
    elif rate % 10 == 0 and rate // 10 < 65536:
        sr_code, sr_extra = 14, (rate // 10, 16)
    else:
        raise ValueError("sample rate not representable")
    bw.write(sr_code, 4)

    mode = nch - 1
    if nch == 2:
        l, r = block[:, 0], block[:, 1]
        side = l - r
        mid = (l + r) >> 1
        cl, cr = _stereo_cost(l), _stereo_cost(r)
        cs, cm = _stereo_cost(side), _stereo_cost(mid)
        choices = {1: cl + cr, 8: cl + cs, 9: cr + cs, 10: cm + cs}
        mode = min(choices, key=choices.get)
    bw.write(mode, 4)
    bw.write(_SS_CODE[bps], 3)
    bw.write(0, 1)
    _write_coded_number(bw, frame_no)
    if bs_code == 6:
        bw.write(bs - 1, 8)
    elif bs_code == 7:
        bw.write(bs - 1, 16)
    if sr_extra is not None:
        bw.write(*sr_extra)
    bw.write(crc8(bw.out), 8)

    if nch == 2 and mode != 1:
        if mode == 8:
            _encode_subframe(bw, l, bps)
            _encode_subframe(bw, side, bps + 1)
        elif mode == 9:
            _encode_subframe(bw, side, bps + 1)
            _encode_subframe(bw, r, bps)
        else:
            _encode_subframe(bw, mid, bps)
            _encode_subframe(bw, side, bps + 1)
    else:
        for c in range(nch):
            _encode_subframe(bw, block[:, c], bps)
    bw.align()
    bw.write(crc16(bw.out), 16)
    return bytes(bw.out)


# ------------------------------------------------------------ stream

def _md5_raw(x, bps):
    nbytes = bps // 8
    le = x.astype("<i8").tobytes()
    arr = np.frombuffer(le, np.uint8).reshape(-1, 8)[:, :nbytes]
    return hashlib.md5(np.ascontiguousarray(arr).tobytes()).digest()


def decode_flac(buf, verify_md5=True):
    """FLAC bytes → (samples int32 (n,) mono or (n, ch), rate, bps).

    Verifies every frame's CRC-8/CRC-16 and, when the STREAMINFO MD5
    is set and ``verify_md5``, the whole-stream MD5.
    """
    buf = bytes(buf)
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated metadata block")
        hdr = buf[pos]
        blen = int.from_bytes(buf[pos + 1:pos + 4], "big")
        body = buf[pos + 4:pos + 4 + blen]
        if hdr & 0x7F == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "min_bs": struct.unpack_from(">H", body, 0)[0],
                "max_bs": struct.unpack_from(">H", body, 2)[0],
                "rate": packed >> 44,
                "nch": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total": packed & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")

    blocks = []
    rate, bps = info["rate"], info["bps"]
    while pos < len(buf):
        block, pos, rate, bps = _decode_frame(buf, pos, info)
        blocks.append(block)
    x = np.concatenate(blocks) if blocks else \
        np.empty((0, info["nch"]), np.int64)
    if info["total"]:
        x = x[:info["total"]]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        if _md5_raw(x, bps) != info["md5"]:
            raise ValueError("stream MD5 mismatch")
    x = x.astype(np.int32)
    return (x[:, 0] if x.shape[1] == 1 else x), rate, bps


def encode_flac(samples, rate=16000, bps=16, block_size=4096):
    """int samples (n,) or (n, ch) → spec-conformant FLAC bytes."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not (1 <= nch <= 8):
        raise ValueError("1-8 channels supported")
    if bps not in _SS_CODE or bps % 8:
        raise ValueError("bps must be 8, 16, 24 or 32")
    x = x.astype(np.int64)
    lim = 1 << (bps - 1)
    if n and (x.min() < -lim or x.max() >= lim):
        raise ValueError(f"samples exceed {bps}-bit signed range")

    frames = []
    for f, off in enumerate(range(0, n, block_size)):
        frames.append(_encode_frame(x[off:off + block_size], f,
                                    rate, bps, rate))
    fsizes = [len(f) for f in frames] or [0]

    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | \
        min(n, (1 << 36) - 1)
    body = struct.pack(">HH", block_size, block_size)
    body += min(fsizes).to_bytes(3, "big")
    body += max(fsizes).to_bytes(3, "big")
    body += packed.to_bytes(8, "big")
    body += _md5_raw(x, bps)
    out = bytearray(b"fLaC")
    out.append(0x80)                             # last block, STREAMINFO
    out += (34).to_bytes(3, "big")
    out += body
    for f in frames:
        out += f
    return bytes(out)
