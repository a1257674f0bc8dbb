"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annexes D, F).

Parity target: the reference's JPEG driver exposes arithmetic coding
through libjpeg (``autotest/gdrivers/jpeg.py`` test_jpeg_24 —
ARITHMETIC=YES CreateCopy of byte.tif decodes to checksum 4743); the
reference's vendored IJG build omits the arithmetic back end, so the
independent oracle for this module is the *system* libjpeg-turbo
(tests/test_jpeg_arith.py compiles a tiny harness against it).

Implements the QM-coder (T.81 Annex D: conditional exchange,
renormalization, zero-byte stuffing after 0xFF, carry resolution
through a pending-0xFF stack) and the
sequential DCT statistical models (Annex F: DC difference conditioning
with L/U categories, AC end-of-block / run / magnitude decision trees,
the 113-state estimation table from Table D.3 plus the fixed
non-adaptive state).  Entropy-codes the same quantized coefficient
blocks as :mod:`raydal.io.jpeg`'s Huffman path, so the two encodings
of an image decode to identical pixels (lossless entropy swap).

SOF9 (sequential arithmetic) streams only; DAC markers carry the
DC L/U and AC Kx conditioning (defaults 0/1 and 5).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ArithDecoder", "ArithEncoder", "dc_decode", "dc_encode",
           "ac_decode", "ac_encode"]

# T.81 Table D.3 (public standard data; values cross-checked against
# the system libjpeg's exported jpeg_aritab): (Qe, NMPS, NLPS, SWITCH).
# Index 113 is the fixed, never-adapting state used for AC signs.
ARITH_TAB = [
    (0x5a1d,   1,   1, 1), (0x2586,   2,  14, 0), (0x1114,   3,  16, 0),
    (0x080b,   4,  18, 0), (0x03d8,   5,  20, 0), (0x01da,   6,  23, 0),
    (0x00e5,   7,  25, 0), (0x006f,   8,  28, 0), (0x0036,   9,  30, 0),
    (0x001a,  10,  33, 0), (0x000d,  11,  35, 0), (0x0006,  12,   9, 0),
    (0x0003,  13,  10, 0), (0x0001,  13,  12, 0), (0x5a7f,  15,  15, 1),
    (0x3f25,  16,  36, 0), (0x2cf2,  17,  38, 0), (0x207c,  18,  39, 0),
    (0x17b9,  19,  40, 0), (0x1182,  20,  42, 0), (0x0cef,  21,  43, 0),
    (0x09a1,  22,  45, 0), (0x072f,  23,  46, 0), (0x055c,  24,  48, 0),
    (0x0406,  25,  49, 0), (0x0303,  26,  51, 0), (0x0240,  27,  52, 0),
    (0x01b1,  28,  54, 0), (0x0144,  29,  56, 0), (0x00f5,  30,  57, 0),
    (0x00b7,  31,  59, 0), (0x008a,  32,  60, 0), (0x0068,  33,  62, 0),
    (0x004e,  34,  63, 0), (0x003b,  35,  32, 0), (0x002c,   9,  33, 0),
    (0x5ae1,  37,  37, 1), (0x484c,  38,  64, 0), (0x3a0d,  39,  65, 0),
    (0x2ef1,  40,  67, 0), (0x261f,  41,  68, 0), (0x1f33,  42,  69, 0),
    (0x19a8,  43,  70, 0), (0x1518,  44,  72, 0), (0x1177,  45,  73, 0),
    (0x0e74,  46,  74, 0), (0x0bfb,  47,  75, 0), (0x09f8,  48,  77, 0),
    (0x0861,  49,  78, 0), (0x0706,  50,  79, 0), (0x05cd,  51,  48, 0),
    (0x04de,  52,  50, 0), (0x040f,  53,  50, 0), (0x0363,  54,  51, 0),
    (0x02d4,  55,  52, 0), (0x025c,  56,  53, 0), (0x01f8,  57,  54, 0),
    (0x01a4,  58,  55, 0), (0x0160,  59,  56, 0), (0x0125,  60,  57, 0),
    (0x00f6,  61,  58, 0), (0x00cb,  62,  59, 0), (0x00ab,  63,  61, 0),
    (0x008f,  32,  61, 0), (0x5b12,  65,  65, 1), (0x4d04,  66,  80, 0),
    (0x412c,  67,  81, 0), (0x37d8,  68,  82, 0), (0x2fe8,  69,  83, 0),
    (0x293c,  70,  84, 0), (0x2379,  71,  86, 0), (0x1edf,  72,  87, 0),
    (0x1aa9,  73,  87, 0), (0x174e,  74,  72, 0), (0x1424,  75,  72, 0),
    (0x119c,  76,  74, 0), (0x0f6b,  77,  74, 0), (0x0d51,  78,  75, 0),
    (0x0bb6,  79,  77, 0), (0x0a40,  48,  77, 0), (0x5832,  81,  80, 1),
    (0x4d1c,  82,  88, 0), (0x438e,  83,  89, 0), (0x3bdd,  84,  90, 0),
    (0x34ee,  85,  91, 0), (0x2eae,  86,  92, 0), (0x299a,  87,  93, 0),
    (0x2516,  71,  86, 0), (0x5570,  89,  88, 1), (0x4ca9,  90,  95, 0),
    (0x44d9,  91,  96, 0), (0x3e22,  92,  97, 0), (0x3824,  93,  99, 0),
    (0x32b4,  94,  99, 0), (0x2e17,  86,  93, 0), (0x56a8,  96,  95, 1),
    (0x4f46,  97, 101, 0), (0x47e5,  98, 102, 0), (0x41cf,  99, 103, 0),
    (0x3c3d, 100, 104, 0), (0x375e,  93,  99, 0), (0x5231, 102, 105, 0),
    (0x4c0f, 103, 106, 0), (0x4639, 104, 107, 0), (0x415e,  99, 103, 0),
    (0x5627, 106, 105, 1), (0x50e7, 107, 108, 0), (0x4b85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504f, 107, 111, 0), (0x5a10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59eb, 111, 112, 1),
    (0x5a1d, 113, 113, 0),
]

DC_STAT_BINS = 64
AC_STAT_BINS = 256
FIXED_BIN = 113


class ArithDecoder:
    """T.81 Annex D decoder over an entropy-coded segment."""

    def __init__(self, data):
        self.data = data
        self.bp = 0
        self.end = len(data)
        self.done = False
        # init: 3 bytes left-aligned at bit 8 with 8 spare low bits
        # (CT=8), A=0x10000 — the arrangement that round-trips the
        # libjpeg oracle streams (tests/test_jpeg_arith.py)
        self.c = 0
        for _ in range(3):
            self.c = (self.c << 8) | self._next()
        self.c <<= 8
        self.ct = 8
        self.a = 0x10000

    def _next(self):
        """Next entropy byte: 0xFF 0x00 unstuffs to 0xFF, a marker
        (0xFF + nonzero) or end-of-data feeds zero bytes from then on
        (T.81 D.2.8 byte stuffing / libjpeg jdarith.c)."""
        if self.done or self.bp >= self.end:
            self.done = True
            return 0
        b = self.data[self.bp]
        if b == 0xFF:
            nxt = self.data[self.bp + 1] if self.bp + 1 < self.end \
                else 0xD9
            if nxt != 0:
                self.done = True
                return 0
            self.bp += 2
            return 0xFF
        self.bp += 1
        return b

    def _bytein(self):
        self.c += self._next() << 8
        self.ct = 8

    def decode(self, st, ctx):
        sv = st[ctx]
        idx = sv & 0x7F
        mps = sv >> 7
        qe, nmps, nlps, sw = ARITH_TAB[idx]
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return mps
            # MPS renorm path with conditional exchange (D.2.3)
            if self.a < qe:
                d = 1 - mps
                if sw:
                    mps ^= 1
                st[ctx] = (mps << 7) | nlps
            else:
                d = mps
                st[ctx] = (mps << 7) | nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                st[ctx] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if sw:
                    mps ^= 1
                st[ctx] = (mps << 7) | nlps
            self.a = qe
        # RENORMD (D.2.6)
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0x1FFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class ArithEncoder:
    """T.81 Annex D encoder: byte output with zero-byte stuffing after
    0xFF and carry resolution through a pending-0xFF stack (Figure
    D.9 / libjpeg jcarith.c finish-up semantics)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()
        self._buf = None               # pending byte (never 0xFF)
        self._sc = 0                   # stacked 0xFF count

    def _byteout(self):
        t = self.c >> 19
        self.c &= 0x7FFFF
        self.ct = 8
        if t > 0xFF:                   # carry
            if self._buf is not None:
                self.out.append(self._buf + 1)
                if self._buf + 1 == 0xFF:
                    self.out.append(0)
            # carried stacked 0xFFs become 0x00 (no stuffing needed)
            self.out.extend(b"\x00" * self._sc)
            self._sc = 0
            self._buf = t & 0xFF
        elif t == 0xFF:
            self._sc += 1              # defer until carry is settled
        else:
            if self._buf is not None:
                self.out.append(self._buf)
            self.out.extend(b"\xff\x00" * self._sc)
            self._sc = 0
            self._buf = t

    def encode(self, st, ctx, d):
        sv = st[ctx]
        idx = sv & 0x7F
        mps = sv >> 7
        qe, nmps, nlps, sw = ARITH_TAB[idx]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return
            if self.a < qe:            # conditional exchange
                self.c += self.a
                self.a = qe
            st[ctx] = (mps << 7) | nmps
        else:
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if sw:
                mps ^= 1
            st[ctx] = (mps << 7) | nlps
        while True:                    # RENORME
            self.a = (self.a << 1) & 0x1FFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self):
        """D.1.9 FLUSH: clear final bits, align, drain the pending
        byte/stack, and discard trailing zero bytes."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t << self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self._buf is not None:
            self.out.append(self._buf)
            if self._buf == 0xFF:
                self.out.append(0)
        self.out.extend(b"\xff\x00" * self._sc)
        self._sc = 0
        self._buf = None
        # discard trailing zero bytes (but never a stuffed 0xFF 0x00)
        while self.out and self.out[-1] == 0 and \
                not (len(self.out) >= 2 and self.out[-2] == 0xFF):
            self.out.pop()
        return bytes(self.out)


# ---------------------------------------------------------------- models

class _CompState:
    __slots__ = ("dc_st", "ac_st", "last_dc", "dc_ctx")

    def __init__(self):
        self.dc_st = bytearray(DC_STAT_BINS)
        self.ac_st = bytearray(AC_STAT_BINS)
        self.last_dc = 0
        self.dc_ctx = 0


def dc_decode(dec, cs, dc_l, dc_u):
    """One DC difference (T.81 F.2.2.1 / Figure F.24)."""
    st = cs.dc_st
    base = cs.dc_ctx
    if dec.decode(st, base) == 0:
        cs.dc_ctx = 0
        return 0
    sign = dec.decode(st, base + 1)
    bin_ = base + 2 + sign
    m = dec.decode(st, bin_)
    if m:
        bin_ = 20                      # X1 (Table F.4)
        while dec.decode(st, bin_):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            bin_ += 1
    # F.1.4.4.1.2: conditioning category for the NEXT block
    if m < ((1 << dc_l) >> 1):
        cs.dc_ctx = 0
    elif m > ((1 << dc_u) >> 1):
        cs.dc_ctx = 12 + sign * 4
    else:
        cs.dc_ctx = 4 + sign * 4
    v = m
    bin_ += 14                         # mantissa bins
    m >>= 1
    while m:
        if dec.decode(st, bin_):
            v |= m
        m >>= 1
    v += 1
    return -v if sign else v


def dc_encode(enc, cs, diff, dc_l, dc_u):
    st = cs.dc_st
    base = cs.dc_ctx
    if diff == 0:
        enc.encode(st, base, 0)
        cs.dc_ctx = 0
        return
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, base + 1, sign)
    m2 = (-diff if sign else diff) - 1
    bin_ = base + 2 + sign
    if m2 == 0:
        enc.encode(st, bin_, 0)
        cat = 0
    else:
        enc.encode(st, bin_, 1)
        bin_ = 20
        cat = 1
        while (cat << 1) <= m2:
            enc.encode(st, bin_, 1)
            cat <<= 1
            bin_ += 1
        enc.encode(st, bin_, 0)
    if cat < ((1 << dc_l) >> 1):
        cs.dc_ctx = 0
    elif cat > ((1 << dc_u) >> 1):
        cs.dc_ctx = 12 + sign * 4
    else:
        cs.dc_ctx = 4 + sign * 4
    bin_ += 14
    bit = cat >> 1
    while bit:
        enc.encode(st, bin_, 1 if (m2 & bit) else 0)
        bit >>= 1


def ac_decode(dec, cs, block, kx, fixed):
    """One block's AC coefficients into ``block`` (natural order) —
    T.81 F.2.2.2."""
    st = cs.ac_st
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):       # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > 63:
                raise ValueError("arith AC run overflow")
        sign = dec.decode(fixed, 0)
        fixed[0] = FIXED_BIN           # fixed state never adapts
        bin_ = base + 2
        m = dec.decode(st, bin_)
        if m:
            if dec.decode(st, bin_):
                m <<= 1
                bin_ = 189 if k <= kx else 217
                while dec.decode(st, bin_):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    bin_ += 1
        v = m
        bin_ += 14
        m >>= 1
        while m:
            if dec.decode(st, bin_):
                v |= m
            m >>= 1
        v += 1
        block[k] = -v if sign else v          # zigzag order
        k += 1


def ac_encode(enc, cs, coefs, kx, fixed):
    """``coefs``: 64 zigzag-ordered ints (index 0 = DC, ignored)."""
    st = cs.ac_st
    ke = 63
    while ke >= 1 and coefs[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)        # not EOB yet
        while coefs[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        enc.encode(st, base + 1, 1)
        v = int(coefs[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        fixed[0] = FIXED_BIN
        m2 = (-v if sign else v) - 1
        bin_ = base + 2
        if m2 == 0:
            enc.encode(st, bin_, 0)
            cat = 0
        elif m2 == 1:
            enc.encode(st, bin_, 1)
            enc.encode(st, bin_, 0)
            cat = 1
        else:
            enc.encode(st, bin_, 1)
            enc.encode(st, bin_, 1)
            bin_ = 189 if k <= kx else 217
            cat = 2
            while (cat << 1) <= m2:
                enc.encode(st, bin_, 1)
                cat <<= 1
                bin_ += 1
            enc.encode(st, bin_, 0)
        bin_ += 14
        bit = cat >> 1
        while bit:
            enc.encode(st, bin_, 1 if (m2 & bit) else 0)
            bit >>= 1
        k += 1
    if ke < 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB
