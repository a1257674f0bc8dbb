"""Pure-Python baseline JPEG codec (decode + encode), from scratch.

Decoder: SOI/APPn/DQT/DHT/SOF0-3/DRI/SOS parse, table-driven Huffman
entropy decode, dequantize, the IJG integer "islow" IDCT (13-bit
fixed-point, replicated so sample values match libjpeg bit-exactly),
libjpeg "fancy" (triangle) chroma upsampling for 4:2:0 / 4:2:2, and the
integer YCbCr→RGB conversion — validated against the reference's
published checksum for a real-world JPEG
(``autotest/gdrivers/jpeg.py:41-48``, albania.jpg).  Reference driver:
``frmts/jpeg/jpgdataset.cpp`` (which delegates to libjpeg; this module
reimplements the needed libjpeg subset in numpy).

Encoder: baseline sequential 8-bit, single or 3-channel (4:4:4), Annex-K
quantization tables scaled by quality, the spec's typical Huffman tables,
vectorized forward DCT.  Encode→decode round-trips at PSNR ≈ 40-55 dB
depending on quality — above the north rule's ≥ 40 dB lossy gate.

Entropy decoding is inherently bit-serial; the hot paths around it
(IDCT, upsample, color convert) are all vectorized across blocks.
"""

from __future__ import annotations

import struct

from raydal.io import _native
from raydal.io import jpeg_arith as JA

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg12",
           "encode_jpeg_lossless", "encode_jpeg_progressive",
           "encode_jpeg_arith"]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# ---------------------------------------------------------------- decode

_CONST_BITS = 13
_PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _idct_islow_1d(c0, c1, c2, c3, c4, c5, c6, c7, shift):
    """One islow butterfly over arrays; returns the 8 outputs."""
    z1 = (c2 + c6) * _F_0_541196100
    tmp2 = z1 - c6 * _F_1_847759065
    tmp3 = z1 + c2 * _F_0_765366865
    tmp0 = (c0 + c4) << _CONST_BITS
    tmp1 = (c0 - c4) << _CONST_BITS
    t10 = tmp0 + tmp3
    t13 = tmp0 - tmp3
    t11 = tmp1 + tmp2
    t12 = tmp1 - tmp2
    o0, o1, o2, o3 = c7, c5, c3, c1
    z1 = o0 + o3
    z2 = o1 + o2
    z3 = o0 + o2
    z4 = o1 + o3
    z5 = (z3 + z4) * _F_1_175875602
    o0 = o0 * _F_0_298631336
    o1 = o1 * _F_2_053119869
    o2 = o2 * _F_3_072711026
    o3 = o3 * _F_1_501321110
    z1 = z1 * -_F_0_899976223
    z2 = z2 * -_F_2_562915447
    z3 = z3 * -_F_1_961570560 + z5
    z4 = z4 * -_F_0_390180644 + z5
    o0 += z1 + z3
    o1 += z2 + z4
    o2 += z2 + z3
    o3 += z1 + z4
    return (_descale(t10 + o3, shift), _descale(t11 + o2, shift),
            _descale(t12 + o1, shift), _descale(t13 + o0, shift),
            _descale(t13 - o0, shift), _descale(t12 - o1, shift),
            _descale(t11 - o2, shift), _descale(t10 - o3, shift))


def idct_islow(blocks, precision=8):
    """IJG jpeg_idct_islow over (N, 8, 8) int32 dequantized coefficients.

    Returns (N, 8, 8) samples centered at 2^(P-1) and clamped to
    [0, 2^P - 1] — uint8 for the 8-bit path (bit-exact with libjpeg,
    the parity anchor for the published albania.jpg checksum), uint16
    for 12-bit extended-sequential frames (libjpeg ``BITS_IN_JSAMPLE
    == 12`` build semantics)."""
    b = blocks.astype(np.int64)
    # pass 1: over columns
    cols = [b[:, i, :] for i in range(8)]
    r = _idct_islow_1d(*cols, _CONST_BITS - _PASS1_BITS)
    ws = np.stack(r, axis=1)  # (N, 8, 8) workspace, rows=frequency y
    # pass 2: over rows
    rows = [ws[:, :, i] for i in range(8)]
    r2 = _idct_islow_1d(*rows, _CONST_BITS + _PASS1_BITS + 3)
    out = np.stack(r2, axis=2) + (1 << (precision - 1))
    if precision == 8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return np.clip(out, 0, (1 << precision) - 1).astype(np.uint16)


_HUFF_CACHE = {}


class _HuffTable:
    __slots__ = ("lut", "lut2", "lut_np")

    def __init__(self, counts, symbols, tc=1):
        # canonical codes → one 16-bit peek LUT of packed (len<<8)|sym,
        # plus a FUSED LUT decoding symbol AND the extended coefficient
        # value in a single lookup whenever code+value bits ≤ 16 (the
        # overwhelmingly common case — libjpeg-turbo's fast-path idea).
        # Fused packing: (total_bits<<34)|(s<<30)|(kind<<28)|(run<<24)|
        # (value+0x800000); kind 0=coefficient, 1=EOB, 2=ZRL; entry 0 ⇒
        # fall back to the two-step path.  Built vectorized, stored as
        # plain Python lists (scalar list indexing beats numpy ~5× in
        # the serial entropy loop), and memoized — the spec's typical
        # tables recur across images.
        key = (tc, bytes(counts), bytes(symbols))
        hit = _HUFF_CACHE.get(key)
        if hit is not None:
            self.lut, self.lut2, self.lut_np = hit
            return
        lut = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                k += 1
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                lut[lo:hi] = (length << 8) | sym
                code += 1
            code <<= 1
        length = (lut >> 8).astype(np.int64)
        sym = (lut & 0xFF).astype(np.int64)
        if tc == 0:
            s = sym          # DC symbol IS the magnitude-bit count
            run = np.zeros_like(sym)
            kind = np.zeros_like(sym)
        else:
            s = sym & 15
            run = sym >> 4
            kind = np.where(sym == 0, 1, np.where(sym == 0xF0, 2, 0))
            s = np.where(kind != 0, 0, s)
            run = np.where(kind != 0, 0, run)
        total = length + s
        wins = np.arange(1 << 16, dtype=np.int64)
        sh = np.maximum(16 - total, 0)
        vb = (wins >> sh) & ((np.int64(1) << s) - 1)
        half = np.where(s > 0, np.int64(1) << np.maximum(s - 1, 0), 0)
        v = np.where((s > 0) & (vb < half), vb + 1 - (np.int64(1) << s),
                     vb)
        fused = np.where((lut != 0) & (total <= 16),
                         (total << 34) | (s << 30) | (kind << 28)
                         | (run << 24) | (v + 0x800000), 0)
        self.lut = lut.tolist()
        self.lut2 = fused.tolist()
        self.lut_np = lut  # contiguous int32 view for the native kernel
        _HUFF_CACHE[key] = (self.lut, self.lut2, self.lut_np)


def _parse_huff(data, off, end, tables):
    while off < end:
        tc_th = data[off]
        counts = list(data[off + 1:off + 17])
        n = sum(counts)
        symbols = list(data[off + 17:off + 17 + n])
        tables[(tc_th >> 4, tc_th & 15)] = _HuffTable(counts, symbols,
                                                      tc=tc_th >> 4)
        off += 17 + n


def _extend(v, s):
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _unstuff(data):
    """Strip 0xFF00 stuffing and RSTn markers (vectorized).

    Returns ``(entropy_bytes, stop)`` where ``stop`` is the offset of
    the first hard marker (the byte position in ``data`` where marker
    parsing resumes — needed by multi-scan progressive streams)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ff = np.flatnonzero(arr == 0xFF)
    if len(ff) == 0:
        return bytes(data), len(data)
    nxt = arr[np.minimum(ff + 1, len(arr) - 1)]
    hard = ~((nxt == 0x00) | ((nxt >= 0xD0) & (nxt <= 0xD7)))
    hard |= ff + 1 >= len(arr)
    stop = len(arr)
    hi = np.flatnonzero(hard)
    if len(hi):
        stop = ff[hi[0]]
        ff = ff[:hi[0]]
        nxt = nxt[:hi[0]]
    keep = np.ones(stop, dtype=bool)
    stuffed = ff[nxt == 0x00]
    keep[stuffed + 1] = False          # drop the 0x00 after FF
    rst = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]
    keep[rst] = False                  # drop both RST bytes
    keep[rst + 1] = False
    return arr[:stop][keep].tobytes(), int(stop)


def decode_jpeg(buf):
    """Decode a baseline (SOF0/1, 8- or 12-bit), progressive (SOF2)
    or lossless (SOF3) JPEG → (h, w) grayscale or (h, w, 3) RGB;
    uint8 for 8-bit precision, uint16 for 12-bit / deep lossless.

    Progressive streams (spectral selection + successive approximation,
    ITU T.81 Annex G; reference behavior ``frmts/jpeg/jpgdataset.cpp``
    via libjpeg ``jdphuff.c``) accumulate coefficient bits across scans
    into per-component coefficient planes, then share the baseline
    dequant → IDCT → fancy-upsample pipeline.  Validated bit-exact
    against a compiled IJG libjpeg oracle on grayscale + color fixtures
    (tests/test_progressive_jpeg.py).

    Corrupt input raises ``ValueError`` — truncated headers
    (``struct.error``) and missing table ids (``KeyError``/``TypeError``)
    are normalized at this decode boundary.
    """
    try:
        return _decode_jpeg_impl(buf)
    except (struct.error, KeyError, TypeError) as e:
        raise ValueError(f"corrupt JPEG: {e!r}") from e


def _decode_jpeg_impl(buf):
    data = bytes(buf)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt = {}
    huff = {}
    frame = None
    restart_interval = 0
    dac_dc = {}                 # table id → (L, U)
    dac_ac = {}                 # table id → Kx
    i = 2
    n = len(data)
    scan = None
    prog_scans = []
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        (L,) = struct.unpack_from(">H", data, i + 2)
        seg = i + 4
        end = i + 2 + L
        if m == 0xDB:  # DQT
            o = seg
            while o < end:
                pq_tq = data[o]
                if pq_tq >> 4:
                    tbl = np.frombuffer(data[o + 1:o + 129],
                                        dtype=">u2").astype(np.int32)
                    o += 129
                else:
                    tbl = np.frombuffer(data[o + 1:o + 65],
                                        dtype=np.uint8).astype(np.int32)
                    o += 65
                qt[pq_tq & 15] = tbl
        elif m == 0xC4:  # DHT
            _parse_huff(data, seg, end, huff)
        elif m in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 + SOF3 lossless
            prec, h, w, nc = struct.unpack_from(">BHHB", data, seg)
            if h == 0 or w == 0 or nc == 0 or nc > 4 or \
                    h * w > (1 << 28):
                raise ValueError(f"implausible JPEG frame {w}x{h}x{nc}")
            if m != 0xC3 and prec not in (8, 12):
                raise NotImplementedError(
                    f"unsupported DCT sample precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(
                    ">BBB", data, seg + 6 + 3 * c)
                ch, cv = samp >> 4, samp & 15
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(
                        f"invalid sampling factors {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": m == 0xC2, "lossless": m == 0xC3}
        elif m == 0xC9:  # SOF9: extended sequential, arithmetic
            prec, h, w, nc = struct.unpack_from(">BHHB", data, seg)
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(
                    ">BBB", data, seg + 6 + 3 * c)
                comps.append({"id": cid, "h": samp >> 4,
                              "v": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": False, "lossless": False,
                     "arith": True}
        elif m == 0xCC:  # DAC: arithmetic conditioning
            o = seg
            while o + 1 < end:
                tc_tb = data[o]
                val = data[o + 1]
                o += 2
                if tc_tb >> 4 == 0:
                    dac_dc[tc_tb & 15] = (val & 15, val >> 4)  # (L, U)
                else:
                    dac_ac[tc_tb & 15] = val                   # Kx
        elif m in (0xC5, 0xC6, 0xC7, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1), progressive (SOF2), "
                "lossless (SOF3) and sequential arithmetic (SOF9) "
                "JPEG supported")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, seg)
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = data[seg]
            scomps = []
            for c in range(ns):
                cs, td_ta = data[seg + 1 + 2 * c], data[seg + 2 + 2 * c]
                scomps.append({"cs": cs, "td": td_ta >> 4, "ta": td_ta & 15})
            if frame.get("arith"):
                return _decode_arith_baseline(
                    frame, scomps, data[end:], qt, dac_dc, dac_ac,
                    restart_interval)
            if frame.get("lossless"):
                # SOF3: Ss = predictor selector, Al = point transform
                px = data[seg + 1 + 2 * ns]
                pt = data[seg + 3 + 2 * ns] & 15
                entropy, _stop = _unstuff(data[end:])
                return _decode_lossless(frame, scomps, huff, px, pt,
                                        entropy, restart_interval)
            if frame["progressive"] or ns < len(frame["comps"]):
                # progressive, or baseline NON-INTERLEAVED (one scan
                # per component subset): collect scans + entropy spans
                ss = data[seg + 1 + 2 * ns]
                se = data[seg + 2 + 2 * ns]
                ah_al = data[seg + 3 + 2 * ns]
                entropy, stop = _unstuff(data[end:])
                # snapshot table refs NOW — DHT may redefine them
                # between scans
                tabs = {}
                for sc in scomps:
                    if ss == 0:
                        t = huff.get((0, sc["td"]))
                        tabs[("dc", sc["cs"])] = t.lut if t else None
                    if se > 0:
                        t = huff.get((1, sc["ta"]))
                        tabs[("ac", sc["cs"])] = t.lut if t else None
                prog_scans.append({
                    "comps": scomps, "ss": ss, "se": se,
                    "ah": ah_al >> 4, "al": ah_al & 15,
                    "ri": restart_interval, "tabs": tabs,
                    "entropy": entropy})
                i = end + stop
                continue
            scan = (scomps, end)
            break
        i = end
    if frame is None:
        raise ValueError("no SOF/SOS found")
    if frame["progressive"]:
        if not prog_scans:
            raise ValueError("no SOF/SOS found")
        return _decode_progressive(frame, prog_scans, qt)
    if prog_scans:
        return _decode_baseline_scans(frame, prog_scans, qt)
    if scan is None:
        raise ValueError("no SOF/SOS found")

    scomps, entropy_start = scan
    entropy, _spans = _unstuff(data[entropy_start:])

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across (MCU-padded)
        c["bh"] = mcuy * c["v"]
        sc = next((s for s in scomps if s["cs"] == c["id"]), None)
        if sc is None:
            raise NotImplementedError(
                "multi-scan (non-interleaved) baseline JPEG not supported")
        dc_t, ac_t = huff[(0, sc["td"])], huff[(1, sc["ta"])]
        c["dc_lut"] = dc_t.lut
        c["dc_lut2"] = dc_t.lut2
        c["ac_lut"] = ac_t.lut
        c["ac_lut2"] = ac_t.lut2
        c["dc_lut_np"] = dc_t.lut_np
        c["ac_lut_np"] = ac_t.lut_np
        c["pred"] = 0

    # compiled fast path: the identical loop transcribed to C (see
    # raydal/io/_native.py); falls through to pure Python when no
    # compiler is present or RAYDAL_NO_NATIVE is set — bit-identical
    # either way (differential-tested)
    jfn = _native.get_jentropy()
    if jfn is not None and len(comps) <= 4 and frame.get("prec", 8) == 8:
        ncomp = len(comps)
        ch_a = np.array([c["h"] for c in comps], dtype=np.int32)
        cv_a = np.array([c["v"] for c in comps], dtype=np.int32)
        cbw_a = np.array([c["bw"] for c in comps], dtype=np.int32)
        dc_luts = np.ascontiguousarray(
            np.concatenate([c["dc_lut_np"] for c in comps]))
        ac_luts = np.ascontiguousarray(
            np.concatenate([c["ac_lut_np"] for c in comps]))
        sizes = [c["bh"] * c["bw"] * 64 for c in comps]
        coef_off = np.zeros(ncomp, dtype=np.int64)
        coef_off[1:] = np.cumsum(sizes[:-1])
        coefs_all = np.zeros(int(sum(sizes)), dtype=np.int32)
        rc = jfn(entropy, len(entropy), mcux, mcuy, ncomp,
                 restart_interval,
                 ch_a.ctypes.data, cv_a.ctypes.data, cbw_a.ctypes.data,
                 dc_luts.ctypes.data, ac_luts.ctypes.data,
                 coefs_all.ctypes.data, coef_off.ctypes.data)
        if rc == -1:
            raise ValueError("invalid Huffman code")
        if rc == -2:
            raise ValueError("truncated JPEG entropy stream")
        if rc == 0:
            for c, off, n in zip(comps, coef_off, sizes):
                c["coef"] = coefs_all[off:off + n].reshape(-1, 64)
            return _reconstruct(frame, comps, qt)

    for c in comps:
        c["coefs"] = [0] * (c["bh"] * c["bw"] * 64)

    # serial entropy decode — pure-int bit accumulator with list LUTs
    # (the only non-vectorizable stage; everything around it is numpy)
    buf = entropy
    nb = len(buf)
    acc = 0
    nbits = 0
    bpos = 0
    mcu_since_restart = 0
    for my in range(mcuy):
        # consuming far past EOF means a truncated/corrupt stream —
        # bail instead of decoding megabytes of synthetic 1-bits
        if bpos > nb + 512:
            raise ValueError("truncated JPEG entropy stream")
        for mx in range(mcux):
            if restart_interval and mcu_since_restart == restart_interval:
                # byte-align (RST markers were stripped; segments are
                # byte-aligned in the unstuffed stream) + reset DC preds
                drop = nbits & 7
                nbits -= drop
                acc &= (1 << nbits) - 1
                for c in comps:
                    c["pred"] = 0
                mcu_since_restart = 0
            mcu_since_restart += 1
            for c in comps:
                dc_lut = c["dc_lut"]
                dc_lut2 = c["dc_lut2"]
                ac_lut = c["ac_lut"]
                ac_lut2 = c["ac_lut2"]
                coefs = c["coefs"]
                cv, ch = c["v"], c["h"]
                cbw = c["bw"]
                pred = c["pred"]
                for by in range(cv):
                    for bx in range(ch):
                        base = ((my * cv + by) * cbw + mx * ch + bx) * 64
                        while nbits < 16:
                            acc = (acc << 8) | (buf[bpos] if bpos < nb
                                                else 0xFF)
                            bpos += 1
                            nbits += 8
                        # fused fast path: symbol + extended value in
                        # one lookup (code+value ≤ 16 bits)
                        p2 = dc_lut2[(acc >> (nbits - 16)) & 0xFFFF]
                        if p2:
                            nbits -= p2 >> 34
                            pred += (p2 & 0xFFFFFF) - 0x800000
                        else:
                            packed = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                            if packed == 0:
                                raise ValueError("invalid Huffman code")
                            nbits -= packed >> 8
                            s = packed & 0xFF
                            if s:
                                while nbits < s:
                                    acc = (acc << 8) | (buf[bpos]
                                                        if bpos < nb
                                                        else 0xFF)
                                    bpos += 1
                                    nbits += 8
                                v = (acc >> (nbits - s)) & ((1 << s) - 1)
                                nbits -= s
                                if v < (1 << (s - 1)):
                                    v += 1 - (1 << s)
                                pred += v
                        coefs[base] = pred
                        acc &= (1 << nbits) - 1
                        k = 1
                        while k < 64:
                            while nbits < 16:
                                acc = (acc << 8) | (buf[bpos] if bpos < nb
                                                    else 0xFF)
                                bpos += 1
                                nbits += 8
                            p2 = ac_lut2[(acc >> (nbits - 16)) & 0xFFFF]
                            if p2:
                                nbits -= p2 >> 34
                                kind = p2 >> 28 & 3
                                if kind == 0:
                                    k += p2 >> 24 & 15
                                    if k > 63:
                                        # run overflow: the two-step
                                        # path breaks BEFORE consuming
                                        # the value bits — refund them
                                        nbits += p2 >> 30 & 15
                                        break
                                    coefs[base + k] = \
                                        (p2 & 0xFFFFFF) - 0x800000
                                    k += 1
                                elif kind == 1:
                                    break  # EOB
                                else:
                                    k += 16  # ZRL
                                continue
                            packed = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                            if packed == 0:
                                raise ValueError("invalid Huffman code")
                            nbits -= packed >> 8
                            rs = packed & 0xFF
                            s = rs & 15
                            if s == 0:
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                break
                            while nbits < s:
                                acc = (acc << 8) | (buf[bpos] if bpos < nb
                                                    else 0xFF)
                                bpos += 1
                                nbits += 8
                            v = (acc >> (nbits - s)) & ((1 << s) - 1)
                            nbits -= s
                            if v < (1 << (s - 1)):
                                v += 1 - (1 << s)
                            coefs[base + k] = v
                            k += 1
                        acc &= (1 << nbits) - 1
                c["pred"] = pred

    for c in comps:
        c["coef"] = np.array(c["coefs"], dtype=np.int32).reshape(-1, 64)
    return _reconstruct(frame, comps, qt)


def _decode_arith_baseline(frame, scomps, tail, qt, dac_dc, dac_ac,
                           restart_interval):
    """Sequential arithmetic-coded scan (SOF9) — T.81 Annex F models
    over the Annex D QM-decoder (raydal/io/jpeg_arith.py).  Statistics
    areas are per conditioning TABLE (shared by components using the
    same table, libjpeg jdarith.c semantics); restart markers re-init
    the coder and zero every statistics area."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        sc = next((s for s in scomps if s["cs"] == c["id"]), None)
        if sc is None:
            raise NotImplementedError(
                "non-interleaved arithmetic scan not supported")
        c["td"], c["ta"] = sc["td"], sc["ta"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)

    # split restart segments: RSTn markers are real markers here (no
    # byte stuffing in arithmetic streams)
    segs = []
    start = 0
    i = 0
    while i + 1 < len(tail):
        if tail[i] == 0xFF and 0xD0 <= tail[i + 1] <= 0xD7:
            segs.append(tail[start:i])
            start = i + 2
            i += 2
            continue
        if tail[i] == 0xFF and tail[i + 1] == 0xD9:
            break
        i += 1
    segs.append(tail[start:])

    ri = int(restart_interval)
    mcus = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
    pos = 0
    for seg in segs:
        if pos >= len(mcus):
            break
        dec = JA.ArithDecoder(seg)
        dc_stats = {}
        ac_stats = {}
        states = {}
        for c in comps:
            st = JA._CompState()
            st.dc_st = dc_stats.setdefault(
                c["td"], bytearray(JA.DC_STAT_BINS))
            st.ac_st = ac_stats.setdefault(
                c["ta"], bytearray(JA.AC_STAT_BINS))
            states[c["id"]] = st
        fixed = bytearray([JA.FIXED_BIN])
        count = ri if ri else len(mcus) - pos
        for my, mx in mcus[pos:pos + count]:
            for c in comps:
                st = states[c["id"]]
                L, U = dac_dc.get(c["td"], (0, 1))
                kx = dac_ac.get(c["ta"], 5)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bi = (my * c["v"] + by) * c["bw"] \
                            + mx * c["h"] + bx
                        block = c["coef"][bi]
                        diff = JA.dc_decode(dec, st, L, U)
                        st.last_dc += diff
                        block[0] = st.last_dc
                        JA.ac_decode(dec, st, block, kx, fixed)
        pos += count
    return _reconstruct(frame, comps, qt)


def _reconstruct(frame, comps, qt):
    """Shared tail: per-component zigzag coef arrays → dequant + IDCT +
    plane assembly + chroma upsample + color convert."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # dequantize + de-zigzag + IDCT, vectorized per component
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG] = deq
        pix = idct_islow(nat.reshape(-1, 8, 8),
                         precision=frame.get("prec", 8))
        # assemble blocks → plane
        plane = pix.reshape(c["bh"], c["bw"], 8, 8).transpose(
            0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        planes.append(plane)

    h, w = frame["h"], frame["w"]
    if len(comps) == 1:
        return planes[0][:h, :w].copy()
    if len(comps) == 4:
        # Adobe CMYK (APP14): raw stored component values, no color
        # transform — parity target autotest/gdrivers/jpeg.py:308-356
        return np.stack([p[:h, :w] for p in planes], axis=-1)

    # upsample chroma to full resolution (libjpeg fancy triangle filter)
    full = []
    for c, plane in zip(comps, planes):
        fx, fy = hmax // c["h"], vmax // c["v"]
        # crop MCU padding to the true downsampled size FIRST — the
        # fancy-upsample edge rules must fire at downsampled_width/height
        # (libjpeg semantics), not at the padded block boundary
        dw = -(-w * c["h"] // hmax)
        dh = -(-h * c["v"] // vmax)
        p = plane[:dh, :dw]
        if fx == 2 and fy == 2:      # h2v2 fancy (4:2:0)
            p = _upsample2_h_sums(_upsample2_v_fancy(p))
        elif fx == 2 and fy == 1:    # h2v1 fancy (4:2:2)
            p = _upsample2_h_fancy(p)
        else:                        # plain replication for odd factors
            if fy != 1:
                p = np.repeat(p, fy, axis=0)
            if fx != 1:
                p = np.repeat(p, fx, axis=1)
        full.append(p[:h, :w])
    return _ycc_to_rgb(full[0], full[1], full[2],
                       precision=frame.get("prec", 8))


def _decode_lossless(frame, scomps, huff, px, pt, entropy,
                     restart_interval):
    """Lossless JPEG (SOF3, ITU T.81 Annex H) — Huffman-coded
    prediction residuals, no DCT.

    Predictors 0-7 per H.1.2.1; point transform Pt shifts the output
    left by Pt; differences are modulo 2^16.  Reference consumers:
    ``frmts/jpeg`` via libjpeg-turbo lossless
    (autotest/gdrivers/jpeg.py byte_lossless.jpg, published band
    checksum 4672).  Restart markers reset the predictor state.
    Components must be 1x1-sampled (the only layout the reference
    fixtures use; interleaved MCU = one sample per component)."""
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless JPEG with subsampled components")
    if len(scomps) != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan lossless JPEG")
    prec = frame["prec"]
    h, w, nc = frame["h"], frame["w"], len(comps)
    luts = []
    for sc in scomps:
        t = huff.get((0, sc["td"]))
        if t is None:
            raise ValueError("missing lossless Huffman table")
        luts.append(t.lut)
    br = _BitReader(entropy)
    out = np.zeros((nc, h, w), dtype=np.int64)
    default = 1 << (prec - pt - 1)
    samples_since_restart = 0
    ry, rx = 0, 0         # raster position where the current restart
    for y in range(h):    # interval began (scan start counts as one)
        for x in range(w):
            if restart_interval and samples_since_restart \
                    == restart_interval:
                # RSTn bytes were stripped by _unstuff; realign and
                # restart prediction as at scan start (T.81 H.1.1:
                # first sample uses the default, the rest of that
                # line uses Ra)
                br.align()
                samples_since_restart = 0
                ry, rx = y, x
            for ci in range(nc):
                s = br.huff(luts[ci])
                if s == 16:
                    diff = 32768
                elif s == 0:
                    diff = 0
                else:
                    diff = _extend(br.bits(s), s)
                plane = out[ci]
                if y == ry and x == rx:
                    pred = default
                elif y == ry:
                    pred = plane[y, x - 1]
                elif x == 0:
                    pred = plane[y - 1, 0]
                else:
                    ra = plane[y, x - 1]
                    rb = plane[y - 1, x]
                    rc = plane[y - 1, x - 1]
                    if px == 1:
                        pred = ra
                    elif px == 2:
                        pred = rb
                    elif px == 3:
                        pred = rc
                    elif px == 4:
                        pred = ra + rb - rc
                    elif px == 5:
                        pred = ra + ((rb - rc) >> 1)
                    elif px == 6:
                        pred = rb + ((ra - rc) >> 1)
                    elif px == 7:
                        pred = (ra + rb) >> 1
                    else:                       # px == 0: no prediction
                        pred = default
                plane[y, x] = (pred + diff) & 0xFFFF
            samples_since_restart += 1
    out = (out << pt) & ((1 << 16) - 1)
    if prec <= 8:
        out = out.astype(np.uint8)
    else:
        out = out.astype(np.uint16)
    if nc == 1:
        return out[0]
    return np.transpose(out, (1, 2, 0))


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment (pads
    with 1-bits past the end, mirroring libjpeg's marker-stop fill)."""
    __slots__ = ("buf", "n", "pos", "acc", "nbits")

    def __init__(self, buf):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bits(self, k):
        while self.nbits < k:
            self.acc = (self.acc << 8) | (self.buf[self.pos]
                                          if self.pos < self.n else 0xFF)
            self.pos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, lut):
        while self.nbits < 16:
            self.acc = (self.acc << 8) | (self.buf[self.pos]
                                          if self.pos < self.n else 0xFF)
            self.pos += 1
            self.nbits += 8
        packed = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if packed == 0:
            raise ValueError("invalid Huffman code")
        self.nbits -= packed >> 8
        self.acc &= (1 << self.nbits) - 1
        return packed & 0xFF

    def align(self):
        drop = self.nbits & 7
        self.nbits -= drop
        self.acc &= (1 << self.nbits) - 1

    def check_overrun(self):
        if self.pos > self.n + 512:
            raise ValueError("truncated JPEG entropy stream")


def _init_coef_grids(frame):
    """Per-component coefficient planes + block-grid dims shared by the
    progressive and baseline multi-scan decoders: MCU-padded storage
    (bw/bh) plus the component's own non-interleaved scan dims
    (wb1/hb1)."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        c["wb1"] = -(-cw // 8)
        c["hb1"] = -(-chh // 8)
    return {c["id"]: c for c in comps}, mcux, mcuy


def _decode_progressive(frame, scans, qt):
    """Progressive (SOF2) coefficient accumulation across scans.

    Spectral selection + successive approximation per ITU T.81 Annex G
    (libjpeg ``jdphuff.c`` semantics): DC-first scans store diffs
    ``<< Al``, DC refinements OR one bit per block into bit ``Al``
    (two's complement makes this exact for negative values), AC-first
    scans run EOB-run logic within the ``[Ss, Se]`` band, AC
    refinements append correction bits to already-nonzero coefficients
    while placing new ±(1<<Al) values at zero-history positions."""
    byid, mcux, mcuy = _init_coef_grids(frame)
    for s in scans:
        if s["ss"] == 0:
            _scan_dc(s, byid, mcux, mcuy)
        else:
            _scan_ac(s, byid)
    return _reconstruct(frame, frame["comps"], qt)


def _decode_baseline_scans(frame, scans, qt):
    """Baseline (SOF0/1) frame coded as MULTIPLE scans — the
    non-interleaved layout libjpeg emits for custom baseline scan
    scripts.  Each scan carries full DC+AC for its component(s) over
    the component's own block grid."""
    byid, mcux, mcuy = _init_coef_grids(frame)
    for s in scans:
        _scan_baseline_full(s, byid, mcux, mcuy)
    return _reconstruct(frame, frame["comps"], qt)


def _block_baseline(br, blk, dc_lut, ac_lut, pred):
    """One full baseline DC+AC block decode (zigzag order)."""
    sz = br.huff(dc_lut)
    if sz:
        pred += _extend(br.bits(sz), sz)
    blk[0] = pred
    k = 1
    while k < 64:
        rs = br.huff(ac_lut)
        r, s_ = rs >> 4, rs & 15
        if s_ == 0:
            if rs == 0xF0:
                k += 16
                continue
            break
        k += r
        if k > 63:
            break
        blk[k] = _extend(br.bits(s_), s_)
        k += 1
    return pred


def _scan_baseline_full(s, byid, mcux, mcuy):
    sc = s["comps"]
    br = _BitReader(s["entropy"])
    ri = s["ri"]
    if len(sc) == 1:
        c = byid[sc[0]["cs"]]
        dc_lut = s["tabs"][("dc", sc[0]["cs"])]
        ac_lut = s["tabs"][("ac", sc[0]["cs"])]
        pred = 0
        since = 0
        for byy in range(c["hb1"]):
            br.check_overrun()
            for bxx in range(c["wb1"]):
                if ri and since == ri:
                    br.align()
                    pred = 0
                    since = 0
                since += 1
                pred = _block_baseline(
                    br, c["coef"][byy * c["bw"] + bxx], dc_lut, ac_lut,
                    pred)
        return
    members = [byid[x["cs"]] for x in sc]
    dcl = [s["tabs"][("dc", x["cs"])] for x in sc]
    acl = [s["tabs"][("ac", x["cs"])] for x in sc]
    preds = [0] * len(sc)
    since = 0
    for my in range(mcuy):
        br.check_overrun()
        for mx in range(mcux):
            if ri and since == ri:
                br.align()
                preds = [0] * len(sc)
                since = 0
            since += 1
            for ci, c in enumerate(members):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bi = (my * c["v"] + by) * c["bw"] \
                            + mx * c["h"] + bx
                        preds[ci] = _block_baseline(
                            br, c["coef"][bi], dcl[ci], acl[ci],
                            preds[ci])


def _scan_dc(s, byid, mcux, mcuy):
    sc = s["comps"]
    first = s["ah"] == 0
    al = s["al"]
    br = _BitReader(s["entropy"])
    ri = s["ri"]
    if len(sc) > 1:
        # interleaved MCU order (all frame components present)
        members = [byid[x["cs"]] for x in sc]
        luts = [s["tabs"][("dc", x["cs"])] for x in sc]
        preds = [0] * len(sc)
        since = 0
        for my in range(mcuy):
            br.check_overrun()
            for mx in range(mcux):
                if ri and since == ri:
                    br.align()
                    preds = [0] * len(sc)
                    since = 0
                since += 1
                for ci, c in enumerate(members):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * c["bw"] \
                                + mx * c["h"] + bx
                            preds[ci] = _dc_unit(
                                br, c["coef"], bi, luts[ci], preds[ci],
                                first, al)
        return
    c = byid[sc[0]["cs"]]
    lut = s["tabs"][("dc", sc[0]["cs"])]
    pred = 0
    since = 0
    for byy in range(c["hb1"]):
        br.check_overrun()
        for bxx in range(c["wb1"]):
            if ri and since == ri:
                br.align()
                pred = 0
                since = 0
            since += 1
            bi = byy * c["bw"] + bxx
            pred = _dc_unit(br, c["coef"], bi, lut, pred, first, al)


def _dc_unit(br, coef, bi, lut, pred, first, al):
    if first:
        sz = br.huff(lut)
        if sz:
            v = br.bits(sz)
            pred += _extend(v, sz)
        coef[bi, 0] = pred << al
        return pred
    if br.bits(1):
        coef[bi, 0] |= (1 << al)
    return pred


def _scan_ac(s, byid):
    if len(s["comps"]) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = byid[s["comps"][0]["cs"]]
    lut = s["tabs"][("ac", s["comps"][0]["cs"])]
    ss, se, al = s["ss"], s["se"], s["al"]
    first = s["ah"] == 0
    br = _BitReader(s["entropy"])
    ri = s["ri"]
    eobrun = 0
    since = 0
    p1 = 1 << al
    m1 = -(1 << al)
    coef = c["coef"]
    for byy in range(c["hb1"]):
        br.check_overrun()
        for bxx in range(c["wb1"]):
            if ri and since == ri:
                br.align()
                eobrun = 0
                since = 0
            since += 1
            blk = coef[byy * c["bw"] + bxx]
            if first:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(lut)
                    r, sz = rs >> 4, rs & 15
                    if sz == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        break
                    blk[k] = _extend(br.bits(sz), sz) << al
                    k += 1
            else:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.huff(lut)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            val = 0     # ZRL: skip 16 zero-history
                        else:
                            val = p1 if br.bits(1) else m1
                        while k <= se:
                            cv = int(blk[k])
                            if cv != 0:
                                if br.bits(1) and (cv & p1) == 0:
                                    blk[k] = cv + (p1 if cv >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        cv = int(blk[k])
                        if cv != 0:
                            if br.bits(1) and (cv & p1) == 0:
                                blk[k] = cv + (p1 if cv >= 0 else m1)
                        k += 1
                    eobrun -= 1


def _upsample2_h_fancy(p):
    """libjpeg h2v1 fancy upsample: out pairs weighted 3:1 with rounding
    +1/+2 (jdsample.c h2v1_fancy_upsample)."""
    p32 = p.astype(np.int32)
    left = np.empty_like(p32)
    right = np.empty_like(p32)
    left[:, 0] = p32[:, 0]
    left[:, 1:] = p32[:, :-1]
    right[:, -1] = p32[:, -1]
    right[:, :-1] = p32[:, 1:]
    out = np.empty((p.shape[0], p.shape[1] * 2), dtype=np.int32)
    out[:, 0::2] = (p32 * 3 + left + 1) >> 2
    out[:, 1::2] = (p32 * 3 + right + 2) >> 2
    # exact edge behavior: first/last output copy the edge sample
    out[:, 0] = p32[:, 0]
    out[:, -1] = p32[:, -1]
    return out          # int32; values fit any JPEG precision


def _upsample2_v_fancy(p):
    """libjpeg vertical half of h2v2 fancy upsample: 3:1 blend of the
    nearer/farther input rows with +1/+2 rounding (jdsample.c
    h2v2_fancy_upsample vertical pass; the horizontal pass then runs
    on 16-bit sums — we fold its rounding into _h2v2 below)."""
    p32 = p.astype(np.int32)
    up = np.empty_like(p32)
    dn = np.empty_like(p32)
    up[0] = p32[0]
    up[1:] = p32[:-1]
    dn[-1] = p32[-1]
    dn[:-1] = p32[1:]
    out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=np.int32)
    out[0::2] = p32 * 3 + up     # 16-bit column sums (scaled by 4)
    out[1::2] = p32 * 3 + dn
    return out  # NOTE: scaled ×4; _upsample2_h_sums finishes it


def _upsample2_h_sums(sums):
    """Horizontal half of h2v2 fancy upsample over ×4-scaled column sums:
    out[2i] = (3*s[i] + s[i-1] + 8) >> 4, out[2i+1] = (3*s[i] + s[i+1]
    + 7) >> 4; edges use (s*4 + 8) >> 4 (jdsample.c)."""
    left = np.empty_like(sums)
    right = np.empty_like(sums)
    left[:, 0] = sums[:, 0]
    left[:, 1:] = sums[:, :-1]
    right[:, -1] = sums[:, -1]
    right[:, :-1] = sums[:, 1:]
    out = np.empty((sums.shape[0], sums.shape[1] * 2), dtype=np.int32)
    out[:, 0::2] = (sums * 3 + left + 8) >> 4
    out[:, 1::2] = (sums * 3 + right + 7) >> 4
    out[:, 0] = (sums[:, 0] * 4 + 8) >> 4
    out[:, -1] = (sums[:, -1] * 4 + 7) >> 4
    return out          # int32; values fit any JPEG precision


def _ycc_to_rgb(y, cb, cr, precision=8):
    """libjpeg integer YCbCr→RGB (jdcolor.c, SCALEBITS=16); chroma
    centered at 2^(P-1), output clamped to [0, 2^P - 1]."""
    center = 1 << (precision - 1)
    maxval = (1 << precision) - 1
    yl = y.astype(np.int32)
    cb = cb.astype(np.int32) - center
    cr = cr.astype(np.int32) - center
    half = 1 << 15
    r = yl + ((91881 * cr + half) >> 16)            # FIX(1.40200)
    b = yl + ((116130 * cb + half) >> 16)           # FIX(1.77200)
    g = yl + ((-22554 * cb - 46802 * cr + half) >> 16)
    out = np.clip(np.stack([r, g, b], axis=-1), 0, maxval)
    return out.astype(np.uint8 if precision == 8 else np.uint16)


# ---------------------------------------------------------------- encode

# Annex K luminance/chrominance base quantization tables
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32)

# spec "typical" Huffman tables (K.3)
_DC_L_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_SYMS = list(range(12))
_DC_C_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_SYMS = list(range(12))
_AC_L_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_C_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_SYMS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _enc_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


_DCT_BASIS = None


def _dct_mat():
    global _DCT_BASIS
    if _DCT_BASIS is None:
        k = np.arange(8)
        basis = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
        basis *= np.where(k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
        _DCT_BASIS = basis
    return _DCT_BASIS


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.nb += length
        while self.nb >= 8:
            byte = (self.acc >> (self.nb - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nb -= 8
        self.acc &= (1 << self.nb) - 1

    def flush(self):
        if self.nb:
            pad = 8 - self.nb
            self.put((1 << pad) - 1, pad)

    def restart(self, idx):
        # byte-align with 1-bits, then emit RSTn (n cycles 0..7) —
        # written raw, NOT byte-stuffed (it IS a marker)
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _magnitude(v):
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _quality_scale(q):
    q = max(1, min(100, int(q)))
    return 5000 // q if q < 50 else 200 - q * 2


def _plane_blocks(p, q, bw, bh):
    """Pad plane to (bh*8, bw*8), forward-DCT, quantize, zigzag →
    (bh*bw, 64) int32 in zigzag order."""
    h, w = p.shape
    A = _dct_mat()
    pad = np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,uvjk,lk->uvil", A, blocks, A)
    qz = np.round(coef / q.reshape(8, 8)).astype(np.int32)
    return qz.reshape(bh * bw, 64)[:, ZIGZAG]


def _encode_block(bwr, blk, pred, dct, act):
    diff = int(blk[0]) - pred
    s, code = _magnitude(diff)
    hc, hl = dct[s]
    bwr.put(hc, hl)
    if s:
        bwr.put(code, s)
    nz = np.nonzero(blk[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    run = 0
    k = 1
    while k <= last_nz:
        v = int(blk[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            hc, hl = act[0xF0]
            bwr.put(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = act[(run << 4) | s]
        bwr.put(hc, hl)
        bwr.put(code, s)
        run = 0
        k += 1
    if last_nz < 63:
        hc, hl = act[0x00]
        bwr.put(hc, hl)
    return int(blk[0])


def encode_jpeg(arr, quality=85, subsample="420", restart_interval=0):
    """Encode uint8 (h, w) or (h, w, 3) RGB → baseline JPEG bytes.

    RGB uses 4:2:0 chroma subsampling by default (``subsample="444"``
    for full-resolution chroma); Annex-K tables scaled by ``quality``.
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that many MCUs (byte-aligned, DC predictors reset — ITU T.81
    §E.1.4 / libjpeg ``jpeg_set_restart_interval`` semantics).
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    scale = _quality_scale(quality)
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    sub2 = (not gray) and subsample == "420"

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
    else:
        rf = arr[..., 0].astype(np.float64)
        gf = arr[..., 1].astype(np.float64)
        bf = arr[..., 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        if sub2:
            he, we = h + (h & 1), w + (w & 1)
            cb = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            cr = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cb.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    dc_l = _enc_codes(_DC_L_COUNTS, _DC_L_SYMS)
    ac_l = _enc_codes(_AC_L_COUNTS, _AC_L_SYMS)
    dc_c = _enc_codes(_DC_C_COUNTS, _DC_C_SYMS)
    ac_c = _enc_codes(_AC_C_COUNTS, _AC_C_SYMS)
    bwr = _BitWriter()

    if sub2:
        mcux, mcuy = -(-w // 16), -(-h // 16)
        yb = _plane_blocks(planes[0], ql, mcux * 2, mcuy * 2)
        cbb = _plane_blocks(planes[1], qc, mcux, mcuy)
        crb = _plane_blocks(planes[2], qc, mcux, mcuy)
        py = pcb = pcr = 0
        ybw = mcux * 2
        ri = int(restart_interval)
        nmcu = nrst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and nmcu == ri:
                    bwr.restart(nrst)
                    nrst += 1
                    nmcu = 0
                    py = pcb = pcr = 0
                nmcu += 1
                for by in range(2):
                    for bx in range(2):
                        blk = yb[(my * 2 + by) * ybw + mx * 2 + bx]
                        py = _encode_block(bwr, blk, py, dc_l, ac_l)
                pcb = _encode_block(bwr, cbb[my * mcux + mx], pcb,
                                    dc_c, ac_c)
                pcr = _encode_block(bwr, crb[my * mcux + mx], pcr,
                                    dc_c, ac_c)
        samps = [0x22, 0x11, 0x11]
    else:
        bw_, bh_ = -(-w // 8), -(-h // 8)
        qts = [ql] if gray else [ql, qc, qc]
        comp_coefs = [_plane_blocks(p, q, bw_, bh_)
                      for p, q in zip(planes, qts)]
        preds = [0] * len(planes)
        ri = int(restart_interval)
        nmcu = nrst = 0
        for bi in range(bh_ * bw_):
            if ri and nmcu == ri:
                bwr.restart(nrst)
                nrst += 1
                nmcu = 0
                preds = [0] * len(planes)
            nmcu += 1
            for ci in range(len(planes)):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                preds[ci] = _encode_block(bwr, comp_coefs[ci][bi],
                                          preds[ci], dct, act)
        samps = [0x11] * len(planes)
    bwr.flush()

    ncomp = len(planes)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    compspec = b""
    for ci in range(ncomp):
        compspec += bytes([ci + 1, samps[ci], 0 if ci == 0 else 1])
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + compspec)

    def dht(tc, th, counts, syms):
        return seg(0xC4, bytes([(tc << 4) | th] + counts + syms))

    out += dht(0, 0, _DC_L_COUNTS, _DC_L_SYMS)
    out += dht(1, 0, _AC_L_COUNTS, _AC_L_SYMS)
    if not gray:
        out += dht(0, 1, _DC_C_COUNTS, _DC_C_SYMS)
        out += dht(1, 1, _AC_C_COUNTS, _AC_C_SYMS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", int(restart_interval)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith(arr, quality=85, subsample="420"):
    """Encode uint8 gray/RGB → sequential arithmetic-coded JPEG
    (SOF9 + DAC), T.81 Annexes D/F via raydal/io/jpeg_arith.py.

    Same DCT/quantization pipeline as :func:`encode_jpeg`, so the
    Huffman and arithmetic encodings of an image decode to identical
    pixels; entropy streams are byte-exact against libjpeg-turbo over
    identical coefficients (tests/test_jpeg_arith.py)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_arith expects uint8")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    scale = _quality_scale(quality)
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    sub2 = (not gray) and subsample == "420"

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
    else:
        rf = arr[..., 0].astype(np.float64)
        gf = arr[..., 1].astype(np.float64)
        bf = arr[..., 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        if sub2:
            he, we = h + (h & 1), w + (w & 1)
            cb = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            cr = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cb.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    enc = JA.ArithEncoder()
    fixed = bytearray([JA.FIXED_BIN])
    # statistics per conditioning table (0 = luma, 1 = chroma)
    dc_stats = {}
    ac_stats = {}
    states = []
    for ci in range(len(planes)):
        tbl = 0 if ci == 0 else 1
        cs = JA._CompState()
        cs.dc_st = dc_stats.setdefault(tbl, bytearray(JA.DC_STAT_BINS))
        cs.ac_st = ac_stats.setdefault(tbl, bytearray(JA.AC_STAT_BINS))
        states.append(cs)

    def put(ci, blk):
        cs = states[ci]
        JA.dc_encode(enc, cs, int(blk[0]) - cs.last_dc, 0, 1)
        cs.last_dc = int(blk[0])
        JA.ac_encode(enc, cs, blk, 5, fixed)

    if sub2:
        mcux, mcuy = -(-w // 16), -(-h // 16)
        yb = _plane_blocks(planes[0], ql, mcux * 2, mcuy * 2)
        cbb = _plane_blocks(planes[1], qc, mcux, mcuy)
        crb = _plane_blocks(planes[2], qc, mcux, mcuy)
        ybw = mcux * 2
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        put(0, yb[(my * 2 + by) * ybw + mx * 2 + bx])
                put(1, cbb[my * mcux + mx])
                put(2, crb[my * mcux + mx])
        samps = [0x22, 0x11, 0x11]
    else:
        bw_, bh_ = -(-w // 8), -(-h // 8)
        qts = [ql] if gray else [ql, qc, qc]
        comp_coefs = [_plane_blocks(p, q, bw_, bh_)
                      for p, q in zip(planes, qts)]
        for bi in range(bh_ * bw_):
            for ci in range(len(planes)):
                put(ci, comp_coefs[ci][bi])
        samps = [0x11] * len(planes)
    body = enc.flush()

    ncomp = len(planes)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker,
                           len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    compspec = b""
    for ci in range(ncomp):
        compspec += bytes([ci + 1, samps[ci], 0 if ci == 0 else 1])
    out += seg(0xC9, struct.pack(">BHHB", 8, h, w, ncomp) + compspec)
    # DAC: DC table(s) L=0/U=1 (0x10), AC table(s) Kx=5
    dac = bytes([0x00, 0x10, 0x10, 0x05])
    if not gray:
        dac += bytes([0x01, 0x10, 0x11, 0x05])
    out += seg(0xCC, dac)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def _optimal_huffman(freq):
    """JPEG optimal Huffman table from symbol frequencies — the
    Annex K.2 / libjpeg ``jpeg_gen_optimal_table`` procedure (merge
    two least-frequent, track code sizes, fold lengths > 16 down via
    the prefix-stealing adjustment, drop the reserved all-ones slot).
    Returns (counts[16], symbols) in canonical order."""
    freq = dict(freq)
    freq[256] = 1                       # reserved: ensures no all-ones
    codesize = {}
    others = {s: None for s in freq}
    f = {s: int(v) for s, v in freq.items() if v > 0}
    while len(f) > 1:
        # two smallest (ties: larger symbol value first, per libjpeg)
        c1 = min(f, key=lambda s: (f[s], -s))
        f1 = f.pop(c1)
        c2 = min(f, key=lambda s: (f[s], -s))
        f[c2] += f1
        # bump codesize along both chains, link c2's chain to c1
        v = c2
        while v is not None:
            codesize[v] = codesize.get(v, 0) + 1
            last = v
            v = others[v]
        others[last] = c1
        v = c1
        while v is not None:
            codesize[v] = codesize.get(v, 0) + 1
            v = others[v]
    bits = [0] * (max(codesize.values()) + 1)
    for s, size in codesize.items():
        bits[size] += 1
    # limit code lengths to 16 (jpeg_gen_optimal_table's back-off)
    i = len(bits) - 1
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while i > 0 and bits[i] == 0:
        i -= 1
    bits[i] -= 1                        # remove the reserved symbol
    symbols = sorted((s for s in codesize if s != 256),
                     key=lambda s: (codesize[s], s))
    counts = (bits[1:] + [0] * 16)[:16]
    return counts, symbols


def _collect_block_stats(blocks, dc_freq, ac_freq):
    """Pass-1 symbol statistics over (N, 64) zigzag blocks."""
    pred = 0
    for blk in blocks:
        s, _ = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        dc_freq[s] = dc_freq.get(s, 0) + 1
        nz = np.nonzero(blk[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        run = 0
        k = 1
        while k <= last_nz:
            v = int(blk[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
                run -= 16
            s, _ = _magnitude(v)
            sym = (run << 4) | s
            ac_freq[sym] = ac_freq.get(sym, 0) + 1
            run = 0
            k += 1
        if last_nz < 63:
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1


def encode_jpeg12(arr, quality=85):
    """Encode uint16 (h, w) [or (h, w, C≤4), 1x1 sampling] 12-bit data
    → extended-sequential (SOF1) JPEG bytes.

    Mirrors a ``BITS_IN_JSAMPLE == 12`` libjpeg build: level shift
    2048, Annex-K tables scaled by quality, and per-image OPTIMAL
    Huffman tables (libjpeg forces ``optimize_coding`` for > 8-bit
    precision because the fixed 8-bit tables cannot express the larger
    magnitude categories).  Reference consumer parity target:
    ``autotest/gdrivers/jpeg.py`` test_jpeg_11 (12-bit create)."""
    a = np.asarray(arr)
    if a.dtype != np.uint16:
        raise ValueError("encode_jpeg12 expects uint16")
    if a.max() > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    if a.ndim == 3 and a.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg12 writes 1 (gray) or 3 (RGB) "
                         "channels")
    if a.ndim == 2 or a.shape[2] == 1:
        gray = a if a.ndim == 2 else a[:, :, 0]
        planes = [gray.astype(np.float64) - 2048.0]
    else:
        # decoders (ours and libjpeg) apply YCbCr→RGB to every
        # 3-component scan, so RGB input MUST be converted here —
        # same BT.601 matrix as the 8-bit encoder, chroma centered at
        # 2048 for 12-bit precision
        rf = a[:, :, 0].astype(np.float64)
        gf = a[:, :, 1].astype(np.float64)
        bf = a[:, :, 2].astype(np.float64)
        planes = [
            0.299 * rf + 0.587 * gf + 0.114 * bf - 2048.0,
            -0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            0.5 * rf - 0.418688 * gf - 0.081312 * bf]
    h, w = a.shape[:2]
    scale = _quality_scale(quality)
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    comp_blocks = [_plane_blocks(p, ql, bw_, bh_) for p in planes]

    dc_freq, ac_freq = {}, {}
    for blocks in comp_blocks:
        _collect_block_stats(blocks, dc_freq, ac_freq)
    dc_counts, dc_syms = _optimal_huffman(dc_freq)
    ac_counts, ac_syms = _optimal_huffman(ac_freq)
    dct = _enc_codes(dc_counts, dc_syms)
    act = _enc_codes(ac_counts, ac_syms)

    bwr = _BitWriter()
    preds = [0] * len(planes)
    for bi in range(bh_ * bw_):
        for ci in range(len(planes)):
            preds[ci] = _encode_block(bwr, comp_blocks[ci][bi],
                                      preds[ci], dct, act)
    bwr.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) \
            + payload

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    compspec = b"".join(bytes([ci + 1, 0x11, 0]) for ci in range(ncomp))
    out += seg(0xC1, struct.pack(">BHHB", 12, h, w, ncomp) + compspec)
    out += seg(0xC4, bytes([0x00] + dc_counts + dc_syms))
    out += seg(0xC4, bytes([0x10] + ac_counts + ac_syms))
    sos = bytes([ncomp]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(ncomp))
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_lossless(arr, predictor=1, restart_interval=0):
    """Encode (h, w) or (h, w, C≤4) integer data → LOSSLESS (SOF3)
    JPEG bytes — decode reproduces the input bit-exactly.

    T.81 Annex H predictive coding with a per-image optimal Huffman
    table; precision derives from the dtype (uint8 → 8, uint16 → 16).
    The reversibility contract matches the reference's
    COMPRESSION_REVERSIBILITY=LOSSLESS metadata for SOF3 streams
    (autotest/gdrivers/jpeg.py byte_lossless.jpg).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that many samples, with T.81 H.1.1 predictor resets."""
    a = np.asarray(arr)
    if a.dtype == np.uint8:
        prec = 8
    elif a.dtype == np.uint16:
        prec = 16 if a.max() > 4095 else 12
    else:
        raise ValueError("encode_jpeg_lossless expects uint8/uint16")
    if a.ndim == 2:
        chans = [a.astype(np.int64)]
    else:
        chans = [a[:, :, c].astype(np.int64) for c in range(a.shape[2])]
    h, w = a.shape[:2]
    px = int(predictor)
    if not 1 <= px <= 7:
        raise ValueError("predictor must be 1..7")

    # vectorized prediction per plane (pass 1 computes all diffs);
    # restart intervals need per-sample reset state, so they take the
    # serial path below instead
    default = 1 << (prec - 1)
    ri = int(restart_interval)
    diffs = []
    for p in (chans if not ri else []):
        ra = np.empty_like(p)
        ra[:, 1:] = p[:, :-1]
        rb = np.empty_like(p)
        rb[1:, :] = p[:-1, :]
        rc = np.empty_like(p)
        rc[1:, 1:] = p[:-1, :-1]
        if px == 1:
            pred = ra
        elif px == 2:
            pred = rb
        elif px == 3:
            pred = rc
        elif px == 4:
            pred = ra + rb - rc
        elif px == 5:
            pred = ra + ((rb - rc) >> 1)
        elif px == 6:
            pred = rb + ((ra - rc) >> 1)
        else:
            pred = (ra + rb) >> 1
        pred[0, 1:] = p[0, :-1]         # first line: Ra
        pred[1:, 0] = p[:-1, 0]         # first column: Rb
        pred[0, 0] = default
        d = p - pred
        # modulo 2^16 into the symmetric range the category code expects
        d = ((d + (1 << 15)) & 0xFFFF) - (1 << 15)
        diffs.append(d)

    if ri:
        if len(chans) > 1:
            raise NotImplementedError(
                "restart_interval with multi-channel lossless")
        # restart-reset prediction, per-sample (T.81 H.1.1)
        for p in chans:
            d = np.empty_like(p)
            n_since = 0
            rY, rX = 0, 0
            for y in range(h):
                for x in range(w):
                    if n_since == ri:
                        n_since = 0
                        rY, rX = y, x
                    if y == rY and x == rX:
                        pred = default
                    elif y == rY:
                        pred = p[y, x - 1]
                    elif x == 0:
                        pred = p[y - 1, 0]
                    else:
                        ra, rb, rc = p[y, x - 1], p[y - 1, x], \
                            p[y - 1, x - 1]
                        pred = (ra if px == 1 else rb if px == 2
                                else rc if px == 3
                                else ra + rb - rc if px == 4
                                else ra + ((rb - rc) >> 1) if px == 5
                                else rb + ((ra - rc) >> 1) if px == 6
                                else (ra + rb) >> 1)
                    dd = int(p[y, x]) - int(pred)
                    d[y, x] = ((dd + (1 << 15)) & 0xFFFF) - (1 << 15)
                    n_since += 1
            diffs.append(d)
    freq = {}
    cats = []
    for d in diffs:
        ad = np.abs(d)
        cat = np.zeros(d.shape, dtype=np.int32)
        nz = ad > 0
        cat[nz] = np.floor(np.log2(ad[nz])).astype(np.int32) + 1
        cat[d == -32768] = 16
        cats.append(cat)
        u, c = np.unique(cat, return_counts=True)
        for s, n in zip(u.tolist(), c.tolist()):
            freq[s] = freq.get(s, 0) + n
    counts, syms = _optimal_huffman(freq)
    lut = _enc_codes(counts, syms)

    bwr = _BitWriter()
    nc = len(chans)
    n_since = 0
    nrst = 0
    for y in range(h):
        for x in range(w):
            if ri and n_since == ri:
                bwr.restart(nrst)
                nrst += 1
                n_since = 0
            for ci in range(nc):
                s = int(cats[ci][y, x])
                hc, hl = lut[s]
                bwr.put(hc, hl)
                if 0 < s < 16:
                    v = int(diffs[ci][y, x])
                    code = v if v > 0 else v + (1 << s) - 1
                    bwr.put(code, s)
            n_since += 1
    bwr.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) \
            + payload

    out = bytearray(b"\xff\xd8")
    compspec = b"".join(bytes([ci + 1, 0x11, 0]) for ci in range(nc))
    out += seg(0xC3, struct.pack(">BHHB", prec, h, w, nc) + compspec)
    out += seg(0xC4, bytes([0x00] + counts + syms))
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00])
                                 for ci in range(nc))
    sos += bytes([px, 0, 0])            # Ss=predictor, Se=0, Ah/Al=0
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


def _collect_dc_stats(comp_blocks, dc_freq):
    for blocks in comp_blocks:
        pred = 0
        for blk in blocks:
            s, _ = _magnitude(int(blk[0]) - pred)
            pred = int(blk[0])
            dc_freq[s] = dc_freq.get(s, 0) + 1


def _ac_scan_symbols(blocks):
    """Yield the (symbol, extra_bits_value, extra_bits_len) stream of a
    progressive AC scan (Ss=1, Se=63, Al=0) with EOB-run coding
    (T.81 G.1.2.2)."""
    out = []
    eobrun = 0

    def flush_eob():
        # one EOBn covers the whole run: eobrun is capped at 32767
        # below, representable by a single EOB14 (r extra bits carry
        # eobrun - 2^r)
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            out.append((r << 4, eobrun - (1 << r), r))
            eobrun = 0

    for blk in blocks:
        nz = np.nonzero(blk[1:])[0]
        if len(nz) == 0:
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
            continue
        if eobrun:
            flush_eob()
        last_nz = nz[-1] + 1
        run = 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                out.append((0xF0, 0, 0))
                run -= 16
            s, code = _magnitude(v)
            out.append(((run << 4) | s, code, s))
            run = 0
        if last_nz < 63:
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
    if eobrun:
        flush_eob()
    return out


def encode_jpeg_progressive(arr, quality=85):
    """Encode uint8 (h, w) gray or (h, w, 3) RGB → PROGRESSIVE (SOF2)
    JPEG: one interleaved DC scan (Ss=0..0) then one full AC scan
    (Ss=1..63, EOB-run coded) per component, no successive
    approximation, 4:4:4 sampling, per-scan optimal Huffman tables.

    Round-trip property: the quantized coefficients are identical to
    the baseline encoder's, so our progressive decoder (differential-
    tested bit-exact vs compiled IJG libjpeg) reconstructs the SAME
    pixels as decoding the baseline encoding."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    scale = _quality_scale(quality)
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    if gray:
        planes = [a.astype(np.float64) - 128.0]
        qts = [ql]
    else:
        rf = a[..., 0].astype(np.float64)
        gf = a[..., 1].astype(np.float64)
        bf = a[..., 2].astype(np.float64)
        planes = [
            0.299 * rf + 0.587 * gf + 0.114 * bf - 128.0,
            -0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            0.5 * rf - 0.418688 * gf - 0.081312 * bf]
        qts = [ql, qc, qc]
    bw_, bh_ = -(-w // 8), -(-h // 8)
    comp_blocks = [_plane_blocks(p, q, bw_, bh_)
                   for p, q in zip(planes, qts)]

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) \
            + payload

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    compspec = b"".join(bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
                        for ci in range(ncomp))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + compspec)

    # scan 1: interleaved DC, one optimal table shared by all comps
    dc_freq = {}
    _collect_dc_stats(comp_blocks, dc_freq)
    dcc, dcs = _optimal_huffman(dc_freq)
    out += seg(0xC4, bytes([0x00] + dcc + dcs))
    dct = _enc_codes(dcc, dcs)
    bwr = _BitWriter()
    preds = [0] * ncomp
    for bi in range(bh_ * bw_):
        for ci in range(ncomp):
            blk = comp_blocks[ci][bi]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            s, code = _magnitude(diff)
            hc, hl = dct[s]
            bwr.put(hc, hl)
            if s:
                bwr.put(code, s)
    bwr.flush()
    sos = bytes([ncomp]) + b"".join(bytes([ci + 1, 0x00])
                                    for ci in range(ncomp))
    out += seg(0xDA, sos + bytes([0, 0, 0]))
    out += bwr.out

    # one AC scan per component (non-interleaved, Ss=1..63)
    for ci in range(ncomp):
        syms = _ac_scan_symbols(comp_blocks[ci])
        freq = {}
        for sym, _v, _n in syms:
            freq[sym] = freq.get(sym, 0) + 1
        acc, acs = _optimal_huffman(freq)
        out += seg(0xC4, bytes([0x10] + acc + acs))
        act = _enc_codes(acc, acs)
        bwr = _BitWriter()
        for sym, v, nbits in syms:
            hc, hl = act[sym]
            bwr.put(hc, hl)
            if nbits:
                bwr.put(v, nbits)
        bwr.flush()
        out += seg(0xDA, bytes([1, ci + 1, 0x00, 1, 63, 0]))
        out += bwr.out

    out += b"\xff\xd9"
    return bytes(out)
