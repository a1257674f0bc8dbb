"""Optional compiled fast path for the serial JPEG entropy decode.

The baseline-interleaved Huffman entropy loop is the one stage of the
image pipeline that cannot be vectorized (bit-serial data dependency).
This module carries a ~100-line C transcription of the *exact* Python
loop in ``raydal/io/jpeg.py`` and compiles it once per host with the
system C compiler into ``/tmp/raydal_native/`` (content-hashed name, so
a source change recompiles and concurrent workers share one artifact
via atomic rename).  Everything degrades gracefully: no compiler, a
failed build, or ``RAYDAL_NO_NATIVE=1`` ⇒ the pure-Python loop runs
instead, bit-for-bit identical (differential-tested in
tests/test_native_entropy.py).

This is NOT a third-party dependency — the kernel is original code in
this repo, and the Python implementation remains the reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os

_C_SRC = r"""
#include <stdint.h>

/* Baseline-interleaved JPEG entropy decode — bit-for-bit transcription
   of the Python loop in raydal/io/jpeg.py:_decode_jpeg_impl.
   Returns 0 ok, -1 invalid Huffman code, -2 truncated stream. */
int jentropy_decode(
    const uint8_t *buf, long nb,
    int mcux, int mcuy, int ncomp, int restart_interval,
    const int32_t *ch, const int32_t *cv, const int32_t *cbw,
    const int32_t *dc_luts, const int32_t *ac_luts,
    int32_t *coefs, const int64_t *coef_off)
{
    uint32_t acc = 0;
    int nbits = 0;
    long bpos = 0;
    int mcu_since_restart = 0;
    int pred[4] = {0, 0, 0, 0};
    if (ncomp > 4) return -3;
    for (int my = 0; my < mcuy; my++) {
        if (bpos > nb + 512) return -2;
        for (int mx = 0; mx < mcux; mx++) {
            if (restart_interval
                && mcu_since_restart == restart_interval) {
                nbits -= nbits & 7;
                acc &= ((uint32_t)1 << nbits) - 1;
                for (int c = 0; c < ncomp; c++) pred[c] = 0;
                mcu_since_restart = 0;
            }
            mcu_since_restart++;
            for (int c = 0; c < ncomp; c++) {
                const int32_t *dc_lut = dc_luts + (long)c * 65536;
                const int32_t *ac_lut = ac_luts + (long)c * 65536;
                int32_t *co = coefs + coef_off[c];
                int p = pred[c];
                for (int by = 0; by < cv[c]; by++) {
                    for (int bx = 0; bx < ch[c]; bx++) {
                        long base = (((long)my * cv[c] + by) * cbw[c]
                                     + (long)mx * ch[c] + bx) * 64;
                        while (nbits < 16) {
                            acc = (acc << 8)
                                | (bpos < nb ? buf[bpos] : 0xFF);
                            bpos++;
                            nbits += 8;
                        }
                        int32_t packed =
                            dc_lut[(acc >> (nbits - 16)) & 0xFFFF];
                        if (!packed) return -1;
                        nbits -= packed >> 8;
                        int s = packed & 0xFF;
                        if (s) {
                            while (nbits < s) {
                                acc = (acc << 8)
                                    | (bpos < nb ? buf[bpos] : 0xFF);
                                bpos++;
                                nbits += 8;
                            }
                            int v = (int)((acc >> (nbits - s))
                                          & (((uint32_t)1 << s) - 1));
                            nbits -= s;
                            if (v < (1 << (s - 1))) v += 1 - (1 << s);
                            p += v;
                        }
                        co[base] = p;
                        acc &= ((uint32_t)1 << nbits) - 1;
                        int k = 1;
                        while (k < 64) {
                            while (nbits < 16) {
                                acc = (acc << 8)
                                    | (bpos < nb ? buf[bpos] : 0xFF);
                                bpos++;
                                nbits += 8;
                            }
                            packed =
                                ac_lut[(acc >> (nbits - 16)) & 0xFFFF];
                            if (!packed) return -1;
                            nbits -= packed >> 8;
                            int rs = packed & 0xFF;
                            s = rs & 15;
                            if (s == 0) {
                                if (rs == 0xF0) { k += 16; continue; }
                                break;  /* EOB */
                            }
                            k += rs >> 4;
                            if (k > 63) break;
                            while (nbits < s) {
                                acc = (acc << 8)
                                    | (bpos < nb ? buf[bpos] : 0xFF);
                                bpos++;
                                nbits += 8;
                            }
                            int v = (int)((acc >> (nbits - s))
                                          & (((uint32_t)1 << s) - 1));
                            nbits -= s;
                            if (v < (1 << (s - 1))) v += 1 - (1 << s);
                            co[base + k] = v;
                            k++;
                        }
                        acc &= ((uint32_t)1 << nbits) - 1;
                    }
                }
                pred[c] = p;
            }
        }
    }
    return 0;
}
"""

def _cache_dir():
    """Per-user, mode-0700 build cache.  A world-writable shared dir
    would let another local user pre-plant a .so that we CDLL-load."""
    base = os.environ.get("XDG_CACHE_HOME") or "/tmp"
    return os.path.join(base, f"raydal_native-{os.getuid()}")


_lib = None
_tried = False


def _build():
    import stat
    import subprocess

    _DIR = _cache_dir()
    h = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    so = os.path.join(_DIR, f"jentropy_{h}.so")
    os.makedirs(_DIR, mode=0o700, exist_ok=True)
    st = os.stat(_DIR)
    if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP |
                                                  stat.S_IWOTH)):
        raise RuntimeError(f"refusing untrusted native cache dir {_DIR}")
    if not os.path.exists(so):
        cpath = os.path.join(_DIR, f"jentropy_{h}_{os.getpid()}.c")
        tmp = os.path.join(_DIR, f"jentropy_{h}_{os.getpid()}.so.tmp")
        with open(cpath, "w") as f:
            f.write(_C_SRC)
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, cpath],
            check=True, capture_output=True, timeout=60)
        os.rename(tmp, so)  # atomic publish; racers all land here
        os.unlink(cpath)
    lib = ctypes.CDLL(so)
    fn = lib.jentropy_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    return fn


def get_jentropy():
    """The compiled entropy decoder, or None (no compiler / disabled)."""
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("RAYDAL_NO_NATIVE"):
            _lib = None
        else:
            try:
                _lib = _build()
            except Exception:
                _lib = None
    return _lib
