"""CCITT Group 3 / Group 4 (ITU-T T.4 / T.6) bilevel codec, from
scratch.

Implements the fax run-length coding the reference reaches through
vendored libtiff (``frmts/gtiff/libtiff/tif_fax3.c``; NITF C1 wraps the
same bitstream, ``frmts/nitf/nitfbilevel.cpp``):

* modified Huffman (MH) 1D runs — white/black terminating + makeup
  codes per ITU-T T.4 Tables 2/3 (the code tables below are the
  published ITU constants, transcribed mechanically from the vendored
  ``t4.h`` copy of the standard),
* T.4 2D rows (EOL + tag bit, vertical/horizontal/pass modes against
  the previous row) as used by NITF ``COMRAT=2DS/2DH``,
* T.6 (G4/MMR): pure 2D coding with an all-white imaginary first
  reference row, and
* encoders for MH-1D (with EOLs) and G4 for round-trip coverage.

Convention: decoded pixel value 1 = black run, 0 = white run — the raw
bit values libtiff hands GDAL (photometric only tags interpretation).
The bit-serial decode loop is inherent to the format (same argument as
the JPEG/IMA entropy decoders elsewhere in this repo); it runs at the
per-block decode boundary only.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_g3", "decode_g4", "encode_g3_1d", "encode_g4"]

# ITU-T T.4 Tables 2/3: (bit length, code, run length).  Extended
# makeup codes (1792..2560) are shared between colors.
WHITE = [
    (8, 53, 0), (6, 7, 1), (4, 7, 2), (4, 8, 3), (4, 11, 4), (4, 12, 5),
    (4, 14, 6), (4, 15, 7), (5, 19, 8), (5, 20, 9), (5, 7, 10),
    (5, 8, 11), (6, 8, 12), (6, 3, 13), (6, 52, 14), (6, 53, 15),
    (6, 42, 16), (6, 43, 17), (7, 39, 18), (7, 12, 19), (7, 8, 20),
    (7, 23, 21), (7, 3, 22), (7, 4, 23), (7, 40, 24), (7, 43, 25),
    (7, 19, 26), (7, 36, 27), (7, 24, 28), (8, 2, 29), (8, 3, 30),
    (8, 26, 31), (8, 27, 32), (8, 18, 33), (8, 19, 34), (8, 20, 35),
    (8, 21, 36), (8, 22, 37), (8, 23, 38), (8, 40, 39), (8, 41, 40),
    (8, 42, 41), (8, 43, 42), (8, 44, 43), (8, 45, 44), (8, 4, 45),
    (8, 5, 46), (8, 10, 47), (8, 11, 48), (8, 82, 49), (8, 83, 50),
    (8, 84, 51), (8, 85, 52), (8, 36, 53), (8, 37, 54), (8, 88, 55),
    (8, 89, 56), (8, 90, 57), (8, 91, 58), (8, 74, 59), (8, 75, 60),
    (8, 50, 61), (8, 51, 62), (8, 52, 63),
    (5, 27, 64), (5, 18, 128), (6, 23, 192), (7, 55, 256), (8, 54, 320),
    (8, 55, 384), (8, 100, 448), (8, 101, 512), (8, 104, 576),
    (8, 103, 640), (9, 204, 704), (9, 205, 768), (9, 210, 832),
    (9, 211, 896), (9, 212, 960), (9, 213, 1024), (9, 214, 1088),
    (9, 215, 1152), (9, 216, 1216), (9, 217, 1280), (9, 218, 1344),
    (9, 219, 1408), (9, 152, 1472), (9, 153, 1536), (9, 154, 1600),
    (6, 24, 1664), (9, 155, 1728),
    (11, 8, 1792), (11, 12, 1856), (11, 13, 1920), (12, 18, 1984),
    (12, 19, 2048), (12, 20, 2112), (12, 21, 2176), (12, 22, 2240),
    (12, 23, 2304), (12, 28, 2368), (12, 29, 2432), (12, 30, 2496),
    (12, 31, 2560),
]
BLACK = [
    (10, 55, 0), (3, 2, 1), (2, 3, 2), (2, 2, 3), (3, 3, 4), (4, 3, 5),
    (4, 2, 6), (5, 3, 7), (6, 5, 8), (6, 4, 9), (7, 4, 10), (7, 5, 11),
    (7, 7, 12), (8, 4, 13), (8, 7, 14), (9, 24, 15), (10, 23, 16),
    (10, 24, 17), (10, 8, 18), (11, 103, 19), (11, 104, 20),
    (11, 108, 21), (11, 55, 22), (11, 40, 23), (11, 23, 24),
    (11, 24, 25), (12, 202, 26), (12, 203, 27), (12, 204, 28),
    (12, 205, 29), (12, 104, 30), (12, 105, 31), (12, 106, 32),
    (12, 107, 33), (12, 210, 34), (12, 211, 35), (12, 212, 36),
    (12, 213, 37), (12, 214, 38), (12, 215, 39), (12, 108, 40),
    (12, 109, 41), (12, 218, 42), (12, 219, 43), (12, 84, 44),
    (12, 85, 45), (12, 86, 46), (12, 87, 47), (12, 100, 48),
    (12, 101, 49), (12, 82, 50), (12, 83, 51), (12, 36, 52),
    (12, 55, 53), (12, 56, 54), (12, 39, 55), (12, 40, 56),
    (12, 88, 57), (12, 89, 58), (12, 43, 59), (12, 44, 60),
    (12, 90, 61), (12, 102, 62), (12, 103, 63),
    (10, 15, 64), (12, 200, 128), (12, 201, 192), (12, 91, 256),
    # (runs 42/43 are 0xDA/0xDB — see the block above for 26..41)
    (12, 51, 320), (12, 52, 384), (12, 53, 448), (13, 108, 512),
    (13, 109, 576), (13, 74, 640), (13, 75, 704), (13, 76, 768),
    (13, 77, 832), (13, 114, 896), (13, 115, 960), (13, 116, 1024),
    (13, 117, 1088), (13, 118, 1152), (13, 119, 1216), (13, 82, 1280),
    (13, 83, 1344), (13, 84, 1408), (13, 85, 1472), (13, 90, 1536),
    (13, 91, 1600), (13, 100, 1664), (13, 101, 1728),
    (11, 8, 1792), (11, 12, 1856), (11, 13, 1920), (12, 18, 1984),
    (12, 19, 2048), (12, 20, 2112), (12, 21, 2176), (12, 22, 2240),
    (12, 23, 2304), (12, 28, 2368), (12, 29, 2432), (12, 30, 2496),
    (12, 31, 2560),
]

_WD = {(l, c): r for l, c, r in WHITE}
_BD = {(l, c): r for l, c, r in BLACK}
_WENC = {r: (l, c) for l, c, r in WHITE}
_BENC = {r: (l, c) for l, c, r in BLACK}
_MAXLEN = 14


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0                       # bit position, MSB first

    def bits_left(self):
        return len(self.d) * 8 - self.pos

    def read(self, n):
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek(self, n):
        save = self.pos
        if self.bits_left() < n:
            v = self.read(self.bits_left()) << (n - self.bits_left())
        else:
            v = self.read(n)
        self.pos = save
        return v


def _read_run(br: _BitReader, table) -> int:
    """One MH run: makeup codes accumulate until a terminating code."""
    total = 0
    while True:
        ln = 0
        code = 0
        run = None
        while ln < _MAXLEN:
            if br.bits_left() == 0:
                raise ValueError("CCITT bitstream exhausted in run code")
            code = (code << 1) | br.read(1)
            ln += 1
            run = table.get((ln, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid CCITT run code")
        total += run
        if run < 64:
            return total


def _sync_eol(br: _BitReader) -> bool:
    """Skip fill bits and consume an EOL (eleven 0s + 1).  Returns
    False when the stream is exhausted (RTC / end of data)."""
    zeros = 0
    while br.bits_left() > 0:
        bit = br.read(1)
        if bit == 0:
            zeros += 1
            continue
        if zeros >= 11:
            return True
        # a stray 1 before 11 zeros: not at an EOL boundary — rewind
        br.pos -= 1
        return False
    return False


def _decode_1d_runs(br: _BitReader, width: int) -> list:
    """One MH row → run lengths (alternating, first run white)."""
    runs = []
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(br, _WD if color == 0 else _BD)
        runs.append(run)
        pos += run
        color ^= 1
    return runs


def _decode_2d_runs(br: _BitReader, width: int, ref: list) -> list:
    """One 2D-coded row → run lengths.  Faithful port of the reference
    run-pointer algorithm (tif_fax3.h EXPAND2D): b1 walks the reference
    RUN array incrementally (handles zero-length runs exactly), pass
    spans merge into the pending RunLength, VL steps b1 back one run."""
    cur: list = []
    a0 = 0
    run_len = 0                   # RunLength: pending pass/makeup span
    pb = 1
    b1 = ref[0] if ref else width

    def refrun(i):
        return ref[i] if i < len(ref) else 0

    def check_b1():
        nonlocal b1, pb
        if cur:
            while b1 <= a0 and b1 < width:
                if pb + 1 >= len(ref):
                    b1 = width
                    break
                b1 += refrun(pb) + refrun(pb + 1)
                pb += 2

    def setvalue(x):
        nonlocal a0, run_len
        cur.append(run_len + x)
        a0 += x
        run_len = 0

    while a0 < width:
        if br.bits_left() == 0:
            break
        bit = br.read(1)
        if bit == 1:                                 # V0
            check_b1()
            setvalue(b1 - a0)
            b1 += refrun(pb)
            pb += 1
            continue
        if br.bits_left() < 2:
            break
        b = br.read(2)
        if b == 0b11 or b == 0b10:                   # VR1 / VL1
            d = 1
        elif b == 0b01:                              # 001 horizontal
            first_black = (len(cur) & 1) == 1
            r1 = _read_run(br, _BD if first_black else _WD)
            setvalue(r1)
            r2 = _read_run(br, _WD if first_black else _BD)
            setvalue(r2)
            check_b1()
            continue
        else:                                        # 000 prefix
            if br.bits_left() == 0:
                break
            if br.read(1) == 1:                      # 0001 pass
                check_b1()
                b1 += refrun(pb)
                pb += 1
                run_len += b1 - a0
                a0 = b1
                b1 += refrun(pb)
                pb += 1
                continue
            nxt = br.read(2)
            if nxt == 0b11 or nxt == 0b10:           # VR2 / VL2
                b = nxt
                d = 2
            elif nxt == 0b01:
                last = br.read(1)
                if last == 1:                        # 0000011 VR3
                    b, d = 0b11, 3
                else:                                # 0000010 VL3
                    b, d = 0b10, 3
            else:
                raise ValueError("invalid CCITT 2D mode code")
        if b == 0b11:                                # vertical right
            check_b1()
            setvalue(b1 - a0 + d)
            b1 += refrun(pb)
            pb += 1
        else:                                        # vertical left
            check_b1()
            if b1 < a0 + d:
                raise ValueError("invalid CCITT VL mode")
            setvalue(b1 - a0 - d)
            pb -= 1
            b1 -= refrun(pb)

    # epilogue (EXPAND2D tail): a pending pass span may need a final V0
    if run_len:
        if run_len + a0 < width:
            if br.bits_left() and br.read(1) != 1:
                raise ValueError("missing final V0 after pass run")
        setvalue(0)

    # CLEANUP_RUNS: force the run list to sum exactly to width
    total = sum(cur)
    if total != width:
        while total > width and cur:
            total -= cur.pop()
        if total < width:
            if len(cur) & 1:
                cur.append(0)
            cur.append(width - total)
        elif total > width:
            cur = [width, 0]
    return cur


def _row_from_runs(runs: list, width: int) -> np.ndarray:
    row = np.zeros(width, np.uint8)
    pos = 0
    color = 0
    for r in runs:
        e = min(pos + r, width)
        if color:
            row[pos:e] = 1
        pos = e
        color ^= 1
        if pos >= width:
            break
    return row


def _cleanup_1d(runs: list, width: int) -> list:
    total = sum(runs)
    while total > width and runs:
        total -= runs.pop()
    if total < width:
        if len(runs) & 1:
            runs.append(0)
        runs.append(width - total)
    return runs


def decode_g3(data, width, height, two_d=False):
    """T.4 Group 3 → uint8 (height, width), 1 = black.

    ``two_d=False``: MH rows with optional EOL separators.
    ``two_d=True``: EOL + tag bit per row (tag 1 = 1D, 0 = 2D)."""
    br = _BitReader(bytes(data))
    out = np.zeros((height, width), np.uint8)
    ref = [width, 0]
    for y in range(height):
        save = br.pos
        if not _sync_eol(br):
            br.pos = save
            if two_d and y > 0:
                break                      # RTC / exhausted
        if two_d:
            if br.bits_left() == 0:
                break
            tag = br.read(1)
            runs = (_decode_1d_runs(br, width) if tag
                    else _decode_2d_runs(br, width, ref))
        else:
            if br.bits_left() == 0:
                break
            runs = _decode_1d_runs(br, width)
        runs = _cleanup_1d(runs, width)
        out[y] = _row_from_runs(runs, width)
        ref = runs + [0]
    return out


def decode_g4(data, width, height):
    """T.6 (MMR) → uint8 (height, width), 1 = black."""
    br = _BitReader(bytes(data))
    out = np.zeros((height, width), np.uint8)
    ref = [width, 0]
    for y in range(height):
        if br.bits_left() < 2:
            break
        if br.peek(24) == 0x001001:        # EOFB
            break
        runs = _cleanup_1d(_decode_2d_runs(br, width, ref), width)
        out[y] = _row_from_runs(runs, width)
        ref = runs + [0]
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def done(self):
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = self.n = 0
        return bytes(self.buf)


def _write_run(bw: _BitWriter, run: int, enc):
    while run >= 64:
        m = min(run - run % 64, 2560)
        if m not in enc:
            m = 2560
        ln, code = enc[m]
        bw.write(code, ln)
        run -= m
    ln, code = enc[run]
    bw.write(code, ln)


def _changes_of(row: np.ndarray) -> list:
    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    out = (d + 1).tolist()
    if len(row) and row[0] == 1:
        out.insert(0, 0)          # zero-length leading white run
    return out


def encode_g3_1d(img: np.ndarray) -> bytes:
    """uint8 0/1 rows → T.4 MH with an EOL before every row."""
    bw = _BitWriter()
    h, w = img.shape
    for y in range(h):
        bw.write(1, 12)                     # EOL 000000000001
        pos = 0
        color = 0
        changes = _changes_of(img[y]) + [w]
        for c in changes:
            _write_run(bw, c - pos, _WENC if color == 0 else _BENC)
            pos = c
            color ^= 1
            if pos >= w:
                break
    for _ in range(6):                      # RTC
        bw.write(1, 12)
    return bw.done()


def encode_g4(img: np.ndarray) -> bytes:
    """uint8 0/1 → T.6 (vertical/horizontal/pass modes), EOFB-tailed."""
    bw = _BitWriter()
    h, w = img.shape
    ref = [w, w]
    for y in range(h):
        cur = _changes_of(img[y]) + [w]
        a0 = -1
        color = 0
        ci = 0
        while a0 < w:
            parity = ci & 1
            b1 = w
            idx = None
            for i in range(len(ref)):
                if ref[i] > a0 and (i & 1) == parity:
                    b1 = ref[i]
                    idx = i
                    break
            b2 = ref[idx + 1] if idx is not None and idx + 1 < len(ref) \
                else w
            a1 = cur[ci] if ci < len(cur) else w
            if b2 < a1:                      # pass
                bw.write(0b0001, 4)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:                 # vertical
                bw.write({0: (1, 1), 1: (0b011, 3), -1: (0b010, 3),
                          2: (0b000011, 6), -2: (0b000010, 6),
                          3: (0b0000011, 7), -3: (0b0000010, 7)}[d][0],
                         {0: (1, 1), 1: (0b011, 3), -1: (0b010, 3),
                          2: (0b000011, 6), -2: (0b000010, 6),
                          3: (0b0000011, 7), -3: (0b0000010, 7)}[d][1])
                a0 = a1
                ci += 1
                color ^= 1
                continue
            # horizontal: two runs
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            bw.write(0b001, 3)
            base = a0 if a0 > 0 else 0
            _write_run(bw, a1 - base, _WENC if color == 0 else _BENC)
            _write_run(bw, a2 - a1, _BENC if color == 0 else _WENC)
            a0 = a2
            ci += 2
        ref = cur if cur[-1] == w else cur + [w]
        ref = ref + [w, w]
    bw.write(1, 12)                          # EOFB = two EOLs
    bw.write(1, 12)
    return bw.done()
