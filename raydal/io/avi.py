"""AVI (RIFF) MJPEG container codec — public Microsoft AVI RIFF spec.

Fills the real-video side of the multimodal swap point
(:mod:`raydal.ops.multimodal`): an MJPEG AVI is a RIFF container whose
``movi`` list holds one baseline-JPEG blob per frame (``00dc`` chunks)
plus an ``idx1`` index of chunk offsets — so the repo's from-scratch
JPEG codec (:mod:`raydal.io.jpeg`) gives real frame decode, and the
``idx1`` index gives real *seeking*: sampling k frames from an N-frame
clip parses the index and entropy-decodes only those k JPEGs, the
contract :class:`raydal.ops.multimodal.VideoFrameSample` relies on.

``probe_avi`` reads frame count / fps from the ``avih`` header without
touching frame data.  ``encode_avi_mjpeg`` writes a spec-conformant
single-stream file (hdrl/avih + strl/strh 'vids'/'MJPG' + strf
BITMAPINFOHEADER + movi + idx1) used for round-trips and goldens.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_avi_mjpeg", "probe_avi", "decode_avi_frames",
           "extract_avi_audio"]


def _chunk(cc, payload):
    return (cc + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))


def _list(kind, payload):
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames, fps=10, quality=90, audio=None,
                     audio_rate=16000):
    """frames uint8 (n, h, w) gray or (n, h, w, 3) RGB → MJPEG AVI
    bytes (one baseline JPEG per ``00dc`` chunk, idx1 index).

    ``audio``: optional int16/float mono samples written as a second
    ``auds`` stream (PCM ``01wb`` chunks, one per video frame)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n = f.shape[0]
    h, w = f.shape[1], f.shape[2]
    jpegs = [encode_jpeg(f[i], quality=quality) for i in range(n)]
    pcm = None
    if audio is not None:
        a = np.asarray(audio)
        if a.dtype.kind == "f":
            a = np.clip(np.round(a * 32767.0), -32768, 32767)
        pcm = a.astype("<i2")

    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1_000_000 / fps)),            # dwMicroSecPerFrame
        sum(len(j) for j in jpegs) * fps // max(n, 1),  # dwMaxBytesPerSec
        0,                                      # dwPaddingGranularity
        0x10,                                   # AVIF_HASINDEX
        n, 0, 1 + (pcm is not None),            # frames, initial, streams
        max((len(j) for j in jpegs), default=0),  # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, int(fps),                            # dwScale, dwRate
        0, n,                                   # dwStart, dwLength
        max((len(j) for j in jpegs), default=0),
        0xFFFFFFFF,                             # dwQuality -1 (default)
        0, 0, 0, int(w), int(h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl_body = _chunk(b"avih", avih) + _list(
        b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    if pcm is not None:
        astrh = struct.pack(
            "<4s4sIHHIIIIIIIi4h",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, int(audio_rate),                 # dwScale, dwRate
            0, len(pcm), len(pcm) * 2, 0xFFFFFFFF, 2, 0, 0, 0, 0)
        # WAVEFORMATEX: PCM, mono, 16-bit
        astrf = struct.pack("<HHIIHH", 1, 1, int(audio_rate),
                            int(audio_rate) * 2, 2, 16)
        hdrl_body += _list(b"strl", _chunk(b"strh", astrh)
                           + _chunk(b"strf", astrf))
    hdrl = _list(b"hdrl", hdrl_body)

    movi_payload = b"movi"
    idx = []
    # interleave: one '01wb' slice per video frame (CD-style layout)
    aud_per = (-(-len(pcm) // max(n, 1)) if pcm is not None else 0)
    for fi, j in enumerate(jpegs):
        # idx1 offsets point at the chunk fourcc, measured from the
        # start of the 'movi' fourcc (the common convention)
        idx.append((b"00dc", len(movi_payload) - 4, len(j)))
        movi_payload += _chunk(b"00dc", j)
        if pcm is not None:
            s = pcm[fi * aud_per:(fi + 1) * aud_per]
            if len(s):
                raw = s.tobytes()
                idx.append((b"01wb", len(movi_payload) - 4, len(raw)))
                movi_payload += _chunk(b"01wb", raw)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(
        struct.pack("<4sIII", cc, 0x10, off + 4, size)
        for cc, off, size in idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf):
    """Parse the top-level RIFF-AVI structure; returns
    (avih_fields, movi_start, movi_end, idx1_entries_or_None)."""
    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    avih = None
    movi = None
    idx1 = None
    streams = {}
    pos = 12
    while pos + 8 <= end:
        cc, size = struct.unpack_from("<4sI", buf, pos)
        payload = pos + 8
        if cc == b"LIST" and payload + 4 <= end:
            kind = buf[payload:payload + 4]
            if kind == b"hdrl":
                # scan inside hdrl for avih
                p = payload + 4
                hend = payload + size
                while p + 8 <= hend:
                    c2, s2 = struct.unpack_from("<4sI", buf, p)
                    if c2 == b"avih":
                        a = struct.unpack_from("<10I", buf, p + 8)
                        avih = {"usec_per_frame": a[0], "flags": a[3],
                                "total_frames": a[4], "streams": a[6],
                                "width": a[8], "height": a[9]}
                    elif c2 == b"LIST":
                        # descend into strl for strh (fps from
                        # dwRate/dwScale beats usec rounding)
                        q = p + 12
                        lend = p + 8 + s2
                        while q + 8 <= lend:
                            c3, s3 = struct.unpack_from("<4sI", buf, q)
                            if c3 == b"strh":
                                stype = buf[q + 8:q + 12]
                                scale, rate = struct.unpack_from(
                                    "<II", buf, q + 8 + 20)
                                if stype == b"vids" and scale:
                                    streams.setdefault(
                                        "fps", rate / scale)
                                elif stype == b"auds":
                                    # dwScale==0 tolerated (rate//1);
                                    # FIRST auds stream wins
                                    streams.setdefault(
                                        "audio_rate",
                                        rate // max(scale, 1))
                            q += 8 + s3 + (s3 & 1)
                    p += 8 + s2 + (s2 & 1)
            elif kind == b"movi":
                movi = (payload + 4, payload + size)
        elif cc == b"idx1":
            n = size // 16
            idx1 = [struct.unpack_from("<4sIII", buf, payload + 16 * i)
                    for i in range(n)]
        pos += 8 + size + (size & 1)
    if avih is None:
        raise ValueError("missing avih header")
    avih.update(streams)
    return avih, movi, idx1


def probe_avi(buf):
    """bytes → (n_frames, fps) from the avih/strh headers only."""
    avih, _movi, _idx = _walk(buf)
    fps = avih.get("fps") or (1_000_000 / avih["usec_per_frame"]
                              if avih["usec_per_frame"] else 0.0)
    return avih["total_frames"], fps


def _to_gray(px):
    if px.ndim == 2:
        return px
    # ITU-R BT.601 luma, reference CopyWords rounding (floor(v+0.5))
    y = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2])
    return np.floor(y + 0.5).astype(np.uint8)


def decode_avi_frames(buf, indices=None, gray=True):
    """bytes → (frames (k, h, w) uint8 [or (k, h, w, 3) if gray=False],
    fps); ``indices`` seeks via idx1 and decodes ONLY those JPEGs.

    Falls back to a linear ``movi`` scan when idx1 is absent."""
    buf = bytes(buf)
    avih, movi, idx1 = _walk(buf)
    fps = avih.get("fps") or (1_000_000 / avih["usec_per_frame"]
                              if avih["usec_per_frame"] else 0.0)
    if movi is None:
        raise ValueError("missing movi list")
    m0, m1 = movi

    # frame table: (payload_offset, size) per video chunk
    if idx1:
        base = m0 - 4        # offsets measured from the 'movi' fourcc
        table = []
        for cc, _flags, off, size in idx1:
            if cc[2:4] in (b"dc", b"db"):
                p = base + off
                # some writers store absolute file offsets instead
                if buf[p:p + 4] != cc and buf[off:off + 4] == cc:
                    p = off
                table.append((p + 8, size))
    else:
        table = []
        p = m0
        while p + 8 <= m1:
            cc, size = struct.unpack_from("<4sI", buf, p)
            if cc[2:4] in (b"dc", b"db"):
                table.append((p + 8, size))
            elif cc == b"LIST":
                p += 12
                continue
            p += 8 + size + (size & 1)

    n = len(table)
    if indices is None:
        want = range(n)
    else:
        if n == 0:
            raise ValueError("AVI has no video frames")
        want = np.clip(np.asarray(indices, dtype=np.int64), 0, n - 1)
    frames = []
    for fi in want:
        off, size = table[int(fi)]
        px = decode_jpeg(buf[off:off + size])
        frames.append(_to_gray(px) if gray else px)
    return np.stack(frames) if frames else np.empty((0, 0, 0), np.uint8), fps


def extract_avi_audio(buf):
    """AVI bytes → (float64 mono samples in [-1, 1], sample_rate) from
    the first ``auds`` stream's PCM ``..wb`` chunks.

    Raises ``ValueError`` when the container has no audio stream."""
    buf = bytes(buf)
    avih, movi, idx1 = _walk(buf)   # _walk collects the auds rate too
    rate = avih.get("audio_rate")
    if rate is None:
        raise ValueError("AVI has no audio (auds) stream")
    if movi is None:
        raise ValueError("missing movi list")
    m0, m1 = movi
    pieces = []
    if idx1:
        base = m0 - 4
        for cc, _flags, off, size in idx1:
            if cc[2:4] == b"wb":
                p = base + off
                if buf[p:p + 4] != cc and buf[off:off + 4] == cc:
                    p = off
                pieces.append(buf[p + 8:p + 8 + size])
    else:
        p = m0
        while p + 8 <= m1:
            cc, size = struct.unpack_from("<4sI", buf, p)
            if cc == b"LIST":
                p += 12
                continue
            if cc[2:4] == b"wb":
                pieces.append(buf[p + 8:p + 8 + size])
            p += 8 + size + (size & 1)
    raw = b"".join(pieces)
    s = np.frombuffer(raw[:len(raw) // 2 * 2], "<i2")
    return s.astype(np.float64) / 32768.0, rate
