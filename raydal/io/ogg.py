"""Ogg container + FLAC-in-Ogg encapsulation, from scratch.

Implements the Ogg bitstream framing (RFC 3533: ``OggS`` pages with
lacing-value segment tables, BOS/EOS/continuation flags and the
unreflected CRC-32 page checksum, poly 0x04C11DB7 / init 0 / no final
xor) and the Xiph FLAC-to-Ogg mapping (first packet ``0x7F "FLAC"``
major.minor + header-packet count + ``fLaC`` STREAMINFO; one FLAC audio
frame per packet; granule position = last finished sample on the page).

Reference parity: GDAL delegates Ogg parsing to external libs, but the
page/packet framing here matches the public specs the same way the WAV
and AVI modules match RIFF (`frmts/wav`-style containers are handled in
:mod:`raydal.io.wav`); this module makes the FLAC codec
(:mod:`raydal.io.flac`, RFC 9639) reachable from ``.oga``/Ogg payloads
in the audio pipeline (``raydal.ops.multimodal.decode_audio``).
"""
from __future__ import annotations

import struct

import numpy as np

from .flac import _encode_frame, _md5_raw, decode_flac

__all__ = ["encode_ogg_flac", "decode_ogg_flac", "ogg_pages",
           "ogg_packets", "crc32_ogg"]

_CRC_T = None


def _crc_table():
    global _CRC_T
    if _CRC_T is None:
        t = np.zeros(256, np.uint32)
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000
                     else r << 1) & 0xFFFFFFFF
            t[i] = r
        _CRC_T = t
    return _CRC_T


def crc32_ogg(data):
    """Ogg page CRC: poly 0x04C11DB7, init 0, unreflected, no xorout."""
    t = _crc_table()
    crc = np.uint32(0)
    for b in np.frombuffer(bytes(data), np.uint8):
        crc = np.uint32((int(crc) << 8) & 0xFFFFFFFF) ^ \
            t[(int(crc) >> 24) ^ int(b)]
    return int(crc)


def _emit_page(out, flags, granule, serial, seqno, lacings, payload):
    hdr = struct.pack("<4sBBqIII", b"OggS", 0, flags, granule, serial,
                      seqno, 0) + bytes([len(lacings)]) + bytes(lacings)
    page = bytearray(hdr + payload)
    crc = crc32_ogg(page)
    page[22:26] = struct.pack("<I", crc)
    out += page


def _write_packets(out, packets, serial, seq0, granules, flags_last=0):
    """Write packets (with per-packet end granules) into pages.

    One packet per page except when a packet needs more than 255 lacing
    values, in which case it spills onto continuation pages (flag 0x01).
    Returns the next page sequence number.
    """
    seq = seq0
    for pi, (pkt, gran) in enumerate(zip(packets, granules)):
        lac = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        off = 0
        first = True
        while lac:
            take, lac = lac[:255], lac[255:]
            nbytes = sum(take)
            flags = 0 if first else 0x01
            if not lac and pi == len(packets) - 1:
                flags |= flags_last
            # granule of a page that ends mid-packet is -1
            g = gran if not lac else -1
            _emit_page(out, flags, g, serial, seq,
                       take, bytes(pkt[off:off + nbytes]))
            off += nbytes
            seq += 1
            first = False
    return seq


def ogg_pages(buf):
    """Parse Ogg bytes → list of page dicts, verifying every CRC."""
    buf = bytes(buf)
    pos, pages = 0, []
    while pos < len(buf):
        if buf[pos:pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if pos + 27 > len(buf):
            raise ValueError("truncated Ogg page header")
        (_, ver, flags, granule, serial, seq,
         crc) = struct.unpack_from("<4sBBqIII", buf, pos)
        if ver != 0:
            raise ValueError("unsupported Ogg version")
        nseg = buf[pos + 26]
        lac = buf[pos + 27:pos + 27 + nseg]
        if len(lac) != nseg:
            raise ValueError("truncated segment table")
        body_len = sum(lac)
        end = pos + 27 + nseg + body_len
        if end > len(buf):
            raise ValueError("truncated Ogg page body")
        page = bytearray(buf[pos:end])
        page[22:26] = b"\x00" * 4
        if crc32_ogg(page) != crc:
            raise ValueError("Ogg page CRC mismatch")
        pages.append({"flags": flags, "granule": granule,
                      "serial": serial, "seq": seq, "lacings": lac,
                      "body": buf[pos + 27 + nseg:end]})
        pos = end
    return pages


def ogg_packets(buf):
    """Ogg bytes → (packets, serial): reassembled logical packets of
    the first (only) logical bitstream, continuation pages joined."""
    pages = ogg_pages(buf)
    if not pages:
        raise ValueError("no Ogg pages")
    serial = pages[0]["serial"]
    packets, cur = [], bytearray()
    open_pkt = False
    for pg in pages:
        if pg["serial"] != serial:
            raise ValueError("multiplexed Ogg streams not supported")
        if bool(pg["flags"] & 0x01) != open_pkt:
            raise ValueError("packet continuation mismatch")
        off = 0
        for lv in pg["lacings"]:
            cur += pg["body"][off:off + lv]
            off += lv
            open_pkt = True
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
                open_pkt = False
    if open_pkt:
        raise ValueError("unterminated Ogg packet")
    return packets, serial


# ------------------------------------------------------- FLAC mapping

def _streaminfo(n, nch, rate, bps, block_size, fsizes, md5, last):
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | \
        min(n, (1 << 36) - 1)
    body = struct.pack(">HH", block_size, block_size)
    body += min(fsizes).to_bytes(3, "big")
    body += max(fsizes).to_bytes(3, "big")
    body += packed.to_bytes(8, "big")
    body += md5
    return bytes([0x80 if last else 0x00]) + (34).to_bytes(3, "big") \
        + body


def encode_ogg_flac(samples, rate=16000, bps=16, block_size=4096,
                    serial=0x52414C44):
    """int samples (n,) or (n, ch) → FLAC-in-Ogg bytes.

    Packet layout per the Xiph mapping: BOS page carries the
    ``0x7F FLAC 1.0`` ident packet wrapping ``fLaC`` + STREAMINFO; one
    following VORBIS_COMMENT header packet; then one audio packet per
    FLAC frame, granule = index of the last sample finished on the
    page, EOS on the final page.
    """
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    x = x.astype(np.int64)
    lim = 1 << (bps - 1)
    if n and (x.min() < -lim or x.max() >= lim):
        raise ValueError(f"samples exceed {bps}-bit signed range")

    frames, granules = [], []
    for f, off in enumerate(range(0, n, block_size)):
        frames.append(_encode_frame(x[off:off + block_size], f,
                                    rate, bps, rate))
        granules.append(min(off + block_size, n))
    fsizes = [len(f) for f in frames] or [0]

    ident = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + b"fLaC"
             + _streaminfo(n, nch, rate, bps, block_size, fsizes,
                           _md5_raw(x, bps), last=False))
    vendor = b"raydal"
    vcomment_body = struct.pack("<I", len(vendor)) + vendor + \
        struct.pack("<I", 0)
    vcomment = bytes([0x84]) + len(vcomment_body).to_bytes(3, "big") \
        + vcomment_body

    out = bytearray()
    _emit_page(out, 0x02, 0, serial, 0,
               [255] * (len(ident) // 255) + [len(ident) % 255], ident)
    seq = _write_packets(out, [vcomment], serial, 1, [0],
                         flags_last=0 if frames else 0x04)
    if frames:
        _write_packets(out, frames, serial, seq, granules,
                       flags_last=0x04)
    return bytes(out)


def decode_ogg_flac(buf, verify_md5=True):
    """FLAC-in-Ogg bytes → (samples int32, rate, bps).

    Rebuilds a native FLAC stream (STREAMINFO re-flagged as the last
    metadata block, remaining header packets skipped) and hands it to
    :func:`raydal.io.flac.decode_flac`, so frame CRCs and the stream
    MD5 are verified exactly as in the native path.
    """
    packets, _ = ogg_packets(buf)
    first = packets[0]
    if len(first) < 51 or first[0] != 0x7F or first[1:5] != b"FLAC":
        raise ValueError("not a FLAC-in-Ogg stream")
    nhdr = struct.unpack_from(">H", first, 7)[0]
    if first[9:13] != b"fLaC":
        raise ValueError("missing fLaC signature in ident packet")
    if first[13] & 0x7F != 0:
        raise ValueError("first metadata block must be STREAMINFO")
    streaminfo = bytes([first[13] | 0x80]) + first[14:51]
    rest = packets[1:]
    if nhdr:
        rest = rest[nhdr:]
    else:
        while rest and (not rest[0] or rest[0][0] != 0xFF):
            rest = rest[1:]
    native = b"fLaC" + streaminfo + b"".join(rest)
    return decode_flac(native, verify_md5=verify_md5)
