"""HDF4 (NCSA HDF 4.x) scientific-data-set reader, from scratch.

Parity target: the reference's HDF4 driver (``frmts/hdf4/``) reads
SDSs through libmfhdf; here the container is parsed from the public
NCSA HDF 4 specification: the DD (data-descriptor) block chain,
numeric-data groups (DFTAG_NDG 720) tying together dimension records
(DFTAG_SDD 701), number types (DFTAG_NT 106) and raw data
(DFTAG_SD 702), with dataset names recovered from the Vgroup
(DFTAG_VG 1965) tree the SD API writes.

Fixture: ``autotest/gdrivers/data/hdf4/hdifftst2.hdf`` (the only HDF4
file in the reference's corpus reachable without downloads); the
reference's own tests assert it opens through the HDF4 driver and is
NOT claimed by the netCDF driver (autotest netcdf.py test_netcdf_23).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["HDF4File", "read_hdf4", "hdf4_datasets"]

_MAGIC = b"\x0e\x03\x13\x01"

# DFNT number type codes → numpy dtype (big-endian default)
_NT = {
    3: ">u1", 4: "S1", 5: ">f4", 6: ">f8",
    20: ">i1", 21: ">u1", 22: ">i2", 23: ">u2",
    24: ">i4", 25: ">u4", 26: ">i8", 27: ">u8",
}

TAG_NT = 106
TAG_SDD = 701
TAG_SD = 702
TAG_NDG = 720
TAG_VH = 1962
TAG_VS = 1963
TAG_VG = 1965


class HDF4File:
    def __init__(self, src):
        if isinstance(src, (bytes, bytearray, memoryview)):
            buf = bytes(src)
        else:
            with open(src, "rb") as f:
                buf = f.read()
        if buf[:4] != _MAGIC:
            raise ValueError("not an HDF4 file")
        self.buf = buf
        self.dd = {}                   # (tag, ref) → (offset, length)
        pos = 4
        while pos:
            ndd, nxt = struct.unpack_from(">hI", buf, pos)
            p = pos + 6
            for _ in range(ndd):
                tag, ref, off, ln = struct.unpack_from(">HHII", buf, p)
                p += 12
                if tag not in (0, 1):
                    self.dd[(tag, ref)] = (off, ln)
            pos = nxt
        self._names = self._vgroup_names()

    def _data(self, tag, ref):
        off, ln = self.dd[(tag, ref)]
        return self.buf[off:off + ln]

    # ------------------------------------------------------- vgroups

    def _vgroup_names(self):
        """NDG ref → dataset name from the SD-API Vgroup tree."""
        names = {}
        for (tag, ref), _ in self.dd.items():
            if tag != TAG_VG:
                continue
            d = self._data(tag, ref)
            n = struct.unpack_from(">H", d, 0)[0]
            p = 2
            tags = struct.unpack_from(">%dH" % n, d, p)
            p += 2 * n
            refs = struct.unpack_from(">%dH" % n, d, p)
            p += 2 * n
            nl = struct.unpack_from(">H", d, p)[0]
            p += 2
            name = d[p:p + nl].decode("latin-1")
            p += nl
            cl = struct.unpack_from(">H", d, p)[0]
            p += 2
            klass = d[p:p + cl].decode("latin-1")
            if klass not in ("Var0.0", "RI0.0"):
                continue
            for t, r in zip(tags, refs):
                if t == TAG_NDG:
                    names[r] = name
        return names

    # ------------------------------------------------------ datasets

    def datasets(self):
        """{name: (shape, dtype str)} for every numeric data group."""
        out = {}
        for key in sorted(self.dd):
            tag, ref = key
            if tag != TAG_NDG:
                continue
            info = self._ndg_info(ref)
            if info is None:
                continue
            name = self._names.get(ref, f"sds_{ref}")
            out[name] = (info[0], np.dtype(info[1]).str)
        return out

    def _ndg_info(self, ref):
        d = self._data(TAG_NDG, ref)
        members = [struct.unpack_from(">HH", d, i)
                   for i in range(0, len(d), 4)]
        sdd = next((r for t, r in members if t == TAG_SDD), None)
        sd = next((r for t, r in members if t == TAG_SD), None)
        if sdd is None or sd is None:
            return None
        rec = self._data(TAG_SDD, sdd)
        rank = struct.unpack_from(">H", rec, 0)[0]
        dims = struct.unpack_from(">%dI" % rank, rec, 2)
        # data NT reference follows the dims: (tag=106, ref) pairs,
        # first pair is the data number type
        p = 2 + 4 * rank
        _t, ntref = struct.unpack_from(">HH", rec, p)
        nt = self._data(TAG_NT, ntref)
        code = nt[1]
        dt = _NT.get(code)
        if dt is None:
            raise ValueError(f"unsupported HDF4 number type {code}")
        return tuple(int(x) for x in dims), dt, sd

    def read(self, name):
        ref = next((r for r, n in self._names.items() if n == name),
                   None)
        if ref is None:
            try:
                ref = int(name.rsplit("_", 1)[1])
            except (IndexError, ValueError):
                raise KeyError(name)
        shape, dt, sd = self._ndg_info(ref)
        raw = self._data(TAG_SD, sd)
        return np.frombuffer(raw, dt,
                             int(np.prod(shape))).reshape(shape)

    # ---------------------------------------------------- attributes

    def vdatas(self):
        """{name: raw bytes} for Vdata records (attributes etc.)."""
        out = {}
        for (tag, ref), _ in self.dd.items():
            if tag != TAG_VH:
                continue
            h = self._data(TAG_VH, ref)
            # VH: interlace u16, nvert u32, ivsize u16, nfields u16,
            # then per field: type u16, isize u16, offset u16, order
            # u16; then field names, then name/class
            nfields = struct.unpack_from(">H", h, 8)[0]
            p = 10 + 8 * nfields
            parts = []
            for _ in range(nfields):
                ln = struct.unpack_from(">H", h, p)[0]
                p += 2
                parts.append(h[p:p + ln].decode("latin-1"))
                p += ln
            ln = struct.unpack_from(">H", h, p)[0]
            p += 2
            name = h[p:p + ln].decode("latin-1")
            if (TAG_VS, ref) in self.dd:
                out[name] = self._data(TAG_VS, ref)
        return out


def read_hdf4(src, dataset=None):
    """HDF4 path/bytes → numpy array for ``dataset`` (or the single
    one)."""
    f = HDF4File(src)
    if dataset is None:
        ds = f.datasets()
        if len(ds) != 1:
            raise ValueError(f"dataset required; file has "
                             f"{sorted(ds)}")
        dataset = next(iter(ds))
    return f.read(dataset)


def hdf4_datasets(src):
    return HDF4File(src).datasets()
