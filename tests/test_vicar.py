"""VICAR reader parity vs autotest/gdrivers/vicar.py published
checksums (datatype matrix, orgs, byte orders, VAX floats, BASIC/
BASIC2 compression)."""

import os

import numpy as np
import pytest

from raydal.io.vicar import read_vicar, vicar_label
from raydal.kernels.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/vicar/"
needs_ref = pytest.mark.skipif(not os.path.isdir(DATA),
                               reason="reference autotest data absent")

CASES = [
    ("vicar_byte", "uint8", 129),
    ("vicar_int16", "int16", 129),
    ("vicar_bigendian_int16", "int16", 129),
    ("vicar_int32", "int32", 129),
    ("vicar_float32_bsq", "float32", 123),
    ("vicar_float32_bil", "float32", 123),
    ("vicar_float32_bip", "float32", 123),
    ("vicar_bigendian_float32", "float32", 129),
    ("vicar_float64", "float64", 129),
    ("vicar_vax_float32", "float32", 129),
    ("vicar_vax_float64", "float64", 129),
]


@needs_ref
@pytest.mark.parametrize("fn,dt,cs", CASES, ids=[c[0] for c in CASES])
def test_vicar_datatypes(fn, dt, cs):
    arr, _gt, _nd = read_vicar(DATA + fn + ".vic")
    assert str(arr.dtype) == dt
    assert checksum(arr[0]) == cs


@needs_ref
@pytest.mark.parametrize("fn,cs", [("vicar_cfloat32", 148),
                                   ("vicar_vax_cfloat32", 226)])
def test_vicar_complex(fn, cs):
    # GDALChecksumImage reads complex bands as interleaved re/im
    # doubles (2× width per line)
    arr, _gt, _nd = read_vicar(DATA + fn + ".vic")
    b = arr[0]
    inter = np.empty((b.shape[0], b.shape[1] * 2), np.float64)
    inter[:, 0::2] = b.real
    inter[:, 1::2] = b.imag
    assert checksum(inter) == cs


@needs_ref
@pytest.mark.parametrize("fn,cs", [
    ("vicar_byte_basic", 4672), ("vicar_byte_basic2", 4672),
    ("vicar_int16_basic2", 4672), ("vicar_all_ones_basic2", 34464),
])
def test_vicar_compressed(fn, cs):
    arr, _gt, _nd = read_vicar(DATA + fn + ".vic")
    assert checksum(arr[0]) == cs


@needs_ref
def test_vicar_label_and_registry(ray_session):
    lab = vicar_label(DATA + "vicar_byte.vic")
    assert lab["FORMAT"] == "BYTE" and lab["NL"] == 3
    from raydal.pipeline import open_source
    df = open_source("vicar", DATA + "vicar_byte.vic").to_pandas()
    assert len(df) == 1 and df["w"][0] == 4


@needs_ref
def test_vicar_truncated_rejected():
    with pytest.raises(Exception):
        arr, _, _ = read_vicar(DATA + "test_vicar_truncated.bin")
        if arr.size == 0:
            raise ValueError("empty")
