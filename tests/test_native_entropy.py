"""Differential tests: compiled entropy kernel vs the pure-Python loop.

The C transcription in raydal/io/_native.py must be bit-for-bit
identical to the Python reference implementation in raydal/io/jpeg.py —
including its error behavior on corrupt streams.  These tests flip the
kernel on and off around the same inputs and compare.
"""

import numpy as np
import pytest

import raydal.io.jpeg as J
from raydal.io import _native
from raydal.io.images import synthesize_images_batch
from raydal.io.jpeg import decode_jpeg, encode_jpeg


@pytest.fixture
def native_fn():
    fn = _native.get_jentropy()
    if fn is None:
        pytest.skip("no C compiler on this host")
    return fn


def _decode_both(blob):
    """Decode once with the kernel, once with pure Python."""
    saved = (_native._tried, _native._lib)
    try:
        _native._tried = False
        _native._lib = None
        nat = decode_jpeg(blob)
        _native._tried, _native._lib = True, None
        pure = decode_jpeg(blob)
    finally:
        _native._tried, _native._lib = saved
    return nat, pure


def test_corpus_bit_identical(native_fn):
    b = synthesize_images_batch(np.arange(48))
    blobs = [x for x, f in zip(b["bytes"].to_pylist(),
                               b["fmt"].to_pylist()) if f == "jpeg"]
    assert blobs, "corpus has no jpeg rows"
    for blob in blobs:
        nat, pure = _decode_both(blob)
        assert np.array_equal(nat, pure)


def test_subsampling_and_restart_modes(native_fn):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(41, 67, 3), dtype=np.uint8)
    for subsample in ("444", "420"):
        for ri in (0, 1, 3):
            blob = encode_jpeg(img, quality=80, subsample=subsample,
                               restart_interval=ri)
            nat, pure = _decode_both(blob)
            assert np.array_equal(nat, pure), (subsample, ri)


def test_restart_roundtrip_matches_no_restart():
    # RST markers change the stream layout but must not change pixels:
    # an encode with DRI decodes to exactly the no-DRI decode
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample="444"))
    for ri in (1, 2, 7):
        withri = decode_jpeg(encode_jpeg(img, quality=90,
                                         subsample="444",
                                         restart_interval=ri))
        assert np.array_equal(base, withri), ri


def test_reference_fixture(native_fn):
    # albania.jpg (reference autotest fixture) is the richest real
    # stream we have; whatever DRI/subsampling it uses, both paths
    # must agree bit-for-bit.
    import os
    path = "/root/reference/autotest/gdrivers/data/jpeg/albania.jpg"
    if not os.path.exists(path):
        pytest.skip("reference fixture absent")
    with open(path, "rb") as f:
        blob = f.read()
    nat, pure = _decode_both(blob)
    assert np.array_equal(nat, pure)


def test_grayscale(native_fn):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(33, 49), dtype=np.uint8)
    blob = encode_jpeg(img, quality=85)
    nat, pure = _decode_both(blob)
    assert np.array_equal(nat, pure)


def test_corrupt_streams_same_errors(native_fn):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    blob = bytearray(encode_jpeg(img, quality=75))
    # flip bytes inside the entropy segment and compare outcomes
    for pos in range(len(blob) - 20, len(blob) - 4):
        bad = bytes(blob[:pos]) + b"\x55" + bytes(blob[pos + 1:])
        outcomes = []
        for use_native in (True, False):
            saved = (_native._tried, _native._lib)
            try:
                if use_native:
                    _native._tried = False
                    _native._lib = None
                else:
                    _native._tried, _native._lib = True, None
                try:
                    outcomes.append(("ok", decode_jpeg(bad)))
                except ValueError as e:
                    outcomes.append(("err", str(e)))
                except NotImplementedError as e:
                    outcomes.append(("nie", str(e)))
            finally:
                _native._tried, _native._lib = saved
        (k1, v1), (k2, v2) = outcomes
        assert k1 == k2, (pos, outcomes)
        if k1 == "ok":
            assert np.array_equal(v1, v2), pos
        else:
            assert v1 == v2, pos


def test_env_kill_switch(native_fn, monkeypatch):
    monkeypatch.setenv("RAYDAL_NO_NATIVE", "1")
    saved = (_native._tried, _native._lib)
    try:
        _native._tried = False
        _native._lib = None
        assert _native.get_jentropy() is None
    finally:
        _native._tried, _native._lib = saved
