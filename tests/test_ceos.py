"""CEOS reader vs the reference's published expectation
(autotest/gdrivers/ceos.py)."""

import os

import pytest

from raydal.io.ceos import read_ceos
from raydal.kernels.checksum import checksum

P = "/root/reference/autotest/gdrivers/data/ceos/IMAGERY-75K.L-3"


@pytest.mark.skipif(not os.path.exists(P),
                    reason="reference fixtures not available")
class TestCEOS:
    def test_irs_lgsowg_truncated(self):
        # test_ceos_1: band 4 checksum 9956 over the 5932x3 window of
        # the truncated little-endian IRS scene
        r = read_ceos(P)
        assert r["little_endian"] is True
        assert r["bands"] == 4
        assert (r["lines"], r["pixels"]) == (5936, 5932)
        assert r["valid_lines"] == 3
        assert checksum(r["data"][3][:3, :5932]) == 9956
        # other bands decode non-trivially too
        assert r["data"][0][:3].sum() > 0
