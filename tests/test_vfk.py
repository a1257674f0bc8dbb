"""VFK (Czech cadastre) reader vs the reference's published
expectations (autotest/ogr/ogr_vfk.py over bylany.vfk)."""

import os

import numpy as np
import pytest

from raydal.geo import wkb as W
from raydal.io.vfk import read_vfk

P = "/root/reference/autotest/ogr/data/vfk/bylany.vfk"

need_ref = pytest.mark.skipif(not os.path.exists(P),
                              reason="reference fixtures not available")


def _length(wkb):
    _, d = W.parse_wkb(wkb)
    seg = np.asarray(d)
    return np.sqrt(((seg[1:] - seg[:-1]) ** 2).sum(axis=1)).sum()


@need_ref
class TestVFK:
    @pytest.fixture(scope="class")
    def layers(self):
        return read_vfk(P)

    def test_layer_inventory(self, layers):
        # test_ogr_vfk_1: exactly 61 layers, first is PAR (28 fields,
        # 1 feature)
        assert len(layers) == 61
        assert list(layers)[0] == "PAR"
        par = layers["PAR"]
        assert len([c for c in par.column_names
                    if c not in ("fid", "wkb")]) == 28
        assert par.num_rows == 1

    def test_par_field_types(self, layers):
        # test_ogr_vfk_7: ID Integer64, STAV_DAT Integer,
        # DATUM_VZNIKU String, CENA_NEMOVITOSTI Real
        par = layers["PAR"]
        assert str(par.schema.field("ID").type) == "int64"
        assert str(par.schema.field("STAV_DAT").type) == "int32"
        assert str(par.schema.field("DATUM_VZNIKU").type) == "string"
        assert str(par.schema.field("CENA_NEMOVITOSTI").type) == \
            "double"

    def test_par_polygon_envelope(self, layers):
        # test_ogr_vfk_2: parcel polygon envelope area 2010.5 +/- 0.5
        f = layers["PAR"].to_pylist()[0]
        kind, data = W.parse_wkb(f["wkb"])
        ring = np.asarray(data[0])
        area = (ring[:, 0].max() - ring[:, 0].min()) * \
            (ring[:, 1].max() - ring[:, 1].min())
        assert abs(area - 2010.5) <= 0.5

    def test_sobr_attribute_filter(self, layers):
        # test_ogr_vfk_3: exactly one SOBR point with CISLO_BODU 55
        sobr = layers["SOBR"]
        assert sum(1 for r in sobr.to_pylist()
                   if r["CISLO_BODU"] == 55) == 1
        # points carry the S-JTSK sign convention (-Y, -X)
        f = sobr.to_pylist()[0]
        import struct
        x, y = struct.unpack("<2d", f["wkb"][5:21])
        assert x < -400000 and y < -900000

    def test_sbp_segment_features(self, layers):
        # test_ogr_vfk_4: SBP feature 5's linestring length == 10
        sbp = layers["SBP"]
        f5 = sbp.to_pylist()[4]
        assert int(_length(f5["wkb"])) == 10

    def test_hp_linestrings(self, layers):
        # test_ogr_vfk_5: HP is a linestring layer
        hp = layers["HP"]
        assert hp.num_rows == 13
        assert all(w is not None for w in hp["wkb"].to_pylist())
        for w in hp["wkb"].to_pylist():
            assert W.wkb_geom_type(w) % 1000 == W.LINESTRING
