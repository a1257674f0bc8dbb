"""LVBAG reader vs the reference's published expectations
(autotest/ogr/ogr_lvbag.py)."""

import os

import pytest

from raydal.io.lvbag import read_lvbag
from raydal.io.wkt import wkb_to_wkt

D = "/root/reference/autotest/ogr/data/lvbag"

need_ref = pytest.mark.skipif(not os.path.isdir(D),
                              reason="reference fixtures not available")


def _fields(t):
    return [c for c in t.column_names if c != "wkb"]


@need_ref
class TestLVBAG:
    def test_num(self):
        t = read_lvbag(os.path.join(D, "num.xml"))
        assert t.schema.metadata[b"layer"] == b"Nummeraanduiding"
        assert t.num_rows == 3
        assert len(_fields(t)) == 22
        r = t.to_pylist()[0]
        assert r["identificatie"] == \
            "NL.IMBAG.Nummeraanduiding.0106200000002798"
        assert r["huisnummer"] == 23
        assert r["postcode"] == "9403KB"
        assert r["typeAdresseerbaarObject"] == "Verblijfsobject"
        assert r["openbareruimteRef"] == \
            "NL.IMBAG.Openbareruimte.0106300000002560"
        assert r["status"] == "Naamgeving uitgegeven"
        assert r["geconstateerd"] == 0
        assert r["documentDatum"] == "2009/09/14"
        assert r["documentNummer"] == "2009-BB01570"
        assert r["woonplaatsRef"] is None
        assert r["voorkomenIdentificatie"] == 1
        assert r["beginGeldigheid"] == "2009/09/24"
        assert r["tijdstipRegistratie"] == "2009/11/06 12:21:37"
        assert r["tijdstipRegistratieLV"] == "2009/11/06 12:38:46.603"
        r2 = t.to_pylist()[1]
        assert r2["huisnummer"] == 24
        assert r2["postcode"] == "9403KD"
        assert r2["woonplaatsRef"] is not None

    def test_lig(self):
        t = read_lvbag(os.path.join(D, "lig.xml"))
        assert t.schema.metadata[b"layer"] == b"Ligplaats"
        assert t.schema.metadata[b"crs"] == b"EPSG:28992"
        assert t.num_rows == 3
        assert len(_fields(t)) == 17
        # the reference's exact field order
        assert [f.lower() for f in _fields(t)] == [
            "hoofdadresnummeraanduidingref",
            "nevenadresnummeraanduidingref", "identificatie",
            "status", "geconstateerd", "documentdatum",
            "documentnummer", "voorkomenidentificatie",
            "begingeldigheid", "eindgeldigheid",
            "tijdstipregistratie", "eindregistratie",
            "tijdstipinactief", "tijdstipregistratielv",
            "tijdstipeindregistratielv", "tijdstipinactieflv",
            "tijdstipnietbaglv"]
        r = t.to_pylist()[0]
        assert r["hoofdadresNummeraanduidingRef"] == \
            "NL.IMBAG.Nummeraanduiding.0106200000005333"
        assert r["nevenadresNummeraanduidingRef"] is None
        assert r["identificatie"] == \
            "NL.IMBAG.Ligplaats.0106020000000003"
        assert r["status"] == "Plaats aangewezen"
        assert r["documentDatum"] == "2009/05/26"
        assert r["documentNummer"] == "2009-01000"
        assert r["tijdstipRegistratie"] == "2009/11/06 13:37:22"
        assert r["tijdstipRegistratieLV"] == "2009/11/06 14:07:51.498"
        assert wkb_to_wkt(r["wkb"]).startswith("POLYGON ((231948.413")

    def test_opr(self):
        t = read_lvbag(os.path.join(D, "opr.xml"))
        assert t.schema.metadata[b"layer"] == b"Openbareruimte"
        assert t.num_rows == 4
        assert len(_fields(t)) == 19
        r = t.to_pylist()
        assert r[0]["naam"] == "Twaalfsuurlaan"
        assert r[0]["verkorteNaam"] is None
        assert r[3]["naam"] == "Schout bij Nacht Doormansingel"
        assert r[3]["verkorteNaam"] == "Sbn Doormansingel"

    def test_pnd(self):
        t = read_lvbag(os.path.join(D, "pnd.xml"))
        assert t.schema.metadata[b"layer"] == b"Pand"
        assert t.num_rows == 6
        assert len(_fields(t)) == 16
        years = [r["oorspronkelijkBouwjaar"] for r in t.to_pylist()]
        assert years[0] == 2009
        assert years[3:] == [2007, 1975, 2001]
        assert wkb_to_wkt(t["wkb"][0].as_py()).startswith("POLYGON")

    def test_sta_vbo_wpl(self):
        t = read_lvbag(os.path.join(D, "sta.xml"))
        assert t.schema.metadata[b"layer"] == b"Standplaats"
        assert t.num_rows == 2 and len(_fields(t)) == 17
        t = read_lvbag(os.path.join(D, "vbo.xml"))
        assert t.schema.metadata[b"layer"] == b"Verblijfsobject"
        assert t.num_rows == 3 and len(_fields(t)) == 20
        assert wkb_to_wkt(t["wkb"][0].as_py()) == "POINT (234907 556200)"
        t = read_lvbag(os.path.join(D, "wpl.xml"))
        assert t.schema.metadata[b"layer"] == b"Woonplaats"
        assert t.num_rows == 2 and len(_fields(t)) == 16
        r = t.to_pylist()
        assert r[0]["naam"] == "Assen"
        assert r[0]["identificatie"] == "NL.IMBAG.Woonplaats.2391"
        assert r[1]["naam"] == "Loon"
        assert r[1]["identificatie"] == "NL.IMBAG.Woonplaats.2392"
