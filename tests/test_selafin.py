"""Selafin reader/writer — the published element-attribute semantics
(autotest/ogr/ogr_selafin.py: the 5x5 node grid with values i*5+j
yields element 5 -> 9 and element 10 -> 15 as node-value means)."""

import numpy as np
import pytest

from raydal.io.selafin import (read_selafin, selafin_elements_table,
                               selafin_nodes_table, write_selafin)
from raydal.io.wkt import wkb_to_wkt


@pytest.fixture()
def grid_slf(tmp_path):
    # the reference test's construction: 25 nodes (i, j), values
    # i*5+j, 16 quad elements in i-major order
    xs, ys, vals = [], [], []
    for i in range(5):
        for j in range(5):
            xs.append(float(i))
            ys.append(float(j))
            vals.append(float(i * 5 + j))
    ikle = []
    for i in range(4):
        for j in range(4):
            n = i * 5 + j + 1                # 1-based
            ikle.append([n, n + 1, n + 6, n + 5])
    p = str(tmp_path / "grid.slf")
    write_selafin(p, "raydal test", ["value"], xs, ys,
                  np.array(ikle), times=[0.0], values=[[vals]])
    return p


class TestSelafin:
    def test_roundtrip_nodes(self, grid_slf):
        sel = read_selafin(grid_slf)
        assert sel["title"].startswith("raydal test")
        assert sel["var_names"][0].startswith("value")
        t = selafin_nodes_table(sel)
        assert t.num_rows == 25
        r = t.to_pylist()
        assert wkb_to_wkt(r[0]["wkb"]) == "POINT (0 0)"
        assert r[7]["value"] == 7.0          # node (1,2)

    def test_element_attribute_means(self, grid_slf):
        # published expectations: GetFeature(5) -> 9, GetFeature(10) -> 15
        sel = read_selafin(grid_slf)
        t = selafin_elements_table(sel)
        assert t.num_rows == 16
        vals = t["value"].to_pylist()
        assert vals[5] == pytest.approx(9, abs=0.01)
        assert vals[10] == pytest.approx(15, abs=0.01)
        w = wkb_to_wkt(t["wkb"][5].as_py())
        assert w == "POLYGON ((1 1,1 2,2 2,2 1,1 1))"

    def test_byte_stable_rewrite(self, grid_slf, tmp_path):
        sel = read_selafin(grid_slf)
        p2 = str(tmp_path / "copy.slf")
        write_selafin(p2, sel["title"].rstrip(),
                      [v.rstrip() for v in sel["var_names"]],
                      sel["x"], sel["y"], sel["ikle"],
                      times=sel["times"], values=sel["values"])
        assert open(grid_slf, "rb").read() == open(p2, "rb").read()

    def test_multi_timestep(self, tmp_path):
        p = str(tmp_path / "ts.slf")
        xs = [0.0, 1.0, 0.0]
        ys = [0.0, 0.0, 1.0]
        write_selafin(p, "t", ["h", "u"], xs, ys,
                      np.array([[1, 2, 3]]),
                      times=[0.0, 10.0],
                      values=[[[1, 2, 3], [4, 5, 6]],
                              [[7, 8, 9], [10, 11, 12]]])
        sel = read_selafin(p)
        assert sel["times"] == [0.0, 10.0]
        t1 = selafin_nodes_table(sel, time=1)
        assert t1["h"].to_pylist() == [7.0, 8.0, 9.0]
        assert t1["u"].to_pylist() == [10.0, 11.0, 12.0]
        e = selafin_elements_table(sel, time=0)
        assert e["h"][0].as_py() == pytest.approx(2.0)
