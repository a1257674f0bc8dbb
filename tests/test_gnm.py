"""GNM network graphs vs the reference's own fixture and brute force.

Mirrors ``autotest/gnm/gnm_test.py``: build the pipes+wells network
(tolerance 1e-6, cost 1, bidirectional), then Dijkstra / K-shortest /
ConnectedComponents with the autotest's structural assertions.
Algorithm parity is additionally proven against exhaustive brute-force
enumeration on small random graphs.
"""

import itertools
import random
from math import inf

import numpy as np
import pyarrow as pa
import pytest

from raydal.io.shapefile import read_shapefile
from raydal.ops.gnm import (GNM_EDGE_DIR_SRCTOTGT, GNMGraph,
                            build_network_from_tables, sssp_dataset)

PIPES = "/root/reference/autotest/gnm/data/pipes.shp"
WELLS = "/root/reference/autotest/gnm/data/wells.shp"


@pytest.fixture(scope="module")
def network():
    pipes = read_shapefile(PIPES)
    wells = read_shapefile(WELLS)
    g, ranges = build_network_from_tables(
        [("pipes", pipes), ("wells", wells)], 0.000001, 1, 1)
    return g, ranges


def test_gnm_import_counts(network):
    g, ranges = network
    # 33 pipes (edges), 31 wells (vertices), gfids in import order
    assert ranges == {"pipes": (0, 33), "wells": (33, 64)}
    assert len(g.edges) == 33
    assert len(g.out_edges) == 31


def test_gnm_graph_dijkstra(network):
    g, _ = network
    path = g.dijkstra_shortest_path(61, 50)
    assert path, "failed to get path"                  # autotest gate
    assert path[0] == (61, -1)
    assert path[-1][0] == 50
    # every consecutive pair is connected by the stated edge
    for (va, _), (vb, eb) in zip(path, path[1:]):
        e = g.edges[eb]
        assert {va, vb} == {e.src, e.tgt}


def test_gnm_graph_kshortest(network):
    g, _ = network
    paths = g.k_shortest_paths(61, 50, 3)
    assert len(paths) == 3
    # autotest counts features (vertices + edges) in the result layer
    n_features = sum(2 * len(p) - 1 for p in paths)
    assert n_features >= 20, "failed to get 3 k-shortest paths"
    costs = [sum(g.edges[e].dir_cost for _v, e in p if e != -1)
             for p in paths]
    assert costs == sorted(costs)
    assert len({tuple(p) for p in paths}) == 3         # distinct


def test_gnm_graph_connectedcomponents(network):
    g, _ = network
    pairs = g.connected_components([61])
    assert pairs, "failed to get connected components"
    # the pipes/wells net is one component: every vertex reachable
    seen = {61} | {g.opposite_vertex(e, v) for v, e in pairs}
    assert seen == set(g.out_edges)


def test_gnm_blocked_vertex(network):
    g, _ = network
    mid = g.dijkstra_shortest_path(61, 50)[3][0]
    g.block(mid)
    try:
        detour = g.dijkstra_shortest_path(61, 50)
        assert all(v != mid for v, _ in detour)
    finally:
        g.block(mid, False)


def _random_graph(rng, n, m, bidir=True):
    g = GNMGraph()
    for v in range(n):
        g.add_vertex(v)
    for eid in range(m):
        s, t = rng.randrange(n), rng.randrange(n)
        if s == t:
            t = (t + 1) % n
        g.add_edge(100 + eid, s, t, bidir=bidir,
                   cost=round(rng.uniform(0.5, 3.0), 3))
    return g


def _brute_force_dist(g, start, end):
    """Exhaustive min path cost via edge-sequence DFS (simple paths)."""
    best = [inf]

    def walk(v, cost, used_vertices):
        if cost >= best[0]:
            return
        if v == end:
            best[0] = cost
            return
        for eid in g.out_edges[v]:
            e = g.edges[eid]
            o = e.tgt if v == e.src else e.src
            if o not in used_vertices:
                walk(o, cost + e.dir_cost, used_vertices | {o})

    walk(start, 0.0, {start})
    return best[0]


def _path_cost(g, p):
    return sum(g.edges[e].dir_cost for _v, e in p if e != -1)


def test_dijkstra_brute_force_parity():
    rng = random.Random(7)
    for trial in range(40):
        n = rng.randrange(4, 9)
        g = _random_graph(rng, n, rng.randrange(4, 14),
                          bidir=bool(trial % 2))
        a, b = rng.randrange(n), rng.randrange(n)
        want = _brute_force_dist(g, a, b)
        got = g.dijkstra_shortest_path(a, b)
        if want is inf:
            assert got == [] or a == b
        else:
            assert got, f"no path found for {a}->{b} (trial {trial})"
            assert _path_cost(g, got) == pytest.approx(want)


def test_kshortest_brute_force_parity():
    rng = random.Random(11)
    for trial in range(15):
        n = rng.randrange(4, 7)
        g = _random_graph(rng, n, rng.randrange(6, 12), bidir=True)
        a, b = 0, n - 1
        # enumerate ALL simple-path costs exhaustively
        all_costs = []

        def walk(v, cost, used):
            if v == b:
                all_costs.append(cost)
                return
            for eid in g.out_edges[v]:
                e = g.edges[eid]
                o = e.tgt if v == e.src else e.src
                if o not in used:
                    walk(o, cost + e.dir_cost, used | {o})

        walk(a, 0.0, {a})
        ks = g.k_shortest_paths(a, b, 3)
        if not all_costs:
            assert ks == []
            continue
        want = sorted(all_costs)[: len(ks)]
        got = [_path_cost(g, p) for p in ks]
        assert got == pytest.approx(want), f"trial {trial}"


def test_directed_edges_one_way():
    g = GNMGraph()
    g.add_edge(10, 0, 1, bidir=False, cost=1.0)
    assert g.dijkstra_shortest_path(0, 1)
    assert g.dijkstra_shortest_path(1, 0) == []


def test_sssp_dataset_matches_dijkstra(ray_session):
    import ray.data

    rng = random.Random(3)
    g = _random_graph(rng, 30, 70, bidir=False)
    edges = pa.Table.from_pydict({
        "src": pa.array([e.src for e in g.edges.values()], pa.int64()),
        "tgt": pa.array([e.tgt for e in g.edges.values()], pa.int64()),
        "cost": pa.array([e.dir_cost for e in g.edges.values()],
                         pa.float64())})
    got = sssp_dataset(ray.data.from_arrow(edges), 0, directed=True)
    got_d = dict(zip(got["vertex"].to_pylist(), got["dist"].to_pylist()))
    tree = g._shortest_path_tree(0)
    for v in g.out_edges:
        p = g.dijkstra_shortest_path(0, v)
        if p:
            assert got_d[v] == pytest.approx(_path_cost(g, p)), v
        else:
            assert v not in got_d or v == 0
    assert got_d[0] == 0.0
    assert set(got_d) == set(tree)
