"""GNM — geographic network model (graphs over vector layers).

Reference semantics: ``gnm/gnmgraph.cpp`` (GNMGraph: AddEdge :73,
DijkstraShortestPathTree :457, DijkstraShortestPath :184,
KShortestPaths — Yen's algorithm — :247, ConnectedComponents :427,
TraceTargets breadth-first trace) and ``gnm/gnmgenericnetwork.cpp``
(ConnectPointsByLines :534 — snap line endpoints to point features
within tolerance/2 and emit one edge per line; GFIDs are assigned
sequentially in layer-import order, GetNewGlobalFID :169).

Two surfaces:

* A driver-side :class:`GNMGraph` with reference-parity algorithms —
  graphs that fit one process (the reference's own scope: GNMGraph is
  a ``std::map`` in memory).
* A distributed single-source shortest path (:func:`sssp_dataset`) for
  edge tables far beyond one node: Bellman-Ford as iterative Ray Data
  joins — each round relaxes every edge once via a broadcast of the
  current frontier, converging in at most ``diameter`` rounds.  Only
  (vertex, dist) pairs shuffle, never geometry.

A path is a list of ``(vertex_fid, edge_fid)`` pairs, edge ``-1`` on
the start vertex — the reference's GNMPATH layout.
"""

from __future__ import annotations

import heapq
from math import inf

__all__ = ["GNMGraph", "GNM_EDGE_DIR_BOTH", "GNM_EDGE_DIR_SRCTOTGT",
           "connect_points_by_lines", "build_network_from_tables",
           "sssp_dataset"]

GNM_EDGE_DIR_BOTH = 0
GNM_EDGE_DIR_SRCTOTGT = 1


class _Edge:
    __slots__ = ("src", "tgt", "bidir", "dir_cost", "inv_cost", "blocked")

    def __init__(self, src, tgt, bidir, dir_cost, inv_cost):
        self.src = src
        self.tgt = tgt
        self.bidir = bidir
        self.dir_cost = dir_cost
        self.inv_cost = inv_cost
        self.blocked = False


class GNMGraph:
    """In-memory network graph with GDAL-GNM-parity algorithms."""

    def __init__(self):
        self.out_edges: dict[int, list[int]] = {}   # vertex → edge fids
        self.blocked_v: dict[int, bool] = {}
        self.edges: dict[int, _Edge] = {}

    # -- construction (gnmgraph.cpp:46 AddVertex, :73 AddEdge) --------

    def add_vertex(self, fid):
        if fid not in self.out_edges:
            self.out_edges[fid] = []
            self.blocked_v[fid] = False

    def add_edge(self, con_fid, src, tgt, bidir=True, cost=1.0,
                 inv_cost=1.0):
        if con_fid in self.edges:
            raise ValueError(f"edge {con_fid} already exists")
        self.add_vertex(src)
        self.add_vertex(tgt)
        self.edges[con_fid] = _Edge(src, tgt, bidir, cost, inv_cost)
        self.out_edges[src].append(con_fid)
        if bidir:
            self.out_edges[tgt].append(con_fid)

    def change_edge(self, fid, cost, inv_cost):
        e = self.edges[fid]
        e.dir_cost, e.inv_cost = cost, inv_cost

    def block(self, fid, blocked=True):
        """Block/unblock a vertex or an edge by fid (gnmgraph.cpp:142)."""
        if fid in self.blocked_v:
            self.blocked_v[fid] = blocked
        if fid in self.edges:
            self.edges[fid].blocked = blocked

    def opposite_vertex(self, edge_fid, vertex_fid):
        e = self.edges[edge_fid]
        return e.tgt if vertex_fid == e.src else e.src

    # -- Dijkstra (gnmgraph.cpp:457 / :184) ----------------------------

    def _shortest_path_tree(self, start, cost_override=None):
        """vertex → incoming edge fid of the Dijkstra tree rooted at
        ``start``.  Matches DijkstraShortestPathTree: direct cost only
        (even on bidirectional edges), blocked vertices/edges skipped,
        settled vertices never relaxed again."""
        marks = {v: inf for v in self.out_edges}
        if start not in marks:
            return {}
        marks[start] = 0.0
        tree = {start: -1}
        seen = set()
        heap = [(0.0, start)]
        while heap:
            cur_mark, cur = heapq.heappop(heap)
            if cur in seen:
                continue
            seen.add(cur)
            for eid in self.out_edges.get(cur, ()):
                e = self.edges[eid]
                if e.blocked:
                    continue
                cost = e.dir_cost if cost_override is None \
                    else cost_override.get(eid, e.dir_cost)
                tgt = e.tgt if cur == e.src else e.src
                new_mark = cur_mark + cost
                if tgt not in seen and new_mark < marks.get(tgt, inf) \
                        and not self.blocked_v.get(tgt, False):
                    marks[tgt] = new_mark
                    tree[tgt] = eid
                    heapq.heappush(heap, (new_mark, tgt))
        return tree

    def dijkstra_shortest_path(self, start, end, cost_override=None):
        """[(vertex, edge)] start→end; empty list when unreachable.
        gnmgraph.cpp:184 — walk the tree backwards from ``end``."""
        tree = self._shortest_path_tree(start, cost_override)
        path = []
        cur = end
        while True:
            if cur not in tree:
                return []
            eid = tree[cur]
            if cur == start:
                path.append((cur, -1))
                path.reverse()
                return path
            path.append((cur, eid))
            cur = self.opposite_vertex(eid, cur)

    # -- Yen's K shortest paths (gnmgraph.cpp:247) ---------------------

    def k_shortest_paths(self, start, end, k):
        if k == 0:
            return []
        first = self.dijkstra_shortest_path(start, end)
        if not first:
            return []
        A = [first]
        B: list[tuple[float, list]] = []   # heap of (cost, seq, path)
        seq = 0
        for _k in range(k - 1):
            ak = A[-1]
            for i in range(len(ak) - 1):
                spur = ak[i][0]
                root = ak[: i + 1]
                removed = {}
                # hide the next edge of every known path sharing this root
                for p in A:
                    if i >= len(p):
                        continue
                    if p[: i + 1] == root and i < len(p) - 1:
                        eid = p[i + 1][1]
                        removed.setdefault(eid, inf)
                # hide every out-edge of the root vertices except spur
                for v, _e in root[:-1]:
                    for eid in self.out_edges.get(v, ()):
                        removed.setdefault(eid, inf)
                spur_path = self.dijkstra_shortest_path(
                    spur, end, cost_override=removed)
                if spur_path:
                    full = root + spur_path[1:]
                    cost = sum(self.edges[e].dir_cost
                               for _v, e in full if e != -1)
                    heapq.heappush(B, (cost, seq, full))
                    seq += 1
            if not B:
                break
            A.append(heapq.heappop(B)[2])
            while B and B[0][2] == A[-1]:
                heapq.heappop(B)
        return A

    # -- ConnectedComponents (gnmgraph.cpp:427 + TraceTargets) ---------

    def connected_components(self, emitters):
        """Breadth-first trace from the emitter vertices; returns the
        reference's (vertex, out-edge) pair sequence."""
        if not emitters:
            raise ValueError("emitters list is empty")
        marked = set()
        connected = []
        queue = list(emitters)
        while queue:
            nxt = []
            for cur in queue:
                if cur in marked:
                    continue
                marked.add(cur)
                for eid in self.out_edges.get(cur, ()):
                    connected.append((cur, eid))
                    tgt = self.opposite_vertex(eid, cur)
                    if tgt not in marked \
                            and not self.blocked_v.get(tgt, False):
                        nxt.append(tgt)
            queue = nxt
        return connected


# -- network building from vector tables (ConnectPointsByLines) --------

def _line_endpoints(wkb):
    """(x0, y0, x1, y1) of a LINESTRING/first-of-MULTILINESTRING WKB."""
    import struct

    bo = "<" if wkb[0] == 1 else ">"
    gtype = struct.unpack(bo + "I", wkb[1:5])[0] & 0xFF
    off = 5
    if gtype == 5:          # MultiLineString: first part
        off += 4            # skip count
        bo = "<" if wkb[off] == 1 else ">"
        off += 5
    elif gtype != 2:
        raise ValueError(f"not a line geometry (wkb type {gtype})")
    n = struct.unpack(bo + "I", wkb[off:off + 4])[0]
    off += 4
    x0, y0 = struct.unpack(bo + "2d", wkb[off:off + 16])
    last = off + (n - 1) * 16
    x1, y1 = struct.unpack(bo + "2d", wkb[last:last + 16])
    return x0, y0, x1, y1


def connect_points_by_lines(graph, lines, points, tolerance,
                            cost=1.0, inv_cost=1.0,
                            direction=GNM_EDGE_DIR_BOTH):
    """gnmgenericnetwork.cpp:534 — snap each line's endpoints to the
    first point within ``tolerance/2`` (bbox test) and add one edge per
    line.  ``lines``/``points`` are (gfid, wkb) sequences; point WKBs
    are 21-byte POINTs."""
    import struct

    half = tolerance / 2.0
    pts = []
    for gfid, wkb in points:
        bo = "<" if wkb[0] == 1 else ">"
        x, y = struct.unpack(bo + "2d", wkb[5:21])
        pts.append((gfid, x, y))
        graph.add_vertex(gfid)

    def nearest(x, y):
        for gfid, px, py in pts:
            if abs(px - x) <= half and abs(py - y) <= half:
                return gfid
        return -1

    for gfid, wkb in lines:
        x0, y0, x1, y1 = _line_endpoints(wkb)
        src = nearest(x0, y0)
        tgt = nearest(x1, y1)
        if src == -1 or tgt == -1:
            continue
        graph.add_edge(gfid, src, tgt,
                       bidir=(direction == GNM_EDGE_DIR_BOTH),
                       cost=cost, inv_cost=inv_cost)
    return graph


def build_network_from_tables(layers, tolerance, cost=1.0, inv_cost=1.0,
                              direction=GNM_EDGE_DIR_BOTH):
    """Import pyarrow tables (each with a ``wkb`` column) in order,
    assigning global FIDs sequentially per feature — the reference's
    layer-import numbering (GetNewGlobalFID) — then autoconnect.

    Returns (graph, per-layer gfid ranges)."""
    gfid = 0
    lines, points, ranges = [], [], {}
    for name, table in layers:
        wkbs = table["wkb"].to_pylist()
        start = gfid
        for w in wkbs:
            code = int.from_bytes(
                w[1:5], "little" if w[0] == 1 else "big") & 0xFF
            if code in (2, 5):
                lines.append((gfid, w))
            elif code == 1:
                points.append((gfid, w))
            gfid += 1
        ranges[name] = (start, gfid)
    g = GNMGraph()
    connect_points_by_lines(g, lines, points, tolerance, cost,
                            inv_cost, direction)
    return g, ranges


# -- distributed SSSP ---------------------------------------------------

def sssp_dataset(edges_ds, source, src_col="src", tgt_col="tgt",
                 cost_col="cost", directed=True, max_rounds=64):
    """Single-source shortest paths over an edge Dataset that is too
    large for one process: Bellman-Ford, one edge-relaxation sweep per
    round.

    Each round broadcasts only the CHANGED (vertex, dist) frontier via
    ``ray.put`` (bounded by the graph's vertex count, never its edge
    count), relaxes every edge against it inside ``map_batches``
    (vectorized numpy), and partially min-reduces candidate distances
    inside each task before a small driver-side merge — the same
    partial-then-reduce shape as the engine's aggregates.  Converges in
    at most ``diameter`` rounds; positive costs required.

    Returns a pyarrow table (vertex, dist) of reached vertices.
    """
    import numpy as np
    import pyarrow as pa
    import ray

    # pin the (src, tgt, cost) blocks in the object store once — every
    # relaxation round re-iterates them, and without this the upstream
    # read/transform would re-execute per round
    edges_ds = edges_ds.materialize()

    dist = {source: 0.0}
    frontier = {source: 0.0}
    for _round in range(max_rounds):
        fv = np.fromiter(frontier.keys(), dtype=np.int64,
                         count=len(frontier))
        fd = np.fromiter(frontier.values(), dtype=np.float64,
                         count=len(frontier))
        order = np.argsort(fv)
        fref = ray.put((fv[order], fd[order]))

        def relax(batch: pa.Table, _fref=fref) -> pa.Table:
            fvs, fds = ray.get(_fref)
            s0 = np.asarray(batch[src_col])
            t0 = np.asarray(batch[tgt_col])
            c0 = np.asarray(batch[cost_col], dtype=np.float64)
            if directed:
                src, tgt, cost = s0, t0, c0
            else:
                src = np.concatenate([s0, t0])
                tgt = np.concatenate([t0, s0])
                cost = np.concatenate([c0, c0])
            # vectorized frontier lookup: searchsorted into the sorted
            # broadcast (vertex, dist) arrays
            pos = np.searchsorted(fvs, src)
            pos_c = np.clip(pos, 0, len(fvs) - 1)
            hit = (len(fvs) > 0) & (fvs[pos_c] == src)
            base = np.where(hit, fds[pos_c], np.inf)
            ok = np.isfinite(base)
            if not ok.any():
                return pa.Table.from_pydict({
                    "vertex": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64())})
            cand_v = tgt[ok]
            cand_d = base[ok] + cost[ok]
            # partial min-reduce per task
            order = np.argsort(cand_v, kind="stable")
            cand_v, cand_d = cand_v[order], cand_d[order]
            first = np.ones(len(cand_v), dtype=bool)
            first[1:] = cand_v[1:] != cand_v[:-1]
            idx = np.nonzero(first)[0]
            mins = np.minimum.reduceat(cand_d, idx)
            return pa.Table.from_pydict({
                "vertex": pa.array(cand_v[idx], pa.int64()),
                "dist": pa.array(mins, pa.float64())})

        new_frontier = {}
        for b in edges_ds.map_batches(
                relax, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for v, d in zip(b["vertex"].to_pylist(),
                            b["dist"].to_pylist()):
                if d < dist.get(v, np.inf) \
                        and d < new_frontier.get(v, np.inf):
                    new_frontier[v] = d
        if not new_frontier:
            break
        dist.update(new_frontier)
        frontier = new_frontier
    else:
        raise RuntimeError(
            f"sssp_dataset did not converge in {max_rounds} rounds "
            f"({len(frontier)} vertices still improving); raise "
            f"max_rounds above the graph's hop diameter")
    items = sorted(dist.items())
    return pa.Table.from_pydict({
        "vertex": pa.array([v for v, _ in items], pa.int64()),
        "dist": pa.array([d for _, d in items], pa.float64())})
