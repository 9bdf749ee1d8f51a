"""BFS crawl-depth tests: exact shortest-hop semantics on crafted
graphs, directedness, unreached exclusion, round bounding, and
forced-path (broadcast vs hash-join delivery) bit-equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.bfs import bfs_depths


def _ds(rows, cols):
    import ray.data

    arrs = {c: pa.array(v, pa.int64()) for c, v in zip(cols, zip(*rows))} if rows else {
        c: pa.array([], pa.int64()) for c in cols
    }
    return ray.data.from_arrow(pa.table(arrs))


def _result(ds):
    t = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return list(zip(t["node"].tolist(), t["depth"].tolist()))


def _py_bfs(edges, seeds, max_rounds):
    """Per-row reference: plain queue BFS."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dep = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dep[u] >= max_rounds:
            continue
        for v in adj[u]:
            if v not in dep:
                dep[v] = dep[u] + 1
                q.append(v)
    return sorted(dep.items())


class TestBfsDepths:
    def test_path_graph(self, ray_session):
        edges = [(i, i + 1) for i in range(9)]
        got = _result(bfs_depths(_ds(edges, ["src", "dst"]), _ds([(0,)], ["node"])))
        assert got == [(i, i) for i in range(10)]

    def test_directed_edges_do_not_flow_backward(self, ray_session):
        # 5 -> 6, seed 6: node 5 must stay unreached
        got = _result(
            bfs_depths(_ds([(5, 6)], ["src", "dst"]), _ds([(6,)], ["node"]))
        )
        assert got == [(6, 0)]

    def test_two_seeds_take_min_depth(self, ray_session):
        # chain 0..6, seeds {0, 5}: node 4 is 4 hops from 0, 6 is 1 from 5
        edges = [(i, i + 1) for i in range(6)]
        got = dict(
            _result(
                bfs_depths(
                    _ds(edges, ["src", "dst"]), _ds([(0,), (5,)], ["node"])
                )
            )
        )
        assert got[4] == 4 and got[5] == 0 and got[6] == 1

    def test_max_rounds_bounds_the_walk(self, ray_session):
        edges = [(i, i + 1) for i in range(9)]
        got = _result(
            bfs_depths(
                _ds(edges, ["src", "dst"]), _ds([(0,)], ["node"]), max_rounds=3
            )
        )
        assert got == [(0, 0), (1, 1), (2, 2), (3, 3)]

    def test_cycle_and_duplicate_edges(self, ray_session):
        edges = [(0, 1), (1, 2), (2, 0), (0, 1), (2, 2)]
        got = _result(
            bfs_depths(_ds(edges, ["src", "dst"]), _ds([(0,)], ["node"]))
        )
        assert got == [(0, 0), (1, 1), (2, 2)]

    def test_random_graph_matches_python_oracle_both_paths(self, ray_session):
        rng = np.random.default_rng(11)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, 60, size=(300, 2))
        ]
        seeds = [0, 7, 13]
        want = _py_bfs(edges, seeds, 32)
        e = _ds(edges, ["src", "dst"])
        s = _ds([(x,) for x in seeds], ["node"])
        got_bcast = _result(bfs_depths(e, s))
        got_join = _result(bfs_depths(e, s, broadcast_limit=0))
        assert got_bcast == want
        assert got_join == want  # forced hash-join path, bit-identical

    def test_empty_edges_label_only_seeds(self, ray_session):
        got = _result(
            bfs_depths(_ds([], ["src", "dst"]), _ds([(3,), (9,)], ["node"]))
        )
        assert got == [(3, 0), (9, 0)]
