"""Connected components (stages/graphcc.py) vs a per-row union-find
reference: random graphs, chains (worst-case diameter), isolated nodes,
empty edge sets, multi-block inputs, and the non-convergence guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gis_scripts_ray.stages.graphcc import connected_components


def _uf_roots(edges: list[tuple[int, int]], nodes: list[int]) -> dict[int, int]:
    parent: dict[int, int] = {n: n for n in nodes}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id root per component
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run(edges, nodes=None, **kw):
    e = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.int64()),
                "b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    n = (
        ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
        if nodes is not None
        else None
    )
    out = connected_components(e, nodes=n, **kw).to_pandas()
    return dict(zip(out["node"].tolist(), out["root"].tolist()))


class TestConnectedComponents:
    def test_random_graph_matches_union_find(self):
        rng = np.random.default_rng(7)
        nodes = list(range(200))
        edges = [
            (int(rng.integers(0, 200)), int(rng.integers(0, 200)))
            for _ in range(150)
        ]
        assert _run(edges, nodes) == _uf_roots(edges, nodes)

    def test_chain_worst_case_diameter(self):
        # a 12-node chain: min label must walk the full length (each round
        # moves it one hop — the worst case the max_iters bound protects)
        edges = [(i, i + 1) for i in range(11)]
        got = _run(edges)
        assert got == {i: 0 for i in range(12)}

    def test_two_components_and_isolated(self):
        edges = [(10, 11), (11, 12), (20, 21)]
        got = _run(edges, nodes=[10, 11, 12, 20, 21, 99])
        assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 99: 99}

    def test_self_loops_and_duplicate_edges(self):
        edges = [(5, 5), (5, 6), (6, 5), (5, 6)]
        assert _run(edges) == {5: 5, 6: 5}

    def test_empty_edges_isolated_nodes_only(self):
        got = _run([], nodes=[3, 1, 2])
        assert got == {1: 1, 2: 2, 3: 3}

    def test_multiblock_input(self):
        # edges split across many blocks; merging star centers 0 and 1000
        edges = [(0, i) for i in range(1, 50)] + [(1000, 1000 + i) for i in range(1, 50)]
        edges.append((49, 1000))
        e = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([a for a, _ in edges], pa.int64()),
                    "b": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        ).repartition(8)
        out = connected_components(e).to_pandas()
        assert set(out["root"].tolist()) == {0}
        assert len(out) == 100

    def test_join_fallback_equals_broadcast_path(self):
        # forced-low-limit: broadcast_limit=0 routes every round through the
        # hash-join fallback; results must be identical to the fast path
        rng = np.random.default_rng(11)
        nodes = list(range(60))
        edges = [
            (int(rng.integers(0, 60)), int(rng.integers(0, 60)))
            for _ in range(40)
        ]
        fast = _run(edges, nodes)
        slow = _run(edges, nodes, broadcast_limit=0)
        assert fast == slow == _uf_roots(edges, nodes)

    def test_nonconvergence_guard(self):
        edges = [(i, i + 1) for i in range(5)]
        with pytest.raises(RuntimeError, match="did not converge"):
            _run(edges, max_iters=2)


class TestNeardupClustersStarPaths:
    def test_join_fallback_equals_broadcast(self, monkeypatch):
        # forced-low-limit: the star-edge map routes through the hash-join
        # fallback; the rollup must be identical to the broadcast path
        import gis_scripts_ray.queries as q

        sf = "/root/testdata/sf0.001"
        fast = q.q_neardup_clusters(sf).to_pandas()
        monkeypatch.setattr(q, "_STAR_BCAST_LIMIT", 0)
        slow = q.q_neardup_clusters(sf).to_pandas()
        assert fast.equals(slow)
