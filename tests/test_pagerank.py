"""Fixed-point PageRank: pure-python reference parity, forced
join-path == broadcast-path equivalence, dangling nodes, multi-edges.
The repo rule: every distributed kernel keeps a per-row/per-node
reference implementation and a bit-exactness parity test."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.pagerank import pagerank_fixed_point

SCALE, DAMP = 1_000_000, 850_000


def ref_pagerank(edges, n, iters=3, damp=DAMP, scale=SCALE):
    """Dict-and-loop reference of the exact integer recurrence."""
    deg = Counter(s for s, _ in edges)
    r = [scale] * n
    for _ in range(iters):
        s = [0] * n
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = [scale - damp + (damp * x) // scale for x in s]
    return r


def _run(edges, n, ray_ds=None, **kw):
    import ray.data

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        pagerank_fixed_point(ds, n_nodes=n, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["node"].tolist() == list(range(n))
    return out["rank"].tolist()


class TestPagerankParity:
    def test_small_graph_matches_reference(self, ray_session):
        # a hub (3), a chain, a 2-cycle, a dangling node (5)
        edges = [(0, 3), (1, 3), (2, 3), (3, 4), (4, 0), (0, 1), (1, 2)]
        assert _run(edges, 6) == ref_pagerank(edges, 6)

    def test_random_graph_matches_reference(self, ray_session):
        rng = np.random.default_rng(17)
        n = 40
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 300), rng.integers(0, n, 300))
        ]
        assert _run(edges, n) == ref_pagerank(edges, n)

    def test_multi_edges_count_multiply(self, ray_session):
        once = _run([(0, 1), (0, 2)], 3)
        twice = _run([(0, 1), (0, 1), (0, 2)], 3)
        assert once != twice  # the duplicate edge shifts mass toward 1
        assert twice == ref_pagerank([(0, 1), (0, 1), (0, 2)], 3)

    def test_no_edges_all_teleport(self, ray_session):
        assert _run([], 4) == [SCALE - DAMP] * 4

    def test_join_path_equals_broadcast_path(self, ray_session):
        """broadcast_limit=0 forces the hash-join delivery; results must
        be byte-identical to the measured-broadcast fast path (the
        forced-low-guard house pattern)."""
        rng = np.random.default_rng(23)
        n = 25
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 120), rng.integers(0, n, 120))
        ]
        assert _run(edges, n, broadcast_limit=0, num_partitions=4) == _run(edges, n)

    def test_bad_damping_rejected(self):
        import ray.data

        with pytest.raises(ValueError):
            pagerank_fixed_point(
                ray.data.from_items([{"src": 0, "dst": 1}]), n_nodes=2, damp=0
            )

    def test_hub_graph_matches_reference(self, ray_session):
        """A node with every edge pointing at it accumulates s ~ n*scale —
        exercises the decomposed damping product on large s."""
        n = 30
        edges = [(i, 0) for i in range(1, n)]
        assert _run(edges, n) == ref_pagerank(edges, n)

    def test_damping_decomposition_identity(self):
        """The stage computes damp*(s//scale) + (damp*(s%scale))//scale;
        the SQL twin computes (damp*s)//scale in HUGEINT. Pin their
        equality where it matters: s beyond the naive int64 wrap point
        (indegree ~1e7 hubs at web scale)."""
        for s in (0, 1, SCALE - 1, SCALE, 7 * SCALE + 123456,
                  10**13, 2**62, 2**63 - 1):
            whole = (DAMP * s) // SCALE  # python ints: no wrap
            decomposed = DAMP * (s // SCALE) + (DAMP * (s % SCALE)) // SCALE
            assert whole == decomposed, s
            if s <= 2**62:  # numpy int64 path the stage actually runs
                a = np.array([s], dtype=np.int64)
                got = DAMP * (a // SCALE) + (DAMP * (a % SCALE)) // SCALE
                assert int(got[0]) == whole


class TestBlockInvariance:
    def test_ranks_partition_invariant(self, ray_session):
        import ray.data

        rng = np.random.default_rng(31)
        n = 30
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 150), rng.integers(0, n, 150))
        ]
        t = pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
        outs = []
        for nparts in (1, 6):
            df = (
                pagerank_fixed_point(
                    ray.data.from_arrow(t).repartition(nparts), n_nodes=n
                )
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )
            outs.append(df)
        assert outs[0].equals(outs[1])
