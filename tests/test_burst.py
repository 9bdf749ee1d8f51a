"""Burst-pair kernel: python oracle with duplicate timestamps and the
closed upper / open lower window boundary; composite-domain guard."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.burst import burst_pair_counts


def _run(rows, delta, **kw):
    import ray.data

    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    got = burst_pair_counts(
        ray.data.from_arrow(t), "u", "ts", delta, **kw
    ).to_pandas()
    return {int(r.u): int(r.n_pairs) for r in got.itertuples()}


def _oracle(rows, delta):
    out = {}
    for u, ta in rows:
        c = sum(1 for v, tb in rows if v == u and ta < tb <= ta + delta)
        out[u] = out.get(u, 0) + c
    return out


class TestBurstPairs:
    def test_matches_oracle_with_duplicate_timestamps(self, ray_session):
        rng = np.random.default_rng(31)
        rows = [
            (int(rng.integers(0, 6)), int(rng.integers(0, 300)))
            for _ in range(300)
        ]
        assert _run(rows, 25) == _oracle(rows, 25)

    def test_boundaries(self, ray_session):
        # pair at exactly delta counts; identical timestamps never pair
        rows = [(1, 100), (1, 110), (1, 100)]
        assert _run(rows, 10) == {1: 2}  # both t=100 rows pair with t=110
        assert _run(rows, 9) == {1: 0}

    def test_guard_raises_when_domain_overflows(self, ray_session):
        rows = [(k, k * 7) for k in range(64)]
        with pytest.raises(Exception):
            # a 2^60-wide window forces shift+rank_bits > 63
            _run(rows, 1 << 60, num_buckets=1)
