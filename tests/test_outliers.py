"""Sigma-outlier stage: python oracle on crafted distributions, exact
threshold boundary, null exclusion, forced broadcast/join path parity."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.outliers import sigma_outlier_counts


def _run(rows, k=2, **kw):
    import ray.data

    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    got = (
        sigma_outlier_counts(ray.data.from_arrow(t), "u", "v", k=k, **kw)
        .to_pandas()
        .sort_values("key")
    )
    return {
        int(r.key): (int(r.n), int(r.n_outliers)) for r in got.itertuples()
    }


def _oracle(rows, k=2):
    out = {}
    by = {}
    for u, v in rows:
        if v is not None:
            by.setdefault(u, []).append(v)
    for u, vs in by.items():
        n, sv, svv = len(vs), sum(vs), sum(v * v for v in vs)
        out[u] = (
            n,
            sum((n * v - sv) ** 2 > k * k * (n * svv - sv * sv) for v in vs),
        )
    return out


class TestSigmaOutliers:
    def test_matches_oracle_random(self, ray_session):
        rng = np.random.default_rng(17)
        rows = [
            (int(rng.integers(0, 8)), int(rng.integers(-50, 400)))
            for _ in range(500)
        ]
        # plant a gross outlier per key
        rows += [(u, 100000) for u in range(8)]
        want = _oracle(rows)
        assert _run(rows) == want
        # forced join path must be bit-identical
        assert _run(rows, broadcast_limit=0) == want

    def test_exact_boundary_is_strict(self, ray_session):
        # constant series: variance 0 => no row is an outlier (strict >)
        rows = [(1, 7)] * 10
        assert _run(rows) == {1: (10, 0)}

    def test_nulls_excluded(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "u": pa.array([1, 1, 1], pa.int64()),
                "v": pa.array([5, None, 500000], pa.int64()),
            }
        )
        got = sigma_outlier_counts(
            ray.data.from_arrow(t), "u", "v", k=2
        ).to_pandas()
        assert got["n"].tolist() == [2]
