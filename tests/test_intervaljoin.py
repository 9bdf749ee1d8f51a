"""Interval-overlap range join (stages/intervaljoin.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gis_scripts_ray.stages.intervaljoin import interval_overlap_pairs


def _mk(t, nb):
    import ray.data

    return ray.data.from_arrow(t).repartition(nb)


def _fixture(seed=3, n=500):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 4, n).astype(np.int64)),
            "side": pa.array(rng.integers(0, 2, n).astype(np.int64)),
            "s": pa.array(rng.integers(0, 5000, n).astype(np.int64)),
            "dur": pa.array(rng.integers(1, 400, n).astype(np.int64)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


def _with_end(t):
    s = t["s"].to_numpy()
    return t.append_column("e", pa.array(s + t["dur"].to_numpy(), pa.int64()))


def _brute(t) -> pd.DataFrame:
    df = _with_end(t).to_pandas()
    a = df[df.side == 0]
    b = df[df.side == 1]
    m = a.merge(b, on="k", suffixes=("_a", "_b"))
    m = m[(m.s_a < m.e_b) & (m.s_b < m.e_a)]
    out = pd.DataFrame(
        {
            "k": m["k"],
            "id_a": m["id_a"],
            "id_b": m["id_b"],
            "overlap": np.minimum(m.e_a, m.e_b) - np.maximum(m.s_a, m.s_b),
        }
    )
    return out.sort_values(["k", "id_a", "id_b"]).reset_index(drop=True).astype(np.int64)


def _run(t, nb, width):
    got = interval_overlap_pairs(
        _mk(_with_end(t), nb),
        key_col="k",
        side_col="side",
        start_col="s",
        end_col="e",
        id_col="id",
        bucket_width=width,
    ).to_pandas()
    return (
        got[["k", "id_a", "id_b", "overlap"]]
        .sort_values(["k", "id_a", "id_b"])
        .reset_index(drop=True)
        .astype(np.int64)
    )


class TestIntervalOverlapJoin:
    def test_matches_brute_force_and_block_invariant(self, ray_session):
        t = _fixture()
        ref = _brute(t)
        assert len(ref) > 50
        for nb in (1, 7):
            pd.testing.assert_frame_equal(_run(t, nb, width=512), ref)

    def test_tiny_buckets_no_double_count(self, ray_session):
        # width 64 << max duration 400: every interval replicates to
        # many tiles; the max(starts)-ownership rule must still emit
        # each pair exactly once
        t = _fixture(seed=9)
        pd.testing.assert_frame_equal(_run(t, 5, width=64), _brute(t))

    def test_huge_bucket_single_tile(self, ray_session):
        t = _fixture(seed=11)
        pd.testing.assert_frame_equal(_run(t, 5, width=1 << 40), _brute(t))

    def test_one_sided_cells_empty(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([0, 0, 1], pa.int64()),
                "side": pa.array([0, 0, 1], pa.int64()),
                "s": pa.array([0, 10, 5], pa.int64()),
                "dur": pa.array([5, 5, 5], pa.int64()),
                "id": pa.array([0, 1, 2], pa.int64()),
            }
        )
        got = interval_overlap_pairs(
            _mk(_with_end(t), 2),
            key_col="k",
            side_col="side",
            start_col="s",
            end_col="e",
            id_col="id",
            bucket_width=100,
        )
        assert got.count() == 0

    def test_half_open_touching_intervals_do_not_overlap(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([0, 0], pa.int64()),
                "side": pa.array([0, 1], pa.int64()),
                "s": pa.array([0, 10], pa.int64()),
                "dur": pa.array([10, 10], pa.int64()),
                "id": pa.array([0, 1], pa.int64()),
            }
        )
        got = interval_overlap_pairs(
            _mk(_with_end(t), 1),
            key_col="k",
            side_col="side",
            start_col="s",
            end_col="e",
            id_col="id",
            bucket_width=8,
        )
        assert got.count() == 0
