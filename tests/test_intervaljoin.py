"""interval_join: distributed band join vs a brute-force O(n*m) oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from gis_scripts_ray.stages.intervaljoin import interval_join


def _mk(seed, n_left=400, n_right=600, keys=9, span=10_000):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "lid": pa.array(np.arange(n_left), pa.int64()),
            "k": pa.array(rng.integers(0, keys, n_left), pa.int64()),
            "lts": pa.array(rng.integers(0, span, n_left), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(np.arange(n_right) + 1_000_000, pa.int64()),
            "k2": pa.array(rng.integers(0, keys, n_right), pa.int64()),
            "rts": pa.array(
                rng.integers(-span // 4, span + span // 4, n_right), pa.int64()
            ),
        }
    )
    return left, right


def _brute(left, right, lo, hi):
    """All (lid, rid) with k==k2 and lts+lo <= rts <= lts+hi."""
    out = set()
    lk, lt, lid = (left[c].to_numpy() for c in ("k", "lts", "lid"))
    rk, rt, rid = (right[c].to_numpy() for c in ("k2", "rts", "rid"))
    for i in range(len(lid)):
        m = (rk == lk[i]) & (rt >= lt[i] + lo) & (rt <= lt[i] + hi)
        for r in rid[m]:
            out.add((int(lid[i]), int(r)))
    return out


def _run(left, right, lo, hi, **kw):
    ds = interval_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_by="k",
        right_by="k2",
        left_ts="lts",
        right_ts="rts",
        lo=lo,
        hi=hi,
        left_cols=["lid"],
        right_cols=["rid"],
        **kw,
    )
    df = ds.to_pandas()
    pairs = set(zip(df["lid"].astype(int), df["rid"].astype(int)))
    assert len(pairs) == len(df), "duplicate pair emitted"
    return pairs, df


class TestIntervalJoin:
    @pytest.mark.parametrize("lo,hi", [(-50, 120), (0, 0), (-7, -3), (30, 900)])
    def test_matches_brute_force(self, ray_session, lo, hi):
        left, right = _mk(seed=3)
        got, _ = _run(left, right, lo, hi, n_buckets=16)
        assert got == _brute(left, right, lo, hi)

    def test_window_wider_than_bucket(self, ray_session):
        """hi - lo far above span/n_buckets forces the width floor (each
        right row still replicates at most twice)."""
        left, right = _mk(seed=5, span=2_000)
        lo, hi = -1_500, 1_500
        got, _ = _run(left, right, lo, hi, n_buckets=64)
        assert got == _brute(left, right, lo, hi)

    def test_forced_fallback_identical(self, ray_session):
        left, right = _mk(seed=7)
        fast, df_f = _run(left, right, -40, 90, n_buckets=8)
        slow, df_s = _run(
            left, right, -40, 90, n_buckets=8, _force_fallback=True
        )
        assert fast == slow

    def test_boundary_inclusive(self, ray_session):
        left = pa.table(
            {
                "lid": pa.array([1], pa.int64()),
                "k": pa.array([0], pa.int64()),
                "lts": pa.array([100], pa.int64()),
            }
        )
        right = pa.table(
            {
                "rid": pa.array([10, 11, 12, 13], pa.int64()),
                "k2": pa.array([0, 0, 0, 0], pa.int64()),
                "rts": pa.array([104, 105, 120, 121], pa.int64()),
            }
        )
        got, _ = _run(left, right, 5, 20)
        assert got == {(1, 11), (1, 12)}

    def test_empty_sides(self, ray_session):
        """Both empty-side cases yield 0 rows WITH the output schema
        intact at the Dataset level (ray 2.49's to_pandas drops columns
        on zero-row datasets, so assert on ds.schema())."""
        left, right = _mk(seed=9, n_left=20, n_right=20)
        for L, R in [(left.schema.empty_table(), right), (left, right.schema.empty_table())]:
            ds = interval_join(
                ray.data.from_arrow(L),
                ray.data.from_arrow(R),
                left_by="k",
                right_by="k2",
                left_ts="lts",
                right_ts="rts",
                lo=-5,
                hi=5,
                left_cols=["lid"],
                right_cols=["rid"],
            )
            assert ds.count() == 0
            assert [f.name for f in ds.schema().base_schema] == ["lid", "rid"]

    def test_key_never_matches_across(self, ray_session):
        """A right key absent from the left (and vice versa) yields no
        pairs even when timestamps line up."""
        left = pa.table(
            {
                "lid": pa.array([1, 2], pa.int64()),
                "k": pa.array([5, 6], pa.int64()),
                "lts": pa.array([0, 0], pa.int64()),
            }
        )
        right = pa.table(
            {
                "rid": pa.array([9, 8], pa.int64()),
                "k2": pa.array([7, 6], pa.int64()),
                "rts": pa.array([0, 0], pa.int64()),
            }
        )
        got, _ = _run(left, right, -1, 1)
        assert got == {(2, 8)}

    def test_lo_gt_hi_rejected(self, ray_session):
        left, right = _mk(seed=11, n_left=4, n_right=4)
        with pytest.raises(ValueError):
            interval_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(right),
                left_by="k",
                right_by="k2",
                left_ts="lts",
                right_ts="rts",
                lo=5,
                hi=4,
                left_cols=["lid"],
                right_cols=["rid"],
            )

    def test_big_values_survive(self, ray_session):
        """int64 payloads above 2^53 must come through exactly (the
        Arrow-position-gather rule — a pandas null-padded union frame
        would round them)."""
        big = 2**62 + 12345
        left = pa.table(
            {
                "lid": pa.array([big], pa.int64()),
                "k": pa.array([1], pa.int64()),
                "lts": pa.array([50], pa.int64()),
            }
        )
        right = pa.table(
            {
                "rid": pa.array([big + 1], pa.int64()),
                "k2": pa.array([1], pa.int64()),
                "rts": pa.array([55], pa.int64()),
            }
        )
        _, df = _run(left, right, 0, 10)
        assert int(df["lid"][0]) == big and int(df["rid"][0]) == big + 1
