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


# --- band join (interval_join): restored r5 tests ---
import pytest
import ray

from gis_scripts_ray.stages.intervaljoin import interval_join

def _mk_band(seed, n_left=400, n_right=600, keys=9, span=10_000):
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


def _brute_band(left, right, lo, hi):
    """All (lid, rid) with k==k2 and lts+lo <= rts <= lts+hi."""
    out = set()
    lk, lt, lid = (left[c].to_numpy() for c in ("k", "lts", "lid"))
    rk, rt, rid = (right[c].to_numpy() for c in ("k2", "rts", "rid"))
    for i in range(len(lid)):
        m = (rk == lk[i]) & (rt >= lt[i] + lo) & (rt <= lt[i] + hi)
        for r in rid[m]:
            out.add((int(lid[i]), int(r)))
    return out


def _run_band(left, right, lo, hi, **kw):
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
        left, right = _mk_band(seed=3)
        got, _ = _run_band(left, right, lo, hi, n_buckets=16)
        assert got == _brute_band(left, right, lo, hi)

    def test_window_wider_than_bucket(self, ray_session):
        """hi - lo far above span/n_buckets forces the width floor (each
        right row still replicates at most twice)."""
        left, right = _mk_band(seed=5, span=2_000)
        lo, hi = -1_500, 1_500
        got, _ = _run_band(left, right, lo, hi, n_buckets=64)
        assert got == _brute_band(left, right, lo, hi)

    def test_forced_fallback_identical(self, ray_session):
        left, right = _mk_band(seed=7)
        fast, df_f = _run_band(left, right, -40, 90, n_buckets=8)
        slow, df_s = _run_band(
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
        got, _ = _run_band(left, right, 5, 20)
        assert got == {(1, 11), (1, 12)}

    def test_empty_sides(self, ray_session):
        """Both empty-side cases yield 0 rows WITH the output schema
        intact at the Dataset level (ray 2.49's to_pandas drops columns
        on zero-row datasets, so assert on ds.schema())."""
        left, right = _mk_band(seed=9, n_left=20, n_right=20)
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
        got, _ = _run_band(left, right, -1, 1)
        assert got == {(2, 8)}

    def test_lo_gt_hi_rejected(self, ray_session):
        left, right = _mk_band(seed=11, n_left=4, n_right=4)
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
        _, df = _run_band(left, right, 0, 10)
        assert int(df["lid"][0]) == big and int(df["rid"][0]) == big + 1
