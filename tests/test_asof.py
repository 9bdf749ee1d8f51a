"""Backward as-of join: equivalence vs a single-partition pandas
merge_asof oracle, across bucket counts and block structures, plus the
carry-seed and edge-case paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.asof import asof_join_backward


def _oracle(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Global single-partition reference: plain pandas merge_asof."""
    out = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="ts",
        right_on="rts",
        left_by="k",
        right_by="rk",
        direction="backward",
    ).dropna(subset=["rts"])
    out["val"] = out["val"].astype(np.int64)
    return (
        out[["lid", "k", "ts", "val"]]
        .sort_values("lid")
        .reset_index(drop=True)
    )


def _run(left, right, n_buckets, l_parts=7, r_parts=5):
    import ray.data

    lds = ray.data.from_arrow(
        pa.table(
            {
                "lid": pa.array(left["lid"], pa.int64()),
                "k": pa.array(left["k"], pa.int64()),
                "ts": pa.array(left["ts"], pa.int64()),
            }
        )
    ).repartition(l_parts)
    rds = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(right["rk"], pa.int64()),
                "rts": pa.array(right["rts"], pa.int64()),
                "val": pa.array(right["val"], pa.int64()),
            }
        )
    ).repartition(r_parts)
    out = asof_join_backward(
        lds,
        rds,
        left_ts="ts",
        right_ts="rts",
        left_by="k",
        right_by="rk",
        carry_cols=["val"],
        n_buckets=n_buckets,
    ).to_pandas()
    return (
        out[["lid", "k", "ts", "val"]].sort_values("lid").reset_index(drop=True)
    )


def _random_case(seed, n_left=4000, n_right=1500, n_keys=12, span=100_000):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(n_left, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_left),
            "ts": rng.integers(0, span, n_left),
        }
    )
    # unique (key, ts) on the right — the operator's tie contract
    rk = rng.integers(0, n_keys, n_right)
    rts = rng.choice(span, n_right, replace=False).astype(np.int64)
    right = pd.DataFrame(
        {"rk": rk, "rts": rts, "val": np.arange(n_right, dtype=np.int64)}
    )
    return left, right


class TestAsofJoin:
    @pytest.mark.parametrize("n_buckets", [1, 5, 64])
    def test_matches_global_oracle(self, ray_session, n_buckets):
        left, right = _random_case(20)
        got = _run(left, right, n_buckets)
        ref = _oracle(left, right)
        pd.testing.assert_frame_equal(got, ref)
        assert len(ref) > 0

    def test_carry_across_empty_buckets(self, ray_session):
        # all right rows in the earliest range, left rows far later: every
        # match must come from the forward-filled carry seeds
        left = pd.DataFrame(
            {
                "lid": np.arange(50, dtype=np.int64),
                "k": np.arange(50, dtype=np.int64) % 3,
                "ts": 90_000 + np.arange(50, dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "rk": np.array([0, 0, 1, 2], dtype=np.int64),
                "rts": np.array([10, 20, 15, 99_999], dtype=np.int64),
                "val": np.array([100, 200, 300, 400], dtype=np.int64),
            }
        )
        got = _run(left, right, n_buckets=32)
        ref = _oracle(left, right)
        pd.testing.assert_frame_equal(got, ref)
        # key 0 events must all match val=200 (latest of the two early rows)
        assert (got[got["k"] == 0]["val"] == 200).all()

    def test_carry_values_above_2_53_exact(self, ray_session):
        """int64 carry values above 2^53 must survive bit-exactly even in
        buckets containing unmatched left rows — the merge_asof float64
        NaN-promotion must never touch real carry values."""
        big = np.int64(2**53 + 1)  # rounds to 2**53 through float64
        left = pd.DataFrame(
            {
                "lid": np.array([0, 1], dtype=np.int64),
                "k": np.array([7, 8], dtype=np.int64),  # k=8 never matches
                "ts": np.array([100, 100], dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "rk": np.array([7], dtype=np.int64),
                "rts": np.array([50], dtype=np.int64),
                "val": np.array([big], dtype=np.int64),
            }
        )
        got = _run(left, right, n_buckets=4)
        assert got["lid"].tolist() == [0]
        assert got["val"].tolist() == [int(big)]

    def test_unmatched_left_dropped(self, ray_session):
        left = pd.DataFrame(
            {
                "lid": np.array([0, 1, 2], dtype=np.int64),
                "k": np.array([0, 1, 9], dtype=np.int64),  # key 9 not on right
                "ts": np.array([5, 100, 100], dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "rk": np.array([0, 1], dtype=np.int64),
                "rts": np.array([50, 60], dtype=np.int64),
                "val": np.array([7, 8], dtype=np.int64),
            }
        )
        got = _run(left, right, n_buckets=4, l_parts=2, r_parts=1)
        # lid 0 precedes every right row; lid 2's key has no right rows
        assert got["lid"].tolist() == [1]
        assert got["val"].tolist() == [8]

    def test_block_structure_invariance(self, ray_session):
        left, right = _random_case(21, n_left=1500, n_right=600)
        ref = _oracle(left, right)
        for lp, rp in ((1, 1), (13, 3)):
            got = _run(left, right, n_buckets=16, l_parts=lp, r_parts=rp)
            pd.testing.assert_frame_equal(got, ref)

    def test_duplicate_key_ts_rejected(self, ray_session):
        """The (key, ts) uniqueness contract is ASSERTED, not assumed
        (round-4 verdict): two right rows sharing (key, ts) with
        different carry values raise instead of silently picking one —
        both for duplicates inside the left span (bucket merge / carry
        partial) and before it (carry-only path)."""
        left = pd.DataFrame(
            {"lid": [0, 1], "k": [3, 3], "ts": [50, 90]}
        ).astype(np.int64)
        for dup_ts in (40, 60):  # before the left span / inside it
            right = pd.DataFrame(
                {"rk": [3, 3, 3], "rts": [dup_ts, dup_ts, 70], "val": [7, 8, 9]}
            ).astype(np.int64)
            for rp in (1, 3):  # same-block and cross-block duplicates
                with pytest.raises(Exception, match="uniqueness"):
                    _run(left, right, n_buckets=4, r_parts=rp)
        # identical full rows are a collapse, not a violation
        right_ok = pd.DataFrame(
            {"rk": [3, 3, 3], "rts": [40, 40, 60], "val": [7, 7, 9]}
        ).astype(np.int64)
        got = _run(left, right_ok, n_buckets=4)
        assert got["val"].tolist() == [7, 9]
