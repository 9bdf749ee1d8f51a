"""Weighted grouped median (stages/stats.grouped_weighted_median).

Pins the integer rank rule (smallest v with 2*cumw >= W) against a
per-row Python brute force, block-structure invariance, weight-1
degeneration to the unweighted lower median, and the forced
hash-shuffle map_groups finish.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from gis_scripts_ray.stages.stats import grouped_median, grouped_weighted_median


def _mk(t, nb):
    import ray.data

    return ray.data.from_arrow(t).repartition(nb)


def _fixture(seed=7, n=3000):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "g": pa.array(rng.integers(0, 5, n).astype(np.int64)),
            "v": pa.array(rng.integers(1, 40, n).astype(np.int64)),
            "w": pa.array(rng.integers(1, 500, n).astype(np.int64)),
        }
    )


def _brute(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    rows = []
    for g, grp in df.groupby("g"):
        grp = grp.sort_values("v")
        W = int(grp["w"].sum())
        cum = 0
        for r in grp.itertuples():
            cum += int(r.w)
            if 2 * cum >= W:
                rows.append((g, r.v, W))
                break
    return pd.DataFrame(rows, columns=["g", "wm", "n"]).astype(np.int64)


def _run(t, nb, **kw) -> pd.DataFrame:
    return (
        grouped_weighted_median(_mk(t, nb), ["g"], "v", "w", out_col="wm", **kw)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
        .astype(np.int64)
    )


class TestWeightedMedian:
    def test_matches_brute_force_and_block_invariant(self, ray_session):
        t = _fixture()
        ref = _brute(t)
        for nb in (1, 7):
            pd.testing.assert_frame_equal(_run(t, nb), ref)

    def test_weight_one_degenerates_to_median(self, ray_session):
        t = _fixture(seed=13, n=1500)
        ones = t.set_column(2, "w", pa.array(np.ones(1500, np.int64)))
        wm = _run(ones, 5)
        m = (
            grouped_median(_mk(t, 5), ["g"], "v", out_col="wm")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
            .astype(np.int64)
        )
        pd.testing.assert_frame_equal(wm, m)

    def test_shuffle_finish_matches(self, ray_session):
        t = _fixture(seed=29)
        pd.testing.assert_frame_equal(_run(t, 6, small_limit=0), _run(t, 6))

    def test_tiebreak_exact_half(self, ray_session):
        # W = 10; cumw hits exactly 5 at v=2 -> 2*5 >= 10 selects v=2
        # (the LOWER weighted median), not v=7
        t = pa.table(
            {
                "g": pa.array([0, 0, 0], pa.int64()),
                "v": pa.array([1, 2, 7], pa.int64()),
                "w": pa.array([2, 3, 5], pa.int64()),
            }
        )
        got = _run(t, 2)
        assert got["wm"].tolist() == [2]
        assert got["n"].tolist() == [10]
