"""Interval-union coverage tests: brute-force oracle on hostile random
inputs, touching-interval semantics, cross-block merging, empties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.intervals import _merge_islands, interval_coverage


def _brute(rows):
    """Per-key python oracle: sweep-merge with strict-> new-island rule."""
    out = {}
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, iv in by_key.items():
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[k] = (
            len(iv),
            len(islands),
            sum(e - s for s, e in islands),
        )
    return out


def _run(rows, ray_blocks=1):
    import ray.data

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([r[1] for r in rows], pa.int64()),
            "e": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if ray_blocks > 1:
        ds = ds.repartition(ray_blocks)
    got = interval_coverage(ds, "k", "s", "e").to_pandas()
    return {
        int(r.k): (int(r.n_intervals), int(r.n_islands), int(r.covered))
        for r in got.itertuples()
    }


class TestMergeIslandsKernel:
    def test_touching_intervals_merge(self):
        df = pd.DataFrame(
            {"k": [1, 1], "s": [0, 10], "e": [10, 20], "n": [1, 1]}
        )
        out = _merge_islands(df, "k", "s", "e", "n")
        assert out["s"].tolist() == [0] and out["e"].tolist() == [20]

    def test_strict_gap_splits(self):
        df = pd.DataFrame(
            {"k": [1, 1], "s": [0, 11], "e": [10, 20], "n": [1, 1]}
        )
        out = _merge_islands(df, "k", "s", "e", "n")
        assert len(out) == 2

    def test_contained_interval_absorbed(self):
        df = pd.DataFrame(
            {"k": [1, 1, 1], "s": [0, 2, 30], "e": [20, 5, 40], "n": [1, 1, 1]}
        )
        out = _merge_islands(df, "k", "s", "e", "n")
        assert out["e"].tolist() == [20, 40] and out["n"].tolist() == [2, 1]

    def test_keys_never_merge_across(self):
        df = pd.DataFrame(
            {"k": [1, 2], "s": [0, 5], "e": [10, 15], "n": [1, 1]}
        )
        out = _merge_islands(df, "k", "s", "e", "n")
        assert len(out) == 2

    def test_empty(self):
        df = pd.DataFrame({"k": [], "s": [], "e": [], "n": []})
        assert len(_merge_islands(df, "k", "s", "e", "n")) == 0


class TestIntervalCoverage:
    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.default_rng(23)
        rows = []
        for _ in range(600):
            k = int(rng.integers(0, 12))
            s = int(rng.integers(0, 1000))
            rows.append((k, s, s + int(rng.integers(0, 80))))
        want = _brute(rows)
        assert _run(rows) == want
        # cross-block merging: same rows split over many blocks must
        # produce the identical union (partials re-merge in the final)
        assert _run(rows, ray_blocks=7) == want

    def test_zero_length_intervals_count_but_cover_nothing(self, ray_session):
        rows = [(1, 5, 5), (1, 5, 5), (1, 100, 101)]
        got = _run(rows)
        assert got == {1: (3, 2, 1)}

    def test_single_user_single_interval(self, ray_session):
        assert _run([(9, 3, 8)]) == {9: (1, 1, 5)}
