"""range_lookup: broadcast BETWEEN-join vs a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from gis_scripts_ray.stages.rangelookup import range_lookup

RANGES = pa.table(
    {
        "tier": pa.array(["a", "b", "c", "d"], pa.string()),
        "lo": pa.array([0, 100, 250, 1000], pa.int64()),
        "hi": pa.array([99, 199, 999, 5000], pa.int64()),  # gap [200, 249]
    }
)


def _brute(vals):
    out = {}
    for i, v in enumerate(vals):
        for t, lo, hi in zip(
            RANGES["tier"].to_pylist(),
            RANGES["lo"].to_pylist(),
            RANGES["hi"].to_pylist(),
        ):
            if lo <= v <= hi:
                out[i] = t
    return out


class TestRangeLookup:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(5)
        vals = rng.integers(-50, 5500, 3000)
        t = pa.table(
            {
                "rid": pa.array(np.arange(len(vals)), pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        )
        df = range_lookup(ray.data.from_arrow(t), "v", RANGES).to_pandas()
        got = dict(zip(df["rid"].astype(int), df["tier"]))
        assert got == _brute(vals)

    def test_boundaries_and_gap(self, ray_session):
        vals = [0, 99, 100, 199, 200, 249, 250, 5000, 5001, -1]
        t = pa.table(
            {
                "rid": pa.array(np.arange(len(vals)), pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        )
        df = range_lookup(ray.data.from_arrow(t), "v", RANGES).to_pandas()
        got = dict(zip(df["rid"].astype(int), df["tier"]))
        assert got == {0: "a", 1: "a", 2: "b", 3: "b", 6: "c", 7: "d"}

    def test_overlap_rejected(self, ray_session):
        bad = pa.table(
            {
                "tier": pa.array(["x", "y"], pa.string()),
                "lo": pa.array([0, 50], pa.int64()),
                "hi": pa.array([60, 99], pa.int64()),
            }
        )
        t = pa.table({"v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError, match="overlap"):
            range_lookup(ray.data.from_arrow(t), "v", bad)

    def test_inverted_range_rejected(self, ray_session):
        bad = pa.table(
            {
                "tier": pa.array(["x"], pa.string()),
                "lo": pa.array([10], pa.int64()),
                "hi": pa.array([5], pa.int64()),
            }
        )
        t = pa.table({"v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError, match="hi < lo"):
            range_lookup(ray.data.from_arrow(t), "v", bad)

    def test_unsorted_range_table_ok(self, ray_session):
        shuffled = RANGES.take(pa.array([2, 0, 3, 1]))
        t = pa.table(
            {
                "rid": pa.array([0, 1], pa.int64()),
                "v": pa.array([150, 300], pa.int64()),
            }
        )
        df = range_lookup(ray.data.from_arrow(t), "v", shuffled).to_pandas()
        got = dict(zip(df["rid"].astype(int), df["tier"]))
        assert got == {0: "b", 1: "c"}
