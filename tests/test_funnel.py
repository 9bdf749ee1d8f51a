"""funnel_steps: ordered conversion funnel vs a per-key Python oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from gis_scripts_ray.stages.funnel import funnel_steps

STEPS = ["view", "click", "purchase"]
TYPES = STEPS + ["error", "noise"]


def _mk(seed, n=2000, keys=37):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "uid": pa.array(rng.integers(0, keys, n), pa.int64()),
            "us": pa.array(rng.integers(0, 500, n), pa.int64()),
            "etype": pa.array(rng.choice(TYPES, n), pa.string()),
        }
    )


def _ref(table, steps):
    """Earliest-next resolution, strictly-after semantics."""
    rows = sorted(
        zip(
            table["uid"].to_pylist(),
            table["us"].to_pylist(),
            table["etype"].to_pylist(),
        )
    )
    by_key = {}
    for u, t, e in rows:
        by_key.setdefault(u, []).append((t, e))
    out = {}
    for u, evs in by_key.items():
        prev = -(2**62)
        ts_out = []
        for s in steps:
            cand = [t for t, e in evs if e == s and t > prev]
            cur = min(cand) if cand else None
            ts_out.append(cur if cur is not None else -1)
            prev = cur if cur is not None else 2**63 - 1
        depth = sum(1 for t in ts_out if t != -1)
        out[u] = (depth, *ts_out)
    return out


def _run(table, steps, **kw):
    df = funnel_steps(
        ray.data.from_arrow(table), "uid", "us", "etype", steps, **kw
    ).to_pandas()
    cols = ["depth"] + [f"step{i + 1}_us" for i in range(len(steps))]
    return {
        int(r["uid"]): tuple(int(r[c]) for c in cols) for _, r in df.iterrows()
    }


class TestFunnel:
    def test_matches_reference(self, ray_session):
        t = _mk(seed=3)
        assert _run(t, STEPS, num_buckets=8) == _ref(t, STEPS)

    def test_cascade_blocks_later_steps(self, ray_session):
        """A purchase BEFORE the first click never counts, and a missing
        middle step zeroes everything after it."""
        t = pa.table(
            {
                "uid": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "us": pa.array([10, 5, 7, 10, 20], pa.int64()),
                "etype": pa.array(
                    ["view", "purchase", "click", "view", "purchase"],
                    pa.string(),
                ),
            }
        )
        got = _run(t, STEPS)
        # uid 1: view@10, click must be >10 (click@7 is before) -> depth 1
        assert got[1] == (1, 10, -1, -1)
        # uid 2: no click at all -> purchase@20 cannot count
        assert got[2] == (1, 10, -1, -1)

    def test_strictly_after(self, ray_session):
        """A step-2 event at EXACTLY t1 does not count (strict >)."""
        t = pa.table(
            {
                "uid": pa.array([7, 7, 7], pa.int64()),
                "us": pa.array([100, 100, 101], pa.int64()),
                "etype": pa.array(["view", "click", "click"], pa.string()),
            }
        )
        got = _run(t, ["view", "click"])
        assert got[7] == (2, 100, 101)

    def test_repeated_step_type(self, ray_session):
        """The same type can appear at several funnel positions."""
        t = _mk(seed=11, n=600, keys=13)
        steps = ["click", "click", "click"]
        assert _run(t, steps, num_buckets=4) == _ref(t, steps)

    def test_empty_and_rejects(self, ray_session):
        t = _mk(seed=13, n=50)
        with pytest.raises(ValueError):
            funnel_steps(ray.data.from_arrow(t), "uid", "us", "etype", [])
        empty = t.schema.empty_table()
        ds = funnel_steps(
            ray.data.from_arrow(empty), "uid", "us", "etype", STEPS
        )
        assert ds.count() == 0
        assert [f.name for f in ds.schema().base_schema] == [
            "uid",
            "depth",
            "step1_us",
            "step2_us",
            "step3_us",
        ]
