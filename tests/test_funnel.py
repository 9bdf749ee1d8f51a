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


class TestTransitionCounts:
    """transition_counts: Markov pair counts vs a per-key oracle."""

    def _mk(self, seed, n=3000, keys=29, ts_range=80):
        # small ts range forces plenty of (key, ts) collisions so the
        # event_id tie-break is genuinely exercised
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "uid": pa.array(rng.integers(0, keys, n), pa.int64()),
                "us": pa.array(rng.integers(0, ts_range, n), pa.int64()),
                "eid": pa.array(rng.permutation(n), pa.int64()),
                "etype": pa.array(rng.choice(TYPES, n), pa.string()),
            }
        )

    def _ref(self, table):
        rows = sorted(
            zip(
                table["uid"].to_pylist(),
                table["us"].to_pylist(),
                table["eid"].to_pylist(),
                table["etype"].to_pylist(),
            )
        )
        out = {}
        for (u1, _, _, e1), (u2, _, _, e2) in zip(rows, rows[1:]):
            if u1 == u2:
                out[(e1, e2)] = out.get((e1, e2), 0) + 1
        return out

    def _run(self, table, **kw):
        from gis_scripts_ray.stages.funnel import transition_counts

        df = transition_counts(
            ray.data.from_arrow(table), "uid", "us", "eid", "etype", **kw
        ).to_pandas()
        return {
            (r["from_type"], r["to_type"]): int(r["n"])
            for _, r in df.iterrows()
        }

    def test_matches_reference(self, ray_session):
        t = self._mk(seed=3)
        assert self._run(t, num_buckets=8) == self._ref(t)

    def test_block_boundaries_dont_drop_transitions(self, ray_session):
        """Counts must be block-structure-independent: the same input in
        one block and in many 50-row blocks gives identical counts."""
        from gis_scripts_ray.stages.funnel import transition_counts

        t = self._mk(seed=7, n=700, keys=5)
        one = self._run(t, num_buckets=4)
        import ray as _ray

        many = transition_counts(
            _ray.data.from_arrow(t).repartition(14),
            "uid",
            "us",
            "eid",
            "etype",
            num_buckets=4,
        ).to_pandas()
        many_d = {
            (r["from_type"], r["to_type"]): int(r["n"])
            for _, r in many.iterrows()
        }
        assert one == many_d == self._ref(t)

    def test_single_event_keys_no_output(self, ray_session):
        t = pa.table(
            {
                "uid": pa.array([1, 2, 3], pa.int64()),
                "us": pa.array([5, 5, 5], pa.int64()),
                "eid": pa.array([0, 1, 2], pa.int64()),
                "etype": pa.array(["view", "click", "view"], pa.string()),
            }
        )
        assert self._run(t) == {}


class TestSessionPaths:
    """session_paths_topk: top user journeys vs a per-key oracle."""

    def _ref(self, table, gap, k):
        rows = sorted(
            zip(
                table["uid"].to_pylist(),
                table["us"].to_pylist(),
                table["eid"].to_pylist(),
                table["etype"].to_pylist(),
            )
        )
        paths = {}
        cur, prev = None, None
        for u, t, _, e in rows:
            if prev is None or u != prev[0] or t - prev[1] > gap:
                if cur is not None:
                    paths[cur] = paths.get(cur, 0) + 1
                cur = e
            else:
                cur = f"{cur}>{e}"
            prev = (u, t)
        if cur is not None:
            paths[cur] = paths.get(cur, 0) + 1
        top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return top

    def _run(self, table, gap, k, **kw):
        from gis_scripts_ray.stages.funnel import session_paths_topk

        df = session_paths_topk(
            ray.data.from_arrow(table), "uid", "us", "eid", "etype", gap, k, **kw
        ).to_pandas()
        return sorted(
            zip(df["path"], df["n"].astype(int)), key=lambda kv: (-kv[1], kv[0])
        )

    def _mk(self, seed, n=2500, keys=31, ts_range=400):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "uid": pa.array(rng.integers(0, keys, n), pa.int64()),
                "us": pa.array(rng.integers(0, ts_range, n), pa.int64()),
                "eid": pa.array(rng.permutation(n), pa.int64()),
                "etype": pa.array(rng.choice(TYPES, n), pa.string()),
            }
        )

    def test_matches_reference(self, ray_session):
        t = self._mk(seed=3)
        assert self._run(t, 12, 15, num_buckets=8) == self._ref(t, 12, 15)

    def test_gap_boundary_exact(self, ray_session):
        """Gap EXACTLY equal to the threshold stays in-session (strict >)."""
        t = pa.table(
            {
                "uid": pa.array([1, 1, 1], pa.int64()),
                "us": pa.array([0, 10, 21], pa.int64()),
                "eid": pa.array([0, 1, 2], pa.int64()),
                "etype": pa.array(["view", "click", "purchase"], pa.string()),
            }
        )
        got = self._run(t, 10, 5)
        assert got == [("purchase", 1), ("view>click", 1)]

    def test_block_structure_invariant(self, ray_session):
        from gis_scripts_ray.stages.funnel import session_paths_topk

        t = self._mk(seed=9, n=800, keys=7)
        one = self._run(t, 15, 10, num_buckets=4)
        many = session_paths_topk(
            ray.data.from_arrow(t).repartition(16),
            "uid",
            "us",
            "eid",
            "etype",
            15,
            10,
            num_buckets=4,
        ).to_pandas()
        many_s = sorted(
            zip(many["path"], many["n"].astype(int)),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert one == many_s == self._ref(t, 15, 10)
