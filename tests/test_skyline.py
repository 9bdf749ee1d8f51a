"""Skyline tests: brute-force dominance oracle on hostile inputs
(duplicates, collinear ties), block-structure invariance, forced
coalesce path."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.skyline import skyline_2d, skyline_batch


def _brute(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (bx <= x and by <= y and (bx < x or by < y))
            for j, (bx, by) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _table(pts):
    return pa.table(
        {
            "id": pa.array(range(len(pts)), pa.int64()),
            "x": pa.array([p[0] for p in pts], pa.int64()),
            "y": pa.array([p[1] for p in pts], pa.int64()),
        }
    )


class TestSkylineKernel:
    def test_matches_brute_force_with_duplicates(self):
        rng = np.random.default_rng(5)
        pts = [
            (int(a), int(b))
            for a, b in rng.integers(0, 25, size=(400, 2))
        ]
        got = skyline_batch(_table(pts), "x", "y")
        got_pts = sorted(zip(got["x"].to_pylist(), got["y"].to_pylist()))
        assert got_pts == _brute(pts)

    def test_equal_points_coexist(self):
        pts = [(1, 1), (1, 1), (2, 0), (0, 2), (3, 3)]
        got = skyline_batch(_table(pts), "x", "y")
        assert sorted(zip(got["x"].to_pylist(), got["y"].to_pylist())) == [
            (0, 2),
            (1, 1),
            (1, 1),
            (2, 0),
        ]

    def test_same_x_strictly_larger_y_dominated(self):
        pts = [(5, 1), (5, 2)]
        got = skyline_batch(_table(pts), "x", "y")
        assert got["y"].to_pylist() == [1]

    def test_empty(self):
        assert skyline_batch(_table([]), "x", "y").num_rows == 0


class TestSkylineDistributed:
    def test_block_structure_invariance(self, ray_session):
        import ray.data

        rng = np.random.default_rng(9)
        pts = [
            (int(a), int(b))
            for a, b in rng.integers(0, 40, size=(900, 2))
        ]
        want = _brute(pts)
        for blocks in (1, 5, 17):
            ds = ray.data.from_arrow(_table(pts)).repartition(blocks)
            got = skyline_2d(ds, "x", "y").to_pandas()
            assert sorted(zip(got["x"], got["y"])) == want

    def test_forced_coalesce_path_identical(self, ray_session):
        import ray.data

        rng = np.random.default_rng(13)
        pts = [
            (int(a), int(b))
            for a, b in rng.integers(0, 30, size=(500, 2))
        ]
        ds = ray.data.from_arrow(_table(pts)).repartition(9)
        fast = skyline_2d(ds, "x", "y").to_pandas()
        forced = skyline_2d(ds, "x", "y", tiny_limit=0).to_pandas()
        key = lambda df: sorted(zip(df["id"], df["x"], df["y"]))
        assert key(fast) == key(forced) == sorted(
            key(fast)
        )  # same rows (ids), both paths
