"""Convex hull — kernel parity, prune preservation, distributed shape.

The monotone chain is the hot kernel; :func:`gift_wrap` is the per-row
reference implementing the SQL twin's candidate rule verbatim (repo
rule: every vectorized/optimized kernel keeps a bit-exact reference).
"""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.hull import (
    akl_toussaint_prune,
    convex_hull,
    gift_wrap,
    monotone_chain,
)


def _random_cases():
    rng = np.random.default_rng(7)
    cases = []
    for trial in range(120):
        kind = trial % 5
        if kind == 0:  # tiny dense lattice: many dups + collinear runs
            pts = rng.integers(-5, 6, size=(rng.integers(1, 30), 2))
        elif kind == 1:  # spread
            pts = rng.integers(-1000, 1000, size=(rng.integers(3, 60), 2))
        elif kind == 2:  # all collinear (arbitrary direction)
            t = rng.integers(-20, 20, size=rng.integers(1, 15))
            d = rng.integers(-3, 4, size=2)
            if d[0] == 0 and d[1] == 0:
                d[0] = 1
            pts = np.stack([7 + t * d[0], -3 + t * d[1]], axis=1)
        elif kind == 3:  # 4x4 lattice: heavy collinearity on hull edges
            pts = rng.integers(0, 4, size=(rng.integers(1, 40), 2))
        else:  # 1-3 points
            pts = rng.integers(-2, 3, size=(rng.integers(1, 4), 2))
        cases.append(pts.astype(np.int64))
    return cases


class TestHullKernelParity:
    def test_chain_matches_gift_wrap_reference(self):
        for pts in _random_cases():
            dpts = np.unique(pts, axis=0)
            assert np.array_equal(monotone_chain(dpts), gift_wrap(pts)), (
                pts.tolist()
            )

    def test_prune_preserves_hull(self):
        for pts in _random_cases():
            dpts = np.unique(pts, axis=0)
            pruned = np.unique(akl_toussaint_prune(dpts), axis=0)
            assert len(pruned) <= len(dpts)
            assert np.array_equal(monotone_chain(dpts), monotone_chain(pruned))

    def test_conventions(self):
        # CCW, strict (collinear mid-point excluded), start at min (y, x)
        pts = np.array(
            [[0, 0], [2, 0], [2, 2], [0, 2], [1, 0], [1, 1]], dtype=np.int64
        )
        hull = monotone_chain(np.unique(pts, axis=0))
        assert hull.tolist() == [[0, 0], [2, 0], [2, 2], [0, 2]]

    def test_degenerate(self):
        assert monotone_chain(np.array([[3, 4]], dtype=np.int64)).tolist() == [[3, 4]]
        assert monotone_chain(
            np.array([[5, 1], [2, 9]], dtype=np.int64)
        ).tolist() == [[5, 1], [2, 9]]
        # vertical collinear: endpoints only, lowest first
        col = np.array([[1, 5], [1, 1], [1, 3]], dtype=np.int64)
        assert monotone_chain(np.unique(col, axis=0)).tolist() == [[1, 1], [1, 5]]


def _to_table(groups, pts):
    return pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "x": pa.array(pts[:, 0], pa.int64()),
            "y": pa.array(pts[:, 1], pa.int64()),
        }
    )


class TestDistributedHull:
    def test_matches_single_process_under_any_blocking(self, ray_session):
        import ray.data

        rng = np.random.default_rng(11)
        pts = rng.integers(-300, 300, size=(500, 2)).astype(np.int64)
        groups = [f"s{i % 3}" for i in range(500)]
        t = _to_table(groups, pts)
        want = {}
        for gname in ("s0", "s1", "s2"):
            mask = np.array([g == gname for g in groups])
            want[gname] = monotone_chain(np.unique(pts[mask], axis=0))
        for nblocks in (1, 7):
            out = (
                convex_hull(
                    ray.data.from_arrow(t).repartition(nblocks), "g", "x", "y"
                )
                .to_pandas()
                .sort_values(["g", "seq"])
            )
            for gname, w in want.items():
                got = out[out["g"] == gname][["x", "y"]].to_numpy()
                assert np.array_equal(got, w), (nblocks, gname)

    def test_degenerate_groups_distributed(self, ray_session):
        import ray.data

        # one-point, two-point and all-collinear groups split across blocks
        t = _to_table(
            ["a", "b", "b", "c", "c", "c", "c"],
            np.array(
                [[9, 9], [0, 0], [4, 4], [0, 0], [3, 0], [6, 0], [1, 0]],
                dtype=np.int64,
            ),
        )
        out = (
            convex_hull(ray.data.from_arrow(t).repartition(4), "g", "x", "y")
            .to_pandas()
            .sort_values(["g", "seq"])
        )
        assert out[out["g"] == "a"][["x", "y"]].to_numpy().tolist() == [[9, 9]]
        assert out[out["g"] == "b"][["x", "y"]].to_numpy().tolist() == [
            [0, 0],
            [4, 4],
        ]
        assert out[out["g"] == "c"][["x", "y"]].to_numpy().tolist() == [
            [0, 0],
            [6, 0],
        ]

    def test_diameter_matches_brute_force(self, ray_session):
        import ray.data

        from gis_scripts_ray.stages.hull import hull_diameter

        rng = np.random.default_rng(5)
        pts = rng.integers(-200, 200, size=(400, 2)).astype(np.int64)
        groups = [f"s{i % 2}" for i in range(400)]
        out = (
            hull_diameter(
                ray.data.from_arrow(_to_table(groups, pts)).repartition(5),
                "g",
                "x",
                "y",
            )
            .to_pandas()
            .set_index("g")
        )
        for gname in ("s0", "s1"):
            mask = np.array([g == gname for g in groups])
            p = pts[mask]
            d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2).max()
            assert out.loc[gname, "d2_max"] == d2
            assert out.loc[gname, "n_hull"] == len(
                monotone_chain(np.unique(p, axis=0))
            )

    def test_empty_input(self, ray_session):
        import ray.data

        t = _to_table([], np.zeros((0, 2), dtype=np.int64))
        out = convex_hull(ray.data.from_arrow(t), "g", "x", "y").to_pandas()
        assert len(out) == 0
