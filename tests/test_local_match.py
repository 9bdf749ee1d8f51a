"""Local histogram matching + grid kernels vs single-process numpy oracles."""

import numpy as np
import pandas as pd
import pytest

from gis_scripts_ray.functions.gridops import (
    connected_components,
    smooth_grid,
    weighted_bilinear,
)


class TestWeightedBilinear:
    def test_plain_bilinear_when_all_valid(self):
        grid = np.array([[0.0, 1.0], [2.0, 3.0]])
        mask = np.ones((2, 2))
        out = weighted_bilinear(grid, mask, np.array([0.5]), np.array([0.5]))
        assert out[0] == pytest.approx(1.5)
        # corners hit exact values
        out = weighted_bilinear(grid, mask, np.array([0.0, 1.0]), np.array([0.0, 1.0]))
        assert out.tolist() == [0.0, 3.0]

    def test_invalid_neighbor_reweighted(self):
        grid = np.array([[0.0, 10.0], [0.0, 10.0]])
        mask = np.array([[0.0, 1.0], [0.0, 1.0]])  # left column nodata
        out = weighted_bilinear(grid, mask, np.array([0.5]), np.array([0.5]))
        assert out[0] == pytest.approx(10.0)  # only valid neighbors count

    def test_all_invalid_nan(self):
        grid = np.zeros((2, 2))
        out = weighted_bilinear(grid, np.zeros((2, 2)), np.array([0.5]), np.array([0.5]))
        assert np.isnan(out[0])

    def test_outside_grid(self):
        grid = np.ones((2, 2))
        mask = np.ones((2, 2))
        out = weighted_bilinear(grid, mask, np.array([-5.0, 0.2]), np.array([0.0, 0.2]))
        assert np.isnan(out[0]) and np.isfinite(out[1])


class TestSmoothGrid:
    def test_constant_preserved(self):
        g = np.full((8, 8), 7.0)
        m = np.ones((8, 8))
        out = smooth_grid(g, m, sigma=1.0)
        assert np.allclose(out, 7.0)

    def test_nodata_not_bleeding(self):
        g = np.full((8, 8), 5.0)
        m = np.ones((8, 8))
        g[4, 4] = 1e9  # garbage under nodata
        m[4, 4] = 0.0
        out = smooth_grid(g, m, sigma=1.0)
        assert np.nanmax(np.abs(out - 5.0)) < 1e-6


class TestConnectedComponents:
    def test_two_islands(self):
        # island A: (0,0),(0,1),(1,1); island B: (5,5)
        x = np.array([0, 0, 1, 5])
        y = np.array([0, 1, 1, 5])
        lbl = connected_components(x, y)
        assert lbl[0] == lbl[1] == lbl[2]
        assert lbl[3] != lbl[0]
        assert len(set(lbl.tolist())) == 2

    def test_diagonal_only_8conn(self):
        x = np.array([0, 1])
        y = np.array([0, 1])
        assert len(set(connected_components(x, y, 4).tolist())) == 2
        assert len(set(connected_components(x, y, 8).tolist())) == 1

    def test_deterministic_labels(self):
        rng = np.random.default_rng(2)
        x = rng.integers(0, 20, 60)
        y = rng.integers(0, 20, 60)
        a = connected_components(x, y)
        b = connected_components(x.copy(), y.copy())
        assert np.array_equal(a, b)


class TestLocalHistogramMatch:
    def test_distorted_source_pulled_to_reference(self, ray_session):
        """Two sources on the same 4x4 tile grid; source b = 2x the truth.
        After matching, per-tile means of b approach the reference map."""
        import ray

        from gis_scripts_ray.pipelines.local_match import local_histogram_match

        rng = np.random.default_rng(5)
        rows = []
        for ty in range(4):
            for tx in range(4):
                base = 100.0 + 10 * tx + 5 * ty
                for i in range(20):
                    fx = tx + rng.uniform(0.05, 0.95) - 0.5
                    fy = ty + rng.uniform(0.05, 0.95) - 0.5
                    v = base + rng.normal(0, 1)
                    rows.append((tx, ty, fx, fy, "a", v))
                    rows.append((tx, ty, fx, fy, "b", 2.0 * v))
        df = pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "frac_x", "frac_y", "source", "v"]
        )
        ds = ray.data.from_pandas(df).repartition(4)
        out = local_histogram_match(ds, "v", "source").to_pandas()
        # reference map value per tile ~ mean(base, 2*base) = 1.5*base
        got = out.groupby(["source", "tile_x", "tile_y"])["v_matched"].mean()
        for (src, tx, ty), val in got.items():
            base = 100.0 + 10 * tx + 5 * ty
            assert val == pytest.approx(1.5 * base, rel=0.1), (src, tx, ty)

    def test_negative_values_block_structure_invariant(self, ray_session):
        """With values <= 0 the gamma offset-shift must come from the
        GLOBAL min: the matched output must not change with Ray block
        boundaries (the per-batch-nanmin regression)."""
        import ray

        from gis_scripts_ray.pipelines.local_match import local_histogram_match

        rng = np.random.default_rng(7)
        rows = []
        for ty in range(3):
            for tx in range(3):
                base = -20.0 + 10 * tx + 5 * ty  # mins differ per region
                for i in range(12):
                    fx = tx + rng.uniform(0.05, 0.95) - 0.5
                    fy = ty + rng.uniform(0.05, 0.95) - 0.5
                    v = base + rng.normal(0, 1)
                    rows.append((tx, ty, fx, fy, "a", v))
                    rows.append((tx, ty, fx, fy, "b", v + 3.0))
        df = pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "frac_x", "frac_y", "source", "v"]
        )
        outs = []
        for parts in (1, 7):
            ds = ray.data.from_pandas(df).repartition(parts)
            out = (
                local_histogram_match(ds, "v", "source")
                .to_pandas()
                .sort_values(["source", "tile_x", "tile_y", "frac_x", "frac_y"])
                .reset_index(drop=True)
            )
            outs.append(out["v_matched"].to_numpy())
        # ULP tolerance only: the tile-mean aggregates sum floats in
        # block order. The regression this guards (per-batch shift)
        # produced O(1) differences.
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-12)

    def test_untouched_when_sources_agree(self, ray_session):
        import ray

        from gis_scripts_ray.pipelines.local_match import local_histogram_match

        rng = np.random.default_rng(6)
        rows = []
        for ty in range(3):
            for tx in range(3):
                for i in range(15):
                    fx = tx + rng.uniform(0.05, 0.95) - 0.5
                    fy = ty + rng.uniform(0.05, 0.95) - 0.5
                    v = 50.0 + tx + ty
                    rows.append((tx, ty, fx, fy, "a" if i % 2 else "b", v))
        df = pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "frac_x", "frac_y", "source", "v"]
        )
        out = local_histogram_match(ray.data.from_pandas(df), "v", "source").to_pandas()
        assert np.allclose(out["v_matched"], out["v"], rtol=1e-6)
