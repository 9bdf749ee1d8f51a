"""Distributed grid smoothing (stages/smoothing.py) — parity vs the
driver-side gridops.smooth_grid (float, bit-exact) and the brute-force
per-cell reference (int), across stripe heights and block structures."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.functions.gridops import _gaussian_kernel, smooth_grid
from gis_scripts_ray.stages.smoothing import (
    smooth_cells_reference,
    smooth_grid_distributed,
)


def _sparse_fixture(seed: int, h: int, w: int, density: float = 0.35):
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < density
    y, x = np.nonzero(mask)
    v = rng.integers(-50, 500, size=len(y)).astype(np.int64)
    return y.astype(np.int64), x.astype(np.int64), v


def _collect(ds) -> dict:
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    cols = t.column_names
    return {
        (int(a), int(b)): tuple(t[c][i].as_py() for c in cols if c not in ("y", "x"))
        for i, (a, b) in enumerate(zip(t["y"].to_pylist(), t["x"].to_pylist()))
    }


class TestFloatParity:
    @pytest.mark.parametrize("stripe,nblocks", [(2, 1), (7, 4), (16, 3), (64, 1)])
    def test_bit_exact_vs_driver(self, ray_session, stripe, nblocks):
        import ray.data

        h, w = 41, 53
        y, x, v = _sparse_fixture(11, h, w)
        sigma = 1.0  # r = 3 > smallest stripe: multi-stripe halo exercised
        grid = np.zeros((h, w))
        m = np.zeros((h, w))
        grid[y, x] = v.astype(np.float64)
        m[y, x] = 1.0
        expect = smooth_grid(grid, m, sigma)

        t = pa.table(
            {
                "y": pa.array(y, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "v": pa.array(v.astype(np.float64), pa.float64()),
            }
        )
        out = _collect(
            smooth_grid_distributed(
                ray.data.from_arrow(t).repartition(nblocks),
                _gaussian_kernel(sigma),
                height=h,
                width=w,
                stripe=stripe,
            )
        )
        assert len(out) == len(y)
        for a, b in zip(y, x):
            got = out[(int(a), int(b))][0]
            # BIT-exact: same convolve calls, same tap sets, same order
            assert got == expect[a, b], (a, b, got, expect[a, b])


class TestIntExact:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        h, w = 23, 31
        y, x, v = _sparse_fixture(7, h, w, density=0.5)
        kernel = np.array([1, 4, 6, 4, 1], dtype=np.int64)
        nums, dens = smooth_cells_reference(y, x, v, kernel)
        expect = {
            (int(a), int(b)): (int(n), int(d))
            for a, b, n, d in zip(y, x, nums, dens)
        }
        t = pa.table(
            {
                "y": pa.array(y, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )
        for stripe in (3, 10, 64):
            out = _collect(
                smooth_grid_distributed(
                    ray.data.from_arrow(t).repartition(5),
                    kernel,
                    height=h,
                    width=w,
                    stripe=stripe,
                )
            )
            assert out == expect, stripe

    def test_duckdb_twin_parity(self, ray_session):
        import duckdb
        import ray.data

        y, x, v = _sparse_fixture(3, 19, 29, density=0.4)
        kernel = np.array([1, 4, 6, 4, 1], dtype=np.int64)
        t = pa.table(
            {
                "y": pa.array(y, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )
        out = _collect(
            smooth_grid_distributed(
                ray.data.from_arrow(t), kernel, height=19, width=29, stripe=8
            )
        )
        con = duckdb.connect()
        con.register("cells", t)
        rows = con.execute(
            "WITH w(d, wt) AS (SELECT * FROM (VALUES (-2,1),(-1,4),(0,6),(1,4),(2,1)) t) "
            "SELECT a.y, a.x, CAST(SUM(wy.wt*wx.wt*b.v) AS BIGINT), "
            "CAST(SUM(wy.wt*wx.wt) AS BIGINT) FROM cells a "
            "CROSS JOIN w wy CROSS JOIN w wx "
            "JOIN cells b ON b.y = a.y + wy.d AND b.x = a.x + wx.d "
            "GROUP BY a.y, a.x"
        ).fetchall()
        sql = {(int(r[0]), int(r[1])): (int(r[2]), int(r[3])) for r in rows}
        assert out == sql

    def test_rejects_even_kernel(self):
        import ray.data as rd  # noqa: F401

        with pytest.raises(ValueError):
            smooth_grid_distributed(None, np.array([1, 1]), height=4, width=4)
