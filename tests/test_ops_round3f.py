"""INTERSECT-distinct (both adaptive paths) and interpolated grouped
quantiles (numpy-percentile-linear parity, bracketing-rank edges)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.joins import intersect_distinct
from gis_scripts_ray.stages.stats import grouped_quantile_cont


def _mk(table: pa.Table, nb: int):
    import ray.data

    return ray.data.from_arrow(table).repartition(nb)


class TestIntersectDistinct:
    def _sides(self, seed=8):
        rng = np.random.default_rng(seed)
        a = pa.table({"x": pa.array(rng.choice(2000, 3000).astype(np.int64))})
        b = pa.table({"y": pa.array(rng.choice(3000, 2500).astype(np.int64))})
        return a, b

    def _ref(self, a, b):
        return sorted(set(a["x"].to_pylist()) & set(b["y"].to_pylist()))

    def test_broadcast_path_matches_set_intersection(self, ray_session):
        a, b = self._sides()
        got = (
            intersect_distinct(_mk(a, 4), _mk(b, 4), on="x", right_on="y")
            .to_pandas()["x"]
            .sort_values()
            .tolist()
        )
        assert got == self._ref(a, b)

    def test_join_path_matches_broadcast_path(self, ray_session):
        a, b = self._sides(seed=15)
        got = (
            intersect_distinct(
                _mk(a, 3), _mk(b, 3), on="x", right_on="y", broadcast_limit=0
            )
            .to_pandas()["x"]
            .sort_values()
            .tolist()
        )
        assert got == self._ref(a, b)

    def test_empty_side_yields_empty(self, ray_session):
        a, b = self._sides()
        out = intersect_distinct(
            _mk(a, 2), _mk(b.slice(0, 0), 1), on="x", right_on="y"
        )
        assert out.count() == 0

    def test_output_is_distinct(self, ray_session):
        a = pa.table({"x": pa.array([1, 1, 2, 2, 3], pa.int64())})
        b = pa.table({"x": pa.array([2, 2, 3, 4], pa.int64())})
        got = intersect_distinct(_mk(a, 2), _mk(b, 2), on="x").to_pandas()["x"]
        assert sorted(got.tolist()) == [2, 3]


class TestGroupedQuantileCont:
    def _fixture(self, seed=17, n=4000):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "g": pa.array(rng.integers(0, 6, n), pa.int64()),
                "v": pa.array(rng.integers(0, 200, n), pa.int64()),
            }
        )

    @pytest.mark.parametrize("num,den", [(1, 4), (1, 2), (3, 4), (9, 10), (0, 1), (1, 1)])
    def test_matches_numpy_percentile_linear(self, ray_session, num, den):
        t = self._fixture()
        df = t.to_pandas()
        got = (
            grouped_quantile_cont(_mk(t, 5), ["g"], "v", num, den, out_col="x")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            vals = df[df["g"] == row["g"]]["v"].to_numpy()
            want = np.percentile(vals, 100.0 * num / den, method="linear")
            assert row["x"] == pytest.approx(want, abs=1e-9), (row["g"], num, den)
            assert row["n"] == len(vals)

    def test_matches_sql_twin_bitwise(self, ray_session):
        t = self._fixture(seed=23)
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", t)
        ref = con.execute(
            "WITH r AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn, "
            "COUNT(*) OVER (PARTITION BY g) AS n FROM t), "
            "p AS (SELECT g, MAX(n) AS n, "
            "MAX(CASE WHEN rn = (3*(n-1)) // 4 + 1 THEN v END) AS vlo, "
            "MAX(CASE WHEN rn = (3*(n-1)) // 4 + 1 + "
            "CASE WHEN (3*(n-1)) % 4 > 0 THEN 1 ELSE 0 END THEN v END) AS vhi "
            "FROM r GROUP BY g) "
            "SELECT g, CAST(vlo AS DOUBLE) + (CAST(vhi AS DOUBLE) - CAST(vlo AS DOUBLE)) * "
            "(CAST((3*(n-1)) % 4 AS DOUBLE) / 4.0) AS x, CAST(n AS BIGINT) AS n "
            "FROM p ORDER BY g"
        ).df()
        got = (
            grouped_quantile_cont(_mk(t, 4), ["g"], "v", 3, 4, out_col="x")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        # bit-identical IEEE: same inputs, same operation order
        assert got["x"].to_numpy().tobytes() == ref["x"].to_numpy().tobytes()

    def test_exact_position_no_interpolation(self, ray_session):
        # group of 5, q=1/2 -> h = 2.0 exactly -> rem 0 -> value at rank 3
        t = pa.table(
            {"g": pa.array([0] * 5, pa.int64()), "v": pa.array([10, 2, 8, 4, 6], pa.int64())}
        )
        got = grouped_quantile_cont(_mk(t, 2), ["g"], "v", 1, 2, out_col="x").to_pandas()
        assert got["x"].tolist() == [6.0]

    def test_shuffle_finish_matches(self, ray_session):
        t = self._fixture(seed=29, n=1500)
        a = (
            grouped_quantile_cont(_mk(t, 4), ["g"], "v", 9, 10, out_col="x")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        b = (
            grouped_quantile_cont(
                _mk(t, 4), ["g"], "v", 9, 10, out_col="x", small_limit=0
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        b["n"] = b["n"].astype(a["n"].dtype)
        pd.testing.assert_frame_equal(a, b)
