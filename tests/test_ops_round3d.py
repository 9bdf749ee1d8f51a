"""Grouped discrete quantiles (integer-fraction ranks), per-key gap
statistics (LAG window reduction): DuckDB parity, edge ranks, block
invariance, single-event keys."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.stats import grouped_quantile_disc
from gis_scripts_ray.stages.windows import grouped_gap_stats


def _mk(table: pa.Table, nb: int):
    import ray.data

    return ray.data.from_arrow(table).repartition(nb)


class TestGroupedQuantileDisc:
    def _fixture(self, seed=13, n=4000):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "g": pa.array(rng.integers(0, 5, n), pa.int64()),
                "v": pa.array(rng.integers(0, 300, n), pa.int64()),
            }
        )

    def _ref(self, t: pa.Table, num: int, den: int) -> pd.DataFrame:
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", t)
        return con.execute(
            f"WITH r AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn, "
            f"COUNT(*) OVER (PARTITION BY g) AS n FROM t) "
            f"SELECT g, MAX(CASE WHEN rn = ({num}*n + {den - 1}) // {den} THEN v END) AS x, "
            f"CAST(MAX(n) AS BIGINT) AS n FROM r GROUP BY g ORDER BY g"
        ).df()

    @pytest.mark.parametrize("num,den", [(1, 10), (1, 4), (3, 4), (9, 10), (1, 1)])
    def test_matches_window_sql(self, ray_session, num, den):
        t = self._fixture()
        ref = self._ref(t, num, den)
        got = (
            grouped_quantile_disc(_mk(t, 6), ["g"], "v", num, den, out_col="x")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)

    def test_q1_is_min_q_full_is_max(self, ray_session):
        t = pa.table(
            {
                "g": pa.array([0] * 5, pa.int64()),
                "v": pa.array([7, 3, 9, 1, 5], pa.int64()),
            }
        )
        # q=1/5 over 5 rows -> rank 1 -> min; q=1 -> rank 5 -> max
        lo = grouped_quantile_disc(_mk(t, 2), ["g"], "v", 1, 5, out_col="x").to_pandas()
        hi = grouped_quantile_disc(_mk(t, 2), ["g"], "v", 1, 1, out_col="x").to_pandas()
        assert lo["x"].tolist() == [1] and hi["x"].tolist() == [9]

    def test_invalid_fraction_rejected(self, ray_session):
        t = self._fixture(n=10)
        with pytest.raises(ValueError):
            grouped_quantile_disc(_mk(t, 1), ["g"], "v", 0, 10)
        with pytest.raises(ValueError):
            grouped_quantile_disc(_mk(t, 1), ["g"], "v", 11, 10)


class TestGroupedGapStats:
    def _fixture(self, seed=21, n=2500):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "k": pa.array(rng.integers(0, 60, n), pa.int64()),
                "us": pa.array(rng.integers(0, 10**9, n), pa.int64()),
                "id": pa.array(rng.permutation(n).astype(np.int64)),
            }
        )

    def test_matches_lag_sql(self, ray_session):
        t = self._fixture()
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", t)
        ref = con.execute(
            "WITH g AS (SELECT k, us - LAG(us) OVER (PARTITION BY k ORDER BY us, id) AS gap FROM t) "
            "SELECT k, CAST(COUNT(gap) AS BIGINT) AS n_gaps, "
            "CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_us, "
            "CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us "
            "FROM g GROUP BY k ORDER BY k"
        ).df()
        for nb in (1, 9):
            got = (
                grouped_gap_stats(_mk(t, nb), "k", "us", "id")
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, ref)

    def test_ns_typed_ts_normalizes_to_us(self, ray_session):
        """A timestamp[ns] ts column (pandas-origin data) must produce
        MICROSECOND gaps, identical to the int64-us input and to the
        presplit path — the regression where per_bucket read raw ns."""
        t = self._fixture(n=400)
        ns = pa.table(
            {
                "k": t["k"],
                "us": t["us"].cast(pa.timestamp("us")).cast(pa.timestamp("ns")),
                "id": t["id"],
            }
        )
        want = (
            grouped_gap_stats(_mk(t, 4), "k", "us", "id")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        got = (
            grouped_gap_stats(_mk(ns, 4), "k", "us", "id")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_single_event_key_zero_gaps(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([1, 2, 2], pa.int64()),
                "us": pa.array([100, 50, 80], pa.int64()),
                "id": pa.array([0, 1, 2], pa.int64()),
            }
        )
        got = grouped_gap_stats(_mk(t, 2), "k", "us", "id").to_pandas().sort_values("k")
        assert got["n_gaps"].tolist() == [0, 1]
        assert got["sum_gap_us"].tolist() == [0, 30]
        assert got["max_gap_us"].tolist() == [0, 30]
