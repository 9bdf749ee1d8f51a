"""Range-join lookup, grouped exact count-distinct, and the per-key
running-sum window: DuckDB/pandas parity, gap/drop semantics, block
invariance, contract validation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.joins import range_join_lookup
from gis_scripts_ray.stages.stats import grouped_count_distinct
from gis_scripts_ray.stages.windows import grouped_running_sum


def _mk(table: pa.Table, nb: int):
    import ray.data

    return ray.data.from_arrow(table).repartition(nb)


class TestRangeJoinLookup:
    BANDS = pa.table(
        {
            "band": pa.array(["low", "mid", "high"]),
            "lo": pa.array([0, 100, 500], pa.int64()),
            "hi": pa.array([50, 300, 1000], pa.int64()),  # gaps: [50,100), [300,500)
        }
    )

    def _facts(self, seed=2, n=4000):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "x": pa.array(rng.integers(-20, 1100, n), pa.int64()),
                "w": pa.array(rng.integers(1, 10, n), pa.int64()),
            }
        )

    def _ref(self, facts: pa.Table) -> pd.DataFrame:
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("f", facts)
        con.register("b", self.BANDS)
        return con.execute(
            "SELECT f.x, f.w, b.band, b.lo, b.hi FROM f JOIN b "
            "ON f.x >= b.lo AND f.x < b.hi ORDER BY f.x, f.w"
        ).df()

    def test_matches_inequality_join_sql(self, ray_session):
        facts = self._facts()
        ref = self._ref(facts)
        for nb in (1, 6):
            got = (
                range_join_lookup(_mk(facts, nb), self.BANDS, "x")
                .to_pandas()
                .sort_values(["x", "w"])
                .reset_index(drop=True)[ref.columns.tolist()]
            )
            pd.testing.assert_frame_equal(got, ref)

    def test_gaps_and_out_of_domain_drop(self, ray_session):
        facts = pa.table({"x": pa.array([-5, 0, 49, 50, 99, 100, 299, 300, 999, 1000], pa.int64())})
        got = range_join_lookup(_mk(facts, 2), self.BANDS, "x").to_pandas()
        assert sorted(got["x"].tolist()) == [0, 49, 100, 299, 999]

    def test_overlap_rejected(self, ray_session):
        bad = pa.table(
            {
                "band": pa.array(["a", "b"]),
                "lo": pa.array([0, 40], pa.int64()),
                "hi": pa.array([50, 90], pa.int64()),
            }
        )
        with pytest.raises(ValueError):
            range_join_lookup(_mk(self._facts(), 1), bad, "x")

    def test_unsorted_range_table_ok(self, ray_session):
        shuffled = self.BANDS.take(pa.array([2, 0, 1]))
        facts = self._facts(seed=9)
        a = range_join_lookup(_mk(facts, 3), self.BANDS, "x").to_pandas()
        b = range_join_lookup(_mk(facts, 3), shuffled, "x").to_pandas()
        key = ["x", "w", "band"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )


class TestGroupedCountDistinct:
    def test_matches_sql(self, ray_session):
        rng = np.random.default_rng(4)
        t = pa.table(
            {
                "g": pa.array(rng.choice(["a", "b", "c"], 5000)),
                "u": pa.array(rng.integers(0, 400, 5000), pa.int64()),
            }
        )
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", t)
        ref = con.execute(
            "SELECT g, CAST(COUNT(DISTINCT u) AS BIGINT) AS n_distinct "
            "FROM t GROUP BY g ORDER BY g"
        ).df()
        for nb in (1, 7):
            got = (
                grouped_count_distinct(_mk(t, nb), ["g"], "u")
                .to_pandas()
                .sort_values("g")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, ref)


class TestGroupedRunningSum:
    def test_matches_window_sql(self, ray_session):
        rng = np.random.default_rng(6)
        n = 3000
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 40, n), pa.int64()),
                "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
                "id": pa.array(rng.permutation(n).astype(np.int64)),
                "v": pa.array(rng.integers(-50, 100, n), pa.int64()),
            }
        )
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", t)
        ref = con.execute(
            "SELECT k, id, v, CAST(SUM(v) OVER (PARTITION BY k ORDER BY ts, id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_total "
            "FROM t ORDER BY k, id"
        ).df()
        for nb in (1, 8):
            got = (
                grouped_running_sum(_mk(t, nb), "k", "ts", "id", "v")
                .to_pandas()
                .sort_values(["k", "id"])
                .reset_index(drop=True)[["k", "id", "v", "run_total"]]
            )
            pd.testing.assert_frame_equal(got, ref)

    def test_ts_ties_break_by_id(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([5, 5, 5], pa.int64()),
                "id": pa.array([30, 10, 20], pa.int64()),
                "v": pa.array([1, 2, 4], pa.int64()),
            }
        )
        got = (
            grouped_running_sum(_mk(t, 3), "k", "ts", "id", "v")
            .to_pandas()
            .sort_values("id")
        )
        # order by id: 10(+2)=2, 20(+4)=6, 30(+1)=7
        assert got["run_total"].tolist() == [2, 6, 7]
