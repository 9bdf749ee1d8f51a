"""Grouped median (value compaction), per-group mode via string-group
top-k, and the adaptive anti-join: DuckDB/pandas parity, both-path
equivalence, block-structure invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from gis_scripts_ray.stages.joins import hash_anti_join
from gis_scripts_ray.stages.stats import grouped_median
from gis_scripts_ray.stages.topk import topk_per_group


def _mk(table: pa.Table, nb: int):
    import ray.data

    return ray.data.from_arrow(table).repartition(nb)


class TestGroupedMedian:
    def _fixture(self, seed=7, n=5000):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "g": pa.array(rng.integers(0, 7, n), pa.int64()),
                "h": pa.array(rng.choice(["x", "y"], n)),
                "v": pa.array(rng.integers(1, 51, n), pa.int64()),
            }
        )

    def _ref(self, t: pa.Table) -> pd.DataFrame:
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", t)
        return con.execute(
            "WITH r AS (SELECT g, h, v, ROW_NUMBER() OVER "
            "(PARTITION BY g, h ORDER BY v) AS rn, "
            "COUNT(*) OVER (PARTITION BY g, h) AS n FROM t) "
            "SELECT g, h, MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS m, "
            "CAST(MAX(n) AS BIGINT) AS n FROM r GROUP BY g, h ORDER BY g, h"
        ).df()

    def test_matches_window_sql_and_block_invariant(self, ray_session):
        t = self._fixture()
        ref = self._ref(t)
        for nb in (1, 8):
            got = (
                grouped_median(_mk(t, nb), ["g", "h"], "v", out_col="m")
                .to_pandas()
                .sort_values(["g", "h"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, ref)

    def test_lower_median_even_and_odd(self, ray_session):
        # even group: [1, 2, 3, 4] -> rank (4+1)//2 = 2 -> 2 (no interpolation)
        # odd group:  [5, 5, 9]    -> rank 2 -> 5 (duplicates collapse in
        # the compaction but ranks count occurrences)
        t = pa.table(
            {
                "g": pa.array([0, 0, 0, 0, 1, 1, 1], pa.int64()),
                "v": pa.array([4, 1, 3, 2, 9, 5, 5], pa.int64()),
            }
        )
        got = grouped_median(_mk(t, 3), ["g"], "v").to_pandas().sort_values("g")
        assert got["median"].tolist() == [2, 5]
        assert got["n"].tolist() == [4, 3]

    def test_shuffle_finish_matches(self, ray_session):
        # force the hash-shuffle map_groups finish with small_limit=0
        t = self._fixture(seed=11, n=2000)
        a = (
            grouped_median(_mk(t, 4), ["g", "h"], "v", out_col="m")
            .to_pandas()
            .sort_values(["g", "h"])
            .reset_index(drop=True)
        )
        b = (
            grouped_median(_mk(t, 4), ["g", "h"], "v", out_col="m", small_limit=0)
            .to_pandas()
            .sort_values(["g", "h"])
            .reset_index(drop=True)
        )
        b["n"] = b["n"].astype(a["n"].dtype)
        pd.testing.assert_frame_equal(a, b)


class TestStringGroupTopk:
    def test_string_group_and_id_parity(self, ray_session):
        rng = np.random.default_rng(3)
        hosts = rng.choice([f"h{i}.example" for i in range(9)], 4000)
        langs = rng.choice(["de", "en", "es", "fr", "zh"], 4000)
        vals = rng.integers(0, 40, 4000).astype(np.int64)
        t = pa.table({"host": pa.array(hosts), "lang": pa.array(langs), "v": pa.array(vals)})
        df = t.to_pandas()
        # pandas reference: top-2 per host by (v DESC, lang ASC), after
        # collapsing to per-(host, lang) max so ids are unique per group
        agg = df.groupby(["host", "lang"], as_index=False)["v"].max()
        ref = (
            agg.sort_values(["host", "v", "lang"], ascending=[True, False, True])
            .groupby("host")
            .head(2)
            .sort_values(["host", "lang"])
            .reset_index(drop=True)
        )
        at = pa.Table.from_pandas(agg, preserve_index=False)
        for nb in (1, 5):
            got = (
                topk_per_group(_mk(at, nb), "host", "v", "lang", k=2)
                .to_pandas()
                .sort_values(["host", "lang"])
                .reset_index(drop=True)[["host", "lang", "v"]]
            )
            pd.testing.assert_frame_equal(got, ref[["host", "lang", "v"]])


class TestAntiJoin:
    def _sides(self, seed=5):
        rng = np.random.default_rng(seed)
        left = pa.table(
            {
                "k": pa.array(rng.permutation(3000).astype(np.int64)),
                "payload": pa.array(rng.integers(0, 100, 3000), pa.int64()),
            }
        )
        # right covers ~60% of left's keys, with duplicates
        right = pa.table(
            {"rk": pa.array(rng.choice(1800, 5000).astype(np.int64))}
        )
        return left, right

    def _ref(self, left, right):
        lf, rf = left.to_pandas(), right.to_pandas()
        return (
            lf[~lf["k"].isin(set(rf["rk"]))]
            .sort_values("k")
            .reset_index(drop=True)
        )

    def test_broadcast_path_matches_pandas(self, ray_session):
        left, right = self._sides()
        ref = self._ref(left, right)
        got = (
            hash_anti_join(_mk(left, 4), _mk(right, 4), on="k", right_on="rk")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)

    def test_join_path_matches_broadcast_path(self, ray_session):
        left, right = self._sides(seed=9)
        ref = self._ref(left, right)
        got = (
            hash_anti_join(
                _mk(left, 4), _mk(right, 4), on="k", right_on="rk",
                broadcast_limit=0,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)[["k", "payload"]]
        )
        pd.testing.assert_frame_equal(got, ref)

    def test_empty_right_keeps_left(self, ray_session):
        left, right = self._sides()
        got = hash_anti_join(
            _mk(left, 2), _mk(right.slice(0, 0), 1), on="k", right_on="rk"
        )
        assert got.count() == len(left)

    def test_string_keys(self, ray_session):
        left = pa.table({"k": pa.array(["a", "b", "c", "d"]), "x": pa.array([1, 2, 3, 4], pa.int64())})
        right = pa.table({"k": pa.array(["b", "d", "d"])})
        got = (
            hash_anti_join(_mk(left, 2), _mk(right, 2), on="k")
            .to_pandas()
            .sort_values("k")
        )
        assert got["k"].tolist() == ["a", "c"]
