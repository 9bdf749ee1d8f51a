"""Cross-engine convention kernels: the numpy helpers in queries.py must
match their DuckDB twins bit-for-bit on HOSTILE inputs, not just the
fixtures (rounding mode, integer floor division, wrap-safe hashing,
derived id shifts). Pure duckdb+numpy — no Ray session needed."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.queries import (
    _id_shift,
    _round_half_away,
    _sql_floordiv,
    _WRAP64,
)


def _duck(table: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("t", table)
    return [r[0] for r in con.execute(sql).fetchall()]


class TestRoundHalfAway:
    def test_matches_duckdb_round_on_hostile_grid(self):
        rng = np.random.default_rng(7)
        v = np.concatenate(
            [
                rng.uniform(-1000, 1000, 20_000),
                np.arange(-200, 200) + 0.5,  # exact .5 ties, both signs
                np.arange(-50, 50) * 0.125,  # exact binary fractions
                [0.49999999999999994, -0.49999999999999994, 0.0, -0.0],
            ]
        )
        eng = _round_half_away(v * 100.0)
        sql = np.array(
            _duck(pa.table({"v": pa.array(v, pa.float64())}), "SELECT ROUND(v*100) FROM t")
        )
        np.testing.assert_array_equal(eng, sql)

    def test_half_even_quantity_cast_matches_duckdb(self):
        # engine np.round (half-even) twins CAST(double AS BIGINT)
        q = np.concatenate(
            [np.arange(0, 100, dtype=np.float64), np.arange(0, 60) + 0.5]
        )
        eng = np.round(q).astype(np.int64)
        sql = np.array(
            _duck(
                pa.table({"v": pa.array(q, pa.float64())}),
                "SELECT CAST(v AS BIGINT) FROM t",
            )
        )
        np.testing.assert_array_equal(eng, sql)


class TestSqlFloorDiv:
    @pytest.mark.parametrize("d", [3_600_000_000, 900_000_000, 7])
    def test_matches_numpy_floor_division(self, d):
        rng = np.random.default_rng(3)
        x = np.concatenate(
            [
                rng.integers(-(10**15), 10**15, 5000),
                np.array([-1, 0, 1, -d, d, -d - 1, d + 1, -(10**17), 10**17]),
            ]
        ).astype(np.int64)
        eng = x // d
        sql = np.array(
            _duck(
                pa.table({"x": pa.array(x, pa.int64())}),
                f"SELECT {_sql_floordiv('x', d)} FROM t",
            )
        )
        np.testing.assert_array_equal(eng, sql)


class TestHidxWrapParity:
    def test_engine_matches_sql_incl_wrapping_ids(self):
        from gis_scripts_ray.sources.webpages import _host_index_for_doc

        rng = np.random.default_rng(11)
        ids = np.concatenate(
            [
                rng.integers(0, 10**6, 2000),
                rng.integers(0, 2**62, 2000),  # deep in wrap territory
                np.array([0, 3_470_000_000, 2**62, 2**63 - 1]),
            ]
        ).astype(np.int64)
        eng = _host_index_for_doc(ids)
        sql_expr = (
            f"CASE WHEN (CAST(x AS HUGEINT)*2654435761)%{_WRAP64}%1000000 < 800000 "
            f"THEN CAST((CAST(x AS HUGEINT)*40503)%{_WRAP64}%40 AS BIGINT) "
            f"ELSE CAST(40+(CAST(x AS HUGEINT)*9973)%{_WRAP64}%160 AS BIGINT) END"
        )
        sql = np.array(
            _duck(pa.table({"x": pa.array(ids, pa.int64())}), f"SELECT {sql_expr} FROM t")
        )
        np.testing.assert_array_equal(eng, sql)


class TestIdShift:
    def test_stats_equal_scan(self, tmp_path):
        import pyarrow.parquet as pq

        t = pa.table({"doc_id": pa.array([5, 99, 3, 42], pa.int64())})
        pq.write_table(t, str(tmp_path / "documents.parquet"), row_group_size=2)
        assert _id_shift(str(tmp_path), "documents", "doc_id") == 100
