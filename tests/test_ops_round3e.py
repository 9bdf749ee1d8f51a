"""JSON integer-field extraction: vectorized-vs-per-row bit parity
(the CLAUDE.md kernel contract), DuckDB-twin semantics on hostile
inputs, and the sentinel-safe grouped stats combine."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from gis_scripts_ray.stages.textstages import json_int_field, json_int_field_row

HOSTILE = [
    '{"k": 69}',
    '{"k": -3}',
    '{"k": 5.0}',
    '{"k": "7"}',
    '{"k": "-12"}',
    '{"k": true}',
    '{"k": false}',
    '{"k": null}',
    '{"x": 1}',
    "garbage",
    None,
    "5",
    "[1, 2]",
    '{"k": 123456789012345}',
    '{"k": [1]}',
    '{"k": {"a": 1}}',
    '{"k": 0}',
    '  {"k": 2}  ',
    '{"k": "a"}',
    '{"a": {"k": 9}}',
    "",
    '{"k": "5.0"}',
    '{"k": 1e3}',
]


class TestJsonIntFieldParity:
    def test_vectorized_matches_per_row_on_hostile_inputs(self):
        b = pa.table({"props": pa.array(HOSTILE, pa.string())})
        vec = json_int_field(b, "props", "k", "k").column("k").to_pylist()
        ref = [json_int_field_row(t, "k") for t in HOSTILE]
        assert vec == ref

    def test_matches_sql_guarded_extract(self):
        b = pa.table({"props": pa.array(HOSTILE, pa.string())})
        vec = json_int_field(b, "props", "k", "k").column("k").to_pylist()
        con = duckdb.connect()
        con.execute("SET threads=1")
        con.register("t", b)
        sql = con.execute(
            "SELECT CASE WHEN props IS NOT NULL AND json_valid(props) AND "
            "regexp_matches(COALESCE(json_extract_string(props, '$.k'), ''), '^-?\\d+$') "
            "THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k FROM t"
        ).df()["k"]
        got_sql = [None if pd.isna(v) else int(v) for v in sql]
        assert vec == got_sql

    def test_random_clean_props_roundtrip(self):
        rng = np.random.default_rng(31)
        vals = rng.integers(-(10**12), 10**12, 500)
        texts = [f'{{"k": {v}}}' for v in vals]
        b = pa.table({"props": pa.array(texts, pa.string())})
        got = json_int_field(b, "props", "k", "k").column("k").to_pylist()
        assert got == vals.tolist()


class TestEventPropStatsQuery:
    def test_sentinel_min_max_on_unparseable_group(self, ray_session):
        # one type has NO parseable k anywhere -> n_k=0, min/max restored to 0
        import ray.data

        from gis_scripts_ray.queries import QUERIES

        t = pa.table(
            {
                "event_type": pa.array(["a", "a", "b", "b", "b"]),
                "props": pa.array(
                    ['{"k": 4}', '{"k": -9}', "garbage", '{"k": "x"}', None]
                ),
            }
        )
        import os
        import tempfile

        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="props_")
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = (
            QUERIES["event_prop_stats"](d)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert got["n"].tolist() == [2, 3]
        assert got["n_k"].tolist() == [2, 0]
        assert got["sum_k"].tolist() == [-5, 0]
        assert got["min_k"].tolist() == [-9, 0]
        assert got["max_k"].tolist() == [4, 0]
