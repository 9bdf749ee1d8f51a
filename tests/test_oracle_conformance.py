"""Driver-simulation: every query vs its DuckDB oracle, like the harness.

Mirrors the driver's comparison: row count, schema (column names), and an
order-insensitive value comparison (sorted rows, columns sorted by name).
Runs at sf0.001 for speed; the driver runs sf0.01.
"""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _query_names():
    from gis_scripts_ray.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session, con):
    from gis_scripts_ray.queries import ORACLES, QUERIES

    got = _normalize(_to_df(QUERIES[name](SF_DIR)))
    want = _normalize(con.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for col in got.columns:
        a, b = got[col], want[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, check_exact=True
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}: {col}"
