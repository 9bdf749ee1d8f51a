"""Full driver simulation: entry() + every queries() entry at sf0.01,
compared against oracle_sql() in DuckDB (rows + schema + order-insensitive
value hash, like the real driver). Run: python _drive_verify.py [names...]"""
import os
import sys
import time

os.environ.setdefault("POLARS_MAX_THREADS", "1")

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

sys.path.insert(0, "/root/repo")

SF = os.environ.get("VERIFY_SF", "/root/testdata/sf0.01")


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif np.issubdtype(col.dtype, np.floating):
            df[c] = np.round(col.astype(np.float64), 9)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def main():
    only = set(sys.argv[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import duckdb

    import __ray_entry__ as e

    r = e.entry()
    n = r.count() if hasattr(r, "count") else len(r)
    print(f"entry(): {type(r).__name__} rows={n}")
    assert n >= 0

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_df(fn(SF))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows_only {name}: {len(res)} rows ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        rows_ok = len(res) == len(want)
        schema_ok = sorted(res.columns) == sorted(want.columns)
        hash_ok = schema_ok and value_hash(res) == value_hash(want)
        if rows_ok and schema_ok and hash_ok:
            print(f"pass {name}: {len(res)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(res)}/{len(want)} schema_ok={schema_ok} "
                f"hash_ok={hash_ok} cols={sorted(res.columns)} vs {sorted(want.columns)}"
            )
            n_fail += 1
    print(f"== {n_pass} pass, {n_rows_only} rows_only, {n_fail} FAIL ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
