"""Per-key interval union (gaps-and-islands): merge overlapping
[start, end] intervals per key and report coverage — the classic
"time on site" / sensor-uptime / footprint-coverage rollup (the 1-D
analog of the reference's mosaic footprint union,
``merge_tiles_to_vrt.py``'s extent stitching).

Why it scales: interval union is ASSOCIATIVE under sorted merge, so the
plan is partial-then-final like every aggregation here — an in-block
partial merges each block's intervals into disjoint islands FIRST
(map_batches, vectorized), so what shuffles is islands (bounded by the
block's distinct gap structure), not raw intervals; the final pass is
ONE ``groupby(bucket).map_groups`` over 64 key-hash buckets that
re-merges cross-block islands and aggregates per key in the same
vectorized sweep. Per-group Python cost is O(buckets), not O(keys)
(the ``windows.sessionize`` shape). A hot key's islands all land on one
task — acceptable because the partial pass already collapsed dense
overlap; a key whose DISJOINT island count alone exceeds worker memory
would need a time-range presplit (the ``sessionize_presplit`` shape),
noted here as the documented partitioning assumption.

Kernel (one pandas/numpy sweep, no per-key Python): sort by (key,
start, end); grouped cummax of end gives each row the running coverage
frontier; ``is_new = key-change OR start > frontier(previous row)``
marks island starts; islands aggregate by ``reduceat``. The island max
end equals the key-cummax at the island's last row (earlier islands'
ends are strictly below the current island's start, so the key-level
frontier inside an island IS the island frontier).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.windows import _bucket_of


def _merge_islands(
    df: pd.DataFrame, key_col: str, s_col: str, e_col: str, n_col: str
) -> pd.DataFrame:
    """Merge intervals into disjoint islands per key; sums ``n_col``
    (source-interval counts) per island. Input rows may overlap
    arbitrarily; output islands are disjoint and sorted."""
    if len(df) == 0:
        return df
    df = df.sort_values([key_col, s_col, e_col], kind="mergesort")
    k = df[key_col].to_numpy()
    s = df[s_col].to_numpy()
    cm = df.groupby(key_col, sort=False)[e_col].cummax().to_numpy()
    n = df[n_col].to_numpy()
    new_key = np.empty(len(k), dtype=bool)
    new_key[0] = True
    new_key[1:] = k[1:] != k[:-1]
    is_new = new_key.copy()
    # previous row is same-key everywhere new_key is False
    is_new[1:] |= s[1:] > cm[:-1]
    starts = np.nonzero(is_new)[0]
    last = np.concatenate([starts[1:], [len(k)]]) - 1
    return pd.DataFrame(
        {
            key_col: k[starts],
            s_col: s[starts],
            e_col: cm[last],
            n_col: np.add.reduceat(n, starts),
        }
    )


def interval_coverage(
    ds: ray.data.Dataset,
    key_col: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key coverage stats of the interval union.

    Output: (key, n_intervals, n_islands, covered) where ``covered`` is
    the total length of the merged union (end - start summed over
    disjoint islands; touching intervals — next.start == frontier —
    merge, matching the closed-interval SQL twin convention).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy(zero_copy_only=False),
                "s": batch[start_col].to_numpy(zero_copy_only=False),
                "e": batch[end_col].to_numpy(zero_copy_only=False),
                "n": np.ones(batch.num_rows, dtype=np.int64),
            }
        )
        out = _merge_islands(df, key_col, "s", "e", "n")
        t = pa.Table.from_pandas(out, preserve_index=False)
        return t.append_column(
            "_bk", pa.array(_bucket_of(t[key_col], num_buckets), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = _merge_islands(g, key_col, "s", "e", "n")
        k = m[key_col].to_numpy()
        new_key = np.empty(len(k), dtype=bool)
        if len(k) == 0:
            return pd.DataFrame(
                {
                    key_col: k,
                    "n_intervals": k,
                    "n_islands": k,
                    "covered": k,
                }
            )
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        starts = np.nonzero(new_key)[0]
        lens = (m["e"].to_numpy() - m["s"].to_numpy()).astype(np.int64)
        return pd.DataFrame(
            {
                key_col: k[starts],
                "n_intervals": np.add.reduceat(m["n"].to_numpy(), starts),
                "n_islands": np.diff(
                    np.concatenate([starts, [len(k)]])
                ).astype(np.int64),
                "covered": np.add.reduceat(lens, starts),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(per_bucket, batch_format="pandas")
    )
