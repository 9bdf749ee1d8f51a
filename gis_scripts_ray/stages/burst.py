"""Per-key bounded temporal self-join — count ordered event pairs of
the same key within a time window Δ (burst detection, rapid-retry
counting, dwell-pair features). The SQL shape is the inequality self-
join ``b.ts > a.ts AND b.ts <= a.ts + Δ``; the engine shape here needs
NO join at all: one 64-bucket shuffle, and inside each bucket ONE pair
of ``np.searchsorted`` calls over a composite key

    z = rank(key) << shift | (ts - bucket_min)

where ``shift`` is sized per bucket so a key's whole time range fits
below the key rank's bits — then #pairs for row i is
``searchsorted(z, z_i + Δ, right) − searchsorted(z, z_i, right)``,
which counts exactly the STRICTLY-LATER same-key events in (t, t+Δ]
(identical timestamps never count, matching the twin's ``>``). The
composite never crosses a key boundary because (ts − min) + Δ < 2^shift
by construction. Per-group Python cost is O(buckets); the guard raises
if rank_bits + shift would exceed 63 (keys-per-bucket × time span too
large — re-bucket finer in that regime).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.windows import _bucket_of


def burst_pair_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    delta_us: int,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """(key, n_pairs): ordered same-key event pairs with
    0 < t_b − t_a <= delta_us. ``ts_col`` may be timestamp[us] or int64
    micros (normalized inside — the pandas-ns trap)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g[ts_col].to_numpy()
        if us.dtype.kind == "M":
            us = us.astype("datetime64[us]").astype(np.int64)
        else:
            us = us.astype(np.int64)
        key = g[key_col].to_numpy()
        order = np.lexsort((us, key))
        key, us = key[order], us[order]
        # factorize keys to ranks (raw ids may be arbitrarily large)
        new = np.empty(len(key), dtype=bool)
        if len(key) == 0:
            return pd.DataFrame({key_col: key, "n_pairs": us})
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        rank = np.cumsum(new) - 1
        t0 = int(us.min())
        span = int(us.max()) - t0 + delta_us + 1
        shift = max(int(span).bit_length(), 1)
        if shift + int(rank[-1] + 1).bit_length() > 63:
            raise ValueError(
                "burst_pair_counts: keys x span exceed the composite-key "
                "domain for this bucket — raise num_buckets"
            )
        z = (rank << shift) | (us - t0)
        hi = np.searchsorted(z, z + delta_us, side="right")
        lo = np.searchsorted(z, z, side="right")
        cnt = (hi - lo).astype(np.int64)
        starts = np.flatnonzero(new)
        return pd.DataFrame(
            {
                key_col: key[starts],
                "n_pairs": np.add.reduceat(cnt, starts),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(per_bucket, batch_format="pandas")
    )
