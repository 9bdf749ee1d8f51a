"""Event-time windows over the ordered events log: tumbling, sliding, session.

Ray Data has no native event-time windowing (SURVEY.md §2.8: the reference
has none either — all ordering contracts here are explicit sort keys). The
pattern: key-partitioned ``groupby(key).map_groups`` with an in-group sort
by (ts, id) — deterministic under any block structure. Timestamps are
int64 microseconds end-to-end (exact; no float time arithmetic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def tumbling_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    window_us: int,
) -> ray.data.Dataset:
    """(key, window_start_us, n) via in-batch pre-agg + small shuffle."""
    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    def prep(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        win = (us // window_us) * window_us
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start_us": pa.array(win, pa.int64()),
                "one": pa.array(np.ones(len(us), dtype=np.int64), pa.int64()),
            }
        )

    out = cell_sum_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        [key_col, "window_start_us"],
        ["one"],
    )
    return out.drop_columns(["sum_one"])


def sessionize(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
) -> ray.data.Dataset:
    """Session windows: a new session starts when the gap to the previous
    event (per key, ordered by (ts, id)) exceeds ``gap_us``.

    Output: (key, session_id 1-based, n_events, start_us, end_us).

    Skew note: sessionization is inherently per-key-sequential, so a hot
    key's ENTIRE event history lands on one ``map_groups`` task. That is
    acceptable for user/host keys (bounded per-entity history); for a key
    whose history exceeds one worker's memory, pre-split the key by
    coarse time range, sessionize per (key, range), and stitch the
    at-most-one boundary session per range pair at the driver (the same
    boundary-merge shape as ``stages/components.py``).
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new = np.empty(len(us), dtype=np.int64)
        new[0] = 1
        new[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "session_id": sid,
                "us": us,
            }
        )
        agg = out.groupby("session_id", as_index=False).agg(
            **{
                key_col: (key_col, "first"),
                "n_events": ("us", "size"),
                "start_us": ("us", "min"),
                "end_us": ("us", "max"),
            }
        )
        return agg[[key_col, "session_id", "n_events", "start_us", "end_us"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def sliding_window_sum(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    slide_us: int,
) -> ray.data.Dataset:
    """Sliding windows via replication into the ceil(window/slide) hops each
    event belongs to, then one grouped sum — shuffle carries one small row
    per (event, hop)."""
    hops = int(np.ceil(window_us / slide_us))

    def expand(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        vals = batch[value_col].to_numpy()
        keys = batch[key_col].to_numpy()
        base = (us // slide_us) * slide_us
        out_key, out_win, out_val = [], [], []
        for h in range(hops):
            win = base - h * slide_us
            keep = us < win + window_us
            out_key.append(keys[keep])
            out_win.append(win[keep])
            out_val.append(vals[keep])
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_key)),
                "window_start_us": pa.array(np.concatenate(out_win), pa.int64()),
                value_col: pa.array(np.concatenate(out_val)),
            }
        )

    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    return cell_sum_count(
        ds.map_batches(expand, batch_format="pyarrow"),
        [key_col, "window_start_us"],
        [value_col],
    )
