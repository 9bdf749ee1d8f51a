"""Streaming watermark / late-event detection (bounded-disorder audit).

A streaming pipeline admits an event only while it is no older than
the per-key WATERMARK (the max event-time already seen on that key
minus an allowed lateness); this stage replays that rule over a stored
log: for every row, the exclusive running max of event time over all
STRICTLY EARLIER arrivals of the same key (arrival order = a unique
monotone ingest id), and the late flag

``late  ⇔  ts + lateness < max(ts of earlier arrivals)``

(the ``ts + lateness`` form cannot underflow at the minus-infinity
sentinel; SQL's NULL-for-first-row comparison agrees — see the twin).

Scale design mirrors :func:`windows.grouped_running_sum` (running max
is associative exactly like the sum): keys hash into buckets, ONE
``groupby(bucket).map_groups`` computes segmented exclusive cummax
fully vectorized; a measured hot-key guard routes keys whose history
exceeds ``hot_key_limit`` rows through the presplit plan — arrival-id
range slices, per-slice local exclusive cummax, per-(key, slice) maxima
folded into exclusive prefix BASES (tiny), delivered by measured
broadcast — so no task ever holds a hot key's whole history.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.windows import (
    _bucket_of,
    _hot_key_stats,
    _segment_starts,
)

_NEG = np.int64(np.iinfo(np.int64).min)


def _excl_cummax(v: np.ndarray, new: np.ndarray) -> np.ndarray:
    """Exclusive running max within key segments (pre-sorted input);
    segment-first rows get the minus-infinity sentinel."""
    shifted = np.empty_like(v)
    shifted[0:1] = _NEG
    shifted[1:] = v[:-1]
    shifted[new] = _NEG
    gid = np.cumsum(new) - 1
    # segmented cummax at C speed (pandas hash-group cummax) — the max
    # analog of the cumsum-minus-segment-base trick; no Python loop
    # over keys, preserving the O(buckets) per-group cost contract
    return (
        pd.Series(shifted).groupby(gid).cummax().to_numpy().astype(np.int64)
    )


def grouped_watermark_late(
    ds: ray.data.Dataset,
    key_col: str,
    arr_col: str,
    ts_col: str,
    lateness: int,
    carry_cols: "tuple[str, ...]" = (),
    tie_col: "str | None" = None,
    num_buckets: int = 64,
    hot_key_limit: "int | None" = 2_000_000,
    n_ranges: int = 64,
) -> ray.data.Dataset:
    """Rows ``(key, arr, [tie], ts, carry..., wm, late)`` — ``wm`` the
    exclusive per-key running max of ``ts`` in (``arr``, ``tie``) order
    (int64, minus-infinity sentinel on each key's first arrival),
    ``late`` int64 0/1.  ``(arr, tie)`` must be unique per key; pass
    ``tie_col`` when the arrival stamp alone can collide (jittered
    ingest replay) — equal-``arr`` rows then order by the tie, exactly
    like SQL ``ORDER BY arr, tie``."""
    sort_cols = [key_col, arr_col] + ([tie_col] if tie_col else [])
    if hot_key_limit is not None:
        ds = ds.materialize()
        stats = _hot_key_stats(ds, key_col, arr_col)
        if stats is not None and stats[0] > hot_key_limit:
            return _watermark_presplit(
                ds, key_col, arr_col, ts_col, lateness, carry_cols,
                tie_col, num_buckets, n_ranges, a_lo=stats[1], a_hi=stats[2],
            )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        ts = g[ts_col].to_numpy().astype(np.int64)
        new = _segment_starts(g, key_col)
        wm = _excl_cummax(ts, new)
        out = {
            key_col: g[key_col].to_numpy(),
            arr_col: g[arr_col].to_numpy(),
            ts_col: ts,
        }
        if tie_col:
            out[tie_col] = g[tie_col].to_numpy()
        for c in carry_cols:
            out[c] = g[c].to_numpy()
        out["wm"] = wm
        out["late"] = (ts + lateness < wm).astype(np.int64)
        return pd.DataFrame(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _watermark_presplit(
    ds: ray.data.Dataset,
    key_col: str,
    arr_col: str,
    ts_col: str,
    lateness: int,
    carry_cols: "tuple[str, ...]",
    tie_col: "str | None",
    num_buckets: int,
    n_ranges: int,
    a_lo: int,
    a_hi: int,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Hot-key path: arrival-id range slices, per-slice local exclusive
    cummax, per-(key, slice) maxima -> exclusive prefix-max BASES,
    measured-broadcast back; ``wm = max(base, local)`` exactly (max is
    associative).  Range slicing is by ``arr`` VALUE, so equal-``arr``
    ties never straddle a slice boundary — the per-slice
    (``arr``, ``tie``) sort settles them just as the one-shot plan
    does."""
    import ray as _ray

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    sort_cols = [key_col, arr_col] + ([tie_col] if tie_col else [])
    width = max(1, (a_hi - a_lo + n_ranges) // n_ranges)

    def tag(batch: pa.Table) -> pa.Table:
        arr = batch[arr_col].to_numpy().astype(np.int64)
        cols = {
            key_col: batch[key_col],
            arr_col: batch[arr_col],
            ts_col: batch[ts_col],
        }
        if tie_col:
            cols[tie_col] = batch[tie_col]
        for c in carry_cols:
            cols[c] = batch[c]
        cols["_rng"] = pa.array((arr - a_lo) // width, pa.int64())
        cols["_bk"] = pa.array(
            _bucket_of(batch[key_col], num_buckets), pa.int64()
        )
        return pa.table(cols)

    def per_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        ts = g[ts_col].to_numpy().astype(np.int64)
        new = _segment_starts(g, key_col)
        out = {
            key_col: g[key_col].to_numpy(),
            arr_col: g[arr_col].to_numpy(),
            ts_col: ts,
        }
        if tie_col:
            out[tie_col] = g[tie_col].to_numpy()
        for c in carry_cols:
            out[c] = g[c].to_numpy()
        out["_rng"] = g["_rng"].to_numpy()
        out["_local"] = _excl_cummax(ts, new)
        out["_slice_max"] = ts  # aggregated below via max
        return pd.DataFrame(out)

    local = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["_bk", "_rng"])
        .map_groups(per_slice, batch_format="pandas")
        .materialize()
    )

    def add_bk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def excl_cummax_bases(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_rng"], kind="mergesort")
        mx = g["max__slice_max"].to_numpy().astype(np.int64)
        new = _segment_starts(g, key_col)
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "_rng": g["_rng"].to_numpy(),
                "_base": _excl_cummax(mx, new),
            }
        )

    slice_max = coalesce_shuffle_agg(
        local.map_batches(
            lambda b: b.select([key_col, "_rng", "_slice_max"])
            .group_by([key_col, "_rng"])
            .aggregate([("_slice_max", "max")])
            .rename_columns([key_col, "_rng", "max__slice_max"]),
            batch_format="pyarrow",
        ),
        [key_col, "_rng"],
        {"max__slice_max": "max"},
    )
    bases = (
        slice_max.map_batches(add_bk, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(excl_cummax_bases, batch_format="pandas")
        .materialize()
    )
    n_bases = bases.count()
    assert n_bases <= broadcast_limit, (
        f"watermark presplit: {n_bases} (key, slice) bases exceed the "
        f"broadcast limit — raise n_ranges granularity or add a hash-join "
        f"delivery (the grouped_running_sum_presplit pattern)"
    )
    ref = _ray.put(bases.to_pandas())

    def finish(batch: pa.Table) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        w = worker_broadcast(ref)
        df = batch.select([key_col, "_rng"]).to_pandas()
        m = df.merge(w, on=[key_col, "_rng"], how="left")
        # every (key, rng) in `local` appears in `bases` by construction;
        # fillna is pure insurance so a contract breach can't silently
        # float-promote int64 bases
        base = m["_base"].fillna(int(_NEG)).to_numpy().astype(np.int64)
        ts = batch[ts_col].to_numpy().astype(np.int64)
        wm = np.maximum(batch["_local"].to_numpy().astype(np.int64), base)
        cols = {
            key_col: batch[key_col],
            arr_col: batch[arr_col],
            ts_col: batch[ts_col],
        }
        if tie_col:
            cols[tie_col] = batch[tie_col]
        for c in carry_cols:
            cols[c] = batch[c]
        cols["wm"] = pa.array(wm, pa.int64())
        cols["late"] = pa.array((ts + lateness < wm).astype(np.int64), pa.int64())
        return pa.table(cols)

    return local.map_batches(finish, batch_format="pyarrow")
