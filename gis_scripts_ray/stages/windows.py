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

    Bucketed-vectorized (the :func:`grouped_running_sum` shape): keys
    hash into 64 buckets, one ``groupby(bucket).map_groups`` labels and
    aggregates EVERY key of a bucket in one pass (mergesort + masked
    diff + segment reduce) — per-group Python cost is O(buckets), not
    O(keys). Sessionization stays per-key-sequential, so a hot key's
    ENTIRE event history still lands on one task. That is acceptable for
    user/host keys (bounded per-entity history); for a key whose history
    exceeds one worker's memory use :func:`sessionize_presplit` — same
    output, but no task ever holds more than one (key, time-range)
    slice.
    """
    num_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = _segment_starts(g, key_col)
        brk = np.zeros(len(us), dtype=bool)
        brk[0] = True
        brk[1:] = (np.diff(us) > gap_us) | new_key[1:]
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [len(us)]])
        # 1-based session ordinal within each key
        sess_new_key = new_key[starts]
        kgid = np.cumsum(sess_new_key) - 1
        first_sess = np.zeros(int(kgid[-1]) + 1, dtype=np.int64)
        first_sess[kgid[sess_new_key]] = np.nonzero(sess_new_key)[0]
        sid = np.arange(len(starts), dtype=np.int64) - first_sess[kgid] + 1
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy()[starts],
                "session_id": sid,
                "n_events": (ends - starts).astype(np.int64),
                "start_us": us[starts],
                "end_us": us[ends - 1],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(per_bucket, batch_format="pandas")
    )


def sessionize_presplit(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
    range_us: int,
) -> ray.data.Dataset:
    """:func:`sessionize` for HOT keys: identical output, bounded tasks.

    The round-2 verdict's documented mitigation, implemented (the
    ``components.py`` boundary-merge shape):

    1. pre-split by coarse time range (``_range = ts // range_us``) —
       ``groupby(key, _range)`` tasks hold one slice, never a key's whole
       history;
    2. sessionize each slice locally (1-based ``local_sid``);
    3. ONLY the boundary facts (first/last session per slice — O(2 x
       key-ranges), not O(events)) come to the driver, which walks each
       key's slices in time order: slice i's first session merges into
       the running chain iff its first event is within ``gap_us`` of
       slice i-1's last event — exactly the per-event rule, because the
       inter-slice gap IS the gap between those two consecutive events.
       The walk emits one ``base`` per (key, range) such that
       ``global_sid = base + local_sid``; a backward merge is encoded by
       overlapping bases (slice i's session 1 gets the chain's sid);
    4. broadcast the (tiny) base table, relabel the SESSION rows (not
       events) via a vectorized merge, and combine merged sessions'
       parts with an associative (sum, min, max) aggregate.

    Output: (key, session_id, n_events, start_us, end_us) — equal to
    :func:`sessionize` (equivalence-tested on chains spanning 3+ ranges).
    """
    import pyarrow.compute as pc
    import ray as _ray

    from gis_scripts_ray.state.broadcast import worker_broadcast
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def add_range(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        rng = pc.floor(pc.divide(pc.cast(us, pa.float64()), float(range_us)))
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                "_us": us,
                "_range": pc.cast(rng, pa.int64()),
            }
        )

    def per_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_us", id_col], kind="mergesort")
        us = g["_us"].to_numpy()
        new = np.empty(len(us), dtype=np.int64)
        new[0] = 1
        new[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        out = pd.DataFrame({"local_sid": sid, "us": us})
        agg = out.groupby("local_sid", as_index=False).agg(
            n_events=("us", "size"), start_us=("us", "min"), end_us=("us", "max")
        )
        agg[key_col] = g[key_col].iloc[0]
        agg["_range"] = g["_range"].iloc[0]
        agg["n_local"] = len(agg)
        return agg[[key_col, "_range", "local_sid", "n_events", "start_us", "end_us", "n_local"]]

    local = (
        ds.map_batches(add_range, batch_format="pyarrow")
        .groupby([key_col, "_range"])
        .map_groups(per_slice, batch_format="pandas")
        .materialize()
    )

    # boundary facts only: first + last session per (key, range)
    def boundary(batch: pa.Table) -> pa.Table:
        first = pc.equal(batch["local_sid"], 1)
        last = pc.equal(batch["local_sid"], batch["n_local"])
        return batch.filter(pc.or_(first, last))

    bt = local.map_batches(boundary, batch_format="pyarrow").to_pandas()
    bt = bt.sort_values([key_col, "_range", "local_sid"], kind="mergesort")

    bases: list[tuple] = []  # (key, range, base)
    for key, kg in bt.groupby(key_col, sort=False):
        c = 0
        prev_end = None
        for rng_val, rg in kg.groupby("_range", sort=True):
            first_row = rg.iloc[0]
            last_row = rg.iloc[-1]
            m = int(first_row["n_local"])
            merged = (
                prev_end is not None
                and int(first_row["start_us"]) - prev_end <= gap_us
            )
            base = c - 1 if merged else c
            bases.append((key, int(rng_val), base))
            c = base + m
            prev_end = int(last_row["end_us"])

    base_df = pd.DataFrame(bases, columns=[key_col, "_range", "_base"])
    if len(base_df) == 0:
        # typed empty frame: pandas merge raises on object-vs-int64 key
        # dtypes even when both sides are empty
        base_df = base_df.astype({"_range": np.int64, "_base": np.int64})
    ref = _ray.put(base_df)

    def relabel(batch: pa.Table, ref=None) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    key_col: pa.array([], batch.schema.field(key_col).type),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                }
            )
        bd = worker_broadcast(ref)
        df = batch.to_pandas().merge(bd, on=[key_col, "_range"], how="left")
        sid = df["_base"].to_numpy().astype(np.int64) + df["local_sid"].to_numpy()
        return pa.table(
            {
                key_col: pa.array(df[key_col]),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(df["n_events"].to_numpy(), pa.int64()),
                "start_us": pa.array(df["start_us"].to_numpy(), pa.int64()),
                "end_us": pa.array(df["end_us"].to_numpy(), pa.int64()),
            }
        )

    relabeled = local.map_batches(relabel, fn_kwargs={"ref": ref}, batch_format="pyarrow")
    # merged sessions (one part per adjacent range) combine associatively
    return coalesce_shuffle_agg(
        relabeled,
        [key_col, "session_id"],
        {"n_events": "sum", "start_us": "min", "end_us": "max"},
    )


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


def _bucket_of(keys: pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Stable hash bucket per key value (any dtype, via polars xxhash)."""
    import polars as pl

    s = pl.from_arrow(keys)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    return (s.hash(seed=11).to_numpy() % np.uint64(num_buckets)).astype(np.int64)


def _segment_starts(df: pd.DataFrame, key_col: str) -> np.ndarray:
    """Boolean new-segment mask over a frame pre-sorted by key."""
    a = df[key_col].to_numpy()
    new = np.zeros(len(a), dtype=bool)
    if len(a):
        new[0] = True
        new[1:] = a[1:] != a[:-1]
    return new


def _hot_key_stats(
    ds: ray.data.Dataset, key_col: str, ts_col: str
) -> "tuple[int, int, int] | None":
    """(max per-key row count, global min ts, global max ts) in one
    measuring pass (in-batch partial group_by + adaptive combine + one
    tiny aggregate) — the measured fact the hot-key auto-presplit
    dispatch needs. Returns None on an empty input."""
    from ray.data.aggregate import Max, Min

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def partial(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({key_col: batch[key_col], "_lo": us, "_hi": us})
        out = t.group_by([key_col]).aggregate(
            [("_lo", "count"), ("_lo", "min"), ("_hi", "max")]
        )
        ren = {"_lo_count": "_n", "_lo_min": "_lo", "_hi_max": "_hi"}
        return out.rename_columns([ren.get(c, c) for c in out.column_names])

    per_key = coalesce_shuffle_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col],
        {"_n": "sum", "_lo": "min", "_hi": "max"},
    ).materialize()
    if per_key.count() == 0:
        return None
    row = per_key.aggregate(Max("_n"), Min("_lo"), Max("_hi"))
    return int(row["max(_n)"]), int(row["min(_lo)"]), int(row["max(_hi)"])


def grouped_running_sum(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    out_col: str = "run_total",
    num_buckets: int = 64,
    hot_key_limit: "int | None" = 2_000_000,
    n_ranges: int = 64,
) -> ray.data.Dataset:
    """Per-key cumulative sum ordered by (ts, id) — the running-total
    window (``SUM(v) OVER (PARTITION BY key ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)``). Output = the input rows (key, id, value)
    plus ``out_col``; the raw timestamp is dropped so the result stays
    in the exact int64 domain end to end (pandas would re-emit it as
    nanoseconds — the us/ns divergence CLAUDE.md flags).

    Scale design: keys hash into ``num_buckets`` buckets and the shuffle
    is ONE ``groupby(bucket).map_groups`` — inside a bucket the prefix
    sums are fully vectorized (one mergesort by (key, ts, id), one
    cumsum, one segment-base subtraction), so the per-group Python cost
    is O(buckets), not O(keys) (the naive per-key ``map_groups`` paid
    ~15k pandas round-trips for 15k customers — measured 20.6 s -> see
    BASELINE.md ledger). (ts, id) must be unique per key for a
    deterministic order; value should be integer (cents/micros) so the
    sums are exact.

    Hot keys (round-3 verdict task #6): a key's history lands on one
    task only up to ``hot_key_limit`` rows — one measuring pass
    (:func:`_hot_key_stats`) checks the MAX per-key count, and above the
    limit the plan routes through :func:`grouped_running_sum_presplit`
    (the :func:`sessionize_presplit` shape: time-range slices + slice
    totals + distributed prefix bases), so no single task ever holds a
    hot key's whole history. The measuring pass runs over a MATERIALIZED
    copy of the (caller-projected, narrow) input so storage is scanned
    exactly once — the chosen plan then consumes the same blocks
    zero-copy from the object store (spilling bounds memory for giant
    inputs). ``hot_key_limit=None`` skips the measuring pass AND the
    materialize (callers with a known per-key bound keep full
    streaming)."""
    if hot_key_limit is not None:
        ds = ds.materialize()
        stats = _hot_key_stats(ds, key_col, ts_col)
        if stats is not None and stats[0] > hot_key_limit:
            return grouped_running_sum_presplit(
                ds,
                key_col,
                ts_col,
                id_col,
                value_col,
                out_col=out_col,
                num_buckets=num_buckets,
                n_ranges=n_ranges,
                t_lo=stats[1],
                t_hi=stats[2],
            )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        v = g[value_col].to_numpy()
        cs = np.cumsum(v)
        new = _segment_starts(g, key_col)
        gid = np.cumsum(new) - 1
        start_base = (cs - v)[new]  # running total just before each key starts
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                id_col: g[id_col].to_numpy(),
                value_col: v,
                out_col: cs - start_base[gid],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(per_bucket, batch_format="pandas")
    )


def grouped_running_sum_presplit(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    out_col: str = "run_total",
    num_buckets: int = 64,
    n_ranges: int = 64,
    t_lo: "int | None" = None,
    t_hi: "int | None" = None,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """:func:`grouped_running_sum` for HOT keys: identical output, bounded
    tasks — no task ever holds a key's whole history (the
    :func:`sessionize_presplit` shape, round-3 verdict task #6).

    1. tag rows with a global time-range slice (``_rng``, ``n_ranges``
       equal widths of the measured ts span) and a key-hash bucket;
    2. one ``groupby(bucket, _rng).map_groups`` computes per-key LOCAL
       prefix sums inside each slice — vectorized (mergesort + segmented
       cumsum), O(buckets x ranges) Python;
    3. slice totals (per (key, _rng) value sums — an in-batch partial
       aggregate, never rows) turn into per-slice BASE offsets with a
       segmented EXCLUSIVE cumsum per key, again bucket-vectorized;
    4. bases join back: broadcast merge when the measured (key, range)
       count fits ``broadcast_limit``, else a composite-key hash join —
       the dedup_rows adaptive-delivery pattern.

    ``run_total = local + base`` exactly (integer domain end to end).
    """
    import ray as _ray

    from gis_scripts_ray.stages.tile_agg import cell_sum_count

    if t_lo is None or t_hi is None:
        stats = _hot_key_stats(ds, key_col, ts_col)
        if stats is None:
            return grouped_running_sum(
                ds, key_col, ts_col, id_col, value_col, out_col,
                num_buckets, hot_key_limit=None,
            )
        t_lo, t_hi = stats[1], stats[2]
    width = max(1, (t_hi - t_lo + n_ranges) // n_ranges)

    def tag(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                value_col: batch[value_col],
                "_us": pa.array(us, pa.int64()),
                "_rng": pa.array((us - t_lo) // width, pa.int64()),
                "_bk": pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64()),
            }
        )

    def per_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", id_col], kind="mergesort")
        v = g[value_col].to_numpy()
        cs = np.cumsum(v)
        new = _segment_starts(g, key_col)
        gid = np.cumsum(new) - 1
        start_base = (cs - v)[new]
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                id_col: g[id_col].to_numpy(),
                value_col: v,
                "_rng": g["_rng"].to_numpy(),
                "_local": cs - start_base[gid],
            }
        )

    local = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["_bk", "_rng"])
        .map_groups(per_slice, batch_format="pandas")
        .materialize()  # consumed twice: slice totals + the base merge
    )

    # per-(key, slice) totals -> exclusive per-key prefix bases, bucketed
    sum_col = "sum_" + value_col

    def add_bk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def excl_cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_rng"], kind="mergesort")
        s = g[sum_col].to_numpy()
        cs = np.cumsum(s)
        new = _segment_starts(g, key_col)
        gid = np.cumsum(new) - 1
        start = (cs - s)[new]
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "_rng": g["_rng"].to_numpy(),
                "_base": (cs - s) - start[gid],
            }
        )

    bases = (
        cell_sum_count(local, [key_col, "_rng"], [value_col])
        .map_batches(add_bk, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(excl_cumsum, batch_format="pandas")
        .materialize()
    )
    n_bases = bases.count()

    if n_bases <= broadcast_limit:
        ref = _ray.put(bases.to_pandas())

        def add_base(batch: pa.Table) -> pa.Table:
            from gis_scripts_ray.state.broadcast import worker_broadcast

            w = worker_broadcast(ref)
            df = batch.select([key_col, "_rng"]).to_pandas()
            m = df.merge(w, on=[key_col, "_rng"], how="left")
            b = m["_base"].to_numpy()
            assert not np.isnan(b).any() if b.dtype.kind == "f" else True
            run = batch["_local"].to_numpy() + b.astype(np.int64)
            return pa.table(
                {
                    key_col: batch[key_col],
                    id_col: batch[id_col],
                    value_col: batch[value_col],
                    out_col: pa.array(run, pa.int64()),
                }
            )

        return local.map_batches(add_base, batch_format="pyarrow")

    from gis_scripts_ray.stages.joins import hash_join

    bases = bases.repartition(max(1, min(64, n_bases // 2_000_000 + 1)))
    j = hash_join(local, bases, on=(key_col, "_rng"))

    def finish(batch: pa.Table) -> pa.Table:
        run = batch["_local"].to_numpy() + batch["_base"].to_numpy()
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                value_col: batch[value_col],
                out_col: pa.array(run.astype(np.int64), pa.int64()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def grouped_gap_stats(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_buckets: int = 64,
    hot_key_limit: "int | None" = 2_000_000,
    n_ranges: int = 64,
) -> ray.data.Dataset:
    """Per-key inter-event-gap statistics: order each key's events by
    (ts, id), difference consecutive int64-us timestamps (the LAG window),
    and reduce to one exact row per key — (key, n_gaps, sum_gap_us,
    max_gap_us). Keys with a single event emit n_gaps = 0 with zero sums.

    Same bucketed-vectorized shape as :func:`grouped_running_sum`: one
    ``groupby(bucket).map_groups`` with all keys of a bucket differenced
    in one vectorized pass (gaps at key boundaries masked out), so the
    per-group Python cost is O(buckets). The sums are exact int64
    microseconds — order-independent, and the mean gap is a single float
    expression of exact inputs downstream.

    Hot keys: same measured auto-dispatch as :func:`grouped_running_sum`
    — above ``hot_key_limit`` rows for any single key the plan routes
    through :func:`grouped_gap_stats_presplit` (time-range slices whose
    boundary facts merge associatively), so no task holds a hot key's
    whole history. As in :func:`grouped_running_sum`, measuring runs on
    a materialized copy of the narrow input so storage is scanned once;
    ``hot_key_limit=None`` skips both the measuring pass and the
    materialize."""
    if hot_key_limit is not None:
        ds = ds.materialize()
        stats = _hot_key_stats(ds, key_col, ts_col)
        if stats is not None and stats[0] > hot_key_limit:
            return grouped_gap_stats_presplit(
                ds,
                key_col,
                ts_col,
                id_col,
                num_buckets=num_buckets,
                n_ranges=n_ranges,
                t_lo=stats[1],
                t_hi=stats[2],
            )

    def add_bucket(batch: pa.Table) -> pa.Table:
        # normalize ts to int64 MICROS in the Arrow domain (CLAUDE.md
        # rule): a pandas-origin timestamp[ns] column would otherwise
        # reach per_bucket as raw nanosecond int64 — 1000x off vs the
        # presplit twin, and the hot-key dispatch flips between the two
        # paths on measured data volume
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        batch = batch.set_column(
            batch.column_names.index(ts_col), ts_col, us
        )
        return batch.append_column(
            "_bk", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy(dtype=np.int64)
        new = _segment_starts(g, key_col)
        gid = np.cumsum(new) - 1
        n_groups = int(gid[-1]) + 1 if len(gid) else 0
        gaps = np.diff(us)
        in_seg = ~new[1:]  # a diff crossing a key boundary is not a gap
        seg_gid = gid[1:][in_seg]
        seg_gaps = gaps[in_seg]
        n_gaps = np.zeros(n_groups, dtype=np.int64)
        np.add.at(n_gaps, seg_gid, 1)
        sum_gap = np.zeros(n_groups, dtype=np.int64)
        np.add.at(sum_gap, seg_gid, seg_gaps)
        max_gap = np.zeros(n_groups, dtype=np.int64)
        np.maximum.at(max_gap, seg_gid, seg_gaps)
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy()[new],
                "n_gaps": n_gaps,
                "sum_gap_us": sum_gap,
                "max_gap_us": max_gap,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(per_bucket, batch_format="pandas")
    )


def grouped_gap_stats_presplit(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_buckets: int = 64,
    n_ranges: int = 64,
    t_lo: "int | None" = None,
    t_hi: "int | None" = None,
) -> ray.data.Dataset:
    """:func:`grouped_gap_stats` for HOT keys: identical output, bounded
    tasks. Gap stats merge ASSOCIATIVELY across time slices — a key's
    per-slice (n, sum, max) facts plus its slice first/last timestamps
    reconstruct the global stats exactly: the only gaps a slice split
    hides are the cross-slice ones, and each is ``first_us(slice i) -
    last_us(slice i-1)`` over the key's OCCUPIED slices in time order
    (empty intermediate ranges change nothing — the gap is between the
    two adjacent events, whichever slices they fall in).

    Two bucketed vectorized rounds, no joins: (1) per-(bucket, range)
    in-slice segmented gap stats; (2) per key-hash bucket, the O(key x
    occupied-ranges) boundary rows combine with segmented reductions.
    O(buckets x ranges) Python; rows shuffle once, boundary facts once.
    """
    if t_lo is None or t_hi is None:
        stats = _hot_key_stats(ds, key_col, ts_col)
        if stats is None:
            return grouped_gap_stats(
                ds, key_col, ts_col, id_col, num_buckets, hot_key_limit=None
            )
        t_lo, t_hi = stats[1], stats[2]
    width = max(1, (t_hi - t_lo + n_ranges) // n_ranges)

    def tag(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                "_us": pa.array(us, pa.int64()),
                "_rng": pa.array((us - t_lo) // width, pa.int64()),
                "_bk": pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64()),
            }
        )

    def per_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", id_col], kind="mergesort")
        us = g["_us"].to_numpy()
        new = _segment_starts(g, key_col)
        gid = np.cumsum(new) - 1
        n_groups = int(gid[-1]) + 1 if len(gid) else 0
        gaps = np.diff(us)
        in_seg = ~new[1:]
        sg, sv = gid[1:][in_seg], gaps[in_seg]
        n_gaps = np.zeros(n_groups, dtype=np.int64)
        np.add.at(n_gaps, sg, 1)
        sum_gap = np.zeros(n_groups, dtype=np.int64)
        np.add.at(sum_gap, sg, sv)
        max_gap = np.zeros(n_groups, dtype=np.int64)
        np.maximum.at(max_gap, sg, sv)
        last_pos = np.where(np.append(new[1:], True))[0]
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy()[new],
                "_rng": g["_rng"].to_numpy()[new],
                "n_gaps": n_gaps,
                "sum_gap_us": sum_gap,
                "max_gap_us": max_gap,
                "first_us": us[new],
                "last_us": us[last_pos],
            }
        )

    def add_bk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bk2", pa.array(_bucket_of(batch[key_col], num_buckets), pa.int64())
        )

    def combine_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_rng"], kind="mergesort")
        new = _segment_starts(g, key_col)
        gid = np.cumsum(new) - 1
        n_groups = int(gid[-1]) + 1 if len(gid) else 0
        cross = g["first_us"].to_numpy()[1:] - g["last_us"].to_numpy()[:-1]
        in_seg = ~new[1:]
        cg, cv = gid[1:][in_seg], cross[in_seg]
        n_gaps = np.zeros(n_groups, dtype=np.int64)
        np.add.at(n_gaps, gid, g["n_gaps"].to_numpy())
        np.add.at(n_gaps, cg, 1)
        sum_gap = np.zeros(n_groups, dtype=np.int64)
        np.add.at(sum_gap, gid, g["sum_gap_us"].to_numpy())
        np.add.at(sum_gap, cg, cv)
        max_gap = np.zeros(n_groups, dtype=np.int64)
        np.maximum.at(max_gap, gid, g["max_gap_us"].to_numpy())
        np.maximum.at(max_gap, cg, cv)
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy()[new],
                "n_gaps": n_gaps,
                "sum_gap_us": sum_gap,
                "max_gap_us": max_gap,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["_bk", "_rng"])
        .map_groups(per_slice, batch_format="pandas")
        .map_batches(add_bk, batch_format="pyarrow")
        .groupby("_bk2")
        .map_groups(combine_key, batch_format="pandas")
    )
