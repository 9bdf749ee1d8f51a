"""Distributed ordered-funnel analysis (conversion steps per key).

For every key (user), resolve an ordered sequence of step event types
with EARLIEST-NEXT semantics: ``t1`` = the key's earliest step-1 event;
``t_i`` = the earliest step-i event STRICTLY after ``t_{i-1}``. A missing
step cascades (no step-2 means no step-3, however many step-3 events
exist) — the standard product-analytics conversion funnel, which plain
GROUP BY cannot express (each step's window depends on the previous
step's resolved time).

Shape: ONE shuffle — keys hash into buckets (``windows._bucket_of``, the
same any-dtype stable bucketing every windowed stage uses), and each
bucket group resolves every step vectorized: one lexsort by (key, ts),
per-step masked segment minima via ``np.minimum.reduceat`` (mask =
type match AND strictly-after the key's previous-step time), zero Python
over rows or keys. Per-bucket memory is O(bucket rows); nothing is
keyed per-user at the driver, so key cardinality can grow with the
corpus (the 100-TB contract).

Timestamps are int64 microseconds (``asof.timestamp_to_us`` upstream —
the CLAUDE.md normalization rule). Missing steps surface as -1
sentinels (never NULL: a null int64 column would NaN-promote to float64
in pandas and silently round large values — CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_INT64_MAX = np.iinfo(np.int64).max


def funnel_steps(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key funnel resolution; see module docstring.

    Returns one row per distinct key: ``(key_col, depth, step1_us, ...,
    stepK_us)`` — ``depth`` = number of steps completed (0..K), unreached
    steps -1."""
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    from gis_scripts_ray.stages.windows import _bucket_of

    k = len(steps)
    out_names = [key_col, "depth"] + [f"step{i + 1}_us" for i in range(k)]
    out_schema = pa.schema([pa.field(c, pa.int64()) for c in out_names])

    def tag(batch: pa.Table) -> pa.Table:
        b = batch.select([key_col, ts_col, type_col])
        return b.append_column(
            "_bk", pa.array(_bucket_of(b[key_col], num_buckets), pa.int64())
        )

    def resolve(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        key = g[key_col].to_numpy().astype(np.int64, copy=False)
        ts = g[ts_col].to_numpy().astype(np.int64, copy=False)
        # per-step type masks computed in Arrow (string equality) before
        # entering numpy — no Python-object string comparisons
        type_masks = [
            pc.equal(g[type_col], pa.scalar(s)).to_numpy(zero_copy_only=False)
            for s in steps
        ]
        order = np.lexsort((ts, key))
        key_s, ts_s = key[order], ts[order]
        new = np.ones(n, dtype=bool)
        new[1:] = key_s[1:] != key_s[:-1]
        seg_starts = np.flatnonzero(new)
        seg_ids = np.cumsum(new) - 1  # per sorted row: its key's segment
        n_seg = len(seg_starts)
        prev = np.full(n_seg, np.int64(-(2**62)))  # before any real ts
        step_ts = np.empty((k, n_seg), dtype=np.int64)
        for i in range(k):
            m = type_masks[i][order] & (ts_s > prev[seg_ids])
            keyed = np.where(m, ts_s, _INT64_MAX)
            cur = np.minimum.reduceat(keyed, seg_starts)
            step_ts[i] = cur
            prev = cur  # INT64_MAX cascades: ts > MAX is never true
        reached = step_ts < _INT64_MAX
        depth = reached.sum(axis=0).astype(np.int64)
        cols = {
            key_col: pa.array(key_s[seg_starts], pa.int64()),
            "depth": pa.array(depth, pa.int64()),
        }
        for i in range(k):
            vals = np.where(reached[i], step_ts[i], -1)
            cols[f"step{i + 1}_us"] = pa.array(vals, pa.int64())
        return pa.table(cols, schema=out_schema)

    grouped = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(resolve, batch_format="pyarrow")
    )
    # typed empty seed: all-empty group outputs otherwise unify to a null
    # dataset schema (the interval-join quirk)
    seed = ray.data.from_arrow(out_schema.empty_table())
    return seed.union(grouped)


def transition_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Markov transition mining: global counts of consecutive
    (from_type → to_type) event pairs within each key's timeline —
    the session-flow / clickstream-graph shape. Order within a key is
    the TOTAL order (ts, id): the id tie-break makes the sequence (and
    therefore every count) deterministic when timestamps collide
    (CLAUDE.md tie-completeness rule).

    ONE key-bucket shuffle (adjacent events of one key can straddle
    blocks, so blockwise counting would drop boundary transitions); each
    bucket lexsorts once and reduces its transitions to per-pair partial
    counts in Arrow; the global finish is the adaptive combine over the
    (small) type-pair key space. Returns
    (from_type:string, to_type:string, n:int64), sorted."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.windows import _bucket_of

    out_schema = pa.schema(
        [
            pa.field("from_type", pa.string()),
            pa.field("to_type", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def tag(batch: pa.Table) -> pa.Table:
        b = batch.select([key_col, ts_col, id_col, type_col])
        return b.append_column(
            "_bk", pa.array(_bucket_of(b[key_col], num_buckets), pa.int64())
        )

    def count_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return out_schema.empty_table()
        key = g[key_col].to_numpy().astype(np.int64, copy=False)
        ts = g[ts_col].to_numpy().astype(np.int64, copy=False)
        ids = g[id_col].to_numpy().astype(np.int64, copy=False)
        order = np.lexsort((ids, ts, key))
        same = key[order][1:] == key[order][:-1]
        typ = g[type_col].take(pa.array(order))
        t = pa.table(
            {
                "from_type": typ.slice(0, n - 1).combine_chunks(),
                "to_type": typ.slice(1, n - 1).combine_chunks(),
                "n": pa.array(np.ones(n - 1, np.int64)),
            }
        ).filter(pa.array(same))
        return (
            t.group_by(["from_type", "to_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["from_type", "to_type", "n"])
        )

    grouped = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(count_group, batch_format="pyarrow")
    )
    seed = ray.data.from_arrow(out_schema.empty_table())
    return coalesce_shuffle_agg(
        seed.union(grouped), ["from_type", "to_type"], {"n": "sum"}
    ).sort(["from_type", "to_type"])


def session_paths_topk(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    gap_us: int,
    k: int = 20,
    sep: str = ">",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Top-k most frequent session paths ("top user journeys"): events
    sessionize per key (a NEW session starts when the gap to the
    previous event exceeds ``gap_us``), each session's event types join
    into a path string in (ts, id) total order, and paths rank globally
    by frequency (n DESC, path ASC).

    ONE key-bucket shuffle; each bucket sessionizes and builds every
    path vectorized — one lexsort, boundary flags, a ListArray rebuilt
    from session offsets and ONE ``binary_join`` (no Python over
    sessions) — then reduces to per-path partial counts; the global
    finish is the adaptive combine + the engine's top-k fold. Path
    cardinality is bounded by the type-alphabet branching, not the
    corpus, so the combine output stays small; the k-row result is the
    only driver-sized object. Returns (path:string, n:int64)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.topk import topk_per_group
    from gis_scripts_ray.stages.windows import _bucket_of

    out_schema = pa.schema(
        [pa.field("path", pa.string()), pa.field("n", pa.int64())]
    )

    def tag(batch: pa.Table) -> pa.Table:
        b = batch.select([key_col, ts_col, id_col, type_col])
        return b.append_column(
            "_bk", pa.array(_bucket_of(b[key_col], num_buckets), pa.int64())
        )

    def paths_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        key = g[key_col].to_numpy().astype(np.int64, copy=False)
        ts = g[ts_col].to_numpy().astype(np.int64, copy=False)
        ids = g[id_col].to_numpy().astype(np.int64, copy=False)
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        brk = np.ones(n, dtype=bool)
        brk[1:] = (k_s[1:] != k_s[:-1]) | (t_s[1:] - t_s[:-1] > gap_us)
        offs = np.append(np.flatnonzero(brk), n).astype(np.int64)
        types_sorted = g[type_col].take(pa.array(order)).combine_chunks()
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), types_sorted)
        t = pa.table(
            {
                "path": pc.binary_join(lst, sep).cast(pa.string()),
                "n": pa.array(np.ones(len(offs) - 1, np.int64)),
            }
        )
        return (
            t.group_by(["path"])
            .aggregate([("n", "sum")])
            .rename_columns(["path", "n"])
        )

    grouped = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(paths_group, batch_format="pyarrow")
    )
    seed = ray.data.from_arrow(out_schema.empty_table())
    counts = coalesce_shuffle_agg(seed.union(grouped), ["path"], {"n": "sum"})

    def add_g(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    top = topk_per_group(
        counts.map_batches(add_g, batch_format="pyarrow"), "_g", "n", "path", k
    )
    return top.map_batches(
        lambda b: pa.table(
            {
                "path": b["path"].combine_chunks().cast(pa.string()),
                "n": b["n"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
