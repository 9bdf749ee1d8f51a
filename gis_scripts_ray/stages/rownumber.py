"""Global consecutive row numbering (zipWithIndex) without a driver
bottleneck — the primitive behind stable shard ids, resumable cursors
and deterministic round-robin assignment.

Reference semantics: SQL ``ROW_NUMBER() OVER (ORDER BY key)`` over the
whole corpus. The naive plan (sort + collect + enumerate) materializes
the dataset at the driver; the scale plan is the classic two-pass
prefix-offset scheme:

1. ``sort(key)`` range-partitions the stream into blocks with
   non-overlapping key ranges (Ray's sample-based shuffle), then the
   dataset MATERIALIZES so both passes see the identical block
   structure.
2. Pass 1 reads each block once (``batch_size=None`` = one batch per
   block, zero-copy) and emits its (min key, row count) — O(blocks)
   rows at the driver, never data.
3. Exclusive prefix sums over blocks ordered by min key give each
   block its global BASE; pass 2 broadcasts the tiny
   (min key -> base) map and assigns ``base + local rank`` fully
   vectorized.

The key must be globally unique (the fixture uses an injective 64-bit
multiplicative hash); uniqueness makes the order — and the numbering —
total without a tie contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _min_row(batch: pa.Table, keys: list[str]) -> tuple:
    """Lexicographic min row of ``batch[keys]`` (composite keys must be
    unique corpus-wide, so per-block min rows are distinct)."""
    idx = pa.compute.sort_indices(
        batch.select(keys), sort_keys=[(k, "ascending") for k in keys]
    )
    i = int(idx[0].as_py())
    return tuple(batch[k][i].as_py() for k in keys)


def zip_with_index_multi(
    ds: ray.data.Dataset,
    keys: list[str],
    out_col: str = "rn",
    start: int = 1,
) -> ray.data.Dataset:
    """Multi-key :func:`zip_with_index`: ``out_col`` = the global rank in
    lexicographic ``keys`` order (the composite must be unique — e.g. end
    with a primary key). Same two-pass prefix-offset plan; the per-block
    identity is the block's min KEY TUPLE (distinct across blocks because
    the range partitioner assigns disjoint key ranges and composites never
    tie), looked up exactly instead of searchsorted."""
    ds = ds.sort(keys).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"_k": pa.array([], pa.string()), "_n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "_k": pa.array([repr(_min_row(batch, keys))], pa.string()),
                "_n": pa.array([batch.num_rows], pa.int64()),
                # carry the raw key columns for the driver-side ordering
                **{
                    f"_c{i}": batch[k].take(
                        pa.compute.sort_indices(
                            batch.select(keys),
                            sort_keys=[(k2, "ascending") for k2 in keys],
                        )[:1]
                    )
                    for i, k in enumerate(keys)
                },
            }
        )

    stats = ds.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    stats = stats.sort_values([f"_c{i}" for i in range(len(keys))], kind="stable")
    counts = stats["_n"].to_numpy().astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else counts
    base_map = dict(zip(stats["_k"].tolist(), (bases + start).tolist()))
    import ray as _ray

    ref = _ray.put(base_map)

    def assign(batch: pa.Table, *, _ref=ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        bmap = worker_broadcast(_ref)
        base = int(bmap[repr(_min_row(batch, keys))])
        order = pa.compute.sort_indices(
            batch.select(keys), sort_keys=[(k, "ascending") for k in keys]
        ).to_numpy(zero_copy_only=False)
        rn = np.empty(batch.num_rows, dtype=np.int64)
        rn[order] = base + np.arange(batch.num_rows, dtype=np.int64)
        return batch.append_column(out_col, pa.array(rn, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def zip_with_index(
    ds: ray.data.Dataset,
    key_col: str,
    out_col: str = "rn",
    start: int = 1,
) -> ray.data.Dataset:
    """Append ``out_col`` = the 1-based (or ``start``-based) global rank
    of ``key_col`` (which must be unique; int64/uint64)."""
    ds = ds.sort(key_col).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            e = pa.array([], pa.uint64())
            return pa.table({"_mn": e, "_n": pa.array([], pa.int64())})
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_mn": pa.array([np.uint64(k.min())], pa.uint64()),
                "_n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(block_stats, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("_mn")
    )
    mins = stats["_mn"].to_numpy().astype(np.uint64)
    counts = stats["_n"].to_numpy().astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else counts
    import ray as _ray

    ref = _ray.put((mins, bases + start))

    def assign(batch: pa.Table, *, _ref=ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        mns, bs = worker_broadcast(_ref)
        k = batch[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")  # unique keys: total order
        base = int(bs[np.searchsorted(mns, np.uint64(k.min()), side="right") - 1])
        rn = np.empty(len(k), dtype=np.int64)
        rn[order] = base + np.arange(len(k), dtype=np.int64)
        return batch.append_column(out_col, pa.array(rn, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
