"""Distributed per-group top-k (largest k rows per key).

The LLM-pipeline shape: "keep the best k documents per domain/bucket".
A global sort is an all-to-all over every row; per-group top-k only ever
needs k rows per (group, block) to survive a block, so the engine runs
the repo's established partial-top-k pattern (``knn.py:38``) per GROUP:

* per-block partial: vectorized lexsort + segment-rank keep (each block
  reduces to <= k rows per group present in it) — the shuffle then
  carries O(k x groups x blocks) rows, never the corpus;
* bounded coalesce level folding the same kernel (associative: ties are
  broken (value DESC, id ASC) INSIDE partials, the repo's tie rule —
  bare per-block argpartition is block-structure-dependent under ties);
* adaptive finish, same decision as ``tile_agg.coalesce_shuffle_agg``:
  single-block fold when the MEASURED reduced size fits, else a
  hash-shuffle ``groupby().map_groups`` (the key space really is huge).

Contract: one group column, int64/float value (int64 min excluded — the
kernel negates for descending sort), unique ids within a group make the
result total-order deterministic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _sort_codes(arr: np.ndarray) -> np.ndarray:
    """Order-preserving integer codes for lexsort keys: non-numeric
    columns (string groups/ids — hosts, languages) factorize via
    ``np.unique``, whose inverse codes sort exactly as the values do."""
    if arr.dtype != object and np.issubdtype(arr.dtype, np.number):
        return arr
    _, inv = np.unique(arr, return_inverse=True)
    return inv


def topk_batch(
    batch: pa.Table,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int,
    ascending: bool = False,
) -> pa.Table:
    """Keep the top-k rows per group of ONE batch — (value DESC, id ASC)
    total order (``ascending=True`` flips to value ASC — the kNN
    smallest-distance shape), vectorized (lexsort + segment rank).
    Group/id columns may be any orderable dtype (strings factorize to
    sort codes); the value column must be numeric."""
    if len(batch) == 0:
        return batch
    g = _sort_codes(batch[group_col].to_numpy(zero_copy_only=False))
    v = batch[value_col].to_numpy()
    i = _sort_codes(batch[id_col].to_numpy(zero_copy_only=False))
    order = np.lexsort((i, v if ascending else -v, g))
    gs = g[order]
    new = np.ones(len(gs), dtype=bool)
    new[1:] = gs[1:] != gs[:-1]
    seg_start = np.flatnonzero(new)
    rank = np.arange(len(gs)) - seg_start[np.cumsum(new) - 1]
    keep = np.sort(order[rank < k])
    return batch.take(pa.array(keep))


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int,
    group_factor: int = 8,
    small_limit: int = 8_000_000,
    ascending: bool = False,
    tiny_limit: int = 512_000,
) -> ray.data.Dataset:
    """Distributed top-k per group; see module docstring. ``tiny_limit``
    gates the skip-the-coalesce-level fast path (exposed so forced-path
    tests can pin all three finish plans byte-identical)."""

    def partial(batch: pa.Table) -> pa.Table:
        return topk_batch(batch, group_col, value_col, id_col, k, ascending)

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() <= tiny_limit:
        return partials.repartition(1).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )
    n_blocks = max(partials.num_blocks(), 1)
    lvl1 = (
        partials.repartition(max(1, (n_blocks + group_factor - 1) // group_factor))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    if lvl1.count() <= small_limit:
        return lvl1.repartition(1).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )

    # huge group space: hash-shuffle finish (correct primitive at that
    # size; lvl1 already reduced each coalesced block to k rows/group)
    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            [value_col, id_col], ascending=[ascending, True], kind="mergesort"
        ).head(k)

    return lvl1.groupby(group_col).map_groups(group_topk, batch_format="pandas")
