"""Distributed 2-D skyline (Pareto frontier, minimize both axes) — the
"best tradeoff set" query (cheapest-for-its-size parts, shortest-for-
its-quality candidates). Dominance: a dominates b iff a.x <= b.x and
a.y <= b.y with at least one strict; equal points do not dominate each
other, so exact duplicates of a frontier point all survive (matching
the definitional NOT EXISTS SQL).

Why it scales: skyline is SELF-REDUCING — skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)) — so the plan is the bounded-coalesce
top-k shape (``stages/topk.py``): per-block vectorized sweep first
(output is the block's frontier, typically tiny), then coalesce levels
re-sweep merged partials, finishing single-block only when the measured
partial count fits. No driver rows at any step.

Kernel: one lexsort by (x, y); a row is dominated iff
  (1) some earlier row in that order has strictly smaller y, or
  (2) some row with strictly smaller x has y <= this row's y —
both are prefix minima (running min of y; running min of per-x-group
leading y over previous groups), fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_I64_MAX = np.iinfo(np.int64).max


def skyline_batch(batch: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Exact skyline of ONE table; keeps all columns and duplicate
    frontier points."""
    if batch.num_rows == 0:
        return batch
    x = batch[x_col].to_numpy(zero_copy_only=False)
    y = batch[y_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    # (1) strictly smaller y anywhere earlier in (x, y) order
    m1 = np.concatenate([[_I64_MAX], np.minimum.accumulate(ys)[:-1]])
    dom1 = m1 < ys
    # (2) y <= mine among rows with strictly smaller x: per-x-group
    # leading y (the group's min, since y ascends within a group),
    # cummin over PREVIOUS groups
    new_x = np.empty(len(xs), dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    gid = np.cumsum(new_x) - 1
    gmin = np.minimum.accumulate(ys[new_x])
    m2 = np.where(gid > 0, gmin[np.maximum(gid - 1, 0)], _I64_MAX)
    dom2 = m2 <= ys
    keep = np.sort(order[~(dom1 | dom2)])
    return batch.take(pa.array(keep))


def skyline_2d(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    group_factor: int = 8,
    tiny_limit: int = 512_000,
) -> ray.data.Dataset:
    """Distributed skyline: per-block sweep, bounded coalesce re-sweeps,
    single-block finish once the measured partial count fits
    ``tiny_limit`` (frontiers shrink fast; a frontier that never fits
    would need an x-range partitioned merge — not a web-corpus shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        return skyline_batch(batch, x_col, y_col)

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    while partials.count() > tiny_limit and partials.num_blocks() > 1:
        n_blocks = max(partials.num_blocks(), 1)
        partials = (
            partials.repartition(
                max(1, (n_blocks + group_factor - 1) // group_factor)
            )
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    return partials.repartition(1).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
