"""Broadcast range-table lookup join (value BETWEEN lo AND hi).

Maps each row's numeric value to the static range containing it — the
IP-to-geo / price-tier / zoning-band shape: the range side is a SMALL
dimension table of non-overlapping inclusive [lo, hi] intervals, the
probe side is the corpus. A shuffle join on BETWEEN would move every
row (and Acero's hash join can't express the predicate anyway); the
scale-correct plan is the broadcast lookup the engine uses for every
small dimension side: validate + sort the range table ONCE at plan
time, ``ray.put`` it once, and resolve each batch with a single
``np.searchsorted`` + bound check inside a fused ``map_batches`` —
zero shuffle, O(log ranges) per row, worker-cached
(``state.broadcast.worker_broadcast``) so the table ships to each
worker once, not per batch.

Contract: ranges must be non-overlapping (validated eagerly — an
overlapping table would make the match ambiguous); values falling in a
gap between ranges drop (inner semantics). Payload columns are gathered
from the ARROW range table by position (no pandas round-trip)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def range_lookup(
    ds: ray.data.Dataset,
    value_col: str,
    ranges: pa.Table,
    lo_col: str = "lo",
    hi_col: str = "hi",
    payload_cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """Attach the matching range's payload columns to every row whose
    ``value_col`` falls inside a range; unmatched rows drop (inner).
    See module docstring."""
    if ranges.num_rows == 0:
        raise ValueError("range_lookup: empty range table")
    payload_cols = payload_cols or [
        c for c in ranges.column_names if c not in (lo_col, hi_col)
    ]
    lo = ranges[lo_col].to_numpy().astype(np.int64)
    hi = ranges[hi_col].to_numpy().astype(np.int64)
    if np.any(hi < lo):
        raise ValueError("range_lookup: a range has hi < lo")
    order = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[order], hi[order]
    if np.any(lo_s[1:] <= hi_s[:-1]):
        raise ValueError("range_lookup: ranges overlap — match is ambiguous")
    payload = ranges.select(payload_cols).take(pa.array(order))
    ref = ray.put((lo_s, hi_s, payload))

    def lookup(batch: pa.Table, _ref=ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        lo_b, hi_b, pay = worker_broadcast(_ref)
        v = batch[value_col].to_numpy().astype(np.int64, copy=False)
        idx = np.searchsorted(lo_b, v, side="right") - 1
        idx_c = np.maximum(idx, 0)
        matched = (idx >= 0) & (v <= hi_b[idx_c])
        out = batch.filter(pa.array(matched))
        rows = pa.array(idx_c[matched], pa.int64())
        for c in payload_cols:
            out = out.append_column(c, pay[c].take(rows))
        return out

    return ds.map_batches(lookup, batch_format="pyarrow")
