"""Distributed time-interval (band / range) join.

For every left row, find ALL right rows in the same key group whose
timestamp falls inside the left row's window::

    l.ts + lo  <=  r.ts  <=  l.ts + hi        (lo <= hi, microseconds)

— the "events within N days of the order", "sensor readings around the
fault", "impressions inside the session window" shape. Neither Ray Data
nor the reference has it natively (the reference's nearest-neighbour
joins are the point-lookup analog — ``Deliverables.py`` tile matching);
an equi-join + post-filter shuffles every same-key pair, which is
quadratic under hot keys. The engine composes it from the same
range-bucket machinery as ``stages/asof.py``:

* Time is split into ``n_buckets`` equal ranges of the LEFT side's span,
  with bucket width forced >= the window length ``hi - lo``. Left rows
  shuffle ONCE to their bucket.
* A right row at ``r.ts`` can only match left rows with ``l.ts`` in
  ``[r.ts - hi, r.ts - lo]`` — an interval of length ``hi - lo``, which
  by the width bound overlaps AT MOST 2 buckets: each right row is
  replicated at most twice (clipped to the left span; rows whose window
  misses it entirely are dropped at the tag step, never shuffled).
* Each bucket group runs a local vectorized join: right rows lexsorted
  by (key, ts), left windows answered by two ``np.searchsorted`` calls
  over a packed ``key_code * SPAN + (ts - t_min)`` int64 axis (exact —
  window bounds clamp into the key's own segment), matches expanded with
  the ``np.repeat`` + cumsum range trick, payload columns gathered from
  ARROW by position (never through a null-padded pandas frame —
  CLAUDE.md int64 > 2^53 rule). When the packed axis would overflow
  int64 (astronomical span x key cardinality), the group falls back to a
  per-key-segment searchsorted loop — bit-identical, O(unique keys)
  Python (forced-path equivalence-tested).

Partitioning assumption (documented, the operator's 100-TB contract):
per-bucket work is bounded by the rows whose timestamps land near one
time range — time-skewed data wants a larger ``n_buckets``; the width
floor means windows much wider than ``span / n_buckets`` degrade toward
fewer, larger buckets (the join is still exact, just coarser-grained).

Key contract: join keys are int64 (hashing arbitrary keys to int64
could alias two keys into false matches; callers encode first). Output
is inner one-to-many: ``left_cols + right_cols`` per matched pair
(column name sets must be disjoint). Timestamps are int64 microseconds
(``asof.timestamp_to_us`` — the CLAUDE.md normalization rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.asof import _minmax


def _empty_out(
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    left_cols: list[str],
    right_cols: list[str],
) -> ray.data.Dataset:
    lt = dict(zip(left_schema.names, left_schema.types))
    rt = dict(zip(right_schema.names, right_schema.types))
    fields = [pa.field(c, lt[c]) for c in left_cols] + [
        pa.field(c, rt[c]) for c in right_cols
    ]
    return ray.data.from_arrow(pa.schema(fields).empty_table())


def _searchsorted_packed(
    rk: np.ndarray,
    rt: np.ndarray,
    lk: np.ndarray,
    q_lo: np.ndarray,
    q_hi: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Match-range [start, end) per left row over right rows SORTED by
    (key, ts). Packed-axis fast path; per-key-segment fallback when the
    packed key would overflow int64. Left rows whose key is absent from
    the right side get an empty range."""
    uk, seg_start = np.unique(rk, return_index=True)
    seg_end = np.append(seg_start[1:], len(rk))
    code = np.searchsorted(uk, lk)
    code_c = np.minimum(code, max(len(uk) - 1, 0))
    valid = (len(uk) > 0) & (uk[code_c] == lk) if len(uk) else np.zeros(
        len(lk), dtype=bool
    )
    start = np.zeros(len(lk), dtype=np.int64)
    end = np.zeros(len(lk), dtype=np.int64)
    if not valid.any():
        return start, end
    t_min = int(rt.min())
    span = int(rt.max()) - t_min + 2  # offset SPAN-1 is strictly > any row
    if len(uk) * span < 2**62:
        r_codes = np.repeat(
            np.arange(len(uk), dtype=np.int64), seg_end - seg_start
        )
        packed_r = r_codes * span + (rt - t_min)
        lo_off = np.clip(q_lo[valid] - t_min, 0, span - 1)
        hi_off = np.clip(q_hi[valid] - t_min + 1, 0, span - 1)
        base = code_c[valid] * span
        start[valid] = np.searchsorted(packed_r, base + lo_off, side="left")
        end[valid] = np.searchsorted(
            packed_r, base + np.maximum(hi_off, lo_off), side="left"
        )
        return start, end
    # fallback: per-key-segment searchsorted, bit-identical semantics
    vi = np.nonzero(valid)[0]
    order = np.argsort(code_c[vi], kind="stable")
    vi = vi[order]
    codes_v = code_c[vi]
    bounds = np.searchsorted(codes_v, np.arange(len(uk) + 1))
    for k in range(len(uk)):
        sel = vi[bounds[k] : bounds[k + 1]]
        if len(sel) == 0:
            continue
        seg = rt[seg_start[k] : seg_end[k]]
        start[sel] = seg_start[k] + np.searchsorted(seg, q_lo[sel], "left")
        end[sel] = seg_start[k] + np.searchsorted(
            seg, np.maximum(q_hi[sel] + 1, q_lo[sel]), "left"
        )
    return start, end


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_by: str,
    right_by: str,
    left_ts: str,
    right_ts: str,
    lo: int,
    hi: int,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 64,
    _force_fallback: bool = False,
) -> ray.data.Dataset:
    """Inner one-to-many interval join; see module docstring.

    ``_force_fallback`` routes every group through the per-key-segment
    path (equivalence testing only)."""
    if lo > hi:
        raise ValueError(f"interval_join: lo ({lo}) > hi ({hi})")
    if set(left_cols) & set(right_cols):
        raise ValueError(
            "interval_join: left_cols and right_cols must be disjoint"
        )
    l_schema, r_schema = left.schema(), right.schema()
    try:
        t_lo, t_hi = _minmax(left, left_ts)
    except ValueError:  # empty left side: inner join is empty
        return _empty_out(l_schema, r_schema, left_cols, right_cols)
    width = max(1, (t_hi - t_lo + n_buckets) // n_buckets, hi - lo)

    l_keep = sorted(set(left_cols) | {left_by, left_ts})
    r_keep = sorted(set(right_cols) | {right_by, right_ts})
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    union_cols = sorted(set(l_keep) | set(r_keep))

    def tag_left(batch: pa.Table) -> pa.Table:
        b = batch.select(l_keep)
        ts = b[left_ts].to_numpy()
        out = b
        for c in r_keep:
            if c not in l_keep:
                out = out.append_column(c, pa.nulls(len(b), r_types[c]))
        return (
            out.select(union_cols)
            .append_column(
                "__bucket", pa.array((ts - t_lo) // width, pa.int64())
            )
            .append_column(
                "__side", pa.array(np.full(len(b), "l"), pa.string())
            )
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        b = batch.select(r_keep)
        ts = b[right_ts].to_numpy()
        # left windows this row can answer: l.ts in [ts - hi, ts - lo],
        # clipped to the left span; rows missing it never shuffle
        w0 = np.maximum(ts - hi, t_lo)
        w1 = np.minimum(ts - lo, t_hi)
        keep = w0 <= w1
        b = b.filter(pa.array(keep))
        w0, w1 = w0[keep], w1[keep]
        b0 = (w0 - t_lo) // width
        b1 = (w1 - t_lo) // width  # width >= hi - lo  =>  b1 - b0 <= 1
        dup = b1 > b0
        idx = np.concatenate([np.arange(len(b)), np.nonzero(dup)[0]])
        bk = np.concatenate([b0, b1[dup]])
        out = b.take(pa.array(idx))
        for c in l_keep:
            if c not in r_keep:
                out = out.append_column(c, pa.nulls(len(out), l_types[c]))
        return (
            out.select(union_cols)
            .append_column("__bucket", pa.array(bk, pa.int64()))
            .append_column(
                "__side", pa.array(np.full(len(out), "r"), pa.string())
            )
        )

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    out_fields = [pa.field(c, l_types[c]) for c in left_cols] + [
        pa.field(c, r_types[c]) for c in right_cols
    ]
    out_schema = pa.schema(out_fields)

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(g["__side"], "l")
        lg = g.filter(lmask).select(l_keep)
        rg = g.filter(pc.invert(lmask)).select(r_keep)
        if lg.num_rows == 0 or rg.num_rows == 0:
            return out_schema.empty_table()
        lk = lg[left_by].to_numpy().astype(np.int64, copy=False)
        lt_ = lg[left_ts].to_numpy().astype(np.int64, copy=False)
        rk = rg[right_by].to_numpy().astype(np.int64, copy=False)
        rt_ = rg[right_ts].to_numpy().astype(np.int64, copy=False)
        order = np.lexsort((rt_, rk))
        rk_s, rt_s = rk[order], rt_[order]
        if _force_fallback:
            # equivalence-test hook: shrink the packed-axis budget to 0
            # by lying about the span via a monkeypatched threshold is
            # fragile; instead call the fallback loop directly
            uk, seg_start = np.unique(rk_s, return_index=True)
            seg_end = np.append(seg_start[1:], len(rk_s))
            code = np.searchsorted(uk, lk)
            code_c = np.minimum(code, max(len(uk) - 1, 0))
            valid = uk[code_c] == lk
            start = np.zeros(len(lk), dtype=np.int64)
            end = np.zeros(len(lk), dtype=np.int64)
            q_lo, q_hi = lt_ + lo, lt_ + hi
            vi = np.nonzero(valid)[0]
            so = np.argsort(code_c[vi], kind="stable")
            vi = vi[so]
            bounds = np.searchsorted(code_c[vi], np.arange(len(uk) + 1))
            for k in range(len(uk)):
                sel = vi[bounds[k] : bounds[k + 1]]
                if len(sel) == 0:
                    continue
                seg = rt_s[seg_start[k] : seg_end[k]]
                start[sel] = seg_start[k] + np.searchsorted(
                    seg, q_lo[sel], "left"
                )
                end[sel] = seg_start[k] + np.searchsorted(
                    seg, np.maximum(q_hi[sel] + 1, q_lo[sel]), "left"
                )
        else:
            start, end = _searchsorted_packed(
                rk_s, rt_s, lk, lt_ + lo, lt_ + hi
            )
        counts = end - start
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        l_idx = np.repeat(np.arange(len(lk), dtype=np.int64), counts)
        csum = np.concatenate([[0], np.cumsum(counts)])
        r_pos = (
            np.repeat(start, counts)
            + np.arange(total, dtype=np.int64)
            - np.repeat(csum[:-1], counts)
        )
        r_idx = order[r_pos]
        cols = {}
        for c in left_cols:
            cols[c] = lg[c].take(pa.array(l_idx))
        for c in right_cols:
            cols[c] = rg[c].take(pa.array(r_idx))
        return pa.table(cols, schema=out_schema)

    joined = (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    # a typed empty seed keeps the dataset-level schema stable when every
    # group output is empty (Ray otherwise unifies the all-empty group
    # blocks down to a null schema — the bm25 empty-pairs quirk)
    seed = ray.data.from_arrow(out_schema.empty_table())
    return seed.union(joined)
