"""Distributed interval-overlap join (range join on [start, end)).

Reference semantics: the interval×interval analog of the reference's
footprint-intersection joins (``seagrass_lib.py`` AOI ∩ footprint) in
the TIME domain — every (A, B) pair on the same key whose half-open
intervals overlap, with the exact overlap length.

Scale shape — the classic tiled range join:

1. Each interval replicates to every fixed-width time BUCKET it
   touches (bounded fan-out: ``1 + len/width`` copies; pick the width
   at or above the typical interval length so the factor stays ~2).
2. ONE ``groupby((key, bucket)).map_groups`` enumerates overlapping
   pairs locally and fully vectorized (sort B by start; per A-row the
   ``b.start < a.end`` prefix via searchsorted; the ``b.end > a.start``
   filter on the expanded candidates).
3. A pair spanning several buckets is counted EXACTLY ONCE: only the
   bucket containing ``max(a.start, b.start)`` owns it (both intervals
   provably cover that instant, so both replicas are present there).

No all-to-all ever carries a pair twice and nothing materializes at
the driver; the partitioning assumption is that one (key, bucket)
cell's intervals fit a task — keys hotter than that need the
arrival-range presplit treatment (``windows.py``), documented, not
silently wrong: output is identical either way since ownership is a
per-pair rule.

Candidate enumeration is output-bounded (each enumerated candidate is
either a reported pair or one filtered comparison adjacent to it in
start order) — the same contract as a sort-merge band join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def interval_overlap_pairs(
    ds: ray.data.Dataset,
    key_col: str,
    side_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket_width: int,
    carry_cols: "tuple[str, ...]" = (),
) -> ray.data.Dataset:
    """All overlapping (side 0, side 1) interval pairs per key.

    ``ds`` holds BOTH sides (``side_col`` int64 0/1); intervals are
    half-open ``[start, end)`` with int64 bounds, ``end > start``.
    Output: (key, id_a, id_b, overlap, carry_a..., carry_b...) with
    ``overlap = min(ends) - max(starts)`` (> 0, exact int64).
    """

    def replicate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        s = batch[start_col].to_numpy().astype(np.int64)
        e = batch[end_col].to_numpy().astype(np.int64)
        g0 = s // bucket_width
        g1 = (e - 1) // bucket_width  # half-open: end-1 is the last instant
        reps = (g1 - g0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        total = int(reps.sum())
        base = np.concatenate([[0], np.cumsum(reps)[:-1]]) if n else np.empty(0, np.int64)
        off = np.arange(total, dtype=np.int64) - np.repeat(base, reps)
        cols = {
            key_col: batch[key_col].take(pa.array(idx)),
            side_col: batch[side_col].take(pa.array(idx)),
            start_col: pa.array(s[idx], pa.int64()),
            end_col: pa.array(e[idx], pa.int64()),
            id_col: batch[id_col].take(pa.array(idx)),
            "_gb": pa.array(g0[idx] + off, pa.int64()),
        }
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(idx))
        return pa.table(cols)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["_gb"].iloc[0])
        a = g[g[side_col] == 0]
        b = g[g[side_col] == 1]
        if len(a) == 0 or len(b) == 0:
            # empty frame with the REAL dtypes (string carries must stay
            # object — a wrong-typed empty group breaks schema unification)
            d = {
                key_col: g[key_col].iloc[:0],
                "id_a": g[id_col].iloc[:0],
                "id_b": g[id_col].iloc[:0],
                "overlap": pd.Series([], dtype=np.int64),
            }
            for c in carry_cols:
                d[f"{c}_a"] = g[c].iloc[:0]
            for c in carry_cols:
                d[f"{c}_b"] = g[c].iloc[:0]
            return pd.DataFrame(d).reset_index(drop=True)
        a = a.sort_values(start_col, kind="mergesort")
        b = b.sort_values(start_col, kind="mergesort")
        a_s = a[start_col].to_numpy()
        a_e = a[end_col].to_numpy()
        b_s = b[start_col].to_numpy()
        b_e = b[end_col].to_numpy()
        hi = np.searchsorted(b_s, a_e, side="left")  # b.start < a.end
        total = int(hi.sum())
        ai = np.repeat(np.arange(len(a), dtype=np.int64), hi)
        base = np.concatenate([[0], np.cumsum(hi)[:-1]])
        bi = np.arange(total, dtype=np.int64) - np.repeat(base, hi)
        m = np.maximum(a_s[ai], b_s[bi])
        keep = (b_e[bi] > a_s[ai]) & (m // bucket_width == bucket)
        ai, bi, m = ai[keep], bi[keep], m[keep]
        overlap = np.minimum(a_e[ai], b_e[bi]) - m
        out = {
            key_col: a[key_col].to_numpy()[ai],
            "id_a": a[id_col].to_numpy()[ai],
            "id_b": b[id_col].to_numpy()[bi],
            "overlap": overlap,
        }
        for c in carry_cols:
            out[f"{c}_a"] = a[c].to_numpy()[ai]
        for c in carry_cols:
            out[f"{c}_b"] = b[c].to_numpy()[bi]
        return pd.DataFrame(out)

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby([key_col, "_gb"])
        .map_groups(per_cell, batch_format="pandas")
    )

# ---------------------------------------------------------------------------
# Band join on a point timestamp (l.ts + lo <= r.ts <= l.ts + hi) —
# the one-to-many range join behind q_events_interval_orders. Same
# range-bucket machinery, <=2x right-row replication (window length
# bounds the bucket width); see the module docstring of the round-5
# commit that introduced it for the full plan.
# ---------------------------------------------------------------------------
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
