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
