"""Distributed backward as-of join (time-series nearest-predecessor).

For every left row, find the right row with the greatest right timestamp
<= the left timestamp within the same key group — the standard
market-data / sensor-fusion join that neither Ray Data nor the reference
has natively. The engine composes it from map_batches + a driver-sized
carry table + one ``groupby(bucket).map_groups`` (the same
boundary-merge shape as ``stages/components.py``).

Partitioning scheme (the documented assumption of this operator):

* Time is split into ``n_buckets`` equal ranges of the LEFT side's span.
  Left rows shuffle once to their bucket; right rows shuffle once to
  theirs (rows after the left max are dropped — they can never match).
* A right row can also answer for left rows in LATER buckets. The only
  right row that can cross a bucket boundary forward is, per key, the
  LATEST one at or before that boundary — so the carry state is the
  per-(bucket, key) latest-row table: reduced per block (vectorized
  lexsort take-last), then finished DISTRIBUTED (round-3 verdict task
  #5): keys hash into groups, one ``groupby(key-hash).map_groups``
  take-lasts per (key, bucket) and forward-fill-expands each key's
  carry rows into seed rows for later buckets — all vectorized (sort +
  ``np.repeat`` range expansion), O(groups) Python, no keys x buckets
  table ever at the driver. Bucket contents stream throughout.
* Each bucket group runs a local sorted backward merge
  (``pandas.merge_asof``) over its left rows + in-bucket right rows +
  seeds — exact, because every potential predecessor of a left row is
  either in-bucket or the carried per-key latest.

Timestamp contract: both timestamp columns are int64 microseconds
(CLAUDE.md normalization rule — pandas ns vs parquet us was a real
round-1 bug class; callers cast with ``timestamp_to_us``).

Ties: duplicate (key, right_ts) pairs make "latest" ambiguous; the right
side must be unique on (key, right_ts) (callers fold a unique id into
the microseconds — see ``queries.q_events_asof_orders``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


_TIE_CONTRACT_MSG = (
    "asof_join_backward: right side violates (%s, %s) uniqueness — two "
    "rows share (key, ts) with differing carry values, making 'latest' "
    "ambiguous. Fold a unique id into the timestamp "
    "(see queries.q_events_asof_orders)"
)


def timestamp_to_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Cast a timestamp column to int64 microseconds (normalization rule)."""
    import pyarrow.compute as pc

    out = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _minmax(ds: ray.data.Dataset, col: str) -> tuple[int, int]:
    """Global (min, max) of an int64 column: per-block partials folded at
    the driver in ONE streaming pass (not a ``ds.min()`` + ``ds.max()``
    pair of executions)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy()
        if len(v) == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "lo": pa.array([int(v.min())], pa.int64()),
                "hi": pa.array([int(v.max())], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("asof_join: empty left side")
    return min(r["lo"] for r in rows), max(r["hi"] for r in rows)


def asof_join_backward(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    carry_cols: list[str],
    n_buckets: int = 64,
    n_key_groups: int = 64,
) -> ray.data.Dataset:
    """Backward as-of inner join; see module docstring for the scheme.

    Output: every matched left row with its columns plus ``carry_cols``
    from the matched right row (unmatched left rows are dropped — inner
    semantics, the SQL ``ASOF JOIN`` default)."""
    t_lo, t_hi = _minmax(left, left_ts)
    width = max(1, (t_hi - t_lo + n_buckets) // n_buckets)

    def bucket_of(ts: np.ndarray) -> np.ndarray:
        return np.clip((ts - t_lo) // width, -1, n_buckets - 1)

    r_cols = [right_by, right_ts] + list(carry_cols)
    r_schema = right.schema()
    r_types = [dict(zip(r_schema.names, r_schema.types))[c] for c in r_cols]
    l_schema = left.schema()
    l_names = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))

    # ---- carry table: per-(bucket, key) latest right row ----------------
    def latest_partial(batch: pa.Table) -> pa.Table:
        b = batch.select(r_cols)
        ts = b[right_ts].to_numpy()
        b = b.filter(pa.array(ts <= t_hi))  # later rows can never match
        if len(b) == 0:
            return b.append_column("__bucket", pa.array([], pa.int64()))
        ts = b[right_ts].to_numpy()
        key = b[right_by].to_numpy()
        bk = bucket_of(ts)
        order = np.lexsort((ts, bk, key))
        bk_s, key_s, ts_s = bk[order], key[order], ts[order]
        # contract assertion (round-4 verdict): equal (key, ts) rows with
        # differing carry values make "latest" ambiguous — check HERE so
        # an in-block take-last can't silently hide the violation
        # (equal ts implies equal bucket, so adjacency is complete)
        dup = np.zeros(len(order), dtype=bool)
        dup[1:] = (key_s[1:] == key_s[:-1]) & (ts_s[1:] == ts_s[:-1])
        if dup.any():
            di, pi = order[np.nonzero(dup)[0]], order[np.nonzero(dup)[0] - 1]
            for c in carry_cols:
                v = b[c].to_numpy(zero_copy_only=False)
                if np.any(v[di] != v[pi]):
                    raise ValueError(_TIE_CONTRACT_MSG % (right_by, right_ts))
        last = np.ones(len(order), dtype=bool)
        last[:-1] = (bk_s[1:] != bk_s[:-1]) | (key_s[1:] != key_s[:-1])
        sel = order[last]
        return b.take(pa.array(sel)).append_column(
            "__bucket", pa.array(bk[sel], pa.int64())
        )

    # DISTRIBUTED carry finish + forward-fill (round-3 verdict task #5):
    # keys hash into groups; each group take-lasts per (key, bucket) and
    # expands every carry row into seed rows for the buckets it answers —
    # the seed for bucket t is the key's latest right row in any bucket
    # < t, i.e. occupied bucket b_i seeds t in [b_i+1, next occupied
    # bucket] (or [b_i+1, n_buckets-1] for the key's last carry row).
    # Fully vectorized: one mergesort + np.repeat range expansion, O(key
    # groups) Python — no keys x buckets table at the driver.
    def add_kb(batch: pa.Table) -> pa.Table:
        # the same any-dtype stable key-hash bucketing every other
        # bucketed stage uses (one polars xxhash line — no bespoke
        # integer multiply/overflow dance to maintain)
        from gis_scripts_ray.stages.windows import _bucket_of

        kb = _bucket_of(batch[right_by], n_key_groups)
        return batch.append_column("_kb", pa.array(kb, pa.int64()))

    def ffill_group(g: pd.DataFrame) -> pd.DataFrame:
        # cross-block duplicates meet here: identical full rows collapse,
        # same-(key, ts) rows with differing carry values are a contract
        # violation (see _TIE_CONTRACT_MSG)
        g = g.drop_duplicates()
        if bool(g.duplicated([right_by, right_ts]).any()):
            raise ValueError(_TIE_CONTRACT_MSG % (right_by, right_ts))
        g = g.sort_values(
            [right_by, "__bucket", right_ts], kind="mergesort"
        ).drop_duplicates([right_by, "__bucket"], keep="last")
        key = g[right_by].to_numpy()
        bk = g["__bucket"].to_numpy()
        n = len(g)
        hi = np.empty(n, dtype=np.int64)
        if n:
            hi[:-1] = np.where(key[1:] == key[:-1], bk[1:], n_buckets - 1)
            hi[-1] = n_buckets - 1
        counts = np.maximum(hi - bk, 0)
        idx = np.repeat(np.arange(n), counts)
        csum = np.concatenate([[0], np.cumsum(counts)])
        offs = np.arange(csum[-1]) - np.repeat(csum[:-1], counts) + 1
        out = g.iloc[idx][r_cols].copy()
        out["__bucket"] = bk[idx] + offs
        return out

    seeds_ds = (
        right.map_batches(latest_partial, batch_format="pyarrow")
        .map_batches(add_kb, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(ffill_group, batch_format="pandas")
    )

    # ---- shuffle both sides into bucket groups --------------------------
    def tag_left(batch: pa.Table) -> pa.Table:
        ts = batch[left_ts].to_numpy()
        out = batch
        for c, typ in zip(r_cols, r_types):
            if c not in l_names:
                out = out.append_column(c, pa.nulls(len(batch), typ))
        return out.append_column(
            "__bucket", pa.array(bucket_of(ts), pa.int64())
        ).append_column("__side", pa.array(np.full(len(batch), "l"), pa.string()))

    def tag_right(batch: pa.Table) -> pa.Table:
        b = batch.select(r_cols)
        ts = b[right_ts].to_numpy()
        b = b.filter(pa.array((ts <= t_hi) & (bucket_of(ts) >= 0)))
        ts = b[right_ts].to_numpy()
        out = b
        for c in l_names:
            if c not in r_cols:
                out = out.append_column(c, pa.nulls(len(b), l_types[c]))
        return out.append_column(
            "__bucket", pa.array(bucket_of(ts), pa.int64())
        ).append_column("__side", pa.array(np.full(len(b), "r"), pa.string()))

    col_order = sorted(set(l_names) | set(r_cols)) + ["__bucket", "__side"]
    lt = left.map_batches(tag_left, batch_format="pyarrow").select_columns(col_order)
    rt = right.map_batches(tag_right, batch_format="pyarrow").select_columns(col_order)

    r_type_map = dict(zip(r_cols, r_types))

    def tag_seeds(batch: pa.Table) -> pa.Table:
        """Align seed rows to the union schema with EXACT types (the
        pandas round-trip in ``ffill_group`` loses arrow types — casts
        restore them; absent left columns pad with typed nulls)."""
        import pyarrow.compute as pc

        n = len(batch)
        cols = {}
        for c in col_order:
            if c == "__bucket":
                cols[c] = pc.cast(batch["__bucket"], pa.int64())
            elif c == "__side":
                cols[c] = pa.array(np.full(n, "r"), pa.string())
            elif c in r_type_map:
                cols[c] = pc.cast(batch[c], r_type_map[c])
            else:
                cols[c] = pa.nulls(n, l_types[c])
        return pa.table(cols)

    st = seeds_ds.map_batches(tag_seeds, batch_format="pyarrow")
    both = lt.union(rt).union(st)

    out_cols = l_names + list(carry_cols)

    def _np_dtype(t: pa.DataType):
        if pa.types.is_integer(t):
            return np.int64
        if pa.types.is_floating(t):
            return np.float64
        if pa.types.is_boolean(t):
            return np.bool_
        return object

    # groups are taken as ARROW tables and each side selects its OWN
    # columns (null-free) before the pandas conversion: converting the
    # union frame (null-padded other-side columns) to pandas promotes
    # int64 to float64, which silently rounds values above 2^53 — the
    # dtype maps below keep the conversion honest and type empty frames
    # (schema-mismatched empty pandas blocks was a real bug — see the
    # sessionize relabel fix)
    out_dtypes = {
        c: _np_dtype(l_types[c] if c in l_types else r_type_map[c])
        for c in out_cols
    }

    # within its own side no column is null, so each side converts to
    # pandas with true dtypes intact (merge_asof requires the on/by
    # dtypes to MATCH between frames, not merely be numeric)
    l_dtypes = {c: _np_dtype(l_types[c]) for c in l_names}
    r_dtypes = {c: _np_dtype(r_type_map[c]) for c in r_cols}

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lmask = pc.equal(g["__side"], "l")
        lg = (
            g.filter(lmask)
            .select(l_names)
            .to_pandas()
            .astype(l_dtypes, copy=False)
            .sort_values(left_ts, kind="mergesort")
        )
        if len(lg) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=dt) for c, dt in out_dtypes.items()}
            )
        rg = (
            g.filter(pc.invert(lmask))
            .select(r_cols)
            .to_pandas()
            .astype(r_dtypes, copy=False)
            .drop_duplicates()  # a seed can coincide with an in-bucket row
            .sort_values(right_ts, kind="mergesort")
            .reset_index(drop=True)
        )
        # contract assertion (round-4 verdict): the right side must be
        # unique on (key, ts) or "latest" is ambiguous and the result
        # nondeterministic. Duplicate (key, ts) rows always share a
        # bucket (equal ts), so this per-bucket check is complete; rows
        # identical in every column were collapsed above. O(rows) hash.
        if bool(rg.duplicated(subset=[right_by, right_ts]).any()):
            raise ValueError(_TIE_CONTRACT_MSG % (right_by, right_ts))
        # merge a right-row POSITION, not the carry values: merge_asof
        # NaN-promotes attached right columns to float64 for unmatched
        # left rows, and the astype back would silently round int64
        # carry values above 2^53 — positions are always float64-exact,
        # and the real values are gathered from rg untouched
        probe = rg[[right_by, right_ts]].copy()
        probe["__rpos"] = np.arange(len(rg), dtype=np.int64)
        merged = pd.merge_asof(
            lg,
            probe,
            left_on=left_ts,
            right_on=right_ts,
            left_by=left_by,
            right_by=right_by,
            direction="backward",
        )
        pos = merged["__rpos"].to_numpy(dtype=np.float64)
        keep = ~np.isnan(pos)  # inner semantics
        out = merged.loc[keep, l_names].reset_index(drop=True)
        idx = pos[keep].astype(np.int64)
        for c in carry_cols:
            out[c] = rg[c].to_numpy()[idx]
        return out[out_cols].astype(out_dtypes, copy=False)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
