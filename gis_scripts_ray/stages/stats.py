"""Distributed statistics: exact quantiles, global stats, stretch resolution.

A11/A6/A8 machinery (``stretch_spectral_values.py:62-78`` percentile
breakpoints; ``seagrass_lib.py:344-347`` sorted-slice median;
``local_match.py:67-113`` coefficient of variation): all are global
aggregates that must be EXACT to match the reference/oracle, so instead of
sketches we use:

* bounded-cardinality columns (class labels, integer measures): a
  distributed value histogram (pre-agg per batch -> tiny groupby), then
  the exact quantile is interpolated from counts at the driver — identical
  to ``numpy.percentile(..., method="linear")`` on the full column;
* unbounded columns: distributed sort + slice (``ds.sort``), used by the
  DOS-value top-k path in queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def value_histogram(ds: ray.data.Dataset, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(values, counts) sorted ascending — exact, via two-level combine."""

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select([col]).group_by([col]).aggregate([(col, "count")])
        return out.rename_columns([col, "n"])

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    hist = (
        coalesce_shuffle_agg(
            ds.map_batches(partial, batch_format="pyarrow"), [col], {"n": "sum"}
        )
        .to_pandas()
        .sort_values(col)
    )
    return hist[col].to_numpy(), hist["n"].to_numpy()


def quantiles_from_histogram(
    values: np.ndarray, counts: np.ndarray, qs: list[float]
) -> list[float]:
    """Linear-interpolated quantiles from a value histogram — bit-compatible
    with ``np.percentile(expanded, q, method='linear')`` and DuckDB's
    ``quantile_cont`` on integer inputs."""
    cum = np.cumsum(counts)
    n = cum[-1]
    out = []
    for q in qs:
        h = (n - 1) * q
        lo_idx = int(np.floor(h))
        hi_idx = int(np.ceil(h))
        lo = values[np.searchsorted(cum, lo_idx + 1)]
        hi = values[np.searchsorted(cum, hi_idx + 1)]
        g = h - lo_idx
        out.append(float(lo) + (float(hi) - float(lo)) * g)
    return out


def exact_quantiles_int(ds: ray.data.Dataset, col: str, qs: list[float]) -> list[float]:
    values, counts = value_histogram(ds, col)
    return quantiles_from_histogram(values, counts, qs)


def grouped_value_counts(
    ds: ray.data.Dataset, key_cols: list[str], value_col: str
) -> ray.data.Dataset:
    """(keys..., value, n) — occurrence counts per (group, value), exact.

    The grouped sibling of :func:`value_histogram`: per-block pre-agg on
    (keys + value) then the adaptive combine, so the all-to-all carries
    each block's distinct (group, value) pairs once, never the rows. The
    compacted size is bounded by |groups| x |distinct values| — the same
    bounded-cardinality contract as the global histogram (class labels,
    integer measures); unbounded-domain columns should go through the
    sort-based path instead."""

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    cols = key_cols + [value_col]

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select(cols).group_by(cols).aggregate([(value_col, "count")])
        return out.rename_columns(cols + ["n"])

    return coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), cols, ["n"]
    )


def grouped_count_distinct(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> ray.data.Dataset:
    """Exact per-group COUNT(DISTINCT value) — two compaction levels, no
    row ever shuffles twice: :func:`grouped_value_counts` reduces the
    stream to distinct (group, value) pairs (per-block pre-agg + adaptive
    combine), then a second per-block count + adaptive combine collapses
    pairs to (group, n_distinct). The all-to-all volume is bounded by the
    distinct-pair count, never the row count — the exact companion to the
    HyperLogLog sketch in ``stages/sketch.py`` (use the sketch when the
    distinct-pair space itself is corpus-sized)."""

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    pairs = grouped_value_counts(ds, key_cols, value_col)

    def partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(key_cols).group_by(key_cols).aggregate([([], "count_all")])
        )
        return out.rename_columns(key_cols + [out_col])

    return coalesce_shuffle_sum(
        pairs.map_batches(partial, batch_format="pyarrow"), key_cols, [out_col]
    )


def grouped_median(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    out_col: str = "median",
    small_limit: int = 8_000_000,
) -> ray.data.Dataset:
    """Exact LOWER median per group — :func:`grouped_quantile_disc` at
    q = 1/2 (value at ascending rank ``ceil(n/2)``)."""
    return grouped_quantile_disc(
        ds, key_cols, value_col, 1, 2, out_col=out_col, small_limit=small_limit
    )


def grouped_weighted_median(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wmedian",
    small_limit: int = 8_000_000,
) -> ray.data.Dataset:
    """Exact lower WEIGHTED median per group: the smallest value whose
    cumulative weight reaches half the group's total weight
    (``2 * cumw >= W``, all integers) — :func:`grouped_quantile_disc`
    at q = 1/2 over cumulative weight."""
    return grouped_quantile_disc(
        ds,
        key_cols,
        value_col,
        1,
        2,
        out_col=out_col,
        small_limit=small_limit,
        weight_col=weight_col,
    )


def grouped_quantile_disc(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    q_num: int,
    q_den: int,
    out_col: str = "quantile",
    small_limit: int = 8_000_000,
    weight_col: "str | None" = None,
) -> ray.data.Dataset:
    """Exact discrete quantile per group: the value at ascending rank
    ``ceil(q * n)`` with ``q = q_num/q_den`` given as an INTEGER fraction
    — the rank is ``(q_num*n + q_den - 1) // q_den``, no float ever
    touches the rank computation, so the result is order-independent and
    SQL-twinnable bit-for-bit (an explicit window-rank formula).

    With ``weight_col`` (an integer column) the rank runs over CUMULATIVE
    WEIGHT instead of row count — the exact WEIGHTED quantile: the
    smallest value v with ``q_den * cumw(v) >= q_num * W`` (integers, so
    ``cumw >= ceil(q*W)`` exactly). The compaction sums weights per
    (group, value) — the same bounded-cardinality all-to-all, weights
    never widen it.

    Runs over the :func:`grouped_value_counts` compaction, then an
    adaptive finish mirroring ``tile_agg.coalesce_shuffle_agg``: a
    single-block vectorized segment scan when the MEASURED compacted size
    fits one comfortable block, else a hash-shuffle ``map_groups``
    weighted rank-select (the (group, value) space really is huge).

    Output: (keys..., ``out_col``, n) with n = group row count (or total
    weight under ``weight_col``)."""

    if not (0 < q_num <= q_den):
        raise ValueError("require 0 < q_num <= q_den")

    def rank_of(totals):
        return (q_num * totals + q_den - 1) // q_den

    if weight_col is None:
        compact = grouped_value_counts(ds, key_cols, value_col).materialize()
    else:
        from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

        cols = key_cols + [value_col]

        def partial(batch: pa.Table) -> pa.Table:
            out = (
                batch.select(cols + [weight_col])
                .group_by(cols)
                .aggregate([(weight_col, "sum")])
            )
            return out.rename_columns(cols + ["n"])

        compact = coalesce_shuffle_sum(
            ds.map_batches(partial, batch_format="pyarrow"), cols, ["n"]
        ).materialize()

    def finish_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            cols = {k: batch[k] for k in key_cols}
            cols[out_col] = batch[value_col]
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        df = (
            batch.to_pandas()
            .sort_values(key_cols + [value_col], kind="mergesort")
            .reset_index(drop=True)
        )
        n = df["n"].to_numpy(dtype=np.int64)
        new = np.zeros(len(df), dtype=bool)
        new[0] = True
        for k in key_cols:
            a = df[k].to_numpy()
            new[1:] |= a[1:] != a[:-1]
        gid = np.cumsum(new) - 1
        cum = np.cumsum(n)
        # per-group cumulative counts: subtract the running total at the
        # group's start row
        start_total = np.where(new, cum - n, 0)
        base = np.maximum.accumulate(start_total * new)
        within = cum - base
        totals = np.zeros(gid[-1] + 1, dtype=np.int64)
        np.add.at(totals, gid, n)
        target = rank_of(totals)  # ceil(q*n), integer-exact
        sel = (within >= target[gid]) & (within - n < target[gid])
        out = {k: pa.array(df[k].to_numpy()[sel]) for k in key_cols}
        out[out_col] = pa.array(df[value_col].to_numpy()[sel])
        out["n"] = pa.array(totals, pa.int64())
        return pa.table(out)

    if compact.count() <= small_limit:
        return compact.repartition(1).map_batches(
            finish_block, batch_format="pyarrow", batch_size=None
        )

    def group_select(g):
        g = g.sort_values(value_col, kind="mergesort")
        n = g["n"].to_numpy(dtype=np.int64)
        total = int(n.sum())
        idx = int(np.searchsorted(np.cumsum(n), rank_of(total)))
        row = {k: [g[k].iloc[0]] for k in key_cols}
        row[out_col] = [g[value_col].iloc[idx]]
        row["n"] = [total]
        return type(g)(row)

    return compact.groupby(key_cols[0] if len(key_cols) == 1 else key_cols).map_groups(
        group_select, batch_format="pandas"
    )


def grouped_quantile_cont(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    q_num: int,
    q_den: int,
    out_col: str = "quantile",
    small_limit: int = 8_000_000,
) -> ray.data.Dataset:
    """Linear-interpolated quantile per group over integer values, with
    the INTERPOLATION POSITION computed in exact integer arithmetic:
    0-based position ``h = q*(n-1)`` decomposes into ``idx = pos //
    q_den`` and ``rem = pos % q_den`` with ``pos = q_num*(n-1)``; the
    result is the ONE float expression ``v_lo + (v_hi - v_lo) *
    (rem/q_den)`` over the two bracketing ranks (``numpy.percentile
    method='linear'`` / ``quantile_cont`` semantics). Evaluating the
    expression in the same operation order as the SQL twin makes the
    IEEE result bit-identical.

    Same compaction + adaptive finish as :func:`grouped_quantile_disc`.
    Output: (keys..., ``out_col`` float64, n)."""

    if not (0 <= q_num <= q_den) or q_den <= 0:
        raise ValueError("require 0 <= q_num <= q_den, q_den > 0")

    compact = grouped_value_counts(ds, key_cols, value_col).materialize()

    def interp(vlo, vhi, rem):
        vlo = vlo.astype(np.float64)
        vhi = vhi.astype(np.float64)
        remf = rem.astype(np.float64)
        return vlo + (vhi - vlo) * (remf / float(q_den))

    def finish_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            cols = {k: batch[k] for k in key_cols}
            cols[out_col] = pa.array([], pa.float64())
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        df = (
            batch.to_pandas()
            .sort_values(key_cols + [value_col], kind="mergesort")
            .reset_index(drop=True)
        )
        n = df["n"].to_numpy(dtype=np.int64)
        new = np.zeros(len(df), dtype=bool)
        new[0] = True
        for k in key_cols:
            a = df[k].to_numpy()
            new[1:] |= a[1:] != a[:-1]
        gid = np.cumsum(new) - 1
        cum = np.cumsum(n)
        start_total = np.where(new, cum - n, 0)
        base = np.maximum.accumulate(start_total * new)
        within = cum - base
        totals = np.zeros(gid[-1] + 1, dtype=np.int64)
        np.add.at(totals, gid, n)
        pos = q_num * (totals - 1)
        rem = pos % q_den
        t_lo = pos // q_den + 1  # 1-based bracketing ranks
        t_hi = t_lo + (rem > 0)
        vals = df[value_col].to_numpy()
        out_v = {}
        for name, tgt in (("lo", t_lo), ("hi", t_hi)):
            sel = (within >= tgt[gid]) & (within - n < tgt[gid])
            out_v[name] = vals[sel]
        out = {
            k: pa.array(
                df[k].to_numpy()[
                    (within >= t_lo[gid]) & (within - n < t_lo[gid])
                ]
            )
            for k in key_cols
        }
        out[out_col] = pa.array(interp(out_v["lo"], out_v["hi"], rem), pa.float64())
        out["n"] = pa.array(totals, pa.int64())
        return pa.table(out)

    if compact.count() <= small_limit:
        return compact.repartition(1).map_batches(
            finish_block, batch_format="pyarrow", batch_size=None
        )

    def group_select(g):
        g = g.sort_values(value_col, kind="mergesort")
        n = g["n"].to_numpy(dtype=np.int64)
        total = int(n.sum())
        pos = q_num * (total - 1)
        rem = pos % q_den
        t_lo = pos // q_den + 1
        t_hi = t_lo + (1 if rem > 0 else 0)
        cumn = np.cumsum(n)
        vlo = g[value_col].iloc[int(np.searchsorted(cumn, t_lo))]
        vhi = g[value_col].iloc[int(np.searchsorted(cumn, t_hi))]
        row = {k: [g[k].iloc[0]] for k in key_cols}
        row[out_col] = interp(
            np.array([vlo]), np.array([vhi]), np.array([rem])
        )
        row["n"] = [total]
        return type(g)(row)

    return compact.groupby(key_cols[0] if len(key_cols) == 1 else key_cols).map_groups(
        group_select, batch_format="pandas"
    )


def exclude_negative_quantile(
    ds: ray.data.Dataset, col: str, q: float
) -> float:
    """The reference's ``p@`` spec: percentile over non-negative values only
    (``stretch_spectral_values.py:68-78``)."""
    values, counts = value_histogram(ds, col)
    keep = values >= 0
    return quantiles_from_histogram(values[keep], counts[keep], [q])[0]
