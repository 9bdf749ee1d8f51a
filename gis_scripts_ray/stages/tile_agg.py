"""Cell-keyed aggregation with explicit two-level combine + salting.

Flagship operator (SURVEY.md A1): the reference's
``compute_distribution_map`` (``local_match.py:263-392``) scatter-adds pixel
sums/counts into a coarse block grid **per image**, takes the per-image
mean per block, then the *unweighted mean of per-image means* across
images. That mean-of-means is NOT associative over raw rows, so the
per-source level is preserved explicitly here.

Scale design:

* **Level 0 (in-batch pre-aggregation)** — each ``map_batches`` call
  reduces its batch to one partial row per (cell[, source]) via Arrow's
  C++ ``Table.group_by``. This is the "combiner": the global shuffle moves
  O(#cells x #blocks) partial rows, never O(#rows).
* **Level 1 (salted global combine)** — partials are grouped by cell (the
  salt is implicit: partials from different blocks are distinct rows, so
  no single task ever sees O(#rows) for a hot cell; Ray's hash shuffle
  sees at most #blocks rows per cell).
* **Level 2 (mean of means)** — for A1 semantics, level 1 groups by
  (cell, source) to finish per-source means, then a second tiny groupby
  averages the per-source means per cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min, Sum


def partial_cell_agg(value_cols: list[str], key_cols: list[str]):
    """``map_batches`` fn: reduce a batch to per-key partial sum/count rows."""

    # count_all counts ROWS (not non-null values of value_cols[0]) so ``n``
    # equals the SQL COUNT(*) twin even when a value column is nullable
    aggs = [(c, "sum") for c in value_cols] + [([], "count_all")]

    def fn(batch: pa.Table) -> pa.Table:
        cols = key_cols + value_cols
        out = batch.select(cols).group_by(key_cols).aggregate(aggs)
        # normalize names: <col>_sum -> sum_<col>, count_all -> n
        names = []
        for name in out.column_names:
            if name.endswith("_sum"):
                names.append("sum_" + name[: -len("_sum")])
            elif name == "count_all":
                names.append("n")
            else:
                names.append(name)
        return out.rename_columns(names)

    return fn


def cell_sum_count(
    ds: ray.data.Dataset, key_cols: list[str], value_cols: list[str]
) -> ray.data.Dataset:
    """Exact per-key (sum_<col>..., n) via partial pre-agg + adaptive
    combine (:func:`coalesce_shuffle_agg` — no-shuffle finish when the
    measured reduced size fits one block, hash shuffle otherwise).

    Integer columns keep integer sums (exact, order-independent) — the
    preferred output shape for oracle-checked queries.
    """
    partials = ds.map_batches(
        partial_cell_agg(value_cols, key_cols), batch_format="pyarrow"
    )
    ops = {("sum_" + c): "sum" for c in value_cols}
    ops["n"] = "sum"
    return coalesce_shuffle_agg(partials, key_cols, ops)


def tree_aggregate(
    partials: ray.data.Dataset,
    key_cols: list[str],
    sum_cols: list[str],
    fanout: int = 8,
) -> ray.data.Dataset:
    """Combine per-block partial aggregates by explicit tree reduction —
    coalesce (no shuffle) + per-block Arrow ``group_by`` at each level.

    Valid for algebraic aggregates (sums/counts/min/max). Orders of
    magnitude cheaper than a hash/sort shuffle when the key cardinality is
    bounded (tile grids, LSH bands, class labels): measured 0.2s vs 24s on
    6.3M partial rows. For UNBOUNDED keys (e.g. per-document exact-dedup at
    10^12 rows) the final level would not fit one block — use the
    hash-shuffle ``groupby`` path instead (``cell_sum_count``).
    """

    def combine(batch: pa.Table) -> pa.Table:
        out = batch.group_by(key_cols).aggregate([(c, "sum") for c in sum_cols])
        return out.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in out.column_names]
        )

    # Materialize the partials first: they are small by construction, and an
    # in-STREAM repartition barrier is pathological at low parallelism
    # (measured 134s vs 0.2s at 8 CPUs on identical data). On materialized
    # blocks, repartition is pure block-list manipulation.
    partials = partials.materialize()
    # two fixed levels: N blocks -> fanout -> 1 (enough for any realistic
    # block count; each level's combine shrinks rows before the next merge)
    lvl1 = partials.repartition(fanout).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    return lvl1.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )


def cell_count(
    ds: ray.data.Dataset, key_cols: list[str], alias: str = "n"
) -> ray.data.Dataset:
    """Exact per-key row count via in-batch partial + small shuffle — the
    pre-agg replacement for a raw ``groupby().aggregate(Count())`` (which
    shuffles every row; measured ~24 s on 6M rows vs sub-second here)."""

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select(key_cols).group_by(key_cols).aggregate([([], "count_all")])
        return out.rename_columns(
            [alias if c == "count_all" else c for c in out.column_names]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return coalesce_shuffle_agg(partials, key_cols, {alias: "sum"})


def coalesce_shuffle_agg(
    partials: ray.data.Dataset,
    key_cols: list[str],
    ops: dict[str, str],
    group_factor: int = 8,
    small_limit: int = 8_000_000,
    tiny_limit: int = 512_000,
) -> ray.data.Dataset:
    """Combine per-block partial aggregates (``ops``: col -> sum|min|max)
    over an arbitrarily large key space, memory-bounded at every step.

    The scale-safe sibling of :func:`tree_aggregate`: one bounded coalesce
    level (merge ~``group_factor`` partial blocks each, re-combining
    duplicate keys — block growth is capped at ``group_factor`` x one
    partial block, so nothing ever approaches a whole-dataset block), then
    an ADAPTIVE finish:

    * if the MEASURED reduced size fits one comfortable block
      (``small_limit`` rows — a row-count fact, not a guess), one final
      coalesce+combine finishes without any shuffle. Ray's hash-shuffle
      groupby costs multiple seconds of fixed actor spawn/coordination per
      execution, which dominates jobs whose reduced partials are small
      (replicated corpora, bounded grids);
    * otherwise the key space really is huge and the hash-shuffle
      ``groupby`` is the correct primitive (``tree_aggregate``'s blind
      ``repartition(1)`` — one block holding EVERY distinct key, ~docs x
      bands for MinHash bands at 10^12 docs — is exactly what this
      function exists to avoid).

    All ops are algebraic, so the result is identical either way.
    """
    items = list(ops.items())

    def combine(batch: pa.Table) -> pa.Table:
        out = batch.group_by(key_cols).aggregate([(c, op) for c, op in items])
        names = []
        for name in out.column_names:
            for c, op in items:
                if name == f"{c}_{op}":
                    name = c
                    break
            names.append(name)
        return out.rename_columns(names)

    # materialized first for the same reason as tree_aggregate: in-stream
    # repartition is a pathological barrier at low parallelism
    partials = partials.materialize()
    if partials.count() <= tiny_limit:
        # tiny jobs: single coalesce+combine, no intermediate level (each
        # execution round costs fixed driver/scheduler time that dominates
        # small aggregations; 512k rows group_by in one task is ~100 ms,
        # far below one round's overhead). ``tiny_limit`` is overridable
        # so forced-low-guard tests can drive the hash-shuffle path on
        # small fixtures.
        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    n_blocks = max(partials.num_blocks(), 1)
    n_part = partials.count()
    if n_part <= small_limit:
        # partials.count() upper-bounds the reduced size, so the decision
        # needs no second materialize: one FUSED lazy chain (bounded
        # coalesce level + single-block finish — the tree_aggregate
        # shape) saves a whole execution round of fixed driver time
        lvl1 = partials.repartition(
            max(1, (n_blocks + group_factor - 1) // group_factor)
        ).map_batches(combine, batch_format="pyarrow", batch_size=None)
        return lvl1.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    lvl1 = partials.repartition(max(1, (n_blocks + group_factor - 1) // group_factor))
    lvl1 = lvl1.map_batches(
        combine, batch_format="pyarrow", batch_size=None
    ).materialize()
    if lvl1.count() <= small_limit:  # row-count upper bound on distinct keys
        return lvl1.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    ray_aggs = {"sum": Sum, "min": Min, "max": Max}
    aggs = [ray_aggs[op](c, alias_name=c) for c, op in items]
    return lvl1.groupby(key_cols).aggregate(*aggs)


def coalesce_shuffle_sum(
    partials: ray.data.Dataset,
    key_cols: list[str],
    sum_cols: list[str],
    group_factor: int = 8,
    small_limit: int = 8_000_000,
    tiny_limit: int = 512_000,
) -> ray.data.Dataset:
    """All-sum convenience wrapper over :func:`coalesce_shuffle_agg`."""
    return coalesce_shuffle_agg(
        partials,
        key_cols,
        {c: "sum" for c in sum_cols},
        group_factor,
        small_limit,
        tiny_limit,
    )


def cell_mean(
    ds: ray.data.Dataset, key_cols: list[str], value_cols: list[str]
) -> ray.data.Dataset:
    """Mean over raw rows per cell, via partial pre-agg + small shuffle.

    Output columns: key_cols + ``mean_<col>`` + ``n`` (row count).
    """
    combined = cell_sum_count(ds, key_cols, value_cols)

    def finalize(batch: pa.Table) -> pa.Table:
        for c in value_cols:
            batch = batch.append_column(
                "mean_" + c,
                pc.divide(
                    pc.cast(batch["sum_" + c], pa.float64()),
                    pc.cast(batch["n"], pa.float64()),
                ),
            )
            batch = batch.drop_columns(["sum_" + c])
        return batch

    return combined.map_batches(finalize, batch_format="pyarrow")


def two_level_mean(
    ds: ray.data.Dataset,
    cell_col: str,
    source_col: str,
    value_col: str,
) -> ray.data.Dataset:
    """Reference A1 semantics: per-source mean per cell, then mean of means.

    Output: (cell_col, mean_of_means, n_sources). Matches
    ``local_match.py:372-387`` where each image contributes equally to a
    block regardless of how many of its pixels land there.
    """
    per_source = cell_mean(ds, [cell_col, source_col], [value_col])

    # level 2: unweighted mean of the per-source means — in-batch partial
    # + adaptive combine, NOT a raw Dataset.groupby().aggregate() (whose
    # hash-shuffle aggregator spawn costs multi-second fixed time per
    # execution — the CLAUDE.md rule every other aggregation follows)
    def lvl2_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                cell_col: batch[cell_col],
                "_sum_means": pc.cast(batch["mean_" + value_col], pa.float64()),
                "n_sources": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        out = t.group_by([cell_col]).aggregate(
            [("_sum_means", "sum"), ("n_sources", "sum")]
        )
        ren = {"_sum_means_sum": "_sum_means", "n_sources_sum": "n_sources"}
        return out.rename_columns([ren.get(c, c) for c in out.column_names])

    lvl2 = coalesce_shuffle_agg(
        per_source.map_batches(lvl2_partial, batch_format="pyarrow"),
        [cell_col],
        {"_sum_means": "sum", "n_sources": "sum"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        mom = pc.divide(
            batch["_sum_means"], pc.cast(batch["n_sources"], pa.float64())
        )
        return batch.drop_columns(["_sum_means"]).append_column(
            "mean_of_means", mom
        )

    return lvl2.map_batches(finalize, batch_format="pyarrow")


def salted_sum_count(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_cols: list[str],
    salt_col: str,
    salt_buckets: int = 16,
) -> ray.data.Dataset:
    """Explicitly SALTED two-phase aggregation for hot keys.

    Dense urban cells concentrate most rows on a few keys (the web-pages
    fixture plants 80% of rows on 20% of hosts for exactly this reason).
    Phase 1 groups by (key..., salt) where ``salt = hash(salt_col) %
    salt_buckets`` — a hot key's rows split across ``salt_buckets``
    reducers instead of one. Phase 2 merges the (tiny) salted partials per
    key. Output identical to :func:`cell_sum_count` (sums are associative).

    Note :func:`cell_sum_count`'s in-batch pre-aggregation already bounds
    any key's shuffle rows to O(#blocks); explicit salting additionally
    bounds the PHASE-1 reducer work per key, which matters when per-group
    finalization is expensive (map_groups) or #blocks is huge.
    """
    import polars as pl

    def add_salt(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[salt_col])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        salt = (s.hash(seed=5).to_numpy() % salt_buckets).astype("int64")
        return batch.append_column("_salt", pa.array(salt, pa.int64()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    phase1 = cell_sum_count(salted, [*key_cols, "_salt"], value_cols)
    # phase-2 merge through the adaptive combine (int sums, exact in any
    # order) — a raw groupby().aggregate() would pay the hash-shuffle
    # aggregator spawn per execution for a tiny salted-partials table
    return coalesce_shuffle_sum(
        phase1.drop_columns(["_salt"]),
        key_cols,
        ["sum_" + c for c in value_cols] + ["n"],
    )


def cell_stats(
    ds: ray.data.Dataset, key_cols: list[str], value_col: str
) -> ray.data.Dataset:
    """count/sum/min/max/sumsq per cell via partial pre-agg (A2-A4 analog).

    Output: key_cols + n, sum_v, min_v, max_v, sumsq_v — enough to finish
    mean/std at the consumer (std via the sum-of-squares identity, exact
    over integer domains).
    """

    rename = {
        "v_sum": "sum_v",
        "v_count": "n",
        "v_min": "min_v",
        "v_max": "max_v",
        "v2_sum": "sumsq_v",
    }

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[value_col], pa.float64())
        batch = batch.select(key_cols).append_column("v", v).append_column(
            "v2", pc.multiply(v, v)
        )
        out = (
            batch.group_by(key_cols)
            .aggregate([("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"), ("v2", "sum")])
        )
        return out.rename_columns([rename.get(c, c) for c in out.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return coalesce_shuffle_agg(
        partials,
        key_cols,
        {"sum_v": "sum", "n": "sum", "min_v": "min", "max_v": "max", "sumsq_v": "sum"},
    )
