"""Large x large joins: hash-partitioned, with a portable bucketed fallback.

The reference's joins are all broadcast-small-side (SURVEY.md §2.4 J6-J7)
or driver-sized (J1); a complete query engine also needs a both-sides-large
equi-join. Two paths:

* :func:`hash_join` — Ray's native ``Dataset.join`` (hash-partitioned
  shuffle on the key) when available in this Ray version;
* :func:`bucketed_join` — the portable pattern from the survey: add
  ``bucket = hash(key) % B`` to both sides, group each by bucket, and join
  matching buckets pairwise inside ``map_groups`` — an explicit
  partitioned hash join whose skew handling (B, salting) is visible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: "str | tuple[str, ...]",
    right_on: "str | tuple[str, ...] | None" = None,
    num_partitions: int = 16,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Hash-partitioned equi-join (native when the Ray version ships one).
    ``on`` may be a single column or a composite-key tuple."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    right_on_t = on_t if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    if hasattr(left, "join"):
        return left.join(
            right,
            join_type=join_type,
            num_partitions=num_partitions,
            on=on_t,
            right_on=right_on_t,
        )
    return bucketed_join(left, right, on_t, right_on_t, num_partitions)


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
    bits_per_key: int = 10,
    k: int = 4,
) -> ray.data.Dataset:
    """Runtime-filtered inner join: Bloom-prefilter the big left side with
    the right side's key set before the shuffle join (the classic
    sideways-information-passing / runtime-filter optimization).

    Build a Bloom filter of the right side's join keys (a mergeable
    OR-fold sketch, ``stages/sketch.py``), broadcast the fixed-size bit
    array once (``ray.put`` + per-worker cache), and drop left rows whose
    key is DEFINITELY absent inside a fused ``map_batches`` — so only
    ~matching rows (plus the ~1-2% false-positive tail) ever enter the
    all-to-all hash shuffle. False positives are removed by the exact
    join; false negatives are impossible, so the result is EXACTLY the
    plain inner join. At 100 TB with a selective right side this is the
    difference between shuffling the corpus and shuffling the matches.

    Inner joins only: outer semantics would need the dropped rows back.
    """
    import ray

    from gis_scripts_ray.stages.sketch import bloom_build, bloom_contains

    right_on = right_on or on
    right = right.materialize()
    n_keys = right.count()
    if n_keys == 0:
        # empty right side: the inner join is empty. Built directly —
        # Ray 2.49's native join crashes on all-empty shuffle partitions
        # (the Acero empty-block bug, CLAUDE.md). Output schema matches
        # the native join: left columns + right non-key columns.
        l_schema, r_schema = left.schema(), right.schema()
        fields = [
            pa.field(n, t) for n, t in zip(l_schema.names, l_schema.types)
        ] + [
            pa.field(n, t)
            for n, t in zip(r_schema.names, r_schema.types)
            if n != right_on
        ]
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    bits, m_bits, kk = bloom_build(right, right_on, n_keys, bits_per_key, k)
    ref = ray.put(bits)

    def prefilter(batch: pa.Table) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        keep = bloom_contains(worker_broadcast(ref), m_bits, kk, batch[on])
        return batch.filter(pa.array(keep))

    left_f = left.map_batches(prefilter, batch_format="pyarrow")
    # compact the (filtered, materialized) right side: Ray 2.49's native
    # join rejects right sides containing empty shuffle-partition blocks
    # (CLAUDE.md), and a selective filter upstream produces exactly those
    right = right.repartition(max(1, min(num_partitions, n_keys)))
    return hash_join(left_f, right, on, right_on, num_partitions)


def hash_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Rows of ``left`` whose key has NO match in ``right`` (NOT EXISTS /
    anti-join) — the LLM-pipeline "subtract an exclusion list" shape
    (docs not yet processed, users without an opt-in event).

    The right side reduces to its DISTINCT key set first (per-block
    unique partial + adaptive combine — the all-to-all carries each
    block's distinct keys once, never right's rows), then an adaptive
    finish, the same decision as ``dedup_rows``:

    * key set <= ``broadcast_limit``: broadcast it once (``ray.put`` +
      per-worker cache) and drop matches inside a fused ``map_batches``
      via an inverted ``is_in`` — no shuffle of either side;
    * else the native ``left_anti`` hash join against the compacted
      distinct-key table (compaction sidesteps Ray 2.49's Acero
      empty-shuffle-block crash, CLAUDE.md).

    Contract: non-null join keys (a NULL key never matches, and the two
    paths are only guaranteed to agree when keys are non-null).
    """
    import ray as _ray

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    right_on = right_on or on

    def partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select([right_on])
            .group_by([right_on])
            .aggregate([(right_on, "count")])
        )
        return out.rename_columns([right_on, "_n"])

    keys = (
        coalesce_shuffle_sum(
            right.map_batches(partial, batch_format="pyarrow"), [right_on], ["_n"]
        )
        .select_columns([right_on])
        .materialize()
    )
    n_keys = keys.count()
    if n_keys == 0:
        return left
    if n_keys <= broadcast_limit:
        keyset = pa.concat_arrays(
            chunk
            for b in keys.iter_batches(batch_format="pyarrow")
            for chunk in b[right_on].chunks
        )
        ref = _ray.put(keyset)

        def anti_filter(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from gis_scripts_ray.state.broadcast import worker_broadcast

            ks = worker_broadcast(ref)
            return batch.filter(pc.invert(pc.is_in(batch[on], value_set=ks)))

        return left.map_batches(anti_filter, batch_format="pyarrow")
    keys = keys.repartition(max(1, -(-n_keys // 4_000_000)))
    return hash_join(
        left, keys, on=on, right_on=right_on,
        num_partitions=num_partitions, join_type="left_anti",
    )


def intersect_distinct(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SQL ``INTERSECT``: the DISTINCT keys present in BOTH inputs — the
    set-membership audit (users active in two systems, docs in two
    crawls). Each side first reduces to its distinct key set via the
    per-block-unique + adaptive-combine compaction (the all-to-all
    carries each block's distinct keys once, never rows); the finish is
    adaptive like :func:`hash_anti_join`: when the SMALLER key set fits
    the driver, broadcast it and ``is_in``-filter the other compacted
    set (no further shuffle), else an inner hash join of the two
    compacted key tables.

    Output: one column named ``on``. Contract: non-null keys.
    """
    import pyarrow.compute as pc

    import ray as _ray

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum
    from gis_scripts_ray.state.broadcast import worker_broadcast

    right_on = right_on or on

    def distinct_of(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
        def partial(batch: pa.Table) -> pa.Table:
            out = batch.select([col]).group_by([col]).aggregate([(col, "count")])
            return out.rename_columns([col, "_n"])

        return (
            coalesce_shuffle_sum(
                ds.map_batches(partial, batch_format="pyarrow"), [col], ["_n"]
            )
            .select_columns([col])
            .materialize()
        )

    lkeys = distinct_of(left, on)
    rkeys = distinct_of(right, right_on)
    n_l, n_r = lkeys.count(), rkeys.count()
    small, small_col, big, big_col = (
        (lkeys, on, rkeys, right_on) if n_l <= n_r else (rkeys, right_on, lkeys, on)
    )
    if min(n_l, n_r) == 0:
        return lkeys.limit(0)
    if min(n_l, n_r) <= broadcast_limit:
        keyset = pa.concat_arrays(
            chunk
            for b in small.iter_batches(batch_format="pyarrow")
            for chunk in b[small_col].chunks
        )
        ref = _ray.put(keyset)

        def member_filter(batch: pa.Table) -> pa.Table:
            ks = worker_broadcast(ref)
            out = batch.filter(pc.is_in(batch[big_col], value_set=ks))
            return out.rename_columns([on])

        return big.map_batches(member_filter, batch_format="pyarrow")
    big = big.repartition(max(1, -(-max(n_l, n_r) // 4_000_000)))
    small = small.repartition(max(1, -(-min(n_l, n_r) // 4_000_000)))
    joined = hash_join(
        big, small, on=big_col, right_on=small_col, num_partitions=num_partitions
    )
    return joined.map_batches(
        lambda b: b.select([big_col]).rename_columns([on]), batch_format="pyarrow"
    )


def range_join_lookup(
    ds: ray.data.Dataset,
    ranges: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> ray.data.Dataset:
    """Inner range join of a fact stream against a driver-sized table of
    NON-OVERLAPPING half-open ranges ``[lo, hi)`` — the band/tier-lookup
    join (price bands, size tiers, latency buckets) the Dataset API has
    no native operator for.

    Scale design: the range table broadcasts ONCE (``ray.put`` +
    per-worker cache) with its breakpoints pre-sorted at the driver; each
    batch resolves every value with one vectorized ``np.searchsorted``
    against the ``lo`` array and validates ``value < hi[idx]`` (gaps
    between ranges are allowed — misses drop, inner semantics). No
    shuffle of either side; the fact stream stays fused read->lookup.
    For a range table too large to broadcast, compose
    :func:`bucketed_join` over a coarse value grid instead (replicate
    each range row to every grid bucket it spans, bucket facts by
    ``value // grid``, join per bucket) — lookup-table shapes never need
    it.

    Ranges must be non-empty and pairwise non-overlapping (validated at
    the driver; overlapping intervals are a different operator — an
    interval-overlap join produces multiple matches per row).
    """
    import ray as _ray

    from gis_scripts_ray.state.broadcast import worker_broadcast

    r = ranges.sort_by(lo_col)
    lo = r[lo_col].to_numpy()
    hi = r[hi_col].to_numpy()
    if len(r) == 0:
        raise ValueError("empty range table")
    if np.any(hi <= lo) or np.any(hi[:-1] > lo[1:]):
        raise ValueError("ranges must be non-empty and non-overlapping")
    ref = _ray.put(r)
    attach_cols = [c for c in r.column_names if c not in (lo_col, hi_col)]

    def lookup(batch: pa.Table) -> pa.Table:
        rt = worker_broadcast(ref)
        lo_b = rt[lo_col].to_numpy()
        hi_b = rt[hi_col].to_numpy()
        x = batch[value_col].to_numpy()
        idx = np.searchsorted(lo_b, x, side="right") - 1
        safe = np.clip(idx, 0, len(lo_b) - 1)
        ok = (idx >= 0) & (x < hi_b[safe])
        out = batch.filter(pa.array(ok))
        take = safe[ok]
        for c in attach_cols + [lo_col, hi_col]:
            out = out.append_column(c, rt[c].take(pa.array(take)))
        return out

    return ds.map_batches(lookup, batch_format="pyarrow")


def _key_hash_i64(col) -> "np.ndarray":
    """Stable per-column int64 hash for bucketing. The path is chosen
    from the column TYPE only — never from per-batch data like
    null_count — so a given key value lands in the same bucket in every
    block (block-structure independence, CLAUDE.md). Integer columns
    take the multiplicative path with nulls filled to 0 (the value is
    irrelevant: null keys are dropped at join time; array multiply wraps
    silently in numpy); everything else (strings, floats) routes through
    polars' null-safe 64-bit content hash."""
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type):
        keys = pc.fill_null(col, 0).to_numpy().astype(np.int64, copy=False)
        return keys * np.int64(2654435761)
    import polars as pl

    s = pl.from_arrow(col)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    return s.hash(seed=3).to_numpy().view(np.int64)


def bucketed_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: "str | tuple[str, ...]",
    right_on: "str | tuple[str, ...] | None" = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Explicit partitioned hash join (inner): bucket both sides by key
    hash, union with a side tag, join within each bucket group.

    ``on`` / ``right_on`` may be a single column or a composite-key tuple
    (positionally matched). Inner semantics throughout: rows with a NULL
    in any key column are dropped BEFORE the per-bucket merge — SQL
    equality never matches NULL, and pandas' merge would otherwise both
    match NaN==NaN and silently float-promote null-padded int64 columns
    (the >2^53 rounding hazard, CLAUDE.md). The per-bucket finish
    therefore splits sides from ARROW, merges only renamed key columns
    plus a row position, and gathers payload values with Arrow ``take`` —
    no payload value ever round-trips through pandas."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    right_on_t = on_t if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    if len(on_t) != len(right_on_t):
        raise ValueError("on and right_on must have the same arity")
    # union requires one schema: pad each side with typed nulls for the
    # other side's columns
    def _pa_type(t):
        """Normalize Ray schema types (pyarrow for arrow blocks, numpy
        dtypes / object for pandas blocks) to a pyarrow DataType."""
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.lib.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()  # pandas object columns are strings here

    l_schema = left.schema()
    r_schema = right.schema()
    l_fields = {n: _pa_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_fields = {n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    shared_keys = {a for a, b in zip(on_t, right_on_t) if a == b}
    overlap = (set(l_fields) & set(r_fields)) - shared_keys
    if overlap:
        # the native join path suffixes these; the fallback would silently
        # emit pandas _x/_y columns and diverge — reject up front
        raise ValueError(
            f"bucketed_join: overlapping non-key columns {sorted(overlap)}; "
            "rename them before joining (matches Dataset.join's accepted inputs)"
        )

    def tag(side: str, keys: tuple, missing: dict):
        def fn(batch: pa.Table) -> pa.Table:
            h = np.zeros(len(batch), np.int64)
            for k in keys:
                # polynomial combine; array ops wrap silently in int64
                h = h * np.int64(1000003) + _key_hash_i64(batch[k])
            bucket = h % num_buckets  # numpy % positive divisor: >= 0
            out = batch
            for name, typ in sorted(missing.items()):
                out = out.append_column(name, pa.nulls(len(batch), typ))
            return out.append_column(
                "__bucket", pa.array(bucket, pa.int64())
            ).append_column(
                "__side", pa.array(np.full(len(batch), side), pa.string())
            )

        return fn

    l_missing = {k: v for k, v in r_fields.items() if k not in l_fields}
    r_missing = {k: v for k, v in l_fields.items() if k not in r_fields}
    col_order = sorted(set(l_fields) | set(r_fields)) + ["__bucket", "__side"]
    lt = left.map_batches(tag("l", on_t, l_missing), batch_format="pyarrow").select_columns(col_order)
    rt = right.map_batches(tag("r", right_on_t, r_missing), batch_format="pyarrow").select_columns(col_order)
    both = lt.union(rt)

    l_names = list(l_fields)
    r_names = list(r_fields)
    # output = left columns + right columns minus same-name matched keys
    # (pandas-merge convention the single-key fallback always had)
    r_out_names = [c for c in r_names if c not in shared_keys]
    lk_names = [f"__lk{i}" for i in range(len(on_t))]
    rk_names = [f"__rk{i}" for i in range(len(right_on_t))]

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lg = g.filter(pc.equal(g["__side"], "l")).select(l_names)
        rg = g.filter(pc.equal(g["__side"], "r")).select(r_names)
        for k in on_t:
            lg = lg.filter(pc.is_valid(lg[k]))
        for k in right_on_t:
            rg = rg.filter(pc.is_valid(rg[k]))
        # keys are non-null here, so the pandas frames carry exact int64;
        # payloads never enter pandas — positions gather them from Arrow
        lkf = lg.select(list(on_t)).rename_columns(lk_names).to_pandas()
        rkf = rg.select(list(right_on_t)).rename_columns(rk_names).to_pandas()
        lkf["__lpos"] = np.arange(len(lg), dtype=np.int64)
        rkf["__rpos"] = np.arange(len(rg), dtype=np.int64)
        m = lkf.merge(rkf, left_on=lk_names, right_on=rk_names, how="inner")
        out = lg.take(pa.array(m["__lpos"].to_numpy(), pa.int64()))
        rout = rg.select(r_out_names).take(
            pa.array(m["__rpos"].to_numpy(), pa.int64())
        )
        for c in r_out_names:
            out = out.append_column(c, rout[c])
        return out

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
