"""Deterministic sampling / dataset splitting (O2/O3).

The reference's train/val split is sklearn ``train_test_split`` inside the
DCNN trainer (``external/.../seagrass_lib.py:671``); a distributed engine
needs the split to be order-free, partition-free and reproducible, so it
uses the same multiplicative-hash residue as the O2 balanced resample
(``q_hash_sample``): row r is in val iff ``(id * 2654435761) % 100`` lands
in the top ``val_pct`` residues. No shuffle, no RNG state, stable under
repartitioning and resume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_SPLIT_SALT = 2654435761


def split_train_val(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    val_pct: int = 20,
    single_pass: bool = True,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(train, val) datasets via deterministic hash residue on ``id_col``.

    ``single_pass=True`` materializes the tagged rows once so both outputs
    read cached blocks instead of recomputing the upstream pipeline twice.
    """

    def tag(batch: pa.Table) -> pa.Table:
        # uint64 residue (ADVICE r2): int64 would silently wrap for ids >=
        # ~3.5e9 while the SQL twin errors on BIGINT overflow. uint64 wraps
        # mod 2^64, which the twin spells out in HUGEINT. Id contract:
        # ids must be non-negative (uint64 reinterprets negatives).
        ids = batch[id_col].to_numpy().astype(np.uint64)
        is_val = (ids * np.uint64(_SPLIT_SALT)) % np.uint64(100) >= np.uint64(
            100 - val_pct
        )
        return batch.append_column("_is_val", pa.array(is_val, pa.bool_()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if single_pass:
        tagged = tagged.materialize()

    def keep(val_side: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = batch["_is_val"] if val_side else pc.invert(batch["_is_val"])
            return batch.filter(m).drop_columns(["_is_val"])

        return fn

    return (
        tagged.map_batches(keep(False), batch_format="pyarrow"),
        tagged.map_batches(keep(True), batch_format="pyarrow"),
    )


def split_sql_predicate(id_col: str, val_pct: int = 20, val_side: bool = True) -> str:
    """The DuckDB twin of the split predicate (oracle support).

    HUGEINT product reduced mod 2^64 = the engine's wrapping-uint64
    arithmetic, for any non-negative BIGINT id (the id contract)."""
    cmp = ">=" if val_side else "<"
    return (
        f"(((CAST({id_col} AS HUGEINT)*{_SPLIT_SALT})%18446744073709551616)%100)"
        f" {cmp} {100 - val_pct}"
    )


def sample_stratified(
    ds: ray.data.Dataset,
    group_col: str,
    rates_bp: "dict[str, int]",
    id_col: str = "doc_id",
    default_bp: int = 0,
) -> ray.data.Dataset:
    """Deterministic stratified (per-group) sampling: row r of group g
    survives iff ``(id * SALT) mod 2^64 mod 10000 < rates_bp[g]`` —
    per-group rates in basis points (1 bp = 0.01%). The class-balancing
    resample every training-data pipeline needs (downsample the dominant
    language / boilerplate class, keep the rare ones whole): order-free,
    RNG-free, stable under repartitioning and resume, and a row keeps or
    drops IDENTICALLY across runs and block structures.

    The rate table broadcasts inside the closure (driver-sized by
    contract: one entry per class label); groups not listed get
    ``default_bp``. Same uint64 wrap + non-negative-id contract as
    :func:`split_train_val`; the SQL twin spells the identical HUGEINT
    arithmetic (see :func:`stratified_sql_predicate`)."""

    items = sorted(rates_bp.items())
    labels = [k for k, _ in items]
    bps = np.array([v for _, v in items], dtype=np.uint64)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch[id_col].to_numpy().astype(np.uint64)
        r = (ids * np.uint64(_SPLIT_SALT)) % np.uint64(10000)
        thresh = np.full(len(ids), np.uint64(default_bp), dtype=np.uint64)
        g = batch[group_col]
        for lab, bp in zip(labels, bps):
            # fill_null(False): a null group label gets default_bp instead
            # of surfacing a None mask element into the fancy assignment
            # (r3 advice — non-null labels were implied, now guarded)
            mask = pc.fill_null(pc.equal(g, lab), False)
            thresh[mask.to_numpy(zero_copy_only=False)] = bp
        return batch.filter(pa.array(r < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sql_predicate(
    group_col: str, rates_bp: "dict[str, int]", id_col: str, default_bp: int = 0
) -> str:
    """DuckDB twin of the stratified-sample predicate."""
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(rates_bp.items())
    )
    return (
        f"(((CAST({id_col} AS HUGEINT)*{_SPLIT_SALT})%18446744073709551616)%10000)"
        f" < (CASE {group_col} {cases} ELSE {default_bp} END)"
    )
