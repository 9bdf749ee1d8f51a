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
