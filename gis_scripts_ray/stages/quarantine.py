"""Quarantine routing: bad rows go to a side table, never silently dropped.

SURVEY.md §4 (stragglers/retries row): the reference skips whole files on
error (``create_dem_tiles_from_array.py:288-289`` try/except-continue);
the engine instead routes invalid ROWS to a quarantine output with a
reason column, keeping the main pipeline total-row-count accountable:
``n_in == n_valid + n_quarantined`` for every stage.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data


def split_valid(
    ds: ray.data.Dataset,
    validator: Callable[[pa.Table], np.ndarray],
    reason: str,
    single_pass: bool = True,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(valid, quarantined) datasets; ``validator(batch) -> bool mask``.

    ``single_pass=True`` (default) materializes the tagged rows once: the
    input pipeline and the validator run a single time, and both outputs
    read the cached blocks (round 1 re-ran the whole upstream per sink).
    Quarantined rows carry a ``quarantine_reason`` column. Row
    conservation: len(valid) + len(quarantined) == len(ds).
    """

    def tag(batch: pa.Table) -> pa.Table:
        ok = np.asarray(validator(batch), dtype=bool)
        return batch.append_column("_valid", pa.array(ok, pa.bool_()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if single_pass:
        tagged = tagged.materialize()

    def keep_valid(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(batch["_valid"]).drop_columns(["_valid"])

    def keep_bad(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = batch.filter(pc.invert(batch["_valid"])).drop_columns(["_valid"])
        return bad.append_column(
            "quarantine_reason", pa.array([reason] * len(bad), pa.string())
        )

    return (
        tagged.map_batches(keep_valid, batch_format="pyarrow"),
        tagged.map_batches(keep_bad, batch_format="pyarrow"),
    )
