"""Unpivot (wide -> long, pandas ``melt`` / SQL ``UNPIVOT``) as a
vectorized flat-map — the reshape primitive behind per-metric quality
dashboards and tidy-format exports.

Reference semantics: every input row with value columns (v1..vk)
becomes k long rows (id_cols..., metric_name, value). The scale shape
is embarrassingly parallel: each Arrow batch melts independently by
COLUMN CONCATENATION (one ``pa.concat_arrays``-style stack per output
column, zero per-row Python), output is k x input rows but streams
block-by-block — nothing widens at the driver, and the long form feeds
straight into the partial pre-agg combine like any other stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def melt(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "metric",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Unpivot ``value_cols`` (must share one Arrow type) into
    (``var_col``, ``value_col``) long rows, repeating ``id_cols``.
    Row order within a batch: all rows for value_cols[0], then [1], ...
    (column-major stack — the cheap zero-copy-per-slice layout)."""
    def melt_batch(batch: pa.Table) -> pa.Table:
        k = len(value_cols)
        n = batch.num_rows
        cols = {}
        for c in id_cols:
            arr = batch[c].combine_chunks()
            cols[c] = pa.chunked_array([arr] * k) if k > 1 else arr
        # metric labels: k constant runs of length n — dictionary take,
        # no per-row Python string construction
        idx = pa.array(np.repeat(np.arange(k, dtype=np.int8), n), pa.int8())
        cols[var_col] = pa.compute.cast(
            pa.DictionaryArray.from_arrays(idx, pa.array(value_cols, pa.string())),
            pa.string(),
        )
        vals = [batch[vc].combine_chunks() for vc in value_cols]
        cols[value_col] = pa.chunked_array(vals)
        return pa.table(cols)

    return ds.map_batches(melt_batch, batch_format="pyarrow")
