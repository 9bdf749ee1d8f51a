"""Two-pass piecewise-linear stretch (M4 + A11, ``stretch_spectral_values.py``).

Reference semantics: breakpoint spec ``{'0%': 0, '10@': 0.2, '500': 1.0}``
where ``p%`` resolves to the p-th percentile, ``p@`` to the p-th percentile
excluding negatives, and literals pass through (parser at
``stretch_spectral_values.py:46-78``); then ``np.interp`` over valid values
(``:129-134``).

Engine shape: pass 1 is a global exact-quantile aggregate (distributed
value histogram — ``stages/stats.py``); pass 2 broadcasts the resolved
breakpoints and applies ``np.interp`` per batch. Ordering contract:
breakpoints sorted ascending by source value (the reference documents the
same requirement at ``stretch_spectral_values.py:38-40``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.scalar import piecewise_stretch, resolve_breakpoint_spec
from gis_scripts_ray.stages.stats import quantiles_from_histogram, value_histogram


def stretch_column(
    ds: ray.data.Dataset,
    col: str,
    spec: dict[str, float],
    out_col: str | None = None,
) -> tuple[ray.data.Dataset, dict[float, float]]:
    """Returns (dataset with ``out_col`` appended, resolved breakpoints)."""
    out_col = out_col or f"{col}_stretched"
    values, counts = value_histogram(ds, col)

    def qfn(q: float, exclude_negatives: bool) -> float:
        if exclude_negatives:
            keep = values >= 0
            return quantiles_from_histogram(values[keep], counts[keep], [q])[0]
        return quantiles_from_histogram(values, counts, [q])[0]

    breakpoints = resolve_breakpoint_spec(spec, qfn)

    def apply(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy().astype(np.float64)
        return batch.append_column(
            out_col, pa.array(piecewise_stretch(v, breakpoints), pa.float64())
        )

    return ds.map_batches(apply, batch_format="pyarrow"), breakpoints
