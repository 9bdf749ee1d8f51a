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


def exclude_negative_quantile(
    ds: ray.data.Dataset, col: str, q: float
) -> float:
    """The reference's ``p@`` spec: percentile over non-negative values only
    (``stretch_spectral_values.py:68-78``)."""
    values, counts = value_histogram(ds, col)
    keep = values >= 0
    return quantiles_from_histogram(values[keep], counts[keep], [q])[0]
