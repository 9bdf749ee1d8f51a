"""Mosaic harmonization: per-source linear adjustment via tiny global solve.

Re-expression of the reference's global histogram matching
(``raster/seamless_mosaic/global_match.py:314-554``): pairwise overlap
statistics -> weighted least-squares for per-image gain/offset ``(a_i,
b_i)`` -> apply ``a*x + b`` everywhere. In the engine, "images" are
``source`` values, "overlap regions" are shared cells, and the pipeline
shape is the canonical small-aggregate -> driver-solve -> broadcast-apply:

1. ``cell_sum_count`` per (cell, source) — a tiny table (SURVEY.md A2-A3:
   stats dicts are O(sources^2), driver-sized);
2. driver: for every cell shared by sources i<j, a constraint row
   ``a_i*m_i + b_i - a_j*m_j - b_j = 0`` weighted by sqrt(min(n_i, n_j))
   (reference weighting by overlap size, ``global_match.py:355-397``),
   plus identity anchors ``a_i = 1``, ``b_i = 0`` (reference ``p_jj``
   anchor rows, ``global_match.py:399-435``); solved with numpy lstsq;
3. broadcast params -> stateless ``map_batches`` apply (the reference's
   band-by-band ``a*x+b`` write, ``global_match.py:499-551``).

The solve is deterministic: constraints are sorted by (cell, i, j).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from gis_scripts_ray.stages.tile_agg import cell_sum_count


def solve_source_adjustments(
    stats: "pa.Table | ray.data.Dataset",
    cell_col: str = "cell",
    source_col: str = "source",
    anchor_weight: float = 1.0,
) -> dict[str, tuple[float, float]]:
    """(a, b) per source from per-(cell, source) mean stats.

    ``stats`` columns: cell_col, source_col, ``sum_v``, ``n``.
    """
    if isinstance(stats, ray.data.Dataset):
        stats = pa.Table.from_pandas(stats.to_pandas(), preserve_index=False)
    import pandas as pd

    df = stats.to_pandas()
    df["mean"] = df["sum_v"] / df["n"]
    sources = sorted(df[source_col].unique())
    s_idx = {s: i for i, s in enumerate(sources)}
    ns = len(sources)
    rows: list[np.ndarray] = []
    rhs: list[float] = []
    # overlap constraints, deterministic order
    for _cell, g in sorted(df.groupby(cell_col), key=lambda kv: kv[0]):
        g = g.sort_values(source_col)
        recs = list(g[[source_col, "mean", "n"]].itertuples(index=False))
        for x in range(len(recs)):
            for y in range(x + 1, len(recs)):
                si, mi, ni = recs[x]
                sj, mj, nj = recs[y]
                w = float(np.sqrt(min(ni, nj)))
                row = np.zeros(2 * ns)
                row[2 * s_idx[si]] = w * mi
                row[2 * s_idx[si] + 1] = w
                row[2 * s_idx[sj]] = -w * mj
                row[2 * s_idx[sj] + 1] = -w
                rows.append(row)
                rhs.append(0.0)
    # identity anchors: a_i = 1, b_i = 0
    for s in sources:
        ra = np.zeros(2 * ns)
        ra[2 * s_idx[s]] = anchor_weight
        rows.append(ra)
        rhs.append(anchor_weight * 1.0)
        rb = np.zeros(2 * ns)
        rb[2 * s_idx[s] + 1] = anchor_weight
        rows.append(rb)
        rhs.append(0.0)
    A = np.vstack(rows)
    b = np.asarray(rhs)
    params, *_ = np.linalg.lstsq(A, b, rcond=None)
    return {s: (float(params[2 * i]), float(params[2 * i + 1])) for s, i in s_idx.items()}


def harmonize(
    ds: ray.data.Dataset,
    cell_col: str,
    source_col: str,
    value_col: str,
    anchor_weight: float = 1.0,
) -> tuple[ray.data.Dataset, dict[str, tuple[float, float]]]:
    """Full pipeline: stats -> solve -> broadcast apply.

    Returns (dataset with ``<value_col>_adj`` appended, params).
    """
    stats = cell_sum_count(ds, [cell_col, source_col], [value_col])
    stats_t = pa.Table.from_pandas(stats.to_pandas(), preserve_index=False)
    stats_t = stats_t.rename_columns(
        [
            "cell" if c == cell_col else "source" if c == source_col else
            "sum_v" if c == f"sum_{value_col}" else c
            for c in stats_t.column_names
        ]
    )
    params = solve_source_adjustments(stats_t)
    params_ref = ray.put(params)

    class Apply:
        def __init__(self, ref):
            self.params = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            src = batch[source_col].to_pylist()
            ab = np.asarray([self.params[s] for s in src])
            v = batch[value_col].to_numpy().astype(np.float64)
            adj = ab[:, 0] * v + ab[:, 1]
            return batch.append_column(f"{value_col}_adj", pa.array(adj, pa.float64()))

    out = ds.map_batches(
        Apply,
        fn_constructor_kwargs={"ref": params_ref},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
    )
    return out, params
