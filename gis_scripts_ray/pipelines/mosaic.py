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

from gis_scripts_ray.state.broadcast import worker_broadcast
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

    df = stats.to_pandas()
    df["mean"] = df["sum_v"] / df["n"]
    sources = sorted(df[source_col].unique())
    s_idx = {s: i for i, s in enumerate(sources)}
    ns = len(sources)
    # vectorized constraint build (was a per-cell per-pair Python double
    # loop): sort by (cell, source), expand each cell run's pairs with
    # triu indices, fill the dense A with four fancy-index assignments
    df = df.sort_values([cell_col, source_col], kind="mergesort").reset_index(drop=True)
    cells = df[cell_col].to_numpy()
    sid = df[source_col].map(s_idx).to_numpy().astype(np.int64)
    mean = df["mean"].to_numpy()
    nn = df["n"].to_numpy().astype(np.float64)
    new = np.concatenate([[True], cells[1:] != cells[:-1]])
    starts = np.nonzero(new)[0]
    lens = np.diff(np.concatenate([starts, [len(cells)]]))
    ia_l, ib_l = [], []
    for s0, ln in zip(starts, lens):
        if ln < 2:
            continue
        a, b_ = np.triu_indices(int(ln), k=1)
        ia_l.append(s0 + a)
        ib_l.append(s0 + b_)
    if ia_l:
        ia = np.concatenate(ia_l)
        ib = np.concatenate(ib_l)
    else:
        ia = ib = np.empty(0, dtype=np.int64)
    n_pairs = len(ia)
    if n_pairs > 2_000_000:
        import warnings

        # cells x C(sources, 2) grew past driver scale — thin the
        # constraint set deterministically (every stride-th pair in
        # (cell, i, j) order) rather than OOM, and WARN so the caller
        # knows the solve is no longer using every overlap constraint
        stride = (n_pairs + 1_999_999) // 2_000_000
        warnings.warn(
            f"harmonize: thinning {n_pairs} overlap constraints by stride "
            f"{stride} (driver-memory cap)", RuntimeWarning, stacklevel=2,
        )
        ia, ib = ia[::stride], ib[::stride]
        n_pairs = len(ia)
    w = np.sqrt(np.minimum(nn[ia], nn[ib]))
    A = np.zeros((n_pairs + 2 * ns, 2 * ns))
    r = np.arange(n_pairs)
    A[r, 2 * sid[ia]] = w * mean[ia]
    A[r, 2 * sid[ia] + 1] = w
    A[r, 2 * sid[ib]] = -w * mean[ib]
    A[r, 2 * sid[ib] + 1] = -w
    b = np.zeros(n_pairs + 2 * ns)
    # identity anchors: a_i = 1, b_i = 0
    anchor_rows = n_pairs + 2 * np.arange(ns)
    A[anchor_rows, 2 * np.arange(ns)] = anchor_weight
    b[anchor_rows] = anchor_weight * 1.0
    A[anchor_rows + 1, 2 * np.arange(ns) + 1] = anchor_weight
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

    def apply_params(batch: pa.Table, ref=None) -> pa.Table:
        # worker-cached broadcast params (fused task stage)
        p = worker_broadcast(ref)
        src = batch[source_col].to_pylist()
        ab = np.asarray([p[s] for s in src])
        v = batch[value_col].to_numpy().astype(np.float64)
        adj = ab[:, 0] * v + ab[:, 1]
        return batch.append_column(f"{value_col}_adj", pa.array(adj, pa.float64()))

    out = ds.map_batches(apply_params, fn_kwargs={"ref": params_ref}, batch_format="pyarrow")
    return out, params
