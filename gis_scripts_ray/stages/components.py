"""Distributed connected-component labeling over sparse cell grids (M3).

The reference labels equal-value segments over the WHOLE raster in one
process (``raster/replace_band_consistant_values_with_value.py:63-121``,
``scipy.ndimage.label`` + a min-size threshold). Round 1's union-find
(``functions/gridops.py:87``) was per-partition only, so segments spanning
tile boundaries were mislabeled — this stage adds the boundary-merge round:

1. partition cells by coarse x-stripe (``px = x // part_width``);
2. label each stripe independently (``groupby(px).map_groups`` — the
   existing union-find), with the provisional label = the MIN packed
   ``(x << 32) | y`` cell key of the local component (deterministic and
   globally unique);
3. collect only the stripe-BOUNDARY cells (O(perimeter), not O(cells)) and
   union provisional labels across adjacent stripes at the driver;
4. broadcast the (tiny) label→root remap and relabel in one map.

Partitioning assumption: cell coordinates fit [0, 2^31) so the packed key
is a positive int64; boundary cells per stripe edge fit driver memory
(true for any raster whose single COLUMN fits one machine — the same
assumption scipy.ndimage.label makes for the whole image).

An optional ``value_col`` restricts connectivity to equal-valued neighbor
cells — the reference's "consistent value" segment semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.state.broadcast import worker_broadcast

_NEIGH4 = ((1, 0), (0, 1))
_NEIGH8 = ((1, 0), (0, 1), (1, 1), (1, -1))


def _pack(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return (np.asarray(x, dtype=np.int64) << np.int64(32)) | np.asarray(
        y, dtype=np.int64
    )


def distributed_components(
    ds: ray.data.Dataset,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    connectivity: int = 8,
    part_width: int = 64,
    value_col: str | None = None,
) -> ray.data.Dataset:
    """Label connected components of a sparse occupied-cell dataset.

    Input: one row per occupied cell (``(x, y)`` unique[, ``value_col``]).
    Output: the same rows plus ``component`` — the min packed cell key of
    the row's GLOBAL component (canonical, deterministic, partition-count
    invariant; tested against the single-process oracle).
    """
    import ray as _ray

    def add_px(batch: pa.Table) -> pa.Table:
        px = np.asarray(batch[x_col].to_numpy(), dtype=np.int64) // part_width
        return batch.append_column("_px", pa.array(px, pa.int64()))

    def label_stripe(group) -> pa.Table:
        if isinstance(group, dict):
            group = pa.table(group)
        elif not isinstance(group, pa.Table):
            group = pa.Table.from_pandas(group, preserve_index=False)
        group = group.drop_columns(["_px"])
        x = group[x_col].to_numpy().astype(np.int64)
        y = group[y_col].to_numpy().astype(np.int64)
        if len(x) == 0:
            return group.append_column("component", pa.array([], pa.int64()))
        if value_col:
            v = group[value_col].to_numpy().astype(np.int64)
            lab = _label_local_values(x, y, v, connectivity)
        else:
            # vectorized kernel for both branches; only the PARTITION
            # matters here (labels canonicalize to min packed key below)
            lab = _label_local_values(x, y, None, connectivity)
        packed = _pack(x, y)
        n_comp = int(lab.max()) + 1
        comp_min = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(comp_min, lab, packed)
        return group.append_column("component", pa.array(comp_min[lab], pa.int64()))

    labeled = (
        ds.map_batches(add_px, batch_format="pyarrow")
        .groupby("_px")
        .map_groups(label_stripe, batch_format="pyarrow")
        .materialize()
    )

    # boundary cells: first/last column of each stripe
    def boundary(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy().astype(np.int64)
        m = x % part_width
        keep = (m == 0) | (m == part_width - 1)
        return batch.filter(pa.array(keep))

    bt = labeled.map_batches(boundary, batch_format="pyarrow").to_pandas()
    remap = _merge_boundaries(
        bt[x_col].to_numpy().astype(np.int64),
        bt[y_col].to_numpy().astype(np.int64),
        bt["component"].to_numpy().astype(np.int64),
        bt[value_col].to_numpy().astype(np.int64) if value_col else None,
        connectivity,
        part_width,
    )
    if not remap:
        return labeled
    keys = np.array(sorted(remap), dtype=np.int64)
    vals = np.array([remap[k] for k in keys], dtype=np.int64)
    remap_ref = _ray.put((keys, vals))

    def relabel(batch: pa.Table, ref=None) -> pa.Table:
        # worker-cached broadcast remap (fused task stage, no actor spawn)
        keys_, vals_ = worker_broadcast(ref)
        lab = batch["component"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys_, lab)
        pos = np.clip(pos, 0, len(keys_) - 1)
        hit = keys_[pos] == lab
        new = np.where(hit, vals_[pos], lab)
        return batch.drop_columns(["component"]).append_column(
            "component", pa.array(new, pa.int64())
        )

    return labeled.map_batches(relabel, fn_kwargs={"ref": remap_ref}, batch_format="pyarrow")


def _label_local_values(
    x: np.ndarray, y: np.ndarray, v: np.ndarray | None, connectivity: int
) -> np.ndarray:
    """Vectorized in-stripe component labeling (equal-value connectivity
    when ``v`` is given) — round-2 verdict #6: the per-row Python
    union-find became the parity oracle (:func:`_label_local_values_py`,
    bit-equal by test); this path is sorted-neighbor edge discovery +
    min-label propagation with pointer jumping.

    Both produce labels densely ranked over each component's MIN row
    index, so they are identical arrays, not merely equal partitions.
    Measured on a 10^5-cell stripe: see BASELINE.md ledger.
    """
    n = len(x)
    packed = _pack(x, y)
    order = np.argsort(packed)  # cell keys are unique by contract
    sp = packed[order]
    neigh = _NEIGH4 if connectivity == 4 else _NEIGH8
    ei_l, ej_l = [], []
    for dx, dy in neigh:
        target = _pack(x + dx, y + dy)
        pos = np.clip(np.searchsorted(sp, target), 0, n - 1)
        hit = sp[pos] == target
        i = np.nonzero(hit)[0]
        j = order[pos[hit]]
        if v is not None:
            ok = v[i] == v[j]
            i, j = i[ok], j[ok]
        ei_l.append(i)
        ej_l.append(j)
    ei = np.concatenate(ei_l) if ei_l else np.empty(0, dtype=np.int64)
    ej = np.concatenate(ej_l) if ej_l else np.empty(0, dtype=np.int64)

    p = np.arange(n, dtype=np.int64)
    while True:
        # hook: every endpoint takes the min label in its closed
        # edge-neighborhood, then full pointer jumping — O(log n) rounds
        m = p.copy()
        if len(ei):
            np.minimum.at(m, ei, p[ej])
            np.minimum.at(m, ej, p[ei])
        while True:
            mm = m[m]
            if np.array_equal(mm, m):
                break
            m = mm
        if np.array_equal(m, p):
            break
        p = m
    _, lab = np.unique(p, return_inverse=True)
    return lab.astype(np.int64)


def _label_local_values_py(
    x: np.ndarray, y: np.ndarray, v: np.ndarray | None, connectivity: int
) -> np.ndarray:
    """Per-row Python union-find — the parity oracle for
    :func:`_label_local_values` (the repo's established kernel pattern:
    every vectorized kernel keeps its row-wise reference)."""
    n = len(x)
    index = {(int(x[i]), int(y[i])): i for i in range(n)}
    parent = np.arange(n, dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    neigh = _NEIGH4 if connectivity == 4 else _NEIGH8
    for (cx, cy), i in index.items():
        for dx, dy in neigh:
            j = index.get((cx + dx, cy + dy))
            if j is not None and (v is None or v[i] == v[j]):
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    _, lab = np.unique(roots, return_inverse=True)
    return lab


def _merge_boundaries(
    x: np.ndarray,
    y: np.ndarray,
    lab: np.ndarray,
    v: np.ndarray | None,
    connectivity: int,
    part_width: int,
) -> dict[int, int]:
    """Union provisional labels across stripe edges; return the labels
    whose canonical root CHANGES (label -> global min-packed root)."""
    cell = {}
    for i in range(len(x)):
        cell[(int(x[i]), int(y[i]))] = i
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        r = a
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(a, a) != a:
            parent[a], a = r, parent[a]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    neigh = _NEIGH4 if connectivity == 4 else _NEIGH8
    for (cx, cy), i in cell.items():
        if cx % part_width != part_width - 1:
            continue  # only edges that cross into the NEXT stripe
        for dx, dy in neigh:
            if dx != 1:
                continue
            j = cell.get((cx + dx, cy + dy))
            if j is not None and (v is None or v[i] == v[j]):
                union(int(lab[i]), int(lab[j]))
    return {a: find(a) for a in list(parent) if find(a) != a}
