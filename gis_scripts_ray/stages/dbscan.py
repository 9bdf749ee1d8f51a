"""Distributed weighted DBSCAN over (lat, lon) points — density clustering
for the geo side of the corpus (site clustering, POI grouping, spatial
duplicate-region discovery). Reference analogy: the segment-label component
pass of ``stages/components.py`` clusters a raster grid by adjacency; this
stage clusters an arbitrary point set by metric density (the vector-side
sibling), reusing the same distributed transitive-closure machinery
(``stages/graphcc.py``).

Semantics (deterministic DBSCAN variant):

* every point carries an integer ``weight`` (multiplicity — e.g. the number
  of documents geocoded to one site; weight 1 == classic DBSCAN);
* a point is CORE iff the total weight within ``eps_m`` great-circle meters
  (INCLUDING its own weight) is >= ``min_weight``;
* clusters are the connected components of the core points under the
  within-eps relation, labeled by the MINIMUM point id in the component
  (order-independent, unlike textbook DBSCAN's scan-order labels);
* a non-core point within eps of >= 1 core point is a BORDER point and
  joins the minimum cluster label among its core neighbors (textbook
  DBSCAN assigns the first claimant — scan-order-dependent; min is the
  deterministic refinement);
* everything else is NOISE (cluster -1).

Weighted-on-distinct-locations equals classic DBSCAN on the expanded
multiset: co-located rows have identical neighborhoods, so collapsing them
to one weighted point changes no core decision, no edge, and no label
(pinned by ``tests/test_dbscan.py``).

Scale shape (the 100 TB contract):

1. candidate generation is grid-bucketed: cells sized so that any two
   points within eps land in the same or adjacent cells (lat cell from the
   conservative meters-per-degree bound; lon cell from the exact spherical
   bound ``2*asin(sin(eps/2R)/cos(lat_cap))`` at the DATA's max |lat| — a
   one-pass global aggregate, never a per-batch guess). Each point is
   emitted once OWNED to its cell and as GHOSTS to the 8 surrounding
   cells; points within an eps-window of the +-180 seam also ghost to the
   cells of their +-360-shifted longitude, so antimeridian pairs meet
   without a planet-wide wrap. Emissions are deduped per (point, cell).
2. pairs materialize only per cell (``groupby(cell).map_groups``), owned
   rows x all rows, chunked haversine matrices — never all-pairs across
   the dataset. The quadratic cost is bounded per cell; the intended input
   is the DISTINCT-location aggregate (bounded by geography), not raw
   docs: aggregate first, cluster the weighted sites.
3. degree, core-core edge filtering, border assignment, and the final
   per-point label delivery all run through the house adaptive pattern:
   MEASURED small side -> worker-cached broadcast (sorted-array
   searchsorted), else hash-join fallback (one JoinOperator per execution
   — the Ray 2.49 two-join deadlock rule, see ``similarity.py``); cluster
   formation is O(diameter) label propagation (``graphcc``), no driver
   rows.

Output: one row per input point — (id, weight, is_core, cluster), all
int64; cluster -1 == noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from gis_scripts_ray.functions import geo
from gis_scripts_ray.state.broadcast import worker_broadcast

_LAT_M_PER_DEG = 110_500.0  # conservative (true spherical: ~111,195)


def _lon_cell_deg(eps_m: float, lat_cap_deg: float) -> float:
    """Smallest lon-cell width (deg) such that two points within eps_m and
    |lat| <= lat_cap land in same/adjacent lon cells.

    Exact spherical bound: haversine(d) >= 2R*asin(cos(lat_cap)*|sin(dlon/2)|)
    for |lat1|,|lat2| <= lat_cap, so d <= eps implies
    dlon <= 2*asin(min(1, sin(eps/2R) / cos(lat_cap))).
    """
    half = np.sin(min(eps_m / (2.0 * geo.EARTH_RADIUS_M), np.pi / 2.0))
    cosc = np.cos(np.radians(min(abs(lat_cap_deg), 89.999)))
    if half >= cosc:  # eps reaches around the parallel: one giant cell
        return 361.0
    dlon_rad = 2.0 * np.arcsin(half / cosc)
    return float(np.degrees(dlon_rad)) * 1.000001 + 1e-12


def _pack_cells(ci: np.ndarray, cj: np.ndarray) -> np.ndarray:
    """(ci, cj) -> one int64 key. ci in [-2^20, 2^20), cj likewise (lat/lon
    cells are bounded by 360/width + shift margin — tiny)."""
    return (ci.astype(np.int64) + (1 << 20)) * (1 << 22) + (
        cj.astype(np.int64) + (1 << 21)
    )


def _emit_cells(
    batch: pa.Table,
    *,
    cell_lat: float,
    cell_lon: float,
    id_col: str,
    lat_col: str,
    lon_col: str,
    weight_col: str | None,
) -> pa.Table:
    """Owned + ghost copies of each point, deduped per (point, cell)."""
    lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
    lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    w = (
        batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col
        else np.ones(len(ids), dtype=np.int64)
    )
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "lat": pa.array([], pa.float64()),
                "lon": pa.array([], pa.float64()),
                "w": pa.array([], pa.int64()),
                "owned": pa.array([], pa.bool_()),
            }
        )

    ci = np.floor(lat / cell_lat).astype(np.int64)
    # base + seam-shifted lon copies: a shifted copy is emitted only when
    # its 3x3 spread can overlap cells holding real (unshifted) points
    lo_cell = int(np.floor(-180.0 / cell_lon))
    hi_cell = int(np.floor(180.0 / cell_lon))
    lon_variants = [lon] + [
        lon + s for s in (-360.0, 360.0) if cell_lon * 3.0 < 360.0
    ]
    rows_idx, rows_ci, rows_cj, rows_owned = [], [], [], []
    off_i, off_j = np.meshgrid(
        np.array([-1, 0, 1], np.int64), np.array([-1, 0, 1], np.int64)
    )
    off_i, off_j = off_i.ravel(), off_j.ravel()
    for vi, lv in enumerate(lon_variants):
        cj = np.floor(lv / cell_lon).astype(np.int64)
        if vi > 0:
            keep = (cj + 1 >= lo_cell) & (cj - 1 <= hi_cell)
            if not keep.any():
                continue
            src = np.nonzero(keep)[0]
        else:
            src = np.arange(n)
        # 9 emissions per source point
        rep = np.repeat(src, 9)
        eci = np.repeat(ci[src], 9) + np.tile(off_i, len(src))
        ecj = np.repeat(cj[src], 9) + np.tile(off_j, len(src))
        owned = np.tile((off_i == 0) & (off_j == 0), len(src)) & (vi == 0)
        rows_idx.append(rep)
        rows_ci.append(eci)
        rows_cj.append(ecj)
        rows_owned.append(owned)
    idx = np.concatenate(rows_idx)
    key = _pack_cells(np.concatenate(rows_ci), np.concatenate(rows_cj))
    owned = np.concatenate(rows_owned)
    # dedupe (point, cell), keeping the owned copy when both exist: sort by
    # (id-row, cell, not-owned) and take the first of each run
    order = np.lexsort((~owned, key, idx))
    idx, key, owned = idx[order], key[order], owned[order]
    first = np.concatenate(
        [[True], (idx[1:] != idx[:-1]) | (key[1:] != key[:-1])]
    )
    idx, key, owned = idx[first], key[first], owned[first]
    return pa.table(
        {
            "cell": pa.array(key, pa.int64()),
            "id": pa.array(ids[idx], pa.int64()),
            "lat": pa.array(lat[idx], pa.float64()),
            "lon": pa.array(lon[idx], pa.float64()),
            "w": pa.array(w[idx], pa.int64()),
            "owned": pa.array(owned, pa.bool_()),
        }
    )


def _cell_pairs(group: pa.Table, *, eps_m: float) -> pa.Table:
    """Within-eps pairs (sa -> sb, sb's weight) for one cell: owned rows x
    all rows, chunked haversine matrix (no per-row Python). Self-pairs
    (sa == sb, d = 0) are intentionally kept — degree counts own weight,
    matching the SQL self-join convention."""
    lat = group["lat"].to_numpy(zero_copy_only=False)
    lon = group["lon"].to_numpy(zero_copy_only=False)
    ids = group["id"].to_numpy(zero_copy_only=False)
    w = group["w"].to_numpy(zero_copy_only=False)
    owned = group["owned"].to_numpy(zero_copy_only=False)
    oi = np.nonzero(owned)[0]
    n = len(ids)
    out_a, out_b, out_w = [], [], []
    if n and len(oi):
        chunk = max(1, 4_000_000 // n)
        for c0 in range(0, len(oi), chunk):
            sel = oi[c0 : c0 + chunk]
            d = geo.haversine_m(
                lat[sel, None], lon[sel, None], lat[None, :], lon[None, :]
            )
            ai, bi = np.nonzero(d <= eps_m)
            out_a.append(ids[sel[ai]])
            out_b.append(ids[bi])
            out_w.append(w[bi])
    cat = lambda parts: (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "sa": pa.array(cat(out_a), pa.int64()),
            "sb": pa.array(cat(out_b), pa.int64()),
            "nb": pa.array(cat(out_w), pa.int64()),
        }
    )


@ray.remote(num_cpus=0.5)
def _fold_sorted_map(*blocks):
    """Fold (key, val) blocks into sorted parallel arrays worker-side (the
    graphcc ``_build_label_map`` shape — driver handles only refs)."""
    # an empty dataset materializes as schema-less blocks — skip them
    blocks = [b for b in blocks if b.num_columns >= 2]
    keys = np.concatenate(
        [b.column(0).to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    vals = np.concatenate(
        [b.column(1).to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def _sorted_map_ref(ds: ray.data.Dataset, key: str, val: str):
    """Worker-side sorted (key -> val) map ref from a materialized dataset."""
    sel = ds.select_columns([key, val]).materialize()
    refs = [
        br
        for bundle in sel.iter_internal_ref_bundles()
        for br in bundle.block_refs
    ]
    return _fold_sorted_map.remote(*refs)


def dbscan(
    points: ray.data.Dataset,
    eps_m: float,
    min_weight: int,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    weight_col: str | None = None,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Weighted DBSCAN. Returns (id, weight, is_core, cluster) int64 rows,
    one per input point; cluster is the min member id of the cluster, or
    -1 for noise. ``points`` ids must be unique non-negative int64."""
    from gis_scripts_ray.stages.graphcc import connected_components
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    pts = points.materialize()
    # exact global latitude cap (block-structure-independent by construction)
    lat_cap = pts.map_batches(
        lambda b: pa.table(
            {"m": pa.array([pc.max(pc.abs(b[lat_col])).as_py() or 0.0])}
        ),
        batch_format="pyarrow",
    ).max("m")
    lat_cap = float(lat_cap if lat_cap is not None else 0.0)
    cell_lat = eps_m / _LAT_M_PER_DEG
    cell_lon = _lon_cell_deg(eps_m, lat_cap)

    emitted = pts.map_batches(
        _emit_cells,
        fn_kwargs=dict(
            cell_lat=cell_lat,
            cell_lon=cell_lon,
            id_col=id_col,
            lat_col=lat_col,
            lon_col=lon_col,
            weight_col=weight_col,
        ),
        batch_format="pyarrow",
    )
    edges = (
        emitted.groupby("cell")
        .map_groups(
            _cell_pairs, fn_kwargs=dict(eps_m=eps_m), batch_format="pyarrow"
        )
        .select_columns(["sa", "sb", "nb"])
        .materialize()
    )

    # degree (within-eps weight, own weight included) -> core set
    deg = coalesce_shuffle_agg(edges, ["sa"], {"nb": "sum"})
    cores = (
        deg.map_batches(
            lambda b: pa.table(
                {"node": b["sa"].filter(pc.greater_equal(b["nb"], min_weight))}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_core = cores.count()

    if n_core == 0:
        # everything is noise
        def all_noise(b: pa.Table) -> pa.Table:
            wcol = (
                b[weight_col].cast(pa.int64())
                if weight_col
                else pa.array(np.ones(b.num_rows, dtype=np.int64))
            )
            return pa.table(
                {
                    "id": b[id_col].cast(pa.int64()),
                    "weight": wcol,
                    "is_core": pa.array(np.zeros(b.num_rows, np.int64)),
                    "cluster": pa.array(np.full(b.num_rows, -1, np.int64)),
                }
            )

        return pts.map_batches(all_noise, batch_format="pyarrow")

    if n_core <= broadcast_limit:
        # broadcast the sorted core-id array; split edges in one fused pass
        core_ids = np.sort(
            np.concatenate(
                [
                    b["node"].to_numpy()
                    for b in cores.iter_batches(batch_format="pyarrow")
                ]
                or [np.array([], dtype=np.int64)]
            )
        )
        core_ref = ray.put(pa.array(core_ids, pa.int64()))

        def core_core(b: pa.Table, ref=None) -> pa.Table:
            cset = worker_broadcast(ref)
            m = pc.and_(
                pc.is_in(b["sa"], value_set=cset),
                pc.is_in(b["sb"], value_set=cset),
            )
            return b.filter(m).select(["sa", "sb"])

        def noncore_to_core(b: pa.Table, ref=None) -> pa.Table:
            cset = worker_broadcast(ref)
            m = pc.and_(
                pc.invert(pc.is_in(b["sa"], value_set=cset)),
                pc.is_in(b["sb"], value_set=cset),
            )
            return b.filter(m).select(["sa", "sb"])

        cc_edges = edges.map_batches(
            core_core, fn_kwargs={"ref": core_ref}, batch_format="pyarrow"
        )
        border_edges = edges.map_batches(
            noncore_to_core, fn_kwargs={"ref": core_ref}, batch_format="pyarrow"
        ).materialize()
    else:
        # join fallback: ONE JoinOperator per execution (Ray 2.49 two-join
        # deadlock rule) — materialize between the two semi-filters
        compact = cores.repartition(max(1, -(-n_core // 4_000_000))).materialize()
        # join outputs carry schema-less empty shuffle-partition blocks
        # (the Ray 2.49 Acero quirk, see dedup.dedup_rows) — repartition-
        # compact every intermediate before it feeds another join
        sa_core = (
            hash_join(
                edges, compact, on="sa", right_on="node",
                num_partitions=num_partitions,
            )
            .select_columns(["sa", "sb"])
            .repartition(num_partitions)
            .materialize()
        )
        cc_edges = (
            hash_join(
                sa_core, compact, on="sb", right_on="node",
                num_partitions=num_partitions,
            )
            .select_columns(["sa", "sb"])
            .repartition(num_partitions)
            .materialize()
        )
        from gis_scripts_ray.stages.joins import hash_anti_join

        sb_core = (
            hash_join(
                edges.select_columns(["sa", "sb"]), compact, on="sb",
                right_on="node", num_partitions=num_partitions,
            )
            .select_columns(["sa", "sb"])
            .repartition(num_partitions)
            .materialize()
        )
        border_edges = (
            hash_anti_join(
                sb_core, compact, on="sa", right_on="node",
                num_partitions=num_partitions,
            )
            .repartition(num_partitions)
            .materialize()
        )

    roots = connected_components(
        cc_edges, nodes=cores, a_col="sa", b_col="sb",
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
    ).materialize()

    # border points: min core-neighbor root per non-core endpoint
    n_roots = roots.count()
    if border_edges.count() == 0:
        # no borders: an all-empty dataset materializes as schema-less
        # blocks that crash a downstream join/group_by — use a typed empty
        borders = ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "root": pa.array([], pa.int64())}
            )
        )
    elif n_roots <= broadcast_limit:
        root_ref = _sorted_map_ref(roots, "node", "root")

        def attach_root(b: pa.Table, ref=None) -> pa.Table:
            keys, vals = worker_broadcast(ref)
            sb = b["sb"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, sb)
            return pa.table(
                {"node": b["sa"], "root": pa.array(vals[pos], pa.int64())}
            )

        border_roots = border_edges.map_batches(
            attach_root, fn_kwargs={"ref": root_ref}, batch_format="pyarrow"
        )
    else:
        compact_r = roots.repartition(max(1, -(-n_roots // 4_000_000)))
        border_roots = hash_join(
            border_edges, compact_r, on="sb", right_on="node",
            num_partitions=num_partitions,
        ).repartition(num_partitions).map_batches(
            lambda b: pa.table({"node": b["sa"], "root": b["root"]}),
            batch_format="pyarrow",
        )
    if border_edges.count() != 0:
        borders = coalesce_shuffle_agg(border_roots, ["node"], {"root": "min"})

    # labels = cores (is_core=1) + borders (is_core=0); deliver to points
    def tag(is_core: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"].cast(pa.int64()),
                    "root": b["root"].cast(pa.int64()),
                    "is_core": pa.array(
                        np.full(b.num_rows, is_core, np.int64)
                    ),
                }
            )

        return f

    labels = (
        roots.map_batches(tag(1), batch_format="pyarrow")
        .union(borders.map_batches(tag(0), batch_format="pyarrow"))
        .materialize()
    )
    n_labels = labels.count()

    if n_labels <= broadcast_limit:
        # one broadcast map delivers (root, is_core) with a found-mask
        lab_sel = labels.materialize()
        refs = [
            br
            for bundle in lab_sel.iter_internal_ref_bundles()
            for br in bundle.block_refs
        ]
        lab_ref = _fold_label_table.remote(*refs)

        def finish(b: pa.Table, ref=None) -> pa.Table:
            keys, root, isc = worker_broadcast(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(keys, ids)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            found = (
                (keys[pos_c] == ids) if len(keys) else np.zeros(len(ids), bool)
            )
            cl = np.where(found, root[pos_c] if len(keys) else -1, -1)
            ic = np.where(found, isc[pos_c] if len(keys) else 0, 0)
            wcol = (
                b[weight_col].cast(pa.int64())
                if weight_col
                else pa.array(np.ones(b.num_rows, dtype=np.int64))
            )
            return pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "weight": wcol,
                    "is_core": pa.array(ic.astype(np.int64)),
                    "cluster": pa.array(cl.astype(np.int64)),
                }
            )

        return pts.map_batches(
            finish, fn_kwargs={"ref": lab_ref}, batch_format="pyarrow"
        )

    # join fallback: labeled rows via inner join, noise via anti-join
    from gis_scripts_ray.stages.joins import hash_anti_join

    compact_l = labels.repartition(max(1, -(-n_labels // 4_000_000))).materialize()

    def norm(b: pa.Table, is_core_col: bool) -> pa.Table:
        wcol = (
            b[weight_col].cast(pa.int64())
            if weight_col
            else pa.array(np.ones(b.num_rows, dtype=np.int64))
        )
        return pa.table(
            {
                "id": b[id_col].cast(pa.int64()),
                "weight": wcol,
                "is_core": (
                    b["is_core"].cast(pa.int64())
                    if is_core_col
                    else pa.array(np.zeros(b.num_rows, np.int64))
                ),
                "cluster": (
                    b["root"].cast(pa.int64())
                    if is_core_col
                    else pa.array(np.full(b.num_rows, -1, np.int64))
                ),
            }
        )

    labeled = (
        hash_join(
            pts, compact_l, on=id_col, right_on="node",
            num_partitions=num_partitions,
        )
        .repartition(num_partitions)
        .map_batches(lambda b: norm(b, True), batch_format="pyarrow")
        .materialize()
    )
    noise = hash_anti_join(
        pts, compact_l, on=id_col, right_on="node",
        num_partitions=num_partitions,
    ).repartition(num_partitions).map_batches(
        lambda b: norm(b, False), batch_format="pyarrow"
    )
    return labeled.union(noise)


@ray.remote(num_cpus=0.5)
def _fold_label_table(*blocks):
    """Sorted (node, root, is_core) arrays from label blocks, worker-side."""
    # union sides that were empty materialize as schema-less blocks — skip
    blocks = [b for b in blocks if "node" in b.schema.names]
    node = np.concatenate(
        [b["node"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    root = np.concatenate(
        [b["root"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    isc = np.concatenate(
        [b["is_core"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    order = np.argsort(node, kind="stable")
    return node[order], root[order], isc[order]
