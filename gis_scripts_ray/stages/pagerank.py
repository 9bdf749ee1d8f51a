"""Distributed fixed-point PageRank over a host link graph — the classic
web-scale iterative computation (the reference's spatial pipelines have no
graph analog; this is a first-class LLM-corpus operator: rank hosts by link
structure to weight or filter a crawl, the same role PageRank plays in
production crawl schedulers).

Arithmetic is FIXED-POINT INTEGER on purpose: ranks are micro-units
(int64), the update is

    r_{k+1}(v) = jump + (damp * S_k(v)) // scale,
    S_k(v)     = sum over edges (u -> v) of  r_k(u) // outdeg(u)

with ``jump = scale - damp`` (teleport mass) — every operation is an exact
positive-int64 add/multiply/floor-divide, so the result is bit-identical
across engines (numpy ``//`` == DuckDB ``//`` on non-negatives; a float
PageRank could never be value-hash-twinned because cross-engine float SUM
order differs). Production would run the float variant; the recurrence,
delivery pattern, and convergence structure are identical. Nodes with no
out-edges simply contribute nothing (the standard "no dangling
redistribution" variant, implemented identically in the SQL twin).

Scale shape per iteration (the ``graphcc.connected_components`` house
pattern): the per-node quota map ``r // outdeg`` reaches the static edge
table either by a MEASURED-size worker-built broadcast (sorted-array
searchsorted per edge block — no join-aggregator spawn) or, above
``broadcast_limit`` nodes, by ONE hash join per round; contributions are
pre-summed per dst inside each batch (``Table.group_by``) and finished by
ONE adaptive combine (``coalesce_shuffle_agg``). The rank state is a
Dataset throughout — rows never materialize at the driver on the join
path; driver traffic per round is block refs only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


@ray.remote(num_cpus=0.5)
def _build_quota_map(*blocks):
    """Fold (node, quota) blocks into sorted searchsorted-ready arrays —
    worker-side, driver handles only refs (graphcc round-4 advice)."""
    nodes = np.concatenate(
        [b["node"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    quotas = np.concatenate(
        [b["quota"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    order = np.argsort(nodes, kind="stable")
    return nodes[order], quotas[order]


def pagerank_fixed_point(
    edges: ray.data.Dataset,
    n_nodes: int,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damp: int = 850_000,
    scale: int = 1_000_000,
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Rank nodes ``0..n_nodes-1`` by ``iters`` fixed-point power steps.

    ``edges``: (src_col, dst_col) int64 directed edges; parallel edges
    count multiply (a host linking twice sends two quota shares).
    Returns (node:int64, rank:int64) — one row per node in the universe,
    rank in micro-units starting from ``r0 = scale``.
    """
    if not 0 < damp < scale:
        raise ValueError("0 < damp < scale required")
    jump = scale - damp
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def ed(batch: pa.Table) -> pa.Table:
        s = batch[src_col].combine_chunks().cast(pa.int64())
        d = batch[dst_col].combine_chunks().cast(pa.int64())
        return pa.table({"src": s, "dst": d})

    e2 = edges.map_batches(ed, batch_format="pyarrow").materialize()

    # ---- out-degrees (multi-edge aware), completed over the universe ----
    def deg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "node": batch["src"],
                "deg": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["node"]).aggregate([("deg", "sum")])
            .rename_columns(["node", "deg"])
        )

    def universe_zero(batch) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(ids),
                "deg": pa.array(np.zeros(len(ids), dtype=np.int64)),
            }
        )

    universe = ray.data.range(n_nodes)
    deg = coalesce_shuffle_agg(
        e2.map_batches(deg_partial, batch_format="pyarrow").union(
            universe.map_batches(universe_zero, batch_format="pyarrow")
        ),
        ["node"],
        {"deg": "sum"},
    )

    # state: (node, rank, deg); r0 = scale everywhere
    state = deg.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "rank": pa.array(np.full(b.num_rows, scale, dtype=np.int64)),
                "deg": b["deg"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # quota rows: only nodes that emit mass (deg > 0)
        def quota_rows(batch: pa.Table) -> pa.Table:
            d = batch["deg"].to_numpy(zero_copy_only=False)
            keep = d > 0
            r = batch["rank"].to_numpy(zero_copy_only=False)[keep]
            return pa.table(
                {
                    "node": pa.array(
                        batch["node"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "quota": pa.array(r // d[keep]),
                }
            )

        quota = state.map_batches(quota_rows, batch_format="pyarrow")

        if n_nodes <= broadcast_limit:
            qm = quota.materialize()
            block_refs = [
                br
                for bundle in qm.iter_internal_ref_bundles()
                for br in bundle.block_refs
            ]
            map_ref = _build_quota_map.remote(*block_refs)

            def contrib_bcast(batch: pa.Table, _ref=map_ref) -> pa.Table:
                from gis_scripts_ray.state.broadcast import worker_broadcast

                keys, quotas = worker_broadcast(_ref)
                src = batch["src"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, src)
                # every src has deg >= 1, so it IS in the quota map
                t = pa.table(
                    {
                        "node": batch["dst"],
                        "s": pa.array(quotas[pos]),
                        "deg": pa.array(np.zeros(batch.num_rows, np.int64)),
                    }
                )
                return (
                    t.group_by(["node"])
                    .aggregate([("s", "sum"), ("deg", "sum")])
                    .rename_columns(["node", "s", "deg"])
                )

            msg_partials = e2.map_batches(contrib_bcast, batch_format="pyarrow")
        else:
            compact = quota.repartition(num_partitions)
            joined = hash_join(
                e2, compact, on="src", right_on="node",
                num_partitions=num_partitions,
            )

            def contrib_join(batch: pa.Table) -> pa.Table:
                t = pa.table(
                    {
                        "node": batch["dst"],
                        "s": batch["quota"],
                        "deg": pa.array(np.zeros(batch.num_rows, np.int64)),
                    }
                )
                return (
                    t.group_by(["node"])
                    .aggregate([("s", "sum"), ("deg", "sum")])
                    .rename_columns(["node", "s", "deg"])
                )

            msg_partials = joined.map_batches(contrib_join, batch_format="pyarrow")

        # state rows carry deg (exactly one per node; msgs carry deg 0 ->
        # sum recovers deg, the graphcc lab_old trick) and s = 0
        def state_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch["node"],
                    "s": pa.array(np.zeros(batch.num_rows, np.int64)),
                    "deg": batch["deg"],
                }
            )

        cand = msg_partials.union(
            state.map_batches(state_rows, batch_format="pyarrow")
        )
        summed = coalesce_shuffle_agg(cand, ["node"], {"s": "sum", "deg": "sum"})

        def apply_update(batch: pa.Table) -> pa.Table:
            s = batch["s"].to_numpy(zero_copy_only=False)
            # == jump + (damp*s)//scale, decomposed so no intermediate
            # exceeds damp*max(n_nodes, scale) — a hub's s is
            # indegree x rank and damp*s alone would wrap int64 around
            # indegree ~1e7; the twin's HUGEINT (damp*s)//scale is
            # mathematically identical on non-negatives
            rank = jump + damp * (s // scale) + (damp * (s % scale)) // scale
            return pa.table(
                {
                    "node": batch["node"],
                    "rank": pa.array(rank),
                    "deg": batch["deg"],
                }
            )

        state = summed.map_batches(apply_update, batch_format="pyarrow").materialize()

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "rank": b["rank"]}),
        batch_format="pyarrow",
    )
