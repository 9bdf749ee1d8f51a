"""Distributed BFS shortest-hop depths over a directed edge table — the
crawl-frontier analysis of the web-corpus pipeline (how many hops from
the seed list is every reachable host?), and the graph-distance twin of
``stages/graphcc.py``'s component labeling.

Reference semantics: the reference walks download manifests breadth-
first from seed entries (``download_and_process.py``'s queue); here the
same contract runs as data-parallel rounds at corpus scale.

Shape per round (the graphcc delivery pattern): messages flow ONLY from
the FRONTIER — nodes first labeled last round — so per-round traffic is
the frontier-incident edge set, not the whole labeled set. Frontier
delivery is adaptive on its MEASURED size: at or below
``broadcast_limit`` the frontier's sorted node array is built
worker-side (one Ray task over the materialized block refs — no driver
rows) and each edge block filters by searchsorted membership; above the
limit it is ONE hash-join per round. New depths merge through ONE
adaptive combine (``coalesce_shuffle_agg``) that takes the min depth
AND recovers whether the node was already labeled in the same pass
(``own`` flag sum — exactly one own row per labeled node), so
"newly reached" is exact with no anti-join. Convergence is an exact
integer count of newly labeled nodes; rounds are O(eccentricity of the
seed set), each carrying one join (or broadcast filter) + one combine.

BFS invariant that makes ``min`` safe: a node labeled in an earlier
round always has depth < the current round's candidate depth, so the
combine can never lower an existing depth.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.graphcc import _build_label_map, _int64


def bfs_depths(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_rounds: int = 32,
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(node, depth) for every node reachable from ``seeds`` within
    ``max_rounds`` directed hops; unreached nodes are absent. Duplicate
    edges and seeds are harmless; depth caps at ``max_rounds`` (nodes
    further out are simply not labeled — callers bound the walk, the
    recursive-CTE twin bounds identically)."""
    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    e2 = edges.map_batches(
        lambda b: pa.table(
            {"src": _int64(b[src_col]), "dst": _int64(b[dst_col])}
        ),
        batch_format="pyarrow",
    ).materialize()

    def seed_partial(batch: pa.Table) -> pa.Table:
        n = _int64(batch[seed_col])
        t = pa.table(
            {"node": n, "dep": pa.array(np.zeros(len(n), dtype=np.int64))}
        )
        return (
            t.group_by(["node"])
            .aggregate([("dep", "min")])
            .rename_columns(["node", "dep"])
        )

    depths = coalesce_shuffle_agg(
        seeds.map_batches(seed_partial, batch_format="pyarrow"),
        ["node"],
        {"dep": "min"},
    ).materialize()
    frontier = depths
    n_frontier = frontier.count()

    for rnd in range(1, max_rounds + 1):
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_limit:
            block_refs = [
                br
                for bundle in frontier.map_batches(
                    lambda b: pa.table(
                        {"node": b["node"], "label": b["dep"]}
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
                .iter_internal_ref_bundles()
                for br in bundle.block_refs
            ]
            map_ref = _build_label_map.remote(*block_refs)

            def bcast_msgs(batch: pa.Table, _ref=map_ref, _d=rnd) -> pa.Table:
                from gis_scripts_ray.state.broadcast import worker_broadcast

                keys, _labs = worker_broadcast(_ref)
                src = _int64(batch["src"]).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, src)
                pos_c = np.minimum(pos, max(len(keys) - 1, 0))
                hit = (
                    (keys[pos_c] == src) & (pos < len(keys))
                    if len(keys)
                    else np.zeros(len(src), dtype=bool)
                )
                dst = _int64(batch["dst"]).to_numpy(zero_copy_only=False)[hit]
                t = pa.table(
                    {
                        "node": pa.array(dst),
                        "dep": pa.array(np.full(len(dst), _d, dtype=np.int64)),
                        "own": pa.array(np.zeros(len(dst), dtype=np.int64)),
                    }
                )
                return (
                    t.group_by(["node"])
                    .aggregate([("dep", "min"), ("own", "min")])
                    .rename_columns(["node", "dep", "own"])
                )

            msg_partials = e2.map_batches(bcast_msgs, batch_format="pyarrow")
        else:
            compact = frontier.repartition(num_partitions)
            joined = hash_join(
                e2,
                compact,
                on="src",
                right_on="node",
                num_partitions=num_partitions,
            )

            def join_msgs(batch: pa.Table, _d=rnd) -> pa.Table:
                t = pa.table(
                    {
                        "node": _int64(batch["dst"]),
                        "dep": pa.array(
                            np.full(batch.num_rows, _d, dtype=np.int64)
                        ),
                        "own": pa.array(
                            np.zeros(batch.num_rows, dtype=np.int64)
                        ),
                    }
                )
                return (
                    t.group_by(["node"])
                    .aggregate([("dep", "min"), ("own", "min")])
                    .rename_columns(["node", "dep", "own"])
                )

            msg_partials = joined.map_batches(join_msgs, batch_format="pyarrow")

        def own_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch["node"],
                    "dep": batch["dep"],
                    "own": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                }
            )

        combined = coalesce_shuffle_agg(
            msg_partials.union(
                depths.map_batches(own_rows, batch_format="pyarrow")
            ),
            ["node"],
            {"dep": "min", "own": "sum"},
        ).materialize()

        def new_only(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            f = b.filter(pc.equal(b["own"], 0))
            return pa.table({"node": f["node"], "dep": f["dep"]})

        frontier = combined.map_batches(
            new_only, batch_format="pyarrow"
        ).materialize()
        n_frontier = frontier.count()
        depths = combined.map_batches(
            lambda b: pa.table({"node": b["node"], "dep": b["dep"]}),
            batch_format="pyarrow",
        ).materialize()

    return depths.map_batches(
        lambda b: pa.table({"node": b["node"], "depth": b["dep"]}),
        batch_format="pyarrow",
    )
