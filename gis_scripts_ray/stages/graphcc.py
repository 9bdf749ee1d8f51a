"""Distributed connected components over an edge table — the transitive-
closure step that turns near-dup PAIRS into duplicate CLUSTERS (the final
hop of every production dedup pipeline: LSH emits pairs, clustering decides
which single document survives). Reference analogy: the M3 segment-label
components of ``stages/components.py`` solve the same problem on a raster
grid with stripe merges; this stage solves it on an arbitrary pair graph.

Algorithm: iterative min-label propagation (hash-to-min). Every node starts
labeled with itself; each round, every edge offers each endpoint the other
endpoint's label, and each node keeps the minimum it has seen. The minimum
component id reaches every node in O(graph diameter) rounds — for dedup
clusters (near-cliques) that is 2-3 rounds; for the worst case (a chain)
it is the chain length, which is why ``max_iters`` is a defensive bound,
not the expected cost.

Scale shape per round: the label map reaches the edge table either by a
MEASURED-size broadcast (``ray.put`` of the sorted (node, label) arrays +
per-block searchsorted — the ``dedup.dedup_rows`` broadcast-with-fallback
house pattern; no join-aggregator spawn, which dominates at bench scale) or,
above ``broadcast_limit`` nodes, by ONE hash-join of the static
both-direction edge table against the current label table (labels
repartition-compacted first — the Ray 2.49 native-join empty-right-block
quirk, see ``dedup.dedup_rows``). Either way it is followed by ONE adaptive
combine (``coalesce_shuffle_agg``) that computes the new
per-node minimum AND recovers the previous label in the same pass (the old
label rides along as ``label * is_old``, summed — exactly one old row per
node, so the sum IS the old label). Convergence is detected by counting
nodes whose label changed (an exact integer count — labels only decrease,
and a global SUM of ids could overflow int64 at open-web scale, so we never
rely on one). Rows never materialize at the driver; per-round driver traffic
is a single count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _int64(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return a.cast(pa.int64()) if a.type != pa.int64() else a


@ray.remote(num_cpus=0.5)
def _build_label_map(*blocks):
    """Fold label blocks into one searchsorted-ready (nodes, labels) pair —
    runs as a Ray task so the map is built worker-side and lives in the
    object store; the driver only ever handles block refs."""
    node_np = np.concatenate(
        [b["node"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    lab_np = np.concatenate(
        [b["label"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    order = np.argsort(node_np, kind="stable")
    return node_np[order], lab_np[order]


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    max_iters: int = 64,
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Label every node with the minimum node id of its component.

    ``edges``: (a_col, b_col) int64 pairs (undirected; self-loops and
    duplicates are harmless). ``nodes``: optional (node_col) table adding
    isolated nodes — they label themselves. Returns (node, root), one row
    per node. Raises if ``max_iters`` rounds do not converge (a diameter
    larger than ``max_iters`` — raise the bound for pathological graphs).
    """
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.joins import hash_join

    def both_dirs(batch: pa.Table) -> pa.Table:
        a, b = _int64(batch[a_col]), _int64(batch[b_col])
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    e2 = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def endpoint_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"node": batch["src"], "label": batch["src"]})
        return t.group_by(["node"]).aggregate([("label", "min")]).rename_columns(
            ["node", "label"]
        )

    label_src = e2.map_batches(endpoint_partial, batch_format="pyarrow")
    if nodes is not None:

        def node_partial(batch: pa.Table) -> pa.Table:
            n = _int64(batch[node_col])
            t = pa.table({"node": n, "label": n})
            return (
                t.group_by(["node"])
                .aggregate([("label", "min")])
                .rename_columns(["node", "label"])
            )

        label_src = label_src.union(
            nodes.map_batches(node_partial, batch_format="pyarrow")
        )
    labels = coalesce_shuffle_agg(
        label_src, ["node"], {"label": "min"}
    ).materialize()

    def as_roots(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "root": b["label"]})

    if e2.count() == 0:
        return labels.map_batches(as_roots, batch_format="pyarrow")

    n_labels = labels.count()

    for _ in range(max_iters):
        if n_labels <= broadcast_limit:
            # measured-size fast path: build the sorted label map WORKER-
            # side (one Ray task over the materialized label blocks — the
            # driver handles only block refs, never rows; round-4 advice
            # flagged the previous per-round driver iter_batches) and look
            # labels up per edge block with searchsorted — no
            # join-aggregator spawn, which dominates at bench scale
            block_refs = [
                br
                for bundle in labels.iter_internal_ref_bundles()
                for br in bundle.block_refs
            ]
            map_ref = _build_label_map.remote(*block_refs)

            def bcast_msg_rows(batch: pa.Table, _ref=map_ref) -> pa.Table:
                from gis_scripts_ray.state.broadcast import worker_broadcast

                keys, labs = worker_broadcast(_ref)
                src = _int64(batch["src"]).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, src)
                t = pa.table(
                    {
                        "node": _int64(batch["dst"]),
                        "lab_min": pa.array(labs[pos]),
                        "lab_old": pa.array(
                            np.zeros(batch.num_rows, dtype=np.int64)
                        ),
                    }
                )
                return t.group_by(["node"]).aggregate(
                    [("lab_min", "min"), ("lab_old", "min")]
                ).rename_columns(["node", "lab_min", "lab_old"])

            msg_partials = e2.map_batches(bcast_msg_rows, batch_format="pyarrow")
        else:
            compact = labels.repartition(num_partitions)
            msgs = hash_join(
                e2, compact, on="src", right_on="node",
                num_partitions=num_partitions,
            )

            def msg_rows(batch: pa.Table) -> pa.Table:
                # each edge offers dst the src's current label; is_old = 0
                t = pa.table(
                    {
                        "node": _int64(batch["dst"]),
                        "lab_min": _int64(batch["label"]),
                        "lab_old": pa.array(
                            np.zeros(batch.num_rows, dtype=np.int64)
                        ),
                    }
                )
                return t.group_by(["node"]).aggregate(
                    [("lab_min", "min"), ("lab_old", "min")]
                ).rename_columns(["node", "lab_min", "lab_old"])

            msg_partials = msgs.map_batches(msg_rows, batch_format="pyarrow")

        def own_rows(batch: pa.Table) -> pa.Table:
            lab = _int64(batch["label"])
            return pa.table(
                {"node": _int64(batch["node"]), "lab_min": lab, "lab_old": lab}
            )

        cand = msg_partials.union(
            labels.map_batches(own_rows, batch_format="pyarrow")
        )
        # min over msgs+own = new label; exactly one own row per node, msgs
        # contribute 0 -> sum(lab_old) recovers the previous label exactly
        combined = coalesce_shuffle_agg(
            cand, ["node"], {"lab_min": "min", "lab_old": "sum"}
        ).materialize()

        changed = combined.map_batches(
            lambda b: pa.table(
                {
                    "c": pc.cast(
                        pc.less(b["lab_min"], b["lab_old"]), pa.int64()
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("c")

        labels = combined.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["lab_min"]}),
            batch_format="pyarrow",
        ).materialize()
        if not changed:
            return labels.map_batches(as_roots, batch_format="pyarrow")
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(graph diameter exceeds max_iters)"
    )
