"""Frequent-itemset pair mining (apriori, k=2) over document token
sets — "which terms co-occur in documents more than min-support times"
(topic co-occurrence, taxonomy seeds, contamination signatures).

The apriori property does the 100-TB work: a pair can only be frequent
if BOTH tokens are frequent, so pass 1 computes document frequencies
(distinct-per-doc — one in-block distinct + one adaptive combine; a
document's rows never split across blocks, so in-block per-doc distinct
is globally exact) and the pair expansion in pass 2 runs only over each
document's FREQUENT tokens — the candidate space is |F|², bounded by
(corpus_tokens / min_support)², not vocabulary². The frequent set is
delivered by measured broadcast (|F| <= total/min_support is small by
construction). Pair expansion is vectorized by grouping documents of
equal frequent-token count and applying one ``triu_indices`` per size
(sizes are bounded by per-doc distinct tokens, not corpus size).

Output: (w1, w2, support) for pairs with support >= min_support,
w1 < w2 canonical order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _doc_distinct(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc, w) distinct pairs of one block — exact globally because a
    document's row lives in exactly one block."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch[text_col], " ").combine_chunks()
    reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), reps)
    t = pa.table({"doc": pa.array(doc, pa.int64()), "w": toks.flatten()})
    out = t.group_by(["doc", "w"]).aggregate([([], "count_all")])
    return out.drop_columns(["count_all"])


def frequent_token_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    min_support: int,
) -> ray.data.Dataset:
    """Apriori k=2 over whitespace token sets; see module docstring."""
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.tile_agg import (
        cell_count,
        coalesce_shuffle_agg,
    )

    distinct = ds.map_batches(
        lambda b: _doc_distinct(b, id_col, text_col), batch_format="pyarrow"
    ).materialize()

    df = cell_count(distinct, ["w"], alias="df").materialize()
    freq = df.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], min_support)).select(
            ["w"]
        ),
        batch_format="pyarrow",
    )
    # the frequent set is O(corpus_tokens / min_support) by construction
    # — a driver list of that size is the broadcast payload, not data
    freq_ref = ray.put(
        pa.array(freq.to_pandas()["w"].to_numpy(), pa.string())
    )

    def pairs_partial(batch: pa.Table, _ref=freq_ref) -> pa.Table:
        from gis_scripts_ray.state.broadcast import worker_broadcast

        fset = worker_broadcast(_ref)
        f = batch.filter(pc.is_in(batch["w"], value_set=fset))
        if f.num_rows == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "support": pa.array([], pa.int64()),
                }
            )
        # sort by (doc, w) so each doc's tokens are contiguous + ordered
        f = f.sort_by([("doc", "ascending"), ("w", "ascending")])
        doc = f["doc"].to_numpy(zero_copy_only=False)
        w = f["w"].combine_chunks()
        new = np.empty(len(doc), dtype=bool)
        new[0] = True
        new[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(doc)]]))
        i_parts, j_parts = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            iu, ju = np.triu_indices(int(s), k=1)
            base = starts[sizes == s]
            i_parts.append((base[:, None] + iu[None, :]).ravel())
            j_parts.append((base[:, None] + ju[None, :]).ravel())
        if not i_parts:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "support": pa.array([], pa.int64()),
                }
            )
        ii = np.concatenate(i_parts)
        jj = np.concatenate(j_parts)
        t = pa.table(
            {
                "w1": w.take(pa.array(ii, pa.int64())),
                "w2": w.take(pa.array(jj, pa.int64())),
            }
        )
        out = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return out.rename_columns(["w1", "w2", "support"])

    counts = coalesce_shuffle_agg(
        distinct.map_batches(pairs_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        {"support": "sum"},
    )
    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["support"], min_support)),
        batch_format="pyarrow",
    )
