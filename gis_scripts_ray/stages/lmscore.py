"""Corpus-LM quality scoring: per-doc mean bigram conditional probability.

The production shape this models is CCNet-style model-based quality
filtering (a KenLM n-gram model scores each document; low-probability =
gibberish / boilerplate / OCR noise). A float log-perplexity can never be
value-hash twinned across engines (FP sum order), so the score is the
FIXED-POINT conditional probability mass: for every bigram occurrence
(w1, w2) in a doc,

    p_micro = (scale * c2(w1, w2)) // c1(w1)

with c2 = corpus bigram count and c1(w1) = Σ_w2 c2(w1, w2) (occurrences
of w1 as a bigram head — a proper conditional denominator), summed per
doc alongside the bigram count. Every operation is an exact positive-
int64 multiply/floor-divide; `scale * c2` fits int64 while c2 < 9.2e12
(a single bigram repeated ~10^13 times — beyond any real corpus; the
SQL twin's BIGINT would error, not wrap, long before).

Scale shape (the TF-IDF / decontam house pattern): ONE corpus pass
produces per-block bigram partials, ONE adaptive combine
(``coalesce_shuffle_agg``) builds the stats table (unbounded key space —
never a driver dict by default), and delivery back to the scoring pass
is adaptive: a MEASURED stats table under ``broadcast_limit`` rows
becomes a worker-built sorted-array map (searchsorted per batch, no
join-aggregator spawn); above it, the exploded bigrams hash-join the
stats table — with a ``materialize()`` between the two joins (the Ray
2.49 two-JoinOperators-one-plan deadlock, see CLAUDE.md).

Tokenization is the house single-space split (``string_split(text, ' ')``
twin); tokens cannot contain spaces, so the packed key ``w1 + ' ' + w2``
is collision-free and SQL-expressible as ``w1 || ' ' || w2``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _doc_bigrams(
    batch: pa.Table, text_col: str
) -> "tuple[pa.Array, pa.Array, np.ndarray]":
    """Vectorized per-doc bigram explode: returns (w1, w2, doc_row_index).

    Docs never span batches, so per-batch explode is globally correct.
    """
    toks = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    flat = pc.list_flatten(toks).combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    # positions that start a bigram: all except each doc's last token
    keep = np.ones(total, dtype=bool)
    ends = np.cumsum(lens)
    keep[ends[lens > 0] - 1] = False
    idx = np.flatnonzero(keep)
    w1 = flat.take(pa.array(idx))
    w2 = flat.take(pa.array(idx + 1))
    row_of = np.repeat(np.arange(len(lens)), lens)[idx]
    return w1, w2, row_of


def bigram_count_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-block partial (bg, n) bigram counts, bg = 'w1 w2'."""
    w1, w2, _ = _doc_bigrams(batch, text_col)
    bg = pc.binary_join_element_wise(w1, w2, " ")
    t = pa.table(
        {"bg": bg, "n": pa.array(np.ones(len(bg), dtype=np.int64))}
    )
    return t.group_by(["bg"]).aggregate([("n", "sum")]).rename_columns(["bg", "n"])


@ray.remote(num_cpus=0.5)
def _build_stats_maps(*blocks):
    """Fold (bg, n) blocks into TWO sorted lookup maps — (bg_keys, c2)
    and (w1_keys, c1) — worker-side; the driver handles only refs."""
    bgs = np.concatenate(
        [b["bg"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=object)]
    )
    ns = np.concatenate(
        [b["n"].to_numpy(zero_copy_only=False) for b in blocks]
        or [np.array([], dtype=np.int64)]
    )
    bgs = bgs.astype("U")
    order = np.argsort(bgs, kind="stable")
    bgs, ns = bgs[order], ns[order]
    # head token = substring before the FIRST space (tokens are space-free)
    heads = np.array([s.split(" ", 1)[0] for s in bgs], dtype="U")
    horder = np.argsort(heads, kind="stable")
    hsorted = heads[horder]
    hns = ns[horder]
    uniq, start = np.unique(hsorted, return_index=True)
    c1 = np.add.reduceat(hns, start) if len(hns) else np.array([], np.int64)
    return bgs, ns, uniq, c1


def lm_bigram_scores(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: "list[str] | None" = None,
    scale: int = 1_000_000,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """One row per doc WITH >= 1 bigram: (id_col, carry..., n_bigrams,
    p_sum_micro). ``p_sum_micro / (scale * n_bigrams)`` is the doc's mean
    bigram conditional probability — the quality score a filter
    thresholds on."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    carry_cols = carry_cols or []
    stats = coalesce_shuffle_agg(
        ds.map_batches(
            bigram_count_partials,
            fn_kwargs={"text_col": text_col},
            batch_format="pyarrow",
        ),
        ["bg"],
        {"n": "sum"},
    ).materialize()
    n_stats = stats.count()

    if n_stats <= broadcast_limit:
        block_refs = [
            br
            for bundle in stats.iter_internal_ref_bundles()
            for br in bundle.block_refs
        ]
        maps_ref = _build_stats_maps.remote(*block_refs)

        def score_bcast(batch: pa.Table, _ref=maps_ref) -> pa.Table:
            from gis_scripts_ray.state.broadcast import worker_broadcast

            bg_keys, c2s, w1_keys, c1s = worker_broadcast(_ref)
            w1, w2, row_of = _doc_bigrams(batch, text_col)
            bg = pc.binary_join_element_wise(w1, w2, " ").to_numpy(
                zero_copy_only=False
            ).astype("U")
            w1_np = w1.to_numpy(zero_copy_only=False).astype("U")
            # every doc bigram is in the corpus stats by construction
            c2 = c2s[np.searchsorted(bg_keys, bg)]
            c1 = c1s[np.searchsorted(w1_keys, w1_np)]
            p = (scale * c2) // c1
            t = pa.table(
                {
                    "_row": pa.array(row_of),
                    "n_bigrams": pa.array(np.ones(len(p), np.int64)),
                    "p_sum_micro": pa.array(p),
                }
            )
            g = (
                t.group_by(["_row"])
                .aggregate([("n_bigrams", "sum"), ("p_sum_micro", "sum")])
                .rename_columns(["_row", "n_bigrams", "p_sum_micro"])
            )
            take = g["_row"].combine_chunks()
            cols = {id_col: batch[id_col].take(take)}
            for c in carry_cols:
                cols[c] = batch[c].take(take)
            cols["n_bigrams"] = g["n_bigrams"]
            cols["p_sum_micro"] = g["p_sum_micro"]
            return pa.table(cols)

        return ds.map_batches(score_bcast, batch_format="pyarrow")

    # ---- join fallback: explode docs' bigrams, two sized hash-joins ----
    from gis_scripts_ray.stages.joins import hash_join

    def explode(batch: pa.Table) -> pa.Table:
        w1, w2, row_of = _doc_bigrams(batch, text_col)
        bg = pc.binary_join_element_wise(w1, w2, " ")
        cols = {
            id_col: batch[id_col].take(pa.array(row_of)),
            "bg": bg,
            "w1": w1,
        }
        for c in carry_cols:
            cols[c] = batch[c].take(pa.array(row_of))
        return pa.table(cols)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    # c1 table derived from the stats table (head = before first space)
    def head_partial(batch: pa.Table) -> pa.Table:
        w1 = pc.split_pattern(batch["bg"], " ", max_splits=1)
        t = pa.table(
            {
                "w1": pc.list_element(w1, 0),
                "c1": batch["n"],
            }
        )
        return t.group_by(["w1"]).aggregate([("c1", "sum")]).rename_columns(
            ["w1", "c1"]
        )

    c1_tab = coalesce_shuffle_agg(
        stats.map_batches(head_partial, batch_format="pyarrow"),
        ["w1"],
        {"c1": "sum"},
    ).repartition(num_partitions)
    stats_c = stats.map_batches(
        lambda b: pa.table({"bg": b["bg"], "c2": b["n"]}),
        batch_format="pyarrow",
    ).repartition(num_partitions)
    j1 = hash_join(
        exploded, stats_c, on="bg", num_partitions=num_partitions
    ).materialize()  # ONE JoinOperator per execution (deadlock rule)
    j2 = hash_join(j1, c1_tab, on="w1", num_partitions=num_partitions)

    def score_rows(batch: pa.Table) -> pa.Table:
        c2 = batch["c2"].to_numpy(zero_copy_only=False)
        c1 = batch["c1"].to_numpy(zero_copy_only=False)
        p = (scale * c2) // c1
        keys = [id_col] + list(carry_cols)
        t = pa.table(
            {
                **{k: batch[k] for k in keys},
                "n_bigrams": pa.array(np.ones(len(p), np.int64)),
                "p_sum_micro": pa.array(p),
            }
        )
        return (
            t.group_by(keys)
            .aggregate([("n_bigrams", "sum"), ("p_sum_micro", "sum")])
            .rename_columns(keys + ["n_bigrams", "p_sum_micro"])
        )

    return coalesce_shuffle_agg(
        j2.map_batches(score_rows, batch_format="pyarrow"),
        [id_col] + list(carry_cols),
        {"n_bigrams": "sum", "p_sum_micro": "sum"},
    )
