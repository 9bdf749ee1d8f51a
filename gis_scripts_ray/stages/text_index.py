"""Token-bucket partitioned inverted text index + file-pruned term search.

The text analog of ``stages/spatial_store.py`` (reference precedent:
windowed reads clip storage to the query in
``Clip_Rasters_By_Extent.py:17-36``; the ANN index proves the same
file-set pruning for embedding buckets at
``similarity.partition_paths_for_buckets``): postings (token, doc_id)
are written PARTITIONED BY TOKEN HASH BUCKET (one directory per bucket,
atomic resumable manifest), and a term query reads ONLY the buckets its
terms hash into — at 100 TB a 3-term AND scans ~3/n_buckets of the
index, never the corpus.

Bucket assignment hashes each DISTINCT token once per batch
(``dictionary_encode`` — the minhash distinct-text-signing house
pattern) through md5 (stable across numpy/python/platform versions —
a persisted layout can never afford a version-dependent hash). Postings
are POSITIONAL since v2 (one row per occurrence, ``pos`` 1-based), which
buys phrase search: a phrase slot k over term t_k maps each matching
occurrence to its candidate phrase START ``pos - k``; a (doc, start)
holding ALL len(phrase) slots is a phrase occurrence — pure additive
counting, so in-batch partials + one adaptive combine stay exact no
matter how read batches split the files. The AND query first compacts
to distinct (doc, token) pairs (occurrence rows are no longer unique per
pair) with the same combine machinery, then counts matched terms.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# bump when the partition layout or hash scheme changes (see GEO_STORE_VERSION)
# v2: postings carry 1-based token POSITIONS (phrase search; one row per
# occurrence, no longer deduped per (token, doc))
TEXT_INDEX_VERSION = 2


def token_bucket(tokens: "list[str]", n_buckets: int) -> np.ndarray:
    """Stable bucket id per token: first 8 md5 bytes mod n_buckets."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            % n_buckets
            for t in tokens
        ],
        dtype=np.int64,
    )


def postings_rows(
    batch: pa.Table, text_col: str, id_col: str, n_buckets: int
) -> pa.Table:
    """(token, doc_id, pos, bucket) POSITIONAL postings for a batch —
    one row per token occurrence, ``pos`` 1-based (matches the SQL twin's
    ``w[i]`` indexing); vectorized split/explode via Arrow; md5 touches
    DISTINCT tokens only (the dictionary-encode house pattern)."""
    toks = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    flat = pc.list_flatten(toks)
    reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64), reps
    )
    total = int(reps.sum())
    # 1-based position within each doc: global arange minus doc starts
    starts = np.repeat(np.cumsum(reps) - reps, reps)
    pos = np.arange(total, dtype=np.int64) - starts + 1
    t = pa.table(
        {"token": flat, "doc_id": pa.array(ids), "pos": pa.array(pos)}
    )
    dic = t["token"].combine_chunks().dictionary_encode()
    buckets = token_bucket(dic.dictionary.to_pylist(), n_buckets)
    return t.append_column(
        "bucket", pa.array(buckets[dic.indices.to_numpy(zero_copy_only=False)])
    )


def write_token_index(
    ds: ray.data.Dataset,
    out_dir: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    lineage: str = "text-index",
):
    """Build the inverted index via the resumable checkpoint sink —
    crash-safe, idempotent; a re-run drops rows of completed buckets
    before the shuffle (resume fast path)."""
    from gis_scripts_ray.state.checkpoint import write_partitioned_resumable

    def explode(batch: pa.Table) -> pa.Table:
        return postings_rows(batch, text_col, id_col, n_buckets)

    postings = ds.map_batches(explode, batch_format="pyarrow")

    def part_fn(batch: pa.Table) -> pa.Array:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        return pa.array(np.char.add("b", b.astype("U11")), pa.string())

    return write_partitioned_resumable(postings, out_dir, part_fn, lineage=lineage)


def partition_paths_for_terms(
    out_dir: str, terms: "list[str]", n_buckets: int
) -> "list[str]":
    """The parquet files a term query must read: the terms' buckets ∩
    COMPLETED partitions (factored out so tests assert the pruned set)."""
    from gis_scripts_ray.state.checkpoint import Manifest

    man = Manifest(out_dir)
    done = man.completed()
    want = {f"b{b}" for b in token_bucket(list(terms), n_buckets)}
    return [
        os.path.join(man.partition_dir(k), "data.parquet")
        for k in sorted(done)
        if k in want
    ]


def term_and_query(
    out_dir: str,
    terms: "list[str]",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """doc_ids containing ALL ``terms`` (AND), reading only the terms'
    bucket partitions. Returns (doc_id:int64), identical rows to a
    full-corpus tokenize+filter (tested)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    terms = list(dict.fromkeys(terms))  # dedupe, preserve order
    if not terms:
        raise ValueError("term_and_query needs at least one term")
    paths = partition_paths_for_terms(out_dir, terms, n_buckets)
    if not paths:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64())})
        )
    n_terms = len(terms)
    term_arr = pa.array(terms, pa.string())
    ds = ray.data.read_parquet(paths, columns=["token", "doc_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        t = pa.table(
            {
                "doc_id": hit["doc_id"],
                "token": hit["token"],
                "one": pa.array(np.ones(hit.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["doc_id", "token"]).aggregate([("one", "min")]).rename_columns(
            ["doc_id", "token", "one"]
        )

    # positional postings repeat (doc, token) per occurrence AND one
    # pair's rows can straddle read batches — compact to globally
    # distinct pairs first (min is idempotent), then count terms per doc
    pairs = coalesce_shuffle_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["doc_id", "token"],
        {"one": "min"},
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": batch["doc_id"], "n_hit": batch["one"]})
        return t.group_by(["doc_id"]).aggregate([("n_hit", "sum")]).rename_columns(
            ["doc_id", "n_hit"]
        )

    counts = coalesce_shuffle_agg(
        pairs.map_batches(count_partial, batch_format="pyarrow"),
        ["doc_id"],
        {"n_hit": "sum"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["n_hit"], n_terms))
        return pa.table({"doc_id": keep["doc_id"].combine_chunks().cast(pa.int64())})

    return counts.map_batches(finish, batch_format="pyarrow")


def term_or_topk(
    out_dir: str,
    terms: "list[str]",
    k: int = 10,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Ranked OR retrieval: the top ``k`` docs matching ANY of ``terms``,
    ranked by (matched distinct terms DESC, doc_id ASC) — the
    deterministic tie rule every top-k path in this engine uses. Reads
    only the terms' bucket partitions; the match-count table folds
    through the distributed per-group top-k machinery (constant group),
    never a global sort. Returns (doc_id:int64, n_matched:int64)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.stages.topk import topk_per_group

    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("term_or_topk needs at least one term")
    paths = partition_paths_for_terms(out_dir, terms, n_buckets)
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                }
            )
        )
    term_arr = pa.array(terms, pa.string())
    ds = ray.data.read_parquet(paths, columns=["token", "doc_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        t = pa.table(
            {
                "doc_id": hit["doc_id"],
                "token": hit["token"],
                "one": pa.array(np.ones(hit.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["doc_id", "token"])
            .aggregate([("one", "min")])
            .rename_columns(["doc_id", "token", "one"])
        )

    pairs = coalesce_shuffle_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["doc_id", "token"],
        {"one": "min"},
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_matched": batch["one"],
                "_g": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )
        return (
            t.group_by(["doc_id", "_g"])
            .aggregate([("n_matched", "sum")])
            .rename_columns(["doc_id", "_g", "n_matched"])
        )

    counts = coalesce_shuffle_agg(
        pairs.map_batches(count_partial, batch_format="pyarrow"),
        ["doc_id", "_g"],
        {"n_matched": "sum"},
    )
    top = topk_per_group(counts, "_g", "n_matched", "doc_id", k)
    return top.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "n_matched": b["n_matched"],
            }
        ),
        batch_format="pyarrow",
    )


def phrase_query(
    out_dir: str,
    phrase: "list[str]",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact phrase search over the positional index: docs containing the
    consecutive token sequence ``phrase``, with occurrence counts.

    Plan: read ONLY the phrase terms' bucket partitions; slot k of the
    phrase maps every occurrence of term_k at position p to candidate
    start ``p - k`` (one output row per matching slot — a repeated term
    in the phrase fans out once per slot, handling phrases like
    ``a b a``); a (doc, start) with all ``len(phrase)`` slot rows is an
    occurrence (counts are purely additive — read-batch splits cannot
    break them); occurrences then count per doc. Returns
    (doc_id:int64, n_occurrences:int64), rows only for docs with >= 1
    occurrence."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    if not phrase:
        raise ValueError("phrase_query needs at least one term")
    k_of: dict[str, list[int]] = {}
    for k, t in enumerate(phrase):
        k_of.setdefault(t, []).append(k)
    n_slots = len(phrase)
    paths = partition_paths_for_terms(out_dir, list(k_of), n_buckets)
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        )
    term_arr = pa.array(list(k_of), pa.string())
    ds = ray.data.read_parquet(paths, columns=["token", "doc_id", "pos"])

    def slot_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        tok_arr = hit["token"].combine_chunks()
        doc = hit["doc_id"].to_numpy(zero_copy_only=False)
        pos = hit["pos"].to_numpy(zero_copy_only=False)
        docs_out, starts, slots = [], [], []
        for k, t in enumerate(phrase):
            m = pc.equal(tok_arr, t).to_numpy(zero_copy_only=False)
            m = np.asarray(m, dtype=bool)
            if not m.any():
                continue
            s = pos[m] - k
            ok = s >= 1
            docs_out.append(doc[m][ok])
            starts.append(s[ok])
            slots.append(np.full(int(ok.sum()), 1, dtype=np.int64))
        if not docs_out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "n_slots": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "doc_id": pa.array(np.concatenate(docs_out)),
                "start": pa.array(np.concatenate(starts)),
                "n_slots": pa.array(np.concatenate(slots)),
            }
        )
        return (
            t.group_by(["doc_id", "start"])
            .aggregate([("n_slots", "sum")])
            .rename_columns(["doc_id", "start", "n_slots"])
        )

    cand = coalesce_shuffle_agg(
        ds.map_batches(slot_partial, batch_format="pyarrow"),
        ["doc_id", "start"],
        {"n_slots": "sum"},
    )

    def occ_partial(batch: pa.Table) -> pa.Table:
        occ = batch.filter(pc.equal(batch["n_slots"], n_slots))
        t = pa.table(
            {
                "doc_id": occ["doc_id"],
                "n_occurrences": pa.array(np.ones(occ.num_rows, np.int64)),
            }
        )
        return (
            t.group_by(["doc_id"])
            .aggregate([("n_occurrences", "sum")])
            .rename_columns(["doc_id", "n_occurrences"])
        )

    return coalesce_shuffle_agg(
        cand.map_batches(occ_partial, batch_format="pyarrow"),
        ["doc_id"],
        {"n_occurrences": "sum"},
    )
