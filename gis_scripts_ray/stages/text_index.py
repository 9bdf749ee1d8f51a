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
a persisted layout can never afford a version-dependent hash). The
AND-semantics finish is the standard distributed count-matches plan:
postings are unique (token, doc) by construction (one doc never spans
batches, per-batch dedup is global dedup), so matched-term counting is
an in-batch partial ``group_by`` + one adaptive combine, then
``count == n_terms``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# bump when the partition layout or hash scheme changes (see GEO_STORE_VERSION)
TEXT_INDEX_VERSION = 1


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
    """(token, doc_id, bucket) unique postings for a batch — vectorized
    split/explode via Arrow; md5 touches DISTINCT tokens only."""
    toks = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    flat = pc.list_flatten(toks)
    reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
        reps.astype(np.int64),
    )
    t = pa.table({"token": flat, "doc_id": pa.array(ids)})
    t = t.group_by(["token", "doc_id"]).aggregate([]).rename_columns(
        ["token", "doc_id"]
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

    def match_partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["token"], value_set=term_arr))
        t = pa.table(
            {
                "doc_id": hit["doc_id"],
                "n_hit": pa.array(np.ones(hit.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["doc_id"]).aggregate([("n_hit", "sum")]).rename_columns(
            ["doc_id", "n_hit"]
        )

    counts = coalesce_shuffle_agg(
        ds.map_batches(match_partial, batch_format="pyarrow"),
        ["doc_id"],
        {"n_hit": "sum"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["n_hit"], n_terms))
        return pa.table({"doc_id": keep["doc_id"].combine_chunks().cast(pa.int64())})

    return counts.map_batches(finish, batch_format="pyarrow")
