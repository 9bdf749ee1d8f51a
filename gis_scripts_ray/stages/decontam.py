"""Benchmark decontamination — flag corpus documents sharing any word
n-gram with a benchmark/eval set (the standard training-data hygiene
step before an LLM pretraining run; composition of the engine's
shingle-hash, distinct-compaction and adaptive-delivery machinery).

Shape, 100-TB-first:

1. the BENCHMARK side (small by definition — eval sets are thousands of
   docs) reduces to its distinct n-gram hash set via per-block unique
   partials + adaptive combine (the all-to-all carries each block's
   distinct hashes once, never text);
2. the CORPUS side streams once: per-batch vectorized n-gram hashing
   (``dedup._batch_shingle_hashes`` — polars word hashes + numpy
   polynomial rolling, no per-row Python), windows of docs shorter than
   ``n`` words dropped (a short doc generates NO n-grams — the same
   semantics as SQL ``generate_series(1, len - n + 1)``), unique
   (doc, hash) pairs per batch (docs never span batches, so per-batch
   unique is globally unique);
3. adaptive membership delivery, the ``hash_anti_join`` decision: hash
   set <= ``broadcast_limit`` -> broadcast ``is_in`` filter inside the
   fused corpus pass (no shuffle of either side), else a semi
   hash-join against the compacted hash table;
4. hit counts per doc via in-batch partial + adaptive combine.

Matching is on the 64-bit rolling n-gram hash: two docs share a hash
iff they share the word n-gram, up to hash collisions (~1e-9 at 1e9
distinct n-grams x 1e5 benchmark n-grams; the upgrade path is the
second independent hash lane ``dedup.content_hash_cols`` uses for
exact dedup). The SQL oracle twin matches n-gram STRINGS — equal
strings <=> equal word sequences (words cannot contain the join
space) <=> equal hashes.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.dedup import _batch_shingle_hashes


def doc_ngram_hashes(
    batch: pa.Table, text_col: str, id_col: str, n: int
) -> pa.Table:
    """Distinct (id, h) word-n-gram hash pairs for one batch; docs with
    fewer than ``n`` words contribute nothing."""
    texts = batch[text_col]
    s = pl.from_arrow(
        texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    )
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    lens = s.fill_null("").str.split(" ").list.len().to_numpy().astype(np.int64)
    acc, win_off = _batch_shingle_hashes(texts, n)
    win_per_doc = np.diff(win_off)
    doc_of_win = np.repeat(np.arange(len(lens), dtype=np.int64), win_per_doc)
    keep = lens[doc_of_win] >= n  # padded single windows of short docs drop
    ids = batch[id_col].to_numpy().astype(np.int64)[doc_of_win[keep]]
    hs = acc[keep].astype(np.int64)  # reinterpret uint64 bits as int64
    # per-batch distinct (id, h); ids are batch-local so this is global
    packed = np.stack([ids, hs])
    _, first = np.unique(packed, axis=1, return_index=True)
    first = np.sort(first)
    return pa.table(
        {
            id_col: pa.array(ids[first], pa.int64()),
            "h": pa.array(hs[first], pa.int64()),
        }
    )


def ngram_hash_row(text: str, n: int) -> "list[int]":
    """Per-row reference for :func:`doc_ngram_hashes` (parity contract):
    distinct n-gram hashes of one document, [] when shorter than n."""
    from gis_scripts_ray.stages.dedup import _word_hashes

    words = (text or "").split(" ")
    if len(words) < n:
        return []
    out = []
    for i in range(len(words) - n + 1):
        wh = _word_hashes(words[i : i + n])
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for k in range(n):
                acc = acc * np.uint64(1099511628211) + wh[k]
        out.append(int(acc.astype(np.int64)))
    return sorted(set(out))


def decontaminate_hits(
    corpus: ray.data.Dataset,
    bench: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(id, n_hits) per corpus doc sharing >= 1 word n-gram with the
    benchmark set; n_hits = distinct shared n-grams. See module doc."""
    import ray as _ray

    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum
    from gis_scripts_ray.state.broadcast import worker_broadcast

    def bench_partial(batch: pa.Table) -> pa.Table:
        t = doc_ngram_hashes(batch, text_col, id_col, n)
        out = t.select(["h"]).group_by(["h"]).aggregate([("h", "count")])
        return out.rename_columns(["h", "_n"])

    bench_hashes = (
        coalesce_shuffle_sum(
            bench.map_batches(bench_partial, batch_format="pyarrow"), ["h"], ["_n"]
        )
        .select_columns(["h"])
        .materialize()
    )
    n_bench = bench_hashes.count()

    def corpus_pairs(batch: pa.Table) -> pa.Table:
        return doc_ngram_hashes(batch, text_col, id_col, n)

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
    )
    if n_bench == 0:
        return ray.data.from_arrow(empty)

    if n_bench <= broadcast_limit:
        keyset = pa.concat_arrays(
            chunk
            for b in bench_hashes.iter_batches(batch_format="pyarrow")
            for chunk in b["h"].chunks
        )
        ref = _ray.put(keyset)

        def fused_hits(batch: pa.Table) -> pa.Table:
            # ngram + membership + per-doc partial count in ONE task
            import pyarrow.compute as pc

            ks = worker_broadcast(ref)
            pairs = doc_ngram_hashes(batch, text_col, id_col, n)
            hit = pairs.filter(pc.is_in(pairs["h"], value_set=ks))
            out = (
                hit.select([id_col])
                .group_by([id_col])
                .aggregate([(id_col, "count")])
            )
            return out.rename_columns([id_col, "n_hits"])

        partials = corpus.map_batches(fused_hits, batch_format="pyarrow")
        return coalesce_shuffle_sum(partials, [id_col], ["n_hits"])

    # large benchmark: semi hash-join pairs against the compacted hash set
    bench_hashes = bench_hashes.repartition(max(1, -(-n_bench // 4_000_000)))
    pairs = corpus.map_batches(corpus_pairs, batch_format="pyarrow")
    matched = hash_join(
        pairs, bench_hashes, on="h", num_partitions=num_partitions
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select([id_col]).group_by([id_col]).aggregate([(id_col, "count")])
        )
        return out.rename_columns([id_col, "n_hits"])

    partials = matched.map_batches(count_partial, batch_format="pyarrow")
    return coalesce_shuffle_sum(partials, [id_col], ["n_hits"])
