"""Duplicated-substring removal — the ExactSubstr training-data dedup
shape (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better"): remove from every document the token extents covered
by any word n-gram that occurs MORE THAN ONCE in the corpus (across
documents or within one). Line-granular global dedup lives in
``stages/spandedup.py`` (the C4 shape); this is the token-granular
generalization that catches boilerplate fragments embedded mid-line.

Shape, 100-TB-first (the ``decontam``/``spandedup`` composition):

1. COUNT pass: one corpus stream computing per-batch n-gram hash
   occurrence counts (``dedup._batch_shingle_hashes`` — polars word
   hashes + numpy polynomial rolling, no per-row Python), partials
   combined by ``coalesce_shuffle_agg``; hashes with total count > 1
   are the duplicated set (a COMPACTED aggregate — the all-to-all
   carries per-batch distinct hashes, never text).
2. REWRITE pass, adaptive delivery (the ``hash_anti_join`` decision):
   * duplicated set <= ``broadcast_limit``: broadcast once and rewrite
     inside ONE fused ``map_batches`` — window membership via ``is_in``,
     token coverage via a vectorized difference-array cumsum, text
     reassembly in polars (explode -> filter -> group join);
   * else: the window stream inner-joins the compacted duplicated-hash
     table (only DUPLICATED windows survive the shuffle), per-doc
     covered-position blobs fold via ``map_groups``, and
     ``bucketed_join`` (Arrow-position gather — binary payloads safe)
     delivers them back onto the docs; untouched docs bypass via an
     anti-join on the blob table's doc ids. The blob table is a
     compacted aggregate (<= one row per doc WITH duplicates).

Both paths are bit-identical (forced-low-limit equivalence test).
Tokenization is ``split(' ')`` — single space, empty tokens kept —
matching DuckDB ``string_split(text, ' ')`` exactly, so the SQL twin
matches n-gram STRINGS (equal strings <=> equal hashes, the decontam
collision argument).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data

from gis_scripts_ray.stages.dedup import _batch_shingle_hashes


def _batch_windows(batch: pa.Table, text_col: str, n: int):
    """Per-batch window geometry: (lens, tok_off, doc_of_win, pos,
    valid, acc) — acc is the uint64-bits-as-int64 hash of each window,
    valid masks out the padded single windows of docs shorter than n."""
    texts = batch[text_col]
    s = pl.from_arrow(
        texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    )
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    s = s.fill_null("")
    lens = s.str.split(" ").list.len().to_numpy().astype(np.int64)
    acc, win_off = _batch_shingle_hashes(texts, n)
    win_per_doc = np.diff(win_off)
    doc_of_win = np.repeat(np.arange(len(lens), dtype=np.int64), win_per_doc)
    pos = np.arange(len(acc), dtype=np.int64) - win_off[doc_of_win]
    valid = lens[doc_of_win] >= n
    tok_off = np.concatenate([[0], np.cumsum(lens)])
    return s, lens, tok_off, doc_of_win, pos, valid, acc.astype(np.int64)


def _rebuild_texts(
    s: "pl.Series", lens: np.ndarray, tok_off: np.ndarray, covered: np.ndarray
) -> "list[str]":
    """Reassemble per-doc text from the flat token keep-mask (polars
    explode -> filter -> ordered group join; no per-row Python)."""
    toks = s.str.split(" ")
    flat = toks.explode()
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    df = pl.DataFrame(
        {
            "row": rows,
            "tok": flat,
            "keep": ~covered,
        }
    )
    agg = (
        df.filter(pl.col("keep"))
        .group_by("row", maintain_order=True)
        .agg(pl.col("tok").str.join(" ").alias("t2"))
    )
    out = [""] * len(lens)
    for r, t in zip(agg["row"].to_list(), agg["t2"].to_list()):
        out[r] = t
    return out


def _covered_from_starts(
    tok_off: np.ndarray, starts: np.ndarray, n: int
) -> np.ndarray:
    """Flat token coverage mask from duplicated-window start indices
    (difference array + cumsum — O(tokens), not O(windows x n))."""
    cover = np.zeros(tok_off[-1] + 1, np.int64)
    np.add.at(cover, starts, 1)
    np.add.at(cover, starts + n, -1)
    return np.cumsum(cover[:-1]) > 0


def substr_dedup_rows(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(id, dedup_text) for every document: tokens covered by any
    corpus-duplicated word n-gram removed, the rest rejoined with
    single spaces. See module doc for the two delivery plans."""
    import ray as _ray

    from gis_scripts_ray.stages.joins import bucketed_join, hash_anti_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum
    from gis_scripts_ray.state.broadcast import worker_broadcast

    docs = docs.materialize()  # scanned by both passes

    def count_partial(batch: pa.Table) -> pa.Table:
        _s, _l, _t, _d, _p, valid, acc = _batch_windows(batch, text_col, n)
        h = acc[valid]
        t = pa.table({"h": pa.array(h, pa.int64())})
        out = t.group_by(["h"]).aggregate([("h", "count")])
        return out.rename_columns(["h", "_n"])

    counts = coalesce_shuffle_sum(
        docs.map_batches(count_partial, batch_format="pyarrow"), ["h"], ["_n"]
    )
    import pyarrow.compute as pc

    dup = (
        counts.map_batches(
            lambda b: b.filter(pc.greater(b["_n"], 1)), batch_format="pyarrow"
        )
        .select_columns(["h"])
        .materialize()
    )
    n_dup = dup.count()

    def identity_text(batch: pa.Table) -> pa.Table:
        # join(split(t, ' '), ' ') == t for single-space splits, so an
        # untouched doc passes through verbatim (nulls normalize to "")
        return pa.table(
            {
                id_col: batch[id_col],
                "dedup_text": pc.fill_null(
                    pc.cast(batch[text_col], pa.string()), ""
                ),
            }
        )

    if n_dup == 0:
        return docs.map_batches(identity_text, batch_format="pyarrow")

    if n_dup <= broadcast_limit:
        keyset = pa.concat_arrays(
            chunk
            for b in dup.iter_batches(batch_format="pyarrow")
            for chunk in b["h"].chunks
        )
        ref = _ray.put(keyset)

        def fused_rewrite(batch: pa.Table) -> pa.Table:
            ks = worker_broadcast(ref)
            s, lens, tok_off, doc_of_win, pos, valid, acc = _batch_windows(
                batch, text_col, n
            )
            member = pc.is_in(pa.array(acc, pa.int64()), value_set=ks).to_numpy(
                zero_copy_only=False
            )
            dup_win = member & valid
            starts = tok_off[doc_of_win[dup_win]] + pos[dup_win]
            covered = _covered_from_starts(tok_off, starts, n)
            texts = _rebuild_texts(s, lens, tok_off, covered)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "dedup_text": pa.array(texts, pa.string()),
                }
            )

        return docs.map_batches(fused_rewrite, batch_format="pyarrow")

    # join path: only DUPLICATED windows shuffle; positions fold per doc
    from gis_scripts_ray.stages.joins import hash_join

    def window_rows(batch: pa.Table) -> pa.Table:
        _s, _l, tok_off, doc_of_win, pos, valid, acc = _batch_windows(
            batch, text_col, n
        )
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[doc_of_win[valid]], pa.int64()),
                "p": pa.array(pos[valid], pa.int64()),
                "h": pa.array(acc[valid], pa.int64()),
            }
        )

    dup = dup.repartition(max(1, -(-n_dup // 4_000_000)))
    windows = docs.map_batches(window_rows, batch_format="pyarrow")
    matched = hash_join(windows, dup, on="h", num_partitions=num_partitions)

    def fold_positions(g: pa.Table) -> pa.Table:
        did = g[id_col][0].as_py()
        p = np.unique(g["p"].to_numpy())
        return pa.table(
            {
                id_col: pa.array([did], pa.int64()),
                "pos_blob": pa.array([p.astype("<i8").tobytes()], pa.binary()),
            }
        )

    per_doc = (
        matched.groupby(id_col)
        .map_groups(fold_positions, batch_format="pyarrow")
        .materialize()  # compacted aggregate; also splits the join plans
    )
    n_hit_docs = per_doc.count()
    per_doc = per_doc.repartition(max(1, -(-n_hit_docs // 500_000)))

    touched = bucketed_join(
        docs, per_doc, on=id_col, num_buckets=num_partitions
    )

    def rewrite_touched(batch: pa.Table) -> pa.Table:
        s, lens, tok_off, _d, _p, _v, _a = _batch_windows(batch, text_col, n)
        starts_list = []
        for i, blob in enumerate(batch["pos_blob"].to_pylist()):
            p = np.frombuffer(blob, dtype="<i8")
            starts_list.append(tok_off[i] + p)
        starts = (
            np.concatenate(starts_list)
            if starts_list
            else np.zeros(0, np.int64)
        )
        covered = _covered_from_starts(tok_off, starts, n)
        texts = _rebuild_texts(s, lens, tok_off, covered)
        return pa.table(
            {
                id_col: batch[id_col],
                "dedup_text": pa.array(texts, pa.string()),
            }
        )

    rewritten = touched.map_batches(rewrite_touched, batch_format="pyarrow")

    untouched = hash_anti_join(
        docs, per_doc, on=id_col,
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
    )
    passthrough = untouched.map_batches(identity_text, batch_format="pyarrow")
    return rewritten.union(passthrough)


def substr_dedup_row(texts: "list[str]", n: int = 5) -> "list[str]":
    """Driver-sized reference implementation (parity oracle): the same
    semantics via plain Python sets — duplicated n-gram extents removed
    everywhere."""
    grams: dict = {}
    toks_all = [(t or "").split(" ") for t in texts]
    for toks in toks_all:
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    out = []
    for toks in toks_all:
        covered = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if grams[" ".join(toks[i : i + n])] > 1:
                for j in range(i, i + n):
                    covered[j] = True
        out.append(" ".join(t for t, c in zip(toks, covered) if not c))
    return out
