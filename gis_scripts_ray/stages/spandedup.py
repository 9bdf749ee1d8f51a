"""Duplicate-span removal — the C4 / RefinedWeb exact line-dedup shape
re-expressed over word spans: split every document into non-overlapping
``w``-word spans, keep each distinct span only at its globally FIRST
occurrence (lexicographic ``(doc_id, span_idx)``), drop every later
occurrence, and rebuild the cleaned text. The standard boilerplate /
repeated-content scrub a pretraining pipeline runs between exact and
near dedup (reference parity target: the engine-wide dedup family —
cf. ``stages/dedup.py``; spans here are the unit the reference's
row-window transforms use for rasters, applied to text).

Shape, 100-TB-first:

1. ONE corpus pass emits per-block partials: per distinct span HASH,
   the block-local lexicographic-min occurrence and the occurrence
   count. The lexmin is carried as a single packed int64
   (``doc_id * 2^20 + span_idx`` — min over the packed value IS the
   lexicographic min, so the existing sum/min adaptive combine
   applies; the ``span_idx < 2^20`` / ``doc_id < 2^43`` contract is
   guarded loudly per batch). The all-to-all carries 24 bytes per
   distinct span per block — text never shuffles.
2. adaptive combine (:func:`tile_agg.coalesce_shuffle_agg`) produces
   the global keeper table (hash -> keep_packed, n).
3. adaptive delivery, the ``decontaminate`` decision: the DUPLICATED
   subset (n >= 2; the only spans whose occurrences can be removed)
   is MEASURED — if it fits ``broadcast_limit`` it broadcasts once
   (``ray.put`` + per-worker cache, sorted-array ``searchsorted``
   membership) into a second fused corpus pass that re-splits, flags
   and rebuilds each doc IN BATCH (docs never span batches): zero
   additional shuffle. Otherwise every span row (with its text) hash-
   joins the full keeper table on the hash — the span text ships once,
   the same bytes as shipping the corpus once — and docs are rebuilt
   in hash-bucketed groups (the ``sessionize`` bucketed-finish shape,
   never one Python call per doc).

Matching is on one 64-bit xxhash lane of the span string (collision
odds ~1e-9 at 1e9 x 1e5 spans — the documented ``decontaminate``
contract; the upgrade path is the second independent lane
``dedup.content_hash_cols`` uses). Span strings are injective in the
word tuple (words cannot contain the join space), so the SQL oracle's
string equality is exactly the engine's hash equality up to that
collision bound. Rejoining ALL spans with single spaces reconstructs
``' '.join(text.split(' '))`` == the original text, so untouched docs
round-trip byte-identically.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from gis_scripts_ray.stages.chunking import chunk_batch

_PACK_BITS = 20
_PACK = np.int64(1 << _PACK_BITS)
_MAX_DOC = 1 << (62 - _PACK_BITS)

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("clean_text", pa.string()),
        ("n_spans", pa.int64()),
        ("n_removed", pa.int64()),
    ]
)


def _span_rows(
    batch: pa.Table, text_col: str, id_col: str, w: int
) -> "tuple[pa.Table, np.ndarray, np.ndarray]":
    """Non-overlapping spans of one batch: (chunk table, span hashes,
    packed lexmin keys). The chunk table is ordered (doc, si) with each
    doc's spans contiguous — :func:`chunk_batch` with stride == size."""
    t = chunk_batch(
        batch, text_col=text_col, id_col=id_col, chunk_size=w, stride=w
    )
    s = pl.from_arrow(t["chunk_text"])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    h = s.hash(seed=0).to_numpy().astype(np.int64)
    ids = t[id_col].to_numpy()
    si = t["chunk_idx"].to_numpy()
    if len(ids):
        if ids.min() < 0 or ids.max() >= _MAX_DOC:
            raise ValueError(
                f"span_dedup packing contract: 0 <= {id_col} < 2^{62 - _PACK_BITS}"
            )
        if si.max() >= (1 << _PACK_BITS):
            raise ValueError(
                f"span_dedup packing contract: a doc has >= 2^{_PACK_BITS} "
                f"spans (raise w or split the doc upstream)"
            )
    packed = ids * _PACK + si
    return t, h, packed


def span_keeper_partials(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", w: int = 3
) -> pa.Table:
    """Per-block partial keeper facts: per span hash, the block-local
    lexicographic-min occurrence (packed) and occurrence count."""
    out_schema = pa.schema(
        [("h", pa.int64()), ("keep_packed", pa.int64()), ("n", pa.int64())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    _, h, packed = _span_rows(batch, text_col, id_col, w)
    t = pa.table({"h": pa.array(h), "packed": pa.array(packed)})
    out = t.group_by(["h"]).aggregate([("packed", "min"), ([], "count_all")])
    return pa.table(
        {
            "h": out["h"],
            "keep_packed": out["packed_min"],
            "n": out["count_all"].cast(pa.int64()),
        },
        schema=out_schema,
    )


def _rebuild(tbl: pl.DataFrame) -> pa.Table:
    """(doc, si, span, keep) -> one output row per doc, spans already in
    (doc, si) order with each doc contiguous. Empty keep-set docs yield
    '' (polars str.join of an empty filtered group)."""
    agg = tbl.group_by("doc", maintain_order=True).agg(
        pl.col("span").filter(pl.col("keep")).str.join(" ").alias("clean_text"),
        pl.len().alias("n_spans"),
        (pl.len() - pl.col("keep").sum()).alias("n_removed"),
    )
    return pa.table(
        {
            "doc_id": agg["doc"].to_arrow().cast(pa.int64()),
            "clean_text": agg["clean_text"].to_arrow().cast(pa.string()),
            "n_spans": pa.array(agg["n_spans"].to_numpy().astype(np.int64)),
            "n_removed": pa.array(agg["n_removed"].to_numpy().astype(np.int64)),
        },
        schema=_OUT_SCHEMA,
    )


def span_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
    rebuild_buckets: int = 32,
    tiny_limit: int = 512_000,
) -> ray.data.Dataset:
    """(doc_id, clean_text, n_spans, n_removed) per document after
    global keep-first duplicate-span removal — see module docstring.
    ``broadcast_limit`` / ``tiny_limit`` are exposed so forced-low-guard
    tests can drive the join fallback on small fixtures."""
    import ray as _ray

    from gis_scripts_ray.stages.joins import hash_join
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg
    from gis_scripts_ray.state.broadcast import worker_broadcast

    partials = ds.map_batches(
        span_keeper_partials,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "w": w},
        batch_format="pyarrow",
    )
    combined = coalesce_shuffle_agg(
        partials,
        ["h"],
        {"keep_packed": "min", "n": "sum"},
        tiny_limit=tiny_limit,
    )

    dup = combined.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], 2)).select(
            ["h", "keep_packed"]
        ),
        batch_format="pyarrow",
    ).materialize()
    n_dup = dup.count()

    if n_dup <= broadcast_limit:
        if n_dup == 0:
            hs = np.empty(0, dtype=np.int64)
            kp = np.empty(0, dtype=np.int64)
        else:
            parts = [
                b
                for b in dup.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            hs = np.concatenate([b["h"].to_numpy() for b in parts])
            kp = np.concatenate([b["keep_packed"].to_numpy() for b in parts])
            order = np.argsort(hs, kind="stable")
            hs, kp = hs[order], kp[order]
        ref = _ray.put((hs, kp))

        def fused_rebuild(batch: pa.Table) -> pa.Table:
            # re-split + flag + rebuild in ONE task; docs never span batches
            if batch.num_rows == 0:
                return _OUT_SCHEMA.empty_table()
            bhs, bkp = worker_broadcast(ref)
            t, h, packed = _span_rows(batch, text_col, id_col, w)
            if len(bhs):
                pos = np.searchsorted(bhs, h)
                pos_c = np.minimum(pos, len(bhs) - 1)
                found = bhs[pos_c] == h
                keep = ~found | (bkp[pos_c] == packed)
            else:
                keep = np.ones(len(h), dtype=bool)
            d = pl.DataFrame(
                {
                    "doc": t[id_col].to_numpy(),
                    "span": pl.from_arrow(t["chunk_text"].combine_chunks()),
                    "keep": keep,
                }
            )
            return _rebuild(d)

        return ds.map_batches(fused_rebuild, batch_format="pyarrow")

    # join fallback: span text ships ONCE through a sized hash join (the
    # same bytes as shipping the corpus once), then bucketed rebuild
    def spans_with_text(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [
                    ("doc", pa.int64()),
                    ("si", pa.int64()),
                    ("span", pa.string()),
                    ("h", pa.int64()),
                    ("packed", pa.int64()),
                ]
            ).empty_table()
        t, h, packed = _span_rows(batch, text_col, id_col, w)
        return pa.table(
            {
                "doc": t[id_col].combine_chunks().cast(pa.int64()),
                "si": t["chunk_idx"].combine_chunks(),
                "span": t["chunk_text"].combine_chunks(),
                "h": pa.array(h),
                "packed": pa.array(packed),
            }
        )

    # repartition-compact the keeper side: Ray 2.49's native join rejects
    # right sides containing empty shuffle-partition blocks
    n_keep = combined.count()
    keepers = combined.select_columns(["h", "keep_packed"]).repartition(
        max(1, min(num_partitions, -(-n_keep // 2_000_000)))
    )
    spans = ds.map_batches(spans_with_text, batch_format="pyarrow")
    joined = hash_join(spans, keepers, on="h", num_partitions=num_partitions)

    def flag_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc"].to_numpy().astype(np.uint64)
        bucket = (
            (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        ) % np.uint64(rebuild_buckets)
        keep = pc.equal(batch["packed"], batch["keep_packed"])
        return pa.table(
            {
                "doc": batch["doc"],
                "si": batch["si"],
                "span": batch["span"],
                "keep": keep,
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    # materialize between the join and the groupby so each execution
    # carries ONE shuffle's aggregator pool (the two-JoinOperator
    # deadlock pattern, see lsh_neardup_pairs)
    flagged = joined.map_batches(flag_bucket, batch_format="pyarrow").materialize()

    def rebuild_group(tbl: pa.Table) -> pa.Table:
        d = pl.from_arrow(tbl.select(["doc", "si", "span", "keep"]))
        if not isinstance(d, pl.DataFrame):  # pragma: no cover
            d = d.to_frame()
        return _rebuild(d.sort(["doc", "si"]))

    return flagged.groupby("bucket").map_groups(
        rebuild_group, batch_format="pyarrow"
    )


def span_dedup_reference(
    ids: "list[int]", texts: "list[str | None]", w: int = 3
) -> "dict[int, tuple[str, int, int]]":
    """Sequential whole-corpus reference (parity oracle for tests): one
    global first-occurrence scan in (doc_id, span_idx) order.
    Returns {doc_id: (clean_text, n_spans, n_removed)}."""
    seen: set[str] = set()
    out: dict[int, tuple[str, int, int]] = {}
    for i, t in sorted(zip(ids, texts), key=lambda p: p[0]):
        words = (t or "").split(" ")
        n_spans = (len(words) + w - 1) // w
        kept, n_removed = [], 0
        for k in range(n_spans):
            sp = " ".join(words[k * w : (k + 1) * w])
            if sp in seen:
                n_removed += 1
            else:
                seen.add(sp)
                kept.append(sp)
        out[i] = (" ".join(kept), n_spans, n_removed)
    return out
