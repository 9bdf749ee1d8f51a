"""Sequence packing — assign every document its (pack, offset) slot in
the fixed-length token windows an LLM pretraining run consumes (sample
packing: documents concatenate in doc-id order into windows of W
tokens; a doc starts at global token position ``cum`` = total tokens of
all smaller-id docs, so it lands in pack ``cum // W`` at offset
``cum % W``).

The core is a DISTRIBUTED ORDERED PREFIX SUM — the operation Ray Data
has no native operator for — built 100-TB-first:

1. one fused pass computes (id, n_tokens) per doc (single-space token
   convention, matching DuckDB ``len(string_split(text, ' '))``);
2. ids bucket by RANGE (``(id - min_id) // span``, span sized so
   ~``n_buckets`` buckets exist) — range buckets keep the order
   semantics local: every doc in bucket b precedes every doc in b+1;
3. per-bucket token totals reduce through the adaptive combine (a
   COMPACTED aggregate, n_buckets rows), and their exclusive prefix —
   an O(n_buckets) fold of an already-tiny table — broadcasts back;
4. a ``groupby(bucket).map_groups`` finish sorts each bucket by id and
   emits ``bucket_prefix + exclusive_cumsum`` per doc.

No driver row traffic beyond the n_buckets-row prefix table; bucket
skew is bounded by the id distribution (ids are dense sequences in
practice; ``n_buckets`` scales with the cluster).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def count_tokens_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(id, n_tokens) per doc — single-space split, empties kept (the
    DuckDB ``string_split(text, ' ')`` convention; null text -> [''] ->
    1 token, same as the SQL twin's COALESCE-free semantics on ''). """
    import polars as pl

    texts = batch[text_col]
    s = pl.from_arrow(
        texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    )
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    n = s.fill_null("").str.split(" ").list.len().to_numpy().astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n, pa.int64()),
        }
    )


def sequence_packing(
    docs: ray.data.Dataset,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """(id, n_tokens, pack_id, pack_offset) for every doc; see module
    doc. ``window`` is the pack length in tokens."""
    import ray as _ray
    from ray.data.aggregate import Max, Min

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum
    from gis_scripts_ray.state.broadcast import worker_broadcast

    if window < 1:
        raise ValueError("window >= 1")
    toks = docs.map_batches(
        lambda b: count_tokens_batch(b, text_col, id_col),
        batch_format="pyarrow",
    ).materialize()  # scanned by the totals pass and the finish
    agg = toks.aggregate(Min(id_col), Max(id_col))
    lo, hi = agg[f"min({id_col})"], agg[f"max({id_col})"]
    if lo is None:
        return ray.data.from_arrow(
            pa.schema(
                [
                    pa.field(id_col, pa.int64()),
                    pa.field("n_tokens", pa.int64()),
                    pa.field("pack_id", pa.int64()),
                    pa.field("pack_offset", pa.int64()),
                ]
            ).empty_table()
        )
    span = max(1, -(-int(hi - lo + 1) // n_buckets))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        b = (ids - lo) // span  # ids >= lo, so floor == trunc
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    bucketed = toks.map_batches(add_bucket, batch_format="pyarrow")

    def total_partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(["bucket", "n_tokens"])
            .group_by(["bucket"])
            .aggregate([("n_tokens", "sum")])
        )
        return out.rename_columns(["bucket", "n_tokens"])

    totals = coalesce_shuffle_sum(
        bucketed.map_batches(total_partial, batch_format="pyarrow"),
        ["bucket"],
        ["n_tokens"],
    ).to_pandas()  # n_buckets rows — a compacted aggregate, driver-safe
    totals = totals.sort_values("bucket")
    prefix = np.zeros(n_buckets + 1, np.int64)
    np.add.at(
        prefix,
        totals["bucket"].to_numpy().astype(np.int64) + 1,
        totals["n_tokens"].to_numpy().astype(np.int64),
    )
    prefix = np.cumsum(prefix)  # prefix[b] = tokens in buckets < b
    ref = _ray.put(prefix)

    def finish(g: pa.Table) -> pa.Table:
        pfx = worker_broadcast(ref)
        g = g.sort_by(id_col)
        n = g["n_tokens"].to_numpy().astype(np.int64)
        b = int(g["bucket"][0].as_py())
        cum = pfx[b] + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table(
            {
                id_col: g[id_col],
                "n_tokens": g["n_tokens"],
                "pack_id": pa.array(cum // window, pa.int64()),
                "pack_offset": pa.array(cum % window, pa.int64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(finish, batch_format="pyarrow")


def sequence_packing_rows(texts: "list[str]", window: int) -> "list[tuple]":
    """Driver-sized reference (parity oracle): same semantics in plain
    Python over docs given in id order."""
    out, cum = [], 0
    for t in texts:
        n = len(((t if t is not None else "")).split(" "))
        out.append((n, cum // window, cum % window))
        cum += n
    return out
