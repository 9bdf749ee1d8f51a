"""Document chunking for training-data preparation: split each document
into overlapping word-window chunks and fan out one row per chunk.

The pre-tokenization step every LLM data pipeline runs: long documents
become ``chunk_size``-word windows starting every ``stride`` words
(stride < size = overlapping context windows; stride == size =
disjoint). Chunk k of a doc covers words ``[k*stride, k*stride +
chunk_size)``; k ranges over ``k*stride < n_words``, so every word is
covered and EMPTY text still yields one chunk (Python/SQL ``split`` of
"" gives one empty token — the engine-wide tokenizer contract).

Engine shape: one fused ``map_batches`` flat-map — polars splits once,
``np.repeat`` fans rows out by chunk count, and a per-row-expression
``list.slice`` + ``list.join`` materializes every chunk in one
vectorized pass. No shuffle; output rows carry (id, chunk_idx, n_words,
chunk_text). The SQL twin reproduces the exact chunk text with
``generate_series`` x ``array_slice`` x ``array_to_string``, so the
oracle hash covers the chunk CONTENT, not just counts.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data


def chunk_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> pa.Table:
    """(id, chunk_idx, n_words, chunk_text) rows — see module docstring."""
    assert chunk_size >= 1 and stride >= 1
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    words = s.fill_null("").str.split(" ")
    n_words = words.list.len().to_numpy().astype(np.int64)
    n_chunks = (n_words + stride - 1) // stride  # k*stride < n_words
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
    starts = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - starts[idx]
    ids = batch[id_col].take(pa.array(idx))
    d = pl.DataFrame(
        {
            "ws": words.gather(idx),
            "off": chunk_idx * stride,
        }
    ).with_columns(
        pl.col("ws")
        .list.slice(pl.col("off"), chunk_size)
        .list.join(" ")
        .alias("chunk_text")
    )
    return pa.table(
        {
            id_col: ids,
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_words": pa.array(n_words[idx], pa.int64()),
            "chunk_text": d["chunk_text"].to_arrow().cast(pa.string()),
        }
    )


def chunk_rows_row(
    text: "str | None", chunk_size: int = 64, stride: int = 48
) -> "list[tuple[int, int, str]]":
    """Per-row reference for :func:`chunk_batch` (parity contract):
    [(chunk_idx, n_words, chunk_text), ...]."""
    words = (text or "").split(" ")
    n = len(words)
    out = []
    k = 0
    while k * stride < n:
        out.append((k, n, " ".join(words[k * stride : k * stride + chunk_size])))
        k += 1
    return out


def chunk_documents(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> ray.data.Dataset:
    """Dataset wrapper: fused flat-map chunker (no shuffle)."""
    return ds.map_batches(
        chunk_batch,
        fn_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "chunk_size": chunk_size,
            "stride": stride,
        },
        batch_format="pyarrow",
    )


def chunk_sql_twin(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> str:
    """DuckDB twin reproducing the exact chunk text (1-based inclusive
    ``array_slice``)."""
    return (
        f"WITH w AS (SELECT {id_col}, string_split({text_col}, ' ') AS ws, "
        f"len(string_split({text_col}, ' ')) AS n FROM {table}), "
        "c AS (SELECT w.*, gs.k FROM w, LATERAL ("
        f"SELECT unnest(generate_series(0, CAST((n + {stride} - 1) // {stride} AS BIGINT) - 1)) AS k) gs) "
        f"SELECT {id_col}, CAST(k AS BIGINT) AS chunk_idx, CAST(n AS BIGINT) AS n_words, "
        f"array_to_string(array_slice(ws, k*{stride} + 1, k*{stride} + {chunk_size}), ' ') AS chunk_text "
        "FROM c"
    )
