"""Batched Levenshtein edit distance — the exact-verification kernel
for near-duplicate candidate pairs (the edit-distance analog of
``dedup.jaccard_verify``), and a rare case where DuckDB ships the SAME
primitive (``levenshtein``) as a genuinely independent oracle.

Domain: UTF-8 BYTES, matching DuckDB's semantics (its ``levenshtein``
scores multi-byte codepoints per byte — 'héllo' vs 'hello' is 2), so
the SQL twin pins the kernel bit-exactly with no normalization caveats.

Kernel: the classic two-row DP, vectorized ACROSS PAIRS — the only
Python loop is over the first string's byte positions (sequence length,
not row count). The insertion recurrence cur[j] = min(c[j], cur[j-1]+1)
is a min-plus prefix scan, which decomposes exactly:
d[j] = cur[j] - j  ⇒  d = cummin(c - j), cur = d + j — one
``np.minimum.accumulate`` per outer step, no inner loop. Per CLAUDE.md,
the per-row reference (:func:`levenshtein_one`) stays as the bit-exact
parity oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def levenshtein_one(a: str, b: str) -> int:
    """Per-row reference: textbook DP over UTF-8 bytes (unit costs)."""
    s, t = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(t) + 1))
    for i in range(1, len(s) + 1):
        cur = [i] + [0] * len(t)
        for j in range(1, len(t) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (s[i - 1] != t[j - 1]),
            )
        prev = cur
    return prev[len(t)]


def _byte_matrix(col) -> "tuple[np.ndarray, np.ndarray]":
    """(padded byte matrix, lengths) for a string array/chunked array.
    Pad value 0 never occurs in UTF-8 text."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    b = col.cast(pa.binary())
    n = len(b)
    offs = np.frombuffer(b.buffers()[1], dtype=np.int32)[
        b.offset : b.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(b.buffers()[2] or b"", dtype=np.uint8)
    lens = np.diff(offs)
    width = int(lens.max()) if n else 0
    mat = np.zeros((n, width), dtype=np.uint8)
    if width:
        idx = offs[:-1, None] + np.arange(width)[None, :]
        valid = np.arange(width)[None, :] < lens[:, None]
        mat[valid] = data[np.minimum(idx, len(data) - 1)[valid]]
    return mat, lens


def levenshtein_batch(a_col, b_col) -> np.ndarray:
    """Edit distances for aligned string columns, int64."""
    amat, alen = _byte_matrix(a_col)
    bmat, blen = _byte_matrix(b_col)
    n = len(alen)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    l2 = bmat.shape[1]
    j = np.arange(l2 + 1, dtype=np.int64)
    prev = np.tile(j, (n, 1))
    ans = np.where(alen == 0, blen, -1).astype(np.int64)
    rows = np.arange(n)
    for i in range(1, amat.shape[1] + 1):
        sub = prev[:, :-1] + (amat[:, i - 1 : i] != bmat)
        dele = prev[:, 1:] + 1
        base = np.empty_like(prev)
        base[:, 0] = i
        base[:, 1:] = np.minimum(sub, dele)
        prev = np.minimum.accumulate(base - j, axis=1) + j
        done = alen == i
        if done.any():
            ans[done] = prev[rows[done], blen[done]]
    return ans


def edit_distances(
    ds, a_col: str, b_col: str, out_col: str = "lev"
):
    """Append ``out_col`` (int64 edit distance) to every row — a
    task-fused ``map_batches`` stage; batch cost is
    O(rows × len_a × len_b) vectorized across rows."""

    def kernel(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col,
            pa.array(levenshtein_batch(batch[a_col], batch[b_col]), pa.int64()),
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
