"""Jaro-Winkler similarity — bit-exact to DuckDB's built-in.

Record-linkage scoring for blocked candidate pairs (the fuzzy sibling
of ``stages/editdist.py``; the reference's joins match on manufactured
keys — filename equality, coefficient lookups — and a production
linkage needs the tolerant comparator).

Cross-engine contract (pinned empirically against DuckDB
``jaro_winkler_similarity`` on 12k fuzzed ASCII + unicode cases, and by
``tests/test_jarowinkler.py``):

* UTF-8 BYTE domain (DuckDB compares bytes — 'café' vs 'cafe' scores
  as 5-vs-4 byte strings);
* either side empty -> 0.0; exactly equal -> 1.0 (even single-byte,
  where the match window floor(max/2)-1 is -1 and plain Jaro would
  find no matches);
* greedy matching: for each position of the FIRST string, the lowest
  unmatched in-window position of the second;
* transpositions halved with INTEGER division (trans // 2 — a 3-cycle
  counts 1, not 1.5; this is where textbook implementations diverge
  from DuckDB);
* Winkler boost only when jaro > 0.7: jw = j + (p*0.1)*(1-j), prefix
  p = common BYTE prefix capped at 4 — float op order matches Python's
  left-to-right evaluation, which matches DuckDB bit-for-bit.

:func:`jw_one` is the per-row reference; :func:`jw_batch` vectorizes
across pairs — the only Python loop is over byte positions of the
first string (the greedy "first unmatched in-window j" is an argmax
over the eligibility mask, one vector op per position).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gis_scripts_ray.stages.editdist import _byte_matrix


def jw_one(a: str, b: str) -> float:
    """Per-row reference (DuckDB semantics verbatim, byte domain)."""
    s, t = a.encode("utf-8"), b.encode("utf-8")
    l1, l2 = len(s), len(t)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s == t:
        return 1.0
    w = max(l1, l2) // 2 - 1
    tm = [False] * l2
    sm = [False] * l1
    m = 0
    for i in range(l1):
        for j in range(max(0, i - w), min(l2, i + w + 1)):
            if not tm[j] and t[j] == s[i]:
                tm[j] = True
                sm[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = 0
    trans = 0
    for i in range(l1):
        if sm[i]:
            while not tm[k]:
                k += 1
            if s[i] != t[k]:
                trans += 1
            k += 1
    j = (m / l1 + m / l2 + (m - trans // 2) / m) / 3
    if j > 0.7:
        p = 0
        for ca, cb in zip(s[:4], t[:4]):
            if ca != cb:
                break
            p += 1
        j += p * 0.1 * (1 - j)
    return j


def jw_batch(a_col, b_col) -> np.ndarray:
    """Jaro-Winkler for aligned string columns, float64 (bit-exact to
    :func:`jw_one` / DuckDB)."""
    amat, alen = _byte_matrix(a_col)
    bmat, blen = _byte_matrix(b_col)
    n = len(alen)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    w1, w2 = amat.shape[1], bmat.shape[1]
    w = np.maximum(alen, blen) // 2 - 1  # may be -1 (both single-byte)
    tm = np.zeros((n, w2), dtype=bool)
    sm = np.zeros((n, w1), dtype=bool)
    rows = np.arange(n)
    jcols = np.arange(w2)[None, :]
    for i in range(w1):
        eligible = (
            (i < alen)[:, None]
            & (jcols >= (i - w)[:, None])
            & (jcols < (i + w + 1)[:, None])
            & (jcols < blen[:, None])
            & ~tm
            & (bmat == amat[:, i : i + 1])
        )
        has = eligible.any(axis=1)
        pick = eligible.argmax(axis=1)
        tm[rows[has], pick[has]] = True
        sm[has, i] = True
    m = sm.sum(axis=1).astype(np.int64)
    # transpositions: matched bytes of each side in their own order
    cap = min(w1, w2)
    sa = np.zeros((n, cap), dtype=np.uint8)
    tb = np.zeros((n, cap), dtype=np.uint8)
    ri, ci = np.nonzero(sm)
    sa[ri, (np.cumsum(sm, axis=1) - 1)[ri, ci]] = amat[ri, ci]
    ri, ci = np.nonzero(tm)
    tb[ri, (np.cumsum(tm, axis=1) - 1)[ri, ci]] = bmat[ri, ci]
    kmask = np.arange(cap)[None, :] < m[:, None]
    trans = ((sa != tb) & kmask).sum(axis=1).astype(np.int64)
    half = trans // 2
    l1 = alen.astype(np.float64)
    l2 = blen.astype(np.float64)
    mf = m.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        j = (mf / l1 + mf / l2 + (mf - half) / mf) / 3
    # Winkler boost (byte-prefix capped at 4), only where jaro > 0.7
    pw = min(4, w1, w2)
    if pw:
        eq = amat[:, :pw] == bmat[:, :pw]
        eq &= np.arange(pw)[None, :] < np.minimum(alen, blen)[:, None]
        p = np.where(eq.all(axis=1), pw, eq.argmin(axis=1)).astype(np.float64)
    else:
        p = np.zeros(n, dtype=np.float64)
    boost = j > 0.7
    j = np.where(boost, j + (p * 0.1) * (1 - j), j)
    j = np.where(m == 0, 0.0, j)
    j = np.where(_exact_equal(amat, alen, bmat, blen), 1.0, j)
    j = np.where((alen == 0) | (blen == 0), 0.0, j)
    return j


def _exact_equal(
    amat: np.ndarray, alen: np.ndarray, bmat: np.ndarray, blen: np.ndarray
) -> np.ndarray:
    """Row-wise byte equality for matrices of different widths."""
    n, cap = len(alen), min(amat.shape[1], bmat.shape[1])
    eq = alen == blen
    if cap:
        k = np.arange(cap)[None, :]
        same = (amat[:, :cap] == bmat[:, :cap]) | (k >= alen[:, None])
        eq &= same.all(axis=1)
    # rows longer than cap on one side cannot be equal unless lens match
    # and the matrices share width up to len — cap >= min(alen, blen)
    return eq


def jw_scores(ds, a_col: str, b_col: str, out_col: str = "jw"):
    """Append ``out_col`` (float64 Jaro-Winkler) to every row — a
    task-fused ``map_batches`` stage."""

    def kernel(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, pa.array(jw_batch(batch[a_col], batch[b_col]), pa.float64())
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
