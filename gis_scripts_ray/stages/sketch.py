"""Distributed cardinality sketch: HyperLogLog over a Dataset column.

The 100-TB way to count distincts: an exact COUNT DISTINCT is an
all-to-all shuffle of every distinct key, while an HLL sketch reduces each
block to a fixed 2^p-byte register array (a ``map_batches`` partial),
merged by elementwise max — associative, commutative, and
block-structure-independent, so the result is DETERMINISTIC for a given
hash seed regardless of how Ray splits the input. Estimator follows the
public HyperLogLog formulation (Flajolet, Fusy, Gandouet, Meunier 2007)
with the standard linear-counting small-range correction.

The reference has no sketch layer (its distinct counts are in-memory
``np.unique`` passes, e.g. zonal class rollups); this is one of the
beyond-the-reference LLM-pipeline operators the engine adds for corpus
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (binary-search
    halving — float ``log2`` is NOT exact near powers of two: 2^64-1
    rounds up to 2^64 in float64 and misreports the leading bit)."""
    x = x.astype(np.uint64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        y = x >> np.uint64(s)
        nz = y != 0
        n[nz] -= s
        x[nz] = y[nz]
    n[x != 0] -= 1
    return n


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8[2^p]) for a batch of 64-bit hashes.

    Register index = top ``p`` bits; rank = 1 + leading zeros of the
    remaining ``64-p`` bits (capped at 64-p+1 when they are all zero).
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # low 64-p bits moved to the top
    rank = np.where(w == 0, 64 - p + 1, _clz64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise max — the associative/commutative combine."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard alpha_m for m >= 128
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


def _hash_tokens(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit hashes of every space-separated token of every text (polars
    xxhash, fixed seed — the same stable word-hash family the MinHash
    stage uses). Tokenization is ``split(' ')`` with empties kept, the
    exact semantics of DuckDB ``string_split(text, ' ')``."""
    import polars as pl

    s = pl.from_arrow(texts)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    flat = s.fill_null("").str.split(" ").explode()
    return flat.hash(seed=11).to_numpy().astype(np.uint64)


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit value hashes of a (scalar) column — polars xxhash, fixed
    seed, any hashable dtype (ints, floats, strings)."""
    import polars as pl

    s = pl.from_arrow(col)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    return s.hash(seed=11).to_numpy().astype(np.uint64)


def _hll_sketch(
    ds: ray.data.Dataset, hasher, p: int
) -> tuple[float, np.ndarray]:
    """(estimate, merged registers) — one fused streaming pass, each block
    reduced to one 2^p-byte register row; the combine is a bounded fold
    (registers are fixed-size, so even 10^6 blocks merge in MBs,
    tree-folded)."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(hasher(batch), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        mat = np.frombuffer(b"".join(batch["regs"].to_pylist()), dtype=np.uint8)
        merged = mat.reshape(-1, 1 << p).max(axis=0)
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    folded = (
        partials.repartition(max(1, partials.num_blocks() // 8))
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
    out = folded.take_all()
    regs = np.frombuffer(out[0]["regs"], dtype=np.uint8).copy()
    return hll_estimate(regs), regs


def approx_distinct_tokens(
    ds: ray.data.Dataset, text_col: str = "text", p: int = 12
) -> tuple[float, np.ndarray]:
    """Distinct-token cardinality sketch of a text column (tokens =
    ``split(' ')`` with empties kept, DuckDB ``string_split`` semantics)."""
    return _hll_sketch(ds, lambda b: _hash_tokens(b[text_col]), p)


def approx_distinct_column(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> tuple[float, np.ndarray]:
    """Distinct-value cardinality sketch of a scalar column."""
    return _hll_sketch(ds, lambda b: _hash_column(b[col]), p)


def exact_distinct_column(ds: ray.data.Dataset, col: str) -> int:
    """Exact distinct count of a scalar column: per-block distinct (the
    shuffle carries each block's distinct values once, not every row),
    adaptive combine, then a count — the exact companion the sketch's
    accuracy flag is checked against."""
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        return pa.table(
            {col: out[col], "n": pa.array(np.ones(len(out), dtype=np.int64))}
        )

    combined = coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), [col], ["n"]
    )
    return combined.count()


def _series(col: pa.ChunkedArray | pa.Array):
    import polars as pl

    s = pl.from_arrow(col)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    return s


def _bloom_positions(
    col: pa.ChunkedArray | pa.Array, m_bits: int, k: int
) -> list[np.ndarray]:
    """k probe positions per value — Kirsch-Mitzenmacher double hashing
    (pos_i = h1 + i*h2 mod m, two independent 64-bit value hashes; public
    technique, 'Less Hashing, Same Performance', 2006). ``m_bits`` must be
    a power of two so the mod is a mask. Build and probe MUST both route
    through this function: the filter is only correct if both sides hash
    identically (same polars seeds, same key dtype)."""
    s = _series(col)
    h1 = s.hash(seed=7).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=13).to_numpy().astype(np.uint64)
    mask = np.uint64(m_bits - 1)
    return [(h1 + np.uint64(i) * h2) & mask for i in range(k)]


def bloom_build(
    ds: ray.data.Dataset,
    col: str,
    n_keys: int,
    bits_per_key: int = 10,
    k: int = 4,
) -> tuple[bytes, int, int]:
    """Build a Bloom filter of a Dataset column as a mergeable sketch.

    Per-block partial = the fixed-size bit array with that block's keys
    set (a ``map_batches`` partial, like the HLL registers above); the
    combine is elementwise OR — associative, commutative, and
    block-structure-independent. 10 bits/key with k=4 gives ~1-2% false
    positives; false NEGATIVES are impossible, which is what the
    semi-join prefilter relies on for exactness.

    Returns ``(bit_array_bytes, m_bits, k)``.
    """
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys) * bits_per_key))))
    n_bytes = m_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pos in _bloom_positions(batch[col], m_bits, k):
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                ),
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        mat = np.frombuffer(b"".join(batch["bits"].to_pylist()), dtype=np.uint8)
        merged = np.bitwise_or.reduce(mat.reshape(-1, n_bytes), axis=0)
        return pa.table({"bits": pa.array([merged.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    folded = (
        partials.repartition(max(1, partials.num_blocks() // 8))
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
    out = folded.take_all()
    return out[0]["bits"], m_bits, k


def bloom_contains(
    bits_bytes: bytes, m_bits: int, k: int, col: pa.ChunkedArray | pa.Array
) -> np.ndarray:
    """Vectorized membership probe: bool mask per value (True = possibly
    in the set; False = DEFINITELY not)."""
    bits = np.frombuffer(bits_bytes, dtype=np.uint8)
    n = len(col)
    keep = np.ones(n, dtype=bool)
    for pos in _bloom_positions(col, m_bits, k):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        keep &= (
            np.right_shift(byte, (pos & np.uint64(7)).astype(np.uint8)) & 1
        ).astype(bool)
    return keep


def _mg_reduce(
    keys: pa.Array, counts: np.ndarray, capacity: int
) -> tuple[pa.Array, np.ndarray]:
    """Misra-Gries reduction of a counted multiset to <= ``capacity``
    counters: subtract the (capacity+1)-th largest count from all and
    drop the non-positive ones (the mergeable-summaries formulation,
    Agarwal et al., PODS 2012 — public)."""
    n = len(counts)
    if n <= capacity:
        return keys, counts
    thr = np.partition(counts, n - capacity - 1)[n - capacity - 1]
    kept = counts > thr
    return keys.filter(pa.array(kept)), counts[kept] - thr


def misra_gries_candidates(
    ds: ray.data.Dataset, col: str, capacity: int
) -> pa.Table:
    """Heavy-hitter CANDIDATE set via a distributed Misra-Gries sketch.

    Per-block partial: exact in-block value counts (``Table.group_by``)
    reduced to ``capacity`` counters; folds re-group summed counters and
    re-reduce. The mergeable-summaries guarantee survives arbitrary merge
    trees: every key with true frequency > n/(capacity+1) appears in the
    result (no false negatives); estimates undercount by at most
    n/(capacity+1). Result is a driver-sized table of <= ``capacity``
    rows (key, est).
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        keys, counts = _mg_reduce(
            g[col].combine_chunks(), g["count_all"].to_numpy().astype(np.int64), capacity
        )
        return pa.table({col: keys, "est": pa.array(counts, pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.group_by([col]).aggregate([("est", "sum")])
        keys, counts = _mg_reduce(
            g[col].combine_chunks(), g["est_sum"].to_numpy().astype(np.int64), capacity
        )
        return pa.table({col: keys, "est": pa.array(counts, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    folded = (
        partials.repartition(max(1, partials.num_blocks() // 8))
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
    rows = folded.take_all()
    if not rows:
        return pa.table({col: pa.array([], pa.int64()), "est": pa.array([], pa.int64())})
    return pa.table(
        {
            col: pa.array([r[col] for r in rows]),
            "est": pa.array([r["est"] for r in rows], pa.int64()),
        }
    )


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    phi: float,
    capacity: int | None = None,
) -> ray.data.Dataset:
    """EXACT phi-heavy hitters (keys with frequency > phi*n) at corpus
    scale: the classic two-pass sketch-then-verify.

    Pass 1: Misra-Gries candidates with capacity >= 2/phi — guaranteed to
    contain every key above the threshold (candidates are a superset; no
    heavy key can be missed). Pass 2: EXACT counts for the candidate keys
    only (a broadcast ``is_in`` filter — the candidate set is
    driver-sized by construction — then in-batch partials + the adaptive
    combine). Output (key, n_exact) for n_exact > phi*n, so the result is
    exact and SQL-expressible despite the sketch: a ``GROUP BY ...
    HAVING COUNT(*) > phi*n`` twin checks it value-for-value.

    The 100-TB story: a naive GROUP BY shuffles every distinct key; this
    shuffles <= capacity candidate keys' partial counts plus one
    fixed-size sketch fold, independent of key cardinality.
    """
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    if capacity is None:
        capacity = max(64, int(np.ceil(2.0 / phi)))
    cands = misra_gries_candidates(ds, col, capacity)
    n_total = ds.count()
    cand_set = cands[col].combine_chunks()

    def exact_partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch[col], value_set=cand_set)
        hit = batch.select([col]).filter(keep)
        g = hit.group_by([col]).aggregate([([], "count_all")])
        return pa.table(
            {col: g[col], "n_exact": pc.cast(g["count_all"], pa.int64())}
        )

    counts = coalesce_shuffle_sum(
        ds.map_batches(exact_partial, batch_format="pyarrow"), [col], ["n_exact"]
    )
    thr = phi * n_total
    return counts.map_batches(
        lambda b: b.filter(pc.greater(b["n_exact"], thr)),
        batch_format="pyarrow",
    )


def exact_distinct_tokens(ds: ray.data.Dataset, text_col: str = "text") -> int:
    """Exact distinct-token count: per-block distinct (tokens unique-ized
    BEFORE the shuffle, so the all-to-all carries each block's vocabulary
    once, not every occurrence), then the adaptive combine + a count.
    Tokenization matches :func:`_hash_tokens` / DuckDB
    ``string_split(text, ' ')`` exactly (empties kept; null text is
    normalized to '' FIRST, yielding the one empty token — the same
    null contract as ``_hash_tokens``'s ``fill_null('')``, so the exact
    count and the HLL sketch tokenize identically)."""
    import pyarrow.compute as pc

    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
        )
        t = pa.table({"token": toks})
        out = t.group_by(["token"]).aggregate([([], "count_all")])
        return pa.table(
            {"token": out["token"], "n": pa.array(np.ones(len(out), dtype=np.int64))}
        )

    combined = coalesce_shuffle_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], ["n"]
    )
    return combined.count()


# ---------------------------------------------------------------------------
# Count-Min sketch (round 5)
# ---------------------------------------------------------------------------

_CMS_D = 4


def _cms_words(tokens: list) -> np.ndarray:
    """(n, 4) uint64: the four big-endian 32-bit words of each token's
    md5 digest — ONE digest pass yields all four CMS hash rows, and word
    ``r`` is exactly ``substr(md5(w), 1+8r, 8)`` parsed as hex, so DuckDB
    recomputes the identical sketch (``('0x'||substr(md5(w),1,8))::UBIGINT``
    — cross-engine bit-equality pinned in tests/test_cms.py). md5 is the
    repo's stable cross-platform string hash (``text_index.token_bucket``
    convention); it touches DISTINCT tokens only (callers pass a
    block-local vocabulary, never the occurrence stream)."""
    import hashlib

    out = np.empty((len(tokens), _CMS_D), dtype=np.uint64)
    for i, t in enumerate(tokens):
        dig = hashlib.md5(t.encode("utf-8")).digest()
        out[i, 0] = int.from_bytes(dig[0:4], "big")
        out[i, 1] = int.from_bytes(dig[4:8], "big")
        out[i, 2] = int.from_bytes(dig[8:12], "big")
        out[i, 3] = int.from_bytes(dig[12:16], "big")
    return out


def _block_token_counts(batch: pa.Table, text_col: str):
    """Block-local (tokens, counts) — tokenization identical to
    :func:`exact_distinct_tokens` / DuckDB
    ``string_split(COALESCE(text,''), ' ')`` (empties kept, null -> '')."""
    import pyarrow.compute as pc

    toks = pc.list_flatten(
        pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    )
    vc = (
        pa.table({"token": toks})
        .group_by(["token"])
        .aggregate([([], "count_all")])
    )
    return vc["token"].to_pylist(), vc["count_all"].to_numpy().astype(np.int64)


def cms_counters(
    ds: ray.data.Dataset, text_col: str = "text", width: int = 1024
) -> ray.data.Dataset:
    """Mergeable Count-Min registers over a token stream (Cormode &
    Muthukrishnan 2005): each block reduces to <= ``_CMS_D * width``
    (row, bucket, c) partial counters — a FIXED-SIZE register set no
    matter the corpus, merged by plain integer + (associative,
    block-structure-independent), the 100-TB frequency-estimation
    primitive. Per block the occurrence stream compacts to the block
    vocabulary first (one ``group_by`` — the dictionary-encode
    convention), md5 runs once per distinct token, and ``np.bincount``
    accumulates each hash row (float64 weights are exact: block counts
    << 2^53)."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def partial(batch: pa.Table) -> pa.Table:
        toks, cnts = _block_token_counts(batch, text_col)
        words = _cms_words(toks)
        outs = []
        for r in range(_CMS_D):
            buck = (words[:, r] % np.uint64(width)).astype(np.int64)
            acc = np.bincount(buck, weights=cnts.astype(np.float64), minlength=width)
            nz = np.nonzero(acc)[0]
            outs.append(
                pa.table(
                    {
                        "row": pa.array(np.full(len(nz), r, dtype=np.int64)),
                        "bucket": pa.array(nz.astype(np.int64)),
                        "c": pa.array(acc[nz].astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return coalesce_shuffle_agg(parts, ["row", "bucket"], {"c": "sum"})


def cms_probe_counts(
    ds: ray.data.Dataset, text_col: str = "text", probe_mod: int = 331
) -> ray.data.Dataset:
    """Deterministic CMS probe set + exact truth: the distinct tokens
    whose 64-bit md5 prefix == 0 (mod ``probe_mod``) — a
    corpus-independent ~1/mod vocabulary sample that SQL derives from the
    same digest — each with its exact global occurrence count (so the
    point-query overestimate invariant ``est >= n_true`` is checkable
    row-by-row). Blocks emit their filtered vocabulary only; the adaptive
    combine sums counts globally."""
    from gis_scripts_ray.stages.tile_agg import coalesce_shuffle_agg

    def partial(batch: pa.Table) -> pa.Table:
        toks, cnts = _block_token_counts(batch, text_col)
        words = _cms_words(toks)
        h64 = (words[:, 0] << np.uint64(32)) | words[:, 1]
        sel = np.nonzero((h64 % np.uint64(probe_mod)) == 0)[0]
        return pa.table(
            {
                "token": pa.array([toks[i] for i in sel], pa.string()),
                "n_true": pa.array(cnts[sel], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return coalesce_shuffle_agg(parts, ["token"], {"n_true": "sum"})
